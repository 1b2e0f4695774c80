"""Conversation-level (cross-turn) operators.

The per-turn engines are deliberately turn-local (the v1 equality
contract); these operators add the conversation dimension via
``groupby(conv_id)`` co-location — the pattern SURVEY §2.4 prescribes for
heuristics that need neighboring turns (a co-location shuffle, not a join).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _part_ids(col, num_parts: int) -> pa.Array:
    """Vectorized deterministic partition ids for the grouped-scan exchange
    (VERDICT r2 #4 — no per-row Python on the hot path).

    Hash: ``pandas.util.hash_array`` — C siphash with a FIXED key, so the
    assignment is documented-stable across processes and machines (a key
    hashed in two different map tasks must land in the same partition;
    hashes that are only per-process-stable, e.g. Python's ``hash``, are
    disqualified). Integer keys hash directly (pure numpy mixing); other
    types go through their Arrow string form, nulls as ``'None'`` (the
    ``str(v)`` contract of the previous per-row implementation). The ids
    are TRANSIENT (exchange-only, never persisted) — the sink's durable
    layout keeps its separate documented crc32 contract."""
    import pandas.util as pdu

    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(ca.type) and ca.null_count == 0:
        h = pdu.hash_array(ca.to_numpy(zero_copy_only=False))
    else:
        import pyarrow.compute as pc

        s = pc.fill_null(pc.cast(ca, pa.string()), "None")
        h = pdu.hash_array(s.to_numpy(zero_copy_only=False), categorize=False)
    return pa.array((h % num_parts).astype(np.int32), pa.int32())


def _hot_keys(ds: Dataset, key: str, budget: int) -> list[str]:
    """Exact per-key census (count-only, fixed-width rows) returning the
    keys whose TOTAL row count exceeds ``budget`` — the grouped_scan
    hot-key detector (VERDICT r2 #5). Keys are compared in their
    null-normalized string form (the :func:`_part_ids` contract). The
    census pre-aggregates per batch (one row per distinct key per batch)
    so the shuffle carries counts, never payload; only the keys ABOVE
    budget reach the driver (bounded by total_rows / budget)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = pc.fill_null(pc.cast(t.column(key), pa.string()), "None")
        g = pa.table({"__k": k}).group_by(["__k"]).aggregate([("__k", "count")])
        return g.rename_columns(["__k", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__k")
        .aggregate(Sum("n", alias_name="n"))
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), budget)).select(["__k"]),
        batch_format="pyarrow",
    ).take_all()
    return sorted(r["__k"] for r in hot)


def _apply_hot_override(t: pa.Table, key: str, pids: pa.Array, hot: list[str],
                        num_parts: int) -> pa.Array:
    """Route hot keys to DEDICATED partition ids beyond ``num_parts``.

    This is key ISOLATION, not within-key salting: grouped_scan's contract
    (all rows of a key in ONE fn call) forbids splitting a key, so the
    co-location floor is the largest single key; isolation guarantees no
    partition exceeds max(budget-ish, that floor) instead of
    hot-key + everything-else-that-hashed-with-it."""
    import pyarrow.compute as pc

    ks = pc.fill_null(pc.cast(t.column(key), pa.string()), "None")
    idx = pc.index_in(ks, value_set=pa.array(hot, pa.string()))
    return pc.if_else(
        pc.is_valid(idx),
        pc.cast(pc.add(idx, num_parts), pa.int32()),
        pids,
    )


def conversation_stats(transcripts: Dataset) -> Dataset:
    """Per-conversation rollup: turn counts by role, byte totals, wall span.

    Pre-aggregates per batch (conversations never straddle... they MAY
    straddle batches — the partials are merged by the final groupby, so
    correctness does not depend on co-location; only the final groupby
    moves one small row per (batch, conv)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_turns": pa.array([1] * t.num_rows, pa.int64()),
                "n_user_turns": pc.cast(pc.equal(t.column("role"), "user"), pa.int64()),
                "bytes_total": pc.cast(
                    pc.binary_length(t.column("text").cast(pa.binary())), pa.int64()
                ),
                "ts_min": pc.cast(t.column("ts"), pa.int64()),
                "ts_max": pc.cast(t.column("ts"), pa.int64()),
            }
        )
        g = out.group_by(["conv_id"]).aggregate(
            [
                ("n_turns", "sum"),
                ("n_user_turns", "sum"),
                ("bytes_total", "sum"),
                ("ts_min", "min"),
                ("ts_max", "max"),
            ]
        )
        return g.rename_columns(
            ["conv_id", "n_turns", "n_user_turns", "bytes_total", "ts_min", "ts_max"]
        )

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        transcripts.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_user_turns", alias_name="n_user_turns"),
            Sum("bytes_total", alias_name="bytes_total"),
            Min("ts_min", alias_name="ts_min"),
            Max("ts_max", alias_name="ts_max"),
        )
    )

    def span(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "span_us", pc.subtract(t.column("ts_max"), t.column("ts_min"))
        ).drop_columns(["ts_min", "ts_max"])

    return agg.map_batches(span, batch_format="pyarrow")


def grouped_scan(
    ds: Dataset,
    key: str,
    fn,
    *,
    num_parts: int = 64,
    batch_format: str = "pandas",
    exchange: str | None = None,
    hot_key_budget: int | None = None,
    hot_keys: list[str] | None = None,
) -> Dataset:
    """Co-located per-key scan WITHOUT per-key ``map_groups`` overhead.

    ``map_groups`` pays ~0.4 ms of Python-call + frame cost PER GROUP
    (measured, BASELINE journey #8) — ruinous at 10^6+ keys. Instead the
    keys are hashed into ``num_parts`` coarse partitions; ``map_groups``
    runs once per PARTITION and ``fn`` receives a multi-key frame, sorted
    and boundary-masked vectorized. Same co-location guarantee (all rows of
    a key land in one call); Python overhead drops from O(keys) to
    O(num_parts).

    HOT KEYS (VERDICT r2 #5): a pathological hot key lands in one
    partition together with every other key that hashed there. Pass
    ``hot_key_budget=N`` to run a count-only census pass (an extra read
    of ``ds`` — enable when skew would otherwise blow a worker, not by
    default) that detects keys with more than N rows and ISOLATES each
    into a dedicated partition id beyond ``num_parts``; or pass known
    ``hot_keys`` directly (null-normalized string form) and skip the
    census. This is isolation, not within-key salting — the co-location
    contract forbids splitting a key, so the floor is the largest single
    key; isolation guarantees no partition exceeds
    max(budget + slack, that floor). Output is IDENTICAL either way.

    Partition ids come from :func:`_part_ids` — vectorized, process-stable
    hashing (the same key hashed in different map tasks MUST land in the
    same partition, so only documented-deterministic hashes qualify).

    ``exchange`` picks the co-location transport: ``"ray"`` (default) is
    Ray's sort-based all-to-all on the coarse key; ``"fs"`` routes through
    :func:`grouped_scan_fs` (map-side lz4 fragment fan-out + per-partition
    assemble — no sort, sequential I/O), which measured faster whenever the
    Sort operator's fixed cost dominates the wall (conv_texts 8.9 → 5.1 s
    at sf0.1).  Unset, the ``OCR_RAY_GS_EXCHANGE`` env var decides (for
    A/B harnesses); callers that measured a win pass it explicitly."""
    if exchange is None:
        exchange = os.environ.get("OCR_RAY_GS_EXCHANGE", "ray")
    if hot_keys is None and hot_key_budget is not None:
        hot_keys = _hot_keys(ds, key, hot_key_budget)
    if exchange == "fs":
        if batch_format == "pandas":

            def wrapped(t: pa.Table) -> pa.Table:
                out = fn(t.to_pandas())
                # pandas-format scans may legally return an Arrow table
                # (map_groups accepts either); normalize here
                if isinstance(out, pa.Table):
                    return out
                return pa.Table.from_pandas(out, preserve_index=False)

        else:
            wrapped = fn
        return grouped_scan_fs(
            ds, key, wrapped, num_parts=num_parts, hot_keys=hot_keys
        )

    def add_part(t: pa.Table) -> pa.Table:
        pids = _part_ids(t.column(key), num_parts)
        if hot_keys:
            pids = _apply_hot_override(t, key, pids, hot_keys, num_parts)
        return t.append_column("__part", pids)

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    out = parted.groupby("__part").map_groups(fn, batch_format=batch_format)
    return out


def grouped_scan_fs(
    ds: Dataset,
    key: str,
    fn,
    *,
    num_parts: int = 64,
    scratch_root: str | None = None,
    empty_result: pa.Table | None = None,
    hot_keys: list[str] | None = None,
) -> Dataset:
    """``grouped_scan`` with a FILESYSTEM exchange instead of Ray's sort
    shuffle — for PAYLOAD-HEAVY grouped scans. ``hot_keys`` routes the
    named keys to dedicated partitions beyond ``num_parts`` (see
    :func:`grouped_scan`); dedicated fragment dirs assemble exactly like
    hashed ones.

    Ray's sort-based all-to-all moves every byte through the object store
    with a full sort (measured: 7.3 s of conv_texts' 8.9 s at sf0.1 is the
    Sort operator on 400 MB of text). Here the map side writes lz4
    fragments per coarse key partition (the sink's fan-out machinery —
    sequential I/O, no sort), and one task per partition concatenates its
    fragments and runs ``fn`` on the co-located arrow table. On a cluster
    the scratch dir must be on shared storage (S3/NFS) — the same
    requirement as the sink's exchange, ENFORCED at runtime: on a
    multi-node cluster a node-local default (/dev/shm, /tmp) would split
    fragments across nodes and each assemble task would silently
    concatenate only its local subset, so the call refuses unless the
    caller names a shared ``scratch_root`` (or sets
    ``OCR_RAY_GS_SCRATCH``). Results return as one block per partition
    via ``from_arrow_refs``."""
    import shutil
    import uuid
    import zlib

    import ray
    import ray.data as rd

    from ocr_ray.state.sink import _fanout_batch

    scratch_root = scratch_root or os.environ.get("OCR_RAY_GS_SCRATCH")
    if scratch_root is None:
        n_alive = sum(1 for n in ray.nodes() if n.get("Alive", False))
        if n_alive > 1:
            raise RuntimeError(
                "grouped_scan_fs: the default scratch root is node-local; on a "
                f"{n_alive}-node cluster fragments would be split per node and "
                "assembled partially. Pass scratch_root=<shared dir (NFS/S3-"
                "mounted)> or set OCR_RAY_GS_SCRATCH, or use exchange='ray'."
            )
        scratch_root = (
            "/dev/shm/ocr_ray_scratch"
            if os.access("/dev/shm", os.W_OK)
            else "/tmp/ocr_ray_scratch"
        )
    frag_root = os.path.join(scratch_root, f"gsfs-{uuid.uuid4().hex[:12]}")
    os.makedirs(frag_root, exist_ok=True)

    def fan(t: pa.Table) -> pa.Table:
        pids = _part_ids(t.column(key), num_parts)
        if hot_keys:
            pids = _apply_hot_override(t, key, pids, hot_keys, num_parts)
        return _fanout_batch(t.append_column("part_id", pids), frag_root=frag_root)

    summaries = ds.map_batches(fan, batch_format="pyarrow").take_all()
    pending = sorted({r["part_id"] for r in summaries})
    if not pending:
        # an all-empty input writes no fragments; hand back a TYPED empty
        # (from_arrow_refs([]) would yield a schema-less dataset). Without
        # an explicit empty_result, derive one by running fn on a typed
        # empty input table — the same result the Ray-sort path produces.
        shutil.rmtree(frag_root, ignore_errors=True)
        if empty_result is None:
            try:
                sch = ds.schema()
                pa_sch = getattr(sch, "base_schema", sch)
                empty_result = fn(pa_sch.empty_table())
            except Exception:
                return rd.from_arrow_refs([])
        return rd.from_arrow(empty_result)

    def assemble(pid: int) -> pa.Table:
        import pyarrow.parquet as pq_

        d = os.path.join(frag_root, f"part-{int(pid):05d}")
        t = pa.concat_tables([pq_.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))])
        return fn(t.drop_columns(["part_id"]))

    task = ray.remote(assemble)
    try:
        refs = [task.remote(pid) for pid in pending]
        ray.get(refs)  # surface assemble failures HERE, not at consume time
    finally:
        # scratch is safe to drop either way: results live in the object
        # store once ray.get returns, and on failure the run is abandoned
        # (a leak in /dev/shm would otherwise outlive the job)
        shutil.rmtree(frag_root, ignore_errors=True)
    return rd.from_arrow_refs(refs)


def turn_context_stats(transcripts: Dataset) -> Dataset:
    """Per-turn cross-turn context: previous role, inter-turn gap, and
    reply-echo detection (turn text starting with the previous turn's text).

    The conversation-context pattern (SURVEY §2.4): co-locate by conv_id,
    order by turn_idx, vectorized lag scan — here via ``grouped_scan`` so
    Python overhead is per-partition, not per-conversation. SQL-gated
    (lag() window oracle)."""

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        conv = g["conv_id"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        role = g["role"].to_numpy()
        prev_role = np.roll(role, 1)
        prev_role = np.where(same, prev_role, "")
        ts_us = g["ts"].astype("int64").to_numpy()
        gap = ts_us - np.roll(ts_us, 1)
        gap = np.where(same, gap, 0)
        text = g["text"].to_numpy()
        prev_text = np.roll(text, 1)
        is_echo = np.array(
            [
                bool(s) and p != "" and t.startswith(p)
                for s, t, p in zip(same, text, prev_text)
            ]
        )
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": g["turn_idx"].to_numpy(),
                "prev_role": prev_role,
                "gap_us": gap.astype("int64"),
                "is_echo": is_echo,
            }
        )

    slim = transcripts.select_columns(["conv_id", "turn_idx", "role", "text", "ts"])
    return grouped_scan(slim, "conv_id", scan)


TURN_CONTEXT_STATS_SQL_TMPL = """
SELECT conv_id, turn_idx,
       COALESCE(lag(role) OVER w, '') AS prev_role,
       CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS BIGINT) AS gap_us,
       COALESCE(starts_with(text, lag(text) OVER w) AND lag(text) OVER w <> '', FALSE) AS is_echo
FROM read_parquet('{path}/*.parquet')
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""


def extract_context_turns(transcripts: Dataset) -> Dataset:
    """CONTEXT-AWARE extraction engine: a turn that opens by quoting the
    entire previous turn (reply-echo) has that echoed prefix stripped
    BEFORE extraction, so the duplicated content doesn't pollute main_text.
    Turn-local engines stay the default contract; this is the opt-in
    ``groupby(conv_id)`` co-located variant (SURVEY §2.4, VERDICT r1 #8)."""
    from ocr_ray.core.extract import extract_turn

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        conv = g["conv_id"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        text = g["text"].to_numpy()
        prev_text = np.roll(text, 1)
        out_main, out_err, stripped = [], [], []
        for s, t, p in zip(same, text, prev_text):
            t = t if isinstance(t, str) else t
            if s and isinstance(p, str) and p != "" and isinstance(t, str) and t.startswith(p) and len(t) > len(p):
                r = extract_turn(t[len(p):])
                stripped.append(True)
            else:
                r = extract_turn(t)
                stripped.append(False)
            out_main.append(r.main_text)
            out_err.append(r.error)
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": g["turn_idx"].to_numpy(),
                "main_text": out_main,
                "error": out_err,
                "echo_stripped": stripped,
            }
        )

    slim = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    return grouped_scan(slim, "conv_id", scan)


def dialogue_pairs(extracted: Dataset) -> Dataset:
    """Cross-turn context view: each turn paired with the previous turn's
    role and extracted text head — a ``groupby(conv_id)`` co-located scan
    in turn order (the conversation-context pattern for engines that need
    neighbors)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # multi-conversation vectorized lag (coarse-key grouped_scan):
        # conversation boundaries masked, not one Python call per conv
        g = g.sort_values(["conv_id", "turn_idx"])
        conv = g["conv_id"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = conv[1:] == conv[:-1]
        prev_role = np.where(same, np.roll(g["role"].to_numpy(), 1), "")
        prev_head = np.where(
            same, np.roll(g["main_text"].str.slice(0, 80).to_numpy(), 1), ""
        )
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": g["turn_idx"].to_numpy(),
                "role": g["role"].to_numpy(),
                "prev_role": prev_role,
                "prev_text_head": prev_head,
            }
        )

    slim = extracted.select_columns(["conv_id", "turn_idx", "role", "main_text"])
    return grouped_scan(slim, "conv_id", pairs)


def tool_usage_stats(transcripts: Dataset) -> Dataset:
    """Per-tool rollup over tool turns (the ``tool`` input column):
    invocation count + distinct conversations using the tool.

    The distinct count never touches the driver: (tool, conv_id) pairs are
    pre-deduped per batch, deduped globally by one groupby, then counted
    per tool — the exact-distinct pattern (a driver ``unique()`` set would
    OOM at 10^12 conversations)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("role"), "tool"))
        out = pa.table(
            {
                "tool": t.column("tool"),
                "conv_id": t.column("conv_id"),
                "n": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = out.group_by(["tool", "conv_id"]).aggregate([("n", "sum")])
        return g.rename_columns(["tool", "conv_id", "n"])

    per_conv = (
        transcripts.map_batches(partial, batch_format="pyarrow")
        .groupby(["tool", "conv_id"])
        .aggregate(Sum("n", alias_name="n_calls"))
    )
    return per_conv.groupby("tool").aggregate(
        Sum("n_calls", alias_name="n_calls"), Count(alias_name="n_convs")
    )


def conv_texts(transcripts: Dataset) -> Dataset:
    """Conversation flattening: per-conversation concatenation of turn texts
    in turn order — the training-document assembly step (each conversation
    becomes ONE document for tokenize/pack downstream; pairs with
    ops.corpus.pack_sequences).

    Ordered group-concat is not a built-in Ray Data aggregate; the plan is
    the conversation-context pattern: ``grouped_scan`` co-locates each
    conv_id, then an ARROW-NATIVE vectorized concat per coarse partition —
    sort, find group boundaries by shifted compare, wrap the sorted text
    column in a zero-copy ListArray at those offsets, and ``binary_join``
    the lists in C++. No per-group Python (a pandas ``"\\n".join`` agg costs
    ~0.2 ms/group in Python calls — 12+ s at 60k conversations; this path
    measured 24.5 s -> ~8 s at sf0.1). Output is one row per conversation,
    bounded by conversation length — the corpus never transits the shuffle
    wider than its own bytes."""
    import numpy as np
    import pyarrow.compute as pc

    def flatten(t: pa.Table) -> pa.Table:
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "conv_text": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                }
            )
        conv = t.column("conv_id").combine_chunks()
        # NULL turn text participates as "" (position-preserving; a null
        # element would turn the whole binary_join result NULL) — the SQL
        # oracle coalesces identically
        texts = pc.coalesce(t.column("text"), pa.scalar("")).combine_chunks()
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
        bounds = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
        offsets = np.concatenate(([0], bounds, [n])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), texts)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(offsets[:-1])),
                "conv_text": pc.binary_join(lists, "\n"),
                "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    slim = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    # payload-heavy grouped scan: the filesystem exchange replaces Ray's
    # sort shuffle (7.3 s of the 8.9 s wall at sf0.1 was the Sort operator)
    return grouped_scan_fs(slim, "conv_id", flatten)


CONV_TEXTS_SQL_TMPL = """
SELECT conv_id,
       string_agg(coalesce(text, ''), chr(10) ORDER BY turn_idx) AS conv_text,
       CAST(COUNT(*) AS BIGINT) AS n_turns
FROM read_parquet('{path}/*.parquet')
GROUP BY conv_id
"""


def extract_links(transcripts: Dataset) -> Dataset:
    """Per-target link census over every turn: all ``href="..."`` values,
    counted per target — the anchor/link-graph building step of a web-scale
    corpus pipeline.

    Fully vectorized in Arrow (no per-row Python): split each text on the
    literal ``href="`` attribute prefix, drop the pre-match head, cut each
    tail at its closing quote. The DuckDB oracle applies the SAME
    split-on-literal semantics (string_split + strpos), so parity is by
    construction, not regex-dialect coincidence. Per-batch partial pre-agg
    means the shuffle carries (href, count) pairs, never text."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("text"), pattern='href="')
        tails = pc.list_flatten(pc.list_slice(parts, start=1))
        cut = pc.split_pattern(tails, pattern='"', max_splits=1)
        closed = cut.filter(pc.equal(pc.list_value_length(cut), 2))
        href = pc.list_element(closed, 0)
        tb = pa.table(
            {"href": href, "n": pa.array([1] * len(href), pa.int64())}
        )
        g = tb.group_by(["href"]).aggregate([("n", "sum")])
        return g.rename_columns(["href", "n"])

    slim = transcripts.select_columns(["text"])
    return (
        slim.map_batches(partial, batch_format="pyarrow")
        .groupby("href")
        .aggregate(Sum("n", alias_name="n"))
    )


EXTRACT_LINKS_SQL_TMPL = """
SELECT href, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT substr(tail, 1, strpos(tail, '"') - 1) AS href
  FROM (
    SELECT unnest(string_split(text, 'href="')[2:]) AS tail
    FROM read_parquet('{path}/*.parquet')
  )
  WHERE strpos(tail, '"') > 0
)
GROUP BY href
"""

def conv_response_latency(transcripts: Dataset) -> Dataset:
    """Per assistant turn: microseconds elapsed since the immediately
    preceding USER turn in the same conversation — the response-latency
    distribution of an agent transcript corpus (SLA audits, think-time
    features, turn-pacing analysis). Only adjacent (user -> assistant)
    pairs count: an assistant turn that follows a tool turn has no
    user-attributable latency and is skipped (mirrored via the
    prev_idx = turn_idx - 1 guard in SQL).

    Plan: one coarse-key ``grouped_scan`` co-locates each conversation;
    per partition a single sort on (conv_id, turn_idx) then a vectorized
    neighbor compare — no per-conversation Python. int64 microsecond
    math throughout (timestamp-difference parity with DuckDB date_diff).

    Contract (mirrored): NULL conv_id / turn_idx / role / ts rows are
    excluded (key, order, pairing and measure)."""
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx"))),
            pc.and_(pc.is_valid(t.column("role")), pc.is_valid(t.column("ts"))),
        )
        t = t.filter(m)
        return t.select(["conv_id", "turn_idx", "role", "ts"])

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"])
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "turn_idx": pd.Series([], dtype="int64"),
                    "latency_us": pd.Series([], dtype="int64"),
                }
            )
        conv = df["conv_id"].to_numpy()
        idx = df["turn_idx"].to_numpy(dtype=np.int64)
        role = df["role"].to_numpy()
        us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ok = np.zeros(n, dtype=bool)
        ok[1:] = (
            (conv[1:] == conv[:-1])
            & (idx[1:] == idx[:-1] + 1)
            & (role[1:] == "assistant")
            & (role[:-1] == "user")
        )
        lat = np.zeros(n, dtype=np.int64)
        lat[1:] = us[1:] - us[:-1]
        return pd.DataFrame(
            {
                "conv_id": conv[ok],
                "turn_idx": idx[ok],
                "latency_us": lat[ok],
            }
        )

    pre = transcripts.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "conv_id", scan, exchange="fs")


CONV_RESPONSE_LATENCY_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx, role, ts FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
    AND role IS NOT NULL AND ts IS NOT NULL
),
l AS (
  SELECT *,
         lag(role) OVER w AS prev_role,
         lag(ts) OVER w AS prev_ts,
         lag(turn_idx) OVER w AS prev_idx
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(date_diff('microsecond', prev_ts, ts) AS BIGINT) AS latency_us
FROM l
WHERE role = 'assistant' AND prev_role = 'user' AND prev_idx = turn_idx - 1
"""

def conv_tool_transitions(transcripts: Dataset) -> Dataset:
    """First-order Markov census over TOOL-CALL sequences: for each
    conversation, order its ``role='tool'`` turns by turn_idx and count
    every (prev_tool -> tool) pair corpus-wide — the which-tool-follows-
    which signal of agent-transcript analysis (exercises the ``tool``
    input column beyond the per-tool rollup).

    Plan: the ``event_type_transitions`` plan over transcripts — one
    coarse-key grouped scan co-locates each conversation, per-partition
    census partials, one null-safe groupby over (prev_tool, tool): the
    shuffle carries distinct census cells, never turns. First tool turn
    of a conversation pairs with nothing (rn > 1 rule, mirrored); a NULL
    tool name is a real census cell.

    Contract (mirrored): NULL conv_id / turn_idx rows are excluded (key
    and order)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx"))),
            pc.equal(t.column("role"), "tool"),
        )
        return t.filter(m).select(["conv_id", "turn_idx", "tool"])

    def census(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["conv_id", "turn_idx"])
        conv = df["conv_id"].to_numpy()
        cur = df["tool"].to_numpy()
        prev = np.roll(cur, 1)
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = conv[1:] == conv[:-1]
        part = pd.DataFrame({"prev_tool": prev[same], "tool": cur[same]})
        g = (
            part.groupby(["prev_tool", "tool"], dropna=False)
            .size()
            .reset_index(name="n")
        )

        def as_str(col: pd.Series) -> pa.Array:
            return pa.array([None if pd.isna(v) else v for v in col], pa.string())

        return pa.table(
            {
                "prev_tool": as_str(g["prev_tool"]),
                "tool": as_str(g["tool"]),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    pre = transcripts.map_batches(prep, batch_format="pyarrow")
    partials = grouped_scan(pre, "conv_id", census, exchange="fs")
    return null_safe_groupby_agg(
        partials, ["prev_tool", "tool"], Sum("n", alias_name="n")
    )


CONV_TOOL_TRANSITIONS_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx, tool FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND role = 'tool'
),
s AS (
  SELECT tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
)
SELECT prev_tool, tool, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE rn > 1
GROUP BY prev_tool, tool
"""


def dq_role_alternation(transcripts: Dataset) -> Dataset:
    """Transcript-structure data-quality audit: per conversation, the
    turn count and the number of STUTTERS (adjacent turns in turn_idx
    order with the same role — a malformed capture or a lost turn), plus
    whether the conversation opens with a user turn. The ingest-time
    validation a transcript corpus runs before extraction trusts
    (conv_id, turn_idx, role) structure.

    Plan: one coarse-key grouped scan per conversation; vectorized
    neighbor compare; per-conv rows ride out of the scan (no second
    shuffle).

    Contract (mirrored): NULL conv_id / turn_idx / role rows are
    excluded (all three define the structure being audited)."""
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx"))),
            pc.is_valid(t.column("role")),
        )
        return t.filter(m).select(["conv_id", "turn_idx", "role"])

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"])
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "n_turns": pd.Series([], dtype="int64"),
                    "n_stutters": pd.Series([], dtype="int64"),
                    "opens_with_user": pd.Series([], dtype="int64"),
                }
            )
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        first = np.ones(n, dtype=bool)
        first[1:] = conv[1:] != conv[:-1]
        stut = np.zeros(n, dtype=np.int64)
        stut[1:] = (~first[1:]) & (role[1:] == role[:-1])
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], n]
        cs = np.concatenate(([0], np.cumsum(stut)))
        return pd.DataFrame(
            {
                "conv_id": conv[starts],
                "n_turns": (ends - starts).astype(np.int64),
                "n_stutters": cs[ends] - cs[starts],
                "opens_with_user": (role[starts] == "user").astype(np.int64),
            }
        )

    pre = transcripts.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "conv_id", scan, exchange="fs")


DQ_ROLE_ALTERNATION_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx, role FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND role IS NOT NULL
),
s AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS n_stutters,
       CAST(MAX(CASE WHEN rn = 1 AND role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
         AS opens_with_user
FROM s GROUP BY conv_id
"""

_PROMPT_TOP_K = 20


def system_prompt_census(transcripts: Dataset, k: int = _PROMPT_TOP_K) -> pa.Table:
    """Top-``k`` most common SYSTEM-turn texts corpus-wide (n DESC, text
    ASC) — the which-system-prompts-dominate census run before dedup /
    mixture decisions on an agent-transcript corpus.

    Plan: text never transits the count shuffle — each batch reduces its
    system turns to (md5-digest, n) partials, one groupby folds them, and
    the driver pulls only the O(distinct prompts) digest counts
    (batch_size=None). Texts are then fetched ONLY for digests that can
    make the top-k (count > kth, plus the boundary ties at == kth) via a
    broadcast digest-set probe, and the final (n DESC, text ASC) sort
    happens on that bounded candidate set. Floor (documented, same
    convention as the global-rank hot-minute floor): a boundary count
    shared by a huge singleton tail makes the tie fetch large — the exact
    semantics of text-tie-broken top-k require it; cap k or pre-filter
    n >= 2 in such a domain.

    Contract (mirrored): only ``role = 'system'`` rows with non-NULL text
    count."""
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("role"), "system"), pc.is_valid(t.column("text")))
        return t.filter(m).select(["text"])

    def digest_census(t: pa.Table) -> pa.Table:
        digs = [
            hashlib.md5(s.encode("utf-8")).digest()
            for s in t.column("text").to_pylist()
        ]
        g = (
            pa.table({"dig": pa.array(digs, pa.binary(16))})
            .group_by(["dig"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["dig", "n"])

    sys_turns = transcripts.map_batches(prep, batch_format="pyarrow")
    counts = (
        sys_turns.map_batches(digest_census, batch_format="pyarrow")
        .groupby("dig")
        .aggregate(Sum("n", alias_name="n"))
    )
    digs, ns = [], []
    for b in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        digs.extend(b.column("dig").to_pylist())
        ns.extend(b.column("n").to_pylist())
    if not digs:
        return pa.table({"text": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    ns_arr = np.asarray(ns, dtype=np.int64)
    kth = np.sort(ns_arr)[::-1][min(k, len(ns_arr)) - 1]
    cand = {d for d, n in zip(digs, ns) if n >= kth}
    n_of = {d: int(n) for d, n in zip(digs, ns) if n >= kth}
    import ray as _ray

    cand_ref = _ray.put(cand)

    def fetch(t: pa.Table, _c=cand_ref) -> pa.Table:
        import hashlib as _h

        cset = _ray.get(_c)
        texts = t.column("text").to_pylist()
        keep, dkeep = [], []
        seen = set()
        for s in texts:
            dg = _h.md5(s.encode("utf-8")).digest()
            if dg in cset and dg not in seen:
                seen.add(dg)
                keep.append(s)
                dkeep.append(dg)
        return pa.table(
            {"text": pa.array(keep, pa.string()), "dig": pa.array(dkeep, pa.binary(16))}
        )

    cand_rows = sys_turns.map_batches(fetch, batch_format="pyarrow")
    # bounded candidate set -> driver: dedup across batches, final order
    best: dict[bytes, str] = {}
    for b in cand_rows.iter_batches(batch_size=None, batch_format="pyarrow"):
        for s, dg in zip(b.column("text").to_pylist(), b.column("dig").to_pylist()):
            best.setdefault(dg, s)
    rows = sorted(((n_of[dg], s) for dg, s in best.items()), key=lambda r: (-r[0], r[1]))[:k]
    return pa.table(
        {
            "text": pa.array([s for _, s in rows], pa.string()),
            "n": pa.array([n for n, _ in rows], pa.int64()),
        }
    )


SYSTEM_PROMPT_CENSUS_SQL_TMPL = """
SELECT text, CAST(COUNT(*) AS BIGINT) AS n
FROM read_parquet('{path}/*.parquet')
WHERE role = 'system' AND text IS NOT NULL
GROUP BY text
ORDER BY n DESC, text
LIMIT 20
"""


def conv_digest_pairs(transcripts: Dataset) -> Dataset:
    """(digest, conv_id) pairs: one md5 per conversation over its ordered
    (role, text) turn sequence — the shared front half of conversation-level
    dedup (census in ``conv_dedup_exact``, survivor filtering in
    ``training_data.sft_dataset_full``). Only 16-byte-digest pairs leave the
    co-location scan.

    Contract: NULL conv_id / turn_idx rows are excluded (key and order);
    NULL role / text participate as '' (position-preserving); injective
    separators (role <US> text, turns joined by <RS>) so no concatenation
    collision can alias two different sequences; (conv_id, turn_idx) is
    assumed unique (the input_hint natural key)."""
    import hashlib

    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx")))
        t = t.filter(m)
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "part": pc.binary_join_element_wise(
                    pc.coalesce(t.column("role"), pa.scalar("")),
                    pc.coalesce(t.column("text"), pa.scalar("")),
                    "\x1f",
                ),
            }
        )

    def digest_per_conv(t: pa.Table) -> pa.Table:
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"digest": pa.array([], pa.string()), "conv_id": pa.array([], pa.string())}
            )
        conv = t.column("conv_id").combine_chunks()
        parts = t.column("part").combine_chunks()
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
        bounds = np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1
        offsets = np.concatenate(([0], bounds, [n])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), parts)
        joined = pc.binary_join(lists, "\x1e")
        digests = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in joined.to_pylist()
        ]
        return pa.table(
            {
                "digest": pa.array(digests, pa.string()),
                "conv_id": conv.take(pa.array(offsets[:-1])),
            }
        )

    slim = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    return grouped_scan_fs(
        slim.map_batches(prep, batch_format="pyarrow"),
        "conv_id",
        digest_per_conv,
        empty_result=pa.table(
            {"digest": pa.array([], pa.string()), "conv_id": pa.array([], pa.string())}
        ),
    )


def conv_dedup_exact(transcripts: Dataset) -> Dataset:
    """CONVERSATION-level exact dedup census: two conversations are
    duplicates iff their full ordered (role, text) turn sequences are
    identical — the whole-dialogue dedup pass a transcript corpus runs
    BEFORE turn-level dedup (retry storms and re-ingested sessions
    duplicate entire conversations, not single turns). One row per
    distinct content digest: the surviving conv_id (min), the group size.

    Plan: the conv_texts machinery — a filesystem-exchange grouped scan
    co-locates each conversation's turns; per partition the sorted turn
    texts are wrapped zero-copy in a ListArray and joined in C++ with
    injective separators (role <US> text, turns joined by <RS> — no
    concatenation collision can alias two different sequences), then one
    md5 per CONVERSATION (not per turn). Only (digest, conv_id) pairs —
    16-byte digests, never text — transit the final tiny groupby, so the
    dedup decision shuffles O(conversations) rows at any corpus size.

    Contract (mirrored in SQL): NULL conv_id / turn_idx rows are excluded
    (key and order); NULL role / text participate as '' (position-
    preserving); (conv_id, turn_idx) is assumed unique (the input_hint
    natural key) — duplicate turn_idx would make both engines' within-key
    order unstable."""
    from ray.data.aggregate import Count, Min

    return conv_digest_pairs(transcripts).groupby("digest").aggregate(
        Min("conv_id", alias_name="keep_conv"), Count(alias_name="n_convs")
    )


CONV_DEDUP_EXACT_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx,
         coalesce(role, '') AS role, coalesce(text, '') AS text
  FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
),
d AS (
  SELECT conv_id,
         md5(string_agg(role || chr(31) || text, chr(30) ORDER BY turn_idx)) AS digest
  FROM t GROUP BY conv_id
)
SELECT digest, min(conv_id) AS keep_conv, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM d GROUP BY digest
"""


_SFT_CTX_CHARS = 512


def sft_examples(
    transcripts: Dataset,
    ctx_chars: int = _SFT_CTX_CHARS,
    *,
    include_response: bool = False,
) -> Dataset:
    """SFT training-pair assembly: for every assistant turn with at least
    one preceding turn in its conversation, emit the turn key, the FULL
    context length, and the context TAIL capped to ``ctx_chars`` characters
    — the (prompt-context, response) example construction step of a
    supervised-fine-tuning pipeline over agent transcripts (the capped tail
    is what a bounded-context tokenizer would actually consume).

    Context = all prior turns of the conversation rendered as
    ``role: text`` and joined by newlines, in turn order.

    Plan: the conv_texts machinery co-locates each conversation through the
    filesystem exchange; per partition the rendered turn strings are joined
    ONCE per conversation in C++ (zero-copy ListArray + binary_join), and
    each assistant turn's context is a SLICE of that joined string at the
    cumulative-codepoint offset — so per-turn work is one C-level string
    slice, not a per-turn re-join (the naive quadratic assembly). Tail
    slicing is by CODE POINTS to match DuckDB right()/length() semantics.

    Contract (mirrored in SQL): NULL conv_id / turn_idx rows excluded (key
    and order); NULL role / text render as ''; assistant turns with no
    prior turn produce no example (string_agg over an empty frame is NULL).

    ``include_response=True`` (the ``sft_dataset_full`` composition)
    additionally carries the assistant turn's raw text as ``response`` +
    ``resp_chars`` — off by default so the gated oracle schema is stable.
    """
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx")))
        t = t.filter(m)
        cols = {
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "role": pc.coalesce(t.column("role"), pa.scalar("")),
            "part": pc.binary_join_element_wise(
                pc.coalesce(t.column("role"), pa.scalar("")),
                pc.coalesce(t.column("text"), pa.scalar("")),
                ": ",
            ),
        }
        if include_response:
            cols["resp"] = pc.coalesce(t.column("text"), pa.scalar(""))
        return pa.table(cols)

    ecols = {
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "ctx_chars": pa.array([], pa.int64()),
        "ctx_tail": pa.array([], pa.string()),
    }
    if include_response:
        ecols["response"] = pa.array([], pa.string())
        ecols["resp_chars"] = pa.array([], pa.int64())
    empty = pa.table(ecols)

    def assemble(t: pa.Table) -> pa.Table:
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = t.num_rows
        if n == 0:
            return empty
        conv = t.column("conv_id").combine_chunks()
        parts = t.column("part").combine_chunks()
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = neq.to_numpy(zero_copy_only=False)
        offsets = np.flatnonzero(starts)
        bounds = np.concatenate((offsets, [n])).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), parts)
        joined = pc.binary_join(lists, "\n").to_pylist()
        # cumulative context END (in code points) for each row within its
        # conversation: sum of prior part lengths + (j-1) newline joiners
        plen = pc.utf8_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(plen)
        grp = np.cumsum(starts) - 1  # conversation ordinal per row
        base = np.concatenate(([0], cum))[offsets][grp]  # cum before conv start
        local = np.arange(n, dtype=np.int64) - offsets[grp]  # j within conv
        ctx_end = (cum - plen - base) + np.maximum(local - 1, 0)  # len of joined prefix
        is_asst = pc.equal(t.column("role"), "assistant").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(is_asst & (local >= 1))
        tails = []
        for i in sel:
            s = joined[grp[i]]
            e = int(ctx_end[i])
            tails.append(s[max(0, e - ctx_chars) : e])
        cols = {
            "conv_id": conv.take(pa.array(sel)),
            "turn_idx": pc.cast(
                t.column("turn_idx").combine_chunks().take(pa.array(sel)), pa.int64()
            ),
            "ctx_chars": pa.array(ctx_end[sel], pa.int64()),
            "ctx_tail": pa.array(tails, pa.string()),
        }
        if include_response:
            resp = t.column("resp").combine_chunks().take(pa.array(sel))
            cols["response"] = resp
            cols["resp_chars"] = pc.cast(pc.utf8_length(resp), pa.int64())
        return pa.table(cols)

    slim = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    return grouped_scan_fs(
        slim.map_batches(prep, batch_format="pyarrow"),
        "conv_id",
        assemble,
        empty_result=empty,
    )


SFT_EXAMPLES_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx, coalesce(role, '') AS role,
         coalesce(role, '') || ': ' || coalesce(text, '') AS part
  FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
),
w AS (
  SELECT conv_id, turn_idx, role,
         string_agg(part, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS ctx
  FROM t
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(length(ctx) AS BIGINT) AS ctx_chars,
       right(ctx, 512) AS ctx_tail
FROM w
WHERE role = 'assistant' AND ctx IS NOT NULL
"""


def tool_latency_stats(transcripts: Dataset) -> Dataset:
    """Per-tool execution-latency rollup: for every ``role='tool'`` turn
    whose IMMEDIATE successor turn exists (turn_idx + 1 in the same
    conversation), measure the wait in microseconds until that successor's
    timestamp, and aggregate per tool name — the which-tools-stall-the-agent
    signal (completes the ``tool``-column family: rollup, Markov
    transitions, and now latency).

    Plan: same shape as ``conv_response_latency`` — filter + project, one
    coarse-key grouped scan per conversation, vectorized neighbor compare,
    then per-partition census partials so the final null-safe groupby moves
    one (tool, n, sum, max) row per partition per tool.

    Contract (mirrored): NULL conv_id / turn_idx / ts rows are excluded
    (key, order, measure — a NULL-ts successor breaks adjacency for its
    predecessor too, identically in both engines); NULL tool would be a
    real census cell (the fixture has none for tool turns, but the plan is
    null-safe)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx"))),
            pc.is_valid(t.column("ts")),
        )
        return t.filter(m).select(["conv_id", "turn_idx", "role", "tool", "ts"])

    def census(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["conv_id", "turn_idx"])
        n = len(df)
        if n == 0:
            return pa.table(
                {
                    "tool": pa.array([], pa.string()),
                    "n_calls": pa.array([], pa.int64()),
                    "total_wait_us": pa.array([], pa.int64()),
                    "max_wait_us": pa.array([], pa.int64()),
                }
            )
        conv = df["conv_id"].to_numpy()
        idx = df["turn_idx"].to_numpy(dtype=np.int64)
        role = df["role"].to_numpy()
        us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ok = np.zeros(n, dtype=bool)
        ok[:-1] = (
            (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1) & (role[:-1] == "tool")
        )
        wait = np.zeros(n, dtype=np.int64)
        wait[:-1] = us[1:] - us[:-1]
        part = pd.DataFrame({"tool": df["tool"].to_numpy()[ok], "wait": wait[ok]})
        g = (
            part.groupby("tool", dropna=False)["wait"]
            .agg(n_calls="size", total_wait_us="sum", max_wait_us="max")
            .reset_index()
        )
        return pa.table(
            {
                "tool": pa.array(
                    [None if pd.isna(v) else v for v in g["tool"]], pa.string()
                ),
                "n_calls": pa.array(g["n_calls"].to_numpy(np.int64)),
                "total_wait_us": pa.array(g["total_wait_us"].to_numpy(np.int64)),
                "max_wait_us": pa.array(g["max_wait_us"].to_numpy(np.int64)),
            }
        )

    pre = transcripts.map_batches(prep, batch_format="pyarrow")
    partials = grouped_scan(pre, "conv_id", census, exchange="fs")
    out = null_safe_groupby_agg(
        partials,
        ["tool"],
        Sum("n_calls", alias_name="n_calls"),
        Sum("total_wait_us", alias_name="total_wait_us"),
        Max("max_wait_us", alias_name="max_wait_us"),
    )
    # a legitimately-empty rollup (no tool turn with an immediate successor)
    # yields ZERO blocks in Ray 2.49 — union one typed 0-row block so the
    # schema survives; costs nothing when non-empty
    import ray.data as rd

    empty = rd.from_arrow(
        pa.schema(
            [
                ("tool", pa.string()),
                ("n_calls", pa.int64()),
                ("total_wait_us", pa.int64()),
                ("max_wait_us", pa.int64()),
            ]
        ).empty_table()
    )
    return out.union(empty)


TOOL_LATENCY_SQL_TMPL = """
WITH t AS (
  SELECT conv_id, turn_idx, role, tool, ts
  FROM read_parquet('{path}/*.parquet')
  WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL AND ts IS NOT NULL
),
l AS (
  SELECT *,
         lead(ts) OVER w AS next_ts,
         lead(turn_idx) OVER w AS next_idx
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(SUM(date_diff('microsecond', ts, next_ts)) AS BIGINT) AS total_wait_us,
       CAST(MAX(date_diff('microsecond', ts, next_ts)) AS BIGINT) AS max_wait_us
FROM l
WHERE role = 'tool' AND next_idx = turn_idx + 1
GROUP BY tool
"""


def conv_assistant_echo(transcripts: Dataset) -> Dataset:
    """Within-conversation assistant self-repetition census: per
    conversation, how many assistant turns there are and how many EXACTLY
    repeat an earlier assistant turn of the same conversation — the
    model-loop detector an SFT gate runs before training on agent
    transcripts (a looping assistant produces byte-identical retries).

    Plan: filter to assistant turns per batch (role/text projected), one
    coarse-key grouped scan by conv_id; per partition a single pandas
    sort + ``groupby(conv).duplicated()`` (C-speed first-occurrence scan)
    marks echoes, and the per-conversation census reduces in the same
    pass — the exchange carries (conv_id, turn_idx, text) for assistant
    turns only, and one (conv_id, n_assistant, n_echo) row returns per
    conversation.

    Contract (mirrored in SQL): NULL conv_id / turn_idx rows are excluded
    (key and order); NULL text reads as '' (two NULL-text turns echo)."""
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx"))),
                pc.equal(pc.coalesce(t.column("role"), pa.scalar("")), "assistant"),
            )
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "text": pc.coalesce(t.column("text"), pa.scalar("")),
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"])
        echo = g.groupby("conv_id", sort=False)["text"].transform(
            lambda s: s.duplicated(keep="first")
        )
        out = g.assign(echo=echo.astype("int64")).groupby("conv_id", sort=False).agg(
            n_assistant=("text", "size"), n_echo=("echo", "sum")
        )
        return out.reset_index().astype({"n_assistant": "int64", "n_echo": "int64"})

    slim = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    return grouped_scan(slim.map_batches(prep, batch_format="pyarrow"), "conv_id", scan, exchange="fs")


CONV_ASSISTANT_ECHO_SQL_TMPL = """
WITH a AS (
  SELECT conv_id, turn_idx, coalesce(text, '') AS txt
  FROM read_parquet('{path}/*.parquet')
  WHERE coalesce(role, '') = 'assistant'
    AND conv_id IS NOT NULL AND turn_idx IS NOT NULL
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_assistant,
       CAST(COUNT(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM a p
         WHERE p.conv_id = a.conv_id AND p.turn_idx < a.turn_idx AND p.txt = a.txt
       )) AS BIGINT) AS n_echo
FROM a GROUP BY conv_id
"""


_NOVELTY_EMPTY = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "n_distinct": pa.array([], pa.int64()),
        "n_new": pa.array([], pa.int64()),
    }
)


def _novelty_census(tok: pd.DataFrame, conv_values) -> pa.Table:
    """Shared per-partition census: ``tok`` holds one row per DISTINCT
    (conv code c, turn t, token code/hash k); first-appearance turns via
    groupby-transform(min), then the per-turn rollup."""
    first = tok.groupby(["c", "k"])["t"].transform("min")
    tok = tok.assign(new=(tok["t"] == first).astype(np.int64))
    out = (
        tok.groupby(["c", "t"], sort=False)
        .agg(n_distinct=("k", "size"), n_new=("new", "sum"))
        .reset_index()
    )
    return pa.table(
        {
            "conv_id": conv_values.take(pa.array(out["c"].to_numpy())),
            "turn_idx": pa.array(out["t"].to_numpy(), pa.int64()),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(), pa.int64()),
            "n_new": pa.array(out["n_new"].to_numpy(), pa.int64()),
        }
    )


def _novelty_prep_filter(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    t = t.filter(
        pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx")))
    )
    return pa.table(
        {
            "conv_id": t.column("conv_id"),
            "turn_idx": pc.cast(t.column("turn_idx"), pa.int64()),
            "text": pc.coalesce(t.column("text"), pa.scalar("")),
        }
    )


def conv_token_novelty(transcripts: Dataset) -> Dataset:
    """Per-turn token-novelty curve: for every (conv, turn), the DISTINCT
    token count and how many of those tokens appear for the FIRST time in
    that conversation at that turn — the within-dialogue repetition
    profile (a flat novelty curve means the conversation is rehashing
    itself; SFT gates drop the stale tail).

    Tokenizer is the repo-wide UNNEST convention (split on single spaces,
    empties preserved — ``string_split(text, ' ')`` in the mirror).

    Plan (VERDICT r2 #2 — the TOKEN-HASH exchange): tokenize MAP-SIDE and
    ship each turn as (conv_id, turn_idx, large_list<int64> of distinct
    64-bit token hashes) — fixed 8 bytes per distinct token, conv_id once
    per TURN, so the co-location exchange never carries token text (the
    round-1/2 payload-heavy-class criticism). Per-turn distinctness is
    exact map-side because a turn is one input row. Inside the partition
    the census is the same integer-code pipeline as before, minus the
    tokenize (already done) and minus any string traffic.

    Collision bound: the census compares hashes only WITHIN one
    conversation; with d distinct tokens per conversation the probability
    any pair collides is <= d^2/2^65 (d = 10^6 -> 2.7e-8 per conversation),
    and a collision shifts one turn's n_new by at most 1. The
    text-payload sibling :func:`conv_token_novelty_exact` is collision-
    free and gated against the same SQL mirror.

    Contract (mirrored in SQL): NULL conv_id / turn_idx rows are
    excluded (key and order); NULL text reads as '' (one empty token)."""
    import pandas.util as pdu
    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        t = _novelty_prep_filter(t)
        parts = pc.split_pattern(t.column("text"), " ")
        lens = (
            pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(parts).combine_chunks()
        h = pdu.hash_array(
            flat.to_numpy(zero_copy_only=False), categorize=False
        ).view(np.int64)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        d = pd.DataFrame({"r": rows, "k": h}).drop_duplicates()
        counts = np.bincount(d["r"].to_numpy(), minlength=t.num_rows)
        order = np.argsort(d["r"].to_numpy(), kind="stable")
        offsets = np.concatenate(([0], np.cumsum(counts)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(d["k"].to_numpy()[order], pa.int64()),
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "tok_hashes": lists,
            }
        )

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _NOVELTY_EMPTY
        lens = (
            pc.list_value_length(t.column("tok_hashes"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = (
            pc.list_flatten(t.column("tok_hashes"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        conv_dict = pc.dictionary_encode(t.column("conv_id").combine_chunks())
        ccodes_row = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        turns = t.column("turn_idx").to_numpy(zero_copy_only=False)
        tok = pd.DataFrame(
            {"c": ccodes_row[rows], "t": turns[rows], "k": flat}
        ).drop_duplicates()  # no-op on unique (conv, turn) inputs
        return _novelty_census(tok, conv_dict.dictionary)

    slim = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    # fs exchange (measured win for this family) now carries only
    # fixed-width hashes; see grouped_scan_fs for the shared-storage rule
    return grouped_scan(
        slim.map_batches(prep, batch_format="pyarrow"),
        "conv_id",
        scan,
        batch_format="pyarrow",
        exchange="fs",
    )


def conv_token_novelty_exact(transcripts: Dataset) -> Dataset:
    """Collision-free sibling of :func:`conv_token_novelty`: the exchange
    payload is the turn TEXT (same contract as conv_texts); tokens are
    dictionary-coded inside the partition and never hashed. Same output,
    same SQL mirror — the calibration/audit path for the hashed default."""
    import pyarrow.compute as pc

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _NOVELTY_EMPTY
        parts = pc.split_pattern(t.column("text"), " ")
        lens = (
            pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(parts).combine_chunks()
        kcodes = (
            pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        conv_dict = pc.dictionary_encode(t.column("conv_id").combine_chunks())
        ccodes_row = conv_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        turns = t.column("turn_idx").to_numpy(zero_copy_only=False)
        tok = pd.DataFrame(
            {"c": ccodes_row[rows], "t": turns[rows], "k": kcodes}
        ).drop_duplicates()
        return _novelty_census(tok, conv_dict.dictionary)

    slim = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    # fs exchange: the co-location payload is the turn TEXT itself — the
    # payload-heavy shape where the fragment fan-out beats Ray's sort
    # all-to-all (measured back-to-back at sf0.1: ray 18.7-39.4 s vs fs
    # 13.1 s stable, identical rows; same class as conv_texts 8.9 -> 5.1)
    return grouped_scan(
        slim.map_batches(_novelty_prep_filter, batch_format="pyarrow"),
        "conv_id",
        scan,
        batch_format="pyarrow",
        exchange="fs",
    )


CONV_TOKEN_NOVELTY_SQL_TMPL = """
WITH tok AS (
  SELECT DISTINCT conv_id, turn_idx, tok
  FROM (
    SELECT conv_id, turn_idx,
           unnest(string_split(coalesce(text, ''), ' ')) AS tok
    FROM read_parquet('{path}/*.parquet')
    WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
  )
),
firsts AS (
  SELECT conv_id, tok, MIN(turn_idx) AS ft FROM tok GROUP BY 1, 2
)
SELECT k.conv_id, CAST(k.turn_idx AS BIGINT) AS turn_idx,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) FILTER (WHERE f.ft = k.turn_idx) AS BIGINT) AS n_new
FROM tok k JOIN firsts f ON f.conv_id = k.conv_id AND f.tok = k.tok
GROUP BY 1, 2
"""


def turn_markup_stats(transcripts: Dataset) -> Dataset:
    """Per-turn markup-density census — the tag-ratio / text-density
    ingredients the HTML boilerplate heuristics score on
    (extract-data-from-pdf.ts's DOM-payload path generalized), exposed as
    a gated dataflow surface: raw char count, '<' occurrences, paragraph
    opens, hyperlink opens, and data-URI flag per turn. Integer counts
    only (the classifier forms ratios downstream) so the gate is exact.

    Embarrassingly parallel: one vectorized count_substring pass per
    batch, zero shuffle. Contract (mirrored in SQL): NULL conv_id /
    turn_idx rows are excluded; NULL text reads as ''."""
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("conv_id")), pc.is_valid(t.column("turn_idx")))
        )
        txt = pc.coalesce(t.column("text"), pa.scalar(""))
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pc.cast(t.column("turn_idx"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_lt": pc.cast(pc.count_substring(txt, "<"), pa.int64()),
                "n_p_open": pc.cast(pc.count_substring(txt, "<p>"), pa.int64()),
                "n_href": pc.cast(pc.count_substring(txt, "href="), pa.int64()),
                "is_data_uri": pc.cast(
                    pc.starts_with(txt, "data:"), pa.int64()
                ),
            }
        )

    slim = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    return slim.map_batches(stats, batch_format="pyarrow")


TURN_MARKUP_STATS_SQL_TMPL = """
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
       CAST(length(coalesce(text, '')) - length(replace(coalesce(text, ''), '<', ''))
            AS BIGINT) AS n_lt,
       CAST((length(coalesce(text, '')) - length(replace(coalesce(text, ''), '<p>', ''))) // 3
            AS BIGINT) AS n_p_open,
       CAST((length(coalesce(text, '')) - length(replace(coalesce(text, ''), 'href=', ''))) // 5
            AS BIGINT) AS n_href,
       CAST(CASE WHEN coalesce(text, '') LIKE 'data:%' THEN 1 ELSE 0 END AS BIGINT)
            AS is_data_uri
FROM read_parquet('{path}/*.parquet')
WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
"""


def conv_lang_profile(transcripts: Dataset) -> Dataset:
    """Per-conversation language mixture: one row per (conv, predicted
    language) with the turn count — the mixture report an SFT curation
    pass uses to route or drop code-switched dialogues. Scoring is the
    repo's deterministic lang-ID heuristic (``ops.textstats.lang_of``)
    over the RAW turn text; the oracle composes the SAME generated
    stopword-profile SQL (one source of truth, the
    ``lang_confusion_matrix`` pattern).

    Plan: per-batch scoring + (conv, lang) census partials, one small
    groupby Sum — the census, not the text, transits the shuffle.
    Contract (mirrored in SQL): NULL conv_id rows are excluded; NULL text
    scores as '' ('und')."""
    import pyarrow.compute as pc

    from ocr_ray.ops.textstats import lang_scores_vec

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("conv_id")))
        langs, _ = lang_scores_vec(t.column("text"))
        g = (
            pa.table({"conv_id": t.column("conv_id"), "lang_pred": langs})
            .group_by(["conv_id", "lang_pred"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["conv_id", "lang_pred", "n"])

    from ray.data.aggregate import Sum

    agg = (
        transcripts.select_columns(["conv_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "lang_pred"])
        .aggregate(Sum("n", alias_name="n_turns"))
    )

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "lang_pred": t.column("lang_pred"),
                "n_turns": pc.cast(t.column("n_turns"), pa.int64()),
            }
        )

    return agg.map_batches(cast, batch_format="pyarrow")


def conv_lang_profile_sql(path: str) -> str:
    """Oracle: the generated lang-ID SQL scored per turn, then the census.
    Built by composition (not .format — the generated scoring SQL contains
    regex character classes that a template formatter would mangle)."""
    from ocr_ray.ops.textstats import _lang_id_sql

    scored = _lang_id_sql(
        source=(
            f"(SELECT conv_id, coalesce(text, '') AS text "
            f"FROM read_parquet('{path}/*.parquet') WHERE conv_id IS NOT NULL)"
        ),
        id_cols="conv_id",
        text_col="text",
    )
    return f"""
WITH scored AS ({scored})
SELECT conv_id, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM scored GROUP BY conv_id, lang_pred
"""
