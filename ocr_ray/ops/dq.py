"""Data-quality & table-maintenance operators: referential-integrity audit,
snapshot diff (change-data capture), and keyset pagination.

These generalize the reference's pre-commit validation (save-to-mongodb.ts
asserts the row's shape before insert; save-to-google-sheet.ts re-reads the
sheet to diff before upsert) to corpus-level maintenance: FK orphan audits
across whole tables, an exact old-vs-new snapshot diff that ships only
(key, digest) pairs, and stable cursor pagination that never needs OFFSET.

Scale contract:
* ``dq_orphans`` reduces the child side to a (key, n) census inside each
  batch, then anti-joins keys-only against the parent (auto broadcast/hash by
  parent size via functions.joins.auto_join machinery) — rows never shuffle.
* ``orders_snapshot_diff`` hashes each row to a fixed 16-hex digest inside
  the scan; the one shuffle carries (key, side, digest) = ~30 B/row no matter
  how wide the table is. Classification is a vectorized boundary scan.
* ``orders_keyset_page`` keeps a per-batch partial top-``k`` (the page is a
  bound, not a sort): the driver merges at most ``k`` rows per block.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ocr_ray.functions.scalars import to_cents

__all__ = [
    "dq_orphans",
    "orders_snapshot_diff",
    "orders_keyset_page",
    "DQ_ORPHANS_SQL",
    "ORDERS_SNAPSHOT_DIFF_SQL",
    "ORDERS_KEYSET_PAGE_SQL",
]


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ---------------------------------------------------------------------------
# referential-integrity orphan audit
# ---------------------------------------------------------------------------

# the clean fixture has zero natural orphans, which would make the gate unable
# to distinguish a broken anti-join from a working one — so the audit runs over
# a deterministically perturbed child view: every key divisible by the prime is
# negated (guaranteed orphan; parent keys are positive). Same rule in SQL.
_PERTURB = {"lineitem_orders": 97, "orders_customer": 89, "events_customer": 83}


def _orphan_count(child: Dataset, parent: Dataset, key: str, prime: int):
    """(orphan_rows, distinct_orphan_keys) for one FK relation, keys-only.

    Size-gated join choice (the auto_join policy): a parent key column that
    fits the broadcast budget is collected ONCE and probed per batch with no
    shuffle (each hash join here otherwise pays Ray's fixed shuffle cost —
    measured 3x ~5.5 s for a 3-relation audit at sf0.1); a big parent goes
    through the keys-only anti hash join."""
    from ocr_ray.functions.joins import (
        _BROADCAST_JOIN_MAX_BYTES,
        anti_join_ds,
        anti_join_filter,
    )

    def census(t: pa.Table) -> pa.Table:
        # NULL FK is a different audit class (not an orphan): dropped in both
        # engines — SQL's count(DISTINCT k) would exclude a NULL anyway while
        # count(*) would not, so keeping them could never match
        t = t.filter(pc.is_valid(t.column(key)))
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        k = np.where(k % prime == 0, -k, k)
        uniq, cnt = np.unique(k, return_counts=True)
        return pa.table(
            {"k": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))}
        )

    child_keys = child.map_batches(census, batch_format="pyarrow")
    psize = parent.size_bytes() or (_BROADCAST_JOIN_MAX_BYTES + 1)
    if psize <= _BROADCAST_JOIN_MAX_BYTES:
        pk = np.concatenate(
            [
                b.column("pk").drop_null().to_numpy(zero_copy_only=False)
                for b in parent.iter_batches(batch_format="pyarrow", batch_size=None)
            ]
            or [np.zeros(0, np.int64)]
        )
        orphans = anti_join_filter(child_keys, "k", pk)
    else:
        orphans = anti_join_ds(child_keys, parent, on="k", right_on="pk")
    # the same key can appear in several blocks' census rows, so the exact
    # distinct count needs one cross-block merge; the driver holds only the
    # ORPHAN key census (an audit finding 10^9 orphans should fail fast, not
    # scale — the healthy-table output is near-empty)
    frames = [b for b in orphans.iter_batches(batch_format="pandas")]
    if not frames:
        return 0, 0
    merged = pd.concat(frames).groupby("k")["n"].sum()
    return int(merged.sum()), len(merged)


def dq_orphans(sf_dir: str) -> pd.DataFrame:
    """FK orphan audit over three relations (child keys with no parent row).

    Output: one row per relation with the orphan ROW count and the distinct
    orphan KEY count — the audit a resumable 100 TB ingest runs before
    promoting a snapshot."""
    relations = []
    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey"])
    orders_k = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"]).map_batches(
        lambda t: t.rename_columns(["pk"]), batch_format="pyarrow"
    )
    relations.append(("lineitem.l_orderkey->orders", li, orders_k, "l_orderkey", _PERTURB["lineitem_orders"]))

    od = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"])
    cust_k = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["pk"]), batch_format="pyarrow"
    )
    relations.append(("orders.o_custkey->customer", od, cust_k, "o_custkey", _PERTURB["orders_customer"]))

    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    cust_k2 = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["pk"]), batch_format="pyarrow"
    )
    relations.append(("events.user_id->customer", ev, cust_k2, "user_id", _PERTURB["events_customer"]))

    names, rows, keys = [], [], []
    for name, child, parent, key, prime in relations:
        r, k = _orphan_count(child, parent, key, prime)
        names.append(name)
        rows.append(r)
        keys.append(k)
    return pd.DataFrame(
        {
            "relation": names,
            "orphan_rows": np.array(rows, dtype=np.int64),
            "orphan_keys": np.array(keys, dtype=np.int64),
        }
    )


DQ_ORPHANS_SQL = f"""
WITH c1 AS (SELECT CASE WHEN l_orderkey % {_PERTURB['lineitem_orders']} = 0 THEN -l_orderkey ELSE l_orderkey END AS k FROM lineitem WHERE l_orderkey IS NOT NULL),
a1 AS (SELECT count(*) AS n, count(DISTINCT k) AS dk FROM (SELECT k FROM c1 ANTI JOIN orders ON c1.k = orders.o_orderkey)),
c2 AS (SELECT CASE WHEN o_custkey % {_PERTURB['orders_customer']} = 0 THEN -o_custkey ELSE o_custkey END AS k FROM orders WHERE o_custkey IS NOT NULL),
a2 AS (SELECT count(*) AS n, count(DISTINCT k) AS dk FROM (SELECT k FROM c2 ANTI JOIN customer ON c2.k = customer.c_custkey)),
c3 AS (SELECT CASE WHEN user_id % {_PERTURB['events_customer']} = 0 THEN -user_id ELSE user_id END AS k FROM events WHERE user_id IS NOT NULL),
a3 AS (SELECT count(*) AS n, count(DISTINCT k) AS dk FROM (SELECT k FROM c3 ANTI JOIN customer ON c3.k = customer.c_custkey))
SELECT relation, orphan_rows, orphan_keys FROM (VALUES
  ('lineitem.l_orderkey->orders', (SELECT n FROM a1), (SELECT dk FROM a1)),
  ('orders.o_custkey->customer', (SELECT n FROM a2), (SELECT dk FROM a2)),
  ('events.user_id->customer', (SELECT n FROM a3), (SELECT dk FROM a3))
) AS t(relation, orphan_rows, orphan_keys)
"""


# ---------------------------------------------------------------------------
# snapshot diff (change-data capture)
# ---------------------------------------------------------------------------

# the "new" snapshot is derived deterministically from the same table so the
# oracle can mirror it: keys %13 deleted, keys %7 repriced (+100 cents in the
# exact-integer domain), keys %11 re-inserted under the negated key.
_DEL, _UPD, _INS = 13, 7, 11


def _row_digest(status: list, cents: np.ndarray) -> list:
    """16-hex md5 of the canonical row string — what actually transits the
    shuffle instead of the row. C-speed loop (hashlib releases no work to
    numpy, same family as mlprep._md5_first_bytes)."""
    return [
        hashlib.md5(f"{s}|{c}".encode("ascii")).hexdigest()[:16]
        for s, c in zip(status, cents)
    ]


def orders_snapshot_diff(sf_dir: str) -> Dataset:
    """Exact diff of two table snapshots: one row per changed key, labeled
    insert / delete / update — the change-data-capture primitive an
    incremental 100 TB refresh is built on.

    Both snapshots stream as (key, side, digest) triples; the single shuffle
    co-locates each key's <=2 triples; classification is a vectorized run
    scan (no pandas merge, no driver state)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]

    def triples(t: pa.Table) -> pa.Table:
        # NULL keys can't be diffed (no identity); NULL attributes take
        # fixed sentinels so the digest is total — both mirrored in SQL
        t = t.filter(pc.is_valid(t.column("o_orderkey")))
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        status = pc.fill_null(t.column("o_orderstatus"), "").to_pylist()
        cents = (
            pc.fill_null(to_cents(t.column("o_totalprice")), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        old_h = _row_digest(status, cents)
        # new snapshot, derived in-scan: delete %13, reprice %7, insert -%11
        keep = k % _DEL != 0
        new_cents = np.where(k % _UPD == 0, cents + 100, cents)
        new_h = _row_digest(status, new_cents)
        ins = k % _INS == 0
        out_k = np.concatenate((k, k[keep], -k[ins]))
        out_side = np.concatenate(
            (
                np.zeros(len(k), np.int8),
                np.ones(int(keep.sum()), np.int8),
                np.ones(int(ins.sum()), np.int8),
            )
        )
        out_h = (
            old_h
            + [h for h, m in zip(new_h, keep) if m]
            + [h for h, m in zip(old_h, ins) if m]
        )
        return pa.table(
            {
                "k": pa.array(out_k),
                "side": pa.array(out_side),
                "h": pa.array(out_h, pa.string()),
            }
        )

    snap = rd.read_parquet(_pq(sf_dir, "orders"), columns=cols).map_batches(
        triples, batch_format="pyarrow"
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()), "change": pa.array([], pa.string())}
            )
        t = t.sort_by([("k", "ascending"), ("side", "ascending")])
        k = t.column("k").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        h = np.asarray(t.column("h").to_pylist(), dtype=object)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        span = np.diff(np.concatenate((starts, [n])))
        single = span == 1
        s_idx = starts[single]
        # run of 1: side 0 -> deleted, side 1 -> inserted
        out_k = [k[s_idx]]
        out_c = [np.where(side[s_idx] == 0, "delete", "insert")]
        both = starts[span == 2]
        if len(both):
            changed = h[both] != h[both + 1]
            out_k.append(k[both[changed]])
            out_c.append(np.full(int(changed.sum()), "update", dtype=object))
        return pa.table(
            {
                "o_orderkey": pa.array(np.concatenate(out_k).astype(np.int64)),
                "change": pa.array(
                    np.concatenate(out_c).astype(object).tolist(), pa.string()
                ),
            }
        )

    return grouped_scan(snap, "k", classify, batch_format="pyarrow").select_columns(
        ["o_orderkey", "change"]
    )


ORDERS_SNAPSHOT_DIFF_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, COALESCE(o_orderstatus, '') AS s,
         COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), -1) AS c
  FROM orders WHERE o_orderkey IS NOT NULL
),
old AS (SELECT k, substr(md5(s || '|' || CAST(c AS VARCHAR)), 1, 16) AS h FROM base),
new AS (
  SELECT k, substr(md5(s || '|' || CAST(CASE WHEN k % {_UPD} = 0 THEN c + 100 ELSE c END AS VARCHAR)), 1, 16) AS h
  FROM base WHERE k % {_DEL} <> 0
  UNION ALL
  SELECT -k AS k, substr(md5(s || '|' || CAST(c AS VARCHAR)), 1, 16) AS h
  FROM base WHERE k % {_INS} = 0
)
SELECT COALESCE(old.k, new.k) AS o_orderkey,
       CASE WHEN old.k IS NULL THEN 'insert'
            WHEN new.k IS NULL THEN 'delete'
            ELSE 'update' END AS change
FROM old FULL OUTER JOIN new ON old.k = new.k
WHERE old.k IS NULL OR new.k IS NULL OR old.h <> new.h
"""


# ---------------------------------------------------------------------------
# keyset pagination
# ---------------------------------------------------------------------------

_PAGE_K = 50
_CURSOR_DATE = np.datetime64("1998-01-01T00:00:00", "us")
_CURSOR_KEY = 0


def orders_keyset_page(sf_dir: str, *, k: int = _PAGE_K) -> pd.DataFrame:
    """Page of ``k`` orders after the cursor ``(o_orderdate, o_orderkey) >
    (D, K)`` in (date, key) order — OFFSET-free pagination, the only stable
    way to walk a 10^12-row table.

    Per-batch: vectorized tuple-compare filter + local top-``k``; the driver
    merges <= ``k`` rows per block (bounded, no global sort)."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def local_topk(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        after = (d > _CURSOR_DATE) | ((d == _CURSOR_DATE) & (key > _CURSOR_KEY))
        t = t.filter(pa.array(after))
        t = t.append_column("total_cents", to_cents(t.column("o_totalprice")))
        t = t.sort_by([("o_orderdate", "ascending"), ("o_orderkey", "ascending")])
        return t.slice(0, k).select(["o_orderkey", "o_orderdate", "total_cents"])

    parts = orders.map_batches(local_topk, batch_format="pyarrow")
    frames = [b for b in parts.iter_batches(batch_format="pandas")]
    merged = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(
            {
                "o_orderkey": pd.Series(dtype=np.int64),
                "o_orderdate": pd.Series(dtype="datetime64[us]"),
                "total_cents": pd.Series(dtype=np.int64),
            }
        )
    )
    return (
        merged.sort_values(["o_orderdate", "o_orderkey"])
        .head(k)
        .reset_index(drop=True)
    )


ORDERS_KEYSET_PAGE_SQL = f"""
SELECT o_orderkey, o_orderdate,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
   OR (o_orderdate = TIMESTAMP '1998-01-01 00:00:00' AND o_orderkey > {_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {_PAGE_K}
"""
# NOTE: spelled as an explicit OR, not a row-value comparison — DuckDB's
# tuple compare is a TOTAL order (NULL sorts last, so a NULL date would
# match the cursor predicate), while the engine's vectorized compare drops
# NULLs like three-valued SQL; the OR form has three-valued semantics too.


# ---------------------------------------------------------------------------
# z-order (Morton) clustering key
# ---------------------------------------------------------------------------

# 21 bits per dimension (42-bit z-value): at 2^21 distinct buckets per axis
# the interleave is exact for this fixture's full key ranges; wider keys
# would mask to their top bits (locality needs the HIGH bits, masking is the
# standard Morton truncation). The write path would .sort("zval") before
# write_partitioned so co-accessed (user, time) ranges land in the same
# files — the layout step that makes both per-user scans AND time-range
# scans prune well, where sorting by either single key serves only one.
_Z_BITS = 21


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Insert a zero bit between every bit of the low 21 bits of ``x``
    (classic Morton magic-number spreading, fully vectorized)."""
    v = x.astype(np.uint64) & np.uint64((1 << _Z_BITS) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def events_zorder(sf_dir: str) -> Dataset:
    """Morton (z-order) clustering key over (user_id, hour bucket) per event
    — the multi-dimensional sort key a 100 TB table is laid out by so range
    scans on EITHER dimension prune files.

    Embarrassingly parallel (five shift-and-mask passes per batch, no
    shuffle); the SQL oracle mirrors the interleave with a generated exact
    bit-arithmetic expression. NULL ts takes bucket 0 (documented, mirrored)."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def z(t: pa.Table) -> pa.Table:
        us = pc.fill_null(t.column("ts").cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        hour = (us // 3_600_000_000).astype(np.int64)
        u = (
            pc.fill_null(t.column("user_id"), 0)  # NULL key -> origin cell, mirrored
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        zval = (_spread_bits(u) | (_spread_bits(hour) << np.uint64(1))).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"), "zval": pa.array(zval)})

    return events.map_batches(z, batch_format="pyarrow")


def _z_sql_interleave(col: str, offset: int) -> str:
    """Exact SQL mirror of the bit interleave: bit i of ``col`` lands at
    output bit 2*i + offset."""
    terms = [
        f"(({col} >> {i}) & 1) * {1 << (2 * i + offset)}" for i in range(_Z_BITS)
    ]
    return " + ".join(terms)


EVENTS_ZORDER_SQL = f"""
SELECT event_id,
       CAST({_z_sql_interleave('(user_id & {umask})', 0)} +
            {_z_sql_interleave('(hb & {umask})', 1)} AS BIGINT) AS zval
FROM (
  SELECT event_id, COALESCE(user_id, 0) AS user_id,
         CASE WHEN ts IS NULL THEN 0 ELSE epoch_us(ts) // 3600000000 END AS hb
  FROM events
)
""".replace("{umask}", str((1 << _Z_BITS) - 1))


# ---------------------------------------------------------------------------
# gaps-and-islands: key-sequence completeness audit
# ---------------------------------------------------------------------------


def orderkey_islands(sf_dir: str) -> Dataset:
    """Maximal runs of consecutive o_orderkey values — the gaps-and-islands
    audit that tells an ingest whether a monotonically assigned key space
    arrived complete (every gap is a lost-batch suspect).

    Plan: distinct keys (one dedup shuffle, keys only), then island
    BOUNDARIES via two keys-only anti-joins — a key starts an island iff
    key-1 is absent, ends one iff key+1 is absent (no global sort, no
    window). The boundary sets have one row per ISLAND; they are paired
    rank-to-rank in a single co-located block (n-th start matches n-th end
    — boundaries strictly interleave). At 10^9 islands the pairing block
    itself would need the range-chunked rank machinery of
    ``events_global_rank``; for audit-shaped outputs the boundary set is
    assumed block-sized (documented, not silently capped — the pairing
    task OOMs loudly, it never truncates)."""
    from ray.data.aggregate import Count

    from ocr_ray.ops.dedup import _coerce_schema

    keys = _coerce_schema(
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"])
        .map_batches(
            lambda t: t.filter(pc.is_valid(t.column("o_orderkey")))
            .group_by(["o_orderkey"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("o_orderkey")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .rename_columns({"o_orderkey": "key"}),
        pa.schema([("key", pa.int64())]),
        parts=4,
    ).materialize()

    def shift(delta: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {"probe": pc.add(t.column("key"), pa.scalar(delta, pa.int64()))}
            )

        return f

    import ray.data as _rd

    n_parts = 4
    starts = keys.join(
        keys.map_batches(shift(1), batch_format="pyarrow"),
        join_type="left_anti",
        num_partitions=n_parts,
        on=("key",),
        right_on=("probe",),
    )
    ends = keys.join(
        keys.map_batches(shift(-1), batch_format="pyarrow"),
        join_type="left_anti",
        num_partitions=n_parts,
        on=("key",),
        right_on=("probe",),
    )

    def tag(name: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t.column("key"),
                    "is_start": pa.array(
                        np.full(t.num_rows, name == "s", dtype=bool)
                    ),
                }
            )

        return f

    both = starts.map_batches(tag("s"), batch_format="pyarrow").union(
        ends.map_batches(tag("e"), batch_format="pyarrow")
    )

    def pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"island_start": e, "island_end": e, "n_keys": e})
        k = t.column("key").to_numpy(zero_copy_only=False)
        s = t.column("is_start").to_numpy(zero_copy_only=False)
        st = np.sort(k[s])
        en = np.sort(k[~s])
        assert len(st) == len(en), "island boundaries must interleave"
        return pa.table(
            {
                "island_start": pa.array(st),
                "island_end": pa.array(en),
                "n_keys": pa.array(en - st + 1),
            }
        )

    return both.repartition(1).map_batches(pair, batch_format="pyarrow", batch_size=None)


ORDERKEY_ISLANDS_SQL = """
WITH k AS (
  SELECT DISTINCT o_orderkey AS key FROM orders WHERE o_orderkey IS NOT NULL
),
g AS (SELECT key, key - row_number() OVER (ORDER BY key) AS grp FROM k)
SELECT CAST(MIN(key) AS BIGINT) AS island_start,
       CAST(MAX(key) AS BIGINT) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM g GROUP BY grp
"""


# ---------------------------------------------------------------------------
# table profiling (per-column null/distinct census — the "describe" pass)
# ---------------------------------------------------------------------------


def profile_table(sf_dir: str, table: str, columns: list[str]) -> pd.DataFrame:
    """Per-column data profile: row count, NULL count, exact distinct count
    — the first pass any ingestion pipeline runs over an unknown table
    (schema drift, key-candidate discovery, join-cardinality planning).

    Scale plan, per column:
    * n_rows / n_null fold from per-batch partials (two ints per batch to
      the driver — never data);
    * n_distinct is the exact two-level dedup plan: ``pc.unique`` inside
      each batch first, so the one ``groupby`` shuffles only the
      batch-distinct keys (bounded by batch size, tiny for low-cardinality
      columns), then counts groups. NULLs are excluded (SQL
      COUNT(DISTINCT) semantics). Reads are single-column pruned.
    Timestamp keys dedup on their int64 microsecond view (injective);
    float keys normalize -0.0 to +0.0 first (SQL DISTINCT treats them
    equal). NaN payloads are out of contract (none in any fixture; NaN
    identity under Ray's sort shuffle differs from SQL's)."""

    def uniq_fn(c: str):
        def f(t: pa.Table) -> pa.Table:
            col = t.column(c).combine_chunks()
            col = col.drop_null()
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            elif pa.types.is_floating(col.type):
                col = pc.add(col, 0.0)  # -0.0 -> +0.0
            return pa.table({"v": pc.unique(col)})

        return f

    rows = []
    for c in columns:
        ds = rd.read_parquet(_pq(sf_dir, table), columns=[c])

        def stats(t: pa.Table, _c=c) -> pa.Table:
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "nn": pa.array([t.column(_c).null_count], pa.int64()),
                }
            )

        parts = ds.map_batches(stats, batch_format="pyarrow").take_all()
        n_rows = sum(int(r["n"]) for r in parts)
        n_null = sum(int(r["nn"]) for r in parts)
        n_distinct = (
            rd.read_parquet(_pq(sf_dir, table), columns=[c])
            .map_batches(uniq_fn(c), batch_format="pyarrow")
            .groupby("v")
            .count()
            .count()
        )
        rows.append((c, n_rows, n_null, int(n_distinct)))

    out = pd.DataFrame(rows, columns=["col_name", "n_rows", "n_null", "n_distinct"])
    return out.astype({"n_rows": "int64", "n_null": "int64", "n_distinct": "int64"})


_PROFILE_ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def profile_orders(sf_dir: str) -> pd.DataFrame:
    return profile_table(sf_dir, "orders", _PROFILE_ORDERS_COLS)


PROFILE_ORDERS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"""
    for c in _PROFILE_ORDERS_COLS
)


# ---------------------------------------------------------------------------
# anti-entropy partition checksums (order-independent table fingerprint)
# ---------------------------------------------------------------------------


def orders_partition_checksums(sf_dir: str) -> pa.Table:
    """Order-independent checksum of the orders table PER hash bucket —
    the anti-entropy primitive of replication/backfill verification: two
    replicas (or a table before/after a migration) agree iff every
    bucket's checksum agrees, and a disagreement names the bucket to
    re-sync — no row-level diff of the 10^12-row table.

    Each row canonicalizes to a '|'-joined string of NULL-tokened integer/
    string fields (floats go through exact cents — engine float formatting
    never enters the hash), hashes to a uint64 (md5 upper half, mirroring
    DuckDB's md5_number_lower), and XOR-folds into its bucket. XOR is
    commutative+associative, so any shard order / parallelism yields the
    identical checksum; caveat (standard for XOR sums): a row duplicated
    an EVEN number of times cancels out — pair with a per-bucket COUNT
    (emitted here) to close that hole. Partials are one (bucket, xor, n)
    row per batch; the driver folds <= 17 x n_blocks tiny rows."""
    ds = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    NULL_TOK = "\x00"

    def partial(t: pa.Table) -> pa.Table:
        cents = to_cents(t.column("o_totalprice"))
        keys = t.column("o_orderkey").to_pylist()
        rows = zip(
            keys,
            t.column("o_orderstatus").to_pylist(),
            t.column("o_orderpriority").to_pylist(),
            cents.to_pylist(),
        )
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        "|".join(
                            NULL_TOK if v is None else str(v) for v in (k, s, p, c)
                        ).encode("utf-8")
                    ).digest()[8:16],
                    "little",
                )
                for k, s, p, c in rows
            ),
            dtype=np.uint64,
            count=t.num_rows,
        )
        buckets = [None if k is None else k & 15 for k in keys]
        acc: dict = {}
        for b, h in zip(buckets, hs):
            prev_x, prev_n = acc.get(b, (np.uint64(0), 0))
            acc[b] = (prev_x ^ h, prev_n + 1)
        items = sorted(acc.items(), key=lambda kv: (kv[0] is None, kv[0]))
        return pa.table(
            {
                "bucket": pa.array([b for b, _ in items], pa.int64()),
                "checksum": pa.array([int(x) for b, (x, _) in items], pa.uint64()),
                "n_rows": pa.array([n for b, (_, n) in items], pa.int64()),
            }
        )

    parts = list(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    acc: dict = {}
    for p in parts:
        for b, x, n in zip(
            p.column("bucket").to_pylist(),
            p.column("checksum").to_pylist(),
            p.column("n_rows").to_pylist(),
        ):
            prev_x, prev_n = acc.get(b, (0, 0))
            acc[b] = (prev_x ^ x, prev_n + n)
    items = sorted(acc.items(), key=lambda kv: (kv[0] is None, kv[0]))
    return pa.table(
        {
            "bucket": pa.array([b for b, _ in items], pa.int64()),
            "checksum": pa.array([x for b, (x, _) in items], pa.uint64()),
            "n_rows": pa.array([n for b, (_, n) in items], pa.int64()),
        }
    )


ORDERS_PARTITION_CHECKSUMS_SQL = """
SELECT o_orderkey & 15 AS bucket,
       bit_xor(md5_number_lower(concat_ws('|',
         COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)),
         COALESCE(o_orderstatus, chr(0)),
         COALESCE(o_orderpriority, chr(0)),
         COALESCE(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR), chr(0))
       ))) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# fact-to-fact reconciliation: order header totals vs lineitem sums
# ---------------------------------------------------------------------------


def orders_price_reconciliation(sf_dir: str) -> Dataset:
    """Reconcile every order header's total against the SUM of its line
    items — the cross-table consistency audit (billing vs ledger, header
    vs detail) that runs after any backfill. Emits a census:
    ``match`` (header == exact cents sum), ``mismatch``, ``no_lines``
    (header with no/NULL line sum), ``null_price`` (NULL header total).

    Plan: lineitem pre-combines cents per l_orderkey per batch, ONE
    groupby reduces to order grain, and the header LEFT-joins that
    aggregate through ``auto_join`` (broadcast under the gate, hash
    shuffle above); classification is a vectorized CASE and only
    (status, count) partials reach the final tiny groupby. The pandas
    join lane turns absent/NULL int sums into NaN floats — the
    nan-or-null mask restores SQL three-valued classification."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.joins import auto_join

    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"]
    )

    def line_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("l_orderkey")))
        g = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "line_total_c": to_cents(t.column("l_extendedprice")),
            }
        ).group_by(["l_orderkey"]).aggregate([("line_total_c", "sum")])
        return g.rename_columns(["l_orderkey", "line_total_c"])

    line_agg = (
        line.map_batches(line_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("line_total_c", alias_name="line_total_c"))
    )

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_total_c": to_cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )

    joined = auto_join(orders, line_agg, on="o_orderkey", right_on="l_orderkey", how="left")

    def _nullish(col):
        m = pc.is_null(col)
        if pa.types.is_floating(col.type):
            # is_nan(NULL) is NULL — fill it, is_null already covers the row
            m = pc.or_(m, pc.fill_null(pc.is_nan(col), False))
        return m

    def classify(t: pa.Table) -> pa.Table:
        lt, ot = t.column("line_total_c"), t.column("o_total_c")
        no_lines = _nullish(lt)
        null_price = _nullish(ot)
        # compare in float64 (exact for cent magnitudes); masked rows never
        # reach the equality branch
        eq = pc.equal(
            pc.cast(pc.fill_null(ot, 0), pa.float64()),
            pc.cast(pc.fill_null(lt, 0), pa.float64()),
        )
        status = pc.if_else(
            no_lines,
            pa.scalar("no_lines"),
            pc.if_else(
                null_price,
                pa.scalar("null_price"),
                pc.if_else(eq, pa.scalar("match"), pa.scalar("mismatch")),
            ),
        )
        g = pa.table(
            {
                "recon_status": status,
                "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ).group_by(["recon_status"]).aggregate([("n_orders", "sum")])
        return g.rename_columns(["recon_status", "n_orders"])

    return (
        joined.map_batches(classify, batch_format="pyarrow")
        .groupby("recon_status")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


ORDERS_PRICE_RECONCILIATION_SQL = """
WITH l AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS line_total_c
  FROM lineitem
  WHERE l_orderkey IS NOT NULL
  GROUP BY 1
)
SELECT CASE WHEN line_total_c IS NULL THEN 'no_lines'
            WHEN o_total_c IS NULL THEN 'null_price'
            WHEN o_total_c = line_total_c THEN 'match'
            ELSE 'mismatch' END AS recon_status,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM (SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS o_total_c FROM orders) o
LEFT JOIN l ON o_orderkey = l_orderkey
GROUP BY 1
"""


def orders_benford_audit(sf_dir: str) -> Dataset:
    """Benford first-significant-digit census over order totals — the
    classic numeric-forensics / data-quality screen (fabricated or
    unit-mangled money columns deviate from the Benford distribution; the
    census is the screening input, judgment stays with the analyst).

    Exactness by construction: both engines take the FIRST CHARACTER OF
    THE DECIMAL STRING of |cents| — not a log10/power float round-trip,
    which could disagree at the 10^k boundaries. Fully vectorized
    (cast-to-string + slice per batch) and map-side pre-aggregated: the
    shuffle carries at most 9 (digit, n) rows per batch.

    Contract (mirrored): NULL prices are excluded; zero cents has no
    leading significant digit and is excluded; negatives audit as their
    magnitude."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.scalars import to_cents

    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_totalprice"])

    def census(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_totalprice")))
        c = pc.abs_checked(to_cents(t.column("o_totalprice")))
        c = c.filter(pc.greater(c, 0))
        digit = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(c, pa.string()), 0, 1), pa.int64()
        )
        g = (
            pa.table({"digit": digit, "n": pa.array(np.ones(len(digit), np.int64))})
            .group_by(["digit"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["digit", "n"])

    return (
        orders.map_batches(census, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
    )


ORDERS_BENFORD_SQL = """
WITH c AS (
  SELECT abs(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM c WHERE cents > 0
GROUP BY digit
"""


# ---------------------------------------------------------------------------
# key-skew profiler (shuffle-planning diagnostic)
# ---------------------------------------------------------------------------


def events_key_skew(sf_dir: str) -> pa.Table:
    """Group-size skew profile of ``events.user_id`` — the diagnostic this
    engine's own shuffle planning runs on: distinct keys, total rows, the
    hottest key's size and its share (basis points), and the exact p99
    group size. A top-1 share near 10000 bp says "salt this key before any
    groupby"; p99 >> median says the coarse-key grouped scans need more
    partitions. Exact, not sampled, so the gate hashes integers.

    Plan: per-batch (user, n) count partials -> ONE user-keyed groupby sum
    (the only key-cardinality exchange) -> per-batch SIZE-HISTOGRAM
    partials (size -> n_keys; distinct sizes are tiny) -> driver fold of
    the histogram. The p99 is read off the cumulative histogram with the
    ceil-rank rule, mirrored in SQL via a window cumsum — no global sort
    of group sizes anywhere.

    Contract (mirrored in SQL): NULL user_id rows are excluded."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        return t.group_by("user_id").aggregate([([], "count_all")]).rename_columns(
            ["user_id", "n"]
        )

    sizes = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        return t.group_by("n").aggregate([([], "count_all")]).rename_columns(
            ["size", "k"]
        )

    parts = [
        b
        for b in sizes.map_batches(hist_partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    empty = pa.table(
        {
            "n_keys": pa.array([0], pa.int64()),
            "n_rows": pa.array([0], pa.int64()),
            "max_size": pa.array([0], pa.int64()),
            "top1_share_bp": pa.array([0], pa.int64()),
            "p99_size": pa.array([0], pa.int64()),
        }
    )
    if not parts:
        return empty
    h = pa.concat_tables(parts).group_by("size").aggregate([("k", "sum")])
    size = h.column("size").to_numpy(zero_copy_only=False).astype(np.int64)
    k = h.column("k_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(size) == 0:
        return empty
    order = np.argsort(size)
    size, k = size[order], k[order]
    n_keys = int(k.sum())
    n_rows = int((size * k).sum())
    max_size = int(size[-1])
    top1_share_bp = max_size * 10000 // n_rows
    cum = np.cumsum(k)
    rank = -(-99 * n_keys // 100)  # ceil(0.99 * n_keys)
    p99 = int(size[np.searchsorted(cum, rank, side="left")])
    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "max_size": pa.array([max_size], pa.int64()),
            "top1_share_bp": pa.array([top1_share_bp], pa.int64()),
            "p99_size": pa.array([p99], pa.int64()),
        }
    )


EVENTS_KEY_SKEW_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
h AS (SELECT n AS size, COUNT(*) AS k FROM c GROUP BY n),
r AS (SELECT size, SUM(k) OVER (ORDER BY size) AS cum FROM h),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(MAX(n) AS BIGINT) AS max_size FROM c)
SELECT n_keys, n_rows, max_size,
       CAST(max_size * 10000 // n_rows AS BIGINT) AS top1_share_bp,
       CAST((SELECT MIN(size) FROM r WHERE cum * 100 >= 99 * n_keys) AS BIGINT) AS p99_size
FROM tot
"""


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics census
# ---------------------------------------------------------------------------

# (column, kind) spec: ints and strings cast losslessly to VARCHAR; dates
# stringify identically ('YYYY-MM-DD') in python and DuckDB; doubles are
# profiled in exact integer cents (ROUND(x*100)) so min/max/ndv are
# reduction-order- and format-independent (documented, mirrored in SQL).
_ANALYZE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def analyze_orders(sf_dir: str) -> pa.Table:
    """ANALYZE TABLE orders — per-column row/null counts, EXACT distinct
    count, and typed min/max rendered as strings: the statistics-collection
    pass every planner (including this engine's broadcast-vs-hash and
    salt-or-not decisions) runs before scheduling a big join.

    Plan: counts/min/max are per-batch mergeable TYPED partials (one row
    per batch, two typed cells per column -> driver fold, rendered to
    VARCHAR only after the fold so int/date ordering is numeric, exactly
    SQL's CAST(MIN(col) AS VARCHAR)). Exact NDV ships each column's
    per-batch DISTINCT value strings through ONE (col, value)-keyed dedup
    groupby — keys only, never rows — then a per-column count. The scale
    lever is per-column: an ndv census of a near-unique column approaches
    the table's key cardinality, which is exactly when the planner should
    switch that column to the HLL sibling (documented trade; the exact
    path is the gate).

    Contract (mirrored in SQL): NULLs are excluded from ndv/min/max;
    doubles are profiled as exact integer cents."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=[c for c, _ in _ANALYZE_COLS])

    def render(col, kind: str):
        if kind == "cents":
            return pc.cast(to_cents(col), pa.string())
        return pc.cast(col, pa.string())

    def typed(col, kind: str):
        return to_cents(col) if kind == "cents" else col

    def stat_partial(t: pa.Table) -> pa.Table:
        cells: dict[str, list] = {"n_rows": [t.num_rows]}
        for name, kind in _ANALYZE_COLS:
            col = typed(t.column(name), kind)
            cells[f"{name}__nulls"] = [t.column(name).null_count]
            mn = pc.min(col)
            mx = pc.max(col)
            cells[f"{name}__min"] = pa.array([mn.as_py()], type=mn.type)
            cells[f"{name}__max"] = pa.array([mx.as_py()], type=mx.type)
        return pa.table(cells)

    stat_parts = [
        b
        for b in ds.map_batches(stat_partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]

    def val_partial(t: pa.Table) -> pa.Table:
        outs = []
        for name, kind in _ANALYZE_COLS:
            vals = render(t.column(name).drop_null(), kind)
            u = pc.unique(vals.combine_chunks() if hasattr(vals, "combine_chunks") else vals)
            outs.append(
                pa.table(
                    {
                        "col_name": pa.array([name] * len(u), pa.string()),
                        "v": u.cast(pa.string()),
                    }
                )
            )
        return pa.concat_tables(outs)

    # NDV via the coarse-hash exchange (BASELINE census-class rule: Ray's
    # hash Aggregate runs ~170k rows/s at value-cardinality ≈ row-count;
    # one 64-way value-hash exchange + a C++ partition-local dedup is the
    # measured fix — A/B same-session at sf0.1: 4.7-9.1 s -> 1.7 s).
    # Same-value rows co-locate by construction, so per-partition distinct
    # counts sum EXACTLY.
    from ocr_ray.pipelines.conversation import grouped_scan

    def _part_ndv(t: pa.Table) -> pa.Table:
        g = t.group_by(["col_name", "v"]).aggregate([])
        return g.group_by("col_name").aggregate([([], "count_all")]).rename_columns(
            ["col_name", "ndv"]
        )

    ndv_map: dict[str, int] = {}
    for b in grouped_scan(
        ds.map_batches(val_partial, batch_format="pyarrow"),
        "v",
        _part_ndv,
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            ndv_map[r["col_name"]] = ndv_map.get(r["col_name"], 0) + r["ndv"]

    names = [c for c, _ in _ANALYZE_COLS]
    n_rows = 0
    nulls = {c: 0 for c in names}
    mins: dict[str, object] = {c: None for c in names}
    maxs: dict[str, object] = {c: None for c in names}
    for b in stat_parts:
        for r in b.to_pylist():
            n_rows += r["n_rows"]
            for c in names:
                nulls[c] += r[f"{c}__nulls"]
                for store, pick, cell in ((mins, min, r[f"{c}__min"]), (maxs, max, r[f"{c}__max"])):
                    if cell is not None:
                        store[c] = cell if store[c] is None else pick(store[c], cell)

    def _render_py(v) -> str | None:
        return None if v is None else str(v)

    return pa.table(
        {
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array([n_rows] * len(names), pa.int64()),
            "n_nulls": pa.array([nulls[c] for c in names], pa.int64()),
            "n_distinct": pa.array([ndv_map.get(c, 0) for c in names], pa.int64()),
            "min_s": pa.array([_render_py(mins[c]) for c in names], pa.string()),
            "max_s": pa.array([_render_py(maxs[c]) for c in names], pa.string()),
        }
    )


def _analyze_col_sql(name: str, kind: str) -> str:
    expr = f"CAST(ROUND({name} * 100) AS BIGINT)" if kind == "cents" else name
    return f"""
SELECT '{name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(CAST(MIN({expr}) AS VARCHAR) AS VARCHAR) AS min_s,
       CAST(CAST(MAX({expr}) AS VARCHAR) AS VARCHAR) AS max_s
FROM orders"""


ANALYZE_ORDERS_SQL = "\nUNION ALL\n".join(
    _analyze_col_sql(n, k) for n, k in _ANALYZE_COLS
)


# ---------------------------------------------------------------------------
# snapshot COLUMN drift census (CDC at column granularity)
# ---------------------------------------------------------------------------


def snapshot_column_drift(old_ds, new_ds, key: str, value_cols: list[str]):
    """General column-granularity snapshot drift: for keys present in BOTH
    snapshots, how many rows changed PER COLUMN — the "which field is
    churning" refinement of the row-level ``orders_snapshot_diff`` (a CDC
    consumer uses it to decide which downstream aggregates to invalidate).

    Both snapshots stream as (key, side, value_cols) rows through ONE
    coarse-key exchange; per partition a sort on (key, side) pairs each
    matched key's two rows and every column compares vectorized; only a
    per-partition counter row returns. Value columns must be NULL-free
    (coalesce to sentinels upstream — the orders entry does) so != is
    two-valued. At width, ship per-column digests instead of values — the
    exchange stays one row per key either way."""
    import ray.data as _rd

    from ocr_ray.pipelines.conversation import grouped_scan

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column(key)))
            return t.append_column("__side", pa.array(np.full(t.num_rows, side, np.int8)))

        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def compare(t: pa.Table) -> pa.Table:
        t = t.sort_by([(key, "ascending"), ("__side", "ascending")])
        k = t.column(key).to_numpy(zero_copy_only=False)
        side = t.column("__side").to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            pair_old = np.array([], dtype=np.int64)
        else:
            cand = np.flatnonzero(
                (k[:-1] == k[1:]) & (side[:-1] == 0) & (side[1:] == 1)
            )
            pair_old = cand
        out = {"n_matched": pa.array([len(pair_old)], pa.int64())}
        old_idx = pa.array(pair_old, pa.int64())
        new_idx = pa.array(pair_old + 1, pa.int64())
        for c in value_cols:
            col = t.column(c)
            diff = pc.not_equal(col.take(old_idx), col.take(new_idx))
            out[f"changed__{c}"] = pa.array(
                [pc.sum(pc.cast(diff, pa.int64())).as_py() or 0], pa.int64()
            )
        return pa.table(out)

    parts = [
        b
        for b in grouped_scan(both, key, compare, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    matched = 0
    changed = {c: 0 for c in value_cols}
    for b in parts:
        for r in b.to_pylist():
            matched += r["n_matched"]
            for c in value_cols:
                changed[c] += r[f"changed__{c}"]
    return pa.table(
        {
            "col_name": pa.array(value_cols, pa.string()),
            "n_changed": pa.array([changed[c] for c in value_cols], pa.int64()),
            "n_matched": pa.array([matched] * len(value_cols), pa.int64()),
        }
    )


_DRIFT_STATUS_MOD = 5


def orders_column_drift(sf_dir: str) -> pa.Table:
    """Column-drift census between the orders snapshot and its derived
    successor (same in-scan derivation family as ``orders_snapshot_diff``:
    delete keys %13, restatus %5, reprice %7) — per column, how many
    matched keys changed. NULL attributes take the diff sentinels so the
    compare is total; NULL keys can't be matched (both mirrored)."""

    def prep_old(sf: str):
        ds = rd.read_parquet(
            _pq(sf, "orders"), columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
        )

        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": t.column("o_orderkey"),
                    "s": pc.fill_null(t.column("o_orderstatus"), ""),
                    "c": pc.fill_null(to_cents(t.column("o_totalprice")), -1),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def prep_new(sf: str):
        base = prep_old(sf)

        def f(t: pa.Table) -> pa.Table:
            k = t.column("k").to_numpy(zero_copy_only=False)
            keep = pa.array((k % _DEL) != 0)
            t = t.filter(keep)
            k = t.column("k").to_numpy(zero_copy_only=False)
            s = t.column("s").to_pylist()
            restat = (k % _DRIFT_STATUS_MOD) == 0
            s = [v + "*" if m else v for v, m in zip(s, restat)]
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            c = np.where((k % _UPD) == 0, c + 100, c)
            return pa.table(
                {
                    "k": t.column("k"),
                    "s": pa.array(s, pa.string()),
                    "c": pa.array(c, pa.int64()),
                }
            )

        return base.map_batches(f, batch_format="pyarrow")

    out = snapshot_column_drift(prep_old(sf_dir), prep_new(sf_dir), "k", ["s", "c"])
    # stable public column names
    name_map = {"s": "o_orderstatus", "c": "o_totalprice"}
    return pa.table(
        {
            "col_name": pa.array(
                [name_map[v] for v in out.column("col_name").to_pylist()], pa.string()
            ),
            "n_changed": out.column("n_changed"),
            "n_matched": out.column("n_matched"),
        }
    )


ORDERS_COLUMN_DRIFT_SQL = f"""
WITH old AS (
  SELECT o_orderkey AS k, COALESCE(o_orderstatus, '') AS s,
         COALESCE(CAST(ROUND(o_totalprice * 100) AS BIGINT), -1) AS c
  FROM orders WHERE o_orderkey IS NOT NULL
),
new AS (
  SELECT k,
         CASE WHEN k % {_DRIFT_STATUS_MOD} = 0 THEN s || '*' ELSE s END AS s,
         CASE WHEN k % {_UPD} = 0 THEN c + 100 ELSE c END AS c
  FROM old WHERE k % {_DEL} != 0
),
j AS (SELECT old.s AS os, new.s AS ns, old.c AS oc, new.c AS nc
      FROM old JOIN new USING (k))
SELECT 'o_orderstatus' AS col_name,
       CAST(COUNT(*) FILTER (WHERE os != ns) AS BIGINT) AS n_changed,
       CAST(COUNT(*) AS BIGINT) AS n_matched FROM j
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) FILTER (WHERE oc != nc) AS BIGINT),
       CAST(COUNT(*) AS BIGINT) FROM j
"""


# ---------------------------------------------------------------------------
# functional-dependency audit (k=1 FD mining)
# ---------------------------------------------------------------------------


def orders_fd_audit(sf_dir: str) -> pa.Table:
    """Does ``o_custkey`` functionally determine ``o_orderpriority``?
    The FD-violation census schema-discovery tools run before trusting a
    denormalization: keys audited, keys violating (more than one distinct
    dependent value), and the worst key's variant count. All-integers
    output; FD holds ⟺ n_violating = 0.

    Plan: per-batch DISTINCT (key, value) pairs, ONE pair-keyed dedup
    groupby, then per-batch sorted run-length variant counts per key fold
    into (n_keys, n_violating, max_variants) — pairs-only shuffle, three
    ints to the driver per block. The variant count per key is bounded by
    the dependent column's domain, so the per-key state never explodes.

    Contract (mirrored in SQL): NULL keys are excluded; NULL dependent
    values don't count as variants (SQL COUNT(DISTINCT) semantics)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("o_custkey")), pc.is_valid(t.column("o_orderpriority"))
            )
        )
        return t.group_by(["o_custkey", "o_orderpriority"]).aggregate([])

    distinct = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["o_custkey", "o_orderpriority"])
        .count()
    )

    # pair-keyed groupby output is sorted by key: same custkey is contiguous
    # WITHIN a block, but a key may straddle two blocks — count variants per
    # key per block, then fold per-key maxima via a (key, n) census... the
    # straddle makes per-block counts partial, so ship (key, n) partials
    # through one more tiny groupby instead of guessing block boundaries.
    from ray.data.aggregate import Sum

    def variant_partial(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"o_custkey": pa.array([], pa.int64()), "nv": pa.array([], pa.int64())}
            )
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(k)])))
        return pa.table(
            {
                "o_custkey": pa.array(k[starts], pa.int64()),
                "nv": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_key = (
        distinct.map_batches(variant_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("nv", alias_name="nv"))
    )

    n_keys = n_viol = max_var = 0
    for b in per_key.iter_batches(batch_size=None, batch_format="pyarrow"):
        nv = b.column("nv").to_numpy(zero_copy_only=False)
        n_keys += len(nv)
        n_viol += int((nv > 1).sum())
        if len(nv):
            max_var = max(max_var, int(nv.max()))
    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "n_violating": pa.array([n_viol], pa.int64()),
            "max_variants": pa.array([max_var], pa.int64()),
        }
    )


ORDERS_FD_AUDIT_SQL = """
WITH v AS (
  SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nv
  FROM orders WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(*) FILTER (WHERE nv > 1) AS BIGINT) AS n_violating,
       CAST(COALESCE(MAX(nv), 0) AS BIGINT) AS max_variants
FROM v
"""


# ---------------------------------------------------------------------------
# declarative CHECK-constraint sweep (rule engine census)
# ---------------------------------------------------------------------------

_ORDER_RULES = ("totalprice_nonneg", "status_enum", "orderdate_bounds", "custkey_present")
_ORDER_STATUS_ENUM = ("F", "O", "P")
_ORDERDATE_LO = "1990-01-01 00:00:00"
_ORDERDATE_HI = "2030-01-01 00:00:00"


def orders_rule_violations(sf_dir: str) -> Dataset:
    """Data-contract sweep: every declarative CHECK rule over orders in ONE
    pass, reporting per-rule violation counts — the rule-engine face of the
    DQ family (orphans/FD/reconciliation each audit one structural
    property; contracts bundle many row-local predicates and run on every
    ingest). SQL CHECK semantics: a NULL operand PASSES a value rule
    (three-valued logic), while presence rules name NULL explicitly.

    Rules: non-negative total, status in its enum, order date within
    sane bounds, customer key present.

    Plan: embarrassingly parallel — per batch, each rule is one vectorized
    predicate; only |rules| counters per batch reach the driver."""
    import numpy as np

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_totalprice", "o_orderstatus", "o_orderdate", "o_custkey"],
    )
    lo = pa.scalar(_ORDERDATE_LO).cast(pa.timestamp("us"))
    hi = pa.scalar(_ORDERDATE_HI).cast(pa.timestamp("us"))
    enum = pa.array(_ORDER_STATUS_ENUM, pa.string())

    def counts(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice")
        status = t.column("o_orderstatus")
        date = t.column("o_orderdate")
        cust = t.column("o_custkey")
        v = np.array(
            [
                pc.sum(
                    pc.and_(pc.is_valid(price), pc.less(price, pa.scalar(0.0)))
                ).as_py()
                or 0,
                pc.sum(
                    pc.and_(
                        pc.is_valid(status),
                        pc.invert(pc.is_in(status, value_set=enum)),
                    )
                ).as_py()
                or 0,
                pc.sum(
                    pc.and_(
                        pc.is_valid(date),
                        pc.or_(pc.less(date, lo), pc.greater(date, hi)),
                    )
                ).as_py()
                or 0,
                pc.sum(pc.is_null(cust)).as_py() or 0,
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "rule": pa.array(list(_ORDER_RULES), pa.string()),
                "n_violations": pa.array(v),
                "n_rows": pa.array([t.num_rows] * len(_ORDER_RULES), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        orders.map_batches(counts, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(
            Sum("n_violations", alias_name="n_violations"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


ORDERS_RULE_VIOLATIONS_SQL = f"""
SELECT 'totalprice_nonneg' AS rule,
       CAST(COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL AND o_totalprice < 0) AS BIGINT) AS n_violations,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
UNION ALL
SELECT 'status_enum',
       CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
                               AND o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderdate_bounds',
       CAST(COUNT(*) FILTER (WHERE o_orderdate IS NOT NULL
                               AND (o_orderdate < TIMESTAMP '{_ORDERDATE_LO}'
                                    OR o_orderdate > TIMESTAMP '{_ORDERDATE_HI}')) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_present',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM orders
"""
