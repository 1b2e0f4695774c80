"""Parallelism-aware Parquet reads for CPU-heavy downstream kernels.

Ray Data sizes read tasks for I/O throughput (target block ~128 MB), which
is right when the bottleneck is the scan. For stages whose per-row compute
dominates the scan by orders of magnitude (MinHash signatures, shingle
censuses, tokenizing scans), a 128 MB text block serializes ~1 core-minute
of work behind one task: on this box, 100k docs read as 17-file default
blocks ran the signature stage in 15 s vs 2.1 s with 64 read blocks.

``scaled_read_parquet`` sizes ``override_num_blocks`` from the on-disk byte
count so every core gets work even on small file counts. At 100 TB the
input has thousands of files and the default parallelism is already ample —
the helper matters for the mid-size inputs (single-digit GB in few files)
where the default starves the cluster; it never *reduces* parallelism below
Ray's own choice by more than the cap.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd
from ray.data import Dataset

# ~8 MB compressed per block ≈ 20-30 MB of decoded text: small enough that
# a kernel at ~0.3 ms/row finishes a block in single-digit seconds, big
# enough that per-task overhead (~10 ms) stays noise.
_TARGET_BLOCK_BYTES = 8 << 20
_MAX_BLOCKS = 512


def _cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def scaled_read_parquet(
    path: str | list[str],
    *,
    columns: list[str] | None = None,
    target_block_bytes: int = _TARGET_BLOCK_BYTES,
    max_blocks: int = _MAX_BLOCKS,
) -> Dataset:
    """``read_parquet`` with ``override_num_blocks`` sized from file bytes.

    blocks = clamp(total_bytes / target_block_bytes, 2 x CPUs, max_blocks) —
    the 2 x CPUs floor keeps every core busy through stragglers; the cap
    bounds per-task overhead and the driver's block metadata."""
    if isinstance(path, str):
        if os.path.isdir(path):
            files = glob.glob(os.path.join(path, "*.parquet"))
        else:
            files = [path]
    else:
        files = list(path)
    total = 0
    for f in files:
        try:
            total += os.path.getsize(f)
        except OSError:
            pass
    want = max(2 * _cluster_cpus(), total // target_block_bytes + 1)
    blocks = int(min(max_blocks, want))
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks)


# ---------------------------------------------------------------------------
# text-format sources (JSONL / CSV)
# ---------------------------------------------------------------------------
#
# A production corpus ingests line-delimited JSON and CSV alongside Parquet
# (the reference's "source" axis, S1/S2 generalization). These wrappers keep
# the same contract as the parquet path: streaming Dataset out, column
# pruning applied immediately after the scan (Ray's JSON/CSV readers cannot
# push projections into the file format, so the prune happens in the first
# map stage — at 100 TB, prefer Parquet; these exist for interchange).


def read_jsonl(path: str | list[str], *, columns: list[str] | None = None) -> Dataset:
    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(path: str | list[str], *, columns: list[str] | None = None) -> Dataset:
    ds = rd.read_csv(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def ensure_interchange_fixture(
    sf_dir: str, root: str = "/tmp/ocr_ray_fixtures"
) -> tuple[str, str]:
    """Deterministic JSONL + CSV exports of the events table head (same
    rows, two wire formats), cached once — so the format-source queries and
    their DuckDB oracles read identical bytes."""
    import json as _json
    import os as _os

    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = _os.path.join(root, f"interchange_{tag}")
    marker = _os.path.join(out, "_SUCCESS")
    if _os.path.exists(marker):
        return _os.path.join(out, "events.jsonl"), _os.path.join(out, "events.csv")
    _os.makedirs(out, exist_ok=True)
    rows = duckdb.sql(
        "SELECT event_id, user_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS value_cents "
        f"FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id LIMIT 5000"
    ).fetchall()
    jpath, cpath = _os.path.join(out, "events.jsonl"), _os.path.join(out, "events.csv")
    with open(jpath + ".tmp", "w") as f:
        for eid, uid, et, vc in rows:
            f.write(
                _json.dumps(
                    {"event_id": eid, "user_id": uid, "event_type": et, "value_cents": vc}
                )
                + "\n"
            )
    with open(cpath + ".tmp", "w") as f:
        f.write("event_id,user_id,event_type,value_cents\n")
        for eid, uid, et, vc in rows:
            f.write(f"{eid},{uid},{et},{vc}\n")
    _os.replace(jpath + ".tmp", jpath)
    _os.replace(cpath + ".tmp", cpath)
    open(marker, "w").close()
    return jpath, cpath


def _format_rollup(ds: Dataset) -> Dataset:
    """Shared rollup over either wire format: per event_type count + cents
    total (partial pre-agg, tiny groupby)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "cents": pc.cast(t.column("value_cents"), pa.int64()),
            }
        )
        g = out.group_by(["event_type"]).aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n", "cents"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("cents", alias_name="cents")
    )


def jsonl_events_rollup(sf_dir: str) -> Dataset:
    jpath, _ = ensure_interchange_fixture(sf_dir)
    return _format_rollup(read_jsonl(jpath, columns=["event_type", "value_cents"]))


def csv_events_rollup(sf_dir: str) -> Dataset:
    _, cpath = ensure_interchange_fixture(sf_dir)
    return _format_rollup(read_csv(cpath, columns=["event_type", "value_cents"]))


def jsonl_events_rollup_sql(sf_dir: str) -> str:
    jpath, _ = ensure_interchange_fixture(sf_dir)
    return f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(value_cents) AS BIGINT) AS cents
FROM read_json_auto('{jpath}', format='newline_delimited')
GROUP BY event_type
"""


def csv_events_rollup_sql(sf_dir: str) -> str:
    _, cpath = ensure_interchange_fixture(sf_dir)
    return f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(value_cents) AS BIGINT) AS cents
FROM read_csv_auto('{cpath}')
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# schema evolution: union-by-name over heterogeneous Parquet footers
# ---------------------------------------------------------------------------


def ensure_schema_evo_fixture(
    sf_dir: str, root: str = "/tmp/ocr_ray_fixtures"
) -> tuple[str, str]:
    """Two deterministic Parquet files with DIFFERENT schemas from the same
    logical table — the shape a long-lived 100 TB corpus actually has
    (columns added over time; old shards never rewritten): v1 shards carry
    (doc_id, text, lang), v2 shards carry (doc_id, text, source)."""
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, f"schema_evo_{tag}")
    a, b = os.path.join(out, "docs_v1.parquet"), os.path.join(out, "docs_v2.parquet")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return a, b
    os.makedirs(out, exist_ok=True)
    src = f"read_parquet('{sf_dir}/documents.parquet')"
    duckdb.sql(
        f"COPY (SELECT doc_id, text, lang FROM {src} WHERE doc_id % 2 = 0 "
        f"ORDER BY doc_id) TO '{a}.tmp.parquet' (FORMAT PARQUET)"
    )
    duckdb.sql(
        f"COPY (SELECT doc_id, text, source FROM {src} WHERE doc_id % 2 = 1 "
        f"ORDER BY doc_id) TO '{b}.tmp.parquet' (FORMAT PARQUET)"
    )
    os.replace(f"{a}.tmp.parquet", a)
    os.replace(f"{b}.tmp.parquet", b)
    open(marker, "w").close()
    return a, b


def read_parquet_union(paths: list[str], *, columns: list[str] | None = None) -> Dataset:
    """Read Parquet files whose schemas differ by ADDED/DROPPED columns into
    one Dataset with the unified schema (missing columns null-filled, types
    cast) — ``union_by_name`` semantics as a streaming source.

    Footers only are read up front (one metadata fetch per file, no data);
    each file then reads JUST its present-and-requested columns (column
    pruning still applies per shard generation) and aligns per batch with
    zero-copy casts + null fills. The union is a metadata concat — no
    shuffle, blocks stream straight through."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schemas = [pq.read_schema(p) for p in paths]
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    if columns is not None:
        unified = pa.schema([f for f in unified if f.name in set(columns)])
    names = [f.name for f in unified]

    parts: list[Dataset] = []
    for p, s in zip(paths, schemas):
        present = [n for n in names if s.get_field_index(n) != -1]

        def align(t: pa.Table, _u=unified) -> pa.Table:
            cols = []
            for f in _u:
                if t.schema.get_field_index(f.name) != -1:
                    cols.append(t.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(t.num_rows, f.type))
            return pa.table(dict(zip([f.name for f in _u], cols)))

        ds = rd.read_parquet(p, columns=present) if present else rd.read_parquet(p)
        parts.append(ds.map_batches(align, batch_format="pyarrow"))
    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out


def docs_schema_union(sf_dir: str) -> Dataset:
    """The schema-evolution read path as a gated query: v1+v2 doc shards
    unified by name, NULL-filled where a generation lacks the column."""
    a, b = ensure_schema_evo_fixture(sf_dir)
    return read_parquet_union([a, b], columns=["doc_id", "text", "lang", "source"])


def docs_schema_union_sql(sf_dir: str) -> str:
    a, b = ensure_schema_evo_fixture(sf_dir)
    return f"""
SELECT doc_id, text, lang, source
FROM read_parquet(['{a}', '{b}'], union_by_name=true)
"""


# ---------------------------------------------------------------------------
# provenance / lineage read: per-shard source column
# ---------------------------------------------------------------------------


def ensure_sharded_docs_fixture(
    sf_dir: str, root: str = "/tmp/ocr_ray_fixtures", n_shards: int = 4
) -> list[str]:
    """Deterministic multi-shard export of the documents table (doc_id % n
    routing, identical schema per shard) — the many-files layout every real
    corpus has, for exercising the provenance-column read path."""
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, f"sharded_docs_{tag}")
    paths = [os.path.join(out, f"docs_shard_{i}.parquet") for i in range(n_shards)]
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return paths
    os.makedirs(out, exist_ok=True)
    src = f"read_parquet('{sf_dir}/documents.parquet')"
    for i, p in enumerate(paths):
        duckdb.sql(
            f"COPY (SELECT doc_id, lang, n_chars FROM {src} "
            f"WHERE doc_id % {n_shards} = {i} ORDER BY doc_id) "
            f"TO '{p}.tmp.parquet' (FORMAT PARQUET)"
        )
        os.replace(f"{p}.tmp.parquet", p)
    open(marker, "w").close()
    return paths


def read_parquet_with_lineage(
    paths: list[str], *, columns: list[str] | None = None, col: str = "shard"
) -> Dataset:
    """Parquet read that attaches each row's SOURCE FILE basename as a
    column — row-level provenance, the lineage primitive behind
    "which shard produced this bad row" debugging and per-source quota /
    audit passes (the file-granularity sibling of the sink's manifest
    lineage, state/sink.read_manifests).

    Ray Data's ``include_paths=True`` stamps the path at the read task —
    zero shuffle, zero extra I/O (the path is task metadata, not data);
    one vectorized basename projection follows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = rd.read_parquet(paths, columns=columns, include_paths=True)

    def basename(t: pa.Table) -> pa.Table:
        # replace the full path with its basename: strip the greedy
        # everything-up-to-last-slash prefix, vectorized
        last = pc.replace_substring_regex(t.column("path"), pattern=r"^.*/", replacement="")
        return t.drop_columns(["path"]).append_column(col, last)

    return ds.map_batches(basename, batch_format="pyarrow")


def docs_lineage_census(sf_dir: str) -> Dataset:
    """Per-source-shard census over the provenance read: doc count + chars
    total per shard file (the audit every multi-source ingest runs first)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    paths = ensure_sharded_docs_fixture(sf_dir)
    ds = read_parquet_with_lineage(paths, columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["shard"]).aggregate([("doc_id", "count"), ("n_chars", "sum")])
        return g.rename_columns(["shard", "n_docs", "sum_chars"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "shard": t.column("shard"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "sum_chars": pc.cast(t.column("sum_chars"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def docs_lineage_census_sql(sf_dir: str) -> str:
    paths = ensure_sharded_docs_fixture(sf_dir)
    plist = ", ".join(f"'{p}'" for p in paths)
    return f"""
SELECT regexp_extract(filename, '[^/]+$') AS shard,
       CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM read_parquet([{plist}], filename=true)
GROUP BY 1
"""
