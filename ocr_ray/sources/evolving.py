"""Schema-evolution parquet source: union-by-name reads over file
generations whose schemas drifted (columns added over time) — the table
every long-lived ingest pipeline actually has. Ray's ``read_parquet`` over
mixed schemas either errors or silently misaligns; ``read_parquet_evolving``
reads each generation with its own schema and maps all of them onto the
union schema (missing columns become typed NULLs) before the union —
per-batch, vectorized, no shuffle.

Reference semantics: the reference's sheet/DB sinks validate headers and
default-fill missing fields (save-to-google-sheet.ts:95-143); this is the
same normalization applied at the SOURCE.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

_FIXTURE_ROOT = "/tmp/ocr_ray_fixtures"


def union_schema(paths: list[str]) -> pa.Schema:
    """Union-by-name of the files' schemas (footer reads only). First-seen
    type wins; a same-name type CONFLICT raises — silent coercion across
    generations hides real breakage."""
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for p in paths:
        for f in pq.read_schema(p):
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
                order.append(f.name)
            elif prev.type != f.type:
                raise ValueError(
                    f"schema evolution type conflict on {f.name!r}: "
                    f"{prev.type} vs {f.type} ({p})"
                )
    return pa.schema([fields[n] for n in order])


def read_parquet_evolving(paths: list[str], columns: list[str] | None = None) -> Dataset:
    """Read parquet generations with drifted schemas as ONE Dataset on the
    union-by-name schema. Each generation is a normal streaming
    ``read_parquet``; a per-batch map adds typed NULL columns for fields
    that generation predates and fixes column order. Column pruning is
    pushed into each generation's read (only columns that generation has)."""
    target = union_schema(paths)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])

    parts: list[Dataset] = []
    for p in paths:
        have = set(pq.read_schema(p).names)
        want = [n for n in target.names if n in have]

        def conform(t: pa.Table, _target=target) -> pa.Table:
            cols = {}
            for f in _target:
                if f.name in t.column_names:
                    cols[f.name] = t.column(f.name).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(t.num_rows, f.type)
            return pa.table(cols)

        parts.append(
            rd.read_parquet(p, columns=want).map_batches(
                conform, batch_format="pyarrow"
            )
        )
    out = parts[0]
    for p_ds in parts[1:]:
        out = out.union(p_ds)
    return out


def ensure_evolved_orders(sf_dir: str) -> str:
    """Deterministic two-generation copy of ``orders``: gen1 (even keys)
    predates the ``o_channel`` column; gen2 (odd keys) carries it. Cached
    under /tmp keyed by the source dir."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(_FIXTURE_ROOT, f"evolved_orders_{tag}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    key = t.column("o_orderkey")
    even = pc.equal(pc.bit_wise_and(pc.coalesce(key, pa.scalar(1, pa.int64())), 1), 0)
    gen1 = t.filter(even)
    gen2 = t.filter(pc.invert(even))
    chan = pc.if_else(
        pc.equal(
            pc.bit_wise_and(pc.coalesce(gen2.column("o_orderkey"), pa.scalar(0, pa.int64())), 2),
            0,
        ),
        pa.scalar("web"),
        pa.scalar("store"),
    )
    gen2 = gen2.append_column("o_channel", chan)
    pq.write_table(gen1, os.path.join(d, "gen1.parquet"))
    pq.write_table(gen2, os.path.join(d, "gen2.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return d


def orders_evolved_rollup(sf_dir: str) -> Dataset:
    """queries() entry: union-by-name read over the two order generations,
    then a rollup per channel — pre-channel rows default-fill to 'legacy'
    (the reference's missing-field default-fill, applied at the source)."""
    from ray.data.aggregate import Count, Sum

    from ocr_ray.functions.scalars import to_cents

    d = ensure_evolved_orders(sf_dir)
    ds = read_parquet_evolving(
        [os.path.join(d, "gen1.parquet"), os.path.join(d, "gen2.parquet")],
        columns=["o_orderkey", "o_totalprice", "o_channel"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_channel": pc.coalesce(t.column("o_channel"), pa.scalar("legacy")),
                "cents": pc.coalesce(
                    to_cents(t.column("o_totalprice")), pa.scalar(0, pa.int64())
                ),
                "n": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = t.group_by(["o_channel"]).aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["o_channel", "n", "total_cents"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_channel")
        .aggregate(Sum("n", alias_name="n"), Sum("total_cents", alias_name="total_cents"))
    )


def orders_evolved_rollup_sql(sf_dir: str) -> str:
    d = ensure_evolved_orders(sf_dir)
    return f"""
SELECT COALESCE(o_channel, 'legacy') AS o_channel,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), 0)) AS BIGINT) AS total_cents
FROM read_parquet(['{d}/gen1.parquet', '{d}/gen2.parquet'], union_by_name=true)
GROUP BY 1
"""
