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


# ---------------------------------------------------------------------------
# bitemporal version store: (valid_from, tx_from) AS-OF reads
# ---------------------------------------------------------------------------

# AS OF query point: both clocks mid-range of the fixture's 1995-2001 span
BITEMPORAL_VALID_Q = "1998-06-30 00:00:00"
BITEMPORAL_TX_Q = "1998-07-15 00:00:00"
_BT_REVISE_DAYS = 10  # revision lands on the tx clock 10 days later
_BT_VALID_SHIFT_DAYS = 5  # and claims validity 5 days after the original
_BT_PRICE_BUMP_CENTS = 500


def ensure_bitemporal_orders(sf_dir: str, root: str = "/tmp/ocr_ray_fixtures") -> str:
    """Deterministic bitemporal version store derived from orders: every
    order has its original version (valid_from = tx_from = o_orderdate);
    every third order additionally has a REVISION recorded 10 days later
    on the transaction clock, claiming validity 5 days after the original
    and a corrected price. The two clocks move independently — that's the
    property a single-axis SCD2 table cannot represent."""
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, f"bitemporal_orders_{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(root, exist_ok=True)
    src = f"read_parquet('{sf_dir}/orders.parquet')"
    duckdb.sql(
        f"""
COPY (
  SELECT o_orderkey, o_orderdate AS valid_from, o_orderdate AS tx_from,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM {src} WHERE o_orderkey IS NOT NULL
  UNION ALL
  SELECT o_orderkey,
         o_orderdate + INTERVAL {_BT_VALID_SHIFT_DAYS} DAY,
         o_orderdate + INTERVAL {_BT_REVISE_DAYS} DAY,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + {_BT_PRICE_BUMP_CENTS}
  FROM {src} WHERE o_orderkey IS NOT NULL AND o_orderkey % 3 = 0
  ORDER BY o_orderkey, tx_from
) TO '{out}.tmp.parquet' (FORMAT PARQUET)
"""
    )
    os.replace(f"{out}.tmp.parquet", out)
    return out


def orders_bitemporal_asof(sf_dir: str):
    """Bitemporal AS-OF read: for each order, the version that was BOTH in
    effect on the valid clock (greatest valid_from <= V) AND already
    recorded on the transaction clock (tx_from <= T) at the query point —
    "what did we believe on T about the state at V". Ties on valid_from
    break to the newest transaction. Completes the temporal family:
    SCD2 intervals (``cust_order_intervals``), snapshot/time-travel reads
    (``state/sink.read_segments``), CDC diffs — this is the 2-clock query
    those single-axis ops cannot answer.

    Plan: predicate-pruned read (both clock filters pushed into the scan),
    per-BATCH lexicographic argmax per key (sort + run boundary — at most
    one row per key per batch survives to the shuffle), final per-key pick
    in a coarse-key ``grouped_scan``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ocr_ray.pipelines.conversation import grouped_scan

    path = ensure_bitemporal_orders(sf_dir)
    v_q = pa.scalar(BITEMPORAL_VALID_Q).cast(pa.timestamp("us"))
    t_q = pa.scalar(BITEMPORAL_TX_Q).cast(pa.timestamp("us"))
    ds = rd.read_parquet(path)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.less_equal(t.column("valid_from"), v_q),
                pc.less_equal(t.column("tx_from"), t_q),
            )
        )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("o_orderkey", "ascending"),
                    ("valid_from", "ascending"),
                    ("tx_from", "ascending"),
                ],
            )
        )
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        last = np.empty(len(k), dtype=bool)
        if len(k):
            last[:-1] = k[:-1] != k[1:]
            last[-1] = True
        return t.filter(pa.array(last))

    pre = ds.map_batches(partial, batch_format="pyarrow")

    def pick(df):
        df = df.sort_values(["o_orderkey", "valid_from", "tx_from"]).drop_duplicates(
            "o_orderkey", keep="last"
        )
        return df.drop(columns=["__part"])

    out = grouped_scan(pre, "o_orderkey", pick)
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "valid_from": t.column("valid_from").cast(pa.timestamp("us")),
                "tx_from": t.column("tx_from").cast(pa.timestamp("us")),
                "price_cents": pc.cast(t.column("price_cents"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def orders_bitemporal_asof_sql(sf_dir: str) -> str:
    path = ensure_bitemporal_orders(sf_dir)
    return f"""
SELECT o_orderkey, valid_from, tx_from, price_cents FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_orderkey ORDER BY valid_from DESC, tx_from DESC
  ) AS rn
  FROM read_parquet('{path}')
  WHERE valid_from <= TIMESTAMP '{BITEMPORAL_VALID_Q}'
    AND tx_from <= TIMESTAMP '{BITEMPORAL_TX_Q}'
) WHERE rn = 1
"""
