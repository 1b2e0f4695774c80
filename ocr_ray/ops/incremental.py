"""Incremental aggregate maintenance: merge a delta's partial aggregation
states into a base aggregate WITHOUT recomputing the base — the
streaming-warehouse refresh primitive behind the upsert sink
(state/sink.upsert_partitioned maintains rows; this maintains AGGREGATES).

The reference recomputes its whole sheet summary on every upload
(save-to-google-sheet.ts re-reads and rewrites the full sheet). At 100 TB a
nightly delta must fold into yesterday's aggregate in O(delta), so every
aggregate is carried as a MERGEABLE state vector (count, sum, min, max):
merge(a, b) is elementwise (+, +, min, max), associative and commutative,
so any partition of the data into base/delta (or 1000 deltas) folds to the
same result as one full recompute — which is exactly what the SQL oracle
checks (it aggregates the full table in one pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ocr_ray.functions.scalars import to_cents

__all__ = [
    "agg_states",
    "merge_states",
    "nation_orders_incremental",
    "NATION_ORDERS_INCREMENTAL_SQL",
]


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def agg_states(ds: Dataset, key: str, cents_col: str) -> pd.DataFrame:
    """Per-key mergeable state vector (n, sum, min, max) over an exact
    integer-cents column.

    Per-batch Arrow ``group_by`` partials; the driver folds one tiny state
    frame per block (size-gated local-solve — states are O(distinct keys),
    which for a maintenance aggregate is the SMALL side by construction).
    The returned frame IS the checkpointable aggregate: store it, then
    ``merge_states`` tomorrow's delta into it."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({key: t.column(key), "c": t.column(cents_col)})
            .group_by(key)
            .aggregate([("c", "count"), ("c", "sum"), ("c", "min"), ("c", "max")])
        )
        return g.rename_columns([key, "n", "s", "mn", "mx"])

    frames = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pandas"
        )
    ]
    if not frames:
        return pd.DataFrame(
            {
                key: pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=np.int64),
                "mn": pd.Series(dtype=np.int64),
                "mx": pd.Series(dtype=np.int64),
            }
        )
    return merge_states(pd.concat(frames, ignore_index=True), key)


def merge_states(states: pd.DataFrame, key: str) -> pd.DataFrame:
    """Fold any number of state rows per key into one: the merge is the
    aggregation — associative, commutative, so base+delta, delta+base, or
    1000 shards all converge to the recompute result."""
    out = (
        # dropna=False: a NULL key is a real SQL group (arrow partials
        # already carry it; pandas would silently drop it here)
        states.groupby(key, as_index=False, dropna=False)
        .agg(n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .sort_values(key)
        .reset_index(drop=True)
    )
    return out.astype({"n": np.int64, "s": np.int64, "mn": np.int64, "mx": np.int64})


_CUTOFF = np.datetime64("1998-01-01T00:00:00", "us")


def nation_orders_incremental(sf_dir: str) -> pd.DataFrame:
    """Per-nation order stats maintained incrementally: the base aggregate
    covers orders BEFORE the cutoff, the delta covers the rest, and the
    published result is ``merge_states(base, delta)`` — proving O(delta)
    refresh gives the exact full-recompute answer (the SQL oracle
    aggregates the whole table in one pass).

    The key is the customer's nation (broadcast customer->nation lookup —
    dimension-sized, ray.put once)."""
    from ocr_ray.functions.joins import broadcast_join

    def with_nation(sf: str, leg: str) -> Dataset:
        orders = rd.read_parquet(
            _pq(sf, "orders"), columns=["o_custkey", "o_totalprice", "o_orderdate"]
        )

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # the legs must PARTITION the table: delta is the complement of
            # base (a NULL o_orderdate lands in delta, never nowhere); NULL
            # prices are excluded in both engines (count parity)
            t = t.filter(pc.is_valid(t.column("o_totalprice")))
            d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
            in_base = d < _CUTOFF  # NaT compares False
            t = t.filter(pa.array(in_base if leg == "base" else ~in_base))
            return pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "cents": to_cents(t.column("o_totalprice")),
                }
            )

        cust = rd.read_parquet(_pq(sf, "customer"), columns=["c_custkey", "c_nationkey"])
        return broadcast_join(
            orders.map_batches(prep, batch_format="pyarrow"),
            cust.to_pandas(),
            left_on="o_custkey",
            right_on="c_custkey",
        )

    base = agg_states(with_nation(sf_dir, "base"), "c_nationkey", "cents")
    delta = agg_states(with_nation(sf_dir, "delta"), "c_nationkey", "cents")
    merged = merge_states(pd.concat([base, delta], ignore_index=True), "c_nationkey")
    return merged.rename(
        columns={
            "c_nationkey": "nationkey",
            "n": "o_count",
            "s": "sum_cents",
            "mn": "min_cents",
            "mx": "max_cents",
        }
    )


NATION_ORDERS_INCREMENTAL_SQL = """
SELECT c.c_nationkey AS nationkey,
       count(*) AS o_count,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS min_cents,
       MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS max_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# incremental JOIN-view maintenance (delta-join refresh)
# ---------------------------------------------------------------------------


def join_view_refresh(
    base: Dataset, delta: Dataset, dim: Dataset, *, on: str, right_on: str
) -> Dataset:
    """Maintain a materialized join view under a fact-side delta WITHOUT
    re-joining the base: Δ(F ⋈ D) = ΔF ⋈ D for an insert-only delta, so
    the refresh joins ONLY the delta and unions it onto the standing view.
    Completes the incremental-maintenance trio: rows
    (state/sink.upsert_partitioned), aggregates (``merge_states``), and
    now JOIN views — O(Δ) work per refresh in all three.

    ``base`` is the already-joined standing view (stream it from the
    sink); ``delta`` is the new fact rows; ``dim`` the (small) dimension
    side, joined via the cost-based ``auto_join``."""
    from ocr_ray.functions.joins import auto_join

    return base.union(auto_join(delta, dim, on=on, right_on=right_on))


_JVIEW_DELTA_MOD = 10  # fact rows with o_orderkey % 10 == 0 arrive "late"


def orders_cust_join_incremental(sf_dir: str) -> Dataset:
    """queries() entry for the delta-join refresh: the orders fact is split
    into a standing base (90%) and a late-arriving delta (10% by key
    residue); the base view is joined once, then the delta is folded in
    via ``join_view_refresh``. The result must equal the one-shot join of
    the FULL fact table — which is exactly what the SQL oracle computes,
    so the gate proves refresh ≡ recompute.

    Contract (mirrored in SQL): inner join on custkey (NULL keys drop);
    money in exact cents."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderkey")))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_cents": to_cents(t.column("o_totalprice")),
            }
        )

    facts = orders.map_batches(prep, batch_format="pyarrow")
    is_delta = lambda t: pc.equal(  # noqa: E731
        pc.subtract(
            t.column("o_orderkey"),
            pc.multiply(
                pc.divide(t.column("o_orderkey"), pa.scalar(_JVIEW_DELTA_MOD)),
                pa.scalar(_JVIEW_DELTA_MOD),
            ),
        ),
        pa.scalar(0),
    )
    base_facts = facts.map_batches(
        lambda t: t.filter(pc.invert(is_delta(t))), batch_format="pyarrow"
    )
    delta_facts = facts.map_batches(
        lambda t: t.filter(is_delta(t)), batch_format="pyarrow"
    )

    from ocr_ray.functions.joins import auto_join

    base_view = auto_join(base_facts, cust, on="o_custkey", right_on="c_custkey")
    refreshed = join_view_refresh(
        base_view, delta_facts, cust, on="o_custkey", right_on="c_custkey"
    )
    return refreshed.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "c_name": t.column("c_name"),
                "total_cents": pc.cast(t.column("total_cents"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


ORDERS_CUST_JOIN_INCREMENTAL_SQL = """
SELECT o.o_orderkey, o.o_custkey, c.c_name,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IS NOT NULL
"""


def orders_cust_join_salted(sf_dir: str) -> Dataset:
    """The same fact × dimension join routed through the SKEW-RESISTANT
    ``salted_hash_join`` plan — gate-proves the salted (key, salt) join
    produces exactly the plain join's rows (salting must never change
    results, only partition balance)."""
    import pyarrow.compute as pc

    from ocr_ray.functions.joins import salted_hash_join

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderkey")))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_cents": to_cents(t.column("o_totalprice")),
            }
        )

    joined = salted_hash_join(
        orders.map_batches(prep, batch_format="pyarrow"),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        salts=8,
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "c_name": t.column("c_name"),
                "total_cents": pc.cast(t.column("total_cents"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


ORDERS_CUST_JOIN_SALTED_SQL = ORDERS_CUST_JOIN_INCREMENTAL_SQL
