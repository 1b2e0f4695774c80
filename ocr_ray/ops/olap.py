"""OLAP-shaped operators: cube / grouping sets, pivot, per-group exact
quantiles, and set intersection — the reporting layer a training-data
warehouse runs over its lineage and event tables.

Scale plans (the theme: ONE corpus-sized shuffle, everything coarser is
derived from the finest aggregate, which is O(distinct groups)):

* cube          partial per-batch pre-agg -> finest (status, priority)
                groupby -> single-block expansion of the 4 grouping sets
                from the finest result (counts/sums re-aggregate exactly)
* pivot         same finest groupby -> single-block column pivot
* per-group     the bucket-histogram exact-quantile plan of
  quantiles     ``corpus.order_quantiles`` generalized to a group key:
                histogram over (group, bucket), target ranks per group,
                second pass sorts only rank-bearing buckets
* intersect     tag + union + groupby(key) Min/Max — present in both
                streams iff min tag = 0 and max tag = 1; per-batch dedup
                shrinks the shuffle to distinct (key, tag) rows

All four are SQL-gated (CUBE / CASE-pivot / window-rank quantiles /
INTERSECT in DuckDB).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from ocr_ray.functions.scalars import to_cents


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# cube / grouping sets
# ---------------------------------------------------------------------------


def _cube_expand(t: pa.Table) -> pa.Table:
    """Finest-level aggregate (one small block) -> all four grouping sets of
    CUBE(o_orderstatus, o_orderpriority). Counts and sums re-aggregate
    exactly; rolled-up dimensions become NULL (DuckDB CUBE convention)."""
    levels = []
    for keys in (
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderstatus"],
        ["o_orderpriority"],
        [],
    ):
        if keys:
            g = t.group_by(keys).aggregate(
                [("n_orders", "sum"), ("sum_price_cents", "sum")]
            )
            cols = {k: g.column(k) for k in keys}
            n = g.num_rows
            for k in ("o_orderstatus", "o_orderpriority"):
                if k not in keys:
                    cols[k] = pa.nulls(n, pa.string())
            cols["n_orders"] = g.column("n_orders_sum")
            cols["sum_price_cents"] = g.column("sum_price_cents_sum")
        else:
            cols = {
                "o_orderstatus": pa.nulls(1, pa.string()),
                "o_orderpriority": pa.nulls(1, pa.string()),
                "n_orders": pa.array([pc.sum(t.column("n_orders")).as_py() or 0], pa.int64()),
                "sum_price_cents": pa.array(
                    [pc.sum(t.column("sum_price_cents")).as_py() or 0], pa.int64()
                ),
            }
        levels.append(
            pa.table(
                {
                    "o_orderstatus": cols["o_orderstatus"],
                    "o_orderpriority": cols["o_orderpriority"],
                    "n_orders": pc.cast(cols["n_orders"], pa.int64()),
                    "sum_price_cents": pc.cast(cols["sum_price_cents"], pa.int64()),
                }
            )
        )
    return pa.concat_tables(levels)


def orders_cube(sf_dir: str) -> Dataset:
    """CUBE(o_orderstatus, o_orderpriority): order count + exact cents total
    at every grouping set. One corpus shuffle (the finest groupby, fed by
    per-batch partials); the cube expansion runs on the finest result,
    which is O(statuses x priorities)."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
                # COUNT(*) counts rows; arrow's count would skip NULL cents
                "cents": pc.coalesce(to_cents(t.column("o_totalprice")), pa.scalar(0, pa.int64())),
                "__one": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("cents", "sum"), ("__one", "sum")]
        )
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "o_orderpriority": g.column("o_orderpriority"),
                "sum_price_cents": pc.cast(g.column("cents_sum"), pa.int64()),
                "n_orders": pc.cast(g.column("__one_sum"), pa.int64()),
            }
        )

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    finest = null_safe_groupby_agg(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        Sum("n_orders", alias_name="n_orders"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
    )
    # the finest aggregate is tiny: collapse to one block and expand
    return finest.repartition(1).map_batches(
        _cube_expand, batch_format="pyarrow", batch_size=None
    )


ORDERS_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(SUM(COALESCE(CAST(round(o_totalprice * 100) AS BIGINT), 0)) AS BIGINT) AS sum_price_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# pivot (crosstab)
# ---------------------------------------------------------------------------

_STATUSES = ("F", "O", "P")


def orders_pivot(sf_dir: str) -> Dataset:
    """Crosstab: one row per o_orderpriority, one count column per order
    status. Finest (priority, status) groupby (partial pre-agg), then a
    single-block pivot of the tiny result."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("o_orderstatus", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "o_orderstatus": g.column("o_orderstatus"),
                "n": pc.cast(g.column("o_orderstatus_count"), pa.int64()),
            }
        )

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    finest = null_safe_groupby_agg(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        Sum("n", alias_name="n"),
    )

    def pivot(t: pa.Table) -> pa.Table:
        prios = pc.unique(t.column("o_orderpriority")).sort()
        cols: dict[str, pa.Array] = {"o_orderpriority": prios}
        status = t.column("o_orderstatus")
        for s in _STATUSES:
            sub = t.filter(pc.equal(status, s))
            m = dict(
                zip(sub.column("o_orderpriority").to_pylist(), sub.column("n").to_pylist())
            )
            cols[f"n_{s.lower()}"] = pa.array(
                [int(m.get(p, 0)) for p in prios.to_pylist()], pa.int64()
            )
        return pa.table(cols)

    return finest.repartition(1).map_batches(pivot, batch_format="pyarrow", batch_size=None)


ORDERS_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# per-group exact quantiles (bucket histogram per group, no global sort)
# ---------------------------------------------------------------------------

_EVQ_BP = (2500, 5000, 7500, 9000)
_EVQ_BUCKET_CENTS = 500


def event_value_quantiles(sf_dir: str) -> Dataset:
    """Exact discrete quantiles of ``events.value`` (in cents) PER
    event_type. Same two-pass plan as ``corpus.order_quantiles`` with a
    group key: (1) histogram over (event_type, bucket) — driver holds one
    count per (group, bucket), bounded by group count x value range; (2)
    per-group target ranks land in specific buckets, and only those
    (group, bucket) groups are sorted (each is a tiny fraction of the
    corpus). Rank convention: value at 1-based position ceil(q*n) within
    the group, integers end to end."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        # per-group quantiles are defined over present (group, value) pairs
        # (SQL mirror filters identically)
        t = t.filter(
            pc.and_(pc.is_valid(t.column("event_type")), pc.is_valid(t.column("value")))
        )
        c = to_cents(t.column("value"))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": c,
                "bucket": pc.divide(c, pa.scalar(_EVQ_BUCKET_CENTS)),
            }
        )

    vals = events.map_batches(cents, batch_format="pyarrow").materialize()
    hist = (
        vals.groupby(["event_type", "bucket"]).aggregate(Count(alias_name="c")).take_all()
    )
    hist.sort(key=lambda r: (r["event_type"], r["bucket"]))
    n_by_g: dict[str, int] = {}
    for r in hist:
        n_by_g[r["event_type"]] = n_by_g.get(r["event_type"], 0) + r["c"]

    # (group, bucket) -> [(q_bp, rank_within_bucket)]
    targets: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for g, n in n_by_g.items():
        for q_bp in _EVQ_BP:
            k = max(1, (q_bp * n + 9_999) // 10_000)
            cum = 0
            for r in hist:
                if r["event_type"] != g:
                    continue
                if cum + r["c"] >= k:
                    targets.setdefault((g, r["bucket"]), []).append((q_bp, k - cum))
                    break
                cum += r["c"]
    ref = ray.put(targets)

    def pick(g: pa.Table) -> pa.Table:
        t = ray.get(ref)
        key = (g.column("event_type")[0].as_py(), g.column("bucket")[0].as_py())
        wanted = t.get(key, [])
        if not wanted:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "q_bp": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        srt = np.sort(g.column("cents").to_numpy())
        return pa.table(
            {
                "event_type": pa.array([key[0]] * len(wanted), pa.string()),
                "q_bp": pa.array([q for q, _ in wanted], pa.int64()),
                "cents": pa.array([int(srt[rk - 1]) for _, rk in wanted], pa.int64()),
            }
        )

    tkeys = set(targets)

    def only_targets(t: pa.Table) -> pa.Table:
        keep = pa.array(
            [
                (g, b) in tkeys
                for g, b in zip(
                    t.column("event_type").to_pylist(), t.column("bucket").to_pylist()
                )
            ],
            pa.bool_(),
        )
        return t.filter(keep)

    return (
        vals.map_batches(only_targets, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(pick, batch_format="pyarrow")
    )


EVENT_VALUE_QUANTILES_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, CAST(q_bp AS BIGINT) AS q_bp, cents
FROM (VALUES {", ".join(f"({q})" for q in _EVQ_BP)}) AS qs(q_bp)
JOIN r ON r.rn = greatest(1, (CAST(q_bp AS BIGINT) * r.n + 9999) // 10000)
"""


# ---------------------------------------------------------------------------
# set intersection
# ---------------------------------------------------------------------------


def click_and_purchase_users(sf_dir: str) -> Dataset:
    """User ids present in BOTH click and purchase streams (INTERSECT).

    Tag clicks 0 / purchases 1, dedup (user, tag) per batch (the shuffle
    moves distinct pairs, not events), union, then one groupby(user_id)
    keeping rows with Min(tag)=0 and Max(tag)=1 — both streams present.
    No driver sets at any cardinality."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        t = t.filter(keep)
        tags = pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64())
        pairs = pa.table({"user_id": t.column("user_id"), "tag": tags})
        g = pairs.group_by(["user_id", "tag"]).aggregate([])  # per-batch dedup
        return g

    tagged = events.map_batches(tag, batch_format="pyarrow")
    both = (
        tagged.groupby("user_id")
        .aggregate(Min("tag", alias_name="lo"), Max("tag", alias_name="hi"))
        .filter(expr="lo == 0 and hi == 1")
    )
    return both.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id")}), batch_format="pyarrow"
    )


CLICK_AND_PURCHASE_USERS_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


REGISTRY: dict[str, tuple] = {
    "orders_cube": (orders_cube, ORDERS_CUBE_SQL),
    "orders_pivot": (orders_pivot, ORDERS_PIVOT_SQL),
    "event_value_quantiles": (event_value_quantiles, EVENT_VALUE_QUANTILES_SQL),
    "click_and_purchase_users": (click_and_purchase_users, CLICK_AND_PURCHASE_USERS_SQL),
}


def orders_unpivot(sf_dir: str) -> Dataset:
    """UNPIVOT (melt): the crosstab back to long (priority, status, n) —
    the inverse reporting reshape. Derived from the same single-block pivot
    result, so the corpus-sized work is still the one finest groupby."""

    def melt(t: pa.Table) -> pa.Table:
        prios = t.column("o_orderpriority")
        pieces = []
        for s in _STATUSES:
            pieces.append(
                pa.table(
                    {
                        "o_orderpriority": prios,
                        "status": pa.array([s] * t.num_rows, pa.string()),
                        "n": t.column(f"n_{s.lower()}"),
                    }
                )
            )
        return pa.concat_tables(pieces)

    return orders_pivot(sf_dir).map_batches(melt, batch_format="pyarrow", batch_size=None)


ORDERS_UNPIVOT_SQL = """
SELECT o_orderpriority, status, CAST(SUM(CASE WHEN o_orderstatus = status THEN 1 ELSE 0 END) AS BIGINT) AS n
FROM orders CROSS JOIN (VALUES ('F'), ('O'), ('P')) AS s(status)
GROUP BY o_orderpriority, status
"""

REGISTRY["orders_unpivot"] = (orders_unpivot, ORDERS_UNPIVOT_SQL)


def custs_finished_only(sf_dir: str) -> Dataset:
    """Customer keys with a finished ('F') order but NO open ('O') order
    (EXCEPT — the set-difference sibling of ``click_and_purchase_users``;
    the churn/completion audit shape).

    Same tag-union plan: dedup (custkey, tag) per batch, one
    groupby(custkey) keeping Max(tag)=0 (tag 1 = open order seen). The
    shuffle moves distinct pairs; no driver sets at any cardinality."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"])

    def tag(t: pa.Table) -> pa.Table:
        st = t.column("o_orderstatus")
        keep = pc.and_(
            pc.or_(pc.equal(st, "F"), pc.equal(st, "O")),
            pc.is_valid(t.column("o_custkey")),
        )
        t = t.filter(keep)
        tags = pc.cast(pc.equal(t.column("o_orderstatus"), "O"), pa.int64())
        return (
            pa.table({"o_custkey": t.column("o_custkey"), "tag": tags})
            .group_by(["o_custkey", "tag"])
            .aggregate([])
        )

    tagged = orders.map_batches(tag, batch_format="pyarrow")
    f_only = (
        tagged.groupby("o_custkey")
        .aggregate(Max("tag", alias_name="hi"))
        .filter(expr="hi == 0")
    )
    out = f_only.map_batches(
        lambda t: pa.table({"o_custkey": t.column("o_custkey")}), batch_format="pyarrow"
    )
    # a legitimately-empty difference yields ZERO blocks in Ray 2.49 (empty
    # hash-aggregate partitions are dropped) and schema() would be None —
    # union one typed 0-row block; costs nothing when non-empty.
    empty = rd.from_arrow(pa.schema([("o_custkey", pa.int64())]).empty_table())
    return out.union(empty)


CUSTS_FINISHED_ONLY_SQL = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL
"""

REGISTRY["custs_finished_only"] = (custs_finished_only, CUSTS_FINISHED_ONLY_SQL)


def user_top_event_type(sf_dir: str) -> Dataset:
    """Per-user MODE: the most frequent event_type (ties → lexicographically
    smallest) and its count — categorical profile compaction.

    Plan: per-batch (user, type) census (the shuffle carries counts, not
    events) → one groupby((user, type)) Sum → coarse-key ``grouped_scan``
    by user for the argmax, vectorized over the whole partition frame (sort
    + drop_duplicates, no per-key Python)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])

    def census(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("event_type")))
        )
        t = t.append_column("n", pa.array([1] * t.num_rows, pa.int64()))
        g = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["user_id", "event_type", "n"])

    counts = (
        events.map_batches(census, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def pick(df):
        df = df.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        ).drop_duplicates("user_id", keep="first")
        return df.drop(columns=["__part"])

    out = grouped_scan(counts, "user_id", pick)
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "top_type": t.column("event_type"),
                "n": t.column("n"),
            }
        ),
        batch_format="pyarrow",
    )


USER_TOP_EVENT_TYPE_SQL = """
SELECT user_id, event_type AS top_type, n FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rn
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY user_id, event_type
) WHERE rn = 1
"""

REGISTRY["user_top_event_type"] = (user_top_event_type, USER_TOP_EVENT_TYPE_SQL)


# ---------------------------------------------------------------------------
# Pareto skyline (dominance frontier)
# ---------------------------------------------------------------------------


def _skyline_block(t: pa.Table) -> pa.Table:
    """Exact 2D skyline of one block, minimizing (cents, day). x dominates y
    iff x.cents <= y.cents AND x.day <= y.day AND at least one is strict —
    equal points never dominate each other, so duplicates of a frontier
    point all survive (NOT EXISTS semantics). Vectorized: sort by (cents,
    day), a row is dominated iff some strictly-cheaper group has min-day
    <= its day, or a same-cents row has a strictly smaller day."""
    if t.num_rows == 0:
        return t
    p = t.column("cents").to_numpy(zero_copy_only=False)
    d = t.column("day").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, p))
    p_s, d_s = p[order], d[order]
    new_p = np.empty(len(p_s), dtype=bool)
    new_p[0] = True
    np.not_equal(p_s[1:], p_s[:-1], out=new_p[1:])
    gidx = np.cumsum(new_p) - 1  # group index per row
    gstart = np.flatnonzero(new_p)
    gmin = d_s[gstart]  # day sorted within a cents-group: first = min
    prev_gmin = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(gmin)[:-1])
    )
    dominated = (prev_gmin[gidx] <= d_s) | (d_s > gmin[gidx])
    keep_idx = order[~dominated]
    return t.take(pa.array(np.sort(keep_idx)))


def pareto_orders(sf_dir: str) -> Dataset:
    """Skyline query: orders on the (price, date) Pareto frontier — no other
    order is both cheaper-or-equal and earlier-or-equal with one strict.
    The multi-objective "best deals" primitive (top-k can't express it).

    Plan: skylines COMPOSE — a globally non-dominated point is non-dominated
    in its block, so a per-block vectorized prune (zero shuffle, drops ~all
    rows) followed by one exact pass over the union of block frontiers is
    exact. The final pass runs on a single co-located block; 2D frontiers
    are tiny in practice (worst case — perfectly anti-correlated objectives
    — the frontier IS the dataset, and any exact engine must materialize
    it; recurse the merge if a domain ever hits that).

    NULL price/date rows are excluded (SQL: a NULL objective can never be
    compared, mirrored with IS NOT NULL)."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("o_totalprice")), pc.is_valid(t.column("o_orderdate"))
            )
        )
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000  # numpy // floors, matching the SQL formula
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "cents": to_cents(t.column("o_totalprice")),
                "day": pa.array(day),
            }
        )

    pts = orders.map_batches(prep, batch_format="pyarrow")
    pruned = pts.map_batches(_skyline_block, batch_format="pyarrow", batch_size=None)
    return pruned.repartition(1).map_batches(
        _skyline_block, batch_format="pyarrow", batch_size=None
    )


PARETO_ORDERS_SQL = """
WITH t AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST((epoch_us(o_orderdate)
               - ((epoch_us(o_orderdate) % 86400000000 + 86400000000) % 86400000000))
              // 86400000000 AS BIGINT) AS day
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT o_orderkey, cents, day FROM t o
WHERE NOT EXISTS (
  SELECT 1 FROM t x
  WHERE x.cents <= o.cents AND x.day <= o.day
    AND (x.cents < o.cents OR x.day < o.day)
)
"""

REGISTRY["pareto_orders"] = (pareto_orders, PARETO_ORDERS_SQL)


# ---------------------------------------------------------------------------
# per-group interpolated percentiles (PERCENTILE_CONT with PARTITION BY)
# ---------------------------------------------------------------------------


def event_value_percentile_cont(sf_dir: str) -> pa.Table:
    """PERCENTILE_CONT per event_type with EXACT integer interpolation
    (same e4 convention as ``corpus.order_percentile_cont``): per group,
    rank index RN = (n-1)*q in 1e-4 units splits into the lower neighbor's
    rank and fraction f, and ``value_e4 = lo*(10^4 - f) + hi*f`` — the
    PARTITION BY variant completing the quantile matrix (global discrete /
    global interpolated / per-group discrete / per-group interpolated).

    Same per-group bucket-histogram plan as ``event_value_quantiles``:
    both neighbor ranks of every (group, percentile) map to
    (group, bucket, local rank) targets; only rank-bearing (group, bucket)
    cells are sorted; the driver folds <= 2*|groups|*|percentiles| rows."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("event_type")), pc.is_valid(t.column("value")))
        )
        c = to_cents(t.column("value"))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": c,
                "bucket": pc.divide(c, pa.scalar(_EVQ_BUCKET_CENTS)),
            }
        )

    vals = events.map_batches(cents, batch_format="pyarrow").materialize()
    hist = (
        vals.groupby(["event_type", "bucket"]).aggregate(Count(alias_name="c")).take_all()
    )
    hist.sort(key=lambda r: (r["event_type"], r["bucket"]))
    by_g: dict[str, list] = {}
    for r in hist:
        by_g.setdefault(r["event_type"], []).append(r)

    targets: dict[tuple[str, int], list[tuple[int, int, int]]] = {}
    fracs: dict[tuple[str, int], int] = {}
    for g, rows_g in by_g.items():
        n = sum(r["c"] for r in rows_g)
        for q_bp in _EVQ_BP:
            rn_e4 = (n - 1) * q_bp
            fracs[(g, q_bp)] = rn_e4 % 10_000
            lo_rn = rn_e4 // 10_000 + 1
            for which, rk in ((0, lo_rn), (1, min(lo_rn + 1, n))):
                cum = 0
                for r in rows_g:
                    if cum + r["c"] >= rk:
                        targets.setdefault((g, r["bucket"]), []).append((q_bp, which, rk - cum))
                        break
                    cum += r["c"]
    ref = ray.put(targets)

    def pick(g: pa.Table) -> pa.Table:
        t = ray.get(ref)
        key = (g.column("event_type")[0].as_py(), g.column("bucket")[0].as_py())
        wanted = t.get(key, [])
        if not wanted:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "q_bp": pa.array([], pa.int64()),
                    "which": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        srt = np.sort(g.column("cents").to_numpy())
        return pa.table(
            {
                "event_type": pa.array([key[0]] * len(wanted), pa.string()),
                "q_bp": pa.array([q for q, _, _ in wanted], pa.int64()),
                "which": pa.array([w for _, w, _ in wanted], pa.int64()),
                "cents": pa.array([int(srt[rk - 1]) for _, _, rk in wanted], pa.int64()),
            }
        )

    tkeys = set(targets)

    def only_targets(t: pa.Table) -> pa.Table:
        keep = pa.array(
            [
                (g, b) in tkeys
                for g, b in zip(
                    t.column("event_type").to_pylist(), t.column("bucket").to_pylist()
                )
            ],
            pa.bool_(),
        )
        return t.filter(keep)

    picked = (
        vals.map_batches(only_targets, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(pick, batch_format="pyarrow")
        .take_all()
    )
    by_q: dict[tuple[str, int], dict[int, int]] = {}
    for r in picked:
        by_q.setdefault((r["event_type"], r["q_bp"]), {})[r["which"]] = r["cents"]
    out_g, out_q, out_v = [], [], []
    for (g, q_bp), d in sorted(by_q.items()):
        f = fracs[(g, q_bp)]
        out_g.append(g)
        out_q.append(q_bp)
        out_v.append(d[0] * (10_000 - f) + d[1] * f)
    return pa.table(
        {
            "event_type": pa.array(out_g, pa.string()),
            "q_bp": pa.array(out_q, pa.int64()),
            "value_e4": pa.array(out_v, pa.int64()),
        }
    )


EVENT_VALUE_PERCENTILE_CONT_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
o AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn
  FROM c
),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1),
t AS (
  SELECT n.event_type, CAST(q_bp AS BIGINT) AS q_bp,
         ((cnt - 1) * CAST(q_bp AS BIGINT)) // 10000 + 1 AS lo_rn,
         ((cnt - 1) * CAST(q_bp AS BIGINT)) % 10000 AS f,
         cnt
  FROM (VALUES {", ".join(f"({q})" for q in _EVQ_BP)}) AS qs(q_bp), n
)
SELECT t.event_type, t.q_bp,
       CAST((SELECT cents FROM o WHERE o.event_type = t.event_type AND o.rn = t.lo_rn) * (10000 - t.f)
          + (SELECT cents FROM o WHERE o.event_type = t.event_type AND o.rn = least(t.lo_rn + 1, t.cnt)) * t.f AS BIGINT) AS value_e4
FROM t
"""

REGISTRY["event_value_percentile_cont"] = (
    event_value_percentile_cont,
    EVENT_VALUE_PERCENTILE_CONT_SQL,
)


# ---------------------------------------------------------------------------
# ROLLUP over a drill-down hierarchy (type -> day)
# ---------------------------------------------------------------------------


def events_time_rollup(sf_dir: str) -> Dataset:
    """ROLLUP(event_type, day): event count + exact cents total at each
    drill-down level — (type, day), (type), grand total — the hierarchical
    report sibling of ``orders_cube`` (CUBE materializes every subset;
    ROLLUP only the prefix chain, the shape time-hierarchy dashboards
    ask for).

    Same plan as the cube: ONE corpus shuffle to the finest (type, day)
    aggregate (per-batch partials, null-safe keys — a NULL ts is a genuine
    NULL-day group, distinct from the rolled-up NULL), then the three
    prefix levels expand from the finest block (counts/sums re-aggregate
    exactly)."""
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.divide(
            pc.subtract(us, pc.if_else(pc.less(us, 0), 86_399_999_999, 0)),
            86_400_000_000,
        )
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "cents": pc.coalesce(to_cents(t.column("value")), pa.scalar(0, pa.int64())),
                "__one": pa.array([1] * t.num_rows, pa.int64()),
            }
        ).group_by(["event_type", "day"]).aggregate([("cents", "sum"), ("__one", "sum")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "value_cents": pc.cast(g.column("cents_sum"), pa.int64()),
                "n_events": pc.cast(g.column("__one_sum"), pa.int64()),
            }
        )

    finest = null_safe_groupby_agg(
        events.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )

    def rollup_expand(t: pa.Table) -> pa.Table:
        levels = []
        for keys in (["event_type", "day"], ["event_type"], []):
            if keys:
                g = t.group_by(keys).aggregate(
                    [("n_events", "sum"), ("value_cents", "sum")]
                )
                cols = {k: g.column(k) for k in keys}
                n = g.num_rows
                if "day" not in keys:
                    cols["day"] = pa.nulls(n, pa.int64())
            else:
                cols = {
                    "event_type": pa.nulls(1, pa.string()),
                    "day": pa.nulls(1, pa.int64()),
                }
                g = None
            levels.append(
                pa.table(
                    {
                        "event_type": cols["event_type"],
                        "day": cols["day"],
                        "n_events": pc.cast(
                            g.column("n_events_sum"), pa.int64()
                        )
                        if g is not None
                        else pa.array(
                            [pc.sum(t.column("n_events")).as_py() or 0], pa.int64()
                        ),
                        "value_cents": pc.cast(
                            g.column("value_cents_sum"), pa.int64()
                        )
                        if g is not None
                        else pa.array(
                            [pc.sum(t.column("value_cents")).as_py() or 0], pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(levels)

    return finest.repartition(1).map_batches(
        rollup_expand, batch_format="pyarrow", batch_size=None
    )


EVENTS_TIME_ROLLUP_SQL = """
SELECT event_type, day,
       count(*) AS n_events,
       CAST(SUM(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT) AS value_cents
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value FROM events)
GROUP BY ROLLUP (event_type, day)
"""

REGISTRY["events_time_rollup"] = (events_time_rollup, EVENTS_TIME_ROLLUP_SQL)


def click_view_users_bag(sf_dir: str) -> Dataset:
    """INTERSECT ALL — bag semantics: each user id appears
    ``min(#clicks, #views)`` times, completing the set-operation matrix
    (INTERSECT distinct, EXCEPT, UNION, and now the multiset variant SQL
    pipelines use for frequency-capped audience joins).

    Plan: per-batch (user, side) count partials (arrow ``group_by``), ONE
    null-safe user-keyed groupby summing both side counts, then a
    vectorized ``np.repeat`` expansion per batch — the shuffle carries two
    int64 counts per distinct user, never event rows, and the only
    row-expansion happens post-aggregation, bounded by the answer size.

    Contract (mirrored in DuckDB): INTERSECT ALL treats NULL keys as
    equal (IS NOT DISTINCT FROM semantics), so NULL user ids intersect
    too — the null-safe key encoding reproduces that exactly."""
    from ocr_ray.functions.nullsafe import decode_null_keys, encode_null_keys

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        t = t.filter(pc.or_(pc.equal(et, "click"), pc.equal(et, "view")))
        flags = pa.table(
            {
                "user_id": t.column("user_id"),
                "nc": pc.cast(pc.equal(t.column("event_type"), "click"), pa.int64()),
                "nv": pc.cast(pc.equal(t.column("event_type"), "view"), pa.int64()),
            }
        )
        flags = encode_null_keys(flags, ["user_id"])
        return flags.group_by(["user_id", "__n_user_id"]).aggregate(
            [("nc", "sum"), ("nv", "sum")]
        ).rename_columns(["user_id", "__n_user_id", "nc", "nv"])

    counts = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "__n_user_id"])
        .aggregate(Sum("nc", alias_name="nc"), Sum("nv", alias_name="nv"))
    )

    def expand(t: pa.Table) -> pa.Table:
        t = decode_null_keys(t, ["user_id"])
        nc = t.column("nc").to_numpy(zero_copy_only=False)
        nv = t.column("nv").to_numpy(zero_copy_only=False)
        reps = np.minimum(nc, nv)
        keep = reps > 0
        idx = np.repeat(np.flatnonzero(keep), reps[keep].astype(np.int64))
        return pa.table({"user_id": t.column("user_id").take(pa.array(idx, pa.int64()))})

    return counts.map_batches(expand, batch_format="pyarrow")


CLICK_VIEW_USERS_BAG_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
"""

REGISTRY["click_view_users_bag"] = (click_view_users_bag, CLICK_VIEW_USERS_BAG_SQL)


def user_activity_bitmask(sf_dir: str) -> Dataset:
    """Bitmap aggregate: per user, an int64 DAY-OF-CYCLE presence mask
    (bit b set iff the user was active on any day with ``day_index % 63
    == b``) plus the exact count of distinct active cycle-days — the
    bitmap-index primitive warehouses build for segment pruning and
    activity-pattern joins, expressed as pure integer arithmetic so both
    engines hash identical values.

    Plan: per-batch DISTINCT (user, bucket) pairs (arrow group_by), ONE
    pair-keyed groupby dedup, bit = 1<<bucket, then a user-keyed Sum —
    each bit is present at most once per user after the dedup, so SUM is
    exactly OR. Keys-only shuffles throughout; the mask is 8 bytes per
    user no matter how many events.

    Contract (mirrored in SQL): NULL user_id / ts rows are excluded;
    day_index uses FLOOR division (all fixture ts >= epoch; the positive-
    mod mirrors numpy for any sign)."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (us // 86_400_000_000) % 63
        p = pa.table(
            {
                "user_id": t.column("user_id"),
                "b": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )
        return p.group_by(["user_id", "b"]).aggregate([])

    distinct_pairs = (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby(["user_id", "b"])
        .count()
    )

    def to_bits(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "bit": pa.array(np.left_shift(np.int64(1), b), pa.int64()),
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    agg = (
        distinct_pairs.map_batches(to_bits, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("bit", alias_name="day_mask"), Sum("one", alias_name="n_active_days"))
    )
    return agg.select_columns(["user_id", "day_mask", "n_active_days"])


USER_ACTIVITY_BITMASK_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         ((epoch_us(ts) // 86400000000) % 63 + 63) % 63 AS b
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT user_id,
       CAST(SUM(CAST(1 AS BIGINT) << b) AS BIGINT) AS day_mask,
       CAST(COUNT(*) AS BIGINT) AS n_active_days
FROM d GROUP BY user_id
"""

REGISTRY["user_activity_bitmask"] = (user_activity_bitmask, USER_ACTIVITY_BITMASK_SQL)


def geo_revenue_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP(region, nation) over the 4-table join orders→customer→
    nation→region: revenue cents and order counts at every drill-down
    level of the geography hierarchy — the joined-dimension ROLLUP (the
    time rollup above aggregates one table; dashboards roll up across a
    snowflake).

    Plan: the two tiny dims load driver-side ONCE into a nationkey →
    (nation, region) dict (25+5 rows — the q5 pattern); orders joins
    customer keys-only via the size-gated ``auto_join``; per-batch census
    to (region, nation) partials (≤ 25 cells/batch) and a driver fold
    expands the three prefix levels exactly. No shuffle beyond the one
    join; the rollup itself moves dozens of bytes.

    Contract (mirrored in SQL): inner-join semantics throughout (NULL or
    orphaned keys drop at every hop); NULL o_totalprice rows excluded."""
    import pyarrow.parquet as pq_

    from ocr_ray.functions.joins import auto_join

    nation = pq_.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq_.read_table(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    # NULL names stay REAL groups (SQL's ROLLUP keeps a NULL-named nation
    # as its own cell, distinct from the rolled-up NULL row); only NULL /
    # orphaned KEYS drop (inner-join semantics)
    rmap = {
        k: v
        for k, v in zip(
            region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()
        )
        if k is not None
    }
    nmap = {}
    for nk, nn, rk in zip(
        nation.column("n_nationkey").to_pylist(),
        nation.column("n_name").to_pylist(),
        nation.column("n_regionkey").to_pylist(),
    ):
        if nk is not None and rk in rmap:
            nmap[nk] = (nn, rmap[rk])

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("o_custkey")), pc.is_valid(t.column("o_totalprice")))
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    joined = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    # dense LUT over the tiny nationkey domain (offset by the min key —
    # a hostile-negated key is still an equality match in SQL, and a raw
    # negative index would silently write into the array's tail)
    lo = min(nmap) if nmap else 0
    hi = max(nmap) if nmap else -1
    span = hi - lo + 2
    lut_valid = np.zeros(max(span, 1), dtype=bool)
    lut_nation = np.empty(max(span, 1), dtype=object)
    lut_region = np.empty(max(span, 1), dtype=object)
    for nk_, (nn_, rn_) in nmap.items():
        lut_valid[nk_ - lo] = True
        lut_nation[nk_ - lo] = nn_
        lut_region[nk_ - lo] = rn_

    def census(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("c_nationkey")))
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = to_cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        ok = (nk >= lo) & (nk <= hi)
        idx = np.where(ok, nk - lo, hi - lo + 1)
        ok &= lut_valid[idx]
        nk, cents = nk[ok] - lo, cents[ok]
        g = pa.table(
            {
                "nation": pa.array(lut_nation[nk], pa.string()),
                "region": pa.array(lut_region[nk], pa.string()),
                "n": pa.array(np.ones(len(nk), np.int64)),
                "cents": pa.array(cents.astype(np.int64)),
            }
        ).group_by(["nation", "region"]).aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["nation", "region", "n_orders", "revenue_cents"])

    folded: dict[tuple, list] = {}
    for b in joined.map_batches(census, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            k = (r["region"], r["nation"])
            cur = folded.get(k)
            if cur is None:
                folded[k] = [r["n_orders"], r["revenue_cents"]]
            else:
                cur[0] += r["n_orders"]
                cur[1] += r["revenue_cents"]

    def _nskey(v):
        return (v is None, v if v is not None else "")

    rows: list[tuple] = []
    for (rg, nt), (n, c) in sorted(
        folded.items(), key=lambda kv: (_nskey(kv[0][0]), _nskey(kv[0][1]))
    ):
        rows.append((rg, nt, n, c))
    by_region: dict = {}
    for rg, _, n, c in rows:
        cur = by_region.setdefault(rg, [0, 0])
        cur[0] += n
        cur[1] += c
    grand = [sum(v[0] for v in by_region.values()), sum(v[1] for v in by_region.values())]
    for rg, (n, c) in sorted(by_region.items(), key=lambda kv: _nskey(kv[0])):
        rows.append((rg, None, n, c))
    if rows:
        rows.append((None, None, grand[0], grand[1]))
    return pa.table(
        {
            "region": pa.array([r[0] for r in rows], pa.string()),
            "nation": pa.array([r[1] for r in rows], pa.string()),
            "n_orders": pa.array([r[2] for r in rows], pa.int64()),
            "revenue_cents": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


GEO_REVENUE_ROLLUP_SQL = """
SELECT r_name AS region, n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_totalprice IS NOT NULL
GROUP BY ROLLUP (r_name, n_name)
"""

REGISTRY["geo_revenue_rollup"] = (geo_revenue_rollup, GEO_REVENUE_ROLLUP_SQL)


def orders_monthly_mom(sf_dir: str) -> pa.Table:
    """Month-over-month revenue deltas: per calendar month present in the
    data, total cents, the PREVIOUS present month's cents (lag), and the
    exact delta — the period-over-period report layered on the monthly
    census (lag is over months that exist, not a dense calendar; the
    gap-filled family handles densification).

    Plan: the monthly census is the usual per-batch partial + driver fold
    (months are bounded by the time span — dozens, never data-sized);
    the lag is a driver-side sorted diff. SQL mirror: lag() window.

    Contract (mirrored): NULL o_orderdate rows excluded; NULL prices sum
    as 0 (COALESCE); the first month's prev/delta are NULL."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderdate")))
        g = pa.table(
            {
                "ym": pc.add(
                    pc.multiply(pc.cast(pc.year(t.column("o_orderdate")), pa.int64()), 12),
                    pc.cast(pc.month(t.column("o_orderdate")), pa.int64()),
                ),
                "cents": pc.coalesce(to_cents(t.column("o_totalprice")), pa.scalar(0, pa.int64())),
            }
        )
        return g.group_by("ym").aggregate([("cents", "sum")]).rename_columns(["ym", "cents"])

    folded: dict[int, int] = {}
    for b in orders.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            folded[r["ym"]] = folded.get(r["ym"], 0) + r["cents"]
    yms = sorted(folded)
    cents = [folded[y] for y in yms]
    prev = [None] + cents[:-1]
    delta = [None if p is None else c - p for c, p in zip(cents, prev)]
    return pa.table(
        {
            "y": pa.array([(y - 1) // 12 for y in yms], pa.int64()),
            "m": pa.array([(y - 1) % 12 + 1 for y in yms], pa.int64()),
            "revenue_cents": pa.array(cents, pa.int64()),
            "prev_cents": pa.array(prev, pa.int64()),
            "delta_cents": pa.array(delta, pa.int64()),
        }
    )


ORDERS_MONTHLY_MOM_SQL = """
WITH m AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(SUM(COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), 0)) AS BIGINT) AS revenue_cents
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
)
SELECT y, m, revenue_cents,
       CAST(lag(revenue_cents) OVER (ORDER BY y, m) AS BIGINT) AS prev_cents,
       CAST(revenue_cents - lag(revenue_cents) OVER (ORDER BY y, m) AS BIGINT) AS delta_cents
FROM m
"""

REGISTRY["orders_monthly_mom"] = (orders_monthly_mom, ORDERS_MONTHLY_MOM_SQL)


def click_minus_view_users_bag(sf_dir: str) -> Dataset:
    """EXCEPT ALL — bag difference: each user id appears
    ``max(0, #clicks − #views)`` times, the multiset subtraction that
    completes the set-operation matrix (UNION / INTERSECT / EXCEPT /
    INTERSECT ALL / now EXCEPT ALL) — the frequency-decrement SQL
    pipelines use for "remaining quota after consumed impressions".

    Plan: identical dataflow to ``click_view_users_bag`` (per-batch
    (user, side) count partials, ONE null-safe user-keyed groupby, then a
    post-aggregation ``np.repeat`` expansion bounded by the answer size) —
    only the reps formula differs: ``max(0, nc − nv)`` instead of
    ``min(nc, nv)``.

    Contract (mirrored in DuckDB): EXCEPT ALL treats NULL keys as equal
    (IS NOT DISTINCT FROM semantics), so NULL click rows survive only in
    excess of NULL view rows."""
    from ocr_ray.functions.nullsafe import decode_null_keys, encode_null_keys

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        t = t.filter(pc.or_(pc.equal(et, "click"), pc.equal(et, "view")))
        flags = pa.table(
            {
                "user_id": t.column("user_id"),
                "nc": pc.cast(pc.equal(t.column("event_type"), "click"), pa.int64()),
                "nv": pc.cast(pc.equal(t.column("event_type"), "view"), pa.int64()),
            }
        )
        flags = encode_null_keys(flags, ["user_id"])
        return flags.group_by(["user_id", "__n_user_id"]).aggregate(
            [("nc", "sum"), ("nv", "sum")]
        ).rename_columns(["user_id", "__n_user_id", "nc", "nv"])

    counts = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "__n_user_id"])
        .aggregate(Sum("nc", alias_name="nc"), Sum("nv", alias_name="nv"))
    )

    def expand(t: pa.Table) -> pa.Table:
        t = decode_null_keys(t, ["user_id"])
        nc = t.column("nc").to_numpy(zero_copy_only=False)
        nv = t.column("nv").to_numpy(zero_copy_only=False)
        reps = np.maximum(nc - nv, 0)
        keep = reps > 0
        idx = np.repeat(np.flatnonzero(keep), reps[keep].astype(np.int64))
        return pa.table({"user_id": t.column("user_id").take(pa.array(idx, pa.int64()))})

    return counts.map_batches(expand, batch_format="pyarrow")


CLICK_MINUS_VIEW_USERS_BAG_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'view'
"""

REGISTRY["click_minus_view_users_bag"] = (
    click_minus_view_users_bag,
    CLICK_MINUS_VIEW_USERS_BAG_SQL,
)


# ---------------------------------------------------------------------------
# dense dimension matrix: CROSS JOIN zero-fill (type x day-of-week)
# ---------------------------------------------------------------------------


def type_dow_matrix(sf_dir: str) -> "Dataset":
    """Dense (event_type × day-of-week) activity matrix with ZERO rows for
    every absent combination — the CROSS JOIN + COALESCE(0) reshape that
    feeds heatmaps and seasonality models (a sparse census silently reads
    "no row" as "no signal"; models need the explicit zero). The global
    dimension-product sibling of the per-entity resample
    (``timeseries.user_days_gapfilled``).

    Day-of-week is integer calendar arithmetic (``(epoch_days + 3) % 7``,
    Monday = 0 — epoch day zero is a Thursday) so both engines agree
    without locale-dependent DOW functions.

    Plan: one per-batch (type, dow) census → driver fold of the tiny
    dimension-bounded table → dense expansion |types| × 7 (dimensions are
    bounded by the type domain, not the corpus). NULL type is a REAL
    dimension row (SQL DISTINCT keeps it).

    Contract (mirrored in SQL): NULL ts rows are excluded."""
    import numpy as np

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def census(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts")))
        days = np.floor_divide(
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            86_400_000_000,
        )
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "dow": pa.array(np.mod(days + 3, 7), pa.int64()),
            }
        )
        out = g.group_by(["event_type", "dow"]).aggregate([([], "count_all")])
        return out.rename_columns(["event_type", "dow", "n"])

    folds: dict = {}
    for b in events.map_batches(census, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for ty, dw, n in zip(
            b.column("event_type").to_pylist(),
            b.column("dow").to_pylist(),
            b.column("n").to_pylist(),
        ):
            folds[(ty, dw)] = folds.get((ty, dw), 0) + n

    types = sorted({k[0] for k in folds}, key=lambda x: (x is None, x))
    rows_t, rows_d, rows_n = [], [], []
    for ty in types:
        for dw in range(7):
            rows_t.append(ty)
            rows_d.append(dw)
            rows_n.append(folds.get((ty, dw), 0))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(rows_t, pa.string()),
                "dow": pa.array(rows_d, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )
    )


TYPE_DOW_MATRIX_SQL = """
WITH v AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow
  FROM events WHERE ts IS NOT NULL
),
c AS (SELECT event_type, dow, COUNT(*) AS n FROM v GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type FROM v),
days AS (SELECT * FROM generate_series(0, 6) AS g(dow))
SELECT t.event_type, CAST(d.dow AS BIGINT) AS dow,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM types t CROSS JOIN days d
LEFT JOIN c ON c.event_type IS NOT DISTINCT FROM t.event_type AND c.dow = d.dow
"""


# ---------------------------------------------------------------------------
# ABC analysis (Pareto revenue classing)
# ---------------------------------------------------------------------------


def cust_abc_classes(sf_dir: str) -> "Dataset":
    """ABC / Pareto classification of customers by revenue: ranked by spend
    (descending, customer key tie-break), class A while cumulative revenue
    ≤ 80% of total, B through 95%, C beyond — the inventory-management
    cut that tells a team where the value mass is. Thresholds are the
    exact integer cross-products ``cum·5 ≤ tot·4`` and ``cum·20 ≤ tot·19``
    so no percentage is ever a float.

    Plan: per-batch customer-spend partials through ONE keyed groupby
    (ints only), then the customer-bounded census folds on the driver for
    the ordered cumulative scan (customers are a dimension here; at
    dimension-breaking cardinality the spend-histogram threshold plan of
    the rank family applies — find the two spend cutoffs from the bucket
    census, label per row by comparison).

    Contract (mirrored in SQL): NULL custkey orders excluded; NULL prices
    contribute nothing; a customer whose orders all have NULL prices
    keeps spend 0 and sorts by the tie-break."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ocr_ray.functions.scalars import to_cents

    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_custkey")))
        c = pc.fill_null(to_cents(t.column("o_totalprice")), 0)
        g = pa.table({"o_custkey": t.column("o_custkey"), "c": c})
        return g.group_by(["o_custkey"]).aggregate([("c", "sum")]).rename_columns(
            ["o_custkey", "c"]
        )

    spend = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("c", alias_name="c"))
    )
    keys, cents = [], []
    for b in spend.iter_batches(batch_format="pyarrow", batch_size=None):
        keys.extend(b.column("o_custkey").to_pylist())
        cents.extend(b.column("c").to_pylist())
    k = np.array(keys, dtype=np.int64)
    c = np.array(cents, dtype=np.int64)
    order = np.lexsort((k, -c))
    k, c = k[order], c[order]
    cum = np.cumsum(c)
    tot = int(c.sum())
    cls = np.where(cum * 5 <= tot * 4, "A", np.where(cum * 20 <= tot * 19, "B", "C"))
    return rd.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array(k),
                "spend_cents": pa.array(c),
                "abc": pa.array(cls.tolist(), pa.string()),
            }
        )
    )


CUST_ABC_CLASSES_SQL = """
WITH s AS (
  SELECT o_custkey,
         CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS c
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
),
r AS (
  SELECT o_custkey, c,
         SUM(c) OVER (ORDER BY c DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS tot
  FROM s
)
SELECT o_custkey, c AS spend_cents,
       CASE WHEN cum * 5 <= tot * 4 THEN 'A'
            WHEN cum * 20 <= tot * 19 THEN 'B'
            ELSE 'C' END AS abc
FROM r
"""
