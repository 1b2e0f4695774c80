"""Relational query suite over the testdata tables.

Each query is implemented twice, side by side: an idiomatic Ray Data plan
(the implementation) and an ANSI-SQL string (the DuckDB oracle the driver
runs for the correctness gate). Column names match exactly between the two
— the driver's comparison sorts columns by name before hashing values.

Scale notes on every query: joins pick broadcast vs hash-shuffle by side
size; aggregations pre-combine per batch before the shuffle; money is exact
integer cents (see ocr_ray.functions.scalars) so results are independent of
reduction order.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ocr_ray.functions.joins import broadcast_join, hash_join
from ocr_ray.functions.scalars import (
    count_tokens,
    discounted_c4,
    epoch_hours,
    to_cents,
)


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _partial_groupby(batch: pa.Table, keys: list[str], sums: list[str], count_col: str | None) -> pa.Table:
    """Per-batch partial aggregation (combiner) — shrinks the shuffle input
    from O(rows) to O(groups) per batch."""
    aggs = [(c, "sum") for c in sums]
    if count_col:
        batch = batch.append_column("__one", pa.array([1] * batch.num_rows, pa.int64()))
        aggs.append(("__one", "sum"))
    g = batch.group_by(keys).aggregate(aggs)
    # arrow names results "<col>_sum"; rename back to the plain column names
    rename = {f"{c}_sum": c for c in sums}
    if count_col:
        rename["__one_sum"] = count_col
    cols = {}
    for name in g.column_names:
        cols[rename.get(name, name)] = g.column(name)
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Q1 — pricing summary (grouped aggregation with partial pre-agg)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pa.array(["1998-09-02"]).cast(pa.timestamp("us"))[0].as_py())

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        out = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "sum_base_cents": to_cents(t.column("l_extendedprice")),
                "sum_disc_c4": discounted_c4(
                    t.column("l_extendedprice"), t.column("l_discount")
                ),
            }
        )
        return _partial_groupby(
            out,
            ["l_returnflag", "l_linestatus"],
            ["sum_qty", "sum_base_cents", "sum_disc_c4"],
            "count_order",
        )

    partial = ds.map_batches(prep, batch_format="pyarrow")
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    # NULL group keys are real groups in SQL; Ray's sort shuffle would crash
    return null_safe_groupby_agg(
        partial,
        ["l_returnflag", "l_linestatus"],
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_c4", alias_name="sum_disc_c4"),
        Sum("count_order", alias_name="count_order"),
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3 — shipping priority (broadcast + hash join + grouped top-k)
# ---------------------------------------------------------------------------


def q3_top_orders(sf_dir: str) -> Dataset:
    # small side: BUILDING customers (driver-materialized, broadcast)
    import pyarrow.parquet as pq

    cust = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING")).select(
        ["c_custkey"]
    )

    cut = pa.array(["1998-01-01"]).cast(pa.timestamp("us"))[0].as_py()
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cut))),
        batch_format="pyarrow",
    )
    orders = broadcast_join(orders, cust, left_on="o_custkey", right_on="c_custkey")

    lineitem = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        # map-side combiner: sum revenue per l_orderkey WITHIN the batch
        # before the shuffle join (sum commutes through the join) — lineitem
        # is clustered by orderkey, so this collapses ~4 rows per order and
        # the join moves ~1 row per order instead (VERDICT r1 next-step #5)
        lambda t: t.append_column(
            "revenue_c4", discounted_c4(t.column("l_extendedprice"), t.column("l_discount"))
        )
        .filter(pc.greater(t.column("l_shipdate"), pa.scalar(cut)))
        .select(["l_orderkey", "revenue_c4"])
        .group_by(["l_orderkey"])
        .aggregate([("revenue_c4", "sum")])
        .rename_columns(["l_orderkey", "revenue_c4"]),
        batch_format="pyarrow",
    )
    # cost-based: the BUILDING+date-filtered orders side is ~2 orders of
    # magnitude smaller than lineitem — auto_join broadcasts it when it
    # fits (64 MB), falling back to the hash-partitioned shuffle join at
    # scales where it doesn't (the switch, not the shuffle, is the plan)
    from ocr_ray.functions.joins import auto_join

    joined = auto_join(
        lineitem,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey",
        right_on="o_orderkey",
    )
    # group on INT keys: Ray's sort-based groupby degenerates on a (pandas-
    # roundtripped, ns-precision) timestamp key — measured 17.8 s vs 1.8 s
    # for the identical aggregation with the date cast to int64 us first
    as_int = joined.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "date_us": pc.cast(
                    pc.cast(t.column("o_orderdate"), pa.timestamp("us")), pa.int64()
                ),
                "revenue_c4": t.column("revenue_c4"),
            }
        ),
        batch_format="pyarrow",
    )
    agg = as_int.groupby(["l_orderkey", "date_us"]).aggregate(
        Sum("revenue_c4", alias_name="revenue_c4")
    )
    top = agg.sort(["revenue_c4", "l_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_orderdate": pc.cast(t.column("date_us"), pa.timestamp("us")),
                "revenue_c4": t.column("revenue_c4"),
            }
        ),
        batch_format="pyarrow",
    )


Q3_SQL = """
SELECT l_orderkey,
       o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c4 DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# orders_by_nation — two chained broadcast joins + grouped agg
# ---------------------------------------------------------------------------


def orders_by_nation(sf_dir: str) -> Dataset:
    import pyarrow.parquet as pq

    cust = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    # pre-join the two small dims driver-side (both tiny), broadcast once
    # pyarrow Table.join defaults to LEFT OUTER — SQL here is INNER (a
    # customer with no nation match must drop, not carry a NULL n_name)
    dim = cust.join(
        nation, keys=["c_nationkey"], right_keys=["n_nationkey"], join_type="inner"
    ).select(
        ["c_custkey", "n_name"]
    )

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {"o_custkey": t.column("o_custkey"), "cents": to_cents(t.column("o_totalprice"))}
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_join(orders, dim, left_on="o_custkey", right_on="c_custkey")
    partial = joined.map_batches(
        lambda t: _partial_groupby(
            t.select(["n_name", "cents"]).rename_columns(["n_name", "sum_total_cents"]),
            ["n_name"],
            ["sum_total_cents"],
            "n_orders",
        ),
        batch_format="pyarrow",
    )
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    return null_safe_groupby_agg(
        partial,
        ["n_name"],
        Sum("sum_total_cents", alias_name="sum_total_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )


ORDERS_BY_NATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# top_spenders — grouped agg + global top-k
# ---------------------------------------------------------------------------


def top_spenders(sf_dir: str) -> Dataset:
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    partial = orders.map_batches(
        lambda t: _partial_groupby(
            pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "spent_cents": to_cents(t.column("o_totalprice")),
                }
            ),
            ["o_custkey"],
            ["spent_cents"],
            None,
        ),
        batch_format="pyarrow",
    )
    agg = partial.groupby("o_custkey").aggregate(Sum("spent_cents", alias_name="spent_cents"))
    return agg.sort(["spent_cents", "o_custkey"], descending=[True, False]).limit(20)


TOP_SPENDERS_SQL = """
SELECT o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spent_cents
FROM orders
GROUP BY o_custkey
ORDER BY spent_cents DESC, o_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# filter_click_events — predicate pushdown + projection
# ---------------------------------------------------------------------------


def filter_click_events(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(
        _pq(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pc.field("event_type") == "click"),
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("value"), pa.scalar(100.0)))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_cents": to_cents(t.column("value")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


FILTER_CLICK_EVENTS_SQL = """
SELECT event_id, user_id,
       CAST(ROUND(value*100) AS BIGINT) AS value_cents
FROM events
WHERE event_type = 'click' AND value >= 100.0
"""


# ---------------------------------------------------------------------------
# distinct_segments — distinct (tiny result)
# ---------------------------------------------------------------------------


def distinct_segments(sf_dir: str) -> pa.Table:
    # per-batch distinct combiner first: the shuffle then carries at most
    # (n_blocks x n_segments) rows. The final unique() is a bounded-
    # cardinality enum (5 values) — driver collection is the RESULT here.
    ds = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_mktsegment"])
    rows = ds.map_batches(
        lambda t: pa.table({"c_mktsegment": pc.unique(t.column("c_mktsegment"))}),
        batch_format="pyarrow",
    ).take_all()  # bounded: n_blocks x n_segments combiner rows
    vals = {r["c_mktsegment"] for r in rows}
    # SQL DISTINCT keeps NULL as a value; Ray's unique() sort-crashes on it
    ordered = ([None] if None in vals else []) + sorted(v for v in vals if v is not None)
    return pa.table({"c_mktsegment": pa.array(ordered, pa.string())})


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# ---------------------------------------------------------------------------
# events_hourly — tumbling-window aggregate (streaming-shaped, SURVEY §2.9)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "hour_bucket": epoch_hours(t.column("ts")),
                "sum_value_cents": to_cents(t.column("value")),
            }
        )
        return _partial_groupby(
            out, ["user_id", "hour_bucket"], ["sum_value_cents"], "n_events"
        )

    partial = ds.map_batches(prep, batch_format="pyarrow")
    return partial.groupby(["user_id", "hour_bucket"]).aggregate(
        Sum("sum_value_cents", alias_name="sum_value_cents"),
        Sum("n_events", alias_name="n_events"),
    )


EVENTS_HOURLY_SQL = """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS hour_bucket,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM events
GROUP BY user_id, hour_bucket
"""


# ---------------------------------------------------------------------------
# doc_token_counts — vectorized string function over documents
# ---------------------------------------------------------------------------


def doc_token_counts(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "n_tokens": count_tokens(t.column("text"))}
        ),
        batch_format="pyarrow",
    )


DOC_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
FROM documents
"""

# ---------------------------------------------------------------------------
# Q6 — global single-row aggregate (no groupby: per-batch partials -> one sum)
# ---------------------------------------------------------------------------


def q6_revenue_delta(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo = pa.array(["1996-01-01"]).cast(pa.timestamp("us"))[0].as_py()
    hi = pa.array(["1997-01-01"]).cast(pa.timestamp("us"))[0].as_py()

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                pc.less(t.column("l_shipdate"), pa.scalar(hi)),
            ),
            pc.and_(
                pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
                pc.and_(
                    pc.less_equal(t.column("l_discount"), pa.scalar(0.07)),
                    pc.less(t.column("l_quantity"), pa.scalar(24.0)),
                ),
            ),
        )
        t = t.filter(keep)
        rev = pc.multiply(to_cents(t.column("l_extendedprice")), to_cents(t.column("l_discount")))
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_c4": pa.array([s], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table(
        {"revenue_c4": pa.array([sum(r["revenue_c4"] for r in parts)], pa.int64())}
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# parts_like — vectorized string predicate (LIKE)
# ---------------------------------------------------------------------------


def parts_like(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_name", "p_type"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.match_substring(t.column("p_name"), "widget"),
            pc.equal(t.column("p_type"), "ECONOMY"),
        )
        return t.filter(keep).select(["p_partkey", "p_name"])

    return ds.map_batches(fn, batch_format="pyarrow")


PARTS_LIKE_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE p_name LIKE '%widget%' AND p_type = 'ECONOMY'
"""


# ---------------------------------------------------------------------------
# users_no_purchase — anti-join via broadcast key set (SURVEY §2.4)
# ---------------------------------------------------------------------------


def users_no_purchase(sf_dir: str) -> pa.Table:
    """Anti-join via broadcast buyer set (small side — defensible at scale),
    then a DISTRIBUTED distinct (per-batch combiner + groupby) instead of a
    driver ``unique()`` over an unbounded-cardinality column. Only the final
    (small) distinct result is collected.

    Three-valued NOT IN semantics (SQL): a NULL in the SUBQUERY makes the
    predicate never-true — the whole result is empty; a NULL left key is
    never "not in" anything — those rows drop. Both branches are mirrored
    exactly (same rule the broadcast_join null-key fix enforces)."""
    from ray.data.aggregate import Count

    from ocr_ray.functions.joins import anti_join_filter

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
    buyers = events.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.unique(
                    t.filter(pc.equal(t.column("event_type"), "purchase")).column("user_id")
                )
            }
        ),
        batch_format="pyarrow",
    ).unique("user_id")
    if any(b is None for b in buyers):
        return pa.table({"user_id": pa.array([], pa.int64())})
    left = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("user_id"))), batch_format="pyarrow"
    )
    rest = anti_join_filter(left, "user_id", buyers or [])
    distinct = (
        rest.map_batches(
            lambda t: pa.table({"user_id": pc.unique(t.column("user_id"))}),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Count(alias_name="_c"))
    )
    vals = sorted(r["user_id"] for r in distinct.take_all())  # final result only
    return pa.table({"user_id": pa.array(vals, pa.int64())})


USERS_NO_PURCHASE_SQL = """
SELECT DISTINCT user_id FROM events
WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase')
"""


# ---------------------------------------------------------------------------
# top_orders_per_cust — per-group top-k (windowed rank analog)
# ---------------------------------------------------------------------------


def top_orders_per_cust(sf_dir: str) -> Dataset:
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_totalprice"])
    prepped = orders.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "price_cents": to_cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        # multi-key vectorized rank: one pandas groupby per PARTITION (the
        # coarse-key grouped_scan pattern), not one Python call per customer
        g = g.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                          ascending=[True, False, True])
        # dropna=False: SQL PARTITION BY groups NULL custkey as one partition
        out = g.groupby("o_custkey", sort=False, dropna=False).head(2)
        return out[["o_custkey", "o_orderkey", "price_cents"]]

    return grouped_scan(prepped, "o_custkey", top2)


TOP_ORDERS_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey
    ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey
) <= 2
"""


# ---------------------------------------------------------------------------
# events_sessions — session windows (gap > 1h splits), streaming-shaped op:
# partition by key, sort by ts within the group, stateful scan (ray_guide
# streaming pattern). Ordering assumption: (ts, event_id) unique per user.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 3_600_000_000


def events_sessions(sf_dir: str) -> Dataset:
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_id", "ts"]
    ).map_batches(
        # sessionization is defined over valid observations: a NULL user or
        # NULL ts has no position on any session timeline (SQL mirror WHERE)
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        ),
        batch_format="pyarrow",
    )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # multi-user vectorized session scan (coarse-key grouped_scan):
        # a session break is a user change OR a gap > 1h
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        us = g["ts"].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (
            (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > _SESSION_GAP_US)
        ).astype(np.int64)
        sess = np.cumsum(new)
        out = pd.DataFrame({"user_id": uid, "us": us, "sess": sess})
        agg = out.groupby("sess", sort=False).agg(
            user_id=("user_id", "first"),
            session_start_us=("us", "min"),
            session_end_us=("us", "max"),
            n_events=("us", "size"),
        )
        agg["duration_us"] = agg["session_end_us"] - agg["session_start_us"]
        return agg.reset_index(drop=True)[
            ["user_id", "session_start_us", "n_events", "duration_us"]
        ]

    return grouped_scan(events, "user_id", sessions)


EVENTS_SESSIONS_SQL = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM x
)
SELECT user_id,
       MIN(epoch_us(ts)) AS session_start_us,
       COUNT(*) AS n_events,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
FROM y
GROUP BY user_id, sess_id
"""


# ---------------------------------------------------------------------------
# nation_acct_stats — Min/Max/Sum/Count aggregate bundle
# ---------------------------------------------------------------------------


def nation_acct_stats(sf_dir: str) -> Dataset:
    from ray.data.aggregate import Count, Max, Min

    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])
    prepped = cust.map_batches(
        lambda t: pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "bal_cents": to_cents(t.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
    )
    agg = prepped.groupby("c_nationkey").aggregate(
        Min("bal_cents", alias_name="min_bal_cents"),
        Max("bal_cents", alias_name="max_bal_cents"),
        Sum("bal_cents", alias_name="sum_bal_cents"),
        Count(alias_name="n_customers"),
    )
    # Ray's groupby widens the int32 key to int64; restore the input type
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("c_nationkey"),
            "c_nationkey",
            t.column("c_nationkey").cast(pa.int32()),
        ),
        batch_format="pyarrow",
    )


NATION_ACCT_STATS_SQL = """
SELECT c_nationkey,
       CAST(MIN(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS min_bal_cents,
       CAST(MAX(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS max_bal_cents,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# high_value_events — union of two filtered streams (Dataset.union)
# ---------------------------------------------------------------------------


def high_value_events(sf_dir: str) -> Dataset:
    base = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def branch(kind: str) -> Dataset:
        return base.map_batches(
            lambda t, k=kind: t.filter(
                pc.and_(
                    pc.equal(t.column("event_type"), k),
                    pc.greater_equal(t.column("value"), pa.scalar(300.0)),
                )
            ).select(["event_id"]),
            batch_format="pyarrow",
        )

    return branch("click").union(branch("purchase"))


HIGH_VALUE_EVENTS_SQL = """
SELECT event_id FROM events
WHERE event_type IN ('click', 'purchase') AND value >= 300.0
"""


# ---------------------------------------------------------------------------
# events_sliding — sliding window (W=1h, slide=30min): each event lands in
# exactly W/S windows, emitted vectorized (flat fan-out, no shuffle until
# the tiny grouped partial-agg)
# ---------------------------------------------------------------------------

_SLIDE_US = 1_800_000_000  # 30 min
_WINDOW_SLOTS = 2  # W = slots * slide = 1 h


def events_sliding(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def fan(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        slot = pc.divide(us, pa.scalar(_SLIDE_US, pa.int64()))
        parts = []
        for off in range(_WINDOW_SLOTS):
            ws = pc.multiply(
                pc.subtract(slot, pa.scalar(off, pa.int64())),
                pa.scalar(_SLIDE_US, pa.int64()),
            )
            parts.append(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "window_start_us": ws,
                        "sum_value_cents": to_cents(t.column("value")),
                    }
                )
            )
        fanned = pa.concat_tables(parts)
        return _partial_groupby(
            fanned, ["user_id", "window_start_us"], ["sum_value_cents"], "n_events"
        )

    partial = ds.map_batches(fan, batch_format="pyarrow")
    return partial.groupby(["user_id", "window_start_us"]).aggregate(
        Sum("sum_value_cents", alias_name="sum_value_cents"),
        Sum("n_events", alias_name="n_events"),
    )


EVENTS_SLIDING_SQL = """
WITH w AS (
  SELECT user_id, (epoch_us(ts) // 1800000000) * 1800000000 AS ws, value FROM events
  UNION ALL
  SELECT user_id, ((epoch_us(ts) // 1800000000) - 1) * 1800000000 AS ws, value FROM events
)
SELECT user_id, ws AS window_start_us,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_events
FROM w
GROUP BY user_id, ws
"""


# ---------------------------------------------------------------------------
# distinct_users — exact distinct count (SQL-gated) + mergeable HLL sketch
# (rows-only; the scale path for count-distinct over 10^12 rows)
# ---------------------------------------------------------------------------


def distinct_users(sf_dir: str) -> pa.Table:
    """Exact distinct count WITHOUT a driver-side value set: per-batch
    distinct combiner -> groupby (shuffles only already-unique ids) ->
    distributed row count. Only the final integer reaches the driver."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    per_batch = ds.map_batches(
        # COUNT(DISTINCT) excludes NULL
        lambda t: pa.table({"user_id": pc.drop_null(pc.unique(t.column("user_id")))}),
        batch_format="pyarrow",
    )
    n = per_batch.groupby("user_id").aggregate(Count(alias_name="_c")).count()
    return pa.table({"n_users": pa.array([n], pa.int64())})


DISTINCT_USERS_SQL = "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events"

_HLL_P = 12  # 4096 registers


def _hll_registers(ids) -> "np.ndarray":
    """Fully vectorized register fill (VERDICT r2 #6 — the sketch exists
    for the huge-cardinality regime, so no per-row Python): splitmix64
    finalizer as the 64-bit mixer, ``np.frexp`` exponent as bit_length
    (exact — the low 52 = 64-p bits fit float64's 2^53 integer range),
    ``np.maximum.at`` as the scatter-max into the registers."""
    import numpy as np

    v = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    regs = np.zeros(1 << _HLL_P, dtype=np.int64)
    if v.size == 0:
        return regs
    h = v + np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h & np.uint64((1 << (64 - _HLL_P)) - 1)).astype(np.int64)
    bit_length = np.frexp(rest.astype(np.float64))[1]  # 0 for rest == 0
    rho = (64 - _HLL_P) - bit_length + 1
    np.maximum.at(regs, idx, rho)
    return regs


def distinct_users_hll(sf_dir: str) -> pa.Table:
    """Approximate distinct count via a mergeable HLL sketch: one 4096-
    register sketch per batch (map side), max-merged in a tiny final step —
    the shuffle carries sketches, never rows."""
    import numpy as np

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        # COUNT(DISTINCT) ignores NULL — so does the sketch
        ids = (
            t.filter(pc.is_valid(t.column("user_id")))
            .column("user_id")
            .to_numpy(zero_copy_only=False)
        )
        regs = _hll_registers(ids)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.int64()))})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << _HLL_P, dtype=np.int64)
    for r in parts:
        merged = np.maximum(merged, np.asarray(r["regs"], dtype=np.int64))
    m = float(1 << _HLL_P)
    est = 0.7213 / (1 + 1.079 / m) * m * m / np.sum(np.exp2(-merged.astype(np.float64)))
    zeros = int((merged == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range correction
        est = m * np.log(m / zeros)
    return pa.table({"n_users_approx": pa.array([int(round(est))], pa.int64())})


# ---------------------------------------------------------------------------
# purchase_attribution — AS-OF join (custom operator, SURVEY §2 note):
# latest click at-or-before each purchase, per user. Partitioning
# assumption: both sides co-located by the join key via groupby(user_id);
# within the group a sorted pandas merge_asof does the time alignment.
# ---------------------------------------------------------------------------


def purchase_attribution(sf_dir: str) -> Dataset:
    import pandas as pd

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        # NULL user/ts rows can never satisfy the ASOF predicates
        # (u = u AND ts >= ts are both NULL) — drop before merge_asof,
        # which refuses null keys outright
        lambda t: t.filter(
            pc.and_(
                pc.is_in(t.column("event_type"), value_set=pa.array(["click", "purchase"])),
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
            )
        ),
        batch_format="pyarrow",
    )

    from ocr_ray.pipelines.conversation import grouped_scan

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # multi-user as-of in ONE vectorized merge_asof(by=user_id) per
        # partition (coarse-key grouped_scan) — no per-user Python calls
        purchases = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if purchases.empty or clicks.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "click_event_id": pd.Series([], dtype="int64")})
        right = clicks[["user_id", "event_id", "ts"]].rename(
            columns={"event_id": "click_event_id"}
        )
        # a matched click whose event_id is NULL is still a match — use the
        # (never-null) click ts as the match marker, not the projected id
        right["click_ts"] = right["ts"]
        m = pd.merge_asof(
            purchases[["user_id", "event_id", "ts"]],
            right,
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["click_ts"])
        def _ids(col):
            # plain int64 when possible (the driver's dtype check is strict);
            # nullable Int64 only when a projected id is genuinely NULL —
            # the join key is (user_id, ts), not the id
            return col.astype("int64") if col.notna().all() else col.astype("Int64")

        return pd.DataFrame(
            {
                "event_id": _ids(m["event_id"]),
                "click_event_id": _ids(m["click_event_id"]),
            }
        )

    return grouped_scan(events, "user_id", asof)


# the explicit NOT NULL guards pin the contract to valid observations:
# DuckDB's ASOF JOIN binary-search matches a NULL-ts probe row to the
# last click (NULLS-LAST sort artifact), which no ordering semantics
# justify — both engines exclude unordered rows instead
PURCHASE_ATTRIBUTION_SQL = """
SELECT p.event_id, c.event_id AS click_event_id
FROM (SELECT * FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL) p
ASOF JOIN (SELECT * FROM events
           WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def purchase_next_click(sf_dir: str) -> Dataset:
    """FORWARD as-of: for each purchase, the wait (µs) until the user's
    NEXT click at-or-after it — the other direction of the as-of matrix
    (``purchase_attribution`` is backward). Emitting the exact integer gap
    instead of a click id makes tie semantics trivial (several clicks at
    the same minimal future ts share one gap).

    Same plan shape: coarse-key grouped scan by user, ONE vectorized
    ``merge_asof(direction='forward')`` per partition. Purchases with no
    future click drop (inner semantics, mirrored); NULL user/ts/event_id
    rows are excluded in both engines (a NULL can satisfy neither the
    equi- nor the range predicate, and SQL's GROUP BY event_id would fuse
    multiple NULL-id purchases into one row)."""
    import pandas as pd

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.is_in(
                        t.column("event_type"), value_set=pa.array(["click", "purchase"])
                    ),
                    pc.is_valid(t.column("event_id")),
                ),
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
            )
        ),
        batch_format="pyarrow",
    )

    from ocr_ray.pipelines.conversation import grouped_scan

    def asof_fwd(g: pd.DataFrame) -> pd.DataFrame:
        purchases = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "wait_us": pd.Series([], dtype="int64"),
            }
        )
        if purchases.empty or clicks.empty:
            return empty
        right = clicks[["user_id", "ts"]].copy()
        right["click_ts"] = right["ts"]
        m = pd.merge_asof(
            purchases[["user_id", "event_id", "ts"]],
            right,
            on="ts",
            by="user_id",
            direction="forward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["click_ts"])
        if m.empty:
            return empty
        # resolution-proof µs math (pandas may carry ns OR µs ticks)
        import numpy as np

        wait = m["click_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) - m[
            "ts"
        ].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"), "wait_us": wait}
        )

    return grouped_scan(events, "user_id", asof_fwd)


PURCHASE_NEXT_CLICK_SQL = """
SELECT p.event_id,
       CAST(MIN(epoch_us(c.ts) - epoch_us(p.ts)) AS BIGINT) AS wait_us
FROM (SELECT * FROM events WHERE event_type = 'purchase'
      AND ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL) p
JOIN (SELECT * FROM events WHERE event_type = 'click'
      AND ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL) c
  ON p.user_id = c.user_id AND c.ts >= p.ts
GROUP BY p.event_id
"""

# ---------------------------------------------------------------------------
# events_sample — deterministic-seed sampling (rows-only: sampling is
# implementation-defined, so no SQL oracle; determinism tested in pytest)
# ---------------------------------------------------------------------------


def events_sample(sf_dir: str) -> Dataset:
    """Seeded ~10% Bernoulli sample, deterministic PER ROW: keep iff the
    first 4 hex chars of md5('s42:' || event_id) < '199a' (6554/65536 =
    10.0006%). r5 replaced ``random_sample(0.1, seed=42)``: Ray's seeded
    sampler draws per BLOCK, so the selected row set depends on block
    boundaries/partitioning — unreproducible across engines, reruns, and
    cluster sizes, which is exactly what a 10^12-row sampling step cannot
    afford. The keyed-hash rule is the scale-correct sampler (same family
    as ``events_hash_sample``, with the seed folded into the key) and is
    mirrored exactly in SQL."""
    import hashlib

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pa.array(
            [
                i is not None
                and int.from_bytes(
                    hashlib.md5(f"s42:{i}".encode("ascii")).digest()[:2], "big"
                )
                < 0x199A
                for i in t.column("event_id").to_pylist()
            ],
            pa.bool_(),
        )
        return t.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


EVENTS_SAMPLE_SQL = """
SELECT event_id, user_id FROM events
WHERE substr(md5('s42:' || CAST(event_id AS VARCHAR)), 1, 4) < '199a'
"""


def events_hash_sample(sf_dir: str) -> Dataset:
    """Deterministic ~10.2% hash sample: md5(event_id) first byte < 0x1a.

    The sampling pattern for a 10^12-row table: no seed coordination across
    workers, reproducible across engines and reruns (lowercase-hex prefix
    comparison is identical in DuckDB), and composable — the same predicate
    on any engine selects the same rows."""
    import hashlib

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pa.array(
            [
                hashlib.md5(str(i).encode("ascii")).digest()[0] < 0x1A
                for i in t.column("event_id").to_pylist()
            ],
            pa.bool_(),
        )
        return t.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


EVENTS_HASH_SAMPLE_SQL = """
SELECT event_id, user_id FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
"""


# ---------------------------------------------------------------------------
# purchase_followups — range join (SURVEY §2.4 family): for each purchase,
# aggregate the same user's events in the following hour
# ---------------------------------------------------------------------------


def purchase_followups(sf_dir: str) -> Dataset:
    """Range join expressed as two as-of probes over co-located, sorted
    partitions — the scale plan for interval joins: no all-to-all pairwise
    expansion, one coarse-key shuffle, vectorized merge_asof inside each
    partition.

    For purchase p: n_follow / follow_value_cents over events e of the same
    user with p.ts < e.ts <= p.ts + 1h. Within a partition every row gets a
    per-user running (count, value-cents cumsum); the range aggregate is the
    difference of the as-of lookups at ts = p.ts and ts = p.ts + 1h. Bounds
    land on the LAST row of a timestamp tie cluster in both probes, so
    equal-ts events are excluded exactly like SQL's ``e.ts > p.ts``."""
    import pandas as pd

    ds = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        # NULL user/ts rows can satisfy neither side of the range predicate
        # (equality and ts comparison are both NULL) — drop before the scan;
        # merge_asof also refuses null keys
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
                # NULL value follows with 0 (SQL SUM(COALESCE(cents, 0)));
                # NaN would poison the running cumsum
                "value_cents": pc.coalesce(
                    to_cents(t.column("value")), pa.scalar(0, pa.int64())
                ),
            }
        )

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        df["ucnt"] = df.groupby("user_id").cumcount() + 1
        df["ucum"] = df.groupby("user_id")["value_cents"].cumsum()
        right = df[["user_id", "ts", "ucnt", "ucum"]].sort_values("ts", kind="mergesort")
        # NULL-id purchases would collapse into one SQL GROUP BY row; the
        # contract keys the output on a real event_id
        pur = df.loc[
            (df["event_type"] == "purchase") & df["event_id"].notna(),
            ["event_id", "user_id", "ts"],
        ].copy()
        if pur.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n_follow": pd.Series([], dtype="int64"),
                    "follow_value_cents": pd.Series([], dtype="int64"),
                }
            )
        # keep the source ts resolution — `+ Timedelta` silently upcasts to
        # ns, and merge_asof requires exactly-matching key dtypes
        pur["hi_ts"] = (pur["ts"] + pd.Timedelta(hours=1)).astype(pur["ts"].dtype)
        lo = pd.merge_asof(
            pur.sort_values("ts", kind="mergesort"), right, on="ts", by="user_id"
        ).set_index("event_id")
        hi = pd.merge_asof(
            pur.sort_values("hi_ts", kind="mergesort"),
            right.rename(columns={"ts": "hi_ts"}),
            on="hi_ts",
            by="user_id",
        ).set_index("event_id")
        out = pd.DataFrame(
            {
                "event_id": lo.index.to_numpy(),
                "user_id": lo["user_id"].to_numpy(),
                "n_follow": (hi["ucnt"].reindex(lo.index) - lo["ucnt"]).astype("int64").to_numpy(),
                "follow_value_cents": (hi["ucum"].reindex(lo.index) - lo["ucum"])
                .astype("int64")
                .to_numpy(),
            }
        )
        return out

    from ocr_ray.pipelines.conversation import grouped_scan

    pre = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_scan(pre, "user_id", lambda df: scan(df.drop(columns=["__part"])))
    return out


PURCHASE_FOLLOWUPS_SQL = """
SELECT p.event_id, p.user_id,
  CAST(COUNT(e.user_id) AS BIGINT) AS n_follow,
  CAST(COALESCE(SUM(COALESCE(CAST(ROUND(e.value * 100) AS BIGINT), 0)), 0) AS BIGINT) AS follow_value_cents
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
  AND p.event_id IS NOT NULL AND p.user_id IS NOT NULL AND p.ts IS NOT NULL
GROUP BY p.event_id, p.user_id
"""


# ---------------------------------------------------------------------------
# orders_rollup — GROUP BY ROLLUP(priority, status): one data shuffle to the
# leaf grain, super-aggregate levels derived from the tiny leaf table
# ---------------------------------------------------------------------------


def orders_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP without re-scanning: the only O(data) work is the leaf
    groupby (with per-batch combiner); the (priority, ALL) and (ALL, ALL)
    levels re-aggregate the |priorities| x |statuses| leaf table — bounded
    by key cardinality, not data size, at any scale."""
    ds = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_orderstatus": t.column("o_orderstatus"),
                "revenue_cents": to_cents(t.column("o_totalprice")),
            }
        )
        return _partial_groupby(
            out, ["o_orderpriority", "o_orderstatus"], ["revenue_cents"], "n_orders"
        )

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    leaf = null_safe_groupby_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"],
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )
    lt = pa.Table.from_pandas(leaf.to_pandas(), preserve_index=False)  # tiny: |prio| x |status|

    def _roll(t: pa.Table, keys: list[str]) -> pa.Table:
        # rolled-up dimensions become NULL, with GROUPING() flags set — the
        # SQL-standard way to keep rollup rows distinct from genuine NULL
        # key groups (coalesce-to-'ALL' would conflate them)
        tmp = t if keys else t.append_column("__g", pa.array([0] * t.num_rows, pa.int8()))
        g = tmp.group_by(keys or ["__g"]).aggregate(
            [("revenue_cents", "sum"), ("n_orders", "sum")]
        )
        n = g.num_rows
        cols = {}
        for k in ("o_orderpriority", "o_orderstatus"):
            cols[k] = g.column(k) if k in keys else pa.nulls(n, pa.string())
            cols["g_" + k[2:]] = pa.array([0 if k in keys else 1] * n, pa.int64())
        cols["revenue_cents"] = g.column("revenue_cents_sum")
        cols["n_orders"] = g.column("n_orders_sum")
        return pa.table(cols)

    lt = lt.select(["o_orderpriority", "o_orderstatus", "revenue_cents", "n_orders"])
    leaf_flags = lt.append_column(
        "g_orderpriority", pa.array([0] * lt.num_rows, pa.int64())
    ).append_column("g_orderstatus", pa.array([0] * lt.num_rows, pa.int64()))
    order = ["o_orderpriority", "o_orderstatus", "g_orderpriority", "g_orderstatus", "revenue_cents", "n_orders"]
    return pa.concat_tables(
        [leaf_flags.select(order), _roll(lt, ["o_orderpriority"]).select(order), _roll(lt, []).select(order)]
    )


ORDERS_ROLLUP_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_orderstatus,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def latest_event_per_user(sf_dir: str) -> Dataset:
    """Last-write-wins compaction keyed by user (the "upsert state table"
    every streaming-shaped pipeline needs: keep only each key's newest row,
    ties broken by event_id — deterministic because event_id is unique).

    Scale plan: per-BATCH vectorized argmax first (one sort + run-boundary
    mask per batch), so the shuffle moves at most distinct-users-per-batch
    rows, never the event log; the final per-key pick runs in a coarse-key
    ``grouped_scan`` (Python overhead per partition, not per key)."""
    import numpy as np

    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # nulls FIRST so keep-last never prefers a NULL ts over a real one
        # (and never discards the true latest row from the batch)
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
            null_placement="at_start",
        )
        t = t.take(idx)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        last = np.empty(len(u), dtype=bool)
        if len(u):
            last[:-1] = u[:-1] != u[1:]
            last[-1] = True
        return t.filter(pa.array(last))

    pre = events.map_batches(partial, batch_format="pyarrow")

    def pick(df):
        # na_position="first": SQL ORDER BY ts DESC is NULLS LAST, so the
        # winner is the max NON-NULL ts; keep-last on an ascending sort
        # must push NULLs to the front
        df = df.sort_values(
            ["user_id", "ts", "event_id"], na_position="first"
        ).drop_duplicates("user_id", keep="last")
        return df.drop(columns=["__part"])

    out = grouped_scan(pre, "user_id", pick)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "last_event_id": t.column("event_id"),
                "last_ts": t.column("ts"),
                "last_type": t.column("event_type"),
                "last_value_cents": to_cents(t.column("value")),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


LATEST_EVENT_PER_USER_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       ts AS last_ts,
       event_type AS last_type,
       CAST(ROUND(value * 100) AS BIGINT) AS last_value_cents
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


REGISTRY: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "q6_revenue_delta": (q6_revenue_delta, Q6_SQL),
    "orders_by_nation": (orders_by_nation, ORDERS_BY_NATION_SQL),
    "top_spenders": (top_spenders, TOP_SPENDERS_SQL),
    "filter_click_events": (filter_click_events, FILTER_CLICK_EVENTS_SQL),
    "distinct_segments": (distinct_segments, DISTINCT_SEGMENTS_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "doc_token_counts": (doc_token_counts, DOC_TOKEN_COUNTS_SQL),
    "parts_like": (parts_like, PARTS_LIKE_SQL),
    "users_no_purchase": (users_no_purchase, USERS_NO_PURCHASE_SQL),
    "top_orders_per_cust": (top_orders_per_cust, TOP_ORDERS_PER_CUST_SQL),
    "events_sessions": (events_sessions, EVENTS_SESSIONS_SQL),
    "nation_acct_stats": (nation_acct_stats, NATION_ACCT_STATS_SQL),
    "high_value_events": (high_value_events, HIGH_VALUE_EVENTS_SQL),
    "events_sample": (events_sample, EVENTS_SAMPLE_SQL),
    "events_hash_sample": (events_hash_sample, EVENTS_HASH_SAMPLE_SQL),
    "purchase_followups": (purchase_followups, PURCHASE_FOLLOWUPS_SQL),
    "orders_rollup": (orders_rollup, ORDERS_ROLLUP_SQL),
    "purchase_attribution": (purchase_attribution, PURCHASE_ATTRIBUTION_SQL),
    "events_sliding": (events_sliding, EVENTS_SLIDING_SQL),
    "distinct_users": (distinct_users, DISTINCT_USERS_SQL),
    "distinct_users_hll": (distinct_users_hll, None),
    "latest_event_per_user": (latest_event_per_user, LATEST_EVENT_PER_USER_SQL),
}


def event_props_stats(sf_dir: str) -> Dataset:
    """Per-event-type rollup of the ``props`` JSON payload field ``k`` —
    the reference's JSON-string IR parse (M5, page.tsx:179-227) as a
    data-plane op: parse with per-row fallback (malformed JSON -> null,
    rows never dropped), then partial pre-agg + tiny groupby."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.coerce import json_int_field

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        k = json_int_field(t.column("props"), "k")
        out = pa.table(
            {
                "event_type": t.column("event_type"),
                "n_with_k": pc.cast(pc.is_valid(k), pa.int64()),
                "sum_k": pc.coalesce(k, pa.scalar(0, pa.int64())),
                "max_k": pc.coalesce(k, pa.scalar(0, pa.int64())),
            }
        )
        g = out.group_by(["event_type"]).aggregate(
            [("n_with_k", "sum"), ("sum_k", "sum"), ("max_k", "max")]
        )
        return g.rename_columns(["event_type", "n_with_k", "sum_k", "max_k"])

    from ray.data.aggregate import Max

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    # NULL event_type is a real SQL group; the null-safe encoding carries it
    # through Ray's sort shuffle (which would otherwise TypeError)
    return null_safe_groupby_agg(
        events.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        Sum("n_with_k", alias_name="n_with_k"),
        Sum("sum_k", alias_name="sum_k"),
        Max("max_k", alias_name="max_k"),
    )


EVENT_PROPS_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(coalesce(SUM(k), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(MAX(k), 0) AS BIGINT) AS max_k
FROM (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""

REGISTRY["event_props_stats"] = (event_props_stats, EVENT_PROPS_STATS_SQL)
REGISTRY["purchase_next_click"] = (purchase_next_click, PURCHASE_NEXT_CLICK_SQL)


# ---------------------------------------------------------------------------
# range join — band each event's value against a small interval table
# ---------------------------------------------------------------------------

# Half-open [lo, hi) bands in cents (a fixed "rate card"). Small-side-by-
# construction: range joins against a bounded band/rate table are the common
# shape (pricing tiers, SLA buckets, time-zone tables).
VALUE_BANDS: list[tuple[str, int, int]] = [
    ("micro", 0, 1_000),
    ("small", 1_000, 2_500),
    ("mid", 2_500, 5_000),
    ("large", 5_000, 10_000),
    ("xl", 10_000, 1 << 62),
]


def events_value_banded(sf_dir: str) -> Dataset:
    """RANGE JOIN (lo <= v < hi) of events against the band table — a join
    family Ray Data lacks natively (SURVEY §2.4 custom-operator slot).

    Plan: broadcast range join. The band table is tiny, so its sorted lower
    edges ship inside the task closure and each batch does ONE vectorized
    ``np.searchsorted`` (binary search per row, no per-row Python); partial
    pre-agg collapses each batch to <=5 rows before the only shuffle (the
    5-row rollup). At 100 TB the event side streams; nothing wide moves.
    A big-big range join would instead bucket BOTH sides by interval grid —
    documented here as the scale-out path, not needed for a rate card."""
    import numpy as np
    from ray.data.aggregate import Sum

    names = np.array([b[0] for b in VALUE_BANDS])
    lows = np.array([b[1] for b in VALUE_BANDS], dtype=np.int64)

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        # range-join semantics: a row with no matching band (NULL value or
        # cents below the lowest lo) is DROPPED, exactly like the SQL
        # inner-join predicate
        cents = pc.drop_null(to_cents(t.column("value")).combine_chunks())
        v = cents.to_numpy()
        idx = np.searchsorted(lows, v, side="right") - 1
        keep = idx >= 0
        v, idx = v[keep], idx[keep]
        tb = pa.table(
            {
                "band": pa.array(names[idx]),
                "n": pa.array(np.ones(len(v), dtype=np.int64)),
                "cents": pa.array(v),
            }
        )
        g = tb.group_by(["band"]).aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["band", "n", "cents"])

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )


EVENTS_VALUE_BANDED_SQL = """
SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(e.cents) AS BIGINT) AS cents
FROM (SELECT CAST(ROUND(value*100) AS BIGINT) AS cents FROM events) e
JOIN (VALUES ('micro', 0, 1000), ('small', 1000, 2500), ('mid', 2500, 5000),
             ('large', 5000, 10000), ('xl', 10000, 4611686018427387904))
     AS b(band, lo, hi)
  ON e.cents >= b.lo AND e.cents < b.hi
GROUP BY b.band
"""

REGISTRY["events_value_banded"] = (events_value_banded, EVENTS_VALUE_BANDED_SQL)


# ---------------------------------------------------------------------------
# per-row rolling window — trailing 3-event spend per user
# ---------------------------------------------------------------------------


def user_rolling_spend(sf_dir: str) -> Dataset:
    """Per-ROW windowed aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT):
    each event's trailing 3-event spend within its user's (ts, event_id)
    order. Complements the bucketed windows (events_hourly / events_sliding)
    with the per-row frame family a feature-engineering pipeline needs.

    Plan: co-locate by user via ``grouped_scan`` (coarse-key partitions, so
    Python overhead is per-partition, not per-user), then one C-level pandas
    groupby-rolling over each multi-user frame. (ts, event_id) is a total
    order, so the result is deterministic under any partitioning."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "cents": to_cents(t.column("value")),
            }
        )

    def roll(df):
        # SQL window semantics on dirty input: NULL user_id is one
        # partition (dropna=False — pandas would otherwise drop the group
        # and crash on an all-null-key frame), NULL ts sorts last (both
        # engines' default), SUM skips NULL cents within the frame and is
        # NULL only for an all-NULL frame (nullable Int64 out)
        df = df.sort_values(["user_id", "ts", "event_id"])
        r = (
            df.groupby("user_id", sort=False, dropna=False)["cents"]
            .rolling(3, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
        )
        out = df[["event_id"]].copy()
        vals = r.round()
        # nullable dtype only when a frame was all-NULL (clean data keeps
        # plain int64 — pandas blocks surface their dtype to the caller)
        out["roll3_cents"] = vals.astype("Int64") if vals.isna().any() else vals.astype("int64")
        return out

    pre = events.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "user_id", roll)


USER_ROLLING_SPEND_SQL = """
SELECT event_id,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_cents
FROM events
"""

REGISTRY["user_rolling_spend"] = (user_rolling_spend, USER_ROLLING_SPEND_SQL)


# ---------------------------------------------------------------------------
# full outer join — per-user click vs purchase activity
# ---------------------------------------------------------------------------


def user_activity_full_outer(sf_dir: str) -> Dataset:
    """FULL OUTER join of two per-user aggregates (click counts x purchase
    cents) — completes the join matrix (inner/left/semi/anti/as-of/range/
    broadcast/hash are covered elsewhere). Both sides are partial
    pre-aggregated before the join, so the shuffle carries one row per
    (user, side), never events."""
    from ocr_ray.functions.joins import hash_join

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "n_clicks": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = out.group_by(["user_id"]).aggregate([("n_clicks", "sum")])
        return g.rename_columns(["user_id", "n_clicks"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "purchase_cents": to_cents(t.column("value")),
            }
        )
        g = out.group_by(["user_id"]).aggregate([("purchase_cents", "sum")])
        return g.rename_columns(["user_id", "purchase_cents"])

    from ocr_ray.ops.dedup import _coerce_schema

    i64 = pa.int64()
    c = _coerce_schema(
        events.map_batches(clicks, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_clicks", alias_name="n_clicks")),
        pa.schema([("user_id", i64), ("n_clicks", i64)]),
        parts=4,
    )
    p = _coerce_schema(
        events.map_batches(purchases, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("purchase_cents", alias_name="purchase_cents")),
        pa.schema([("user_id", i64), ("purchase_cents", i64)]),
        parts=4,
    )
    j = hash_join(c, p, on="user_id", how="full_outer")

    def fill(t: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_clicks": pc.coalesce(pc.cast(t.column("n_clicks"), pa.int64()), z),
                "purchase_cents": pc.coalesce(
                    pc.cast(t.column("purchase_cents"), pa.int64()), z
                ),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


USER_ACTIVITY_FULL_OUTER_SQL = """
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       CAST(COALESCE(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(p.purchase_cents, 0) AS BIGINT) AS purchase_cents
FROM (SELECT user_id, COUNT(*) AS n_clicks FROM events
      WHERE event_type = 'click' GROUP BY user_id) c
FULL OUTER JOIN
     (SELECT user_id, SUM(CAST(ROUND(value*100) AS BIGINT)) AS purchase_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
ON c.user_id = p.user_id
"""

REGISTRY["user_activity_full_outer"] = (user_activity_full_outer, USER_ACTIVITY_FULL_OUTER_SQL)


# ---------------------------------------------------------------------------
# rank window — ROW_NUMBER per customer by order value
# ---------------------------------------------------------------------------


def order_rank_in_cust(sf_dir: str) -> Dataset:
    """Per-group rank assignment (ROW_NUMBER over a deterministic total
    order): every order ranked within its customer by price desc, orderkey
    asc tiebreak — the rank/row_number window family (top_orders_per_cust
    covers top-k; this emits the full ranking). grouped_scan co-location +
    one vectorized boundary-arithmetic pass per partition."""
    import numpy as np

    from ocr_ray.pipelines.conversation import grouped_scan

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_cents": to_cents(t.column("o_totalprice")),
            }
        )

    def rank(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [
                ("o_custkey", "ascending"),
                ("total_cents", "descending"),
                ("o_orderkey", "ascending"),
            ]
        )
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        n = len(cust)
        # NULL custkey is ONE partition in SQL; a naive != sees NaN != NaN
        # and would give every null row its own rank-1 group
        import pandas as pd

        isn = pd.isna(cust)
        neq = (cust[1:] != cust[:-1]) & ~(isn[1:] & isn[:-1])
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        start_of = np.repeat(starts, np.diff(np.concatenate((starts, [n]))))
        rk = (np.arange(n) - start_of + 1).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "rank_in_cust": pa.array(rk),
            }
        )

    pre = orders.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "o_custkey", rank, batch_format="pyarrow")


ORDER_RANK_IN_CUST_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey
       ) AS BIGINT) AS rank_in_cust
FROM orders
"""

REGISTRY["order_rank_in_cust"] = (order_rank_in_cust, ORDER_RANK_IN_CUST_SQL)


# ---------------------------------------------------------------------------
# column profiling — per-column counts / nulls / distincts / min / max
# ---------------------------------------------------------------------------


def profile_events(sf_dir: str) -> pa.Table:
    """Exact column profile of the events table (row count, null count,
    exact distinct count, min/max per column) — the data-quality screening
    step a corpus pipeline runs before ingest.

    Plan: counts/min/max come from ONE wide partial row per batch (no
    shuffle — the driver folds O(batches) tiny rows); exact distincts use
    the no-driver-sets pattern (per-batch (col, val) dedup -> global
    groupby dedup -> per-col count). Values are normalized to int64
    (cents / epoch-us) before profiling so min/max stringification matches
    SQL CAST(BIGINT AS VARCHAR) exactly."""
    from ray.data.aggregate import Count, Sum

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type", "value", "ts"]
    )

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "event_type": t.column("event_type"),
                "value_cents": to_cents(t.column("value")),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    COLS = ["user_id", "event_type", "value_cents", "ts_us"]

    def stats_partial(t: pa.Table) -> pa.Table:
        t = norm(t)
        row: dict = {"n": pa.array([t.num_rows], pa.int64())}
        for c in COLS:
            col = t.column(c)
            row[f"nn_{c}"] = pa.array(
                [t.num_rows - int(pc.sum(pc.cast(pc.is_valid(col), pa.int64())).as_py() or 0)],
                pa.int64(),
            )
            mm = pc.min_max(col).as_py()
            as_s = (lambda v: None if v is None else str(v))
            row[f"min_{c}"] = pa.array([as_s(mm["min"])], pa.string())
            row[f"max_{c}"] = pa.array([as_s(mm["max"])], pa.string())
        return pa.table(row)

    parts = events.map_batches(stats_partial, batch_format="pyarrow").take_all()

    def distinct_partial(t: pa.Table) -> pa.Table:
        t = norm(t)
        frames = []
        for c in COLS:
            # COUNT(DISTINCT) excludes NULL — drop it from the value set
            vals = pc.drop_null(pc.cast(pc.unique(t.column(c).combine_chunks()), pa.string()))
            frames.append(
                pa.table({"col": pa.array([c] * len(vals), pa.string()), "val": vals})
            )
        return pa.concat_tables(frames)

    nd_rows = (
        events.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .aggregate(Count(alias_name="_c"))
        .groupby("col")
        .aggregate(Count(alias_name="n_distinct"))
        .take_all()
    )
    nd = {r["col"]: r["n_distinct"] for r in nd_rows}

    n_total = sum(r["n"] for r in parts)
    out = {"col": [], "n": [], "n_null": [], "n_distinct": [], "min_val": [], "max_val": []}
    for c in COLS:
        mins = [r[f"min_{c}"] for r in parts if r[f"min_{c}"] is not None]
        maxs = [r[f"max_{c}"] for r in parts if r[f"max_{c}"] is not None]
        num = c != "event_type"
        key = (lambda s: int(s)) if num else (lambda s: s)
        out["col"].append(c)
        out["n"].append(n_total)
        out["n_null"].append(sum(r[f"nn_{c}"] for r in parts))
        out["n_distinct"].append(int(nd.get(c, 0)))
        out["min_val"].append(min(mins, key=key) if mins else None)
        out["max_val"].append(max(maxs, key=key) if maxs else None)
    return pa.table(
        {
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_val": pa.array(out["min_val"], pa.string()),
            "max_val": pa.array(out["max_val"], pa.string()),
        }
    )


PROFILE_EVENTS_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS value_cents,
         epoch_us(ts) AS ts_us
  FROM events
)
SELECT 'user_id' AS col, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
       CAST(MIN(user_id) AS VARCHAR) AS min_val, CAST(MAX(user_id) AS VARCHAR) AS max_val
FROM e
UNION ALL
SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
       CAST(COUNT(DISTINCT event_type) AS BIGINT),
       MIN(event_type), MAX(event_type) FROM e
UNION ALL
SELECT 'value_cents', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(value_cents) AS BIGINT),
       CAST(COUNT(DISTINCT value_cents) AS BIGINT),
       CAST(MIN(value_cents) AS VARCHAR), CAST(MAX(value_cents) AS VARCHAR) FROM e
UNION ALL
SELECT 'ts_us', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(ts_us) AS BIGINT),
       CAST(COUNT(DISTINCT ts_us) AS BIGINT),
       CAST(MIN(ts_us) AS VARCHAR), CAST(MAX(ts_us) AS VARCHAR) FROM e
"""

REGISTRY["profile_events"] = (profile_events, PROFILE_EVENTS_SQL)


# ---------------------------------------------------------------------------
# q5 — local supplier volume (six-table join composition)
# ---------------------------------------------------------------------------


def q5_supplier_volume(sf_dir: str) -> Dataset:
    """TPC-H Q5: revenue per ASIA nation where the customer and the line's
    supplier share a nation — the canonical multi-way join composition
    (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier).

    Scale plan: region→nation resolve on the driver (25 rows). The two
    mid-size dimensions go through ``auto_join`` (broadcast under 64 MB,
    hash-shuffle join above — at 100 TB customer/supplier cross the
    threshold and the plan switches without code change). lineitem — the
    only true fact table — is pre-combined per batch to one row per
    (l_orderkey, s_nationkey) BEFORE its join, so the big join moves
    ~1 row per order-supplier-nation, never raw line items. The final
    equality c_nation = s_nation is a vectorized filter after the orderkey
    join; the groupby that follows carries ≤ nations rows per block."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.joins import auto_join

    nat = pq.read_table(_pq(sf_dir, "nation"))
    reg = pq.read_table(_pq(sf_dir, "region"))
    asia_keys = reg.filter(pc.equal(reg.column("r_name"), "ASIA")).column("r_regionkey")
    nat = nat.filter(pc.is_in(nat.column("n_regionkey"), value_set=asia_keys.combine_chunks()))
    # a NULL n_nationkey can never satisfy the equi-joins — drop driver-side
    nat = nat.filter(pc.is_valid(nat.column("n_nationkey")))
    nation_name = {
        k: v for k, v in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }
    nation_keys = pa.array(sorted(nation_name), pa.int32())

    lo = pa.array(["1995-01-01"]).cast(pa.timestamp("us"))[0].as_py()
    hi = pa.array(["1999-01-01"]).cast(pa.timestamp("us"))[0].as_py()

    # orders ⋈ customer (ASIA customers only) → (o_orderkey, c_nationkey)
    cust = rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"), value_set=nation_keys)),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
                pc.less(t.column("o_orderdate"), pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    orders = auto_join(orders, cust, on="o_custkey", right_on="c_custkey").select_columns(
        ["o_orderkey", "c_nationkey"]
    )

    # lineitem: per-batch combine to (l_orderkey, l_suppkey, revenue), then
    # resolve the supplier's nation and re-combine — the shuffle join input
    # is one row per (order, supplier nation)
    supp = rd.read_parquet(
        _pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"), value_set=nation_keys)),
        batch_format="pyarrow",
    )
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: _partial_groupby(
            t.append_column(
                "revenue_c4",
                discounted_c4(t.column("l_extendedprice"), t.column("l_discount")),
            ).select(["l_orderkey", "l_suppkey", "revenue_c4"]),
            ["l_orderkey", "l_suppkey"],
            ["revenue_c4"],
            None,
        ),
        batch_format="pyarrow",
    )
    line = auto_join(line, supp, on="l_suppkey", right_on="s_suppkey").map_batches(
        lambda t: _partial_groupby(
            t.select(["l_orderkey", "s_nationkey", "revenue_c4"]),
            ["l_orderkey", "s_nationkey"],
            ["revenue_c4"],
            None,
        ),
        batch_format="pyarrow",
    )

    joined = auto_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    def local_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_nationkey"), t.column("c_nationkey")))
        return _partial_groupby(
            t.select(["s_nationkey", "revenue_c4"]), ["s_nationkey"], ["revenue_c4"], None
        )

    per_nation = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
    )

    def name_it(t: pa.Table) -> pa.Table:
        names = pa.array(
            [nation_name[k] for k in t.column("s_nationkey").to_pylist()], pa.string()
        )
        return pa.table({"n_name": names, "revenue_c4": t.column("revenue_c4")})

    return per_nation.map_batches(name_it, batch_format="pyarrow").sort(
        ["revenue_c4", "n_name"], descending=[True, False]
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue_c4 DESC, n_name
"""

REGISTRY["q5_supplier_volume"] = (q5_supplier_volume, Q5_SQL)


# ---------------------------------------------------------------------------
# calendar rollup — month-grain date functions
# ---------------------------------------------------------------------------


def orders_monthly(sf_dir: str) -> Dataset:
    """Orders per calendar (year, month) with exact cents totals — the
    month-grain sibling of events_hourly, exercising calendar extraction
    (hour/day rollups are pure epoch arithmetic; months are not).

    pc.year/pc.month run vectorized per batch; partial pre-agg collapses
    each batch to <= distinct-months rows before the tiny groupby."""
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderdate")))
        t = pa.table(
            {
                "y": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "m": pc.cast(pc.month(t.column("o_orderdate")), pa.int64()),
                "cents": pc.coalesce(
                    to_cents(t.column("o_totalprice")), pa.scalar(0, pa.int64())
                ),
                "n": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = t.group_by(["y", "m"]).aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["y", "m", "n", "total_cents"])

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "m"])
        .aggregate(Sum("n", alias_name="n"), Sum("total_cents", alias_name="total_cents"))
    )


ORDERS_MONTHLY_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), 0)) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderdate IS NOT NULL
GROUP BY 1, 2
"""

REGISTRY["orders_monthly"] = (orders_monthly, ORDERS_MONTHLY_SQL)


# ---------------------------------------------------------------------------
# per-group distinct counts: exact (two-level dedup) + per-group HLL sketch
# ---------------------------------------------------------------------------


def distinct_users_per_type(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT user_id) per event_type — the grouped-distinct
    plan without driver sets: per-batch (type, user) dedup partials, one
    dedup groupby over distinct pairs, then per-batch counts + a tiny
    groupby(type). NULL users don't count (SQL); NULL type is a group
    (null-safe keys through both shuffles)."""
    from ocr_ray.functions.nullsafe import (
        decode_null_keys,
        encode_null_keys,
        grouping_keys,
    )
    from ray.data.aggregate import Count

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return encode_null_keys(g, ["event_type"])

    distinct_pairs = (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby(grouping_keys(["event_type"]) + ["user_id"])
        .aggregate(Count(alias_name="_c"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.append_column("n_users", pa.array([1] * t.num_rows, pa.int64()))
        g = t.group_by(grouping_keys(["event_type"])).aggregate([("n_users", "sum")])
        return g.rename_columns(grouping_keys(["event_type"]) + ["n_users"])

    out = (
        distinct_pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(grouping_keys(["event_type"]))
        .aggregate(Sum("n_users", alias_name="n_users"))
    )
    return out.map_batches(
        lambda t: decode_null_keys(t, ["event_type"]), batch_format="pyarrow"
    )


DISTINCT_USERS_PER_TYPE_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""

REGISTRY["distinct_users_per_type"] = (
    distinct_users_per_type,
    DISTINCT_USERS_PER_TYPE_SQL,
)


def distinct_users_per_type_hll(sf_dir: str) -> Dataset:
    """Approximate grouped distinct: one mergeable HLL sketch PER GROUP —
    the sketch as a distributive aggregate, not a global (the 10^12-row
    path where even the distinct (type, user) pair set is too hot to
    shuffle). Per batch: registers per type; merge = per-register max in a
    tiny map_groups over ~|types| rows. Accuracy pytest-bounded against
    the exact gated sibling."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        import pandas as pd

        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("event_type")))
        )
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pylist(),
                "user_id": t.column("user_id").to_pylist(),
            }
        )
        rows_t, rows_r = [], []
        for et, g in df.groupby("event_type"):
            rows_t.append(et)
            rows_r.append(_hll_registers(g["user_id"].tolist()).tolist())
        return pa.table(
            {
                "event_type": pa.array(rows_t, pa.string()),
                "regs": pa.array(rows_r, pa.list_(pa.int64())),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        import numpy as np

        regs = np.max(
            np.asarray(g.column("regs").to_pylist(), dtype=np.int64), axis=0
        )
        m = float(1 << _HLL_P)
        est = 0.7213 / (1 + 1.079 / m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        return pa.table(
            {
                "event_type": pa.array([g.column("event_type")[0].as_py()]),
                "n_users_approx": pa.array([int(round(est))], pa.int64()),
            }
        )

    return (
        events.map_batches(sketch, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


REGISTRY["distinct_users_per_type_hll"] = (distinct_users_per_type_hll, None)


def order_share_of_cust(sf_dir: str) -> Dataset:
    """Each order's share of its customer's lifetime spend, in basis points
    — the ratio-to-report window (``SUM() OVER (PARTITION BY)`` joined back
    to row granularity) the window matrix lacked.

    Plan: per-batch partial sums -> one tiny null-safe groupby(custkey) for
    the partition totals, then a hash join of orders against the totals on
    the ENCODED key pair (so a NULL custkey partition gets its total too,
    like the SQL window). Integer bp = cents * 10000 // total is exact and
    reduction-order independent; NULL cents rows keep a NULL share, an
    all-zero partition yields NULL (NULLIF-mirrored)."""
    from ocr_ray.functions.nullsafe import encode_null_keys, grouping_keys

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "cents": to_cents(t.column("o_totalprice")),
            }
        )
        return encode_null_keys(t, ["o_custkey"])

    enc = orders.map_batches(prep, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(grouping_keys(["o_custkey"])).aggregate([("cents", "sum")])
        return g.rename_columns(grouping_keys(["o_custkey"]) + ["total"])

    from ocr_ray.ops.dedup import _coerce_schema

    totals = _coerce_schema(
        enc.map_batches(partial, batch_format="pyarrow")
        .groupby(grouping_keys(["o_custkey"]))
        .aggregate(Sum("total", alias_name="total")),
        pa.schema(
            [
                ("__n_o_custkey", pa.int8()),
                ("o_custkey", pa.int64()),
                ("total", pa.int64()),
            ]
        ),
        parts=4,
    )
    keys = tuple(grouping_keys(["o_custkey"]))
    joined = enc.join(
        totals, join_type="inner", num_partitions=8, on=keys, right_on=keys
    )

    def share(t: pa.Table) -> pa.Table:
        import numpy as np

        cents = t.column("cents").to_numpy(zero_copy_only=False).astype(np.float64)
        total = t.column("total").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            bp = np.floor(cents * 10000.0 / total)
        valid = ~(np.isnan(bp) | np.isinf(bp))
        # exact integer recompute where defined (float only located NULLs)
        ci = t.column("cents").to_numpy(zero_copy_only=False)
        ti = t.column("total").to_numpy(zero_copy_only=False)
        out = np.zeros(len(cents), np.int64)
        if valid.any():
            # DuckDB's BIGINT // TRUNCATES toward zero (-7 // 2 = -3);
            # numpy floors — mirror trunc explicitly for negative inputs
            num = ci[valid].astype(np.int64) * 10000
            den = ti[valid].astype(np.int64)
            q = np.abs(num) // np.abs(den)
            out[valid] = np.where((num < 0) ^ (den < 0), -q, q)
        from ocr_ray.functions.nullsafe import decode_null_keys

        res = pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "__n_o_custkey": t.column("__n_o_custkey"),
                "cents": t.column("cents"),
                "share_bp": pa.array(
                    [int(v) if ok else None for v, ok in zip(out, valid)], pa.int64()
                ),
            }
        )
        return decode_null_keys(res, ["o_custkey"])

    return joined.map_batches(share, batch_format="pyarrow")


ORDER_SHARE_OF_CUST_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000
            // NULLIF(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      OVER (PARTITION BY o_custkey), 0) AS BIGINT) AS share_bp
FROM orders
"""

REGISTRY["order_share_of_cust"] = (order_share_of_cust, ORDER_SHARE_OF_CUST_SQL)


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING over a fact-side aggregate + two joins)
# ---------------------------------------------------------------------------


def q18_large_orders(sf_dir: str) -> Dataset:
    """TPC-H Q18: orders whose total line quantity exceeds a threshold,
    resolved to their customer — the HAVING-over-aggregate shape composed
    with joins.

    Scale plan: lineitem (the only fact table) is combined per batch to one
    row per l_orderkey BEFORE the shuffle groupby (lineitem is clustered by
    orderkey, so the shuffle moves ~1 row per order); the HAVING filter
    runs on the grouped output and shrinks it ~50×, and only the survivors
    join orders/customer (``auto_join`` broadcasts them while they fit,
    hash-shuffles beyond 64 MB). NULL quantities/orderkeys are excluded up
    front and mirrored in the oracle (a NULL-key group could never survive
    the inner join; a NULL quantity never contributes to SUM)."""
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda t: _partial_groupby(
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "sum_qty": pc.cast(t.column("l_quantity"), pa.int64()),
                }
            ).filter(
                pc.and_(
                    pc.is_valid(t.column("l_orderkey")),
                    pc.is_valid(t.column("l_quantity")),
                )
            ),
            ["l_orderkey"],
            ["sum_qty"],
            None,
        ),
        batch_format="pyarrow",
    )
    # the per-order sums are a high-cardinality census (~1 row per order
    # after the map-side combine): below the row gate the partials fold on
    # the driver (Ray's hash Aggregate costs ~170k rows/s on such keys);
    # above it, the distributed groupby is the 100 TB path
    import numpy as np

    from ocr_ray.ops.corpus import _sum_partials_gated

    local = _sum_partials_gated(
        line.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "n"]), batch_format="pyarrow"
        ),
        "l_orderkey",
    )
    if local is None:
        big = (
            line.groupby("l_orderkey")
            .aggregate(Sum("sum_qty", alias_name="sum_qty"))
            .map_batches(
                lambda t: t.filter(pc.greater(t.column("sum_qty"), pa.scalar(150))),
                batch_format="pyarrow",
            )
        )
    else:
        big = rd.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(
                        local.loc[local["n"] > 150, "l_orderkey"].to_numpy(np.int64)
                    ),
                    "sum_qty": pa.array(local.loc[local["n"] > 150, "n"].to_numpy(np.int64)),
                }
            )
        )
    from ocr_ray.functions.joins import auto_join

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "total_cents": to_cents(t.column("o_totalprice")),
            }
        ),
        batch_format="pyarrow",
    )
    joined = auto_join(
        orders,
        big,
        on="o_orderkey",
        right_on="l_orderkey",
        # the HAVING filter can legitimately kill every group; the schema
        # keeps the broadcast frame typed so the join degrades to empty
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("sum_qty", pa.int64())]),
    )
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    # the merge keeps the LEFT key column (o_custkey == c_custkey after the
    # inner join); project it under the oracle's output name
    return auto_join(joined, cust, on="o_custkey", right_on="c_custkey").map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "o_orderkey": t.column("o_orderkey"),
                "total_cents": t.column("total_cents"),
                "sum_qty": t.column("sum_qty"),
            }
        ),
        batch_format="pyarrow",
    )


Q18_SQL = """
SELECT o_custkey AS c_custkey, c_name, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents, sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

REGISTRY["q18_large_orders"] = (q18_large_orders, Q18_SQL)


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue per customer (fact pre-agg → join → re-agg)
# ---------------------------------------------------------------------------


def q10_returned_revenue(sf_dir: str) -> Dataset:
    """TPC-H Q10: revenue lost to returned items, per customer with their
    nation resolved — aggregate → join → re-aggregate → two dimension joins.

    Scale plan: the returnflag filter + per-batch (l_orderkey, revenue)
    combine run at the read, so the order join moves one row per returned
    order; revenue is re-combined per o_custkey before the customer join
    (the join input is ≤ |customers| rows per block); nation (25 rows) is a
    driver-side broadcast. The non-null price/discount contract is explicit
    in both engines so SUM's null-skip semantics cannot diverge."""
    from ocr_ray.functions.joins import auto_join, broadcast_join

    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: _partial_groupby(
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "revenue_c4": discounted_c4(
                        t.column("l_extendedprice"), t.column("l_discount")
                    ),
                }
            ).filter(
                pc.and_(
                    pc.and_(
                        pc.fill_null(
                            pc.equal(t.column("l_returnflag"), "R"), False
                        ),
                        pc.is_valid(t.column("l_orderkey")),
                    ),
                    pc.and_(
                        pc.is_valid(t.column("l_extendedprice")),
                        pc.is_valid(t.column("l_discount")),
                    ),
                )
            ),
            ["l_orderkey"],
            ["revenue_c4"],
            None,
        ),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    per_order = auto_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    per_cust = (
        per_order.map_batches(
            lambda t: _partial_groupby(
                t.select(["o_custkey", "revenue_c4"]).filter(
                    pc.is_valid(t.column("o_custkey"))
                ),
                ["o_custkey"],
                ["revenue_c4"],
                None,
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
    )

    cust = rd.read_parquet(
        _pq(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "acctbal_cents": to_cents(t.column("c_acctbal")),
                "c_nationkey": t.column("c_nationkey"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = auto_join(per_cust, cust, on="o_custkey", right_on="c_custkey")

    import pyarrow.parquet as pq

    nat = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    return broadcast_join(
        joined, nat, left_on="c_nationkey", right_on="n_nationkey"
    ).map_batches(
        # the customer join kept the LEFT key (o_custkey == c_custkey)
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "n_name": t.column("n_name"),
                "acctbal_cents": t.column("acctbal_cents"),
                "revenue_c4": t.column("revenue_c4"),
            }
        ),
        batch_format="pyarrow",
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents,
       rev.revenue_c4
FROM (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
        AND o_custkey IS NOT NULL
      GROUP BY o_custkey) rev
JOIN customer ON rev.o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""

REGISTRY["q10_returned_revenue"] = (q10_returned_revenue, Q10_SQL)


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (CASE aggregation to a single global ratio)
# ---------------------------------------------------------------------------


def q14_promo_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14: share of revenue from PROMO parts, in basis points — the
    conditional (CASE) aggregation collapsing to one row.

    Scale plan: part's (key → is-promo) map is broadcast once and applied
    per batch; each batch folds to two int64 partial sums + a row count, so
    the driver fold is O(#blocks). The ratio is exact integer math with
    DuckDB's truncate-toward-zero ``//`` mirrored; an empty filtered input
    yields the SQL aggregate's single all-NULL row."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.joins import broadcast_join

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_type"])
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.is_valid(t.column("l_extendedprice")),
                pc.is_valid(t.column("l_discount")),
            )
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_join(line, part, left_on="l_partkey", right_on="p_partkey")

    def partial(t: pa.Table) -> pa.Table:
        rev = discounted_c4(t.column("l_extendedprice"), t.column("l_discount"))
        promo = pc.fill_null(pc.equal(t.column("p_type"), "PROMO"), False)
        promo_rev = pc.if_else(promo, rev, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "promo_c4": pa.array([pc.sum(promo_rev).as_py() or 0], pa.int64()),
                "total_c4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        # SQL aggregates over zero rows: one row, NULL sums
        return pa.table(
            {
                "promo_c4": pa.array([None], pa.int64()),
                "total_c4": pa.array([None], pa.int64()),
                "promo_bp": pa.array([None], pa.int64()),
            }
        )
    promo = sum(r["promo_c4"] for r in parts)
    total = sum(r["total_c4"] for r in parts)
    if total == 0:
        bp = None
    else:
        # DuckDB BIGINT // truncates toward zero; Python // floors — mirror
        q = abs(promo * 10000) // abs(total)
        bp = -q if (promo < 0) != (total < 0) else q
    return pa.table(
        {
            "promo_c4": pa.array([promo], pa.int64()),
            "total_c4": pa.array([total], pa.int64()),
            "promo_bp": pa.array([bp], pa.int64()),
        }
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_c4,
       CAST(SUM(rev) AS BIGINT) AS total_c4,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 10000
            // NULLIF(SUM(rev), 0) AS BIGINT) AS promo_bp
FROM (SELECT p_type,
             CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL)
"""

REGISTRY["q14_promo_share"] = (q14_promo_share, Q14_SQL)


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-attribute predicate (three-valued OR of brackets)
# ---------------------------------------------------------------------------


def q19_bracket_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19: revenue under an OR of three (brand, size, quantity)
    brackets — the disjunctive-predicate shape where three-valued logic
    actually bites (a NULL in any leg must poison only its conjunct, and a
    WHERE-NULL row drops).

    Scale plan: part attributes broadcast once (dimension side), the
    disjunction evaluated vectorized per batch with Kleene kernels (exact
    SQL semantics), each batch folding to two scalars — no shuffle at all."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.joins import broadcast_join

    part = pq.read_table(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    )
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(line, part, left_on="l_partkey", right_on="p_partkey")

    _BRACKETS = (
        ("Brand#12", 15, 1.0, 15.0),
        ("Brand#23", 20, 10.0, 25.0),
        ("Brand#3", 25, 20.0, 35.0),
    )

    def partial(t: pa.Table) -> pa.Table:
        brand, size, qty = t.column("p_brand"), t.column("p_size"), t.column("l_quantity")
        keep = None
        for b, smax, qlo, qhi in _BRACKETS:
            leg = pc.and_kleene(
                pc.and_kleene(
                    pc.equal(brand, b),
                    pc.and_kleene(
                        pc.greater_equal(size, pa.scalar(1)),
                        pc.less_equal(size, pa.scalar(smax)),
                    ),
                ),
                pc.and_kleene(
                    pc.greater_equal(qty, pa.scalar(qlo)),
                    pc.less_equal(qty, pa.scalar(qhi)),
                ),
            )
            keep = leg if keep is None else pc.or_kleene(keep, leg)
        t = t.filter(keep)  # NULL predicate rows drop, like SQL WHERE
        rev = discounted_c4(t.column("l_extendedprice"), t.column("l_discount"))
        s = pc.sum(rev)
        return pa.table(
            {
                "revenue_c4": pa.array([s.as_py()], pa.int64()),
                "n_valid": pa.array([len(rev) - rev.null_count], pa.int64()),
                "n_lines": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    n_valid = sum(r["n_valid"] for r in parts)
    rev = sum(r["revenue_c4"] or 0 for r in parts) if n_valid else None
    return pa.table(
        {
            "revenue_c4": pa.array([rev], pa.int64()),
            "n_lines": pa.array([sum(r["n_lines"] for r in parts)], pa.int64()),
        }
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 35)
"""

REGISTRY["q19_bracket_revenue"] = (q19_bracket_revenue, Q19_SQL)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (LEFT JOIN + count-of-counts)
# ---------------------------------------------------------------------------


def q13_order_distribution(sf_dir: str) -> Dataset:
    """TPC-H Q13: how many customers placed 0, 1, 2, ... orders — the
    LEFT-JOIN-then-histogram shape (a count whose zero bucket only exists
    because of the outer join).

    Scale plan: orders reduce to a per-custkey census with a per-batch
    combiner (shuffle carries one (custkey, n) row per customer); the
    left join against customer keys is keys-only traffic either way
    (``auto_join`` broadcasts the census while it fits, hash-shuffles at
    scale); the final count-of-counts is a tiny second census (c_count
    cardinality is O(max orders per customer)). Nothing wider than two
    int64 columns ever moves.

    NULL semantics (mirrored in the oracle): NULL c_custkey rows would all
    collapse into ONE SQL group — a statement about grouping, not about
    customers — so both sides exclude them; NULL o_custkey never matches a
    key; COUNT(o_orderkey) skips NULL orderkeys, so those rows are dropped
    before the census."""
    from ocr_ray.functions.joins import auto_join

    def _order_census(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(pc.is_valid(t.column("o_custkey")), pc.is_valid(t.column("o_orderkey")))
        )
        ones = pa.table(
            {
                "o_custkey": keep.column("o_custkey"),
                "n_orders": pa.array([1] * keep.num_rows, pa.int64()),
            }
        )
        return _partial_groupby(ones, ["o_custkey"], ["n_orders"], None)

    counts = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"]
    ).map_batches(_order_census, batch_format="pyarrow")
    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("c_custkey"))), batch_format="pyarrow"
    )
    per_cust = auto_join(
        cust,
        counts.groupby("o_custkey").aggregate(Sum("n_orders", alias_name="n_orders")),
        on="c_custkey",
        right_on="o_custkey",
        how="left",
        right_schema=pa.schema([("o_custkey", pa.int64()), ("n_orders", pa.int64())]),
    )
    hist = per_cust.map_batches(
        lambda t: _partial_groupby(
            pa.table(
                {
                    "c_count": pc.fill_null(
                        pc.cast(t.column("n_orders"), pa.int64()), pa.scalar(0, pa.int64())
                    ),
                    "custdist": pa.array([1] * t.num_rows, pa.int64()),
                }
            ),
            ["c_count"],
            ["custdist"],
            None,
        ),
        batch_format="pyarrow",
    )
    return hist.groupby("c_count").aggregate(Sum("custdist", alias_name="custdist"))


Q13_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE c_custkey IS NOT NULL
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

REGISTRY["q13_order_distribution"] = (q13_order_distribution, Q13_SQL)


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated per-part AVG subquery)
# ---------------------------------------------------------------------------


def q17_small_qty_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20%
    of the average quantity for their part — the correlated-aggregate-
    subquery pattern (the inner query re-reads the same fact table).

    Exactness: ``qty < 0.2 * avg`` is evaluated as the integer cross-
    multiplication ``5 * qty * cnt < sum_qty`` (avg = sum/cnt), so both
    engines compare exact int64s — no float division anywhere. Overflow
    bound: 5·qty·cnt ≤ 5·50·(lines per part) — safe until a single part
    has ~10^16 lines.

    Scale plan: the per-part (sum, cnt) census is map-side combined (one
    row per partkey through the shuffle); the filtered part list (one
    brand) and the census both join lineitem via ``auto_join`` (broadcast
    at test scale, hash-shuffle at 100 TB — the census is keys+two-int64s
    either way). The final reduce is a single global (sum, count) fold of
    per-batch partials. NULL partkeys/quantities drop before the census
    (they can never satisfy the inner join / the comparison), mirrored in
    the oracle's WHERE."""
    from ocr_ray.functions.joins import auto_join

    def _qty_census(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(pc.is_valid(t.column("l_partkey")), pc.is_valid(t.column("l_quantity")))
        )
        proj = pa.table(
            {
                "l_partkey": keep.column("l_partkey"),
                "sum_qty": pc.cast(keep.column("l_quantity"), pa.int64()),
                "cnt_qty": pa.array([1] * keep.num_rows, pa.int64()),
            }
        )
        return _partial_groupby(proj, ["l_partkey"], ["sum_qty", "cnt_qty"], None)

    census = (
        rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])
        .map_batches(_qty_census, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("cnt_qty", alias_name="cnt_qty"))
    )
    brand_parts = rd.read_parquet(
        _pq(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t.filter(
                    pc.and_(
                        pc.equal(t.column("p_brand"), "Brand#4"),
                        pc.is_valid(t.column("p_partkey")),
                    )
                ).column("p_partkey")
            }
        ),
        batch_format="pyarrow",
    )
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(t.column("l_partkey")), pc.is_valid(t.column("l_quantity"))
                ),
                pc.is_valid(t.column("l_extendedprice")),
            )
        ),
        batch_format="pyarrow",
    )
    joined = auto_join(
        line,
        brand_parts,
        on="l_partkey",
        right_on="p_partkey",
        right_schema=pa.schema([("p_partkey", pa.int64())]),
    )
    joined = auto_join(
        joined,
        census,
        on="l_partkey",
        right_schema=pa.schema(
            [("l_partkey", pa.int64()), ("sum_qty", pa.int64()), ("cnt_qty", pa.int64())]
        ),
    )

    def _reduce(t: pa.Table) -> pa.Table:
        qty = pc.cast(t.column("l_quantity"), pa.int64())
        lhs = pc.multiply(pc.multiply(pa.scalar(5, pa.int64()), qty), t.column("cnt_qty"))
        keep = t.filter(pc.less(lhs, t.column("sum_qty")))
        cents = to_cents(keep.column("l_extendedprice"))
        s = pc.sum(cents)
        return pa.table(
            {
                "sum_cents": pa.array([s.as_py()], pa.int64()),
                "n_lines": pa.array([keep.num_rows], pa.int64()),
            }
        )

    parts = joined.map_batches(_reduce, batch_format="pyarrow").take_all()
    n = sum(r["n_lines"] for r in parts)
    s = sum(r["sum_cents"] or 0 for r in parts) if n else None
    return pa.table(
        {
            "sum_cents": pa.array([s], pa.int64()),
            "n_lines": pa.array([n], pa.int64()),
        }
    )


Q17_SQL = """
WITH census AS (
    SELECT l_partkey,
           SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
           COUNT(*) AS cnt_qty
    FROM lineitem
    WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
    GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN census USING (l_partkey)
WHERE p_brand = 'Brand#4'
  AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  AND 5 * CAST(l_quantity AS BIGINT) * cnt_qty < sum_qty
"""

REGISTRY["q17_small_qty_revenue"] = (q17_small_qty_revenue, Q17_SQL)


# ---------------------------------------------------------------------------
# Q22 shape — rich inactive customers (global scalar subquery + anti-join)
# ---------------------------------------------------------------------------


def q22_rich_inactive(sf_dir: str) -> Dataset:
    """TPC-H Q22 shape: customers with above-average (positive) balance who
    never placed an URGENT order, rolled up by market segment — composes a
    GLOBAL scalar aggregate subquery (broadcast one (sum, count) pair), a
    NOT IN anti-join, and a final small-key rollup. (The classic Q22 keys
    the anti-join on "no orders at all"; this corpus gives every customer
    ~10 orders, so the urgent-priority variant keeps the result non-empty
    while exercising the identical plan.)

    Exactness: ``bal > AVG(bal WHERE bal > 0)`` is the integer cross-
    multiplication ``bal_cents * n_pos > sum_pos_cents`` — the (n, Σ)
    pair is folded exactly on the driver from per-batch int64 partials
    (two numbers, not data) and compared per row in int64. Overflow: the
    per-row product bal_cents·n_pos needs |bal_cents|·n_pos < 2^63 — at
    10^6-cent balances that allows ~9·10^12 customers.

    NULL semantics (mirrored): NULL acctbal fails both predicates; NULL
    c_custkey rows drop (NULL is never NOT IN anything); NULL o_custkey
    subquery keys are excluded in BOTH engines (a NULL in a NOT IN
    subquery would empty the result — the oracle filters them, so the
    plan does too); NULL mktsegment is a regular group (nullsafe keys)."""
    from ray.data.aggregate import Sum as _Sum

    from ocr_ray.functions.joins import anti_join_filter
    from ocr_ray.functions.nullsafe import decode_null_keys, encode_null_keys

    cust_cols = ["c_custkey", "c_acctbal", "c_mktsegment"]

    def _pos_partial(t: pa.Table) -> pa.Table:
        cents = to_cents(t.column("c_acctbal"))
        pos = pc.and_(pc.is_valid(cents), pc.greater(cents, pa.scalar(0, pa.int64())))
        kept = cents.filter(pos)
        s = pc.sum(kept)
        return pa.table(
            {
                "s": pa.array([s.as_py() or 0], pa.int64()),
                "n": pa.array([len(kept)], pa.int64()),
            }
        )

    cust = rd.read_parquet(_pq(sf_dir, "customer"), columns=cust_cols)
    stats = cust.map_batches(_pos_partial, batch_format="pyarrow").take_all()
    n_pos = sum(r["n"] for r in stats)
    sum_pos = sum(r["s"] for r in stats)

    out_schema = pa.schema(
        [("c_mktsegment", pa.string()), ("n_custs", pa.int64()), ("bal_cents", pa.int64())]
    )
    if n_pos == 0:
        # AVG over zero rows is NULL -> the comparison is never true
        return rd.from_arrow(out_schema.empty_table())

    buyers = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.unique(
                        t.filter(
                            pc.and_(
                                pc.is_valid(t.column("o_custkey")),
                                pc.equal(t.column("o_orderpriority"), "1-URGENT"),
                            )
                        ).column("o_custkey")
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )

    def _gate(t: pa.Table) -> pa.Table:
        cents = to_cents(t.column("c_acctbal"))
        rich = pc.greater(
            pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_pos, pa.int64()),
        )
        keep = pc.and_(
            pc.and_(pc.fill_null(rich, False), pc.is_valid(t.column("c_custkey"))),
            pc.is_valid(cents),
        )
        kept = t.filter(keep)
        proj = pa.table(
            {
                "c_custkey": kept.column("c_custkey"),
                "c_mktsegment": kept.column("c_mktsegment"),
                "n_custs": pa.array([1] * kept.num_rows, pa.int64()),
                "bal_cents": to_cents(kept.column("c_acctbal")),
            }
        )
        return proj

    rich = cust.map_batches(_gate, batch_format="pyarrow")
    inactive = anti_join_filter(rich, "c_custkey", buyers or [])
    partials = inactive.map_batches(
        lambda t: encode_null_keys(
            _partial_groupby(
                t.drop_columns(["c_custkey"]), ["c_mktsegment"], ["n_custs", "bal_cents"], None
            ),
            ["c_mktsegment"],
        )
        if t.num_rows
        else encode_null_keys(
            pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_custs": pa.array([], pa.int64()),
                    "bal_cents": pa.array([], pa.int64()),
                }
            ),
            ["c_mktsegment"],
        ),
        batch_format="pyarrow",
    )
    grouped = partials.groupby(["c_mktsegment", "__n_c_mktsegment"]).aggregate(
        _Sum("n_custs", alias_name="n_custs"), _Sum("bal_cents", alias_name="bal_cents")
    )
    out = grouped.map_batches(
        lambda t: decode_null_keys(t, ["c_mktsegment"]), batch_format="pyarrow"
    )
    # every rich customer may have ordered: a legitimately-empty rollup
    # yields ZERO blocks in Ray 2.49 — union one typed 0-row block
    return out.union(rd.from_arrow(out_schema.empty_table()))


Q22_SQL = """
WITH pos AS (
    SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS sum_pos,
           COUNT(*) AS n_pos
    FROM customer
    WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer, pos
WHERE c_custkey IS NOT NULL
  AND c_acctbal IS NOT NULL
  AND CAST(ROUND(c_acctbal*100) AS BIGINT) * n_pos > sum_pos
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_custkey IS NOT NULL AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""

REGISTRY["q22_rich_inactive"] = (q22_rich_inactive, Q22_SQL)


# ---------------------------------------------------------------------------
# Q4 — order-priority counts under a correlated EXISTS (semi-join + census)
# ---------------------------------------------------------------------------


def q4_order_priority(sf_dir: str) -> Dataset:
    """TPC-H Q4 shape: orders in a 3-month window that have at least one
    lineitem shipped AFTER the order date, counted per priority — the
    correlated-EXISTS semi-join (the inner predicate references the outer
    row, so it cannot be pre-filtered on the fact side alone).

    Plan: the window filter shrinks orders to ~4% (one quarter of a
    ~6-year span); that slice joins lineitem via ``auto_join`` (broadcast
    while it fits, hash-shuffle at scale) so the correlated predicate
    ``l_shipdate > o_orderdate`` is evaluated vectorized per batch.
    EXISTS-not-COUNT semantics come from a two-level distinct on
    (orderkey, priority): per-batch dedup partials, one dedup groupby over
    distinct pairs (cardinality <= qualifying orders, tiny), then a
    per-batch census + final Sum. Rows never carry more than two key
    columns through any exchange.

    NULL semantics (oracle mirrors): NULL o_orderdate fails the window
    filter; NULL keys never join; NULL l_shipdate makes the predicate
    NULL -> not EXISTS; NULL o_orderpriority is a real group (the dedup
    and census groupbys are null-safe)."""
    from ocr_ray.functions.joins import auto_join
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    lo = pa.scalar(pa.array(["1996-07-01"]).cast(pa.timestamp("us"))[0].as_py())
    hi = pa.scalar(pa.array(["1996-10-01"]).cast(pa.timestamp("us"))[0].as_py())

    ords = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.greater_equal(t.column("o_orderdate"), lo),
                    pc.less(t.column("o_orderdate"), hi),
                ),
                pc.is_valid(t.column("o_orderkey")),
            )
        ),
        batch_format="pyarrow",
    )
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("l_orderkey")), pc.is_valid(t.column("l_shipdate")))
        ),
        batch_format="pyarrow",
    )
    joined = auto_join(li, ords, on="l_orderkey", right_on="o_orderkey", how="inner")

    def qualifying_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), t.column("o_orderdate")))
        return t.select(["l_orderkey", "o_orderpriority"]).group_by(
            ["l_orderkey", "o_orderpriority"]
        ).aggregate([])

    distinct = null_safe_groupby_agg(
        joined.map_batches(qualifying_pairs, batch_format="pyarrow"),
        ["l_orderkey", "o_orderpriority"],
        Count(alias_name="__n"),
    )

    def census(t: pa.Table) -> pa.Table:
        ones = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "order_count": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        return _partial_groupby(ones, ["o_orderpriority"], ["order_count"], None)

    return null_safe_groupby_agg(
        distinct.map_batches(census, batch_format="pyarrow"),
        ["o_orderpriority"],
        Sum("order_count", alias_name="order_count"),
    )


Q4_SQL = """
WITH q AS (
    SELECT DISTINCT o_orderkey, o_orderpriority
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_shipdate > o_orderdate
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM q
GROUP BY o_orderpriority
"""

REGISTRY["q4_order_priority"] = (q4_order_priority, Q4_SQL)


# ---------------------------------------------------------------------------
# Q7 — two-nation shipping volume by year (multi-dim join + calendar group)
# ---------------------------------------------------------------------------


def q7_nation_volume(sf_dir: str) -> Dataset:
    """TPC-H Q7 shape: revenue shipped between two specific nations
    (supplier in one, customer in the other, both directions) grouped by
    (supp_nation, cust_nation, ship year).

    Scale plan: both dimension chains collapse driver-side to the two
    nation keys; supplier and customer filtered to those keys are tiny and
    broadcast via ``auto_join`` (hash-shuffle automatically above the
    threshold). lineitem is the only fact: filtered to the 2-year ship
    window, revenue computed per batch, combined to one row per
    (l_orderkey, s_nationkey, year) BEFORE the orderkey join. The final
    groupby carries <= 2 x 2 x years rows per block. Nation names are
    attached from the driver map after aggregation.

    NULL semantics (oracle mirrors): NULL l_shipdate fails the window
    filter; NULL join keys never match; the (supp != cust) filter is
    vacuous after both sides are pinned to the two keys but is kept
    vectorized for parity with the SQL predicate."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.joins import auto_join

    nat_a, nat_b = "NATION_3", "NATION_7"
    nat = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nat = nat.filter(
        pc.and_(
            pc.is_in(nat.column("n_name"), value_set=pa.array([nat_a, nat_b])),
            pc.is_valid(nat.column("n_nationkey")),
        )
    )
    name_of = {
        k: v
        for k, v in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }
    keys32 = pa.array(sorted(name_of), pa.int32())

    lo = pa.array(["1996-01-01"]).cast(pa.timestamp("us"))[0].as_py()
    hi = pa.array(["1998-01-01"]).cast(pa.timestamp("us"))[0].as_py()

    supp = rd.read_parquet(
        _pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"), value_set=keys32)),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"), value_set=keys32)),
        batch_format="pyarrow",
    )
    cust_schema = pa.schema(
        [pa.field("c_custkey", pa.int64()), pa.field("c_nationkey", pa.int32())]
    )
    supp_schema = pa.schema(
        [pa.field("s_suppkey", pa.int64()), pa.field("s_nationkey", pa.int32())]
    )
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    orders = auto_join(
        orders, cust, on="o_custkey", right_on="c_custkey", right_schema=cust_schema
    ).select_columns(["o_orderkey", "c_nationkey"])

    def line_prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                pc.less(t.column("l_shipdate"), pa.scalar(hi)),
            )
        )
        t = t.append_column(
            "revenue_c4", discounted_c4(t.column("l_extendedprice"), t.column("l_discount"))
        ).append_column("l_year", pc.year(t.column("l_shipdate")))
        return _partial_groupby(
            t.select(["l_orderkey", "l_suppkey", "l_year", "revenue_c4"]),
            ["l_orderkey", "l_suppkey", "l_year"],
            ["revenue_c4"],
            None,
        )

    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(line_prep, batch_format="pyarrow")
    line = auto_join(
        line, supp, on="l_suppkey", right_on="s_suppkey", right_schema=supp_schema
    ).map_batches(
        lambda t: _partial_groupby(
            t.select(["l_orderkey", "s_nationkey", "l_year", "revenue_c4"]),
            ["l_orderkey", "s_nationkey", "l_year"],
            ["revenue_c4"],
            None,
        ),
        batch_format="pyarrow",
    )

    orders_schema = pa.schema(
        [pa.field("o_orderkey", pa.int64()), pa.field("c_nationkey", pa.int32())]
    )
    joined = auto_join(
        line, orders, on="l_orderkey", right_on="o_orderkey", right_schema=orders_schema
    )

    def cross_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("s_nationkey"), t.column("c_nationkey")))
        return _partial_groupby(
            t.select(["s_nationkey", "c_nationkey", "l_year", "revenue_c4"]),
            ["s_nationkey", "c_nationkey", "l_year"],
            ["revenue_c4"],
            None,
        )

    agg = (
        joined.map_batches(cross_only, batch_format="pyarrow")
        .groupby(["s_nationkey", "c_nationkey", "l_year"])
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
    )

    def name_it(t: pa.Table) -> pa.Table:
        sn = pa.array([name_of[k] for k in t.column("s_nationkey").to_pylist()], pa.string())
        cn = pa.array([name_of[k] for k in t.column("c_nationkey").to_pylist()], pa.string())
        return pa.table(
            {
                "supp_nation": sn,
                "cust_nation": cn,
                "l_year": t.column("l_year"),
                "revenue_c4": t.column("revenue_c4"),
            }
        )

    return agg.map_batches(name_it, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""

REGISTRY["q7_nation_volume"] = (q7_nation_volume, Q7_SQL)


# ---------------------------------------------------------------------------
# Q15 — top-revenue supplier(s): scalar-MAX subquery over a derived view
# ---------------------------------------------------------------------------


def q15_top_supplier(sf_dir: str) -> Dataset:
    """TPC-H Q15 shape: revenue per supplier over one quarter, then the
    supplier(s) whose revenue EQUALS the global maximum — the
    "= (SELECT MAX(...))" tie-preserving selection (top-k with k=1 would
    drop ties; this keeps them).

    Scale plan: lineitem filtered to the quarter and pre-combined per batch
    to one row per supplier, so the revenue groupby's shuffle carries
    O(suppliers) rows per block. The global max is a tree-reduced scalar
    ``Dataset.aggregate(Max)`` over the (small) revenue table — never a
    driver sort. Winners are filtered vectorized and named via
    ``auto_join`` against supplier (broadcast at dimension size).

    NULL semantics (oracle mirrors): a NULL l_suppkey forms a revenue
    group (null-safe groupby) and PARTICIPATES in the scalar MAX — if the
    NULL group holds the max, the inner join against supplier drops it and
    the result is empty, exactly like SQL. NULL revenue sums (all-NULL
    groups) are skipped by MAX in both engines; an all-NULL max yields an
    empty result."""
    from ray.data.aggregate import Max

    from ocr_ray.functions.joins import auto_join
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    lo = pa.array(["1996-01-01"]).cast(pa.timestamp("us"))[0].as_py()
    hi = pa.array(["1996-04-01"]).cast(pa.timestamp("us"))[0].as_py()

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                pc.less(t.column("l_shipdate"), pa.scalar(hi)),
            )
        )
        t = t.append_column(
            "total_revenue_c4",
            discounted_c4(t.column("l_extendedprice"), t.column("l_discount")),
        )
        return _partial_groupby(
            t.select(["l_suppkey", "total_revenue_c4"]), ["l_suppkey"], ["total_revenue_c4"], None
        )

    rev = null_safe_groupby_agg(
        rd.read_parquet(
            _pq(sf_dir, "lineitem"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(prep, batch_format="pyarrow"),
        ["l_suppkey"],
        Sum("total_revenue_c4", alias_name="total_revenue_c4"),
    ).materialize()

    max_rev = rev.aggregate(Max("total_revenue_c4", alias_name="m"))["m"]
    out_schema = pa.schema(
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_name", pa.string()),
            pa.field("total_revenue_c4", pa.int64()),
        ]
    )
    if max_rev is None:
        return rd.from_arrow(out_schema.empty_table())

    winners = rev.map_batches(
        lambda t: t.filter(pc.equal(t.column("total_revenue_c4"), pa.scalar(max_rev))),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    named = auto_join(winners, supp, on="l_suppkey", right_on="s_suppkey")
    return named.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": t.column("s_name"),
                "total_revenue_c4": t.column("total_revenue_c4"),
            }
        ).cast(out_schema),
        batch_format="pyarrow",
    ).sort("s_suppkey")


Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
               AS total_revenue_c4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c4
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue_c4 = (SELECT MAX(total_revenue_c4) FROM rev)
ORDER BY s_suppkey
"""

REGISTRY["q15_top_supplier"] = (q15_top_supplier, Q15_SQL)


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who kept finished orders waiting (sole-late census)
# ---------------------------------------------------------------------------


def q21_late_sole_supplier(sf_dir: str) -> Dataset:
    """TPC-H Q21 shape adapted to this schema (no l_commitdate /
    l_receiptdate in the fixture): for finished orders ('F') supplied by
    MORE THAN ONE supplier, find the orders where EXACTLY ONE supplier was
    late (shipped > 60 days after the order date) and count, per supplier,
    how many orders they alone delayed — the EXISTS + NOT-EXISTS
    double-correlated self-join of the original, expressed as a per-order
    census.

    Scale plan: the orderkey-correlated logic runs inside ONE coarse-key
    ``grouped_scan`` (hash(l_orderkey) into partitions, numpy lexsort +
    run-length inside) — NOT a (orderkey, suppkey) hash groupby, whose
    group cardinality ~ row count puts it in the ~170k rows/s census class
    (BASELINE rule). The scan's shuffle carries 24-byte key rows only
    (orderkey, suppkey, late); the supplier attribution census that
    follows is O(suppliers) and tiny, and names arrive via ``auto_join``.

    NULL semantics (oracle mirrors): non-null l_suppkey contract (WHERE in
    the SQL); NULL l_orderkey never joins orders; a NULL l_shipdate or
    o_orderdate makes the lateness predicate NULL -> not late (CASE gives
    0)."""
    import numpy as np
    import pandas as pd

    from ocr_ray.functions.joins import auto_join
    from ocr_ray.pipelines.conversation import grouped_scan

    sixty_days_us = 60 * 86_400_000_000

    ords = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("o_orderstatus"), "F")
        ).select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )
    line = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("l_suppkey"))),
        batch_format="pyarrow",
    )
    joined = auto_join(line, ords, on="l_orderkey", right_on="o_orderkey")

    def slim(t: pa.Table) -> pa.Table:
        late = pc.cast(
            pc.fill_null(
                pc.greater(
                    pc.cast(t.column("l_shipdate"), pa.int64()),
                    pc.add(pc.cast(t.column("o_orderdate"), pa.int64()), sixty_days_us),
                ),
                False,
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "late": late,
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"l_suppkey": np.array([], np.int64)})
        o = df["l_orderkey"].to_numpy(np.int64)
        s = df["l_suppkey"].to_numpy(np.int64)
        late = df["late"].to_numpy(np.int64)
        order = np.lexsort((s, o))
        o, s, late = o[order], s[order], late[order]
        new_pair = np.ones(len(o), bool)
        new_pair[1:] = (o[1:] != o[:-1]) | (s[1:] != s[:-1])
        # max(late) per (order, supplier) pair via run boundaries
        starts = np.flatnonzero(new_pair)
        pair_late = np.maximum.reduceat(late, starts)
        pair_o, pair_s = o[starts], s[starts]
        new_ord = np.ones(len(pair_o), bool)
        new_ord[1:] = pair_o[1:] != pair_o[:-1]
        ostarts = np.flatnonzero(new_ord)
        ns = np.diff(np.append(ostarts, len(pair_o)))
        nlate = np.add.reduceat(pair_late, ostarts)
        qual = (ns > 1) & (nlate == 1)
        # the single late supplier of each qualifying order
        oid = np.cumsum(new_ord) - 1
        late_supp = np.zeros(len(ostarts), np.int64)
        m = pair_late == 1
        late_supp[oid[m]] = pair_s[m]
        return pd.DataFrame({"l_suppkey": late_supp[qual]})

    waits = grouped_scan(
        joined.map_batches(slim, batch_format="pyarrow"), "l_orderkey", scan
    )

    def census(t: pa.Table) -> pa.Table:
        t = t.append_column("numwait", pa.array([1] * t.num_rows, pa.int64()))
        return _partial_groupby(t, ["l_suppkey"], ["numwait"], None)

    per_supp = (
        waits.map_batches(census, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )
    supp = rd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    named = auto_join(per_supp, supp, on="l_suppkey", right_on="s_suppkey")
    return (
        named.map_batches(
            lambda t: pa.table(
                {
                    "s_suppkey": t.column("l_suppkey"),
                    "s_name": t.column("s_name"),
                    "numwait": t.column("numwait"),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["numwait", "s_suppkey"], descending=[True, False])
        .limit(10)
    )


Q21_SQL = """
WITH j AS (
    SELECT l_orderkey, l_suppkey,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_suppkey IS NOT NULL
    GROUP BY l_orderkey, l_suppkey
),
per_order AS (
    SELECT l_orderkey, COUNT(*) AS ns, SUM(late) AS nlate,
           MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
    FROM j GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON s_suppkey = late_supp
WHERE ns > 1 AND nlate = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""

REGISTRY["q21_late_sole_supplier"] = (q21_late_sole_supplier, Q21_SQL)


# ---------------------------------------------------------------------------
# LEAD-window gap census — inter-event wait distribution
# ---------------------------------------------------------------------------


def user_event_gap_census(sf_dir: str) -> Dataset:
    """Distribution of per-user inter-event gaps: LEAD(ts) OVER
    (PARTITION BY user_id ORDER BY ts, event_id), gap bucketed to whole
    minutes (capped at 120) and counted — the wait-time histogram an
    engagement pipeline derives from the LEAD window.

    Scale plan: the LEAD is evaluated inside one coarse-key
    ``grouped_scan`` (all of a user's events co-located, numpy lexsort +
    shifted diff — no per-user map_groups); each partition emits ONE
    bincount partial (<= 121 rows), so the final groupby is constant-size.
    All math is integer microseconds: `gap_us // 60e6` floors identically
    in numpy and DuckDB for the non-negative gaps a sorted partition
    produces.

    NULL semantics (oracle mirrors): NULL user_id / ts / event_id rows are
    out of contract and dropped in both engines (WHERE clause); the last
    event per user has no LEAD and contributes nothing."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    ev = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
                pc.is_valid(t.column("event_id")),
            )
        ),
        batch_format="pyarrow",
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"gap_min": np.array([], np.int64), "n": np.array([], np.int64)}
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same_user = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same_user]
        buckets = np.minimum(gaps // 60_000_000, 120)
        counts = np.bincount(buckets, minlength=121)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"gap_min": nz.astype(np.int64), "n": counts[nz].astype(np.int64)})

    partials = grouped_scan(ev, "user_id", scan)
    return partials.groupby("gap_min").aggregate(Sum("n", alias_name="n")).sort("gap_min")


USER_EVENT_GAP_CENSUS_SQL = """
WITH g AS (
    SELECT user_id, ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT LEAST(CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) // 60000000, 120) AS gap_min,
       CAST(COUNT(*) AS BIGINT) AS n
FROM g
WHERE nxt IS NOT NULL
GROUP BY 1
ORDER BY gap_min
"""

REGISTRY["user_event_gap_census"] = (user_event_gap_census, USER_EVENT_GAP_CENSUS_SQL)


# ---------------------------------------------------------------------------
# survivorship merge — per-entity golden record (last non-null per column)
# ---------------------------------------------------------------------------


def user_golden_record(sf_dir: str) -> Dataset:
    """Golden-record survivorship: one row per user carrying, for EACH
    column independently, the most recent NON-NULL value in (ts, event_id)
    order — the MDM merge rule (LAST_VALUE IGNORE NULLS at entity grain)
    that consolidates duplicate/partial records into one canonical row.

    Scale plan: one coarse-key ``grouped_scan`` co-locates each user's
    events; inside the partition one numeric lexsort orders all users at
    once and each column's survivor is picked via a vectorized
    max-valid-index reduceat (index of the last non-null row per user
    segment) — no per-user Python, no per-column re-sort. Output is one
    row per user; nothing else shuffles.

    NULL semantics (oracle mirrors): NULL user_id / ts / event_id rows are
    out of contract (dropped in both engines); a user whose values are all
    NULL in some column gets NULL there — the marker row survives."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    ev = rd.read_parquet(
        _pq(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type", "value", "props"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
                pc.is_valid(t.column("event_id")),
            )
        ),
        batch_format="pyarrow",
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], np.int64),
                    "last_type": pd.array([], dtype=object),
                    "last_value": np.array([], np.float64),
                    "last_props": pd.array([], dtype=object),
                    "last_ts": np.array([], "datetime64[us]"),
                }
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        df = df.iloc[order].reset_index(drop=True)
        u, ts = u[order], ts[order]
        new_u = np.ones(len(u), bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(u)) - 1
        idx = np.arange(len(u), dtype=np.int64)

        def survivor(col: str):
            valid = df[col].notna().to_numpy()
            vidx = np.where(valid, idx, np.int64(-1))
            last = np.maximum.reduceat(vidx, starts)
            vals = df[col].iloc[np.maximum(last, 0)].reset_index(drop=True)
            return vals.where(last >= 0, other=None)

        return pd.DataFrame(
            {
                "user_id": u[starts],
                "last_type": survivor("event_type"),
                "last_value": survivor("value").astype(np.float64),
                "last_props": survivor("props"),
                "last_ts": ts[ends].astype("datetime64[us]"),
            }
        )

    return grouped_scan(ev, "user_id", scan).sort("user_id")


USER_GOLDEN_RECORD_SQL = """
SELECT user_id,
       last(event_type ORDER BY ts, event_id)
           FILTER (WHERE event_type IS NOT NULL) AS last_type,
       last(value ORDER BY ts, event_id)
           FILTER (WHERE value IS NOT NULL) AS last_value,
       last(props ORDER BY ts, event_id)
           FILTER (WHERE props IS NOT NULL) AS last_props,
       max(ts) AS last_ts
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""

REGISTRY["user_golden_record"] = (user_golden_record, USER_GOLDEN_RECORD_SQL)


# ---------------------------------------------------------------------------
# audience overlap — distinct-user intersection per event-type pair
# ---------------------------------------------------------------------------


def event_type_user_overlap(sf_dir: str) -> Dataset:
    """Audience-overlap matrix: for every unordered pair of event types,
    the number of DISTINCT users who performed both — the reach-overlap /
    co-occurrence-at-entity-grain census (a self-join of distinct
    (type, user) pairs in SQL, which at scale would square the fact
    table).

    Scale plan: per-batch (type, user) dedup shrinks blocks first; one
    coarse-key ``grouped_scan`` on user co-locates each user's types,
    where an in-partition lexsort + run-length dedup makes the pair
    expansion exact; pairs are emitted via the vectorized
    repeat/offset-arithmetic construction (no per-user Python) and
    collapsed to a <= T^2-row census partial per partition before the
    tiny final groupby. User ids never pair with each other — only the
    bounded type vocabulary does.

    NULL semantics (oracle mirrors): NULL event_type / user_id rows are
    excluded by both engines (a NULL type cannot satisfy the < ordering;
    the contract is explicit in the WHERE)."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    ev = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("event_type")))
        )
        .group_by(["user_id", "event_type"])
        .aggregate([]),
        batch_format="pyarrow",
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.array([], dtype=object),
                "type_b": pd.array([], dtype=object),
                "n_users": np.array([], np.int64),
            }
        )
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        codes, uniques = pd.factorize(df["event_type"], sort=True)
        order = np.lexsort((codes, u))
        u, codes = u[order], codes[order]
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (codes[1:] != codes[:-1])
        u, codes = u[keep], codes[keep]
        new_u = np.ones(len(u), bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(u))
        seg_end_of = np.repeat(ends, np.diff(np.append(starts, len(u))))
        idx = np.arange(len(u), dtype=np.int64)
        reps = seg_end_of - idx - 1
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(idx, reps)
        base = np.repeat(np.cumsum(reps) - reps, reps)
        b_idx = a_idx + 1 + (np.arange(total, dtype=np.int64) - base)
        t_count = len(uniques)
        pair_code = codes[a_idx] * t_count + codes[b_idx]
        counts = np.bincount(pair_code, minlength=t_count * t_count)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "type_a": uniques[nz // t_count],
                "type_b": uniques[nz % t_count],
                "n_users": counts[nz].astype(np.int64),
            }
        )

    partials = grouped_scan(ev, "user_id", scan)
    return (
        partials.groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort(["type_a", "type_b"])
    )


EVENT_TYPE_USER_OVERLAP_SQL = """
WITH d AS (
    SELECT DISTINCT event_type, user_id
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY type_a, type_b
"""

REGISTRY["event_type_user_overlap"] = (event_type_user_overlap, EVENT_TYPE_USER_OVERLAP_SQL)


# ---------------------------------------------------------------------------
# period-over-period — month-over-month revenue delta (LAG over aggregate)
# ---------------------------------------------------------------------------


def orders_mom_delta(sf_dir: str) -> pa.Table:
    """Month-over-month revenue movement: the monthly rollup plus a LAG
    window over it (delta vs the previous calendar month) — the
    period-over-period report every BI layer derives from a time rollup.

    Scale plan: the rollup is the distributed part (per-batch partial
    pre-agg, shuffle carries one row per (year, month) per block); the LAG
    then runs on a BOUNDED table (one row per calendar month — a century
    is 1,200 rows), so the final shift happens driver-side on the
    collected rollup: a deliberate, documented small-result finish, same
    class as the metrics sidecar. A NULL-month group cannot exist (NULL
    dates are out of contract in both engines).
    """
    from ocr_ray.functions.scalars import to_cents

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderdate")))
        t = pa.table(
            {
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "o_month": pc.cast(pc.month(t.column("o_orderdate")), pa.int64()),
                "total_cents": to_cents(t.column("o_totalprice")),
            }
        )
        return _partial_groupby(t, ["o_year", "o_month"], ["total_cents"], None)

    rollup = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_year", "o_month"])
        .aggregate(Sum("total_cents", alias_name="total_cents"))
    )
    import ray as _ray

    tbls = [t for t in (_ray.get(r) for r in rollup.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.schema(
            [
                pa.field("o_year", pa.int64()),
                pa.field("o_month", pa.int64()),
                pa.field("total_cents", pa.int64()),
                pa.field("delta_cents", pa.int64()),
            ]
        ).empty_table()
    t = pa.concat_tables(tbls)
    order = pc.sort_indices(
        t, sort_keys=[("o_year", "ascending"), ("o_month", "ascending")]
    )
    t = t.take(order)
    # null-propagating LAG delta: an all-NULL month's total is NULL in both
    # engines; subtract keeps that NULL and COALESCE(…, 0) mirrors the SQL
    totals = pc.cast(t.column("total_cents"), pa.int64()).combine_chunks()
    prev = pa.concat_arrays(
        [pa.array([None], pa.int64()), totals.slice(0, max(len(totals) - 1, 0))]
    )
    delta_col = pc.fill_null(pc.subtract(totals, prev), pa.scalar(0, pa.int64()))
    return pa.table(
        {
            "o_year": t.column("o_year"),
            "o_month": t.column("o_month"),
            "total_cents": t.column("total_cents"),
            "delta_cents": delta_col,
        }
    )


ORDERS_MOM_DELTA_SQL = """
WITH m AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderdate IS NOT NULL
    GROUP BY 1, 2
)
SELECT o_year, o_month, total_cents,
       COALESCE(total_cents - lag(total_cents) OVER (ORDER BY o_year, o_month),
                0) AS delta_cents
FROM m
ORDER BY o_year, o_month
"""

REGISTRY["orders_mom_delta"] = (orders_mom_delta, ORDERS_MOM_DELTA_SQL)


# ---------------------------------------------------------------------------
# skew diagnostics — rows-per-key histogram in log2 buckets
# ---------------------------------------------------------------------------


def key_skew_report(sf_dir: str) -> Dataset:
    """Skew diagnostic: the distribution of rows-per-user in log2 buckets
    (bucket k holds keys with 2^k..2^(k+1)-1 rows) plus the row mass each
    bucket carries — the report that tells a pipeline author whether a
    groupby key needs salting BEFORE the shuffle burns a node.

    Scale plan: per-user counts never form a user-cardinality hash
    aggregate (the ~170k rows/s census class); instead per-batch (user, 1)
    partials go through ONE coarse-key grouped scan where a lexsort
    run-length sums each user's count, buckets it via exact integer
    power-of-two searchsorted (no float log2 — a 2^k-1 count must not
    round up), and emits a <= 63-row bincount partial. The final groupby
    is constant-size.

    NULL semantics (oracle mirrors): NULL user_id rows are out of the
    diagnostic's contract (WHERE in both engines)."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.conversation import grouped_scan

    def batch_census(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        t = t.append_column("n", pa.array([1] * t.num_rows, pa.int64()))
        return _partial_groupby(t, ["user_id"], ["n"], None)

    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"]).map_batches(
        batch_census, batch_format="pyarrow"
    )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "log2_rows": np.array([], np.int64),
                "n_keys": np.array([], np.int64),
                "n_rows": np.array([], np.int64),
            }
        )
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        order = np.argsort(u, kind="stable")
        u, n = u[order], n[order]
        new_u = np.ones(len(u), bool)
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        per_key = np.add.reduceat(n, starts)
        pows = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))
        bucket = np.searchsorted(pows, per_key, side="right") - 1
        n_keys = np.bincount(bucket, minlength=63)
        n_rows = np.bincount(bucket, weights=per_key, minlength=63).astype(np.int64)
        nz = np.flatnonzero(n_keys)
        return pd.DataFrame(
            {
                "log2_rows": nz.astype(np.int64),
                "n_keys": n_keys[nz].astype(np.int64),
                "n_rows": n_rows[nz],
            }
        )

    partials = grouped_scan(ev, "user_id", scan)
    return (
        partials.groupby("log2_rows")
        .aggregate(Sum("n_keys", alias_name="n_keys"), Sum("n_rows", alias_name="n_rows"))
        .sort("log2_rows")
    )


KEY_SKEW_REPORT_SQL = """
WITH c AS (
    SELECT user_id, COUNT(*) AS n
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
)
SELECT CAST(length(printf('%b', n)) - 1 AS BIGINT) AS log2_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM c
GROUP BY 1
ORDER BY log2_rows
"""

REGISTRY["key_skew_report"] = (key_skew_report, KEY_SKEW_REPORT_SQL)


def user_rfm(sf_dir: str) -> Dataset:
    """Per-user RFM rollup (recency / frequency / monetary) — the classic
    behavioral-segmentation aggregate: days since the user's last event
    (relative to the corpus's max timestamp), total event count, and
    purchase spend in exact cents.

    Plan: one partial pre-agg per batch (arrow group_by: max ts, count,
    purchase-cents sum) so the shuffle carries one small row per (batch,
    user); the global reference timestamp folds from per-batch maxima on
    the driver (a handful of int64s) and is applied in a final vectorized
    map. All integer math; recency uses floor division of a nonnegative
    microsecond difference, matching the SQL ``//``.

    Contract (mirrored): NULL user_id rows are excluded (entity key);
    NULL ts rows still count toward frequency/monetary but not recency
    (max skips NULLs; a user with only NULL timestamps gets NULL recency);
    NULL purchase values spend 0."""
    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        cents = to_cents(pc.coalesce(t.column("value"), pa.scalar(0.0)))
        money = pc.if_else(
            pc.equal(pc.coalesce(t.column("event_type"), pa.scalar("")), "purchase"),
            cents,
            pa.scalar(0, pa.int64()),
        )
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "last_ts": pc.cast(t.column("ts"), pa.int64()),
                    "frequency": pa.array([1] * t.num_rows, pa.int64()),
                    "monetary_cents": money,
                }
            )
            .group_by(["user_id"])
            .aggregate([("last_ts", "max"), ("frequency", "sum"), ("monetary_cents", "sum")])
        )
        return g.rename_columns(["user_id", "last_ts", "frequency", "monetary_cents"])

    from ray.data.aggregate import Max

    parts = events.map_batches(partial, batch_format="pyarrow").materialize()
    gmax = None
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        m = pc.max(b.column("last_ts")).as_py()
        if m is not None:
            gmax = m if gmax is None else max(gmax, m)
    agg = parts.groupby("user_id").aggregate(
        Max("last_ts", alias_name="last_ts"),
        Sum("frequency", alias_name="frequency"),
        Sum("monetary_cents", alias_name="monetary_cents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        if gmax is None:
            rec = pa.array([None] * t.num_rows, pa.int64())
        else:
            diff = pc.subtract(pa.scalar(gmax, pa.int64()), t.column("last_ts"))
            rec = pc.divide(diff, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "recency_days": rec,
                "frequency": t.column("frequency"),
                "monetary_cents": t.column("monetary_cents"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


USER_RFM_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
),
g AS (SELECT max(ts) AS gmax FROM e)
SELECT user_id,
       CAST(date_diff('microsecond', max(e.ts), (SELECT gmax FROM g))
            // 86400000000 AS BIGINT) AS recency_days,
       CAST(count(*) AS BIGINT) AS frequency,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
            AS BIGINT) AS monetary_cents
FROM e GROUP BY user_id
"""

REGISTRY["user_rfm"] = (user_rfm, USER_RFM_SQL)


def props_schema_infer(sf_dir: str) -> Dataset:
    """Semi-structured schema inference: per (JSON key, value type) census
    over the ``props`` column — the schema-of-json profiling step that
    decides how to promote a free-form property bag into typed columns
    (Spark's schema inference as a queryable census, with counts so drift
    and type conflicts are visible rather than silently widened).

    Plan: per-batch parse (the ``event_props_stats`` malformed-input
    contract: NULL / invalid JSON rows are skipped, non-object documents
    yield no keys) + per-batch census partials, so the shuffle carries
    (key, vtype, n) cells bounded by schema width, never the documents.
    Type names are DuckDB's json_type vocabulary (UBIGINT/BIGINT/DOUBLE/
    VARCHAR/BOOLEAN/ARRAY/OBJECT/NULL) so the census is gate-exact; JSON
    nulls are normalized to the string 'NULL' on both sides (DuckDB's
    vectorized json_type returns SQL NULL there, coalesced in the mirror).
    Keys are assumed JSON-path-safe (no dots/quotes), as in the fixture."""
    import json as _json

    from ray.data.aggregate import Sum

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["props"])

    def _vtype(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "UBIGINT" if v >= 0 else "BIGINT"
        if isinstance(v, float):
            return "DOUBLE"
        if isinstance(v, str):
            return "VARCHAR"
        if isinstance(v, list):
            return "ARRAY"
        return "OBJECT"

    def census(t: pa.Table) -> pa.Table:
        cells: dict[tuple[str, str], int] = {}
        for s_ in t.column("props").to_pylist():
            if s_ is None:
                continue
            try:
                obj = _json.loads(s_)
            except (ValueError, TypeError):
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                key = (k, _vtype(v))
                cells[key] = cells.get(key, 0) + 1
        return pa.table(
            {
                "key": pa.array([k for k, _ in cells], pa.string()),
                "vtype": pa.array([v for _, v in cells], pa.string()),
                "n": pa.array(list(cells.values()), pa.int64()),
            }
        )

    return (
        events.map_batches(census, batch_format="pyarrow")
        .groupby(["key", "vtype"])
        .aggregate(Sum("n", alias_name="n"))
    )


PROPS_SCHEMA_INFER_SQL = """
SELECT k AS key, coalesce(json_type(j, '$.' || k), 'NULL') AS vtype,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT props::JSON AS j, unnest(json_keys(props::JSON)) AS k
  FROM events WHERE props IS NOT NULL AND json_valid(props)
)
GROUP BY key, vtype
"""

REGISTRY["props_schema_infer"] = (props_schema_infer, PROPS_SCHEMA_INFER_SQL)


# --- TPC-H q2/q8/q9/q11/q12/q16/q20 (adapted shapes) live in their own
# module; merging here keeps one REGISTRY for __ray_entry__ and the sweeps.
from ocr_ray.pipelines.tpch_more import REGISTRY as _TPCH_MORE_REGISTRY  # noqa: E402

REGISTRY.update(_TPCH_MORE_REGISTRY)


def orders_naive_forecast_error(sf_dir: str) -> pa.Table:
    """Forecast-evaluation shape: score the NAIVE (persistence, lag-1)
    baseline — forecast for a month = the previous PRESENT month's actual
    — against the monthly revenue series: per-month absolute error in
    exact cents, the MAE/MASE ingredient a forecasting pipeline reports
    before trusting any model. (NOT seasonal-naive, which would lag 12
    months — same-month-last-year.) "Previous present month" mirrors
    orders_monthly_mom's lag convention (a gap month forecasts from the
    last observed one).

    Plan: the monthly rollup is the tiny partial-pre-agg census
    (calendar-bounded — a century of data is 1200 rows), so the ordered
    lag runs on the driver; all heavy work is the same one pre-aggregated
    pass as orders_monthly. NULL o_orderdate rows are excluded (mirrored);
    months with no predecessor emit no row (lag is NULL in SQL)."""
    import numpy as np

    monthly = orders_monthly(sf_dir)
    rows = [
        b
        for b in monthly.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    t = (
        pa.concat_tables(rows)
        if rows
        else pa.table(
            {
                "y": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
            }
        )
    )
    t = t.sort_by([("y", "ascending"), ("m", "ascending")])
    y = t.column("y").to_numpy(zero_copy_only=False)
    m = t.column("m").to_numpy(zero_copy_only=False)
    v = t.column("total_cents").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(v) < 2:
        return pa.table(
            {
                "y": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "actual_cents": pa.array([], pa.int64()),
                "forecast_cents": pa.array([], pa.int64()),
                "abs_err_cents": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "y": pa.array(y[1:]),
            "m": pa.array(m[1:]),
            "actual_cents": pa.array(v[1:]),
            "forecast_cents": pa.array(v[:-1]),
            "abs_err_cents": pa.array(np.abs(v[1:] - v[:-1])),
        }
    )


ORDERS_NAIVE_FORECAST_ERROR_SQL = """
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(SUM(COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), 0)) AS BIGINT) AS v
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
),
lagged AS (
  SELECT y, m, v AS actual_cents,
         lag(v) OVER (ORDER BY y, m) AS forecast_cents
  FROM monthly
)
SELECT y, m, actual_cents,
       CAST(forecast_cents AS BIGINT) AS forecast_cents,
       CAST(abs(actual_cents - forecast_cents) AS BIGINT) AS abs_err_cents
FROM lagged WHERE forecast_cents IS NOT NULL
"""

REGISTRY["orders_naive_forecast_error"] = (
    orders_naive_forecast_error,
    ORDERS_NAIVE_FORECAST_ERROR_SQL,
)
