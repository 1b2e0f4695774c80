"""Dirty-input parity for the timeseries / dq / mlprep-extension /
incremental ops: NULL keys, NULL timestamps, NULL measures, and negative
values must produce EXACTLY what the DuckDB oracle produces (the clean
fixtures never hit these paths — same sweep the earlier families got)."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _dirty_dir(tmp_path) -> str:
    """Events + orders + lineitem + customer + documents with every nasty
    combination: NULL key with valid ts, NULL ts with valid key, NULL
    measures, negatives."""
    d = tmp_path / "sf_dirty"
    d.mkdir()
    ts = dt.datetime(2024, 1, 1)

    def day(n, h=0):
        return ts + dt.timedelta(days=n, hours=h)

    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
            "ts": pa.array(
                [day(0), day(0, 9), None, day(2), day(3), day(1), None, day(4)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, None, 1, 2, None, 2], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "click", "view", "purchase", "view", "view", "click"]
            ),
            "value": pa.array([12.5, None, 3.0, -1.0, 0.07, None, 1.0, 499.99]),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(events, str(d / "events.parquet"))
    orders = pa.table(
        {
            "o_orderkey": pa.array([7, 13, 11, None, 5, 97 * 89, 3], pa.int64()),
            "o_custkey": pa.array([1, None, 2, 1, 89, 1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O", "F", None, "O", "F", "O", "O"]),
            # key 3: cents 7e7 -> PPS keep-probability 1 (sample never empty)
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, None, 60.0, 700000.0]),
            "o_orderdate": pa.array(
                [day(0), None, day(400), day(0), day(0), day(400), day(1)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 7),
        }
    )
    pq.write_table(orders, str(d / "orders.parquet"))
    lineitem = pa.table(
        {"l_orderkey": pa.array([7, 7, None, 97, 13], pa.int64())}
    )
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    customer = pa.table(
        {
            "c_custkey": pa.array([1, 2, None], pa.int64()),
            "c_nationkey": pa.array([10, 20, 30], pa.int32()),
        }
    )
    pq.write_table(customer, str(d / "customer.parquet"))
    documents = pa.table(
        {
            "doc_id": pa.array([1, None, 3], pa.int64()),
            "text": pa.array(["a b", "x y z", None]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([3, 5, 0], pa.int64()),
        }
    )
    pq.write_table(documents, str(d / "documents.parquet"))
    return str(d)


def _compare(got, sql, sf_dir, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.sql(sql).df()
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    w = want.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    assert g.astype(str).values.tolist() == w.astype(str).values.tolist()


@pytest.fixture()
def dirty(tmp_path, ray_session):
    return _dirty_dir(tmp_path)


def test_gapfill_dirty(dirty):
    """NULL ts and NULL user rows contribute nothing; spans come only from
    clean observations."""
    from ocr_ray.ops.timeseries import USER_DAYS_GAPFILLED_SQL, user_days_gapfilled

    got = user_days_gapfilled(dirty).to_pandas()
    assert set(got.user_id) == {1, 2}
    _compare(got, USER_DAYS_GAPFILLED_SQL, dirty)


def test_locf_dirty(dirty):
    """A NULL value is not an observation (user 1 day 0: the NULL-value
    click at 09:00 must NOT override the 00:00 view's 12.50)."""
    from ocr_ray.ops.timeseries import USER_DAYS_LOCF_SQL, user_days_locf

    got = user_days_locf(dirty).to_pandas()
    u1 = got[got.user_id == 1].sort_values("day")
    assert u1.value_cents.tolist()[0] == 1250
    _compare(got, USER_DAYS_LOCF_SQL, dirty)


def test_funnel_dirty(dirty):
    from ocr_ray.ops.timeseries import SESSION_FUNNEL_SQL, session_funnel

    _compare(session_funnel(dirty), SESSION_FUNNEL_SQL, dirty)


def test_ntile_dirty(dirty):
    """NULL and negative values: NULLS LAST, negatives first."""
    from ocr_ray.ops.timeseries import EVENTS_NTILE_SQL, events_ntile

    _compare(events_ntile(dirty), EVENTS_NTILE_SQL, dirty)


def test_zorder_dirty(dirty):
    """NULL ts -> bucket 0; NULL user -> origin cell, in both engines."""
    from ocr_ray.ops.dq import EVENTS_ZORDER_SQL, events_zorder

    _compare(events_zorder(dirty), EVENTS_ZORDER_SQL, dirty)


def test_orphans_dirty(dirty):
    """NULL FKs are not orphans; NULL parent keys match nothing."""
    from ocr_ray.ops.dq import DQ_ORPHANS_SQL, dq_orphans

    got = dq_orphans(dirty)
    _compare(got, DQ_ORPHANS_SQL, dirty, tables=("events", "orders", "lineitem", "customer"))


def test_snapshot_diff_dirty(dirty):
    """NULL key rows are undiffable (dropped); NULL status/price take
    sentinels so updates on other columns still surface."""
    from ocr_ray.ops.dq import ORDERS_SNAPSHOT_DIFF_SQL, orders_snapshot_diff

    got = orders_snapshot_diff(dirty).to_pandas()
    _compare(got, ORDERS_SNAPSHOT_DIFF_SQL, dirty, tables=("orders",))


def test_keyset_page_dirty(dirty):
    from ocr_ray.ops.dq import ORDERS_KEYSET_PAGE_SQL, orders_keyset_page

    _compare(orders_keyset_page(dirty), ORDERS_KEYSET_PAGE_SQL, dirty, tables=("orders",))


def test_weighted_sample_dirty(dirty):
    """NULL key / NULL price: the SQL predicate is NULL -> dropped; the
    engine must drop the same rows, not crash on the hash."""
    from ocr_ray.ops.mlprep import WEIGHTED_SAMPLE_ORDERS_SQL, weighted_sample_orders

    _compare(
        weighted_sample_orders(dirty), WEIGHTED_SAMPLE_ORDERS_SQL, dirty, tables=("orders",)
    )


def test_incremental_dirty(dirty):
    """NULL o_orderdate lands in exactly one leg (delta = complement of
    base); NULL price rows are excluded from the stats in both engines."""
    from ocr_ray.ops.incremental import (
        NATION_ORDERS_INCREMENTAL_SQL,
        nation_orders_incremental,
    )

    got = nation_orders_incremental(dirty)
    _compare(got, NATION_ORDERS_INCREMENTAL_SQL, dirty, tables=("orders", "customer"))


def test_explode_words_dirty(dirty):
    """NULL text -> zero rows; NULL doc_id survives as NULL (not float)."""
    from ocr_ray.ops.corpus import EXPLODE_DOC_WORDS_SQL, explode_doc_words

    got = explode_doc_words(dirty).to_pandas()
    assert got.doc_id.isna().sum() == 3  # 'x y z' under the NULL doc id
    _compare(got, EXPLODE_DOC_WORDS_SQL, dirty, tables=("documents",))


def test_retention_cohorts_dirty(dirty):
    """Cohort = first CLEAN observation; NULL ts / NULL user rows shape no
    cohort; day-0 offset counts every cohort member exactly once."""
    from ocr_ray.ops.timeseries import (
        USER_RETENTION_COHORTS_SQL,
        user_retention_cohorts,
    )

    got = user_retention_cohorts(dirty)
    d0 = got[got.day_offset == 0]
    assert (d0.users >= 1).all()
    _compare(got, USER_RETENTION_COHORTS_SQL, dirty)


def test_retention_cohorts_planted(tmp_path, ray_session):
    """Planted cohorts: u1,u2 start day 0 (u1 returns day 1 and 3, u2 day 1);
    u3 starts day 2 and returns day 3 — exact matrix."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0), (1, 1), (1, 3), (2, 0), (2, 1), (2, 1), (3, 2), (3, 3),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(days=d) for _, d in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ocr_ray.ops.timeseries import user_retention_cohorts

    got = user_retention_cohorts(str(tmp_path))
    cells = {(r.cohort_day, r.day_offset): r.users for r in got.itertuples()}
    d0 = base.toordinal() - dt.date(1970, 1, 1).toordinal()
    assert cells == {
        (d0, 0): 2,      # u1, u2
        (d0, 1): 2,      # u1, u2 (u2's duplicate day-1 events count once)
        (d0, 3): 1,      # u1
        (d0 + 2, 0): 1,  # u3
        (d0 + 2, 1): 1,  # u3 day 3
    }


def test_ntile_by_type_dirty(dirty):
    """Partitioned NTILE: NULL event_type forms its own partition (coalesced
    to '' in both engines); NULL values sort last within each partition."""
    from ocr_ray.ops.timeseries import (
        EVENTS_NTILE_BY_TYPE_SQL,
        events_ntile_by_type,
    )

    _compare(events_ntile_by_type(dirty), EVENTS_NTILE_BY_TYPE_SQL, dirty)


def test_trailing_hour_spend_dirty(dirty):
    """RANGE frame with dirty rows: non-observations excluded up front in
    both engines."""
    from ocr_ray.ops.timeseries import (
        USER_TRAILING_HOUR_SPEND_SQL,
        user_trailing_hour_spend,
    )

    _compare(user_trailing_hour_spend(dirty), USER_TRAILING_HOUR_SPEND_SQL, dirty)


def test_trailing_hour_peers_and_boundary(tmp_path, ray_session):
    """RANGE semantics the fixture never isolates: equal-ts rows are PEERS
    (both include both), and an event exactly 1h earlier IS in the frame
    (inclusive bound) while 1h+1us is not."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base - dt.timedelta(hours=1, microseconds=1), 1.00),  # outside
        (2, base - dt.timedelta(hours=1), 2.00),                  # inclusive edge
        (3, base, 4.00),                                          # peer A
        (4, base, 8.00),                                          # peer B
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["purchase"] * 4),
            "value": pa.array([r[2] for r in rows]),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ocr_ray.ops.timeseries import user_trailing_hour_spend

    out = (
        user_trailing_hour_spend(str(tmp_path))
        .to_pandas()
        .set_index("event_id")["trail_cents"]
    )
    assert out[1] == 100  # first event: only itself
    assert out[2] == 300  # e1 is 1us before e2 -> inside e2's trailing hour
    # e3/e4's frame: e2 sits exactly 1h earlier (inclusive) + both peers;
    # e1 is 1h+1us earlier -> excluded
    assert out[3] == 200 + 400 + 800
    assert out[4] == out[3]  # equal-ts rows are peers and share the frame


def test_custs_finished_only_dirty(dirty):
    """EXCEPT with NULL keys and NULL statuses: neither contributes."""
    from ocr_ray.ops.olap import CUSTS_FINISHED_ONLY_SQL, custs_finished_only

    _compare(custs_finished_only(dirty), CUSTS_FINISHED_ONLY_SQL, dirty, tables=("orders",))


def test_user_top_event_type_dirty(dirty):
    """MODE with NULL users/types excluded; ties break to the smaller type."""
    from ocr_ray.ops.olap import USER_TOP_EVENT_TYPE_SQL, user_top_event_type

    _compare(user_top_event_type(dirty), USER_TOP_EVENT_TYPE_SQL, dirty)


def test_overlapping_order_windows_dirty(dirty):
    """Interval overlap with NULL custkey/orderdate rows excluded up front."""
    from ocr_ray.ops.timeseries import (
        OVERLAPPING_ORDER_WINDOWS_SQL,
        overlapping_order_windows,
    )

    _compare(
        overlapping_order_windows(dirty),
        OVERLAPPING_ORDER_WINDOWS_SQL,
        dirty,
        tables=("orders",),
    )


def test_overlap_window_boundary(tmp_path, ray_session):
    """Closed-interval rule: windows touching at exactly day 30 DO overlap;
    1 microsecond past does not. Different customers never overlap."""
    import datetime as dt

    base = dt.datetime(1996, 1, 1)
    rows = [  # (orderkey, custkey, date)
        (1, 1, base),                                        # [0, 30]
        (2, 1, base + dt.timedelta(days=30)),                # [30, 60] — touches 1
        (3, 1, base + dt.timedelta(days=60, microseconds=1)),# misses 2 by 1us
        (4, 2, base),                                        # other customer
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([1.0] * 4),
            "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    from ocr_ray.ops.timeseries import overlapping_order_windows

    got = (
        overlapping_order_windows(str(tmp_path))
        .to_pandas()
        .set_index("o_orderkey")["n_overlaps"]
    )
    assert got[1] == 1 and got[2] == 1 and got[3] == 0 and got[4] == 0


def test_q5_dirty(tmp_path, ray_session):
    """Six-table join with NULL join keys, NULL dates, out-of-region rows,
    and customer/supplier nation mismatches — exact parity with DuckDB."""
    import datetime as dt

    d = tmp_path / "sf_q5"
    d.mkdir()
    day = dt.datetime(1996, 6, 1)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"]),
            }
        ),
        d / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([10, 11, 20], pa.int32()),
                "n_name": pa.array(["JP", "IN", "FR"]),
                "n_regionkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, None], pa.int64()),
                "c_nationkey": pa.array([10, 11, 20, 10], pa.int32()),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([100, 101, None], pa.int64()),
                "s_nationkey": pa.array([10, 20, 10], pa.int32()),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # order 5: matching nations (cust 1 JP, supp 100 JP) -> counts
                # order 6: cust 2 IN vs supp 100 JP -> filtered by n==n
                # order 7: NULL date; order 8: out of window
                "o_orderkey": pa.array([5, 6, 7, 8, None], pa.int64()),
                "o_custkey": pa.array([1, 2, 1, 1, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [day, day, None, dt.datetime(2005, 1, 1), day], pa.timestamp("us")
                ),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([5, 5, 6, 8, None], pa.int64()),
                "l_suppkey": pa.array([100, 101, 100, 100, 100], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
                "l_discount": pa.array([0.05, 0.0, None, 0.0, 0.0]),
            }
        ),
        d / "lineitem.parquet",
    )
    from ocr_ray.pipelines.relational import Q5_SQL, q5_supplier_volume

    _compare(
        q5_supplier_volume(str(d)),
        Q5_SQL,
        str(d),
        tables=("region", "nation", "customer", "supplier", "orders", "lineitem"),
    )


def test_dense_rank_dirty(dirty):
    """DENSE_RANK/CUME_DIST over dirty values: NULLs excluded in both
    engines; negatives rank below zero; ties share rank and cd_num."""
    from ocr_ray.ops.mlprep import (
        EVENTS_VALUE_DENSE_RANK_SQL,
        events_value_dense_rank,
    )

    _compare(events_value_dense_rank(dirty), EVENTS_VALUE_DENSE_RANK_SQL, dirty)


def test_twap_dirty(dirty):
    """TWAP with NULL user/ts/value rows excluded; single-observation users
    get num=0, den=0."""
    from ocr_ray.ops.timeseries import USER_TWAP_SQL, user_twap

    _compare(user_twap(dirty), USER_TWAP_SQL, dirty)


def test_bpe_tokens_dirty(dirty):
    """NULL text stays NULL (totality) in both engines."""
    from ocr_ray.ops.textstats import DOC_BPE_TOKEN_COUNTS_SQL, doc_bpe_token_counts

    _compare(
        doc_bpe_token_counts(dirty), DOC_BPE_TOKEN_COUNTS_SQL, dirty, tables=("documents",)
    )


def test_twap_same_second_pairing(tmp_path, ray_session):
    """Two events in the SAME floored second with event_id order opposite
    to sub-second order: the pairing must follow (second, event_id) in both
    engines — this is exactly the case where sorting by raw microseconds
    would disagree with the SQL mirror."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # event 2 happens EARLIER within second 0 but has the larger id
        (1, base + dt.timedelta(microseconds=900_000), 10.00),
        (2, base + dt.timedelta(microseconds=100_000), 20.00),
        (3, base + dt.timedelta(seconds=5), 40.00),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([r[2] for r in rows]),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ocr_ray.ops.timeseries import USER_TWAP_SQL, user_twap

    got = user_twap(str(tmp_path)).to_pandas()
    # order by (s, event_id): e1 (1000c, hold 0s) -> e2 (2000c, hold 5s) -> e3
    assert got.twap_num.iloc[0] == 2000 * 5 and got.twap_den.iloc[0] == 5
    _compare(got, USER_TWAP_SQL, str(tmp_path))


def test_users_no_purchase_three_valued(dirty):
    """NOT IN semantics on dirty input: left NULL keys drop (never 'not
    in'); here the buyer set has no NULL so the anti-join path runs."""
    from ocr_ray.pipelines.relational import USERS_NO_PURCHASE_SQL, users_no_purchase

    _compare(users_no_purchase(dirty), USERS_NO_PURCHASE_SQL, dirty)


def test_users_no_purchase_null_in_subquery(tmp_path, ray_session):
    """A NULL user on a PURCHASE row puts NULL in the NOT IN subquery —
    SQL says the whole result is empty; the engine must mirror that."""
    import duckdb

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * 3, pa.timestamp("us")),
            "user_id": pa.array([7, None, 8], pa.int64()),
            "event_type": pa.array(["view", "purchase", "click"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ocr_ray.pipelines.relational import USERS_NO_PURCHASE_SQL, users_no_purchase

    got = users_no_purchase(str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
    want = con.sql(USERS_NO_PURCHASE_SQL).df()
    assert len(want) == 0 and got.num_rows == 0


def test_orders_monthly_dirty(dirty):
    """Calendar rollup: NULL dates excluded, NULL prices count with 0."""
    from ocr_ray.pipelines.relational import ORDERS_MONTHLY_SQL, orders_monthly

    _compare(orders_monthly(dirty), ORDERS_MONTHLY_SQL, dirty, tables=("orders",))


def test_embedding_norm_stats_dirty(tmp_path, ray_session):
    """Vector hygiene on nasty vectors: NULL vector dropped, empty list
    gets (dim 0, qnorm2 0), negatives square exactly."""
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(
                [[0.5, -0.25], None, [], [1.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 0, 0, 0], pa.int32()),
        }
    )
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    from ocr_ray.ops.ann import EMBEDDING_NORM_STATS_SQL, embedding_norm_stats

    _compare(
        embedding_norm_stats(str(tmp_path)),
        EMBEDDING_NORM_STATS_SQL,
        str(tmp_path),
        tables=("embeddings",),
    )


def test_concurrent_events_dirty(dirty):
    """Keyless time join on dirty rows: NULL ts never joins either side;
    NULL-id purchases are not probes."""
    from ocr_ray.ops.timeseries import (
        PURCHASES_CONCURRENT_EVENTS_SQL,
        purchases_concurrent_events,
    )

    _compare(
        purchases_concurrent_events(dirty), PURCHASES_CONCURRENT_EVENTS_SQL, dirty
    )


def test_concurrent_events_bucket_boundary(tmp_path, ray_session):
    """Events exactly AT the ±60 s bound are in (inclusive); 60 s + 1 us is
    out — including neighbors that live in a DIFFERENT time bucket than
    the probe (the replication path, not the home-bucket path)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 1, 59)  # 1 us below a 120 s bucket edge
    rows = [
        (1, base, "purchase"),                                  # probe
        (2, base + dt.timedelta(seconds=60), "view"),           # inclusive, next bucket
        (3, base - dt.timedelta(seconds=60), "view"),           # inclusive, same bucket
        (4, base + dt.timedelta(seconds=60, microseconds=1), "view"),  # out
        (5, base - dt.timedelta(seconds=60, microseconds=1), "view"),  # out
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([9, 1, 2, 3, 4], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from ocr_ray.ops.timeseries import purchases_concurrent_events

    got = purchases_concurrent_events(str(tmp_path)).to_pandas()
    assert len(got) == 1 and got.event_id.iloc[0] == 1
    assert got.n_concurrent.iloc[0] == 3  # self + the two inclusive bounds


def test_distinct_users_per_type_dirty(dirty):
    """Grouped distinct: NULL users don't count; NULL type is a group."""
    from ocr_ray.pipelines.relational import (
        DISTINCT_USERS_PER_TYPE_SQL,
        distinct_users_per_type,
    )

    _compare(distinct_users_per_type(dirty), DISTINCT_USERS_PER_TYPE_SQL, dirty)


def test_grouped_hll_tracks_exact(ray_session):
    """Per-group HLL within 5% of the exact sibling at sf0.01 (4096
    registers; n per group is in the small-range-corrected regime)."""
    from ocr_ray.pipelines.relational import (
        distinct_users_per_type,
        distinct_users_per_type_hll,
    )

    sf = "/root/testdata/sf0.01"
    exact = distinct_users_per_type(sf).to_pandas().set_index("event_type")["n_users"]
    approx = (
        distinct_users_per_type_hll(sf).to_pandas().set_index("event_type")["n_users_approx"]
    )
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, int(0.05 * n)), (et, n, approx[et])
