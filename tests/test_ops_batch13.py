"""Planted-input tests for the session-11 op batch (second wave): lexical
diversity (TTR/Simpson), leave-one-out target encoding, group-median
imputation, association lift, and OHLC bars."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(dirpath, ids, texts):
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["t"] * len(ids), pa.string()),
            "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(dirpath / "documents.parquet"))
    return str(dirpath)


def _write_customers(dirpath, segs, bals):
    n = len(segs)
    t = pa.table(
        {
            "c_custkey": pa.array(list(range(1, n + 1)), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "c_nationkey": pa.array([0] * n, pa.int32()),
            "c_acctbal": pa.array(bals, pa.float64()),
            "c_mktsegment": pa.array(segs, pa.string()),
        }
    )
    pq.write_table(t, str(dirpath / "customer.parquet"))
    return str(dirpath)


class TestDocTtr:
    def test_planted_counts(self, ray_session, tmp_path):
        from ocr_ray.ops.textstats import doc_ttr

        sf = _write_docs(
            tmp_path,
            ids=[1, 2, 3, 4, None],
            texts=["a a b", "x y z", "", None, "skip me"],
        )
        rows = {r["doc_id"]: r for r in doc_ttr(sf).take_all()}
        # NULL text and NULL doc_id rows excluded
        assert set(rows) == {1, 2, 3}
        assert rows[1] == {
            "doc_id": 1, "n_tokens": 3, "n_distinct": 2,
            "simpson_num": 2, "simpson_den": 6,
        }
        assert rows[2]["n_distinct"] == 3 and rows[2]["simpson_num"] == 0
        # split('', ' ') yields one empty token in both engines
        assert rows[3] == {
            "doc_id": 3, "n_tokens": 1, "n_distinct": 1,
            "simpson_num": 0, "simpson_den": 0,
        }


class TestTargetEncoding:
    def test_loo_arithmetic(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import cust_target_encoding

        sf = _write_customers(
            tmp_path,
            segs=["A", "A", "A", None],
            bals=[1.0, 2.0, None, 5.0],
        )
        rows = {r["c_custkey"]: r for r in cust_target_encoding(sf).take_all()}
        assert rows[1]["loo_num"] == 200 and rows[1]["loo_den"] == 1
        assert rows[2]["loo_num"] == 100 and rows[2]["loo_den"] == 1
        # NULL balance: full group sum/count (contributes nothing of its own)
        assert rows[3]["loo_num"] == 300 and rows[3]["loo_den"] == 2
        # NULL segment is its own group; singleton non-null row -> den 0
        assert rows[4]["loo_num"] == 0 and rows[4]["loo_den"] == 0


class TestBalanceImputed:
    def test_median_fill_and_all_null_group(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import cust_balance_imputed

        sf = _write_customers(
            tmp_path,
            segs=["A", "A", "A", "B", "B", None, None],
            bals=[1.0, 3.0, None, None, None, 2.0, None],
        )
        rows = {r["c_custkey"]: r for r in cust_balance_imputed(sf).take_all()}
        # segment A: lower median of [100, 300] = 100
        assert rows[3]["bal_cents"] == 100 and rows[3]["imputed"]
        assert rows[1]["bal_cents"] == 100 and not rows[1]["imputed"]
        # segment B has no observations: stays NULL, not imputed
        assert rows[4]["bal_cents"] is None and not rows[4]["imputed"]
        # NULL segment is a real group: its NULL row gets the group median
        assert rows[7]["bal_cents"] == 200 and rows[7]["imputed"]

    def test_median_crosses_buckets(self, ray_session, tmp_path):
        """Values spanning several $10k histogram buckets exercise the
        bucket-walk rank arithmetic (median bucket is not the first)."""
        from ocr_ray.ops.mlprep import cust_balance_imputed

        sf = _write_customers(
            tmp_path,
            segs=["A"] * 4,
            bals=[5.0, 20000.0, 30000.0, None],
        )
        rows = {r["c_custkey"]: r for r in cust_balance_imputed(sf).take_all()}
        # lower median of [500, 2_000_000, 3_000_000] = 2_000_000
        assert rows[4]["bal_cents"] == 2_000_000 and rows[4]["imputed"]


class TestPartPairLift:
    def test_lift_rationals(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import part_pair_lift

        # baskets: o1={10,20}, o2={10,20}, o3={10,30}; a duplicated
        # (order, part) line must not double-count
        ok = [1, 1, 2, 2, 3, 3, 3]
        pk = [10, 20, 10, 20, 10, 30, 30]
        t = pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))
        rows = {
            (r["part_a"], r["part_b"]): r for r in part_pair_lift(str(tmp_path)).take_all()
        }
        assert set(rows) == {(10, 20), (10, 30)}
        r = rows[(10, 20)]
        # N=3 baskets, c(10)=3, c(20)=2, pair_n=2 -> lift = 6/6 = 1
        assert r["pair_n"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
        assert r["lift_num"] == 6 and r["lift_den"] == 6
        r = rows[(10, 30)]
        assert r["pair_n"] == 1 and r["lift_num"] == 3 and r["lift_den"] == 3


class TestUserHourOhlc:
    def test_tie_rules_and_extremes(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_hour_ohlc

        h0 = 1_000_000 * 3600 * 500_000  # an arbitrary whole hour in us
        ts = [h0, h0, h0 + 60_000_000, h0 + 120_000_000, h0 + 120_000_000, h0]
        vals = [5.0, 3.0, 9.0, 7.0, 8.0, None]
        t = pa.table(
            {
                "event_id": pa.array(list(range(1, 7)), pa.int64()),
                "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
                "user_id": pa.array([1] * 6, pa.int64()),
                "event_type": pa.array(["click"] * 6, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 6, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = user_hour_ohlc(str(tmp_path)).take_all()
        assert len(rows) == 1
        r = rows[0]
        # open: min value among min-ts rows (5.0 vs 3.0 -> 3.0); close: max
        # value among max-ts rows (7.0 vs 8.0 -> 8.0); NULL value excluded
        assert r["n"] == 5
        assert r["open_cents"] == 300 and r["close_cents"] == 800
        assert r["low_cents"] == 300 and r["high_cents"] == 900


class TestUserValueCusum:
    def test_clamp_recursion(self, ray_session, tmp_path):
        """The closed window form must equal the textbook recursion
        S_i = max(0, S_{i-1} + x_i - k)."""
        from ocr_ray.ops.timeseries import (
            _CUSUM_ALARM_CENTS,
            _CUSUM_DRIFT_CENTS,
            user_value_cusum,
        )

        vals = [10.0, 2.0, 200.0, 1.0, 1.0, 300.0]
        t = pa.table(
            {
                "event_id": pa.array(list(range(1, 7)), pa.int64()),
                "ts": pa.array(
                    np.arange(6, dtype=np.int64) * 1_000_000, pa.timestamp("us")
                ),
                "user_id": pa.array([1] * 6, pa.int64()),
                "event_type": pa.array(["click"] * 6, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 6, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {r["event_id"]: r for r in user_value_cusum(str(tmp_path)).take_all()}
        s = 0
        for i, v in enumerate(vals, start=1):
            s = max(0, s + int(round(v * 100)) - _CUSUM_DRIFT_CENTS)
            assert rows[i]["cusum_cents"] == s, (i, s, rows[i])
            assert rows[i]["alarm"] == (s > _CUSUM_ALARM_CENTS)


class TestShipDelayBusinessDays:
    def test_known_calendar(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import ship_delay_business_days

        # 2024-01-05 is a Friday; 2024-01-08 the following Monday.
        import datetime as dt

        def us(y, m, d):
            return int(dt.datetime(y, m, d).timestamp() * 1e6)

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["F", "F"], pa.string()),
                "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
                "o_orderdate": pa.array(
                    np.array([us(2024, 1, 5), us(2024, 1, 1)], np.int64),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1"] * 2, pa.string()),
            }
        )
        li = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_shipdate": pa.array(
                    np.array(
                        [us(2024, 1, 8), us(2024, 1, 5), us(2024, 1, 8)], np.int64
                    ),
                    pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        rows = {
            r["business_days"]: r["n_lineitems"]
            for r in ship_delay_business_days(str(tmp_path)).take_all()
        }
        # Fri -> Mon crosses a weekend: exactly 1 business day; same-day: 0;
        # Mon Jan 1 -> Mon Jan 8: 5 business days
        assert rows == {1: 1, 0: 1, 5: 1}


class TestEventsValueHistogram:
    def test_edges_and_overflow(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import events_value_histogram

        vals = [-0.01, 0.0, 49.99, 50.0, 999.99, 1000.0, 5000.0, None]
        n = len(vals)
        t = pa.table(
            {
                "event_id": pa.array(list(range(n)), pa.int64()),
                "ts": pa.array(np.zeros(n, np.int64), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {r["bin"]: r for r in events_value_histogram(str(tmp_path)).take_all()}
        assert rows[-1]["n"] == 1 and rows[-1]["lo_cents"] is None
        assert rows[0]["n"] == 2 and rows[0]["lo_cents"] == 0  # [0, 50)
        assert rows[1]["n"] == 1 and rows[1]["lo_cents"] == 5000  # [50, 100)
        assert rows[19]["n"] == 1  # [950, 1000)
        assert rows[20]["n"] == 2 and rows[20]["lo_cents"] is None  # overflow


class TestDocsLineage:
    def test_shard_attribution(self, ray_session, tmp_path):
        """Provenance column routes every row back to its source file."""
        from ocr_ray.sources.readers import read_parquet_with_lineage

        a = tmp_path / "a.parquet"
        b = tmp_path / "b.parquet"
        pq.write_table(
            pa.table({"doc_id": pa.array([1, 2], pa.int64())}), str(a)
        )
        pq.write_table(
            pa.table({"doc_id": pa.array([3], pa.int64())}), str(b)
        )
        rows = read_parquet_with_lineage([str(a), str(b)]).take_all()
        got = {r["doc_id"]: r["shard"] for r in rows}
        assert got == {1: "a.parquet", 2: "a.parquet", 3: "b.parquet"}


class TestOrderPriceRuns:
    def test_boundary_stitching(self, ray_session, tmp_path):
        """Chunks are 32-day date buckets; dates spanning several buckets
        exercise the cross-chunk run merge."""
        import datetime as dt

        from ocr_ray.ops.stats import order_price_runs

        def us(y, m, d):
            return int(dt.datetime(y, m, d).timestamp() * 1e6)

        # dates across 4 months -> >= 3 chunk boundaries; prices give the
        # sign sequence (vs lower median) laid out to continue runs across
        # boundaries. values: [1,1,9,9,5,9,1,1] (median=1 lower): signs of
        # non-median... median of 8 values sorted [1,1,1,1,5,9,9,9] lower
        # median (rank 4) = 1 -> drop the four 1s, keep [9,9,5,9] signs
        # [1,1,1,1] -> 1 run, above=4, below=0
        prices = [1.0, 1.0, 9.0, 9.0, 5.0, 9.0, 1.0, 1.0]
        dates = [
            us(2024, 1, 1), us(2024, 1, 2), us(2024, 2, 5), us(2024, 2, 20),
            us(2024, 3, 10), us(2024, 4, 1), us(2024, 4, 2), us(2024, 4, 3),
        ]
        t = pa.table(
            {
                "o_orderkey": pa.array(list(range(1, 9)), pa.int64()),
                "o_custkey": pa.array([1] * 8, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 8, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(np.array(dates, np.int64), pa.timestamp("us")),
                "o_orderpriority": pa.array(["1"] * 8, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        r = order_price_runs(str(tmp_path)).to_pylist()[0]
        assert r == {"n_above": 4, "n_below": 0, "n_runs": 1}

    def test_alternation(self, ray_session, tmp_path):
        import datetime as dt

        from ocr_ray.ops.stats import order_price_runs

        def us(d):
            return int(dt.datetime(2024, 1, d).timestamp() * 1e6)

        # values [1,9,1,9,1] -> median 1; dropping the 1s leaves [9,9]
        # adjacent -> 1 run. Add a below-median value: use even spread
        # [1,9,2,9,2,9] sorted [1,2,2,9,9,9] lower median (rank 3) = 2 ->
        # drop the 2s: [1,9,9,9] signs [0,1,1,1] -> 2 runs, above=3 below=1
        prices = [1.0, 9.0, 2.0, 9.0, 2.0, 9.0]
        t = pa.table(
            {
                "o_orderkey": pa.array(list(range(1, 7)), pa.int64()),
                "o_custkey": pa.array([1] * 6, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 6, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(
                    np.array([us(d) for d in range(1, 7)], np.int64), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1"] * 6, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        r = order_price_runs(str(tmp_path)).to_pylist()[0]
        assert r == {"n_above": 3, "n_below": 1, "n_runs": 2}


class TestMovingMedian:
    def test_window_rules(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_value_moving_median

        vals = [5.0, 1.0, 9.0, 4.0, 7.0]
        t = pa.table(
            {
                "event_id": pa.array(list(range(1, 6)), pa.int64()),
                "ts": pa.array(
                    np.arange(5, dtype=np.int64) * 1_000_000, pa.timestamp("us")
                ),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["click"] * 5, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {
            r["event_id"]: r["med3_cents"]
            for r in user_value_moving_median(str(tmp_path)).take_all()
        }
        # windows: [5] [5,1] [5,1,9] [1,9,4] [9,4,7] -> 500, 100, 500, 400, 700
        assert rows == {1: 500, 2: 100, 3: 500, 4: 400, 5: 700}


class TestUserValueScaled:
    def test_fixed_point_and_constant_series(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import user_value_scaled

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array(np.zeros(5, np.int64), pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["click"] * 5, pa.string()),
                "value": pa.array([0.0, 5.0, 10.0, 3.0, 3.0], pa.float64()),
                "props": pa.array(["{}"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {
            r["event_id"]: r["scaled_e6"] for r in user_value_scaled(str(tmp_path)).take_all()
        }
        assert rows[1] == 0 and rows[2] == 500_000 and rows[3] == 1_000_000
        # constant series: span 0 -> scaled 0 for every row
        assert rows[4] == 0 and rows[5] == 0


class TestTypeDowMatrix:
    def test_zero_fill_and_null_type_dimension(self, ray_session, tmp_path):
        import datetime as dt

        from ocr_ray.ops.olap import type_dow_matrix

        # 2024-01-01 is a Monday (dow 0); 2024-01-06 a Saturday (dow 5)
        def us(d):
            return int(dt.datetime(2024, 1, d).timestamp() * 1e6)

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    np.array([us(1), us(1), us(6)], np.int64), pa.timestamp("us")
                ),
                "user_id": pa.array([1] * 3, pa.int64()),
                "event_type": pa.array(["click", None, "click"], pa.string()),
                "value": pa.array([1.0] * 3, pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {
            (r["event_type"], r["dow"]): r["n"]
            for r in type_dow_matrix(str(tmp_path)).take_all()
        }
        # dense: 2 types (click, NULL) x 7 dows
        assert len(rows) == 14
        assert rows[("click", 0)] == 1 and rows[("click", 5)] == 1
        assert rows[(None, 0)] == 1
        assert rows[("click", 3)] == 0 and rows[(None, 6)] == 0


class TestJoinViewRefresh:
    def test_delta_refresh_equals_recompute(self, ray_session, tmp_path):
        """Folding the delta into a standing view == one-shot full join,
        for any base/delta split of the fact table."""
        import ray.data as rd

        from ocr_ray.functions.joins import auto_join
        from ocr_ray.ops.incremental import join_view_refresh

        facts = pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "cust": pa.array([10, 10, 20, 30, None], pa.int64()),
            }
        )
        dim = pa.table(
            {
                "c": pa.array([10, 20], pa.int64()),
                "name": pa.array(["a", "b"], pa.string()),
            }
        )
        full = auto_join(
            rd.from_arrow(facts), rd.from_arrow(dim), on="cust", right_on="c"
        ).take_all()
        for cut in (1, 3):
            base = rd.from_arrow(facts.slice(0, cut))
            delta = rd.from_arrow(facts.slice(cut))
            view = auto_join(base, rd.from_arrow(dim), on="cust", right_on="c")
            got = join_view_refresh(
                view, delta, rd.from_arrow(dim), on="cust", right_on="c"
            ).take_all()
            key = lambda r: (r["k"], r["cust"])  # noqa: E731
            assert sorted(got, key=key) == sorted(full, key=key)
        # inner join: NULL cust and unmatched cust (30) rows are absent
        assert {r["k"] for r in full} == {1, 2, 3}


class TestPurchasesInSessions:
    def test_coverage_and_session_attribution(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import purchases_in_sessions

        M = 60_000_000  # one minute in us
        # user 1: session A = clicks at 0, 10min; session B = click at 2h.
        # purchases: 5min (inside A), 40min (between sessions), 2h+1min
        # (inside B). user 2: purchase with no events at all -> uncovered.
        rows = [
            (1, 1, 0 * M, "click"),
            (2, 1, 10 * M, "view"),
            (3, 1, 120 * M, "click"),
            (10, 1, 5 * M, "purchase"),
            (11, 1, 40 * M, "purchase"),
            (12, 1, 120 * M, "purchase"),  # boundary: exactly at B's only tick
            (20, 2, 7 * M, "purchase"),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[2] for r in rows], np.int64), pa.timestamp("us")
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = {
            r["event_id"]: r for r in purchases_in_sessions(str(tmp_path)).take_all()
        }
        assert set(got) == {10, 11, 12, 20}
        assert got[10]["covered"] and got[10]["session_start"].timestamp() == 0
        assert not got[11]["covered"] and got[11]["session_start"] is None
        assert got[12]["covered"] and got[12]["session_start"].timestamp() == 7200
        assert not got[20]["covered"]


class TestBitemporalAsof:
    def test_two_clock_visibility(self, ray_session, tmp_path):
        """Revision wins only when BOTH clocks admit it; rows whose valid
        time starts after the query's valid point vanish entirely."""
        import datetime as dt

        from ocr_ray.sources.evolving import orders_bitemporal_asof

        def us(y, m, d):
            return int(dt.datetime(y, m, d).timestamp() * 1e6)

        # keys % 3 == 0 get a revision (+5d valid, +10d tx, +500 cents)
        keys = [1, 3, 6, 9]
        dates = [us(1998, 1, 1), us(1998, 6, 20), us(1998, 6, 28), us(1998, 7, 10)]
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 4, pa.string()),
                "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
                "o_orderdate": pa.array(np.array(dates, np.int64), pa.timestamp("us")),
                "o_orderpriority": pa.array(["1"] * 4, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = {
            r["o_orderkey"]: r for r in orders_bitemporal_asof(str(tmp_path)).take_all()
        }
        # order 1: no revision -> original price
        assert got[1]["price_cents"] == 1000
        # order 3 (Jun 20): revision valid Jun 25 <= V, tx Jun 30 <= T -> wins
        assert got[3]["price_cents"] == 2500
        # order 6 (Jun 28): revision valid Jul 3 > V (Jun 30) -> original
        assert got[6]["price_cents"] == 3000
        # order 9 (Jul 10): original valid after V -> absent entirely
        assert 9 not in got


class TestNationSupplierHhi:
    def test_monopoly_and_split_markets(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import nation_supplier_hhi

        supp = pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["a", "b", "c"], pa.string()),
                "s_nationkey": pa.array([10, 20, 20], pa.int32()),
                "s_acctbal": pa.array([0.0] * 3, pa.float64()),
            }
        )
        li = pa.table(
            {
                "l_suppkey": pa.array([1, 2, 3, 3], pa.int64()),
                "l_extendedprice": pa.array([100.0, 300.0, 100.0, 200.0], pa.float64()),
            }
        )
        pq.write_table(supp, str(tmp_path / "supplier.parquet"))
        pq.write_table(li, str(tmp_path / "lineitem.parquet"))
        rows = {r["s_nationkey"]: r for r in nation_supplier_hhi(str(tmp_path)).take_all()}
        # nation 10: one supplier -> HHI = 1 (num == den)
        assert rows[10]["n_suppliers"] == 1
        assert rows[10]["hhi_num"] == rows[10]["hhi_den"] == 100 * 100
        # nation 20: suppliers with $300 and $300 -> HHI = 1/2
        r = rows[20]
        assert r["n_suppliers"] == 2
        assert r["hhi_num"] * 2 == r["hhi_den"]


class TestOrdersRuleViolations:
    def test_planted_contract_breaks(self, ray_session, tmp_path):
        import datetime as dt

        from ocr_ray.ops.dq import orders_rule_violations

        def us(y):
            return int(dt.datetime(y, 6, 1).timestamp() * 1e6)

        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([1, None, 3, 4, 5], pa.int64()),
                "o_orderstatus": pa.array(["F", "X", None, "O", "P"], pa.string()),
                "o_totalprice": pa.array([10.0, -5.0, None, 20.0, 30.0], pa.float64()),
                "o_orderdate": pa.array(
                    np.array([us(1995), us(1970), us(2099), us(2000), us(2001)], np.int64),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        rows = {r["rule"]: r for r in orders_rule_violations(str(tmp_path)).take_all()}
        assert rows["totalprice_nonneg"]["n_violations"] == 1  # NULL passes
        assert rows["status_enum"]["n_violations"] == 1  # 'X'; NULL passes
        assert rows["orderdate_bounds"]["n_violations"] == 2  # 1970 + 2099
        assert rows["custkey_present"]["n_violations"] == 1
        assert all(r["n_rows"] == 5 for r in rows.values())


class TestConversionSurvival:
    def test_km_table(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_conversion_survival

        H = 3_600_000_000
        # u1: click at 0, purchase at 2h -> event at t=2
        # u2: click at 0, no purchase, last activity 5h -> censored at t=5
        # u3: purchase BEFORE any click (1h), click at 2h, last 4h ->
        #     the pre-click purchase must NOT count; censored at t=2
        # u4: no click at all -> never enters the risk set
        rows = [
            (1, 0, "click"), (1, 2 * H, "purchase"),
            (2, 0, "click"), (2, 5 * H, "view"),
            (3, 1 * H, "purchase"), (3, 2 * H, "click"), (3, 4 * H, "view"),
            (4, 0, "purchase"),
        ]
        t = pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array(np.array([r[1] for r in rows], np.int64), pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = {r["t_hours"]: r for r in user_conversion_survival(str(tmp_path)).take_all()}
        # t=2: u1 converts, u3 censored (last 4h - click 2h = 2h); risk = all 3
        assert got[2] == {"t_hours": 2, "n_risk": 3, "n_events": 1, "n_censored": 1}
        # t=5: only u2 remains
        assert got[5] == {"t_hours": 5, "n_risk": 1, "n_events": 0, "n_censored": 1}
        assert set(got) == {2, 5}


class TestUserEventPattern:
    def test_motif_counting(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_event_pattern

        # u1 sequence: c v v p c p o c p -> 'cv*p' matches 3 times
        # u2: v p c v (no complete motif) -> 0; NULL type maps to 'o'
        seq1 = ["click", "view", "view", "purchase", "click", "purchase",
                None, "click", "purchase"]
        seq2 = ["view", "purchase", "click", "view"]
        types = seq1 + seq2
        users = [1] * len(seq1) + [2] * len(seq2)
        t = pa.table(
            {
                "event_id": pa.array(list(range(len(types))), pa.int64()),
                "ts": pa.array(
                    np.arange(len(types), dtype=np.int64) * 1_000_000,
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([1.0] * len(types), pa.float64()),
                "props": pa.array(["{}"] * len(types), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        rows = {r["user_id"]: r for r in user_event_pattern(str(tmp_path)).take_all()}
        assert rows[1]["n_matches"] == 3 and rows[1]["seq_len"] == 9
        assert rows[2]["n_matches"] == 0 and rows[2]["seq_len"] == 4


class TestSaltedHashJoin:
    def test_hot_key_equality(self, ray_session):
        """A pathologically hot key (half of all rows) joins identically
        through the salted path and the plain hash join."""
        import ray.data as rd

        from ocr_ray.functions.joins import hash_join, salted_hash_join

        n = 2000
        keys = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 50)
        left = pa.table(
            {
                "k": pa.array(keys.astype(np.int64)),
                "v": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
        right = pa.table(
            {
                "rk": pa.array(np.arange(50, dtype=np.int64)),
                "name": pa.array([f"n{i}" for i in range(50)], pa.string()),
            }
        )
        a = salted_hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk", salts=4
        ).take_all()
        b = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk"
        ).take_all()
        key = lambda r: (r["k"], r["v"])  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)
        assert len(a) == n  # every left row matched exactly once


class TestPurchaseClickPressure:
    def test_window_boundaries(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import purchase_click_pressure

        M = 60_000_000
        H = 60 * M
        # clicks at 0, 30min, 61min; purchase at 61min: window (1min, 61min]
        # -> clicks at 30min and 61min count, the one at 0 is exactly W old
        # and falls OUT of the half-open window; purchase at 2h: only the
        # 61-min click is within (60min, 120min]
        rows = [
            (1, 0, "click"), (2, 30 * M, "click"), (3, 61 * M, "click"),
            (10, 61 * M, "purchase"), (11, 120 * M, "purchase"),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(np.array([r[1] for r in rows], np.int64), pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = {r["event_id"]: r["clicks_1h"] for r in purchase_click_pressure(str(tmp_path)).take_all()}
        assert got == {10: 2, 11: 1}


class TestEmbeddingQuantize:
    def test_codes_and_constant_dim(self, ray_session, tmp_path):
        from ocr_ray.ops.ann import embedding_quantize_int8

        vecs = [[0.0, 5.0, 0.25], [1.0, 5.0, 0.75], [0.5, 5.0, -0.25]]
        t = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        rows = {
            (r["vec_id"], r["dim"]): r["code"]
            for r in embedding_quantize_int8(str(tmp_path)).take_all()
        }
        # dim 0 spans [0,1]: codes 0 / 255 / 127 ((500000-0)*255//1000000)
        assert rows[(0, 0)] == 0 and rows[(1, 0)] == 255 and rows[(2, 0)] == 127
        # dim 1 constant -> 0 everywhere
        assert rows[(0, 1)] == rows[(1, 1)] == rows[(2, 1)] == 0
        # dim 2 spans [-0.25, 0.75]: 0.25 -> (500000)*255//1000000 = 127
        assert rows[(2, 2)] == 0 and rows[(1, 2)] == 255 and rows[(0, 2)] == 127


class TestKfoldStratified:
    def test_balanced_within_stratum(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import doc_kfold_stratified

        # 12 'en' docs, 3 'fr', 2 NULL-lang: per stratum fold counts must
        # be balanced to within one
        langs = ["en"] * 12 + ["fr"] * 3 + [None] * 2
        sf = _write_docs(
            tmp_path, ids=list(range(1, len(langs) + 1)), texts=["x"] * len(langs)
        )
        import pyarrow.parquet as pq2

        t = pq2.read_table(str(tmp_path / "documents.parquet"))
        t = t.set_column(
            t.schema.get_field_index("lang"), "lang", pa.array(langs, pa.string())
        )
        pq2.write_table(t, str(tmp_path / "documents.parquet"))
        rows = doc_kfold_stratified(sf).take_all()
        from collections import Counter

        for lang in ("en", "fr", None):
            counts = Counter(r["fold"] for r in rows if r["lang"] == lang)
            vals = [counts.get(f, 0) for f in range(5)]
            assert max(vals) - min(vals) <= 1, (lang, vals)
        assert len(rows) == len(langs)


class TestProportionalSample:
    def test_largest_remainder_allocation(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import docs_proportional_sample

        # strata: 60 en / 30 fr / 10 de; k=50 -> exact shares 30/15/5
        langs = ["en"] * 60 + ["fr"] * 30 + ["de"] * 10
        sf = _write_docs(
            tmp_path, ids=list(range(1, 101)), texts=["x"] * 100
        )
        import pyarrow.parquet as pq2

        t = pq2.read_table(str(tmp_path / "documents.parquet"))
        t = t.set_column(
            t.schema.get_field_index("lang"), "lang", pa.array(langs, pa.string())
        )
        pq2.write_table(t, str(tmp_path / "documents.parquet"))
        from collections import Counter

        rows = docs_proportional_sample(sf).take_all()
        got = Counter(r["lang"] for r in rows)
        assert got == {"en": 30, "fr": 15, "de": 5}
        assert len(rows) == 50

    def test_remainder_distribution_sums_to_k(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import docs_proportional_sample

        # 7/5/3 over k=50: exact shares 23.33/16.67/10 -> largest remainder
        # hands the two leftover units to the biggest remainders
        langs = ["a"] * 7 + ["b"] * 5 + ["c"] * 3
        sf = _write_docs(tmp_path, ids=list(range(1, 16)), texts=["x"] * 15)
        import pyarrow.parquet as pq2

        t = pq2.read_table(str(tmp_path / "documents.parquet"))
        t = t.set_column(
            t.schema.get_field_index("lang"), "lang", pa.array(langs, pa.string())
        )
        pq2.write_table(t, str(tmp_path / "documents.parquet"))
        rows = docs_proportional_sample(sf).take_all()
        # every stratum smaller than its quota contributes everything
        assert len(rows) == 15


class TestStumpTrain:
    def test_perfect_split_found(self, ray_session, tmp_path):
        """All purchases above $5, all clicks at/below -> the stump finds
        the exact boundary with a pure split."""
        from ocr_ray.ops.mlprep import stump_train_events

        vals = [1.0, 2.0, 5.0, 6.0, 7.0, 8.0]
        types = ["click", "click", "click", "purchase", "purchase", "purchase"]
        t = pa.table(
            {
                "event_id": pa.array(list(range(6)), pa.int64()),
                "ts": pa.array(np.zeros(6, np.int64), pa.timestamp("us")),
                "user_id": pa.array([1] * 6, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 6, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        r = stump_train_events(str(tmp_path)).take_all()[0]
        assert r == {
            "threshold_cents": 500, "n_left": 3, "p_left": 0,
            "n_right": 3, "p_right": 3,
        }

    def test_degenerate_single_value(self, ray_session, tmp_path):
        from ocr_ray.ops.mlprep import stump_train_events

        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(np.zeros(2, np.int64), pa.timestamp("us")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["click", "purchase"], pa.string()),
                "value": pa.array([3.0, 3.0], pa.float64()),
                "props": pa.array(["{}"] * 2, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        assert stump_train_events(str(tmp_path)).take_all() == []


class TestAbcClasses:
    def test_pareto_cuts(self, ray_session, tmp_path):
        from ocr_ray.ops.olap import cust_abc_classes

        # spends 70/10/10/5/5 of total 100: cumulative 70, 80, 90, 95, 100
        # -> A (<=80): custs 1,2; B (<=95): 3,4; C: 5
        spends = [70.0, 10.0, 10.0, 5.0, 5.0]
        t = pa.table(
            {
                "o_orderkey": pa.array(list(range(1, 6)), pa.int64()),
                "o_custkey": pa.array(list(range(1, 6)), pa.int64()),
                "o_orderstatus": pa.array(["F"] * 5, pa.string()),
                "o_totalprice": pa.array(spends, pa.float64()),
                "o_orderdate": pa.array(np.zeros(5, np.int64), pa.timestamp("us")),
                "o_orderpriority": pa.array(["1"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = {r["o_custkey"]: r["abc"] for r in cust_abc_classes(str(tmp_path)).take_all()}
        assert got == {1: "A", 2: "A", 3: "B", 4: "B", 5: "C"}
