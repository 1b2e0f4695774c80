"""Planted-input tests for the session-12 op batch: lag-1 autocorrelation,
cross-table join-size estimate (exact + AMS sketch sibling), per-user burst
profile, A/B experiment readout, and seasonal-naive forecast scoring."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s) if s is not None else None


def _write_events(dirpath, rows):
    """rows: list of (event_id, sec_or_None, user_id, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(dirpath / "events.parquet"))
    return str(dirpath)


class TestUserValueAutocorr:
    def test_planted_series(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import user_value_autocorr

        sf = _write_events(
            tmp_path,
            [
                # user 1: 1, 2, 3 in time order -> perfectly linear lag pairs
                (3, 2, 1, 3.0),
                (1, 0, 1, 1.0),
                (2, 1, 1, 2.0),
                # user 2: alternating 1, 3, 1, 3 -> negative serial dependence
                (4, 0, 2, 1.0),
                (5, 1, 2, 3.0),
                (6, 2, 2, 1.0),
                (7, 3, 2, 3.0),
                # user 3: single event -> no pair, no row
                (8, 0, 3, 9.0),
                # user 4: second event has NULL value -> excluded, no pair
                (9, 0, 4, 1.0),
                (10, 1, 4, None),
                # NULL user / ts / event_id rows excluded entirely
                (11, 0, None, 1.0),
                (12, None, 1, 1.0),
                (None, 5, 1, 1.0),
            ],
        )
        rows = {r["user_id"]: r for r in user_value_autocorr(sf).take_all()}
        assert set(rows) == {1, 2}
        # user 1 pairs (100,200),(200,300) cents
        assert rows[1] == {
            "user_id": 1,
            "n_pairs": 2,
            "ac_num": 2 * (100 * 200 + 200 * 300) - (100 + 200) * (200 + 300),
            "ac_den_x": 2 * (100 * 100 + 200 * 200) - 300 * 300,
            "ac_den_y": 2 * (200 * 200 + 300 * 300) - 500 * 500,
        }
        assert rows[1]["ac_num"] == rows[1]["ac_den_x"] == rows[1]["ac_den_y"] > 0
        # user 2 pairs (100,300),(300,100),(100,300): anti-correlated
        assert rows[2]["n_pairs"] == 3 and rows[2]["ac_num"] < 0

    def test_order_is_ts_then_event_id(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import user_value_autocorr

        # same-second events order by event_id: series is 1, 5, 2 (NOT 1, 2, 5)
        sf = _write_events(
            tmp_path, [(1, 0, 7, 1.0), (3, 1, 7, 2.0), (2, 1, 7, 5.0)]
        )
        (r,) = user_value_autocorr(sf).take_all()
        # pairs (100,500),(500,200)
        assert r["n_pairs"] == 2
        assert r["ac_num"] == 2 * (100 * 500 + 500 * 200) - 600 * 700


class TestOrdersEventsJoinSize:
    def test_planted_counts(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import orders_events_join_size

        t = pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
                "o_custkey": pa.array([1, 1, 2, 3, None], pa.int64()),
                "o_totalprice": pa.array([1.0] * 5, pa.float64()),
                "o_orderdate": pa.array([dt.date(2024, 1, 1)] * 5),
                "o_orderstatus": pa.array(["F"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        _write_events(
            tmp_path,
            [
                (1, 0, 1, 1.0),
                (2, 1, 2, 1.0),
                (3, 2, 2, 1.0),
                (4, 3, 2, 1.0),
                (5, 4, None, 1.0),
                (6, 5, 9, 1.0),
            ],
        )
        (r,) = orders_events_join_size(str(tmp_path)).to_pylist()
        # lo = {1:2, 2:1, 3:1}; re = {1:1, 2:3, 9:1}
        assert r == {
            "est_rows": 2 * 1 + 1 * 3,
            "n_keys_orders": 3,
            "n_keys_events": 3,
            "n_keys_both": 2,
            "top_key_rows": 3,
        }

    def test_empty_overlap(self, ray_session, tmp_path):
        from ocr_ray.ops.stats import orders_events_join_size

        t = pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([100], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        _write_events(tmp_path, [(1, 0, 200, 1.0)])
        (r,) = orders_events_join_size(str(tmp_path)).to_pylist()
        assert r["est_rows"] == 0 and r["n_keys_both"] == 0 and r["top_key_rows"] == 0


class TestUserBurstProfile:
    def test_planted_burst(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_burst_profile

        # user 1: hours 0..3 hold 1,1,1,9 events -> hour 3 is a burst
        # (9 >= 2 and 9*4 >= 2*12); user 2: uniform 2,2 -> 2*2 < 2*4 fails
        rows = []
        eid = 0
        for h, k in ((0, 1), (1, 1), (2, 1), (3, 9)):
            for i in range(k):
                eid += 1
                rows.append((eid, h * 3600 + i, 1, 1.0))
        for h, k in ((0, 2), (1, 2)):
            for i in range(k):
                eid += 1
                rows.append((eid, h * 3600 + i, 2, 1.0))
        sf = _write_events(tmp_path, rows)
        got = {r["user_id"]: r for r in user_burst_profile(sf).take_all()}
        assert got[1] == {
            "user_id": 1,
            "n_events": 12,
            "n_active_hours": 4,
            "max_hour_events": 9,
            "n_burst_hours": 1,
        }
        assert got[2]["n_burst_hours"] == 0 and got[2]["max_hour_events"] == 2

    def test_exact_boundary(self, ray_session, tmp_path):
        from ocr_ray.ops.timeseries import user_burst_profile

        # hours (3, 3, 3, 9): the 9-hour sits EXACTLY at the threshold
        # (9 * 4 active hours = 36 == 2 * 18 total events) and must count
        rows = []
        eid = 0
        for h, k in ((0, 3), (1, 3), (2, 3), (3, 9)):
            for i in range(k):
                eid += 1
                rows.append((eid, h * 3600 + i, 5, 1.0))
        sf = _write_events(tmp_path, rows)
        (r,) = user_burst_profile(sf).take_all()
        assert r["n_burst_hours"] == 1  # >= is inclusive at the boundary


class TestJoinSizeAms:
    def test_tracks_exact_sibling_at_sf(self, ray_session):
        from ocr_ray.ops.stats import (
            orders_events_join_size,
            orders_events_join_size_ams,
        )

        sf = "/root/testdata/sf0.001"
        exact = orders_events_join_size(sf).column("est_rows")[0].as_py()
        est = orders_events_join_size_ams(sf).column("join_size_est")[0].as_py()
        assert exact > 0
        # AMS with 4 groups of 32 counters: generous 60% relative band
        assert abs(est - exact) <= max(0.6 * exact, 50)

    def test_disjoint_sides_estimate_near_zero(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        from ocr_ray.ops.stats import orders_events_join_size_ams

        t = pa.table(
            {
                "o_orderkey": pa.array(list(range(100)), pa.int64()),
                "o_custkey": pa.array([10_000 + i for i in range(100)], pa.int64()),
            }
        )
        pq_.write_table(t, str(tmp_path / "orders.parquet"))
        _write_events(tmp_path, [(i, i, i % 50, 1.0) for i in range(1, 300)])
        est = (
            orders_events_join_size_ams(str(tmp_path))
            .column("join_size_est")[0]
            .as_py()
        )
        # true join size is 0; sketch noise is bounded by the sides' masses
        assert abs(est) < 300


class TestEventsAbLift:
    def test_planted_assignment_and_conversion(self, ray_session, tmp_path):
        import hashlib

        from ocr_ray.ops.stats import events_ab_lift

        # choose ids with known variants from the same md5 rule
        def variant(u):
            return 1 if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) >= 8 else 0

        v0 = [u for u in range(1, 50) if variant(u) == 0][:3]
        v1 = [u for u in range(1, 50) if variant(u) == 1][:3]
        rows, eid = [], 0
        for u in v0 + v1:
            eid += 1
            rows.append((eid, eid, u, 1.0))  # a click for every user
        # first user of each variant converts; v1's purchase has NULL value
        rows.append((100, 100, v0[0], 2.5))
        rows.append((101, 101, v1[0], None))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(
                    ["click"] * 6 + ["purchase", "purchase"], pa.string()
                ),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = {r["variant"]: r for r in events_ab_lift(str(tmp_path)).to_pylist()}
        assert out[0] == {
            "variant": 0, "n_users": 3, "n_converted": 1, "revenue_cents": 250,
        }
        # NULL-value purchase converts but adds no revenue
        assert out[1] == {
            "variant": 1, "n_users": 3, "n_converted": 1, "revenue_cents": 0,
        }


class TestNaiveForecastError:
    def test_gap_month_forecasts_from_last_observed(self, ray_session, tmp_path):
        from ocr_ray.pipelines.relational import orders_naive_forecast_error

        # months 2024-01 (100.00), 2024-02 (150.00), 2024-04 (90.00): the
        # gap (no March) means April forecasts from February
        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
                "o_totalprice": pa.array([60.0, 40.0, 150.0, 90.0], pa.float64()),
                "o_orderdate": pa.array(
                    [
                        dt.date(2024, 1, 10),
                        dt.date(2024, 1, 20),
                        dt.date(2024, 2, 5),
                        dt.date(2024, 4, 1),
                    ]
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        rows = {(r["y"], r["m"]): r for r in orders_naive_forecast_error(str(tmp_path)).to_pylist()}
        assert set(rows) == {(2024, 2), (2024, 4)}
        assert rows[(2024, 2)]["forecast_cents"] == 10000
        assert rows[(2024, 2)]["abs_err_cents"] == 5000
        assert rows[(2024, 4)]["forecast_cents"] == 15000
        assert rows[(2024, 4)]["abs_err_cents"] == 6000
