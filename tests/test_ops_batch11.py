"""Planted-input tests for the session-10 op batch: exact-integer EWMA,
nearest-either as-of, grouped exactly-k sample, distinct-overlap census +
KMV sketch, key-skew profile, INTERSECT ALL bag semantics."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(dirpath, **cols):
    n = max(len(v) for v in cols.values())
    base = {
        "event_id": pa.array(cols.get("event_id", list(range(1, n + 1))), pa.int64()),
        "ts": pa.array(
            np.asarray(cols.get("ts_us", [i * 1_000_000 for i in range(n)]), dtype=np.int64),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(cols.get("user_id", [1] * n), pa.int64()),
        "event_type": pa.array(cols.get("event_type", ["click"] * n), pa.string()),
        "value": pa.array(cols.get("value", [1.0] * n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }
    pq.write_table(pa.table(base), str(dirpath / "events.parquet"))
    return str(dirpath)


class TestUserValueEwma:
    def test_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_value_ewma

        # user 1: 100 then 200 cents; user 2: one NULL value (counts as 0)
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3],
            user_id=[1, 1, 2],
            value=[1.0, 2.0, None],
            ts_us=[1_000_000, 2_000_000, 1_000_000],
        )
        got = user_value_ewma(sf).to_pandas().sort_values("event_id").set_index("event_id")
        assert got.loc[1].tolist() == [100 * (1 << 15), 1 << 15]
        assert got.loc[2].tolist() == [200 * (1 << 15) + 100 * (1 << 14), (1 << 15) + (1 << 14)]
        assert got.loc[3].tolist() == [0, 1 << 15]

    def test_frame_cap_and_saturated_den(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_value_ewma

        n = 20  # longer than the 16-tap frame
        sf = _write_events(
            tmp_path,
            event_id=list(range(1, n + 1)),
            user_id=[7] * n,
            value=[1.0] * n,
            ts_us=[i * 1_000_000 for i in range(n)],
        )
        got = user_value_ewma(sf).to_pandas().sort_values("event_id")
        # saturated rows: every tap holds 100 cents -> num = 100*(2^16-1)
        sat = got.iloc[-1]
        assert sat["ewma_num"] == 100 * ((1 << 16) - 1)
        assert sat["ewma_den"] == (1 << 16) - 1
        # first row: only itself
        assert got.iloc[0]["ewma_den"] == 1 << 15


class TestPurchaseNearestClick:
    def test_directions_and_ties(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import purchase_nearest_click

        s = 1_000_000
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4, 5, 6, 7],
            user_id=[1, 1, 1, 2, 2, 3, 3],
            event_type=[
                "click", "purchase", "click",  # u1: clicks at 10s & 14s, purchase 13s
                "purchase", "click",           # u2: click only AFTER (20s vs 25s)
                "purchase", "view",            # u3: no clicks -> dropped
            ],
            ts_us=[10 * s, 13 * s, 14 * s, 20 * s, 25 * s, 30 * s, 31 * s],
        )
        got = purchase_nearest_click(sf).to_pandas().set_index("event_id")
        assert got.loc[2, "nearest_us"] == 1 * s  # forward click wins (14-13 < 13-10)
        assert got.loc[4, "nearest_us"] == 5 * s  # only a future click
        assert 6 not in got.index

    def test_same_ts_click_is_zero(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import purchase_nearest_click

        s = 1_000_000
        sf = _write_events(
            tmp_path,
            event_id=[1, 2],
            user_id=[1, 1],
            event_type=["click", "purchase"],
            ts_us=[5 * s, 5 * s],
        )
        got = purchase_nearest_click(sf).to_pandas().set_index("event_id")
        assert got.loc[2, "nearest_us"] == 0


class TestEventsExactKPerUser:
    def test_matches_md5_rank(self, tmp_path, ray_session):
        from ocr_ray.ops.mlprep import events_exact_k_per_user

        # user 1 has 10 events, user 2 has 2, user 3 has NULL id rows only
        ids = list(range(1, 13))
        users = [1] * 10 + [2] * 2
        sf = _write_events(tmp_path, event_id=ids, user_id=users)
        got = events_exact_k_per_user(sf, k=3).to_pandas()
        want = {}
        for eid, u in zip(ids, users):
            key = hashlib.md5(str(eid).encode()).hexdigest()[:16]
            want.setdefault(u, []).append((key, eid))
        expect = set()
        for u, pairs in want.items():
            for _, eid in sorted(pairs)[:3]:
                expect.add((eid, u))
        assert set(map(tuple, got[["event_id", "user_id"]].values.tolist())) == expect
        assert (got.groupby("user_id").size() <= 3).all()


class TestDistinctUserOverlap:
    def test_planted_counts(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import distinct_user_overlap, distinct_user_overlap_kmv

        # clicks: users 1..6; purchases: users 4..9 -> both = {4,5,6}
        users = list(range(1, 7)) + list(range(4, 10))
        types = ["click"] * 6 + ["purchase"] * 6
        sf = _write_events(tmp_path, user_id=users, event_type=types)
        got = distinct_user_overlap(sf).to_pandas().iloc[0]
        assert got.tolist() == [6, 6, 3]
        # KMV with unsaturated sketches is exact
        est = distinct_user_overlap_kmv(sf).to_pandas().iloc[0]
        assert est.tolist() == [6, 6, 3]

    def test_kmv_bound_at_volume(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import distinct_user_overlap_kmv

        # 5000 distinct clickers, 5000 distinct purchasers, 1000 overlap
        click_users = list(range(0, 5000))
        purch_users = list(range(4000, 9000))
        users = click_users + purch_users
        types = ["click"] * 5000 + ["purchase"] * 5000
        sf = _write_events(tmp_path, event_id=list(range(1, 10001)), user_id=users, event_type=types)
        est = distinct_user_overlap_kmv(sf).to_pandas().iloc[0]
        assert abs(est["users_click"] - 5000) / 5000 < 0.15
        assert abs(est["users_purchase"] - 5000) / 5000 < 0.15
        assert abs(est["users_both"] - 1000) / 1000 < 0.30

    def test_disjoint_sides(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import distinct_user_overlap, distinct_user_overlap_kmv

        sf = _write_events(
            tmp_path, user_id=[1, 2, 3, 4], event_type=["click", "click", "purchase", "purchase"]
        )
        assert distinct_user_overlap(sf).to_pandas().iloc[0].tolist() == [2, 2, 0]
        assert distinct_user_overlap_kmv(sf).to_pandas().iloc[0]["users_both"] == 0


class TestEventsKeySkew:
    def test_planted_distribution(self, tmp_path, ray_session):
        from ocr_ray.ops.dq import events_key_skew

        # 99 singleton users + one hot user with 101 rows -> 100 keys, 200 rows
        users = list(range(1, 100)) + [999] * 101
        sf = _write_events(tmp_path, event_id=list(range(1, 201)), user_id=users)
        got = events_key_skew(sf).to_pandas().iloc[0]
        assert got["n_keys"] == 100
        assert got["n_rows"] == 200
        assert got["max_size"] == 101
        assert got["top1_share_bp"] == 101 * 10000 // 200
        # ceil(0.99*100)=99 -> the 99th smallest size is 1 (hot key is rank 100)
        assert got["p99_size"] == 1


class TestClickViewUsersBag:
    def test_min_multiplicity_and_null_keys(self, tmp_path, ray_session):
        from ocr_ray.ops.olap import click_view_users_bag

        # user 1: 3 clicks / 2 views -> twice; user 2: clicks only -> absent
        # NULL user: 2 clicks / 1 view -> once (INTERSECT ALL pairs NULLs)
        users = [1, 1, 1, 1, 1, 2, 2, None, None, None]
        types = ["click", "click", "click", "view", "view", "click", "click", "click", "click", "view"]
        sf = _write_events(tmp_path, user_id=users, event_type=types)
        got = click_view_users_bag(sf).to_pandas()["user_id"]
        vals = sorted(got.fillna(-1).astype(int).tolist())
        assert vals == [-1, 1, 1]


class TestEventsSelfjoinSize:
    def test_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import events_selfjoin_size

        sf = _write_events(tmp_path, user_id=[1, 1, 1, 2, None])
        got = events_selfjoin_size(sf).to_pandas().iloc[0]
        assert got["n_rows"] == 4
        assert got["selfjoin_size"] == 9 + 1

    def test_ams_bound(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import events_selfjoin_size_ams

        # 1000 singletons + one hot key x50 -> F2 = 1000 + 2500 = 3500
        users = list(range(1, 1001)) + [5000] * 50
        sf = _write_events(tmp_path, event_id=list(range(1, 1051)), user_id=users)
        est = events_selfjoin_size_ams(sf, r=128).to_pandas().iloc[0]["selfjoin_size_est"]
        assert abs(est - 3500) / 3500 < 0.5, est


class TestUserActivityBitmask:
    def test_planted_mask_and_wrap(self, tmp_path, ray_session):
        from ocr_ray.ops.olap import user_activity_bitmask

        day = 86_400_000_000
        # user 1: days 0, 1, 0 (dup) -> mask 0b11; user 2: day 63 wraps to bit 0
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4],
            user_id=[1, 1, 1, 2],
            ts_us=[0, day, 1000, 63 * day],
        )
        got = user_activity_bitmask(sf).to_pandas().set_index("user_id")
        assert got.loc[1].tolist() == [3, 2]
        assert got.loc[2].tolist() == [1, 1]


class TestAnalyzeOrders:
    def test_planted_stats(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.dq import analyze_orders

        t = pa.table(
            {
                # 9 vs 10 pins NUMERIC min ordering (lexicographic would say "10")
                "o_orderkey": pa.array([9, 10, None], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": pa.array(["F", "O", "F"], pa.string()),
                "o_totalprice": pa.array([1.25, 1.25, None], pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.date(1995, 1, 2), datetime.date(1994, 12, 31), None]
                ),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH"], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = analyze_orders(str(tmp_path)).to_pandas().set_index("col_name")
        assert got.loc["o_orderkey"].tolist() == [3, 1, 2, "9", "10"]
        assert got.loc["o_custkey"].tolist() == [3, 0, 2, "1", "2"]
        assert got.loc["o_totalprice"].tolist() == [3, 1, 1, "125", "125"]
        assert got.loc["o_orderdate"].tolist() == [3, 1, 2, "1994-12-31", "1995-01-02"]
        assert got.loc["o_orderpriority"].tolist() == [3, 0, 2, "1-URGENT", "2-HIGH"]


class TestClicksUnconverted:
    def test_window_rule(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import clicks_unconverted

        h = 3_600_000_000
        s = 1_000_000
        # u1: click 0 -> purchase +30min (converted); click 10h -> purchase +2h (not)
        # u2: purchase BEFORE click only -> unconverted
        # u3: purchase at SAME ts -> strictly-after rule -> unconverted
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4, 5, 6, 7, 8],
            user_id=[1, 1, 1, 1, 2, 2, 3, 3],
            event_type=["click", "purchase", "click", "purchase",
                        "purchase", "click", "click", "purchase"],
            ts_us=[0, 1800 * s, 10 * h, 12 * h, 0, 5 * s, 7 * h, 7 * h],
        )
        got = sorted(clicks_unconverted(sf).to_pandas()["event_id"].tolist())
        assert got == [3, 6, 7]

    def test_boundary_inclusive(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import clicks_unconverted

        h = 3_600_000_000
        sf = _write_events(
            tmp_path,
            event_id=[1, 2],
            user_id=[1, 1],
            event_type=["click", "purchase"],
            ts_us=[0, h],  # exactly +1h -> converts (<=)
        )
        assert clicks_unconverted(sf).to_pandas().empty


class TestEmbeddingJlProject:
    def _write_emb(self, dirpath, vecs, ids=None):
        ids = ids or list(range(1, len(vecs) + 1))
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        )
        pq.write_table(t, str(dirpath / "embeddings.parquet"))
        return str(dirpath)

    def test_basis_vector_and_exclusions(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import _jl_signs, embedding_jl_project

        e0 = [1.0] + [0.0] * 63
        ragged = [1.0] * 32  # wrong dim -> excluded
        nanvec = [float("nan")] * 64  # quantizes to all-zero
        sf = self._write_emb(tmp_path, [e0, ragged, nanvec])
        got = embedding_jl_project(sf).to_pandas().set_index("vec_id")
        assert 2 not in got.index
        signs = _jl_signs()
        assert got.loc[1].tolist() == [int(1_000_000 * signs[0, j]) for j in range(8)]
        assert got.loc[3].tolist() == [0] * 8


class TestEventsTypeDowChi2:
    def test_independence_and_skew(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import events_type_dow_chi2

        day = 86_400_000_000
        # independent 2x2: each (type, dow) cell has exactly 1 obs
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4],
            event_type=["a", "a", "b", "b"],
            ts_us=[0, day, 0, day],
        )
        got = events_type_dow_chi2(sf).to_pandas()
        assert len(got) == 4
        assert (got["dev_num"] == 0).all()  # exact independence
        # skew: 3 'a' on dow0, 1 'b' on dow1 -> nonzero deviations
        sf2 = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4],
            event_type=["a", "a", "a", "b"],
            ts_us=[0, 0, 0, day],
        )
        got2 = events_type_dow_chi2(str(sf2)).to_pandas().set_index(["event_type", "dow"])
        # n=4, O(a,0)=3, R=3, C=3 -> dev = 12 - 9 = 3
        assert got2.loc[("a", 0), "dev_num"] == 3


class TestOrdersColumnDrift:
    def test_planted_mods(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.dq import orders_column_drift

        keys = list(range(1, 16))
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * 15, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 15, pa.string()),
                "o_totalprice": pa.array([10.0] * 15, pa.float64()),
                "o_orderdate": pa.array([datetime.date(1995, 1, 1)] * 15),
                "o_orderpriority": pa.array(["1-URGENT"] * 15, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = orders_column_drift(str(tmp_path)).to_pandas().set_index("col_name")
        # matched = keys not %13 -> 14; status changed {5,10,15} -> 3; price {7,14} -> 2
        assert got.loc["o_orderstatus"].tolist() == [3, 14]
        assert got.loc["o_totalprice"].tolist() == [2, 14]


class TestSessionFunnelTimed:
    def test_window_gates_stages(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import session_funnel_timed

        h = 3_600_000_000
        s = 1_000_000
        # u1: view 0 -> click +30min (in) -> purchase +30min after click (in)
        # u2: view 0 -> click +2h (OUT of window) -> never counted
        # u3: view 0 -> click +30min -> purchase +2h after click (OUT)
        sf = _write_events(
            tmp_path,
            event_id=list(range(1, 9)),
            user_id=[1, 1, 1, 2, 2, 3, 3, 3],
            event_type=["view", "click", "purchase", "view", "click",
                        "view", "click", "purchase"],
            ts_us=[0, 1800 * s, 3600 * s, 0, 2 * h,
                   0, 1800 * s, 1800 * s + 2 * h],
        )
        got = session_funnel_timed(sf).set_index("stage")["users"]
        assert got["view"] == 3
        assert got["view_click"] == 2  # u1, u3
        assert got["view_click_purchase"] == 1  # u1 only

    def test_tighter_than_untimed(self, ray_session):
        from ocr_ray.ops.timeseries import session_funnel, session_funnel_timed

        sf = "/root/testdata/sf0.001"
        t = session_funnel_timed(sf).set_index("stage")["users"]
        u = session_funnel(sf).set_index("stage")["users"]
        assert (t <= u).all() and t["view"] == u["view"]


class TestCustSpendLorenz:
    def test_closed_form(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.stats import cust_spend_lorenz

        # spends (cents): cust 1 -> 100, cust 2 -> 300, cust 3 -> 300 (tie),
        # cust 4 -> 700. ranks asc: 100->1, {300,300}->2+3, 700->4
        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
                "o_orderstatus": pa.array(["F"] * 5, pa.string()),
                "o_totalprice": pa.array([1.0, 3.0, 3.0, 3.0, 4.0], pa.float64()),
                "o_orderdate": pa.array([datetime.date(1995, 1, 1)] * 5),
                "o_orderpriority": pa.array(["1-URGENT"] * 5, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = cust_spend_lorenz(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_custs"] == 4
        assert got["sum_cents"] == 100 + 300 + 300 + 700
        # W = 1*100 + (2+3)*300 + 4*700 = 100 + 1500 + 2800 = 4400
        assert got["rank_weighted"] == 4400


class TestGeoRevenueRollup:
    def test_planted_hierarchy(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.olap import geo_revenue_rollup

        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array([0, 1], pa.int64()),
                    "r_name": pa.array(["R_A", "R_B"], pa.string()),
                }
            ),
            str(tmp_path / "region.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([10, 11, 12], pa.int64()),
                    "n_name": pa.array(["N1", "N2", "N3"], pa.string()),
                    "n_regionkey": pa.array([0, 0, 1], pa.int64()),
                }
            ),
            str(tmp_path / "nation.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "c_nationkey": pa.array([10, 11, 12, 99], pa.int64()),  # 99 orphan
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
                    "o_totalprice": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        got = geo_revenue_rollup(str(tmp_path)).to_pandas()
        rows = {
            (r if pd.notna(r) else None, n if pd.notna(n) else None): (int(a), int(b))
            for r, n, a, b in got.itertuples(index=False)
        }
        assert rows[("R_A", "N1")] == (2, 300)
        assert rows[("R_A", "N2")] == (1, 400)
        assert rows[("R_B", "N3")] == (1, 800)
        assert rows[("R_A", None)] == (3, 700)   # region subtotal
        assert rows[("R_B", None)] == (1, 800)
        assert rows[(None, None)] == (4, 1500)   # orphan custkey 99 dropped
        assert len(got) == 6


class TestOrdersMonthlyMom:
    def test_lag_over_present_months(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.olap import orders_monthly_mom

        d = datetime.date
        pq.write_table(
            pa.table(
                {
                    "o_orderdate": pa.array(
                        [d(1995, 1, 5), d(1995, 1, 9), d(1995, 3, 1), d(1996, 1, 1), None]
                    ),
                    "o_totalprice": pa.array([1.0, 2.0, 10.0, 5.0, 99.0], pa.float64()),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        got = orders_monthly_mom(str(tmp_path)).to_pandas()
        got = got.set_index(["y", "m"])
        assert got.loc[(1995, 1)].tolist() == [300, None, None] or (
            got.loc[(1995, 1), "revenue_cents"] == 300
            and pd.isna(got.loc[(1995, 1), "prev_cents"])
        )
        # lag skips the missing Feb: March's prev is January
        assert got.loc[(1995, 3)].tolist() == [1000, 300, 700]
        assert got.loc[(1996, 1)].tolist() == [500, 1000, -500]


class TestUserValueInterpolated:
    def test_gap_and_edges(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_value_interpolated

        s = 1_000_000
        # u1: 100 @0s, NULL @10s, 300 @20s -> imputed exactly 200
        # u2: NULL at the start (no prev) -> dropped; then observed 500
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4, 5],
            user_id=[1, 1, 1, 2, 2],
            value=[1.0, None, 3.0, None, 5.0],
            ts_us=[0, 10 * s, 20 * s, 0, 10 * s],
        )
        got = user_value_interpolated(sf).to_pandas().set_index("event_id")
        assert got.loc[2].tolist() == [100 * 10 * s + 300 * 10 * s, 20 * s, 1]
        assert got.loc[2, "interp_num"] / got.loc[2, "interp_den"] == 200.0
        assert got.loc[1].tolist() == [100, 1, 0]
        assert 4 not in got.index  # edge NULL dropped
        assert got.loc[5].tolist() == [500, 1, 0]


class TestOrderRevenueBootstrap:
    def test_closed_form_nibbles(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.stats import order_revenue_bootstrap

        keys = list(range(1, 21))
        prices = [float(k) for k in keys]
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * 20, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 20, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([datetime.date(1995, 1, 1)] * 20),
                "o_orderpriority": pa.array(["1-URGENT"] * 20, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = order_revenue_bootstrap(str(tmp_path)).to_pandas().set_index("replicate")
        for j in range(8):
            inc = [
                k
                for k in keys
                if hashlib.md5(str(k).encode()).hexdigest()[j] in "89abcdef"
            ]
            assert got.loc[j, "n_orders"] == len(inc)
            assert got.loc[j, "revenue_cents"] == sum(k * 100 for k in inc)


class TestEventsWindowDedup:
    def test_first_per_window(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import events_window_dedup

        h = 3_600_000_000
        # u1 click: two in hour 0 (keep earliest), one in hour 1 (keep)
        # u1 view in hour 0 (different type -> its own window)
        sf = _write_events(
            tmp_path,
            event_id=[1, 2, 3, 4],
            user_id=[1, 1, 1, 1],
            event_type=["click", "click", "click", "view"],
            ts_us=[100, 50, h + 5, 70],
        )
        got = events_window_dedup(sf).to_pandas()
        assert sorted(got["event_id"].tolist()) == [2, 3, 4]

    def test_tie_breaks_by_event_id(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import events_window_dedup

        sf = _write_events(
            tmp_path,
            event_id=[9, 4],
            user_id=[1, 1],
            event_type=["click", "click"],
            ts_us=[100, 100],
        )
        assert events_window_dedup(sf).to_pandas()["event_id"].tolist() == [4]


class TestDailyChurnCensus:
    def test_adjacency_labels(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import daily_churn_census

        day = 86_400_000_000
        # u1 active days 0,1 ; u2 active day 0 only ; u3 active days 1,3
        sf = _write_events(
            tmp_path,
            event_id=list(range(1, 7)),
            user_id=[1, 1, 2, 3, 3, 1],
            ts_us=[0, day, 10, day + 5, 3 * day, 20],  # u1 day0 twice (dedup)
        )
        got = daily_churn_census(sf).to_pandas().set_index("day")
        # day0: active {1,2}; churned: u2 (u1 has day1); new: both
        assert got.loc[0].tolist() == [2, 1, 2]
        # day1: active {1,3}; churned both (no day2); new: u3 only
        assert got.loc[1].tolist() == [2, 2, 1]
        # day3: active {3}; churned (no day4); new (no day2)
        assert got.loc[3].tolist() == [1, 1, 1]


class TestOrdersFdAudit:
    def test_planted_violation(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.dq import orders_fd_audit

        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([10, 10, 20, 30, 30], pa.int64()),
                "o_orderstatus": pa.array(["F"] * 5, pa.string()),
                "o_totalprice": pa.array([1.0] * 5, pa.float64()),
                "o_orderdate": pa.array([datetime.date(1995, 1, 1)] * 5),
                # cust 10 -> {A, B} (violates); 20 -> {A}; 30 -> {A, A} (holds)
                "o_orderpriority": pa.array(["A", "B", "A", "A", "A"], pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = orders_fd_audit(str(tmp_path)).to_pandas().iloc[0]
        assert got.tolist() == [3, 1, 2]


class TestEmbeddingArgmaxDim:
    def test_ragged_and_ties(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import embedding_argmax_dim

        vecs = [
            [0.1, 0.9, 0.9],   # tie at dims 1,2 -> lowest index 1
            [0.5],             # singleton
            [],                # empty -> dropped
            [-0.2, -0.1],      # all negative -> argmax dim 1
        ]
        t = pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        got = embedding_argmax_dim(str(tmp_path)).to_pandas().set_index("vec_id")
        assert 3 not in got.index
        assert got.loc[1].tolist() == [1, 899999]  # floor(.9*1e6) on float32
        assert got.loc[2, "arg_dim"] == 0
        assert got.loc[4].tolist() == [1, np.floor(np.float64(np.float32(-0.1)) * 1e6)]


class TestLineitemWeightedQuantiles:
    def test_weight_shifts_median(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import lineitem_weighted_quantiles

        # prices 1..4 dollars; quantity 97 on the $4 line dominates W=100
        t = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 1, 1], pa.int64()),
                "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
                "l_quantity": pa.array([1.0, 1.0, 1.0, 97.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))
        got = lineitem_weighted_quantiles(str(tmp_path)).to_pandas().set_index("q_bp")
        # ranks: p25 -> 25, p50 -> 50, p75 -> 75; cum = [1,2,3,100]
        assert got.loc[2500, "cents"] == 400
        assert got.loc[5000, "cents"] == 400
        assert got.loc[7500, "cents"] == 400
        # unweighted would have put the median at 200/300 — pin one low rank
        t2 = t.set_column(2, "l_quantity", pa.array([97.0, 1.0, 1.0, 1.0], pa.float64()))
        pq.write_table(t2, str(tmp_path / "lineitem.parquet"))
        got2 = lineitem_weighted_quantiles(str(tmp_path)).to_pandas().set_index("q_bp")
        assert got2.loc[7500, "cents"] == 100


class TestValueDriftKs:
    def test_identical_and_disjoint(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import value_drift_ks

        # identical distributions -> ks_num = 0
        sf = _write_events(
            tmp_path,
            event_id=list(range(1, 9)),
            event_type=["click", "purchase"] * 4,
            value=[1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0],
        )
        got = value_drift_ks(sf).to_pandas().iloc[0]
        assert got.tolist() == [4, 4, 0]
        # fully separated -> KS = 1 -> ks_num = nA * nB
        sf2 = _write_events(
            tmp_path,
            event_id=list(range(1, 7)),
            event_type=["click"] * 3 + ["purchase"] * 3,
            value=[1.0, 2.0, 3.0, 10.0, 11.0, 12.0],
        )
        got2 = value_drift_ks(sf2).to_pandas().iloc[0]
        assert got2.tolist() == [3, 3, 9]


class TestConvAssistantEcho:
    def test_planted_loop(self, tmp_path, ray_session):
        import ray.data as rd

        from ocr_ray.pipelines.conversation import conv_assistant_echo

        t = pa.table(
            {
                "conv_id": pa.array(["c1"] * 6 + ["c2"] * 2, pa.string()),
                "turn_idx": pa.array([0, 1, 2, 3, 4, 5, 0, 1], pa.int64()),
                "role": pa.array(
                    ["user", "assistant", "user", "assistant", "user", "assistant",
                     "assistant", "assistant"],
                    pa.string(),
                ),
                "text": pa.array(
                    ["q", "LOOP", "q2", "LOOP", "q3", "fresh", "a", "b"], pa.string()
                ),
                "ts": pa.array(np.arange(8, dtype=np.int64), pa.timestamp("us")),
                "payload_kind": pa.array(["plain"] * 8, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "t.parquet"))
        got = (
            conv_assistant_echo(rd.read_parquet(str(tmp_path)))
            .to_pandas()
            .set_index("conv_id")
        )
        assert got.loc["c1"].tolist() == [3, 1]  # second LOOP echoes
        assert got.loc["c2"].tolist() == [2, 0]


class TestActivitySpendCorr:
    def test_perfect_correlation(self, tmp_path, ray_session):
        import datetime

        from ocr_ray.ops.stats import activity_spend_corr

        # cust k: k events and k dollars spend -> perfect corr:
        # cov_num^2 == var_e_num * var_s_num
        users = [1] * 1 + [2] * 2 + [3] * 3
        _write_events(tmp_path, event_id=list(range(1, 7)), user_id=users)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "o_custkey": pa.array([1, 2, 3, 9], pa.int64()),  # 9 unmatched
                    "o_orderstatus": pa.array(["F"] * 4, pa.string()),
                    "o_totalprice": pa.array([1.0, 2.0, 3.0, 50.0], pa.float64()),
                    "o_orderdate": pa.array([datetime.date(1995, 1, 1)] * 4),
                    "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        got = activity_spend_corr(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_custs"] == 3
        assert got["sum_events"] == 6 and got["sum_dollars"] == 6
        assert got["cov_num"] ** 2 == got["var_e_num"] * got["var_s_num"]
        assert got["cov_num"] > 0


class TestDocCasefoldCollisions:
    def test_planted_case_variants(self, tmp_path, ray_session):
        from ocr_ray.ops.dedup import doc_casefold_collisions

        texts = ["Hello World", "hello world", "HELLO WORLD", "unique", "Unique2"]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(1, 6)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["s"] * 5, pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = doc_casefold_collisions(str(tmp_path)).to_pandas().iloc[0]
        # folded groups: {hello world}, {unique}, {unique2} -> 3
        assert got.tolist() == [3, 1, 3]
