"""Edge mechanics for the timeseries + dq op families (the full parity gate
lives in test_oracle_parity.py): gap-fill span arithmetic, funnel strict
ordering, the NTILE closed form, diff classification, keyset boundary."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.ops.timeseries import _ntile_of_rank
from ocr_ray.ops.dq import _row_digest

SF = "/root/testdata/sf0.001"


class TestNtileClosedForm:
    def test_matches_duckdb_many_shapes(self):
        """The vectorized closed form must equal SQL NTILE for every (n, k)
        shape — including n < k, n % k == 0, and n % k != 0."""
        con = duckdb.connect()
        for n in (1, 3, 4, 5, 10, 17, 100):
            for k in (1, 2, 4, 7):
                want = con.sql(
                    f"SELECT ntile({k}) OVER (ORDER BY r) FROM range({n}) t(r)"
                ).fetchnumpy()
                got = _ntile_of_rank(np.arange(1, n + 1), n, k)
                assert (got == list(want.values())[0]).all(), (n, k)

    def test_tiles_are_balanced(self):
        t = _ntile_of_rank(np.arange(1, 11), 10, 4)
        sizes = np.bincount(t)[1:]
        assert sizes.tolist() == [3, 3, 2, 2]


class TestGapfillMechanics:
    def test_planted_gap(self, tmp_path, ray_session):
        """A user active on days 0 and 3 must get zero rows for days 1-2;
        a single-day user gets exactly one row."""
        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base),  # day 0
            (1, base + dt.timedelta(days=3, hours=5)),  # day 3
            (2, base + dt.timedelta(days=7)),  # single day
        ]
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from ocr_ray.ops.timeseries import user_days_gapfilled

        out = user_days_gapfilled(str(tmp_path)).to_pandas()
        u1 = out[out.user_id == 1].sort_values("day")
        assert len(u1) == 4
        assert u1.n_events.tolist() == [1, 0, 0, 1]
        u2 = out[out.user_id == 2]
        assert len(u2) == 1 and u2.n_events.tolist() == [1]


class TestFunnelOrdering:
    def test_click_before_view_does_not_count(self, tmp_path, ray_session):
        """click < first view must NOT advance the funnel; purchase must be
        after the first QUALIFYING click, not any click."""
        base = dt.datetime(2024, 1, 1)

        def ev(i, u, typ, minutes):
            return (i, base + dt.timedelta(minutes=minutes), u, typ)

        rows = [
            # u1: click BEFORE view, never after -> stage 1 only
            ev(0, 1, "click", 0), ev(1, 1, "view", 10),
            # u2: proper view -> click -> purchase
            ev(2, 2, "view", 0), ev(3, 2, "click", 5), ev(4, 2, "purchase", 9),
            # u3: purchase between view and first qualifying click -> stage 2
            ev(5, 3, "view", 0), ev(6, 3, "purchase", 2), ev(7, 3, "click", 5),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from ocr_ray.ops.timeseries import session_funnel

        out = session_funnel(str(tmp_path)).set_index("stage")["users"]
        assert out["view"] == 3
        assert out["view_click"] == 2  # u2, u3
        assert out["view_click_purchase"] == 1  # u2 only


class TestSnapshotDiff:
    def test_classification_planted(self, tmp_path, ray_session):
        """Keys chosen to hit each class: 13 -> delete, 7 -> update,
        11 -> insert(-11), 77 (7*11) -> update AND insert, 143 (11*13) ->
        delete AND insert, 1 -> unchanged (absent)."""
        keys = [1, 7, 11, 13, 77, 143]
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * 6, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 6),
                "o_totalprice": pa.array([10.0] * 6),
                "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * 6, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 6),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        from ocr_ray.ops.dq import orders_snapshot_diff

        out = orders_snapshot_diff(str(tmp_path)).to_pandas()
        got = dict(zip(out.o_orderkey, out.change))
        assert got == {
            7: "update",
            13: "delete",
            -11: "insert",
            77: "update",
            -77: "insert",
            143: "delete",
            -143: "insert",
        }
        assert 1 not in got

    def test_digest_matches_duckdb_md5(self):
        con = duckdb.connect()
        want = con.sql("SELECT substr(md5('O|1234'), 1, 16)").fetchone()[0]
        assert _row_digest(["O"], np.array([1234]))[0] == want


class TestKeysetPage:
    def test_cursor_is_strict(self, ray_session):
        """No returned row may be <= the cursor; page is exactly k rows and
        sorted; the FIRST row is the successor of the cursor."""
        from ocr_ray.ops.dq import orders_keyset_page, _CURSOR_DATE

        out = orders_keyset_page(SF)
        assert len(out) == 50
        d = out.o_orderdate.to_numpy()
        k = out.o_orderkey.to_numpy()
        assert ((d > _CURSOR_DATE) | ((d == _CURSOR_DATE) & (k > 0))).all()
        assert (out.sort_values(["o_orderdate", "o_orderkey"]).index == out.index).all()


class TestOrphanAudit:
    def test_counts_are_row_and_key_exact(self, tmp_path, ray_session):
        """One orphan key appearing in 3 child rows => orphan_rows 3,
        orphan_keys 1 (cross-block census merge must dedup)."""
        li = pa.table(
            {
                "l_orderkey": pa.array([97, 97, 97, 1, 2], pa.int64()),
            }
        )
        pq.write_table(li, tmp_path / "lineitem.parquet")
        orders = pa.table({"o_orderkey": pa.array([1, 2, 97], pa.int64()),
                           "o_custkey": pa.array([1, 1, 1], pa.int64())})
        pq.write_table(orders, tmp_path / "orders.parquet")
        cust = pa.table({"c_custkey": pa.array([1], pa.int64())})
        pq.write_table(cust, tmp_path / "customer.parquet")
        ev = pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us")),
                "user_id": pa.array([1], pa.int64()),
                "event_type": pa.array(["view"]),
                "value": pa.array([1.0]),
                "props": pa.array(["{}"]),
            }
        )
        pq.write_table(ev, tmp_path / "events.parquet")
        from ocr_ray.ops.dq import dq_orphans

        out = dq_orphans(str(tmp_path)).set_index("relation")
        # 97 % 97 == 0 -> negated in all 3 rows -> orphans
        row = out.loc["lineitem.l_orderkey->orders"]
        assert row.orphan_rows == 3 and row.orphan_keys == 1
        assert out.loc["orders.o_custkey->customer"].orphan_rows == 0


class TestLocf:
    def test_argmax_and_forward_fill(self, tmp_path, ray_session):
        """Two events on the same day -> the LATER one's value wins; gap
        days carry the last value forward; the series ends at the user's
        last active day."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (0, base + dt.timedelta(hours=1), 1, 2.00),   # day 0 early
            (1, base + dt.timedelta(hours=9), 1, 5.00),   # day 0 late: wins
            (2, base + dt.timedelta(days=3), 1, 7.50),    # day 3
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([r[3] for r in rows]),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from ocr_ray.ops.timeseries import user_days_locf

        out = user_days_locf(str(tmp_path)).to_pandas().sort_values("day")
        assert out.value_cents.tolist() == [500, 500, 500, 750]

    def test_same_ts_event_id_breaks_tie(self, tmp_path, ray_session):
        """Identical ts on one day -> higher event_id wins (the SQL ORDER BY
        ts DESC, event_id DESC tiebreak)."""
        import datetime as dt

        ts = dt.datetime(2024, 1, 1, 12)
        t = pa.table(
            {
                "event_id": pa.array([5, 9], pa.int64()),
                "ts": pa.array([ts, ts], pa.timestamp("us")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["view", "view"]),
                "value": pa.array([1.00, 3.00]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from ocr_ray.ops.timeseries import user_days_locf

        out = user_days_locf(str(tmp_path)).to_pandas()
        assert out.value_cents.tolist() == [300]


class TestIncrementalAgg:
    def test_merge_equals_recompute_any_split(self):
        """Folding shard states in ANY grouping/order must equal the one-pass
        aggregate — the mergeability contract."""
        import numpy as np
        import pandas as pd

        from ocr_ray.ops.incremental import merge_states

        rng = np.random.RandomState(7)
        full = pd.DataFrame(
            {
                "k": rng.randint(0, 5, 200),
                "c": rng.randint(-1000, 1000, 200).astype(np.int64),
            }
        )
        want = (
            full.groupby("k", as_index=False)
            .agg(n=("c", "count"), s=("c", "sum"), mn=("c", "min"), mx=("c", "max"))
            .astype({"n": np.int64})
        )
        # three shards, merged in two different orders
        shards = [full.iloc[:50], full.iloc[50:51], full.iloc[51:]]
        states = [
            s.groupby("k", as_index=False).agg(
                n=("c", "count"), s=("c", "sum"), mn=("c", "min"), mx=("c", "max")
            )
            for s in shards
        ]
        for order in ([0, 1, 2], [2, 0, 1]):
            got = merge_states(
                pd.concat([states[i] for i in order], ignore_index=True), "k"
            ).reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got,
                want.sort_values("k").reset_index(drop=True).astype(
                    {"n": np.int64, "s": np.int64, "mn": np.int64, "mx": np.int64}
                ),
            )
