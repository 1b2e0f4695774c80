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


class TestWeightedSample:
    def test_big_orders_always_kept(self, tmp_path, ray_session):
        """cents >= 2^26 means p = 1: those rows MUST all survive; tiny
        weights must be (almost) all dropped."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import datetime as dt

        n = 500
        t = pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                # half huge (p=1), half one cent (p ~ 2^-26)
                "o_totalprice": pa.array(
                    [700000.0] * (n // 2) + [0.01] * (n - n // 2)
                ),
                "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        )
        pq.write_table(t, tmp_path / "orders.parquet")
        from ocr_ray.ops.mlprep import weighted_sample_orders

        out = weighted_sample_orders(str(tmp_path)).to_pandas()
        big = out[out.o_orderkey < n // 2]
        small = out[out.o_orderkey >= n // 2]
        assert len(big) == n // 2  # capped p=1: all kept
        assert len(small) == 0  # p ~ 1.5e-8: none kept at this n

    def test_rate_tracks_weight(self, ray_session):
        """Across the real fixture, the empirical keep rate of the heavier
        half must exceed the lighter half's (proportionality smoke)."""
        import duckdb

        SF2 = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF2}/orders.parquet')"
        )
        med = con.sql("SELECT median(o_totalprice) FROM orders").fetchone()[0]
        from ocr_ray.ops.mlprep import weighted_sample_orders

        out = weighted_sample_orders(SF2).to_pandas()
        n_hi_all = con.sql(f"SELECT count(*) FROM orders WHERE o_totalprice >= {med}").fetchone()[0]
        n_lo_all = con.sql(f"SELECT count(*) FROM orders WHERE o_totalprice < {med}").fetchone()[0]
        hi_rate = (out.total_cents >= med * 100).sum() / n_hi_all
        lo_rate = (out.total_cents < med * 100).sum() / n_lo_all
        assert hi_rate > lo_rate


class TestQuantileSketch:
    def test_error_bounded_by_bin_width(self, ray_session):
        """Sketch quantiles must sit within the log-bin width (~4.4%) of the
        exact sibling at every probed quantile."""
        from ocr_ray.ops.corpus import order_quantiles, order_quantiles_sketch

        SF2 = "/root/testdata/sf0.001"
        exact = order_quantiles(SF2).to_pandas().set_index("q_bp")["cents"]
        sk = order_quantiles_sketch(SF2).set_index("q_bp")["cents_est"]
        rel = ((sk - exact).abs() / exact).max()
        assert rel < 0.05, rel

    def test_register_merge_is_order_free(self):
        """bincount partials summed in any order give the same registers."""
        import numpy as np

        from ocr_ray.ops.corpus import _sketch_bins, _SKETCH_REGS

        rng = np.random.RandomState(3)
        c = rng.randint(1, 10_000_000, 5000).astype(np.int64)
        full = np.bincount(_sketch_bins(c), minlength=_SKETCH_REGS)
        parts = [c[:1000], c[1000:1001], c[1001:]]
        acc = np.zeros(_SKETCH_REGS, np.int64)
        for p in reversed(parts):
            acc += np.bincount(_sketch_bins(p), minlength=_SKETCH_REGS)
        assert (acc == full).all()


class TestExplodeWords:
    def test_token_count_roundtrip(self, ray_session):
        """Explode must emit exactly count(' ')+1 rows per doc (single-space
        corpus invariant) and never reorder doc ids away."""
        import duckdb

        SF2 = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF2}/documents.parquet')"
        )
        from ocr_ray.ops.corpus import explode_doc_words

        out = explode_doc_words(SF2).to_pandas()
        per_doc = out.groupby("doc_id").size()
        want = con.sql(
            "SELECT doc_id, len(text) - len(replace(text, ' ', '')) + 1 AS n FROM documents"
        ).df().set_index("doc_id")["n"]
        assert (per_doc.sort_index() == want.sort_index()).all()


class TestZOrder:
    def test_interleave_roundtrip(self):
        """De-interleaving zval must recover (user bits, hour bits) exactly
        for the full 21-bit range — the property file-range pruning rests on."""
        import numpy as np

        from ocr_ray.ops.dq import _spread_bits, _Z_BITS

        rng = np.random.RandomState(11)
        u = rng.randint(0, 1 << _Z_BITS, 2000).astype(np.int64)
        h = rng.randint(0, 1 << _Z_BITS, 2000).astype(np.int64)
        z = _spread_bits(u) | (_spread_bits(h) << np.uint64(1))

        def unspread(v):
            v = v & np.uint64(0x5555555555555555)
            v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
            v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
            v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
            return v.astype(np.int64)

        assert (unspread(z) == u).all()
        assert (unspread(z >> np.uint64(1)) == h).all()

    def test_locality_beats_single_key_sort(self, tmp_path, ray_session):
        """The layout claim, measured on a dense (64 users x 64 hours) grid:
        cut the z-sorted table into 16 equal file ranges — a user-range box
        (all hours) must touch FEWER files than under a pure hour sort, and
        an hour-range box must still prune (the two-dimensional win a single
        sort key cannot give)."""
        import datetime as dt

        import numpy as np

        from ocr_ray.ops.dq import events_zorder

        side = 64
        base = dt.datetime(2024, 1, 1)
        uu, hh = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
        uu, hh = uu.ravel(), hh.ravel()
        t = pa.table(
            {
                "event_id": pa.array(np.arange(side * side), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(hours=int(h)) for h in hh], pa.timestamp("us")
                ),
                "user_id": pa.array(uu.astype(np.int64)),
                "event_type": pa.array(["view"] * (side * side)),
                "value": pa.array([1.0] * (side * side)),
                "props": pa.array(["{}"] * (side * side)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        z = (
            events_zorder(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")["zval"]
            .to_numpy()
        )
        n, files = side * side, 16

        def files_touched(order, box):
            fid = np.empty(n, np.int64)
            fid[np.argsort(order, kind="stable")] = np.arange(n) * files // n
            return len(np.unique(fid[box]))

        user_box = (uu >= 8) & (uu < 16)  # one user stripe, all hours
        hour_box = (hh >= 8) & (hh < 16)  # one hour stripe, all users
        # pure hour sort: the user box touches every file
        assert files_touched(hh, user_box) == files
        # z-order: the same box touches a strict subset
        assert files_touched(z, user_box) < files
        # and the hour box still prunes under z-order
        assert files_touched(z, hour_box) < files


class TestParetoSkyline:
    def test_planted_frontier(self, tmp_path):
        """Known 2D frontier: dominated points drop, equal frontier
        duplicates BOTH survive, ties on one axis handled."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.olap import pareto_orders

        ts = lambda d: np.datetime64(f"1995-01-{d:02d}", "us")
        # (key, price, day): frontier = {1 (10,1), 2 (10,1) dup, 3 (5,3)};
        # 4 (10,2) dominated by 1; 5 (12,1) dominated by 1; 6 (5,4) dominated by 3
        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "o_totalprice": pa.array([0.10, 0.10, 0.05, 0.10, 0.12, 0.05]),
                "o_orderdate": pa.array([ts(1), ts(1), ts(3), ts(2), ts(1), ts(4)]),
            }
        )
        d = tmp_path / "sfx"
        d.mkdir()
        pq.write_table(t, str(d / "orders.parquet"))
        got = sorted(r["o_orderkey"] for r in pareto_orders(str(d)).take_all())
        assert got == [1, 2, 3]

    def test_block_prune_composes(self, tmp_path):
        """Frontier is identical whether computed in one block or pruned
        across many small blocks first (skyline composition)."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.olap import pareto_orders

        rs = np.random.RandomState(2)
        n = 5000
        base = np.datetime64("1994-01-01", "us")
        t = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_totalprice": pa.array(rs.uniform(1, 1000, n).round(2)),
                "o_orderdate": pa.array(base + rs.randint(0, 2000, n) * np.timedelta64(86400_000_000, "us")),
            }
        )
        d = tmp_path / "sfy"
        d.mkdir()
        pq.write_table(t, str(d / "orders.parquet"))
        got = {r["o_orderkey"] for r in pareto_orders(str(d)).take_all()}
        # brute-force oracle
        p = t.column("o_totalprice").to_numpy()
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy() // 86400_000_000
        want = set()
        for i in range(n):
            dom = (cents <= cents[i]) & (day <= day[i]) & ((cents < cents[i]) | (day < day[i]))
            if not dom.any():
                want.add(i)
        assert got == want and len(got) > 0


class TestTransitions:
    def test_planted_chains(self, tmp_path):
        """Per-user sequences: boundary pairs excluded, counts exact."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.timeseries import event_type_transitions

        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = [
            # user 1: a -> b -> a
            (1, 1, 0, "a"), (2, 1, 1, "b"), (3, 1, 2, "a"),
            # user 2: a -> b
            (4, 2, 0, "a"), (5, 2, 1, "b"),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([base + np.timedelta64(r[2], "s") for r in rows]),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array([""] * len(rows)),
            }
        )
        d = tmp_path / "sft"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = {
            (r["prev_type"], r["event_type"]): r["n"]
            for r in event_type_transitions(str(d)).take_all()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 1}


class TestScd2Intervals:
    def test_planted_history(self, tmp_path):
        """Three orders chain valid_from/valid_to; current row gets the
        9999-12-31 sentinel; single-order customer is immediately current."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.timeseries import cust_order_intervals

        def ts(s):
            return np.datetime64(s, "us")

        t = pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 20], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderdate": pa.array([ts("1995-01-01"), ts("1995-02-01"), ts("1995-03-01"), ts("1996-01-01")]),
                "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
        d = tmp_path / "sfs"
        d.mkdir()
        pq.write_table(t, str(d / "orders.parquet"))
        got = {r["o_orderkey"]: r for r in cust_order_intervals(str(d)).take_all()}
        hi = ts("9999-12-31")
        assert got[10]["valid_to"] == ts("1995-02-01")
        assert got[11]["valid_to"] == ts("1995-03-01")
        assert got[12]["valid_to"] == hi
        assert got[20]["valid_from"] == ts("1996-01-01") and got[20]["valid_to"] == hi


class TestRollingDistinct:
    def test_planted_window(self, tmp_path):
        """Hand-checkable trailing-7d distinct: user 1 on days 0 and 3,
        user 2 on day 3 — day 3 sees both, day 9 only user-1's day-3 echo
        is gone (window [3..9] still has day 3)."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.timeseries import active_users_trailing_7d

        base = np.datetime64("1970-01-01T00:00:00", "us")
        day = lambda d: base + np.timedelta64(d * 86400, "s")
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([day(0), day(0), day(3), day(3)]),
                "event_type": pa.array(["a"] * 4, pa.string()),
                "value": pa.array([0.0] * 4),
                "props": pa.array([""] * 4),
            }
        )
        d = tmp_path / "sfr"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = {r["day"]: r["n_users"] for r in active_users_trailing_7d(str(d)).take_all()}
        # user1 covers days 0-6 (from day0) and 3-9 (from day3) => 0-9
        # user2 covers days 3-9
        want = {dd: (2 if 3 <= dd <= 9 else 1) for dd in range(0, 10)}
        assert got == want


class TestIslands:
    def test_planted_gaps(self, tmp_path):
        """Closed-form islands: keys {1,2,3, 7, 9,10} -> three islands."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.dq import orderkey_islands

        keys = [1, 2, 3, 7, 9, 10, 10]  # dup key must not split an island
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * len(keys), pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(keys)),
                "o_totalprice": pa.array([1.0] * len(keys)),
                "o_orderdate": pa.array([np.datetime64("1995-01-01", "us")] * len(keys)),
                "o_orderpriority": pa.array(["1-URGENT"] * len(keys)),
            }
        )
        d = tmp_path / "sfi"
        d.mkdir()
        pq.write_table(t, str(d / "orders.parquet"))
        got = sorted(
            (r["island_start"], r["island_end"], r["n_keys"])
            for r in orderkey_islands(str(d)).take_all()
        )
        assert got == [(1, 3, 3), (7, 7, 1), (9, 10, 2)]


class TestLongestStreak:
    def test_planted_streaks(self, tmp_path):
        """User 1: days {0,1,2, 5,6} -> streak 3; user 2: {10} -> 1."""
        import pyarrow.parquet as pq

        from ocr_ray.ops.timeseries import user_longest_streak

        base = np.datetime64("1970-01-01T12:00:00", "us")  # mid-day: floor-safe
        day = lambda d: base + np.timedelta64(d * 86400, "s")
        days_u1 = [0, 1, 2, 5, 6, 1]  # dup day must not extend a streak
        t = pa.table(
            {
                "event_id": pa.array(list(range(len(days_u1) + 1)), pa.int64()),
                "user_id": pa.array([1] * len(days_u1) + [2], pa.int64()),
                "ts": pa.array([day(d) for d in days_u1] + [day(10)]),
                "event_type": pa.array(["a"] * (len(days_u1) + 1), pa.string()),
                "value": pa.array([0.0] * (len(days_u1) + 1)),
                "props": pa.array([""] * (len(days_u1) + 1)),
            }
        )
        d = tmp_path / "sfk"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = {r["user_id"]: r["streak"] for r in user_longest_streak(str(d)).take_all()}
        assert got == {1: 3, 2: 1}


class TestLinearAttribution:
    def test_window_boundaries_and_split(self, tmp_path, ray_session):
        """Click AT the purchase ts is credited; click exactly 1h before is
        NOT (strict lower bound); two covered clicks split the cents."""
        base = dt.datetime(2024, 6, 1, 12, 0, 0)
        rows = [
            # (event_id, type, ts, value)
            (1, "click", base - dt.timedelta(hours=1), 0.0),     # excluded: == pts-1h
            (2, "click", base - dt.timedelta(minutes=30), 0.0),  # covered
            (3, "click", base, 0.0),                              # covered: == pts
            (4, "purchase", base, 10.01),                         # 1001 cents
            (5, "click", base + dt.timedelta(seconds=1), 0.0),   # after -> excluded
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([7] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[3] for r in rows]),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from ocr_ray.ops.timeseries import purchase_linear_attribution

        out = (
            purchase_linear_attribution(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out.event_id.tolist() == [2, 3]
        assert out.touches.tolist() == [1, 1]
        # 1001 cents * 1e6 // 2 touches = 500_500_000 each (truncating split)
        assert out.credit_e6.tolist() == [500_500_000, 500_500_000]


class TestOrdersBenford:
    def test_planted_digits(self, tmp_path, ray_session):
        """First significant digit of |cents| via decimal-string slice:
        negatives audit as magnitude, zero and NULL drop, boundaries
        (99 -> 9, 100 -> 1) land exactly."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.ops.dq import orders_benford_audit

        prices = [0.99, 1.00, -1.25, 0.0, None, 9.99, 125.00, 0.01]
        n = len(prices)
        t = pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        )
        pq_.write_table(t, tmp_path / "orders.parquet")
        got = {r["digit"]: r["n"] for r in orders_benford_audit(str(tmp_path)).take_all()}
        # cents: 99->9, 100->1, 125->1, 0 drop, NULL drop, 999->9, 12500->1, 1->1
        assert got == {9: 2, 1: 4}


class TestDailyNewVsReturning:
    def test_planted_growth_accounting(self, tmp_path, ray_session):
        """A user is NEW only on their first-ever day; multiple events on
        one day count once; negative user ids survive the pair packing."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.ops.timeseries import daily_new_vs_returning

        base = dt.datetime(2024, 1, 1)

        def day(n, h=0):
            return base + dt.timedelta(days=n, hours=h)

        t = pa.table(
            {
                "event_id": pa.array(range(7), pa.int64()),
                "ts": pa.array(
                    [day(0), day(0, 5), day(1), day(0), day(2), day(2, 3), None],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1, -2, -2, 1, 1], pa.int64()),
                "event_type": pa.array(["view"] * 7),
                "value": pa.array([1.0] * 7),
                "props": pa.array(["{}"] * 7),
            }
        )
        pq_.write_table(t, tmp_path / "events.parquet")
        rows = {r["day"]: r for r in daily_new_vs_returning(str(tmp_path)).take_all()}
        d0 = int(base.timestamp() * 1e6) // 86_400_000_000
        # day0: users {1,-2} both new; day1: {1} returning; day2: {-2,1} returning
        assert rows[d0]["n_active"] == 2 and rows[d0]["n_new"] == 2
        assert rows[d0 + 1]["n_active"] == 1 and rows[d0 + 1]["n_new"] == 0
        assert rows[d0 + 2]["n_active"] == 2 and rows[d0 + 2]["n_new"] == 0


class TestPropsSchemaInfer:
    def test_planted_type_census_matches_duckdb(self, tmp_path, ray_session):
        """All json_type branches (incl. negative ints, JSON null, arrays,
        objects, booleans), malformed JSON skipped, non-object docs yield
        no keys — exact parity with the SQL mirror on the same parquet."""
        import datetime as dt

        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.pipelines.relational import (
            PROPS_SCHEMA_INFER_SQL,
            props_schema_infer,
        )

        props = [
            '{"a": 1, "b": "x", "c": true}',
            '{"a": -5, "b": null, "d": [1,2]}',
            '{"a": 2.5, "e": {"nested": 1}}',
            "not json",
            "123",
            None,
        ]
        n = len(props)
        t = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n),
                "props": pa.array(props, pa.string()),
            }
        )
        pq_.write_table(t, tmp_path / "events.parquet")
        got = (
            props_schema_infer(str(tmp_path))
            .to_pandas()
            .sort_values(["key", "vtype"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        want = (
            con.sql(PROPS_SCHEMA_INFER_SQL)
            .df()
            .sort_values(["key", "vtype"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        cells = {(r["key"], r["vtype"]): r["n"] for _, r in got.iterrows()}
        assert cells == {
            ("a", "UBIGINT"): 1, ("a", "BIGINT"): 1, ("a", "DOUBLE"): 1,
            ("b", "VARCHAR"): 1, ("b", "NULL"): 1, ("c", "BOOLEAN"): 1,
            ("d", "ARRAY"): 1, ("e", "OBJECT"): 1,
        }
