"""Planted-input tests for the session-11 op batch: exact MAD, cumulative
distinct users, EXCEPT ALL bag semantics, systematic sampling, per-column
survivorship (golden record), session path census, compression ratio."""

import zlib

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


def _write_orders(dirpath, prices):
    n = len(prices)
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, n + 1)), pa.int64()),
            "o_custkey": pa.array([1] * n, pa.int64()),
            "o_totalprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(t, str(dirpath / "orders.parquet"))
    return str(dirpath)


def _write_docs(dirpath, texts):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(dirpath / "documents.parquet"))
    return str(dirpath)


class TestOrderPriceMad:
    def test_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import order_price_mad

        # cents [100, 200, 300, 10000]; lower median (rank 2) = 200;
        # devs sorted [0, 100, 100, 9800] -> MAD (rank 2) = 100
        sf = _write_orders(tmp_path, [1.0, 2.0, 3.0, 100.0])
        got = order_price_mad(sf).to_pandas()
        assert got.iloc[0].tolist() == [4, 200, 100]

    def test_null_only_is_empty(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import order_price_mad

        sf = _write_orders(tmp_path, [None, None])
        assert len(order_price_mad(sf).to_pandas()) == 0

    def test_outlier_resistance(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import order_price_mad

        # one wild outlier moves mean/var, not median/MAD
        sf = _write_orders(tmp_path, [10.0, 11.0, 12.0, 13.0, 1e6])
        got = order_price_mad(sf).to_pandas()
        assert got.iloc[0]["median_cents"] == 1200
        assert got.iloc[0]["mad_cents"] == 100


class TestCumulativeDistinctUsers:
    def test_growth_curve(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import cumulative_distinct_users

        day = 86_400_000_000
        sf = _write_events(
            tmp_path,
            user_id=[1, 1, 2, 1, 3, 3],
            ts_us=[0, day, day, 2 * day, 2 * day, 3 * day],
        )
        got = cumulative_distinct_users(sf).to_pandas()
        assert got["day"].tolist() == [0, 1, 2, 3]
        assert got["new_users"].tolist() == [1, 1, 1, 0]
        assert got["cum_users"].tolist() == [1, 2, 3, 3]

    def test_zero_new_day_present(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import cumulative_distinct_users

        day = 86_400_000_000
        sf = _write_events(tmp_path, user_id=[7, 7], ts_us=[0, 5 * day])
        got = cumulative_distinct_users(sf).to_pandas()
        assert got["day"].tolist() == [0, 5]
        assert got["new_users"].tolist() == [1, 0]
        assert got["cum_users"].tolist() == [1, 1]


class TestExceptAllBag:
    def test_multiset_difference(self, tmp_path, ray_session):
        from ocr_ray.ops.olap import click_minus_view_users_bag

        sf = _write_events(
            tmp_path,
            user_id=[1, 1, 1, 1, 2, 2, 2, None, None, None],
            event_type=[
                "click", "click", "click", "view",      # u1: 3c 1v -> 2 copies
                "click", "view", "view",                 # u2: 1c 2v -> 0
                "click", "click", "view",                # NULL: 2c 1v -> 1 copy
            ],
        )
        got = click_minus_view_users_bag(sf).to_pandas()
        vals = sorted(got["user_id"].tolist(), key=lambda x: (pd.isna(x), x))
        assert vals[:2] == [1, 1] and len(vals) == 3 and pd.isna(vals[2])


class TestSystematicSample:
    def test_every_kth(self, tmp_path, ray_session):
        from ocr_ray.ops.mlprep import events_systematic_sample

        sf = _write_events(tmp_path, user_id=[1] * 120)
        got = events_systematic_sample(sf).to_pandas().sort_values("ts_rank")
        assert got["ts_rank"].tolist() == [1, 51, 101]
        # rank order == (ts, event_id) order: event_id i+1 has ts i sec
        assert got["event_id"].tolist() == [1, 51, 101]


class TestGoldenRecordVsLww:
    def test_whole_row_lww_differs(self, tmp_path, ray_session):
        """The golden record keeps the value a whole-row LWW would wipe."""
        from ocr_ray.pipelines.relational import latest_event_per_user, user_golden_record

        sf = _write_events(
            tmp_path,
            event_id=[1, 2],
            user_id=[9, 9],
            ts_us=[1_000_000, 2_000_000],
            value=[7.0, None],
        )
        lww = latest_event_per_user(sf).to_pandas().iloc[0]
        golden = user_golden_record(sf).to_pandas().iloc[0]
        assert pd.isna(lww["last_value_cents"])
        assert golden["last_value"] == 7.0


class TestSessionPaths:
    def test_prefix_census(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import session_paths_topk

        day = 86_400_000_000
        # two users, same 6-event day -> same 5-prefix path, counted twice;
        # one short path
        types = ["a", "b", "c", "d", "e", "f"]
        sf = _write_events(
            tmp_path,
            user_id=[1] * 6 + [2] * 6 + [3],
            ts_us=[i * 1_000_000 for i in range(6)]
            + [day + i * 1_000_000 for i in range(6)]
            + [2 * day],
            event_type=types + types + ["z"],
        )
        got = session_paths_topk(sf).to_pandas()
        assert got.iloc[0]["path"] == "a>b>c>d>e" and got.iloc[0]["n"] == 2
        assert got.iloc[1]["path"] == "z" and got.iloc[1]["n"] == 1


class TestCompressionRatio:
    def test_recompute_and_ordering(self, tmp_path, ray_session):
        from ocr_ray.ops.textstats import doc_compression_ratio

        rng = np.random.RandomState(7)
        rand = "".join(chr(97 + c) for c in rng.randint(0, 26, 4000))
        rep = "the same boilerplate line again and again\n" * 100
        sf = _write_docs(tmp_path, [rep, rand, None, ""])
        got = doc_compression_ratio(sf).to_pandas().set_index("doc_id")
        assert sorted(got.index.tolist()) == [1, 2]  # NULL and empty excluded
        for did, text in ((1, rep), (2, rand)):
            b = text.encode()
            assert got.loc[did, "raw_bytes"] == len(b)
            assert got.loc[did, "comp_bytes"] == len(zlib.compress(b, 6))
        assert got.loc[1, "ratio_bp"] < got.loc[2, "ratio_bp"]
