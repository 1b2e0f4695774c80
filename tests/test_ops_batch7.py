"""Planted-edge tests for the session-7 op batch: label_centroids (ragged +
NULL-label array aggregate), profile_table (distinct/null census),
user_rolling_median_spend (quantile_disc convention pin) and
events_debounce (lag-vs-chained semantics pin)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(dirpath, name, table: pa.Table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))
    return str(dirpath)


class TestLabelCentroids:
    def test_ragged_null_label_exact(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import label_centroids

        emb = pa.array(
            [[1.0, 2.0], [3.0], None, [0.5, -0.5]],
            pa.list_(pa.float32()),
        )
        lab = pa.array([7, 7, 7, None], pa.int32())
        sf = _write(tmp_path, "embeddings", pa.table({"label": lab, "embedding": emb}))
        got = (
            label_centroids(sf)
            .to_pandas()
            .sort_values(["label", "dim_idx"], na_position="first")
            .reset_index(drop=True)
        )
        # label 7: dim1 sums 1e6+3e6 over 2 vecs; dim2 only the first vec.
        # NULL embedding contributes nothing; NULL label is its own group.
        want = pd.DataFrame(
            {
                "label": pd.array([None, None, 7, 7], dtype="Int64"),
                "dim_idx": [1, 2, 1, 2],
                "n_vecs": [1, 1, 2, 1],
                "sum_q": [500_000, -500_000, 4_000_000, 2_000_000],
            }
        )
        assert got["dim_idx"].tolist() == want["dim_idx"].tolist()
        assert got["n_vecs"].tolist() == want["n_vecs"].tolist()
        assert got["sum_q"].tolist() == want["sum_q"].tolist()
        assert pd.isna(got["label"][0]) and pd.isna(got["label"][1])
        assert got["label"][2] == 7


class TestProfileTable:
    def test_counts_and_float_zero_normalization(self, tmp_path, ray_session):
        from ocr_ray.ops.dq import profile_table

        t = pa.table(
            {
                "k": pa.array([1, 1, 2, None], pa.int64()),
                "x": pa.array([0.0, -0.0, 1.5, 1.5], pa.float64()),
            }
        )
        sf = _write(tmp_path, "orders", t)
        got = profile_table(sf, "orders", ["k", "x"]).set_index("col_name")
        assert got.loc["k", "n_rows"] == 4
        assert got.loc["k", "n_null"] == 1
        assert got.loc["k", "n_distinct"] == 2
        # -0.0 and +0.0 are one distinct value (SQL semantics)
        assert got.loc["x", "n_distinct"] == 2


class TestRollingMedian:
    def test_quantile_disc_convention(self, tmp_path, ray_session):
        """DuckDB quantile_disc(0.5) takes the (k-1)//2-th smallest
        (lower median) — pinned against a hand computation."""
        from ocr_ray.ops.timeseries import user_rolling_median_spend

        n = 6
        t = pa.table(
            {
                "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderdate": pa.array(
                    pd.date_range("2024-01-01", periods=n, freq="D"), pa.timestamp("us")
                ),
                "o_totalprice": pa.array([10.0, 20.0, 5.0, 40.0, 30.0, 1.0]),
            }
        )
        sf = _write(tmp_path, "orders", t)
        got = (
            user_rolling_median_spend(sf)
            .to_pandas()
            .sort_values("o_orderkey")["med5_cents"]
            .tolist()
        )
        # windows (cents): [1000], [1000,2000], [1000,2000,500],
        # [..,4000], [..,3000], then rows 2-6
        # lower medians: 1000, 1000, 1000, 1000, 2000, med of
        # [2000,500,4000,3000,100] = 2000
        assert got == [1000, 1000, 1000, 1000, 2000, 2000]

    def test_customer_boundary_resets(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_rolling_median_spend

        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    pd.date_range("2024-01-01", periods=3, freq="D"), pa.timestamp("us")
                ),
                "o_totalprice": pa.array([10.0, 20.0, 99.0]),
            }
        )
        sf = _write(tmp_path, "orders", t)
        got = (
            user_rolling_median_spend(sf)
            .to_pandas()
            .sort_values("o_orderkey")["med5_cents"]
            .tolist()
        )
        assert got == [1000, 1000, 9900]  # cust 2 window restarts


class TestDebounce:
    def test_lag_not_chained(self, tmp_path, ray_session):
        """Semantics pin: the gap is measured from the previous ARRIVAL,
        not the previous KEPT event — t0+36h is dropped because it is 24h
        (= threshold, not >) after t0+12h, even though a chained debounce
        measuring from kept-t0 would keep it."""
        from ocr_ray.ops.timeseries import events_debounce

        h = 3_600_000_000  # us
        base = pd.Timestamp("2024-01-01").value // 1000  # us
        ts = pa.array(
            np.array([base, base + 12 * h, base + 36 * h], np.int64),
            pa.timestamp("us"),
        )
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "user_id": pa.array([5, 5, 5], pa.int64()),
                "event_type": pa.array(["click"] * 3),
                "ts": ts,
            }
        )
        sf = _write(tmp_path, "events", t)
        got = events_debounce(sf).to_pandas()["event_id"].tolist()
        assert sorted(got) == [1]

    def test_type_partitions_independent(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import events_debounce

        base = pd.Timestamp("2024-01-01").value // 1000
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "user_id": pa.array([5, 5], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "ts": pa.array(np.array([base, base + 1], np.int64), pa.timestamp("us")),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = events_debounce(sf).to_pandas()["event_id"].tolist()
        assert sorted(got) == [1, 2]  # different types never debounce each other


class TestSessionPaths:
    def test_truncation_and_split(self, tmp_path, ray_session):
        """10-event session truncates to the first 8 steps; a >1h gap
        starts a new session."""
        from ocr_ray.ops.timeseries import session_paths

        base = pd.Timestamp("2024-01-01").value // 1000
        m = 60_000_000  # one minute in us
        # user 1: 10 events one minute apart (one session)
        ts1 = [base + i * m for i in range(10)]
        et1 = [f"t{i}" for i in range(10)]
        # user 2: two events 2h apart (two single-step sessions)
        ts2 = [base, base + 7_200_000_000]
        et2 = ["a", "b"]
        t = pa.table(
            {
                "event_id": pa.array(range(1, 13), pa.int64()),
                "user_id": pa.array([1] * 10 + [2, 2], pa.int64()),
                "event_type": pa.array(et1 + et2),
                "ts": pa.array(np.array(ts1 + ts2, np.int64), pa.timestamp("us")),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = session_paths(sf)
        paths = dict(zip(got["path"], got["n_sessions"]))
        assert paths[">".join(f"t{i}" for i in range(8))] == 1  # truncated at 8
        assert paths["a"] == 1 and paths["b"] == 1  # gap split sessions
        assert len(got) == 3
