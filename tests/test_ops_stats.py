"""Stats-family ops (ocr_ray/ops/stats.py): mergeable moments, integer
histogram, covariance numerators, market-basket pair counts — clean parity at
sf0.001, dirty-input parity (NULLs, negatives, pre-1970 timestamps), and a
closed-form check that the integer numerators really are the variance."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.ops.stats import (
    EVENT_VALUE_MOMENTS_SQL,
    EVENTS_VALUE_HISTOGRAM_SQL,
    PART_PAIR_COUNTS_SQL,
    PRICE_QTY_MOMENTS_SQL,
    event_value_moments,
    events_value_histogram,
    part_pair_counts,
    price_qty_moments,
)

SF = "/root/testdata/sf0.001"


def _compare(got, sql, sf_dir, tables=("events", "lineitem")):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    want = con.sql(sql).df()
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    w = want.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    assert g.astype(str).values.tolist() == w.astype(str).values.tolist()


class TestCleanParity:
    def test_event_value_moments(self, ray_session):
        _compare(event_value_moments(SF), EVENT_VALUE_MOMENTS_SQL, SF)

    def test_events_value_histogram(self, ray_session):
        got = events_value_histogram(SF).to_pandas()
        _compare(got, EVENTS_VALUE_HISTOGRAM_SQL, SF)
        # totality: bins cover every non-null value exactly once
        con = duckdb.connect()
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/events.parquet') WHERE value IS NOT NULL"
        ).fetchone()[0]
        assert got["n"].sum() == n

    def test_price_qty_moments(self, ray_session):
        _compare(price_qty_moments(SF), PRICE_QTY_MOMENTS_SQL, SF)

    def test_part_pair_counts(self, ray_session):
        _compare(part_pair_counts(SF), PART_PAIR_COUNTS_SQL, SF)


class TestNumeratorsAreVariance:
    def test_m2_matches_numpy(self, ray_session):
        got = event_value_moments(SF).to_pandas()
        row = got[got["n"] >= 3].iloc[0]
        con = duckdb.connect()
        cents = con.sql(
            f"""SELECT CAST(ROUND(value*100) AS BIGINT) c
                FROM read_parquet('{SF}/events.parquet')
                WHERE value IS NOT NULL AND ts IS NOT NULL
                  AND event_type = '{row.event_type}'
                  AND epoch_us(ts) // 86400000000 = {row.day}"""
        ).df()["c"].to_numpy(np.int64)
        n = len(cents)
        assert n == row.n
        var = row.m2_num / (n * (n - 1))
        assert var == pytest.approx(np.var(cents, ddof=1), rel=1e-12)

    def test_cov_sign_and_scale(self, ray_session):
        got = price_qty_moments(SF).to_pandas()
        row = got[got["n"] >= 3].iloc[0]
        # corr in [-1, 1]: cov_num^2 <= sxx_num * syy_num (Cauchy-Schwarz)
        assert row.cov_num**2 <= row.sxx_num * row.syy_num


def _dirty_dir(tmp_path) -> str:
    d = tmp_path / "sf_dirty_stats"
    d.mkdir()
    t0 = dt.datetime(2024, 1, 1)
    pre = dt.datetime(1969, 12, 31, 5)  # pre-epoch: floor vs trunc division
    events = pa.table(
        {
            "event_id": pa.array(list(range(1, 10)), pa.int64()),
            "ts": pa.array(
                [t0, t0, None, pre, t0 + dt.timedelta(days=2), t0, None, pre, t0],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * 9, pa.int64()),
            "event_type": pa.array(
                ["view", None, "click", "view", None, "click", "view", "view", "click"]
            ),
            "value": pa.array([12.5, 3.0, 5.0, -7.25, None, 0.005, 1.0, 499.99, -0.005]),
            "props": pa.array(["{}"] * 9),
        }
    )
    pq.write_table(events, str(d / "events.parquet"))
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, None, 3, 1], pa.int64()),
            "l_partkey": pa.array([10, 20, 10, 10, 20, 30, None, 20], pa.int64()),
            "l_suppkey": pa.array([1] * 8, pa.int64()),
            "l_linenumber": pa.array(list(range(1, 9)), pa.int32()),
            "l_quantity": pa.array([1.0, -2.0, 3.0, None, 5.0, 6.0, 7.0, 8.0]),
            "l_extendedprice": pa.array([10.4, 20.6, 30.0, 40.0, None, 60.0, 70.0, 80.5]),
            "l_discount": pa.array([0.0] * 8),
            "l_tax": pa.array([0.0] * 8),
            "l_returnflag": pa.array(["A", None, "A", "R", "R", "A", "A", "A"]),
            "l_linestatus": pa.array(["F", "F", None, "O", "O", "F", "F", "F"]),
            "l_shipdate": pa.array(
                [t0, t0, t0, None, t0, t0, t0, t0 + dt.timedelta(days=40)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    return str(d)


@pytest.fixture()
def dirty(tmp_path, ray_session):
    return _dirty_dir(tmp_path)


class TestDirtyParity:
    def test_event_value_moments_dirty(self, dirty):
        got = event_value_moments(dirty).to_pandas()
        # NULL event_type survives as its own group; pre-1970 day is negative
        assert got["event_type"].isna().any()
        assert (got["day"] < 0).any()
        _compare(got, EVENT_VALUE_MOMENTS_SQL, dirty)

    def test_histogram_dirty(self, dirty):
        # negative values clamp into bin 0 in both engines
        _compare(events_value_histogram(dirty), EVENTS_VALUE_HISTOGRAM_SQL, dirty)

    def test_price_qty_moments_dirty(self, dirty):
        got = price_qty_moments(dirty).to_pandas()
        assert got["l_returnflag"].isna().any() and got["l_linestatus"].isna().any()
        _compare(got, PRICE_QTY_MOMENTS_SQL, dirty)

    def test_part_pair_counts_dirty(self, dirty):
        got = part_pair_counts(dirty).to_pandas()
        # order 1 has parts {10, 20} (10 and 20 both duplicated -> DISTINCT),
        # order 2 has {10, 20}; NULL orderkey/partkey rows drop
        _compare(got, PART_PAIR_COUNTS_SQL, dirty)
        assert got.iloc[0][["part_a", "part_b", "n"]].tolist() == [10, 20, 2]


class TestEventValueOutliers:
    def test_planted_outlier_flagged(self, ray_session, tmp_path):
        """A tight cluster plus one extreme value: exactly the extreme row
        survives the 3-sigma integer gate (closed form: for 99 values at
        100 cents and one at 10_000 cents, the planted point is ~9.9 sigma
        out and no cluster point is past 3)."""
        from ocr_ray.ops.stats import event_value_outliers

        n = 100
        vals = [1.00] * (n - 1) + [100.00]
        t = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([dt.datetime(2024, 1, 1)] * n),
                "user_id": pa.array([7] * n, pa.int64()),
                "event_type": pa.array(["x"] * n),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = event_value_outliers(str(tmp_path)).to_pandas()
        assert got["event_id"].tolist() == [n - 1]
        assert got["value_cents"].tolist() == [10_000]

    def test_clean_parity(self, ray_session):
        from ocr_ray.ops.stats import EVENT_VALUE_OUTLIERS_SQL, event_value_outliers

        got = event_value_outliers(SF)
        _compare(got, EVENT_VALUE_OUTLIERS_SQL, SF, tables=("events",))

    def test_zero_variance_flags_nothing(self, ray_session, tmp_path):
        """All-identical values: RHS = 0 and every |n*x - s1| = 0 — the
        strict > keeps the result empty in both engines (no div-by-zero
        anywhere because sigma never materializes)."""
        from ocr_ray.ops.stats import event_value_outliers

        t = pa.table(
            {
                "event_id": pa.array(range(10), pa.int64()),
                "value": pa.array([5.0] * 10, pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        assert event_value_outliers(str(tmp_path)).count() == 0


class TestMadOutliers:
    def test_planted_spike_flagged_sigma_blind(self, ray_session, tmp_path):
        """One extreme spike among tight values: MAD flags it (and only
        it), even though the spike itself inflates the naive sigma."""
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.ops.stats import event_value_outliers_mad

        vals = [10.00, 10.01, 10.02, 10.03, 10.04, 10.05, 10.06, 9999.99]
        t = pa.table(
            {
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array([0] * len(vals), pa.timestamp("us")),
                "user_id": pa.array([1] * len(vals), pa.int64()),
                "event_type": pa.array(["view"] * len(vals)),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * len(vals)),
            }
        )
        pq_.write_table(t, tmp_path / "events.parquet")
        out = event_value_outliers_mad(str(tmp_path)).to_pandas()
        assert out.event_id.tolist() == [7]
        assert out.value_cents.tolist() == [999999]


class TestEventsValueWinsorized:
    def test_planted_bounds_and_clipping(self, tmp_path, ray_session):
        """100 known values: p1/p99 discrete bounds land on the 1st and
        99th sorted values ((n-1)*bp//1e4 + 1 rank convention); tails are
        clipped into the sum; negatives survive the bucket math."""
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.ops.stats import events_value_winsorized

        # sorted cents: -5000, then 2..99 (dollars 0.02..0.99), then 99999
        vals = [-50.00] + [i / 100 for i in range(2, 100)] + [999.99]
        t = pa.table(
            {
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array([0] * len(vals), pa.timestamp("us")),
                "user_id": pa.array([1] * len(vals), pa.int64()),
                "event_type": pa.array(["view"] * len(vals)),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * len(vals)),
            }
        )
        pq_.write_table(t, tmp_path / "events.parquet")
        (row,) = events_value_winsorized(str(tmp_path)).to_pylist()
        # n=100: lo rank = 99*100//10000+1 = 1 -> -5000; hi rank = 99*9900//10000+1 = 99 -> 99 cents
        assert row["n_values"] == 100
        assert row["lo_cents"] == -5000
        assert row["hi_cents"] == 99
        assert row["n_clipped_lo"] == 0
        assert row["n_clipped_hi"] == 1
        assert row["wsum_cents"] == sum(range(2, 100)) + 99 + (-5000)
