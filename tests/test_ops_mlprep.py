"""ML-prep operator mechanics: Bloom-filter soundness, global-rank edge
cases, split/sample determinism. The full-parity gate lives in
test_oracle_parity.py; these cover what the clean fixtures never hit."""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.ops.mlprep import (
    EVENTS_GLOBAL_RANK_SQL,
    _bloom_positions,
    _bloom_test,
    _BLOOM_BITS,
    events_global_rank,
    split_train_test,
)

SF = "/root/testdata/sf0.001"


class TestBloom:
    def test_no_false_negatives(self):
        """Every inserted key MUST test positive — the property the exact
        output depends on (a false negative would silently drop a row)."""
        keys = np.arange(-500, 9500, dtype=np.int64)  # includes negatives
        bitmap = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        pos = _bloom_positions(keys)
        np.bitwise_or.at(
            bitmap,
            (pos >> 6).astype(np.int64),
            np.uint64(1) << (pos.view(np.uint64) & np.uint64(63)),
        )
        assert _bloom_test(bitmap, keys).all()

    def test_false_positive_rate_sane(self):
        """Disjoint probe keys should rarely hit: with 10k keys in a 2^20-bit
        filter (k=4) the analytic rate is ~1e-5; allow two orders of margin."""
        ins = np.arange(0, 10_000, dtype=np.int64)
        probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
        bitmap = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        pos = _bloom_positions(ins)
        np.bitwise_or.at(
            bitmap,
            (pos >> 6).astype(np.int64),
            np.uint64(1) << (pos.view(np.uint64) & np.uint64(63)),
        )
        fp = _bloom_test(bitmap, probe).mean()
        assert fp < 1e-3, fp


class TestGlobalRank:
    def test_null_ts_ranks_last(self, tmp_path):
        """NULL ts must land at the END of the order (SQL ASC NULLS LAST),
        tie-broken by event_id, and ranks must stay a 1..n permutation."""
        ts = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": pa.array([5, 2, 9, 1, 7], pa.int64()),
                "ts": pa.array([ts, None, ts + dt.timedelta(hours=3), None, ts]),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(["view"] * 5),
                "value": pa.array([0.0] * 5, pa.float64()),
                "props": pa.array(["{}"] * 5),
            }
        )
        d = tmp_path / "sf_null_ts"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = events_global_rank(str(d)).to_pandas().sort_values("ts_rank")
        assert got["event_id"].tolist() == [5, 7, 9, 1, 2]
        assert sorted(got["ts_rank"]) == [1, 2, 3, 4, 5]
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.sql(EVENTS_GLOBAL_RANK_SQL).df().sort_values("ts_rank")
        assert want["event_id"].tolist() == got["event_id"].tolist()

    def test_rank_is_permutation(self):
        got = events_global_rank(SF).to_pandas()
        n = len(got)
        assert sorted(got["ts_rank"]) == list(range(1, n + 1))

    def test_hot_minute_subdivides(self, tmp_path, monkeypatch):
        """Skew: ONE hot hour (600 events in 3 minutes) with a tiny chunk
        target must split into many chunks — and ranks must still be the
        exact global row_number. Guards the minute-census chunking."""
        import numpy as np

        from ocr_ray.ops import mlprep

        monkeypatch.setattr(mlprep, "_RANK_CHUNK_TARGET", 50)
        base = dt.datetime(2024, 6, 1, 12, 0, 0)
        rng = np.random.default_rng(7)
        rows = []
        eid = 0
        for i in range(600):  # hot: 3 minutes get 200 events each
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=i % 3, microseconds=int(rng.integers(0, 59_000_000)))))
        for i in range(100):  # scattered tail over later days
            eid += 1
            rows.append((eid, base + dt.timedelta(days=1 + i)))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        d = tmp_path / "sf_hot"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = events_global_rank(str(d)).to_pandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.sql(EVENTS_GLOBAL_RANK_SQL).df()
        g = got.sort_values("event_id").reset_index(drop=True)
        w = want.sort_values("event_id").reset_index(drop=True)
        assert g["ts_rank"].tolist() == w["ts_rank"].tolist()


class TestSplit:
    def test_assignment_is_stable_and_total(self):
        """Same doc -> same split on rerun; every doc assigned; fractions
        roughly 80/10/10 (md5 uniformity at 500 docs: wide tolerance)."""
        a = split_train_test(SF).to_pandas().sort_values("doc_id")
        b = split_train_test(SF).to_pandas().sort_values("doc_id")
        assert a["split"].tolist() == b["split"].tolist()
        frac = a["split"].value_counts(normalize=True)
        assert 0.7 < frac.get("train", 0) < 0.9
        assert set(a["split"]) <= {"train", "val", "test"}


class TestGlobalRankHotMinute:
    def test_hot_single_minute_splits_at_second_grain(self, tmp_path, monkeypatch):
        """ONE minute holding 12x the chunk target must subdivide into
        second-grain chunks (the recursion added for the documented skew
        floor) and still produce exact global row_numbers."""
        import numpy as np

        from ocr_ray.ops import mlprep
        from ocr_ray.ops.mlprep import events_global_rank, EVENTS_GLOBAL_RANK_SQL

        monkeypatch.setattr(mlprep, "_RANK_CHUNK_TARGET", 50)
        base = dt.datetime(2024, 6, 1, 12, 0, 0)
        rng = np.random.default_rng(11)
        rows = []
        eid = 0
        for _ in range(600):  # ALL inside one minute, spread over seconds
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(microseconds=int(rng.integers(0, 59_000_000))))
            )
        for i in range(40):  # cold tail on later days
            eid += 1
            rows.append((eid, base + dt.timedelta(days=1 + i)))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        d = tmp_path / "sf_hot_minute"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = events_global_rank(str(d)).to_pandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.sql(EVENTS_GLOBAL_RANK_SQL).df()
        g = got.sort_values("event_id").reset_index(drop=True)
        w = want.sort_values("event_id").reset_index(drop=True)
        assert g["ts_rank"].tolist() == w["ts_rank"].tolist()

    def test_identical_timestamp_flood_still_exact(self, tmp_path, monkeypatch):
        """The documented remaining floor: every event at the SAME us.
        One oversized chunk forms (ties cannot split) but ranks stay the
        exact row_number by event_id tiebreak."""
        from ocr_ray.ops import mlprep
        from ocr_ray.ops.mlprep import events_global_rank

        monkeypatch.setattr(mlprep, "_RANK_CHUNK_TARGET", 10)
        same = dt.datetime(2024, 6, 1, 12, 0, 0)
        n = 100
        t = pa.table(
            {
                "event_id": pa.array(list(range(n, 0, -1)), pa.int64()),
                "ts": pa.array([same] * n, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([0.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "sf_flood"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        got = events_global_rank(str(d)).to_pandas().sort_values("event_id")
        assert got["ts_rank"].tolist() == list(range(1, n + 1))
