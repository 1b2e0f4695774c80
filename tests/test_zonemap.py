"""Zone-map sidecars (state/sink.write_zonemap_sidecars /
prune_zonemap_files): exact per-file min/max skipping for range predicates
on arbitrary columns — the third file-skipping leg next to the range
manifests (clustered BETWEEN) and Bloom sidecars (equality probes)."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ocr_ray.state.sink import (
    prune_zonemap_files,
    write_partitioned,
    write_zonemap_sidecars,
)


def _committed_table(tmp_path, ray_session):
    """Partitioned commit with DISJOINT value bands per partition: rows of
    band b (v in [1000*b, 1000*b + 990]) share a conv_id probed to hash to
    partition b, so each data file owns exactly one band and exact pruning
    is decidable."""
    import zlib

    band_conv = {}
    i = 0
    while len(band_conv) < 4:
        pid = zlib.crc32(f"probe{i}".encode()) % 4
        band_conv.setdefault(pid, f"probe{i}")
        i += 1
    n = 400
    base = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "conv_id": pa.array([band_conv[i // 100] for i in range(n)], pa.string()),
            "turn_idx": pa.array(list(range(n)), pa.int32()),
            "id": pa.array(list(range(n)), pa.int64()),
            "v": pa.array([i * 10 for i in range(n)], pa.int64()),
            "name": pa.array([f"row{i:04d}" for i in range(n)], pa.string()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=i) for i in range(n)], pa.timestamp("us")
            ),
        }
    )
    out = str(tmp_path / "table")
    write_partitioned(rd.from_arrow(t), out, num_partitions=4)
    return out, t


def _scan_matches(out_dir, column, lo, hi):
    """Ground truth: files that actually hold a matching row."""
    hits = []
    import glob

    for p in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        col = pq.read_table(p, columns=[column]).column(column)
        vals = [x for x in col.to_pylist() if x is not None]
        if any((lo is None or x >= lo) and (hi is None or x <= hi) for x in vals):
            hits.append(p)
    return hits


class TestZonemapSidecars:
    def test_no_false_negatives_and_exact_on_planted(self, ray_session, tmp_path):
        out, _ = _committed_table(tmp_path, ray_session)
        n_files = write_zonemap_sidecars(out, columns=["v", "name", "ts"])
        assert n_files == 4
        for lo, hi in ((0, 90), (1995, 2005), (3990, None), (None, 50), (9999999, None)):
            kept = prune_zonemap_files(out, column="v", lo=lo, hi=hi)
            truth = _scan_matches(out, "v", lo, hi)
            assert set(truth) <= set(kept)  # never drops a matching file
        # equality probe lo == hi prunes to exactly the owning file(s)
        kept = prune_zonemap_files(out, column="v", lo=2000, hi=2000)
        assert kept == _scan_matches(out, "v", 2000, 2000)

    def test_string_and_timestamp_columns(self, ray_session, tmp_path):
        out, _ = _committed_table(tmp_path, ray_session)
        write_zonemap_sidecars(out, columns=["v", "name", "ts"])
        kept = prune_zonemap_files(out, column="name", lo="row0100", hi="row0105")
        assert set(_scan_matches(out, "name", "row0100", "row0105")) <= set(kept)
        # timestamp bounds in int microseconds (the sidecar encoding)
        base = dt.datetime(2024, 1, 1)
        lo_us = int((base + dt.timedelta(minutes=100)).timestamp() * 1e6)
        hi_us = int((base + dt.timedelta(minutes=105)).timestamp() * 1e6)
        kept = prune_zonemap_files(out, column="ts", lo=lo_us, hi=hi_us)
        assert 1 <= len(kept) <= 4
        truth_files = _scan_matches(out, "v", 100 * 10, 105 * 10)  # same rows
        assert set(truth_files) <= set(kept)

    def test_conservative_on_missing_sidecar_or_column(self, ray_session, tmp_path):
        out, _ = _committed_table(tmp_path, ray_session)
        write_zonemap_sidecars(out, columns=["v"])
        # column not indexed -> every file kept
        kept = prune_zonemap_files(out, column="name", lo="a", hi="b")
        assert len(kept) == 4
        # delete one sidecar -> that file is kept even if its range misses
        import glob

        side = sorted(
            glob.glob(os.path.join(out, "_manifest", "zonemap-*.json"))
        )[0]
        victim = os.path.join(out, os.path.basename(side)[len("zonemap-"):-len(".json")])
        os.remove(side)
        kept = prune_zonemap_files(out, column="v", lo=10**9, hi=None)
        assert kept == [victim]

    def test_all_null_file_prunes(self, ray_session, tmp_path):
        t = pa.table(
            {
                "conv_id": pa.array(["a", "b"], pa.string()),
                "turn_idx": pa.array([0, 0], pa.int32()),
                "id": pa.array([1, 2], pa.int64()),
                "v": pa.array([None, None], pa.int64()),
            }
        )
        out = str(tmp_path / "nulls")
        write_partitioned(rd.from_arrow(t), out, num_partitions=1)
        write_zonemap_sidecars(out, columns=["v"])
        # a range predicate never matches NULL: nothing to read
        assert prune_zonemap_files(out, column="v", lo=0, hi=10) == []


class TestReadPruned:
    def test_equals_full_scan_filter(self, ray_session, tmp_path):
        from ocr_ray.state.sink import read_pruned, write_bloom_sidecars

        out, t = _committed_table(tmp_path, ray_session)
        write_zonemap_sidecars(out, columns=["v"])
        write_bloom_sidecars(out, key="id")
        # range predicate through zone maps
        ds = read_pruned(out, column="v", lo=995, hi=2005)
        got = sorted(
            r["id"] for r in ds.take_all() if 995 <= r["v"] <= 2005
        )
        want = sorted(i for i in range(400) if 995 <= i * 10 <= 2005)
        assert got == want
        # point probes through blooms
        ds2 = read_pruned(out, column="id", keys=[7, 399])
        ids = {r["id"] for r in ds2.take_all()}
        assert {7, 399} <= ids
        # disjoint range -> typed empty dataset, schema preserved
        ds3 = read_pruned(out, column="v", lo=10**9, hi=None)
        assert ds3.count() == 0
        assert "v" in ds3.schema().names
