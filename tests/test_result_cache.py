"""Result-cache lifecycle: miss → fill → hit equality, input-mutation
invalidation, table-result support, pruning, torn-write invisibility."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _write_input(d, vals):
    pq.write_table(
        pa.table({"x": pa.array(vals, pa.int64())}), str(d / "data.parquet")
    )
    return str(d)


def _q(sf_dir):
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/data.parquet")
    return ds.map_batches(
        lambda t: pa.table({"x": t.column("x"), "y": pc.multiply(t.column("x"), 2)}),
        batch_format="pyarrow",
    )


class TestResultCache:
    def test_miss_fill_hit_and_invalidation(self, ray_session, tmp_path):
        from ocr_ray.state.result_cache import cache_hit, cached_query

        src = _write_input(tmp_path, [1, 2, 3])
        root = str(tmp_path / "cache")
        assert not cache_hit("double", src, cache_root=root)
        a = sorted(r["y"] for r in cached_query("double", _q, src, cache_root=root).take_all())
        assert a == [2, 4, 6]
        assert cache_hit("double", src, cache_root=root)

        # hit path: poison the recompute fn — the cache must not call it
        def boom(_):
            raise AssertionError("cache hit must not recompute")

        b = sorted(r["y"] for r in cached_query("double", boom, src, cache_root=root).take_all())
        assert b == a

        # mutate the input (force a different mtime_ns) -> miss -> fresh rows
        time.sleep(0.01)
        _write_input(tmp_path, [10])
        assert not cache_hit("double", src, cache_root=root)
        c = [r["y"] for r in cached_query("double", _q, src, cache_root=root).take_all()]
        assert c == [20]

    def test_table_result_and_prune(self, ray_session, tmp_path):
        from ocr_ray.state.result_cache import cached_query, prune_cache

        src = _write_input(tmp_path, [5])
        root = str(tmp_path / "cache")

        def table_q(sf_dir):
            return pa.table({"n": pa.array([42], pa.int64())})

        got = cached_query("answer", table_q, src, cache_root=root).take_all()
        assert got == [{"n": 42}]
        # two more fingerprints, then prune to 2
        for v in ([6], [7]):
            time.sleep(0.01)
            _write_input(tmp_path, v)
            cached_query("answer", table_q, src, cache_root=root).take_all()
        removed = prune_cache("answer", cache_root=root, keep=2)
        assert removed == 1

    def test_torn_write_is_a_miss(self, ray_session, tmp_path):
        from ocr_ray.state.result_cache import cache_hit, cached_query, input_fingerprint

        src = _write_input(tmp_path, [1])
        root = str(tmp_path / "cache")
        fp = input_fingerprint(src)
        torn = os.path.join(root, f"torn_{fp}")
        os.makedirs(torn)  # slot dir exists, no _SUCCESS: must be invisible
        pq.write_table(pa.table({"x": pa.array([999], pa.int64())}), os.path.join(torn, "junk.parquet"))
        assert not cache_hit("torn", src, cache_root=root)
        got = cached_query("torn", _q, src, cache_root=root).take_all()
        assert [r["y"] for r in got] == [2]
