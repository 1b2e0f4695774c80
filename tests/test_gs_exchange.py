"""grouped_scan exchange-transport parity: the filesystem fan-out path
must be bit-identical to the Ray sort path for both batch formats (pandas
fn via the conversion wrapper, pyarrow fn direct)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _sorted(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestExchangeParity:
    def test_pyarrow_fn_gapfill(self, ray_session, tmp_path, monkeypatch):
        import datetime as dt

        from ocr_ray.ops.timeseries import user_days_gapfilled

        base = dt.datetime(2024, 1, 1)
        t = pa.table(
            {
                "event_id": pa.array(list(range(40)), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(days=(i * 3) % 11, hours=i) for i in range(40)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([i % 5 for i in range(40)], pa.int64()),
                "event_type": pa.array(["view"] * 40),
                "value": pa.array([1.0] * 40, pa.float64()),
                "props": pa.array(["{}"] * 40),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        monkeypatch.delenv("OCR_RAY_GS_EXCHANGE", raising=False)
        a = user_days_gapfilled(str(d)).to_pandas()
        monkeypatch.setenv("OCR_RAY_GS_EXCHANGE", "fs")
        b = user_days_gapfilled(str(d)).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(_sorted(a, cols), _sorted(b, cols))

    def test_pandas_fn_assistant_echo(self, ray_session, monkeypatch):
        from ocr_ray.pipelines.conversation import conv_assistant_echo

        t = pa.table(
            {
                "conv_id": ["a"] * 4 + ["b"] * 3,
                "turn_idx": pa.array([0, 1, 2, 3, 0, 1, 2], pa.int32()),
                "role": ["assistant"] * 7,
                "text": ["x", "y", "x", "x", "q", "q", "r"],
                "tool": [""] * 7,
                "ts": pa.array([None] * 7, pa.timestamp("us")),
            }
        )
        monkeypatch.delenv("OCR_RAY_GS_EXCHANGE", raising=False)
        a = conv_assistant_echo(rd.from_arrow(t)).to_pandas()
        monkeypatch.setenv("OCR_RAY_GS_EXCHANGE", "fs")
        b = conv_assistant_echo(rd.from_arrow(t)).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            _sorted(a, cols), _sorted(b, cols), check_dtype=False
        )
        assert a.set_index("conv_id").loc["a", "n_echo"] == 2


class TestPartIds:
    """The vectorized exchange partitioner (VERDICT r2 #4)."""

    def test_pinned_assignment(self):
        """Cross-process / cross-version stability pin: pandas hash_array
        uses a FIXED siphash key, so these golden ids must never drift —
        a drift would split a key's rows across partitions mid-job."""
        from ocr_ray.pipelines.conversation import _part_ids

        keys = pa.chunked_array(
            [pa.array(["conv-00000000", "conv-00000001", "alpha", "beta", None, ""])]
        )
        assert _part_ids(keys, 64).to_pylist() == [1, 31, 26, 40, 18, 6]
        ints = pa.chunked_array([pa.array([0, 1, 2, 12345678901], pa.int64())])
        assert _part_ids(ints, 64).to_pylist() == [0, 37, 10, 40]

    def test_same_key_same_part_across_batches(self):
        from ocr_ray.pipelines.conversation import _part_ids

        a = _part_ids(pa.chunked_array([pa.array(["k1", "k2", "k3"])]), 16)
        b = _part_ids(pa.chunked_array([pa.array(["k3", "k1"])]), 16)
        assert a.to_pylist()[0] == b.to_pylist()[1]
        assert a.to_pylist()[2] == b.to_pylist()[0]

    def test_balance(self):
        import collections

        from ocr_ray.pipelines.conversation import _part_ids

        keys = pa.chunked_array([pa.array([f"conv-{i:08d}" for i in range(20000)])])
        c = collections.Counter(_part_ids(keys, 64).to_pylist())
        assert len(c) == 64
        assert max(c.values()) < 2 * min(c.values())

    def test_null_matches_str_contract(self):
        """null hashes as the string 'None' (the str(v) contract)."""
        from ocr_ray.pipelines.conversation import _part_ids

        got = _part_ids(pa.chunked_array([pa.array([None, "None"])]), 64)
        assert got.to_pylist()[0] == got.to_pylist()[1]


class TestHotKeyIsolation:
    """grouped_scan hot-key census + isolation (VERDICT r2 #5): a planted
    10%-hot key must get a dedicated partition, every partition's row count
    must be bounded, and the output must be identical to the unsalted run
    on BOTH exchange transports."""

    def _input(self):
        import numpy as np

        n = 20_000
        rng = np.random.default_rng(5)
        keys = [f"user-{i % 997:04d}" for i in range(n)]
        hot_rows = n // 10
        keys[:hot_rows] = ["hot-key"] * hot_rows  # one key with 10% of rows
        vals = rng.integers(0, 1000, n)
        t = pa.table(
            {
                "k": pa.array(keys),
                "v": pa.array(vals, pa.int64()),
            }
        )
        return rd.from_arrow(t).repartition(8)

    def _run(self, exchange, **kw):
        from ocr_ray.pipelines.conversation import grouped_scan

        def scan(t: pa.Table) -> pa.Table:
            # per-key sum + the partition's total row count (the bound probe);
            # defined as a closure so cloudpickle ships it by value (the test
            # module is not importable inside Ray workers)
            g = t.group_by(["k"]).aggregate([("v", "sum")])
            return g.rename_columns(["k", "v_sum"]).append_column(
                "part_rows", pa.array([t.num_rows] * g.num_rows, pa.int64())
            )

        out = grouped_scan(
            self._input(), "k", scan, batch_format="pyarrow",
            num_parts=16, exchange=exchange, **kw,
        ).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    def test_identical_output_and_bounded_partitions(self):
        for exchange in ("ray", "fs"):
            base = self._run(exchange)
            isolated = self._run(exchange, hot_key_budget=1500)
            pd.testing.assert_frame_equal(
                base[["k", "v_sum"]], isolated[["k", "v_sum"]]
            )
            # the hot key sits ALONE in its dedicated partition
            hot = isolated[isolated.k == "hot-key"]
            assert int(hot.part_rows.iloc[0]) == 2000, exchange
            # and no other partition carries the hot key's weight:
            # bound = census budget + expected per-partition share slack
            others = isolated[isolated.k != "hot-key"]
            assert others.part_rows.max() < 2500, exchange
            # without isolation the hot key's partition exceeds the bound
            base_hot = base[base.k == "hot-key"]
            assert int(base_hot.part_rows.iloc[0]) > 2500, exchange

    def test_explicit_hot_keys_skip_census(self):
        isolated = self._run("ray", hot_keys=["hot-key"])
        assert int(isolated[isolated.k == "hot-key"].part_rows.iloc[0]) == 2000
