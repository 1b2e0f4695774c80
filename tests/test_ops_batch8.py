"""Planted-edge tests for the session-7 continuation op batch:
events_exact_k_sample (exactly-k, shard-order invariance),
dedup_incremental_docs (delta-vs-state semantics, negative-id parity),
order_percentile_cont (interpolation arithmetic pinned against closed
forms, n=1 and frac=0 edges)."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def _write(dirpath, name, table: pa.Table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))
    return str(dirpath)


class TestExactKSample:
    def test_exactly_k_and_deterministic(self, tmp_path, ray_session):
        from ocr_ray.ops.mlprep import events_exact_k_sample

        n = 500
        t = pa.table(
            {
                "event_id": pa.array(list(range(n)), pa.int64()),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(["t"] * n, pa.string()),
                "value": pa.array([float(i) for i in range(n)], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = events_exact_k_sample(sf, k=10)
        assert got.num_rows == 10
        # closed form: the 10 ids with the smallest md5-prefix keys
        keyed = sorted(
            range(n),
            key=lambda i: (hashlib.md5(str(i).encode()).digest()[:8], i),
        )[:10]
        assert sorted(got.column("event_id").to_pylist()) == sorted(keyed)
        # rerun is identical (no RNG state)
        again = events_exact_k_sample(sf, k=10)
        assert got.column("event_id").to_pylist() == again.column("event_id").to_pylist()

    def test_k_larger_than_input(self, tmp_path, ray_session):
        from ocr_ray.ops.mlprep import events_exact_k_sample

        t = pa.table(
            {
                "event_id": pa.array([5, None, 6], pa.int64()),
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_type": pa.array(["a", "b", "c"], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = events_exact_k_sample(sf, k=100)
        # NULL id has no key; the two keyed rows both sampled
        assert sorted(got.column("event_id").to_pylist()) == [5, 6]


class TestDedupIncremental:
    def test_delta_vs_state(self, tmp_path, ray_session):
        from ocr_ray.ops.dedup import dedup_incremental_docs

        # corpus (even ids): texts A, B.  delta (odd ids): A (dup of state),
        # C twice (intra-delta dup -> min id wins), NULL text (never survives)
        t = pa.table(
            {
                "doc_id": pa.array([0, 2, 1, 3, 5, 7], pa.int64()),
                "text": pa.array(["A", "B", "A", "C", "C", None], pa.string()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = sorted(dedup_incremental_docs(sf).to_pandas()["doc_id"].tolist())
        assert got == [3]

    def test_negative_id_parity(self, tmp_path, ray_session):
        from ocr_ray.ops.dedup import dedup_incremental_docs

        # -3 & 1 == 1 (two's complement): negative odd ids are delta
        t = pa.table(
            {
                "doc_id": pa.array([-4, -3], pa.int64()),
                "text": pa.array(["X", "Y"], pa.string()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = dedup_incremental_docs(sf).to_pandas()["doc_id"].tolist()
        assert got == [-3]


class TestPercentileCont:
    def _sf(self, tmp_path, prices):
        t = pa.table({"o_totalprice": pa.array(prices, pa.float64())})
        return _write(tmp_path, "orders", t)

    def test_interpolation_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.corpus import order_percentile_cont

        # cents 100, 200, 300, 400 -> p25: RN=(3)*2500=7500 -> lo rank 1,
        # f=7500: 100*(2500) + 200*7500 = 1_750_000 (== 175 cents * 1e4)
        sf = self._sf(tmp_path, [1.0, 2.0, 3.0, 4.0])
        got = {
            r["q_bp"]: r["value_e4"] for r in order_percentile_cont(sf).to_pylist()
        }
        assert got[2500] == 100 * 2500 + 200 * 7500
        assert got[5000] == 200 * 5000 + 300 * 5000  # midpoint of 200,300
        assert got[7500] == 300 * 7500 + 400 * 2500
        assert got[9000] == 300 * 3000 + 400 * 7000  # RN=2.7e4: lo=300 f=7000

    def test_single_row_and_frac_zero(self, tmp_path, ray_session):
        from ocr_ray.ops.corpus import order_percentile_cont

        sf = self._sf(tmp_path, [5.0])
        got = {r["q_bp"]: r["value_e4"] for r in order_percentile_cont(sf).to_pylist()}
        # n=1: every percentile is the single value (500 cents * 1e4)
        assert all(v == 500 * 10_000 for v in got.values())

    def test_empty(self, tmp_path, ray_session):
        from ocr_ray.ops.corpus import order_percentile_cont

        sf = self._sf(tmp_path, [])
        assert order_percentile_cont(sf).num_rows == 0


class TestUserValueTrend:
    def test_closed_form_slope(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import _TREND_BASE_US, user_value_trend

        # user 1: y = 100 + 50*x cents at x = 0,1,2 minutes -> exact slope
        # num/den reduces to 50/1 (num = n*Sxy - Sx*Sy, den = n*Sxx - Sx^2)
        base = _TREND_BASE_US
        ts = pa.array(
            [base, base + 60_000_000, base + 120_000_000, base + 60_000_000],
            pa.timestamp("us"),
        )
        t = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": ts,
                "value": pa.array([1.00, 1.50, 2.00, 9.99], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = user_value_trend(sf).to_pandas().set_index("user_id")
        # x=(0,1,2), y=(100,150,200): Sx=3 Sy=450 Sxy=550 Sxx=5
        assert got.loc[1, "slope_num"] == 3 * 550 - 3 * 450  # 300
        assert got.loc[1, "slope_den"] == 3 * 5 - 9  # 6 -> slope 50/1
        assert got.loc[2, "slope_den"] == 0  # single point: undefined slope

    def test_null_rows_excluded(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import _TREND_BASE_US, user_value_trend

        t = pa.table(
            {
                "user_id": pa.array([1, 1, None], pa.int64()),
                "ts": pa.array([_TREND_BASE_US, None, _TREND_BASE_US], pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = user_value_trend(sf).to_pandas()
        assert got["n"].tolist() == [1]


class TestPropsKStats:
    def test_json_edge_semantics(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import events_props_k_stats

        props = pa.array(
            [
                '{"k": 3}',
                '{"k": -2}',
                '{"k": "7"}',  # string-int casts (TRY_CAST mirror)
                '{"k": true}',  # bool does not
                '{"k": 1.5}',  # float does not
                '{"x": 1}',  # missing key
                None,
                '{"k": 10}',
            ],
            pa.string(),
        )
        t = pa.table(
            {
                "event_type": pa.array(["a"] * 7 + [None], pa.string()),
                "props": props,
            }
        )
        sf = _write(tmp_path, "events", t)
        got = events_props_k_stats(sf).to_pandas()
        a = got[got["event_type"] == "a"].iloc[0]
        assert (a["n_k"], a["sum_k"], a["min_k"], a["max_k"]) == (3, 8, -2, 7)
        nul = got[got["event_type"].isna()].iloc[0]
        assert (nul["n_k"], nul["sum_k"]) == (1, 10)  # NULL type is a group


class TestPartitionChecksums:
    def _sf(self, tmp_path, keys, status):
        tmp_path.mkdir(parents=True, exist_ok=True)
        t = pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_orderstatus": pa.array(status, pa.string()),
                "o_orderpriority": pa.array(["1-URGENT"] * len(keys), pa.string()),
                "o_totalprice": pa.array([10.0 + k for k in keys], pa.float64()),
            }
        )
        return _write(tmp_path, "orders", t)

    def test_mutation_flips_exactly_its_bucket(self, tmp_path, ray_session):
        from ocr_ray.ops.dq import orders_partition_checksums

        keys = list(range(64))
        a = orders_partition_checksums(self._sf(tmp_path / "a", keys, ["O"] * 64))
        mutated = ["O"] * 64
        mutated[37] = "F"  # key 37 -> bucket 37 & 15 == 5
        b = orders_partition_checksums(self._sf(tmp_path / "b", keys, mutated))
        ca = dict(zip(a.column("bucket").to_pylist(), a.column("checksum").to_pylist()))
        cb = dict(zip(b.column("bucket").to_pylist(), b.column("checksum").to_pylist()))
        diff = [k for k in ca if ca[k] != cb[k]]
        assert diff == [5]
        assert a.column("n_rows").to_pylist() == b.column("n_rows").to_pylist()

    def test_order_independence(self, tmp_path, ray_session):
        from ocr_ray.ops.dq import orders_partition_checksums

        keys = list(range(40))
        a = orders_partition_checksums(self._sf(tmp_path / "fwd", keys, ["O"] * 40))
        b = orders_partition_checksums(
            self._sf(tmp_path / "rev", keys[::-1], ["O"] * 40)
        )
        assert a.to_pylist() == b.to_pylist()


class TestMergedWindows:
    def test_coalescing_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import cust_merged_windows

        day = 86_400_000_000
        base = 1_700_000_000_000_000
        # cust 1: days 0, 10, 50 -> windows [0,30],[10,40],[50,80]: two islands
        # cust 2: day 5 alone
        ts = pa.array(
            [base, base + 10 * day, base + 50 * day, base + 5 * day],
            pa.timestamp("us"),
        )
        t = pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderdate": ts,
                "o_totalprice": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = (
            cust_merged_windows(str(tmp_path))
            .to_pandas()
            .sort_values(["o_custkey", "island_start"])
            .reset_index(drop=True)
        )
        assert got["n_orders"].tolist() == [2, 1, 1]
        assert got["total_c"].tolist() == [300, 400, 800]
        spans = (got["island_end"] - got["island_start"]).dt.days.tolist()
        assert spans == [40, 30, 30]  # first island merged two windows

    def test_touching_windows_merge(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import cust_merged_windows

        day = 86_400_000_000
        base = 1_700_000_000_000_000
        # second window starts EXACTLY at the first's end (closed: merge)
        ts = pa.array([base, base + 30 * day], pa.timestamp("us"))
        t = pa.table(
            {
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderdate": ts,
                "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = cust_merged_windows(str(tmp_path)).to_pandas()
        assert len(got) == 1 and got["n_orders"][0] == 2


class TestQ16TierParity:
    def test_local_and_distributed_tiers_identical(self, ray_session):
        from ocr_ray.pipelines.tpch_more import q16_supplier_counts

        sf = "/root/testdata/sf0.001"
        local = q16_supplier_counts(sf)  # under the 20M gate
        dist = q16_supplier_counts(sf, local_gate_rows=0)  # force shuffle plan
        keys = ["p_brand", "p_type", "p_size"]
        a = local.to_pandas() if hasattr(local, "to_pandas") else local
        b = dist.to_pandas()
        a = a.sort_values(keys).reset_index(drop=True)
        b = b.sort_values(keys).reset_index(drop=True)[a.columns]
        assert a.astype(str).values.tolist() == b.astype(str).values.tolist()


class TestPriceReconciliation:
    def test_all_four_statuses(self, tmp_path, ray_session):
        from ocr_ray.ops.dq import orders_price_reconciliation

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                # 1: matches (1.00+2.00), 2: mismatches, 3: no lines,
                # 4: NULL header price (has lines)
                "o_totalprice": pa.array([3.0, 9.0, 5.0, None], pa.float64()),
            }
        )
        line = pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 4], pa.int64()),
                "l_extendedprice": pa.array([1.0, 2.0, 1.0, 1.0], pa.float64()),
            }
        )
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(line, str(tmp_path / "lineitem.parquet"))
        got = orders_price_reconciliation(str(tmp_path)).to_pandas()
        census = dict(zip(got["recon_status"], got["n_orders"]))
        assert census == {"match": 1, "mismatch": 1, "no_lines": 1, "null_price": 1}


class TestFuzzyClusters:
    def test_transitive_closure(self, tmp_path, ray_session):
        """A~B and B~C (each ED 1) cluster together even though ED(A,C)=2."""
        import ray.data as rd

        from ocr_ray.ops.dedup import propagate_min_labels
        from ocr_ray.ops.fuzzy import fuzzy_name_pairs_over

        names = pa.table(
            {
                "id": pa.array([1, 2, 3, 9], pa.int64()),
                "name": pa.array(["smith", "smiths", "smithss", "jones"], pa.string()),
            }
        )
        pairs = fuzzy_name_pairs_over(rd.from_arrow(names))
        import pyarrow.compute as pc_

        edges = pairs.map_batches(
            lambda t: pa.table(
                {
                    "a": pc_.cast(t.column("id_a"), pa.int64()),
                    "b": pc_.cast(t.column("id_b"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        out = propagate_min_labels(edges).to_pandas()
        lab = dict(zip(out["node"], out["label"]))
        assert lab == {1: 1, 2: 1, 3: 1}  # transitive; 9 (no match) absent
