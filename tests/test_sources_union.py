"""read_parquet_union mechanics beyond the gated fixture: type widening
across shard generations and column pruning per shard."""

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.sources.readers import read_parquet_union


def test_union_widens_types_and_null_fills(tmp_path):
    """v1 wrote score as int32 and lacks tag; v2 widened score to int64 —
    the unified read must cast v1 up and null-fill v1.tag."""
    a = str(tmp_path / "v1.parquet")
    b = str(tmp_path / "v2.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "score": pa.array([10, 20], pa.int32())}),
        a,
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "score": pa.array([30], pa.int64()),
                "tag": pa.array(["x"], pa.string()),
            }
        ),
        b,
    )
    got = read_parquet_union([a, b]).to_pandas().sort_values("id").reset_index(drop=True)
    assert got["score"].tolist() == [10, 20, 30]
    assert got["tag"].tolist()[:2] == [None, None] and got["tag"][2] == "x"
    sch = read_parquet_union([a, b]).schema()
    assert dict(zip(sch.names, [str(t) for t in sch.types]))["score"] == "int64"


def test_union_prunes_per_shard(tmp_path):
    """columns= restricts the unified schema; a shard missing a requested
    column still reads (null-filled), one present in both reads from both."""
    a = str(tmp_path / "v1.parquet")
    b = str(tmp_path / "v2.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), a)
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()), "lang": pa.array(["fr"])}), b
    )
    got = (
        read_parquet_union([a, b], columns=["id", "lang"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["lang"].tolist() == [None, "fr"]
