"""Schema-evolution source: union-by-name reads over drifted parquet
generations (ocr_ray/sources/evolving.py)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.sources.evolving import (
    ensure_evolved_orders,
    orders_evolved_rollup,
    orders_evolved_rollup_sql,
    read_parquet_evolving,
    union_schema,
)


def _gen(tmp_path):
    g1 = tmp_path / "g1.parquet"
    g2 = tmp_path / "g2.parquet"
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()), "a": pa.array(["x", "y"])}), g1
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3, 4], pa.int64()),
                "a": pa.array(["z", None]),
                "b": pa.array([10.5, 20.0]),
            }
        ),
        g2,
    )
    return str(g1), str(g2)


def test_union_schema_and_null_fill(tmp_path, ray_session):
    g1, g2 = _gen(tmp_path)
    sch = union_schema([g1, g2])
    assert sch.names == ["k", "a", "b"]
    got = read_parquet_evolving([g1, g2]).to_pandas().sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    want = (
        con.sql(f"SELECT * FROM read_parquet(['{g1}','{g2}'], union_by_name=true)")
        .df()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
    # gen1 rows carry typed NULLs for the late column
    assert got.loc[got.k <= 2, "b"].isna().all()


def test_type_conflict_raises(tmp_path):
    g1 = tmp_path / "c1.parquet"
    g2 = tmp_path / "c2.parquet"
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), g1)
    pq.write_table(pa.table({"k": pa.array(["1"])}), g2)
    with pytest.raises(ValueError, match="type conflict"):
        union_schema([str(g1), str(g2)])


def test_column_pruning_pushed_down(tmp_path, ray_session):
    g1, g2 = _gen(tmp_path)
    got = read_parquet_evolving([g1, g2], columns=["k", "b"]).to_pandas()
    assert sorted(got.columns) == ["b", "k"]
    assert len(got) == 4


def test_rollup_matches_duckdb_on_fixture(ray_session):
    sf = "/root/testdata/sf0.001"
    ensure_evolved_orders(sf)
    got = (
        orders_evolved_rollup(sf)
        .to_pandas()
        .sort_values("o_channel")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = (
        con.sql(orders_evolved_rollup_sql(sf)).df().sort_values("o_channel").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
