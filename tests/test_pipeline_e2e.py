"""End-to-end golden run: Ray pipeline output == single-threaded oracle,
per turn, after sorting by (conv_id, turn_idx) — the north-rule equality
(BASELINE.json north_rule; SURVEY.md §5)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray import refimpl
from ocr_ray.pipelines.extract_pipeline import extract_dataset, exploded_blocks
from ocr_ray.sources.transcripts import generate_transcripts_table
from ocr_ray.stages.schemas import EXPLODED_SCHEMA, EXTRACTED_SCHEMA


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("transcripts")
    t = generate_transcripts_table(120, seed=42)
    # several files so the read is multi-block
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), d / f"part-{i}.parquet")
    return str(d), t


def test_e2e_equals_oracle(fixture_paths):
    path, t_in = fixture_paths
    out = extract_dataset(rd.read_parquet(path), concurrency=(1, 4))
    got = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow", batch_size=4096)])
    got = got.cast(EXTRACTED_SCHEMA).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    want = refimpl.extract_table(t_in)

    assert got.num_rows == t_in.num_rows == want.num_rows  # row-count preservation
    assert got.schema.equals(want.schema)
    # per-turn text equality, column by column for a readable diff
    for col in want.column_names:
        g, w = got.column(col), want.column(col)
        if not g.equals(w):
            for i in range(want.num_rows):
                assert g[i].as_py() == w[i].as_py(), (col, i, got.column("conv_id")[i])
            raise AssertionError(f"column {col} differs")


def test_invariants(fixture_paths):
    path, t_in = fixture_paths
    out = extract_dataset(rd.read_parquet(path), concurrency=(1, 4))
    got = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow", batch_size=4096)])
    # totality: no nulls anywhere
    for col in got.column_names:
        assert got.column(col).null_count == 0, col
    # n_blocks == len(blocks)
    assert pc.all(
        pc.equal(got.column("n_blocks"), pc.cast(pc.list_value_length(got.column("blocks")), pa.int32()))
    ).as_py()


def test_explode(fixture_paths):
    path, t_in = fixture_paths
    out = extract_dataset(rd.read_parquet(path), concurrency=(1, 4))
    ex = exploded_blocks(out)
    got = pa.concat_tables(
        [b for b in ex.iter_batches(batch_format="pyarrow", batch_size=8192)]
    ).cast(EXPLODED_SCHEMA)
    want = refimpl.extract_table(t_in)
    n_blocks_total = pc.sum(want.column("n_blocks")).as_py()
    n_empty = pc.sum(pc.cast(pc.equal(want.column("n_blocks"), 0), pa.int64())).as_py()
    # one row per block + one placeholder per empty turn
    assert got.num_rows == n_blocks_total + n_empty
    placeholders = got.filter(pc.equal(got.column("block_idx"), -1))
    assert placeholders.num_rows == n_empty
    assert pc.all(pc.equal(placeholders.column("text"), "")).as_py()
