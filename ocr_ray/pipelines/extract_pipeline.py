"""Flagship pipeline builders: transcripts -> extracted (+ exploded blocks).

Plan shape (idiomatic Ray Data, streaming end to end, no driver-side loops):

    read_parquet(transcripts, columns=needed)
      -> map_batches(ExtractKernel, actor pool, batch_format="pyarrow")
      -> [optional] map_batches(explode_blocks)
      -> write_parquet / iter_batches / aggregate

The only shuffles in the whole engine are (a) the partition-commit groupby in
``ocr_ray.state.sink`` (write-side, output-file-sized), and (b) the
verification sort — the hot extraction path is shuffle-free (SURVEY.md §7.3).
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

from ocr_ray.stages.extract import ExtractKernel, explode_blocks

# Rows per kernel batch. Small on purpose: per-batch overhead is negligible
# next to per-document parsing, and small batches keep giant-turn skew from
# serializing a whole block behind one actor (SURVEY.md §4).
DEFAULT_BATCH_SIZE = 64


def read_transcripts(path: str, columns: list[str] | None = None) -> Dataset:
    """Prune at the read: the pipeline needs only these columns."""
    cols = columns or ["conv_id", "turn_idx", "role", "text"]
    return rd.read_parquet(path, columns=cols)


def extract_dataset(
    ds: Dataset,
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: tuple[int, int] | int = (2, 64),
) -> Dataset:
    """transcripts Dataset -> extracted Dataset (EXTRACTED_SCHEMA)."""
    return ds.map_batches(
        ExtractKernel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def extract_from_path(path: str, **kw) -> Dataset:
    return extract_dataset(read_transcripts(path), **kw)


def exploded_blocks(extracted: Dataset) -> Dataset:
    """extracted Dataset -> one row per block (EXPLODED_SCHEMA)."""
    return extracted.map_batches(explode_blocks, batch_format="pyarrow")
