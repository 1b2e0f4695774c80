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

# Batch = one input block by default (batch_size=None): measured on this box,
# row-count rebatching costs ~40% throughput, and block size is already
# governed at the read (target_max_block_size splits oversized blocks, so
# giant-turn skew is bounded per block, SURVEY.md §4).
DEFAULT_BATCH_SIZE = None

_KERNEL_SINGLETON: ExtractKernel | None = None


def _extract_batch(batch):
    """Task-mode kernel: state cached once per Ray worker PROCESS.

    Ray reuses worker processes across tasks, so the pattern-bank warm-up
    runs once per worker — the same amortization as an actor pool without
    the pool's per-call dispatch bottleneck (measured 3x faster here:
    12.8k -> 33k rows/s at 32 CPUs). Use ``strategy="actors"`` when the
    kernel holds genuinely heavy state (models) that must pin memory.
    """
    global _KERNEL_SINGLETON
    if _KERNEL_SINGLETON is None:
        _KERNEL_SINGLETON = ExtractKernel()
    return _KERNEL_SINGLETON(batch)


def read_transcripts(path: str, columns: list[str] | None = None) -> Dataset:
    """Prune at the read: the pipeline needs only these columns."""
    cols = columns or ["conv_id", "turn_idx", "role", "text"]
    return rd.read_parquet(path, columns=cols)


def extract_dataset(
    ds: Dataset,
    *,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    concurrency: tuple[int, int] | int = (2, 64),
    strategy: str = "tasks",
    post_hook=None,
) -> Dataset:
    """transcripts Dataset -> extracted Dataset (EXTRACTED_SCHEMA).

    ``strategy``: "tasks" (default; per-worker-process kernel cache) or
    "actors" (explicit actor pool with ``concurrency`` — the reference's
    model-singleton pattern, genkit.ts:4-7, for heavy per-actor state).

    ``post_hook`` is an optional user-supplied per-batch rewrite applied
    between extraction and the sink — the analog of the reference's editor
    hook that re-injects user-modified records before the sinks
    (data-editor.tsx:10-13, page.tsx:239-248). It must preserve the
    canonical schema; the sink's schema cast enforces that.
    """
    if strategy == "actors":
        out = ds.map_batches(
            ExtractKernel,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        out = ds.map_batches(
            _extract_batch, batch_format="pyarrow", batch_size=batch_size
        )
    if post_hook is not None:
        out = out.map_batches(post_hook, batch_format="pyarrow")
    return out


def extract_from_path(path: str, **kw) -> Dataset:
    return extract_dataset(read_transcripts(path), **kw)


def exploded_blocks(extracted: Dataset) -> Dataset:
    """extracted Dataset -> one row per block (EXPLODED_SCHEMA)."""
    return extracted.map_batches(explode_blocks, batch_format="pyarrow")


def extract_and_commit(path: str, out_dir: str, **kw):
    """Fused read -> extract -> partitioned commit: the extraction kernel
    runs INSIDE the fan-out task, so its output goes straight to the
    partition fragments and never transits the object store. Same output
    bytes as the staged pipeline (tested); the preferred production entry.
    """
    from ocr_ray.state.sink import write_partitioned

    return write_partitioned(
        read_transcripts(path), out_dir, pre_fn=_extract_batch, **kw
    )
