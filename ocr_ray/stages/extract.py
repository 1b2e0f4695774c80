"""Ray Data stages for the extraction pipeline.

``ExtractKernel`` is the heavyweight recognition kernel hosted in a stateful
actor pool (``map_batches(ExtractKernel, concurrency=..., num_cpus=1)``):
the pattern bank / scoring tables are warmed once per actor in ``__init__``
— the analog of the reference's module-level model-client singleton
(``/root/reference/src/ai/genkit.ts:4-7``), and a fix of its per-request OCR
client construction defect (extract-data-from-pdf.ts:114 creates the Vision
client per call).

Per-row work is irreducible here (main-content extraction parses each
document), but everything around it is vectorized Arrow: byte lengths,
explode, schema casts run through ``pyarrow.compute``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.stages.schemas import BLOCK_TYPE, EXPLODED_SCHEMA, EXTRACTED_SCHEMA


class ExtractKernel:
    """Stateful actor: classify + extract each turn of a batch.

    Input batch: transcript columns (conv_id, turn_idx, role, text, ...).
    Output batch: canonical EXTRACTED_SCHEMA (note: the large ``text``
    payload column is dropped here — project early, SURVEY.md §4).
    """

    def __init__(self) -> None:
        # Warm the compiled pattern bank once per actor process.
        from ocr_ray.core import extract as core

        self._extract = core.extract_turn
        # touch the module-level regex bank so compilation cost is paid here
        core.classify_payload("<p>warm</p>")
        core.extract_turn("warm up\n\nthe kernel")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        kinds: list[str] = []
        mains: list[str] = []
        errors: list[str] = []
        n_blocks: list[int] = []
        # flat block arrays + offsets -> ListArray.from_arrays (no per-row
        # dict materialization; ~25% less per-batch overhead)
        offsets: list[int] = [0]
        b_idx: list[int] = []
        b_kind: list[str] = []
        b_text: list[str] = []
        ex = self._extract
        for txt in texts:
            r = ex(txt)
            kinds.append(r.payload_kind)
            mains.append(r.main_text)
            errors.append(r.error)
            n_blocks.append(len(r.blocks))
            for b in r.blocks:
                b_idx.append(b.block_idx)
                b_kind.append(b.kind)
                b_text.append(b.text)
            offsets.append(len(b_idx))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(b_idx, pa.int32()),
                pa.array(b_kind, pa.string()),
                pa.array(b_text, pa.string()),
            ],
            fields=list(BLOCK_TYPE),
        )
        blocks = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        bytes_in = pc.binary_length(batch.column("text").cast(pa.binary()))
        out = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "payload_kind": pa.array(kinds, pa.string()),
                "main_text": pa.array(mains, pa.string()),
                "blocks": blocks,
                "n_blocks": pa.array(n_blocks, pa.int32()),
                "error": pa.array(errors, pa.string()),
                "bytes_in": bytes_in.cast(pa.int64()),
            }
        )
        return out.cast(EXTRACTED_SCHEMA)


def add_len_bucket(batch: pa.Table) -> pa.Table:
    """Stateless skew stage: ``len_bucket = floor(log2(len(text)+1))``.

    Used for skew metrics and batch-size selection for giant turns
    (SURVEY.md §4 byte-length bucketing). Vectorized.
    """
    n = pc.binary_length(batch.column("text").cast(pa.binary()))
    bucket = pc.cast(
        pc.floor(pc.logb(pc.cast(pc.add(n, 1), pa.float64()), 2)), pa.int32()
    )
    return batch.append_column("len_bucket", bucket)


def split_by_len(ds, threshold_bytes: int = 256 * 1024):
    """Explicit skew split: (normal, giant) datasets by payload byte length.

    The default pipeline bounds skew by block sizing (a giant turn inflates
    one block, which target_max_block_size splits at the read). When turn
    lengths are heavy-tailed enough that stragglers still dominate, split
    the stream and run the giant branch with tiny batches / its own pool:

        normal, giant = split_by_len(ds)
        out = extract_dataset(normal).union(
            extract_dataset(giant, batch_size=4))

    Cost note: both branches re-scan the upstream (two reads); at scale
    prefer writing the split once (partitioned by len_bucket) and reading
    each side — the same fragment-exchange trick as the sink.
    """

    def keep(small: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = pc.binary_length(t.column("text").cast(pa.binary()))
            mask = pc.less_equal(n, threshold_bytes) if small else pc.greater(
                n, threshold_bytes
            )
            return t.filter(mask)

        return fn

    return (
        ds.map_batches(keep(True), batch_format="pyarrow"),
        ds.map_batches(keep(False), batch_format="pyarrow"),
    )


def explode_blocks(batch: pa.Table) -> pa.Table:
    """Explode ``blocks`` into one row per block, doc fields repeated.

    Generalizes the sheet sink's explode-to-rows
    (save-to-google-sheet.ts:199-215). Turns with no blocks emit one
    placeholder row with ``block_idx=-1, text=""`` (mirrors the
    empty-présences placeholder, save-to-google-sheet.ts:208-215).
    Fully vectorized: list_flatten + list_parent_indices + take.
    """
    blocks = batch.column("blocks")
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()
    lengths = pc.list_value_length(blocks).fill_null(0)
    parent = pc.list_parent_indices(blocks)
    flat = pc.list_flatten(blocks)

    def doc_cols(idx: pa.Array) -> dict:
        return {
            "conv_id": pc.take(batch.column("conv_id"), idx),
            "turn_idx": pc.take(batch.column("turn_idx"), idx),
            "payload_kind": pc.take(batch.column("payload_kind"), idx),
        }

    parts = []
    if len(flat) > 0:
        cols = doc_cols(parent)
        cols["block_idx"] = flat.field("block_idx")
        cols["kind"] = flat.field("kind")
        cols["text"] = flat.field("text")
        parts.append(pa.table(cols).cast(EXPLODED_SCHEMA))
    empty_idx = pc.indices_nonzero(pc.equal(lengths, 0))
    if len(empty_idx) > 0:
        cols = doc_cols(empty_idx)
        n = len(empty_idx)
        cols["block_idx"] = pa.array([-1] * n, pa.int32())
        cols["kind"] = pa.array([""] * n, pa.string())
        cols["text"] = pa.array([""] * n, pa.string())
        parts.append(pa.table(cols).cast(EXPLODED_SCHEMA))
    if not parts:
        return EXPLODED_SCHEMA.empty_table()
    return pa.concat_tables(parts)
