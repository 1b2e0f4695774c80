"""Single-threaded pure-Python reference extractor (the correctness oracle).

No Ray, no parallelism: a plain loop over rows in ``(conv_id, turn_idx)``
order — the analog of the reference app's strictly sequential one-document-
at-a-time queue (``/root/reference/src/app/page.tsx:101-113``). The Ray
pipeline's output must match this per turn exactly after sorting by
``(conv_id, turn_idx)`` (BASELINE.json north_rule).
"""

from __future__ import annotations

import pyarrow as pa

from ocr_ray.core.extract import extract_turn
from ocr_ray.stages.schemas import EXTRACTED_SCHEMA


def extract_table(transcripts: pa.Table) -> pa.Table:
    """Oracle: extract every turn sequentially; returns the canonical
    extracted table sorted by (conv_id, turn_idx)."""
    t = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_ids = t.column("conv_id").to_pylist()
    turn_idxs = t.column("turn_idx").to_pylist()
    roles = t.column("role").to_pylist()
    texts = t.column("text").to_pylist()

    kinds, mains, blocks_col, n_blocks, errors, bytes_in = [], [], [], [], [], []
    for txt in texts:
        r = extract_turn(txt)
        kinds.append(r.payload_kind)
        mains.append(r.main_text)
        blocks_col.append(
            [{"block_idx": b.block_idx, "kind": b.kind, "text": b.text} for b in r.blocks]
        )
        n_blocks.append(len(r.blocks))
        errors.append(r.error)
        bytes_in.append(len(txt.encode("utf-8")) if isinstance(txt, str) else 0)

    return pa.table(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idxs,
            "role": roles,
            "payload_kind": kinds,
            "main_text": mains,
            "blocks": blocks_col,
            "n_blocks": n_blocks,
            "error": errors,
            "bytes_in": bytes_in,
        },
        schema=EXTRACTED_SCHEMA,
    )
