"""Canonical per-turn structured records (the reference's typed-record output).

The reference's end product is one CLOSED, typed record per document with
canonical defaults substituted on every failure path — zod-enforced output
(``extract-data-from-pdf.ts:43`` via ``pdf-data-schema.ts``: string fields
default ``""``, the count field defaults ``0``, the list defaults ``[]``;
default rules re-stated in the prompt at ``:48-52``/``:67-71`` and enforced
again at the sink, ``route.ts:106-114``).  Our generalized analog derives a
fixed record from each turn's extraction result:

* ``title``      — text of the first heading-class block (html ``heading`` /
                   pdf ``header``), ``""`` when none (M4 default)
* ``doc_no``     — first decimal run in the title as int64, ``0`` when none
                   (the ``nombre_des_présents``-style numeric field analog)
* ``n_items``    — count of substantive blocks (html ``content`` /
                   pdf+plain ``para``) — the derived count, G1
                   (``pdf-data-schema.ts:10``)
* ``n_headings`` — count of heading-class blocks
* ``n_words``    — whitespace-token count of ``main_text`` (block text is
                   single-space collapsed by ``_norm_text``, so words are
                   exactly the ``[^ \\n]+`` runs)
* ``error``      — the kernel's error column (M3 total-output invariant)

Everything is vectorized Arrow/numpy over the ``blocks`` list column — no
per-row Python in the hot path; the explode analog (S5) already exists as
the ``extract_*_blocks`` views.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HEAD_KINDS = ("heading", "header")
_ITEM_KINDS = ("content", "para")
# digit run bounded to 18 so the int64 cast can never throw on a
# pathological >=19-digit title (leftmost-first on both RE2 engines, so
# the SQL mirror's identical bound keeps parity: a 19-digit run yields
# its first 18 digits on both sides)
_DOC_NO_RE = r"(?P<d>[0-9]{1,18})"

RECORD_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("payload_kind", pa.string()),
        pa.field("title", pa.string()),
        pa.field("doc_no", pa.int64()),
        pa.field("n_items", pa.int32()),
        pa.field("n_headings", pa.int32()),
        pa.field("n_words", pa.int64()),
        pa.field("error", pa.string()),
    ]
)


def records_from_extracted(t: pa.Table) -> pa.Table:
    """EXTRACTED_SCHEMA batch -> RECORD_SCHEMA batch (one row per turn)."""
    n = t.num_rows
    blocks = t.column("blocks")
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()
    flat = pc.list_flatten(blocks)
    parent = pc.list_parent_indices(blocks).to_numpy(zero_copy_only=False)
    kind = flat.field("kind")
    is_head = pc.is_in(kind, value_set=pa.array(_HEAD_KINDS)).to_numpy(
        zero_copy_only=False
    )
    is_item = pc.is_in(kind, value_set=pa.array(_ITEM_KINDS)).to_numpy(
        zero_copy_only=False
    )

    n_items = np.bincount(parent[is_item], minlength=n).astype(np.int32)
    n_headings = np.bincount(parent[is_head], minlength=n).astype(np.int32)

    # first heading-class block per turn, in block order (flatten preserves it)
    titles = np.full(n, "", dtype=object)
    hidx = np.flatnonzero(is_head)
    if hidx.size:
        up, first = np.unique(parent[hidx], return_index=True)
        titles[up] = flat.field("text").take(pa.array(hidx[first])).to_pylist()
    title_arr = pa.array(titles, pa.string())

    # first decimal run in the title -> int64, default 0 (M4)
    doc_no = pc.fill_null(
        pc.cast(
            pc.struct_field(pc.extract_regex(title_arr, _DOC_NO_RE), "d"),
            pa.int64(),
        ),
        0,
    )

    # block text is single-space collapsed, main_text joins with \n\n:
    # whitespace tokens are exactly the [^ \n]+ runs
    n_words = pc.cast(
        pc.count_substring_regex(t.column("main_text"), r"[^ \n]+"), pa.int64()
    )

    return pa.table(
        {
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "payload_kind": t.column("payload_kind"),
            "title": title_arr,
            "doc_no": doc_no,
            "n_items": pa.array(n_items, pa.int32()),
            "n_headings": pa.array(n_headings, pa.int32()),
            "n_words": n_words,
            "error": t.column("error"),
        },
        schema=RECORD_SCHEMA,
    )
