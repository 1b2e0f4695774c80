"""Full-corpus per-block source spans (north rule: "extracted text/spans
per turn").

``extract_spans`` emits one row per extracted block carrying
``[span_start, span_end)`` char offsets into the engine's input document
(the decoded body for data-URI payloads) alongside the block's kind and
text.  Verification (r4): the full-corpus op is driver-gated against the
INDEPENDENT golden span oracle (``ocr_ray/oracle_spans.py`` — stdlib
HTMLParser walker, zero kernel imports); per-engine SQL mirrors
(``extract_plain_spans`` / ``extract_pdf_spans``) live in
``pipelines/extract_oracle``. This module is the production surface over
EVERY row.

Span contract per engine:

* plain — trimmed segment cores of the kernel's greedy ``\\n\\s*\\n``
  split; ``_norm_text(doc[s:e]) == text`` exactly.
* pdf — covering span from the first contributing line's core start to
  the last line's core end (dehyphenation means the roundtrip holds
  exactly only for hyphen-free spans).
* html — covering span over the block's contributing fragments (tags and
  entities inside keep raw extents).

Kinds are taken from the kernel's own blocks, zipped by position with a
text-equality assert — the operator self-checks that the offset scan
reproduced the kernel's block stream and fails loudly on any drift.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ocr_ray.core.extract import (
    _PARA_SPLIT_RE,
    _extract_html,
    _extract_pdf,
    _extract_plain,
    classify_payload,
    decode_data_uri,
)

SPANS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("payload_kind", pa.string()),
        pa.field("block_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("span_start", pa.int64()),
        pa.field("span_end", pa.int64()),
        pa.field("text", pa.string()),
    ]
)


def _plain_spans(doc: str):
    """Kernel-true plain spans: greedy unicode-ws split on the RAW doc
    (separator positions are NFC-stable, so segments correspond 1:1 with
    the kernel's NFC-side split)."""
    out = []
    pos = 0
    bounds = [m.span() for m in _PARA_SPLIT_RE.finditer(doc)] + [(len(doc), len(doc))]
    for s_start, s_end in bounds:
        seg = doc[pos:s_start]
        seg_off = pos
        pos = s_end
        core = seg.strip()
        if not core:
            continue
        lead = len(seg) - len(seg.lstrip())
        out.append((seg_off + lead, seg_off + len(seg.rstrip())))
    return out


def _pdf_spans(doc: str):
    """Kernel-true pdf covering spans: page/line scan with unicode strip."""
    out = []
    off = 0
    for page in doc.split("\f"):
        loff = off
        off += len(page) + 1
        cur = None
        groups = []
        for ln in page.split("\n"):
            l_off = loff
            loff += len(ln) + 1
            if ln.strip():
                s = l_off + (len(ln) - len(ln.lstrip()))
                e = l_off + len(ln.rstrip())
                cur = (s, e) if cur is None else (cur[0], e)
            elif cur is not None:
                groups.append(cur)
                cur = None
        if cur is not None:
            groups.append(cur)
        out.extend(groups)
    return out


def spans_for_turn(raw: str):
    """(payload_kind, [(kind, span_start, span_end, text), ...]) for one
    turn; empty block list for error/empty payloads.

    Decodes the payload ONCE and dispatches to the engine directly
    (``extract_turn`` would re-decode internally — a second base64 pass
    per data-URI turn on the full-corpus production path); error paths
    emit no rows, exactly like the kernel's total-output error records.
    """
    if not isinstance(raw, str) or not raw or raw.isspace():
        return "plain", []
    doc, err = decode_data_uri(raw)
    if err or not doc or doc.isspace():
        return "plain", []
    kind = classify_payload(doc)
    if kind == "binpdf":
        # character offsets into a binary PDF container are undefined —
        # the binpdf engine's blocks live in RECONSTRUCTED text, not the
        # payload string, so the span contract (offsets into the decoded
        # payload) cannot hold; emit no rows (same shape as error turns)
        return "binpdf", []
    try:
        if kind == "html":
            r = _extract_html(doc)
        elif kind == "pdf":
            r = _extract_pdf(doc)
        else:
            r = _extract_plain(doc)
    except Exception:  # kernel totality: an extract_error turn has no blocks
        return kind, []
    if not r.blocks:
        return r.payload_kind, []
    if r.payload_kind == "html":
        from ocr_ray.pipelines.extract_oracle import _html_spans_rows

        rows = _html_spans_rows(doc)
        # explicit raise (NOT a bare assert) so the self-check survives -O
        if [x[4] for x in rows] != [b.text for b in r.blocks]:
            raise AssertionError("span drift: html replay text mismatch")
        return r.payload_kind, [
            (b.kind, s, e, b.text) for (_, _, s, e, _), b in zip(rows, r.blocks)
        ]
    spans = _plain_spans(doc) if r.payload_kind == "plain" else _pdf_spans(doc)
    # the scans emit one span per nonempty group; zip against the kernel's
    # blocks and self-check alignment where the roundtrip is exact
    if len(spans) != len(r.blocks):
        raise AssertionError(
            f"span drift: {len(spans)} spans vs {len(r.blocks)} blocks"
        )
    return r.payload_kind, [
        (b.kind, s, e, b.text) for (s, e), b in zip(spans, r.blocks)
    ]


def spans_table(t: pa.Table) -> pa.Table:
    cids, tids, pk, bidx, kinds, ss, ee, txts = [], [], [], [], [], [], [], []
    for cid, ti, raw in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        kind_p, rows = spans_for_turn(raw if raw is not None else "")
        for b, (k, s, e, txt) in enumerate(rows):
            cids.append(cid)
            tids.append(ti)
            pk.append(kind_p)
            bidx.append(b)
            kinds.append(k)
            ss.append(s)
            ee.append(e)
            txts.append(txt)
    return pa.table(
        {
            "conv_id": pa.array(cids, pa.string()),
            "turn_idx": pa.array(tids, pa.int32()),
            "payload_kind": pa.array(pk, pa.string()),
            "block_idx": pa.array(bidx, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "span_start": pa.array(ss, pa.int64()),
            "span_end": pa.array(ee, pa.int64()),
            "text": pa.array(txts, pa.string()),
        },
        schema=SPANS_SCHEMA,
    )


def extract_spans_from_path(path: str) -> Dataset:
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(spans_table, batch_format="pyarrow")
