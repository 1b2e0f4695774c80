"""Deterministic PDF 1.4 writer for the binary-PDF fixtures.

Emits REAL, viewer-openable PDFs: correct object graph (Catalog -> Pages ->
Page -> Contents), exact inline ``/Length`` on every stream, a byte-accurate
xref table and trailer. Content streams are UNCOMPRESSED and restricted to
the gate's provable operator vocabulary — ``BT``/``ET`` text objects, one
escape-free ``(string) Tj`` show per line, ``0 -14 Td`` line advances — so
the DuckDB oracle can reconstruct reading order with regular expressions
(see ``ocr_ray/pipelines/binpdf_gate.py``). The tokenizer itself
(``core/pdfbin.py``) handles the full PDF 1.4 text-operator set; the writer
stays inside the mirrorable subset on purpose, exactly like the provably-
simple-html generator keeps to the html gate's subset.

Layout invariants the gate's mask relies on (all enforced here):
  * objects are written in ascending object-number order, each page object
    immediately followed by its content stream, so page-tree order ==
    file order of content streams;
  * every content stream is ``BT\\n[/F1 11 Tf\\n]X Y Td\\n(l) Tj\\n``
    followed by ``(0 -14 Td\\n(l) Tj\\n)*`` then ``ET`` blocks only;
  * pure printable-ASCII output, no backslash escapes, no parens outside
    show strings (lines containing ``( ) \\`` are escaped and thereby fall
    out of the strict mask on BOTH sides — still extracted correctly by
    the kernel, just not driver-gated).
"""

from __future__ import annotations

_FONT_LINE = "/F1 11 Tf"
_LINE_STEP = 14
_TOP_Y = 720
_PARA_GAP = 28
_LEFT_X = 72


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def _page_stream(groups: list[list[str]]) -> str:
    """One page's content stream text (strict vocabulary, see module doc)."""
    out: list[str] = []
    y = _TOP_Y
    first = True
    for g in groups:
        if not g:
            continue
        out.append("BT")
        if first:
            out.append(_FONT_LINE)
            first = False
        out.append(f"{_LEFT_X} {max(y, 36)} Td")
        out.append(f"({_esc(g[0])}) Tj")
        for ln in g[1:]:
            out.append(f"0 -{_LINE_STEP} Td")
            out.append(f"({_esc(ln)}) Tj")
        out.append("ET")
        y -= _LINE_STEP * len(g) + _PARA_GAP
    return "\n".join(out)


def build_pdf(pages: list[list[list[str]]], compress: bool = False) -> bytes:
    """pages -> groups -> lines  =>  complete PDF 1.4 file bytes.

    Object layout: 1 Catalog, 2 Pages, then per page k: ``3+2k`` Page,
    ``4+2k`` Contents stream, and finally ``3+2*npages`` the shared Type1
    font. xref offsets are computed from the actual byte positions.
    ``compress=True`` emits ``/Filter /FlateDecode`` content streams
    (zlib level 6) — how real writers ship PDFs; the GATED fixtures stay
    uncompressed (DuckDB has no inflate), the kernel handles both.
    """
    np_ = len(pages)
    font_num = 3 + 2 * np_
    kids = " ".join(f"{3 + 2 * k} 0 R" for k in range(np_))

    objs: list[tuple[int, bytes]] = []
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append((2, f"<< /Type /Pages /Kids [{kids}] /Count {np_} >>".encode()))
    for k, pg in enumerate(pages):
        page_num = 3 + 2 * k
        cont_num = 4 + 2 * k
        objs.append(
            (
                page_num,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                    f"/Contents {cont_num} 0 R >>"
                ).encode(),
            )
        )
        data = _page_stream(pg).encode("ascii")
        if compress:
            import zlib

            data = zlib.compress(data, 6)
            objs.append(
                (
                    cont_num,
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                    % (len(data), data),
                )
            )
        else:
            objs.append(
                (
                    cont_num,
                    b"<< /Length %d >>\nstream\n%s\nendstream" % (len(data), data),
                )
            )
    objs.append((font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))

    buf = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num, body in objs:
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_pos = len(buf)
    n_entries = font_num + 1
    buf += b"xref\n0 %d\n" % n_entries
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_entries):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_entries, xref_pos)
    )
    return bytes(buf)
