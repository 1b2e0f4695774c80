"""Deterministic per-turn main-content extraction kernels.

This module is the single source of truth for extraction semantics. Both the
single-threaded oracle (``ocr_ray.refimpl``) and the distributed Ray kernel
(``ocr_ray.stages.extract``) call ``extract_turn`` — per-turn text equality
between the two is therefore structural, not coincidental.

Semantics generalize the reference app's flow
(``/root/reference/src/ai/flows/extract-data-from-pdf.ts``):

* engine dispatch by payload kind (ref: ``extractionEngine`` enum,
  extract-data-from-pdf.ts:22-24, branch :96-154) -> ``classify_payload``
  routing to the html / pdf-layout / plain engines;
* data-URI prefix strip + base64 decode (ref: extract-data-from-pdf.ts:116);
* empty-input guards producing a *total* output record with an error string
  instead of dropping the row (ref: extract-data-from-pdf.ts:134-145,
  default-empty record :87-91);
* missing-data defaults ``""`` / ``0`` / ``[]`` (ref: prompt rules
  extract-data-from-pdf.ts:48-52 and :67-71);
* the OCR page/block/paragraph hierarchy (ref: Vision
  ``DOCUMENT_TEXT_DETECTION``, extract-data-from-pdf.ts:118-131) generalized
  to deterministic page/block/line segmentation for PDF-like payloads and
  tag-ratio / text-density / link-density boilerplate scoring for HTML.

Determinism rules: no wall clock, no randomness, no locale dependence, NFC
unicode normalization, and integer arithmetic for all scoring thresholds
(no float comparisons), so results are bit-identical across processes.
"""

from __future__ import annotations

import base64
import binascii
import html as _html
import re
import unicodedata
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# compiled pattern bank (module-level: compiled once per process; the Ray
# actor pool imports this module in __init__, mirroring the reference's
# module-level model-client singleton, src/ai/genkit.ts:4-7)
# ---------------------------------------------------------------------------

# tag with the name captured inline (one finditer pass; nameless tags like
# <> or <123> leave the groups None — same skip semantics as a separate
# name match)
_TAG_WITH_NAME_RE = re.compile(r"<(?:\s*(/?)\s*([a-zA-Z][a-zA-Z0-9]*))?[^<>]*>")
_TAGISH_RE = re.compile(r"</?[a-zA-Z][^<>]*>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPTLIKE_RE = re.compile(
    r"<(script|style|noscript|svg|template)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_DATA_URI_RE = re.compile(r"^data:([^;,]*)(;base64)?,", re.S)
_PAGENUM_RE = re.compile(r"^(?:page\s+)?\d+(?:\s*(?:/|of)\s*\d+)?$", re.I)
_LEADING_SPACE_RE = re.compile(r"^[ \t]{2,}\S")

# block-level HTML elements: a start OR end tag of one of these flushes the
# current text block (generalizes Vision's block boundaries).
_BLOCK_ELEMS = frozenset(
    """address article aside blockquote body br caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li main
    nav ol option p pre section select table tbody td th thead tfoot title tr ul
    """.split()
)
# containers whose entire subtree is boilerplate (jusText/Arc90-style).
_BOILER_ELEMS = frozenset("nav header footer aside form select option".split())
_HEADING_ELEMS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
# elements whose text content is never page text.
_DROP_ELEMS = frozenset(["head", "title"])

# minimum content-block length in characters (integer threshold — a block
# shorter than this with any link text is boilerplate).
_MIN_CONTENT_CHARS = 25


@dataclass(frozen=True)
class Block:
    block_idx: int
    kind: str  # content | heading | boilerplate | para | header | footer | pagenum
    text: str


@dataclass(frozen=True)
class ExtractResult:
    payload_kind: str  # html | pdf | plain | binpdf
    main_text: str
    blocks: tuple  # tuple[Block, ...]
    error: str  # "" on success (total-output invariant)


_EMPTY = ExtractResult("plain", "", (), "empty_input")


def _norm_text(s: str) -> str:
    r"""Canonical whitespace + unicode normalization (NFC, collapse runs).

    ASCII fast path: NFC is the identity on ASCII, so the (expensive)
    normalize call is skipped for ASCII strings. Whitespace collapse uses
    str.split()/join (the same unicode-whitespace run collapse as
    ``\s+`` -> " " + strip, ~5x faster than the regex — profiled at 30%
    of kernel time).
    """
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
    return " ".join(s.split())


def decode_data_uri(text: str):
    """Strip a ``data:<mime>;base64,`` prefix and decode the payload.

    Mirrors the reference's prefix split (extract-data-from-pdf.ts:116).
    Returns ``(decoded_text, error)``; on decode failure returns
    ``("", "decode_error")`` (total-output invariant).
    """
    m = _DATA_URI_RE.match(text)
    if not m:
        return text, ""
    payload = text[m.end() :]
    if m.group(2):  # ;base64
        try:
            raw = base64.b64decode(payload, validate=True)
        except (binascii.Error, ValueError):
            return "", "decode_error"
        try:
            return raw.decode("utf-8"), ""
        except UnicodeDecodeError:
            return "", "decode_error"
    return payload, ""


def classify_payload(text: str) -> str:
    """Route a turn payload to an engine: ``html`` | ``pdf`` | ``plain``
    | ``binpdf`` (raw ``%PDF-`` bytes that survived a text read).

    Generalizes the reference's engine enum dispatch
    (extract-data-from-pdf.ts:22-24, :96-154). Integer-only scoring.
    """
    if not text or text.isspace():
        return "plain"
    if text.startswith("%PDF-"):
        return "binpdf"
    if "\f" in text:
        return "pdf"
    # html: at least 3 tag-ish tokens
    n_tags = 0
    for _ in _TAGISH_RE.finditer(text):
        n_tags += 1
        if n_tags >= 3:
            return "html"
    # pdf-ish: multi-line with a significant share of column-indented lines
    lines = text.splitlines()
    if len(lines) >= 4:
        nonempty = 0
        indented = 0
        for ln in lines[:200]:
            if ln.strip():
                nonempty += 1
                if _LEADING_SPACE_RE.match(ln):
                    indented += 1
        if nonempty >= 4 and indented * 10 >= nonempty * 3:
            return "pdf"
    return "plain"


# ---------------------------------------------------------------------------
# HTML engine — tag-ratio / text-density / link-density boilerplate strip
# ---------------------------------------------------------------------------


def _extract_html(text: str) -> ExtractResult:
    text = _SCRIPTLIKE_RE.sub(" ", _COMMENT_RE.sub(" ", text))

    blocks: list[Block] = []
    buf: list[str] = []  # text fragments of the current block
    link_chars = 0  # chars of the current block inside <a>
    total_chars = 0
    a_depth = 0
    boiler_depth = 0
    drop_depth = 0
    heading_depth = 0
    block_boiler = False  # block started inside a boilerplate container
    block_heading = False

    def flush() -> None:
        nonlocal buf, link_chars, total_chars, block_boiler, block_heading
        txt = _norm_text("".join(buf))
        if txt:
            if block_boiler or 5 * link_chars > 2 * total_chars:
                kind = "boilerplate"
            elif block_heading:
                kind = "heading"
            elif len(txt) < _MIN_CONTENT_CHARS and link_chars > 0:
                kind = "boilerplate"
            else:
                kind = "content"
            blocks.append(Block(len(blocks), kind, txt))
        buf = []
        link_chars = 0
        total_chars = 0
        block_boiler = boiler_depth > 0
        block_heading = heading_depth > 0

    pos = 0
    block_boiler = False
    for m in _TAG_WITH_NAME_RE.finditer(text):
        frag = text[pos : m.start()]
        pos = m.end()
        if frag and drop_depth == 0:
            # entity unescape only when an entity can exist (fast path)
            plain = _html.unescape(frag) if "&" in frag else frag
            buf.append(plain)
            n = len(plain.strip())
            total_chars += n
            if a_depth > 0:
                link_chars += n
        name = m.group(2)
        if name is None:
            continue
        closing, name = m.group(1) == "/", name.lower()
        if name == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
            continue
        if name in _BLOCK_ELEMS:
            flush()
            if name in _BOILER_ELEMS:
                boiler_depth = max(0, boiler_depth - 1) if closing else boiler_depth + 1
            if name in _DROP_ELEMS:
                drop_depth = max(0, drop_depth - 1) if closing else drop_depth + 1
            if name in _HEADING_ELEMS:
                heading_depth = max(0, heading_depth - 1) if closing else heading_depth + 1
            # context may have changed; (re)stamp the pending empty block
            block_boiler = boiler_depth > 0
            block_heading = heading_depth > 0
    tail = text[pos:]
    if tail and drop_depth == 0:
        plain = _html.unescape(tail) if "&" in tail else tail
        buf.append(plain)
        total_chars += len(plain.strip())
        if a_depth > 0:
            link_chars += len(plain.strip())
    flush()

    main = "\n\n".join(b.text for b in blocks if b.kind in ("content", "heading"))
    return ExtractResult("html", main, tuple(blocks), "")


# ---------------------------------------------------------------------------
# PDF-layout engine — page/block/line segmentation with reading order
# ---------------------------------------------------------------------------


def _dehyphenate_join(lines: list[str]) -> str:
    """Join the lines of one block: hyphenated line-break repair, else space."""
    out: list[str] = []
    for ln in lines:
        ln = _norm_text(ln)
        if not ln:
            continue
        if out and out[-1].endswith("-"):
            prev = out[-1]
            # join "exam-" + "ple" -> "example" when continuation is lowercase
            if ln[:1].islower():
                out[-1] = prev[:-1] + ln
                continue
        out.append(ln)
    return " ".join(out)


def _extract_pdf(text: str) -> ExtractResult:
    if not text.isascii():
        text = unicodedata.normalize("NFC", text)
    pages = text.split("\f")

    # repeated-line detection for running headers/footers: the first/last
    # non-empty line of each page, if it recurs on >=2 pages, is boilerplate.
    firsts: dict[str, int] = {}
    lasts: dict[str, int] = {}
    page_lines: list[list[str]] = []
    for pg in pages:
        lns = pg.splitlines()
        page_lines.append(lns)
        stripped = [ln for ln in lns if ln.strip()]
        if stripped:
            f = _norm_text(stripped[0])
            firsts[f] = firsts.get(f, 0) + 1
            if len(stripped) > 1:
                last = _norm_text(stripped[-1])
                lasts[last] = lasts.get(last, 0) + 1
    multi = len(pages) >= 2
    hdr = {s for s, c in firsts.items() if multi and c >= 2}
    ftr = {s for s, c in lasts.items() if multi and c >= 2}

    blocks: list[Block] = []
    mains: list[str] = []
    for lns in page_lines:
        cur: list[str] = []
        groups: list[list[str]] = []
        for ln in lns:
            if ln.strip():
                cur.append(ln)
            elif cur:
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        for gi, g in enumerate(groups):
            joined = _dehyphenate_join(g)
            if not joined:
                continue
            kind = "para"
            if len(g) == 1:
                one = _norm_text(g[0])
                if _PAGENUM_RE.match(one):
                    kind = "pagenum"
                elif gi == 0 and one in hdr:
                    kind = "header"
                elif gi == len(groups) - 1 and one in ftr:
                    kind = "footer"
            blocks.append(Block(len(blocks), kind, joined))
            if kind == "para":
                mains.append(joined)
    return ExtractResult("pdf", "\n\n".join(mains), tuple(blocks), "")


# ---------------------------------------------------------------------------
# plain engine — whitespace/unicode canonicalization, paragraph split
# ---------------------------------------------------------------------------

_PARA_SPLIT_RE = re.compile(r"\n\s*\n")


def _extract_plain(text: str) -> ExtractResult:
    if not text.isascii():
        text = unicodedata.normalize("NFC", text)
    blocks: list[Block] = []
    for para in _PARA_SPLIT_RE.split(text):
        t = _norm_text(para)
        if t:
            blocks.append(Block(len(blocks), "para", t))
    main = "\n\n".join(b.text for b in blocks)
    return ExtractResult("plain", main, tuple(blocks), "")


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def extract_turn(text) -> ExtractResult:
    """Extract main content from one turn payload. Total: never raises.

    Output invariants (mirrors the reference's default-empty record,
    extract-data-from-pdf.ts:87-91): ``main_text`` is ``""`` when nothing is
    extractable, ``blocks`` is ``()``, ``error`` is ``""`` on success.
    """
    if text is None:
        return _EMPTY
    if not isinstance(text, str):
        return ExtractResult("plain", "", (), "type_error")
    if not text or text.isspace():
        return _EMPTY
    # data-URI handling inlined (single decode, r4 invariant): base64
    # payloads decoding to binary-PDF bytes route to the binary-PDF engine
    # BEFORE the utf-8 text decode (the reference posts base64 PDF bytes
    # straight to the OCR engine, extract-data-from-pdf.ts:114-139).
    m = _DATA_URI_RE.match(text)
    if m:
        payload = text[m.end() :]
        if m.group(2):  # ;base64
            try:
                raw = base64.b64decode(payload, validate=True)
            except (binascii.Error, ValueError):
                return ExtractResult("plain", "", (), "decode_error")
            if raw.startswith(b"%PDF-"):
                from ocr_ray.core.pdfbin import extract_binpdf

                return extract_binpdf(raw)
            try:
                decoded = raw.decode("utf-8")
            except UnicodeDecodeError:
                return ExtractResult("plain", "", (), "decode_error")
        else:
            decoded = payload
    else:
        decoded = text
    if not decoded or decoded.isspace():
        return _EMPTY
    kind = classify_payload(decoded)
    try:
        if kind == "binpdf":
            from ocr_ray.core.pdfbin import extract_binpdf

            return extract_binpdf(decoded.encode("utf-8"))
        if kind == "html":
            return _extract_html(decoded)
        if kind == "pdf":
            return _extract_pdf(decoded)
        return _extract_plain(decoded)
    except Exception as e:  # poison-pill totality: never fail a block
        return ExtractResult(kind, "", (), f"extract_error:{type(e).__name__}")
