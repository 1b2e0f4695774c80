"""An INDEPENDENT from-spec span oracle for the extraction family.

This module intentionally does NOT import ``ocr_ray.core.extract`` or
``ocr_ray.stages.spans``.  It is a second implementation of the documented
span contract (SURVEY §2 / stages/spans.py module docstring; reference
semantics extract-data-from-pdf.ts:96-154) built on different machinery —
stdlib ``html.parser.HTMLParser`` with explicit offset bookkeeping instead
of the kernel's regex scanner — so agreement between the two is evidence
about the SPEC, not shared code (the same independence argument as
``tests/golden_extractor.py``, which this extends to spans).

Span contract per engine (offsets into the engine's input document, i.e.
the DECODED body for data-URI payloads):

* plain — trimmed segment cores of a greedy ``\\n\\s*\\n`` split of the
  raw document.
* pdf   — covering span per blank-line-separated line group: first
  contributing line's core start to last line's core end.
* html  — covering span per block over its contributing inter-tag
  fragments: first non-whitespace char of the first fragment to the
  trimmed end of the last.  Comments and well-formed script-like
  subtrees contribute nothing; each collapses to a single space for the
  text/link-density computation while the offset map keeps every
  surviving char's original position.

``ensure_golden_spans`` materializes the oracle as a parquet table next
to the transcripts fixture so the driver's DuckDB oracle can read it back
(the same read-back pattern as ``media_inventory_sql``).

Domain bound (documented, fuzz-discovered): on an UNTERMINATED ``<!--``
or an unterminated ``<script>``/``<style>``-style OPENER the two
machineries genuinely diverge — the kernel's regex scanner leaves the
unmatched token as literal text / a plain tag, while stdlib HTMLParser
enters comment/CDATA mode and swallows the rest of the document. Stray
CLOSERS and terminated regions (the only kinds any fixture or sane
document contains) agree exactly; the production path additionally
self-checks every html turn against the kernel's block stream, so a
payload outside this oracle's domain still cannot emit silently wrong
spans.
"""

from __future__ import annotations

import base64
import binascii
import html as _html_mod
import os
import re
import unicodedata
from html.parser import HTMLParser

BLOCK_ELEMS = frozenset(
    """address article aside blockquote body br caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li main
    nav ol option p pre section select table tbody td th thead tfoot title tr ul
    """.split()
)
BOILER_ELEMS = frozenset({"nav", "header", "footer", "aside", "form", "select", "option"})
HEADING_ELEMS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
DROP_ELEMS = frozenset({"head", "title"})
MIN_CONTENT = 25

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPTLIKE = re.compile(
    r"<(script|style|noscript|svg|template)\b[^>]*>.*?</\1\s*>", re.S | re.I
)


def _norm(s: str) -> str:
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
    return " ".join(s.split())


def classify(text: str) -> str:
    if not text or text.isspace():
        return "plain"
    if "\f" in text:
        return "pdf"
    if len(re.findall(r"</?[a-zA-Z][^<>]*>", text)) >= 3:
        return "html"
    lines = text.splitlines()
    if len(lines) >= 4:
        nonempty = [ln for ln in lines[:200] if ln.strip()]
        indented = [ln for ln in nonempty if re.match(r"^[ \t]{2,}\S", ln)]
        if len(nonempty) >= 4 and len(indented) * 10 >= len(nonempty) * 3:
            return "pdf"
    return "plain"


def decode_uri(text: str):
    m = re.match(r"^data:([^;,]*)(;base64)?,", text, re.S)
    if not m:
        return text, ""
    payload = text[m.end() :]
    if m.group(2):
        try:
            return base64.b64decode(payload, validate=True).decode("utf-8"), ""
        except (binascii.Error, ValueError, UnicodeDecodeError):
            return "", "decode_error"
    return payload, ""


# --- plain / pdf spans (line scans, from spec) ------------------------------


def plain_spans(doc: str):
    out = []
    pos = 0
    bounds = [m.span() for m in re.finditer(r"\n\s*\n", doc)] + [(len(doc), len(doc))]
    for s_start, s_end in bounds:
        seg = doc[pos:s_start]
        seg_off = pos
        pos = s_end
        if not seg.strip():
            continue
        lead = len(seg) - len(seg.lstrip())
        out.append(
            ("para", seg_off + lead, seg_off + len(seg.rstrip()), _norm(seg))
        )
    return out


def pdf_spans(doc: str):
    # header/footer census on normalized first/last nonblank lines per page
    pages = doc.split("\f")
    firsts: dict[str, int] = {}
    lasts: dict[str, int] = {}
    for pg in pages:
        stripped = [ln for ln in pg.split("\n") if ln.strip()]
        if stripped:
            f = _norm(stripped[0])
            firsts[f] = firsts.get(f, 0) + 1
            if len(stripped) > 1:
                last = _norm(stripped[-1])
                lasts[last] = lasts.get(last, 0) + 1
    multi = len(pages) >= 2
    hdr = {s for s, c in firsts.items() if multi and c >= 2}
    ftr = {s for s, c in lasts.items() if multi and c >= 2}

    out = []
    off = 0
    for pg in pages:
        loff = off
        off += len(pg) + 1
        groups = []  # (span_lo, span_hi, [raw lines])
        cur = None
        for ln in pg.split("\n"):
            l_off = loff
            loff = l_off + len(ln) + 1
            if ln.strip():
                s = l_off + (len(ln) - len(ln.lstrip()))
                e = l_off + len(ln.rstrip())
                if cur is None:
                    cur = [s, e, [ln]]
                else:
                    cur[1] = e
                    cur[2].append(ln)
            elif cur is not None:
                groups.append(cur)
                cur = None
        if cur is not None:
            groups.append(cur)
        for gi, (s, e, lns) in enumerate(groups):
            parts: list[str] = []
            for ln in lns:
                ln_n = _norm(ln)
                if not ln_n:
                    continue
                if parts and parts[-1].endswith("-") and ln_n[:1].islower():
                    parts[-1] = parts[-1][:-1] + ln_n
                else:
                    parts.append(ln_n)
            joined = " ".join(parts)
            if not joined:
                continue
            kind = "para"
            if len(lns) == 1:
                one = _norm(lns[0])
                if re.match(r"^(?:page\s+)?\d+(?:\s*(?:/|of)\s*\d+)?$", one, re.I):
                    kind = "pagenum"
                elif gi == 0 and one in hdr:
                    kind = "header"
                elif gi == len(groups) - 1 and one in ftr:
                    kind = "footer"
            out.append((kind, s, e, joined))
    return out


# --- html spans (HTMLParser walker over offset-mapped collapsed text) -------


def _collapse(doc: str, pattern: re.Pattern):
    """Replace every match with ONE space; return (text, offset_map) where
    offset_map[i] is the original offset of collapsed char i (the
    substituted space maps to its region's start — it is whitespace and
    can never become a span endpoint)."""
    parts: list[str] = []
    omap: list[int] = []
    last = 0
    for m in pattern.finditer(doc):
        seg = doc[last : m.start()]
        parts.append(seg)
        omap.extend(range(last, m.start()))
        parts.append(" ")
        omap.append(m.start())
        last = m.end()
    parts.append(doc[last:])
    omap.extend(range(last, len(doc)))
    omap.append(len(doc))  # one-past-the-end sentinel
    return "".join(parts), omap


class _SpanWalker(HTMLParser):
    """Block walker with per-block covering spans (collapsed coords)."""

    def __init__(self, text: str):
        super().__init__(convert_charrefs=False)
        self.text = text
        self.line_starts = [0]
        idx = text.find("\n")
        while idx >= 0:
            self.line_starts.append(idx + 1)
            idx = text.find("\n", idx + 1)
        self.blocks: list[tuple[str, int, int, str]] = []
        self.buf: list[str] = []
        self.frag_tokens: list[tuple[int, int]] = []
        self.span_lo = -1
        self.span_hi = -1
        self.link_chars = 0
        self.total_chars = 0
        self.a_depth = 0
        self.boiler = 0
        self.drop = 0
        self.heading = 0
        self.block_boiler = False
        self.block_heading = False

    def _abs(self) -> int:
        ln, off = self.getpos()
        return self.line_starts[ln - 1] + off

    # -- token accumulation (data / entity / char refs between tags) --------
    def _token(self, rawlen: int) -> None:
        if self.drop:
            return
        self.frag_tokens.append((self._abs(), rawlen))

    def handle_data(self, data):
        self._token(len(data))

    def handle_entityref(self, name):
        # HTMLParser also fires for refs missing the trailing ';'
        pos = self._abs()
        ref = "&" + name + ";"
        self._token(len(ref) if self.text.startswith(ref, pos) else len(name) + 1)

    def handle_charref(self, name):
        pos = self._abs()
        ref = "&#" + name + ";"
        self._token(len(ref) if self.text.startswith(ref, pos) else len(name) + 2)

    def _finalize_fragment(self) -> None:
        if not self.frag_tokens:
            return
        start = self.frag_tokens[0][0]
        end = self.frag_tokens[-1][0] + self.frag_tokens[-1][1]
        self.frag_tokens = []
        frag = self.text[start:end]
        plain = _html_mod.unescape(frag) if "&" in frag else frag
        self.buf.append(plain)
        n = len(plain.strip())
        self.total_chars += n
        if self.a_depth > 0:
            self.link_chars += n
        if frag.strip():
            lead = len(frag) - len(frag.lstrip())
            if self.span_lo < 0:
                self.span_lo = start + lead
            self.span_hi = start + len(frag.rstrip())

    # -- block machinery (same spec as the golden extractor) -----------------
    def _flush(self) -> None:
        txt = _norm("".join(self.buf))
        if txt:
            if self.block_boiler or 5 * self.link_chars > 2 * self.total_chars:
                kind = "boilerplate"
            elif self.block_heading:
                kind = "heading"
            elif len(txt) < MIN_CONTENT and self.link_chars > 0:
                kind = "boilerplate"
            else:
                kind = "content"
            self.blocks.append((kind, self.span_lo, self.span_hi, txt))
        self.buf = []
        self.span_lo = self.span_hi = -1
        self.link_chars = 0
        self.total_chars = 0
        self.block_boiler = self.boiler > 0
        self.block_heading = self.heading > 0

    def _tag(self, name: str, closing: bool) -> None:
        self._finalize_fragment()
        name = name.lower()
        if name == "a":
            self.a_depth = max(0, self.a_depth - 1) if closing else self.a_depth + 1
            return
        if name in BLOCK_ELEMS:
            self._flush()
            if name in BOILER_ELEMS:
                self.boiler = max(0, self.boiler - 1) if closing else self.boiler + 1
            if name in DROP_ELEMS:
                self.drop = max(0, self.drop - 1) if closing else self.drop + 1
            if name in HEADING_ELEMS:
                self.heading = max(0, self.heading - 1) if closing else self.heading + 1
            self.block_boiler = self.boiler > 0
            self.block_heading = self.heading > 0

    def handle_starttag(self, tag, attrs):
        self._tag(tag, False)

    def handle_endtag(self, tag):
        self._tag(tag, True)

    def handle_startendtag(self, tag, attrs):
        self._tag(tag, False)

    # name-less tag-ish tokens are fragment boundaries but never flush
    def handle_decl(self, decl):
        self._finalize_fragment()

    def handle_pi(self, data):
        self._finalize_fragment()

    def unknown_decl(self, data):
        self._finalize_fragment()


def html_spans(doc: str):
    # comments collapse first, then well-formed script-like subtrees of the
    # result (the documented substitution order); composing the two offset
    # maps recovers original positions for every surviving char
    t1, m1 = _collapse(doc, _COMMENT)
    t2, m2 = _collapse(t1, _SCRIPTLIKE)
    w = _SpanWalker(t2)
    w.feed(t2)
    w.close()
    w._finalize_fragment()
    w._flush()
    out = []
    for kind, lo, hi, txt in w.blocks:
        if lo < 0:
            # a block whose text came only from substituted whitespace can
            # never be non-empty after _norm; defensive skip
            continue
        # map collapsed coords back: lo points AT a real char; hi is one
        # past the last real char
        out.append((kind, m1[m2[lo]], m1[m2[hi - 1]] + 1, txt))
    return out


def golden_spans(raw):
    """(payload_kind, [(kind, span_start, span_end, text), ...]) for one
    turn — the independent mirror of ``stages.spans.spans_for_turn``."""
    if not isinstance(raw, str) or not raw or raw.isspace():
        return "plain", []
    doc, err = decode_uri(raw)
    if err or not doc or doc.isspace():
        return "plain", []
    kind = classify(doc)
    if kind == "html":
        return "html", html_spans(doc)
    if kind == "pdf":
        return "pdf", pdf_spans(doc)
    return "plain", plain_spans(doc)


# --- golden parquet materialization (driver read-back oracle) ---------------


def golden_spans_dir(n_convs: int, seed: int = 42) -> str:
    from ocr_ray.sources.transcripts import _default_fixture_root

    return os.path.join(
        _default_fixture_root(), f"golden_spans_s{seed}_c{n_convs}"
    )


def ensure_golden_spans(n_convs: int, seed: int = 42) -> str:
    """Compute the independent span oracle over the transcripts fixture and
    commit it as parquet (cached; pure Python, no Ray)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.sources.transcripts import ensure_transcripts

    out = golden_spans_dir(n_convs, seed)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    src = ensure_transcripts(n_convs, seed)
    cids, tids, pk, bidx, kinds, ss, ee, txts = [], [], [], [], [], [], [], []
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, fn), columns=["conv_id", "turn_idx", "text"])
        for cid, ti, raw in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("text").to_pylist(),
        ):
            k, rows = golden_spans(raw)
            for b, (kind, s, e, txt) in enumerate(rows):
                cids.append(cid)
                tids.append(ti)
                pk.append(k)
                bidx.append(b)
                kinds.append(kind)
                ss.append(s)
                ee.append(e)
                txts.append(txt)
    table = pa.table(
        {
            "conv_id": pa.array(cids, pa.string()),
            "turn_idx": pa.array(tids, pa.int32()),
            "payload_kind": pa.array(pk, pa.string()),
            "block_idx": pa.array(bidx, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "span_start": pa.array(ss, pa.int64()),
            "span_end": pa.array(ee, pa.int64()),
            "text": pa.array(txts, pa.string()),
        }
    )
    os.makedirs(out, exist_ok=True)
    tmp = os.path.join(out, f".tmp-golden-{os.getpid()}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(out, "golden.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out
