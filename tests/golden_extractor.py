"""An INDEPENDENT from-spec reimplementation of the extraction contract.

This module intentionally does NOT import ``ocr_ray.core.extract``. It is a
second implementation of the documented semantics (SURVEY §2 / the reference
flow extract-data-from-pdf.ts:48-52,87-91,96-154) built on different
machinery — stdlib ``html.parser.HTMLParser`` instead of the kernel's regex
scanner, plain-python line scans instead of the kernel's compiled pattern
bank — so agreement between the two is evidence about the SPEC, not shared
code (VERDICT r1: the pytest oracle previously imported the kernel itself).

Covered contract:
* engine dispatch: empty/space -> plain; form feed -> pdf; >=3 tags -> html;
  >=4 lines with >=30% column-indented -> pdf; else plain
* data-URI strip + base64 decode with decode_error totality
* plain: NFC + paragraph split + whitespace collapse
* html: block segmentation at block-level elements, boilerplate containers
  (nav/header/footer/aside/form/select/option), link-density rule
  (5*link_chars > 2*total_chars), short-linked-block rule (<25 chars with
  any link text), heading blocks, head/title dropped, script/style/comment
  contents dropped
* pdf: page/blank-line block segmentation, hyphenated line-break repair,
  page-number / repeated header & footer detection
"""

from __future__ import annotations

import base64
import binascii
import re
import unicodedata
from html.parser import HTMLParser

BLOCK_ELEMS = set(
    """address article aside blockquote body br caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li main
    nav ol option p pre section select table tbody td th thead tfoot title tr ul
    """.split()
)
BOILER_ELEMS = {"nav", "header", "footer", "aside", "form", "select", "option"}
HEADING_ELEMS = {"h1", "h2", "h3", "h4", "h5", "h6"}
DROP_ELEMS = {"head", "title"}
SCRIPTLIKE = {"script", "style", "noscript", "svg", "template"}
MIN_CONTENT = 25


def norm(s: str) -> str:
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
    return " ".join(s.split())


def classify(text: str) -> str:
    if not text or text.isspace():
        return "plain"
    if "\f" in text:
        return "pdf"
    tags = re.findall(r"</?[a-zA-Z][^<>]*>", text)
    if len(tags) >= 3:
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
    payload = text[m.end():]
    if m.group(2):
        try:
            return base64.b64decode(payload, validate=True).decode("utf-8"), ""
        except (binascii.Error, ValueError, UnicodeDecodeError):
            return "", "decode_error"
    return payload, ""


class _Walker(HTMLParser):
    """Event-driven block segmentation (a genuinely different parse than the
    kernel's single regex scan)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str]] = []  # (kind, text)
        self.buf: list[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.a_depth = 0
        self.boiler = 0
        self.drop = 0
        self.heading = 0
        self.script = 0
        self.block_boiler = False
        self.block_heading = False

    def _flush(self):
        txt = norm("".join(self.buf))
        if txt:
            if self.block_boiler or 5 * self.link_chars > 2 * self.total_chars:
                kind = "boilerplate"
            elif self.block_heading:
                kind = "heading"
            elif len(txt) < MIN_CONTENT and self.link_chars > 0:
                kind = "boilerplate"
            else:
                kind = "content"
            self.blocks.append((kind, txt))
        self.buf = []
        self.link_chars = 0
        self.total_chars = 0
        self.block_boiler = self.boiler > 0
        self.block_heading = self.heading > 0

    def _stamp(self):
        self.block_boiler = self.boiler > 0
        self.block_heading = self.heading > 0

    def handle_data(self, data):
        if self.drop or self.script:
            return
        self.buf.append(data)
        n = len(data.strip())
        self.total_chars += n
        if self.a_depth > 0:
            self.link_chars += n

    def _tag(self, name, closing):
        if name in SCRIPTLIKE:
            self.script = max(0, self.script - 1) if closing else self.script + 1
            return
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
            self._stamp()

    def handle_starttag(self, tag, attrs):
        self._tag(tag.lower(), False)

    def handle_endtag(self, tag):
        self._tag(tag.lower(), True)

    def handle_startendtag(self, tag, attrs):
        self._tag(tag.lower(), False)


def extract_html(text: str):
    # the contract strips comments and well-formed script-like subtrees
    text = re.sub(r"<!--.*?-->", " ", text, flags=re.S)
    w = _Walker()
    w.feed(text)
    w.close()
    w._flush()
    blocks = w.blocks
    main = "\n\n".join(t for k, t in blocks if k in ("content", "heading"))
    return "html", main, blocks, ""


def extract_pdf(text: str):
    if not text.isascii():
        text = unicodedata.normalize("NFC", text)
    pages = [pg.splitlines() for pg in text.split("\f")]
    firsts: dict[str, int] = {}
    lasts: dict[str, int] = {}
    for lns in pages:
        stripped = [ln for ln in lns if ln.strip()]
        if stripped:
            firsts[norm(stripped[0])] = firsts.get(norm(stripped[0]), 0) + 1
            if len(stripped) > 1:
                lasts[norm(stripped[-1])] = lasts.get(norm(stripped[-1]), 0) + 1
    multi = len(pages) >= 2
    hdr = {s for s, c in firsts.items() if multi and c >= 2}
    ftr = {s for s, c in lasts.items() if multi and c >= 2}

    blocks: list[tuple[str, str]] = []
    mains: list[str] = []
    for lns in pages:
        groups: list[list[str]] = []
        cur: list[str] = []
        for ln in lns:
            if ln.strip():
                cur.append(ln)
            elif cur:
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        for gi, g in enumerate(groups):
            parts: list[str] = []
            for ln in g:
                ln = norm(ln)
                if not ln:
                    continue
                if parts and parts[-1].endswith("-") and ln[:1].islower():
                    parts[-1] = parts[-1][:-1] + ln
                else:
                    parts.append(ln)
            joined = " ".join(parts)
            if not joined:
                continue
            kind = "para"
            if len(g) == 1:
                one = norm(g[0])
                if re.match(r"^(?:page\s+)?\d+(?:\s*(?:/|of)\s*\d+)?$", one, re.I):
                    kind = "pagenum"
                elif gi == 0 and one in hdr:
                    kind = "header"
                elif gi == len(groups) - 1 and one in ftr:
                    kind = "footer"
            blocks.append((kind, joined))
            if kind == "para":
                mains.append(joined)
    return "pdf", "\n\n".join(mains), blocks, ""


def extract_plain(text: str):
    if not text.isascii():
        text = unicodedata.normalize("NFC", text)
    paras = [norm(p) for p in re.split(r"\n\s*\n", text)]
    paras = [p for p in paras if p]
    blocks = [("para", p) for p in paras]
    return "plain", "\n\n".join(paras), blocks, ""


def golden_extract(text):
    """(payload_kind, main_text, blocks, error) — the independent oracle."""
    if text is None:
        return "plain", "", [], "empty_input"
    if not isinstance(text, str):
        return "plain", "", [], "type_error"
    if not text or text.isspace():
        return "plain", "", [], "empty_input"
    decoded, err = decode_uri(text)
    if err:
        return "plain", "", [], err
    if not decoded or decoded.isspace():
        return "plain", "", [], "empty_input"
    kind = classify(decoded)
    if kind == "html":
        return extract_html(decoded)
    if kind == "pdf":
        return extract_pdf(decoded)
    return extract_plain(decoded)
