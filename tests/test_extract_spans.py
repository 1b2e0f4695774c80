"""Source-span gate for the plain engine (north rule: "extracted
text/spans per turn").

Every emitted block carries [span_start, span_end) char offsets into the
RAW payload with the invariants:
* _norm_text(raw[span_start:span_end]) == text (content round-trip)
* the span is trimmed to its non-whitespace core (edges non-whitespace)
* (block_idx, text) match the kernel's blocks exactly — the RE2 split
  convention used for offsets provably coarsens to the kernel's greedy
  \\n\\s*\\n split on the subset
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.core.extract import _norm_text, extract_turn
from ocr_ray.pipelines.extract_oracle import _plain_spans_sql, _plain_spans_table


@pytest.fixture(scope="module")
def transcripts_sf0001():
    from ocr_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(200, seed=42)


def _side_by_side(path: str):
    t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
    keys = ["conv_id", "turn_idx", "block_idx"]
    got = (
        _plain_spans_table(t)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    want = duckdb.sql(_plain_spans_sql(path)).df().sort_values(keys).reset_index(drop=True)
    return t, got, want


class TestPlainSpans:
    def test_fixture_parity(self, transcripts_sf0001):
        t, got, want = _side_by_side(transcripts_sf0001)
        assert len(got) > 1000
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )

    def test_invariants_vs_kernel(self, transcripts_sf0001):
        t, got, _ = _side_by_side(transcripts_sf0001)
        raw = {
            (c, i): x
            for c, i, x in zip(
                t.column("conv_id").to_pylist(),
                t.column("turn_idx").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        per_turn: dict = {}
        for row in got.itertuples():
            x = raw[(row.conv_id, row.turn_idx)]
            seg = x[row.span_start : row.span_end]
            assert _norm_text(seg) == row.text
            assert seg == seg.strip()
            per_turn.setdefault((row.conv_id, row.turn_idx), []).append(
                (row.block_idx, row.text)
            )
        for (c, i), blocks in per_turn.items():
            r = extract_turn(raw[(c, i)])
            assert [b.text for b in r.blocks] == [t for _, t in sorted(blocks)]

    def test_planted_conventions(self, tmp_path):
        """Separator-apportionment divergence cases: the trimmed span must be
        identical under the kernel's greedy split and the mirror's RE2
        split; NFD content must round-trip through NFC while offsets stay
        raw."""
        payloads = [
            "a\n \n \nb",  # greedy separator eats ' \n ' ; RE2 leaves ' \nb'
            "\n\nlead\n\n\n\ntail\n\n",  # empty edge segments + 3-sep run
            "x\n\t\ny\n \nz",  # tab/space separator variants
            "  séance  déjà\n\nw",  # NFD chars: NFC shrinks, offsets raw
            "one two\tthree",  # single block, inner tabs
            "\t\n \n\t",  # whitespace-only -> zero blocks
        ]
        t = pa.table(
            {
                "conv_id": [f"p-{i}" for i in range(len(payloads))],
                "turn_idx": pa.array([0] * len(payloads), pa.int32()),
                "text": payloads,
            }
        )
        d = str(tmp_path / "planted")
        import os

        os.makedirs(d)
        pq.write_table(t, f"{d}/part-0.parquet")
        got = (
            _plain_spans_table(t)
            .to_pandas()
            .sort_values(["conv_id", "block_idx"])
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(_plain_spans_sql(d))
            .df()
            .sort_values(["conv_id", "block_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )
        for row in got.itertuples():
            x = payloads[int(row.conv_id.split("-")[1])]
            seg = x[row.span_start : row.span_end]
            assert _norm_text(seg) == row.text and seg == seg.strip()
        # conv p-0: kernel and span blocks agree despite split divergence
        r = extract_turn(payloads[0])
        g0 = got[got.conv_id == "p-0"]
        assert [b.text for b in r.blocks] == list(g0.text)
        # whitespace-only payload yields no rows
        assert (got.conv_id == "p-5").sum() == 0


class TestFullCorpusSpans:
    """Production surface: every kernel block of every turn gets a span,
    kinds zipped from the kernel with a self-checking alignment assert."""

    def test_totality_vs_kernel(self, transcripts_sf0001):
        from ocr_ray.core.extract import decode_data_uri
        from ocr_ray.stages.spans import SPANS_SCHEMA, spans_table

        t = pq.read_table(
            transcripts_sf0001, columns=["conv_id", "turn_idx", "text"]
        )
        got = spans_table(t)
        assert got.schema == SPANS_SCHEMA
        raw = {
            (c, i): x
            for c, i, x in zip(
                t.column("conv_id").to_pylist(),
                t.column("turn_idx").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        per: dict = {}
        for row in got.to_pylist():
            doc, _ = decode_data_uri(raw[(row["conv_id"], row["turn_idx"])])
            seg = doc[row["span_start"] : row["span_end"]]
            assert seg == seg.strip()
            if row["payload_kind"] == "plain":
                assert _norm_text(seg) == row["text"]
            per.setdefault((row["conv_id"], row["turn_idx"]), []).append(row)
        # EVERY turn's kernel blocks are reproduced (totality incl. edge
        # payloads: empty, giant-line, CJK, data-URI, broken markup)
        for k, x in raw.items():
            r = extract_turn(x)
            rows = sorted(per.get(k, []), key=lambda d: d["block_idx"])
            assert [(b.kind, b.text) for b in r.blocks] == [
                (d["kind"], d["text"]) for d in rows
            ], k

    def test_drift_detection(self):
        """The self-check raises on any scan/kernel divergence rather than
        emitting silently misaligned spans."""
        from ocr_ray.stages import spans as sp

        orig = sp._plain_spans
        sp._plain_spans = lambda doc: orig(doc)[:-1]  # drop one span
        try:
            with pytest.raises(AssertionError, match="span drift"):
                sp.spans_for_turn("one block\n\ntwo block")
        finally:
            sp._plain_spans = orig


class TestHtmlSpans:
    """No SQL mirror (positional regex not expressible in DuckDB): the gate
    is block-for-block kernel parity over EVERY html-classified row —
    including the generator's broken/unclosed-markup branch — plus span
    invariants."""

    def test_kernel_parity_and_invariants(self, transcripts_sf0001):
        from ocr_ray.core.extract import classify_payload, decode_data_uri
        from ocr_ray.pipelines.extract_oracle import _html_spans_table

        t = pq.read_table(
            transcripts_sf0001, columns=["conv_id", "turn_idx", "text"]
        )
        got = _html_spans_table(t).to_pylist()
        assert len(got) > 3000
        raw = {
            (c, i): x
            for c, i, x in zip(
                t.column("conv_id").to_pylist(),
                t.column("turn_idx").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        per: dict = {}
        for row in got:
            doc, _ = decode_data_uri(raw[(row["conv_id"], row["turn_idx"])])
            seg = doc[row["span_start"] : row["span_end"]]
            assert seg == seg.strip()
            if "<" not in seg and "&" not in seg:
                assert _norm_text(seg) == row["text"]
            per.setdefault((row["conv_id"], row["turn_idx"]), []).append(row)
        # every html-classified turn with blocks is present and matches
        n_html = 0
        for (c, i), x in raw.items():
            doc, err = decode_data_uri(x)
            if err or classify_payload(doc) != "html":
                continue
            r = extract_turn(x)
            rows = sorted(per.get((c, i), []), key=lambda d: d["block_idx"])
            assert [(b.block_idx, b.kind, b.text) for b in r.blocks] == [
                (d["block_idx"], d["kind"], d["text"]) for d in rows
            ], (c, i)
            starts = [d["span_start"] for d in rows]
            assert starts == sorted(starts)
            n_html += 1
        assert n_html > 300

    def test_planted_offsets(self):
        """Comments/scripts pad to equal length so offsets survive; drop
        regions contribute nothing; entity fragments keep raw extents."""
        from ocr_ray.pipelines.extract_oracle import _html_spans_rows

        doc = (
            "<html><head><title>skip me</title></head><body>"
            "<!-- a comment -->"
            "<p>  hello &amp; goodbye  </p>"
            "<script>var x = '<p>fake</p>';</script>"
            "<nav><a href='/x'>link</a></nav>"
            "<p>tail block that is long enough to stay content</p></body></html>"
        )
        rows = _html_spans_rows(doc)
        texts = [r[4] for r in rows]
        assert "hello & goodbye" in texts
        assert "skip me" not in texts  # drop region
        assert not any("fake" in s for s in texts)  # script padded away
        r_hello = rows[texts.index("hello & goodbye")]
        s, e = r_hello[2], r_hello[3]
        assert doc[s:e] == "hello &amp; goodbye"  # raw extent, trimmed
        r_link = rows[texts.index("link")]
        assert r_link[1] == "boilerplate"
        assert doc[r_link[2] : r_link[3]] == "link"
        r_tail = rows[texts.index("tail block that is long enough to stay content")]
        assert r_tail[1] == "content"
        assert doc[r_tail[2] : r_tail[3]] == r_tail[4]

    def test_pad_interior_link_density(self):
        """A comment padded INSIDE a link must not inflate link_chars /
        total_chars: the kernel sees a single space there, so the replay's
        density counts collapse each padded run to one space (regression:
        padding once flipped this block's kind to boilerplate)."""
        from ocr_ray.core.extract import _extract_html
        from ocr_ray.pipelines.extract_oracle import _html_spans_rows

        cases = [
            "<p><a>click<!-- twenty-nine chars pad -->me</a>"
            " plus surrounding words</p>",
            # pad inside the link long enough that the padded count would
            # cross the 5*link > 2*total boilerplate threshold
            "<p><a>x<!-- aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa -->y</a>"
            " and forty plain chars of body text here</p>",
            # script pad inside a link
            "<p><a>go<script>var x=1;</script>now</a> rest of the body"
            " words here</p>",
        ]
        for doc in cases:
            k = _extract_html(doc)
            rows = _html_spans_rows(doc)
            assert [(b.kind, b.text) for b in k.blocks] == [
                (kind, txt) for (_, kind, _, _, txt) in rows
            ], doc


class TestPdfSpans:
    def test_fixture_parity_and_invariants(self, transcripts_sf0001):
        from ocr_ray.pipelines.extract_oracle import (
            _pdf_spans_sql,
            _pdf_spans_table,
        )

        t = pq.read_table(
            transcripts_sf0001, columns=["conv_id", "turn_idx", "text"]
        )
        keys = ["conv_id", "turn_idx", "block_idx"]
        got = _pdf_spans_table(t).to_pandas().sort_values(keys).reset_index(drop=True)
        want = (
            duckdb.sql(_pdf_spans_sql(transcripts_sf0001))
            .df()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        assert len(got) > 1000
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )
        raw = {
            (c, i): x
            for c, i, x in zip(
                t.column("conv_id").to_pylist(),
                t.column("turn_idx").to_pylist(),
                t.column("text").to_pylist(),
            )
        }
        per: dict = {}
        for row in got.itertuples():
            x = raw[(row.conv_id, row.turn_idx)]
            seg = x[row.span_start : row.span_end]
            assert seg == seg.strip()
            # without a hyphen merge the covering span norm-roundtrips
            if "-" not in seg:
                assert _norm_text(seg) == row.text
            per.setdefault((row.conv_id, row.turn_idx), []).append(
                (row.block_idx, row.text)
            )
        for k, blocks in per.items():
            r = extract_turn(raw[k])
            assert [b.text for b in r.blocks] == [t for _, t in sorted(blocks)]

    def test_planted_pdf(self, tmp_path):
        """Hyphen chains, multi-page offsets, indented groups: spans cover
        the contributing lines exactly and texts match the kernel."""
        from ocr_ray.pipelines.extract_oracle import (
            _pdf_spans_sql,
            _pdf_spans_table,
        )

        p1 = "TITLE 7\n\n    exam-\n    ple merge\n\n1 / 2"
        p2 = "TITLE 7\n\n    Upper-\n    Case no merge\n\n2 / 2"
        payloads = [p1 + "\f" + p2, "    lone\tgroup\n\n\n    second   one"]
        t = pa.table(
            {
                "conv_id": [f"q-{i}" for i in range(len(payloads))],
                "turn_idx": pa.array([0] * len(payloads), pa.int32()),
                "text": payloads,
            }
        )
        d = str(tmp_path / "planted_pdf")
        import os

        os.makedirs(d)
        pq.write_table(t, f"{d}/part-0.parquet")
        keys = ["conv_id", "turn_idx", "block_idx"]
        got = _pdf_spans_table(t).to_pandas().sort_values(keys).reset_index(drop=True)
        want = duckdb.sql(_pdf_spans_sql(d)).df().sort_values(keys).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )
        g0 = got[got.conv_id == "q-0"].reset_index(drop=True)
        texts = list(g0.text)
        assert "example merge" in texts  # dehyphenation fold
        assert "Upper- Case no merge" in texts  # uppercase continuation keeps '-'
        # page-2 spans land past the \f boundary
        assert g0.span_start[g0.text == "Upper- Case no merge"].iloc[0] > len(p1)
        full = payloads[0]
        for row in g0.itertuples():
            seg = full[row.span_start : row.span_end]
            assert seg == seg.strip()


class TestGoldenSpansOracle:
    """The INDEPENDENT span oracle (ocr_ray.oracle_spans: HTMLParser walker
    + offset maps, no kernel imports) must agree with the production span
    scan row-for-row — the driver's extract_spans / extract_html_spans
    gates read its committed parquet back via DuckDB."""

    def test_no_kernel_imports(self):
        import ast

        src = open("ocr_ray/oracle_spans.py").read()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            mods = []
            if isinstance(node, ast.Import):
                mods = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                mods = [node.module or ""]
            for m in mods:
                assert not m.startswith("ocr_ray.core"), m
                assert not m.startswith("ocr_ray.stages"), m
                assert not m.startswith("ocr_ray.pipelines"), m

    def test_full_fixture_parity(self, transcripts_sf0001):
        from ocr_ray.oracle_spans import golden_spans
        from ocr_ray.stages.spans import spans_for_turn

        t = pq.read_table(transcripts_sf0001, columns=["conv_id", "turn_idx", "text"])
        n_rows = 0
        for raw in t.column("text").to_pylist():
            k1, r1 = spans_for_turn(raw if raw is not None else "")
            k2, r2 = golden_spans(raw)
            assert r1 == r2 and (not r1 or k1 == k2), (k1, k2, raw[:80])
            n_rows += len(r1)
        assert n_rows > 5000

    def test_planted_edge_payloads(self):
        """Entity refs without semicolons, comments inside links, scripts
        with markup inside, data-URIs — both implementations agree and the
        spans roundtrip to trimmed raw extents."""
        import base64

        from ocr_ray.oracle_spans import golden_spans
        from ocr_ray.stages.spans import spans_for_turn

        inner = "<html><body><p>decoded body with enough text here.</p></body></html>"
        cases = [
            "<p>a &amp; b</p><p>pad</p><p>pad2</p>",
            "<p><a>x<!-- padpadpad -->y</a> and body words enough here</p>",
            "<div>pre<script>var s='<p>no</p>';</script>post</div><p>x</p>",
            "<p>tail &amp broken entity</p><p>p2</p><p>p3</p>",
            "data:text/html;base64,"
            + base64.b64encode(inner.encode()).decode(),
            "plain text\n\n  with a second para",
            "PAGE ONE\n\n    indented body line one\n    and two\n\n1 / 2\f"
            "PAGE ONE\n\n    more body\n\n2 / 2",
        ]
        for raw in cases:
            k1, r1 = spans_for_turn(raw)
            k2, r2 = golden_spans(raw)
            assert r1 == r2 and (not r1 or k1 == k2), raw[:60]

    def test_randomized_cross_implementation_fuzz(self):
        """3k random tag-soup documents (nesting, broken markup, comments
        and scripts inside links, entities, padding traps): the stdlib-
        parser golden oracle and the regex-scanner production replay must
        agree on every (kind, span, text) row."""
        import random

        from ocr_ray.oracle_spans import golden_spans
        from ocr_ray.stages.spans import spans_for_turn

        random.seed(20260821)
        # comment and script/style regions appear TERMINATED (plus stray
        # closers): unterminated OPENERS are the documented domain bound
        # where regex scanner and HTMLParser legitimately diverge (see
        # ocr_ray/oracle_spans.py docstring)
        toks = [
            "<p>", "</p>", "<a>", "</a>", "<div>", "</div>", "<nav>",
            "</nav>", "<h1>", "</h1>", "<h2>", "</h2>",
            "<script>var x='<p>no</p>';</script>", "</script>",
            "<style>.a{color:red}</style>", "</style>",
            "<!-- a comment -->", "<!--x-->", "word", "link text", "x",
            "&amp;", "&lt;", "&#233;", "  ", "\n",
            "aa bb cc dd ee ff gg hh ii jj kk ll mm", "<br/>", "<li>",
            "</li>", "<footer>", "</footer>", "é café",
        ]
        n_checked = 0
        for _ in range(3000):
            doc = "".join(
                random.choice(toks) for _ in range(random.randint(3, 40))
            )
            k1, r1 = spans_for_turn(doc)
            k2, r2 = golden_spans(doc)
            assert r1 == r2 and (not r1 or k1 == k2), repr(doc)[:120]
            n_checked += 1
        assert n_checked == 3000
