"""Driver-gate parity for the html/pdf extraction engines (VERDICT r2 #1).

The provably-mirrorable subsets run the REAL kernel against an independent
DuckDB reimplementation. These tests exercise the parity on:

* the deterministic transcripts fixture (the driver's exact domain), and
* PLANTED hostile payloads probing every filter clause — nested and
  interleaved boilerplate containers, stray closes, unclosed pairs,
  mid-document doctype, entity chains, hyphen chains, repeated
  headers/footers, pagenum variants. For every planted payload BOTH sides
  must agree on inclusion (and on the value when included) — an exclusion
  bug on one side only shows up as a row-set mismatch.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.core.extract import extract_turn
from ocr_ray.pipelines.extract_oracle import (
    _html_sql,
    _pdf_blocks_sql,
    _pdf_sql,
    _provably_simple_html_mask,
    _run_pdf_kernel,
)


@pytest.fixture(scope="module")
def transcripts_sf0001():
    from ocr_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(200, seed=42)


def _html_side_by_side(path: str):
    t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
    sub = t.filter(_provably_simple_html_mask(t.column("text")))
    res = [extract_turn(x) for x in sub.column("text").to_pylist()]
    ray_df = (
        pa.table(
            {
                "conv_id": sub.column("conv_id"),
                "turn_idx": sub.column("turn_idx"),
                "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                "main_text": pa.array([r.main_text for r in res], pa.string()),
                "error": pa.array([r.error for r in res], pa.string()),
            }
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ora_df = (
        duckdb.sql(_html_sql(path))
        .df()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return ray_df, ora_df


def _pdf_side_by_side(path: str, blocks: bool):
    t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
    keys = ["conv_id", "turn_idx", "block_idx"] if blocks else ["conv_id", "turn_idx"]
    ray_df = (
        _run_pdf_kernel(t, explode_blocks=blocks)
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    sql = _pdf_blocks_sql(path) if blocks else _pdf_sql(path)
    ora_df = duckdb.sql(sql).df().sort_values(keys).reset_index(drop=True)
    if blocks:
        ora_df["block_idx"] = ora_df["block_idx"].astype("int32")
    return ray_df, ora_df


def _assert_frames_equal(ray_df, ora_df):
    assert len(ray_df) == len(ora_df), (
        f"row-set mismatch: ray={len(ray_df)} oracle={len(ora_df)}; "
        f"ray-only keys {set(map(tuple, ray_df.iloc[:, :2].values)) - set(map(tuple, ora_df.iloc[:, :2].values))}"
    )
    pd.testing.assert_frame_equal(
        ray_df, ora_df[ray_df.columns], check_dtype=False
    )


class TestFixtureParity:
    def test_html_turns(self, transcripts_sf0001):
        ray_df, ora_df = _html_side_by_side(transcripts_sf0001)
        assert len(ray_df) > 300  # real coverage of the html slice, not a corner
        _assert_frames_equal(ray_df, ora_df)

    def test_pdf_turns(self, transcripts_sf0001):
        ray_df, ora_df = _pdf_side_by_side(transcripts_sf0001, blocks=False)
        assert len(ray_df) > 200
        _assert_frames_equal(ray_df, ora_df)

    def test_pdf_blocks(self, transcripts_sf0001):
        ray_df, ora_df = _pdf_side_by_side(transcripts_sf0001, blocks=True)
        assert len(ray_df) > 2000
        kinds = set(ray_df["kind"])
        # the fixture exercises the full layout classifier
        assert {"para", "pagenum", "header"} <= kinds
        _assert_frames_equal(ray_df, ora_df)


_HTML_PLANTS = [
    # in-subset: simple blocks + heading
    "<html><body><h1>Title here</h1><p>alpha beta gamma</p><p>delta</p></body></html>",
    # in-subset: head drop + boiler drops + links inside boiler only
    '<!DOCTYPE html><html><head><title>T</title></head><body>'
    '<nav><ul><li><a href="/p/1">x</a> | <a href="/p/2">y</a></li></ul></nav>'
    "<main><p>real content text</p></main>"
    '<footer><a href="/p/3">z</a> legal</footer></body></html>',
    # in-subset: entities (ordered single-pass unescape)
    "<p>a &amp; b &lt;tag&gt; &#233;t&#233;</p><p>x</p><p>y</p>",
    # in-subset: tricky double-entity — &amp;lt; must stay literal '&lt;'
    "<p>&amp;lt;</p><p>pad one</p><p>pad two</p>",
    # in-subset: nested boiler (nav inside header) — replaces compose
    "<header><nav>menu items</nav>extra</header><p>body text</p><p>b2</p>",
    # in-subset: unclosed p tags (flush-only elements need no pairing)
    "<p>one<p>two<p>three",
    # in-subset: mid-document doctype (nameless tag: no flush both sides)
    "<p>aa</p>x<!DOCTYPE html>y<p>bb</p>",
    # in-subset: NFC normalization inside fragments
    "<p>séance café</p><p>naïve</p><p>déjà</p>",
    # EXCLUDED: interleaved boiler containers (nav/header cross)
    "<nav>a<header>b</nav>c</header><p>x</p><p>y</p><p>z</p>",
    # EXCLUDED: duplicate nav pair
    "<nav>a</nav><nav>b</nav><p>x</p><p>y</p><p>z</p>",
    # EXCLUDED: stray close before open
    "</nav>a<nav>b</nav><p>x</p><p>y</p>",
    # EXCLUDED: unclosed boiler container
    "<nav>menu<p>x</p><p>y</p><p>z</p>",
    # EXCLUDED: attribute on non-anchor tag
    '<p class="x">a</p><p>b</p><p>c</p>',
    # EXCLUDED: tag outside inventory
    "<span>a</span><p>b</p><p>c</p><p>d</p>",
    # EXCLUDED: unknown entity
    "<p>&nbsp;</p><p>b</p><p>c</p>",
    # EXCLUDED: comment
    "<!-- hi --><p>a</p><p>b</p><p>c</p>",
    # EXCLUDED: anchor outside boiler
    '<p><a href="/p/1">text link</a></p><p>b</p><p>c</p>',
    # EXCLUDED: malformed head (title close outside head)
    "<head><title>t</head></title><p>a</p><p>b</p><p>c</p>",
    # EXCLUDED: fewer than 3 tags -> not provably html-routed
    "<p>just one</p>",
]

_PDF_PLANTS = [
    # in-subset: two pages, repeated header line + pagenum footers
    "DOC HEAD\n\nbody para one line\nsecond line\n\n1 / 2\fDOC HEAD\n\nmore body text\n\n2 / 2",
    # in-subset: hyphen merge (lowercase continuation)
    "  intro line\n\nthis is an exam-\nple of a merge\n\nend\f  p2\n\nfiller here",
    # in-subset: hyphen NOT merged (uppercase continuation)
    "  intro\n\nkeep the hyphen-\nNext starts upper\n\nend\f  p2\n\nfiller",
    # in-subset: hyphen chain across three lines
    "  t\n\nsuper-\ncali-\nfragilistic\n\nend\f  t2\n\npad",
    # in-subset: pagenum variants
    "Page 3\n\ncontent a\n\npage 4 of 9\f5\n\ncontent b\n\n6 of 7",
    # in-subset: single page (indent-heuristic routed, no \f)
    "    indented one\n    indented two\n    indented three\n    indented four",
    # in-subset: blank-heavy page structure + empty pages
    "\f\fREAL\n\ncontent line\n\nREAL2\f\f",
    # in-subset: lone hyphen lines (no merge: '-' is not lowercase)
    "  x\n\n-\n-\nother\n\nend\f  x2\n\npad",
    # in-subset since r4: hyphen continuation starting with a non-ASCII
    # LOWERCASE letter merges on both sides (islower == \p{Ll} in-class)
    "  a\n\nword-\nétude suite\n\nend\f  b\n\npad",
    # EXCLUDED: non-ASCII decimal digit (Python \\d vs RE2 [0-9])
    "  a\n\n١٢٣\n\nend\f  b\n\npad",
    # EXCLUDED: carriage return (splitlines divergence)
    "  a\r\n  b\n  c\n  d\f  e\n  f",
    # EXCLUDED: whitespace-only (kernel empty_input guard)
    " \f \f ",
    # EXCLUDED: data-URI prefix
    "data:text/plain,abc\fdef",
    # EXCLUDED: three tags present -> html-routed even without \f... but \f
    # wins the dispatch, so WITH \f this stays pdf and must be INCLUDED:
    "<p>a</p><p>b</p><p>c</p>\n\nbody\f  page2\n\npad",
]


def _plant_table(payloads) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([f"plant-{i:04d}" for i in range(len(payloads))]),
            "turn_idx": pa.array([0] * len(payloads), pa.int32()),
            "role": pa.array(["user"] * len(payloads)),
            "text": pa.array(payloads, pa.string()),
            "tool": pa.array([""] * len(payloads)),
            "ts": pa.array([0] * len(payloads), pa.timestamp("us")),
        }
    )


class TestPlantedParity:
    @pytest.fixture(scope="class")
    def html_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("html_plants")
        pq.write_table(_plant_table(_HTML_PLANTS), str(d / "part-0.parquet"))
        return str(d)

    @pytest.fixture(scope="class")
    def pdf_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("pdf_plants")
        pq.write_table(_plant_table(_PDF_PLANTS), str(d / "part-0.parquet"))
        return str(d)

    def test_html_planted(self, html_dir):
        ray_df, ora_df = _html_side_by_side(html_dir)
        # the first 8 plants are designed in-subset; the rest excluded
        assert len(ray_df) == 8, set(ray_df["conv_id"])
        _assert_frames_equal(ray_df, ora_df)

    def test_html_planted_values(self, html_dir):
        ray_df, _ = _html_side_by_side(html_dir)
        by = dict(zip(ray_df["conv_id"], ray_df["main_text"]))
        assert by["plant-0000"] == "Title here\n\nalpha beta gamma\n\ndelta"
        assert by["plant-0001"] == "real content text"  # head+boiler stripped
        assert by["plant-0003"] == "&lt;\n\npad one\n\npad two"  # single-pass
        assert by["plant-0006"] == "aa\n\nxy\n\nbb"  # doctype: no flush
        assert "séance café" in by["plant-0007"]  # NFC applied

    def test_pdf_planted(self, pdf_dir):
        ray_df, ora_df = _pdf_side_by_side(pdf_dir, blocks=False)
        assert len(ray_df) == 10, set(ray_df["conv_id"])
        _assert_frames_equal(ray_df, ora_df)

    def test_pdf_planted_blocks(self, pdf_dir):
        ray_df, ora_df = _pdf_side_by_side(pdf_dir, blocks=True)
        _assert_frames_equal(ray_df, ora_df)
        k = ray_df.set_index(["conv_id", "block_idx"])["kind"]
        # plant-0: repeated first line -> header on both pages; pagenums
        assert k["plant-0000", 0] == "header"
        assert k["plant-0000", 2] == "pagenum"

    def test_pdf_planted_values(self, pdf_dir):
        ray_df, _ = _pdf_side_by_side(pdf_dir, blocks=False)
        by = dict(zip(ray_df["conv_id"], ray_df["main_text"]))
        assert "example of a merge" in by["plant-0001"]  # dehyphenated
        assert "hyphen- Next" in by["plant-0002"]  # NOT merged
        assert "supercalifragilistic" in by["plant-0003"]  # chain merge
        assert "wordétude suite" in by["plant-0008"]  # non-ASCII lower merge


class TestHtmlBlocksGate:
    """extract_html_blocks: the block classifier (content/heading/
    boilerplate) + document-order block_idx, SQL-mirrored via the
    marker-stream technique."""

    def _side_by_side(self, path):
        from ocr_ray.pipelines.extract_oracle import (
            _html_blocks_sql,
            _provably_simple_html_blocks_mask,
        )

        t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
        sub = t.filter(_provably_simple_html_blocks_mask(t.column("text")))
        rows = []
        for cid, ti, x in zip(
            sub.column("conv_id").to_pylist(),
            sub.column("turn_idx").to_pylist(),
            sub.column("text").to_pylist(),
        ):
            for b in extract_turn(x).blocks:
                rows.append((cid, ti, b.block_idx, b.kind, b.text))
        ray_df = (
            pd.DataFrame(rows, columns=["conv_id", "turn_idx", "block_idx", "kind", "text"])
            .sort_values(["conv_id", "turn_idx", "block_idx"])
            .reset_index(drop=True)
        )
        ora = (
            duckdb.sql(_html_blocks_sql(path))
            .df()
            .sort_values(["conv_id", "turn_idx", "block_idx"])
            .reset_index(drop=True)
        )
        return ray_df, ora

    def test_fixture_parity_and_kinds(self, transcripts_sf0001):
        ray_df, ora = self._side_by_side(transcripts_sf0001)
        assert len(ray_df) == len(ora) > 3000
        pd.testing.assert_frame_equal(ray_df, ora[ray_df.columns], check_dtype=False)
        kinds = set(ray_df["kind"])
        assert {"content", "heading", "boilerplate"} <= kinds

    def test_blocks_reconstruct_main_text(self, transcripts_sf0001):
        """Invariant: main_text == content+heading blocks joined in order
        (ties the blocks gate to the turns gate)."""
        ray_b, _ = self._side_by_side(transcripts_sf0001)
        ray_t, _ = _html_side_by_side(transcripts_sf0001)
        # blocks subset is a sub-filter of the turns subset
        keys = set(zip(ray_b.conv_id, ray_b.turn_idx))
        recon = (
            ray_b[ray_b.kind.isin(["content", "heading"])]
            .sort_values(["conv_id", "turn_idx", "block_idx"])
            .groupby(["conv_id", "turn_idx"])["text"]
            .apply(lambda s: "\n\n".join(s))
        )
        by_turn = ray_t.set_index(["conv_id", "turn_idx"])["main_text"]
        for k in list(keys)[:500]:
            assert by_turn[k] == recon.get(k, ""), k

    def test_planted_marker_stream(self, tmp_path):
        """Planted: nested boiler, heading inside boiler (boiler wins),
        repeated well-formed headings, and the heading-misnesting
        EXCLUSIONS agree on both sides."""
        plants = [
            # in-subset: kinds in document order
            "<h1>Head A</h1><p>body one</p>"
            "<nav><ul><li>menu menu</li></ul></nav>"
            "<h2>Head B</h2><p>body two</p>",
            # in-subset: heading inside boiler container -> boilerplate
            "<header><h1>hero title</h1></header><p>x</p><p>y</p>",
            # in-subset: repeated h2 pairs
            "<h2>a</h2><p>m</p><h2>b</h2><p>n</p>",
            # EXCLUDED: nested same-level heading
            "<h2>a<h2>b</h2></h2><p>x</p><p>y</p>",
            # EXCLUDED: stray heading close before open
            "</h2>x<h2>y</h2><p>a</p><p>b</p>",
            # EXCLUDED: unbalanced heading
            "<h2>a<p>b</p><p>c</p>",
            # EXCLUDED: literal control marker in payload
            "<p>a\x01b</p><p>c</p><p>d</p>",
        ]
        d = tmp_path / "plants"
        d.mkdir()
        pq.write_table(_plant_table(plants), str(d / "p.parquet"))
        ray_df, ora = self._side_by_side(str(d))
        assert set(ray_df.conv_id) == {"plant-0000", "plant-0001", "plant-0002"}
        pd.testing.assert_frame_equal(ray_df, ora[ray_df.columns], check_dtype=False)
        k0 = ray_df[ray_df.conv_id == "plant-0000"]["kind"].tolist()
        assert k0 == ["heading", "content", "boilerplate", "heading", "content"]
        k1 = ray_df[ray_df.conv_id == "plant-0001"]["kind"].tolist()
        assert k1 == ["boilerplate", "content", "content"]


class TestDataUriGate:
    """extract_datauri_turns: prefix strip + base64 decode + dispatch +
    html engine, mirrored with decode(from_base64(...)) in DuckDB."""

    def _side_by_side(self, path):
        import pyarrow.compute as pc

        from ocr_ray.core.extract import decode_data_uri
        from ocr_ray.pipelines.extract_oracle import (
            _DATAURI_PREFIX_RE,
            _DATAURI_STRICT_RE,
            _datauri_sql,
        )

        t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
        txt = t.column("text")
        cand = pc.and_(pc.is_valid(txt), pc.match_substring_regex(txt, _DATAURI_STRICT_RE))
        payload = pc.replace_substring_regex(txt, _DATAURI_PREFIX_RE, "")
        plen = pc.utf8_length(payload)
        cand = pc.and_(cand, pc.equal(pc.bit_wise_and(plen, 3), 0))
        cand = pc.and_(cand, pc.greater(plen, 0))
        sub = t.filter(cand)
        decoded = pa.array(
            [decode_data_uri(x)[0] for x in sub.column("text").to_pylist()],
            pa.string(),
        )
        sub = sub.filter(_provably_simple_html_mask(pa.chunked_array([decoded])))
        res = [extract_turn(x) for x in sub.column("text").to_pylist()]
        ray_df = (
            pd.DataFrame(
                {
                    "conv_id": sub.column("conv_id").to_pylist(),
                    "turn_idx": sub.column("turn_idx").to_pylist(),
                    "payload_kind": [r.payload_kind for r in res],
                    "main_text": [r.main_text for r in res],
                    "error": [r.error for r in res],
                }
            )
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        ora = (
            duckdb.sql(_datauri_sql(path))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        return ray_df, ora

    def test_fixture_parity(self, transcripts_sf0001):
        ray_df, ora = self._side_by_side(transcripts_sf0001)
        assert len(ray_df) > 10  # the 2% data-URI slice at sf0.001
        assert set(ray_df["payload_kind"]) == {"html"}
        _assert_frames_equal(ray_df, ora)

    def test_planted(self, tmp_path):
        import base64

        def uri(s):
            return "data:text/html;base64," + base64.b64encode(s.encode()).decode()

        plants = [
            uri("<html><body><p>hello from a data uri</p></body></html>"),  # in
            uri("<p>a</p><p>b</p><p>c</p>"),  # in
            uri("just plain text"),  # EXCLUDED: decoded not html-routed
            "data:text/html;base64,@@@@",  # EXCLUDED: invalid charset
            "data:text/html;base64,YWJj YWJj",  # EXCLUDED: space in payload
            "data:text/plain,not base64 at all",  # EXCLUDED: no ;base64
            uri("<p>x</p>")[:-2],  # EXCLUDED: truncated (length % 4 != 0)
        ]
        d = tmp_path / "uri_plants"
        d.mkdir()
        pq.write_table(_plant_table(plants), str(d / "p.parquet"))
        ray_df, ora = self._side_by_side(str(d))
        assert set(ray_df.conv_id) == {"plant-0000", "plant-0001"}
        _assert_frames_equal(ray_df, ora)
        assert ray_df.main_text.iloc[0] == "hello from a data uri"


class TestHtmlSummariesGate:
    def test_fixture_parity(self, transcripts_sf0001):
        """A5 summarizer over the html engine's main_text, vs the shared
        summarizer mirror composed with the html pipeline."""
        from ocr_ray.pipelines.extract_oracle import _html_summaries_sql
        from ocr_ray.stages.summarize import summarize_text

        t = pq.read_table(transcripts_sf0001, columns=["conv_id", "turn_idx", "text"])
        sub = t.filter(_provably_simple_html_mask(t.column("text")))
        ray_df = (
            pd.DataFrame(
                {
                    "conv_id": sub.column("conv_id").to_pylist(),
                    "turn_idx": sub.column("turn_idx").to_pylist(),
                    "summary": [
                        summarize_text(extract_turn(x).main_text)
                        for x in sub.column("text").to_pylist()
                    ],
                }
            )
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        ora = (
            duckdb.sql(_html_summaries_sql(transcripts_sf0001))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(ray_df) > 300
        _assert_frames_equal(ray_df, ora)


class TestPdfSummariesGate:
    def test_fixture_parity(self, transcripts_sf0001):
        """A5 summarizer over the pdf engine's main_text (third engine
        under the shared summarizer mirror)."""
        from ocr_ray.pipelines.extract_oracle import (
            _pdf_summaries_sql,
            _provably_simple_pdf_static_mask,
        )
        from ocr_ray.stages.summarize import summarize_text

        t = pq.read_table(transcripts_sf0001, columns=["conv_id", "turn_idx", "text"])
        sub = t.filter(_provably_simple_pdf_static_mask(t.column("text")))
        rows = []
        for cid, ti, x in zip(
            sub.column("conv_id").to_pylist(),
            sub.column("turn_idx").to_pylist(),
            sub.column("text").to_pylist(),
        ):
            r = extract_turn(x)
            if r.payload_kind == "pdf":
                rows.append((cid, ti, summarize_text(r.main_text)))
        ray_df = (
            pd.DataFrame(rows, columns=["conv_id", "turn_idx", "summary"])
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        ora = (
            duckdb.sql(_pdf_summaries_sql(transcripts_sf0001))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(ray_df) > 200
        _assert_frames_equal(ray_df, ora)


class TestCleanCorpusHtml:
    def test_parity_sf0001(self, ray_session, transcripts_sf0001):
        """Composed clean_corpus over the html subset vs the one-query SQL
        mirror (html main pipeline + gate + lang-ID + tokens + dedup)."""
        from ocr_ray.pipelines.extract_oracle import (
            _clean_corpus_html_sql,
            clean_corpus_html,
        )

        got = (
            clean_corpus_html("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(_clean_corpus_html_sql(transcripts_sf0001))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(got) > 300
        pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


class TestHtmlDialoguePairs:
    def test_parity_sf0001(self, ray_session, transcripts_sf0001):
        from ocr_ray.pipelines.extract_oracle import (
            _html_dialogue_pairs_sql,
            html_dialogue_pairs,
        )

        keys = ["conv_id", "turn_idx"]
        got = (
            html_dialogue_pairs("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(_html_dialogue_pairs_sql(transcripts_sf0001))
            .df()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        assert len(got) > 300
        pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


class TestMetricsGated:
    def test_parity_sf0001(self, ray_session, transcripts_sf0001):
        """The lineage-metrics rollup (rows/bytes/blocks/errors per kind)
        over the union of the engine subsets, cell-for-cell vs SQL."""
        from ocr_ray.pipelines.extract_oracle import (
            _metrics_gated_sql,
            extract_metrics_gated,
        )

        got = extract_metrics_gated("/root/testdata/sf0.001").to_pandas()
        want = duckdb.sql(_metrics_gated_sql(transcripts_sf0001)).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        assert set(g.payload_kind) == {"plain", "html", "pdf"}
        assert int(g[g.payload_kind == "plain"].n_errors.iloc[0]) > 0  # empty_input rule
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


class TestFullCorpusGates:
    """The flagship ops gated BY NAME (VERDICT r3 #1/#7): the union of the
    four engine mirrors must cover EVERY row and match the production
    pipeline value-for-value."""

    def test_hyphen_lowercase_class_agreement(self):
        """Every char in the allowed hyphen-continuation class must agree
        between Python str.islower() and RE2 \\p{Ll} in BOTH engines
        (pyarrow and DuckDB) — the provability contract of the widened
        pdf subset."""
        import pyarrow.compute as pc

        ranges = [
            (0x20, 0x7E), (0xC0, 0x24F), (0x300, 0x344), (0x346, 0x36F),
            (0x370, 0x379), (0x37B, 0x3FF), (0x400, 0x4FF),
            (0x3040, 0x30FF), (0x4E00, 0x9FFF),
        ]
        chars = [chr(cp) for lo, hi in ranges for cp in range(lo, hi + 1)]
        arr = pa.array(chars)
        m = pc.match_substring_regex(arr, r"^\p{Ll}").to_pylist()
        assert all(x == c.islower() for c, x in zip(chars, m))
        con = duckdb.connect()
        con.executemany(
            "INSERT INTO t VALUES (?)",
            [(c,) for c in chars],
        ) if con.execute("CREATE TABLE t(c VARCHAR)") else None
        rows = con.execute(r"SELECT c, regexp_matches(c, '^\p{Ll}')"
                           " FROM t").fetchall()
        assert all(bool(x) == c.islower() for c, x in rows)

    def test_pdf_unicode_hyphen_merge(self, ray_session, transcripts_sf0001):
        """Rows whose hyphen continuation starts with a non-ASCII lowercase
        letter (the class the r3 mask excluded) now sit INSIDE the pdf
        subset and mirror exactly — including NFD payloads that compose
        to the letter only after NFC."""
        from ocr_ray.pipelines.extract_oracle import (
            _provably_simple_pdf_static_mask,
        )

        doc = (
            "REPORT 0042\n\n    Quick claims about the coö-\n"
            "    pérate token café work done here\n\n1 / 1"
        )
        nfd = (
            "REPORT 0042\n\n    Quick claims about the co-\n"
            "    öperate token done here again\n\n1 / 1"
        )
        upper = (
            "REPORT 0042\n\n    Quick claims about the co-\n"
            "    ÖPERATE token done here again\n\n1 / 1"
        )
        t = pa.table({"conv_id": ["a", "b", "c"],
                      "turn_idx": pa.array([0, 1, 2], pa.int32()),
                      "text": ["\f" + doc, "\f" + nfd, "\f" + upper]})
        assert _provably_simple_pdf_static_mask(t.column("text")).to_pylist() == [
            True, True, True,
        ]
        import os
        import tempfile

        d = tempfile.mkdtemp()
        pq.write_table(t, os.path.join(d, "part-0.parquet"))
        got = (
            _run_pdf_kernel(t, explode_blocks=False)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(_pdf_sql(d))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
        # the merge actually happened (lowercase continuation folds the '-')
        assert "coöpérate" in got.main_text[0]
        # uppercase continuation keeps the hyphen, space-joined
        assert "co- ÖPERATE" in got.main_text[2]

    def test_flagship_by_name_sf0001(self, ray_session, transcripts_sf0001):
        """extract_turns / extract_blocks / extract_summaries /
        dialogue_pairs full-corpus parity at sf0.001 — rows, columns and
        values (the driver's comparison, minus the hash)."""
        import __ray_entry__ as entry
        from ocr_ray.pipelines.extract_oracle import (
            _blocks_full_sql,
            _dialogue_pairs_full_sql,
            _summaries_full_sql,
            _turns_full_sql,
        )

        qs = entry.queries()
        for name, sql_fn in [
            ("extract_turns", _turns_full_sql),
            ("extract_blocks", _blocks_full_sql),
            ("extract_summaries", _summaries_full_sql),
            ("dialogue_pairs", _dialogue_pairs_full_sql),
        ]:
            got = qs[name]("/root/testdata/sf0.001")
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            want = duckdb.sql(sql_fn(transcripts_sf0001)).df()
            cols = sorted(want.columns)
            assert sorted(got.columns) == cols, name
            g = got[cols].sort_values(cols).reset_index(drop=True)
            w = want[cols].sort_values(cols).reset_index(drop=True)
            assert len(g) == len(w), name
            assert g.astype(str).values.tolist() == w.astype(str).values.tolist(), name


class TestRandomizedHostilePlants:
    """Randomized adversarial payload sweep over the SUBSET gates: the
    provability masks must agree with their SQL filters on INCLUSION and
    every included row must match value-for-value. 400 random documents
    mixing the known divergence surfaces — exotic unicode whitespace,
    \\r\\n, non-ASCII digits, hyphen continuations in/out of the allowed
    class, data-URIs (valid / broken base64 / non-base64), nested and
    unterminated markup, entities, 19+-digit numbers, NULLs."""

    @pytest.fixture(scope="class")
    def hostile_dir(self, tmp_path_factory):
        import base64
        import random

        rng = random.Random(20260822)
        words = ["alpha", "beta", "café", "déjà", "étude", "naïve", "word",
                 "the", "and", "of", "x", "123456789012345678901", "ÖPQ"]
        ws = [" ", "\t", "\n", "\xa0", " ", " ", "\r\n", "\x0b",
              "\f", "　"]
        tags = ["<p>", "</p>", "<a>", "</a>", "<nav>", "</nav>", "<h1>",
                "</h1>", "<div>", "</div>", "<!--c-->", "<!--",
                "<script>s</script>", "&amp;", "&lt;", "&#233;"]

        def payload() -> str | None:
            r = rng.random()
            if r < 0.04:
                return None
            if r < 0.08:
                return rng.choice(["", " ", "\xa0 ", "\r\n", "\f\f"])
            if r < 0.18:  # data-URI family: valid, broken b64, non-b64
                inner = " ".join(rng.choice(words) for _ in range(rng.randint(2, 30)))
                kind = rng.random()
                if kind < 0.5:
                    b = base64.b64encode(inner.encode()).decode()
                    return f"data:text/plain;base64,{b}"
                if kind < 0.75:
                    return "data:text/plain;base64,!!notb64!!"
                return f"data:text/plain,{inner}"
            if r < 0.45:  # markup soup
                n = rng.randint(3, 30)
                return "".join(
                    rng.choice(tags) if rng.random() < 0.5 else
                    rng.choice(words) + rng.choice(ws)
                    for _ in range(n)
                )
            if r < 0.75:  # pdf-ish: indented lines, hyphens, pagenums, \f
                lines = []
                for _ in range(rng.randint(3, 12)):
                    indent = rng.choice(["", "  ", "    ", "\t\t"])
                    body = " ".join(rng.choice(words) for _ in range(rng.randint(1, 6)))
                    if rng.random() < 0.3:
                        body += "-"
                    lines.append(indent + body)
                    if rng.random() < 0.3:
                        lines.append("")
                if rng.random() < 0.3:
                    lines.append(f"{rng.randint(1, 9)} / {rng.randint(1, 9)}")
                doc = "\n".join(lines)
                if rng.random() < 0.5:
                    doc += "\f" + doc
                return doc
            # plain with exotic separators
            paras = [
                " ".join(rng.choice(words) for _ in range(rng.randint(2, 12)))
                for _ in range(rng.randint(1, 4))
            ]
            return rng.choice(["\n\n", "\n \n", "\n\xa0\n", "\n\t\n"]).join(paras)

        rows = [payload() for _ in range(400)]
        t = pa.table(
            {
                "conv_id": pa.array([f"hz-{i:04d}" for i in range(len(rows))]),
                "turn_idx": pa.array([0] * len(rows), pa.int32()),
                "role": pa.array(["user"] * len(rows)),
                "text": pa.array(rows, pa.string()),
                "tool": pa.array([""] * len(rows)),
                "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            }
        )
        d = tmp_path_factory.mktemp("hostile_transcripts")
        pq.write_table(t, str(d / "part-0.parquet"))
        return str(d)

    def test_html_gate_parity(self, hostile_dir):
        ray_df, ora_df = _html_side_by_side(hostile_dir)
        _assert_frames_equal(ray_df, ora_df)

    def test_pdf_gate_parity(self, hostile_dir):
        for blocks in (False, True):
            ray_df, ora_df = _pdf_side_by_side(hostile_dir, blocks)
            _assert_frames_equal(ray_df, ora_df)

    def test_plain_and_spans_parity(self, hostile_dir):
        from ocr_ray.pipelines.extract_oracle import (
            _plain_sql,
            _plain_spans_sql,
            _plain_spans_table,
            _provably_plain_mask,
        )

        t = pq.read_table(hostile_dir, columns=["conv_id", "turn_idx", "text"])
        sub = t.filter(_provably_plain_mask(t.column("text")))
        res = [extract_turn(x) for x in sub.column("text").to_pylist()]
        ray_df = (
            pa.table(
                {
                    "conv_id": sub.column("conv_id"),
                    "turn_idx": sub.column("turn_idx"),
                    "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                    "main_text": pa.array([r.main_text for r in res], pa.string()),
                    "error": pa.array([r.error for r in res], pa.string()),
                }
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        ora_df = (
            duckdb.sql(_plain_sql(hostile_dir))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        _assert_frames_equal(ray_df, ora_df)
        keys = ["conv_id", "turn_idx", "block_idx"]
        got = (
            _plain_spans_table(t).to_pandas().sort_values(keys).reset_index(drop=True)
        )
        want = (
            duckdb.sql(_plain_spans_sql(hostile_dir))
            .df()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        _assert_frames_equal(got, want)

    def test_datauri_gate_parity(self, hostile_dir):
        from ocr_ray.pipelines.extract_oracle import (
            _datauri_sql,
            extract_datauri_turns,
        )

        # the query fn is fixture-bound; replicate its batch body here
        import ray  # noqa: F401  (session provided by conftest when needed)

        t = pq.read_table(hostile_dir, columns=["conv_id", "turn_idx", "text"])
        from ocr_ray.pipelines.extract_oracle import (
            _DATAURI_PREFIX_RE,
            _DATAURI_STRICT_RE,
            _provably_simple_html_mask,
        )
        import pyarrow.compute as pc

        from ocr_ray.core.extract import decode_data_uri

        txt = t.column("text")
        cand = pc.is_valid(txt)
        cand = pc.and_(cand, pc.match_substring_regex(txt, _DATAURI_STRICT_RE))
        payload = pc.replace_substring_regex(txt, _DATAURI_PREFIX_RE, "")
        plen = pc.utf8_length(payload)
        cand = pc.and_(cand, pc.equal(pc.bit_wise_and(plen, 3), 0))
        cand = pc.and_(cand, pc.greater(plen, 0))
        sub = t.filter(cand)
        decoded = pa.array(
            [decode_data_uri(x)[0] for x in sub.column("text").to_pylist()],
            pa.string(),
        )
        sub = sub.filter(_provably_simple_html_mask(pa.chunked_array([decoded])))
        res = [extract_turn(x) for x in sub.column("text").to_pylist()]
        ray_df = (
            pa.table(
                {
                    "conv_id": sub.column("conv_id"),
                    "turn_idx": sub.column("turn_idx"),
                    "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                    "main_text": pa.array([r.main_text for r in res], pa.string()),
                    "error": pa.array([r.error for r in res], pa.string()),
                }
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        ora_df = (
            duckdb.sql(_datauri_sql(hostile_dir))
            .df()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        _assert_frames_equal(ray_df, ora_df)
