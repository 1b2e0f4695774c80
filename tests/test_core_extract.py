"""Unit tests for the deterministic extraction core (SURVEY.md §5)."""

from ocr_ray.core.extract import classify_payload, decode_data_uri, extract_turn


class TestClassifier:
    def test_empty_is_plain(self):
        assert classify_payload("") == "plain"
        assert classify_payload("   \n\t ") == "plain"

    def test_html(self):
        assert classify_payload("<html><body><p>x</p></body></html>") == "html"

    def test_two_tags_not_html(self):
        assert classify_payload("a <b>bold</b> word") == "plain"

    def test_formfeed_is_pdf(self):
        assert classify_payload("page one\fpage two") == "pdf"

    def test_indented_columns_are_pdf(self):
        text = "\n".join(["    line one here", "    line two here",
                          "    line three here", "    line four here"])
        assert classify_payload(text) == "pdf"

    def test_prose_is_plain(self):
        assert classify_payload("Just a normal sentence.\nAnd another one.") == "plain"


class TestDataUri:
    def test_passthrough(self):
        assert decode_data_uri("hello") == ("hello", "")

    def test_base64_roundtrip(self):
        import base64

        payload = base64.b64encode("bonjour".encode()).decode()
        assert decode_data_uri(f"data:text/plain;base64,{payload}") == ("bonjour", "")

    def test_bad_base64(self):
        assert decode_data_uri("data:text/plain;base64,!!!") == ("", "decode_error")

    def test_plain_data_uri(self):
        assert decode_data_uri("data:,hi there") == ("hi there", "")


class TestTotality:
    """Output is total on every failure path (extract-data-from-pdf.ts:87-91)."""

    def test_empty(self):
        r = extract_turn("")
        assert (r.main_text, r.blocks, r.error) == ("", (), "empty_input")

    def test_whitespace(self):
        r = extract_turn(" \n\t ")
        assert r.error == "empty_input" and r.main_text == ""

    def test_none(self):
        r = extract_turn(None)
        assert r.error == "empty_input"

    def test_non_string(self):
        r = extract_turn(42)
        assert r.error == "type_error" and r.main_text == ""

    def test_decode_error(self):
        r = extract_turn("data:text/html;base64,@@@")
        assert r.error == "decode_error" and r.blocks == ()


class TestHtmlEngine:
    def test_boilerplate_stripped(self):
        html = (
            "<html><body>"
            '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>'
            "<main><p>The actual article content sits here with enough length to count.</p></main>"
            '<footer><a href="/c">contact</a></footer>'
            "</body></html>"
        )
        r = extract_turn(html)
        assert r.payload_kind == "html"
        assert r.main_text == "The actual article content sits here with enough length to count."
        kinds = [b.kind for b in r.blocks]
        assert "boilerplate" in kinds and "content" in kinds

    def test_heading_kept(self):
        r = extract_turn("<html><body><h1>Big Title</h1><p>Body text of the page, long enough to be content.</p></body></html>")
        assert r.main_text.startswith("Big Title\n\n")
        assert r.blocks[0].kind == "heading"

    def test_entities_unescaped(self):
        r = extract_turn("<html><body><p>fish &amp; chips &lt;now&gt; with &#233;clat served daily here</p></body></html>")
        assert "fish & chips <now>" in r.main_text and "éclat" in r.main_text

    def test_link_density_boilerplate(self):
        html = (
            "<html><body><div>"
            '<a href="1">one two three</a> <a href="2">four five six</a> x'
            "</div><p>Real content paragraph with a good amount of plain text in it.</p></body></html>"
        )
        r = extract_turn(html)
        assert r.blocks[0].kind == "boilerplate"
        assert "Real content paragraph" in r.main_text

    def test_script_style_removed(self):
        r = extract_turn("<html><body><script>var x = 'nope';</script><style>p{}</style><p>Visible body text long enough to be a content block.</p></body></html>")
        assert "nope" not in r.main_text and "Visible body text" in r.main_text

    def test_title_dropped(self):
        r = extract_turn("<html><head><title>Tab Title</title></head><body><p>Page body content with sufficient length for a block.</p></body></html>")
        assert "Tab Title" not in r.main_text

    def test_broken_markup_tolerated(self):
        r = extract_turn("<html><body><p>Unclosed paragraph with enough text to be considered real content<div>another piece of long enough content text here</body>")
        assert r.error == "" and "Unclosed paragraph" in r.main_text

    def test_whitespace_canonical(self):
        r = extract_turn("<html><body><p>spaced    out\n\n   text   in a paragraph long enough to count</p></body></html>")
        assert "spaced out text in a paragraph" in r.main_text


class TestPdfEngine:
    def test_pages_headers_footers(self):
        pdf = (
            "ACME QUARTERLY\n\n    Body paragraph one with text.\n\n1 / 2"
            "\fACME QUARTERLY\n\n    Body paragraph two with text.\n\n2 / 2"
        )
        r = extract_turn(pdf)
        assert r.payload_kind == "pdf"
        assert r.main_text == "Body paragraph one with text.\n\nBody paragraph two with text."
        kinds = [b.kind for b in r.blocks]
        assert kinds.count("header") == 2 and kinds.count("pagenum") == 2

    def test_dehyphenation(self):
        pdf = "    This is an exam-\n    ple of hyphen-\n    ated wrapping.\fsecond page"
        r = extract_turn(pdf)
        assert "example of hyphenated wrapping." in r.main_text

    def test_hyphen_before_uppercase_kept(self):
        pdf = "    The well-\n    Known name.\fp2"
        r = extract_turn(pdf)
        assert "well- Known" in r.main_text

    def test_reading_order(self):
        pdf = "    alpha block\n\n    beta block\f    gamma block"
        r = extract_turn(pdf)
        assert r.main_text == "alpha block\n\nbeta block\n\ngamma block"


class TestPlainEngine:
    def test_paragraph_split_and_collapse(self):
        r = extract_turn("first  paragraph\nsame para\n\nsecond   paragraph")
        assert r.main_text == "first paragraph same para\n\nsecond paragraph"
        assert [b.block_idx for b in r.blocks] == [0, 1]
        assert r.blocks[0].kind == "para"

    def test_nfc_normalization(self):
        nfd = "séance"  # e + combining acute
        r = extract_turn(f"the {nfd} begins")
        assert "séance" in r.main_text

    def test_n_blocks_matches(self):
        r = extract_turn("a\n\nb\n\nc")
        assert len(r.blocks) == 3
