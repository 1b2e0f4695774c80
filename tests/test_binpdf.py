"""Binary-PDF engine tests (r5): tokenizer unit coverage for the operator
vocabulary the gated fixture does NOT exercise (TJ kerning, ', ", Tm, hex
strings, the full escape table), error-path totality, the writer round
trip, and the randomized kernel-vs-reconstruction parity fuzz that seals
what the RE2 mask cannot prove (page-tree order vs file order)."""

import base64
import random

import pytest

from ocr_ray.core.pdfbin import (
    _interp_stream,
    _parse_literal_string,
    extract_binpdf,
    parse_pdf_text,
)
from ocr_ray.sources.pdfgen import build_pdf


class TestLiteralStrings:
    def test_escape_table(self):
        s, i = _parse_literal_string(rb"(a\(b\)c \\ \101 \n end)", 0)
        assert s == "a(b)c \\ A \n end"

    def test_octal_lengths(self):
        assert _parse_literal_string(rb"(\53)", 0)[0] == "+"
        assert _parse_literal_string(rb"(\053)", 0)[0] == "+"
        assert _parse_literal_string(rb"(\0533)", 0)[0] == "+3"

    def test_line_continuation_and_raw_eol(self):
        assert _parse_literal_string(b"(con\\\ntinued)", 0)[0] == "continued"
        assert _parse_literal_string(b"(con\\\r\ntinued)", 0)[0] == "continued"
        assert _parse_literal_string(b"(a\r\nb)", 0)[0] == "a\nb"
        assert _parse_literal_string(b"(a\rb)", 0)[0] == "a\nb"

    def test_nested_parens(self):
        s, i = _parse_literal_string(b"(outer (inner) tail) rest", 0)
        assert s == "outer (inner) tail"
        assert i == len(b"(outer (inner) tail)")

    def test_unknown_escape_stands_for_itself(self):
        assert _parse_literal_string(rb"(\q)", 0)[0] == "q"


class TestInterp:
    def test_tj_kerning_threshold(self):
        s = b"BT\n72 720 Td\n[(a) -179 (b) -180 (c)] TJ\nET"
        assert _interp_stream(s) == ["ab c"]

    def test_quote_operators_and_tm(self):
        s = (
            b"BT\n1 0 0 1 72 700 Tm\n(first) Tj\n"
            b"1 0 0 1 72 686 Tm\n(second) Tj\n"
            b"(third) '\n(aw) (ac) (fourth) \"\nET"
        )
        # Tm with changed y breaks the line; ' and " break before showing
        assert _interp_stream(s) == ["first", "second", "third", "fourth"]

    def test_hex_string_and_dict_noise(self):
        s = b"BT\n<< /Noise true >>\n72 720 Td\n<48656C6C 6F> Tj\nET"
        assert _interp_stream(s) == ["Hello"]

    def test_zero_ty_td_keeps_line(self):
        s = b"BT\n72 720 Td\n(a) Tj\n5 0 Td\n( b) Tj\nET"
        assert _interp_stream(s) == ["a b"]

    def test_graphics_ops_are_operand_sinks(self):
        s = b"q\n1 0 0 1 10 10 cm\nBT\n72 720 Td\n(x) Tj\nET\nQ"
        assert _interp_stream(s) == ["x"]


class TestParseErrors:
    def test_not_pdf(self):
        assert parse_pdf_text(b"hello") == ("", "pdf_parse_error:not_pdf")

    def test_no_objects(self):
        assert parse_pdf_text(b"%PDF-1.4\njunk") == ("", "pdf_parse_error:no_objects")

    def test_filtered_stream(self):
        raw = (
            b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 4 /Filter /FlateDecode >>\nstream\nabcd\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        assert parse_pdf_text(raw) == ("", "pdf_parse_error:filter")

    def test_totality_on_garbage(self):
        for junk in (b"%PDF-1.4\n1 0 obj\nstream\n", b"%PDF-", b"%PDF-1.4\n\x00\xff"):
            text, err = parse_pdf_text(junk)
            assert text == "" and err.startswith("pdf_parse_error")

    def test_extract_binpdf_total(self):
        r = extract_binpdf(b"not a pdf at all")
        assert (r.payload_kind, r.main_text, r.error) == (
            "binpdf",
            "",
            "pdf_parse_error:not_pdf",
        )


class TestObjectGraph:
    def test_nested_page_tree_order(self):
        # Pages -> [inner tree, page C]; inner -> [A, B]: reading order A,B,C
        def page(num, cont, parent):
            return (
                f"{num} 0 obj\n<< /Type /Page /Parent {parent} 0 R /Contents "
                f"{cont} 0 R >>\nendobj\n"
            )

        def stream(num, text):
            data = f"BT\n72 720 Td\n({text}) Tj\nET"
            return (
                f"{num} 0 obj\n<< /Length {len(data)} >>\nstream\n{data}\nendstream\nendobj\n"
            )

        doc = (
            "%PDF-1.4\n"
            "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            "2 0 obj\n<< /Type /Pages /Kids [10 0 R 5 0 R] /Count 3 >>\nendobj\n"
            "10 0 obj\n<< /Type /Pages /Kids [3 0 R 7 0 R] /Count 2 >>\nendobj\n"
            + page(3, 4, 10)
            + stream(4, "page A")
            + page(7, 8, 10)
            + stream(8, "page B")
            + page(5, 6, 2)
            + stream(6, "page C")
            + "trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        ).encode()
        text, err = parse_pdf_text(doc)
        assert err == ""
        assert text == "page A\fpage B\fpage C"

    def test_contents_array(self):
        doc = (
            "%PDF-1.4\n"
            "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
            "4 0 obj\n<< /Length 22 >>\nstream\nBT\n72 720 Td\n(a) Tj\nET\nendstream\nendobj\n"
            "5 0 obj\n<< /Length 22 >>\nstream\nBT\n72 700 Td\n(b) Tj\nET\nendstream\nendobj\n"
            "trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        ).encode()
        text, err = parse_pdf_text(doc)
        assert err == ""
        assert text == "a\n\nb"

    def test_length_shields_keywords_in_stream(self):
        # /Length-sliced stream data may contain 'endstream'/'endobj' text
        data = b"BT\n72 720 Td\n(endstream endobj inside) Tj\nET"
        obj4 = b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
            len(data),
            data,
        )
        doc = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            + obj4
            + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        text, err = parse_pdf_text(doc)
        assert err == ""
        assert text == "endstream endobj inside"


class TestWriterRoundTrip:
    def test_layout_classification(self):
        pages = [
            [["REPORT 0042"], ["alpha beta gamma", "delta line"], ["1 / 2"]],
            [["REPORT 0042"], ["second page text"], ["2 / 2"]],
        ]
        r = extract_binpdf(build_pdf(pages))
        assert r.error == ""
        kinds = [b.kind for b in r.blocks]
        assert kinds == ["header", "para", "pagenum", "header", "para", "pagenum"]
        assert r.main_text == "alpha beta gamma delta line\n\nsecond page text"

    def test_escaped_content_still_extracts(self):
        # parens/backslash force writer escapes -> row leaves the strict
        # mask but the KERNEL must still extract it exactly
        pages = [[["w(x) \\ y"]]]
        r = extract_binpdf(build_pdf(pages))
        assert r.error == ""
        assert r.blocks[0].text == "w(x) \\ y"
        from ocr_ray.pipelines.binpdf_gate import _mask_body

        assert not _mask_body(build_pdf(pages).decode("ascii"))

    def test_xref_offsets_are_exact(self):
        raw = build_pdf([[["hello world"]]])
        lines = raw.decode("ascii").splitlines()
        xref_at = raw.index(b"xref\n")
        startxref = int(lines[lines.index("startxref") + 1])
        assert startxref == xref_at
        # every in-use offset points at "N 0 obj"
        entries = []
        xi = lines.index("xref")
        n_entries = int(lines[xi + 1].split()[1])
        for k in range(1, n_entries):
            off = int(lines[xi + 2 + k].split()[0])
            import re as _re

            assert _re.match(rb"\d+ 0 obj\n", raw[off : off + 20]), k
        assert raw.endswith(b"%%EOF\n")


class TestGateParityFuzz:
    def test_kernel_equals_reconstruction_on_mask_domain(self):
        """2k random writer outputs: the general tokenizer and the regex
        reconstruction (the SQL oracle's plan) must agree byte-for-byte;
        every output must pass the mask."""
        from ocr_ray.pipelines.binpdf_gate import _mask_body, _reconstruct

        rng = random.Random(77)
        words = "alpha beta gamma delta stream endstream obj BT ET Tj report page".split()
        for trial in range(2000):
            pages = []
            for _ in range(rng.randint(1, 4)):
                groups = []
                for _ in range(rng.randint(1, 5)):
                    lines = [
                        " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
                        + ("-" if rng.random() < 0.2 else "")
                        for _ in range(rng.randint(1, 4))
                    ]
                    groups.append(lines)
                pages.append(groups)
            raw = build_pdf(pages)
            body = raw.decode("ascii")
            assert _mask_body(body), trial
            text, err = parse_pdf_text(raw)
            assert err == "", (trial, err)
            assert text == _reconstruct(body), trial

    def test_fixture_gate_counts_are_stable(self):
        from ocr_ray.pipelines.binpdf_gate import _run_binpdf_kernel
        from ocr_ray.sources.binpdf_transcripts import binpdf_batch_table

        t = binpdf_batch_table(range(50))
        res = _run_binpdf_kernel(t, explode_blocks=False)
        assert res.num_rows > 0
        assert set(res.column("payload_kind").to_pylist()) == {"binpdf"}
        assert set(res.column("error").to_pylist()) == {""}


class TestDispatch:
    def test_classify_binpdf(self):
        from ocr_ray.core.extract import classify_payload, extract_turn

        assert classify_payload("%PDF-1.4\nstuff") == "binpdf"
        raw = build_pdf([[["dispatch works"]]])
        uri = "data:application/pdf;base64," + base64.b64encode(raw).decode()
        r = extract_turn(uri)
        assert r.payload_kind == "binpdf" and r.main_text == "dispatch works"
        r2 = extract_turn(raw.decode("ascii"))
        assert r2.payload_kind == "binpdf" and r2.main_text == "dispatch works"

    def test_binpdf_spans_empty(self):
        from ocr_ray.stages.spans import spans_for_turn

        raw = build_pdf([[["no spans here"]]])
        kind, rows = spans_for_turn(raw.decode("ascii"))
        assert kind == "binpdf" and rows == []

    def test_non_pdf_datauri_unchanged(self):
        from ocr_ray.core.extract import extract_turn

        inner = "<html><body><p>hello world from html paragraph text</p></body></html>"
        uri = "data:text/html;base64," + base64.b64encode(inner.encode()).decode()
        r = extract_turn(uri)
        assert r.payload_kind == "html"

    def test_bad_base64_pdf_is_decode_error(self):
        from ocr_ray.core.extract import extract_turn

        r = extract_turn("data:application/pdf;base64,!!!!")
        assert r.error == "decode_error"

class TestFlateDecode:
    """r5: /Filter /FlateDecode inflates via stdlib zlib — the common
    real-world PDF shape; other filters stay at the documented boundary."""

    def test_flate_roundtrip_matches_uncompressed(self):
        pages = [
            [["REPORT 0099"], ["alpha beta gamma", "delta epsilon"], ["1 / 2"]],
            [["REPORT 0099"], ["second page words here"], ["2 / 2"]],
        ]
        plain = parse_pdf_text(build_pdf(pages))
        flate = parse_pdf_text(build_pdf(pages, compress=True))
        assert plain == flate and plain[1] == ""
        raw = build_pdf(pages, compress=True)
        assert b"/FlateDecode" in raw
        r = extract_binpdf(raw)
        assert r.error == "" and "alpha beta gamma delta epsilon" in r.main_text

    def test_corrupt_flate_is_filter_error(self):
        raw = build_pdf([[["x"]]], compress=True)
        # damage the deflate payload (keep lengths: swap bytes inside)
        i = raw.index(b"stream\n") + len(b"stream\n")
        bad = raw[:i] + bytes([raw[i] ^ 0xFF]) + raw[i + 1 :]
        assert parse_pdf_text(bad) == ("", "pdf_parse_error:filter")

    def test_other_filters_stay_boundary(self):
        raw = build_pdf([[["x"]]], compress=True)
        lzw = raw.replace(b"/FlateDecode", b"/LZWDecode  ")
        assert parse_pdf_text(lzw) == ("", "pdf_parse_error:filter")

    def test_predictor_rejected(self):
        raw = build_pdf([[["x"]]], compress=True)
        pred = raw.replace(
            b"/Filter /FlateDecode", b"/Predictor 12 /Filter /FlateDecode"
        )
        assert parse_pdf_text(pred) == ("", "pdf_parse_error:filter")

    def test_datauri_flate_dispatch(self):
        import base64 as _b64

        from ocr_ray.core.extract import extract_turn

        raw = build_pdf([[["compressed dispatch works fine"]]], compress=True)
        uri = "data:application/pdf;base64," + _b64.b64encode(raw).decode()
        r = extract_turn(uri)
        assert r.payload_kind == "binpdf"
        assert r.main_text == "compressed dispatch works fine"

class TestObjectStreams:
    """r5: PDF 1.5+ compressed object streams (/Type /ObjStm) — page and
    catalog dictionaries packed inside a Flate stream, the modern writer
    layout — resolve through the inflate path into the object map."""

    @staticmethod
    def _objstm_doc(first_extra=b""):
        import zlib as _z

        inner = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        ]
        bodies = b""
        pairs = []
        for num, body in inner:
            pairs.append((num, len(bodies)))
            bodies += body + b"\n"
        header = b" ".join(b"%d %d" % p for p in pairs) + b"\n"
        comp = _z.compress(header + bodies)
        content = b"BT\n72 720 Td\n(objstm works) Tj\nET"
        objstm = (
            b"5 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
            % (len(header), len(comp), comp)
        )
        cont = b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n" % (
            len(content),
            content,
        )
        return (
            b"%PDF-1.5\n" + objstm + cont + b"trailer\n<< /Root 1 0 R >>\n" + b"%%EOF\n"
        )

    def test_page_tree_inside_objstm(self):
        text, err = parse_pdf_text(self._objstm_doc())
        assert (text, err) == ("objstm works", "")

    def test_corrupt_objstm_falls_back_to_file_order(self):
        doc = bytearray(self._objstm_doc())
        # damage the compressed payload: ObjStm skipped, graph walk fails
        # (no catalog), file-order fallback still finds the content stream
        i = doc.index(b"stream\n") + len(b"stream\n")
        doc[i] ^= 0xFF
        text, err = parse_pdf_text(bytes(doc))
        assert err == "" and text == "objstm works"

    def test_toplevel_definition_wins(self):
        # a top-level object 3 overrides the ObjStm copy (first wins)
        doc = self._objstm_doc()
        override = (
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        )
        patched = doc.replace(b"%PDF-1.5\n", b"%PDF-1.5\n" + override, 1)
        text, err = parse_pdf_text(patched)
        assert (text, err) == ("objstm works", "")

