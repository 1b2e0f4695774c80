"""Canonical typed-record derivation (stages/records.py) — vectorized vs
per-row reference, M4 default paths, and oracle parity for the gated entry.

The record is the analog of the reference's zod-enforced output schema with
canonical defaults on every miss (pdf-data-schema.ts via
extract-data-from-pdf.ts:43,:87-91).
"""

import re

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.core.extract import extract_turn
from ocr_ray.stages.extract import ExtractKernel
from ocr_ray.stages.records import RECORD_SCHEMA, records_from_extracted


@pytest.fixture(scope="module")
def transcripts_sf0001():
    from ocr_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(200, seed=42)


def _reference_record(text: str):
    """Straight-line per-row derivation (the spec the vectorized path must
    reproduce)."""
    r = extract_turn(text)
    heads = [b.text for b in r.blocks if b.kind in ("heading", "header")]
    title = heads[0] if heads else ""
    m = re.search(r"[0-9]+", title)
    return {
        "payload_kind": r.payload_kind,
        "title": title,
        "doc_no": int(m.group()) if m else 0,
        "n_items": sum(1 for b in r.blocks if b.kind in ("content", "para")),
        "n_headings": len(heads),
        "n_words": len(r.main_text.split()),
        "error": r.error,
    }


class TestRecordsVectorized:
    def test_fixture_parity(self, transcripts_sf0001):
        t = pq.read_table(
            transcripts_sf0001, columns=["conv_id", "turn_idx", "role", "text"]
        )
        rec = records_from_extracted(ExtractKernel()(t))
        assert rec.schema == RECORD_SCHEMA
        assert rec.num_rows == t.num_rows  # totality: one record per turn
        texts = t.column("text").to_pylist()
        rows = rec.to_pylist()
        for i, (x, row) in enumerate(zip(texts, rows)):
            want = _reference_record(x)
            got = {k: row[k] for k in want}
            assert got == want, (i, got, want)

    def test_default_record_paths(self):
        """M4: failure/empty paths produce the canonical all-default record."""
        t = pa.table(
            {
                "conv_id": ["c"] * 4,
                "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
                "role": ["user"] * 4,
                "text": [
                    "",  # empty -> error row, all defaults
                    "   \n\t ",  # whitespace-only -> error row
                    "data:text/plain;base64,!!!!",  # decode failure
                    "plain words here",  # no heading anywhere -> title ''
                ],
            }
        )
        rec = records_from_extracted(ExtractKernel()(t)).to_pylist()
        for row in rec[:3]:
            assert row["title"] == "" and row["doc_no"] == 0
            assert row["n_items"] == 0 and row["n_headings"] == 0
            assert row["n_words"] == 0
            assert row["error"] != ""
        assert rec[3]["title"] == "" and rec[3]["doc_no"] == 0
        assert rec[3]["n_items"] == 1 and rec[3]["n_words"] == 3
        assert rec[3]["error"] == ""

    def test_title_and_doc_no(self):
        """First heading-class block wins; leading-zero runs parse as int."""
        t = pa.table(
            {
                "conv_id": ["c", "c"],
                "turn_idx": pa.array([0, 1], pa.int32()),
                "role": ["user"] * 2,
                "text": [
                    "<html><body><h1>Alpha 007 beta</h1><h2>Gamma 99</h2>"
                    "<p>body text</p></body></html>",
                    "REPORT 0042\n\n    para one two\n\n1 / 1\fREPORT 0042\n"
                    "\n    more text\n\n1 / 1",
                ],
            }
        )
        rows = records_from_extracted(ExtractKernel()(t)).to_pylist()
        assert rows[0]["title"] == "Alpha 007 beta" and rows[0]["doc_no"] == 7
        assert rows[0]["n_headings"] == 2
        assert rows[1]["doc_no"] == 42  # pdf repeated-header census title


class TestRecordsGated:
    def test_parity_sf0001(self, ray_session, transcripts_sf0001):
        from ocr_ray.pipelines.extract_oracle import (
            _records_gated_sql,
            extract_records_gated,
        )

        got = extract_records_gated("/root/testdata/sf0.001").to_pandas()
        want = duckdb.sql(_records_gated_sql(transcripts_sf0001)).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        w = want[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(g) > 1000
        assert set(g.payload_kind) == {"plain", "html", "pdf"}
        assert (g.doc_no > 0).any() and (g.title != "").any()
        assert (g.error != "").any()  # default record rows present
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
