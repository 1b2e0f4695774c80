"""Deterministic binary-PDF transcript fixture (r5).

Same ``(conv_id, turn_idx, role, text, tool, ts)`` schema as the main
transcript fixture, but the payload mix centers on REAL binary PDFs
(``sources/pdfgen.py``): base64 ``data:application/pdf`` URIs (the
reference's exact transport — base64 PDF bytes handed to the OCR engine,
extract-data-from-pdf.ts:114-139), raw ``%PDF-`` files read as text, plus
plain/html rows for dispatch coverage and edge rows for every error path
(bad base64, truncated PDF, Flate-filtered stream).

Kept SEPARATE from the main fixture on purpose: the four r4 engine mirrors
provably PARTITION that corpus (plain+html+pdf+datauri == extract_turns),
and adding a fifth payload kind there would invalidate every pinned count;
the binpdf gates get their own deterministic corpus instead, the same
pattern the media fixtures use.
"""

from __future__ import annotations

import base64
import os
import random

import pyarrow as pa

from ocr_ray.sources.pdfgen import build_pdf
from ocr_ray.sources.transcripts import (
    _BASE_TS_US,
    _TOOLS,
    _ROLES,
    _WORDS,
    _html_payload,
    _plain_payload,
    _default_fixture_root,
)
from ocr_ray.stages.schemas import TRANSCRIPT_SCHEMA

# PDF content stays pure-ASCII: DuckDB's decode() hard-errors on invalid
# UTF-8 (same documented caveat as the data-URI gate), and latin-1-encoded
# accents in a literal would be exactly that. The kernel handles latin-1
# strings fine (pytest-covered); the FIXTURE keeps to the mirrorable domain.
_ASCII_WORDS = [w for w in _WORDS if w.isascii()]


def _ascii_para(rng: random.Random, lo: int = 2, hi: int = 4) -> str:
    sents = []
    for _ in range(rng.randint(lo, hi)):
        n = rng.randint(5, 14)
        ws = [rng.choice(_ASCII_WORDS) for _ in range(n)]
        s = " ".join(ws)
        sents.append(s[0].upper() + s[1:] + rng.choice([".", ".", ".", "?", "!"]))
    return " ".join(sents)


def _pdf_pages(rng: random.Random) -> list[list[list[str]]]:
    """Page/group/line structure mirroring the textual ``_pdf_payload``:
    repeated title header, wrapped body lines with hyphenated breaks, a
    ``n / N`` pagenum footer — so the layout census has real work."""
    n_pages = rng.randint(1, 3)
    doc_title = f"REPORT {rng.randrange(10_000):04d}"
    pages: list[list[list[str]]] = []
    for pno in range(n_pages):
        groups: list[list[str]] = [[doc_title]]
        for _ in range(rng.randint(2, 5)):
            para = _ascii_para(rng, 2, 4)
            words = para.split(" ")
            ln, out = "", []
            for w in words:
                if ln and len(ln) + len(w) > 60:
                    if rng.random() < 0.15 and len(w) > 6:
                        cut = len(w) // 2
                        out.append(ln + " " + w[:cut] + "-")
                        ln = w[cut:]
                    else:
                        out.append(ln)
                        ln = w
                else:
                    ln = f"{ln} {w}" if ln else w
            if ln:
                out.append(ln)
            groups.append(out)
        groups.append([f"{pno + 1} / {n_pages}"])
        pages.append(groups)
    return pages


def _binpdf_datauri(rng: random.Random) -> str:
    b = build_pdf(_pdf_pages(rng))
    return "data:application/pdf;base64," + base64.b64encode(b).decode("ascii")


def _binpdf_raw_text(rng: random.Random) -> str:
    # the writer emits pure ASCII, so the file IS a valid text payload
    return build_pdf(_pdf_pages(rng)).decode("ascii")


def _binpdf_edge(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.20:
        return ""
    if r < 0.35:  # invalid base64 -> decode_error
        return "data:application/pdf;base64,!!notbase64!!"
    if r < 0.55:  # valid base64, truncated PDF -> pdf_parse_error:no_objects
        return "data:application/pdf;base64," + base64.b64encode(
            b"%PDF-1.4\ngarbage with no objects"
        ).decode("ascii")
    if r < 0.75:  # Flate-filtered stream -> pdf_parse_error:filter
        body = (
            b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            # stream bytes kept ASCII on purpose: DuckDB decode() hard-
            # errors on invalid UTF-8 and the oracle must be able to decode
            # every candidate body; /Filter alone triggers the kernel's
            # filter error path regardless of the payload bytes
            b"4 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\n"
            b"xZIPDATA\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        return "data:application/pdf;base64," + base64.b64encode(body).decode("ascii")
    return "   \n\t  "


def gen_binpdf_conv(i: int, seed: int = 19):
    """One conversation's rows; pure function of (i, seed)."""
    rng = random.Random((seed << 33) ^ (i * 2654435761))
    conv_id = f"bpdf-{i:08d}"
    n_turns = rng.randint(2, 8)
    rows = []
    for t in range(n_turns):
        role = _ROLES[t % 2] if rng.random() < 0.85 else rng.choice(["system", "tool"])
        r = rng.random()
        if r < 0.55:
            text = _binpdf_datauri(rng)
        elif r < 0.70:
            text = _binpdf_raw_text(rng)
        elif r < 0.82:
            text = _plain_payload(rng)
        elif r < 0.90:
            text = _html_payload(rng)
        else:
            text = _binpdf_edge(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": rng.choice(_TOOLS) if role == "tool" else "",
                "ts": _BASE_TS_US + i * 3_600_000_000 + t * 47_000_000,
            }
        )
    return rows


def binpdf_batch_table(indices, seed: int = 19) -> pa.Table:
    rows = [r for i in indices for r in gen_binpdf_conv(int(i), seed)]
    return pa.table(
        {name: [r[name] for r in rows] for name in TRANSCRIPT_SCHEMA.names},
        schema=TRANSCRIPT_SCHEMA,
    )


def n_binpdf_convs_for_sf(sf_dir: str) -> int:
    from ocr_ray.sources.transcripts import n_convs_for_sf

    return max(40, n_convs_for_sf(sf_dir) // 5)


def ensure_binpdf_transcripts(n_convs: int, seed: int = 19, root: str | None = None) -> str:
    """Generate (once, cached) the binary-PDF transcript parquet dir.

    Distributed via Ray above the small-fixture threshold; the small path
    stays Ray-free so ``oracle_sql()`` construction can build it without
    starting a session (same contract as ``ensure_transcripts``)."""
    root = root or _default_fixture_root()
    out = os.path.join(root, f"binpdf_s{seed}_c{n_convs}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if n_convs <= 5_000:
        import pyarrow.parquet as pq

        pq.write_table(
            binpdf_batch_table(range(n_convs), seed),
            os.path.join(tmp, "part-0.parquet"),
        )
    else:
        import ray.data as rd

        n_blocks = max(4, min(n_convs // 300, 2048))
        (
            rd.range(n_convs, override_num_blocks=n_blocks)
            .map_batches(
                lambda b: binpdf_batch_table(b["id"], seed),
                batch_format="numpy",
                batch_size=400,
            )
            .write_parquet(tmp)
        )
    try:
        os.replace(tmp, out)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(tmp, ignore_errors=True)
            return out
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out
