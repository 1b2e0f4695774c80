"""Binary-PDF gates: driver-checkable queries + DuckDB oracles (r5).

The kernel (``core/pdfbin.py``) is a general PDF 1.4 tokenizer; DuckDB has
no PDF parser, so the gate runs on the PROVABLY-MIRRORABLE subset — the
same technique every other engine gate uses. The subset mask (identical
regexes both sides) pins the decoded PDF body to the fixture writer's
strict vocabulary:

  * pure printable-ASCII + newline bytes (DuckDB ``decode()`` is total on
    this domain, and every Python/RE2 casefold trap vanishes);
  * every ``BT``/``ET``/``Tj``/paren in the file sits inside a STRICT text
    block — ``BT\\n[/F1 N Tf\\n]X Y Td\\n(s) Tj\\n(0 -N Td\\n(s) Tj\\n)*ET``
    — proved by "replace strict blocks, nothing show-like remains";
  * no ``/Filter`` (uncompressed streams only).

On mask-true bodies the reading order is reconstructible with regexes:
shows per BT block, blocks joined by blank lines, streams (= pages, file
order) joined by ``\\f``. What RE2 cannot prove — that the page TREE order
the kernel walks equals file order (no backreferences to cross-check
object numbers) — the Python gate closes with a hard SELF-CHECK: it
re-derives the reconstruction and raises on any drift from
``parse_pdf_text``, so a divergence can never silently pass the gate
(same policy as the html span replay self-check). The reconstructed text
then feeds the SAME layout chain SQL (``_pdf_chain_after_t_sql``) that the
driver-green textual-pdf gate uses.
"""

from __future__ import annotations

import base64
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ocr_ray.pipelines.extract_oracle import _pdf_chain_after_t_sql

# --- the shared mask / reconstruction vocabulary (Python re == DuckDB RE2;
# only literals + char classes + (?:) groups, no engine-specific syntax) ---

_BINPDF_DATAURI_RE = r"^data:application/pdf;base64,[A-Za-z0-9+/]*={0,2}$"
_BINPDF_PREFIX = "data:application/pdf;base64,"

_SHOW = r"\(([^()\\\n]*)\) Tj"
_SHOW_NOCAP = r"\([^()\\\n]*\) Tj"
_STRICT_BT_RE = (
    r"BT\n(?:/F[0-9]+ [0-9]+ Tf\n)?"
    r"[0-9]+ [0-9]+ Td\n" + _SHOW_NOCAP + r"\n"
    r"(?:0 -[0-9]+ Td\n" + _SHOW_NOCAP + r"\n)*ET"
)
_NON_ASCII_RE = r"[^\x20-\x7e\n]"
_STREAM_RE = r"(?s)stream\n(.*?)\nendstream"
_BT_BLOCK_RE = r"(?s)BT\n(.*?)\nET"

_strict_bt = re.compile(_STRICT_BT_RE)
_non_ascii = re.compile(_NON_ASCII_RE)
_stream = re.compile(_STREAM_RE)
_bt_block = re.compile(_BT_BLOCK_RE)
_show = re.compile(_SHOW)


def _mask_body(body: str) -> bool:
    """The provable-subset predicate on a decoded PDF body (str)."""
    if not body.startswith("%PDF-1.4\n"):
        return False
    if _non_ascii.search(body):
        return False
    if "/Filter" in body:
        return False
    if "stream\n" not in body:
        return False
    residue = _strict_bt.sub("", body)
    return not re.search(r"BT|ET|Tj|[()]", residue)


def _reconstruct(body: str) -> str:
    """Regex reconstruction of reading order (valid ONLY on mask-true
    bodies): shows per BT, BTs joined by a blank line, streams by \\f."""
    pages = []
    for s in _stream.findall(body):
        bts = _bt_block.findall(s)
        pages.append("\n\n".join("\n".join(_show.findall(b)) for b in bts))
    return "\f".join(pages)


def _decode_candidate(text: str) -> str | None:
    """Decoded body for a gate-candidate row, else None. Candidates:
    strict-base64 ``data:application/pdf`` URIs (length % 4 == 0 — the
    Python/DuckDB base64 agreement domain, same rule as the data-URI
    gate) and raw ``%PDF-`` text payloads."""
    if text is None:
        return None
    if text.startswith("%PDF-"):
        return text
    if re.match(_BINPDF_DATAURI_RE, text):
        payload = text[len(_BINPDF_PREFIX) :]
        if payload and len(payload) % 4 == 0:
            try:
                raw = base64.b64decode(payload, validate=True)
            except Exception:
                return None
            try:
                return raw.decode("ascii")
            except UnicodeDecodeError:
                return None
    return None


def _binpdf_fixture(sf_dir: str) -> str:
    from ocr_ray.sources.binpdf_transcripts import (
        ensure_binpdf_transcripts,
        n_binpdf_convs_for_sf,
    )

    return ensure_binpdf_transcripts(n_binpdf_convs_for_sf(sf_dir))


def _run_binpdf_kernel(t: pa.Table, explode_blocks: bool) -> pa.Table:
    from ocr_ray.core.extract import extract_turn
    from ocr_ray.core.pdfbin import parse_pdf_text

    cids, tidx, kinds, mains, errs = [], [], [], [], []
    bcid, btid, bbi, bkind, btext = [], [], [], [], []
    for cid, ti, x in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        body = _decode_candidate(x)
        if body is None or not _mask_body(body):
            continue
        # SELF-CHECK (explicit raise, not assert — survives -O): on the
        # provable subset the general tokenizer MUST agree with the regex
        # reconstruction the SQL oracle uses; a silent divergence here
        # would make the gate vacuous.
        txt, perr = parse_pdf_text(body.encode("ascii"))
        if perr or txt != _reconstruct(body):
            raise AssertionError(
                f"binpdf drift: tokenizer vs reconstruction on {cid}/{ti} ({perr!r})"
            )
        r = extract_turn(x)
        if r.payload_kind != "binpdf":
            raise AssertionError(f"binpdf dispatch drift on {cid}/{ti}")
        if explode_blocks:
            for b in r.blocks:
                bcid.append(cid)
                btid.append(ti)
                bbi.append(b.block_idx)
                bkind.append(b.kind)
                btext.append(b.text)
        else:
            cids.append(cid)
            tidx.append(ti)
            kinds.append(r.payload_kind)
            mains.append(r.main_text)
            errs.append(r.error)
    if explode_blocks:
        return pa.table(
            {
                "conv_id": pa.array(bcid, t.schema.field("conv_id").type),
                "turn_idx": pa.array(btid, t.schema.field("turn_idx").type),
                "block_idx": pa.array(bbi, pa.int32()),
                "kind": pa.array(bkind, pa.string()),
                "text": pa.array(btext, pa.string()),
            }
        )
    return pa.table(
        {
            "conv_id": pa.array(cids, t.schema.field("conv_id").type),
            "turn_idx": pa.array(tidx, pa.int32()),
            "payload_kind": pa.array(kinds, pa.string()),
            "main_text": pa.array(mains, pa.string()),
            "error": pa.array(errs, pa.string()),
        }
    )


def extract_binpdf_turns(sf_dir: str) -> Dataset:
    """REAL binary-PDF engine (object graph walk + content-stream
    tokenizer + layout census) over the provable subset of the binpdf
    fixture; value-matched by ``binpdf_turns_sql`` (DuckDB base64 decode +
    regex reconstruction + the shared pdf layout chain)."""
    path = _binpdf_fixture(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        lambda t: _run_binpdf_kernel(t, explode_blocks=False), batch_format="pyarrow"
    )


def extract_binpdf_blocks(sf_dir: str) -> Dataset:
    """Per-BLOCK view: gates the layout classifier (para vs header vs
    footer vs pagenum) on tokenizer-reconstructed pages."""
    path = _binpdf_fixture(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        lambda t: _run_binpdf_kernel(t, explode_blocks=True), batch_format="pyarrow"
    )


# --- SQL oracles -----------------------------------------------------------


def _sql_quote_re(pat: str) -> str:
    # DuckDB single-quoted literals pass backslashes through verbatim —
    # only the quote char needs doubling
    return pat.replace("'", "''")


def _binpdf_t_cte_sql(path: str) -> str:
    """``raw``/``ok``/``t`` CTEs: candidate rows -> decoded body -> mask ->
    regex reconstruction exposed as ``t(conv_id, turn_idx, txt, np)`` for
    the shared pdf layout chain."""
    # regexes as SQL string literals (RE2 == Python re on this vocabulary)
    show = r"\(([^()\\\n]*)\) Tj"
    strict = _STRICT_BT_RE
    recon = (
        "array_to_string(list_transform("
        f"regexp_extract_all(s, '{_sql_quote_re(_BT_BLOCK_RE)}', 1), "
        f"b -> array_to_string(regexp_extract_all(b, '{_sql_quote_re(show)}', 1), chr(10))"
        "), chr(10) || chr(10))"
    )
    # the body expression is TOTAL on every row (the candidate check lives
    # INSIDE the CASE, and from_base64 only ever sees verified-base64 input
    # or ''): DuckDB's optimizer merges the ok-CTE filter into this scan
    # and reorders conjuncts by cost, so a WHERE-guarded from_base64 WOULD
    # be evaluated on non-candidate rows and hard-error (observed on 1.0)
    return f"""raw AS (
  SELECT conv_id, turn_idx,
         CASE WHEN starts_with(text, '%PDF-') THEN text
              WHEN regexp_matches(text, '{_sql_quote_re(_BINPDF_DATAURI_RE)}')
                   AND length(substring(text, {len(_BINPDF_PREFIX) + 1})) % 4 = 0
                   AND length(substring(text, {len(_BINPDF_PREFIX) + 1})) > 0
              THEN decode(from_base64(substring(text, {len(_BINPDF_PREFIX) + 1})))
              ELSE '' END AS body
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
),
ok AS (
  SELECT conv_id, turn_idx, body FROM raw
  WHERE starts_with(body, '%PDF-1.4' || chr(10))
    AND NOT regexp_matches(body, '{_sql_quote_re(_NON_ASCII_RE)}')
    AND NOT contains(body, '/Filter')
    AND contains(body, 'stream' || chr(10))
    AND NOT regexp_matches(
          regexp_replace(body, '{_sql_quote_re(strict)}', '', 'g'),
          'BT|ET|Tj|[()]')
),
pgtxt AS (
  SELECT conv_id, turn_idx,
         array_to_string(list_transform(
           regexp_extract_all(body, '{_sql_quote_re(_STREAM_RE)}', 1),
           s -> {recon}), chr(12)) AS txt
  FROM ok
),
t AS (
  SELECT conv_id, turn_idx, txt,
         len(string_split(txt, chr(12))) AS np
  FROM pgtxt
)"""


def binpdf_turns_sql(path: str) -> str:
    return f"""
WITH {_binpdf_t_cte_sql(path)},
{_pdf_chain_after_t_sql()}
SELECT t.conv_id, CAST(t.turn_idx AS INTEGER) AS turn_idx,
       'binpdf' AS payload_kind,
       coalesce(mt.main_text, '') AS main_text,
       '' AS error
FROM t
LEFT JOIN (
  SELECT conv_id, turn_idx,
         string_agg(joined, chr(10) || chr(10) ORDER BY page_no, g_first)
           FILTER (WHERE kind = 'para') AS main_text
  FROM kk GROUP BY conv_id, turn_idx
) mt ON mt.conv_id = t.conv_id AND mt.turn_idx = t.turn_idx
"""


def binpdf_blocks_sql(path: str) -> str:
    return f"""
WITH {_binpdf_t_cte_sql(path)},
{_pdf_chain_after_t_sql()}
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY page_no, g_first) - 1 AS INTEGER)
         AS block_idx,
       kind, joined AS text
FROM kk
"""


def binpdf_oracle_sqls(sf_dir: str) -> dict[str, str]:
    path = _binpdf_fixture(sf_dir)
    return {
        "extract_binpdf_turns": binpdf_turns_sql(path),
        "extract_binpdf_blocks": binpdf_blocks_sql(path),
    }
