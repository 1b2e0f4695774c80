"""Driver-verifiable (SQL-gated) invariant queries for the FLAGSHIP
extraction family (VERDICT r1 next-step #1).

The extraction kernel itself is not SQL; but substantial slices of its
contract ARE expressible in ANSI SQL over the raw transcripts parquet:

* ``extract_plain_turns`` — on payloads that are *provably* routed to the
  plain engine (no tags, no form feeds, no data-URIs, no indented lines, no
  exotic whitespace — a filter BOTH sides apply verbatim), the kernel's
  output equals NFC-normalize -> paragraph-split -> whitespace-collapse ->
  re-join, which DuckDB computes with ``nfc_normalize`` + RE2 regexes. This
  runs the REAL kernel (``classify_payload`` + ``_extract_plain``) against
  an INDEPENDENT SQL reimplementation of the spec
  (reference semantics: extract-data-from-pdf.ts:48-52,87-91,134-145 —
  missing-data defaults + guards; whitespace canonicalization per SURVEY).
* ``extract_turn_counts`` — totality: the kernel NEVER drops a row
  (poison-pill guard, extract-data-from-pdf.ts:134-145); row count out ==
  row count in, which SQL states as COUNT(*) over the raw table.
* ``conversation_stats`` (registered in ``__ray_entry__``) — raw-table
  rollup, fully SQL-expressible.

The predicates are written once in RE2 syntax and evaluated by pyarrow
(``match_substring_regex`` — RE2) on the Ray side and by DuckDB (also RE2)
on the oracle side, so filter parity is by construction, not coincidence.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

# --- the provably-plain filter (RE2 patterns, shared verbatim) -------------

# any line starting with 2+ spaces/tabs then a non-space: the pdf
# classifier's indent heuristic could fire (core/extract.py classify_payload)
_INDENT_RE = r"(?m)^[ \t]{2,}[^ \t\n]"
# whitespace the kernel treats as whitespace (str.split / \s, unicode) but
# RE2's ASCII [ \t\n] class does not, plus line separators Python's
# splitlines honors beyond \n — excluding them keeps both sides aligned.
_EXOTIC_WS_RE = (
    r"[\x{000B}\x{000C}\x{000D}\x{001C}-\x{001F}\x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)


def _provably_plain_mask(text: pa.ChunkedArray) -> pa.ChunkedArray:
    """True for rows the kernel is GUARANTEED to route to the plain engine.

    html needs >=3 ``<...>`` tags — impossible without ``<``; the pdf route
    needs a form feed or indented lines; data-URIs need the ``data:`` prefix.
    """
    ok = pc.is_valid(text)
    for bad in ("<",):
        ok = pc.and_(ok, pc.invert(pc.match_substring(text, bad)))
    ok = pc.and_(ok, pc.invert(pc.starts_with(text, "data:")))
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, _INDENT_RE)))
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, _EXOTIC_WS_RE)))
    return ok


def _transcripts(sf_dir: str) -> str:
    from ocr_ray.sources.transcripts import ensure_transcripts, n_convs_for_sf

    return ensure_transcripts(n_convs_for_sf(sf_dir), seed=42)


def extract_plain_turns(sf_dir: str) -> Dataset:
    """Run the REAL extraction kernel over the provably-plain subset.

    Output (conv_id, turn_idx, payload_kind, main_text, error) is matched
    value-for-value by ``EXTRACT_PLAIN_SQL`` — an independent DuckDB
    reimplementation of plain-engine semantics."""
    from ocr_ray.core.extract import extract_turn

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_plain_mask(t.column("text")))
        res = [extract_turn(x) for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                "main_text": pa.array([r.main_text for r in res], pa.string()),
                "error": pa.array([r.error for r in res], pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _plain_sql(path: str) -> str:
    # NOTE: '\f' is excluded via _EXOTIC_WS_RE (\x{000C}); '\r' likewise.
    # After the filter the only whitespace left is space/\t/\n, so the
    # SQL collapse class [ \t\n] is exactly the kernel's str.split() set.
    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    norm_all = r"trim(regexp_replace(text, '[ \t\n]+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
)
SELECT conv_id, turn_idx,
       'plain' AS payload_kind,
       CASE WHEN {norm_all} = '' THEN ''
            ELSE array_to_string(
                   list_filter(
                     list_transform(
                       regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),
                       x -> {collapse}),
                     x -> x <> ''),
                   chr(10) || chr(10))
       END AS main_text,
       CASE WHEN {norm_all} = '' THEN 'empty_input' ELSE '' END AS error
FROM t
"""


def extract_plain_blocks(sf_dir: str) -> Dataset:
    """Exploded per-BLOCK view of the provably-plain subset (the sheet-sink
    explode semantics, save-to-google-sheet.ts:199-215, driver-gated).

    The real kernel runs and its ``blocks`` tuple is exploded to one row per
    block; the oracle reproduces (block_idx, kind, text) with the same
    paragraph pipeline as ``EXTRACT_PLAIN_SQL`` plus a zipped unnest."""
    from ocr_ray.core.extract import extract_turn

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_plain_mask(t.column("text")))
        cids, tidx, bidx, kinds, texts = [], [], [], [], []
        for cid, ti, x in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("text").to_pylist(),
        ):
            for b in extract_turn(x).blocks:
                cids.append(cid)
                tidx.append(ti)
                bidx.append(b.block_idx)
                kinds.append(b.kind)
                texts.append(b.text)
        return pa.table(
            {
                "conv_id": pa.array(cids, t.schema.field("conv_id").type),
                "turn_idx": pa.array(tidx, t.schema.field("turn_idx").type),
                "block_idx": pa.array(bidx, pa.int32()),
                "kind": pa.array(kinds, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _plain_blocks_sql(path: str) -> str:
    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
p AS (
  SELECT conv_id, turn_idx,
         list_filter(
           list_transform(
             regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),
             x -> {collapse}),
           x -> x <> '') AS paras
  FROM t
)
SELECT conv_id, turn_idx, CAST(block_idx AS INTEGER) AS block_idx, kind, text
FROM (
  SELECT conv_id, turn_idx,
         unnest(range(len(paras))) AS block_idx,
         'para' AS kind,
         unnest(paras) AS text
  FROM p
)
"""


def plain_dialogue_pairs(sf_dir: str) -> Dataset:
    """Driver-gated cross-turn context view: the REAL kernel + the REAL
    ``dialogue_pairs`` grouped-scan (conv_id co-location, vectorized lag)
    run over the provably-plain subset; the oracle is an independent SQL
    ``lag()`` window over the plain main_text pipeline. This gates the
    conversation-context machinery ON KERNEL OUTPUT (turn_context_stats
    gates the lag scan over raw text only)."""
    from ocr_ray.pipelines.conversation import dialogue_pairs
    from ocr_ray.pipelines.extract_pipeline import extract_dataset

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(
        lambda t: t.filter(_provably_plain_mask(t.column("text"))),
        batch_format="pyarrow",
    )
    return dialogue_pairs(extract_dataset(ds))


def _plain_dialogue_pairs_sql(path: str) -> str:
    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    norm_all = r"trim(regexp_replace(text, '[ \t\n]+', ' ', 'g'))"
    win = "PARTITION BY conv_id ORDER BY turn_idx"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
s AS (
  SELECT conv_id, turn_idx, role,
       CASE WHEN {norm_all} = '' THEN ''
            ELSE array_to_string(
                   list_filter(
                     list_transform(
                       regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),
                       x -> {collapse}),
                     x -> x <> ''),
                   chr(10) || chr(10))
       END AS main_text
  FROM t
)
SELECT conv_id, turn_idx, role,
       coalesce(lag(role) OVER ({win}), '') AS prev_role,
       coalesce(substring(lag(main_text) OVER ({win}), 1, 80), '') AS prev_text_head
FROM s
"""


def html_dialogue_pairs(sf_dir: str) -> Dataset:
    """Cross-turn context over the HTML engine: the REAL kernel + the REAL
    ``dialogue_pairs`` grouped-scan run on the provably-simple-html subset;
    the oracle is a lag() window over the html main_text pipeline — the
    conversation-context machinery gated on boilerplate-stripped output
    (the plain sibling gates it on whitespace-canonicalized output)."""
    from ocr_ray.pipelines.conversation import dialogue_pairs
    from ocr_ray.pipelines.extract_pipeline import extract_dataset

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(
        lambda t: t.filter(_provably_simple_html_mask(t.column("text"))),
        batch_format="pyarrow",
    )
    return dialogue_pairs(extract_dataset(ds))


def _html_dialogue_pairs_sql(path: str) -> str:
    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    main = (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )
    win = "PARTITION BY conv_id ORDER BY turn_idx"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_filter_sql()}
),
s AS (
  SELECT conv_id, turn_idx, role, {main} AS main_text FROM t
)
SELECT conv_id, turn_idx, role,
       coalesce(lag(role) OVER ({win}), '') AS prev_role,
       coalesce(substring(lag(main_text) OVER ({win}), 1, 80), '') AS prev_text_head
FROM s
"""


def extract_plain_summaries(sf_dir: str) -> Dataset:
    """Driver-gated summarizer (A5): the REAL kernel + REAL ``summarize_text``
    run over the provably-plain subset; the oracle reproduces first-sentence
    split (RE2 lazy-prefix mirror of the Python lookbehind), the 160-char
    ellipsis truncation, and the (count desc, term asc) top-5 term ranking
    entirely in DuckDB SQL (reference semantics: summarize-pdf-data.ts:28-45)."""
    from ocr_ray.core.extract import extract_turn
    from ocr_ray.stages.summarize import summarize_text

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_plain_mask(t.column("text")))
        sums = [
            summarize_text(extract_turn(x).main_text)
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "summary": pa.array(sums, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _summaries_tail_sql() -> str:
    """The A5 summarizer mirror (first-sentence split, 160-char ellipsis,
    (count desc, term asc) top-5 terms — summarize-pdf-data.ts:28-45) as
    the CTE chain AFTER a ``s(conv_id, turn_idx, main_text)`` CTE. Shared
    by the plain- and html-engine summary gates: both engines' main_text
    contains only space/\\t/\\n whitespace, which is exactly the trim
    charset the mirror uses.

    Python's lookbehind split ``(?<=[.!?])\\s+`` = RE2 lazy prefix ending
    at the first [.!?] followed by whitespace ((?s) lets it cross the
    \\n\\n paragraph joins)."""
    from ocr_ray.stages.summarize import _STOP

    stop_sql = ", ".join(f"'{w}'" for w in sorted(_STOP))
    ws = "' ' || chr(9) || chr(10)"
    first_re = r"regexp_extract(main_text, '(?s)^(.*?[.!?])[ \t\n]', 1)"
    return f"""
f AS (
  SELECT conv_id, turn_idx, main_text,
         trim(CASE WHEN {first_re} = '' THEN main_text ELSE {first_re} END,
              {ws}) AS first1
  FROM s
),
fs AS (
  SELECT conv_id, turn_idx, main_text,
         CASE WHEN length(first1) > 160
              THEN rtrim(substring(first1, 1, 159), {ws}) || chr(8230)
              ELSE first1 END AS first
  FROM f
),
w AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(lower(main_text), '\\pL{{3,}}')) AS wd
  FROM fs
),
wc AS (
  SELECT conv_id, turn_idx, wd, COUNT(*) AS c
  FROM w WHERE wd NOT IN ({stop_sql})
  GROUP BY conv_id, turn_idx, wd
),
rk AS (
  SELECT conv_id, turn_idx, wd, c,
         row_number() OVER (PARTITION BY conv_id, turn_idx
                            ORDER BY c DESC, wd ASC) AS r
  FROM wc
),
tm AS (
  SELECT conv_id, turn_idx, string_agg(wd, ', ' ORDER BY c DESC, wd ASC) AS terms
  FROM rk WHERE r <= 5 GROUP BY conv_id, turn_idx
)
SELECT fs.conv_id, fs.turn_idx,
       CASE WHEN tm.terms IS NULL OR tm.terms = '' THEN fs.first
            ELSE fs.first || ' [' || tm.terms || ']' END AS summary
FROM fs LEFT JOIN tm ON fs.conv_id = tm.conv_id AND fs.turn_idx = tm.turn_idx
"""


def extract_html_summaries(sf_dir: str) -> Dataset:
    """A5 summarizer over the HTML engine's output: the REAL kernel +
    REAL ``summarize_text`` over the provably-simple-html subset; the
    oracle composes the html main_text pipeline with the shared
    summarizer mirror — extends the A5 gate beyond the plain engine."""
    from ocr_ray.core.extract import extract_turn
    from ocr_ray.stages.summarize import summarize_text

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_simple_html_mask(t.column("text")))
        sums = [
            summarize_text(extract_turn(x).main_text)
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "summary": pa.array(sums, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _html_summaries_sql(path: str) -> str:
    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    main = (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_filter_sql()}
),
s AS (
  SELECT conv_id, turn_idx, {main} AS main_text FROM t
),
{_summaries_tail_sql()}
"""


def _plain_summaries_sql(path: str) -> str:
    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    norm_all = r"trim(regexp_replace(text, '[ \t\n]+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
s AS (
  SELECT conv_id, turn_idx,
       CASE WHEN {norm_all} = '' THEN ''
            ELSE array_to_string(
                   list_filter(
                     list_transform(
                       regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),
                       x -> {collapse}),
                     x -> x <> ''),
                   chr(10) || chr(10))
       END AS main_text
  FROM t
),
{_summaries_tail_sql()}
"""



def clean_corpus_plain(sf_dir: str) -> Dataset:
    """Driver-gated COMPOSED pipeline: the REAL ``clean_corpus`` (extract ->
    quality gate -> lang-ID + token counts -> exact min-uid dedup) runs over
    the provably-plain subset; the oracle reproduces every stage in one SQL
    query (plain main_text pipeline + length>=50 gate + the generated
    stopword-profile lang scorer + regex token count + a window-function
    dedup). This extends the flagship oracle from the kernel to the whole
    100 TB training-data pipeline."""
    from ocr_ray.pipelines.training_data import clean_corpus

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(
        lambda t: t.filter(_provably_plain_mask(t.column("text"))),
        batch_format="pyarrow",
    )
    return clean_corpus(ds).select_columns(
        ["conv_id", "turn_idx", "payload_kind", "lang_pred", "n_tokens"]
    )


def _clean_corpus_plain_sql(path: str) -> str:
    from ocr_ray.pipelines.training_data import MIN_CHARS
    from ocr_ray.ops.textstats import _lang_id_sql

    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    norm_all = r"trim(regexp_replace(text, '[ \t\n]+', ' ', 'g'))"
    lang_sql = _lang_id_sql(source="g", id_cols="conv_id, turn_idx", text_col="main_text")
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
s AS (
  SELECT conv_id, turn_idx,
       CASE WHEN {norm_all} = '' THEN ''
            ELSE array_to_string(
                   list_filter(
                     list_transform(
                       regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),
                       x -> {collapse}),
                     x -> x <> ''),
                   chr(10) || chr(10))
       END AS main_text
  FROM t
),
g AS (
  SELECT conv_id, turn_idx, main_text FROM s
  WHERE length(main_text) >= {MIN_CHARS}
),
l AS ({lang_sql}),
d AS (
  SELECT conv_id, turn_idx, main_text FROM g
  QUALIFY row_number() OVER (PARTITION BY main_text
                             ORDER BY conv_id, turn_idx) = 1
)
SELECT d.conv_id, d.turn_idx,
       'plain' AS payload_kind,
       l.lang_pred,
       CAST(len(regexp_extract_all(d.main_text, '\\S+')) AS BIGINT) AS n_tokens
FROM d JOIN l ON d.conv_id = l.conv_id AND d.turn_idx = l.turn_idx
"""


def clean_corpus_html(sf_dir: str) -> Dataset:
    """Driver-gated COMPOSED pipeline on the SECOND engine: the REAL
    ``clean_corpus`` (extract -> quality gate -> lang-ID + token counts ->
    exact min-uid dedup) over the provably-simple-HTML subset; the oracle
    composes the html main_text pipeline with the same gate/lang/token/
    dedup SQL as the plain sibling — the whole training-data pipeline is
    now gated over boilerplate-stripped html documents too."""
    from ocr_ray.pipelines.training_data import clean_corpus

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(
        lambda t: t.filter(_provably_simple_html_mask(t.column("text"))),
        batch_format="pyarrow",
    )
    return clean_corpus(ds).select_columns(
        ["conv_id", "turn_idx", "payload_kind", "lang_pred", "n_tokens"]
    )


def _clean_corpus_html_sql(path: str) -> str:
    from ocr_ray.pipelines.training_data import MIN_CHARS
    from ocr_ray.ops.textstats import _lang_id_sql

    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    main = (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )
    lang_sql = _lang_id_sql(source="g", id_cols="conv_id, turn_idx", text_col="main_text")
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_filter_sql()}
),
s AS (
  SELECT conv_id, turn_idx, {main} AS main_text FROM t
),
g AS (
  SELECT conv_id, turn_idx, main_text FROM s
  WHERE length(main_text) >= {MIN_CHARS}
),
l AS ({lang_sql}),
d AS (
  SELECT conv_id, turn_idx, main_text FROM g
  QUALIFY row_number() OVER (PARTITION BY main_text
                             ORDER BY conv_id, turn_idx) = 1
)
SELECT d.conv_id, d.turn_idx,
       'html' AS payload_kind,
       l.lang_pred,
       CAST(len(regexp_extract_all(d.main_text, '\\S+')) AS BIGINT) AS n_tokens
FROM d JOIN l ON d.conv_id = l.conv_id AND d.turn_idx = l.turn_idx
"""


def engine_dispatch_counts(sf_dir: str) -> Dataset:
    """M1 engine dispatch, driver-gated: per-payload_kind row counts from
    the REAL ``classify_payload`` vs an independent SQL reimplementation of
    the classifier spec (extract-data-from-pdf.ts:22-24,:96-154 dispatch).

    Scope filter (applied verbatim on both sides): data-URI payloads are
    excluded (classification runs on the DECODED body, and base64 decode
    totality is not SQL-expressible) and so are exotic-whitespace payloads
    (Python ``splitlines``/``\\s`` vs RE2 ``\\n`` divergence — same filter
    as the plain gate). Everything else — html tag threshold, pdf indent
    heuristic with its 200-line cap and 30% ratio — is mirrored exactly."""
    from ocr_ray.core.extract import classify_payload

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        keep = pc.and_(pc.is_valid(txt), pc.invert(pc.starts_with(txt, "data:")))
        keep = pc.and_(keep, pc.invert(pc.match_substring_regex(txt, _EXOTIC_WS_RE)))
        kinds: dict[str, int] = {}
        for x in t.filter(keep).column("text").to_pylist():
            k = classify_payload(x)
            kinds[k] = kinds.get(k, 0) + 1
        return pa.table(
            {
                "payload_kind": pa.array(list(kinds), pa.string()),
                "n": pa.array(list(kinds.values()), pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        g = t.group_by(["payload_kind"]).aggregate([("n", "sum")])
        return g.rename_columns(["payload_kind", "n"])

    # partial counts per batch (<= 3 rows each) -> one-block exact sum
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow")
    )


def _dispatch_sql(path: str) -> str:
    return f"""
WITH t AS (
  SELECT text FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
m AS (
  SELECT text,
         len(regexp_extract_all(text, '</?[a-zA-Z][^<>]*>')) AS n_tags,
         list_slice(regexp_split_to_array(text, chr(10)), 1, 200) AS l200
  FROM t
),
c AS (
  SELECT n_tags,
         len(list_filter(l200, x -> trim(x, ' ' || chr(9)) <> '')) AS nonempty,
         len(list_filter(l200, x -> regexp_matches(x, '^[ \t]{{2,}}[^ \t]'))) AS indented,
         trim(text, ' ' || chr(9) || chr(10)) = '' AS is_blank,
         starts_with(text, '%PDF-') AS is_binpdf,
         contains(text, chr(12)) AS has_ff
  FROM m
),
k AS (
  SELECT CASE
           WHEN is_blank THEN 'plain'
           WHEN is_binpdf THEN 'binpdf'
           WHEN has_ff THEN 'pdf'
           WHEN n_tags >= 3 THEN 'html'
           WHEN nonempty >= 4 AND indented * 10 >= nonempty * 3 THEN 'pdf'
           ELSE 'plain'
         END AS payload_kind
  FROM c
)
SELECT payload_kind, CAST(COUNT(*) AS BIGINT) AS n
FROM k GROUP BY payload_kind
"""


# ---------------------------------------------------------------------------
# provably-mirrorable HTML subset (VERDICT r2 next-step #1a)
#
# The html engine's tag-strip + block-split + boilerplate-container drop IS
# SQL-expressible on payloads whose structure is pinned by an RE2-checkable
# filter (applied verbatim on BOTH sides):
#   * every tag belongs to a closed inventory of attribute-free block
#     elements (plus `<a href="...">`, which only ever occurs inside
#     boilerplate containers — enforced below), so every tag boundary is a
#     kernel flush point and tag-split == block-split;
#   * `<head><title>...</title></head>` occurs at most once, well-formed, so
#     the drop-subtree rule is one region replace;
#   * each boilerplate container (nav/header/footer/aside/form/select/option)
#     occurs at most once, open-before-close, with no cross-element
#     interleaving, so each subtree drop is one lazy region replace;
#   * every `&` belongs to a closed entity set, so unescape is a finite
#     replace chain (ordered so one SQL pass == Python's single-pass
#     html.unescape);
#   * no exotic whitespace (same class as the plain gate), so the whitespace
#     collapse class is exactly ``[ \t\n]``.
# On this subset the kernel output equals: NFC -> drop doctype -> drop
# head/boiler regions -> split on tags -> unescape -> collapse -> join,
# which DuckDB computes with nfc_normalize + RE2. Reference semantics:
# extract-data-from-pdf.ts:96-154 (engine dispatch + DOM heuristics).
# The generator's html payloads (sources/transcripts.py:_html_payload) all
# satisfy the filter, so coverage is the full html slice, not a corner.
# ---------------------------------------------------------------------------

_BOILER_SIMPLE = ("nav", "header", "footer", "aside", "form", "select", "option")
_HTML_INV_RE = (
    r"<!DOCTYPE html>"
    r"|</?(?:html|head|title|body|nav|header|footer|aside|main|article|section"
    r"|p|br|ul|ol|li|blockquote|pre|h[1-6]|table|tbody|tr|td|th|form|select"
    r"|option)>"
    r'|<a href="[^<>"&]*">'
    r"|</a>"
)
_ENTITY_CLOSED_RE = r"&(?:amp|lt|gt|#233);"
_HEAD_REGION_RE = r"(?s)<head><title>[^<>&]*</title></head>"
_TAGISH_SPLIT_RE = r"</?[a-zA-Z][^<>]*>"


def _provably_simple_html_mask(text: pa.ChunkedArray):
    """True for rows GUARANTEED html-routed with SQL-mirrorable structure."""
    from itertools import combinations

    ok = pc.is_valid(text)
    ok = pc.and_(ok, pc.invert(pc.starts_with(text, "data:")))
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, _EXOTIC_WS_RE)))
    n_tags = pc.count_substring_regex(text, _TAGISH_SPLIT_RE)
    ok = pc.and_(ok, pc.greater_equal(n_tags, 3))
    stripped = pc.replace_substring_regex(text, _HTML_INV_RE, "")
    ok = pc.and_(ok, pc.invert(pc.match_substring(stripped, "<")))
    ok = pc.and_(ok, pc.invert(pc.match_substring(stripped, ">")))
    deent = pc.replace_substring_regex(text, _ENTITY_CLOSED_RE, "")
    ok = pc.and_(ok, pc.invert(pc.match_substring(deent, "&")))

    def _pair_ok(name: str, region_re: str):
        no = pc.count_substring(text, f"<{name}>")
        nc = pc.count_substring(text, f"</{name}>")
        absent = pc.and_(pc.equal(no, 0), pc.equal(nc, 0))
        one = pc.and_(
            pc.and_(pc.equal(no, 1), pc.equal(nc, 1)),
            pc.match_substring_regex(text, region_re),
        )
        return pc.or_(absent, one)

    # head/title: exactly one well-formed region or none at all
    head_ok = _pair_ok("head", _HEAD_REGION_RE)
    for nm in ("title",):
        no = pc.count_substring(text, f"<{nm}>")
        nc = pc.count_substring(text, f"</{nm}>")
        with_head = pc.and_(pc.equal(no, 1), pc.equal(nc, 1))
        without = pc.and_(pc.equal(no, 0), pc.equal(nc, 0))
        head_ok = pc.and_(
            head_ok,
            pc.or_(
                pc.and_(with_head, pc.match_substring_regex(text, _HEAD_REGION_RE)),
                without,
            ),
        )
    ok = pc.and_(ok, head_ok)
    for c in _BOILER_SIMPLE:
        ok = pc.and_(ok, _pair_ok(c, rf"(?s)<{c}>.*</{c}>"))
    for a, b in combinations(_BOILER_SIMPLE, 2):
        ok = pc.and_(
            ok,
            pc.invert(
                pc.match_substring_regex(text, rf"(?s)<{a}>.*<{b}>.*</{a}>.*</{b}>")
            ),
        )
        ok = pc.and_(
            ok,
            pc.invert(
                pc.match_substring_regex(text, rf"(?s)<{b}>.*<{a}>.*</{b}>.*</{a}>")
            ),
        )
    # links confined to dropped regions: after removing head + boiler
    # subtrees, no anchor tag may remain (link-density rules then never fire)
    rem = pc.replace_substring_regex(text, _HEAD_REGION_RE, "<p>")
    for c in _BOILER_SIMPLE:
        rem = pc.replace_substring_regex(rem, rf"(?s)<{c}>.*?</{c}>", "<p>")
    ok = pc.and_(ok, pc.invert(pc.match_substring(rem, "<a href")))
    ok = pc.and_(ok, pc.invert(pc.match_substring(rem, "</a>")))
    return ok


def extract_html_turns(sf_dir: str) -> Dataset:
    """Run the REAL html engine over the provably-mirrorable-html subset.

    The kernel (``classify_payload`` + ``_extract_html`` — tag parse, flush
    at block elements, head/boiler subtree drop, entity unescape, whitespace
    canonicalization) runs unmodified; ``EXTRACT_HTML_SQL`` reproduces the
    same output independently in DuckDB. payload_kind is emitted from the
    kernel result, so a routing bug shows as a gate mismatch too."""
    from ocr_ray.core.extract import extract_turn

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_simple_html_mask(t.column("text")))
        res = [extract_turn(x) for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                "main_text": pa.array([r.main_text for r in res], pa.string()),
                "error": pa.array([r.error for r in res], pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _html_filter_sql(col: str = "text") -> str:
    """The provably-simple-html predicate as a SQL boolean (RE2, verbatim
    mirror of ``_provably_simple_html_mask``). ``col`` names the column
    the predicate reads (r5 ADVICE: the data-URI gate previously re-
    targeted the filter with a blanket ``.replace('text', 'body')`` that
    would silently corrupt any future pattern literal containing the
    substring 'text')."""
    from itertools import combinations

    def cnt(lit: str) -> str:
        return f"len(regexp_extract_all({col}, '{lit}'))"

    parts = [
        f"{col} IS NOT NULL",
        f"NOT starts_with({col}, 'data:')",
        f"NOT regexp_matches({col}, '{_EXOTIC_WS_RE}')",
        f"len(regexp_extract_all({col}, '{_TAGISH_SPLIT_RE}')) >= 3",
        f"NOT contains(regexp_replace({col}, '{_HTML_INV_RE}', '', 'g'), '<')",
        f"NOT contains(regexp_replace({col}, '{_HTML_INV_RE}', '', 'g'), '>')",
        f"NOT contains(regexp_replace({col}, '{_ENTITY_CLOSED_RE}', '', 'g'), '&')",
    ]
    head = (
        f"(({cnt('<head>')} = 0 AND {cnt('</head>')} = 0 AND {cnt('<title>')} = 0"
        f" AND {cnt('</title>')} = 0) OR ({cnt('<head>')} = 1 AND"
        f" {cnt('</head>')} = 1 AND {cnt('<title>')} = 1 AND {cnt('</title>')} = 1"
        f" AND regexp_matches({col}, '{_HEAD_REGION_RE}')))"
    )
    parts.append(head)
    for c in _BOILER_SIMPLE:
        parts.append(
            f"(({cnt(f'<{c}>')} = 0 AND {cnt(f'</{c}>')} = 0) OR"
            f" ({cnt(f'<{c}>')} = 1 AND {cnt(f'</{c}>')} = 1"
            f" AND regexp_matches({col}, '(?s)<{c}>.*</{c}>')))"
        )
    for a, b in combinations(_BOILER_SIMPLE, 2):
        parts.append(
            f"NOT regexp_matches({col}, '(?s)<{a}>.*<{b}>.*</{a}>.*</{b}>')"
        )
        parts.append(
            f"NOT regexp_matches({col}, '(?s)<{b}>.*<{a}>.*</{b}>.*</{a}>')"
        )
    rem = f"regexp_replace({col}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        rem = f"regexp_replace({rem}, '(?s)<{c}>.*?</{c}>', '<p>')"
    parts.append(f"NOT contains({rem}, '<a href')")
    parts.append(f"NOT contains({rem}, '</a>')")
    return "\n    AND ".join(parts)


def _html_sql(path: str) -> str:
    # transform chain on nfc-normalized text (kernel: NFC inside _norm_text
    # per fragment; tag chars are NFC starters so whole-string NFC commutes
    # with the tag split). Entity replaces are ordered so &amp; goes LAST —
    # '&amp;lt;' must become '&lt;' (Python html.unescape is single-pass).
    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    main = (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_filter_sql()}
)
SELECT conv_id, turn_idx,
       'html' AS payload_kind,
       {main} AS main_text,
       '' AS error
FROM t
"""


# --- data-URI gate: the S2 base64 loader, end-to-end -----------------------
#
# The last uncovered kernel path: ``data:<mime>;base64,`` strip + base64
# decode (reference: extract-data-from-pdf.ts:116) feeding the decoded body
# back through engine dispatch. DuckDB mirrors it with
# ``decode(from_base64(payload))`` + the html pipeline applied to the
# decoded column. Subset filter (verbatim both sides): strict base64
# charset with end-only '='-padding and length % 4 == 0 — exactly the
# domain where Python's ``b64decode(validate=True)`` and DuckDB's
# ``from_base64`` agree — and the DECODED body must pass the
# provably-simple-html filter. CAVEAT (documented, deterministic-fixture
# safe): DuckDB 1.0 has no TRY(), so a payload decoding to INVALID UTF-8
# would error the oracle instead of being excluded; such rows cannot occur
# in the deterministic transcripts fixture (data-URIs are generated from
# UTF-8), which is the only domain this SQL runs on.

_DATAURI_STRICT_RE = r"^data:[^;,]*;base64,[A-Za-z0-9+/]*={0,2}$"
_DATAURI_PREFIX_RE = r"^data:[^;,]*;base64,"


def extract_datauri_turns(sf_dir: str) -> Dataset:
    """REAL kernel over strict-base64 data-URI rows whose DECODED body is
    provably-simple html: gates prefix strip + base64 decode + dispatch +
    the html engine in one chain (S2 + M2 + M1 + A2 driver-verified)."""
    from ocr_ray.core.extract import decode_data_uri, extract_turn

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        cand = pc.is_valid(txt)
        cand = pc.and_(cand, pc.match_substring_regex(txt, _DATAURI_STRICT_RE))
        payload = pc.replace_substring_regex(txt, _DATAURI_PREFIX_RE, "")
        plen = pc.utf8_length(payload)
        cand = pc.and_(cand, pc.equal(pc.bit_wise_and(plen, 3), 0))
        cand = pc.and_(cand, pc.greater(plen, 0))
        t = t.filter(cand)
        decoded = pa.array(
            [decode_data_uri(x)[0] for x in t.column("text").to_pylist()],
            pa.string(),
        )
        t = t.filter(_provably_simple_html_mask(pa.chunked_array([decoded])))
        res = [extract_turn(x) for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx"),
                "payload_kind": pa.array([r.payload_kind for r in res], pa.string()),
                "main_text": pa.array([r.main_text for r in res], pa.string()),
                "error": pa.array([r.error for r in res], pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _datauri_sql(path: str) -> str:
    payload = f"regexp_replace(text, '{_DATAURI_PREFIX_RE}', '')"
    # the html filter re-targeted at the decoded column ("text" appears in
    # the filter SQL only as the column reference — no pattern literal
    # contains the substring; asserted to stay that way)
    html_filter_on_body = _html_filter_sql(col="body")
    s = "replace(nfc_normalize(body), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    main = (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )
    return f"""
WITH raw AS (
  SELECT conv_id, turn_idx,
         decode(from_base64({payload})) AS body
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND regexp_matches(text, '{_DATAURI_STRICT_RE}')
    AND length({payload}) % 4 = 0
    AND length({payload}) > 0
),
t AS (
  SELECT conv_id, turn_idx, body
  FROM raw
  WHERE {html_filter_on_body}
)
SELECT conv_id, turn_idx,
       'html' AS payload_kind,
       {main} AS main_text,
       '' AS error
FROM t
"""


# --- html BLOCKS gate: exploded per-block view with kinds ------------------
#
# Extends the turns gate to the block CLASSIFIER (content vs heading vs
# boilerplate) in document order. SQL technique: boiler/heading regions are
# rewritten to control-char markers at fragment edges
# (<nav>... -> '<p>'+\x01, </nav> -> \x02+'<p>'; heading tags -> \x03/\x04),
# anchor tags are REMOVED (they never flush — fragments concatenate across
# them, exactly the kernel's buf behavior), the stream splits on the
# remaining block tags, and per-fragment marker counts + a window cumsum
# reconstruct the region depths: a fragment is inside a region iff
# (sum of opens-closes over PRIOR fragments) + (opens in this fragment) > 0
# — exact because markers only ever sit at fragment edges. The blocks
# subset additionally requires properly-alternating heading tags per level
# (counts equal + two lookahead-free RE2 checks built on a
# complement-unrolled "no '</hN>' between" character class) and no literal
# \x01-\x04 in the payload.

_HEADINGS = tuple(f"h{i}" for i in range(1, 7))


def _no_seq_re(lit: str) -> str:
    """RE2 for 'any sequence not containing the literal tag ``lit``'
    (lookahead-free complement unrolling; safe here because the closed
    inventory filter guarantees no partial tag literals)."""
    inner = lit[1:-1]  # strip < >
    alts = ["[^<]"]
    for i in range(1, len(inner) + 1):
        prefix = inner[: i - 1]
        alts.append("<" + re.escape(prefix) + f"[^{re.escape(inner[i - 1])}]")
    alts.append("<" + re.escape(inner) + "[^>]")
    return "(?:" + "|".join(alts) + ")*"


def _heading_alternation_clauses() -> list[tuple[str, str, str, str]]:
    """Per heading level: (open, close, bad_open_open, bad_close_first) —
    counts equal + neither bad pattern => properly alternating pairs."""
    out = []
    for h in _HEADINGS:
        o, c = f"<{h}>", f"</{h}>"
        bad_open_open = f"(?s){re.escape(o)}{_no_seq_re(c)}{re.escape(o)}"
        bad_close_first = f"(?s)^{_no_seq_re(o)}{re.escape(c)}"
        out.append((o, c, bad_open_open, bad_close_first))
    return out


def _provably_simple_html_blocks_mask(text: pa.ChunkedArray):
    ok = _provably_simple_html_mask(text)
    ok = pc.and_(
        ok, pc.invert(pc.match_substring_regex(text, "[\\x{0001}-\\x{0004}]"))
    )
    for o, c, bad_oo, bad_cf in _heading_alternation_clauses():
        ok = pc.and_(
            ok, pc.equal(pc.count_substring(text, o), pc.count_substring(text, c))
        )
        ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, bad_oo)))
        ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, bad_cf)))
    return ok


def extract_html_blocks(sf_dir: str) -> Dataset:
    """Exploded per-BLOCK view of the html subset — gates the boilerplate
    scorer's block CLASSIFIER (content / heading / boilerplate) and the
    document-order block_idx, not just the main_text selection."""
    from ocr_ray.core.extract import extract_turn

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_simple_html_blocks_mask(t.column("text")))
        cids, tidx, bidx, kinds, texts = [], [], [], [], []
        for cid, ti, x in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("text").to_pylist(),
        ):
            for b in extract_turn(x).blocks:
                cids.append(cid)
                tidx.append(ti)
                bidx.append(b.block_idx)
                kinds.append(b.kind)
                texts.append(b.text)
        return pa.table(
            {
                "conv_id": pa.array(cids, t.schema.field("conv_id").type),
                "turn_idx": pa.array(tidx, t.schema.field("turn_idx").type),
                "block_idx": pa.array(bidx, pa.int32()),
                "kind": pa.array(kinds, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _html_blocks_filter_sql(col: str = "text") -> str:
    parts = [_html_filter_sql(col)]
    parts.append(rf"NOT regexp_matches({col}, '[\x{{0001}}-\x{{0004}}]')")
    for o, c, bad_oo, bad_cf in _heading_alternation_clauses():
        parts.append(
            f"len(regexp_extract_all({col}, '{o}')) ="
            f" len(regexp_extract_all({col}, '{c}'))"
        )
        parts.append(f"NOT regexp_matches({col}, '{bad_oo}')")
        parts.append(f"NOT regexp_matches({col}, '{bad_cf}')")
    return "\n    AND ".join(parts)


def _html_blocks_chain_sql() -> str:
    """The marker-rewrite block chain AFTER a ``t(conv_id, turn_idx, text)``
    CTE — shared by the parquet-html gate and the data-URI gate (which
    feeds the DECODED body in as ``text``)."""
    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = (
            f"regexp_replace({s}, '(?s)<{c}>(.*?)</{c}>',"
            f" '<p>' || chr(1) || '\\1' || chr(2) || '<p>')"
        )
    for h in _HEADINGS:
        s = f"replace({s}, '<{h}>', '<p>' || chr(3))"
        s = f"replace({s}, '</{h}>', chr(4) || '<p>')"
    # anchors never flush -> remove (NOT the general '</?a[^<>]*>', which
    # would also eat '<article>'); the closed inventory guarantees every
    # anchor matches exactly these two literal forms
    s = f"""regexp_replace({s}, '<a href="[^<>"&]*">', '', 'g')"""
    s = f"replace({s}, '</a>', '')"
    strip_marks = (
        "replace(replace(replace(replace(frag,"
        " chr(1), ''), chr(2), ''), chr(3), ''), chr(4), '')"
    )
    unesc = (
        f"replace(replace(replace(replace({strip_marks},"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse_frag = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    win = "PARTITION BY conv_id, turn_idx ORDER BY fi"
    return f"""st AS (
  SELECT conv_id, turn_idx, {s} AS stream FROM t
),
f AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_split_to_array(stream, '{_TAGISH_SPLIT_RE}')) AS frag,
         unnest(generate_series(1,
             len(regexp_split_to_array(stream, '{_TAGISH_SPLIT_RE}')))) AS fi
  FROM st
),
c AS (
  SELECT conv_id, turn_idx, fi,
         len(string_split(frag, chr(1))) - 1 AS n1,
         len(string_split(frag, chr(2))) - 1 AS n2,
         len(string_split(frag, chr(3))) - 1 AS n3,
         len(string_split(frag, chr(4))) - 1 AS n4,
         {collapse_frag} AS txt
  FROM f
),
d AS (
  SELECT *,
         coalesce(SUM(n1 - n2) OVER ({win}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n1 AS bdep,
         coalesce(SUM(n3 - n4) OVER ({win}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n3 AS hdep
  FROM c
)
SELECT conv_id, turn_idx,
       CAST(row_number() OVER ({win}) - 1 AS INTEGER) AS block_idx,
       CASE WHEN bdep > 0 THEN 'boilerplate'
            WHEN hdep > 0 THEN 'heading'
            ELSE 'content' END AS kind,
       txt AS text
FROM d
WHERE txt <> ''
"""


def _html_blocks_sql(path: str) -> str:
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_blocks_filter_sql()}
),
{_html_blocks_chain_sql()}"""


# ---------------------------------------------------------------------------
# provably-mirrorable PDF subset (VERDICT r2 next-step #1b)
#
# The pdf-layout engine (page split on form feed, blank-line block grouping,
# hyphenated line-break repair, repeated-first/last-line header/footer
# census, page-number regex — reference semantics the Vision
# page/block/paragraph hierarchy, extract-data-from-pdf.ts:118-131) IS
# SQL-expressible once an RE2 filter (verbatim both sides) pins the
# Python/RE2 divergence points:
#   * no exotic whitespace beyond space/\t/\n/\f -> ``splitlines`` == split
#     on \n, ``str.split()`` == collapse of [ \t];
#   * no non-ASCII decimal digits -> Python ``\d`` == RE2 ``[0-9]`` in the
#     page-number regex;
#   * any char that can start a hyphen-continuation line lies in a range
#     where Python ``str.islower()`` == RE2 ``\p{Ll}`` char-for-char
#     (ASCII printable + Latin-1/Extended + combining marks + Greek +
#     Cyrillic + kana + CJK, minus the Other_Lowercase oddballs 0345/037A
#     — the agreement is swept by pytest over every char in the class);
#     the check runs on NFC text on BOTH sides because the merge decision
#     is made post-NFC (an NFD ``e`` + combining accent composes to ``é``
#     before the kernel looks at it);
#   * routing mirrored exactly: form feed present, OR (tag count < 3 AND the
#     indent heuristic with its 200-line cap — same SQL as the green
#     ``engine_dispatch_counts`` gate).
# The dehyphenation fold is sequential but pairwise-decidable on raw lines
# (a merged line always ends with its LAST raw line's ending), so SQL
# expresses it as gaps-and-islands: merge-linked line chains concatenate
# with the trailing '-' stripped from every non-final line.
# ---------------------------------------------------------------------------

# the plain/html exotic-ws class MINUS form feed (\f is the page separator)
_PDF_EXOTIC_WS_RE = (
    r"[\x{000B}\x{000D}\x{001C}-\x{001F}\x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)
_NONBLANK_RE = r"[^ \t\n\x{000C}]"
_NONASCII_DIGIT_RE = r"\p{Nd}"
# chars after a hyphen line-break where Python islower() == RE2 \p{Ll}
# exactly (pytest-swept); a continuation starting with anything OUTSIDE
# this class keeps the row out of the provable subset
_HYPHEN_OK_CLASS = (
    r"\x{0020}-\x{007E}\x{00C0}-\x{024F}\x{0300}-\x{0344}\x{0346}-\x{036F}"
    r"\x{0370}-\x{0379}\x{037B}-\x{03FF}\x{0400}-\x{04FF}"
    r"\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}"
)
_HYPHEN_CONT_RE = rf"-[ \t]*\n[ \t]*[^{_HYPHEN_OK_CLASS}\n\x{{000C}}]"
_PAGENUM_SQL_RE = r"(?i)^(page )?[0-9]+( ?(/|of) ?[0-9]+)?$"


def _provably_simple_pdf_static_mask(text: pa.ChunkedArray):
    """The STATIC part of the pdf-subset predicate (routing is decided by
    the real ``classify_payload`` on the Ray side; its SQL mirror is the
    driver-green ``engine_dispatch_counts`` logic)."""
    ok = pc.is_valid(text)
    ok = pc.and_(ok, pc.invert(pc.starts_with(text, "data:")))
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(text, _PDF_EXOTIC_WS_RE)))
    ok = pc.and_(ok, pc.match_substring_regex(text, _NONBLANK_RE))
    no_digits = pc.replace_substring_regex(text, "[0-9]", "")
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(no_digits, _NONASCII_DIGIT_RE)))
    # the merge decision is made on NFC text, so the continuation-char
    # check runs on NFC here and in the SQL filter alike
    nfc = pc.utf8_normalize(text, form="NFC")
    ok = pc.and_(ok, pc.invert(pc.match_substring_regex(nfc, _HYPHEN_CONT_RE)))
    return ok


def _run_pdf_kernel(t: pa.Table, explode_blocks: bool) -> pa.Table:
    from ocr_ray.core.extract import extract_turn

    t = t.filter(_provably_simple_pdf_static_mask(t.column("text")))
    cids, tidx, kinds, mains, errs = [], [], [], [], []
    bcid, btid, bbi, bkind, btext = [], [], [], [], []
    for cid, ti, x in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        r = extract_turn(x)
        if r.payload_kind != "pdf":
            continue
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
            "turn_idx": pa.array(tidx, t.schema.field("turn_idx").type),
            "payload_kind": pa.array(kinds, pa.string()),
            "main_text": pa.array(mains, pa.string()),
            "error": pa.array(errs, pa.string()),
        }
    )


def extract_pdf_turns(sf_dir: str) -> Dataset:
    """REAL pdf-layout engine over the provably-mirrorable-pdf subset;
    matched value-for-value by ``_pdf_sql`` (independent DuckDB layout
    parser: page unnest, blank-line islands, dehyphenation fold,
    header/footer census, pagenum regex)."""
    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        lambda t: _run_pdf_kernel(t, explode_blocks=False), batch_format="pyarrow"
    )


def extract_pdf_blocks(sf_dir: str) -> Dataset:
    """Exploded per-BLOCK view of the pdf subset — gates the layout
    classifier itself (para vs header vs footer vs pagenum), not just the
    para selection."""
    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(
        lambda t: _run_pdf_kernel(t, explode_blocks=True), batch_format="pyarrow"
    )


def _pdf_filter_sql() -> str:
    l200 = "list_slice(string_split(text, chr(10)), 1, 200)"
    nonempty = f"len(list_filter({l200}, x -> trim(x, ' ' || chr(9)) <> ''))"
    indented = (
        f"len(list_filter({l200}, x -> regexp_matches(x, '^[ \\t]{{2,}}[^ \\t]')))"
    )
    return f"""text IS NOT NULL
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_PDF_EXOTIC_WS_RE}')
    AND regexp_matches(text, '{_NONBLANK_RE}')
    AND NOT regexp_matches(regexp_replace(text, '[0-9]', '', 'g'), '{_NONASCII_DIGIT_RE}')
    AND NOT regexp_matches(nfc_normalize(text), '{_HYPHEN_CONT_RE}')
    AND (contains(text, chr(12)) OR (
         len(regexp_extract_all(text, '{_TAGISH_SPLIT_RE}')) < 3
         AND {nonempty} >= 4
         AND {indented} * 10 >= {nonempty} * 3))"""


def _pdf_cte_sql(path: str) -> str:
    """Shared CTE chain: filtered turns -> pages -> lines -> groups with
    dehyphenated text, group index, and kind."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, nfc_normalize(text) AS txt,
         len(string_split(nfc_normalize(text), chr(12))) AS np
  FROM read_parquet('{path}/*.parquet')
  WHERE {_pdf_filter_sql()}
),
{_pdf_chain_after_t_sql()}"""


def _pdf_chain_after_t_sql() -> str:
    """The layout chain AFTER a ``t(conv_id, turn_idx, txt, np)`` CTE —
    pages -> lines -> blank-line groups -> dehyphenation islands ->
    header/footer census -> block kinds. Shared by the textual-pdf gate
    (t = filtered transcript turns) and the binary-pdf gate (t = text
    RECONSTRUCTED from uncompressed PDF content streams,
    ``pipelines/binpdf_gate.py``), mirroring how the html chain is shared
    with the data-URI gate."""
    return f"""pg AS (
  SELECT conv_id, turn_idx, np,
         unnest(string_split(txt, chr(12))) AS page,
         unnest(generate_series(1, len(string_split(txt, chr(12))))) AS page_no
  FROM t
),
ln AS (
  SELECT conv_id, turn_idx, np, page_no,
         unnest(string_split(page, chr(10))) AS raw,
         unnest(generate_series(1, len(string_split(page, chr(10))))) AS line_no
  FROM pg
),
nl AS (
  SELECT conv_id, turn_idx, np, page_no, line_no,
         trim(regexp_replace(raw, '[ \\t]+', ' ', 'g'), ' ') AS norm
  FROM ln
),
gl AS (
  SELECT *, SUM(CASE WHEN norm = '' THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id, turn_idx, page_no
                    ORDER BY line_no) AS grp
  FROM nl
),
nb AS (SELECT * FROM gl WHERE norm <> ''),
mf AS (
  SELECT *,
         CASE WHEN lag(norm) OVER w LIKE '%-'
                   AND regexp_matches(norm, '^\\p{{Ll}}')
              THEN 1 ELSE 0 END AS mflag
  FROM nb
  WINDOW w AS (PARTITION BY conv_id, turn_idx, page_no, grp ORDER BY line_no)
),
il AS (
  SELECT *,
         SUM(1 - mflag) OVER (PARTITION BY conv_id, turn_idx, page_no, grp
                              ORDER BY line_no) AS island,
         CASE WHEN lead(mflag) OVER (PARTITION BY conv_id, turn_idx, page_no, grp
                                     ORDER BY line_no) = 1
              THEN substring(norm, 1, length(norm) - 1) ELSE norm END AS keep
  FROM mf
),
isl AS (
  SELECT conv_id, turn_idx, np, page_no, grp, island,
         string_agg(keep, '' ORDER BY line_no) AS itext,
         MIN(line_no) AS i_first, COUNT(*) AS i_lines
  FROM il GROUP BY conv_id, turn_idx, np, page_no, grp, island
),
gr AS (
  SELECT conv_id, turn_idx, np, page_no, grp,
         string_agg(itext, ' ' ORDER BY i_first) AS joined,
         MIN(i_first) AS g_first, SUM(i_lines) AS n_raw
  FROM isl GROUP BY conv_id, turn_idx, np, page_no, grp
),
gx AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, turn_idx, page_no
                            ORDER BY g_first) AS g_idx,
         COUNT(*) OVER (PARTITION BY conv_id, turn_idx, page_no) AS n_groups
  FROM gr
),
pstat AS (
  SELECT conv_id, turn_idx, page_no,
         arg_min(norm, line_no) AS first_ln,
         arg_max(norm, line_no) AS last_ln,
         COUNT(*) AS n_nb
  FROM nb GROUP BY conv_id, turn_idx, page_no
),
hdr AS (
  SELECT conv_id, turn_idx, first_ln AS v
  FROM pstat GROUP BY conv_id, turn_idx, first_ln HAVING COUNT(*) >= 2
),
ftr AS (
  SELECT conv_id, turn_idx, last_ln AS v
  FROM pstat WHERE n_nb > 1
  GROUP BY conv_id, turn_idx, last_ln HAVING COUNT(*) >= 2
),
kk AS (
  SELECT gx.conv_id, gx.turn_idx, gx.page_no, gx.g_first, gx.joined,
         CASE
           WHEN gx.n_raw = 1
                AND regexp_matches(gx.joined, '{_PAGENUM_SQL_RE}')
             THEN 'pagenum'
           WHEN gx.n_raw = 1 AND gx.g_idx = 1 AND gx.np >= 2
                AND h.v IS NOT NULL
             THEN 'header'
           WHEN gx.n_raw = 1 AND gx.g_idx = gx.n_groups AND gx.np >= 2
                AND f.v IS NOT NULL
             THEN 'footer'
           ELSE 'para'
         END AS kind
  FROM gx
  LEFT JOIN hdr h ON h.conv_id = gx.conv_id AND h.turn_idx = gx.turn_idx
                 AND h.v = gx.joined
  LEFT JOIN ftr f ON f.conv_id = gx.conv_id AND f.turn_idx = gx.turn_idx
                 AND f.v = gx.joined
)"""


def _pdf_sql(path: str) -> str:
    return f"""{_pdf_cte_sql(path)}
SELECT t.conv_id, t.turn_idx,
       'pdf' AS payload_kind,
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


def _pdf_blocks_sql(path: str) -> str:
    return f"""{_pdf_cte_sql(path)}
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY page_no, g_first) - 1 AS INTEGER)
         AS block_idx,
       kind, joined AS text
FROM kk
"""


def extract_pdf_summaries(sf_dir: str) -> Dataset:
    """A5 summarizer over the PDF engine's output (third engine under the
    shared summarizer mirror): REAL kernel + REAL ``summarize_text`` over
    the pdf subset; the oracle composes the pdf layout-parse CTE chain
    with ``_summaries_tail_sql``."""
    from ocr_ray.core.extract import extract_turn
    from ocr_ray.stages.summarize import summarize_text

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    def run(t: pa.Table) -> pa.Table:
        t = t.filter(_provably_simple_pdf_static_mask(t.column("text")))
        cids, tidx, sums = [], [], []
        for cid, ti, x in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("text").to_pylist(),
        ):
            r = extract_turn(x)
            if r.payload_kind != "pdf":
                continue
            cids.append(cid)
            tidx.append(ti)
            sums.append(summarize_text(r.main_text))
        return pa.table(
            {
                "conv_id": pa.array(cids, t.schema.field("conv_id").type),
                "turn_idx": pa.array(tidx, t.schema.field("turn_idx").type),
                "summary": pa.array(sums, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _pdf_summaries_sql(path: str) -> str:
    return f"""{_pdf_cte_sql(path)}
, s AS (
  SELECT t.conv_id, t.turn_idx, coalesce(mt.main_text, '') AS main_text
  FROM t
  LEFT JOIN (
    SELECT conv_id, turn_idx,
           string_agg(joined, chr(10) || chr(10) ORDER BY page_no, g_first)
             FILTER (WHERE kind = 'para') AS main_text
    FROM kk GROUP BY conv_id, turn_idx
  ) mt ON mt.conv_id = t.conv_id AND mt.turn_idx = t.turn_idx
),
{_summaries_tail_sql()}
"""


# --- gated extraction-metrics rollup (G1/G2 on kernel output) --------------


def _metrics_union_mask(t: pa.Table):
    """Union of the three engine subsets (plain | html-blocks | pdf), the
    provably-mirrorable metrics domain. Masks are mutually exclusive by
    construction (plain forbids '<' and indent-fire; html needs >=3 tags
    and no form feed; the pdf route needs a form feed or the indent
    heuristic with <3 tags)."""
    from ocr_ray.core.extract import classify_payload

    txt = t.column("text")
    m_plain = _provably_plain_mask(txt)
    m_html = _provably_simple_html_blocks_mask(txt)
    m_pdf_static = _provably_simple_pdf_static_mask(txt)
    pdf_flags = []
    static_np = m_pdf_static.to_pylist() if hasattr(m_pdf_static, "to_pylist") else list(m_pdf_static)
    texts = txt.to_pylist()
    for ok, x in zip(static_np, texts):
        pdf_flags.append(bool(ok) and classify_payload(x) == "pdf")
    m_pdf = pa.array(pdf_flags)
    ok = pc.or_kleene(pc.fill_null(m_plain, False), pc.fill_null(m_html, False))
    return pc.or_kleene(ok, m_pdf)


def extract_metrics_gated(sf_dir: str) -> pa.Table:
    """The REAL ``extraction_metrics`` rollup (per-payload-kind rows /
    bytes_in / n_blocks / n_errors — the lineage sidecar, G1/G2) over the
    union of the provably-mirrorable subsets; the oracle reproduces every
    cell from the three engine mirrors (paragraph counts for plain, the
    marker-stream block count for html, the layout-group count for pdf,
    the empty-input error rule)."""
    from ocr_ray.pipelines.extract_pipeline import extract_dataset
    from ocr_ray.state.metrics import extraction_metrics

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    filtered = ds.map_batches(
        lambda t: t.filter(_metrics_union_mask(t)), batch_format="pyarrow"
    )
    return extraction_metrics(extract_dataset(filtered))


def _metrics_gated_sql(path: str) -> str:
    collapse = r"trim(regexp_replace(x, '[ \t\n]+', ' ', 'g'))"
    norm_all = r"trim(regexp_replace(text, '[ \t\n]+', ' ', 'g'))"
    n_paras = (
        "len(list_filter(list_transform("
        "regexp_split_to_array(nfc_normalize(text), '\n[ \t]*\n'),"
        f" x -> {collapse}), x -> x <> ''))"
    )
    plain_filter = f"""text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')"""
    return f"""
WITH plain_rows AS (
  SELECT strlen(text) AS b, {n_paras} AS nb,
         CASE WHEN {norm_all} = '' THEN 1 ELSE 0 END AS ne
  FROM read_parquet('{path}/*.parquet')
  WHERE {plain_filter}
),
html_rows AS (
  SELECT strlen(text) AS b
  FROM read_parquet('{path}/*.parquet')
  WHERE {_html_blocks_filter_sql()}
),
html_blocks AS (SELECT COUNT(*) AS nb FROM ({_html_blocks_sql(path)})),
pdf_rows AS (
  SELECT strlen(text) AS b
  FROM read_parquet('{path}/*.parquet')
  WHERE {_pdf_filter_sql()}
),
pdf_blocks AS (SELECT COUNT(*) AS nb FROM ({_pdf_blocks_sql(path)}))
SELECT * FROM (
  SELECT 'plain' AS payload_kind,
         CAST(COUNT(*) AS BIGINT) AS rows,
         CAST(coalesce(SUM(b), 0) AS BIGINT) AS bytes_in,
         CAST(coalesce(SUM(nb), 0) AS BIGINT) AS n_blocks,
         CAST(coalesce(SUM(ne), 0) AS BIGINT) AS n_errors
  FROM plain_rows
  UNION ALL
  SELECT 'html',
         CAST((SELECT COUNT(*) FROM html_rows) AS BIGINT),
         CAST((SELECT coalesce(SUM(b), 0) FROM html_rows) AS BIGINT),
         CAST((SELECT nb FROM html_blocks) AS BIGINT),
         CAST(0 AS BIGINT)
  UNION ALL
  SELECT 'pdf',
         CAST((SELECT COUNT(*) FROM pdf_rows) AS BIGINT),
         CAST((SELECT coalesce(SUM(b), 0) FROM pdf_rows) AS BIGINT),
         CAST((SELECT nb FROM pdf_blocks) AS BIGINT),
         CAST(0 AS BIGINT)
)
ORDER BY payload_kind
"""


_SPAN_SEP_RE = re.compile(r"\n[ \t]*\n")
_SPAN_WS = " \t\n"


def _plain_spans_table(t: pa.Table) -> pa.Table:
    """Per-block SOURCE char-offset spans for the provably-plain subset.

    The north rule's "extracted text/spans per turn": each emitted block
    carries ``[span_start, span_end)`` char offsets into the RAW payload
    such that ``_norm_text(raw[span_start:span_end]) == text`` and the
    span is trimmed to its non-whitespace core. Trimming makes the span
    independent of how separator whitespace is apportioned, so the RE2
    split convention here provably yields the same nonempty blocks (idx,
    text, span) as the kernel's greedy ``\\n\\s*\\n`` split — within the
    subset both separators consume only ``[ \\t\\n]`` runs and every RE2
    separator lies inside a kernel separator region (pinned by pytest
    against the kernel's blocks).
    """
    from ocr_ray.core.extract import _norm_text

    t = t.filter(_provably_plain_mask(t.column("text")))
    cids, tids, bidx, starts, ends, texts = [], [], [], [], [], []
    for cid, ti, raw in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        pos = 0
        b = 0
        bounds = [m.span() for m in _SPAN_SEP_RE.finditer(raw)] + [(len(raw), len(raw))]
        for s_start, s_end in bounds:
            seg = raw[pos:s_start]
            seg_off = pos
            pos = s_end
            norm = _norm_text(seg)
            if not norm:
                continue
            lead = len(seg) - len(seg.lstrip(_SPAN_WS))
            cids.append(cid)
            tids.append(ti)
            bidx.append(b)
            starts.append(seg_off + lead)
            ends.append(seg_off + len(seg.rstrip(_SPAN_WS)))
            texts.append(norm)
            b += 1
    return pa.table(
        {
            "conv_id": pa.array(cids, t.schema.field("conv_id").type),
            "turn_idx": pa.array(tids, t.schema.field("turn_idx").type),
            "block_idx": pa.array(bidx, pa.int32()),
            "span_start": pa.array(starts, pa.int64()),
            "span_end": pa.array(ends, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def extract_plain_spans(sf_dir: str) -> Dataset:
    """Block spans (source char offsets) over the provably-plain subset;
    mirrored by ``_plain_spans_sql`` (zipped part/separator unnests with a
    window cumsum over RAW char lengths)."""
    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(_plain_spans_table, batch_format="pyarrow")


def _plain_spans_sql(path: str) -> str:
    # offsets are computed on the RAW text (length() = chars, same as
    # Python len); content goes through the same nfc+collapse chain as the
    # plain blocks mirror — NFC commutes with the split because the
    # separators are ASCII newlines, which never participate in
    # canonical composition.
    collapse = r"trim(regexp_replace(nfc_normalize(part), '[ \t\n]+', ' ', 'g'))"
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND NOT contains(text, '<')
    AND NOT starts_with(text, 'data:')
    AND NOT regexp_matches(text, '{_INDENT_RE}')
    AND NOT regexp_matches(text, '{_EXOTIC_WS_RE}')
),
p AS (
  SELECT conv_id, turn_idx,
         regexp_split_to_array(text, '\n[ \t]*\n') AS parts,
         regexp_extract_all(text, '\n[ \t]*\n') AS seps
  FROM t
),
z AS (
  SELECT conv_id, turn_idx,
         unnest(range(len(parts))) AS i,
         unnest(parts) AS part,
         parts, seps
  FROM p
),
zz AS (
  SELECT conv_id, turn_idx, i, part,
         length(part) AS plen,
         coalesce(length(seps[CAST(i AS INTEGER) + 1]), 0) AS slen
  FROM z
),
c AS (
  SELECT conv_id, turn_idx, i, part,
         coalesce(SUM(plen + slen) OVER (
             PARTITION BY conv_id, turn_idx ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_start
  FROM zz
)
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY i) - 1
            AS INTEGER) AS block_idx,
       CAST(seg_start + length(regexp_extract(part, '^[ \t\n]*')) AS BIGINT)
         AS span_start,
       CAST(seg_start + length(rtrim(part, ' ' || chr(9) || chr(10))) AS BIGINT)
         AS span_end,
       {collapse} AS text
FROM c
WHERE {collapse} <> ''
"""


def _pdf_spans_table(t: pa.Table) -> pa.Table:
    """Covering source spans for pdf-layout blocks: ``[span_start,
    span_end)`` char offsets into the RAW payload from the first
    contributing line's first non-ws char to the last line's core end.

    Unlike plain spans, the content is NOT a norm-roundtrip of the span
    (dehyphenation removes chars; lines join with single spaces) — the
    contract is the covering span plus ``text`` equal to the kernel's
    block text. Offsets are raw-text chars; page/line boundaries (\\f,
    \\n) are NFC-stable, so the raw scan sees the kernel's exact line
    structure (pinned by pytest against the kernel's blocks)."""
    from ocr_ray.core.extract import _dehyphenate_join, classify_payload

    t = t.filter(_provably_simple_pdf_static_mask(t.column("text")))
    cids, tids, bidx, ss, ee, txts = [], [], [], [], [], []
    for cid, ti, raw in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        if classify_payload(raw) != "pdf":
            continue
        b = 0
        off = 0
        for page in raw.split("\f"):
            loff = off
            off += len(page) + 1
            groups = []  # (lines, span_start, span_end)
            cur = None
            for ln in page.split("\n"):
                l_off = loff
                loff += len(ln) + 1
                if ln.strip(" \t"):
                    s = l_off + (len(ln) - len(ln.lstrip(" \t")))
                    e = l_off + len(ln.rstrip(" \t"))
                    cur = ([ln], s, e) if cur is None else (cur[0] + [ln], cur[1], e)
                elif cur is not None:
                    groups.append(cur)
                    cur = None
            if cur is not None:
                groups.append(cur)
            for lines, s, e in groups:
                joined = _dehyphenate_join(lines)
                if not joined:
                    continue
                cids.append(cid)
                tids.append(ti)
                bidx.append(b)
                ss.append(s)
                ee.append(e)
                txts.append(joined)
                b += 1
    return pa.table(
        {
            "conv_id": pa.array(cids, t.schema.field("conv_id").type),
            "turn_idx": pa.array(tids, t.schema.field("turn_idx").type),
            "block_idx": pa.array(bidx, pa.int32()),
            "span_start": pa.array(ss, pa.int64()),
            "span_end": pa.array(ee, pa.int64()),
            "text": pa.array(txts, pa.string()),
        }
    )


def extract_pdf_spans(sf_dir: str) -> Dataset:
    """Block covering-spans over the provably-simple-pdf subset; mirrored
    by ``_pdf_spans_sql`` (raw-text page/line offset cumsums zipped with
    the NFC layout parse)."""
    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(_pdf_spans_table, batch_format="pyarrow")


def _pdf_spans_sql(path: str) -> str:
    # Offsets accumulate RAW char lengths (+1 per \n / \f separator);
    # line content normalizes per line (NFC commutes with the ASCII
    # page/line splits). The dehyphenation fold is the blocks mirror's
    # gaps-and-islands chain, re-derived here over the offset-carrying
    # line stream.
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text AS raw
  FROM read_parquet('{path}/*.parquet')
  WHERE {_pdf_filter_sql()}
),
pg AS (
  SELECT conv_id, turn_idx,
         unnest(string_split(raw, chr(12))) AS page,
         unnest(generate_series(1, len(string_split(raw, chr(12))))) AS page_no
  FROM t
),
pgo AS (
  SELECT *, coalesce(SUM(length(page) + 1) OVER (
              PARTITION BY conv_id, turn_idx ORDER BY page_no
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS page_off
  FROM pg
),
ln AS (
  SELECT conv_id, turn_idx, page_no, page_off,
         unnest(string_split(page, chr(10))) AS rawln,
         unnest(generate_series(1, len(string_split(page, chr(10))))) AS line_no
  FROM pgo
),
lno AS (
  SELECT *,
         page_off + coalesce(SUM(length(rawln) + 1) OVER (
             PARTITION BY conv_id, turn_idx, page_no ORDER BY line_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS line_off,
         trim(regexp_replace(nfc_normalize(rawln), '[ \t]+', ' ', 'g'), ' ') AS norm
  FROM ln
),
gl AS (
  SELECT *, SUM(CASE WHEN norm = '' THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id, turn_idx, page_no
                    ORDER BY line_no) AS grp
  FROM lno
),
nb AS (SELECT * FROM gl WHERE norm <> ''),
mf AS (
  SELECT *,
         CASE WHEN lag(norm) OVER w LIKE '%-'
                   AND regexp_matches(norm, '^\\p{{Ll}}')
              THEN 1 ELSE 0 END AS mflag
  FROM nb
  WINDOW w AS (PARTITION BY conv_id, turn_idx, page_no, grp ORDER BY line_no)
),
il AS (
  SELECT *,
         SUM(1 - mflag) OVER (PARTITION BY conv_id, turn_idx, page_no, grp
                              ORDER BY line_no) AS island,
         CASE WHEN lead(mflag) OVER (PARTITION BY conv_id, turn_idx, page_no, grp
                                     ORDER BY line_no) = 1
              THEN substring(norm, 1, length(norm) - 1) ELSE norm END AS keep
  FROM mf
),
isl AS (
  SELECT conv_id, turn_idx, page_no, grp, island,
         string_agg(keep, '' ORDER BY line_no) AS itext,
         MIN(line_no) AS i_first
  FROM il GROUP BY conv_id, turn_idx, page_no, grp, island
),
gr AS (
  SELECT conv_id, turn_idx, page_no, grp,
         string_agg(itext, ' ' ORDER BY i_first) AS joined,
         MIN(i_first) AS g_first
  FROM isl GROUP BY conv_id, turn_idx, page_no, grp
),
gsp AS (
  SELECT conv_id, turn_idx, page_no, grp,
         MIN(line_off + length(regexp_extract(rawln, '^[ \t]*'))) AS span_start,
         MAX(line_off + length(rtrim(rawln, ' ' || chr(9)))) AS span_end
  FROM nb GROUP BY conv_id, turn_idx, page_no, grp
)
SELECT gr.conv_id, gr.turn_idx,
       CAST(row_number() OVER (PARTITION BY gr.conv_id, gr.turn_idx
                               ORDER BY gr.page_no, gr.g_first) - 1
            AS INTEGER) AS block_idx,
       CAST(gsp.span_start AS BIGINT) AS span_start,
       CAST(gsp.span_end AS BIGINT) AS span_end,
       gr.joined AS text
FROM gr
JOIN gsp ON gsp.conv_id = gr.conv_id AND gsp.turn_idx = gr.turn_idx
        AND gsp.page_no = gr.page_no AND gsp.grp = gr.grp
"""


def _html_spans_rows(doc: str):
    """Offset-tracking replay of the html kernel: same control flow as
    ``core.extract._extract_html`` with per-block covering spans.

    The kernel's comment/script pre-substitution is replaced by
    EQUAL-LENGTH space padding, which preserves every char offset while
    producing identical block TEXT (padding is whitespace, which the
    per-fragment normalization collapses exactly like the kernel's single
    space). Block KIND depends on the link-density char counts, which the
    kernel computes on fragments where each comment/script run is a
    SINGLE space — so the padded intervals are recorded and each
    fragment's count is taken on a kernel-equivalent copy with every
    padded run collapsed back to one space (a padded run never spans a
    fragment boundary: it contains no ``<``/``>``). Yields
    ``(block_idx, kind, span_start, span_end, text)`` with offsets into
    the engine's input document (the decoded body for data-URI payloads);
    spans run from the first contributing fragment's first non-ws char to
    the last one's core end. No SQL mirror exists (positional regex is
    not expressible in DuckDB) — parity vs the kernel's blocks is pinned
    by pytest instead.
    """
    from bisect import bisect_left

    from ocr_ray.core.extract import (
        _BLOCK_ELEMS,
        _BOILER_ELEMS,
        _COMMENT_RE,
        _DROP_ELEMS,
        _HEADING_ELEMS,
        _MIN_CONTENT_CHARS,
        _SCRIPTLIKE_RE,
        _TAG_WITH_NAME_RE,
        _norm_text,
    )
    import html as _html

    marks: list[tuple[int, int]] = []  # padded [s, e) intervals, doc coords

    def pad(m):
        marks.append(m.span())
        return " " * (m.end() - m.start())

    # equal-length substitution preserves coordinates, so both passes
    # record intervals in the same (document) coordinate system
    text = _COMMENT_RE.sub(pad, doc)
    n_comment = len(marks)
    text = _SCRIPTLIKE_RE.sub(pad, text)
    # kernel order: comments -> single space, then scriptlike -> single
    # space on the result; a comment interval inside a scriptlike match is
    # subsumed by the scriptlike's one space, so drop contained ones
    script_marks = marks[n_comment:]
    if script_marks:
        merged = [
            c
            for c in marks[:n_comment]
            if not any(s <= c[0] and c[1] <= e for s, e in script_marks)
        ]
        merged.extend(script_marks)
        merged.sort()
        marks = merged
    mark_starts = [s for s, _ in marks]

    def kernel_strip_len(frag: str, frag_off: int) -> int:
        """len(plain.strip()) the kernel would see for this fragment:
        each padded run inside collapses to exactly one space."""
        end = frag_off + len(frag)
        i = bisect_left(mark_starts, frag_off)
        if i >= len(marks) or marks[i][0] >= end:
            kfrag = frag
        else:
            parts = []
            cur = frag_off
            while i < len(marks) and marks[i][0] < end:
                s, e = marks[i]
                parts.append(frag[cur - frag_off : s - frag_off])
                parts.append(" ")
                cur = e
                i += 1
            parts.append(frag[cur - frag_off :])
            kfrag = "".join(parts)
        if "&" in kfrag:
            kfrag = _html.unescape(kfrag)
        return len(kfrag.strip())

    out = []
    buf: list[str] = []
    span_lo = span_hi = -1
    link_chars = 0
    total_chars = 0
    a_depth = 0
    boiler_depth = 0
    drop_depth = 0
    heading_depth = 0
    block_boiler = False
    block_heading = False

    def flush() -> None:
        nonlocal buf, link_chars, total_chars, block_boiler, block_heading
        nonlocal span_lo, span_hi
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
            out.append((len(out), kind, span_lo, span_hi, txt))
        buf = []
        span_lo = span_hi = -1
        link_chars = 0
        total_chars = 0
        block_boiler = boiler_depth > 0
        block_heading = heading_depth > 0

    def feed(frag: str, frag_off: int) -> None:
        nonlocal link_chars, total_chars, span_lo, span_hi
        plain = _html.unescape(frag) if "&" in frag else frag
        buf.append(plain)
        n = kernel_strip_len(frag, frag_off)
        total_chars += n
        if a_depth > 0:
            link_chars += n
        if frag.strip():
            lead = len(frag) - len(frag.lstrip())
            if span_lo < 0:
                span_lo = frag_off + lead
            span_hi = frag_off + len(frag.rstrip())

    pos = 0
    for m in _TAG_WITH_NAME_RE.finditer(text):
        frag, frag_off = text[pos : m.start()], pos
        pos = m.end()
        if frag and drop_depth == 0:
            feed(frag, frag_off)
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
                heading_depth = (
                    max(0, heading_depth - 1) if closing else heading_depth + 1
                )
            block_boiler = boiler_depth > 0
            block_heading = heading_depth > 0
    tail = text[pos:]
    if tail and drop_depth == 0:
        feed(tail, pos)
    flush()
    return out


def _html_spans_table(t: pa.Table) -> pa.Table:
    """Per-block covering spans for every html-classified turn (full html
    route, no subset restriction — this op is kernel-pinned, not
    SQL-gated)."""
    from ocr_ray.core.extract import classify_payload, decode_data_uri

    cids, tids, bidx, kinds, ss, ee, txts = [], [], [], [], [], [], []
    for cid, ti, raw in zip(
        t.column("conv_id").to_pylist(),
        t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist(),
    ):
        if raw is None:
            continue
        doc, err = decode_data_uri(raw)
        if err or classify_payload(doc) != "html":
            continue
        for b, kind, s, e, txt in _html_spans_rows(doc):
            cids.append(cid)
            tids.append(ti)
            bidx.append(b)
            kinds.append(kind)
            ss.append(s)
            ee.append(e)
            txts.append(txt)
    return pa.table(
        {
            "conv_id": pa.array(cids, t.schema.field("conv_id").type),
            "turn_idx": pa.array(tids, t.schema.field("turn_idx").type),
            "block_idx": pa.array(bidx, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "span_start": pa.array(ss, pa.int64()),
            "span_end": pa.array(ee, pa.int64()),
            "text": pa.array(txts, pa.string()),
        }
    )


def extract_html_spans(sf_dir: str) -> Dataset:
    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(_html_spans_table, batch_format="pyarrow")


def extract_records_gated(sf_dir: str) -> Dataset:
    """The canonical typed-record derivation (``stages/records.py`` — the
    reference's zod-enforced record with M4 canonical defaults,
    pdf-data-schema.ts via extract-data-from-pdf.ts:43,:87-91) over the
    union of the provably-mirrorable subsets; every field — title arg-min,
    doc_no parse-or-0, item/heading counts, word count, error — reproduced
    by ``_records_gated_sql`` from the three engine mirrors."""
    from ocr_ray.pipelines.extract_pipeline import extract_dataset
    from ocr_ray.stages.records import records_from_extracted

    path = _transcripts(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role", "text"])
    filtered = ds.map_batches(
        lambda t: t.filter(_metrics_union_mask(t)), batch_format="pyarrow"
    )
    return extract_dataset(filtered).map_batches(
        records_from_extracted, batch_format="pyarrow"
    )


def _records_gated_sql(path: str) -> str:
    # main_text within the subsets contains only single spaces and \n\n
    # joins (the kernel's _norm_text collapse), so whitespace tokens are
    # exactly the [^ \n]+ runs; title digits parse identically under RE2
    # leftmost-first on both sides; CAST of a leading-zero run matches
    # Python int() (e.g. '0042' -> 42).
    words = r"CAST(len(regexp_extract_all(t.main_text, '[^ \n]+')) AS BIGINT)"
    return f"""
WITH turns AS (
  SELECT * FROM ({_plain_sql(path)})
  UNION ALL SELECT * FROM ({_html_sql(path)})
  UNION ALL SELECT * FROM ({_pdf_sql(path)})
),
blk AS (
  SELECT * FROM ({_plain_blocks_sql(path)})
  UNION ALL SELECT * FROM ({_html_blocks_sql(path)})
  UNION ALL SELECT * FROM ({_pdf_blocks_sql(path)})
),
agg AS (
  SELECT conv_id, turn_idx,
         coalesce(arg_min(text, block_idx)
                    FILTER (WHERE kind IN ('heading', 'header')), '') AS title,
         COUNT(*) FILTER (WHERE kind IN ('content', 'para')) AS n_items,
         COUNT(*) FILTER (WHERE kind IN ('heading', 'header')) AS n_headings
  FROM blk GROUP BY conv_id, turn_idx
)
SELECT t.conv_id, t.turn_idx, t.payload_kind,
       coalesce(a.title, '') AS title,
       coalesce(CAST(nullif(regexp_extract(coalesce(a.title, ''), '[0-9]{{1,18}}'), '')
                     AS BIGINT), 0) AS doc_no,
       CAST(coalesce(a.n_items, 0) AS INTEGER) AS n_items,
       CAST(coalesce(a.n_headings, 0) AS INTEGER) AS n_headings,
       {words} AS n_words,
       t.error
FROM turns t
LEFT JOIN agg a ON a.conv_id = t.conv_id AND a.turn_idx = t.turn_idx
"""


def extract_turn_counts(sf_dir: str) -> pa.Table:
    """Totality invariant: the kernel emits EXACTLY one output row per input
    row (empty/undecodable payloads become error rows, never drops)."""
    from ocr_ray.pipelines.extract_pipeline import extract_from_path

    path = _transcripts(sf_dir)
    n = extract_from_path(path).count()
    return pa.table({"n_turns": pa.array([n], pa.int64())})


def _counts_sql(path: str) -> str:
    return f"SELECT CAST(COUNT(*) AS BIGINT) AS n_turns FROM read_parquet('{path}/*.parquet')"


# ---------------------------------------------------------------------------
# FULL-CORPUS flagship gates (VERDICT r3 next-step #1): the production ops
# ``extract_turns`` / ``extract_blocks`` / ``extract_summaries`` /
# ``dialogue_pairs`` gated BY NAME.  Technique: the four engine mirrors
# (plain / html / pdf / data-URI) now cover EVERY payload class the
# deterministic transcripts generator emits — their masks partition the
# corpus (disjoint by construction: the plain mask excludes '<'/indent/
# form-feed, the html mask requires >=3 simple tags and no form feed, the
# pdf filter requires form feed or the indent heuristic with <3 tags, the
# data-URI mask requires the 'data:' prefix all others exclude) — so the
# full-corpus op is the UNION ALL of the engine mirrors, joined back to
# the raw table for role/bytes_in and to the blocks union for n_blocks.
# A payload outside every subset would show up as a ROW-COUNT mismatch at
# the driver, so totality itself is part of the gate.
# ---------------------------------------------------------------------------


def _html_main_expr() -> str:
    """The html main_text expression over a ``text`` column (NFC -> drop
    doctype/head/boiler -> tag split -> unescape -> collapse -> join)."""
    s = "replace(nfc_normalize(text), '<!DOCTYPE html>', '')"
    s = f"regexp_replace({s}, '{_HEAD_REGION_RE}', '<p>')"
    for c in _BOILER_SIMPLE:
        s = f"regexp_replace({s}, '(?s)<{c}>.*?</{c}>', '<p>')"
    unesc = (
        "replace(replace(replace(replace(x,"
        " '&lt;', '<'), '&gt;', '>'), '&#233;', " + "chr(233)), '&amp;', '&')"
    )
    collapse = f"trim(regexp_replace({unesc}, '[ \\t\\n]+', ' ', 'g'))"
    return (
        "array_to_string(list_filter(list_transform("
        f"regexp_split_to_array({s}, '{_TAGISH_SPLIT_RE}'),"
        f" x -> {collapse}), x -> x <> ''), chr(10) || chr(10))"
    )


def _datauri_t_cte_sql(path: str, blocks: bool = False) -> str:
    """``raw`` + ``t`` CTE bodies exposing each strict-base64 data-URI row's
    DECODED body as ``t.text`` (so the html chain SQL applies verbatim);
    ``blocks=True`` applies the stricter html-blocks filter."""
    payload = f"regexp_replace(text, '{_DATAURI_PREFIX_RE}', '')"
    filt = _html_blocks_filter_sql(col="body") if blocks else _html_filter_sql(col="body")
    return f"""raw AS (
  SELECT conv_id, turn_idx,
         decode(from_base64({payload})) AS body
  FROM read_parquet('{path}/*.parquet')
  WHERE text IS NOT NULL
    AND regexp_matches(text, '{_DATAURI_STRICT_RE}')
    AND length({payload}) % 4 = 0
    AND length({payload}) > 0
),
t AS (
  SELECT conv_id, turn_idx, body AS text FROM raw WHERE {filt}
)"""


def _datauri_blocks_sql(path: str) -> str:
    return f"WITH {_datauri_t_cte_sql(path, blocks=True)},\n{_html_blocks_chain_sql()}"


def _datauri_summaries_sql(path: str) -> str:
    return f"""
WITH {_datauri_t_cte_sql(path)},
s AS (
  SELECT conv_id, turn_idx, {_html_main_expr()} AS main_text FROM t
),
{_summaries_tail_sql()}
"""


def _turns_union_sql(path: str) -> str:
    """(conv_id, turn_idx, payload_kind, main_text, error) for EVERY turn:
    the four engine mirrors unioned (disjoint + total, see section note)."""
    return f"""
  SELECT * FROM ({_plain_sql(path)})
  UNION ALL SELECT * FROM ({_html_sql(path)})
  UNION ALL SELECT * FROM ({_pdf_sql(path)})
  UNION ALL SELECT * FROM ({_datauri_sql(path)})
"""


def _blocks_union_sql(path: str) -> str:
    """(conv_id, turn_idx, payload_kind, block_idx, kind, text) for every
    REAL block of every turn (placeholders for blockless turns are added
    by ``_blocks_full_sql``)."""
    return f"""
  SELECT conv_id, turn_idx, 'plain' AS payload_kind, block_idx, kind, text
  FROM ({_plain_blocks_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'html', block_idx, kind, text
  FROM ({_html_blocks_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'pdf', block_idx, kind, text
  FROM ({_pdf_blocks_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'html', block_idx, kind, text
  FROM ({_datauri_blocks_sql(path)})
"""


def _turns_full_sql(path: str) -> str:
    """Oracle for the flagship ``extract_turns`` (full corpus, by name)."""
    return f"""
WITH u AS ({_turns_union_sql(path)}),
blk AS ({_blocks_union_sql(path)}),
nb AS (
  SELECT conv_id, turn_idx, COUNT(*) AS n FROM blk GROUP BY conv_id, turn_idx
),
raw AS (
  SELECT conv_id, turn_idx, role, CAST(strlen(text) AS BIGINT) AS bytes_in
  FROM read_parquet('{path}/*.parquet')
)
SELECT u.conv_id, u.turn_idx, r.role, u.payload_kind, u.main_text,
       CAST(coalesce(nb.n, 0) AS INTEGER) AS n_blocks, u.error, r.bytes_in
FROM u
JOIN raw r ON r.conv_id = u.conv_id AND r.turn_idx = u.turn_idx
LEFT JOIN nb ON nb.conv_id = u.conv_id AND nb.turn_idx = u.turn_idx
"""


def _blocks_full_sql(path: str) -> str:
    """Oracle for ``extract_blocks`` (full corpus): every real block plus
    the ``block_idx=-1`` placeholder row for blockless turns (the
    empty-présences placeholder, save-to-google-sheet.ts:208-215)."""
    return f"""
WITH b AS ({_blocks_union_sql(path)}),
u AS ({_turns_union_sql(path)}),
ph AS (
  SELECT u.conv_id, u.turn_idx, u.payload_kind,
         CAST(-1 AS INTEGER) AS block_idx, '' AS kind, '' AS text
  FROM u
  LEFT JOIN (SELECT DISTINCT conv_id, turn_idx FROM b) bb
    ON bb.conv_id = u.conv_id AND bb.turn_idx = u.turn_idx
  WHERE bb.conv_id IS NULL
)
SELECT * FROM b UNION ALL SELECT * FROM ph
"""


def _summaries_full_sql(path: str) -> str:
    """Oracle for ``extract_summaries`` (full corpus): the A5 summarizer
    mirror over each engine branch."""
    return f"""
  SELECT conv_id, turn_idx, 'plain' AS payload_kind, summary
  FROM ({_plain_summaries_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'html', summary
  FROM ({_html_summaries_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'pdf', summary
  FROM ({_pdf_summaries_sql(path)})
  UNION ALL
  SELECT conv_id, turn_idx, 'html', summary
  FROM ({_datauri_summaries_sql(path)})
"""


def _records_full_sql(path: str) -> str:
    """Oracle for ``extract_records`` (full corpus): ``_records_gated_sql``
    extended with the data-URI branch — the union is now total."""
    words = r"CAST(len(regexp_extract_all(t.main_text, '[^ \n]+')) AS BIGINT)"
    return f"""
WITH turns AS ({_turns_union_sql(path)}),
blk AS ({_blocks_union_sql(path)}),
agg AS (
  SELECT conv_id, turn_idx,
         coalesce(arg_min(text, block_idx)
                    FILTER (WHERE kind IN ('heading', 'header')), '') AS title,
         COUNT(*) FILTER (WHERE kind IN ('content', 'para')) AS n_items,
         COUNT(*) FILTER (WHERE kind IN ('heading', 'header')) AS n_headings
  FROM blk GROUP BY conv_id, turn_idx
)
SELECT t.conv_id, t.turn_idx, t.payload_kind,
       coalesce(a.title, '') AS title,
       coalesce(CAST(nullif(regexp_extract(coalesce(a.title, ''), '[0-9]{{1,18}}'), '')
                     AS BIGINT), 0) AS doc_no,
       CAST(coalesce(a.n_items, 0) AS INTEGER) AS n_items,
       CAST(coalesce(a.n_headings, 0) AS INTEGER) AS n_headings,
       {words} AS n_words,
       t.error
FROM turns t
LEFT JOIN agg a ON a.conv_id = t.conv_id AND a.turn_idx = t.turn_idx
"""


def _metrics_full_sql(path: str) -> str:
    """Oracle for ``extract_metrics`` (full corpus): the per-payload-kind
    lineage rollup over every row — bytes_in is the RAW payload's byte
    length (a data-URI row's bytes count under 'html', its routed kind)."""
    return f"""
WITH u AS ({_turns_union_sql(path)}),
raw AS (
  SELECT conv_id, turn_idx, CAST(strlen(text) AS BIGINT) AS b
  FROM read_parquet('{path}/*.parquet')
),
bc AS (
  SELECT payload_kind, CAST(COUNT(*) AS BIGINT) AS nb
  FROM ({_blocks_union_sql(path)}) GROUP BY payload_kind
)
SELECT u.payload_kind,
       CAST(COUNT(*) AS BIGINT) AS rows,
       CAST(coalesce(SUM(r.b), 0) AS BIGINT) AS bytes_in,
       CAST(coalesce(MIN(bc.nb), 0) AS BIGINT) AS n_blocks,
       CAST(coalesce(SUM(CASE WHEN u.error <> '' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_errors
FROM u
JOIN raw r ON r.conv_id = u.conv_id AND r.turn_idx = u.turn_idx
LEFT JOIN bc ON bc.payload_kind = u.payload_kind
GROUP BY u.payload_kind
"""


def _spans_full_sql(sf_dir: str) -> str:
    """Oracle for ``extract_spans`` (full corpus): reads back the committed
    INDEPENDENT span oracle (``ocr_ray.oracle_spans`` — stdlib HTMLParser
    walker + offset maps, no kernel code) — the golden-file read-back
    pattern (VERDICT r3 #4). Generated at SQL-build time, pure Python."""
    from ocr_ray.oracle_spans import ensure_golden_spans
    from ocr_ray.sources.transcripts import n_convs_for_sf

    g = ensure_golden_spans(n_convs_for_sf(sf_dir))
    return f"""
SELECT conv_id, turn_idx, payload_kind, block_idx, kind,
       span_start, span_end, text
FROM read_parquet('{g}/golden.parquet')
"""


def _html_spans_full_sql(sf_dir: str) -> str:
    """Oracle for ``extract_html_spans``: the html slice (raw html rows AND
    decoded data-URI bodies, which route html) of the independent oracle."""
    from ocr_ray.oracle_spans import ensure_golden_spans
    from ocr_ray.sources.transcripts import n_convs_for_sf

    g = ensure_golden_spans(n_convs_for_sf(sf_dir))
    return f"""
SELECT conv_id, turn_idx, block_idx, kind, span_start, span_end, text
FROM read_parquet('{g}/golden.parquet')
WHERE payload_kind = 'html'
"""


def _clean_corpus_full_sql(path: str) -> str:
    """Oracle for ``clean_corpus`` (full corpus): extraction union ->
    quality gate (error-free, >=50 chars) -> exact dedup (min-uid winner
    per identical main_text — same equivalence classes as the pipeline's
    sha256 grouping) -> generated stopword lang-ID -> token count."""
    from ocr_ray.ops.textstats import _lang_id_sql
    from ocr_ray.pipelines.training_data import MIN_CHARS

    scored = _lang_id_sql(
        source="surv",
        id_cols="conv_id, turn_idx, payload_kind, main_text",
        text_col="main_text",
    )
    return f"""
WITH u AS ({_turns_union_sql(path)}),
gated AS (
  SELECT conv_id, turn_idx, payload_kind, main_text,
         conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 10, '0') AS uid
  FROM u WHERE error = '' AND length(main_text) >= {MIN_CHARS}
),
win AS (
  SELECT main_text, MIN(uid) AS wuid FROM gated GROUP BY main_text
),
surv AS (
  SELECT g.conv_id, g.turn_idx, g.payload_kind, g.main_text
  FROM gated g JOIN win ON win.main_text = g.main_text AND win.wuid = g.uid
),
scored AS ({scored})
SELECT conv_id, turn_idx, payload_kind, lang_pred,
       CAST(len(regexp_extract_all(main_text, '[^ \n]+')) AS BIGINT) AS n_tokens
FROM scored
"""


def _ensure_pipeline_committed(kind: str, sf_dir: str, out: str) -> None:
    """If the committed corpus doesn't exist yet (an oracle evaluated
    BEFORE its query in some runner), materialize it now — the pipelines
    are deterministic, so the later query run rewrites identical content.
    No-op when the dir exists or Ray isn't up."""
    import os

    import ray

    if os.path.isdir(out) or not ray.is_initialized():
        return
    import ray.data as rd

    from ocr_ray.pipelines.training_data import sft_dataset_full, training_data_full

    src = rd.read_parquet(_transcripts(sf_dir))
    if kind == "tdf":
        training_data_full(src, out)
    else:
        sft_dataset_full(src, out)


def _tdf_report_sql(sf_dir: str) -> str:
    """Oracle for ``training_data_full`` (VERDICT r3 #2): DuckDB recounts
    the COMMITTED corpus per (split, lang_pred) — the read-back verifies
    the report reconciles with the corpus on disk (materialized here if a
    runner evaluates the SQL first). The pipeline's stage semantics are
    covered by the gated decompositions (clean_corpus_plain/html,
    conv_dedup_exact, extract_* by name)."""
    from ocr_ray.pipelines.training_data import pipeline_out_dir
    from ocr_ray.sources.transcripts import n_convs_for_sf

    out = pipeline_out_dir("tdf", n_convs_for_sf(sf_dir))
    _ensure_pipeline_committed("tdf", sf_dir, out)
    return f"""
SELECT split, lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM read_parquet('{out}/part-*.parquet')
GROUP BY split, lang_pred
"""


def _sft_report_sql(sf_dir: str) -> str:
    """Oracle for ``sft_dataset_full``: per-split recount of the committed
    SFT examples (see ``_tdf_report_sql`` for the read-back contract)."""
    from ocr_ray.pipelines.training_data import pipeline_out_dir
    from ocr_ray.sources.transcripts import n_convs_for_sf

    out = pipeline_out_dir("sft", n_convs_for_sf(sf_dir))
    _ensure_pipeline_committed("sft", sf_dir, out)
    return f"""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       CAST(SUM(ctx_chars) AS BIGINT) AS ctx_chars,
       CAST(SUM(resp_chars) AS BIGINT) AS resp_chars
FROM read_parquet('{out}/part-*.parquet')
GROUP BY split
"""


def _dialogue_pairs_full_sql(path: str) -> str:
    """Oracle for ``dialogue_pairs`` (full corpus): lag() over ALL turns in
    (conv_id, turn_idx) order, each turn's main_text from its engine
    mirror (the union is total, so the lag adjacency equals the
    production grouped-scan's)."""
    return f"""
WITH u AS ({_turns_union_sql(path)}),
raw AS (
  SELECT conv_id, turn_idx, role FROM read_parquet('{path}/*.parquet')
)
SELECT r.conv_id, r.turn_idx, r.role,
       coalesce(lag(r.role) OVER w, '') AS prev_role,
       coalesce(substring(lag(u.main_text) OVER w, 1, 80), '') AS prev_text_head
FROM raw r
JOIN u ON u.conv_id = r.conv_id AND u.turn_idx = r.turn_idx
WINDOW w AS (PARTITION BY r.conv_id ORDER BY r.turn_idx)
"""


CONVERSATION_STATS_SQL_TMPL = """
SELECT conv_id,
       COUNT(*) AS n_turns,
       CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
       CAST(SUM(strlen(text)) AS BIGINT) AS bytes_total,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us
FROM read_parquet('{path}/*.parquet')
GROUP BY conv_id
"""


def oracle_sqls(sf_dir: str) -> dict[str, str]:
    """SQL strings for the extract-family invariants, bound to the
    deterministic transcripts fixture for ``sf_dir`` (the fixture is
    (re)generated here so the path exists when the oracle runs)."""
    from ocr_ray.pipelines.conversation import (
        conv_lang_profile_sql as _conv_lang_profile_sql,
        CONV_ASSISTANT_ECHO_SQL_TMPL,
        CONV_TOKEN_NOVELTY_SQL_TMPL,
        TURN_MARKUP_STATS_SQL_TMPL,
        CONV_DEDUP_EXACT_SQL_TMPL,
        CONV_RESPONSE_LATENCY_SQL_TMPL,
        CONV_TEXTS_SQL_TMPL,
        CONV_TOOL_TRANSITIONS_SQL_TMPL,
        DQ_ROLE_ALTERNATION_SQL_TMPL,
        SFT_EXAMPLES_SQL_TMPL,
        SYSTEM_PROMPT_CENSUS_SQL_TMPL,
        TOOL_LATENCY_SQL_TMPL,
        EXTRACT_LINKS_SQL_TMPL,
        TURN_CONTEXT_STATS_SQL_TMPL,
    )

    path = _transcripts(sf_dir)
    return {
        "conv_dedup_exact": CONV_DEDUP_EXACT_SQL_TMPL.format(path=path),
        "conv_assistant_echo": CONV_ASSISTANT_ECHO_SQL_TMPL.format(path=path),
        "conv_token_novelty": CONV_TOKEN_NOVELTY_SQL_TMPL.format(path=path),
        "conv_token_novelty_exact": CONV_TOKEN_NOVELTY_SQL_TMPL.format(path=path),
        "turn_markup_stats": TURN_MARKUP_STATS_SQL_TMPL.format(path=path),
        "conv_lang_profile": _conv_lang_profile_sql(path),
        "sft_examples": SFT_EXAMPLES_SQL_TMPL.format(path=path),
        "tool_latency_stats": TOOL_LATENCY_SQL_TMPL.format(path=path),
        "conv_texts": CONV_TEXTS_SQL_TMPL.format(path=path),
        "conv_response_latency": CONV_RESPONSE_LATENCY_SQL_TMPL.format(path=path),
        "conv_tool_transitions": CONV_TOOL_TRANSITIONS_SQL_TMPL.format(path=path),
        "dq_role_alternation": DQ_ROLE_ALTERNATION_SQL_TMPL.format(path=path),
        "system_prompt_census": SYSTEM_PROMPT_CENSUS_SQL_TMPL.format(path=path),
        "extract_links": EXTRACT_LINKS_SQL_TMPL.format(path=path),
        "extract_plain_turns": _plain_sql(path),
        "extract_html_turns": _html_sql(path),
        "extract_html_blocks": _html_blocks_sql(path),
        "extract_datauri_turns": _datauri_sql(path),
        "extract_pdf_turns": _pdf_sql(path),
        "extract_pdf_blocks": _pdf_blocks_sql(path),
        "extract_plain_blocks": _plain_blocks_sql(path),
        "extract_plain_summaries": _plain_summaries_sql(path),
        "extract_html_summaries": _html_summaries_sql(path),
        "extract_pdf_summaries": _pdf_summaries_sql(path),
        "plain_dialogue_pairs": _plain_dialogue_pairs_sql(path),
        "html_dialogue_pairs": _html_dialogue_pairs_sql(path),
        "clean_corpus_plain": _clean_corpus_plain_sql(path),
        "clean_corpus_html": _clean_corpus_html_sql(path),
        "engine_dispatch_counts": _dispatch_sql(path),
        "extract_metrics_gated": _metrics_gated_sql(path),
        "extract_records_gated": _records_gated_sql(path),
        "extract_plain_spans": _plain_spans_sql(path),
        "extract_pdf_spans": _pdf_spans_sql(path),
        "extract_turn_counts": _counts_sql(path),
        "extract_turns": _turns_full_sql(path),
        "extract_blocks": _blocks_full_sql(path),
        "extract_summaries": _summaries_full_sql(path),
        "dialogue_pairs": _dialogue_pairs_full_sql(path),
        "training_data_full": _tdf_report_sql(sf_dir),
        "sft_dataset_full": _sft_report_sql(sf_dir),
        "extract_records": _records_full_sql(path),
        "extract_metrics": _metrics_full_sql(path),
        "clean_corpus": _clean_corpus_full_sql(path),
        # the deterministic fixture contains no sub-exact near-duplicates
        # (random word-soup paragraphs sit far below the 0.7 Jaccard
        # threshold), so the near-dup pass must be a NO-OP here beyond
        # exact dedup and the same SQL gates it — i.e. the driver checks
        # the MinHash stage never FALSELY removes a row; planted-dup
        # recall is pinned by tests/test_ops_dedup.py instead
        "clean_corpus_neardup": _clean_corpus_full_sql(path),
        "extract_spans": _spans_full_sql(sf_dir),
        "extract_html_spans": _html_spans_full_sql(sf_dir),
        "conversation_stats": CONVERSATION_STATS_SQL_TMPL.format(path=path),
        "tool_usage_stats": TOOL_USAGE_SQL_TMPL.format(path=path),
        "turn_context_stats": TURN_CONTEXT_STATS_SQL_TMPL.format(path=path),
    }


TOOL_USAGE_SQL_TMPL = """
SELECT tool,
       CAST(COUNT(*) AS BIGINT) AS n_calls,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM read_parquet('{path}/*.parquet')
WHERE role = 'tool'
GROUP BY tool
"""

# ---------------------------------------------------------------------------
# context-aware engine gate (r5, VERDICT r4 #7): ``extract_context_turns``
# strips a reply-echo prefix (a turn opening by quoting the ENTIRE previous
# turn) before extraction. Oracle technique: the echo detection + strip is
# pure SQL (lag over (conv_id, turn_idx) + prefix test + substr), so DuckDB
# materializes the STRIPPED twin of the corpus itself — no kernel import —
# and the existing engine-union mirror runs over the twin. Totality is part
# of the gate exactly as for the flagship: a stripped remainder outside
# every provable subset surfaces as a row-count mismatch.
# ---------------------------------------------------------------------------


def _ensure_ctx_stripped(path: str) -> str:
    """DuckDB-materialized echo-stripped twin of a transcripts dir.
    Strip rule (verbatim mirror of ``extract_context_turns``'s scan):
    prev = lag(text) within the conversation in turn order; echo iff
    prev is a non-empty proper prefix of text; stripped = the remainder.
    Python ``len``/slices are code-point based, as are DuckDB
    ``length``/``substr`` — the rule is engine-exact."""
    import os

    out = path.rstrip("/") + "_ctxstripped"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import duckdb

    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    duckdb.sql(f"""
COPY (
  WITH t AS (
    SELECT conv_id, turn_idx, role, text, tool, ts,
           lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM read_parquet('{path}/*.parquet')
  ), e AS (
    SELECT *, (prev IS NOT NULL AND prev <> '' AND text IS NOT NULL
               AND starts_with(text, prev)
               AND length(text) > length(prev)) AS echo_stripped
    FROM t
  )
  SELECT conv_id, turn_idx, role,
         CASE WHEN echo_stripped THEN substr(text, length(prev) + 1)
              ELSE text END AS text,
         tool, ts, echo_stripped
  FROM e
) TO '{tmp}/part-0.parquet' (FORMAT PARQUET)
""")
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


def _ctx_turns_sql(path: str) -> str:
    sp = _ensure_ctx_stripped(path)
    return f"""
WITH u AS ({_turns_union_sql(sp)}),
e AS (
  SELECT conv_id, turn_idx, echo_stripped FROM read_parquet('{sp}/*.parquet')
)
SELECT u.conv_id, u.turn_idx, u.main_text, u.error, e.echo_stripped
FROM u
JOIN e ON e.conv_id = u.conv_id AND e.turn_idx = u.turn_idx
"""


def extract_context_turns_echo(sf_dir: str) -> Dataset:
    """The PRODUCTION context-aware engine over a corpus with planted
    reply-echo turns (~26% of turns quote the whole previous turn and
    append a plain paragraph) — gates the strip path itself; the main
    fixture's ``extract_context_turns`` row gates the no-false-strip side
    (its corpus contains no echoes, and the oracle COMPUTES that via the
    same lag rule rather than assuming it)."""
    from ocr_ray.pipelines.conversation import extract_context_turns
    from ocr_ray.sources.transcripts import ensure_echo_transcripts, n_convs_for_sf

    path = ensure_echo_transcripts(max(40, n_convs_for_sf(sf_dir) // 5))
    return extract_context_turns(rd.read_parquet(path))


def ctx_oracle_sqls(sf_dir: str) -> dict[str, str]:
    from ocr_ray.sources.transcripts import ensure_echo_transcripts, n_convs_for_sf

    path = _transcripts(sf_dir)
    echo_path = ensure_echo_transcripts(max(40, n_convs_for_sf(sf_dir) // 5))
    return {
        "extract_context_turns": _ctx_turns_sql(path),
        "extract_context_turns_echo": _ctx_turns_sql(echo_path),
    }

