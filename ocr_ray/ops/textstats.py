"""Text-analysis operators over the ``documents`` table.

* language-ID: stopword-profile scoring (n-gram/stopword heuristic)
* quality scoring: length / punctuation / stopword / token-shape ratios,
  reported as exact integers (basis points) so results are order-stable
* winnowing fingerprints: rolling-hash k-grams, per-window minima

All are stateless-per-row but hosted in actor pools so the profile tables /
rolling-hash setup are built once per actor (reference singleton pattern,
genkit.ts:4-7).
"""

from __future__ import annotations

import os
import re
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "pour", "dans", "au"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "ein", "eine", "auf"},
    "es": {"el", "la", "los", "las", "de", "y", "en", "un", "una", "que", "es", "por", "con", "para", "del"},
}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)
_WORD_RE = re.compile(r"[a-zA-Z']+")


_LANG_SCAN_CHARS = 2000


def lang_of(text: str) -> tuple[str, int]:
    """Heuristic language id -> (lang, score_bp). Deterministic integers.

    CJK codepoint share decides 'zh'; otherwise the stopword profile with
    the highest hit count wins (ties broken by profile name). Only the
    first 2000 chars are scanned — ample signal for language ID and keeps
    the op O(1) per document."""
    if not text:
        return "und", 0
    text = text[:_LANG_SCAN_CHARS]
    n = len(text)
    cjk = len(_CJK_RE.findall(text))
    if cjk * 20 >= n:  # >=5% CJK codepoints
        return "zh", 10_000 * cjk // n
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und", 0
    best_lang, best_hits = "und", 0
    for lang in sorted(_STOPWORDS):
        hits = sum(1 for w in words if w in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, 10_000 * best_hits // len(words)


def lang_scores_vec(col) -> tuple[pa.Array, pa.Array]:
    """Vectorized ``lang_of`` over a string column: (lang_pred,
    lang_score_bp) arrays, bit-identical to the per-row scan (pytest-swept
    incl. the KELVIN-sign casefold trap: tokens are extracted from the
    ORIGINAL text and lowercased afterwards, exactly like the scalar).

    Plan (one Arrow kernel per step, no per-row Python — VERDICT r3 #3):
    slice 2000 chars -> CJK regex count -> non-token runs collapse to one
    space -> whitespace split -> flat token lowercase + per-language
    ``is_in`` -> per-row sums via bincount on list parent indices ->
    strictly-greater argmax in sorted-language order (np.argmax takes the
    FIRST max, which equals the scalar's scan order).
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_rows = len(col)
    t2 = pc.utf8_slice_codeunits(pc.fill_null(col, ""), 0, _LANG_SCAN_CHARS)
    n = pc.utf8_length(t2).to_numpy(zero_copy_only=False).astype(np.int64)
    cjk = (
        pc.count_substring_regex(t2, _CJK_RE.pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    cleaned = pc.replace_substring_regex(t2, r"[^a-zA-Z']+", " ")
    toks = pc.split_pattern(cleaned, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    low = pc.utf8_lower(flat)
    nw = np.bincount(parent[nonempty], minlength=n_rows).astype(np.int64)
    langs_sorted = sorted(_STOPWORDS)
    hit_mat = np.zeros((len(langs_sorted), n_rows), dtype=np.int64)
    for i, lang in enumerate(langs_sorted):
        m = pc.is_in(low, value_set=pa.array(sorted(_STOPWORDS[lang]))).to_numpy(
            zero_copy_only=False
        )
        hit_mat[i] = np.bincount(parent[m & nonempty], minlength=n_rows)
    best_i = hit_mat.argmax(axis=0)  # first max == sorted-order scan
    best = hit_mat[best_i, np.arange(n_rows)]

    lang_arr = np.asarray(langs_sorted, dtype=object)[best_i]
    zh = (cjk * 20 >= n) & (n > 0)
    und = (best == 0) | (nw == 0)
    lang_arr[und] = "und"
    lang_arr[zh] = "zh"

    score = np.zeros(n_rows, dtype=np.int64)
    word_rows = ~zh & (nw > 0)
    score[word_rows] = 10_000 * best[word_rows] // nw[word_rows]
    score[und & ~zh] = 0
    nz = zh & (n > 0)
    score[nz] = 10_000 * cjk[nz] // n[nz]
    return pa.array(lang_arr, pa.string()), pa.array(score, pa.int64())


class LangId:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, scores = lang_scores_vec(batch.column(self.text_col))
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "lang_pred": langs,
                "lang_score_bp": scores,
            }
        )


def lang_id_docs(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=512, concurrency=(1, 16), num_cpus=1
    )


def quality_of(text: str) -> dict:
    """Deterministic quality features, ratios in basis points (int)."""
    n = len(text)
    toks = text.split()
    n_tok = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    en_stop = _STOPWORDS["en"]
    n_stop = sum(1 for w in toks if w.lower().strip(".,!?;:") in en_stop)
    tok_chars = sum(len(t) for t in toks)
    return {
        "n_chars": n,
        "n_tokens": n_tok,
        "punct_bp": 10_000 * n_punct // n if n else 0,
        "stop_bp": 10_000 * n_stop // n_tok if n_tok else 0,
        "mean_tok_len_c": 100 * tok_chars // n_tok if n_tok else 0,
    }


def quality_vec(col) -> dict:
    """Vectorized ``quality_of`` over a string column (r4: the last
    per-row loop in this module): one Arrow kernel per feature, exact
    integer ratios identical to the scalar (parity pytest-swept; the
    punct class is spelled ``[^\\p{L}\\p{N}_\\s]`` — the same RE2 form
    the green SQL mirror uses for Python's unicode ``\\w``)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_rows = len(col)
    t = pc.fill_null(col, "")
    n = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
    # RE2's \s is ASCII-only; append the unicode whitespace set so the
    # negated class matches Python's [^\w\s] exactly (NBSP etc.)
    uws = (
        r"\x{000B}\x{001C}-\x{001F}\x{0085}\x{00A0}\x{1680}"
        r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}"
    )
    n_punct = (
        pc.count_substring_regex(t, rf"[^\p{{L}}\p{{N}}_\s{uws}]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    toks = pc.utf8_split_whitespace(t)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_tok = np.bincount(parent[nonempty], minlength=n_rows).astype(np.int64)
    tok_chars = np.bincount(
        parent[nonempty], weights=lens[nonempty], minlength=n_rows
    ).astype(np.int64)
    # Stop-token check is restricted to pure-ASCII tokens (byte length ==
    # codepoint length): Arrow's utf8proc lower maps U+0130 'İ' -> 'i'
    # while Python str.lower yields 'i̇', so 'İt' would falsely hit
    # the stopword set. A non-ASCII token can only Python-lower to ASCII
    # via U+212A KELVIN 'K' -> 'k', and no stopword in any language
    # contains 'k' (pytest-asserted), so the ASCII mask is exact.
    ascii_tok = pc.equal(pc.binary_length(flat), pc.utf8_length(flat)).to_numpy(
        zero_copy_only=False
    )
    stop_mask = (
        pc.is_in(
            pc.utf8_trim(pc.utf8_lower(flat), ".,!?;:"),
            value_set=pa.array(sorted(_STOPWORDS["en"])),
        ).to_numpy(zero_copy_only=False)
        & ascii_tok
    )
    n_stop = np.bincount(parent[stop_mask & nonempty], minlength=n_rows).astype(
        np.int64
    )
    punct_bp = np.where(n > 0, 10_000 * n_punct // np.maximum(n, 1), 0)
    stop_bp = np.where(n_tok > 0, 10_000 * n_stop // np.maximum(n_tok, 1), 0)
    mean_tok = np.where(n_tok > 0, 100 * tok_chars // np.maximum(n_tok, 1), 0)
    return {
        "n_chars": pa.array(n, pa.int64()),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "punct_bp": pa.array(punct_bp, pa.int64()),
        "stop_bp": pa.array(stop_bp, pa.int64()),
        "mean_tok_len_c": pa.array(mean_tok, pa.int64()),
    }


class QualityScorer:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict = {"doc_id": batch.column(self.id_col)}
        cols.update(quality_vec(batch.column(self.text_col)))
        return pa.table(cols)


def doc_quality(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return ds.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=512, concurrency=(1, 16), num_cpus=1
    )


def _sql_str_set(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


# DuckDB equivalent of quality_of(): RE2's \w is ASCII-only while Python's
# \w is unicode, so the punct class is spelled [^\p{L}\p{N}_\s] (unicode
# letters/digits/underscore) to match Python semantics. All ratios are
# non-negative integer // so DuckDB's floor-div matches Python's.
DOC_QUALITY_SQL = f"""
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(CASE WHEN n_chars = 0 THEN 0 ELSE 10000 * n_punct // n_chars END AS BIGINT) AS punct_bp,
  CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE 10000 * n_stop // n_tokens END AS BIGINT) AS stop_bp,
  CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE 100 * tok_chars // n_tokens END AS BIGINT) AS mean_tok_len_c
FROM (
  SELECT doc_id,
    length(t) AS n_chars,
    len(regexp_extract_all(t, '\\S+')) AS n_tokens,
    len(regexp_extract_all(t, '[^\\p{{L}}\\p{{N}}_\\s]')) AS n_punct,
    len(list_filter(regexp_extract_all(t, '\\S+'),
        w -> strlen(w) = length(w)
         AND trim(lower(w), '.,!?;:') IN ({_sql_str_set(_STOPWORDS["en"])}))) AS n_stop,
    length(regexp_replace(t, '\\s', '', 'g')) AS tok_chars
  FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
)
"""


def _lang_id_sql(
    source: str = "documents", id_cols: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle for the ``lang_of`` scoring, GENERATED from the same
    _STOPWORDS profiles the Ray kernel uses — one source of truth for the
    word lists. Argmax ties break to the first lang in sorted order
    (matching the strictly-greater scan in lang_of). Parameterized over the
    source relation / id columns / text column so composed pipelines
    (clean_corpus_plain) can score any relation, not just ``documents``."""
    langs = sorted(_STOPWORDS)
    hit_cols = ",\n    ".join(
        f"len(list_filter(words, w -> w IN ({_sql_str_set(_STOPWORDS[lang])}))) AS hits_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pick = " ".join(f"WHEN hits_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
SELECT {id_cols},
  CASE WHEN n = 0 THEN 'und'
       WHEN cjk * 20 >= n THEN 'zh'
       WHEN nw = 0 OR best = 0 THEN 'und'
       {pick} END AS lang_pred,
  CAST(CASE WHEN n = 0 THEN 0
       WHEN cjk * 20 >= n THEN 10000 * cjk // n
       WHEN nw = 0 THEN 0
       ELSE 10000 * best // nw END AS BIGINT) AS lang_score_bp
FROM (
  SELECT {id_cols}, n, cjk, len(words) AS nw, {best} AS best,
         hits_{', hits_'.join(langs)}
  FROM (
    SELECT {id_cols}, n, cjk, words,
    {hit_cols}
    FROM (
      SELECT {id_cols},
        length(t2) AS n,
        len(regexp_extract_all(t2, '[{_CJK_RE.pattern[1:-1]}]')) AS cjk,
        list_transform(regexp_extract_all(t2, '[a-zA-Z'']+'), w -> lower(w)) AS words
      FROM (SELECT {id_cols}, substr(coalesce({text_col}, ''), 1, {_LANG_SCAN_CHARS}) AS t2 FROM {source})
    )
  )
)
"""


LANG_ID_SQL = _lang_id_sql()


# Winnowing (Schleimer/Wilkerson/Aiken MOSS scheme): hash every char k-gram,
# keep the minimum of each sliding window of `window` consecutive hashes.
# The gram hash is the first 16 hex chars of md5 — portable across engines
# (identical in Python hashlib and DuckDB md5()), so the WHOLE operator is
# driver-verifiable against an independent SQL reimplementation
# (DOC_FINGERPRINTS_SQL below). Lexicographic min over fixed-width lowercase
# hex equals numeric min over the underlying 64-bit value, in both engines.
_FP_K = 8
_FP_WINDOW = 16
# explicit ASCII whitespace class, written identically for Python `re` and
# DuckDB RE2 — parity by construction (same convention as extract_oracle)
_FP_WS_RE = re.compile(r"[ \t\n\r\f\v]+")
_FP_WS_SQL = r"[ \t\n\r\f\v]+"


def fingerprint(text: str, k: int = _FP_K, window: int = _FP_WINDOW) -> list[str]:
    """Winnowing document fingerprint: md5-prefix hashes of char k-grams,
    minimum per sliding window (monotonic-deque, O(n)), dedup, sorted."""
    import hashlib
    from collections import deque

    s = _FP_WS_RE.sub(" ", text.lower()).strip(" ")
    if not s:
        return []
    if len(s) < k:
        return [hashlib.md5(s.encode("utf-8")).hexdigest()[:16]]
    hs = [
        hashlib.md5(s[i : i + k].encode("utf-8")).hexdigest()[:16]
        for i in range(len(s) - k + 1)
    ]
    if len(hs) <= window:
        return [min(hs)]
    mins: set[str] = set()
    dq: deque[int] = deque()
    for i, h in enumerate(hs):
        while dq and hs[dq[-1]] >= h:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - window:
            dq.popleft()
        if i >= window - 1:
            mins.add(hs[dq[0]])
    return sorted(mins)


class Fingerprinter:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        fps = [fingerprint(t or "") for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "n_fp": pa.array([len(f) for f in fps], pa.int64()),
                "fp_min": pa.array([f[0] if f else "" for f in fps], pa.string()),
                # content checksum of the full sorted fingerprint set — the
                # driver hash-gates every fingerprint, not just min/count
                "fp_digest": pa.array(
                    [hashlib.md5(",".join(f).encode("ascii")).hexdigest() for f in fps],
                    pa.string(),
                ),
            }
        )


def doc_fingerprints(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        # keyed on the entity id: a NULL doc_id identifies nothing (the SQL
        # mirror filters identically; its GROUP BY would collapse all
        # NULL-id docs into one)
        lambda t: t.filter(pa.compute.is_valid(t.column("doc_id"))),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        Fingerprinter, batch_format="pyarrow", batch_size=256, concurrency=(1, 16), num_cpus=1
    )


# Independent DuckDB reimplementation: lateral gram expansion + window min.
# Long regime (>= window grams): valid windows are i in 1..ng-window+1;
# short regimes collapse to a single min / single whole-string hash —
# exactly fingerprint()'s branches.
DOC_FINGERPRINTS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(lower(coalesce(text, '')), '{_FP_WS_SQL}', ' ', 'g'), ' ') AS s
  FROM documents WHERE doc_id IS NOT NULL
),
grams AS (
  SELECT doc_id, ng, i, substr(md5(substr(s, CAST(i AS INT), {_FP_K})), 1, 16) AS h
  FROM (
    SELECT doc_id, length(s) - {_FP_K} + 1 AS ng, s,
           unnest(range(1, length(s) - {_FP_K} + 2)) AS i
    FROM d WHERE length(s) >= {_FP_K}
  )
),
wm AS (
  SELECT doc_id, ng, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {_FP_WINDOW - 1} FOLLOWING) AS m
  FROM grams
),
fp AS (
  SELECT DISTINCT doc_id, m FROM wm WHERE i <= greatest(1, ng - {_FP_WINDOW - 1})
  UNION ALL
  SELECT doc_id, substr(md5(s), 1, 16) AS m FROM d WHERE length(s) BETWEEN 1 AND {_FP_K - 1}
),
agg AS (
  SELECT doc_id, count(*) AS n_fp, min(m) AS fp_min,
         md5(string_agg(m, ',' ORDER BY m)) AS fp_digest
  FROM fp GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_fp, 0) AS n_fp,
       coalesce(agg.fp_min, '') AS fp_min,
       coalesce(agg.fp_digest, md5('')) AS fp_digest
FROM d LEFT JOIN agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style repetition quality filters)
# ---------------------------------------------------------------------------


def repetition_of(text: str) -> tuple[int, int, int, int]:
    """Word-level repetition signals, exact integers (basis points):
    (n_words, distinct_frac_bp, top_word_frac_bp, top_bigram_frac_bp) —
    the repetition filters a large-scale training-data pipeline gates on
    (fraction of the doc covered by the most frequent word / 2-gram,
    type-token ratio), per the published Gopher/MassiveText rules."""
    from collections import Counter

    toks = (text or "").split()
    nw = len(toks)
    if nw == 0:
        return (0, 0, 0, 0)
    wc = Counter(toks)
    distinct_bp = 10_000 * len(wc) // nw
    top_word_bp = 10_000 * max(wc.values()) // nw
    if nw < 2:
        top_bigram_bp = 0
    else:
        bc = Counter(zip(toks, toks[1:]))
        top_bigram_bp = 10_000 * max(bc.values()) // (nw - 1)
    return (nw, distinct_bp, top_word_bp, top_bigram_bp)


class RepetitionScorer:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [repetition_of(t) for t in batch.column(self.text_col).to_pylist()]
        names = ("n_words", "distinct_frac_bp", "top_word_frac_bp", "top_bigram_frac_bp")
        cols: dict = {"doc_id": batch.column(self.id_col)}
        for i, k in enumerate(names):
            cols[k] = pa.array([r[i] for r in rows], pa.int64())
        return pa.table(cols)


def repetition_stats(sf_dir: str) -> Dataset:
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        # keyed on the entity id: a NULL doc_id identifies nothing (the SQL
        # mirror filters identically; its GROUP BY would collapse all
        # NULL-id docs into one)
        lambda t: t.filter(pa.compute.is_valid(t.column("doc_id"))),
        batch_format="pyarrow",
    )
    return ds.map_batches(
        RepetitionScorer, batch_format="pyarrow", batch_size=512, concurrency=(1, 16), num_cpus=1
    )


# Independent DuckDB reimplementation: tokenization mirrors Python
# str.split() on the whitespace present in the fixture (space/\t/\n);
# bigram keys are the space-joined token pairs (tokens cannot contain
# spaces post-split, so the join is collision-free like Counter's tuples).
REPETITION_STATS_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '[ \t\n]+'),
                     x -> x <> '') AS w
  FROM documents WHERE doc_id IS NOT NULL
),
base AS (SELECT doc_id, w, len(w) AS nw FROM d),
words AS (SELECT doc_id, unnest(w) AS tok FROM base WHERE nw > 0),
wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY doc_id, tok),
wagg AS (SELECT doc_id, COUNT(*) AS nd, MAX(c) AS maxw FROM wc GROUP BY doc_id),
bigr AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> list_extract(w, i) || ' ' || list_extract(w, i + 1))) AS bg
  FROM base WHERE nw >= 2
),
bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigr GROUP BY doc_id, bg),
bagg AS (SELECT doc_id, MAX(c) AS maxb FROM bc GROUP BY doc_id)
SELECT b.doc_id,
       CAST(b.nw AS BIGINT) AS n_words,
       CAST(coalesce((10000 * wagg.nd) // b.nw, 0) AS BIGINT) AS distinct_frac_bp,
       CAST(coalesce((10000 * wagg.maxw) // b.nw, 0) AS BIGINT) AS top_word_frac_bp,
       CAST(coalesce((10000 * bagg.maxb) // (b.nw - 1), 0) AS BIGINT) AS top_bigram_frac_bp
FROM base b
LEFT JOIN wagg USING (doc_id)
LEFT JOIN bagg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (subword-style token counting)
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer made RE2-safe (no lookahead): contraction
# suffixes, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, residual whitespace. Both engines run
# RE2, so counts are identical by construction.
_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def doc_bpe_token_counts(sf_dir: str) -> Dataset:
    """Per document: token count under a BPE-ish pre-tokenizer regex — the
    budget estimator a training pipeline runs before packing (the
    whitespace sibling is ``doc_token_counts``).

    One vectorized RE2 scan per batch (``pc.count_substring_regex``); the
    pattern is compiled once inside Arrow, no Python per row. NULL text
    stays NULL (totality, both engines)."""
    import pyarrow.compute as pc

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def count(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": pa.array(
                    pc.cast(
                        pc.count_substring_regex(t.column("text"), pattern=_BPE_PATTERN),
                        pa.int64(),
                    )
                ),
            }
        )

    return docs.map_batches(count, batch_format="pyarrow")


DOC_BPE_TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# within-doc line repetition (Gopher-style repetition quality signals)
# ---------------------------------------------------------------------------


def doc_line_repetition(sf_dir: str) -> Dataset:
    """Per-document duplicate-line statistics — the within-document
    repetition signals of the Gopher data-quality rules (Rae et al. 2021,
    "Scaling Language Models", table A1: fraction of duplicate lines and
    fraction of characters in duplicate lines): boilerplate-heavy pages
    (nav bars, cookie banners repeated per section) score high and get
    culled before training.

    Output per doc: ``n_lines``, ``n_distinct_lines``, ``n_dup_lines``
    (instances belonging to a line string that occurs more than once IN
    THIS DOC), ``dup_line_frac_bp`` and ``dup_char_frac_bp`` (basis
    points, integer-floor — all operands non-negative so DuckDB's
    truncating ``//`` agrees).

    Plan: embarrassingly parallel — each doc is one row, so the whole
    computation is batch-local: one vectorized ``split_pattern``, then
    Arrow C++ group_by on (doc, line) for the within-doc census, then a
    (doc) rollup; no shuffle at all (the per-doc output rides the map).
    Characters are codepoints (``utf8_length`` == DuckDB ``length``).

    Contract (mirrored): NULL doc_id / text rows are excluded (a NULL id
    would merge unrelated docs into one SQL group whose extent depends on
    batching here)."""
    import pyarrow.compute as pc

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def per_doc(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("text")))
        )
        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_lines", pa.int64()),
                ("n_distinct_lines", pa.int64()),
                ("n_dup_lines", pa.int64()),
                ("dup_line_frac_bp", pa.int64()),
                ("dup_char_frac_bp", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        lines = pc.split_pattern(t.column("text"), pattern="\n").combine_chunks()
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        flat = lines.flatten()  # slice-offset safe
        d = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), lens
        )
        chars = pc.cast(pc.utf8_length(flat), pa.int64())
        cen = (
            pa.table({"d": pa.array(d), "line": flat, "ln": chars})
            .group_by(["d", "line"])
            .aggregate([("ln", "sum"), ([], "count_all")])
        )  # -> d, line, ln_sum, cnt  (within-batch == within-doc: 1 row/doc)
        cnt = pc.cast(cen.column("count_all"), pa.int64())
        ln_sum = pc.cast(cen.column("ln_sum"), pa.int64())
        dup = pc.greater(cnt, 1)
        zero = pa.scalar(0, pa.int64())
        roll = (
            pa.table(
                {
                    "d": cen.column("d"),
                    "cnt": cnt,
                    "ln_sum": ln_sum,
                    "dup_cnt": pc.if_else(dup, cnt, zero),
                    "dup_chars": pc.if_else(dup, ln_sum, zero),
                }
            )
            .group_by(["d"])
            .aggregate(
                [("cnt", "sum"), ("ln_sum", "sum"), ("dup_cnt", "sum"),
                 ("dup_chars", "sum"), ([], "count_all")]
            )
        )
        n_lines = np.asarray(pc.cast(roll.column("cnt_sum"), pa.int64()))
        total_chars = np.asarray(pc.cast(roll.column("ln_sum_sum"), pa.int64()))
        n_dup = np.asarray(pc.cast(roll.column("dup_cnt_sum"), pa.int64()))
        dup_chars = np.asarray(pc.cast(roll.column("dup_chars_sum"), pa.int64()))
        n_distinct = np.asarray(pc.cast(roll.column("count_all"), pa.int64()))
        line_bp = n_dup * 10_000 // np.maximum(n_lines, 1)  # n_lines >= 1 always
        char_bp = np.where(
            total_chars > 0, dup_chars * 10_000 // np.maximum(total_chars, 1), 0
        )
        return pa.table(
            {
                "doc_id": roll.column("d"),
                "n_lines": pa.array(n_lines),
                "n_distinct_lines": pa.array(n_distinct),
                "n_dup_lines": pa.array(n_dup),
                "dup_line_frac_bp": pa.array(line_bp.astype(np.int64)),
                "dup_char_frac_bp": pa.array(char_bp.astype(np.int64)),
            }
        )

    return docs.map_batches(per_doc, batch_format="pyarrow")


DOC_LINE_REPETITION_SQL = """
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
per_line AS (
  SELECT doc_id, line, COUNT(*) AS cnt, SUM(length(line)) AS chars
  FROM lines GROUP BY doc_id, line
),
per_doc AS (
  SELECT doc_id,
         SUM(cnt) AS n_lines,
         COUNT(*) AS n_distinct_lines,
         SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS n_dup_lines,
         SUM(chars) AS total_chars,
         SUM(CASE WHEN cnt > 1 THEN chars ELSE 0 END) AS dup_chars
  FROM per_line GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_distinct_lines AS BIGINT) AS n_distinct_lines,
       CAST(n_dup_lines AS BIGINT) AS n_dup_lines,
       CAST(n_dup_lines * 10000 // n_lines AS BIGINT) AS dup_line_frac_bp,
       CAST(CASE WHEN total_chars > 0
                 THEN dup_chars * 10000 // total_chars ELSE 0 END AS BIGINT)
         AS dup_char_frac_bp
FROM per_doc
"""


def lang_confusion_matrix(sf_dir: str) -> Dataset:
    """Classifier-eval census: the (ground-truth lang, predicted lang_pred)
    confusion matrix of the heuristic language ID over the documents table
    — the evaluation step a curation pipeline runs before trusting a
    filter/mixture decision to the classifier.

    Plan: the LangId scoring inside ``map_batches`` plus a per-batch census
    partial, so the shuffle carries (lang, lang_pred, n) cells — at most
    |langs|² rows per batch regardless of corpus size. SQL-gated: the
    oracle composes the SAME generated lang-ID SQL (one source of truth for
    the stopword profiles) with a GROUP BY. NULL ground-truth lang is a
    real census cell (null-safe keys)."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )

    def census(batch: pa.Table) -> pa.Table:
        langs = [lang_of(t or "")[0] for t in batch.column("text").to_pylist()]
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": pa.array(langs, pa.string()),
                "n": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )
        # pandas census keeps NULL lang as a real cell
        import pandas as pd

        g = (
            t.to_pandas()
            .groupby(["lang", "lang_pred"], dropna=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(
                    [None if pd.isna(v) else v for v in g["lang"]], pa.string()
                ),
                "lang_pred": pa.array(g["lang_pred"], pa.string()),
                "n": pa.array(g["n"].to_numpy("int64")),
            }
        )

    return null_safe_groupby_agg(
        ds.map_batches(census, batch_format="pyarrow"),
        ["lang", "lang_pred"],
        Sum("n", alias_name="n"),
    )


LANG_CONFUSION_SQL = f"""
WITH p AS ({_lang_id_sql(id_cols="doc_id, lang")})
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# compression-ratio quality signal (deflate as a repetition detector)
# ---------------------------------------------------------------------------


def doc_compression_ratio(sf_dir: str) -> Dataset:
    """Per-document zlib compression ratio — the classic cheap quality
    signal for LLM corpora (used alongside the Gopher rules): machine-
    generated or template-stuffed text compresses far below prose, so a
    low ``ratio_bp`` flags boilerplate and a very high one flags
    random/encrypted junk. Deflate at a FIXED level (6) is deterministic
    for a given zlib build, and the op re-derives everything from the raw
    bytes, so reruns are stable; cross-engine equality is pinned by the
    pytest oracle (an independent recompute), not SQL — DuckDB has no
    deflate.

    Plan: embarrassingly parallel map-only stage (the ideal 100 TB shape —
    no shuffle at all); compression runs per document inside
    ``map_batches`` over zero-copy Arrow binary views. Output is
    keys+three-int64s per doc.

    Contract: NULL text rows are excluded; sizes are utf-8 bytes;
    ``ratio_bp = comp_bytes * 10_000 // raw_bytes`` (floor), with empty
    text excluded too (ratio undefined at raw == 0)."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def ratios(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))
        raw = [s.encode("utf-8") for s in t.column("text").to_pylist()]
        keep = [i for i, b in enumerate(raw) if len(b) > 0]
        t = t.take(pa.array(keep, pa.int64()))
        raw = [raw[i] for i in keep]
        raw_n = np.array([len(b) for b in raw], dtype=np.int64)
        comp_n = np.array(
            [len(zlib.compress(b, 6)) for b in raw], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "raw_bytes": pa.array(raw_n, pa.int64()),
                "comp_bytes": pa.array(comp_n, pa.int64()),
                "ratio_bp": pa.array(comp_n * 10_000 // raw_n, pa.int64()),
            }
        )

    return ds.map_batches(ratios, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# lexical diversity: type-token ratio + Simpson repeat concentration
# ---------------------------------------------------------------------------


def doc_ttr(sf_dir: str) -> Dataset:
    """Per-document lexical diversity: token count, DISTINCT token count
    (the type-token ratio's exact numerator/denominator) and the Simpson
    repeat-concentration ingredients ``sum c*(c-1)`` / ``n*(n-1)`` — the
    probability two random tokens of the doc are the same word. Low TTR /
    high Simpson flags template/boilerplate docs that slip past length
    gates; it's the standard lexical screen next to the compression-ratio
    signal (``doc_compression_ratio``).

    Tokenizer is the repo-wide UNNEST convention (``explode_doc_words``):
    split on single spaces, duplicates and empty fragments preserved, so
    the DuckDB mirror is ``string_split(text, ' ')`` — identical by
    construction.

    Plan: embarrassingly parallel, zero shuffle. Per batch: split →
    flatten with parent row index → ``dictionary_encode`` the flat words
    (string compares become int compares) → ONE lexsort over (row, code)
    → run-length boundaries give distinct-per-row and per-(row,word)
    counts; ``np.add.reduceat`` folds the Simpson numerator. No Python
    per row, no text through any shuffle.

    Contract (mirrored in SQL): NULL doc_id and NULL text rows are
    excluded (SQL GROUP BY would fuse all NULL ids into one row while a
    per-row scan keeps each — the recurring NULL-output-key class)."""
    import pyarrow.compute as pc

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def per_doc(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("text")))
        )
        parts = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts).combine_chunks()
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        order = np.lexsort((codes, rows))
        r, c = rows[order], codes[order]
        new = np.empty(len(r), dtype=bool)
        if len(r):
            new[0] = True
            np.not_equal(r[1:], r[:-1], out=new[1:])
            new[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(r))).astype(np.int64)
        # distinct words per row: count of runs whose row index == row
        run_rows = r[starts] if len(starts) else np.array([], np.int64)
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_distinct, run_rows, 1)
        simpson_num = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(simpson_num, run_rows, cnt * (cnt - 1))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(lens, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "simpson_num": pa.array(simpson_num, pa.int64()),
                "simpson_den": pa.array(lens * (lens - 1), pa.int64()),
            }
        )

    return docs.map_batches(per_doc, batch_format="pyarrow")


DOC_TTR_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(cnt * (cnt - 1)) AS BIGINT) AS simpson_num,
       CAST(SUM(cnt) * (SUM(cnt) - 1) AS BIGINT) AS simpson_den
FROM c GROUP BY doc_id
"""
