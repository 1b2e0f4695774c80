"""Search/retrieval operators over the documents corpus: inverted index
construction and BM25-family relevance scoring.

These are the retrieval half of a training-data platform (dedup/decontam
find NEAR-duplicates; retrieval finds RELEVANT docs for curriculum mining,
eval-set construction, and RAG corpus builds). Both are exact and
SQL-gated; all arithmetic is integer fixed-point so Ray's reduction order
and DuckDB's produce identical bits.

Scale notes:
* Tokenization is the shared ``ops.corpus._token_lists`` kernel (Arrow
  ``ascii_split_whitespace`` of the lowered text == the oracle's
  ``regexp_extract_all('\\S+')``) — one vectorized pass, text never
  re-parsed downstream.
* A document's rows never split across blocks (Ray blocks are row sets),
  so per-batch (token, doc) pair dedup IS global dedup — the index
  shuffle carries each posting once.
* BM25 runs over a per-doc SCALAR stats table (~48 B/doc, ~1000x smaller
  than the text), pinned once so the tokenize pass runs once; global
  stats (N, total tokens, per-term df) fold from one tiny row per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ocr_ray.ops.corpus import _token_lists

__all__ = [
    "inverted_index",
    "bm25_topk",
    "INVERTED_INDEX_SQL",
    "BM25_TOPK_SQL",
]


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ---------------------------------------------------------------------------
# inverted index (term -> sorted postings)
# ---------------------------------------------------------------------------

# df band: hapax terms are noise, df > _DF_HI terms are stopwords whose
# postings would be corpus-sized rows (the classic posting-list skew); both
# are excluded EXACTLY, not sampled, so the cut is part of the contract.
_DF_LO = 2
_DF_HI = 400


def inverted_index(sf_dir: str) -> Dataset:
    """term -> (df, comma-joined sorted doc_id postings) for terms with
    ``_DF_LO <= df <= _DF_HI`` — the retrieval-index build step.

    Plan: per-batch tokenize + explode + PAIR DEDUP (global by the
    doc-locality argument above), then one ``grouped_scan`` over the token
    key: sort, boundary-detect groups, drop out-of-band groups by a
    repeated mask, and assemble postings with zero-copy ListArray offsets
    + ``binary_join`` (the conv_texts group-concat machinery — no per-group
    Python). The shuffle carries (token, doc_id) int/string pairs once
    each, never text."""
    from ocr_ray.pipelines.conversation import grouped_scan

    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        # postings/stats are keyed on the doc id — NULL identifies nothing
        lambda t: t.filter(pc.is_valid(t.column("doc_id"))),
        batch_format="pyarrow",
    )

    def pairs(t: pa.Table) -> pa.Table:
        import pandas as pd

        toks = _token_lists(t).combine_chunks()
        flat = toks.flatten()
        parents = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False),
            np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
        )
        df = pd.DataFrame(
            {"token": flat.to_numpy(zero_copy_only=False), "doc_id": parents}
        ).drop_duplicates()
        return pa.table(
            {
                "token": pa.array(df["token"], pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
            }
        )

    def build(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "postings": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("token", "ascending"), ("doc_id", "ascending")])
        tok = t.column("token").combine_chunks()
        n = t.num_rows
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1))
        starts = np.concatenate(
            ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1)
        )
        sizes = np.diff(np.concatenate((starts, [n])))
        keep = (sizes >= _DF_LO) & (sizes <= _DF_HI)
        if not keep.any():
            return empty
        row_keep = np.repeat(keep, sizes)
        kept = t.filter(pa.array(row_keep))
        kept_sizes = sizes[keep]
        offsets = np.concatenate(([0], np.cumsum(kept_sizes))).astype(np.int32)
        ids = kept.column("doc_id").cast(pa.string()).combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), ids)
        return pa.table(
            {
                "token": kept.column("token").take(pa.array(offsets[:-1])),
                "df": pa.array(kept_sizes.astype(np.int64)),
                "postings": pc.binary_join(lists, ","),
            }
        )

    p = docs.map_batches(pairs, batch_format="pyarrow")
    return grouped_scan(p, "token", build, batch_format="pyarrow")


INVERTED_INDEX_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT token, doc_id FROM (
    SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '\\S+')) AS token,
           doc_id
    FROM documents WHERE doc_id IS NOT NULL)
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs
GROUP BY token
HAVING count(*) BETWEEN {_DF_LO} AND {_DF_HI}
"""


# ---------------------------------------------------------------------------
# BM25 relevance top-k (integer fixed-point)
# ---------------------------------------------------------------------------

# fixed query — terms from the fixture's stable word pool (present at every
# sf); a production call takes the term list as a parameter
_QUERY_TERMS = ("hash", "join", "scan", "window")
_K1 = 1200  # k1 = 1.2, milli
_B = 750  # b = 0.75, milli
_SCALE = 1_000_000
_IDF_CAP = 1_000_000_000_000  # keeps idf*tfn < 2^63 at any corpus size
_TOP_K = 10


def bm25_topk(sf_dir: str, *, terms: tuple[str, ...] = _QUERY_TERMS, top_k: int = _TOP_K) -> pa.Table:
    """Top-``_TOP_K`` documents by an integer fixed-point BM25 score for a
    fixed query — retrieval scoring with exact oracle parity.

    The score is the BM25 shape with two integer substitutions (both
    documented, both monotone in the classical quantities, both applied
    IDENTICALLY in SQL): idf = ((N - df + 1) * 1e6) // (df + 1) capped at
    ``_IDF_CAP`` (the log is dropped — rank-preserving per term; the cap
    bounds idf*tfn below 2^63), and all divisions are integer floor
    divisions of nonnegative operands. k1=1.2, b=0.75 as published.

    Plan: one tokenize pass builds the per-doc scalar stats table
    (doc_id, dl, tf per term) — pinned once, ~48 B/doc; global stats
    (N, total_dl, df per term) fold from ONE wide partial row per batch
    (driver holds a handful of ints); scoring + per-batch partial top-k
    means the final reduce sees k rows per block, never the corpus."""
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"]).map_batches(
        # postings/stats are keyed on the doc id — NULL identifies nothing
        lambda t: t.filter(pc.is_valid(t.column("doc_id"))),
        batch_format="pyarrow",
    )
    nt = len(terms)
    term_arr = pa.array(terms, pa.string())

    def stats(t: pa.Table) -> pa.Table:
        toks = _token_lists(t).combine_chunks()
        flat = toks.flatten()
        sizes = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        nd = t.num_rows
        tf = np.zeros((nd, nt), dtype=np.int64)
        if len(flat) > 0:
            parents = np.repeat(np.arange(nd), sizes)
            idx = pc.index_in(flat, value_set=term_arr).to_numpy(
                zero_copy_only=False
            )  # NaN for non-query tokens
            hit = ~np.isnan(idx)
            if hit.any():
                np.add.at(
                    tf.reshape(-1),
                    parents[hit] * nt + idx[hit].astype(np.int64),
                    1,
                )
        cols = {
            "doc_id": t.column("doc_id"),
            "dl": pa.array(sizes.astype(np.int64)),
        }
        for j in range(nt):
            cols[f"tf{j}"] = pa.array(tf[:, j])
        return pa.table(cols)

    s = docs.map_batches(stats, batch_format="pyarrow").materialize()

    def partial_global(t: pa.Table) -> pa.Table:
        row = {
            "n": pa.array([t.num_rows], pa.int64()),
            "total_dl": pa.array(
                [int(pc.sum(t.column("dl")).as_py() or 0)], pa.int64()
            ),
        }
        for j in range(nt):
            row[f"df{j}"] = pa.array(
                [
                    int(
                        pc.sum(
                            pc.cast(pc.greater(t.column(f"tf{j}"), 0), pa.int64())
                        ).as_py()
                        or 0
                    )
                ],
                pa.int64(),
            )
        return pa.table(row)

    g = {"n": 0, "total_dl": 0, **{f"df{j}": 0 for j in range(nt)}}
    for b in s.map_batches(partial_global, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k in g:
            g[k] += int(pc.sum(b.column(k)).as_py() or 0)
    if g["n"] == 0 or g["total_dl"] == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )
    avgdl_m = (g["total_dl"] * 1000) // g["n"]
    idf = np.array(
        [
            min(((g["n"] - g[f"df{j}"] + 1) * _SCALE) // (g[f"df{j}"] + 1), _IDF_CAP)
            for j in range(nt)
        ],
        dtype=np.int64,
    )
    g_ref = ray.put((avgdl_m, idf))

    def score_topk(t: pa.Table) -> pa.Table:
        avgdl_m, idf = ray.get(g_ref)
        dl = t.column("dl").to_numpy(zero_copy_only=False)
        norm_m = 1000 - _B + (_B * dl * 1000) // avgdl_m
        score = np.zeros(t.num_rows, dtype=np.int64)
        for j in range(nt):
            tf = t.column(f"tf{j}").to_numpy(zero_copy_only=False)
            tfn = (tf * (_K1 + 1000) * _SCALE) // (
                tf * 1000 + (_K1 * norm_m) // 1000
            )
            score += np.where(tf > 0, (idf[j] * tfn) // _SCALE, 0)
        pos = score > 0
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[pos]
        sc = score[pos]
        order = np.lexsort((ids, -sc))[:top_k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order].astype(np.int64)),
                "score": pa.array(sc[order].astype(np.int64)),
            }
        )

    parts = list(
        s.map_batches(score_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    allp = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )
    )
    ids = allp.column("doc_id").to_numpy(zero_copy_only=False)
    sc = allp.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:top_k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order].astype(np.int64)),
            "score": pa.array(sc[order].astype(np.int64)),
        }
    )


def _bm25_ctes(terms: tuple[str, ...] = _QUERY_TERMS) -> str:
    """The WITH-clause body (toks .. scored) shared by the BM25 oracle and
    the hybrid-RRF oracle."""
    nt = len(terms)
    tf_defs = ",\n           ".join(
        f"count(*) FILTER (WHERE token = '{t}') AS tf{j}" for j, t in enumerate(terms)
    )
    tf_coal = ",\n         ".join(
        f"coalesce(t.tf{j}, 0) AS tf{j}" for j in range(nt)
    )
    df_defs = ",\n         ".join(
        f"count(*) FILTER (WHERE tf{j} > 0) AS df{j}" for j in range(nt)
    )
    score_terms = "\n    + ".join(
        f"""(CASE WHEN tf{j} > 0 THEN
        (LEAST(((g.n - g.df{j} + 1) * {_SCALE}) // (g.df{j} + 1), {_IDF_CAP})
         * ((tf{j} * {_K1 + 1000} * {_SCALE})
            // (tf{j} * 1000 + ({_K1} * (1000 - {_B} + ({_B} * dl * 1000) // ((g.total_dl * 1000) // g.n))) // 1000)))
        // {_SCALE} ELSE 0 END)"""
        for j in range(nt)
    )
    return f"""toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '\\S+')) AS token
  FROM documents WHERE doc_id IS NOT NULL
),
perdoc AS (
  SELECT doc_id, count(*) AS dl,
           {tf_defs}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT d.doc_id, coalesce(t.dl, 0) AS dl,
         {tf_coal}
  FROM documents d LEFT JOIN perdoc t USING (doc_id)
  WHERE d.doc_id IS NOT NULL
),
g AS (
  SELECT count(*) AS n, sum(dl) AS total_dl,
         {df_defs}
  FROM stats
),
scored AS (
  SELECT doc_id,
    {score_terms} AS score
  FROM stats, g
)"""


def _bm25_sql(terms: tuple[str, ...] = _QUERY_TERMS) -> str:
    return f"""
WITH {_bm25_ctes(terms)}
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {_TOP_K}
"""


BM25_TOPK_SQL = _bm25_sql()
