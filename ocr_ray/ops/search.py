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


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and dense cosine
# ---------------------------------------------------------------------------

_RRF_K = 60  # the published RRF constant (Cormack et al. 2009)
_RRF_DEPTH = 50  # per-retriever candidate depth
_RRF_TOP = 10
_RRF_SCALE = 1_000_000  # integer surrogate: floor(1e6 / (K + rank))
_RRF_QUERY_VEC = 0  # dense query = the embedding of vec_id 0 (deterministic)


def hybrid_rrf_topk(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: fuse the BM25 lexical ranking (fixed term query
    over ``documents``) with a dense cosine ranking (fixed query vector
    over ``embeddings``; vec_id is the doc_id of the embedded document) by
    reciprocal-rank fusion — the standard first-stage hybrid of a modern
    retrieval stack (completes the family: inverted index → BM25 → ANN →
    fusion). RRF score = Σ_retrievers floor(1e6 / (60 + rank)), ranks from
    each retriever's top-50; a document missing from one list contributes
    only the other term (truncated-list RRF, the published form).

    Distribution: both retrievers are the existing bounded-shuffle plans
    (BM25: per-batch stats + partial top-k; dense: per-batch GEMM + local
    top-k under the FINAL (rounded sim, id) order — a total order, so
    per-batch prefixes compose exactly); fusion itself touches only
    2×depth driver rows. Integer fusion scores make the hash gate
    reduction-order independent; dense ordering reuses the 6-dp rounding
    contract the gated ``ann_topk`` established vs DuckDB.

    Contract (mirrored): NULL doc_id / embedding rows are excluded; BM25
    ranks only score > 0 docs."""
    import os as _os

    lex = bm25_topk(sf_dir, top_k=_RRF_DEPTH)
    lex_ranks = {
        d: r + 1 for r, d in enumerate(lex.column("doc_id").to_pylist())
    }

    emb = rd.read_parquet(
        _os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    qrow = emb.filter(expr=f"vec_id == {_RRF_QUERY_VEC}").take_all()
    if not qrow:
        # designated query vector absent/NULL -> dense list is empty and
        # fusion degrades to lexical-only (the SQL's empty dq CTE does the
        # same through the outer join)
        dense_ranks: dict[int, int] = {}
        return _rrf_fuse(lex_ranks, dense_ranks)
    q = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def dense_partial(t: pa.Table) -> pa.Table:
        qn = ray.get(q_ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat = t.column("embedding").combine_chunks()
        dim = len(qn)
        m = np.asarray(flat.flatten(), dtype=np.float64).reshape(-1, dim)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qn) / norms
        # select under the FINAL total order (rounded sim desc, id asc) so
        # per-batch prefixes compose into the exact global prefix
        r6 = np.array([round(s, 6) for s in sims])
        order = np.lexsort((ids, -r6))[:_RRF_DEPTH]
        return pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "sim": pa.array(r6[order], pa.float64()),
            }
        )

    cand = []
    for b in emb.map_batches(dense_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        cand.append(b)
    allc = pa.concat_tables(cand)
    ids = allc.column("vec_id").to_numpy(zero_copy_only=False)
    sims = allc.column("sim").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims))[:_RRF_DEPTH]
    dense_ranks = {int(ids[i]): r + 1 for r, i in enumerate(order)}

    return _rrf_fuse(lex_ranks, dense_ranks)


def _rrf_fuse(lex_ranks: dict, dense_ranks: dict) -> pa.Table:
    fused = []
    for d in set(lex_ranks) | set(dense_ranks):
        lr = lex_ranks.get(d)
        dr = dense_ranks.get(d)
        score = (_RRF_SCALE // (_RRF_K + lr) if lr else 0) + (
            _RRF_SCALE // (_RRF_K + dr) if dr else 0
        )
        fused.append((int(d), score, lr, dr))
    fused.sort(key=lambda r: (-r[1], r[0]))
    top = fused[:_RRF_TOP]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in top], pa.int64()),
            "rrf_score": pa.array([r[1] for r in top], pa.int64()),
            "lex_rank": pa.array([r[2] for r in top], pa.int64()),
            "dense_rank": pa.array([r[3] for r in top], pa.int64()),
        }
    )


def _rrf_sql(terms: tuple[str, ...] = _QUERY_TERMS) -> str:
    return f"""
WITH {_bm25_ctes(terms)},
lrank AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
    FROM scored WHERE score > 0
  ) WHERE r <= {_RRF_DEPTH}
),
dq AS (
  SELECT embedding AS qe FROM embeddings
  WHERE vec_id = {_RRF_QUERY_VEC} AND embedding IS NOT NULL
),
dsim AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], dq.qe::DOUBLE[]), 6) AS sim
  FROM embeddings e CROSS JOIN dq
  WHERE e.embedding IS NOT NULL AND e.vec_id IS NOT NULL
),
drank AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS r FROM dsim
  ) WHERE r <= {_RRF_DEPTH}
),
f AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         l.r AS lex_rank, d.r AS dense_rank,
         coalesce({_RRF_SCALE} // ({_RRF_K} + l.r), 0)
           + coalesce({_RRF_SCALE} // ({_RRF_K} + d.r), 0) AS rrf_score
  FROM lrank l FULL OUTER JOIN drank d ON l.doc_id = d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rrf_score AS BIGINT) AS rrf_score,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(dense_rank AS BIGINT) AS dense_rank
FROM f
ORDER BY rrf_score DESC, doc_id
LIMIT {_RRF_TOP}
"""


HYBRID_RRF_SQL = _rrf_sql()
