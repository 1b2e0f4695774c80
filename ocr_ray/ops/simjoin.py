"""Exact set-similarity self-join (prefix filtering) + exact cosine dup pairs.

The LSH family in ``ops/dedup.py`` is probabilistic: a true near-dup pair can
miss every band bucket, so those queries cannot be gated against an exact SQL
oracle. This module adds the EXACT siblings — the ground-truth operators a
pipeline uses to validate (and, at moderate scale, replace) the approximate
ones:

* ``dedup_jaccard_exact`` — word-3-gram Jaccard >= t dedup with GUARANTEED
  recall via prefix filtering (AllPairs / PPJoin family, Bayardo et al.
  WWW'07; Xiao et al. WWW'08): order every doc's shingles by a global
  (document-frequency, shingle) key, emit only the first
  ``|S| - ceil(t*|S|) + 1`` shingles; two sets with Jaccard >= t MUST share a
  prefix token under any fixed global order, so grouping prefix rows by
  shingle yields a candidate set with zero false negatives. Rare-first
  ordering keeps hot shingles out of prefixes, so candidate groups stay small
  at scale. Verification is integer-exact: ``10000*|A∩B| >= t_bp*|A∪B|`` —
  no float boundary, so the DuckDB oracle (same predicate over the same
  string shingle sets, connected components via a recursive-CTE closure)
  matches hash-for-hash.
* ``dedup_cosine_exact`` — all-pairs cosine >= t over the embeddings table
  via a broadcast-matrix block product (``ray.put`` the normalized corpus
  once, per-batch GEMM in every task — the ``ann_topk`` pattern turned into a
  self-join). O(n^2/p) compute: the ground-truth tool for <= ~10^7 vectors;
  ``embedding_near_dups`` (hyperplane LSH) is the larger-scale approximation
  it calibrates.

Reference semantics generalized: the reference dedups by exact key equality
only (save-to-google-sheet.ts:146-184); these operators extend "same key" to
"provably similar" while keeping deterministic, driver-verifiable outputs.

Scale notes: shingle/prefix/pair rows are (string, id) tuples — text payload
never transits a shuffle except onto O(candidate) verify rows; the per-doc
prefix selection runs in ``map_groups`` co-located by doc_id (group size =
shingles per doc, bounded by doc length); components reuse the distributed
min-label propagation from ``ops/dedup``.
"""

from __future__ import annotations

import logging
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count

from ocr_ray.ops.dedup import (
    _coerce_schema,
    _dyn_parts,
    _paired_with,
    propagate_min_labels,
    survivors_dataset,
    _losers_from_labels,
)

logger = logging.getLogger(__name__)

_T_BP = 7000  # Jaccard threshold, basis points
_COS_T = 0.95
# ASCII \S+ tokenizer: matches DuckDB/RE2 regexp_extract_all('\S+') exactly
# (Python's default \S is unicode-aware; RE2's is ASCII)
_TOKEN_RE = re.compile(r"\S+", re.ASCII)


def word_grams(text: str, k: int = 3) -> list[str]:
    """Distinct word-k-gram STRING shingles (no hashing — the SQL oracle
    computes the identical sets, and exactness must not ride on crc32
    collision luck). <k tokens -> the single joined gram; no tokens -> []."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def _gram_rows(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    ids, grams = [], []
    for did, text in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        for g in word_grams(text):
            ids.append(did)
            grams.append(g)
    return pa.table(
        {
            "doc_id": pa.array(ids, batch.schema.field(id_col).type),
            "shingle": pa.array(grams, pa.string()),
        }
    )


def _prefix_len(n: int, t_bp: int) -> int:
    # |S| - ceil(t*|S|) + 1 == |S| + floor(-t*|S|) + 1, integer-exact
    return n + (-(t_bp * n) // 10_000) + 1


def jaccard_dup_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = _T_BP,
) -> Dataset:
    """All pairs (a < b) with word-3-gram Jaccard >= threshold — EXACT.

    grams -> document-frequency census -> rare-first per-doc prefix ->
    shingle-grouped candidates -> integer-exact verify on string sets.
    Every stage is a Dataset op; only pair rows carry text (onto O(candidate)
    verify rows via two hash joins)."""
    id_type = ds.schema().base_schema.field(id_col).type
    grams = ds.map_batches(
        lambda t: _gram_rows(t, text_col, id_col), batch_format="pyarrow"
    ).materialize()

    # document frequency per shingle; (df, shingle) is the global total order
    n_grams = grams.count()
    parts = _dyn_parts(n_grams)
    # distinct right-side key name (same-named keys survive as duplicate
    # columns in Ray's join output) + schema coercion (groupby outputs can
    # carry zero-column empty blocks, which crash a downstream join)
    freq = _coerce_schema(
        grams.groupby("shingle")
        .aggregate(Count(alias_name="df"))
        .map_batches(
            lambda t: pa.table({"__s": t.column("shingle"), "df": t.column("df")}),
            batch_format="pyarrow",
        ),
        pa.schema([("__s", pa.string()), ("df", pa.int64())]),
        parts,
    )
    g_schema = pa.schema(
        [("doc_id", id_type), ("shingle", pa.string()), ("df", pa.int64())]
    )
    with_df = _coerce_schema(
        grams.join(
            freq, join_type="inner", num_partitions=parts,
            on=("shingle",), right_on=("__s",),
        ),
        g_schema,
        parts,
    )

    def per_doc_prefix(t: pa.Table) -> pa.Table:
        # one group = one doc's shingles; rare-first order, keep the prefix
        order = pc.sort_indices(
            t, sort_keys=[("df", "ascending"), ("shingle", "ascending")]
        )
        p = _prefix_len(t.num_rows, threshold_bp)
        kept = t.take(order[:p])
        return pa.table(
            {"shingle": kept.column("shingle"), "doc_id": kept.column("doc_id")}
        )

    prefixes = with_df.groupby("doc_id").map_groups(
        per_doc_prefix, batch_format="pyarrow"
    )

    # Hash prefix shingles to int64 bucket keys and reuse the UNCAPPED
    # collision-census pair generator from ops/dedup (census finds buckets
    # with >= 2 members; pair fan-out runs only over those — most prefix
    # shingles are singletons, and a per-shingle map_groups over all of them
    # would pay the per-group Python call for every singleton). A 64-bit
    # hash collision can only ADD a candidate pair, which exact verification
    # then rejects — recall is unaffected.
    import hashlib as _hl

    def hash_rows(t: pa.Table) -> pa.Table:
        keys = [
            int.from_bytes(_hl.blake2b(s.encode(), digest_size=8).digest(), "big") >> 1
            for s in t.column("shingle").to_pylist()
        ]
        return pa.table(
            {
                "band_hash": pa.array(keys, pa.int64()),
                "doc_id": t.column("doc_id"),
            }
        )

    from ocr_ray.ops.dedup import candidate_pairs

    pair_schema = pa.schema([("a", id_type), ("b", id_type)])
    cand = candidate_pairs(
        prefixes.map_batches(hash_rows, batch_format="pyarrow"),
        id_type=id_type,
        max_bucket=None,
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return cand
    vparts = _dyn_parts(n_cand)
    texts_kv = ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column(id_col), "sig": t.column(text_col)}
        ),
        batch_format="pyarrow",
    )
    j, s1 = _paired_with(
        cand, texts_kv, "a", "sig", "text_a",
        left_schema=pair_schema, payload_type=pa.string(), parts=vparts,
    )
    j, _ = _paired_with(
        j, texts_kv, "b", "sig", "text_b", left_schema=s1,
        payload_type=pa.string(), parts=vparts,
    )

    def check(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["a", "b"])
        keep = []
        for x, y in zip(t.column("text_a").to_pylist(), t.column("text_b").to_pylist()):
            sa, sb = set(word_grams(x)), set(word_grams(y))
            inter = len(sa & sb)
            union = len(sa | sb)
            keep.append(10_000 * inter >= threshold_bp * union)
        return t.select(["a", "b"]).filter(pa.array(keep))

    return j.map_batches(check, batch_format="pyarrow")


def _empty_gram_losers(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """Docs with an EMPTY gram set are mutual dups (0 >= t*0): all but the
    min id lose. Prefix rows can't pair them (nothing to emit), so they get
    the exact aggregate treatment — mirroring the SQL predicate, under which
    two empty sets always satisfy 10000*|∩| >= t*|∪|."""
    from ray.data.aggregate import Min

    id_type = ds.schema().base_schema.field(id_col).type

    def empties(t: pa.Table) -> pa.Table:
        keep = [not word_grams(x) for x in t.column(text_col).to_pylist()]
        return pa.table({"doc_id": t.filter(pa.array(keep)).column(id_col)})

    em = ds.map_batches(empties, batch_format="pyarrow").materialize()
    if em.count() <= 1:
        return rd.from_arrow(pa.schema([("loser", id_type)]).empty_table())
    rep = em.aggregate(Min("doc_id"))["min(doc_id)"]
    return em.map_batches(
        lambda t: pa.table(
            {"loser": t.filter(pc.not_equal(t.column("doc_id"), pa.scalar(rep))).column("doc_id")}
        ),
        batch_format="pyarrow",
    )


def dedup_jaccard_exact(sf_dir: str, threshold_bp: int = _T_BP) -> Dataset:
    """queries() entry: survivors (min doc_id per component) of the EXACT
    word-3-gram Jaccard >= 0.7 dup graph over ``documents`` — guaranteed
    recall, hash-gated against the all-pairs DuckDB oracle."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).materialize()
    pairs = jaccard_dup_pairs(ds, threshold_bp=threshold_bp)
    labels = propagate_min_labels(pairs)
    losers = _losers_from_labels(labels).union(
        _empty_gram_losers(ds, "text", "doc_id")
    )
    ids = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}), batch_format="pyarrow"
    )
    return survivors_dataset(ids, losers)


# Same sets, same integer predicate, closure via recursive CTE (UNION dedups,
# so the reach relation terminates; dup components are small). list_distinct
# builds the shingle SET; list ops mirror word_grams incl. the <3-token and
# empty-text cases.
DEDUP_JACCARD_EXACT_SQL = f"""
WITH RECURSIVE grams AS (
  SELECT doc_id,
    CASE WHEN len(t) = 0 THEN []::VARCHAR[]
         WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_distinct(list_transform(range(1, len(t) - 1),
              i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
    END AS s
  FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS t
        FROM documents)
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE 10000 * len(list_intersect(a.s, b.s))
        >= {_T_BP} * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION SELECT b, a FROM pairs
),
reach(node, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
labels AS (
  SELECT node, least(node, min(r)) AS label FROM reach GROUP BY node
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d
LEFT JOIN labels l ON d.doc_id = l.node
WHERE l.node IS NULL OR l.label = d.doc_id
"""


# ---------------------------------------------------------------------------
# exact cosine self-join over the embeddings table
# ---------------------------------------------------------------------------


def cosine_dup_pairs(
    ds: Dataset, *, vec_col: str = "embedding", id_col: str = "vec_id",
    threshold: float = _COS_T,
) -> Dataset:
    """All pairs (a < b) with cosine >= threshold — exact block product.

    The normalized corpus matrix is ``ray.put`` ONCE (object-store shared
    memory, zero-copy per worker); each batch computes one (batch x corpus)
    GEMM and emits only qualifying pairs. O(n^2/p) flops by construction —
    the ground-truth tool; calibrates the LSH variant. Similarities are
    rounded to 9 decimals before the threshold compare so numpy and the SQL
    oracle agree at the boundary."""
    rows = ds.select_columns([id_col, vec_col]).take_all()  # corpus matrix: the broadcast side, like ann_topk's query matrix
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, m / norms))

    class BlockSim:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            from ocr_ray.ops.ann import _emb_matrix

            bm = _emb_matrix(batch.column(vec_col))
            bn = np.linalg.norm(bm, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            sims = np.round((bm / bn) @ self.m.T, 9)
            bi, cj = np.nonzero((sims >= threshold) & (bids[:, None] < self.ids[None, :]))
            return pa.table(
                {
                    "a": pa.array(bids[bi], pa.int64()),
                    "b": pa.array(self.ids[cj], pa.int64()),
                }
            )

    return ds.map_batches(
        BlockSim, batch_format="pyarrow", batch_size=512, concurrency=(1, 8),
        num_cpus=1,
    )


def cosine_rows_for_sf(sf_dir: str) -> int:
    from ocr_ray.sources.transcripts import n_convs_for_sf

    return min(2000, max(400, n_convs_for_sf(sf_dir) // 5))


def ensure_cosine_fixture(
    n: int, dim: int = 64, seed: int = 11, root: str = "/tmp/ocr_ray_fixtures"
) -> str:
    """Deterministic planted-dup vector fixture as parquet (Ray-free write:
    the oracle builder may run before any Dataset exists). Reuses the
    bigvecs generator: every 20th vector is a perturbed copy (cosine >
    0.999) of the one 19 back; at dim=64 random pairs top out near cosine
    ~0.67 over millions of draws, far from the 0.95 threshold, so the
    planted components are the exact dup graph.

    The shared testdata ``embeddings`` table is NOT usable here: its vectors
    are independent draws (measured max pairwise cosine 0.51), so any dedup
    over it is the identity — a vacuous oracle."""
    import shutil

    import pyarrow.parquet as pq

    from ocr_ray.sources.bigdocs import vec_batch

    out = os.path.join(root, f"cosvecs_s{seed}_n{n}_d{dim}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(vec_batch(range(n), seed, dim), os.path.join(tmp, "part-0.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    open(marker, "w").close()
    return out


def dedup_cosine_exact(sf_dir: str) -> Dataset:
    """queries() entry: survivors of the EXACT cosine >= 0.95 dup graph over
    the planted-dup vector fixture (min vec_id per component)."""
    path = ensure_cosine_fixture(cosine_rows_for_sf(sf_dir))
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"]).materialize()
    pairs = cosine_dup_pairs(ds)
    labels = propagate_min_labels(pairs)
    losers = _losers_from_labels(labels)
    ids = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("vec_id")}), batch_format="pyarrow"
    )
    surv = survivors_dataset(ids, losers)
    return surv.map_batches(
        lambda t: pa.table({"vec_id": t.column("doc_id")}), batch_format="pyarrow"
    )


def dedup_cosine_exact_sql(sf_dir: str) -> str:
    path = ensure_cosine_fixture(cosine_rows_for_sf(sf_dir))
    return f"""
WITH RECURSIVE vecs AS (
  SELECT vec_id, embedding FROM read_parquet('{path}/*.parquet')
),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding, b.embedding), 9) >= {_COS_T}
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION SELECT b, a FROM pairs
),
reach(node, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
labels AS (
  SELECT node, least(node, min(r)) AS label FROM reach GROUP BY node
)
SELECT CAST(v.vec_id AS BIGINT) AS vec_id
FROM vecs v
LEFT JOIN labels l ON v.vec_id = l.node
WHERE l.node IS NULL OR l.label = v.vec_id
"""
