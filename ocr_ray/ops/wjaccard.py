"""Weighted-Jaccard near-dup family over token term-frequency multisets.

``J_w(A, B) = sum_t min(tf_A(t), tf_B(t)) / sum_t max(tf_A(t), tf_B(t))
            = inter / (|A| + |B| - inter)`` with ``inter`` the summed min
over shared tokens and ``|X|`` the doc's total token count — the multiset
generalization of the set Jaccard used by ``ops.simjoin`` (repeated
boilerplate phrases weigh in proportionally instead of collapsing to one
shingle).  Two operators:

* ``dedup_wjaccard_exact`` — EXACT survivors via a distributed
  token-postings self-join (tf census -> postings join -> pair fold ->
  threshold -> min-label components).  DuckDB-mirrored and driver-gated.
  Worst case is inherently quadratic in document frequency, so the op is
  size-gated as the calibration sibling (same contract as
  ``dedup_cosine_exact``); the scale path is the ICWS variant below.
* ``dedup_wjaccard_docs`` — ICWS (Ioffe, "Improved Consistent Sampling,
  Weighted Minhash and L1 Sketching", ICDM 2010) consistent weighted
  sampling signatures + the shared LSH banding / join-verify / min-label
  machinery of ``ops.dedup`` (``near_dup_from_signatures``).  Per-element
  signature collision probability equals ``J_w``, so the verify
  threshold semantics carry over unchanged.

Tokenization matches the gated set-Jaccard convention exactly
(``lower()`` + ASCII ``\\S+``), so the SQL mirror computes identical
multisets.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ocr_ray.ops.dedup import (
    _losers_from_labels,
    _mix_fin,
    near_dup_from_signatures,
    propagate_min_labels,
    survivors_dataset,
)
from ocr_ray.ops.simjoin import _empty_gram_losers

_TOKEN_RE = re.compile(r"\S+", re.ASCII)
_T_BP = 7000
_WJ_EXACT_MAX_DOCS = 200_000  # calibration-sibling gate (postings join is
# O(sum_t df_t^2) worst case — quadratic under a corpus-wide hot token)
_ICWS_K = 128  # same default width as the unweighted MinHash family
# (16 bands x 8 rows, LSH threshold ~0.71; verify noise std at J=0.7 is
# sqrt(0.21/128) ~ 0.04)
_ICWS_SEED = 905
_P = np.uint64((1 << 61) - 1)  # same empty-signature sentinel as ops.dedup


def _tokens(text) -> list:
    return _TOKEN_RE.findall((text or "").lower())


def _tf_rows(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(doc_id, tok, n) term-frequency census rows, one per distinct token."""
    from collections import Counter

    ids, toks, ns = [], [], []
    for did, x in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        if did is None:
            continue
        for tok, n in Counter(_tokens(x)).items():
            ids.append(did)
            toks.append(tok)
            ns.append(n)
    return pa.table(
        {
            "doc_id": pa.array(ids, t.schema.field(id_col).type),
            "tok": pa.array(toks, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def wjaccard_dup_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = _T_BP,
) -> Dataset:
    """All pairs (a < b) with weighted Jaccard >= threshold — EXACT.

    tf census -> postings self-join on the token (hash join; token rows,
    never documents, transit the shuffle) -> per-pair fold of
    ``min(n_a, n_b)`` -> integer threshold using
    ``10000 * inter >= t * (s_a + s_b - inter)``.  Totals are broadcast
    (one int64 per doc)."""
    import ray as _ray

    from ocr_ray.functions.joins import hash_join

    id_type = ds.schema().base_schema.field(id_col).type
    tf = ds.map_batches(
        lambda t: _tf_rows(t, text_col, id_col), batch_format="pyarrow"
    ).materialize()

    # totals: one row per doc with tokens; broadcast (bounded by the gate)
    tot_tbl = (
        tf.groupby("doc_id")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "s"]), batch_format="pyarrow"
        )
        .materialize()
    )
    # one int64 per doc, bounded by the op's size gate — broadcast once
    totals = {r["doc_id"]: r["s"] for r in tot_tbl.take_all()}
    tot_ref = _ray.put(totals)

    right = tf.map_batches(
        lambda t: t.rename_columns(["b_doc", "tok", "b_n"]), batch_format="pyarrow"
    )
    joined = hash_join(tf, right, on="tok")

    def fold(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("doc_id"), t.column("b_doc"))
        t = t.filter(keep)
        m = pc.min_element_wise(t.column("n"), t.column("b_n"))
        return pa.table({"a": t.column("doc_id"), "b": t.column("b_doc"), "i": m})

    pair_inter = (
        joined.map_batches(fold, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("i")
        .map_batches(
            lambda t: t.rename_columns(["a", "b", "inter"]), batch_format="pyarrow"
        )
    )

    def threshold(t: pa.Table, _r=tot_ref) -> pa.Table:
        tot = _ray.get(_r)
        sa = pa.array([tot[x] for x in t.column("a").to_pylist()], pa.int64())
        sb = pa.array([tot[x] for x in t.column("b").to_pylist()], pa.int64())
        inter = t.column("inter")
        lhs = pc.multiply(pa.scalar(10_000, pa.int64()), inter)
        union = pc.subtract(pc.add(sa, sb), inter)
        rhs = pc.multiply(pa.scalar(threshold_bp, pa.int64()), union)
        return t.filter(pc.greater_equal(lhs, rhs)).select(["a", "b"])

    return pair_inter.map_batches(threshold, batch_format="pyarrow")


def dedup_wjaccard_exact(sf_dir: str, threshold_bp: int = _T_BP) -> Dataset:
    """queries() entry: survivors (min doc_id per component) of the EXACT
    weighted-Jaccard >= 0.7 dup graph over ``documents`` — guaranteed
    recall, hash-gated against the all-pairs DuckDB oracle. Size-gated as
    the calibration sibling; use ``dedup_wjaccard_docs`` at scale."""
    ds = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(
            lambda t: t.filter(pc.is_valid(t.column("doc_id"))),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = ds.count()
    if n > _WJ_EXACT_MAX_DOCS:
        raise ValueError(
            f"dedup_wjaccard_exact is the size-gated calibration sibling "
            f"({n} docs > {_WJ_EXACT_MAX_DOCS}); use dedup_wjaccard_docs "
            f"(ICWS + LSH) at this scale"
        )
    pairs = wjaccard_dup_pairs(ds, threshold_bp=threshold_bp)
    labels = propagate_min_labels(pairs)
    losers = _losers_from_labels(labels).union(
        _empty_gram_losers(ds, "text", "doc_id")
    )
    ids = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}), batch_format="pyarrow"
    )
    return survivors_dataset(ids, losers)


# Multiset analog of DEDUP_JACCARD_EXACT_SQL: tf census join instead of
# list_intersect; empty-token docs are mutual dups (0 >= t*0), handled as
# their own component exactly like the Ray side's _empty_gram_losers.
DEDUP_WJACCARD_EXACT_SQL = f"""
WITH RECURSIVE tf AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '\\S+')) AS tok
  FROM documents WHERE doc_id IS NOT NULL
),
tfc AS (SELECT doc_id, tok, COUNT(*) AS n FROM tf GROUP BY doc_id, tok),
tot AS (
  SELECT d.doc_id, coalesce(s.s, 0) AS s
  FROM documents d
  LEFT JOIN (SELECT doc_id, SUM(n) AS s FROM tfc GROUP BY doc_id) s
    ON d.doc_id = s.doc_id
  WHERE d.doc_id IS NOT NULL
),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, SUM(least(a.n, b.n)) AS i
  FROM tfc a JOIN tfc b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT p.a, p.b
  FROM inter p
  JOIN tot ta ON ta.doc_id = p.a
  JOIN tot tb ON tb.doc_id = p.b
  WHERE 10000 * p.i >= {_T_BP} * (ta.s + tb.s - p.i)
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
SELECT CAST(t.doc_id AS BIGINT) AS doc_id
FROM tot t
LEFT JOIN labels l ON t.doc_id = l.node
WHERE (l.node IS NULL OR l.label = t.doc_id)
  AND (t.s > 0 OR t.doc_id = (SELECT MIN(doc_id) FROM tot WHERE s = 0))
"""


# ---------------------------------------------------------------------------
# ICWS signatures (the scale path)
# ---------------------------------------------------------------------------

_TOK_CHUNK = 4096  # token-block size for the per-doc (m x K) matrices


def _icws_consts(n_perm: int, seed: int = _ICWS_SEED) -> np.ndarray:
    """(n_perm * 5) xor constants — 5 independent uniforms per (token,
    perm): two for r ~ Gamma(2,1), two for c ~ Gamma(2,1), one for beta."""
    rs = np.random.RandomState(seed)
    return rs.randint(0, 1 << 63, size=n_perm * 5, dtype=np.int64).astype(np.uint64)


def _uniforms(h: np.ndarray, consts: np.ndarray) -> np.ndarray:
    """(m,) token hashes -> (m, len(consts)) uniforms in (0, 1)."""
    mixed = _mix_fin(h[:, None] ^ consts[None, :])
    # 53-bit mantissa; +0.5 ulp shift keeps log() off exact zero
    return (mixed >> np.uint64(11)).astype(np.float64) * (2.0**-53) + 2.0**-54


def _icws_doc(h: np.ndarray, w: np.ndarray, consts: np.ndarray, n_perm: int) -> np.ndarray:
    """One doc's ICWS signature: (n_perm,) uint64.

    For each perm k and token t (weight w_t > 0):
      r, c ~ Gamma(2,1);  beta ~ U(0,1)   (deterministic in (t, k))
      t* = floor(ln w / r + beta);  ln y = r (t* - beta);
      ln a = ln c - ln y - r
    The minimizing token (with its t*) is the sample; its collision
    probability across two docs is exactly J_w (Ioffe 2010, Thm. 1)."""
    sig = np.empty(n_perm, np.uint64)
    best = np.full(n_perm, np.inf)
    best_tok = np.zeros(n_perm, np.uint64)
    best_t = np.zeros(n_perm, np.int64)
    lnw_all = np.log(w)
    for s in range(0, len(h), _TOK_CHUNK):
        hc = h[s : s + _TOK_CHUNK]
        u = _uniforms(hc, consts).reshape(len(hc), n_perm, 5)
        r = -(np.log(u[:, :, 0]) + np.log(u[:, :, 1]))
        lnc = np.log(-(np.log(u[:, :, 2]) + np.log(u[:, :, 3])))
        beta = u[:, :, 4]
        t_star = np.floor(lnw_all[s : s + _TOK_CHUNK, None] / r + beta)
        ln_y = r * (t_star - beta)
        ln_a = lnc - ln_y - r
        am = np.argmin(ln_a, axis=0)
        cand = ln_a[am, np.arange(n_perm)]
        upd = cand < best
        best[upd] = cand[upd]
        best_tok[upd] = hc[am[upd]]
        best_t[upd] = t_star[am[upd], np.flatnonzero(upd)].astype(np.int64)
    np.copyto(sig, _mix_fin(best_tok ^ best_t.astype(np.uint64)))
    return sig


def _icws_batch(
    batch: pa.Table, text_col: str, id_col: str, n_perm: int
) -> pa.Table:
    """Vectorized tokenize+hash+tf (Arrow split kernel, fixed-key siphash,
    lexsort run-length census — no per-token Python); the per-doc ICWS
    reduction is one numpy call per doc."""
    import pandas.util as pdu

    from ocr_ray.ops.corpus import _token_lists

    consts = _icws_consts(n_perm)
    n_docs = batch.num_rows
    sigs = np.full((n_docs, n_perm), _P, dtype=np.uint64)  # sentinel rows
    lists = _token_lists(batch, text_col)
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    flat = la.flatten()
    if len(flat):
        parents = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
        h64 = pdu.hash_array(
            flat.to_numpy(zero_copy_only=False), categorize=False
        ).astype(np.uint64)
        order = np.lexsort((h64, parents))
        p_s, h_s = parents[order], h64[order]
        new = np.empty(len(p_s), bool)
        new[0] = True
        new[1:] = (p_s[1:] != p_s[:-1]) | (h_s[1:] != h_s[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(p_s))).astype(np.float64)
        d_parent, d_hash = p_s[starts], h_s[starts]
        bounds = np.searchsorted(d_parent, np.arange(n_docs + 1))
        for i in range(n_docs):
            s, e = bounds[i], bounds[i + 1]
            if s < e:
                sigs[i] = _icws_doc(d_hash[s:e], counts[s:e], consts, n_perm)
    flat_sig = pa.array(sigs.ravel(), pa.uint64())
    offs = pa.array(
        np.arange(0, (n_docs + 1) * n_perm, n_perm, dtype=np.int32)
    )
    return pa.table(
        {"doc_id": batch.column(id_col), "sig": pa.ListArray.from_arrays(offs, flat_sig)}
    )


def icws_signatures(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perms: int = _ICWS_K,
) -> Dataset:
    """token-TF multisets -> ICWS weighted-MinHash signatures (uint64
    list), drop-in compatible with ``ops.dedup``'s banding/verify tail."""
    if n_perms % 8 != 0:
        raise ValueError("n_perms must be a multiple of 8 (rows/band)")
    return ds.map_batches(
        _icws_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "n_perm": n_perms},
        batch_format="pyarrow",
        batch_size=256,
    )


def weighted_near_dup_survivors(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = _T_BP,
    n_perms: int = _ICWS_K,
) -> Dataset:
    """ICWS signatures -> shared LSH/verify/component tail -> survivors."""
    sigs = icws_signatures(
        ds, text_col=text_col, id_col=id_col, n_perms=n_perms
    ).materialize()
    return near_dup_from_signatures(sigs, threshold_bp=threshold_bp)


def dedup_wjaccard_docs(sf_dir: str) -> Dataset:
    """queries() entry: weighted-Jaccard near-dup survivors over
    ``documents`` via ICWS + LSH — the scale path (pytest-calibrated
    against ``dedup_wjaccard_exact``)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("doc_id"))),
        batch_format="pyarrow",
    )
    return weighted_near_dup_survivors(ds)
