"""Approximate-nearest-neighbor search over the ``embeddings`` table.

* ``ann_topk`` — exact brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and keeps a
  LOCAL top-k per query (so only k*n_queries candidate rows per batch leave
  the stage), then a tiny grouped re-rank produces the final top-k. This is
  the baseline/oracle path and is SQL-checkable via DuckDB's
  ``list_cosine_similarity``.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH buckets shrink
  the candidate set; exact cosine re-rank within matching buckets. Recall
  is probed in tests against the brute-force result.

Scale notes: compute is one (batch x dim) @ (dim x n_queries) GEMM per
batch; candidate traffic is O(k * n_queries) per batch regardless of corpus
size. An IVF variant would replace the hyperplane bucketer with k-means
centroids (same dataflow).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_K = 5
_N_QUERIES = 3  # queries = embeddings with vec_id < 3 (deterministic)


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """``list<float>`` column -> (n, dim) float64 matrix straight from the
    Arrow values buffer (no per-row Python objects; ``flatten`` respects
    slice offsets). Embedding lists are uniform-length and non-null."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(n, -1)


def _load_queries(sf_dir: str) -> tuple[np.ndarray, list[int]]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    t = t.filter(
        pa.compute.and_(
            pa.compute.less(t.column("vec_id"), _N_QUERIES),
            pa.compute.is_valid(t.column("embedding")),
        )
    )
    ids = t.column("vec_id").to_pylist()
    q = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return q, ids


class _BruteScorer:
    """Actor: batch embeddings x broadcast query matrix -> local top-k rows."""

    def __init__(self, ref, k: int):
        q, ids = ray.get(ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qids = ids
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = en @ self.qn.T  # (batch, n_queries)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims.shape[0])
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            idx = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for i in idx:
                out_q.append(qid)
                out_v.append(int(vec_ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    t = group.sort_by([("sim", "descending"), ("vec_id", "ascending")]).slice(0, k)
    sims = [round(s, 6) for s in t.column("sim").to_pylist()]
    return pa.table(
        {
            "query_id": t.column("query_id"),
            "vec_id": t.column("vec_id"),
            "sim": pa.array(sims, pa.float64()),
        }
    )


def ann_topk(sf_dir: str, k: int = _K):
    """Exact cosine top-k per query (self-match included; ties break by
    vec_id). ``sim`` rounded to 6 dp to keep the value-hash float-stable."""
    import functools

    ref = ray.put(_load_queries(sf_dir))
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        # similarity is defined over present vectors with a real id — NULLs
        # have no geometry (SQL mirror filters identically)
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    cand = ds.map_batches(
        _BruteScorer,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    )
    return cand.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )


def ann_topk_over(ds, *, n_queries: int = 64, k: int = 10):
    """Brute-force cosine top-k over an arbitrary (vec_id, embedding)
    Dataset — the volume-bench entry (same plan as ``ann_topk``: broadcast
    query matrix, per-batch GEMM + local top-k, tiny grouped re-rank).
    Queries = the ``n_queries`` smallest vec_ids (deterministic)."""
    import functools

    head = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    ids = [r["vec_id"] for r in head]
    q = np.asarray([r["embedding"] for r in head], dtype=np.float64)
    ref = ray.put((q, ids))
    cand = ds.map_batches(
        _BruteScorer,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 16),
        num_cpus=1,
    )
    return cand.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )


ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id < 3 AND embedding IS NOT NULL
), s AS (
  SELECT q.query_id,
         e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS raw_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.embedding IS NOT NULL AND e.vec_id IS NOT NULL
)
SELECT query_id, vec_id, ROUND(raw_sim, 6) AS sim
FROM s
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY raw_sim DESC, vec_id) <= 5
"""


def _kmeans_fit(x: np.ndarray, n_centroids: int, seed: int = 5, iters: int = 5) -> np.ndarray:
    """Tiny deterministic k-means (fixed seed + iteration count) for IVF —
    the local reference implementation ``kmeans_fit_ray`` is tested against."""
    rs = np.random.RandomState(seed)
    cent = x[rs.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = x @ cent.T  # cosine on normalized vectors
        assign = d.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _kmeans_partials(batch: pa.Table, cent: np.ndarray) -> pa.Table:
    """One assignment pass over a batch -> per-centroid partial (sum, count).

    Output is O(n_centroids x dim) per batch regardless of batch size — the
    combiner shape that lets the fit scale to any sample size."""
    en = _emb_matrix(batch.column("embedding"))
    en = en / np.linalg.norm(en, axis=1, keepdims=True)
    assign = (en @ cent.T).argmax(axis=1)
    k, dim = cent.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, en)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    present = np.flatnonzero(counts)
    flat = pa.array(sums[present].ravel(), pa.float64())
    offs = pa.array(np.arange(0, (len(present) + 1) * dim, dim, dtype=np.int32))
    return pa.table(
        {
            "cid": pa.array(present, pa.int32()),
            "vsum": pa.ListArray.from_arrays(offs, flat),
            "n": pa.array(counts[present], pa.int64()),
        }
    )


def kmeans_fit_ray(
    sample: "rd.Dataset", n_centroids: int, *, iters: int = 5, seed: int = 5
) -> np.ndarray:
    """Distributed k-means fit (cosine, on normalized vectors) over a SAMPLE
    Dataset with an ``embedding`` column.

    Per iteration: one ``map_batches`` pass emits per-batch per-centroid
    partial (sum, count) rows — O(n_centroids x dim) per batch — and the
    driver folds the partials (sorted for a fixed reduction order) into the
    new centroids. The driver never holds more than the (n_centroids, dim)
    matrix plus one round of tiny partials; the sample itself stays in the
    object store. Init matches ``_kmeans_fit`` (seeded choice over the
    materialized sample head) so both paths agree on the same input up to
    float-summation association."""
    import functools

    sample = sample.materialize()
    # deterministic init: seeded index choice over the sample, fetched via a
    # tiny limit() pull of just the chosen prefix size
    n_rows = sample.count()
    rs = np.random.RandomState(seed)
    k = min(n_centroids, n_rows)
    init_idx = rs.choice(n_rows, size=k, replace=False)  # order = _kmeans_fit's
    head = _emb_matrix(
        pa.concat_tables(
            [pa.Table.from_pylist(sample.limit(int(init_idx.max()) + 1).take_all())]
        ).column("embedding")
    )
    cent = head[init_idx]
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(iters):
        partials = sample.map_batches(
            functools.partial(_kmeans_partials, cent=cent), batch_format="pyarrow"
        ).take_all()  # tiny: batches x n_centroids rows
        dim = cent.shape[1]
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        partials.sort(key=lambda r: (int(r["cid"]), int(r["n"])))  # fixed fold order
        for r in partials:
            sums[int(r["cid"])] += np.asarray(r["vsum"], dtype=np.float64)
            counts[int(r["cid"])] += int(r["n"])
        nz = counts > 0
        means = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(means, axis=1)
        ok = norms > 0
        rows = np.flatnonzero(nz)[ok]
        cent[rows] = means[ok] / norms[ok, None]
    return cent


class _IvfScorer:
    """Actor: score only vectors whose centroid is in the query's probe list.

    Centroid-major, GEMM-shaped: vectors are bucket-sorted by assigned
    centroid once per batch, then each centroid's sub-matrix is scored
    against ALL queries probing it in one matrix-matrix product (the
    query-major formulation was 64 masked GEMVs per batch — fewer FLOPs
    than brute force but slower wall-clock, because BLAS-3 beats BLAS-2)."""

    def __init__(self, ref, k: int):
        self.qn, qids, self.cent, self.q_probe = ray.get(ref)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.k = k
        n_cent = self.cent.shape[0]
        # queries probing each centroid, precomputed once per actor
        self.q_by_cent = [
            np.where((self.q_probe == c).any(axis=1))[0] for c in range(n_cent)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        assign = (en @ self.cent.T).argmax(axis=1)
        order = np.argsort(assign, kind="stable")
        en_s, ids_s, assign_s = en[order], vec_ids[order], assign[order]
        bounds = np.searchsorted(assign_s, np.arange(self.cent.shape[0] + 1))
        out_q, out_v, out_s = [], [], []
        for c, qsel in enumerate(self.q_by_cent):
            lo, hi = bounds[c], bounds[c + 1]
            if lo == hi or len(qsel) == 0:
                continue
            sims = en_s[lo:hi] @ self.qn[qsel].T  # (m, n_q_c) GEMM
            kk = min(self.k, hi - lo)
            if kk < hi - lo:
                top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, n_q_c)
            else:
                top = np.broadcast_to(
                    np.arange(hi - lo)[:, None], (hi - lo, len(qsel))
                )
            cols = np.broadcast_to(np.arange(len(qsel)), top.shape)
            out_q.append(qsel[cols.ravel()])
            out_v.append(ids_s[lo:hi][top.ravel()])
            out_s.append(sims[top.ravel(), cols.ravel()])
        return _per_query_topk_table(self.qids, out_q, out_v, out_s, self.k)


def _ivf_pipeline(ds, sample, q, qids, *, k, n_centroids, nprobe):
    """Shared IVF plan: distributed k-means fit over ``sample``, probe-list
    bucketing, per-batch pruned GEMM, tiny grouped re-rank."""
    import functools

    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cent = kmeans_fit_ray(sample, n_centroids)
    q_probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    ref = ray.put((qn, qids, cent, q_probe))
    cand = ds.map_batches(
        _IvfScorer,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    )
    return cand.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )


def ann_ivf_topk(sf_dir: str, k: int = _K, n_centroids: int = 16, nprobe: int = 4):
    """IVF-style ANN: vectors are bucketed by nearest centroid; each query
    scores only vectors whose centroid is in the query's top-``nprobe``
    list. Same dataflow as the hyperplane variant with a learned
    quantizer — the scale path for clustered embeddings."""
    # fit via the distributed combiner path (sample stays in the object
    # store; the driver holds only the (n_centroids, dim) matrix + one
    # round of per-batch partials). 256-row sample here; at real scale the
    # same call takes a 10^6-row hash sample unchanged.
    q, qids = _load_queries(sf_dir)
    sample = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
        .map_batches(
            lambda t: t.filter(pc.is_valid(t.column("embedding"))),
            batch_format="pyarrow",
        )
        .limit(256)
    )
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    return _ivf_pipeline(ds, sample, q, qids, k=k, n_centroids=n_centroids, nprobe=nprobe)


def _per_query_topk_table(
    qids: np.ndarray, out_q: list, out_v: list, out_s: list, k: int
) -> pa.Table:
    """Reduce per-bucket candidate lists to per-QUERY top-k within the batch
    (vectorized lexsort + run-rank mask), so each batch emits at most
    k rows per query — the bucket-major scorers would otherwise ship up to
    (probed buckets) x k candidates per query through the exchange."""
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    qix = np.concatenate(out_q)
    ids = np.concatenate(out_v)
    sims = np.concatenate(out_s).astype(np.float64)
    order = np.lexsort((ids, -sims, qix))  # by query, sim desc, id asc
    qs = qix[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    run_len = np.diff(np.r_[starts, len(qs)])
    ranks = np.arange(len(qs)) - np.repeat(starts, run_len)
    keep = ranks < k
    sel = order[keep]
    return pa.table(
        {
            "query_id": pa.array(qids[qix[sel]], pa.int64()),
            "vec_id": pa.array(ids[sel], pa.int64()),
            "sim": pa.array(sims[sel], pa.float64()),
        }
    )



def _multiprobe_table(qproj: np.ndarray, n_probes: int) -> list[np.ndarray]:
    """bucket -> array of query indices probing it. Per query, the
    ``n_probes`` buckets with the lowest flip cost (sum of |q . plane_j|
    over the bits where the bucket differs from the query's signature) —
    the query-directed multi-probe ordering. Pure (no Ray) so the recall
    contract is pinned by an offline pytest at volume."""
    n_q, p = qproj.shape
    buckets = np.arange(1 << p, dtype=np.int64)
    bucket_bits = ((buckets[:, None] >> np.arange(p)) & 1).astype(bool)
    qb = qproj > 0  # (n_q, p)
    diff = bucket_bits[:, None, :] != qb[None, :, :]  # (2^p, n_q, p)
    cost = np.einsum("bqp,qp->bq", diff, np.abs(qproj))  # (2^p, n_q)
    n_probes = min(n_probes, len(buckets))
    cheap = np.argpartition(cost, n_probes - 1, axis=0)[:n_probes]  # (T, n_q)
    probe = np.zeros((len(buckets), n_q), dtype=bool)
    probe[cheap, np.broadcast_to(np.arange(n_q), cheap.shape)] = True
    return [np.where(probe[b])[0] for b in buckets]


class _LshScorer:
    """Actor: score only vectors whose hyperplane signature is in the
    query's multi-probe bucket list.

    Probing is QUERY-DIRECTED (classic multi-probe LSH, Lv et al., VLDB
    2007): each query probes the ``n_probes`` buckets with the lowest flip
    cost, where flipping bit j costs the query's projection magnitude
    |q . plane_j| — a near-hyperplane bit is cheap to flip (the neighbor
    plausibly lands on the other side), a confident bit is expensive.
    Measured on the 200k-vec volume fixture vs the r4 uniform-Hamming
    probe (h<=3 = 93 buckets, 36.7% candidates, recall 0.767): the SAME
    93 cost-ordered probes give recall 0.852, and the default 120 probes
    give recall 0.912 at 47% candidates — the r5 recall target with no
    second table build.

    Bucket-major, GEMM-shaped (same restructure as ``_IvfScorer``): each
    batch is bucket-sorted by its packed signature; every signature
    bucket's sub-matrix is scored against all queries probing that bucket
    in one matrix-matrix product per bucket. The query-by-bucket probe
    table (2^n_planes x queries) is built once per actor."""

    def __init__(self, ref, k: int, n_probes: int):
        q, qids, planes, qproj = ray.get(ref)
        self.qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.planes = planes
        self.k = k
        n_planes = planes.shape[1]
        self._pow2 = (1 << np.arange(n_planes)).astype(np.int64)
        self.q_by_bucket = _multiprobe_table(qproj, n_probes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch.column("embedding"))
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sig = (((emb @ self.planes) > 0).astype(np.int64) @ self._pow2)
        order = np.argsort(sig, kind="stable")
        en_s, ids_s, sig_s = en[order], vec_ids[order], sig[order]
        present = np.unique(sig_s)
        bounds = np.searchsorted(sig_s, np.append(present, np.iinfo(np.int64).max))
        out_q, out_v, out_s = [], [], []
        for i, b in enumerate(present):
            qsel = self.q_by_bucket[int(b)]
            lo, hi = bounds[i], bounds[i + 1]
            if len(qsel) == 0:
                continue
            sims = en_s[lo:hi] @ self.qn[qsel].T  # (m, n_q_b) GEMM
            kk = min(self.k, hi - lo)
            if kk < hi - lo:
                top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            else:
                top = np.broadcast_to(
                    np.arange(hi - lo)[:, None], (hi - lo, len(qsel))
                )
            cols = np.broadcast_to(np.arange(len(qsel)), top.shape)
            out_q.append(qsel[cols.ravel()])
            out_v.append(ids_s[lo:hi][top.ravel()])
            out_s.append(sims[top.ravel(), cols.ravel()])
        return _per_query_topk_table(self.qids, out_q, out_v, out_s, self.k)


def _lsh_pipeline(ds, q, qids, *, k, n_planes, n_probes):
    import functools

    dim = q.shape[1]
    planes = np.random.RandomState(7).randn(dim, n_planes)
    qproj = q @ planes  # signs = signature bits; magnitudes = probe costs
    ref = ray.put((q, qids, planes, qproj))
    cand = ds.map_batches(
        _LshScorer,
        fn_constructor_args=(ref, k, n_probes),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    )
    return cand.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k), batch_format="pyarrow"
    )


def ann_lsh_topk(sf_dir: str, k: int = _K, n_planes: int = 8, n_probes: int = 120):
    """LSH-bucketed approximate top-k with query-directed multi-probe:
    each query scores only the vectors in its ``n_probes`` cheapest-flip
    buckets (see ``_LshScorer``).

    On the synthetic near-random embeddings (top-1 neighbor cosine ~0.33)
    the default (8 planes, 120/256 probes) measures recall@10 = 0.912 at
    ~47% of brute-force candidates; on real clustered embeddings the same
    setting prunes far harder. Lower ``n_probes`` / raise ``n_planes`` as
    cluster structure allows."""
    q, qids = _load_queries(sf_dir)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    return _lsh_pipeline(ds, q, qids, k=k, n_planes=n_planes, n_probes=n_probes)


# ---------------------------------------------------------------------------
# volume variants + recall measurement (bench evidence for the approx family)
# ---------------------------------------------------------------------------


def _queries_over(ds, n_queries: int) -> tuple[np.ndarray, list[int]]:
    head = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    ids = [r["vec_id"] for r in head]
    q = np.asarray([r["embedding"] for r in head], dtype=np.float64)
    return q, ids


def ann_lsh_over(ds, *, n_queries: int = 64, k: int = 10, n_planes: int = 8, n_probes: int = 120):
    """LSH top-k over an arbitrary (vec_id, embedding) Dataset — the
    volume-bench sibling of ``ann_topk_over``; recall vs the brute result
    is reported per bench run (``recall_at_k``)."""
    q, qids = _queries_over(ds, n_queries)
    return _lsh_pipeline(ds, q, qids, k=k, n_planes=n_planes, n_probes=n_probes)


def ann_ivf_over(ds, *, n_queries: int = 64, k: int = 10, n_centroids: int = 64, nprobe: int = 32):
    """IVF top-k over an arbitrary (vec_id, embedding) Dataset (distributed
    k-means fit over a 4096-row sample of the same Dataset). Defaults
    re-swept r5 at the 200k-vec volume fixture: (64, 32) gives recall@10 =
    0.913 at 50% of brute-force candidates — the finer 64-cell partition
    beats the old (32, 12) default at every operating point (0.852 recall
    at the SAME 37% candidates via (64, 24); the r4 default read 0.825).
    The GEMM-shaped scorer keeps wall-clock below brute throughout."""
    q, qids = _queries_over(ds, n_queries)
    sample = ds.select_columns(["embedding"]).limit(4096)
    return _ivf_pipeline(ds, sample, q, qids, k=k, n_centroids=n_centroids, nprobe=nprobe)


def recall_at_k(approx_rows: list[dict], exact_rows: list[dict]) -> float:
    """Mean per-query |approx ∩ exact| / |exact| over (query_id, vec_id)
    row dicts (both O(k x n_queries) — driver-tiny)."""
    from collections import defaultdict

    a, e = defaultdict(set), defaultdict(set)
    for r in approx_rows:
        a[r["query_id"]].add(r["vec_id"])
    for r in exact_rows:
        e[r["query_id"]].add(r["vec_id"])
    if not e:
        return 1.0
    return sum(len(a[q] & s) / len(s) for q, s in e.items()) / len(e)


# ---------------------------------------------------------------------------
# k-means cluster assignment (topic / domain bucketing over embeddings)
# ---------------------------------------------------------------------------

_CLUSTER_K = 8
_QSCALE = 1_000_000  # fixed-point quantization for the exact-integer gate


_CLUSTER_SAMPLE = 4096


def _cluster_centroids_q(sf_dir: str) -> np.ndarray:
    """Quantized (k, dim) int64 centroid matrix for ``sf_dir``, fit once per
    process over a bounded head sample with the LOCAL reference k-means
    (``_kmeans_fit`` — no Ray session needed, so ``oracle_sql()`` can build
    the mirror SQL cheaply; the distributed combiner ``kmeans_fit_ray`` is
    the 10^9-row sibling and is parity-tested against this fit). The query
    path and the SQL oracle must embed the SAME centroids, hence the
    process-level cache."""
    if sf_dir in _CLUSTER_CACHE:
        return _CLUSTER_CACHE[sf_dir]
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    t = t.filter(pa.compute.is_valid(t.column("embedding"))).slice(0, _CLUSTER_SAMPLE)
    x = _emb_matrix(t.column("embedding"))
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.where(norms == 0, 1.0, norms)
    cent = _kmeans_fit(xn, _CLUSTER_K)
    cq = np.floor(cent * _QSCALE).astype(np.int64)
    _CLUSTER_CACHE[sf_dir] = cq
    return cq


_CLUSTER_CACHE: dict = {}


def embedding_cluster_assign(sf_dir: str) -> "rd.Dataset":
    """Assign every embedding to its nearest k-means centroid (cosine) — the
    topic/domain bucketing step of a mixture pipeline (cluster-balanced
    sampling, per-topic caps, curriculum grouping).

    The gate-critical trick: both engines score the dot product in EXACT
    fixed-point — vectors quantized per batch with floor(x * 1e6) (identical
    IEEE double math in numpy and DuckDB), centroids quantized ONCE and
    embedded in the generated SQL as integer literals — so argmax is
    bit-deterministic and reduction-order independent (<= 64 * 1e12 < 2^53;
    ties break to the lowest cluster id in both engines). Assignment itself
    is one int64 GEMM per batch against the broadcast centroid matrix."""
    cq = _cluster_centroids_q(sf_dir)
    ref = ray.put(cq)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        V = _emb_matrix(t.column("embedding"))
        Vq = np.floor(V * _QSCALE).astype(np.int64)
        C = ray.get(ref)
        scores = Vq @ C.T
        cl = np.argmax(scores, axis=1).astype(np.int64)  # first max = lowest id
        return pa.table({"vec_id": t.column("vec_id"), "cluster": pa.array(cl)})

    return ds.map_batches(assign, batch_format="pyarrow")


def embedding_cluster_assign_sql(sf_dir: str) -> str:
    """DuckDB mirror: the SAME quantized centroids as integer list literals;
    scores via list_dot_product (exact in double below 2^53), argmax via
    greatest + first-match CASE (ties to lowest id, like np.argmax)."""
    cq = _cluster_centroids_q(sf_dir)
    k = cq.shape[0]
    lits = [
        "[" + ",".join(str(int(x)) for x in row) + "]::BIGINT[]" for row in cq
    ]
    s_exprs = ",\n       ".join(
        f"CAST(list_dot_product(vq, {lit}) AS BIGINT) AS s{i}"
        for i, lit in enumerate(lits)
    )
    g = "greatest(" + ", ".join(f"s{i}" for i in range(k)) + ")"
    case = " ".join(f"WHEN s{i} = g THEN {i}" for i in range(k))
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}) AS BIGINT)) AS vq
  FROM read_parquet('{sf_dir}/embeddings.parquet')
  WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
),
s AS (
  SELECT vec_id,
       {s_exprs}
  FROM q
)
SELECT vec_id, CAST(CASE {case} END AS BIGINT) AS cluster
FROM (SELECT *, {g} AS g FROM s)
"""


# ---------------------------------------------------------------------------
# vector hygiene: per-vector norm / dimension stats (array-function family)
# ---------------------------------------------------------------------------


def embedding_norm_stats(sf_dir: str) -> "Dataset":
    """Per vector: dimension count and quantized squared L2 norm — the
    hygiene scan run before any ANN/cluster stage (zero vectors, truncated
    rows, un-normalized batches all surface here).

    Array math is zero-copy: the list column's values buffer reshapes into
    one (n, dim) matrix per batch, one int64 GEMV for the norms. The gate
    is exact because BOTH engines square the same floor(x*1e6) quantization
    (the ``embedding_cluster_assign`` fixed-point trick; float->double is
    IEEE-exact)."""
    import numpy as np
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def stats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("embedding")))  # NULL vector -> dropped (SQL mirror)
        col = t.column("embedding").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(vals * 1_000_000.0).astype(np.int64)
        sq = q * q
        # ragged-safe segmented sum (fixed dim in the fixture, but the op
        # must not assume it)
        csum = np.concatenate(([0], np.cumsum(sq)))
        norm2 = csum[offs[1:]] - csum[offs[:-1]]
        dims = (offs[1:] - offs[:-1]).astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "dim": pa.array(dims),
                "qnorm2": pa.array(norm2.astype(np.int64)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


EMBEDDING_NORM_STATS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(COALESCE(list_sum(list_transform(embedding,
            x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
               * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))), 0) AS BIGINT) AS qnorm2
FROM embeddings
WHERE embedding IS NOT NULL
"""


# ---------------------------------------------------------------------------
# int8 affine quantization (embedding compression)
# ---------------------------------------------------------------------------


def embedding_quantize(sf_dir: str) -> "Dataset":
    """Per-dimension affine int8 quantization of the embedding table — the
    4x compression pass a vector store runs before serving ANN at scale.
    Output is EXPLODED (vec_id, dim_idx, q8) scalar rows so the gate is
    column-exact.

    Two streaming passes: (1) per-batch per-dim min/max partials -> one
    tiny groupby(dim) -> the (dim, lo, span) table broadcasts at driver
    (O(dim) ints); (2) per-batch quantize q8 = (xq - lo) * 255 // span in
    the same floor(x*1e6) fixed point both engines share — all operands
    non-negative, so floor == trunc and the mirror is exact. A constant
    dimension (span 0) quantizes to 0 (CASE-mirrored). NULL vectors drop;
    dim_idx is 1-based (generate_subscripts parity)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    path = os.path.join(sf_dir, "embeddings.parquet")

    def explode_fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("embedding")))
        col = t.column("embedding").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        if len(offs):
            vals = vals[offs[0] : offs[-1]]  # offsets are absolute (sliced arrays)
        xq = np.floor(vals * 1_000_000.0).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        vid = np.repeat(t.column("vec_id").to_numpy(zero_copy_only=False), lens)
        total = int(lens.sum())
        dim_idx = np.arange(total, dtype=np.int64) - np.repeat(
            offs[:-1] - offs[0], lens
        ) + 1  # 1-based, ragged-safe within the batch
        # offsets are absolute into the chunk's values buffer; rebase
        return pa.table(
            {"vec_id": pa.array(vid), "dim_idx": pa.array(dim_idx), "xq": pa.array(xq)}
        )

    def rng_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["dim_idx"]).aggregate([("xq", "min"), ("xq", "max")])
        return g.rename_columns(["dim_idx", "mn", "mx"])

    ex = rd.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        explode_fp, batch_format="pyarrow"
    )
    rng = (
        ex.map_batches(rng_partial, batch_format="pyarrow")
        .groupby("dim_idx")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )  # O(dim) rows on the driver
    dims = rng["dim_idx"].to_numpy()
    lo = np.zeros(int(dims.max()) + 1 if len(dims) else 1, np.int64)
    span = np.zeros_like(lo)
    lo[dims] = rng["mn"].to_numpy()
    span[dims] = rng["mx"].to_numpy() - rng["mn"].to_numpy()
    import ray as _ray

    lo_ref, span_ref = _ray.put(lo), _ray.put(span)

    def quantize(t: pa.Table, _lo=lo_ref, _span=span_ref) -> pa.Table:
        L = _ray.get(_lo)
        S = _ray.get(_span)
        di = t.column("dim_idx").to_numpy(zero_copy_only=False)
        xq = t.column("xq").to_numpy(zero_copy_only=False)
        s = S[di]
        q8 = np.where(s == 0, 0, (xq - L[di]) * 255 // np.maximum(s, 1))
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "dim_idx": t.column("dim_idx"),
                "q8": pa.array(q8.astype(np.int64)),
            }
        )

    return ex.map_batches(quantize, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim_idx,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq
  FROM embeddings WHERE embedding IS NOT NULL
),
rng AS (SELECT dim_idx, MIN(xq) AS mn, MAX(xq) AS mx FROM ex GROUP BY dim_idx)
SELECT e.vec_id, CAST(e.dim_idx AS BIGINT) AS dim_idx,
       CAST(CASE WHEN r.mx = r.mn THEN 0
            ELSE (e.xq - r.mn) * 255 // (r.mx - r.mn) END AS BIGINT) AS q8
FROM ex e JOIN rng r USING (dim_idx)
"""


# ---------------------------------------------------------------------------
# per-label element-wise vector aggregate (grouped centroid numerators)
# ---------------------------------------------------------------------------


def label_centroids(sf_dir: str) -> "rd.Dataset":
    """Per-(label, dimension) element-wise sum + count over the embedding
    column — the grouped-centroid numerator pass (class prototypes,
    cluster means, per-language embedding drift all reduce to this
    aggregate). Exact: both engines sum the same floor(x*1e6) fixed-point
    quantization, so value hashes are reduction-order independent.

    Plan: per batch the list column's values buffer reshapes zero-copy and
    folds into (label, dim) partial rows with ``np.add.at`` on int64 (no
    float accumulation) — at most labels_in_batch x dim rows leave each
    batch, so the shuffle carries partials bounded by group cardinality,
    never vectors. The final ``groupby`` is null-safe (SQL GROUP BY keeps
    a NULL-label group) and tiny (|labels| x dim groups). Ragged rows are
    handled positionally (a short vector simply contributes to fewer
    dims); NULL *elements* inside a vector are out of contract (the
    fixture has none — NULL whole-vector cells are dropped, mirrored).
    """
    from ray.data.aggregate import Sum

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("embedding")))
        out_schema = pa.schema(
            [("label", pa.int32()), ("dim_idx", pa.int64()),
             ("n_vecs", pa.int64()), ("sum_q", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        emb = t.column("embedding").combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # slice-offset safe
        vals = np.asarray(emb.flatten(), dtype=np.float64)
        q = np.floor(vals * 1_000_000.0).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        # 1-indexed dim to match the embedding_quantize convention
        dim = np.arange(len(vals), dtype=np.int64) - offs[:-1][parent] + 1
        # null-safe label codes: (is_null, filled) packed injectively
        lab = t.column("label")
        lab_null = pc.is_null(lab).to_numpy(zero_copy_only=False)
        lab_fill = pc.fill_null(lab, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        key_row = lab_null.astype(np.int64) * (1 << 34) + (lab_fill + (1 << 31))
        codes, inv = np.unique(key_row, return_inverse=True)
        d_max = int(lens.max()) if len(lens) else 0
        bins = len(codes) * d_max
        keyv = inv[parent] * d_max + (dim - 1)
        sums = np.zeros(bins, dtype=np.int64)
        np.add.at(sums, keyv, q)
        counts = np.bincount(keyv, minlength=bins)
        nz = np.flatnonzero(counts)
        code_of = nz // d_max
        out_lab = (codes[code_of] & ((1 << 34) - 1)) - (1 << 31)
        out_null = codes[code_of] >= (1 << 34)
        return pa.table(
            {
                "label": pa.array(
                    [None if m else int(v) for v, m in zip(out_lab, out_null)],
                    pa.int32(),
                ),
                "dim_idx": pa.array(nz % d_max + 1, pa.int64()),
                "n_vecs": pa.array(counts[nz].astype(np.int64)),
                "sum_q": pa.array(sums[nz]),
            }
        )

    agg = null_safe_groupby_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["label", "dim_idx"],
        Sum("n_vecs", alias_name="n_vecs"),
        Sum("sum_q", alias_name="sum_q"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(t.column("label"), pa.int64()),
                "dim_idx": t.column("dim_idx"),
                "n_vecs": t.column("n_vecs"),
                "sum_q": t.column("sum_q"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


LABEL_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim_idx,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xq
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(xq) AS BIGINT) AS sum_q
FROM ex GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# distributed Gram / covariance numerator (the PCA building block)
# ---------------------------------------------------------------------------

_GRAM_DIM = 64  # fixture embedding width; rows of any other width are out
# of contract and excluded (mirrored in SQL), so the matrix shape is fixed.


def embedding_gram(sf_dir: str) -> pa.Table:
    """Upper-triangular Gram matrix of the embedding corpus: for every
    dimension pair i <= j (1-based), ``gram = sum over vectors of q_i*q_j``
    with q = floor(x*1e6) int64 fixed point — the exact integer sufficient
    statistic from which covariance/PCA/whitening derive (subtract the
    ``label_centroids`` mean outer product, then eigendecompose the tiny
    d x d result on the driver).

    Plan: each batch reshapes the list column zero-copy to (n, d),
    quantizes, and folds to ONE (d, d) int64 Gram partial (a single
    integer matmul — the whole batch collapses to d*(d+1)/2 rows, so the
    driver fold moves O(d^2) ints per block regardless of corpus size;
    this is the mergeable-moments pattern lifted to matrices). Overflow
    bound: |q| <= 2^20, so each product is < 2^40 and int64 safely holds
    ~2^23 (8M) vectors per partial and ~2^63 total only with >2^23 blocks
    — far past this deployment; a larger corpus would shard the fold.

    Contract (mirrored): NULL-keyed rows (vec_id — the SQL mirror's
    self-join key), NULL vectors and vectors of width != _GRAM_DIM are
    excluded. Dimension indices are 1-based (generate_subscripts
    parity)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    d = _GRAM_DIM
    iu, ju = np.triu_indices(d)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.is_valid(t.column("vec_id")),
                pc.is_valid(t.column("embedding")),
            ),
            pc.equal(pc.list_value_length(t.column("embedding")), d),
        )
        t = t.filter(m)
        if t.num_rows == 0:
            g = np.zeros((d, d), dtype=np.int64)
        else:
            mat = _emb_matrix(t.column("embedding"))
            q = np.floor(mat * 1_000_000.0).astype(np.int64)
            g = q.T @ q
        return pa.table(
            {
                "i": pa.array(iu + 1, pa.int64()),
                "j": pa.array(ju + 1, pa.int64()),
                "gram": pa.array(g[iu, ju]),
            }
        )

    acc = np.zeros(len(iu), dtype=np.int64)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    # driver fold: d*(d+1)/2 int64 per block — batch_size=None per the
    # iter_batches rule (default 4096-row re-slice is pure overhead here)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        acc += np.asarray(b.column("gram"))
    return pa.table(
        {
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "gram": pa.array(acc),
        }
    )


EMBEDDING_GRAM_SQL = f"""
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qx
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    AND len(embedding) = {_GRAM_DIM}
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
       CAST(SUM(a.qx * b.qx) AS BIGINT) AS gram
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


def embedding_pca_project(sf_dir: str, k: int = 2) -> "Dataset":
    """Project every embedding onto its corpus's top-``k`` principal
    components — the 2-D map/visualization + decorrelation pass that sits
    on top of ``embedding_gram``. Not SQL-gatable (eigendecomposition);
    the pytest oracle recomputes PCA with plain numpy on a collected copy
    and checks the projections (up to the eigenvector sign, which is
    pinned here by making each component's max-|coefficient| positive).

    Plan: pass 1 folds (n, sum, gram) partials on the driver — O(d^2)
    floats per block, the ``embedding_gram`` fold with first moments
    added; covariance = gram/n - mean mean^T and its eigh happen on the
    tiny d x d driver copy; pass 2 broadcasts the (d, k) component matrix
    once (``ray.put``) and projects each batch with one GEMM. Both passes
    stream; nothing corpus-sized ever materializes.

    Contract: NULL vec_id / NULL vectors / width != _GRAM_DIM excluded
    (same as ``embedding_gram``)."""
    d = _GRAM_DIM
    path = os.path.join(sf_dir, "embeddings.parquet")

    def _clean(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.is_valid(t.column("vec_id")), pc.is_valid(t.column("embedding"))
            ),
            pc.equal(pc.list_value_length(t.column("embedding")), d),
        )
        return t.filter(m)

    def partial(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            g = np.zeros((d, d)); s = np.zeros(d); n = 0
        else:
            mat = _emb_matrix(t.column("embedding"))
            g = mat.T @ mat
            s = mat.sum(axis=0)
            n = mat.shape[0]
        return pa.table(
            {
                "n": pa.array([float(n)]),
                "s": pa.array([s.tolist()], pa.list_(pa.float64())),
                "g": pa.array([g.reshape(-1).tolist()], pa.list_(pa.float64())),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    n_tot, s_tot, g_tot = 0.0, np.zeros(d), np.zeros((d, d))
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        n_tot += float(np.asarray(b.column("n")).sum())
        s_col = b.column("s").combine_chunks()
        g_col = b.column("g").combine_chunks()
        s_tot += np.asarray(s_col.flatten()).reshape(-1, d).sum(axis=0)
        g_tot += np.asarray(g_col.flatten()).reshape(-1, d * d).sum(axis=0).reshape(d, d)
    if n_tot == 0:
        return rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      **{f"pc{i+1}": pa.array([], pa.float64()) for i in range(k)}})
        )
    mean = s_tot / n_tot
    cov = g_tot / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comp = v[:, np.argsort(w)[::-1][:k]]  # (d, k), descending variance
    # pin eigenvector sign: max-|coeff| entry positive (ties -> lowest idx)
    for c in range(k):
        j = int(np.argmax(np.abs(comp[:, c])))
        if comp[j, c] < 0:
            comp[:, c] = -comp[:, c]
    comp_ref = ray.put(np.ascontiguousarray(comp))
    mean_ref = ray.put(mean)

    def project(t: pa.Table, _c=comp_ref, _m=mean_ref) -> pa.Table:
        C = ray.get(_c)
        M = ray.get(_m)
        t = _clean(t)
        out = {"vec_id": t.column("vec_id")}
        if t.num_rows == 0:
            proj = np.zeros((0, C.shape[1]))
        else:
            proj = (_emb_matrix(t.column("embedding")) - M) @ C
        for i in range(C.shape[1]):
            out[f"pc{i+1}"] = pa.array(proj[:, i], pa.float64())
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")


def embedding_knn_self(sf_dir: str) -> Dataset:
    """kNN-graph build (k=1): every vector's single nearest neighbor by
    cosine, self excluded — the neighbor-graph step under clustering /
    manifold / dedup-threshold calibration. Ties on the 6-dp-rounded
    similarity break to the smallest neighbor id (the ann_topk rounding
    contract, established gate-exact vs DuckDB).

    Plan (dense tier): the corpus matrix is pinned ONCE via ``ray.put``
    (ids + row-normalized float64) and every batch does one GEMM against
    it — O(batch x corpus) flops, candidate traffic one row per vector.
    This is the exact tier for corpora whose matrix fits a worker
    (500 x 64 here; ~1 GB at 2M x 64); beyond that the LSH-bucketed
    ``embedding_near_dups`` plan is the documented scale path (bucket,
    then exact within buckets).

    Contract (mirrored): NULL vec_id / embedding rows are excluded; a
    corpus with fewer than 2 vectors yields zero rows."""
    pin = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    rows = pin.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mn = m / norms[:, None]
    ref = ray.put((ids, mn))

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "nn_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    if len(ids) < 2:
        return rd.from_arrow(empty)

    def nn(t: pa.Table) -> pa.Table:
        cids, cm = ray.get(ref)
        bids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat = t.column("embedding").combine_chunks()
        bm = np.asarray(flat.flatten(), dtype=np.float64).reshape(len(bids), -1)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0] = 1.0
        sims = (bm / bn[:, None]) @ cm.T
        r6 = np.round(sims, 6)
        r6[bids[:, None] == cids[None, :]] = -np.inf  # self excluded
        mx = r6.max(axis=1)
        # among max-similarity ties, the smallest neighbor id
        idmat = np.where(r6 == mx[:, None], cids[None, :], np.iinfo(np.int64).max)
        nnid = idmat.min(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(bids),
                "nn_id": pa.array(nnid.astype(np.int64)),
                "sim": pa.array(mx, pa.float64()),
            }
        )

    return pin.map_batches(nn, batch_format="pyarrow", batch_size=4096)


EMBEDDING_KNN_SELF_SQL = """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
s AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT vec_id, nn_id, sim FROM s
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) = 1
"""


# ---------------------------------------------------------------------------
# quantized k-means training (IVF centroid derivation, exact-integer spec)
# ---------------------------------------------------------------------------


def embedding_kmeans_train(sf_dir: str, k: int = 8, iters: int = 3) -> "rd.Dataset":
    """Distributed Lloyd's k-means over ``embeddings``, quantized to exact
    integers so the result is bit-reproducible regardless of batch order —
    the centroid-training step an IVF index build runs at corpus scale.
    rows-only entry: iterative argmin is not SQL-expressible; pytest gates
    it against an independent pure-numpy reference (tests/ref_kmeans.py).

    Spec (shared with the reference, written against this paragraph):
    vectors quantized to e3 ints via rint(v*1000); qualifying rows have
    non-NULL vec_id + embedding and the dim of the first VALID vector in
    vec_id order; init = first k qualifying vectors by vec_id; assignment =
    exact int64 squared L2, ties to the lowest cluster_id; update =
    element-wise FLOOR division of member sums by member count (empty
    clusters keep their centroid); ``iters`` rounds, then a final
    assignment census (cluster_id, n_points, inertia_e6).

    Scale shape: per round ONE streaming pass over the corpus; each batch
    does an exact-int GEMM against the broadcast (ray.put) centroids and
    reduces to k partial rows (sum vector + count), so the driver folds
    k x n_blocks tiny rows — centroids (k x dim ints) are the only state.
    The final census is a partial pre-agg + k-row groupby. The quantized
    corpus is materialized once (at 100 TB you would re-read per round
    instead; the pass structure is identical)."""
    out_schema = pa.schema(
        [("cluster_id", pa.int64()), ("n_points", pa.int64()), ("inertia_e6", pa.int64())]
    )
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def first_valid(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column("vec_id")), pc.is_valid(t.column("embedding")))
        t = t.filter(m)
        if t.num_rows == 0:
            return t
        i = pc.index(
            t.column("vec_id"), pc.min(t.column("vec_id")).as_py()
        ).as_py()
        return t.slice(i, 1)

    heads = ds.map_batches(first_valid, batch_format="pyarrow").take_all()
    if not heads:
        return rd.from_arrow(out_schema.empty_table())
    head = min(heads, key=lambda r: r["vec_id"])
    dim = len(head["embedding"])

    def prep(t: pa.Table) -> pa.Table:
        emb = t.column("embedding").combine_chunks()
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("vec_id")), pc.is_valid(emb)),
            pc.equal(pc.list_value_length(emb), pa.scalar(dim, pa.int32())),
        )
        t = t.filter(m)
        emb = t.column("embedding").combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        q = np.rint(flat * 1000.0).astype(np.int64)
        return pa.table(
            {
                "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
                "q": pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (t.num_rows + 1) * dim, dim), pa.int32()),
                    pa.array(q, pa.int64()),
                ),
            }
        )

    qual = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def bottom_k(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])
        return t.take(order[:k])

    firsts = sorted(
        qual.map_batches(bottom_k, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )[:k]
    if not firsts:
        return rd.from_arrow(out_schema.empty_table())
    cent = np.array([r["q"] for r in firsts], dtype=np.int64)  # (k', dim)

    def _qmat(t: pa.Table) -> np.ndarray:
        flat = np.asarray(t.column("q").combine_chunks().flatten(), dtype=np.int64)
        return flat.reshape(t.num_rows, dim)

    def _assign(x: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # exact int64 squared L2 via the expansion; e3-scale operands keep
        # every term far inside int64
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = d.argmin(axis=1)  # numpy argmin takes the FIRST min -> lowest id
        return a, d[np.arange(len(a)), a]

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table, _r=ref) -> pa.Table:
            c = ray.get(_r)
            if t.num_rows == 0:
                return pa.table(
                    {
                        "cluster_id": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.int64())),
                    }
                )
            x = _qmat(t)
            a, _ = _assign(x, c)
            cids, ns, sums = [], [], []
            for j in range(len(c)):
                m = a == j
                nj = int(m.sum())
                if nj:
                    cids.append(j)
                    ns.append(nj)
                    sums.append(x[m].sum(axis=0).tolist())
            return pa.table(
                {
                    "cluster_id": pa.array(cids, pa.int64()),
                    "n": pa.array(ns, pa.int64()),
                    "s": pa.array(sums, pa.list_(pa.int64())),
                }
            )

        rows = qual.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((len(cent), dim), dtype=np.int64)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in rows:
            j = r["cluster_id"]
            counts[j] += r["n"]
            sums[j] += np.asarray(r["s"], dtype=np.int64)
        upd = counts > 0
        cent[upd] = np.floor_divide(sums[upd], counts[upd][:, None])

    ref = ray.put(cent)

    def census(t: pa.Table, _r=ref) -> pa.Table:
        c = ray.get(_r)
        if t.num_rows == 0:
            return out_schema.empty_table()
        x = _qmat(t)
        a, dmin = _assign(x, c)
        cids, ns, inert = [], [], []
        for j in range(len(c)):
            m = a == j
            if m.any():
                cids.append(j)
                ns.append(int(m.sum()))
                inert.append(int(dmin[m].sum()))
        return pa.table(
            {
                "cluster_id": pa.array(cids, pa.int64()),
                "n_points": pa.array(ns, pa.int64()),
                "inertia_e6": pa.array(inert, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        qual.map_batches(census, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(
            _Sum("n_points", alias_name="n_points"),
            _Sum("inertia_e6", alias_name="inertia_e6"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign projection (exact-integer, SQL-gated)
# ---------------------------------------------------------------------------

_JL_DIM = 64
_JL_K = 8


def _jl_signs() -> np.ndarray:
    """Deterministic ±1 sign matrix (d x k): the parity of the first byte
    of md5("i:j") — no RNG state, so every worker, rerun, and the
    generated SQL share one matrix."""
    import hashlib as _h

    s = np.empty((_JL_DIM, _JL_K), dtype=np.int64)
    for i in range(_JL_DIM):
        for j in range(_JL_K):
            s[i, j] = 1 if _h.md5(f"{i}:{j}".encode()).digest()[0] & 1 else -1
    return s


def embedding_jl_project(sf_dir: str) -> "Dataset":
    """Random-sign (Achlioptas/JL) projection of every embedding from 64
    to 8 dimensions — the cheap dimensionality reduction stage run before
    LSH/ANN at corpus scale. Exactly gateable: both engines project the
    SAME floor(x*1e6) fixed-point vector through the SAME md5-derived ±1
    sign matrix, so the 8 integer components hash identically (the usual
    float-matmul projection could never gate).

    Plan: zero-copy list reshape to (n, 64), ONE int64 GEMM per batch
    against the broadcast-by-closure 64x8 sign matrix; embarrassingly
    parallel, no shuffle. Overflow: |q| ≤ 2^21 per component (unit-ish
    embeddings), x64 terms < 2^27 — far inside int64 at any scale.

    Contract (mirrored in SQL): NULL vec_id / NULL embedding rows and
    vectors whose length != 64 are excluded; NaN/NULL elements quantize
    to 0 (COALESCE in the mirror)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    signs = _jl_signs()

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("vec_id")), pc.is_valid(t.column("embedding")))
        )
        col = t.column("embedding").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        dims = offs[1:] - offs[:-1]
        keep = dims == _JL_DIM
        t = t.filter(pa.array(keep))
        col = t.column("embedding").combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64())}
                | {f"p{j}": pa.array([], pa.int64()) for j in range(_JL_K)}
            )
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(np.nan_to_num(vals, nan=0.0) * 1_000_000.0).astype(np.int64)
        proj = q.reshape(-1, _JL_DIM) @ signs  # (n, k) int64
        out = {"vec_id": t.column("vec_id")}
        for j in range(_JL_K):
            out[f"p{j}"] = pa.array(proj[:, j], pa.int64())
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow")


def _jl_sql() -> str:
    signs = _jl_signs()
    values = ",".join(
        f"({i + 1},{j},{int(signs[i, j])})" for i in range(_JL_DIM) for j in range(_JL_K)
    )
    comps = ",\n       ".join(
        f"CAST(SUM(CASE WHEN s.j = {j} THEN s.sgn * q.qv ELSE 0 END) AS BIGINT) AS p{j}"
        for j in range(_JL_K)
    )
    return f"""
WITH pos AS (
  SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND len(embedding) = {_JL_DIM}
),
q AS (
  SELECT vec_id, i,
         COALESCE(CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000) AS BIGINT), 0) AS qv
  FROM pos
),
s(i, j, sgn) AS (VALUES {values})
SELECT vec_id, {comps}
FROM q JOIN s ON q.i = s.i
GROUP BY vec_id
"""


EMBEDDING_JL_PROJECT_SQL = _jl_sql()


def embedding_argmax_dim(sf_dir: str) -> "Dataset":
    """Per vector: the index of its LARGEST quantized component (ties to
    the lowest index) and that component's fixed-point value — the
    feature-attribution scan ("which dimension dominates?") and the
    array-function family's argmax member (norms, Gram, projection, and
    now positional reduction).

    Zero-copy list reshape, one vectorized argmax per batch; exactly
    gated through the shared floor(x*1e6) quantization. Ragged vectors
    are fine (segment-wise argmax over offsets); empty or NULL vectors
    and NULL vec_ids drop (mirrored)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def argmax(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("vec_id")), pc.is_valid(t.column("embedding")))
        )
        col = t.column("embedding").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        keep = (offs[1:] - offs[:-1]) > 0
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "arg_dim": pa.array([], pa.int64()),
                    "max_q": pa.array([], pa.int64()),
                }
            )
        col = t.column("embedding").combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(vals * 1_000_000.0).astype(np.int64)
        # segment-wise argmax with lowest-index ties: reduceat over maxima,
        # then first position equal to the segment max
        starts = offs[:-1]
        seg_max = np.maximum.reduceat(q, starts)
        seg_id = np.repeat(np.arange(len(starts)), offs[1:] - starts)
        is_max = q == seg_max[seg_id]
        pos = np.arange(len(q))
        first_max = np.minimum.reduceat(np.where(is_max, pos, len(q)), starts)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "arg_dim": pa.array((first_max - starts).astype(np.int64), pa.int64()),
                "max_q": pa.array(seg_max, pa.int64()),
            }
        )

    return ds.map_batches(argmax, batch_format="pyarrow")


EMBEDDING_ARGMAX_DIM_SQL = """
WITH pos AS (
  SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND len(embedding) > 0
),
q AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM pos
)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS arg_dim, qv AS max_q
FROM q
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY qv DESC, i) = 1
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (per-dimension min-max codes, exact fixed point)
# ---------------------------------------------------------------------------


def embedding_quantize_int8(sf_dir: str) -> "Dataset":
    """Scalar quantization of the embedding table: each dimension's values
    mapped to 0..255 codes by per-dimension min/max — the 4× memory cut
    every planet-scale vector index takes before ANN search (IVF/LSH here
    search fewer vectors; quantization shrinks each one). Exactly gated:
    floats enter integer space FIRST (``floor(x · 10⁶)``, the
    ``embedding_jl_project`` fixed-point trick), so code arithmetic is
    pure int64 and identical in DuckDB ((xi−mn)·255 // span — non-negative
    numerator, truncation == floor).

    Plan: one per-batch flatten + per-dim partial min/max (64 rows per
    batch through the fold), broadcast of the 64-entry (mn, span) table,
    then a second streaming pass emits (vec_id, dim, code) rows. A
    constant dimension (span 0) codes to 0.

    Contract (mirrored in SQL): NULL vec_id / NULL embedding rows are
    excluded; dims are 0-based."""
    import numpy as np
    import pyarrow.compute as pc

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def _flat(t: pa.Table):
        t = t.filter(
            pc.and_(pc.is_valid(t.column("vec_id")), pc.is_valid(t.column("embedding")))
        )
        col = t.column("embedding").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        xi = np.floor(flat * 1_000_000.0).astype(np.int64)
        dims = np.concatenate([np.arange(n, dtype=np.int64) for n in lens]) if len(lens) else np.array([], np.int64)
        ids = np.repeat(t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64), lens)
        return ids, dims, xi

    def stats_partial(t: pa.Table) -> pa.Table:
        _ids, dims, xi = _flat(t)
        g = pa.table({"dim": pa.array(dims), "xi": pa.array(xi)})
        out = g.group_by(["dim"]).aggregate([("xi", "min"), ("xi", "max")])
        return out.rename_columns(["dim", "mn", "mx"])

    folds: dict = {}
    for b in emb.map_batches(stats_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for d, mn, mx in zip(
            b.column("dim").to_pylist(), b.column("mn").to_pylist(), b.column("mx").to_pylist()
        ):
            cur = folds.get(d)
            folds[d] = (mn, mx) if cur is None else (min(cur[0], mn), max(cur[1], mx))

    ndim = max(folds) + 1 if folds else 0
    mn = np.zeros(ndim, np.int64)
    span = np.ones(ndim, np.int64)
    for d, (lo, hi) in folds.items():
        mn[d] = lo
        span[d] = max(hi - lo, 1)
    is_const = np.array([folds[d][0] == folds[d][1] if d in folds else True for d in range(ndim)])

    def codes(t: pa.Table) -> pa.Table:
        ids, dims, xi = _flat(t)
        c = (xi - mn[dims]) * 255 // span[dims]
        c[is_const[dims]] = 0
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "dim": pa.array(dims),
                "code": pa.array(c.astype(np.int64)),
            }
        )

    return emb.map_batches(codes, batch_format="pyarrow")


EMBEDDING_QUANTIZE_INT8_SQL = """
WITH u AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS xi
  FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
s AS (SELECT dim, MIN(xi) AS mn, MAX(xi) AS mx FROM u GROUP BY 1)
SELECT u.vec_id, CAST(u.dim AS BIGINT) AS dim,
       CAST(CASE WHEN s.mx > s.mn
                 THEN (u.xi - s.mn) * 255 // (s.mx - s.mn)
                 ELSE 0 END AS BIGINT) AS code
FROM u JOIN s USING (dim)
"""
