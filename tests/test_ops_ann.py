"""ANN: brute-force result equals a driver-side numpy oracle; the LSH
variant reaches reasonable recall against brute force."""

import numpy as np

from ocr_ray.ops.ann import ann_lsh_topk, ann_topk

SF = "/root/testdata/sf0.001"


def _numpy_oracle(k=5, n_q=3):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    out = {}
    for qid in range(n_q):
        qv = en[ids == qid][0]
        sims = en @ qv
        order = np.lexsort((ids, -sims))[:k]
        out[qid] = [int(ids[i]) for i in order]
    return out


def test_brute_force_matches_numpy_oracle():
    want = _numpy_oracle()
    rows = ann_topk(SF).take_all()
    got = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], -r["sim"], r["vec_id"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got == want


def test_self_is_top1():
    rows = ann_topk(SF).take_all()
    best = {}
    for r in rows:
        if r["query_id"] not in best or r["sim"] > best[r["query_id"]][1]:
            best[r["query_id"]] = (r["vec_id"], r["sim"])
    for qid, (vid, sim) in best.items():
        assert vid == qid and abs(sim - 1.0) < 1e-6


def test_lsh_recall():
    brute = _numpy_oracle()
    rows = ann_lsh_topk(SF).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & set(v)) for q, v in brute.items())
    total = sum(len(v) for v in brute.values())
    # tiny fixture: few neighbor slots, high variance — the volume recall
    # contract is pinned by test_multiprobe_recall_volume below (and the
    # bench's recall_at_k row at 200k)
    assert hits / total >= 0.7


def test_ivf_recall():
    from ocr_ray.ops.ann import ann_ivf_topk

    brute = _numpy_oracle()
    rows = ann_ivf_topk(SF).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & set(v)) for q, v in brute.items())
    total = sum(len(v) for v in brute.values())
    assert hits / total >= 0.4  # near-random embeddings: bounded recall

    rows2 = ann_ivf_topk(SF).take_all()
    assert sorted(map(tuple, (r.values() for r in rows))) == sorted(
        map(tuple, (r.values() for r in rows2))
    )  # deterministic


def test_kmeans_fit_ray_matches_local():
    """The distributed combiner fit must agree with the local reference
    k-means on the same sample (same seeded init; means differ only by
    float-summation association, so allclose, not equality)."""
    import os

    import numpy as np
    import ray.data as rd

    from ocr_ray.ops.ann import _emb_matrix, _kmeans_fit, kmeans_fit_ray

    sample = rd.read_parquet(
        os.path.join(SF, "embeddings.parquet"), columns=["embedding"]
    ).limit(256)
    import pyarrow as pa

    xs = _emb_matrix(
        pa.Table.from_pylist(sample.take_all()).column("embedding")
    )
    xs = xs / np.linalg.norm(xs, axis=1, keepdims=True)
    local = _kmeans_fit(xs, 16)
    dist = kmeans_fit_ray(sample, 16)
    assert dist.shape == local.shape
    assert np.allclose(dist, local, atol=1e-9)


class TestClusterAssign:
    def test_assignment_is_nearest_centroid(self, ray_session):
        """Every assigned cluster must maximize the quantized dot product
        (brute-force recheck), with ties to the lowest cluster id."""
        import numpy as np
        import pyarrow.parquet as pq

        from ocr_ray.ops.ann import (
            _cluster_centroids_q,
            _emb_matrix,
            _QSCALE,
            embedding_cluster_assign,
        )

        got = embedding_cluster_assign(SF).to_pandas().set_index("vec_id")["cluster"]
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        V = _emb_matrix(t.column("embedding"))
        Vq = np.floor(V * _QSCALE).astype(np.int64)
        cq = _cluster_centroids_q(SF)
        want = np.argmax(Vq @ cq.T, axis=1)
        ids = t.column("vec_id").to_numpy()
        assert (got.loc[ids].to_numpy() == want).all()

    def test_centroid_fit_is_cached_and_deterministic(self):
        from ocr_ray.ops.ann import _cluster_centroids_q, _CLUSTER_CACHE

        _CLUSTER_CACHE.clear()
        a = _cluster_centroids_q(SF)
        b = _cluster_centroids_q(SF)
        assert a is b  # process cache: oracle + query embed identical centroids
        _CLUSTER_CACHE.clear()
        c = _cluster_centroids_q(SF)
        assert (a == c).all()  # refit is bit-identical


class TestEmbeddingKnnSelf:
    def test_planted_neighbors(self, tmp_path, ray_session):
        """Each vector's top neighbor excludes itself; identical vectors
        pick each other with sim 1.0 and ties break to the smaller id."""
        import pyarrow as pa
        import pyarrow.parquet as pq_
        import ray.data as rd

        from ocr_ray.ops.ann import embedding_knn_self

        vecs = {
            0: [1.0, 0.0, 0.0],
            1: [1.0, 0.0, 0.0],   # duplicate of 0
            2: [0.9, 0.1, 0.0],   # closest non-dup to the x-axis pair
            3: [0.0, 1.0, 0.0],   # orthogonal to x
            7: [1.0, 0.0, 0.0],   # second duplicate -> 0 and 1 tie for it
        }
        t = pa.table(
            {
                "vec_id": pa.array(list(vecs), pa.int64()),
                "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        )
        pq_.write_table(t, tmp_path / "embeddings.parquet")
        nn = {r["vec_id"]: r for r in embedding_knn_self(str(tmp_path)).take_all()}
        assert nn[0]["nn_id"] == 1 and nn[0]["sim"] == 1.0  # tie 1 vs 7 -> min id
        assert nn[1]["nn_id"] == 0 and nn[1]["sim"] == 1.0
        assert nn[7]["nn_id"] == 0
        assert nn[2]["nn_id"] in (0, 1, 7)  # x-axis pack is its neighbor
        assert nn[3]["nn_id"] == 2  # only vector with any y component

def test_multiprobe_recall_volume():
    """Offline (no Ray) pin of the r5 multi-probe recall contract on 20k
    pure-gaussian 64-d embeddings — the HARDEST distribution for this
    family (no near-dup structure at all): 120/256 query-directed probes
    measured 0.825 here, 0.859 at 200k gaussian, 0.894 at 50k and 0.912
    at 200k of the bench fixture's distribution (which the bench's
    ann_lsh_recall_200k row records each run). The r4 uniform-Hamming
    probe read 0.767 on the 200k fixture at the same candidate budget."""
    import numpy as np

    from ocr_ray.ops.ann import _multiprobe_table

    rng = np.random.RandomState(11)
    emb = rng.randn(20000, 64)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    n_q, k, p = 32, 10, 8
    q = emb[:n_q]
    qn = en[:n_q]
    sims = en @ qn.T
    brute = [set(np.argsort(-sims[:, j])[:k].tolist()) for j in range(n_q)]
    planes = np.random.RandomState(7).randn(64, p)
    sig = ((emb @ planes) > 0).astype(np.int64) @ (1 << np.arange(p))
    table = _multiprobe_table(q @ planes, 120)
    probe = np.zeros((1 << p, n_q), dtype=bool)
    for b, qs in enumerate(table):
        probe[b, qs] = True
    rec = []
    for j in range(n_q):
        mask = probe[sig, j]
        cids = np.where(mask)[0]
        top = set(cids[np.argsort(-sims[mask, j])[:k]].tolist())
        rec.append(len(top & brute[j]) / k)
    assert float(np.mean(rec)) >= 0.80, np.mean(rec)
