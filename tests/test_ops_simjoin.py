"""Exact similarity self-join (ops/simjoin): guaranteed-recall prefix-filter
Jaccard and exact cosine dedup.

The oracle here is brute force over the same predicate — every pair the O(n^2)
scan finds MUST come out of the prefix-filtered plan (recall is guaranteed by
construction, so any miss is a bug, not sampling noise)."""

import itertools

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.ops.simjoin import (
    _prefix_len,
    cosine_dup_pairs,
    dedup_jaccard_exact,
    jaccard_dup_pairs,
    word_grams,
)

_T_BP = 7000


def _brute_pairs(texts: dict[int, str]) -> set[tuple[int, int]]:
    out = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = set(word_grams(texts[a])), set(word_grams(texts[b]))
        inter = len(sa & sb)
        union = len(sa | sb)
        # union == 0 (both empty): a dup by the SQL predicate, but handled by
        # the separate _empty_gram_losers aggregate, not the pairs stage
        if union and 10_000 * inter >= _T_BP * union:
            out.add((a, b))
    return out


def test_prefix_len_prunes():
    # p = n - ceil(t*n) + 1; at t=0.7: n=10 -> 4, n=3 -> 1, n=1 -> 1
    assert _prefix_len(10, 7000) == 4
    assert _prefix_len(3, 7000) == 1
    assert _prefix_len(1, 7000) == 1
    # the round-1 regression: p must NEVER exceed n (no pruning = all-pairs)
    for n in range(1, 200):
        p = _prefix_len(n, 7000)
        assert 1 <= p <= n
    # t=1.0: only identical sets can match -> prefix of exactly 1
    assert _prefix_len(50, 10000) == 1


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """40 docs: planted near-dup chains, partial overlaps under threshold,
    short (<3-token) docs, empty docs, disjoint fillers."""
    base = (
        "streaming execution schedules arrow blocks with backpressure across "
        "the object store while partial aggregation combines before every "
        "exchange and broadcast sides ship once per worker not per batch"
    )
    texts: dict[int, str] = {}
    for i in range(8):
        # chain of small edits — adjacent members are >= 0.7, ends are not
        words = base.split()
        for j in range(i):
            words[3 * j] = f"edit{j}"
        texts[i] = " ".join(words)
    texts[10] = "tiny doc"          # < 3 tokens
    texts[11] = "tiny doc"          # exact short dup of 10
    texts[12] = "another tiny"      # short non-dup
    texts[13] = ""                  # empty gram set
    texts[14] = "   "               # empty gram set (dup of 13 by predicate)
    for i in range(20, 40):
        texts[i] = " ".join(f"w{i}x{k}" for k in range(30))  # mutually disjoint
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    d = tmp_path_factory.mktemp("simjoin")
    pq.write_table(t, d / "documents.parquet")
    return d, texts


def test_jaccard_pairs_match_brute_force(ray_session, corpus):
    import ray.data as rd

    d, texts = corpus
    ds = rd.read_parquet(str(d / "documents.parquet")).materialize()
    got = {
        (r["a"], r["b"])
        for r in jaccard_dup_pairs(ds, threshold_bp=_T_BP).take_all()
    }
    want = _brute_pairs(texts)
    # guaranteed recall: the prefix-filtered plan finds EVERY brute-force pair
    assert got == want
    assert (10, 11) in got  # short exact dup pair survives the <k-gram path
    assert all(a < 20 or False for a, b in got if a >= 20) or not any(
        a >= 20 for a, b in got
    )  # disjoint fillers never pair


def _brute_survivors(texts: dict[int, str]) -> set[int]:
    """min id per connected component of the brute-force dup graph, with
    empty-gram docs forming one extra mutual-dup component (SQL predicate:
    two empty sets satisfy 10000*0 >= t*0)."""
    parent = {i: i for i in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    empties = [i for i in sorted(texts) if not word_grams(texts[i])]
    edges = list(_brute_pairs(texts)) + list(zip(empties, empties[1:]))
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i for i in texts if find(i) == i}


def test_dedup_jaccard_exact_survivors(ray_session, corpus):
    d, texts = corpus
    surv = sorted(r["doc_id"] for r in dedup_jaccard_exact(str(d)).take_all())
    # empty-gram docs (13, 14) are mutual dups: 13 survives, 14 loses
    assert 13 in surv and 14 not in surv
    assert 10 in surv and 11 not in surv
    assert set(surv) == _brute_survivors(texts)


def test_cosine_pairs_planted(ray_session):
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.normal(size=(50, 32))
    vecs = list(base)
    # plant: 55..59 are jittered copies of 0..4
    for i in range(5):
        vecs.append(base[i] + rng.normal(scale=1e-3, size=32))
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).materialize()
    pairs = {(r["a"], r["b"]) for r in cosine_dup_pairs(ds, threshold=0.95).take_all()}
    assert pairs == {(i, 50 + i) for i in range(5)}


class TestCosineBroadcastGate:
    def test_refuses_above_bound(self, ray_session):
        import numpy as np
        import pytest
        import ray.data as rd

        from ocr_ray.ops.simjoin import cosine_dup_pairs

        t = pa.table(
            {
                "vec_id": pa.array(np.arange(64), pa.int64()),
                "embedding": pa.array(
                    [[float(i)] * 8 for i in range(64)], pa.list_(pa.float64())
                ),
            }
        )
        with pytest.raises(ValueError, match="embedding_near_dups"):
            cosine_dup_pairs(rd.from_arrow(t), max_broadcast_bytes=1024).count()

    def test_unchanged_below_bound(self, ray_session):
        """The gate must not perturb in-bound results (the driver-gated
        dedup_cosine_exact path)."""
        from ocr_ray.ops.simjoin import (
            cosine_dup_pairs,
            cosine_rows_for_sf,
            ensure_cosine_fixture,
        )
        import ray.data as rd

        path = ensure_cosine_fixture(cosine_rows_for_sf("/root/testdata/sf0.001"))
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        n = cosine_dup_pairs(ds).count()
        assert n > 0
