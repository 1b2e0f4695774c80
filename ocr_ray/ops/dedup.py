"""Deduplication operators over the ``documents`` table.

Strategies (generalizing the reference's exact upsert-by-key dedup,
save-to-google-sheet.ts:146-184 — delete rows matching a key, keep one):

* exact           content-hash groupby, keep min doc_id (SQL-checkable)
* MinHash + LSH   word-shingle MinHash signatures -> banded LSH buckets ->
                  candidate pairs -> signature-similarity verify ->
                  connected components -> keep min doc_id per component
* SimHash         64-bit simhash, 4x16-bit bands (hamming<=3 guarantee by
                  pigeonhole), verified by exact hamming distance
* embedding       cosine near-dup over the embeddings table via random-
                  hyperplane LSH buckets, verified by exact cosine

Scale notes: the per-doc signature work is a stateless vectorizable
map_batches; the only shuffles are the banded groupbys, whose rows are tiny
(band_hash, doc_id) pairs — candidate-pair generation never moves document
text. Connected components run driver-side over candidate PAIRS only, with
a logged pair count (at 100 TB you'd switch to a few rounds of min-label
propagation via groupby; the pair-level dataflow is identical).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min

_P = (1 << 61) - 1  # Mersenne prime for universal hashing
_N_PERM = 128
_BANDS = 16  # 16 bands x 8 rows -> Jaccard threshold ~0.71
_ROWS = _N_PERM // _BANDS


def _perm_params(seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _P - 1, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _P - 1, size=_N_PERM, dtype=np.int64).astype(np.uint64)
    return a, b


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)
    )


class MinHasher:
    """Actor-pool stage: text -> 128-perm MinHash signature (uint64 list).

    Permutation parameters are derived once per actor in ``__init__`` from a
    fixed seed (deterministic across the cluster)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params()
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch.column(self.text_col).to_pylist():
            x = _word_shingles(text or "")
            if len(x) == 0:
                sigs.append(np.full(_N_PERM, _P, dtype=np.uint64))
                continue
            # (n_perm, n_shingles) universal hash, min over shingles
            hv = (self.a[:, None] * x[None, :] + self.b[:, None]) % _P
            sigs.append(hv.min(axis=1))
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def _band_rows(batch: pa.Table) -> pa.Table:
    """signature rows -> (band_id, band_hash, doc_id) rows (16x fanout of
    tiny rows; the LSH 'explode')."""
    doc_ids, band_ids, band_hashes = [], [], []
    sig_col = batch.column("sig").to_pylist()
    id_col = batch.column("doc_id").to_pylist()
    for did, sig in zip(id_col, sig_col):
        arr = np.asarray(sig, dtype=np.uint64)
        for b in range(_BANDS):
            chunk = arr[b * _ROWS : (b + 1) * _ROWS]
            h = zlib.crc32(chunk.tobytes())
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(h)
    id_type = batch.schema.field("doc_id").type
    return pa.table(
        {
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "doc_id": pa.array(doc_ids, id_type),
        }
    )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """One LSH bucket -> candidate pairs (a < b). Id type is preserved
    (int doc ids or string turn uids)."""
    id_type = group.schema.field("doc_id").type
    ids = sorted(group.column("doc_id").to_pylist())
    a_out, b_out = [], []
    for i in range(len(ids) - 1):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table({"a": pa.array(a_out, id_type), "b": pa.array(b_out, id_type)})


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo  # min-id wins -> deterministic reps


def _components_survivors(all_ids, pairs) -> pa.Table:
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    reps = {uf.find(i) for i in all_ids}
    arr = pa.array(sorted(reps)) if reps else pa.array([], pa.int64())
    return pa.table({"doc_id": arr})


def minhash_signatures(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 16),
        num_cpus=1,
    )


def minhash_candidate_pairs(sigs: Dataset) -> pa.Table:
    """signatures -> verified candidate pairs (signature agreement >= 0.7).

    Verification joins pair ids back to signatures; at this scale the
    signature table is broadcast (it is ~1 KB/doc); the hash-join variant is
    the drop-in for bigger corpora."""
    banded = sigs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uniq = sorted({(r["a"], r["b"]) for r in pairs})
    if not uniq:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )  # typed-empty; callers only zip the columns
    sig_map = {
        r["doc_id"]: np.asarray(r["sig"], dtype=np.uint64) for r in sigs.take_all()
    }
    a_out, b_out = [], []
    for a, b in uniq:
        agree = int((sig_map[a] == sig_map[b]).sum())
        if agree * 10 >= _N_PERM * 7:  # est. Jaccard >= 0.7, integer math
            a_out.append(a)
            b_out.append(b)
    if not a_out:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.table({"a": pa.array(a_out), "b": pa.array(b_out)})  # id type inferred


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verification oracle for MinHash)."""
    sa, sb = set(_word_shingles(text_a, k)), set(_word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# queries() entries
# ---------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str) -> Dataset:
    """Exact dedup: keep the smallest doc_id per distinct text.

    Hash first (sha256 inside map_batches) so the groupby shuffles 32-byte
    digests, not document text."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def h(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": batch.column("doc_id")})

    agg = ds.map_batches(h, batch_format="pyarrow").groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id")
    )
    return agg.select_columns(["doc_id"])


DEDUP_EXACT_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM documents
GROUP BY text
"""


def dedup_minhash_docs(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup survivors (doc_ids kept)."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    sigs = minhash_signatures(ds).materialize()  # reused by banding + verify
    pairs_t = minhash_candidate_pairs(sigs)
    all_ids = [r["doc_id"] for r in sigs.select_columns(["doc_id"]).take_all()]
    pairs = list(
        zip(pairs_t.column("a").to_pylist(), pairs_t.column("b").to_pylist())
    )
    return _components_survivors(all_ids, pairs)


def dedup_jaccard_docs(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """Near-dup survivors with EXACT word-3-gram Jaccard verification.

    Same LSH candidate generation as MinHash, but candidates are verified
    against the true shingle-set Jaccard instead of signature agreement —
    zero false positives at the cost of re-reading candidate texts. The
    candidate texts are fetched via a broadcast-key semi-join filter (only
    candidate rows leave the read at scale)."""
    import os

    from ocr_ray.functions.joins import semi_join_filter

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    sigs = minhash_signatures(ds).materialize()
    banded = sigs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uniq = sorted({(r["a"], r["b"]) for r in pairs})
    cand_ids = sorted({i for p in uniq for i in p})
    texts = {
        r["doc_id"]: r["text"]
        for r in semi_join_filter(ds, "doc_id", cand_ids).take_all()
    }
    verified = [
        (a, b) for a, b in uniq if ngram_jaccard(texts[a], texts[b]) >= threshold
    ]
    all_ids = [r["doc_id"] for r in sigs.select_columns(["doc_id"]).take_all()]
    return _components_survivors(all_ids, verified)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _word_hash64(w: str) -> int:
    return int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big")


def simhash64(text: str) -> int:
    counts: dict[str, int] = {}
    for w in text.lower().split():
        counts[w] = counts.get(w, 0) + 1
    acc = [0] * 64
    for w, c in counts.items():
        h = _word_hash64(w)
        for bit in range(64):
            acc[bit] += c if (h >> bit) & 1 else -c
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


class SimHasher:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t or "") for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
            }
        )


def dedup_simhash_docs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup survivors. 4x16-bit bands: any pair within hamming
    distance 3 shares at least one intact band (pigeonhole)."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    sigs = ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=256, concurrency=(1, 16), num_cpus=1
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = np.asarray(batch.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
        out_id, out_band, out_val = [], [], []
        for i, did in enumerate(ids):
            v = int(sh[i])
            for b in range(4):
                out_id.append(did)
                out_band.append(b)
                out_val.append((v >> (16 * b)) & 0xFFFF)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_val, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")
    pairs = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .take_all()
    )
    uniq = sorted({(r["a"], r["b"]) for r in pairs})
    sig_map = {
        r["doc_id"]: int(r["simhash"]) & 0xFFFFFFFFFFFFFFFF for r in sigs.take_all()
    }
    verified = [
        (a, b)
        for a, b in uniq
        if bin(sig_map[a] ^ sig_map[b]).count("1") <= max_hamming
    ]
    all_ids = list(sig_map)
    return _components_survivors(all_ids, verified)


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH hyperplanes + exact verify)
# ---------------------------------------------------------------------------


def embedding_near_dups(sf_dir: str, threshold: float = 0.95, n_planes: int = 12) -> pa.Table:
    """Survivors after removing embedding near-duplicates (cosine >= 0.95).

    Random-hyperplane signatures bucket the vectors; exact cosine verifies
    candidates within a bucket. Plane matrix is seeded + broadcast."""
    import os

    import ray

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    first = ds.take(1)
    dim = len(first[0]["embedding"])
    planes = np.random.RandomState(99).randn(dim, n_planes)
    ref = ray.put(planes)

    class Bucketer:
        def __init__(self):
            self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            bits = (emb @ self.planes) > 0
            keys = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
            return pa.table(
                {"bucket": pa.array(keys), "vec_id": batch.column("vec_id")}
            )

    buckets = ds.map_batches(
        Bucketer, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8), num_cpus=1
    )
    pairs = (
        buckets.groupby("bucket")
        .map_groups(
            lambda g: _bucket_pairs(
                pa.table({"doc_id": g.column("vec_id")})
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    uniq = sorted({(r["a"], r["b"]) for r in pairs})
    # exact verify: fetch ONLY candidate vectors via a broadcast semi-join
    # filter — the verify cost is O(candidates), not O(corpus)
    from ocr_ray.functions.joins import semi_join_filter

    cand_ids = sorted({i for p in uniq for i in p})
    emb_map = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in semi_join_filter(ds, "vec_id", cand_ids).take_all()
    } if cand_ids else {}
    verified = []
    for a, b in uniq:
        va, vb = emb_map[a], emb_map[b]
        sim = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        if sim >= threshold:
            verified.append((a, b))
    all_ids = ds.unique("vec_id") or []
    out = _components_survivors(all_ids, verified)
    return out.rename_columns(["vec_id"])
