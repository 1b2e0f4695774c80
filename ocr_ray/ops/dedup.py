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

Scale design (round 2 — no driver-side materialization anywhere):

* Candidate pairs are generated WITHOUT a per-bucket ``map_groups`` over all
  buckets (per-group Python calls cost ~0.4 ms; at 10^9 docs x 16 bands most
  buckets are singletons and the calls alone would dominate). Instead a
  vectorized ``groupby(bucket).aggregate(Count)`` finds COLLISION buckets
  (2 <= n <= cap), a ``left_semi`` hash join keeps only their band rows, and
  ``map_groups`` runs solely over those — the number of collision buckets is
  proportional to the duplicate count, not the corpus.
* Oversized buckets (n > cap) are SKIPPED, never silently: the dropped row
  count is logged (no-silent-caps convention). Degenerate buckets only arise
  from pathological inputs; empty-signature docs (the easy degenerate case)
  are excluded from banding and handled exactly (see ``_empty_losers``).
* Pair verification is a pair of hash joins against the signature dataset
  (signatures never land on the driver), with a vectorized per-batch check
  (signature agreement / exact Jaccard / hamming / cosine).
* Connected components run as distributed min-label propagation
  (``groupby(node).aggregate(Min(label))`` rounds until fixpoint) — the
  classic Pregel-style CC; cluster diameter bounds the round count and
  near-dup clusters are dense/shallow. Only per-round row COUNTS reach the
  driver.
* Survivor selection is a union + groupby trick (no driver sets): corpus
  ids tagged 0 union losers tagged 1, ``groupby(id).aggregate(Max(tag))``,
  keep tag 0 — one shuffle of tiny (id, tag) rows.
"""

from __future__ import annotations

import hashlib
import logging
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

logger = logging.getLogger(__name__)

_P = (1 << 31) - 1  # Mersenne prime for universal hashing (31-bit: see below)
_N_PERM = 128  # default; see minhash_signatures(n_perms=...) for the 64-perm option
_ROWS = 8  # rows per band (fixed); band count = signature width // _ROWS:
#   128 perms -> 16 bands x 8 rows -> Jaccard threshold ~(1/16)^(1/8) = 0.71
#   64 perms  ->  8 bands x 8 rows -> threshold ~(1/8)^(1/8) = 0.77 (cheaper
#   signatures, slightly blunter recall near the threshold — documented
#   tradeoff; the default stays 128 and bit-identical)
_BANDS = _N_PERM // _ROWS
# Cap on LSH bucket size for pair generation: a bucket of n emits n(n-1)/2
# pairs; above the cap the bucket is skipped WITH A LOGGED DROP (no silent
# truncation). 64 -> at most ~2k pairs per bucket.
_MAX_BUCKET = 64
# Shuffle-join partition cap for the pair/signature joins; the actual count
# is sized from the (known, already-counted) row count of the small side —
# every hash-shuffle op spins up num_partitions aggregator actors, a fixed
# ~per-partition cost that dominates when the candidate set is tiny.
_PAIR_JOIN_PARTS = 8


def _dyn_parts(n_rows: int, cap: int = 64) -> int:
    """Partition count for a shuffle over ``n_rows`` small rows: ~100k rows
    per partition, min 2, capped. Grows with the candidate set at scale,
    stays minimal for the common near-empty case."""
    return max(2, min(cap, n_rows // 100_000 + 2))


def _coerce_schema(ds: Dataset, schema: pa.Schema, parts: int = _PAIR_JOIN_PARTS) -> Dataset:
    """Normalize block schemas after a hash-shuffle join/aggregate.

    Ray 2.49's hash-shuffle operators emit EMPTY partitions as zero-column
    blocks; a later ``Dataset.join`` then fails at finalize with "No match
    for FieldRef" (and ``map_batches`` is skipped on empty blocks, so a
    plain fix-up UDF never sees them). ``repartition`` concatenates blocks
    and so absorbs the degenerate ones; the map then stamps column order /
    types. Only used on the tiny pair/label/stat datasets, where the extra
    exchange is noise."""

    def fix(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.repartition(parts).map_batches(fix, batch_format="pyarrow")


def _perm_params(seed: int = 1234, n_perm: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) for the universal hash ``(a * (x mod P) + b) mod P`` over the
    31-bit Mersenne prime P = 2^31 - 1.

    Round 1 used P = 2^61 - 1 with a < 2^61: the uint64 product a*x wrapped
    mod 2^64 and silently voided the universal-hash guarantee (ADVICE.md).
    Merely shrinking ``a`` (a < 2^29) removes the overflow but BREAKS MinHash
    outright: a*x + b < 4P barely wraps the modulus, the map is near-monotone
    in x, and every "permutation" selects the same minimum shingle (measured:
    62/128 agreement on a Jaccard-0.99 pair). With P = 2^31 - 1, a,x < P the
    product is < 2^62 (no uint64 overflow) AND wraps the modulus ~2^31 times
    — a genuine Carter–Wegman hash."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _P, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _P, size=n_perm, dtype=np.int64).astype(np.uint64)
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


_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)
_MIX_C = np.uint64(0x165667B19E3779F9)


def _mix_fin(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, wrapping uint64)."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _shingle_batch_fast(texts: list, k: int = 3) -> list:
    """Vectorized batch shingler (opt-in ``shingle_hasher='sip64'``):
    Arrow lower+whitespace-split over the whole batch, fixed-key siphash
    per token (pandas C kernel), rolling positional 3-gram combine +
    splitmix64 finalize on the FLAT token-hash array, per-doc unique.

    vs the default per-doc ``_word_shingles`` (string k-gram join + crc32
    per gram): 64-bit gram identities instead of crc32's 32 bits — at
    25M grams crc32 expects ~70k birthday collisions (distinct grams
    conflated into one shingle id, silently inflating similarity), 64-bit
    ~0.02 — the QUALITY option for corpus-scale runs. Wall-clock measured
    within noise of the default at fixture scale (the universal-hash
    signature compute dominates, not shingling). Different hash universe
    => NOT bit-identical to the default; same MinHash semantics. Docs
    with fewer than k tokens hash their whole token sequence as one gram
    (mirroring the default's single joined gram); empty docs have zero
    shingles."""
    import pandas.util as pdu

    col = pa.array(["" if t is None else t for t in texts], pa.string())
    split = pc.utf8_split_whitespace(pc.utf8_lower(col))
    toks = pc.list_flatten(split)
    lens0 = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(texts)
    rows = np.repeat(np.arange(n_docs, dtype=np.int64), lens0)
    nonempty = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
    lens = np.bincount(rows[nonempty], minlength=n_docs)
    flat = toks.filter(pa.array(nonempty))
    h = pdu.hash_array(flat.to_numpy(zero_copy_only=False), categorize=False)
    offs = np.concatenate(([0], np.cumsum(lens)))
    if len(h) >= k:
        g = _mix_fin(h[:-2] * _MIX_A + h[1:-1] * _MIX_B + h[2:] * _MIX_C)
    else:
        g = np.empty(0, np.uint64)
    out = []
    weights = (_MIX_A, _MIX_B, _MIX_C)
    for i in range(n_docs):
        s, e = offs[i], offs[i + 1]
        t = e - s
        if t == 0:
            out.append(np.zeros(0, dtype=np.uint64))
        elif t < k:
            acc = (h[s:e] * np.array(weights[:t], np.uint64)).sum(dtype=np.uint64)
            out.append(_mix_fin(np.array([acc], np.uint64)))
        else:
            out.append(np.unique(g[s : e - 2]))
    return out


import functools


@functools.lru_cache(maxsize=4)
def _cached_perms(seed: int = 1234, n_perm: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Per-worker-process cache of the permutation parameters (derived from
    a fixed seed, deterministic across the cluster). Computing them is ~µs,
    so TASK-mode map_batches with this cache beats an actor pool: no pool
    startup latency, and scheduling stays fully elastic."""
    return _perm_params(seed, n_perm)


# Elementwise-compute chunk (shingles per pass) and per-worker scratch for
# the universal-hash intermediates. The hash math allocates (n_perm, chunk)
# uint64 temporaries; letting numpy malloc them FRESH per batch means every
# batch pays first-touch page faults on ~100 MB of mmap'd pages — measured
# at up to ~130 us per 4 KiB page on a memory-ballooned host, turning a
# 10 ms kernel into seconds. Warm per-process buffers + ``out=`` keep the
# pages mapped for the worker's lifetime (same math, bit-identical output).
#
# Chunk size trades FIRST-TOUCH cost against per-pass call overhead: the
# scratch is (128, chunk) uint64, so chunk 2^15 = a 32 MiB buffer whose
# initial page faults cost ~2.6 s per fresh worker on this host (measured —
# it dominated the whole signature stage, every task landing on a cold
# worker). chunk 2^12 = 4 MiB ≈ 0.3 s first-touch, while a pass still moves
# 128 x 4096 = 512k elements per numpy call — far past the vectorization
# knee (steady-state throughput measured within noise of 2^15).
_HV_CHUNK = 1 << 12
_SCRATCH: dict[str, np.ndarray] = {}


def _hv_scratch(n_perm: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    hv = _SCRATCH.get(("hv", n_perm))
    if hv is None:
        hv = np.empty((n_perm, _HV_CHUNK), np.uint64)
        _SCRATCH[("hv", n_perm)] = hv
    xm = _SCRATCH.get("xm")
    if xm is None:
        xm = _SCRATCH["xm"] = np.empty(_HV_CHUNK, np.uint64)
    return hv, xm


def _hash_chunk(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * (x mod P) + b) mod P for one shingle chunk (len <= _HV_CHUNK),
    computed entirely in warm scratch; returns a VIEW into the scratch
    buffer (consume before the next call)."""
    hv_buf, xm_buf = _hv_scratch(len(a))
    n = len(x)
    xv = xm_buf[:n]
    np.mod(x, np.uint64(_P), out=xv)
    h = hv_buf[:, :n]
    np.multiply(a[:, None], xv[None, :], out=h)
    np.add(h, b[:, None], out=h)
    np.mod(h, np.uint64(_P), out=h)
    return h


def _minhash_batch(batch: pa.Table, text_col: str, id_col: str,
                   n_perm: int = _N_PERM, shingle_hasher: str = "crc32") -> pa.Table:
    """text -> 128-perm MinHash signature (uint64 list). Docs with zero
    shingles (empty/whitespace text) get the all-``_P`` sentinel.

    The universal hash runs over segments of WHOLE docs packed up to
    ``_HV_CHUNK`` shingles (one elementwise pass per segment through the
    warm scratch, see above), then per-doc minima fall out of one
    ``np.minimum.reduceat`` at the doc offsets. A single doc larger than
    the chunk is sub-chunked with running minima."""
    a, b = _cached_perms(n_perm=n_perm)
    texts = batch.column(text_col).to_pylist()
    if shingle_hasher == "sip64":
        shingles = _shingle_batch_fast(texts)
    else:
        shingles = [_word_shingles(t or "") for t in texts]
    lens = np.array([len(s) for s in shingles], dtype=np.int64)
    n_docs = len(texts)
    sig_mat = np.full((n_docs, n_perm), _P, dtype=np.uint64)  # sentinel rows
    i = 0
    while i < n_docs:
        j, tot = i, 0
        while j < n_docs and (tot == 0 or tot + lens[j] <= _HV_CHUNK):
            tot += lens[j]
            j += 1
        seg_idx = np.arange(i, j)[lens[i:j] > 0]
        i = j
        if len(seg_idx) == 0:
            continue
        if tot <= _HV_CHUNK:
            x_all = np.concatenate([shingles[k] for k in seg_idx])
            h = _hash_chunk(x_all, a, b)
            seglens = lens[seg_idx]
            offsets = np.concatenate(([0], np.cumsum(seglens)[:-1]))
            sig_mat[seg_idx] = np.minimum.reduceat(h, offsets, axis=1).T
        else:
            # one oversized doc: sub-chunk its shingles, combine minima
            (k,) = seg_idx
            x = shingles[k]
            for s in range(0, len(x), _HV_CHUNK):
                h = _hash_chunk(x[s : s + _HV_CHUNK], a, b)
                np.minimum(sig_mat[k], h.min(axis=1), out=sig_mat[k])
    flat = pa.array(sig_mat.ravel(), pa.uint64())
    offs = pa.array(np.arange(0, (n_docs + 1) * n_perm, n_perm, dtype=np.int32))
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "sig": pa.ListArray.from_arrays(offs, flat),
        }
    )


def minhash_signatures(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    n_perms: int = _N_PERM, shingle_hasher: str = "crc32",
) -> Dataset:
    """text -> n_perms-perm MinHash signatures. ``n_perms`` trades
    signature-compute cost against banding sharpness: 128 (default,
    bit-identical to always) = 16 bands x 8 rows, LSH threshold ~0.71;
    64 = 8 bands x 8 rows, threshold ~0.77 — half the signature flops for
    slightly blunter recall just above the threshold (the verify stage is
    unchanged, so precision does not move). All downstream stages infer
    the width from the signature rows."""
    if n_perms % _ROWS != 0:
        raise ValueError(f"n_perms must be a multiple of {_ROWS} (rows/band)")
    if shingle_hasher not in ("crc32", "sip64"):
        raise ValueError("shingle_hasher must be 'crc32' (default) or 'sip64'")
    return ds.map_batches(
        _minhash_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "n_perm": n_perms,
                   "shingle_hasher": shingle_hasher},
        batch_format="pyarrow",
        batch_size=256,
    )


def _is_empty_sig(sig_col) -> pa.Array:
    """Vectorized empty-signature test: element 0 == _P sentinel (hash values
    are mod ``_P`` so a real signature's min is always < ``_P``)."""
    return pc.equal(pc.list_element(sig_col, 0), pa.scalar(_P, pa.uint64()))


def _band_rows(batch: pa.Table) -> pa.Table:
    """signature rows -> (band_hash, doc_id) rows (16x fanout of tiny rows;
    the LSH 'explode'). Empty-signature docs are EXCLUDED — they carry no
    similarity information and would all collide into one degenerate bucket
    per band; they are handled exactly by ``_empty_losers``. The band index
    is folded into the hash (band_hash = crc32(band_id || chunk)) so the
    bucket key is a single int64 column."""
    batch = batch.filter(pc.invert(_is_empty_sig(batch.column("sig"))))
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "band_hash": pa.array([], pa.int64()),
                "doc_id": pa.array([], batch.schema.field("doc_id").type),
            }
        )
    # zero-copy (n, _N_PERM) view of the list column via the values buffer,
    # then per-(doc, band) crc32 over memoryview slices of ONE contiguous
    # bytes object — same 64-byte payload and seed as the original per-chunk
    # hashing (bit-identical band_hash; equality verified), but without
    # materializing 128-element Python lists per doc (measured 9x faster)
    col = batch.column("sig").combine_chunks()
    mat = np.asarray(col.flatten()).reshape(n, -1)
    n_perm = mat.shape[1]
    bands = n_perm // _ROWS
    mv = memoryview(mat.tobytes())
    row_bytes = n_perm * 8
    band_bytes = _ROWS * 8
    bh = np.empty(n * bands, dtype=np.int64)
    crc = zlib.crc32
    k = 0
    for i in range(n):
        base = i * row_bytes
        for b in range(bands):
            bh[k] = (b << 32) | crc(mv[base + b * band_bytes : base + (b + 1) * band_bytes], b)
            k += 1
    ids = batch.column("doc_id").take(
        pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
    )
    return pa.table({"band_hash": pa.array(bh, pa.int64()), "doc_id": ids})


_PAIR_TPL_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _pair_template(n: int) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) index pairs with i < j < n, cached (n is <= the bucket cap
    for capped callers; uncapped hot buckets get a one-off template)."""
    tpl = _PAIR_TPL_CACHE.get(n)
    if tpl is None:
        tpl = np.triu_indices(n, 1)
        if n <= 4096:
            _PAIR_TPL_CACHE[n] = tpl
    return tpl


def _partition_pairs(t: pa.Table, max_bucket: int | None) -> pa.Table:
    """All candidate pairs of ONE coarse partition, fully vectorized.

    Rows arrive with every member of a bucket co-located (partition key is a
    function of band_hash). Sort by (band_hash, doc_id), find bucket runs
    with a numpy boundary diff, drop runs outside [2, max_bucket] (dropped
    row counts are LOGGED — no silent caps), then emit each run's pairs via
    cached triu index templates batched by run length: zero Python work per
    bucket, a < b by the sort order, any Arrow id type."""
    id_type = t.schema.field("doc_id").type
    pair_schema = pa.schema([("a", id_type), ("b", id_type)])
    if t.num_rows == 0:
        return pair_schema.empty_table()
    t = t.sort_by([("band_hash", "ascending"), ("doc_id", "ascending")])
    bh = t.column("band_hash").to_numpy(zero_copy_only=False)
    n = len(bh)
    starts = np.flatnonzero(np.r_[True, bh[1:] != bh[:-1]])
    lens = np.diff(np.r_[starts, n])
    ok = lens >= 2
    if max_bucket is not None:
        over = lens > max_bucket
        if over.any():
            logger.warning(
                "candidate_pairs: skipped %d oversized LSH buckets (> %d members, "
                "%d band rows dropped from pairing)",
                int(over.sum()), max_bucket, int(lens[over].sum()),
            )
        ok &= ~over
    elif (lens > 1000).any():
        # uncapped (exact-recall) callers: hot buckets are kept but logged
        hot = lens[lens > 1000]
        logger.warning(
            "candidate_pairs: %d hot buckets (max %d members) in uncapped pairing",
            len(hot), int(hot.max()),
        )
    starts, lens = starts[ok], lens[ok]
    if len(starts) == 0:
        return pair_schema.empty_table()
    ia_parts, ib_parts = [], []
    for m in np.unique(lens):
        runs = starts[lens == m]
        ti, tj = _pair_template(int(m))
        ia_parts.append((runs[:, None] + ti[None, :]).ravel())
        ib_parts.append((runs[:, None] + tj[None, :]).ravel())
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    ids = t.column("doc_id").combine_chunks()
    return pa.table({"a": ids.take(pa.array(ia)), "b": ids.take(pa.array(ib))})


def candidate_pairs(
    banded: Dataset, *, id_type: pa.DataType = None, max_bucket: int | None = _MAX_BUCKET
) -> Dataset:
    """Banded LSH rows -> DISTINCT candidate pairs, fully distributed, with
    ONE data shuffle.

    1. coarse partition key ``__part = band_hash & (P-1)`` (vectorized) —
       every bucket lands whole in one partition
    2. ``groupby(__part).map_groups``: ONE Python call per partition;
       inside, buckets are found and paired vectorized
       (``_partition_pairs``): run detection via numpy boundary diff, pair
       fan-out via cached ``triu_indices`` templates batched by run length
    3. oversized buckets (> max_bucket) are dropped with a logged row count
       (no silent caps); ``max_bucket=None`` = NO cap (exact-recall callers,
       e.g. the prefix-filter similarity join) — hot buckets still logged
    4. distinct via ``groupby(a, b)`` (same pair can fire in several bands)

    Replaces the round-1/2 census + semi-join plan (3 shuffles of the full
    band table) — same output, one shuffle."""
    if id_type is None:
        id_type = pa.int64()
    pair_schema = pa.schema([("a", id_type), ("b", id_type)])
    num_parts = 64

    # r5 census tier: post-exact-dedup corpora have FEW collision buckets
    # (3.3k pairs from 3.2M band rows at the sf0.1 composed pipeline), so
    # shuffling the whole band table into partitions pays a full exchange
    # for near-empty output — measured 7.8 s of the 8.2 s survivors tail.
    # Census the band hashes via per-batch unique partials + the gated
    # driver combine (same local-solve pattern as the dup-ngram census);
    # below the gate, broadcast the hot-bucket set and shuffle ONLY its
    # rows. Above the gate (the 100 TB path, where collision volume is
    # unknowable driver-side) the one-shuffle plan below runs unchanged.
    def _bucket_census(t: pa.Table) -> pa.Table:
        h = t.column("band_hash").to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u), "n": pa.array(c.astype(np.int64))})

    from ocr_ray.ops.corpus import _sum_partials_gated

    local = _sum_partials_gated(
        banded.map_batches(_bucket_census, batch_format="pyarrow"), "h"
    )
    if local is not None:
        import ray as _ray

        hot_df = local.loc[local["n"] >= 2]
        if len(hot_df) == 0:
            return rd.from_arrow(pair_schema.empty_table())
        hot = hot_df["h"].to_numpy(np.int64)
        hot_rows = int(hot_df["n"].sum())
        hot_ref = _ray.put(pa.array(hot, pa.int64()))

        def keep_hot(t: pa.Table) -> pa.Table:
            import ray as _ray

            return t.filter(
                pc.is_in(t.column("band_hash"), value_set=_ray.get(hot_ref))
            )

        filtered = banded.map_batches(keep_hot, batch_format="pyarrow")
        if hot_rows <= _LOCAL_PAIR_MAX_ROWS:
            # the census bounds the collision volume EXACTLY, so the whole
            # hot-row set (tiny 16-byte rows) can be pulled and paired in
            # one vectorized _partition_pairs call — replacing a
            # groupby(__part).map_groups exchange whose fixed cost was
            # 3.8 s for 437 hot buckets at the sf0.1 composed pipeline
            tabs = [
                b
                for b in filtered.iter_batches(batch_format="pyarrow", batch_size=None)
                if b.num_rows
            ]
            if not tabs:
                return rd.from_arrow(pair_schema.empty_table())
            pt = _partition_pairs(pa.concat_tables(tabs), max_bucket)
            distinct_t = pt.group_by(["a", "b"]).aggregate([])
            return rd.from_arrow(
                distinct_t.select(["a", "b"]).cast(pair_schema)
                if distinct_t.num_rows
                else pair_schema.empty_table()
            )
        banded = filtered

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part",
            pc.cast(pc.bit_wise_and(t.column("band_hash"), num_parts - 1), pa.int32()),
        )

    parted = banded.map_batches(add_part, batch_format="pyarrow")
    pairs = parted.groupby("__part").map_groups(
        lambda g: _partition_pairs(g, max_bucket), batch_format="pyarrow"
    )
    distinct = (
        pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    )
    return _coerce_schema(distinct, pair_schema)


def _pack_lists(col, dtype) -> pa.Array:
    """list<numeric> column -> fixed-width binary (Arrow joins don't carry
    list-typed non-key columns; packed bytes also shuffle cheaper).

    Vectorized: the list values buffer becomes the binary data buffer in one
    ``tobytes`` — no per-row Python. Requires equal-length rows (MinHash
    sigs are fixed ``_N_PERM``); ragged input falls back to the row loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return pa.array([], pa.binary())
    lens = pc.list_value_length(arr)
    width_elems = lens[0].as_py()
    if arr.null_count == 0 and pc.min(lens).as_py() == pc.max(lens).as_py():
        flat = np.asarray(arr.flatten()).astype(dtype, copy=False)
        width = width_elems * flat.itemsize
        offs = pa.array(np.arange(0, (n + 1) * width, width, dtype=np.int32))
        return pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, offs.buffers()[1], pa.py_buffer(flat.tobytes())]
        )
    rows = arr.to_pylist()
    return pa.array(
        [np.asarray(r, dtype=dtype).tobytes() for r in rows], pa.binary()
    )


def _unpack_lists(col, dtype) -> np.ndarray:
    """binary column of equal-length packed rows -> (n, k) ndarray.

    Vectorized via the binary values buffer when rows are contiguous and
    equal-width (the only shape ``_pack_lists`` produces); falls back to the
    per-row path otherwise (e.g. join output that re-chunked arbitrarily —
    combine_chunks restores contiguity, so the fast path is the norm)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if arr.null_count == 0:
        offsets = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset : arr.offset + n + 1
        ]
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all():
            data = np.frombuffer(arr.buffers()[2], np.uint8)
            flat = data[offsets[0] : offsets[0] + n * widths[0]]
            return flat.view(dtype).reshape(n, -1)
    rows = arr.to_pylist()
    return np.stack([np.frombuffer(r, dtype=dtype) for r in rows])


def _paired_with(
    pairs: Dataset,
    side_ds: Dataset,
    key: str,
    payload: str,
    out: str,
    *,
    left_schema: pa.Schema,
    payload_type: pa.DataType,
    parts: int = _PAIR_JOIN_PARTS,
) -> tuple[Dataset, pa.Schema]:
    """hash-join one pair endpoint against a (doc_id, payload) dataset,
    renaming the payload to ``out``. Payloads stay distributed; list-typed
    payloads must be packed to binary by the caller first (Arrow join
    constraint). Returns (dataset, schema) so chained joins can coerce the
    empty-partition blocks Ray's hash shuffle emits."""
    side = side_ds.map_batches(
        lambda t, p=payload, o=out: pa.table(
            {"__k": t.column("doc_id"), o: t.column(p)}
        ),
        batch_format="pyarrow",
    )
    # distinct right-side key name: a same-named key would leave two columns
    # called ``key`` in the join output (right key is dropped only when
    # ``right_on`` differs)
    out_schema = left_schema.append(pa.field(out, payload_type))
    j = pairs.join(
        side, join_type="inner", num_partitions=parts,
        on=(key,), right_on=("__k",),
    )
    return _coerce_schema(j, out_schema, parts), out_schema


# Pair-count gate for pruning the join side down to candidate endpoints
# before the verify joins: the distinct endpoint ids (<= 2 x pairs, ~30 B
# each) are broadcast ONCE via ray.put and the corpus-sized (doc_id, payload)
# side is filtered vectorized (pc.is_in) — the hash joins then shuffle only
# candidate rows (pairs-sized), never the corpus payload (the full 1 KB/doc
# signature table through TWO joins dominated verify: measured 13.9 s for
# 7.6k pairs over a 397k-doc corpus, ~1 s after the prune). Above the gate
# the endpoint set is no longer broadcast-sized and the full side flows to
# the join as before.
_VERIFY_PRUNE_MAX_PAIRS = int(os.environ.get("OCR_RAY_VERIFY_PRUNE_MAX_PAIRS", "500000"))


def _endpoint_filter(side: Dataset, pairs: Dataset, n_pairs: int | None) -> Dataset:
    """Size-gated probe prune of a (doc_id, payload) join side: keep only
    rows whose doc_id appears as a candidate-pair endpoint. ``pairs`` must
    be materialized (both callers do). No-op above the gate."""
    if n_pairs is None or not (0 < n_pairs <= _VERIFY_PRUNE_MAX_PAIRS):
        return side
    import ray as _ray

    chunks = []
    for t in (_ray.get(r) for r in pairs.to_arrow_refs()):
        if t.num_rows:
            chunks.append(t.column("a").combine_chunks())
            chunks.append(t.column("b").combine_chunks())
    if not chunks:
        return side
    eps = pc.unique(pa.chunked_array(chunks))
    ref = _ray.put(eps)

    def keep(t: pa.Table, _r=ref) -> pa.Table:
        vs = _ray.get(_r)
        return t.filter(pc.is_in(t.column("doc_id"), value_set=vs))

    return side.map_batches(keep, batch_format="pyarrow")


# Pair gate for verifying on ONE worker: below this the endpoint-filtered
# signature slice (bounded: 2 x gate x ~1 KB) and the pair list move to a
# single task that runs the SAME agreement kernel the whole-corpus local
# path uses (_sig_matrix + _pair_rows) — replacing TWO Dataset hash joins
# whose fixed shuffle cost (~18 s measured at sf0.1 for 7.6k pairs -> 10
# verified) dwarfs the compare. Above the gate the join plan runs; the
# agreement math is identical either way.
_LOCAL_VERIFY_MAX_PAIRS = int(os.environ.get("OCR_RAY_VERIFY_LOCAL_MAX_PAIRS", "200000"))


def verified_pairs_minhash(
    pairs: Dataset, sigs: Dataset, *, threshold_bp: int = 7000,
    id_type: pa.DataType = None, parts: int = _PAIR_JOIN_PARTS,
    n_pairs: int | None = None,
) -> Dataset:
    """Keep pairs whose signature agreement >= threshold (basis points).

    Two hash joins bring both signatures onto each pair row; the agreement
    check is a vectorized numpy compare per batch. No driver materialization.
    Small candidate sets prune the join side first (``_endpoint_filter``)
    and, under ``_LOCAL_VERIFY_MAX_PAIRS``, skip the joins entirely: one
    worker task verifies the bounded endpoint slice vectorized.
    """
    if id_type is None:
        id_type = pa.int64()
    pair_schema = pa.schema([("a", id_type), ("b", id_type)])
    if n_pairs is not None and 0 < n_pairs <= _LOCAL_VERIFY_MAX_PAIRS:
        import ray as _ray

        side = _endpoint_filter(sigs, pairs, n_pairs)

        def _vfy_local(pair_refs, sig_refs):
            pts = [t for t in _ray.get(pair_refs) if t.num_rows]
            sts = [t for t in _ray.get(sig_refs) if t.num_rows]
            if not pts or not sts:
                return pair_schema.empty_table()
            pt = pa.concat_tables([t.select(["a", "b"]) for t in pts]).combine_chunks()
            st = pa.concat_tables(
                [t.select(["doc_id", "sig"]) for t in sts]
            ).combine_chunks()
            mat = _sig_matrix(st)
            ia, ib = _pair_rows(pt, st, "doc_id")
            agree = (mat[ia] == mat[ib]).sum(axis=1)
            return pt.filter(pa.array(agree * 10_000 >= mat.shape[1] * threshold_bp))

        task = _ray.remote(_vfy_local)
        ref = task.remote(pairs.to_arrow_refs(), side.to_arrow_refs())
        return rd.from_arrow_refs([ref])
    # prune FIRST (cheap is_in scan), pack second (only candidate rows pay
    # the list->binary copy); materialized: both endpoint joins consume it —
    # lazy would re-run the scan+pack once per join
    packed = _endpoint_filter(sigs, pairs, n_pairs).map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "sig": _pack_lists(t.column("sig"), np.uint64)}
        ),
        batch_format="pyarrow",
    ).materialize()
    j, s1 = _paired_with(
        pairs, packed, "a", "sig", "sig_a",
        left_schema=pair_schema, payload_type=pa.binary(), parts=parts,
    )
    j, _ = _paired_with(
        j, packed, "b", "sig", "sig_b", left_schema=s1, payload_type=pa.binary(),
        parts=parts,
    )

    def check(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["a", "b"])
        sa = _unpack_lists(t.column("sig_a"), np.uint64)
        sb = _unpack_lists(t.column("sig_b"), np.uint64)
        agree = (sa == sb).sum(axis=1)
        keep = agree * 10_000 >= sa.shape[1] * threshold_bp
        return t.select(["a", "b"]).filter(pa.array(keep))

    return j.map_batches(check, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed connected components: min-label propagation
# ---------------------------------------------------------------------------


# Edge-count gate for solving components locally: below this, one worker
# solves the candidate-pair graph in a single union-find pass (the driver
# holds O(min(edges, gate)) PAIR rows — bounded by the gate, never
# corpus-sized — vs ~10 sequential Dataset ops per propagation round, each
# with fixed scheduling cost). Above the gate the distributed min-label
# rounds run; both paths produce identical labels (equality pytest-gated).
_LOCAL_CC_MAX_EDGES = int(os.environ.get("OCR_RAY_CC_LOCAL_MAX_EDGES", "2000000"))


def _local_components(edges: Dataset, label_schema: pa.Schema) -> Dataset:
    """Single-pass union-find over a SMALL materialized edge list.

    Path-halving union by min-id; output matches propagate_min_labels
    exactly: one row per distinct endpoint, label = component minimum."""
    import ray as _ray

    # blocks may carry extra columns (e.g. a verify-stage similarity score)
    # or per-block schema drift; pull only the two endpoint columns
    a: list = []
    b: list = []
    for ref in edges.to_arrow_refs():
        t = _ray.get(ref)
        if t.num_rows:
            a += t.column("a").to_pylist()
            b += t.column("b").to_pylist()
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min: the smaller id becomes the root, so the final
            # root IS the component minimum
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    nodes = list(parent)
    labels = [find(n) for n in nodes]
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, label_schema.field("node").type),
                  "label": pa.array(labels, label_schema.field("label").type)})
    )


def propagate_min_labels(
    pairs: Dataset, *, max_iters: int = 25, id_type: pa.DataType = None
) -> Dataset:
    """Undirected edges (a, b) -> (node, label) with label = component min.

    Size-gated hybrid: candidate-pair graphs are O(near-dup pairs), far
    smaller than the corpus, so below ``_LOCAL_CC_MAX_EDGES`` a single
    union-find pass solves them (driver cost bounded by the gate). Above
    the gate: Pregel-style min-label propagation expressed as Dataset ops —
    each round every edge endpoint offers its current label to the other
    endpoint and ``groupby(node).aggregate(Min)`` takes the smallest.
    Rounds = component diameter (shallow for LSH near-dup clusters);
    iteration is capped and logged. Per round only a changed-row COUNT
    reaches the driver; labels and edges stay distributed. Labels datasets
    are materialized per round (they are O(paired nodes) — candidate rows,
    not corpus rows)."""
    if id_type is None:
        id_type = pa.int64()
    label_schema = pa.schema([("node", id_type), ("label", id_type)])
    pair_schema = pa.schema([("a", id_type), ("b", id_type)])
    edges = _coerce_schema(pairs, pair_schema).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # typed-empty labels (a map over the empty edges would come back
        # schemaless — Ray skips UDFs on 0-row blocks)
        return rd.from_arrow(label_schema.empty_table())
    if n_edges <= _LOCAL_CC_MAX_EDGES:
        logger.info(
            "propagate_min_labels: %d edges <= %d, local union-find path",
            n_edges, _LOCAL_CC_MAX_EDGES,
        )
        return _local_components(edges, label_schema)
    parts = _dyn_parts(2 * n_edges)

    # Symmetric edge list, built ONCE: (a,b) and (b,a) as (src, dst). Each
    # propagation round is then a single join on src (labels flow src->dst)
    # instead of two separate a-side/b-side joins — halves the per-round
    # shuffle count, same messages.
    def _sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edges_sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    labels = (
        _coerce_schema(
            edges_sym.map_batches(
                lambda t: pa.table({"node": t.column("src"), "label": t.column("src")}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Min("label", alias_name="label")),
            label_schema,
            parts,
        )
        .materialize()
    )

    def _label_digest(lab: Dataset) -> int:
        """Order-independent digest of the label assignment: sum of per-row
        crc32(node#label). Labels only decrease, so digest-unchanged across
        a round == fixpoint (for integer ids this is sum-of-labels-exact in
        spirit; the crc fold covers string uids — a sum collision would need
        simultaneous compensating changes, vanishingly unlikely and at worst
        costs one early stop of a refinement round, never wrong output,
        because the verified-pair edges bound the merge set)."""

        def h(t: pa.Table) -> pa.Table:
            # vectorized row fold: crc-equivalent mixing via Arrow hash64 of
            # "node#label" (string ids) or a numpy splitmix on int ids
            node, label = t.column("node"), t.column("label")
            if pa.types.is_integer(node.type):
                n = node.to_numpy(zero_copy_only=False).astype(np.uint64)
                l = label.to_numpy(zero_copy_only=False).astype(np.uint64)
                z = n * np.uint64(0x9E3779B97F4A7C15) ^ l
                z ^= z >> np.uint64(30)
                z *= np.uint64(0xBF58476D1CE4E5B9)
                z ^= z >> np.uint64(27)
                # top 32 bits only: row values < 2^32 keep the int64 SUM
                # overflow-free up to 2^31 label rows (crc32 gave the same
                # bound on the string path)
                vals = (z >> np.uint64(32)).astype(np.int64)
            else:
                import zlib as _z

                vals = np.fromiter(
                    (
                        _z.crc32(f"{x}#{y}".encode())
                        for x, y in zip(node.to_pylist(), label.to_pylist())
                    ),
                    dtype=np.int64,
                    count=t.num_rows,
                )
            return pa.table({"d": pa.array(vals, pa.int64())})

        out = lab.map_batches(h, batch_format="pyarrow").sum("d")
        return int(out or 0)

    digest = _label_digest(labels)
    for it in range(max_iters):
        # messages: each node's label flows along every out-edge of the
        # symmetric edge list (one join per round)
        msgs = _relabel_join(edges_sym, labels, label_schema=label_schema, parts=parts)
        cands = labels.union(msgs)
        new_labels = (
            _coerce_schema(
                cands.groupby("node").aggregate(Min("label", alias_name="label")),
                label_schema,
                parts,
            )
            .materialize()
        )
        new_digest = _label_digest(new_labels)
        if new_digest == digest:
            # cheap digest says fixpoint — CONFIRM exactly (once per query,
            # not per round): a changed node's (node, label) appears once
            # under old and once under new; unchanged appears twice.
            tagged = labels.union(new_labels)
            n_changed = (
                _coerce_schema(
                    tagged.groupby(["node", "label"]).aggregate(Count(alias_name="c")),
                    label_schema.append(pa.field("c", pa.int64())),
                    parts,
                )
                .filter(expr="c == 1")
                .count()
            )
            labels = new_labels
            if n_changed == 0:
                break
        else:
            labels = new_labels
        digest = new_digest
    else:
        logger.warning(
            "propagate_min_labels: hit max_iters=%d before fixpoint "
            "(pathologically deep component chain)", max_iters
        )
    return labels


def _relabel_join(
    edges_sym: Dataset, labels: Dataset, *, label_schema: pa.Schema,
    parts: int = _PAIR_JOIN_PARTS,
) -> Dataset:
    """symmetric edges (src,dst) x labels (node,label) on src ->
    (node=dst, label) — the per-round message set.

    No coercion needed on the join output: the following map is simply
    skipped on the join's empty (schemaless) partition blocks, and the
    downstream groupby tolerates them — only JOIN inputs need a schema-
    bearing block, and this output feeds a groupby, not a join."""
    j = edges_sym.join(
        labels, join_type="inner", num_partitions=parts,
        on=("src",), right_on=("node",),
    )
    return j.map_batches(
        lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
        batch_format="pyarrow",
    )


def _losers_from_labels(labels: Dataset) -> Dataset:
    """Nodes whose component label is not themselves (they are removed)."""

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("node"), t.column("label")))
        return pa.table({"loser": t.filter(keep).column("node")})

    return labels.map_batches(fn, batch_format="pyarrow")


def _empty_losers(sigs: Dataset, id_type: pa.DataType = None) -> Dataset:
    """Empty-signature docs are mutual near-dups (Jaccard of two empties is
    1 by convention): all but the min id lose. Exact aggregate, no pairs —
    this replaces round 1's degenerate all-empties LSH bucket (which was the
    easiest way to explode ``_bucket_pairs`` quadratically, ADVICE.md r1)."""
    if id_type is None:
        id_type = pa.int64()
    empties = sigs.map_batches(
        lambda t: t.filter(_is_empty_sig(t.column("sig"))).select(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()
    if empties.count() <= 1:
        return rd.from_arrow(pa.schema([("loser", id_type)]).empty_table())
    rep = empties.aggregate(Min("doc_id"))["min(doc_id)"]  # single scalar
    return empties.map_batches(
        lambda t: pa.table(
            {"loser": t.filter(pc.not_equal(t.column("doc_id"), pa.scalar(rep))).column("doc_id")}
        ),
        batch_format="pyarrow",
    )


# Loser-count gate for the broadcast anti-filter: near-dup loser sets are
# normally FAR smaller than the corpus, and the groupby fallback is the
# hash-aggregate census class (~170k rows/s at id-cardinality ~ row count;
# measured 12 s over 396k ids at sf0.1 for a 10-loser set). Below the gate
# the loser ids broadcast once (ray.put) and survivors fall out of one
# streaming is_in scan — no shuffle at all.
_BCAST_LOSERS_MAX = int(os.environ.get("OCR_RAY_SURVIVOR_BCAST_MAX", "2000000"))


def survivors_dataset(
    ids: Dataset, losers: Dataset, id_col: str = "doc_id",
    id_type: pa.DataType = None,
) -> Dataset:
    """ids minus losers, distributed. ``ids`` must be unique per row (every
    caller passes one row per doc/vector).

    Small loser sets (<= ``_BCAST_LOSERS_MAX``) broadcast and anti-filter in
    one streaming pass; larger ones take the shuffle plan: union with a tag
    column + groupby + ``Max(tag)`` keeps ids that never appear as a loser
    — one shuffle of tiny (id, tag) rows, no driver sets."""
    if id_type is None:
        id_type = pa.int64()
    lm = losers.materialize()
    if lm.count() <= _BCAST_LOSERS_MAX:
        import ray as _ray

        chunks = [
            t.column("loser").combine_chunks()
            for t in (_ray.get(r) for r in lm.to_arrow_refs())
            if t.num_rows
        ]
        if not chunks:
            return ids.map_batches(
                lambda t, c=id_col: pa.table({c: t.column(c)}),
                batch_format="pyarrow",
            )
        vs_ref = _ray.put(pc.unique(pa.chunked_array(chunks)))

        def keep(t: pa.Table, _r=vs_ref, c=id_col) -> pa.Table:
            vs = _ray.get(_r)
            kept = t.filter(pc.invert(pc.is_in(t.column(c), value_set=vs)))
            return pa.table({c: kept.column(c)})

        return ids.map_batches(keep, batch_format="pyarrow")
    tagged = ids.map_batches(
        lambda t, c=id_col: pa.table(
            {"id": t.column(c), "tag": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow",
    ).union(
        lm.map_batches(
            lambda t: pa.table(
                {"id": t.column("loser"), "tag": pa.array([1] * t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    kept = _coerce_schema(
        tagged.groupby("id").aggregate(Max("tag", alias_name="t")),
        pa.schema([("id", id_type), ("t", pa.int64())]),
    ).filter(expr="t == 0")
    return kept.map_batches(
        lambda t, c=id_col: pa.table({c: t.column("id")}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# size-gated local fast path (small corpora)
# ---------------------------------------------------------------------------

# Row gate for solving a whole near-dup query on ONE worker: below this the
# signature table (bounded: gate x ~1 KB) is pulled once and banding /
# pairing / verify / union-find run as plain numpy + pyarrow — replacing the
# ~8 Dataset exchanges (pair shuffle, two verify joins, label and survivor
# groupbys) whose fixed scheduling cost dominates tiny inputs. Above the
# gate the fully distributed plan runs; both paths share the banding and
# pairing KERNELS and produce identical survivors (equality pytest-gated,
# see tests/test_ops_dedup.py::test_local_gate_parity).
# Hot-row gate for LOCAL candidate pairing: when the band-hash census ran
# (below its own gate), it bounds the collision-bucket row volume exactly;
# at or under this many hot rows the pairing is one driver-side vectorized
# _partition_pairs call instead of a groupby(__part).map_groups exchange.
# Pin the banded table in the object store below this many SIGNATURE rows
# (band fanout is 8-16x tiny rows): candidate_pairs' census tier reads it
# twice, and re-deriving the bands costs a second crc32 pass per doc.
_BAND_PIN_MAX_ROWS = int(os.environ.get("OCR_RAY_BAND_PIN_MAX_ROWS", "3000000"))

_LOCAL_PAIR_MAX_ROWS = int(os.environ.get("OCR_RAY_PAIR_LOCAL_MAX_ROWS", "2000000"))

_LOCAL_NEARDUP_MAX_ROWS = int(os.environ.get("OCR_RAY_NEARDUP_LOCAL_MAX_ROWS", "10000"))


def _collect_table(ds: Dataset) -> pa.Table | None:
    """Small Dataset -> one arrow table (caller enforces the size gate, so
    this is bounded by the gate, never corpus-sized). None when empty."""
    import ray as _ray

    tbls = [t for t in (_ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return None
    return pa.concat_tables(tbls).combine_chunks()


def _local_losers(verified: pa.Table) -> set:
    """Union-find (path-halving, union by min id) over a small verified-pair
    table -> the ids removed (everything but each component's minimum)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for x, y in zip(verified.column("a").to_pylist(), verified.column("b").to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    return {n for n in parent if find(n) != n}


def _pair_rows(pairs: pa.Table, sig_tbl: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Pair endpoints -> row indices into the signature table."""
    idx = {i: n for n, i in enumerate(sig_tbl.column(id_col).to_pylist())}
    ia = np.fromiter(
        (idx[x] for x in pairs.column("a").to_pylist()), dtype=np.int64, count=pairs.num_rows
    )
    ib = np.fromiter(
        (idx[x] for x in pairs.column("b").to_pylist()), dtype=np.int64, count=pairs.num_rows
    )
    return ia, ib


def _local_near_dup(
    sig_tbl: pa.Table,
    *,
    band_fn,
    verify_fn,
    max_bucket: int | None,
    id_col: str = "doc_id",
    empty_mask: pa.Array | None = None,
) -> pa.Table:
    """One-worker near-dup solve over a gate-bounded signature table.

    The banding and pairing kernels are LITERALLY the distributed ones
    (``band_fn`` is the same map_batches UDF; ``_partition_pairs`` treats the
    whole table as one coarse partition), so the two paths cannot drift.
    ``empty_mask`` marks empty-signature rows, which are mutual dups by
    convention (all but the min id lose) — mirrors ``_empty_losers``."""
    banded = band_fn(sig_tbl)
    pairs = _partition_pairs(banded, max_bucket)
    if pairs.num_rows:
        pairs = pairs.group_by(["a", "b"]).aggregate([]).select(["a", "b"])
        pairs = verify_fn(pairs, sig_tbl)
    losers = _local_losers(pairs)
    ids = sig_tbl.column(id_col).to_pylist()
    if empty_mask is not None:
        empties = sorted(i for i, m in zip(ids, empty_mask.to_pylist()) if m)
        losers |= set(empties[1:])
    keep = [i for i in ids if i not in losers]
    return pa.table({id_col: pa.array(keep, sig_tbl.schema.field(id_col).type)})


def _sig_matrix(sig_tbl: pa.Table) -> np.ndarray:
    """(n, n_perm) uint64 matrix from the list<uint64> ``sig`` column via
    the Arrow values buffer (``flatten`` respects list offsets); width is
    inferred, so 64- and 128-perm signatures both work."""
    col = sig_tbl.column("sig").combine_chunks()
    return np.asarray(col.flatten()).reshape(len(col), -1)


def near_dup_survivors(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_bp: int = 7000,
    max_bucket: int = _MAX_BUCKET,
    n_perms: int = _N_PERM,
    shingle_hasher: str = "crc32",
) -> Dataset:
    """MinHash+LSH near-dup pipeline, end-to-end distributed: signatures ->
    banded buckets -> capped collision pairs -> join-verified agreement ->
    min-label components -> survivor ids (min id per component).

    Size-gated: corpora at or under ``_LOCAL_NEARDUP_MAX_ROWS`` are solved
    on one worker from the collected signature table (identical output)."""
    sigs = minhash_signatures(
        ds, text_col=text_col, id_col=id_col, n_perms=n_perms,
        shingle_hasher=shingle_hasher,
    ).materialize()
    return near_dup_from_signatures(
        sigs, threshold_bp=threshold_bp, max_bucket=max_bucket
    )


def near_dup_from_signatures(
    sigs: Dataset, *, threshold_bp: int = 7000, max_bucket: int = _MAX_BUCKET
) -> Dataset:
    """Shared survivors tail over ANY MinHash-family signature table
    ``(doc_id, sig list<uint64>)`` whose per-element collision probability
    estimates the target similarity (unweighted MinHash estimates set
    Jaccard; ICWS — ``ops.wjaccard`` — estimates weighted Jaccard).
    Banding -> capped collision pairs -> join-verified agreement ->
    min-label components -> survivor ids, with the same local tier below
    the size gate."""
    id_type = sigs.schema().base_schema.field("doc_id").type
    if sigs.count() <= _LOCAL_NEARDUP_MAX_ROWS:
        tbl = _collect_table(sigs)
        if tbl is None:
            return rd.from_arrow(pa.schema([("doc_id", id_type)]).empty_table())

        def vfy(pairs: pa.Table, t: pa.Table) -> pa.Table:
            mat = _sig_matrix(t)
            ia, ib = _pair_rows(pairs, t, "doc_id")
            agree = (mat[ia] == mat[ib]).sum(axis=1)
            return pairs.filter(pa.array(agree * 10_000 >= mat.shape[1] * threshold_bp))

        return rd.from_arrow(
            _local_near_dup(
                tbl, band_fn=_band_rows, verify_fn=vfy, max_bucket=max_bucket,
                empty_mask=_is_empty_sig(tbl.column("sig")),
            )
        )
    banded = sigs.map_batches(_band_rows, batch_format="pyarrow")
    if sigs.count() <= _BAND_PIN_MAX_ROWS:
        # candidate_pairs' census tier consumes the band table twice
        # (census pass + hot-row filter); pinning the 16-byte band rows
        # (bounded: rows x bands x 16 B) skips the second banding pass
        banded = banded.materialize()
    pairs = candidate_pairs(banded, id_type=id_type, max_bucket=max_bucket).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        verified = pairs  # no candidates: skip the (empty-input) verify joins
    else:
        verified = verified_pairs_minhash(
            pairs, sigs, threshold_bp=threshold_bp, id_type=id_type,
            parts=_dyn_parts(n_pairs), n_pairs=n_pairs,
        )
    labels = propagate_min_labels(verified, id_type=id_type)
    losers = _losers_from_labels(labels).union(_empty_losers(sigs, id_type=id_type))
    return survivors_dataset(
        sigs.select_columns(["doc_id"]), losers, id_col="doc_id", id_type=id_type
    )


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
        # NULL text is ONE group in SQL GROUP BY; the 4-char token cannot
        # collide with a 64-hex digest
        hs = [
            "NULL" if t is None else hashlib.sha256(t.encode("utf-8")).hexdigest()
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


def dedup_minhash_docs(sf_dir: str) -> Dataset:
    """MinHash+LSH near-dup survivors (doc_ids kept), fully distributed."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return near_dup_survivors(ds)


def dedup_jaccard_docs(sf_dir: str, threshold: float = 0.7) -> Dataset:
    """Near-dup survivors with EXACT word-3-gram Jaccard verification.

    Same LSH candidate generation as MinHash, but candidates are verified
    against the true shingle-set Jaccard instead of signature agreement —
    zero false positives at the cost of joining candidate texts back in
    (two hash joins; only candidate rows carry text, never the corpus)."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    sigs = minhash_signatures(ds).materialize()
    if sigs.count() <= _LOCAL_NEARDUP_MAX_ROWS:
        tbl = _collect_table(sigs)
        if tbl is None:
            return rd.from_arrow(pa.schema([("doc_id", pa.int64())]).empty_table())
        txt = _collect_table(ds)
        tmap = dict(zip(txt.column("doc_id").to_pylist(), txt.column("text").to_pylist()))

        def vfy(pairs: pa.Table, t: pa.Table) -> pa.Table:
            keep = [
                ngram_jaccard(tmap[x] or "", tmap[y] or "") >= threshold
                for x, y in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist())
            ]
            return pairs.filter(pa.array(keep))

        return rd.from_arrow(
            _local_near_dup(
                tbl, band_fn=_band_rows, verify_fn=vfy, max_bucket=_MAX_BUCKET,
                empty_mask=_is_empty_sig(tbl.column("sig")),
            )
        )
    banded = sigs.map_batches(_band_rows, batch_format="pyarrow")
    if sigs.count() <= _BAND_PIN_MAX_ROWS:
        banded = banded.materialize()  # see near_dup_from_signatures
    pairs = candidate_pairs(banded).materialize()
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    n_pairs = pairs.count()
    if n_pairs == 0:
        verified = pairs
    else:
        parts = _dyn_parts(n_pairs)
        texts_kv = _endpoint_filter(
            ds.map_batches(
                lambda t: pa.table({"doc_id": t.column("doc_id"), "sig": t.column("text")}),
                batch_format="pyarrow",
            ),
            pairs,
            n_pairs,
        )
        j, s1 = _paired_with(
            pairs, texts_kv, "a", "sig", "text_a",
            left_schema=pair_schema, payload_type=pa.string(), parts=parts,
        )
        j, _ = _paired_with(
            j, texts_kv, "b", "sig", "text_b", left_schema=s1,
            payload_type=pa.string(), parts=parts,
        )

        def check(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.select(["a", "b"])
            keep = [
                ngram_jaccard(x or "", y or "") >= threshold
                for x, y in zip(t.column("text_a").to_pylist(), t.column("text_b").to_pylist())
            ]
            return t.select(["a", "b"]).filter(pa.array(keep))

        verified = j.map_batches(check, batch_format="pyarrow")
    labels = propagate_min_labels(verified)
    losers = _losers_from_labels(labels).union(_empty_losers(sigs))
    return survivors_dataset(sigs.select_columns(["doc_id"]), losers)


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


def _simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    sigs = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
        }
    )


def dedup_simhash_docs(sf_dir: str, max_hamming: int = 3) -> Dataset:
    """SimHash near-dup survivors. 4x16-bit bands: any pair within hamming
    distance 3 shares at least one intact band (pigeonhole). Same distributed
    pair/verify/component plan as MinHash; hamming verify is vectorized."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    sigs = ds.map_batches(
        _simhash_batch, batch_format="pyarrow", batch_size=256
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        out_id, out_val = [], []
        for i, did in enumerate(ids):
            v = int(sh[i])
            for b in range(4):
                out_id.append(did)
                out_val.append((b << 32) | ((v >> (16 * b)) & 0xFFFF))
        return pa.table(
            {
                "band_hash": pa.array(out_val, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )

    def _ham_keep(pairs: pa.Table, t: pa.Table) -> pa.Table:
        sh_all = (
            t.column("simhash").combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        ia, ib = _pair_rows(pairs, t, "doc_id")
        ham = np.array([bin(int(x)).count("1") for x in (sh_all[ia] ^ sh_all[ib])])
        return pairs.filter(pa.array(ham <= max_hamming))

    if sigs.count() <= _LOCAL_NEARDUP_MAX_ROWS:
        tbl = _collect_table(sigs)
        if tbl is None:
            return rd.from_arrow(pa.schema([("doc_id", pa.int64())]).empty_table())
        return rd.from_arrow(
            _local_near_dup(tbl, band_fn=band_rows, verify_fn=_ham_keep, max_bucket=_MAX_BUCKET)
        )
    banded = sigs.map_batches(band_rows, batch_format="pyarrow")
    pairs = candidate_pairs(banded).materialize()
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    n_pairs = pairs.count()
    if n_pairs == 0:
        verified = pairs
    else:
        parts = _dyn_parts(n_pairs)
        sh_kv = _endpoint_filter(
            sigs.map_batches(
                lambda t: pa.table({"doc_id": t.column("doc_id"), "sig": t.column("simhash")}),
                batch_format="pyarrow",
            ),
            pairs,
            n_pairs,
        )
        j, s1 = _paired_with(
            pairs, sh_kv, "a", "sig", "h_a", left_schema=pair_schema,
            payload_type=pa.int64(), parts=parts,
        )
        j, _ = _paired_with(
            j, sh_kv, "b", "sig", "h_b", left_schema=s1, payload_type=pa.int64(),
            parts=parts,
        )

        def check(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.select(["a", "b"])
            ha = t.column("h_a").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            hb = t.column("h_b").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            ham = np.array([bin(int(x)).count("1") for x in (ha ^ hb)])
            return t.select(["a", "b"]).filter(pa.array(ham <= max_hamming))

        verified = j.map_batches(check, batch_format="pyarrow")
    labels = propagate_min_labels(verified)
    losers = _losers_from_labels(labels)
    return survivors_dataset(sigs.select_columns(["doc_id"]), losers)


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH hyperplanes + exact verify)
# ---------------------------------------------------------------------------


def embedding_near_dups(sf_dir: str, threshold: float = 0.95, n_planes: int = 12) -> Dataset:
    """Survivors after removing embedding near-duplicates (cosine >= 0.95).

    Random-hyperplane signatures bucket the vectors; exact cosine verifies
    candidates within a bucket (vectors joined onto pair rows — O(candidates)
    traffic, not O(corpus)). Plane matrix is seeded + broadcast."""
    import os

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(
        # NULL vectors have no geometry; NULL ids identify nothing
        lambda t: t.filter(
            pc.and_(pc.is_valid(t.column("embedding")), pc.is_valid(t.column("vec_id")))
        ),
        batch_format="pyarrow",
    )
    first = ds.take(1)
    dim = len(first[0]["embedding"])
    # plane matrix is dim x n_planes floats — small enough to ship in the
    # task closure (a model-sized state would be ray.put + actor pool)
    planes = np.random.RandomState(99).randn(dim, n_planes)

    def bucket(batch: pa.Table) -> pa.Table:
        from ocr_ray.ops.ann import _emb_matrix

        emb = _emb_matrix(batch.column("embedding"))
        bits = (emb @ planes) > 0
        keys = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {"band_hash": pa.array(keys), "doc_id": batch.column("vec_id")}
        )

    vecs = ds.materialize()
    if vecs.count() <= _LOCAL_NEARDUP_MAX_ROWS:
        tbl = _collect_table(vecs)
        if tbl is None:
            return rd.from_arrow(pa.schema([("vec_id", pa.int64())]).empty_table())

        def vfy(pairs: pa.Table, t: pa.Table) -> pa.Table:
            from ocr_ray.ops.ann import _emb_matrix

            emb = _emb_matrix(t.column("embedding").combine_chunks())
            ia, ib = _pair_rows(pairs, t, "vec_id")
            va, vb = emb[ia], emb[ib]
            sims = (va * vb).sum(axis=1) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            return pairs.filter(pa.array(sims >= threshold))

        return rd.from_arrow(
            _local_near_dup(tbl, band_fn=bucket, verify_fn=vfy, max_bucket=_MAX_BUCKET, id_col="vec_id")
        )
    banded = vecs.map_batches(bucket, batch_format="pyarrow", batch_size=1024)
    pairs = candidate_pairs(banded).materialize()
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    n_pairs = pairs.count()
    if n_pairs == 0:
        verified = pairs
    else:
        parts = _dyn_parts(n_pairs)
        emb_kv = _endpoint_filter(
            ds.map_batches(
                lambda t: pa.table(
                    {"doc_id": t.column("vec_id"), "sig": _pack_lists(t.column("embedding"), np.float64)}
                ),
                batch_format="pyarrow",
            ),
            pairs,
            n_pairs,
        )
        j, s1 = _paired_with(
            pairs, emb_kv, "a", "sig", "v_a", left_schema=pair_schema,
            payload_type=pa.binary(), parts=parts,
        )
        j, _ = _paired_with(
            j, emb_kv, "b", "sig", "v_b", left_schema=s1, payload_type=pa.binary(),
            parts=parts,
        )

        def check(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.select(["a", "b"])
            va = _unpack_lists(t.column("v_a"), np.float64)
            vb = _unpack_lists(t.column("v_b"), np.float64)
            sims = (va * vb).sum(axis=1) / (
                np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            )
            return t.select(["a", "b"]).filter(pa.array(sims >= threshold))

        verified = j.map_batches(check, batch_format="pyarrow")
    labels = propagate_min_labels(verified)
    losers = _losers_from_labels(labels)
    ids = ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("vec_id")}), batch_format="pyarrow"
    )
    surv = survivors_dataset(ids, losers)
    return surv.map_batches(
        lambda t: pa.table({"vec_id": t.column("doc_id")}), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# incremental dedup — a DELTA batch against already-committed corpus state
# ---------------------------------------------------------------------------


def dedup_incremental_docs(sf_dir: str) -> Dataset:
    """queries() entry — see ``dedup_incremental_over``."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return dedup_incremental_over(docs)


def dedup_incremental_over(docs: Dataset) -> Dataset:
    """Incremental exact dedup: new (delta) documents deduped against an
    already-ingested corpus — the O(delta) maintenance shape a checkpointed
    10^12-row pipeline runs per ingest segment, instead of re-deduping the
    world. Here the committed state is modeled as the even-id half of
    ``documents`` and the delta as the odd-id half (parity via ``id & 1``,
    two's-complement-identical in Arrow and DuckDB for negative ids).

    Plan: the corpus side reduces to DISTINCT text digests (32-byte keys,
    text never leaves its block); the delta side picks MIN(doc_id) per
    digest (first-writer-wins inside the batch) in one digest-keyed
    groupby; survivors = delta winners anti-joined against corpus digests
    (size-gated: broadcast ``is_in`` under the byte budget, keys-only
    left_anti hash join above it). NULL-text rows never survive (SQL
    NOT-IN three-valued semantics, mirrored by an early filter)."""
    from ray.data.aggregate import Min

    from ocr_ray.functions.joins import anti_join_ds, anti_join_filter

    def halves(t: pa.Table, want_odd: bool) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("text")))
        )
        parity = pc.bit_wise_and(t.column("doc_id"), pa.scalar(1, pa.int64()))
        t = t.filter(pc.equal(parity, pa.scalar(1 if want_odd else 0, pa.int64())))
        hs = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t.column("text").to_pylist()
        ]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": t.column("doc_id")})

    corpus_h = (
        docs.map_batches(lambda t: halves(t, False).group_by("h").aggregate([]), batch_format="pyarrow")
    )
    delta = (
        docs.map_batches(lambda t: halves(t, True), batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )

    # size gate: corpus digests fit the broadcast budget at test scale; the
    # keys-only left_anti hash join is the above-gate path (10^12-row state)
    pinned = corpus_h.materialize()
    if pinned.size_bytes() <= 64 * 1024 * 1024:
        keys = [r["h"] for r in pinned.take_all()]
        surv = anti_join_filter(delta, "h", keys)
    else:
        surv = anti_join_ds(delta, pinned, on="h")
    return surv.select_columns(["doc_id"])


DEDUP_INCREMENTAL_SQL = """
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h
  FROM documents
  WHERE (doc_id & 1) = 0 AND text IS NOT NULL
), delta AS (
  SELECT md5(text) AS h, MIN(doc_id) AS doc_id
  FROM documents
  WHERE (doc_id & 1) = 1 AND text IS NOT NULL
  GROUP BY 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id
FROM delta
WHERE h NOT IN (SELECT h FROM corpus)
"""


_PREFIX_DEDUP_CHARS = 100


def doc_prefix_dedup(sf_dir: str) -> Dataset:
    """Prefix-dedup census: documents sharing their first
    ``_PREFIX_DEDUP_CHARS`` characters form one group — the
    truncation-duplicate heuristic for crawl corpora (the same page fetched
    with different tail boilerplate, or cut off mid-download, dedups on its
    head when exact dedup misses it). One row per distinct prefix: its md5,
    the surviving doc_id (min), the group size (``n_docs > 1`` = the dup
    signal).

    Shuffle carries (16-byte digest, doc_id) pairs, never text; the slice
    is by CODE POINTS (``utf8_slice_codeunits``) matching SQL substr
    semantics, and both engines md5 the same UTF-8 bytes of the prefix.

    Contract (mirrored): NULL text rows are excluded."""
    import os

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def h(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("text")))
        pre = pc.utf8_slice_codeunits(batch.column("text"), 0, _PREFIX_DEDUP_CHARS)
        hs = [hashlib.md5(p.encode("utf-8")).hexdigest() for p in pre.to_pylist()]
        return pa.table(
            {"digest": pa.array(hs, pa.string()), "doc_id": batch.column("doc_id")}
        )

    return (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("digest")
        .aggregate(Min("doc_id", alias_name="keep_doc"), Count(alias_name="n_docs"))
    )


DOC_PREFIX_DEDUP_SQL = f"""
SELECT md5(substr(text, 1, {_PREFIX_DEDUP_CHARS})) AS digest,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE text IS NOT NULL
GROUP BY substr(text, 1, {_PREFIX_DEDUP_CHARS})
"""


# ---------------------------------------------------------------------------
# case-fold dedup census (normalization-sensitive duplicate detection)
# ---------------------------------------------------------------------------


def doc_casefold_collisions(sf_dir: str) -> "pa.Table":
    """How much of the corpus deduplicates ONLY after case folding: groups
    of documents whose lower-cased text collides while the raw bytes
    differ — the report that sizes a normalization pass before exact
    dedup (``dedup_exact_docs`` is byte-exact; this measures what a
    case-insensitive key would additionally merge).

    Plan: per-batch (md5(lower(text)), md5(text)) digest pairs — text
    never shuffles — one pair-keyed dedup groupby, then run-length raw-
    variant counts per folded key fold into three driver ints (the
    ``orders_fd_audit`` reduction over digest keys).

    Contract (mirrored in SQL): NULL doc_id rows are excluded; NULL text
    folds as '' (a real group)."""
    import hashlib as _h

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        texts = pc.coalesce(t.column("text"), pa.scalar("")).to_pylist()
        fk = [_h.md5(s.lower().encode()).hexdigest()[:16] for s in texts]
        rk = [_h.md5(s.encode()).hexdigest()[:16] for s in texts]
        return (
            pa.table({"fk": pa.array(fk, pa.string()), "rk": pa.array(rk, pa.string())})
            .group_by(["fk", "rk"])
            .aggregate([])
        )

    distinct = ds.map_batches(pairs, batch_format="pyarrow").groupby(["fk", "rk"]).count()

    def variant_partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("fk").to_pylist(), dtype=object)
        if len(k) == 0:
            return pa.table({"fk": pa.array([], pa.string()), "nv": pa.array([], pa.int64())})
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(k)])))
        return pa.table(
            {
                "fk": pa.array(k[starts].tolist(), pa.string()),
                "nv": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_key = (
        distinct.map_batches(variant_partial, batch_format="pyarrow")
        .groupby("fk")
        .aggregate(Sum("nv", alias_name="nv"))
    )
    n_groups = n_collided = max_var = 0
    for b in per_key.iter_batches(batch_size=None, batch_format="pyarrow"):
        nv = b.column("nv").to_numpy(zero_copy_only=False)
        n_groups += len(nv)
        n_collided += int((nv > 1).sum())
        if len(nv):
            max_var = max(max_var, int(nv.max()))
    return pa.table(
        {
            "n_folded_groups": pa.array([n_groups], pa.int64()),
            "n_collided_groups": pa.array([n_collided], pa.int64()),
            "max_case_variants": pa.array([max_var], pa.int64()),
        }
    )


DOC_CASEFOLD_COLLISIONS_SQL = """
WITH d AS (
  SELECT md5(lower(coalesce(text, ''))) AS fk, md5(coalesce(text, '')) AS rk
  FROM documents WHERE doc_id IS NOT NULL
),
g AS (SELECT fk, COUNT(DISTINCT rk) AS nv FROM d GROUP BY fk)
SELECT CAST(COUNT(*) AS BIGINT) AS n_folded_groups,
       CAST(COUNT(*) FILTER (WHERE nv > 1) AS BIGINT) AS n_collided_groups,
       CAST(COALESCE(MAX(nv), 0) AS BIGINT) AS max_case_variants
FROM g
"""
