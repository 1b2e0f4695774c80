"""Fuzzy string matching: edit-distance-1 self-join via deletion
neighborhoods (the FastSS / SymSpell blocking scheme).

The engine-level capability the reference's dedup-by-content lacks: finding
NEAR-identical short strings (titles, names, product labels) where "near"
is edit distance, not token overlap. Exact-recall guarantee for ED <= 1:
two strings s, t with levenshtein(s, t) <= 1 always share a key in
{s} ∪ del1(s) — a substitution collides after deleting the differing
position from both, an insertion/deletion collides because the shorter
string IS a del1 variant of the longer — so candidate generation by key
equality misses nothing, and exact verification trims hash collisions and
ED-2 coincidences.

Scale shape: the shuffle carries (sig_hash, id, name) rows — L+1 keys per
string of length L, each 8 bytes + the short name payload; candidate pairs
are generated inside co-located signature groups (coarse-key grouped scan,
one Python call per partition, offset-diagonal vectorized pair expansion)
and verified by a vectorized byte-matrix ED <= 1 kernel, never a per-pair
Python DP. Oversized signature groups (a corpus-common identical string)
are capped at ``_SIG_GROUP_CAP`` ids with a logged drop — pairs among
capped members of IDENTICAL strings are already dist-0 duplicates of the
survivors' pairs, so for distinct-name corpora the cap is unreachable.
"""

from __future__ import annotations

import logging
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

__all__ = [
    "ensure_names",
    "fuzzy_name_pairs",
    "fuzzy_name_pairs_over",
    "fuzzy_name_pairs_sql",
    "ed_le1_dist",
]

logger = logging.getLogger(__name__)

_MAX_NAME_LEN = 64  # deletion-neighborhood fan-out bound; longer -> logged drop
_SIG_GROUP_CAP = 256


# ---------------------------------------------------------------------------
# deterministic fixture (short names with planted ED-1 typos and exact twins)
# ---------------------------------------------------------------------------

_ADJ = ["red", "blue", "green", "small", "large", "hot", "cold", "dark", "pale", "worn"]
_NOUN = ["widget", "gizmo", "bolt", "gear", "ring", "valve", "lever", "crate", "spool", "plate"]


def ensure_names(n: int, seed: int = 17, root: str = "/tmp/ocr_ray_fixtures") -> str:
    """Seeded name table parquet (id, name): ``adj-noun-NNNN`` base rows,
    an ED-1 typo twin for every 13th row (one substituted char), an exact
    twin for every 31st. Near numbers ("...-0041" vs "...-0042") also
    produce natural ED-1 pairs. The oracle reads the identical file."""
    import pyarrow.parquet as pq

    path = os.path.join(root, f"names_n{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(seed)
    adj = rs.randint(0, len(_ADJ), size=n)
    noun = rs.randint(0, len(_NOUN), size=n)
    num = rs.randint(0, max(n // 6, 10), size=n)
    ids, names = list(range(n)), [
        f"{_ADJ[a]}-{_NOUN[b]}-{c:04d}" for a, b, c in zip(adj, noun, num)
    ]
    for i in range(0, n, 13):
        s = names[i]
        pos = i % len(s)
        repl = "q" if s[pos] != "q" else "z"
        ids.append(n + i)
        names.append(s[:pos] + repl + s[pos + 1 :])
    for i in range(0, n, 31):
        ids.append(2 * n + i)
        names.append(names[i])
    t = pa.table({"id": pa.array(ids, pa.int64()), "name": pa.array(names, pa.string())})
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)
    return path


def _n_names_for_sf(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        return 2_500
    return {0.001: 800, 0.01: 2_500, 0.1: 5_000}.get(sf, 2_500)


# ---------------------------------------------------------------------------
# vectorized ED <= 1 verification kernel
# ---------------------------------------------------------------------------


def ed_le1_dist(a_names: np.ndarray, b_names: np.ndarray) -> np.ndarray:
    """Exact edit distance for pairs with ED <= 1, else -1 — vectorized over
    byte matrices, no per-pair DP.

    Equal length: dist = count of mismatching positions if <= 1.
    Length differs by 1: ED == 1 iff deleting ONE char of the longer yields
    the shorter — i.e. there is a split k with prefix-equal before k
    (aligned) and suffix-equal after k (shifted by one); computed with a
    prefix-cumprod and a suffix-cumprod, any-k reduction. |len diff| >= 2
    is always -1.
    """
    n = len(a_names)
    if n == 0:
        return np.empty(0, np.int64)
    enc_a = [s.encode() for s in a_names]
    enc_b = [s.encode() for s in b_names]
    la = np.fromiter((len(s) for s in enc_a), np.int64, n)
    lb = np.fromiter((len(s) for s in enc_b), np.int64, n)
    m = int(max(la.max(), lb.max()))
    A = np.zeros((n, m + 1), np.uint8)
    B = np.zeros((n, m + 1), np.uint8)
    for i, s in enumerate(enc_a):
        A[i, : la[i]] = np.frombuffer(s, np.uint8)
    for i, s in enumerate(enc_b):
        B[i, : lb[i]] = np.frombuffer(s, np.uint8)
    out = np.full(n, -1, np.int64)

    eq = la == lb
    if eq.any():
        mism = ((A[eq] != B[eq]) & (np.arange(m + 1)[None, :] < la[eq, None])).sum(axis=1)
        sub = np.where(mism <= 1, mism, -1)
        out[eq] = sub

    d1 = np.abs(la - lb) == 1
    if d1.any():
        idx = np.nonzero(d1)[0]
        # orient: L = longer, S = shorter
        swap = lb[idx] > la[idx]
        L = np.where(swap[:, None], B[idx], A[idx])
        S = np.where(swap[:, None], A[idx], B[idx])
        ls = np.minimum(la[idx], lb[idx])  # shorter length
        cols = np.arange(m + 1)[None, :]
        pad = cols >= ls[:, None]
        # aligned equality (prefix candidate) and shifted equality (suffix)
        e1 = (L[:, : m + 1] == S) | pad
        e2 = np.empty_like(e1)
        e2[:, :m] = (L[:, 1 : m + 1] == S[:, :m]) | pad[:, :m]
        e2[:, m] = True
        pref = np.cumprod(e1, axis=1, dtype=bool)  # pref[:, k] = all e1[:, :k+1]
        suf = np.flip(np.cumprod(np.flip(e2, axis=1), axis=1, dtype=bool), axis=1)
        # split at k: prefix strictly before k, suffix from k on
        ok = suf[:, 0].copy()  # k = 0: no prefix constraint
        if m >= 1:
            ok |= (pref[:, :-1] & suf[:, 1:]).any(axis=1)
        out[idx[ok]] = 1
    return out


# ---------------------------------------------------------------------------
# the join
# ---------------------------------------------------------------------------


def fuzzy_name_pairs_over(names: Dataset) -> Dataset:
    """All id pairs (id_a < id_b) with levenshtein(name_a, name_b) <= 1 over
    a (id, name) Dataset. NULL id/name rows are excluded (mirrored in SQL:
    levenshtein(NULL) is NULL, which never passes the <= 1 predicate)."""
    from ocr_ray.pipelines.conversation import grouped_scan_fs
    from ray.data.aggregate import Min

    def signatures(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("id")), pc.is_valid(t.column("name"))))
        ids = t.column("id").to_pylist()
        nms = t.column("name").to_pylist()
        sig_l, id_l, nm_l = [], [], []
        dropped = 0
        for i, s in zip(ids, nms):
            b = s.encode()
            if len(b) > _MAX_NAME_LEN:
                dropped += 1
                continue
            sig_l.append(zlib.crc32(b))
            id_l.append(i)
            nm_l.append(s)
            for d in range(len(b)):
                sig_l.append(zlib.crc32(b[:d] + b[d + 1 :]))
                id_l.append(i)
                nm_l.append(s)
        if dropped:
            logger.warning("fuzzy: dropped %d names longer than %d bytes", dropped, _MAX_NAME_LEN)
        return pa.table(
            {
                "sig": pa.array(sig_l, pa.int64()),
                "id": pa.array(id_l, pa.int64()),
                "name": pa.array(nm_l, pa.string()),
            }
        )

    def candidate_pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df = df.drop_duplicates(["sig", "id"]).sort_values(["sig", "id"])
        sig = df["sig"].to_numpy(np.int64)
        ids = df["id"].to_numpy(np.int64)
        assert ids.size == 0 or (ids.max() < 2**31 and ids.min() >= 0), "ids must fit 31 bits"
        names_arr = df["name"].to_numpy()
        # cap oversized signature groups (identical corpus-common strings)
        _, starts, counts = np.unique(sig, return_index=True, return_counts=True)
        if (counts > _SIG_GROUP_CAP).any():
            big = int((counts > _SIG_GROUP_CAP).sum())
            logger.warning("fuzzy: %d signature groups over cap %d, truncated", big, _SIG_GROUP_CAP)
            keep = np.ones(len(sig), bool)
            for s0, c in zip(starts[counts > _SIG_GROUP_CAP], counts[counts > _SIG_GROUP_CAP]):
                keep[s0 + _SIG_GROUP_CAP : s0 + c] = False
            sig, ids, names_arr = sig[keep], ids[keep], names_arr[keep]
        a_i, b_i = [], []
        d = 1
        while d < len(sig):
            msk = sig[:-d] == sig[d:]
            if not msk.any():
                break
            a_i.append(np.nonzero(msk)[0])
            b_i.append(np.nonzero(msk)[0] + d)
            d += 1
        if not a_i:
            return pa.table(
                {"pair": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
            )
        ai = np.concatenate(a_i)
        bi = np.concatenate(b_i)
        pair = (ids[ai] << np.int64(32)) | ids[bi]  # ids sorted within sig: a < b
        uniq, first = np.unique(pair, return_index=True)
        # verify IN-PARTITION (names are co-located here): the global dedupe
        # exchange then carries 16-byte (pair, dist) ints, never strings; the
        # duplicated verification across a pair's <= L+1 sig copies is bounded
        # vector work, cheaper than shipping names through a Min aggregate
        dist = ed_le1_dist(names_arr[ai[first]], names_arr[bi[first]])
        keep = dist >= 0
        return pa.table(
            {"pair": pa.array(uniq[keep]), "dist": pa.array(dist[keep])}
        )

    sigs = names.map_batches(signatures, batch_format="pyarrow")
    # filesystem exchange, not Ray's sort shuffle: a hot identical string
    # collapses the signature key space to ~L distinct values, exactly the
    # low-cardinality regime where Ray's sort-based groupby degenerates
    # (measured 172 s for 3 K rows / 10 distinct sigs; the fragment
    # exchange does the same co-location in ~2 s)
    cands = grouped_scan_fs(sigs, "sig", candidate_pairs)
    # cross-partition dedupe (identical strings share every signature; each
    # copy verified to the same dist, Min is just the dedupe vehicle)
    dedup = cands.groupby("pair").aggregate(Min("dist", alias_name="dist"))

    def unpack(t: pa.Table) -> pa.Table:
        pair = t.column("pair").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array((pair >> 32).astype(np.int64)),
                "id_b": pa.array((pair & 0xFFFFFFFF).astype(np.int64)),
                "dist": pc.cast(t.column("dist"), pa.int64()),
            }
        )

    return dedup.map_batches(unpack, batch_format="pyarrow")


def fuzzy_name_pairs(sf_dir: str) -> Dataset:
    """queries() entry: ED <= 1 self-join over the sf-scaled name fixture."""
    path = ensure_names(_n_names_for_sf(sf_dir))
    return fuzzy_name_pairs_over(rd.read_parquet(path))


def fuzzy_name_pairs_sql(sf_dir: str) -> str:
    """DuckDB mirror: length-banded cross join + exact levenshtein (the
    band is recall-safe: |len(a)-len(b)| <= ED)."""
    path = ensure_names(_n_names_for_sf(sf_dir))
    return f"""
WITH t AS (SELECT id, name FROM read_parquet('{path}'))
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM t a JOIN t b
  ON a.id < b.id
 AND length(a.name) - length(b.name) BETWEEN -1 AND 1
 AND levenshtein(a.name, b.name) <= 1
"""


# ---------------------------------------------------------------------------
# entity resolution end-to-end: fuzzy pairs -> transitive clusters
# ---------------------------------------------------------------------------


def fuzzy_name_clusters(sf_dir: str) -> "Dataset":
    """Entity resolution composed end-to-end: the ED<=1 blocking self-join
    (deletion-neighborhood signatures, guaranteed recall) feeds the
    size-gated min-label component machinery — every matched name gets a
    cluster id (the component's minimum id). Singletons (no ED<=1
    neighbor) are not emitted; the caller left-joins them back as their
    own cluster (mirrored: the SQL closure also starts from pair
    endpoints).

    Both stages are the already-gated primitives (`fuzzy_name_pairs`,
    `connected_components_graph`); this entry gates their COMPOSITION —
    transitive closure over fuzzy matches is where entity resolution
    earns its keep (A~B, B~C clusters A,B,C even when A!~C)."""
    from ocr_ray.ops.dedup import propagate_min_labels

    path = ensure_names(_n_names_for_sf(sf_dir))
    pairs = fuzzy_name_pairs_over(rd.read_parquet(path))
    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t.column("id_a"), pa.int64()),
                "b": pc.cast(t.column("id_b"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = propagate_min_labels(edges)
    return out.map_batches(
        lambda t: pa.table(
            {
                "id": pc.cast(t.column("node"), pa.int64()),
                "cluster": pc.cast(t.column("label"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def fuzzy_name_clusters_sql(sf_dir: str) -> str:
    """Recursive-CTE closure over the banded levenshtein join."""
    path = ensure_names(_n_names_for_sf(sf_dir))
    return f"""
WITH RECURSIVE t AS (SELECT id, name FROM read_parquet('{path}')),
e AS (
  SELECT a.id AS a, b.id AS b
  FROM t a JOIN t b
    ON a.id < b.id
   AND length(a.name) - length(b.name) BETWEEN -1 AND 1
   AND levenshtein(a.name, b.name) <= 1
),
sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM sym
  UNION
  SELECT reach.node, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
)
SELECT CAST(node AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS cluster
FROM reach GROUP BY node
"""
