"""Deterministic VOLUME fixtures for the dedup/ANN ops suite.

The shared testdata ``documents`` table is 500 rows even at sf0.1, so the
near-dup / ANN operators were never perf-exercised at volume (VERDICT r1
"What's missing" #5 / next-step #9). These generators produce cached
synthetic corpora of arbitrary size, pure functions of (seed, index):

* ``ensure_bigdocs(n)`` — documents (doc_id:int64, text:string). Docs come
  in groups of ``GROUP``: offset 0 is an original (~100 word-soup words);
  each other offset is, deterministically per (seed, doc), either a planted
  NEAR-DUP of its group head (exactly one word substituted -> word-3-gram
  Jaccard ~0.94, far above the 0.7 threshold) or an independent doc. The
  exact survivor set under min-id near-dup semantics is therefore known in
  closed form: group heads + independents.
* ``ensure_bigvecs(n, dim)`` — embeddings (vec_id:int64, embedding:
  list<float64>) with 5% planted near-duplicate vectors (tiny perturbation
  of an earlier vector, cosine > 0.999).
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa

GROUP = 10
DUP_PROB = 0.2  # per non-head slot
_VOCAB = [f"tok{i:04d}" for i in range(5000)]


def _doc_of(i: int, seed: int) -> tuple[str, bool]:
    """(text, is_planted_dup) for doc i — pure function of (seed, i)."""
    head = (i // GROUP) * GROUP
    rng_head = random.Random((seed << 32) ^ head)
    base_words = [rng_head.choice(_VOCAB) for _ in range(100)]
    if i == head:
        return " ".join(base_words), False
    rng = random.Random((seed << 32) ^ i)
    if rng.random() < DUP_PROB:
        words = list(base_words)
        words[rng.randrange(len(words))] = rng.choice(_VOCAB)
        return " ".join(words), True
    return " ".join(rng.choice(_VOCAB) for _ in range(100)), False


def expected_bigdoc_survivors(n_docs: int, seed: int) -> list[int]:
    """Closed-form survivor set: every doc that is NOT a planted dup.

    (A planted dup shares ~94% of shingles with its group head, which has a
    smaller id, so it always loses; independents/head never reach 0.7
    Jaccard with anything else — 100 draws from a 5000-token vocab.)"""
    return [i for i in range(n_docs) if not _doc_of(i, seed)[1]]


def doc_batch(indices, seed: int) -> pa.Table:
    rows = [(int(i), _doc_of(int(i), seed)[0]) for i in indices]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def ensure_bigdocs(
    n_docs: int, seed: int = 7, root: str = "/dev/shm/ocr_ray_fixtures"
) -> str:
    out = os.path.join(root, f"bigdocs_s{seed}_n{n_docs}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import ray.data as rd

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    n_blocks = max(4, min(n_docs // 2000, 512))
    (
        rd.range(n_docs, override_num_blocks=n_blocks)
        .map_batches(
            lambda b, s=seed: doc_batch(b["id"], s),
            batch_format="numpy",
            batch_size=4096,
        )
        .write_parquet(tmp)
    )
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def vec_batch(indices, seed: int, dim: int) -> pa.Table:
    ids = np.asarray(indices, dtype=np.int64)
    out = np.empty((len(ids), dim), dtype=np.float64)
    for j, i in enumerate(ids):
        rs = np.random.RandomState((seed * 1_000_003 + int(i)) % (2**31))
        if i % 20 == 19 and i >= 20:  # 5%: near-dup of vector i-19
            base_rs = np.random.RandomState((seed * 1_000_003 + int(i) - 19) % (2**31))
            v = base_rs.randn(dim)
            v = v + 0.01 * rs.randn(dim)
        else:
            v = rs.randn(dim)
        out[j] = v / np.linalg.norm(v)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(out.tolist(), pa.list_(pa.float64())),
        }
    )


def ensure_bigvecs(
    n_vecs: int, dim: int = 64, seed: int = 11, root: str = "/dev/shm/ocr_ray_fixtures"
) -> str:
    out = os.path.join(root, f"bigvecs_s{seed}_n{n_vecs}_d{dim}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import ray.data as rd

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    n_blocks = max(4, min(n_vecs // 4000, 256))
    (
        rd.range(n_vecs, override_num_blocks=n_blocks)
        .map_batches(
            lambda b, s=seed, d=dim: vec_batch(b["id"], s, d),
            batch_format="numpy",
            batch_size=8192,
        )
        .write_parquet(tmp)
    )
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


# ---------------------------------------------------------------------------
# big events (volume fixture for the timeseries/window family)
# ---------------------------------------------------------------------------

_EV_USERS = 5_000
_EV_SPAN_DAYS = 60
_EV_TYPES = np.array(["view", "click", "purchase", "signup", "error"])


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style avalanche (pure function of (salt, index))."""
    z = x.astype(np.uint64) + np.uint64(salt * 0x9E3779B97F4A7C15 & (2**64 - 1))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def event_batch(indices, seed: int) -> pa.Table:
    """Synthetic event rows: ~uniform users with one HOT user (~1% of all
    rows land on user 42 — the skew a retention/gapfill plan must survive),
    60-day span at second resolution, cents-friendly values."""
    ids = np.asarray(indices, dtype=np.int64)
    h = _mix64(ids, seed)
    user = (h % np.uint64(_EV_USERS)).astype(np.int64)
    user = np.where(h % np.uint64(97) == 0, 42, user)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    sec = ((h >> np.uint64(16)) % np.uint64(_EV_SPAN_DAYS * 86_400)).astype(np.int64)
    ts = (base_us + sec * 1_000_000).astype("datetime64[us]")
    value = ((h >> np.uint64(8)) % np.uint64(5_000_000)).astype(np.float64) / 100.0
    etype = _EV_TYPES[(h % np.uint64(5)).astype(np.int64)]
    return pa.table(
        {
            "event_id": pa.array(ids),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(etype.tolist(), pa.string()),
            "value": pa.array(value),
            "props": pa.array(["{}"] * len(ids), pa.string()),
        }
    )


def ensure_bigevents(
    n_rows: int, seed: int = 7, root: str = "/dev/shm/ocr_ray_fixtures"
) -> str:
    """Cached events fixture dir whose layout matches the sf dirs
    (``<out>/events.parquet/`` holds the part files), so every events-table
    operator runs on it unchanged."""
    out = os.path.join(root, f"bigevents_s{seed}_n{n_rows}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import ray.data as rd

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "events.parquet"), exist_ok=True)
    n_blocks = max(4, min(n_rows // 50_000, 256))
    (
        rd.range(n_rows, override_num_blocks=n_blocks)
        .map_batches(
            lambda b, s=seed: event_batch(b["id"], s),
            batch_format="numpy",
            batch_size=65536,
        )
        .write_parquet(os.path.join(tmp, "events.parquet"))
    )
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out
