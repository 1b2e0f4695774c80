"""Content-addressed query-result cache: materialized result reuse keyed by
an input FINGERPRINT, so a repeated query over unchanged inputs streams the
stored Parquet instead of recomputing — and a changed input invalidates
silently (different fingerprint → different cache slot), never serving stale
rows. The query-level sibling of the sink's resume machinery
(state/sink.write_partitioned skips finished partitions of ONE write; this
skips whole repeated computations).

Generalizes the reference's localStorage result reuse (the app re-renders
prior extractions without re-calling the model, page.tsx state history) to
the cluster: the cache directory lives on shared storage next to the sink's
output, writes are atomic (tmp dir + rename), and a torn write is invisible
(no ``_SUCCESS`` marker → miss).

Fingerprint = md5 over every input file's (relative name, size, mtime_ns).
Size+mtime is the rsync-style cheap signature: no data read, collisions need
a same-length same-mtime rewrite, which Parquet writers don't produce in
practice; pass ``content_hash=True`` to pay one full read for the
cryptographic guarantee.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import uuid

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

_DEFAULT_ROOT = "/tmp/ocr_ray_result_cache"


def input_fingerprint(sf_dir: str, *, content_hash: bool = False) -> str:
    """md5 of the input directory's file inventory (name, size, mtime_ns per
    file, sorted) — or of full file contents with ``content_hash=True``."""
    h = hashlib.md5()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*"))):
        if not os.path.isfile(p):
            continue
        st = os.stat(p)
        h.update(os.path.basename(p).encode())
        if content_hash:
            with open(p, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
        else:
            h.update(f":{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def _slot(root: str, name: str, fp: str) -> str:
    return os.path.join(root, f"{name}_{fp}")


def cached_query(
    name: str,
    fn,
    sf_dir: str,
    *,
    cache_root: str = _DEFAULT_ROOT,
    content_hash: bool = False,
) -> Dataset:
    """Run ``fn(sf_dir)`` through the cache: on a fingerprint hit, stream
    the stored Parquet back (zero recompute); on a miss, compute, persist
    atomically, and return the materialized result. The returned Dataset is
    always read from the cache slot, so hit and miss paths yield
    byte-identical schemas."""
    fp = input_fingerprint(sf_dir, content_hash=content_hash)
    slot = _slot(cache_root, name, fp)
    marker = os.path.join(slot, "_SUCCESS")
    if not os.path.exists(marker):
        res = fn(sf_dir)
        if not hasattr(res, "write_parquet"):  # pa.Table / pandas results
            if isinstance(res, pa.Table):
                res = rd.from_arrow(res)
            else:
                res = rd.from_pandas(res)
        tmp = f"{slot}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        res.write_parquet(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        if os.path.exists(marker):  # concurrent filler won the race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            if os.path.exists(slot):  # torn leftover from a dead writer
                shutil.rmtree(slot, ignore_errors=True)
            os.replace(tmp, slot)
    return rd.read_parquet(
        [p for p in sorted(glob.glob(os.path.join(slot, "*"))) if p.endswith(".parquet")]
    )


def cache_hit(name: str, sf_dir: str, *, cache_root: str = _DEFAULT_ROOT) -> bool:
    """Whether the current inputs already have a committed slot."""
    fp = input_fingerprint(sf_dir)
    return os.path.exists(os.path.join(_slot(cache_root, name, fp), "_SUCCESS"))


def prune_cache(name: str, *, cache_root: str = _DEFAULT_ROOT, keep: int = 2) -> int:
    """Drop all but the ``keep`` most-recently-used slots of a query (old
    fingerprints accumulate as inputs evolve). Returns slots removed."""
    slots = [
        d
        for d in glob.glob(_slot(cache_root, name, "*"))
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    slots.sort(key=lambda d: os.stat(os.path.join(d, "_SUCCESS")).st_mtime_ns, reverse=True)
    removed = 0
    for d in slots[keep:]:
        shutil.rmtree(d, ignore_errors=True)
        removed += 1
    return removed
