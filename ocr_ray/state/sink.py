"""Partitioned, idempotent, resumable Parquet sink with per-partition lineage.

Semantics generalize the reference's Google-Sheet upsert: delete all rows
keyed by the document id, then append (save-to-google-sheet.ts:146-184 +
:232-240) — i.e. *replace-on-retry keyed by partition*. Here the key is a
deterministic partition id ``crc32(conv_id) % num_partitions`` (stable across
processes and runs — a requirement for resume), the replace is an atomic
tmp-file + rename of one Parquet file per partition, and the "was this
already saved" check is a manifest JSON per partition
(``_manifest/part-{pid:05d}.json``) written strictly after the data rename.

Resume: rows whose partition already has a manifest are filtered out
*before* the extraction kernel (cheap vectorizable hash vs heavyweight
parse), so a rerun only pays read+hash for committed work. At 100 TB scale
the manifest additionally records the input files it covered, so a resuming
driver can prune whole input files before the read.

Determinism: each partition file is written with a fixed sort order
(conv_id, turn_idx), fixed compression and a single file — so a clean run
and a kill+resume run produce byte-identical output (FIXTURES.md §4).
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

MANIFEST_DIR = "_manifest"

_PARQUET_OPTS = dict(compression="zstd", data_page_version="1.0")


def partition_of(conv_id: str, num_partitions: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % num_partitions


def _add_part_id(batch: pa.Table, num_partitions: int) -> pa.Table:
    pids = pa.array(
        [zlib.crc32(s) % num_partitions for s in batch.column("conv_id").cast(pa.binary()).to_pylist()],
        pa.int32(),
    )
    return batch.append_column("part_id", pids)


def committed_partitions(out_dir: str) -> dict[int, dict]:
    """Read manifests of already-committed partitions."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[int(m["partition_id"])] = m
    return out


def write_partition_group(group: pa.Table, *, out_dir: str, input_tag: str = "") -> pa.Table:
    """map_groups fn: one group = one partition -> one Parquet file.

    Commit protocol (crash-safe at every step):
      1. write rows sorted by (conv_id, turn_idx) to ``part-{pid}.parquet.tmp``
      2. fsync + rename over ``part-{pid}.parquet``  (atomic replace)
      3. write manifest tmp + rename                 (atomic; marks committed)
    A crash between 2 and 3 leaves data without a manifest; the rerun simply
    rewrites the partition (replace semantics — byte-identical result).
    Returns one manifest row per partition (tiny lineage dataset).
    """
    t0 = time.monotonic()
    pid = int(group.column("part_id")[0].as_py())
    t = group.drop_columns(["part_id"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    os.makedirs(out_dir, exist_ok=True)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)

    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    tmp_path = data_path + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp_path, **_PARQUET_OPTS)
    with open(tmp_path, "rb") as f:
        payload = f.read()
    checksum = hashlib.sha256(payload).hexdigest()
    fd = os.open(tmp_path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp_path, data_path)

    n_errors = int(
        pc.sum(pc.cast(pc.not_equal(t.column("error"), ""), pa.int64())).as_py() or 0
    ) if "error" in t.column_names else 0
    bytes_in = int(pc.sum(t.column("bytes_in")).as_py() or 0) if "bytes_in" in t.column_names else 0
    manifest = {
        "partition_id": pid,
        "rows_out": t.num_rows,
        "n_convs": len(pc.unique(t.column("conv_id"))),
        "bytes_in": bytes_in,
        "bytes_out": len(payload),
        "n_errors": n_errors,
        "checksum": checksum,
        "wall_s": round(time.monotonic() - t0, 4),
        "input_tag": input_tag,
    }
    mpath = os.path.join(mdir, f"part-{pid:05d}.json")
    mtmp = mpath + f".tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, mpath)

    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "rows_out": pa.array([manifest["rows_out"]], pa.int64()),
            "bytes_in": pa.array([bytes_in], pa.int64()),
            "bytes_out": pa.array([manifest["bytes_out"]], pa.int64()),
            "n_errors": pa.array([n_errors], pa.int64()),
            "checksum": pa.array([checksum], pa.string()),
            "wall_s": pa.array([manifest["wall_s"]], pa.float64()),
        }
    )


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    num_partitions: int = 16,
    resume: bool = True,
    input_tag: str = "",
) -> pa.Table:
    """Commit a (extracted) Dataset to a resumable partitioned layout.

    The only shuffle in the engine's hot path: ``groupby(part_id)`` sized so
    each partition is one output-file-sized group (choose ``num_partitions``
    ≈ total_bytes / 256 MB at scale). Returns the manifest table (tiny).
    """
    done = committed_partitions(out_dir) if resume else {}
    ds = ds.map_batches(
        lambda b: _add_part_id(b, num_partitions), batch_format="pyarrow"
    )
    if done:
        keys = pa.array(sorted(done), pa.int32())
        ds = ds.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("part_id"), value_set=keys))
            ),
            batch_format="pyarrow",
        )
    manifests = ds.groupby("part_id").map_groups(
        functools.partial(write_partition_group, out_dir=out_dir, input_tag=input_tag),
        batch_format="pyarrow",
    )
    new = manifests.take_all()  # tiny: one row per partition
    prev = [
        {k: m.get(k) for k in ("partition_id", "rows_out", "bytes_in", "bytes_out",
                                "n_errors", "checksum", "wall_s")}
        for m in done.values()
    ]
    rows = prev + new
    rows.sort(key=lambda r: r["partition_id"])
    if not rows:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    return pa.table({k: [r.get(k) for r in rows] for k in rows[0]})
