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


def write_partition_group(
    group: pa.Table,
    *,
    out_dir: str,
    input_tag: str = "",
    expected_schema: pa.Schema | None = None,
    num_partitions: int | None = None,
) -> pa.Table:
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
    _t_sort = time.monotonic()
    if expected_schema is not None:
        # schema-assert before commit (reference double-validation analog,
        # zod at the flow boundary + safeParse at the sink, route.ts:106-114)
        t = t.select(expected_schema.names).cast(expected_schema)
    os.makedirs(out_dir, exist_ok=True)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)

    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    tmp_path = data_path + f".tmp-{os.getpid()}"
    # encode to an in-memory buffer first: the checksum hashes the buffer
    # directly instead of reading the written file back (one full extra read
    # per partition saved), and the bytes hit disk exactly once
    sink_buf = pa.BufferOutputStream()
    pq.write_table(t, sink_buf, **_PARQUET_OPTS)
    payload = sink_buf.getvalue()
    checksum = hashlib.sha256(memoryview(payload)).hexdigest()
    if os.environ.get("OCR_RAY_SINK_TIMING"):
        import sys

        print(
            f"[sink-timing] pid={pid} rows={t.num_rows} sort={_t_sort - t0:.2f}s "
            f"write={time.monotonic() - _t_sort:.2f}s",
            file=sys.stderr, flush=True,
        )
    with open(tmp_path, "wb") as f:
        f.write(memoryview(payload))
        f.flush()
        os.fsync(f.fileno())
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
        "bytes_out": payload.size,
        "n_errors": n_errors,
        "checksum": checksum,
        "wall_s": round(time.monotonic() - t0, 4),
        "input_tag": input_tag,
        "num_partitions": num_partitions,
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


def _fanout_batch(batch: pa.Table, *, frag_root: str) -> pa.Table:
    """Map-side partition fan-out: write each batch's rows, split by
    ``part_id``, as fragment Parquet files under ``frag_root/part-{pid}/``.

    This replaces a Ray all-to-all with a filesystem exchange (the pattern
    every FS-backed shuffle uses): measured on this box, Ray's sort-based
    groupby shuffle degenerates on a low-cardinality key (32 partitions x
    200 blocks -> 300s of SortReduce for a 300 MB dataset), while fragment
    fan-out + per-partition merge is pure sequential I/O. On a multi-node
    cluster ``frag_root`` must be on the shared output store (S3/NFS) —
    which is where the output goes anyway.

    Runs as STATELESS TASKS on purpose: an actor pool here reserves CPU
    slots while idle and starves the upstream extraction tasks at full-
    machine num_cpus (measured: negative 8->32 scaling with a pool; tasks
    share worker processes elastically). Fragment names are unique via
    (pid, uuid) — determinism is not needed for temp names, the finalize
    sort restores canonical order.
    Emits one tiny (part_id, rows) summary row per fragment written.
    """
    import uuid

    pids = batch.column("part_id")
    out_pids, out_rows = [], []
    for pid in pc.unique(pids).to_pylist():
        sub = batch.filter(pc.equal(pids, pid))
        d = os.path.join(frag_root, f"part-{pid:05d}")
        os.makedirs(d, exist_ok=True)
        name = f"frag-{os.getpid()}-{uuid.uuid4().hex[:12]}.parquet"
        # fragments are shuffle spill, not the durable output: lz4 trades a
        # little size for much cheaper encode (fan-out) + decode (finalize);
        # the canonical part files stay zstd (_PARQUET_OPTS)
        pq.write_table(sub, os.path.join(d, name), compression="lz4")
        out_pids.append(pid)
        out_rows.append(sub.num_rows)
    return pa.table(
        {"part_id": pa.array(out_pids, pa.int32()), "rows": pa.array(out_rows, pa.int64())}
    )


def _finalize_one(
    pid: int, *, frag_root: str, out_dir: str, input_tag: str, expected_schema=None,
    num_partitions: int | None = None,
) -> dict:
    """Merge one partition's fragments into its canonical single file.

    Deterministic regardless of fragment arrival order: rows are sorted by
    the unique key (conv_id, turn_idx) before the write. Plain function run
    as a Ray task (one per partition) so callers can hold the futures and
    overlap finalize I/O with the next job's compute."""
    d = os.path.join(frag_root, f"part-{int(pid):05d}")
    frags = sorted(os.listdir(d))
    t = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in frags])
    row = write_partition_group(
        t, out_dir=out_dir, input_tag=input_tag, expected_schema=expected_schema,
        num_partitions=num_partitions,
    )
    return {k: row.column(k)[0].as_py() for k in row.column_names}


class _SinkHandle:
    """Deferred finalize of one ``write_partitioned`` run: holds the
    per-partition finalize task futures. ``collect()`` blocks, cleans the
    fragment spill, and returns the manifest table."""

    def __init__(self, *, refs: list, frag_root: str, done: dict):
        self.refs = refs
        self.frag_root = frag_root
        self.done = done

    def collect(self) -> pa.Table:
        import shutil

        import ray

        new = ray.get(self.refs) if self.refs else []
        shutil.rmtree(self.frag_root, ignore_errors=True)
        prev = [
            {k: m.get(k) for k in ("partition_id", "rows_out", "bytes_in", "bytes_out",
                                    "n_errors", "checksum", "wall_s")}
            for m in self.done.values()
        ]
        rows = prev + new
        rows.sort(key=lambda r: r["partition_id"])
        if not rows:
            return pa.table({"partition_id": pa.array([], pa.int32())})
        return pa.table({k: [r.get(k) for r in rows] for k in rows[0]})


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    num_partitions: int = 16,
    resume: bool = True,
    input_tag: str = "",
    expected_schema: pa.Schema | None = None,
    finalize_num_cpus: int | None = None,
    pre_fn=None,
    fanout_batch_size: int = 8192,
    _defer_finalize: bool = False,
) -> pa.Table:
    """Commit a (extracted) Dataset to a resumable partitioned layout.

    Two phases, no Ray all-to-all: (1) streaming fragment fan-out keyed by
    ``crc32(conv_id) % num_partitions``; (2) parallel per-partition merge +
    atomic commit + manifest. Choose ``num_partitions`` ≈ total_bytes /
    256 MB at scale. Returns the manifest table (tiny).

    ``pre_fn`` fuses a per-batch transform (e.g. the extraction kernel)
    INTO the fan-out task: the transform's output goes straight to fragment
    files and never transits the object store — one stage, no inter-stage
    block traffic. The resume filter still runs on the RAW batch (cheap
    conv_id hash) before the transform, so committed partitions skip the
    heavyweight work entirely.

    ``_defer_finalize=True`` returns a ``_SinkHandle`` after the fan-out
    instead of blocking on the finalize tasks — ``write_segmented`` uses it
    to overlap a segment's finalize I/O with the next segment's fan-out.
    """
    import shutil

    import ray.data as rd

    done = committed_partitions(out_dir) if resume else {}
    if not resume:
        # r5 ADVICE: a resume=False run overwrites the parts it writes but
        # previously never removed stale ones — a partition that became
        # empty (or a num_partitions change) left old part-*.parquet files
        # that downstream readers (and the DuckDB recount oracles) silently
        # included. Full-rebuild semantics: clear prior parts + manifests
        # up front so the on-disk part set equals exactly this run's output.
        import glob as _glob

        for stale in _glob.glob(os.path.join(out_dir, "part-*.parquet")) + _glob.glob(
            os.path.join(out_dir, "part-*.parquet.tmp")
        ):
            os.remove(stale)
        shutil.rmtree(os.path.join(out_dir, MANIFEST_DIR), ignore_errors=True)
    if done:
        # resuming with a different partition count remaps part_ids: rows
        # whose new pid collides with an old committed pid would be silently
        # dropped (filtered as "done" without being in the committed file),
        # and stale files from the old mapping would linger — refuse.
        stale_np = {m.get("num_partitions") for m in done.values()} - {num_partitions, None}
        if stale_np:
            raise ValueError(
                f"resume mismatch: {out_dir} was committed with num_partitions="
                f"{sorted(stale_np)}, current run uses {num_partitions}; use a "
                "new output dir or resume=False"
            )
    if done and input_tag:
        # resuming against a different input silently mixes datasets — the
        # manifests record what they were built from; refuse on mismatch
        stale = {m.get("input_tag") for m in done.values()} - {input_tag, ""}
        if stale:
            raise ValueError(
                f"resume mismatch: {out_dir} has partitions committed from "
                f"{sorted(stale)}, current input is {input_tag!r}; use a new "
                "output dir or resume=False"
            )
    frag_root = os.path.join(out_dir, "_frag")
    shutil.rmtree(frag_root, ignore_errors=True)  # stale fragments from crashes
    os.makedirs(frag_root, exist_ok=True)

    committed_keys = pa.array(sorted(done), pa.int32()) if done else None

    def fanout(batch: pa.Table) -> pa.Table:
        batch = _add_part_id(batch, num_partitions)
        if committed_keys is not None:
            batch = batch.filter(
                pc.invert(pc.is_in(batch.column("part_id"), value_set=committed_keys))
            )
        if pre_fn is not None:
            if batch.num_rows == 0:
                return pa.table(
                    {"part_id": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())}
                )
            batch = _add_part_id(pre_fn(batch.drop_columns(["part_id"])), num_partitions)
        return _fanout_batch(batch, frag_root=frag_root)

    # fragment count = batches x partitions; bounded batches keep the file
    # count (and finalize's open() storm) bounded
    summaries = ds.map_batches(
        fanout, batch_format="pyarrow", batch_size=fanout_batch_size
    ).take_all()  # consumes the pipeline; rows are tiny (part_id, rows)

    pending = sorted({r["part_id"] for r in summaries})
    # I/O-heavy merge tasks: by default cap concurrent writers at ~8 on big
    # clusters (burst-throttled disks thrash); pass finalize_num_cpus=1 when
    # the output store scales with writers (tmpfs/NVMe/S3)
    finalize_cpus = finalize_num_cpus
    if finalize_cpus is None:
        try:
            import ray

            total_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            total_cpus = 8
        finalize_cpus = max(1, total_cpus // 8)
    refs = []
    if pending:
        import ray

        # raw tasks (one per partition) instead of a Dataset stage: the
        # futures can outlive this call, letting write_segmented overlap a
        # segment's finalize I/O with the NEXT segment's fan-out compute
        fin = ray.remote(_finalize_one).options(num_cpus=finalize_cpus)
        refs = [
            fin.remote(
                pid,
                frag_root=frag_root,
                out_dir=out_dir,
                input_tag=input_tag,
                expected_schema=expected_schema,
                num_partitions=num_partitions,
            )
            for pid in pending
        ]
    handle = _SinkHandle(refs=refs, frag_root=frag_root, done=done)
    if _defer_finalize:
        return handle
    return handle.collect()


SEGMENTS_DIR = "_segments"


def committed_segments(out_dir: str) -> dict[int, dict]:
    """Read manifests of fully-committed segments (see ``write_segmented``)."""
    sdir = os.path.join(out_dir, SEGMENTS_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(sdir):
        return out
    for name in os.listdir(sdir):
        if name.startswith("seg-") and name.endswith(".json"):
            with open(os.path.join(sdir, name)) as f:
                m = json.load(f)
            out[int(m["segment_id"])] = m
    return out


def read_segments(out_dir: str, *, upto: int | None = None, columns: list[str] | None = None):
    """Snapshot-isolated read over a ``write_segmented`` table: only
    segments with a COMMITTED manifest are visible, optionally truncated
    to ``upto`` (inclusive) — the time-travel read completing the sink
    lifecycle (write → segment → upsert → compact → delete → READ AS OF).

    A crashed producer leaves partial ``seg-*`` directories with data
    files but no segment manifest; a plain ``read_parquet(out_dir)``
    would see those torn rows, this reader never does. Point-in-time
    audits (``upto=k``) replay exactly the state after segment ``k``
    committed, byte-stable across clean and resumed producers."""
    import ray.data as rd

    import glob

    done = committed_segments(out_dir)
    sids = sorted(s for s in done if upto is None or s <= upto)
    files = [
        f
        for sid in sids
        for f in sorted(
            glob.glob(os.path.join(out_dir, f"seg-{sid:04d}", "part-*.parquet"))
        )
    ]
    if not files:
        raise FileNotFoundError(
            f"no committed segments in {out_dir}"
            + (f" at or before segment {upto}" if upto is not None else "")
        )
    return rd.read_parquet(files, columns=columns)


def _commit_segment(
    out_dir: str, num_partitions: int, sid: int, seg_paths: list[str],
    seg_tag: str, handle: "_SinkHandle",
) -> pa.Table:
    """Block on one deferred segment's finalize tasks, then write its
    segment manifest (atomic rename, strictly after the data commit)."""
    manifest = handle.collect()
    seg_manifest = {
        "segment_id": sid,
        "files": seg_paths,
        "input_tag": seg_tag,
        "num_partitions": num_partitions,
        "partitions": [
            {
                "partition_id": int(r["partition_id"]),
                "rows_out": int(r.get("rows_out") or 0),
            }
            for r in manifest.to_pylist()
        ],
    }
    spath = os.path.join(out_dir, SEGMENTS_DIR, f"seg-{sid:04d}.json")
    stmp = spath + f".tmp-{os.getpid()}"
    with open(stmp, "w") as f:
        json.dump(seg_manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(stmp, spath)
    mrows = manifest.to_pylist()  # empty-segment manifest lacks rows_out
    return pa.table(
        {
            "segment_id": pa.array([sid] * len(mrows), pa.int32()),
            "partition_id": pa.array(
                [int(r["partition_id"]) for r in mrows], pa.int32()
            ),
            "rows_out": pa.array(
                [int(r.get("rows_out") or 0) for r in mrows], pa.int64()
            ),
        }
    )


def write_segmented(
    paths: list[str],
    out_dir: str,
    *,
    segment_files: int = 64,
    num_partitions: int = 16,
    resume: bool = True,
    expected_schema: pa.Schema | None = None,
    pre_fn=None,
    read_columns: list[str] | None = None,
    fanout_batch_size: int = 8192,
) -> pa.Table:
    """Segment-committed variant of ``write_partitioned`` for very long jobs.

    A 100 TB input processed as ONE ``write_partitioned`` run holds every
    fragment until the single global finalize — progress is all-or-nothing
    and the fragment spill area must hold the full output. This variant
    splits the INPUT (sorted file list) into segments of ``segment_files``
    files and commits each segment independently under
    ``out_dir/seg-{sid:04d}/`` (its own partition files + manifests), then
    writes a segment manifest (``_segments/seg-{sid:04d}.json``, atomic
    rename, strictly after the segment's data commit) recording the exact
    input files covered.

    Durability/resume ladder (coarse to fine):
      * a segment with a committed manifest is skipped BEFORE the read —
        whole-input-file pruning, no read/hash cost at all; a file-list
        mismatch for a claimed segment raises (input drift detection);
      * a segment that crashed mid-run resumes at partition granularity via
        ``write_partitioned``'s own per-partition manifests;
      * fragment spill is bounded by one segment's output, not the job's.

    Pipelining: each segment's finalize (disk-bound per-partition merges)
    runs as deferred Ray tasks that overlap the NEXT segment's fan-out
    (CPU-bound); at most one segment's finalize is in flight, and segment
    manifests are still written strictly in segment order.

    Output stays plain partitioned Parquet: ``read_parquet(out_dir)`` sees
    every committed row (one directory per input segment — the resumable
    layout the scale brief prescribes). Determinism: file list is sorted,
    partition files are byte-stable, so clean and resumed runs produce
    identical bytes."""
    import ray.data as rd

    paths = sorted(paths)
    segments = [paths[i : i + segment_files] for i in range(0, len(paths), segment_files)]
    done = committed_segments(out_dir) if resume else {}
    os.makedirs(os.path.join(out_dir, SEGMENTS_DIR), exist_ok=True)
    out_rows: list[pa.Table] = []
    inflight: list[tuple] = []  # at most one deferred (sid, paths, tag, handle)

    def _drain() -> None:
        while inflight:
            out_rows.append(_commit_segment(out_dir, num_partitions, *inflight.pop(0)))

    for sid, seg_paths in enumerate(segments):
        seg_tag = f"seg-{sid:04d}:" + hashlib.sha256(
            "\n".join(seg_paths).encode()
        ).hexdigest()[:16]
        if sid in done:
            _drain()  # keep returned rows + manifest writes in segment order
            if done[sid]["files"] != seg_paths:
                raise ValueError(
                    f"resume mismatch: segment {sid} of {out_dir} was committed "
                    f"from {len(done[sid]['files'])} different input files; the "
                    "input list drifted — use a new output dir or resume=False"
                )
            m = done[sid]
            out_rows.append(
                pa.table(
                    {
                        "segment_id": pa.array([sid] * len(m["partitions"]), pa.int32()),
                        "partition_id": pa.array(
                            [p["partition_id"] for p in m["partitions"]], pa.int32()
                        ),
                        "rows_out": pa.array(
                            [p["rows_out"] for p in m["partitions"]], pa.int64()
                        ),
                    }
                )
            )
            continue
        seg_dir = os.path.join(out_dir, f"seg-{sid:04d}")
        ds = rd.read_parquet(seg_paths, columns=read_columns)
        # deferred finalize: this segment's per-partition merge I/O runs
        # while the NEXT segment's fan-out computes (finalize is disk-bound,
        # fan-out is CPU-bound — the overlap hides one of them). Segment
        # manifests are still written in order, strictly after the
        # segment's data commit, so crash-resume semantics are unchanged.
        handle = write_partitioned(
            ds,
            seg_dir,
            num_partitions=num_partitions,
            resume=resume,
            input_tag=seg_tag,
            expected_schema=expected_schema,
            pre_fn=pre_fn,
            fanout_batch_size=fanout_batch_size,
            _defer_finalize=True,
        )
        # the PREVIOUS segment's finalize ran while this fan-out computed;
        # now that this segment's compute is done, commit it (keeps segment
        # manifests and returned rows in segment order)
        _drain()
        inflight.append((sid, seg_paths, seg_tag, handle))
    _drain()
    if not out_rows:
        return pa.table(
            {
                "segment_id": pa.array([], pa.int32()),
                "partition_id": pa.array([], pa.int32()),
                "rows_out": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(out_rows)


# ---------------------------------------------------------------------------
# upsert (MERGE) into a committed partitioned table
# ---------------------------------------------------------------------------


def _upsert_partition_group(
    group: pa.Table, *, out_dir: str, num_partitions: int, input_tag: str = ""
) -> pa.Table:
    """map_groups fn: merge one partition's delta rows into its committed
    file. Last-write-wins on the (conv_id, turn_idx) key: committed rows
    whose key appears in the delta are replaced; everything else is kept.
    Same crash-safe commit protocol as write_partition_group (tmp + rename,
    manifest last), so a crash mid-upsert rewrites only that partition."""
    pid = int(group.column("part_id")[0].as_py())
    delta = group.drop_columns(["part_id"])
    # "last-write-wins" is only well-defined against the COMMITTED rows: a
    # Dataset carries no row order, so duplicate keys WITHIN the delta have
    # no "last" — refuse instead of silently committing duplicate keys
    n_keys = delta.group_by(["conv_id", "turn_idx"]).aggregate([]).num_rows
    if n_keys != delta.num_rows:
        raise ValueError(
            f"upsert delta has {delta.num_rows - n_keys} duplicate "
            f"(conv_id, turn_idx) keys in partition {pid}; deduplicate the "
            "delta first (e.g. latest_event-style compaction)"
        )
    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    if os.path.exists(data_path):
        old = pq.read_table(data_path)
        if old.schema.names != delta.schema.names:
            raise ValueError(
                f"upsert schema mismatch on partition {pid}: "
                f"{old.schema.names} vs {delta.schema.names}"
            )
        sep = pa.scalar("\x1f")
        def keys(t: pa.Table):
            return pc.binary_join_element_wise(
                pc.cast(t.column("conv_id"), pa.string()),
                pc.cast(t.column("turn_idx"), pa.string()),
                sep,
            )
        keep = pc.invert(pc.is_in(keys(old), value_set=keys(delta).combine_chunks()))
        merged = pa.concat_tables([old.filter(keep), delta.cast(old.schema)])
    else:
        merged = delta
    merged = merged.append_column(
        "part_id", pa.array([pid] * merged.num_rows, pa.int32())
    )
    row = write_partition_group(
        merged, out_dir=out_dir, input_tag=input_tag, num_partitions=num_partitions
    )
    return row.append_column("rows_upserted", pa.array([delta.num_rows], pa.int64()))


def upsert_partitioned(
    delta: Dataset,
    out_dir: str,
    *,
    num_partitions: int | None = None,
    input_tag: str = "",
) -> pa.Table:
    """MERGE a delta Dataset into a committed partitioned table — the
    reference's upsert-by-key sink semantics (delete rows matching the key,
    then append, save-to-google-sheet.ts:146-184 + :232-240) generalized to
    table maintenance: ONLY partitions receiving delta rows are rewritten;
    untouched partition files (and their manifests) are not opened at all.
    The delta itself must be key-unique — a Dataset carries no row order,
    so "last" within the delta is undefined; duplicate keys raise (pre-
    compact with a latest_event-style reduction first).

    The delta is routed by the same crc32(conv_id) partitioning as the
    original write (num_partitions is read from the committed manifests and
    must match — the same remap hazard write_partitioned refuses). Result
    is byte-identical to a from-scratch write of the merged content: the
    partition file is re-sorted and re-encoded with the standard commit
    protocol, so determinism and resume behavior carry over. At 100 TB a
    daily delta touches a bounded set of partitions; cost scales with the
    delta's key spread, not table size."""
    done = committed_partitions(out_dir)
    committed_np = {m.get("num_partitions") for m in done.values()} - {None}
    if num_partitions is None:
        if len(committed_np) != 1:
            raise ValueError(
                f"cannot infer num_partitions from manifests ({sorted(committed_np)}); "
                "pass it explicitly"
            )
        num_partitions = committed_np.pop()
    elif committed_np - {num_partitions}:
        raise ValueError(
            f"upsert mismatch: {out_dir} committed with num_partitions="
            f"{sorted(committed_np)}, delta routed with {num_partitions}"
        )
    n_parts = int(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        return _add_part_id(t, n_parts)

    out = (
        delta.map_batches(add_part, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(
            lambda g: _upsert_partition_group(
                g, out_dir=out_dir, num_partitions=n_parts, input_tag=input_tag
            ),
            batch_format="pyarrow",
        )
    )
    rows = out.take_all()  # tiny: one manifest row per touched partition
    rows.sort(key=lambda r: r["partition_id"])
    if not rows:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


# ---------------------------------------------------------------------------
# segment compaction (table maintenance)
# ---------------------------------------------------------------------------


def _compact_one(
    pid: int,
    files: list[str],
    *,
    dest_dir: str,
    input_tag: str,
    expected_schema=None,
    num_partitions: int | None = None,
) -> dict:
    """Merge ONE partition's files from every segment into its canonical
    single file in ``dest_dir`` (plain function run as a Ray task)."""
    t = pa.concat_tables([pq.read_table(f) for f in files])
    t = t.append_column("part_id", pa.array([int(pid)] * t.num_rows, pa.int32()))
    row = write_partition_group(
        t, out_dir=dest_dir, input_tag=input_tag,
        expected_schema=expected_schema, num_partitions=num_partitions,
    )
    return {k: row.column(k)[0].as_py() for k in row.column_names}


def compact_segments(
    out_dir: str,
    dest_dir: str,
    *,
    resume: bool = True,
    expected_schema: pa.Schema | None = None,
    compact_num_cpus: int | None = None,
) -> pa.Table:
    """Compact a ``write_segmented`` table (K segments × P partition files)
    into the flat ``write_partitioned`` layout (P files) — the maintenance
    pass a long-lived ingest runs when segment-count read amplification
    builds up.

    Scale shape: segments already agree on the partition function, so
    compaction is embarrassingly parallel PER PARTITION — one Ray task
    reads that partition's K files (nothing else), merges, sorts by the
    canonical key and commits via the normal atomic protocol. No shuffle,
    no driver data. Out-of-place (``dest_dir``): the segmented source
    stays intact until the caller swaps directories, and a crashed
    compaction resumes at partition granularity via ``dest_dir``'s own
    manifests. The result is byte-identical to what a from-scratch
    ``write_partitioned`` of the same rows would produce (same sort, same
    writer options)."""
    segs = committed_segments(out_dir)
    if not segs:
        raise ValueError(f"{out_dir} has no committed segments to compact")
    nps = {m.get("num_partitions") for m in segs.values()}
    if len(nps) != 1:
        raise ValueError(f"segments disagree on num_partitions: {sorted(nps)}")
    num_partitions = nps.pop()
    tag = "compact:" + hashlib.sha256(
        "\n".join(
            f"{sid}:{','.join(m['files'])}" for sid, m in sorted(segs.items())
        ).encode()
    ).hexdigest()[:16]

    per_pid: dict[int, list[str]] = {}
    for sid in sorted(segs):
        seg_dir = os.path.join(out_dir, f"seg-{sid:04d}")
        for p in segs[sid]["partitions"]:
            pid = int(p["partition_id"])
            f = os.path.join(seg_dir, f"part-{pid:05d}.parquet")
            if os.path.exists(f):
                per_pid.setdefault(pid, []).append(f)

    done = committed_partitions(dest_dir) if resume else {}
    if done:
        stale = {m.get("input_tag") for m in done.values()} - {tag, ""}
        if stale:
            raise ValueError(
                f"resume mismatch: {dest_dir} holds a compaction of "
                f"{sorted(stale)}, current source is {tag!r}; use a new dest "
                "dir or resume=False"
            )
    pending = sorted(set(per_pid) - set(done))

    import ray

    if compact_num_cpus is None:
        try:
            compact_num_cpus = max(1, int(ray.cluster_resources().get("CPU", 8)) // 8)
        except Exception:
            compact_num_cpus = 1
    rows: list[dict] = []
    if pending:
        task = ray.remote(_compact_one).options(num_cpus=compact_num_cpus)
        rows = ray.get(
            [
                task.remote(
                    pid,
                    per_pid[pid],
                    dest_dir=dest_dir,
                    input_tag=tag,
                    expected_schema=expected_schema,
                    num_partitions=num_partitions,
                )
                for pid in pending
            ]
        )
    for pid in sorted(set(per_pid) & set(done)):
        rows.append({k: v for k, v in done[pid].items() if k != "input_tag"})
    if not rows:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    keys = ["partition_id", "rows_out", "bytes_out", "checksum"]
    return pa.table(
        {k: pa.array([r.get(k) for r in sorted(rows, key=lambda r: r["partition_id"])]) for k in keys}
    )


# ---------------------------------------------------------------------------
# range-partitioned (sorted) table writer
# ---------------------------------------------------------------------------


def _range_finalize_one(
    pid: int, *, frag_root: str, out_dir: str, key: str, sort_keys: list[str]
) -> dict:
    d = os.path.join(frag_root, f"part-{int(pid):05d}")
    frags = sorted(os.listdir(d))
    t = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in frags])
    t = t.drop_columns(["part_id"]).sort_by([(k, "ascending") for k in sort_keys])
    data_path = os.path.join(out_dir, f"range-{int(pid):05d}.parquet")
    tmp = data_path + f".tmp-{os.getpid()}"
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf, **_PARQUET_OPTS)
    payload = buf.getvalue()
    with open(tmp, "wb") as f:
        f.write(memoryview(payload))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, data_path)
    kv = t.column(key)
    manifest = {
        "partition_id": int(pid),
        "rows": t.num_rows,
        "lo": kv[0].as_py() if t.num_rows else None,
        "hi": kv[-1].as_py() if t.num_rows else None,
        "checksum": hashlib.sha256(memoryview(payload)).hexdigest(),
    }
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"range-{int(pid):05d}.json")
    mtmp = mpath + f".tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, mpath)
    return manifest


def write_range_partitioned(
    ds,
    out_dir: str,
    *,
    key: str,
    sort_keys: list[str] | None = None,
    num_files: int = 16,
    bucket_width: int = 1,
) -> pa.Table:
    """Write ``ds`` as a RANGE-partitioned sorted table: ``num_files``
    Parquet files with disjoint, ordered key ranges, each internally sorted
    — the clustered layout that makes predicate pruning work (a reader
    with ``key BETWEEN a AND b`` opens only the files whose [lo, hi]
    intersects; the z-order op is the multi-dimensional sibling).

    Plan (no global sort): (1) a per-batch integer-bucket census folds to
    the driver (O(distinct buckets), the order_quantiles histogram trick);
    boundaries land on bucket edges at the equi-depth ranks. (2) one
    fragment fan-out keyed by searchsorted(boundaries) — the existing
    filesystem exchange, no Ray all-to-all. (3) per-file parallel merge +
    sort + atomic commit with a (lo, hi, rows, sha256) manifest per file.
    Rows with a NULL key are REFUSED (a sorted layout has no place for
    them — callers route them to a separate spill first)."""
    import shutil

    import numpy as np
    import pyarrow.compute as pc_
    import ray

    sort_keys = sort_keys or [key]

    def census(t: pa.Table) -> pa.Table:
        if pc_.any(pc_.is_null(t.column(key))).as_py():
            raise ValueError(f"write_range_partitioned: NULL {key!r} row has no range")
        b = pc_.divide(pc_.cast(t.column(key), pa.int64()), pa.scalar(bucket_width))
        g = pa.table({"b": b}).group_by("b").aggregate([([], "count_all")])
        return g.rename_columns(["b", "n"])

    import pandas as pd

    frames = list(
        ds.map_batches(census, batch_format="pyarrow").iter_batches(batch_format="pandas")
    )
    hist = (
        pd.concat(frames).groupby("b", sort=True)["n"].sum()
        if frames
        else pd.Series(dtype=np.int64)
    )
    buckets = hist.index.to_numpy(np.int64)
    counts = hist.to_numpy(np.int64)
    total = int(counts.sum()) if len(counts) else 0
    cum = np.cumsum(counts) if len(counts) else counts
    # equi-depth boundaries on bucket edges: first bucket whose cumulative
    # count reaches rank i * total / num_files starts file i
    bounds = [buckets[0]] if len(buckets) else []
    for i in range(1, num_files):
        r = (i * total) // num_files
        j = int(np.searchsorted(cum, r, side="right"))
        if j < len(buckets) and (not bounds or buckets[j] > bounds[-1]):
            bounds.append(buckets[j])
    edges = np.asarray(bounds, dtype=np.int64)

    frag_root = os.path.join(out_dir, "_frag")
    shutil.rmtree(frag_root, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def fanout(t: pa.Table) -> pa.Table:
        b = pc_.divide(pc_.cast(t.column(key), pa.int64()), pa.scalar(bucket_width))
        pid = np.maximum(
            np.searchsorted(edges, b.to_numpy(zero_copy_only=False), side="right") - 1, 0
        )
        t = t.append_column("part_id", pa.array(pid.astype(np.int32)))
        return _fanout_batch(t, frag_root=frag_root)

    summaries = ds.map_batches(fanout, batch_format="pyarrow").take_all()
    pending = sorted({r["part_id"] for r in summaries})
    fin = ray.remote(_range_finalize_one)
    rows = ray.get(
        [
            fin.remote(
                pid, frag_root=frag_root, out_dir=out_dir, key=key, sort_keys=sort_keys
            )
            for pid in pending
        ]
    )
    shutil.rmtree(frag_root, ignore_errors=True)
    rows.sort(key=lambda m: m["partition_id"])
    return pa.table(
        {
            "partition_id": pa.array([m["partition_id"] for m in rows], pa.int32()),
            "rows": pa.array([m["rows"] for m in rows], pa.int64()),
            "lo": pa.array([m["lo"] for m in rows]),
            "hi": pa.array([m["hi"] for m in rows]),
        }
    )


def prune_range_files(out_dir: str, lo, hi) -> list[str]:
    """Files of a range-partitioned table whose [lo, hi] intersects the
    query range — the reader-side pruning the layout exists for."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    keep = []
    for name in sorted(os.listdir(mdir)):
        if not name.startswith("range-"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m["rows"] and not (m["hi"] < lo or m["lo"] > hi):
            keep.append(os.path.join(out_dir, f"range-{m['partition_id']:05d}.parquet"))
    return keep


def orders_range_layout(sf_dir: str) -> pa.Table:
    """queries() entry: the range-partitioned layout MANIFEST for orders
    keyed by o_orderkey (8 files, 100-key census buckets) — the layout
    decision itself is driver-verifiable (the SQL mirror recomputes the
    same equi-depth bucket-edge boundaries and per-file lo/hi/rows)."""
    import tempfile

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    ).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("o_orderkey"))),
        batch_format="pyarrow",
    )
    out = tempfile.mkdtemp(prefix="ocr_ray_range_")
    m = write_range_partitioned(
        ds, out, key="o_orderkey", sort_keys=["o_orderkey"], num_files=8,
        bucket_width=100,
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return pa.table(
        {
            "partition_id": pc.cast(m.column("partition_id"), pa.int64()),
            "rows": m.column("rows"),
            "lo": pc.cast(m.column("lo"), pa.int64()),
            "hi": pc.cast(m.column("hi"), pa.int64()),
        }
    )


ORDERS_RANGE_LAYOUT_SQL = """
WITH k AS (
  SELECT o_orderkey AS key, o_orderkey // 100 AS b FROM orders
  WHERE o_orderkey IS NOT NULL
),
h AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY b
),
c AS (
  SELECT b, SUM(n) OVER (ORDER BY b) AS cum, SUM(n) OVER () AS total FROM h
),
bounds AS (  -- file i starts at the first bucket with cum > i*total/8
  SELECT DISTINCT mb AS b FROM (
    SELECT i.i, MIN(c.b) AS mb
    FROM (SELECT unnest(range(1, 8)) AS i) i
    JOIN c ON c.cum > (i.i * c.total) // 8
    GROUP BY i.i
    UNION ALL SELECT 0, MIN(b) FROM h
  )
),
assigned AS (
  SELECT k.key,
         (SELECT COUNT(*) FROM bounds WHERE bounds.b <= k.b) - 1 AS pid
  FROM k
)
SELECT CAST(pid AS BIGINT) AS partition_id,
       CAST(COUNT(*) AS BIGINT) AS rows,
       CAST(MIN(key) AS BIGINT) AS lo,
       CAST(MAX(key) AS BIGINT) AS hi
FROM assigned GROUP BY pid
"""


# ---------------------------------------------------------------------------
# key deletion (right-to-be-forgotten maintenance pass)
# ---------------------------------------------------------------------------


def _delete_partition_group(
    group: pa.Table, *, out_dir: str, num_partitions: int
) -> pa.Table:
    """map_groups fn over the ROUTED KEY dataset: one group = the delete
    keys landing in one partition. Rewrites (or removes) that partition's
    file; untouched partitions are never opened."""
    pid = int(group.column("part_id")[0].as_py())
    empty_row = pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "rows_deleted": pa.array([0], pa.int64()),
            "file_removed": pa.array([False], pa.bool_()),
        }
    )
    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    mpath = os.path.join(out_dir, MANIFEST_DIR, f"part-{pid:05d}.json")
    if not os.path.exists(data_path):
        return empty_row  # keys routed to a never-committed partition
    old = pq.read_table(data_path)
    keys = pc.cast(group.column("conv_id"), pa.string()).combine_chunks()
    keep = pc.invert(pc.is_in(pc.cast(old.column("conv_id"), pa.string()), value_set=keys))
    kept = old.filter(keep)
    n_del = old.num_rows - kept.num_rows
    if n_del == 0:
        return empty_row
    tag = ""
    if os.path.exists(mpath):
        with open(mpath) as f:
            tag = json.load(f).get("input_tag", "")
    if kept.num_rows == 0:
        # a from-scratch write of the remaining rows would not create this
        # partition at all — remove manifest FIRST (a crash in between
        # leaves data-without-manifest, the protocol's "uncommitted" state,
        # and a rerun of the same delete converges)
        if os.path.exists(mpath):
            os.remove(mpath)
        os.remove(data_path)
        return pa.table(
            {
                "partition_id": pa.array([pid], pa.int32()),
                "rows_deleted": pa.array([n_del], pa.int64()),
                "file_removed": pa.array([True], pa.bool_()),
            }
        )
    kept = kept.append_column("part_id", pa.array([pid] * kept.num_rows, pa.int32()))
    write_partition_group(
        kept, out_dir=out_dir, input_tag=tag, num_partitions=num_partitions
    )
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "rows_deleted": pa.array([n_del], pa.int64()),
            "file_removed": pa.array([False], pa.bool_()),
        }
    )


def delete_keys_partitioned(
    conv_ids,
    out_dir: str,
    *,
    num_partitions: int | None = None,
) -> pa.Table:
    """DELETE every row of the given ``conv_id`` keys from a committed
    partitioned table — the right-to-be-forgotten / takedown maintenance
    pass a training-data store must run (the reference's sheet upsert
    replaces rows; regulation also requires removing them). Completes the
    sink lifecycle: write -> segment -> upsert -> compact -> DELETE.

    Scale shape: the KEY set (a deletion request batch) is routed by the
    table's own crc32 partitioning and processed one task per TOUCHED
    partition — cost scales with the keys' partition spread, never table
    size, and the key Dataset is never driver-materialized. Each touched
    partition is rewritten through the standard atomic commit protocol
    (same sort, same encoder), so the result is byte-identical to a
    from-scratch write of the surviving rows; a partition left empty is
    removed entirely (matching the from-scratch layout). The original
    ``input_tag`` is preserved so resume/upsert validation still works.

    ``conv_ids`` may be a Dataset with a ``conv_id`` column or any iterable
    of ids."""
    if not isinstance(conv_ids, Dataset):
        import ray.data as _rd

        ids = list(conv_ids)
        if not ids:
            return pa.table({"partition_id": pa.array([], pa.int32())})
        conv_ids = _rd.from_arrow(
            pa.table({"conv_id": pa.array([str(c) for c in ids], pa.string())})
        )
    done = committed_partitions(out_dir)
    committed_np = {m.get("num_partitions") for m in done.values()} - {None}
    if num_partitions is None:
        if len(committed_np) != 1:
            raise ValueError(
                f"cannot infer num_partitions from manifests ({sorted(committed_np)}); "
                "pass it explicitly"
            )
        num_partitions = committed_np.pop()
    elif committed_np - {num_partitions}:
        raise ValueError(
            f"delete mismatch: {out_dir} committed with num_partitions="
            f"{sorted(committed_np)}, keys routed with {num_partitions}"
        )
    n_parts = int(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("conv_id")))
        g = t.select(["conv_id"]).group_by(["conv_id"]).aggregate([])
        return _add_part_id(g, n_parts)

    out = (
        conv_ids.map_batches(add_part, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(
            lambda g: _delete_partition_group(
                g, out_dir=out_dir, num_partitions=n_parts
            ),
            batch_format="pyarrow",
        )
    )
    rows = out.take_all()  # tiny: one row per touched partition
    rows.sort(key=lambda r: r["partition_id"])
    if not rows:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


# ---------------------------------------------------------------------------
# changelog apply (CDC maintenance: upserts + deletes in ONE pass)
# ---------------------------------------------------------------------------


def _apply_changelog_group(
    group: pa.Table, *, out_dir: str, num_partitions: int
) -> pa.Table:
    """map_groups fn: apply one partition's changelog slice (mixed
    upserts/deletes, keyed by (conv_id, turn_idx)) to its committed file."""
    pid = int(group.column("part_id")[0].as_py())
    ch = group.drop_columns(["part_id"])
    ops = ch.column("op")
    ok = pc.is_in(ops, value_set=pa.array(["upsert", "delete"]))
    if ops.null_count or not pc.all(ok).as_py():
        raise ValueError(
            f"changelog op column must be 'upsert' or 'delete' (partition {pid})"
        )
    # one action per key: an upsert AND a delete for the same key has no
    # defined order in a Dataset — refuse, like upsert's duplicate rule
    n_keys = ch.group_by(["conv_id", "turn_idx"]).aggregate([]).num_rows
    if n_keys != ch.num_rows:
        raise ValueError(
            f"changelog has {ch.num_rows - n_keys} duplicate (conv_id, turn_idx) "
            f"keys in partition {pid}; compact the changelog first"
        )
    is_up = pc.equal(ops, "upsert")
    ups = ch.filter(is_up).drop_columns(["op"])
    dels = ch.filter(pc.invert(is_up))

    sep = pa.scalar("\x1f")

    def keys(t: pa.Table):
        return pc.binary_join_element_wise(
            pc.cast(t.column("conv_id"), pa.string()),
            pc.cast(t.column("turn_idx"), pa.string()),
            sep,
        )

    data_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    mpath = os.path.join(out_dir, MANIFEST_DIR, f"part-{pid:05d}.json")
    tag = ""
    if os.path.exists(mpath):
        with open(mpath) as f:
            tag = json.load(f).get("input_tag", "")
    n_del = 0
    if os.path.exists(data_path):
        old = pq.read_table(data_path)
        if ups.num_rows and old.schema.names != ups.schema.names:
            raise ValueError(
                f"changelog schema mismatch on partition {pid}: "
                f"{old.schema.names} vs {ups.schema.names}"
            )
        okeys = keys(old)
        n_del = pc.sum(
            pc.cast(pc.is_in(okeys, value_set=keys(dels).combine_chunks()), pa.int64())
        ).as_py() or 0
        keep = pc.invert(pc.is_in(okeys, value_set=keys(ch).combine_chunks()))
        merged = old.filter(keep)
        if ups.num_rows:
            merged = pa.concat_tables([merged, ups.cast(old.schema)])
    else:
        merged = ups
    if merged.num_rows == 0:
        # same crash ordering as delete: manifest first, then data
        if os.path.exists(mpath):
            os.remove(mpath)
        if os.path.exists(data_path):
            os.remove(data_path)
        return pa.table(
            {
                "partition_id": pa.array([pid], pa.int32()),
                "rows_upserted": pa.array([ups.num_rows], pa.int64()),
                "rows_deleted": pa.array([n_del], pa.int64()),
                "file_removed": pa.array([True], pa.bool_()),
            }
        )
    merged = merged.append_column(
        "part_id", pa.array([pid] * merged.num_rows, pa.int32())
    )
    write_partition_group(
        merged, out_dir=out_dir, input_tag=tag, num_partitions=num_partitions
    )
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "rows_upserted": pa.array([ups.num_rows], pa.int64()),
            "rows_deleted": pa.array([n_del], pa.int64()),
            "file_removed": pa.array([False], pa.bool_()),
        }
    )


def apply_changelog(
    changes: Dataset,
    out_dir: str,
    *,
    num_partitions: int | None = None,
) -> pa.Table:
    """Apply a CDC changelog — full rows tagged by an ``op`` column
    ('upsert' | 'delete', keyed by (conv_id, turn_idx)) — to a committed
    partitioned table in ONE maintenance pass. This is upsert_partitioned
    and (row-level) delete fused: each TOUCHED partition is read and
    rewritten exactly once through the atomic commit protocol, so a mixed
    day's changes cost one rewrite per touched partition instead of two.
    Untouched partitions are never opened; result is byte-identical to a
    from-scratch write of the post-change content (same sort, same
    encoder); an emptied partition is removed, matching the from-scratch
    layout. Delete rows only need valid key columns (other fields are
    ignored); the changelog must be key-unique (compact it first)."""
    done = committed_partitions(out_dir)
    committed_np = {m.get("num_partitions") for m in done.values()} - {None}
    if num_partitions is None:
        if len(committed_np) != 1:
            raise ValueError(
                f"cannot infer num_partitions from manifests ({sorted(committed_np)}); "
                "pass it explicitly"
            )
        num_partitions = committed_np.pop()
    elif committed_np - {num_partitions}:
        raise ValueError(
            f"changelog mismatch: {out_dir} committed with num_partitions="
            f"{sorted(committed_np)}, changes routed with {num_partitions}"
        )
    n_parts = int(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        return _add_part_id(t, n_parts)

    out = (
        changes.map_batches(add_part, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(
            lambda g: _apply_changelog_group(
                g, out_dir=out_dir, num_partitions=n_parts
            ),
            batch_format="pyarrow",
        )
    )
    rows = out.take_all()  # tiny: one row per touched partition
    rows.sort(key=lambda r: r["partition_id"])
    if not rows:
        return pa.table({"partition_id": pa.array([], pa.int32())})
    return pa.table({k: [r[k] for r in rows] for k in rows[0]})


def read_manifests(out_dir: str) -> pa.Table:
    """Lineage/observability read-back: the committed table's manifests as
    one Arrow table (partition id, rows, bytes in/out, error count,
    checksum, wall seconds, input tag, partition count) — what an operator
    queries to audit a run (row totals, error hot spots, straggler
    partitions) WITHOUT scanning the data files. The sidecar analog of the
    reference's per-run counters (extract-data-from-pdf.ts guard counters,
    page.tsx queue-position display).

    Committed-only by construction: a manifest is written strictly after
    its data rename, so a torn producer never appears here."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    rows = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return pa.table(
        {
            "partition_id": pa.array([r["partition_id"] for r in rows], pa.int32()),
            "rows_out": pa.array([r["rows_out"] for r in rows], pa.int64()),
            "n_convs": pa.array([r.get("n_convs") for r in rows], pa.int64()),
            "bytes_in": pa.array([r.get("bytes_in", 0) for r in rows], pa.int64()),
            "bytes_out": pa.array([r["bytes_out"] for r in rows], pa.int64()),
            "n_errors": pa.array([r.get("n_errors", 0) for r in rows], pa.int64()),
            "checksum": pa.array([r["checksum"] for r in rows], pa.string()),
            "wall_s": pa.array([r["wall_s"] for r in rows], pa.float64()),
            "input_tag": pa.array([r.get("input_tag", "") for r in rows], pa.string()),
            "num_partitions": pa.array([r.get("num_partitions") for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Bloom-filter sidecar index: point-lookup file skipping
# ---------------------------------------------------------------------------

_BLOOM_SIDE_BITS = 1 << 17  # 16 KiB bitmap per file
_BLOOM_SIDE_K = 4


def _file_bloom(path: str, key: str) -> bytes:
    """Build one Bloom bitmap over a file's key column (int64 keys)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_ray.ops.mlprep import _mix64

    col = pq.read_table(path, columns=[key]).column(key)
    keys = col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
    bm = np.zeros(_BLOOM_SIDE_BITS, dtype=bool)
    if len(keys):
        x = keys.view(np.uint64)
        h1 = _mix64(x, 0x9E3779B97F4A7C15)
        h2 = _mix64(x, 0xD1B54A32D192ED03) | np.uint64(1)
        for i in range(_BLOOM_SIDE_K):
            bm[((h1 + np.uint64(i) * h2) % np.uint64(_BLOOM_SIDE_BITS)).astype(np.int64)] = True
    return np.packbits(bm).tobytes()


def write_bloom_sidecars(out_dir: str, *, key: str) -> int:
    """Index an already-committed partitioned table for POINT LOOKUPS: one
    Bloom bitmap per data file over ``key``, stored as a sidecar in the
    manifest dir — the file-skipping complement of the range manifests
    (ranges prune BETWEEN scans on the clustered key; Blooms prune
    ``key = ?`` probes on ANY column, clustered or not). No false
    negatives by construction; a false positive just reads one extra file.

    One Ray task per data file (embarrassingly parallel, reads only the
    key column); sidecars commit atomically. Returns files indexed."""
    import base64
    import glob as _glob

    import ray

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    task = ray.remote(_file_bloom)
    bitmaps = ray.get([task.remote(p, key) for p in files])
    for p, bm in zip(files, bitmaps):
        name = os.path.basename(p)
        side = os.path.join(mdir, f"bloom-{name}.json")
        with open(side + ".tmp", "w") as f:
            json.dump(
                {
                    "file": name,
                    "key": key,
                    "bits": _BLOOM_SIDE_BITS,
                    "k": _BLOOM_SIDE_K,
                    "bitmap": base64.b64encode(bm).decode(),
                },
                f,
            )
        os.replace(side + ".tmp", side)
    return len(files)


def prune_bloom_files(out_dir: str, *, key: str, values) -> list[str]:
    """Data files that MIGHT contain any of the probed key values (no
    false negatives). Files without a sidecar are conservatively kept."""
    import base64
    import glob as _glob

    import numpy as np

    from ocr_ray.ops.mlprep import _mix64

    vals = np.asarray(list(values), dtype=np.int64)
    x = vals.view(np.uint64)
    h1 = _mix64(x, 0x9E3779B97F4A7C15)
    h2 = _mix64(x, 0xD1B54A32D192ED03) | np.uint64(1)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    keep = []
    for p in sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        side = os.path.join(mdir, f"bloom-{os.path.basename(p)}.json")
        if not os.path.exists(side):
            keep.append(p)
            continue
        with open(side) as f:
            m = json.load(f)
        if m.get("key") != key:
            keep.append(p)
            continue
        bm = np.unpackbits(
            np.frombuffer(base64.b64decode(m["bitmap"]), dtype=np.uint8)
        ).astype(bool)
        hit = np.zeros(len(vals), dtype=bool)
        hit[:] = True
        for i in range(int(m["k"])):
            pos = ((h1 + np.uint64(i) * h2) % np.uint64(int(m["bits"]))).astype(np.int64)
            hit &= bm[pos]
        if hit.any():
            keep.append(p)
    return keep


# ---------------------------------------------------------------------------
# zone-map sidecars: per-file min/max over arbitrary columns
# ---------------------------------------------------------------------------
# The third leg of the file-skipping story: range manifests prune BETWEEN
# scans on the CLUSTERED key, Bloom sidecars prune equality probes, zone
# maps prune range predicates on ANY column without re-clustering — the
# lakehouse "zone map" / parquet-footer-statistics pattern, but computed by
# an exact column read (parquet footer stats may be truncated for strings,
# which would silently break the no-false-negative contract).


def _zone_encode(v, typ: str):
    if v is None:
        return None
    if typ == "ts_us":
        return int(v)
    return v


def _file_zonemap(path: str, columns: list[str]) -> dict:
    """Exact per-column (min, max, null_count, n_rows) for one data file."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=columns)
    out: dict = {"n_rows": t.num_rows, "cols": {}}
    for c in columns:
        col = t.column(c)
        nulls = int(col.null_count)
        typ = (
            "ts_us"
            if _pa.types.is_timestamp(col.type)
            else "str"
            if _pa.types.is_string(col.type) or _pa.types.is_large_string(col.type)
            else "float"
            if _pa.types.is_floating(col.type)
            else "int"
        )
        if typ == "ts_us":
            col = col.cast(_pa.int64())
        valid = col.drop_null()
        if len(valid) == 0:
            mn = mx = None
        else:
            mm = _pc.min_max(valid)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
        out["cols"][c] = {
            "type": typ,
            "min": _zone_encode(mn, typ),
            "max": _zone_encode(mx, typ),
            "nulls": nulls,
        }
    return out


def write_zonemap_sidecars(out_dir: str, *, columns: list[str]) -> int:
    """Index an already-committed partitioned table for RANGE predicates on
    arbitrary columns: one exact (min, max, null_count) record per data
    file per column, stored as a sidecar in the manifest dir. One Ray task
    per file (reads only the requested columns); sidecars commit
    atomically; re-running overwrites in place (idempotent). Returns the
    number of files indexed."""
    import glob as _glob

    import ray

    files = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    task = ray.remote(_file_zonemap)
    maps = ray.get([task.remote(p, list(columns)) for p in files])
    for p, zm in zip(files, maps):
        name = os.path.basename(p)
        side = os.path.join(mdir, f"zonemap-{name}.json")
        with open(side + ".tmp", "w") as f:
            json.dump({"file": name, **zm}, f)
        os.replace(side + ".tmp", side)
    return len(files)


def prune_zonemap_files(out_dir: str, *, column: str, lo=None, hi=None) -> list[str]:
    """Data files whose ``column`` range MIGHT intersect [lo, hi] (either
    bound may be None for a half-open predicate) — the read set for
    ``WHERE column BETWEEN lo AND hi``. SQL range predicates never match
    NULL, so an all-NULL file prunes. No false negatives: a file is kept
    unless its exact [min, max] provably misses; files without a sidecar
    (or without this column in theirs) are conservatively kept. Timestamp
    bounds are int microseconds (the sidecar's own encoding)."""
    import glob as _glob

    keep = []
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for p in sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        side = os.path.join(mdir, f"zonemap-{os.path.basename(p)}.json")
        if not os.path.exists(side):
            keep.append(p)
            continue
        with open(side) as f:
            m = json.load(f)
        info = m.get("cols", {}).get(column)
        if info is None:
            keep.append(p)
            continue
        mn, mx = info["min"], info["max"]
        if mn is None:  # no non-null values: no range predicate can match
            continue
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        keep.append(p)
    return keep


def read_pruned(
    out_dir: str,
    *,
    column: str | None = None,
    lo=None,
    hi=None,
    keys=None,
    columns: list[str] | None = None,
):
    """Read a committed hash-partitioned table with the applicable
    file-skipping sidecars applied in one call: zone maps answer
    ``column BETWEEN lo AND hi``; Bloom sidecars answer ``column IN keys``
    (pass ``keys``). Skipping layers intersect (each is
    no-false-negative, so their intersection is); files without the
    relevant sidecar are conservatively kept by each layer.
    (Range-partitioned tables have their own ``prune_range_files`` reader
    — a different file layout.) Returns a ``ray.data.Dataset`` over the
    surviving files — the caller still applies the row-level filter (file
    skipping bounds I/O, it does not filter rows)."""
    import glob as _glob

    import ray.data as _rd

    files = set(sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet"))))
    if column is not None and (lo is not None or hi is not None):
        files &= set(prune_zonemap_files(out_dir, column=column, lo=lo, hi=hi))
    if column is not None and keys is not None:
        files &= set(prune_bloom_files(out_dir, key=column, values=keys))
    if not files:
        # typed-empty read: preserve the schema from any data file
        any_file = sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
        if not any_file:
            return _rd.from_items([])
        import pyarrow.parquet as _pq

        schema = _pq.read_schema(any_file[0])
        sel = columns or schema.names
        empty = pa.table(
            {c: pa.array([], schema.field(c).type) for c in sel}
        )
        return _rd.from_arrow(empty)
    return _rd.read_parquet(sorted(files), columns=columns)


def vacuum_segments(out_dir: str, *, grace_seconds: float = 900.0) -> list[str]:
    """Remove TORN segment debris: ``seg-*`` data directories (and stray
    ``*.tmp`` files) left by a crashed producer that never committed a
    segment manifest. Readers already never see them
    (``read_segments`` is committed-manifest-only), so vacuum changes no
    query result — it reclaims the storage a crash stranded. Committed
    segments are never touched; the manifest directory is the source of
    truth, read BEFORE scanning the data dirs.

    Concurrent-producer safety: a LIVE producer is indistinguishable from
    a crashed one by manifest absence alone — its segment dir exists for
    the whole data-write-to-manifest-commit window, and its atomic-commit
    ``*.tmp`` files exist mid-``os.replace``. ``grace_seconds`` closes
    that window: a candidate is deleted only when nothing under it has
    been modified for at least the grace period (default 15 min — far
    beyond any commit window), so in-flight work is skipped and retried
    by the next vacuum. Pass ``grace_seconds=0`` ONLY on a quiescent
    table (no producers running). The manifest is additionally re-checked
    immediately before each deletion. Returns the paths removed."""
    import glob as _glob
    import shutil as _shutil
    import time as _time

    now = _time.time()

    def _quiet(path: str) -> bool:
        """True when nothing at/under ``path`` was modified within grace."""
        try:
            newest = os.path.getmtime(path)
            if os.path.isdir(path):
                for root, _dirs, files in os.walk(path):
                    newest = max(
                        newest,
                        os.path.getmtime(root),
                        *(os.path.getmtime(os.path.join(root, f)) for f in files),
                    )
        except OSError:
            return False  # mutated under us -> a producer is live, skip
        return (now - newest) >= grace_seconds

    removed: list[str] = []
    done = set(committed_segments(out_dir))
    for d in sorted(_glob.glob(os.path.join(out_dir, "seg-*"))):
        if not os.path.isdir(d):
            continue
        try:
            sid = int(os.path.basename(d).split("-")[1])
        except (IndexError, ValueError):
            continue
        if sid in done or not _quiet(d):
            continue
        # re-check: the manifest may have landed since the first scan
        manifest = os.path.join(out_dir, SEGMENTS_DIR, f"seg-{sid:04d}.json")
        if os.path.exists(manifest):
            continue
        _shutil.rmtree(d, ignore_errors=True)
        removed.append(d)
    for tmp in _glob.glob(os.path.join(out_dir, "**", "*.tmp"), recursive=True):
        if not _quiet(tmp):
            continue  # a concurrent writer's in-flight atomic-commit temp
        try:
            os.remove(tmp)
            removed.append(tmp)
        except OSError:
            pass
    return removed
