"""Checkpointed-resume test (FIXTURES.md §4): kill after k committed
partitions -> rerun -> byte-identical final output, each partition committed
exactly once."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray.pipelines.extract_pipeline import extract_dataset
from ocr_ray.sources.transcripts import generate_transcripts_table
from ocr_ray.state.sink import committed_partitions, write_partitioned

N_PARTS = 8


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_in")
    t = generate_transcripts_table(60, seed=7)
    pq.write_table(t, d / "in.parquet")
    return str(d / "in.parquet")


def _run(inputs, out_dir):
    ds = extract_dataset(rd.read_parquet(inputs), concurrency=(1, 4))
    return write_partitioned(ds, out_dir, num_partitions=N_PARTS)


def _file_bytes(d):
    out = {}
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        if name.endswith(".parquet"):
            with open(p, "rb") as f:
                out[name] = f.read()
    return out


def test_clean_run_commits_all(inputs, tmp_path):
    out = str(tmp_path / "clean")
    manifest = _run(inputs, out)
    committed = committed_partitions(out)
    assert len(committed) == manifest.num_rows > 0
    # manifest rows_out total == input turn count
    total = sum(m["rows_out"] for m in committed.values())
    assert total == pq.read_metadata(inputs).num_rows
    # per-partition checksum matches the file on disk
    import hashlib

    for pid, m in committed.items():
        with open(os.path.join(out, f"part-{pid:05d}.parquet"), "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == m["checksum"]


def test_resume_is_byte_identical(inputs, tmp_path):
    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    _run(inputs, clean)
    _run(inputs, crashed)

    # simulate a crash: drop the data+manifest of all but the first 3 partitions
    kept = sorted(committed_partitions(crashed))[:3]
    for name in os.listdir(crashed):
        if name.endswith(".parquet"):
            pid = int(name.split("-")[1].split(".")[0])
            if pid not in kept:
                os.remove(os.path.join(crashed, name))
    mdir = os.path.join(crashed, "_manifest")
    for name in os.listdir(mdir):
        pid = int(name.split("-")[1].split(".")[0])
        if pid not in kept:
            os.remove(os.path.join(mdir, name))
    assert len(committed_partitions(crashed)) == 3

    manifest = _run(inputs, crashed)  # resume
    assert sorted(committed_partitions(crashed)) == sorted(committed_partitions(clean))
    assert _file_bytes(crashed) == _file_bytes(clean)  # byte-identical
    # manifest table covers every partition exactly once
    pids = manifest.column("partition_id").to_pylist()
    assert len(pids) == len(set(pids))


def test_torn_partition_is_replaced(inputs, tmp_path):
    """Data file present but manifest missing (crash between rename and
    manifest write) -> partition is rewritten, result identical."""
    clean = str(tmp_path / "clean")
    torn = str(tmp_path / "torn")
    _run(inputs, clean)
    _run(inputs, torn)
    pids = sorted(committed_partitions(torn))
    victim = pids[-1]
    # corrupt the data file and remove only its manifest
    with open(os.path.join(torn, f"part-{victim:05d}.parquet"), "wb") as f:
        f.write(b"garbage")
    os.remove(os.path.join(torn, "_manifest", f"part-{victim:05d}.json"))

    _run(inputs, torn)
    assert _file_bytes(torn) == _file_bytes(clean)


def test_full_rebuild_clears_stale_parts(inputs, tmp_path):
    """r5 ADVICE: resume=False is a full rebuild — part files and manifests
    from a prior commit with a DIFFERENT num_partitions (or partitions that
    became empty) must not linger, or downstream readers and the DuckDB
    recount oracles silently include them."""
    out = str(tmp_path / "rebuild")
    ds = extract_dataset(rd.read_parquet(inputs), concurrency=(1, 4))
    write_partitioned(ds, out, num_partitions=8, resume=False)
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 8
    # plant an orphan that the old code path would have left behind too
    with open(os.path.join(out, "part-00099.parquet"), "wb") as f:
        f.write(b"stale")
    ds2 = extract_dataset(rd.read_parquet(inputs), concurrency=(1, 4))
    manifest = write_partitioned(ds2, out, num_partitions=3, resume=False)
    on_disk = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    expect = sorted(
        f"part-{pid:05d}.parquet" for pid in manifest.column("partition_id").to_pylist()
    )
    assert on_disk == expect  # old pids 3..7 and the orphan are gone
    committed = committed_partitions(out)
    assert sorted(committed) == sorted(manifest.column("partition_id").to_pylist())
    total = sum(m["rows_out"] for m in committed.values())
    assert total == pq.read_metadata(inputs).num_rows


def test_resume_input_mismatch_refused(inputs, tmp_path):
    out = str(tmp_path / "out")
    ds = extract_dataset(rd.read_parquet(inputs), concurrency=(1, 4))
    write_partitioned(ds, out, num_partitions=4, input_tag="input-A")
    ds2 = extract_dataset(rd.read_parquet(inputs), concurrency=(1, 4))
    with pytest.raises(ValueError, match="resume mismatch"):
        write_partitioned(ds2, out, num_partitions=4, input_tag="input-B")
    # same tag resumes fine
    write_partitioned(ds2, out, num_partitions=4, input_tag="input-A")


def test_fused_extract_commit_identical(inputs, tmp_path):
    """Fused (pre_fn inside fanout) output must be byte-identical to the
    staged extract -> write pipeline."""
    from ocr_ray.pipelines.extract_pipeline import extract_and_commit

    staged, fused = str(tmp_path / "staged"), str(tmp_path / "fused")
    _run(inputs, staged)
    extract_and_commit(inputs, fused, num_partitions=N_PARTS, resume=False)
    assert _file_bytes(fused) == _file_bytes(staged)


def test_fused_resume(inputs, tmp_path):
    from ocr_ray.pipelines.extract_pipeline import extract_and_commit

    out = str(tmp_path / "out")
    extract_and_commit(inputs, out, num_partitions=N_PARTS)
    before = _file_bytes(out)
    # drop one partition; fused rerun repairs byte-identically
    pid = sorted(committed_partitions(out))[0]
    os.remove(os.path.join(out, f"part-{pid:05d}.parquet"))
    os.remove(os.path.join(out, "_manifest", f"part-{pid:05d}.json"))
    extract_and_commit(inputs, out, num_partitions=N_PARTS)
    assert _file_bytes(out) == before


# ---------------------------------------------------------------------------
# segment-committed sink (write_segmented)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def seg_inputs(tmp_path_factory):
    """Six single-conv-range input files (2 files per segment at
    segment_files=2 -> 3 segments)."""
    d = tmp_path_factory.mktemp("seg_in")
    paths = []
    for i in range(6):
        t = generate_transcripts_table(15, seed=100 + i)
        # disjoint conv ids across files so segments overlap partitions
        import pyarrow as pa
        import pyarrow.compute as pc

        t = t.set_column(
            t.schema.get_field_index("conv_id"),
            "conv_id",
            pc.binary_join_element_wise(pa.scalar(f"f{i}-"), t.column("conv_id"), ""),
        )
        p = str(d / f"in-{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def _run_segmented(paths, out_dir, **kw):
    from ocr_ray.state.sink import write_segmented
    from ocr_ray.pipelines.extract_pipeline import _extract_batch

    return write_segmented(
        paths, out_dir, segment_files=2, num_partitions=4,
        pre_fn=_extract_batch, read_columns=["conv_id", "turn_idx", "role", "text"],
        **kw,
    )


def _all_bytes(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for name in sorted(files):
            if name.endswith(".parquet"):
                p = os.path.join(dirpath, name)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, root)] = f.read()
    return out


def test_segmented_clean_run(seg_inputs, tmp_path):
    out = str(tmp_path / "seg_clean")
    manifest = _run_segmented(seg_inputs, out)
    assert sorted(set(manifest.column("segment_id").to_pylist())) == [0, 1, 2]
    # read_parquet over the root sees every committed row
    back = rd.read_parquet(out)
    assert back.count() == sum(manifest.column("rows_out").to_pylist()) > 0
    # every input row extracted exactly once
    n_in = sum(pq.read_metadata(p).num_rows for p in seg_inputs)
    assert back.count() == n_in


def test_segmented_resume_skips_committed_segments(seg_inputs, tmp_path):
    from ocr_ray.state.sink import SEGMENTS_DIR, committed_segments

    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    _run_segmented(seg_inputs, clean)
    _run_segmented(seg_inputs, crashed)
    # simulate a crash after segment 0: drop segment 1 and 2 entirely
    for sid in (1, 2):
        shutil.rmtree(os.path.join(crashed, f"seg-{sid:04d}"))
        os.remove(os.path.join(crashed, SEGMENTS_DIR, f"seg-{sid:04d}.json"))
    before = committed_segments(crashed)
    assert list(before) == [0]
    mtime0 = os.path.getmtime(os.path.join(crashed, "seg-0000", "part-00000.parquet"))
    manifest = _run_segmented(seg_inputs, crashed)
    # segment 0 untouched (pruned before the read), 1 and 2 rebuilt
    assert os.path.getmtime(
        os.path.join(crashed, "seg-0000", "part-00000.parquet")
    ) == mtime0
    assert sorted(committed_segments(crashed)) == [0, 1, 2]
    # byte-identical to a clean run
    assert _all_bytes(crashed) == _all_bytes(clean)
    assert manifest.num_rows > 0


def test_segmented_input_drift_refused(seg_inputs, tmp_path):
    out = str(tmp_path / "drift")
    _run_segmented(seg_inputs, out)
    # same segment ids, different file list -> refuse
    shuffled = list(seg_inputs[2:]) + list(seg_inputs[:2])
    with pytest.raises(ValueError, match="drift|mismatch"):
        from ocr_ray.state.sink import write_segmented
        from ocr_ray.pipelines.extract_pipeline import _extract_batch

        write_segmented(
            shuffled[:4], out, segment_files=2, num_partitions=4,
            pre_fn=_extract_batch,
            read_columns=["conv_id", "turn_idx", "role", "text"],
        )


class TestUpsertPartitioned:
    """MERGE into a committed table: last-write-wins by key, only touched
    partitions rewritten, result byte-identical to a from-scratch write."""

    @staticmethod
    def _table(rows):
        import pyarrow as pa

        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )

    def test_upsert_merge_and_byte_identity(self, tmp_path):
        import hashlib
        import os

        import ray.data as rd

        from ocr_ray.state.sink import (
            committed_partitions,
            upsert_partitioned,
            write_partitioned,
        )

        base = [(f"c{i}", j, f"v0-{i}-{j}") for i in range(10) for j in range(2)]
        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table(base)), out, num_partitions=4)
        before = {p: m["checksum"] for p, m in committed_partitions(out).items()}

        delta_rows = [("c0", 0, "UPDATED"), ("c0", 5, "NEW-TURN"), ("zz", 0, "NEW-CONV")]
        m = upsert_partitioned(rd.from_arrow(self._table(delta_rows)), out)
        touched = set(m.column("partition_id").to_pylist())
        assert 0 < len(touched) <= 2  # c0 and zz partitions only

        # merged content == pandas-computed expectation
        got = rd.read_parquet(out).to_pandas().sort_values(["conv_id", "turn_idx"])
        keyed = {(r[0], r[1]): r[2] for r in base}
        keyed.update({(r[0], r[1]): r[2] for r in delta_rows})
        assert len(got) == len(keyed)
        for _, r in got.iterrows():
            assert keyed[(r.conv_id, r.turn_idx)] == r.text

        # untouched partitions: bit-identical (checksums unchanged)
        after = {p: m2["checksum"] for p, m2 in committed_partitions(out).items()}
        for p in before:
            if p not in touched:
                assert after[p] == before[p]

        # byte-identity vs a from-scratch write of the merged content
        out2 = str(tmp_path / "fresh")
        merged_rows = [(k[0], k[1], v) for k, v in keyed.items()]
        write_partitioned(rd.from_arrow(self._table(merged_rows)), out2, num_partitions=4)
        for p in after:
            f1 = os.path.join(out, f"part-{p:05d}.parquet")
            f2 = os.path.join(out2, f"part-{p:05d}.parquet")
            h = lambda fp: hashlib.sha256(open(fp, "rb").read()).hexdigest()
            assert h(f1) == h(f2)

    def test_upsert_refuses_partition_remap(self, tmp_path):
        import pytest
        import ray.data as rd

        from ocr_ray.state.sink import upsert_partitioned, write_partitioned

        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table([("a", 0, "x")])), out, num_partitions=4)
        with pytest.raises(ValueError, match="num_partitions"):
            upsert_partitioned(
                rd.from_arrow(self._table([("a", 0, "y")])), out, num_partitions=8
            )


# ---------------------------------------------------------------------------
# segment compaction (compact_segments)
# ---------------------------------------------------------------------------


def test_compact_segments_matches_flat_write(seg_inputs, tmp_path):
    """Compacting 3 segments x 4 partitions must produce the flat layout a
    from-scratch write_partitioned of the SAME rows produces — byte
    identical — and read back as the same row multiset."""
    import hashlib as _hl

    import ray.data as rd

    from ocr_ray.pipelines.extract_pipeline import _extract_batch
    from ocr_ray.state.sink import compact_segments, write_partitioned

    seg_out = str(tmp_path / "seg")
    _run_segmented(seg_inputs, seg_out)
    dest = str(tmp_path / "flat")
    manifest = compact_segments(seg_out, dest)
    assert manifest.num_rows == 4  # every partition compacted

    # reference: one flat write of the same input
    ref = str(tmp_path / "ref")
    write_partitioned(
        rd.read_parquet(list(seg_inputs), columns=["conv_id", "turn_idx", "role", "text"]),
        ref,
        num_partitions=4,
        pre_fn=_extract_batch,
    )

    def file_hashes(root):
        out = {}
        for name in sorted(os.listdir(root)):
            if name.endswith(".parquet"):
                with open(os.path.join(root, name), "rb") as f:
                    out[name] = _hl.sha256(f.read()).hexdigest()
        return out

    assert file_hashes(dest) == file_hashes(ref)
    assert rd.read_parquet(dest).count() == rd.read_parquet(seg_out).count()


def test_compact_resume_skips_committed(seg_inputs, tmp_path):
    from ocr_ray.state.sink import MANIFEST_DIR, compact_segments

    seg_out = str(tmp_path / "seg2")
    _run_segmented(seg_inputs, seg_out)
    dest = str(tmp_path / "flat2")
    compact_segments(seg_out, dest)
    # drop one partition's manifest + file -> only that one is rebuilt
    os.remove(os.path.join(dest, "part-00002.parquet"))
    os.remove(os.path.join(dest, MANIFEST_DIR, "part-00002.json"))
    mtime0 = os.path.getmtime(os.path.join(dest, "part-00000.parquet"))
    compact_segments(seg_out, dest)
    assert os.path.getmtime(os.path.join(dest, "part-00000.parquet")) == mtime0
    assert os.path.exists(os.path.join(dest, "part-00002.parquet"))


class TestDeleteKeysPartitioned:
    """Right-to-be-forgotten pass: only touched partitions rewritten,
    byte-identical to a from-scratch write of the survivors, emptied
    partitions removed entirely."""

    @staticmethod
    def _table(rows):
        import pyarrow as pa

        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )

    def test_delete_byte_identity_and_pruning(self, tmp_path):
        import hashlib
        import os

        import ray.data as rd

        from ocr_ray.state.sink import (
            committed_partitions,
            delete_keys_partitioned,
            write_partitioned,
        )

        base = [(f"c{i}", j, f"v-{i}-{j}") for i in range(12) for j in range(2)]
        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table(base)), out, num_partitions=4)
        before = {p: m["checksum"] for p, m in committed_partitions(out).items()}

        victims = ["c0", "c7", "nosuch"]
        m = delete_keys_partitioned(victims, out)
        rows_deleted = sum(m.column("rows_deleted").to_pylist())
        assert rows_deleted == 4  # 2 turns x 2 real conversations
        touched = {
            p
            for p, n in zip(
                m.column("partition_id").to_pylist(), m.column("rows_deleted").to_pylist()
            )
            if n > 0
        }

        survivors = [r for r in base if r[0] not in victims]
        got = rd.read_parquet(out).to_pandas()
        assert sorted(map(tuple, got.values.tolist())) == sorted(
            (r[0], r[1], r[2]) for r in survivors
        )

        # untouched partitions bit-identical; touched byte-identical to a
        # from-scratch write of the survivors
        out2 = str(tmp_path / "fresh")
        write_partitioned(rd.from_arrow(self._table(survivors)), out2, num_partitions=4)
        after = committed_partitions(out)
        for p, m2 in after.items():
            if p not in touched:
                assert m2["checksum"] == before[p]
            f1 = os.path.join(out, f"part-{p:05d}.parquet")
            f2 = os.path.join(out2, f"part-{p:05d}.parquet")
            h = lambda fp: hashlib.sha256(open(fp, "rb").read()).hexdigest()
            assert h(f1) == h(f2)
        assert set(after) == set(committed_partitions(out2))

    def test_delete_empties_whole_partition(self, tmp_path):
        import os

        import ray.data as rd

        from ocr_ray.state.sink import (
            committed_partitions,
            delete_keys_partitioned,
            write_partitioned,
        )

        rows = [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "z")]
        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table(rows)), out, num_partitions=2)
        from ocr_ray.state.sink import partition_of

        # delete every conversation in a's partition
        pa_ = partition_of("a", 2)
        victims = [c for c in ("a", "b") if partition_of(c, 2) == pa_]
        m = delete_keys_partitioned(victims, out)
        assert any(m.column("file_removed").to_pylist())
        assert not os.path.exists(os.path.join(out, f"part-{pa_:05d}.parquet"))
        assert pa_ not in committed_partitions(out)
        # idempotent rerun: nothing left to delete
        m2 = delete_keys_partitioned(victims, out, num_partitions=2)
        assert sum(m2.column("rows_deleted").to_pylist() or [0]) == 0

    def test_delete_refuses_partition_remap(self, tmp_path):
        import pytest
        import ray.data as rd

        from ocr_ray.state.sink import delete_keys_partitioned, write_partitioned

        rows = [("a", 0, "x"), ("b", 0, "y")]
        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table(rows)), out, num_partitions=4)
        with pytest.raises(ValueError, match="delete mismatch"):
            delete_keys_partitioned(["a"], out, num_partitions=8)


class TestReadSegments:
    def test_time_travel_and_torn_segment_invisible(
        self, ray_session, seg_inputs, tmp_path
    ):
        import ray.data as rd

        from ocr_ray.state.sink import committed_segments, read_segments

        out = str(tmp_path / "seg_tt")
        _run_segmented(seg_inputs, out)
        done = committed_segments(out)
        assert sorted(done) == [0, 1, 2]

        full = read_segments(out).count()
        upto0 = read_segments(out, upto=0).count()
        upto1 = read_segments(out, upto=1).count()
        assert 0 < upto0 < upto1 < full
        # as-of replays exactly the committed prefix
        import glob as _glob
        seg0_rows = rd.read_parquet(
            sorted(_glob.glob(os.path.join(out, "seg-0000", "part-*.parquet")))
        ).count()
        assert upto0 == seg0_rows

        # a torn (uncommitted) segment dir: data present, no manifest —
        # plain read_parquet sees its rows, the snapshot reader never does
        torn = os.path.join(out, "seg-0003")
        os.makedirs(torn, exist_ok=True)
        import pyarrow as pa

        pq.write_table(
            pa.table({"conv_id": ["torn"], "turn_idx": [0]}),
            os.path.join(torn, "part-00000.parquet"),
        )
        assert read_segments(out).count() == full
        assert read_segments(out, upto=99).count() == full

        with pytest.raises(FileNotFoundError):
            read_segments(str(tmp_path / "nothing_here"))


class TestApplyChangelog:
    """CDC apply: mixed upserts + deletes in ONE pass per touched partition,
    byte-identical to a from-scratch write of the post-change content."""

    @staticmethod
    def _table(rows, op=None):
        import pyarrow as pa

        cols = {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
        if op is not None:
            cols["op"] = pa.array([r[3] for r in rows], pa.string())
        return pa.table(cols)

    def test_mixed_changes_byte_identity(self, tmp_path):
        import hashlib
        import os

        import ray.data as rd

        from ocr_ray.state.sink import (
            apply_changelog,
            committed_partitions,
            write_partitioned,
        )

        base = [(f"c{i}", j, f"v0-{i}-{j}") for i in range(10) for j in range(2)]
        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table(base)), out, num_partitions=4)
        before = {p: m["checksum"] for p, m in committed_partitions(out).items()}

        changes = [
            ("c0", 0, "UPDATED", "upsert"),
            ("c0", 5, "NEW-TURN", "upsert"),
            ("zz", 0, "NEW-CONV", "upsert"),
            ("c1", 1, "", "delete"),
            ("c2", 0, "", "delete"),
            ("nope", 9, "", "delete"),  # key absent: no-op
        ]
        m = apply_changelog(rd.from_arrow(self._table(changes, op=True)), out)
        touched = set(m.column("partition_id").to_pylist())

        keyed = {(r[0], r[1]): r[2] for r in base}
        for c, t, v, op in changes:
            if op == "upsert":
                keyed[(c, t)] = v
            else:
                keyed.pop((c, t), None)
        got = rd.read_parquet(out).to_pandas()
        assert len(got) == len(keyed)
        for _, r in got.iterrows():
            assert keyed[(r.conv_id, r.turn_idx)] == r.text

        # untouched partitions bit-identical; result == from-scratch write
        after = {p: m2["checksum"] for p, m2 in committed_partitions(out).items()}
        for p in before:
            if p not in touched:
                assert after[p] == before[p]
        out2 = str(tmp_path / "fresh")
        merged_rows = [(k[0], k[1], v) for k, v in keyed.items()]
        write_partitioned(rd.from_arrow(self._table(merged_rows)), out2, num_partitions=4)
        h = lambda fp: hashlib.sha256(open(fp, "rb").read()).hexdigest()
        for p in after:
            assert h(os.path.join(out, f"part-{p:05d}.parquet")) == h(
                os.path.join(out2, f"part-{p:05d}.parquet")
            )

    def test_delete_all_removes_partition(self, tmp_path):
        import os

        import ray.data as rd

        from ocr_ray.state.sink import apply_changelog, write_partitioned

        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table([("a", 0, "x")])), out, num_partitions=4)
        [f] = [f for f in os.listdir(out) if f.endswith(".parquet")]
        m = apply_changelog(
            rd.from_arrow(self._table([("a", 0, "", "delete")], op=True)), out
        )
        assert m.column("file_removed").to_pylist() == [True]
        assert not os.path.exists(os.path.join(out, f))
        assert rd.read_parquet(out).count() == 0 if os.listdir(out) else True

    def test_conflicting_key_refused(self, tmp_path):
        import pytest
        import ray.data as rd

        from ocr_ray.state.sink import apply_changelog, write_partitioned

        out = str(tmp_path / "t")
        write_partitioned(rd.from_arrow(self._table([("a", 0, "x")])), out, num_partitions=4)
        with pytest.raises(Exception, match="duplicate"):
            apply_changelog(
                rd.from_arrow(
                    self._table(
                        [("a", 0, "y", "upsert"), ("a", 0, "", "delete")], op=True
                    )
                ),
                out,
            )


def test_read_manifests_reconciles(tmp_path, ray_session):
    """The manifest report's row/byte totals equal a recount of the
    committed data; a torn (manifest-less) partition file is invisible."""
    import json
    import os

    import pyarrow.parquet as pq_
    import ray.data as rd

    from ocr_ray.pipelines.extract_pipeline import extract_from_path
    from ocr_ray.sources.transcripts import ensure_transcripts
    from ocr_ray.state.sink import read_manifests, write_partitioned

    inp = ensure_transcripts(40, seed=42)
    out = str(tmp_path / "out")
    write_partitioned(extract_from_path(inp), out, num_partitions=4, resume=False)
    rep = read_manifests(out)
    assert rep.num_rows == 4
    back = rd.read_parquet(out)
    assert sum(rep.column("rows_out").to_pylist()) == back.count()
    assert set(rep.column("num_partitions").to_pylist()) == {4}
    # torn producer: a data file with no manifest must not appear
    os.remove(os.path.join(out, "_manifest", "part-00002.json"))
    rep2 = read_manifests(out)
    assert rep2.num_rows == 3
    assert 2 not in rep2.column("partition_id").to_pylist()


class TestBloomSidecar:
    def test_point_lookup_skips_files(self, ray_session, tmp_path):
        """Sidecar pruning: no false negatives (every probed key's rows are
        found), real skipping (a key confined to one file prunes to ~1
        file), unindexed files conservatively kept."""
        import os

        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.state.sink import prune_bloom_files, write_bloom_sidecars

        import pyarrow.parquet as pq

        n = 4000
        out = str(tmp_path / "table")
        os.makedirs(out)
        # 8 part files, uid range-sliced so each key lives in exactly one
        for i in range(8):
            lo, hi = i * (n // 8), (i + 1) * (n // 8)
            ids = np.arange(lo, hi, dtype=np.int64)
            pq.write_table(
                pa.table({"uid": pa.array(ids), "v": pa.array(ids * 2)}),
                os.path.join(out, f"part-{i:05d}.parquet"),
            )
        n_indexed = write_bloom_sidecars(out, key="uid")
        assert n_indexed == 8

        import glob

        all_files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        probe = [123]
        keep = prune_bloom_files(out, key="uid", values=probe)
        # the key lives in exactly one partition; FPs may add a file or two
        assert 1 <= len(keep) < len(all_files)
        got = rd.read_parquet(keep).filter(expr="uid == 123").take_all()
        assert [r["v"] for r in got] == [246]

        # absent key: usually prunes everything; never errors
        none_keep = prune_bloom_files(out, key="uid", values=[10**12 + 7])
        assert isinstance(none_keep, list)

        # drop one sidecar -> that file must be conservatively kept
        side = sorted(
            glob.glob(os.path.join(out, "_manifest", "bloom-*.json"))
        )[0]
        victim = os.path.join(out, __import__("json").load(open(side))["file"])
        os.remove(side)
        keep2 = prune_bloom_files(out, key="uid", values=[10**12 + 7])
        assert victim in keep2


class TestVacuumSegments:
    def test_removes_torn_keeps_committed(self, ray_session, seg_inputs, tmp_path):
        import glob as _glob

        import pyarrow as pa

        from ocr_ray.state.sink import read_segments, vacuum_segments

        out = str(tmp_path / "seg_vac")
        _run_segmented(seg_inputs, out)
        full = read_segments(out).count()

        # plant crash debris: a torn segment dir and a stray tmp file
        torn = os.path.join(out, "seg-0009")
        os.makedirs(torn)
        pq.write_table(
            pa.table({"conv_id": ["torn"], "turn_idx": [0]}),
            os.path.join(torn, "part-00000.parquet"),
        )
        stray = os.path.join(out, "seg-0000", "junk.parquet.tmp")
        open(stray, "w").write("partial")

        # default grace period: fresh debris is indistinguishable from an
        # in-flight producer -> must be KEPT
        assert vacuum_segments(out) == []
        assert os.path.exists(torn) and os.path.exists(stray)

        removed = vacuum_segments(out, grace_seconds=0)
        assert torn in removed and stray in removed
        assert not os.path.exists(torn) and not os.path.exists(stray)
        # committed segments untouched, reads identical
        assert read_segments(out).count() == full
        assert sorted(_glob.glob(os.path.join(out, "seg-*/")))  # data dirs remain
        # idempotent
        assert vacuum_segments(out, grace_seconds=0) == []
