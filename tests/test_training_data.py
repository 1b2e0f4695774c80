"""Composed clean-corpus pipeline: extract -> quality gate -> annotate ->
exact turn dedup."""

import pyarrow as pa
import ray.data as rd

from ocr_ray.pipelines.training_data import clean_corpus
from ocr_ray.sources.transcripts import generate_transcripts_table
from ocr_ray.stages.schemas import TRANSCRIPT_SCHEMA


def _with_planted(t: pa.Table) -> pa.Table:
    body = (
        "This duplicated assistant answer is long enough to clear the "
        "quality gate and appears in two different conversations verbatim."
    )
    extra = pa.table(
        {
            "conv_id": ["zz-dup-a", "zz-dup-b", "zz-short"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": ["assistant"] * 3,
            "text": [body, body, "tiny"],
            "tool": [""] * 3,
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return pa.concat_tables([t, extra])


def test_clean_corpus():
    t = _with_planted(generate_transcripts_table(30, seed=21))
    out = clean_corpus(rd.from_arrow(t)).to_pandas()

    # quality gate: no empty/short turns, no error rows
    assert (out["main_text"].str.len() >= 50).all()
    assert "zz-short" not in set(out["conv_id"])
    # dedup: exactly one of the planted duplicate pair survives — the
    # (conv_id, turn_idx)-smallest
    dups = out[out["conv_id"].str.startswith("zz-dup")]
    assert list(dups["conv_id"]) == ["zz-dup-a"]
    # annotations present and sane
    assert (out["n_tokens"] > 0).all()
    assert set(out["lang_pred"]) <= {"en", "fr", "de", "es", "zh", "und"}
    # no duplicate main_texts remain
    assert out["main_text"].duplicated().sum() == 0


def test_near_dedup_turns():
    from ocr_ray.pipelines.training_data import clean_corpus, dedup_near_turns

    base = (
        "the distributed pipeline streams arrow batches through the cluster "
        "while the extraction engine normalizes every turn and the sink "
        "commits partitions atomically with manifests recording the lineage "
        "of every row that passes through the staged transforms"
    )
    near = base.replace("atomically", "transactionally")
    t = pa.table(
        {
            "conv_id": ["na", "nb", "nc"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": ["assistant"] * 3,
            "text": [base, near, "completely different short-ish but long enough content about gardens, soup, bread and rain falling quietly on rooftops all afternoon"],
            "tool": [""] * 3,
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    corpus = clean_corpus(rd.from_arrow(t))
    out = dedup_near_turns(corpus).to_pandas()
    convs = set(out["conv_id"])
    assert "na" in convs and "nb" not in convs  # near-dup collapsed, min uid kept
    assert "nc" in convs


def test_winner_reduce_paths_agree(monkeypatch):
    """The size-gated single-block winner reduce must equal the hash-
    partitioned groupby path row for row (gate decision is driver-side)."""
    import ocr_ray.pipelines.training_data as TD
    from ocr_ray.pipelines.training_data import clean_corpus

    from ocr_ray.sources.transcripts import ensure_transcripts

    inp = ensure_transcripts(200, seed=13, root="/tmp/ocr_ray_fixtures")
    ds = rd.read_parquet(inp)

    def key(df):
        return sorted(zip(df["conv_id"], df["turn_idx"]))

    small_gate = key(clean_corpus(ds).to_pandas())
    monkeypatch.setattr(TD, "_SINGLE_REDUCE_MAX_ROWS", 0)
    big_path = key(clean_corpus(ds).to_pandas())
    assert small_gate == big_path and len(small_gate) > 0


def test_training_data_full_report(tmp_path, ray_session):
    """Full composition: extract -> gate -> dedup -> near-dup -> split ->
    sink -> mixture report. The report must reconcile exactly with the
    committed corpus, and the split must be the reproducible md5 split."""
    import ray.data as rd

    from ocr_ray.pipelines.training_data import clean_corpus, training_data_full
    from ocr_ray.sources.transcripts import ensure_transcripts

    d = ensure_transcripts(300, seed=21)
    out = str(tmp_path / "tdf")
    rep = training_data_full(rd.read_parquet(d), out, num_partitions=4).to_pandas()
    assert set(rep.split) <= {"train", "val", "test"}
    # sink holds exactly the reported rows
    back = rd.read_parquet(out)
    assert back.count() == int(rep.n_turns.sum())
    # corpus row count matches the standalone clean_corpus(near_dedup=True)
    n_corpus = clean_corpus(rd.read_parquet(d), near_dedup=True).count()
    assert int(rep.n_turns.sum()) == n_corpus
    # train fraction ~80% (md5 uniformity, wide tolerance at this size)
    frac = rep[rep.split == "train"].n_turns.sum() / rep.n_turns.sum()
    assert 0.7 < frac < 0.9


class TestSftDatasetFull:
    def test_composition_reconciles(self, tmp_path, ray_session):
        """Duplicate conversations contribute no examples; the report
        reconciles exactly with a recount of the committed corpus; the
        split is the documented siphash band rule."""
        import datetime as dt
        import hashlib as hl

        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.pipelines.training_data import sft_dataset_full

        ts = dt.datetime(2024, 1, 1)
        rows = []

        def conv(cid, seq):
            for i, (role, text) in enumerate(seq):
                rows.append((cid, i, role, text))

        # c9 duplicates c1's content -> only c1 survives
        base = [("user", "hello there"), ("assistant", "hi!"), ("user", "more"), ("assistant", "ok")]
        conv("c1", base)
        conv("c9", base)
        conv("c2", [("user", "q"), ("assistant", "")])  # empty response -> gated out
        conv("c3", [("assistant", "orphan")])  # no prior turn -> no example
        conv("c4", [("user", "x"), ("assistant", "resp")])
        t = pa.table(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                "role": [r[2] for r in rows],
                "text": [r[3] for r in rows],
                "tool": [""] * len(rows),
                "ts": [ts] * len(rows),
            }
        )
        out = tmp_path / "sft_out"
        report = sft_dataset_full(rd.from_arrow(t), str(out))
        committed = rd.read_parquet(str(out)).take_all()
        # c1 contributes 2 examples, c4 one; c9 deduped, c2 gated, c3 none
        assert {(r["conv_id"], r["turn_idx"]) for r in committed} == {
            ("c1", 1), ("c1", 3), ("c4", 1)
        }
        # split rule: top byte of the uid's fixed-key siphash64 against the
        # 0xCC/0xE6 bands (the vectorized r4 rule)
        import pandas.util as pdu
        import numpy as _np

        for r in committed:
            uid = f"{r['conv_id']}#{r['turn_idx']:010d}"
            h = pdu.hash_array(_np.array([uid], dtype=object), categorize=False)[0]
            b = int(h >> _np.uint64(56))
            want = "train" if b < 0xCC else ("val" if b < 0xE6 else "test")
            assert r["split"] == want
        # report reconciles with a recount
        rep = {r["split"]: r for r in report.to_pylist()}
        import collections

        cnt = collections.Counter(r["split"] for r in committed)
        for split, n in cnt.items():
            assert rep[split]["n_examples"] == n
            assert rep[split]["ctx_chars"] == sum(
                r["ctx_chars"] for r in committed if r["split"] == split
            )
            assert rep[split]["resp_chars"] == sum(
                r["resp_chars"] for r in committed if r["split"] == split
            )
        assert sum(r["n_examples"] for r in report.to_pylist()) == 3


class TestSplitGoldenPin:
    """The split hash (pandas.util.hash_array fixed-key siphash) must be
    STABLE across runs, processes and library versions — a drift would
    silently re-split a resumed corpus. These exact values were computed
    at pin time; if pandas ever changes the algorithm this fails loudly
    and the split rule must be versioned."""

    def test_pinned_split_values(self):
        import pyarrow as pa

        from ocr_ray.pipelines.training_data import _split_col

        t = pa.table(
            {
                "conv_id": ["conv-00000000", "conv-00000001", "conv-12345678",
                            "a", "conv-00000042"],
                "turn_idx": pa.array([0, 1, 7, 3, 11], pa.int32()),
            }
        )
        got = _split_col(t).to_pylist()
        import numpy as np
        import pandas.util as pdu

        uids = [f"{c}#{i:010d}" for c, i in zip(t.column("conv_id").to_pylist(),
                                                t.column("turn_idx").to_pylist())]
        h = pdu.hash_array(np.array(uids, dtype=object), categorize=False)
        b = (h >> np.uint64(56)).astype(int)
        want = ["train" if x < 0xCC else ("val" if x < 0xE6 else "test") for x in b]
        assert got == want
        # the hard pin: raw hash values recorded at pin time
        assert [int(x) for x in h] == PINNED_HASHES, (
            "pandas.util.hash_array output changed — version the split rule"
        )


# computed once at pin time (pandas 2.x siphash13, fixed default key)
PINNED_HASHES: list = [10418182761473832145, 9845120048499890357, 17442206514858264914, 15426030150849036984, 12092492817242800034]
