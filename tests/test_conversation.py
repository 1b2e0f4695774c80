"""Conversation-level operators: rollups and cross-turn context."""

import pyarrow as pa
import ray.data as rd

from ocr_ray.pipelines.conversation import conversation_stats, dialogue_pairs
from ocr_ray.pipelines.extract_pipeline import extract_dataset
from ocr_ray.sources.transcripts import generate_transcripts_table


def test_conversation_stats():
    t = generate_transcripts_table(20, seed=17)
    out = {r["conv_id"]: r for r in conversation_stats(rd.from_arrow(t)).take_all()}
    # oracle: pure-python rollup
    import collections

    want = collections.defaultdict(lambda: {"n": 0, "u": 0, "b": 0, "lo": None, "hi": None})
    for r in t.to_pylist():
        w = want[r["conv_id"]]
        w["n"] += 1
        w["u"] += r["role"] == "user"
        w["b"] += len(r["text"].encode())
        us = int(r["ts"].timestamp() * 1e6)
        w["lo"] = us if w["lo"] is None else min(w["lo"], us)
        w["hi"] = us if w["hi"] is None else max(w["hi"], us)
    assert set(out) == set(want)
    for cid, w in want.items():
        r = out[cid]
        assert r["n_turns"] == w["n"]
        assert r["n_user_turns"] == w["u"]
        assert r["bytes_total"] == w["b"]
        assert r["span_us"] == w["hi"] - w["lo"]


def test_dialogue_pairs():
    t = generate_transcripts_table(8, seed=19)
    ex = extract_dataset(rd.from_arrow(t), concurrency=(1, 2))
    rows = dialogue_pairs(ex).take_all()
    assert len(rows) == t.num_rows
    by_conv = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    for cid, turns in by_conv.items():
        assert turns[0]["prev_role"] == ""  # first turn has no predecessor
        for prev, cur in zip(turns, turns[1:]):
            assert cur["prev_role"] == prev["role"]
