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


class TestContextEngine:
    """Conversation-context extraction (VERDICT r1 #8): reply-echo prefixes
    stripped before the kernel runs, via groupby(conv_id) co-location."""

    def _table(self):
        import pyarrow as pa

        from ocr_ray.stages.schemas import TRANSCRIPT_SCHEMA

        prev = (
            "The assistant explains the streaming executor in detail over "
            "several sentences so the payload clears every length gate."
        )
        echo = prev + "\n\nAnd the user continues quoting then adds their own new question about backpressure."
        return pa.table(
            {
                "conv_id": ["c1", "c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
                "role": ["assistant", "user", "assistant", "user"],
                "text": [prev, echo, "fresh reply without any quoting at all", prev],
                "tool": [""] * 4,
                "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            },
            schema=TRANSCRIPT_SCHEMA,
        )

    def test_echo_stripped_equals_suffix_extraction(self):
        import ray.data as rd

        from ocr_ray.core.extract import extract_turn
        from ocr_ray.pipelines.conversation import extract_context_turns

        t = self._table()
        out = extract_context_turns(rd.from_arrow(t)).to_pandas()
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        # turn c1#1 echoes c1#0 entirely: context engine extracts the suffix
        row = out[(out.conv_id == "c1") & (out.turn_idx == 1)].iloc[0]
        assert row.echo_stripped
        suffix = t.column("text")[1].as_py()[len(t.column("text")[0].as_py()):]
        assert row.main_text == extract_turn(suffix).main_text
        # non-echo turns match the turn-local kernel exactly
        for _, r in out[~out.echo_stripped].iterrows():
            raw = [
                x for c, i, x in zip(
                    t.column("conv_id").to_pylist(),
                    t.column("turn_idx").to_pylist(),
                    t.column("text").to_pylist(),
                )
                if c == r.conv_id and i == r.turn_idx
            ][0]
            assert r.main_text == extract_turn(raw).main_text
        # cross-conversation boundary: c2#0 must NOT see c1's turns
        assert not out[(out.conv_id == "c2")].echo_stripped.any()

    def test_turn_context_stats_detects_echo(self):
        import ray.data as rd

        from ocr_ray.pipelines.conversation import turn_context_stats

        out = turn_context_stats(rd.from_arrow(self._table())).to_pandas()
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert list(out.is_echo) == [False, True, False, False]
        assert list(out.prev_role) == ["", "assistant", "user", ""]
        assert list(out.gap_us) == [0, 1, 1, 0]


class TestSkewedKey:
    """VERDICT r1 #7: a pathological hot key (one conv holding most rows)
    must stay CORRECT through grouped_scan — co-location puts it in one
    partition (salt upstream if one key exceeds worker memory; the scan
    itself is vectorized so the cost is one big frame, not 10^5 calls)."""

    def test_hot_key_lag_scan(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.pipelines.conversation import grouped_scan

        n_hot, n_small = 100_000, 50
        conv = ["hot"] * n_hot + [f"c{i}" for i in range(n_small) for _ in (0, 1)]
        idx = list(range(n_hot)) + [j for _ in range(n_small) for j in (0, 1)]
        val = list(range(n_hot)) + [10 * j for _ in range(n_small) for j in (0, 1)]
        t = pa.table({"conv_id": pa.array(conv), "turn_idx": pa.array(idx, pa.int64()),
                      "v": pa.array(val, pa.int64())})

        def lag(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["conv_id", "turn_idx"])
            c = g["conv_id"].to_numpy()
            same = np.empty(len(g), dtype=bool)
            same[0] = False
            same[1:] = c[1:] == c[:-1]
            prev = np.where(same, np.roll(g["v"].to_numpy(), 1), -1)
            return pd.DataFrame({"conv_id": c, "turn_idx": g["turn_idx"].to_numpy(),
                                 "prev_v": prev})

        out = grouped_scan(rd.from_arrow(t).repartition(16), "conv_id", lag).to_pandas()
        assert len(out) == n_hot + 2 * n_small
        hot = out[out.conv_id == "hot"].sort_values("turn_idx")
        # lag within the hot key is exact across all 100k rows
        assert hot.prev_v.iloc[0] == -1
        assert (hot.prev_v.iloc[1:].to_numpy() == np.arange(n_hot - 1)).all()
        # small keys unaffected
        small = out[out.conv_id == "c0"].sort_values("turn_idx")
        assert list(small.prev_v) == [-1, 0]


def test_conv_texts_ordered_concat():
    """Flattened conversation text is the turn texts joined in turn_idx
    order, regardless of input row order."""
    import datetime as dt

    from ocr_ray.pipelines.conversation import conv_texts

    ts = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "conv_id": ["c1", "c2", "c1", "c1"],
            "turn_idx": pa.array([2, 0, 0, 1], pa.int32()),
            "text": ["third", "solo", "first", "second"],
            "ts": [ts] * 4,
        }
    )
    rows = {r["conv_id"]: r for r in conv_texts(rd.from_arrow(t)).take_all()}
    assert rows["c1"]["conv_text"] == "first\nsecond\nthird"
    assert rows["c1"]["n_turns"] == 3
    assert rows["c2"]["conv_text"] == "solo"
    assert rows["c2"]["n_turns"] == 1


def test_extract_links_split_semantics():
    """Link census counts every href="..." occurrence per target; an
    unterminated href (no closing quote in the tail) is dropped. The
    straddle case (a value ending in ``href=``) follows the documented
    split-on-literal semantics — the SQL oracle uses the same split."""
    from ocr_ray.pipelines.conversation import extract_links

    t = pa.table(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": pa.array(range(4), pa.int32()),
            "text": [
                '<a href="/p/1">x</a> <a href="/p/2">y</a>',
                'no links here',
                'dup <a href="/p/1">z</a> and broken href="oops',
                'straddle href="abchref="x" tail',
            ],
        }
    )
    got = {r["href"]: r["n"] for r in extract_links(rd.from_arrow(t)).take_all()}
    assert got["/p/1"] == 2
    assert got["/p/2"] == 1
    # broken (unclosed) href contributes nothing; straddle resolves to "x"
    assert "oops" not in got
    assert got["x"] == 1
