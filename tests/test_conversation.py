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


def test_conv_dedup_exact_planted():
    """Two conversations with identical ordered (role, text) sequences
    collapse into one digest group keeping the min conv_id; near-misses
    (reordered turns, differing role on equal text) stay distinct."""
    import datetime as dt

    from ocr_ray.pipelines.conversation import conv_dedup_exact

    ts = dt.datetime(2024, 1, 1)
    rows = []

    def conv(cid, seq):
        for i, (role, text) in enumerate(seq):
            rows.append(
                {"conv_id": cid, "turn_idx": i, "role": role, "text": text, "ts": ts}
            )

    dup = [("user", "hi"), ("assistant", "hello")]
    conv("a2", dup)
    conv("a1", dup)  # duplicate content, smaller id — must win
    conv("b1", [("user", "hello"), ("assistant", "hi")])  # same multiset, diff order
    conv("c1", [("assistant", "hi"), ("user", "hello")])  # roles swapped
    # injective-separator probe: ("x\x1ey") vs ("x", "y") must NOT collide
    conv("d1", [("user", "x\x1ey")])
    conv("d2", [("user", "x"), ("user", "y")])
    t = pa.table(
        {
            "conv_id": [r["conv_id"] for r in rows],
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": [r["role"] for r in rows],
            "text": [r["text"] for r in rows],
            "ts": [r["ts"] for r in rows],
        }
    )
    out = conv_dedup_exact(rd.from_arrow(t)).take_all()
    by_keep = {r["keep_conv"]: r["n_convs"] for r in out}
    assert by_keep == {"a1": 2, "b1": 1, "c1": 1, "d1": 1, "d2": 1}


def test_sft_examples_planted():
    """Context is all prior turns as 'role: text' joined by newlines;
    first-position assistant turns emit nothing; the tail caps at the
    budget by code points."""
    import datetime as dt

    from ocr_ray.pipelines.conversation import sft_examples

    ts = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "conv_id": ["c1"] * 4 + ["c2"],
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "role": ["user", "assistant", "user", "assistant", "assistant"],
            "text": ["q1", "a1", "q2", "a2", "orphan"],
            "ts": [ts] * 5,
        }
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in sft_examples(rd.from_arrow(t)).take_all()}
    assert set(out) == {("c1", 1), ("c1", 3)}
    assert out[("c1", 1)]["ctx_tail"] == "user: q1"
    assert out[("c1", 1)]["ctx_chars"] == len("user: q1")
    full = "user: q1\nassistant: a1\nuser: q2"
    assert out[("c1", 3)]["ctx_tail"] == full
    assert out[("c1", 3)]["ctx_chars"] == len(full)
    # cap: long context keeps only the trailing budget (code points)
    long = sft_examples(
        rd.from_arrow(
            pa.table(
                {
                    "conv_id": ["z", "z"],
                    "turn_idx": pa.array([0, 1], pa.int32()),
                    "role": ["user", "assistant"],
                    "text": ["é" * 1000, "r"],
                    "ts": [ts] * 2,
                }
            )
        ),
        ctx_chars=16,
    ).take_all()
    (row,) = long
    assert row["ctx_chars"] == len("user: ") + 1000
    assert row["ctx_tail"] == "é" * 16


def test_tool_latency_stats_planted():
    """Only tool turns with an IMMEDIATE successor count; a NULL-ts
    successor breaks adjacency; aggregates are per tool."""
    import datetime as dt

    from ocr_ray.pipelines.conversation import tool_latency_stats

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec) if sec is not None else None

    t = pa.table(
        {
            "conv_id": ["c"] * 6,
            "turn_idx": pa.array([0, 1, 2, 3, 4, 6], pa.int32()),
            "role": ["user", "tool", "tool", "assistant", "tool", "user"],
            "tool": ["", "search", "search", "", "python", ""],
            "ts": [ts(0), ts(1), ts(3), ts(6), ts(10), ts(20)],
        }
    )
    out = {r["tool"]: r for r in tool_latency_stats(rd.from_arrow(t)).take_all()}
    # search@1 -> next@2 (2s), search@2 -> next@3 (3s); python@4 has no idx-5 row
    assert set(out) == {"search"}
    assert out["search"]["n_calls"] == 2
    assert out["search"]["total_wait_us"] == 5_000_000
    assert out["search"]["max_wait_us"] == 3_000_000
    # NULL-ts successor breaks adjacency for its predecessor
    t2 = pa.table(
        {
            "conv_id": ["c", "c", "c"],
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": ["tool", "user", "tool"],
            "tool": ["files", "", "files"],
            "ts": [ts(0), None, ts(9)],
        }
    )
    assert tool_latency_stats(rd.from_arrow(t2)).take_all() == []


def test_new_conv_ops_dirty_parity(tmp_path):
    """Hostile-input parity for conv_dedup_exact / sft_examples /
    tool_latency_stats: NULL conv_id, turn_idx, role, text, tool and ts
    rows vs the same SQL templates the driver gate runs."""
    import datetime as dt

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.conversation import (
        CONV_DEDUP_EXACT_SQL_TMPL,
        SFT_EXAMPLES_SQL_TMPL,
        TOOL_LATENCY_SQL_TMPL,
        conv_dedup_exact,
        sft_examples,
        tool_latency_stats,
    )

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s) if s is not None else None

    t = pa.table(
        {
            "conv_id": pa.array(
                ["a", "a", "a", None, "b", "b", "b", "c", "c", "d"], pa.string()
            ),
            "turn_idx": pa.array([0, 1, 2, 0, 0, None, 2, 0, 1, 0], pa.int64()),
            "role": pa.array(
                ["user", "tool", "assistant", "user", "tool", "tool", "assistant",
                 "user", None, "tool"],
                pa.string(),
            ),
            "text": pa.array(
                ["hi", "mid", None, "ghost", "out", "x", "ok", "hi", None, "solo"],
                pa.string(),
            ),
            "tool": pa.array(
                ["", "", "", "", "search", "python", "", "", "", None], pa.string()
            ),
            "ts": pa.array(
                [ts(0), ts(2), ts(5), ts(0), ts(0), ts(1), ts(9), ts(0), None, ts(0)],
                pa.timestamp("us"),
            ),
        }
    )
    d = tmp_path / "dirty_transcripts"
    d.mkdir()
    pq.write_table(t, str(d / "part.parquet"))
    path = str(d)
    con = duckdb.connect()
    ds = rd.read_parquet(path)
    for fn, tmpl in [
        (conv_dedup_exact, CONV_DEDUP_EXACT_SQL_TMPL),
        (sft_examples, SFT_EXAMPLES_SQL_TMPL),
        (tool_latency_stats, TOOL_LATENCY_SQL_TMPL),
    ]:
        got = fn(ds).to_pandas()
        want = con.sql(tmpl.format(path=path)).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), fn.__name__
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False), fn.__name__


class TestConvTokenNovelty:
    def test_planted_curve(self, ray_session):
        from ocr_ray.pipelines.conversation import conv_token_novelty

        t = pa.table(
            {
                "conv_id": ["a", "a", "a", "b", None, "c"],
                "turn_idx": pa.array([0, 1, 2, 0, 0, None], pa.int32()),
                "role": ["user"] * 6,
                "text": [
                    "x y x",        # turn 0: distinct {x, y}, both new
                    "y z",          # turn 1: {y, z}, only z new
                    "x y z",        # turn 2: {x, y, z}, none new
                    None,           # NULL text -> one '' token, new
                    "ghost",        # NULL conv_id -> dropped
                    "ghost",        # NULL turn_idx -> dropped
                ],
                "tool": [""] * 6,
                "ts": pa.array([None] * 6, pa.timestamp("us")),
            }
        )
        rows = {
            (r["conv_id"], r["turn_idx"]): r
            for r in conv_token_novelty(rd.from_arrow(t)).take_all()
        }
        assert set(rows) == {("a", 0), ("a", 1), ("a", 2), ("b", 0)}
        assert rows[("a", 0)]["n_distinct"] == 2 and rows[("a", 0)]["n_new"] == 2
        assert rows[("a", 1)]["n_distinct"] == 2 and rows[("a", 1)]["n_new"] == 1
        assert rows[("a", 2)]["n_distinct"] == 3 and rows[("a", 2)]["n_new"] == 0
        assert rows[("b", 0)] == {
            "conv_id": "b", "turn_idx": 0, "n_distinct": 1, "n_new": 1,
        }

    def test_dirty_parity(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq

        from ocr_ray.pipelines.conversation import (
            CONV_TOKEN_NOVELTY_SQL_TMPL,
            conv_token_novelty,
        )

        t = pa.table(
            {
                "conv_id": pa.array(
                    ["a", "a", None, "b", "b", "c", "c"], pa.string()
                ),
                "turn_idx": pa.array([0, 1, 0, None, 1, 0, 0], pa.int64()),
                "role": pa.array(["user", None, "user", "x", "", "u", "u"]),
                "text": pa.array(
                    ["a  b", "b a", "zz", "q", None, " ", "  "], pa.string()
                ),
                "tool": pa.array([None] * 7, pa.string()),
                "ts": pa.array([None] * 7, pa.timestamp("us")),
            }
        )
        d = tmp_path / "dirty"
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
        got = conv_token_novelty(rd.read_parquet(str(d))).to_pandas()
        con = duckdb.connect()
        want = con.sql(CONV_TOKEN_NOVELTY_SQL_TMPL.format(path=str(d))).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


    def test_hashed_matches_exact_sibling(self, ray_session):
        """The token-hash exchange (VERDICT r2 #2) must reproduce the
        collision-free text-exchange sibling row-for-row, and its exchange
        schema must be fixed-width hashes (large_list<int64>), never text."""
        import pandas as pd

        from ocr_ray.pipelines.conversation import (
            conv_token_novelty,
            conv_token_novelty_exact,
        )
        from ocr_ray.sources.transcripts import ensure_transcripts

        p = ensure_transcripts(200, seed=42)
        keys = ["conv_id", "turn_idx"]
        a = conv_token_novelty(rd.read_parquet(p)).to_pandas()
        b = conv_token_novelty_exact(rd.read_parquet(p)).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values(keys).reset_index(drop=True),
            b.sort_values(keys).reset_index(drop=True),
        )


class TestTurnMarkupStats:
    def test_planted_counts_and_dirty_parity(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq

        from ocr_ray.pipelines.conversation import (
            TURN_MARKUP_STATS_SQL_TMPL,
            turn_markup_stats,
        )

        t = pa.table(
            {
                "conv_id": pa.array(["a", "a", "b", None, "c"], pa.string()),
                "turn_idx": pa.array([0, 1, 0, 0, None], pa.int64()),
                "role": pa.array(["user"] * 5),
                "text": pa.array(
                    [
                        "<html><p>hi</p><a href=x>go</a></html>",
                        None,                         # '' -> all zeros
                        "data:text/html;base64,AAA",  # data-URI flag
                        "dropped",
                        "dropped",
                    ],
                    pa.string(),
                ),
                "tool": pa.array([""] * 5),
                "ts": pa.array([None] * 5, pa.timestamp("us")),
            }
        )
        d = tmp_path / "markup"
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
        got = turn_markup_stats(rd.read_parquet(str(d))).to_pandas()
        rows = {(r.conv_id, r.turn_idx): r for r in got.itertuples()}
        assert set(rows) == {("a", 0), ("a", 1), ("b", 0)}
        r = rows[("a", 0)]
        assert (r.n_lt, r.n_p_open, r.n_href, r.is_data_uri) == (6, 1, 1, 0)
        assert rows[("a", 1)].n_chars == 0
        assert rows[("b", 0)].is_data_uri == 1
        con = duckdb.connect()
        want = con.sql(TURN_MARKUP_STATS_SQL_TMPL.format(path=str(d))).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestConvLangProfile:
    def test_planted_mixture_and_dirty_parity(self, ray_session, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq

        from ocr_ray.pipelines.conversation import (
            conv_lang_profile,
            conv_lang_profile_sql,
        )

        en = "the quick fox and the lazy dog are of the same mind for all days"
        fr = "le chat et la chatte sont dans les jardins de la ville pour une nuit"
        zh = "中文文本内容测试样例段落"
        t = pa.table(
            {
                "conv_id": pa.array(["a", "a", "a", "b", None], pa.string()),
                "turn_idx": pa.array([0, 1, 2, 0, 0], pa.int64()),
                "role": pa.array(["user"] * 5),
                "text": pa.array([en, fr, en, zh, en], pa.string()),
                "tool": pa.array([""] * 5),
                "ts": pa.array([None] * 5, pa.timestamp("us")),
            }
        )
        d = tmp_path / "langs"
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
        got = conv_lang_profile(rd.read_parquet(str(d))).to_pandas()
        rows = {(r.conv_id, r.lang_pred): r.n_turns for r in got.itertuples()}
        assert rows == {("a", "en"): 2, ("a", "fr"): 1, ("b", "zh"): 1}
        con = duckdb.connect()
        want = con.sql(conv_lang_profile_sql(str(d))).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
