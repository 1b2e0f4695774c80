"""Planted-edge tests for the session-8 op batch: doc_line_repetition
(Gopher repetition signals, closed-form fractions), user_value_drawdown
(running peak resets per user, tie order), user_type_gini (exact-rational
impurity), embedding_gram (hand-checked 2-vector Gram, exclusion
contract)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(dirpath, name, table: pa.Table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))
    return str(dirpath)


class TestDocLineRepetition:
    def test_closed_form(self, tmp_path, ray_session):
        from ocr_ray.ops.textstats import doc_line_repetition

        # doc 1: lines [ab, ab, xyz] -> 3 lines, 2 distinct, 2 dup
        #   instances, chars 2+2+3=7, dup chars 4 ->
        #   line_bp = 2*10000//3 = 6666, char_bp = 4*10000//7 = 5714
        # doc 2: no newline at all -> 1 line, nothing duplicated
        # doc 3: empty text -> one empty line, zero chars -> all zero
        # doc 4: NULL text -> excluded
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["ab\nab\nxyz", "solo", "", None], pa.string()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        got = (
            doc_line_repetition(sf)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert list(got.index) == [1, 2, 3]
        assert got.loc[1].tolist() == [3, 2, 2, 6666, 5714]
        assert got.loc[2].tolist() == [1, 1, 0, 0, 0]
        assert got.loc[3].tolist() == [1, 1, 0, 0, 0]

    def test_unicode_chars_are_codepoints(self, tmp_path, ray_session):
        from ocr_ray.ops.textstats import doc_line_repetition

        # 'éé' is 2 codepoints (4 utf-8 bytes); dup chars must count 2+2
        # of total 2+2+1 codepoints -> 4*10000//5 = 8000
        t = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["éé\néé\nz"], pa.string()),
            }
        )
        sf = _write(tmp_path, "documents", t)
        row = doc_line_repetition(sf).to_pandas().iloc[0]
        assert row["dup_char_frac_bp"] == 8000


class TestUserValueDrawdown:
    def test_peak_resets_per_user(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_value_drawdown

        ts = pa.array(
            np.array([0, 1, 2, 3, 0, 1], dtype="datetime64[us]").astype(
                "datetime64[us]"
            )
        )
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
                "ts": ts,
                "value": pa.array([3.0, 1.0, 5.0, 2.0, 9.0, 4.0], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = (
            user_value_drawdown(sf)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert got["peak_cents"].tolist() == [300, 300, 500, 500, 900, 900]
        assert got["drawdown_cents"].tolist() == [0, 200, 0, 300, 0, 500]

    def test_same_ts_ties_break_on_event_id(self, tmp_path, ray_session):
        from ocr_ray.ops.timeseries import user_value_drawdown

        ts = pa.array(np.zeros(3, dtype="datetime64[us]"))
        t = pa.table(
            {
                "event_id": pa.array([2, 1, 3], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "ts": ts,
                "value": pa.array([1.0, 5.0, 2.0], pa.float64()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = (
            user_value_drawdown(sf)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # order within equal ts is event_id: 1(500), 2(100), 3(200)
        assert got["peak_cents"].tolist() == [500, 500, 500]
        assert got["drawdown_cents"].tolist() == [0, 400, 300]


class TestUserTypeGini:
    def test_exact_rationals(self, tmp_path, ray_session):
        from ocr_ray.ops.stats import user_type_gini

        # user 1: counts {a: 2, b: 1} -> n=3, ss=5, gini=(9-5)*1e4//9=4444
        # user 2: single type -> gini 0; NULL type row excluded
        t = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                "event_type": pa.array(["a", "a", "b", "c", "c", None], pa.string()),
            }
        )
        sf = _write(tmp_path, "events", t)
        got = (
            user_type_gini(sf).to_pandas().sort_values("user_id").set_index("user_id")
        )
        assert got.loc[1].tolist() == [3, 5, 4444]
        assert got.loc[2].tolist() == [2, 4, 0]


class TestEmbeddingGram:
    def test_hand_checked_and_exclusions(self, tmp_path, ray_session):
        from ocr_ray.ops.ann import _GRAM_DIM, embedding_gram

        d = _GRAM_DIM
        v1 = np.zeros(d)
        v1[0], v1[1] = 1.0, 2.0
        v2 = np.zeros(d)
        v2[0], v2[1] = 3.0, -1.5
        short = [1.0] * (d - 1)  # wrong width -> excluded
        t = pa.table(
            {
                "vec_id": pa.array([1, 2, 3, None], pa.int64()),
                "embedding": pa.array(
                    [list(v1), list(v2), short, list(v1)],
                    pa.list_(pa.float32()),
                ),
            }
        )
        sf = _write(tmp_path, "embeddings", t)
        got = embedding_gram(sf).to_pandas().set_index(["i", "j"])["gram"]
        q = 1_000_000
        # q-space: v1 = (1e6, 2e6), v2 = (3e6, -1.5e6)
        assert got.loc[(1, 1)] == q * q + 9 * q * q
        assert got.loc[(1, 2)] == 2 * q * q + 3 * q * (-1_500_000)
        assert got.loc[(2, 2)] == 4 * q * q + 1_500_000**2
        assert got.loc[(3, 3)] == 0
        assert len(got) == d * (d + 1) // 2


class TestEmbeddingPcaProject:
    def test_matches_numpy_reference(self, ray_session):
        import numpy as np

        from ocr_ray.ops.ann import _GRAM_DIM, embedding_pca_project

        sf = "/root/testdata/sf0.001"
        got = (
            embedding_pca_project(sf, k=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        ids = np.asarray(t.column("vec_id").to_pylist())
        order = np.argsort(ids)
        x = x[order]
        mean = x.mean(axis=0)
        cov = (x - mean).T @ (x - mean) / len(x)
        w, v = np.linalg.eigh(cov)
        comp = v[:, np.argsort(w)[::-1][:2]]
        for c in range(2):
            j = int(np.argmax(np.abs(comp[:, c])))
            if comp[j, c] < 0:
                comp[:, c] = -comp[:, c]
        want = (x - mean) @ comp
        assert got["vec_id"].tolist() == sorted(ids.tolist())
        np.testing.assert_allclose(
            got[["pc1", "pc2"]].to_numpy(), want, rtol=1e-8, atol=1e-10
        )
        # projections carry variance in eigen order
        assert got["pc1"].var() >= got["pc2"].var() - 1e-12


class TestConvResponseLatency:
    def test_adjacent_pairs_only(self, tmp_path, ray_session):
        import numpy as np
        import pyarrow as pa

        from ocr_ray.pipelines.conversation import conv_response_latency
        import ray.data as rd

        ts = pa.array(
            np.array([0, 5_000_000, 9_000_000, 11_000_000, 0, 3_000_000],
                     dtype="datetime64[us]")
        )
        t = pa.table(
            {
                "conv_id": pa.array(["a", "a", "a", "a", "b", "b"]),
                "turn_idx": pa.array([0, 1, 2, 3, 0, 2], pa.int32()),
                "role": pa.array(
                    ["user", "assistant", "tool", "assistant", "user", "assistant"]
                ),
                "tool": pa.array([None] * 6, pa.string()),
                "text": pa.array(["x"] * 6),
                "ts": ts,
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = (
            conv_response_latency(rd.read_parquet(str(tmp_path)))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        # only (a,0->1) qualifies: a3 follows a tool turn; b's assistant is
        # at turn 2 after user turn 0 (gap -> not adjacent)
        assert got["conv_id"].tolist() == ["a"]
        assert got["turn_idx"].tolist() == [1]
        assert got["latency_us"].tolist() == [5_000_000]


def _tiny_transcripts(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array(np.arange(7).astype("datetime64[us]"))
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 5 + ["b"] * 2),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1], pa.int32()),
            "role": pa.array(
                ["user", "tool", "tool", "tool", "user", "assistant", "assistant"]
            ),
            "tool": pa.array(["", "grep", "sed", "grep", "", "", ""]),
            "text": pa.array(["x"] * 7),
            "ts": ts,
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))
    return str(tmp_path)


class TestConvToolTransitions:
    def test_pairs_within_conv_only(self, tmp_path, ray_session):
        import ray.data as rd

        from ocr_ray.pipelines.conversation import conv_tool_transitions

        p = _tiny_transcripts(tmp_path)
        got = (
            conv_tool_transitions(rd.read_parquet(p))
            .to_pandas()
            .sort_values(["prev_tool", "tool"])
            .reset_index(drop=True)
        )
        # conv a tool turns: grep -> sed -> grep; conv b has no tool turns
        assert got[["prev_tool", "tool"]].values.tolist() == [
            ["grep", "sed"],
            ["sed", "grep"],
        ]
        assert got["n"].tolist() == [1, 1]


class TestDqRoleAlternation:
    def test_stutters_and_opening(self, tmp_path, ray_session):
        import ray.data as rd

        from ocr_ray.pipelines.conversation import dq_role_alternation

        p = _tiny_transcripts(tmp_path)
        got = (
            dq_role_alternation(rd.read_parquet(p))
            .to_pandas()
            .sort_values("conv_id")
            .set_index("conv_id")
        )
        # conv a: tool,tool,tool contributes 2 stutters; opens with user
        assert got.loc["a"].tolist() == [5, 2, 1]
        # conv b: assistant,assistant -> 1 stutter; does NOT open with user
        assert got.loc["b"].tolist() == [2, 1, 0]


class TestSystemPromptCensus:
    def test_topk_with_boundary_ties(self, tmp_path, ray_session):
        import ray.data as rd

        from ocr_ray.pipelines.conversation import system_prompt_census

        ts = pa.array(np.arange(7).astype("datetime64[us]"))
        t = pa.table(
            {
                "conv_id": pa.array(list("abcdefg")),
                "turn_idx": pa.array([0] * 7, pa.int32()),
                "role": pa.array(["system"] * 6 + ["user"]),
                "tool": pa.array([""] * 7),
                "text": pa.array(["P1", "P1", "P1", "zz", "aa", "mm", "P1"]),
                "ts": ts,
            }
        )
        pq.write_table(t, str(tmp_path / "part.parquet"))
        got = system_prompt_census(rd.read_parquet(str(tmp_path)), k=3).to_pandas()
        # P1 x3 (user-row P1 ignored), then the n=1 boundary tie broken by
        # text ascending: aa before mm before zz; k=3 cuts at mm
        assert got["text"].tolist() == ["P1", "aa", "mm"]
        assert got["n"].tolist() == [3, 1, 1]
