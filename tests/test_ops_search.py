"""Search-family mechanics on planted fixtures (the parity gate lives in
test_oracle_parity.py): postings exactness, BM25 ranking behavior, empty
and degenerate corpora."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.ops.search import (
    BM25_TOPK_SQL,
    INVERTED_INDEX_SQL,
    _bm25_sql,
    bm25_topk,
    inverted_index,
)


def _docs_dir(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "sf_docs"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


class TestInvertedIndex:
    def test_planted_postings(self, tmp_path):
        """Hand-checkable corpus: df band, sorted comma postings, pair dedup
        (a term repeated IN one doc posts once)."""
        d = _docs_dir(
            tmp_path,
            [
                "alpha beta beta",  # beta repeats in-doc: one posting
                "beta gamma",
                "beta gamma",
                None,  # NULL text: no pairs
                "alpha",
            ],
        )
        got = {
            r["token"]: (r["df"], r["postings"])
            for r in inverted_index(d).take_all()
        }
        # alpha df=2 (docs 0,4); beta df=3; gamma df=2 — all in [2,400]
        assert got == {
            "alpha": (2, "0,4"),
            "beta": (3, "0,1,2"),
            "gamma": (2, "1,2"),
        }

    def test_hapax_excluded_and_oracle_agrees(self, tmp_path):
        d = _docs_dir(tmp_path, ["solo common", "common", "common x", "x"])
        got = inverted_index(d).to_pandas().sort_values("token").reset_index(drop=True)
        assert "solo" not in set(got["token"])  # df=1 excluded
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(INVERTED_INDEX_SQL).df().sort_values("token").reset_index(drop=True)
        assert got["token"].tolist() == want["token"].tolist()
        assert got["postings"].tolist() == want["postings"].tolist()


class TestBM25:
    def test_rank_prefers_rare_term_and_saturation(self, tmp_path):
        """A doc hitting the RARE query term must outrank a doc hitting only
        the common one (idf), and tf saturates (k1): 50x repetition of one
        term must not beat a two-distinct-term doc."""
        filler = "filler " * 20
        d = _docs_dir(
            tmp_path,
            [
                filler + "hash join",  # two distinct query terms
                filler + ("join " * 50),  # one term, heavily repeated
                filler + "scan",  # 'scan' is rarest here -> high idf
                filler + "join",
                filler + "join",
            ],
        )
        got = bm25_topk(d).to_pandas()
        scores = dict(zip(got["doc_id"], got["score"]))
        assert scores[0] > scores[1]  # two terms beat repetition
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(BM25_TOPK_SQL).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["score"].tolist() == want["score"].tolist()

    def test_no_hits_empty_result(self, tmp_path):
        d = _docs_dir(tmp_path, ["nothing relevant here", "still nothing"])
        assert bm25_topk(d).num_rows == 0

    def test_custom_terms_sql_builder(self, tmp_path):
        """The parametrized production path: custom query terms match the
        per-term SQL the builder emits."""
        d = _docs_dir(tmp_path, ["red blue", "blue", "green red red", "blue green"])
        got = bm25_topk(d, terms=("red", "green")).to_pandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = con.sql(_bm25_sql(("red", "green"))).df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["score"].tolist() == want["score"].tolist()


class TestHybridRrf:
    def test_fuse_arithmetic_and_order(self):
        """floor(1e6/(60+r)) per retriever, missing side contributes 0,
        ties break by doc_id."""
        from ocr_ray.ops.search import _rrf_fuse

        out = _rrf_fuse({1: 1, 2: 2}, {2: 1, 3: 1_000}).to_pylist()
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["rrf_score"] == 1_000_000 // 61
        assert by_id[1]["dense_rank"] is None
        assert by_id[2]["rrf_score"] == 1_000_000 // 62 + 1_000_000 // 61
        assert by_id[3]["rrf_score"] == 1_000_000 // 1060
        assert [r["doc_id"] for r in out] == [2, 1, 3]  # fused order

    def test_end_to_end_contains_both_signals(self, ray_session):
        """The fused top-10 is a genuine mix: it contains at least one doc
        from each retriever's top ranks on the real fixture."""
        from ocr_ray.ops.search import bm25_topk, hybrid_rrf_topk

        sf = "/root/testdata/sf0.001"
        fused = hybrid_rrf_topk(sf).to_pylist()
        assert len(fused) == 10
        lex_top = set(bm25_topk(sf).column("doc_id").to_pylist())
        assert any(r["doc_id"] in lex_top for r in fused)
        assert any(r["dense_rank"] is not None and r["dense_rank"] <= 10 for r in fused)
        # scores are the documented integer form
        for r in fused:
            want = (1_000_000 // (60 + r["lex_rank"]) if r["lex_rank"] else 0) + (
                1_000_000 // (60 + r["dense_rank"]) if r["dense_rank"] else 0
            )
            assert r["rrf_score"] == want
