"""Corpus-prep operators: planted-case semantics beyond the SQL parity gate
(which covers testdata exactly but not edge shapes)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.ops.corpus import (
    _PACK_BUDGET,
    decontaminate_docs,
    mixture_sample,
    order_quantiles,
    pack_sequences,
    vocab_topk,
)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    """Mini table dir shaped like testdata: documents + orders."""
    d = tmp_path_factory.mktemp("corpus_sf")
    # doc 0 (eval: 0 % 17 == 0) plants a 5-gram that doc 18 copies; doc 19
    # is clean; doc 20 has <5 tokens; doc 34 is eval again (34 % 17 == 0)
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta",
        18: "noise words then alpha beta gamma delta epsilon more tail",
        19: "completely disjoint content nothing shared at all here",
        20: "tiny doc",
        34: "another eval document with its own unique phrasing entirely",
        35: "tiny doc",  # <5 tokens, equals doc 20's whole-text gram (non-eval twin)
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
                "lang": ["en", "zh", "fr", "en", "de", "es"],
                "source": ["s"] * 6,
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table({"o_totalprice": pa.array([float(x) for x in range(1, 101)])}),
        d / "orders.parquet",
    )
    return str(d)


def test_decontaminate_planted(ray_session, sf_dir):
    surv = sorted(r["doc_id"] for r in decontaminate_docs(sf_dir).take_all())
    # 18 shares the planted 5-gram with eval doc 0 -> contaminated.
    # 19, 20, 35 share nothing with eval docs 0/34 -> survive.
    assert surv == [19, 20, 35]


def test_vocab_counts(ray_session, sf_dir):
    rows = {r["token"]: r["n"] for r in vocab_topk(sf_dir).take_all()}
    assert rows["alpha"] == 2 and rows["tiny"] == 2 and rows["noise"] == 1


def test_pack_boundaries(ray_session, sf_dir):
    rows = sorted(pack_sequences(sf_dir).take_all(), key=lambda r: r["doc_id"])
    # exclusive running sum in doc_id order // budget
    cum = 0
    for r in rows:
        assert r["pack_id"] == cum // _PACK_BUDGET
        cum += r["n_tokens"]


def test_pack_budget_split(ray_session, tmp_path):
    # 3 docs of 1500 tokens: packs 0,0,1 (exclusive sums 0,1500,3000)
    text = " ".join(["tok"] * 1500)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": [text] * 3,
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = sorted(pack_sequences(str(tmp_path)).take_all(), key=lambda r: r["doc_id"])
    assert [r["pack_id"] for r in rows] == [0, 0, 1]


def test_mixture_rates(ray_session, sf_dir):
    kept = {r["doc_id"] for r in mixture_sample(sf_dir).take_all()}
    # 'en' docs always survive; others depend on md5 but are deterministic
    assert {0, 20} <= kept
    again = {r["doc_id"] for r in mixture_sample(sf_dir).take_all()}
    assert kept == again


def test_quantile_rank_convention(ray_session, sf_dir):
    # orders are 1..100 dollars -> cents 100..10000; rank ceil(q*n):
    # p25 -> 25th value = 2500 cents, p99 -> 99th = 9900
    rows = {r["q_bp"]: r["cents"] for r in order_quantiles(sf_dir).take_all()}
    assert rows == {2500: 2500, 5000: 5000, 7500: 7500, 9000: 9000, 9900: 9900}


class TestChunkDocs:
    def test_window_math(self):
        import pyarrow as pa

        from ocr_ray.ops.corpus import chunk_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["a" * 5, "b" * 120, "c" * 121, None]),
            }
        )
        out = chunk_batch(t, size=120, stride=90)
        by_doc: dict = {}
        for r in out.to_pylist():
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[0]) == 1 and by_doc[0][0]["chunk_chars"] == 5
        assert len(by_doc[1]) == 1  # exactly one full window
        assert len(by_doc[2]) == 2  # one char over -> second (short) window
        assert by_doc[2][1]["chunk_idx"] == 1 and by_doc[2][1]["chunk_chars"] == 31
        assert by_doc[3] == [
            {"doc_id": 3, "chunk_idx": 0, "chunk_text": "", "chunk_chars": 0}
        ]

    def test_overlap_reconstructs(self):
        """stride < size -> consecutive chunks overlap by size - stride and
        concatenating each chunk's first `stride` chars + the tail restores
        the document."""
        import pyarrow as pa

        from ocr_ray.ops.corpus import chunk_batch

        text = "".join(chr(97 + i % 26) for i in range(500))
        out = chunk_batch(
            pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array([text])}),
            size=120,
            stride=90,
        ).to_pylist()
        out.sort(key=lambda r: r["chunk_idx"])
        rebuilt = "".join(r["chunk_text"][:90] for r in out[:-1]) + out[-1]["chunk_text"]
        assert rebuilt == text
        for a, b in zip(out, out[1:]):
            assert a["chunk_text"][90:] == b["chunk_text"][: len(a["chunk_text"]) - 90]


class TestVocabCms:
    def test_matches_exact_sibling(self):
        """Tiny fixture vocab << sketch width -> no collisions, so the CMS
        top-k equals the exact vocab_topk exactly (set AND counts)."""
        from ocr_ray.ops.corpus import vocab_topk, vocab_topk_cms

        sf = "/root/testdata/sf0.001"
        exact = {r["token"]: r["n"] for r in vocab_topk(sf).take_all()}
        approx = {r["token"]: r["n"] for r in vocab_topk_cms(sf).to_pylist()}
        assert approx == exact

    def test_planted_skew_never_underestimates(self):
        import pyarrow as pa

        import ray.data as rd

        from ocr_ray.ops.corpus import vocab_topk_cms_over

        docs = rd.from_arrow(
            pa.table(
                {
                    "text": pa.array(
                        ["hot " * 50 + f"rare{i} cold{i % 7}" for i in range(400)]
                    )
                }
            )
        )
        out = vocab_topk_cms_over(docs, top_k=5).to_pylist()
        assert out[0]["token"] == "hot" and out[0]["n"] >= 400 * 50
        truth = {"hot": 400 * 50, **{f"cold{j}": len(range(j, 400, 7)) for j in range(7)}}
        for r in out:
            if r["token"] in truth:
                assert r["n"] >= truth[r["token"]]  # count-min: biased up only


class TestStripCommonLines:
    def test_planted_boilerplate(self):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.ops.corpus import strip_common_lines_over

        footer = "Page 1 / 1"
        texts = [f"unique body {i}\n{footer}\nmore {i}" for i in range(30)]
        texts.append("")  # empty doc: one '' line, below threshold -> kept
        ds = rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([f"c{i}" for i in range(31)]),
                    "turn_idx": pa.array(list(range(31)), pa.int32()),
                    "text": pa.array(texts),
                }
            )
        )
        out = {r["conv_id"]: r for r in strip_common_lines_over(ds, min_count=10).take_all()}
        assert len(out) == 31  # row-total
        for i in range(30):
            r = out[f"c{i}"]
            assert r["clean_text"] == f"unique body {i}\nmore {i}"
            assert r["n_removed"] == 1
        assert out["c30"]["clean_text"] == "" and out["c30"]["n_removed"] == 0

    def test_all_lines_removed(self):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.ops.corpus import strip_common_lines_over

        ds = rd.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([f"c{i}" for i in range(12)]),
                    "turn_idx": pa.array(list(range(12)), pa.int32()),
                    "text": pa.array(["spam\nspam"] * 12),
                }
            )
        )
        out = strip_common_lines_over(ds, min_count=5).take_all()
        assert all(r["clean_text"] == "" and r["n_removed"] == 2 for r in out)


class TestCapPerSource:
    def test_cap_bites_and_keeps_smallest_ids(self):
        from ocr_ray.ops.corpus import _SOURCE_CAP, cap_per_source

        out = cap_per_source("/root/testdata/sf0.001").take_all()
        by_src: dict = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        assert all(len(v) == _SOURCE_CAP for v in by_src.values())
        # smallest-doc_id-first: the kept set per source is its min-15 ids
        import duckdb

        for src, ids in list(by_src.items())[:3]:
            want = [
                r[0]
                for r in duckdb.sql(
                    "SELECT doc_id FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
                    f"WHERE source = '{src}' ORDER BY doc_id LIMIT {_SOURCE_CAP}"
                ).fetchall()
            ]
            assert sorted(ids) == want


class TestQualityGate:
    def test_median_gate_keeps_upper_half(self):
        from ocr_ray.ops.corpus import quality_gated_docs

        out = quality_gated_docs("/root/testdata/sf0.001").take_all()
        assert 0 < len(out) < 500  # the gate bites but keeps rows
        assert len(out) >= 250  # ties at the median are kept -> at least half
        med = min(r["stop_bp"] for r in out)
        assert all(r["stop_bp"] >= med for r in out)


class TestDupNgramSpans:
    def test_planted_shared_spans(self, ray_session, tmp_path):
        from ocr_ray.ops.corpus import dup_ngram_spans

        # docs 1 and 2 share one 5-word span; doc 3 shares nothing; doc 4
        # repeats the shared span TWICE (distinct-gram count still 1); doc 5
        # is under 5 words
        texts = {
            1: "the quick brown fox jumps over a lazy dog",
            2: "intro words the quick brown fox jumps and more",
            3: "entirely different content with no overlap at all",
            4: "the quick brown fox jumps padding the quick brown fox jumps",
            5: "too few words",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": [texts[k] for k in sorted(texts)],
                }
            ),
            tmp_path / "documents.parquet",
        )
        got = {r["doc_id"]: r["n_dup_grams"] for r in dup_ngram_spans(str(tmp_path)).take_all()}
        # the shared span "the quick brown fox jumps" appears in docs 1,2,4
        assert got == {1: 1, 2: 1, 4: 1}

    def test_within_doc_repeat_is_not_cross_doc(self, ray_session, tmp_path):
        from ocr_ray.ops.corpus import dup_ngram_spans

        # a span repeated only WITHIN one doc must not count
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": [
                        "one two three four five one two three four five",
                        "six seven eight nine ten eleven",
                    ],
                }
            ),
            tmp_path / "documents.parquet",
        )
        assert dup_ngram_spans(str(tmp_path)).take_all() == []


class TestLmScore:
    def test_planted_surprisal_ordering(self, ray_session, tmp_path):
        """Common-vocabulary docs score a LOWER mean surprisal than a
        rare-token doc; OOV-only docs hit the cap; empty docs score 0."""
        import pyarrow.parquet as pq_

        from ocr_ray.ops.corpus import lm_score_docs

        d = tmp_path / "lm_sf"
        d.mkdir()
        # "the" appears 40x (very common); doc 2 is one-off junk tokens
        common = "the " * 20
        pq_.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": [common, common, "zzqx wvut kjhg", ""],
                }
            ),
            d / "documents.parquet",
        )
        got = {
            r["doc_id"]: r
            for r in lm_score_docs(str(d), vocab_k=1, cap=1000).take_all()
        }
        assert got[3] == {"doc_id": 3, "n_tokens": 0, "sur_total": 0, "mean_sur": 0}
        # total=43 tokens; "the" n=40 -> sur = 43//40 = 1
        assert got[0]["mean_sur"] == 1 and got[0]["n_tokens"] == 20
        # doc 2's tokens are outside vocab_k=1 -> capped surrogate
        assert got[2]["mean_sur"] == 1000 and got[2]["sur_total"] == 3000
        assert got[0]["mean_sur"] < got[2]["mean_sur"]


class TestCollocations:
    def test_planted_collocation_ranks_first(self, ray_session, tmp_path):
        """A bigram whose words only ever co-occur gets maximal lift; a
        bigram of independent common words ranks below it."""
        import pyarrow.parquet as pq_

        from ocr_ray.ops.corpus import collocations_pmi

        # "hong kong" always adjacent (6x); "the cat"/"the dog" mix freely
        docs = ["hong kong " * 6, "the cat the dog " * 3, "the cat the dog " * 3]
        pq_.write_table(
            pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": docs}),
            tmp_path / "documents.parquet",
        )
        out = collocations_pmi(str(tmp_path), min_support=5, top_k=10).to_pandas()
        assert out.iloc[0]["bigram"] == "hong kong"
        ranked = dict(zip(out.bigram, out.lift_e6))
        assert ranked["hong kong"] > ranked.get("the cat", 0) > 0


class TestVocabMg:
    def test_matches_exact_sibling(self):
        """Tiny fixture: each batch's distinct tokens fit in the 512
        counters, so no compress ever fires and the MG top-k equals the
        exact vocab_topk exactly (set AND counts)."""
        from ocr_ray.ops.corpus import vocab_topk, vocab_topk_mg

        sf = "/root/testdata/sf0.001"
        exact = {r["token"]: r["n"] for r in vocab_topk(sf).take_all()}
        approx = {r["token"]: r["n"] for r in vocab_topk_mg(sf).to_pylist()}
        assert approx == exact

    def test_planted_skew_never_overestimates(self):
        """Wide vocabulary forces compression; MG estimates are biased
        DOWN only (dual of the CMS test) and the heavy hitter survives
        with error bounded by total/k."""
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.ops.corpus import vocab_topk_mg_over

        docs = rd.from_arrow(
            pa.table(
                {
                    "text": pa.array(
                        ["hot " * 50 + f"rare{i} cold{i % 7}" for i in range(400)]
                    )
                }
            )
        )
        out = vocab_topk_mg_over(docs, top_k=5).to_pylist()
        truth = {"hot": 400 * 50, **{f"cold{j}": len(range(j, 400, 7)) for j in range(7)}}
        total = 400 * 52
        assert out[0]["token"] == "hot"
        assert out[0]["n"] <= truth["hot"]
        assert out[0]["n"] >= truth["hot"] - total // 512
        for r in out:
            if r["token"] in truth:
                assert r["n"] <= truth[r["token"]]  # misra-gries: biased down only

    def test_mg_summary_compress_bound(self):
        """The per-batch compress keeps at most k counters and subtracts
        exactly the (k+1)-th largest count from each survivor."""
        import numpy as np

        from ocr_ray.ops.corpus import _mg_summarize

        tokens = [f"t{i:03d}" for i in range(10)]
        counts = np.array([100, 90, 80, 70, 60, 50, 40, 30, 20, 10], dtype=np.int64)
        mg = _mg_summarize(tokens, counts, k=4)
        assert mg == {"t000": 40, "t001": 30, "t002": 20, "t003": 10}


class TestDocOovRates:
    def test_planted_coverage(self, tmp_path, ray_session):
        """Tokens outside the corpus top-k count as OOV; empty/NULL text is
        0/0/0; rates are floor basis points."""
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from ocr_ray.ops.corpus import doc_oov_rates

        # 'common' dominates; 'rare1/rare2' fall outside a top-1 vocab
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["common common common", "common rare1 rare2", "", None],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array([1] * 4, pa.int64()),
            }
        )
        pq_.write_table(t, tmp_path / "documents.parquet")
        rows = {r["doc_id"]: r for r in doc_oov_rates(str(tmp_path), vocab_k=1).take_all()}
        assert rows[1]["n_tokens"] == 3 and rows[1]["n_oov"] == 0 and rows[1]["oov_bp"] == 0
        assert rows[2]["n_tokens"] == 3 and rows[2]["n_oov"] == 2
        assert rows[2]["oov_bp"] == 10_000 * 2 // 3
        assert rows[3] == {"doc_id": 3, "n_tokens": 0, "n_oov": 0, "oov_bp": 0}
        assert rows[4] == {"doc_id": 4, "n_tokens": 0, "n_oov": 0, "oov_bp": 0}
