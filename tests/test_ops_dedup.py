"""Dedup operators: planted exact/near duplicates must collapse; distinct
docs must survive. MinHash is sanity-checked against the exact n-gram
Jaccard oracle."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.ops.dedup import (
    dedup_exact_docs,
    dedup_minhash_docs,
    dedup_simhash_docs,
    ngram_jaccard,
    simhash64,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the data pipeline "
    "streams arrow batches through the ray cluster with bounded backpressure "
    "and the extraction engine normalizes every turn of the transcript table "
    "meanwhile the partitioned sink commits one parquet file per partition "
    "with a manifest recording rows bytes errors and checksum for resume "
    "and the scheduler keeps every worker busy with balanced batch sizes"
)
_NEAR = _BASE.replace("lazy dog", "sleepy dog")
_OTHER = (
    "completely different content about cooking recipes and garden tools "
    "nothing in common with distributed execution or columnar formats at all "
    "just a pleasant afternoon of soup herbs bread butter and quiet rain"
)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [_BASE, _BASE, _NEAR, _OTHER, _OTHER + " extra tail words here"],
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_exact_dedup(docs_dir):
    got = sorted(r["doc_id"] for r in dedup_exact_docs(docs_dir).take_all())
    # doc 1 is an exact copy of doc 0 -> dropped; near-dups survive exact pass
    assert got == [0, 2, 3, 4]


def test_minhash_collapses_near_dups(docs_dir):
    # oracle check first: the planted pair really is above threshold
    assert ngram_jaccard(_BASE, _NEAR) >= 0.7
    assert ngram_jaccard(_BASE, _OTHER) < 0.2
    surv = sorted(dedup_minhash_docs(docs_dir).column("doc_id").to_pylist())
    assert 0 in surv  # min id is the component representative
    assert 1 not in surv  # exact copy collapsed
    assert 2 not in surv  # near-dup collapsed
    assert 3 in surv  # unrelated survives


def test_simhash_collapses_near_dups(docs_dir):
    h_base, h_near = simhash64(_BASE), simhash64(_NEAR)
    assert bin(h_base ^ h_near).count("1") <= 3
    surv = sorted(dedup_simhash_docs(docs_dir).column("doc_id").to_pylist())
    assert 0 in surv and 1 not in surv
    assert 3 in surv


def test_minhash_deterministic(docs_dir):
    a = dedup_minhash_docs(docs_dir).column("doc_id").to_pylist()
    b = dedup_minhash_docs(docs_dir).column("doc_id").to_pylist()
    assert a == b


def test_jaccard_dedup(docs_dir):
    from ocr_ray.ops.dedup import dedup_jaccard_docs

    surv = sorted(dedup_jaccard_docs(docs_dir).column("doc_id").to_pylist())
    assert 0 in surv and 1 not in surv and 2 not in surv
    assert 3 in surv
