"""Weighted-Jaccard near-dup family (ops/wjaccard.py): exact postings-join
pairs vs brute force and the DuckDB mirror; ICWS estimator vs true J_w;
sketch-vs-exact survivor calibration."""

import os
from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray.ops.wjaccard import (
    DEDUP_WJACCARD_EXACT_SQL,
    _tokens,
    dedup_wjaccard_docs,
    dedup_wjaccard_exact,
    icws_signatures,
    weighted_near_dup_survivors,
    wjaccard_dup_pairs,
)

# near-dup pairs are planted at J_w >= 0.84 so the 16x8 LSH banding finds
# them with near-certain recall (a J=0.78 pair has a ~10% deterministic
# miss chance per hash draw — borderline pairs belong to the estimator
# test, not the component pin)
_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
    # ^ 1 of 12 tokens changed: J_w = 11/13 ~ 0.846
    (3, "completely different words entirely here"),
    (4, ""),  # empty
    (5, "   "),  # empty
    (6, "the " * 15 + "the"),  # tf-heavy: 'the' x16
    (7, "the " * 14 + "the cat"),  # 'the' x15 + cat: J_w = 15/17 ~ 0.882
    # (multiset similarity; SET Jaccard of their token sets would be 0.5 —
    # the weighted metric is doing real work here)
]


def _jw(a: str, b: str) -> float:
    ca, cb = Counter(_tokens(a)), Counter(_tokens(b))
    if not ca and not cb:
        return 1.0
    inter = sum(min(ca[t], cb.get(t, 0)) for t in ca)
    union = sum(ca.values()) + sum(cb.values()) - inter
    return inter / union if union else 1.0


def _table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in _DOCS], pa.int64()),
            "text": [x for _, x in _DOCS],
        }
    )


class TestExact:
    def test_pairs_vs_bruteforce(self, ray_session):
        ds = rd.from_arrow(_table()).materialize()
        got = sorted((r["a"], r["b"]) for r in wjaccard_dup_pairs(ds).take_all())
        want = sorted(
            (a, b)
            for a, xa in _DOCS
            for b, xb in _DOCS
            if a < b and xa.strip() and xb.strip() and _jw(xa, xb) >= 0.7
        )
        assert got == want
        assert (6, 7) in got  # the tf-heavy multiset pair

    def test_survivors_vs_sql(self, ray_session, tmp_path):
        t = _table()
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "text": t.column("text"),
                    "lang": ["en"] * len(_DOCS),
                    "source": ["s"] * len(_DOCS),
                    "n_chars": pa.array(
                        [len(x) for _, x in _DOCS], pa.int64()
                    ),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        want = sorted(r[0] for r in con.execute(DEDUP_WJACCARD_EXACT_SQL).fetchall())
        got = sorted(r["doc_id"] for r in dedup_wjaccard_exact(d).take_all())
        assert got == want
        # empty docs form one component; min id (4) survives, 5 loses
        assert 4 in got and 5 not in got

    def test_size_gate(self, ray_session, monkeypatch):
        import ocr_ray.ops.wjaccard as wj

        monkeypatch.setattr(wj, "_WJ_EXACT_MAX_DOCS", 3)
        with pytest.raises(ValueError, match="dedup_wjaccard_docs"):
            dedup_wjaccard_exact("/root/testdata/sf0.001")


class TestICWS:
    def test_estimator_tracks_jw(self, ray_session):
        ds = rd.from_arrow(_table()).materialize()
        sig = {
            r["doc_id"]: np.array(r["sig"])
            for r in icws_signatures(ds, n_perms=256).take_all()
        }
        for a, b in [(0, 1), (0, 2), (6, 7), (0, 3), (2, 6)]:
            est = float((sig[a] == sig[b]).mean())
            true = _jw(_DOCS[a][1], _DOCS[b][1])
            # K=256 -> std <= 0.031; 4-sigma bound
            assert abs(est - true) <= 0.125, (a, b, est, true)

    def test_survivors_planted(self, ray_session):
        ds = rd.from_arrow(_table()).materialize()
        surv = sorted(
            r["doc_id"] for r in weighted_near_dup_survivors(ds).take_all()
        )
        assert surv == [0, 3, 4, 6]  # min id per component

    def test_calibration_vs_exact_sf001(self, ray_session):
        sf = "/root/testdata/sf0.01"
        icws = {r["doc_id"] for r in dedup_wjaccard_docs(sf).take_all()}
        exact = {r["doc_id"] for r in dedup_wjaccard_exact(sf).take_all()}
        n = max(len(exact), 1)
        # sketch agrees with the exact sibling on >=95% of survivor
        # decisions (measured 98.2% at 128 perms when pinned)
        assert len(icws ^ exact) <= 0.05 * 500, (len(icws), len(exact))
