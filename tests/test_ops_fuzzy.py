"""Fuzzy ED<=1 self-join (ocr_ray/ops/fuzzy.py): kernel exactness vs a DP
reference, oracle parity on the fixture, planted-pair recall, and hostile
inputs (NULLs, empty strings, over-length names, hot identical strings)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_ray.ops.fuzzy import (
    _MAX_NAME_LEN,
    ed_le1_dist,
    ensure_names,
    fuzzy_name_pairs,
    fuzzy_name_pairs_over,
    fuzzy_name_pairs_sql,
)


def _dp(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    D = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, D[0] = D[0], i
        for j in range(1, lb + 1):
            cur = min(D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, D[j] = D[j], cur
    return D[lb]


class TestKernel:
    def test_fuzz_vs_dp(self):
        import random

        random.seed(11)
        alpha = "abcd"
        cases = []
        for _ in range(1500):
            s = "".join(random.choice(alpha) for _ in range(random.randint(0, 7)))
            t = list(s)
            op = random.choice(["same", "sub", "ins", "del", "rand"])
            if op == "sub" and s:
                t[random.randrange(len(s))] = random.choice(alpha)
            elif op == "ins":
                t.insert(random.randint(0, len(s)), random.choice(alpha))
            elif op == "del" and s:
                del t[random.randrange(len(s))]
            elif op == "rand":
                t = list("".join(random.choice(alpha) for _ in range(random.randint(0, 7))))
            cases.append((s, "".join(t)))
        got = ed_le1_dist(
            np.array([c[0] for c in cases], object), np.array([c[1] for c in cases], object)
        )
        for (s, t), g in zip(cases, got):
            d = _dp(s, t)
            assert g == (d if d <= 1 else -1), (s, t)

    def test_edges(self):
        a = np.array(["", "", "a", "ab", "ab"], object)
        b = np.array(["", "a", "", "ba", "abc"], object)
        assert ed_le1_dist(a, b).tolist() == [0, 1, 1, -1, 1]


class TestOracleParity:
    def test_sf0001(self, ray_session):
        import duckdb

        sf = "/root/testdata/sf0.001"
        got = fuzzy_name_pairs(sf).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        want = (
            duckdb.sql(fuzzy_name_pairs_sql(sf)).df().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_planted_recall(self, ray_session):
        """Every 13th base row has an ED-1 typo twin at id n+i, every 31st an
        exact twin at 2n+i — ALL of them must be recovered (recall guarantee,
        not a probabilistic claim)."""
        n = 800
        path = ensure_names(n)
        got = fuzzy_name_pairs("/root/testdata/sf0.001").to_pandas()
        pairs = set(zip(got.id_a, got.id_b))
        dists = dict(zip(zip(got.id_a, got.id_b), got.dist))
        for i in range(0, n, 13):
            assert (i, n + i) in pairs, f"typo twin {i} missed"
            assert dists[(i, n + i)] == 1
        for i in range(0, n, 31):
            assert (i, 2 * n + i) in pairs, f"exact twin {i} missed"
            assert dists[(i, 2 * n + i)] == 0


class TestHostile:
    def test_nulls_and_empties(self, ray_session):
        t = pa.table(
            {
                "id": pa.array([1, 2, None, 4, 5, 6], pa.int64()),
                "name": pa.array(["abc", "abd", "xxx", None, "", "a"], pa.string()),
            }
        )
        got = fuzzy_name_pairs_over(rd.from_arrow(t)).to_pandas()
        pairs = set(zip(got.id_a, got.id_b))
        assert (1, 2) in pairs  # sub
        assert (5, 6) in pairs  # "" vs "a": insertion
        assert all(3 not in p and 4 not in p for p in pairs)

    def test_long_names_dropped(self, ray_session):
        long = "x" * (_MAX_NAME_LEN + 10)
        t = pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array([long, long, "ok", "ok"], pa.string()),
            }
        )
        got = fuzzy_name_pairs_over(rd.from_arrow(t)).to_pandas()
        assert set(zip(got.id_a, got.id_b)) == {(3, 4)}

    def test_hot_identical_string_capped(self, ray_session):
        """A corpus-common identical string exceeding the signature-group cap
        must not explode quadratically; survivors still pair up."""
        from ocr_ray.ops.fuzzy import _SIG_GROUP_CAP

        n = _SIG_GROUP_CAP + 50
        t = pa.table(
            {
                "id": pa.array(list(range(n)), pa.int64()),
                "name": pa.array(["same-name"] * n, pa.string()),
            }
        )
        got = fuzzy_name_pairs_over(rd.from_arrow(t)).to_pandas()
        # capped: pairs among the first _SIG_GROUP_CAP ids only
        assert len(got) == _SIG_GROUP_CAP * (_SIG_GROUP_CAP - 1) // 2
        assert (got.dist == 0).all()
