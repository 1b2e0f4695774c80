"""Distributed PageRank: planted hand-computed graph + fixture determinism."""

import pyarrow as pa
import ray.data as rd

from ocr_ray.ops.graph import _INIT, ensure_graph, pagerank


import pytest


@pytest.mark.parametrize(
    "tier_kwargs",
    [
        {},  # local-solve tier (default gates)
        {"local_edges_max": 0},  # broadcast tier
        {"local_edges_max": 0, "broadcast_nodes_max": 0},  # distributed tier
    ],
    ids=["local", "broadcast", "distributed"],
)
def test_pagerank_star_hand_computed(tier_kwargs):
    """Star 1,2,3 -> 0, out_deg 1 each, INIT 1e9 — all three size-gated
    tiers (local solve / broadcast iterations / hash-join shuffle).

    r1(0) = 1.5e8 + 85*(3e9)//100 = 2_700_000_000; leaves = 1.5e8.
    r2(0) = 1.5e8 + 85*(3*1.5e8)//100 = 532_500_000 (leaf ranks feed back).
    r3(0) = r2(0) since leaf ranks are stationary."""
    edges = pa.table({"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([0, 0, 0], pa.int64())})
    got = {
        r["node"]: r["pr"]
        for r in pagerank(rd.from_arrow(edges), iters=3, **tier_kwargs).take_all()
    }
    assert got[0] == 532_500_000
    assert got[1] == got[2] == got[3] == 150_000_000


def test_pagerank_paths_identical():
    """Broadcast-gated and distributed paths are bit-identical on a graph
    with hubs, chains and dangling nodes."""
    import numpy as np

    rs = np.random.RandomState(3)
    src = rs.randint(0, 60, size=300).astype("int64")
    dst = rs.randint(0, 60, size=300).astype("int64")
    m = src != dst
    edges = pa.table({"src": src[m], "dst": dst[m]})
    a = {r["node"]: r["pr"] for r in pagerank(rd.from_arrow(edges), iters=2).take_all()}
    b = {
        r["node"]: r["pr"]
        for r in pagerank(
            rd.from_arrow(edges), iters=2, local_edges_max=0, broadcast_nodes_max=0
        ).take_all()
    }
    c = {
        r["node"]: r["pr"]
        for r in pagerank(rd.from_arrow(edges), iters=2, local_edges_max=0).take_all()
    }
    assert a == b == c


def test_pagerank_duplicate_edges_ignored():
    """Edge dedup: a repeated edge must not double its contribution."""
    edges = pa.table(
        {"src": pa.array([1, 1, 2], pa.int64()), "dst": pa.array([0, 0, 0], pa.int64())}
    )
    got = {r["node"]: r["pr"] for r in pagerank(rd.from_arrow(edges), iters=1).take_all()}
    # two distinct in-edges, each share INIT//1
    assert got[0] == 150_000_000 + 85 * (2 * _INIT) // 100


def test_graph_fixture_deterministic(tmp_path):
    p1 = ensure_graph(500, seed=5, root=str(tmp_path / "a"))
    p2 = ensure_graph(500, seed=5, root=str(tmp_path / "b"))
    t1, t2 = pa.parquet.read_table(p1), pa.parquet.read_table(p2)
    assert t1.equals(t2)
    assert t1.num_rows > 500


class TestConnectedComponents:
    def test_ring_fixture_ground_truth(self):
        """Ring-of-16 fixture: component label of node i is (i//16)*16."""
        from ocr_ray.ops.graph import connected_components_graph

        got = {
            r["node"]: r["label"]
            for r in connected_components_graph("/root/testdata/sf0.001").take_all()
        }
        assert len(got) == 1000
        for node, label in got.items():
            assert label == (node // 16) * 16

    def test_distributed_rounds_match_local(self, monkeypatch):
        """Force the Pregel-style min-label rounds (gate=0) and compare to
        the local union-find path on the same fixture."""
        import ocr_ray.ops.dedup as dedup
        from ocr_ray.ops.graph import ensure_cc_graph
        from ocr_ray.ops.dedup import propagate_min_labels

        path = ensure_cc_graph(200, group=8)
        pairs = rd.read_parquet(path).rename_columns({"src": "a", "dst": "b"})
        local = {r["node"]: r["label"] for r in propagate_min_labels(pairs).take_all()}
        monkeypatch.setattr(dedup, "_LOCAL_CC_MAX_EDGES", 0)
        pairs2 = rd.read_parquet(path).rename_columns({"src": "a", "dst": "b"})
        dist = {r["node"]: r["label"] for r in propagate_min_labels(pairs2).take_all()}
        assert local == dist


class TestTriangleCount:
    def test_hand_computed(self):
        """K4 minus one edge = 2 triangles; direction/duplicates ignored."""
        from ocr_ray.ops.graph import triangle_count

        # K4 on {0,1,2,3} without edge (2,3): triangles 012 and 013
        src = [0, 0, 0, 1, 1, 1]  # includes a duplicate + a reversed edge
        dst = [1, 2, 3, 2, 3, 0]
        edges = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        got = triangle_count(rd.from_arrow(edges)).take_all()
        assert got == [{"n_triangles": 2}]

    def test_tiers_identical(self):
        """Local numpy tier == distributed wedge-join tier on a hubby graph."""
        import numpy as np

        from ocr_ray.ops.graph import triangle_count

        rs = np.random.RandomState(11)
        src = rs.randint(0, 80, size=600).astype("int64")
        dst = rs.randint(0, 80, size=600).astype("int64")
        edges = pa.table({"src": src, "dst": dst})
        a = triangle_count(rd.from_arrow(edges)).take_all()
        b = triangle_count(rd.from_arrow(edges), local_edges_max=0).take_all()
        assert a == b
        assert a[0]["n_triangles"] > 0

    def test_empty_and_triangle_free(self):
        from ocr_ray.ops.graph import triangle_count

        empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        assert triangle_count(rd.from_arrow(empty)).take_all() == [{"n_triangles": 0}]
        # path graph 0-1-2-3: no triangles
        path = pa.table(
            {"src": pa.array([0, 1, 2], pa.int64()), "dst": pa.array([1, 2, 3], pa.int64())}
        )
        assert triangle_count(rd.from_arrow(path)).take_all() == [{"n_triangles": 0}]
        assert triangle_count(rd.from_arrow(path), local_edges_max=0).take_all() == [
            {"n_triangles": 0}
        ]


class TestBfsHops:
    def test_hand_computed_levels(self):
        """Chain with a shortcut: dist honors the SHORTEST path, direction
        respected, unreachable nodes absent."""
        from ocr_ray.ops.graph import bfs_hops

        # 0->1->2->3, shortcut 0->3, disconnected 9->10, reverse-only 4->0
        edges = pa.table(
            {
                "src": pa.array([0, 1, 2, 0, 9, 4], pa.int64()),
                "dst": pa.array([1, 2, 3, 3, 10, 0], pa.int64()),
            }
        )
        got = {r["node"]: r["dist"] for r in bfs_hops(rd.from_arrow(edges)).take_all()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 1}

    def test_tiers_identical_and_hop_cap(self):
        import numpy as np

        from ocr_ray.ops.graph import bfs_hops

        rs = np.random.RandomState(7)
        src = rs.randint(0, 120, size=500).astype("int64")
        dst = rs.randint(0, 120, size=500).astype("int64")
        edges = pa.table({"src": src, "dst": dst})
        a = {r["node"]: r["dist"] for r in bfs_hops(rd.from_arrow(edges), max_hops=3).take_all()}
        b = {
            r["node"]: r["dist"]
            for r in bfs_hops(
                rd.from_arrow(edges), max_hops=3, local_edges_max=0
            ).take_all()
        }
        assert a == b
        assert max(a.values()) <= 3 and a[0] == 0


class TestSsspWeighted:
    def test_cheap_multihop_beats_expensive_edge(self):
        """Weights are endpoint-derived: pick endpoints so a 2-edge path is
        cheaper than the direct edge, and assert relaxation prefers it."""
        from ocr_ray.ops.graph import _edge_weights, sssp_weighted
        import numpy as np

        src = np.array([0, 0, 5], np.int64)
        dst = np.array([9, 5, 9], np.int64)
        w = _edge_weights(src, dst)
        direct = int(w[0])
        via = int(w[1] + w[2])
        got = {
            r["node"]: r["dist"]
            for r in sssp_weighted(
                rd.from_arrow(pa.table({"src": src, "dst": dst}))
            ).take_all()
        }
        assert got[0] == 0
        assert got[9] == min(direct, via)
        assert got[5] == int(w[1])

    def test_tiers_identical_and_round_cap(self):
        import numpy as np

        from ocr_ray.ops.graph import sssp_weighted

        rs = np.random.RandomState(11)
        src = rs.randint(0, 120, size=500).astype("int64")
        dst = rs.randint(0, 120, size=500).astype("int64")
        edges = pa.table({"src": src, "dst": dst})
        a = {
            r["node"]: r["dist"]
            for r in sssp_weighted(rd.from_arrow(edges), rounds=3).take_all()
        }
        b = {
            r["node"]: r["dist"]
            for r in sssp_weighted(
                rd.from_arrow(edges), rounds=3, local_edges_max=0
            ).take_all()
        }
        assert a == b and a[0] == 0


class TestReciprocity:
    def test_hand_graph_and_tier_parity(self):
        import numpy as np

        from ocr_ray.ops.graph import graph_reciprocity

        # 0<->1 mutual; 0->2 one-way; 2->2 loop dropped; dup edge collapses
        edges = pa.table(
            {
                "src": pa.array([0, 1, 0, 2, 0], pa.int64()),
                "dst": pa.array([1, 0, 2, 2, 1], pa.int64()),
            }
        )
        a = graph_reciprocity(rd.from_arrow(edges)).take_all()[0]
        assert a == {"n_edges": 3, "n_mutual": 2}
        b = graph_reciprocity(rd.from_arrow(edges), local_edges_max=0).take_all()[0]
        assert b == a


class TestGraphKcore:
    def _edges(self, pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], pa.int64()),
                    "dst": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    def test_chain_peels_away_clique_survives(self, ray_session):
        from ocr_ray.ops.graph import graph_kcore

        # 4-clique (nodes 0-3, every pair) + a chain 3-10-11-12: the chain
        # peels off under k=3 round by round; the clique survives with deg 3
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        chain = [(3, 10), (10, 11), (11, 12)]
        out = {
            r["node"]: r["deg"]
            for r in graph_kcore(self._edges(clique + chain), k=3, rounds=6).take_all()
        }
        assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_bounded_rounds_contract(self, ray_session):
        from ocr_ray.ops.graph import graph_kcore

        # a long chain needs one round per tail node; rounds=1 only strips
        # the outermost layer -- the bounded-round semantics are the spec
        chain = [(i, i + 1) for i in range(6)]
        one = {r["node"] for r in graph_kcore(self._edges(chain), k=2, rounds=1).take_all()}
        assert one == {1, 2, 3, 4, 5}  # endpoints 0 and 6 stripped
        full = graph_kcore(self._edges(chain), k=2, rounds=6).take_all()
        assert full == []  # a chain has no 2-core

    def test_tiers_identical(self, ray_session):
        import numpy as np

        from ocr_ray.ops.graph import ensure_graph, graph_kcore

        path = ensure_graph(1000)
        ds = rd.read_parquet(path)
        a = graph_kcore(ds).to_pandas().sort_values("node").reset_index(drop=True)
        b = (
            graph_kcore(rd.read_parquet(path), local_edges_max=0)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        # fixture reaches fixpoint within the contract rounds: every
        # surviving degree is >= k
        assert (a["deg"] >= 3).all()
