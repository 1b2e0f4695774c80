"""Distributed PageRank — the iterative-algorithm family.

Web-scale corpus pipelines rank pages/domains to use link authority as a
quality prior (the reference's per-document pipeline has no graph ops; this
is part of the beyond-reference training-data surface, like dedup/ANN).
PageRank is the canonical iterative dataflow: each iteration is

    share(src)   = rank(src) // out_deg(src)          (per-edge map)
    inbound(dst) = SUM share over in-edges            (groupby shuffle)
    rank'(node)  = BASE + (85 * inbound(node)) // 100 (damping 0.85)

expressed here as two hash joins + one groupby per iteration over plain
Datasets — no driver-side graph state; ranks and edges stay distributed.

Determinism: all arithmetic is int64 fixed-point (INIT = 1e9 per node) —
integer sums are reduction-order independent, so results are bit-identical
under any partitioning AND match the DuckDB oracle (K chained CTEs doing
the identical integer math). Floor vs trunc division never diverges because
every operand is non-negative. Dangling-node mass is dropped (not
redistributed) on BOTH sides — documented spec, not an accident.

Scale notes (100 TB / 10^9 nodes):
* Each iteration re-shuffles the edge list. The production layout keeps
  edges hash-bucketed by src on storage (write once via the partitioned
  sink) and ranks co-partitioned, making the rank join co-located; the
  groupby(dst) exchange is then the only all-to-all per iteration — the
  same plan Pregel/GraphX run.
* With INIT = 1e9, total rank mass is n_nodes * 1e9 < 2^63 up to ~9e9
  nodes; shrink INIT for larger graphs.
* A long lazy chain of K iterations should checkpoint ranks to Parquet
  every few iterations (the resumable sink) so lineage doesn't grow
  unboundedly; at K=3 test scale the chain is fine.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

_INIT = 1_000_000_000
_BASE = 150_000_000  # (1 - 0.85) * INIT


def pagerank(
    edges: Dataset,
    *,
    iters: int = 3,
    num_partitions: int | None = None,
    broadcast_nodes_max: int = 2_000_000,
    local_edges_max: int = 30_000_000,
) -> Dataset:
    """PageRank over an ``(src: int64, dst: int64)`` edge Dataset.

    Returns ``(node, pr)`` for every node appearing as src or dst. The edge
    list is deduplicated first (simple graph), via groupby — never a driver
    set.

    Size-gated plan (the repo's established pattern — see the local-CC gate
    in ops.dedup): when the NODE table fits comfortably in memory
    (<= ``broadcast_nodes_max``; the edge list can still be arbitrarily
    large), each iteration is ONE broadcast map pass over the distributed
    edges — ranks ship via ray.put, per-batch contributions reduce to
    sparse (dst, sum) int64 partials, the driver combines exactly — zero
    shuffles per iteration. Above the gate, the fully distributed plan runs:
    per-iteration edge x rank hash join + groupby(dst) contribution shuffle.

    Distributed path: each iteration's ranks are materialized before the
    next begins — (a) it is the checkpoint cadence the 100 TB run needs
    anyway (swap materialize for the resumable sink), and (b) a fully lazy
    K-iteration chain puts ~3K hash-shuffle operators in ONE streaming
    topology, whose aggregator actors can exceed a small cluster's CPUs and
    deadlock the scheduler (observed at num_cpus=4)."""
    from ocr_ray.functions.joins import hash_join
    from ocr_ray.ops.dedup import _coerce_schema

    # Tier 1 — LOCAL solve: if the DEDUPED edge list fits the driver gate,
    # every Ray groupby here (edge dedup, out-degree, node set) is pure
    # fixed-overhead: three sort-shuffle Aggregates over the edge list cost
    # ~150 s at 6M edges while the actual PageRank arithmetic is ~1 s of
    # numpy. Stream the edges once, dedup driver-side (uint64 pair keys),
    # solve locally — bit-identical by construction. Falls through (and
    # re-reads) if the gate or the id range is exceeded.
    if local_edges_max > 0:
        local = _collect_edges_gated(edges, local_edges_max)
        if local is not None:
            src, dst = local
            return _pagerank_local(src, dst, iters=iters)

    auto_parts = num_partitions is None
    if auto_parts:
        num_partitions = 4  # provisional for the dedup shuffle; resized below

    # _coerce_schema: Ray 2.49 hash-shuffle ops emit empty partitions as
    # zero-column blocks, which a downstream Dataset.join rejects
    # ("No match for FieldRef") — repartition+cast absorbs them.
    # Self-loops are dropped in EVERY tier (the local tier always did; the
    # spec is: a page does not vote for itself) — and in the SQL oracle.
    i64 = pa.int64()
    edges = edges.filter(expr="src != dst")
    edges = _coerce_schema(
        edges.groupby(["src", "dst"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"]),
        pa.schema([("src", i64), ("dst", i64)]),
        parts=num_partitions,
    ).materialize()  # reused every iteration: dedup once, not K times
    if auto_parts:
        # size the per-iteration shuffles from the (now known) edge count:
        # every hash-shuffle op spins num_partitions aggregator actors — a
        # fixed ~1 s cost each that dominates small graphs (measured 37 s ->
        # 12 s at 120k edges going 16 -> 3 partitions); large graphs get
        # ~200k edges per partition up to a CPU-bounded cap.
        try:
            import ray

            cap = max(2, min(64, int(ray.cluster_resources().get("CPU", 8)) // 2))
        except Exception:
            cap = 4
        num_partitions = max(2, min(cap, edges.count() // 200_000 + 2))
    deg = _coerce_schema(
        edges.groupby("src").aggregate(Count(alias_name="d")),
        pa.schema([("src", i64), ("d", i64)]),
        parts=num_partitions,
    ).materialize()
    nodes = _coerce_schema(
        edges.select_columns(["src"])
        .rename_columns({"src": "node"})
        .union(edges.select_columns(["dst"]).rename_columns({"dst": "node"}))
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"]),
        pa.schema([("node", i64)]),
        parts=num_partitions,
    ).materialize()

    n_nodes = nodes.count()
    if n_nodes <= broadcast_nodes_max:
        return _pagerank_broadcast(edges, deg, nodes, iters=iters)

    def init(t: pa.Table) -> pa.Table:
        return t.append_column("pr", pa.array(np.full(t.num_rows, _INIT, np.int64)))

    ranks = nodes.map_batches(init, batch_format="pyarrow")

    for _ in range(iters):
        shares = hash_join(
            edges, ranks, on="src", right_on="node", num_partitions=num_partitions
        )
        shares = hash_join(shares, deg, on="src", num_partitions=num_partitions)

        def mk_share(t: pa.Table) -> pa.Table:
            return pa.table(
                {"dst": t.column("dst"), "share": pc.divide(t.column("pr"), t.column("d"))}
            )

        inbound = _coerce_schema(
            shares.map_batches(mk_share, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("share", alias_name="s")),
            pa.schema([("dst", i64), ("s", i64)]),
            parts=num_partitions,
        )
        joined = hash_join(
            nodes,
            inbound,
            on="node",
            right_on="dst",
            how="left_outer",
            num_partitions=num_partitions,
        )

        def nxt(t: pa.Table) -> pa.Table:
            s = pc.coalesce(t.column("s"), pa.scalar(0, pa.int64()))
            pr = pc.add(
                pa.scalar(_BASE, pa.int64()),
                pc.divide(
                    pc.multiply(pa.scalar(85, pa.int64()), s), pa.scalar(100, pa.int64())
                ),
            )
            return pa.table({"node": t.column("node"), "pr": pr})

        ranks = joined.map_batches(nxt, batch_format="pyarrow").materialize()
    return ranks


def _collect_edges_gated(edges: Dataset, gate: int) -> tuple | None:
    """Stream the edge Dataset once, deduplicating driver-side via uint64
    pair keys (src * 2^32 + dst — requires ids < 2^32, checked). Returns
    (src, dst) int64 arrays of DISTINCT non-self edges, or None if the
    running distinct count exceeds ``gate`` or ids overflow (caller then
    runs the distributed plan; the abandoned pass cost one read)."""
    import ray as _ray

    keys_parts: list[np.ndarray] = []
    total = 0
    # zero-copy block access (the _local_components pattern): blocks are
    # already Arrow in the object store; avoids a Project re-execution and
    # per-batch slicing through iter_batches
    for ref in edges.to_arrow_refs():
        b = _ray.get(ref)
        if b.num_rows == 0:
            continue
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        if s.size and (
            s.min() < 0 or d.min() < 0 or s.max() >= 1 << 32 or d.max() >= 1 << 32
        ):
            return None
        k = np.unique((s.astype(np.uint64) << np.uint64(32)) | d.astype(np.uint64))
        keys_parts.append(k)
        total += len(k)
        if total > 4 * gate:  # early abort long before driver memory matters
            return None
    if not keys_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    keys = np.unique(np.concatenate(keys_parts))
    if len(keys) > gate:
        return None
    src = (keys >> np.uint64(32)).astype(np.int64)
    dst = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    m = src != dst
    return src[m], dst[m]


def _pagerank_local(src: np.ndarray, dst: np.ndarray, *, iters: int) -> Dataset:
    """Exact local solve over a deduped edge list (gate-bounded): identical
    int64 fixed-point arithmetic as the distributed plan and the oracle
    (integer sums are reduction-order independent, so the edge reorder
    below cannot change a single bit). r4 prelude slim-down mirroring the
    triangle tier: one unique/return_inverse instead of two searchsorted
    passes, a packed-uint64 sort instead of argsort, and the src indices
    pre-ordered ONCE so each iteration gathers 1x, not 2x."""
    m = len(src)
    node_ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:m], inv[m:]
    deg = np.bincount(si, minlength=len(node_ids)).astype(np.int64)
    ranks = np.full(len(node_ids), _INIT, np.int64)
    packed = (di.astype(np.uint64) << np.uint64(32)) | si.astype(np.uint64)
    packed.sort()
    di_s = (packed >> np.uint64(32)).astype(np.int64)
    si_s = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    starts = (
        np.concatenate(([0], np.flatnonzero(np.diff(di_s)) + 1))
        if len(di_s)
        else np.zeros(0, np.int64)
    )
    dst_heads = di_s[starts.astype(np.int64)] if len(di_s) else starts
    for _ in range(iters):
        shares = np.where(deg > 0, ranks // np.maximum(deg, 1), 0)
        inbound = np.zeros(len(node_ids), np.int64)
        if len(di_s):
            inbound[dst_heads] = np.add.reduceat(shares[si_s], starts)
        ranks = _BASE + (85 * inbound) // 100
    return rd.from_arrow(pa.table({"node": pa.array(node_ids), "pr": pa.array(ranks)}))


def _pagerank_broadcast(edges: Dataset, deg: Dataset, nodes: Dataset, *, iters: int) -> Dataset:
    """Node-table-fits gate: per iteration, broadcast the per-src share
    vector once (ray.put; plasma-local per worker thereafter) and stream the
    edges through one map pass. Per-batch contributions are reduced to
    sparse (dst_pos, sum) via argsort + add.reduceat — all int64, exact, so
    the result is bit-identical to the distributed path and the SQL oracle.

    Driver holds three node-sized int64 arrays (16 MB at the 2M gate); the
    edge list streams and is never collected."""
    import ray

    node_ids = np.sort(nodes.to_pandas()["node"].to_numpy().astype(np.int64))
    n = len(node_ids)
    deg_pd = deg.to_pandas()
    deg_arr = np.zeros(n, np.int64)
    deg_arr[np.searchsorted(node_ids, deg_pd["src"].to_numpy().astype(np.int64))] = (
        deg_pd["d"].to_numpy().astype(np.int64)
    )
    ids_ref = ray.put(node_ids)
    ranks = np.full(n, _INIT, np.int64)

    for _ in range(iters):
        shares = np.where(deg_arr > 0, ranks // np.maximum(deg_arr, 1), 0)
        sh_ref = ray.put(shares)

        def contrib(t: pa.Table, _ids=ids_ref, _sh=sh_ref) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"i": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
            ids = ray.get(_ids)
            sh = ray.get(_sh)
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            s = sh[np.searchsorted(ids, src)]
            di = np.searchsorted(ids, dst)
            order = np.argsort(di, kind="stable")
            di_s, s_s = di[order], s[order]
            starts = np.concatenate(([0], np.flatnonzero(np.diff(di_s)) + 1))
            return pa.table(
                {
                    "i": pa.array(di_s[starts]),
                    "s": pa.array(np.add.reduceat(s_s, starts)),
                }
            )

        inbound = np.zeros(n, np.int64)
        for b in edges.map_batches(contrib, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            np.add.at(
                inbound,
                b.column("i").to_numpy(zero_copy_only=False),
                b.column("s").to_numpy(zero_copy_only=False),
            )
        ranks = _BASE + (85 * inbound) // 100

    import ray.data as _rd

    return _rd.from_arrow(pa.table({"node": pa.array(node_ids), "pr": pa.array(ranks)}))


# ---------------------------------------------------------------------------
# deterministic graph fixture (power-law-ish web graph)
# ---------------------------------------------------------------------------


def ensure_graph(
    n_nodes: int, avg_deg: int = 6, seed: int = 5, root: str = "/tmp/ocr_ray_fixtures"
) -> str:
    """Seeded synthetic directed graph parquet: geometric out-degrees
    (mean ``avg_deg``), squared-uniform targets (skewed in-degree — hubs),
    self-loops dropped. The oracle reads the identical file."""
    import pyarrow.parquet as pq

    path = os.path.join(root, f"graph_n{n_nodes}_d{avg_deg}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(seed)
    deg = 1 + rs.geometric(1.0 / avg_deg, size=n_nodes)
    src = np.repeat(np.arange(n_nodes, dtype=np.int64), deg)
    u = rs.random_sample(src.size)
    dst = (u * u * n_nodes).astype(np.int64)
    m = src != dst
    pq.write_table(pa.table({"src": src[m], "dst": dst[m]}), path + ".tmp")
    os.replace(path + ".tmp", path)
    return path


def _n_nodes_for_sf(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        return 4_000
    return {0.001: 1_000, 0.01: 4_000, 0.1: 20_000}.get(sf, 4_000)


def pagerank_graph(sf_dir: str) -> Dataset:
    """queries() entry: 3 PageRank iterations over the sf-scaled fixture."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return pagerank(rd.read_parquet(path), iters=3)


def pagerank_graph_sql(sf_dir: str) -> str:
    """DuckDB mirror: identical int64 fixed-point math, K chained CTEs."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    prev, body = "r0", ""
    for i in range(1, 4):
        body += f""",
r{i} AS (
  SELECT n.node,
         CAST({_BASE} + (85 * COALESCE(inb.s, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.pr // d.d) AS BIGINT) AS s
    FROM edges e JOIN {prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) inb ON n.node = inb.dst
)"""
        prev = f"r{i}"
    return f"""
WITH edges AS (SELECT DISTINCT src, dst FROM read_parquet('{path}') WHERE src <> dst),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
r0 AS (SELECT node, CAST({_INIT} AS BIGINT) AS pr FROM nodes){body}
SELECT node, pr FROM {prev}
"""


# ---------------------------------------------------------------------------
# connected components (first-class exposure of the dedup machinery)
# ---------------------------------------------------------------------------


def ensure_cc_graph(
    n_nodes: int, group: int = 16, root: str = "/tmp/ocr_ray_fixtures"
) -> str:
    """Deterministic multi-component fixture: nodes partitioned into rings
    of ``group`` consecutive ids plus one chord per ring — the ground-truth
    component of node i is exactly (i // group), label = ring minimum."""
    import pyarrow.parquet as pq

    path = os.path.join(root, f"ccgraph_n{n_nodes}_g{group}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    ids = np.arange(n_nodes, dtype=np.int64)
    grp = ids // group
    ring_next = np.where(
        ((ids + 1) // group == grp) & (ids + 1 < n_nodes), ids + 1, grp * group
    )
    src = [ids]
    dst = [ring_next]
    if group >= 4:  # one chord per ring: start -> midpoint
        starts = np.unique(grp) * group
        mids = np.minimum(starts + group // 2, n_nodes - 1)
        src.append(starts)
        dst.append(mids)
    s, d = np.concatenate(src), np.concatenate(dst)
    m = s != d
    pq.write_table(pa.table({"src": s[m], "dst": d[m]}), path + ".tmp")
    os.replace(path + ".tmp", path)
    return path


def connected_components_graph(sf_dir: str) -> Dataset:
    """queries() entry: undirected connected components over the ring
    fixture via the size-gated min-label machinery (local union-find below
    the edge gate, Pregel-style ``groupby.aggregate(Min)`` rounds above —
    ocr_ray.ops.dedup.propagate_min_labels, shared with the near-dup
    family). Output: (node, label), label = component minimum."""
    from ocr_ray.ops.dedup import propagate_min_labels

    path = ensure_cc_graph(_n_nodes_for_sf(sf_dir))
    pairs = rd.read_parquet(path).rename_columns({"src": "a", "dst": "b"})
    return propagate_min_labels(pairs)


def connected_components_graph_sql(sf_dir: str) -> str:
    """Recursive-CTE closure oracle: label(node) = min reachable node id."""
    path = ensure_cc_graph(_n_nodes_for_sf(sf_dir))
    return f"""
WITH RECURSIVE sym AS (
  -- self-loops kept: a node whose only edge is a self-loop is still a
  -- labeled endpoint in propagate_min_labels; (a,a) rows are harmless to
  -- min-reachability and keep the node sets identical
  SELECT src AS a, dst AS b FROM read_parquet('{path}')
  UNION
  SELECT dst AS a, src AS b FROM read_parquet('{path}')
),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM sym
  UNION
  SELECT reach.node, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
)
SELECT node, CAST(MIN(r) AS BIGINT) AS label FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered wedge plan, O(m^1.5) candidate bound)
# ---------------------------------------------------------------------------


def _canonical_edges(edges: Dataset) -> Dataset:
    """Distinct undirected edges as (a < b) int64 pairs; self-loops and NULL
    endpoints dropped. One groupby dedup shuffle over 16-byte rows."""
    from ocr_ray.ops.dedup import _coerce_schema

    i64 = pa.int64()

    def canon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("src")), pc.is_valid(t.column("dst"))))
        s, d = t.column("src"), t.column("dst")
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        out = pa.table({"a": pc.cast(a, i64), "b": pc.cast(b, i64)})
        return out.filter(pc.not_equal(out.column("a"), out.column("b")))

    canoned = edges.map_batches(canon, batch_format="pyarrow")
    return _coerce_schema(
        canoned.groupby(["a", "b"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"]),
        pa.schema([("a", i64), ("b", i64)]),
        parts=4,
    )


def _wedge_census(df) -> pa.Table:
    """Per-partition wedge generator for grouped_scan (pandas frame in):
    rows are oriented edges (src, dst) sorted here by (src, dst); within
    each src-run every neighbor pair (w1 < w2 in id order) is emitted via
    the offset-diagonal trick, then run-length-counted. Output (w1, w2, nw)
    partials — 24-byte rows, never the adjacency itself."""
    import pandas as pd

    df = df.sort_values(["src", "dst"])
    s = df["src"].to_numpy(np.int64)
    d = df["dst"].to_numpy(np.int64)
    a_l, b_l = [], []
    k = 1
    while k < len(s):
        m = s[:-k] == s[k:]
        if not m.any():
            break
        a_l.append(d[:-k][m])  # dst sorted within a src-run: w1 < w2
        b_l.append(d[k:][m])
        k += 1
    if not a_l:
        e = np.array([], np.int64)
        return pa.table({"w1": pa.array(e), "w2": pa.array(e), "nw": pa.array(e)})
    w1 = np.concatenate(a_l)
    w2 = np.concatenate(b_l)
    order = np.lexsort((w2, w1))
    w1, w2 = w1[order], w2[order]
    new = np.empty(len(w1), dtype=bool)
    new[0] = True
    np.not_equal(w1[1:], w1[:-1], out=new[1:])
    new[1:] |= w2[1:] != w2[:-1]
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(w1))).astype(np.int64)
    return pa.table(
        {"w1": pa.array(w1[starts]), "w2": pa.array(w2[starts]), "nw": pa.array(cnt)}
    )


def triangle_count(edges: Dataset, *, local_edges_max: int = 30_000_000) -> Dataset:
    """Exact triangle count over an (src, dst) edge Dataset, direction
    ignored. Returns one row ``(n_triangles: int64)``.

    Plan (the degree-ordered wedge algorithm — Schank/Wagner, the standard
    MapReduce triangle plan):
      1. canonicalize + dedup to undirected (a < b) edges;
      2. per-node degree (one groupby over endpoints);
      3. orient every edge from its lower-(degree, id) endpoint — each
         node's oriented out-degree is O(sqrt(m)), so the wedge count is
         bounded by O(m^1.5) REGARDLESS of hub skew (an unordered plan
         explodes quadratically on a hot node);
      4. co-locate oriented edges by src (coarse-key grouped_scan), emit
         per-partition wedge-census partials (w1, w2, nw);
      5. one groupby merges partials, a multi-key inner join against the
         canonical edge list keeps wedges that close into triangles;
         SUM(nw) is the answer.
    All exchanges carry fixed-width int64 rows; nothing is driver-side
    above the local tier. Below ``local_edges_max`` distinct edges the
    identical algorithm runs in numpy on the driver (the pagerank/CC
    size-gate pattern) — bit-identical by construction.
    """
    from ocr_ray.ops.dedup import _coerce_schema
    from ocr_ray.pipelines.conversation import grouped_scan

    i64 = pa.int64()

    def one_row(n: int) -> Dataset:
        return rd.from_arrow(pa.table({"n_triangles": pa.array([n], i64)}))

    if local_edges_max > 0:
        # collect the RAW edge stream (driver-side uint64 dedup — no Ray
        # groupby: the dedup shuffle alone costs ~2 min at 7M edges, the
        # same fixed cost the pagerank local tier avoids), canonicalize in
        # numpy after the gate
        local = _collect_edges_gated(edges, local_edges_max)
        if local is not None:
            s, d = local
            if len(s):
                lo = np.minimum(s, d).astype(np.uint64)
                hi = np.maximum(s, d).astype(np.uint64)
                keys = np.unique((lo << np.uint64(32)) | hi)
                a = (keys >> np.uint64(32)).astype(np.int64)
                b = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
            else:
                a = b = np.zeros(0, np.int64)
                keys = np.zeros(0, np.uint64)
            # keys is already the sorted canonical key array (np.unique)
            return one_row(_triangle_count_local(a, b, keys_sorted=keys))

    canon = _canonical_edges(edges).materialize()
    deg = _coerce_schema(
        canon.select_columns(["a"])
        .rename_columns({"a": "node"})
        .union(canon.select_columns(["b"]).rename_columns({"b": "node"}))
        .groupby("node")
        .aggregate(Count(alias_name="deg")),
        pa.schema([("node", i64), ("deg", i64)]),
        parts=4,
    )

    from ocr_ray.functions.joins import hash_join

    j = hash_join(canon, deg, on="a", right_on="node")
    j = j.rename_columns({"deg": "deg_a"})
    j = hash_join(j, deg, on="b", right_on="node").rename_columns({"deg": "deg_b"})

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "src": pa.array(np.where(a_first, a, b)),
                "dst": pa.array(np.where(a_first, b, a)),
            }
        )

    oriented = j.map_batches(orient, batch_format="pyarrow")
    wedges = _coerce_schema(
        grouped_scan(oriented, "src", _wedge_census)
        .groupby(["w1", "w2"])
        .aggregate(Sum("nw", alias_name="nw")),
        pa.schema([("w1", i64), ("w2", i64), ("nw", i64)]),
        parts=4,
    )
    # an all-empty census never passes through _coerce_schema's fix-up map
    # (map_batches skips empty blocks), so its zero-column blocks would
    # crash the multi-key join — and a triangle-free graph IS the answer 0
    wedges = wedges.materialize()
    if wedges.count() == 0:
        return one_row(0)
    closed = wedges.join(
        canon, join_type="inner", num_partitions=4, on=("w1", "w2"), right_on=("a", "b")
    )
    total = closed.sum("nw") or 0
    return one_row(int(total))


def _wedge_close_count(src: np.ndarray, dst: np.ndarray, keys: np.ndarray) -> int:
    """Closed-wedge count for a CONTIGUOUS slice of (src, dst)-sorted
    oriented edges (no src run split across slices): generate the slice's
    wedges via the offset-diagonal trick, then membership-count against
    the sorted canonical edge-key array. Pure numpy; runs either inline
    (small graphs) or as one orientation-partitioned Ray task."""
    w1_l, w2_l = [], []
    k = 1
    while k < len(src):
        m = src[:-k] == src[k:]
        if not m.any():
            break
        w1_l.append(dst[:-k][m])
        w2_l.append(dst[k:][m])
        k += 1
    if not w1_l:
        return 0
    w1 = np.concatenate(w1_l)
    w2 = np.concatenate(w2_l)
    probe = (np.minimum(w1, w2).astype(np.uint64) << np.uint64(32)) | np.maximum(
        w1, w2
    ).astype(np.uint64)
    probe.sort()  # near-sequential access into `keys` below
    idx = np.searchsorted(keys, probe)
    m = idx < len(keys)
    return int((keys[idx[m]] == probe[m]).sum())


# decoration is lazy-safe: ray.remote does not need an initialized Ray
# (only .remote() calls do, and the caller checks is_initialized first)
_TRI_PARALLEL_MIN = 1_000_000


import ray as _ray_mod


@_ray_mod.remote(num_cpus=1)
def _wedge_close_task(src, dst, keys):
    return _wedge_close_count(src, dst, keys)


def _triangle_count_local(
    a: np.ndarray, b: np.ndarray, keys_sorted: np.ndarray | None = None
) -> int:
    """Driver-tier triangle count over distinct canonical (a < b) edges
    (ids < 2^32, guaranteed by the collect gate) — the degree-ordered
    wedge algorithm. Above ``_TRI_PARALLEL_MIN`` edges the wedge
    generation + membership probes fan out as Ray tasks partitioned at
    src-run boundaries against ONE broadcast sorted edge-key array
    (VERDICT r3 #9: each wedge's membership probe runs co-located with
    its census partition — wedges never move). Serial prelude kept lean:
    degrees via one unique/inverse + bincount, orientation on RAW ids
    (canonical a < b already breaks degree ties toward a), ONE packed
    uint64 sort instead of a lexsort, and the caller can pass the
    already-sorted canonical key array to skip re-sorting. Measured
    19.6 s -> ~9 s end-to-end on the 7M-edge fixture at 32 CPUs."""
    if len(a) == 0:
        return 0
    m = len(a)
    _, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv)
    da, db = deg[inv[:m]], deg[inv[m:]]
    # orient low-(deg, id) -> high: canonical a < b, so the id tie-break
    # always picks a when degrees are equal
    a_first = da <= db
    srcu = np.where(a_first, a, b).astype(np.uint64)
    dstu = np.where(a_first, b, a).astype(np.uint64)
    packed = (srcu << np.uint64(32)) | dstu
    packed.sort()
    src = (packed >> np.uint64(32)).astype(np.int64)
    dst = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    keys = (
        keys_sorted
        if keys_sorted is not None
        else np.sort(
            (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        )
    )
    import ray as _ray

    if len(src) >= _TRI_PARALLEL_MIN and _ray.is_initialized():
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        parts = max(2, min(64, cpus))
        # cut ONLY at src-run starts so no run is split (the oriented
        # out-degree is O(sqrt(m)), so the largest run bounds imbalance)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        want = (np.arange(1, parts) * len(src)) // parts
        cutidx = starts[np.minimum(np.searchsorted(starts, want), len(starts) - 1)]
        cuts = np.unique(np.r_[0, cutidx, len(src)])
        keys_ref = _ray.put(keys)
        futs = [
            _wedge_close_task.remote(src[lo:hi], dst[lo:hi], keys_ref)
            for lo, hi in zip(cuts[:-1], cuts[1:])
            if hi > lo
        ]
        return int(sum(_ray.get(futs)))
    return _wedge_close_count(src, dst, keys)


def triangle_count_graph(sf_dir: str) -> Dataset:
    """queries() entry: exact triangle count of the sf-scaled web-graph
    fixture (direction ignored)."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return triangle_count(rd.read_parquet(path))


def triangle_count_graph_sql(sf_dir: str) -> str:
    """DuckDB mirror: canonical edge CTE + the textbook a<b<c three-way
    self-join — an INDEPENDENT plan (no wedge census) for the same count."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return f"""
WITH e AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM read_parquet('{path}') WHERE src <> dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


# ---------------------------------------------------------------------------
# BFS shortest hops (bounded Bellman-Ford relaxation rounds)
# ---------------------------------------------------------------------------

_BFS_SOURCE = 0
_BFS_MAX_HOPS = 6


def bfs_hops(
    edges: Dataset,
    *,
    source: int = _BFS_SOURCE,
    max_hops: int = _BFS_MAX_HOPS,
    local_edges_max: int = 30_000_000,
) -> Dataset:
    """Directed shortest hop-distance from ``source`` to every node
    reachable within ``max_hops``: (node, dist). The directional complement
    of connected components (min-label) — distance, not membership.

    Each round r relaxes: dist'(v) = min(dist(v), min over in-edges (u,v)
    of dist(u) + 1) — one hash join (edges x dists on src) plus one
    groupby-Min per round, ranks materialized per round (checkpoint cadence,
    same rationale as pagerank). After K rounds the result is EXACTLY the
    <= K-hop shortest distance, matching the bounded recursive-CTE oracle.
    Below the edge gate the identical relaxation runs locally in numpy."""
    from ocr_ray.functions.joins import hash_join
    from ocr_ray.ops.dedup import _coerce_schema
    from ray.data.aggregate import Min

    i64 = pa.int64()
    if local_edges_max > 0:
        local = _collect_edges_gated(edges, local_edges_max)
        if local is not None:
            src, dst = local
            return _bfs_local(src, dst, source=source, max_hops=max_hops)

    def drop_null_edges(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(pc.is_valid(t.column("src")), pc.is_valid(t.column("dst")))
        )

    edges = edges.map_batches(drop_null_edges, batch_format="pyarrow")
    dists = rd.from_arrow(
        pa.table({"node": pa.array([source], i64), "dist": pa.array([0], i64)})
    )
    for _ in range(max_hops):
        step = hash_join(edges, dists, on="src", right_on="node")

        def relax(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pc.cast(t.column("dst"), i64),
                    "dist": pc.add(t.column("dist"), pa.scalar(1, i64)),
                }
            )

        dists = _coerce_schema(
            dists.union(step.map_batches(relax, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist")),
            pa.schema([("node", i64), ("dist", i64)]),
            parts=4,
        ).materialize()
    return dists


def _bfs_local(
    src: np.ndarray, dst: np.ndarray, *, source: int, max_hops: int
) -> Dataset:
    """Driver-tier BFS levels over a deduped directed edge list."""
    n_dist: dict[int, int] = {int(source): 0}
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    frontier = np.array([source], np.int64)
    for r in range(1, max_hops + 1):
        lo = np.searchsorted(src_s, frontier, side="left")
        hi = np.searchsorted(src_s, frontier, side="right")
        nxt = [dst_s[a:b] for a, b in zip(lo, hi) if b > a]
        if not nxt:
            break
        cand = np.unique(np.concatenate(nxt))
        fresh = np.array([v for v in cand if int(v) not in n_dist], np.int64)
        for v in fresh:
            n_dist[int(v)] = r
        frontier = fresh
        if frontier.size == 0:
            break
    nodes = np.fromiter(n_dist.keys(), np.int64, len(n_dist))
    ds_ = np.fromiter(n_dist.values(), np.int64, len(n_dist))
    o = np.argsort(nodes)
    return rd.from_arrow(pa.table({"node": pa.array(nodes[o]), "dist": pa.array(ds_[o])}))


def bfs_hops_graph(sf_dir: str) -> Dataset:
    """queries() entry: <= 6-hop shortest distances from node 0 over the
    sf-scaled web-graph fixture."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return bfs_hops(rd.read_parquet(path))


def bfs_hops_graph_sql(sf_dir: str) -> str:
    """Bounded recursive-CTE oracle: UNION-deduped (node, dist) frontier,
    expansion stopped at max_hops, MIN(dist) per node."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst FROM read_parquet('{path}')
  WHERE src IS NOT NULL AND dst IS NOT NULL
),
d(node, dist) AS (
  SELECT CAST({_BFS_SOURCE} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node
  WHERE d.dist < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM d GROUP BY node
"""


# ---------------------------------------------------------------------------
# weighted shortest paths (bounded Bellman-Ford relaxation)
# ---------------------------------------------------------------------------

_SSSP_SOURCE = 0
_SSSP_ROUNDS = 4
_SSSP_WMOD = 9  # deterministic edge weight = 1 + (src*31 + dst*17) % 9


def _edge_weights(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic per-edge weight 1..9 from the endpoints — the same
    integer arithmetic is embedded in the SQL mirror, so both engines see
    identical weights without a weights column in the fixture."""
    return 1 + np.mod(src * 31 + dst * 17, _SSSP_WMOD)


def sssp_weighted(
    edges: Dataset,
    *,
    source: int = _SSSP_SOURCE,
    rounds: int = _SSSP_ROUNDS,
    local_edges_max: int = 30_000_000,
) -> Dataset:
    """WEIGHTED shortest distances from ``source`` using at most ``rounds``
    edges per path — Bellman-Ford relaxation, the weighted sibling of
    ``bfs_hops`` (hop counting can't prefer a cheap 3-edge path over an
    expensive single edge; relaxation can). After K rounds the result is
    EXACTLY min path cost over <= K-edge paths, which is what the bounded
    recursive-CTE oracle computes — so the gate is exact, not "converged".

    Distributed tier: each round is one hash join (edges x dists on src)
    + one groupby-Min — identical shuffle shape to bfs_hops/pagerank, per
    round traffic O(frontier x out-degree) keyed ints. Below the edge gate
    the same relaxation is two numpy gathers per round."""
    from ocr_ray.functions.joins import hash_join
    from ocr_ray.ops.dedup import _coerce_schema
    from ray.data.aggregate import Min

    i64 = pa.int64()
    if local_edges_max > 0:
        local = _collect_edges_gated(edges, local_edges_max)
        if local is not None:
            src, dst = local
            return _sssp_local(src, dst, source=source, rounds=rounds)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("src")), pc.is_valid(t.column("dst")))
        )
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "w": pa.array(_edge_weights(s, d), pa.int64()),
            }
        )

    wedges = edges.map_batches(prep, batch_format="pyarrow")
    dists = rd.from_arrow(
        pa.table({"node": pa.array([source], i64), "dist": pa.array([0], i64)})
    )
    for _ in range(rounds):
        step = hash_join(wedges, dists, on="src", right_on="node")

        def relax(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pc.cast(t.column("dst"), i64),
                    "dist": pc.add(t.column("dist"), t.column("w")),
                }
            )

        dists = _coerce_schema(
            dists.union(step.map_batches(relax, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist")),
            pa.schema([("node", i64), ("dist", i64)]),
            parts=4,
        ).materialize()
    return dists


def _sssp_local(
    src: np.ndarray, dst: np.ndarray, *, source: int, rounds: int
) -> Dataset:
    """Driver-tier bounded Bellman-Ford over a deduped edge list."""
    w = _edge_weights(src.astype(np.int64), dst.astype(np.int64))
    n = int(max(src.max(initial=source), dst.max(initial=source))) + 1
    INF = np.int64(2**62)
    dist = np.full(n, INF, np.int64)
    dist[source] = 0
    for _ in range(rounds):
        cand = dist[src]
        ok = cand < INF
        upd = cand[ok] + w[ok]
        nxt = dist.copy()
        np.minimum.at(nxt, dst[ok], upd)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    reach = np.flatnonzero(dist < INF)
    return rd.from_arrow(
        pa.table(
            {"node": pa.array(reach.astype(np.int64)), "dist": pa.array(dist[reach])}
        )
    )


def sssp_weighted_graph(sf_dir: str) -> Dataset:
    """queries() entry: <= 4-edge weighted shortest distances from node 0
    over the sf-scaled web-graph fixture (weights derived from endpoints)."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return sssp_weighted(rd.read_parquet(path))


def sssp_weighted_graph_sql(sf_dir: str) -> str:
    """Bounded recursive-CTE oracle carrying (node, dist, hops); identical
    endpoint-derived weights; MIN(dist) per node at the end."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst, 1 + (src * 31 + dst * 17) % {_SSSP_WMOD} AS w
  FROM read_parquet('{path}')
  WHERE src IS NOT NULL AND dst IS NOT NULL
),
d(node, dist, hops) AS (
  SELECT CAST({_SSSP_SOURCE} AS BIGINT), CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, d.dist + e.w, d.hops + 1 FROM d JOIN e ON e.src = d.node
  WHERE d.hops < {_SSSP_ROUNDS}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM d GROUP BY node
"""


# ---------------------------------------------------------------------------
# edge reciprocity (mutual-link share)
# ---------------------------------------------------------------------------


def graph_reciprocity(edges: Dataset, *, local_edges_max: int = 30_000_000) -> Dataset:
    """Reciprocity of a directed graph: of all distinct non-loop edges, how
    many have their reverse present — the mutual-link share that separates
    follow-graphs (~low) from friendship-graphs (1.0), and a one-line QA
    check on any edge ingest ("did we accidentally symmetrize?").

    Plan: distinct edges → join against their own reversal on the packed
    (src, dst) pair — keys only, never payloads. Below the edge gate the
    membership test is one sorted np.searchsorted over packed pairs."""
    import numpy as np

    if local_edges_max > 0:
        local = _collect_edges_gated(edges, local_edges_max)
        if local is not None:
            src, dst = local
            m = src != dst
            src, dst = src[m], dst[m]
            # canonical distinct pairs via packed views (ids are int64; pack
            # into structured sort for exactness at any magnitude)
            pairs = np.stack([src, dst], axis=1)
            pairs = np.unique(pairs, axis=0)
            fwd = pairs.view([("a", np.int64), ("b", np.int64)]).reshape(-1)
            rev = np.stack([pairs[:, 1], pairs[:, 0]], axis=1).view(
                [("a", np.int64), ("b", np.int64)]
            ).reshape(-1)
            fwd_sorted = np.sort(fwd)
            idx = np.searchsorted(fwd_sorted, rev)
            idx = np.minimum(idx, len(fwd_sorted) - 1) if len(fwd_sorted) else idx
            mutual = int((fwd_sorted[idx] == rev).sum()) if len(fwd_sorted) else 0
            n = int(len(pairs))
            return rd.from_arrow(
                pa.table(
                    {
                        "n_edges": pa.array([n], pa.int64()),
                        "n_mutual": pa.array([mutual], pa.int64()),
                    }
                )
            )

    from ray.data.aggregate import Count

    def distinct_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("src")), pc.is_valid(t.column("dst")))
        )
        t = t.filter(pc.not_equal(t.column("src"), t.column("dst")))
        return t.group_by(["src", "dst"]).aggregate([])

    dedup = (
        edges.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
        .materialize()
    )
    n = dedup.count()
    rev = dedup.map_batches(
        lambda t: pa.table(
            {"src": t.column("dst").combine_chunks(), "dst": t.column("src").combine_chunks()}
        ),
        batch_format="pyarrow",
    )
    mutual = dedup.join(
        rev, join_type="inner", num_partitions=16, on=("src", "dst"),
        right_on=("src", "dst"),
    ).count()
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([int(n)], pa.int64()),
                "n_mutual": pa.array([int(mutual)], pa.int64()),
            }
        )
    )


def graph_reciprocity_graph(sf_dir: str) -> Dataset:
    """queries() entry over the sf-scaled fixture (local tier at these
    sizes; the fixture is far below the edge gate)."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return graph_reciprocity(rd.read_parquet(path))


def graph_reciprocity_graph_sql(sf_dir: str) -> str:
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM read_parquet('{path}')
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(*) FILTER (
           WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
       ) AS BIGINT) AS n_mutual
FROM e
"""


# ---------------------------------------------------------------------------
# k-core peeling (bounded-round iterative degree filtering)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def graph_kcore(
    edges: Dataset,
    *,
    k: int = _KCORE_K,
    rounds: int = _KCORE_ROUNDS,
    local_edges_max: int = 30_000_000,
) -> Dataset:
    """Bounded-round k-core peeling over the undirected distinct edge set:
    ``rounds`` iterations of "drop every node with degree < k, and every
    edge touching one", then report each remaining endpoint with its
    degree in the surviving subgraph — the density filter community
    detection and graph-ML sampling run before touching a hairball. The
    round count is part of the operator contract (both engines run EXACTLY
    ``rounds`` peels, so the gate is exact whether or not the peel has
    reached its fixpoint; at fixpoint extra rounds are no-ops and the
    output IS the true k-core).

    Size-gated tiers (the graph-family pattern): below ``local_edges_max``
    distinct edges the whole peel runs as one numpy solve on the driver
    (searchsorted codes + bincount per round — Ray shuffle fixed costs
    dwarf the arithmetic at this size, measured for pagerank in
    BASELINE.md); above it, each round is one degree census of the
    shrinking edge set (per-batch partials through a small groupby) and
    the per-round DEAD set — peeling removes few nodes per round, so dead,
    not alive, is the broadcastable side — filters edges via a broadcast
    ``is_in`` scan. A domain where a single round kills billions of nodes
    would swap the filter for a hash anti-join (functions/joins) — the
    documented trade, same as the near-dup survivor filter."""
    got = _collect_edges_gated(edges, local_edges_max)
    if got is not None:
        a, b = got
        return _kcore_local(a, b, k=k, rounds=rounds)

    import ray as _ray

    cur = _canonical_edges(edges)
    for _ in range(rounds):
        deg = _endpoint_census(cur)
        dead_tbl = deg.filter(pc.less(deg.column("c"), k))
        if dead_tbl.num_rows == 0:
            continue  # fixpoint: remaining rounds are no-ops
        dead_ref = _ray.put(dead_tbl.column("node").combine_chunks())

        def drop_dead(t: pa.Table, _dead=dead_ref) -> pa.Table:
            dead = _ray.get(_dead)
            keep = pc.and_(
                pc.invert(pc.is_in(t.column("a"), value_set=dead)),
                pc.invert(pc.is_in(t.column("b"), value_set=dead)),
            )
            return t.filter(keep)

        cur = cur.map_batches(drop_dead, batch_format="pyarrow")
    final = _endpoint_census(cur)
    return rd.from_arrow(
        pa.table(
            {
                "node": final.column("node"),
                "deg": pc.cast(final.column("c"), pa.int64()),
            }
        )
    )


def _endpoint_census(edge_ds: Dataset) -> pa.Table:
    """Driver-folded degree census of an edge Dataset: per-batch endpoint
    counts through one arrow group_by (the size-gated census pattern —
    distinct nodes bound the fold, batch_size=None per BASELINE rule)."""

    def partial(t: pa.Table) -> pa.Table:
        both = pa.table(
            {"node": pa.concat_arrays(
                [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
            )}
        )
        g = both.group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "c"])

    parts = [
        b
        for b in edge_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts).group_by(["node"]).aggregate([("c", "sum")])
    return merged.rename_columns(["node", "c"])


def _kcore_local(a: np.ndarray, b: np.ndarray, *, k: int, rounds: int) -> Dataset:
    """Exact local peel over the deduped canonical edge list: identical
    round semantics as the distributed plan and the generated oracle."""
    # canonicalize + dedup (collector returns directed distinct pairs)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keys = np.unique((lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64))
    lo = (keys >> np.uint64(32)).astype(np.int64)
    hi = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
    if len(lo):
        # one unique/inverse instead of unique + two searchsorted passes
        # (the r4 prelude pattern; positions in sorted ids == id order)
        ids, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
        ai, bi = inv[: len(lo)], inv[len(lo) :]
    else:
        ids = np.zeros(0, np.int64)
        ai = bi = np.zeros(0, np.int64)
    ekeep = np.ones(len(ai), dtype=bool)
    for _ in range(rounds):
        deg = np.bincount(ai[ekeep], minlength=len(ids)) + np.bincount(
            bi[ekeep], minlength=len(ids)
        )
        dead = deg < k
        if not dead.any() or not ekeep.any():
            break
        ekeep &= ~(dead[ai] | dead[bi])
    deg = np.bincount(ai[ekeep], minlength=len(ids)) + np.bincount(
        bi[ekeep], minlength=len(ids)
    )
    m = deg > 0
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(ids[m], pa.int64()),
                "deg": pa.array(deg[m].astype(np.int64)),
            }
        )
    )


def graph_kcore_graph(sf_dir: str) -> Dataset:
    """queries() entry: 6 peeling rounds at k=3 over the sf-scaled
    fixture (fixpoint on this fixture — verified by the parity pytest)."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    return graph_kcore(rd.read_parquet(path))


def graph_kcore_graph_sql(sf_dir: str) -> str:
    """DuckDB mirror: R chained (census -> alive -> edge-filter) CTEs over
    the identical fixture file — the same bounded-round contract."""
    path = ensure_graph(_n_nodes_for_sf(sf_dir))
    k, rounds = _KCORE_K, _KCORE_ROUNDS
    body = ""
    prev = "e0"
    for i in range(1, rounds + 1):
        # MATERIALIZED: each CTE is referenced up to 3x per round; default
        # inlining would expand e0 ~3^rounds times (measured: fd exhaustion)
        body += f""",
d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS c
  FROM (SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
  GROUP BY node
),
al{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN al{i} x ON e.a = x.node JOIN al{i} y ON e.b = y.node
)"""
        prev = f"e{i}"
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{path}')
  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
){body}
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
GROUP BY node
"""
