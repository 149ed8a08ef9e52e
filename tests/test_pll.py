"""PrunedLandmarkLabeling + DynPrunedLandmarkLabeling
(distance/PrunedLandmarkLabeling.cpp, DynPrunedLandmarkLabeling.cpp).

The PSL-superstep labeling is asserted equal to the brute-force CANONICAL
hub labeling of the (degree desc, id asc) rank order — (r, u, d(r,u)) iff
r is the unique min-rank vertex on the union of all shortest r-u paths —
which is the label set the reference's sequential pruned BFSs produce for
the same order.  Queries are asserted against BFS ground truth, and the
dynamic repair against recomputed distances on the post-insertion graph
(the reference gtest's update-vs-recompute invariant).
"""

from __future__ import annotations

import collections
import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.pll import (
    dyn_pll_add_edges,
    pll_query,
    pruned_landmark_labeling,
)


def _bfs(adj: dict[int, list[int]], s: int) -> dict[int, int]:
    dist = {s: 0}
    q = collections.deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _canonical_labels(edges, n, directed=False):
    """Brute-force canonical hub labeling (out-family for directed)."""
    adj: dict[int, list[int]] = collections.defaultdict(list)
    radj: dict[int, list[int]] = collections.defaultdict(list)
    deg = collections.Counter()
    indeg = collections.Counter()
    for u, v in edges:
        adj[u].append(v)
        radj[v].append(u)
        deg[u] += 1
        if directed:
            indeg[v] += 1
        else:
            adj[v].append(u)
            deg[v] += 1
    order = sorted(range(n), key=lambda i: (-deg[i], -indeg[i], i))
    rank = {v: i for i, v in enumerate(order)}
    dist_from = {s: _bfs(adj, s) for s in range(n)}  # d(s -> v)
    labels = set()
    for r in range(n):
        for u, d in dist_from[r].items():
            if rank[r] > rank[u]:
                continue
            # refuted iff some w with smaller rank on a shortest r->u path
            refuted = False
            for w in range(n):
                if rank[w] >= rank[r]:
                    continue
                dw = dist_from[r].get(w)
                du = dist_from[w].get(u)
                if dw is not None and du is not None and dw + du == d:
                    refuted = True
                    break
            if not refuted:
                labels.add((r, u, d))
    return labels, rank


def _spark_labels(res) -> set:
    return {
        (int(r["hub"]), int(r["id"]), int(r["dist"]))
        for r in res.labels.collect()
    }


def test_star_minimal_labels(spark):
    # star: the center outranks every leaf -> labels are exactly the n
    # self-labels plus one center label per leaf, nothing leaf-to-leaf.
    n = 8
    g = Graph.from_pandas(spark, [(0, i) for i in range(1, n)], n=n)
    res = pruned_landmark_labeling(g)
    got = _spark_labels(res)
    want = {(i, i, 0) for i in range(n)} | {(0, i, 1) for i in range(1, n)}
    assert got == want
    assert res.levels <= 2


def test_canonical_undirected_er(spark):
    rng = random.Random(7)
    n = 40
    edges = sorted(
        {(min(u, v), max(u, v)) for u, v in
         ((rng.randrange(n), rng.randrange(n)) for _ in range(90)) if u != v}
    )
    g = Graph.from_pandas(spark, edges, n=n)
    res = pruned_landmark_labeling(g)
    want, _ = _canonical_labels(edges, n)
    assert _spark_labels(res) == want


def test_query_exact_all_pairs(spark):
    rng = random.Random(11)
    n = 30
    edges = sorted(
        {(min(u, v), max(u, v)) for u, v in
         ((rng.randrange(n), rng.randrange(n)) for _ in range(55)) if u != v}
    )
    g = Graph.from_pandas(spark, edges, n=n)
    res = pruned_landmark_labeling(g)
    pairs = spark.createDataFrame(
        [(s, t) for s in range(n) for t in range(n)], "s long, t long"
    )
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in pll_query(res, pairs).collect()
    }
    adj = collections.defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    want = {}
    for s in range(n):
        for t, d in _bfs(adj, s).items():
            want[(s, t)] = d
    assert got == want


def test_canonical_and_query_directed(spark):
    rng = random.Random(3)
    n = 25
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    edges = [(u, v) for u, v in edges if u != v]
    g = Graph.from_pandas(spark, edges, directed=True, n=n)
    res = pruned_landmark_labeling(g)
    want, _ = _canonical_labels(edges, n, directed=True)
    assert _spark_labels(res) == want
    # directed query: labels_in[s] x labels_out[t]
    pairs = spark.createDataFrame(
        [(s, t) for s in range(n) for t in range(n)], "s long, t long"
    )
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in pll_query(res, pairs, directed=True).collect()
    }
    adj = collections.defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    truth = {}
    for s in range(n):
        for t, d in _bfs(adj, s).items():
            truth[(s, t)] = d
    assert got == truth


def test_dyn_insertions_match_recompute(spark):
    rng = random.Random(23)
    n = 30
    all_edges = sorted(
        {(min(u, v), max(u, v)) for u, v in
         ((rng.randrange(n), rng.randrange(n)) for _ in range(60)) if u != v}
    )
    inserted = all_edges[::7]
    base = [e for e in all_edges if e not in inserted]
    g0 = Graph.from_pandas(spark, base, n=n)
    g1 = Graph.from_pandas(spark, all_edges, n=n)
    res0 = pruned_landmark_labeling(g0)
    res = dyn_pll_add_edges(g1, res0, inserted)
    pairs = spark.createDataFrame(
        [(s, t) for s in range(n) for t in range(n)], "s long, t long"
    )
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in pll_query(res, pairs).collect()
    }
    adj = collections.defaultdict(list)
    for u, v in all_edges:
        adj[u].append(v)
        adj[v].append(u)
    want = {}
    for s in range(n):
        for t, d in _bfs(adj, s).items():
            want[(s, t)] = d
    assert got == want
    # every dyn label is a true walk length (>= exact distance): the
    # 2-hop cover may keep extra labels vs the sequential reference, but
    # never an underestimate.
    dist_from = {s: _bfs(adj, s) for s in range(n)}
    for hub, u, d in _spark_labels(res):
        assert d >= dist_from[hub].get(u, 10**9) or hub == u


def test_dyn_rejects_directed(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    res = pruned_landmark_labeling(g)
    with pytest.raises(NotImplementedError):
        dyn_pll_add_edges(g, res, [(1, 0)])
