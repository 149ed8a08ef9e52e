"""Traversal module vs python replicas of graph/BFS.hpp + DFS.hpp
under ascending adjacency iteration."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.traversal import (
    bfs_edges_from,
    bfs_from,
    dfs_edges_from,
    dfs_from,
)

pytestmark = pytest.mark.usefixtures("spark")

PAIRS = [(0, 1), (0, 4), (1, 2), (4, 2), (2, 3), (3, 5), (4, 5),
         (6, 7)]  # 6,7 unreachable from 0
N = 8


def _adj(directed=False):
    adj = {i: [] for i in range(N)}
    for u, v in PAIRS:
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    return {k: sorted(vs) for k, vs in adj.items()}


def _ref_bfs(src):
    from collections import deque

    adj = _adj()
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _ref_dfs(src):
    """Mark-on-push stack DFS, ascending pushes (DFS.hpp:21-38)."""
    adj = _adj()
    marked = {src}
    stack = [src]
    order, edges = [], []
    while stack:
        u = stack.pop()
        order.append(u)
        for v in adj[u]:
            if v not in marked:
                marked.add(v)
                stack.append(v)
    return order


def _ref_dfs_edges(src):
    adj = _adj()
    marked = {src}
    stack = [src]
    edges = []
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in marked:
                marked.add(v)
                edges.append((u, v))
                stack.append(v)
    return edges


def test_bfs_from_order(spark):
    g = Graph.from_pandas(spark, PAIRS, n=N)
    got = {r["id"]: (r["dist"], r["ord"])
           for r in bfs_from(g, 0).collect()}
    dist = _ref_bfs(0)
    assert set(got) == set(dist)  # unreachable 6,7 absent
    want_order = sorted(dist, key=lambda v: (dist[v], v))
    for rank, v in enumerate(want_order):
        assert got[v] == (dist[v], rank)


def test_bfs_edges_from_tree(spark):
    g = Graph.from_pandas(spark, PAIRS, n=N)
    got = {(r["src"], r["dst"]): r["dist"]
           for r in bfs_edges_from(g, 0).collect()}
    dist = _ref_bfs(0)
    adj = _adj()
    # every non-source reached node has exactly one tree edge from its
    # min-id neighbor one level up
    assert len(got) == len(dist) - 1
    for v, d in dist.items():
        if d == 0:
            continue
        parent = min(u for u in adj[v] if dist.get(u) == d - 1)
        assert got[(parent, v)] == d


def test_dfs_from_matches_stack_replica(spark):
    g = Graph.from_pandas(spark, PAIRS, n=N)
    got = sorted(
        ((r["ord"], r["id"]) for r in dfs_from(g, 0).collect())
    )
    want = [(i, u) for i, u in enumerate(_ref_dfs(0))]
    assert got == want


def test_dfs_edges_from_matches_replica(spark):
    g = Graph.from_pandas(spark, PAIRS, n=N)
    got = [(r["src"], r["dst"])
           for r in dfs_edges_from(g, 0).orderBy("ord").collect()]
    assert got == _ref_dfs_edges(0)


def test_bfs_from_directed(spark):
    g = Graph.from_pandas(spark, PAIRS, directed=True, n=N)
    got = {r["id"]: r["dist"] for r in bfs_from(g, 0).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 3, 5: 2}
