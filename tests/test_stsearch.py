"""Bidirectional BFS/Dijkstra st-search and AllSimplePaths — python
replicas and hand fixtures."""

from __future__ import annotations

import heapq
from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.stsearch import (
    all_simple_paths,
    bidirectional_dijkstra,
    st_distances,
)

pytestmark = pytest.mark.usefixtures("spark")


def _g(spark, pairs, directed=False, weights=None):
    if weights is None:
        rows = [(u, v, 1.0) for u, v in pairs]
    else:
        rows = [(u, v, float(w)) for (u, v), w in zip(pairs, weights)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, None, directed=directed, weighted=weights is not None)


def _bfs(n, pairs, s, directed):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        if not directed:
            adj.setdefault(v, []).append(u)
    dist = {s: 0}
    q = deque([s])
    while q:
        x = q.popleft()
        for y in adj.get(x, []):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7), (7, 5),
    (2, 8), (8, 9), (9, 10), (5, 10), (11, 12),
]


def test_st_distances_matches_bfs_undirected(spark):
    g = _g(spark, PAIRS)
    tests = [(0, 5), (0, 10), (1, 9), (3, 6), (0, 0), (4, 11)]
    got = {
        (int(r["s"]), int(r["t"])): int(r["dist"])
        for r in st_distances(g, tests).collect()
    }
    for s, t in tests:
        d = _bfs(13, PAIRS, s, False).get(t)
        if d is None:
            assert (s, t) not in got  # unreachable pair omitted
        else:
            assert got[(s, t)] == d, (s, t, got.get((s, t)), d)


def test_st_distances_directed(spark):
    chain = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)]
    g = _g(spark, chain, directed=True)
    got = {
        (int(r["s"]), int(r["t"])): int(r["dist"])
        for r in st_distances(g, [(0, 4), (4, 0), (3, 2)]).collect()
    }
    assert got[(0, 4)] == 3
    assert (4, 0) not in got  # 4 is a sink
    assert got[(3, 2)] == 3  # around the cycle


def _dijkstra(pairs, weights, s, n):
    adj = {}
    for (u, v), w in zip(pairs, weights):
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {s: 0.0}
    pq = [(0.0, s)]
    while pq:
        d, x = heapq.heappop(pq)
        if d > dist.get(x, float("inf")):
            continue
        for y, w in adj.get(x, []):
            nd = d + w
            if nd < dist.get(y, float("inf")):
                dist[y] = nd
                heapq.heappush(pq, (nd, y))
    return dist


def test_bidirectional_dijkstra_matches(spark):
    weights = [1, 4, 1, 1, 5, 2, 2, 1, 3, 1, 1, 2, 1]
    g = _g(spark, PAIRS, weights=weights)
    ref = _dijkstra(PAIRS, weights, 0, 13)
    for t in (5, 10, 3):
        got = bidirectional_dijkstra(g, 0, t)
        assert abs(got - ref[t]) < 1e-9, (t, got, ref[t])
    assert bidirectional_dijkstra(g, 0, 12) == float("inf")
    assert bidirectional_dijkstra(g, 7, 7) == 0.0


def test_all_simple_paths_diamond(spark):
    # 0->1->3, 0->2->3, 0->3: three simple paths, lengths 1, 2, 2
    g = _g(spark, [(0, 1), (1, 3), (0, 2), (2, 3), (0, 3)], directed=True)
    got = sorted(
        (list(r["path"]), int(r["length"]))
        for r in all_simple_paths(g, 0, 3, cutoff=5).collect()
    )
    assert got == [
        ([0, 1, 3], 2),
        ([0, 2, 3], 2),
        ([0, 3], 1),
    ]


def test_all_simple_paths_cutoff(spark):
    g = _g(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], directed=True)
    got = [
        int(r["length"])
        for r in all_simple_paths(g, 0, 3, cutoff=2).collect()
    ]
    assert got == [1]  # the length-3 path is cut off
