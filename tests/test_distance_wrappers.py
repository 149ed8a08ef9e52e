"""APSP / ReverseBFS / GraphDistance wrappers — python replicas and
hand fixtures (reference: networkit/cpp/distance/APSP.cpp,
ReverseBFS.cpp, GraphDistance.cpp)."""

from __future__ import annotations

import heapq
from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.distancemisc import (
    apsp,
    graph_distance,
    reverse_bfs_distances,
)

pytestmark = pytest.mark.usefixtures("spark")


def _g(spark, pairs, directed=False, weights=None):
    if weights is None:
        rows = [(u, v, 1.0) for u, v in pairs]
    else:
        rows = [(u, v, float(w)) for (u, v), w in zip(pairs, weights)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(df, None, directed=directed, weighted=weights is not None)


PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7), (7, 5),
    (2, 8), (8, 9), (9, 10), (5, 10), (11, 12),
]


def _ref_bfs(pairs, s, directed, reverse=False):
    adj = {}
    for u, v in pairs:
        if reverse:
            u, v = v, u
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


def _ref_dijkstra(pairs, weights, s, directed):
    adj = {}
    for (u, v), w in zip(pairs, weights):
        adj.setdefault(u, []).append((v, w))
        if not directed:
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


def test_apsp_matches_per_source_bfs(spark):
    g = _g(spark, PAIRS)
    rel = {
        (int(r["s"]), int(r["v"])): int(r["dist"])
        for r in apsp(g).collect()
    }
    nodes = sorted({u for p in PAIRS for u in p})
    expect = {}
    for s in nodes:
        for v, d in _ref_bfs(PAIRS, s, directed=False).items():
            expect[(s, v)] = d
    assert rel == expect


def test_apsp_directed_weighted_subset_sources(spark):
    w = [2, 1, 3, 1, 2, 1, 4, 1, 2, 3, 1, 2, 1]
    g = _g(spark, PAIRS, directed=True, weights=w)
    rel = {
        (int(r["s"]), int(r["v"])): float(r["dist"])
        for r in apsp(g, sources=[0, 2]).collect()
    }
    expect = {}
    for s in (0, 2):
        for v, d in _ref_dijkstra(PAIRS, w, s, directed=True).items():
            expect[(s, v)] = d
    assert rel == pytest.approx(expect)


def test_reverse_bfs_directed(spark):
    g = _g(spark, PAIRS, directed=True)
    dist, _ = reverse_bfs_distances(g, [5])
    got = {int(r["id"]): int(r["dist"]) for r in dist.collect()}
    assert got == _ref_bfs(PAIRS, 5, directed=True, reverse=True)


def test_reverse_bfs_undirected_equals_bfs(spark):
    from networkit_spark.operators.distance import bfs_distances

    g = _g(spark, PAIRS)
    rev, _ = reverse_bfs_distances(g, [3])
    fwd, _ = bfs_distances(g, [3])
    assert sorted(map(tuple, rev.collect())) == sorted(
        map(tuple, fwd.collect())
    )


def test_graph_distance_scalar(spark):
    g = _g(spark, PAIRS)
    assert graph_distance(g, 0, 5) == 3.0  # 0-6-7-5
    assert graph_distance(g, 0, 11) == float("inf")
    w = [2, 1, 3, 1, 2, 1, 4, 1, 2, 3, 1, 2, 1]
    gw = _g(spark, PAIRS, weights=w)
    ref = _ref_dijkstra(PAIRS, w, 0, directed=False)
    assert graph_distance(gw, 0, 5) == pytest.approx(ref[5])
