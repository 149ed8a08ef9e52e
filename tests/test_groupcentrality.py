"""Group centralities vs driver-side exact-greedy replicas
(GroupDegree.cpp / GroupHarmonicCloseness.cpp semantics, smallest-id
tie-break)."""

from __future__ import annotations

import hashlib
from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.groupcentrality import (
    group_degree,
    group_harmonic_closeness,
)


def _greedy_degree_replica(edges, n, k, count_group_nodes=True):
    nbrs = {u: set() for u in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    group, covered = [], set()
    for _ in range(k):
        best, best_gain = None, -1
        for u in range(n):
            if u in group:
                continue
            gain = len(nbrs[u] - covered)
            if count_group_nodes and u not in covered:
                gain += 1
            if gain > best_gain:
                best, best_gain = u, gain
        group.append(best)
        covered |= {best} | nbrs[best]
    return group, len(covered if count_group_nodes else covered - set(group))


def _bfs_dists(nbrs, s):
    d = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in nbrs[u]:
            if v not in d:
                d[v] = d[u] + 1
                q.append(v)
    return d


def _greedy_harmonic_replica(edges, n, k):
    nbrs = {u: set() for u in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    dist = {u: _bfs_dists(nbrs, u) for u in range(n)}

    def score(group):
        s = 0.0
        for v in range(n):
            if v in group:
                continue
            ds = [dist[g].get(v) for g in group if v in dist[g]]
            if ds:
                s += 1.0 / min(ds)
        return s

    group = []
    for _ in range(k):
        best, best_gain = None, float("-inf")
        cur = score(group)
        for u in range(n):
            if u in group:
                continue
            # same 9-dp gain rounding as the operator's tie-break rule
            gain = round(score(group + [u]) - cur, 9)
            if gain > best_gain:
                best, best_gain = u, gain
        group.append(best)
    return group, score(group)


def _rand_edges(n, seed, keep=4):
    out = set()
    for u in range(n):
        for v in range(u + 1, n):
            if int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16) % keep == 0:
                out.add((u, v))
    return sorted(out)


def test_group_degree_star_plus_path(spark):
    # star center 0 dominates; second pick covers the path tail
    edges = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8)]
    g = Graph.from_pandas(spark, edges, n=9)
    group, score = group_degree(g, k=2)
    assert group == [0, 7]
    assert score == 9  # everything covered


def test_group_degree_matches_replica(spark):
    for seed in (1, 2):
        n = 18
        edges = _rand_edges(n, seed)
        g = Graph.from_pandas(spark, edges, n=n)
        got_g, got_s = group_degree(g, k=4)
        want_g, want_s = _greedy_degree_replica(edges, n, 4)
        assert got_g == want_g
        assert got_s == want_s


def test_group_degree_without_group_nodes(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    g = Graph.from_pandas(spark, edges, n=4)
    got_g, got_s = group_degree(g, k=2, count_group_nodes=False)
    want_g, want_s = _greedy_degree_replica(edges, 4, 2, count_group_nodes=False)
    assert got_g == want_g and got_s == want_s


def test_group_degree_k_validation(spark):
    g = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError, match="between 1 and n"):
        group_degree(g, k=0)


def test_group_harmonic_matches_replica(spark):
    for seed in (3,):
        n = 14
        edges = _rand_edges(n, seed)
        g = Graph.from_pandas(spark, edges, n=n)
        got_g, got_s = group_harmonic_closeness(g, k=3)
        want_g, want_s = _greedy_harmonic_replica(edges, n, 3)
        assert got_g == want_g
        assert got_s == pytest.approx(want_s)
