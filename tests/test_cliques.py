"""MaximalCliques vs a brute-force enumerator
(clique/MaximalCliques.cpp, ELS ordered Bron-Kerbosch)."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.cliques import (
    clique_size_histogram,
    maximal_cliques,
)


def _brute_maximal(edges, n):
    nbrs = {u: set() for u in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    out = set()
    # all cliques by growth, keep maximal
    cliques = [frozenset([u]) for u in range(n)]
    all_cliques = set(cliques)
    while cliques:
        nxt = set()
        for c in cliques:
            for w in range(n):
                if w not in c and all(w in nbrs[m] for m in c):
                    nxt.add(c | {w})
        cliques = list(nxt)
        all_cliques |= nxt
    for c in all_cliques:
        if not any(all(w in nbrs[m] for m in c) for w in range(n) if w not in c):
            out.add(tuple(sorted(c)))
    return out


def test_k4_triangle_pendant_isolated(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4),
             (5, 6)]
    g = Graph.from_pandas(spark, edges, n=8)
    got = sorted(tuple(r["clique"]) for r in maximal_cliques(g).collect())
    assert got == [(0, 1, 2, 3), (2, 3, 4), (5, 6), (7,)]


def test_random_graphs_match_bruteforce(spark):
    for seed in (1, 2):
        n = 14
        edges = [
            (u, v)
            for u in range(n)
            for v in range(u + 1, n)
            if int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            % 3 == 0
        ]
        g = Graph.from_pandas(spark, edges, n=n)
        got = {tuple(r["clique"]) for r in maximal_cliques(g).collect()}
        want = _brute_maximal(edges, n)
        assert got == want


def test_histogram(spark):
    # two disjoint K3s
    g = Graph.from_pandas(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], n=6
    )
    h = {r["size"]: r["count"] for r in clique_size_histogram(g).collect()}
    assert h == {3: 2}


def test_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        maximal_cliques(g)
