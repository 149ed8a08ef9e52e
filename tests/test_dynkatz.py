"""DynKatzCentrality vs an exact-integer replica of the reference
recursion (centrality/DynKatzCentrality.cpp)."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.dynkatz import DynKatz


def _replica(edges, n, levels):
    """Exact path-count recursion: returns (nPaths list, alpha, maxdeg)."""
    adj = {u: [] for u in range(n)}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    maxdeg = max(len(v) for v in adj.values())
    alpha = 1.0 / (maxdeg + 1.0)
    np_ = [[1] * n]
    for _ in range(levels):
        prev = np_[-1]
        np_.append([sum(prev[w] for w in adj[u]) for u in range(n)])
    return np_, alpha, maxdeg


def _replica_scores(np_, alpha, maxdeg, n):
    L = len(np_) - 1
    base = [
        sum(alpha**r * np_[r][u] for r in range(1, L + 1)) for u in range(n)
    ]
    nxt = alpha ** (L + 1)
    bf = nxt / (1.0 - alpha * maxdeg)
    score = [base[u] + nxt * np_[L][u] for u in range(n)]
    bound = [base[u] + bf * np_[L][u] for u in range(n)]
    return score, bound


EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),  # hub 0
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 1),  # ring
    (5, 6), (6, 7), (7, 8),                  # tail
]
N = 9


def test_fixed_levels_matches_replica(spark):
    g = Graph.from_pandas(spark, EDGES, n=N)
    dk = DynKatz(g, k=3, levels=4).run()
    got = {
        r["id"]: (r["score"], r["bound"]) for r in dk.scores().collect()
    }
    np_, alpha, maxdeg = _replica(EDGES, N, 4)
    score, bound = _replica_scores(np_, alpha, maxdeg, N)
    assert dk.maxdeg == maxdeg and dk.alpha == alpha
    for u in range(N):
        assert got[u][0] == pytest.approx(score[u], rel=1e-12)
        assert got[u][1] == pytest.approx(bound[u], rel=1e-12)


def test_update_batch_equals_static_recompute(spark):
    g = Graph.from_pandas(spark, EDGES, n=N)
    dk = DynKatz(g, k=3, levels=4).run()
    events = spark.createDataFrame(
        [
            ("EDGE_ADDITION", 1, 7, 1.0),
            ("EDGE_ADDITION", 2, 8, 1.0),
            ("EDGE_REMOVAL", 0, 5, None),
        ],
        "type string, u long, v long, w double",
    )
    dk.update_batch(events)
    got = {
        r["id"]: (r["score"], r["bound"]) for r in dk.scores().collect()
    }
    new_edges = [e for e in EDGES if e != (0, 5)] + [(1, 7), (2, 8)]
    # alpha/maxdeg stay pinned to the construction graph (reference TODO)
    np_, _, _ = _replica(new_edges, N, 4)
    score, bound = _replica_scores(np_, dk.alpha, dk.maxdeg, N)
    for u in range(N):
        assert got[u][0] == pytest.approx(score[u], rel=1e-12), u
        assert got[u][1] == pytest.approx(bound[u], rel=1e-12), u


def test_convergence_ranks_topk(spark):
    # strongly separated graph: star hub + sparse tail
    edges = [(0, i) for i in range(1, 8)] + [(1, 8), (8, 9)]
    g = Graph.from_pandas(spark, edges, n=10)
    dk = DynKatz(g, k=2, tolerance=1e-4).run()
    assert dk.info.converged
    top = [r["id"] for r in dk.ranking().collect()]
    # exact Katz at deep level: hub 0 first, then node 1 (extra branch)
    np_, alpha, maxdeg = _replica(edges, 10, 30)
    score, _ = _replica_scores(np_, alpha, maxdeg, 10)
    want = sorted(range(10), key=lambda u: (-score[u], u))[:2]
    assert top == want


def test_rejects_non_edge_events_and_zero_degree(spark):
    g = Graph.from_pandas(spark, EDGES, n=N)
    dk = DynKatz(g, k=2, levels=2).run()
    ev = spark.createDataFrame(
        [("NODE_ADDITION", 99, None, None)],
        "type string, u long, v long, w double",
    )
    with pytest.raises(ValueError, match="insertions or deletions"):
        dk.update_batch(ev)
    g0 = Graph.from_pandas(spark, [], n=3)
    with pytest.raises(RuntimeError, match="degree"):
        DynKatz(g0, k=1)
