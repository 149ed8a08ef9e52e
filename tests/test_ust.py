"""UST estimators (ApproxSpanningEdge, ForestCentrality,
ApproxElectricalCloseness) — tree validity, determinism, and agreement
with dense-exact pseudo-inverse values (reference:
networkit/cpp/centrality/ApproxSpanningEdge.cpp, ForestCentrality.cpp,
ApproxElectricalCloseness.cpp)."""

from __future__ import annotations

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.ust import (
    approx_electrical_closeness,
    approx_spanning_edge,
    forest_centrality,
    sample_usts,
)

pytestmark = pytest.mark.usefixtures("spark")

# 10-node connected test graph: a 6-cycle with chords + a 4-node tail
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),  # cycle
    (0, 3), (1, 4),                                   # chords
    (5, 6), (6, 7), (7, 8), (8, 9), (6, 8),           # tail with one cycle
]
N = 10


def _mk(spark):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in EDGES], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=False, weighted=False)


def _laplacian():
    L = np.zeros((N, N))
    for u, v in EDGES:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    return L


def test_sample_usts_are_spanning_trees(spark):
    g = _mk(spark)
    rows = sample_usts(g, root=0, n_samples=5, seed=3).collect()
    by_sample: dict[int, dict[int, int]] = {}
    for r in rows:
        by_sample.setdefault(int(r["sample"]), {})[int(r["id"])] = int(
            r["parent"]
        )
    assert set(by_sample) == set(range(5))
    eset = {tuple(sorted(e)) for e in EDGES}
    for parent in by_sample.values():
        assert len(parent) == N - 1          # n-1 tree edges
        assert 0 not in parent               # root has no parent
        for u, p in parent.items():
            assert (min(u, p), max(u, p)) in eset   # edges of G
            # path to root terminates (acyclic)
            seen, cur = set(), u
            while cur != 0:
                assert cur not in seen
                seen.add(cur)
                cur = parent[cur]


def test_sample_usts_deterministic(spark):
    g = _mk(spark)
    a = sorted(map(tuple, sample_usts(g, 0, 3, seed=9).collect()))
    b = sorted(map(tuple, sample_usts(g, 0, 3, seed=9).collect()))
    c = sorted(map(tuple, sample_usts(g, 0, 3, seed=10).collect()))
    assert a == b
    assert a != c


def test_approx_spanning_edge_matches_exact_resistance(spark):
    g = _mk(spark)
    got = {
        (int(r["src"]), int(r["dst"])): float(r["score"])
        for r in approx_spanning_edge(g, seed=2, n_samples=600).collect()
    }
    assert set(got) == {tuple(sorted(e)) for e in EDGES}
    Lp = np.linalg.pinv(_laplacian())
    for (u, v), s in got.items():
        exact = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        assert abs(s - exact) < 0.08, (u, v, s, exact)
    # bridge edges (tail) are in every spanning tree
    assert got[(5, 6)] == 1.0
    assert got[(8, 9)] == 1.0


def test_forest_centrality_matches_dense_exact(spark):
    g = _mk(spark)
    got = {
        int(r["id"]): float(r["score"])
        for r in forest_centrality(
            g, seed=4, n_samples=3000, solve_iters=400
        ).collect()
    }
    assert set(got) == set(range(N))
    # exact: augmented graph (root N joined to all), diag of pinv(L')
    n_aug = N + 1
    L = np.zeros((n_aug, n_aug))
    for u, v in EDGES + [(N, u) for u in range(N)]:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    d = np.diag(np.linalg.pinv(L))
    trace = d.sum()
    exact = {u: n_aug / (n_aug * d[u] + trace - 2.0) for u in range(N)}
    for u in range(N):
        assert abs(got[u] - exact[u]) / exact[u] < 0.12, (u, got[u], exact[u])


def test_approx_electrical_closeness_matches_dense_exact(spark):
    g = _mk(spark)
    got = {
        int(r["id"]): float(r["score"])
        for r in approx_electrical_closeness(
            g, seed=6, n_samples=800, solve_iters=400
        ).collect()
    }
    Lp = np.linalg.pinv(_laplacian())
    d = np.diag(Lp)
    trace = d.sum()
    exact = {u: (N - 1) / (N * d[u] + trace) for u in range(N)}
    for u in range(N):
        assert abs(got[u] - exact[u]) / exact[u] < 0.12, (u, got[u], exact[u])
    # the root's diagonal entry comes straight from the solve
    top_exact = max(exact, key=exact.get)
    top_got = max(got, key=got.get)
    assert top_got == top_exact


def test_directed_rejected(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    g = Graph(df, None, directed=True, weighted=False)
    with pytest.raises(ValueError):
        approx_spanning_edge(g)
    with pytest.raises(ValueError):
        forest_centrality(g)
    with pytest.raises(ValueError):
        approx_electrical_closeness(g)
