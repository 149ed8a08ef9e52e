import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import (
    avg_local_clustering_coefficient,
    global_clustering_coefficient,
    local_clustering_coefficient,
    triangle_counts,
)
from tests.fixtures import (
    LCC6_EDGES,
    LCC6_EXPECTED,
    LCC6_N,
    LCC16_EDGES,
    LCC16_EXPECTED,
    LCC16_N,
)


def lcc_vec(df, n):
    rows = {r["id"]: r["lcc"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


def test_lcc_16node_golden(spark):
    """CentralityGTest.cpp:1328-1384 — exact scores."""
    g = Graph.from_pandas(spark, LCC16_EDGES, n=LCC16_N)
    got = lcc_vec(local_clustering_coefficient(g), LCC16_N)
    assert np.allclose(got, LCC16_EXPECTED, atol=1e-12)


def test_lcc_6node_golden(spark):
    """CentralityGTest.cpp:1386-1407."""
    g = Graph.from_pandas(spark, LCC6_EDGES, n=LCC6_N)
    got = lcc_vec(local_clustering_coefficient(g), LCC6_N)
    assert np.allclose(got, LCC6_EXPECTED, atol=1e-12)


def test_lcc_self_loop_raises(spark):
    """CentralityGTest.cpp:1380-1384 / LocalClusteringCoefficient.cpp:11-13."""
    g = Graph.from_pandas(spark, [(0, 1), (1, 1)], n=2)
    with pytest.raises(ValueError):
        local_clustering_coefficient(g)


def test_triangle_counts_k4(spark):
    """K4: every vertex in C(3,2)=3 triangles; 4 triangles total."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = Graph.from_pandas(spark, edges, n=4)
    tri = {r["id"]: r["triangles"] for r in triangle_counts(g).collect()}
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3}
    assert global_clustering_coefficient(g) == pytest.approx(1.0)
    assert avg_local_clustering_coefficient(g) == pytest.approx(1.0)


def test_triangle_numpy_oracle_random(spark):
    """Seeded G(n,p): exact triangle parity with a brute-force numpy
    oracle (mirrors the reference's turbo-vs-plain consistency check,
    CentralityGTest.cpp:1375-1377)."""
    rng = np.random.default_rng(42)
    n = 40
    mask = rng.random((n, n)) < 0.15
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if mask[i, j]]
    g = Graph.from_pandas(spark, edges, n=n)
    got = {r["id"]: r["triangles"] for r in triangle_counts(g).collect()}
    adj = np.zeros((n, n), dtype=bool)
    for u, v in edges:
        adj[u, v] = adj[v, u] = True
    a = adj.astype(np.int64)
    tri = np.diag(a @ a @ a) // 2
    assert got == {i: int(tri[i]) for i in range(n)}
