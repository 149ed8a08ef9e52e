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


def test_jaccard_and_adamic_adar_edge_scores(spark):
    import math

    import pytest

    from networkit_spark.graph import Graph
    from networkit_spark.operators.triangles import (
        adamic_adar_distance,
        jaccard_distance,
    )

    # two triangles + bridge: triangle edges have one common neighbor,
    # the bridge has none
    g = Graph.from_pandas(
        spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)], n=6
    )
    jd = {(r["src"], r["dst"]): r["score"] for r in jaccard_distance(g).collect()}
    # edge (0,1): t=1, deg(0)+deg(1)-t = 2+2-1 -> 1 - 1/3; bridge: t=0 -> 1.0
    assert jd[(0, 1)] == pytest.approx(2 / 3)
    assert jd[(2, 3)] == pytest.approx(1.0)
    aa = {(r["src"], r["dst"]): (r["aa"], r["score"])
          for r in adamic_adar_distance(g).collect()}
    # edge (0,1): common neighbor 2 with degree 3 -> aa = 1/ln(3)
    assert aa[(0, 1)][0] == pytest.approx(1 / math.log(3))
    assert aa[(0, 1)][1] == pytest.approx(math.log(3))
    assert aa[(2, 3)][0] == 0.0
    assert math.isinf(aa[(2, 3)][1])
