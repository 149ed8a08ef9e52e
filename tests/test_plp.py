import numpy as np

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import coarsen, modularity
from networkit_spark.operators.plp import (
    is_proper_clustering,
    number_of_clusters,
    plp,
)


def planted_partition_edges(n, k, seed=42):
    """k disjoint cliques over n nodes (p_in=1, p_out=0) —
    CommunityGTest.cpp:202-237 fixture shape."""
    per = n // k
    edges = []
    for c in range(k):
        members = list(range(c * per, (c + 1) * per if c < k - 1 else n))
        for i, u in enumerate(members):
            for v in members[i + 1 :]:
                edges.append((u, v))
    return edges


def test_plp_planted_k2(spark):
    """Exactly k clusters on planted partitions (CommunityGTest.cpp:202-219)."""
    edges = planted_partition_edges(40, 2)
    g = Graph.from_pandas(spark, edges, n=40)
    labels, info = plp(g, max_iterations=25)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 2


def test_plp_planted_k3(spark):
    edges = planted_partition_edges(45, 3)
    g = Graph.from_pandas(spark, edges, n=45)
    labels, _ = plp(g, max_iterations=25)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 3


def test_plp_er_proper_and_modularity_range(spark):
    """G(60, 0.2) seeded: proper clustering + modularity in [-0.5, 1]
    (CommunityGTest.cpp:57-73)."""
    rng = np.random.default_rng(42)
    n = 60
    mask = rng.random((n, n)) < 0.2
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if mask[i, j]]
    g = Graph.from_pandas(spark, edges, n=n)
    labels, _ = plp(g, max_iterations=15)
    assert is_proper_clustering(g, labels)
    q = modularity(g, labels)
    assert -0.5 <= q <= 1.0


def test_plp_isolated_nodes_stay_singletons(spark):
    """PLP.cpp:76 skips degree-0 nodes."""
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=6)
    labels, _ = plp(g, max_iterations=10)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[3] == 3 and got[4] == 4 and got[5] == 5


def test_plp_weighted_tiebreak(spark):
    """Heavier label wins; equal weights tie-break to smaller label
    (PLP.cpp:83-94). Node 2 sees label-0 via weight 5 and label-3 via
    weight 1 -> adopts 0 in superstep 1."""
    edges = [(0, 2, 5.0), (2, 3, 1.0)]
    g = Graph.from_pandas(spark, edges, weighted=True, n=4)
    labels, _ = plp(g, max_iterations=1)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[2] == 0


def test_coarsen_quotient(spark):
    """ParallelPartitionCoarsening.cpp:19-44: parallel edges summed,
    intra-cluster -> self-loops."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (0, 3), (1, 4)]
    g = Graph.from_pandas(spark, edges, n=5)
    labels_df = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 100), (3, 200), (4, 200)], "id long, label long"
    )
    coarse, mapping = coarsen(g, labels_df, compact=True)
    e = {(r["src"], r["dst"]): r["weight"] for r in coarse.edges.collect()}
    # cluster 100 -> coarse 0 (3 intra edges), cluster 200 -> coarse 1
    # (1 intra), 2 cross edges
    assert e[(0, 0)] == 3.0
    assert e[(1, 1)] == 1.0
    assert e[(0, 1)] == 2.0
    m = {r["id"]: r["coarse_id"] for r in mapping.collect()}
    assert m == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_modularity_known_value(spark):
    """Two disjoint triangles with perfect clustering: Q = 1/2 exactly
    (coverage 1, expected = 2*(vol 6/12)^2 = 1/2)."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    g = Graph.from_pandas(spark, edges, n=6)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    assert modularity(g, labels) == 0.5


def test_lp_degree_ordered_oracle_agreement(spark):
    # sequential degree-ordered LP on planted cliques finds the cliques,
    # agreeing with distributed PLP/PLM as a partition
    from networkit_spark.operators.plp import lp_degree_ordered

    from tests.test_plm import planted_cliques

    g = planted_cliques(spark, k=3, size=5)
    labels, iters = lp_degree_ordered(g)
    assert iters >= 1
    comms = {}
    for v, l in labels.items():
        comms.setdefault(l, set()).add(v)
    assert sorted(sorted(c) for c in comms.values()) == [
        list(range(0, 5)), list(range(5, 10)), list(range(10, 15))
    ]


def test_coverage_known_value(spark):
    import pytest

    from networkit_spark.graph import Graph
    from networkit_spark.operators.coarsening import coverage

    # two triangles + bridge; triangle labels -> 6 of 7 edges internal
    g = Graph.from_pandas(
        spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)], n=6
    )
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    assert coverage(g, labels) == pytest.approx(6 / 7)
    empty = Graph.from_pandas(spark, [], n=3)
    with pytest.raises(ValueError, match="undefined"):
        coverage(empty, labels)
