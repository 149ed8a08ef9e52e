"""PLM (Louvain) property tests.

Mirrors the reference's own PLM validation strategy — property
assertions on planted partitions, not golden labels (PLM is
schedule-nondeterministic in the reference; ours is deterministic but
the properties are the comparable contract):
/root/reference/networkit/cpp/community/test/CommunityGTest.cpp:202-237
(exactly k clusters on planted partitions with p_in=1.0, p_out=0.0)
and :57-73 (proper clustering, modularity in [-0.5, 1] on G(n, p)).
"""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import modularity
from networkit_spark.operators.plm import plm
from networkit_spark.operators.plp import is_proper_clustering, number_of_clusters


def planted_cliques(spark, k: int, size: int, bridge: bool = False) -> Graph:
    """k disjoint cliques of `size` nodes (p_in=1, p_out=0); with
    ``bridge`` one extra edge chains consecutive cliques."""
    edges = []
    for c in range(k):
        base = c * size
        edges += [(base + a, base + b) for a, b in itertools.combinations(range(size), 2)]
    if bridge:
        edges += [((c + 1) * size - 1, (c + 1) * size) for c in range(k - 1)]
    return Graph.from_pandas(spark, edges, n=k * size)


def test_plm_planted_partition_exact(spark):
    # CommunityGTest.cpp:202-219: p_in=1, p_out=0 -> exactly k clusters
    g = planted_cliques(spark, k=5, size=6)
    labels, info = plm(g)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 5
    # every clique maps to ONE community whose label is its min member id
    rows = labels.collect()
    for r in rows:
        assert r["label"] == (r["id"] // 6) * 6
    assert info.iterations >= 1


def test_plm_bridged_cliques_modularity(spark):
    g = planted_cliques(spark, k=4, size=5, bridge=True)
    labels, _ = plm(g)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 4
    q = modularity(g, labels)
    # CommunityGTest.cpp:57-73 asserts modularity range; bridged cliques
    # additionally have a known good-partition score
    assert -0.5 <= q <= 1.0
    assert q > 0.5
    # PLM must beat singletons (whose modularity is negative)
    singles = g.nodes().select("id", F.col("id").alias("label"))
    assert q > modularity(g, singles)


def test_plm_weighted_pull(spark):
    # two triangles joined by a light edge; heavy intra-weights keep the
    # triangles together
    edges = [
        (0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
        (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
        (2, 3, 1.0),
    ]
    g = Graph.from_pandas(spark, edges, weighted=True)
    labels, _ = plm(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_plm_empty_and_single(spark):
    g = Graph.from_pandas(spark, [], n=3)
    labels, _ = plm(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # no edges -> singletons


def test_plm_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        plm(g)
