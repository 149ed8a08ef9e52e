"""Sparsification scores vs hand-computed values
(LocalSimilarityScore.cpp:17-73, LocalDegreeScore.cpp:28-74,
GlobalThresholdFilter.cpp:18-49)."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    local_degree_score,
    local_similarity_score,
)

# two triangles sharing edge (1,2): tri counts (0,1)=1 (0,2)=1 (1,2)=2
# (1,3)=1 (2,3)=1; degrees 0:2 1:3 2:3 3:2
TWO_TRI = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]


def _scores(df):
    return {(r["src"], r["dst"]): r["score"] for r in df.collect()}


def test_local_similarity_score(spark):
    g = Graph.from_pandas(spark, TWO_TRI, n=4)
    got = _scores(local_similarity_score(g))
    e23 = 1 - math.log(2) / math.log(3)
    assert got[(0, 1)] == pytest.approx(1.0)   # rank 1 at node 0 (tie, alter asc)
    assert got[(0, 2)] == pytest.approx(e23)   # rank 2 at both 0 and 2
    assert got[(1, 2)] == pytest.approx(1.0)   # top similarity at both ends
    assert got[(1, 3)] == pytest.approx(1.0)   # rank 1 at node 3
    assert got[(2, 3)] == pytest.approx(0.0)   # last everywhere


def test_local_similarity_filter(spark):
    g = Graph.from_pandas(spark, TWO_TRI, n=4)
    s = local_similarity_score(g)
    kept = global_threshold_filter(g, s, 0.5, above=True)
    got = {(r["src"], r["dst"]) for r in kept.edges.collect()}
    assert got == {(0, 1), (1, 2), (1, 3)}
    dropped = global_threshold_filter(g, s, 0.3, above=False)
    assert {(r["src"], r["dst"]) for r in dropped.edges.collect()} == {(2, 3)}


def test_local_degree_score(spark):
    # two 4-degree hubs (0, 1) with 3 leaves each, bridged by the path
    # 0-10-11-1: edge (10,11) ranks last at BOTH endpoints -> score 0
    edges = [(0, 2), (0, 3), (0, 4), (1, 5), (1, 6), (1, 7),
             (0, 10), (1, 11), (10, 11)]
    g = Graph.from_pandas(spark, edges, n=12)
    got = _scores(local_degree_score(g))
    assert got[(10, 11)] == pytest.approx(0.0)
    assert got[(0, 10)] == pytest.approx(1.0)  # rank 1 at node 10
    assert got[(0, 2)] == pytest.approx(1.0)   # leaf endpoint keeps it
    # competition ranking: the 3 leaves of hub 0 share rank 2 (of d=4)
    # from the hub side but each leaf endpoint scores 1.0 -> max is 1.0
    assert got[(1, 5)] == pytest.approx(1.0)


def test_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        local_similarity_score(g)
    with pytest.raises(ValueError, match="undirected"):
        local_degree_score(g)
