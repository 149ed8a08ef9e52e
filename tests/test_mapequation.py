"""LouvainMapEquation property tests (LouvainMapEquation.cpp; property
strategy as in test_plm.py — the reference's parallel modes are
schedule-nondeterministic, ours is the deterministic synchronous form)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import modularity
from networkit_spark.operators.mapequation import louvain_map_equation
from networkit_spark.operators.plp import is_proper_clustering, number_of_clusters

from tests.test_plm import planted_cliques


def test_mapequation_planted_partition(spark):
    g = planted_cliques(spark, k=4, size=6)
    labels, info = louvain_map_equation(g)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 4
    for r in labels.collect():
        assert r["label"] == (r["id"] // 6) * 6
    assert info.iterations >= 1


def test_mapequation_bridged_cliques(spark):
    g = planted_cliques(spark, k=3, size=5, bridge=True)
    labels, _ = louvain_map_equation(g, hierarchical=True, max_iterations=8)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 3
    q = modularity(g, labels)
    assert q > 0.5


def test_mapequation_weighted_pull(spark):
    edges = [
        (0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
        (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
        (2, 3, 1.0),
    ]
    g = Graph.from_pandas(spark, edges, weighted=True)
    labels, _ = louvain_map_equation(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_mapequation_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        louvain_map_equation(g)
