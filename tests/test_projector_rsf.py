"""ClusteringProjector (coarsening/ClusteringProjector.cpp) and
RandomSpanningForest (components/RandomSpanningForest.cpp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import (
    coarsen,
    project_back,
    project_back_to_finest,
    project_coarse_graph_to_finest_clustering,
)
from networkit_spark.operators.spanning import random_spanning_forest

TRI2 = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def test_project_back_round_trip(spark):
    g = Graph.from_pandas(spark, TRI2, n=6)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)], "id long, label long"
    )
    coarse, mapping = coarsen(g, labels)
    clabels = coarse.nodes().select("id", F.col("id").alias("label"))
    fine = project_back(mapping, clabels)
    got = {(r["id"], r["label"]) for r in fine.collect()}
    assert got == {(i, 0 if i < 3 else 3) for i in range(6)}


def test_project_back_to_finest_two_levels(spark):
    g = Graph.from_pandas(spark, TRI2, n=6)
    l1 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 3), (4, 3), (5, 5)], "id long, label long"
    )
    g1, m1 = coarsen(g, l1)
    l2 = spark.createDataFrame(
        [(0, 0), (2, 0), (3, 3), (5, 3)], "id long, label long"
    )
    g2, m2 = coarsen(g1, l2)
    coarse_labels = g2.nodes().select("id", F.col("id").alias("label"))
    fine = project_back_to_finest(coarse_labels, [m1, m2])
    got = {(r["id"], r["label"]) for r in fine.collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)}
    ident = project_coarse_graph_to_finest_clustering([m1, m2])
    got2 = {(r["id"], r["label"]) for r in ident.collect()}
    assert got2 == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)}


def test_project_back_to_finest_empty_maps_identity(spark):
    labels = spark.createDataFrame([(0, 7)], "id long, label long")
    assert project_back_to_finest(labels, []).collect()[0]["label"] == 7
    with pytest.raises(ValueError):
        project_coarse_graph_to_finest_clustering([])


def test_rsf_is_spanning_forest(spark):
    g = Graph.from_pandas(spark, TRI2, n=6)
    t = random_spanning_forest(g, seed=3)
    rows = [(r["src"], r["dst"]) for r in t.collect()]
    assert len(rows) == 5  # connected: n-1 edges
    eset = {(min(a, b), max(a, b)) for a, b in TRI2}
    assert all((min(a, b), max(a, b)) in eset for a, b in rows)
    # spans: union-find over tree edges joins all 6 nodes
    par = list(range(6))
    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x
    for a, b in rows:
        ra, rb = find(a), find(b)
        assert ra != rb, "cycle in spanning tree"
        par[ra] = rb
    assert len({find(i) for i in range(6)}) == 1


def test_rsf_two_components(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (3, 4)], n=5)
    t = random_spanning_forest(g, seed=1)
    rows = {(r["src"], r["dst"]) for r in t.collect()}
    assert len(rows) == 3  # (3-1) + (2-1)
    comp = lambda x: 0 if x < 3 else 1
    assert all(comp(a) == comp(b) for a, b in rows)


def test_rsf_deterministic_and_seeded(spark):
    g = Graph.from_pandas(spark, TRI2 + [(1, 4), (0, 5)], n=6)
    a = {(r["src"], r["dst"]) for r in random_spanning_forest(g, 7).collect()}
    b = {(r["src"], r["dst"]) for r in random_spanning_forest(g, 7).collect()}
    assert a == b
    seeds = {
        frozenset(
            (r["src"], r["dst"])
            for r in random_spanning_forest(g, s).collect()
        )
        for s in range(6)
    }
    assert len(seeds) > 1  # different seeds explore different trees


def test_rsf_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        random_spanning_forest(g)
