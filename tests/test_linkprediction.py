"""Link prediction vs hand-computed index values
(linkprediction/AdamicAdarIndex.cpp:15-21, ResourceAllocationIndex.cpp:
13-19, JaccardIndex.hpp, MissingLinksFinder.cpp:19-75)."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.linkprediction import (
    link_prediction,
    missing_links,
    threshold_by_count,
    threshold_by_score,
)

# N0={1,2} N1={0,2} N2={0,1,3} N3={2,4} N4={3}
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]


def test_missing_links_distance2(spark):
    g = Graph.from_pandas(spark, EDGES, n=5)
    got = {(r["u"], r["v"]) for r in missing_links(g, 2).collect()}
    assert got == {(0, 3), (1, 3), (2, 4)}


def test_missing_links_distance3(spark):
    g = Graph.from_pandas(spark, EDGES, n=5)
    got = {(r["u"], r["v"]) for r in missing_links(g, 3).collect()}
    assert got == {(0, 4), (1, 4)}


def test_link_prediction_indices(spark):
    g = Graph.from_pandas(spark, EDGES, n=5)
    rows = {
        (r["u"], r["v"]): r
        for r in link_prediction(g).collect()
    }
    assert set(rows) == {(0, 3), (1, 3), (2, 4)}
    r03 = rows[(0, 3)]
    assert r03["common_neighbors"] == 1.0
    assert r03["jaccard"] == pytest.approx(1 / 3)
    assert r03["adamic_adar"] == pytest.approx(1 / math.log(3))
    assert r03["resource_allocation"] == pytest.approx(1 / 3)
    assert r03["preferential_attachment"] == 4.0
    assert r03["total_neighbors"] == 3.0
    r24 = rows[(2, 4)]
    assert r24["adamic_adar"] == pytest.approx(1 / math.log(2))
    assert r24["resource_allocation"] == pytest.approx(0.5)
    assert r24["preferential_attachment"] == 3.0


def test_link_prediction_explicit_pairs_and_degree_indices(spark):
    g = Graph.from_pandas(spark, EDGES, n=5)
    pairs = spark.createDataFrame([(0, 4), (0, 3)], "u long, v long")
    rows = {
        (r["u"], r["v"]): r
        for r in link_prediction(
            g, pairs=pairs, indices=("common_neighbors", "u_degree", "v_degree")
        ).collect()
    }
    assert rows[(0, 4)]["common_neighbors"] == 0.0  # distance 3
    assert rows[(0, 4)]["u_degree"] == 2.0
    assert rows[(0, 4)]["v_degree"] == 1.0
    assert rows[(0, 3)]["common_neighbors"] == 1.0


def test_thresholder(spark):
    g = Graph.from_pandas(spark, EDGES, n=5)
    preds = link_prediction(g, indices=("preferential_attachment",))
    top = threshold_by_count(preds, 2, "preferential_attachment").collect()
    # pa: (0,3)=4, (1,3)=4, (2,4)=3 -> order (0,3), (1,3)
    assert [(r["u"], r["v"]) for r in top] == [(0, 3), (1, 3)]
    kept = threshold_by_score(preds, 4.0, "preferential_attachment").collect()
    assert {(r["u"], r["v"]) for r in kept} == {(0, 3), (1, 3)}


def test_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        missing_links(g)
    with pytest.raises(ValueError, match="undirected"):
        link_prediction(g)


def test_max_center_degree_guard(spark):
    # star center 0 with 4 leaves: all leaf pairs share only hub 0
    g = Graph.from_pandas(spark, [(0, i) for i in range(1, 5)], n=5)
    assert missing_links(g, 2).count() == 6
    assert missing_links(g, 2, max_center_degree=3).count() == 0
