"""DynBetweennessOneNode: bcx == static exact betweenness score of the
focus node recomputed on the post-insertion graph (the reference's
testDynamicBetweennessOneNode contract,
DynBetweennessGTest.cpp:249-277), for every focus node of a small
graph, across strictly-shortening, equal-length, and component-merging
insertions, directed and undirected."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.dynbetweennessonenode import (
    DynBetweennessOneNode,
)


def _score_of(g, x):
    rows = betweenness(g)[0].collect()
    return {int(r["id"]): float(r["score"]) for r in rows}[x]


def _check(spark, edges, n, events, xs, directed=False):
    g2 = Graph.from_pandas(
        spark, edges + list(events), n=n, directed=directed
    )
    for x in xs:
        g = Graph.from_pandas(spark, edges, n=n, directed=directed)
        dyn = DynBetweennessOneNode(g, x)
        dyn.run()
        got = dyn.update_batch(list(events))
        assert got == pytest.approx(_score_of(g2, x), abs=1e-8), x


def test_static_bcx_equals_betweenness(spark):
    # 6-cycle with a chord: intermediate mass on several nodes
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)]
    g = Graph.from_pandas(spark, edges, n=6)
    for x in range(6):
        dyn = DynBetweennessOneNode(g, x)
        assert dyn.run() == pytest.approx(_score_of(g, x), abs=1e-8), x


def test_insert_strictly_shortening(spark):
    edges = [(i, i + 1) for i in range(5)]
    _check(spark, edges, 6, [(0, 5)], xs=[0, 2, 5])


def test_insert_equal_length_paths(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    _check(spark, edges, 4, [(0, 2), (1, 3)], xs=[0, 1, 3])


def test_insert_merges_components(spark):
    edges = [(0, 1), (1, 2), (3, 4), (4, 5)]
    _check(spark, edges, 6, [(2, 3)], xs=[1, 2, 3])


def test_directed_insert(spark):
    edges = [(0, 1), (1, 2), (2, 3), (1, 3)]
    _check(spark, edges, 5, [(3, 4), (0, 4)], xs=[1, 3, 4], directed=True)


def test_focus_node_is_endpoint_of_insert(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    _check(spark, edges, 4, [(0, 3)], xs=[0, 3])


def test_weighted_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1, 2.0)], n=2, weighted=True)
    with pytest.raises(ValueError):
        DynBetweennessOneNode(g, 0)
