"""Betweenness golden + property tests.

Golden fixture from the reference:
/root/reference/networkit/cpp/centrality/test/CentralityGTest.cpp:86-111
(6-node graph, expected {0, 0, 15, 3, 3, 1}, tol 1e-3).
"""

from __future__ import annotations

import math

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import betweenness, estimate_betweenness


GOLDEN_EDGES = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5)]
GOLDEN = {0: 0.0, 1: 0.0, 2: 15.0, 3: 3.0, 4: 3.0, 5: 1.0}


def test_betweenness_reference_golden(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    scores, info = betweenness(g)
    got = {r["id"]: r["score"] for r in scores.collect()}
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], v, abs_tol=1e-3), (k, got[k], v)
    assert info.iterations > 0


def test_betweenness_normalized(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    scores, _ = betweenness(g, normalized=True)
    got = {r["id"]: r["score"] for r in scores.collect()}
    pairs = (6 - 1) * (6 - 2)
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], v / pairs, abs_tol=1e-6)


def test_betweenness_path_graph(spark):
    # path 0-1-2-3: bc(inner) = 2 * (pairs through it) = 2*2 = 4... each
    # inner node lies on shortest paths (0,2),(0,3),(1,3) -> node 1 on
    # (0,2),(0,3); node 2 on (0,3),(1,3); x2 for both directions
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    assert got == {0: 0.0, 1: 4.0, 2: 4.0, 3: 0.0}


def test_betweenness_directed(spark):
    # directed path 0->1->2: only s=0 paths pass through 1
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True)
    got = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 0.0}


def test_betweenness_hop_cap(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["score"] for r in betweenness(g, max_hops=1)[0].collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}  # no 2-hop paths seen


def test_estimate_betweenness_scaling(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    # full sample: estimator = exact * (2n/k) = exact * 2
    scores, _ = estimate_betweenness(g, n_samples=6)
    got = {r["id"]: r["score"] for r in scores.collect()}
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], 2.0 * v, abs_tol=1e-6)
