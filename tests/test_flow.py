"""Edmonds-Karp max flow + CutClustering vs known values
(flow/EdmondsKarp.cpp, community/CutClustering.cpp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.flow import cut_clustering, edmonds_karp

# classic CLRS-style fixture with max flow 19 (hand-verifiable)
DIRECTED = [
    (0, 1, 10.0), (0, 2, 10.0), (1, 2, 2.0), (1, 3, 4.0), (1, 4, 8.0),
    (2, 4, 9.0), (3, 5, 10.0), (4, 3, 6.0), (4, 5, 10.0),
]


def test_directed_known_value(spark):
    g = Graph.from_pandas(spark, DIRECTED, directed=True, weighted=True, n=6)
    v, source_set, info = edmonds_karp(g, 0, 5)
    assert v == pytest.approx(19.0)
    ids = {r["id"] for r in source_set.collect()}
    assert 0 in ids and 5 not in ids
    # minimal cut: capacity across (ids, rest) equals the flow value
    cut = sum(w for u, vv, w in DIRECTED if u in ids and vv not in ids)
    assert cut == pytest.approx(19.0)


def test_undirected_unit_caps(spark):
    # two vertex-disjoint paths 0..3 -> flow 2
    g = Graph.from_pandas(spark, [(0, 1), (1, 3), (0, 2), (2, 3)], n=4)
    v, _, _ = edmonds_karp(g, 0, 3)
    assert v == pytest.approx(2.0)


def test_source_equals_sink_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError, match="differ"):
        edmonds_karp(g, 0, 0)


def test_cut_clustering_two_communities(spark):
    tri1 = [(0, 1, 3.0), (1, 2, 3.0), (0, 2, 3.0)]
    tri2 = [(3, 4, 3.0), (4, 5, 3.0), (3, 5, 3.0)]
    g = Graph.from_pandas(spark, tri1 + tri2 + [(2, 3, 0.5)],
                          weighted=True, n=6)
    labels = cut_clustering(g, alpha=1.0)
    groups: dict[int, set] = {}
    for r in labels.collect():
        groups.setdefault(r["label"], set()).add(r["id"])
    assert {frozenset(s) for s in groups.values()} == {
        frozenset({0, 1, 2}),
        frozenset({3, 4, 5}),
    }


def test_cut_clustering_proper_partition(spark):
    """Reference test shape (CommunityGTest testCutClustering): the
    result is a proper clustering — every node labeled exactly once,
    alpha extremes give singletons / one-cluster-ish behavior."""
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4)]
    g = Graph.from_pandas(spark, edges, n=8)
    labels = cut_clustering(g, alpha=0.1)
    rows = labels.collect()
    assert len(rows) == 8 and len({r["id"] for r in rows}) == 8
    # very large alpha: every node's min cut isolates it -> singletons
    singles = cut_clustering(g, alpha=10.0)
    assert singles.select("label").distinct().count() == 8


# ---------------------------------------------------------------------------
# Dinic (flow/Dinic.cpp)
# ---------------------------------------------------------------------------

def test_dinic_directed_known_value(spark):
    from networkit_spark.operators.flow import dinic

    g = Graph.from_pandas(spark, DIRECTED, directed=True, weighted=True, n=6)
    v, info = dinic(g, 0, 5)
    assert v == pytest.approx(19.0)
    # phases strictly fewer than EK augment count is not guaranteed, but
    # the phase count is bounded by the number of distinct s-t distance
    # classes; this fixture needs <= 3
    assert info.iterations <= 3


def test_dinic_matches_edmonds_karp(spark):
    from networkit_spark.operators.flow import dinic

    edges = [
        (0, 1, 3.0), (0, 2, 7.0), (1, 3, 9.0), (1, 4, 9.0), (2, 1, 5.0),
        (2, 4, 9.0), (3, 5, 3.0), (4, 3, 8.0), (4, 5, 17.0), (3, 4, 2.0),
    ]
    g = Graph.from_pandas(spark, edges, directed=True, weighted=True, n=6)
    v_ek, _, _ = edmonds_karp(g, 0, 5)
    v_d, _ = dinic(g, 0, 5)
    assert v_d == pytest.approx(v_ek)


def test_dinic_rejects_undirected_and_loops(spark):
    from networkit_spark.operators.flow import dinic

    gu = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError, match="directed"):
        dinic(gu, 0, 1)
    gd = Graph.from_pandas(spark, [(0, 1, 1.0)], directed=True,
                           weighted=True, n=2)
    with pytest.raises(ValueError, match="differ"):
        dinic(gd, 0, 0)


def test_dinic_negative_capacity_rejected(spark):
    from networkit_spark.operators.flow import dinic

    g = Graph.from_pandas(spark, [(0, 1, -1.0), (1, 2, 1.0)],
                          directed=True, weighted=True, n=3)
    with pytest.raises(ValueError, match="non-negative"):
        dinic(g, 0, 2)


def test_dinic_disconnected_sink_zero(spark):
    from networkit_spark.operators.flow import dinic

    g = Graph.from_pandas(spark, [(0, 1, 4.0), (2, 3, 4.0)],
                          directed=True, weighted=True, n=4)
    v, info = dinic(g, 0, 3)
    assert v == 0.0
    assert info.iterations == 0
