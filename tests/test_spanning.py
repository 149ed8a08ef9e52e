"""Boruvka spanning forests vs a driver-side Kruskal replica under the
same total edge order (SpanningForest.cpp / RandomMaximumSpanningForest
semantics with the documented deterministic tie-break)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.spanning import (
    maximum_spanning_forest,
    spanning_forest,
)


def _kruskal(edges, n, maximum):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    order = sorted(
        ((min(u, v), max(u, v), w) for u, v, w in edges),
        key=lambda e: (-e[2] if maximum else e[2], e[0], e[1]),
    )
    out = set()
    for u, v, w in order:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.add((u, v, w))
    return out


EDGES = [
    (0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (1, 3, 5.0),
    (2, 3, 3.0), (3, 4, 2.0), (2, 4, 6.0),
    (5, 6, 1.0),  # second component
]


@pytest.mark.parametrize("maximum", [False, True])
def test_forest_matches_kruskal(spark, maximum):
    g = Graph.from_pandas(spark, EDGES, weighted=True, n=8)
    fn = maximum_spanning_forest if maximum else spanning_forest
    forest, info = fn(g)
    got = {(r["src"], r["dst"], r["weight"]) for r in forest.edges.collect()}
    assert got == _kruskal(EDGES, 8, maximum)
    # forest size = n_nonisolated - #components-with-edges
    assert len(got) == 7 - 2  # 7 non-isolated nodes, 2 edge-components
    assert info.iterations >= 1


def test_forest_preserves_components(spark):
    from networkit_spark.operators.components import connected_components

    g = Graph.from_pandas(spark, EDGES, weighted=True, n=8)
    forest, _ = maximum_spanning_forest(g)
    orig = {r["id"]: r["label"] for r in connected_components(g)[0].collect()}
    fc = {r["id"]: r["label"] for r in connected_components(forest)[0].collect()}
    assert fc == orig


def test_forest_tie_break_deterministic(spark):
    # all weights equal: the forest is the unique Kruskal forest under
    # (weight, src, dst) order
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0)]
    g = Graph.from_pandas(spark, edges, weighted=True, n=4)
    forest, _ = spanning_forest(g)
    got = {(r["src"], r["dst"]) for r in forest.edges.collect()}
    assert got == {(0, 1), (0, 2), (2, 3)}


def test_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        spanning_forest(g)
