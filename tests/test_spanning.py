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


def _brute_umsf(n, edges):
    """Edge in UMSF iff endpoints disconnected in the strictly-heavier
    subgraph (UnionMaximumSpanningForest.cpp deferred-merge Kruskal)."""
    out = []
    for (u, v, w) in edges:
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, w2 in edges:
            if w2 > w:
                parent[find(a)] = find(b)
        if find(u) != find(v):
            out.append((u, v, w))
    return sorted(out)


def test_union_maximum_spanning_forest_matches_brute_force(spark):
    from networkit_spark.operators.spanning import (
        union_maximum_spanning_forest,
    )

    n = 14
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4), (4, 5),
             (5, 6), (4, 6), (6, 7), (7, 8), (8, 9), (6, 9), (2, 10),
             (10, 11), (11, 12), (10, 12), (12, 13), (2, 13), (5, 9)]
    eds = [(a, b, float((a * 3 + b * 5) % 4 + 1)) for a, b in pairs]
    edf = spark.createDataFrame(eds, "src long, dst long, weight double")
    g = Graph(edf, vertices=spark.range(n), directed=False, weighted=True)
    got, info = union_maximum_spanning_forest(g)
    gote = sorted(
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in got.edges.collect()
    )
    assert gote == _brute_umsf(n, eds)
    assert info.iterations == len({w for _, _, w in eds})
    # ties everywhere: the all-equal-weight UMSF is the whole graph
    edf1 = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    g1 = Graph(edf1, vertices=spark.range(n), directed=False, weighted=True)
    all_edges, _ = union_maximum_spanning_forest(g1)
    assert all_edges.edges.count() == len(pairs)


def test_union_maximum_spanning_forest_directed_raises(spark):
    from networkit_spark.operators.spanning import (
        union_maximum_spanning_forest,
    )

    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        union_maximum_spanning_forest(g)


def test_kruskal_prim_named_msf(spark):
    """KruskalMSF/PrimMSF wrappers: same unique minimum forest as the
    replica, total weight matches the sorted-scan union-find sum."""
    from networkit_spark.operators.spanning import kruskal_msf, prim_msf

    g = Graph.from_pandas(spark, EDGES, weighted=True, n=8)
    replica = _kruskal(EDGES, 8, maximum=False)
    want = {(u, v) for u, v, _w in replica}
    want_w = sum(w for _u, _v, w in replica)
    for fn in (kruskal_msf, prim_msf):
        forest, tw, _info = fn(g)
        got = {(r["src"], r["dst"])
               for r in forest.edges.select("src", "dst").collect()}
        assert got == want
        assert tw == pytest.approx(want_w)
