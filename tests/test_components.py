import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import (
    compact_labels,
    component_sizes,
    connected_components,
    extract_largest_connected_component,
    number_of_components,
    weakly_connected_components,
)
from tests.fixtures import CC_EDGES, CC_EXPECTED_LABELS, CC_N


def test_cc_tiny_golden(spark):
    """ConnectedComponentsGTest.cpp:32-63 — 5 components, canonical
    min-id labels."""
    g = Graph.from_pandas(spark, CC_EDGES, n=CC_N)
    labels, info = connected_components(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == CC_EXPECTED_LABELS
    assert number_of_components(labels) == 5
    assert info.iterations >= 2


def test_cc_compact_labels(spark):
    g = Graph.from_pandas(spark, CC_EDGES, n=CC_N)
    labels, _ = connected_components(g, compact=True)
    got = {r["id"]: r["label"] for r in labels.collect()}
    # dense 0..4, ordered by min member id — matches sequential BFS
    # numbering (seeds scanned in ascending id order)
    remap = {0: 0, 3: 1, 10: 2, 13: 3, 15: 4}
    assert got == {k: remap[v] for k, v in CC_EXPECTED_LABELS.items()}


def test_cc_directed_raises(spark):
    """ConnectedComponentsGTest.cpp:65-68."""
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=5)
    with pytest.raises(ValueError):
        connected_components(g)


def test_wcc_directed(spark):
    g = Graph.from_pandas(spark, CC_EDGES, directed=True, n=CC_N)
    labels, _ = weakly_connected_components(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == CC_EXPECTED_LABELS


def test_component_sizes_and_lcc_extraction(spark):
    g = Graph.from_pandas(spark, CC_EDGES, n=CC_N)
    labels, _ = connected_components(g)
    sizes = {r["label"]: r["size"] for r in component_sizes(labels).collect()}
    assert sizes == {0: 7, 3: 5, 10: 5, 13: 2, 15: 1}
    lcc = extract_largest_connected_component(g)
    assert lcc.number_of_nodes() == 7
    assert lcc.number_of_edges() == 6
    lcc_c = extract_largest_connected_component(g, compact_graph=True)
    ids = sorted(r["id"] for r in lcc_c.nodes().collect())
    assert ids == list(range(7))


def test_cc_long_chain(spark):
    """Propagation depth: a 64-node path needs many supersteps —
    exercises the frontier shrinking to the chain tip."""
    edges = [(i, i + 1) for i in range(63)]
    g = Graph.from_pandas(spark, edges, n=64)
    labels, info = connected_components(g)
    assert number_of_components(labels) == 1
    assert all(r["label"] == 0 for r in labels.collect())


def test_biconnected_components_bowtie(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import biconnected_components

    # two triangles sharing the articulation node 2
    g = Graph.from_pandas(
        spark, [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)], n=5
    )
    membership, sizes = biconnected_components(g)
    comps = {}
    for r in membership.collect():
        comps.setdefault(r["component"], set()).add(r["id"])
    assert sorted(sorted(c) for c in comps.values()) == [[0, 1, 2], [2, 3, 4]]
    assert sizes == {0: 3, 1: 3}


def test_biconnected_components_bridges_and_directed(spark):
    import pytest

    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import biconnected_components

    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    membership, sizes = biconnected_components(g)
    comps = {}
    for r in membership.collect():
        comps.setdefault(r["component"], set()).add(r["id"])
    assert sorted(sorted(c) for c in comps.values()) == [[0, 1], [1, 2]]
    gd = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(RuntimeError, match="directed"):
        biconnected_components(gd)
