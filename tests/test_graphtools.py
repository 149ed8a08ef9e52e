import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators import graphtools as gt
from networkit_spark.operators.centrality import (
    centralization,
    degree_centrality,
    ranking,
)


@pytest.fixture(scope="module")
def g5(spark):
    # 5-cycle + chord (1,3)
    return Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)], n=5)


def test_subgraph_from_nodes(spark, g5):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    sub = gt.subgraph_from_nodes(g5, nodes)
    got = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert got == {(1, 2), (2, 3), (1, 3)}
    compacted = gt.subgraph_from_nodes(g5, nodes, compact=True)
    got_c = {(r["src"], r["dst"]) for r in compacted.edges.collect()}
    assert got_c == {(0, 1), (1, 2), (0, 2)}


def test_subgraph_and_neighbors(spark, g5):
    nodes = spark.createDataFrame([(0,)], "id long")
    sub = gt.subgraph_and_neighbors_from_nodes(g5, nodes)
    got = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert got == {(0, 1), (0, 4)}


def test_transpose_roundtrip(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True, n=3)
    t = gt.transpose(g)
    got = {(r["src"], r["dst"]) for r in t.edges.collect()}
    assert got == {(1, 0), (2, 1)}
    back = gt.transpose(t)
    assert {(r["src"], r["dst"]) for r in back.edges.collect()} == {(0, 1), (1, 2)}


def test_append_and_merge(spark):
    g1 = Graph.from_pandas(spark, [(0, 1)], n=2)
    g2 = Graph.from_pandas(spark, [(0, 1)], n=2)
    app = gt.append_graph(g1, g2)
    assert app.number_of_nodes() == 4
    assert {(r["src"], r["dst"]) for r in app.edges.collect()} == {(0, 1), (2, 3)}
    mrg = gt.merge_graph(g1, g2)
    assert mrg.number_of_edges() == 1


def test_compact_restore(spark):
    g = Graph.from_pandas(spark, [(10, 20), (20, 40)])
    mapping = gt.continuous_node_ids(g)
    c = gt.compact_graph(g, mapping)
    assert {(r["src"], r["dst"]) for r in c.edges.collect()} == {(0, 1), (1, 2)}
    r = gt.restore_graph(c, mapping)
    assert {(r2["src"], r2["dst"]) for r2 in r.edges.collect()} == {(10, 20), (20, 40)}


def test_scalar_props(g5):
    assert gt.density(g5) == pytest.approx(6 / 10)
    assert gt.volume(g5) == 12.0
    assert gt.max_degree(g5) == 3
    assert gt.max_weighted_degree(g5) == 3.0


def test_to_unweighted(spark):
    g = Graph.from_pandas(spark, [(0, 1, 7.0)], weighted=True)
    u = gt.to_unweighted(g)
    assert u.edges.collect()[0]["weight"] == 1.0


def test_sort_edges_by_weight(spark):
    g = Graph.from_pandas(spark, [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 2.0)], weighted=True)
    ws = [r["weight"] for r in gt.sort_edges_by_weight(g).collect()]
    assert ws == [1.0, 2.0, 3.0]


def test_random_nodes_deterministic(g5):
    a = {r["id"] for r in gt.random_nodes(g5, 3, seed=7).collect()}
    b = {r["id"] for r in gt.random_nodes(g5, 3, seed=7).collect()}
    assert a == b and len(a) == 3


def test_topological_sort(spark):
    g = Graph.from_pandas(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True, n=4)
    levels = {r["id"]: r["level"] for r in gt.topological_sort(g).collect()}
    assert levels[0] == 0 and levels[3] == 2
    cyc = Graph.from_pandas(spark, [(0, 1), (1, 0)], directed=True, n=2)
    with pytest.raises(ValueError):
        gt.topological_sort(cyc)


def test_degree_centrality_and_ranking(spark, g5):
    scores = degree_centrality(g5)
    got = {r["id"]: r["score"] for r in scores.collect()}
    assert got == {0: 2.0, 1: 3.0, 2: 2.0, 3: 3.0, 4: 2.0}
    top = ranking(scores, 2).collect()
    assert [r["id"] for r in top] == [1, 3]  # tie -> asc id
    norm = degree_centrality(g5, normalized=True)
    assert max(r["score"] for r in norm.collect()) == 1.0
    assert 0.0 <= centralization(g5, scores) <= 1.0


def test_bipartite_components(spark):
    """C4 (bipartite) + C5 (odd cycle) + P3 (bipartite), disjoint."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.graphtools import bipartite_components, is_bipartite

    c4 = [(0, 1), (1, 2), (2, 3), (0, 3)]
    c5 = [(4, 5), (5, 6), (6, 7), (7, 8), (4, 8)]
    p3 = [(9, 10), (10, 11)]
    g = Graph.from_pandas(spark, c4 + c5 + p3, n=12)
    flags = {r["label"]: r["is_bipartite"] for r in bipartite_components(g).collect()}
    assert flags == {0: True, 4: False, 9: True}
    assert is_bipartite(g) is False
    assert is_bipartite(Graph.from_pandas(spark, c4, n=4)) is True


def test_index_edges(spark):
    from networkit_spark.operators.graphtools import index_edges

    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (0, 2)])
    e = index_edges(g).orderBy("edge_id").collect()
    assert [r["edge_id"] for r in e] == [0, 1, 2]
    assert (e[0]["src"], e[0]["dst"]) == (0, 1)


def test_random_neighbor(spark):
    from networkit_spark.operators.graphtools import random_neighbor

    g = Graph.from_pandas(spark, [(0, 1), (0, 2)], n=4)
    v = random_neighbor(g, 0, seed=7)
    assert v in (1, 2)
    assert random_neighbor(g, 0, seed=7) == v  # deterministic
    assert random_neighbor(g, 3) is None


def test_clustering_predicates(spark):
    from networkit_spark.operators.plp import (
        equal_clusterings,
        is_one_clustering,
        is_singleton_clustering,
    )
    from pyspark.sql import functions as F

    g = Graph.from_pandas(spark, [(0, 1)], n=4)
    singles = g.nodes().select("id", F.col("id").alias("label"))
    ones = g.nodes().select("id", F.lit(0).alias("label"))
    assert is_singleton_clustering(g, singles)
    assert not is_singleton_clustering(g, ones)
    assert is_one_clustering(g, ones)
    renamed = singles.select("id", (F.col("label") * 10 + 3).alias("label"))
    assert equal_clusterings(singles, renamed)
    assert not equal_clusterings(singles, ones)
