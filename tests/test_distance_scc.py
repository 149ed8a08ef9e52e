"""BFS / SSSP / eccentricity / SCC / TriangleEdgeScore unit tests.

Golden expectations mirror the reference's fixture style
(/root/reference/networkit/cpp/distance/BFS.cpp,
StronglyConnectedComponents.cpp): tiny graphs with hand-checked
distances/components.
"""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import (
    bfs_distances,
    eccentricity,
    sssp_distances,
)
from networkit_spark.operators.scc import (
    number_of_scc,
    strongly_connected_components,
)
from networkit_spark.operators.triangles import triangle_edge_score


def _as_map(df, k="id", v="dist"):
    return {r[k]: r[v] for r in df.collect()}


def test_bfs_path_graph(spark):
    g = Graph.from_pandas(spark, [(i, i + 1) for i in range(6)], n=8)
    dist, info = bfs_distances(g, [0])
    got = _as_map(dist)
    assert got == {i: i for i in range(7)}  # node 7 isolated -> absent
    assert 7 not in got
    assert info.iterations >= 6


def test_bfs_multi_source_and_cap(spark):
    g = Graph.from_pandas(spark, [(i, i + 1) for i in range(9)])
    dist, _ = bfs_distances(g, [0, 9])
    got = _as_map(dist)
    assert got[4] == 4 and got[5] == 4 and got[9] == 0
    capped, _ = bfs_distances(g, [0], max_hops=2)
    assert _as_map(capped) == {0: 0, 1: 1, 2: 2}


def test_bfs_directed_follows_out_edges(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (3, 0)], directed=True)
    got = _as_map(bfs_distances(g, [0])[0])
    assert got == {0: 0, 1: 1, 2: 2}  # 3 unreachable forward


def test_sssp_weighted_shortcut(spark):
    # 0-1-2 with heavy direct edge 0-2: shortest 0->2 goes through 1
    g = Graph.from_pandas(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)], weighted=True
    )
    got = _as_map(sssp_distances(g, [0])[0])
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_sssp_hop_bound(spark):
    g = Graph.from_pandas(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)], weighted=True
    )
    got = _as_map(sssp_distances(g, [0], max_hops=1)[0])
    assert got == {0: 0.0, 1: 1.0, 2: 5.0}  # <=1-hop relaxation


def test_eccentricity(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)])
    assert eccentricity(g, 0) == (3, 3)
    assert eccentricity(g, 1) == (3, 2)


def test_scc_two_cycles_and_bridge(spark):
    # cycle {0,1,2} -> bridge -> cycle {3,4}; 5 isolated-ish tail
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    g = Graph.from_pandas(spark, edges, directed=True)
    labels, info = strongly_connected_components(g)
    got = _as_map(labels, v="label")
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5
    assert number_of_scc(labels) == 3


def test_scc_dag_all_singletons(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], directed=True)
    labels, info = strongly_connected_components(g)
    assert number_of_scc(labels) == 4
    got = _as_map(labels, v="label")
    assert got == {i: i for i in range(4)}
    # the trim peels the whole DAG without any propagation rounds
    assert info.iterations <= 4


def test_scc_ascending_chain_trims_fast(spark):
    # worst case for pure FW-BW-MIN; the in/out-degree trim must peel it
    # in O(chain) cheap rounds, and labels are all singletons
    n = 12
    g = Graph.from_pandas(spark, [(i, i + 1) for i in range(n - 1)], directed=True)
    labels, _ = strongly_connected_components(g)
    assert number_of_scc(labels) == n


def test_scc_undirected_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)])
    with pytest.raises(ValueError):
        strongly_connected_components(g)


def test_triangle_edge_score_book_graph(spark):
    # two triangles sharing edge (1,2): that edge scores 2, others 1;
    # pendant edge (3,4) scores 0
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]
    g = Graph.from_pandas(spark, edges)
    got = {(r["src"], r["dst"]): r["score"] for r in triangle_edge_score(g).collect()}
    assert got == {
        (0, 1): 1, (0, 2): 1, (1, 2): 2, (1, 3): 1, (2, 3): 1, (3, 4): 0,
    }
