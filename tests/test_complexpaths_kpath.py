"""ComplexPathAlgorithm + KPathCentrality — hand-computed fixtures and
structural invariants (reference:
networkit/cpp/centrality/ComplexPaths.cpp, KPathCentrality.cpp)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.complexpaths import (
    complex_contagion,
    complex_path_graph,
    complex_path_lengths,
    generate_seeds,
)
from networkit_spark.operators.kpath import k_path_centrality

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs, weighted=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


# 0-1 is the seed edge (deg(0)=3 but the md5 pick is irrelevant when we
# call complex_contagion directly); 2 sees {0,1}, 3 sees {0,2} (round 2),
# 4 hangs off 3 (never reaches threshold 2), 5 hangs off 4.
CPX_EDGES = [
    (0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1), (0, 3, 1),
    (3, 4, 1), (4, 5, 1),
]


def test_complex_contagion_rounds(spark):
    g = _mk(spark, CPX_EDGES)
    act, rounds = complex_contagion(g, [0, 1], threshold=2)
    got = {int(r["id"]): int(r["round"]) for r in act.collect()}
    act.unpersist()
    assert got == {0: 0, 1: 0, 2: 1, 3: 2}
    assert rounds == 3  # round 3 is the no-growth fixpoint check


def test_complex_path_graph_edges_and_nonspread(spark):
    g = _mk(spark, CPX_EDGES)
    # seed 5 has one neighbor (4): seeds {5, 4}; nobody else ever sees
    # two active neighbors, so the contagion stalls at the seed set.
    act, ce, rounds = complex_path_graph(g, seed=5, threshold=2)
    got = {int(r["id"]) for r in act.collect()}
    assert got == {4, 5}
    # complex graph = edges incident to an activated node
    edges = {(int(r["src"]), int(r["dst"])) for r in ce.collect()}
    assert edges == {(3, 4), (4, 5)}
    act.unpersist()


def test_generate_seeds_distance2_fallback(spark):
    # seed 5 (deg 1) with threshold 3 needs 2 picks: neighbor 4 plus one
    # distance-2 node (only 3 qualifies).
    g = _mk(spark, CPX_EDGES)
    seeds = generate_seeds(g, 5, 3)
    assert seeds[0] == 5
    assert set(seeds) == {5, 4, 3}
    with pytest.raises(ValueError):
        generate_seeds(g, 0, 0)


def test_complex_path_lengths_complete_graph(spark):
    # K4 with threshold 2: from any seed the whole clique activates and
    # the complex graph is K4 itself -> PLci(u) = (1+1+1)/4 for all u.
    k4 = [(u, v, 1) for u in range(4) for v in range(u + 1, 4)]
    g = _mk(spark, k4)
    plci = complex_path_lengths(g, threshold=2)
    got = {int(r["id"]): float(r["plci"]) for r in plci.collect()}
    assert got == {i: 0.75 for i in range(4)}


def test_complex_path_lengths_normalized_sources(spark):
    g = _mk(spark, CPX_EDGES)
    plci = complex_path_lengths(g, threshold=2, sources=[0, 5],
                                normalize=True)
    got = {int(r["id"]): float(r["plci"]) for r in plci.collect()}
    assert set(got) == {0, 5}
    assert min(got.values()) == 0.0 and max(got.values()) == 1.0


def test_kpath_two_node_exact(spark):
    # 0-1 with k=1: every walk makes exactly one step to the other node,
    # so counter sums to t and score(v) = k*n*counter[v]/t with
    # counter[0]+counter[1] = t.
    g = _mk(spark, [(0, 1, 1)])
    scores, info = k_path_centrality(g, k=1, seed=7, n_walks=16)
    got = {int(r["id"]): float(r["score"]) for r in scores.collect()}
    assert info.iterations <= 1
    assert abs(sum(got.values()) - 1 * 2) < 1e-9
    assert all(v >= 0 for v in got.values())


def test_kpath_star_hub_dominates(spark):
    # star: every leaf-start walk hits the hub on step 1; hub-start
    # walks spread over the leaves -> hub counter is the max.
    g = _mk(spark, [(0, i, 1) for i in range(1, 7)])
    scores, _ = k_path_centrality(g, k=3, seed=11, n_walks=60)
    got = {int(r["id"]): float(r["score"]) for r in scores.collect()}
    assert got[0] == max(got.values())
    assert got[0] > 0


def test_kpath_self_avoiding_path_graph(spark):
    # path 0-1: with k=3 a walk is forced back to its start, which is
    # already visited, so no walk ever counts more than one visit.
    g = _mk(spark, [(0, 1, 1)])
    scores, _ = k_path_centrality(g, k=3, seed=3, n_walks=12)
    got = {int(r["id"]): float(r["score"]) for r in scores.collect()}
    # total counted visits == t  =>  sum(score) = k*n = 6
    assert abs(sum(got.values()) - 3 * 2) < 1e-9


def test_kpath_weighted_mode_runs(spark):
    g = _mk(spark, [(0, 1, 0.5), (1, 2, 2.0), (0, 2, 1.0)], weighted=True)
    scores, info = k_path_centrality(g, k=2, seed=5, n_walks=20)
    rows = scores.collect()
    assert len(rows) == 3
    assert all(float(r["score"]) >= 0 for r in rows)
    assert info.iterations <= 2


def test_kpath_validates_alpha(spark):
    g = _mk(spark, [(0, 1, 1)])
    with pytest.raises(ValueError):
        k_path_centrality(g, alpha=0.7)
