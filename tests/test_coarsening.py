"""MatchingCoarsening vs a pure-python replay of the reference
contraction (coarsening/MatchingCoarsening.cpp)."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph

pytestmark = pytest.mark.usefixtures("spark")



def test_matching_coarsening_matches_reference_semantics(spark):
    """Pure-python replay of MatchingCoarsening.cpp:17-56 on a weighted
    fixture with an intra-pair edge (self-loop case) and parallel
    coarse edges."""
    from networkit_spark.operators.coarsening import matching_coarsening

    # nodes 0..6; matching {(1,2), (4,5)}
    eds = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (0, 2, 4.0),
           (3, 4, 5.0), (4, 5, 6.0), (5, 6, 7.0), (3, 5, 8.0)]
    edf = spark.createDataFrame(eds, "src long, dst long, weight double")
    g = Graph(edf, vertices=spark.range(7), directed=False, weighted=True)
    m = spark.createDataFrame(
        [(1, 2, 2.0), (4, 5, 6.0)], "src long, dst long, weight double"
    )
    coarse, mapping = matching_coarsening(g, m)
    fc = {int(r["id"]): int(r["coarse_id"]) for r in mapping.collect()}
    # reference mapping: reps in fine order: 0->0, 1->1 (2 inherits),
    # 3->2, 4->3 (5 inherits), 6->4
    assert fc == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4}
    got = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in coarse.edges.collect()
    }
    want = {}
    for (u, v, w) in eds:
        cu, cv = sorted((fc[u], fc[v]))
        want[(cu, cv)] = want.get((cu, cv), 0.0) + w
    assert got == want
    assert (1, 1) in got  # intra-pair edge became a self-loop
    # noSelfLoops drops it
    coarse2, _ = matching_coarsening(g, m, no_self_loops=True)
    got2 = {
        (int(r["src"]), int(r["dst"]))
        for r in coarse2.edges.select("src", "dst").collect()
    }
    assert (1, 1) not in got2 and got2 == {k for k in want if k[0] != k[1]}
    assert coarse.nodes().count() == 5


def test_matching_coarsening_directed_raises(spark):
    from networkit_spark.operators.coarsening import matching_coarsening

    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    m = spark.createDataFrame([], "src long, dst long, weight double")
    with pytest.raises(ValueError, match="undirected"):
        matching_coarsening(g, m)
