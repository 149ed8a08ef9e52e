"""Sfigality / LocalPartitionCoverage / LaplacianCentrality /
LocalSquareClusteringCoefficient / Luby — hand-computed fixtures and
structural invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.misccentrality import (
    laplacian_centrality,
    local_partition_coverage,
    local_square_clustering,
    luby,
    sfigality,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs, weighted=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


def _scores(df):
    return {int(r["id"]): float(r["score"]) for r in df.collect()}


def test_sfigality_star_and_path(spark):
    # star: hub 0 (deg 4) vs leaves (deg 1): hub 0.0, leaves 1.0
    g = _mk(spark, [(0, i, 1) for i in range(1, 5)])
    s = _scores(sfigality(g))
    assert s[0] == 0.0
    assert all(s[i] == 1.0 for i in range(1, 5))
    # path 0-1-2: ends see one higher-degree neighbour, middle none
    g2 = _mk(spark, [(0, 1, 1), (1, 2, 1)])
    s2 = _scores(sfigality(g2))
    assert s2 == {0: 1.0, 1: 0.0, 2: 1.0}


def test_local_partition_coverage_weighted(spark):
    # 0 in {0,1}; neighbours: 1 (same part, w=2), 2 (other, w=1)
    g = _mk(spark, [(0, 1, 2.0), (0, 2, 1.0)], weighted=True)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 9)], "id long, label long"
    )
    s = _scores(local_partition_coverage(g, labels))
    assert abs(s[0] - 2.0 / 3.0) < 1e-12
    assert s[1] == 1.0
    assert s[2] == 0.0


def test_laplacian_centrality_triangle_plus_leaf(spark):
    # triangle 0-1-2 plus leaf 3 on node 2 (unweighted)
    g = _mk(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1), (2, 3, 1)])
    s = _scores(laplacian_centrality(g))
    # wd: 0->2, 1->2, 2->3, 3->1
    # LC(0) = 4 + (1+2*2) + (1+2*3) = 16
    assert s[0] == 16.0 and s[1] == 16.0
    # LC(2) = 9 + (1+4)+(1+4)+(1+2) = 22 ; LC(3) = 1 + (1+6) = 8
    assert s[2] == 22.0 and s[3] == 8.0
    total = (4 + 4 + 9 + 1) + 8  # sum wd^2 + sum w^2 over both arcs
    sn = _scores(laplacian_centrality(g, normalized=True))
    assert abs(sn[0] - 16.0 / total) < 1e-12


def test_square_clustering_c4(spark):
    # C4 0-1-2-3-0: every node closes exactly its one potential square
    g = _mk(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)])
    s = _scores(local_square_clustering(g))
    assert all(v == 1.0 for v in s.values())
    # path 0-1-2 has no squares
    g2 = _mk(spark, [(0, 1, 1), (1, 2, 1)])
    s2 = _scores(local_square_clustering(g2))
    assert all(v == 0.0 for v in s2.values())


def test_luby_independent_and_maximal(spark):
    pairs = [
        (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 0, 1),
        (2, 5, 1), (5, 6, 1), (6, 7, 1), (7, 5, 1), (8, 9, 1),
    ]
    g = _mk(spark, pairs)
    out, rounds = luby(g)
    chosen = {int(r["id"]) for r in out.filter("in_set").collect()}
    assert rounds >= 1
    adj = {}
    for u, v, _ in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # independent
    assert all(not (adj[u] & chosen) for u in chosen)
    # maximal: every non-member has a chosen neighbour
    others = set(adj) - chosen
    assert all(adj[u] & chosen for u in others)
    # deterministic replay
    out2, _ = luby(g)
    assert chosen == {int(r["id"]) for r in out2.filter("in_set").collect()}


def test_luby_different_seed_may_differ_but_valid(spark):
    pairs = [(i, i + 1, 1) for i in range(9)]
    g = _mk(spark, pairs)
    out, _ = luby(g, seed=7)
    chosen = {int(r["id"]) for r in out.filter("in_set").collect()}
    adj = {}
    for u, v, _ in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    assert all(not (adj[u] & chosen) for u in chosen)
    assert all(adj[u] & chosen for u in set(adj) - chosen)
