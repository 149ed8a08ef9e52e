"""Partition/cover quality measures — hand-computed fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.partitionquality import (
    cover_f1_similarity,
    cover_hub_dominance,
    intrapartition_density,
    isolated_interpartition_conductance,
    isolated_interpartition_expansion,
    partition_fragmentation,
    partition_hub_dominance,
    partition_intersection,
    stable_partition_nodes,
)

pytestmark = pytest.mark.usefixtures("spark")

# two triangles joined by one edge; partition = {0,1,2}, {3,4,5}
PAIRS = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


def _mk(spark, pairs=PAIRS):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=False)


def _labels(spark):
    return None


@pytest.fixture
def g_and_p(spark):
    g = _mk(spark)
    p = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    return g, p


def test_partition_hub_dominance(spark, g_and_p):
    g, p = g_and_p
    vals, summ = partition_hub_dominance(g, p)
    v = {r["label"]: r["value"] for r in vals.collect()}
    # every node has internal degree 2, cluster size 3 -> 2/(3-1) = 1.0
    assert v == {0: 1.0, 1: 1.0}
    assert summ["avg"] == 1.0


def test_intrapartition_density(spark, g_and_p):
    g, p = g_and_p
    vals, summ, glob = intrapartition_density(g, p)
    v = {r["label"]: r["value"] for r in vals.collect()}
    assert v == {0: 1.0, 1: 1.0}
    assert glob == 1.0
    assert summ["min"] == 1.0


def test_isolated_interpartition(spark, g_and_p):
    g, p = g_and_p
    # cut = 1 each side; vol(c) = 7 per cluster (3 internal edges x2 + 1)
    vals, summ = isolated_interpartition_conductance(g, p)
    v = {r["label"]: round(r["value"], 9) for r in vals.collect()}
    assert v == {0: round(1 / 7, 9), 1: round(1 / 7, 9)}
    vals_e, _ = isolated_interpartition_expansion(g, p)
    ve = {r["label"]: round(r["value"], 9) for r in vals_e.collect()}
    assert ve == {0: round(1 / 3, 9), 1: round(1 / 3, 9)}
    assert abs(summ["avg"] - 1 / 7) < 1e-12


def test_partition_fragmentation_connected_and_split(spark):
    g = _mk(spark)
    # cluster 0 = {0, 1, 5}: nodes 0,1 connected to 5 through the graph
    # (single component) -> fragmentation 0 for all clusters
    p = spark.createDataFrame(
        [(0, 0), (1, 0), (5, 0), (2, 1), (3, 1), (4, 1)],
        "id long, label long",
    )
    vals, _ = partition_fragmentation(g, p)
    assert all(r["value"] == 0.0 for r in vals.collect())
    # split graph: drop bridge 2-3 -> cluster 0 fragments 2:1
    g2 = _mk(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    vals2, summ2 = partition_fragmentation(g2, p)
    v2 = {r["label"]: round(r["value"], 6) for r in vals2.collect()}
    assert v2[0] == round(1 - 2 / 3, 6)
    assert v2[1] == round(1 - 2 / 3, 6)


def test_stable_partition_nodes(spark, g_and_p):
    g, p = g_and_p
    stable, summ, frac = stable_partition_nodes(g, p)
    s = {r["id"]: r["stable"] for r in stable.collect()}
    # 2 has own weight 2 vs other 1 -> stable; all others fully internal
    assert all(s.values())
    assert frac == 1.0
    # flip: give node 2 label 1 -> own weight (to 3) = 1, other = 2
    p2 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 1), (5, 1)],
        "id long, label long",
    )
    stable2, _, frac2 = stable_partition_nodes(g, p2)
    s2 = {r["id"]: r["stable"] for r in stable2.collect()}
    assert s2[2] is False
    # nodes 0 and 1 tie (own weight == other-label weight) and ties are
    # UNSTABLE per StablePartitionNodes.cpp:32 (lw.second >= ownWeight)
    assert s2[0] is False and s2[1] is False
    assert frac2 == pytest.approx(3 / 6)


def test_cover_hub_dominance_and_f1(spark, g_and_p):
    g, _ = g_and_p
    cover = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)]
        + [(2, 1)],  # overlap: 2 also in subset 1
        "id long, subset long",
    )
    vals, summ = cover_hub_dominance(g, cover)
    v = {r["label"]: r["value"] for r in vals.collect()}
    assert v[0] == 1.0
    # subset 1 = {3,4,5,2}: node 3 has internal deg 3 -> 3/3 = 1.0
    assert v[1] == 1.0
    ref = spark.createDataFrame(
        [(i, 0) for i in range(6)], "id long, subset long"
    )
    fvals, fsumm = cover_f1_similarity(g, cover, ref)
    fv = {r["label"]: r["value"] for r in fvals.collect()}
    # subset 0 vs ref {all 6}: precision 3/6, recall 3/3 -> f1 = 2/3
    assert abs(fv[0] - 2 / 3) < 1e-12
    assert abs(fv[1] - 2 * (4 / 6 * 1.0) / (4 / 6 + 1.0)) < 1e-12


def test_partition_intersection(spark):
    p1 = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    p2 = spark.createDataFrame(
        [(0, 5), (1, 6), (2, 5), (3, 5)], "id long, label long"
    )
    out = partition_intersection(p1, p2)
    rows = {r["id"]: r["label"] for r in out.collect()}
    # classes: (0,5)->0, (0,6)->1, (1,5)->2
    assert rows[0] == 0 and rows[1] == 1
    assert rows[2] == rows[3] == 2
