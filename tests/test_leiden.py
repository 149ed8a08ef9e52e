"""ParallelLeiden property tests (ParallelLeiden.cpp; same strategy as
test_plm.py — the reference validates Leiden by properties, not golden
labels, because its parallel schedule is nondeterministic; ours is
deterministic and must satisfy the same properties plus the Leiden
refinement guarantee)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import modularity
from networkit_spark.operators.leiden import _refine_phase, parallel_leiden
from networkit_spark.operators.plm import _move_phase, plm
from networkit_spark.operators.plp import is_proper_clustering, number_of_clusters
from networkit_spark.plans.superstep import Checkpointer

from tests.test_plm import planted_cliques


def test_leiden_planted_partition_exact(spark):
    g = planted_cliques(spark, k=5, size=6)
    labels, info = parallel_leiden(g, iterations=1)
    assert is_proper_clustering(g, labels)
    assert number_of_clusters(labels) == 5
    for r in labels.collect():
        assert r["label"] == (r["id"] // 6) * 6
    assert info.iterations >= 1


def test_leiden_no_quality_regression_vs_plm(spark):
    g = planted_cliques(spark, k=4, size=5, bridge=True)
    leiden_labels, _ = parallel_leiden(g, iterations=1)
    assert is_proper_clustering(g, leiden_labels)
    q_leiden = modularity(g, leiden_labels)
    plm_labels, _ = plm(g)
    q_plm = modularity(g, plm_labels)
    assert q_leiden >= q_plm - 1e-9
    assert q_leiden > 0.5


def test_refinement_is_a_refinement(spark):
    """The Leiden invariant: every refined community is contained in
    exactly one move community (ParallelLeiden.cpp parallelRefine only
    merges within result[u])."""
    g = planted_cliques(spark, k=3, size=5, bridge=True)
    ckpt = Checkpointer(g.edges.sparkSession, cache_states=False)
    s_labels, _, _ = _move_phase(g, 1.0, 4, ckpt, 0)
    refined = _refine_phase(g, s_labels, 1.0, 4, ckpt, 0)
    j = (
        refined.select("id", F.col("label").alias("rl"))
        .join(s_labels, "id")
        .groupBy("rl")
        .agg(F.countDistinct("label").alias("ns"))
    )
    assert j.filter(F.col("ns") > 1).count() == 0
    # and refinement actually merged something inside the cliques
    assert refined.select("label").distinct().count() < g.number_of_nodes()


def test_leiden_weighted_pull(spark):
    edges = [
        (0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
        (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
        (2, 3, 1.0),
    ]
    g = Graph.from_pandas(spark, edges, weighted=True)
    labels, _ = parallel_leiden(g, iterations=1)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_leiden_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        parallel_leiden(g)
