import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.superstep import Checkpointer
from tests.fixtures import CC_EDGES, CC_EXPECTED_LABELS, CC_N, PR_EDGES, PR_N


def test_pagerank_checkpoint_metrics(spark, tmp_path):
    ckpt = Checkpointer(spark, path=str(tmp_path / "pr"), partition_lineage=True)
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)
    res = pagerank(g, max_iterations=5, checkpointer=ckpt)
    metrics = ckpt.read_metrics()
    assert len(metrics) == 5
    assert all("delta" in m and "superstep" in m for m in metrics)
    # deltas shrink monotonically on this fixture
    deltas = [m["delta"] for m in metrics]
    assert deltas == sorted(deltas, reverse=True)
    # per-partition lineage recorded
    assert all("partitions" in m and m["num_partitions"] >= 1 for m in metrics)
    # durable state exists for the last supersteps
    assert ckpt.completed_steps()


def test_pagerank_resume_identical(spark, tmp_path):
    """Kill/restart contract: run 3 supersteps, 'crash', resume to 8 —
    scores must equal an uninterrupted 8-superstep run exactly."""
    g = Graph.from_pandas(spark, PR_EDGES, weighted=True, n=PR_N)

    ck1 = Checkpointer(spark, path=str(tmp_path / "a"))
    pagerank(g, max_iterations=3, checkpointer=ck1)
    assert ck1.latest()[0] == 3
    resumed = pagerank(g, max_iterations=8, checkpointer=ck1, resume=True)

    full = pagerank(g, max_iterations=8)
    a = {r["id"]: r["score"] for r in resumed.scores.collect()}
    b = {r["id"]: r["score"] for r in full.scores.collect()}
    assert all(abs(a[i] - b[i]) < 1e-15 for i in range(PR_N))
    assert resumed.info.iterations == 8


def test_cc_resume(spark, tmp_path):
    g = Graph.from_pandas(spark, CC_EDGES, n=CC_N)
    ck = Checkpointer(spark, path=str(tmp_path / "cc"))
    labels, _ = connected_components(g, checkpointer=ck)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == CC_EXPECTED_LABELS
    # resume from the converged state: one extra no-change superstep
    labels2, info2 = connected_components(g, checkpointer=ck, resume=True)
    got2 = {r["id"]: r["label"] for r in labels2.collect()}
    assert got2 == CC_EXPECTED_LABELS


def test_checkpointer_gc_keeps_recent(spark, tmp_path):
    ck = Checkpointer(spark, path=str(tmp_path / "gc"), keep=2)
    df = spark.range(10).select(F.col("id"))
    for step in range(1, 6):
        ck.cut(df, step)
    assert ck.completed_steps() == [4, 5]


def test_cut_lineage_debug_roundtrip_audit(spark, monkeypatch):
    """NETWORKIT_SPARK_DEBUG_LINEAGE audits the stats-reset rebuild
    (row count + content vs the plain localCheckpoint) so a silent
    semantic change in Spark's internal internalCreateDataFrame /
    toRdd contract is caught instead of corrupting kernels."""
    from networkit_spark.plans.superstep import cut_lineage

    monkeypatch.setenv("NETWORKIT_SPARK_DEBUG_LINEAGE", "1")
    df = spark.range(1000).selectExpr("id", "id * 2 AS twice")
    out = cut_lineage(df)
    rows = sorted((r["id"], r["twice"]) for r in out.collect())
    assert rows == [(i, 2 * i) for i in range(1000)]
