"""FloydWarshall: weighted all-pairs shortest paths with negative-edge
support and negative-cycle tagging.

Reference: /root/reference/networkit/cpp/distance/FloydWarshall.cpp
- requires a weighted graph (:13-16); distances init diag 0 + edge
  weights (:44-56); triple loop relaxation (:58-81); tagNegativeCycles
  (:18-35): any w with dist(w, w) < 0 poisons every pair (u, v) with
  u -> w and w -> v reachable — their distance becomes -infinity.

Spark-first plan: the k-th-intermediate triple loop is inherently
sequential in k, so we compute the identical fixpoint by MIN-PLUS
MATRIX SQUARING: D <- min(D, D (+) D), ceil(log2(n)) + 1 rounds — each
round one self-join + min-aggregation on the finite-distance relation.
Any negative-cycle-free shortest path is simple (< n edges), so the
squared fixpoint equals the reference's; poisoned pairs are then
overwritten to -inf exactly like tagNegativeCycles.  The relation
stores only FINITE entries (missing = +inf), so sparsity is preserved
on disconnected graphs.

Deviations (documented): pathMatrix / hops reconstruction is not
materialized (the reference keeps O(n^2) successor matrices for path
queries; the distances relation is the analytics contract), and
multi-edges collapse by MIN instead of last-assignment-wins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

NEG_INF = float("-inf")


def floyd_warshall(
    g: Graph,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, DataFrame]:
    """((u, v, dist) finite-or--inf relation, (id,) nodes in a negative
    cycle).  Pairs with no path are ABSENT (the reference stores +inf)."""
    if not g.weighted:
        raise ValueError("The input graph is unweighted!")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    e = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    if not g.directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    nodes = g.nodes()
    n = nodes.count()
    d = (
        nodes.select(
            F.col("id").alias("u"), F.col("id").alias("v"),
            F.lit(0.0).alias("d"),
        )
        .unionByName(
            e.filter(F.col("src") != F.col("dst")).select(
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.col("w").alias("d"),
            )
        )
        .groupBy("u", "v")
        .agg(F.min("d").alias("d"))
    )
    d = ckpt.cut(d, 0)
    rounds = max(1, math.ceil(math.log2(max(2, n))) + 1)
    for i in range(1, rounds + 1):
        via = (
            d.alias("a")
            .join(d.alias("b"), F.col("a.v") == F.col("b.u"))
            .groupBy(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
            .agg(F.min(F.col("a.d") + F.col("b.d")).alias("nd"))
        )
        d = ckpt.cut(
            d.join(via, ["u", "v"], "full")
            .select(
                "u", "v",
                F.least(
                    F.coalesce(F.col("d"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("d"),
            ),
            i,
        )
    # negative-cycle tagging (FloydWarshall.cpp:18-35)
    negw = d.filter((F.col("u") == F.col("v")) & (F.col("d") < 0)).select(
        F.col("u").alias("w")
    )
    reaches_neg = d.join(
        negw, d["v"] == negw["w"], "inner"
    ).select(F.col("u").alias("pu"), F.col("v").alias("pw"))
    from_neg = d.join(
        negw, d["u"] == negw["w"], "inner"
    ).select(F.col("u").alias("qw"), F.col("v").alias("qv"))
    poisoned = (
        reaches_neg.join(from_neg, reaches_neg["pw"] == from_neg["qw"])
        .select(F.col("pu").alias("u"), F.col("qv").alias("v"))
        .distinct()
    )
    out = (
        d.join(poisoned.withColumn("bad", F.lit(True)), ["u", "v"], "left")
        .select(
            "u", "v",
            F.when(F.col("bad"), F.lit(NEG_INF)).otherwise(F.col("d"))
            .alias("dist"),
        )
    )
    in_cycle = (
        reaches_neg.select(F.col("pu").alias("id"))
        .unionByName(from_neg.select(F.col("qv").alias("id")))
        .distinct()
    )
    return out, in_cycle
