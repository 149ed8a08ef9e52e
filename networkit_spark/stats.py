"""Stats module — Gini coefficient over a value relation.

Reference: networkit/stats.pyx gini (:16-38): sort ascending,
cumulative-height area vs the fair area.  Algebraically G =
(2*sum(i * x_i) - (n+1)*sum(x)) / (n*sum(x)) with i the 1-based
ascending rank — rank-tie order cancels for equal values, so any
deterministic tie-break yields the reference's number.

Spark plan (no global window): values are range-bucketed on
data-derived quantile boundaries, ranked WITHIN each bucket
(partitioned window), and shifted by the cumulative bucket counts —
the same distributed-rank pattern as operators/traversal.bfs_from.
Driver state is O(#buckets); the moment sums are one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini(values: DataFrame, col: str = "value", buckets: int = 64) -> float:
    """Gini coefficient of the (single-column) value relation.  All
    values must be non-negative (the reference's fair-area formula
    presumes a non-negative distribution)."""
    v = values.select(F.col(col).cast("double").alias("x"))
    n_total = v.count()
    if n_total == 0:
        return float("nan")
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(v.approxQuantile("x", qs, 0.01)))
    splits = [float("-inf")] + bounds + [float("inf")]
    bucket = None
    for i in range(len(splits) - 1):
        cond = (F.col("x") > F.lit(splits[i])) & (
            F.col("x") <= F.lit(splits[i + 1])
        )
        if i == 0:
            cond = F.col("x") <= F.lit(splits[1])
        bucket = F.when(cond, F.lit(i)) if bucket is None else bucket.when(
            cond, F.lit(i)
        )
    vb = v.withColumn("b", bucket)
    counts = {
        r["b"]: r["c"]
        for r in vb.groupBy("b").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off = values.sparkSession.createDataFrame(offsets, "b long, off long")
    w = Window.partitionBy("b").orderBy("x")
    ranked = (
        vb.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(off), "b")
        .select("x", (F.col("off") + F.col("rk")).alias("i"))
    )
    row = ranked.agg(
        F.sum(F.col("i") * F.col("x")).alias("t"),
        F.sum("x").alias("s"),
        F.count("*").alias("n"),
    ).collect()[0]
    t, s, n = float(row["t"]), float(row["s"]), int(row["n"])
    if s == 0:
        return 0.0
    return (2.0 * t - (n + 1) * s) / (n * s)
