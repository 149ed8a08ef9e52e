"""Degree centrality + score-vector accessors/ranking.

Reference: DegreeCentrality (/root/reference/networkit/cpp/centrality/
DegreeCentrality.cpp:16-40) and the Centrality base accessors
(/root/reference/networkit/cpp/centrality/Centrality.cpp:22-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def degree_centrality(
    g: Graph,
    normalized: bool = False,
    out_deg: bool = True,
    ignore_self_loops: bool = True,
) -> DataFrame:
    """(id, score) — score = degree (in or out), optionally divided by
    the max possible degree as the reference does (DegreeCentrality.cpp:
    normalization by maximum score)."""
    gg = g.remove_self_loops() if ignore_self_loops else g
    deg = gg.degrees() if out_deg else gg.in_degrees()
    scores = deg.select("id", F.col("degree").cast("double").alias("score"))
    if normalized:
        mx = scores.agg(F.max("score")).collect()[0][0] or 1.0
        scores = scores.select("id", (F.col("score") / F.lit(float(mx))).alias("score"))
    return scores


def ranking(scores: DataFrame, k: int | None = None) -> DataFrame:
    """Centrality::ranking() — desc score, asc id tie-break
    (Centrality.cpp:27-39)."""
    r = scores.orderBy(F.desc("score"), F.asc("id"))
    return r.limit(k) if k is not None else r


def centralization(g: Graph, scores: DataFrame) -> float:
    """Centrality.cpp:74-91: sum(max - score) / theoretical max sum —
    we return the numerator normalized by (n-1)*max as the Freeman
    centralization over the observed scores."""
    row = scores.agg(F.max("score").alias("mx"), F.sum("score").alias("s"),
                     F.count("*").alias("n")).collect()[0]
    mx, s, n = float(row["mx"]), float(row["s"]), int(row["n"])
    if n <= 1 or mx == 0:
        return 0.0
    return (n * mx - s) / ((n - 1) * mx)
