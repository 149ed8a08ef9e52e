"""Sparsification: per-edge backbone scores + threshold filters.

Reference (/root/reference/networkit/cpp/sparsification/):
  - LocalSimilarityScore.cpp:17-73 — per endpoint i, incident edges are
    ranked by Jaccard-style similarity sim = tri(e)/(deg(i)+deg(j)-tri(e))
    descending (ties: smaller neighbor id first, AttributizedEdge
    operator< in LocalSimilarityScore.hpp:25-27); the edge's
    "sparsification exponent" from i is e = 1 - ln(rank)/ln(deg(i))
    (1.0 when deg(i) <= 1) and the final score is the max over both
    endpoints. Keeping edges with score >= 1 - x keeps each node's top
    ~deg^x incident edges — the local-filtering property that preserves
    community structure at web scale.
  - LocalDegreeScore.cpp:28-74 — same shape ranked by NEIGHBOR degree
    descending with COMPETITION ranking (equal degrees share a rank).
  - GlobalThresholdFilter.cpp:18-49 — subgraph of edges whose score is
    >= threshold (above=True) or <= threshold (above=False).

Spark plan: one triangle_edge_score pass (the oriented-intersection
plan), then a per-endpoint window PARTITIONED BY the node — parallel,
partition size bounded by max degree — and a max-aggregation back onto
the canonical edge. No iteration, three shuffles end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _half_edges(canon: DataFrame) -> DataFrame:
    """(i, j, ...) both orientations of each canonical scored edge."""
    mirrored = canon.select(
        F.col("dst").alias("i"), F.col("src").alias("j"), "t"
    )
    return canon.select(
        F.col("src").alias("i"), F.col("dst").alias("j"), "t"
    ).unionByName(mirrored)


def local_similarity_score(g: Graph) -> DataFrame:
    """(src, dst, score) per id-canonical stored edge —
    LocalSimilarityScore.cpp:17-73 (see module docstring)."""
    from networkit_spark.operators.triangles import triangle_edge_score

    if g.directed:
        raise ValueError("sparsification scores are defined on undirected graphs")
    tes = triangle_edge_score(g).select(
        "src", "dst", F.col("score").cast("double").alias("t")
    )
    deg = g.degrees().select("id", "degree")
    half = (
        _half_edges(tes)
        .join(deg.select(F.col("id").alias("i"), F.col("degree").alias("di")), "i")
        .join(deg.select(F.col("id").alias("j"), F.col("degree").alias("dj")), "j")
        .withColumn(
            "sim", F.col("t") / (F.col("di") + F.col("dj") - F.col("t"))
        )
    )
    w = Window.partitionBy("i").orderBy(F.desc("sim"), F.asc("j"))
    exp = half.withColumn("rank", F.row_number().over(w)).select(
        "i",
        "j",
        F.when(F.col("di") <= 1, 1.0)
        .otherwise(
            1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("di").cast("double"))
        )
        .alias("e"),
    )
    return (
        exp.select(
            F.least("i", "j").alias("src"),
            F.greatest("i", "j").alias("dst"),
            "e",
        )
        .groupBy("src", "dst")
        .agg(F.max("e").alias("score"))
    )


def local_degree_score(g: Graph) -> DataFrame:
    """(src, dst, score) — LocalDegreeScore.cpp:28-74: rank incident
    edges by NEIGHBOR degree descending with competition ranking
    (SQL RANK()), exponent 1 - ln(rank)/ln(deg(i)), max over endpoints."""
    if g.directed:
        raise ValueError("sparsification scores are defined on undirected graphs")
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit(0.0).alias("t"))
        .distinct()
    )
    deg = g.degrees().select("id", "degree")
    half = (
        _half_edges(canon)
        .join(deg.select(F.col("id").alias("i"), F.col("degree").alias("di")), "i")
        .join(deg.select(F.col("id").alias("j"), F.col("degree").alias("dj")), "j")
    )
    w = Window.partitionBy("i").orderBy(F.desc("dj"))
    exp = half.withColumn("rank", F.rank().over(w)).select(
        "i",
        "j",
        F.when(F.col("di") <= 1, 1.0)
        .otherwise(
            1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("di").cast("double"))
        )
        .alias("e"),
    )
    return (
        exp.select(
            F.least("i", "j").alias("src"),
            F.greatest("i", "j").alias("dst"),
            "e",
        )
        .groupBy("src", "dst")
        .agg(F.max("e").alias("score"))
    )


def global_threshold_filter(
    g: Graph, scores: DataFrame, threshold: float, above: bool = True
) -> Graph:
    """GlobalThresholdFilter.cpp:18-49: subgraph keeping edges whose
    score passes the threshold. ``scores`` carries (src, dst, score) in
    the same id-canonical orientation as ``g.edges``."""
    keep = scores.filter(
        F.col("score") >= threshold if above else F.col("score") <= threshold
    ).select("src", "dst")
    edges = g.edges.join(keep, ["src", "dst"], "left_semi")
    return Graph(
        edges=edges, vertices=g.vertices, directed=g.directed, weighted=g.weighted
    )
