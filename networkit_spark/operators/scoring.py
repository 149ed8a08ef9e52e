"""Edge scoring: ModularityScoring.

Reference: /root/reference/include/networkit/scoring/ModularityScoring.hpp
(:41-71): edgeScore(u, v) = w(u, v) / W  -  (wdeg(u) / 2W) * (wdeg(v) / 2W)
— the modularity increase of merging the (singleton) clusters of u and
v; W = total edge weight.

Spark-first: one weighted-degree aggregation joined onto the edge
relation; a single codegen projection per edge, no shuffle beyond the
degree joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def modularity_edge_score(g: Graph) -> DataFrame:
    """(src, dst, score) per edge — Delta-modularity of merging the
    endpoints' singleton clusters."""
    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    e = g.edges.select("src", "dst", w.alias("w"))
    adj = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ) if not g.directed else e
    wdeg = adj.groupBy(F.col("src").alias("id")).agg(
        F.sum("w").alias("wd")
    )
    total = float(e.agg(F.sum("w")).first()[0] or 0.0)
    vol = 2.0 * total
    return (
        # plain shuffle joins: the degree relation is O(n) — never a
        # broadcast candidate at scale; AQE may still elect one when
        # the graph is small
        e.join(
            wdeg.withColumnRenamed("id", "src")
            .withColumnRenamed("wd", "du"),
            "src",
        )
        .join(
            wdeg.withColumnRenamed("id", "dst")
            .withColumnRenamed("wd", "dv"),
            "dst",
        )
        .select(
            "src", "dst",
            (
                F.col("w") / F.lit(total)
                - (F.col("du") / F.lit(vol)) * (F.col("dv") / F.lit(vol))
            ).alias("score"),
        )
    )
