"""Degree-preserving randomization null models.

Reference: /root/reference/networkit/cpp/randomization/EdgeSwitching.cpp
(:10-51 — repeated random 2-edge switches (a,b)+(c,d) -> (a,d)+(c,b),
rejecting self-loops and multi-edges, preserving every degree) and
GlobalCurveball.cpp (global trade rounds — the same null model reached
by whole-round batches).

The reference switches one edge pair at a time against the live graph —
inherently sequential.  This module implements the BATCHED round
variant (documented deviation, same stationary family): per round,
every edge gets an md5 rank, edges are paired within hash buckets, each
pair proposes one of the two switch orientations by an md5 coin, and a
proposal is applied iff
  (1) it creates no self-loop,
  (2) neither created edge exists in the PRE-ROUND edge set, and
  (3) neither created edge is proposed by any other pair this round
      (intra-batch collision -> all involved pairs rejected,
       order-independent).
Applied switches replace both original edges; everything else carries
over.  Each round is two hash aggregations + windows PARTITIONED BY
BUCKET (no global sort, no single-partition window) — scale-safe, and
every draw is md5-derived so the DuckDB oracle replays rounds exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def _klong(*cols):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 13), 16, 10
    ).cast("long")


def edge_switching(
    g: Graph,
    rounds: int = 3,
    seed: int = 42,
    buckets: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[Graph, int]:
    """(randomized graph, number of applied switches).

    Undirected simple graphs only (the reference's model).  The degree
    sequence is preserved exactly; tests assert it.
    """
    if g.directed:
        raise ValueError("edge_switching supports undirected graphs only")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    edges = (
        g.remove_self_loops()
        .edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    applied_total = 0
    for r in range(1, rounds + 1):
        keyed = edges.select(
            "src",
            "dst",
            _klong(F.lit(f"{seed}|{r}"), F.col("src"), F.col("dst")).alias("k"),
        ).withColumn("bucket", F.col("k") % buckets)
        w = Window.partitionBy("bucket").orderBy("k", "src", "dst")
        ranked = keyed.withColumn("rn", F.row_number().over(w) - 1)
        ranked = ranked.withColumn(
            "pid", F.floor(F.col("rn") / 2)
        ).withColumn("side", F.col("rn") % 2)
        e0 = ranked.filter(F.col("side") == 0).select(
            "bucket", "pid", F.col("src").alias("a"), F.col("dst").alias("b")
        )
        e1 = ranked.filter(F.col("side") == 1).select(
            "bucket", "pid", F.col("src").alias("c"), F.col("dst").alias("d")
        )
        coin = _klong(
            F.lit(f"{seed}|c|{r}"), F.col("bucket"), F.col("pid")
        ) % 2
        prop = (
            e0.join(e1, ["bucket", "pid"])
            .withColumn("coin", coin)
            .withColumn(
                "n1s",
                F.when(F.col("coin") == 0, F.least("a", "d")).otherwise(
                    F.least("a", "c")
                ),
            )
            .withColumn(
                "n1d",
                F.when(F.col("coin") == 0, F.greatest("a", "d")).otherwise(
                    F.greatest("a", "c")
                ),
            )
            .withColumn(
                "n2s",
                F.when(F.col("coin") == 0, F.least("c", "b")).otherwise(
                    F.least("b", "d")
                ),
            )
            .withColumn(
                "n2d",
                F.when(F.col("coin") == 0, F.greatest("c", "b")).otherwise(
                    F.greatest("b", "d")
                ),
            )
            .filter(
                (F.col("n1s") != F.col("n1d"))
                & (F.col("n2s") != F.col("n2d"))
                & ~((F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d")))
            )
        )
        # reject proposals whose created edges already exist pre-round
        ex1 = edges.select(
            F.col("src").alias("n1s"), F.col("dst").alias("n1d"),
            F.lit(1).alias("x1"),
        )
        ex2 = edges.select(
            F.col("src").alias("n2s"), F.col("dst").alias("n2d"),
            F.lit(1).alias("x2"),
        )
        prop = (
            prop.join(ex1, ["n1s", "n1d"], "left")
            .join(ex2, ["n2s", "n2d"], "left")
            .filter(F.col("x1").isNull() & F.col("x2").isNull())
            .drop("x1", "x2")
        )
        # intra-batch collisions: any created edge proposed twice kills
        # every pair that proposed it
        created = prop.select(
            "bucket", "pid", F.col("n1s").alias("s"), F.col("n1d").alias("t")
        ).unionByName(
            prop.select("bucket", "pid", F.col("n2s").alias("s"),
                        F.col("n2d").alias("t"))
        )
        dup = (
            created.groupBy("s", "t")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > 1)
        )
        bad = (
            created.join(dup.select("s", "t"), ["s", "t"])
            .select("bucket", "pid")
            .distinct()
        )
        applied = prop.join(bad, ["bucket", "pid"], "left_anti")
        applied = ckpt.cut(applied, r)
        n_applied = applied.count()
        applied_total += n_applied
        removed = applied.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(applied.select(F.col("c").alias("src"),
                                     F.col("d").alias("dst")))
        added = applied.select(
            F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionByName(applied.select(F.col("n2s").alias("src"),
                                     F.col("n2d").alias("dst")))
        edges = ckpt.cut(
            edges.join(removed, ["src", "dst"], "left_anti").unionByName(added),
            100 + r,
        )
    out = Graph(
        edges.withColumn("weight", F.lit(1.0)),
        vertices=g.vertices,
        directed=False,
        weighted=False,
    )
    return out, applied_total
