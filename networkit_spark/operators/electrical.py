"""Electrical distances: effective resistance, commute-time distance,
spanning-edge centrality — Laplacian solves as batched DataFrame
iterations.

References (/root/reference/networkit/cpp/):
- distance/CommuteTimeDistance.cpp (:38-67 exact pair solves L x =
  e_u - e_v via LAMG; :148-161 distance(u,v) = sqrt(|x_u - x_v| *
  vol(G))).
- centrality/SpanningEdgeCentrality.cpp (:33-60): score(e=(u,v)) =
  |x_u - x_v| of the same solve — the effective resistance of e.

Solver deviation (documented): the reference's LAMG multigrid is a
sequential C++ solver; we solve the SPD-singular system with
DAMPED JACOBI sweeps, x' = (1-w) x + w D^-1 (b + A x), w = 0.5 —
a LINEAR STATIONARY iteration, so a fixed sweep count is bit-replayable
by the DuckDB oracle (no data-dependent scalars like CG's alpha/beta;
same reasoning as operators/distancemisc.algebraic_distance).  On a
connected graph every non-constant mode contracts (damping kills the
bipartite -1 mode) and constants cancel in x_u - x_v, so differences
converge to the true resistance; tests verify against the dense
pseudo-inverse on small graphs at high sweep counts.  The sweep count
is an explicit accuracy knob (`iters`), reported untruncated.

Spark-first: ALL right-hand sides solve at once — state is one
(tag, id, x) relation, each sweep one adjacency join + aggregation;
b never leaves the executors, only the final per-tag differences do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def _laplacian_solve_batched(
    g: Graph,
    rhs: DataFrame,
    iters: int = 40,
    omega: float = 0.5,
    checkpointer: Checkpointer | None = None,
    cut_every: int = 5,
) -> DataFrame:
    """Solve L x = b per tag; ``rhs``: (tag, id, b) sparse (missing ids
    mean b = 0).  Returns (tag, id, x) dense over tags x nodes.

    ``cut_every``: lineage-cut cadence — sweeps between cuts chain
    lazily into one job (identical arithmetic, fewer scheduling
    round-trips; the sweep count, not the cadence, defines the
    result)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    wcol = "weight" if g.weighted else None
    adj = g.adj().select(
        "src", "dst",
        (F.col(wcol) if wcol else F.lit(1.0)).cast("double").alias("w"),
    ).localCheckpoint(eager=True)
    deg = (
        adj.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("deg"))
        .localCheckpoint(eager=True)
    )
    tags = rhs.select("tag").distinct()
    base = (
        tags.crossJoin(g.nodes())
        .join(rhs, ["tag", "id"], "left")
        .join(deg, "id", "left")
        .select(
            "tag", "id",
            F.coalesce(F.col("b"), F.lit(0.0)).alias("b"),
            F.coalesce(F.col("deg"), F.lit(0.0)).alias("deg"),
        )
    )
    state = ckpt.cut(base.withColumn("x", F.lit(0.0)), 0)
    for i in range(1, iters + 1):
        ax = (
            adj.join(
                state.select(
                    "tag", F.col("id").alias("dst"), F.col("x").alias("xv")
                ),
                "dst",
            )
            .groupBy("tag", F.col("src").alias("id"))
            .agg(F.sum(F.col("w") * F.col("xv")).alias("ax"))
        )
        state = state.join(ax, ["tag", "id"], "left").select(
            "tag", "id", "b", "deg",
            F.when(
                F.col("deg") > 0,
                (1.0 - omega) * F.col("x")
                + omega
                * (F.col("b") + F.coalesce(F.col("ax"), F.lit(0.0)))
                / F.col("deg"),
            )
            .otherwise(F.col("x"))
            .alias("x"),
        )
        if i % cut_every == 0 or i == iters:
            state = ckpt.cut(state, i)
    return state.select("tag", "id", "x")


def effective_resistance(
    g: Graph,
    pairs: DataFrame,
    iters: int = 40,
    omega: float = 0.5,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(u, v, resistance) for each (tag, u, v) row of ``pairs`` — the
    damped-Jacobi approximation of |x_u - x_v|, L x = e_u - e_v."""
    if g.directed:
        raise ValueError(
            "Commute time distance is only supported for undirected graphs."
        )
    rhs = pairs.select("tag", F.col("u").alias("id"), F.lit(1.0).alias("b")).unionByName(
        pairs.select("tag", F.col("v").alias("id"), F.lit(-1.0).alias("b"))
    )
    x = _laplacian_solve_batched(g, rhs, iters, omega, checkpointer)
    xu = pairs.join(
        x.select("tag", F.col("id").alias("u"), F.col("x").alias("xu")),
        ["tag", "u"],
    )
    return xu.join(
        x.select("tag", F.col("id").alias("v"), F.col("x").alias("xv")),
        ["tag", "v"],
    ).select(
        "u", "v", F.abs(F.col("xu") - F.col("xv")).alias("resistance")
    )


def commute_time_distance(
    g: Graph,
    pairs: DataFrame,
    iters: int = 40,
    omega: float = 0.5,
) -> DataFrame:
    """(u, v, ctd) — sqrt(resistance * vol(G))
    (CommuteTimeDistance.cpp:148-161)."""
    vol = float(
        g.adj()
        .select(
            (F.col("weight") if g.weighted else F.lit(1.0)).alias("w")
        )
        .agg(F.sum("w"))
        .first()[0]
    )
    r = effective_resistance(g, pairs, iters, omega)
    return r.select(
        "u", "v", F.sqrt(F.col("resistance") * F.lit(vol)).alias("ctd")
    )


def spanning_edge_centrality(
    g: Graph,
    sample: int | None = None,
    seed: int = 42,
    iters: int = 40,
    omega: float = 0.5,
) -> DataFrame:
    """(src, dst, score) — effective resistance per (sampled) edge
    (SpanningEdgeCentrality.cpp:33-60).  ``sample``: md5-ranked edge
    subset (None = every edge; each edge is one tagged system, so the
    full mode costs m batched solves — sample on big graphs, exactly
    like the reference's runApproximation exists for)."""
    e = g.edges.select("src", "dst")
    if sample is not None:
        rank = F.md5(
            F.concat_ws(
                "|",
                F.lit(f"sec|{seed}"),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        e = e.orderBy(rank, "src", "dst").limit(sample)
    pairs = e.select(
        F.concat_ws("_", "src", "dst").alias("tag"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
    )
    return effective_resistance(g, pairs, iters, omega).select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("resistance").alias("score"),
    )
