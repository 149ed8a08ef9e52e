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


def _power_iteration_gather(adj: DataFrame, x: DataFrame) -> DataFrame:
    """One gather step y = A x over the (symmetric for undirected)
    adjacency view: y[u] = sum_{(v,u)} w * x[v]."""
    return (
        x.hint("shuffle_hash")
        .join(adj, x.id == adj.src)
        .groupBy("dst")
        .agg(F.sum(F.col("score") * F.col("weight")).alias("mass"))
        .select(F.col("dst").alias("id"), F.col("mass").alias("score"))
    )


def eigenvector_centrality(
    g: Graph, max_iterations: int = 50, tol: float = 0.0
) -> DataFrame:
    """(id, score) — power iteration on the adjacency matrix with L2
    renormalization each step (reference: networkit/cpp/centrality/
    EigenvectorCentrality.cpp — power method, scores normalized so the
    L2 norm is 1; nodes receiving no mass score 0).

    Deterministic contract: init x = 1/sqrt(n) for every node, exactly
    ``max_iterations`` gather+normalize steps when tol<=0.
    """
    from networkit_spark.plans.superstep import Checkpointer, materialize_partitioned

    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges).select("src", "dst", "weight"),
        "src",
    )
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    import math

    x = nodes.select("id", F.lit(1.0 / math.sqrt(n)).alias("score"))
    x = ckpt.cut(x, 0)
    for it in range(1, max_iterations + 1):
        y = _power_iteration_gather(adj, x)
        # keep zero-mass nodes in the vector (score 0) so the id set is stable
        y = (
            nodes.join(y, "id", "left")
            .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
        )
        norm = float(
            y.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).collect()[0][0]
            or 1.0
        )
        x_new = y.select("id", (F.col("score") / F.lit(norm)).alias("score"))
        x_new = ckpt.cut(x_new, it)
        if tol > 0:
            d = (
                x_new.join(x.select("id", F.col("score").alias("prev")), "id")
                .agg(F.max(F.abs(F.col("score") - F.col("prev"))))
                .collect()[0][0]
            )
            x = x_new
            if float(d) <= tol:
                break
        else:
            x = x_new
    adj.unpersist()
    return x


def katz_centrality(
    g: Graph,
    alpha: float = 0.0,
    beta: float = 0.1,
    max_iterations: int = 50,
    tol: float = 1e-8,
    normalized: bool = True,
) -> DataFrame:
    """(id, score) — Katz centrality, reference recurrence
    (/root/reference/networkit/cpp/centrality/KatzCentrality.cpp:26-70):

      - init x = 1 for every node (values filled 1.0, scoreData = values);
      - superstep x'[u] = beta + alpha * sum_{(v,u) in E_in} w * (1 + x[v])
        (updateScore: ``values[u] += ew * alpha * (1 + scoreData[v])``,
        gathered over IN-edges, edgeDirection default IN_EDGES;
        undirected in-view = all neighbors);
      - the carried vector stays UNNORMALIZED between supersteps;
        convergence tests |length_k - length_{k-1}| <= tol where length
        is the L2 norm of the new vector (KatzCentrality.cpp:33-36,59-66);
      - final scores = x / length (KatzCentrality.cpp:68).

    ``alpha=0`` selects the reference default ``1 / (1 + maxDegree)``
    (KatzCentrality.cpp:16-18). ``tol<=0`` runs exactly
    ``max_iterations`` sweeps (deterministic oracle mode);
    ``normalized=False`` skips the final division (diagnostic only —
    the reference always divides)."""
    import math

    from networkit_spark.plans.superstep import Checkpointer, materialize_partitioned

    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    # gather joins x.id == src / groupBy(dst): over raw directed edges
    # (v -> u) this accumulates into u from in-neighbor v = the IN_EDGES
    # direction; undirected uses the symmetric adjacency view
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges).select("src", "dst", "weight"),
        "src",
    )
    nodes = g.nodes().localCheckpoint(eager=True)
    if alpha == 0.0:
        max_deg = (
            g.degrees().agg(F.max("degree")).collect()[0][0] or 0
        )
        alpha = 1.0 / (1.0 + float(max_deg))
    x = nodes.select("id", F.lit(1.0).alias("score"))
    x = ckpt.cut(x, 0)
    length = 0.0
    for it in range(1, max_iterations + 1):
        old_length = length
        # gather alpha * sum w*(1 + x[v]) over in-neighbors, + beta
        y = _power_iteration_gather(adj, x.select("id", (F.col("score") + F.lit(1.0)).alias("score")))
        x_new = (
            nodes.join(y, "id", "left")
            .select(
                "id",
                (
                    F.lit(alpha) * F.coalesce("score", F.lit(0.0)) + F.lit(beta)
                ).alias("score"),
            )
        )
        x_new = ckpt.cut(x_new, it)
        length = float(
            x_new.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).collect()[0][0]
            or 0.0
        )
        x = x_new
        if tol > 0 and math.isclose(length, old_length, rel_tol=0.0, abs_tol=tol):
            break
    adj.unpersist()
    if normalized and length > 0:
        x = x.select("id", (F.col("score") / F.lit(length)).alias("score"))
    return x
