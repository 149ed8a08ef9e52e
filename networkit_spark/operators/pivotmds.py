"""PivotMDS graph layout (Brandes & Pich 2007).

Reference: /root/reference/networkit/cpp/viz/PivotMDS.cpp:20-129 —
  - pick numPivots random nodes (:27, GraphTools::randomNodes);
  - Dijkstra distances from every pivot to all nodes (:30-46);
  - double-center the pivot-distance matrix: value − rowMean(v) −
    colMean(j) + grandMean with rowMean over the k pivots, colMean
    over the n nodes, grandMean = Σ rowMean/(2n) + Σ colMean/(2k)
    (:49-71 — the reference centers the RAW distances; the "squared"
    in its comment is not what the code does, and we mirror the code);
  - CC = CᵀC (k×k), then per output dimension a power iteration with
    deflation; coordinates = C · eigenvector (:73-106, 109-128).

Deviations, documented:
  - pivot choice and the power-method init vector are md5-derandomized
    (repo replay rule; the reference draws uniformly);
  - the power method runs a FIXED iteration count instead of the
    1e-6/1500 convergence loop (:115-123) so the DuckDB oracle can
    unroll it — callers pick ``power_iters`` large enough that the
    fixed point is reached to output precision;
  - distances are unweighted hop counts (the contract graphs are
    unweighted; a weighted variant would feed the same centering from
    the Dijkstra relation in operators/distance.py);
  - only REACHED (pivot, node) pairs enter the relation — the
    reference pushes DBL_MAX rows for unreachable nodes, which only
    makes sense on connected graphs; on connected graphs both agree.

Scale shape: the distance relation is a k-source frontier BFS (one
hash join + min-agg per hop, k a small constant), the centering is two
aggregations joined back, CᵀC is an O(n·k²) join-aggregate, and only
the k×k matrix and k-vectors ever reach the driver; coordinates come
back as one broadcast-join projection per dimension.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    materialize_partitioned,
)


def _frac(seed: str, *parts) -> float:
    h = hashlib.md5(
        "|".join([seed] + [str(p) for p in parts]).encode()
    ).hexdigest()
    return int(h[:13], 16) / float(16 ** 13)


def pivot_distances(
    g: Graph, pivots: list[int], max_hops: int = 64
) -> DataFrame:
    """(j, id, d): hop distance from pivot index j to every reached
    node — one multi-source frontier BFS (PivotMDS.cpp:30-46 runs k
    sequential Dijkstras; one tagged frontier is the distributed
    equivalent)."""
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    adj = materialize_partitioned(
        g.adj().select("src", "dst"), "src"
    )
    dist = spark.createDataFrame(
        [(j, int(p), 0) for j, p in enumerate(pivots)], "j long, id long, d long"
    )
    frontier = dist
    hops = 0
    while hops < max_hops and not frontier.isEmpty():
        hops += 1
        nxt = (
            frontier.join(adj.withColumnRenamed("src", "id"), "id")
            .select("j", F.col("dst").alias("id"), F.lit(hops).alias("d"))
            .join(dist.select("j", "id"), ["j", "id"], "left_anti")
            .groupBy("j", "id")
            .agg(F.min("d").alias("d"))
        )
        nxt = ckpt.cut(nxt, hops)
        if nxt.isEmpty():
            break
        dist = ckpt.cut(dist.unionByName(nxt), 1000 + hops)
        frontier = nxt
    return dist


def pivot_mds(
    g: Graph,
    dim: int = 2,
    num_pivots: int = 16,
    power_iters: int = 60,
    seed: str = "pmds",
) -> tuple[DataFrame, list[float]]:
    """((id, x0..x{dim-1}) layout over reached nodes, eigenvalues)."""
    if dim < 1 or num_pivots < dim:
        raise ValueError("need num_pivots >= dim >= 1")
    spark = g.edges.sparkSession
    # pivots: first k nodes in ascending md5 hash order (derandomized
    # GraphTools::randomNodes)
    pivots = [
        int(r["id"])
        for r in g.nodes()
        .select(
            "id",
            F.md5(
                F.concat_ws("|", F.lit(seed + "-p"), F.col("id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "id")
        .limit(num_pivots)
        .collect()
    ]
    k = len(pivots)
    dist = pivot_distances(g, pivots).localCheckpoint(eager=True)
    n = dist.select("id").distinct().count()

    row_mean = dist.groupBy("id").agg(
        (F.sum("d") / F.lit(float(k))).alias("rm")
    )
    col_mean = dist.groupBy("j").agg(
        (F.sum("d") / F.lit(float(n))).alias("cm")
    )
    grand = float(
        row_mean.agg(F.sum(F.col("rm") / F.lit(2.0 * n))).collect()[0][0]
    ) + float(
        col_mean.agg(F.sum(F.col("cm") / F.lit(2.0 * k))).collect()[0][0]
    )
    c = (
        dist.join(row_mean, "id")
        .join(col_mean, "j")
        .select(
            "id",
            "j",
            (
                F.col("d").cast("double") - F.col("rm") - F.col("cm")
                + F.lit(grand)
            ).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    cc_rows = (
        c.select(F.col("j").alias("i"), F.col("id"), F.col("val").alias("a"))
        .join(
            c.select("id", F.col("j").alias("jj"), F.col("val").alias("b")),
            "id",
        )
        .groupBy("i", "jj")
        .agg(F.sum(F.col("a") * F.col("b")).alias("v"))
        .collect()
    )
    cc = [[0.0] * k for _ in range(k)]
    for r in cc_rows:
        cc[r["i"]][r["jj"]] = float(r["v"])

    out = g.nodes().join(dist.select("id").distinct(), "id", "left_semi")
    eigenvalues: list[float] = []
    for d in range(dim):
        w = [2.0 * _frac(seed + "-w", d, i) - 1.0 for i in range(k)]
        for _ in range(power_iters):
            nw = [
                sum(cc[i][j] * w[j] for j in range(k)) for i in range(k)
            ]
            norm = math.sqrt(sum(x * x for x in nw))
            w = [x / norm for x in nw]
        mv = [sum(cc[i][j] * w[j] for j in range(k)) for i in range(k)]
        lam = sum(mv[i] * w[i] for i in range(k)) / sum(
            w[i] * w[i] for i in range(k)
        )
        eigenvalues.append(lam)
        wdf = spark.createDataFrame(
            [(j, w[j]) for j in range(k)], "j long, w double"
        )
        pos = (
            c.join(F.broadcast(wdf), "j")
            .groupBy("id")
            .agg(F.sum(F.col("val") * F.col("w")).alias(f"x{d}"))
        )
        out = out.join(pos, "id", "left")
        # deflate: CC -= (lambda / ||w||^2) * w wT  (||w|| == 1 here,
        # formula kept as the reference writes it, :94-106)
        sq = sum(x * x for x in w)
        factor = lam / sq
        for i in range(k):
            for j in range(k):
                cc[i][j] -= factor * w[i] * w[j]
    return out, eigenvalues
