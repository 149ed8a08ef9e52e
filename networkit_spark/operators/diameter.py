"""Diameter (exact / estimated range / sampled) and effective diameter.

Reference:
  - Diameter: /root/reference/networkit/cpp/distance/Diameter.cpp:39-90
    (exact unweighted = estimatedDiameterRange with error 0, :168+ the
    iFUB-style bounding loop, directed graphs rejected at :91) and
    estimatedVertexDiameter (max sampled eccentricity).
  - EffectiveDiameter: /root/reference/networkit/cpp/distance/
    EffectiveDiameter.cpp:27-100 — per node v the smallest hop count h
    (>= 1) at which |N_h(v)| >= ceil(ratio * n), averaged over nodes;
    undirected single-component graphs only (throws otherwise, :18-25).

Spark plan:
  - diameter(): BATCHED iFUB (the fringe-processing idea behind the
    reference's estimatedDiameterRange, batched for a superstep engine).
    One BFS from a max-degree root r gives depths d_r and lb = ecc(r).
    Levels are processed deepest-first; every node of the current level
    becomes a source of ONE tagged multi-source BFS (the closeness
    machinery) and lb absorbs their exact eccentricities. Stop as soon
    as lb >= 2*i (iFUB theorem: any unprocessed u, v have depth <= i, so
    d(u, v) <= d_r(u) + d_r(v) <= 2i <= lb) — lb is then the EXACT
    diameter. Power-law graphs have tiny top levels, so this is a
    handful of batched BFS sweeps with O(|fringe| * n) peak state — the
    scalable plan, not an all-pairs sweep. ``error`` relaxes the stop to
    lb * (1 + error) >= 2*i and returns (lb, max(lb, 2i)) bounds.
  - effective_diameter(): needs the full neighborhood function — an
    all-sources tagged BFS (state O(n^2) rows, same total work as the
    reference's boolean-matrix iteration). Fixture/analysis scale by
    design; sample sources for an estimate at web scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import bfs_distances


def _require_connected_undirected(g: Graph, what: str) -> int:
    if g.directed:
        raise RuntimeError(f"{what} of directed graphs cannot be computed yet.")
    from networkit_spark.operators.components import connected_components

    labels, _ = connected_components(g)
    if labels.select("label").distinct().count() > 1:
        raise RuntimeError(f"Graph not connected - {what} is infinite")
    return g.number_of_nodes()


def diameter(
    g: Graph,
    algo: str = "exact",
    error: float = 0.0,
    n_samples: int = 0,
    check: bool = True,
) -> tuple[int, int]:
    """(lower, upper) diameter bounds; equal for algo="exact"
    (Diameter.cpp exact mode returns the single value, here lower ==
    upper). algo="estimated_range" stops at upper <= lower*(1+error);
    algo="estimated_samples" returns the max eccentricity over
    ``n_samples`` deterministic (md5-seeded) sources — a lower bound,
    like the reference's estimatedVertexDiameter."""
    if check:
        n = _require_connected_undirected(g, "the diameter")
    else:
        n = g.number_of_nodes()
    if n <= 1:
        return 0, 0
    nodes = g.nodes()
    if algo == "estimated_samples":
        if n_samples <= 0:
            raise ValueError("estimated_samples requires n_samples > 0")
        seeds = (
            nodes.select(
                "id",
                F.md5(F.concat(F.lit("diam|"), F.col("id").cast("string"))).alias("h"),
            )
            .orderBy("h", "id")
            .limit(n_samples)
            .collect()
        )
        ecc_max = 0
        for r in seeds:
            dist, _ = bfs_distances(g, [int(r["id"])])
            ecc = int(dist.agg(F.max("dist")).collect()[0][0])
            ecc_max = max(ecc_max, ecc)
        return ecc_max, ecc_max
    if algo not in ("exact", "estimated_range"):
        raise ValueError(f"unknown diameter algo {algo!r}")
    if algo == "exact":
        error = 0.0

    # batched iFUB. Root = max-degree node (Diameter.cpp:183-189 picks
    # per-component max-degree start nodes); ties to smallest id.
    root = int(
        g.degrees()
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(1)
        .collect()[0]["id"]
    )
    depths, _ = bfs_distances(g, [root])
    depths = depths.localCheckpoint(eager=True)
    lb = int(depths.agg(F.max("dist")).collect()[0][0])  # ecc(root)
    i = lb
    from networkit_spark.operators.closeness import _tagged_bfs
    from networkit_spark.plans.superstep import Checkpointer

    while i >= 1 and lb * (1.0 + error) < 2 * i:
        fringe = depths.filter(F.col("dist") == i).select("id")
        if fringe.head(1):
            settled, _ = _tagged_bfs(
                g, fringe, None, Checkpointer(g.edges.sparkSession)
            )
            fringe_ecc = int(settled.agg(F.max("dist")).collect()[0][0])
            lb = max(lb, fringe_ecc)
        i -= 1
    # iFUB invariant at exit: every unprocessed pair sits at depth <= i,
    # so d(u, v) <= 2i; with error=0 the loop only exits once lb >= 2i,
    # hence lb is the exact diameter
    ub = max(lb, 2 * i) if error > 0 else lb
    return lb, ub


def effective_diameter(g: Graph, ratio: float = 0.9, check: bool = True) -> float:
    """Exact effective diameter (EffectiveDiameter.cpp:27-100): mean
    over nodes v of the smallest h >= 1 with |N_h(v)| >= ceil(ratio*n)
    (the reference counts v itself and only checks after the first
    expansion, hence the h >= 1 floor)."""
    if check:
        n = _require_connected_undirected(g, "the effective diameter")
    else:
        n = g.number_of_nodes()
    if n == 0:
        return 0.0
    threshold = int(math.ceil(ratio * n))
    from networkit_spark.operators.closeness import _tagged_bfs
    from networkit_spark.plans.superstep import Checkpointer

    settled, _ = _tagged_bfs(g, g.nodes(), None, Checkpointer(g.edges.sparkSession))
    # cumulative neighborhood size per (source, h) via a running count;
    # eff(s) = smallest h (>= 1) whose cumulative count meets threshold
    per_h = settled.groupBy("s", "dist").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy("s").orderBy("dist")
    cum = per_h.select("s", "dist", F.sum("c").over(w).alias("cum"))
    eff = (
        cum.filter(F.col("cum") >= threshold)
        .groupBy("s")
        .agg(F.greatest(F.min("dist"), F.lit(1)).alias("h"))
    )
    row = eff.agg(F.sum("h").alias("sh")).collect()[0]
    return float(row["sh"]) / n
