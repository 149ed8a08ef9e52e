"""Distances: BFS hop distance and SSSP (Bellman-Ford relaxation).

Reference:
  - BFS: /root/reference/networkit/cpp/distance/BFS.cpp:16-79 — level-
    synchronous queue expansion from a source, following out-neighbors
    (forNeighborsOf); distances for unreached nodes are infinity.
  - Dijkstra: /root/reference/networkit/cpp/distance/Dijkstra.cpp:15-93 —
    non-negative weighted SSSP via heap. A priority queue is inherently
    sequential; the distributed equivalent with identical fixpoint (for
    non-negative weights) is synchronous Bellman-Ford relaxation
    supersteps, converging in <= (hop diameter) rounds.

Spark plan: the frontier superstep pattern shared with connected
components — the loop-invariant adjacency is hash-partitioned on src
once and cached; each superstep shuffles only the (shrinking) frontier
and the O(n) distance state. Multi-source is native (the frontier just
starts with several rows), matching MultiTargetBFS-style use.

``max_hops`` bounds the supersteps; the result is then the exact
"shortest distance using at most max_hops edges" relaxation — the
deterministic form the DuckDB oracle unrolls.
"""

from __future__ import annotations

import time
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def _sources_df(g: Graph, sources) -> DataFrame:
    spark = g.edges.sparkSession
    if isinstance(sources, DataFrame):
        return sources.select(F.col("id").cast("long").alias("id"))
    rows = [(int(s),) for s in sources] if isinstance(sources, Iterable) else [(int(sources),)]
    return spark.createDataFrame(rows, "id long")


def bfs_distances(
    g: Graph,
    sources,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, dist) hop distances from the closest source; only reached
    nodes appear (the reference marks unreached as infinity — left-join
    against ``g.nodes()`` for that view). Directed graphs follow
    out-edges exactly like BFS.cpp:41-66."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = materialize_partitioned(g.adj().select("src", "dst"), "src")
    dist = _sources_df(g, sources).select("id", F.lit(0).cast("long").alias("dist"))
    dist = ckpt.cut(dist, 0)
    frontier = dist.select("id")
    metrics: list[dict] = []
    hop = 0
    cap = max_hops if max_hops is not None else 2**31
    while hop < cap:
        t0 = time.time()
        nxt = (
            frontier.join(adj, frontier.id == adj.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
        )
        hop += 1
        new_rows = ckpt.cut(
            nxt.select("id", F.lit(hop).cast("long").alias("dist")), hop
        )
        # union of cut per-hop increments — the full distance relation is
        # never re-materialized per hop; compact every 8 hops
        dist = dist.unionByName(new_rows)
        if hop % 8 == 0:
            dist = ckpt.cut(dist, 10000 + hop)
        frontier = new_rows.select("id")
        reached = frontier.count()
        metrics.append(
            ckpt.log(hop, state=dist, reached=reached, wall_sec=time.time() - t0)
        )
        if reached == 0:
            break
    adj.unpersist()
    return dist, SuperstepResult(iterations=hop, metrics=metrics)


def sssp_distances(
    g: Graph,
    sources,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, dist) non-negative weighted shortest distances (Bellman-Ford
    supersteps; fixpoint equals Dijkstra.cpp for non-negative weights).
    Only reached nodes appear. ``max_hops`` = relaxation rounds (the
    <=k-edge shortest distance)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = materialize_partitioned(g.adj().select("src", "dst", "weight"), "src")
    dist = _sources_df(g, sources).select("id", F.lit(0.0).alias("dist"))
    dist = ckpt.cut(dist, 0)
    frontier = dist
    metrics: list[dict] = []
    it = 0
    cap = max_hops if max_hops is not None else 2**31
    while it < cap:
        t0 = time.time()
        cand = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.id == adj.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = (
            dist.join(cand, "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("new_dist"),
                "dist",
            )
        )
        it += 1
        merged = ckpt.cut(merged, it)
        frontier = merged.filter(
            F.col("dist").isNull() | (F.col("new_dist") < F.col("dist"))
        ).select("id", F.col("new_dist").alias("dist"))
        improved = frontier.count()
        dist = merged.select("id", F.col("new_dist").alias("dist"))
        metrics.append(
            ckpt.log(it, state=dist, improved=improved, wall_sec=time.time() - t0)
        )
        if improved == 0:
            break
    adj.unpersist()
    return dist, SuperstepResult(iterations=it, metrics=metrics)


def eccentricity(g: Graph, source: int) -> tuple[int, int]:
    """GraphTools-style ecc: (farthest node id, hop distance) from
    ``source`` — the reference's Eccentricity::getValue
    (/root/reference/networkit/cpp/distance/Eccentricity.cpp) = max BFS
    distance; ties to the smallest node id (deterministic)."""
    dist, _ = bfs_distances(g, [source])
    row = dist.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    return int(row["id"]), int(row["dist"])


def incomplete_dijkstra(
    g: Graph,
    sources,
    explored=None,
    max_dist: float | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """IncompleteDijkstra (/root/reference/networkit/cpp/distance/
    IncompleteDijkstra.cpp:15-59): multi-source non-negative distances
    that never enter the ``explored`` node set (the reference skips
    explored sources and explored relaxation targets — equivalent to
    Dijkstra on the induced subgraph V \\ explored).  The reference is
    a lazy nearest-first ITERATOR the consumer stops early; the
    relational analogue of stopping is ``max_dist`` — only rows with
    dist < max_dist are returned.  Same Bellman-Ford superstep plan as
    sssp_distances (fixpoint equals Dijkstra for non-negative
    weights)."""
    if explored is not None:
        spark = g.edges.sparkSession
        ex = spark.createDataFrame(
            [(int(x),) for x in explored], "id long"
        )
        edges = (
            g.edges.join(ex.withColumnRenamed("id", "src"), "src",
                         "left_anti")
            .join(ex.withColumnRenamed("id", "dst"), "dst", "left_anti")
        )
        verts = (
            g.nodes().join(ex, "id", "left_anti")
            if g.vertices is not None else None
        )
        g = Graph(edges.select(*g.edges.columns), verts, g.directed,
                  g.weighted)
        src_df = _sources_df(g, sources).join(ex, "id", "left_anti")
    else:
        src_df = _sources_df(g, sources)
    dist, info = sssp_distances(g, src_df, checkpointer=checkpointer)
    if max_dist is not None:
        dist = dist.filter(F.col("dist") < float(max_dist))
    return dist, info
