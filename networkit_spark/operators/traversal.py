"""Traversal module — BFS/DFS visit orders and traversal tree edges.

Reference: networkit/traversal.pyx Traversal.BFSfrom/BFSEdgesFrom/
DFSfrom/DFSEdgesFrom wrapping include/networkit/graph/BFS.hpp:20-77
and DFS.hpp:20-67.  The reference invokes a callback per visit; the
engine analogue RETURNS the visit relation — (id, dist, ord) for BFS,
(id, ord) for DFS, and the traversal tree edges.

Determinism stance (documented deviation, same as PLP/PLM tie-breaks):
the reference's visit order depends on adjacency-array iteration
order; here neighbor iteration is the canonical ascending-id order, so
- BFS visits in the total order (dist asc, id asc) — the same LEVELS
  as any BFS, with the within-level order pinned;
- the BFS tree parent of v is the MINIMUM-id neighbor at dist(v)-1
  (the first discoverer under ascending iteration);
- DFS replays the reference's exact mark-on-push stack automaton
  (DFS.hpp:21-38) under ascending adjacency: neighbors are pushed
  ascending, so popped descending — bit-for-bit the C++ order for a
  sorted adjacency array.

Scale: BFS order/tree are fully distributed — the existing
bfs_distances superstep plus one per-level rank window PARTITIONED BY
dist (never a global unpartitioned window; the cross-level offset is a
driver-side cumulative sum over O(diameter) level counts).  A DFS
ORDER is inherently sequential (each pop depends on the whole prefix);
dfs_from collects the adjacency of the (documented fixture-scale)
graph to the driver — the same stance as the BiconnectedComponents
driver-side path.  At web scale, DFS order is not a meaningful ask;
reachability/components cover the use cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import bfs_distances
from networkit_spark.plans.superstep import Checkpointer


def bfs_from(
    g: Graph,
    source: int,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(id, dist, ord) — BFS visit relation from ``source``; ord is the
    0-indexed visit rank under (dist asc, id asc).  Only reached nodes
    appear (BFS.hpp marks the rest unvisited)."""
    dist, _info = bfs_distances(g, [source], max_hops, checkpointer)
    levels = sorted(
        (r["dist"], r["c"])
        for r in dist.groupBy("dist").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for d, c in levels:
        offsets.append((d, acc))
        acc += c
    spark = g.edges.sparkSession
    off = spark.createDataFrame(offsets, "dist long, off long")
    w = Window.partitionBy("dist").orderBy("id")
    return (
        dist.withColumn("rk", F.row_number().over(w) - 1)
        .join(F.broadcast(off), "dist")
        .select("id", "dist", (F.col("off") + F.col("rk")).alias("ord"))
    )


def bfs_edges_from(
    g: Graph,
    source: int,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(src, dst, dist) — BFS tree edges (BFS.hpp:57-77 BFSEdgesFrom):
    dst first discovered from src; src = min-id neighbor at
    dist(dst)-1 under the ascending-iteration stance."""
    dist, _info = bfs_distances(g, [source], max_hops, checkpointer)
    dl = dist.select(F.col("id").alias("dst_id"), F.col("dist").alias("dd"))
    parents = (
        g.adj()
        .join(dist.select(F.col("id").alias("src"),
                          F.col("dist").alias("sd")), "src")
        .join(dl, F.col("dst") == F.col("dst_id"))
        .filter(F.col("sd") + 1 == F.col("dd"))
        .groupBy("dst", "dd")
        .agg(F.min("src").alias("parent"))
    )
    return parents.select(
        F.col("parent").alias("src"), F.col("dst"),
        F.col("dd").alias("dist"),
    )


def _collected_adjacency(g: Graph) -> dict[int, list[int]]:
    adj: dict[int, list[int]] = {}
    for r in (
        g.adj().select("src", "dst").groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .collect()
    ):
        adj[r["src"]] = list(r["nbrs"])
    return adj


def dfs_from(g: Graph, source: int) -> DataFrame:
    """(id, ord) — the reference's mark-on-push stack DFS
    (DFS.hpp:21-38) under ascending adjacency.  Driver-side replay
    (see module scale note)."""
    adj = _collected_adjacency(g)
    marked = {source}
    stack = [source]
    out = []
    while stack:
        u = stack.pop()
        out.append(u)
        for v in adj.get(u, ()):  # ascending push => descending pop
            if v not in marked:
                marked.add(v)
                stack.append(v)
    spark = g.edges.sparkSession
    return spark.createDataFrame(
        [(int(u), int(i)) for i, u in enumerate(out)], "id long, ord long"
    )


def dfs_edges_from(g: Graph, source: int) -> DataFrame:
    """(src, dst, ord) — DFSEdgesFrom (DFS.hpp:46-67): the edge
    (u, v) is emitted when v is first marked during u's pop."""
    adj = _collected_adjacency(g)
    marked = {source}
    stack = [source]
    out = []
    while stack:
        u = stack.pop()
        for v in adj.get(u, ()):
            if v not in marked:
                marked.add(v)
                out.append((u, v))
                stack.append(v)
    spark = g.edges.sparkSession
    return spark.createDataFrame(
        [(int(u), int(v), int(i)) for i, (u, v) in enumerate(out)],
        "src long, dst long, ord long",
    )
