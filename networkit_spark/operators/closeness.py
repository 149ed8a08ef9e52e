"""Closeness and harmonic closeness centrality.

Reference:
  - Closeness: /root/reference/networkit/cpp/centrality/Closeness.cpp:50-113
    and include/networkit/centrality/Closeness.hpp:86-100 — per-source BFS
    (Dijkstra when weighted); STANDARD variant score = 1/sum(dist)
    (requires a connected graph, Closeness.cpp:31-47), GENERALIZED =
    (reached-1)/sum/(n-1); ``normalized`` multiplies by (n-1) resp.
    (reached-1).
  - HarmonicCloseness: /root/reference/networkit/cpp/centrality/
    HarmonicCloseness.cpp:20-49 — score = sum over reachable v != u of
    1/d(u, v); ``normalized`` divides by (n-1).

Spark plan: ONE multi-source level-synchronous BFS with a source-tagged
frontier (s, v) — the same shape as the Brandes forward pass
(operators/betweenness.py) minus path counting. The loop-invariant
adjacency is hash-partitioned on src once and cached; each superstep
shuffles only the (s, v) frontier. Per-source aggregation is a single
hash agg over the settled (s, v, dist) relation.

Exact all-sources closeness is O(n^2) state — the same total work the
reference pays with its n BFS sweeps. For web scale, pass ``sources``
(the vertex subset whose closeness you need, e.g. top-degree
candidates): the state is O(|sources| * n) and the semantics per source
are unchanged — this is the restriction TopCloseness-style algorithms
exploit (reference TopCloseness.cpp prunes the same sweep).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)

STANDARD = "standard"
GENERALIZED = "generalized"


def _tagged_bfs(
    g: Graph,
    src_df: DataFrame,
    max_hops: int | None,
    ckpt: Checkpointer,
) -> tuple[DataFrame, list[dict]]:
    """(s, v, dist) hop distances from every source s to every node v it
    reaches (the reference's per-u BFS, all sources advancing in one
    synchronized frontier). Directed graphs follow out-edges
    (forNeighborsOf, Closeness.cpp:96)."""
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    settled = src_df.select(
        F.col("id").alias("s"), F.col("id").alias("v"),
        F.lit(0).cast("long").alias("dist"),
    )
    settled = ckpt.cut(settled, 0)
    frontier = settled.select("s", "v")
    metrics: list[dict] = []
    hop = 0
    cap = max_hops if max_hops is not None else 2**31
    while hop < cap:
        t0 = time.time()
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(settled.select("s", "v"), ["s", "v"], "left_anti")
        )
        hop += 1
        new_rows = nxt.select("s", "v", F.lit(hop).cast("long").alias("dist"))
        settled = ckpt.cut(settled.unionByName(new_rows), hop)
        frontier = settled.filter(F.col("dist") == hop).select("s", "v")
        reached = frontier.count()
        metrics.append(
            ckpt.log(hop, state=settled, reached=reached, wall_sec=time.time() - t0)
        )
        if reached == 0:
            break
    adj.unpersist()
    return settled, metrics


def _sources(g: Graph, sources) -> DataFrame:
    if sources is None:
        return g.nodes()
    if isinstance(sources, DataFrame):
        return sources.select(F.col("id").cast("long").alias("id"))
    spark = g.edges.sparkSession
    return spark.createDataFrame([(int(s),) for s in sources], "id long")


def closeness(
    g: Graph,
    variant: str = GENERALIZED,
    normalized: bool = False,
    sources=None,
    max_hops: int | None = None,
    check_connectedness: bool = True,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) closeness for every node in ``sources`` (default: all
    nodes = the reference's full run). Unweighted hop distances (the
    reference's BFS mode; weighted graphs use hop counts too — pass a
    Dijkstra-equivalent distance table yourself if you need weighted).

    Score per Closeness.hpp:86-100:
      STANDARD:    1/sum(d)            [* (n-1) when normalized]
      GENERALIZED: (r-1)/sum(d)/(n-1)  [* (r-1)  when normalized]
    with r = #reached (including the source), 0 when sum(d) == 0.
    """
    if variant not in (STANDARD, GENERALIZED):
        raise ValueError(f"unknown closeness variant {variant!r}")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    if variant == STANDARD and check_connectedness:
        # Closeness.cpp:31-47: standard closeness is undefined on
        # disconnected graphs (reference raises; SCC for directed)
        if g.directed:
            from networkit_spark.operators.scc import strongly_connected_components

            comps = strongly_connected_components(g)[0]
        else:
            from networkit_spark.operators.components import connected_components

            comps = connected_components(g)[0]
        if comps.select("label").distinct().count() > 1:
            raise RuntimeError(
                "standard closeness is not defined on disconnected graphs; "
                "use the generalized variant"
            )
    settled, metrics = _tagged_bfs(g, _sources(g, sources), max_hops, ckpt)
    per_src = settled.groupBy(F.col("s").alias("id")).agg(
        F.count("*").alias("r"), F.sum("dist").alias("dsum")
    )
    if variant == STANDARD:
        score = F.when(F.col("dsum") > 0, 1.0 / F.col("dsum")).otherwise(0.0)
        if normalized:
            score = score * F.lit(float(n - 1))
    else:
        score = F.when(
            F.col("dsum") > 0,
            (F.col("r") - 1) / F.col("dsum") / F.lit(float(n - 1)),
        ).otherwise(0.0)
        if normalized:
            score = score * (F.col("r") - 1)
    out = per_src.select("id", score.alias("score"))
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def harmonic_closeness(
    g: Graph,
    normalized: bool = False,
    sources=None,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) harmonic closeness: sum of 1/d(u, v) over reachable
    v != u (HarmonicCloseness.cpp:24-44); normalized divides by n-1."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    settled, metrics = _tagged_bfs(g, _sources(g, sources), max_hops, ckpt)
    per_src = settled.filter(F.col("dist") > 0).groupBy(
        F.col("s").alias("id")
    ).agg(F.sum(1.0 / F.col("dist")).alias("score"))
    out = (
        _sources(g, sources)
        .join(per_src, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    if normalized and n > 1:
        out = out.select("id", (F.col("score") / F.lit(float(n - 1))).alias("score"))
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)
