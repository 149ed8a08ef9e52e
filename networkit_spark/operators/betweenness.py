"""Betweenness centrality — multi-source distributed Brandes.

Reference:
  - exact: /root/reference/networkit/cpp/centrality/Betweenness.cpp:22-110
    — per-source SSSP (BFS for unweighted) + dependency accumulation in
    decreasing-distance order:
        delta_s(v) = sum_{w: succ_s(v)} sigma_s(v)/sigma_s(w) * (1 + delta_s(w))
        bc(v) = sum_{s != v} delta_s(v)
  - sampled: EstimateBetweenness
    (/root/reference/networkit/cpp/centrality/EstimateBetweenness.cpp) —
    same dependencies from a source sample, scores scaled by n/k.

Spark plan — ALL sources advance in one frontier keyed (s, v):

  forward (one superstep per BFS level): frontier (s, v, sigma) joins
  the cached src-partitioned adjacency; new (s, dst) pairs aggregate
  path counts sigma and are anti-joined against the settled set; each
  level's (s, v, sigma) relation is retained.

  backward (one superstep per level, descending): delta at level l is a
  join of level-l vertices with their level-(l+1) successors:
  groupBy(s, v) sum of sigma_v/sigma_w * (1 + delta_w).

  bc(v) = hash-agg over all (s != v) dependency rows.

State is O(#sources * n) rows; supersteps = 2 * eccentricity. For the
exact variant on an n-node graph that is O(n^2) state — the reference
has the same total work; sample sources (estimate_betweenness) for
anything big, exactly as the reference prescribes.
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


def betweenness(
    g: Graph,
    sources: DataFrame | list | None = None,
    max_hops: int | None = None,
    normalized: bool = False,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) betweenness over shortest-path DAGs from ``sources``
    (default: every node = the exact Brandes sum). Unweighted hop
    shortest paths (the reference's BFS mode). ``max_hops`` caps the
    forward expansion (the <=k-hop dependency sum — what the unrolled
    oracle computes). ``normalized`` divides by (n-1)(n-2) as the
    reference does for undirected graphs (both (s,t) orders are summed,
    mirroring Betweenness.cpp's full source loop)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    if sources is None:
        src_df = nodes
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").cast("long").alias("id"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    metrics: list[dict] = []

    # ---- forward: multi-source BFS with path counting -------------------
    frontier = src_df.select(
        F.col("id").alias("s"), F.col("id").alias("v"), F.lit(1.0).alias("sigma")
    )
    frontier = ckpt.cut(frontier, 0)
    levels: list[DataFrame] = [frontier]  # levels[l] = (s, v, sigma) at dist l
    settled = frontier.select("s", "v")
    cap = max_hops if max_hops is not None else 2**31
    lvl = 0
    while lvl < cap:
        t0 = time.time()
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", F.col("nv").alias("v"), "sigma")
            .join(settled, ["s", "v"], "left_anti")
        )
        lvl += 1
        nxt = ckpt.cut(nxt, lvl)
        cnt = nxt.count()
        metrics.append(
            ckpt.log(lvl, state=nxt, phase="fwd", frontier=cnt, wall_sec=time.time() - t0)
        )
        if cnt == 0:
            lvl -= 1
            break
        levels.append(nxt)
        settled = settled.unionByName(nxt.select("s", "v")).localCheckpoint(
            eager=True
        )
        frontier = nxt

    # ---- backward: dependency accumulation, deepest level first ---------
    # delta rows exist only where > 0; at the deepest level all deltas are 0
    delta = levels[-1].select("s", "v", F.lit(0.0).alias("delta"))
    acc = None  # accumulated (s, v, delta) over all levels (delta > 0 rows)
    for l in range(len(levels) - 2, -1, -1):
        t0 = time.time()
        cur = levels[l]
        child = delta.select(
            "s",
            F.col("v").alias("w"),
            F.col("delta").alias("dw"),
        ).join(
            levels[l + 1].select("s", F.col("v").alias("w"), F.col("sigma").alias("sw")),
            ["s", "w"],
        )
        # successors of v at level l are its adjacency targets at level l+1
        contrib = (
            cur.hint("shuffle_hash")
            .join(adj, cur.v == adj.src)
            .select("s", "v", "sigma", F.col("dst").alias("w"))
            .join(child, ["s", "w"])
            .groupBy("s", "v")
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sw")) * (F.lit(1.0) + F.col("dw"))
                ).alias("delta")
            )
        )
        delta = (
            cur.select("s", "v")
            .join(contrib, ["s", "v"], "left")
            .select("s", "v", F.coalesce("delta", F.lit(0.0)).alias("delta"))
        )
        delta = ckpt.cut(delta, 1000 + l)
        acc = delta if acc is None else acc.unionByName(delta).localCheckpoint(
            eager=True
        )
        metrics.append(
            ckpt.log(1000 + l, state=delta, phase="bwd", level=l, wall_sec=time.time() - t0)
        )

    if acc is None:
        acc = delta
    bc = (
        acc.filter(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("score"))
    )
    out = (
        nodes.join(bc, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    if normalized and n > 2:
        out = out.select(
            "id", (F.col("score") / F.lit(float((n - 1) * (n - 2)))).alias("score")
        )
    adj.unpersist()
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def estimate_betweenness(
    g: Graph,
    n_samples: int,
    seed: int = 42,
    max_hops: int | None = None,
    normalized: bool = False,
) -> tuple[DataFrame, SuperstepResult]:
    """EstimateBetweenness: dependencies from a deterministic source
    sample (smallest n_samples md5-hash values — RNG-free and
    cross-engine reproducible instead of Aux::Random draws), then the
    reference's extrapolation: scores * (2n / nSamples), divided by
    (n-1)(n-2) when normalized (EstimateBetweenness.cpp:85-110)."""
    nodes = g.nodes()
    n = nodes.count()
    ranked = nodes.select(
        "id",
        F.md5(F.concat(F.lit(f"{seed}|"), F.col("id").cast("string"))).alias("h"),
    ).orderBy("h", "id").limit(n_samples).select("id")
    scores, info = betweenness(g, sources=ranked, max_hops=max_hops)
    if n_samples > 0:
        factor = 2.0 * n / n_samples
        if normalized and n > 2:
            factor /= float((n - 1) * (n - 2))
        scores = scores.select(
            "id", (F.col("score") * F.lit(factor)).alias("score")
        )
    return scores, info
