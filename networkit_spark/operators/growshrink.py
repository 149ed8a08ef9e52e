"""GroupClosenessGrowShrink + GroupClosenessLocalSwaps — local-search
refinement of a group's closeness by grow/shrink swap phases.

References (/root/reference/networkit/cpp/centrality/):
- GroupClosenessGrowShrinkImpl.cpp (Angriman, van der Grinten, Meyerhenke
  ALENEX 2020): run() (:484-520) = group BFS (1st + 2nd nearest member
  distances) then `while (findAndSwap() && totalSwaps++ < maxIterations)`.
  findAndSwap (:132-260): GROW — ``insertions`` times pick the node with
  the highest estimated farness decrement and insert it, accumulating
  the EXACT decrement (computeFarnessDecrement); SHRINK — the same
  number of times remove the group member with the LOWEST exact farness
  increment (increment[u] = sum over nodes whose nearest member is u of
  d2 - d1, :158-170 computeFarnessIncrement); accept the swap batch iff
  totalDecrement > totalIncrement, else restore the original group and
  stop (:230-247).  Default ``insertions`` =
  max(1, .5 + diam_estimate / sqrt(|S|)) (:38-48).
- GroupClosenessLocalSwaps.cpp: the single-swap (insertions = 1)
  variant of the same grow/shrink loop.

Documented deviations:
- The reference's GROW pick is a 16x16-bit packed-minimum sketch
  ESTIMATE of the farness decrement (estimateHighestDecrement,
  :380-470, explicitly an estimator of the BFS-DAG size); here the pick
  is the EXACT farness decrement the sketch estimates — computed by the
  strictly-improving candidate BFS already proven for GroupCloseness
  (operators/groupcentrality._improvement_bfs).  The accept/revert
  accounting is exact in both engines.
- Argmax/argmin ties break to the smallest node id (the reference
  iterates an unordered_map — platform-defined order).
- Exact evaluation scans ALL non-members per grow step (fixture-scale;
  at web scale the candidate set is pruned by the group-distance
  histogram bounds exactly as operators/groupcentrality.group_closeness
  does — same machinery, documented there).

Spark-first shape: group state is a driver-side id list (|S| << n, like
the reference); per grow step ONE strictly-improving multi-source BFS
(all candidates advance together, O(improving rows) state); per shrink
step ONE tagged BFS from the |S| members + a two-smallest struct
aggregation per node — no windows, no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.groupcentrality import _improvement_bfs
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def _group_d12(g, group, ckpt):
    """(v, d1, near, d2) — distance to the nearest group member (ties:
    smallest member id), and to the nearest member EXCLUDING that one
    (+inf -> None when |S| = 1 or unreachable)."""
    from networkit_spark.operators.closeness import _tagged_bfs

    spark = g.edges.sparkSession
    grp_df = spark.createDataFrame([(int(u),) for u in group], "id long")
    settled, _ = _tagged_bfs(g, grp_df, None, ckpt)
    per_v = settled.groupBy("v").agg(
        F.min(F.struct("dist", "s")).alias("m1"),
        F.sort_array(F.collect_list(F.struct("dist", "s"))).alias("all"),
    )
    return per_v.select(
        "v",
        F.col("m1.dist").alias("d1"),
        F.col("m1.s").alias("near"),
        # second-best: the first entry whose member differs from near
        F.element_at(
            F.filter(F.col("all"), lambda x: x["s"] != F.col("m1.s")), 1
        )["dist"].alias("d2"),
    )


def grow_shrink(
    g: Graph,
    group,
    insertions: int | None = None,
    max_iterations: int = 100,
) -> tuple[list[int], int, SuperstepResult]:
    """Refine ``group`` by grow/shrink swap batches; returns
    (refined group sorted, totalSwaps, superstep metrics)."""
    if g.directed:
        raise ValueError("grow_shrink supports undirected graphs only")
    group = sorted(int(u) for u in group)
    if not group:
        raise ValueError("group must be non-empty")
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    gg = g.remove_self_loops()
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    nodes = gg.nodes().localCheckpoint(eager=True)

    if insertions is None:
        from networkit_spark.operators.diameter import diameter

        lo, hi = diameter(gg, algo="estimated_range", error=0.1)
        insertions = max(1, int(0.5 + float(hi) / math.sqrt(len(group))))

    def group_d(s):
        """(v, d) group-distance vector; unreachable pinned 0 (quirk
        shared with GroupCloseness.cpp:40 so _improvement_bfs composes)."""
        from networkit_spark.operators.closeness import _tagged_bfs

        grp_df = spark.createDataFrame([(int(u),) for u in s], "id long")
        settled, _ = _tagged_bfs(gg, grp_df, None, ckpt)
        d1 = settled.groupBy("v").agg(F.min("dist").alias("d"))
        return (
            nodes.select(F.col("id").alias("v"))
            .join(d1, "v", "left")
            .select("v", F.coalesce("d", F.lit(0)).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )

    metrics: list[dict] = []
    total_swaps = 0
    tag = 0
    while total_swaps < max_iterations:
        start_group = list(group)
        d_rel = group_d(group)
        # ---- GROW ----
        decrement = 0
        inserted = 0
        for i in range(insertions):
            cand = nodes.select(F.col("id").alias("u")).join(
                spark.createDataFrame([(int(u),) for u in group], "u long"),
                "u",
                "left_anti",
            )
            tag += 2000
            settled = _improvement_bfs(
                adj, cand, d_rel, ckpt, missing_is_inf=False, tag=tag
            )
            gains = (
                settled.join(d_rel.select(F.col("v").alias("w"), "d"), "w")
                .groupBy("u")
                .agg(F.sum(F.col("d") - F.col("dist")).alias("gain"))
                .orderBy(F.desc("gain"), F.asc("u"))
                .limit(1)
                .collect()
            )
            if not gains:
                break
            v, gain = int(gains[0]["u"]), int(gains[0]["gain"])
            group.append(v)
            inserted += 1
            decrement += gain
            # relax d with the pick's improving distances
            pick_df = spark.createDataFrame([(v,)], "u long")
            tag += 2000
            sp = _improvement_bfs(
                adj, pick_df, d_rel, ckpt, missing_is_inf=False, tag=tag
            )
            d_rel = (
                d_rel.join(
                    sp.select(F.col("w").alias("v"), "dist"), "v", "left"
                )
                .select(
                    "v",
                    F.least(
                        F.col("d"), F.coalesce("dist", F.col("d"))
                    ).alias("d"),
                )
                .localCheckpoint(eager=True)
            )
            metrics.append(
                {"phase": "grow", "swap": total_swaps, "pick": v, "gain": gain}
            )
        # ---- SHRINK ----
        increment = 0
        for i in range(inserted):
            d12 = _group_d12(gg, group, ckpt)
            costs = {int(u): 0 for u in group}
            rows = (
                d12.filter(F.col("d2").isNotNull())
                .groupBy("near")
                .agg(F.sum(F.col("d2") - F.col("d1")).alias("c"))
                .collect()
            )
            for r in rows:
                costs[int(r["near"])] = int(r["c"])
            u = min(costs, key=lambda x: (costs[x], x))
            increment += costs[u]
            group.remove(u)
            metrics.append(
                {"phase": "shrink", "swap": total_swaps, "drop": u,
                 "cost": costs[u]}
            )
        if decrement <= increment:
            group = start_group  # revert, stop (findAndSwap -> false)
            break
        total_swaps += 1
    adj.unpersist()
    return (
        sorted(group),
        total_swaps,
        SuperstepResult(iterations=total_swaps, metrics=metrics),
    )


def local_swaps(
    g: Graph, group, max_swaps: int = 100
) -> tuple[list[int], int, SuperstepResult]:
    """GroupClosenessLocalSwaps — the insertions=1 grow/shrink loop
    (GroupClosenessLocalSwaps.cpp; exact-evaluation re-expression)."""
    return grow_shrink(g, group, insertions=1, max_iterations=max_swaps)


def group_closeness_local_search(
    g: Graph,
    group,
    run_grow_shrink: bool = True,
    max_iterations: int = 100,
) -> tuple[list[int], int, SuperstepResult]:
    """GroupClosenessLocalSearch (/root/reference/networkit/cpp/
    centrality/GroupClosenessLocalSearch.cpp): run() (:1026-1049)
    optionally refines the start group with GrowShrink first, then
    iterates findAndSwap (:903-1023) — members u in ascending
    farness-increase order (:924-930); for each, remove u and look for a
    non-member v whose EXACT farness decrease beats the increase
    strictly (insuffcientDecrease, :980-984); swap and restart on
    success, restore u and try the next member otherwise; stop when no
    member admits an improving swap or after ``max_iterations``.

    Documented deviations:
    - The reference scans candidates in descending ESTIMATED-decrease
      order and accepts the first sufficient one, racing OpenMP threads
      (:947-996 — platform-dependent pick); here the pick is the BEST
      exact decrease with ascending-id tie-break.  Any improving swap is
      a valid local-search step; the stopping condition (no improving
      swap exists) is identical.
    - Nodes whose only group connection is the removed member count
      INF = 2^31 toward both increase and decrease (the reference's
      saturating uint16 distance 65535, :37-39, same comparisons).

    Spark-first shape: per candidate-evaluation ONE strictly-improving
    multi-source BFS over ALL candidates at once (_improvement_bfs —
    O(improving rows) state, no windows); group state is a driver-side
    id list exactly like the reference's.
    """
    if g.directed:
        raise ValueError("group_closeness_local_search is undirected-only")
    group = sorted(int(u) for u in group)
    if not group:
        raise ValueError("group must be non-empty")
    INF = 2**31
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)

    if run_grow_shrink:
        group, _, _ = grow_shrink(g, group)
        group = sorted(group)

    gg = g.remove_self_loops()
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    nodes = gg.nodes().localCheckpoint(eager=True)

    metrics: list[dict] = []
    tag = 500_000
    iterations = 0
    while iterations < max_iterations:
        d12 = _group_d12(gg, group, ckpt).localCheckpoint(eager=True)
        inc_rows = (
            d12.groupBy("near")
            .agg(
                F.sum(
                    F.when(F.col("d2").isNull(), F.lit(INF)).otherwise(
                        F.col("d2") - F.col("d1")
                    )
                ).alias("c")
            )
            .collect()
        )
        increase = {int(u): 0 for u in group}
        for r in inc_rows:
            if r["near"] is not None and int(r["near"]) in increase:
                increase[int(r["near"])] = int(r["c"])
        swapped = False
        for u in sorted(group, key=lambda x: (increase[x], x)):
            rest = [x for x in group if x != u]
            if not rest:
                continue
            # distance vector of S \ {u}: d1 where near != u, else d2
            d_minus = d12.select(
                "v",
                F.when(F.col("near") != u, F.col("d1"))
                .otherwise(F.col("d2"))
                .alias("d"),
            ).filter(F.col("d").isNotNull())
            d_minus = d_minus.localCheckpoint(eager=True)
            cand = nodes.select(F.col("id").alias("u")).join(
                spark.createDataFrame([(int(x),) for x in rest], "u long"),
                "u",
                "left_anti",
            )
            tag += 2000
            settled = _improvement_bfs(
                adj, cand, d_minus, ckpt, missing_is_inf=True, tag=tag
            )
            gains = (
                settled.join(
                    d_minus.select(F.col("v").alias("w"), "d"), "w", "left"
                )
                .groupBy("u")
                .agg(
                    F.sum(
                        F.coalesce("d", F.lit(INF)) - F.col("dist")
                    ).alias("gain")
                )
                .orderBy(F.desc("gain"), F.asc("u"))
                .limit(1)
                .collect()
            )
            if not gains:
                continue
            v, dec = int(gains[0]["u"]), int(gains[0]["gain"])
            if dec > increase[u] and v != u:
                group = sorted(rest + [v])
                metrics.append(
                    {"iteration": iterations, "drop": u, "add": v,
                     "increase": increase[u], "decrease": dec}
                )
                swapped = True
                break
        if not swapped:
            break
        iterations += 1
    adj.unpersist()
    return (
        sorted(group),
        iterations,
        SuperstepResult(iterations=iterations, metrics=metrics),
    )
