"""LouvainMapEquation — Infomap-objective Louvain (flow-compression
communities).

Reference: /root/reference/networkit/cpp/community/LouvainMapEquation.cpp
(Wiebigke/Hamann/Gottesbueren). Semantics kept:

  - state per cluster C: volume vol(C) (weighted degrees, self-loops
    twice) and cut(C) (weight of half-edges leaving C), plus
    totalCut = sum of cuts and totalVolume = sum of volumes
    (calculateInitialClusterCutAndVolume, :481-512);
  - local move objective (fitnessChange, :351-395): the map-equation
    codelength delta built from plogp terms p*ln(p) with p = x /
    totalVolume; a node u moves to the neighboring cluster minimizing
    the change, ties to the SMALLEST cluster id, and only if strictly
    better than staying (tryLocalMove, :310-333);
  - the reference's own SYNCHRONOUS parallelization mode collects all
    improving moves of a round and applies them together (:335-341) —
    the mode this port mirrors;
  - ``hierarchical=True`` coarsens by the partition and recurses
    (runHierarchical), exactly the PLM/Leiden level loop.

Deliberate deterministic divergence (same stance as operators/plm.py):
moves are gated by the (id + round) parity half-step to prevent
synchronous oscillation, and rounds stop after two quiet half-rounds.

Scale notes: a round = three hash aggregations (cluster cut+volume
O(n), neighbor-cluster affinities O(m), argmin O(n)) over the cached
dst-partitioned adjacency — the exact PLM move-phase shape with a
different gain expression; no windows, no driver state.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.plm import _node_volumes
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def _plogp(x: Column, total_volume: float) -> Column:
    p = x / F.lit(total_volume)
    return F.when(x > 0, p * F.log(p)).otherwise(0.0)


def louvain_map_equation(
    g: Graph,
    hierarchical: bool = False,
    max_iterations: int = 32,
    max_levels: int = 16,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(labels(id, label), info); labels canonicalized to the minimum
    member node id per community (the PLM/Leiden output convention)."""
    from networkit_spark.operators.coarsening import coarsen

    if g.directed:
        raise ValueError(
            "the map equation objective here is defined on undirected "
            "graphs; convert with to_undirected() first"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, cache_states=False)
    metrics: list[dict] = []
    rounds_total = 0

    assign = g.nodes().select("id", F.col("id").alias("cur"))
    assign = assign.localCheckpoint(eager=True)
    cur_g = g
    levels = max_levels if hierarchical else 1
    for level in range(levels):
        labels, moved, mts = _me_move_phase(
            cur_g, max_iterations, ckpt, level
        )
        metrics.extend(mts)
        rounds_total += len(mts)
        if not moved or level == levels - 1:
            final = (
                assign.join(
                    labels.select(F.col("id").alias("cur"), "label"), "cur"
                ).select("id", F.col("label").alias("c"))
            )
            break
        n_comms = labels.select("label").distinct().count()
        if n_comms == cur_g.number_of_nodes():
            # coarsening would rebuild the same graph — done at this level
            final = (
                assign.join(
                    labels.select(F.col("id").alias("cur"), "label"), "cur"
                ).select("id", F.col("label").alias("c"))
            )
            break
        coarse_g, mapping = coarsen(cur_g, labels, compact=True)
        assign = (
            assign.join(
                mapping.select(F.col("id").alias("cur"), "coarse_id"), "cur"
            )
            .select("id", F.col("coarse_id").alias("cur"))
            .localCheckpoint(eager=True)
        )
        coarse_g.edges = coarse_g.edges.localCheckpoint(eager=True)
        if coarse_g.vertices is not None:
            coarse_g.vertices = coarse_g.vertices.localCheckpoint(eager=True)
        cur_g = coarse_g
    else:  # pragma: no cover
        final = assign.select("id", F.col("cur").alias("c"))

    canon = final.groupBy("c").agg(F.min("id").alias("label"))
    out = final.join(canon, "c").select("id", "label")
    return out, SuperstepResult(iterations=rounds_total, metrics=metrics)


def _me_move_phase(
    g: Graph,
    max_iterations: int,
    ckpt: Checkpointer,
    level: int,
) -> tuple[DataFrame, bool, list[dict]]:
    adj = materialize_partitioned(
        g.adj()
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .localCheckpoint(eager=True),
        "dst",
    )
    vols = (
        _node_volumes(g)
        .select(F.col("id").alias("vid"), "vol")
        .localCheckpoint(eager=True)
    )
    loops = (
        g.edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("vid"))
        .agg(F.sum("weight").alias("loop"))
        .localCheckpoint(eager=True)
    )
    total_volume = float(
        vols.agg(F.coalesce(F.sum("vol"), F.lit(0.0))).collect()[0][0]
    )
    labels = g.nodes().select("id", F.col("id").alias("label"))
    labels = ckpt.cut(labels, level * 1000)
    metrics: list[dict] = []
    any_moved = False
    zero_streak = 0
    prev2: DataFrame | None = None  # labels two rounds ago (cycle check)
    if total_volume <= 0:
        adj.unpersist()
        return labels, False, metrics

    for rnd in range(1, max_iterations + 1):
        t0 = time.time()
        lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("ls"))
        lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
        half = adj.join(lab_src, "src").join(lab_dst, "dst")
        ccut = (
            half.filter(F.col("ls") != F.col("ld"))
            .groupBy(F.col("ls").alias("c"))
            .agg(F.sum("weight").alias("cut"))
        )
        cvol = (
            labels.join(vols, labels.id == vols.vid)
            .groupBy(F.col("label").alias("c"))
            .agg(F.sum("vol").alias("cvol"))
        )
        cstate = (
            cvol.join(ccut, "c", "left")
            .select("c", "cvol", F.coalesce("cut", F.lit(0.0)).alias("cut"))
            .localCheckpoint(eager=True)
        )
        total_cut = float(
            cstate.agg(F.coalesce(F.sum("cut"), F.lit(0.0))).collect()[0][0]
        )
        # neighbor-cluster weights per node (tryLocalMove :291-306)
        aff = (
            labels.hint("shuffle_hash")
            .join(adj, labels.id == adj.dst)
            .groupBy(F.col("src").alias("u"), F.col("label").alias("d"))
            .agg(F.sum("weight").alias("w"))
        )
        cur = labels.select(F.col("id").alias("u"), F.col("label").alias("c0"))
        wcur = (
            aff.join(cur, "u")
            .filter(F.col("d") == F.col("c0"))
            .select("u", F.col("w").alias("wc"))
        )
        base = (
            cur.join(wcur, "u", "left")
            .join(vols.select(F.col("vid").alias("u"), "vol"), "u")
            .join(
                loops.select(F.col("vid").alias("u"), "loop"), "u", "left"
            )
            .join(
                cstate.select(
                    F.col("c").alias("c0"),
                    F.col("cvol").alias("vol0"),
                    F.col("cut").alias("cut0"),
                ),
                "c0",
            )
            .select(
                "u",
                "c0",
                F.coalesce("wc", F.lit(0.0)).alias("wc"),
                "vol",
                F.coalesce("loop", F.lit(0.0)).alias("loop"),
                "vol0",
                "cut0",
            )
        )
        # stay fitness (fitnessChange with target == current, :368-374)
        cdc = 2 * F.col("wc") - F.col("vol") + 2 * F.col("loop")
        stay = (
            _plogp(F.lit(total_cut), total_volume)
            + (
                _plogp(F.col("cut0") + F.col("vol0"), total_volume)
                - _plogp(
                    F.col("cut0") + cdc + F.col("vol0") - F.col("vol"),
                    total_volume,
                )
            )
            - 2.0
            * (
                _plogp(F.col("cut0"), total_volume)
                - _plogp(F.col("cut0") + cdc, total_volume)
            )
        )
        base = base.withColumn("stay", stay)
        cand = (
            aff.join(base, "u")
            .filter(F.col("d") != F.col("c0"))
            .join(
                cstate.select(
                    F.col("c").alias("d"),
                    F.col("cvol").alias("vold"),
                    F.col("cut").alias("cutd"),
                ),
                "d",
            )
        )
        cdt = F.col("vol") - 2 * F.col("w") - 2 * F.col("loop")
        change = (
            _plogp(F.lit(total_cut) + cdc + cdt, total_volume)
            + (
                _plogp(
                    F.col("cutd") + cdt + F.col("vold") + F.col("vol"),
                    total_volume,
                )
                - _plogp(F.col("cutd") + F.col("vold"), total_volume)
            )
            - 2.0
            * (
                _plogp(F.col("cutd") + cdt, total_volume)
                - _plogp(F.col("cutd"), total_volume)
            )
        )
        best = (
            cand.withColumn("chg", change)
            .filter(F.col("chg") < F.col("stay"))
            .filter(F.pmod(F.col("u") + F.lit(rnd), F.lit(2)) == 0)
            .groupBy("u")
            .agg(F.min(F.struct(F.col("chg"), F.col("d"))).alias("m"))
            .select(F.col("u").alias("id"), F.col("m.d").alias("best"))
        )
        merged = labels.join(best, "id", "left").select(
            "id", F.coalesce("best", F.col("label")).alias("new_label"), "label"
        )
        merged = ckpt.cut(merged, level * 1000 + rnd)
        moved = merged.filter(F.col("new_label") != F.col("label")).count()
        metrics.append(
            ckpt.log(
                level * 1000 + rnd,
                level=level,
                round=rnd,
                moved=moved,
                wall_sec=time.time() - t0,
            )
        )
        prev_labels = labels
        labels = merged.select("id", F.col("new_label").alias("label"))
        if moved == 0:
            zero_streak += 1
            if zero_streak >= 2:
                break
        else:
            zero_streak = 0
            any_moved = True
            # synchronous moves on a non-integral objective can enter a
            # period-2 merge cycle the parity gate alone doesn't damp;
            # detect it (labels == labels two rounds ago) and stop —
            # the partition is as converged as the cycle allows
            if prev2 is not None:
                diff = (
                    labels.join(
                        prev2.select("id", F.col("label").alias("l2")), "id"
                    )
                    .filter(F.col("label") != F.col("l2"))
                    .limit(1)
                    .count()
                )
                if diff == 0:
                    break
        prev2 = prev_labels
    adj.unpersist()
    return labels, any_moved, metrics
