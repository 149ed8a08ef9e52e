"""ParallelLeiden — Leiden community detection (move + REFINE + coarsen).

Reference: /root/reference/networkit/cpp/community/ParallelLeiden.cpp
(signature include/networkit/community/ParallelLeiden.hpp; Traag et al.
"From Louvain to Leiden"). Semantics kept:

  - per Leiden iteration, a level loop of: local MOVE phase (same
    modularity objective as PLM — the reference's modularityDelta,
    ParallelLeiden.hpp:32-34, equals PLM's gain up to the 2*vol(G)
    scaling), then a REFINEMENT phase, then coarsening by the REFINED
    partition with the coarse graph inheriting the MOVE partition
    (ParallelLeiden.cpp:42-56: "unlike in louvain, 2 coarse Nodes can
    belong to the same community");
  - refinement (parallelRefine, ParallelLeiden.cpp:354-470): start from
    singletons INSIDE each move-community S; only well-connected
    singletons may merge —
      R-set condition:  cut(u, S\\u)  >= gamma * vol(u) * (vol(S) - vol(u)) / vol(G)
      T-set condition:  cut(C, S\\C)  >= gamma * vol(C) * (vol(S) - vol(C)) / vol(G)
    and u joins the refined community C (within S) maximizing
      delta = cut(u, C) - gamma * vol(u) * vol(C) / vol(G)   (>= 0)
    (ParallelLeiden.cpp:434-466; node volumes count self-loops twice,
    calculateVolumes, :64-96);
  - after the level loop, flatten the mapping chain back to original
    ids (flattenPartition, :98-124); repeat ``iterations`` times.

Deliberate divergences (deterministic, documented — the same stance as
operators/plm.py): the reference moves/refines ASYNCHRONOUSLY with
randomized order (its own tests assert properties, not labels). Here
both phases are SYNCHRONOUS rounds with the PLM parity gate
((id + round) % 2 == 0 may act), argmax tie-breaks to the smallest
community id, and refinement additionally drops a merge whose target
community's representative node is itself merging this round (the
async version's "no longer a singleton" re-check, made deterministic).
All gain/condition arithmetic is kept in the vol(G)-scaled form —
exactly integral on integer-weight graphs, hence bit-stable across
engines for the DuckDB oracle.

Scale notes: per refine round = three hash aggregations over the
cached adjacency (refined volumes O(n), community cuts O(m), candidate
scores O(m)) — the same superstep shape as the move phase; no windows
except the per-node argmax struct-max; each level shrinks the graph
like PLM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.plm import _move_phase, _node_volumes
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def _refine_phase(
    g: Graph,
    s_labels: DataFrame,
    gamma: float,
    max_refine_rounds: int,
    ckpt: Checkpointer,
    level: int,
) -> DataFrame:
    """Singleton-merge refinement within the move partition
    (parallelRefine). Returns refined labels (id, label) — a strict
    refinement of ``s_labels``: every refined community lies inside one
    move community."""
    from networkit_spark.plans.superstep import materialize_partitioned

    spark = g.edges.sparkSession
    vol_g = 2.0 * g.total_edge_weight()
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
    s_lab = s_labels.select("id", F.col("label").alias("s")).localCheckpoint(
        eager=True
    )
    # fixed per-phase relations: vol(S) and cut(u, S \ u)
    svol = (
        s_lab.join(vols, s_lab.id == vols.vid)
        .groupBy("s")
        .agg(F.sum("vol").alias("svol"))
        .localCheckpoint(eager=True)
    )
    # intra-S half-edges (u -> v), both endpoints in the same move community
    intra = (
        adj.join(s_lab.select(F.col("id").alias("src"), F.col("s").alias("su")), "src")
        .join(s_lab.select(F.col("id").alias("dst"), F.col("s").alias("sv")), "dst")
        .filter(F.col("su") == F.col("sv"))
        .select("src", "dst", "weight", F.col("su").alias("s"))
        .localCheckpoint(eager=True)
    )
    cutu = intra.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("cutu")
    )
    # R-set eligibility is round-invariant: scaled by vol(G)
    eligible = (
        s_lab.join(cutu, "id", "left")
        .join(vols, s_lab.id == vols.vid)
        .join(svol, "s")
        .filter(
            F.coalesce("cutu", F.lit(0.0)) * F.lit(vol_g)
            >= F.lit(gamma) * F.col("vol") * (F.col("svol") - F.col("vol"))
        )
        .select("id")
        .localCheckpoint(eager=True)
    )

    rl = s_lab.select("id", F.col("id").alias("rl"))
    rl = ckpt.cut(rl, level * 1000 + 500)
    zero_streak = 0
    for rnd in range(1, max_refine_rounds + 1):
        rvol = (
            rl.join(vols, rl.id == vols.vid)
            .groupBy(F.col("rl").alias("c"))
            .agg(F.sum("vol").alias("rvol"))
        )
        rsize = rl.groupBy(F.col("rl").alias("c")).agg(F.count("*").alias("sz"))
        # cut(C, S \ C): intra-S half-edges leaving the refined community
        cutc = (
            intra.join(
                rl.select(F.col("id").alias("src"), F.col("rl").alias("cu")), "src"
            )
            .join(
                rl.select(F.col("id").alias("dst"), F.col("rl").alias("cv")), "dst"
            )
            .filter(F.col("cu") != F.col("cv"))
            .groupBy(F.col("cu").alias("c"))
            .agg(F.sum("weight").alias("cutc"))
        )
        # candidate merges: eligible singleton u -> refined community of an
        # intra-S neighbor, T-condition on the target, delta >= 0
        singles = (
            rl.join(rsize.withColumnRenamed("c", "rl"), "rl")
            .filter((F.col("sz") == 1) & (F.col("rl") == F.col("id")))
            .join(eligible, "id", "left_semi")
            .filter(F.pmod(F.col("id") + F.lit(rnd), F.lit(2)) == 0)
            .select("id")
        )
        cand = (
            intra.join(singles.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(rl.select(F.col("id").alias("dst"), F.col("rl").alias("c")), "dst")
            .filter(F.col("c") != F.col("src"))
            .groupBy(F.col("src").alias("u"), "c", F.col("s"))
            .agg(F.sum("weight").alias("w"))
            .join(rvol, "c")
            .join(cutc, "c", "left")
            .join(svol, "s")
            .join(vols.select(F.col("vid").alias("u"), "vol"), "u")
            .filter(
                # T-set condition, vol(G)-scaled
                F.coalesce("cutc", F.lit(0.0)) * F.lit(vol_g)
                >= F.lit(gamma) * F.col("rvol") * (F.col("svol") - F.col("rvol"))
            )
            .select(
                "u",
                "c",
                (
                    F.col("w") * F.lit(vol_g)
                    - F.lit(gamma) * F.col("vol") * F.col("rvol")
                ).alias("delta"),
            )
            .filter(F.col("delta") >= 0)
        )
        best = (
            cand.groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("delta").alias("g"), (-F.col("c")).alias("neg"))
                ).alias("m")
            )
            .select("u", (-F.col("m.neg")).alias("c"))
        )
        # deterministic async-guard: a merge whose TARGET community's
        # representative is itself merging away this round is dropped
        # (the reference's cutWeights[u] != 0 singleton re-check)
        movers = best.select(F.col("u").alias("c"))
        applied = best.join(movers, "c", "left_anti")
        merged = rl.join(
            applied.select(F.col("u").alias("id"), F.col("c").alias("new_rl")),
            "id",
            "left",
        ).select("id", F.coalesce("new_rl", F.col("rl")).alias("new_rl"), "rl")
        merged = ckpt.cut(merged, level * 1000 + 500 + rnd)
        moved = merged.filter(F.col("new_rl") != F.col("rl")).count()
        rl = merged.select("id", F.col("new_rl").alias("rl"))
        if moved == 0:
            zero_streak += 1
            if zero_streak >= 2:
                break
        else:
            zero_streak = 0
    adj.unpersist()
    return rl.select("id", F.col("rl").alias("label"))


def parallel_leiden(
    g: Graph,
    gamma: float = 1.0,
    iterations: int = 3,
    max_move_rounds: int = 32,
    max_refine_rounds: int = 8,
    max_levels: int = 16,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Leiden over DataFrames. Returns (labels(id, label), info) with
    labels canonicalized to the minimum member node id per community —
    the same output convention as :func:`networkit_spark.operators.plm.plm`.
    """
    from networkit_spark.operators.coarsening import coarsen

    if g.directed:
        raise ValueError(
            "leiden optimizes undirected modularity; convert with "
            "to_undirected() first"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, cache_states=False)
    metrics: list[dict] = []
    rounds_total = 0

    # current flat partition of the ORIGINAL graph (community = label)
    flat = g.nodes().select("id", F.col("id").alias("label"))
    flat = flat.localCheckpoint(eager=True)

    for it in range(iterations):
        assign = g.nodes().select("id", F.col("id").alias("cur"))
        assign = assign.localCheckpoint(eager=True)
        cur_g = g
        # level-0 init: the flat partition from the previous iteration
        init = flat
        it_moved = False
        for level in range(max_levels):
            labels, moved, mts = _move_phase(
                cur_g,
                gamma,
                max_move_rounds,
                ckpt,
                it * 100 + level,
                init_labels=init,
            )
            metrics.extend(mts)
            rounds_total += len(mts)
            it_moved = it_moved or moved
            n_comms = labels.select("label").distinct().count()
            n_nodes = cur_g.number_of_nodes()
            if n_comms == n_nodes or level == max_levels - 1:
                final = (
                    assign.join(
                        labels.select(F.col("id").alias("cur"), "label"), "cur"
                    ).select("id", F.col("label").alias("c"))
                )
                break
            refined = _refine_phase(
                cur_g, labels, gamma, max_refine_rounds, ckpt, it * 100 + level
            )
            if not moved and refined.select("label").distinct().count() == n_nodes:
                # neither phase made progress — coarsening would rebuild
                # the same graph forever
                final = (
                    assign.join(
                        labels.select(F.col("id").alias("cur"), "label"), "cur"
                    ).select("id", F.col("label").alias("c"))
                )
                break
            # coarsen by the REFINED partition; dense ids for the parity
            # gate (partitioned two-phase renumbering, no global window)
            coarse_g, mapping = coarsen(cur_g, refined, compact=True)
            # the coarse graph INHERITS the move partition: coarse node
            # (= refined community) -> its members' move community
            # (ParallelLeiden.cpp:48-51; members agree by construction)
            init = (
                mapping.join(labels, "id")
                .groupBy(F.col("coarse_id").alias("id"))
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
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
        else:  # pragma: no cover — loop always breaks
            final = assign.select("id", F.col("cur").alias("c"))
        canon = final.groupBy("c").agg(F.min("id").alias("label"))
        flat = final.join(canon, "c").select("id", "label").localCheckpoint(
            eager=True
        )
        if not it_moved:
            break
    return flat, SuperstepResult(iterations=rounds_total, metrics=metrics)
