"""PLM — parallel Louvain method (modularity-optimizing communities).

Reference: /root/reference/networkit/cpp/community/PLM.cpp:30-262
(signature include/networkit/community/PLM.hpp; Python wrapper
networkit/community.pyx:608+). Semantics kept:

  - singleton init (PLM.cpp:36-38);
  - node volume ``vol(u) = weightedDegree(u) + weight(u,u)`` — the
    self-loop counted twice (PLM.cpp:48-51);
  - move phase: for each node u with current community C, affinity to a
    neighboring community D = total edge weight from u to D excluding
    self-loops (PLM.cpp:95-117); modularity gain for C -> D
    (PLM.cpp:131-139, divisor = 2*total^2 at :44):

        delta = (aff_D - aff_C)/total
                + gamma * ((vol(C\\u) - vol(D\\u)) * vol(u)) / (2*total^2)

    with vol(C\\u) = vol(C) - vol(u) and vol(D\\u) = vol(D) since u is
    not in D; best D = strictly-greater scan over communities in
    ascending id order -> ties break to the SMALLEST community id
    (PLM.cpp:142-176, std::map iteration); move iff delta > 0
    (PLM.cpp:179-196);
  - repeat the move phase until no node moves or ``max_move_rounds``
    (movePhase do-while, PLM.cpp:199-226);
  - if anything changed: coarsen by the partition (existing
    :func:`networkit_spark.operators.coarsening.coarsen` =
    ParallelPartitionCoarsening) and recurse on the quotient graph,
    then project labels back (PLM.cpp:236-262); here the recursion is
    an iterative level loop.

Deliberate divergences (documented, deterministic):
  - the reference moves nodes ASYNCHRONOUSLY in parallel (tryMove under
    parallelForNodes, schedule-dependent output; its own tests assert
    properties, not labels). Our move phase is SYNCHRONOUS: every node
    evaluates its best move against the PREVIOUS round's assignment and
    all positive-gain moves apply at once. Output is deterministic; the
    same property fixtures (planted partitions, modularity range)
    validate it. Sync-move oscillation (two nodes swapping into each
    other's community forever) is bounded by ``max_move_rounds``.
  - ``refine=False`` only (the reference default).
  - final labels are canonicalized to the MINIMUM member node id per
    community (the reference keeps arbitrary subset ids and compacts).

Scale notes: the per-round plan is three hash aggregations (community
volumes O(n), affinities O(m), argmax O(n)) and shuffle-hash joins onto
the cached src-partitioned adjacency — no windows, no sorts, no
driver-side state; gains are computed in the 2*total^2-scaled form
(exactly integral on integer-weight graphs, hence bit-stable across
engines). Each level's graph shrinks geometrically, so the coarsen
recursion costs a constant factor over the first level.
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


def _node_volumes(g: Graph) -> DataFrame:
    """(id, vol): weighted degree + self-loop weight again (PLM.cpp:48-51)."""
    wdeg = (
        g.adj()
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    loops = (
        g.edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("lw"))
    )
    return (
        g.nodes()
        .join(wdeg, "id", "left")
        .join(loops, "id", "left")
        .select(
            "id",
            (
                F.coalesce("wdeg", F.lit(0.0)) + F.coalesce("lw", F.lit(0.0))
            ).alias("vol"),
        )
    )


def _move_phase(
    g: Graph,
    gamma: float,
    max_move_rounds: int,
    ckpt: Checkpointer,
    level: int,
    init_labels: DataFrame | None = None,
) -> tuple[DataFrame, bool, list[dict]]:
    """Synchronous local moves to a fixpoint (or the round cap).

    ``init_labels`` (id, label) seeds the starting partition — PLM
    starts from singletons (the default); Leiden levels inherit the
    previous level's partition (ParallelLeiden.cpp:49-51).

    Returns (labels(id, label), any_move_happened, metrics)."""
    spark = g.edges.sparkSession
    # lineage cut BEFORE the persist: the undirected adj() is a
    # self-union of the edges relation, and CacheManager's canonical
    # subtree matching on that shape can mis-rewrite attributes inside
    # this function's labels self-joins ("key not found: id#N" in
    # InMemoryRelation.withOutput). A LogicalRDD cache key cannot
    # spuriously match anything else.
    adj = materialize_partitioned(
        g.adj()
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .localCheckpoint(eager=True),
        "dst",
    )
    # alias id -> vid BEFORE the lineage cut: labels and vols otherwise
    # both descend from g.nodes() and their two checkpointed leaf
    # relations would carry the SAME id exprId, which breaks Catalyst's
    # attribute dedup when both appear in one round's query tree
    vols = (
        _node_volumes(g)
        .select(F.col("id").alias("vid"), "vol")
        .localCheckpoint(eager=True)
    )
    total = g.total_edge_weight()
    if init_labels is None:
        labels = g.nodes().select("id", F.col("id").alias("label"))
    else:
        labels = init_labels.select("id", "label")
    labels = ckpt.cut(labels, level * 1000)
    metrics: list[dict] = []
    any_moved = False
    zero_streak = 0
    if total <= 0:
        adj.unpersist()
        return labels, False, metrics

    for rnd in range(1, max_move_rounds + 1):
        t0 = time.time()
        # vol per community under the current assignment
        vol_comm = (
            labels.join(vols, labels.id == vols.vid)
            .groupBy("label")
            .agg(F.sum("vol").alias("cvol"))
        )
        # affinity of u to each neighboring community D (self-loops excluded
        # by the adj filter above)
        aff = (
            labels.hint("shuffle_hash")
            .join(adj, labels.id == adj.dst)
            .groupBy(F.col("src").alias("u"), F.col("label").alias("d"))
            .agg(F.sum("weight").alias("w"))
        )
        cur = labels.select(F.col("id").alias("u"), F.col("label").alias("c"))
        aff_c = (
            aff.join(cur, "u")
            .filter(F.col("d") == F.col("c"))
            .select("u", F.col("w").alias("wc"))
        )
        cand = (
            aff.join(cur, "u")
            .filter(F.col("d") != F.col("c"))
            .join(aff_c, "u", "left")
            .join(
                vol_comm.select(F.col("label").alias("c"), F.col("cvol").alias("volc")),
                "c",
            )
            .join(
                vol_comm.select(F.col("label").alias("d"), F.col("cvol").alias("vold")),
                "d",
            )
            .join(vols.select(F.col("vid").alias("u"), "vol"), "u")
            .select(
                "u",
                "d",
                (
                    F.lit(2.0 * total)
                    * (F.col("w") - F.coalesce("wc", F.lit(0.0)))
                    + F.lit(gamma)
                    * ((F.col("volc") - F.col("vol")) - F.col("vold"))
                    * F.col("vol")
                ).alias("gain"),
            )
        )
        # argmax with smallest-community tie-break, move iff gain > 0.
        # Parity gate: only nodes with (id + round) % 2 == 0 may move
        # this round. Synchronous moves without it livelock on symmetric
        # structures (two tied nodes swapping into each other's
        # community forever — e.g. equal-weight triangle pairs); the
        # alternating half-step is the standard distributed-Louvain
        # remedy and keeps the rounds deterministic.
        best = (
            cand.filter(F.col("gain") > 0)
            .filter(F.pmod(F.col("u") + F.lit(rnd), F.lit(2)) == 0)
            .groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("gain").alias("g"), (-F.col("d")).alias("neg"))
                ).alias("m")
            )
            .select(F.col("u").alias("id"), (-F.col("m.neg")).alias("best"))
        )
        merged = labels.join(best, "id", "left").select(
            "id", F.coalesce("best", F.col("label")).alias("new_label"), "label"
        )
        merged = ckpt.cut(merged, level * 1000 + rnd)
        moved = merged.filter(F.col("new_label") != F.col("label")).count()
        metrics.append(
            ckpt.log(
                level * 1000 + rnd,
                state=merged,
                level=level,
                round=rnd,
                moved=moved,
                wall_sec=time.time() - t0,
            )
        )
        labels = merged.select("id", F.col("new_label").alias("label"))
        if moved == 0:
            zero_streak += 1
            # a zero round only proves HALF the nodes have no move
            # (parity gate) — fixpoint needs both parities quiet
            if zero_streak >= 2:
                break
        else:
            zero_streak = 0
            any_moved = True
    adj.unpersist()
    return labels, any_moved, metrics


def plm(
    g: Graph,
    gamma: float = 1.0,
    max_move_rounds: int = 32,
    max_levels: int = 16,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Louvain over DataFrames. Returns (labels(id, label), info) with
    labels canonicalized to the minimum member node id per community.

    ``max_move_rounds`` mirrors the reference's maxIter (PLM.hpp, default
    32 rounds per level); ``max_levels`` bounds the coarsen recursion
    (the reference recurses while the move phase changes anything,
    PLM.cpp:236)."""
    from networkit_spark.operators.coarsening import coarsen

    if g.directed:
        raise ValueError(
            "plm optimizes undirected modularity; convert with "
            "to_undirected() first"
        )
    spark = g.edges.sparkSession
    # cache_states=False: PLM's per-round tree scans the labels state
    # from four subplans; a CacheManager-registered state breaks
    # Catalyst's cache substitution on that shape (see Checkpointer)
    ckpt = checkpointer or Checkpointer(spark, cache_states=False)
    metrics: list[dict] = []

    # assign: original id -> current-level node id
    assign = g.nodes().select("id", F.col("id").alias("cur"))
    assign = assign.localCheckpoint(eager=True)
    cur_g = g
    rounds_total = 0
    for level in range(max_levels):
        labels, moved, mts = _move_phase(
            cur_g, gamma, max_move_rounds, ckpt, level
        )
        metrics.extend(mts)
        rounds_total += len(mts)
        if not moved or level == max_levels - 1:
            # final partition of the current level = its (possibly
            # singleton) labels; project to original ids
            final = (
                assign.join(
                    labels.select(F.col("id").alias("cur"), "label"), "cur"
                )
                .select("id", F.col("label").alias("c"))
            )
            break
        # compact=True: the coarse ids feed the next level's parity gate
        # ((u + round) % 2), so the id space must be the dense 0..k-1
        # ranks the oracle unrolls. The densification is the partitioned
        # two-phase renumbering (plans/ids.py) — no global window.
        coarse_g, mapping = coarsen(cur_g, labels, compact=True)
        assign = (
            assign.join(
                mapping.select(F.col("id").alias("cur"), "coarse_id"), "cur"
            )
            .select("id", F.col("coarse_id").alias("cur"))
            .localCheckpoint(eager=True)
        )
        # checkpoint BOTH relations: the coarse vertices/edges plans
        # otherwise carry attributes that resurface in the next level's
        # labels self-joins and can break Catalyst's attribute dedup
        # ("key not found: id#N" in assertOptimized)
        coarse_g.edges = coarse_g.edges.localCheckpoint(eager=True)
        if coarse_g.vertices is not None:
            coarse_g.vertices = coarse_g.vertices.localCheckpoint(eager=True)
        cur_g = coarse_g
    else:  # pragma: no cover — loop always breaks
        final = assign.select("id", F.col("cur").alias("c"))

    canon = final.groupBy("c").agg(F.min("id").alias("label"))
    out = final.join(canon, "c").select("id", "label")
    return out, SuperstepResult(iterations=rounds_total, metrics=metrics)
