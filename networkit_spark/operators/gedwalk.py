"""GedWalk group centrality: greedy maximization of the GED-walk score
GED_L(S) = sum_{l=1..L} alpha^l * |{length-l walks that hit S}|.

Reference: /root/reference/networkit/cpp/centrality/GedWalk.cpp
- objective + hit/miss walk DP (evaluateGroup :302-350): pathsHit[0] =
  [u in S], pathsMiss[0] = [u not in S]; at level i a group member
  absorbs hit_i = sum_nbr (hit+miss), a non-member propagates hit/miss
  separately; score = sum_u sum_l alpha^l * hit_l(u).
- estimate DP (estimateGains :150-246): with the group blocked
  (pathsOut[0] = 0 on S, no propagation through S), score_est(u) =
  sum_l alpha^l * sum_m pOut[l-m][u] * pOut[m][u] counts walks THROUGH
  u with multiplicity, an upper bound on u's marginal gain
  (GedWalk.cpp:380 asserts gainScore[z] >= newGainScore).
- greedy (maximizeGain :410-421): lazily evaluates exact gains until
  the top of the score queue is exact; geometric alpha default
  1 / (1 + maxInDegree) (:121-123).

Deviations (documented):
- nLevels is FIXED (parameter L) instead of the reference's
  epsilon-driven level doubling: the result is the exact greedy under
  the truncated GED_L objective, deterministic across engines.
- the lazy queue is batched: per pick we exact-evaluate the top-C
  candidates by the (rounded) estimate in ONE tagged DP, then RAISE
  unless the best exact gain dominates every non-candidate's estimate
  (each estimate upper-bounds that node's exact gain, so the guard
  proves the pick is the true GED_L greedy argmax).  A C that is too
  small fails loudly, never silently.
- ties in candidate selection and in the argmax break on
  (ROUND(x, 6) DESC, id ASC) so both engines agree.

Spark-first: both DPs are level-synchronous join+aggregate passes over
the adjacency — the estimate is O(L) joins on (id), the exact batch is
O(L) joins on (cand, id) with C*n state; nothing per-candidate loops in
Python, and the only collects are the 1-row argmax and the assertion
scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def gedwalk(
    g: Graph,
    k: int = 2,
    levels: int = 3,
    candidates: int | None = None,
    alpha: float | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(rank, id, gain, group_score) — one row per greedy pick.

    ``candidates=None`` exact-evaluates every non-group node in one
    batched DP — the reference's lazy loop degenerates to exactly this
    whenever the geometric estimates don't separate (on flat-degree
    graphs nearly every node's estimate exceeds the winner's gain, so
    maximizeGain pops the whole queue).  Passing an int C prunes to the
    top-C estimates and RAISES if the winner fails to dominate the
    skipped nodes' upper bounds — the scale path for graphs whose
    estimates do separate."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = g.adj().select("src", "dst").localCheckpoint(eager=True)
    nodes = g.nodes().localCheckpoint(eager=True)
    if alpha is None:
        # geometric default: 1 / (1 + max in-degree); undirected
        # in-degree == degree (GedWalk.cpp:121-123)
        indeg = adj.groupBy("dst").count() if g.directed else g.degrees()
        col = "count" if g.directed else "degree"
        max_in = int(indeg.agg(F.max(col)).first()[0] or 0)
        alpha = 1.0 / (1.0 + max_in)
    # left-associated repeated multiplication (matches the SQL oracle's
    # literal a*a*... chains bit-for-bit)
    alphas = [1.0]
    for _ in range(levels + 1):
        alphas.append(alphas[-1] * alpha)

    group: list[int] = []
    group_score = 0.0
    out_rows: list[tuple[int, int, float, float]] = []

    for rank in range(1, k + 1):
        est = _estimate_scores(adj, nodes, group, levels, alphas)
        cand = est.filter(
            ~F.col("id").isin(group) if group else F.lit(True)
        )
        if candidates is not None:
            cand = cand.orderBy(
                F.round("est", 6).desc(), F.asc("id")
            ).limit(candidates)
        cands_df = cand.select(F.col("id").alias("cand")).localCheckpoint(
            eager=True
        )
        exact = _exact_scores(
            adj, nodes, group, cands_df, levels, alphas, ckpt
        )
        best = exact.orderBy(
            F.round(F.col("score") - group_score, 6).desc(), F.asc("cand")
        ).first()
        best_id = int(best["cand"])
        best_score = float(best["score"])
        best_gain = best_score - group_score

        # the estimate upper-bounds every node's exact gain: if the
        # winner beats all non-candidate estimates, it is the true
        # greedy argmax under GED_L
        worst = (
            est.join(
                cands_df.withColumnRenamed("cand", "id"), "id", "left_anti"
            )
            .filter(~F.col("id").isin(group) if group else F.lit(True))
            .agg(F.max("est"))
            .first()[0]
            if candidates is not None
            else None
        )
        if worst is not None and best_gain < float(worst) - 1e-9:
            raise AssertionError(
                f"gedwalk: candidate budget C={candidates} too small at "
                f"pick {rank}: best exact gain {best_gain} < non-candidate "
                f"estimate bound {worst}; increase `candidates`"
            )

        group.append(best_id)
        group_score = best_score
        out_rows.append((rank, best_id, best_gain, group_score))

    return spark.createDataFrame(
        out_rows, "rank long, id long, gain double, group_score double"
    ).select(
        "rank",
        "id",
        F.round("gain", 6).alias("gain"),
        F.round("group_score", 6).alias("group_score"),
    )


def _estimate_scores(adj, nodes, group, levels, alphas) -> DataFrame:
    """score_est(u) per estimateGains: pOut levels with the group
    blocked, then the prefix/suffix convolution."""
    in_grp = F.col("id").isin(group) if group else F.lit(False)
    state = nodes.select(
        "id", F.when(in_grp, F.lit(0.0)).otherwise(F.lit(1.0)).alias("p0")
    )
    for i in range(1, levels + 1):
        nxt = (
            adj.join(
                state.select(
                    F.col("id").alias("dst"), F.col(f"p{i - 1}").alias("pv")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("pv").alias("s"))
        )
        blocked = F.col("id").isin(group) if group else F.lit(False)
        state = state.join(nxt, "id", "left").withColumn(
            f"p{i}",
            F.when(blocked, F.lit(0.0)).otherwise(
                F.coalesce(F.col("s"), F.lit(0.0))
            ),
        ).drop("s")
    # score(u) = sum_{l=1..L} alpha^l * sum_{m=0..l} p[l-m] * p[m]
    expr = None
    for l in range(1, levels + 1):
        conv = None
        for m in range(l + 1):
            term = F.col(f"p{l - m}") * F.col(f"p{m}")
            conv = term if conv is None else conv + term
        piece = F.lit(alphas[l]) * conv
        expr = piece if expr is None else expr + piece
    return state.select("id", expr.alias("est"))


def _exact_scores(
    adj, nodes, group, cands, levels, alphas, ckpt
) -> DataFrame:
    """(cand, score) — GED_L(S + cand) via the batched hit/miss DP."""
    in_grp = F.col("id").isin(group) if group else F.lit(False)
    member = in_grp | (F.col("id") == F.col("cand"))
    state = cands.crossJoin(nodes).select(
        "cand",
        "id",
        F.when(member, F.lit(1.0)).otherwise(F.lit(0.0)).alias("hit"),
        F.when(member, F.lit(0.0)).otherwise(F.lit(1.0)).alias("miss"),
    )
    state = ckpt.cut(state, 0)
    total = None
    for i in range(1, levels + 1):
        agg = (
            adj.join(
                state.select(
                    "cand",
                    F.col("id").alias("dst"),
                    F.col("hit").alias("hv"),
                    F.col("miss").alias("mv"),
                ),
                "dst",
            )
            .groupBy("cand", F.col("src").alias("id"))
            .agg(F.sum("hv").alias("sh"), F.sum("mv").alias("sm"))
        )
        state = (
            state.select("cand", "id")
            .join(agg, ["cand", "id"], "left")
            .select(
                "cand",
                "id",
                F.when(
                    member,
                    F.coalesce(F.col("sh"), F.lit(0.0))
                    + F.coalesce(F.col("sm"), F.lit(0.0)),
                )
                .otherwise(F.coalesce(F.col("sh"), F.lit(0.0)))
                .alias("hit"),
                F.when(member, F.lit(0.0))
                .otherwise(F.coalesce(F.col("sm"), F.lit(0.0)))
                .alias("miss"),
            )
        )
        state = ckpt.cut(state, i)
        lvl = state.groupBy("cand").agg(
            (F.sum("hit") * F.lit(alphas[i])).alias("contrib")
        )
        total = (
            lvl
            if total is None
            else total.unionByName(lvl)
        )
    return total.groupBy("cand").agg(F.sum("contrib").alias("score"))
