"""Selective community detection — triangle/similarity-based local
expansions (TCE, LocalTightnessExpansion) and CliqueDetect/CombinedSCD.

References:
- /root/reference/networkit/cpp/scd/TCE.cpp (:46-175 — shell heap keyed
  by the accumulated triangle-weighted edge score
  score(u, v) = (w_uv + sum_z min(w_uz, w_vz)) / (denom * deg(v)) with
  denom = min(wd_u, wd_v) (or the Jaccard form wd_u + wd_v - nom); pops
  in descending score order, accepting a node iff conductance
  cut/vol strictly improves; rejected pops leave the heap until a later
  neighbour addition re-inserts them; :205-264 optional refine pass that
  removes members whose exit improves conductance).
- /root/reference/networkit/cpp/scd/LocalTightnessExpansion.cpp
  (:96-330 — similarity s(u, v) = (2 w_uv + sum_z w_uz w_vz) /
  (wd2_u * wd2_v) with wd2_u = sqrt(1 + sum_v w_uv^2); heap keyed by the
  node's internal similarity; acceptance test
  E/I - (alpha * extS(v) - intS(v)) / (2 intS(v)) > 0 where I/E are the
  running internal/external similarity totals, updated as
  I += 2 intS(v), E += extS(v) - intS(v) on acceptance).
- /root/reference/networkit/cpp/scd/CliqueDetect.cpp (:18-95 — community
  = seeds + a maximum clique among the common neighbours of the seeds).
- /root/reference/networkit/cpp/scd/CombinedSCD.cpp (:9-16 — second
  expansion seeded with the first's result).

Key observation enabling a declarative plan: in both TCE and LTE the
heap priority of a shell node and its acceptance statistics are PURE
FUNCTIONS of the current community set (each accepted neighbour u
contributes a statically-determined score(u, v)), so a "round" =
everything between two acceptances collapses to one aggregation over
the community-incident edges plus an ordered limit-1 pick: the accepted
node is the highest-priority shell node passing the acceptance test,
and every shell node ordered strictly before it was popped and
discarded (it re-enters the shell only when a later accepted node is
its neighbour).  That turns the sequential heap into a per-round
DataFrame plan: one broadcast join + hash aggregation over the shell,
a 1-row argmax collect, and anti-join bookkeeping for the discard set.

Documented deviations (the GCE/LFM cross-engine rules,
operators/scd.py): ties break to the SMALLEST node id (the reference
heap order among equal keys is unspecified), and priorities/acceptance
margins are rounded to 9 decimals before comparison so ulp noise
cannot flip a pick across engines.

Scale shape: LOCAL methods — the community is driver-side and bounded
by len(seeds) + max_steps (SelectiveCommunityDetector.hpp); the shell
lives in a DataFrame (never collected), so a hub member with 10^8
neighbours widens the shell relation, not driver memory.  Per round the
triangle score touches only edges incident to the community
(score join) and to the shell (denominator join).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import materialize_partitioned


def _undirect(g: Graph) -> Graph:
    gg = g.remove_self_loops()
    if not gg.directed:
        return gg
    und = (
        gg.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    return Graph(und, gg.vertices, directed=False, weighted=gg.weighted)


def _lit_df(spark, ids, col="id"):
    return spark.createDataFrame([(int(i),) for i in sorted(ids)],
                                 f"{col} long")


def tce_expand(
    g: Graph,
    seeds,
    refine: bool = False,
    jaccard: bool = False,
    max_steps: int = 64,
) -> tuple[DataFrame, float, int]:
    """(community(id), final conductance, acceptance rounds) — TCE
    triangle-based community expansion (TCE.cpp defaults
    refine=false, useJaccard=false)."""
    spark = g.edges.sparkSession
    gg = _undirect(g)
    adj = materialize_partitioned(gg.adj(), "src")
    deg = materialize_partitioned(
        gg.degrees().select("id", "degree", "w_degree"), "id"
    )

    com = {int(s) for s in seeds}

    def _cut_vol(com_set):
        cdf = _lit_df(spark, com_set)
        row = (
            adj.join(F.broadcast(cdf.withColumnRenamed("id", "src")),
                     "src", "left_semi")
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst"))
                .withColumn("inc", F.lit(1)),
                "dst", "left",
            )
            .agg(
                F.coalesce(F.sum("weight"), F.lit(0.0)).alias("vol"),
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("cut"),
            )
            .collect()[0]
        )
        return float(row["cut"]), float(row["vol"])

    cut, vol = _cut_vol(com)
    com_df = _lit_df(spark, com, "cid")
    active = (
        adj.join(F.broadcast(com_df), adj.src == F.col("cid"))
        .select(F.col("dst").alias("v"))
        .join(F.broadcast(com_df.withColumnRenamed("cid", "v")), "v",
              "left_anti")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_steps):
        com_df = _lit_df(spark, com, "cid")
        # community-incident edges (u in C, v outside C)
        pair = (
            adj.join(F.broadcast(com_df), adj.src == F.col("cid"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"),
                    F.col("weight").alias("w_uv"))
            .join(F.broadcast(com_df.withColumnRenamed("cid", "v")),
                  "v", "left_anti")
            .join(active, "v", "left_semi")
        )
        # triangle mass per pair: common neighbours z of u and v
        cu = (
            adj.join(F.broadcast(com_df), adj.src == F.col("cid"))
            .select(F.col("src").alias("u"), F.col("dst").alias("z"),
                    F.col("weight").alias("w_uz"))
        )
        va = (
            adj.join(active.withColumnRenamed("v", "src"), "src",
                     "left_semi")
            .select(F.col("src").alias("v"), F.col("dst").alias("z"),
                    F.col("weight").alias("w_vz"))
        )
        tri = (
            pair.join(F.broadcast(cu), "u")
            .join(va, ["v", "z"])
            .groupBy("u", "v")
            .agg(F.sum(F.least("w_uz", "w_vz")).alias("trisum"))
        )
        wd_u = deg.select(F.col("id").alias("u"),
                          F.col("w_degree").alias("wd_u"))
        wd_v = deg.select(F.col("id").alias("v"),
                          F.col("w_degree").alias("wd_v"),
                          F.col("degree").alias("deg_v"))
        nom = F.col("w_uv") + F.coalesce(F.col("trisum"), F.lit(0.0))
        if jaccard:
            denom = F.col("wd_u") + F.col("wd_v") - nom
        else:
            denom = F.least("wd_u", "wd_v")
        scored = (
            pair.join(tri, ["u", "v"], "left")
            .join(F.broadcast(wd_u), "u")
            .join(wd_v, "v")
            .withColumn(
                "sc",
                F.when(
                    (F.col("wd_v") > 0) & (denom * F.col("deg_v") > 0),
                    nom / (denom * F.col("deg_v")),
                ).otherwise(F.lit(0.0)),
            )
            .groupBy("v")
            .agg(
                F.sum("sc").alias("score"),
                F.sum("w_uv").alias("cut_e"),
                F.first("wd_v").alias("wd"),
            )
            .withColumn("score_r", F.round("score", 9))
            # materialized once — both the argmax pick and the survivor
            # bookkeeping read it (otherwise the triangle join runs twice
            # per round)
            .localCheckpoint(eager=True)
        )
        margin = F.round(
            (F.lit(cut) + F.col("wd") - 2 * F.col("cut_e"))
            / (F.lit(vol) + F.col("wd"))
            - F.lit(cut / vol if vol > 0 else float("inf")),
            9,
        )
        best = (
            scored.withColumn("margin", margin)
            .filter(F.col("margin") < 0)
            .orderBy(F.desc("score_r"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            # every remaining shell node pops and is discarded
            active = spark.createDataFrame([], "v long")
            break
        acc = int(best[0]["v"])
        acc_sr = float(best[0]["score_r"])
        wd_acc = float(best[0]["wd"])
        cut = cut + wd_acc - 2.0 * float(best[0]["cut_e"])
        vol = vol + wd_acc
        com.add(acc)
        rounds += 1
        survivors = (
            scored.filter(
                ~(
                    (F.col("score_r") > acc_sr)
                    | ((F.col("score_r") == acc_sr) & (F.col("v") < acc))
                )
            )
            .filter(F.col("v") != acc)
            .select("v")
        )
        newcomers = (
            adj.filter(F.col("src") == acc)
            .select(F.col("dst").alias("v"))
            .join(F.broadcast(_lit_df(spark, com, "v")), "v", "left_anti")
        )
        active = (
            survivors.unionByName(newcomers)
            .distinct()
            .localCheckpoint(eager=True)
        )

    if refine:
        # TCE.cpp:205-264 — ascending-id sweep over the community
        # (std::set order); remove a member iff conductance improves.
        for u in sorted(com):
            if len(com) <= 1:
                break
            cdf = _lit_df(spark, com)
            row = (
                adj.filter(F.col("src") == u)
                .join(
                    F.broadcast(cdf.withColumnRenamed("id", "dst"))
                    .withColumn("inc", F.lit(1)),
                    "dst", "left",
                )
                .agg(
                    F.coalesce(F.sum("weight"), F.lit(0.0)).alias("uvol"),
                    F.coalesce(
                        F.sum(
                            F.when(F.col("inc").isNotNull(), F.col("weight"))
                            .otherwise(-F.col("weight"))
                        ),
                        F.lit(0.0),
                    ).alias("uchg"),
                )
                .collect()[0]
            )
            uvol, uchg = float(row["uvol"]), float(row["uchg"])
            new_cut, new_vol = cut + uchg, vol - uvol
            old_q = cut / vol if vol > 0 else float("inf")
            new_q = new_cut / new_vol if new_vol > 0 else float("inf")
            if round(new_q - old_q, 9) < 0:
                com.discard(u)
                cut, vol = new_cut, new_vol

    adj.unpersist()
    deg.unpersist()
    return (
        _lit_df(spark, com),
        (cut / vol) if vol > 0 else 1.0,
        rounds,
    )


def lte_expand(
    g: Graph,
    seeds,
    alpha: float = 1.0,
    max_steps: int = 64,
) -> tuple[DataFrame, int]:
    """(community(id), acceptance rounds) — LocalTightnessExpansion
    (LocalTightnessExpansion.cpp default alpha=1.0)."""
    spark = g.edges.sparkSession
    gg = _undirect(g)
    adj = materialize_partitioned(gg.adj(), "src")
    # wd2 = sqrt(1 + sum w^2)   (LocalTightnessExpansion.cpp:118-128)
    wd2 = materialize_partitioned(
        adj.groupBy(F.col("src").alias("id"))
        .agg(F.sqrt(1.0 + F.sum(F.col("weight") * F.col("weight")))
             .alias("wd2")),
        "id",
    )

    def _sim_pairs(left_ids_df):
        """s(a, b) for every edge (a, b) with a in left_ids_df —
        returns (a, b, s)."""
        ea = (
            adj.join(left_ids_df.withColumnRenamed("id", "src"), "src",
                     "left_semi")
            .select(F.col("src").alias("a"), F.col("dst").alias("b"),
                    F.col("weight").alias("w_ab"))
        )
        za = (
            adj.join(left_ids_df.withColumnRenamed("id", "src"), "src",
                     "left_semi")
            .select(F.col("src").alias("a"), F.col("dst").alias("z"),
                    F.col("weight").alias("w_az"))
        )
        zb = adj.select(F.col("src").alias("b"), F.col("dst").alias("z"),
                        F.col("weight").alias("w_bz"))
        tri = (
            ea.select("a", "b")
            .join(za, "a")
            .join(zb, ["b", "z"])
            .groupBy("a", "b")
            .agg(F.sum(F.col("w_az") * F.col("w_bz")).alias("trisum"))
        )
        return (
            ea.join(tri, ["a", "b"], "left")
            .join(wd2.select(F.col("id").alias("a"),
                             F.col("wd2").alias("wd2_a")), "a")
            .join(wd2.select(F.col("id").alias("b"),
                             F.col("wd2").alias("wd2_b")), "b")
            .select(
                "a", "b",
                (
                    (2.0 * F.col("w_ab")
                     + F.coalesce(F.col("trisum"), F.lit(0.0)))
                    / (F.col("wd2_a") * F.col("wd2_b"))
                ).alias("s"),
            )
        )

    com = {int(s) for s in seeds}

    def _init_totals(com_set):
        cdf = _lit_df(spark, com_set)
        sp = _sim_pairs(cdf)
        row = (
            sp.join(
                F.broadcast(cdf.withColumnRenamed("id", "b"))
                .withColumn("inb", F.lit(1)),
                "b", "left",
            )
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("inb").isNotNull(), F.col("s"))),
                    F.lit(0.0),
                ).alias("i2"),
                F.coalesce(
                    F.sum(F.when(F.col("inb").isNull(), F.col("s"))),
                    F.lit(0.0),
                ).alias("e"),
            )
            .collect()[0]
        )
        # i2 counts each internal edge in both directions = I
        return float(row["i2"]), float(row["e"])

    sim_i, sim_e = _init_totals(com)
    com_df = _lit_df(spark, com, "cid")
    active = (
        adj.join(F.broadcast(com_df), adj.src == F.col("cid"))
        .select(F.col("dst").alias("v"))
        .join(F.broadcast(com_df.withColumnRenamed("cid", "v")), "v",
              "left_anti")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_steps):
        cdf = _lit_df(spark, com)
        sp = _sim_pairs(active.withColumnRenamed("v", "id"))
        scored = (
            sp.join(
                F.broadcast(cdf.withColumnRenamed("id", "b"))
                .withColumn("inb", F.lit(1)),
                "b", "left",
            )
            .groupBy(F.col("a").alias("v"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("inb").isNotNull(), F.col("s"))),
                    F.lit(0.0),
                ).alias("int_s"),
                F.coalesce(
                    F.sum(F.when(F.col("inb").isNull(), F.col("s"))),
                    F.lit(0.0),
                ).alias("ext_s"),
            )
            .filter(F.col("int_s") > 0)
            .withColumn("prio", F.round("int_s", 9))
            # materialized once for the same double-read reason as TCE
            .localCheckpoint(eager=True)
        )
        if sim_i == 0.0:
            # E / I = +inf (or NaN when E = 0): accept iff E > 0
            # (LocalTightnessExpansion.cpp:305 with IEEE semantics)
            margin_ok = F.lit(sim_e > 0.0)
        else:
            margin_ok = (
                F.round(
                    F.lit(sim_e / sim_i)
                    - (F.lit(alpha) * F.col("ext_s") - F.col("int_s"))
                    / (2.0 * F.col("int_s")),
                    9,
                )
                > 0
            )
        best = (
            scored.filter(margin_ok)
            .orderBy(F.desc("prio"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            active = spark.createDataFrame([], "v long")
            break
        acc = int(best[0]["v"])
        acc_pr = float(best[0]["prio"])
        sim_i += 2.0 * float(best[0]["int_s"])
        sim_e += float(best[0]["ext_s"]) - float(best[0]["int_s"])
        com.add(acc)
        rounds += 1
        survivors = (
            scored.filter(
                ~(
                    (F.col("prio") > acc_pr)
                    | ((F.col("prio") == acc_pr) & (F.col("v") < acc))
                )
            )
            .filter(F.col("v") != acc)
            .select("v")
        )
        newcomers = (
            adj.filter(F.col("src") == acc)
            .select(F.col("dst").alias("v"))
            .join(F.broadcast(_lit_df(spark, com, "v")), "v", "left_anti")
        )
        active = (
            survivors.unionByName(newcomers)
            .distinct()
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    wd2.unpersist()
    return _lit_df(spark, com), rounds


def clique_detect(g: Graph, seeds) -> DataFrame:
    """(community(id)) — seeds plus a maximum clique among the common
    neighbours of the seeds (CliqueDetect.cpp:18-95).

    Deviation: the reference picks uniformly at random among equal
    best cliques (IncrementalUniformRandomSelector); here the winner is
    the (size DESC, weight DESC if weighted, members ASC) minimum so
    both engines agree.  A maximum-size (or, with positive weights,
    maximum-weight) clique is always maximal, so ranking the maximal
    cliques of the candidate subgraph finds it.
    """
    from networkit_spark.operators.cliques import maximal_cliques

    spark = g.edges.sparkSession
    gg = _undirect(g)
    seeds = sorted({int(s) for s in seeds})
    sdf = _lit_df(spark, seeds)
    adj = gg.adj()
    # candidates adjacent to EVERY seed, excluding the seeds
    cand = (
        adj.join(F.broadcast(sdf.withColumnRenamed("id", "src")), "src",
                 "left_semi")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("hits"),
             F.sum("weight").alias("seed_w"))
        .filter(F.col("hits") == len(seeds))
        .join(F.broadcast(sdf), "id", "left_anti")
        .select("id", "seed_w")
        .localCheckpoint(eager=True)
    )
    if not cand.limit(1).collect():
        return _lit_df(spark, seeds)
    cedges = (
        gg.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .join(cand.select(F.col("id").alias("src")), "src", "left_semi")
        .join(cand.select(F.col("id").alias("dst")), "dst", "left_semi")
    )
    sub = Graph(cedges, cand.select("id"), directed=False,
                weighted=gg.weighted)
    cliques = maximal_cliques(sub)
    if gg.weighted:
        # cliqueWeight = internal edge weights + seed-to-member weights
        # (CliqueDetect.cpp:120-146)
        member = cliques.select(
            F.col("clique"), F.explode("clique").alias("id")
        )
        internal = (
            member.select("clique", F.col("id").alias("src"))
            .join(cedges, "src")
            .filter(F.array_contains("clique", F.col("dst")))
            .groupBy("clique")
            .agg(F.sum("weight").alias("iw"))
        )
        seedw = (
            member.join(cand, "id")
            .groupBy("clique")
            .agg(F.sum("seed_w").alias("sw"))
        )
        ranked = (
            cliques.join(internal, "clique", "left")
            .join(seedw, "clique", "left")
            .withColumn(
                "cw",
                F.round(
                    F.coalesce(F.col("iw"), F.lit(0.0))
                    + F.coalesce(F.col("sw"), F.lit(0.0)),
                    9,
                ),
            )
            .orderBy(F.desc("cw"), F.asc("clique"))
        )
    else:
        ranked = cliques.orderBy(F.desc(F.size("clique")),
                                 F.asc("clique"))
    top = ranked.limit(1).collect()
    members = set(seeds)
    if top:
        members |= {int(x) for x in top[0]["clique"]}
    return _lit_df(spark, members)


def combined_scd(g: Graph, seeds, first, second) -> DataFrame:
    """second(first(seeds)) — CombinedSCD.cpp:9-16.  ``first`` and
    ``second`` are callables (g, seed_ids) -> community DataFrame or
    (community DataFrame, ...) tuples."""
    def _ids(res):
        df = res[0] if isinstance(res, tuple) else res
        return [int(r["id"]) for r in df.collect()]

    res = second(g, _ids(first(g, seeds)))
    return res[0] if isinstance(res, tuple) else res
