"""Selective community detection — LocalT, TwoPhaseL, RandomBFS, and
SCDGroundTruthComparison (the rest of the reference's scd/ family).

References:
- /root/reference/networkit/cpp/scd/LocalT.cpp (:14-195 — triangle-count
  greedy: score(C) = max(0, I * (I - E)) with I = fully-internal
  triangles and E = sum over members of their both-endpoints-outside
  triangles; each round scans the shell for the candidate maximizing
  (new score, then fewer new external triangles), accepting while the
  score does not decrease).
- /root/reference/networkit/cpp/scd/TwoPhaseL.cpp (:13-113 — phase 1
  greedily adds the shell node maximizing L = Lin/Lex (Lin = 2 W_int /
  |C|, Lex = cut / boundarySize) among nodes that raise Lin; phase 2
  sweeps members, removing any whose exit does not strictly worsen both
  Lin and Lex; returns empty if a seed is dropped).
- /root/reference/networkit/cpp/scd/RandomBFS.cpp (:11-80 — community =
  BFS ball around the seeds truncated to the size of a (randomly
  chosen) ground-truth community of the seed, the final level shuffled).
- /root/reference/networkit/cpp/scd/SCDGroundTruthComparison.cpp
  (:11-135 — per-seed best Jaccard/F1/precision/recall of the found
  community against the ground-truth subsets containing the seed, plus
  averages).

The LocalT/TwoPhaseL shell statistics are pure functions of the
community set, so each greedy round is one triangle/degree aggregation
over the community-incident region plus an ordered limit-1 pick (the
same collapse as operators/scdlocal.py).  LocalT is ALL-INTEGER
arithmetic — its cross-engine replay is exact, no rounding rule needed;
TwoPhaseL ratios follow the 9-decimal rounding spec.  Documented
deviations: ties break to the smallest node id (the reference scans an
unordered_set / uses IncrementalUniformRandomSelector), TwoPhaseL's
phase-2 sweep visits members in ascending id over the phase-2-start
snapshot (the reference iterates its internal hash order), and
RandomBFS md5-derandomizes both the community pick and the final-level
shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.scdlocal import _lit_df, _undirect
from networkit_spark.plans.superstep import materialize_partitioned


def _shell_df(spark, adj, com):
    com_df = F.broadcast(_lit_df(spark, com, "cid"))
    return (
        adj.join(com_df, adj.src == F.col("cid"))
        .select(F.col("dst").alias("id"))
        .join(com_df.withColumnRenamed("cid", "id"), "id", "left_anti")
        .distinct()
    )


def _tri_tags(spark, adj, canon, com, interest_df):
    """(v, t_int, t_semi, t_ext) triangle splits for every v in
    ``interest_df`` (zero rows for triangle-free v are absent — callers
    left-join with 0 defaults): each triangle {v, x, y} is charged to v
    exactly once via its opposite canonical edge (x, y); x/y community
    membership classifies it.  The adjacency legs are pre-filtered to
    interest so only the local region is enumerated."""
    com_df = F.broadcast(_lit_df(spark, com, "cid"))
    adj_i = (
        adj.join(interest_df.withColumnRenamed("id", "dst"), "dst",
                 "left_semi")
        .select("src", "dst")
    )
    tri = (
        canon
        .join(
            adj_i.select(F.col("src").alias("x"), F.col("dst").alias("v")),
            "x",
        )
        .join(
            adj_i.select(F.col("src").alias("y"), F.col("dst").alias("v")),
            ["y", "v"],
        )
        .select("v", "x", "y")
    )
    tagged = (
        tri.join(com_df.withColumnRenamed("cid", "x")
                 .withColumn("xin", F.lit(1)), "x", "left")
        .join(com_df.withColumnRenamed("cid", "y")
              .withColumn("yin", F.lit(1)), "y", "left")
        .select(
            "v",
            (F.coalesce(F.col("xin"), F.lit(0))
             + F.coalesce(F.col("yin"), F.lit(0))).alias("k"),
        )
    )
    return tagged.groupBy("v").agg(
        F.coalesce(F.sum(F.when(F.col("k") == 2, 1)), F.lit(0))
        .cast("long").alias("t_int"),
        F.coalesce(F.sum(F.when(F.col("k") == 1, 1)), F.lit(0))
        .cast("long").alias("t_semi"),
        F.coalesce(F.sum(F.when(F.col("k") == 0, 1)), F.lit(0))
        .cast("long").alias("t_ext"),
    )


def localt_expand(
    g: Graph, seeds, max_steps: int = 64
) -> tuple[DataFrame, int]:
    """(community(id), acceptance rounds) — LocalT.cpp triangle-based
    expansion (unweighted semantics; the reference instantiates
    LocalDegreeDirectedGraph<false>).  Capped at ``max_steps``
    acceptances: in triangle-free regions the reference absorbs the
    whole component (score stays 0 and qualifies every round), so the
    cap is the usable form at scale."""
    spark = g.edges.sparkSession
    gg = _undirect(g)
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    canon = materialize_partitioned(
        gg.edges.select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
        ).distinct(),
        "x",
    )
    com = {int(s) for s in seeds}
    rounds = 0
    for _ in range(max_steps):
        com_df = _lit_df(spark, com, "cid")
        shell = _shell_df(spark, adj, com)
        interest = shell.unionByName(_lit_df(spark, com, "id"))
        tags = _tri_tags(spark, adj, canon, com, interest)
        full = (
            interest.join(tags.withColumnRenamed("v", "id"), "id", "left")
            .select(
                "id",
                F.coalesce("t_int", F.lit(0)).alias("t_int"),
                F.coalesce("t_semi", F.lit(0)).alias("t_semi"),
                F.coalesce("t_ext", F.lit(0)).alias("t_ext"),
            )
            .localCheckpoint(eager=True)
        )
        # community scalars as a 1-row relation cross-joined into the
        # pick so each round is ONE action
        scal = (
            full.join(F.broadcast(com_df.withColumnRenamed("cid", "id")),
                      "id", "left_semi")
            .agg(
                (F.coalesce(F.sum("t_int"), F.lit(0)) / 3)
                .cast("long").alias("tri_i"),
                F.coalesce(F.sum("t_ext"), F.lit(0)).cast("long")
                .alias("tri_e"),
            )
        )
        new_i = F.col("tri_i") + F.col("t_int")
        new_e = F.col("tri_e") + F.col("t_ext") - F.col("t_semi")
        zero = F.lit(0).cast("long")
        cand = (
            full.join(F.broadcast(com_df.withColumnRenamed("cid", "id")),
                      "id", "left_anti")
            .crossJoin(F.broadcast(scal))
            .withColumn("new_e", new_e)
            .withColumn("score", F.greatest(zero, new_i * (new_i - new_e)))
            .filter(
                F.col("score")
                >= F.greatest(
                    zero, F.col("tri_i") * (F.col("tri_i") - F.col("tri_e"))
                )
            )
            .orderBy(F.desc("score"), F.asc("new_e"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not cand:
            break
        com.add(int(cand[0]["id"]))
        rounds += 1
    adj.unpersist()
    canon.unpersist()
    return _lit_df(spark, com), rounds


def _ieee_div(a: float, b: float) -> float:
    if b != 0.0:
        return a / b
    if a > 0:
        return math.inf
    if a < 0:
        return -math.inf
    return math.nan


def two_phase_l(
    g: Graph, seeds, max_steps: int = 64
) -> tuple[DataFrame, int]:
    """(community(id), phase-1 rounds) — TwoPhaseL.cpp L-measure
    expansion.  Returns an EMPTY community when phase 2 drops a seed,
    like the reference (:106-110)."""
    spark = g.edges.sparkSession
    gg = _undirect(g)
    adj = materialize_partitioned(gg.adj(), "src")
    seeds = {int(s) for s in seeds}
    com = set(seeds)

    def _stats(com_set):
        """(w_int, cut, boundary_size) of the community."""
        cdf = _lit_df(spark, com_set)
        row = (
            adj.join(F.broadcast(cdf.withColumnRenamed("id", "src")),
                     "src", "left_semi")
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst"))
                .withColumn("inc", F.lit(1)),
                "dst", "left",
            )
            .groupBy("src")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNotNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("ideg"),
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("edeg"),
            )
            .agg(
                F.coalesce(F.sum("ideg"), F.lit(0.0)).alias("w2"),
                F.coalesce(F.sum("edeg"), F.lit(0.0)).alias("cut"),
                F.coalesce(
                    F.sum(F.when(F.col("edeg") > 0, 1)), F.lit(0)
                ).alias("bs"),
            )
            .collect()[0]
        )
        return (
            float(row["w2"]) / 2.0,
            float(row["cut"]),
            int(row["bs"]),
        )

    w_int, cut, bs = _stats(com)
    rounds = 0
    for _ in range(max_steps):
        cdf = _lit_df(spark, com)
        cur_lin = _ieee_div(2.0 * w_int, float(len(com)))
        cur_lex = _ieee_div(cut, float(bs))
        cur_l = _ieee_div(cur_lin, cur_lex)
        # per-member external degree (for the boundary-change term)
        mem_ext = (
            adj.join(F.broadcast(cdf.withColumnRenamed("id", "src")),
                     "src", "left_semi")
            .join(F.broadcast(cdf.withColumnRenamed("id", "dst")),
                  "dst", "left_anti")
            .groupBy(F.col("src").alias("m"))
            .agg(F.count("*").alias("next"))
        )
        lonely = mem_ext.filter(F.col("next") == 1).select("m")
        shell = (
            adj.join(F.broadcast(cdf.withColumnRenamed("id", "dst")),
                     "dst", "left_anti")
            .join(F.broadcast(cdf.withColumnRenamed("id", "src")),
                  "src", "left_semi")
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        deg = adj.groupBy(F.col("src").alias("v")).agg(
            F.sum("weight").alias("wd"), F.count("*").alias("d")
        )
        vstat = (
            adj.join(shell.withColumnRenamed("v", "src"), "src",
                     "left_semi")
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst"))
                .withColumn("inc", F.lit(1)),
                "dst", "left",
            )
            .groupBy(F.col("src").alias("v"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNotNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("intdeg"),
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("extdeg"),
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNull(), 1)), F.lit(0)
                ).alias("next_cnt"),
            )
        )
        # members whose ONLY external neighbour is candidate v leave
        # the boundary when v joins
        drops = (
            adj.join(lonely.withColumnRenamed("m", "src"), "src",
                     "left_semi")
            .join(F.broadcast(cdf.withColumnRenamed("id", "dst")),
                  "dst", "left_anti")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.count("*").alias("bdrop"))
        )
        if math.isnan(cur_lin) or math.isnan(cur_l):
            # C++ comparisons against NaN are false for every candidate
            break
        n_lin = (2.0 * (F.lit(w_int) + F.col("intdeg"))) / F.lit(
            float(len(com) + 1)
        )
        bchg = (
            F.when(F.col("next_cnt") > 0, 1).otherwise(0)
            - F.coalesce(F.col("bdrop"), F.lit(0))
        )
        num = F.lit(cut) - F.col("intdeg") + F.col("extdeg")
        den = (F.lit(bs) + bchg).cast("double")
        inf = F.lit(float("inf"))
        # Spark yields NULL on x/0; emulate IEEE with NULL standing in
        # for NaN (NULL fails every filter, like C++ NaN comparisons)
        n_lex = (
            F.when(den != 0, num / den)
            .when(num > 0, inf)
            .when(num < 0, -inf)
            .otherwise(F.lit(None).cast("double"))
        )
        n_l = (
            F.when(n_lex.isNull(), F.lit(None).cast("double"))
            .when(n_lex != 0, n_lin / n_lex)
            .when(n_lin > 0, inf)
            .when(n_lin < 0, -inf)
            .otherwise(F.lit(None).cast("double"))
        )
        best = (
            vstat.join(drops, "v", "left")
            .withColumn("lin_gain", F.round(n_lin - F.lit(cur_lin), 9))
            .withColumn(
                "l_gain",
                F.when(
                    n_l == inf,
                    # inf beats everything except inf itself (C++
                    # strict >)
                    F.lit(0.0 if math.isinf(cur_l) and cur_l > 0
                          else 1.0),
                )
                .otherwise(F.round(n_l - F.lit(cur_l), 9)),
            )
            .withColumn("n_l_r", F.round(n_l, 9))
            .filter(F.col("lin_gain") > 0)
            .filter(F.col("l_gain") > 0)
            .orderBy(F.desc("n_l_r"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        com.add(int(best[0]["v"]))
        rounds += 1
        w_int, cut, bs = _stats(com)

    # phase 2: ascending-id sweep over the phase-2-start snapshot
    for v in sorted(com):
        if v not in com:
            continue
        cdf = _lit_df(spark, com)
        row = (
            adj.filter(F.col("src") == v)
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst"))
                .withColumn("inc", F.lit(1)),
                "dst", "left",
            )
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNotNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("intdeg"),
                F.coalesce(
                    F.sum(F.when(F.col("inc").isNull(), F.col("weight"))),
                    F.lit(0.0),
                ).alias("extdeg"),
            )
            .collect()[0]
        )
        intdeg, extdeg = float(row["intdeg"]), float(row["extdeg"])
        cur_lin = _ieee_div(2.0 * w_int, float(len(com)))
        cur_lex = _ieee_div(cut, float(bs))
        n_lin = _ieee_div(2.0 * (w_int - intdeg), float(len(com) - 1))
        com2 = com - {v}
        _, _, bs2 = _stats(com2) if com2 else (0.0, 0.0, 0)
        n_lex = _ieee_div(cut + intdeg - extdeg, float(bs2))
        keep = (round(cur_lin - n_lin, 9) > 0) and (
            round(cur_lex - n_lex, 9) < 0
        )
        if not keep:
            com.discard(v)
            if not com:
                break
            w_int, cut, bs = _stats(com)

    if not seeds <= com:
        com = set()
    return _lit_df(spark, com), rounds


def random_bfs(
    g: Graph, seeds, cover: DataFrame, salt: str = "rbfs"
) -> DataFrame:
    """(community(id)) — RandomBFS.cpp: BFS ball around the seeds
    truncated to the size of a ground-truth community of the seeds.
    Derandomization (documented): the community pick among the seeds'
    shared subsets and the final-level shuffle both order by
    md5(salt:id) instead of Aux::Random."""
    spark = g.edges.sparkSession
    gg = _undirect(g)
    adj = gg.adj().select("src", "dst")
    seeds = sorted({int(s) for s in seeds})
    sdf = _lit_df(spark, seeds)
    shared = (
        cover.join(F.broadcast(sdf), "id", "left_semi")
        .groupBy("subset")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == len(seeds))
        .select("subset")
    )
    pick = (
        shared.withColumn(
            "r", F.md5(F.concat(F.lit(f"{salt}:"), F.col("subset")))
        )
        .orderBy("r")
        .limit(1)
        .collect()
    )
    if pick:
        subset = int(pick[0]["subset"])
        com_size = cover.filter(F.col("subset") == subset).count()
    else:
        com_size = len(seeds)
    result: set[int] = set()
    level = set(seeds)
    while level and len(result) < com_size:
        if len(result) + len(level) < com_size:
            result |= level
        else:
            quota = com_size - len(result)
            ldf = _lit_df(spark, level)
            chosen = (
                ldf.withColumn(
                    "r", F.md5(F.concat(F.lit(f"{salt}:"), F.col("id")))
                )
                .orderBy("r", "id")
                .limit(quota)
                .collect()
            )
            result |= {int(r["id"]) for r in chosen}
            break
        ldf = _lit_df(spark, level)
        nxt = (
            adj.join(F.broadcast(ldf.withColumnRenamed("id", "src")),
                     "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(F.broadcast(_lit_df(spark, result)), "id", "left_anti")
            .collect()
        )
        level = {int(r["id"]) for r in nxt}
    return _lit_df(spark, result)


def scd_ground_truth_comparison(
    g: Graph,
    ground_truth: DataFrame,
    found: DataFrame,
    ignore_seeds: bool = False,
) -> tuple[DataFrame, dict]:
    """Per-seed best Jaccard/F1/precision/recall of ``found``
    (seed, id) communities against the ``ground_truth`` (id, subset)
    cover, plus averages — SCDGroundTruthComparison.cpp:11-135.  Unless
    ``ignore_seeds``, only subsets containing the seed compete.  One
    join+agg pipeline; nothing is collected but the per-seed rows."""
    nodes = g.nodes()
    gt = ground_truth.join(nodes, "id", "left_semi")
    fnd = found.join(nodes, "id", "left_semi")
    found_sizes = fnd.groupBy("seed").agg(F.count("*").alias("fsize"))
    truth_sizes = gt.groupBy("subset").agg(F.count("*").alias("tsize"))
    overlap = (
        fnd.join(gt, "id")
        .groupBy("seed", "subset")
        .agg(F.count("*").alias("ov"))
    )
    if not ignore_seeds:
        # only the ground-truth subsets CONTAINING the seed compete
        # (SCDGroundTruthComparison.cpp:60-62)
        allowed = (
            found_sizes.select("seed")
            .join(gt.withColumnRenamed("id", "seed"), "seed")
            .select("seed", "subset")
            .distinct()
        )
        overlap = overlap.join(allowed, ["seed", "subset"], "left_semi")
    scored = (
        overlap.join(found_sizes, "seed")
        .join(truth_sizes, "subset")
        .select(
            "seed",
            (F.col("ov")
             / (F.col("fsize") + F.col("tsize") - F.col("ov")))
            .alias("jacc"),
            (F.col("ov") / F.col("tsize")).alias("recall"),
            (F.col("ov") / F.col("fsize")).alias("precision"),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") > 0) & (F.col("recall") > 0),
                2.0 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
    per_seed = (
        found_sizes.select("seed")
        .join(
            scored.groupBy("seed").agg(
                F.max("jacc").alias("jaccard"),
                F.max("f1").alias("f1"),
                F.max("precision").alias("precision"),
                F.max("recall").alias("recall"),
            ),
            "seed",
            "left",
        )
        .select(
            "seed",
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
            F.coalesce("f1", F.lit(0.0)).alias("f1"),
            F.coalesce("precision", F.lit(0.0)).alias("precision"),
            F.coalesce("recall", F.lit(0.0)).alias("recall"),
        )
    )
    avg_row = per_seed.agg(
        F.avg("jaccard").alias("j"),
        F.avg("f1").alias("f"),
        F.avg("precision").alias("p"),
        F.avg("recall").alias("r"),
    ).collect()[0]
    averages = {
        "jaccard": float(avg_row["j"] or 0.0),
        "f1": float(avg_row["f"] or 0.0),
        "precision": float(avg_row["p"] or 0.0),
        "recall": float(avg_row["r"] or 0.0),
    }
    return per_seed, averages
