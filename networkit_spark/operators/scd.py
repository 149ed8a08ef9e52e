"""Selective community detection — PageRankNibble.

Reference: /root/reference/networkit/cpp/scd/PageRankNibble.cpp
(:18-100 — personalized-PageRank scores around a seed, nodes ranked by
pr / weightedDegree, best sweep prefix by conductance
cut / min(vol, totalVolume - vol)) over
/root/reference/networkit/cpp/scd/ApproximatePageRank.cpp.

Deterministic Spark-first variant (documented deviations): the PPR
vector comes from a FIXED number of synchronous power-iteration steps
pr_{t+1} = alpha * e_seed + (1 - alpha) * W^T pr_t (the reference's
push algorithm is order-dependent and sequential; the synchronous
iterate converges to the same PPR limit), truncated to the support
pr >= eps like Nibble's epsilon support.  The sweep ranking key
pr / w_degree and the per-prefix conductance are rounded to 9 decimals
before ordering/argmin so cross-engine float noise cannot flip a rank.

Plan shape: each PPR step is one join + one hash aggregation over the
adjacency (the PageRank plan); the sweep is windows over the TRUNCATED
support (support size is bounded by 1/eps mass concentration — the
windows never see the full graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def page_rank_nibble(
    g: Graph,
    seed_node: int,
    alpha: float = 0.15,
    iterations: int = 12,
    eps: float = 1e-4,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, float]:
    """(community(id), best_conductance) — the seed's best sweep set."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    gg = g.remove_self_loops()
    if gg.directed:
        # SCD is defined on undirected graphs (the reference
        # SelectiveCommunityDetector takes G undirected; PageRankNibble.cpp
        # walks symmetric neighborhoods).  Canonicalize each arc to one
        # undirected edge — max weight on reciprocal pairs — so sinks
        # don't have zero degree and volumes count each edge once.
        und = (
            gg.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        gg = Graph(und, gg.vertices, directed=False, weighted=gg.weighted)
    deg = gg.degrees().select("id", "w_degree")
    adj = materialize_partitioned(
        gg.adj()
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed(
            "w_degree", "wd"), "src")
        .select("src", "dst", (F.col("weight") / F.col("wd")).alias("frac")),
        "src",
    )
    pr = spark.createDataFrame([(int(seed_node), 1.0)], "id long, pr double")
    teleport = spark.createDataFrame(
        [(int(seed_node), float(alpha))], "id long, pr double"
    )
    for t in range(1, iterations + 1):
        spread = (
            pr.hint("shuffle_hash")
            .join(adj, pr.id == adj.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("pr") * F.col("frac") * F.lit(1.0 - alpha)).alias("pr"),
            )
        )
        pr = ckpt.cut(
            spread.unionByName(teleport).groupBy("id").agg(
                F.sum("pr").alias("pr")
            ),
            t,
        )
    support = (
        pr.filter(F.col("pr") >= eps)
        .join(deg, "id")
        .select(
            "id", "pr", "w_degree",
            # isolated seed (w_degree 0) ranks by raw pr — its sweep
            # prefix has vol 0 and is filtered below, falling back to
            # the singleton return
            (
                -F.round(
                    F.when(
                        F.col("w_degree") > 0,
                        F.col("pr") / F.col("w_degree"),
                    ).otherwise(F.col("pr")),
                    9,
                )
            ).alias("negkey"),
        )
    )
    # partitioned two-phase ranking (plans/ids.py) — no global-sort
    # window even though the eps-truncated support is small
    from networkit_spark.plans.ids import dense_ids

    ranked = (
        dense_ids(support, ["negkey", "id"], "rk0")
        .withColumn("rk", F.col("rk0") + 1)
        .drop("rk0", "negkey")
        .localCheckpoint(eager=True)
    )
    # internal-weight histogram: every support-internal edge lands at
    # the LATER endpoint's rank; cut(r) = vol(r) - 2 * internal(r)
    ru = ranked.select(F.col("id").alias("src"), F.col("rk").alias("rku"))
    rv = ranked.select(F.col("id").alias("dst"), F.col("rk").alias("rkv"))
    internal = (
        gg.edges.join(ru, "src").join(rv, "dst")
        .select(F.greatest("rku", "rkv").alias("rmax"),
                F.col("weight").alias("wgt"))
        .groupBy("rmax")
        .agg(F.sum("wgt").alias("iw"))
    )
    total = 2.0 * float(
        gg.edges.agg(F.sum("weight").alias("s")).collect()[0]["s"] or 0.0
    )
    # two-phase prefix sums over the ranked support: per-bucket windows
    # plus driver-collected bucket offsets (the dense_ids pattern) — no
    # unpartitioned window anywhere in the sweep
    bucket_sz = 4096
    base = (
        ranked.join(internal.withColumnRenamed("rmax", "rk"), "rk", "left")
        .withColumn("iw", F.coalesce("iw", F.lit(0.0)))
        .withColumn("bkt", ((F.col("rk") - 1) / bucket_sz).cast("long"))
        .localCheckpoint(eager=True)
    )
    bs = sorted(
        (int(r["bkt"]), float(r["swd"]), float(r["siw"]))
        for r in base.groupBy("bkt")
        .agg(F.sum("w_degree").alias("swd"), F.sum("iw").alias("siw"))
        .collect()
    )
    offsets, cw, ci = [], 0.0, 0.0
    for bkt, swd, siw in bs:
        offsets.append((bkt, cw, ci))
        cw += swd
        ci += siw
    off_df = spark.createDataFrame(
        offsets or [(0, 0.0, 0.0)], "bkt long, owd double, oiw double"
    )
    wv = Window.partitionBy("bkt").orderBy("rk")
    sweep = (
        base.join(F.broadcast(off_df), "bkt")
        .withColumn("vol", F.col("owd") + F.sum("w_degree").over(wv))
        .withColumn("intc", F.col("oiw") + F.sum("iw").over(wv))
        .withColumn(
            "den", F.least(F.col("vol"), F.lit(total) - F.col("vol"))
        )
        .filter(F.col("den") > 0)
        .withColumn(
            "cond",
            F.round((F.col("vol") - 2.0 * F.col("intc")) / F.col("den"), 9),
        )
    )
    best = sweep.orderBy(F.asc("cond"), F.asc("rk")).limit(1).collect()
    if not best:
        return (
            spark.createDataFrame([(int(seed_node),)], "id long"),
            1.0,
        )
    best_rk, best_cond = int(best[0]["rk"]), float(best[0]["cond"])
    adj.unpersist()
    return (
        ranked.filter(F.col("rk") <= best_rk).select("id").orderBy("id"),
        best_cond,
    )


def gce_expand(
    g: Graph,
    seeds,
    max_steps: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, float]:
    """(community(id), final quality) — GCE greedy community expansion,
    objective M.

    Reference: /root/reference/networkit/cpp/scd/GCE.cpp (:40-46 deltaM =
    (W_int + intDeg) / (cut - intDeg + extDeg) - Q; :85-110 expand loop:
    scan the shell for the max positive quality gain, add it, repeat).
    Documented deviations: argmax ties break by SMALLEST node id (the
    reference picks uniformly at random among ties); the L objective
    (boundary-size term) is not implemented; gains are rounded to 9
    decimals before comparison so ulp noise cannot flip a pick; directed
    inputs are canonicalized to undirected like :func:`page_rank_nibble`.

    Plan shape: each greedy step is one broadcast join + hash aggregation
    over the shell (edges incident to C) followed by a 1-row argmax
    collect; quality scalars live on the driver. The community id set is
    driver-side, bounded by len(seeds) + max_steps — GCE is a LOCAL
    method by construction (SelectiveCommunityDetector.hpp).
    """
    spark = g.edges.sparkSession
    gg = g.remove_self_loops()
    if gg.directed:
        und = (
            gg.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        gg = Graph(und, gg.vertices, directed=False, weighted=gg.weighted)
    adj = materialize_partitioned(gg.adj(), "src")
    deg = materialize_partitioned(
        gg.degrees().select("id", "w_degree"), "id"
    )

    def _scalars(com_set):
        cdf = spark.createDataFrame([(i,) for i in com_set], "id long")
        w = float(
            gg.edges.join(
                F.broadcast(cdf.withColumnRenamed("id", "src")),
                "src",
                "left_semi",
            )
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst")),
                "dst",
                "left_semi",
            )
            .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        vol = float(
            deg.join(F.broadcast(cdf), "id", "left_semi")
            .agg(F.coalesce(F.sum("w_degree"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        return w, vol - 2.0 * w

    com = {int(s) for s in seeds}
    w_int, cut = _scalars(com)
    q = (w_int / cut) if cut > 0 else float("inf")
    for _ in range(max_steps):
        com_df = spark.createDataFrame(
            [(i,) for i in sorted(com)], "cid long"
        )
        shell = (
            adj.join(F.broadcast(com_df), adj.dst == F.col("cid"))
            .drop("cid")
            .join(
                F.broadcast(com_df.withColumnRenamed("cid", "src")),
                "src",
                "left_anti",
            )
            .groupBy(F.col("src").alias("v"))
            .agg(F.sum("weight").alias("intdeg"))
            .join(deg.withColumnRenamed("id", "v"), "v")
            .withColumn("extdeg", F.col("w_degree") - F.col("intdeg"))
        )
        den = F.col("cut") - F.col("intdeg") + F.col("extdeg")
        best = (
            shell.withColumn("wc", F.lit(w_int))
            .withColumn("cut", F.lit(cut))
            .withColumn(
                "dq",
                F.round(
                    F.when(
                        den > 0,
                        (F.col("wc") + F.col("intdeg")) / den,
                    ).otherwise(F.lit(float("inf")))
                    - F.lit(q),
                    9,
                ),
            )
            .filter(F.col("dq") > 0)
            .orderBy(F.desc("dq"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        v = int(best[0]["v"])
        intdeg = float(best[0]["intdeg"])
        extdeg = float(best[0]["extdeg"])
        com.add(v)
        w_int += intdeg
        cut = cut - intdeg + extdeg
        q = (w_int / cut) if cut > 0 else float("inf")
    adj.unpersist()
    deg.unpersist()
    return (
        spark.createDataFrame([(i,) for i in sorted(com)], "id long"),
        q,
    )


def set_conductance(g: Graph, nodes: DataFrame) -> float:
    """Conductance of a node set: cut(S) / min(vol(S), vol(V) - vol(S)),
    1.0 when either side has no volume.

    Reference: /root/reference/networkit/cpp/scd/SetConductance.cpp
    (:12-46 — undirected only; self-loops count twice in the volume).
    Two hash aggregations over the edges incident to S; S itself is a
    DataFrame, never collected.
    """
    if g.directed:
        raise RuntimeError("SetConductance only supports undirected graphs.")
    s = nodes.select(F.col(nodes.columns[0]).alias("id"))
    half = g.adj()  # both orientations; self-loops appear once
    tagged = (
        half.join(
            s.withColumnRenamed("id", "src").withColumn("ins", F.lit(1)),
            "src",
            "left",
        )
        .join(
            s.withColumnRenamed("id", "dst").withColumn("ind", F.lit(1)),
            "dst",
            "left",
        )
        .filter(F.col("ins").isNotNull())
    )
    row = tagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("ind").isNull(), F.col("weight"))), F.lit(0.0)
        ).alias("cut"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("src") == F.col("dst"), 2.0 * F.col("weight")
                ).otherwise(F.col("weight"))
            ),
            F.lit(0.0),
        ).alias("vol"),
    ).collect()[0]
    cut, vol = float(row["cut"]), float(row["vol"])
    total = 2.0 * float(
        g.edges.agg(
            F.coalesce(F.sum("weight"), F.lit(0.0)).alias("s")
        ).collect()[0]["s"]
    )
    rest = total - vol
    if vol > 0 and rest > 0:
        return cut / min(vol, rest)
    return 1.0


def lfm_local(
    g: Graph,
    seeds,
    alpha: float = 1.0,
    max_steps: int = 64,
) -> tuple[DataFrame, float, SuperstepResult]:
    """(community(id), final fitness, info) — LFM local expansion.

    Reference: /root/reference/networkit/cpp/scd/LFMLocal.cpp
    (Lancichinetti-Fortunato-Kertesz fitness
    f(C) = 2*W_int / (2*W_int + cut)^alpha): greedily add the shell
    node with the max positive fitness gain (:40-55), then repeatedly
    REMOVE the non-seed community node with the most negative
    removal gain until none remains (:60-92); stop when no shell node
    improves.  Documented deviations: ties break to the SMALLEST node
    id (the reference picks uniformly at random among ties via
    IncrementalUniformRandomSelector), and gains are rounded to 9
    decimals before comparison (cross-engine ulp rule).

    Plan shape mirrors :func:`gce_expand`: each add step is one
    broadcast join + hash aggregation over the shell and a 1-row argmax
    collect; each removal step the same over the community (which is
    driver-side and bounded — LFM is a LOCAL method).  ``info.metrics``
    records the removals per round (the gate pins an unroll budget).
    """
    spark = g.edges.sparkSession
    gg = g.remove_self_loops()
    if gg.directed:
        und = (
            gg.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        gg = Graph(und, gg.vertices, directed=False, weighted=gg.weighted)
    adj = materialize_partitioned(gg.adj(), "src")
    deg = materialize_partitioned(gg.degrees().select("id", "w_degree"), "id")
    seeds = {int(s) for s in seeds}

    def _quality(w_int: float, cut: float) -> float:
        den = (2.0 * w_int + cut) ** alpha
        return (2.0 * w_int) / den if den > 0 else 0.0

    def _scalars(com_set):
        cdf = spark.createDataFrame([(i,) for i in com_set], "id long")
        w = float(
            gg.edges.join(
                F.broadcast(cdf.withColumnRenamed("id", "src")), "src",
                "left_semi",
            )
            .join(
                F.broadcast(cdf.withColumnRenamed("id", "dst")), "dst",
                "left_semi",
            )
            .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        vol = float(
            deg.join(F.broadcast(cdf), "id", "left_semi")
            .agg(F.coalesce(F.sum("w_degree"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        return w, vol - 2.0 * w

    com = set(seeds)
    w_int, cut = _scalars(com)
    metrics: list[dict] = []
    if w_int + cut == 0:  # LFMLocal.cpp:21 — isolated seeds
        adj.unpersist()
        deg.unpersist()
        return (
            spark.createDataFrame([(i,) for i in sorted(com)], "id long"),
            _quality(w_int, cut),
            SuperstepResult(iterations=0, metrics=metrics),
        )
    q = _quality(w_int, cut)

    def _int_ext(members_df, candidates="shell"):
        """(v, intdeg, extdeg) for shell nodes (candidates='shell') or
        community members (candidates='community')."""
        base = adj.join(F.broadcast(members_df), adj.dst == F.col("cid")).drop(
            "cid"
        )
        if candidates == "shell":
            return (
                base.join(
                    F.broadcast(members_df.withColumnRenamed("cid", "src")),
                    "src",
                    "left_anti",
                )
                .groupBy(F.col("src").alias("v"))
                .agg(F.sum("weight").alias("intdeg"))
                .join(deg.withColumnRenamed("id", "v"), "v")
                .withColumn("extdeg", F.col("w_degree") - F.col("intdeg"))
            )
        # community members: LEFT join so an internally-isolated member
        # (intdeg 0 — its removal gain is the largest) is still a
        # removal candidate
        inner = base.join(
            F.broadcast(members_df.withColumnRenamed("cid", "src")),
            "src",
            "left_semi",
        ).groupBy(F.col("src").alias("v")).agg(F.sum("weight").alias("intdeg"))
        return (
            members_df.select(F.col("cid").alias("v"))
            .join(inner, "v", "left")
            .select("v", F.coalesce("intdeg", F.lit(0.0)).alias("intdeg"))
            .join(deg.withColumnRenamed("id", "v"), "v")
            .withColumn("extdeg", F.col("w_degree") - F.col("intdeg"))
        )

    def _q_expr(wi, ct):
        den = F.pow(2.0 * wi + ct, F.lit(alpha))
        return F.when(den > 0, (2.0 * wi) / den).otherwise(0.0)

    rounds = 0
    for _ in range(max_steps):
        com_df = spark.createDataFrame([(i,) for i in sorted(com)], "cid long")
        wi_new = F.lit(w_int) + F.col("intdeg")
        cut_new = F.lit(cut) - F.col("intdeg") + F.col("extdeg")
        best = (
            _int_ext(com_df, "shell")
            .withColumn("dq", F.round(_q_expr(wi_new, cut_new) - F.lit(q), 9))
            .filter(F.col("dq") > 0)
            .orderBy(F.desc("dq"), F.asc("v"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        rounds += 1
        com.add(int(best[0]["v"]))
        w_int += float(best[0]["intdeg"])
        cut = cut - float(best[0]["intdeg"]) + float(best[0]["extdeg"])
        q = _quality(w_int, cut)
        removals = 0
        while True:
            com_df = spark.createDataFrame(
                [(i,) for i in sorted(com)], "cid long"
            )
            seeds_df = spark.createDataFrame(
                [(i,) for i in sorted(seeds)], "v long"
            )
            wi_rm = F.lit(w_int) - F.col("intdeg")
            cut_rm = F.lit(cut) + F.col("intdeg") - F.col("extdeg")
            worst = (
                _int_ext(com_df, "community")
                .join(F.broadcast(seeds_df), "v", "left_anti")
                .withColumn(
                    "dq", F.round(F.lit(q) - _q_expr(wi_rm, cut_rm), 9)
                )
                .filter(F.col("dq") < 0)
                .orderBy(F.asc("dq"), F.asc("v"))
                .limit(1)
                .collect()
            )
            if not worst:
                break
            removals += 1
            com.discard(int(worst[0]["v"]))
            w_int -= float(worst[0]["intdeg"])
            cut = cut + float(worst[0]["intdeg"]) - float(worst[0]["extdeg"])
            q = _quality(w_int, cut)
        metrics.append({"round": rounds, "removals": removals})
    adj.unpersist()
    deg.unpersist()
    return (
        spark.createDataFrame([(i,) for i in sorted(com)], "id long"),
        q,
        SuperstepResult(iterations=rounds, metrics=metrics),
    )


def lfm_cover(
    g: Graph,
    alpha: float = 1.0,
    max_steps: int = 64,
    max_communities: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """((id, subset) overlapping cover, per-community metrics) — global
    LFM.

    Reference: community/LFM.cpp:16-40 — visit nodes in random order;
    every node not yet covered seeds one expandOneCommunity call (here
    :func:`lfm_local`, the same SCD the reference's Python bindings
    default to) whose members join a fresh subset.  Nodes can appear
    in several subsets: the cover is overlapping.

    Deviations, documented: the random visiting order is derandomized
    to ascending md5('lfm|' || id) (forNodesInRandomOrder replay rule),
    and the covered set lives on the driver — the reference's loop is
    equally sequential (each expansion must see the previous ones), so
    this is a fixture-scale orchestration of distributed expansions,
    like cut_clustering.  ``max_communities`` bounds the loop for
    safety on large graphs.
    """
    order = [
        int(r["id"])
        for r in g.nodes()
        .select(
            "id",
            F.md5(
                F.concat_ws("|", F.lit("lfm"), F.col("id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "id")
        .collect()
    ]
    spark = g.edges.sparkSession
    covered: set[int] = set()
    rows: list[tuple[int, int]] = []
    metrics: list[dict] = []
    o = 0
    for u in order:
        if u in covered:
            continue
        if max_communities is not None and o >= max_communities:
            break
        com_df, fitness, info = lfm_local(g, {u}, alpha=alpha,
                                          max_steps=max_steps)
        members = {int(r["id"]) for r in com_df.collect()}
        rows.extend((m, o) for m in sorted(members))
        covered |= members
        metrics.append(
            {"subset": o, "seed": u, "size": len(members),
             "fitness": fitness, "iterations": info.iterations}
        )
        o += 1
    return (
        spark.createDataFrame(rows or [], "id long, subset long"),
        metrics,
    )
