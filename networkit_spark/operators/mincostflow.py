"""SuccessiveShortestPath min-cost flow.

Reference (/root/reference/networkit/cpp/flow/SuccessiveShortestPath.cpp):
  - constructor (:15-68): directed weighted graph, edge weight = COST,
    capacities and supplies as attributes; caps must be non-negative and
    supplies must sum to zero.
  - computeNodePotentials (:70-100): Bellman-Ford over the arcs from the
    all-zero vector, negative-cycle detection.
  - run() (:160-240): repeat — (a) START = first node with supply > eps
    in node order (:178-184); (b) Dijkstra on the residual network with
    reduced costs rc = cost + pot(u) - pot(v) (:102-158); (c) pot +=
    dist where finite (:191-195); (d) TARGET = first demand node with a
    finite distance (:198-203, throws when none); (e) bottleneck =
    min(supply(s), -supply(t), min residual on the path) (:209-216);
    (f) augment, update imbalances (:219-229) — until no supply left;
    totalCost = sum flow * cost (:232-234).

Documented deviations:
  - "first node in node order" = ascending node id (the reference's
    nodeRange over compact ids — identical on compact inputs).
  - The shortest-path tree parent is the struct-min
    (dist, src, direction[forward<backward]) — the reference's tie is
    its binary-heap pop order (platform/heap-layout dependent); any
    shortest-path tree yields the same optimal cost, the pick only
    fixes WHICH optimal flow assignment both engines agree on.
  - Arcs must be unique per (src, dst) and antiparallel pairs are
    allowed (the reference keys residual state by edge id; (src, dst)
    keys are the relational equivalent).

Spark-first shape: potentials = Bellman-Ford supersteps (one join +
min-agg per round, early-stop on fixpoint); each augmentation's
shortest-path pass is the same superstep loop over the residual arcs
with non-negative reduced costs; the path backtrack is O(path) tiny
lookups like operators/flow.py.  Driver state is O(path) + two scalars
per round; the flow relation stays distributed.
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

EPS = 1e-9


def successive_shortest_path(
    g: Graph,
    capacities: DataFrame,
    supplies: DataFrame,
    max_augments: int = 10_000,
    max_relax_rounds: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[float, DataFrame, SuperstepResult]:
    """(total_cost, flows(src, dst, f), info) for the min-cost flow.

    ``g``: directed weighted graph, edge weight = cost per unit.
    ``capacities``: (src, dst, cap) for every arc of ``g``.
    ``supplies``: (id, supply) — positive supplies, negative demands;
    missing ids are 0.  Raises when supplies don't sum to ~0, when a
    capacity is negative, or when a residual negative-cost cycle exists
    (the reference's error conditions, :36-67, :85-99, :205-207).
    """
    if not g.directed:
        raise ValueError(
            "SuccessiveShortestPathMinCostFlow: Graph must be directed"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)

    arcs = (
        g.edges.select("src", "dst", F.col("weight").alias("cost"))
        .join(capacities.select("src", "dst", "cap"), ["src", "dst"])
    )
    arcs = materialize_partitioned(arcs, "src")
    if arcs.filter(F.col("cap") < 0).limit(1).count() > 0:
        raise ValueError("Capacities must be non-negative")
    dup = arcs.groupBy("src", "dst").count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError("arcs must be unique per (src, dst)")

    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    sup = (
        nodes.join(supplies.select("id", "supply"), "id", "left")
        .select("id", F.coalesce("supply", F.lit(0.0)).alias("supply"))
        .localCheckpoint(eager=True)
    )
    tot = sup.agg(F.sum("supply").alias("s")).collect()[0]["s"]
    if abs(float(tot or 0.0)) > 1e-6:
        raise ValueError(
            "Sum of node supplies and demands does not add up to zero"
        )
    rounds_cap = max_relax_rounds if max_relax_rounds is not None else n

    # ---- node potentials: Bellman-Ford over the original arcs --------
    pot = nodes.select("id", F.lit(0.0).alias("pot"))
    metrics: list[dict] = []
    for i in range(1, int(n)):
        relaxed = (
            pot.join(arcs, pot.id == arcs.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("pot") + F.col("cost")).alias("cand"))
        )
        new_pot = (
            pot.join(relaxed, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("pot"), F.coalesce("cand", F.col("pot"))
                ).alias("pot"),
            )
        )
        new_pot = ckpt.cut(new_pot, i)
        changed = (
            new_pot.alias("a")
            .join(pot.alias("b"), "id")
            .filter(F.col("a.pot") < F.col("b.pot") - EPS)
            .limit(1)
            .count()
        )
        pot = new_pot
        if changed == 0:
            break
    # negative-cycle check: one more relaxation must be a fixpoint
    relaxed = (
        pot.join(arcs, pot.id == arcs.src)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min(F.col("pot") + F.col("cost")).alias("cand"))
    )
    bad = (
        pot.join(relaxed, "id")
        .filter(F.col("cand") < F.col("pot") - EPS)
        .limit(1)
        .count()
    )
    if bad > 0:
        raise ValueError("negative-cost cycle in residual graph")

    flow = spark.createDataFrame([], "src long, dst long, f double")
    aug = 0
    while aug < max_augments:
        t0 = time.time()
        srow = (
            sup.filter(F.col("supply") > EPS)
            .orderBy(F.asc("id"))
            .limit(1)
            .collect()
        )
        if not srow:
            break
        aug += 1
        s_id, s_sup = int(srow[0]["id"]), float(srow[0]["supply"])
        # residual arcs with reduced costs
        fwd = (
            arcs.join(flow.hint("shuffle_hash"), ["src", "dst"], "left")
            .select(
                "src", "dst", "cost",
                (F.col("cap") - F.coalesce("f", F.lit(0.0))).alias("r"),
                F.lit(0).alias("back"),
            )
            .filter(F.col("r") > EPS)
        )
        bwd = (
            arcs.join(flow.hint("shuffle_hash"), ["src", "dst"])
            .filter(F.col("f") > EPS)
            .select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                (-F.col("cost")).alias("cost"), F.col("f").alias("r"),
                F.lit(1).alias("back"),
            )
        )
        radj = (
            fwd.unionByName(bwd)
            .join(pot.select(F.col("id").alias("src"),
                             F.col("pot").alias("ps")), "src")
            .join(pot.select(F.col("id").alias("dst"),
                             F.col("pot").alias("pd")), "dst")
            .select(
                "src", "dst", "r", "back",
                (F.col("cost") + F.col("ps") - F.col("pd")).alias("rc"),
            )
        )
        radj = ckpt.cut(radj, 1000 + aug)
        # shortest paths from s_id under non-negative reduced costs:
        # min-relaxation supersteps to fixpoint, struct-min parents
        dist = spark.createDataFrame(
            [(s_id, 0.0, None, None)],
            "id long, dist double, par long, back int",
        )
        for rr in range(1, int(rounds_cap) + 1):
            dist_slim = dist.select("id", "dist")
            cand = (
                dist_slim.join(radj, dist_slim.id == radj.src)
                .groupBy(F.col("dst").alias("id"))
                .agg(
                    F.min(
                        F.struct(
                            (F.col("dist") + F.col("rc")).alias("dist"),
                            F.col("src").alias("par"),
                            F.col("back").alias("back"),
                        )
                    ).alias("m")
                )
                .select("id", "m.dist", "m.par", "m.back")
            )
            new_dist = (
                dist.alias("a")
                .join(cand.alias("b"), "id", "full")
                .select(
                    "id",
                    F.when(
                        F.col("a.dist").isNull()
                        | (F.col("b.dist") < F.col("a.dist") - EPS),
                        F.struct(
                            F.col("b.dist").alias("dist"),
                            F.col("b.par").alias("par"),
                            F.col("b.back").alias("back"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.col("a.dist").alias("dist"),
                            F.col("a.par").alias("par"),
                            F.col("a.back").alias("back"),
                        )
                    )
                    .alias("m"),
                )
                .select("id", "m.dist", "m.par", "m.back")
            )
            new_dist = ckpt.cut(new_dist, 2000 + 100 * aug + rr)
            changed = (
                new_dist.alias("a")
                .join(dist.alias("b"), "id", "left")
                .filter(
                    F.col("b.dist").isNull()
                    | (F.col("a.dist") < F.col("b.dist") - EPS)
                )
                .limit(1)
                .count()
            )
            dist = new_dist
            if changed == 0:
                break
        # potentials update (pot += dist where finite)
        pot = ckpt.cut(
            pot.join(dist.select("id", "dist"), "id", "left")
            .select(
                "id",
                (F.col("pot") + F.coalesce("dist", F.lit(0.0))).alias("pot"),
            ),
            3000 + aug,
        )
        trow = (
            sup.filter(F.col("supply") < -EPS)
            .join(dist.select("id", "dist"), "id")
            .orderBy(F.asc("id"))
            .limit(1)
            .collect()
        )
        if not trow:
            raise ValueError("unable to satisfy all supplies/demands")
        t_id, t_sup = int(trow[0]["id"]), float(trow[0]["supply"])
        # backtrack the parent chain (O(path) driver lookups)
        path: list[tuple[int, int, int]] = []  # (u, v, back)
        cur = t_id
        seen_guard = 0
        while cur != s_id:
            row = dist.filter(F.col("id") == cur).collect()[0]
            par, back = int(row["par"]), int(row["back"])
            path.append((par, cur, back))
            cur = par
            seen_guard += 1
            if seen_guard > n:
                raise RuntimeError("parent chain cycle — relaxation bug")
        path_df = spark.createDataFrame(path, "src long, dst long, back int")
        bn = float(
            radj.join(F.broadcast(path_df), ["src", "dst", "back"])
            .agg(F.min("r").alias("b"))
            .collect()[0]["b"]
        )
        bottleneck = min(s_sup, -t_sup, bn)
        # augment: forward arcs +b on (u,v), backward arcs -b on (v,u)
        deltas = [
            ((u, v, bottleneck) if back == 0 else (v, u, -bottleneck))
            for (u, v, back) in path
        ]
        flow = ckpt.cut(
            flow.unionByName(
                spark.createDataFrame(deltas, "src long, dst long, f double")
            )
            .groupBy("src", "dst")
            .agg(F.sum("f").alias("f"))
            .filter(F.abs(F.col("f")) > EPS),
            4000 + aug,
        )
        sup = ckpt.cut(
            sup.select(
                "id",
                F.when(F.col("id") == s_id, F.col("supply") - bottleneck)
                .when(F.col("id") == t_id, F.col("supply") + bottleneck)
                .otherwise(F.col("supply"))
                .alias("supply"),
            ),
            5000 + aug,
        )
        metrics.append(
            {"augment": aug, "s": s_id, "t": t_id,
             "bottleneck": bottleneck, "wall_sec": time.time() - t0}
        )
    total_cost = (
        arcs.join(flow, ["src", "dst"])
        .agg(F.sum(F.col("f") * F.col("cost")).alias("c"))
        .collect()[0]["c"]
    )
    arcs.unpersist()
    return (
        float(total_cost or 0.0),
        flow,
        SuperstepResult(iterations=aug, metrics=metrics),
    )
