"""Max-flow (Edmonds-Karp) and CutClustering.

References (semantics matched, execution re-designed for DataFrames):
  - /root/reference/networkit/cpp/flow/EdmondsKarp.cpp:116-205 —
    shortest (BFS) augmenting paths on the residual graph until no
    s-t path remains; getSourceSet = nodes reachable from s in the
    final residual network (the unique MINIMAL source-side min cut,
    independent of augmenting order).
  - /root/reference/networkit/cpp/community/CutClustering.cpp:18-77 —
    add an artificial sink t wired to every node with weight alpha;
    scan nodes by descending degree; each unclustered node u becomes
    the label of its u-t min-cut source side (source sides are nested).

Spark plan: every augmentation is a handful of tiny frontier joins
(BFS levels on the residual arcs) plus a backward path walk — rows
O(frontier) per step, state O(n).  The flow relation is a DataFrame of
directed arcs; the residual view is one join away.  Augmentation count
is bounded by cut capacity / min positive residual (unit-capacity use:
<= min degree), so the driver loop is short by construction.  The
max-flow VALUE and the minimal source set are engine-independent
(max-flow min-cut uniqueness) — what the cross-engine gate compares.
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


def edmonds_karp(
    g: Graph,
    source: int,
    sink: int,
    max_augments: int = 10_000,
    max_path_len: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[float, DataFrame, SuperstepResult]:
    """(flow_value, source_set(id), info) for the s-t max flow.

    Undirected graphs get capacity ``weight`` in BOTH directions
    (EdmondsKarp::runUndirected); directed use the stored arcs.  The
    BFS tree picks the smallest predecessor id per node — a documented
    deterministic refinement (the value and minimal source set do not
    depend on it).
    """
    if source == sink:
        raise ValueError("source and sink must differ")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    arcs = (
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("weight").alias("cap"))
    )
    arcs = materialize_partitioned(arcs, "src")
    # flow on directed arcs (absent row = 0)
    flow = spark.createDataFrame([], "src long, dst long, f double")
    total = 0.0
    metrics: list[dict] = []
    aug = 0
    cap_len = max_path_len if max_path_len is not None else 2**31
    while aug < max_augments:
        aug += 1
        t0 = time.time()
        # residual r(u,v) = cap - f(u,v) + f(v,u)
        rev = flow.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("f").alias("fr"),
        )
        radj = (
            arcs.join(flow.hint("shuffle_hash"), ["src", "dst"], "left")
            .join(rev.hint("shuffle_hash"), ["src", "dst"], "left")
            .select(
                "src", "dst",
                (
                    F.col("cap")
                    - F.coalesce("f", F.lit(0.0))
                    + F.coalesce("fr", F.lit(0.0))
                ).alias("r"),
            )
            .filter(F.col("r") > 0)
        )
        radj = ckpt.cut(radj, aug)
        # BFS levels from source, parent = min residual predecessor
        visited = spark.createDataFrame(
            [(source, None, 0)], "v long, par long, dist long"
        )
        frontier = visited.select("v")
        found = False
        lvl = 0
        while lvl < cap_len:
            lvl += 1
            nxt = (
                frontier.hint("shuffle_hash")
                .join(radj, frontier.v == radj.src)
                .groupBy(F.col("dst").alias("nv"))
                .agg(F.min("src").alias("par"))
                .join(
                    visited.select(F.col("v").alias("nv")), "nv", "left_anti"
                )
                .select(
                    F.col("nv").alias("v"), "par",
                    F.lit(lvl).cast("long").alias("dist"),
                )
            )
            nxt = ckpt.cut(nxt, 100 * aug + lvl)
            cnt = nxt.count()
            if cnt == 0:
                break
            # union of cut per-level increments (no full re-materialize);
            # compact every 8 levels
            visited = visited.unionByName(nxt)
            if lvl % 8 == 0:
                visited = ckpt.cut(visited, 100 * aug + 50 + lvl)
            if nxt.filter(F.col("v") == sink).limit(1).count() > 0:
                found = True
                break
            frontier = nxt.select("v")
        if not found:
            metrics.append(
                ckpt.log(aug, phase="done", value=total,
                         wall_sec=time.time() - t0)
            )
            aug -= 1
            break
        # walk the parent chain back from the sink (<= lvl tiny joins)
        path: list[tuple[int, int]] = []
        vmap = visited  # (v, par, dist)
        cur = sink
        for _ in range(lvl):
            row = vmap.filter(F.col("v") == cur).collect()[0]
            par = row["par"]
            if par is None:
                break
            path.append((int(par), cur))
            cur = int(par)
        path_df = spark.createDataFrame(path, "src long, dst long")
        bottleneck = float(
            radj.join(F.broadcast(path_df), ["src", "dst"])
            .agg(F.min("r").alias("b"))
            .collect()[0]["b"]
        )
        total += bottleneck
        flow = ckpt.cut(
            flow.unionByName(
                path_df.select("src", "dst", F.lit(bottleneck).alias("f"))
            )
            .groupBy("src", "dst")
            .agg(F.sum("f").alias("f")),
            1000 + aug,
        )
        metrics.append(
            ckpt.log(aug, phase="augment", pushed=bottleneck, path_len=len(path),
                     value=total, wall_sec=time.time() - t0)
        )
    # minimal source side: residual reachability from s (final residual)
    rev = flow.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("f").alias("fr")
    )
    radj = (
        arcs.join(flow, ["src", "dst"], "left")
        .join(rev, ["src", "dst"], "left")
        .select(
            "src", "dst",
            (F.col("cap") - F.coalesce("f", F.lit(0.0))
             + F.coalesce("fr", F.lit(0.0))).alias("r"),
        )
        .filter(F.col("r") > 0)
    ).localCheckpoint(eager=True)
    reach = spark.createDataFrame([(source,)], "id long")
    while True:
        nxt = (
            reach.join(radj, reach.id == radj.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reach, "id", "left_anti")
        ).localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        reach = reach.unionByName(nxt).localCheckpoint(eager=True)
    arcs.unpersist()
    return total, reach, SuperstepResult(iterations=aug, metrics=metrics)


def cut_clustering(
    g: Graph, alpha: float, checkpointer: Checkpointer | None = None
) -> DataFrame:
    """CutClustering.run: (id, label) — label = the scanning node whose
    u-sink min-cut source side captured the node.  Scan order: degree
    DESCENDING, then id (the reference's bucket sort :39-58 places
    higher-degree nodes first; ties keep node order = ascending id)."""
    spark = g.edges.sparkSession
    t = int(
        g.nodes().agg(F.max("id").alias("m")).collect()[0]["m"]
    ) + 1
    base = g.edges.select("src", "dst", "weight")
    star = g.nodes().select(
        F.col("id").alias("src"), F.lit(t).alias("dst"),
        F.lit(float(alpha)).alias("weight"),
    )
    aug = Graph(
        base.unionByName(star),
        vertices=g.nodes().unionByName(
            spark.createDataFrame([(t,)], "id long")
        ),
        directed=False,
        weighted=True,
    )
    order = [
        int(r["id"])
        for r in g.degrees().orderBy(F.desc("degree"), F.asc("id")).collect()
    ]
    labels: dict[int, int] = {}
    for u in order:
        if u in labels:
            continue
        _, source_set, _ = edmonds_karp(aug, u, t,
                                        checkpointer=checkpointer)
        for r in source_set.collect():
            # overwrite: a later source side may ABSORB earlier
            # clusters (CutClustering.cpp:70-73); nestedness guarantees
            # it swallows them whole
            labels[int(r["id"])] = u
    return spark.createDataFrame(
        sorted(labels.items()), "id long, label long"
    )


def dinic(
    g: Graph,
    source: int,
    sink: int,
    max_phases: int = 64,
    max_paths: int = 10_000,
    checkpointer: Checkpointer | None = None,
) -> tuple[float, SuperstepResult]:
    """Dinic max-flow VALUE on a directed weighted graph.

    Reference: /root/reference/networkit/cpp/flow/Dinic.cpp:15-140 —
    run() alternates level-graph BFS (canReachTargetInLevelGraph,
    :50-76) with a blocking flow over the level parents
    (computeBlockingPath, :78-124) until the sink leaves the level
    graph; requires a directed weighted graph (:17-22) and non-negative
    capacities (:36-38).  The flow VALUE is engine-independent
    (max-flow/min-cut); the reference exposes only getMaxFlow (:139).

    Spark plan: each phase is one level BFS (frontier joins, O(frontier)
    rows per step) on the residual arcs; the blocking flow saturates the
    shortest-path DAG one deterministic min-parent path at a time — the
    same tiny-join backtrack as :func:`edmonds_karp`, but restricted to
    arcs with level(dst) = level(src)+1, which is what bounds the phase
    count at O(V).  Phase count and per-phase path count are data-small
    (paths of one length class per phase); driver state is O(path).
    """
    if not g.directed:
        raise ValueError("Dinic requires a directed graph (Dinic.cpp:17)")
    if source == sink:
        raise ValueError("source and sink must differ (Dinic.cpp:23)")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    if g.edges.filter(F.col("weight") < 0).limit(1).count() > 0:
        raise ValueError("Dinic requires non-negative capacities")
    arcs = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.col("weight").alias("cap"))
        .groupBy("src", "dst")
        .agg(F.sum("cap").alias("cap"))
    )
    arcs = materialize_partitioned(arcs, "src")
    flow = spark.createDataFrame([], "src long, dst long, f double")
    total = 0.0
    metrics: list[dict] = []
    paths = 0
    phase = 0

    def residual(fl: DataFrame) -> DataFrame:
        rev = fl.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("f").alias("fr"),
        )
        return (
            arcs.join(fl.hint("shuffle_hash"), ["src", "dst"], "left")
            .join(rev.hint("shuffle_hash"), ["src", "dst"], "left")
            .select(
                "src", "dst",
                (
                    F.col("cap")
                    - F.coalesce("f", F.lit(0.0))
                    + F.coalesce("fr", F.lit(0.0))
                ).alias("r"),
            )
            .filter(F.col("r") > 1e-12)
        )

    while phase < max_phases:
        phase += 1
        t0 = time.time()
        radj = ckpt.cut(residual(flow), 10_000 + phase)
        # level BFS from source (Dinic.cpp:50-76)
        levels = spark.createDataFrame([(source, 0)], "v long, lvl long")
        frontier = levels
        sink_lvl = None
        lvl = 0
        while True:
            lvl += 1
            nxt = (
                frontier.hint("shuffle_hash")
                .join(radj, frontier.v == radj.src)
                .select(F.col("dst").alias("v"))
                .distinct()
                .join(levels.select("v"), "v", "left_anti")
                .select("v", F.lit(lvl).cast("long").alias("lvl"))
            )
            nxt = ckpt.cut(nxt, 10_000 + 100 * phase + lvl)
            if nxt.limit(1).count() == 0:
                break
            levels = levels.unionByName(nxt)
            if lvl % 8 == 0:
                levels = ckpt.cut(levels, 10_000 + 100 * phase + 50 + lvl)
            if nxt.filter(F.col("v") == sink).limit(1).count() > 0:
                sink_lvl = lvl
                break
            frontier = nxt
        if sink_lvl is None:
            metrics.append(
                ckpt.log(phase, phase_name="done", value=total,
                         wall_sec=time.time() - t0)
            )
            phase -= 1
            break
        levels = ckpt.cut(levels, 10_000 + 100 * phase + 99)
        lsrc = levels.select(F.col("v").alias("src"), F.col("lvl").alias("lsrc"))
        ldst = levels.select(F.col("v").alias("dst"), F.col("lvl").alias("ldst"))
        pushed_phase = 0.0
        # blocking flow: saturate min-parent shortest paths on the level
        # DAG until the sink is cut off at this level (Dinic.cpp:78-124)
        while paths < max_paths:
            lradj = (
                residual(flow)
                .join(lsrc, "src")
                .join(ldst, "dst")
                .filter(
                    (F.col("ldst") == F.col("lsrc") + 1)
                    & (F.col("ldst") <= sink_lvl)
                )
                .select("src", "dst", "r")
            )
            lradj = ckpt.cut(lradj, 20_000 + 100 * phase + paths % 100)
            # min-parent BFS of depth sink_lvl on the level arcs
            vis = spark.createDataFrame(
                [(source, None)], "v long, par long"
            )
            frontier = vis.select("v")
            reached = False
            for step in range(1, sink_lvl + 1):
                nxt = (
                    frontier.hint("shuffle_hash")
                    .join(lradj, frontier.v == lradj.src)
                    .groupBy(F.col("dst").alias("v"))
                    .agg(F.min("src").alias("par"))
                    .join(vis.select("v"), "v", "left_anti")
                )
                nxt = ckpt.cut(
                    nxt, 30_000 + 1000 * phase + 10 * (paths % 90) + step
                )
                if nxt.limit(1).count() == 0:
                    break
                vis = vis.unionByName(nxt)
                if nxt.filter(F.col("v") == sink).limit(1).count() > 0:
                    reached = True
                    break
                frontier = nxt.select("v")
            if not reached:
                break
            paths += 1
            path: list[tuple[int, int]] = []
            cur = sink
            for _ in range(sink_lvl):
                row = vis.filter(F.col("v") == cur).collect()[0]
                par = row["par"]
                if par is None:
                    break
                path.append((int(par), cur))
                cur = int(par)
            path_df = spark.createDataFrame(path, "src long, dst long")
            bottleneck = float(
                lradj.join(F.broadcast(path_df), ["src", "dst"])
                .agg(F.min("r").alias("b"))
                .collect()[0]["b"]
            )
            total += bottleneck
            pushed_phase += bottleneck
            flow = ckpt.cut(
                flow.unionByName(
                    path_df.select(
                        "src", "dst", F.lit(bottleneck).alias("f")
                    )
                )
                .groupBy("src", "dst")
                .agg(F.sum("f").alias("f")),
                40_000 + paths,
            )
        metrics.append(
            ckpt.log(phase, phase_name="blocking_flow", pushed=pushed_phase,
                     value=total, wall_sec=time.time() - t0)
        )
        if pushed_phase <= 1e-12:
            break
    arcs.unpersist()
    return total, SuperstepResult(iterations=phase, metrics=metrics)
