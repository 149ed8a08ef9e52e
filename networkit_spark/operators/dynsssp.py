"""Dynamic single-source shortest paths: DynBFS / DynDijkstra —
decrease-only repair of the (dist, sigma) relation under edge
insertions.

References (/root/reference/networkit/cpp/distance/):
- DynBFS.cpp (:21-70 static BFS with path counts npaths; :77-178
  updateBatch: level queues seeded by inserted edges, distances
  repaired top-down, npaths recomputed from predecessors, consumers
  enqueued when a predecessor's count changed).
- DynDijkstra.cpp — the weighted analogue (priority queue repair).
- DynSSSP.hpp — the shared contract: distances + number of shortest
  paths per node after each batch.

Spark-first: the state is ONE (id, dist, sigma) relation.
- Distance repair = decrease-only Bellman waves seeded from inserted
  edges' improving endpoints: each wave one adjacency join against the
  strictly-improved frontier — O(affected region), not O(n).
- Sigma repair = a level-ascending sweep over the AFFECTED set only:
  recompute sigma(v) from dist-1 predecessors, and push v's dist+1
  successors into the affected set when v's count changed — the exact
  relational form of the reference's queue discipline (DynBFS.cpp:
  120-171).

Weighted mode reuses the same code with w(u,v) sums and float dist
equality for the DAG test; exact for integer-valued weights (the
contract fixtures), documented for general doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

INF = float("inf")


def _wadj(g: Graph) -> DataFrame:
    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    e = g.edges.select("src", "dst", w.alias("w"))
    if not g.directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    return e


def sssp_sigma(
    g: Graph,
    source: int,
    max_rounds: int = 512,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(id, dist, sigma) — distances and shortest-path counts from
    ``source`` (DynBFS.cpp:21-70; Dijkstra via Bellman waves when the
    graph is weighted).  Unreached nodes are absent."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = _wadj(g).localCheckpoint(eager=True)
    dist = spark.createDataFrame([(source, 0.0)], "id long, dist double")
    dist = ckpt.cut(dist, 0)
    frontier = dist
    r = 0
    # phase 1: exact distances (decrease-only waves)
    while r < max_rounds:
        r += 1
        relax = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            relax.join(dist, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"))
        )
        improved = ckpt.cut(improved, r)
        if improved.isEmpty():
            break
        dist = ckpt.cut(
            dist.join(improved, "id", "left_anti").unionByName(improved),
            1000 + r,
        )
        frontier = improved
    return _sigma_from_dist(spark, adj, dist, source, ckpt)


def _sigma_from_dist(spark, adj, dist, source, ckpt) -> DataFrame:
    """Full sigma sweep over the shortest-path DAG of ``dist``."""
    sig = spark.createDataFrame(
        [(source, 0.0, 1)], "id long, dist double, sigma long"
    )
    sig = ckpt.cut(sig, 5000)
    levels = [
        float(x["dist"])
        for x in dist.select("dist").distinct().orderBy("dist").collect()
    ]
    for i, lv in enumerate(levels[1:], start=1):
        cur = dist.filter(F.col("dist") == lv)
        s = (
            adj.join(
                sig.select(F.col("id").alias("src"),
                           F.col("dist").alias("pd"),
                           F.col("sigma").alias("ps")),
                "src",
            )
            .join(cur.withColumnRenamed("id", "dst"), "dst")
            .filter(F.col("pd") + F.col("w") == F.col("dist"))
            .groupBy(F.col("dst").alias("id"), "dist")
            .agg(F.sum("ps").alias("sigma"))
        )
        sig = ckpt.cut(sig.unionByName(s), 5000 + i)
    return sig


def dyn_sssp_update(
    g_new: Graph,
    source: int,
    state: DataFrame,
    inserted: DataFrame,
    max_rounds: int = 512,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """Repaired (id, dist, sigma) after applying the EDGE_ADDITION batch
    ``inserted`` (u, v[, w]); ``g_new`` already contains those edges.

    Distance repair touches only the improving region; sigma repair
    sweeps only affected levels (DynBFS.cpp:77-178 discipline)."""
    spark = g_new.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = _wadj(g_new).localCheckpoint(eager=True)
    dist = state.select("id", "dist")
    old_sig = state.select("id", F.col("sigma").alias("old_sigma"))

    ins = inserted.select(
        "u", "v",
        (F.col("w").cast("double") if "w" in inserted.columns else F.lit(1.0))
        .alias("w"),
    )
    if not g_new.directed:
        ins = ins.unionByName(
            ins.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
    seed = (
        ins.join(dist.select(F.col("id").alias("u"), F.col("dist").alias("du")), "u")
        .select(F.col("v").alias("id"), (F.col("du") + F.col("w")).alias("nd"))
        .groupBy("id")
        .agg(F.min("nd").alias("nd"))
        .join(dist, "id", "left")
        .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
        .select("id", F.col("nd").alias("dist"))
    )
    frontier = ckpt.cut(seed, 0)
    changed = frontier  # accumulates every node whose dist improved
    r = 0
    while r < max_rounds and not frontier.isEmpty():
        r += 1
        dist = ckpt.cut(
            dist.join(frontier, "id", "left_anti").unionByName(frontier),
            r,
        )
        relax = (
            frontier.join(adj, frontier["id"] == adj["src"])
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        frontier = ckpt.cut(
            relax.join(dist, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist")),
            100 + r,
        )
        changed = changed.unionByName(frontier)

    # affected set for sigma: dist-changed nodes, nodes gaining a new
    # DAG predecessor through an inserted edge, AND DAG-successors of
    # dist-changed nodes (an old edge (u, w) becomes a shortest-path
    # edge when u's distance drops to dist(w) - w(u, w), even if u's
    # own sigma value happens to be unchanged)
    gained = (
        ins.join(dist.select(F.col("id").alias("u"), F.col("dist").alias("du")), "u")
        .join(dist.select(F.col("id").alias("v"), F.col("dist").alias("dv")), "v")
        .filter(F.col("du") + F.col("w") == F.col("dv"))
        .select(F.col("v").alias("id"))
    )
    dag_succ = (
        changed.select("id").distinct().withColumnRenamed("id", "src")
        .join(adj, "src")
        .join(
            dist.select(F.col("id").alias("dst"), F.col("dist").alias("dd")),
            "dst",
        )
        .join(
            dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")),
            "src",
        )
        .filter(F.col("ds") + F.col("w") == F.col("dd"))
        .select(F.col("dst").alias("id"))
    )
    affected = ckpt.cut(
        changed.select("id")
        .unionByName(gained)
        .unionByName(dag_succ)
        .distinct(),
        200,
    )

    sig = state.select("id", F.col("sigma"))
    # nodes with changed dist keep stale sigmas until their level is
    # swept; newly reached nodes have no sigma row yet
    sig = (
        dist.join(sig, "id", "left")
        .select("id", "dist", F.coalesce(F.col("sigma"), F.lit(0)).alias("sigma"))
    )
    sig = ckpt.cut(sig, 300)

    lv_rows = (
        affected.join(dist, "id")
        .select("dist")
        .distinct()
        .orderBy("dist")
        .collect()
    )
    pending = [float(x["dist"]) for x in lv_rows]
    step = 0
    while pending:
        lv = pending.pop(0)
        step += 1
        cur = affected.join(dist.filter(F.col("dist") == lv), "id")
        upd = (
            adj.join(
                sig.select(F.col("id").alias("src"),
                           F.col("dist").alias("pd"),
                           F.col("sigma").alias("ps")),
                "src",
            )
            .join(cur.select(F.col("id").alias("dst"), "dist"), "dst")
            .filter(F.col("pd") + F.col("w") == F.col("dist"))
            .groupBy(F.col("dst").alias("id"), "dist")
            .agg(F.sum("ps").alias("sigma"))
        )
        upd = ckpt.cut(upd, 400 + step)
        really = (
            upd.join(
                sig.select("id", F.col("sigma").alias("olds")), "id", "left"
            )
            .filter(
                F.col("olds").isNull() | (F.col("olds") != F.col("sigma"))
            )
            .select("id")
        )
        sig = ckpt.cut(
            sig.join(upd.select("id"), "id", "left_anti")
            .unionByName(upd.select("id", "dist", "sigma")),
            600 + step,
        )
        # successors of really-changed nodes join the affected set
        succ = (
            really.withColumnRenamed("id", "src")
            .join(adj, "src")
            .join(
                dist.select(F.col("id").alias("dst"), F.col("dist").alias("dd")),
                "dst",
            )
            .join(
                dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")),
                "src",
            )
            .filter(F.col("ds") + F.col("w") == F.col("dd"))
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new_aff = succ.join(affected, "id", "left_anti")
        new_aff = ckpt.cut(new_aff, 800 + step)
        if not new_aff.isEmpty():
            affected = ckpt.cut(affected.unionByName(new_aff), 900 + step)
            new_lvs = sorted(
                float(x["dist"])
                for x in new_aff.join(dist, "id")
                .select("dist").distinct().collect()
                if float(x["dist"]) > lv
            )
            pending = sorted(set(pending) | set(new_lvs))
    return sig.select("id", "dist", "sigma")
