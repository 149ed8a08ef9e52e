"""AffectedNodes — the node set whose distances change under one edge
event, with the level-histogram closeness-improvement heuristic.

Reference: /root/reference/networkit/cpp/distance/AffectedNodes.cpp:
- run() dispatches on EDGE_ADDITION / EDGE_REMOVAL (:22-31); the graph
  handed in already reflects the event (additions: G contains the new
  edge and the pre-event distances are recovered by a BFS whose FIRST
  expansion skips the other endpoint, :308-344; removals: G lacks the
  edge and the pre-event reachability is recovered by seeding the
  improving BFS with the other endpoint at distance 1, :403-412).
- getAffectedNodes (:386-428) is a pruned BFS: a touched node is
  marked visited at its first-touch distance, but the search only
  CONTINUES through nodes whose new distance strictly improves on the
  old one; the affected set is exactly the improving nodes (plus the
  additionalStartNeighbor, pushed unconditionally).
- addedEdge undirected (:33-255): affected sets from both endpoints;
  distances[w] = min(old_u(w), old_v(w)); per-level closeness
  improvements from the old/new level histograms (:148-175), indexed
  by the COMPLETED new distance from the opposite endpoint
  (:168-174).  Directed addition (:178-251) uses reverse searches
  from v and a forward histogram pair from u, improvement index
  newDistV - 1 (:249).
- removedEdge (:257-306): affected = nodes whose distance increased;
  improvements stay 0 (never assigned on that path).

Spark-first shape: every search is a level-synchronous frontier wave
(one join + min-agg + anti-join per hop, O(frontier) rows — the same
plan as operators/distance.bfs_distances); a FIFO queue visits nodes
in non-decreasing distance order, so first-touch distance == the
min-per-wave distance and the wave replay is exact, not approximate.
Histogram/improvement algebra is joins over O(diameter)-row level
relations.  Documented deviations:
- the reference returns the affected lists concatenated (a node
  affected from both endpoints appears twice, :69-73); the relational
  form is the distinct node set,
- the reference indexes levelImprovement arrays with a distance from
  the OPPOSITE search, which can exceed the array bound (C++ UB,
  :168-174); out-of-range levels score 0.0 here,
- unreachable old distances surface as +inf doubles (the reference's
  std::numeric_limits<edgeweight>::max()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

INF = float("inf")


def _adj(g: Graph, reverse: bool) -> DataFrame:
    """(src, dst) expansion relation; undirected graphs expand both
    orientations, directed graphs follow out-edges (or in-edges when
    ``reverse``, the ReverseBFS direction)."""
    if not g.directed:
        base = g.adj()
    elif reverse:
        base = g.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    else:
        base = g.edges
    return base.filter(F.col("src") != F.col("dst")).select("src", "dst")


def _wave_bfs(
    g: Graph,
    adj: DataFrame,
    init: list[tuple[int, int]],
    ckpt: Checkpointer,
    old: DataFrame | None = None,
    exclude_first: int | None = None,
    tag: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Level-synchronous BFS waves -> (touched, affected).

    ``init``: (id, dist) seed rows, always expanded (the reference
    pushes the source — and the additionalStartNeighbor — without an
    improving check).  ``old``: when given, expansion continues only
    through rows with dist < old(id) (missing old = +inf), and
    ``affected`` collects exactly those rows; when None the search is
    a plain BFS and ``affected`` is empty.  ``exclude_first``: skip
    this node during the FIRST expansion only
    (bfsWithoutStartNeighbor, :321-329 — it stays reachable through
    longer detours).
    """
    spark = g.edges.sparkSession
    touched = spark.createDataFrame(
        [(int(i), int(d)) for i, d in init], "id long, dist long"
    )
    touched = ckpt.cut(touched, tag)
    frontier = touched
    affected = None
    wave = 0
    while True:
        wave += 1
        cand = (
            frontier.join(adj, frontier.id == adj.src)
            .select(F.col("dst").alias("id"), (frontier.dist + 1).alias("dist"))
        )
        if wave == 1 and exclude_first is not None:
            cand = cand.filter(F.col("id") != int(exclude_first))
        new = (
            cand.groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .join(touched.select("id"), "id", "left_anti")
        )
        new = ckpt.cut(new, tag + wave)
        if new.isEmpty():
            break
        touched = touched.unionByName(new)
        if old is None:
            frontier = new
        else:
            improving = new.join(
                old.select("id", F.col("dist").alias("old_d")), "id", "left"
            ).filter(
                F.col("old_d").isNull() | (F.col("dist") < F.col("old_d"))
            ).select("id", "dist")
            improving = ckpt.cut(improving, tag + 1000 + wave)
            affected = (
                improving if affected is None
                else affected.unionByName(improving)
            )
            if improving.isEmpty():
                break
            frontier = improving
        if wave % 8 == 0:
            touched = ckpt.cut(touched, tag + 2000 + wave)
    if affected is None:
        affected = spark.createDataFrame([], "id long, dist long")
    return touched, affected


def _completed(new_touched: DataFrame, old: DataFrame) -> DataFrame:
    """min(first-touch new distance, old distance) over the union of
    both supports — the reference's 'complete distances first' pass
    (:83-86); rows absent from both stay absent (= +inf)."""
    o = old.select("id", F.col("dist").alias("od"))
    n = new_touched.select("id", F.col("dist").alias("nd"))
    return (
        n.join(o, "id", "full_outer")
        .select(
            "id",
            F.least(
                F.coalesce("nd", F.col("od")), F.coalesce("od", F.col("nd"))
            ).alias("dist"),
        )
    )


def _hist(dist_df: DataFrame) -> DataFrame:
    """(j, c) level histogram over finite distances >= 1 (level 0 — the
    endpoint itself — is outside every reference loop, :138-145)."""
    return (
        dist_df.filter(F.col("dist") >= 1)
        .groupBy(F.col("dist").alias("j"))
        .agg(F.count("*").alias("c"))
    )


def _closeness(completed: DataFrame) -> float:
    row = (
        completed.filter(F.col("dist") >= 1)
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("c"))
        .collect()[0]
    )
    return float(row["c"]) if row["c"] is not None else 0.0


def _level_improvement(
    new_hist: DataFrame,
    old_hist: DataFrame,
    num_levels_i: int,
    num_levels_j: int,
) -> DataFrame:
    """(i, imp) for i = 1..num_levels_i: sum over j = 1..num_levels_j of
    (new_c[j] - old_c[j]) / (i + j) — both histograms capped at the NEW
    max level exactly like the reference loops (:151-165)."""
    spark = new_hist.sparkSession
    if num_levels_i <= 0:
        return spark.createDataFrame([], "i long, imp double")
    diff = (
        new_hist.join(old_hist.withColumnRenamed("c", "oc"), "j", "full_outer")
        .select(
            "j",
            (F.coalesce("c", F.lit(0)) - F.coalesce("oc", F.lit(0)))
            .cast("double").alias("d"),
        )
        .filter((F.col("j") >= 1) & (F.col("j") <= num_levels_j))
    )
    iseq = spark.range(1, num_levels_i + 1).select(F.col("id").alias("i"))
    return (
        iseq.crossJoin(diff)
        .groupBy("i")
        .agg(F.sum(F.col("d") / (F.col("i") + F.col("j"))).alias("imp"))
    )


def _max_level(df: DataFrame) -> int:
    row = df.filter(F.col("dist") >= 1).agg(F.max("dist")).collect()[0]
    return int(row[0]) if row[0] is not None else 0


class AffectedNodes:
    """``run()`` fills ``nodes`` (distinct affected ids), ``distances``
    ((id, dist) over the affected set, dist = the reference's
    min-over-endpoints old/new value, +inf when unreachable),
    ``improvements`` ((id, improvement), 0.0 outside the addition
    paths), and the ``closeness_u`` / ``closeness_v`` scalars."""

    def __init__(self, g: Graph, event_type: str, u: int, v: int) -> None:
        if event_type not in ("EDGE_ADDITION", "EDGE_REMOVAL"):
            raise ValueError(
                "AffectedNodes handles EDGE_ADDITION / EDGE_REMOVAL only"
            )
        self.g = g
        self.event_type = event_type
        self.u = int(u)
        self.v = int(v)
        self.nodes: DataFrame | None = None
        self.distances: DataFrame | None = None
        self.improvements: DataFrame | None = None
        self.closeness_u = 0.0
        self.closeness_v = 0.0
        self._ckpt = Checkpointer(g.edges.sparkSession)

    def run(self) -> "AffectedNodes":
        if self.event_type == "EDGE_ADDITION":
            self._added()
        else:
            self._removed()
        return self

    # -- addition (:33-255) -------------------------------------------
    def _added(self) -> None:
        g, u, v, ckpt = self.g, self.u, self.v, self._ckpt
        if not g.directed:
            adj = _adj(g, reverse=False)
            old_u, _ = _wave_bfs(g, adj, [(u, 0)], ckpt, exclude_first=v)
            old_v, _ = _wave_bfs(
                g, adj, [(v, 0)], ckpt, exclude_first=u, tag=5000
            )
            new_u, aff_u = _wave_bfs(
                g, adj, [(u, 0)], ckpt, old=old_u, tag=10000
            )
            new_v, aff_v = _wave_bfs(
                g, adj, [(v, 0)], ckpt, old=old_v, tag=15000
            )
            comp_u = _completed(new_u, old_u)
            comp_v = _completed(new_v, old_v)
            self.closeness_u = _closeness(comp_u)
            self.closeness_v = _closeness(comp_v)
            lvl_u, lvl_v = _max_level(comp_u), _max_level(comp_v)
            # levelImprovementU[i] sums the V-side histogram delta
            # (:160-165); levelImprovementV[i] the U-side (:151-158)
            imp_u = _level_improvement(_hist(comp_v), _hist(old_v), lvl_u, lvl_v)
            imp_v = _level_improvement(_hist(comp_u), _hist(old_u), lvl_v, lvl_u)
            score_u = (
                aff_u.select("id")
                .join(comp_v.select("id", F.col("dist").alias("ix")), "id", "left")
                .join(imp_u, F.col("ix") == F.col("i"), "left")
                .select("id", F.coalesce("imp", F.lit(0.0)).alias("improvement"))
            )
            score_v = (
                aff_v.select("id")
                .join(comp_u.select("id", F.col("dist").alias("ix")), "id", "left")
                .join(imp_v, F.col("ix") == F.col("i"), "left")
                .select("id", F.coalesce("imp", F.lit(0.0)).alias("improvement"))
            )
            # the second loop overwrites the first for doubly-affected
            # nodes (:168-174) — V-side scores win
            self.improvements = (
                score_u.join(score_v.select("id"), "id", "left_anti")
                .unionByName(score_v)
            )
            self._finish(aff_u, aff_v, old_u, old_v)
        else:
            radj = _adj(g, reverse=True)
            fadj = _adj(g, reverse=False)
            old_ru, _ = _wave_bfs(g, radj, [(u, 0)], ckpt)
            old_rv, _ = _wave_bfs(
                g, radj, [(v, 0)], ckpt, exclude_first=u, tag=5000
            )
            new_rv, aff_v = _wave_bfs(
                g, radj, [(v, 0)], ckpt, old=old_rv, tag=10000
            )
            old_fu, _ = _wave_bfs(
                g, fadj, [(u, 0)], ckpt, exclude_first=v, tag=15000
            )
            new_fu, _ = _wave_bfs(
                g, fadj, [(u, 0)], ckpt, old=old_fu, tag=20000
            )
            comp_fu = _completed(new_fu, old_fu)
            self.closeness_u = _closeness(comp_fu)
            lvl_u = _max_level(comp_fu)
            # numLevelsV scans the raw (uncompleted) touched distances
            # (:221-227)
            lvl_v = _max_level(new_rv)
            imp_v = _level_improvement(
                _hist(comp_fu), _hist(old_fu), lvl_v, lvl_u
            )
            # improvement index = newDistancesV - 1 (:249); level 0 = 0.0
            self.improvements = (
                aff_v.select("id", (F.col("dist") - 1).alias("ix"))
                .join(imp_v, F.col("ix") == F.col("i"), "left")
                .select("id", F.coalesce("imp", F.lit(0.0)).alias("improvement"))
            )
            self._finish(aff_v, None, old_rv, old_ru)

    # -- removal (:257-306) --------------------------------------------
    def _removed(self) -> None:
        g, u, v, ckpt = self.g, self.u, self.v, self._ckpt
        if not g.directed:
            adj = _adj(g, reverse=False)
            old_u, _ = _wave_bfs(g, adj, [(u, 0)], ckpt)
            old_v, _ = _wave_bfs(g, adj, [(v, 0)], ckpt, tag=5000)
            _, aff_u = _wave_bfs(
                g, adj, [(u, 0), (v, 1)], ckpt, old=old_u, tag=10000
            )
            _, aff_v = _wave_bfs(
                g, adj, [(v, 0), (u, 1)], ckpt, old=old_v, tag=15000
            )
            spark = g.edges.sparkSession
            # the additionalStartNeighbor is affected unconditionally
            # (:404-408)
            extra_u = spark.createDataFrame([(v, 1)], "id long, dist long")
            extra_v = spark.createDataFrame([(u, 1)], "id long, dist long")
            self._finish(
                aff_u.unionByName(extra_u), aff_v.unionByName(extra_v),
                old_u, old_v,
            )
        else:
            radj = _adj(g, reverse=True)
            old_rv, _ = _wave_bfs(g, radj, [(v, 0)], ckpt)
            _, aff = _wave_bfs(
                g, radj, [(v, 0), (u, 1)], ckpt, old=old_rv, tag=10000
            )
            spark = g.edges.sparkSession
            extra = spark.createDataFrame([(self.u, 1)], "id long, dist long")
            self._finish(aff.unionByName(extra), None, old_rv, None)

    def _finish(
        self,
        aff_a: DataFrame,
        aff_b: DataFrame | None,
        old_a: DataFrame,
        old_b: DataFrame | None,
    ) -> None:
        nodes = aff_a.select("id")
        if aff_b is not None:
            nodes = nodes.unionByName(aff_b.select("id"))
        nodes = nodes.distinct()
        da = old_a.select("id", F.col("dist").cast("double").alias("d_a"))
        joined = nodes.join(da, "id", "left")
        if old_b is not None:
            db = old_b.select("id", F.col("dist").cast("double").alias("d_b"))
            joined = joined.join(db, "id", "left")
            dist = F.least(
                F.coalesce("d_a", F.col("d_b")), F.coalesce("d_b", F.col("d_a"))
            )
        else:
            dist = F.col("d_a")
        self.nodes = nodes
        self.distances = joined.select(
            "id", F.coalesce(dist, F.lit(INF)).alias("dist")
        )
        if self.improvements is None:
            self.improvements = nodes.select(
                "id", F.lit(0.0).alias("improvement")
            )
        else:
            self.improvements = (
                nodes.join(self.improvements, "id", "left")
                .select(
                    "id",
                    F.coalesce("improvement", F.lit(0.0)).alias("improvement"),
                )
            )
