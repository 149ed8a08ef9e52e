"""Pruned Landmark Labeling (2-hop hub labeling) + dynamic edge insertions.

Reference:
  - ``networkit/cpp/distance/PrunedLandmarkLabeling.cpp:12-131`` — Akiba,
    Iwata, Yoshida (SIGMOD'13): n pruned BFSs in degree-descending rank
    order; node u keeps label (root, level) iff the 2-hop query over
    already-built labels cannot match the BFS level (``prunedBFS``,
    :40-85; ``queryImpl`` merge-join over rank-sorted label lists,
    :97-123).
  - ``networkit/cpp/distance/DynPrunedLandmarkLabeling.cpp:11-160`` —
    edge-insertion repair: resume a pruned BFS per affected hub (merged
    from the two endpoints' pre-event label lists), pruning restricted to
    hubs ranked at or above the resumed hub (``queryImpl(..., k)``), with
    same-hub labels overwritten when the new distance is smaller
    (``sortUpdatedLabels``, :18-44).

Spark plan — the root dimension of the reference is inherently serial
(BFS k prunes with labels of BFS 1..k-1), so a per-root translation would
be n driver-sequenced BFSs.  The distributed re-expression is the
level-synchronous PSL formulation (Li, Qiao, Cheng, Chang, "Scaling
Distance Labeling on Small-World Networks", SIGMOD'19): one superstep per
DISTANCE LEVEL.  At level d the candidate set is (level d-1 labels) ⋈
adjacency — one shuffle on the loop-invariant, cached, hash-partitioned
adjacency — and a candidate hub r at node u survives iff

  rank(r) < rank(u)   and   no common hub x of r and u (levels < d)
                            has  d(x,r) + d(x,u) <= d.

Both computations produce the CANONICAL hub labeling of the rank order —
(r, u, d(r,u)) is kept iff r is the unique minimum-rank vertex in the
union of all shortest r-u paths — so the label sets agree exactly (the
induction: a surviving candidate's parent label is canonical, and a
non-canonical candidate is always refuted by the canonical labels of the
min-rank witness w, whose two legs both sit at strictly earlier levels
because w != r and w != u under the strict rank filter).  Degree ties are
resolved (degree desc, id asc) here; the reference's parallel sort leaves
tie order unspecified (PrunedLandmarkLabeling.cpp:19-28), so any fixed
tie-break is within its contract — query distances are order-invariant.

Scale shape: state is the label table, O(n * avg-label-size) — the same
asymptotic index the reference stores in RAM; per level one join against
adjacency plus two hash joins against the label table (pruning), all
key-partitioned; no global sort (ranks come from the two-phase
``plans.ids.dense_ids``), no collect of anything O(n).

Dynamic insertions: the reference repairs one hub at a time because a
later hub's pruning may consult labels the earlier repair just wrote.
Here every affected hub's resumed BFS advances in ONE shared frontier
(rows carry their own (hub, rank, level)); pruning sees pre-event labels
plus all labels emitted by earlier ROUNDS of the shared loop.  Seeing
fewer labels can only keep MORE candidates, and every kept label is an
actual walk length through the new edge, so the result is a superset of
the reference's label set with identical query distances — which is what
the gate checks (exact BFS distances on the post-event graph).  Events
are applied strictly in sequence, like the reference's update().
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.ids import dense_ids
from networkit_spark.plans.superstep import (
    Checkpointer,
    cut_lineage,
    materialize_partitioned,
)


@dataclass
class PLLResult:
    """``labels``: (hub, hrnk, id, dist) forward labels — undirected
    d(hub,id); directed d(hub->id) (the reference's labelsOut).
    ``labels_in``: directed only — (hub, hrnk, id, dist) with dist =
    d(id->hub) (the reference's labelsIn, built by reverse BFS).
    ``ranks``: (id, rnk) 0-based, degree desc / id asc order."""

    labels: DataFrame
    ranks: DataFrame
    labels_in: DataFrame | None = None
    levels: int = 0
    metrics: list | None = None


def _ranks(g: Graph) -> DataFrame:
    """0-based rank, highest degree first (ties: in-degree desc for
    directed per PrunedLandmarkLabeling.cpp:20-25, then id asc)."""
    deg = g.degrees().select("id", F.col("degree").alias("_d"))
    if g.directed:
        ind = g.in_degrees().select("id", F.col("degree").alias("_di"))
        deg = deg.join(ind, "id", "left").fillna(0, subset=["_di"])
        order = ["_nd", "_ndi", "id"]
        deg = deg.withColumn("_nd", -F.col("_d")).withColumn(
            "_ndi", -F.col("_di")
        )
    else:
        order = ["_nd", "id"]
        deg = deg.withColumn("_nd", -F.col("_d"))
    return dense_ids(deg, order, "rnk").select("id", "rnk")


def _prune(cand: DataFrame, lab: DataFrame, d: int) -> DataFrame:
    """Drop candidates (hub r, node u) refuted by a common hub x of r
    and u among the existing labels: d(x,r) + d(x,u) <= d.  Mirrors
    queryImpl (PrunedLandmarkLabeling.cpp:97-123) applied as the prune
    test of prunedBFS:61-66, expressed as two hash joins."""
    p = lab.select(
        F.col("hub").alias("_x"),
        F.col("id").alias("_r"),
        F.col("dist").alias("_d1"),
    )
    q = lab.select(
        F.col("hub").alias("_x"),
        F.col("id").alias("_u"),
        F.col("dist").alias("_d2"),
    )
    bad = (
        p.join(q, "_x")
        .filter(F.col("_d1") + F.col("_d2") <= F.lit(d))
        .select(F.col("_r").alias("hub"), F.col("_u").alias("id"))
        .distinct()
    )
    return cand.join(bad, ["hub", "id"], "left_anti")


def pruned_landmark_labeling(
    g: Graph,
    max_levels: int = 128,
    checkpointer: Checkpointer | None = None,
) -> PLLResult:
    """Canonical 2-hop hub labeling via level-synchronous PSL supersteps
    (== PrunedLandmarkLabeling::run, PrunedLandmarkLabeling.cpp:87-96,
    for the (degree desc, id asc) rank order).  Weights are ignored like
    the reference (:16)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    ranks = materialize_partitioned(_ranks(g), "id")
    adj = materialize_partitioned(g.adj().select("src", "dst"), "src")

    def level_zero() -> DataFrame:
        return ranks.select(
            F.col("id").alias("hub"),
            F.col("rnk").alias("hrnk"),
            F.col("id"),
            F.lit(0).cast("long").alias("dist"),
        )

    families = [("out", adj)]
    if g.directed:
        # reverse BFS extends along in-edges: a label (x, d(u->x)) at u
        # propagates to predecessors w of u (w->u edge).
        radj = materialize_partitioned(
            g.adj().select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            "src",
        )
        families.append(("in", radj))

    state: dict[str, DataFrame] = {}
    frontier: dict[str, DataFrame] = {}
    for name, _ in families:
        lab0 = ckpt.cut(level_zero(), 0)
        state[name] = lab0
        frontier[name] = lab0

    metrics: list[dict] = []
    d = 0
    while d < max_levels:
        d += 1
        t0 = time.time()
        new_counts = {}
        new_front: dict[str, DataFrame] = {}
        for name, a in families:
            cand = (
                frontier[name]
                .join(a, frontier[name]["id"] == a["src"])
                .select("hub", "hrnk", F.col("dst").alias("id"))
                .distinct()
                .join(ranks, "id")
                .filter(F.col("hrnk") < F.col("rnk"))
                .select("hub", "hrnk", "id")
            )
            if g.directed:
                # directed query(r, u) joins labels_in[r] with
                # labels_out[u] (queryImpl via getSourceLabelsIterators,
                # PrunedLandmarkLabeling.hpp:62-72): the "out" family
                # prunes against in-labels of the hub + out-labels of
                # the node, and symmetrically for the "in" family.
                hub_side = state["in"] if name == "out" else state["out"]
                node_side = state[name]
                p = hub_side.select(
                    F.col("hub").alias("_x"),
                    F.col("id").alias("_r"),
                    F.col("dist").alias("_d1"),
                )
                q = node_side.select(
                    F.col("hub").alias("_x"),
                    F.col("id").alias("_u"),
                    F.col("dist").alias("_d2"),
                )
                bad = (
                    p.join(q, "_x")
                    .filter(F.col("_d1") + F.col("_d2") <= F.lit(d))
                    .select(F.col("_r").alias("hub"), F.col("_u").alias("id"))
                    .distinct()
                )
                keep = cand.join(bad, ["hub", "id"], "left_anti")
            else:
                keep = _prune(cand, state[name], d)
            keep = ckpt.cut(
                keep.withColumn("dist", F.lit(d).cast("long")),
                d * 10 + (0 if name == "out" else 1),
            )
            new_front[name] = keep
            new_counts[name] = keep.count()
        for name, _ in families:
            state[name] = state[name].unionByName(new_front[name])
            if d % 4 == 0:
                state[name] = cut_lineage(state[name])
            frontier[name] = new_front[name]
        metrics.append(
            ckpt.log(d, state=state["out"], wall_sec=time.time() - t0, **new_counts)
        )
        if all(c == 0 for c in new_counts.values()):
            break

    labels = cut_lineage(state["out"])
    labels_in = cut_lineage(state["in"]) if g.directed else None
    return PLLResult(
        labels=labels, ranks=ranks, labels_in=labels_in, levels=d, metrics=metrics
    )


def pll_query(res: PLLResult, pairs: DataFrame, directed: bool = False) -> DataFrame:
    """(s, t, dist) exact shortest-path distances for the given (s, t)
    pairs; unreachable pairs are omitted (the reference returns infDist,
    PrunedLandmarkLabeling.cpp:104; left-join callers get NULL).  s == t
    answers 0 without touching labels (queryImpl:98-99)."""
    src_side = res.labels_in if directed else res.labels
    ls = src_side.select(
        F.col("hub").alias("_x"), F.col("id").alias("s"), F.col("dist").alias("_d1")
    )
    lt = res.labels.select(
        F.col("hub").alias("_x"), F.col("id").alias("t"), F.col("dist").alias("_d2")
    )
    via = (
        pairs.join(ls, "s")
        .join(lt, ["_x", "t"])
        .groupBy("s", "t")
        .agg(F.min(F.col("_d1") + F.col("_d2")).alias("dist"))
    )
    same = pairs.filter(F.col("s") == F.col("t")).select(
        "s", "t", F.lit(0).cast("long").alias("dist")
    )
    return (
        via.filter(F.col("s") != F.col("t"))
        .unionByName(same.distinct())
        .select("s", "t", "dist")
    )


def dyn_pll_add_edges(
    g_after: Graph,
    res: PLLResult,
    events: list[tuple[int, int]],
    checkpointer: Checkpointer | None = None,
) -> PLLResult:
    """Apply EDGE_ADDITION events in sequence to an undirected labeling
    (DynPrunedLandmarkLabeling::update/addEdge, :11-160; any other event
    type raises, like the reference :14-15).

    Per event (u, v): the resumed pruned BFSs of all affected hubs — the
    union of both endpoints' PRE-EVENT label lists, hub k starting at the
    opposite endpoint at level d(k, endpoint)+1 (addEdge:95-135 walks the
    merged lists; starting BOTH sides for a shared hub only adds valid
    walk-length labels) — advance in one shared frontier.  Pruning is the
    2-hop query restricted to hubs ranked <= rank(k)
    (``queryImpl(u, root, k)``, DynPrunedLandmarkLabeling.cpp:68-73);
    same-hub improvements overwrite via a (hub, id) min — exactly the
    sortUpdatedLabels:18-44 overwrite rule, since a label is only emitted
    when the query exceeds the new level.  The reference's undirected
    second tail loop passes reverse=true into an in-label array it never
    allocated for undirected graphs (:131-134 vs PrunedLandmarkLabeling
    .cpp:33-34); the intended forward repair is what runs here.

    ``g_after`` must already contain all inserted edges (the reference's
    update() is likewise called after the graph event was applied).
    """
    if g_after.directed:
        raise NotImplementedError(
            "dynamic repair is implemented for undirected labelings"
        )
    spark = g_after.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = materialize_partitioned(g_after.adj().select("src", "dst"), "src")
    lab = res.labels

    for u, v in events:
        pre = lab  # pre-event snapshot: the reference copies both lists
        seeds = None
        for a, b in ((u, v), (v, u)):
            s = pre.filter(F.col("id") == int(a)).select(
                "hub",
                "hrnk",
                F.lit(int(b)).cast("long").alias("id"),
                (F.col("dist") + 1).alias("lvl"),
            )
            seeds = s if seeds is None else seeds.unionByName(s)
        frontier = ckpt.cut(
            seeds.groupBy("hub", "hrnk", "id").agg(F.min("lvl").alias("lvl")), 0
        )
        visited = frontier.select("hub", "id")
        rounds = 0
        while True:
            rounds += 1
            # query(k, x) over common hubs ranked <= rank(k): labels of
            # the hub k are small rank-dominated sets; labels of x join
            # by (hub-of-label, node).
            hub_lab = lab.select(
                F.col("id").alias("_k"), F.col("hub").alias("_x"),
                F.col("dist").alias("_d1"),
            )
            node_lab = lab.select(
                F.col("hub").alias("_x"), F.col("hrnk").alias("_xr"),
                F.col("id").alias("_u"), F.col("dist").alias("_d2"),
            )
            qmin = (
                frontier.join(hub_lab, frontier["hub"] == hub_lab["_k"])
                .join(
                    node_lab,
                    (F.col("_u") == frontier["id"])
                    & (node_lab["_x"] == hub_lab["_x"])
                    & (F.col("_xr") <= frontier["hrnk"]),
                )
                .groupBy("hub", "id")
                .agg(F.min(F.col("_d1") + F.col("_d2")).alias("_q"))
            )
            keep = (
                frontier.join(qmin, ["hub", "id"], "left")
                .filter(F.col("_q").isNull() | (F.col("_q") > F.col("lvl")))
                .select("hub", "hrnk", "id", "lvl")
            )
            keep = ckpt.cut(keep, rounds)
            if keep.isEmpty():
                break
            new_labels = keep.select(
                "hub", "hrnk", "id", F.col("lvl").cast("long").alias("dist")
            )
            # overwrite rule: keep the smaller distance per (hub, id)
            lab = cut_lineage(
                lab.unionByName(new_labels)
                .groupBy("hub", "hrnk", "id")
                .agg(F.min("dist").alias("dist"))
            )
            nxt = (
                keep.join(adj, keep["id"] == adj["src"])
                .select("hub", "hrnk", F.col("dst").alias("id"),
                        (F.col("lvl") + 1).alias("lvl"))
                .groupBy("hub", "hrnk", "id")
                .agg(F.min("lvl").alias("lvl"))
                .join(visited, ["hub", "id"], "left_anti")
            )
            frontier = ckpt.cut(nxt, 100 + rounds)
            visited = cut_lineage(
                visited.unionByName(frontier.select("hub", "id"))
            )
    return PLLResult(labels=lab, ranks=res.ranks, levels=res.levels)
