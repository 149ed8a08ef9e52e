"""Reachability: per-node reachable-set sizes (exact and estimated).

Reference: /root/reference/networkit/cpp/reachability/ReachableNodes.cpp
- runUndirected (:157-163): reachable(u) = size of u's connected
  component.
- runDirected exact (:26-86): SCC condensation, then a BFS per
  condensation node counts the total member size of its reachable
  component set; every node inherits its SCC's count.
- runDirected estimate (:88-153): single BFS from the LARGEST SCC gives
  its exact count; every other SCC gets a lower bound (max over
  successors, + own size) and an upper bound (sum over successors,
  + own size, clamped to n).  The reference's
  ``reachUWithoutLargestSCC`` vector is never seeded and stays zero, so
  the ``reachesLargestSCC`` correction (:141-142) adds nothing; we
  reproduce the effective semantics (documented here rather than
  re-implementing the no-op).

Spark-first shapes:
- The condensation is tiny relative to the graph (|C| components); the
  exact closure is a frontier superstep over (source_comp, reached_comp)
  pairs — worst case O(|C|^2) rows, which is the same work the
  reference's per-SCC BFS sweep does, expressed as joins so it
  distributes.  On web graphs the condensation collapses the giant SCC,
  so |C| << n.
- The estimate variant is two Bellman-style fixpoints over the
  condensation DAG (max-DP for the LB, clamped sum-DP for the UB), one
  join + aggregation per round, DAG-depth rounds — O(|C|) state, never
  a closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def _condensation(g: Graph, ckpt: Checkpointer):
    """(labels(id, label), sizes(label, sz), cedges(csrc, cdst))."""
    from networkit_spark.operators.scc import strongly_connected_components

    labels, _ = strongly_connected_components(g, checkpointer=ckpt)
    labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("csrc"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("cdst"))
    cedges = (
        g.edges.select("src", "dst")
        .join(ls, "src")
        .join(ld, "dst")
        .filter(F.col("csrc") != F.col("cdst"))
        .select("csrc", "cdst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return labels, sizes.localCheckpoint(eager=True), cedges


def reachable_nodes(
    g: Graph,
    exact: bool = True,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 512,
) -> DataFrame:
    """(id, reachable_lb, reachable_ub) — ReachableNodes.cpp semantics.

    ``exact=True``: lb == ub == the exact number of nodes reachable from
    id (including itself).  ``exact=False`` (directed only): the
    reference's LB/UB estimate from one BFS out of the largest SCC plus
    a DAG DP.  Undirected graphs are always exact (component sizes).
    """
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)

    if not g.directed:
        from networkit_spark.operators.components import connected_components

        labels, _ = connected_components(g, checkpointer=ckpt)
        sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
        return labels.join(sizes, "label").select(
            "id",
            F.col("sz").alias("reachable_lb"),
            F.col("sz").alias("reachable_ub"),
        )

    labels, sizes, cedges = _condensation(g, ckpt)
    comps = sizes.select("label")

    if exact:
        # transitive closure over the condensation DAG: frontier
        # supersteps on (s, c) pairs; new pairs only, anti-joined
        # against the settled set each round.
        reached = comps.select(
            F.col("label").alias("s"), F.col("label").alias("c")
        ).localCheckpoint(eager=True)
        frontier = reached
        rounds = 0
        while rounds < max_rounds:
            rounds += 1
            nxt = (
                frontier.join(
                    cedges, frontier["c"] == cedges["csrc"], "inner"
                )
                .select("s", F.col("cdst").alias("c"))
                .distinct()
            )
            new = nxt.join(reached, ["s", "c"], "left_anti").localCheckpoint(
                eager=True
            )
            if new.isEmpty():
                break
            reached = reached.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        counts = (
            reached.join(sizes, reached["c"] == sizes["label"])
            .groupBy("s")
            .agg(F.sum("sz").alias("cnt"))
        )
        return labels.join(
            counts, labels["label"] == counts["s"]
        ).select(
            "id",
            F.col("cnt").alias("reachable_lb"),
            F.col("cnt").alias("reachable_ub"),
        )

    # ---- estimate: BFS out of the largest SCC + Bellman DP ------------
    largest = sizes.orderBy(F.desc("sz"), F.asc("label")).first()
    largest_label, n_total = int(largest["label"]), g.number_of_nodes()

    # single-source closure from the largest SCC over the condensation
    from_l = spark.createDataFrame(
        [(largest_label,)], "c long"
    ).localCheckpoint(eager=True)
    frontier = from_l
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        nxt = (
            frontier.join(cedges, frontier["c"] == cedges["csrc"])
            .select(F.col("cdst").alias("c"))
            .distinct()
        )
        new = nxt.join(from_l, "c", "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            break
        from_l = from_l.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    reach_largest = int(
        from_l.join(sizes, from_l["c"] == sizes["label"])
        .agg(F.sum("sz"))
        .first()[0]
    )

    # Bellman fixpoints over the DAG (converge in DAG-depth rounds):
    #   lb(u) = reach_largest                     if u == largest
    #         = sz(u) + max(0, max_succ lb)       otherwise
    #   ub(u) = reach_largest                     if u == largest
    #         = min(n, sz(u) + sum_succ ub)       otherwise
    state = sizes.select(
        "label",
        F.when(F.col("label") == largest_label, F.lit(reach_largest))
        .otherwise(F.col("sz"))
        .cast("long")
        .alias("lb"),
        F.when(F.col("label") == largest_label, F.lit(reach_largest))
        .otherwise(F.col("sz"))
        .cast("long")
        .alias("ub"),
    ).localCheckpoint(eager=True)
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        succ = (
            cedges.join(
                state.select(
                    F.col("label").alias("cdst"),
                    F.col("lb").alias("slb"),
                    F.col("ub").alias("sub"),
                ),
                "cdst",
            )
            .groupBy(F.col("csrc").alias("label"))
            .agg(F.max("slb").alias("mlb"), F.sum("sub").alias("msub"))
        )
        nstate = (
            sizes.join(succ, "label", "left")
            .select(
                "label",
                F.when(F.col("label") == largest_label, F.lit(reach_largest))
                .otherwise(
                    F.col("sz") + F.coalesce(F.col("mlb"), F.lit(0))
                )
                .cast("long")
                .alias("lb"),
                F.when(F.col("label") == largest_label, F.lit(reach_largest))
                .otherwise(
                    F.least(
                        F.lit(n_total).cast("long"),
                        F.col("sz") + F.coalesce(F.col("msub"), F.lit(0)),
                    )
                )
                .cast("long")
                .alias("ub"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nstate.alias("n")
            .join(state.alias("o"), "label")
            .filter(
                (F.col("n.lb") != F.col("o.lb"))
                | (F.col("n.ub") != F.col("o.ub"))
            )
            .isEmpty()
        )
        state = nstate
        if changed:
            break

    return labels.join(state, "label").select(
        "id",
        F.col("lb").alias("reachable_lb"),
        F.col("ub").alias("reachable_ub"),
    )
