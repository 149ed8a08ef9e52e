"""Strongly connected components — distributed forward-backward min-reach.

Reference: /root/reference/networkit/cpp/components/
StronglyConnectedComponents.cpp:26-41+ (iterative Tarjan — a sequential
DFS that fundamentally does not distribute). The Spark-native algorithm
is the FW-BW-MIN peel (the label-propagation form of the classic
forward-backward SCC decomposition, cf. Fleischer-Hendrickson-Pinar
FW-BW and the coloring variants used by parallel SCC work):

  round:
    trim:   nodes with no live out-edge or no live in-edge are singleton
            SCCs — peeled in bulk (kills tendrils/chains cheaply);
    fwd[v]: min id u in the unsettled subgraph with u ->* v (min-label
            propagation along edges, self included);
    bwd[v]: min id reachable FROM v (same propagation along reversed
            edges);
    settle every v with fwd[v] == bwd[v] == p: p reaches v and v reaches
    p, so v is in SCC(p); p is the minimum id of that SCC (every member
    reaches v so is >= fwd[v] = p, and p is itself a member). Remove
    settled nodes, repeat.

Each round settles at least the SCC of the minimum unsettled id, so the
peel terminates; on web-shaped (bowtie) graphs a handful of rounds
settles everything — the giant SCC falls in round 1 and the trim eats
the tendrils. Labels are the minimum member id per SCC (deterministic,
same canonical form as the undirected CC operator).

The inner propagation reuses the CC engine's frontier + pointer-doubling
min-label fixpoint (components._min_label_propagation): pointer doubling
stays valid for directed reachability because "u reaches v" composes.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import _min_label_propagation
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def _min_reach(edges: DataFrame, nodes: DataFrame, spark) -> DataFrame:
    """min id reaching each node along ``edges`` (self included),
    eagerly materialized; all intermediate state released."""
    ckpt = Checkpointer(spark)
    labels, _ = _min_label_propagation(edges, nodes, ckpt, resume=False)
    out = labels.localCheckpoint(eager=True)
    ckpt.release()
    return out


def strongly_connected_components(
    g: Graph,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 256,
) -> tuple[DataFrame, SuperstepResult]:
    """(labels(id, label), info) — label = min node id in the SCC.
    Requires a directed graph (undirected SCC == connected components)."""
    if not g.directed:
        raise ValueError(
            "strongly_connected_components requires a directed graph; "
            "use connected_components for undirected graphs"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    remaining = g.nodes().localCheckpoint(eager=True)
    settled: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0

    while rounds < max_rounds and not remaining.isEmpty():
        t0 = time.time()
        rounds += 1
        live = (
            edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        # trim: no live out-edge or no live in-edge -> singleton SCC
        has_out = live.select(F.col("src").alias("id")).distinct()
        has_in = live.select(F.col("dst").alias("id")).distinct()
        core = (
            remaining.join(has_out, "id", "left_semi")
            .join(has_in, "id", "left_semi")
            .localCheckpoint(eager=True)
        )
        trimmed = remaining.join(core, "id", "left_anti").select(
            "id", F.col("id").alias("label")
        )
        new_settled = trimmed
        if not core.isEmpty():
            live_core = (
                live.join(core.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(core.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            rev = live_core.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            fwd = _min_reach(live_core, core, spark)
            bwd = _min_reach(rev, core, spark)
            scc_now = (
                fwd.join(bwd.withColumnRenamed("label", "blabel"), "id")
                .filter(F.col("label") == F.col("blabel"))
                .select("id", "label")
            )
            new_settled = new_settled.unionByName(scc_now)
        new_settled = new_settled.localCheckpoint(eager=True)
        settled = (
            new_settled
            if settled is None
            else settled.unionByName(new_settled).localCheckpoint(eager=True)
        )
        remaining = remaining.join(new_settled, "id", "left_anti").localCheckpoint(
            eager=True
        )
        metrics.append(
            ckpt.log(
                rounds,
                state=settled,
                settled=new_settled.count(),
                wall_sec=time.time() - t0,
            )
        )
    if settled is None:
        settled = g.nodes().select("id", F.col("id").alias("label"))
    return settled, SuperstepResult(iterations=rounds, metrics=metrics)


def number_of_scc(labels: DataFrame) -> int:
    return labels.select("label").distinct().count()
