"""Dynamic graph updates — the reference's GraphEvent model on Spark.

Reference: GraphEvent{NODE_ADDITION, NODE_REMOVAL, NODE_RESTORATION,
EDGE_ADDITION, EDGE_REMOVAL, EDGE_WEIGHT_UPDATE, EDGE_WEIGHT_INCREMENT,
TIME_STEP} (/root/reference/include/networkit/dynamics/GraphEvent.hpp:21-30),
consumed by Dyn* algorithms via update/updateBatch (batch-incremental,
no watermarks — e.g. networkit/cpp/components/DynConnectedComponents.cpp).

Spark counterparts:
  - :func:`apply_events` — pure batch-delta application to the edge
    DataFrame (the updateBatch analogue).
  - :class:`DynConnectedComponents` — incremental repair: edge additions
    merge labels cheaply (no full re-run unless removals force it);
    mirrors the reference's "apply delta then repair" contract, not its
    internal data structures.
  - :func:`stream_components` — Structured Streaming driver:
    ``foreachBatch`` applies each micro-batch of events and republishes
    labels; exactly-once via checkpointLocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components

EVENT_TYPES = (
    "NODE_ADDITION",
    "NODE_REMOVAL",
    "NODE_RESTORATION",
    "EDGE_ADDITION",
    "EDGE_REMOVAL",
    "EDGE_WEIGHT_UPDATE",
    "EDGE_WEIGHT_INCREMENT",
    "TIME_STEP",
)


def apply_events(g: Graph, events: DataFrame) -> Graph:
    """Apply a batch of GraphEvents (type, u, v, w) to the graph.

    Set semantics per type follow GraphEvent.hpp:21-30; order within a
    batch is collapsed set-wise (additions then removals then weight
    updates), which matches updateBatch for non-conflicting batches.
    """
    e = g.edges
    ev = events
    if not g.directed:
        ev = ev.withColumn("_u", F.least("u", "v")).withColumn(
            "_v", F.greatest("u", "v")
        )
    else:
        ev = ev.withColumn("_u", F.col("u")).withColumn("_v", F.col("v"))

    adds = ev.filter(F.col("type") == "EDGE_ADDITION").select(
        F.col("_u").alias("src"), F.col("_v").alias("dst"),
        F.coalesce("w", F.lit(1.0)).alias("weight"),
    )
    removes = ev.filter(F.col("type") == "EDGE_REMOVAL").select(
        F.col("_u").alias("src"), F.col("_v").alias("dst")
    )
    updates = ev.filter(F.col("type") == "EDGE_WEIGHT_UPDATE").select(
        F.col("_u").alias("src"), F.col("_v").alias("dst"), F.col("w").alias("new_w")
    )
    increments = ev.filter(F.col("type") == "EDGE_WEIGHT_INCREMENT").select(
        F.col("_u").alias("src"), F.col("_v").alias("dst"), F.col("w").alias("inc_w")
    )

    e = e.unionByName(adds).dropDuplicates(["src", "dst"])
    e = e.join(removes, ["src", "dst"], "left_anti")
    e = (
        e.join(updates, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("new_w", F.col("weight")).alias("weight"))
    )
    e = (
        e.join(increments, ["src", "dst"], "left")
        .select(
            "src", "dst",
            (F.col("weight") + F.coalesce("inc_w", F.lit(0.0))).alias("weight"),
        )
    )

    v = g.vertices
    node_adds = ev.filter(
        F.col("type").isin("NODE_ADDITION", "NODE_RESTORATION")
    ).select(F.col("u").alias("id"))
    node_removes = ev.filter(F.col("type") == "NODE_REMOVAL").select(
        F.col("u").alias("id")
    )
    if v is not None:
        v = v.unionByName(node_adds).distinct().join(node_removes, "id", "left_anti")
        # removing a node removes its incident edges
    e = e.join(node_removes.withColumnRenamed("id", "src"), "src", "left_anti")
    e = e.join(node_removes.withColumnRenamed("id", "dst"), "dst", "left_anti")
    return Graph(e, v, g.directed, g.weighted)


class DynConnectedComponents:
    """Batch-incremental CC: additions repair labels without a full
    re-run (merge the two endpoint components via a tiny label-remap
    join); removals trigger a full recompute, as component splits can't
    be repaired monotonically (the reference walks BFS instead,
    DynConnectedComponents.cpp — equivalent output)."""

    def __init__(self, g: Graph) -> None:
        self.g = g
        self.labels = self._recompute()

    def _recompute(self) -> DataFrame:
        labels, _ = connected_components(self.g)
        return labels.localCheckpoint(eager=True)

    def update_batch(self, events: DataFrame) -> DataFrame:
        has_structural_removal = (
            events.filter(
                F.col("type").isin("EDGE_REMOVAL", "NODE_REMOVAL")
            ).limit(1).count()
            > 0
        )
        self.g = apply_events(self.g, events)
        if has_structural_removal:
            self.labels = self._recompute()
            return self.labels
        # additions only: merge endpoint labels until fixpoint over the
        # (tiny) label-merge graph, driver-side loop on a labels-only DF
        adds = events.filter(F.col("type") == "EDGE_ADDITION").select("u", "v")
        new_nodes = (
            adds.select(F.col("u").alias("id"))
            .unionByName(adds.select(F.col("v").alias("id")))
            .distinct()
            .join(self.labels.select("id"), "id", "left_anti")
            .select("id", F.col("id").alias("label"))
        )
        labels = self.labels.unionByName(new_nodes)
        merges = (
            adds.join(labels.withColumnRenamed("id", "u")
                      .withColumnRenamed("label", "lu"), "u")
            .join(labels.withColumnRenamed("id", "v")
                  .withColumnRenamed("label", "lv"), "v")
            .select(
                F.greatest("lu", "lv").alias("from_label"),
                F.least("lu", "lv").alias("to_label"),
            )
            .filter(F.col("from_label") != F.col("to_label"))
            .distinct()
        )
        # contract the merge pairs to their transitive minimum (tiny set
        # -> a driver-side union-find is appropriate and exact)
        pairs = [(r["from_label"], r["to_label"]) for r in merges.collect()]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        remap = [(x, find(x)) for x in set(parent)]
        if remap:
            spark = labels.sparkSession
            remap_df = spark.createDataFrame(remap, "label long, new_label long")
            labels = (
                labels.join(F.broadcast(remap_df), "label", "left")
                .select("id", F.coalesce("new_label", F.col("label")).alias("label"))
            )
        self.labels = labels.localCheckpoint(eager=True)
        return self.labels


class DynWeaklyConnectedComponents(DynConnectedComponents):
    """Batch-incremental WEAKLY connected components for directed graphs
    — the reference's DynWeaklyConnectedComponents
    (/root/reference/networkit/cpp/components/
    DynWeaklyConnectedComponents.cpp), which is the DynCC template also
    following in-edges. The addition path is identical (merging two
    weak components is direction-agnostic — a directed edge joins the
    endpoint components either way); removals recompute via
    weakly_connected_components."""

    def _recompute(self) -> DataFrame:
        from networkit_spark.operators.components import (
            weakly_connected_components,
        )

        labels, _ = weakly_connected_components(self.g)
        return labels.localCheckpoint(eager=True)


def stream_components(spark, events_stream: DataFrame, g0: Graph, out_path: str,
                      checkpoint_path: str):
    """Structured Streaming driver: micro-batches of GraphEvents repair
    the component labels and append a snapshot per batch.

    Returns the StreamingQuery (caller: processAllAvailable()/stop()).
    """
    dyn = DynConnectedComponents(g0)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        labels = dyn.update_batch(batch_df)
        (
            labels.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append").parquet(out_path)
        )

    return (
        events_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def graph_difference(g1: Graph, g2: Graph) -> DataFrame:
    """Edit script turning ``g1`` into ``g2`` — the reference's
    GraphDifference (/root/reference/networkit/cpp/dynamics/
    GraphDifference.cpp:18-120): edge removals first, then node events,
    then edge additions / weight updates (:31-33, :115-119); a G2-only
    node inside G1's id bound is a NODE_RESTORATION, beyond it a
    NODE_ADDITION (:43-59); a common edge with a different weight is an
    EDGE_WEIGHT_UPDATE carrying G2's weight (:83-86).

    Returns (cls, type, u, v, w) where ``cls`` is the reference's emit
    class (0 = edge removals, 1 = node events, 2 = edge additions +
    weight updates); the deterministic total order is (cls, u, v).
    Documented deviations: within a class the reference emits in node-
    scan x neighbor-insertion order (storage-dependent) — here (u, v)
    ascending; the reference's add-then-remove id-bound padding
    (:48-53) is an artifact of its dense id allocator and has no
    analogue for explicit-id DataFrame graphs.

    Spark plan: four anti-/outer-joins on the canonical edge sets and
    one on the node sets — no windows, no collects beyond the single
    max-id scalar.
    """
    if g1.directed != g2.directed:
        raise ValueError(
            "either both or none of the graphs must be directed"
        )
    if g1.weighted != g2.weighted:
        raise ValueError(
            "either both or none of the graphs must be weighted"
        )

    def canon(g: Graph) -> DataFrame:
        e = g.edges.select("src", "dst", "weight")
        if not g.directed:
            e = e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
        return e.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))

    e1, e2 = canon(g1), canon(g2)
    n1, n2 = g1.nodes(), g2.nodes()
    bound1 = n1.agg(F.max("id").alias("m")).collect()[0]["m"]
    bound1 = -1 if bound1 is None else int(bound1)

    edge_removals = (
        e1.join(e2.select("src", "dst"), ["src", "dst"], "left_anti")
        .select(
            F.lit(0).alias("cls"), F.lit("EDGE_REMOVAL").alias("type"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.lit(None).cast("double").alias("w"),
        )
    )
    node_removals = n1.join(n2, "id", "left_anti").select(
        F.lit(1).alias("cls"), F.lit("NODE_REMOVAL").alias("type"),
        F.col("id").alias("u"), F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    node_adds = n2.join(n1, "id", "left_anti").select(
        F.lit(1).alias("cls"),
        F.when(F.col("id") <= bound1, F.lit("NODE_RESTORATION"))
        .otherwise(F.lit("NODE_ADDITION"))
        .alias("type"),
        F.col("id").alias("u"), F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    weight_updates = (
        e1.select("src", "dst", F.col("weight").alias("w1"))
        .join(e2.select("src", "dst", F.col("weight").alias("w2")),
              ["src", "dst"])
        .filter(F.col("w1") != F.col("w2"))
        .select(
            F.lit(2).alias("cls"),
            F.lit("EDGE_WEIGHT_UPDATE").alias("type"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.col("w2").alias("w"),
        )
    )
    if not (g1.weighted and g2.weighted):
        weight_updates = weight_updates.limit(0)
    edge_adds = (
        e2.join(e1.select("src", "dst"), ["src", "dst"], "left_anti")
        .select(
            F.lit(2).alias("cls"), F.lit("EDGE_ADDITION").alias("type"),
            F.col("src").alias("u"), F.col("dst").alias("v"),
            F.col("weight").alias("w"),
        )
    )
    return (
        edge_removals.unionByName(node_removals)
        .unionByName(node_adds)
        .unionByName(weight_updates)
        .unionByName(edge_adds)
    )


class GraphUpdater:
    """GraphUpdater (/root/reference/networkit/cpp/dynamics/
    GraphUpdater.cpp:15-62): apply event batches to a graph and record
    the (n, m) size timeline after each batch.

    The reference applies events one at a time inside update() and
    records size once per call; the Spark analogue applies each CALL's
    batch set-wise via :func:`apply_events` (same end state for
    non-conflicting batches, the documented apply_events contract) and
    appends one (n, m) pair per call — the same timeline the reference
    records.  Counts are two scalar aggregations; nothing else is
    collected."""

    def __init__(self, g: Graph) -> None:
        self.graph = g
        self._timeline: list[tuple[int, int]] = []

    def update(self, events: DataFrame) -> Graph:
        self.graph = apply_events(self.graph, events)
        # one pass: count nodes and edges of the updated graph
        self.graph.edges = self.graph.edges.localCheckpoint(eager=True)
        self._timeline.append(
            (self.graph.number_of_nodes(), self.graph.number_of_edges())
        )
        return self.graph

    def size_timeline(self) -> list[tuple[int, int]]:
        """getSizeTimeline (GraphUpdater.cpp:60-62)."""
        return list(self._timeline)
