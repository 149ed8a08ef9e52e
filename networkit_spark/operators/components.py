"""Connected components via iterative min-label propagation.

Reference semantics:
  - sequential BFS oracle: /root/reference/networkit/cpp/components/
    ConnectedComponentsImpl.cpp:24-70 — component ids ordered by the
    smallest node id in the component (BFS seeds scan ids ascending);
    undirected only, directed input throws (:14-17).
  - parallel min-label propagation: /root/reference/networkit/cpp/
    components/ParallelConnectedComponents.cpp:26-81 — every node starts
    with its own id as label, repeatedly adopts the minimum label in its
    closed neighborhood, with an active-node frontier; result compacted.
  - WeaklyConnectedComponents: identical template also following
    in-edges (WeaklyConnectedComponents.cpp:14-29).

Spark plan: labels(id, label) DataFrame; one superstep =
``frontier ⋈ adj`` push + ``groupBy(id).min(label)`` + ``least`` merge.
Only the frontier (nodes whose label changed last superstep) is joined
against the adjacency — the reference's active-set optimization
(ParallelConnectedComponents.cpp:32-62) — so late supersteps touch a
vanishing fraction of the edge table. Web graphs have small effective
diameter, so the superstep count stays low; labels converge to the
minimum node id per component, which makes the output deterministic and
directly comparable to the BFS oracle up to relabeling (we also offer
``compact=True`` for dense 0..k-1 ids ordered by min member id, matching
the sequential implementation's numbering exactly).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def _min_label_propagation(
    adj: DataFrame,
    nodes: DataFrame,
    ckpt: Checkpointer,
    resume: bool,
    shortcut: bool = True,
) -> tuple[DataFrame, SuperstepResult]:
    labels = nodes.select("id", F.col("id").alias("label"))
    start = 0
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            start, labels = latest
            if "new_label" in labels.columns:  # stored merged relation
                labels = labels.select("id", F.col("new_label").alias("label"))
    labels = ckpt.cut(labels, start) if start == 0 else labels
    frontier = labels  # all active in round 1 (allToSingletons, :26-27)

    from networkit_spark.plans.superstep import materialize_partitioned

    # loop-invariant adjacency: partitioned on the join key once, cached —
    # per superstep only the (shrinking) frontier shuffles
    adj = materialize_partitioned(adj.select("src", "dst"), "src")
    metrics: list[dict] = []
    it = start
    while True:
        t0 = time.time()
        pushed = (
            frontier.join(adj, frontier.id == adj.src)
            .select(F.col("dst").alias("id"), "label")
        )
        mins = pushed.groupBy("id").agg(F.min("label").alias("cand"))
        merged = (
            labels.join(mins, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        )
        if shortcut:
            # pointer-doubling: also adopt label(label), looked up in the
            # PREVIOUS materialized state (a cheap third scan of the
            # persisted RDD — never a duplicate of this superstep's
            # gather subplan). Cuts superstep count from O(diameter)
            # toward O(log diameter) on chains; fixpoint unchanged
            # (labels stay monotone-decreasing component minima).
            lookup = labels.select(
                F.col("id").alias("lid"), F.col("label").alias("llabel")
            )
            merged = (
                merged.join(lookup, merged.new_label == lookup.lid, "left")
                .select(
                    "id",
                    F.least(
                        F.col("new_label"), F.coalesce("llabel", F.col("new_label"))
                    ).alias("new_label"),
                    "label",
                )
            )
        it += 1
        # ONE action per superstep: checkpoint the merged (id, new, old)
        # relation; labels/frontier/changed are cheap views over it
        merged = ckpt.cut(merged, it)
        new_labels = merged.select("id", F.col("new_label").alias("label"))
        frontier = merged.filter(F.col("new_label") < F.col("label")).select(
            "id", F.col("new_label").alias("label")
        )
        changed = frontier.count()
        metrics.append(
            ckpt.log(it, state=new_labels, changed=changed, wall_sec=time.time() - t0)
        )
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
    return labels, SuperstepResult(iterations=it, metrics=metrics)


def compact_labels(labels: DataFrame) -> DataFrame:
    """Renumber labels to dense 0..k-1 ordered by label value —
    GenericPartition::compact(useTurbo) analogue
    (/root/reference/include/networkit/structures/GenericPartition.hpp:200).
    With min-id labels this reproduces the sequential BFS numbering
    (seeds scanned in ascending id order). Two-phase partitioned
    renumbering (plans/ids.py) — no single-partition global window, so
    compaction stays parallel when the label set is web-scale."""
    from networkit_spark.plans.ids import dense_ids

    ranks = dense_ids(labels.select("label").distinct(), ["label"], "compact")
    return labels.join(ranks, "label").select(
        "id", F.col("compact").alias("label")
    )


def connected_components(
    g: Graph,
    compact: bool = False,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
) -> tuple[DataFrame, SuperstepResult]:
    """Undirected connected components; raises on directed input exactly
    like the reference (ConnectedComponentsImpl.cpp:14-17) — use
    :func:`weakly_connected_components` for directed graphs."""
    if g.directed:
        raise ValueError(
            "connected_components does not support directed graphs; "
            "use weakly_connected_components"
        )
    ckpt = checkpointer or Checkpointer(g.edges.sparkSession)
    labels, info = _min_label_propagation(
        g.adj(), g.nodes().localCheckpoint(eager=True), ckpt, resume
    )
    if compact:
        labels = compact_labels(labels)
    return labels, info


def weakly_connected_components(
    g: Graph,
    compact: bool = False,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
) -> tuple[DataFrame, SuperstepResult]:
    """Directed graphs, edges treated as undirected
    (WeaklyConnectedComponents.cpp:14-29 follows both directions)."""
    adj = g.edges.select("src", "dst").unionByName(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ckpt = checkpointer or Checkpointer(g.edges.sparkSession)
    labels, info = _min_label_propagation(
        adj, g.nodes().localCheckpoint(eager=True), ckpt, resume
    )
    if compact:
        labels = compact_labels(labels)
    return labels, info


def number_of_components(labels: DataFrame) -> int:
    return labels.select("label").distinct().count()


def component_sizes(labels: DataFrame) -> DataFrame:
    """(label, size) — Partition::subsetSizeMap analogue."""
    return labels.groupBy("label").agg(F.count("*").alias("size"))


def extract_largest_connected_component(
    g: Graph, compact_graph: bool = False
) -> Graph:
    """ConnectedComponentsImpl.cpp:72-97: subgraph induced by the largest
    component; ``compact_graph`` renumbers to dense ids ordered by old id."""
    labels, _ = connected_components(g)
    top = (
        component_sizes(labels)
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(1)
        .select("label")
    )
    keep = labels.join(F.broadcast(top), "label").select("id")
    edges = (
        g.edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    vertices = keep
    if compact_graph:
        from networkit_spark.plans.ids import dense_ids

        remap = dense_ids(keep, ["id"], "new_id")
        edges = (
            edges.join(remap.withColumnRenamed("id", "src"), "src")
            .select(F.col("new_id").alias("src"), "dst", "weight")
            .join(remap.withColumnRenamed("id", "dst"), "dst")
            .select("src", F.col("new_id").alias("dst"), "weight")
        )
        vertices = remap.select(F.col("new_id").alias("id"))
    return Graph(
        edges=edges, vertices=vertices, directed=g.directed, weighted=g.weighted
    )


def biconnected_components(g: Graph) -> tuple[DataFrame, dict[int, int]]:
    """BiconnectedComponents (/root/reference/networkit/cpp/components/
    BiconnectedComponents.cpp:34-123): Hopcroft-Tarjan DFS lowpoint
    partition of the EDGES into maximal biconnected subgraphs; a node
    belongs to every component one of its edges belongs to
    (componentsOfNode). Directed graphs are rejected like the reference.

    Driver-side by design, like ``lp_degree_ordered``: the algorithm is
    defined by its sequential DFS edge stack (the reference is
    single-threaded too); distributed biconnectivity (Tarjan-Vishkin)
    is out of scope. Determinism fixes over the reference's unspecified
    iteration order: roots ascend by id, neighbor scans ascend by id,
    and component ids are renumbered by their minimum member node
    (ties: second-smallest member).

    Returns (membership(id, component) DataFrame, {component: size}).
    """
    if g.directed:
        raise RuntimeError(
            "Error, biconnected components cannot be computed on directed graphs."
        )
    spark = g.edges.sparkSession
    neigh: dict[int, list[int]] = {}
    for r in g.adj().select("src", "dst").filter(F.col("src") != F.col("dst")).distinct().collect():
        neigh.setdefault(int(r["src"]), []).append(int(r["dst"]))
    node_ids = sorted(int(r["id"]) for r in g.nodes().collect())
    for v in node_ids:
        neigh.setdefault(v, []).sort()

    level: dict[int, int] = {}
    lowpt: dict[int, int] = {}
    parent: dict[int, int] = {}
    comp_nodes: list[set[int]] = []
    idx = 0
    for root in node_ids:
        if root in level:
            continue
        # iterative DFS: stack of (node, next-neighbor-cursor)
        stack = [(root, 0)]
        edge_stack: list[tuple[int, int]] = []
        level[root] = lowpt[root] = idx
        idx += 1
        while stack:
            u, cursor = stack[-1]
            advanced = False
            nbrs = neigh[u]
            while cursor < len(nbrs):
                w = nbrs[cursor]
                cursor += 1
                if w not in level:
                    level[w] = lowpt[w] = idx
                    idx += 1
                    parent[w] = u
                    edge_stack.append((u, w))
                    stack[-1] = (u, cursor)
                    stack.append((w, 0))
                    advanced = True
                    break
                elif w != parent.get(u) and level[w] < level[u]:
                    edge_stack.append((u, w))
                    lowpt[u] = min(lowpt[u], level[w])
            if advanced:
                continue
            stack[-1] = (u, cursor)
            stack.pop()
            if u == root:
                continue
            v = parent[u]
            lowpt[v] = min(lowpt[v], lowpt[u])
            if lowpt[u] >= level[v]:
                members: set[int] = set()
                while edge_stack and level[edge_stack[-1][0]] >= level[u]:
                    a, b = edge_stack.pop()
                    members.update((a, b))
                for i in range(len(edge_stack) - 1, -1, -1):
                    if edge_stack[i] == (v, u):
                        members.update(edge_stack.pop(i))
                        break
                members.update((v, u))  # the (v, u) tree edge's endpoints
                comp_nodes.append(members)
    order = sorted(range(len(comp_nodes)), key=lambda i: sorted(comp_nodes[i]))
    rows = [
        (v, c) for c, i in enumerate(order) for v in sorted(comp_nodes[i])
    ]
    sizes = {c: len(comp_nodes[i]) for c, i in enumerate(order)}
    membership = spark.createDataFrame(rows, "id long, component long")
    return membership, sizes
