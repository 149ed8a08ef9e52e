"""PLP — community detection by label propagation (synchronous).

Reference: /root/reference/networkit/cpp/community/PLP.cpp:22-130
(signature include/networkit/community/PLP.hpp:42-52). Semantics kept:

  - init: singleton labels, or a supplied base clustering (PLP.cpp:28-32);
  - update threshold theta defaults to ``n / 1e5`` (integer floor,
    PLP.cpp:38-40); loop while ``nUpdated > theta`` and
    ``nIterations < maxIterations`` (PLP.cpp:67);
  - a node adopts the label with the largest total incident edge WEIGHT
    among its neighbors (``labelWeights[label(w)] += w(v,w)``,
    PLP.cpp:83-86); ties break to the SMALLEST label id — the reference
    takes ``std::max_element`` over an ordered ``std::map``, which
    returns the first (= smallest-key) maximal entry (PLP.cpp:89-94);
  - isolated (degree-0) nodes are skipped and keep their singleton label
    (PLP.cpp:76);
  - active-set: a changed node re-activates its neighbors; an unchanged
    node deactivates itself (PLP.cpp:96-103).

The one deliberate divergence: the reference updates labels
ASYNCHRONOUSLY in parallel (balancedParallelForNodes, PLP.cpp:75), so
its exact output is thread-schedule-dependent and the reference's own
tests assert properties, not labels (CommunityGTest.cpp:57-73,202-237).
Our superstep is SYNCHRONOUS (all nodes read the previous generation),
which makes the output deterministic; the same property fixtures
validate it. Known sync-LP risk — 2-cycle label oscillation on
bipartite-ish structures — is bounded by ``max_iterations``.

Spark plan per superstep: ``adj ⋈ labels on neighbor`` →
``groupBy(node, label).sum(weight)`` (partial agg = the reference's
per-node labelWeights map) → ``groupBy(node).max(struct(w, -label))``
hash-agg argmax with the exact weight-desc / label-asc tie-break (no
window, no per-superstep shuffle-sort).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def plp_superstep(adj: DataFrame, labels: DataFrame, active: DataFrame | None) -> DataFrame:
    """One synchronous label-propagation generation.

    Returns (id, label, new_label) for ALL nodes (new_label = argmax
    neighbor label, or the old label for inactive/isolated nodes).
    """
    edges = adj
    if active is not None:
        edges = edges.join(active, edges.src == active.id, "left_semi")
    neigh = (
        edges.join(labels, edges.dst == labels.id)
        .select(edges.src.alias("nid"), labels.label.alias("nlabel"), edges.weight)
    )
    wsum = neigh.groupBy("nid", "nlabel").agg(F.sum("weight").alias("w"))
    # argmax-with-smallest-label tie-break as ONE hash aggregation:
    # max(struct(w, -label)) picks the largest weight, then (because the
    # struct comparison falls through to the negated label) the SMALLEST
    # label — the exact PLP.cpp:89-94 tie-break, with no row_number
    # window (a window = shuffle + per-partition sort every superstep,
    # and hub partitions become sort hotspots)
    best = (
        wsum.groupBy("nid")
        .agg(
            F.max(
                F.struct(F.col("w").alias("w"), (-F.col("nlabel")).alias("neg"))
            ).alias("m")
        )
        .select(F.col("nid").alias("id"), (-F.col("m.neg")).alias("best"))
    )
    return labels.join(best, "id", "left").select(
        "id", "label", F.coalesce("best", F.col("label")).alias("new_label")
    )


def plp(
    g: Graph,
    theta: int | None = None,
    max_iterations: int | None = None,
    base_clustering: DataFrame | None = None,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
) -> tuple[DataFrame, SuperstepResult]:
    """Returns (labels(id, label), info)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    if theta is None:
        theta = int(n / 1e5)  # PLP.cpp:38-40
    max_it = max_iterations if max_iterations is not None else 2**31

    from networkit_spark.plans.superstep import materialize_partitioned

    # partition the loop-invariant adjacency on dst — the heavy per-
    # superstep join is `adj ⋈ labels on adj.dst = labels.id`; the active
    # semi-join on src broadcasts (the frontier shrinks fast)
    adj = materialize_partitioned(g.adj(), "dst")
    labels = (
        base_clustering.select("id", "label")
        if base_clustering is not None
        else nodes.select("id", F.col("id").alias("label"))
    )
    start = 0
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            start, labels = latest
            if "new_label" in labels.columns:  # stored merged relation
                labels = labels.select("id", F.col("new_label").alias("label"))
    labels = ckpt.cut(labels, start) if start == 0 else labels

    active: DataFrame | None = None  # None = all nodes active
    metrics: list[dict] = []
    it = start
    while it < max_it:
        t0 = time.time()
        merged = plp_superstep(adj, labels, active)
        it += 1
        # one action per superstep: checkpoint (id, label, new_label);
        # labels / changed are cheap views over the materialized state
        merged = ckpt.cut(merged, it)
        new_labels = merged.select("id", F.col("new_label").alias("label"))
        changed = merged.filter(F.col("new_label") != F.col("label")).select("id")
        n_updated = changed.count()
        metrics.append(
            ckpt.log(it, state=new_labels, updated=n_updated, wall_sec=time.time() - t0)
        )
        labels = new_labels
        if n_updated <= theta:
            break
        # re-activate changed nodes and their neighbors (PLP.cpp:96-103)
        active = (
            changed.join(adj, changed.id == adj.src)
            .select(F.col("dst").alias("id"))
            .unionByName(changed)
            .distinct()
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return labels, SuperstepResult(iterations=it, metrics=metrics)


def is_proper_clustering(g: Graph, labels: DataFrame) -> bool:
    """GraphClusteringTools.isProperClustering: every node has exactly one
    label (networkit/community.pyx:238)."""
    n = g.nodes().count()
    assigned = labels.select("id").distinct().count()
    total = labels.count()
    return n == assigned == total


def number_of_clusters(labels: DataFrame) -> int:
    return labels.select("label").distinct().count()


def is_singleton_clustering(g: Graph, labels: DataFrame) -> bool:
    """GraphClusteringTools.isSingletonClustering: every cluster has
    exactly one member (networkit/community.pyx)."""
    n = labels.count()
    return labels.select("label").distinct().count() == n


def is_one_clustering(g: Graph, labels: DataFrame) -> bool:
    """GraphClusteringTools.isOneClustering: a single cluster."""
    return labels.select("label").distinct().count() == 1


def equal_clusterings(a: DataFrame, b: DataFrame) -> bool:
    """GraphClusteringTools.equalClustering: same partition up to label
    renaming — the (label_a, label_b) co-occurrence relation must be a
    bijection."""
    j = a.select("id", F.col("label").alias("la")).join(
        b.select("id", F.col("label").alias("lb")), "id"
    )
    pairs = j.select("la", "lb").distinct().count()
    return (
        pairs == j.select("la").distinct().count()
        == j.select("lb").distinct().count()
    )


def lp_degree_ordered(g: Graph, theta: int | None = None) -> tuple[dict, int]:
    """LPDegreeOrdered (/root/reference/networkit/cpp/community/
    LPDegreeOrdered.cpp:18-86): sequential label propagation visiting
    nodes in ascending degree order with IMMEDIATE (asynchronous)
    updates and an active set; loop while nUpdated > theta = n/1e5.

    Driver-side by design — the algorithm is defined by its sequential
    visit order (the reference runs it single-threaded too); it exists
    here as a second, order-faithful community oracle for fixture-scale
    validation of the distributed PLP/PLM. Two determinism fixes over
    the reference (whose sort and max_element tie-breaks are
    unspecified): ties sort by (degree, id) and break to the smallest
    label. Returns (labels dict, iterations)."""
    rows = g.adj().select("src", "dst").collect()
    neigh: dict[int, list[int]] = {}
    for r in rows:
        neigh.setdefault(r["src"], []).append(r["dst"])
    node_ids = sorted({r["id"] for r in g.nodes().collect()})
    n = len(node_ids)
    if theta is None:
        theta = int(n / 1e5)
    labels = {v: v for v in node_ids}
    active = {v: True for v in node_ids}
    order = sorted(node_ids, key=lambda v: (len(neigh.get(v, [])), v))
    iterations = 0
    updated = n
    while updated > theta:
        updated = 0
        for v in order:
            nbrs = neigh.get(v)
            if not nbrs or not active[v]:
                continue
            counts: dict[int, int] = {}
            for w in nbrs:
                counts[labels[w]] = counts.get(labels[w], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if labels[v] != best:
                labels[v] = best
                updated += 1
                for w in nbrs:
                    active[w] = True
            else:
                active[v] = False
        iterations += 1
    return labels, iterations
