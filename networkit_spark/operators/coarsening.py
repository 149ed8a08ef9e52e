"""Partition coarsening + clustering quality measures.

Reference:
  - ParallelPartitionCoarsening: /root/reference/networkit/cpp/coarsening/
    ParallelPartitionCoarsening.cpp:19-44+ — quotient graph: compact the
    partition's subset ids, sum parallel edge weights, intra-cluster
    edges become self-loops; returns fine->coarse mapping.
  - Modularity: /root/reference/networkit/cpp/community/Modularity.cpp:23-60+
    — Q = coverage - expected coverage = (intra-weight / total) -
    sum(cluster volume^2) / (2m)^2, volumes counting self-loops twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def coarsen(
    g: Graph, labels: DataFrame, compact: bool = False
) -> tuple[Graph, DataFrame]:
    """Quotient graph over an (id, label) partition.

    Returns (coarse graph, fine->coarse mapping (id, coarse_id)).

    ``compact=False`` (default, the scale path): the label VALUE itself
    is the coarse node id — labels are already valid longs (kernel
    partitions carry min-member-node-id labels), the quotient semantics
    (summed parallel weights, intra-cluster self-loops) don't care
    whether the id space is dense, and PLM runs coarsen once per level,
    so a dense renumbering here would put every level's full label set
    through a global sort for nothing. ``compact=True`` matches the
    reference's Partition::compact dense 0..k-1 numbering ordered by
    label (GenericPartition.hpp:200) via the partitioned two-phase
    renumbering in plans/ids.py (no single-partition window either way).
    """
    if compact:
        from networkit_spark.plans.ids import dense_ids

        compacted = dense_ids(
            labels.select("label").distinct(), ["label"], "coarse_id"
        )
        mapping = labels.join(compacted, "label").select("id", "coarse_id")
        coarse_vertices = compacted.select(F.col("coarse_id").alias("id"))
    else:
        mapping = labels.select("id", F.col("label").alias("coarse_id"))
        coarse_vertices = labels.select(
            F.col("label").alias("id")
        ).distinct()
    e = (
        g.edges.join(
            mapping.select(F.col("id").alias("src"), F.col("coarse_id").alias("csrc")),
            "src",
        )
        .join(
            mapping.select(F.col("id").alias("dst"), F.col("coarse_id").alias("cdst")),
            "dst",
        )
    )
    if not g.directed:
        # canonicalize so (a,b) and (b,a) coarse edges merge
        e = e.select(
            F.least("csrc", "cdst").alias("csrc"),
            F.greatest("csrc", "cdst").alias("cdst"),
            "weight",
        )
    coarse_edges = (
        e.groupBy("csrc", "cdst")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"), "weight")
    )
    return (
        Graph(coarse_edges, coarse_vertices, g.directed, True),
        mapping,
    )


def modularity(g: Graph, labels: DataFrame) -> float:
    """Modularity.cpp:23-60: Q = intra/total - sum(vol_c^2)/(2m)^2.

    total edge weight counts self-loops once in "2m" denominators? The
    reference uses totalEdgeWeight = sum of stored edge weights (loops
    once) and volume(c) = sum of weighted degrees + self-loop weights
    (loops twice). We mirror that.
    """
    loops = g.edges.filter(F.col("src") == F.col("dst"))
    total = g.total_edge_weight()
    if total == 0:
        return 0.0

    lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lsrc"))
    lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("ldst"))
    e = g.edges.join(lab_src, "src").join(lab_dst, "dst")
    intra = float(
        e.filter(F.col("lsrc") == F.col("ldst"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)))
        .collect()[0][0]
    )
    coverage = intra / total

    # volume per cluster: weighted degree with self-loops twice
    deg = (
        g.adj()
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    loop_w = (
        loops.groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("lw"))
    )
    vol = (
        labels.join(deg, "id", "left")
        .join(loop_w, "id", "left")
        .groupBy("label")
        .agg(
            F.sum(
                F.coalesce("wdeg", F.lit(0.0)) + F.coalesce("lw", F.lit(0.0))
            ).alias("vol")
        )
    )
    sum_vol_sq = float(
        vol.agg(F.sum(F.col("vol") * F.col("vol"))).collect()[0][0] or 0.0
    )
    expected = sum_vol_sq / (4.0 * total * total)
    return coverage - expected


def coverage(g: Graph, labels: DataFrame) -> float:
    """Coverage (/root/reference/networkit/cpp/community/Coverage.cpp:13-60):
    fraction of total edge weight internal to clusters —
    sum over same-label stored edges of w(e) / totalEdgeWeight. Raises
    on edgeless graphs like the reference."""
    total = g.total_edge_weight()
    if total == 0:
        raise ValueError(
            "Coverage is undefined for graphs without edges (including self-loops)."
        )
    lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lsrc"))
    lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("ldst"))
    intra = float(
        g.edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .filter(F.col("lsrc") == F.col("ldst"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)))
        .collect()[0][0]
    )
    return intra / total


def project_back(
    fine_to_coarse: DataFrame, coarse_labels: DataFrame
) -> DataFrame:
    """ClusteringProjector::projectBack (/root/reference/networkit/cpp/
    coarsening/ClusteringProjector.cpp:13-26): zetaFine[v] =
    zetaCoarse[fineToCoarse[v]] — one broadcast-ready equi-join.

    ``fine_to_coarse``: (id, coarse_id) as returned by :func:`coarsen`;
    ``coarse_labels``: (id, label) over the coarse graph's ids.
    Returns (id, label) over the fine ids.
    """
    return (
        fine_to_coarse.join(
            coarse_labels.select(
                F.col("id").alias("coarse_id"), "label"
            ),
            "coarse_id",
        )
        .select("id", "label")
    )


def project_back_to_finest(
    coarse_labels: DataFrame, maps: list[DataFrame]
) -> DataFrame:
    """ClusteringProjector::projectBackToFinest (ClusteringProjector.cpp:
    28-58): compose the per-level fine->coarse maps finest-first, then
    read the coarse partition through the composition.  ``maps`` is the
    list of (id, coarse_id) mappings level by level (finest level
    first), exactly what repeated :func:`coarsen` calls produce.

    Spark plan: a chain of |maps| equi-joins — each level's map relation
    is usually far smaller than the finest node set, so Catalyst
    broadcasts the shrinking side; no collects.
    """
    if not maps:
        return coarse_labels
    acc = maps[0].select("id", F.col("coarse_id").alias("super"))
    for m in maps[1:]:
        acc = (
            acc.join(
                m.select(
                    F.col("id").alias("super"),
                    F.col("coarse_id").alias("nsuper"),
                ),
                "super",
            )
            .select("id", F.col("nsuper").alias("super"))
        )
    return (
        acc.join(
            coarse_labels.select(F.col("id").alias("super"), "label"),
            "super",
        )
        .select("id", "label")
    )


def project_coarse_graph_to_finest_clustering(
    maps: list[DataFrame],
) -> DataFrame:
    """ClusteringProjector::projectCoarseGraphToFinestClustering
    (ClusteringProjector.cpp:60-84): each finest node's cluster id is
    its coarsest supernode id — the composed map itself, with
    label = coarse_id."""
    if not maps:
        raise ValueError("need at least one fine->coarse map")
    acc = maps[0].select("id", F.col("coarse_id").alias("super"))
    for m in maps[1:]:
        acc = (
            acc.join(
                m.select(
                    F.col("id").alias("super"),
                    F.col("coarse_id").alias("nsuper"),
                ),
                "super",
            )
            .select("id", F.col("nsuper").alias("super"))
        )
    return acc.select("id", F.col("super").alias("label"))


def matching_coarsening(
    g: Graph, matching: DataFrame, no_self_loops: bool = False
) -> tuple[Graph, DataFrame]:
    """Contract a matching: (coarse graph, fine->coarse (id, coarse_id)).

    Reference: /root/reference/networkit/cpp/coarsening/
    MatchingCoarsening.cpp:17-56 — undirected only; the coarse id space
    is consecutive in fine-node order, one id per unmatched node or
    lower matched endpoint (the higher endpoint inherits its mate's
    id); each fine edge contributes its weight once, parallel coarse
    edges sum (increaseWeight), intra-pair edges become self-loops
    unless ``no_self_loops``.

    Spark shape: representatives rank through the partitioned two-phase
    renumbering (plans/ids.dense_ids — no single-partition window);
    the contraction itself is two mapping joins + one hash aggregation
    over the edge list.
    """
    if g.directed:
        raise ValueError("Only defined for undirected graphs.")
    from networkit_spark.plans.ids import dense_ids

    pairs = matching.select(
        F.least("src", "dst").alias("lo"),
        F.greatest("src", "dst").alias("hi"),
    )
    nodes = g.nodes()
    reps = nodes.join(
        pairs.select(F.col("hi").alias("id")), "id", "left_anti"
    )
    ranked = dense_ids(reps, ["id"], "coarse_id")
    mapping = ranked.select("id", "coarse_id").unionByName(
        pairs.join(
            ranked.select(F.col("id").alias("lo"), "coarse_id"), "lo"
        ).select(F.col("hi").alias("id"), "coarse_id")
    )
    wcol = (F.col("weight") if g.weighted else F.lit(1.0)).cast("double")
    ce = (
        g.edges.select("src", "dst", wcol.alias("w"))
        .join(
            mapping.select(F.col("id").alias("src"),
                           F.col("coarse_id").alias("cu")),
            "src",
        )
        .join(
            mapping.select(F.col("id").alias("dst"),
                           F.col("coarse_id").alias("cv")),
            "dst",
        )
        .select(
            F.least("cu", "cv").alias("src"),
            F.greatest("cu", "cv").alias("dst"),
            "w",
        )
    )
    if no_self_loops:
        ce = ce.filter(F.col("src") != F.col("dst"))
    ce = ce.groupBy("src", "dst").agg(F.sum("w").alias("weight"))
    coarse = Graph(
        ce,
        vertices=mapping.select(
            F.col("coarse_id").alias("id")
        ).distinct(),
        directed=False,
        weighted=True,
    )
    return coarse, mapping.select("id", "coarse_id")
