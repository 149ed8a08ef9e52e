"""Profiling module — network properties + per-measure statistics.

Re-expresses the reference's networkit/profiling/profiling.py Profile
(:366-447 measure registry, :1039-1097 __loadProperties,
:1099-... __loadMeasures) and profiling/stat.py location/dispersion
statistics, Spark-first.  The reference renders HTML/LaTeX reports;
the engine analogue is the DATA those reports show — one properties
row and one statistics row per centrality measure / partition, each a
small DataFrame the caller can collect, join, or write.

Spark plan per measure: the score relation comes from the existing
operator (degree_centrality, core_decomposition,
local_clustering_coefficient, pagerank — the same four the reference's
"minimal" preset runs), then ONE hash aggregation computes
min/max/mean/median/stddev, and the score assortativity reuses
operators/assortativity.assortativity (two broadcast-ready joins + one
moment aggregation — never a collect of the scores).  Partition
measures (ConnectedComponents / Communities ~ PLM, the reference's
Partition.* entries) aggregate subset sizes the same way.

Statistic definitions (profiling/stat.py): location = min / max /
arithmetic mean / median (linear interpolation — scipy and DuckDB
quantile_cont and Spark percentile all agree); dispersion = POPULATION
standard deviation; plus the per-measure Freeman centralization
(Centrality.cpp:74-91) and score assortativity the reference shows in
each measure box.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.assortativity import assortativity
from networkit_spark.operators.centrality import centralization


def _degree_scores(g: Graph) -> DataFrame:
    from networkit_spark.operators.centrality import degree_centrality

    return degree_centrality(g, normalized=False)


def _kcore_scores(g: Graph) -> DataFrame:
    from networkit_spark.operators.kcore import core_decomposition

    cores, _info = core_decomposition(g)
    return cores.select("id", F.col("core").cast("double").alias("score"))


def _lcc_scores(g: Graph) -> DataFrame:
    from networkit_spark.operators.triangles import (
        local_clustering_coefficient,
    )

    return local_clustering_coefficient(g).select(
        "id", F.col("lcc").alias("score")
    )


def _pagerank_scores(g: Graph) -> DataFrame:
    from networkit_spark.operators.pagerank import pagerank

    return pagerank(g, max_iterations=20).scores.select("id", "score")


#: measure name -> scores(id, score) factory; the reference's
#: Centrality.Degree / Partition.CoreDecomposition /
#: Centrality.LocalClusteringCoefficient / Centrality.PageRank preset
#: (profiling.py:443-452).
MEASURES = {
    "degree": _degree_scores,
    "coredecomposition": _kcore_scores,
    "lcc": _lcc_scores,
    "pagerank": _pagerank_scores,
}


def measure_stats(g: Graph, scores: DataFrame, name: str) -> dict:
    """One statistics row for a (id, score) relation: the stat.py
    location/dispersion set + centralization + score assortativity."""
    row = scores.agg(
        F.count("*").alias("n"),
        F.min("score").alias("mn"),
        F.max("score").alias("mx"),
        F.avg("score").alias("mean"),
        F.percentile("score", F.lit(0.5)).alias("median"),
        F.stddev_pop("score").alias("stddev"),
    ).collect()[0]
    attr = scores.select("id", F.col("score").alias("value"))
    return {
        "measure": name,
        "n": int(row["n"]),
        "min": float(row["mn"]),
        "max": float(row["mx"]),
        "mean": float(row["mean"]),
        "median": float(row["median"]),
        "stddev": float(row["stddev"]),
        "centralization": centralization(g, scores),
        "assortativity": assortativity(g, attr),
    }


def partition_stats(labels: DataFrame, name: str,
                    label_col: str = "label") -> dict:
    """Subset-size statistics for a partition (the reference's
    Partition.* rows: count of subsets, extreme/average sizes)."""
    sizes = labels.groupBy(label_col).agg(F.count("*").alias("sz"))
    row = sizes.agg(
        F.count("*").alias("k"),
        F.min("sz").alias("mn"),
        F.max("sz").alias("mx"),
        F.avg("sz").alias("mean"),
    ).collect()[0]
    return {
        "partition": name,
        "count": int(row["k"]),
        "min_size": int(row["mn"]),
        "max_size": int(row["mx"]),
        "mean_size": float(row["mean"]),
    }


def properties(g: Graph) -> dict:
    """__loadProperties (profiling.py:1039-1097): size, density,
    directedness/weightedness flags."""
    n = g.number_of_nodes()
    m = g.number_of_edges()
    pairs = n * (n - 1) if g.directed else n * (n - 1) / 2
    return {
        "nodes": n,
        "edges": m,
        "directed": g.directed,
        "weighted": g.weighted,
        "density": (m / pairs) if pairs else 0.0,
    }


def profile(g: Graph, measures=("degree", "coredecomposition", "lcc",
                                "pagerank"),
            with_components: bool = True,
            with_communities: bool = False) -> dict:
    """Run the full profile: properties + one stats row per measure
    (+ partition rows).  Returns {"properties": dict,
    "measures": list[dict], "partitions": list[dict]} — scalars only;
    every heavy computation stays distributed."""
    out = {"properties": properties(g), "measures": [], "partitions": []}
    for name in measures:
        scores = MEASURES[name](g)
        out["measures"].append(measure_stats(g, scores, name))
    if with_components:
        from networkit_spark.operators.components import (
            connected_components,
        )

        labels, _ = connected_components(g)
        out["partitions"].append(
            partition_stats(labels, "connected_components")
        )
    if with_communities:
        from networkit_spark.operators.plm import plm

        labels, _ = plm(g)
        out["partitions"].append(partition_stats(labels, "communities"))
    return out


def overview(g: Graph) -> str:
    """networkit/__init__.py overview (:149-207): the printed network
    summary, returned as the formatted string (print it yourself).
    Same property set: size, flags, isolated nodes, self-loops,
    density, clustering coefficient (undirected simple graphs), degree
    extremes/mean, degree assortativity, component count + sizes."""
    from networkit_spark.operators.assortativity import degree_assortativity
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.scc import strongly_connected_components

    props = properties(g)
    n = props["nodes"]
    self_loops = g.edges.filter(F.col("src") == F.col("dst")).count()
    degs = g.degrees().select(F.col("degree").cast("double").alias("score"))
    drow = degs.agg(
        F.min("score").alias("mn"), F.max("score").alias("mx"),
        F.avg("score").alias("mean"),
        F.sum((F.col("score") == 0).cast("long")).alias("iso"),
    ).collect()[0]
    if g.directed:
        labels, _ = strongly_connected_components(g)
    else:
        labels, _ = connected_components(g)
    comp = partition_stats(labels, "components")
    lines = [
        "Network Properties:",
        f"nodes, edges\t\t\t{n}, {props['edges']}",
        f"directed?\t\t\t{props['directed']}",
        f"weighted?\t\t\t{props['weighted']}",
        f"isolated nodes\t\t\t{int(drow['iso'])}",
        f"self-loops\t\t\t{self_loops}",
        f"density\t\t\t\t{props['density']:.6f}",
    ]
    if self_loops == 0 and not g.directed:
        from networkit_spark.operators.triangles import (
            avg_local_clustering_coefficient,
        )

        lines.append(
            "clustering coefficient\t\t"
            f"{avg_local_clustering_coefficient(g):.6f}"
        )
    lines += [
        "min/max/avg degree\t\t"
        f"{int(drow['mn'])}, {int(drow['mx'])}, {float(drow['mean']):.6f}",
        f"degree assortativity\t\t{degree_assortativity(g):.6f}",
        f"number of connected components\t{comp['count']}",
        "size of largest component\t"
        f"{comp['max_size']} ({100.0 * comp['max_size'] / n:.2f} %)",
    ]
    return "\n".join(lines)
