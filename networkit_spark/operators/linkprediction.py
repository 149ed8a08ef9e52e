"""Link prediction: score candidate NON-edges of an undirected graph.

Reference (/root/reference/networkit/cpp/linkprediction/ and
include/networkit/linkprediction/):
  - MissingLinksFinder.cpp:19-75 — findAtDistance(k): all node pairs
    u < v at shortest-path distance exactly k (per-node BFS, duplicates
    u >= v discarded).
  - Index semantics, each a per-pair score over the CURRENT graph:
      CommonNeighborsIndex.hpp:   |N(u) ∩ N(v)|
      JaccardIndex.hpp:           |N(u) ∩ N(v)| / |N(u) ∪ N(v)| (0 on
                                  empty union)
      AdamicAdarIndex.cpp:15-21:  sum over w in N(u)∩N(v) of 1/ln(deg w)
      ResourceAllocationIndex.cpp:13-19: sum of 1/deg(w)
      PreferentialAttachmentIndex.hpp: deg(u) * deg(v)
      TotalNeighborsIndex.hpp:    |N(u) ∪ N(v)|
      UDegreeIndex.hpp / VDegreeIndex.hpp: deg(u) / deg(v)
  - LinkThresholder.cpp — byScore / byCount / byPercentage selection
    over predictions sorted by (score desc, u asc, v asc)
    (PredictionsSorter.cpp descending ordering).

Spark plan: every neighborhood-overlap index is a WEDGE aggregation —
the pair (u, v) receives one row per shared neighbor w from the
adjacency self-join keyed on w, then ONE hash aggregation computes
count / sum(1/ln deg) / sum(1/deg) simultaneously; union sizes come
from deg(u) + deg(v) - common via two degree joins, so nothing ever
materializes per-node neighbor arrays. The wedge join's skew is bounded
by sum_w deg(w)^2 — inherent to common-neighbor counting (the reference
pays the same in its per-node BFS at distance 2); at web scale cap the
candidate generation with ``max_center_degree`` (a hub with millions of
neighbors predicts nothing useful and would dominate the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

INDICES = (
    "common_neighbors",
    "jaccard",
    "adamic_adar",
    "resource_allocation",
    "preferential_attachment",
    "total_neighbors",
    "u_degree",
    "v_degree",
)


def _require_undirected(g: Graph) -> None:
    if g.directed:
        raise ValueError(
            "link prediction indices are defined over undirected "
            "neighborhoods; convert with to_undirected() first"
        )


def _canonical_edges(g: Graph) -> DataFrame:
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def _wedge_pairs(g: Graph, max_center_degree: int | None = None) -> DataFrame:
    """(u, v, w): u < v share the neighbor w. One row per (pair, witness)."""
    adj = g.adj().filter(F.col("src") != F.col("dst")).select(
        F.col("src").alias("w"), F.col("dst").alias("x")
    )
    if max_center_degree is not None:
        ok = (
            adj.groupBy("w")
            .count()
            .filter(F.col("count") <= max_center_degree)
            .select("w")
        )
        adj = adj.join(ok, "w", "left_semi")
    b = adj.select(F.col("w").alias("w2"), F.col("x").alias("y"))
    return (
        adj.join(b, adj.w == b.w2)
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias("u"), F.col("y").alias("v"), "w")
    )


def missing_links(
    g: Graph, k: int = 2, max_center_degree: int | None = None
) -> DataFrame:
    """(u, v) with u < v at shortest-path distance EXACTLY k —
    MissingLinksFinder::findAtDistance (MissingLinksFinder.cpp:19-46).

    k == 2 (the reference's standard candidate set) is one wedge
    self-join + an anti-join against the edge set — no BFS. Larger k
    runs the level-synchronous multi-source BFS and filters dist == k;
    that is O(n^2) state all-sources, so reserve it for subgraphs.
    """
    _require_undirected(g)
    edges = _canonical_edges(g)
    if k == 2:
        return (
            _wedge_pairs(g, max_center_degree)
            .select("u", "v")
            .distinct()
            .join(edges, ["u", "v"], "left_anti")
        )
    from networkit_spark.operators.closeness import _tagged_bfs
    from networkit_spark.plans.superstep import Checkpointer

    ckpt = Checkpointer(g.edges.sparkSession)
    settled, _ = _tagged_bfs(g, g.nodes(), max_hops=k, ckpt=ckpt)
    return (
        settled.filter((F.col("dist") == k) & (F.col("s") < F.col("v")))
        .select(F.col("s").alias("u"), "v")
    )


def link_prediction(
    g: Graph,
    pairs: DataFrame | None = None,
    indices: tuple[str, ...] = INDICES[:6],
    max_center_degree: int | None = None,
) -> DataFrame:
    """(u, v, <one column per requested index>) for each candidate pair.

    ``pairs`` defaults to :func:`missing_links` at distance 2 — the
    2-hop non-edge candidates every neighborhood index is nonzero on.
    Explicit ``pairs`` (u, v) are scored as given (u < v canonical).
    """
    _require_undirected(g)
    for ix in indices:
        if ix not in INDICES:
            raise ValueError(f"unknown index {ix!r}; pick from {INDICES}")
    if pairs is None:
        pairs = missing_links(g, 2, max_center_degree)
    pairs = pairs.select(
        F.col(pairs.columns[0]).cast("long").alias("u"),
        F.col(pairs.columns[1]).cast("long").alias("v"),
    )

    deg = g.degrees().select("id", "degree")
    wedge = _wedge_pairs(g, max_center_degree).join(
        pairs, ["u", "v"], "left_semi"
    )
    overlap = (
        wedge.join(deg.select(F.col("id").alias("w"), "degree"), "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("_cn"),
            F.sum(
                F.when(
                    F.col("degree") > 1, 1.0 / F.log(F.col("degree"))
                ).otherwise(F.lit(float("inf")))
            ).alias("_aa"),
            F.sum(1.0 / F.col("degree")).alias("_ra"),
        )
    )
    scored = (
        pairs.join(overlap, ["u", "v"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("degree").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv")), "v")
    )
    cn = F.coalesce("_cn", F.lit(0)).cast("double")
    union = F.col("_du") + F.col("_dv") - cn
    exprs = {
        "common_neighbors": cn,
        "jaccard": F.when(union > 0, cn / union).otherwise(0.0),
        "adamic_adar": F.coalesce("_aa", F.lit(0.0)),
        "resource_allocation": F.coalesce("_ra", F.lit(0.0)),
        "preferential_attachment": (
            F.col("_du").cast("double") * F.col("_dv")
        ),
        "total_neighbors": union,
        "u_degree": F.col("_du").cast("double"),
        "v_degree": F.col("_dv").cast("double"),
    }
    return scored.select(
        "u", "v", *[exprs[ix].alias(ix) for ix in indices]
    )


# -- LinkThresholder (LinkThresholder.cpp) ----------------------------------

def _ordered(predictions: DataFrame, score_col: str) -> DataFrame:
    return predictions.orderBy(F.desc(score_col), F.asc("u"), F.asc("v"))


def threshold_by_score(
    predictions: DataFrame, min_score: float, score_col: str = "score"
) -> DataFrame:
    """LinkThresholder::byScore — keep pairs with score >= minScore."""
    return predictions.filter(F.col(score_col) >= min_score)


def threshold_by_count(
    predictions: DataFrame, num_links: int, score_col: str = "score"
) -> DataFrame:
    """LinkThresholder::byCount — the numLinks best predictions under
    the (score desc, u asc, v asc) PredictionsSorter order."""
    return _ordered(predictions, score_col).limit(num_links)


def threshold_by_percentage(
    predictions: DataFrame, percentage: float, score_col: str = "score"
) -> DataFrame:
    """LinkThresholder::byPercentage — the top fraction of predictions."""
    if not 0 <= percentage <= 1:
        raise ValueError("percentage must be in [0, 1]")
    n = predictions.count()
    return threshold_by_count(predictions, int(percentage * n), score_col)
