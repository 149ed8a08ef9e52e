"""Group centralities — greedy submodular selection as superstep rounds.

References (semantics matched, execution re-designed for DataFrames):
  - /root/reference/networkit/cpp/centrality/GroupDegree.cpp:41-124 —
    greedy max-marginal-gain selection of a k-group maximizing the
    number of nodes reachable in one hop (countGroupNodes=true counts
    the group members themselves, the reference default). The
    reference's lazy bucket-queue is a sequential optimization of the
    same exact greedy (gains are submodular, so lazy == eager).
  - /root/reference/networkit/cpp/centrality/GroupHarmonicCloseness.cpp
    — greedy max-gain of sum_{v not in S} 1/d(v, S).

Tie-break: both operators pick the SMALLEST node id among equal-gain
candidates — a documented deterministic refinement of the reference's
unspecified priority-queue tie order (needed for cross-engine gates).

Plans: group_degree is one anti-join + one hash aggregation per round
(k rounds, no windows); group_harmonic_closeness joins a precomputed
(source, v, dist) relation per round — the distance table is the
expensive O(n * reachable) part and is built once with the batched
tagged-BFS machinery; at web scale you'd feed a sampled or sketched
distance relation instead (same greedy loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import materialize_partitioned


def group_degree(
    g: Graph, k: int, count_group_nodes: bool = True
) -> tuple[list[int], int]:
    """Greedy group-degree maximization (GroupDegree.cpp:41-63).

    Returns (group as the selection-ordered list, final group-degree
    score).  Score = number of distinct nodes reachable in one hop from
    the group (group members included when ``count_group_nodes``,
    GroupDegree.hpp:39 default).
    """
    n = g.number_of_nodes()
    if k <= 0 or k > n:
        raise ValueError("k must be between 1 and n")
    spark = g.edges.sparkSession
    gg = g.remove_self_loops()
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    nodes = gg.nodes()

    group: list[int] = []
    covered = spark.createDataFrame([], "id long")  # group + their neighbors
    for _ in range(k):
        # marginal gain of candidate u: |N(u) \ covered| (+1 if u itself
        # uncovered and group members count)
        new_nbrs = (
            adj.join(
                covered.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                "dst",
                "left_anti",
            )
            .groupBy("src")
            .agg(F.count("*").alias("nbr_gain"))
        )
        cand = (
            nodes.join(covered.hint("shuffle_hash"), "id", "left_anti")
            .select("id", F.lit(1 if count_group_nodes else 0).alias("self_gain"))
            .unionByName(
                covered.select("id", F.lit(0).alias("self_gain"))
            )
        )
        if group:
            in_group = spark.createDataFrame([(i,) for i in group], "id long")
            cand = cand.join(F.broadcast(in_group), "id", "left_anti")
        gains = (
            cand.join(new_nbrs.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id",
                (F.coalesce("nbr_gain", F.lit(0)) + F.col("self_gain")).alias(
                    "gain"
                ),
            )
        )
        pick = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()[0]
        u = int(pick["id"])
        group.append(u)
        u_df = spark.createDataFrame([(u,)], "id long")
        covered = (
            covered.unionByName(u_df)
            .unionByName(
                adj.join(F.broadcast(u_df).withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    score_df = covered
    if not count_group_nodes:
        in_group = spark.createDataFrame([(i,) for i in group], "id long")
        score_df = covered.join(F.broadcast(in_group), "id", "left_anti")
    return group, score_df.count()


def group_harmonic_closeness(
    g: Graph, k: int, distances: DataFrame | None = None
) -> tuple[list[int], float]:
    """Greedy group-harmonic-closeness (GroupHarmonicCloseness.cpp):
    maximize sum_{v not in S} 1 / d(v, S), unreachable v contributing 0.

    ``distances``: optional (s, v, dist) relation (dist >= 1 rows are
    enough); computed with the batched tagged BFS when absent.  The
    greedy loop itself is one join + two aggregations per round over
    that relation.
    """
    n = g.number_of_nodes()
    if k <= 0 or k > n:
        raise ValueError("k must be between 1 and n")
    spark = g.edges.sparkSession
    if distances is None:
        from networkit_spark.operators.closeness import all_pairs_hop_distances

        distances = all_pairs_hop_distances(g)
    dist = materialize_partitioned(
        distances.filter(F.col("dist") > 0).select("s", "v", "dist"), "v"
    )

    group: list[int] = []
    # ds(v) = current distance from v to the group (absent = unreachable)
    ds = spark.createDataFrame([], "v long, d long")
    for _ in range(k):
        cand_d = dist.select(F.col("s").alias("u"), "v", "dist")
        if group:
            in_group = spark.createDataFrame([(i,) for i in group], "u long")
            cand_d = cand_d.join(F.broadcast(in_group), "u", "left_anti")
            # v inside S contributes nothing and must stop contributing
            # once captured: drop rows whose v is in the group
            in_group_v = spark.createDataFrame([(i,) for i in group], "v long")
            cand_d = cand_d.join(F.broadcast(in_group_v), "v", "left_anti")
        joined = cand_d.join(ds.hint("shuffle_hash"), "v", "left")
        # gain(u) = sum_v [ 1/min(d, dist) - 1/d ] with 1/null = 0
        gains = joined.select(
            "u",
            (
                1.0 / F.least(F.col("dist"), F.coalesce("d", F.col("dist")))
                - F.when(F.col("d").isNotNull(), 1.0 / F.col("d")).otherwise(0.0)
            ).alias("delta"),
        ).groupBy("u").agg(F.sum("delta").alias("gain"))
        # the candidate itself LEAVES the outside set: subtract its own
        # current contribution 1/d(u, S) (zero when S is empty or u is
        # unreachable from S) — score sums over v not in S only
        own = ds.select(F.col("v").alias("u"), F.col("d").alias("d_own"))
        gains = gains.join(own, "u", "left").select(
            "u",
            (
                F.col("gain")
                - F.when(F.col("d_own").isNotNull(), 1.0 / F.col("d_own"))
                .otherwise(0.0)
            ).alias("gain"),
        )
        # ties must not depend on float summation ORDER: two candidates
        # with mathematically equal gain can differ by ulps across
        # engines/partitionings — round to 9 dp before the argmax
        # (documented determinism rule; abs error of the sums is ~1e-13)
        pick = (
            gains.orderBy(F.desc(F.round("gain", 9)), F.asc("u"))
            .limit(1)
            .collect()[0]
        )
        u = int(pick["u"])
        group.append(u)
        u_dist = dist.filter(F.col("s") == u).select("v", F.col("dist").alias("du"))
        ds = (
            ds.join(u_dist, "v", "full")
            .select(
                "v",
                F.least(F.coalesce("d", F.col("du")), F.coalesce("du", F.col("d")))
                .alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    in_group_v = spark.createDataFrame([(i,) for i in group], "v long")
    score_row = (
        ds.join(F.broadcast(in_group_v), "v", "left_anti")
        .agg(F.sum(1.0 / F.col("d")).alias("s"))
        .collect()[0]
    )
    dist.unpersist()
    return group, float(score_row["s"] or 0.0)
