"""KPathCentrality — randomized k-path centrality (Alahakoon et al.).

Reference: /root/reference/networkit/cpp/centrality/KPathCentrality.cpp:
- ctor (:18-31): alpha ∈ [-0.5, 0.5]; k = 0 → k = log(n + m).
- run (:33-100): t = 2·k²·n^(1-2α)·ln n self-avoiding walks; each walk
  starts at a uniform node s, draws a length l ∈ [1, k] uniformly, and
  at every step moves to a neighbor not yet on the walk — uniformly in
  the unweighted case, with probability ∝ 1/w in the weighted case —
  incrementing counter[v] at each visited node.  Final score(v) =
  k·n·counter[v] / t.

Documented deviations (md5-derandomization, same policy as the other
sampling estimators): the start node is the (h13(seed|s|i) mod n)-th
node in id order, the length is 1 + h13(seed|l|i) mod k, and the
uniform neighbor choice is the argmin of md5(seed|p|i|step|dst) over
the unexplored neighbors — a uniform pick the DuckDB oracle replays
bit-identically.  The weighted choice is an exponential race
(argmin of -ln(u01)/(1/w), i.e. min of u01^w) — exact 1/w-proportional
sampling without any cumulative-sum window; it is Spark-side
deterministic but not oracle-replayed (ln's last ulp may differ across
engines), so the weighted mode is pytest-covered only.

Spark-first shape: all t walks advance together; each of the ≤ k steps
is ONE adjacency join + a struct-min hash aggregation per walk — no
sort windows anywhere, so a 10^8-degree hub contributes only its
candidate rows to a map-side-combinable argmin, never a single-partition
sort (the round-4 Node2Vec lesson applied from the start).  The visited
set rides along as an array column bounded by k (k ~ log(n+m)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    SuperstepResult,
    materialize_partitioned,
)


def _h13(seed: int, tag: str, *cols):
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(f"{seed}|{tag}"), *cols)), 1, 13
        ),
        16,
        10,
    ).cast("long")


def k_path_centrality(
    g: Graph,
    alpha: float = 0.2,
    k: int = 0,
    seed: int = 42,
    n_walks: int | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(scores(id, score), info) — randomized k-path centrality.

    ``n_walks`` overrides the reference's t = 2k²·n^(1-2α)·ln n sample
    count (the fixture gate pins a small explicit t; at 100 TB you set
    the budget explicitly the same way).
    """
    if not (-0.5 <= alpha <= 0.5):
        raise ValueError("alpha must lie in interval [-0.5, 0.5]")
    spark = g.edges.sparkSession
    n = g.number_of_nodes()
    m = g.number_of_edges()
    if k <= 0:
        k = max(1, int(math.log(float(n + m))))
    t = n_walks if n_walks is not None else int(
        2.0 * k * k * math.pow(float(n), 1.0 - 2.0 * alpha) * math.log(float(n))
    )
    if t <= 0:
        raise ValueError("sample count must be positive")

    from networkit_spark.plans.ids import dense_ids

    idx = dense_ids(g.nodes(), ["id"], "idx").localCheckpoint(eager=True)
    weighted = g.weighted
    adj = materialize_partitioned(
        g.adj().filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight"),
        "src",
    )

    walks = (
        spark.range(t)
        .select(F.col("id").alias("i"))
        .select(
            "i",
            (_h13(seed, "s", F.col("i")) % n).alias("idx"),
            (F.lit(1) + _h13(seed, "l", F.col("i")) % k).alias("l"),
        )
        .join(idx, "idx")
        .select("i", "l", F.col("id").alias("cur"),
                F.array(F.col("id")).alias("visited"))
    )
    state = materialize_partitioned(walks, "cur")
    visits: list[DataFrame] = []
    metrics: list[dict] = []
    for j in range(1, k + 1):
        alive = state.filter(F.lit(j) <= F.col("l"))
        cand = (
            alive.join(adj, alive.cur == adj.src)
            .filter(~F.array_contains(F.col("visited"), F.col("dst")))
            .select("i", "l", "visited", "dst", "weight")
        )
        if weighted:
            u = (
                _h13(seed, f"p|{j}", F.col("i"), F.col("dst"))
                .cast("double") / F.lit(float(16 ** 13))
            )
            key = F.pow(u, F.col("weight"))
            pick = (
                cand.withColumn("r", key)
                .groupBy("i")
                .agg(F.min(F.struct("r", "dst", "l", "visited")).alias("m"))
            )
        else:
            pick = (
                cand.withColumn(
                    "r", F.md5(F.concat_ws(
                        "|", F.lit(f"{seed}|p|{j}"), F.col("i"), F.col("dst")
                    ))
                )
                .groupBy("i")
                .agg(F.min(F.struct("r", "dst", "l", "visited")).alias("m"))
            )
        nxt = pick.select(
            "i",
            F.col("m.l").alias("l"),
            F.col("m.dst").alias("cur"),
            F.array_union(
                F.col("m.visited"), F.array(F.col("m.dst"))
            ).alias("visited"),
        )
        nxt = materialize_partitioned(nxt, "cur")
        cnt = nxt.count()
        metrics.append({"step": j, "alive": cnt})
        state.unpersist()
        state = nxt
        visits.append(state.select(F.col("cur").alias("id")))
        if cnt == 0:
            break

    if visits:
        allv = visits[0]
        for v in visits[1:]:
            allv = allv.unionByName(v)
        counts = allv.groupBy("id").agg(F.count(F.lit(1)).alias("c"))
    else:
        counts = spark.createDataFrame([], "id long, c long")
    scores = (
        g.nodes()
        .join(counts, "id", "left")
        .select(
            "id",
            (
                F.lit(float(k)) * F.lit(float(n))
                * F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.lit(float(t))
            ).alias("score"),
        )
    )
    state.unpersist()
    adj.unpersist()
    return scores, SuperstepResult(iterations=len(metrics), metrics=metrics)
