"""ApproxCloseness — the Cohen et al. hybrid sampling estimator.

Reference: /root/reference/networkit/cpp/centrality/ApproxCloseness.cpp
(undirected path, :71-119 + runOnPivot :297-381): sample k pivot nodes,
assign every node to its closest pivot (delta = distance, :275-295),
run one SSSP per sample and split each (sample i, node u) distance into
a LOW-confidence part (averaged up by inverse sampling probability) and
a HIGH part (taken exactly via per-pivot distance tail sums):

  LC  iff d(i,u) <= delta(u) * (1/eps - 1)
       or d(i, pivotSample(u)) <= delta(u) / eps
  HSum(u) = sum of d(pivot(u), x) over non-sample x with
            d(pivot(u), x) > delta(u) / eps      (:357-380 tail bins)
  raw(u)  = HSum + HCSum + LCSum * LNum / LCNum,
  LNum    = n - 1 - HNum - k + LCNum             (:96-104)
  score   = (n-1)/raw (normalized) or 1/raw; sampled nodes get their
            exact distance sum (:322).

Deterministic deviations (documented, both engines identical):
  - the k samples are the nodes with the smallest md5(seed|id) digests
    (the reference draws uniformly at random), pivot index = rank;
  - pivot ties (equal delta to several samples) break to the smallest
    pivot index (the reference's PQ pop order is unspecified);
  - the reference's deferral list ORPHANS a pair whose pivot sample
    settled before the node but outside the delta/eps ball (the entry
    is appended after the one-shot flush, runOnPivot:341-343) — an
    order-dependent artifact; this implementation classifies every
    reached pair by the order-free predicate above;
  - estimates for nodes with LCNum == 0 (unreachable from every
    sample) and distance sums of 0 clamp to score 0.0 instead of the
    reference's NaN/inf division.

Spark plan: ONE tagged BFS from the k samples (O(k * n) rows — the
whole point of sampling), then pivot argmin, one classification join,
and the HSum tail via a (pivot, distance-level) aggregate of at most
k * diameter rows joined back per node — no window over a node's whole
region, no all-pairs relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def approx_closeness(
    g: Graph,
    n_samples: int = 16,
    epsilon: float = 0.5,
    normalized: bool = False,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) estimated closeness; ``epsilon`` in (0, 0.5] keeps a
    node's own pivot pair in the LC class (delta <= delta*(1/eps-1)),
    matching the estimator's assumptions.  Undirected unweighted only
    (the reference's directed branch is a different estimator)."""
    from networkit_spark.operators.closeness import _tagged_bfs

    if g.directed:
        raise ValueError("approx_closeness: undirected graphs only")
    if not (0.0 < epsilon <= 0.5):
        raise ValueError("epsilon must be in (0, 0.5]")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    k = min(n_samples, n)

    h = F.md5(F.concat(F.lit(f"{seed}|s|"), F.col("id").cast("string")))
    sample_rows = (
        nodes.select("id", h.alias("h")).orderBy("h", "id").limit(k).collect()
    )
    jdf = spark.createDataFrame(
        [(j, int(r["id"])) for j, r in enumerate(sample_rows)], "j long, sid long"
    ).localCheckpoint(eager=True)

    settled, _ = _tagged_bfs(g, jdf.select(F.col("sid").alias("id")), None, ckpt)
    # D: (j, v, d) distances from sample j
    D = (
        settled.join(jdf.withColumnRenamed("sid", "s").hint("broadcast"), "s")
        .select("j", "v", F.col("dist").alias("d"))
        .localCheckpoint(eager=True)
    )

    # pivot/delta: closest sample, ties to the smallest pivot index
    piv = (
        D.groupBy("v")
        .agg(F.min(F.struct(F.col("d"), F.col("j"))).alias("p"))
        .select(
            "v",
            F.col("p.d").cast("double").alias("delta"),
            F.col("p.j").alias("pj"),
        )
    )

    is_sample = jdf.select(F.col("sid").alias("v"))
    # d(i, pivotSample(u)): distance from sample i to u's pivot sample
    dps = D.join(
        jdf.withColumnRenamed("sid", "v").withColumnRenamed("j", "pj")
        .hint("broadcast"),
        "v",
    ).select("j", "pj", F.col("d").alias("dsp"))

    pairs = (
        D.join(is_sample.hint("broadcast"), "v", "left_anti")
        .join(piv, "v")
        .join(dps, ["j", "pj"], "left")
    )
    lc = (F.col("d") <= F.col("delta") * F.lit(1.0 / epsilon - 1.0)) | (
        F.col("dsp").isNotNull()
        & (F.col("dsp") <= F.col("delta") / F.lit(epsilon))
    )
    cls = pairs.groupBy("v").agg(
        F.sum(F.when(lc, F.col("d")).otherwise(0.0)).alias("lcsum"),
        F.sum(F.when(lc, 1).otherwise(0)).alias("lcnum"),
        F.sum(F.when(~lc, F.col("d")).otherwise(0.0)).alias("hcsum"),
    )

    # HSum/HNum: per-pivot distance-level tails (k * diameter rows)
    lvl = (
        D.join(is_sample.hint("broadcast"), "v", "left_anti")
        .groupBy("j", "d")
        .agg(F.count("*").alias("cnt"), F.sum("d").alias("sumd"))
    )
    hs = (
        piv.join(is_sample.hint("broadcast"), "v", "left_anti")
        .join(lvl.withColumnRenamed("j", "pj").hint("shuffle_hash"), "pj")
        .filter(F.col("d") > F.col("delta") / F.lit(epsilon))
        .groupBy("v")
        .agg(F.sum("sumd").alias("hsum"), F.sum("cnt").alias("hnum"))
    )

    lnum = (
        F.lit(float(n - 1))
        - F.coalesce("hnum", F.lit(0)).cast("double")
        - F.lit(float(k))
        + F.col("lcnum").cast("double")
    )
    raw_est = (
        F.coalesce("hsum", F.lit(0.0))
        + F.col("hcsum")
        + F.col("lcsum") * lnum / F.col("lcnum").cast("double")
    )
    inv = (F.lit(float(n - 1)) if normalized else F.lit(1.0))
    est = (
        cls.join(hs, "v", "left")
        .select(
            F.col("v").alias("id"),
            F.when(
                (F.col("lcnum") > 0) & (raw_est > 0), inv / raw_est
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )
    exact = (
        D.groupBy("j")
        .agg(F.sum("d").alias("dsum"))
        .join(jdf.hint("broadcast"), "j")
        .select(
            F.col("sid").alias("id"),
            F.when(F.col("dsum") > 0, inv / F.col("dsum"))
            .otherwise(0.0)
            .alias("score"),
        )
    )
    out = (
        nodes.join(est.unionByName(exact), "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    return out, SuperstepResult(iterations=1)
