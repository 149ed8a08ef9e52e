"""Link-prediction completion: Katz / AdjustedRand / NeighborhoodDistance
/ NeighborsMeasure / SameCommunity / AlgebraicDistance indices, the
RandomLinkSampler training-graph generator, and the ROC / Precision-Recall
evaluation metrics.

Reference (/root/reference/networkit/cpp/linkprediction/ and
include/networkit/linkprediction/):
  - KatzIndex.cpp:36-60 — per pair (u, v): start at the endpoint with
    FEWER neighbors (:42, ``deg(u) > deg(v) ? v : u``); T_0 = {start};
    per path length l, ``hits_l(w) = |{x in T_l-1 : w in N(x)}|`` (the
    reference iterates the UNIQUE nodes found at the previous level, so
    walk multiplicities are NOT compounded), score(w) += damping^l *
    hits_l(w), T_l = keys(hits_l); result = score(end).  Defaults
    maxPathLength=5, damping=0.005 (KatzIndex.hpp:66).
  - AdjustedRandIndex.cpp:14-42 — a = |N(u) ∩ N(v)|, d = n - |N(u) ∪
    N(v)|, and — verbatim from the reference, which computes both
    "differences" with std::set_union (:27-33) — b = c = |N(u) ∪ N(v)|;
    score = 2(ad - bc) / (ab + ac + 2ad + b² + bd + c² + cd), 0 when the
    denominator is 0.  We reproduce that formula exactly; the reference
    gtest's expected table on input/tiny_01.graph
    (LinkPredictionGTest.cpp:264-281) is replicated in tests.
  - NeighborhoodDistanceIndex.hpp:17-23 — |N(u) ∩ N(v)| /
    sqrt(deg(u) * deg(v)).
  - NeighborsMeasureIndex.hpp:18-31 — over all ORDERED combinations
    (a, b) in N(u) × N(v): count 1 if a == b or (a, b) is an edge.
  - SameCommunityIndex.cpp:16-31 — PLM partition of the graph; score
    1 if both nodes share a community else 0.
  - AlgebraicDistanceIndex.cpp:24-74 — numSystems random load vectors
    smoothed numIters times by x <- (1-omega) x + omega * (weighted
    neighbor mean); per-pair score = max-norm (norm=0 == MAX_NORM,
    AlgebraicDistanceIndex.hpp:37) or p-norm of the per-system load
    differences; NaN -> 0.  Unlike distance/AlgebraicDistance.cpp there
    is NO min-max normalization step.
  - RandomLinkSampler.cpp:15-35 — byCount removes (m - numTrainLinks)
    random edges; byPercentage(p) = byCount(p * m) (double -> count
    truncation).
  - EvaluationMetric.cpp:26-178 + ROCMetric.cpp:12-31 +
    PrecisionRecallMetric.cpp:12-38 — thresholds are the distinct values
    of ceil(P * i / (numThresholds-1)) for i in 0..numThresholds-1 over
    the predictions sorted by (score desc, u asc, v asc)
    (PredictionsSorter); at threshold t the positives are the top-t
    predictions: TP(t) edges of the test graph among them, FP(t) = t -
    TP(t), FN(t) = P - TP(t), TN(t) = N - FP(t).  ROC point = (FP/negs,
    TP/pos); PR point = (recall, precision) with 1-defaults on empty
    denominators; consecutive points with equal x keep only the LAST y;
    AUC = trapezoid rule over the x-sorted points.

Spark plans: every neighborhood index is the wedge aggregation already
used by :mod:`linkprediction` (one shuffle keyed on the shared
neighbor); NeighborsMeasure additionally joins the canonical edge set
against the N(u) x N(v) expansion (O(deg*deg) rows per pair — the same
work the reference's nested forNeighborsOf pays; cap candidate pairs
upstream for hubs).  Katz runs one superstep per path length: the
frontier of DISTINCT (start, node) rows joins the cached adjacency and
hash-aggregates the hit counts — state is O(|starts| * reached), the
multi-source-BFS shape used by spsp/closeness.  The evaluation metrics
need global prediction ranks: computed with the two-phase
range-partitioned ranking (plans/ids.dense_ids) — NO single-partition
window — after which only the O(numThresholds) threshold rows are
collected to build the curve.  RandomLinkSampler ranks edges by an
md5(seed|src|dst) key through the same two-phase machinery and
anti-joins the removal prefix, so the sample is deterministic and
replayable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.ids import dense_ids

MAX_NORM = 0  # AlgebraicDistanceIndex.hpp:37


def _canonical_pairs(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.col(pairs.columns[0]).cast("long").alias("u"),
        F.col(pairs.columns[1]).cast("long").alias("v"),
    )



def _self_zero(score):
    """LinkPredictor::run returns 0 for u == v before runImpl
    (LinkPredictor.cpp:45-48); every index applies the same guard."""
    return F.when(F.col("u") == F.col("v"), F.lit(0.0)).otherwise(score)

def _common_neighbors(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, cn) for the requested pairs (0 rows omitted)."""
    adj = g.adj().select("src", "dst")
    au = adj.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    av = adj.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    return (
        pairs.join(au, "u")
        .join(av, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )


def adjusted_rand_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score) — AdjustedRandIndex.cpp:14-42 with the reference's
    literal b = c = |N(u) ∪ N(v)| (set_union at :27-33)."""
    if g.directed:
        raise ValueError("AdjustedRandIndex is defined over undirected graphs")
    pairs = _canonical_pairs(pairs)
    deg = g.degrees().select("id", "degree")
    n = g.number_of_nodes()
    scored = (
        pairs.join(_common_neighbors(g, pairs), ["u", "v"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("degree").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv")), "v")
    )
    a = F.coalesce("cn", F.lit(0)).cast("double")
    b = (F.col("_du") + F.col("_dv") - a).cast("double")  # = |union| = c
    d = F.lit(float(n)) - b
    denom = a * b + a * b + 2 * a * d + b * b + b * d + b * b + b * d
    score = F.when(denom != 0, 2 * (a * d - b * b) / denom).otherwise(0.0)
    return scored.select("u", "v", _self_zero(score).alias("score"))


def neighborhood_distance_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score) — |N(u) ∩ N(v)| / sqrt(deg u * deg v)
    (NeighborhoodDistanceIndex.hpp:17-23)."""
    if g.directed:
        raise ValueError("index is defined over undirected graphs")
    pairs = _canonical_pairs(pairs)
    deg = g.degrees().select("id", "degree")
    return (
        pairs.join(_common_neighbors(g, pairs), ["u", "v"], "left")
        .join(deg.select(F.col("id").alias("u"), F.col("degree").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv")), "v")
        .select(
            "u",
            "v",
            _self_zero(
                F.coalesce("cn", F.lit(0)).cast("double")
                / F.sqrt(F.col("_du").cast("double") * F.col("_dv"))
            ).alias("score"),
        )
    )


def neighbors_measure_index(g: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, score) — count over ordered (a, b) in N(u) x N(v) of
    [a == b or (a, b) in E] (NeighborsMeasureIndex.hpp:18-31).  With no
    self-loops (the graph drops them) the two conditions are disjoint,
    so score = |N(u) ∩ N(v)| + |edges between N(u) and N(v)|."""
    if g.directed:
        raise ValueError("index is defined over undirected graphs")
    pairs = _canonical_pairs(pairs)
    adj = g.adj().select("src", "dst")
    au = adj.select(F.col("src").alias("u"), F.col("dst").alias("_a"))
    av = adj.select(F.col("src").alias("v"), F.col("dst").alias("_b"))
    eset = g.edges.select(
        F.least("src", "dst").alias("_ea"), F.greatest("src", "dst").alias("_eb")
    ).distinct()
    expanded = pairs.join(au, "u").join(av, "v")
    linked = (
        expanded.join(
            eset,
            (F.least("_a", "_b") == F.col("_ea"))
            & (F.greatest("_a", "_b") == F.col("_eb")),
            "left_semi",
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("_btw"))
    )
    return (
        pairs.join(_common_neighbors(g, pairs), ["u", "v"], "left")
        .join(linked, ["u", "v"], "left")
        .select(
            "u",
            "v",
            _self_zero(
                (
                    F.coalesce("cn", F.lit(0)) + F.coalesce("_btw", F.lit(0))
                ).cast("double")
            ).alias("score"),
        )
    )


def same_community_index(
    g: Graph, pairs: DataFrame, partition: DataFrame | None = None
) -> DataFrame:
    """(u, v, score) — 1.0 iff both endpoints share a community
    (SameCommunityIndex.cpp:28-31).  ``partition`` is (id, label); the
    default is the PLM partition like the reference's constructor
    (:16-19)."""
    pairs = _canonical_pairs(pairs)
    if partition is None:
        from networkit_spark.operators.plm import plm

        partition, _ = plm(g)
    lbl = partition.select(
        F.col(partition.columns[0]).alias("id"),
        F.col(partition.columns[1]).alias("_lbl"),
    )
    return (
        pairs.join(lbl.select(F.col("id").alias("u"), F.col("_lbl").alias("_lu")), "u")
        .join(lbl.select(F.col("id").alias("v"), F.col("_lbl").alias("_lv")), "v")
        .select(
            "u",
            "v",
            _self_zero(
                F.when(F.col("_lu") == F.col("_lv"), 1.0).otherwise(0.0)
            ).alias("score"),
        )
    )


def katz_index(
    g: Graph,
    pairs: DataFrame,
    max_path_length: int = 5,
    damping: float = 0.005,
) -> DataFrame:
    """(u, v, score) — KatzIndex.cpp:36-60 walk-hit accumulation from
    the lower-degree endpoint (ties -> u, matching ``deg(u) > deg(v) ?
    v : u``).  One superstep per path length over the distinct-start
    frontier; contributions to pair targets accumulate level by level
    and one final hash aggregation sums them."""
    if g.directed:
        raise ValueError("KatzIndex is defined over undirected graphs")
    pairs = _canonical_pairs(pairs)
    deg = g.degrees().select("id", "degree")
    tagged = (
        pairs.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv")), "v")
        .select(
            "u",
            "v",
            F.when(F.col("_du") > F.col("_dv"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("start"),
            F.when(F.col("_du") > F.col("_dv"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("end"),
        )
        .localCheckpoint(eager=True)
    )
    adj = g.adj().select("src", "dst").localCheckpoint(eager=True)
    targets = tagged.select(
        "u", "v", F.col("start").alias("_ts"), F.col("end").alias("_te")
    )
    frontier = tagged.select("start", F.col("start").alias("node")).distinct()
    contribs: list[DataFrame] = []
    for level in range(1, max_path_length + 1):
        hits = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .groupBy(F.col("start").alias("_hs"), F.col("dst").alias("_hd"))
            .agg(F.count("*").alias("_h"))
            .localCheckpoint(eager=True)
        )
        contribs.append(
            hits.join(
                targets,
                (F.col("_hs") == F.col("_ts")) & (F.col("_hd") == F.col("_te")),
            ).select(
                "u", "v", (F.lit(float(damping**level)) * F.col("_h")).alias("_c")
            )
        )
        frontier = hits.select(
            F.col("_hs").alias("start"), F.col("_hd").alias("node")
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    scores = allc.groupBy("u", "v").agg(F.sum("_c").alias("score"))
    return pairs.join(scores, ["u", "v"], "left").select(
        "u", "v", _self_zero(F.coalesce("score", F.lit(0.0))).alias("score")
    )


def algebraic_distance_index(
    g: Graph,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iters: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(u, v, score) — AlgebraicDistanceIndex.cpp:24-74: raw (NOT
    min-max-normalized, unlike distance/AlgebraicDistance.cpp:116-124)
    Jacobi loads, per-pair max-norm (norm=MAX_NORM=0) or p-norm of load
    differences, NaN -> 0 (:73).  Loads initialize from
    md5(ad|seed|sys|id) fractions so the oracle replays them (same
    deviation as distancemisc.algebraic_distance)."""
    if g.directed:
        raise ValueError("index is defined over undirected graphs")
    from networkit_spark.operators.misccentrality import _klong

    pairs = _canonical_pairs(pairs)
    adj = g.adj().select("src", "dst", "weight")
    cols = [f"l{i}" for i in range(num_systems)]
    loads = g.nodes().select(
        "id",
        *[
            (
                _klong(F.lit(f"ad|{seed}|{i}"), F.col("id"))
                / F.lit(float(1 << 52))
            ).alias(f"l{i}")
            for i in range(num_systems)
        ],
    ).localCheckpoint(eager=True)
    for _ in range(num_iters):
        nbr = (
            adj.join(loads.select(F.col("id").alias("dst"), *cols), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum("weight").alias("wd"),
                *[F.sum(F.col("weight") * F.col(c)).alias(f"s_{c}") for c in cols],
            )
        )
        loads = (
            loads.join(nbr, "id", "left")
            .select(
                "id",
                *[
                    F.when(
                        F.col("wd").isNotNull(),
                        (1.0 - omega) * F.col(c)
                        + omega * (F.col(f"s_{c}") / F.col("wd")),
                    )
                    .otherwise(F.col(c))  # isolated node: keep load (no NaN)
                    .alias(c)
                    for c in cols
                ],
            )
            .localCheckpoint(eager=True)
        )
    lu = loads.select(
        F.col("id").alias("u"), *[F.col(c).alias(f"u_{c}") for c in cols]
    )
    lv = loads.select(
        F.col("id").alias("v"), *[F.col(c).alias(f"v_{c}") for c in cols]
    )
    diffs = [F.abs(F.col(f"u_{c}") - F.col(f"v_{c}")) for c in cols]
    if norm == MAX_NORM:
        score = diffs[0]
        for dx in diffs[1:]:
            score = F.greatest(score, dx)
    else:
        score = sum(F.pow(dx, float(norm)) for dx in diffs)
        score = F.pow(score, 1.0 / norm)
    return (
        pairs.join(lu, "u")
        .join(lv, "v")
        .select("u", "v", _self_zero(F.coalesce(score, F.lit(0.0))).alias("score"))
    )


# -- RandomLinkSampler (RandomLinkSampler.cpp:15-35) -------------------------

def random_link_sampler_by_count(
    g: Graph, num_train_links: int, seed: int = 42
) -> Graph:
    """Training graph keeping ``num_train_links`` edges: the reference
    removes (m - k) uniformly random edges (:26-34); here the removal
    prefix is the (m - k) lowest md5(rls|seed|src|dst) keys ranked by
    the two-phase global ranking — deterministic and oracle-replayable."""
    from networkit_spark.operators.misccentrality import _klong

    m = g.number_of_edges()
    if num_train_links > m:
        raise ValueError("num_train_links > number of edges")
    keyed = g.edges.withColumn(
        "_k", _klong(F.lit(f"rls|{seed}"), F.col("src"), F.col("dst"))
    )
    ranked = dense_ids(keyed, ["_k", "src", "dst"], "_rank")
    kept = ranked.filter(F.col("_rank") >= F.lit(int(m - num_train_links))).drop(
        "_k", "_rank"
    )
    return Graph(
        kept,
        vertices=g.nodes(),
        directed=g.directed,
        weighted=g.weighted,
    )


def random_link_sampler_by_percentage(
    g: Graph, train_percentage: float, seed: int = 42
) -> Graph:
    """byPercentage(p) = byCount(p * m) with the reference's double ->
    count truncation (RandomLinkSampler.cpp:15-21)."""
    if not (0.0 <= train_percentage <= 1.0):
        raise ValueError("Given percentage is not in [0, 1].")
    return random_link_sampler_by_count(
        g, int(train_percentage * g.number_of_edges()), seed
    )


# -- EvaluationMetric + ROCMetric + PrecisionRecallMetric ---------------------

def _thresholds(num_predictions: int, num_thresholds: int) -> list[int]:
    """Distinct ceil-percentile prefix lengths (EvaluationMetric.cpp:37-51)."""
    import math

    if num_thresholds < 2:
        raise ValueError("numThresholds < 2")
    if num_predictions + 1 < num_thresholds:
        num_thresholds = num_predictions + 1
    return sorted(
        {
            int(math.ceil(num_predictions * (i / (num_thresholds - 1))))
            for i in range(num_thresholds)
        }
    )


def evaluation_curve(
    predictions: DataFrame,
    test_graph: Graph,
    metric: str = "roc",
    num_thresholds: int = 1000,
) -> tuple[list[tuple[float, float]], float]:
    """(points, auc) for ``metric`` in {"roc", "pr"} over (u, v, score)
    predictions against the test graph's edge set.

    Distributed part: label + two-phase global rank + prefix-TP counts;
    only the O(num_thresholds) threshold rows come to the driver, where
    the reference's point generation (equal-x dedup keeping the last y,
    EvaluationMetric-subclass generatePoints) and trapezoid AUC run on
    the bounded list."""
    if metric not in ("roc", "pr"):
        raise ValueError("metric must be 'roc' or 'pr'")
    eset = test_graph.edges.select(
        F.least("src", "dst").alias("_ea"), F.greatest("src", "dst").alias("_eb")
    ).distinct()
    labeled = (
        _canonical_pairs(predictions.select("u", "v"))
        .join(predictions.select("u", "v", "score"), ["u", "v"])
        .join(
            eset.select(
                F.col("_ea").alias("u"), F.col("_eb").alias("v"),
                F.lit(1).alias("_pos"),
            ),
            ["u", "v"],
            "left",
        )
        .select("u", "v", "score", F.coalesce("_pos", F.lit(0)).alias("_pos"))
        .withColumn("_negscore", -F.col("score"))
    )
    # Two-phase global rank + running positive count (the dense_ids
    # pattern, plus a per-partition positive-count offset): no
    # single-partition window, no nested-loop threshold join.
    from pyspark.sql import Window

    spark = predictions.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    order = [F.col("_negscore").asc(), F.col("u").asc(), F.col("v").asc()]
    staged = (
        labeled.repartitionByRange(n_part, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    part_stats = sorted(
        (int(r["_pid"]), int(r["rows"]), int(r["pos"] or 0))
        for r in staged.groupBy("_pid")
        .agg(F.count("*").alias("rows"), F.sum("_pos").alias("pos"))
        .collect()
    )
    offsets, racc, pacc = [], 0, 0
    for pid, rows, pos in part_stats:
        offsets.append((pid, racc, pacc))
        racc += rows
        pacc += pos
    n_pred, n_pos = racc, pacc
    if n_pred == 0:
        raise ValueError("predictions.size() == 0")
    n_neg = n_pred - n_pos
    ths = _thresholds(n_pred, num_thresholds)
    off_df = spark.createDataFrame(offsets, "_pid int, _roff long, _poff long")
    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        staged.join(F.broadcast(off_df), "_pid")
        .withColumn("_rank", F.row_number().over(w) - 1 + F.col("_roff"))
        .withColumn(
            "_cumtp", F.sum("_pos").over(w) + F.col("_poff")
        )  # positives among ranks <= _rank
    )
    # TP at prefix length t = _cumtp at rank t-1 (0 at t = 0): only the
    # bounded |ths| rows are collected.
    want = [int(t) - 1 for t in ths if t > 0]
    tp_rows = {
        int(r["_rank"]) + 1: int(r["_cumtp"])
        for r in ranked.filter(F.col("_rank").isin(want))
        .select("_rank", "_cumtp")
        .collect()
    }
    tp_rows[0] = 0
    points_x: list[float] = []
    points_y: list[float] = []
    for t in ths:
        tp = tp_rows.get(t, 0)
        fp = t - tp
        fn = n_pos - tp
        if metric == "roc":
            if n_pos == 0:
                raise ValueError("ROC metric is not defined for #positives == 0.")
            if n_neg == 0:
                raise ValueError("ROC metric is not defined for #negatives == 0.")
            x = fp / n_neg
            y = tp / n_pos
        else:
            x = tp / (tp + fn) if (tp > 0 or fn > 0) else 1.0  # recall
            y = tp / (tp + fp) if (tp > 0 or fp > 0) else 1.0  # precision
        if points_x and points_x[-1] == x:
            points_y.pop()
            points_y.append(y)
        else:
            points_x.append(x)
            points_y.append(y)
    pts = sorted(zip(points_x, points_y), key=lambda p: p[0])
    auc = sum(
        0.5 * (pts[i + 1][0] - pts[i][0]) * (pts[i][1] + pts[i + 1][1])
        for i in range(len(pts) - 1)
    )
    return pts, auc
