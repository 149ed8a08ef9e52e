"""Partition-comparison and partition-quality measures.

References (semantics matched, execution re-designed for DataFrames):
  - /root/reference/networkit/cpp/community/NMIDistance.cpp:16-127
    (NMID = 1 - 2*MI/(H_zeta + H_eta), log base 2, 0 when H_sum == 0)
  - /root/reference/networkit/cpp/community/DynamicNMIDistance.cpp:129-158
    (entropy / combineValues)
  - /root/reference/networkit/cpp/community/AdjustedRandMeasure.cpp:5-55
    (1 - ARI over pair counts; 0 when maxIndex == 0 or == expectedIndex)
  - /root/reference/networkit/cpp/community/JaccardMeasure.cpp:13-70
    (pair-counting Jaccard dissimilarity)
  - /root/reference/networkit/cpp/community/NodeStructuralRandMeasure.cpp
    (fraction of node pairs the clusterings disagree on)
  - /root/reference/networkit/cpp/community/EdgeCut.cpp:12-20
    (sum of weights of inter-cluster edges)
  - /root/reference/networkit/cpp/community/Conductance.cpp:14-46
    (cut / min(vol0, vol1), 2-partitions only)

Everything here is a couple of hash aggregations over the
(id, label) x (id, label) contingency table — the table itself is the
only shuffle, O(#clusters^2) rows afterwards.  No reference code is
copied; the C++ walks per-node arrays, we join relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _contingency(zeta: DataFrame, eta: DataFrame) -> DataFrame:
    """(c, d, s): size of every non-empty intersection cell — the
    PartitionIntersection analogue (one shuffle join on id + one agg)."""
    z = zeta.select("id", F.col("label").alias("c"))
    e = eta.select("id", F.col("label").alias("d"))
    return z.join(e, "id").groupBy("c", "d").agg(F.count("*").alias("s"))


def partition_measures(zeta: DataFrame, eta: DataFrame) -> DataFrame:
    """One-row DataFrame with the three reference dissimilarities plus
    the node-structural Rand disagreement:

    ``nmid``   NMIDistance.getDissimilarity
    ``ari_d``  AdjustedRandMeasure.getDissimilarity (1 - ARI)
    ``jac_d``  JaccardMeasure.getDissimilarity
    ``rand_d`` NodeStructuralRandMeasure (pair disagreement fraction)

    The node universe is the JOIN of the two label relations (both
    engines label the same universe in practice; mismatched ids would
    silently shrink n, mirroring the reference's requirement that both
    partitions cover G's nodes).
    """
    cells = _contingency(zeta, eta).cache()
    # marginals + n from the contingency cells (no second pass over ids)
    stats = cells.select(
        F.sum("s").alias("n"),
        F.sum(F.col("s") * (F.col("s") - 1) / 2).alias("sum_int"),
    )
    zc = cells.groupBy("c").agg(F.sum("s").alias("sc"))
    ec = cells.groupBy("d").agg(F.sum("s").alias("sd"))
    sum_zeta = zc.select(F.sum(F.col("sc") * (F.col("sc") - 1) / 2).alias("sum_zeta"))
    sum_eta = ec.select(F.sum(F.col("sd") * (F.col("sd") - 1) / 2).alias("sum_eta"))

    n_row = stats.collect()[0]
    n = float(n_row["n"])
    sum_int = float(n_row["sum_int"])
    sz = float(sum_zeta.collect()[0]["sum_zeta"])
    se = float(sum_eta.collect()[0]["sum_eta"])

    # mutual information + entropies (log base 2, NMIDistance.cpp:75-104)
    mi_df = (
        cells.join(zc, "c")
        .join(ec, "d")
        .select(
            (
                (F.col("s") / F.lit(n))
                * F.log2(F.col("s") * F.lit(n) / (F.col("sc") * F.col("sd")))
            ).alias("term")
        )
        .agg(F.sum("term").alias("mi"))
    )
    hz_df = zc.select(
        F.sum(-(F.col("sc") / F.lit(n)) * F.log2(F.col("sc") / F.lit(n))).alias("h")
    )
    he_df = ec.select(
        F.sum(-(F.col("sd") / F.lit(n)) * F.log2(F.col("sd") / F.lit(n))).alias("h")
    )
    mi = float(mi_df.collect()[0]["mi"] or 0.0)
    h_sum = float(hz_df.collect()[0]["h"] or 0.0) + float(he_df.collect()[0]["h"] or 0.0)
    nmid = 0.0 if h_sum == 0.0 else 1.0 - (2.0 * mi) / h_sum

    # adjusted Rand (AdjustedRandMeasure.cpp:27-55)
    denominator = n * (n - 1) / 2.0
    max_index = 0.5 * (sz + se)
    expected_index = (sz * se) / denominator if denominator else 0.0
    if max_index == 0 or max_index == expected_index:
        ari_d = 0.0
    else:
        ari_d = 1.0 - (sum_int - expected_index) / (max_index - expected_index)

    # Jaccard (JaccardMeasure.cpp:36-66)
    s11 = sum_int
    s00 = n * (n - 1) / 2.0 + sum_int - (sz + se)
    divisor = n * (n - 1) - 2.0 * s00
    jac_d = 1.0 - (2.0 * s11) / divisor if divisor > 0 else 0.0

    # node-structural Rand disagreement: pairs together in exactly one
    rand_d = (sz + se - 2.0 * sum_int) / denominator if denominator else 0.0

    cells.unpersist()
    spark = zeta.sparkSession
    return spark.createDataFrame(
        [(nmid, ari_d, jac_d, rand_d)],
        "nmid double, ari_d double, jac_d double, rand_d double",
    )


def edge_cut(g: Graph, zeta: DataFrame) -> float:
    """EdgeCut.getQuality: total weight of edges whose endpoints land in
    different clusters (each stored edge counted once)."""
    lu = zeta.select(F.col("id").alias("src"), F.col("label").alias("lu"))
    lv = zeta.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
    row = (
        g.edges.join(lu, "src")
        .join(lv, "dst")
        .filter(F.col("lu") != F.col("lv"))
        .agg(F.sum("weight").alias("cut"))
        .collect()[0]
    )
    return float(row["cut"] or 0.0)


def conductance(g: Graph, zeta: DataFrame) -> float:
    """Conductance.getQuality: cut / min(vol(A), vol(B)) for a
    2-partition (Conductance.cpp:14-46; volumes from weightedDegree)."""
    labels = [r["label"] for r in zeta.select("label").distinct().collect()]
    if len(labels) != 2:
        raise ValueError(
            f"conductance requires a 2-partition, got {len(labels)} subsets"
        )
    vols = (
        g.degrees()
        .join(zeta, "id")
        .groupBy("label")
        .agg(F.sum("w_degree").alias("vol"))
        .collect()
    )
    denom = min(float(r["vol"]) for r in vols)
    if denom == 0.0:
        return 0.0
    return edge_cut(g, zeta) / denom


def _md5_draw(seed: str, *cols):
    """First 13 md5 nibbles of 'seed|col|col…' as a long (uniform
    52-bit draw, the repo-wide derandomization rule; 13 matches the
    oracle helper _md5_long13_sql)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), *[c.cast("string") for c in cols])),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")


def sampled_node_structural_rand(
    g: Graph,
    zeta: DataFrame,
    eta: DataFrame,
    max_samples: int,
    seed: str = "snr",
) -> tuple[float, int]:
    """(dissimilarity, samples) — SampledNodeStructuralRandMeasure.

    Reference: community/SampledNodeStructuralRandMeasure.cpp:17-48 —
    draw random node pairs, count agreements (same/same) and
    disagreements (diff/diff); dis = 1 - (n00+n11)/samples.  The
    reference redraws until ``maxSamples`` DISTINCT pairs land; we
    derandomize with md5 draws indexed 0..maxSamples-1 and simply drop
    the u == v collisions (documented deviation: the sample count is
    the deterministic number of distinct-pair draws, returned to the
    caller), mapping each 48-bit draw onto the dense ascending-id rank
    so sparse id spaces sample uniformly.
    """
    from networkit_spark.plans.ids import dense_ids

    spark = g.edges.sparkSession
    ranked = dense_ids(g.nodes(), ["id"], id_col="rank").localCheckpoint(
        eager=True
    )
    n = ranked.count()
    idx = spark.range(int(max_samples)).select(F.col("id").alias("i"))
    draws = idx.select(
        "i",
        (_md5_draw(seed + "-u", F.col("i")) % n).alias("ru"),
        (_md5_draw(seed + "-v", F.col("i")) % n).alias("rv"),
    ).filter(F.col("ru") != F.col("rv"))
    pairs = (
        draws.join(
            ranked.select(F.col("rank").alias("ru"), F.col("id").alias("u")),
            "ru",
        )
        .join(
            ranked.select(F.col("rank").alias("rv"), F.col("id").alias("v")),
            "rv",
        )
        .join(zeta.select(F.col("id").alias("u"), F.col("label").alias("zu")), "u")
        .join(zeta.select(F.col("id").alias("v"), F.col("label").alias("zv")), "v")
        .join(eta.select(F.col("id").alias("u"), F.col("label").alias("eu")), "u")
        .join(eta.select(F.col("id").alias("v"), F.col("label").alias("ev")), "v")
    )
    row = pairs.agg(
        F.count("*").alias("s"),
        F.sum(
            (
                ((F.col("zu") == F.col("zv")) & (F.col("eu") == F.col("ev")))
                | ((F.col("zu") != F.col("zv")) & (F.col("eu") != F.col("ev")))
            ).cast("long")
        ).alias("agree"),
    ).collect()[0]
    s = int(row["s"] or 0)
    if s == 0:
        return 0.0, 0
    return 1.0 - float(row["agree"] or 0) / s, s


def sampled_graph_structural_rand(
    g: Graph,
    zeta: DataFrame,
    eta: DataFrame,
    max_samples: int,
    seed: str = "sgr",
) -> tuple[float, int]:
    """(dissimilarity, samples) — SampledGraphStructuralRandMeasure.

    Reference: community/SampledGraphStructuralRandMeasure.cpp:17-50 —
    draw a random node with degree > 0, then a uniform incident edge,
    and count clustering (dis)agreements over the sampled EDGES.
    Derandomized: node draws are md5 ranks (zero-degree draws dropped,
    deterministic sample count returned); the uniform neighbor pick is
    a per-sample md5 ARGMIN over the node's adjacency — the same
    uniform marginal as indexing the neighbor array, without sorting a
    hub's neighbor list in one partition (hash-argmin is the hub rule).
    """
    from networkit_spark.plans.ids import dense_ids

    spark = g.edges.sparkSession
    ranked = dense_ids(g.nodes(), ["id"], id_col="rank").localCheckpoint(
        eager=True
    )
    n = ranked.count()
    idx = spark.range(int(max_samples)).select(F.col("id").alias("i"))
    su = idx.select(
        "i", (_md5_draw(seed + "-u", F.col("i")) % n).alias("ru")
    ).join(
        ranked.select(F.col("rank").alias("ru"), F.col("id").alias("u")), "ru"
    )
    adj = g.adj().select(F.col("src").alias("u"), F.col("dst").alias("v"))
    picked = (
        su.join(adj, "u")  # zero-degree draws drop here
        .withColumn("h", _md5_draw(seed + "-v", F.col("i"), F.col("v")))
        .groupBy("i", "u")
        .agg(F.min(F.struct("h", "v")).alias("m"))
        .select("i", "u", F.col("m.v").alias("v"))
    )
    pairs = (
        picked
        .join(zeta.select(F.col("id").alias("u"), F.col("label").alias("zu")), "u")
        .join(zeta.select(F.col("id").alias("v"), F.col("label").alias("zv")), "v")
        .join(eta.select(F.col("id").alias("u"), F.col("label").alias("eu")), "u")
        .join(eta.select(F.col("id").alias("v"), F.col("label").alias("ev")), "v")
    )
    row = pairs.agg(
        F.count("*").alias("s"),
        F.sum(
            (
                ((F.col("zu") == F.col("zv")) & (F.col("eu") == F.col("ev")))
                | ((F.col("zu") != F.col("zv")) & (F.col("eu") != F.col("ev")))
            ).cast("long")
        ).alias("agree"),
    ).collect()[0]
    s = int(row["s"] or 0)
    if s == 0:
        return 0.0, 0
    return 1.0 - float(row["agree"] or 0) / s, s


def dynamic_nmi_distance(
    old_labels: DataFrame, new_labels: DataFrame
) -> float:
    """NMI dissimilarity between a partition of the OLD graph and one
    of the NEW graph, over the nodes present in both.

    Reference: /root/reference/networkit/cpp/community/
    DynamicNMIDistance.cpp:27-128 — getDissimilarity restricts every
    count (cluster sizes, confusion matrix, totalOverlap) to nodes
    isInBoth (:17-22), then applies the same MI / entropy / NMID
    combination as the static NMIDistance.  :func:`partition_measures`
    computes its marginals FROM the inner-join contingency cells, so
    its ``nmid`` over two label relations with different node sets IS
    this restricted form — this wrapper only documents and projects it.
    """
    row = partition_measures(old_labels, new_labels).collect()[0]
    return float(row["nmid"])
