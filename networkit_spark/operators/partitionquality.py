"""Partition / cover quality measures — the reference's
LocalPartitionEvaluation / LocalCoverEvaluation family.

References (/root/reference/networkit/cpp/community/):
- PartitionHubDominance.cpp (:3-62 — per cluster, max internal degree
  over (|c| - 1); singleton clusters score 1.  The reference's
  ``weightedAverage`` uses ``=`` instead of ``+=`` — a bug; we expose
  the correctly accumulated weighted average and gate on the
  unweighted stats).
- CoverHubDominance.cpp (same over an overlapping cover).
- IntrapartitionDensity.cpp (:4-69 — per cluster intra-edge density
  intra / (s(s-1)/2), empty-possible clusters score 1; global =
  sum intra / sum possible).
- IsolatedInterpartitionConductance.cpp (:4-66 — per cluster
  cut / min(vol, total - vol)) and IsolatedInterpartitionExpansion.cpp
  (:4-55 — cut / min(|c|, n - |c|)).
- PartitionFragmentation.cpp (:6-70 — 1 - (largest intersection with a
  connected component) / |c|).
- StablePartitionNodes.cpp (:6-55 — a node is stable iff its
  own-label neighbour weight is positive and strictly greater than
  every other label's weight; isolated nodes are stable).
- CoverF1Similarity.cpp (:10-100 — per cluster of C, the best F1
  against the reference cover, with precision = ov / |ref cluster| and
  recall = ov / |cluster| exactly as the reference computes them).
- PartitionIntersection.cpp (product partition).

All are one or two join+aggregation pipelines over (id, label) /
(id, subset) DataFrames; nothing is collected but the per-cluster
summary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _summary(values: DataFrame, sizes: DataFrame, n: int,
             weight_by: str = "csize") -> dict:
    row = (
        values.join(sizes, "label")
        .agg(
            F.avg("value").alias("avg"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            (F.sum(F.col("value") * F.col(weight_by)) / F.lit(float(n)))
            .alias("wavg"),
        )
        .collect()[0]
    )
    return {
        "avg": float(row["avg"] or 0.0),
        "min": float(row["mn"] or 0.0),
        "max": float(row["mx"] or 0.0),
        "weighted_avg": float(row["wavg"] or 0.0),
    }


def _sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("label").agg(F.count("*").alias("csize"))


def partition_hub_dominance(
    g: Graph, labels: DataFrame
) -> tuple[DataFrame, dict]:
    lab = labels.select("id", "label")
    internal = (
        g.adj()
        .join(lab.withColumnRenamed("id", "src")
              .withColumnRenamed("label", "lu"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "lv"), "dst")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("src").alias("id"), F.col("lu").alias("label"))
        .agg(F.count("*").alias("ideg"))
    )
    maxi = (
        lab.join(internal.select("id", "ideg"), "id", "left")
        .groupBy("label")
        .agg(F.max(F.coalesce("ideg", F.lit(0))).alias("mdeg"),
             F.count("*").alias("csize"))
    )
    values = maxi.select(
        "label", "csize",
        F.when(F.col("csize") > 1,
               F.col("mdeg") / (F.col("csize") - 1))
        .otherwise(1.0).alias("value"),
    )
    n = lab.count()
    return values.select("label", "value"), _summary(
        values.select("label", "value"), values.select("label", "csize"),
        n,
    )


def cover_hub_dominance(
    g: Graph, cover: DataFrame
) -> tuple[DataFrame, dict]:
    cov = cover.select("id", F.col("subset").alias("label"))
    # internal degree of u within subset l: neighbours sharing l
    internal = (
        g.adj().select("src", "dst")
        .join(cov.withColumnRenamed("id", "src"), "src")
        .join(cov.withColumnRenamed("id", "dst"), ["dst", "label"])
        .groupBy(F.col("src").alias("id"), "label")
        .agg(F.count("*").alias("ideg"))
    )
    maxi = (
        cov.join(internal, ["id", "label"], "left")
        .groupBy("label")
        .agg(F.max(F.coalesce("ideg", F.lit(0))).alias("mdeg"),
             F.count("*").alias("csize"))
    )
    values = maxi.select(
        "label", "csize",
        F.when(F.col("csize") > 1,
               F.col("mdeg") / (F.col("csize") - 1))
        .otherwise(1.0).alias("value"),
    )
    memberships = cov.count()
    return values.select("label", "value"), _summary(
        values.select("label", "value"), values.select("label", "csize"),
        memberships,
    )


def intrapartition_density(
    g: Graph, labels: DataFrame
) -> tuple[DataFrame, dict, float]:
    lab = labels.select("id", "label")
    canon = g.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    intra = (
        canon.join(lab.select(F.col("id").alias("a"),
                              F.col("label").alias("la")), "a")
        .join(lab.select(F.col("id").alias("b"),
                         F.col("label").alias("lb")), "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").alias("intra"))
    )
    sz = _sizes(lab)
    per = (
        sz.join(intra, "label", "left")
        .select(
            "label", "csize",
            F.coalesce("intra", F.lit(0)).alias("intra"),
            (F.col("csize") * (F.col("csize") - 1) / 2).alias("possible"),
        )
        .withColumn(
            "value",
            F.when(F.col("possible") > 0,
                   F.col("intra") / F.col("possible")).otherwise(1.0),
        )
    )
    n = lab.count()
    summ = _summary(per.select("label", "value"),
                    per.select("label", "csize"), n)
    tot = per.agg(
        (F.sum("intra") / F.sum("possible")).alias("g")
    ).collect()[0]["g"]
    return per.select("label", "value"), summ, float(tot or 0.0)


def _isolated_interpartition(
    g: Graph, labels: DataFrame, mode: str
) -> tuple[DataFrame, dict]:
    lab = labels.select("id", "label")
    canon = g.edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"), "weight",
    )
    tagged = (
        canon.join(lab.select(F.col("id").alias("a"),
                              F.col("label").alias("la")), "a")
        .join(lab.select(F.col("id").alias("b"),
                         F.col("label").alias("lb")), "b")
    )
    cut = (
        tagged.filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("label"), "weight")
        .unionByName(
            tagged.filter(F.col("la") != F.col("lb"))
            .select(F.col("lb").alias("label"), "weight")
        )
        .groupBy("label")
        .agg(F.sum("weight").alias("cut"))
    )
    vol = (
        tagged.select(F.col("la").alias("label"), "weight")
        .unionByName(tagged.select(F.col("lb").alias("label"), "weight"))
        .groupBy("label")
        .agg(F.sum("weight").alias("vol"))
    )
    sz = _sizes(lab)
    n = lab.count()
    total_vol = float(
        g.edges.agg(F.coalesce(F.sum("weight") * 2, F.lit(0.0))
                    .alias("t")).collect()[0]["t"]
    )
    base = (
        sz.join(cut, "label", "left")
        .join(vol, "label", "left")
        .select(
            "label", "csize",
            F.coalesce("cut", F.lit(0.0)).alias("cut"),
            F.coalesce("vol", F.lit(0.0)).alias("vol"),
        )
    )
    if mode == "conductance":
        den = F.least(F.col("vol"), F.lit(total_vol) - F.col("vol"))
        value = F.when(den > 0, F.col("cut") / den).otherwise(0.0)
    else:
        den = F.least(F.col("csize"), F.lit(n) - F.col("csize"))
        value = F.col("cut") / den
    per = base.withColumn("value", value)
    return per.select("label", "value"), _summary(
        per.select("label", "value"), per.select("label", "csize"), n
    )


def isolated_interpartition_conductance(g, labels):
    return _isolated_interpartition(g, labels, "conductance")


def isolated_interpartition_expansion(g, labels):
    return _isolated_interpartition(g, labels, "expansion")


def partition_fragmentation(
    g: Graph, labels: DataFrame
) -> tuple[DataFrame, dict]:
    from networkit_spark.operators.components import connected_components

    lab = labels.select("id", "label")
    cc, _ = connected_components(g)
    ints = (
        lab.join(cc.withColumnRenamed("label", "comp"), "id")
        .groupBy("label", "comp")
        .agg(F.count("*").alias("isz"))
    )
    sz = _sizes(lab)
    per = (
        ints.groupBy("label")
        .agg(F.max("isz").alias("biggest"))
        .join(sz, "label")
        .select(
            "label", "csize",
            (1.0 - F.col("biggest") / F.col("csize")).alias("value"),
        )
    )
    n = lab.count()
    return per.select("label", "value"), _summary(
        per.select("label", "value"), per.select("label", "csize"), n
    )


def stable_partition_nodes(
    g: Graph, labels: DataFrame
) -> tuple[DataFrame, dict, float]:
    """((id, stable), per-cluster summary, overall stable fraction)."""
    lab = labels.select("id", "label")
    nbr = (
        g.adj()
        .join(lab.withColumnRenamed("id", "src")
              .withColumnRenamed("label", "own"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "lv"), "dst")
        .groupBy(F.col("src").alias("id"), F.col("own").alias("own"),
                 F.col("lv").alias("lv"))
        .agg(F.sum("weight").alias("w"))
    )
    per_node = nbr.groupBy("id", "own").agg(
        F.coalesce(
            F.sum(F.when(F.col("lv") == F.col("own"), F.col("w"))),
            F.lit(0.0),
        ).alias("own_w"),
        F.coalesce(
            F.max(F.when(F.col("lv") != F.col("own"), F.col("w"))),
            F.lit(0.0),
        ).alias("other_max"),
    ).select(
        "id",
        ((F.col("own_w") > 0) & (F.col("other_max") < F.col("own_w")))
        .alias("stable"),
    )
    stable = (
        lab.join(per_node, "id", "left")
        .select(
            "id", "label",
            F.coalesce("stable", F.lit(True)).alias("stable"),
        )
    )
    per = (
        stable.groupBy("label")
        .agg(
            (F.sum(F.col("stable").cast("int")) / F.count("*"))
            .alias("value"),
            F.count("*").alias("csize"),
        )
    )
    n = lab.count()
    summ = _summary(per.select("label", "value"),
                    per.select("label", "csize"), n)
    frac = float(
        stable.agg(
            (F.sum(F.col("stable").cast("int")) / F.count("*")).alias("f")
        ).collect()[0]["f"]
    )
    return stable.select("id", "stable"), summ, frac


def cover_f1_similarity(
    g: Graph, cover: DataFrame, reference: DataFrame
) -> tuple[DataFrame, dict]:
    cov = cover.select("id", F.col("subset").alias("c"))
    ref = reference.select("id", F.col("subset").alias("r"))
    csz = cov.groupBy("c").agg(F.count("*").alias("csize"))
    rsz = ref.groupBy("r").agg(F.count("*").alias("rsize"))
    ov = cov.join(ref, "id").groupBy("c", "r").agg(
        F.count("*").alias("ov")
    )
    f1 = (
        ov.join(csz, "c").join(rsz, "r")
        .select(
            "c", "csize",
            (
                2.0
                * ((F.col("ov") / F.col("rsize"))
                   * (F.col("ov") / F.col("csize")))
                / ((F.col("ov") / F.col("rsize"))
                   + (F.col("ov") / F.col("csize")))
            ).alias("f1"),
        )
        .groupBy("c", "csize")
        .agg(F.max("f1").alias("value"))
    )
    per = (
        csz.join(f1.select("c", "value"), "c", "left")
        .select(
            F.col("c").alias("label"), "csize",
            F.coalesce("value", F.lit(0.0)).alias("value"),
        )
    )
    memberships = cov.count()
    return per.select("label", "value"), _summary(
        per.select("label", "value"), per.select("label", "csize"),
        memberships,
    )


def partition_intersection(
    p1: DataFrame, p2: DataFrame
) -> DataFrame:
    """(id, label) — product partition with dense intersection labels
    (PartitionIntersection.cpp; labels ordered by (label1, label2))."""
    from networkit_spark.plans.ids import dense_ids

    joined = (
        p1.select("id", F.col("label").alias("l1"))
        .join(p2.select("id", F.col("label").alias("l2")), "id")
    )
    classes = dense_ids(
        joined.select("l1", "l2").distinct(), ["l1", "l2"], "label"
    )
    return joined.join(classes, ["l1", "l2"]).select("id", "label")


def hashing_overlapper(partitions: list[DataFrame]) -> DataFrame:
    """(id, label) — the overlap (finest common coarsening cell
    structure) of several partitions.

    Reference: overlap/HashingOverlapper.cpp:13-80 — combines the input
    clusterings by hashing the per-node label tuple (djb2 over packed
    ids).  The hash only serves to give each distinct label TUPLE one
    id (collisions aside); we produce the same cell structure with
    DENSE intersection labels by folding
    :func:`partition_intersection` over the list (documented
    deviation: dense ids instead of djb2 values — partitions are
    equal up to relabeling, and the dense form is deterministic with
    no collision risk)."""
    if not partitions:
        raise ValueError("No clustering provided!")
    out = partitions[0]
    for p in partitions[1:]:
        out = partition_intersection(out, p)
    return out
