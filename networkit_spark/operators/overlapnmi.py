"""OverlappingNMIDistance — NMI dissimilarity between two covers
(overlapping clusterings), McDaid et al. 2011.

Reference: /root/reference/networkit/cpp/community/OverlappingNMIDistance
.cpp:13-268 and include/.../OverlappingNMIDistance.hpp:32-42 —
  - cluster sizes / pairwise intersection sizes over node memberships
    (:14-35);
  - binary-indicator entropies: h(w, n) = -w*log2(w/n) for w > 0,
    entropy(s, n) = h(s, n) + h(n-s, n) (:37-60);
  - H*(X_i|Y_j) with the McDaid correction — use H(X_i) when
    h(a)+h(d) < h(b)+h(c) (:62-80);
  - H(X_i|Y) initialized to H(X_i) (non-intersecting pairs never
    lower it — the documented deviation from the pure math, :84-125);
  - MI = 0.5*(H(X)-H(X|Y)+H(Y)-H(Y|X)), normalization default MAX,
    dissimilarity = 1 - nmi with the empty-cover edge cases
    (:150-205, :207-268).

Spark-first: sizes are two hash aggregations, intersections one
membership self-join + agg; every per-(i, j) H* is a codegen
projection; the per-i minimum is a struct-min agg; only the final
scalar entropy sums reach the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

NORMALIZATIONS = (
    "min", "geometric_mean", "arithmetic_mean", "max", "joint_entropy"
)


def _h(w, n):
    """Column form of h(w, n) = -w * log2(w/n) for w > 0 else 0."""
    w = w.cast("double")
    return F.when(w > 0, -w * F.log2(w / F.lit(float(n)))).otherwise(
        F.lit(0.0)
    )


def overlapping_nmi_distance(
    g: Graph,
    zeta: DataFrame,
    eta: DataFrame,
    normalization: str = "max",
) -> float:
    """Dissimilarity in [0, 1] between covers ``zeta``/``eta`` given as
    (id, subset) membership relations (a node may appear in several
    subsets; a plain partition is the single-membership special case,
    OverlappingNMIDistance.cpp:207-210)."""
    if normalization not in NORMALIZATIONS:
        raise ValueError(f"unknown normalization {normalization!r}")
    n = g.nodes().count()
    zx = zeta.select("id", F.col("subset").alias("i"))
    zy = eta.select("id", F.col("subset").alias("j"))
    sx = zx.groupBy("i").agg(F.count("*").alias("xi"))
    sy = zy.groupBy("j").agg(F.count("*").alias("yj"))
    x_empty = sx.isEmpty()
    y_empty = sy.isEmpty()
    if x_empty != y_empty:
        return 1.0  # one empty, covers differ (:243-246)
    if x_empty and y_empty:
        return 0.0  # both empty (:247-249)

    inter = (
        zx.join(zy, "id")
        .groupBy("i", "j")
        .agg(F.count("*").alias("r"))
        .join(sx, "i")
        .join(sy, "j")
    )
    # H*(X_i|Y_j) (adjustedConditionalEntropy, :62-80)
    a = F.lit(n) + F.col("r") - F.col("xi") - F.col("yj")
    b = F.col("yj") - F.col("r")
    c = F.col("xi") - F.col("r")
    d = F.col("r")
    h_a, h_b, h_c, h_d = (_h(e, n) for e in (a, b, c, d))
    ent_yj = _h(F.col("yj"), n) + _h(F.lit(n) - F.col("yj"), n)
    ent_xi = _h(F.col("xi"), n) + _h(F.lit(n) - F.col("xi"), n)
    star_xy = F.when(
        h_a + h_d >= h_b + h_c, h_a + h_b + h_c + h_d - ent_yj
    ).otherwise(ent_xi)
    star_yx = F.when(
        h_a + h_d >= h_b + h_c, h_a + h_b + h_c + h_d - ent_xi
    ).otherwise(ent_yj)
    pairs = inter.select(
        "i", "j", star_xy.alias("sxy"), star_yx.alias("syx")
    )

    # per-subset entropy + the per-i/per-j minima stay distributed
    # (covers can hold O(n) subsets); only four scalars reach the driver
    ent_xi_col = _h(F.col("xi"), n) + _h(F.lit(n) - F.col("xi"), n)
    ent_yj_col = _h(F.col("yj"), n) + _h(F.lit(n) - F.col("yj"), n)
    # H(X_i|Y) starts at H(X_i); intersecting Y_j may lower it (:84-125)
    condx_row = (
        sx.join(pairs.groupBy("i").agg(F.min("sxy").alias("m")), "i", "left")
        .select(
            F.least(
                ent_xi_col, F.coalesce("m", F.lit(float("inf")))
            ).alias("c"),
            ent_xi_col.alias("e"),
        )
        .agg(F.sum("c").alias("cond"), F.sum("e").alias("ent"))
        .collect()[0]
    )
    condy_row = (
        sy.join(pairs.groupBy("j").agg(F.min("syx").alias("m")), "j", "left")
        .select(
            F.least(
                ent_yj_col, F.coalesce("m", F.lit(float("inf")))
            ).alias("c"),
            ent_yj_col.alias("e"),
        )
        .agg(F.sum("c").alias("cond"), F.sum("e").alias("ent"))
        .collect()[0]
    )
    entropy_x, cond_x_given_y = float(condx_row["ent"]), float(condx_row["cond"])
    entropy_y, cond_y_given_x = float(condy_row["ent"]), float(condy_row["cond"])
    mi = 0.5 * (
        entropy_x - cond_x_given_y + entropy_y - cond_y_given_x
    )
    return 1.0 - _normalize(normalization, mi, entropy_x, entropy_y)


def _normalize(normalization: str, mi: float, hx: float, hy: float) -> float:
    """normalize(...) with the clamp/edge rules (:150-205)."""
    hx, hy = max(hx, 0.0), max(hy, 0.0)
    if hx == 0.0 and hy == 0.0:
        return 1.0
    if (hx == 0.0 or hy == 0.0) and normalization in (
        "min", "geometric_mean"
    ):
        return 0.0
    if normalization == "min":
        nmi = mi / min(hx, hy)
    elif normalization == "geometric_mean":
        nmi = mi / math.sqrt(hx * hy)
    elif normalization == "arithmetic_mean":
        nmi = 2 * mi / (hx + hy)
    elif normalization == "max":
        nmi = mi / max(hx, hy)
    else:  # joint_entropy
        denom = hx + hy - mi
        nmi = mi / denom if denom != 0 else 0.0
    if math.isnan(nmi):
        nmi = 0.0
    return min(max(nmi, 0.0), 1.0)
