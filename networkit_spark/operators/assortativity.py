"""Assortativity — numeric (Pearson over edge endpoints) and nominal.

Reference: /root/reference/networkit/cpp/correlation/Assortativity.cpp:33-102.

  - numeric attribute (Assortativity.cpp:73-99): r = Pearson correlation
    of (attr[u], attr[v]) over the edge list, each stored edge visited
    ONCE with its stored endpoint order (forEdges) — NOT symmetrized.
  - nominal / partition (Assortativity.cpp:34-71): k x k matrix e_ij of
    label-pair edge fractions (undirected edges with different labels
    count toward BOTH e_ij and e_ji, same-label edges once — so the
    matrix sums to > 1 on undirected graphs; reference behavior kept
    exactly), r = (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i)
    with a/b the row/column sums.

Spark plan: pure hash aggregations over the edge relation — two shuffles
total (attribute join + scalar agg), no iteration, no UDFs. The Pearson
terms are accumulated as plain sums (sum x, sum y, sum xy, sum x^2,
sum y^2, m) and combined driver-side with the reference's formula —
with integer-valued attributes (e.g. degrees) every sum is exact, so
the coefficient is bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _edge_attrs(g: Graph, attribute: DataFrame) -> DataFrame:
    """(x, y) = (attr[src], attr[dst]) per stored edge (forEdges order)."""
    a = attribute.select(F.col("id"), F.col("value").cast("double"))
    return (
        g.edges.select("src", "dst")
        .join(a.select(F.col("id").alias("src"), F.col("value").alias("x")), "src")
        .join(a.select(F.col("id").alias("dst"), F.col("value").alias("y")), "dst")
        .select("x", "y")
    )


def assortativity(g: Graph, attribute: DataFrame) -> float:
    """Numeric-attribute assortativity (Assortativity.cpp:73-99).
    ``attribute`` is (id, value); every node incident to an edge must
    have a value (inner join mirrors the reference's hard requirement
    of one entry per node)."""
    xy = _edge_attrs(g, attribute)
    row = xy.agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    m = row["m"]
    if m == 0:
        return float("nan")
    a = row["sxy"] - row["sx"] * row["sy"] / m
    b = row["sxx"] - row["sx"] * row["sx"] / m
    c = row["syy"] - row["sy"] * row["sy"] / m
    return a / math.sqrt(b * c) if b > 0 and c > 0 else float("nan")


def degree_assortativity(g: Graph) -> float:
    """Degree assortativity = numeric assortativity with attr = degree
    (the reference's canonical use, correlation/test/
    CorrelationGTest.cpp)."""
    attr = g.degrees().select("id", F.col("degree").alias("value"))
    return assortativity(g, attr)


def nominal_assortativity(g: Graph, labels: DataFrame) -> float:
    """Partition assortativity (Assortativity.cpp:34-71). ``labels`` is
    (id, label)."""
    lab = labels.select("id", "label")
    pairs = (
        g.edges.select("src", "dst")
        .join(lab.select(F.col("id").alias("src"), F.col("label").alias("lu")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("lv")), "dst")
        .select("lu", "lv")
    )
    if not g.directed:
        # different-label undirected edges enter the matrix in both
        # orientations (Assortativity.cpp:44-45)
        pairs = pairs.unionByName(
            pairs.filter(F.col("lu") != F.col("lv")).select(
                F.col("lv").alias("lu"), F.col("lu").alias("lv")
            )
        )
    e = pairs.groupBy("lu", "lv").agg(F.count("*").alias("cnt"))
    m = g.number_of_edges()
    if m == 0:
        return float("nan")
    diag = e.filter(F.col("lu") == F.col("lv")).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("s")
    ).collect()[0]["s"]
    arow = e.groupBy("lu").agg(F.sum("cnt").alias("ra"))
    bcol = e.groupBy("lv").agg(F.sum("cnt").alias("rb"))
    ab = (
        arow.join(bcol, arow.lu == bcol.lv)
        .agg(F.sum(F.col("ra").cast("double") * F.col("rb")).alias("s"))
        .collect()[0]["s"]
    )
    diag_frac = diag / m
    ab_frac = (ab or 0.0) / (m * m)
    if ab_frac == 1.0:
        return float("nan")
    return (diag_frac - ab_frac) / (1.0 - ab_frac)
