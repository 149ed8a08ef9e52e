"""Synthetic graph generators — distributed, deterministic, JVM-side.

Reference: networkit/cpp/generators/ (ErdosRenyiGenerator.cpp,
RmatGenerator.cpp — used by the reference's own tests, e.g.
CommunityGTest.cpp:58,206). The reference generates on one node with a
sequential RNG; at 10^12-document scale the generator itself must be a
distributed DataFrame job, so instead of an RNG stream we derive every
random draw from ``xxhash64(edge_id, seed, level)`` — a pure column
expression: deterministic for a given seed regardless of partitioning,
parallelism, or retries, and it never leaves the JVM (whole-stage
codegen, no Python, no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def rmat_edges(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) RMAT power-law digraph over 2**scale vertex ids.

    Recursive-matrix quadrant descent (Chakrabarti et al., SDM'04): at
    each of ``scale`` levels one uniform draw picks the quadrant, i.e.
    one bit of src and one bit of dst. Self-loops and duplicates are
    retained (callers canonicalize) — same contract as the reference's
    RmatGenerator. Runs as a single whole-stage-codegen projection over
    ``spark.range(n_edges)``: no shuffle, no Python, no driver memory.

    Codegen-friendly draw scheme: each level consumes an 8-bit slice of
    ``xxhash64(id, seed, level // 8)`` (so at most ceil(scale/8) hash
    evaluations per row) and the quadrant probabilities are quantized to
    1/256 integer thresholds — the whole projection is small integer
    arithmetic that stays inside one compiled codegen method. A naive
    per-level double-uniform formulation generates a kilobytes-deep
    expression tree that falls out of codegen and runs ~50x slower.
    """
    if scale > 56:
        raise ValueError("scale > 56 would exhaust the 64-bit draw stream")
    ta = round(a * 256)
    tab = round((a + b) * 256)
    tabc = round((a + b + c) * 256)
    df = spark.range(
        0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(level // 8))
        u = F.shiftrightunsigned(h, 8 * (level % 8)).bitwiseAND(F.lit(255))
        src_bit = F.when(u >= tab, F.lit(1)).otherwise(F.lit(0)).cast("long")
        dst_bit = (
            F.when(((u >= ta) & (u < tab)) | (u >= tabc), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select(src.alias("src"), dst.alias("dst"))


def erdos_renyi_edges(
    spark: SparkSession,
    n_nodes: int,
    n_edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) — n_edges uniform draws over n_nodes**2 (G(n, m)-style;
    the reference's ErdosRenyiGenerator is G(n, p) — at scale the edge
    *count* is what must be controlled, so we fix m = p*n^2)."""
    df = spark.range(0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return df.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)), F.lit(n_nodes)).alias("dst"),
    )


def rmat_graph(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    seed: int = 42,
    directed: bool = False,
    **kw,
):
    """Canonicalized simple Graph from :func:`rmat_edges` (self-loops
    dropped, duplicates merged, undirected-canonical src<dst)."""
    from networkit_spark.graph import Graph

    e = rmat_edges(spark, scale, n_edges, seed, **kw).filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    e = e.distinct().withColumn("weight", F.lit(1.0))
    return Graph(edges=e, vertices=None, directed=directed, weighted=False)


def clustered_random_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
) -> "Graph":
    """ClusteredRandomGraphGenerator
    (/root/reference/networkit/cpp/generators/ClusteredRandomGraphGenerator.cpp):
    n nodes in k equal blocks; intra-block pairs kept with prob p_in,
    inter-block with p_out. Deterministic via per-pair xxhash64 draws
    (same JVM-side trick as the RMAT generator). Pair enumeration is a
    range self-join — O(n^2) draws, so this is a FIXTURE/property-test
    generator (the reference's is too), not a web-scale path."""
    from networkit_spark.graph import Graph

    ids = spark.range(n).select(F.col("id").cast("long").alias("id"))
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    res = 1 << 24
    draw = F.pmod(
        F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(res)
    )
    same = (F.col("src") % k) == (F.col("dst") % k)
    thr_in = int(p_in * res)
    thr_out = int(p_out * res)
    edges = pairs.filter(
        (same & (draw < thr_in)) | (~same & (draw < thr_out))
    ).withColumn("weight", F.lit(1.0))
    vertices = ids
    return Graph(edges, vertices, directed=False, weighted=False)
