"""Similarity search over an embedding column (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline — dot products via
    JVM-side ``F.zip_with`` + ``F.aggregate`` (no Python in the loop),
    window row_number for per-query top-k. O(n^2) pairs: fine for
    fixtures/verification, and the exact oracle for the scale path.
  - LSH-bucketed (random-hyperplane signatures): each vector hashed to a
    B-bit bucket by deterministic pseudo-random hyperplanes (seeded,
    reproducible); candidates = same-bucket pairs across T tables, then
    exact cosine re-rank. This is the 100 TB path: the self-join is on
    (table, bucket), never all-pairs.

An IVF variant (k-means coarse quantizer) is approximated here by the
same bucket-join skeleton with buckets from vector sign-patterns; a
true trained quantizer would slot into `bucket_expr` without changing
the join shape.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def with_normalized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds ``vnorm`` (double) and ``vec`` (array<double>); zero vectors
    keep norm 0 and are excluded from cosine joins."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("vec", v).withColumn("vnorm", _norm_col(F.col("vec")))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(a, b, cosine) all pairs with cosine >= threshold (a < b) —
    embedding-cosine near-duplicate detection, exact."""
    n = with_normalized(df, vec_col).select(
        F.col(id_col).alias("id"), "vec", "vnorm"
    ).filter(F.col("vnorm") > 0)
    x = n.alias("x")
    y = n.alias("y")
    return (
        x.join(y, F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.round(
                _dot(F.col("x.vec"), F.col("y.vec"))
                / (F.col("x.vnorm") * F.col("y.vnorm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) exact top-k per query
    (self-matches excluded). Brute force: broadcast the smaller side in
    practice; ties broken by ascending neighbor id (deterministic)."""
    q = with_normalized(queries, vec_col).select(
        F.col(id_col).alias("qid"), F.col("vec").alias("qvec"), F.col("vnorm").alias("qn")
    ).filter(F.col("qn") > 0)
    c = with_normalized(corpus, vec_col).select(
        F.col(id_col).alias("nid"), F.col("vec").alias("nvec"), F.col("vnorm").alias("nn")
    ).filter(F.col("nn") > 0)
    scored = (
        q.join(c, F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(_dot(F.col("qvec"), F.col("nvec")) / (F.col("qn") * F.col("nn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"),
                "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table, bucket) — random-hyperplane LSH: bucket = sign bits
    of <v, h_j>. Hyperplanes generated driver-side (seeded) and folded
    into the plan as literals; all math JVM-side."""
    n = with_normalized(df, vec_col)
    dim = len(n.select("vec").first()["vec"])
    out = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, t, seed)
        bucket = F.lit(0).cast("long")
        for j, h in enumerate(planes):
            arr = F.array(*[F.lit(float(v)) for v in h])
            dot = _dot(F.col("vec"), arr)
            bucket = bucket + F.when(dot > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
        part = n.select(
            F.col(id_col).alias("id"), F.lit(t).alias("table"), bucket.alias("bucket")
        )
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate self-join top-k: same-bucket candidates (any table)
    re-ranked by exact cosine. Recall grows with ``tables``; the join is
    equi on (table, bucket) — shuffle O(n·tables), never O(n^2)."""
    sig = lsh_signatures(df, id_col, vec_col, bits, tables, seed)
    cand = (
        sig.alias("x")
        .join(sig.alias("y"), ["table", "bucket"])
        .filter(F.col("x.id") != F.col("y.id"))
        .select(F.col("x.id").alias("qid"), F.col("y.id").alias("nid"))
        .distinct()
    )
    n = with_normalized(df, vec_col).select(
        F.col(id_col).alias("id"), "vec", "vnorm"
    ).filter(F.col("vnorm") > 0)
    scored = (
        cand.join(n.select(F.col("id").alias("qid"), F.col("vec").alias("qvec"),
                           F.col("vnorm").alias("qn")), "qid")
        .join(n.select(F.col("id").alias("nid"), F.col("vec").alias("nvec"),
                       F.col("vnorm").alias("nn")), "nid")
        .select("qid", "nid",
                F.round(_dot(F.col("qvec"), F.col("nvec")) / (F.col("qn") * F.col("nn")), 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"),
                "cosine", "rank")
    )
