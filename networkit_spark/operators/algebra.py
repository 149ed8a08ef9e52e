"""Algebraic graph module: sparse matrices as COO DataFrames.

Re-expresses the reference's linear-algebra surface —
`/root/reference/networkit/algebraic.py` (adjacencyMatrix :40-106,
laplacianMatrix :81-99, PageRankMatrix :100-137) and the
`networkit/cpp/algebraic/` matrix core (DenseMatrix/DynamicMatrix/
Vector arithmetic: add, scale, transpose, matrix-vector and
matrix-matrix products) — Spark-first.

Representation: a matrix is a DataFrame (i long, j long, v double)
holding the NONZERO entries (COO).  A vector is a DataFrame
(j long, v double), sparse with the same missing-means-zero rule.
This is the distributed analogue of the reference's scipy CSR: the
entry list IS the edge list, so matrix construction is a projection
of the graph's adjacency and every product is a join + partial
aggregation that Catalyst shuffles on the contraction index — the
plan a 100 TB edge table wants (no densification, no driver-side
matrix, map-side combine on the inner dimension).

Scale notes:
- spmv is ONE shuffle (hash on the inner index j) + hash aggregate;
  the vector side is broadcast when small.
- spmm on adjacency matrices materializes length-2 path counts —
  O(sum deg^2) entries.  That is inherent to A*A (same blow-up as the
  reference's scipy `A * A`), not a plan artifact; hub-heavy inputs
  should cap or sample upstream (documented, same guidance as
  operators/triangles.py which avoids A*A via oriented adjacency).
- Semantics match scipy assignment construction: input graphs are
  simple (deduped at ingest); a defensive groupBy-sum collapses any
  residual duplicate (i, j) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

_MAT_COLS = ("i", "j", "v")


def _canon(m: DataFrame) -> DataFrame:
    """Collapse duplicate coordinates and drop explicit zeros."""
    return (
        m.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .filter(F.col("v") != 0.0)
    )


def adjacency_matrix(g: Graph, weight_col: str | None = None) -> DataFrame:
    """A[u, v] = w for every edge, mirrored when undirected
    (algebraic.py:40-106 processEdge).  ``weight_col`` overrides the
    graph's weight column (lit 1.0 when unweighted and no override)."""
    adj = g.adj()
    if weight_col is not None:
        w = F.col(weight_col)
    elif g.weighted:
        w = F.col("weight")
    else:
        w = F.lit(1.0)
    return _canon(
        adj.select(
            F.col("src").cast("long").alias("i"),
            F.col("dst").cast("long").alias("j"),
            w.cast("double").alias("v"),
        )
    )


def laplacian_matrix(g: Graph, weight_col: str | None = None) -> DataFrame:
    """L = D - A with D[i, i] = sum_j A[i, j] over OFF-diagonal
    entries; diagonal entries of A are ignored, matching
    scipy.sparse.csgraph.laplacian used by algebraic.py:81-99."""
    a = adjacency_matrix(g, weight_col).filter(F.col("i") != F.col("j"))
    diag = (
        a.groupBy("i")
        .agg(F.sum("v").alias("v"))
        .select("i", F.col("i").alias("j"), "v")
    )
    off = a.select("i", "j", (-F.col("v")).alias("v"))
    return _canon(diag.unionByName(off))


def pagerank_matrix(g: Graph, damp: float = 0.85,
                    weight_col: str | None = None) -> DataFrame:
    """P = damp * A * diag(1/degree) + ((1-damp)/n) * I
    (algebraic.py:100-137).  Matches the reference exactly: the column
    scaling divides by the NEIGHBOR COUNT degree (not weighted degree),
    zero-degree columns stay zero, and the teleport term touches ONLY
    the diagonal (the reference adds a sparse scaled identity, not the
    dense 1/n matrix of the PageRank kernel — that distinction is the
    reference's own)."""
    n = g.number_of_nodes()
    a = adjacency_matrix(g, weight_col)
    degc = (
        g.adj()
        .groupBy(F.col("src").cast("long").alias("j"))
        .agg(F.count("*").alias("degc"))
    )
    stochastic = (
        a.join(degc, "j")
        .select("i", "j", (F.col("v") / F.col("degc")).alias("v"))
    )
    teleport = g.nodes().select(
        F.col("id").cast("long").alias("i"),
        F.col("id").cast("long").alias("j"),
        F.lit((1.0 - damp) / n).alias("v"),
    )
    return mat_add(stochastic, teleport, alpha=damp, beta=1.0)


def mat_transpose(m: DataFrame) -> DataFrame:
    return m.select(
        F.col("j").alias("i"), F.col("i").alias("j"), "v"
    )


def mat_scale(m: DataFrame, s: float) -> DataFrame:
    return m.select("i", "j", (F.col("v") * float(s)).alias("v"))


def mat_add(a: DataFrame, b: DataFrame,
            alpha: float = 1.0, beta: float = 1.0) -> DataFrame:
    """alpha*A + beta*B — union + one groupBy-sum (no join; overlapping
    coordinates combine in the aggregate)."""
    return _canon(
        mat_scale(a, alpha).unionByName(mat_scale(b, beta))
    )


def spmv(m: DataFrame, x: DataFrame) -> DataFrame:
    """y = M x; ``x``: (j, v) sparse.  Returns (i, v) sparse — rows
    whose dot product has no nonzero term are absent (missing-means-
    zero).  One shuffle on j, hash aggregate on i."""
    xv = x.select("j", F.col("v").alias("xv"))
    return (
        m.join(xv, "j")
        .groupBy("i")
        .agg(F.sum(F.col("v") * F.col("xv")).alias("v"))
    )


def spmm(a: DataFrame, b: DataFrame) -> DataFrame:
    """C = A B — join on the contraction index, aggregate per (i, k).
    Output size is O(paths), see module scale notes."""
    bk = b.select(
        F.col("i").alias("j"),
        F.col("j").alias("k"),
        F.col("v").alias("bv"),
    )
    return _canon(
        a.join(bk, "j")
        .select("i", F.col("k").alias("j"), (F.col("v") * F.col("bv")).alias("v"))
    )
