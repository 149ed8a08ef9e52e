"""Algebraic module (operators/algebra.py) vs dense numpy references —
the same checks scipy would pass for networkit/algebraic.py:40-137."""

from __future__ import annotations

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.algebra import (
    adjacency_matrix,
    laplacian_matrix,
    mat_add,
    mat_scale,
    mat_transpose,
    pagerank_matrix,
    spmm,
    spmv,
)

pytestmark = pytest.mark.usefixtures("spark")

N = 7
WEDGES = [(0, 1, 2.0), (1, 2, 0.5), (2, 3, 3.0), (0, 3, 1.25),
          (3, 4, 4.0), (4, 5, 0.75), (2, 5, 1.5), (0, 5, 2.25),
          (5, 6, 1.0)]


def _graph(spark, weighted=True, directed=False):
    rows = [(u, v, w) for u, v, w in WEDGES]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph(edges=edges, vertices=None, directed=directed,
                 weighted=weighted)


def _dense_a(weighted=True, directed=False):
    a = np.zeros((N, N))
    for u, v, w in WEDGES:
        val = w if weighted else 1.0
        a[u, v] = val
        if not directed:
            a[v, u] = val
    return a


def _to_dense(m, shape=(N, N)):
    out = np.zeros(shape)
    for r in m.collect():
        out[r["i"], r["j"]] = r["v"]
    return out


def _vec(spark, x):
    rows = [(int(j), float(v)) for j, v in enumerate(x)]
    return spark.createDataFrame(rows, "j long, v double")


def test_adjacency_matrix(spark):
    g = _graph(spark)
    np.testing.assert_allclose(_to_dense(adjacency_matrix(g)), _dense_a())
    gd = _graph(spark, directed=True)
    np.testing.assert_allclose(
        _to_dense(adjacency_matrix(gd)), _dense_a(directed=True)
    )
    gu = _graph(spark, weighted=False)
    np.testing.assert_allclose(
        _to_dense(adjacency_matrix(gu)), _dense_a(weighted=False)
    )


def test_laplacian_matrix(spark):
    g = _graph(spark)
    a = _dense_a()
    lap = np.diag(a.sum(axis=1)) - a
    np.testing.assert_allclose(_to_dense(laplacian_matrix(g)), lap)
    # Laplacian row sums vanish.
    assert np.allclose(_to_dense(laplacian_matrix(g)).sum(axis=1), 0.0)


def test_pagerank_matrix(spark):
    g = _graph(spark)
    a = _dense_a()
    degc = (a != 0).sum(axis=1).astype(float)
    p = 0.85 * a / degc[None, :] + 0.15 / N * np.eye(N)
    np.testing.assert_allclose(_to_dense(pagerank_matrix(g)), p)
    # Columns of the stochastic part sum to damp (weighted A scaled by
    # the unweighted neighbor count only when weights are 1) — check on
    # the unweighted graph where P is exactly column-stochastic-damped.
    gu = _graph(spark, weighted=False)
    pu = _to_dense(pagerank_matrix(gu))
    np.testing.assert_allclose(pu.sum(axis=0), 0.85 + 0.15 / N)


def test_spmv_spmm(spark):
    g = _graph(spark)
    a = _dense_a()
    x = np.array([((j * 37 + 11) % 97) / 97.0 for j in range(N)])
    am = adjacency_matrix(g)
    y = np.zeros(N)
    for r in spmv(am, _vec(spark, x)).collect():
        y[r["i"]] = r["v"]
    np.testing.assert_allclose(y, a @ x)
    np.testing.assert_allclose(_to_dense(spmm(am, am)), a @ a)


def test_transpose_add_scale(spark):
    gd = _graph(spark, directed=True)
    a = _dense_a(directed=True)
    am = adjacency_matrix(gd)
    np.testing.assert_allclose(_to_dense(mat_transpose(am)), a.T)
    np.testing.assert_allclose(_to_dense(mat_scale(am, -2.5)), -2.5 * a)
    sym = mat_add(am, mat_transpose(am), alpha=1.0, beta=1.0)
    np.testing.assert_allclose(_to_dense(sym), a + a.T)
    # alpha*A - alpha*A cancels to an EMPTY relation (explicit zeros
    # dropped).
    zero = mat_add(am, am, alpha=1.0, beta=-1.0)
    assert zero.count() == 0


def test_spmv_sparse_vector(spark):
    """Missing vector entries mean zero; result stays sparse."""
    g = _graph(spark)
    am = adjacency_matrix(g)
    x = spark.createDataFrame([(3, 1.0)], "j long, v double")
    got = {r["i"]: r["v"] for r in spmv(am, x).collect()}
    a = _dense_a()
    want = {i: a[i, 3] for i in range(N) if a[i, 3] != 0}
    assert got == pytest.approx(want)
