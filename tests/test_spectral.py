"""Spectral helpers + SpectralColoring (reference networkit/coloring.py
+ networkit/algebraic.py semantics under the documented dense-eigh /
sign-canonicalization contract)."""

from __future__ import annotations

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.spectral import (
    adjacency_eigenvector_power,
    adjacency_eigenvectors,
    spectral_coloring,
)

pytestmark = pytest.mark.usefixtures("spark")

PAIRS = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4), (4, 5),
         (5, 6), (4, 6), (6, 7), (7, 8), (0, 8), (2, 6), (1, 5)]


def _dense(n, pairs):
    a = np.zeros((n, n))
    for u, v in pairs:
        a[u, v] = 1
        a[v, u] = 1
    return a


def test_adjacency_eigenvectors_solve_the_eigenproblem(spark):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    vals, vecs = adjacency_eigenvectors(g)
    a = _dense(9, PAIRS)
    assert len(vals) == 9 - 2  # reference default cutoff = n - 3
    assert vals == sorted(vals)
    for lam, vec in zip(vals, vecs):
        v = np.array(vec)
        assert np.linalg.norm(a @ v - lam * v) < 1e-9
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        # sign canonicalization: max-|entry| coordinate positive
        assert v[int(np.argmax(np.abs(v)))] > 0
    # reverse=True returns the bottom of the spectrum
    low, _ = adjacency_eigenvectors(g, cutoff=1, reverse=True)
    w = np.linalg.eigvalsh(a)
    assert low == pytest.approx([w[0], w[1]], abs=1e-9)


def test_spectral_coloring_is_valid_and_deterministic(spark):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    col, nc = spectral_coloring(g)
    cmap = {int(r["id"]): int(r["color"]) for r in col.collect()}
    assert len(cmap) == 9
    for u, v in PAIRS:
        assert cmap[u] != cmap[v]
    assert nc == len(set(cmap.values()))
    col2, nc2 = spectral_coloring(g)
    assert nc2 == nc
    assert {
        (int(r["id"]), int(r["color"])) for r in col2.collect()
    } == set(cmap.items())


def test_spectral_coloring_directed_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        spectral_coloring(g)


def test_power_iteration_matches_dense_top2(spark):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    lams, block = adjacency_eigenvector_power(g, k=2, iters=60, seed=1)
    a = _dense(9, PAIRS)
    want = sorted(abs(x) for x in sorted(np.linalg.eigvalsh(a), key=abs)[-2:])
    got = sorted(abs(x) for x in lams)
    assert got == pytest.approx(want, abs=1e-4)
    # the block is orthonormal: Gram == I
    rows = block.collect()
    b = np.zeros((9, 2))
    for r in rows:
        b[int(r["id"]), int(r["j"])] = float(r["x"])
    assert np.allclose(b.T @ b, np.eye(2), atol=1e-8)


def test_laplacian_eigenvectors_bottom_of_spectrum(spark):
    from networkit_spark.operators.spectral import laplacian_eigenvectors

    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4)]
    g = Graph.from_pandas(spark, pairs, n=5)
    vals, vecs = laplacian_eigenvectors(g, cutoff=1, reverse=True)
    a = _dense(5, pairs)
    lap = np.diag(a.sum(axis=1)) - a
    w = np.linalg.eigvalsh(lap)
    assert vals == pytest.approx([w[0], w[1]], abs=1e-9)
    assert abs(vals[0]) < 1e-9  # connected graph: lambda_1 = 0
    for lam, vec in zip(vals, vecs):
        v = np.array(vec)
        assert np.linalg.norm(lap @ v - lam * v) < 1e-9
