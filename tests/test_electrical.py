"""Effective resistance / commute time / spanning edge centrality —
closed-form fixtures (series/parallel) and dense pseudo-inverse checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.electrical import (
    commute_time_distance,
    effective_resistance,
    spanning_edge_centrality,
)

pytestmark = pytest.mark.usefixtures("spark")


def _g(spark, pairs):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=False, weighted=False)


def _pairs(spark, pl):
    return spark.createDataFrame(
        [(f"{u}_{v}", u, v) for u, v in pl], "tag string, u long, v long"
    )


def test_path_series_resistance(spark):
    # path 0-1-2: r(0,1) = 1, r(0,2) = 2 (resistors in series)
    g = _g(spark, [(0, 1), (1, 2)])
    r = {
        (int(x["u"]), int(x["v"])): float(x["resistance"])
        for x in effective_resistance(
            g, _pairs(spark, [(0, 1), (0, 2)]), iters=150
        ).collect()
    }
    assert abs(r[(0, 1)] - 1.0) < 1e-3
    assert abs(r[(0, 2)] - 2.0) < 1e-3


def test_triangle_parallel_resistance(spark):
    # triangle: 1 Ohm in parallel with 2 Ohm in series -> 2/3
    g = _g(spark, [(0, 1), (1, 2), (0, 2)])
    r = float(
        effective_resistance(
            g, _pairs(spark, [(0, 1)]), iters=150
        ).first()["resistance"]
    )
    assert abs(r - 2.0 / 3.0) < 1e-3


def test_pseudo_inverse_parity(spark):
    import numpy as np

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 4)]
    n = 5
    L = np.zeros((n, n))
    for u, v in pairs:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    Lp = np.linalg.pinv(L)
    g = _g(spark, pairs)
    tests = [(0, 3), (1, 4), (0, 4)]
    got = {
        (int(x["u"]), int(x["v"])): float(x["resistance"])
        for x in effective_resistance(g, _pairs(spark, tests), iters=200).collect()
    }
    for u, v in tests:
        e = np.zeros(n)
        e[u], e[v] = 1.0, -1.0
        want = float(e @ Lp @ e)
        assert abs(got[(u, v)] - want) < 1e-3, ((u, v), got[(u, v)], want)


def test_commute_time_scales_resistance(spark):
    g = _g(spark, [(0, 1), (1, 2), (0, 2)])  # vol = 6
    ctd = float(
        commute_time_distance(
            g, _pairs(spark, [(0, 1)]), iters=150
        ).first()["ctd"]
    )
    assert abs(ctd - (6 * 2.0 / 3.0) ** 0.5) < 1e-2


def test_spanning_edge_full_and_sampled(spark):
    g = _g(spark, [(0, 1), (1, 2), (0, 2)])
    full = spanning_edge_centrality(g, iters=150).collect()
    assert len(full) == 3
    for r in full:
        assert abs(float(r["score"]) - 2.0 / 3.0) < 1e-3
    sub = spanning_edge_centrality(g, sample=2, iters=60).collect()
    assert len(sub) == 2


def test_bridge_has_unit_resistance(spark):
    # a bridge's effective resistance is exactly 1 (every spanning tree
    # uses it -> SEC = 1, the reference's interpretation)
    g = _g(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    r = float(
        effective_resistance(
            g, _pairs(spark, [(2, 3)]), iters=150
        ).first()["resistance"]
    )
    assert abs(r - 1.0) < 1e-3
