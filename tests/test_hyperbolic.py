"""Hyperbolic random graph generator (T=0) vs a brute-force replica
(HyperbolicGenerator.cpp:37-56, HyperbolicSpace.cpp:61-92,
HyperbolicSpace.hpp:151-211)."""

from __future__ import annotations

import math

import pytest

from networkit_spark.sources.generators import (
    _py_md5_frac,
    hyperbolic_expected_degree,
    hyperbolic_graph,
    hyperbolic_target_radius,
)


def _brute(n, avg, plexp, seed):
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(float(n), n * avg / 2.0, alpha)
    cha_r = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2
    pts = []
    for i in range(n):
        th = 2 * math.pi * _py_md5_frac(f"hga|{seed}", i)
        u = 1 + (cha_r - 1) * _py_md5_frac(f"hgr|{seed}", i)
        r = math.log(u + math.sqrt(u * u - 1)) / alpha
        pts.append((th, r))
    cosh_r = (math.exp(R) + math.exp(-R)) / 2
    out = []
    for i in range(n):
        t1, r1 = pts[i]
        for j in range(i + 1, n):
            t2, r2 = pts[j]
            ch1, sh1 = (math.exp(r1) + math.exp(-r1)) / 2, (
                math.exp(r1) - math.exp(-r1)
            ) / 2
            ch2, sh2 = (math.exp(r2) + math.exp(-r2)) / 2, (
                math.exp(r2) - math.exp(-r2)
            ) / 2
            lhs = ch1 * ch2 - sh1 * sh2 * (
                math.cos(t1) * math.cos(t2) + math.sin(t1) * math.sin(t2)
            )
            if lhs <= cosh_r:
                out.append((i, j))
    return out, R, pts


@pytest.mark.parametrize("seed,n,avg", [(7, 300, 6.0), (11, 200, 10.0)])
def test_matches_bruteforce(spark, seed, n, avg):
    edges, pts, R = hyperbolic_graph(spark, n, avg_degree=avg, seed=seed)
    got = sorted((r["src"], r["dst"]) for r in edges.collect())
    want, R2, _ = _brute(n, avg, 3.0, seed)
    assert R == R2
    assert got == want


def test_radius_matches_expected_degree():
    R = hyperbolic_target_radius(10000.0, 10000 * 8 / 2.0, 1.0)
    assert hyperbolic_expected_degree(10000.0, 1.0, R) == pytest.approx(
        8.0, abs=0.011
    )


def test_points_in_disk(spark):
    edges, pts, R = hyperbolic_graph(spark, 150, avg_degree=4.0, seed=3)
    rows = pts.collect()
    assert len(rows) == 150
    for r in rows:
        assert 0.0 <= r["theta"] < 2 * math.pi
        assert 0.0 <= r["r"] <= R
        assert 0 <= r["band"] < 16
        assert 0 <= r["sector"] < 256


def test_guards(spark):
    with pytest.raises(ValueError):
        hyperbolic_graph(spark, 10, avg_degree=4.0, plexp=2.0)
    with pytest.raises(ValueError):
        hyperbolic_graph(spark, 10, avg_degree=20.0)
