"""KadabraBetweenness: adaptive sample efficiency + error guarantee
(KadabraBetweenness.cpp absolute mode)."""

from __future__ import annotations

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.kadabra import kadabra_betweenness


def _wheel_edges(n):
    """Hub 0 + cycle 1..n-1: known high-betweenness hub."""
    e = [(0, i) for i in range(1, n)]
    e += [(i, i + 1) for i in range(1, n - 1)] + [(n - 1, 1)]
    return e


def test_fewer_samples_than_rk_at_equal_eps(spark):
    """The reference's headline: Kadabra's omega cap plus adaptive
    stopping consumes fewer sampled pairs than the RK ApproxBetweenness
    bound at equal (eps, delta)."""
    g = Graph.from_pandas(spark, _wheel_edges(16), n=16)
    eps, delta, vd = 0.25, 0.1, 6
    res, info = kadabra_betweenness(
        g, err=eps, delta=delta, vd=vd, start_factor=4, seed=1
    )
    r_rk = math.ceil(
        (1 / eps**2) * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
    )
    n_pairs = info.metrics[-1]["n_pairs"]
    assert n_pairs < r_rk
    assert info.converged


def test_error_bound_vs_exact(spark):
    """Every estimated score within err of the exact normalized
    betweenness (fraction of sampled-pair shortest paths through v)."""
    from networkit_spark.operators.betweenness import betweenness

    g = Graph.from_pandas(spark, _wheel_edges(12), n=12)
    err = 0.3
    res, info = kadabra_betweenness(
        g, err=err, delta=0.1, vd=6, start_factor=4, seed=2
    )
    exact, _ = betweenness(g, normalized=False)
    n = 12
    # kadabra estimates P(v interior of a random s-t shortest path) =
    # bc(v) / (n(n-1)); our exact betweenness sums over ORDERED pairs
    # (wheel hub = 77.0, checked), so no extra factor
    norm = {
        r["id"]: r["score"] / (n * (n - 1)) for r in exact.collect()
    }
    got = {r["id"]: r["score"] for r in res.collect()}
    for v in norm:
        assert abs(got[v] - norm[v]) <= err + 1e-9


def test_determinism(spark):
    g = Graph.from_pandas(spark, _wheel_edges(10), n=10)
    a, _ = kadabra_betweenness(g, err=0.3, delta=0.1, vd=6, start_factor=4,
                               seed=3)
    b, _ = kadabra_betweenness(g, err=0.3, delta=0.1, vd=6, start_factor=4,
                               seed=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tiny_graph_zeroes(spark):
    g = Graph.from_pandas(spark, [(0, 1)], n=2)
    res, info = kadabra_betweenness(g, err=0.3, delta=0.1, vd=6)
    assert all(r["score"] == 0.0 for r in res.collect())
