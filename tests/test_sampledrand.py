"""Sampled Rand measures vs a driver-side replica of the derandomized
draws (SampledNodeStructuralRandMeasure.cpp:17-48,
SampledGraphStructuralRandMeasure.cpp:17-50)."""

from __future__ import annotations

import hashlib

from networkit_spark.graph import Graph
from networkit_spark.operators.partitions import (
    sampled_graph_structural_rand,
    sampled_node_structural_rand,
)


def _draw(seed, *parts):
    h = hashlib.md5(
        "|".join([seed] + [str(p) for p in parts]).encode()
    ).hexdigest()
    return int(h[:13], 16)


def _build(spark):
    n = 17
    edges = [(i, (i * 3 + 1) % n) for i in range(n) if i != (i * 3 + 1) % n]
    edges = sorted({(min(u, v), max(u, v)) for u, v in edges})
    g = Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=False,
        weighted=True,
    )
    zeta = {i: i % 3 for i in range(n)}
    eta = {i: (i * 7) % 4 for i in range(n)}
    zdf = spark.createDataFrame(list(zeta.items()), "id long, label long")
    edf = spark.createDataFrame(list(eta.items()), "id long, label long")
    return g, edges, zeta, eta, zdf, edf, n


def _agree(zeta, eta, u, v):
    return (zeta[u] == zeta[v] and eta[u] == eta[v]) or (
        zeta[u] != zeta[v] and eta[u] != eta[v]
    )


def test_node_structural_matches_replica(spark):
    g, _, zeta, eta, zdf, edf, n = _build(spark)
    S = 60
    got, s = sampled_node_structural_rand(g, zdf, edf, S)
    # ids are already 0..n-1, so rank == id
    agree = cnt = 0
    for i in range(S):
        u = _draw("snr-u", i) % n
        v = _draw("snr-v", i) % n
        if u == v:
            continue
        cnt += 1
        agree += _agree(zeta, eta, u, v)
    assert s == cnt
    assert abs(got - (1.0 - agree / cnt)) < 1e-12


def test_graph_structural_matches_replica(spark):
    g, edges, zeta, eta, zdf, edf, n = _build(spark)
    nbrs = {i: [] for i in range(n)}
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    S = 60
    got, s = sampled_graph_structural_rand(g, zdf, edf, S)
    agree = cnt = 0
    for i in range(S):
        u = _draw("sgr-u", i) % n
        if not nbrs[u]:
            continue
        v = min(nbrs[u], key=lambda x: (_draw("sgr-v", i, x), x))
        cnt += 1
        agree += _agree(zeta, eta, u, v)
    assert s == cnt
    assert abs(got - (1.0 - agree / cnt)) < 1e-12
