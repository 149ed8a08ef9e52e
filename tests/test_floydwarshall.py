"""FloydWarshall — python replica on seeded weighted digraphs,
negative-cycle tagging fixtures."""

from __future__ import annotations

import hashlib

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.floydwarshall import floyd_warshall

pytestmark = pytest.mark.usefixtures("spark")

NEG_INF = float("-inf")
INF = float("inf")


def _g(spark, triples, directed=True):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in triples],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=directed, weighted=True)


def _replica(triples, ids):
    idx = {u: i for i, u in enumerate(ids)}
    n = len(ids)
    d = [[INF] * n for _ in range(n)]
    for i in range(n):
        d[i][i] = 0.0
    for u, v, w in triples:
        d[idx[u]][idx[v]] = min(d[idx[u]][idx[v]], float(w))
    for k in range(n):
        for i in range(n):
            if d[i][k] == INF:
                continue
            for j in range(n):
                if d[k][j] == INF:
                    continue
                nd = d[i][k] + d[k][j]
                if nd < d[i][j]:
                    d[i][j] = nd
    # tag negative cycles like the reference
    for w in range(n):
        if d[w][w] >= 0:
            continue
        for i in range(n):
            if d[i][w] == INF:
                continue
            for j in range(n):
                if d[w][j] != INF:
                    d[i][j] = NEG_INF
    return {
        (ids[i], ids[j]): d[i][j]
        for i in range(n)
        for j in range(n)
        if d[i][j] != INF
    }


def test_unweighted_graph_rejected(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight double"
    )
    g = Graph(df, None, directed=True, weighted=False)
    with pytest.raises(ValueError, match="unweighted"):
        floyd_warshall(g)


def test_simple_weighted_digraph(spark):
    triples = [(0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 2), (2, 3, 6)]
    g = _g(spark, triples)
    d, cyc = floyd_warshall(g)
    got = {
        (int(r["u"]), int(r["v"])): float(r["dist"]) for r in d.collect()
    }
    want = _replica(triples, [0, 1, 2, 3])
    assert got == want
    assert got[(0, 1)] == 2.0 and got[(0, 3)] == 4.0
    assert cyc.count() == 0


def test_negative_edge_no_cycle(spark):
    triples = [(0, 1, 5), (1, 2, -3), (0, 2, 4)]
    g = _g(spark, triples)
    d, cyc = floyd_warshall(g)
    got = {
        (int(r["u"]), int(r["v"])): float(r["dist"]) for r in d.collect()
    }
    assert got[(0, 2)] == 2.0  # through the negative edge
    assert cyc.count() == 0


def test_negative_cycle_poisons_reachable_pairs(spark):
    # 1 -> 2 -> 1 with total weight -1; 0 feeds it, 3 drains it, 4 apart
    triples = [(0, 1, 1), (1, 2, 1), (2, 1, -2), (2, 3, 1), (4, 3, 1)]
    g = _g(spark, triples)
    d, cyc = floyd_warshall(g)
    got = {
        (int(r["u"]), int(r["v"])): float(r["dist"]) for r in d.collect()
    }
    for pair in [(0, 3), (0, 1), (1, 2), (1, 3), (2, 3), (1, 1), (2, 2)]:
        assert got[pair] == NEG_INF, pair
    assert got[(4, 3)] == 1.0  # avoids the cycle
    assert got[(4, 4)] == 0.0
    in_cyc = {int(r["id"]) for r in cyc.collect()}
    assert {1, 2}.issubset(in_cyc) and 0 in in_cyc and 3 in in_cyc
    assert 4 not in in_cyc


def test_seeded_replica(spark):
    ids = list(range(9))
    triples = []
    for u in ids:
        for v in ids:
            if u == v:
                continue
            h = hashlib.md5(f"fw|{u}|{v}".encode()).hexdigest()
            if int(h[:2], 16) < 70:
                triples.append((u, v, int(h[2:4], 16) % 9 - 1))
    g = _g(spark, triples)
    d, _ = floyd_warshall(g)
    got = {
        (int(r["u"]), int(r["v"])): float(r["dist"]) for r in d.collect()
    }
    assert got == _replica(triples, ids)
