"""GedWalk — exhaustive-greedy replica, pruned-mode guard, invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.gedwalk import gedwalk

pytestmark = pytest.mark.usefixtures("spark")

PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (5, 6), (6, 4),
    (0, 7), (7, 8), (3, 9),
]
N = 10
LEVELS = 3


def _mk(spark, pairs=PAIRS):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=False, weighted=False)


def _ged_score(pairs, n, S, alpha, levels=LEVELS):
    adj = {u: [] for u in range(n)}
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    hit = [1.0 if i in S else 0.0 for i in range(n)]
    miss = [1.0 - h for h in hit]
    total, ap = 0.0, 1.0
    for _ in range(levels):
        ap *= alpha
        nh, nm = [0.0] * n, [0.0] * n
        for u in range(n):
            if u in S:
                nh[u] = sum(hit[v] + miss[v] for v in adj[u])
            else:
                nh[u] = sum(hit[v] for v in adj[u])
                nm[u] = sum(miss[v] for v in adj[u])
        hit, miss = nh, nm
        total += ap * sum(hit)
    return total


def _greedy(pairs, n, k, alpha):
    S, prev, picks = [], 0.0, []
    for r in range(k):
        best = None
        for c in range(n):
            if c in S:
                continue
            sc = _ged_score(pairs, n, set(S + [c]), alpha)
            key = (round(sc - prev, 6), -c)
            if best is None or key > best[0]:
                best = (key, c, sc)
        S.append(best[1])
        picks.append((r + 1, best[1], best[2] - prev, best[2]))
        prev = best[2]
    return picks


def test_gedwalk_matches_exhaustive_greedy(spark):
    g = _mk(spark)
    deg = {}
    for u, v in PAIRS:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    alpha = 1.0 / (1.0 + max(deg.values()))
    got = [
        (int(r["rank"]), int(r["id"]), float(r["gain"]),
         float(r["group_score"]))
        for r in gedwalk(g, k=3, levels=LEVELS).orderBy("rank").collect()
    ]
    want = _greedy(PAIRS, N, 3, alpha)
    assert [(a, b) for a, b, _, _ in got] == [(a, b) for a, b, _, _ in want]
    for (_, _, gg, gs), (_, _, wg, ws) in zip(got, want):
        assert abs(gg - wg) < 1e-6 and abs(gs - ws) < 1e-6


def test_gedwalk_pruned_mode_guard(spark):
    # on a near-regular ring the geometric estimates barely separate:
    # a tiny candidate budget must fail LOUDLY, never silently
    ring = [(i, (i + 1) % 12) for i in range(12)]
    g = _mk(spark, ring)
    with pytest.raises(AssertionError, match="candidate budget"):
        gedwalk(g, k=1, levels=2, candidates=1)


def test_gedwalk_pruned_mode_star(spark):
    # on a star the hub's estimate dominates: C=1 is provably enough
    star = [(0, i) for i in range(1, 9)]
    g = _mk(spark, star)
    out = gedwalk(g, k=1, levels=2, candidates=1).collect()
    assert int(out[0]["id"]) == 0


def test_gedwalk_gains_monotone_nonincreasing(spark):
    g = _mk(spark)
    gains = [
        float(r["gain"])
        for r in gedwalk(g, k=3, levels=LEVELS).orderBy("rank").collect()
    ]
    # submodularity of GED (GedWalk.cpp:383-386)
    assert all(gains[i] >= gains[i + 1] - 1e-9 for i in range(len(gains) - 1))
