"""LocalMaxMatcher, ModularityScoring, NeighborhoodFunctionHeuristic —
replicas and invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import local_max_matching
from networkit_spark.operators.scoring import modularity_edge_score

pytestmark = pytest.mark.usefixtures("spark")


def _g(spark, triples, weighted=True):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in triples],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


def test_local_max_path_weights(spark):
    # path 0-1-2-3 with middle edge heaviest: match {1,2} then nothing
    g = _g(spark, [(0, 1, 1), (1, 2, 9), (2, 3, 1)])
    m, rounds = local_max_matching(g)
    got = sorted((int(r["u"]), int(r["v"])) for r in m.collect())
    assert got == [(1, 2)]


def test_local_max_two_rounds(spark):
    # path 0-1(5), 1-2(9), 2-3(8), 3-4(2): round 1 matches (1,2) only
    # (3 nominates the blocked edge (2,3)); round 2 matches (3,4)
    g = _g(spark, [(0, 1, 5), (1, 2, 9), (2, 3, 8), (3, 4, 2)])
    m, rounds = local_max_matching(g)
    got = sorted((int(r["u"]), int(r["v"])) for r in m.collect())
    assert got == [(1, 2), (3, 4)]
    assert rounds >= 2


def test_local_max_is_matching_and_maximal(spark):
    def h(*p):
        return int(hashlib.md5("|".join(map(str, p)).encode()).hexdigest()[:6], 16)

    triples = [
        (u, v, 1 + h("w", u, v) % 5)
        for u in range(20)
        for v in range(u + 1, 20)
        if h("e", u, v) % 100 < 15
    ]
    g = _g(spark, triples)
    m, _ = local_max_matching(g)
    pairs = [(int(r["u"]), int(r["v"])) for r in m.collect()]
    used = [x for p in pairs for x in p]
    assert len(used) == len(set(used))  # a matching
    # maximal: no live edge with both endpoints unmatched
    unmatched = set(range(20)) - set(used)
    for u, v, _w in triples:
        assert not (u in unmatched and v in unmatched), (u, v)


def test_modularity_scoring_formula(spark):
    g = _g(spark, [(0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1)])
    scores = {
        (int(r["src"]), int(r["dst"])): float(r["score"])
        for r in modularity_edge_score(g).collect()
    }
    W = 4.0
    deg = {0: 2, 1: 2, 2: 3, 3: 1}
    for (u, v), s in scores.items():
        want = 1.0 / W - (deg[u] / (2 * W)) * (deg[v] / (2 * W))
        assert abs(s - want) < 1e-12


def test_nf_heuristic_anchors_and_monotone(spark):
    from networkit_spark.operators.distancemisc import (
        neighborhood_function,
        neighborhood_function_heuristic,
    )

    def h(*p):
        return int(hashlib.md5("|".join(map(str, p)).encode()).hexdigest()[:6], 16)

    # connected: ring + chords
    n = 24
    triples = [(i, (i + 1) % n, 1) for i in range(n)] + [
        (u, v, 1)
        for u in range(n)
        for v in range(u + 2, n)
        if h("c", u, v) % 100 < 6
    ]
    g = _g(spark, list({(min(a, b), max(a, b), w) for a, b, w in triples}),
           weighted=False)
    est = {
        int(r["h"]): int(r["nf"])
        for r in neighborhood_function_heuristic(g, n_samples=6).collect()
    }
    exact = {
        int(r["h"]): int(r["nf"])
        for r in neighborhood_function(g).collect()
    }
    dia = max(exact)
    assert max(est) == dia
    m = g.number_of_edges()
    assert est[1] == 2 * m == exact[1]
    assert est[dia] == n * (n - 1) == exact[dia]
    vals = [est[h] for h in sorted(est)]
    assert vals == sorted(vals)  # cumulative is monotone


def test_hashing_overlapper_cells(spark):
    from networkit_spark.operators.partitionquality import hashing_overlapper

    p1 = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], "id long, label long"
    )
    p2 = spark.createDataFrame(
        [(i, i % 3) for i in range(8)], "id long, label long"
    )
    out = {
        int(r["id"]): int(r["label"])
        for r in hashing_overlapper([p1, p2]).collect()
    }
    # cells = distinct (i%2, i%3) tuples; same tuple -> same label
    tup = {i: (i % 2, i % 3) for i in range(8)}
    for i in range(8):
        for j in range(8):
            assert (out[i] == out[j]) == (tup[i] == tup[j]), (i, j)
    # single partition passes through
    solo = {
        int(r["id"]): int(r["label"])
        for r in hashing_overlapper([p1]).collect()
    }
    assert solo == {i: i % 2 for i in range(8)}
