"""Edge-score family — hand-computed fixtures plus reference-replica
comparisons (reference: networkit/cpp/edgescores/*,
networkit/cpp/sparsification/*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.edgescores import (
    chance_corrected_triangle_score,
    edge_score_as_weight,
    edge_score_blender,
    edge_score_linearizer,
    edge_score_normalizer,
    forest_fire_score,
    geometric_mean_score,
    multiscale_score,
    prefix_jaccard_score,
    quadrangle_edge_score,
    random_edge_score,
    random_node_edge_score,
    random_sparsifier,
    scan_structural_similarity_score,
    simmelian_overlap_score,
    simmelian_sparsifier_non_parametric,
    simmelian_sparsifier_parametric,
    simrank_score,
)
from networkit_spark.operators.triangles import triangle_edge_score

pytestmark = pytest.mark.usefixtures("spark")

# K4 on {0,1,2,3}, bridge 3-4, triangle 4-5-6, pendant 6-7
EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (3, 4), (4, 5), (4, 6), (5, 6), (6, 7),
]
DEG = {0: 3, 1: 3, 2: 3, 3: 4, 4: 3, 5: 2, 6: 3, 7: 1}
N = 8


def _mk(spark, edges=None):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in (edges or EDGES)],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=False)


def _scores(df):
    return {
        (int(r["src"]), int(r["dst"])): float(r["score"])
        for r in df.collect()
    }


def _tri_counts():
    nbr = {u: set() for u in DEG}
    for u, v in EDGES:
        nbr[u].add(v)
        nbr[v].add(u)
    return {e: len(nbr[e[0]] & nbr[e[1]]) for e in EDGES}, nbr


def test_quadrangle_edge_score(spark):
    got = _scores(quadrangle_edge_score(_mk(spark)))
    # K4: 3 distinct 4-cycles, every K4 edge lies on exactly 2
    for e in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        assert got[e] == 2, (e, got[e])
    # everything outside the K4 is quadrangle-free
    for e in [(3, 4), (4, 5), (4, 6), (5, 6), (6, 7)]:
        assert got[e] == 0, (e, got[e])


def test_scan_and_chance_corrected(spark):
    g = _mk(spark)
    tri, _ = _tri_counts()
    scan = _scores(scan_structural_similarity_score(g))
    ccs = _scores(chance_corrected_triangle_score(g))
    for (u, v), t in tri.items():
        e = (min(u, v), max(u, v))
        assert scan[e] == pytest.approx(
            (t + 1) / np.sqrt((DEG[u] + 1) * (DEG[v] + 1))
        )
        if t > 0:
            assert ccs[e] == pytest.approx(
                t * (N - 2) / ((DEG[u] - 1) * (DEG[v] - 1))
            )
        elif DEG[u] == 1 or DEG[v] == 1:
            assert ccs[e] == 1.0
        else:
            assert ccs[e] == 0.0


def test_geometric_mean_score(spark):
    g = _mk(spark)
    attr = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        (F.col("src") + F.col("dst")).cast("double").alias("att"),
    )
    got = _scores(geometric_mean_score(g, attr))
    att = {(min(u, v), max(u, v)): u + v for u, v in EDGES}
    sums = {u: 0.0 for u in DEG}
    for (u, v), a in att.items():
        sums[u] += a
        sums[v] += a
    for (u, v), a in att.items():
        assert got[(u, v)] == pytest.approx(a / np.sqrt(sums[u] * sums[v]))


def _prefix_jaccard_replica(att, nbr):
    """Reference PrefixJaccardScore loop, driver-side."""
    ranks = {}
    for ego in nbr:
        inc = sorted(
            ((att[(min(ego, w), max(ego, w))], w) for w in nbr[ego]),
            key=lambda t: (-t[0], t[1]),
        )
        cur_rank, cur_val, equals = 0, None, 0
        out = {}
        for a, w in inc:
            if a != cur_val:
                cur_rank += equals
                cur_val = a
                equals = 1
            else:
                equals += 1
            out[w] = cur_rank
        ranks[ego] = out
    res = {}
    for u, v in att:
        best = 0.0
        max_rank = max(
            list(ranks[u].values()) + list(ranks[v].values()) + [0]
        )
        for r in range(max_rank + 1):
            A = {w for w, rk in ranks[u].items() if rk <= r and w != v}
            B = {w for w, rk in ranks[v].items() if rk <= r and w != u}
            if A | B:
                best = max(best, len(A & B) / len(A | B))
        res[(u, v)] = best
    return res


def test_prefix_jaccard_matches_replica(spark):
    g = _mk(spark)
    tri, nbr = _tri_counts()
    att = {(min(u, v), max(u, v)): float(t) for (u, v), t in tri.items()}
    attr = spark.createDataFrame(
        [(u, v, a) for (u, v), a in att.items()],
        "src long, dst long, att double",
    )
    got = _scores(prefix_jaccard_score(g, attr))
    want = _prefix_jaccard_replica(att, nbr)
    assert got.keys() == want.keys()
    for e in want:
        assert got[e] == pytest.approx(want[e]), e


def test_simmelian_overlap_matches_replica(spark):
    g = _mk(spark)
    tri, nbr = _tri_counts()
    att = {(min(u, v), max(u, v)): t for (u, v), t in tri.items()}
    for max_rank in (0, 1, 2):
        got = _scores(simmelian_overlap_score(g, max_rank))
        # replica: prefix intersection of triangle-ranked neighborhoods
        ranks = {}
        for ego in nbr:
            inc = sorted(
                ((att[(min(ego, w), max(ego, w))], w) for w in nbr[ego]),
                key=lambda t: (-t[0], t[1]),
            )
            cur_rank, cur_val, equals = 0, None, 0
            out = {}
            for a, w in inc:
                if a != cur_val:
                    cur_rank += equals
                    cur_val = a
                    equals = 1
                else:
                    equals += 1
                out[w] = cur_rank
            ranks[ego] = out
        for u, v in att:
            A = {w for w, rk in ranks[u].items() if rk <= max_rank and w != v}
            B = {w for w, rk in ranks[v].items() if rk <= max_rank and w != u}
            assert got[(u, v)] == len(A & B), (u, v, max_rank)


def test_multiscale_score(spark):
    g = _mk(spark)
    attr = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.lit(1.0).alias("att"),
    )
    got = _scores(multiscale_score(g, attr))
    for u, v in EDGES:
        e = (min(u, v), max(u, v))
        pu = 1.0 - (1.0 - 1.0 / DEG[u]) ** (DEG[u] - 1)
        pv = 1.0 - (1.0 - 1.0 / DEG[v]) ** (DEG[v] - 1)
        assert got[e] == pytest.approx(max(pu, pv)), e


def test_normalizer_linearizer_blender_asweight(spark):
    g = _mk(spark)
    attr = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        (F.col("src") * 10 + F.col("dst")).cast("double").alias("att"),
    )
    norm = _scores(edge_score_normalizer(g, attr, lower=0.0, upper=1.0))
    assert min(norm.values()) == 0.0 and max(norm.values()) == 1.0
    inv = _scores(edge_score_normalizer(g, attr, invert=True))
    lo_edge = min(_scores(attr.withColumnRenamed("att", "score")),
                  key=lambda e: e[0] * 10 + e[1])
    assert inv[lo_edge] == 1.0

    lin = _scores(edge_score_linearizer(g, attr))
    m = len(EDGES)
    assert sorted(lin.values()) == pytest.approx(
        [i / (m - 1) for i in range(m)]
    )
    # attribute here is unique per edge -> position follows attribute
    order = sorted(lin, key=lambda e: lin[e])
    atts = [e[0] * 10 + e[1] for e in order]
    assert atts == sorted(atts)

    sel = attr.select(
        "src", "dst", (F.col("src") == 0).alias("sel")
    )
    blended = _scores(
        edge_score_blender(
            attr, attr.withColumn("att", F.col("att") * 2), sel
        )
    )
    for (u, v), s in blended.items():
        want = (u * 10 + v) * (2 if u == 0 else 1)
        assert s == want

    gw = edge_score_as_weight(
        g, attr.withColumnRenamed("att", "score"), squared=False,
        offset=1.0, factor=2.0,
    )
    w = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in gw.edges.collect()
    }
    assert w[(0, 1)] == 1.0 + 2.0 * 1.0
    assert gw.weighted


def test_simrank_matches_dense_replica(spark):
    g = _mk(spark)
    iters, c = 3, 0.8
    got = _scores(simrank_score(g, c=c, iterations=iters))
    # dense replica
    nbr = {u: [] for u in range(N)}
    for u, v in EDGES:
        nbr[u].append(v)
        nbr[v].append(u)
    s = np.eye(N)
    for _ in range(iters):
        new = np.eye(N)
        for u in range(N):
            for v in range(N):
                if u == v:
                    continue
                acc = sum(s[a, b] for a in nbr[u] for b in nbr[v])
                new[u, v] = c * acc / (len(nbr[u]) * len(nbr[v]))
        s = new
    for u, v in EDGES:
        e = (min(u, v), max(u, v))
        assert got[e] == pytest.approx(s[u, v]), e


def test_random_scores_deterministic(spark):
    g = _mk(spark)
    a = _scores(random_edge_score(g, seed=5))
    b = _scores(random_edge_score(g, seed=5))
    c = _scores(random_edge_score(g, seed=6))
    assert a == b and a != c
    assert all(0.0 <= v < 1.0 for v in a.values())

    rne = _scores(random_node_edge_score(g, seed=3))
    m = len(EDGES)
    assert sorted(rne.values()) == pytest.approx([i / m for i in range(m)])


def test_forest_fire_score(spark):
    g = _mk(spark)
    got = _scores(
        forest_fire_score(g, pf=0.7, target_burnt_ratio=1.0, seed=2,
                          batch=16)
    )
    assert set(got) == {(min(u, v), max(u, v)) for u, v in EDGES}
    assert max(got.values()) == 1.0
    assert all(0.0 <= v <= 1.0 for v in got.values())
    again = _scores(
        forest_fire_score(g, pf=0.7, target_burnt_ratio=1.0, seed=2,
                          batch=16)
    )
    assert got == again


def test_sparsifier_chains(spark):
    g = _mk(spark)
    m = len(EDGES)
    assert random_sparsifier(g, 0.0, seed=1).edges.count() == m
    assert random_sparsifier(g, 1.01, seed=1).edges.count() == 0
    # non-parametric Simmelian at threshold 0 keeps everything
    assert simmelian_sparsifier_non_parametric(g, 0.0).edges.count() == m
    # parametric with absurd overlap keeps nothing
    assert simmelian_sparsifier_parametric(g, 2, 99).edges.count() == 0
    # K4 edges have overlap >= 1 at rank 2 (two shared triangle partners)
    kept = {
        (min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
        for r in simmelian_sparsifier_parametric(g, 2, 1).edges.collect()
    }
    assert {(0, 1), (0, 2), (1, 2), (2, 3), (4, 5), (5, 6)} <= kept
    assert (6, 7) not in kept and (3, 4) not in kept
