"""LocalT / TwoPhaseL / RandomBFS / SCDGroundTruthComparison vs
driver-side replicas of the reference semantics (under the documented
determinism spec: smallest-id ties, 9-decimal rounded float margins,
md5 derandomization)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.scdmore import (
    localt_expand,
    random_bfs,
    scd_ground_truth_comparison,
    two_phase_l,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mkgraph(spark, pairs):
    df = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=False)


def _adj(pairs):
    a = defaultdict(set)
    for u, v in pairs:
        if u != v:
            a[u].add(v)
            a[v].add(u)
    return a


def _ids(df):
    return {int(r["id"]) for r in df.collect()}


def _tri_splits(a, com, v):
    """(int, semi, ext) triangle splits of v w.r.t. community com."""
    t_int = t_semi = t_ext = 0
    nb = sorted(a[v])
    for i, x in enumerate(nb):
        for y in nb[i + 1:]:
            if y in a[x]:
                k = (x in com) + (y in com)
                if k == 2:
                    t_int += 1
                elif k == 1:
                    t_semi += 1
                else:
                    t_ext += 1
    return t_int, t_semi, t_ext


def replica_localt(pairs, seeds, max_steps=64):
    a = _adj(pairs)
    com = {int(s) for s in seeds}
    for _ in range(max_steps):
        tri_i = sum(_tri_splits(a, com, u)[0] for u in com) // 3
        tri_e = sum(_tri_splits(a, com, u)[2] for u in com)
        cur = max(0, tri_i * (tri_i - tri_e))
        shell = sorted(
            {v for u in com for v in a[u] if v not in com}
        )
        best = None
        for v in shell:
            ti, ts, te = _tri_splits(a, com, v)
            new_i = tri_i + ti
            new_e = tri_e + te - ts
            score = max(0, new_i * (new_i - new_e))
            if score < cur:
                continue
            key = (-score, new_e, v)
            if best is None or key < best[0]:
                best = (key, v)
        if best is None:
            break
        com.add(best[1])
    return com


def _ieee(a, b):
    if b != 0:
        return a / b
    return math.inf if a > 0 else (-math.inf if a < 0 else math.nan)


def replica_twophasel(pairs, seeds, max_steps=64):
    a = _adj(pairs)
    seeds = {int(s) for s in seeds}
    com = set(seeds)

    def stats(c):
        w = sum(1 for u in c for v in a[u] if v in c and u < v)
        cut = sum(1 for u in c for v in a[u] if v not in c)
        bsz = sum(1 for u in c if any(v not in c for v in a[u]))
        return float(w), float(cut), bsz

    w_int, cut, bs = stats(com)
    for _ in range(max_steps):
        cur_lin = _ieee(2.0 * w_int, float(len(com)))
        cur_lex = _ieee(cut, float(bs))
        cur_l = _ieee(cur_lin, cur_lex)
        if math.isnan(cur_lin) or math.isnan(cur_l):
            break
        shell = sorted({v for u in com for v in a[u] if v not in com})
        best = None
        for v in shell:
            c2 = com | {v}
            w2, cut2, bs2 = stats(c2)
            n_lin = _ieee(2.0 * w2, float(len(c2)))
            n_lex = _ieee(cut2, float(bs2))
            n_l = _ieee(n_lin, n_lex)
            if math.isnan(n_l) or math.isnan(n_lin):
                continue
            if round(n_lin - cur_lin, 9) <= 0:
                continue
            gain = (
                (0.0 if (math.isinf(cur_l) and cur_l > 0) else 1.0)
                if math.isinf(n_l) and n_l > 0
                else round(n_l - cur_l, 9)
            )
            if gain <= 0:
                continue
            key = (-round(n_l, 9) if not math.isinf(n_l) else -math.inf,
                   v)
            if best is None or key < best[0]:
                best = (key, v)
        if best is None:
            break
        com.add(best[1])
        w_int, cut, bs = stats(com)

    for v in sorted(com):
        if v not in com:
            continue
        intdeg = float(sum(1 for x in a[v] if x in com))
        extdeg = float(sum(1 for x in a[v] if x not in com))
        cur_lin = _ieee(2.0 * w_int, float(len(com)))
        cur_lex = _ieee(cut, float(bs))
        n_lin = _ieee(2.0 * (w_int - intdeg), float(len(com) - 1))
        c2 = com - {v}
        _, _, bs2 = stats(c2) if c2 else (0.0, 0.0, 0)
        n_lex = _ieee(cut + intdeg - extdeg, float(bs2))
        d_lin = cur_lin - n_lin
        d_lex = cur_lex - n_lex
        keep = (
            not math.isnan(d_lin) and round(d_lin, 9) > 0
            and not math.isnan(d_lex) and round(d_lex, 9) < 0
        )
        if not keep:
            com.discard(v)
            if not com:
                break
            w_int, cut, bs = stats(com)
    if not seeds <= com:
        return set()
    return com


TWO_CLUSTER = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
    (3, 10),
]

MIXED = [
    (0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6),
    (6, 7), (7, 8), (6, 8), (8, 0), (1, 4), (2, 7),
]

TRIANGLE_FREE = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5)]


@pytest.mark.parametrize(
    "pairs,seeds",
    [
        (TWO_CLUSTER, [0]),
        (TWO_CLUSTER, [11, 12]),
        (MIXED, [2]),
        (MIXED, [6]),
    ],
)
def test_localt_matches_replica(spark, pairs, seeds):
    g = _mkgraph(spark, pairs)
    com, _ = localt_expand(g, seeds)
    assert _ids(com) == replica_localt(pairs, seeds)


def test_localt_triangle_free_cap(spark):
    g = _mkgraph(spark, TRIANGLE_FREE)
    com, rounds = localt_expand(g, [0], max_steps=3)
    assert _ids(com) == replica_localt(TRIANGLE_FREE, [0], max_steps=3)
    assert rounds == 3  # score-0 plateau absorbs up to the cap


@pytest.mark.parametrize(
    "pairs,seeds",
    [
        (TWO_CLUSTER, [0]),
        (TWO_CLUSTER, [13]),
        (MIXED, [3]),
        (MIXED, [7]),
        (TRIANGLE_FREE, [2]),
    ],
)
def test_twophasel_matches_replica(spark, pairs, seeds):
    g = _mkgraph(spark, pairs)
    com, _ = two_phase_l(g, seeds)
    assert _ids(com) == replica_twophasel(pairs, seeds)


def test_random_bfs_truncates_to_cover_size(spark):
    g = _mkgraph(spark, MIXED)
    cover = spark.createDataFrame(
        [(i, i % 2) for i in range(9)], "id long, subset long"
    )
    com = random_bfs(g, [0], cover)
    # subset of seed 0 has ceil(9/2)=5 members -> community size 5
    assert len(_ids(com)) == 5
    assert 0 in _ids(com)
    again = random_bfs(g, [0], cover)
    assert _ids(com) == _ids(again)


def test_ground_truth_comparison_exact_match(spark):
    g = _mkgraph(spark, TWO_CLUSTER)
    cover = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2, 3)]
        + [(i, 1) for i in (10, 11, 12, 13)],
        "id long, subset long",
    )
    found = spark.createDataFrame(
        [(0, i) for i in (0, 1, 2, 3)],
        "seed long, id long",
    )
    per_seed, avg = scd_ground_truth_comparison(g, cover, found)
    rows = {r["seed"]: r for r in per_seed.collect()}
    assert rows[0]["jaccard"] == 1.0 and rows[0]["f1"] == 1.0
    assert avg["precision"] == 1.0 and avg["recall"] == 1.0


def test_ground_truth_comparison_partial_and_seed_restriction(spark):
    g = _mkgraph(spark, TWO_CLUSTER)
    cover = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2, 3)]
        + [(i, 1) for i in (2, 3, 10, 11, 12, 13)],
        "id long, subset long",
    )
    # found community of seed 0 overlaps subset 1 more, but subset 1
    # does not contain the seed -> only subset 0 competes
    found = spark.createDataFrame(
        [(0, i) for i in (0, 2, 3, 10, 11, 12)],
        "seed long, id long",
    )
    per_seed, _ = scd_ground_truth_comparison(g, cover, found)
    r = per_seed.collect()[0]
    # subset 0: overlap {0,2,3} -> jacc 3/(6+4-3), prec 3/6, rec 3/4
    assert abs(r["jaccard"] - 3.0 / 7.0) < 1e-12
    assert abs(r["precision"] - 0.5) < 1e-12
    assert abs(r["recall"] - 0.75) < 1e-12
    per_seed2, _ = scd_ground_truth_comparison(
        g, cover, found, ignore_seeds=True
    )
    r2 = per_seed2.collect()[0]
    # with ignore_seeds subset 1 competes: overlap {2,3,10,11,12} = 5
    assert abs(r2["recall"] - 5.0 / 6.0) < 1e-12
