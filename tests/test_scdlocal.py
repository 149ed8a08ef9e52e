"""TCE / LocalTightnessExpansion / CliqueDetect / CombinedSCD vs
driver-side heap replicas of the reference pop semantics.

The replicas implement the sequential shell-heap algorithms of
/root/reference/networkit/cpp/scd/TCE.cpp and
LocalTightnessExpansion.cpp verbatim (lazy heap with stale-entry
skipping, pops in (score DESC, id ASC) order, rejected pops discarded
until a later neighbour acceptance re-inserts them), under the
documented cross-engine determinism spec (scores rounded to 9 decimals
for ordering, ties to the smallest id).  The Spark operators collapse
each between-acceptance stretch into one aggregation + ordered pick;
these tests pin that collapse to the sequential semantics.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.scdlocal import (
    clique_detect,
    combined_scd,
    lte_expand,
    tce_expand,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mkgraph(spark, edges, weighted=False):
    df = spark.createDataFrame(
        [(int(u), int(v), float(w)) for u, v, w in edges],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


def _adj(edges):
    adjm: dict[int, dict[int, float]] = defaultdict(dict)
    for u, v, w in edges:
        if u == v:
            continue
        adjm[u][v] = float(w)
        adjm[v][u] = float(w)
    return adjm


def replica_tce(edges, seeds, refine=False, jaccard=False):
    adjm = _adj(edges)
    wd = {u: sum(n.values()) for u, n in adjm.items()}
    deg = {u: len(n) for u, n in adjm.items()}

    def score(u, v):
        nom = adjm[u][v] + sum(
            min(adjm[u][z], adjm[v][z]) for z in adjm[u] if z in adjm[v]
        )
        den = (wd[u] + wd[v] - nom) if jaccard else min(wd[u], wd[v])
        if wd.get(v, 0.0) <= 0.0 or den * deg[v] <= 0.0:
            return 0.0
        return nom / (den * deg[v])

    com = {int(s) for s in seeds}
    node_score: dict[int, float] = defaultdict(float)
    cut_e: dict[int, float] = defaultdict(float)
    vol = sum(wd.get(u, 0.0) for u in com)
    cut = sum(
        w for u in com for v, w in adjm.get(u, {}).items() if v not in com
    )
    shell: set[int] = set()
    heap: list[tuple[float, int]] = []

    def push(v):
        heapq.heappush(heap, (-round(node_score[v], 9), v))

    for u in sorted(com):
        for v, w in adjm.get(u, {}).items():
            if v in com:
                continue
            node_score[v] += score(u, v)
            cut_e[v] += w
    for v in node_score:
        shell.add(v)
        push(v)

    while heap:
        key, v = heapq.heappop(heap)
        if v not in shell or -key != round(node_score[v], 9):
            continue
        shell.discard(v)
        wdv = wd[v]
        margin = round(
            (cut + wdv - 2.0 * cut_e[v]) / (vol + wdv)
            - (cut / vol if vol > 0 else float("inf")),
            9,
        )
        if margin < 0:
            com.add(v)
            cut = cut + wdv - 2.0 * cut_e[v]
            vol = vol + wdv
            for x, w in adjm[v].items():
                if x in com:
                    continue
                node_score[x] += score(v, x)
                cut_e[x] += w
                shell.add(x)
                push(x)

    if refine:
        for u in sorted(com):
            if len(com) <= 1:
                break
            uvol = wd.get(u, 0.0)
            uchg = sum(
                (w if x in com else -w)
                for x, w in adjm.get(u, {}).items()
            )
            new_cut, new_vol = cut + uchg, vol - uvol
            old_q = cut / vol if vol > 0 else float("inf")
            new_q = new_cut / new_vol if new_vol > 0 else float("inf")
            if round(new_q - old_q, 9) < 0:
                com.discard(u)
                cut, vol = new_cut, new_vol
    return com


def replica_lte(edges, seeds, alpha=1.0):
    adjm = _adj(edges)
    wd2 = {
        u: (1.0 + sum(w * w for w in n.values())) ** 0.5
        for u, n in adjm.items()
    }

    def sim(u, v):
        tri = sum(
            adjm[u][z] * adjm[v][z] for z in adjm[u] if z in adjm[v]
        )
        return (2.0 * adjm[u][v] + tri) / (wd2[u] * wd2[v])

    com = {int(s) for s in seeds}

    def int_ext(v):
        i = sum(sim(v, u) for u in adjm.get(v, {}) if u in com)
        e = sum(sim(v, u) for u in adjm.get(v, {}) if u not in com)
        return i, e

    sim_i = sum(
        sim(u, v)
        for u in com
        for v in adjm.get(u, {})
        if v in com
    )
    sim_e = sum(
        sim(u, v)
        for u in com
        for v in adjm.get(u, {})
        if v not in com
    )
    shell: set[int] = set()
    heap: list[tuple[float, int]] = []

    def push(v):
        heapq.heappush(heap, (-round(int_ext(v)[0], 9), v))

    for u in com:
        for v in adjm.get(u, {}):
            if v not in com:
                shell.add(v)
    for v in shell:
        push(v)

    while heap:
        key, v = heapq.heappop(heap)
        i_s, e_s = int_ext(v)
        if v not in shell or -key != round(i_s, 9):
            continue
        shell.discard(v)
        if i_s <= 0:
            continue
        if sim_i == 0.0:
            ok = sim_e > 0.0
        else:
            ok = (
                round(
                    sim_e / sim_i
                    - (alpha * e_s - i_s) / (2.0 * i_s),
                    9,
                )
                > 0
            )
        if ok:
            com.add(v)
            sim_i += 2.0 * i_s
            sim_e += e_s - i_s
            for x in adjm[v]:
                if x in com:
                    continue
                shell.add(x)
                push(x)
    return com


TWO_CLUSTER = [
    # K4 on 0-3, K4 on 10-13, one bridge 3-10
    (0, 1, 1), (0, 2, 1), (0, 3, 1), (1, 2, 1), (1, 3, 1), (2, 3, 1),
    (10, 11, 1), (10, 12, 1), (10, 13, 1), (11, 12, 1), (11, 13, 1),
    (12, 13, 1), (3, 10, 1),
]

BARBELL_NOISE = [
    (0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1),
    (3, 5, 1), (5, 6, 1), (6, 7, 1), (7, 8, 1), (6, 8, 1), (8, 0, 1),
    (1, 4, 1),
]

WEIGHTED = [
    (0, 1, 3.0), (0, 2, 2.5), (1, 2, 2.0), (2, 3, 0.5), (3, 4, 1.5),
    (3, 5, 2.0), (4, 5, 1.0), (5, 6, 0.25), (6, 0, 0.75),
]


def _ids(df):
    return {int(r["id"]) for r in df.collect()}


@pytest.mark.parametrize(
    "edges,weighted,seeds",
    [
        (TWO_CLUSTER, False, [0]),
        (TWO_CLUSTER, False, [10, 11]),
        (BARBELL_NOISE, False, [2]),
        (WEIGHTED, True, [0]),
    ],
)
def test_tce_matches_replica(spark, edges, weighted, seeds):
    g = _mkgraph(spark, edges, weighted)
    com, cond, _ = tce_expand(g, seeds)
    assert _ids(com) == replica_tce(edges, seeds)
    assert 0.0 <= cond <= 1.0 or cond == float("inf")


def test_tce_jaccard_and_refine_match_replica(spark):
    g = _mkgraph(spark, TWO_CLUSTER, False)
    com_j, _, _ = tce_expand(g, [0], jaccard=True)
    assert _ids(com_j) == replica_tce(TWO_CLUSTER, [0], jaccard=True)
    com_r, _, _ = tce_expand(g, [0, 3, 10], refine=True)
    assert _ids(com_r) == replica_tce(TWO_CLUSTER, [0, 3, 10], refine=True)


@pytest.mark.parametrize(
    "edges,weighted,seeds",
    [
        (TWO_CLUSTER, False, [0]),
        (TWO_CLUSTER, False, [12]),
        (BARBELL_NOISE, False, [6]),
        (WEIGHTED, True, [3]),
    ],
)
def test_lte_matches_replica(spark, edges, weighted, seeds):
    g = _mkgraph(spark, edges, weighted)
    com, _ = lte_expand(g, seeds)
    assert _ids(com) == replica_lte(edges, seeds)


def test_lte_alpha_tightens(spark):
    g = _mkgraph(spark, TWO_CLUSTER, False)
    loose, _ = lte_expand(g, [0], alpha=0.5)
    tight, _ = lte_expand(g, [0], alpha=2.0)
    assert _ids(tight) <= _ids(loose)
    assert _ids(tight) == replica_lte(TWO_CLUSTER, [0], alpha=2.0)
    assert _ids(loose) == replica_lte(TWO_CLUSTER, [0], alpha=0.5)


def test_clique_detect_picks_max_clique_in_neighborhood(spark):
    # N(0) = {1,2,3,4,5}; {1,2,3} forms a triangle, {4,5} only an edge
    edges = [
        (0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 1), (0, 5, 1),
        (1, 2, 1), (1, 3, 1), (2, 3, 1), (4, 5, 1), (5, 6, 1),
    ]
    g = _mkgraph(spark, edges, False)
    assert _ids(clique_detect(g, [0])) == {0, 1, 2, 3}


def test_clique_detect_multi_seed_common_neighbors(spark):
    # common neighbours of {0, 9}: {1, 2, 4}; {1, 2} adjacent
    edges = [
        (0, 1, 1), (0, 2, 1), (0, 4, 1), (0, 5, 1),
        (9, 1, 1), (9, 2, 1), (9, 4, 1),
        (1, 2, 1), (5, 6, 1),
    ]
    g = _mkgraph(spark, edges, False)
    assert _ids(clique_detect(g, [0, 9])) == {0, 9, 1, 2}


def test_clique_detect_weighted_prefers_heavy_clique(spark):
    # two triangles in N(0): {1,2} light, {3,4} heavy
    edges = [
        (0, 1, 1.0), (0, 2, 1.0), (1, 2, 0.5),
        (0, 3, 1.0), (0, 4, 1.0), (3, 4, 5.0),
    ]
    g = _mkgraph(spark, edges, True)
    assert _ids(clique_detect(g, [0])) == {0, 3, 4}


def test_clique_detect_isolated_seed_returns_seed(spark):
    edges = [(1, 2, 1), (2, 3, 1)]
    g = _mkgraph(spark, edges, False)
    g2 = Graph(
        g.edges, spark.createDataFrame([(7,)], "id long"),
        directed=False, weighted=False,
    )
    assert _ids(clique_detect(g2, [7])) == {7}


def test_combined_scd_clique_then_tce(spark):
    g = _mkgraph(spark, TWO_CLUSTER, False)
    com = combined_scd(
        g, [0],
        lambda gr, s: clique_detect(gr, s),
        lambda gr, s: tce_expand(gr, s),
    )
    seeded = replica_tce(TWO_CLUSTER, sorted({0, 1, 2, 3}))
    assert _ids(com) == seeded
