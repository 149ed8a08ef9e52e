"""Link-prediction completion (linkprediction/KatzIndex.cpp,
AdjustedRandIndex.cpp, NeighborhoodDistanceIndex.hpp,
NeighborsMeasureIndex.hpp, SameCommunityIndex.cpp,
AlgebraicDistanceIndex.cpp, RandomLinkSampler.cpp, ROCMetric.cpp,
PrecisionRecallMetric.cpp).

Goldens replicate the reference gtest (LinkPredictionGTest.cpp): the
7-node fixture graph, its training split, the CN predictions, the ROC
curve/AUC (0.8125), the PR curve/AUC (0.5), the NeighborsMeasure values
(:194-201), and the AdjustedRand expected table on input/tiny_01.graph
(:264-281).
"""

from __future__ import annotations

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.linkpredmore import (
    adjusted_rand_index,
    algebraic_distance_index,
    evaluation_curve,
    katz_index,
    neighborhood_distance_index,
    neighbors_measure_index,
    random_link_sampler_by_count,
    random_link_sampler_by_percentage,
    same_community_index,
)

# LinkPredictionGTest::SetUp (:49-68)
G_EDGES = [(0, 1), (0, 3), (1, 2), (1, 4), (2, 3), (2, 4), (2, 5), (3, 4),
           (3, 5), (4, 5)]
TRAIN_EDGES = [e for e in G_EDGES if e not in [(0, 1), (2, 4), (3, 5)]]
# CN predictions on distance-2 missing links of the training graph
# (testCommonNeighborsIndexRunOn, :70-90)
PREDICTIONS = [(2, 4, 3.0), (1, 3, 2.0), (1, 5, 2.0), (3, 5, 2.0),
               (0, 2, 1.0), (0, 4, 1.0)]


def _graph(spark, edges, n=None):
    nodes = None
    if n is not None:
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"),
        vertices=nodes,
        directed=False,
        weighted=False,
    )


def _pairs(spark, pl):
    return spark.createDataFrame(pl, "u long, v long")


def test_roc_metric_golden(spark):
    """testROCMetric (:204-221): curve + AUC on the fixture split."""
    g = _graph(spark, G_EDGES, 7)
    preds = spark.createDataFrame(PREDICTIONS, "u long, v long, score double")
    pts, auc = evaluation_curve(preds, g, metric="roc")
    assert auc == pytest.approx(0.8125, abs=1e-12)
    assert [x for x, _ in pts] == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert [y for _, y in pts] == [0.5, 0.5, 1.0, 1.0, 1.0]


def test_pr_metric_golden(spark):
    """testPRMetric (:223-232)."""
    g = _graph(spark, G_EDGES, 7)
    preds = spark.createDataFrame(PREDICTIONS, "u long, v long, score double")
    pts, auc = evaluation_curve(preds, g, metric="pr")
    assert auc == pytest.approx(0.5, abs=1e-12)
    assert [x for x, _ in pts] == [0.0, 0.5, 1.0]
    assert pts[0][1] == pytest.approx(1.0)
    assert pts[1][1] == pytest.approx(1.0 / 3)
    assert pts[2][1] == pytest.approx(1.0 / 3)


def test_neighbors_measure_golden(spark):
    """testNeighborsMeasureIndexRun (:194-201) on the training graph."""
    g = _graph(spark, TRAIN_EDGES, 7)
    pairs = _pairs(spark, [(0, 2), (0, 4), (1, 3), (1, 5), (2, 4), (3, 5)])
    got = {
        (r["u"], r["v"]): r["score"]
        for r in neighbors_measure_index(g, pairs).collect()
    }
    assert got == {(0, 2): 1.0, (0, 4): 1.0, (1, 3): 2.0, (1, 5): 2.0,
                   (2, 4): 3.0, (3, 5): 2.0}


def test_adjusted_rand_tiny01_golden(spark):
    """testAdjustedRandIndex (:264-281): runAll() on input/tiny_01.graph
    — all ordered non-edge pairs (including self-pairs, which score 0
    via the run() guard), node-pair ascending, vs the expected table."""
    from networkit_spark.sources.graphio import read_metis

    g = read_metis(spark, "/root/reference/input/tiny_01.graph")
    edges = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    has = lambda i, j: (min(i, j), max(i, j)) in edges
    pair_list = [(i, j) for i in range(7) for j in range(7)
                 if i == j or not has(i, j)]
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adjusted_rand_index(g, _pairs(spark, pair_list)).collect()
    }
    expected = [0, -0.42, -0.54, -0.71, 0, -0.23, -0.54, -0.37, 0, -0.42,
                -0.54, -0.42, 0, -0.42, -0.23, -0.42, 0, -0.37, -0.54,
                -0.54, -0.42, 0, -0.71, -0.37, -0.54, -0.37, 0]
    ordered = sorted(pair_list)
    assert len(ordered) == len(expected)
    for (u, v), exp in zip(ordered, expected):
        assert got[(u, v)] == pytest.approx(exp, abs=0.01), (u, v)


def test_neighborhood_distance(spark):
    g = _graph(spark, TRAIN_EDGES, 7)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in neighborhood_distance_index(
            g, _pairs(spark, [(0, 2), (2, 4), (1, 3)])
        ).collect()
    }
    # training degrees: 0:1, 1:2, 2:3, 3:3, 4:3, 5:2
    assert got[(0, 2)] == pytest.approx(1 / math.sqrt(1 * 3))
    assert got[(2, 4)] == pytest.approx(3 / math.sqrt(3 * 3))
    assert got[(1, 3)] == pytest.approx(2 / math.sqrt(2 * 3))


def test_katz_index_brute(spark):
    """Katz vs a literal driver-side replica of KatzIndex::runImpl."""
    g = _graph(spark, G_EDGES, 7)
    adj = {i: [] for i in range(7)}
    for u, v in G_EDGES:
        adj[u].append(v)
        adj[v].append(u)
    deg = {i: len(adj[i]) for i in adj}

    def brute(u, v, L=5, damping=0.005):
        start = v if deg[u] > deg[v] else u
        end = u if start == v else v
        scores: dict[int, float] = {}
        frontier = [start]
        for lvl in range(1, L + 1):
            hits: dict[int, int] = {}
            for x in frontier:
                for w in adj[x]:
                    hits[w] = hits.get(w, 0) + 1
            for w, h in hits.items():
                scores[w] = scores.get(w, 0.0) + damping**lvl * h
            frontier = list(hits)
        return scores.get(end, 0.0)

    pair_list = [(u, v) for u in range(7) for v in range(u + 1, 7)]
    got = {
        (r["u"], r["v"]): r["score"]
        for r in katz_index(g, _pairs(spark, pair_list)).collect()
    }
    for u, v in pair_list:
        assert got[(u, v)] == pytest.approx(brute(u, v), rel=1e-12), (u, v)


def test_same_community_fixed_partition(spark):
    g = _graph(spark, G_EDGES, 7)
    part = spark.createDataFrame(
        [(i, i % 2) for i in range(7)], "id long, label long"
    )
    got = {
        (r["u"], r["v"]): r["score"]
        for r in same_community_index(
            g, _pairs(spark, [(0, 2), (0, 1), (3, 3)]), part
        ).collect()
    }
    assert got == {(0, 2): 1.0, (0, 1): 0.0, (3, 3): 0.0}


def test_same_community_plm_default(spark):
    """Default partition is PLM (SameCommunityIndex.cpp:16-19): scores
    are 0/1 and symmetric-consistent with the PLM labels."""
    from networkit_spark.operators.plm import plm

    g = _graph(spark, G_EDGES, 7)
    labels, _ = plm(g)
    lab = {r["id"]: r["label"] for r in labels.collect()}
    pair_list = [(0, 2), (1, 4), (2, 5)]
    got = {
        (r["u"], r["v"]): r["score"]
        for r in same_community_index(g, _pairs(spark, pair_list)).collect()
    }
    for u, v in pair_list:
        assert got[(u, v)] == (1.0 if lab[u] == lab[v] else 0.0)


def test_algebraic_distance_index_replica(spark):
    """Spark AD index vs a literal driver-side replica of the md5 loads
    + Jacobi iterations + p-norm."""
    import hashlib

    g = _graph(spark, G_EDGES, 7)
    K, iters, omega, seed = 3, 4, 0.5, 7

    def klong(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    loads = [
        [klong(f"ad|{seed}|{i}|{v}") / float(1 << 52) for v in range(7)]
        for i in range(K)
    ]
    adj = {i: [] for i in range(7)}
    for u, v in G_EDGES:
        adj[u].append(v)
        adj[v].append(u)
    for _ in range(iters):
        old = [row[:] for row in loads]
        for i in range(K):
            for u in range(7):
                if adj[u]:
                    val = sum(old[i][w] for w in adj[u]) / len(adj[u])
                    loads[i][u] = (1 - omega) * old[i][u] + omega * val
    pair_list = [(0, 5), (1, 3), (2, 4)]
    got = {
        (r["u"], r["v"]): r["score"]
        for r in algebraic_distance_index(
            g, _pairs(spark, pair_list), num_systems=K, num_iters=iters,
            omega=omega, norm=2, seed=seed,
        ).collect()
    }
    for u, v in pair_list:
        exp = sum(abs(loads[i][u] - loads[i][v]) ** 2 for i in range(K)) ** 0.5
        assert got[(u, v)] == pytest.approx(exp, rel=1e-9), (u, v)
    # max-norm variant
    got0 = {
        (r["u"], r["v"]): r["score"]
        for r in algebraic_distance_index(
            g, _pairs(spark, pair_list), num_systems=K, num_iters=iters,
            omega=omega, norm=0, seed=seed,
        ).collect()
    }
    for u, v in pair_list:
        exp = max(abs(loads[i][u] - loads[i][v]) for i in range(K))
        assert got0[(u, v)] == pytest.approx(exp, rel=1e-9)


def test_random_link_sampler(spark):
    """byPercentage keeps floor(p*m) edges (testTrainingGraphGenerator,
    :160-163: 10 edges * 0.7 -> 7); kept set is a subset and
    deterministic per seed."""
    g = _graph(spark, G_EDGES, 7)
    tr = random_link_sampler_by_percentage(g, 0.7, seed=3)
    kept = {(r["src"], r["dst"]) for r in tr.edges.select("src", "dst").collect()}
    assert len(kept) == 7
    assert kept <= {(min(u, v), max(u, v)) for u, v in G_EDGES}
    tr2 = random_link_sampler_by_percentage(g, 0.7, seed=3)
    kept2 = {(r["src"], r["dst"]) for r in tr2.edges.select("src", "dst").collect()}
    assert kept == kept2
    # node universe is preserved even if a node loses all edges
    assert tr.number_of_nodes() == 7
    with pytest.raises(ValueError):
        random_link_sampler_by_count(g, 11)
    with pytest.raises(ValueError):
        random_link_sampler_by_percentage(g, 1.5)


def test_evaluation_curve_num_thresholds(spark):
    """numThresholds smaller than #predictions+1 subsamples the prefix
    lengths via the ceil-percentile rule (EvaluationMetric.cpp:37-51)."""
    g = _graph(spark, G_EDGES, 7)
    preds = spark.createDataFrame(PREDICTIONS, "u long, v long, score double")
    # numThresholds=4 over 6 predictions: ceil(6*i/3) -> {0, 2, 4, 6}
    pts, auc = evaluation_curve(preds, g, metric="roc", num_thresholds=4)
    # TP prefix at 0/2/4/6 = 0/1/2/2; FP = 0/1/2/4
    assert pts == [(0.0, 0.0), (0.25, 0.5), (0.5, 1.0), (1.0, 1.0)]
    assert auc == pytest.approx(
        0.5 * 0.25 * 0.5 + 0.5 * 0.25 * 1.5 + 0.5 * 0.5 * 2.0
    )
    with pytest.raises(ValueError):
        evaluation_curve(preds, g, metric="bogus")
    with pytest.raises(ValueError):
        evaluation_curve(preds, g, num_thresholds=1)
