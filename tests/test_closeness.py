"""Closeness / harmonic closeness vs hand-computed reference formulas
(Closeness.hpp:86-100, HarmonicCloseness.cpp:24-44)."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import (
    GENERALIZED,
    STANDARD,
    closeness,
    harmonic_closeness,
)


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_closeness_path_graph(spark):
    # P4: 0-1-2-3; from 0 dists are 1,2,3 -> sum 6; from 1: 1,1,2 -> 4
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    std = _scores(closeness(g, variant=STANDARD)[0])
    assert std[0] == pytest.approx(1 / 6)
    assert std[1] == pytest.approx(1 / 4)
    # connected graph: generalized = standard / (n-1) * (r-1) with r = n
    gen = _scores(closeness(g, variant=GENERALIZED)[0])
    assert gen[0] == pytest.approx(1 / 6)
    assert gen[3] == pytest.approx(1 / 6)
    # normalized standard multiplies by n-1
    nrm = _scores(closeness(g, variant=STANDARD, normalized=True)[0])
    assert nrm[1] == pytest.approx(3 / 4)


def test_closeness_disconnected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], n=3)  # node 2 isolated
    with pytest.raises(RuntimeError, match="disconnected"):
        closeness(g, variant=STANDARD)
    gen = _scores(closeness(g, variant=GENERALIZED)[0])
    # (r-1)/sum/(n-1) = 1/1/2
    assert gen[0] == pytest.approx(0.5)
    assert gen[2] == 0.0
    har = _scores(harmonic_closeness(g)[0])
    assert har[0] == pytest.approx(1.0)
    assert har[2] == 0.0


def test_harmonic_path_graph(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    har = _scores(harmonic_closeness(g)[0])
    assert har[0] == pytest.approx(1 + 0.5 + 1 / 3)
    assert har[1] == pytest.approx(1 + 1 + 0.5)
    nrm = _scores(harmonic_closeness(g, normalized=True)[0])
    assert nrm[0] == pytest.approx((1 + 0.5 + 1 / 3) / 3)


def test_closeness_directed_and_sources(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True, n=3)
    gen = _scores(closeness(g, variant=GENERALIZED)[0])
    # from 0: reaches 1,2 at 1,2 -> (3-1)/3/(3-1) = 1/3; from 2: nothing
    assert gen[0] == pytest.approx(1 / 3)
    assert gen[2] == 0.0
    # source restriction computes exactly those nodes
    sub = _scores(closeness(g, variant=GENERALIZED, sources=[0])[0])
    assert set(sub) == {0}
    assert sub[0] == pytest.approx(1 / 3)
    har = _scores(harmonic_closeness(g, sources=[0, 2])[0])
    assert har[0] == pytest.approx(1 + 0.5)
    assert har[2] == 0.0


def test_top_closeness_matches_exact(spark):
    """top_closeness == exact closeness top-k (same scores, same
    (score desc, id asc) order) on a graph with degree spread, and the
    pruning bound must fire before sweeping every node."""
    from networkit_spark.operators.closeness import top_closeness

    # wheel + tail: hub 0 touches a 10-cycle 1..10, path 11-12-13 hangs
    # off node 1 -> clear closeness ordering with a spread of scores
    edges = [(0, i) for i in range(1, 11)]
    edges += [(i, i + 1) for i in range(1, 10)] + [(10, 1)]
    edges += [(1, 11), (11, 12), (12, 13)]
    g = Graph.from_pandas(spark, edges, n=14)
    k = 5
    got, info = top_closeness(g, k=k, batch=4)
    got_rows = [(r["id"], r["score"]) for r in got.collect()]

    exact = _scores(closeness(g, variant=GENERALIZED)[0])
    want = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert [i for i, _ in got_rows] == [i for i, _ in want]
    for (gi, gs), (wi, ws) in zip(got_rows, want):
        assert gs == pytest.approx(ws, abs=1e-12)
    assert info.iterations < 14, "pruning never fired"


def test_top_closeness_disconnected_and_small(spark):
    from networkit_spark.operators.closeness import top_closeness

    g = Graph.from_pandas(spark, [(0, 1), (2, 3), (3, 4)], n=6)
    got, _ = top_closeness(g, k=3, batch=2)
    rows = [(r["id"], r["score"]) for r in got.collect()]
    exact = _scores(closeness(g, variant=GENERALIZED)[0])
    want = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [i for i, _ in rows] == [i for i, _ in want]


def test_top_closeness_directed_raises(spark):
    from networkit_spark.operators.closeness import top_closeness

    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="directed"):
        top_closeness(g)


def test_weighted_closeness(spark):
    # path 0 -2- 1 -3- 2: from 0 dists are 2, 5 -> dsum 7
    g = Graph.from_pandas(spark, [(0, 1, 2.0), (1, 2, 3.0)], weighted=True, n=3)
    gen = _scores(closeness(g, variant=GENERALIZED, weighted=True)[0])
    assert gen[0] == pytest.approx(2 / 7 / 2)
    assert gen[1] == pytest.approx(2 / 5 / 2)
    har = _scores(harmonic_closeness(g, weighted=True)[0])
    assert har[0] == pytest.approx(1 / 2 + 1 / 5)
    assert har[2] == pytest.approx(1 / 3 + 1 / 5)
    # weighted=False keeps hop semantics
    hop = _scores(closeness(g, variant=GENERALIZED, weighted=False)[0])
    assert hop[0] == pytest.approx(2 / 3 / 2)


def test_weighted_closeness_takes_lighter_detour(spark):
    # direct edge (0,2) weight 10 vs detour 0-1-2 weight 2+3=5
    g = Graph.from_pandas(
        spark, [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0)], weighted=True, n=3
    )
    gen = _scores(closeness(g, variant=GENERALIZED, weighted=True)[0])
    # from 0: d(1)=2, d(2)=5 -> dsum 7
    assert gen[0] == pytest.approx(2 / 7 / 2)


def test_top_harmonic_matches_exact(spark):
    """top_harmonic_closeness == exact harmonic top-k (raw scores,
    (score desc, id asc) order) and the bound prunes."""
    from networkit_spark.operators.closeness import top_harmonic_closeness

    edges = [(0, i) for i in range(1, 11)]
    edges += [(i, i + 1) for i in range(1, 10)] + [(10, 1)]
    edges += [(1, 11), (11, 12), (12, 13)]
    g = Graph.from_pandas(spark, edges, n=14)
    k = 5
    got, info = top_harmonic_closeness(g, k=k, batch=4)
    got_rows = [(r["id"], r["score"]) for r in got.collect()]

    exact = _scores(harmonic_closeness(g)[0])
    want = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert [i for i, _ in got_rows] == [i for i, _ in want]
    for (gi, gs), (wi, ws) in zip(got_rows, want):
        # scores are quantized to 1e-9 for deterministic tie-breaks
        assert gs == pytest.approx(ws, abs=5e-10)
    assert info.iterations < 14, "pruning never fired"


def test_top_harmonic_disconnected_and_directed(spark):
    from networkit_spark.operators.closeness import top_harmonic_closeness

    g = Graph.from_pandas(spark, [(0, 1), (2, 3), (3, 4)], n=6)
    got, _ = top_harmonic_closeness(g, k=3, batch=2)
    rows = [(r["id"], r["score"]) for r in got.collect()]
    exact = _scores(harmonic_closeness(g)[0])
    want = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [i for i, _ in rows] == [i for i, _ in want]

    gd = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="directed"):
        top_harmonic_closeness(gd)


def test_top_harmonic_fp_tie_breaks_by_id(spark):
    """Mathematically tied scores at the k-th boundary rank by id, not
    by the FP noise of the summation order: every node of a cycle is
    tied, so top-k must be the k smallest ids (regression for the
    sf0.01 tie between two score-344.666667 nodes that flipped when the
    BFS accumulator plan changed)."""
    from networkit_spark.operators.closeness import top_harmonic_closeness

    n = 12
    g = Graph.from_pandas(spark, [(i, (i + 1) % n) for i in range(n)], n=n)
    got, _ = top_harmonic_closeness(g, k=5, batch=3)
    assert [int(r["id"]) for r in got.collect()] == [0, 1, 2, 3, 4]
