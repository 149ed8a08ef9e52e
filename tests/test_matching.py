"""Suitor matching: distributed locally-dominant rounds vs a
driver-side replica of the reference's findSuitor loop
(SuitorMatcher.cpp:56-87)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    matching_weight,
    suitor_matching,
    suitor_reference_replica,
)


def _unique_w(u, v, seed=7):
    h = hashlib.md5(f"{seed}|{min(u, v)}|{max(u, v)}".encode()).hexdigest()[:12]
    return 1.0 + int(h, 16) / 16**12


def _run(spark, edges, n):
    g = Graph.from_pandas(spark, edges, weighted=True, n=n)
    m, info = suitor_matching(g)
    got = {(r["src"], r["dst"]) for r in m.collect()}
    want = suitor_reference_replica(edges, n)
    assert got == want
    assert info.converged
    return m


def test_triangle_plus_pendant(spark):
    # heaviest edge (1,2,5) matched; pendant (0,3,1) matched
    edges = [(0, 1, 2.0), (1, 2, 5.0), (0, 2, 3.0), (0, 3, 1.0)]
    m = _run(spark, edges, 4)
    assert matching_weight(m) == pytest.approx(6.0)


def test_decreasing_chain_sequential_worst_case(spark):
    """Path with strictly increasing weights: greedy matches from the
    top end one edge per dominance round — exercises multi-round
    convergence."""
    n = 12
    edges = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    _run(spark, edges, n)


def test_random_graphs_match_reference(spark):
    for seed in (1, 2, 3):
        n = 24
        edges = [
            (u, v, _unique_w(u, v, seed))
            for u in range(n)
            for v in range(u + 1, n)
            if int(hashlib.md5(f"e|{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            % 5
            == 0
        ]
        _run(spark, edges, n)


def test_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        suitor_matching(g)


def test_matching_is_valid(spark):
    """No node appears twice; matched pairs are real edges."""
    n = 30
    edges = [(u, (u * 7 + 3) % n, _unique_w(u, (u * 7 + 3) % n))
             for u in range(n) if u != (u * 7 + 3) % n]
    # dedup canonical
    seen = {}
    for u, v, w in edges:
        seen[(min(u, v), max(u, v))] = w
    edges = [(a, b, w) for (a, b), w in seen.items()]
    g = Graph.from_pandas(spark, edges, weighted=True, n=n)
    m, _ = suitor_matching(g)
    rows = m.collect()
    nodes = [r["src"] for r in rows] + [r["dst"] for r in rows]
    assert len(nodes) == len(set(nodes))
    eset = {(a, b) for a, b, _ in edges}
    assert all((r["src"], r["dst"]) in eset for r in rows)


# ---------------------------------------------------------------------------
# BSuitorMatcher (BSuitorMatcher.cpp:42-121) — distributed synchronous
# rounds vs the driver-side replica of findSuitors/makeSuitor.
# ---------------------------------------------------------------------------

from networkit_spark.operators.matching import (  # noqa: E402
    bsuitor_matching,
    bsuitor_reference_replica,
)


def _rand_wedges(n, seed, keep=3):
    out = []
    for u in range(n):
        for v in range(u + 1, n):
            h = int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            if h % keep == 0:
                out.append((u, v, _unique_w(u, v, seed)))
    return out


def test_bsuitor_b1_equals_suitor(spark):
    edges = _rand_wedges(12, seed=11)
    g = Graph.from_pandas(spark, edges, weighted=True, n=12)
    m1, _ = suitor_matching(g)
    m2, _ = bsuitor_matching(g, b=1)
    assert {(r["src"], r["dst"]) for r in m1.collect()} == {
        (r["src"], r["dst"]) for r in m2.collect()
    }


@pytest.mark.parametrize("b", [2, 3])
def test_bsuitor_matches_reference_replica(spark, b):
    for seed in (4, 9):
        n = 13
        edges = _rand_wedges(n, seed)
        g = Graph.from_pandas(spark, edges, weighted=True, n=n)
        m, info = bsuitor_matching(g, b=b)
        got = {(r["src"], r["dst"]) for r in m.collect()}
        want = bsuitor_reference_replica(edges, n, b)
        assert got == want
        assert info.converged
        # capacity respected
        from collections import Counter

        cnt = Counter()
        for u, v in got:
            cnt[u] += 1
            cnt[v] += 1
        assert all(c <= b for c in cnt.values())


def test_bsuitor_heterogeneous_b(spark):
    n = 10
    edges = _rand_wedges(n, seed=21, keep=2)
    bs = [1 + (u % 3) for u in range(n)]
    g = Graph.from_pandas(spark, edges, weighted=True, n=n)
    b_df = g.edges.sparkSession.createDataFrame(
        [(u, bs[u]) for u in range(n)], "id long, b long"
    )
    m, info = bsuitor_matching(g, b=b_df)
    got = {(r["src"], r["dst"]) for r in m.collect()}
    want = bsuitor_reference_replica(edges, n, bs)
    assert got == want


def test_bsuitor_validation(spark):
    g = Graph.from_pandas(spark, [(0, 1, 1.0)], weighted=True, n=2)
    with pytest.raises(ValueError):
        bsuitor_matching(g, b=0)
