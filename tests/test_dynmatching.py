"""DynamicBSuitorMatcher repair + PathGrowingMatcher.

The reference's own gtest invariant for the dynamic matcher is
dynamic == fresh static BSuitorMatcher on the final graph
(matching/test/MatcherGTest.cpp) — replayed here on random
unique-weight graphs with mixed insert/remove batches.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.dynmatching import (
    apply_edge_events,
    dynamic_bsuitor,
    dynamic_bsuitor_update,
)
from networkit_spark.operators.matching import (
    bsuitor_matching,
    path_growing_matching,
)


def _hash_w(u, v, salt=1009):
    a, b2 = min(u, v), max(u, v)
    return float(((a * salt + b2) * 2654435761) % 100003 + 1)


def _random_graph(spark, n, m, seed):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    rows = [(u, v, _hash_w(u, v)) for u, v in sorted(edges)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=False,
        weighted=True,
    )
    return g, edges, rng


def _events(spark, edges, rng, n, n_rm, n_add, salt=977):
    removed = rng.sample(sorted(edges), n_rm)
    added = set()
    while len(added) < n_add:
        u, v = rng.randrange(n), rng.randrange(n)
        e = (min(u, v), max(u, v))
        if u != v and e not in edges:
            added.add(e)
    ev = [("de", u, v, 0.0) for u, v in removed] + [
        ("ae", u, v, _hash_w(u, v, salt)) for u, v in sorted(added)
    ]
    return spark.createDataFrame(
        ev, "kind string, src long, dst long, weight double"
    )


def _pairs(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


@pytest.mark.parametrize("seed,b", [(3, 1), (7, 2), (11, 3)])
def test_dynamic_equals_static(spark, seed, b):
    g, edges, rng = _random_graph(spark, 50, 130, seed)
    events = _events(spark, edges, rng, 50, 8, 10)
    dyn, info = dynamic_bsuitor(g, b, events)
    assert info.converged
    g2, _ = apply_edge_events(g, events)
    stat, _ = bsuitor_matching(g2, b=b)
    assert _pairs(dyn) == _pairs(stat)


def test_heavy_insert_displaces(spark):
    # path 0-1-2 with weights 10, 9; b=1 matches (0,1). Inserting
    # (1,3) with weight 100 must displace 0 and re-match nothing for 0
    # (no alternative), giving {(1,3)} ∪ {(0,?)..} = {(1,3)}
    rows = [(0, 1, 10.0), (1, 2, 9.0)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(4)], "id long"),
        directed=False,
        weighted=True,
    )
    events = spark.createDataFrame(
        [("ae", 1, 3, 100.0)], "kind string, src long, dst long, weight double"
    )
    dyn, info = dynamic_bsuitor(g, 1, events)
    assert info.converged
    # greedy on final graph: (1,3) w=100, then 0 and 2 have only edges
    # to saturated 1 -> unmatched
    assert _pairs(dyn) == [(1, 3)]


def test_remove_matched_edge_repairs(spark):
    # triangle: (0,1)=5 matched at b=1; removing it re-matches to the
    # heavier of the remaining edges
    rows = [(0, 1, 5.0), (1, 2, 3.0), (0, 2, 2.0)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(3)], "id long"),
        directed=False,
        weighted=True,
    )
    events = spark.createDataFrame(
        [("de", 0, 1, 0.0)], "kind string, src long, dst long, weight double"
    )
    dyn, info = dynamic_bsuitor(g, 1, events)
    assert info.converged
    assert _pairs(dyn) == [(1, 2)]


def test_from_scratch_degenerates_to_static(spark):
    g, _, _ = _random_graph(spark, 40, 90, 23)
    empty = g.edges.sparkSession.createDataFrame(
        [], "src long, dst long, weight double"
    )
    dyn, info = dynamic_bsuitor_update(
        g, 2, empty, g.nodes(), max_rounds=64
    )
    assert info.converged
    stat, _ = bsuitor_matching(g, b=2)
    assert _pairs(dyn) == _pairs(stat)


def test_path_growing_valid_and_half_approx(spark):
    for seed in (1, 2):
        g, edges, _ = _random_graph(spark, 12, 22, seed)
        m = path_growing_matching(g)
        rows = m.collect()
        seen = set()
        for r in rows:
            assert r["src"] not in seen and r["dst"] not in seen
            seen.add(r["src"])
            seen.add(r["dst"])
            assert (r["src"], r["dst"]) in edges
        got = sum(r["weight"] for r in rows)
        # brute-force maximum-weight matching on the tiny graph
        elist = [(u, v, _hash_w(u, v)) for u, v in sorted(edges)]
        best = 0.0
        for k in range(1, 7):
            for combo in itertools.combinations(elist, k):
                nodes = [x for u, v, _ in combo for x in (u, v)]
                if len(nodes) == len(set(nodes)):
                    best = max(best, sum(w for _, _, w in combo))
        assert got >= 0.5 * best - 1e-9


def test_path_growing_simple_path(spark):
    # path 0-1-2-3 with weights 1, 10, 1: the walk starts at a
    # degree-2 node, follows the heaviest edge; the heavier
    # alternating matching contains (1,2)
    rows = [(0, 1, 1.0), (1, 2, 10.0), (2, 3, 1.0)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(4)], "id long"),
        directed=False,
        weighted=True,
    )
    m = path_growing_matching(g)
    assert _pairs(m) == [(1, 2)]


def test_weight_update_event(spark):
    # 'ae' on an existing edge replaces its weight
    rows = [(0, 1, 5.0), (1, 2, 3.0)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(3)], "id long"),
        directed=False,
        weighted=True,
    )
    events = spark.createDataFrame(
        [("ae", 1, 2, 50.0)], "kind string, src long, dst long, weight double"
    )
    g2, dirty = apply_edge_events(g, events)
    assert g2.edges.count() == 2
    w12 = g2.edges.filter(
        (F.col("src") == 1) & (F.col("dst") == 2)
    ).collect()[0]["weight"]
    assert w12 == 50.0
    dyn, info = dynamic_bsuitor(g, 1, events)
    assert info.converged
    assert _pairs(dyn) == [(1, 2)]
