"""DynBetweenness: incremental update == static Brandes recompute
(the reference's DynBetweennessGTest runDynVsStaticCaseInsert*
contract, DynBetweennessGTest.cpp:201-246), including equal-length
new-path pairs (sigma increments) and component-merging insertions."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.dynbetweenness import DynBetweenness


def _rand_edges(n, seed, keep=3):
    out = []
    for u in range(n):
        for v in range(u + 1, n):
            h = int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            if h % keep == 0:
                out.append((u, v))
    return out


def _scores_dict(df):
    return {r["id"]: r["score"] for r in df.collect()}


def _check_update(spark, edges, n, events, directed=False):
    g = Graph.from_pandas(spark, edges, n=n, directed=directed)
    dyn = DynBetweenness(g)
    dyn.run()
    dyn.update_batch(events)
    got = _scores_dict(dyn.scores())
    g2 = Graph.from_pandas(spark, edges + list(events), n=n, directed=directed)
    want = _scores_dict(betweenness(g2)[0])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-8), k


def test_insert_strictly_shortening(spark):
    # path 0-1-2-3-4-5; adding (0,5) reroutes everything
    edges = [(i, i + 1) for i in range(5)]
    _check_update(spark, edges, 6, [(0, 5)])


def test_insert_equal_length_paths(spark):
    # cycle 0-1-2-3-0 plus (0,2): pairs (1,3) gain nothing, but adding
    # (1,3) afterwards creates EQUAL-length alternatives -> sigma grows
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    _check_update(spark, edges, 4, [(0, 2)])
    _check_update(spark, edges, 4, [(0, 2), (1, 3)])


def test_insert_merges_components(spark):
    edges = [(0, 1), (1, 2), (3, 4), (4, 5)]
    _check_update(spark, edges, 6, [(2, 3)])


def test_insert_random_graphs_vs_recompute(spark):
    for seed in (2, 8):
        n = 12
        edges = _rand_edges(n, seed)
        present = set(edges)
        events = []
        for u in range(n):
            for v in range(u + 1, n):
                if (u, v) not in present and len(events) < 2:
                    events.append((u, v))
                    present.add((u, v))
        _check_update(spark, edges, n, events)


def test_insert_directed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (1, 3)]
    _check_update(spark, edges, 4, [(0, 3)], directed=True)


def test_existing_edge_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    dyn = DynBetweenness(g)
    dyn.run()
    with pytest.raises(ValueError):
        dyn.update(0, 1)
