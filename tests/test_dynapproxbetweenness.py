"""DynApproxBetweenness: incremental re-sampling == a full static
approx_betweenness re-run with the same seed/vd on the updated graph
(bit-for-bit — the md5 draws make both sides deterministic)."""

from __future__ import annotations

import hashlib

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import approx_betweenness
from networkit_spark.operators.dynapproxbetweenness import DynApproxBetweenness


def _rand_edges(n, seed, keep=3):
    out = []
    for u in range(n):
        for v in range(u + 1, n):
            h = int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            if h % keep == 0:
                out.append((u, v))
    return out


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def _check(spark, edges, n, events, eps=0.35, vd=8, directed=False):
    g = Graph.from_pandas(spark, edges, n=n, directed=directed)
    dyn = DynApproxBetweenness(g, epsilon=eps, vd=vd)
    dyn.run()
    # baseline: the static run on the initial graph must already agree
    want0 = _scores(approx_betweenness(g, epsilon=eps, vd=vd)[0])
    assert _scores(dyn.scores()) == want0
    dyn.update_batch(events)
    g2 = Graph.from_pandas(spark, edges + list(events), n=n, directed=directed)
    want = _scores(approx_betweenness(g2, epsilon=eps, vd=vd)[0])
    got = _scores(dyn.scores())
    assert got == want  # exact: identical draws, identical counts
    return dyn


def test_path_rewire(spark):
    edges = [(i, i + 1) for i in range(6)]
    dyn = _check(spark, edges, 7, [(0, 6)])
    upd = [m for m in dyn.metrics if m["phase"] == "update"]
    assert upd and upd[0]["affected"] > 0


def test_unaffected_edge_resamples_nothing(spark):
    # two components; adding an edge INSIDE the far component leaves
    # samples sourced in the other component untouched
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)]
    g = Graph.from_pandas(spark, edges, n=13)
    dyn = DynApproxBetweenness(g, epsilon=0.5, vd=6)
    dyn.run()
    dyn.update(10, 12)
    g2 = Graph.from_pandas(spark, edges + [(10, 12)], n=13)
    want = _scores(approx_betweenness(g2, epsilon=0.5, vd=6)[0])
    assert _scores(dyn.scores()) == want


def test_random_graphs_with_two_insertions(spark):
    for seed in (6,):
        n = 12
        edges = _rand_edges(n, seed)
        present = set(edges)
        events = []
        for u in range(n):
            for v in range(u + 1, n):
                if (u, v) not in present and len(events) < 2:
                    events.append((u, v))
                    present.add((u, v))
        _check(spark, edges, n, events)


def test_component_merge(spark):
    edges = [(0, 1), (1, 2), (3, 4), (4, 5)]
    _check(spark, edges, 6, [(2, 3)], vd=7)
