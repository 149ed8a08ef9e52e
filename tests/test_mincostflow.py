"""SuccessiveShortestPath min-cost flow (flow/SuccessiveShortestPath.cpp)
vs hand-verified values and an independent cycle-canceling replica."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.mincostflow import successive_shortest_path


def _mk(spark, arcs, supplies, n):
    edges = spark.createDataFrame(
        [(u, v, float(c)) for (u, v, c, cap) in arcs],
        "src long, dst long, weight double",
    )
    caps = spark.createDataFrame(
        [(u, v, float(cap)) for (u, v, c, cap) in arcs],
        "src long, dst long, cap double",
    )
    sups = spark.createDataFrame(
        [(i, float(s)) for i, s in supplies.items()], "id long, supply double"
    )
    g = Graph(
        edges,
        vertices=spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=True,
        weighted=True,
    )
    return g, caps, sups


def _min_cost_cycle_cancel(arcs, supplies, n):
    """Independent driver-side oracle: feasible flow via repeated
    Bellman-Ford shortest augmenting paths is NOT used; instead build
    ANY max feasible routing greedily, then cancel negative residual
    cycles (Klein's algorithm) — a different algorithm whose optimum
    must agree."""
    cap = {(u, v): c for u, v, _, c in arcs}
    cost = {(u, v): c for u, v, c, _ in arcs}
    flow = {k: 0.0 for k in cap}
    bal = dict(supplies)

    def residual():
        r = {}
        for (u, v), c in cap.items():
            if c - flow[(u, v)] > 1e-9:
                r[(u, v, 0)] = (c - flow[(u, v)], cost[(u, v)])
            if flow[(u, v)] > 1e-9:
                r[(v, u, 1)] = (flow[(u, v)], -cost[(u, v)])
        return r

    # feasibility: successive BFS-shortest (by cost) augmentations
    def bellman(src):
        dist = {i: float("inf") for i in range(n)}
        par = {}
        dist[src] = 0.0
        for _ in range(n):
            for (u, v, b), (r, c) in residual().items():
                if dist[u] + c < dist[v] - 1e-12:
                    dist[v] = dist[u] + c
                    par[v] = (u, b)
        return dist, par

    while True:
        s = next((i for i in sorted(bal) if bal[i] > 1e-9), None)
        if s is None:
            break
        dist, par = bellman(s)
        t = next(
            (i for i in sorted(bal)
             if bal[i] < -1e-9 and dist[i] < float("inf")),
            None,
        )
        assert t is not None
        path = []
        cur = t
        while cur != s:
            u, b = par[cur]
            path.append((u, cur, b))
            cur = u
        r = residual()
        bn = min(bal[s], -bal[t], min(r[(u, v, b)][0] for u, v, b in path))
        for u, v, b in path:
            if b == 0:
                flow[(u, v)] += bn
            else:
                flow[(v, u)] -= bn
        bal[s] -= bn
        bal[t] += bn
    # cancel negative cycles
    improved = True
    while improved:
        improved = False
        r = residual()
        # enumerate simple cycles up to length 6 (test graphs are tiny)
        keys = list(r)
        for L in (2, 3, 4, 5, 6):
            for combo in itertools.permutations(keys, L):
                if any(combo[i][1] != combo[(i + 1) % L][0] for i in range(L)):
                    continue
                if len({k[0] for k in combo}) != L:
                    continue
                c = sum(r[k][1] for k in combo)
                if c < -1e-9:
                    bn = min(r[k][0] for k in combo)
                    for u, v, b in combo:
                        if b == 0:
                            flow[(u, v)] += bn
                        else:
                            flow[(v, u)] -= bn
                    improved = True
                    break
            if improved:
                break
    return sum(flow[k] * cost[k] for k in flow)


DIAMOND = [
    (0, 1, 1.0, 2.0), (0, 2, 2.0, 2.0), (1, 3, 3.0, 2.0),
    (2, 3, 1.0, 2.0), (1, 2, 1.0, 1.0),
]


def test_diamond_known_cost(spark):
    g, caps, sups = _mk(spark, DIAMOND, {0: 3.0, 3: -3.0}, 4)
    total, flow, info = successive_shortest_path(g, caps, sups)
    assert total == pytest.approx(10.0)
    # conservation: net outflow at 0 is 3, at 3 is -3, elsewhere 0
    net = {i: 0.0 for i in range(4)}
    for r in flow.collect():
        net[r["src"]] += r["f"]
        net[r["dst"]] -= r["f"]
    assert net == pytest.approx({0: 3.0, 1: 0.0, 2: 0.0, 3: -3.0})


def test_matches_cycle_canceling_oracle(spark):
    arcs = [
        (0, 1, 4.0, 3.0), (0, 2, 1.0, 2.0), (2, 1, 1.0, 2.0),
        (1, 3, 2.0, 2.0), (2, 3, 6.0, 2.0), (1, 4, 1.0, 2.0),
        (3, 4, 1.0, 3.0),
    ]
    sup = {0: 3.0, 4: -2.0, 3: -1.0}
    g, caps, sups = _mk(spark, arcs, sup, 5)
    total, _, _ = successive_shortest_path(g, caps, sups)
    want = _min_cost_cycle_cancel(arcs, sup, 5)
    assert total == pytest.approx(want)


def test_negative_cost_arc_ok_negative_cycle_rejected(spark):
    # negative arc, no negative cycle: potentials absorb it
    arcs = [(0, 1, -2.0, 2.0), (1, 2, 3.0, 2.0)]
    g, caps, sups = _mk(spark, arcs, {0: 1.0, 2: -1.0}, 3)
    total, _, _ = successive_shortest_path(g, caps, sups)
    assert total == pytest.approx(1.0)
    # negative cycle: must raise
    arcs2 = [(0, 1, -5.0, 2.0), (1, 0, 1.0, 2.0), (0, 2, 1.0, 1.0)]
    g2, caps2, sups2 = _mk(spark, arcs2, {0: 1.0, 2: -1.0}, 3)
    with pytest.raises(ValueError, match="negative-cost cycle"):
        successive_shortest_path(g2, caps2, sups2)


def test_input_validation(spark):
    g, caps, sups = _mk(spark, DIAMOND, {0: 3.0, 3: -2.0}, 4)
    with pytest.raises(ValueError, match="zero"):
        successive_shortest_path(g, caps, sups)
    gu = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError, match="directed"):
        successive_shortest_path(gu, caps, sups)
    arcs_neg = [(0, 1, 1.0, -1.0)]
    g3, caps3, sups3 = _mk(spark, arcs_neg, {0: 0.0, 1: 0.0}, 2)
    with pytest.raises(ValueError, match="non-negative"):
        successive_shortest_path(g3, caps3, sups3)


def test_unsatisfiable_demand_raises(spark):
    # demand node unreachable from the only supply node
    arcs = [(0, 1, 1.0, 1.0), (2, 1, 1.0, 1.0)]
    g, caps, sups = _mk(spark, arcs, {0: 1.0, 2: -1.0}, 3)
    with pytest.raises(ValueError, match="unable to satisfy"):
        successive_shortest_path(g, caps, sups)
