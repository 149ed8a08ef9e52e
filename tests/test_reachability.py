"""ReachableNodes (exact + estimate) and EpidemicSimulationSEIR —
python replicas on seeded digraphs, hand fixtures, and invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.reachability import reachable_nodes
from networkit_spark.operators.simulation import (
    EXPOSED,
    INFECTIOUS,
    REMOVED,
    SUSCEPTIBLE,
    TWO52,
    epidemic_simulation_seir,
)

pytestmark = pytest.mark.usefixtures("spark")


def _dg(spark, pairs):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=True, weighted=False)


def _seeded_digraph(n=40, seed=3):
    """Deterministic sparse digraph from md5 draws."""
    edges = []
    for u in range(n):
        for v in range(n):
            if u == v:
                continue
            h = hashlib.md5(f"rg|{seed}|{u}|{v}".encode()).hexdigest()
            if int(h[:13], 16) <= int(0.06 * TWO52):
                edges.append((u, v))
    return edges


def _exact_reachable(n, edges):
    adj = {u: [] for u in range(n)}
    ids = set()
    for u, v in edges:
        adj[u].append(v)
        ids.add(u)
        ids.add(v)
    out = {}
    for s in sorted(ids):
        seen = {s}
        stack = [s]
        while stack:
            x = stack.pop()
            for y in adj.get(x, []):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        out[s] = len(seen)
    return out


def test_reachable_exact_replica(spark):
    edges = _seeded_digraph()
    g = _dg(spark, edges)
    got = {
        int(r["id"]): int(r["reachable_lb"])
        for r in reachable_nodes(g, exact=True).collect()
    }
    want = _exact_reachable(40, edges)
    assert got == want
    ub = {
        int(r["id"]): int(r["reachable_ub"])
        for r in reachable_nodes(g, exact=True).collect()
    }
    assert ub == want


def test_reachable_estimate_brackets_exact(spark):
    edges = _seeded_digraph(seed=11)
    g = _dg(spark, edges)
    exact = _exact_reachable(40, edges)
    est = {
        int(r["id"]): (int(r["reachable_lb"]), int(r["reachable_ub"]))
        for r in reachable_nodes(g, exact=False).collect()
    }
    assert set(est) == set(exact)
    for u, (lb, ub) in est.items():
        assert lb <= exact[u] <= ub, (u, lb, exact[u], ub)


def test_reachable_estimate_dag_fixture(spark):
    # two SCCs {0,1,2}, {3,4}; 2->3, 5->0, 6->5 — largest SCC {0,1,2}
    g = _dg(
        spark,
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (5, 0), (6, 5)],
    )
    est = {
        int(r["id"]): (int(r["reachable_lb"]), int(r["reachable_ub"]))
        for r in reachable_nodes(g, exact=False).collect()
    }
    # BFS out of the largest SCC settles {0..4}: lb=ub=5 for members;
    # the chain 6 -> 5 -> largest is a path DAG, so the DP is exact too
    assert est[0] == (5, 5) and est[3] == (2, 2)
    assert est[5] == (6, 6) and est[6] == (7, 7)


def test_reachable_undirected_component_sizes(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph(df, None, directed=False, weighted=False)
    got = {
        int(r["id"]): int(r["reachable_lb"])
        for r in reachable_nodes(g).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 2, 4: 2}


def _pg(spark, n):
    df = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=False)


def test_seir_path_golden(spark):
    # p=1, eTime=1, iTime=2 on a 7-node path from node 0: the front
    # advances one node per two steps; hand-traced census.
    out = epidemic_simulation_seir(
        _pg(spark, 7), t_max=4, trans_p=1.0, exposed_time=1,
        infectious_time=2, start=0, seed=7,
    ).collect()
    got = {(int(r["t"]), int(r["state"])): int(r["cnt"]) for r in out}
    assert got[(0, SUSCEPTIBLE)] == 5
    assert got[(0, EXPOSED)] == 1  # node 1 exposed at t=0
    assert got[(0, INFECTIOUS)] == 1
    assert got[(1, INFECTIOUS)] == 2  # node 1 promoted
    assert got[(2, REMOVED)] == 1  # node 0 retired at t=2
    assert got[(3, REMOVED)] == 2


def test_seir_census_conserves_population(spark):
    g = _pg(spark, 12)
    out = epidemic_simulation_seir(
        g, t_max=5, trans_p=0.4, exposed_time=2, infectious_time=3,
        start=0, seed=1,
    )
    per_t = (
        out.groupBy("t").agg(F.sum("cnt").alias("total")).collect()
    )
    assert all(int(r["total"]) == 12 for r in per_t)
    # Removed counts never decrease
    rem = [
        int(r["cnt"])
        for r in out.filter(F.col("state") == REMOVED).orderBy("t").collect()
    ]
    assert rem == sorted(rem)


def test_seir_deterministic(spark):
    g = _pg(spark, 10)
    kw = dict(
        t_max=4, trans_p=0.5, exposed_time=1, infectious_time=2,
        start=0, seed=9,
    )
    a = sorted(map(tuple, epidemic_simulation_seir(g, **kw).collect()))
    b = sorted(map(tuple, epidemic_simulation_seir(g, **kw).collect()))
    assert a == b
