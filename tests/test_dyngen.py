"""Dynamic generator event streams — reference-semantics invariants
(networkit/cpp/generators/Dynamic{Path,DorogovtsevMendes,
BarabasiAlbert,ForestFire}Generator.cpp) and consumption through
streaming/dynamics.apply_events."""

from __future__ import annotations

import pytest

from networkit_spark.sources.dyngen import (
    dynamic_barabasi_albert_events,
    dynamic_dorogovtsev_mendes_events,
    dynamic_forest_fire_events,
    dynamic_path_events,
)

pytestmark = pytest.mark.usefixtures("spark")


def _rows(df):
    return sorted(
        (int(r["step"]), int(r["cls"]), r["type"], int(r["u"]),
         int(r["v"]), float(r["w"]))
        for r in df.collect()
    )


def test_dynamic_path_exact(spark):
    got = _rows(dynamic_path_events(spark, 3))
    want = sorted(
        [(0, 0, "NODE_ADDITION", 0, -1, 0.0)]
        + [(s, 0, "NODE_ADDITION", s, -1, 0.0) for s in (1, 2, 3)]
        + [(s, 1, "EDGE_ADDITION", s - 1, s, 1.0) for s in (1, 2, 3)]
        + [(s, 2, "TIME_STEP", -1, -1, 0.0) for s in (1, 2, 3)]
    )
    assert got == want


def test_dorogovtsev_mendes_growth(spark):
    steps = 12
    rows = _rows(dynamic_dorogovtsev_mendes_events(spark, steps, seed=5))
    adds = [r for r in rows if r[2] == "EDGE_ADDITION"]
    assert len(adds) == 3 + 2 * steps
    nodes = [r for r in rows if r[2] == "NODE_ADDITION"]
    assert len(nodes) == 3 + steps
    # per step: the new node connects to the two endpoints of one
    # EXISTING edge
    edges = {(0, 1), (1, 2), (2, 0)}
    for st in range(1, steps + 1):
        step_adds = [r for r in adds if r[0] == st]
        assert len(step_adds) == 2
        new = 2 + st
        ends = {r[4] for r in step_adds}
        assert all(r[3] == new for r in step_adds)
        assert (
            tuple(sorted(ends)) in {tuple(sorted(e)) for e in edges}
        )
        for e in ends:
            edges.add((e, new))


def test_barabasi_albert_invariants(spark):
    k, steps = 3, 10
    rows = _rows(dynamic_barabasi_albert_events(spark, steps, k, seed=9))
    init_edges = [r for r in rows if r[0] == 0 and r[2] == "EDGE_ADDITION"]
    assert [(r[3], r[4]) for r in sorted(init_edges)] == [
        (0, 1), (1, 2)
    ]
    for st in range(1, steps + 1):
        adds = [r for r in rows if r[0] == st and r[2] == "EDGE_ADDITION"]
        new = k + st - 1
        assert len(adds) == k
        tgts = [r[4] for r in adds]
        assert len(set(tgts)) == k
        assert all(r[3] == new and t < new for r, t in zip(adds, tgts))
    with pytest.raises(ValueError):
        dynamic_barabasi_albert_events(spark, 1, 0)


def test_forest_fire_p0_connects_only_ambassador(spark):
    rows = _rows(dynamic_forest_fire_events(spark, 6, p=0.0, seed=4))
    for st in range(1, 7):
        adds = [r for r in rows if r[0] == st and r[2] == "EDGE_ADDITION"]
        assert len(adds) == 1
        assert adds[0][4] < adds[0][3]


def test_forest_fire_burn_targets_exist_and_distinct(spark):
    rows = _rows(
        dynamic_forest_fire_events(
            spark, 8, p=0.5, directed=True, r=0.5, seed=4
        )
    )
    seen_nodes = set()
    for r in rows:
        if r[2] == "NODE_ADDITION":
            seen_nodes.add(r[3])
    for st in range(1, 9):
        adds = [(r[3], r[4]) for r in rows
                if r[0] == st and r[2] == "EDGE_ADDITION"]
        assert len(set(adds)) == len(adds)
        for u, v in adds:
            assert v in seen_nodes and v < u


def test_streams_apply_to_graphs(spark):
    from networkit_spark.streaming.dynamics import apply_events
    from networkit_spark.graph import Graph

    ev = dynamic_dorogovtsev_mendes_events(spark, 5, seed=2)
    g0 = Graph(
        spark.createDataFrame([], "src long, dst long, weight double"),
        None, directed=False, weighted=False,
    )
    g = apply_events(g0, ev.filter("type <> 'TIME_STEP'"))
    assert g.edges.count() == 3 + 2 * 5
