"""DynTopHarmonicCloseness: incremental repair == static recompute
(the DynKatz gate shape), plus pruning/affected-set evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import top_harmonic_closeness
from networkit_spark.operators.dyntopharmonic import DynTopHarmonicCloseness
from networkit_spark.streaming.dynamics import apply_events

pytestmark = pytest.mark.usefixtures("spark")

EVENTS_SCHEMA = "type string, u long, v long, w double"

BASE = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
    (8, 9), (9, 0), (0, 5), (2, 7), (10, 11), (11, 12), (12, 10),
    (4, 10),
]


def _mk(spark, pairs):
    df = spark.createDataFrame(
        [(int(u), int(v), 1.0) for u, v in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=False)


def _topk(df):
    return sorted(
        (round(float(r["score"]), 9), int(r["id"])) for r in df.collect()
    )


@pytest.mark.parametrize(
    "events",
    [
        [("EDGE_ADDITION", 3, 11, 1.0), ("EDGE_ADDITION", 0, 8, 1.0)],
        [("EDGE_REMOVAL", 4, 10, None), ("EDGE_REMOVAL", 0, 5, None)],
        [
            ("EDGE_ADDITION", 1, 12, 1.0),
            ("EDGE_REMOVAL", 9, 0, None),
            ("EDGE_ADDITION", 6, 10, 1.0),
        ],
    ],
)
def test_incremental_equals_static(spark, events):
    g = _mk(spark, BASE)
    dth = DynTopHarmonicCloseness(g, k=5, batch=4).run()
    ev = spark.createDataFrame(events, EVENTS_SCHEMA)
    dth.update_batch(ev)
    g2 = apply_events(_mk(spark, BASE), ev)
    static, _ = top_harmonic_closeness(
        Graph(g2.edges, None, False, False), k=5, batch=4
    )
    assert _topk(dth.scores()) == _topk(static)


def test_second_batch_continues_from_repaired_state(spark):
    g = _mk(spark, BASE)
    dth = DynTopHarmonicCloseness(g, k=4, batch=4).run()
    ev1 = spark.createDataFrame(
        [("EDGE_ADDITION", 2, 12, 1.0)], EVENTS_SCHEMA
    )
    ev2 = spark.createDataFrame(
        [("EDGE_REMOVAL", 2, 12, None), ("EDGE_ADDITION", 8, 10, 1.0)],
        EVENTS_SCHEMA,
    )
    dth.update_batch(ev1).update_batch(ev2)
    g2 = apply_events(apply_events(_mk(spark, BASE), ev1), ev2)
    static, _ = top_harmonic_closeness(
        Graph(g2.edges, None, False, False), k=4, batch=4
    )
    assert _topk(dth.scores()) == _topk(static)


def test_unaffected_exact_scores_are_reused(spark):
    # two far components; the event only touches the triangle component,
    # so every resolved node of the path component keeps its exact score
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (20, 21), (21, 22), (22, 20)]
    g = _mk(spark, pairs)
    dth = DynTopHarmonicCloseness(g, k=3, batch=8).run()
    before = dict(dth._exact)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 20, 23, 1.0), ("EDGE_ADDITION", 23, 21, 1.0)],
        EVENTS_SCHEMA,
    )
    dth.update_batch(ev)
    kept = {
        i for i in before
        if i in dth._exact and dth._exact[i] == before[i]
    }
    # the path component (0..4) is untouched: any of its resolved nodes
    # must keep its score without a re-sweep
    assert {i for i in kept if i < 20} == {i for i in before if i < 20}
    g2 = apply_events(_mk(spark, pairs), ev)
    static, _ = top_harmonic_closeness(
        Graph(g2.edges, None, False, False), k=3, batch=8
    )
    assert _topk(dth.scores()) == _topk(static)


def test_node_removal_invalidates_reachers(spark):
    # removing hub 0 of a star changes every leaf's score
    pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
    g = _mk(spark, pairs)
    dth = DynTopHarmonicCloseness(g, k=3, batch=8).run()
    ev = spark.createDataFrame(
        [("NODE_REMOVAL", 0, None, None)], EVENTS_SCHEMA
    )
    dth.update_batch(ev)
    g2 = apply_events(_mk(spark, pairs), ev)
    static, _ = top_harmonic_closeness(
        Graph(g2.edges, None, False, False), k=3, batch=8
    )
    assert _topk(dth.scores()) == _topk(static)
