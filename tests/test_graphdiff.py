"""GraphDifference (dynamics/GraphDifference.cpp) + DGSWriter
(dynamics/DGSWriter.cpp) round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.streaming.dynamics import apply_events, graph_difference


def _evset(df):
    return {
        (r["cls"], r["type"], r["u"], r["v"], r["w"]) for r in df.collect()
    }


def test_difference_classes_and_types(spark):
    g1 = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=5)  # node 4 isolated
    g2 = Graph.from_pandas(spark, [(0, 1), (1, 3), (2, 3)], n=4)
    ev = graph_difference(g1, g2)
    s = _evset(ev)
    assert (0, "EDGE_REMOVAL", 1, 2, None) in s
    assert (2, "EDGE_ADDITION", 1, 3, 1.0) in s
    assert (1, "NODE_REMOVAL", 4, None, None) in s
    assert len(s) == 3


def test_difference_weight_update_and_restoration(spark):
    g1 = Graph.from_pandas(spark, [(0, 1, 1.0), (1, 2, 2.0)], weighted=True, n=6)
    # node 7 is beyond g1's id bound (5) -> NODE_ADDITION; node 4 within -> RESTORATION
    g2 = Graph(
        spark.createDataFrame(
            [(0, 1, 9.0), (1, 2, 2.0), (7, 0, 1.0)],
            "src long, dst long, weight double",
        ),
        vertices=spark.createDataFrame([(i,) for i in (0, 1, 2, 4, 7)], "id long"),
        weighted=True,
    )
    g1 = Graph(g1.edges, vertices=spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 5)], "id long"), weighted=True)
    s = _evset(graph_difference(g1, g2))
    assert (2, "EDGE_WEIGHT_UPDATE", 0, 1, 9.0) in s
    assert (1, "NODE_RESTORATION", 4, None, None) in s
    assert (1, "NODE_ADDITION", 7, None, None) in s
    assert (1, "NODE_REMOVAL", 3, None, None) in s
    assert (1, "NODE_REMOVAL", 5, None, None) in s
    assert (2, "EDGE_ADDITION", 0, 7, 1.0) in s


def test_difference_mixed_modes_rejected(spark):
    gu = Graph.from_pandas(spark, [(0, 1)], n=2)
    gd = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="directed"):
        graph_difference(gu, gd)
    gw = Graph.from_pandas(spark, [(0, 1, 2.0)], weighted=True, n=2)
    with pytest.raises(ValueError, match="weighted"):
        graph_difference(gu, gw)


def test_difference_identity_is_empty(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    assert graph_difference(g, g).count() == 0


def test_difference_edits_reach_target(spark):
    """Applying the edge edits of diff(G1, G2) to G1 yields G2's edge set
    (the reference's defining property, GraphDifferenceGTest)."""
    g1 = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], n=5)
    g2 = Graph.from_pandas(spark, [(0, 1), (1, 3), (2, 3), (2, 4)], n=5)
    ev = graph_difference(g1, g2).select("type", "u", "v", "w")
    g_after = apply_events(g1, ev)
    canon = lambda g: {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.collect()
    }
    assert canon(g_after) == canon(g2)


def test_dgs_round_trip(spark, tmp_path):
    from networkit_spark.sources.graphio import read_dgs, write_dgs

    ev = spark.createDataFrame(
        [
            (0, "NODE_ADDITION", 0, None, None),
            (1, "NODE_ADDITION", 1, None, None),
            (2, "EDGE_ADDITION", 0, 1, 1.0),
            (3, "TIME_STEP", None, None, None),
            (4, "EDGE_WEIGHT_UPDATE", 0, 1, 3.5),
            (5, "EDGE_REMOVAL", 0, 1, None),
            (6, "NODE_REMOVAL", 1, None, None),
        ],
        "step long, type string, u long, v long, w double",
    )
    path = str(tmp_path / "stream.dgs")
    write_dgs(ev, path, order_by=("step",))
    back, names = read_dgs(spark, path)
    got = [
        (r["type"], r["u"], r["v"], r["w"])
        for r in back.orderBy("step", "type", "u").collect()
    ]
    # node names "0"/"1" densify in first-appearance order -> same ids
    assert ("EDGE_ADDITION", 0, 1, 1.0) in got
    assert ("EDGE_WEIGHT_UPDATE", 0, 1, 3.5) in got
    assert ("EDGE_REMOVAL", 0, 1, None) in got
    assert ("TIME_STEP", None, None, None) in got
    assert ("NODE_REMOVAL", 1, None, None) in got
    assert names == {"0": 0, "1": 1}
