"""Gephi streaming exporter: wire-format lines match the reference
pyclient's json.dumps shapes (gephi/pyclient.py:91-209)."""

from __future__ import annotations

import json

import pytest

from networkit_spark.gephi import (
    events_to_lines,
    export_graph_lines,
    write_gephi_stream,
)
from networkit_spark.graph import Graph

pytestmark = pytest.mark.usefixtures("spark")


def test_export_graph_lines(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    rows = export_graph_lines(g).orderBy("kind", "ord").collect()
    lines = [json.loads(r["line"]) for r in rows]
    assert lines[:3] == [{"an": {"0": {}}}, {"an": {"1": {}}},
                         {"an": {"2": {}}}]
    assert lines[3] == {"ae": {"0-1": {"source": 0, "target": 1,
                                       "directed": False}}}
    assert lines[4] == {"ae": {"1-2": {"source": 1, "target": 2,
                                       "directed": False}}}


def test_export_directed_edge_id(spark):
    g = Graph.from_pandas(spark, [(2, 0)], directed=True, n=3)
    rows = export_graph_lines(g).filter("kind = 1").collect()
    got = json.loads(rows[0]["line"])
    assert got == {"ae": {"2->0": {"source": 2, "target": 0,
                                   "directed": True}}}


def test_events_to_lines(spark):
    events = spark.createDataFrame(
        [
            ("NODE_ADDITION", 5, None, None),
            ("EDGE_ADDITION", 3, 1, 1.0),
            ("EDGE_REMOVAL", 1, 3, None),
            ("NODE_REMOVAL", 5, None, None),
            ("EDGE_WEIGHT_UPDATE", 1, 3, 9.0),  # dropped
            ("TIME_STEP", None, None, None),    # dropped
        ],
        "type string, u long, v long, w double",
    )
    lines = [json.loads(r["line"])
             for r in events_to_lines(events, directed=False).collect()]
    assert {"an": {"5": {}}} in lines
    assert {"ae": {"1-3": {"source": 3, "target": 1,
                           "directed": False}}} in lines
    assert {"de": {"1-3": {}}} in lines
    assert {"dn": {"5": {}}} in lines
    assert len(lines) == 4


def test_write_gephi_stream(spark, tmp_path):
    g = Graph.from_pandas(spark, [(0, 1)], n=2)
    out = str(tmp_path / "gephi")
    write_gephi_stream(export_graph_lines(g), out)
    back = spark.read.text(out).collect()
    assert len(back) == 3
    for r in back:
        json.loads(r["value"])
