"""DynAPSP: incremental relaxation == static recompute, including
component-merging insertions; PermanenceCentrality fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.dynapsp import DynAPSP
from networkit_spark.operators.misccentrality import permanence_centrality

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs, weighted=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


def _rel(df):
    return sorted((r["s"], r["v"], r["dist"]) for r in df.collect())


def _static(g, sources):
    return _rel(DynAPSP(g, sources=sources).run().distances)


BASE = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (4, 5, 1), (5, 6, 1)]


def test_insertion_shortcut(spark):
    g = _mk(spark, BASE)
    dap = DynAPSP(g, sources=[0, 2]).run()
    dap.update(("EDGE_ADDITION", 0, 3, 1.0))
    g2 = _mk(spark, BASE + [(0, 3, 1)])
    assert _rel(dap.distances) == _static(g2, [0, 2])


def test_insertion_merges_components(spark):
    g = _mk(spark, BASE)
    dap = DynAPSP(g, sources=[0, 4]).run()
    dap.update(("EDGE_ADDITION", 3, 4, 1.0))
    g2 = _mk(spark, BASE + [(3, 4, 1)])
    assert _rel(dap.distances) == _static(g2, [0, 4])


def test_sequential_updates(spark):
    g = _mk(spark, BASE)
    dap = DynAPSP(g, sources=[0, 1, 6]).run()
    dap.update(("EDGE_ADDITION", 2, 6, 1.0))
    dap.update(("EDGE_ADDITION", 0, 5, 1.0))
    g2 = _mk(spark, BASE + [(2, 6, 1), (0, 5, 1)])
    assert _rel(dap.distances) == _static(g2, [0, 1, 6])


def test_weighted_decrease(spark):
    pairs = [(0, 1, 5.0), (1, 2, 1.0), (0, 2, 10.0)]
    g = _mk(spark, pairs, weighted=True)
    dap = DynAPSP(g, sources=[0]).run()
    dap.update(("EDGE_WEIGHT_INCREMENT", 0, 2, -8.5))
    rows = {(r["s"], r["v"]): r["dist"] for r in dap.distances.collect()}
    assert rows[(0, 2)] == pytest.approx(1.5)
    assert rows[(0, 1)] == pytest.approx(2.5)  # via the cheap 0-2-1 path


def test_removal_rejected(spark):
    g = _mk(spark, BASE)
    dap = DynAPSP(g, sources=[0]).run()
    with pytest.raises(RuntimeError):
        dap.update(("EDGE_REMOVAL", 0, 1, None))


def test_permanence_fixture(spark):
    # two triangles + bridge; partition = the two triangles
    pairs = [(0, 1, 1), (1, 2, 1), (2, 0, 1), (3, 4, 1), (4, 5, 1),
             (5, 3, 1), (2, 3, 1)]
    g = _mk(spark, pairs)
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    out = {r["id"]: round(r["permanence"], 9)
           for r in permanence_centrality(g, labels).collect()}
    # node 0: intdeg 2, max_ext 1, deg 2, icc = 1 -> 2/1/2 - 0 = 1
    assert out[0] == 1.0 and out[1] == 1.0
    # node 2: intdeg 2, max_ext 1, deg 3, icc 1 -> 2/3 - 0
    assert out[2] == round(2 / 3, 9)
    assert out[3] == round(2 / 3, 9)
