"""Profiling module vs numpy replicas (profiling/profiling.py measure
registry + stat.py location/dispersion semantics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.profiling import (
    MEASURES,
    measure_stats,
    partition_stats,
    profile,
    properties,
)

pytestmark = pytest.mark.usefixtures("spark")

PAIRS = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4), (4, 5),
         (5, 6), (4, 6), (6, 7), (2, 6), (8, 9)]
N = 10


def _graph(spark):
    return Graph.from_pandas(spark, PAIRS, n=N)


def test_properties(spark):
    p = properties(_graph(spark))
    assert p["nodes"] == N and p["edges"] == len(PAIRS)
    assert p["density"] == pytest.approx(len(PAIRS) / (N * (N - 1) / 2))
    assert not p["directed"] and not p["weighted"]


def test_degree_measure_stats(spark):
    g = _graph(spark)
    deg = np.zeros(N)
    for u, v in PAIRS:
        deg[u] += 1
        deg[v] += 1
    st = measure_stats(g, MEASURES["degree"](g), "degree")
    assert st["n"] == N
    assert st["min"] == deg.min() and st["max"] == deg.max()
    assert st["mean"] == pytest.approx(deg.mean())
    assert st["median"] == pytest.approx(np.median(deg))
    assert st["stddev"] == pytest.approx(deg.std())
    n, mx, s = N, deg.max(), deg.sum()
    assert st["centralization"] == pytest.approx(
        (n * mx - s) / ((n - 1) * mx)
    )
    x = np.array([deg[u] for u, v in PAIRS])
    y = np.array([deg[v] for u, v in PAIRS])
    r = np.corrcoef(x, y)[0, 1]
    assert st["assortativity"] == pytest.approx(r)


def test_full_profile(spark):
    g = _graph(spark)
    p = profile(g, with_components=True, with_communities=True)
    names = [m["measure"] for m in p["measures"]]
    assert names == ["degree", "coredecomposition", "lcc", "pagerank"]
    for m in p["measures"]:
        assert m["n"] == N
        assert m["min"] <= m["median"] <= m["max"]
        assert math.isfinite(m["stddev"])
    comp = p["partitions"][0]
    assert comp["partition"] == "connected_components"
    assert comp["count"] == 2
    assert comp["max_size"] == 8 and comp["min_size"] == 2
    comm = p["partitions"][1]
    assert comm["partition"] == "communities"
    assert comm["count"] >= 2
    # partitions cover every node
    assert comp["count"] * comp["mean_size"] == pytest.approx(N)


def test_partition_stats_direct(spark):
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 2)],
        "id long, label long",
    )
    st = partition_stats(labels, "toy")
    assert st == {"partition": "toy", "count": 3, "min_size": 1,
                  "max_size": 3, "mean_size": 2.0}


def test_overview_string(spark):
    from networkit_spark.profiling import overview

    g = _graph(spark)
    text = overview(g)
    assert "Network Properties:" in text
    assert f"nodes, edges\t\t\t{N}, {len(PAIRS)}" in text
    assert "number of connected components\t2" in text
    assert "size of largest component\t8 (80.00 %)" in text
    assert "clustering coefficient" in text
    assert "isolated nodes\t\t\t0" in text


def test_overview_directed(spark):
    from networkit_spark.profiling import overview

    g = Graph.from_pandas(spark, [(0, 1), (1, 0), (1, 2)],
                          directed=True, n=3)
    text = overview(g)
    assert "directed?\t\t\tTrue" in text
    # SCCs: {0,1}, {2}
    assert "number of connected components\t2" in text
    assert "clustering coefficient" not in text
