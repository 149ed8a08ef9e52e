"""DynBFS / DynDijkstra — incremental (dist, sigma) repair equals a
static recompute, on hand fixtures and seeded batches."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.dynsssp import dyn_sssp_update, sssp_sigma

pytestmark = pytest.mark.usefixtures("spark")


def _g(spark, triples, weighted=False, directed=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in triples],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=directed, weighted=weighted)


def _state(df):
    return {
        int(r["id"]): (float(r["dist"]), int(r["sigma"]))
        for r in df.collect()
    }


def test_static_sigma_bfs(spark):
    # diamond 0-1-3, 0-2-3: sigma(3) = 2
    g = _g(spark, [(0, 1, 1), (0, 2, 1), (1, 3, 1), (2, 3, 1)])
    s = _state(sssp_sigma(g, 0))
    assert s == {0: (0.0, 1), 1: (1.0, 1), 2: (1.0, 1), 3: (2.0, 2)}


def test_update_shortcut_changes_dist_and_sigma(spark):
    base = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)]
    g = _g(spark, base)
    st0 = sssp_sigma(g, 0)
    # insert 0-3: dist(3) 3->1, dist(4) 4->2; sigma unchanged (1s)
    g2 = _g(spark, base + [(0, 3, 1)])
    upd = dyn_sssp_update(
        g2, 0, st0, spark.createDataFrame([(0, 3)], "u long, v long")
    )
    assert _state(upd) == _state(sssp_sigma(g2, 0))
    assert _state(upd)[3] == (1.0, 1) and _state(upd)[4] == (2.0, 1)


def test_update_equal_dist_adds_sigma_only(spark):
    # square 0-1, 0-2, 1-3, then insert 2-3: dist(3) stays 2, sigma 1->2
    base = [(0, 1, 1), (0, 2, 1), (1, 3, 1)]
    g = _g(spark, base)
    st0 = sssp_sigma(g, 0)
    g2 = _g(spark, base + [(2, 3, 1)])
    upd = dyn_sssp_update(
        g2, 0, st0, spark.createDataFrame([(2, 3)], "u long, v long")
    )
    got = _state(upd)
    assert got[3] == (2.0, 2)
    assert got == _state(sssp_sigma(g2, 0))


def test_update_connects_new_region(spark):
    base = [(0, 1, 1), (5, 6, 1), (6, 7, 1)]
    g = _g(spark, base)
    st0 = sssp_sigma(g, 0)
    assert 5 not in _state(st0)
    g2 = _g(spark, base + [(1, 5, 1)])
    upd = dyn_sssp_update(
        g2, 0, st0, spark.createDataFrame([(1, 5)], "u long, v long")
    )
    assert _state(upd) == _state(sssp_sigma(g2, 0))
    assert _state(upd)[7] == (4.0, 1)


def test_seeded_batch_matches_recompute(spark):
    def h(*p):
        return int(hashlib.md5("|".join(map(str, p)).encode()).hexdigest()[:8], 16)

    n = 30
    base = [
        (u, v, 1)
        for u in range(n)
        for v in range(u + 1, n)
        if h("g", u, v) % 100 < 8
    ]
    batch = [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if h("b", u, v) % 100 < 4 and (u, v, 1) not in base
    ]
    g = _g(spark, base)
    st0 = sssp_sigma(g, 0)
    g2 = _g(spark, base + [(u, v, 1) for u, v in batch])
    upd = dyn_sssp_update(
        g2, 0, st0, spark.createDataFrame(batch, "u long, v long")
    )
    assert _state(upd) == _state(sssp_sigma(g2, 0))


def test_weighted_dyn_dijkstra(spark):
    base = [(0, 1, 2), (1, 2, 2), (0, 3, 5), (3, 2, 1)]
    g = _g(spark, base, weighted=True)
    st0 = sssp_sigma(g, 0)
    assert _state(st0)[2] == (4.0, 1)
    # insert 0-2 weight 4: equal-dist second path -> sigma 2
    g2 = _g(spark, base + [(0, 2, 4)], weighted=True)
    upd = dyn_sssp_update(
        g2, 0, st0,
        spark.createDataFrame([(0, 2, 4.0)], "u long, v long, w double"),
    )
    got = _state(upd)
    assert got[2] == (4.0, 2)
    assert got == _state(sssp_sigma(g2, 0))
