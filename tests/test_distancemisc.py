"""NeighborhoodFunction / Volume / SPSP wrappers — fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distancemisc import (
    hop_plot_approximation,
    multi_target_bfs,
    neighborhood_function,
    neighborhood_function_approximation,
    spsp,
    volume,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pairs, weighted=False):
    df = spark.createDataFrame(
        [(u, v, float(w)) for u, v, w in pairs],
        "src long, dst long, weight double",
    )
    return Graph(df, None, directed=False, weighted=weighted)


def test_neighborhood_function_path(spark):
    # path 0-1-2-3: NF(1)=6 ordered pairs, NF(2)=6+4, NF(3)=12
    g = _mk(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    nf = {r["h"]: r["nf"] for r in neighborhood_function(g).collect()}
    assert nf == {1: 6, 2: 10, 3: 12}


def test_neighborhood_function_rejects_disconnected(spark):
    g = _mk(spark, [(0, 1, 1), (2, 3, 1)])
    with pytest.raises(RuntimeError):
        neighborhood_function(g)


def test_nf_approximation_monotone_and_saturating(spark):
    g = _mk(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    est = neighborhood_function_approximation(g, k=8)
    vals = [r["est"] for r in est.orderBy("h").collect()]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    hp = hop_plot_approximation(g, k=8)
    fr = [r["frac"] for r in hp.orderBy("h").collect()]
    assert fr[0] == pytest.approx(5 / 25)
    assert all(b >= a for a, b in zip(fr, fr[1:]))


def test_volume_every_node_sampled(spark):
    # cycle of 5: every 1-ball has 3 nodes, every 2-ball all 5
    g = _mk(spark, [(i, (i + 1) % 5, 1) for i in range(5)])
    out = {r["r"]: r["volume"] for r in volume(g, [1, 2], samples=5).collect()}
    assert out == {1.0: 3.0, 2.0: 5.0}


def test_volume_weighted_ball(spark):
    # weighted path: 0 -1.0- 1 -2.5- 2 ; ball(r=3) from 0 = {0,1}
    g = _mk(spark, [(0, 1, 1.0), (1, 2, 2.5)], weighted=True)
    out = volume(g, [3.0], samples=1, seed=1)
    # whichever single node md5 picks, its 3-ball holds at least 2 nodes
    assert out.collect()[0]["volume"] >= 2.0


def test_spsp_and_multi_target(spark):
    g = _mk(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)])
    rows = sorted(
        tuple(r) for r in spsp(g, [0, 4], [2]).collect()
    )
    assert rows == [(0, 2, 2), (4, 2, 2)]
    mt = sorted(tuple(r) for r in multi_target_bfs(g, 0, [3, 4]).collect())
    assert mt == [(3, 3), (4, 4)]


def test_spsp_weighted_uses_dijkstra(spark):
    g = _mk(spark, [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0)], weighted=True)
    rows = {(r["s"], r["t"]): r["dist"] for r in spsp(g, [0], [1]).collect()}
    assert rows[(0, 1)] == 2.0


def test_algebraic_distance_properties(spark):
    from networkit_spark.operators.distancemisc import algebraic_distance

    # barbell: intra-cluster edges should look closer than the bridge
    pairs = [(0, 1, 1), (1, 2, 1), (2, 0, 1), (3, 4, 1), (4, 5, 1),
             (5, 3, 1), (2, 3, 1)]
    g = _mk(spark, pairs)
    out = {(r["src"], r["dst"]): r["score"]
           for r in algebraic_distance(g, num_systems=6,
                                       num_iters=20).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    bridge = out[(2, 3)]
    intra = [v for k, v in out.items() if k != (2, 3)]
    assert bridge > max(intra)
    # deterministic replay
    out2 = {(r["src"], r["dst"]): r["score"]
            for r in algebraic_distance(g, num_systems=6,
                                        num_iters=20).collect()}
    assert out == out2
