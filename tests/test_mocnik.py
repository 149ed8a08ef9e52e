"""MocnikGenerator: bucketed expanding-ring plan vs a brute-force
all-pairs replica (points, distMin, edge set, weights), dims 2 and 3,
determinism, directedness, parameter validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import (
    _py_md5_frac,
    mocnik_graph,
)


def _py_points(n, seed, dim, cand):
    pts = []
    for i in range(cand):
        v = [_py_md5_frac(f"mck|{seed}|{j}", i) for j in range(dim)]
        # (x)*(x), not x**2: CPython pow goes through libm and can be
        # 1 ulp off the multiply that Spark codegen emits
        if sum((x - 0.5) * (x - 0.5) for x in v) <= 0.25:
            pts.append(v)
            if len(pts) == n:
                break
    return pts


def _py_mocnik(n, k, seed, dim, cand):
    pts = _py_points(n, seed, dim, cand)
    assert len(pts) == n

    def d(a, b):
        return math.sqrt(sum((x - y) * (x - y) for x, y in zip(a, b)))

    dm = [
        min(d(pts[i], pts[j]) for j in range(n) if j != i)
        for i in range(n)
    ]
    edges = {
        (i, j, d(pts[i], pts[j]))
        for i in range(n)
        for j in range(n)
        if i != j and d(pts[i], pts[j]) <= k * dm[i]
    }
    return pts, dm, edges


@pytest.mark.parametrize("dim", [2, 3])
def test_matches_bruteforce(spark, dim):
    n, k, seed = 120, 2.5, 7
    cand = 4 * n + 64
    edges, pts_df, dm_df = mocnik_graph(
        spark, n, k=k, dim=dim, seed=seed, weighted=True
    )
    pts, dm, want = _py_mocnik(n, k, seed, dim, cand)

    got_pts = {
        int(r["id"]): [float(r[f"x{j}"]) for j in range(dim)]
        for r in pts_df.collect()
    }
    assert len(got_pts) == n
    for i in range(n):
        assert got_pts[i] == pts[i], i

    got_dm = {int(r["id"]): float(r["dm"]) for r in dm_df.collect()}
    for i in range(n):
        assert got_dm[i] == pytest.approx(dm[i], abs=0.0), i

    got = {
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in edges.collect()
    }
    assert got == want


def test_directed_and_deterministic(spark):
    e1, _, _ = mocnik_graph(spark, 80, k=2.0, seed=3)
    e2, _, _ = mocnik_graph(spark, 80, k=2.0, seed=3)
    s1 = sorted((int(r["src"]), int(r["dst"])) for r in e1.collect())
    s2 = sorted((int(r["src"]), int(r["dst"])) for r in e2.collect())
    assert s1 == s2
    # every node has at least one out-edge (its nearest neighbor), and
    # the relation is NOT symmetric in general (directed model)
    out = {s for s, _ in s1}
    assert out == set(range(80))
    asym = [(s, d) for s, d in s1 if (d, s) not in set(s1)]
    assert asym, "expected at least one asymmetric pair"


def test_k_must_exceed_one(spark):
    with pytest.raises(ValueError):
        mocnik_graph(spark, 10, k=1.0)
    with pytest.raises(ValueError):
        mocnik_graph(spark, 1, k=2.0)
