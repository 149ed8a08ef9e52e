"""OverlappingNMIDistance vs a driver replica of the reference math
(OverlappingNMIDistance.cpp:13-268)."""

from __future__ import annotations

import math
import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.overlapnmi import overlapping_nmi_distance


def _replica(n, cov_x, cov_y, normalization="max"):
    def h(w):
        return -w * math.log2(w / n) if w > 0 else 0.0

    def ent(s):
        return h(s) + h(n - s)

    sizes_x, sizes_y, inter = {}, {}, {}
    for u, subs in cov_x.items():
        for i in subs:
            sizes_x[i] = sizes_x.get(i, 0) + 1
            for j in cov_y.get(u, ()):
                inter[(i, j)] = inter.get((i, j), 0) + 1
    for u, subs in cov_y.items():
        for j in subs:
            sizes_y[j] = sizes_y.get(j, 0) + 1
    if (not sizes_x) != (not sizes_y):
        return 1.0
    if not sizes_x and not sizes_y:
        return 0.0

    def star(xi, yj, r):
        a, b, c, d = n + r - xi - yj, yj - r, xi - r, r
        if h(a) + h(d) >= h(b) + h(c):
            return h(a) + h(b) + h(c) + h(d) - ent(yj)
        return ent(xi)

    cxy = {i: ent(s) for i, s in sizes_x.items()}
    cyx = {j: ent(s) for j, s in sizes_y.items()}
    for (i, j), r in inter.items():
        cxy[i] = min(cxy[i], star(sizes_x[i], sizes_y[j], r))
        cyx[j] = min(cyx[j], star(sizes_y[j], sizes_x[i], r))
    hx = sum(ent(s) for s in sizes_x.values())
    hy = sum(ent(s) for s in sizes_y.values())
    mi = 0.5 * (hx - sum(cxy.values()) + hy - sum(cyx.values()))
    hx, hy = max(hx, 0.0), max(hy, 0.0)
    if hx == 0.0 and hy == 0.0:
        return 0.0  # 1 - 1
    if (hx == 0.0 or hy == 0.0) and normalization in ("min", "geometric_mean"):
        return 1.0  # 1 - 0
    if normalization == "max":
        nmi = mi / max(hx, hy)
    elif normalization == "min":
        nmi = mi / min(hx, hy)
    elif normalization == "geometric_mean":
        nmi = mi / math.sqrt(hx * hy)
    elif normalization == "arithmetic_mean":
        nmi = 2 * mi / (hx + hy)
    else:
        nmi = mi / (hx + hy - mi)
    return 1.0 - min(max(nmi, 0.0), 1.0)


def _graph(spark, n):
    return Graph(
        spark.createDataFrame(
            [(i, (i + 1) % n, 1.0) for i in range(n)],
            "src long, dst long, weight double",
        ),
        spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=False,
        weighted=True,
    )


def _covers(rng, n, kx, ky, p_extra):
    cov_x = {u: {u % kx} for u in range(n)}
    cov_y = {u: {(u * 3 + 1) % ky} for u in range(n)}
    for u in range(n):
        if rng.random() < p_extra:
            cov_x[u].add((u * 7 + 2) % kx)
        if rng.random() < p_extra:
            cov_y[u].add((u * 5 + 3) % ky)
    return cov_x, cov_y


@pytest.mark.parametrize("norm", ["max", "min", "arithmetic_mean",
                                  "geometric_mean", "joint_entropy"])
def test_matches_replica(spark, norm):
    n = 40
    rng = random.Random(13)
    cov_x, cov_y = _covers(rng, n, 4, 6, 0.4)
    g = _graph(spark, n)
    xdf = spark.createDataFrame(
        [(u, int(s)) for u, subs in cov_x.items() for s in subs],
        "id long, subset long",
    )
    ydf = spark.createDataFrame(
        [(u, int(s)) for u, subs in cov_y.items() for s in subs],
        "id long, subset long",
    )
    got = overlapping_nmi_distance(g, xdf, ydf, norm)
    want = _replica(n, cov_x, cov_y, norm)
    assert got == pytest.approx(want, abs=1e-12)


def test_identical_covers_zero_distance(spark):
    n = 20
    g = _graph(spark, n)
    xdf = spark.createDataFrame(
        [(u, u % 3) for u in range(n)], "id long, subset long"
    )
    assert overlapping_nmi_distance(g, xdf, xdf) == pytest.approx(0.0, abs=1e-9)


def test_partition_special_case_vs_disjoint(spark):
    # disjoint one-block vs n singletons: far apart under MAX norm
    n = 16
    g = _graph(spark, n)
    one = spark.createDataFrame([(u, 0) for u in range(n)], "id long, subset long")
    singles = spark.createDataFrame(
        [(u, u) for u in range(n)], "id long, subset long"
    )
    d = overlapping_nmi_distance(g, one, singles)
    cov_one = {u: {0} for u in range(n)}
    cov_s = {u: {u} for u in range(n)}
    assert d == pytest.approx(_replica(n, cov_one, cov_s), abs=1e-12)


def test_unknown_normalization_raises(spark):
    g = _graph(spark, 4)
    xdf = spark.createDataFrame([(0, 0)], "id long, subset long")
    with pytest.raises(ValueError):
        overlapping_nmi_distance(g, xdf, xdf, "bogus")
