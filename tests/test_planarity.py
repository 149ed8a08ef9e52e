"""LeftRightPlanarityCheck (planarity/LeftRightPlanarityCheck.cpp) —
reference gtest fixture shapes (paths, cycles, stars, trees, wheels,
complete/bipartite thresholds, Petersen) plus constructive
triangulations and Kuratowski subdivisions."""

from __future__ import annotations

import itertools

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.planarity import left_right_planarity


def _planar(spark, edges, n):
    g = Graph.from_pandas(spark, edges, n=n)
    return left_right_planarity(g)


def test_trivial_and_classic_planar(spark):
    # empty / single node / path / cycle / star / binary tree / wheel
    assert _planar(spark, [], 1)
    assert _planar(spark, [(i, i + 1) for i in range(9)], 10)      # path
    assert _planar(spark, [(i, (i + 1) % 8) for i in range(8)], 8)  # cycle
    assert _planar(spark, [(0, i) for i in range(1, 9)], 9)        # star
    tree = [(i, 2 * i + 1) for i in range(5)] + [(i, 2 * i + 2) for i in range(4)]
    assert _planar(spark, tree, 11)
    wheel = [(i, (i + 1) % 6) for i in range(6)] + [(6, i) for i in range(6)]
    assert _planar(spark, wheel, 7)


def test_complete_graph_threshold(spark):
    for n in (2, 3, 4):
        edges = list(itertools.combinations(range(n), 2))
        assert _planar(spark, edges, n), f"K{n} must be planar"
    k5 = list(itertools.combinations(range(5), 2))
    assert not _planar(spark, k5, 5)
    k6 = list(itertools.combinations(range(6), 2))
    assert not _planar(spark, k6, 6)  # Euler reject (15 > 12)


def test_bipartite_threshold(spark):
    k23 = [(a, b) for a in (0, 1) for b in (2, 3, 4)]
    assert _planar(spark, k23, 5)
    k33 = [(a, b) for a in (0, 1, 2) for b in (3, 4, 5)]
    assert not _planar(spark, k33, 6)


def test_petersen_nonplanar(spark):
    outer = [(i, (i + 1) % 5) for i in range(5)]
    spokes = [(i, i + 5) for i in range(5)]
    inner = [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    assert not _planar(spark, outer + spokes + inner, 10)


def test_k5_subdivision_nonplanar(spark):
    # subdivide every edge of K5 once: still non-planar, passes Euler
    edges = []
    nxt = 5
    for a, b in itertools.combinations(range(5), 2):
        edges += [(a, nxt), (nxt, b)]
        nxt += 1
    assert not _planar(spark, edges, nxt)


def test_triangulation_planar(spark):
    # maximal planar graph built constructively: start from a triangle,
    # repeatedly place a new vertex inside a face and join its 3 corners
    edges = {(0, 1), (0, 2), (1, 2)}
    faces = [(0, 1, 2)]
    nxt = 3
    import hashlib

    while nxt < 30:
        h = int(hashlib.md5(str(nxt).encode()).hexdigest()[:8], 16)
        a, b, c = faces[h % len(faces)]
        faces.remove((a, b, c))
        faces += [(a, b, nxt), (a, c, nxt), (b, c, nxt)]
        edges |= {(a, nxt), (b, nxt), (c, nxt)}
        nxt += 1
    assert _planar(spark, sorted(edges), nxt)
    # m = 3n - 6 exactly: one more edge anywhere -> Euler reject
    assert len(edges) == 3 * nxt - 6


def test_disconnected_and_multi_component(spark):
    # planar components stay planar; one K5 component poisons the graph
    k4 = list(itertools.combinations(range(4), 2))
    path = [(4 + i, 5 + i) for i in range(4)]
    assert _planar(spark, k4 + path, 9)
    k5 = [(9 + a, 9 + b) for a, b in itertools.combinations(range(5), 2)]
    assert not _planar(spark, k4 + path + k5, 14)


def test_grid_planar(spark):
    W, H = 5, 4
    edges = []
    for y in range(H):
        for x in range(W):
            v = y * W + x
            if x + 1 < W:
                edges.append((v, v + 1))
            if y + 1 < H:
                edges.append((v, v + W))
    assert _planar(spark, edges, W * H)


def test_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        left_right_planarity(g)
