"""Assortativity (Assortativity.cpp formulas) and diameter / effective
diameter (Diameter.cpp, EffectiveDiameter.cpp) vs hand-computed values."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.assortativity import (
    degree_assortativity,
    nominal_assortativity,
)
from networkit_spark.operators.diameter import diameter, effective_diameter


def test_degree_assortativity_k4_minus_edge(spark):
    # degrees 3,2,2,1; edge (x,y) pairs (3,2),(3,2),(3,1),(2,2)
    # -> r = (19 - 11*7/4) / sqrt(0.75 * 0.75) = -1/3
    g = Graph.from_pandas(spark, [(0, 1), (0, 2), (0, 3), (1, 2)], n=4)
    assert degree_assortativity(g) == pytest.approx(-1 / 3)


def test_degree_assortativity_path(spark):
    # P3: pairs (1,2),(2,1) -> perfectly disassortative
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], n=3)
    assert degree_assortativity(g) == pytest.approx(-1.0)


def test_degree_assortativity_degenerate_nan(spark):
    # star: x constant -> B = 0 -> nan (reference divides 0/0)
    g = Graph.from_pandas(spark, [(0, 1), (0, 2), (0, 3)], n=4)
    assert math.isnan(degree_assortativity(g))


def test_nominal_assortativity_two_triangles(spark):
    # triangles {0,1,2} {3,4,5} + bridge (2,3); labels = triangle id
    # diag 6/7, ab 32/49 -> r = 10/17
    from pyspark.sql import functions as F

    g = Graph.from_pandas(
        spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)], n=6
    )
    labels = g.nodes().select("id", (F.col("id") / 3).cast("long").alias("label"))
    assert nominal_assortativity(g, labels) == pytest.approx(10 / 17)


def test_diameter_exact(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    assert diameter(g, algo="exact") == (3, 3)
    star = Graph.from_pandas(spark, [(0, 1), (0, 2), (0, 3)], n=4)
    assert diameter(star, algo="exact") == (2, 2)
    tri = Graph.from_pandas(
        spark, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)], n=6
    )
    assert diameter(tri, algo="exact") == (3, 3)


def test_diameter_disconnected_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1), (2, 3)], n=4)
    with pytest.raises(RuntimeError, match="not connected"):
        diameter(g)
    with pytest.raises(RuntimeError, match="not connected"):
        effective_diameter(g)


def test_diameter_estimated_samples_lower_bound(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    lb, ub = diameter(g, algo="estimated_samples", n_samples=4)
    assert lb == ub == 3  # all sources sampled -> max ecc = diameter


def test_effective_diameter_path(spark):
    # P4, ratio .9 -> threshold 4; per-node h = 3,2,2,3 -> mean 2.5
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)], n=4)
    assert effective_diameter(g, ratio=0.9) == pytest.approx(2.5)


def test_anf_sketches_estimate_quality(spark):
    # K6: every 1-hop neighborhood is the whole graph -> est ~ 6 per node
    import itertools

    from networkit_spark.operators.diameter import anf_sketches

    g = Graph.from_pandas(
        spark, list(itertools.combinations(range(6), 2)), n=6
    )
    out = anf_sketches(g, h=1, k=16, seed=5).collect()
    assert len(out) == 6
    for r in out:
        assert 2.0 <= r["est"] <= 18.0  # FM estimate, k=16 accuracy band


def test_effective_diameter_approximation_matches_exact_shape(spark):
    from networkit_spark.operators.diameter import (
        effective_diameter,
        effective_diameter_approximation,
    )

    g = Graph.from_pandas(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (1, 3)], n=5
    )
    ex = effective_diameter(g)
    ap = effective_diameter_approximation(g, k=8, seed=3)
    assert ap > 0
    assert abs(ap - ex) <= 1.5  # k=8 FM bound on a 5-node fixture
    # deterministic given the seed
    assert ap == effective_diameter_approximation(g, k=8, seed=3)
