"""EdgeSwitching null model: degree preservation + determinism
(randomization/EdgeSwitching.cpp, batched-round variant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.randomization import edge_switching
from networkit_spark.sources.generators import erdos_renyi_edges


@pytest.fixture(scope="module")
def er(spark):
    e = erdos_renyi_edges(spark, n_nodes=200, n_edges=1000, seed=11)
    return Graph.from_edges(
        e.filter(F.col("src") != F.col("dst")), dedup=True,
        vertices=spark.range(200).select(F.col("id").cast("long").alias("id")),
    )


def _degseq(g):
    return sorted(
        (r["id"], r["degree"]) for r in g.degrees().collect()
    )


def test_degree_sequence_preserved(spark, er):
    before = _degseq(er)
    out, applied = edge_switching(er, rounds=3, seed=7)
    assert applied > 0  # the null model actually rewired something
    assert _degseq(out) == before
    assert out.edges.count() == er.edges.count()


def test_no_self_loops_or_multi_edges(spark, er):
    out, _ = edge_switching(er, rounds=3, seed=7)
    e = out.edges
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    assert e.select("src", "dst").distinct().count() == e.count()


def test_deterministic(spark, er):
    a, na = edge_switching(er, rounds=2, seed=3)
    b, nb = edge_switching(er, rounds=2, seed=3)
    assert na == nb
    ea = sorted((r["src"], r["dst"]) for r in a.edges.collect())
    eb = sorted((r["src"], r["dst"]) for r in b.edges.collect())
    assert ea == eb


def test_seed_changes_result(spark, er):
    a, _ = edge_switching(er, rounds=2, seed=3)
    b, _ = edge_switching(er, rounds=2, seed=4)
    ea = sorted((r["src"], r["dst"]) for r in a.edges.collect())
    eb = sorted((r["src"], r["dst"]) for r in b.edges.collect())
    assert ea != eb


def test_directed_rejected(spark):
    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        edge_switching(g)


def test_null_model_washes_out_assortativity(spark):
    """A strongly degree-assortative construction loses most of its
    correlation under rewiring (the operator's actual use case)."""
    from networkit_spark.operators.assortativity import degree_assortativity

    # K8 clique (degree 7) + 40-cycle (degree 2) + one connector:
    # like-links-like -> strongly positive degree assortativity
    clique = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    cycle = [(8 + i, 8 + (i + 1) % 40) for i in range(40)]
    g = Graph.from_pandas(spark, clique + cycle + [(0, 8)], n=48)
    base = degree_assortativity(g)
    assert base > 0.5
    out, applied = edge_switching(g, rounds=4, seed=5)
    assert applied > 0
    after = degree_assortativity(out)
    assert after < base  # rewiring washes the engineered correlation out


# --- DegreePreservingShuffle (DegreePreservingShuffle.cpp) -----------------


def test_shuffle_is_bijection_and_preserves_degrees(spark, er):
    from networkit_spark.operators.randomization import (
        degree_preserving_shuffle,
    )

    mapping, out = degree_preserving_shuffle(er, seed=5)
    rows = mapping.collect()
    ids = sorted(r["id"] for r in rows)
    news = sorted(r["new_id"] for r in rows)
    assert ids == news == sorted(
        r["id"] for r in er.nodes().collect()
    )  # bijection over the node set
    # PER-NODE degree preservation (ids permuted within degree classes)
    assert _degseq(out) == _degseq(er)
    # nontrivial: an ER graph has big degree classes, something moves
    assert any(r["id"] != r["new_id"] for r in rows)


def test_shuffle_directed_uses_inout_classes(spark):
    from networkit_spark.operators.randomization import (
        degree_preserving_shuffle,
    )

    # two nodes with (in,out)=(0,1), two with (1,0): classes {0,2},{1,3}
    g = Graph.from_pandas(spark, [(0, 1), (2, 3)], n=4, directed=True)
    mapping, out = degree_preserving_shuffle(g, seed=1)
    m = {r["id"]: r["new_id"] for r in mapping.collect()}
    assert {m[0], m[2]} == {0, 2} and {m[1], m[3]} == {1, 3}
    din = {
        r["id"]: r["din"]
        for r in g.edges.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("din"))
        .collect()
    }
    dout_new = {
        r["id"]: r["c"]
        for r in out.edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert set(dout_new) == {m[0], m[2]} == {0, 2}
    assert din == {1: 1, 3: 1}


def test_shuffle_deterministic(spark, er):
    from networkit_spark.operators.randomization import (
        degree_preserving_shuffle,
    )

    a, _ = degree_preserving_shuffle(er, seed=9)
    b, _ = degree_preserving_shuffle(er, seed=9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- GlobalCurveball (GlobalCurveball.cpp, batched trades) ----------------


def test_curveball_preserves_degrees(spark, er):
    from networkit_spark.operators.randomization import global_curveball

    before = _degseq(er)
    out = global_curveball(er, rounds=3, seed=7)
    assert _degseq(out) == before
    assert out.edges.count() == er.edges.count()
    e = out.edges
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    assert e.select("src", "dst").distinct().count() == e.count()


def test_curveball_rewires_and_is_deterministic(spark, er):
    from networkit_spark.operators.randomization import global_curveball

    a = global_curveball(er, rounds=2, seed=3)
    b = global_curveball(er, rounds=2, seed=3)
    ea = sorted((r["src"], r["dst"]) for r in a.edges.collect())
    eb = sorted((r["src"], r["dst"]) for r in b.edges.collect())
    assert ea == eb
    orig = sorted(
        (r["src"], r["dst"])
        for r in er.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).collect()
    )
    assert ea != orig  # trades actually happened
    c = global_curveball(er, rounds=2, seed=4)
    ec = sorted((r["src"], r["dst"]) for r in c.edges.collect())
    assert ec != ea  # seed-sensitive


def test_curveball_directed_raises(spark):
    from networkit_spark.operators.randomization import global_curveball

    g = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        global_curveball(g)
