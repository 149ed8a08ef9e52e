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
