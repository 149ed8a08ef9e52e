"""Round-5 generator breadth: ring lattice, Watts-Strogatz, Chung-Lu,
SBM, Havel-Hakimi, Barabasi-Albert, Dorogovtsev-Mendes, powerlaw
sequence, configuration model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import (
    barabasi_albert,
    chung_lu,
    configuration_model,
    dorogovtsev_mendes,
    havel_hakimi,
    powerlaw_degree_sequence,
    regular_ring_lattice,
    stochastic_blockmodel,
    watts_strogatz,
)

pytestmark = pytest.mark.usefixtures("spark")


def _degmap(g):
    return {int(r["id"]): int(r["degree"]) for r in g.degrees().collect()}


def test_ring_lattice_regular(spark):
    g = regular_ring_lattice(spark, 12, 2)
    assert g.number_of_edges() == 24
    assert set(_degmap(g).values()) == {4}


def test_watts_strogatz_p0_is_lattice(spark):
    ws = watts_strogatz(spark, 14, 2, p=0.0, seed=5)
    rl = regular_ring_lattice(spark, 14, 2)
    a = sorted(map(tuple, ws.edges.select("src", "dst").collect()))
    b = sorted(map(tuple, rl.edges.select("src", "dst").collect()))
    assert a == b


def test_watts_strogatz_rewires_and_deterministic(spark):
    g1 = watts_strogatz(spark, 30, 2, p=0.5, seed=7)
    g2 = watts_strogatz(spark, 30, 2, p=0.5, seed=7)
    e1 = sorted(map(tuple, g1.edges.select("src", "dst").collect()))
    e2 = sorted(map(tuple, g2.edges.select("src", "dst").collect()))
    assert e1 == e2
    lattice = sorted(
        map(
            tuple,
            regular_ring_lattice(spark, 30, 2)
            .edges.select("src", "dst")
            .collect(),
        )
    )
    assert e1 != lattice  # p=0.5 must rewire something
    assert not g1.edges.filter(F.col("src") == F.col("dst")).count()


def test_chung_lu_edge_count_near_expectation(spark):
    degs = [6] * 10 + [2] * 30
    s = sum(degs)
    expected = sum(
        min(1.0, degs[i] * degs[j] / s)
        for i in range(len(degs))
        for j in range(i + 1, len(degs))
    )
    m = chung_lu(spark, degs, seed=11).number_of_edges()
    assert abs(m - expected) < 4 * (expected**0.5) + 2


def test_stochastic_blockmodel_extreme_probs(spark):
    membership = [0] * 4 + [1] * 4
    g = stochastic_blockmodel(
        spark, membership, [[1.0, 0.0], [0.0, 1.0]], seed=3
    )
    edges = sorted(map(tuple, g.edges.select("src", "dst").collect()))
    want = sorted(
        (i, j)
        for i in range(8)
        for j in range(i + 1, 8)
        if membership[i] == membership[j]
    )
    assert edges == want


def test_havel_hakimi_realizes_sequence(spark):
    seq = [3, 3, 2, 2, 2, 2]
    g = havel_hakimi(spark, seq)
    dm = _degmap(g)
    assert [dm.get(i, 0) for i in range(len(seq))] == seq


def test_havel_hakimi_rejects_unrealizable(spark):
    with pytest.raises(ValueError, match="not realizable"):
        havel_hakimi(spark, [3, 1])


def test_barabasi_albert_shape(spark):
    g = barabasi_albert(spark, k=2, n_max=25, seed=9)
    assert g.nodes().count() == 25
    dm = _degmap(g)
    # every post-seed node attaches to k distinct targets
    assert all(dm.get(v, 0) >= 2 for v in range(2, 25))
    assert not g.edges.filter(F.col("src") == F.col("dst")).count()
    # determinism
    g2 = barabasi_albert(spark, k=2, n_max=25, seed=9)
    assert sorted(map(tuple, g.edges.collect())) == sorted(
        map(tuple, g2.edges.collect())
    )


def test_dorogovtsev_mendes_edge_count(spark):
    g = dorogovtsev_mendes(spark, 20, seed=1)
    # triangle + 2 edges per added node; duplicates impossible (new node)
    assert g.edges.count() == 3 + 2 * 17
    assert min(_degmap(g).values()) >= 2


def test_powerlaw_degree_sequence_bounds():
    seq = powerlaw_degree_sequence(200, gamma=-2.5, min_deg=1, max_deg=20)
    assert len(seq) == 200
    assert min(seq) >= 1 and max(seq) <= 21  # +1 for the parity bump
    assert sum(seq) % 2 == 0
    assert seq == powerlaw_degree_sequence(
        200, gamma=-2.5, min_deg=1, max_deg=20
    )


def test_configuration_model_preserves_degrees(spark):
    seq = [3, 3, 2, 2, 2, 2, 2, 2]
    g = configuration_model(spark, seq, seed=13, rounds=2)
    dm = _degmap(g)
    assert sorted(dm.get(i, 0) for i in range(len(seq))) == sorted(seq)


def test_chung_lu_alam_etal_matches_python_replica(spark):
    """Exact edge-set equality vs a pure-python replay of the md5
    Bernoulli field (the draw is derandomized, so the match is exact,
    not statistical)."""
    from networkit_spark.sources.generators import (
        _py_md5_frac,
        chung_lu_alam_etal,
    )

    degrees = [5, 1, 9, 3, 3, 7, 2, 60, 4, 4, 1, 6]  # 60 caps to n-1
    n = len(degrees)
    g = chung_lu_alam_etal(spark, degrees, seed=13)
    got = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in g.edges.select("src", "dst").collect()
    )
    dc = sorted(min(d, n - 1) for d in degrees)
    s = float(sum(dc))
    want = sorted(
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if _py_md5_frac("cla|13", u, v) < dc[u] * dc[v] / s
    )
    assert got == want
    assert want  # non-degenerate fixture
    assert g.nodes().count() == n


def test_chung_lu_alam_etal_caps_and_relabels(spark):
    """Node n-1 carries the LARGEST capped degree after the counting
    sort; a degenerate all-equal sequence keeps every pair at the same
    probability."""
    from networkit_spark.sources.generators import chung_lu_alam_etal

    # all-zero degrees -> empty edge set, nodes still present
    g = chung_lu_alam_etal(spark, [0, 0, 0, 0], seed=1)
    assert g.edges.count() == 0
    assert g.nodes().count() == 4
