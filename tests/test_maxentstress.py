"""MaxentStress vs a pure-python replica of the deterministic contract
(reference networkit/cpp/viz/MaxentStress.cpp semantics under the
documented md5-init / fixed-Jacobi / exact-repulsion deviations)."""

from __future__ import annotations

import hashlib
import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.maxentstress import maxent_stress

pytestmark = pytest.mark.usefixtures("spark")


def _frac(*parts):
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:13], 16) / float(2**52)


def _replica(pairs, n, dim, msa, alpha, reduction, final_alpha,
             jiters, omega, seed):
    nbrs = {i: {} for i in range(n)}
    for u, v in pairs:
        nbrs[u][v] = 1.0
        nbrs[v][u] = 1.0
    x = {
        (i, d): 2.0 * _frac(f"{seed}|mxs|{i}|{d}") - 1.0
        for i in range(n) for d in range(dim)
    }

    def jacobi(b):
        w = {(i, j): 1.0 / (dw * dw) for i in nbrs for j, dw in nbrs[i].items()}
        deg = {i: sum(w[(i, j)] for j in nbrs[i]) for i in range(n)}
        y = {(i, d): 0.0 for i in range(n) for d in range(dim)}
        for _ in range(jiters):
            y2 = {}
            for i in range(n):
                for d in range(dim):
                    if deg[i] > 0:
                        s = sum(w[(i, j)] * y[(j, d)] for j in nbrs[i])
                        y2[(i, d)] = (1 - omega) * y[(i, d)] + omega * (
                            b[(i, d)] + s
                        ) / deg[i]
                    else:
                        y2[(i, d)] = y[(i, d)]
            y = y2
        return y

    rep = None
    cur_lb = None
    cur_alpha = alpha
    while True:
        for s in range(msa):
            lb = float("-inf") if s == 0 else math.floor(5 * math.log(s))
            if lb != cur_lb or rep is None:
                raw = {(i, d): 0.0 for i in range(n) for d in range(dim)}
                for i in range(n):
                    for j in range(n):
                        if j == i or j in nbrs[i]:
                            continue
                        d2 = max(
                            sum((x[(i, d)] - x[(j, d)]) ** 2
                                for d in range(dim)),
                            1e-3,
                        )
                        for d in range(dim):
                            raw[(i, d)] += (x[(i, d)] - x[(j, d)]) / d2
                for d in range(dim):
                    nrm = math.sqrt(
                        sum(raw[(i, d)] ** 2 for i in range(n))
                    )
                    for i in range(n):
                        raw[(i, d)] /= nrm
                rep = raw
                cur_lb = lb
            b = {(i, d): 0.0 for i in range(n) for d in range(dim)}
            for i in range(n):
                for j, dw in nbrs[i].items():
                    dist = max(
                        math.sqrt(sum((x[(i, d)] - x[(j, d)]) ** 2
                                      for d in range(dim))),
                        1e-5,
                    )
                    w = 1.0 / (dw * dw) * dw / dist
                    for d in range(dim):
                        b[(i, d)] += w * (x[(i, d)] - x[(j, d)])
            if s < msa // 5:
                for d in range(dim):
                    nrm = math.sqrt(sum(b[(i, d)] ** 2 for i in range(n)))
                    for i in range(n):
                        b[(i, d)] /= nrm
            for i in range(n):
                for d in range(dim):
                    b[(i, d)] += cur_alpha * rep[(i, d)]
            for d in range(dim):
                mu = sum(b[(i, d)] for i in range(n)) / n
                for i in range(n):
                    b[(i, d)] -= mu
            x = jacobi(b)
        cur_alpha *= reduction
        if cur_alpha < final_alpha:
            return x


PAIRS = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4), (4, 5),
         (5, 6), (6, 4)]


def test_maxent_stress_matches_replica(spark):
    n, dim, msa, jiters = 7, 2, 5, 8
    g = Graph.from_pandas(spark, PAIRS, n=n)
    coords, info = maxent_stress(
        g, dim=dim, max_solves_per_alpha=msa, alpha=1.0,
        alpha_reduction=0.3, final_alpha=0.5, jacobi_iters=jiters,
        jacobi_omega=0.5, seed=11,
    )
    assert info.iterations == msa  # one alpha level
    got = {(int(r["id"]), int(r["d"])): float(r["x"])
           for r in coords.collect()}
    want = _replica(PAIRS, n, dim, msa, 1.0, 0.3, 0.5, jiters, 0.5, 11)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_maxent_stress_disconnected_raises(spark):
    g = Graph.from_pandas(spark, [(0, 1), (2, 3)], n=4)
    with pytest.raises(ValueError, match="not connected"):
        maxent_stress(g)


def _metrics_replica(pairs, n, coords, q, final_alpha):
    """Pure-python maxent_metrics (MaxentStress.cpp:207-362)."""
    nbrs = {i: set() for i in range(n)}
    for u, v in pairs:
        nbrs[u].add(v)
        nbrs[v].add(u)
    dim = max(d for _, d in coords) + 1

    def geo(a, b):
        return math.sqrt(
            sum((coords[(a, d)] - coords[(b, d)]) ** 2 for d in range(dim))
        )

    dist = {}
    for s in range(n):
        dist[(s, s)] = 0
        frontier, hop, seen = [s], 0, {s}
        while frontier:
            nxt = []
            for u in frontier:
                for v in nbrs[u]:
                    if v not in seen:
                        seen.add(v)
                        dist[(s, v)] = hop + 1
                        nxt.append(v)
            frontier, hop = nxt, hop + 1
    top = bot = fs = 0.0
    for (s, v), d in dist.items():
        if d < 1e-5:
            continue
        gg = geo(s, v)
        top += gg / d
        bot += gg * gg / (d * d)
        fs += (gg - d) * (gg - d) / (d * d)
    ent = 0.0
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            dc = max(geo(a, b), 1e-5)
            ent += math.log(dc) if abs(q) < 0.001 else dc ** (-q)
    energy = ent_e = mde = ld = 0.0
    card = 0
    for a in range(n):
        for b in nbrs[a]:
            w, gg = 1.0, geo(a, b)
            dc = max(gg, 1e-5)
            energy += (dc - w) * (dc - w) / (w * w)
            ent_e += math.log(dc) if abs(q) < 0.001 else dc ** (-q)
            mde += abs(gg - w) / w
            ld += (w - gg) * (w - gg)
            card += 1
    ent_t = ent - ent_e
    if abs(q) > 0.001:
        ent_t *= -(1.0 if q >= 0.0 else -1.0)
    return {
        "scaling_factor": top / bot,
        "full_stress": fs / 2.0,
        "maxent": (energy - final_alpha * ent_t) / 2.0,
        "mean_distance_error": mde / card,
        "ldme": math.sqrt(ld / card),
    }


@pytest.mark.parametrize("q", [0.0, 2.0, 1.5])
def test_maxent_metrics_matches_replica(spark, q):
    from networkit_spark.operators.maxentstress import _h13, maxent_metrics
    from pyspark.sql import functions as F

    n = 7
    g = Graph.from_pandas(spark, PAIRS, n=n)
    coords_df = None
    for d in range(2):
        part = g.nodes().select(
            "id", F.lit(d).cast("long").alias("d"),
            (2.0 * _h13(11, "mxm", F.col("id"), d) - 1.0).alias("x"),
        )
        coords_df = part if coords_df is None else coords_df.unionByName(part)
    got = maxent_metrics(g, coords_df, q=q, final_alpha=0.008).collect()[0]
    coords = {
        (i, d): 2.0 * _frac(f"11|mxm|{i}|{d}") - 1.0
        for i in range(n) for d in range(2)
    }
    want = _metrics_replica(PAIRS, n, coords, q, 0.008)
    for k, v in want.items():
        assert float(got[k]) == pytest.approx(v, abs=1e-9), k


def test_maxent_metrics_quantized_matches_unquantized(spark):
    """quantum snaps each term to a 1e-9 grid — the quantized sums must
    agree with the float sums to the grid times the term count."""
    from networkit_spark.operators.maxentstress import _h13, maxent_metrics
    from pyspark.sql import functions as F

    n = 7
    g = Graph.from_pandas(spark, PAIRS, n=n)
    coords_df = None
    for d in range(2):
        part = g.nodes().select(
            "id", F.lit(d).cast("long").alias("d"),
            (2.0 * _h13(11, "mxm", F.col("id"), d) - 1.0).alias("x"),
        )
        coords_df = part if coords_df is None else coords_df.unionByName(part)
    plain = maxent_metrics(g, coords_df, q=2.0).collect()[0]
    quant = maxent_metrics(g, coords_df, q=2.0, quantum=1e-9).collect()[0]
    for k in plain.asDict():
        assert float(quant[k]) == pytest.approx(float(plain[k]), abs=1e-4), k


def test_scale_layout_normalizes_scaling_factor(spark):
    """factor(s * X) = factor(X) / s, so after scaleLayout the factor
    is exactly 1 (MaxentStress.cpp:253-262)."""
    from networkit_spark.operators.maxentstress import (
        _h13, maxent_metrics, scale_layout,
    )
    from pyspark.sql import functions as F

    g = Graph.from_pandas(spark, PAIRS, n=7)
    coords_df = None
    for d in range(2):
        part = g.nodes().select(
            "id", F.lit(d).cast("long").alias("d"),
            (2.0 * _h13(11, "mxm", F.col("id"), d) - 1.0).alias("x"),
        )
        coords_df = part if coords_df is None else coords_df.unionByName(part)
    scaled = scale_layout(g, coords_df)
    m = maxent_metrics(g, scaled).collect()[0]
    assert float(m["scaling_factor"]) == pytest.approx(1.0, abs=1e-9)
