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
