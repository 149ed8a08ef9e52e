"""DynamicHyperbolicGenerator (T=0) vs a brute-force python replica of
the md5 movement + threshold-diff contract (reference
networkit/cpp/generators/DynamicHyperbolicGenerator.cpp)."""

from __future__ import annotations

import hashlib
import math

import pytest

from networkit_spark.sources.generators import (
    dynamic_hyperbolic_events,
    hyperbolic_target_radius,
)

pytestmark = pytest.mark.usefixtures("spark")


def _frac(*parts):
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:13], 16) / float(2**52)


def _replica(n, avg_degree, plexp, mes, md, steps, seed):
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(float(n), n * avg_degree / 2.0, alpha)
    coshR = (math.exp(R) + math.exp(-R)) / 2.0
    maxcdf = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2.0
    chaR = maxcdf

    theta, r = {}, {}
    for i in range(n):
        theta[i] = 2 * math.pi * _frac(f"hga|{seed}", i)
        u = 1.0 + (chaR - 1.0) * _frac(f"hgr|{seed}", i)
        r[i] = math.log(u + math.sqrt(u * u - 1.0)) / alpha
    amov = {
        i: (2.0 * _frac(f"dha|{seed}", i) - 1.0) * md for i in range(n)
    }
    rmov = {
        i: (2.0 * _frac(f"dhr|{seed}", i) - 1.0) * 10.0 * md
        for i in range(n)
    }

    def edge_set():
        es = set()
        for i in range(n):
            chi = (math.exp(r[i]) + math.exp(-r[i])) / 2.0
            shi = (math.exp(r[i]) - math.exp(-r[i])) / 2.0
            for j in range(i + 1, n):
                chj = (math.exp(r[j]) + math.exp(-r[j])) / 2.0
                shj = (math.exp(r[j]) - math.exp(-r[j])) / 2.0
                cosd = (
                    math.cos(theta[i]) * math.cos(theta[j])
                    + math.sin(theta[i]) * math.sin(theta[j])
                )
                lhs = chi * chj - shi * shj * cosd
                if lhs <= coshR and abs(lhs - coshR) >= 1e-9:
                    es.add((i, j))
        return es

    events = []
    edges = edge_set()
    for st in range(steps):
        for i in range(n):
            if _frac(f"dhw|{seed}|{st}", i) >= mes:
                continue
            calpha = (
                math.exp(alpha * r[i]) + math.exp(-alpha * r[i])
            ) / 2.0
            nc = calpha + alpha * rmov[i]
            phi = theta[i]
            if nc > maxcdf:
                nc = 2.0 * maxcdf - nc
                rmov[i] *= -1.0
            if nc < 1.0:
                nc = 2.0 - nc
                rmov[i] *= -1.0
                phi = phi - math.pi if phi > math.pi else phi + math.pi
            nr = min(math.log(nc + math.sqrt(nc * nc - 1.0)) / alpha,
                     R - 1e-12)
            phi = phi + amov[i] / nr
            if phi < 0:
                phi += (math.floor(-phi / (2 * math.pi)) + 1) * 2 * math.pi
            elif phi > 2 * math.pi:
                phi -= math.floor(phi / (2 * math.pi)) * 2 * math.pi
            theta[i], r[i] = phi, nr
        new_edges = edge_set()
        for e in sorted(new_edges - edges):
            events.append((st, 0, "EDGE_ADDITION", e[0], e[1]))
        for e in sorted(edges - new_edges):
            events.append((st, 1, "EDGE_REMOVAL", e[0], e[1]))
        events.append((st, 2, "TIME_STEP", -1, -1))
        edges = new_edges
    return events, theta, r


def test_dynamic_hyperbolic_matches_replica(spark):
    n, avg, plexp, mes, md, steps, seed = 120, 6.0, 3.0, 0.4, 0.1, 2, 7
    ev, state, R = dynamic_hyperbolic_events(
        spark, n, avg_degree=avg, plexp=plexp, move_each_step=mes,
        move_distance=md, steps=steps, seed=seed, threshold_margin=1e-9,
    )
    got = sorted(
        (int(x["step"]), int(x["cls"]), x["type"], int(x["u"]), int(x["v"]))
        for x in ev.collect()
    )
    want, theta, r = _replica(n, avg, plexp, mes, md, steps, seed)
    assert got == sorted(want)
    fin = {int(x["id"]): (float(x["theta"]), float(x["r"]))
           for x in state.collect()}
    for i in range(n):
        assert fin[i][0] == pytest.approx(theta[i], abs=1e-9)
        assert fin[i][1] == pytest.approx(r[i], abs=1e-9)


def test_dynamic_hyperbolic_zero_move_is_silent(spark):
    ev, _, _ = dynamic_hyperbolic_events(
        spark, 60, move_each_step=0.0, steps=2, seed=3,
        threshold_margin=1e-9,
    )
    rows = ev.collect()
    assert all(r["type"] == "TIME_STEP" for r in rows)
    assert len(rows) == 2
