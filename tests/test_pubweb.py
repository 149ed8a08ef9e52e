"""PubWebGenerator vs a brute-force python replica of the md5 contract
(reference networkit/cpp/generators/PubWebGenerator.cpp semantics:
anti-quadratic area radii, equal-density cluster sizes, center-heavy
polar placement, mutual-kNN in-range edges with 0.01/d^2 weights)."""

from __future__ import annotations

import hashlib
import math

import pytest

from networkit_spark.sources.generators import pubweb_graph

pytestmark = pytest.mark.usefixtures("spark")


def _frac(*parts):
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:13], 16) / float(2**52)


def _replica(n, A, rad, maxn, seed):
    MAX_R, FACTOR = 0.2, 5.0
    radii = [
        MAX_R * (_frac(f"pwf|{seed}", a) * FACTOR + 1.0) ** 2 / 25.0
        for a in range(A)
    ]
    centers = [
        (_frac(f"pwcx|{seed}", a), _frac(f"pwcy|{seed}", a))
        for a in range(A)
    ]
    fsum = sum(r ** 1.5 for r in radii)
    ffac = (n * (A / (A + 2.0))) / fsum
    num = [int(math.floor(ffac * r ** 1.5 + 0.5)) for r in radii]

    def wrap(z):
        if z > 1.0:
            return z - 1.0
        if z < 0.0:
            return z + 1.0
        return z

    pts = {}
    nid = 0
    for a in range(A):
        for j in range(num[a]):
            ang = 2 * math.pi * _frac(f"pwang|{seed}|{a}", j)
            dst = radii[a] * _frac(f"pwdist|{seed}|{a}", j)
            pts[nid] = (
                wrap(centers[a][0] + math.cos(ang) * dst),
                wrap(centers[a][1] + math.sin(ang) * dst),
            )
            nid += 1
    base = nid
    for i in range(max(0, n - base)):
        pts[base + i] = (_frac(f"pwrx|{seed}", i), _frac(f"pwry|{seed}", i))

    def d2(u, v):
        dx = pts[u][0] - pts[v][0]
        dy = pts[u][1] - pts[v][1]
        dx = 1.0 - dx if dx > 0.5 else (dx + 1.0 if dx < -0.5 else dx)
        dy = 1.0 - dy if dy > 0.5 else (dy + 1.0 if dy < -0.5 else dy)
        return dx * dx + dy * dy

    rad2 = rad * rad
    kept = set()
    for u in pts:
        cand = [
            (round(d2(u, v), 9), min(u, v), max(u, v), v)
            for v in pts
            if v != u and d2(u, v) <= rad2
            and abs(d2(u, v) - rad2) >= 1e-9
        ]
        cand.sort()
        for q, a, b, v in cand[: maxn - 1]:
            kept.add((u, v))
    edges = {}
    for u, v in kept:
        if (v, u) in kept:
            edges[(min(u, v), max(u, v))] = 0.01 / d2(u, v)
    return pts, edges


def test_pubweb_matches_replica(spark):
    n, A, rad, maxn, seed = 240, 3, 0.12, 5, 13
    pts_df, edges_df = pubweb_graph(
        spark, n, num_dense_areas=A, neigh_rad=rad, max_neigh=maxn,
        seed=seed, threshold_margin=1e-9, rank_round=9,
    )
    pts, edges = _replica(n, A, rad, maxn, seed)
    got_pts = {
        int(r["id"]): (float(r["x"]), float(r["y"]))
        for r in pts_df.collect()
    }
    assert set(got_pts) == set(pts)
    for i in pts:
        assert got_pts[i][0] == pytest.approx(pts[i][0], abs=1e-12)
        assert got_pts[i][1] == pytest.approx(pts[i][1], abs=1e-12)
    got_edges = {
        (int(r["src"]), int(r["dst"])): float(r["weight"])
        for r in edges_df.collect()
    }
    assert set(got_edges) == set(edges)
    for e in edges:
        assert got_edges[e] == pytest.approx(edges[e], rel=1e-9)


def test_pubweb_excess_cluster_nodes_kept(spark):
    # tiny n with big areas: rounded cluster sizes exceed n and the
    # excess is kept (reference spreadRemainingNodes never trims)
    pts_df, _ = pubweb_graph(
        spark, 5, num_dense_areas=4, neigh_rad=0.25, max_neigh=3, seed=3
    )
    assert pts_df.count() >= 5


def test_pubweb_validations(spark):
    with pytest.raises(ValueError):
        pubweb_graph(spark, 0)
    with pytest.raises(ValueError):
        pubweb_graph(spark, 10, neigh_rad=0.7)


def _dyn_replica(n, A, rad, maxn, steps, seed):
    """Python replay of dynamic_pubweb_events' documented contract."""
    pts, edges = _replica(n, A, rad, maxn, seed)
    MAX_R, FACTOR = 0.2, 5.0
    radii = [
        MAX_R * (_frac(f"pwf|{seed}", a) * FACTOR + 1.0) ** 2 / 25.0
        for a in range(A)
    ]
    centers = [
        (_frac(f"pwcx|{seed}", a), _frac(f"pwcy|{seed}", a))
        for a in range(A)
    ]

    def wrap(z):
        if z > 1.0:
            return z - 1.0
        if z < 0.0:
            return z + 1.0
        return z

    def edges_of(pts):
        rad2 = rad * rad

        def d2(u, v):
            dx = pts[u][0] - pts[v][0]
            dy = pts[u][1] - pts[v][1]
            dx = 1.0 - dx if dx > 0.5 else (dx + 1.0 if dx < -0.5 else dx)
            dy = 1.0 - dy if dy > 0.5 else (dy + 1.0 if dy < -0.5 else dy)
            return dx * dx + dy * dy

        kept = set()
        for u in pts:
            cand = [
                (round(d2(u, v), 9), min(u, v), max(u, v), v)
                for v in pts
                if v != u and d2(u, v) <= rad2
                and abs(d2(u, v) - rad2) >= 1e-9
            ]
            cand.sort()
            for q, a, b, v in cand[: maxn - 1]:
                kept.add((u, v))
        return {
            (min(u, v), max(u, v)): 0.01 / d2(u, v)
            for u, v in kept
            if (v, u) in kept
        }

    total = len(pts)
    nmut = int(total * 0.05)
    nid = total
    events = []
    for st in range(steps):
        victims = sorted(
            pts, key=lambda i: (_frac(f"pwdel|{seed}|{st}", i), i)
        )[:nmut]
        vset = set(victims)
        for (a, b) in sorted(edges):
            if a in vset or b in vset:
                u = a if a in vset else b
                v = b if u == a else a
                events.append((st, 0, "EDGE_REMOVAL", u, v, 0.0))
        for u in sorted(vset):
            events.append((st, 1, "NODE_REMOVAL", u, -1, 0.0))
        surviving = {
            e: w for e, w in edges.items()
            if e[0] not in vset and e[1] not in vset
        }
        for u in vset:
            del pts[u]
        for i in range(nmut):
            gid = nid + i
            c = int(_frac(f"pwinsc|{seed}", gid) * (A + 2))
            if c < A:
                ang = 2 * math.pi * _frac(f"pwinsa|{seed}", gid)
                dst = _frac(f"pwinsd|{seed}", gid) * radii[c]
                pts[gid] = (
                    wrap(centers[c][0] + math.cos(ang) * dst),
                    wrap(centers[c][1] + math.sin(ang) * dst),
                )
            else:
                pts[gid] = (
                    _frac(f"pwinsx|{seed}", gid),
                    _frac(f"pwinsy|{seed}", gid),
                )
            events.append((st, 2, "NODE_ADDITION", gid, -1, 0.0))
        nid += nmut
        new_edges = edges_of(pts)
        for e in sorted(new_edges):
            if e in surviving:
                events.append(
                    (st, 3, "EDGE_WEIGHT_UPDATE", e[0], e[1], new_edges[e])
                )
        for e in sorted(surviving):
            if e not in new_edges:
                events.append((st, 4, "EDGE_REMOVAL", e[0], e[1], 0.0))
        for e in sorted(new_edges):
            if e not in surviving:
                events.append(
                    (st, 5, "EDGE_ADDITION", e[0], e[1], new_edges[e])
                )
        events.append((st, 6, "TIME_STEP", -1, -1, 0.0))
        edges = new_edges
    return events


def test_dynamic_pubweb_matches_replica(spark):
    from networkit_spark.sources.generators import dynamic_pubweb_events

    n, A, rad, maxn, steps, seed = 200, 3, 0.12, 5, 2, 13
    ev = dynamic_pubweb_events(
        spark, n, num_dense_areas=A, neigh_rad=rad, max_neigh=maxn,
        steps=steps, seed=seed, threshold_margin=1e-9, rank_round=9,
    )
    got = sorted(
        (int(r["step"]), int(r["cls"]), r["type"], int(r["u"]),
         int(r["v"]), float(r["w"]))
        for r in ev.collect()
    )
    want = sorted(_dyn_replica(n, A, rad, maxn, steps, seed))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert g[5] == pytest.approx(w[5], rel=1e-9)
