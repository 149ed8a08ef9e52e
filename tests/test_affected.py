"""AffectedNodes vs a queue-faithful python replica of
networkit/cpp/distance/AffectedNodes.cpp on hand + seeded fixtures."""

from __future__ import annotations

import random
from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.affected import AffectedNodes

pytestmark = pytest.mark.usefixtures("spark")

INF = float("inf")


def _g(spark, pairs, directed=False):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=directed, weighted=False)


def _adjmaps(pairs, directed):
    out, inn = {}, {}
    for u, v in pairs:
        out.setdefault(u, []).append(v)
        inn.setdefault(v, []).append(u)
        if not directed:
            out.setdefault(v, []).append(u)
            inn.setdefault(u, []).append(v)
    return out, inn


def _bfs(adj, source, skip=None):
    dist = {source: 0}
    q = deque()
    for w in adj.get(source, []):
        if w == skip or w in dist:
            continue
        dist[w] = 1
        q.append(w)
    while q:
        x = q.popleft()
        for y in adj.get(x, []):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def _get_affected(adj, source, old, extra=None):
    newd = {source: 0}
    aff = []
    q = deque([source])
    if extra is not None:
        newd[extra] = 1
        aff.append(extra)
        q.append(extra)
    while q:
        x = q.popleft()
        for y in adj.get(x, []):
            if y not in newd:
                newd[y] = newd[x] + 1
                if newd[y] < old.get(y, INF):
                    q.append(y)
                    aff.append(y)
    return aff, newd


def _hist(dist):
    h = {}
    for d in dist.values():
        if d >= 1 and d < INF:
            h[d] = h.get(d, 0) + 1
    return h


def _completed(new, old, ids):
    return {
        w: min(new.get(w, INF), old.get(w, INF))
        for w in ids
        if min(new.get(w, INF), old.get(w, INF)) < INF
    }


def _level_imp(new_hist, old_hist, ni, nj):
    out = {}
    for i in range(1, ni + 1):
        s = 0.0
        for j in range(1, nj + 1):
            s += (new_hist.get(j, 0) - old_hist.get(j, 0)) / (i + j)
        out[i] = s
    return out


def _ref(pairs, directed, etype, u, v):
    """Faithful replica; returns (nodes:set, distances, improvements,
    closeness_u, closeness_v)."""
    out, inn = _adjmaps(pairs, directed)
    ids = sorted({x for p in pairs for x in p})
    if etype == "EDGE_ADDITION":
        if not directed:
            du = _bfs(out, u, skip=v)
            dv = _bfs(out, v, skip=u)
            affu, newu = _get_affected(out, u, du)
            affv, newv = _get_affected(out, v, dv)
            nodes = set(affu) | set(affv)
            dist = {w: min(du.get(w, INF), dv.get(w, INF)) for w in nodes}
            cu = _completed(newu, du, ids)
            cv = _completed(newv, dv, ids)
            nlu = max([d for d in cu.values() if d >= 1], default=0)
            nlv = max([d for d in cv.values() if d >= 1], default=0)
            clo_u = sum(1.0 / d for d in cu.values() if d >= 1)
            clo_v = sum(1.0 / d for d in cv.values() if d >= 1)
            impu = _level_imp(_hist(cv), _hist(dv), nlu, nlv)
            impv = _level_imp(_hist(cu), _hist(du), nlv, nlu)
            improvements = {}
            for w in affu:
                improvements[w] = impu.get(cv.get(w, INF), 0.0)
            for w in affv:
                improvements[w] = impv.get(cu.get(w, INF), 0.0)
            return nodes, dist, improvements, clo_u, clo_v
        du = _bfs(inn, u)
        dv = _bfs(inn, v, skip=u)
        affv, newv = _get_affected(inn, v, dv)
        nodes = set(affv)
        dist = {w: min(dv.get(w, INF), du.get(w, INF)) for w in nodes}
        oldu = _bfs(out, u, skip=v)
        _, rawu = _get_affected(out, u, oldu)
        cu = _completed(rawu, oldu, ids)
        nlu = max([d for d in cu.values() if d >= 1], default=0)
        clo_u = sum(1.0 / d for d in cu.values() if d >= 1)
        nlv = max([d for d in newv.values() if d >= 1], default=0)
        impv = _level_imp(_hist(cu), _hist(oldu), nlv, nlu)
        improvements = {w: impv.get(newv[w] - 1, 0.0) for w in affv}
        return nodes, dist, improvements, clo_u, 0.0
    # removal: graph already lacks the edge
    if not directed:
        du = _bfs(out, u)
        dv = _bfs(out, v)
        affu, _ = _get_affected(out, u, du, extra=v)
        affv, _ = _get_affected(out, v, dv, extra=u)
        nodes = set(affu) | set(affv)
        dist = {w: min(du.get(w, INF), dv.get(w, INF)) for w in nodes}
        return nodes, dist, {w: 0.0 for w in nodes}, 0.0, 0.0
    dv = _bfs(inn, v)
    aff, _ = _get_affected(inn, v, dv, extra=u)
    nodes = set(aff)
    dist = {w: dv.get(w, INF) for w in nodes}
    return nodes, dist, {w: 0.0 for w in nodes}, 0.0, 0.0


def _check(spark, pairs, directed, etype, u, v):
    g = _g(spark, pairs, directed=directed)
    an = AffectedNodes(g, etype, u, v).run()
    nodes, dist, imp, cu, cv = _ref(pairs, directed, etype, u, v)
    got_nodes = {int(r["id"]) for r in an.nodes.collect()}
    assert got_nodes == nodes
    got_dist = {int(r["id"]): float(r["dist"]) for r in an.distances.collect()}
    assert got_dist == dist
    got_imp = {
        int(r["id"]): float(r["improvement"])
        for r in an.improvements.collect()
    }
    assert got_imp == pytest.approx(imp)
    assert an.closeness_u == pytest.approx(cu)
    assert an.closeness_v == pytest.approx(cv)


# hand fixture: 4 already contains the "new" edge (2, 9) for additions
ADD_PAIRS = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7), (7, 5),
    (2, 8), (8, 9), (9, 10), (5, 10), (11, 12), (2, 9),
]
# removal fixture: the removed edge (2, 9) is absent
REM_PAIRS = [p for p in ADD_PAIRS if p != (2, 9)]


def test_added_undirected(spark):
    _check(spark, ADD_PAIRS, False, "EDGE_ADDITION", 2, 9)


def test_added_directed(spark):
    _check(spark, ADD_PAIRS, True, "EDGE_ADDITION", 2, 9)


def test_removed_undirected(spark):
    _check(spark, REM_PAIRS, False, "EDGE_REMOVAL", 2, 9)


def test_removed_directed(spark):
    _check(spark, REM_PAIRS, True, "EDGE_REMOVAL", 2, 9)


def test_seeded_random_graphs(spark):
    rng = random.Random(7)
    n = 24
    pairs = sorted(
        {
            (a, b)
            for _ in range(50)
            for a, b in [(rng.randrange(n), rng.randrange(n))]
            if a != b
        }
    )
    u, v = pairs[3]
    _check(spark, pairs, False, "EDGE_ADDITION", u, v)
    rem = [p for p in pairs if p != (u, v)]
    _check(spark, rem, False, "EDGE_REMOVAL", u, v)
    _check(spark, pairs, True, "EDGE_ADDITION", u, v)
    _check(spark, rem, True, "EDGE_REMOVAL", u, v)
