"""Betweenness golden + property tests.

Golden fixture from the reference:
/root/reference/networkit/cpp/centrality/test/CentralityGTest.cpp:86-111
(6-node graph, expected {0, 0, 15, 3, 3, 1}, tol 1e-3).
"""

from __future__ import annotations

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import betweenness, estimate_betweenness


GOLDEN_EDGES = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5)]
GOLDEN = {0: 0.0, 1: 0.0, 2: 15.0, 3: 3.0, 4: 3.0, 5: 1.0}


def test_betweenness_reference_golden(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    scores, info = betweenness(g)
    got = {r["id"]: r["score"] for r in scores.collect()}
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], v, abs_tol=1e-3), (k, got[k], v)
    assert info.iterations > 0


def test_betweenness_normalized(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    scores, _ = betweenness(g, normalized=True)
    got = {r["id"]: r["score"] for r in scores.collect()}
    pairs = (6 - 1) * (6 - 2)
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], v / pairs, abs_tol=1e-6)


def test_betweenness_path_graph(spark):
    # path 0-1-2-3: bc(inner) = 2 * (pairs through it) = 2*2 = 4... each
    # inner node lies on shortest paths (0,2),(0,3),(1,3) -> node 1 on
    # (0,2),(0,3); node 2 on (0,3),(1,3); x2 for both directions
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    assert got == {0: 0.0, 1: 4.0, 2: 4.0, 3: 0.0}


def test_betweenness_directed(spark):
    # directed path 0->1->2: only s=0 paths pass through 1
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True)
    got = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 0.0}


def test_betweenness_hop_cap(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["id"]: r["score"] for r in betweenness(g, max_hops=1)[0].collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}  # no 2-hop paths seen


def test_estimate_betweenness_scaling(spark):
    g = Graph.from_pandas(spark, GOLDEN_EDGES, n=6)
    # full sample: estimator = exact * (2n/k) = exact * 2
    scores, _ = estimate_betweenness(g, n_samples=6)
    got = {r["id"]: r["score"] for r in scores.collect()}
    for k, v in GOLDEN.items():
        assert math.isclose(got[k], 2.0 * v, abs_tol=1e-6)


def _approx_bc_replica(edges, n, r_expected, epsilon, delta, vd, seed=42):
    """Driver-side replay of approx_betweenness's deterministic sampler
    (same md5 draws, same cumulative-sigma choice) — an independent
    oracle for the distributed implementation."""
    import hashlib
    import math
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    r = int(math.ceil(
        (1.0 / (epsilon * epsilon))
        * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
    ))
    assert r == r_expected

    def h(tag, x):
        return int(hashlib.md5(f"{seed}|{tag}|{x}".encode()).hexdigest()[:13], 16)

    ids = sorted(range(n))  # dense idx by id == identity here
    scores = defaultdict(float)
    for i in range(r):
        uidx = h("u", i) % n
        vidx = (uidx + 1 + h("v", i) % (n - 1)) % n
        s, t = ids[uidx], ids[vidx]
        # BFS with path counts
        dist = {s: 0}
        sigma = {s: 1.0}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    sigma[y] = 0.0
                    q.append(y)
                if dist[y] == dist[x] + 1:
                    sigma[y] += sigma[x]
        if t not in dist or dist[t] == 0:
            continue
        cur, step = t, 0
        while cur != s:
            step += 1
            preds = sorted(
                z for z in adj[cur] if dist.get(z) == dist[cur] - 1
            )
            u01 = h("p", f"{i}|{step}") / 16**13
            thr = u01 * sigma[cur]
            cum = 0.0
            pick = None
            for z in preds:
                cum += sigma[z]
                if cum > thr:
                    pick = z
                    break
            assert pick is not None
            if pick != s:
                scores[pick] += 1.0 / r
            cur = pick
    return {i: scores.get(i, 0.0) for i in range(n)}


def test_approx_betweenness_matches_replica_and_guarantee(spark):
    from networkit_spark.operators.betweenness import approx_betweenness, betweenness

    # barbell: two 4-cliques joined by the path 3-8-4 -> node 8 is the
    # bottleneck with maximal betweenness
    edges = []
    edges += [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges += [(3, 8), (8, 4)]
    n = 9
    g = Graph.from_pandas(spark, edges, n=n)
    eps, delta, vd = 0.35, 0.1, 4
    got, info = approx_betweenness(g, epsilon=eps, delta=delta, vd=vd)
    got_scores = {r["id"]: r["score"] for r in got.collect()}

    import math
    r = int(math.ceil((1 / eps**2) * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))))
    want = _approx_bc_replica(edges, n, r, eps, delta, vd)
    for i in range(n):
        assert got_scores[i] == pytest.approx(want[i], abs=1e-12), i

    # epsilon-delta guarantee vs the exact NORMALIZED betweenness
    exact, _ = betweenness(g)
    norm = {
        r["id"]: r["score"] / (n * (n - 1)) for r in exact.collect()
    }
    for i in range(n):
        assert abs(got_scores[i] - norm[i]) <= eps + 1e-12
    # the bottleneck (exact normalized score 0.444) must be clearly hot;
    # don't demand strict argmax — node 3's exact score is 0.417, within
    # sampling noise at this r
    assert got_scores[8] > 0.25


def test_approx_betweenness_small_diameter_zero(spark):
    from networkit_spark.operators.betweenness import approx_betweenness

    g = Graph.from_pandas(spark, [(0, 1), (1, 2), (0, 2)], n=3)
    got, _ = approx_betweenness(g, vd=2)
    assert all(r["score"] == 0.0 for r in got.collect())


def test_weighted_betweenness_diamond(spark):
    """Diamond with a too-heavy chord: weighted shortest paths (0-1-3,
    0-2-3, both cost 2) exclude the direct (0,3) edge of weight 3 —
    each middle node carries half of both (s,t) orders."""
    from networkit_spark.operators.betweenness import weighted_betweenness

    edges = [(0, 1, 1.0), (1, 3, 1.0), (0, 2, 1.0), (2, 3, 1.0), (0, 3, 3.0)]
    g = Graph.from_pandas(spark, edges, weighted=True, n=4)
    got = {r["id"]: r["score"] for r in weighted_betweenness(g)[0].collect()}
    assert got == pytest.approx({0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0})
    # hop metric sees every pair as directly adjacent -> no intermediaries
    exact_hops = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    assert exact_hops[1] == pytest.approx(0.0)


def test_weighted_betweenness_equals_unweighted_on_unit_weights(spark):
    from networkit_spark.operators.betweenness import weighted_betweenness

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3)]
    g = Graph.from_pandas(spark, edges, n=5)
    wref = {r["id"]: r["score"] for r in betweenness(g)[0].collect()}
    got = {r["id"]: r["score"] for r in weighted_betweenness(g)[0].collect()}
    for i in wref:
        assert got[i] == pytest.approx(wref[i], abs=1e-12)


def test_weighted_betweenness_sources_and_normalized(spark):
    from networkit_spark.operators.betweenness import weighted_betweenness

    edges = [(0, 1, 2.0), (1, 2, 2.0)]
    g = Graph.from_pandas(spark, edges, weighted=True, n=3)
    got = {r["id"]: r["score"] for r in weighted_betweenness(g, sources=[0])[0].collect()}
    assert got == pytest.approx({0: 0.0, 1: 1.0, 2: 0.0})
    nrm = {
        r["id"]: r["score"]
        for r in weighted_betweenness(g, normalized=True)[0].collect()
    }
    assert nrm[1] == pytest.approx(2.0 / 2.0)  # 2 dependencies / (n-1)(n-2)=2
