"""ParallelAgglomerativeClusterer + ClusteringGenerator.

The agglomerative composition is checked against a driver-side replica
of the exact same plan (ModularityScoring formula, LocalMax rounds
with the md5 tie order, min-endpoint contraction, the reference's
repeat rule) on random graphs; the clustering generators against the
reference's closed forms (ClusteringGenerator.cpp:15-87).
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.agglomerative import agglomerative_clustering
from networkit_spark.operators.clusteringgen import (
    continuous_balanced_clustering,
    noncontinuous_balanced_clustering,
    one_clustering,
    random_clustering,
    singleton_clustering,
)


def _random_graph(spark, n, m, seed):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    rows = [(u, v, 1.0) for u, v in sorted(edges)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=False,
        weighted=True,
    )
    return g, sorted(edges)


def _replica(nodes, edges, max_levels=32):
    """Driver replica of agglomerative_clustering's exact plan."""
    # state: weighted canonical edge list (may hold self-loops), labels
    cur = {(u, v): 1.0 for u, v in edges}
    labels = {u: u for u in nodes}
    cur_nodes = set(nodes)
    n = len(cur_nodes)
    level = 0
    while level < max_levels:
        level += 1
        # ModularityScoring: wdeg over both-direction arcs (self-loops
        # twice), total over canonical rows (self-loops once)
        total = sum(cur.values())
        vol = 2.0 * total
        wdeg = Counter()
        for (u, v), w in cur.items():
            wdeg[u] += w
            wdeg[v] += w
        scored = {
            e: w / total - (wdeg[e[0]] / vol) * (wdeg[e[1]] / vol)
            for e, w in cur.items()
        }
        live = {
            e: s for e, s in scored.items() if s > 0 and e[0] != e[1]
        }
        # LocalMax rounds with md5 tie
        matched = []
        pool = {
            e: (s, hashlib.md5(f"lmm|{e[0]}|{e[1]}".encode()).hexdigest())
            for e, s in live.items()
        }
        while pool:
            best = {}
            for (u, v), (w, t) in pool.items():
                for a, b2 in ((u, v), (v, u)):
                    k = (w, t, b2)
                    if a not in best or k > best[a][0]:
                        best[a] = (k, b2)
            agree = {
                (u, v)
                for (u, v) in pool
                if best[u][1] == v and best[v][1] == u
            }
            if not agree:
                break
            matched.extend(agree)
            dead = {x for e in agree for x in e}
            pool = {
                e: val
                for e, val in pool.items()
                if e[0] not in dead and e[1] not in dead
            }
        # contraction
        part = {u: u for u in cur_nodes}
        for u, v in matched:
            part[u] = part[v] = min(u, v)
        coarse = Counter()
        for (u, v), w in cur.items():
            a, b2 = part[u], part[v]
            coarse[(min(a, b2), max(a, b2))] += w
        coarse_nodes = set(part.values())
        cn = len(coarse_nodes)
        diff = n - cn
        repeat = diff > 0 and cn >= 2 and (diff / n) > 5e-3
        if not repeat:
            break
        labels = {x: part[lbl] for x, lbl in labels.items()}
        cur = dict(coarse)
        cur_nodes = coarse_nodes
        n = cn
    return labels


@pytest.mark.parametrize("seed", [5, 19])
def test_agglomerative_matches_replica(spark, seed):
    n, m = 36, 80
    g, edges = _random_graph(spark, n, m, seed)
    labels, metrics = agglomerative_clustering(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    want = _replica(range(n), edges)
    assert got == want
    assert len(got) == n


def test_agglomerative_discards_failed_level(spark):
    # two disjoint heavy pairs contract once; the next level cannot
    # shrink (all merges have non-positive score or diff == 0), so the
    # result is the level-1 partition, not a further contraction
    rows = [(0, 1, 5.0), (2, 3, 5.0)]
    g = Graph(
        spark.createDataFrame(rows, "src long, dst long, weight double"),
        spark.createDataFrame([(i,) for i in range(4)], "id long"),
        directed=False,
        weighted=True,
    )
    labels, metrics = agglomerative_clustering(g)
    got = {r["id"]: r["label"] for r in labels.collect()}
    want = _replica(range(4), [(0, 1), (2, 3)])
    assert got == want


def test_clustering_generators(spark):
    n = 23
    g = Graph(
        spark.createDataFrame(
            [(i, (i + 1) % n, 1.0) for i in range(n)],
            "src long, dst long, weight double",
        ),
        spark.createDataFrame([(i,) for i in range(n)], "id long"),
        directed=False,
        weighted=True,
    )
    singles = {r["id"]: r["label"] for r in singleton_clustering(g).collect()}
    assert singles == {i: i for i in range(n)}
    ones = {r["label"] for r in one_clustering(g).collect()}
    assert ones == {0}
    for k in (1, 4, 7):
        cont = {
            r["id"]: r["label"]
            for r in continuous_balanced_clustering(g, k).collect()
        }
        sizes = sorted(Counter(cont.values()).values())
        assert len(sizes) == k
        assert max(sizes) - min(sizes) <= 1
        # contiguous rank blocks: labels non-decreasing in id order
        assert [cont[i] for i in range(n)] == sorted(cont[i] for i in range(n))
        noncont = {
            r["id"]: r["label"]
            for r in noncontinuous_balanced_clustering(g, k).collect()
        }
        assert noncont == {i: i % k for i in range(n)}
    rnd = {r["id"]: r["label"] for r in random_clustering(g, 5).collect()}
    assert set(rnd) == set(range(n))
    assert all(0 <= lbl < 5 for lbl in rnd.values())
    # deterministic replay
    rnd2 = {r["id"]: r["label"] for r in random_clustering(g, 5).collect()}
    assert rnd == rnd2


def test_clustering_generator_guards(spark):
    g = Graph(
        spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double"),
        spark.createDataFrame([(0,), (1,)], "id long"),
        directed=False,
        weighted=True,
    )
    with pytest.raises(ValueError):
        random_clustering(g, 0)
    with pytest.raises(ValueError):
        continuous_balanced_clustering(g, -1)
