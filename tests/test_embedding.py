"""Biased random walks vs a driver-side replica of the same
deterministic sampler (BiasedRandomWalk.cpp semantics: uniform first
hop, then weight/p | weight | weight/q by the prev-neighborhood tier)."""

import hashlib

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.embedding import biased_random_walks

EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (3, 4)]


def _replica(edges, starts, walk_length, reps, p, q, seed=42):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, {})[v] = 1.0
        adj.setdefault(v, {})[u] = 1.0

    def u01(s, rep, k):
        h = hashlib.md5(f"{seed}|w|{s}|{rep}|{k}".encode()).hexdigest()[:13]
        return int(h, 16) / 16**13

    rows = set()
    for s in starts:
        for rep in range(reps):
            prev, cur = None, s
            rows.add((s, rep, 0, s))
            for k in range(1, walk_length):
                nbrs = sorted(adj.get(cur, {}))
                if not nbrs:
                    break
                if k == 1:
                    wgts = [1.0] * len(nbrs)
                else:
                    wgts = []
                    for x in nbrs:
                        wt = adj[cur][x]
                        if x == prev:
                            wgts.append(wt / p)
                        elif x in adj.get(prev, {}):
                            wgts.append(wt)
                        else:
                            wgts.append(wt / q)
                thr = u01(s, rep, k) * sum(wgts)
                cum, pick = 0.0, None
                for x, wt in zip(nbrs, wgts):
                    cum += wt
                    if cum > thr:
                        pick = x
                        break
                assert pick is not None
                rows.add((s, rep, k, pick))
                prev, cur = cur, pick
    return rows


@pytest.mark.parametrize("p,q", [(1.0, 1.0), (0.5, 2.0), (4.0, 0.25)])
def test_walks_match_replica(spark, p, q):
    g = Graph.from_pandas(spark, EDGES, n=5)
    starts = spark.createDataFrame([(0,), (3,)], "id long")
    out, info = biased_random_walks(
        g, walk_length=6, walks_per_node=2, p=p, q=q, starts=starts
    )
    got = {(r["s"], r["rep"], r["step"], r["node"]) for r in out.collect()}
    want = _replica(EDGES, [0, 3], 6, 2, p, q)
    assert got == want
    assert info.iterations == 5


def test_walk_stops_at_dead_end(spark):
    g = Graph.from_pandas(spark, [(0, 1), (1, 2)], directed=True, n=3)
    out, _ = biased_random_walks(
        g, walk_length=10, starts=g.nodes().filter("id = 0")
    )
    rows = sorted(
        (r["step"], r["node"]) for r in out.collect()
    )
    # directed path: deterministic walk 0 -> 1 -> 2, then dead end
    assert rows == [(0, 0), (1, 1), (2, 2)]
