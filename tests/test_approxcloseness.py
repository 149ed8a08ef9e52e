"""ApproxCloseness (Cohen et al. hybrid estimator, deterministic
variant): exactness when every node is sampled, estimator sanity
against true closeness, and determinism."""

from __future__ import annotations

import hashlib
from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.approxcloseness import approx_closeness


def _rand_edges(n, seed, keep=2):
    out = []
    for u in range(n):
        for v in range(u + 1, n):
            h = int(hashlib.md5(f"{seed}|{u}|{v}".encode()).hexdigest()[:4], 16)
            if h % keep == 0:
                out.append((u, v))
    return out


def _true_inv_closeness(edges, n, normalized):
    nbrs = {u: set() for u in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    out = {}
    for s in range(n):
        d = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            for y in nbrs[x]:
                if y not in d:
                    d[y] = d[x] + 1
                    q.append(y)
        tot = sum(d.values())
        inv = (n - 1) if normalized else 1
        out[s] = inv / tot if tot > 0 else 0.0
    return out


def test_all_sampled_is_exact(spark):
    n = 12
    edges = _rand_edges(n, seed=3)
    g = Graph.from_pandas(spark, edges, n=n)
    got, _ = approx_closeness(g, n_samples=n, epsilon=0.5, normalized=True)
    want = _true_inv_closeness(edges, n, normalized=True)
    for r in got.collect():
        assert r["score"] == pytest.approx(want[r["id"]], rel=1e-9), r["id"]


@pytest.mark.parametrize("eps", [0.25, 0.5])
def test_estimator_sanity(spark, eps):
    n = 40
    edges = _rand_edges(n, seed=9, keep=3)
    g = Graph.from_pandas(spark, edges, n=n)
    got, _ = approx_closeness(g, n_samples=12, epsilon=eps, normalized=True)
    want = _true_inv_closeness(edges, n, normalized=True)
    rows = {r["id"]: r["score"] for r in got.collect()}
    errs = [
        abs(rows[u] - want[u]) / want[u]
        for u in want
        if want[u] > 0 and rows[u] > 0
    ]
    assert errs and sum(errs) / len(errs) < 0.35  # hybrid estimator, k=12/40


def test_deterministic(spark):
    n = 15
    edges = _rand_edges(n, seed=5)
    g = Graph.from_pandas(spark, edges, n=n)
    a = sorted(tuple(r) for r in approx_closeness(g, n_samples=5)[0].collect())
    b = sorted(tuple(r) for r in approx_closeness(g, n_samples=5)[0].collect())
    assert a == b


def test_validation(spark):
    g = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError):
        approx_closeness(g, epsilon=0.9)
