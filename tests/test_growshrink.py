"""GroupClosenessGrowShrink / LocalSwaps — exact-evaluation semantics
vs an independent driver-side replica (reference:
networkit/cpp/centrality/GroupClosenessGrowShrinkImpl.cpp,
GroupClosenessLocalSwaps.cpp)."""

from __future__ import annotations

from collections import deque

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.growshrink import grow_shrink, local_swaps

pytestmark = pytest.mark.usefixtures("spark")

# two 4-cliques bridged by a 4-path: good groups put one member per side
EDGES = (
    [(u, v) for u in range(4) for v in range(u + 1, 4)]
    + [(u, v) for u in range(8, 12) for v in range(u + 1, 12)]
    + [(3, 4), (4, 5), (5, 6), (6, 7), (7, 8)]
)
N = 12


def _mk(spark):
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in EDGES], "src long, dst long, weight double"
    )
    return Graph(df, None, directed=False, weighted=False)


def _nbrs():
    nbr = {u: set() for u in range(N)}
    for u, v in EDGES:
        nbr[u].add(v)
        nbr[v].add(u)
    return nbr


def _bfs(nbr, srcs):
    dist = {s: 0 for s in srcs}
    q = deque(srcs)
    while q:
        u = q.popleft()
        for w in nbr[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _farness(nbr, group):
    return sum(_bfs(nbr, group).values())


def _replica(nbr, group, insertions, max_iterations):
    """Independent replica of the exact grow/shrink policy."""
    group = sorted(group)
    total_swaps = 0
    while total_swaps < max_iterations:
        start = list(group)
        dec = 0
        for _ in range(insertions):
            base = _farness(nbr, group)
            best, best_gain = None, -1
            for v in range(N):
                if v in group:
                    continue
                gain = base - _farness(nbr, group + [v])
                if gain > best_gain or (gain == best_gain and v < best):
                    best, best_gain = v, gain
            group.append(best)
            dec += best_gain
        inc = 0
        for _ in range(insertions):
            best, best_cost = None, None
            base = _farness(nbr, group)
            for u in sorted(group):
                cost = _farness(nbr, [x for x in group if x != u]) - base
                if best_cost is None or cost < best_cost:
                    best, best_cost = u, cost
            inc += best_cost
            group.remove(best)
        if dec <= inc:
            group = start
            break
        total_swaps += 1
    return sorted(group), total_swaps


def test_grow_shrink_matches_replica(spark):
    g = _mk(spark)
    nbr = _nbrs()
    for init, ins in [([0, 1], 1), ([0, 1], 2), ([0, 1, 2], 1)]:
        got_group, got_swaps, info = grow_shrink(
            g, init, insertions=ins, max_iterations=10
        )
        want_group, want_swaps = _replica(nbr, init, ins, 10)
        assert got_group == want_group, (init, ins, got_group, want_group)
        assert got_swaps == want_swaps, (init, ins)
        # refinement never increases farness
        assert _farness(nbr, got_group) <= _farness(nbr, init)
        assert len(got_group) == len(init)


def test_local_swaps_improves_bad_group(spark):
    g = _mk(spark)
    nbr = _nbrs()
    got_group, swaps, _ = local_swaps(g, [0, 1], max_swaps=10)
    # a one-per-side group strictly beats two nodes in the same clique
    assert _farness(nbr, got_group) < _farness(nbr, [0, 1])
    assert swaps >= 1


def test_grow_shrink_stable_on_optimum(spark):
    g = _mk(spark)
    nbr = _nbrs()
    # exhaustive optimum for k = 2
    best = min(
        (
            (u, v)
            for u in range(N)
            for v in range(u + 1, N)
        ),
        key=lambda p: _farness(nbr, list(p)),
    )
    got_group, swaps, _ = grow_shrink(g, list(best), insertions=1,
                                      max_iterations=10)
    assert got_group == sorted(best)
    assert swaps == 0


def test_grow_shrink_validates(spark):
    g = _mk(spark)
    with pytest.raises(ValueError):
        grow_shrink(g, [])
