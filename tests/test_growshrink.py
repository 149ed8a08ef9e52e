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


# ---------------------------------------------------------------------------
# GroupClosenessLocalSearch (GroupClosenessLocalSearch.cpp)
# ---------------------------------------------------------------------------

def _ls_farness(edges, n, group):
    """Driver-side exact group farness (BFS from the member set)."""
    from collections import deque

    adj = {i: [] for i in range(n)}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    INF = 2**31
    dist = {i: INF for i in range(n)}
    dq = deque()
    for u in group:
        dist[u] = 0
        dq.append(u)
    while dq:
        x = dq.popleft()
        for y in adj[x]:
            if dist[y] > dist[x] + 1:
                dist[y] = dist[x] + 1
                dq.append(y)
    return sum(dist.values())


def _local_search_replica(edges, n, group, max_iterations=100):
    """Exact replica of the operator's documented semantics: u in
    ascending (farness-increase, id) order; accept the best exact
    decrease > increase with id tie-break; restart on swap."""
    group = sorted(group)
    it = 0
    while it < max_iterations:
        f_s = _ls_farness(edges, n, group)
        inc = {u: _ls_farness(edges, n, [x for x in group if x != u]) - f_s
               for u in group}
        swapped = False
        for u in sorted(group, key=lambda x: (inc[x], x)):
            rest = [x for x in group if x != u]
            if not rest:
                continue
            f_rest = _ls_farness(edges, n, rest)
            best = None
            for v in range(n):
                if v in rest or v == u:
                    continue
                dec = f_rest - _ls_farness(edges, n, rest + [v])
                if best is None or dec > best[1] or (dec == best[1] and v < best[0]):
                    best = (v, dec)
            if best and best[1] > inc[u]:
                group = sorted(rest + [best[0]])
                swapped = True
                break
        if not swapped:
            break
        it += 1
    return group, it


def _er_edges(n, p_mod, salt):
    import hashlib

    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            h = int(hashlib.md5(f"{salt}|{a}|{b}".encode()).hexdigest()[:8], 16)
            if h % p_mod == 0:
                edges.append((a, b))
    return edges


def test_local_search_matches_replica(spark):
    from networkit_spark.operators.growshrink import (
        group_closeness_local_search,
    )

    n = 24
    edges = _er_edges(n, 4, "gcls")
    # ensure connectivity with a ring backbone
    edges = sorted(set(edges) | {(i, (i + 1) % n) for i in range(n)}
                   - {(n - 1, 0)} | {(0, n - 1)})
    g = Graph.from_pandas(spark, edges, n=n)
    start = [0, 1, 2]
    got, it = group_closeness_local_search(
        g, start, run_grow_shrink=False
    )[:2]
    want, it_want = _local_search_replica(edges, n, start)
    assert got == want
    assert it == it_want


def test_local_search_reaches_local_optimum(spark):
    from networkit_spark.operators.growshrink import (
        group_closeness_local_search,
    )

    n = 18
    edges = _er_edges(n, 3, "gcls2")
    edges = sorted(set(edges) | {(i, i + 1) for i in range(n - 1)})
    g = Graph.from_pandas(spark, edges, n=n)
    got, _, _ = group_closeness_local_search(g, [0, 17],
                                             run_grow_shrink=False)
    f_got = _ls_farness(edges, n, got)
    # no single swap improves the final group
    for u in got:
        rest = [x for x in got if x != u]
        for v in range(n):
            if v in got:
                continue
            assert _ls_farness(edges, n, rest + [v]) >= f_got


def test_local_search_with_grow_shrink_composes(spark):
    from networkit_spark.operators.growshrink import (
        group_closeness_local_search,
        grow_shrink,
    )

    n = 16
    edges = sorted(set(_er_edges(n, 3, "gcls3")) | {(i, i + 1) for i in range(n - 1)})
    g = Graph.from_pandas(spark, edges, n=n)
    pre, _, _ = grow_shrink(g, [3, 4])
    a, _, _ = group_closeness_local_search(g, [3, 4], run_grow_shrink=True)
    b, _, _ = group_closeness_local_search(g, pre, run_grow_shrink=False)
    assert a == b


def test_local_search_rejects_bad_input(spark):
    from networkit_spark.operators.growshrink import (
        group_closeness_local_search,
    )

    gd = Graph.from_pandas(spark, [(0, 1)], directed=True, n=2)
    with pytest.raises(ValueError, match="undirected"):
        group_closeness_local_search(gd, [0])
    gu = Graph.from_pandas(spark, [(0, 1)], n=2)
    with pytest.raises(ValueError, match="non-empty"):
        group_closeness_local_search(gu, [])
