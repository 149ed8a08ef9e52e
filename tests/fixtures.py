"""Golden fixtures lifted from the reference's unit tests (FIXTURES.md).

All expected values come from the reference's gtest sources (citations at
each fixture); graphs are tiny and deterministic.
"""

# B1: PageRank golden graph — 8 nodes, 9 weighted undirected edges
# /root/reference/networkit/cpp/centrality/test/CentralityGTest.cpp:689-729
PR_EDGES = [
    (0, 2, 3.0),
    (1, 2, 2.0),
    (2, 3, 3.0),
    (2, 4, 2.0),
    (2, 5, 1.5),
    (3, 5, 3.0),
    (4, 5, 2.0),
    (5, 6, 3.0),
    (5, 7, 2.0),
]
PR_N = 8
PR_EXPECTED = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]

# B2: LCC golden graph — 16 nodes, 24 undirected edges
# CentralityGTest.cpp:1328-1377
LCC16_EDGES = [
    (2, 4), (3, 4), (4, 5), (5, 7), (6, 7), (6, 8), (6, 9), (6, 11),
    (7, 12), (8, 9), (8, 10), (8, 11), (8, 13), (9, 10), (9, 11), (9, 13),
    (10, 11), (10, 13), (10, 14), (11, 13), (11, 14), (12, 15), (13, 14),
    (14, 15),
]
LCC16_N = 16
LCC16_EXPECTED = [
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.8, 0.8, 0.8,
    0.6666666666666666, 0.0, 0.8, 0.5, 0.0,
]

# B3: LCC second golden graph — 6 nodes, 11 undirected edges
# CentralityGTest.cpp:1386-1407
LCC6_EDGES = [
    (1, 0), (2, 0), (2, 1), (3, 2), (3, 0), (3, 1), (4, 2), (4, 0),
    (5, 3), (5, 4), (5, 1),
]
LCC6_N = 6
LCC6_EXPECTED = [2 / 3, 2 / 3, 2 / 3, 2 / 3, 1 / 3, 1 / 3]

# B4: CC tiny graph — 20 nodes, 15 undirected edges, 5 components
# /root/reference/networkit/cpp/components/test/ConnectedComponentsGTest.cpp:32-63
CC_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19), (3, 5), (5, 6),
    (6, 7), (7, 9), (10, 11), (10, 18), (10, 12), (18, 17), (13, 14),
]
CC_N = 20
CC_EXPECTED_LABELS = {  # canonical min-id labels
    0: 0, 1: 0, 2: 0, 4: 0, 8: 0, 16: 0, 19: 0,
    3: 3, 5: 3, 6: 3, 7: 3, 9: 3,
    10: 10, 11: 10, 12: 10, 17: 10, 18: 10,
    13: 13, 14: 13,
    15: 15,
}

# B7: directed PageRank sink fixture — node 3 is a sink
PR_SINK_EDGES = [(0, 1), (1, 2), (2, 0), (0, 3)]
PR_SINK_N = 4


def numpy_pagerank(
    n,
    edges,
    directed=False,
    damp=0.85,
    tol=1e-8,
    normalized=False,
    distribute_sinks=False,
    max_iterations=None,
    norm="l2",
):
    """Plain-numpy oracle implementing PageRank.cpp:21-128 line-for-line."""
    import numpy as np

    adj = [[] for _ in range(n)]  # in-adjacency: (in-neighbor, w)
    wdeg = np.zeros(n)
    for t in edges:
        u, v, w = (t[0], t[1], t[2] if len(t) > 2 else 1.0)
        wdeg[u] += w
        adj[v].append((u, w))
        if not directed:
            wdeg[v] += w
            adj[u].append((v, w))
    deg_out = np.zeros(n, dtype=int)
    for t in edges:
        deg_out[t[0]] += 1
        if not directed:
            deg_out[t[1]] += 1
    sinks = (
        [u for u in range(n) if deg_out[u] == 0]
        if directed and (distribute_sinks or normalized)
        else []
    )
    teleport = (1.0 - damp) / n
    factor = damp / n
    score = np.full(n, 1.0 / n)
    it = 0
    max_it = max_iterations if max_iterations is not None else 10**9
    while True:
        pr = np.zeros(n)
        for u in range(n):
            s = 0.0
            for v, w in adj[u]:
                s += score[v] * w / wdeg[v]
            pr[u] = damp * s + teleport
        if sinks:
            pr += factor * score[sinks].sum()
        it += 1
        d = score - pr
        delta = np.sqrt((d * d).sum()) if norm == "l2" else np.abs(d).sum()
        score = pr
        if it >= max_it or delta <= tol:
            break
    if normalized:
        if directed:
            nf = (1.0 / n) * ((1.0 - damp) + damp * score[sinks].sum())
        else:
            nf = teleport
        score = score / nf
    elif directed and not distribute_sinks:
        score = score / score.sum()
    return score, it
