"""IncompleteDijkstra (distance/IncompleteDijkstra.cpp) vs a heap
replica on the induced subgraph."""

from __future__ import annotations

import pytest

from networkit_spark.graph import Graph

pytestmark = pytest.mark.usefixtures("spark")

def test_incomplete_dijkstra_explored_and_bound(spark):
    """IncompleteDijkstra: explored nodes never enter; max_dist
    truncates — vs a heap replica on the induced subgraph."""
    import heapq

    from networkit_spark.operators.distance import incomplete_dijkstra

    wedges = [(0, 1, 1.0), (1, 2, 2.0), (0, 3, 5.0), (3, 4, 1.0),
              (2, 4, 1.0), (1, 5, 9.0)]
    g = Graph.from_pandas(spark, wedges, weighted=True, n=6)

    def replica(srcs, explored, bound):
        adj = {}
        for u, v, w in wedges:
            if u in explored or v in explored:
                continue
            adj.setdefault(u, []).append((v, w))
            adj.setdefault(v, []).append((u, w))
        dist = {s: 0.0 for s in srcs if s not in explored}
        h = [(0.0, s) for s in dist]
        heapq.heapify(h)
        while h:
            d, u = heapq.heappop(h)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, ()):
                if d + w < dist.get(v, float("inf")):
                    dist[v] = d + w
                    heapq.heappush(h, (dist[v], v))
        return {k: v for k, v in dist.items() if bound is None or v < bound}

    for explored, bound in [(set(), None), ({1}, None), ({3}, 4.0),
                            (set(), 3.0)]:
        got, _ = incomplete_dijkstra(g, [0], explored=explored or None,
                                     max_dist=bound)
        want = replica([0], explored, bound)
        assert {r["id"]: r["dist"] for r in got.collect()} == want
