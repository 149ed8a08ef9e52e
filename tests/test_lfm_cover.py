"""Global LFM cover (community/LFM.cpp:16-40): md5-ordered seeds, one
lfm_local expansion per uncovered node, overlapping subsets."""

from __future__ import annotations

import hashlib

from networkit_spark.graph import Graph
from networkit_spark.operators.scd import lfm_cover, lfm_local


def _two_cliques(spark):
    # two 4-cliques bridged by one edge
    edges = []
    for base in (0, 4):
        ids = range(base, base + 4)
        edges.extend(
            (a, b) for a in ids for b in ids if a < b
        )
    edges.append((3, 4))
    return Graph(
        spark.createDataFrame(
            [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
        ),
        spark.createDataFrame([(i,) for i in range(8)], "id long"),
        directed=False,
        weighted=True,
    )


def test_cover_covers_every_node_and_replays_seeds(spark):
    g = _two_cliques(spark)
    cover, metrics = lfm_cover(g)
    rows = [(r["id"], r["subset"]) for r in cover.collect()]
    assert {u for u, _ in rows} == set(range(8))
    # replay: seeds must be the md5-ordered uncovered nodes, and each
    # subset must equal a fresh lfm_local expansion from its seed
    order = sorted(range(8), key=lambda u: (hashlib.md5(
        f"lfm|{u}".encode()).hexdigest(), u))
    covered: set[int] = set()
    expect = []
    for u in order:
        if u in covered:
            continue
        com, _, _ = lfm_local(g, {u})
        members = {int(r["id"]) for r in com.collect()}
        expect.append((u, members))
        covered |= members
    assert len(metrics) == len(expect)
    for m, (seed, members) in zip(metrics, expect):
        assert m["seed"] == seed
        got = {u for u, s in rows if s == m["subset"]}
        assert got == members


def test_max_communities_bound(spark):
    g = _two_cliques(spark)
    cover, metrics = lfm_cover(g, max_communities=1)
    assert len(metrics) == 1
    assert cover.select("subset").distinct().count() == 1
