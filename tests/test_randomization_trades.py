"""Curveball trade generators + trade-sequence Curveball vs pure-python
replays of the md5-derandomized batch contract (reference
randomization/Curveball.cpp, CurveballUniformTradeGenerator.cpp,
CurveballGlobalTradeGenerator.cpp)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.randomization import (
    curveball,
    curveball_global_trades,
    curveball_uniform_trades,
)

pytestmark = pytest.mark.usefixtures("spark")


def _h(*parts) -> str:
    return hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()


def _klong(*parts) -> int:
    return int(_h(*parts)[:13], 16)


def test_uniform_trades_match_replica(spark):
    n, k, seed = 9, 25, 3
    got = [
        (int(r["t"]), int(r["u"]), int(r["v"]))
        for r in curveball_uniform_trades(spark, n, k, seed).orderBy("t")
        .collect()
    ]
    want = []
    for t in range(k):
        fst = _klong(f"cutg|{seed}|f", t) % n
        s = _klong(f"cutg|{seed}|s", t) % (n - 1)
        want.append((t, fst, s + (1 if s >= fst else 0)))
    assert got == want
    assert all(u != v and 0 <= u < n and 0 <= v < n for _, u, v in got)


def test_global_trades_match_replica(spark):
    n, rounds, seed = 9, 2, 7  # odd n: one node sits out per round
    got = sorted(
        (int(r["t"]), int(r["u"]), int(r["v"]))
        for r in curveball_global_trades(spark, n, rounds, seed).collect()
    )
    want = []
    for run in range(rounds):
        order = sorted(range(n), key=lambda i: (_h(f"cgtg|{seed}|{run}", i), i))
        for p in range(n // 2):
            want.append((run * (n // 2) + p, order[2 * p], order[2 * p + 1]))
    assert got == sorted(want)
    # each round pairs 2*(n//2) distinct nodes
    per_round = [set() for _ in range(rounds)]
    for t, u, v in got:
        per_round[t // (n // 2)].update((u, v))
    assert all(len(s) == 2 * (n // 2) for s in per_round)


def _replay_curveball(edges, trades, seed):
    edges = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    batches, cur, used = [], [], set()
    for (u, v) in trades:
        if u in used or v in used:
            batches.append(cur)
            cur, used = [], set()
        cur.append((u, v))
        used.update((u, v))
    if cur:
        batches.append(cur)
    for r, batch in enumerate(batches, start=1):
        pairs = dict(enumerate(batch))
        where = {}
        for pid, (u, v) in pairs.items():
            where[u] = (pid, 0)
            where[v] = (pid, 1)
        fixed, blocked, items = [], [], []
        for (s, d) in edges:
            ps, pd = where.get(s), where.get(d)
            if ps is None and pd is None or (
                ps is not None and pd is not None and ps[0] == pd[0]
            ):
                fixed.append((s, d))
                continue
            if ps is not None and pd is None:
                use_src = True
            elif ps is None:
                use_src = False
            else:
                use_src = _klong(f"{seed}|ob|{r}", s, d) % 2 == 0
            pid, side = ps if use_src else pd
            y = d if use_src else s
            u, v = pairs[pid]
            o = v if side == 0 else u
            if (min(o, y), max(o, y)) in edges:
                blocked.append((s, d))
            else:
                items.append((pid, side, y, (s, d)))
        created = []
        for pid, (u, v) in pairs.items():
            mine = [it for it in items if it[0] == pid]
            cu = sum(1 for it in mine if it[1] == 0)
            mine.sort(key=lambda it: (_h(f"{seed}|pb|{r}", pid, it[2]),
                                      it[2]))
            for rk, (pid2, side, y, orig) in enumerate(mine):
                w2 = u if rk < cu else v
                created.append((pid, (min(w2, y), max(w2, y)), orig))
        from collections import Counter

        cnt = Counter(e for _, e, _ in created)
        bad = {
            pid for pid, e, _ in created if cnt[e] > 1
        }
        new_edges = set(fixed) | set(blocked)
        for pid, e, orig in created:
            new_edges.add(orig if pid in bad else e)
        edges = new_edges
    return edges


PAIRS = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (3, 4), (4, 5),
         (5, 6), (4, 6), (6, 7), (7, 8), (0, 8), (2, 6), (1, 5)]


@pytest.mark.parametrize("seed", [3, 11])
def test_curveball_matches_replica(spark, seed):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    # trades repeat nodes -> multiple batches
    trades = [(0, 4), (2, 7), (0, 5), (4, 8), (2, 3), (1, 6), (0, 7)]
    out = curveball(g, trades, seed=seed)
    got = {
        (int(r["src"]), int(r["dst"]))
        for r in out.edges.select("src", "dst").collect()
    }
    want = _replay_curveball(PAIRS, trades, seed)
    assert got == want
    # degree preservation (the reference gtest invariant)
    import collections

    def degs(es):
        d = collections.Counter()
        for a, b in es:
            d[a] += 1
            d[b] += 1
        return d

    assert degs(got) == degs({(min(a, b), max(a, b)) for a, b in PAIRS})


def test_curveball_rejects_self_trade(spark):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    with pytest.raises(ValueError, match="self-trade"):
        curveball(g, [(3, 3)])


def test_curveball_accepts_generator_dataframe(spark):
    g = Graph.from_pandas(spark, PAIRS, n=9)
    tr = curveball_uniform_trades(spark, 9, 6, seed=5)
    out = curveball(g, tr, seed=5)
    trades = [(int(r["u"]), int(r["v"])) for r in tr.orderBy("t").collect()]
    assert {
        (int(r["src"]), int(r["dst"]))
        for r in out.edges.select("src", "dst").collect()
    } == _replay_curveball(PAIRS, trades, 5)
