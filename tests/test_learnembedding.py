"""learn_embeddings / node2vec vs a pure-python replica of the
deterministic synchronous-SGNS contract (reference
networkit/cpp/embedding/LearnEmbedding.cpp semantics; the hogwild
nondeterminism is replaced by the documented md5 + full-batch rules)."""

from __future__ import annotations

import hashlib
import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.embedding import (
    biased_random_walks,
    learn_embeddings,
    node2vec,
)

pytestmark = pytest.mark.usefixtures("spark")


def _h13(*parts):
    s = "|".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / float(16**13)


def _replica(walk_rows, dim, win, iters, negs, alpha, ns_pow, seed):
    walks = {}
    for s, rep, step, node in walk_rows:
        walks.setdefault((s, rep), {})[step] = node
    cnt = {}
    for _, _, _, node in walk_rows:
        cnt[node] = cnt.get(node, 0) + 1
    ids = sorted(cnt)
    # cumulative intervals in id order
    lo, cum = {}, 0.0
    hi = {}
    for i in ids:
        lo[i] = cum
        cum += cnt[i] ** ns_pow
        hi[i] = cum
    total = cum

    def draw(thr):
        for i in ids:
            if lo[i] <= thr < hi[i]:
                return i
        return ids[-1]

    triples = []
    for (s, rep), posmap in sorted(walks.items()):
        L = max(posmap) + 1
        for wi in range(L):
            tgt = posmap[wi]
            off = int(_h13(seed, "off", s, rep, wi) * win)
            for a in range(off, 2 * win + 1 - off):
                ci = wi + a - win
                if a == win or ci < 0 or ci >= L:
                    continue
                ctx = posmap[ci]
                triples.append((ctx, tgt, 1.0))
                for j in range(1, negs + 1):
                    thr = _h13(seed, "neg", s, rep, wi, a, j) * total
                    d = draw(thr)
                    if d != tgt:
                        triples.append((ctx, d, 0.0))

    pos = {
        i: [(_h13(seed, "init", i, d) - 0.5) / dim for d in range(dim)]
        for i in ids
    }
    neg = {i: [0.0] * dim for i in ids}
    for _ in range(iters):
        dpos = {i: [0.0] * dim for i in ids}
        dneg = {i: [0.0] * dim for i in ids}
        for ctx, tgt, label in triples:
            prod = sum(a * b for a, b in zip(pos[ctx], neg[tgt]))
            if prod > 6.0:
                grad = alpha * (label - 1.0)
            elif prod < -6.0:
                grad = alpha * label
            else:
                grad = alpha * (label - 1.0 + 1.0 / (1.0 + math.exp(prod)))
            for d in range(dim):
                dpos[ctx][d] += grad * neg[tgt][d]
                dneg[tgt][d] += grad * pos[ctx][d]
        for i in ids:
            pos[i] = [a + b for a, b in zip(pos[i], dpos[i])]
            neg[i] = [a + b for a, b in zip(neg[i], dneg[i])]
    return pos


PARAMS = dict(
    dimensions=4, win_size=2, iterations=2, neg_samples=2,
    alpha=0.025, ns_power=0.75, seed=7,
)


def _walks(spark, g, **kw):
    out, _ = biased_random_walks(g, seed=7, **kw)
    return out


def test_learn_embeddings_matches_replica(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (2, 5),
             (5, 6), (6, 7), (7, 5)]
    g = Graph.from_pandas(spark, pairs, n=8)
    walks = _walks(spark, g, walk_length=5, walks_per_node=2,
                   p=0.5, q=2.0)
    emb = learn_embeddings(walks, **PARAMS)
    got = {int(r["id"]): list(r["emb"]) for r in emb.collect()}
    rows = [
        (int(r["s"]), int(r["rep"]), int(r["step"]), int(r["node"]))
        for r in walks.collect()
    ]
    want = _replica(rows, 4, 2, 2, 2, 0.025, 0.75, 7)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), i


def test_embeddings_move_from_init(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    g = Graph.from_pandas(spark, pairs, n=6)
    walks = _walks(spark, g, walk_length=6, walks_per_node=1)
    emb0 = learn_embeddings(walks, iterations=0, dimensions=4, seed=7)
    emb2 = learn_embeddings(walks, iterations=2, dimensions=4, seed=7)
    g0 = {int(r["id"]): list(r["emb"]) for r in emb0.collect()}
    g2 = {int(r["id"]): list(r["emb"]) for r in emb2.collect()}
    moved = any(
        abs(a - b) > 1e-12 for i in g0 for a, b in zip(g0[i], g2[i])
    )
    assert moved


def test_node2vec_end_to_end_and_isolated_raise(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = Graph.from_pandas(spark, pairs, n=4)
    emb = node2vec(g, p=0.5, q=2.0, walk_length=4, walks_per_node=1,
                   dimensions=4, win_size=2, iterations=1, seed=7)
    assert emb.count() == 4
    assert len(emb.collect()[0]["emb"]) == 4

    g_iso = Graph.from_pandas(spark, [(0, 1)], n=3)  # node 2 isolated
    with pytest.raises(ValueError, match="Isolated nodes"):
        node2vec(g_iso)
