"""Uniform-spanning-tree sampling estimators (Wilson's algorithm):
ApproxSpanningEdge, ForestCentrality, ApproxElectricalCloseness.

References (/root/reference/networkit/cpp/centrality/):
- ApproxSpanningEdge.cpp (:128-131 nSamples = ceil(log(2m/delta) /
  (2 eps^2)), delta = 1/n; :47-126 per-sample Wilson loop-erased walks,
  score(e) = |{USTs containing e}| / nSamples).
- ForestCentrality.cpp (:60-106 Wilson USTs on the AUGMENTED graph
  rooted at the universal root, r[u] += [parent_UST(u) == root];
  :108-127 linear solve L'x = e_root - 1/n'; :129-148
  diag[u] = max(0, r[u]/T - x_root + 2 x_u),
  farness(u) = n'*diag[u] + trace(diag) - 2, score = n'/farness).
- ApproxElectricalCloseness.cpp (:60-66 UST count formula with
  rootEcc^2 and (1-kappa)^2; aggregateUST walks each node's BFS-tree
  path to the root and adds +/-1 for every BFS edge that the UST
  contains, signed by orientation, gated on u lying in the UST-subtree
  (Euler interval) of the child endpoint; run() combines
  diag[u] = r_mean[u] - x_root + 2 x_u, diag[root] = x_root,
  score(u) = (n-1) / (n*diag[u] + trace)).

Documented deviations:
- Walks are md5-derandomized: the i-th draw at node v inside sample s
  picks neighbor index h13("ust|seed|s|v|i") mod deg(v) — same policy
  as every other sampling estimator here; identical seeds reproduce
  identical trees bit-for-bit on any executor count.
- Walk-start order is ascending (degree, id) (ForestCentrality.cpp:38
  sorts its start sequence by degree; ApproxElectricalCloseness uses a
  biconnected-component BFS sequence, a variance/locality optimization
  only — spanning trees of G restrict to independent uniform spanning
  trees per biconnected component, so whole-graph Wilson draws from the
  SAME distribution).
- The electrical-closeness root is the max-degree node (the reference's
  approxMinEccNode is a heuristic that only tightens the UST-count
  bound), and the Laplacian solve is the damped-Jacobi solver shared
  with operators/electrical.py instead of CG/LAMG (linear stationary
  iteration; accuracy set by the sweep count).
- No DuckDB oracle: the loop-erased walks have data-dependent,
  unbounded length, which SQL cannot unroll — these are the registry's
  rows-only entries; pytest checks the estimates against dense-exact
  pseudo-inverse values and replays determinism.

Spark-first shape: one UST sample is inherently sequential (each step
reads the tree built so far), exactly like one reference thread — the
distributed axis is the SAMPLE fan-out.  The compacted CSR adjacency is
broadcast once (the reference likewise keeps the whole graph in every
thread's shared memory); ``mapInPandas`` over a range of sample ids
runs Wilson per sample and emits only the O(n) per-sample aggregate,
never the walks.  At web scale the same plan holds per biconnected
component (trees factor over components), with components sharded
across executors.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.electrical import _laplacian_solve_batched

UST_SALT = "ust"


def _h13(*parts) -> int:
    return int(
        hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()[:13],
        16,
    )


def _csr(g: Graph):
    """(ids, indptr, indices) — compacted CSR of the undirected adjacency,
    neighbor lists sorted by id (the deterministic i-th-neighbor order)."""
    rows = (
        g.adj()
        .select("src", "dst")
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .collect()
    )
    nbr_map = {int(r["src"]): [int(x) for x in r["nbrs"]] for r in rows}
    ids = sorted(
        set(nbr_map) | {v for ns in nbr_map.values() for v in ns}
    )
    pos = {v: i for i, v in enumerate(ids)}
    indptr = [0]
    indices: list[int] = []
    for v in ids:
        indices.extend(pos[w] for w in nbr_map.get(v, []))
        indptr.append(len(indices))
    return (
        np.asarray(ids, dtype=np.int64),
        np.asarray(indptr, dtype=np.int64),
        np.asarray(indices, dtype=np.int64),
    )


def _wilson(ids, indptr, indices, root_pos: int, sample: int, seed: int):
    """One md5-derandomized Wilson UST rooted at ``root_pos``; returns the
    parent array (positions; parent[root] = -1)."""
    n = len(ids)
    parent = np.full(n, -1, dtype=np.int64)
    in_tree = np.zeros(n, dtype=bool)
    in_tree[root_pos] = True
    draws = np.zeros(n, dtype=np.int64)
    deg = indptr[1:] - indptr[:-1]
    order = np.lexsort((ids, deg))  # ascending (degree, id)
    for start in order:
        if in_tree[start]:
            continue
        cur = int(start)
        while not in_tree[cur]:
            d = int(deg[cur])
            if d == 0:
                raise ValueError("graph must be connected for UST sampling")
            k = int(draws[cur])
            draws[cur] += 1
            idx = _h13(UST_SALT, seed, sample, int(ids[cur]), k) % d
            nxt = int(indices[indptr[cur] + idx])
            parent[cur] = nxt
            cur = nxt
        cur = int(start)
        while not in_tree[cur]:
            in_tree[cur] = True
            cur = int(parent[cur])
    return parent


def sample_usts(
    g: Graph, root: int, n_samples: int, seed: int = 1
) -> DataFrame:
    """(sample, id, parent) — tree edges of ``n_samples`` independent
    md5-derandomized USTs rooted at ``root`` (one row per non-root node)."""
    spark = g.edges.sparkSession
    ids, indptr, indices = _csr(g)
    root_pos = int(np.searchsorted(ids, root))
    if root_pos >= len(ids) or ids[root_pos] != root:
        raise ValueError(f"root {root} is not a node of the graph")
    bc = spark.sparkContext.broadcast((ids, indptr, indices))

    def run(batches):
        import pandas as pd

        b_ids, b_indptr, b_indices = bc.value
        for pdf in batches:
            frames = []
            for s in pdf["id"]:
                par = _wilson(b_ids, b_indptr, b_indices, root_pos,
                              int(s), seed)
                mask = par >= 0
                frames.append(
                    pd.DataFrame(
                        {
                            "sample": int(s),
                            "id": b_ids[mask],
                            "parent": b_ids[par[mask]],
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"sample": [], "id": [], "parent": []}
            )

    par = max(1, min(n_samples, spark.sparkContext.defaultParallelism))
    return (
        spark.range(n_samples)
        .repartition(par)
        .mapInPandas(run, "sample long, id long, parent long")
    )


def approx_spanning_edge(
    g: Graph,
    eps: float = 0.1,
    seed: int = 1,
    n_samples: int | None = None,
) -> DataFrame:
    """(src, dst, score) — UST-inclusion frequency per edge, the
    eps-approximation of spanning-edge centrality
    (ApproxSpanningEdge.cpp:128-131; score exact iff e is a bridge)."""
    if g.directed:
        raise ValueError("approx_spanning_edge requires an undirected graph")
    gg = g.remove_self_loops()
    n = gg.number_of_nodes()
    m = gg.edges.select("src", "dst").distinct().count()
    if n_samples is None:
        delta = 1.0 / n
        n_samples = int(math.ceil(math.log(2.0 * m / delta) / (2 * eps * eps)))
    root = int(
        gg.degrees().orderBy(F.desc("degree"), F.asc("id")).first()["id"]
    )
    trees = sample_usts(gg, root, n_samples, seed)
    counts = (
        trees.select(
            F.least("id", "parent").alias("src"),
            F.greatest("id", "parent").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    canon = gg.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()
    return canon.join(counts, ["src", "dst"], "left").select(
        "src",
        "dst",
        (F.coalesce(F.col("c"), F.lit(0)) / F.lit(float(n_samples))).alias(
            "score"
        ),
    )


def forest_centrality(
    g: Graph,
    eps: float = 0.1,
    kappa: float = 0.3,
    seed: int = 1,
    n_samples: int | None = None,
    solve_iters: int = 200,
) -> DataFrame:
    """(id, score) — forest closeness via USTs on the augmented graph
    (ForestCentrality.cpp:53-148).  The universal root is created
    internally (id = max(id) + 1), matching
    GraphTools::createAugmentedGraph."""
    if g.directed:
        raise ValueError("forest_centrality requires an undirected graph")
    gg = g.remove_self_loops()
    nodes = gg.nodes().select("id")
    n = gg.number_of_nodes()
    root = int(nodes.agg(F.max("id")).first()[0]) + 1
    aug_edges = (
        gg.edges.select("src", "dst")
        .unionByName(nodes.select(F.lit(root).alias("src"),
                                  F.col("id").alias("dst")))
        .withColumn("weight", F.lit(1.0))
    )
    ag = Graph(aug_edges, None, directed=False, weighted=False)
    n_aug = n + 1
    if n_samples is None:
        vol = 2.0 * (gg.edges.select("src", "dst").distinct().count() + n)
        # ForestCentrality.hpp computeNumberOfUSTs: ceil(log(2m/delta) /
        # (2 eps^2 (1-kappa)^2)), delta = 1/n'
        n_samples = int(
            math.ceil(
                math.log(vol * n_aug)
                / (2 * eps * eps * (1 - kappa) * (1 - kappa))
            )
        )
    trees = sample_usts(ag, root, n_samples, seed)
    hits = (
        trees.filter(F.col("parent") == root)
        .groupBy("id")
        .agg((F.count(F.lit(1)) / F.lit(float(n_samples))).alias("r"))
    )
    # L' x = e_root - 1/n' (column-sum-0 recentred)
    rhs = (
        ag.nodes()
        .select(
            F.lit("f").alias("tag"),
            "id",
            (F.when(F.col("id") == root, 1.0).otherwise(0.0)
             - F.lit(1.0 / n_aug)).alias("b"),
        )
    )
    x = _laplacian_solve_batched(ag, rhs, iters=solve_iters)
    mean = float(x.agg(F.avg("x")).first()[0])
    x = x.select("id", (F.col("x") - F.lit(mean)).alias("x"))
    x_root = float(x.filter(F.col("id") == root).first()["x"])
    diag = (
        ag.nodes()
        .join(hits, "id", "left")
        .join(x, "id")
        .select(
            "id",
            F.when(
                F.col("id") == root, F.lit(x_root)
            ).otherwise(
                F.greatest(
                    F.lit(0.0),
                    F.coalesce(F.col("r"), F.lit(0.0))
                    - F.lit(x_root)
                    + 2.0 * F.col("x"),
                )
            ).alias("d"),
        )
    )
    # reference computeDiagonal has no special case for root (r[root]=0
    # gives max(0, -x_root + 2 x_root) = x_root for x_root >= 0)
    trace = float(diag.agg(F.sum("d")).first()[0])
    return (
        diag.filter(F.col("id") != root)
        .select(
            "id",
            (
                F.lit(float(n_aug))
                / (F.lit(float(n_aug)) * F.col("d") + F.lit(trace - 2.0))
            ).alias("score"),
        )
    )


def _electrical_counts(ids, indptr, indices, root_pos, sample, seed,
                       bfs_parent):
    """Per-sample aggregate of ApproxElectricalCloseness.cpp:
    aggregateUST over one Wilson UST.  Returns int64 r[pos]."""
    n = len(ids)
    parent = _wilson(ids, indptr, indices, root_pos, sample, seed)
    # Euler tour (tVisit/tFinish) of the UST rooted at root_pos
    children: list[list[int]] = [[] for _ in range(n)]
    for v in range(n):
        p = parent[v]
        if p >= 0:
            children[p].append(v)
    t_visit = np.zeros(n, dtype=np.int64)
    t_finish = np.zeros(n, dtype=np.int64)
    t = 0
    stack = [(root_pos, False)]
    while stack:
        v, done = stack.pop()
        if done:
            t_finish[v] = t
            t += 1
            continue
        t_visit[v] = t
        t += 1
        stack.append((v, True))
        for c in children[v]:
            stack.append((c, False))
    r = np.zeros(n, dtype=np.int64)
    for u in range(n):
        c = u
        p = int(bfs_parent[c])
        while p >= 0:
            e1, e2, sign = p, c, 1
            if parent[e2] != e1:
                if parent[e1] != e2:
                    c = p
                    p = int(bfs_parent[c])
                    continue
                e1, e2, sign = e2, e1, -1
            if t_visit[u] >= t_visit[e2] and t_finish[u] <= t_finish[e2]:
                r[u] += sign
            c = p
            p = int(bfs_parent[c])
    return r


def approx_electrical_closeness(
    g: Graph,
    eps: float = 0.1,
    kappa: float = 0.3,
    seed: int = 1,
    n_samples: int | None = None,
    solve_iters: int = 200,
) -> DataFrame:
    """(id, score) — UST estimator of electrical (current-flow)
    closeness (n-1) / (n * diag(L+)[u] + trace(L+))
    (ApproxElectricalCloseness.cpp run():471-541)."""
    if g.directed:
        raise ValueError(
            "approx_electrical_closeness requires an undirected graph"
        )
    gg = g.remove_self_loops()
    spark = gg.edges.sparkSession
    ids, indptr, indices = _csr(gg)
    n = len(ids)
    deg = indptr[1:] - indptr[:-1]
    root_pos = int(np.lexsort((ids, -deg))[0])  # max degree, min id
    root = int(ids[root_pos])

    # BFS tree from root (computeBFSTree; neighbor order = sorted ids)
    bfs_parent = np.full(n, -1, dtype=np.int64)
    seen = np.zeros(n, dtype=bool)
    seen[root_pos] = True
    frontier = [root_pos]
    ecc = 0
    while frontier:
        nxt = []
        for v in frontier:
            for w in indices[indptr[v]:indptr[v + 1]]:
                if not seen[w]:
                    seen[w] = True
                    bfs_parent[w] = v
                    nxt.append(int(w))
        if nxt:
            ecc += 1
        frontier = nxt
    if not seen.all():
        raise ValueError("graph must be connected")

    if n_samples is None:
        m = len(indices) // 2
        n_samples = ecc * ecc * int(
            math.ceil(
                math.log(2.0 * m * n)
                / (2 * eps * eps * (1 - kappa) * (1 - kappa))
            )
        )

    bc = spark.sparkContext.broadcast(
        (ids, indptr, indices, root_pos, bfs_parent)
    )

    def run(batches):
        import pandas as pd

        b_ids, b_indptr, b_indices, b_root, b_bfs = bc.value
        for pdf in batches:
            acc = np.zeros(len(b_ids), dtype=np.int64)
            for s in pdf["id"]:
                acc += _electrical_counts(
                    b_ids, b_indptr, b_indices, b_root, int(s), seed, b_bfs
                )
            yield pd.DataFrame({"id": b_ids, "r": acc})

    par = max(1, min(n_samples, spark.sparkContext.defaultParallelism))
    r_sum = (
        spark.range(n_samples)
        .repartition(par)
        .mapInPandas(run, "id long, r long")
        .groupBy("id")
        .agg((F.sum("r") / F.lit(float(n_samples))).alias("r"))
    )

    rhs = gg.nodes().select(
        F.lit("e").alias("tag"),
        "id",
        (F.when(F.col("id") == root, 1.0).otherwise(0.0)
         - F.lit(1.0 / n)).alias("b"),
    )
    x = _laplacian_solve_batched(gg, rhs, iters=solve_iters)
    mean = float(x.agg(F.avg("x")).first()[0])
    x = x.select("id", (F.col("x") - F.lit(mean)).alias("x"))
    x_root = float(x.filter(F.col("id") == root).first()["x"])
    diag = (
        gg.nodes()
        .join(r_sum, "id", "left")
        .join(x, "id")
        .select(
            "id",
            F.when(F.col("id") == root, F.lit(x_root))
            .otherwise(
                F.coalesce(F.col("r"), F.lit(0.0))
                - F.lit(x_root)
                + 2.0 * F.col("x")
            )
            .alias("d"),
        )
    )
    trace = float(diag.agg(F.sum("d")).first()[0])
    return diag.select(
        "id",
        (
            F.lit(float(n - 1))
            / (F.lit(float(n)) * F.col("d") + F.lit(trace))
        ).alias("score"),
    )
