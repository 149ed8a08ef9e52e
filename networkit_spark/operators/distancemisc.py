"""Distance-family breadth: neighborhood function (exact + ANF
approximation + hop plot), r-ball volume, and some/multi-target
shortest-path wrappers.

References (/root/reference/networkit/cpp/distance/):
- NeighborhoodFunction.cpp (:16-49 — undirected, single component;
  NF(h) = cumulative number of ordered node pairs within distance
  <= h, h = 1..max).
- NeighborhoodFunctionApproximation.cpp / HopPlotApproximation.cpp —
  the ANF/Flajolet-Martin sketch estimate per hop (we reuse
  operators/diameter.anf_sketches, whose bit-exact masks are already
  gate-proven by `graph_anf`).
- Volume.cpp (:16-66 — mean number of nodes within weighted distance r
  of a sampled node, for one or several radii.  Deviations: the sample
  is the ``samples`` smallest md5(seed|id) ranks WITHOUT replacement
  (the reference draws uniformly WITH replacement from Aux::Random);
  distances are exact Dijkstra/BFS balls — the reference's expansion
  can settle a node at a suboptimal distance on weighted graphs (it
  never re-expands improved entries), which is exact only for uniform
  weights, the case its own tests cover).
- SPSP.cpp (:20-70 — some pairs: per-source BFS/Dijkstra restricted to
  targets) and MultiTargetBFS.cpp / MultiTargetDijkstra.cpp —
  single-source, target-set variants.  Unreachable pairs are omitted
  from the output relation (the reference stores infinity).

All shapes reuse the batched tagged BFS/SSSP machinery
(operators/closeness.py): one synchronized multi-source frontier, state
O(batch * n), never per-source Python loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import _tagged_bfs, _tagged_sssp
from networkit_spark.plans.superstep import Checkpointer


def _require_single_component(g: Graph, what: str) -> None:
    from networkit_spark.operators.components import (
        connected_components,
        number_of_components,
    )

    if g.directed:
        raise RuntimeError(
            "current implementation can only deal with undirected graphs"
        )
    labels, _ = connected_components(g)
    if number_of_components(labels) > 1:
        raise RuntimeError(
            f"current implementation of {what} only runs on graphs with "
            "1 connected component"
        )


def neighborhood_function(
    g: Graph, checkpointer: Checkpointer | None = None
) -> DataFrame:
    """(h, nf) — cumulative ordered pairs within distance <= h."""
    _require_single_component(g, "the neighborhood function")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    settled, _ = _tagged_bfs(g, g.nodes(), None, ckpt)
    per_h = (
        settled.filter(F.col("dist") > 0)
        .groupBy(F.col("dist").alias("h"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    # the per-distance histogram has O(diameter) rows — the global
    # window is over a tiny relation
    return per_h.select("h", F.sum("cnt").over(w).alias("nf")).orderBy("h")


def neighborhood_function_approximation(
    g: Graph, k: int = 4, r: int = 7, seed: int = 42, max_h: int = 1024
) -> DataFrame:
    """(h, est) — ANF sketch estimate of NF(h) per hop until the
    total saturates (masks stop changing)."""
    from networkit_spark.operators.diameter import anf_sketches

    _require_single_component(g, "the neighborhood function")
    rows = []
    prev_total = None
    for h in range(1, max_h + 1):
        est = anf_sketches(g, h, k=k, r=r, seed=seed)
        total = float(
            est.agg(F.sum("est").alias("s")).collect()[0]["s"]
        )
        rows.append((h, total))
        if prev_total is not None and total == prev_total:
            rows.pop()
            break
        prev_total = total
    spark = g.edges.sparkSession
    return spark.createDataFrame(rows, "h int, est double")


def hop_plot_approximation(
    g: Graph, max_distance: int = 0, k: int = 4, r: int = 7,
    seed: int = 42,
) -> DataFrame:
    """(h, frac) — estimated fraction of connected pairs within h hops
    (HopPlotApproximation.cpp; h = 0 contributes n)."""
    n = g.number_of_nodes()
    nf = neighborhood_function_approximation(
        g, k=k, r=r, seed=seed,
        max_h=max_distance if max_distance > 0 else 1024,
    )
    denom = float(n) * n
    spark = g.edges.sparkSession
    head = spark.createDataFrame([(0, float(n))], "h int, est double")
    return head.unionByName(nf).select(
        "h", (F.col("est") / F.lit(denom)).alias("frac")
    ).orderBy("h")


def volume(
    g: Graph,
    rs,
    samples: int = 500,
    seed: int = 42,
    weighted: bool | None = None,
) -> DataFrame:
    """(r, volume) — mean ball sizes over the md5-sampled start nodes."""
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    rs = [float(x) for x in rs]
    rmax = max(rs)
    starts = (
        g.nodes()
        .withColumn(
            "rk", F.md5(F.concat(F.lit(f"vol|{seed}|"), F.col("id")))
        )
        .orderBy("rk", "id")
        .limit(samples)
        .select("id")
        .localCheckpoint(eager=True)
    )
    n_samples = starts.count()
    use_w = g.weighted if weighted is None else weighted
    sweep = _tagged_sssp if use_w else _tagged_bfs
    max_hops = None if use_w else int(rmax)
    settled, _ = sweep(g, starts, max_hops, ckpt)
    rows = []
    for rv in rs:
        cnt = (
            settled.filter(F.col("dist") <= rv)
            .agg(F.count("*").alias("c"))
            .collect()[0]["c"]
        )
        rows.append((rv, float(cnt) / n_samples))
    return spark.createDataFrame(rows, "r double, volume double")


def spsp(
    g: Graph, sources, targets=None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(s, t, dist) — distances from every source to every target
    (all nodes when ``targets`` is None); unreachable pairs omitted."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    src_df = spark.createDataFrame(
        [(int(s),) for s in sources], "id long"
    )
    sweep = _tagged_sssp if g.weighted else _tagged_bfs
    settled, _ = sweep(g, src_df, None, ckpt)
    out = settled.select(F.col("s"), F.col("v").alias("t"), "dist")
    if targets is not None:
        tdf = spark.createDataFrame(
            [(int(t),) for t in targets], "t long"
        )
        out = out.join(F.broadcast(tdf), "t", "left_semi")
    return out.select("s", "t", "dist")


def multi_target_bfs(g: Graph, source: int, targets) -> DataFrame:
    """(t, dist) — MultiTargetBFS/MultiTargetDijkstra equivalent."""
    return spsp(g, [source], targets).select("t", "dist")


def algebraic_distance(
    g: Graph,
    num_systems: int = 10,
    num_iters: int = 30,
    omega: float = 0.5,
    norm: int = 0,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, score) — per-edge algebraic distance.

    Reference: /root/reference/networkit/cpp/distance/
    AlgebraicDistance.cpp (:29-147 — K random load systems smoothed by
    Jacobi iterations x_{t+1} = (1-omega) x_t + omega * (sum_v w x_t(v))
    / wdeg, per-system min-max normalization (min - x)/(min - max),
    distance = max-norm (norm=0) or p-norm over the per-system
    differences).  Deviation: loads initialize from md5(seed|sys|id)
    fractions instead of Aux::Random so the DuckDB oracle replays the
    iterations exactly.

    Plan: loads are K columns of one (id, l0..l{K-1}) relation; each
    iteration is ONE join + hash aggregation over the adjacency
    (PageRank shape, state O(n * K)); normalization is one global agg.
    """
    if g.directed:
        raise ValueError("Graph must be undirected")
    if not (0.0 <= omega <= 1.0):
        raise ValueError("omega must be in [0,1]")
    from networkit_spark.operators.misccentrality import _klong

    spark = g.edges.sparkSession
    adj = g.adj().select("src", "dst", "weight")
    cols = [f"l{i}" for i in range(num_systems)]
    loads = g.nodes().select(
        "id",
        *[
            (_klong(F.lit(f"ad|{seed}|{i}"), F.col("id"))
             / F.lit(float(1 << 52))).alias(f"l{i}")
            for i in range(num_systems)
        ],
    ).localCheckpoint(eager=True)
    for _ in range(num_iters):
        nbr = (
            adj.join(
                loads.select(F.col("id").alias("dst"), *cols), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.sum("weight").alias("wd"),
                *[
                    F.sum(F.col("weight") * F.col(c)).alias(f"s_{c}")
                    for c in cols
                ],
            )
        )
        loads = (
            loads.join(nbr, "id", "left")
            .select(
                "id",
                *[
                    F.when(
                        F.col("wd").isNotNull(),
                        (1.0 - omega) * F.col(c)
                        + omega * (F.col(f"s_{c}") / F.col("wd")),
                    ).otherwise(
                        # isolated node: val = 0/0 -> NaN in the
                        # reference; keep the previous load instead
                        # (documented deviation, no NaN propagation)
                        F.col(c)
                    ).alias(c)
                    for c in cols
                ],
            )
            .localCheckpoint(eager=True)
        )
    mm = loads.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    normed = loads.select(
        "id",
        *[
            (
                (F.lit(float(mm[f"mn_{c}"])) - F.col(c))
                / F.lit(float(mm[f"mn_{c}"]) - float(mm[f"mx_{c}"]))
            ).alias(c)
            for c in cols
        ],
    )
    lu = normed.select(F.col("id").alias("src"),
                       *[F.col(c).alias(f"u_{c}") for c in cols])
    lv = normed.select(F.col("id").alias("dst"),
                       *[F.col(c).alias(f"v_{c}") for c in cols])
    diffs = [F.abs(F.col(f"u_{c}") - F.col(f"v_{c}")) for c in cols]
    if norm == 0:
        score = diffs[0]
        for d in diffs[1:]:
            score = F.greatest(score, d)
    else:
        score = sum(F.pow(d, float(norm)) for d in diffs)
        score = F.pow(score, 1.0 / norm)
    return (
        g.edges.select("src", "dst")
        .join(lu, "src")
        .join(lv, "dst")
        .select("src", "dst",
                F.coalesce(score, F.lit(0.0)).alias("score"))
    )


def neighborhood_function_heuristic(
    g: Graph,
    n_samples: int = 16,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(h, nf) — the sampled neighborhood-function heuristic.

    Reference: distance/NeighborhoodFunctionHeuristic.cpp:41-129 (SPLIT
    strategy): start nodes are every (n/samples)-th node of the
    degree-sorted node list; per-hop sample counts scale by n/samples
    (half-up rounding) and accumulate, with the two anchors nf(1) = 2m
    and nf(diameter) = n(n-1).  Deviations (documented): the degree
    sort breaks ties by node id (the reference's parallel sort leaves
    tie order unspecified), and the half-up rounding is computed in
    exact integer arithmetic ((2*a + b) div (2*b)) so both engines
    agree bit-for-bit.
    """
    from networkit_spark.operators.diameter import diameter
    from networkit_spark.plans.ids import dense_ids

    _require_single_component(g, "the neighborhood function heuristic")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    m = g.number_of_edges()
    dia, _up = diameter(g, algo="exact")
    dia = int(dia)
    step = max(1, n // n_samples)

    ranked = dense_ids(
        g.degrees().select("id", "degree"), ["degree", "id"], "rk"
    )
    starts = ranked.filter(
        (F.col("rk") % step == 0) & (F.col("rk") / step < n_samples)
    ).select(F.col("id"))
    settled, _ = _tagged_bfs(g, starts, dia, ckpt)
    per_h = (
        settled.filter(F.col("dist") > 0)
        .groupBy(F.col("dist").alias("h"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    cnt = {int(r["h"]): int(r["cnt"]) for r in per_h}
    result = [0] * dia
    result[0] = 2 * m
    if dia >= 2:
        result[dia - 1] = n * (n - 1)
    lo = 2
    hi = dia - 1
    acc = result[0]
    for h in range(lo, hi + 1):
        a = cnt.get(h, 0) * n
        inc = (2 * a + n_samples) // (2 * n_samples)  # exact half-up
        acc = acc + inc
        result[h - 1] = acc
    return spark.createDataFrame(
        [(h + 1, int(v)) for h, v in enumerate(result)], "h long, nf long"
    )


def apsp(
    g: Graph,
    sources=None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """All-pairs shortest paths — (s, v, dist) for every reached pair.

    Reference: /root/reference/networkit/cpp/distance/APSP.cpp:19-39 —
    run() executes one BFS (unweighted) / Dijkstra (weighted) per node
    and stores the n x n distance matrix; unreachable pairs hold
    infinity (omitted rows here, the engine-native sparse form — the
    same convention as every other distance relation in this repo).

    Spark-first shape: ALL sources advance in ONE synchronized tagged
    frontier (operators/closeness._tagged_bfs/_tagged_sssp) — one
    join + dedup per hop over the whole batch instead of n driver-
    sequenced sweeps.  The output is inherently O(n^2) rows on a
    connected graph: full materialization is a fixture-scale ask
    exactly like the reference's dense matrix (DynAPSP shares this
    stance); at web scale pass ``sources`` to bound the batch.
    """
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    if sources is None:
        src_df = g.nodes()
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").cast("long").alias("id"))
    else:
        src_df = spark.createDataFrame(
            [(int(s),) for s in sources], "id long"
        )
    sweep = _tagged_sssp if g.weighted else _tagged_bfs
    settled, _ = sweep(g, src_df, None, ckpt)
    return settled.select("s", "v", "dist")


def reverse_bfs_distances(
    g: Graph,
    sources,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
):
    """(id, dist) hop distances following IN-edges — ReverseBFS.

    Reference: /root/reference/networkit/cpp/distance/ReverseBFS.cpp:
    17-75 — identical to BFS.cpp but expanding forInNeighborsOf; on an
    undirected graph the two coincide.  Only reached nodes appear.
    """
    from networkit_spark.operators.distance import bfs_distances
    from networkit_spark.operators.graphtools import transpose

    gt = transpose(g) if g.directed else g
    return bfs_distances(gt, sources, max_hops, checkpointer)


def graph_distance(g: Graph, u: int, v: int) -> float:
    """Scalar u -> v distance; BFS when unweighted, shortest weighted
    path otherwise; +inf when unreachable.

    Reference: /root/reference/networkit/cpp/distance/GraphDistance.cpp:
    15-30 — weightedDistance runs a full Dijkstra from u and indexes v,
    unweightedDistance a full BFS (the deprecated convenience wrapper).
    Same here via the existing sweeps (one source, full run like the
    reference — no early stop), returning the reference's infinity
    convention for missing rows.
    """
    from networkit_spark.operators.distance import (
        bfs_distances,
        sssp_distances,
    )

    sweep = sssp_distances if g.weighted else bfs_distances
    dist, _ = sweep(g, [int(u)])
    row = dist.filter(F.col("id") == int(v)).collect()
    return float(row[0]["dist"]) if row else float("inf")
