"""Closeness and harmonic closeness centrality.

Reference:
  - Closeness: /root/reference/networkit/cpp/centrality/Closeness.cpp:50-113
    and include/networkit/centrality/Closeness.hpp:86-100 — per-source BFS
    (Dijkstra when weighted); STANDARD variant score = 1/sum(dist)
    (requires a connected graph, Closeness.cpp:31-47), GENERALIZED =
    (reached-1)/sum/(n-1); ``normalized`` multiplies by (n-1) resp.
    (reached-1).
  - HarmonicCloseness: /root/reference/networkit/cpp/centrality/
    HarmonicCloseness.cpp:20-49 — score = sum over reachable v != u of
    1/d(u, v); ``normalized`` divides by (n-1).

Spark plan: ONE multi-source level-synchronous BFS with a source-tagged
frontier (s, v) — the same shape as the Brandes forward pass
(operators/betweenness.py) minus path counting. The loop-invariant
adjacency is hash-partitioned on src once and cached; each superstep
shuffles only the (s, v) frontier. Per-source aggregation is a single
hash agg over the settled (s, v, dist) relation.

Exact all-sources closeness is O(n^2) state — the same total work the
reference pays with its n BFS sweeps. For web scale, pass ``sources``
(the vertex subset whose closeness you need, e.g. top-degree
candidates): the state is O(|sources| * n) and the semantics per source
are unchanged — this is the restriction TopCloseness-style algorithms
exploit (reference TopCloseness.cpp prunes the same sweep).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)

STANDARD = "standard"
GENERALIZED = "generalized"


def _tagged_bfs(
    g: Graph,
    src_df: DataFrame,
    max_hops: int | None,
    ckpt: Checkpointer,
) -> tuple[DataFrame, list[dict]]:
    """(s, v, dist) hop distances from every source s to every node v it
    reaches (the reference's per-u BFS, all sources advancing in one
    synchronized frontier). Directed graphs follow out-edges
    (forNeighborsOf, Closeness.cpp:96)."""
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    settled = src_df.select(
        F.col("id").alias("s"), F.col("id").alias("v"),
        F.lit(0).cast("long").alias("dist"),
    )
    settled = ckpt.cut(settled, 0)
    frontier = settled.select("s", "v")
    metrics: list[dict] = []
    hop = 0
    cap = max_hops if max_hops is not None else 2**31
    while hop < cap:
        t0 = time.time()
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(settled.select("s", "v"), ["s", "v"], "left_anti")
        )
        hop += 1
        new_rows = ckpt.cut(
            nxt.select("s", "v", F.lit(hop).cast("long").alias("dist")), hop
        )
        # union of per-hop cut increments: each piece is cached, so the
        # whole settled relation is never re-materialized per hop; every
        # 8 hops the union is compacted so long-diameter graphs don't
        # accumulate O(hops) scan branches per anti-join
        settled = settled.unionByName(new_rows)
        if hop % 8 == 0:
            settled = ckpt.cut(settled, 10000 + hop)
        frontier = new_rows.select("s", "v")
        reached = frontier.count()
        metrics.append(
            ckpt.log(hop, state=settled, reached=reached, wall_sec=time.time() - t0)
        )
        if reached == 0:
            break
    adj.unpersist()
    return settled, metrics


def _tagged_sssp(
    g: Graph,
    src_df: DataFrame,
    max_hops: int | None,
    ckpt: Checkpointer,
) -> tuple[DataFrame, list[dict]]:
    """(s, v, dist) non-negative WEIGHTED distances from every source —
    the reference's Dijkstra mode (Closeness.cpp uses Dijkstra when
    G.isWeighted(), /root/reference/networkit/cpp/distance/
    Dijkstra.cpp:15-93). Synchronous Bellman-Ford relaxation supersteps
    (same fixpoint for non-negative weights), multi-source tagged like
    :func:`_tagged_bfs`; ``max_hops`` = relaxation rounds."""
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight"),
        "src",
    )
    dist = src_df.select(
        F.col("id").alias("s"), F.col("id").alias("v"), F.lit(0.0).alias("dist")
    )
    dist = ckpt.cut(dist, 0)
    frontier = dist
    metrics: list[dict] = []
    it = 0
    cap = max_hops if max_hops is not None else 2**31
    while it < cap:
        t0 = time.time()
        cand = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
        )
        merged = dist.join(cand, ["s", "v"], "full_outer").select(
            "s",
            "v",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("new_dist"),
            "dist",
        )
        it += 1
        merged = ckpt.cut(merged, it)
        frontier = merged.filter(
            F.col("dist").isNull() | (F.col("new_dist") < F.col("dist"))
        ).select("s", "v", F.col("new_dist").alias("dist"))
        improved = frontier.count()
        dist = merged.select("s", "v", F.col("new_dist").alias("dist"))
        metrics.append(
            ckpt.log(it, state=dist, improved=improved, wall_sec=time.time() - t0)
        )
        if improved == 0:
            break
    adj.unpersist()
    return dist, metrics


def _sources(g: Graph, sources) -> DataFrame:
    if sources is None:
        return g.nodes()
    if isinstance(sources, DataFrame):
        return sources.select(F.col("id").cast("long").alias("id"))
    spark = g.edges.sparkSession
    return spark.createDataFrame([(int(s),) for s in sources], "id long")


def closeness(
    g: Graph,
    variant: str = GENERALIZED,
    normalized: bool = False,
    sources=None,
    max_hops: int | None = None,
    check_connectedness: bool = True,
    weighted: bool = False,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) closeness for every node in ``sources`` (default: all
    nodes = the reference's full run). ``weighted=True`` uses the edge
    weights (the reference's Dijkstra mode, Closeness.cpp:96 /
    Dijkstra.cpp:15-93, realized as Bellman-Ford supersteps); default
    is hop distance (BFS mode).

    Score per Closeness.hpp:86-100:
      STANDARD:    1/sum(d)            [* (n-1) when normalized]
      GENERALIZED: (r-1)/sum(d)/(n-1)  [* (r-1)  when normalized]
    with r = #reached (including the source), 0 when sum(d) == 0.
    """
    if variant not in (STANDARD, GENERALIZED):
        raise ValueError(f"unknown closeness variant {variant!r}")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    if variant == STANDARD and check_connectedness:
        # Closeness.cpp:31-47: standard closeness is undefined on
        # disconnected graphs (reference raises; SCC for directed)
        if g.directed:
            from networkit_spark.operators.scc import strongly_connected_components

            comps = strongly_connected_components(g)[0]
        else:
            from networkit_spark.operators.components import connected_components

            comps = connected_components(g)[0]
        if comps.select("label").distinct().count() > 1:
            raise RuntimeError(
                "standard closeness is not defined on disconnected graphs; "
                "use the generalized variant"
            )
    sweep = _tagged_sssp if weighted else _tagged_bfs
    settled, metrics = sweep(g, _sources(g, sources), max_hops, ckpt)
    per_src = settled.groupBy(F.col("s").alias("id")).agg(
        F.count("*").alias("r"), F.sum("dist").alias("dsum")
    )
    if variant == STANDARD:
        score = F.when(F.col("dsum") > 0, 1.0 / F.col("dsum")).otherwise(0.0)
        if normalized:
            score = score * F.lit(float(n - 1))
    else:
        score = F.when(
            F.col("dsum") > 0,
            (F.col("r") - 1) / F.col("dsum") / F.lit(float(n - 1)),
        ).otherwise(0.0)
        if normalized:
            score = score * (F.col("r") - 1)
    out = per_src.select("id", score.alias("score"))
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def _closeness_upper_bounds(
    g: Graph,
    n: int,
    ckpt: Checkpointer,
    max_levels: int = 128,
    harmonic: bool = False,
) -> DataFrame:
    """(id, ub): per-node upper bound on GENERALIZED closeness via the
    reference's neighborhood-growth farness lower bound
    (TopCloseness::computelBound1, /root/reference/networkit/cpp/
    centrality/TopCloseness.cpp:69-158), undirected form with EXACT
    reach (reachL == reachU == component size, from connected
    components — the computeReachable step, TopCloseness.cpp:54-67).

    ``harmonic=True`` returns instead an upper bound on the RAW harmonic
    closeness sum_{v} 1/d(u,v) (TopHarmonicCloseness.cpp NBcut bound,
    tightened level-wise): the same growth estimate places the
    (over-)counted mass at weight 1/L per level — since the cumulative
    estimated counts dominate the true cumulative counts at every level
    and the weights 1/L are decreasing, the weighted sum dominates the
    true harmonic sum; the final overshoot is removed at the last
    (cheapest) level, preserving domination.

    Per level L >= 2 the estimated newly-reached count is
        nn[u] = sum over neighbors v of nbrs[v]
                - (L == 2 ? deg(u) : (deg(u)-1) * nbrs_old[u])
    (TopCloseness.cpp:97-110) — an overestimate of true BFS growth, so
    placing that mass at level L gives a LOWER bound on the distance
    sum; once the cumulative estimate N reaches the true reach r, the
    overshoot is clamped at the current level:
        dsum_lb = sumDist - L * (N - r)            (TopCloseness.cpp:120,131)
    Each level is one join+agg over the adjacency (a PageRank-superstep
    shape) with O(n) state — never O(n^2). Counters are doubles: the
    overcounting estimate grows geometrically and must saturate, not
    overflow (the bound stays valid — it only weakens).
    """
    from networkit_spark.operators.components import (
        component_sizes,
        connected_components,
    )

    labels, _ = connected_components(g)
    sizes = component_sizes(labels)
    adj = materialize_partitioned(
        g.adj().filter(F.col("src") != F.col("dst")).select("src", "dst"),
        "src",
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    state = (
        labels.join(sizes, "label")
        .join(deg, "id", "left")
        .select(
            "id",
            F.col("size").cast("double").alias("r"),
            F.coalesce("d", F.lit(0)).cast("double").alias("d"),
        )
        .select(
            "id",
            "r",
            "d",
            F.col("d").alias("nbrs"),
            F.lit(0.0).alias("nbrs_old"),
            F.col("d").alias("sumdist"),
            F.col("d").alias("hsum"),
            (F.col("d") + 1).alias("bign"),
            # isolated nodes finish immediately (TopCloseness.cpp:80-83)
            (F.col("d") == 0).alias("fin"),
            F.when(F.col("d") == 0, 0.0).alias("dsum_lb"),
            F.when(F.col("d") == 0, 0.0).alias("hub"),
        )
    )
    state = ckpt.cut(state, 0)
    level = 1
    while level < max_levels:
        level += 1
        unfin = state.filter(~F.col("fin"))
        if unfin.limit(1).count() == 0:
            break
        sums = (
            state.select(F.col("id").alias("v"), "nbrs")
            .hint("shuffle_hash")
            .join(adj, F.col("v") == adj.dst)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("nbrs").alias("nn_raw"))
        )
        corr = (
            F.col("d")
            if level == 2
            else (F.col("d") - 1) * F.col("nbrs_old")
        )
        nn = F.greatest(
            F.lit(0.0), F.coalesce("nn_raw", F.lit(0.0)) - corr
        )
        new_bign = F.col("bign") + nn
        new_sum = F.col("sumdist") + F.lit(float(level)) * nn
        new_hsum = F.col("hsum") + nn / F.lit(float(level))
        # finished when the estimate covers the exact reach, or growth
        # stalls (then true reach <= N already — the reference's
        # reachU[u] = N[u] case, TopCloseness.cpp:125-139 incl. the
        # assert that N >= reachL whenever growth stalls)
        done_now = (new_bign >= F.col("r")) | (nn == 0)
        new_dsum = new_sum - F.lit(float(level)) * (new_bign - F.col("r"))
        new_hub = new_hsum - (new_bign - F.col("r")) / F.lit(float(level))
        # always-valid harmonic fallback: d neighbors at 1, everything
        # else reachable at distance >= 2 (TopHarmonicCloseness.cpp:446)
        hub_dist2 = F.col("d") + F.greatest(
            F.lit(0.0), F.col("r") - 1 - F.col("d")
        ) / F.lit(2.0)
        state = ckpt.cut(
            state.join(sums, "id", "left").select(
                "id",
                "r",
                "d",
                F.when(F.col("fin"), F.col("nbrs")).otherwise(nn).alias("nbrs"),
                F.when(F.col("fin"), F.col("nbrs_old"))
                .otherwise(F.col("nbrs"))
                .alias("nbrs_old"),
                F.when(F.col("fin"), F.col("sumdist"))
                .otherwise(new_sum)
                .alias("sumdist"),
                F.when(F.col("fin"), F.col("hsum"))
                .otherwise(new_hsum)
                .alias("hsum"),
                F.when(F.col("fin"), F.col("bign"))
                .otherwise(new_bign)
                .alias("bign"),
                (F.col("fin") | done_now).alias("fin"),
                F.when(F.col("fin"), F.col("dsum_lb"))
                .otherwise(
                    F.when(
                        done_now & (new_bign >= F.col("r")),
                        F.greatest(new_dsum, F.col("r") - 1),
                    ).when(
                        done_now,
                        # growth stalled below exact reach — impossible
                        # per the reference's invariant; keep the
                        # always-valid dist-2 bound instead of a clamp
                        # computed from an inconsistent estimate
                        F.greatest(
                            2.0 * (F.col("r") - 1) - F.col("d"),
                            F.col("r") - 1,
                        ),
                    )
                )
                .alias("dsum_lb"),
                F.when(F.col("fin"), F.col("hub"))
                .otherwise(
                    F.when(
                        done_now & (new_bign >= F.col("r")),
                        F.greatest(new_hub, F.lit(0.0)),
                    ).when(done_now, hub_dist2)
                )
                .alias("hub"),
            ),
            level,
        )
    adj.unpersist()
    if harmonic:
        # level cap stragglers fall back to the always-valid dist-2
        # harmonic bound d + (r-1-d)/2
        return state.select(
            "id",
            F.coalesce(
                "hub",
                F.col("d")
                + F.greatest(F.lit(0.0), F.col("r") - 1 - F.col("d")) / 2.0,
            ).alias("ub"),
        )
    # level cap hit with stragglers: fall back to the always-valid
    # dist-2 bound 2*(r-1)-d for them
    return state.select(
        "id",
        F.when(
            F.col("r") > 1,
            (F.col("r") - 1)
            / F.greatest(
                F.coalesce(
                    "dsum_lb", 2.0 * (F.col("r") - 1) - F.col("d")
                ),
                F.col("r") - 1,
            )
            / F.lit(float(n - 1)),
        )
        .otherwise(0.0)
        .alias("ub"),
    )


def top_closeness(
    g: Graph,
    k: int = 10,
    batch: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Top-k closeness WITHOUT the O(n^2) all-sources sweep.

    Reference: TopCloseness (/root/reference/networkit/cpp/centrality/
    TopCloseness.cpp:24-158+, Bergamini et al. ALENEX16): rank nodes by
    a farness lower bound (computelBound1 — see
    :func:`_closeness_upper_bounds`), BFS the most promising first, and
    stop once the bound proves no unswept node can enter the top k. The
    reference's per-node BFScut sweeps one node at a time with a
    priority queue; the distributed form processes candidates in
    ``batch``-sized waves through the existing multi-source tagged BFS,
    so per-wave state is O(batch * n) instead of O(n^2).

    Directed graphs are refused: a tight reach bound needs the
    reference's SCC-condensation reachability machinery
    (ReachableNodes), and without it the bound degenerates to the
    useless 1/(n-1) (a tiny out-star already achieves the maximum
    generalized score).

    Returns (top-k (id, score) ordered by score desc / id asc,
    SuperstepResult whose ``iterations`` is the number of candidates
    actually swept — the pruning evidence).
    """
    if g.directed:
        raise ValueError(
            "top_closeness needs exact per-node reach; directed reach "
            "bounds (SCC condensation) are not implemented"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    if n <= 1:
        return (
            g.nodes().select("id", F.lit(0.0).alias("score")),
            SuperstepResult(iterations=0),
        )
    cand = _closeness_upper_bounds(g, n, ckpt).localCheckpoint(eager=True)
    topk: list[tuple[float, int]] = []  # (score, id), kept sorted best-first
    swept = 0
    metrics: list[dict] = []
    remaining = cand
    while True:
        wave = remaining.orderBy(F.desc("ub"), F.asc("id")).limit(batch)
        wave_rows = wave.collect()
        if not wave_rows:
            break
        kth = topk[k - 1][0] if len(topk) >= k else float("-inf")
        max_ub = max(r["ub"] for r in wave_rows)
        if max_ub < kth:
            break  # bound proves no unswept candidate can enter top-k
        import time as _time

        t0 = _time.time()
        ids = [int(r["id"]) for r in wave_rows]
        src_df = spark.createDataFrame([(i,) for i in ids], "id long")
        settled, _ = _tagged_bfs(g, src_df, None, ckpt)
        exact = (
            settled.groupBy(F.col("s").alias("id"))
            .agg(F.count("*").alias("r"), F.sum("dist").alias("dsum"))
            .select(
                "id",
                F.when(
                    F.col("dsum") > 0,
                    (F.col("r") - 1) / F.col("dsum") / F.lit(float(n - 1)),
                )
                .otherwise(0.0)
                .alias("score"),
            )
            .collect()
        )
        swept += len(ids)
        for row in exact:
            topk.append((float(row["score"]), int(row["id"])))
        # best-first: score desc, id asc
        topk.sort(key=lambda t: (-t[0], t[1]))
        del topk[k:]
        remaining = remaining.join(
            src_df.hint("broadcast"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        metrics.append(
            ckpt.log(
                swept,
                swept=swept,
                kth=topk[k - 1][0] if len(topk) >= k else None,
                max_ub=max_ub,
                wall_sec=_time.time() - t0,
            )
        )
    out = spark.createDataFrame(
        [(i, s) for s, i in topk], "id long, score double"
    )
    return out, SuperstepResult(iterations=swept, metrics=metrics)


def top_harmonic_closeness(
    g: Graph,
    k: int = 10,
    batch: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Top-k RAW harmonic closeness (sum of 1/d(u,v)) without the
    all-sources sweep.

    Reference: TopHarmonicCloseness NBcut (/root/reference/networkit/
    cpp/centrality/TopHarmonicCloseness.cpp:113-167,446-451): rank by a
    per-node harmonic UPPER bound, sweep best-first, stop when the
    bound proves no unswept node can beat the current k-th score. The
    distributed form batches candidates through the multi-source tagged
    BFS (state O(batch * n)); the initial bound is the level-wise
    neighborhood-growth bound (strictly tighter than the reference's
    deg + (reach-deg)/2 seed bound — see
    :func:`_closeness_upper_bounds` ``harmonic=True``).

    Directed graphs are refused for the same reach-bound reason as
    :func:`top_closeness`. Returns (top-k (id, score) desc/id asc,
    SuperstepResult with ``iterations`` = candidates actually swept).
    """
    if g.directed:
        raise ValueError(
            "top_harmonic_closeness needs exact per-node reach; directed "
            "reach bounds (SCC condensation) are not implemented"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    if n <= 1:
        return (
            g.nodes().select("id", F.lit(0.0).alias("score")),
            SuperstepResult(iterations=0),
        )
    cand = _closeness_upper_bounds(g, n, ckpt, harmonic=True).localCheckpoint(
        eager=True
    )
    topk: list[tuple[float, int]] = []
    swept = 0
    metrics: list[dict] = []
    remaining = cand
    while True:
        wave = remaining.orderBy(F.desc("ub"), F.asc("id")).limit(batch)
        wave_rows = wave.collect()
        if not wave_rows:
            break
        kth = topk[k - 1][0] if len(topk) >= k else float("-inf")
        max_ub = max(r["ub"] for r in wave_rows)
        if max_ub < kth:
            break
        import time as _time

        t0 = _time.time()
        ids = [int(r["id"]) for r in wave_rows]
        src_df = spark.createDataFrame([(i,) for i in ids], "id long")
        settled, _ = _tagged_bfs(g, src_df, None, ckpt)
        exact = (
            settled.groupBy(F.col("s").alias("id"))
            .agg(
                F.coalesce(
                    F.sum(
                        F.when(F.col("dist") > 0, 1.0 / F.col("dist"))
                    ),
                    F.lit(0.0),
                ).alias("score")
            )
            .collect()
        )
        swept += len(ids)
        # rank on scores quantized to 1e-9: the raw float sums differ in
        # the last bits by summation order alone (true scores are
        # multiples of 1/lcm(1..diameter), orders of magnitude coarser),
        # so a mathematical tie at the k-th boundary must not be broken
        # by FP noise — quantize, then id asc
        for row in exact:
            topk.append((round(float(row["score"]), 9), int(row["id"])))
        topk.sort(key=lambda t: (-t[0], t[1]))
        del topk[k:]
        remaining = remaining.join(
            src_df.hint("broadcast"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        metrics.append(
            ckpt.log(
                swept,
                swept=swept,
                kth=topk[k - 1][0] if len(topk) >= k else None,
                max_ub=max_ub,
                wall_sec=_time.time() - t0,
            )
        )
    out = spark.createDataFrame(
        [(i, s) for s, i in topk], "id long, score double"
    )
    return out, SuperstepResult(iterations=swept, metrics=metrics)


def all_pairs_hop_distances(
    g: Graph,
    sources=None,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(s, v, dist) hop distances from every source (default: all nodes)
    via the batched tagged BFS — the distance relation consumed by
    group_harmonic_closeness and fixture-scale diameter checks.
    O(n * reachable) rows: all-pairs is fixture-scale; pass ``sources``
    (a sample) for the scale path."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    settled, _ = _tagged_bfs(g, _sources(g, sources), max_hops, ckpt)
    return settled


def harmonic_closeness(
    g: Graph,
    normalized: bool = False,
    sources=None,
    max_hops: int | None = None,
    weighted: bool = False,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) harmonic closeness: sum of 1/d(u, v) over reachable
    v != u (HarmonicCloseness.cpp:24-44); normalized divides by n-1.
    ``weighted=True`` uses Dijkstra-mode weighted distances."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    n = g.number_of_nodes()
    sweep = _tagged_sssp if weighted else _tagged_bfs
    settled, metrics = sweep(g, _sources(g, sources), max_hops, ckpt)
    per_src = settled.filter(F.col("dist") > 0).groupBy(
        F.col("s").alias("id")
    ).agg(F.sum(1.0 / F.col("dist")).alias("score"))
    out = (
        _sources(g, sources)
        .join(per_src, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    if normalized and n > 1:
        out = out.select("id", (F.col("score") / F.lit(float(n - 1))).alias("score"))
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)
