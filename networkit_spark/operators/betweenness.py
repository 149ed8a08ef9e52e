"""Betweenness centrality — multi-source distributed Brandes.

Reference:
  - exact: /root/reference/networkit/cpp/centrality/Betweenness.cpp:22-110
    — per-source SSSP (BFS for unweighted) + dependency accumulation in
    decreasing-distance order:
        delta_s(v) = sum_{w: succ_s(v)} sigma_s(v)/sigma_s(w) * (1 + delta_s(w))
        bc(v) = sum_{s != v} delta_s(v)
  - sampled: EstimateBetweenness
    (/root/reference/networkit/cpp/centrality/EstimateBetweenness.cpp) —
    same dependencies from a source sample, scores scaled by n/k.

Spark plan — ALL sources advance in one frontier keyed (s, v):

  forward (one superstep per BFS level): frontier (s, v, sigma) joins
  the cached src-partitioned adjacency; new (s, dst) pairs aggregate
  path counts sigma and are anti-joined against the settled set; each
  level's (s, v, sigma) relation is retained.

  backward (one superstep per level, descending): delta at level l is a
  join of level-l vertices with their level-(l+1) successors:
  groupBy(s, v) sum of sigma_v/sigma_w * (1 + delta_w).

  bc(v) = hash-agg over all (s != v) dependency rows.

State is O(#sources * n) rows; supersteps = 2 * eccentricity. For the
exact variant on an n-node graph that is O(n^2) state — the reference
has the same total work; sample sources (estimate_betweenness) for
anything big, exactly as the reference prescribes.
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


def betweenness(
    g: Graph,
    sources: DataFrame | list | None = None,
    max_hops: int | None = None,
    normalized: bool = False,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(id, score) betweenness over shortest-path DAGs from ``sources``
    (default: every node = the exact Brandes sum). Unweighted hop
    shortest paths (the reference's BFS mode). ``max_hops`` caps the
    forward expansion (the <=k-hop dependency sum — what the unrolled
    oracle computes). ``normalized`` divides by (n-1)(n-2) as the
    reference does for undirected graphs (both (s,t) orders are summed,
    mirroring Betweenness.cpp's full source loop)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    if sources is None:
        src_df = nodes
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").cast("long").alias("id"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    metrics: list[dict] = []

    # ---- forward: multi-source BFS with path counting -------------------
    frontier = src_df.select(
        F.col("id").alias("s"), F.col("id").alias("v"), F.lit(1.0).alias("sigma")
    )
    frontier = ckpt.cut(frontier, 0)
    levels: list[DataFrame] = [frontier]  # levels[l] = (s, v, sigma) at dist l
    settled = frontier.select("s", "v")
    cap = max_hops if max_hops is not None else 2**31
    lvl = 0
    while lvl < cap:
        t0 = time.time()
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", F.col("nv").alias("v"), "sigma")
            .join(settled, ["s", "v"], "left_anti")
        )
        lvl += 1
        nxt = ckpt.cut(nxt, lvl)
        cnt = nxt.count()
        metrics.append(
            ckpt.log(lvl, state=nxt, phase="fwd", frontier=cnt, wall_sec=time.time() - t0)
        )
        if cnt == 0:
            lvl -= 1
            break
        levels.append(nxt)
        settled = settled.unionByName(nxt.select("s", "v")).localCheckpoint(
            eager=True
        )
        frontier = nxt

    # ---- backward: dependency accumulation, deepest level first ---------
    # delta rows exist only where > 0; at the deepest level all deltas are 0
    delta = levels[-1].select("s", "v", F.lit(0.0).alias("delta"))
    acc = None  # accumulated (s, v, delta) over all levels (delta > 0 rows)
    for l in range(len(levels) - 2, -1, -1):
        t0 = time.time()
        cur = levels[l]
        child = delta.select(
            "s",
            F.col("v").alias("w"),
            F.col("delta").alias("dw"),
        ).join(
            levels[l + 1].select("s", F.col("v").alias("w"), F.col("sigma").alias("sw")),
            ["s", "w"],
        )
        # successors of v at level l are its adjacency targets at level l+1
        contrib = (
            cur.hint("shuffle_hash")
            .join(adj, cur.v == adj.src)
            .select("s", "v", "sigma", F.col("dst").alias("w"))
            .join(child, ["s", "w"])
            .groupBy("s", "v")
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sw")) * (F.lit(1.0) + F.col("dw"))
                ).alias("delta")
            )
        )
        delta = (
            cur.select("s", "v")
            .join(contrib, ["s", "v"], "left")
            .select("s", "v", F.coalesce("delta", F.lit(0.0)).alias("delta"))
        )
        delta = ckpt.cut(delta, 1000 + l)
        acc = delta if acc is None else acc.unionByName(delta).localCheckpoint(
            eager=True
        )
        metrics.append(
            ckpt.log(1000 + l, state=delta, phase="bwd", level=l, wall_sec=time.time() - t0)
        )

    if acc is None:
        acc = delta
    bc = (
        acc.filter(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("score"))
    )
    out = (
        nodes.join(bc, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
    if normalized and n > 2:
        out = out.select(
            "id", (F.col("score") / F.lit(float((n - 1) * (n - 2)))).alias("score")
        )
    adj.unpersist()
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def weighted_betweenness(
    g: Graph,
    sources: DataFrame | list | None = None,
    max_hops: int | None = None,
    sigma_rounds: int | None = None,
    delta_rounds: int | None = None,
    normalized: bool = False,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Brandes betweenness over WEIGHTED shortest paths — the
    reference's Dijkstra mode (Betweenness.cpp:22-110 constructs
    Dijkstra when G.isWeighted; dependency rule identical).

    Distributed form: (1) multi-source weighted distances via the
    Bellman-Ford tagged sweep (same fixpoint as Dijkstra for
    non-negative weights); (2) the shortest-path DAG is every edge
    (z, t) with dist(z) + w(z,t) == dist(t) — exact double equality,
    safe because distances are sums of the input weights; (3) sigma
    (path counts) and delta (dependencies) are computed as synchronous
    fixpoints over the DAG: sigma forward (converges in DAG hop-depth
    rounds, monotone), delta backward (same bound). ``max_hops`` /
    ``sigma_rounds`` / ``delta_rounds`` cap the three loops — fixed
    caps make the computation the exact <=k-round relaxation the
    unrolled oracle replays; None runs to the fixpoint.

    State is O(#sources * n) like the unweighted sweep; pass a seed
    subset at scale exactly as the reference prescribes.
    """
    from networkit_spark.operators.closeness import _tagged_sssp

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    if sources is None:
        src_df = nodes
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col("id").cast("long").alias("id"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "id long")
    dist, sssp_metrics = _tagged_sssp(g, src_df, max_hops, ckpt)
    dist = ckpt.cut(dist, 300)
    metrics: list[dict] = list(sssp_metrics)

    adj = (
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
    )
    # shortest-path DAG per source: (s, z, t) with dz + w == dt
    dag = (
        dist.select("s", F.col("v").alias("z"), F.col("dist").alias("dz"))
        .join(adj, F.col("z") == adj.src)
        .select("s", "z", F.col("dst").alias("t"), (F.col("dz") + F.col("weight")).alias("cand"))
        .join(
            dist.select("s", F.col("v").alias("t"), F.col("dist").alias("dt")),
            ["s", "t"],
        )
        .filter(F.col("cand") == F.col("dt"))
        .select("s", "z", "t")
    )
    dag = materialize_partitioned(dag, "s", "t")

    # ---- sigma fixpoint (forward path counts) ----------------------------
    sigma = dist.select(
        "s", "v", F.when(F.col("s") == F.col("v"), 1.0).otherwise(0.0).alias("sig")
    )
    sigma = ckpt.cut(sigma, 400)
    rnd = 0
    cap = sigma_rounds if sigma_rounds is not None else 2**31
    while rnd < cap:
        rnd += 1
        t0 = time.time()
        new_sigma = (
            sigma.select("s", F.col("v").alias("z"), "sig")
            .join(dag, ["s", "z"])
            .groupBy("s", F.col("t").alias("v"))
            .agg(F.sum("sig").alias("agg_sig"))
        )
        merged = (
            sigma.join(new_sigma, ["s", "v"], "left")
            .select(
                "s",
                "v",
                F.when(F.col("s") == F.col("v"), 1.0)
                .otherwise(F.coalesce("agg_sig", F.lit(0.0)))
                .alias("new_sig"),
                "sig",
            )
        )
        merged = ckpt.cut(merged, 400 + rnd)
        changed = merged.filter(F.col("new_sig") != F.col("sig")).count()
        sigma = merged.select("s", "v", F.col("new_sig").alias("sig"))
        metrics.append(
            ckpt.log(400 + rnd, phase="sigma", changed=changed, wall_sec=time.time() - t0)
        )
        if changed == 0:
            break

    # ---- delta fixpoint (backward dependencies) --------------------------
    delta = dist.select("s", "v", F.lit(0.0).alias("delta"))
    delta = ckpt.cut(delta, 500)
    rnd = 0
    cap = delta_rounds if delta_rounds is not None else 2**31
    while rnd < cap:
        rnd += 1
        t0 = time.time()
        contrib = (
            dag.join(
                sigma.select("s", F.col("v").alias("z"), F.col("sig").alias("sz")),
                ["s", "z"],
            )
            .join(
                sigma.select("s", F.col("v").alias("t"), F.col("sig").alias("st_")),
                ["s", "t"],
            )
            .join(
                delta.select("s", F.col("v").alias("t"), F.col("delta").alias("dt_")),
                ["s", "t"],
            )
            .groupBy("s", F.col("z").alias("v"))
            .agg(
                F.sum(
                    (F.col("sz") / F.col("st_")) * (F.lit(1.0) + F.col("dt_"))
                ).alias("agg_d")
            )
        )
        merged = delta.join(contrib, ["s", "v"], "left").select(
            "s", "v", F.coalesce("agg_d", F.lit(0.0)).alias("new_delta"), "delta"
        )
        merged = ckpt.cut(merged, 500 + rnd)
        changed = merged.filter(F.col("new_delta") != F.col("delta")).count()
        delta = merged.select("s", "v", F.col("new_delta").alias("delta"))
        metrics.append(
            ckpt.log(500 + rnd, phase="delta", changed=changed, wall_sec=time.time() - t0)
        )
        if changed == 0:
            break
    dag.unpersist()

    bc = (
        delta.filter(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("score"))
    )
    out = nodes.join(bc, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized and n > 2:
        out = out.select(
            "id", (F.col("score") / F.lit(float((n - 1) * (n - 2)))).alias("score")
        )
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def approx_betweenness(
    g: Graph,
    epsilon: float = 0.01,
    delta: float = 0.1,
    universal_constant: float = 1.0,
    seed: int = 42,
    vd: int | None = None,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """ApproxBetweenness — the Riondato-Kornaropoulos path-sampling
    estimator with the (epsilon, delta) ADDITIVE error guarantee:
    every normalized betweenness score is within epsilon with
    probability >= 1 - delta.

    Reference: /root/reference/networkit/cpp/centrality/
    ApproxBetweenness.cpp:29-104 —
      r = ceil((c/eps^2) * (floor(log2(vd - 2)) + 1 - ln(delta)))
    sampled node pairs (u, v); per pair one SSSP from u, then ONE
    uniformly random shortest u-v path sampled by walking back from v
    choosing predecessor z with probability sigma(z)/sigma(t); each
    interior node of the sampled path gets +1/r. ``vd`` is the diameter
    estimate the bound needs (the reference runs ESTIMATED_PEDANTIC;
    pass it explicitly for reproducibility, else the exact iFUB
    diameter is computed). vd <= 2 returns all zeros like :40-43.

    Determinism (RNG-free, cross-engine): pair sampling and the
    per-step weighted choice derive uniforms from md5 (first 13 hex
    nibbles / 16^13 — exact in doubles), so the DuckDB oracle replays
    the identical paths.

    Spark plan: ONE multi-source sigma-counting BFS from the distinct
    sampled sources (state O(#sources * n) — by construction
    #sources <= r, independent of n: THE point of the ep-delta bound),
    then one backward superstep per path hop over O(r) walk rows with a
    per-walk cumulative-sigma window (partitioned by walk id, bounded
    by in-degree).
    """
    import math

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    zeros = nodes.select("id", F.lit(0.0).alias("score"))
    if n < 3:
        return zeros, SuperstepResult(iterations=0)
    if vd is None:
        from networkit_spark.operators.diameter import diameter as _diam

        lo, hi = _diam(g, algo="estimated_range", check=False)
        vd = int(hi)
    if vd <= 2:
        return zeros, SuperstepResult(iterations=0)
    r = int(
        math.ceil(
            (universal_constant / (epsilon * epsilon))
            * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
        )
    )

    # -- deterministic pair sample: u = perm[H(i) mod n], v offset from u
    from networkit_spark.plans.ids import dense_ids

    idx = dense_ids(nodes, ["id"], "idx").localCheckpoint(eager=True)

    def _h(tag: str, col):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|{tag}|"), col.cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("long")

    samples = (
        spark.range(r)
        .select(F.col("id").alias("i"))
        .select(
            "i",
            (_h("u", F.col("i")) % n).alias("uidx"),
            (
                (_h("u", F.col("i")) % n + 1 + _h("v", F.col("i")) % (n - 1)) % n
            ).alias("vidx"),
        )
        .join(idx.select(F.col("idx").alias("uidx"), F.col("id").alias("s")), "uidx")
        .join(idx.select(F.col("idx").alias("vidx"), F.col("id").alias("t")), "vidx")
        .select("i", "s", "t")
        .localCheckpoint(eager=True)
    )

    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    metrics: list[dict] = []

    # -- forward: sigma-counting BFS from the DISTINCT sampled sources
    frontier = samples.select(F.col("s").alias("s")).distinct().select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma"),
        F.lit(0).cast("long").alias("dist"),
    )
    frontier = ckpt.cut(frontier, 0)
    sig = frontier
    cap = max_hops if max_hops is not None else 2**31
    lvl = 0
    while lvl < cap:
        t0 = time.time()
        nxt = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.v == adj.src)
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
            .select(
                "s", F.col("nv").alias("v"), "sigma",
                F.lit(lvl + 1).cast("long").alias("dist"),
            )
            .join(sig.select("s", "v"), ["s", "v"], "left_anti")
        )
        lvl += 1
        nxt = ckpt.cut(nxt, lvl)
        cnt = nxt.count()
        metrics.append(
            ckpt.log(lvl, phase="fwd", frontier=cnt, wall_sec=time.time() - t0)
        )
        if cnt == 0:
            break
        # union of cut per-level increments — never re-materializes the
        # whole sigma relation per level; compact every 8 levels
        sig = sig.unionByName(nxt)
        if lvl % 8 == 0:
            sig = ckpt.cut(sig, 100 + lvl)
        frontier = nxt

    # -- backward: one uniformly-sampled shortest path per reachable pair
    walk = (
        samples.join(
            sig.select("s", F.col("v").alias("t"), F.col("dist").alias("td")),
            ["s", "t"],
        )
        .filter(F.col("td") > 0)
        .select("i", "s", "t", "td")
    )
    walk = ckpt.cut(walk, 200)
    contribs: DataFrame | None = None
    step = 0
    max_steps = (vd + 2) * 2
    from networkit_spark.plans.sampling import (
        bucketed_pred_draw,
        pred_bucket_width,
    )

    max_id = int(nodes.agg(F.max("id").alias("m")).collect()[0]["m"] or 0)
    bw_width = pred_bucket_width(max_id)
    while step < max_steps:
        step += 1
        t0 = time.time()
        if walk.limit(1).count() == 0:
            break
        # predecessors of t: in-neighbors settled at dist(t) - 1
        back = adj.select(F.col("dst").alias("t"), F.col("src").alias("z"))
        preds = (
            walk.join(back, "t")
            .join(
                sig.select(
                    "s", F.col("v").alias("z"), F.col("sigma").alias("sz"),
                    F.col("dist").alias("zd"),
                ),
                ["s", "z"],
            )
            .filter(F.col("zd") == F.col("td") - 1)
            .join(
                sig.select("s", F.col("v").alias("t"), F.col("sigma").alias("st_")),
                ["s", "t"],
            )
        )
        u01 = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{seed}|p|"),
                            F.col("i").cast("string"),
                            F.lit("|"),
                            F.lit(step).cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**13))
        )
        # hub-safe range-bucketed draw (plans/sampling.py) — identical
        # pick to the old single-window cumulative sort, never an
        # O(deg)-row window partition on a hub predecessor set
        chosen = bucketed_pred_draw(preds, u01, bw_width)
        chosen = ckpt.cut(chosen, 200 + step)
        inner = chosen.filter(F.col("z") != F.col("s")).select(F.col("z").alias("id"))
        contribs = (
            inner
            if contribs is None
            else contribs.unionByName(inner).localCheckpoint(eager=True)
        )
        walk = chosen.filter(F.col("z") != F.col("s")).select(
            "i", "s", F.col("z").alias("t"), F.col("zd").alias("td")
        )
        metrics.append(ckpt.log(200 + step, phase="bwd", wall_sec=time.time() - t0))
    adj.unpersist()

    if contribs is None:
        return zeros, SuperstepResult(iterations=len(metrics), metrics=metrics)
    bc = contribs.groupBy("id").agg(
        (F.count("*") / F.lit(float(r))).alias("score")
    )
    out = nodes.join(bc, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    return out, SuperstepResult(iterations=len(metrics), metrics=metrics)


def estimate_betweenness(
    g: Graph,
    n_samples: int,
    seed: int = 42,
    max_hops: int | None = None,
    normalized: bool = False,
) -> tuple[DataFrame, SuperstepResult]:
    """EstimateBetweenness: dependencies from a deterministic source
    sample (smallest n_samples md5-hash values — RNG-free and
    cross-engine reproducible instead of Aux::Random draws), then the
    reference's extrapolation: scores * (2n / nSamples), divided by
    (n-1)(n-2) when normalized (EstimateBetweenness.cpp:85-110)."""
    nodes = g.nodes()
    n = nodes.count()
    ranked = nodes.select(
        "id",
        F.md5(F.concat(F.lit(f"{seed}|"), F.col("id").cast("string"))).alias("h"),
    ).orderBy("h", "id").limit(n_samples).select("id")
    scores, info = betweenness(g, sources=ranked, max_hops=max_hops)
    if n_samples > 0:
        factor = 2.0 * n / n_samples
        if normalized and n > 2:
            factor /= float((n - 1) * (n - 2))
        scores = scores.select(
            "id", (F.col("score") * F.lit(factor)).alias("score")
        )
    return scores, info
