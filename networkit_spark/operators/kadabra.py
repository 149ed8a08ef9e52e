"""KadabraBetweenness — adaptive epsilon-delta betweenness sampling.

Reference: /root/reference/networkit/cpp/centrality/KadabraBetweenness.cpp
(Borassi-Natale ADaptive Algorithm for Betweenness via Random
Approximation), absolute-error mode (k=0 / absolute, unionSample = n):
  - omega = 0.5/err^2 * (log2(diameter - 1) + 1 + ln(0.5/delta))   (:309)
  - tau = omega / startFactor initial samples -> rough estimates     (:311)
  - computeDeltaGuess binary-searches the exponent b so the union of
    per-node Chernoff failure probabilities stays below delta        (:173)
  - per-node deltaGuess = exp(-b * errL^2 / bet) + delta*bf/(4n)     (:223)
  - epochs of fresh samples; stop when computeF/computeG error bounds
    (:88-105, empirical-Bernstein shapes) are below err for EVERY
    node, or nPairs >= omega                                         (:475)

Deterministic cross-engine variant (documented deviations, both engines
identical): all randomness is md5-derived like approx_betweenness (the
sample POOL of tau*(1+E) paths is fixed up front, so adaptivity decides
how much of the pool to consume — the draws themselves are
decision-independent); the deltaGuess bisection runs a FIXED 40
iterations from dyadic literals (strictly tighter than the reference's
``b - a > err/10``) with each exp term quantized to 6 decimals so the
two engines sum identical values; deltaGuess is quantized to 9
decimals.  In absolute mode computeBetErr sets errL = errU = err
(:138-143), so deltaLGuess == deltaUGuess and the reference's separate
L/U bookkeeping collapses.

Spark plan: per batch, ONE multi-source sigma-counting BFS from the
distinct sampled sources + one backward superstep per hop (exactly the
approx_betweenness plan — O(batch * n) state, never O(n^2)); the
adaptive scalars live on O(samples * diameter) collected rows,
independent of n.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.sampling import bucketed_pred_draw, pred_bucket_width
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)

_BF = 0.001  # balancingFactor (KadabraBetweenness.cpp:175)


def _round_half_away(x: float, nd: int) -> float:
    """DuckDB-compatible ROUND (half away from zero) — Python's round()
    is banker's and would diverge on exact .5 boundaries."""
    p = 10.0**nd
    return math.floor(x * p + 0.5) / p if x >= 0 else -math.floor(-x * p + 0.5) / p


def _path_interiors(
    g: Graph,
    adj: DataFrame,
    idx: DataFrame,
    n: int,
    lo: int,
    hi: int,
    seed: int,
    ckpt: Checkpointer,
    max_hops: int | None,
) -> list[tuple[int, int]]:
    """Interior nodes of the uniformly-sampled shortest path for pool
    indices lo..hi-1, as (i, node) rows — same draw derivation as
    approx_betweenness (md5 tags u/v for the pair, p|i|step for the
    backward choice) so the DuckDB oracle replays them verbatim."""
    spark = g.edges.sparkSession

    def _h(tag: str, col):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|{tag}|"), col.cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("long")

    samples = (
        spark.range(lo, hi)
        .select(F.col("id").alias("i"))
        .select(
            "i",
            (_h("u", F.col("i")) % n).alias("uidx"),
            ((_h("u", F.col("i")) % n + 1 + _h("v", F.col("i")) % (n - 1)) % n)
            .alias("vidx"),
        )
        .join(idx.select(F.col("idx").alias("uidx"), F.col("id").alias("s")), "uidx")
        .join(idx.select(F.col("idx").alias("vidx"), F.col("id").alias("t")), "vidx")
        .select("i", "s", "t")
        .localCheckpoint(eager=True)
    )

    # forward sigma-counting BFS from the distinct sources of this batch
    frontier = samples.select("s").distinct().select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma"),
        F.lit(0).cast("long").alias("dist"),
    )
    frontier = ckpt.cut(frontier, 0)
    sig = frontier
    cap = max_hops if max_hops is not None else 2**31
    lvl = 0
    while lvl < cap:
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
        if nxt.limit(1).count() == 0:
            break
        # union of cut per-level increments — never re-materializes the
        # whole sigma relation per level; compact every 8 levels
        sig = sig.unionByName(nxt)
        if lvl % 8 == 0:
            sig = ckpt.cut(sig, 100 + lvl)
        frontier = nxt

    walk = (
        samples.join(
            sig.select("s", F.col("v").alias("t"), F.col("dist").alias("td")),
            ["s", "t"],
        )
        .filter(F.col("td") > 0)
        .select("i", "s", "t", "td")
    )
    walk = ckpt.cut(walk, 200)
    max_id = int(idx.agg(F.max("id").alias("m")).collect()[0]["m"] or 0)
    bw_width = pred_bucket_width(max_id)
    out: list[tuple[int, int]] = []
    step = 0
    while step < (cap if max_hops is not None else lvl + 2):
        step += 1
        if walk.limit(1).count() == 0:
            break
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
                            F.lit(f"|{step}"),
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
        inner = chosen.filter(F.col("z") != F.col("s"))
        out.extend((int(r["i"]), int(r["z"])) for r in inner.collect())
        walk = inner.select("i", "s", F.col("z").alias("t"), F.col("zd").alias("td"))
    return out


def kadabra_betweenness(
    g: Graph,
    err: float = 0.1,
    delta: float = 0.1,
    vd: int | None = None,
    start_factor: int = 100,
    seed: int = 42,
    max_hops: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(scores(id, score), info) — normalized betweenness fractions with
    |score - true| <= err for every node with probability >= 1 - delta.

    ``info.metrics[-1]`` records ``n_pairs`` actually consumed and
    ``omega``; adaptivity means n_pairs <= ceil-to-epoch(omega), always
    less than the non-adaptive RK bound at equal (err, delta) — the
    reference's headline claim, asserted in tests.
    """
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

    omega = 0.5 / (err * err) * (math.log2(vd - 1) + 1 + math.log(0.5 / delta))
    tau = int(math.ceil(omega / start_factor))
    n_epochs = int(math.ceil(omega / tau))

    from networkit_spark.plans.ids import dense_ids

    idx = dense_ids(nodes, ["id"], "idx").localCheckpoint(eager=True)
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
    metrics: list[dict] = []
    t0 = time.time()

    # ---- phase 1: tau samples -> bet1 -> deltaGuess ----------------------
    p1 = _path_interiors(g, adj, idx, n, 0, tau, seed, ckpt, max_hops)
    c1: dict[int, int] = {}
    for _, v in p1:
        c1[v] = c1.get(v, 0) + 1
    bet1 = {v: c / tau for v, c in c1.items()}  # every other node: 0

    err2 = err * err
    thr = delta / 2.0 * (1 - _BF)
    b0 = (1.0 / err2) * math.log(n * (4.0 * (1 - _BF)) / delta)
    a, b = 0.0, b0
    for _ in range(40):  # fixed-count bisection (cross-engine replayable)
        c = (a + b) / 2.0
        s = sum(
            2.0 * _round_half_away(math.exp(-c * err2 / bv), 6)
            for bv in bet1.values()
        )
        if s >= thr:
            a = c
        else:
            b = c
    c0 = (delta * _BF / 4.0) / n
    dg = {
        v: _round_half_away(math.exp(-b * err2 / bv), 9) + c0
        for v, bv in bet1.items()
    }
    metrics.append(ckpt.log(0, phase="guess", tau=tau, b=b,
                            wall_sec=time.time() - t0))

    # ---- phase 2: epochs until all f/g bounds < err or nPairs >= omega ---
    def f_bound(btilde: float, r: int, dl: float) -> float:
        tmp = omega / r - 1.0 / 3
        e = (math.log(1.0 / dl) / r) * (
            -tmp + math.sqrt(tmp * tmp + 2 * btilde * omega / math.log(1.0 / dl))
        )
        return min(e, btilde)

    def g_bound(btilde: float, r: int, du: float) -> float:
        tmp = omega / r + 1.0 / 3
        e = (math.log(1.0 / du) / r) * (
            tmp + math.sqrt(tmp * tmp + 2 * btilde * omega / math.log(1.0 / du))
        )
        return min(e, 1.0 - btilde)

    cum: dict[int, int] = {}
    n_pairs = 0
    epoch = 0
    finished = False
    while epoch < n_epochs and not finished:
        epoch += 1
        t0 = time.time()
        pe = _path_interiors(
            g, adj, idx, n, tau * epoch, tau * (epoch + 1), seed, ckpt, max_hops
        )
        for _, v in pe:
            cum[v] = cum.get(v, 0) + 1
        n_pairs = tau * epoch
        # every node must satisfy both bounds; nodes outside `cum` have
        # btilde = 0 and split into two classes by their deltaGuess
        finished = True
        checked = set()
        for v, cv in cum.items():
            dv = dg.get(v, c0)
            bt = cv / n_pairs
            if not (f_bound(bt, n_pairs, dv) < err
                    and g_bound(bt, n_pairs, dv) < err):
                finished = False
                break
            checked.add(v)
        if finished:
            for v, dv in dg.items():
                if v in checked:
                    continue
                if not (f_bound(0.0, n_pairs, dv) < err
                        and g_bound(0.0, n_pairs, dv) < err):
                    finished = False
                    break
        # the never-sampled node class (btilde = 0, deltaGuess = c0) —
        # only when such nodes exist (they always do when the sample
        # pool touches fewer than n nodes)
        if finished and len(set(cum) | set(dg)) < n and not (
            f_bound(0.0, n_pairs, c0) < err and g_bound(0.0, n_pairs, c0) < err
        ):
            finished = False
        metrics.append(
            ckpt.log(epoch, phase="epoch", n_pairs=n_pairs, omega=omega,
                     finished=finished, wall_sec=time.time() - t0)
        )
    adj.unpersist()

    scores = (
        spark.createDataFrame(
            [(v, c) for v, c in cum.items()] or [(-1, 0)], "id long, c long"
        )
        if cum
        else spark.createDataFrame([(-1, 0)], "id long, c long")
    )
    out = (
        nodes.join(scores, "id", "left")
        .select(
            "id",
            (F.coalesce("c", F.lit(0)) / F.lit(float(n_pairs))).alias("score"),
        )
    )
    # both exits are legitimate terminations in the reference
    # (checkConvergence: computeFinished(status) || nPairs >= omega)
    return out, SuperstepResult(
        iterations=epoch,
        metrics=metrics
        + [{"n_pairs": n_pairs, "omega": omega, "tau": tau,
            "early_stop": finished}],
        converged=finished or n_pairs >= omega,
    )
