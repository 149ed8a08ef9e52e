"""PageRank — synchronous power iteration, reference-exact semantics.

Reference: /root/reference/networkit/cpp/centrality/PageRank.cpp:21-128
(signature include/networkit/centrality/PageRank.hpp:61-88). Semantics
reproduced exactly:

  - init ``score = 1/n``; denominators ``deg[v] = weightedDegree(v)``
    (out-direction for directed graphs) (PageRank.cpp:26-32);
  - superstep ``pr[u] = damp * sum_{(v,u) in E_in} score[v]*w/deg[v]
    + (1-damp)/n`` — gather over INCOMING edges; for undirected graphs
    the in-edge view is all neighbors (PageRank.cpp:68-78);
  - sink (dangling) redistribution when directed AND (DISTRIBUTE_SINKS or
    normalized): every node gains ``damp/n * sum_sinks score[sink]``
    (PageRank.cpp:84-91);
  - convergence AFTER the update, before swap: ``iterations >=
    max_iterations`` or ``norm(old - new) <= tol`` with L2 =
    sqrt(sum d^2) / L1 = sum |d| (PageRank.cpp:46-63,93-96);
  - post-processing: ``normalized`` divides by normFactor; directed +
    NO_SINK_HANDLING rescales to sum 1 (PageRank.cpp:100-123).

Two physical engines, identical results:

  - ``engine="dataframe"`` (default): the superstep is one shuffle-light
    plan — ``scores ⋈ flow_edges on id=src`` then ``groupBy(dst)`` hash
    aggregation (partial aggregation = the reference's per-thread OMP
    accumulation). The O(m) flow-edge table is normalized (w/deg
    precomputed), repartitioned on src ONCE and cached; each superstep
    shuffles only the O(n) score table. At cluster scale this is the
    plan you want: edges never move after iteration 0.
  - ``engine="csr"``: per-partition CSR gather-scatter as grouped pandas
    UDFs (north-star shape): edges are blocked by ``pmod(src, P)``; a
    cogrouped applyInPandas receives (edge block, score block) per key,
    computes partial dst-sums in numpy (Arrow-batched, no per-row
    Python), and only (dst, partial) rows are shuffled for the final
    combine.

Degree skew: hub sources concentrate flow rows in one block; the
optional ``salt`` knob splits flow on ``(src, pmod(dst, salt))`` and
replicates the score side ``salt`` ways — the Spark analogue of the
reference's ``balancedParallelForNodes`` guided scheduling
(AdjListGraphImpl.hpp:60-69). AQE skew-join splitting is on by default.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult

NO_SINK_HANDLING = "no_sink_handling"
DISTRIBUTE_SINKS = "distribute_sinks"


@dataclass
class PageRankResult:
    """scores: (id: long, score: double); info mirrors numberOfIterations()
    (PageRank.hpp:79) and maximum() (PageRank.cpp:130)."""

    scores: DataFrame
    info: SuperstepResult = field(default=None)

    def ranking(self, k: int | None = None) -> DataFrame:
        """Centrality::ranking() — desc by score, asc by id on ties
        (/root/reference/networkit/cpp/centrality/Centrality.cpp:27-39)."""
        r = self.scores.orderBy(F.desc("score"), F.asc("id"))
        return r.limit(k) if k is not None else r

    def maximum(self) -> float:
        return float(self.scores.agg(F.max("score")).collect()[0][0])


def _flow_edges(g: Graph) -> DataFrame:
    """Mass-flow table: one row per (v -> u) transfer with the fraction
    w(v,u)/weightedDegree(v) precomputed (loop-invariant, so hoisted out
    of the iteration — the reference recomputes ``w/deg[v]`` every
    superstep, PageRank.cpp:74)."""
    out = g.adj() if not g.directed else g.edges
    deg = (
        out.groupBy(F.col("src").alias("v"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    return (
        out.join(deg, out.src == deg.v)
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
    )


# per-Python-worker memoization of decoded dst-blocks (engine="csrblocks").
# Spark reuses worker processes across tasks and supersteps, so a block
# decoded once is usually free on later supersteps; bounded LRU because
# task->worker assignment is not sticky. Keys carry a per-store TOKEN
# (the _SUCCESS commit mtime): rewriting the same block_path with a
# different graph changes the token, so a long-lived worker can never
# serve stale decoded blocks.
_BLOCK_CACHE: "dict[tuple[str, int, int], tuple]" = {}
_BLOCK_CACHE_CAP = 4


def _block_store_token(path: str) -> int:
    """Identity of the committed block store: _SUCCESS mtime_ns (the
    marker is rewritten on every successful job commit)."""
    import os

    try:
        return os.stat(os.path.join(path, "_SUCCESS")).st_mtime_ns
    except OSError:
        return 0


def _load_dst_block(path: str, part: int, token: int):
    key = (path, part, token)
    blk = _BLOCK_CACHE.pop(key, None)
    if blk is None:
        import numpy as np
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{path}/part={part}", columns=["src", "dst", "frac"]
        )
        src = tbl["src"].to_numpy()
        dst = tbl["dst"].to_numpy()
        frac = np.ascontiguousarray(tbl["frac"].to_numpy())
        # block rows are written sorted by src (sortWithinPartitions at
        # build time), so scode is non-decreasing: the per-superstep
        # s[scode] gather streams sequentially through the score array
        # instead of random-accessing DRAM, and the dcode bincount
        # scatter targets a dvoc-sized (block-local, cache-resident)
        # accumulator — the layout that keeps the superstep bandwidth-
        # light at high core counts
        svoc, scode = np.unique(src, return_inverse=True)
        dvoc, dcode = np.unique(dst, return_inverse=True)
        blk = (svoc, scode.astype("int64"), dvoc, dcode.astype("int64"), frac)
    _BLOCK_CACHE[key] = blk  # re-insert = LRU touch
    while len(_BLOCK_CACHE) > _BLOCK_CACHE_CAP:
        _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
    return blk


def _build_dst_blocks(
    flow: DataFrame,
    num_blocks: int,
    block_path: str | None,
    reuse_existing: bool = False,
):
    """engine="csrblocks" setup: write the mass-flow table ONCE as
    parquet partitioned by ``part = pmod(dst, P)`` (dst-major blocking),
    rows sorted by src within each block (sequential score gather),
    plus the (src, part) routing relation partitioned on src.

    The block store is the loop-invariant CSR structure of the north
    star: at cluster scale ``block_path`` is a shared location (object
    store / Iceberg table dir); locally a temp dir. Each dst lives in
    exactly ONE block, so per-block partial sums are FINAL — the
    per-superstep O(m) groupBy(dst) hash aggregation disappears
    entirely, replaced by a numpy bincount over a cache-resident block.

    ``reuse_existing=True`` (with an explicit ``block_path``) skips the
    write when a committed store exists — the route table is then
    re-derived from the stored blocks. Safe because worker caches key on
    the store's _SUCCESS mtime token, never on the path alone.
    """
    import os
    import tempfile
    import uuid

    from networkit_spark.plans.superstep import materialize_partitioned

    path = block_path or os.path.join(
        tempfile.gettempdir(), f"nk_flowblocks_{uuid.uuid4().hex[:12]}"
    )
    exists = os.path.exists(os.path.join(path, "_SUCCESS"))
    if not (reuse_existing and exists):
        flow_d = flow.withColumn(
            "part", F.pmod(F.col("dst"), F.lit(num_blocks)).cast("int")
        )
        (
            flow_d.repartition(num_blocks, "part")
            .sortWithinPartitions("src")
            .write.mode("overwrite")
            .partitionBy("part")
            .parquet(path)
        )
    stored = flow.sparkSession.read.parquet(path)
    route = materialize_partitioned(
        stored.select("src", "part").distinct(), "src"
    )
    token = _block_store_token(path)
    return path, route, token


def _csrblock_contribs(
    route: DataFrame, block_path: str, token: int, scores: DataFrame
) -> DataFrame:
    """One dst-blocked gather-scatter superstep: route scores to the
    blocks that consume them (one O(R) shuffle, R = |distinct (src,
    block)| <= m), then per-block numpy SpMV. Output (dst, mass) rows
    are final — no cross-block combine."""

    routed = (
        scores.hint("shuffle_hash")
        .join(route, scores.id == route.src)
        .select("part", "src", "score")
    )

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        part = int(key[0])
        svoc, scode, dvoc, dcode, frac = _load_dst_block(block_path, part, token)
        s = np.zeros(len(svoc), dtype="float64")
        idx = np.searchsorted(svoc, pdf["src"].to_numpy())
        s[idx] = pdf["score"].to_numpy()
        mass = np.bincount(dcode, weights=s[scode] * frac, minlength=len(dvoc))
        return pd.DataFrame({"dst": dvoc.astype("int64"), "mass": mass})

    return routed.groupBy("part").applyInPandas(gather, schema="dst long, mass double")


def _csr_contribs(flow_parts: DataFrame, scores: DataFrame, num_blocks: int) -> DataFrame:
    """Per-partition CSR gather-scatter (grouped pandas UDFs).

    ``flow_parts`` carries a precomputed ``part = pmod(src, P)`` column.
    Scores are routed to the single block owning their vertex as source;
    inside each block numpy computes the partial dst-sums (the map-side
    combine), so the shuffle after this stage carries only
    (dst, partial_mass) — one row per distinct dst per block.
    """
    import numpy as np  # noqa: F401  (executor-side)

    scores_parts = scores.withColumn("part", F.pmod(F.col("id"), F.lit(num_blocks)))

    def gather_scatter(key, edges_pdf: pd.DataFrame, scores_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if edges_pdf.empty or scores_pdf.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "mass": pd.Series(dtype="float64")})
        # CSR-ish block: factorize dst, map src->score via pandas merge
        score_map = pd.Series(
            scores_pdf["score"].values, index=scores_pdf["id"].values
        )
        src_scores = score_map.reindex(edges_pdf["src"].values).to_numpy()
        contrib = src_scores * edges_pdf["frac"].to_numpy()
        codes, uniq = pd.factorize(edges_pdf["dst"].values)
        partial = np.bincount(codes, weights=contrib, minlength=len(uniq))
        return pd.DataFrame({"dst": uniq.astype("int64"), "mass": partial})

    cg = flow_parts.groupby("part").cogroup(scores_parts.groupby("part"))
    partials = cg.applyInPandas(gather_scatter, schema="dst long, mass double")
    return partials.groupBy("dst").agg(F.sum("mass").alias("mass"))


def pagerank(
    g: Graph,
    damp: float = 0.85,
    tol: float = 1e-8,
    normalized: bool = False,
    distribute_sinks: str = NO_SINK_HANDLING,
    max_iterations: int | None = None,
    norm: str = "l2",
    engine: str = "dataframe",
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    num_blocks: int = 32,
    salt: int = 1,
    unroll: int = 1,
    block_path: str | None = None,
    reuse_blocks: bool = False,
    dst_parts: int | None = None,
    init_scores: DataFrame | None = None,
    narrow: bool = False,
) -> PageRankResult:
    """Run PageRank to convergence. Defaults match the reference
    (PageRank.hpp:61-62: damp=0.85, tol=1e-8, L2, no sink handling,
    unbounded iterations).

    ``dst_parts`` (engine="dataframe"): insert an explicit
    ``repartition(dst_parts, dst)`` between the gather join and the
    ``groupBy(dst)``. Default Spark plans partial-agg BEFORE the
    exchange, so each map task aggregates over nearly ALL n distinct
    dsts — an O(n)-entry (~100 MB) hash map per concurrent task, which
    thrashes the shared LLC/DRAM at high core counts while reducing the
    shuffle by almost nothing (web-graph fan-in makes the combine
    ineffective). The explicit repartition satisfies the aggregation's
    required distribution, so BOTH agg phases run post-shuffle on
    dst-sliced rows: hash maps shrink to n/dst_parts entries
    (cache-resident) at the cost of shuffling raw (dst, contrib) rows —
    the same volume the ineffective combine was already shipping.

    ``narrow`` (engine="dataframe"): store the loop-invariant flow table
    with 32-bit ids and a float32 fraction (12 B/row instead of 24) and
    run the per-superstep join/aggregation on int keys. The superstep is
    memory-bandwidth-bound at high core counts (BASELINE.md analysis) —
    halving the bytes streamed per row raises exactly the ceiling the
    big level hits first. At 100 TB this is the "adaptive physical
    types" a columnar engine applies per-partition (ids dictionary-
    compact far below 2^31 after id assignment); requires max id < 2^31
    (checked). Precision: frac carries ~1e-8 relative error into each
    superstep — scores typically differ from the wide plan by < 1e-9;
    convergence/tie semantics are unchanged. Default off (the oracle
    gates run bit-exact wide plans)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)

    nodes = g.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return PageRankResult(
            scores=nodes.withColumn("score", F.lit(0.0)),
            info=SuperstepResult(iterations=0),
        )
    teleport = (1.0 - damp) / n
    factor = damp / n

    from networkit_spark.plans.superstep import materialize_partitioned

    flow = _flow_edges(g)
    route = None
    blocks_dir = None
    blocks_token = 0
    if engine == "csrblocks":
        blocks_dir, route, blocks_token = _build_dst_blocks(
            flow, num_blocks, block_path, reuse_existing=reuse_blocks
        )
        flow = route  # unpersisted at the end
    elif engine == "csr":
        flow = flow.withColumn("part", F.pmod(F.col("src"), F.lit(num_blocks)))
        flow = materialize_partitioned(flow, "part")
    elif salt > 1:
        flow = flow.withColumn("salt", F.pmod(F.col("dst"), F.lit(salt)))
        flow = materialize_partitioned(flow, "src", "salt")
    else:
        if narrow:
            max_id = nodes.agg(F.max("id")).collect()[0][0]
            if max_id is not None and max_id >= (1 << 31):
                raise ValueError("narrow mode requires node ids < 2^31")
            flow = flow.select(
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
                F.col("frac").cast("float").alias("frac"),
            )
        flow = materialize_partitioned(flow, "src")
    if narrow and (engine != "dataframe" or salt > 1):
        raise ValueError("narrow mode requires engine='dataframe' and salt=1")

    handle_sinks = g.directed and (
        distribute_sinks == DISTRIBUTE_SINKS or normalized
    )
    sinks = None
    n_sinks = 0
    if handle_sinks:
        # out-degree-0 nodes (PageRank.cpp:34-41); small at web scale ->
        # broadcast for the per-superstep semi-join
        out_nodes = (g.edges if g.directed else g.adj()).select(
            F.col("src").alias("id")
        ).distinct()
        sinks = nodes.join(out_nodes, "id", "left_anti").localCheckpoint(eager=True)
        n_sinks = sinks.count()

    # init (PageRank.cpp:28); init_scores = warm start from a previous
    # run's result — the Dyn* role (apply a GraphEvent batch, re-run from
    # the old fixpoint; converges in a few supersteps when the delta is
    # small, matching the reference's batch-incremental Dyn algorithms'
    # purpose). Nodes missing from init_scores (e.g. newly added) start
    # at 1/n.
    if init_scores is not None:
        scores = (
            nodes.join(init_scores.select("id", "score"), "id", "left")
            .select("id", F.coalesce("score", F.lit(1.0 / n)).alias("score"))
        )
    else:
        scores = nodes.select("id", F.lit(1.0 / n).alias("score"))
    if narrow:
        # int-keyed end-to-end: every superstep joins/aggregates on
        # 4-byte keys; widened back to long after the loop
        scores = scores.select(F.col("id").cast("int").alias("id"), "score")
    start_iter = 0
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            start_iter, scores = latest
            scores = scores.select("id", "score")  # drop carried prev col
    scores = ckpt.cut(scores, start_iter) if start_iter == 0 else scores

    metrics: list[dict] = []
    iterations = start_iter
    converged = False
    max_it = max_iterations if max_iterations is not None else 2**31

    # fast path: with a non-positive tolerance AND a fixed iteration count
    # the convergence norm can never stop the loop early, so the
    # prev-score carry (a per-superstep O(n) shuffle join) and the delta
    # aggregation (a per-superstep driver action) are dead work
    track_delta = not (tol <= 0.0 and max_iterations is not None)
    # undirected graphs with derived vertices: every node is incident to
    # an edge, hence appears as a dst in the symmetric adjacency — the
    # left-join against `nodes` (one more O(n) shuffle per superstep)
    # only exists to give isolated vertices their teleport mass
    need_nodes_join = g.directed or g.vertices is not None

    if salt > 1:
        salt_ids = spark.range(salt).select(F.col("id").cast("int").alias("salt"))

    # superstep unrolling (fast path only): fuse `unroll` supersteps into
    # ONE job — the intermediate O(n) states live purely in lineage, so
    # per-job fixed costs (AQE stage barriers, task launch, checkpoint
    # job) are paid once per `unroll` supersteps instead of once per
    # superstep. Results are bit-identical to the step-at-a-time loop
    # (same synchronous Jacobi chain, intermediate states simply not
    # observable); only available when no per-step driver decision is
    # needed (fixed iteration count, no sink semi-join, no delta).
    can_unroll = (
        unroll > 1
        and engine == "dataframe"
        and salt == 1
        and not track_delta
        and not need_nodes_join
        and not (handle_sinks and n_sinks > 0)
    )

    while not converged:
        t0 = time.time()
        if can_unroll:
            steps = max(1, min(unroll, max_it - iterations))
            cur = scores
            for _ in range(steps):
                j = cur.hint("shuffle_hash").join(flow, cur.id == flow.src)
                if dst_parts:
                    j = j.select("dst", "score", "frac").repartition(
                        dst_parts, "dst"
                    )
                c = j.groupBy("dst").agg(
                    F.sum(F.col("score") * F.col("frac")).alias("mass")
                )
                cur = c.select(
                    F.col("dst").alias("id"),
                    (
                        F.lit(damp) * F.col("mass") + F.lit(teleport)
                    ).alias("score"),
                )
            iterations += steps
            new_scores = ckpt.cut(cur, iterations)
            converged = iterations >= max_it
            metrics.append(
                ckpt.log(
                    iterations,
                    state=new_scores,
                    delta=float("nan"),
                    norm=norm,
                    sink_contrib=0.0,
                    wall_sec=time.time() - t0,
                    engine=engine,
                    unrolled_steps=steps,
                )
            )
            scores = new_scores
            continue
        if engine == "csrblocks":
            contribs = _csrblock_contribs(route, blocks_dir, blocks_token, scores)
        elif engine == "csr":
            contribs = _csr_contribs(flow, scores, num_blocks)
        else:
            # shuffle_hash hint: at web scale the O(n) score table can
            # never be broadcast, and a broadcast build is also serial
            # driver work repeated every superstep; SHJ shuffles only the
            # score side (flow keeps its cached src-partitioning) and
            # builds the per-partition maps in parallel
            s = scores.hint("shuffle_hash")
            if salt > 1:
                s = s.crossJoin(F.broadcast(salt_ids)).hint("shuffle_hash")
                joined = s.join(flow, (s.id == flow.src) & (s.salt == flow.salt))
            else:
                joined = s.join(flow, s.id == flow.src)
            if dst_parts:
                joined = joined.select("dst", "score", "frac").repartition(
                    dst_parts, "dst"
                )
            contribs = (
                joined.groupBy("dst")
                .agg(F.sum(F.col("score") * F.col("frac")).alias("mass"))
            )

        sink_contrib = 0.0
        if handle_sinks and n_sinks > 0:
            row = (
                scores.join(sinks, "id", "left_semi")
                .agg(F.sum("score").alias("s"))
                .collect()[0]
            )
            sink_contrib = factor * float(row["s"] or 0.0)

        new_score = (
            F.lit(damp) * F.coalesce(F.col("mass"), F.lit(0.0))
            + F.lit(teleport)
            + F.lit(sink_contrib)
        ).alias("score")
        if need_nodes_join:
            base = nodes.join(contribs, nodes.id == contribs.dst, "left")
        else:
            base = contribs.select(F.col("dst").alias("id"), "mass")
        if track_delta:
            # carry the previous score alongside so the convergence norm
            # is a cheap shuffle-free agg over the checkpointed state
            # (one heavy action per superstep, not two)
            new_state = base.join(
                scores.select("id", F.col("score").alias("prev")), "id", "left"
            ).select("id", new_score, "prev")
        else:
            new_state = base.select("id", new_score)
        iterations += 1
        new_state = ckpt.cut(new_state, iterations)
        new_scores = new_state.select("id", "score")

        # convergence on old vs new, after sink add, before swap
        # (PageRank.cpp:53-63,93-96)
        if track_delta:
            d = F.col("prev") - F.col("score")
            if norm == "l2":
                delta = float(
                    new_state.agg(F.sqrt(F.sum(d * d))).collect()[0][0]
                )
            else:
                delta = float(new_state.agg(F.sum(F.abs(d))).collect()[0][0])
        else:
            delta = float("nan")
        converged = iterations >= max_it or delta <= tol
        metrics.append(
            ckpt.log(
                iterations,
                state=new_scores,
                delta=delta,
                norm=norm,
                sink_contrib=sink_contrib,
                wall_sec=time.time() - t0,
                engine=engine,
            )
        )
        scores = new_scores

    if narrow:
        scores = scores.select(F.col("id").cast("long").alias("id"), "score")

    # post-processing (PageRank.cpp:100-123)
    if normalized:
        if g.directed:
            s = 0.0
            if n_sinks > 0:
                row = (
                    scores.join(sinks, "id", "left_semi")
                    .agg(F.sum("score").alias("s"))
                    .collect()[0]
                )
                s = float(row["s"] or 0.0)
            norm_factor = (1.0 / n) * ((1.0 - damp) + damp * s)
        else:
            norm_factor = teleport
        scores = scores.select("id", (F.col("score") / F.lit(norm_factor)).alias("score"))
    elif g.directed and distribute_sinks == NO_SINK_HANDLING:
        total = float(scores.agg(F.sum("score")).collect()[0][0])
        scores = scores.select("id", (F.col("score") / F.lit(total)).alias("score"))

    scores = scores.localCheckpoint(eager=True)  # detach from flow before unpersist
    flow.unpersist()
    if blocks_dir is not None and block_path is None:
        # engine-owned temp block store; user-supplied paths are kept
        import shutil

        shutil.rmtree(blocks_dir, ignore_errors=True)
    return PageRankResult(
        scores=scores,
        info=SuperstepResult(iterations=iterations, metrics=metrics, converged=True),
    )
