"""DynApproxBetweenness — incremental epsilon-delta betweenness.

Reference: /root/reference/networkit/cpp/centrality/
DynApproxBetweenness.cpp (Bergamini-Meyerhenke): keep the
Riondato-Kornaropoulos sample of r node pairs with one sampled shortest
path each; on a graph event, update the per-sample SSSP state and
RE-SAMPLE only the affected paths, leaving the rest untouched.

Deterministic cross-engine variant: all draws are md5-derived exactly
like approx_betweenness (same sample pairs, same per-step backward
uniforms), so re-sampling an affected path on the new graph produces
precisely the path a FULL static re-run with the same seed would draw —
the incremental estimate equals approx_betweenness(new graph, same
seed, same vd) bit-for-bit.  ``vd`` (and therefore r and the sample
pair set) is fixed at construction like the reference, which sizes its
sample once in the constructor.

Affected-sample detection is exact, not heuristic: inserting edge
(u, v) changes distances/path-counts from source s iff the new edge
can lie on a non-longer path, i.e. iff d(s,u) and d(s,v) differ
(undirected; both-unreachable counts as equal) — for any x,
d(s,x) <= d(s,u) + d(v,x) + |d(s,v)-d(s,u)| collapses to strict
inequality when the two are equal.  Directed: affected iff d(s,u) is
finite and d(s,v) >= d(s,u) + 1.  The per-source distance relation the
check needs is the sample's own forward-BFS state (O(r * n) rows — the
reference stores the same per-sample SSSP trees).
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


def _sample_paths(
    g: Graph, samples: DataFrame, seed: int, vd: int, ckpt: Checkpointer,
    max_hops: int | None = None,
    uniform_preds: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """((i, z) interior rows of each sample's sampled shortest path,
    (s, v, dist) settled forward-BFS distances of the distinct sources)
    — the approx_betweenness plan (operators/betweenness.py), factored
    so incremental recomputation replays identical draws.

    ``uniform_preds=True`` draws each backward step uniformly over the
    predecessor set instead of sigma-weighted — the
    ApproxGroupBetweenness walk (ApproxGroupBetweenness.cpp:70-77 picks
    Random.integer over the predecessor list)."""
    spark = g.edges.sparkSession
    adj = materialize_partitioned(
        (g.adj() if not g.directed else g.edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst"),
        "src",
    )
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
        # union of cut per-level increments (no full re-materialize);
        # compact every 8 levels
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
    max_id_row = g.nodes().agg(F.max("id").alias("m")).collect()[0]
    bw_width = pred_bucket_width(int(max_id_row["m"] or 0))
    contribs: DataFrame | None = None
    step = 0
    max_steps = (vd + 2) * 2
    while step < max_steps:
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
        if uniform_preds:
            # uniform over predecessors: unit weights, total = pred count
            cnt = preds.groupBy("i").agg(
                F.count("*").cast("double").alias("st_u")
            )
            preds = (
                preds.drop("st_")
                .join(cnt, "i")
                .withColumn("sz", F.lit(1.0))
                .withColumnRenamed("st_u", "st_")
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
        chosen = bucketed_pred_draw(preds, u01, bw_width)
        chosen = ckpt.cut(chosen, 200 + step)
        inner = chosen.filter(F.col("z") != F.col("s")).select("i", F.col("z"))
        contribs = (
            inner
            if contribs is None
            else contribs.unionByName(inner).localCheckpoint(eager=True)
        )
        walk = chosen.filter(F.col("z") != F.col("s")).select(
            "i", "s", F.col("z").alias("t"), F.col("zd").alias("td")
        )
    adj.unpersist()
    if contribs is None:
        contribs = samples.sparkSession.createDataFrame([], "i long, z long")
    return contribs, sig.select("s", "v", "dist")


class DynApproxBetweenness:
    """run() draws the r-sample estimate; update(u, v) applies an edge
    ADDITION, re-sampling only the affected paths.  scores() equals
    approx_betweenness(updated graph, same epsilon/delta/seed/vd)."""

    def __init__(
        self,
        g: Graph,
        epsilon: float = 0.1,
        delta: float = 0.1,
        universal_constant: float = 1.0,
        seed: int = 42,
        vd: int | None = None,
        max_hops: int | None = None,
        checkpointer: Checkpointer | None = None,
    ):
        if g.weighted:
            raise ValueError("hop/BFS mode only (the reference's unweighted path)")
        self.g = g
        self.spark = g.edges.sparkSession
        self.ckpt = checkpointer or Checkpointer(self.spark)
        self.seed = seed
        self.max_hops = max_hops
        self.nodes = g.nodes().localCheckpoint(eager=True)
        self.n = self.nodes.count()
        if vd is None:
            from networkit_spark.operators.diameter import diameter as _diam

            _, hi = _diam(g, algo="estimated_range", check=False)
            vd = int(hi)
        self.vd = vd
        self.r = (
            0
            if vd <= 2 or self.n < 3
            else int(
                math.ceil(
                    (universal_constant / (epsilon * epsilon))
                    * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
                )
            )
        )
        self.samples: DataFrame | None = None
        self.contribs: DataFrame | None = None
        self.sig: DataFrame | None = None
        self.metrics: list[dict] = []

    def run(self) -> SuperstepResult:
        t0 = time.time()
        if self.r == 0:
            self.samples = self.spark.createDataFrame([], "i long, s long, t long")
            self.contribs = self.spark.createDataFrame([], "i long, z long")
            self.sig = self.spark.createDataFrame([], "s long, v long, dist long")
            return SuperstepResult(iterations=0)
        from networkit_spark.plans.ids import dense_ids

        idx = dense_ids(self.nodes, ["id"], "idx").localCheckpoint(eager=True)

        def _h(tag: str, col):
            return F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{self.seed}|{tag}|"), col.cast("string"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")

        n = self.n
        self.samples = (
            self.spark.range(self.r)
            .select(F.col("id").alias("i"))
            .select(
                "i",
                (_h("u", F.col("i")) % n).alias("uidx"),
                (
                    (_h("u", F.col("i")) % n + 1 + _h("v", F.col("i")) % (n - 1))
                    % n
                ).alias("vidx"),
            )
            .join(
                idx.select(F.col("idx").alias("uidx"), F.col("id").alias("s")),
                "uidx",
            )
            .join(
                idx.select(F.col("idx").alias("vidx"), F.col("id").alias("t")),
                "vidx",
            )
            .select("i", "s", "t")
            .localCheckpoint(eager=True)
        )
        contribs, sig = _sample_paths(
            self.g, self.samples, self.seed, self.vd, self.ckpt,
            self.max_hops,
        )
        self.contribs = contribs.localCheckpoint(eager=True)
        self.sig = sig.localCheckpoint(eager=True)
        self.metrics.append({"phase": "run", "wall_sec": time.time() - t0})
        return SuperstepResult(iterations=1, metrics=self.metrics)

    def scores(self) -> DataFrame:
        if self.contribs is None:
            raise RuntimeError("call run() first")
        if self.r == 0:
            return self.nodes.select("id", F.lit(0.0).alias("score"))
        bc = self.contribs.groupBy(F.col("z").alias("id")).agg(
            (F.count("*") / F.lit(float(self.r))).alias("score")
        )
        return self.nodes.join(bc, "id", "left").select(
            "id", F.coalesce("score", F.lit(0.0)).alias("score")
        )

    def update(self, u: int, v: int) -> None:
        if self.contribs is None:
            raise RuntimeError("call run() first")
        t0 = time.time()
        self.g = Graph(
            self.g.edges.unionByName(
                self.spark.createDataFrame(
                    [(int(u), int(v), 1.0)], "src long, dst long, weight double"
                ).select(*self.g.edges.columns)
            ).localCheckpoint(eager=True),
            vertices=self.g.vertices,
            directed=self.g.directed,
            weighted=self.g.weighted,
        )
        if self.r == 0:
            return
        du = self.sig.filter(F.col("v") == u).select(
            "s", F.col("dist").alias("du")
        )
        dv = self.sig.filter(F.col("v") == v).select(
            "s", F.col("dist").alias("dv")
        )
        both = (
            self.sig.select("s").distinct().join(du, "s", "left")
            .join(dv, "s", "left")
        )
        if self.g.directed:
            aff_cond = F.col("du").isNotNull() & (
                F.col("dv").isNull() | (F.col("dv") >= F.col("du") + 1)
            )
        else:
            aff_cond = ~(
                (F.col("du").isNull() & F.col("dv").isNull())
                | (
                    F.col("du").isNotNull()
                    & F.col("dv").isNotNull()
                    & (F.col("du") == F.col("dv"))
                )
            )
        aff = both.filter(aff_cond).select("s").localCheckpoint(eager=True)
        aff_samples = self.samples.join(aff, "s").localCheckpoint(eager=True)
        n_aff = aff_samples.count()
        if n_aff == 0:
            self.metrics.append(
                {"phase": "update", "affected": 0, "wall_sec": time.time() - t0}
            )
            return
        new_contribs, new_sig = _sample_paths(
            self.g, aff_samples, self.seed, self.vd, self.ckpt,
            self.max_hops,
        )
        keep = self.contribs.join(
            aff_samples.select("i").hint("broadcast"), "i", "left_anti"
        )
        self.contribs = keep.unionByName(new_contribs).localCheckpoint(
            eager=True
        )
        aff_srcs = aff_samples.select("s").distinct()
        self.sig = (
            self.sig.join(aff_srcs.hint("broadcast"), "s", "left_anti")
            .unionByName(new_sig.join(aff_srcs.hint("broadcast"), "s"))
            .localCheckpoint(eager=True)
        )
        self.metrics.append(
            {"phase": "update", "affected": n_aff, "wall_sec": time.time() - t0}
        )

    def update_batch(self, events: list[tuple[int, int]]) -> None:
        for u, v in events:
            self.update(u, v)
