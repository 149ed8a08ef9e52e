"""DynKatzCentrality — dynamic top-k Katz via per-level path counts.

Reference: /root/reference/networkit/cpp/centrality/DynKatzCentrality.cpp
(:21-67 run(): alpha = 1/(maxdeg+1), nPaths[0] = 1, per level r
nPaths[r][u] = sum over in-edges (v,u) of nPaths[r-1][v],
baseData += alpha^r * nPaths[r], undirected score = base +
alpha^(r+1) * nPaths[r], bound = base + nPaths[r] * alpha^(r+1) /
(1 - alpha*maxdeg); :274-353 checkConvergence(): deactivate u when
score_kth > bound[u] - tolerance, converged when <= k active and
consecutive top-k pairs are sufficiently ranked; :69-225 updateBatch():
only the ball around the event endpoints changes — levels are repaired
by delta propagation, never recomputed from scratch).

Spark-first design: path counts are exact DECIMAL(38,0) columns (the
reference uses uint64; decimals keep the cross-engine oracle bit-exact
and overflow loudly under ANSI instead of wrapping). Each level is one
join + hash aggregation over the in-adjacency (the PageRank superstep
shape); update_batch propagates a SPARSE delta frontier
    delta_i(v) = sum_{(u,v) in E_new} delta_{i-1}(u)
               + sum_{(u,v) added} nPaths_old[i-1][u]
               - sum_{(u,v) removed} nPaths_old[i-1][u]
(algebraically identical to the reference's subtract-old/add-new pass,
DynKatzCentrality.cpp:104-150) — per level the shuffle is proportional
to the affected ball, not the graph. Convergence checks are two scalar
aggregations per level (top-k collect + active count); per-level state
is O(n), levels kept for updates are O(n * L) like the reference's
nPaths matrix.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

_DEC = "decimal(38,0)"


def _pow(a: float, r: int) -> float:
    """Left-associative repeated multiply — bit-identical to the
    unrolled ``a * a * ...`` the SQL oracle evaluates (libm pow may
    differ by an ulp between engines)."""
    out = 1.0
    for _ in range(r):
        out *= a
    return out


@dataclass
class DynKatzInfo:
    levels: int = 0
    converged: bool = False
    metrics: list = field(default_factory=list)


class DynKatz:
    """Top-k Katz with incremental edge updates.

    ``levels`` pins the exact number of path-count levels (deterministic
    gate/bench mode, no convergence loop); ``levels=None`` iterates
    until the reference's convergence criterion holds (or
    ``max_levels`` is hit, which raises — the bound decays like
    (maxdeg * alpha)^L, so near-regular graphs with tiny tolerances
    genuinely need the cap).
    """

    def __init__(
        self,
        g: Graph,
        k: int = 10,
        group_only: bool = False,
        tolerance: float = 1e-9,
        levels: int | None = None,
        max_levels: int = 64,
        checkpointer: Checkpointer | None = None,
    ) -> None:
        self.g = g
        self.k = int(k)
        self.group_only = bool(group_only)
        self.tolerance = float(tolerance)
        self.fixed_levels = levels
        self.max_levels = int(max_levels)
        spark = g.edges.sparkSession
        self.ckpt = checkpointer or Checkpointer(spark)
        self.spark = spark
        maxdeg = (
            g.degrees().agg(F.max("degree").alias("m")).collect()[0]["m"]
        )
        if not maxdeg:
            raise RuntimeError(
                "Alpha is chosen based on the max. degree; therefore, "
                "that degree must not be zero"
            )
        self.maxdeg = int(maxdeg)
        self.alpha = 1.0 / (self.maxdeg + 1.0)
        self._levels: list[DataFrame] = []  # (id, np) per level
        self._base: DataFrame | None = None  # (id, base double)
        self.info = DynKatzInfo()

    # -- plumbing ----------------------------------------------------------
    def _in_adj(self) -> DataFrame:
        # (src=u, dst=in-neighbor): gather view for path counts
        return self.g.in_adj().select("src", "dst")

    def _nodes(self) -> DataFrame:
        return self.g.nodes()

    def _do_iteration(self) -> None:
        r = len(self._levels)  # level being filled
        prev = self._levels[-1].select(
            F.col("id").alias("dst"), F.col("np").alias("pnp")
        )
        contrib = (
            self._in_adj()
            .join(prev, "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("pnp").alias("np"))
        )
        np_r = self.ckpt.cut(
            self._nodes()
            .join(contrib, "id", "left")
            .select(
                "id",
                F.coalesce("np", F.lit(0).cast(_DEC)).cast(_DEC).alias("np"),
            ),
            r,
        )
        self._levels.append(np_r)
        apow = _pow(self.alpha, r)
        self._base = self.ckpt.cut(
            self._base.join(
                np_r.select("id", F.col("np").alias("_np")), "id"
            ).select(
                "id",
                (
                    F.col("base")
                    + F.lit(apow) * F.col("_np").cast("double")
                ).alias("base"),
            ),
            1000 + r,
        )

    def _scored(self) -> DataFrame:
        lvl = len(self._levels) - 1
        next_pow = _pow(self.alpha, lvl + 1)
        bound_factor = next_pow / (1.0 - self.alpha * self.maxdeg)
        last = self._levels[-1].select(
            "id", F.col("np").cast("double").alias("npd")
        )
        score = (
            F.col("base") + F.lit(next_pow) * F.col("npd")
            if not self.g.directed
            else F.col("base")
        )
        return self._base.join(last, "id").select(
            "id",
            score.alias("score"),
            (F.col("base") + F.lit(bound_factor) * F.col("npd")).alias(
                "bound"
            ),
        )

    def _converged(self) -> bool:
        scored = self._scored()
        topk = scored.orderBy(F.desc("score"), F.asc("id")).limit(
            self.k
        ).collect()
        if not topk:
            return True
        kth = float(topk[-1]["score"])
        tol = self.tolerance
        top_ids = [int(r["id"]) for r in topk]
        others_active = (
            scored.filter(
                ~F.col("id").isin(top_ids)
                & (F.col("bound") - F.lit(tol) >= F.lit(kth))
            ).count()
        )
        if others_active > 0:
            return False
        if not self.group_only:
            for j in range(1, len(topk)):
                if not (
                    float(topk[j - 1]["score"])
                    > float(topk[j]["bound"]) - tol
                ):
                    return False
        return True

    # -- public API ---------------------------------------------------------
    def run(self) -> "DynKatz":
        n0 = self._nodes()
        self._levels = [
            self.ckpt.cut(
                n0.select("id", F.lit(1).cast(_DEC).alias("np")), 0
            )
        ]
        self._base = self.ckpt.cut(
            n0.select("id", F.lit(0.0).alias("base")), 999
        )
        if self.fixed_levels is not None:
            for _ in range(self.fixed_levels):
                self._do_iteration()
            self.info = DynKatzInfo(
                levels=len(self._levels) - 1, converged=False
            )
            return self
        while True:
            self._do_iteration()
            if self._converged():
                break
            if len(self._levels) - 1 >= self.max_levels:
                raise RuntimeError(
                    f"DynKatz did not converge within {self.max_levels} "
                    "levels (bound decays like (maxdeg*alpha)^L)"
                )
        self.info = DynKatzInfo(levels=len(self._levels) - 1, converged=True)
        return self

    def update_batch(self, events: DataFrame) -> "DynKatz":
        """Apply EDGE_ADDITION / EDGE_REMOVAL events incrementally.

        The event DataFrame uses the dynamics schema (type, u, v, w).
        Other event types raise, as in the reference
        (DynKatzCentrality.cpp:81-83). The node set is fixed at
        construction (the reference's upperNodeIdBound arrays); batches
        must be consistent (additions new, removals existing).
        """
        from networkit_spark.streaming.dynamics import apply_events

        bad = events.filter(
            ~F.col("type").isin("EDGE_ADDITION", "EDGE_REMOVAL")
        ).count()
        if bad:
            raise ValueError(
                "Event type not allowed. Edge insertions or deletions only."
            )
        # keep the PRE-update levels for the old(i-1) event terms; the
        # live list is replaced level by level below
        old_levels = list(self._levels)
        self._levels = list(old_levels)
        g_new = apply_events(self.g, events)
        g_new = Graph(
            g_new.edges.localCheckpoint(eager=True),
            g_new.vertices,
            g_new.directed,
            g_new.weighted,
        )
        self.g = g_new
        in_adj = self._in_adj()
        # directed event (u,v): the arc u->v feeds v's gather; undirected
        # feeds both endpoints' gathers
        ev = events.select(
            "type", F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
        )
        arcs = ev.select("type", F.col("u").alias("s"), F.col("v").alias("t"))
        if not self.g.directed:
            arcs = arcs.unionByName(
                ev.select(
                    "type", F.col("v").alias("s"), F.col("u").alias("t")
                )
            )
        arcs = arcs.localCheckpoint(eager=True)
        L = len(old_levels) - 1
        delta_prev: DataFrame | None = None  # delta at level i-1
        for i in range(1, L + 1):
            old_prev = old_levels[i - 1].select(
                F.col("id").alias("s"), F.col("np").alias("onp")
            )
            ev_term = (
                arcs.join(old_prev, "s")
                .select(
                    F.col("t").alias("id"),
                    F.when(
                        F.col("type") == "EDGE_ADDITION", F.col("onp")
                    )
                    .otherwise(-F.col("onp"))
                    .alias("d"),
                )
            )
            if delta_prev is not None:
                prop = (
                    in_adj.join(
                        delta_prev.select(
                            F.col("id").alias("dst"), F.col("d").alias("pd")
                        ),
                        "dst",
                    )
                    .select(F.col("src").alias("id"), F.col("pd").alias("d"))
                )
                ev_term = ev_term.unionByName(prop)
            delta_i = self.ckpt.cut(
                ev_term.groupBy("id")
                .agg(F.sum("d").cast(_DEC).alias("d"))
                .filter(F.col("d") != 0),
                2000 + i,
            )
            self._levels[i] = self.ckpt.cut(
                old_levels[i]
                .join(delta_i.withColumnRenamed("d", "_d"), "id", "left")
                .select(
                    "id",
                    (
                        F.col("np")
                        + F.coalesce("_d", F.lit(0).cast(_DEC))
                    ).cast(_DEC).alias("np"),
                ),
                3000 + i,
            )
            delta_prev = delta_i
        # Rebuild base from the (exact-decimal) repaired levels with the
        # SAME left-associative float fold as run(): incremental double
        # adjustment (base += alpha^i * delta_i) is ulp-divergent from a
        # static recompute and would break the bit-exact oracle. The
        # level repair above stays sparse; this dense fold is one O(n)
        # pass per level, like the reference's final bounds sweep.
        base = self._nodes().select("id", F.lit(0.0).alias("base"))
        for r in range(1, len(self._levels)):
            base = base.join(
                self._levels[r].select("id", F.col("np").alias("_np")),
                "id",
            ).select(
                "id",
                (
                    F.col("base")
                    + F.lit(_pow(self.alpha, r)) * F.col("_np").cast("double")
                ).alias("base"),
            )
        self._base = self.ckpt.cut(base, 4000)
        if self.fixed_levels is not None:
            self.info = DynKatzInfo(levels=L, converged=False)
            return self
        while not self._converged():
            self._do_iteration()
            if len(self._levels) - 1 >= self.max_levels:
                raise RuntimeError(
                    f"DynKatz did not converge within {self.max_levels} "
                    "levels after update"
                )
        self.info = DynKatzInfo(
            levels=len(self._levels) - 1, converged=True
        )
        return self

    def scores(self) -> DataFrame:
        """(id, score, bound) — score is the reference's scoreData
        (lower bound), bound its boundData (upper bound)."""
        return self._scored()

    def ranking(self, k: int | None = None) -> DataFrame:
        out = self._scored().orderBy(F.desc("score"), F.asc("id"))
        return out.limit(k or self.k)
