"""DynTopHarmonicCloseness — top-k harmonic closeness maintained under
GraphEvent batches.

Reference: /root/reference/networkit/cpp/centrality/
DynTopHarmonicCloseness.cpp (:418-855 — addEdge/removeEdge compute the
AFFECTED nodes via BFS from the event endpoints
(/root/reference/networkit/cpp/distance/AffectedNodes.cpp:34-160),
invalidate their scores to upper bounds, and lazily re-resolve by
popping the bound queue, recomputing an exact BFS only while the bound
beats the current k-th score — the static top-k machinery replayed over
a shrunken candidate set).

Spark-first form (documented deviations): affected detection runs the
endpoint BFS as ONE multi-source tagged BFS per graph version (all
touched endpoints advance in a single synchronized frontier — the
reference runs one BFS per endpoint per event); a node is affected iff
its distance to (or reachability of) some touched endpoint differs
between the pre- and post-batch graphs.  Soundness: a changed d(w, y)
forces a changed d(w, e) for some endpoint e of a touched edge — any
new/vanished shortest path crosses a touched edge, and replacing its
endpoint prefix by an unchanged-length old path would induct down to an
all-old path.  Unaffected resolved nodes keep their exact scores;
bounds are refreshed with the SAME level-wise neighborhood-growth bound
the static operator uses (one O(diameter) join+agg pass on the new
graph, `_closeness_upper_bounds(harmonic=True)`), instead of the
reference's per-event level-histogram improvement deltas — both are
valid upper bounds; this one is already distributed and tighter after
large batches.  The re-resolve loop is the static best-first batch wave
(state O(batch * n), never all-pairs).

Scale shape: an event batch costs 2 multi-source BFS (endpoints), one
bound pass, and the waves actually needed to separate the new top-k —
each a PageRank-superstep-shaped join+agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.closeness import (
    _closeness_upper_bounds,
    _tagged_bfs,
)
from networkit_spark.plans.superstep import Checkpointer
from networkit_spark.streaming.dynamics import apply_events


class DynTopHarmonicCloseness:
    """run() → static top-k; update_batch(events) → incremental repair.

    ``scores()`` returns the CURRENT top-k (id, score) like the
    reference's topkScoresList; ``swept_last`` exposes how many exact
    BFS sweeps the last repair needed (the pruning evidence).
    """

    def __init__(self, g: Graph, k: int = 10, batch: int = 64) -> None:
        if g.directed:
            raise ValueError(
                "DynTopHarmonicCloseness supports undirected graphs "
                "(the static NBcut bound needs exact reach)"
            )
        self.g = g
        self.k = int(k)
        self.batch = int(batch)
        self._exact: dict[int, float] = {}
        self._topk: list[tuple[float, int]] = []
        self.swept_last = 0
        self._ckpt = Checkpointer(g.edges.sparkSession)

    # -- internals ---------------------------------------------------

    def _exact_scores(self, ids: list[int]) -> list[tuple[float, int]]:
        spark = self.g.edges.sparkSession
        src_df = spark.createDataFrame([(i,) for i in ids], "id long")
        settled, _ = _tagged_bfs(self.g, src_df, None, self._ckpt)
        rows = (
            settled.filter(F.col("dist") > 0)
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum(1.0 / F.col("dist")).alias("score"))
            .collect()
        )
        got = {int(r["id"]): float(r["score"]) for r in rows}
        # quantize to 1e-9 so k-th-boundary ties rank by id, not by the
        # FP noise of the summation order (same rule as
        # top_harmonic_closeness; true scores are multiples of
        # 1/lcm(1..diameter), far coarser than the quantum)
        return [(round(got.get(i, 0.0), 9), i) for i in ids]

    def _resolve(self, candidates: DataFrame) -> None:
        """Best-first wave loop over (id, ub) candidates, seeded with the
        retained exact scores (TopHarmonicCloseness.cpp:113-167 replay)."""
        spark = self.g.edges.sparkSession
        pool = sorted(
            ((s, i) for i, s in self._exact.items()),
            key=lambda t: (-t[0], t[1]),
        )
        topk = pool[: self.k]
        kth = topk[self.k - 1][0] if len(topk) >= self.k else float("-inf")
        remaining = candidates.localCheckpoint(eager=True)
        swept = 0
        while True:
            wave_rows = (
                remaining.orderBy(F.desc("ub"), F.asc("id"))
                .limit(self.batch)
                .collect()
            )
            if not wave_rows:
                break
            if max(r["ub"] for r in wave_rows) < kth:
                break
            ids = [int(r["id"]) for r in wave_rows]
            for s, i in self._exact_scores(ids):
                self._exact[i] = s
                topk.append((s, i))
            swept += len(ids)
            topk.sort(key=lambda t: (-t[0], t[1]))
            del topk[self.k:]
            kth = (
                topk[self.k - 1][0]
                if len(topk) >= self.k
                else float("-inf")
            )
            remaining = remaining.join(
                spark.createDataFrame([(i,) for i in ids], "id long")
                .hint("broadcast"),
                "id",
                "left_anti",
            ).localCheckpoint(eager=True)
        self._topk = topk
        self.swept_last = swept

    # -- public surface ----------------------------------------------

    def run(self) -> "DynTopHarmonicCloseness":
        n = self.g.number_of_nodes()
        if n <= 1:
            self._topk = [
                (0.0, int(r["id"])) for r in self.g.nodes().collect()
            ]
            return self
        self._exact = {}
        cand = _closeness_upper_bounds(self.g, n, self._ckpt, harmonic=True)
        self._resolve(cand)
        return self

    def update_batch(self, events: DataFrame) -> "DynTopHarmonicCloseness":
        spark = self.g.edges.sparkSession
        g_old = self.g
        g_new = apply_events(g_old, events)
        g_new = Graph(
            g_new.edges.localCheckpoint(eager=True),
            g_new.vertices,
            g_new.directed,
            g_new.weighted,
        )
        endpoints = sorted(
            {
                int(x)
                for r in events.filter(
                    F.col("type").isin(
                        "EDGE_ADDITION", "EDGE_REMOVAL",
                        "NODE_REMOVAL", "NODE_ADDITION",
                    )
                ).select("u", "v").collect()
                for x in (r["u"], r["v"])
                if x is not None
            }
        )
        if not endpoints:
            return self
        src_df = spark.createDataFrame(
            [(i,) for i in endpoints], "id long"
        )
        old_d, _ = _tagged_bfs(g_old, src_df, None, self._ckpt)
        new_d, _ = _tagged_bfs(g_new, src_df, None, self._ckpt)
        affected = (
            old_d.withColumnRenamed("dist", "d_old")
            .join(
                new_d.withColumnRenamed("dist", "d_new"),
                ["s", "v"],
                "full_outer",
            )
            .filter(
                F.col("d_old").isNull()
                | F.col("d_new").isNull()
                | (F.col("d_old") != F.col("d_new"))
            )
            .select(F.col("v").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        affected_ids = {int(r["id"]) for r in affected.collect()}
        # an explicitly removed node keeps a matching self-distance row
        # in both BFS passes — invalidate it directly (it left the
        # universe; the new-bound relation never re-admits it)
        affected_ids |= {
            int(r["u"])
            for r in events.filter(
                F.col("type") == "NODE_REMOVAL"
            ).select("u").collect()
        }
        self.g = g_new
        # drop invalidated exacts; keep the rest (their distances, hence
        # scores, are untouched by the batch)
        self._exact = {
            i: s for i, s in self._exact.items() if i not in affected_ids
        }
        n = g_new.number_of_nodes()
        cand = (
            _closeness_upper_bounds(g_new, n, self._ckpt, harmonic=True)
            .join(
                spark.createDataFrame(
                    [(i,) for i in self._exact], "id long"
                ).hint("broadcast"),
                "id",
                "left_anti",
            )
        )
        self._resolve(cand)
        return self

    def scores(self) -> DataFrame:
        spark = self.g.edges.sparkSession
        return spark.createDataFrame(
            [(i, s) for s, i in self._topk], "id long, score double"
        )
