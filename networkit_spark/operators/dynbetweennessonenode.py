"""DynBetweennessOneNode — incremental betweenness of ONE focus node.

Reference: /root/reference/networkit/cpp/centrality/DynBetweennessOneNode.cpp
(Bergamini et al.): maintain, for a fixed focus node x, the quantity

    bcx = sum over ordered pairs (s, t), s != x, t != x, sigma(s,t) > 0
          of sigmax(s,t) / sigma(s,t)

where sigma counts shortest s-t paths and sigmax those passing through
x (:76-83, :140-146).  The reference's gtest invariant
(test/DynBetweennessGTest.cpp:249-277) is bcx == Betweenness.score(x)
recomputed statically after every insertion batch — the same invariant
our pytest asserts against the gate-proven exact betweenness operator.

Spark-first re-expression (not a port):

  - state is ONE (s, t, dist, sigma) relation (apsp_sigma — the
    distributed form of the reference's distances/sigma matrices,
    :33-37); sigmax is never materialized: it is DERIVED relationally,
    sigmax(s,t) = sigma(s,x) * sigma(x,t) * [d(s,x)+d(x,t) = d(s,t)]
    (the path-counting product rule), so bcx is two joins + one
    aggregation against the relation.
  - update(u, v) for an edge insertion uses the closed concatenation
    form instead of the reference's queue-driven pair sweep
    (:149-276): every NEW shortest path uses the inserted edge exactly
    once (shortest paths under positive weights are simple), so
        d'(s,t)     = min(d, d(s,u)+1+d(v,t) [, d(s,v)+1+d(u,t)])
        sigma'(s,t) = sum of the branch sigmas attaining d'
    with the second branch only for undirected graphs (the edge can be
    crossed in either direction; the two orientations give disjoint
    path sets).  Both segment legs read the PRE-insertion relation,
    which cannot use the new edge — the decomposition is exact.
  - unlike DynBetweenness, no dependency deltas are maintained — the
    focus node's score is recomputed from the repaired relation (the
    "one node" variant's whole point: cheaper updates).

Scale note: inherently APSP-state, like the reference (4 dense n^2
matrices there); here a hash-partitioned O(n * reach) relation, with
each update two filters + one join product sized
O(|reach(.,u)| * |reach(v,.)|).

Unweighted graphs (the reference's runUnweighted + unit-weight
insertions); weighted mode (Dijkstra state, weight decreases) is not
implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.dynbetweenness import apsp_sigma
from networkit_spark.plans.superstep import Checkpointer


class DynBetweennessOneNode:
    def __init__(
        self, g: Graph, x: int, checkpointer: Checkpointer | None = None
    ):
        if g.weighted:
            raise ValueError(
                "DynBetweennessOneNode: unweighted graphs only "
                "(weighted mode not implemented)"
            )
        self.g = g
        self.x = int(x)
        self.spark = g.edges.sparkSession
        self.ckpt = checkpointer or Checkpointer(self.spark)
        self.P: DataFrame | None = None
        self._step = 0

    # -- static run ---------------------------------------------------------
    def run(self) -> float:
        self.P = apsp_sigma(self.g, self.ckpt)
        return self.bcx()

    # -- derived quantities -------------------------------------------------
    def bcx(self) -> float:
        """sum sigmax/sigma over ordered pairs avoiding x as endpoint."""
        if self.P is None:
            raise RuntimeError("run() first")
        x = self.x
        a = self.P.filter(F.col("t") == x).select(
            "s", F.col("dist").alias("da"), F.col("sigma").alias("sa")
        )
        b = self.P.filter(F.col("s") == x).select(
            F.col("t"), F.col("dist").alias("db"), F.col("sigma").alias("sb")
        )
        row = (
            self.P.filter((F.col("s") != x) & (F.col("t") != x))
            .join(a, "s")
            .join(b, "t")
            .filter(F.col("da") + F.col("db") == F.col("dist"))
            .agg(
                F.sum(F.col("sa") * F.col("sb") / F.col("sigma")).alias("b")
            )
            .collect()[0]
        )
        return float(row["b"] or 0.0)

    def get_distance(self, u: int, v: int) -> float:
        row = self.P.filter(
            (F.col("s") == u) & (F.col("t") == v)
        ).collect()
        return float(row[0]["dist"]) if row else float("inf")

    def get_sigma(self, u: int, v: int) -> float:
        row = self.P.filter(
            (F.col("s") == u) & (F.col("t") == v)
        ).collect()
        return float(row[0]["sigma"]) if row else 0.0

    def get_sigmax(self, u: int, v: int) -> float:
        """Derived sigmax(u, v) (see module docstring)."""
        d = self.get_distance(u, v)
        if d == float("inf"):
            return 0.0
        da, db = self.get_distance(u, self.x), self.get_distance(self.x, v)
        if da + db != d:
            return 0.0
        return self.get_sigma(u, self.x) * self.get_sigma(self.x, v)

    # -- incremental update -------------------------------------------------
    def update(self, u: int, v: int) -> float:
        """Repair the relation for a NEW edge (u, v) (EDGE_ADDITION —
        the event types the reference accepts, :149-156, restricted to
        unit weight) and return the new bcx."""
        if self.P is None:
            raise RuntimeError("run() first")
        P = self.P
        branches = [(u, v)] if self.g.directed else [(u, v), (v, u)]
        merged = P
        for i, (a, b) in enumerate(branches, start=1):
            su = P.filter(F.col("t") == a).select(
                "s",
                F.col("dist").alias(f"dl{i}"),
                F.col("sigma").alias(f"sl{i}"),
            )
            vt = P.filter(F.col("s") == b).select(
                F.col("t"),
                F.col("dist").alias(f"dr{i}"),
                F.col("sigma").alias(f"sr{i}"),
            )
            via = su.crossJoin(vt).select(
                "s",
                "t",
                (F.col(f"dl{i}") + 1 + F.col(f"dr{i}")).alias(f"vd{i}"),
                (F.col(f"sl{i}") * F.col(f"sr{i}")).alias(f"vs{i}"),
            )
            merged = merged.join(via, ["s", "t"], "full")
        vd = [F.col(f"vd{i}") for i in range(1, len(branches) + 1)]
        vs = [F.col(f"vs{i}") for i in range(1, len(branches) + 1)]
        new_d = F.least(F.col("dist"), *vd) if len(vd) > 1 else F.least(
            F.col("dist"), vd[0]
        )
        sigma_terms = F.when(F.col("dist") == new_d, F.col("sigma")).otherwise(
            F.lit(0.0)
        )
        for dcol, scol in zip(vd, vs):
            sigma_terms = sigma_terms + F.when(
                dcol == new_d, scol
            ).otherwise(F.lit(0.0))
        self._step += 1
        self.P = self.ckpt.cut(
            merged.select(
                "s",
                "t",
                new_d.alias("dist"),
                sigma_terms.alias("sigma"),
            ),
            1000 + self._step,
        )
        return self.bcx()

    def update_batch(self, events: list[tuple[int, int]]) -> float:
        out = self.bcx() if not events else 0.0
        for u, v in events:
            out = self.update(u, v)
        return out
