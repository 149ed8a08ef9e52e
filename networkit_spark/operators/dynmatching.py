"""DynamicBSuitorMatcher — incremental b-matching repair under edge
insertions and removals.

Reference: /root/reference/networkit/cpp/matching/DynamicBSuitorMatcher
.cpp:17-200 — update(GraphEvent) inserts/removes one edge into the
suitor structures and repairs along displacement paths
(trackUpdatePath follows decreasing-weight cascades, re-proposing for
each displaced node until the suitor invariant holds again).  The
reference's own gtest invariant is *dynamic == fresh static
BSuitorMatcher on the final graph*; that is exactly what this module
guarantees, by a certificate rather than by replaying the sequential
cascade:

  With a total order on edges (weight desc, endpoint ids asc), the
  b-suitor fixpoint is the unique greedy b-matching, and a valid
  b-matching M equals it **iff no violation edge exists** — an edge
  e = (u, v, w) not in M that BOTH endpoints accept (endpoint x
  accepts iff it has spare capacity or e beats x's weakest match
  under the order).  Proof: induct over edges in decreasing order —
  the heaviest disagreement with greedy would itself be a violation.

The repair loop is therefore self-stabilizing locally-dominant rounds
restricted to a dirty frontier:

  round: among violation edges touching the frontier, every node
         picks its best (weight desc, partner asc); mutual picks
         join M; each endpoint then keeps only its top-b matches
         (the displaced weakest drop out and their partners join the
         frontier).

Per round the globally heaviest frontier violation is mutual and,
once matched, can never be displaced again (only strictly heavier
edges displace, and no new violation heavier than it can appear —
freed capacity only re-exposes edges that were already rejected by
their other endpoint).  So the maximum violation weight strictly
decreases: the loop converges, and a final FULL certificate scan
(one O(m) join) seals exact equality with the static fixpoint — if
anything outside the frontier still violates (impossible from a
consistent prior state, but checked anyway), those endpoints are
re-seeded and the loop continues.

Scale shape: each round is two hash joins of the frontier against the
hash-partitioned adjacency, one struct-argmax (map-side combine), one
mutual self-join, and a per-endpoint top-b window whose partitions
hold at most b+1 rows (never a hub's full adjacency).  Work is
O(edges touching the cascade) per round, not O(m); only the closing
certificate reads the full edge set once.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import (
    Checkpointer,
    SuperstepResult,
    materialize_partitioned,
)


def apply_edge_events(
    g: Graph, events: DataFrame
) -> tuple[Graph, DataFrame]:
    """Apply an (kind 'ae'|'de', src, dst, weight) batch to an
    undirected weighted graph (GraphEvent EDGE_ADDITION/EDGE_REMOVAL,
    the only kinds DynamicBSuitorMatcher::update accepts, .cpp:17-28).

    Returns (new graph, dirty node ids = endpoints of every event).
    """
    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    canon = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        w.alias("weight"),
    )
    ev = events.select(
        "kind",
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    removed = ev.filter(F.col("kind") == "de").select("src", "dst")
    added = ev.filter(F.col("kind") == "ae").select("src", "dst", "weight")
    # an 'ae' on an existing edge is a weight update (replace, not dup)
    new_edges = (
        canon.join(removed, ["src", "dst"], "left_anti")
        .join(added.select("src", "dst"), ["src", "dst"], "left_anti")
        .unionByName(added)
    )
    dirty = (
        ev.select(F.col("src").alias("id"))
        .unionByName(ev.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = (
        g.nodes()
        .unionByName(dirty)
        .distinct()
    )
    return Graph(new_edges, nodes, directed=False, weighted=True), dirty


def _accepts(cnt, minw, minp, bcap, w, p):
    """Endpoint acceptance under (weight desc, partner asc): spare
    capacity, strictly heavier than the weakest match, or equal weight
    with a smaller partner id (BSuitorMatcher.hpp:36-41 MatchingNode
    order — same tie rule as the static rounds)."""
    return (
        (F.coalesce(cnt, F.lit(0)) < bcap)
        | (w > F.coalesce(minw, F.lit(float("-inf"))))
        | (
            (w == F.coalesce(minw, F.lit(float("-inf"))))
            & (p < F.coalesce(minp, F.lit(-1)))
        )
    )


def dynamic_bsuitor_update(
    g: Graph,
    b: int,
    matching: DataFrame,
    dirty: DataFrame,
    max_rounds: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """Repair ``matching`` (canonical src<dst, weight; must be a valid
    <=b-per-node matching over edges of ``g``) into THE b-suitor
    fixpoint of ``g``, starting from the ``dirty`` (id) frontier.

    Callers feed the post-event graph (apply_edge_events) with the
    prior matching minus pairs whose edge was removed; from-scratch
    callers may pass an empty matching and all nodes dirty (the loop
    then degenerates to the static algorithm).
    """
    if g.directed:
        raise ValueError("dynamic_bsuitor_update needs an undirected graph")
    if int(b) <= 0:
        raise ValueError("b must be positive")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    gg = g.remove_self_loops()
    edges = materialize_partitioned(
        gg.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        ).distinct(),
        "src",
    )
    matching = ckpt.cut(
        matching.select("src", "dst", F.col("weight").cast("double").alias("weight")),
        0,
    )
    dirty = ckpt.cut(dirty.select("id").distinct(), 1)

    metrics: list[dict] = []
    it = 0
    converged = False
    full_checked = False
    while it < max_rounds:
        t0 = time.time()
        it += 1
        # per-node slot stats from the current matching
        arcs = matching.select(
            F.col("src").alias("id"), F.col("dst").alias("p"), "weight"
        ).unionByName(
            matching.select(
                F.col("dst").alias("id"), F.col("src").alias("p"), "weight"
            )
        )
        stats = arcs.groupBy("id").agg(
            F.count("*").alias("cnt"),
            F.min(F.struct("weight", (-F.col("p")).alias("np"))).alias("wk"),
        ).select(
            "id",
            "cnt",
            F.col("wk.weight").alias("minw"),
            (-F.col("wk.np")).alias("minp"),
        )
        scope = edges if full_checked else (
            edges.join(
                dirty.withColumnRenamed("id", "src").hint("shuffle_hash"),
                "src",
                "left_semi",
            ).unionByName(
                edges.join(
                    dirty.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                    "dst",
                    "left_semi",
                )
            ).distinct()
        )
        viol = (
            scope.join(matching.select("src", "dst").hint("shuffle_hash"),
                       ["src", "dst"], "left_anti")
            .join(
                stats.select(
                    F.col("id").alias("src"), F.col("cnt").alias("cu"),
                    F.col("minw").alias("wu"), F.col("minp").alias("pu"),
                ),
                "src", "left",
            )
            .join(
                stats.select(
                    F.col("id").alias("dst"), F.col("cnt").alias("cv"),
                    F.col("minw").alias("wv"), F.col("minp").alias("pv"),
                ),
                "dst", "left",
            )
            .filter(
                _accepts(F.col("cu"), F.col("wu"), F.col("pu"), F.lit(b),
                         F.col("weight"), F.col("dst"))
                & _accepts(F.col("cv"), F.col("wv"), F.col("pv"), F.lit(b),
                           F.col("weight"), F.col("src"))
            )
            .select("src", "dst", "weight")
        )
        viol = ckpt.cut(viol, 1000 + it)
        n_viol = viol.count()
        if n_viol == 0:
            if full_checked:
                converged = True
                metrics.append(ckpt.log(it, changed=0,
                                        wall_sec=time.time() - t0))
                break
            # frontier drained: one full certificate pass seals equality
            full_checked = True
            metrics.append(ckpt.log(it, changed=0, wall_sec=time.time() - t0))
            continue
        full_checked = False
        varcs = viol.select("src", "dst", "weight").unionByName(
            viol.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                        "weight")
        )
        pick = varcs.groupBy("src").agg(
            F.max(F.struct("weight", (-F.col("dst")).alias("nd"))).alias("p")
        ).select("src", (-F.col("p.nd")).alias("dst"),
                 F.col("p.weight").alias("weight"))
        agreed = (
            pick.join(
                pick.select(F.col("src").alias("dst"),
                            F.col("dst").alias("src")),
                ["src", "dst"],
            )
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst", "weight")
        )
        m_all = matching.unionByName(agreed)
        # per-endpoint top-b retention; window partitions hold <= b+1
        # rows (a node gains at most one match per round), never a
        # hub's adjacency
        r_arcs = m_all.select(
            F.col("src").alias("id"), F.col("dst").alias("p"),
            "src", "dst", "weight",
        ).unionByName(
            m_all.select(
                F.col("dst").alias("id"), F.col("src").alias("p"),
                "src", "dst", "weight",
            )
        )
        wnd = Window.partitionBy("id").orderBy(
            F.col("weight").desc(), F.col("p").asc()
        )
        ranked = r_arcs.withColumn("rk", F.row_number().over(wnd))
        bad = (
            ranked.filter(F.col("rk") > b)
            .select("src", "dst")
            .distinct()
        )
        bad = ckpt.cut(bad, 2000 + it)
        dropped_nodes = bad.select(F.col("src").alias("id")).unionByName(
            bad.select(F.col("dst").alias("id"))
        )
        matching = ckpt.cut(
            m_all.join(bad.hint("shuffle_hash"), ["src", "dst"], "left_anti"),
            3000 + it,
        )
        dirty = ckpt.cut(
            viol.select(F.col("src").alias("id"))
            .unionByName(viol.select(F.col("dst").alias("id")))
            .unionByName(dropped_nodes)
            .distinct(),
            4000 + it,
        )
        metrics.append(
            ckpt.log(it, changed=n_viol, wall_sec=time.time() - t0)
        )
    return matching, SuperstepResult(
        iterations=it, metrics=metrics, converged=converged
    )


def dynamic_bsuitor(
    g: Graph,
    b: int,
    events: DataFrame,
    base_matching: DataFrame | None = None,
    max_rounds: int = 64,
) -> tuple[DataFrame, SuperstepResult]:
    """updateBatch convenience: static b-suitor on ``g`` (unless a
    prior matching is supplied), apply the event batch, repair.
    Matches DynamicBSuitorMatcher::updateBatch followed by the gtest's
    dynamic-equals-static invariant.
    """
    from networkit_spark.operators.matching import bsuitor_matching

    if base_matching is None:
        base_matching, _ = bsuitor_matching(g, b=b)
    g2, dirty = apply_edge_events(g, events)
    # drop pairs whose edge vanished; their partners join the frontier
    kept = base_matching.join(
        g2.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ),
        ["src", "dst"],
        "left_semi",
    )
    freed = base_matching.join(kept, ["src", "dst"], "left_anti")
    dirty = dirty.unionByName(
        freed.select(F.col("src").alias("id"))
    ).unionByName(freed.select(F.col("dst").alias("id"))).distinct()
    # refresh weights of kept pairs from the new edge table (an 'ae'
    # on an existing edge acts as a weight update)
    kept = kept.select("src", "dst").join(
        g2.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        ),
        ["src", "dst"],
    )
    return dynamic_bsuitor_update(g2, b, kept, dirty, max_rounds=max_rounds)
