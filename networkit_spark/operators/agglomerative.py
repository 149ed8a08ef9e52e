"""ParallelAgglomerativeClusterer — multilevel match-and-contract
community detection.

Reference: /root/reference/networkit/cpp/community/
ParallelAgglomerativeClusterer.cpp:20-84 — per level: score every edge
with Delta-modularity (ModularityScoring), compute a heavy-edge
matching on those scores, contract matched pairs (MatchingCoarsening),
and repeat while the contraction still shrinks the graph
(diff > 0, coarse nodes >= MIN_NUM_COMMUNITIES = 2,
diff / n > REL_REPEAT_THRSH = 5e-3, :22-26,57-63).  The final
clustering is the singleton partition of the COARSEST graph projected
back to the finest (:73-81) — i.e. the last contraction that failed
the repeat test is discarded, exactly like the reference (it only
pushes the mapping into the hierarchy when ``repeat`` holds, :66-69).

Matcher choice (documented deviation): the reference calls the
sequential PathGrowingMatcher and carries a "FIXME: so far only
sequential" (:46).  The distributed analogue with the same
locally-heavy guarantee is LocalMaxMatcher (operators/matching.py
local_max_matching — synchronous mutual-argmax rounds); both produce
1/2-approximate maximum-weight matchings, which is the only property
the multilevel scheme relies on.  Only strictly positive
Delta-modularity edges are matchable, mirroring PathGrowingMatcher's
``bestWeight = 0`` strictly-greater selection (PathGrowingMatcher.cpp
:74-95): a merge that lowers modularity is never taken, which also
gives natural termination.

Scale shape: each level is modularity_edge_score (two degree joins),
local_max_matching rounds (argmax + self-join per round), and one
coarsen (two mapping joins + hash agg) — all hash-partitioned
DataFrame plans; the driver holds only per-level scalar counts, and
the cumulative fine->coarse label map is re-checkpointed per level to
cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import coarsen
from networkit_spark.operators.matching import local_max_matching
from networkit_spark.operators.scoring import modularity_edge_score
from networkit_spark.plans.superstep import Checkpointer


def agglomerative_clustering(
    g: Graph,
    min_communities: int = 2,
    rel_repeat_threshold: float = 5e-3,
    max_levels: int = 32,
    matcher_rounds: int = 128,
) -> tuple[DataFrame, list[dict]]:
    """((id, label) partition, per-level metrics) — the reference's
    multilevel agglomeration.  ``label`` is the coarsest-graph node id
    containing each fine node (min member id by construction of the
    matching contraction), so labels are canonical without a compaction
    pass.
    """
    if g.directed:
        raise ValueError("agglomerative_clustering needs an undirected graph")
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)

    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    cur = Graph(
        g.edges.select("src", "dst", w.alias("weight")),
        g.nodes(),
        directed=False,
        weighted=True,
    )
    labels = g.nodes().select("id", F.col("id").alias("label"))
    n = cur.nodes().count()
    metrics: list[dict] = []
    level = 0
    while level < max_levels:
        level += 1
        scores = modularity_edge_score(cur).filter(F.col("score") > 0)
        scored = Graph(
            scores.select("src", "dst", F.col("score").alias("weight")),
            cur.nodes(),
            directed=False,
            weighted=True,
        )
        matched, rounds = local_max_matching(scored, max_rounds=matcher_rounds)
        if rounds >= matcher_rounds:
            raise AssertionError(
                f"level {level} matching did not converge in "
                f"{matcher_rounds} rounds"
            )
        # matched pair -> min endpoint; unmatched keep their own id
        pair_label = matched.select(
            F.col("u").alias("id"), F.least("u", "v").alias("label")
        ).unionByName(
            matched.select(
                F.col("v").alias("id"), F.least("u", "v").alias("label")
            )
        )
        part = (
            cur.nodes()
            .join(pair_label, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
        )
        coarse, _ = coarsen(cur, part)
        cn = coarse.nodes().count()
        diff = n - cn
        repeat = (
            diff > 0
            and cn >= min_communities
            and (diff / n) > rel_repeat_threshold
        )
        metrics.append(
            {
                "level": level,
                "n": n,
                "coarse_n": cn,
                "rounds": rounds,
                "adopted": repeat,
            }
        )
        if not repeat:
            break  # last contraction discarded, like the reference
        labels = ckpt.cut(
            labels.join(
                part.select(
                    F.col("id").alias("label"), F.col("label").alias("_nl")
                ),
                "label",
            ).select("id", F.col("_nl").alias("label")),
            level,
        )
        cur = Graph(
            ckpt.cut(coarse.edges, level + 1000),
            coarse.nodes(),
            directed=False,
            weighted=True,
        )
        n = cn
    return labels, metrics
