"""Matching — the reference's SuitorMatcher re-expressed as distributed
locally-dominant edge rounds.

Reference: /root/reference/networkit/cpp/matching/SuitorMatcher.cpp
(findSuitor: each node proposes to its best neighbor under the total
order "weight desc, neighbor id asc", displaced suitors re-propose;
Matcher/Matching output is a symmetric partner map).  The sequential
propose/displace loop does not distribute, but its FIXPOINT does: with
a TOTAL order on edges (weight desc, then endpoint ids asc — always
total here because ties fall back to ids), the Suitor matching equals
the unique locally-dominant matching, i.e. greedy matching in
decreasing edge order (Manne & Bisseling 2007; Preis 1999).  That
fixpoint is computed by synchronous rounds:

    round: every live node picks its best live incident edge;
           an edge is matched iff BOTH endpoints picked it;
           matched endpoints leave the live set.

Each round is one hash aggregation (struct-argmax, map-side partial)
plus one self-join on the candidate picks — the PLP plan shape.  Rounds
needed = length of the longest strictly-decreasing weight chain that
greedy walks sequentially (O(log n) expected on hashed weights).
tests/test_matching.py checks equality against a driver-side replica of
the reference's findSuitor loop on random unique-weight graphs.
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


def suitor_matching(
    g: Graph,
    max_rounds: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(matching(src, dst, weight), info): the Suitor/greedy matching
    under the total edge order (weight desc, src asc, dst asc).

    Requires an undirected graph without self-loops (SuitorMatcher.cpp
    constructor guards).  Ties in weight are broken by the smaller
    neighbor id exactly like findSuitor's ``v < partner`` /
    ``current < suitor[v]`` comparisons; with distinct weights the
    output is the canonical greedy matching.
    """
    if g.directed:
        raise ValueError("suitor_matching supports undirected graphs only")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    gg = g.remove_self_loops()
    # both orientations, loop-invariant, hash-partitioned once
    adj = materialize_partitioned(
        gg.adj().select("src", "dst", "weight"), "src"
    )

    matched = spark.createDataFrame([], "src long, dst long, weight double")
    dead = spark.createDataFrame([], "id long")
    metrics: list[dict] = []
    it = 0
    converged = False
    while it < max_rounds:
        t0 = time.time()
        it += 1
        live = (
            adj.join(dead.withColumnRenamed("id", "src").hint("shuffle_hash"),
                     "src", "left_anti")
            .join(dead.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                  "dst", "left_anti")
        )
        # struct-argmax: max weight, then SMALLEST neighbor id
        best = (
            live.groupBy("src")
            .agg(F.max(F.struct(F.col("weight"), (-F.col("dst")).alias("nd")))
                 .alias("b"))
            .select(
                F.col("src").alias("u"),
                (-F.col("b.nd")).alias("v"),
                F.col("b.weight").alias("w"),
            )
        )
        other = best.select(
            F.col("u").alias("v"), F.col("v").alias("u2"), F.col("w").alias("w2")
        )
        mutual = (
            best.join(other, "v")
            .filter((F.col("u2") == F.col("u")) & (F.col("u") < F.col("v")))
            .select(F.col("u").alias("src"), F.col("v").alias("dst"),
                    F.col("w").alias("weight"))
        )
        mutual = ckpt.cut(mutual, it)
        new_matches = mutual.count()
        if new_matches == 0:
            converged = True
            metrics.append(ckpt.log(it, state=matched, changed=0,
                                    wall_sec=time.time() - t0))
            break
        matched = ckpt.cut(matched.unionByName(mutual), it)
        dead = ckpt.cut(
            dead.unionByName(matched.select(F.col("src").alias("id")))
            .unionByName(matched.select(F.col("dst").alias("id")))
            .distinct(),
            it,
        )
        metrics.append(ckpt.log(it, state=matched, changed=new_matches,
                                wall_sec=time.time() - t0))
    adj.unpersist()
    return matched, SuperstepResult(iterations=it, metrics=metrics,
                                    converged=converged)


def matching_weight(matching: DataFrame) -> float:
    """Matching::weight (reference matching/Matching.cpp) — total weight
    of matched edges."""
    row = matching.agg(F.sum("weight").alias("s")).collect()[0]
    return float(row["s"] or 0.0)


def suitor_reference_replica(edges: list[tuple[int, int, float]],
                             n: int) -> set[tuple[int, int]]:
    """Driver-side replica of SuitorMatcher::findSuitor (the reference's
    sequential propose/displace loop, SuitorMatcher.cpp:56-87) for
    cross-checking the distributed fixpoint in tests.  Returns matched
    pairs as (min, max) tuples."""
    # the reference's `none` is the max representable node id, so
    # `v < suitor[x]` is TRUE whenever x has no suitor yet — model that
    # with +inf, not a sentinel that breaks the comparison direction
    none = float("inf")
    nbrs: dict[int, list[tuple[int, float]]] = {u: [] for u in range(n)}
    for u, v, w in edges:
        nbrs[u].append((v, w))
        nbrs[v].append((u, w))
    suitor: list[float] = [none] * n
    ws = [0.0] * n
    for start in range(n):
        current = start
        done = False
        while not done:
            partner = suitor[current]
            heaviest = ws[current]
            for v, weight in nbrs[current]:
                if (
                    weight > heaviest or (weight == heaviest and v < partner)
                ) and (
                    weight > ws[v] or (weight == ws[v] and current < suitor[v])
                ):
                    partner = v
                    heaviest = weight
            done = True
            if partner != none and (
                heaviest > ws[int(partner)]
                or (heaviest == ws[int(partner)]
                    and current < suitor[int(partner)])
            ):
                p = int(partner)
                y = suitor[p]
                suitor[p] = current
                ws[p] = heaviest
                if y != none:
                    current = int(y)
                    done = False
    out = set()
    for u in range(n):
        if suitor[u] != none and suitor[int(suitor[u])] == u:
            out.add((min(u, int(suitor[u])), max(u, int(suitor[u]))))
    return out
