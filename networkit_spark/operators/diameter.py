"""Diameter (exact / estimated range / sampled) and effective diameter.

Reference:
  - Diameter: /root/reference/networkit/cpp/distance/Diameter.cpp:39-90
    (exact unweighted = estimatedDiameterRange with error 0, :168+ the
    iFUB-style bounding loop, directed graphs rejected at :91) and
    estimatedVertexDiameter (max sampled eccentricity).
  - EffectiveDiameter: /root/reference/networkit/cpp/distance/
    EffectiveDiameter.cpp:27-100 — per node v the smallest hop count h
    (>= 1) at which |N_h(v)| >= ceil(ratio * n), averaged over nodes;
    undirected single-component graphs only (throws otherwise, :18-25).

Spark plan:
  - diameter(): BATCHED iFUB (the fringe-processing idea behind the
    reference's estimatedDiameterRange, batched for a superstep engine).
    One BFS from a max-degree root r gives depths d_r and lb = ecc(r).
    Levels are processed deepest-first; every node of the current level
    becomes a source of ONE tagged multi-source BFS (the closeness
    machinery) and lb absorbs their exact eccentricities. Stop as soon
    as lb >= 2*i (iFUB theorem: any unprocessed u, v have depth <= i, so
    d(u, v) <= d_r(u) + d_r(v) <= 2i <= lb) — lb is then the EXACT
    diameter. Power-law graphs have tiny top levels, so this is a
    handful of batched BFS sweeps with O(|fringe| * n) peak state — the
    scalable plan, not an all-pairs sweep. ``error`` relaxes the stop to
    lb * (1 + error) >= 2*i and returns (lb, max(lb, 2i)) bounds.
  - effective_diameter(): needs the full neighborhood function — an
    all-sources tagged BFS (state O(n^2) rows, same total work as the
    reference's boolean-matrix iteration). Fixture/analysis scale by
    design; sample sources for an estimate at web scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.distance import bfs_distances


def _require_connected_undirected(g: Graph, what: str) -> int:
    if g.directed:
        raise RuntimeError(f"{what} of directed graphs cannot be computed yet.")
    from networkit_spark.operators.components import connected_components

    labels, _ = connected_components(g)
    if labels.select("label").distinct().count() > 1:
        raise RuntimeError(f"Graph not connected - {what} is infinite")
    return g.number_of_nodes()


def diameter(
    g: Graph,
    algo: str = "exact",
    error: float = 0.0,
    n_samples: int = 0,
    check: bool = True,
) -> tuple[int, int]:
    """(lower, upper) diameter bounds; equal for algo="exact"
    (Diameter.cpp exact mode returns the single value, here lower ==
    upper). algo="estimated_range" stops at upper <= lower*(1+error);
    algo="estimated_samples" returns the max eccentricity over
    ``n_samples`` deterministic (md5-seeded) sources — a lower bound,
    like the reference's estimatedVertexDiameter."""
    if check:
        n = _require_connected_undirected(g, "the diameter")
    else:
        n = g.number_of_nodes()
    if n <= 1:
        return 0, 0
    nodes = g.nodes()
    if algo == "estimated_samples":
        if n_samples <= 0:
            raise ValueError("estimated_samples requires n_samples > 0")
        seeds = (
            nodes.select(
                "id",
                F.md5(F.concat(F.lit("diam|"), F.col("id").cast("string"))).alias("h"),
            )
            .orderBy("h", "id")
            .limit(n_samples)
            .collect()
        )
        ecc_max = 0
        for r in seeds:
            dist, _ = bfs_distances(g, [int(r["id"])])
            ecc = int(dist.agg(F.max("dist")).collect()[0][0])
            ecc_max = max(ecc_max, ecc)
        return ecc_max, ecc_max
    if algo not in ("exact", "estimated_range"):
        raise ValueError(f"unknown diameter algo {algo!r}")
    if algo == "exact":
        error = 0.0

    # batched iFUB. Root = max-degree node (Diameter.cpp:183-189 picks
    # per-component max-degree start nodes); ties to smallest id.
    root = int(
        g.degrees()
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(1)
        .collect()[0]["id"]
    )
    depths, _ = bfs_distances(g, [root])
    depths = depths.localCheckpoint(eager=True)
    lb = int(depths.agg(F.max("dist")).collect()[0][0])  # ecc(root)
    i = lb
    from networkit_spark.operators.closeness import _tagged_bfs
    from networkit_spark.plans.superstep import Checkpointer

    while i >= 1 and lb * (1.0 + error) < 2 * i:
        fringe = depths.filter(F.col("dist") == i).select("id")
        if fringe.head(1):
            settled, _ = _tagged_bfs(
                g, fringe, None, Checkpointer(g.edges.sparkSession)
            )
            fringe_ecc = int(settled.agg(F.max("dist")).collect()[0][0])
            lb = max(lb, fringe_ecc)
        i -= 1
    # iFUB invariant at exit: every unprocessed pair sits at depth <= i,
    # so d(u, v) <= 2i; with error=0 the loop only exits once lb >= 2i,
    # hence lb is the exact diameter
    ub = max(lb, 2 * i) if error > 0 else lb
    return lb, ub


def effective_diameter(g: Graph, ratio: float = 0.9, check: bool = True) -> float:
    """Exact effective diameter (EffectiveDiameter.cpp:27-100): mean
    over nodes v of the smallest h >= 1 with |N_h(v)| >= ceil(ratio*n)
    (the reference counts v itself and only checks after the first
    expansion, hence the h >= 1 floor)."""
    if check:
        n = _require_connected_undirected(g, "the effective diameter")
    else:
        n = g.number_of_nodes()
    if n == 0:
        return 0.0
    threshold = int(math.ceil(ratio * n))
    from networkit_spark.operators.closeness import _tagged_bfs
    from networkit_spark.plans.superstep import Checkpointer

    settled, _ = _tagged_bfs(g, g.nodes(), None, Checkpointer(g.edges.sparkSession))
    # cumulative neighborhood size per (source, h) via a running count;
    # eff(s) = smallest h (>= 1) whose cumulative count meets threshold
    per_h = settled.groupBy("s", "dist").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy("s").orderBy("dist")
    cum = per_h.select("s", "dist", F.sum("c").over(w).alias("cum"))
    eff = (
        cum.filter(F.col("cum") >= threshold)
        .groupBy("s")
        .agg(F.greatest(F.min("dist"), F.lit(1)).alias("h"))
    )
    row = eff.agg(F.sum("h").alias("sh")).collect()[0]
    return float(row["sh"]) / n


def _fm_init(nodes, k: int, cap: int, seed: int):
    """k Flajolet-Martin bitmasks per node. Bit position drawn
    geometrically, P(pos = i) = 0.5^(i+1), via the reference's formula
    position = ceil(log(u)/log(0.5) - 1)
    (EffectiveDiameterApproximation.cpp:58-66) with u a uniform (0,1]
    from the first 13 md5 nibbles of ``seed|j|id`` — RNG-free and
    cross-engine reproducible; bits at positions >= cap are dropped like
    the reference's lengthOfBitmask + r guard."""
    cols = [F.col("id")]
    for j in range(k):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}|{j}|"), F.col("id").cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            / float(16**13)
        )
        pos = F.ceil(F.log(u) / F.log(F.lit(0.5)) - 1).cast("long")
        # 2^pos instead of a variable shiftleft (PySpark's shiftleft
        # takes a literal count); exact for pos < 52 and cap is ~17
        cols.append(
            F.when((u > 0) & (pos < cap), F.pow(F.lit(2.0), pos).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias(f"m{j}"),
        )
    return nodes.select(*cols)


def anf_sketches(
    g: Graph,
    h: int,
    k: int = 4,
    r: int = 7,
    seed: int = 42,
):
    """ANF / Flajolet-Martin neighborhood-function sketches after ``h``
    synchronous hops: per node the k bitmasks (exact integers, the
    deterministic gate surface) and the estimated h-hop neighborhood
    size 2^b / 0.77351, b = mean lowest-unset-bit
    (EffectiveDiameterApproximation.cpp:84-103).

    The per-hop update is ONE O(m)-row shuffle feeding a BIT_OR hash
    aggregation — entirely JVM-side long arithmetic, state O(n * k)
    longs: this is the web-scale neighborhood-function plan (the exact
    ``effective_diameter`` is the O(n^2) fixture-scale oracle for it).
    Returns (masks DataFrame id, m0..m{k-1}, est)."""
    n = g.number_of_nodes()
    if n == 0:
        raise ValueError("empty graph")
    cap = int(math.ceil(math.log2(max(n, 2)))) + r
    masks = _fm_init(g.nodes(), k, cap, seed).localCheckpoint(eager=True)
    adj = g.adj().select("src", "dst").filter(F.col("src") != F.col("dst"))
    mcols = [f"m{j}" for j in range(k)]
    for _ in range(h):
        nbr = adj.join(
            masks.select(F.col("id").alias("dst"), *mcols), "dst"
        ).select(F.col("src").alias("id"), *mcols)
        masks = (
            masks.select("id", *mcols)
            .unionByName(nbr)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(c) for c in mcols])
            .localCheckpoint(eager=True)
        )
    lowest_unset = [
        F.log2(
            F.bitwise_not(F.col(c)).bitwiseAND(F.col(c) + 1).cast("double")
        )
        for c in mcols
    ]
    b = sum(lowest_unset) / float(k)
    return masks.select(
        "id", *mcols, (F.pow(F.lit(2.0), b) / F.lit(0.77351)).alias("est")
    )


def effective_diameter_approximation(
    g: Graph,
    ratio: float = 0.9,
    k: int = 4,
    r: int = 7,
    seed: int = 42,
    max_h: int = 1024,
    check: bool = True,
) -> float:
    """EffectiveDiameterApproximation.cpp:24-126 with the md5-seeded
    FM initialization of ``anf_sketches``: per hop every ACTIVE node
    ORs its neighbors' previous masks (inactive nodes' masks stay
    frozen, exactly like the reference's retired mPrev entries); a node
    retires at the first h where its estimate reaches ceil(ratio*n) or
    its masks equal the global maxima, contributing h to the sum; the
    result is the mean retirement hop."""
    if check:
        n = _require_connected_undirected(g, "the effective diameter")
    else:
        n = g.number_of_nodes()
    if n <= 1:
        return 0.0
    threshold = math.ceil(ratio * n)
    cap = int(math.ceil(math.log2(n))) + r
    mcols = [f"m{j}" for j in range(k)]
    masks = _fm_init(g.nodes(), k, cap, seed).withColumn(
        "active", F.lit(True)
    ).localCheckpoint(eager=True)
    highest = masks.agg(*[F.bit_or(c).alias(c) for c in mcols]).collect()[0]
    adj = g.adj().select("src", "dst").filter(F.col("src") != F.col("dst"))
    eff_sum = 0
    for h in range(1, max_h + 1):
        nbr = adj.join(
            masks.select(F.col("id").alias("dst"), *mcols), "dst"
        ).select(F.col("src").alias("id"), *mcols)
        merged = (
            masks.select("id", *mcols)
            .unionByName(nbr)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(f"n_{c}") for c in mcols])
        )
        cur = masks.join(merged, "id").select(
            "id",
            "active",
            *[
                F.when(F.col("active"), F.col(f"n_{c}")).otherwise(F.col(c)).alias(c)
                for c in mcols
            ],
        )
        lowest_unset = [
            F.log2(F.bitwise_not(F.col(c)).bitwiseAND(F.col(c) + 1).cast("double"))
            for c in mcols
        ]
        est = F.pow(F.lit(2.0), sum(lowest_unset) / float(k)) / F.lit(0.77351)
        at_max = None
        for c in mcols:
            cond = F.col(c) == F.lit(int(highest[c]))
            at_max = cond if at_max is None else (at_max & cond)
        retire = F.col("active") & ((est >= F.lit(float(threshold))) | at_max)
        cur = cur.select(
            "id", *mcols, (F.col("active") & ~retire).alias("active"),
            retire.alias("retired"),
        ).localCheckpoint(eager=True)
        retired = cur.filter("retired").count()
        eff_sum += h * retired
        masks = cur.drop("retired")
        if masks.filter("active").head(1) == []:
            break
    return eff_sum / float(n)
