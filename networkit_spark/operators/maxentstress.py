"""MaxentStress graph layout — stress majorization with a maxent
repulsive (entropy) term and alpha cooling.

Reference: /root/reference/networkit/cpp/viz/MaxentStress.cpp:
- run() (:78-204): requires a connected graph (:79-86); per solve,
  rhs = L_{w*d/dist} x (computeCoordinateLaplacianTerm, :415-436 —
  w_ij = 1/d_ij^2, dist clamped at 1e-5), rhs normalized per dim for
  the first maxSolvesPerAlpha/5 solves (:144-146), plus
  alpha * normalized repulsive forces, zero-sum corrected (:150-164),
  then the weighted-Laplacian system is solved per dim (:167);
  repulsive forces refresh whenever floor(5*ln(numSolves)) changes
  (:124-131 — ln(0) = -inf, so solves 0..5 refresh every time);
  cooling multiplies alpha by alphaReduction per round until
  finalAlpha (:182-185); with fastComputation = false the inner loop
  always runs the full maxSolvesPerAlpha schedule (:172-178), so the
  whole iteration count is static.
- repulsive term (computeRepulsiveForces, :438-472): for every
  NON-neighbor pair, qSign / max(sqDist, 1e-3)^((q+2)/2) * (x_i - x_j),
  normalized per dim (sign(0) = +1, MaxentStress.hpp:305).
- defaults (:31-36): q = 0, alpha = 1, alphaReduction = 0.3,
  finalAlpha = 0.008, convThreshold = 1e-3 squared,
  maxSolvesPerAlpha = 50.
- isConverged (:364-378): sum ||new - old||^2 / sum ||old||^2 below
  the squared threshold.

Documented deviations (deterministic distributed contract):
- the linear solver is the repo's damped-Jacobi Laplacian solver
  (operators/electrical._laplacian_solve_batched — all dims solved as
  one tagged batch), ``jacobi_iters`` sweeps from zero, instead of the
  reference's LAMG/CG-to-tolerance: any consistent solver yields a
  valid majorization step, and a fixed sweep count is replayable in
  the DuckDB gate oracle;
- the repulsive term is the reference's own EXACT form (its run()
  substitutes a theta = 0.6 octree approximation, :127 — a
  shared-memory artifact; the exact term is one anti-join + aggregate
  here; O(n^2) candidate pairs per refresh, fixture-scale — a grid /
  LSH bucketing is the web-scale path and the refresh cadence already
  amortizes it);
- the initial layout is md5-derandomized uniform in [-1, 1)^dim per
  (seed, id, d) (the reference's randomSphereCoordinates is an RNG
  BFS heuristic, :696-760 — any start is a valid layout seed);
- ``k`` neighborhoods beyond the direct edges (addKNeighborhoodOfVertex)
  are not implemented — pass a pre-augmented weighted graph instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def _h13(seed: int, tag: str, id_col, d: int):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}|{tag}|"),
                        id_col.cast("string"),
                        F.lit(f"|{d}"),
                    )
                ),
                1, 13,
            ),
            16, 10,
        ).cast("double") / F.lit(float(16**13))
    )


def maxent_stress(
    g: Graph,
    dim: int = 2,
    q: float = 0.0,
    alpha: float = 1.0,
    alpha_reduction: float = 0.3,
    final_alpha: float = 0.008,
    max_solves_per_alpha: int = 50,
    jacobi_iters: int = 40,
    jacobi_omega: float = 0.5,
    conv_threshold: float = 1e-3,
    fast_computation: bool = False,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """(coords (id, d, x), info with ``iterations`` = solves run)."""
    from networkit_spark.operators.components import (
        connected_components,
        number_of_components,
    )
    from networkit_spark.operators.electrical import _laplacian_solve_batched

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    labels, _ = connected_components(g)
    if number_of_components(labels) != 1:
        raise ValueError(
            "ERROR: The supplied graph is not connected. Currently "
            "MaxentStress only handles connected graphs."
        )
    n = g.number_of_nodes()
    wcol = F.col("weight") if g.weighted else F.lit(1.0)
    # known distances = the weighted adjacency; Laplacian weights 1/d^2
    kd = g.adj().filter(F.col("src") != F.col("dst")).select(
        "src", "dst", wcol.cast("double").alias("d")
    ).localCheckpoint(eager=True)
    # canonical (single-orientation) edges: Graph.adj() symmetrizes, so
    # feeding it the symmetrized kd would double every Laplacian weight
    wg = Graph(
        g.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst",
            (1.0 / (wcol.cast("double") * wcol.cast("double")))
            .alias("weight"),
        ),
        vertices=g.nodes(), directed=False, weighted=True,
    )

    q_sign = 1.0 if q >= 0.0 else -1.0
    q2 = (q + 2.0) / 2.0

    coords = None
    for d in range(dim):
        part = g.nodes().select(
            F.lit(d).cast("long").alias("tag"), "id",
            (2.0 * _h13(seed, "mxs", F.col("id"), d) - 1.0).alias("x"),
        )
        coords = part if coords is None else coords.unionByName(part)
    coords = ckpt.cut(coords, 0)

    def pair_diff(base: DataFrame) -> DataFrame:
        """(tag, src, dst, xs, xd) coordinate pairs along ``base``."""
        cs = coords.select("tag", F.col("id").alias("src"), F.col("x").alias("xs"))
        cd = coords.select("tag", F.col("id").alias("dst"), F.col("x").alias("xd"))
        return base.join(cs, "src").join(cd, ["tag", "dst"])

    def sq_dist(pairs: DataFrame) -> DataFrame:
        """(src, dst, d2) over all tags of a pair relation."""
        return (
            pairs.groupBy("src", "dst")
            .agg(F.sum((F.col("xs") - F.col("xd")) ** 2).alias("d2"))
        )

    repulsion = None
    current_lb = None  # None models the ln(0) = -inf sentinel
    current_alpha = float(alpha)
    solves = 0
    metrics: list[dict] = []
    converged = False
    while not converged:
        for s in range(int(max_solves_per_alpha)):
            old = coords
            lb = float("-inf") if s == 0 else math.floor(5 * math.log(s))
            if lb != current_lb or repulsion is None:
                # exact repulsive term over non-neighbor pairs
                nodes = g.nodes()
                allp = (
                    nodes.select(F.col("id").alias("src"))
                    .crossJoin(nodes.select(F.col("id").alias("dst")))
                    .filter(F.col("src") != F.col("dst"))
                    .join(kd.select("src", "dst"), ["src", "dst"], "left_anti")
                )
                d2 = sq_dist(pair_diff(allp)).withColumn(
                    "d2c", F.greatest(F.col("d2"), F.lit(1e-3))
                )
                rep = (
                    pair_diff(allp.join(d2.select("src", "dst", "d2c"),
                                        ["src", "dst"]))
                    .groupBy("tag", F.col("src").alias("id"))
                    .agg(
                        F.sum(
                            (F.lit(q_sign) / F.col("d2c") if q == 0.0
                             else F.lit(q_sign) / F.pow(F.col("d2c"), F.lit(q2)))
                            * (F.col("xs") - F.col("xd"))
                        ).alias("b")
                    )
                )
                norms = rep.groupBy("tag").agg(
                    F.sqrt(F.sum(F.col("b") ** 2)).alias("nrm")
                )
                repulsion = ckpt.cut(
                    rep.join(norms, "tag").select(
                        "tag", "id", (F.col("b") / F.col("nrm")).alias("b")
                    ),
                    1000 + solves,
                )
                current_lb = lb
            # stress-majorization rhs over the known distances
            dists = sq_dist(pair_diff(kd.select("src", "dst"))).select(
                "src", "dst",
                F.greatest(F.sqrt("d2"), F.lit(1e-5)).alias("dist"),
            )
            wrel = kd.join(dists, ["src", "dst"]).select(
                "src", "dst",
                (F.lit(1.0) / (F.col("d") * F.col("d")) * F.col("d")
                 / F.col("dist")).alias("w"),
            )
            rhs = (
                pair_diff(wrel)
                .groupBy("tag", F.col("src").alias("id"))
                .agg(F.sum(F.col("w") * (F.col("xs") - F.col("xd"))).alias("b"))
            )
            if s < max_solves_per_alpha // 5:
                rn = rhs.groupBy("tag").agg(
                    F.sqrt(F.sum(F.col("b") ** 2)).alias("nrm")
                )
                rhs = rhs.join(rn, "tag").select(
                    "tag", "id", (F.col("b") / F.col("nrm")).alias("b")
                )
            rhs = (
                rhs.join(repulsion.withColumnRenamed("b", "rb"),
                         ["tag", "id"], "full_outer")
                .select(
                    "tag", "id",
                    (F.coalesce("b", F.lit(0.0))
                     + F.lit(current_alpha) * F.coalesce("rb", F.lit(0.0)))
                    .alias("b"),
                )
            )
            means = rhs.groupBy("tag").agg(
                (F.sum("b") / F.lit(float(n))).alias("mu")
            )
            rhs = ckpt.cut(
                rhs.join(means, "tag").select(
                    "tag", "id", (F.col("b") - F.col("mu")).alias("b")
                ),
                2000 + solves,
            )
            coords = ckpt.cut(
                _laplacian_solve_batched(
                    wg, rhs, iters=jacobi_iters, omega=jacobi_omega,
                    checkpointer=ckpt,
                ),
                3000 + solves,
            )
            solves += 1
            conv = False
            if fast_computation:
                num = (
                    coords.join(
                        old.select("tag", "id", F.col("x").alias("xo")),
                        ["tag", "id"],
                    )
                    .agg(
                        F.sum((F.col("x") - F.col("xo")) ** 2).alias("rc"),
                        F.sum(F.col("xo") ** 2).alias("ol"),
                    )
                    .collect()[0]
                )
                conv = (
                    float(num["ol"]) > 0.0
                    and float(num["rc"]) / float(num["ol"])
                    < conv_threshold * conv_threshold
                )
            metrics.append(ckpt.log(solves, alpha=current_alpha))
            if conv:
                converged = True
                break
        current_alpha *= alpha_reduction
        converged = converged or current_alpha < final_alpha
    return coords.select("tag", "id", "x").withColumnRenamed(
        "tag", "d"
    ).select("id", "d", "x"), SuperstepResult(
        iterations=solves, metrics=metrics
    )


# ---------------------------------------------------------------------------
# Layout quality metrics + scaleLayout
# ---------------------------------------------------------------------------


def _pair_geo(coords: DataFrame, base: DataFrame) -> DataFrame:
    """base (src, dst) -> (src, dst, geo): Euclidean distance between
    the endpoints' layout positions (coords rows (id, d, x)).

    The per-pair sum runs over ``dim`` terms (2 or 3) so the grouped
    aggregation is FP-order safe for the gate (2-term addition is
    commutative-exact; 3-term sums are quantized downstream anyway).
    """
    cs = coords.select(
        F.col("d").alias("_d"), F.col("id").alias("src"),
        F.col("x").alias("xs"),
    )
    cd = coords.select(
        F.col("d").alias("_d"), F.col("id").alias("dst"),
        F.col("x").alias("xd"),
    )
    return (
        base.join(cs, "src")
        .join(cd, ["_d", "dst"])
        .groupBy("src", "dst")
        .agg(
            F.sqrt(
                F.sum((F.col("xs") - F.col("xd")) * (F.col("xs") - F.col("xd")))
            ).alias("geo")
        )
    )


def _entropy_term(distc, q: float):
    """max(dist, 1e-5)^-q per MaxentStress.cpp:306-316 (log when
    |q| < 0.001; the q == 2 case is spelled as exact arithmetic so the
    DuckDB gate oracle never goes through libm pow)."""
    if abs(q) < 0.001:
        return F.log(distc)
    if q == 2.0:
        return F.lit(1.0) / (distc * distc)
    return F.pow(distc, F.lit(-float(q)))


def _qsum(term, quantum: float | None):
    """Order-independent SUM for cross-engine gates: with ``quantum``
    set, each (bit-identical) per-row term is snapped to an integer
    grid and summed as BIGINT — associativity-exact in any engine and
    any partitioning — then scaled back.  quantum=None is the plain
    float sum (single-engine use)."""
    if quantum is None:
        return F.sum(term)
    return (
        F.sum(F.floor(term / F.lit(float(quantum)) + F.lit(0.5)).cast("long"))
        * F.lit(float(quantum))
    )


def _known_distances(g: Graph) -> DataFrame:
    """(src, dst, dk) — the reference's knownDistances relation
    (computeKnownDistances EDGE_WEIGHT, MaxentStress.cpp:502-530:
    forNeighborsOf per node, i.e. the directed/symmetrized adjacency;
    cardinality = row count).  k > 1 neighborhoods: pass a
    pre-augmented graph, as for the layout itself."""
    wcol = F.col("weight") if g.weighted else F.lit(1.0)
    return (
        g.adj()
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", wcol.cast("double").alias("dk"))
    )


def maxent_metrics(
    g: Graph,
    coords: DataFrame,
    q: float = 0.0,
    final_alpha: float = 0.008,
    quantum: float | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """One-row layout quality report over a (id, d, x) layout:
    (scaling_factor, full_stress, maxent, mean_distance_error, ldme).

    Reference: /root/reference/networkit/cpp/viz/MaxentStress.cpp —
    computeScalingFactor (:207-251: sum geo/d over all ordered reached
    pairs with d >= 1e-5, divided by sum geo^2/d^2), fullStressMeasure
    (:264-294: sum (geo-d)^2/d^2 over the same pairs, halved),
    maxentMeasure (:296-338: all-ordered-pairs entropy of
    max(geo, 1e-5) minus the known-edge entropy, sign-folded for
    q != 0, energy sum (distc-w)^2/w^2 over known edges, combined as
    (energy - finalAlpha * entropy) / 2), meanDistanceError
    (:340-349: mean |geo-w|/w over known edges) and ldme (:351-362:
    sqrt of the mean squared error).

    Documented deviations: unreachable pairs are omitted (the
    reference divides by DBL_MAX — an O(1e-308) contribution; exact
    on the connected graphs the layout itself requires); distances
    come from the batched tagged APSP relation (one synchronized
    frontier, not n driver-sequenced sweeps).  Both the distance
    relation and the all-pairs entropy are inherently O(n^2) —
    exactly the reference's own cost; at web scale feed a sampled
    source batch and scale the sums (the estimator is linear in the
    pair relation).  ``quantum`` snaps per-pair terms to an integer
    grid for the cross-engine gate (see _qsum).
    """
    from networkit_spark.operators.distancemisc import apsp

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes()
    allp = (
        nodes.select(F.col("id").alias("src"))
        .crossJoin(nodes.select(F.col("id").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
    )
    geo_all = ckpt.cut(_pair_geo(coords, allp), 0)
    dist = (
        apsp(g, checkpointer=ckpt)
        .select(
            F.col("s").alias("src"), F.col("v").alias("dst"),
            F.col("dist").cast("double").alias("gd"),
        )
        .filter(F.col("gd") >= 1e-5)
    )
    geo, gd = F.col("geo"), F.col("gd")
    sg = dist.join(geo_all, ["src", "dst"])
    agg1 = sg.agg(
        _qsum(geo / gd, quantum).alias("topf"),
        _qsum((geo * geo) / (gd * gd), quantum).alias("botf"),
        _qsum(((geo - gd) * (geo - gd)) / (gd * gd), quantum).alias("fs"),
    )
    distc = F.greatest(geo, F.lit(1e-5))
    ent_all = geo_all.agg(
        _qsum(_entropy_term(distc, q), quantum).alias("ent")
    )
    dk = F.col("dk")
    ke = _known_distances(g).join(geo_all, ["src", "dst"])
    agg2 = ke.agg(
        _qsum(((distc - dk) * (distc - dk)) / (dk * dk), quantum)
        .alias("energy"),
        _qsum(_entropy_term(distc, q), quantum).alias("ent_edges"),
        _qsum(F.abs(geo - dk) / dk, quantum).alias("mde_sum"),
        _qsum((dk - geo) * (dk - geo), quantum).alias("ldme_sum"),
        F.count(F.lit(1)).alias("card"),
    )
    ent_total = F.col("ent") - F.col("ent_edges")
    if abs(q) > 0.001:
        ent_total = ent_total * F.lit(-(1.0 if q >= 0.0 else -1.0))
    card = F.col("card").cast("double")
    return (
        agg1.crossJoin(ent_all)
        .crossJoin(agg2)
        .select(
            (F.col("topf") / F.col("botf")).alias("scaling_factor"),
            (F.col("fs") / F.lit(2.0)).alias("full_stress"),
            ((F.col("energy") - F.lit(float(final_alpha)) * ent_total)
             / F.lit(2.0)).alias("maxent"),
            (F.col("mde_sum") / card).alias("mean_distance_error"),
            F.sqrt(F.col("ldme_sum") / card).alias("ldme"),
        )
    )


def scale_layout(
    g: Graph,
    coords: DataFrame,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """coords scaled by computeScalingFactor (MaxentStress.cpp:253-262)
    — the factor stays a 1-row relation broadcast onto the layout, no
    driver collect."""
    from networkit_spark.operators.distancemisc import apsp

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes()
    allp = (
        nodes.select(F.col("id").alias("src"))
        .crossJoin(nodes.select(F.col("id").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
    )
    geo_all = _pair_geo(coords, allp)
    dist = (
        apsp(g, checkpointer=ckpt)
        .select(
            F.col("s").alias("src"), F.col("v").alias("dst"),
            F.col("dist").cast("double").alias("gd"),
        )
        .filter(F.col("gd") >= 1e-5)
    )
    geo, gd = F.col("geo"), F.col("gd")
    factor = (
        dist.join(geo_all, ["src", "dst"])
        .agg(
            (F.sum(geo / gd) / F.sum((geo * geo) / (gd * gd))).alias("_s")
        )
    )
    return coords.crossJoin(F.broadcast(factor)).select(
        "id", "d", (F.col("x") * F.col("_s")).alias("x")
    )
