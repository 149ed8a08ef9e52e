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


def bsuitor_matching(
    g: Graph,
    b: int | DataFrame = 2,
    max_rounds: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[DataFrame, SuperstepResult]:
    """b-matching — the reference's BSuitorMatcher re-expressed as
    distributed locally-dominant rounds.

    Reference: /root/reference/networkit/cpp/matching/BSuitorMatcher.cpp
    (Khan et al. 2016 b-Suitor: every node proposes to its b best
    neighbors, displaced suitors re-propose; the MatchingNode total
    order is weight desc, then SMALLER id ranked higher,
    BSuitorMatcher.hpp:36-41).  Like Suitor (b=1), the sequential
    propose/displace loop's FIXPOINT is the unique greedy b-matching
    under the total edge order (weight desc, src asc, dst asc), computed
    here by synchronous rounds:

        round: every node with remaining capacity r(u) picks its top
               r(u) live incident edges; an edge is matched iff BOTH
               endpoints picked it; capacities shrink by matches.

    The globally heaviest live edge is always mutual, so every round
    matches at least one edge; zero mutual picks == no live edges ==
    fixpoint.  Per-node top-r selection runs as r repeated struct-argmax
    hash aggregations (map-side combine; r <= b is a small constant) —
    never a per-node sort window, so a hub's adjacency stays
    distributed (same hub rule as the k-core histogram plan).

    ``b``: uniform int capacity, or a per-node (id, b) DataFrame
    (BSuitorMatcher.cpp:9 vector form).  Requires an undirected graph
    without self-loops (constructor guards :10-14).  Ties in weight
    break to the smaller neighbor id exactly like the reference; with
    distinct weights the output is the canonical greedy b-matching.
    Returns (matching(src, dst, weight) canonical src<dst, info).
    """
    if g.directed:
        raise ValueError("bsuitor_matching supports undirected graphs only")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    gg = g.remove_self_loops()
    adj = materialize_partitioned(
        gg.adj().select("src", "dst", "weight"), "src"
    )
    if isinstance(b, DataFrame):
        caps = b.select("id", F.col("b").cast("long").alias("b"))
    else:
        if int(b) <= 0:
            raise ValueError("b must be positive")
        caps = gg.nodes().select("id", F.lit(int(b)).cast("long").alias("b"))
    caps = caps.localCheckpoint(eager=True)

    matched = spark.createDataFrame([], "src long, dst long, weight double")
    rem = caps.select("id", F.col("b").alias("rem"))
    metrics: list[dict] = []
    it = 0
    converged = False
    while it < max_rounds:
        t0 = time.time()
        it += 1
        # live arcs: unmatched edges whose BOTH endpoints have capacity
        m_arcs = matched.select("src", "dst").unionByName(
            matched.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        live = (
            adj.join(m_arcs.hint("shuffle_hash"), ["src", "dst"], "left_anti")
            .join(
                rem.filter(F.col("rem") > 0)
                .select(F.col("id").alias("src"), F.col("rem").alias("rsrc"))
                .hint("shuffle_hash"),
                "src",
            )
            .join(
                rem.filter(F.col("rem") > 0)
                .select(F.col("id").alias("dst"))
                .hint("shuffle_hash"),
                "dst",
            )
        )
        live = ckpt.cut(live, 1000 + it)
        max_rem_row = live.agg(F.max("rsrc").alias("m")).collect()[0]
        max_rem = int(max_rem_row["m"] or 0)
        if max_rem == 0:
            converged = True
            metrics.append(ckpt.log(it, changed=0, wall_sec=time.time() - t0))
            break
        # top-r(u) picks: r repeated struct-argmax rounds (hub-safe)
        picks = spark.createDataFrame(
            [], "src long, dst long, weight double"
        )
        pool = live
        for j in range(1, max_rem + 1):
            pk = (
                pool.filter(F.col("rsrc") >= j)
                .groupBy("src")
                .agg(
                    F.max(
                        F.struct(F.col("weight"), (-F.col("dst")).alias("nd"))
                    ).alias("p")
                )
                .select(
                    "src",
                    (-F.col("p.nd")).alias("dst"),
                    F.col("p.weight").alias("weight"),
                )
            )
            picks = picks.unionByName(pk)
            if j < max_rem:
                pool = pool.join(pk.select("src", "dst"), ["src", "dst"],
                                 "left_anti")
        picks = ckpt.cut(picks, 2000 + it)
        other = picks.select(
            F.col("src").alias("dst"), F.col("dst").alias("src")
        )
        mutual = (
            picks.join(other, ["src", "dst"])
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst", "weight")
        )
        mutual = ckpt.cut(mutual, 3000 + it)
        new_matches = mutual.count()
        if new_matches == 0:
            converged = True
            metrics.append(ckpt.log(it, changed=0, wall_sec=time.time() - t0))
            break
        matched = ckpt.cut(matched.unionByName(mutual), 4000 + it)
        used = (
            matched.select(F.col("src").alias("id"))
            .unionByName(matched.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("used"))
        )
        rem = ckpt.cut(
            caps.join(used, "id", "left").select(
                "id",
                (F.col("b") - F.coalesce("used", F.lit(0))).alias("rem"),
            ),
            5000 + it,
        )
        metrics.append(
            ckpt.log(it, changed=new_matches, wall_sec=time.time() - t0)
        )
    adj.unpersist()
    return matched, SuperstepResult(
        iterations=it, metrics=metrics, converged=converged
    )


def bsuitor_reference_replica(
    edges: list[tuple[int, int, float]], n: int, b
) -> set[tuple[int, int]]:
    """Driver-side replica of BSuitorMatcher::run (findSuitors /
    findPreferred / makeSuitor, BSuitorMatcher.cpp:42-87) for
    cross-checking the distributed fixpoint in tests.  ``b`` is an int
    or a per-node list.  Returns matched pairs as (min, max) tuples."""
    bs = [b] * n if isinstance(b, int) else list(b)
    nbrs: dict[int, list[tuple[int, float]]] = {u: [] for u in range(n)}
    for u, v, w in edges:
        nbrs[u].append((v, w))
        nbrs[v].append((u, w))

    # MatchingNode order: weight desc then smaller id higher (hpp:36-41)
    def better(a, b2):  # (id, weight) strictly preferred over b2
        if a[1] != b2[1]:
            return a[1] > b2[1]
        return a[0] < b2[0]

    suitors: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    proposed: list[set[int]] = [set() for _ in range(n)]

    def smallest(u):
        """The min suitor of u under the MatchingNode order, or None."""
        if len(suitors[u]) < bs[u]:
            return None
        m = suitors[u][0]
        for x in suitors[u][1:]:
            if better(m, x):
                m = x
        return m

    def find_preferred(u):
        best = None
        for v, w in nbrs[u]:
            if v in proposed[u]:
                continue
            if best is not None and not better((v, w), best):
                continue
            mn = smallest(v)
            if mn is None or w > mn[1] or (w == mn[1] and u < mn[0]):
                best = (v, w)
        return best

    def make_suitor(u, w, v):
        stack = [(u, w, v)]
        while stack:
            u, w, v = stack.pop()
            mn = smallest(v)
            if mn is not None:
                suitors[v].remove(mn)
            suitors[v].append((u, w))
            proposed[u].add(v)
            if mn is not None:
                proposed[mn[0]].discard(v)
                nxt = find_preferred(mn[0])
                if nxt is not None:
                    stack.append((mn[0], nxt[1], nxt[0]))

    for u in range(n):
        for _ in range(bs[u]):
            pref = find_preferred(u)
            if pref is not None:
                make_suitor(u, pref[1], pref[0])

    out = set()
    for u in range(n):
        for v, _ in suitors[u]:
            if any(x == u for x, _ in suitors[v]) and u < v:
                out.add((u, v))
    return out


def local_max_matching(
    g: Graph,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 128,
) -> tuple[DataFrame, int]:
    """((u, v) matched pairs u < v, rounds) — LocalMaxMatcher.

    Reference: matching/LocalMaxMatcher.cpp:21-77 — rounds of: every
    node nominates its locally-heaviest incident edge; mutual
    nominations match; matched nodes' edges drop; repeat while edges
    remain.  The reference breaks weight ties with a uniform
    perturbation (+Random.real(1e-6)); we break them DETERMINISTICALLY
    by (weight, md5('lmm'|u|v), u, v) dominance so the DuckDB oracle
    replays every round (documented deviation — any consistent total
    order yields a valid local-max matching).

    Spark-first: one round = a per-endpoint struct-argmax over the live
    adjacency + a mutual-agreement self-join; the live edge set shrinks
    by anti-join — O(live edges) per round, no driver state.
    """
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    live = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        .distinct()
        .withColumn(
            "tie",
            F.md5(
                F.concat_ws(
                    "|", F.lit("lmm"),
                    F.col("u").cast("string"), F.col("v").cast("string"),
                )
            ),
        )
        .localCheckpoint(eager=True)
    )
    matched = spark.createDataFrame([], "u long, v long")
    rounds = 0
    while rounds < max_rounds and not live.isEmpty():
        rounds += 1
        both = live.select("u", "v", "w", "tie").unionByName(
            live.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w", "tie"
            )
        )
        cand = both.groupBy("u").agg(
            F.max(F.struct("w", "tie", F.col("v").alias("pick"))).alias("m")
        ).select("u", F.col("m.pick").alias("pick"))
        # mutual agreement
        agree = (
            cand.alias("a")
            .join(
                cand.alias("b"),
                (F.col("a.pick") == F.col("b.u"))
                & (F.col("b.pick") == F.col("a.u")),
            )
            .filter(F.col("a.u") < F.col("b.u"))
            .select(
                F.col("a.u").alias("u"), F.col("b.u").alias("v")
            )
        )
        agree = ckpt.cut(agree, rounds)
        if agree.isEmpty():
            break
        matched = matched.unionByName(agree)
        mnodes = (
            agree.select("u")
            .unionByName(agree.select(F.col("v").alias("u")))
            .withColumnRenamed("u", "id")
        )
        live = ckpt.cut(
            live.join(mnodes.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(mnodes.withColumnRenamed("id", "v"), "v", "left_anti"),
            1000 + rounds,
        )
    return matched, rounds


def path_growing_matching(g: Graph) -> DataFrame:
    """(src, dst, weight) — PathGrowingMatcher (Drake & Hougardy),
    the heavier of the two alternating matchings grown along
    greedy-heaviest paths.

    Reference: matching/PathGrowingMatcher.cpp:32-151 — repeatedly pop
    the highest-degree alive node, grow a path by following the
    heaviest alive incident edge, alternating edges between two
    matchings m1/m2 (the alternation flag is GLOBAL across paths,
    :97-104), remove each visited node; return the heavier matching.

    The walk is inherently sequential — the global m1/m2 parity couples
    every path, and the reference itself is flagged "FIXME: so far only
    sequential" where it is consumed (ParallelAgglomerativeClusterer
    .cpp:44-46) — so this is a documented DRIVER-SIDE fixture-scale
    implementation (same standing as the Hopcroft-Tarjan biconnected
    oracle, operators/components.py): edges are collected once, the
    path growth runs in plain Python, and the result returns as a
    DataFrame.  The scale-path matchers are suitor_matching /
    local_max_matching / bsuitor_matching above (all distributed
    rounds); they carry the same 1/2-approximation guarantee.

    Tie-breaking (documented deviations from unspecified reference
    order): heaviest-edge ties resolve to the smallest neighbor id
    (the reference takes the first strict max in adjacency-insertion
    order, :74-95); the path-start queue pops the highest degree with
    smallest id (BucketPQ bucket order unspecified, :42,66-68).
    """
    if g.directed:
        raise ValueError("path_growing_matching supports undirected graphs only")
    spark = g.edges.sparkSession
    w = (
        F.col("weight").cast("double")
        if (g.weighted and "weight" in g.edges.columns)
        else F.lit(1.0)
    )
    rows = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        .distinct()
        .collect()
    )
    nbrs: dict[int, dict[int, float]] = {}
    for r in rows:
        nbrs.setdefault(r["u"], {})[r["v"]] = float(r["w"])
        nbrs.setdefault(r["v"], {})[r["u"]] = float(r["w"])
    alive = {u for u, d in nbrs.items() if d}
    degrees = {u: len(d) for u, d in nbrs.items()}
    num_edges = len(rows)
    m1: list[tuple[int, int, float]] = []
    m2: list[tuple[int, int, float]] = []
    take_m1 = True
    while num_edges > 0:
        # highest alive degree, smallest id (BucketPQ extractMin on -deg)
        v = min(alive, key=lambda x: (-degrees[x], x))
        while degrees[v] > 0:
            best = min(
                ((nb, wt) for nb, wt in nbrs[v].items() if nb in alive),
                key=lambda t: (-t[1], t[0]),
            )
            (m1 if take_m1 else m2).append(
                (min(v, best[0]), max(v, best[0]), best[1])
            )
            take_m1 = not take_m1
            for nb in nbrs[v]:
                if nb in alive:
                    degrees[nb] -= 1
                    num_edges -= 1
                    if degrees[nb] == 0:
                        alive.discard(nb)
            alive.discard(v)
            v = best[0]
    # greedy growth may match a node twice across path hops only via
    # the alternation; each matching list is vertex-disjoint by
    # construction (every appended node dies immediately)
    pick = m1 if sum(t[2] for t in m1) > sum(t[2] for t in m2) else m2
    return spark.createDataFrame(
        [(a, b, float(c)) for a, b, c in sorted(pick)],
        "src long, dst long, weight double",
    )
