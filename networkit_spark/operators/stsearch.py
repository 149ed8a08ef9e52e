"""Point-to-point search: bidirectional BFS / Dijkstra and simple-path
enumeration.

References (/root/reference/networkit/cpp/):
- distance/BidirectionalBFS.cpp (:15-121): grow one BFS ball from the
  source and one from the target, always expanding the smaller queue by
  a full level; when the balls touch, distance = expanded levels.
- distance/BidirectionalDijkstra.cpp: same idea with weighted balls and
  the classic stop rule top(sPQ) + top(tPQ) >= best meeting path.
- reachability/AllSimplePaths.cpp (:20-216): enumerate every simple
  source->target path, optionally length-bounded (cutoff).

Spark-first shapes:
- :func:`st_distances` runs MANY (s, t) pairs at once: one relation
  (pair, side, id, dist) holds both balls of every pair; each superstep
  expands, per pair, the smaller side by one BFS level (a per-pair
  decision joined in, not a driver branch), maintains best(pair) =
  min over meeting nodes of ds + dt, and retires pairs whose level sum
  reaches their bound.  Exact by the meet-bound argument regardless of
  alternation order.
- :func:`bidirectional_dijkstra` grows both weighted balls by
  Bellman-wave relaxation (the repo's SSSP shape) and stops when
  min(frontier_s) + min(frontier_t) >= best — the priority-queue stop
  rule evaluated on wave minima, exact for nonnegative weights.
- :func:`all_simple_paths` extends a (path-array, tail) frontier by one
  edge per superstep with an array_contains simplicity guard —
  output size is the inherent cost of the problem (the reference's DFS
  enumerates the same set), the cutoff bounds the rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

INF = float("inf")


def st_distances(
    g: Graph,
    pairs: list[tuple[int, int]],
    max_rounds: int = 512,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(s, t, dist) for every pair — batched bidirectional BFS;
    unreachable pairs are omitted (the SPSP output convention)."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    out_adj = g.adj().select("src", "dst").localCheckpoint(eager=True)
    # target balls grow along reversed edges on directed graphs
    in_adj = (
        out_adj.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).localCheckpoint(eager=True)
        if g.directed
        else out_adj
    )

    pairs_df = spark.createDataFrame(
        [(i, int(s), int(t)) for i, (s, t) in enumerate(pairs)],
        "p long, s long, t long",
    ).localCheckpoint(eager=True)

    # both balls in one relation; side 0 = source ball, 1 = target ball
    state = (
        pairs_df.select("p", F.lit(0).alias("side"), F.col("s").alias("id"))
        .unionByName(
            pairs_df.select(
                "p", F.lit(1).alias("side"), F.col("t").alias("id")
            )
        )
        .withColumn("dist", F.lit(0).cast("long"))
    )
    frontier = state
    state = ckpt.cut(state, 0)
    # levels expanded per (pair, side); meets: best known ds+dt per pair
    levels = {int(r["p"]): [0, 0] for r in pairs_df.collect()}
    best: dict[int, int] = {
        int(r["p"]): 0 for r in pairs_df.filter(F.col("s") == F.col("t")).collect()
    }
    active = set(levels) - set(best)

    rounds = 0
    while active and rounds < max_rounds:
        rounds += 1
        # per active pair, expand the smaller ball (fewer levels; ties
        # expand the source side — the reference compares queue sizes,
        # we compare levels: both alternation rules are exact under the
        # meet-bound stop, this one needs no size aggregation)
        expand_side = {
            p: (0 if levels[p][0] <= levels[p][1] else 1) for p in active
        }
        sel = spark.createDataFrame(
            [(p, sd) for p, sd in expand_side.items()], "p long, side long"
        )
        fr = frontier.join(F.broadcast(sel), ["p", "side"])
        nxt_s = (
            fr.filter(F.col("side") == 0)
            .join(out_adj, fr["id"] == out_adj["src"])
            .select("p", "side", F.col("dst").alias("id"),
                    (F.col("dist") + 1).alias("dist"))
        )
        nxt_t = (
            fr.filter(F.col("side") == 1)
            .join(in_adj, fr["id"] == in_adj["src"])
            .select("p", "side", F.col("dst").alias("id"),
                    (F.col("dist") + 1).alias("dist"))
        )
        nxt = (
            nxt_s.unionByName(nxt_t)
            .groupBy("p", "side", "id")
            .agg(F.min("dist").alias("dist"))
        )
        new = nxt.join(state, ["p", "side", "id"], "left_anti")
        new = ckpt.cut(new, rounds)
        # meets: a new node already settled on the OTHER side of the
        # same pair
        meets = (
            new.alias("n")
            .join(
                state.alias("o"),
                (F.col("n.p") == F.col("o.p"))
                & (F.col("n.id") == F.col("o.id"))
                & (F.col("n.side") != F.col("o.side")),
            )
            .groupBy(F.col("n.p").alias("p"))
            .agg(F.min(F.col("n.dist") + F.col("o.dist")).alias("md"))
            .collect()
        )
        for r in meets:
            p, md = int(r["p"]), int(r["md"])
            if p not in best or md < best[p]:
                best[p] = md
        produced = {
            (int(r["p"]), int(r["side"]))
            for r in new.select("p", "side").distinct().collect()
        }
        state = ckpt.cut(state.unionByName(new), 1000 + rounds)
        # replace only the EXPANDED sides' frontiers — the other side of
        # each pair keeps its current frontier for its next turn
        frontier = ckpt.cut(
            frontier.join(F.broadcast(sel), ["p", "side"], "left_anti")
            .unionByName(new),
            2000 + rounds,
        )
        for p in list(active):
            sd = expand_side[p]
            levels[p][sd] += 1
            bound = best.get(p)
            if bound is not None and levels[p][0] + levels[p][1] >= bound:
                # level sum reached the meet bound: no shorter path left
                active.discard(p)
            elif (p, sd) not in produced:
                # the expanded ball is COMPLETE.  If a bound exists it
                # is already exact (the far endpoint sits inside the
                # completed ball, so the v=endpoint meet was recorded);
                # if none exists the pair is unreachable.  Either way
                # this pair is done.
                active.discard(p)

    rows = [
        (int(r["p"]), int(r["s"]), int(r["t"]))
        for r in pairs_df.collect()
    ]
    out = [
        (s, t, best[p]) for p, s, t in rows if p in best
    ]
    return spark.createDataFrame(out, "s long, t long, dist long")


def bidirectional_dijkstra(
    g: Graph,
    source: int,
    target: int,
    max_rounds: int = 512,
    checkpointer: Checkpointer | None = None,
) -> float:
    """Weighted s-t distance (nonnegative weights); INF if unreachable.
    Bellman-wave bidirectional growth with the classic stop rule."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    if source == target:
        return 0.0
    wcol = "weight" if "weight" in g.edges.columns else None
    e = g.edges.select(
        "src", "dst",
        (F.col(wcol) if wcol else F.lit(1.0)).cast("double").alias("w"),
    )
    if not g.directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    out_adj = e.localCheckpoint(eager=True)
    in_adj = (
        out_adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        .localCheckpoint(eager=True)
        if g.directed
        else out_adj
    )

    dist = {
        0: spark.createDataFrame([(source, 0.0)], "id long, dist double"),
        1: spark.createDataFrame([(target, 0.0)], "id long, dist double"),
    }
    frontier = dict(dist)
    for k in dist:
        dist[k] = ckpt.cut(dist[k], k)
    best = INF
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        mins = {}
        for sd, adj in ((0, out_adj), (1, in_adj)):
            if frontier[sd] is None:
                mins[sd] = INF
                continue
            m = frontier[sd].agg(F.min("dist")).first()[0]
            mins[sd] = INF if m is None else float(m)
        if mins[0] + mins[1] >= best:
            break
        progressed = False
        for sd, adj in ((0, out_adj), (1, in_adj)):
            if frontier[sd] is None or mins[sd] == INF:
                continue
            relax = (
                frontier[sd]
                .join(adj, frontier[sd]["id"] == adj["src"])
                .select(
                    F.col("dst").alias("id"),
                    (F.col("dist") + F.col("w")).alias("nd"),
                )
                .groupBy("id")
                .agg(F.min("nd").alias("nd"))
            )
            improved = (
                relax.join(dist[sd], "id", "left")
                .filter(
                    F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
                )
                .select("id", F.col("nd").alias("dist"))
            )
            improved = ckpt.cut(improved, 10 * rounds + sd)
            if improved.isEmpty():
                frontier[sd] = None
                continue
            progressed = True
            dist[sd] = ckpt.cut(
                dist[sd]
                .join(improved, "id", "left_anti")
                .unionByName(improved),
                100 * rounds + sd,
            )
            frontier[sd] = improved
        # meeting bound
        meet = (
            dist[0]
            .select("id", F.col("dist").alias("d0"))
            .join(dist[1].select("id", F.col("dist").alias("d1")), "id")
            .agg(F.min(F.col("d0") + F.col("d1")))
            .first()[0]
        )
        if meet is not None:
            best = min(best, float(meet))
        if not progressed:
            break
    return best


def all_simple_paths(
    g: Graph,
    source: int,
    target: int,
    cutoff: int,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(path array<long>, length) of every simple source->target path
    with at most ``cutoff`` edges (AllSimplePaths.cpp semantics; the
    reference's DFS enumerates the identical set).  Frontier joins with
    an array_contains simplicity guard; the frontier relation IS the
    open-path set, so memory tracks the answer size."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    adj = g.adj().select("src", "dst").localCheckpoint(eager=True)
    open_paths = spark.createDataFrame(
        [(source,)], "tail long"
    ).select(F.array(F.col("tail")).cast("array<long>").alias("path"), "tail")
    found = []
    for step in range(cutoff):
        ext = (
            open_paths.join(adj, open_paths["tail"] == adj["src"])
            .filter(~F.array_contains(F.col("path"), F.col("dst")))
            .select(
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                F.col("dst").alias("tail"),
            )
        )
        ext = ckpt.cut(ext, step)
        found.append(
            ext.filter(F.col("tail") == target).select(
                "path", F.lit(step + 1).cast("long").alias("length")
            )
        )
        open_paths = ext.filter(F.col("tail") != target)
        if open_paths.isEmpty():
            break
    out = found[0]
    for f in found[1:]:
        out = out.unionByName(f)
    return out.select("path", "length")
