"""Degree-preserving randomization null models.

Reference: /root/reference/networkit/cpp/randomization/EdgeSwitching.cpp
(:10-51 — repeated random 2-edge switches (a,b)+(c,d) -> (a,d)+(c,b),
rejecting self-loops and multi-edges, preserving every degree) and
GlobalCurveball.cpp (global trade rounds — the same null model reached
by whole-round batches).

The reference switches one edge pair at a time against the live graph —
inherently sequential.  This module implements the BATCHED round
variant (documented deviation, same stationary family): per round,
every edge gets an md5 rank, edges are paired within hash buckets, each
pair proposes one of the two switch orientations by an md5 coin, and a
proposal is applied iff
  (1) it creates no self-loop,
  (2) neither created edge exists in the PRE-ROUND edge set, and
  (3) neither created edge is proposed by any other pair this round
      (intra-batch collision -> all involved pairs rejected,
       order-independent).
Applied switches replace both original edges; everything else carries
over.  Each round is two hash aggregations + windows PARTITIONED BY
BUCKET (no global sort, no single-partition window) — scale-safe, and
every draw is md5-derived so the DuckDB oracle replays rounds exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def _klong(*cols):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 13), 16, 10
    ).cast("long")


def edge_switching(
    g: Graph,
    rounds: int = 3,
    seed: int = 42,
    buckets: int = 64,
    checkpointer: Checkpointer | None = None,
) -> tuple[Graph, int]:
    """(randomized graph, number of applied switches).

    Undirected simple graphs only (the reference's model).  The degree
    sequence is preserved exactly; tests assert it.
    """
    if g.directed:
        raise ValueError("edge_switching supports undirected graphs only")
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    edges = (
        g.remove_self_loops()
        .edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    applied_total = 0
    for r in range(1, rounds + 1):
        keyed = edges.select(
            "src",
            "dst",
            _klong(F.lit(f"{seed}|{r}"), F.col("src"), F.col("dst")).alias("k"),
        ).withColumn("bucket", F.col("k") % buckets)
        w = Window.partitionBy("bucket").orderBy("k", "src", "dst")
        ranked = keyed.withColumn("rn", F.row_number().over(w) - 1)
        ranked = ranked.withColumn(
            "pid", F.floor(F.col("rn") / 2)
        ).withColumn("side", F.col("rn") % 2)
        e0 = ranked.filter(F.col("side") == 0).select(
            "bucket", "pid", F.col("src").alias("a"), F.col("dst").alias("b")
        )
        e1 = ranked.filter(F.col("side") == 1).select(
            "bucket", "pid", F.col("src").alias("c"), F.col("dst").alias("d")
        )
        coin = _klong(
            F.lit(f"{seed}|c|{r}"), F.col("bucket"), F.col("pid")
        ) % 2
        prop = (
            e0.join(e1, ["bucket", "pid"])
            .withColumn("coin", coin)
            .withColumn(
                "n1s",
                F.when(F.col("coin") == 0, F.least("a", "d")).otherwise(
                    F.least("a", "c")
                ),
            )
            .withColumn(
                "n1d",
                F.when(F.col("coin") == 0, F.greatest("a", "d")).otherwise(
                    F.greatest("a", "c")
                ),
            )
            .withColumn(
                "n2s",
                F.when(F.col("coin") == 0, F.least("c", "b")).otherwise(
                    F.least("b", "d")
                ),
            )
            .withColumn(
                "n2d",
                F.when(F.col("coin") == 0, F.greatest("c", "b")).otherwise(
                    F.greatest("b", "d")
                ),
            )
            .filter(
                (F.col("n1s") != F.col("n1d"))
                & (F.col("n2s") != F.col("n2d"))
                & ~((F.col("n1s") == F.col("n2s")) & (F.col("n1d") == F.col("n2d")))
            )
        )
        # reject proposals whose created edges already exist pre-round
        ex1 = edges.select(
            F.col("src").alias("n1s"), F.col("dst").alias("n1d"),
            F.lit(1).alias("x1"),
        )
        ex2 = edges.select(
            F.col("src").alias("n2s"), F.col("dst").alias("n2d"),
            F.lit(1).alias("x2"),
        )
        prop = (
            prop.join(ex1, ["n1s", "n1d"], "left")
            .join(ex2, ["n2s", "n2d"], "left")
            .filter(F.col("x1").isNull() & F.col("x2").isNull())
            .drop("x1", "x2")
        )
        # intra-batch collisions: any created edge proposed twice kills
        # every pair that proposed it
        created = prop.select(
            "bucket", "pid", F.col("n1s").alias("s"), F.col("n1d").alias("t")
        ).unionByName(
            prop.select("bucket", "pid", F.col("n2s").alias("s"),
                        F.col("n2d").alias("t"))
        )
        dup = (
            created.groupBy("s", "t")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") > 1)
        )
        bad = (
            created.join(dup.select("s", "t"), ["s", "t"])
            .select("bucket", "pid")
            .distinct()
        )
        applied = prop.join(bad, ["bucket", "pid"], "left_anti")
        applied = ckpt.cut(applied, r)
        n_applied = applied.count()
        applied_total += n_applied
        removed = applied.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(applied.select(F.col("c").alias("src"),
                                     F.col("d").alias("dst")))
        added = applied.select(
            F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionByName(applied.select(F.col("n2s").alias("src"),
                                     F.col("n2d").alias("dst")))
        edges = ckpt.cut(
            edges.join(removed, ["src", "dst"], "left_anti").unionByName(added),
            100 + r,
        )
    out = Graph(
        edges.withColumn("weight", F.lit(1.0)),
        vertices=g.vertices,
        directed=False,
        weighted=False,
    )
    return out, applied_total


def degree_preserving_shuffle(
    g: Graph, seed: int = 42
) -> tuple[DataFrame, Graph]:
    """(mapping (id, new_id), permuted graph).

    Reference: /root/reference/networkit/cpp/randomization/
    DegreePreservingShuffle.cpp (:20-120 — group nodes by degree
    (undirected) or (in, out) degree pair (directed) and uniformly
    permute ids WITHIN each class; the permuted graph has the exact
    same per-node degree sequence).

    Distributed derandomized form: within each class, the node with the
    j-th smallest md5(seed|id) key receives the id of the node with the
    j-th smallest id. Ranks come from two :func:`dense_ids` passes with
    the class as leading sort key (per-class rank = global rank minus
    the class minimum) — no per-class global-sort window, so a web
    graph's giant degree-1 class never lands in one task.
    """
    from networkit_spark.plans.ids import dense_ids

    nodes = g.nodes()
    if g.directed:
        din = g.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("din")
        )
        dout = g.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("dout")
        )
        cls = (
            nodes.join(din, "id", "left")
            .join(dout, "id", "left")
            .select(
                "id",
                F.coalesce("din", F.lit(0)).alias("c1"),
                F.coalesce("dout", F.lit(0)).alias("c2"),
            )
        )
    else:
        cls = g.degrees().select(
            "id", F.col("degree").alias("c1"), F.lit(0).alias("c2")
        )
    keyed = cls.withColumn(
        "rnd", F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id")))
    )
    byrnd = dense_ids(keyed, ["c1", "c2", "rnd", "id"], "gr")
    byid = dense_ids(keyed.select("id", "c1", "c2"), ["c1", "c2", "id"], "gi")
    a = byrnd.join(
        byrnd.groupBy("c1", "c2").agg(F.min("gr").alias("m")), ["c1", "c2"]
    ).select("id", "c1", "c2", (F.col("gr") - F.col("m")).alias("rk"))
    b = byid.join(
        byid.groupBy("c1", "c2").agg(F.min("gi").alias("m")), ["c1", "c2"]
    ).select(
        F.col("id").alias("new_id"),
        "c1",
        "c2",
        (F.col("gi") - F.col("m")).alias("rk"),
    )
    mapping = a.join(b, ["c1", "c2", "rk"]).select("id", "new_id")
    msrc = mapping.select(
        F.col("id").alias("src"), F.col("new_id").alias("nsrc")
    )
    mdst = mapping.select(
        F.col("id").alias("dst"), F.col("new_id").alias("ndst")
    )
    edges = (
        g.edges.join(msrc, "src")
        .join(mdst, "dst")
        .select(
            F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "weight"
        )
    )
    if not g.directed:
        edges = edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
    return mapping, Graph(
        edges, vertices=g.vertices, directed=g.directed, weighted=g.weighted
    )


def global_curveball(
    g: Graph,
    rounds: int = 3,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> Graph:
    """Degree-preserving GlobalCurveball null model.

    Reference: /root/reference/networkit/cpp/randomization/
    GlobalCurveball.cpp + GlobalCurveballImpl.hpp (each global trade
    round pairs every node with a partner and, per pair (u, v), keeps
    the common neighborhood and the u-v edge fixed while uniformly
    redistributing the disjoint neighbors, preserving both degrees).

    Batched deterministic variant (documented deviation — same
    stationary degree-preserving family, like :func:`edge_switching`):
    per round, nodes are paired by md5 rank; every inter-pair edge is
    OWNED by exactly one of its endpoints' pairs (md5 coin), so no two
    trades move the same edge; an owned neighbor y of pair (u, v) is
    tradeable iff the other pair node has no edge to y (the common
    neighborhood stays fixed, and reassignment can never recreate an
    existing edge); tradeable items are ranked per pair by md5 and the
    first c_u (u's original tradeable count) go to u, the rest to v.
    The one remaining conflict — two different pairs simultaneously
    CREATING the same edge — reverts both pairs' whole trades
    (order-independent, degree-preserving). All ranking goes through
    :func:`~networkit_spark.plans.ids.dense_ids` (no global-sort or
    per-hub windows); each round is a bounded number of joins and hash
    aggregations over the edge set.
    """
    if g.directed:
        raise ValueError("global_curveball supports undirected graphs only")
    from networkit_spark.plans.ids import dense_ids

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes().localCheckpoint(eager=True)
    edges = (
        g.remove_self_loops()
        .edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for r in range(1, rounds + 1):
        nk = nodes.withColumn(
            "rnd",
            F.md5(F.concat_ws("|", F.lit(f"{seed}|t|{r}"), F.col("id"))),
        )
        perm = dense_ids(nk, ["rnd", "id"], "rn").select(
            "id",
            (F.col("rn") / 2).cast("long").alias("pid"),
            (F.col("rn") % 2).alias("side"),
        )
        pairs = perm.groupBy("pid").agg(
            F.max(F.when(F.col("side") == 0, F.col("id"))).alias("u"),
            F.max(F.when(F.col("side") == 1, F.col("id"))).alias("v"),
        )
        ps = perm.select(
            F.col("id").alias("src"),
            F.col("pid").alias("psrc"),
            F.col("side").alias("ssrc"),
        )
        pd_ = perm.select(
            F.col("id").alias("dst"),
            F.col("pid").alias("pdst"),
            F.col("side").alias("sdst"),
        )
        ee = edges.join(ps, "src").join(pd_, "dst")
        fixed = ee.filter(F.col("psrc") == F.col("pdst")).select("src", "dst")
        coin = _klong(F.lit(f"{seed}|o|{r}"), F.col("src"), F.col("dst")) % 2
        items = (
            ee.filter(F.col("psrc") != F.col("pdst"))
            .withColumn("coin", coin)
            .select(
                "src",
                "dst",
                F.when(F.col("coin") == 0, F.col("psrc"))
                .otherwise(F.col("pdst"))
                .alias("pid"),
                F.when(F.col("coin") == 0, F.col("ssrc"))
                .otherwise(F.col("sdst"))
                .alias("side"),
                F.when(F.col("coin") == 0, F.col("dst"))
                .otherwise(F.col("src"))
                .alias("y"),
            )
            .join(pairs, "pid")
            .withColumn(
                "o",
                F.when(F.col("side") == 0, F.col("v")).otherwise(F.col("u")),
            )
        )
        ex = edges.select(
            F.col("src").alias("xs"),
            F.col("dst").alias("xd"),
            F.lit(1).alias("x"),
        )
        items = (
            items.withColumn("ois", F.least("o", "y"))
            .withColumn("oid", F.greatest("o", "y"))
            .join(
                ex,
                (F.col("ois") == F.col("xs"))
                & (F.col("oid") == F.col("xd")),
                "left",
            )
            .withColumn("tr", F.col("o").isNotNull() & F.col("x").isNull())
            .drop("xs", "xd", "x", "ois", "oid")
        )
        items = ckpt.cut(items, 10 * r)
        blocked = items.filter(~F.col("tr")).select("src", "dst")
        trd = items.filter(F.col("tr")).withColumn(
            "prnd",
            F.md5(
                F.concat_ws(
                    "|", F.lit(f"{seed}|p|{r}"), F.col("pid"), F.col("y")
                )
            ),
        )
        cu = trd.groupBy("pid").agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cu")
        )
        ranked = dense_ids(trd, ["pid", "prnd", "y"], "gr")
        ranked = (
            ranked.join(
                ranked.groupBy("pid").agg(F.min("gr").alias("m")), "pid"
            )
            .withColumn("rk", F.col("gr") - F.col("m"))
            .join(cu, "pid")
        )
        created = ranked.withColumn(
            "w2",
            F.when(F.col("rk") < F.col("cu"), F.col("u")).otherwise(
                F.col("v")
            ),
        ).select(
            "pid",
            "src",
            "dst",
            F.least("w2", "y").alias("ns"),
            F.greatest("w2", "y").alias("nd"),
        )
        dup = (
            created.groupBy("ns", "nd")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
        )
        badp = (
            created.join(dup.select("ns", "nd"), ["ns", "nd"])
            .select("pid")
            .distinct()
        )
        good = created.join(badp, "pid", "left_anti").select(
            F.col("ns").alias("src"), F.col("nd").alias("dst")
        )
        reverted = created.join(badp, "pid", "left_semi").select("src", "dst")
        edges = ckpt.cut(
            fixed.unionByName(blocked)
            .unionByName(good)
            .unionByName(reverted),
            100 + r,
        )
    return Graph(
        edges.withColumn("weight", F.lit(1.0)),
        vertices=g.vertices,
        directed=False,
        weighted=False,
    )


def curveball_uniform_trades(
    spark, n: int, num_trades: int, seed: int = 42
) -> DataFrame:
    """(t, u, v) — CurveballUniformTradeGenerator
    (randomization/CurveballUniformTradeGenerator.cpp:12-29): numTrades
    independent uniform pairs of DISTINCT nodes.  The reference draws
    snd by rejection until != fst; the derandomized contract draws from
    the (n-1)-point complement directly (s = h % (n-1); snd = s +
    (s >= fst)) — the same uniform-over-distinct-pairs law without the
    data-dependent RNG stream."""
    if n < 2:
        raise ValueError("need at least two nodes to trade")
    t = spark.range(num_trades).select(F.col("id").alias("t"))
    fst = _klong(F.lit(f"cutg|{seed}|f"), F.col("t")) % n
    s = _klong(F.lit(f"cutg|{seed}|s"), F.col("t")) % (n - 1)
    return t.select(
        "t",
        fst.alias("u"),
        (s + (s >= fst).cast("long")).alias("v"),
    )


def curveball_global_trades(
    spark, n: int, global_rounds: int, seed: int = 42
) -> DataFrame:
    """(t, u, v) — CurveballGlobalTradeGenerator
    (randomization/CurveballGlobalTradeGenerator.cpp:13-45): per global
    round a uniform permutation of the node ids paired consecutively
    (the odd node out sits the round out), n/2 trades per round.  The
    md5 rank IS the shuffle (rank-by-random-key is the classic
    distributed Fisher-Yates); pairing is the same consecutive walk."""
    from networkit_spark.plans.ids import dense_ids

    out = None
    half = n // 2
    for run in range(global_rounds):
        nk = spark.range(n).select(F.col("id")).withColumn(
            "rnd",
            F.md5(F.concat_ws("|", F.lit(f"cgtg|{seed}|{run}"),
                              F.col("id"))),
        )
        perm = dense_ids(nk, ["rnd", "id"], "rn")
        pairs = (
            perm.filter(F.col("rn") < 2 * half)
            .groupBy((F.col("rn") / 2).cast("long").alias("p"))
            .agg(
                F.max(F.when(F.col("rn") % 2 == 0, F.col("id"))).alias("u"),
                F.max(F.when(F.col("rn") % 2 == 1, F.col("id"))).alias("v"),
            )
            .select(
                (F.col("p") + F.lit(run * half)).alias("t"), "u", "v"
            )
        )
        out = pairs if out is None else out.unionByName(pairs)
    if out is None:
        return spark.createDataFrame([], "t long, u long, v long")
    return out


def curveball(
    g: Graph,
    trades,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> Graph:
    """Curveball with a caller-supplied trade sequence.

    Reference: /root/reference/networkit/cpp/randomization/Curveball.cpp
    (+ CurveballIM) — run(trades) processes each trade (u, v)
    sequentially: the u-v edge and common neighbors stay, the disjoint
    neighbors are pooled and uniformly redistributed so u and v keep
    their degrees.

    Batched deterministic variant (the global_curveball stance,
    documented): the sequence is split into maximal node-disjoint
    prefixes (exact sequence order preserved ACROSS batches; trades in
    one batch see the same pre-batch adjacency).  Within a batch the
    trade machinery is the ownership scheme of :func:`global_curveball`
    adapted to partial pairings: an edge with exactly one traded
    endpoint is owned by that endpoint's trade, one with two traded
    endpoints by an md5 coin, one with none is fixed; an owned neighbor
    is tradeable iff the partner has no edge to it; tradeable items are
    md5-ranked per trade, the first c_u stay with u; two trades
    creating the same edge revert (order-independent).  Degrees are
    preserved exactly; every draw is md5-derived.

    ``trades``: list of (u, v) or a (t, u, v) DataFrame (consumed in
    t order; trade lists are parameter-scale driver state, exactly the
    reference's std::vector of trades)."""
    if g.directed:
        raise ValueError("curveball supports undirected graphs only")
    from networkit_spark.plans.ids import dense_ids

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    if isinstance(trades, DataFrame):
        trades = [
            (int(r["u"]), int(r["v"]))
            for r in trades.orderBy("t").collect()
        ]
    batches: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    used: set[int] = set()
    for (u, v) in trades:
        if u == v:
            raise ValueError(f"self-trade ({u}, {v})")
        if u in used or v in used:
            batches.append(cur)
            cur, used = [], set()
        cur.append((int(u), int(v)))
        used.update((u, v))
    if cur:
        batches.append(cur)
    edges = (
        g.remove_self_loops()
        .edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for r, batch in enumerate(batches, start=1):
        pairs = spark.createDataFrame(
            [(i, u, v) for i, (u, v) in enumerate(batch)],
            "pid long, u long, v long",
        )
        perm = pairs.select(
            F.col("u").alias("id"), "pid", F.lit(0).alias("side")
        ).unionByName(
            pairs.select(
                F.col("v").alias("id"), "pid", F.lit(1).alias("side")
            )
        )
        ps = perm.select(
            F.col("id").alias("src"), F.col("pid").alias("psrc"),
            F.col("side").alias("ssrc"),
        )
        pd_ = perm.select(
            F.col("id").alias("dst"), F.col("pid").alias("pdst"),
            F.col("side").alias("sdst"),
        )
        ee = edges.join(ps, "src", "left").join(pd_, "dst", "left")
        fixed = ee.filter(
            (F.col("psrc").isNull() & F.col("pdst").isNull())
            | (F.col("psrc") == F.col("pdst"))
        ).select("src", "dst")
        coin = _klong(
            F.lit(f"{seed}|ob|{r}"), F.col("src"), F.col("dst")
        ) % 2
        both = (
            F.col("psrc").isNotNull() & F.col("pdst").isNotNull()
            & (F.col("psrc") != F.col("pdst"))
        )
        use_src = (F.col("psrc").isNotNull() & F.col("pdst").isNull()) | (
            both & (coin == 0)
        )
        use_dst = (F.col("psrc").isNull() & F.col("pdst").isNotNull()) | (
            both & (coin == 1)
        )
        items = (
            ee.filter(use_src | use_dst)
            .select(
                "src", "dst",
                F.when(use_src, F.col("psrc")).otherwise(F.col("pdst"))
                .alias("pid"),
                F.when(use_src, F.col("ssrc")).otherwise(F.col("sdst"))
                .alias("side"),
                F.when(use_src, F.col("dst")).otherwise(F.col("src"))
                .alias("y"),
            )
            .join(pairs, "pid")
            .withColumn(
                "o",
                F.when(F.col("side") == 0, F.col("v"))
                .otherwise(F.col("u")),
            )
        )
        ex = edges.select(
            F.col("src").alias("xs"), F.col("dst").alias("xd"),
            F.lit(1).alias("x"),
        )
        items = (
            items.withColumn("ois", F.least("o", "y"))
            .withColumn("oid", F.greatest("o", "y"))
            .join(
                ex,
                (F.col("ois") == F.col("xs"))
                & (F.col("oid") == F.col("xd")),
                "left",
            )
            .withColumn("tr", F.col("x").isNull())
            .drop("xs", "xd", "x", "ois", "oid")
        )
        items = ckpt.cut(items, 10 * r)
        blocked = items.filter(~F.col("tr")).select("src", "dst")
        trd = items.filter(F.col("tr")).withColumn(
            "prnd",
            F.md5(
                F.concat_ws(
                    "|", F.lit(f"{seed}|pb|{r}"), F.col("pid"), F.col("y")
                )
            ),
        )
        cu = trd.groupBy("pid").agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cu")
        )
        ranked = dense_ids(trd, ["pid", "prnd", "y"], "gr")
        ranked = (
            ranked.join(
                ranked.groupBy("pid").agg(F.min("gr").alias("m")), "pid"
            )
            .withColumn("rk", F.col("gr") - F.col("m"))
            .join(cu, "pid")
        )
        created = ranked.withColumn(
            "w2",
            F.when(F.col("rk") < F.col("cu"), F.col("u"))
            .otherwise(F.col("v")),
        ).select(
            "pid", "src", "dst",
            F.least("w2", "y").alias("ns"),
            F.greatest("w2", "y").alias("nd"),
        )
        dup = (
            created.groupBy("ns", "nd")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
        )
        badp = (
            created.join(dup.select("ns", "nd"), ["ns", "nd"])
            .select("pid")
            .distinct()
        )
        good = created.join(badp, "pid", "left_anti").select(
            F.col("ns").alias("src"), F.col("nd").alias("dst")
        )
        reverted = created.join(badp, "pid", "left_semi").select(
            "src", "dst"
        )
        edges = ckpt.cut(
            fixed.unionByName(blocked)
            .unionByName(good)
            .unionByName(reverted),
            100 + r,
        )
    return Graph(
        edges.withColumn("weight", F.lit(1.0)),
        vertices=g.vertices,
        directed=False,
        weighted=False,
    )
