"""Per-node structural centralities + Luby independent set.

References:
- /root/reference/networkit/cpp/centrality/Sfigality.cpp (:15-28 —
  fraction of neighbours with strictly higher degree).
- /root/reference/networkit/cpp/centrality/LocalPartitionCoverage.cpp
  (:11-29 — weighted fraction of same-partition neighbours).
- /root/reference/networkit/cpp/centrality/LaplacianCentrality.cpp
  (:15-41 — energy drop when removing u:
  wd(u)^2 + sum_{v~u} w(uv) * (w(uv) + 2 wd(v)); normalized divides by
  the total Laplacian energy sum wd^2 + sum w^2 over both arc
  directions.  The reference truncates wd(u) to an integer ``count``
  before squaring — identical for integer weights, which is the only
  case its own tests cover; we keep doubles).
- /root/reference/networkit/cpp/centrality/
  LocalSquareClusteringCoefficient.cpp (:20-49 — per node u, over
  neighbour pairs (v, w): squares += |N(v) cap N(w)| - 1 and
  potential += deg(v) + deg(w) - |N(v) cap N(w)| - 1 - 2*[v~w];
  score = squares / potential).
- /root/reference/networkit/cpp/independentset/Luby.cpp (:14-94 —
  rounds of: draw S with per-node probability 1/(2 wdeg'(u)) over the
  ACTIVE graph, drop the smaller-weighted-degree endpoint of every
  S-edge, add the survivors to I, deactivate them and their
  neighbours).

Spark-first: the first four are single join+aggregation pipelines over
the adjacency (squares adds the common-neighbour pair join — the same
wedge shape as triangle counting).  Luby is a superstep loop whose
draws are md5-derandomized (frac = first-13-hex-nibbles / 2^52, the
randomization.py convention) so the DuckDB oracle replays rounds
exactly; its conflict rule is applied ONE-SHOT over the original S of
the round (the reference resolves pairs sequentially under an OpenMP
critical section, which is schedule-dependent — documented deviation;
both rules drop at least one endpoint of every S-edge, so S' is always
independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import materialize_partitioned

TWO52 = float(1 << 52)


def _klong(*cols):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 13), 16, 10
    ).cast("long")


def sfigality(g: Graph) -> DataFrame:
    """(id, score) — deviation: isolated nodes score 0.0 (the reference
    computes 0/0 = NaN for them)."""
    deg = g.degrees().select("id", "degree")
    adj = g.adj().select("src", "dst")
    hi = (
        adj.join(deg.withColumnRenamed("id", "src")
                 .withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("degree", "dv"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(F.when(F.col("du") < F.col("dv"), 1).otherwise(0))
            .alias("sf"),
            F.count("*").alias("d"),
        )
        .select("id", (F.col("sf") / F.col("d")).alias("score"))
    )
    return (
        g.nodes().join(hi, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def local_partition_coverage(g: Graph, labels: DataFrame) -> DataFrame:
    """(id, score) — labels is an (id, label) partition."""
    lab = labels.select("id", "label")
    adj = g.adj()
    cov = (
        adj.join(lab.withColumnRenamed("id", "src")
                 .withColumnRenamed("label", "lu"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "lv"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(F.when(F.col("lu") == F.col("lv"), F.col("weight"))
                  .otherwise(0.0)).alias("same"),
            F.sum("weight").alias("wd"),
        )
        .select(
            "id",
            F.when(F.col("same") > 0, F.col("same") / F.col("wd"))
            .otherwise(0.0).alias("score"),
        )
    )
    return (
        g.nodes().join(cov, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def laplacian_centrality(g: Graph, normalized: bool = False) -> DataFrame:
    """(id, score)."""
    adj = g.adj()
    wd = adj.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wd")
    )
    loss = (
        adj.join(wd.withColumnRenamed("id", "dst")
                 .withColumnRenamed("wd", "wd_v"), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(
                F.col("weight") * (F.col("weight") + 2.0 * F.col("wd_v"))
            ).alias("nloss")
        )
    )
    out = (
        g.nodes()
        .join(wd, "id", "left")
        .join(loss, "id", "left")
        .select(
            "id",
            (
                F.coalesce("wd", F.lit(0.0))
                * F.coalesce("wd", F.lit(0.0))
                + F.coalesce("nloss", F.lit(0.0))
            ).alias("score"),
        )
    )
    if not normalized:
        return out
    total = (
        wd.agg(F.sum(F.col("wd") * F.col("wd")).alias("a")).collect()[0]["a"]
        or 0.0
    ) + (
        adj.agg(F.sum(F.col("weight") * F.col("weight")).alias("b"))
        .collect()[0]["b"]
        or 0.0
    )
    return out.select("id", (F.col("score") / F.lit(float(total)))
                      .alias("score"))


def local_square_clustering(g: Graph) -> DataFrame:
    """(id, score) — undirected simple graphs, like the reference."""
    if g.directed:
        raise RuntimeError(
            "Not implemented: Local square clustering coefficient is "
            "currently not implemented for directed graphs"
        )
    gg = g.remove_self_loops()
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    deg = adj.groupBy(F.col("src").alias("n")).agg(
        F.count("*").alias("d")
    )
    # neighbour pairs of u (v < w)
    pairs = (
        adj.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            adj.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            "u",
        )
        .filter(F.col("v") < F.col("w"))
    )
    dpairs = pairs.select("v", "w").distinct()
    cn = (
        dpairs.join(adj.select(F.col("src").alias("v"),
                               F.col("dst").alias("z")), "v")
        .join(adj.select(F.col("src").alias("w"),
                         F.col("dst").alias("z")), ["w", "z"])
        .groupBy("v", "w")
        .agg(F.count("*").alias("cn"))
    )
    canon = gg.edges.select(
        F.least("src", "dst").alias("v"), F.greatest("src", "dst").alias("w")
    ).distinct().withColumn("has_e", F.lit(1))
    scored = (
        pairs.join(cn, ["v", "w"], "left")
        .join(canon, ["v", "w"], "left")
        .join(deg.withColumnRenamed("n", "v")
              .withColumnRenamed("d", "dv"), "v")
        .join(deg.withColumnRenamed("n", "w")
              .withColumnRenamed("d", "dw"), "w")
        .groupBy(F.col("u").alias("id"))
        .agg(
            F.sum(F.coalesce(F.col("cn"), F.lit(0)) - 1).alias("sq"),
            F.sum(
                F.col("dv") + F.col("dw")
                - F.coalesce(F.col("cn"), F.lit(0)) - 1
                - 2 * F.coalesce(F.col("has_e"), F.lit(0))
            ).alias("pot"),
        )
        .select(
            "id",
            F.when(F.col("pot") > 0, F.col("sq") / F.col("pot"))
            .otherwise(F.lit(0.0)).alias("score"),
        )
    )
    return (
        gg.nodes().join(scored, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def luby(
    g: Graph, seed: int = 42, max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """((id, in_set), rounds) — md5-derandomized Luby maximal
    independent set.  Raises if the active set is nonempty after
    ``max_rounds`` (the oracle unrolls exactly that many rounds)."""
    if g.directed:
        raise RuntimeError(
            "current implementation can only deal with undirected graphs"
        )
    spark = g.edges.sparkSession
    gg = g.remove_self_loops()
    adj = materialize_partitioned(
        gg.adj().select("src", "dst", "weight"), "src"
    )
    canon = adj.filter(F.col("src") < F.col("dst")).select("src", "dst")
    active = gg.nodes().localCheckpoint(eager=True)
    n_active = active.count()
    picked: list[DataFrame] = []
    rounds = 0
    for r in range(1, max_rounds + 1):
        if n_active == 0:
            break
        rounds = r
        awd = (
            adj.join(active.withColumnRenamed("id", "src"), "src",
                     "left_semi")
            .join(active.withColumnRenamed("id", "dst"), "dst",
                  "left_semi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("weight").alias("wd"))
        )
        stat = (
            active.join(awd, "id", "left")
            .select("id", F.coalesce("wd", F.lit(0.0)).alias("wd"))
        )
        frac = _klong(F.lit(f"luby|{seed}|{r}"), F.col("id")) / F.lit(TWO52)
        s0 = (
            stat.withColumn(
                "pick",
                F.when(F.col("wd") == 0.0, F.lit(True)).otherwise(
                    frac < 1.0 / (2.0 * F.col("wd"))
                ),
            )
            .filter("pick")
            .select("id", "wd")
            .localCheckpoint(eager=True)
        )
        # one-shot conflict resolution over the round's original S
        se = (
            canon
            .join(s0.select(F.col("id").alias("src"),
                            F.col("wd").alias("wd_u")), "src")
            .join(s0.select(F.col("id").alias("dst"),
                            F.col("wd").alias("wd_v")), "dst")
        )
        losers = se.select(
            F.when(F.col("wd_u") > F.col("wd_v"), F.col("dst"))
            .otherwise(F.col("src")).alias("id")
        ).distinct()
        sprime = s0.select("id").join(losers, "id", "left_anti") \
            .localCheckpoint(eager=True)
        picked.append(sprime)
        dropped = (
            sprime.unionByName(
                adj.join(sprime.withColumnRenamed("id", "src"), "src",
                         "left_semi").select(F.col("dst").alias("id"))
            )
            .distinct()
        )
        active = active.join(dropped, "id", "left_anti") \
            .localCheckpoint(eager=True)
        n_active = active.count()
    if n_active > 0:
        raise AssertionError(
            f"Luby did not converge within {max_rounds} rounds"
        )
    chosen = picked[0] if picked else spark.createDataFrame([], "id long")
    for extra in picked[1:]:
        chosen = chosen.unionByName(extra)
    out = (
        gg.nodes()
        .join(chosen.withColumn("m", F.lit(1)), "id", "left")
        .select("id", (F.col("m").isNotNull()).alias("in_set"))
    )
    adj.unpersist()
    return out, rounds


def permanence_centrality(g: Graph, labels: DataFrame) -> DataFrame:
    """(id, permanence) — PermanenceCentrality.cpp:15-157:
    perm(u) = intdeg(u) / max_ext(u) / deg(u) - (1 - intra_cc(u)),
    max_ext = the largest SINGLE-community external neighbour count (1
    when u has no external neighbours), intra_cc = edges among u's
    same-community neighbours over k(k-1)/2 (0 when k < 2).  Joins over
    the label-tagged adjacency + the same wedge shape as square
    clustering."""
    gg = g.remove_self_loops()
    lab = labels.select("id", "label")
    adj = materialize_partitioned(gg.adj().select("src", "dst"), "src")
    tagged = (
        adj.join(lab.withColumnRenamed("id", "src")
                 .withColumnRenamed("label", "own"), "src")
        .join(lab.withColumnRenamed("id", "dst")
              .withColumnRenamed("label", "lv"), "dst")
    )
    per_label = tagged.groupBy(
        F.col("src").alias("id"), F.col("own").alias("own"),
        F.col("lv").alias("lv"),
    ).agg(F.count("*").alias("cnt"))
    base = per_label.groupBy("id").agg(
        F.coalesce(
            F.sum(F.when(F.col("lv") == F.col("own"), F.col("cnt"))),
            F.lit(0),
        ).alias("intdeg"),
        F.coalesce(
            F.max(F.when(F.col("lv") != F.col("own"), F.col("cnt"))),
            F.lit(0),
        ).alias("max_ext"),
        F.sum("cnt").alias("deg"),
    )
    # edges among same-community neighbours of u
    same_nbr = tagged.filter(F.col("own") == F.col("lv")).select(
        F.col("src").alias("u"), F.col("dst").alias("x")
    )
    canon = gg.edges.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    ).distinct()
    tri = (
        same_nbr
        .join(same_nbr.withColumnRenamed("x", "y"), "u")
        .filter(F.col("x") < F.col("y"))
        .join(canon, ["x", "y"], "left_semi")
        .groupBy("u")
        .agg(F.count("*").alias("ntri"))
    )
    out = (
        gg.nodes()
        .join(base, "id", "left")
        .join(tri.withColumnRenamed("u", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("intdeg", F.lit(0)).alias("intdeg"),
            F.greatest(F.coalesce("max_ext", F.lit(0)), F.lit(1))
            .alias("max_ext"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("ntri", F.lit(0)).alias("ntri"),
        )
        .withColumn(
            "icc",
            F.when(
                F.col("intdeg") >= 2,
                F.col("ntri")
                / (0.5 * F.col("intdeg") * (F.col("intdeg") - 1)),
            ).otherwise(0.0),
        )
        .select(
            "id",
            F.when(
                F.col("deg") > 0,
                F.col("intdeg") / F.col("max_ext") / F.col("deg")
                - (1.0 - F.col("icc")),
            ).otherwise(0.0).alias("permanence"),
        )
    )
    adj.unpersist()
    return out
