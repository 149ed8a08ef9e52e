"""ComplexPathAlgorithm — complex-contagion path metrics.

Reference: /root/reference/networkit/cpp/centrality/ComplexPaths.cpp
(Guilbeault & Centola, Nat Commun 12, 4430 (2021)):

- generateSeeds (:88-123): the seed plus ``threshold - 1`` neighbors
  sampled uniformly; when the seed has too few neighbors the remainder
  is sampled from the distance-2 multiset.
- complexPathsGraph (:126-171): starting from the seed set, a node
  u activates once its *influence* — its degree in the growing complex
  graph — reaches ``threshold``; the complex graph holds every original
  edge incident to an activated (emitter) node.  Because influence is
  recomputed only after a full sweep, the process is the synchronous
  fixpoint  E_{k+1} = E_k ∪ { u : |N(u) ∩ E_k| ≥ threshold },
  and the final complex graph is { (u,v) ∈ G : u ∈ E or v ∈ E }.
- complexPathLength (:185-211): PLci(u) = (Σ_v dist_complex(u, v)) / n
  with unreachable distances contributing 0, over the complex graph
  seeded at u; optional min-max normalization (:173-183).

Documented deviations: the neighbor sample is md5-derandomized (rank
by md5("cpx|seed|nbr"), smallest first, ties on id) and the distance-2
fallback samples the DISTINCT distance-2 node set under the same
ranking (the reference samples the multiset with repetition via
std::sample); both engines of the gate replay the identical draw.

Spark-first shape: the contagion is a superstep loop whose state is the
(tag, id, round) activation relation — one adjacency join + count
aggregation per round, map-side combinable, no windows — and the BFS
over the complex graph filters edges with two broadcast-able activation
flag joins instead of materializing a per-tag edge list.  The all-nodes
PLci mode tags every source at once (state O(sources · n), the same
relation a 1000-executor cluster would shard by tag); at 100 TB you run
it for a landmark sample, exactly like the reference's own
parallelForNodes loop would be budgeted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.scdlocal import _lit_df
from networkit_spark.plans.superstep import cut_lineage, materialize_partitioned

CPX_SALT = "cpx"


def generate_seeds(g: Graph, seed: int, threshold: int) -> list[int]:
    """[seed] + (threshold-1) md5-ranked neighbors, distance-2 fallback
    (ComplexPaths.cpp:88-123, md5-derandomized)."""
    if threshold < 1:
        raise ValueError("threshold must be greater than 0")
    adj = g.adj().select("src", "dst")
    need = threshold - 1
    nbrs = (
        adj.filter(F.col("src") == seed)
        .select("dst")
        .withColumn(
            "r",
            F.md5(F.concat_ws("|", F.lit(f"{CPX_SALT}|{seed}"), F.col("dst"))),
        )
        .orderBy("r", "dst")
        .limit(need)
        .collect()
    )
    picked = [int(row["dst"]) for row in nbrs]
    if len(picked) < need:
        have = set(picked) | {seed}
        extra = (
            adj.filter(F.col("src") == seed)
            .select(F.col("dst").alias("mid"))
            .join(adj.withColumnRenamed("src", "mid"), "mid")
            .select("dst")
            .distinct()
            .filter(~F.col("dst").isin(*sorted(have)))
            .withColumn(
                "r",
                F.md5(
                    F.concat_ws(
                        "|", F.lit(f"{CPX_SALT}|{seed}|2"), F.col("dst")
                    )
                ),
            )
            .orderBy("r", "dst")
            .limit(need - len(picked))
            .collect()
        )
        picked += [int(row["dst"]) for row in extra]
    return [seed] + picked


def complex_contagion(
    g: Graph, seeds, threshold: int, max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """((id, round) activation relation, rounds) — synchronous threshold
    fixpoint E_{k+1} = E_k ∪ {u : |N(u) ∩ E_k| ≥ threshold}."""
    spark = g.edges.sparkSession
    adj = materialize_partitioned(g.adj().select("src", "dst"), "dst")
    # evolving state MUST cut lineage every round (the nxt plan embeds
    # act ~3x — union + count-join + anti-join — so an uncut loop grows
    # the logical plan 3^rounds; persist alone does not truncate it)
    act = cut_lineage(_lit_df(spark, seeds).withColumn("round", F.lit(0)))
    n_act = act.count()
    rounds = 0
    for r in range(1, max_rounds + 1):
        cnt = (
            adj.join(act.select(F.col("id").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        new = (
            cnt.filter(F.col("c") >= threshold)
            .select(F.col("src").alias("id"))
            .join(act, "id", "left_anti")
            .withColumn("round", F.lit(r))
        )
        nxt = cut_lineage(act.unionByName(new))
        n_nxt = nxt.count()
        grew = n_nxt > n_act
        act, n_act = nxt, n_nxt
        rounds = r  # counts executed sweeps incl. the no-growth check
        if not grew:
            break
    else:
        raise AssertionError(
            f"complex contagion did not converge in {max_rounds} rounds"
        )
    adj.unpersist()
    return act, rounds


def complex_path_graph(
    g: Graph, seed: int, threshold: int, max_rounds: int = 64
) -> tuple[DataFrame, DataFrame, int]:
    """(adopters(id, round), complex edges(src, dst), rounds) —
    single-node mode of ComplexPaths.cpp:126-171."""
    seeds = generate_seeds(g, seed, threshold)
    act, rounds = complex_contagion(g, seeds, threshold, max_rounds)
    canon = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()
    flags = act.select("id")
    ce = (
        canon.join(
            flags.withColumnRenamed("id", "src").withColumn("sa", F.lit(1)),
            "src",
            "left",
        )
        .join(
            flags.withColumnRenamed("id", "dst").withColumn("da", F.lit(1)),
            "dst",
            "left",
        )
        .filter(F.col("sa").isNotNull() | F.col("da").isNotNull())
        .select("src", "dst")
    )
    return act, ce, rounds


def _tagged_bfs_restricted(
    adj: DataFrame, act: DataFrame, sources: DataFrame, max_depth: int = 128
) -> DataFrame:
    """(tag, id, dist) BFS over the per-tag complex graph: an edge is
    usable for ``tag`` iff either endpoint is activated for that tag."""
    a_src = act.select("tag", F.col("id").alias("src"), F.lit(1).alias("sa"))
    a_dst = act.select("tag", F.col("id").alias("dst"), F.lit(1).alias("da"))
    # act is per-call state reused every level — materialize the two flag
    # views once; dist/frontier are evolving state and cut lineage per level
    a_src = materialize_partitioned(a_src, "src")
    a_dst = materialize_partitioned(a_dst, "dst")
    dist = cut_lineage(sources.select("tag", "id", F.lit(0).alias("dist")))
    frontier = dist
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(adj, frontier.id == adj.src)
            .select("tag", "src", "dst")
            .join(a_src, ["tag", "src"], "left")
            .join(a_dst, ["tag", "dst"], "left")
            .filter(F.col("sa").isNotNull() | F.col("da").isNotNull())
            .select("tag", F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("tag", "id"), ["tag", "id"], "left_anti")
            .withColumn("dist", F.lit(d))
        )
        nxt = cut_lineage(nxt)
        if nxt.count() == 0:
            break
        dist = cut_lineage(dist.unionByName(nxt))
        frontier = nxt
    else:
        raise AssertionError(f"complex BFS exceeded {max_depth} levels")
    return dist


def complex_path_lengths(
    g: Graph,
    threshold: int,
    sources=None,
    normalize: bool = False,
    max_rounds: int = 64,
    max_depth: int = 128,
) -> DataFrame:
    """(id, plci) — all-nodes mode (ComplexPaths.cpp:185-211): for each
    source, run the md5-derandomized contagion, BFS its complex graph,
    PLci = Σ dist / n (unreachable → 0).  ``sources`` bounds the tag
    set (default: every node — the fixture-scale exact form)."""
    spark = g.edges.sparkSession
    n = g.number_of_nodes()
    adj = materialize_partitioned(g.adj().select("src", "dst"), "src")
    if sources is None:
        src_df = g.nodes().select(F.col("id").alias("tag"))
    else:
        src_df = _lit_df(spark, sources, "tag")

    need = threshold - 1
    # (tag, id) seed relation: the source itself + md5-argmin neighbors,
    # drawn need times via iterated struct-min (no per-tag sort window).
    seeds = src_df.select("tag", F.col("tag").alias("id"))
    cand = (
        adj.withColumnRenamed("src", "tag")
        .withColumn(
            "r",
            F.md5(
                F.concat_ws("|", F.lit(CPX_SALT), F.col("tag"), F.col("dst"))
            ),
        )
        .join(src_df, "tag", "left_semi")
    )
    for _ in range(need):
        pick = (
            cand.join(seeds.withColumnRenamed("id", "dst"),
                      ["tag", "dst"], "left_anti")
            .groupBy("tag")
            .agg(F.min(F.struct("r", "dst")).alias("m"))
            .select("tag", F.col("m.dst").alias("id"))
        )
        seeds = cut_lineage(seeds.unionByName(pick))
    seeds = cut_lineage(seeds.distinct())

    # tagged synchronous contagion (evolving state: cut lineage per round)
    act = cut_lineage(seeds.withColumn("round", F.lit(0)))
    n_act = act.count()
    for r in range(1, max_rounds + 1):
        cnt = (
            act.select("tag", F.col("id").alias("dst"))
            .join(adj, "dst")
            .groupBy("tag", "src")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        new = (
            cnt.filter(F.col("c") >= threshold)
            .select("tag", F.col("src").alias("id"))
            .join(act.select("tag", "id"), ["tag", "id"], "left_anti")
            .withColumn("round", F.lit(r))
        )
        nxt = cut_lineage(act.unionByName(new))
        n_nxt = nxt.count()
        grew = n_nxt > n_act
        act, n_act = nxt, n_nxt
        if not grew:
            break
    else:
        raise AssertionError(
            f"complex contagion did not converge in {max_rounds} rounds"
        )

    dist = _tagged_bfs_restricted(
        adj, act.select("tag", "id"),
        src_df.select("tag", F.col("tag").alias("id")), max_depth
    )
    plci = (
        src_df.join(
            dist.groupBy("tag").agg(F.sum("dist").alias("s")), "tag", "left"
        )
        .select(
            F.col("tag").alias("id"),
            (F.coalesce(F.col("s"), F.lit(0)) / F.lit(float(n))).alias("plci"),
        )
    )
    if normalize:
        lo, hi = plci.agg(F.min("plci"), F.max("plci")).collect()[0]
        span = (hi - lo) or 1.0
        plci = plci.select(
            "id", ((F.col("plci") - F.lit(lo)) / F.lit(span)).alias("plci")
        )
    return plci
