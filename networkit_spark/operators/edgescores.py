"""Edge-score family: quadrangles, SCAN similarity, chance-corrected
triangles, prefix-Jaccard, Simmelian overlap, multiscale, geometric
mean, normalizer / linearizer / blender / as-weight transforms, SimRank,
random scores, forest fire — plus the reference's sparsifier chains.

References (/root/reference/networkit/cpp/):
- edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp (:15-110): per-edge
  4-cycle count (the CN degree-ordered deletion there is an efficiency
  device; the semantics are quadrangles-per-edge).
- edgescores/ChibaNishizekiTriangleEdgeScore.cpp: triangles per edge —
  identical output contract to TriangleEdgeScore, already implemented
  in operators/triangles.triangle_edge_score.
- sparsification/SCANStructuralSimilarityScore.cpp (:7-20):
  (t(e)+1) / sqrt((deg(u)+1) (deg(v)+1)).
- sparsification/ChanceCorrectedTriangleScore.cpp (:16-33):
  t(e)(n-2) / ((deg(u)-1)(deg(v)-1)); 1 for degree-1 endpoints with no
  triangle, else 0.
- edgescores/PrefixJaccardScore.cpp (:20-130): rank each ego's
  incident edges by attribute descending (competition ranks, ties
  share); score(e=(u,v)) = max over rank prefixes r of
  |A_r cap B_r| / |A_r cup B_r| with the endpoints excluded.
- sparsification/SimmelianScore.cpp + SimmelianOverlapScore.cpp:
  rank neighborhoods by per-edge triangle count (strong-to-weak,
  competition ranks); overlap(e) = |{w in prefix_u(maxRank)} cap
  {w in prefix_v(maxRank)}| (the iterative matchNeighbors loop computes
  exactly this prefix intersection).
- sparsification/MultiscaleScore.cpp (:15-68): per endpoint normalize
  incident attributes, p = a(e)/sum_u; score = max over both endpoints
  of 1 - (1-p)^(deg-1).
- edgescores/GeometricMeanScore.cpp (:18-40):
  a(e) / sqrt(sum_u a * sum_v a) when a(e) > 0 else 0.
- edgescores/EdgeScoreNormalizer.cpp (:11-38): affine map of the score
  range onto [lower, upper], optionally inverted.
- edgescores/EdgeScoreLinearizer.cpp (:20-57): score = sorted position
  / (m-1) (0.5 for m = 1); random tie-break md5-derandomized here.
- edgescores/EdgeScoreBlender.cpp / EdgeScoreAsWeight.cpp: trivial
  per-edge select / reweight.
- edgescores/SimRankScore.cpp (:29-120): dense SimRank iteration
  s'(u,v) = C/(d(u)d(v)) sum_{a in N(u), b in N(v)} s(a,b), diagonal
  pinned at 1; edge score = s(u,v).
- sparsification/RandomEdgeScore.cpp (:14-23): iid U[0,1) per edge —
  md5-derandomized here (same policy as every sampling estimator).
- sparsification/RandomNodeEdgeScore.cpp (:15-80): sequential removal
  mixing uniform-edge and node-then-edge draws, score = removal
  position / m.  Inherently sequential in the reference too — run
  driver-side at fixture scale (documented), md5-derandomized.
- sparsification/ForestFireScore.cpp (:22-90): random fires burn
  unvisited-neighbor edges with continuation probability pf until a
  target fraction of edges burnt; score = burnt count / max burnt.
- sparsification/Sparsifiers.cpp (:31-137): score -> GlobalThreshold
  chains (Simmelian parametric/non-parametric, multiscale, local
  similarity, Simmelian-multiscale, random).

Spark-first shape: everything except SimRank and the two sequential
processes is a pure per-edge expression over one or two joins with the
per-node aggregate (degree or attribute sum) — codegen all the way, no
UDFs.  Rank prefixes use windows PARTITIONED BY THE EGO (bounded by
deg(ego), the same locality the reference's per-node sort needs).
SimRank keeps the sparse (u,v,s) relation and grows it through two
adjacency joins per iteration — s stays sparse while scores are far
from the fixpoint, and the plan is SQL-unrollable for the oracle.
Forest fire reuses the broadcast-CSR fan-out of operators/ust.py:
fires are the distributed axis, each fire burns locally in Arrow
batches, the driver only totals burnt edges between waves.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import triangle_edge_score


def _canon_edges(g: Graph) -> DataFrame:
    return g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()


def _deg(g: Graph) -> DataFrame:
    return g.degrees().select("id", "degree")


def _md5_u01(*cols):
    """Deterministic U[0,1) from md5 of the given columns (13 hex
    nibbles = 52 bits, exactly representable in a double)."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(1 << 52))
    )


def quadrangle_edge_score(g: Graph) -> DataFrame:
    """(src, dst, score) — 4-cycles through each edge
    (ChibaNishizekiQuadrangleEdgeScore.cpp; relational form: pairs
    (w, x) with w~v, x~u, w-x an edge, all four nodes distinct)."""
    adj = g.adj().select("src", "dst")
    canon = _canon_edges(g)
    # path u - v - w - x - u for canonical edge (u, v)
    quads = (
        canon.join(
            adj.select(F.col("src").alias("dst"), F.col("dst").alias("w")),
            "dst",
        )
        .filter((F.col("w") != F.col("src")))
        .join(
            adj.select(F.col("src").alias("w"), F.col("dst").alias("x")),
            "w",
        )
        .filter((F.col("x") != F.col("src")) & (F.col("x") != F.col("dst")))
        .join(
            adj.select(F.col("src").alias("x"), F.col("dst").alias("u2")),
            "x",
        )
        .filter(F.col("u2") == F.col("src"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    return canon.join(quads, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0)).alias("score")
    )


def scan_structural_similarity_score(
    g: Graph, triangles: DataFrame | None = None
) -> DataFrame:
    """(src, dst, score) = (t+1)/sqrt((deg(u)+1)(deg(v)+1))."""
    tri = triangles if triangles is not None else triangle_edge_score(g)
    deg = _deg(g)
    return (
        tri.withColumnRenamed("score", "t")
        .join(deg.withColumnRenamed("id", "src")
              .withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("degree", "dv"), "dst")
        .select(
            "src", "dst",
            ((F.col("t") + 1.0)
             / F.sqrt((F.col("du") + 1.0) * (F.col("dv") + 1.0))).alias("score"),
        )
    )


def chance_corrected_triangle_score(
    g: Graph, triangles: DataFrame | None = None
) -> DataFrame:
    """(src, dst, score) = t(n-2)/((du-1)(dv-1)); degree-1 fallback 1."""
    tri = triangles if triangles is not None else triangle_edge_score(g)
    n = g.number_of_nodes()
    deg = _deg(g)
    return (
        tri.withColumnRenamed("score", "t")
        .join(deg.withColumnRenamed("id", "src")
              .withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("degree", "dv"), "dst")
        .select(
            "src", "dst",
            F.when(
                F.col("t") > 0,
                F.col("t") * F.lit(float(n - 2))
                / ((F.col("du") - 1.0) * (F.col("dv") - 1.0)),
            )
            .when((F.col("du") == 1) | (F.col("dv") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def geometric_mean_score(g: Graph, attr: DataFrame) -> DataFrame:
    """(src, dst, score) = a/sqrt(sum_u a * sum_v a); 0 where a <= 0.
    ``attr``: (src, dst, att) id-canonical."""
    half = attr.select(F.col("src").alias("id"), "att").unionByName(
        attr.select(F.col("dst").alias("id"), "att")
    )
    sums = half.groupBy("id").agg(F.sum("att").alias("s"))
    return (
        attr.join(sums.withColumnRenamed("id", "src")
                  .withColumnRenamed("s", "su"), "src")
        .join(sums.withColumnRenamed("id", "dst")
              .withColumnRenamed("s", "sv"), "dst")
        .select(
            "src", "dst",
            F.when(
                F.col("att") > 0,
                F.col("att") / F.sqrt(F.col("su") * F.col("sv")),
            ).otherwise(F.lit(0.0)).alias("score"),
        )
    )


def _ego_ranks(attr: DataFrame) -> DataFrame:
    """(ego, alter, att, rnk) — competition rank (0-based, ties share)
    of each incident edge per ego, attribute DESCENDING."""
    half = attr.select(
        F.col("src").alias("ego"), F.col("dst").alias("alter"), "att"
    ).unionByName(
        attr.select(F.col("dst").alias("ego"), F.col("src").alias("alter"),
                    "att")
    )
    w = Window.partitionBy("ego").orderBy(F.desc("att"))
    return half.withColumn("rnk", F.rank().over(w) - 1)


def prefix_jaccard_score(g: Graph, attr: DataFrame) -> DataFrame:
    """(src, dst, score) — best prefix Jaccard
    (PrefixJaccardScore.cpp:20-130): rank prefixes of both ego
    neighborhoods (attribute descending, endpoints excluded), score =
    max over ranks r of |A_r cap B_r| / |A_r cup B_r|."""
    ranks = _ego_ranks(attr)
    canon = attr.select("src", "dst")
    # per (edge, alter): the rank at which the alter enters each side
    ru = canon.join(
        ranks.withColumnRenamed("ego", "src").withColumnRenamed("rnk", "r_u"),
        "src",
    ).filter(F.col("alter") != F.col("dst")).select("src", "dst", "alter", "r_u")
    rv = canon.join(
        ranks.withColumnRenamed("ego", "dst").withColumnRenamed("rnk", "r_v"),
        "dst",
    ).filter(F.col("alter") != F.col("src")).select("src", "dst", "alter", "r_v")
    ev = ru.join(rv, ["src", "dst", "alter"], "full").select(
        "src", "dst", "alter",
        (F.col("r_u").isNotNull() & F.col("r_v").isNotNull()).alias("common"),
        F.least("r_u", "r_v").alias("enter_union"),  # least/greatest skip NULLs
        F.greatest("r_u", "r_v").alias("enter_inter"),
    )
    # running counts at each event rank; Jaccard changes only there
    events = ev.select(
        "src", "dst", F.col("enter_union").alias("r"),
        F.lit(1).alias("du"), F.lit(0).alias("di"),
    ).unionByName(
        ev.filter("common").select(
            "src", "dst", F.col("enter_inter").alias("r"),
            F.lit(0).alias("du"), F.lit(1).alias("di"),
        )
    ).groupBy("src", "dst", "r").agg(
        F.sum("du").alias("du"), F.sum("di").alias("di")
    )
    w = (
        Window.partitionBy("src", "dst")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    best = (
        events.withColumn("cu", F.sum("du").over(w))
        .withColumn("ci", F.sum("di").over(w))
        .groupBy("src", "dst")
        .agg(F.max(F.col("ci") / F.col("cu")).alias("score"))
    )
    return canon.join(best, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def simmelian_overlap_score(
    g: Graph, max_rank: int, triangles: DataFrame | None = None
) -> DataFrame:
    """(src, dst, score) — Simmelian overlap: |prefix_u cap prefix_v|
    of the triangle-ranked neighborhoods at ranks <= max_rank
    (SimmelianScore.cpp getOverlap; endpoints excluded)."""
    tri = triangles if triangles is not None else triangle_edge_score(g)
    ranks = _ego_ranks(tri.withColumnRenamed("score", "att")).filter(
        F.col("rnk") <= max_rank
    )
    canon = _canon_edges(g)
    a = canon.join(
        ranks.withColumnRenamed("ego", "src"), "src"
    ).filter(F.col("alter") != F.col("dst")).select("src", "dst", "alter")
    b = canon.join(
        ranks.withColumnRenamed("ego", "dst"), "dst"
    ).filter(F.col("alter") != F.col("src")).select("src", "dst", "alter")
    inter = a.join(b, ["src", "dst", "alter"], "left_semi").groupBy(
        "src", "dst"
    ).agg(F.count(F.lit(1)).cast("double").alias("score"))
    return canon.join(inter, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def multiscale_score(g: Graph, attr: DataFrame) -> DataFrame:
    """(src, dst, score) = max over endpoints of 1-(1-p)^(deg-1),
    p = att / sum of att at that endpoint (MultiscaleScore.cpp)."""
    deg = _deg(g)
    half = attr.select(
        F.col("src").alias("ego"), F.col("dst").alias("alter"), "att"
    ).unionByName(
        attr.select(F.col("dst").alias("ego"), F.col("src").alias("alter"),
                    "att")
    )
    sums = half.groupBy("ego").agg(F.sum("att").alias("s"))
    probs = (
        half.join(sums, "ego")
        .join(deg.withColumnRenamed("id", "ego"), "ego")
        .select(
            F.least("ego", "alter").alias("src"),
            F.greatest("ego", "alter").alias("dst"),
            (
                1.0
                - F.pow(
                    1.0 - F.col("att") / F.col("s"),
                    F.col("degree").cast("double") - 1.0,
                )
            ).alias("p"),
        )
    )
    return probs.groupBy("src", "dst").agg(F.max("p").alias("score"))


def edge_score_normalizer(
    g: Graph,
    attr: DataFrame,
    invert: bool = False,
    lower: float = 0.0,
    upper: float = 1.0,
) -> DataFrame:
    """Affine range map onto [lower, upper]
    (EdgeScoreNormalizer.cpp:11-38)."""
    lo, hi = attr.agg(F.min("att"), F.max("att")).first()
    lo, hi = float(lo), float(hi)
    factor = (upper - lower) / (hi - lo) if hi != lo else 0.0
    offset = lower - lo * factor
    if invert:
        factor = -factor
        offset = upper - lo * factor
    return attr.select(
        "src", "dst",
        (F.lit(factor) * F.col("att") + F.lit(offset)).alias("score"),
    )


def edge_score_linearizer(
    g: Graph, attr: DataFrame, inverse: bool = False, seed: int = 1
) -> DataFrame:
    """score = sorted position / (m-1) (EdgeScoreLinearizer.cpp:20-57);
    0.5 when m == 1.  The reference tie-breaks with a random integer —
    md5-derandomized here (then src, dst)."""
    m = attr.count()
    if m == 1:
        return attr.select("src", "dst", F.lit(0.5).alias("score"))
    tie = F.md5(
        F.concat_ws("|", F.lit(f"lin|{seed}"), F.col("src"), F.col("dst"))
    )
    order = (
        [F.desc("att"), F.desc(tie), F.desc("src"), F.desc("dst")]
        if inverse
        else [F.asc("att"), F.asc(tie), F.asc("src"), F.asc("dst")]
    )
    w = Window.orderBy(*order)
    # single global sort — same O(m log m) the reference pays; at web
    # scale a rangepartition sort, not a single-partition window, would
    # be used (documented; fixture-scale here like the reference's)
    return attr.withColumn("pos", F.row_number().over(w) - 1).select(
        "src", "dst",
        (F.col("pos").cast("double") / F.lit(float(m - 1))).alias("score"),
    )


def edge_score_blender(
    attr0: DataFrame, attr1: DataFrame, selection: DataFrame
) -> DataFrame:
    """score = selection ? attr1 : attr0 (EdgeScoreBlender.cpp).
    ``selection``: (src, dst, sel boolean)."""
    return (
        attr0.withColumnRenamed("att", "a0")
        .join(attr1.withColumnRenamed("att", "a1"), ["src", "dst"])
        .join(selection, ["src", "dst"])
        .select(
            "src", "dst",
            F.when(F.col("sel"), F.col("a1")).otherwise(F.col("a0"))
            .alias("score"),
        )
    )


def edge_score_as_weight(
    g: Graph,
    scores: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> Graph:
    """Graph reweighted as offset + factor * score[^2]
    (EdgeScoreAsWeight.cpp:24-38)."""
    s = F.col("score") * F.col("score") if squared else F.col("score")
    edges = (
        _canon_edges(g)
        .join(scores, ["src", "dst"])
        .select(
            "src", "dst",
            (F.lit(offset) + F.lit(factor) * s).alias("weight"),
        )
    )
    return Graph(edges=edges, vertices=g.vertices, directed=g.directed,
                 weighted=True)


def random_edge_score(g: Graph, seed: int = 1) -> DataFrame:
    """iid U[0,1) per edge, md5-derandomized
    (RandomEdgeScore.cpp:14-23)."""
    return _canon_edges(g).select(
        "src", "dst",
        _md5_u01(F.lit(f"res|{seed}"), F.col("src"), F.col("dst"))
        .alias("score"),
    )


def random_node_edge_score(
    g: Graph, rne_ratio: float = 0.8, seed: int = 1
) -> DataFrame:
    """score = removal position / m of the sequential mixed
    uniform-edge / node-then-edge deletion process
    (RandomNodeEdgeScore.cpp:15-80).  The process is inherently
    sequential (each draw depends on the surviving graph) — run
    driver-side at fixture scale with md5-derandomized draws, like the
    reference's own single-threaded loop."""
    rows = _canon_edges(g).collect()
    edges = sorted((int(r["src"]), int(r["dst"])) for r in rows)
    m = len(edges)
    live = set(edges)
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)

    def h(*parts):
        return int(
            hashlib.md5("|".join(map(str, parts)).encode()).hexdigest()[:13],
            16,
        )

    def u01(*parts):
        return h(*parts) / float(1 << 52)

    score: dict[tuple[int, int], float] = {}
    removed = 0
    while live:
        if u01("rne|mode", seed, removed) >= rne_ratio:  # uniform edge
            pool = sorted(live)
            e = pool[h("rne|edge", seed, removed) % len(pool)]
        else:  # random node, then random incident edge
            pool_n = sorted(u for u in nbrs if nbrs[u])
            u = pool_n[h("rne|node", seed, removed) % len(pool_n)]
            vs = sorted(nbrs[u])
            v = vs[h("rne|nbr", seed, removed) % len(vs)]
            e = (min(u, v), max(u, v))
        score[e] = removed / m
        live.discard(e)
        nbrs[e[0]].discard(e[1])
        nbrs[e[1]].discard(e[0])
        removed += 1
    spark = g.edges.sparkSession
    return spark.createDataFrame(
        [(u, v, s) for (u, v), s in sorted(score.items())],
        "src long, dst long, score double",
    )


def simrank_score(
    g: Graph, c: float = 0.8, iterations: int = 5
) -> DataFrame:
    """(src, dst, score) — SimRank of each edge's endpoints after a
    FIXED number of iterations (SimRankScore.cpp:29-120; the fixed
    count makes the plan oracle-replayable — the reference's tolerance
    stop is an early-exit of the same iteration)."""
    adj = g.adj().select("src", "dst").localCheckpoint(eager=True)
    # directed mode propagates over IN-neighbors with in-degrees
    # (SimRankScore.cpp:97-100); for undirected graphs adj() holds both
    # orientations, so dst-side grouping equals the plain degree
    deg = adj.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    ).localCheckpoint(eager=True)
    nodes = g.nodes().select("id")
    # sparse state: only rows with s > 0 (plus the pinned diagonal)
    s = nodes.select(
        F.col("id").alias("u"), F.col("id").alias("v"),
        F.lit(1.0).alias("s"),
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        prop = (
            s.join(adj.select(F.col("src").alias("u"),
                              F.col("dst").alias("nu")), "u")
            .join(adj.select(F.col("src").alias("v"),
                             F.col("dst").alias("nv")), "v")
            .groupBy(F.col("nu").alias("u"), F.col("nv").alias("v"))
            .agg(F.sum("s").alias("acc"))
            .filter(F.col("u") != F.col("v"))
        )
        s = (
            prop.join(deg.withColumnRenamed("id", "u")
                      .withColumnRenamed("d", "du"), "u")
            .join(deg.withColumnRenamed("id", "v")
                  .withColumnRenamed("d", "dv"), "v")
            .select(
                "u", "v",
                (F.lit(c) * F.col("acc") / (F.col("du") * F.col("dv")))
                .alias("s"),
            )
            .unionByName(
                nodes.select(F.col("id").alias("u"), F.col("id").alias("v"),
                             F.lit(1.0).alias("s"))
            )
            .localCheckpoint(eager=True)
        )
    canon = _canon_edges(g)
    return canon.join(
        s.select(F.col("u").alias("src"), F.col("v").alias("dst"), "s"),
        ["src", "dst"],
        "left",
    ).select("src", "dst", F.coalesce("s", F.lit(0.0)).alias("score"))


def forest_fire_score(
    g: Graph,
    pf: float = 0.6,
    target_burnt_ratio: float = 1.0,
    seed: int = 1,
    batch: int = 64,
    max_waves: int = 64,
) -> DataFrame:
    """(src, dst, score) — burnt count / max burnt over random fires
    (ForestFireScore.cpp:22-90).  Fires are the distributed axis
    (waves of ``batch`` fires via mapInPandas over the broadcast CSR,
    exactly the UST fan-out shape); the driver only totals burnt edges
    between waves to test the target ratio."""
    from networkit_spark.operators.ust import _csr, _h13

    if not 0 <= pf < 1:
        raise ValueError("pf must be in [0, 1)")
    spark = g.edges.sparkSession
    ids, indptr, indices = _csr(g)
    n = len(ids)
    m = len(indices) // 2
    bc = spark.sparkContext.broadcast((ids, indptr, indices))

    def run(batches):
        import pandas as pd

        b_ids, b_indptr, b_indices = bc.value
        nn = len(b_ids)
        for pdf in batches:
            out: dict[tuple[int, int], int] = {}
            for f in pdf["id"]:
                f = int(f)
                visited = [False] * nn
                start = _h13("fire|start", seed, f) % nn
                visited[start] = True
                queue = [start]
                qi = 0
                draw = 0
                while qi < len(queue):
                    v = queue[qi]
                    qi += 1
                    valid = [
                        int(x)
                        for x in b_indices[b_indptr[v]:b_indptr[v + 1]]
                        if not visited[x]
                    ]
                    while True:
                        q = (_h13("fire|q", seed, f, draw) / float(1 << 52))
                        draw += 1
                        if q > pf or not valid:
                            break
                        k = _h13("fire|pick", seed, f, draw) % len(valid)
                        draw += 1
                        x = valid.pop(k)
                        visited[x] = True
                        queue.append(x)
                        a, b = int(b_ids[v]), int(b_ids[x])
                        e = (a, b) if a < b else (b, a)
                        out[e] = out.get(e, 0) + 1
            yield pd.DataFrame(
                {
                    "src": [e[0] for e in out],
                    "dst": [e[1] for e in out],
                    "burnt": list(out.values()),
                }
            )

    total = 0
    wave = 0
    acc = None
    while total < target_burnt_ratio * m:
        if wave >= max_waves:
            raise AssertionError(
                f"forest fire did not reach the target ratio in "
                f"{max_waves} waves"
            )
        fires = spark.range(wave * batch, (wave + 1) * batch).repartition(
            max(1, min(batch, spark.sparkContext.defaultParallelism))
        )
        burnt = fires.mapInPandas(run, "src long, dst long, burnt long")
        acc = (
            burnt
            if acc is None
            else acc.unionByName(burnt)
        ).groupBy("src", "dst").agg(F.sum("burnt").alias("burnt"))
        acc = acc.localCheckpoint(eager=True)
        total = int(acc.agg(F.sum("burnt")).first()[0] or 0)
        wave += 1
    mx = int(acc.agg(F.max("burnt")).first()[0] or 0)
    canon = _canon_edges(g)
    return canon.join(acc, ["src", "dst"], "left").select(
        "src", "dst",
        (F.coalesce("burnt", F.lit(0)) / F.lit(float(mx if mx else 1)))
        .alias("score"),
    )


# ---------------------------------------------------------------------------
# Sparsifier chains (Sparsifiers.cpp:31-137)
# ---------------------------------------------------------------------------


def _threshold(g: Graph, scores: DataFrame, threshold: float) -> Graph:
    keep = scores.filter(F.col("score") >= threshold).select(
        F.col("src").alias("ksrc"), F.col("dst").alias("kdst")
    )
    edges = g.edges.join(
        keep,
        (F.least(F.col("src"), F.col("dst")) == F.col("ksrc"))
        & (F.greatest(F.col("src"), F.col("dst")) == F.col("kdst")),
        "left_semi",
    )
    return Graph(edges=edges, vertices=g.vertices, directed=g.directed,
                 weighted=g.weighted)


def simmelian_sparsifier_non_parametric(g: Graph, threshold: float) -> Graph:
    tri = triangle_edge_score(g)
    jac = prefix_jaccard_score(g, tri.withColumnRenamed("score", "att"))
    return _threshold(g, jac, threshold)


def simmelian_sparsifier_parametric(
    g: Graph, max_rank: int, min_overlap: int
) -> Graph:
    return _threshold(g, simmelian_overlap_score(g, max_rank),
                      float(min_overlap))


def multiscale_sparsifier(g: Graph, alpha: float) -> Graph:
    attr = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        (F.col("weight") if g.weighted else F.lit(1.0)).alias("att"),
    )
    return _threshold(g, multiscale_score(g, attr), alpha)


def simmelian_multiscale_sparsifier(g: Graph, alpha: float) -> Graph:
    tri = triangle_edge_score(g).withColumnRenamed("score", "att")
    return _threshold(g, multiscale_score(g, tri), alpha)


def local_similarity_sparsifier(g: Graph, e: float) -> Graph:
    from networkit_spark.operators.sparsification import (
        local_similarity_score,
    )

    return _threshold(g, local_similarity_score(g), e)


def random_sparsifier(g: Graph, ratio: float, seed: int = 1) -> Graph:
    return _threshold(g, random_edge_score(g, seed), ratio)
