"""Driver-contract queries, extension set: graph transforms, degree
centrality, modularity, dynamic updates, SimHash, windowed events, and
the rows-only (non-SQL-expressible) operators (LSH ANN, multimodal).

Same cross-engine determinism rules as contract.py / contract_docs.py:
md5 for hashing, integer arithmetic for anything order-sensitive,
terminal ROUND(..,6) on doubles, explicit tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.contract import GRAPH_CTES, load_graph

# ---------------------------------------------------------------------------
# GraphTools: induced subgraph + dense-id compaction (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def q_subgraph_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.graphtools import subgraph_from_nodes

    g = load_graph(spark, sf_dir)
    nodes = g.nodes().filter(F.col("id") % 7 == 0)
    sub = subgraph_from_nodes(g, nodes, compact=True)
    return sub.edges.select("src", "dst").orderBy("src", "dst")


SQL_SUBGRAPH_COMPACT = f"""
WITH {GRAPH_CTES},
ns AS (SELECT id FROM nodes WHERE id % 7 = 0),
se AS (
  SELECT src, dst FROM edges
  WHERE src IN (SELECT id FROM ns) AND dst IN (SELECT id FROM ns)
),
m AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS new_id FROM ns)
SELECT ms.new_id AS src, md.new_id AS dst
FROM se JOIN m ms ON ms.id = se.src JOIN m md ON md.id = se.dst
ORDER BY src, dst
"""


# ---------------------------------------------------------------------------
# DegreeCentrality (SURVEY.md §2.6; DegreeCentrality.cpp:16-40)
# ---------------------------------------------------------------------------

def q_degree_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import degree_centrality, ranking

    g = load_graph(spark, sf_dir)
    scores = degree_centrality(g, normalized=True)
    return ranking(scores).select("id", F.round("score", 6).alias("score"))


SQL_DEGREE_CENTRALITY = f"""
WITH {GRAPH_CTES}
SELECT id, ROUND(degree / (SELECT MAX(degree) * 1.0 FROM deg), 6) AS score
FROM deg ORDER BY degree / (SELECT MAX(degree) * 1.0 FROM deg) DESC, id ASC
"""


# ---------------------------------------------------------------------------
# Modularity of the connected-components clustering (Modularity.cpp:23-60)
# ---------------------------------------------------------------------------

def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity::getQuality over the degree-class clustering (label =
    degree) — deterministic, iteration-free, and non-degenerate on the
    contract graph (the CC clustering is a single component, Q=0)."""
    from networkit_spark.operators.coarsening import modularity

    g = load_graph(spark, sf_dir)
    labels = g.degrees().select("id", F.col("degree").alias("label"))
    q = modularity(g, labels)
    return spark.createDataFrame([(float(q),)], "q double").select(
        F.round("q", 6).alias("modularity")
    )


SQL_MODULARITY = f"""
WITH {GRAPH_CTES},
cc AS (SELECT id, degree AS label FROM deg),
m AS (SELECT COUNT(*) * 1.0 AS m FROM edges),
intra AS (
  SELECT COUNT(*) * 1.0 AS w FROM edges e
  JOIN cc cs ON cs.id = e.src JOIN cc cd ON cd.id = e.dst
  WHERE cs.label = cd.label
),
vol AS (
  SELECT cc.label, SUM(deg.degree) * 1.0 AS v
  FROM cc JOIN deg ON deg.id = cc.id GROUP BY cc.label
)
SELECT ROUND((SELECT w FROM intra) / (SELECT m FROM m)
           - (SELECT SUM(v * v) FROM vol) / POWER(2 * (SELECT m FROM m), 2),
       6) AS modularity
"""


# ---------------------------------------------------------------------------
# Dynamic updates: GraphEvent batch -> connected components
# (SURVEY.md §2.8; GraphEvent.hpp:21-30)
# ---------------------------------------------------------------------------

def q_dyn_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.dynamics import apply_events

    g = load_graph(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    adds = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.lit("EDGE_ADDITION").alias("type"),
            (F.col("o_orderkey") * 13 + 5) % 997,
            (F.col("o_orderkey") * 29 + 11) % 997,
        )
        .toDF("type", "u", "v")
        .filter(F.col("u") != F.col("v"))
        .withColumn("w", F.lit(1.0))
    )
    removes = (
        g.edges.filter((F.col("src") + F.col("dst")) % 7 == 0)
        .select(
            F.lit("EDGE_REMOVAL").alias("type"),
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.lit(None).cast("double").alias("w"),
        )
    )
    g2 = apply_events(g, adds.unionByName(removes))
    labels, _ = connected_components(g2)
    return labels.orderBy("id")


SQL_DYN_CC = f"""
WITH RECURSIVE {GRAPH_CTES},
adds AS (
  SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM (
    SELECT (o_orderkey * 13 + 5) % 997 AS u,
           (o_orderkey * 29 + 11) % 997 AS v
    FROM orders WHERE o_orderkey % 10 = 0
  ) WHERE u <> v
),
removed AS (SELECT src, dst FROM edges WHERE (src + dst) % 7 = 0),
ne AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM edges UNION SELECT src, dst FROM adds
  ) u WHERE NOT EXISTS (
    SELECT 1 FROM removed r WHERE r.src = u.src AND r.dst = u.dst
  )
),
nadj AS (
  SELECT src, dst FROM ne UNION ALL SELECT dst AS src, src AS dst FROM ne
),
nnodes AS (SELECT DISTINCT src AS id FROM nadj),
reach(id, lbl) AS (
  SELECT id, id FROM nnodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN nadj a ON a.src = r.id
  WHERE r.lbl < a.dst
)
SELECT id, MIN(lbl) AS label FROM reach GROUP BY id ORDER BY id
"""


# ---------------------------------------------------------------------------
# SimHash signatures + Hamming-band candidates (SURVEY-extension dedup)
# ---------------------------------------------------------------------------

def _simhash_sig_sql() -> str:
    votes = ",\n         ".join(
        "SUM(CASE WHEN ((strpos('0123456789abcdef', substring(hex, {pos}, 1)) - 1)"
        " >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}".format(
            pos=1 + j // 4, sh=j % 4, j=j
        )
        for j in range(63)
    )
    sig = " + ".join(
        f"CASE WHEN b{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END"
        for j in range(63)
    )
    return f"""
tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
    FROM documents
  )
),
h AS (SELECT doc_id, md5(tok) AS hex FROM tok),
votes AS (
  SELECT doc_id,
         {votes}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes)
""".strip()


def q_simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.functions.dedup import simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_signatures(docs).orderBy("doc_id")


SQL_SIMHASH_SIG = (
    f"WITH {_simhash_sig_sql()} SELECT doc_id, simhash FROM sig ORDER BY doc_id"
)


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.functions.dedup import simhash_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_candidates(docs, max_hamming=8, bands=4).orderBy("a", "b")


SQL_SIMHASH_CANDIDATES = f"""
WITH {_simhash_sig_sql()},
buckets AS (
  SELECT doc_id, simhash, 0 AS band, (simhash >> 0) & 32767 AS bucket FROM sig
  UNION ALL
  SELECT doc_id, simhash, 1 AS band, (simhash >> 15) & 32767 AS bucket FROM sig
  UNION ALL
  SELECT doc_id, simhash, 2 AS band, (simhash >> 30) & 32767 AS bucket FROM sig
  UNION ALL
  SELECT doc_id, simhash, 3 AS band, (simhash >> 45) & 32767 AS bucket FROM sig
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM buckets x
JOIN buckets y ON x.band = y.band AND x.bucket = y.bucket
              AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# events: tumbling-window aggregation (batch form of the Structured
# Streaming windowed agg; window start serialized as a string so the
# cross-engine hash is timezone-representation-proof)
# ---------------------------------------------------------------------------

def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "avg_value",
        )
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_WINDOW = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


# ---------------------------------------------------------------------------
# rows-only queries (no SQL oracle; the driver records the weaker
# rows-only check): LSH ANN over embeddings, multimodal feature plumbing
# ---------------------------------------------------------------------------

def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: hyperplane-LSH bucketed candidate join re-ranked
    by exact cosine. Not SQL-expressible (seeded gaussian hyperplanes)."""
    from networkit_spark.functions.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb, k=3).orderBy("query_id", "rank")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media -> mapInPandas feature extraction ->
    per-kind summary. The decode step is a documented stub; the
    Spark-side plumbing (schema, Arrow batches, partitioning) is real."""
    from networkit_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        gen_media_pdf,
    )

    media = spark.createDataFrame(gen_media_pdf(256, seed=7), schema=MEDIA_SCHEMA)
    feats = extract_features(media, decode_stub=True)
    return (
        feats.select(
            "media_id",
            "kind",
            F.round(
                F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6
            ).alias("feat_sum"),
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("feat_sum"), 4).alias("total"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# Eigenvector / Katz centrality (SURVEY.md §2.6 orbit; power-iteration
# kernels sharing the PageRank superstep machinery)
# ---------------------------------------------------------------------------

EIG_ITERS = 5
KATZ_ITERS = 5
KATZ_ALPHA = 0.05
KATZ_BETA = 0.1


def q_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import eigenvector_centrality

    g = load_graph(spark, sf_dir)
    x = eigenvector_centrality(g, max_iterations=EIG_ITERS, tol=0.0)
    return x.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _eigenvector_sql(iters: int = EIG_ITERS) -> str:
    steps = [
        "x0 AS (SELECT id, 1.0 / sqrt((SELECT COUNT(*) FROM nodes)) AS score"
        " FROM nodes)"
    ]
    for i in range(1, iters + 1):
        steps.append(
            f"""y{i} AS (
  SELECT n.id, COALESCE(m.mass, 0.0) AS score
  FROM nodes n LEFT JOIN (
    SELECT a.dst AS id, SUM(p.score) AS mass
    FROM adj a JOIN x{i - 1} p ON p.id = a.src
    GROUP BY a.dst
  ) m ON m.id = n.id
),
x{i} AS (
  SELECT id, score / (SELECT sqrt(SUM(score * score)) FROM y{i}) AS score
  FROM y{i}
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(score, 6) AS score FROM x{iters} ORDER BY id"
    )


SQL_EIGENVECTOR = _eigenvector_sql()


def q_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import katz_centrality

    g = load_graph(spark, sf_dir)
    x = katz_centrality(
        g, alpha=KATZ_ALPHA, beta=KATZ_BETA, max_iterations=KATZ_ITERS, tol=0.0
    )
    return x.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _katz_sql(iters: int = KATZ_ITERS) -> str:
    # reference recurrence (KatzCentrality.cpp:26-70): x0 = 1,
    # x'[u] = beta + alpha * SUM w*(1 + x[v]) over in-neighbors,
    # final division by the L2 length of the last vector
    steps = ["k0 AS (SELECT id, 1.0 AS score FROM nodes)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""k{i} AS (
  SELECT n.id,
         CAST({KATZ_ALPHA} AS DOUBLE) * COALESCE(m.mass, CAST(0 AS DOUBLE))
         + CAST({KATZ_BETA} AS DOUBLE) AS score
  FROM nodes n LEFT JOIN (
    SELECT a.dst AS id, SUM(1.0 + p.score) AS mass
    FROM adj a JOIN k{i - 1} p ON p.id = a.src
    GROUP BY a.dst
  ) m ON m.id = n.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"""
SELECT id,
       ROUND(score / (SELECT sqrt(SUM(score * score)) FROM k{iters}), 6) AS score
FROM k{iters} ORDER BY id"""
    )


SQL_KATZ = _katz_sql()


# ---------------------------------------------------------------------------
# Core decomposition (SURVEY.md §2.6; CoreDecomposition.cpp) — h-index
# iteration, fixed 4 rounds for the cross-engine oracle
# ---------------------------------------------------------------------------

KCORE_ITERS = 4


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.kcore import core_decomposition

    g = load_graph(spark, sf_dir)
    cores, _ = core_decomposition(g, max_iterations=KCORE_ITERS)
    return cores.orderBy("id")


def _kcore_sql(iters: int = KCORE_ITERS) -> str:
    steps = ["c0 AS (SELECT id, degree AS value FROM deg)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""c{i} AS (
  SELECT id, MAX(LEAST(rk, nv)) AS value FROM (
    SELECT a.dst AS id, p.value AS nv,
           ROW_NUMBER() OVER (PARTITION BY a.dst ORDER BY p.value DESC) AS rk
    FROM adj a JOIN c{i - 1} p ON p.id = a.src
  ) t GROUP BY id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, value AS core FROM c{iters} ORDER BY id"
    )


SQL_KCORE = _kcore_sql()


# ---------------------------------------------------------------------------
# Bipartiteness per component (GraphTools.hpp:575) — parity reachability
# ---------------------------------------------------------------------------

def q_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.graphtools import bipartite_components

    g = load_graph(spark, sf_dir)
    return (
        bipartite_components(g)
        .select("label", F.col("is_bipartite").cast("int").alias("is_bipartite"))
        .orderBy("label")
    )


SQL_BIPARTITE = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
cc AS (SELECT id, MIN(lbl) AS label FROM reach GROUP BY id),
reach2(id, parity) AS (
  SELECT id, 0 FROM cc WHERE id = label
  UNION
  SELECT a.dst AS id, 1 - r.parity
  FROM reach2 r JOIN adj a ON a.src = r.id
),
odd AS (
  SELECT id FROM reach2 GROUP BY id HAVING COUNT(DISTINCT parity) > 1
)
SELECT c.label,
       CAST(CASE WHEN COUNT(o.id) = 0 THEN 1 ELSE 0 END AS INT) AS is_bipartite
FROM cc c LEFT JOIN odd o ON o.id = c.id
GROUP BY c.label ORDER BY c.label
"""
