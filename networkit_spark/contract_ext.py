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

from networkit_spark.contract import GRAPH_CTES, N_MOD, load_graph

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
    by exact cosine. The seeded gaussian hyperplanes are driver-side
    literals folded into the plan, so the oracle SQL below unrolls the
    SAME literals (like _katz_sql unrolls constants) — full hash-match,
    not rows-only."""
    from networkit_spark.functions.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb, k=3).orderBy("query_id", "rank")


LSH_DIM = 64     # embeddings.parquet vector width (TESTDATA.md)
LSH_BITS = 8
LSH_TABLES = 4
LSH_SEED = 42
LSH_K = 3


def _lsh_topk_sql() -> str:
    """Oracle for q_lsh_topk: identical hyperplane literals, identical
    left-to-right dot-product fold (DuckDB's list_dot_product and
    Spark's F.aggregate(zip_with) both reduce sequentially, so the IEEE
    sums are bit-equal), identical tie-breaks."""
    from networkit_spark.functions.similarity import _hyperplanes

    tables = []
    for t in range(LSH_TABLES):
        planes = _hyperplanes(LSH_DIM, LSH_BITS, t, LSH_SEED)
        bits = []
        for j, h in enumerate(planes):
            lits = ", ".join(repr(float(x)) for x in h)
            bits.append(
                f"(CASE WHEN list_dot_product(vec, [{lits}]) > 0 "
                f"THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
            )
        expr = "\n       + ".join(bits)
        tables.append(
            f"SELECT id, {t} AS tbl,\n       {expr} AS bucket FROM v"
        )
    buckets = "\n  UNION ALL\n  ".join(tables)
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
n AS MATERIALIZED (
  SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS vnorm FROM v
),
b AS MATERIALIZED (
  {buckets}
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.id AS qid, y.id AS nid
  FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket
  WHERE x.id <> y.id
),
scored AS (
  SELECT c.qid, c.nid,
         ROUND(list_dot_product(q.vec, m.vec) / (q.vnorm * m.vnorm), 6) AS cosine
  FROM cand c
  JOIN n q ON q.id = c.qid AND q.vnorm > 0
  JOIN n m ON m.id = c.nid AND m.vnorm > 0
)
SELECT qid AS query_id, nid AS neighbor_id, cosine, rank FROM (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
) t WHERE rank <= {LSH_K}
ORDER BY query_id, rank
""".strip()


SQL_LSH_TOPK = _lsh_topk_sql()


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table derived from ``documents`` (payload = UTF-8 text
    bytes, kind from doc_id mod 3) -> mapInPandas feature extraction ->
    per-media feature sum. The decode step is the documented
    deterministic stub (sha256(payload) -> 16 uint32-LE words mod 1000 /
    1000); SQL_MULTIMODAL unrolls exactly that arithmetic over DuckDB's
    sha256(VARCHAR) (hashes the same UTF-8 bytes), so this is a full
    hash-match gate, not rows-only. The Spark-side plumbing (binary
    payload column, typed meta struct, Arrow batches) is real."""
    from networkit_spark.functions.multimodal import extract_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id") % 3
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(k == 0, "image").when(k == 1, "audio").otherwise("video").alias(
            "kind"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(k == 0, F.lit(640)).alias("width"),
            F.when(k == 0, F.lit(480)).alias("height"),
            F.when(k == 1, F.lit(16000)).alias("sample_rate"),
            F.when(k == 2, F.lit(120)).alias("n_frames"),
        ).alias("meta"),
    )
    feats = extract_features(media, decode_stub=True)
    return feats.select(
        "media_id",
        "kind",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("feat_sum"),
    ).orderBy("media_id")


def _multimodal_sql() -> str:
    """Oracle for q_multimodal_features: per feature i, the stub takes
    digest bytes (4i..4i+3 mod 32) of sha256(payload) as a little-endian
    uint32, mod 1000, / 1000; the feature sum is the same left-to-right
    IEEE fold as Spark's F.aggregate. Hex nibbles via strpos (the repo's
    standard DuckDB hex trick)."""
    from networkit_spark.functions.multimodal import FEATURE_DIM

    def nib(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"

    feats = []
    for i in range(FEATURE_DIM):
        terms = []
        for b in range(4):
            j = (4 * i + b) % 32  # digest repeated past 32 bytes
            terms.append(
                f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)}) * {256 ** b}"
            )
        u32 = " + ".join(terms)
        feats.append(f"(CAST(({u32}) % 1000 AS DOUBLE) / 1000.0)")
    fold = " + ".join(feats)
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         sha256(text) AS h
  FROM documents
)
SELECT media_id, kind, ROUND({fold}, 6) AS feat_sum
FROM m ORDER BY media_id
""".strip()


SQL_MULTIMODAL = _multimodal_sql()


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
# PLM / Louvain (PLM.cpp:30-262) — deterministic gate variant: 2 synchronous
# move rounds, one coarsening, 2 more rounds, project, min-id canonical
# labels. Gains are computed in the 2*total^2-scaled form, exactly integral
# on this unweighted graph, so the argmax is bit-identical across engines.
# Both engines apply the same parity gate — only nodes with
# (id + round) % 2 == 0 may move in a round (anti-livelock half-steps;
# see operators/plm.py _move_phase).
# ---------------------------------------------------------------------------

PLM_ROUNDS = 2
PLM_LEVELS = 2


def q_plm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.plm import plm

    g = load_graph(spark, sf_dir)
    labels, _ = plm(
        g, gamma=1.0, max_move_rounds=PLM_ROUNDS, max_levels=PLM_LEVELS
    )
    return labels.orderBy("id")


def _plm_move_round_sql(p: str, r: int) -> str:
    """One synchronous local-move round over prefix ``p`` relations
    ({p}adj weighted loop-free adjacency, {p}vol node volumes,
    {p}lab{r-1} -> {p}lab{r}); gain scaled by 2*total^2."""
    return f"""{p}vc{r} AS MATERIALIZED (
  SELECT l.label, SUM(v.vol) AS cvol
  FROM {p}lab{r - 1} l JOIN {p}vol v ON v.id = l.id GROUP BY l.label
),
{p}aff{r} AS MATERIALIZED (
  SELECT a.src AS u, l.label AS d, SUM(a.weight) AS w
  FROM {p}adj a JOIN {p}lab{r - 1} l ON l.id = a.dst GROUP BY a.src, l.label
),
{p}cand{r} AS MATERIALIZED (
  SELECT f.u, f.d,
         2 * (SELECT t FROM tw) * (f.w - COALESCE(ac.w, 0.0))
         + ((vc1.cvol - vn.vol) - vc2.cvol) * vn.vol AS gain
  FROM {p}aff{r} f
  JOIN {p}lab{r - 1} lu ON lu.id = f.u
  LEFT JOIN {p}aff{r} ac ON ac.u = f.u AND ac.d = lu.label
  JOIN {p}vc{r} vc1 ON vc1.label = lu.label
  JOIN {p}vc{r} vc2 ON vc2.label = f.d
  JOIN {p}vol vn ON vn.id = f.u
  WHERE f.d <> lu.label
),
{p}best{r} AS MATERIALIZED (
  SELECT u, d FROM (
    SELECT u, d,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY gain DESC, d ASC) AS rn
    FROM {p}cand{r} WHERE gain > 0 AND (u + {r}) % 2 = 0
  ) t WHERE rn = 1
),
{p}lab{r} AS MATERIALIZED (
  SELECT l.id, COALESCE(b.d, l.label) AS label
  FROM {p}lab{r - 1} l LEFT JOIN {p}best{r} b ON b.u = l.id
)"""


def _plm_sql(rounds: int = PLM_ROUNDS) -> str:
    parts = [
        "tw AS (SELECT COUNT(*) * 1.0 AS t FROM edges)",
        "l0adj AS MATERIALIZED (SELECT src, dst, 1.0 AS weight FROM adj)",
        "l0vol AS MATERIALIZED (SELECT id, degree * 1.0 AS vol FROM deg)",
        "l0lab0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(_plm_move_round_sql("l0", r))
    parts.append(
        f"""comp AS MATERIALIZED (
  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY label) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT label FROM l0lab{rounds}) t
),
cmap AS MATERIALIZED (SELECT l.id, c.cid FROM l0lab{rounds} l JOIN comp c ON c.label = l.label),
cedges AS MATERIALIZED (
  SELECT LEAST(ms.cid, md.cid) AS src, GREATEST(ms.cid, md.cid) AS dst,
         SUM(1.0) AS weight
  FROM edges e JOIN cmap ms ON ms.id = e.src JOIN cmap md ON md.id = e.dst
  GROUP BY 1, 2
),
l1adj AS MATERIALIZED (
  SELECT src, dst, weight FROM cedges WHERE src <> dst
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM cedges WHERE src <> dst
),
l1nodes AS MATERIALIZED (SELECT DISTINCT cid AS id FROM cmap),
l1vol AS MATERIALIZED (
  SELECT n.id, COALESCE(aw.w, 0.0) + 2 * COALESCE(lw.w, 0.0) AS vol
  FROM l1nodes n
  LEFT JOIN (SELECT src AS id, SUM(weight) AS w FROM l1adj GROUP BY src) aw
    ON aw.id = n.id
  LEFT JOIN (SELECT src AS id, SUM(weight) AS w FROM cedges WHERE src = dst
             GROUP BY src) lw ON lw.id = n.id
),
l1lab0 AS MATERIALIZED (SELECT id, id AS label FROM l1nodes)"""
    )
    for r in range(1, rounds + 1):
        parts.append(_plm_move_round_sql("l1", r))
    parts.append(
        f"""fin AS MATERIALIZED (
  SELECT mp.id, l.label AS c
  FROM cmap mp JOIN l1lab{rounds} l ON l.id = mp.cid
),
canon AS (SELECT c, MIN(id) AS label FROM fin GROUP BY c)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT f.id, cn.label FROM fin f JOIN canon cn ON cn.c = f.c ORDER BY f.id"
    )


SQL_PLM = _plm_sql()


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
# BFS hop distance + SSSP (BFS.cpp:16-79, Dijkstra.cpp:15-93) — multi-seed,
# hop-capped (the cap makes the semantics identical to the unrolled oracle;
# the contract graph's eccentricities are far below it)
# ---------------------------------------------------------------------------

BFS_HOPS = 16
BFS_SEED_MOD = 101  # seeds: ids divisible by 101 (10 seeds on 0..996)


def q_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import bfs_distances

    g = load_graph(spark, sf_dir)
    seeds = g.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    dist, _ = bfs_distances(g, seeds, max_hops=BFS_HOPS)
    return dist.orderBy("id")


def _bfs_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        f"d0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS dist "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM d{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + 1) AS nd
    FROM adj a JOIN d{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, dist FROM d{hops} ORDER BY id"
    )


SQL_BFS = _bfs_sql()


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP on the contract graph with deterministic synthetic
    weights w(u,v) = (u + v) % 5 + 1."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.distance import sssp_distances

    g = load_graph(spark, sf_dir)
    wedges = g.edges.select(
        "src", "dst",
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
    )
    gw = Graph(wedges, None, directed=False, weighted=True)
    seeds = gw.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    dist, _ = sssp_distances(gw, seeds, max_hops=BFS_HOPS)
    return dist.select("id", F.round("dist", 6).alias("dist")).orderBy("id")


def _sssp_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        "wadj AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM adj)",
        f"s0 AS MATERIALIZED (SELECT id, CAST(0 AS DOUBLE) AS dist "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""s{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         LEAST(COALESCE(p.dist, 1e18), COALESCE(m.nd, 1e18)) AS dist
  FROM s{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + a.w) AS nd
    FROM wadj a JOIN s{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(dist, 6) AS dist FROM s{hops} ORDER BY id"
    )


SQL_SSSP = _sssp_sql()


# ---------------------------------------------------------------------------
# Strongly connected components (StronglyConnectedComponents.cpp:26-41) on
# the DIRECTED variant of the contract graph (generator pairs kept as
# (u -> v), no canonicalization); labels = min member id per SCC. Oracle:
# recursive transitive closure + mutual-reachability MIN.
# ---------------------------------------------------------------------------

def load_directed_graph(spark: SparkSession, sf_dir: str):
    """Directed contract graph: same three affine generators as
    load_graph, orientation preserved."""
    from networkit_spark.graph import Graph

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    base = (
        orders.select((k % 997).alias("u"), ((k * 31 + 7) % 997).alias("v"))
        .unionByName(
            orders.filter(k % 2 == 0).select(
                (k % 997).alias("u"), ((k * 57 + 13) % 997).alias("v")
            )
        )
        .unionByName(
            orders.filter(k % 3 == 0).select(
                ((k * 17 + 3) % 997).alias("u"), ((k * 43 + 11) % 997).alias("v")
            )
        )
        .distinct()
    )
    edges = (
        base.filter(F.col("u") != F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=edges, vertices=None, directed=True, weighted=False)


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scc import strongly_connected_components

    g = load_directed_graph(spark, sf_dir)
    labels, _ = strongly_connected_components(g)
    return labels.orderBy("id")


SQL_SCC = """
WITH RECURSIVE base AS (
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 31 + 7) % 997) AS v
  FROM orders
  UNION
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 57 + 13) % 997) AS v
  FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT DISTINCT ((o_orderkey * 17 + 3) % 997) AS u,
                  ((o_orderkey * 43 + 11) % 997) AS v
  FROM orders WHERE o_orderkey % 3 = 0
),
dedges AS MATERIALIZED (
  SELECT DISTINCT u AS src, v AS dst FROM base WHERE u <> v
),
dnodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM dedges UNION ALL SELECT dst FROM dedges
  ) t
),
reach(a, b) AS (
  SELECT id, id FROM dnodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
)
SELECT u AS id, MIN(v) AS label FROM mutual GROUP BY u ORDER BY u
"""


# ---------------------------------------------------------------------------
# TriangleEdgeScore (TriangleEdgeScore.cpp:62-95): per-edge triangle counts
# ---------------------------------------------------------------------------

def q_tri_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import triangle_edge_score

    g = load_graph(spark, sf_dir)
    return triangle_edge_score(g).orderBy("src", "dst")


SQL_TRI_EDGE = f"""
WITH {GRAPH_CTES},
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tedges AS (
  SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM tri
  UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tri
  UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM tri
),
cnt AS (SELECT x, y, COUNT(*) AS score FROM tedges GROUP BY x, y)
SELECT e.src, e.dst, COALESCE(c.score, 0) AS score
FROM edges e LEFT JOIN cnt c ON c.x = e.src AND c.y = e.dst
ORDER BY e.src, e.dst
"""


# ---------------------------------------------------------------------------
# Betweenness (Brandes; Betweenness.cpp:22-110) — multi-source dependency
# accumulation from the 10 contract seeds, hop-capped so the unrolled
# forward/backward oracle has identical semantics
# ---------------------------------------------------------------------------

BC_HOPS = 12


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.betweenness import betweenness

    g = load_graph(spark, sf_dir)
    seeds = g.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    scores, _ = betweenness(g, sources=seeds, max_hops=BC_HOPS)
    return scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _betweenness_sql(hops: int = BC_HOPS) -> str:
    parts = [
        f"f0 AS MATERIALIZED (SELECT id AS s, id AS v, 1.0 AS sigma "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma
  FROM f{l - 1} p JOIN adj a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    parts.append(
        f"d{hops} AS MATERIALIZED (SELECT s, v, sigma, 0.0 AS delta FROM f{hops})"
    )
    for l in range(hops - 1, -1, -1):
        parts.append(
            f"""d{l} AS MATERIALIZED (
  SELECT c.s, c.v, c.sigma, COALESCE(x.d, 0.0) AS delta
  FROM f{l} c LEFT JOIN (
    SELECT c2.s, c2.v, SUM((c2.sigma / w.sigma) * (1.0 + w.delta)) AS d
    FROM f{l} c2
    JOIN adj a ON a.src = c2.v
    JOIN d{l + 1} w ON w.s = c2.s AND w.v = a.dst
    GROUP BY c2.s, c2.v
  ) x ON x.s = c.s AND x.v = c.v
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT s, v, delta FROM d{l}" for l in range(hops + 1)
    )
    parts.append(
        f"""alldep AS (
  {union}
),
bc AS (SELECT v AS id, SUM(delta) AS score FROM alldep WHERE s <> v GROUP BY v)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT n.id, ROUND(COALESCE(b.score, 0.0), 6) AS score"
        "\nFROM nodes n LEFT JOIN bc b ON b.id = n.id ORDER BY n.id"
    )


SQL_BETWEENNESS = _betweenness_sql()


# ---------------------------------------------------------------------------
# Sampled clustering coefficients (ClusteringCoefficient.cpp:130-162,
# GlobalClusteringCoefficient.cpp:39-65) — deterministic md5-Bernoulli node
# sample instead of per-trial RNG, exact closure per sampled node
# ---------------------------------------------------------------------------

LCC_SAMPLE_PCT = 10
LCC_SAMPLE_SEED = 42


def q_lcc_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import (
        approx_avg_local_clustering,
        approx_global_clustering,
        sampled_local_clustering,
    )

    g = load_graph(spark, sf_dir)
    n_sampled = sampled_local_clustering(g, LCC_SAMPLE_PCT, LCC_SAMPLE_SEED).count()
    avg = approx_avg_local_clustering(g, LCC_SAMPLE_PCT, LCC_SAMPLE_SEED)
    glob = approx_global_clustering(g, LCC_SAMPLE_PCT, LCC_SAMPLE_SEED)
    return spark.createDataFrame(
        [(n_sampled, float(avg), float(glob))],
        "n_sampled long, avg_local double, global_cc double",
    ).select(
        "n_sampled",
        F.round("avg_local", 6).alias("avg_local"),
        F.round("global_cc", 6).alias("global_cc"),
    )


def _md5_bucket_sql(expr: str, seed: int) -> str:
    """First six md5 nibbles of ``seed|expr`` as an integer (matches
    Spark's conv(substring(md5(...), 1, 6), 16, 10))."""
    h = f"md5('{seed}|' || CAST({expr} AS VARCHAR))"
    nib = "(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    val = nib.format(h=h, i=1)
    for i in range(2, 7):
        val = f"({val} * 16 + {nib.format(h=h, i=i)})"
    return val


SQL_LCC_SAMPLED = f"""
WITH {GRAPH_CTES},
sample AS MATERIALIZED (
  SELECT id FROM nodes WHERE {_md5_bucket_sql('id', LCC_SAMPLE_SEED)} % 100 < {LCC_SAMPLE_PCT}
),
nb AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS n FROM adj a
  WHERE a.src IN (SELECT id FROM sample)
),
pairs AS (
  SELECT x.u, x.n AS n1, y.n AS n2
  FROM nb x JOIN nb y ON y.u = x.u AND x.n < y.n
),
closed AS MATERIALIZED (
  SELECT p.u, COUNT(*) AS closed
  FROM pairs p JOIN edges e ON e.src = p.n1 AND e.dst = p.n2
  GROUP BY p.u
),
per_node AS MATERIALIZED (
  SELECT s.id, d.degree, COALESCE(c.closed, 0) AS closed
  FROM sample s JOIN deg d ON d.id = s.id
  LEFT JOIN closed c ON c.u = s.id
)
SELECT (SELECT COUNT(*) FROM per_node) AS n_sampled,
       ROUND((SELECT AVG(2.0 * closed / (degree * (degree - 1)))
              FROM per_node WHERE degree >= 2), 6) AS avg_local,
       ROUND((SELECT SUM(2.0 * closed) / SUM(degree * (degree - 1))
              FROM per_node), 6) AS global_cc
"""


# ---------------------------------------------------------------------------
# Scale-credible gate: PageRank on a ~100k-node graph (vertices = explicit
# range(100003), edges from lineitem keys) — the kernel gates otherwise all
# run on 997 nodes at every sf. Scores reported as score * n (raw values at
# n=1e5 would round to nothing at 6 decimals).
# ---------------------------------------------------------------------------

N_LARGE = 100003
PR_LARGE_ITERS = 5

LARGE_CTES = f"""
lkeys AS (SELECT (l_orderkey * 8 + l_linenumber) AS k FROM lineitem),
lbase AS (
  SELECT DISTINCT ((k * 13 + 5) % {N_LARGE}) AS u,
                  ((k * 37 + 11) % {N_LARGE}) AS v FROM lkeys
  UNION
  SELECT DISTINCT ((k * 23 + 7) % {N_LARGE}) AS u,
                  ((k * 61 + 17) % {N_LARGE}) AS v FROM lkeys WHERE k % 2 = 0
  UNION
  SELECT DISTINCT ((k * 47 + 1) % {N_LARGE}) AS u,
                  ((k * 83 + 29) % {N_LARGE}) AS v FROM lkeys WHERE k % 3 = 0
),
ledges AS MATERIALIZED (
  SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst
  FROM lbase WHERE u <> v
),
ladj AS MATERIALIZED (
  SELECT src, dst FROM ledges UNION ALL SELECT dst AS src, src AS dst FROM ledges
),
lnodes AS MATERIALIZED (SELECT range AS id FROM range({N_LARGE})),
ldeg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS degree FROM ladj GROUP BY src)
""".strip()


def load_large_graph(spark: SparkSession, sf_dir: str):
    from networkit_spark.graph import Graph

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long")
    lk = li.select(k.alias("k"))
    base = (
        lk.select(((F.col("k") * 13 + 5) % N_LARGE).alias("u"),
                  ((F.col("k") * 37 + 11) % N_LARGE).alias("v"))
        .unionByName(
            lk.filter(F.col("k") % 2 == 0).select(
                ((F.col("k") * 23 + 7) % N_LARGE).alias("u"),
                ((F.col("k") * 61 + 17) % N_LARGE).alias("v"),
            )
        )
        .unionByName(
            lk.filter(F.col("k") % 3 == 0).select(
                ((F.col("k") * 47 + 1) % N_LARGE).alias("u"),
                ((F.col("k") * 83 + 29) % N_LARGE).alias("v"),
            )
        )
        .distinct()
    )
    edges = (
        base.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    vertices = spark.range(N_LARGE).select(F.col("id").cast("long").alias("id"))
    return Graph(edges=edges, vertices=vertices, directed=False, weighted=False)


def q_pagerank_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pagerank import pagerank

    g = load_large_graph(spark, sf_dir)
    res = pagerank(g, damp=0.85, tol=0.0, max_iterations=PR_LARGE_ITERS)
    return (
        res.scores.select(
            "id", F.round(F.col("score") * N_LARGE, 6).alias("score_n")
        )
        .orderBy("id")
    )


def _pagerank_large_sql(iters: int = PR_LARGE_ITERS) -> str:
    steps = [
        f"pr0 AS MATERIALIZED (SELECT id, 1.0 / {N_LARGE} AS score FROM lnodes)"
    ]
    for i in range(1, iters + 1):
        steps.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT n.id,
         (1.0 - 0.85) / {N_LARGE} + 0.85 * COALESCE(m.mass, 0.0) AS score
  FROM lnodes n LEFT JOIN (
    SELECT a.dst AS id, SUM(p.score * (1.0 / d.degree)) AS mass
    FROM ladj a
    JOIN pr{i - 1} p ON p.id = a.src
    JOIN ldeg d ON d.id = a.src
    GROUP BY a.dst
  ) m ON m.id = n.id
)"""
        )
    return (
        f"WITH {LARGE_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(score * {N_LARGE}, 6) AS score_n "
        f"FROM pr{iters} ORDER BY id"
    )


SQL_PAGERANK_LARGE = _pagerank_large_sql()


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


# ---------------------------------------------------------------------------
# Closeness + harmonic closeness (Closeness.cpp:50-113, Closeness.hpp:86-100,
# HarmonicCloseness.cpp:20-49) — generalized variant from the deterministic
# seed set (ids % BFS_SEED_MOD == 0), hop-capped like the BFS gate (the
# contract graph's eccentricities are far below the cap, so capped = exact)
# ---------------------------------------------------------------------------

def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.closeness import closeness, harmonic_closeness

    g = load_graph(spark, sf_dir)
    seeds = g.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    clo, _ = closeness(g, variant="generalized", sources=seeds, max_hops=BFS_HOPS)
    har, _ = harmonic_closeness(g, sources=seeds, max_hops=BFS_HOPS)
    return (
        clo.select("id", F.round("score", 6).alias("closeness"))
        .join(har.select("id", F.round("score", 6).alias("harmonic")), "id")
        .orderBy("id")
    )


def _closeness_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        f"t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
agg AS (
  SELECT s, COUNT(*) AS r, SUM(dist) AS dsum,
         SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0 END) AS harm
  FROM t{hops} GROUP BY s
),
nn AS (SELECT COUNT(*) AS n FROM nodes)
SELECT s AS id,
       ROUND(CASE WHEN dsum > 0
             THEN (r - 1) * 1.0 / dsum / ((SELECT n FROM nn) - 1)
             ELSE 0 END, 6) AS closeness,
       ROUND(harm, 6) AS harmonic
FROM agg ORDER BY id"""
    )


SQL_CLOSENESS = _closeness_sql()


# ---------------------------------------------------------------------------
# Assortativity (correlation/Assortativity.cpp:33-102) — degree (numeric
# Pearson over stored edges) + nominal (labels = id % 7). All sums are
# exact integers, combined with the identical expression shape in both
# engines, so the coefficients match bit-for-bit before rounding.
# ---------------------------------------------------------------------------

NOMINAL_MOD = 7


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.assortativity import (
        degree_assortativity,
        nominal_assortativity,
    )

    g = load_graph(spark, sf_dir)
    r_deg = degree_assortativity(g)
    labels = g.nodes().select("id", (F.col("id") % NOMINAL_MOD).alias("label"))
    r_nom = nominal_assortativity(g, labels)
    return spark.createDataFrame(
        [(float(r_deg), float(r_nom))], "deg_assort double, nom_assort double"
    ).select(
        F.round("deg_assort", 6).alias("deg_assort"),
        F.round("nom_assort", 6).alias("nom_assort"),
    )


SQL_ASSORTATIVITY = f"""
WITH {GRAPH_CTES},
ea AS (
  SELECT d1.degree * 1.0 AS x, d2.degree * 1.0 AS y
  FROM edges e JOIN deg d1 ON d1.id = e.src JOIN deg d2 ON d2.id = e.dst
),
s AS (
  SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM ea
),
lp AS (SELECT src % {NOMINAL_MOD} AS lu, dst % {NOMINAL_MOD} AS lv FROM edges),
lp2 AS (
  SELECT lu, lv FROM lp
  UNION ALL
  SELECT lv AS lu, lu AS lv FROM lp WHERE lu <> lv
),
em AS (SELECT lu, lv, COUNT(*) AS cnt FROM lp2 GROUP BY lu, lv),
mm AS (SELECT COUNT(*) AS m FROM edges),
dgs AS (SELECT COALESCE(SUM(cnt), 0) AS diag FROM em WHERE lu = lv),
ra AS (SELECT lu, SUM(cnt) * 1.0 AS rs FROM em GROUP BY lu),
rb AS (SELECT lv, SUM(cnt) * 1.0 AS cs FROM em GROUP BY lv),
ab AS (SELECT SUM(ra.rs * rb.cs) AS v FROM ra JOIN rb ON rb.lv = ra.lu)
SELECT ROUND((s.sxy - s.sx * s.sy / s.m)
             / SQRT((s.sxx - s.sx * s.sx / s.m) * (s.syy - s.sy * s.sy / s.m)), 6)
         AS deg_assort,
       ROUND((dgs.diag * 1.0 / mm.m - ab.v / (mm.m * 1.0 * mm.m))
             / (1 - ab.v / (mm.m * 1.0 * mm.m)), 6) AS nom_assort
FROM s, mm, dgs, ab
"""


# ---------------------------------------------------------------------------
# Diameter + effective diameter (distance/Diameter.cpp, EffectiveDiameter.cpp)
# — engine: pivot-BFS bounding loop (exact) + all-sources neighborhood
# function; oracle: all-pairs min-dist unrolled DIAM_HOPS deep (contract
# graph diameters measured 6-8, far below the cap, so capped = exact).
# The contract graph is one connected component at every sf (required by
# both semantics; verified by the graph_bipartite single-row gate).
# ---------------------------------------------------------------------------

DIAM_HOPS = 10
EFF_RATIO = 0.9


def q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.diameter import diameter, effective_diameter

    g = load_graph(spark, sf_dir)
    lb, ub = diameter(g, algo="exact", check=False)
    if lb != ub:
        raise AssertionError(f"exact diameter did not converge: lb={lb} ub={ub}")
    eff = effective_diameter(g, ratio=EFF_RATIO, check=False)
    return spark.createDataFrame(
        [(int(lb), float(eff))], "diameter bigint, eff_diameter double"
    ).select("diameter", F.round("eff_diameter", 6).alias("eff_diameter"))


def _diameter_sql(hops: int = DIAM_HOPS) -> str:
    steps = [
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        "FROM nodes)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
nn AS (SELECT COUNT(*) AS n FROM nodes),
nh AS (SELECT s, dist, COUNT(*) AS c FROM t{hops} GROUP BY s, dist),
cum AS (
  SELECT s, dist, SUM(c) OVER (PARTITION BY s ORDER BY dist) AS cum FROM nh
),
effs AS (
  SELECT s, GREATEST(MIN(dist), 1) AS h
  FROM cum WHERE cum >= CEIL({EFF_RATIO} * (SELECT n FROM nn))
  GROUP BY s
)
SELECT (SELECT MAX(dist) FROM t{hops}) AS diameter,
       ROUND((SELECT SUM(h) * 1.0 FROM effs) / (SELECT n FROM nn), 6)
         AS eff_diameter"""
    )


SQL_DIAMETER = _diameter_sql()


# ---------------------------------------------------------------------------
# Coverage (community/Coverage.cpp:13-60) — intra-cluster edge-weight
# fraction of the deterministic id % NOMINAL_MOD partition
# ---------------------------------------------------------------------------

def q_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.coarsening import coverage

    g = load_graph(spark, sf_dir)
    labels = g.nodes().select("id", (F.col("id") % NOMINAL_MOD).alias("label"))
    val = coverage(g, labels)
    return spark.createDataFrame([(float(val),)], "coverage double").select(
        F.round("coverage", 6).alias("coverage")
    )


SQL_COVERAGE = f"""
WITH {GRAPH_CTES}
SELECT ROUND(
  (SELECT COALESCE(SUM(1.0), 0.0) FROM edges
   WHERE src % {NOMINAL_MOD} = dst % {NOMINAL_MOD})
  / (SELECT COUNT(*) * 1.0 FROM edges), 6) AS coverage
"""


# ---------------------------------------------------------------------------
# Per-edge Jaccard + Adamic-Adar scores (distance/JaccardDistance.cpp:36-38,
# AdamicAdarDistance.cpp:30-54) — the sparsification edge-score family
# ---------------------------------------------------------------------------

def q_edge_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import (
        adamic_adar_distance,
        jaccard_distance,
    )

    g = load_graph(spark, sf_dir)
    jd = jaccard_distance(g).select(
        "src", "dst", F.round("score", 6).alias("jaccard")
    )
    aa = adamic_adar_distance(g).select(
        "src", "dst", F.round("aa", 6).alias("adamic_adar")
    )
    return jd.join(aa, ["src", "dst"]).orderBy("src", "dst")


SQL_EDGE_SCORES = f"""
WITH {GRAPH_CTES},
cn AS (
  SELECT e.src, e.dst, COUNT(*) AS t, SUM(1.0 / LN(dw.degree)) AS aa
  FROM edges e
  JOIN adj a1 ON a1.src = e.src
  JOIN adj a2 ON a2.src = e.dst AND a2.dst = a1.dst
  JOIN deg dw ON dw.id = a1.dst
  GROUP BY e.src, e.dst
)
SELECT e.src, e.dst,
       ROUND(1.0 - COALESCE(c.t, 0) * 1.0
             / (d1.degree + d2.degree - COALESCE(c.t, 0)), 6) AS jaccard,
       ROUND(COALESCE(c.aa, 0.0), 6) AS adamic_adar
FROM edges e
JOIN deg d1 ON d1.id = e.src
JOIN deg d2 ON d2.id = e.dst
LEFT JOIN cn c ON c.src = e.src AND c.dst = e.dst
ORDER BY e.src, e.dst
"""


# ---------------------------------------------------------------------------
# ANF / Flajolet-Martin neighborhood sketches
# (EffectiveDiameterApproximation.cpp:24-126, md5-seeded FM init) — the
# masks are exact integers, so the gate is a bit-for-bit comparison of the
# k=4 sketches after ANF_HOPS synchronous bit-or propagation rounds
# ---------------------------------------------------------------------------

ANF_HOPS = 4
ANF_K = 4
ANF_R = 7
ANF_SEED = 42


def q_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.diameter import anf_sketches

    g = load_graph(spark, sf_dir)
    out = anf_sketches(g, h=ANF_HOPS, k=ANF_K, r=ANF_R, seed=ANF_SEED)
    return out.select(
        "id", *[f"m{j}" for j in range(ANF_K)]
    ).orderBy("id")


def _anf_sql(hops: int = ANF_HOPS, k: int = ANF_K) -> str:
    mcols = [f"m{j}" for j in range(k)]
    # u in (0, 1] from the first 13 md5 nibbles (Horner), the engine's
    # _fm_init expression nibble-for-nibble
    def u_expr(j: int) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring(md5(CAST('{ANF_SEED}|{j}|' AS VARCHAR) || CAST(id AS VARCHAR)), {p + 1}, 1)) - 1) * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"({nib}) / POWER(16.0, 13)"

    init_cols = []
    for j in range(k):
        u = u_expr(j)
        pos = f"CAST(CEIL(LN({u}) / LN(0.5) - 1) AS BIGINT)"
        init_cols.append(
            f"CASE WHEN {u} > 0 AND {pos} < (SELECT cap FROM capq) "
            f"THEN (CAST(1 AS BIGINT) << CAST({pos} AS INT)) ELSE CAST(0 AS BIGINT) END AS m{j}"
        )
    parts = [
        "capq AS (SELECT CAST(CEIL(LOG2(COUNT(*))) AS BIGINT) + "
        f"{ANF_R} AS cap FROM nodes)",
        "s0 AS MATERIALIZED (SELECT id, " + ",\n  ".join(init_cols) + " FROM nodes)",
    ]
    for i in range(1, hops + 1):
        aggs = ", ".join(f"BIT_OR({c}) AS {c}" for c in mcols)
        cols = ", ".join(mcols)
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT id, {aggs} FROM (
    SELECT id, {cols} FROM s{i - 1}
    UNION ALL
    SELECT a.src AS id, {cols} FROM adj a JOIN s{i - 1} p ON p.id = a.dst
  ) GROUP BY id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id, {', '.join(mcols)} FROM s{hops} ORDER BY id"
    )


SQL_ANF = _anf_sql()


# ---------------------------------------------------------------------------
# TopCloseness — pruned top-k closeness (TopCloseness.cpp:24-120+,
# Bergamini et al. ALENEX16). The Spark side sweeps candidate waves
# ordered by the component-size/degree farness bound and stops on the
# bound; the oracle brute-forces exact generalized closeness for ALL
# nodes (unrolled hop steps like SQL_DIAMETER) and takes the same
# (score desc, id asc) top k — identical double arithmetic, so the
# pruned run must reproduce the exact top-k bit-for-bit.
# ---------------------------------------------------------------------------

TOPCLO_K = 10


def q_top_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopCloseness over the contract graph PLUS a deterministic hub
    overlay (node 0 starred to every id % 7 == 1). The bare contract
    graph is near-6-regular — closeness values span ~2% while any
    farness bound is >= 5% loose, so NO top-k algorithm (the reference
    included, worst case O(nm)) can prune it; the hub overlay creates
    the centrality spread real web graphs have, and the gate asserts
    the bound actually prunes."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.closeness import top_closeness

    g = load_graph(spark, sf_dir)
    star = (
        g.nodes()
        .filter((F.col("id") % 7 == 1) & (F.col("id") != 0))
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    )
    edges2 = (
        g.edges.select("src", "dst")
        .unionByName(star)
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g2 = Graph(edges2, vertices=g.nodes(), directed=False, weighted=False)
    res, info = top_closeness(g2, k=TOPCLO_K, batch=64)
    n = g2.number_of_nodes()
    if info.iterations >= n // 2:  # not `assert` — must survive python -O
        raise AssertionError(
            f"top_closeness swept {info.iterations}/{n} nodes — pruning "
            "bound never fired"
        )
    return res.select("id", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("id")
    )


def _top_closeness_sql(hops: int = DIAM_HOPS, k: int = TOPCLO_K) -> str:
    steps = [
        """star AS (
  SELECT CAST(0 AS BIGINT) AS src, id AS dst FROM nodes
  WHERE id % 7 = 1 AND id <> 0
),
edges2 AS (
  SELECT src, dst FROM edges UNION SELECT src, dst FROM star
),
adj2 AS (
  SELECT src, dst FROM edges2 UNION ALL SELECT dst AS src, src AS dst FROM edges2
)""",
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        "FROM nodes)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj2 a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
agg AS (SELECT s, COUNT(*) AS r, SUM(dist) AS dsum FROM t{hops} GROUP BY s),
nn AS (SELECT COUNT(*) AS n FROM nodes),
sc AS (
  SELECT s AS id,
         CASE WHEN dsum > 0
              THEN (r - 1) * 1.0 / dsum / ((SELECT n FROM nn) - 1)
              ELSE 0.0 END AS c
  FROM agg
)
SELECT id, ROUND(c, 6) AS score FROM sc
ORDER BY c DESC, id ASC LIMIT {k}"""
    )


SQL_TOP_CLOSENESS = _top_closeness_sql()


# ---------------------------------------------------------------------------
# Link prediction over non-edges (linkprediction/AdamicAdarIndex.cpp,
# ResourceAllocationIndex.cpp, JaccardIndex.hpp, MissingLinksFinder.cpp) —
# all distance-2 candidate pairs of the contract graph scored with the
# six neighborhood indices; the oracle recomputes the wedge aggregation
# in plain SQL.
# ---------------------------------------------------------------------------

def q_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import link_prediction

    g = load_graph(spark, sf_dir)
    lp = link_prediction(g)
    return lp.select(
        "u",
        "v",
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        F.col("preferential_attachment").cast("long").alias(
            "preferential_attachment"
        ),
        F.col("total_neighbors").cast("long").alias("total_neighbors"),
    ).orderBy("u", "v")


SQL_LINKPRED = f"""
WITH {GRAPH_CTES},
wedge AS (
  SELECT a1.dst AS u, a2.dst AS v, a1.src AS w
  FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
cand AS (
  SELECT DISTINCT u, v FROM wedge wx
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wx.u AND e.dst = wx.v)
),
ov AS (
  SELECT w.u, w.v, COUNT(*) AS cn,
         SUM(1.0 / LN(d.degree)) AS aa,
         SUM(1.0 / d.degree) AS ra
  FROM wedge w
  JOIN cand c ON c.u = w.u AND c.v = w.v
  JOIN deg d ON d.id = w.w
  GROUP BY w.u, w.v
)
SELECT o.u, o.v,
       CAST(o.cn AS BIGINT) AS common_neighbors,
       ROUND(o.cn * 1.0 / (du.degree + dv.degree - o.cn), 6) AS jaccard,
       ROUND(o.aa, 6) AS adamic_adar,
       ROUND(o.ra, 6) AS resource_allocation,
       CAST(du.degree * dv.degree AS BIGINT) AS preferential_attachment,
       CAST(du.degree + dv.degree - o.cn AS BIGINT) AS total_neighbors
FROM ov o
JOIN deg du ON du.id = o.u
JOIN deg dv ON dv.id = o.v
ORDER BY o.u, o.v
"""


# ---------------------------------------------------------------------------
# Sparsification (LocalSimilarityScore.cpp:17-73 + GlobalThresholdFilter
# .cpp:18-49): local-similarity backbone of the contract graph at
# threshold 0.4 — the oracle recomputes the per-endpoint similarity
# ranking (row_number over sim desc, neighbor asc) and the max-exponent
# aggregation in plain SQL.
# ---------------------------------------------------------------------------

SPARSIFY_THRESHOLD = 0.4


def q_sparsify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.sparsification import (
        global_threshold_filter,
        local_similarity_score,
    )

    g = load_graph(spark, sf_dir)
    scores = local_similarity_score(g)
    kept = global_threshold_filter(g, scores, SPARSIFY_THRESHOLD, above=True)
    return (
        kept.edges.select("src", "dst")
        .join(scores, ["src", "dst"])
        .select("src", "dst", F.round("score", 6).alias("score"))
        .orderBy("src", "dst")
    )


SQL_SPARSIFY = f"""
WITH {GRAPH_CTES},
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tedges AS (
  SELECT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM tri
  UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM tri
  UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM tri
),
cnt AS (SELECT x, y, COUNT(*) AS t FROM tedges GROUP BY x, y),
tes AS (
  SELECT e.src, e.dst, CAST(COALESCE(c.t, 0) AS DOUBLE) AS t
  FROM edges e LEFT JOIN cnt c ON c.x = e.src AND c.y = e.dst
),
half AS (
  SELECT src AS i, dst AS j, t FROM tes
  UNION ALL SELECT dst AS i, src AS j, t FROM tes
),
sims AS (
  SELECT h.i, h.j, di.degree AS di,
         h.t / (di.degree + dj.degree - h.t) AS sim
  FROM half h
  JOIN deg di ON di.id = h.i
  JOIN deg dj ON dj.id = h.j
),
ranked AS (
  SELECT i, j, di,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY sim DESC, j ASC) AS rank
  FROM sims
),
exps AS (
  SELECT LEAST(i, j) AS src, GREATEST(i, j) AS dst,
         CASE WHEN di <= 1 THEN 1.0
              ELSE 1.0 - LN(CAST(rank AS DOUBLE)) / LN(CAST(di AS DOUBLE))
         END AS e
  FROM ranked
),
sc AS (SELECT src, dst, MAX(e) AS score FROM exps GROUP BY src, dst)
SELECT src, dst, ROUND(score, 6) AS score
FROM sc WHERE score >= {SPARSIFY_THRESHOLD}
ORDER BY src, dst
"""


# ---------------------------------------------------------------------------
# Weighted closeness (Closeness.cpp Dijkstra mode / Dijkstra.cpp:15-93 via
# Bellman-Ford supersteps) — generalized + harmonic from the contract seed
# set over the deterministic (u+v)%5+1 weights, relaxation-round-capped so
# the unrolled oracle is identical
# ---------------------------------------------------------------------------

def q_closeness_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.closeness import closeness, harmonic_closeness

    g = load_graph(spark, sf_dir)
    wedges = g.edges.select(
        "src", "dst",
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
    )
    gw = Graph(wedges, None, directed=False, weighted=True)
    seeds = gw.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    clo, _ = closeness(
        gw, variant="generalized", sources=seeds, max_hops=BFS_HOPS, weighted=True
    )
    har, _ = harmonic_closeness(
        gw, sources=seeds, max_hops=BFS_HOPS, weighted=True
    )
    return (
        clo.select("id", F.round("score", 6).alias("closeness"))
        .join(har.select("id", F.round("score", 6).alias("harmonic")), "id")
        .orderBy("id")
    )


def _closeness_weighted_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        "wadj AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM adj)",
        f"w0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS DOUBLE) AS dist "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""w{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         LEAST(COALESCE(p.dist, 1e18), COALESCE(m.nd, 1e18)) AS dist
  FROM w{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + a.w) AS nd
    FROM wadj a JOIN w{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
agg AS (
  SELECT s, COUNT(*) AS r, SUM(dist) AS dsum,
         SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0 END) AS harm
  FROM w{hops} GROUP BY s
),
nn AS (SELECT COUNT(*) AS n FROM nodes)
SELECT s AS id,
       ROUND(CASE WHEN dsum > 0
             THEN (r - 1) * 1.0 / dsum / ((SELECT n FROM nn) - 1)
             ELSE 0 END, 6) AS closeness,
       ROUND(harm, 6) AS harmonic
FROM agg ORDER BY id"""
    )


SQL_CLOSENESS_WEIGHTED = _closeness_weighted_sql()


# ---------------------------------------------------------------------------
# ParallelLeiden (ParallelLeiden.cpp) — deterministic gate variant:
# 2 synchronous move rounds, 2 refinement rounds (R/T conditions in the
# vol(G)-scaled integral form), coarsen by the REFINED partition with
# the coarse graph inheriting the move partition, 2 more move rounds,
# project, min-id canonical labels. Reuses the PLM move-round SQL; the
# refinement rounds are unrolled below with identical parity gates,
# tie-breaks, and the same no-chained-merge guard as operators/leiden.py.
# ---------------------------------------------------------------------------

LEIDEN_ROUNDS = 2
LEIDEN_REFINE = 2


def q_leiden(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.leiden import parallel_leiden

    g = load_graph(spark, sf_dir)
    labels, _ = parallel_leiden(
        g,
        gamma=1.0,
        iterations=1,
        max_move_rounds=LEIDEN_ROUNDS,
        max_refine_rounds=LEIDEN_REFINE,
        max_levels=2,
    )
    return labels.orderBy("id")


def _leiden_refine_round_sql(q: int, slab: str) -> str:
    """One synchronous refinement round rl{q-1} -> rl{q} within the move
    partition ``slab``; VG = 2 * total edge weight, gamma = 1."""
    vg = "(2 * (SELECT t FROM tw))"
    return f"""rv{q} AS MATERIALIZED (
  SELECT r.rl AS c, SUM(v.vol) AS rvol
  FROM rl{q - 1} r JOIN l0vol v ON v.id = r.id GROUP BY r.rl
),
rs{q} AS MATERIALIZED (SELECT rl AS c, COUNT(*) AS sz FROM rl{q - 1} GROUP BY rl),
cc{q} AS MATERIALIZED (
  SELECT ru.rl AS c, SUM(i.weight) AS cutc
  FROM l0intra i
  JOIN rl{q - 1} ru ON ru.id = i.src
  JOIN rl{q - 1} rw ON rw.id = i.dst
  WHERE ru.rl <> rw.rl GROUP BY ru.rl
),
sing{q} AS MATERIALIZED (
  SELECT r.id FROM rl{q - 1} r JOIN rs{q} z ON z.c = r.rl
  WHERE z.sz = 1 AND r.rl = r.id AND (r.id + {q}) % 2 = 0
    AND r.id IN (SELECT id FROM l0elig)
),
cnd{q} AS MATERIALIZED (
  SELECT i.src AS u, r.rl AS c, i.s, SUM(i.weight) AS w
  FROM l0intra i JOIN rl{q - 1} r ON r.id = i.dst
  WHERE i.src IN (SELECT id FROM sing{q}) AND r.rl <> i.src
  GROUP BY i.src, r.rl, i.s
),
scd{q} AS MATERIALIZED (
  SELECT c2.u, c2.c, c2.w * {vg} - 1.0 * vn.vol * rv.rvol AS delta
  FROM cnd{q} c2
  JOIN rv{q} rv ON rv.c = c2.c
  LEFT JOIN cc{q} cc ON cc.c = c2.c
  JOIN l0svol sv ON sv.s = c2.s
  JOIN l0vol vn ON vn.id = c2.u
  WHERE COALESCE(cc.cutc, 0.0) * {vg} >= 1.0 * rv.rvol * (sv.svol - rv.rvol)
    AND c2.w * {vg} - 1.0 * vn.vol * rv.rvol >= 0
),
bst{q} AS MATERIALIZED (
  SELECT u, c FROM (
    SELECT u, c, ROW_NUMBER() OVER (PARTITION BY u ORDER BY delta DESC, c ASC) AS rn
    FROM scd{q}
  ) t WHERE rn = 1
),
app{q} AS MATERIALIZED (
  SELECT u, c FROM bst{q} WHERE c NOT IN (SELECT u FROM bst{q})
),
rl{q} AS MATERIALIZED (
  SELECT r.id, COALESCE(a.c, r.rl) AS rl
  FROM rl{q - 1} r LEFT JOIN app{q} a ON a.u = r.id
)"""


def _leiden_sql(rounds: int = LEIDEN_ROUNDS, refine: int = LEIDEN_REFINE) -> str:
    parts = [
        "tw AS (SELECT COUNT(*) * 1.0 AS t FROM edges)",
        "l0adj AS MATERIALIZED (SELECT src, dst, 1.0 AS weight FROM adj)",
        "l0vol AS MATERIALIZED (SELECT id, degree * 1.0 AS vol FROM deg)",
        "l0lab0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(_plm_move_round_sql("l0", r))
    slab = f"l0lab{rounds}"
    parts.append(
        f"""l0svol AS MATERIALIZED (
  SELECT l.label AS s, SUM(v.vol) AS svol
  FROM {slab} l JOIN l0vol v ON v.id = l.id GROUP BY l.label
),
l0intra AS MATERIALIZED (
  SELECT a.src, a.dst, a.weight, lu.label AS s
  FROM l0adj a
  JOIN {slab} lu ON lu.id = a.src
  JOIN {slab} lv ON lv.id = a.dst
  WHERE lu.label = lv.label
),
l0cutu AS MATERIALIZED (SELECT src AS id, SUM(weight) AS cutu FROM l0intra GROUP BY src),
l0elig AS MATERIALIZED (
  SELECT l.id FROM {slab} l
  JOIN l0vol v ON v.id = l.id
  JOIN l0svol s ON s.s = l.label
  LEFT JOIN l0cutu c ON c.id = l.id
  WHERE COALESCE(c.cutu, 0.0) * (2 * (SELECT t FROM tw))
        >= 1.0 * v.vol * (s.svol - v.vol)
),
rl0 AS MATERIALIZED (SELECT id, id AS rl FROM nodes)"""
    )
    for q in range(1, refine + 1):
        parts.append(_leiden_refine_round_sql(q, slab))
    parts.append(
        f"""comp AS MATERIALIZED (
  SELECT rl, CAST(ROW_NUMBER() OVER (ORDER BY rl) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT rl FROM rl{refine}) t
),
cmap AS MATERIALIZED (SELECT r.id, c.cid FROM rl{refine} r JOIN comp c ON c.rl = r.rl),
cedges AS MATERIALIZED (
  SELECT LEAST(ms.cid, md.cid) AS src, GREATEST(ms.cid, md.cid) AS dst,
         SUM(1.0) AS weight
  FROM edges e JOIN cmap ms ON ms.id = e.src JOIN cmap md ON md.id = e.dst
  GROUP BY 1, 2
),
l1adj AS MATERIALIZED (
  SELECT src, dst, weight FROM cedges WHERE src <> dst
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM cedges WHERE src <> dst
),
l1nodes AS MATERIALIZED (SELECT DISTINCT cid AS id FROM cmap),
l1vol AS MATERIALIZED (
  SELECT n.id, COALESCE(aw.w, 0.0) + 2 * COALESCE(lw.w, 0.0) AS vol
  FROM l1nodes n
  LEFT JOIN (SELECT src AS id, SUM(weight) AS w FROM l1adj GROUP BY src) aw
    ON aw.id = n.id
  LEFT JOIN (SELECT src AS id, SUM(weight) AS w FROM cedges WHERE src = dst
             GROUP BY src) lw ON lw.id = n.id
),
l1lab0 AS MATERIALIZED (
  SELECT m.cid AS id, MIN(l.label) AS label
  FROM cmap m JOIN {slab} l ON l.id = m.id GROUP BY m.cid
)"""
    )
    for r in range(1, rounds + 1):
        parts.append(_plm_move_round_sql("l1", r))
    parts.append(
        f"""fin AS MATERIALIZED (
  SELECT mp.id, l.label AS c
  FROM cmap mp JOIN l1lab{rounds} l ON l.id = mp.cid
),
canon AS (SELECT c, MIN(id) AS label FROM fin GROUP BY c)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT f.id, cn.label FROM fin f JOIN canon cn ON cn.c = f.c ORDER BY f.id"
    )


SQL_LEIDEN = _leiden_sql()


# ---------------------------------------------------------------------------
# DynWeaklyConnectedComponents (components/DynWeaklyConnectedComponents.cpp)
# — an additions-only batch takes the incremental label-merge path, a
# removal batch recomputes; final labels = weak components of the
# modified DIRECTED contract graph (min member id per component).
# ---------------------------------------------------------------------------

def q_dyn_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.streaming.dynamics import DynWeaklyConnectedComponents

    g = load_directed_graph(spark, sf_dir)
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
    removes = g.edges.filter((F.col("src") + F.col("dst")) % 7 == 0).select(
        F.lit("EDGE_REMOVAL").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    dyn = DynWeaklyConnectedComponents(g)
    dyn.update_batch(adds)      # additions-only: incremental merge path
    labels = dyn.update_batch(removes)  # removals: full recompute path
    return labels.orderBy("id")


SQL_DYN_WCC = """
WITH RECURSIVE base AS (
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 31 + 7) % 997) AS v
  FROM orders
  UNION
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 57 + 13) % 997) AS v
  FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT DISTINCT ((o_orderkey * 17 + 3) % 997) AS u,
                  ((o_orderkey * 43 + 11) % 997) AS v
  FROM orders WHERE o_orderkey % 3 = 0
),
dedges AS MATERIALIZED (
  SELECT DISTINCT u AS src, v AS dst FROM base WHERE u <> v
),
adds AS (
  SELECT DISTINCT u AS src, v AS dst FROM (
    SELECT (o_orderkey * 13 + 5) % 997 AS u,
           (o_orderkey * 29 + 11) % 997 AS v
    FROM orders WHERE o_orderkey % 10 = 0
  ) WHERE u <> v
),
removed AS (SELECT src, dst FROM dedges WHERE (src + dst) % 7 = 0),
ne AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM dedges UNION SELECT src, dst FROM adds
  ) t WHERE NOT EXISTS (
    SELECT 1 FROM removed r WHERE r.src = t.src AND r.dst = t.dst
  )
),
-- node universe = endpoints of the SURVIVING edges, deliberately: the
-- Spark side's load_directed_graph has vertices=None, so its recompute
-- after the removal batch also labels exactly the final-edge endpoints;
-- a node isolated by removals is dropped by BOTH engines (pinned by
-- tests/test_streaming.py::
-- test_dyn_wcc_isolating_removal_matches_oracle_universe).
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
# ApproxBetweenness (ApproxBetweenness.cpp:29-104, Riondato-Kornaropoulos)
# — epsilon-delta path-sampling estimator. Both engines derive every
# "random" draw from md5 (13 hex nibbles / 16^13), so the oracle replays
# the identical r sampled pairs and the identical backward path choices:
# full hash-match on a randomized approximation algorithm.
# ---------------------------------------------------------------------------

ABC_EPS = 0.3
ABC_DELTA = 0.1
ABC_VD = 10
ABC_SEED = 42


def _abc_r() -> int:
    import math

    return int(
        math.ceil(
            (1.0 / (ABC_EPS * ABC_EPS))
            * (math.floor(math.log2(ABC_VD - 2)) + 1 - math.log(ABC_DELTA))
        )
    )


def q_approx_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.betweenness import approx_betweenness

    g = load_graph(spark, sf_dir)
    scores, _ = approx_betweenness(
        g, epsilon=ABC_EPS, delta=ABC_DELTA, seed=ABC_SEED, vd=ABC_VD,
        max_hops=DIAM_HOPS,
    )
    return scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _approx_betweenness_sql(
    hops: int = DIAM_HOPS, adj: str = "adj", prelude: list[str] | None = None
) -> str:
    """``adj``/``prelude`` retarget the sampled-path replay to a modified
    edge relation (graph_dyn_approx_betweenness inserts edges first)."""
    r = _abc_r()

    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    hu = horner(f"md5('{ABC_SEED}|u|' || CAST(i AS VARCHAR))")
    hv = horner(f"md5('{ABC_SEED}|v|' || CAST(i AS VARCHAR))")
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "idx AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS idx FROM nodes)",
        f"""smp AS MATERIALIZED (
  SELECT i, hu % (SELECT n FROM nn) AS uidx,
         (hu % (SELECT n FROM nn) + 1
          + hv % ((SELECT n FROM nn) - 1)) % (SELECT n FROM nn) AS vidx
  FROM (SELECT i, {hu} AS hu, {hv} AS hv FROM range({r}) t(i))
)""",
        """pairs AS MATERIALIZED (
  SELECT m.i, iu.id AS s, iv.id AS t
  FROM smp m JOIN idx iu ON iu.idx = m.uidx JOIN idx iv ON iv.idx = m.vidx
)""",
        "f0 AS MATERIALIZED (SELECT DISTINCT s, s AS v, 1.0 AS sigma, "
        "CAST(0 AS BIGINT) AS dist FROM pairs)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma, CAST({l} AS BIGINT) AS dist
  FROM f{l - 1} p JOIN {adj} a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    sig_union = "\n  UNION ALL ".join(
        f"SELECT s, v, sigma, dist FROM f{l}" for l in range(hops + 1)
    )
    parts.append(f"sig AS MATERIALIZED (\n  {sig_union}\n)")
    parts.append(
        """w0 AS MATERIALIZED (
  SELECT p.i, p.s, p.t, g.dist AS td
  FROM pairs p JOIN sig g ON g.s = p.s AND g.v = p.t
  WHERE g.dist > 0
)"""
    )
    for k in range(1, hops + 1):
        u01 = (
            horner(
                f"md5('{ABC_SEED}|p|' || CAST(i AS VARCHAR) || '|{k}')"
            )
            + " / POWER(16.0, 13)"
        )
        parts.append(
            f"""pre{k} AS MATERIALIZED (
  SELECT w.i, w.s, a.src AS z, sz.sigma AS sz, sz.dist AS zd, st.sigma AS st_
  FROM w{k - 1} w
  JOIN {adj} a ON a.dst = w.t
  JOIN sig sz ON sz.s = w.s AND sz.v = a.src AND sz.dist = w.td - 1
  JOIN sig st ON st.s = w.s AND st.v = w.t
),
ch{k} AS MATERIALIZED (
  SELECT i, s, z, zd FROM (
    SELECT i, s, z, zd,
           SUM(sz) OVER (PARTITION BY i ORDER BY z) AS cum,
           {u01} * st_ AS thr
    FROM pre{k}
  ) q WHERE cum > thr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY i ORDER BY z) = 1
),
cb{k} AS (SELECT z AS id FROM ch{k} WHERE z <> s),
w{k} AS MATERIALIZED (
  SELECT i, s, z AS t, zd AS td FROM ch{k} WHERE z <> s
)"""
        )
    allc = "\n  UNION ALL ".join(f"SELECT id FROM cb{k}" for k in range(1, hops + 1))
    parts.append(
        f"""allc AS (
  {allc}
),
bc AS (SELECT id, COUNT(*) / CAST({r} AS DOUBLE) AS score FROM allc GROUP BY id)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join((prelude or []) + parts)
        + "\nSELECT n.id, ROUND(COALESCE(b.score, 0.0), 6) AS score"
        "\nFROM nodes n LEFT JOIN bc b ON b.id = n.id ORDER BY n.id"
    )


SQL_APPROX_BETWEENNESS = _approx_betweenness_sql()


# ---------------------------------------------------------------------------
# Node2Vec biased random walks (embedding/BiasedRandomWalk.cpp) — p=0.5,
# q=2.0 (powers of two so every cumulative weight is IEEE-exact in any
# summation order), walks of length 5 from the contract seed set, every
# draw an md5 uniform — the oracle replays the walks step by step.
# ---------------------------------------------------------------------------

N2V_P = 0.5
N2V_Q = 2.0
N2V_LEN = 5
N2V_REPS = 2
N2V_SEED = 42


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.embedding import biased_random_walks

    g = load_graph(spark, sf_dir)
    starts = g.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    out, _ = biased_random_walks(
        g, walk_length=N2V_LEN, walks_per_node=N2V_REPS, p=N2V_P, q=N2V_Q,
        seed=N2V_SEED, starts=starts,
    )
    return out.select("s", "rep", "step", "node").orderBy("s", "rep", "step")


def _node2vec_sql() -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    parts = [
        f"starts AS (SELECT id AS s FROM nodes WHERE id % {BFS_SEED_MOD} = 0)",
        f"st0 AS MATERIALIZED (SELECT s, r AS rep, CAST(NULL AS BIGINT) AS prev, "
        f"s AS cur FROM starts, range({N2V_REPS}) t(r))",
        "o0 AS (SELECT s, rep, CAST(0 AS BIGINT) AS step, cur AS node FROM st0)",
    ]
    for k in range(1, N2V_LEN):
        u01 = (
            horner(
                f"md5('{N2V_SEED}|w|' || CAST(s AS VARCHAR) || '|' || "
                f"CAST(rep AS VARCHAR) || '|{k}')"
            )
            + " / POWER(16.0, 13)"
        )
        if k == 1:
            wgt = "1.0"
        else:
            wgt = f"""CASE WHEN a.dst = w.prev THEN 1.0 / {N2V_P}
             WHEN EXISTS (SELECT 1 FROM adj b
                          WHERE b.src = w.prev AND b.dst = a.dst) THEN 1.0
             ELSE 1.0 / {N2V_Q} END"""
        parts.append(
            f"""cand{k} AS MATERIALIZED (
  SELECT w.s, w.rep, w.cur, a.dst AS x,
         {wgt} AS wgt
  FROM st{k - 1} w JOIN adj a ON a.src = w.cur
),
pick{k} AS MATERIALIZED (
  SELECT s, rep, cur, x FROM (
    SELECT s, rep, cur, x,
           SUM(wgt) OVER (PARTITION BY s, rep ORDER BY x) AS cum,
           {u01} * SUM(wgt) OVER (PARTITION BY s, rep) AS thr
    FROM cand{k}
  ) z WHERE cum > thr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s, rep ORDER BY x) = 1
),
st{k} AS MATERIALIZED (
  SELECT s, rep, cur AS prev, x AS cur FROM pick{k}
),
o{k} AS (SELECT s, rep, CAST({k} AS BIGINT) AS step, cur AS node FROM st{k})"""
        )
    union = "\n  UNION ALL ".join(f"SELECT * FROM o{k}" for k in range(N2V_LEN))
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f",\nwalks AS (\n  {union}\n)"
        + "\nSELECT s, rep, step, node FROM walks ORDER BY s, rep, step"
    )


SQL_NODE2VEC = _node2vec_sql()


# ---------------------------------------------------------------------------
# LouvainMapEquation (community/LouvainMapEquation.cpp) — deterministic
# synchronous gate variant: 3 parity-gated move rounds on the contract
# graph, map-equation fitness unrolled (plogp terms with p = x / totalVolume;
# every cut/volume on this unweighted graph is integral, so the only
# cross-engine surface is ln itself on identical doubles).
# ---------------------------------------------------------------------------

MAPEQ_ROUNDS = 3


def q_mapequation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.mapequation import louvain_map_equation

    g = load_graph(spark, sf_dir)
    labels, _ = louvain_map_equation(g, max_iterations=MAPEQ_ROUNDS)
    return labels.orderBy("id")


def _mapeq_round_sql(r: int) -> str:
    plogp = lambda x: (
        f"(CASE WHEN {x} > 0 THEN (({x}) / (SELECT tv FROM tv))"
        f" * LN(({x}) / (SELECT tv FROM tv)) ELSE 0.0 END)"
    )
    tc = f"(SELECT tc FROM tc{r})"
    cdc = "(2 * b.wc - b.vol + 2 * b.loop)"
    cdt = "(b.vol - 2 * f.w - 2 * b.loop)"
    stay = (
        f"{plogp(tc)}"
        f" + ({plogp('b.cut0 + b.vol0')}"
        f" - {plogp(f'b.cut0 + {cdc} + b.vol0 - b.vol')})"
        f" - 2.0 * ({plogp('b.cut0')} - {plogp(f'b.cut0 + {cdc}')})"
    )
    chg = (
        f"{plogp(f'{tc} + {cdc} + {cdt}')}"
        f" + ({plogp(f'cs2.cut + {cdt} + cs2.cvol + b.vol')}"
        f" - {plogp('cs2.cut + cs2.cvol')})"
        f" - 2.0 * ({plogp(f'cs2.cut + {cdt}')} - {plogp('cs2.cut')})"
    )
    return f"""cs{r} AS MATERIALIZED (
  SELECT l.label AS c, SUM(v.vol) AS cvol,
         COALESCE(SUM(ct.cut), 0.0) AS cut
  FROM melab{r - 1} l
  JOIN mevol v ON v.id = l.id
  LEFT JOIN (
    SELECT ls.label AS lbl, ls.id, SUM(a.weight) AS cut
    FROM meadj a
    JOIN melab{r - 1} ls ON ls.id = a.src
    JOIN melab{r - 1} ld ON ld.id = a.dst
    WHERE ls.label <> ld.label
    GROUP BY ls.label, ls.id
  ) ct ON ct.id = l.id
  GROUP BY l.label
),
tc{r} AS (SELECT SUM(cut) AS tc FROM cs{r}),
aff{r} AS MATERIALIZED (
  SELECT a.src AS u, l.label AS d, SUM(a.weight) AS w
  FROM meadj a JOIN melab{r - 1} l ON l.id = a.dst GROUP BY a.src, l.label
),
base{r} AS MATERIALIZED (
  SELECT l.id AS u, l.label AS c0,
         COALESCE(wc.w, 0.0) AS wc, v.vol, 0.0 AS loop,
         cs.cvol AS vol0, cs.cut AS cut0
  FROM melab{r - 1} l
  JOIN mevol v ON v.id = l.id
  JOIN cs{r} cs ON cs.c = l.label
  LEFT JOIN aff{r} wc ON wc.u = l.id AND wc.d = l.label
),
best{r} AS MATERIALIZED (
  SELECT u, d FROM (
    SELECT f.u, f.d,
           ROW_NUMBER() OVER (
             PARTITION BY f.u
             ORDER BY ({chg}) ASC, f.d ASC
           ) AS rn,
           ({chg}) AS chg, ({stay}) AS stay
    FROM aff{r} f
    JOIN base{r} b ON b.u = f.u
    JOIN cs{r} cs2 ON cs2.c = f.d
    WHERE f.d <> b.c0 AND (f.u + {r}) % 2 = 0
  ) t WHERE rn = 1 AND chg < stay
),
melab{r} AS MATERIALIZED (
  SELECT l.id, COALESCE(bst.d, l.label) AS label
  FROM melab{r - 1} l LEFT JOIN best{r} bst ON bst.u = l.id
)"""


def _mapequation_sql(rounds: int = MAPEQ_ROUNDS) -> str:
    parts = [
        "meadj AS MATERIALIZED (SELECT src, dst, 1.0 AS weight FROM adj)",
        "mevol AS MATERIALIZED (SELECT id, degree * 1.0 AS vol FROM deg)",
        "tv AS (SELECT SUM(vol) AS tv FROM mevol)",
        "melab0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(_mapeq_round_sql(r))
    parts.append(
        f"""mecanon AS (SELECT label AS c, MIN(id) AS clabel
  FROM melab{rounds} GROUP BY label)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT l.id, cn.clabel AS label FROM melab{rounds} l"
        "\nJOIN mecanon cn ON cn.c = l.label ORDER BY l.id"
    )


SQL_MAPEQUATION = _mapequation_sql()


# ---------------------------------------------------------------------------
# Weighted betweenness (Betweenness.cpp Dijkstra mode) — Bellman-Ford
# tagged distances over the (u+v)%5+1 weights from the contract seeds,
# shortest-path DAG via exact dist(z)+w == dist(t), then sigma/delta
# fixpoint rounds; Spark runs the SAME fixed round caps the oracle
# unrolls, so the <=k-round relaxation is identical by construction.
# ---------------------------------------------------------------------------

WBC_ROUNDS = 14


def q_weighted_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.betweenness import weighted_betweenness

    g = load_graph(spark, sf_dir)
    wedges = g.edges.select(
        "src", "dst",
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
    )
    gw = Graph(wedges, None, directed=False, weighted=True)
    seeds = gw.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    scores, _ = weighted_betweenness(
        gw, sources=seeds, max_hops=BFS_HOPS,
        sigma_rounds=WBC_ROUNDS, delta_rounds=WBC_ROUNDS,
    )
    return scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _weighted_betweenness_sql(
    hops: int = BFS_HOPS, rounds: int = WBC_ROUNDS
) -> str:
    steps = [
        "wadj AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM adj)",
        f"w0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS DOUBLE) AS dist "
        f"FROM nodes WHERE id % {BFS_SEED_MOD} = 0)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""w{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         LEAST(COALESCE(p.dist, 1e18), COALESCE(m.nd, 1e18)) AS dist
  FROM w{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + a.w) AS nd
    FROM wadj a JOIN w{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    steps.append(
        f"""dag AS MATERIALIZED (
  SELECT d1.s, d1.v AS z, a.dst AS t
  FROM w{hops} d1
  JOIN wadj a ON a.src = d1.v
  JOIN w{hops} d2 ON d2.s = d1.s AND d2.v = a.dst
  WHERE d1.dist + a.w = d2.dist
),
g0 AS MATERIALIZED (
  SELECT s, v, CASE WHEN s = v THEN 1.0 ELSE 0.0 END AS sig FROM w{hops}
)"""
    )
    for j in range(1, rounds + 1):
        steps.append(
            f"""g{j} AS MATERIALIZED (
  SELECT p.s, p.v,
         CASE WHEN p.s = p.v THEN 1.0 ELSE COALESCE(m.agg, 0.0) END AS sig
  FROM g{j - 1} p LEFT JOIN (
    SELECT d.s, d.t AS v, SUM(q.sig) AS agg
    FROM dag d JOIN g{j - 1} q ON q.s = d.s AND q.v = d.z
    GROUP BY d.s, d.t
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    steps.append(
        f"dl0 AS MATERIALIZED (SELECT s, v, 0.0 AS delta FROM w{hops})"
    )
    for j in range(1, rounds + 1):
        steps.append(
            f"""dl{j} AS MATERIALIZED (
  SELECT p.s, p.v, COALESCE(m.agg, 0.0) AS delta
  FROM dl{j - 1} p LEFT JOIN (
    SELECT d.s, d.z AS v,
           SUM((sz.sig / st.sig) * (1.0 + dd.delta)) AS agg
    FROM dag d
    JOIN g{rounds} sz ON sz.s = d.s AND sz.v = d.z
    JOIN g{rounds} st ON st.s = d.s AND st.v = d.t
    JOIN dl{j - 1} dd ON dd.s = d.s AND dd.v = d.t
    GROUP BY d.s, d.z
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
bc AS (
  SELECT v AS id, SUM(delta) AS score FROM dl{rounds} WHERE s <> v GROUP BY v
)
SELECT n.id, ROUND(COALESCE(b.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN bc b ON b.id = n.id ORDER BY n.id"""
    )


SQL_WEIGHTED_BETWEENNESS = _weighted_betweenness_sql()


# ---------------------------------------------------------------------------
# Maximum spanning forest (graph/RandomMaximumSpanningForest.cpp with the
# deterministic (weight desc, src, dst) tie-break) — Boruvka unrolled:
# per round each component's best cross edge (ROW_NUMBER argmax), merge
# components by a recursive min-label reach, ten rounds (>= log2(n)).
# ---------------------------------------------------------------------------

MSF_ROUNDS = 10


def q_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.spanning import maximum_spanning_forest

    g = load_graph(spark, sf_dir)
    wedges = g.edges.select(
        "src", "dst",
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
    )
    gw = Graph(wedges, None, directed=False, weighted=True)
    forest, _ = maximum_spanning_forest(gw)
    return forest.edges.select("src", "dst", "weight").orderBy("src", "dst")


def _msf_sql(rounds: int = MSF_ROUNDS) -> str:
    parts = [
        "wedges AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM edges)",
        "lab0 AS MATERIALIZED (SELECT id, id AS comp FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""cr{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w, ls.comp AS ca, ld.comp AS cb
  FROM wedges e
  JOIN lab{r - 1} ls ON ls.id = e.src
  JOIN lab{r - 1} ld ON ld.id = e.dst
  WHERE ls.comp <> ld.comp
),
ch{r} AS MATERIALIZED (
  SELECT DISTINCT src, dst, w FROM (
    SELECT c, src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w DESC, src, dst) AS rn
    FROM (
      SELECT ca AS c, src, dst, w FROM cr{r}
      UNION ALL SELECT cb AS c, src, dst, w FROM cr{r}
    ) h
  ) t WHERE rn = 1
),
cadj{r} AS MATERIALIZED (
  SELECT ls.comp AS a, ld.comp AS b
  FROM ch{r} e JOIN lab{r - 1} ls ON ls.id = e.src
  JOIN lab{r - 1} ld ON ld.id = e.dst
  UNION
  SELECT ld.comp, ls.comp
  FROM ch{r} e JOIN lab{r - 1} ls ON ls.id = e.src
  JOIN lab{r - 1} ld ON ld.id = e.dst
),
reach{r}(c, lbl) AS (
  SELECT DISTINCT comp, comp FROM lab{r - 1}
  UNION
  SELECT a.b AS c, q.lbl
  FROM reach{r} q JOIN cadj{r} a ON a.a = q.c
  WHERE q.lbl < a.b
),
mc{r} AS MATERIALIZED (SELECT c, MIN(lbl) AS nc FROM reach{r} GROUP BY c),
lab{r} AS MATERIALIZED (
  SELECT l.id, m.nc AS comp FROM lab{r - 1} l JOIN mc{r} m ON m.c = l.comp
)"""
        )
    union = "\n  UNION ".join(
        f"SELECT src, dst, w FROM ch{r}" for r in range(1, rounds + 1)
    )
    return (
        f"WITH RECURSIVE {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
forest AS (
  {union}
)
SELECT src, dst, w AS weight FROM forest ORDER BY src, dst"""
    )


SQL_MSF = _msf_sql()


# ---------------------------------------------------------------------------
# Partition-comparison measures (community/NMIDistance.cpp:16-127,
# AdjustedRandMeasure.cpp:5-55, JaccardMeasure.cpp:13-70,
# NodeStructuralRandMeasure.cpp, EdgeCut.cpp:12-20, Conductance.cpp:14-46)
# — zeta = 5-class modular partition, eta = degree-class labels (both
# deterministic AND non-degenerate on the contract graph — CC labels
# would collapse zeta to one cluster and saturate every measure),
# conductance over the id-parity 2-partition. One row of six rounded
# measures. PLM-vs-Leiden on real outputs: tests/test_partitions.py.
# ---------------------------------------------------------------------------

def q_partition_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.partitions import (
        conductance,
        edge_cut,
        partition_measures,
    )

    g = load_graph(spark, sf_dir)
    zeta = g.nodes().select("id", (F.col("id") % 5).alias("label"))
    eta = g.degrees().select("id", F.col("degree").cast("long").alias("label"))
    m = partition_measures(zeta, eta).collect()[0]
    cut = edge_cut(g, eta)
    parity = g.nodes().select("id", (F.col("id") % 2).alias("label"))
    cond = conductance(g, parity)
    return spark.createDataFrame(
        [
            (
                round(float(m["nmid"]), 6),
                round(float(m["ari_d"]), 6),
                round(float(m["jac_d"]), 6),
                round(float(m["rand_d"]), 6),
                round(cut, 6),
                round(cond, 6),
            )
        ],
        "nmid double, ari_d double, jac_d double, rand_d double, "
        "cut double, cond double",
    )


SQL_PARTITION_MEASURES = f"""
WITH {GRAPH_CTES},
zeta AS (SELECT id, id % 5 AS label FROM nodes),
eta AS (SELECT id, degree AS label FROM deg),
cells AS (
  SELECT z.label AS c, e.label AS d, CAST(COUNT(*) AS DOUBLE) AS s
  FROM zeta z JOIN eta e ON e.id = z.id GROUP BY z.label, e.label
),
nn AS (SELECT SUM(s) AS n, SUM(s * (s - 1) / 2) AS sum_int FROM cells),
zc AS (SELECT c, SUM(s) AS sc FROM cells GROUP BY c),
ec AS (SELECT d, SUM(s) AS sd FROM cells GROUP BY d),
sz AS (SELECT SUM(sc * (sc - 1) / 2) AS v FROM zc),
se AS (SELECT SUM(sd * (sd - 1) / 2) AS v FROM ec),
mi AS (
  SELECT SUM((s / (SELECT n FROM nn))
             * LOG2(s * (SELECT n FROM nn) / (zc.sc * ec.sd))) AS v
  FROM cells JOIN zc ON zc.c = cells.c JOIN ec ON ec.d = cells.d
),
hz AS (SELECT SUM(-(sc / (SELECT n FROM nn)) * LOG2(sc / (SELECT n FROM nn))) AS v FROM zc),
he AS (SELECT SUM(-(sd / (SELECT n FROM nn)) * LOG2(sd / (SELECT n FROM nn))) AS v FROM ec),
scalars AS (
  SELECT (SELECT n FROM nn) AS n, (SELECT sum_int FROM nn) AS sum_int,
         (SELECT v FROM sz) AS sz, (SELECT v FROM se) AS se,
         (SELECT v FROM mi) AS mi, (SELECT v FROM hz) + (SELECT v FROM he) AS h_sum
),
meas AS (
  SELECT
    CASE WHEN h_sum = 0 THEN 0.0 ELSE 1.0 - 2.0 * mi / h_sum END AS nmid,
    CASE WHEN 0.5 * (sz + se) = 0
           OR 0.5 * (sz + se) = (sz * se) / (n * (n - 1) / 2.0) THEN 0.0
         ELSE 1.0 - (sum_int - (sz * se) / (n * (n - 1) / 2.0))
                    / (0.5 * (sz + se) - (sz * se) / (n * (n - 1) / 2.0))
    END AS ari_d,
    CASE WHEN n * (n - 1) - 2.0 * (n * (n - 1) / 2.0 + sum_int - sz - se) > 0
         THEN 1.0 - 2.0 * sum_int
              / (n * (n - 1) - 2.0 * (n * (n - 1) / 2.0 + sum_int - sz - se))
         ELSE 0.0 END AS jac_d,
    (sz + se - 2.0 * sum_int) / (n * (n - 1) / 2.0) AS rand_d
  FROM scalars
),
cut AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM edges e
  JOIN eta eu ON eu.id = e.src JOIN eta ev ON ev.id = e.dst
  WHERE eu.label <> ev.label
),
pvol AS (
  SELECT id % 2 AS lbl, CAST(SUM(degree) AS DOUBLE) AS vol
  FROM deg GROUP BY id % 2
),
pcut AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM edges e
  WHERE e.src % 2 <> e.dst % 2
)
SELECT ROUND(nmid, 6) AS nmid, ROUND(ari_d, 6) AS ari_d,
       ROUND(jac_d, 6) AS jac_d, ROUND(rand_d, 6) AS rand_d,
       ROUND((SELECT v FROM cut), 6) AS cut,
       ROUND((SELECT v FROM pcut) / (SELECT MIN(vol) FROM pvol), 6) AS cond
FROM meas
"""


# ---------------------------------------------------------------------------
# Suitor matching (matching/SuitorMatcher.cpp:56-87) — distributed
# locally-dominant rounds; unique integer weights make the fixpoint the
# canonical greedy matching in both engines. 12 unrolled rounds in the
# oracle (Spark converges in <= 6 on the contract graph at sf0.001 and
# sf0.01; post-convergence rounds are no-ops), convergence raised on.
# ---------------------------------------------------------------------------

MATCH_ROUNDS = 12


def q_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import suitor_matching

    g = load_graph(spark, sf_dir)
    we = g.edges.select(
        "src",
        "dst",
        (((F.col("src") * 1009 + F.col("dst")) * 2654435761) % 2147483648)
        .cast("double")
        .alias("weight"),
    )
    gw = Graph(we, vertices=g.nodes(), directed=False, weighted=True)
    m, info = suitor_matching(gw, max_rounds=MATCH_ROUNDS)
    if not info.converged:  # must survive python -O
        raise AssertionError(
            f"suitor_matching did not converge in {MATCH_ROUNDS} rounds"
        )
    return m.select("src", "dst", "weight").orderBy("src")


def _matching_prefix_sql(rounds: int = MATCH_ROUNDS) -> str:
    parts = [
        """wadj AS MATERIALIZED (
  SELECT src, dst,
         CAST(((LEAST(src,dst) * 1009 + GREATEST(src,dst)) * 2654435761)
              % 2147483648 AS DOUBLE) AS w
  FROM adj
)""",
        "dead0 AS (SELECT id FROM nodes WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""liv{r} AS MATERIALIZED (
  SELECT a.src, a.dst, a.w FROM wadj a
  WHERE NOT EXISTS (SELECT 1 FROM dead{r - 1} d WHERE d.id = a.src)
    AND NOT EXISTS (SELECT 1 FROM dead{r - 1} d WHERE d.id = a.dst)
),
best{r} AS MATERIALIZED (
  SELECT src AS u, dst AS v, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS rk
    FROM liv{r}
  ) WHERE rk = 1
),
m{r} AS MATERIALIZED (
  SELECT b1.u AS src, b1.v AS dst, b1.w AS weight
  FROM best{r} b1 JOIN best{r} b2 ON b2.u = b1.v AND b2.v = b1.u
  WHERE b1.u < b1.v
),
dead{r} AS MATERIALIZED (
  SELECT id FROM dead{r - 1}
  UNION SELECT src AS id FROM m{r} UNION SELECT dst AS id FROM m{r}
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT src, dst, weight FROM m{r}" for r in range(1, rounds + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f",\nmatching AS (\n  {union}\n)\n"
    )


def _matching_sql(rounds: int = MATCH_ROUNDS) -> str:
    return (
        _matching_prefix_sql(rounds)
        + "SELECT src, dst, weight FROM matching ORDER BY src"
    )


SQL_MATCHING = _matching_sql()


# ---------------------------------------------------------------------------
# BSuitorMatcher b-matching (matching/BSuitorMatcher.cpp:42-121, Khan
# et al. 2016): synchronous locally-dominant rounds — every node with
# remaining capacity rem(u) picks its top rem(u) live incident edges
# (weight desc, dst asc — the MatchingNode order, hpp:36-41); an edge
# is matched iff both endpoints picked it.  The oracle replays the same
# rounds with ROW_NUMBER <= rem; the Spark side must converge within
# the unrolled round budget (explicit raise).  Parity with the
# reference's sequential propose/displace loop is pinned by
# tests/test_matching.py::test_bsuitor_matches_reference_replica.
# ---------------------------------------------------------------------------

BMATCH_B = 2
BMATCH_ROUNDS = 14


def q_bmatching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.matching import bsuitor_matching

    g = load_graph(spark, sf_dir)
    we = g.edges.select(
        "src",
        "dst",
        (((F.col("src") * 1009 + F.col("dst")) * 2654435761) % 2147483648)
        .cast("double")
        .alias("weight"),
    )
    gw = Graph(we, vertices=g.nodes(), directed=False, weighted=True)
    m, info = bsuitor_matching(gw, b=BMATCH_B, max_rounds=BMATCH_ROUNDS)
    if not info.converged:  # must survive python -O
        raise AssertionError(
            f"bsuitor_matching did not converge in {BMATCH_ROUNDS} rounds"
        )
    return m.select("src", "dst", "weight").orderBy("src", "dst")


def _bmatching_sql(b: int = BMATCH_B, rounds: int = BMATCH_ROUNDS) -> str:
    parts = [
        """wadj AS MATERIALIZED (
  SELECT src, dst,
         CAST(((LEAST(src,dst) * 1009 + GREATEST(src,dst)) * 2654435761)
              % 2147483648 AS DOUBLE) AS w
  FROM adj
)""",
        "bm0 AS (SELECT src, dst, w FROM wadj WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""rem{r} AS MATERIALIZED (
  SELECT n.id, {b} - COALESCE(u.c, 0) AS rem
  FROM nodes n LEFT JOIN (
    SELECT id, COUNT(*) AS c FROM (
      SELECT src AS id FROM bm{r - 1} UNION ALL SELECT dst FROM bm{r - 1}
    ) GROUP BY id
  ) u ON u.id = n.id
),
liv{r} AS MATERIALIZED (
  SELECT a.src, a.dst, a.w FROM wadj a
  JOIN rem{r} r1 ON r1.id = a.src AND r1.rem > 0
  JOIN rem{r} r2 ON r2.id = a.dst AND r2.rem > 0
  WHERE NOT EXISTS (SELECT 1 FROM bm{r - 1} m
                    WHERE (m.src = a.src AND m.dst = a.dst)
                       OR (m.src = a.dst AND m.dst = a.src))
),
pk{r} AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT l.src, l.dst, l.w,
           ROW_NUMBER() OVER (PARTITION BY l.src
                              ORDER BY l.w DESC, l.dst ASC) AS rk,
           r1.rem
    FROM liv{r} l JOIN rem{r} r1 ON r1.id = l.src
  ) WHERE rk <= rem
),
bm{r} AS MATERIALIZED (
  SELECT src, dst, w FROM bm{r - 1}
  UNION ALL
  SELECT p1.src, p1.dst, p1.w
  FROM pk{r} p1 JOIN pk{r} p2 ON p2.src = p1.dst AND p2.dst = p1.src
  WHERE p1.src < p1.dst
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f"\nSELECT src, dst, w AS weight FROM bm{rounds} "
        "ORDER BY src, dst"
    )


SQL_BMATCHING = _bmatching_sql()


# ---------------------------------------------------------------------------
# DynBetweenness (centrality/DynBetweenness.cpp, iBet) — incremental
# exact betweenness under edge insertions.  The Spark side initializes
# on the id%3 subgraph, applies the VALID candidate insertions (both
# endpoints exist, edge absent — the same predicate the oracle
# evaluates) one by one through the closed-form pair-dependency deltas;
# the oracle is a static full Brandes on the post-insertion edge set —
# the reference's own update-vs-recompute contract
# (DynBetweennessGTest.cpp:201-246), cross-engine.
# ---------------------------------------------------------------------------

DYNBC_HOPS = 48
DYNBC_CANDS = [(3, 501), (63, 903), (198, 786)]


def q_dyn_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.dynbetweenness import DynBetweenness

    g = load_graph(spark, sf_dir)
    e2 = g.edges.filter(
        (F.col("src") % 3 == 0) & (F.col("dst") % 3 == 0)
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    sub = Graph(e2, vertices=None, directed=False, weighted=False)
    node_ids = {int(r["id"]) for r in sub.nodes().collect()}
    present = {
        (int(r["src"]), int(r["dst"]))
        for r in e2.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).collect()
    }
    dyn = DynBetweenness(sub)
    dyn.run()
    maxd = dyn.P.agg(F.max("dist").alias("m")).collect()[0]["m"]
    if int(maxd or 0) > DYNBC_HOPS:  # must survive python -O
        raise AssertionError(
            f"subgraph eccentricity {maxd} exceeds the oracle unroll "
            f"{DYNBC_HOPS}"
        )
    for u, v in DYNBC_CANDS:
        if u in node_ids and v in node_ids \
                and (min(u, v), max(u, v)) not in present:
            dyn.update(u, v)
    return (
        dyn.scores()
        .select("id", F.round("score", 6).alias("score"))
        .orderBy("id")
    )


def _dyn_betweenness_sql(hops: int = DYNBC_HOPS) -> str:
    cand = " UNION ALL ".join(
        f"SELECT {u} AS u, {v} AS v" for u, v in DYNBC_CANDS
    )
    parts = [
        """e2 AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE src % 3 = 0 AND dst % 3 = 0
),
n2 AS (SELECT DISTINCT src AS id FROM (
  SELECT src FROM e2 UNION ALL SELECT dst AS src FROM e2
))""",
        f"cand AS ({cand})",
        """valid AS (
  SELECT u, v FROM cand
  WHERE EXISTS (SELECT 1 FROM n2 WHERE n2.id = cand.u)
    AND EXISTS (SELECT 1 FROM n2 WHERE n2.id = cand.v)
    AND NOT EXISTS (SELECT 1 FROM e2 e
                    WHERE e.src = LEAST(cand.u, cand.v)
                      AND e.dst = GREATEST(cand.u, cand.v))
)""",
        """e3 AS MATERIALIZED (
  SELECT src, dst FROM e2
  UNION
  SELECT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM valid
),
adj3 AS (
  SELECT src, dst FROM e3 UNION ALL SELECT dst AS src, src AS dst FROM e3
)""",
        "f0 AS MATERIALIZED (SELECT id AS s, id AS v, 1.0 AS sigma FROM n2)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma
  FROM f{l - 1} p JOIN adj3 a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    parts.append(
        f"d{hops} AS MATERIALIZED (SELECT s, v, sigma, 0.0 AS delta FROM f{hops})"
    )
    for l in range(hops - 1, -1, -1):
        parts.append(
            f"""d{l} AS MATERIALIZED (
  SELECT c.s, c.v, c.sigma, COALESCE(x.d, 0.0) AS delta
  FROM f{l} c LEFT JOIN (
    SELECT c2.s, c2.v, SUM((c2.sigma / w.sigma) * (1.0 + w.delta)) AS d
    FROM f{l} c2
    JOIN adj3 a ON a.src = c2.v
    JOIN d{l + 1} w ON w.s = c2.s AND w.v = a.dst
    GROUP BY c2.s, c2.v
  ) x ON x.s = c.s AND x.v = c.v
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT s, v, delta FROM d{l}" for l in range(hops + 1)
    )
    parts.append(
        f"""alldep AS (
  {union}
),
bc AS (SELECT v AS id, SUM(delta) AS score FROM alldep WHERE s <> v GROUP BY v)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT n.id, ROUND(COALESCE(b.score, 0.0), 6) AS score"
        "\nFROM n2 n LEFT JOIN bc b ON b.id = n.id ORDER BY n.id"
    )


SQL_DYN_BETWEENNESS = _dyn_betweenness_sql()


# ---------------------------------------------------------------------------
# DynBetweennessOneNode (centrality/DynBetweennessOneNode.cpp) — the
# focus node's betweenness maintained incrementally; bcx derived from
# the repaired APSP sigma relation (sigmax = product rule through x).
# Oracle: the same forward sigma unroll on the POST-insertion graph,
# then two joins through x — no dependency sweep needed.
# ---------------------------------------------------------------------------


def q_dyn_bc_one_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.dynbetweennessonenode import (
        DynBetweennessOneNode,
    )

    g = load_graph(spark, sf_dir)
    e2 = g.edges.filter(
        (F.col("src") % 3 == 0) & (F.col("dst") % 3 == 0)
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    sub = Graph(e2, vertices=None, directed=False, weighted=False)
    node_ids = {int(r["id"]) for r in sub.nodes().collect()}
    present = {
        (int(r["src"]), int(r["dst"]))
        for r in e2.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).collect()
    }
    x = min(node_ids)
    dyn = DynBetweennessOneNode(sub, x)
    bcx = dyn.run()
    maxd = dyn.P.agg(F.max("dist").alias("m")).collect()[0]["m"]
    if int(maxd or 0) > DYNBC_HOPS:  # must survive python -O
        raise AssertionError(
            f"subgraph eccentricity {maxd} exceeds the oracle unroll "
            f"{DYNBC_HOPS}"
        )
    for u, v in DYNBC_CANDS:
        if u in node_ids and v in node_ids \
                and (min(u, v), max(u, v)) not in present:
            bcx = dyn.update(u, v)
    return spark.createDataFrame(
        [(int(x), round(bcx, 6))], "x long, bcx double"
    )


def _dyn_bc_one_node_sql(hops: int = DYNBC_HOPS) -> str:
    cand = " UNION ALL ".join(
        f"SELECT {u} AS u, {v} AS v" for u, v in DYNBC_CANDS
    )
    parts = [
        """e2 AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE src % 3 = 0 AND dst % 3 = 0
),
n2 AS (SELECT DISTINCT src AS id FROM (
  SELECT src FROM e2 UNION ALL SELECT dst AS src FROM e2
)),
xn AS (SELECT MIN(id) AS x FROM n2)""",
        f"cand AS ({cand})",
        """valid AS (
  SELECT u, v FROM cand
  WHERE EXISTS (SELECT 1 FROM n2 WHERE n2.id = cand.u)
    AND EXISTS (SELECT 1 FROM n2 WHERE n2.id = cand.v)
    AND NOT EXISTS (SELECT 1 FROM e2 e
                    WHERE e.src = LEAST(cand.u, cand.v)
                      AND e.dst = GREATEST(cand.u, cand.v))
)""",
        """e3 AS MATERIALIZED (
  SELECT src, dst FROM e2
  UNION
  SELECT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM valid
),
adj3 AS (
  SELECT src, dst FROM e3 UNION ALL SELECT dst AS src, src AS dst FROM e3
)""",
        "f0 AS MATERIALIZED (SELECT id AS s, id AS v, 1.0 AS sigma FROM n2)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma
  FROM f{l - 1} p JOIN adj3 a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT s, v, sigma, {l} AS dist FROM f{l}" for l in range(hops + 1)
    )
    parts.append(f"sig AS MATERIALIZED (\n  {union}\n)")
    parts.append(
        """xa AS (SELECT s, dist AS da, sigma AS sa
      FROM sig WHERE v = (SELECT x FROM xn)),
xb AS (SELECT v AS t, dist AS db, sigma AS sb
      FROM sig WHERE s = (SELECT x FROM xn))"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT CAST((SELECT x FROM xn) AS BIGINT) AS x,"
        "\n  ROUND(COALESCE(SUM(sa * sb / r.sigma), 0.0), 6) AS bcx"
        "\nFROM sig r"
        "\nJOIN xa ON xa.s = r.s"
        "\nJOIN xb ON xb.t = r.v"
        "\nWHERE r.s <> (SELECT x FROM xn) AND r.v <> (SELECT x FROM xn)"
        "\n  AND xa.da + xb.db = r.dist"
    )


SQL_DYN_BC_ONE_NODE = _dyn_bc_one_node_sql()


# ---------------------------------------------------------------------------
# DynApproxBetweenness (centrality/DynApproxBetweenness.cpp) — the
# incremental path-resampling estimator.  Spark applies the valid
# candidate insertions one by one, re-sampling only affected paths; the
# oracle replays the STATIC approx sampler on the post-insertion edge
# relation with the same md5 draws — identical by the module's
# determinism argument (pinned exactly, dyn == static, in
# tests/test_dynapproxbetweenness.py).
# ---------------------------------------------------------------------------

DYNABC_CANDS = [(14, 612), (73, 402), (255, 908)]


def q_dyn_approx_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.dynapproxbetweenness import (
        DynApproxBetweenness,
    )

    g = load_graph(spark, sf_dir)
    node_ids = {int(r["id"]) for r in g.nodes().collect()}
    present = {
        (int(r["src"]), int(r["dst"]))
        for r in g.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).collect()
    }
    dyn = DynApproxBetweenness(
        g, epsilon=ABC_EPS, delta=ABC_DELTA, seed=ABC_SEED, vd=ABC_VD,
        max_hops=DIAM_HOPS,
    )
    dyn.run()
    for u, v in DYNABC_CANDS:
        if u in node_ids and v in node_ids \
                and (min(u, v), max(u, v)) not in present:
            dyn.update(u, v)
    return (
        dyn.scores()
        .select("id", F.round("score", 6).alias("score"))
        .orderBy("id")
    )


def _dyn_approx_betweenness_sql(hops: int = DIAM_HOPS) -> str:
    cand = " UNION ALL ".join(
        f"SELECT {u} AS u, {v} AS v" for u, v in DYNABC_CANDS
    )
    prelude = [
        f"cand AS ({cand})",
        """valid AS (
  SELECT u, v FROM cand
  WHERE EXISTS (SELECT 1 FROM nodes WHERE nodes.id = cand.u)
    AND EXISTS (SELECT 1 FROM nodes WHERE nodes.id = cand.v)
    AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = LEAST(cand.u, cand.v)
                      AND e.dst = GREATEST(cand.u, cand.v))
)""",
        """e3 AS MATERIALIZED (
  SELECT src, dst FROM edges
  UNION
  SELECT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM valid
),
adj3 AS (
  SELECT src, dst FROM e3 UNION ALL SELECT dst AS src, src AS dst FROM e3
)""",
    ]
    return _approx_betweenness_sql(hops=hops, adj="adj3", prelude=prelude)


SQL_DYN_APPROX_BETWEENNESS = _dyn_approx_betweenness_sql()


# ---------------------------------------------------------------------------
# ApproxCloseness (centrality/ApproxCloseness.cpp, undirected hybrid
# estimator) — k md5-ranked samples, pivot argmin (ties to smallest
# pivot index), LC/HC split + per-pivot distance-level tails; see
# operators/approxcloseness.py for the documented deterministic
# deviations.  The oracle replays the identical closed form.
# ---------------------------------------------------------------------------

APC_K = 16
APC_EPS = 0.5
APC_SEED = 42


def q_approx_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.approxcloseness import approx_closeness

    g = load_graph(spark, sf_dir)
    scores, _ = approx_closeness(
        g, n_samples=APC_K, epsilon=APC_EPS, normalized=True, seed=APC_SEED
    )
    return scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _approx_closeness_sql(
    hops: int = 12, k: int = APC_K, eps: float = APC_EPS, seed: int = APC_SEED
) -> str:
    parts = [
        f"""smp AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY md5('{seed}|s|' || CAST(id AS VARCHAR)), id) - 1 AS j,
         id AS sid
  FROM nodes
  ORDER BY md5('{seed}|s|' || CAST(id AS VARCHAR)), id
  LIMIT {k}
)""",
        "kk AS (SELECT COUNT(*) AS k FROM smp)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "t0 AS MATERIALIZED (SELECT j, sid AS v, CAST(0 AS BIGINT) AS d FROM smp)",
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.j, m.j) AS j, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.d, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS d
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.j, a.dst AS v, MIN(q.d + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.j, a.dst
  ) m ON m.j = p.j AND m.v = p.v
)"""
        )
    parts.append(f"dd AS MATERIALIZED (SELECT j, v, d FROM t{hops})")
    parts.append(
        """piv AS MATERIALIZED (
  SELECT v, CAST(d AS DOUBLE) AS delta, j AS pj FROM (
    SELECT v, d, j, ROW_NUMBER() OVER (PARTITION BY v ORDER BY d, j) AS rk
    FROM dd
  ) WHERE rk = 1
)""",
    )
    parts.append(
        """dps AS MATERIALIZED (
  SELECT dd.j, s.j AS pj, dd.d AS dsp
  FROM dd JOIN smp s ON s.sid = dd.v
)""",
    )
    parts.append(
        f"""cls AS MATERIALIZED (
  SELECT p.v,
         SUM(CASE WHEN lc THEN CAST(p.d AS DOUBLE) ELSE 0.0 END) AS lcsum,
         SUM(CASE WHEN lc THEN 1 ELSE 0 END) AS lcnum,
         SUM(CASE WHEN lc THEN 0.0 ELSE CAST(p.d AS DOUBLE) END) AS hcsum
  FROM (
    SELECT dd.v, dd.d,
           (CAST(dd.d AS DOUBLE) <= pv.delta * (1.0 / {eps} - 1.0)
            OR (q.dsp IS NOT NULL
                AND CAST(q.dsp AS DOUBLE) <= pv.delta / {eps})) AS lc
    FROM dd
    JOIN piv pv ON pv.v = dd.v
    LEFT JOIN dps q ON q.j = dd.j AND q.pj = pv.pj
    WHERE NOT EXISTS (SELECT 1 FROM smp WHERE smp.sid = dd.v)
  ) p
  GROUP BY p.v
)"""
    )
    parts.append(
        """lvl AS MATERIALIZED (
  SELECT j, d, COUNT(*) AS cnt, SUM(d) AS sumd FROM dd
  WHERE NOT EXISTS (SELECT 1 FROM smp WHERE smp.sid = dd.v)
  GROUP BY j, d
)"""
    )
    parts.append(
        f"""hs AS MATERIALIZED (
  SELECT pv.v, SUM(l.sumd) AS hsum, SUM(l.cnt) AS hnum
  FROM piv pv JOIN lvl l ON l.j = pv.pj
  WHERE CAST(l.d AS DOUBLE) > pv.delta / {eps}
    AND NOT EXISTS (SELECT 1 FROM smp WHERE smp.sid = pv.v)
  GROUP BY pv.v
)"""
    )
    parts.append(
        f"""est AS (
  SELECT c.v AS id,
         CASE WHEN c.lcnum > 0 AND
                   (COALESCE(CAST(h.hsum AS DOUBLE), 0.0) + c.hcsum
                    + c.lcsum * (((SELECT n FROM nn) - 1.0)
                                 - COALESCE(CAST(h.hnum AS DOUBLE), 0.0)
                                 - (SELECT CAST(k AS DOUBLE) FROM kk)
                                 + CAST(c.lcnum AS DOUBLE))
                      / CAST(c.lcnum AS DOUBLE)) > 0
              THEN ((SELECT n FROM nn) - 1.0)
                   / (COALESCE(CAST(h.hsum AS DOUBLE), 0.0) + c.hcsum
                      + c.lcsum * (((SELECT n FROM nn) - 1.0)
                                   - COALESCE(CAST(h.hnum AS DOUBLE), 0.0)
                                   - (SELECT CAST(k AS DOUBLE) FROM kk)
                                   + CAST(c.lcnum AS DOUBLE))
                        / CAST(c.lcnum AS DOUBLE))
              ELSE 0.0 END AS score
  FROM cls c LEFT JOIN hs h ON h.v = c.v
),
exct AS (
  SELECT s.sid AS id,
         CASE WHEN SUM(dd.d) > 0
              THEN ((SELECT n FROM nn) - 1.0) / CAST(SUM(dd.d) AS DOUBLE)
              ELSE 0.0 END AS score
  FROM smp s JOIN dd ON dd.j = s.j
  GROUP BY s.sid
)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + """
SELECT n.id, ROUND(COALESCE(u.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN (
  SELECT id, score FROM est UNION ALL SELECT id, score FROM exct
) u ON u.id = n.id
ORDER BY n.id"""
    )


SQL_APPROX_CLOSENESS = _approx_closeness_sql()


# ---------------------------------------------------------------------------
# LFMLocal (scd/LFMLocal.cpp, alpha=1 fitness 2w/(2w+cut)) — LFM_STEPS
# capped add-then-prune rounds from the max-degree seed; each oracle
# round unrolls the add argmax plus LFM_RM removal argmins (extra
# removal blocks no-op when the prune loop already converged; the Spark
# side raises if any round needed more — explicit, survives python -O).
# Ties break to the smallest id (documented deviation; the reference
# picks uniformly among ties).
# ---------------------------------------------------------------------------

LFM_STEPS = 10
LFM_RM = 2


def q_scd_lfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scd import lfm_local

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, q, info = lfm_local(g, [seed], alpha=1.0, max_steps=LFM_STEPS)
    if any(m["removals"] > LFM_RM for m in info.metrics):
        raise AssertionError(
            f"lfm_local needed more than {LFM_RM} removals in a round — "
            "raise the oracle unroll"
        )
    return com.select("id", F.round(F.lit(q), 6).alias("q")).orderBy("id")


def _scd_lfm_sql(steps: int = LFM_STEPS, rm: int = LFM_RM) -> str:
    def scal(tag: str, com: str) -> str:
        return f"""ws{tag} AS (
  SELECT CAST((SELECT COUNT(*) FROM edges e
               JOIN {com} x ON x.id = e.src
               JOIN {com} y ON y.id = e.dst) AS DOUBLE) AS w,
         CAST((SELECT COALESCE(SUM(d.degree), 0) FROM deg d
               JOIN {com} c ON c.id = d.id) AS DOUBLE) AS vol
),
qq{tag} AS (
  SELECT w, vol - 2 * w AS cut,
         CASE WHEN 2 * w + (vol - 2 * w) > 0
              THEN 2 * w / (2 * w + (vol - 2 * w)) ELSE 0.0 END AS q
  FROM ws{tag}
)"""

    parts = [
        """com0 AS MATERIALIZED (
  SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1
),
seedn AS (SELECT id FROM com0)"""
    ]
    for t in range(1, steps + 1):
        prev = f"com{t - 1}"
        parts.append(scal(f"a{t}", prev))
        dq_add = f"""ROUND(CASE WHEN 2 * (z.w + s.intdeg)
                     + (z.cut - s.intdeg + (d.degree - s.intdeg)) > 0
                THEN 2 * (z.w + s.intdeg)
                     / (2 * (z.w + s.intdeg)
                        + (z.cut - s.intdeg + (d.degree - s.intdeg)))
                ELSE 0.0 END - z.q, 9)"""
        parts.append(
            f"""sh{t} AS (
  SELECT a.src AS v, CAST(COUNT(*) AS DOUBLE) AS intdeg
  FROM adj a JOIN {prev} c ON c.id = a.dst
  WHERE a.src NOT IN (SELECT id FROM {prev})
  GROUP BY a.src
),
ad{t} AS (
  SELECT s.v
  FROM sh{t} s JOIN deg d ON d.id = s.v, qqa{t} z
  WHERE {dq_add} > 0
  ORDER BY {dq_add} DESC, s.v ASC
  LIMIT 1
),
cr{t}_0 AS MATERIALIZED (
  SELECT id FROM {prev} UNION ALL SELECT v AS id FROM ad{t}
)"""
        )
        for k in range(1, rm + 1):
            cur = f"cr{t}_{k - 1}"
            parts.append(scal(f"r{t}_{k}", cur))
            dq_rm = f"""ROUND(z.q - CASE WHEN 2 * (z.w - m.intdeg)
                     + (z.cut + m.intdeg - (m.degree - m.intdeg)) > 0
                THEN 2 * (z.w - m.intdeg)
                     / (2 * (z.w - m.intdeg)
                        + (z.cut + m.intdeg - (m.degree - m.intdeg)))
                ELSE 0.0 END, 9)"""
            parts.append(
                f"""cm{t}_{k} AS (
  SELECT c.id AS v,
         CAST(COALESCE((SELECT COUNT(*) FROM adj a
                        JOIN {cur} x ON x.id = a.dst
                        WHERE a.src = c.id), 0) AS DOUBLE) AS intdeg,
         d.degree
  FROM {cur} c JOIN deg d ON d.id = c.id
  WHERE c.id NOT IN (SELECT id FROM seedn)
),
rm{t}_{k} AS (
  SELECT m.v FROM cm{t}_{k} m, qqr{t}_{k} z
  WHERE {dq_rm} < 0
  ORDER BY {dq_rm} ASC, m.v ASC
  LIMIT 1
),
cr{t}_{k} AS MATERIALIZED (
  SELECT id FROM {cur}
  WHERE id NOT IN (SELECT v FROM rm{t}_{k})
)"""
            )
        parts.append(f"com{t} AS MATERIALIZED (SELECT id FROM cr{t}_{rm})")
    parts.append(scal("f", f"com{steps}"))
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT c.id, ROUND((SELECT q FROM qqf), 6) AS q
FROM com{steps} c ORDER BY c.id"""
    )


SQL_SCD_LFM = _scd_lfm_sql()


# ---------------------------------------------------------------------------
# ApproxGroupBetweenness (centrality/ApproxGroupBetweenness.cpp,
# Mahmoody et al. hyperedge sampling + greedy max-coverage) — the
# oracle replays the md5 pair draws, the uniform-predecessor path
# walk, and the unrolled greedy rounds (ties smallest id, documented).
# ---------------------------------------------------------------------------

GB_K = 4
GB_EPS = 0.8
GB_SEED = 4242


def q_group_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groupcentrality import (
        approx_group_betweenness,
    )

    g = load_graph(spark, sf_dir)
    group, _ = approx_group_betweenness(
        g, group_size=GB_K, epsilon=GB_EPS, seed=GB_SEED, max_hops=DIAM_HOPS
    )
    return spark.createDataFrame(
        [(i + 1, u) for i, u in enumerate(group)], "rank long, id long"
    ).orderBy("rank")


def _group_betweenness_sql(
    hops: int = DIAM_HOPS, k: int = GB_K, eps: float = GB_EPS,
    seed: int = GB_SEED,
) -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    hu = horner(f"md5('{seed}|u|' || CAST(i AS VARCHAR))")
    hv = horner(f"md5('{seed}|v|' || CAST(i AS VARCHAR))")
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"""rr AS (
  SELECT CAST(CEIL({k} * LN(CAST(n AS DOUBLE)) / ({eps} * {eps})) AS BIGINT)
         AS r
  FROM nn
)""",
        "idx AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 "
        "AS idx FROM nodes)",
        f"""smp AS MATERIALIZED (
  SELECT i, hu % (SELECT n FROM nn) AS uidx,
         (hu % (SELECT n FROM nn) + 1
          + hv % ((SELECT n FROM nn) - 1)) % (SELECT n FROM nn) AS vidx
  FROM (SELECT i, {hu} AS hu, {hv} AS hv
        FROM range(1000000) t(i) WHERE i < (SELECT r FROM rr))
)""",
        """pairs AS MATERIALIZED (
  SELECT m.i, iu.id AS s, iv.id AS t
  FROM smp m JOIN idx iu ON iu.idx = m.uidx JOIN idx iv ON iv.idx = m.vidx
)""",
        "f0 AS MATERIALIZED (SELECT DISTINCT s, s AS v, 1.0 AS sigma, "
        "CAST(0 AS BIGINT) AS dist FROM pairs)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma, CAST({l} AS BIGINT) AS dist
  FROM f{l - 1} p JOIN adj a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    sig_union = "\n  UNION ALL ".join(
        f"SELECT s, v, dist FROM f{l}" for l in range(hops + 1)
    )
    parts.append(f"sig AS MATERIALIZED (\n  {sig_union}\n)")
    parts.append(
        """w0 AS MATERIALIZED (
  SELECT p.i, p.s, p.t, g.dist AS td
  FROM pairs p JOIN sig g ON g.s = p.s AND g.v = p.t
  WHERE g.dist > 0
)"""
    )
    for kk in range(1, hops + 1):
        u01 = (
            horner(f"md5('{seed}|p|' || CAST(i AS VARCHAR) || '|{kk}')")
            + " / POWER(16.0, 13)"
        )
        parts.append(
            f"""pre{kk} AS MATERIALIZED (
  SELECT w.i, w.s, a.src AS z, sz.dist AS zd
  FROM w{kk - 1} w
  JOIN adj a ON a.dst = w.t
  JOIN sig sz ON sz.s = w.s AND sz.v = a.src AND sz.dist = w.td - 1
),
ch{kk} AS MATERIALIZED (
  SELECT i, s, z, zd FROM (
    SELECT i, s, z, zd,
           SUM(1.0) OVER (PARTITION BY i ORDER BY z) AS cum,
           {u01} * (COUNT(*) OVER (PARTITION BY i)) AS thr
    FROM pre{kk}
  ) q WHERE cum > thr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY i ORDER BY z) = 1
),
hb{kk} AS (SELECT i, z FROM ch{kk} WHERE z <> s),
w{kk} AS MATERIALIZED (
  SELECT i, s, z AS t, zd AS td FROM ch{kk} WHERE z <> s
)"""
        )
    allh = "\n  UNION ALL ".join(
        f"SELECT i, z FROM hb{kk}" for kk in range(1, hops + 1)
    )
    parts.append(
        f"hyper AS MATERIALIZED (\n  SELECT DISTINCT i, z FROM (\n  {allh}\n  )\n)"
    )
    parts.append("cov0 AS (SELECT i FROM hyper WHERE FALSE)")
    parts.append("grp0 AS (SELECT id FROM nodes WHERE FALSE)")
    for rnd in range(1, k + 1):
        parts.append(
            f"""pk{rnd} AS MATERIALIZED (
  SELECT n.id FROM nodes n
  LEFT JOIN (
    SELECT z AS id, COUNT(DISTINCT i) AS gain FROM hyper
    WHERE i NOT IN (SELECT i FROM cov{rnd - 1})
    GROUP BY z
  ) g ON g.id = n.id
  WHERE n.id NOT IN (SELECT id FROM grp{rnd - 1})
  ORDER BY COALESCE(g.gain, 0) DESC, n.id ASC
  LIMIT 1
),
grp{rnd} AS MATERIALIZED (
  SELECT id FROM grp{rnd - 1} UNION ALL SELECT id FROM pk{rnd}
),
cov{rnd} AS MATERIALIZED (
  SELECT i FROM cov{rnd - 1}
  UNION
  SELECT i FROM hyper WHERE z = (SELECT id FROM pk{rnd})
)"""
        )
    ranks = "\n  UNION ALL ".join(
        f"SELECT {rnd} AS rank, (SELECT id FROM pk{rnd}) AS id"
        for rnd in range(1, k + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT rank, id FROM (\n  {ranks}\n) ORDER BY rank"
    )


SQL_GROUP_BETWEENNESS = _group_betweenness_sql()


# ---------------------------------------------------------------------------
# Group centralities (centrality/GroupDegree.cpp:41-124,
# GroupHarmonicCloseness.cpp) — exact greedy with the documented
# smallest-id tie-break; the oracle unrolls the k selection rounds.
# ---------------------------------------------------------------------------

GROUPDEG_K = 8
GROUPHARM_K = 4


def q_group_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groupcentrality import group_degree

    g = load_graph(spark, sf_dir)
    group, score = group_degree(g, k=GROUPDEG_K)
    return spark.createDataFrame(
        [(i + 1, u, score) for i, u in enumerate(group)],
        "rank long, id long, score long",
    )


def _group_degree_sql(k: int = GROUPDEG_K) -> str:
    parts = [
        "grp0 AS (SELECT id FROM nodes WHERE FALSE)",
        "cov0 AS (SELECT id FROM nodes WHERE FALSE)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""gain{i} AS MATERIALIZED (
  SELECT n.id,
         COALESCE((SELECT COUNT(*) FROM adj a
                   WHERE a.src = n.id AND NOT EXISTS
                     (SELECT 1 FROM cov{i - 1} c WHERE c.id = a.dst)), 0)
         + CASE WHEN NOT EXISTS
                  (SELECT 1 FROM cov{i - 1} c WHERE c.id = n.id)
                THEN 1 ELSE 0 END AS gain
  FROM nodes n
  WHERE NOT EXISTS (SELECT 1 FROM grp{i - 1} g WHERE g.id = n.id)
),
pick{i} AS MATERIALIZED (
  SELECT id FROM gain{i} ORDER BY gain DESC, id ASC LIMIT 1
),
grp{i} AS MATERIALIZED (
  SELECT id FROM grp{i - 1} UNION ALL SELECT id FROM pick{i}
),
cov{i} AS MATERIALIZED (
  SELECT id FROM cov{i - 1}
  UNION SELECT id FROM pick{i}
  UNION SELECT a.dst AS id FROM adj a
  WHERE a.src IN (SELECT id FROM pick{i})
)"""
        )
    ranks = "\n  UNION ALL ".join(
        f"SELECT {i} AS rank, (SELECT id FROM pick{i}) AS id"
        for i in range(1, k + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f""",
ranks AS (
  {ranks}
)
SELECT rank, id, (SELECT COUNT(*) FROM cov{k}) AS score
FROM ranks ORDER BY rank"""
    )


SQL_GROUP_DEGREE = _group_degree_sql()


def q_group_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groupcentrality import (
        group_harmonic_closeness,
    )

    g = load_graph(spark, sf_dir)
    # batch=1024 >= n at fixture scale: identical picks (lazy greedy is
    # batch-invariant), ONE wave per greedy round — at web scale the
    # default batch=64 bounds per-wave state to O(batch * region)
    group, score = group_harmonic_closeness(g, k=GROUPHARM_K, batch=1024)
    # F.round, not Python round: banker's rounding diverges from
    # DuckDB's half-away-from-zero on exact .5 ulp boundaries
    return spark.createDataFrame(
        [(i + 1, u, score) for i, u in enumerate(group)],
        "rank long, id long, score double",
    ).select("rank", "id", F.round("score", 6).alias("score"))


def _group_harmonic_sql(k: int = GROUPHARM_K, hops: int = DIAM_HOPS) -> str:
    steps = [
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        "FROM nodes)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    steps.append(
        f"dd AS MATERIALIZED (SELECT s, v, CAST(dist AS DOUBLE) AS dist "
        f"FROM t{hops} WHERE dist > 0)"
    )
    steps.append("grp0 AS (SELECT id FROM nodes WHERE FALSE)")
    steps.append(
        "ds0 AS (SELECT CAST(NULL AS BIGINT) AS v, "
        "CAST(NULL AS DOUBLE) AS d WHERE FALSE)"
    )
    for i in range(1, k + 1):
        steps.append(
            f"""cg{i} AS MATERIALIZED (
  SELECT c.s AS u,
         SUM(1.0 / LEAST(c.dist, COALESCE(e.d, c.dist))
             - CASE WHEN e.d IS NOT NULL THEN 1.0 / e.d ELSE 0 END) AS gain
  FROM dd c LEFT JOIN ds{i - 1} e ON e.v = c.v
  WHERE NOT EXISTS (SELECT 1 FROM grp{i - 1} g WHERE g.id = c.s)
    AND NOT EXISTS (SELECT 1 FROM grp{i - 1} g WHERE g.id = c.v)
  GROUP BY c.s
),
gn{i} AS MATERIALIZED (
  SELECT cg.u,
         cg.gain - COALESCE((SELECT 1.0 / e.d FROM ds{i - 1} e
                             WHERE e.v = cg.u), 0) AS gain
  FROM cg{i} cg
),
pick{i} AS MATERIALIZED (
  SELECT u AS id FROM gn{i} ORDER BY ROUND(gain, 9) DESC, u ASC LIMIT 1
),
grp{i} AS MATERIALIZED (
  SELECT id FROM grp{i - 1} UNION ALL SELECT id FROM pick{i}
),
ds{i} AS MATERIALIZED (
  SELECT COALESCE(e.v, c.v) AS v,
         LEAST(COALESCE(e.d, c.dist), COALESCE(c.dist, e.d)) AS d
  FROM ds{i - 1} e FULL OUTER JOIN (
    SELECT v, dist FROM dd WHERE s = (SELECT id FROM pick{i})
  ) c ON c.v = e.v
)"""
        )
    ranks = "\n  UNION ALL ".join(
        f"SELECT {i} AS rank, (SELECT id FROM pick{i}) AS id"
        for i in range(1, k + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(steps)
        + f""",
ranks AS (
  {ranks}
),
score AS (
  SELECT ROUND(SUM(1.0 / d), 6) AS sc FROM ds{k}
  WHERE NOT EXISTS (SELECT 1 FROM grp{k} g WHERE g.id = ds{k}.v)
)
SELECT rank, id, (SELECT sc FROM score) AS score
FROM ranks ORDER BY rank"""
    )


SQL_GROUP_HARMONIC = _group_harmonic_sql()


# ---------------------------------------------------------------------------
# GroupCloseness (centrality/GroupCloseness.cpp:70-156, H=0): seed = the
# TopCloseness top-1 (argmax ROUND(generalized closeness, 9), ties id
# asc — documented determinism rule), d = BFS from seed with unreached
# pinned 0 (the reference quirk), improvement(u) = d[u] +
# sum_w max(0, d[w] - d(u,w)) (integer — no float ties), score =
# (n-k)/sumDist from a fresh group BFS (GroupCloseness.hpp:103-113).
# The Spark side runs the pruned lazy-greedy; the oracle evaluates the
# dense argmax each round — identical picks (lazy == eager under
# submodular bounds).
# ---------------------------------------------------------------------------

GROUPCLO_K = 4


def q_group_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groupcentrality import group_closeness

    g = load_graph(spark, sf_dir)
    group, score, _ = group_closeness(g, k=GROUPCLO_K, batch=1024)
    return spark.createDataFrame(
        [(i + 1, u, score) for i, u in enumerate(group)],
        "rank long, id long, score double",
    ).select("rank", "id", F.round("score", 6).alias("score"))


def _group_closeness_sql(k: int = GROUPCLO_K, hops: int = DIAM_HOPS) -> str:
    steps = [
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        "FROM nodes)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    steps.append(
        f"dd AS MATERIALIZED (SELECT s, v, dist FROM t{hops} WHERE dist > 0)"
    )
    steps.append("nn AS (SELECT COUNT(*) AS n FROM nodes)")
    steps.append(
        """seed AS MATERIALIZED (
  SELECT s AS id FROM dd GROUP BY s
  ORDER BY ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(dist) AS DOUBLE)
                 / ((SELECT n FROM nn) - 1), 9) DESC, s ASC
  LIMIT 1
)"""
    )
    steps.append(
        """d0 AS MATERIALIZED (
  SELECT n.id AS v, COALESCE(x.dist, 0) AS d
  FROM nodes n LEFT JOIN dd x
    ON x.s = (SELECT id FROM seed) AND x.v = n.id
)"""
    )
    for i in range(1, k):
        steps.append(
            f"""imp{i} AS MATERIALIZED (
  SELECT c.v AS u,
         c.d + COALESCE((SELECT SUM(GREATEST(0, d2.d - x.dist))
                         FROM dd x JOIN d{i - 1} d2 ON d2.v = x.v
                         WHERE x.s = c.v), 0) AS gain
  FROM d{i - 1} c WHERE c.d > 0
),
pick{i} AS MATERIALIZED (
  SELECT u AS id FROM imp{i} ORDER BY gain DESC, u ASC LIMIT 1
),
d{i} AS MATERIALIZED (
  SELECT p.v,
         CASE WHEN p.v = (SELECT id FROM pick{i}) THEN 0
              ELSE LEAST(p.d, COALESCE(x.dist, p.d)) END AS d
  FROM d{i - 1} p LEFT JOIN dd x
    ON x.s = (SELECT id FROM pick{i}) AND x.v = p.v
)"""
        )
    members = " UNION ALL ".join(
        ["SELECT id FROM seed"]
        + [f"SELECT id FROM pick{i}" for i in range(1, k)]
    )
    ranks = "\n  UNION ALL ".join(
        ["SELECT 1 AS rank, (SELECT id FROM seed) AS id"]
        + [
            f"SELECT {i + 1} AS rank, (SELECT id FROM pick{i}) AS id"
            for i in range(1, k)
        ]
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(steps)
        + f""",
grp AS ({members}),
ranks AS (
  {ranks}
),
sumd AS (
  SELECT SUM(md) AS sd FROM (
    SELECT v, MIN(dist) AS md FROM dd
    WHERE s IN (SELECT id FROM grp) AND v NOT IN (SELECT id FROM grp)
    GROUP BY v
  )
)
SELECT rank, id,
       ROUND(CASE WHEN (SELECT sd FROM sumd) > 0
                  THEN ((SELECT CAST(n AS DOUBLE) FROM nn) - {k})
                       / (SELECT CAST(sd AS DOUBLE) FROM sumd)
                  ELSE 0.0 END, 6) AS score
FROM ranks ORDER BY rank"""
    )


SQL_GROUP_CLOSENESS = _group_closeness_sql()


# ---------------------------------------------------------------------------
# KadabraBetweenness (centrality/KadabraBetweenness.cpp, absolute mode)
# — adaptive epsilon-delta sampling; the oracle replays the identical
# md5-derandomized sample POOL, the 40-step deltaGuess bisection with
# 6-dp-quantized exp terms, and the per-epoch computeF/computeG
# stopping rule, then scores from the epochs the rule consumed.
# ---------------------------------------------------------------------------

KAD_ERR = 0.25
KAD_DELTA = 0.1
KAD_VD = 10
KAD_SF = 4
KAD_SEED = 4242


def _kad_consts():
    import math

    omega = 0.5 / (KAD_ERR * KAD_ERR) * (
        math.log2(KAD_VD - 1) + 1 + math.log(0.5 / KAD_DELTA)
    )
    tau = int(math.ceil(omega / KAD_SF))
    n_epochs = int(math.ceil(omega / tau))
    return omega, tau, n_epochs


def q_kadabra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.kadabra import kadabra_betweenness

    g = load_graph(spark, sf_dir)
    res, info = kadabra_betweenness(
        g, err=KAD_ERR, delta=KAD_DELTA, vd=KAD_VD, start_factor=KAD_SF,
        seed=KAD_SEED, max_hops=DIAM_HOPS,
    )
    if not info.converged:  # must survive python -O
        raise AssertionError("kadabra did not terminate within the pool")
    return res.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _kadabra_sql(hops: int = DIAM_HOPS) -> str:
    import math

    omega, tau, n_epochs = _kad_consts()
    pool = tau * (1 + n_epochs)
    err2 = KAD_ERR * KAD_ERR
    thr = KAD_DELTA / 2.0 * (1 - 0.001)
    dbf4 = KAD_DELTA * 0.001 / 4.0

    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    hu = horner(f"md5('{KAD_SEED}|u|' || CAST(i AS VARCHAR))")
    hv = horner(f"md5('{KAD_SEED}|v|' || CAST(i AS VARCHAR))")
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "idx AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1"
        " AS idx FROM nodes)",
        f"""smp AS MATERIALIZED (
  SELECT i, hu % (SELECT n FROM nn) AS uidx,
         (hu % (SELECT n FROM nn) + 1
          + hv % ((SELECT n FROM nn) - 1)) % (SELECT n FROM nn) AS vidx
  FROM (SELECT i, {hu} AS hu, {hv} AS hv FROM range({pool}) t(i))
)""",
        """pairs AS MATERIALIZED (
  SELECT m.i, iu.id AS s, iv.id AS t
  FROM smp m JOIN idx iu ON iu.idx = m.uidx JOIN idx iv ON iv.idx = m.vidx
)""",
        "f0 AS MATERIALIZED (SELECT DISTINCT s, s AS v, 1.0 AS sigma, "
        "CAST(0 AS BIGINT) AS dist FROM pairs)",
        "seen0 AS MATERIALIZED (SELECT s, v FROM f0)",
    ]
    for l in range(1, hops + 1):
        parts.append(
            f"""f{l} AS MATERIALIZED (
  SELECT p.s, a.dst AS v, SUM(p.sigma) AS sigma, CAST({l} AS BIGINT) AS dist
  FROM f{l - 1} p JOIN adj a ON a.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM seen{l - 1} t WHERE t.s = p.s AND t.v = a.dst
  )
  GROUP BY p.s, a.dst
),
seen{l} AS MATERIALIZED (
  SELECT s, v FROM seen{l - 1} UNION ALL SELECT s, v FROM f{l}
)"""
        )
    sig_union = "\n  UNION ALL ".join(
        f"SELECT s, v, sigma, dist FROM f{l}" for l in range(hops + 1)
    )
    parts.append(f"sig AS MATERIALIZED (\n  {sig_union}\n)")
    parts.append(
        """w0 AS MATERIALIZED (
  SELECT p.i, p.s, p.t, g.dist AS td
  FROM pairs p JOIN sig g ON g.s = p.s AND g.v = p.t
  WHERE g.dist > 0
)"""
    )
    for k in range(1, hops + 1):
        u01 = (
            horner(f"md5('{KAD_SEED}|p|' || CAST(i AS VARCHAR) || '|{k}')")
            + " / POWER(16.0, 13)"
        )
        parts.append(
            f"""pre{k} AS MATERIALIZED (
  SELECT w.i, w.s, a.src AS z, sz.sigma AS sz, sz.dist AS zd, st.sigma AS st_
  FROM w{k - 1} w
  JOIN adj a ON a.dst = w.t
  JOIN sig sz ON sz.s = w.s AND sz.v = a.src AND sz.dist = w.td - 1
  JOIN sig st ON st.s = w.s AND st.v = w.t
),
ch{k} AS MATERIALIZED (
  SELECT i, s, z, zd FROM (
    SELECT i, s, z, zd,
           SUM(sz) OVER (PARTITION BY i ORDER BY z) AS cum,
           {u01} * st_ AS thr
    FROM pre{k}
  ) q WHERE cum > thr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY i ORDER BY z) = 1
),
cb{k} AS (SELECT i, z AS id FROM ch{k} WHERE z <> s),
w{k} AS MATERIALIZED (
  SELECT i, s, z AS t, zd AS td FROM ch{k} WHERE z <> s
)"""
        )
    allc = "\n  UNION ALL ".join(
        f"SELECT i, id FROM cb{k}" for k in range(1, hops + 1)
    )
    parts.append(f"allc AS MATERIALIZED (\n  {allc}\n)")

    # phase 1 estimates + 40-step bisection for the deltaGuess exponent
    parts.append(
        f"""bet1 AS MATERIALIZED (
  SELECT id, COUNT(*) / CAST({tau} AS DOUBLE) AS bet
  FROM allc WHERE i < {tau} GROUP BY id
)""",
    )
    parts.append(
        f"bs0 AS (SELECT CAST(0 AS DOUBLE) AS a, "
        f"(1.0/{err2!r}) * LN((SELECT n FROM nn) * {4.0 * (1 - 0.001)!r}"
        f" / {KAD_DELTA!r}) AS b)"
    )
    for j in range(1, 41):
        parts.append(
            f"""bs{j} AS (
  SELECT CASE WHEN s >= {thr!r} THEN c ELSE a END AS a,
         CASE WHEN s >= {thr!r} THEN b ELSE c END AS b
  FROM (
    SELECT p.a, p.b, (p.a + p.b) / 2.0 AS c,
           (SELECT SUM(2.0 * ROUND(EXP(-((p.a + p.b) / 2.0) * {err2!r}
                                        / b1.bet), 6))
            FROM bet1 b1) AS s
    FROM bs{j - 1} p
  )
)"""
        )
    parts.append(
        f"""dgn AS MATERIALIZED (
  SELECT id, ROUND(EXP(-(SELECT b FROM bs40) * {err2!r} / bet), 9)
             + {dbf4!r} / (SELECT n FROM nn) AS dg
  FROM bet1
)"""
    )

    # per-epoch cumulative counts + the computeF/computeG stopping rule
    fins = []
    cums = []
    for e in range(1, n_epochs + 1):
        r_e = float(tau * e)
        tmp_l = omega / r_e - 1.0 / 3
        tmp_u = omega / r_e + 1.0 / 3
        parts.append(
            f"""cum{e} AS MATERIALIZED (
  SELECT id, COUNT(*) AS c FROM allc
  WHERE i >= {tau} AND i < {tau * (e + 1)} GROUP BY id
),
fg{e} AS (
  SELECT COALESCE(cm.c, 0) / {r_e!r} AS bt,
         COALESCE(d.dg, {dbf4!r} / (SELECT n FROM nn)) AS dv
  FROM nodes n2
  LEFT JOIN cum{e} cm ON cm.id = n2.id
  LEFT JOIN dgn d ON d.id = n2.id
),
fin{e} AS (
  SELECT MIN(CASE WHEN
      LEAST((LN(1.0/dv)/{r_e!r}) * (-{tmp_l!r}
             + SQRT({tmp_l!r}*{tmp_l!r} + 2*bt*{omega!r}/LN(1.0/dv))), bt)
        < {KAD_ERR!r}
  AND LEAST((LN(1.0/dv)/{r_e!r}) * ({tmp_u!r}
             + SQRT({tmp_u!r}*{tmp_u!r} + 2*bt*{omega!r}/LN(1.0/dv))),
            1.0 - bt) < {KAD_ERR!r}
  THEN 1 ELSE 0 END) AS fin FROM fg{e}
)"""
        )
        fins.append(f"SELECT {e} AS e, fin FROM fin{e}")
        cums.append(f"SELECT {e} AS e, id, c FROM cum{e}")
    parts.append("fins AS (\n  " + "\n  UNION ALL ".join(fins) + "\n)")
    parts.append(
        f"bstar AS (SELECT COALESCE(MIN(e), {n_epochs}) AS e FROM fins "
        "WHERE fin = 1)"
    )
    parts.append("cums AS (\n  " + "\n  UNION ALL ".join(cums) + "\n)")
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT n2.id,
       ROUND(COALESCE(cm.c, 0)
             / CAST({tau} * (SELECT e FROM bstar) AS DOUBLE), 6) AS score
FROM nodes n2
LEFT JOIN cums cm ON cm.e = (SELECT e FROM bstar) AND cm.id = n2.id
ORDER BY n2.id"""
    )


SQL_KADABRA = _kadabra_sql()


# ---------------------------------------------------------------------------
# Max flow, Edmonds-Karp (flow/EdmondsKarp.cpp:116-205) — unit-capacity
# s-t flow between the min-degree and max-degree contract nodes. The
# oracle unrolls 8 augmenting rounds (Spark needs <= 4 at sf0.001 and
# sf0.01; exhausted rounds are no-ops) x 12 BFS levels with the same
# min-id parent rule; flow value, minimal-cut size and id-sum are all
# engine-independent (max-flow/min-cut uniqueness).
# ---------------------------------------------------------------------------

FLOW_AUGS = 8
FLOW_LVLS = 12


def q_maxflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.flow import edmonds_karp

    g = load_graph(spark, sf_dir)
    deg = g.degrees()
    s = int(deg.orderBy(F.asc("degree"), F.asc("id")).limit(1).collect()[0]["id"])
    t = int(deg.orderBy(F.desc("degree"), F.asc("id")).limit(1).collect()[0]["id"])
    gu = Graph(
        g.edges.select("src", "dst", F.lit(1.0).alias("weight")),
        vertices=g.nodes(),
    )
    val, source_set, info = edmonds_karp(gu, s, t, max_augments=FLOW_AUGS)
    if info.iterations >= FLOW_AUGS:  # must survive python -O
        raise AssertionError("edmonds_karp hit the augment unroll bound")
    row = source_set.agg(
        F.count("*").alias("cut_size"), F.sum("id").alias("cut_sum")
    ).collect()[0]
    return spark.createDataFrame(
        [(float(val), int(row["cut_size"]), int(row["cut_sum"]))],
        "flow double, cut_size long, cut_sum long",
    )


def _maxflow_sql(augs: int = FLOW_AUGS, lvls: int = FLOW_LVLS) -> str:
    parts = [
        """st AS (
  SELECT (SELECT id FROM deg ORDER BY degree ASC, id ASC LIMIT 1) AS s,
         (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1) AS t
)""",
        "darcs AS MATERIALIZED (SELECT src, dst FROM adj)",
        "fl0 AS (SELECT CAST(NULL AS BIGINT) AS src, CAST(NULL AS BIGINT)"
        " AS dst, CAST(NULL AS DOUBLE) AS f WHERE FALSE)",
    ]
    for a in range(1, augs + 1):
        blocks = [
            f"""ra{a} AS MATERIALIZED (
  SELECT d.src, d.dst,
         1.0 - COALESCE(f1.f, 0) + COALESCE(f2.f, 0) AS r
  FROM darcs d
  LEFT JOIN fl{a - 1} f1 ON f1.src = d.src AND f1.dst = d.dst
  LEFT JOIN fl{a - 1} f2 ON f2.src = d.dst AND f2.dst = d.src
  WHERE 1.0 - COALESCE(f1.f, 0) + COALESCE(f2.f, 0) > 0
)""",
            f"vz{a}_0 AS (SELECT (SELECT s FROM st) AS v, "
            f"CAST(NULL AS BIGINT) AS par, 0 AS dist)",
            f"fr{a}_0 AS (SELECT v FROM vz{a}_0)",
        ]
        for l in range(1, lvls + 1):
            blocks.append(
                f"""nf{a}_{l} AS MATERIALIZED (
  SELECT r.dst AS v, MIN(r.src) AS par, {l} AS dist
  FROM ra{a} r JOIN fr{a}_{l - 1} q ON q.v = r.src
  WHERE NOT EXISTS (SELECT 1 FROM vz{a}_{l - 1} z WHERE z.v = r.dst)
  GROUP BY r.dst
),
vz{a}_{l} AS MATERIALIZED (
  SELECT v, par, dist FROM vz{a}_{l - 1}
  UNION ALL SELECT v, par, dist FROM nf{a}_{l}
),
fr{a}_{l} AS (SELECT v FROM nf{a}_{l})"""
            )
        pes = [f"pe{a}_0 AS (SELECT (SELECT t FROM st) AS v)"]
        arcs = []
        for j in range(1, lvls + 1):
            pes.append(
                f"""pe{a}_{j} AS (
  SELECT z.par AS v FROM pe{a}_{j - 1} p JOIN vz{a}_{lvls} z ON z.v = p.v
  WHERE z.par IS NOT NULL
)"""
            )
            arcs.append(
                f"SELECT z.par AS src, p.v AS dst FROM pe{a}_{j - 1} p "
                f"JOIN vz{a}_{lvls} z ON z.v = p.v WHERE z.par IS NOT NULL"
            )
        blocks.extend(pes)
        blocks.append(
            f"pa{a} AS MATERIALIZED (\n  " + "\n  UNION ".join(arcs) + "\n)"
        )
        blocks.append(
            f"bn{a} AS (SELECT MIN(r.r) AS b FROM ra{a} r "
            f"JOIN pa{a} p ON p.src = r.src AND p.dst = r.dst)"
        )
        blocks.append(
            f"""fl{a} AS MATERIALIZED (
  SELECT src, dst, SUM(f) AS f FROM (
    SELECT src, dst, f FROM fl{a - 1}
    UNION ALL
    SELECT p.src, p.dst, COALESCE((SELECT b FROM bn{a}), 0) AS f FROM pa{a} p
  ) GROUP BY src, dst
)"""
        )
        parts.extend(blocks)
    vals = " + ".join(f"COALESCE((SELECT b FROM bn{a}), 0)" for a in range(1, augs + 1))
    parts.append(
        f"""raf AS MATERIALIZED (
  SELECT d.src, d.dst
  FROM darcs d
  LEFT JOIN fl{augs} f1 ON f1.src = d.src AND f1.dst = d.dst
  LEFT JOIN fl{augs} f2 ON f2.src = d.dst AND f2.dst = d.src
  WHERE 1.0 - COALESCE(f1.f, 0) + COALESCE(f2.f, 0) > 0
),
reach(v) AS (
  SELECT s FROM st
  UNION
  SELECT r.dst FROM reach q JOIN raf r ON r.src = q.v
)"""
    )
    return (
        f"WITH RECURSIVE {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT ROUND({vals}, 6) AS flow,
       (SELECT COUNT(*) FROM reach) AS cut_size,
       (SELECT CAST(SUM(v) AS BIGINT) FROM reach) AS cut_sum"""
    )


SQL_MAXFLOW = _maxflow_sql()


# ---------------------------------------------------------------------------
# Dinic max flow (flow/Dinic.cpp:15-140) — directed graph built from the
# contract graph's symmetric adjacency with unit capacities (Dinic requires
# directed+weighted, :17-22).  The flow VALUE equals the undirected
# Edmonds-Karp value (max-flow/min-cut; both route the same unit
# capacities), so the oracle is the EK unroll projecting the value only.
# ---------------------------------------------------------------------------

def q_dinic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.flow import dinic

    g = load_graph(spark, sf_dir)
    deg = g.degrees()
    s = int(deg.orderBy(F.asc("degree"), F.asc("id")).limit(1).collect()[0]["id"])
    t = int(deg.orderBy(F.desc("degree"), F.asc("id")).limit(1).collect()[0]["id"])
    gd = Graph(
        g.adj().select("src", "dst", F.lit(1.0).alias("weight")),
        vertices=g.nodes(),
        directed=True,
        weighted=True,
    )
    val, info = dinic(gd, s, t, max_phases=FLOW_AUGS)
    if info.iterations >= FLOW_AUGS:  # must survive python -O
        raise AssertionError("dinic hit the phase unroll bound")
    return spark.createDataFrame([(float(val),)], "flow double").select(
        F.round("flow", 6).alias("flow")
    )


def _dinic_sql(augs: int = FLOW_AUGS, lvls: int = FLOW_LVLS) -> str:
    full = _maxflow_sql(augs, lvls)
    head, _, _ = full.rpartition("\nSELECT ROUND(")
    vals = " + ".join(
        f"COALESCE((SELECT b FROM bn{a}), 0)" for a in range(1, augs + 1)
    )
    return head + f"\nSELECT ROUND({vals}, 6) AS flow"


SQL_DINIC = _dinic_sql()


# ---------------------------------------------------------------------------
# EdgeSwitching null model (randomization/EdgeSwitching.cpp:10-51,
# batched-round variant documented in operators/randomization.py) —
# md5 bucket pairing + md5 coins; the oracle replays 3 rounds edge-set
# exactly. Degree preservation is pinned in tests/test_randomization.py.
# ---------------------------------------------------------------------------

ES_ROUNDS = 3
ES_SEED = 42
ES_BUCKETS = 64


def q_edge_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.randomization import edge_switching

    g = load_graph(spark, sf_dir)
    out, _ = edge_switching(g, rounds=ES_ROUNDS, seed=ES_SEED,
                            buckets=ES_BUCKETS)
    return out.edges.select("src", "dst").orderBy("src", "dst")


def _edge_switching_sql(rounds: int = ES_ROUNDS) -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    parts = ["ed0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for r in range(1, rounds + 1):
        kexpr = horner(
            f"md5('{ES_SEED}|{r}|' || CAST(src AS VARCHAR) || '|' "
            f"|| CAST(dst AS VARCHAR))"
        )
        cexpr = horner(
            f"md5('{ES_SEED}|c|{r}|' || CAST(e0.bucket AS VARCHAR) || '|' "
            f"|| CAST(e0.pid AS VARCHAR))"
        )
        parts.append(
            f"""ky{r} AS MATERIALIZED (
  SELECT src, dst, k, k % {ES_BUCKETS} AS bucket,
         ROW_NUMBER() OVER (PARTITION BY k % {ES_BUCKETS}
                            ORDER BY k, src, dst) - 1 AS rn
  FROM (SELECT src, dst, {kexpr} AS k FROM ed{r - 1})
),
pr{r} AS MATERIALIZED (
  SELECT *,
         CASE WHEN coin = 0 THEN LEAST(a, d) ELSE LEAST(a, c) END AS n1s,
         CASE WHEN coin = 0 THEN GREATEST(a, d) ELSE GREATEST(a, c) END AS n1d,
         CASE WHEN coin = 0 THEN LEAST(c, b) ELSE LEAST(b, d) END AS n2s,
         CASE WHEN coin = 0 THEN GREATEST(c, b) ELSE GREATEST(b, d) END AS n2d
  FROM (
    SELECT e0.bucket, e0.pid, e0.a, e0.b, e1.c, e1.d, {cexpr} % 2 AS coin
    FROM (SELECT bucket, rn // 2 AS pid, src AS a, dst AS b FROM ky{r}
          WHERE rn % 2 = 0) e0
    JOIN (SELECT bucket, rn // 2 AS pid, src AS c, dst AS d FROM ky{r}
          WHERE rn % 2 = 1) e1
      ON e1.bucket = e0.bucket AND e1.pid = e0.pid
  )
),
px{r} AS MATERIALIZED (
  SELECT * FROM pr{r} p
  WHERE n1s <> n1d AND n2s <> n2d AND NOT (n1s = n2s AND n1d = n2d)
    AND NOT EXISTS (SELECT 1 FROM ed{r - 1} e
                    WHERE e.src = p.n1s AND e.dst = p.n1d)
    AND NOT EXISTS (SELECT 1 FROM ed{r - 1} e
                    WHERE e.src = p.n2s AND e.dst = p.n2d)
),
cr{r} AS MATERIALIZED (
  SELECT bucket, pid, n1s AS s, n1d AS t FROM px{r}
  UNION ALL SELECT bucket, pid, n2s AS s, n2d AS t FROM px{r}
),
bad{r} AS MATERIALIZED (
  SELECT DISTINCT c.bucket, c.pid
  FROM cr{r} c JOIN (
    SELECT s, t FROM cr{r} GROUP BY s, t HAVING COUNT(*) > 1
  ) d ON d.s = c.s AND d.t = c.t
),
ap{r} AS MATERIALIZED (
  SELECT * FROM px{r} p
  WHERE NOT EXISTS (SELECT 1 FROM bad{r} b
                    WHERE b.bucket = p.bucket AND b.pid = p.pid)
),
ed{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM ed{r - 1} e
  WHERE NOT EXISTS (SELECT 1 FROM ap{r} p
                    WHERE (p.a = e.src AND p.b = e.dst)
                       OR (p.c = e.src AND p.d = e.dst))
  UNION ALL SELECT n1s AS src, n1d AS dst FROM ap{r}
  UNION ALL SELECT n2s AS src, n2d AS dst FROM ap{r}
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f"\nSELECT src, dst FROM ed{rounds} ORDER BY src, dst"
    )


SQL_EDGE_SWITCHING = _edge_switching_sql()


# ---------------------------------------------------------------------------
# MaximalCliques (clique/MaximalCliques.cpp, Eppstein-Löffler-Strash) —
# gate hashes the (size, count) histogram of ALL maximal cliques; the
# oracle enumerates cliques by ordered growth (extend by a larger-id
# node adjacent to every member) up to size 5 (contract max clique = 3
# at sf0.001 and sf0.01; levels 4-5 are empty guards) and filters
# maximality relationally.
# ---------------------------------------------------------------------------

CLIQUE_KMAX = 5


def q_max_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.cliques import clique_size_histogram

    g = load_graph(spark, sf_dir)
    return clique_size_histogram(g).orderBy("size")


def _max_cliques_sql(kmax: int = CLIQUE_KMAX) -> str:
    parts = ["cl1 AS (SELECT [id] AS mem, id AS last FROM nodes)"]
    for k in range(2, kmax + 1):
        parts.append(
            f"""cl{k} AS MATERIALIZED (
  SELECT list_append(c.mem, w.w) AS mem, w.w AS last
  FROM cl{k - 1} c, LATERAL (
    SELECT a.dst AS w FROM adj a
    WHERE a.dst > c.last AND list_contains(c.mem, a.src)
    GROUP BY a.dst HAVING COUNT(*) = {k - 1}
  ) w
)"""
        )
    for k in range(1, kmax + 1):
        parts.append(
            f"""mx{k} AS (
  SELECT mem FROM cl{k} c WHERE NOT EXISTS (
    SELECT 1 FROM adj a WHERE list_contains(c.mem, a.src)
    GROUP BY a.dst HAVING COUNT(*) = {k}
  )
)"""
        )
    hist = "\n  UNION ALL ".join(
        f"SELECT {k} AS size, COUNT(*) AS count FROM mx{k} HAVING COUNT(*) > 0"
        for k in range(1, kmax + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f",\nhist AS (\n  {hist}\n)\nSELECT size, count FROM hist ORDER BY size"
    )


SQL_MAX_CLIQUES = _max_cliques_sql()


# ---------------------------------------------------------------------------
# PageRankNibble SCD (scd/PageRankNibble.cpp:18-100) — synchronous-PPR
# variant (operators/scd.py): 12 PPR steps from the max-degree seed,
# eps-truncated support, conductance sweep; ranking key and conductance
# are 9-dp-rounded in both engines so ulp noise cannot flip the sweep.
# ---------------------------------------------------------------------------

SCD_ALPHA = 0.15
SCD_ITERS = 12
SCD_EPS = 1e-4


def q_scd_nibble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scd import page_rank_nibble

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    comm, cond = page_rank_nibble(
        g, seed, alpha=SCD_ALPHA, iterations=SCD_ITERS, eps=SCD_EPS
    )
    return comm.select(
        "id", F.round(F.lit(cond), 6).alias("cond")
    ).orderBy("id")


def _scd_nibble_sql(iters: int = SCD_ITERS) -> str:
    oma = 1.0 - SCD_ALPHA
    parts = [
        "seed AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1)",
        "pp0 AS (SELECT (SELECT id FROM seed) AS id, CAST(1.0 AS DOUBLE) AS pr)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""pp{t} AS MATERIALIZED (
  SELECT id, SUM(pr) AS pr FROM (
    SELECT a.dst AS id, (p.pr * (1.0 / d.degree)) * {oma!r} AS pr
    FROM pp{t - 1} p JOIN deg d ON d.id = p.id JOIN adj a ON a.src = p.id
    UNION ALL
    SELECT (SELECT id FROM seed) AS id, {SCD_ALPHA!r} AS pr
  ) GROUP BY id
)"""
        )
    parts.append(
        f"""ranked AS MATERIALIZED (
  SELECT p.id, p.pr, d.degree,
         ROW_NUMBER() OVER (ORDER BY ROUND(p.pr / d.degree, 9) DESC,
                            p.id ASC) AS rk
  FROM pp{iters} p JOIN deg d ON d.id = p.id
  WHERE p.pr >= {SCD_EPS!r}
),
iwh AS (
  SELECT GREATEST(ru.rk, rv.rk) AS rk, SUM(1.0) AS iw
  FROM edges e JOIN ranked ru ON ru.id = e.src JOIN ranked rv ON rv.id = e.dst
  GROUP BY GREATEST(ru.rk, rv.rk)
),
sweep AS (
  SELECT r.rk,
         SUM(r.degree * 1.0) OVER (ORDER BY r.rk) AS vol,
         SUM(COALESCE(h.iw, 0)) OVER (ORDER BY r.rk) AS intc
  FROM ranked r LEFT JOIN iwh h ON h.rk = r.rk
),
conds AS (
  SELECT rk,
         ROUND((vol - 2.0 * intc)
               / LEAST(vol, 2.0 * (SELECT COUNT(*) FROM edges) - vol),
               9) AS cond
  FROM sweep
  WHERE LEAST(vol, 2.0 * (SELECT COUNT(*) FROM edges) - vol) > 0
),
best AS (SELECT rk, cond FROM conds ORDER BY cond ASC, rk ASC LIMIT 1)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + """
SELECT r.id, ROUND((SELECT cond FROM best), 6) AS cond
FROM ranked r WHERE r.rk <= (SELECT rk FROM best) ORDER BY r.id"""
    )


SQL_SCD_NIBBLE = _scd_nibble_sql()


# ---------------------------------------------------------------------------
# TopHarmonicCloseness (centrality/TopHarmonicCloseness.cpp:113-167,446-451)
# — pruned top-k RAW harmonic closeness over the contract graph plus the
# same deterministic hub overlay as q_top_closeness (the bare contract
# graph is near-regular and unprunable for ANY bound).
# ---------------------------------------------------------------------------

TOPHARM_K = 10


def q_top_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.closeness import top_harmonic_closeness

    g = load_graph(spark, sf_dir)
    star = (
        g.nodes()
        .filter((F.col("id") % 7 == 1) & (F.col("id") != 0))
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    )
    edges2 = (
        g.edges.select("src", "dst")
        .unionByName(star)
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g2 = Graph(edges2, vertices=g.nodes(), directed=False, weighted=False)
    res, info = top_harmonic_closeness(g2, k=TOPHARM_K, batch=64)
    n = g2.number_of_nodes()
    if info.iterations >= n // 2:  # not `assert` — must survive python -O
        raise AssertionError(
            f"top_harmonic_closeness swept {info.iterations}/{n} nodes — "
            "pruning bound never fired"
        )
    return res.select("id", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("id")
    )


def _top_harmonic_sql(hops: int = DIAM_HOPS, k: int = TOPHARM_K) -> str:
    steps = [
        """star AS (
  SELECT CAST(0 AS BIGINT) AS src, id AS dst FROM nodes
  WHERE id % 7 = 1 AND id <> 0
),
edges2 AS (
  SELECT src, dst FROM edges UNION SELECT src, dst FROM star
),
adj2 AS (
  SELECT src, dst FROM edges2 UNION ALL SELECT dst AS src, src AS dst FROM edges2
)""",
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist "
        "FROM nodes)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj2 a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
sc AS (
  SELECT s AS id,
         SUM(CASE WHEN dist > 0 THEN CAST(1.0 AS DOUBLE) / dist
                  ELSE CAST(0.0 AS DOUBLE) END) AS h
  FROM t{hops} GROUP BY s
)
SELECT id, ROUND(h, 6) AS score FROM sc
ORDER BY ROUND(h, 9) DESC, id ASC LIMIT {k}"""
    )


SQL_TOP_HARMONIC = _top_harmonic_sql()


# ---------------------------------------------------------------------------
# DegreePreservingShuffle (randomization/DegreePreservingShuffle.cpp:20-120)
# — md5-derandomized in-class permutation; the oracle replays the exact
# ranks with per-degree-class ROW_NUMBERs.
# ---------------------------------------------------------------------------

DPS_SEED = 42


def q_degree_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.randomization import (
        degree_preserving_shuffle,
    )

    g = load_graph(spark, sf_dir)
    _, out = degree_preserving_shuffle(g, seed=DPS_SEED)
    return out.edges.select("src", "dst").orderBy("src", "dst")


SQL_DEGREE_SHUFFLE = f"""WITH {{ctes}},
key AS (
  SELECT d.id, d.degree,
         md5('{DPS_SEED}|' || CAST(d.id AS VARCHAR)) AS rnd
  FROM deg d
),
a AS (
  SELECT id, degree,
         ROW_NUMBER() OVER (PARTITION BY degree ORDER BY rnd, id) AS rk
  FROM key
),
b AS (
  SELECT id AS new_id, degree,
         ROW_NUMBER() OVER (PARTITION BY degree ORDER BY id) AS rk
  FROM deg
),
m AS (SELECT a.id, b.new_id FROM a JOIN b ON a.degree = b.degree AND a.rk = b.rk)
SELECT LEAST(ms.new_id, md.new_id) AS src,
       GREATEST(ms.new_id, md.new_id) AS dst
FROM edges e JOIN m ms ON ms.id = e.src JOIN m md ON md.id = e.dst
ORDER BY src, dst""".format(ctes=GRAPH_CTES)


# ---------------------------------------------------------------------------
# GlobalCurveball (randomization/GlobalCurveball.cpp, batched-trade
# variant — see operators/randomization.py global_curveball for the
# deviation notes). The oracle replays every trade round: md5 pairing,
# ownership coins, common-neighbor blocks, per-pair md5 redistribution,
# and whole-pair reverts on cross-pair created-edge collisions.
# ---------------------------------------------------------------------------

GC_ROUNDS = 3
GC_SEED = 42


def q_curveball(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.randomization import global_curveball

    g = load_graph(spark, sf_dir)
    out = global_curveball(g, rounds=GC_ROUNDS, seed=GC_SEED)
    return out.edges.select("src", "dst").orderBy("src", "dst")


def _curveball_sql(rounds: int = GC_ROUNDS, seed: int = GC_SEED) -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    parts = ["cb0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for r in range(1, rounds + 1):
        coin = horner(
            f"md5('{seed}|o|{r}|' || CAST(src AS VARCHAR) || '|' "
            f"|| CAST(dst AS VARCHAR))"
        )
        parts.append(
            f"""pm{r} AS MATERIALIZED (
  SELECT id,
         (ROW_NUMBER() OVER (
            ORDER BY md5('{seed}|t|{r}|' || CAST(id AS VARCHAR)), id) - 1)
         AS rn
  FROM nodes
),
pm2{r} AS (SELECT id, rn // 2 AS pid, rn % 2 AS side FROM pm{r}),
pr{r} AS (
  SELECT pid, MAX(CASE WHEN side = 0 THEN id END) AS u,
              MAX(CASE WHEN side = 1 THEN id END) AS v
  FROM pm2{r} GROUP BY pid
),
ee{r} AS (
  SELECT e.src, e.dst, a.pid AS psrc, a.side AS ssrc,
         b.pid AS pdst, b.side AS sdst
  FROM cb{r - 1} e JOIN pm2{r} a ON a.id = e.src
                   JOIN pm2{r} b ON b.id = e.dst
),
fx{r} AS (SELECT src, dst FROM ee{r} WHERE psrc = pdst),
it{r} AS (
  SELECT src, dst,
         CASE WHEN coin = 0 THEN psrc ELSE pdst END AS pid,
         CASE WHEN coin = 0 THEN ssrc ELSE sdst END AS side,
         CASE WHEN coin = 0 THEN dst ELSE src END AS y
  FROM (SELECT ee{r}.*, {coin} % 2 AS coin FROM ee{r} WHERE psrc <> pdst)
),
it2{r} AS MATERIALIZED (
  SELECT i.src, i.dst, i.pid, i.side, i.y, p.u, p.v,
         (CASE WHEN i.side = 0 THEN p.v ELSE p.u END) IS NOT NULL
         AND NOT EXISTS (
           SELECT 1 FROM cb{r - 1} x
           WHERE x.src = LEAST(
                   CASE WHEN i.side = 0 THEN p.v ELSE p.u END, i.y)
             AND x.dst = GREATEST(
                   CASE WHEN i.side = 0 THEN p.v ELSE p.u END, i.y)
         ) AS tr
  FROM it{r} i JOIN pr{r} p ON p.pid = i.pid
),
cu{r} AS (
  SELECT pid, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cu
  FROM it2{r} WHERE tr GROUP BY pid
),
rk{r} AS (
  SELECT t.pid, t.src, t.dst, t.y, t.u, t.v, c.cu,
         (ROW_NUMBER() OVER (PARTITION BY t.pid
            ORDER BY md5('{seed}|p|{r}|' || CAST(t.pid AS VARCHAR) || '|'
                         || CAST(t.y AS VARCHAR)), t.y) - 1) AS rk
  FROM it2{r} t JOIN cu{r} c ON c.pid = t.pid
  WHERE t.tr
),
cr{r} AS (
  SELECT pid, src, dst,
         LEAST(CASE WHEN rk < cu THEN u ELSE v END, y) AS ns,
         GREATEST(CASE WHEN rk < cu THEN u ELSE v END, y) AS nd
  FROM rk{r}
),
bad{r} AS (
  SELECT DISTINCT c.pid
  FROM cr{r} c JOIN (
    SELECT ns, nd FROM cr{r} GROUP BY ns, nd HAVING COUNT(*) > 1
  ) d ON d.ns = c.ns AND d.nd = c.nd
),
cb{r} AS MATERIALIZED (
  SELECT src, dst FROM fx{r}
  UNION ALL SELECT src, dst FROM it2{r} WHERE NOT tr
  UNION ALL SELECT src, dst FROM cr{r} WHERE pid IN (SELECT pid FROM bad{r})
  UNION ALL SELECT ns AS src, nd AS dst FROM cr{r}
   WHERE pid NOT IN (SELECT pid FROM bad{r})
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT src, dst FROM cb{rounds} ORDER BY src, dst"
    )


SQL_CURVEBALL = _curveball_sql()


# ---------------------------------------------------------------------------
# DynKatzCentrality (centrality/DynKatzCentrality.cpp) — pinned-level
# mode: run L levels statically, apply a deterministic event batch via
# the sparse delta repair, and hash the full (id, score, bound) table.
# The oracle recomputes the path counts STATICALLY on the post-event
# graph, so the gate proves incremental repair == static recompute.
# alpha = 1/(maxdeg+1) of the ORIGINAL graph (reference pins it); all
# float folds are left-associative repeated multiplies in both engines.
# ---------------------------------------------------------------------------

DK_LEVELS = 6


def q_dyn_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.dynkatz import DynKatz

    g = load_graph(spark, sf_dir)
    dk = DynKatz(g, k=10, levels=DK_LEVELS).run()
    ed = g.edges
    removes = ed.filter(
        (F.col("src") * 31 + F.col("dst")) % 23 == 0
    ).select(
        F.lit("EDGE_REMOVAL").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    nodes = g.nodes()
    cand = (
        spark.range(15)
        .select(
            F.least(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("a"),
            F.greatest(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(
            ed.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
        .join(nodes.withColumnRenamed("id", "a"), "a", "left_semi")
        .join(nodes.withColumnRenamed("id", "b"), "b", "left_semi")
    )
    adds = cand.select(
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("a").alias("u"),
        F.col("b").alias("v"),
        F.lit(1.0).alias("w"),
    )
    dk.update_batch(adds.unionByName(removes))
    return (
        dk.scores()
        .select(
            "id",
            F.round("score", 6).alias("score"),
            F.round("bound", 6).alias("bound"),
        )
        .orderBy("id")
    )


def _dyn_katz_sql(levels: int = DK_LEVELS) -> str:
    parts = [
        """md AS (SELECT MAX(degree) AS m FROM deg),
al AS (SELECT CAST(1.0 AS DOUBLE) / (m + 1) AS a, m FROM md),
rem AS (SELECT src, dst FROM edges WHERE (src * 31 + dst) % 23 = 0),
addf AS (
  SELECT DISTINCT LEAST(i, (i * i * 7 + 3) % 997) AS a,
                  GREATEST(i, (i * i * 7 + 3) % 997) AS b
  FROM range(15) t(i)
  WHERE LEAST(i, (i * i * 7 + 3) % 997)
        <> GREATEST(i, (i * i * 7 + 3) % 997)
    AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = LEAST(i, (i * i * 7 + 3) % 997)
                      AND e.dst = GREATEST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = LEAST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = GREATEST(i, (i * i * 7 + 3) % 997))
),
edges3 AS (
  SELECT src, dst FROM (SELECT src, dst FROM edges
                        EXCEPT SELECT src, dst FROM rem)
  UNION SELECT a AS src, b AS dst FROM addf
),
adj3 AS (
  SELECT src, dst FROM edges3
  UNION ALL SELECT dst AS src, src AS dst FROM edges3
)""",
        "np0 AS MATERIALIZED (SELECT id, CAST(1 AS DECIMAL(38,0)) AS np "
        "FROM nodes)",
    ]
    for r in range(1, levels + 1):
        parts.append(
            f"""np{r} AS MATERIALIZED (
  SELECT n.id, CAST(COALESCE(s.np, 0) AS DECIMAL(38,0)) AS np
  FROM nodes n LEFT JOIN (
    SELECT a.src AS id, SUM(p.np) AS np
    FROM adj3 a JOIN np{r - 1} p ON p.id = a.dst GROUP BY a.src
  ) s ON s.id = n.id
)"""
        )
    apow = {r: " * ".join(["a"] * r) for r in range(1, levels + 2)}
    base = "0.0"
    for r in range(1, levels + 1):
        base = f"({base} + ({apow[r]}) * CAST(np{r}.np AS DOUBLE))"
    nxt = f"({apow[levels + 1]})"
    joins = " ".join(
        f"JOIN np{r} ON np{r}.id = nodes.id" for r in range(1, levels + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
sc AS (
  SELECT nodes.id,
         {base} + {nxt} * CAST(np{levels}.np AS DOUBLE) AS score,
         {base} + ({nxt} / (1.0 - a * m))
                  * CAST(np{levels}.np AS DOUBLE) AS bound
  FROM nodes {joins}, al
)
SELECT id, ROUND(score, 6) AS score, ROUND(bound, 6) AS bound
FROM sc ORDER BY id"""
    )


SQL_DYN_KATZ = _dyn_katz_sql()


# ---------------------------------------------------------------------------
# GCE (scd/GCE.cpp objective M) — greedy expansion from the max-degree
# seed, GCE_STEPS unrolled greedy argmax rounds in the oracle. Scalars
# are exact small integers in doubles, divisions are single ops, and
# gains are 9-dp rounded in both engines, so the replayed argmax picks
# are bit-identical.
# ---------------------------------------------------------------------------

GCE_STEPS = 12


def q_scd_gce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scd import gce_expand

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, q = gce_expand(g, [seed], max_steps=GCE_STEPS)
    return com.select(
        "id", F.round(F.lit(q), 6).alias("q")
    ).orderBy("id")


def _scd_gce_sql(steps: int = GCE_STEPS) -> str:
    parts = [
        """com0 AS MATERIALIZED (
  SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1
)"""
    ]
    for t in range(1, steps + 1):
        p = t - 1
        dq = f"""ROUND(CASE WHEN z.cut - s.intdeg + (d.degree - s.intdeg) > 0
               THEN (z.w + s.intdeg)
                    / (z.cut - s.intdeg + (d.degree - s.intdeg))
               ELSE CAST('infinity' AS DOUBLE) END - z.q, 9)"""
        parts.append(
            f"""ws{t} AS (
  SELECT CAST((SELECT COUNT(*) FROM edges e
               JOIN com{p} x ON x.id = e.src
               JOIN com{p} y ON y.id = e.dst) AS DOUBLE) AS w,
         CAST((SELECT COALESCE(SUM(d.degree), 0) FROM deg d
               JOIN com{p} c ON c.id = d.id) AS DOUBLE) AS vol
),
qq{t} AS (
  SELECT w, vol - 2 * w AS cut,
         CASE WHEN vol - 2 * w > 0 THEN w / (vol - 2 * w)
              ELSE CAST('infinity' AS DOUBLE) END AS q
  FROM ws{t}
),
sh{t} AS (
  SELECT a.src AS v, CAST(COUNT(*) AS DOUBLE) AS intdeg
  FROM adj a JOIN com{p} c ON c.id = a.dst
  WHERE a.src NOT IN (SELECT id FROM com{p})
  GROUP BY a.src
),
st{t} AS (
  SELECT s.v
  FROM sh{t} s JOIN deg d ON d.id = s.v, qq{t} z
  WHERE {dq} > 0
  ORDER BY {dq} DESC, s.v ASC
  LIMIT 1
),
com{t} AS MATERIALIZED (
  SELECT id FROM com{p} UNION ALL SELECT v AS id FROM st{t}
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
wsf AS (
  SELECT CAST((SELECT COUNT(*) FROM edges e
               JOIN com{steps} x ON x.id = e.src
               JOIN com{steps} y ON y.id = e.dst) AS DOUBLE) AS w,
         CAST((SELECT COALESCE(SUM(d.degree), 0) FROM deg d
               JOIN com{steps} c ON c.id = d.id) AS DOUBLE) AS vol
),
qf AS (
  SELECT CASE WHEN vol - 2 * w > 0 THEN w / (vol - 2 * w)
              ELSE CAST('infinity' AS DOUBLE) END AS q
  FROM wsf
)
SELECT c.id, ROUND((SELECT q FROM qf), 6) AS q
FROM com{steps} c ORDER BY c.id"""
    )


SQL_SCD_GCE = _scd_gce_sql()


# ---------------------------------------------------------------------------
# SetConductance (scd/SetConductance.cpp:12-46) over the deterministic
# set S = {id % 5 == 0}.
# ---------------------------------------------------------------------------


def q_set_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scd import set_conductance

    g = load_graph(spark, sf_dir)
    s = g.nodes().filter(F.col("id") % 5 == 0)
    cond = set_conductance(g, s)
    return spark.createDataFrame(
        [(round(cond, 6),)], "cond double"
    )


SQL_SET_CONDUCTANCE = f"""WITH {GRAPH_CTES},
s AS (SELECT id FROM nodes WHERE id % 5 = 0),
m AS (
  SELECT
    CAST(SUM(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS cut,
    CAST(COUNT(*) AS DOUBLE) AS vol
  FROM adj a JOIN s ON s.id = a.src LEFT JOIN s d ON d.id = a.dst
),
t AS (SELECT CAST(2 * (SELECT COUNT(*) FROM edges) AS DOUBLE) AS total)
SELECT ROUND(CASE WHEN m.vol > 0 AND t.total - m.vol > 0
             THEN m.cut / LEAST(m.vol, t.total - m.vol)
             ELSE 1.0 END, 6) AS cond
FROM m, t"""


# ---------------------------------------------------------------------------
# TCE / LocalTightnessExpansion / CliqueDetect (scd/TCE.cpp:46-264,
# scd/LocalTightnessExpansion.cpp:96-330, scd/CliqueDetect.cpp:18-95).
# The shell-heap pop sequence collapses to per-acceptance rounds (see
# operators/scdlocal.py); the oracles unroll TCE_STEPS / LTE_STEPS
# rounds with the same (priority DESC round 9, id ASC) pick and the
# discard bookkeeping (everything ordered before the accepted node
# leaves the shell until a later acceptance re-inserts it).  CliqueDetect
# enumerates the candidate-subgraph cliques with a recursive CTE
# (ordered growth + list_has_all) and takes the (size DESC, members ASC)
# minimum — the same winner the Spark side picks among maximal cliques.
# ---------------------------------------------------------------------------

TCE_STEPS = 12
LTE_STEPS = 12


def q_scd_tce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdlocal import tce_expand

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, cond, _rounds = tce_expand(g, [seed], max_steps=TCE_STEPS)
    return com.select(
        "id", F.round(F.lit(cond), 6).alias("cond")
    ).orderBy("id")


def _scd_tce_sql(steps: int = TCE_STEPS) -> str:
    parts = [
        """com0 AS MATERIALIZED (
  SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1
),
act0 AS MATERIALIZED (
  SELECT DISTINCT a.dst AS v FROM adj a JOIN com0 c ON c.id = a.src
  WHERE a.dst NOT IN (SELECT id FROM com0)
)"""
    ]
    for t in range(1, steps + 1):
        p = t - 1
        parts.append(
            f"""cv{t} AS (
  SELECT CAST(SUM(CASE WHEN x.id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           AS cut,
         CAST(COUNT(*) AS DOUBLE) AS vol
  FROM adj a JOIN com{p} c ON c.id = a.src
  LEFT JOIN com{p} x ON x.id = a.dst
),
pr{t} AS (
  SELECT a.src AS u, a.dst AS v FROM adj a
  JOIN com{p} c ON c.id = a.src
  JOIN act{p} s ON s.v = a.dst
),
tr{t} AS (
  SELECT q.u, q.v, CAST(COUNT(*) AS DOUBLE) AS tri
  FROM pr{t} q
  JOIN adj x ON x.src = q.u
  JOIN adj y ON y.src = q.v AND y.dst = x.dst
  GROUP BY q.u, q.v
),
sc{t} AS (
  SELECT q.v,
         ROUND(SUM((1.0 + COALESCE(w.tri, 0.0))
               / (LEAST(du.degree, dv.degree) * dv.degree)), 9) AS score_r,
         CAST(COUNT(*) AS DOUBLE) AS cut_e,
         CAST(MAX(dv.degree) AS DOUBLE) AS wd
  FROM pr{t} q
  LEFT JOIN tr{t} w ON w.u = q.u AND w.v = q.v
  JOIN deg du ON du.id = q.u
  JOIN deg dv ON dv.id = q.v
  GROUP BY q.v
),
ac{t} AS (
  SELECT s.v, s.score_r, s.cut_e, s.wd
  FROM sc{t} s, cv{t} z
  WHERE ROUND((z.cut + s.wd - 2 * s.cut_e) / (z.vol + s.wd)
              - z.cut / z.vol, 9) < 0
  ORDER BY s.score_r DESC, s.v ASC LIMIT 1
),
com{t} AS MATERIALIZED (
  SELECT id FROM com{p} UNION ALL SELECT v AS id FROM ac{t}
),
act{t} AS MATERIALIZED (
  SELECT s.v FROM sc{t} s, ac{t} a
  WHERE NOT (s.score_r > a.score_r
             OR (s.score_r = a.score_r AND s.v < a.v))
    AND s.v <> a.v
  UNION
  SELECT n.dst AS v FROM adj n JOIN ac{t} a ON n.src = a.v
  WHERE n.dst NOT IN (SELECT id FROM com{t})
)"""
        )
    parts.append(
        f"""cvf AS (
  SELECT CAST(SUM(CASE WHEN x.id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           AS cut,
         CAST(COUNT(*) AS DOUBLE) AS vol
  FROM adj a JOIN com{steps} c ON c.id = a.src
  LEFT JOIN com{steps} x ON x.id = a.dst
)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT c.id,
       ROUND((SELECT CASE WHEN vol > 0 THEN cut / vol ELSE 1.0 END
              FROM cvf), 6) AS cond
FROM com{steps} c ORDER BY c.id"""
    )


SQL_SCD_TCE = _scd_tce_sql()


def q_scd_lte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdlocal import lte_expand

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, _rounds = lte_expand(g, [seed], alpha=1.0, max_steps=LTE_STEPS)
    return com.select("id").orderBy("id")


def _scd_lte_sql(steps: int = LTE_STEPS) -> str:
    # unweighted contract graph: wd2(x) = sqrt(1 + degree(x)),
    # s(u, v) = (2 + common-neighbour count) / (wd2_u * wd2_v)
    sim = ("(2.0 + COALESCE(w.tri, 0.0)) "
           "/ (SQRT(1.0 + du.degree) * SQRT(1.0 + dv.degree))")
    parts = [
        """com0 AS MATERIALIZED (
  SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1
),
act0 AS MATERIALIZED (
  SELECT DISTINCT a.dst AS v FROM adj a JOIN com0 c ON c.id = a.src
  WHERE a.dst NOT IN (SELECT id FROM com0)
)"""
    ]
    for t in range(1, steps + 1):
        p = t - 1
        parts.append(
            f"""ce{t} AS (
  SELECT a.src AS u, a.dst AS v FROM adj a JOIN com{p} c ON c.id = a.src
),
ctr{t} AS (
  SELECT q.u, q.v, CAST(COUNT(*) AS DOUBLE) AS tri
  FROM ce{t} q
  JOIN adj x ON x.src = q.u
  JOIN adj y ON y.src = q.v AND y.dst = x.dst
  GROUP BY q.u, q.v
),
ei{t} AS (
  SELECT COALESCE(SUM(CASE WHEN b.id IS NOT NULL THEN q.s END), 0.0)
           AS i,
         COALESCE(SUM(CASE WHEN b.id IS NULL THEN q.s END), 0.0) AS e
  FROM (
    SELECT p2.v, {sim} AS s
    FROM ce{t} p2
    LEFT JOIN ctr{t} w ON w.u = p2.u AND w.v = p2.v
    JOIN deg du ON du.id = p2.u
    JOIN deg dv ON dv.id = p2.v
  ) q LEFT JOIN com{p} b ON b.id = q.v
),
pv{t} AS (
  SELECT a.src AS u, a.dst AS v FROM adj a JOIN act{p} s ON s.v = a.src
),
ptr{t} AS (
  SELECT q.u, q.v, CAST(COUNT(*) AS DOUBLE) AS tri
  FROM pv{t} q
  JOIN adj x ON x.src = q.u
  JOIN adj y ON y.src = q.v AND y.dst = x.dst
  GROUP BY q.u, q.v
),
lsc{t} AS (
  SELECT q.u AS v,
         ROUND(COALESCE(SUM(CASE WHEN b.id IS NOT NULL THEN q.s END),
                        0.0), 9) AS prio,
         COALESCE(SUM(CASE WHEN b.id IS NOT NULL THEN q.s END), 0.0)
           AS int_s,
         COALESCE(SUM(CASE WHEN b.id IS NULL THEN q.s END), 0.0) AS ext_s
  FROM (
    SELECT p2.u, p2.v, {sim} AS s
    FROM pv{t} p2
    LEFT JOIN ptr{t} w ON w.u = p2.u AND w.v = p2.v
    JOIN deg du ON du.id = p2.u
    JOIN deg dv ON dv.id = p2.v
  ) q LEFT JOIN com{p} b ON b.id = q.v
  GROUP BY q.u
  HAVING COALESCE(SUM(CASE WHEN b.id IS NOT NULL THEN q.s END), 0.0) > 0
),
lac{t} AS (
  SELECT s.v, s.prio
  FROM lsc{t} s, ei{t} z
  WHERE CASE WHEN z.i = 0
             THEN (CASE WHEN z.e > 0 THEN 1.0 ELSE -1.0 END)
             ELSE ROUND(z.e / z.i
                        - (s.ext_s - s.int_s) / (2 * s.int_s), 9)
        END > 0
  ORDER BY s.prio DESC, s.v ASC LIMIT 1
),
com{t} AS MATERIALIZED (
  SELECT id FROM com{p} UNION ALL SELECT v AS id FROM lac{t}
),
act{t} AS MATERIALIZED (
  SELECT s.v FROM lsc{t} s, lac{t} a
  WHERE NOT (s.prio > a.prio OR (s.prio = a.prio AND s.v < a.v))
    AND s.v <> a.v
  UNION
  SELECT n.dst AS v FROM adj n JOIN lac{t} a ON n.src = a.v
  WHERE n.dst NOT IN (SELECT id FROM com{t})
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id FROM com{steps} ORDER BY id"
    )


SQL_SCD_LTE = _scd_lte_sql()


def q_scd_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdlocal import clique_detect

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    return clique_detect(g, [seed]).select("id").orderBy("id")


SQL_SCD_CLIQUE = f"""WITH RECURSIVE {GRAPH_CTES},
seedn AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1),
cand AS (
  SELECT a.dst AS id FROM adj a JOIN seedn s ON s.id = a.src
  WHERE a.dst NOT IN (SELECT id FROM seedn)
),
sedges AS (
  SELECT e.src, e.dst FROM edges e
  JOIN cand x ON x.id = e.src JOIN cand y ON y.id = e.dst
),
salist AS (
  SELECT src, list(dst ORDER BY dst) AS ns FROM (
    SELECT src, dst FROM sedges UNION ALL SELECT dst, src FROM sedges
  ) GROUP BY src
),
cl AS (
  SELECT [id] AS members, 1 AS k, id AS last FROM cand
  UNION ALL
  SELECT list_append(c.members, e.dst), c.k + 1, e.dst
  FROM cl c JOIN sedges e ON e.src = c.last
  JOIN salist al ON al.src = e.dst
  WHERE list_has_all(al.ns, c.members)
),
best AS (SELECT members FROM cl ORDER BY k DESC, members ASC LIMIT 1)
SELECT id FROM (
  SELECT id FROM seedn
  UNION
  SELECT UNNEST(members) AS id FROM best
) ORDER BY id"""


# ---------------------------------------------------------------------------
# DynTopHarmonicCloseness (centrality/DynTopHarmonicCloseness.cpp:418-855
# + distance/AffectedNodes.cpp) — the same starred graph as
# graph_top_harmonic, hit with the dyn_katz event batch (deterministic
# removals + range-recipe additions); the oracle recomputes exact
# harmonic top-k on the post-event edge set, the Spark side repairs
# incrementally (affected-endpoint BFS + bound refresh + lazy waves).
# ---------------------------------------------------------------------------


def q_dyn_top_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.dyntopharmonic import (
        DynTopHarmonicCloseness,
    )

    g = load_graph(spark, sf_dir)
    star = (
        g.nodes()
        .filter((F.col("id") % 7 == 1) & (F.col("id") != 0))
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    )
    edges2 = (
        g.edges.select("src", "dst")
        .unionByName(star)
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g2 = Graph(edges2, vertices=g.nodes(), directed=False, weighted=False)
    dth = DynTopHarmonicCloseness(g2, k=TOPHARM_K, batch=64).run()
    removes = g.edges.filter(
        (F.col("src") * 31 + F.col("dst")) % 23 == 0
    ).select(
        F.lit("EDGE_REMOVAL").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    nodes = g.nodes()
    adds = (
        spark.range(15)
        .select(
            F.least(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("a"),
            F.greatest(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(
            g.edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
        .join(nodes.withColumnRenamed("id", "a"), "a", "left_semi")
        .join(nodes.withColumnRenamed("id", "b"), "b", "left_semi")
        .select(
            F.lit("EDGE_ADDITION").alias("type"),
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            F.lit(1.0).alias("w"),
        )
    )
    dth.update_batch(adds.unionByName(removes))
    n = g2.number_of_nodes()
    if dth.swept_last >= n // 2:  # explicit raise — survives python -O
        raise AssertionError(
            f"dyn repair swept {dth.swept_last}/{n} nodes — the bound "
            "pruned nothing"
        )
    return dth.scores().select(
        "id", F.round("score", 6).alias("score")
    ).orderBy(F.desc("score"), F.asc("id"))


def _dyn_top_harmonic_sql(hops: int = DIAM_HOPS, k: int = TOPHARM_K) -> str:
    steps = [
        """star AS (
  SELECT CAST(0 AS BIGINT) AS src, id AS dst FROM nodes
  WHERE id % 7 = 1 AND id <> 0
),
edges2 AS (
  SELECT src, dst FROM edges UNION SELECT src, dst FROM star
),
rem AS (SELECT src, dst FROM edges WHERE (src * 31 + dst) % 23 = 0),
addf AS (
  SELECT DISTINCT LEAST(i, (i * i * 7 + 3) % 997) AS a,
                  GREATEST(i, (i * i * 7 + 3) % 997) AS b
  FROM range(15) t(i)
  WHERE LEAST(i, (i * i * 7 + 3) % 997)
        <> GREATEST(i, (i * i * 7 + 3) % 997)
    AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = LEAST(i, (i * i * 7 + 3) % 997)
                      AND e.dst = GREATEST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = LEAST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = GREATEST(i, (i * i * 7 + 3) % 997))
),
edges3 AS (
  SELECT src, dst FROM (SELECT src, dst FROM edges2
                        EXCEPT SELECT src, dst FROM rem)
  UNION SELECT a AS src, b AS dst FROM addf
),
adj3 AS (
  SELECT src, dst FROM edges3
  UNION ALL SELECT dst AS src, src AS dst FROM edges3
)""",
        "t0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(0 AS BIGINT) "
        "AS dist FROM nodes)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj3 a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
sc AS (
  SELECT s AS id,
         SUM(CASE WHEN dist > 0 THEN CAST(1.0 AS DOUBLE) / dist
                  ELSE CAST(0.0 AS DOUBLE) END) AS h
  FROM t{hops} GROUP BY s
)
SELECT id, ROUND(h, 6) AS score FROM sc
ORDER BY ROUND(h, 9) DESC, id ASC LIMIT {k}"""
    )


SQL_DYN_TOP_HARMONIC = _dyn_top_harmonic_sql()


# ---------------------------------------------------------------------------
# LocalT / TwoPhaseL / SCDGroundTruthComparison (scd/LocalT.cpp:14-195,
# scd/TwoPhaseL.cpp:13-113, scd/SCDGroundTruthComparison.cpp:11-135).
# LocalT's replay is ALL-INTEGER (triangle counts) — bit-exact across
# engines with no rounding rule; TwoPhaseL follows the 9-dp margin spec
# with NULL standing in for IEEE NaN in both engines (Spark and DuckDB
# both yield NULL on x/0).  The greedy loops unroll like GCE/LFM.
# ---------------------------------------------------------------------------

LOCALT_STEPS = 12
TP_STEPS = 10


def q_scd_localt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdmore import localt_expand

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, _rounds = localt_expand(g, [seed], max_steps=LOCALT_STEPS)
    return com.select("id").orderBy("id")


def _scd_localt_sql(steps: int = LOCALT_STEPS) -> str:
    parts = [
        """com0 AS MATERIALIZED (
  SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1
)"""
    ]
    for t in range(1, steps + 1):
        p = t - 1
        parts.append(
            f"""sh{t} AS MATERIALIZED (
  SELECT DISTINCT a.dst AS id FROM adj a JOIN com{p} c ON c.id = a.src
  WHERE a.dst NOT IN (SELECT id FROM com{p})
),
it{t} AS (SELECT id FROM sh{t} UNION SELECT id FROM com{p}),
tg{t} AS MATERIALIZED (
  SELECT v,
         SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS t_int,
         SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS t_semi,
         SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS t_ext
  FROM (
    SELECT ax.dst AS v,
           (CASE WHEN cx.id IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN cy.id IS NOT NULL THEN 1 ELSE 0 END) AS k
    FROM edges e
    JOIN adj ax ON ax.src = e.src
    JOIN adj ay ON ay.src = e.dst AND ay.dst = ax.dst
    LEFT JOIN com{p} cx ON cx.id = e.src
    LEFT JOIN com{p} cy ON cy.id = e.dst
    WHERE ax.dst IN (SELECT id FROM it{t})
  ) q GROUP BY v
),
zz{t} AS (
  SELECT COALESCE(SUM(CASE WHEN c.id IS NOT NULL THEN g.t_int END), 0)
           // 3 AS i,
         COALESCE(SUM(CASE WHEN c.id IS NOT NULL THEN g.t_ext END), 0)
           AS e
  FROM tg{t} g LEFT JOIN com{p} c ON c.id = g.v
),
zc{t} AS (
  SELECT i, e, GREATEST(CAST(0 AS BIGINT), i * (i - e)) AS cur FROM zz{t}
),
ac{t} AS (
  SELECT q.id FROM (
    SELECT s.id,
           COALESCE(g.t_int, 0) AS ti,
           COALESCE(g.t_semi, 0) AS ts,
           COALESCE(g.t_ext, 0) AS te
    FROM sh{t} s LEFT JOIN tg{t} g ON g.v = s.id
  ) q, zc{t} z
  WHERE GREATEST(CAST(0 AS BIGINT),
                 (z.i + q.ti) * ((z.i + q.ti) - (z.e + q.te - q.ts)))
        >= z.cur
  ORDER BY GREATEST(CAST(0 AS BIGINT),
                    (z.i + q.ti) * ((z.i + q.ti) - (z.e + q.te - q.ts)))
             DESC,
           (z.e + q.te - q.ts) ASC, q.id ASC
  LIMIT 1
),
com{t} AS MATERIALIZED (
  SELECT id FROM com{p} UNION ALL SELECT id FROM ac{t}
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id FROM com{steps} ORDER BY id"
    )


SQL_SCD_LOCALT = _scd_localt_sql()


def q_scd_twophasel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdmore import two_phase_l

    g = load_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    com, _rounds = two_phase_l(g, [seed], max_steps=TP_STEPS)
    return com.select("id").orderBy("id")


def _scd_twophasel_sql(steps: int = TP_STEPS) -> str:
    inf = "CAST('infinity' AS DOUBLE)"
    parts = [
        """seedn AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1),
comp0 AS MATERIALIZED (SELECT id FROM seedn)"""
    ]
    for t in range(1, steps + 1):
        p = t - 1
        parts.append(
            f"""ms{t} AS MATERIALIZED (
  SELECT a.src AS m,
         CAST(SUM(CASE WHEN c2.id IS NOT NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS ideg,
         CAST(SUM(CASE WHEN c2.id IS NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS edeg
  FROM adj a JOIN comp{p} c ON c.id = a.src
  LEFT JOIN comp{p} c2 ON c2.id = a.dst
  GROUP BY a.src
),
gz{t} AS (
  SELECT COALESCE((SELECT SUM(ideg) FROM ms{t}), 0) / 2 AS w,
         COALESCE((SELECT SUM(edeg) FROM ms{t}), 0) AS cut,
         COALESCE((SELECT COUNT(*) FROM ms{t} WHERE edeg > 0), 0) AS bs,
         (SELECT COUNT(*) FROM comp{p}) AS csz
),
gl{t} AS (
  SELECT w, cut, bs, csz,
         2 * w / csz AS cur_lin,
         CASE WHEN bs <> 0 THEN cut / bs
              WHEN cut > 0 THEN {inf}
              ELSE NULL END AS cur_lex
  FROM gz{t}
),
gc{t} AS (
  SELECT *,
         CASE WHEN cur_lex IS NULL THEN NULL
              WHEN cur_lex <> 0 THEN cur_lin / cur_lex
              WHEN cur_lin > 0 THEN {inf}
              WHEN cur_lin < 0 THEN -{inf}
              ELSE NULL END AS cur_l
  FROM gl{t}
),
vs{t} AS MATERIALIZED (
  SELECT a.src AS v,
         CAST(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS intdeg,
         CAST(SUM(CASE WHEN c.id IS NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS extdeg,
         SUM(CASE WHEN c.id IS NULL THEN 1 ELSE 0 END) AS next_cnt
  FROM adj a LEFT JOIN comp{p} c ON c.id = a.dst
  WHERE a.src IN (SELECT DISTINCT a2.dst FROM adj a2
                  JOIN comp{p} x ON x.id = a2.src)
    AND a.src NOT IN (SELECT id FROM comp{p})
  GROUP BY a.src
),
dr{t} AS (
  SELECT a.dst AS v, COUNT(*) AS bdrop
  FROM adj a JOIN ms{t} m ON m.m = a.src AND m.edeg = 1
  WHERE a.dst NOT IN (SELECT id FROM comp{p})
  GROUP BY a.dst
),
cn{t} AS (
  SELECT s.v,
         2 * (z.w + s.intdeg) / (z.csz + 1) AS n_lin,
         z.cut - s.intdeg + s.extdeg AS num,
         CAST(z.bs + (CASE WHEN s.next_cnt > 0 THEN 1 ELSE 0 END)
              - COALESCE(d.bdrop, 0) AS DOUBLE) AS den,
         z.cur_lin, z.cur_l
  FROM vs{t} s LEFT JOIN dr{t} d ON d.v = s.v, gc{t} z
),
cl{t} AS (
  SELECT v, n_lin, cur_lin, cur_l,
         CASE WHEN den <> 0 THEN num / den
              WHEN num > 0 THEN {inf}
              WHEN num < 0 THEN -{inf}
              ELSE NULL END AS n_lex
  FROM cn{t}
),
cm{t} AS (
  SELECT v, n_lin, cur_lin, cur_l,
         CASE WHEN n_lex IS NULL THEN NULL
              WHEN n_lex <> 0 THEN n_lin / n_lex
              WHEN n_lin > 0 THEN {inf}
              WHEN n_lin < 0 THEN -{inf}
              ELSE NULL END AS n_l
  FROM cl{t}
),
pa{t} AS (
  SELECT v FROM cm{t}
  WHERE ROUND(n_lin - cur_lin, 9) > 0
    AND (CASE WHEN cur_l IS NULL OR n_l IS NULL THEN NULL
              WHEN n_l = {inf} THEN
                CASE WHEN cur_l = {inf} THEN 0.0 ELSE 1.0 END
              ELSE ROUND(n_l - cur_l, 9) END) > 0
  ORDER BY ROUND(n_l, 9) DESC, v ASC
  LIMIT 1
),
comp{t} AS MATERIALIZED (
  SELECT id FROM comp{p} UNION ALL SELECT v AS id FROM pa{t}
)"""
        )
    # phase 2: ascending-id sweep, one block per possible member
    parts.append(
        f"""sn2 AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rk FROM comp{steps}
),
cq0 AS MATERIALIZED (SELECT id FROM comp{steps})"""
    )
    blocks = steps + 1
    for k in range(1, blocks + 1):
        p = k - 1
        parts.append(
            f"""tk{k} AS (SELECT id FROM sn2 WHERE rk = {k}),
qm{k} AS MATERIALIZED (
  SELECT a.src AS m,
         CAST(SUM(CASE WHEN c2.id IS NOT NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS ideg,
         CAST(SUM(CASE WHEN c2.id IS NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS edeg
  FROM adj a JOIN cq{p} c ON c.id = a.src
  LEFT JOIN cq{p} c2 ON c2.id = a.dst
  GROUP BY a.src
),
qz{k} AS (
  SELECT COALESCE((SELECT SUM(ideg) FROM qm{k}), 0) / 2 AS w,
         COALESCE((SELECT SUM(edeg) FROM qm{k}), 0) AS cut,
         COALESCE((SELECT COUNT(*) FROM qm{k} WHERE edeg > 0), 0) AS bs,
         (SELECT COUNT(*) FROM cq{p}) AS csz
),
qt{k} AS (
  SELECT t.id, COALESCE(m.ideg, 0) AS ideg, COALESCE(m.edeg, 0) AS edeg
  FROM tk{k} t LEFT JOIN qm{k} m ON m.m = t.id
),
qb{k} AS (
  SELECT COUNT(*) AS b FROM (
    SELECT a.src FROM adj a
    WHERE a.src IN (SELECT id FROM cq{p})
      AND a.src NOT IN (SELECT id FROM tk{k})
    GROUP BY a.src
    HAVING SUM(CASE WHEN a.dst NOT IN (SELECT id FROM cq{p})
                      OR a.dst IN (SELECT id FROM tk{k})
               THEN 1 ELSE 0 END) > 0
  )
),
qk{k} AS (
  SELECT COALESCE((
    SELECT
      ROUND(2 * z.w / z.csz
            - CASE WHEN z.csz - 1 <> 0
                   THEN 2 * (z.w - t.ideg) / (z.csz - 1)
                   WHEN 2 * (z.w - t.ideg) > 0 THEN {inf}
                   WHEN 2 * (z.w - t.ideg) < 0 THEN -{inf}
                   ELSE NULL END, 9) > 0
      AND
      ROUND((CASE WHEN z.bs <> 0 THEN z.cut / z.bs
                  WHEN z.cut > 0 THEN {inf}
                  ELSE NULL END)
            - (CASE WHEN b.b <> 0
                    THEN (z.cut + t.ideg - t.edeg) / b.b
                    WHEN z.cut + t.ideg - t.edeg > 0 THEN {inf}
                    WHEN z.cut + t.ideg - t.edeg < 0 THEN -{inf}
                    ELSE NULL END), 9) < 0
    FROM qt{k} t, qz{k} z, qb{k} b
  ), TRUE) AS keep
),
cq{k} AS MATERIALIZED (
  SELECT id FROM cq{p}
  WHERE NOT (id IN (SELECT id FROM tk{k})
             AND NOT (SELECT keep FROM qk{k}))
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT c.id FROM cq{blocks} c
WHERE (SELECT COUNT(*) FROM cq{blocks} x
       JOIN seedn s ON s.id = x.id) = 1
ORDER BY c.id"""
    )


SQL_SCD_TWOPHASEL = _scd_twophasel_sql()


def q_scd_gtcomparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scdmore import (
        scd_ground_truth_comparison,
    )

    g = load_graph(spark, sf_dir)
    seeds = g.nodes().orderBy("id").limit(3)
    cover = (
        g.nodes()
        .select("id", (F.col("id") % 4).alias("subset"))
        .unionByName(
            g.nodes()
            .filter(F.col("id") % 7 == 0)
            .select("id", F.lit(4).cast("long").alias("subset"))
        )
    )
    found = (
        seeds.withColumnRenamed("id", "seed")
        .join(
            g.adj().select(F.col("src").alias("seed"),
                           F.col("dst").alias("id")),
            "seed",
        )
        .unionByName(seeds.select(F.col("id").alias("seed"),
                                  F.col("id")))
        .distinct()
    )
    per_seed, _avg = scd_ground_truth_comparison(g, cover, found)
    return per_seed.select(
        "seed",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("f1", 6).alias("f1"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
    ).orderBy("seed")


SQL_SCD_GTCOMPARISON = f"""WITH {GRAPH_CTES},
seeds AS (SELECT id AS seed FROM nodes ORDER BY id LIMIT 3),
cover AS (
  SELECT id, id % 4 AS subset FROM nodes
  UNION ALL
  SELECT id, 4 AS subset FROM nodes WHERE id % 7 = 0
),
found AS (
  SELECT DISTINCT s.seed, x.id FROM seeds s
  JOIN (SELECT src AS seed, dst AS id FROM adj) x ON x.seed = s.seed
  UNION
  SELECT seed, seed AS id FROM seeds
),
fsz AS (SELECT seed, COUNT(*) AS fsize FROM found GROUP BY seed),
tsz AS (SELECT subset, COUNT(*) AS tsize FROM cover GROUP BY subset),
allowed AS (
  SELECT DISTINCT s.seed, c.subset FROM seeds s
  JOIN cover c ON c.id = s.seed
),
ov AS (
  SELECT f.seed, c.subset, COUNT(*) AS ov
  FROM found f JOIN cover c ON c.id = f.id
  GROUP BY f.seed, c.subset
),
scored AS (
  SELECT o.seed,
         CAST(o.ov AS DOUBLE) / (f.fsize + t.tsize - o.ov) AS jacc,
         CAST(o.ov AS DOUBLE) / t.tsize AS recall,
         CAST(o.ov AS DOUBLE) / f.fsize AS precision
  FROM ov o
  JOIN allowed a ON a.seed = o.seed AND a.subset = o.subset
  JOIN fsz f ON f.seed = o.seed
  JOIN tsz t ON t.subset = o.subset
),
scored2 AS (
  SELECT seed, jacc, recall, precision,
         CASE WHEN precision > 0 AND recall > 0
              THEN 2 * precision * recall / (precision + recall)
              ELSE 0.0 END AS f1
  FROM scored
)
SELECT f.seed,
       ROUND(COALESCE(MAX(s.jacc), 0.0), 6) AS jaccard,
       ROUND(COALESCE(MAX(s.f1), 0.0), 6) AS f1,
       ROUND(COALESCE(MAX(s.precision), 0.0), 6) AS precision,
       ROUND(COALESCE(MAX(s.recall), 0.0), 6) AS recall
FROM fsz f LEFT JOIN scored2 s ON s.seed = f.seed
GROUP BY f.seed ORDER BY f.seed"""


# ---------------------------------------------------------------------------
# Sfigality / LocalPartitionCoverage / LaplacianCentrality /
# LocalSquareClusteringCoefficient / Luby independent set
# (centrality/Sfigality.cpp, LocalPartitionCoverage.cpp,
# LaplacianCentrality.cpp, LocalSquareClusteringCoefficient.cpp,
# independentset/Luby.cpp).  The first four are single join+agg
# pipelines; Luby unrolls md5-derandomized rounds (the randomization.py
# 13-nibble fraction convention) with the one-shot conflict rule.
# ---------------------------------------------------------------------------

LUBY_ROUNDS = 16
LUBY_SEED = 42


def q_sfigality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import sfigality

    g = load_graph(spark, sf_dir)
    return sfigality(g).select(
        "id", F.round("score", 6).alias("score")
    ).orderBy("id")


SQL_SFIGALITY = f"""WITH {GRAPH_CTES},
s AS (
  SELECT a.src AS id,
         CAST(SUM(CASE WHEN du.degree < dv.degree THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*) AS score
  FROM adj a
  JOIN deg du ON du.id = a.src
  JOIN deg dv ON dv.id = a.dst
  GROUP BY a.src
)
SELECT n.id, ROUND(COALESCE(s.score, 0.0), 6) AS score
FROM nodes n LEFT JOIN s ON s.id = n.id ORDER BY n.id"""


def q_partition_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import (
        local_partition_coverage,
    )

    g = load_graph(spark, sf_dir)
    labels = g.nodes().select("id", (F.col("id") % 4).alias("label"))
    return local_partition_coverage(g, labels).select(
        "id", F.round("score", 6).alias("score")
    ).orderBy("id")


SQL_PARTITION_COVERAGE = f"""WITH {GRAPH_CTES},
s AS (
  SELECT a.src AS id,
         CAST(SUM(CASE WHEN a.src % 4 = a.dst % 4 THEN 1 ELSE 0 END)
              AS DOUBLE) AS same,
         CAST(COUNT(*) AS DOUBLE) AS wd
  FROM adj a GROUP BY a.src
)
SELECT n.id,
       ROUND(COALESCE(CASE WHEN s.same > 0 THEN s.same / s.wd
                           ELSE 0.0 END, 0.0), 6) AS score
FROM nodes n LEFT JOIN s ON s.id = n.id ORDER BY n.id"""


def q_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import (
        laplacian_centrality,
    )

    g = load_graph(spark, sf_dir)
    return laplacian_centrality(g, normalized=True).select(
        "id", F.round("score", 9).alias("score")
    ).orderBy("id")


SQL_LAPLACIAN = f"""WITH {GRAPH_CTES},
wd AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS wd
       FROM adj GROUP BY src),
loss AS (
  SELECT a.src AS id,
         SUM(1.0 * (1.0 + 2.0 * w.wd)) AS nloss
  FROM adj a JOIN wd w ON w.id = a.dst GROUP BY a.src
),
tot AS (
  SELECT (SELECT COALESCE(SUM(wd * wd), 0) FROM wd)
         + (SELECT CAST(COUNT(*) AS DOUBLE) FROM adj) AS t
)
SELECT n.id,
       ROUND((COALESCE(w.wd, 0) * COALESCE(w.wd, 0)
              + COALESCE(l.nloss, 0)) / tot.t, 9) AS score
FROM nodes n
LEFT JOIN wd w ON w.id = n.id
LEFT JOIN loss l ON l.id = n.id, tot ORDER BY n.id"""


def q_square_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import (
        local_square_clustering,
    )

    g = load_graph(spark, sf_dir)
    return local_square_clustering(g).select(
        "id", F.round("score", 6).alias("score")
    ).orderBy("id")


SQL_SQUARE_CLUSTERING = f"""WITH {GRAPH_CTES},
pairs AS MATERIALIZED (
  SELECT a1.src AS u, a1.dst AS v, a2.dst AS w
  FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
dp AS (SELECT DISTINCT v, w FROM pairs),
cn AS MATERIALIZED (
  SELECT p.v, p.w, COUNT(*) AS cn
  FROM dp p
  JOIN adj av ON av.src = p.v
  JOIN adj aw ON aw.src = p.w AND aw.dst = av.dst
  GROUP BY p.v, p.w
),
sc AS (
  SELECT p.u AS id,
         SUM(COALESCE(c.cn, 0) - 1) AS sq,
         SUM(dv.degree + dw.degree - COALESCE(c.cn, 0) - 1
             - 2 * (CASE WHEN e.src IS NOT NULL THEN 1 ELSE 0 END))
           AS pot
  FROM pairs p
  LEFT JOIN cn c ON c.v = p.v AND c.w = p.w
  LEFT JOIN edges e ON e.src = p.v AND e.dst = p.w
  JOIN deg dv ON dv.id = p.v
  JOIN deg dw ON dw.id = p.w
  GROUP BY p.u
)
SELECT n.id,
       ROUND(COALESCE(CASE WHEN s.pot > 0
                           THEN CAST(s.sq AS DOUBLE) / s.pot
                           ELSE 0.0 END, 0.0), 6) AS score
FROM nodes n LEFT JOIN sc s ON s.id = n.id ORDER BY n.id"""


def q_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import luby

    g = load_graph(spark, sf_dir)
    out, _rounds = luby(g, seed=LUBY_SEED, max_rounds=LUBY_ROUNDS)
    return out.select("id", "in_set").orderBy("id")


def _md5_long13_sql(hexpr: str) -> str:
    nib = "(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    val = f"CAST({nib.format(h=hexpr, i=1)} AS BIGINT)"
    for i in range(2, 14):
        val = f"({val} * 16 + {nib.format(h=hexpr, i=i)})"
    return val


def _luby_sql(rounds: int = LUBY_ROUNDS, seed: int = LUBY_SEED) -> str:
    parts = ["av0 AS MATERIALIZED (SELECT id FROM nodes)"]
    for r in range(1, rounds + 1):
        p = r - 1
        h = f"md5('luby|{seed}|{r}|' || CAST(w.id AS VARCHAR))"
        parts.append(
            f"""aw{r} AS (
  SELECT v.id, CAST(COALESCE(s.wd, 0) AS DOUBLE) AS wd
  FROM av{p} v LEFT JOIN (
    SELECT a.src AS id, COUNT(*) AS wd FROM adj a
    WHERE a.src IN (SELECT id FROM av{p})
      AND a.dst IN (SELECT id FROM av{p})
    GROUP BY a.src
  ) s ON s.id = v.id
),
s0_{r} AS MATERIALIZED (
  SELECT w.id, w.wd FROM aw{r} w
  WHERE w.wd = 0
     OR CAST({_md5_long13_sql(h)} AS DOUBLE) / 4503599627370496.0
        < 1.0 / (2 * w.wd)
),
sp{r} AS MATERIALIZED (
  SELECT s.id FROM s0_{r} s
  WHERE s.id NOT IN (
    SELECT CASE WHEN su.wd > sv.wd THEN e.dst ELSE e.src END
    FROM edges e
    JOIN s0_{r} su ON su.id = e.src
    JOIN s0_{r} sv ON sv.id = e.dst
  )
),
av{r} AS MATERIALIZED (
  SELECT id FROM av{p}
  WHERE id NOT IN (SELECT id FROM sp{r})
    AND id NOT IN (SELECT a.src FROM adj a
                   JOIN sp{r} s ON s.id = a.dst)
)"""
        )
    chosen = " UNION ALL ".join(
        f"SELECT id FROM sp{r}" for r in range(1, rounds + 1)
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
chosen AS ({chosen})
SELECT n.id, n.id IN (SELECT id FROM chosen) AS in_set
FROM nodes n ORDER BY n.id"""
    )


SQL_LUBY = _luby_sql()


# ---------------------------------------------------------------------------
# Partition / cover quality family (community/PartitionHubDominance.cpp,
# IntrapartitionDensity.cpp, IsolatedInterpartitionConductance.cpp,
# IsolatedInterpartitionExpansion.cpp, PartitionFragmentation.cpp,
# StablePartitionNodes.cpp, CoverHubDominance.cpp, CoverF1Similarity.cpp)
# — two single-row gates over the deterministic id%4 partition and the
# overlapping (id%4) + (id%7==0 -> subset 4) cover vs the id%5 reference.
# ---------------------------------------------------------------------------


def q_partition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.partitionquality import (
        intrapartition_density,
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
        partition_fragmentation,
        partition_hub_dominance,
        stable_partition_nodes,
    )

    g = load_graph(spark, sf_dir)
    labels = g.nodes().select("id", (F.col("id") % 4).alias("label"))
    _, phd = partition_hub_dominance(g, labels)
    _, ipd, ipd_g = intrapartition_density(g, labels)
    _, iic = isolated_interpartition_conductance(g, labels)
    _, iie = isolated_interpartition_expansion(g, labels)
    _, frag = partition_fragmentation(g, labels)
    _, _stab_summary, stable_frac = stable_partition_nodes(g, labels)
    row = [
        round(v, 6)
        for v in (
            phd["avg"], phd["min"], phd["max"],
            ipd["avg"], ipd["min"], ipd["max"], ipd_g,
            iic["avg"], iic["min"], iic["max"],
            iie["avg"], iie["min"], iie["max"],
            frag["avg"], frag["min"], frag["max"],
            stable_frac,
        )
    ]
    return spark.createDataFrame(
        [tuple(row)],
        "phd_avg double, phd_min double, phd_max double, "
        "ipd_avg double, ipd_min double, ipd_max double, "
        "ipd_global double, "
        "iic_avg double, iic_min double, iic_max double, "
        "iie_avg double, iie_min double, iie_max double, "
        "frag_avg double, frag_min double, frag_max double, "
        "stable_frac double",
    )


SQL_PARTITION_QUALITY = f"""WITH RECURSIVE {GRAPH_CTES},
lab AS (SELECT id, id % 4 AS label FROM nodes),
sz AS (SELECT label, COUNT(*) AS csize FROM lab GROUP BY label),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
idg AS (
  SELECT a.src AS id, COUNT(*) AS ideg FROM adj a
  WHERE a.src % 4 = a.dst % 4 GROUP BY a.src
),
phd AS (
  SELECT l.label, MAX(COALESCE(i.ideg, 0)) AS mdeg, COUNT(*) AS csize
  FROM lab l LEFT JOIN idg i ON i.id = l.id GROUP BY l.label
),
phdv AS (
  SELECT label,
         CASE WHEN csize > 1 THEN CAST(mdeg AS DOUBLE) / (csize - 1)
              ELSE 1.0 END AS v
  FROM phd
),
intra AS (
  SELECT e.src % 4 AS label, COUNT(*) AS intra FROM edges e
  WHERE e.src % 4 = e.dst % 4 GROUP BY e.src % 4
),
ipd AS (
  SELECT s.label, s.csize, COALESCE(i.intra, 0) AS intra,
         CAST(s.csize * (s.csize - 1) / 2 AS DOUBLE) AS poss
  FROM sz s LEFT JOIN intra i ON i.label = s.label
),
ipdv AS (
  SELECT label,
         CASE WHEN poss > 0 THEN intra / poss ELSE 1.0 END AS v
  FROM ipd
),
cut AS (
  SELECT label, SUM(w) AS cut FROM (
    SELECT e.src % 4 AS label, 1.0 AS w FROM edges e
    WHERE e.src % 4 <> e.dst % 4
    UNION ALL
    SELECT e.dst % 4 AS label, 1.0 AS w FROM edges e
    WHERE e.src % 4 <> e.dst % 4
  ) GROUP BY label
),
vol AS (
  SELECT a.src % 4 AS label, CAST(COUNT(*) AS DOUBLE) AS vol
  FROM adj a GROUP BY a.src % 4
),
tv AS (SELECT CAST(2 * COUNT(*) AS DOUBLE) AS t FROM edges),
iicv AS (
  SELECT s.label,
         CASE WHEN LEAST(v.vol, t.t - v.vol) > 0
              THEN COALESCE(c.cut, 0) / LEAST(v.vol, t.t - v.vol)
              ELSE 0.0 END AS v
  FROM sz s LEFT JOIN cut c ON c.label = s.label
  LEFT JOIN vol v ON v.label = s.label, tv t
),
iiev AS (
  SELECT s.label,
         COALESCE(c.cut, 0) / LEAST(CAST(s.csize AS DOUBLE), n.n - s.csize)
           AS v
  FROM sz s LEFT JOIN cut c ON c.label = s.label, nn n
),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
comp AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id),
ints AS (
  SELECT l.label, c.comp, COUNT(*) AS isz
  FROM lab l JOIN comp c ON c.id = l.id GROUP BY l.label, c.comp
),
fragv AS (
  SELECT i.label, 1.0 - CAST(MAX(i.isz) AS DOUBLE) / s.csize AS v
  FROM ints i JOIN sz s ON s.label = i.label GROUP BY i.label, s.csize
),
nbw AS (
  SELECT a.src AS id, a.dst % 4 AS lv, CAST(COUNT(*) AS DOUBLE) AS w
  FROM adj a GROUP BY a.src, a.dst % 4
),
stv AS (
  SELECT l.id,
         CASE WHEN NOT EXISTS (SELECT 1 FROM adj a WHERE a.src = l.id)
              THEN TRUE
              ELSE COALESCE((SELECT n1.w FROM nbw n1
                             WHERE n1.id = l.id AND n1.lv = l.label), 0)
                     > 0
                   AND COALESCE((SELECT MAX(n2.w) FROM nbw n2
                                 WHERE n2.id = l.id
                                   AND n2.lv <> l.label), 0)
                     < COALESCE((SELECT n1.w FROM nbw n1
                                 WHERE n1.id = l.id
                                   AND n1.lv = l.label), 0)
         END AS stable
  FROM lab l
)
SELECT
  ROUND((SELECT AVG(v) FROM phdv), 6) AS phd_avg,
  ROUND((SELECT MIN(v) FROM phdv), 6) AS phd_min,
  ROUND((SELECT MAX(v) FROM phdv), 6) AS phd_max,
  ROUND((SELECT AVG(v) FROM ipdv), 6) AS ipd_avg,
  ROUND((SELECT MIN(v) FROM ipdv), 6) AS ipd_min,
  ROUND((SELECT MAX(v) FROM ipdv), 6) AS ipd_max,
  ROUND((SELECT SUM(intra) / SUM(poss) FROM ipd), 6) AS ipd_global,
  ROUND((SELECT AVG(v) FROM iicv), 6) AS iic_avg,
  ROUND((SELECT MIN(v) FROM iicv), 6) AS iic_min,
  ROUND((SELECT MAX(v) FROM iicv), 6) AS iic_max,
  ROUND((SELECT AVG(v) FROM iiev), 6) AS iie_avg,
  ROUND((SELECT MIN(v) FROM iiev), 6) AS iie_min,
  ROUND((SELECT MAX(v) FROM iiev), 6) AS iie_max,
  ROUND((SELECT AVG(v) FROM fragv), 6) AS frag_avg,
  ROUND((SELECT MIN(v) FROM fragv), 6) AS frag_min,
  ROUND((SELECT MAX(v) FROM fragv), 6) AS frag_max,
  ROUND((SELECT SUM(CASE WHEN stable THEN 1 ELSE 0 END)
               * 1.0 / COUNT(*) FROM stv), 6) AS stable_frac"""


def q_cover_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.partitionquality import (
        cover_f1_similarity,
        cover_hub_dominance,
    )

    g = load_graph(spark, sf_dir)
    cover = (
        g.nodes().select("id", (F.col("id") % 4).alias("subset"))
        .unionByName(
            g.nodes().filter(F.col("id") % 7 == 0)
            .select("id", F.lit(4).cast("long").alias("subset"))
        )
    )
    ref = g.nodes().select("id", (F.col("id") % 5).alias("subset"))
    _, chd = cover_hub_dominance(g, cover)
    _, f1 = cover_f1_similarity(g, cover, ref)
    row = [
        round(v, 6)
        for v in (
            chd["avg"], chd["min"], chd["max"],
            f1["avg"], f1["min"], f1["max"], f1["weighted_avg"],
        )
    ]
    return spark.createDataFrame(
        [tuple(row)],
        "chd_avg double, chd_min double, chd_max double, "
        "f1_avg double, f1_min double, f1_max double, f1_wavg double",
    )


SQL_COVER_QUALITY = f"""WITH {GRAPH_CTES},
mem AS (
  SELECT id, id % 4 AS c FROM nodes
  UNION ALL
  SELECT id, 4 AS c FROM nodes WHERE id % 7 = 0
),
csz AS (SELECT c, COUNT(*) AS csize FROM mem GROUP BY c),
nmem AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM mem),
idg AS (
  SELECT m1.id, m1.c, COUNT(*) AS ideg
  FROM adj a
  JOIN mem m1 ON m1.id = a.src
  JOIN mem m2 ON m2.id = a.dst AND m2.c = m1.c
  GROUP BY m1.id, m1.c
),
chd AS (
  SELECT m.c, MAX(COALESCE(i.ideg, 0)) AS mdeg, COUNT(*) AS csize
  FROM mem m LEFT JOIN idg i ON i.id = m.id AND i.c = m.c
  GROUP BY m.c
),
chdv AS (
  SELECT c,
         CASE WHEN csize > 1 THEN CAST(mdeg AS DOUBLE) / (csize - 1)
              ELSE 1.0 END AS v
  FROM chd
),
ref AS (SELECT id, id % 5 AS r FROM nodes),
rsz AS (SELECT r, COUNT(*) AS rsize FROM ref GROUP BY r),
ov AS (
  SELECT m.c, f.r, COUNT(*) AS ov
  FROM mem m JOIN ref f ON f.id = m.id GROUP BY m.c, f.r
),
f1s AS (
  SELECT o.c, s.csize,
         MAX(2.0 * ((CAST(o.ov AS DOUBLE) / z.rsize)
                    * (CAST(o.ov AS DOUBLE) / s.csize))
             / ((CAST(o.ov AS DOUBLE) / z.rsize)
                + (CAST(o.ov AS DOUBLE) / s.csize))) AS v
  FROM ov o JOIN csz s ON s.c = o.c JOIN rsz z ON z.r = o.r
  GROUP BY o.c, s.csize
),
f1v AS (
  SELECT s.c, s.csize, COALESCE(f.v, 0.0) AS v
  FROM csz s LEFT JOIN f1s f ON f.c = s.c
)
SELECT
  ROUND((SELECT AVG(v) FROM chdv), 6) AS chd_avg,
  ROUND((SELECT MIN(v) FROM chdv), 6) AS chd_min,
  ROUND((SELECT MAX(v) FROM chdv), 6) AS chd_max,
  ROUND((SELECT AVG(v) FROM f1v), 6) AS f1_avg,
  ROUND((SELECT MIN(v) FROM f1v), 6) AS f1_min,
  ROUND((SELECT MAX(v) FROM f1v), 6) AS f1_max,
  ROUND((SELECT SUM(v * csize) / (SELECT m FROM nmem) FROM f1v), 6)
    AS f1_wavg"""


# ---------------------------------------------------------------------------
# NeighborhoodFunction / Volume / SPSP (distance/NeighborhoodFunction.cpp,
# Volume.cpp, SPSP.cpp) — NF and SPSP run on the starred connected graph
# (the graph_top_harmonic overlay) so the oracle's BFS unroll depth
# covers the diameter; Volume samples 8 md5-ranked start nodes on the
# raw graph with radii 1..3.
# ---------------------------------------------------------------------------

VOL_SAMPLES = 8
VOL_SEED = 42
SPSP_K = 4


def _starred(spark, sf_dir):
    from networkit_spark.graph import Graph

    g = load_graph(spark, sf_dir)
    star = (
        g.nodes()
        .filter((F.col("id") % 7 == 1) & (F.col("id") != 0))
        .select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    )
    edges2 = (
        g.edges.select("src", "dst")
        .unionByName(star)
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges2, vertices=g.nodes(), directed=False, weighted=False)


_STAR_CTES = """star AS (
  SELECT CAST(0 AS BIGINT) AS src, id AS dst FROM nodes
  WHERE id % 7 = 1 AND id <> 0
),
edges2 AS (
  SELECT src, dst FROM edges UNION SELECT src, dst FROM star
),
adj2 AS (
  SELECT src, dst FROM edges2
  UNION ALL SELECT dst AS src, src AS dst FROM edges2
)"""


def _bfs_unroll(adj: str, t0: str, hops: int, prefix: str = "t") -> str:
    steps = [f"{prefix}0 AS MATERIALIZED ({t0})"]
    for i in range(1, hops + 1):
        steps.append(
            f"""{prefix}{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM {prefix}{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM {adj} a JOIN {prefix}{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return ",\n".join(steps)


def q_neighborhood_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import neighborhood_function

    g2 = _starred(spark, sf_dir)
    return neighborhood_function(g2).orderBy("h")


SQL_NEIGHBORHOOD_FN = (
    f"WITH {GRAPH_CTES},\n{_STAR_CTES},\n"
    + _bfs_unroll(
        "adj2",
        "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM nodes",
        DIAM_HOPS,
    )
    + f""",
hist AS (
  SELECT dist AS h, COUNT(*) AS cnt FROM t{DIAM_HOPS}
  WHERE dist > 0 GROUP BY dist
)
SELECT h, SUM(cnt) OVER (ORDER BY h) AS nf FROM hist ORDER BY h"""
)


def q_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import volume

    g = load_graph(spark, sf_dir)
    return volume(
        g, [1.0, 2.0, 3.0], samples=VOL_SAMPLES, seed=VOL_SEED
    ).orderBy("r")


SQL_VOLUME = (
    f"WITH {GRAPH_CTES},\n"
    + f"""starts AS MATERIALIZED (
  SELECT id FROM nodes
  ORDER BY md5('vol|{VOL_SEED}|' || CAST(id AS VARCHAR)), id
  LIMIT {VOL_SAMPLES}
),\n"""
    + _bfs_unroll(
        "adj",
        "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM starts",
        3,
    )
    + f"""
SELECT CAST(r AS DOUBLE) AS r,
       (SELECT COUNT(*) FROM t3 WHERE dist <= r) * 1.0 / {VOL_SAMPLES}
         AS volume
FROM (VALUES (1), (2), (3)) AS radii(r) ORDER BY r"""
)


def q_spsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import spsp

    g2 = _starred(spark, sf_dir)
    nodes = [int(r["id"]) for r in g2.nodes().orderBy("id").collect()]
    sources = nodes[:SPSP_K]
    targets = nodes[-SPSP_K:]
    return spsp(g2, sources, targets).orderBy("s", "t")


SQL_SPSP = (
    f"WITH {GRAPH_CTES},\n{_STAR_CTES},\n"
    + f"""src AS (SELECT id FROM nodes ORDER BY id LIMIT {SPSP_K}),
tgt AS (SELECT id FROM nodes ORDER BY id DESC LIMIT {SPSP_K}),\n"""
    + _bfs_unroll(
        "adj2",
        "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM src",
        DIAM_HOPS,
    )
    + f"""
SELECT t.s, t.v AS t, t.dist FROM t{DIAM_HOPS} t
WHERE t.v IN (SELECT id FROM tgt)
ORDER BY t.s, t.v"""
)


# ---------------------------------------------------------------------------
# AlgebraicDistance (distance/AlgebraicDistance.cpp:29-147) — K=4
# md5-initialized load systems, 10 unrolled Jacobi iterations, per-
# system min-max normalization, max-norm per-edge scores.
# ---------------------------------------------------------------------------

AD_SYSTEMS = 4
AD_ITERS = 10
AD_SEED = 42


def q_algebraic_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import algebraic_distance

    g = load_graph(spark, sf_dir)
    return algebraic_distance(
        g, num_systems=AD_SYSTEMS, num_iters=AD_ITERS, omega=0.5,
        norm=0, seed=AD_SEED,
    ).select(
        "src", "dst", F.round("score", 6).alias("score")
    ).orderBy("src", "dst")


def _algebraic_distance_sql(
    k: int = AD_SYSTEMS, iters: int = AD_ITERS, seed: int = AD_SEED
) -> str:
    cols = [f"l{i}" for i in range(k)]
    init = ", ".join(
        f"CAST({_md5_long13_sql(f_h)} AS DOUBLE) / 4503599627370496.0"
        f" AS {c}"
        for i, c in enumerate(cols)
        for f_h in [f"md5('ad|{seed}|{i}|' || CAST(id AS VARCHAR))"]
    )
    parts = [f"x0 AS MATERIALIZED (SELECT id, {init} FROM nodes)"]
    for t in range(1, iters + 1):
        p = t - 1
        sums = ", ".join(
            f"SUM(x.{c}) AS s_{c}" for c in cols
        )
        blend = ", ".join(
            f"CASE WHEN n.wd IS NOT NULL THEN 0.5 * p.{c}"
            f" + 0.5 * (n.s_{c} / n.wd) ELSE p.{c} END AS {c}"
            for c in cols
        )
        parts.append(
            f"""n{t} AS (
  SELECT a.src AS id, CAST(COUNT(*) AS DOUBLE) AS wd, {sums}
  FROM adj a JOIN x{p} x ON x.id = a.dst GROUP BY a.src
),
x{t} AS MATERIALIZED (
  SELECT p.id, {blend}
  FROM x{p} p LEFT JOIN n{t} n ON n.id = p.id
)"""
        )
    mm = ", ".join(
        f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}" for c in cols
    )
    norm_cols = ", ".join(
        f"(m.mn_{c} - x.{c}) / (m.mn_{c} - m.mx_{c}) AS {c}" for c in cols
    )
    greatest = "GREATEST(" + ", ".join(
        f"ABS(u.{c} - v.{c})" for c in cols
    ) + ")"
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
mm AS (SELECT {mm} FROM x{iters}),
nx AS (SELECT x.id, {norm_cols} FROM x{iters} x, mm m)
SELECT e.src, e.dst, ROUND({greatest}, 6) AS score
FROM edges e
JOIN nx u ON u.id = e.src
JOIN nx v ON v.id = e.dst
ORDER BY e.src, e.dst"""
    )


SQL_ALGEBRAIC_DISTANCE = _algebraic_distance_sql()


# ---------------------------------------------------------------------------
# DynAPSP (distance/DynAPSP.cpp:30-170) — tracked-sources APSP relation
# relaxed through each inserted edge (insertions only, like the
# reference); the oracle recomputes the post-event BFS distances from
# the same sources.  PermanenceCentrality
# (centrality/PermanenceCentrality.cpp:15-157) over the id%4 partition.
# ---------------------------------------------------------------------------

DYNAPSP_K = 4
DYNAPSP_ADDS = 8


def q_dyn_apsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.dynapsp import DynAPSP

    g2 = _starred(spark, sf_dir)
    sources = [
        int(r["id"]) for r in g2.nodes().orderBy("id").limit(DYNAPSP_K)
        .collect()
    ]
    dap = DynAPSP(g2, sources=sources).run()
    nodes = g2.nodes()
    adds = (
        spark.range(DYNAPSP_ADDS)
        .select(
            F.least(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("a"),
            F.greatest(
                F.col("id"), (F.col("id") * F.col("id") * 7 + 3) % 997
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(
            g2.edges.select(F.col("src").alias("a"),
                            F.col("dst").alias("b")),
            ["a", "b"], "left_anti",
        )
        .join(nodes.withColumnRenamed("id", "a"), "a", "left_semi")
        .join(nodes.withColumnRenamed("id", "b"), "b", "left_semi")
        .orderBy("a", "b")
        .collect()
    )
    for r in adds:
        dap.update(("EDGE_ADDITION", int(r["a"]), int(r["b"]), 1.0))
    return dap.distances.select(
        "s", F.col("v").alias("t"), "dist"
    ).orderBy("s", "t")


SQL_DYN_APSP = (
    f"WITH {GRAPH_CTES},\n{_STAR_CTES},\n"
    + f"""addf AS (
  SELECT DISTINCT LEAST(i, (i * i * 7 + 3) % 997) AS a,
                  GREATEST(i, (i * i * 7 + 3) % 997) AS b
  FROM range({DYNAPSP_ADDS}) t(i)
  WHERE LEAST(i, (i * i * 7 + 3) % 997)
        <> GREATEST(i, (i * i * 7 + 3) % 997)
    AND NOT EXISTS (SELECT 1 FROM edges2 e
                    WHERE e.src = LEAST(i, (i * i * 7 + 3) % 997)
                      AND e.dst = GREATEST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = LEAST(i, (i * i * 7 + 3) % 997))
    AND EXISTS (SELECT 1 FROM nodes n
                WHERE n.id = GREATEST(i, (i * i * 7 + 3) % 997))
),
edges4 AS (
  SELECT src, dst FROM edges2
  UNION SELECT a AS src, b AS dst FROM addf
),
adj4 AS (
  SELECT src, dst FROM edges4
  UNION ALL SELECT dst AS src, src AS dst FROM edges4
),
src4 AS (SELECT id FROM nodes ORDER BY id LIMIT {DYNAPSP_K}),\n"""
    + _bfs_unroll(
        "adj4",
        "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM src4",
        DIAM_HOPS,
    )
    + f"""
SELECT s, v AS t, dist FROM t{DIAM_HOPS} ORDER BY s, v"""
)


def q_permanence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.misccentrality import (
        permanence_centrality,
    )

    g = load_graph(spark, sf_dir)
    labels = g.nodes().select("id", (F.col("id") % 4).alias("label"))
    return permanence_centrality(g, labels).select(
        "id", F.round("permanence", 6).alias("permanence")
    ).orderBy("id")


SQL_PERMANENCE = f"""WITH {GRAPH_CTES},
pl AS (
  SELECT a.src AS id, a.dst % 4 AS lv, COUNT(*) AS cnt
  FROM adj a GROUP BY a.src, a.dst % 4
),
pbase AS (
  SELECT n.id,
         COALESCE(SUM(CASE WHEN p.lv = n.id % 4 THEN p.cnt END), 0)
           AS intdeg,
         GREATEST(COALESCE(MAX(CASE WHEN p.lv <> n.id % 4 THEN p.cnt
                                END), 0), 1) AS max_ext,
         COALESCE(SUM(p.cnt), 0) AS deg
  FROM nodes n LEFT JOIN pl p ON p.id = n.id GROUP BY n.id
),
sn AS (
  SELECT a.src AS u, a.dst AS x FROM adj a
  WHERE a.src % 4 = a.dst % 4
),
tri AS (
  SELECT s1.u, COUNT(*) AS ntri
  FROM sn s1 JOIN sn s2 ON s1.u = s2.u AND s1.x < s2.x
  JOIN edges e ON e.src = s1.x AND e.dst = s2.x
  GROUP BY s1.u
),
icc AS (
  SELECT b.id,
         CASE WHEN b.intdeg >= 2
              THEN COALESCE(t.ntri, 0)
                   / (0.5 * b.intdeg * (b.intdeg - 1))
              ELSE 0.0 END AS icc,
         b.intdeg, b.max_ext, b.deg
  FROM pbase b LEFT JOIN tri t ON t.u = b.id
)
SELECT id,
       ROUND(CASE WHEN deg > 0
                  THEN CAST(intdeg AS DOUBLE) / max_ext / deg
                       - (1.0 - icc)
                  ELSE 0.0 END, 6) AS permanence
FROM icc ORDER BY id"""


# ---------------------------------------------------------------------------
# ReachableNodes exact (reachability/ReachableNodes.cpp:26-86) — SCC
# condensation + DAG closure; every node inherits its SCC's count.
# ---------------------------------------------------------------------------

def q_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.reachability import reachable_nodes

    g = load_directed_graph(spark, sf_dir)
    return (
        reachable_nodes(g, exact=True)
        .select("id", F.col("reachable_lb").alias("reachable"))
        .orderBy("id")
    )


SQL_REACHABLE = """
WITH RECURSIVE base AS (
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 31 + 7) % 997) AS v
  FROM orders
  UNION
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 57 + 13) % 997) AS v
  FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT DISTINCT ((o_orderkey * 17 + 3) % 997) AS u,
                  ((o_orderkey * 43 + 11) % 997) AS v
  FROM orders WHERE o_orderkey % 3 = 0
),
dedges AS MATERIALIZED (
  SELECT DISTINCT u AS src, v AS dst FROM base WHERE u <> v
),
dnodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM dedges UNION ALL SELECT dst FROM dedges
  ) t
),
reach(a, b) AS (
  SELECT id, id FROM dnodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON e.src = r.b
)
SELECT a AS id, COUNT(DISTINCT b) AS reachable
FROM reach GROUP BY a ORDER BY a
"""


# ---------------------------------------------------------------------------
# EpidemicSimulationSEIR (simulation/EpidemicSimulationSEIR.cpp:21-99) —
# md5-derandomized contacts, synchronous sweeps, 4 census rows per step.
# ---------------------------------------------------------------------------

SEIR_TMAX = 8
SEIR_P = 0.3
SEIR_ETIME = 2
SEIR_ITIME = 3
SEIR_SEED = 42


def q_seir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.simulation import epidemic_simulation_seir

    g = load_graph(spark, sf_dir)
    return epidemic_simulation_seir(
        g,
        t_max=SEIR_TMAX,
        trans_p=SEIR_P,
        exposed_time=SEIR_ETIME,
        infectious_time=SEIR_ITIME,
        start=None,
        seed=SEIR_SEED,
    ).orderBy("t", "state")


def _seir_sql(
    t_max: int = SEIR_TMAX,
    p: float = SEIR_P,
    e_time: int = SEIR_ETIME,
    i_time: int = SEIR_ITIME,
    seed: int = SEIR_SEED,
) -> str:
    threshold = int(p * (1 << 52))
    parts = [
        "st0 AS (SELECT MIN(id) AS s FROM nodes)",
        """p0 AS MATERIALIZED (
  SELECT id,
         CASE WHEN id = (SELECT s FROM st0) THEN 2 ELSE 0 END AS st,
         CAST(0 AS BIGINT) AS ts
  FROM nodes
)""",
    ]
    census = []
    for t in range(t_max):
        h = (
            f"md5('seir|{seed}|{t}|' || CAST(a.src AS VARCHAR) || '|' "
            "|| CAST(a.dst AS VARCHAR))"
        )
        upd = (
            f"(s.st = 1 AND {t} - s.ts >= {e_time}) OR "
            f"(s.st = 2 AND {t} - s.ts >= {i_time}) OR "
            f"(s.st = 0 AND e.id IS NOT NULL)"
        )
        parts.append(
            f"""ex{t} AS (
  SELECT DISTINCT a.dst AS id FROM adj a
  JOIN p{t} i ON i.id = a.src
  WHERE i.st = 2 AND {_md5_long13_sql(h)} <= {threshold}
)"""
        )
        parts.append(
            f"""p{t + 1} AS MATERIALIZED (
  SELECT s.id,
    CASE WHEN s.st = 1 AND {t} - s.ts >= {e_time} THEN 2
         WHEN s.st = 2 AND {t} - s.ts >= {i_time} THEN 3
         WHEN s.st = 0 AND e.id IS NOT NULL THEN 1
         ELSE s.st END AS st,
    CAST(CASE WHEN {upd} THEN {t} ELSE s.ts END AS BIGINT) AS ts
  FROM p{t} s LEFT JOIN ex{t} e ON e.id = s.id
)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT CAST({t} AS BIGINT) AS t, CAST(v.s AS BIGINT) AS state,
         CAST(COALESCE(k.c, 0) AS BIGINT) AS cnt
  FROM (VALUES (0), (1), (2), (3)) v(s)
  LEFT JOIN (SELECT st, COUNT(*) AS c FROM p{t + 1} GROUP BY st) k
    ON k.st = v.s
)"""
        )
        census.append(f"SELECT * FROM c{t}")
    body = " UNION ALL ".join(census)
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts) + f""",
allc AS ({body})
SELECT CAST((SELECT s FROM st0) AS BIGINT) AS start, t, state, cnt
FROM allc ORDER BY t, state"""
    )


SQL_SEIR = _seir_sql()


# ---------------------------------------------------------------------------
# GedWalk greedy group centrality (centrality/GedWalk.cpp:150-246,302-350,
# 410-421) — fixed-level GED_L objective, estimate-pruned batched greedy.
# ---------------------------------------------------------------------------

GED_K = 2
GED_LEVELS = 3
GED_C = None  # exhaustive batched evaluation (see operators/gedwalk.py)


def q_gedwalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.gedwalk import gedwalk

    g = load_graph(spark, sf_dir)
    return gedwalk(
        g, k=GED_K, levels=GED_LEVELS, candidates=GED_C
    ).orderBy("rank")


def _gedwalk_sql(
    k: int = GED_K, levels: int = GED_LEVELS, c: int | None = GED_C
) -> str:
    a1 = "(SELECT a FROM al)"

    def apow(i: int) -> str:
        return "(" + " * ".join([a1] * i) + ")"

    parts = [
        "al AS (SELECT 1.0 / (1.0 + MAX(degree)) AS a FROM deg)",
        "g0 AS (SELECT id FROM nodes WHERE FALSE)",
    ]
    outs = []
    for r in range(1, k + 1):
        gp = f"g{r - 1}"
        # estimate DP: pOut levels with the group blocked
        parts.append(
            f"""q{r}e0 AS MATERIALIZED (
  SELECT id, CASE WHEN id IN (SELECT id FROM {gp}) THEN 0.0
                  ELSE 1.0 END AS p
  FROM nodes
)"""
        )
        for i in range(1, levels + 1):
            parts.append(
                f"""q{r}e{i} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.id IN (SELECT id FROM {gp}) THEN 0.0
              ELSE COALESCE(s.v, 0.0) END AS p
  FROM nodes n LEFT JOIN (
    SELECT a.src AS id, SUM(pp.p) AS v
    FROM adj a JOIN q{r}e{i - 1} pp ON pp.id = a.dst GROUP BY a.src
  ) s ON s.id = n.id
)"""
            )
        conv_terms = []
        for l in range(1, levels + 1):
            conv = " + ".join(
                f"e{l - m}.p * e{m}.p" for m in range(l + 1)
            )
            conv_terms.append(f"{apow(l)} * ({conv})")
        joins = " ".join(
            f"JOIN q{r}e{i} e{i} ON e{i}.id = e0.id"
            for i in range(1, levels + 1)
        )
        parts.append(
            f"""q{r}est AS MATERIALIZED (
  SELECT e0.id, {' + '.join(conv_terms)} AS est
  FROM q{r}e0 e0 {joins}
)"""
        )
        limit = (
            f"ORDER BY ROUND(est, 6) DESC, id ASC LIMIT {c}"
            if c is not None
            else ""
        )
        parts.append(
            f"""q{r}cand AS MATERIALIZED (
  SELECT id FROM q{r}est
  WHERE id NOT IN (SELECT id FROM {gp})
  {limit}
)"""
        )
        member = (
            f"(x.id = x.cand OR x.id IN (SELECT id FROM {gp}))"
        )
        parts.append(
            f"""q{r}x0 AS MATERIALIZED (
  SELECT c.id AS cand, n.id,
         CASE WHEN n.id = c.id OR n.id IN (SELECT id FROM {gp})
              THEN 1.0 ELSE 0.0 END AS hit,
         CASE WHEN n.id = c.id OR n.id IN (SELECT id FROM {gp})
              THEN 0.0 ELSE 1.0 END AS miss
  FROM q{r}cand c CROSS JOIN nodes n
)"""
        )
        for i in range(1, levels + 1):
            parts.append(
                f"""q{r}x{i} AS MATERIALIZED (
  SELECT x.cand, x.id,
    CASE WHEN {member}
         THEN COALESCE(s.sh, 0.0) + COALESCE(s.sm, 0.0)
         ELSE COALESCE(s.sh, 0.0) END AS hit,
    CASE WHEN {member} THEN 0.0
         ELSE COALESCE(s.sm, 0.0) END AS miss
  FROM q{r}x{i - 1} x LEFT JOIN (
    SELECT pp.cand, a.src AS id, SUM(pp.hit) AS sh, SUM(pp.miss) AS sm
    FROM adj a JOIN q{r}x{i - 1} pp ON pp.id = a.dst
    GROUP BY pp.cand, a.src
  ) s ON s.cand = x.cand AND s.id = x.id
)"""
            )
        lvl_sums = " ".join(
            f"JOIN (SELECT cand, SUM(hit) AS s{i} FROM q{r}x{i} "
            f"GROUP BY cand) t{i} ON t{i}.cand = t1.cand"
            for i in range(2, levels + 1)
        )
        score = " + ".join(
            f"{apow(i)} * t{i}.s{i}" for i in range(1, levels + 1)
        )
        prev = "0.0" if r == 1 else f"(SELECT score FROM p{r - 1})"
        parts.append(
            f"""q{r}sc AS MATERIALIZED (
  SELECT t1.cand, {score} AS score
  FROM (SELECT cand, SUM(hit) AS s1 FROM q{r}x1 GROUP BY cand) t1
  {lvl_sums}
)"""
        )
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT cand AS id, score, score - {prev} AS gain
  FROM q{r}sc
  ORDER BY ROUND(score - {prev}, 6) DESC, cand ASC LIMIT 1
)"""
        )
        parts.append(
            f"g{r} AS (SELECT id FROM {gp} UNION ALL SELECT id FROM p{r})"
        )
        outs.append(
            f"SELECT CAST({r} AS BIGINT) AS rank, id, "
            f"ROUND(gain, 6) AS gain, ROUND(score, 6) AS group_score "
            f"FROM p{r}"
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\n"
        + " UNION ALL ".join(outs)
        + " ORDER BY rank"
    )


SQL_GEDWALK = _gedwalk_sql()


# ---------------------------------------------------------------------------
# Bidirectional BFS st-distances (distance/BidirectionalBFS.cpp:15-121) —
# same pairs as graph_spsp, so the oracle is the plain BFS unroll: a
# cross-PLAN check (alternating two-ball expansion vs full multi-source
# sweep must produce identical distances).
# ---------------------------------------------------------------------------

def q_st_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.stsearch import st_distances

    g2 = _starred(spark, sf_dir)
    nodes = [int(r["id"]) for r in g2.nodes().orderBy("id").collect()]
    pairs = [(s, t) for s in nodes[:SPSP_K] for t in nodes[-SPSP_K:]]
    return st_distances(g2, pairs).orderBy("s", "t")


SQL_ST_DISTANCE = SQL_SPSP


# ---------------------------------------------------------------------------
# AllSimplePaths (reachability/AllSimplePaths.cpp:20-216) — per-length
# counts of simple hub->far-node paths, cutoff-bounded.
# ---------------------------------------------------------------------------

ASP_CUTOFF = 4


def q_simple_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.stsearch import all_simple_paths

    g2 = _starred(spark, sf_dir)
    t = int(g2.nodes().agg(F.max("id")).first()[0])
    paths = all_simple_paths(g2, 0, t, cutoff=ASP_CUTOFF)
    return (
        paths.groupBy("length")
        .agg(F.count("*").alias("cnt"))
        .orderBy("length")
    )


def _simple_paths_sql(cutoff: int = ASP_CUTOFF) -> str:
    return (
        f"WITH RECURSIVE {GRAPH_CTES},\n{_STAR_CTES},\n"
        + f"""tgt AS (SELECT MAX(id) AS t FROM nodes),
p(path, tail, len) AS (
  SELECT '|0|', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT p.path || CAST(a.dst AS VARCHAR) || '|', a.dst, p.len + 1
  FROM p JOIN adj2 a ON a.src = p.tail
  WHERE p.len < {cutoff}
    AND p.tail <> (SELECT t FROM tgt)
    AND position('|' || CAST(a.dst AS VARCHAR) || '|' IN p.path) = 0
)
SELECT len AS length, COUNT(*) AS cnt FROM p
WHERE tail = (SELECT t FROM tgt) GROUP BY len ORDER BY len"""
    )


SQL_SIMPLE_PATHS = _simple_paths_sql()


# ---------------------------------------------------------------------------
# SpanningEdgeCentrality + CommuteTimeDistance
# (centrality/SpanningEdgeCentrality.cpp:33-60,
#  distance/CommuteTimeDistance.cpp:38-67,148-161) — batched damped-
# Jacobi Laplacian solves, replayed sweep-for-sweep by the oracle.
# ---------------------------------------------------------------------------

SEC_SAMPLE = 8
SEC_ITERS = 30
SEC_SEED = 42


def q_spanning_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.electrical import spanning_edge_centrality

    g = load_graph(spark, sf_dir)
    vol = float(g.adj().count())  # unweighted volume = 2m
    sec = spanning_edge_centrality(
        g, sample=SEC_SAMPLE, seed=SEC_SEED, iters=SEC_ITERS
    )
    return sec.select(
        "src", "dst",
        F.round("score", 6).alias("score"),
        F.round(F.sqrt(F.col("score") * F.lit(vol)), 6).alias("ctd"),
    ).orderBy("src", "dst")


def _spanning_edge_sql(
    sample: int = SEC_SAMPLE, iters: int = SEC_ITERS, seed: int = SEC_SEED
) -> str:
    parts = [
        f"""se AS MATERIALIZED (
  SELECT src, dst, CAST(src AS VARCHAR) || '_' || CAST(dst AS VARCHAR) AS tag
  FROM edges
  ORDER BY md5('sec|{seed}|' || CAST(src AS VARCHAR) || '|'
               || CAST(dst AS VARCHAR)), src, dst
  LIMIT {sample}
)""",
        """js0 AS MATERIALIZED (
  SELECT se.tag, n.id,
         CASE WHEN n.id = se.src THEN 1.0
              WHEN n.id = se.dst THEN -1.0 ELSE 0.0 END AS b,
         CAST(d.degree AS DOUBLE) AS deg,
         0.0 AS x
  FROM se CROSS JOIN nodes n JOIN deg d ON d.id = n.id
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""js{i} AS MATERIALIZED (
  SELECT s.tag, s.id, s.b, s.deg,
         (1.0 - 0.5) * s.x
           + 0.5 * (s.b + COALESCE(m.ax, 0.0)) / s.deg AS x
  FROM js{i - 1} s LEFT JOIN (
    SELECT p.tag, a.src AS id, SUM(1.0 * p.x) AS ax
    FROM adj a JOIN js{i - 1} p ON p.id = a.dst GROUP BY p.tag, a.src
  ) m ON m.tag = s.tag AND m.id = s.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f""",
vol AS (SELECT COUNT(*) * 1.0 AS v FROM adj),
fin AS (
  SELECT se.src, se.dst, ABS(xu.x - xv.x) AS r
  FROM se
  JOIN js{iters} xu ON xu.tag = se.tag AND xu.id = se.src
  JOIN js{iters} xv ON xv.tag = se.tag AND xv.id = se.dst
)
SELECT src, dst, ROUND(r, 6) AS score,
       ROUND(SQRT(r * (SELECT v FROM vol)), 6) AS ctd
FROM fin ORDER BY src, dst"""
    )


SQL_SPANNING_EDGE = _spanning_edge_sql()


# ---------------------------------------------------------------------------
# FloydWarshall (distance/FloydWarshall.cpp:38-86 + tagNegativeCycles
# :18-35) — min-plus squaring on the id%13 directed subgraph with
# deterministic weights ((src*3+dst)%7 - 1), so negative edges exist.
# ---------------------------------------------------------------------------

FW_MOD = 13
FW_ROUNDS = 8  # ceil(log2(subgraph n)) + 1 at contract scale; extra
               # squaring rounds are idempotent post-convergence


def q_floyd_warshall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.floydwarshall import floyd_warshall

    g = load_directed_graph(spark, sf_dir)
    sedges = (
        g.edges.filter(
            (F.col("src") % FW_MOD == 0) & (F.col("dst") % FW_MOD == 0)
        )
        .select(
            "src", "dst",
            ((F.col("src") * 3 + F.col("dst")) % 7 - 1)
            .cast("double")
            .alias("weight"),
        )
    )
    gd = Graph(sedges, vertices=None, directed=True, weighted=True)
    d, _ = floyd_warshall(gd)
    return d.select(
        "u", "v", F.round("dist", 6).alias("dist")
    ).orderBy("u", "v")


def _floyd_warshall_sql(rounds: int = FW_ROUNDS, mod: int = FW_MOD) -> str:
    parts = [
        f"""sedges AS MATERIALIZED (
  SELECT src, dst, CAST((src * 3 + dst) % 7 - 1 AS DOUBLE) AS w
  FROM dedges WHERE src % {mod} = 0 AND dst % {mod} = 0
)""",
        """snodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM sedges UNION ALL SELECT dst FROM sedges
  ) t
)""",
        """r0 AS MATERIALIZED (
  SELECT u, v, MIN(d) AS d FROM (
    SELECT id AS u, id AS v, 0.0 AS d FROM snodes
    UNION ALL
    SELECT src AS u, dst AS v, w AS d FROM sedges WHERE src <> dst
  ) t GROUP BY u, v
)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT COALESCE(p.u, m.u) AS u, COALESCE(p.v, m.v) AS v,
         LEAST(COALESCE(p.d, 1e18), COALESCE(m.nd, 1e18)) AS d
  FROM r{i - 1} p FULL OUTER JOIN (
    SELECT a.u, b.v, MIN(a.d + b.d) AS nd
    FROM r{i - 1} a JOIN r{i - 1} b ON b.u = a.v GROUP BY a.u, b.v
  ) m ON m.u = p.u AND m.v = p.v
)"""
        )
    base = SQL_SCC[SQL_SCC.index("base AS") : SQL_SCC.index("dnodes AS")]
    return (
        "WITH RECURSIVE "
        + base
        + ",\n".join(parts)
        + f""",
negw AS (SELECT u AS w FROM r{rounds} WHERE u = v AND d < 0),
pois AS (
  SELECT DISTINCT a.u, b.v
  FROM r{rounds} a JOIN negw nw ON a.v = nw.w
  JOIN r{rounds} b ON b.u = nw.w
)
SELECT r.u, r.v,
       ROUND(CASE WHEN p.u IS NOT NULL
                  THEN CAST('-infinity' AS DOUBLE) ELSE r.d END, 6) AS dist
FROM r{rounds} r LEFT JOIN pois p ON p.u = r.u AND p.v = r.v
ORDER BY r.u, r.v"""
    )


SQL_FLOYD_WARSHALL = _floyd_warshall_sql()


# ---------------------------------------------------------------------------
# DynBFS (distance/DynBFS.cpp:21-178) — incremental (dist, sigma)
# repair under an insertion batch, gated against a STATIC sigma-BFS of
# the post-batch graph (incremental == recompute, cross-engine).
# ---------------------------------------------------------------------------

DYNB_MOD = 17
DYNB_HOPS = 16  # output hop cap, same convention as graph_bfs


def q_dyn_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.dynsssp import dyn_sssp_update, sssp_sigma

    g = load_graph(spark, sf_dir)
    k = F.col("o_orderkey")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    adds = (
        orders.filter(k % DYNB_MOD == 0)
        .select(
            ((k * 11 + 2) % N_MOD).alias("a"), ((k * 23 + 8) % N_MOD).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .distinct()
        .join(g.edges.select("src", "dst"), ["src", "dst"], "left_anti")
        .localCheckpoint(eager=True)
    )
    source = int(g.nodes().agg(F.min("id")).first()[0])
    state0 = sssp_sigma(g, source)
    edges2 = (
        g.edges.select("src", "dst")
        .unionByName(adds)
        .withColumn("weight", F.lit(1.0))
    )
    g2 = Graph(edges2, vertices=None, directed=False, weighted=False)
    out = dyn_sssp_update(
        g2, source, state0,
        adds.select(F.col("src").alias("u"), F.col("dst").alias("v")),
    )
    return (
        out.filter(F.col("dist") <= DYNB_HOPS)
        .select(
            "id",
            F.col("dist").cast("long").alias("dist"),
            F.col("sigma").cast("long").alias("sigma"),
        )
        .orderBy("id")
    )


def _dyn_bfs_sql(hops: int = DYNB_HOPS, mod: int = DYNB_MOD) -> str:
    parts = [
        f"""badds AS MATERIALIZED (
  SELECT DISTINCT LEAST(a, b) AS src, GREATEST(a, b) AS dst FROM (
    SELECT (o_orderkey * 11 + 2) % {N_MOD} AS a,
           (o_orderkey * 23 + 8) % {N_MOD} AS b
    FROM orders WHERE o_orderkey % {mod} = 0
  ) t WHERE a <> b
  AND NOT EXISTS (SELECT 1 FROM edges e
                  WHERE e.src = LEAST(a, b) AND e.dst = GREATEST(a, b))
)""",
        """adj3 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM edges UNION SELECT src, dst FROM badds
  ) e
  UNION ALL
  SELECT dst, src FROM (
    SELECT src, dst FROM edges UNION SELECT src, dst FROM badds
  ) e2
)""",
        "src0 AS (SELECT MIN(id) AS s FROM nodes)",
        """l0 AS MATERIALIZED (
  SELECT (SELECT s FROM src0) AS id, CAST(0 AS BIGINT) AS dist,
         CAST(1 AS BIGINT) AS sigma
)""",
        "st0 AS (SELECT * FROM l0)",
    ]
    for i in range(1, hops + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT a.dst AS id, CAST({i} AS BIGINT) AS dist,
         CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM adj3 a JOIN l{i - 1} p ON p.id = a.src
  WHERE a.dst NOT IN (SELECT id FROM st{i - 1})
  GROUP BY a.dst
)"""
        )
        parts.append(
            f"st{i} AS (SELECT * FROM st{i - 1} UNION ALL SELECT * FROM l{i})"
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id, dist, sigma FROM st{hops} ORDER BY id"
    )


SQL_DYN_BFS = _dyn_bfs_sql()


# ---------------------------------------------------------------------------
# LocalMaxMatcher (matching/LocalMaxMatcher.cpp:21-77) — md5 tie order,
# unrolled locally-heaviest rounds.
# ---------------------------------------------------------------------------

LMM_ROUNDS = 12


def q_local_max_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.matching import local_max_matching

    g = load_graph(spark, sf_dir)
    matched, rounds = local_max_matching(g)
    if rounds > LMM_ROUNDS:
        raise AssertionError(
            f"local_max_matching took {rounds} > {LMM_ROUNDS} rounds; "
            "raise the oracle unroll"
        )
    return matched.orderBy("u", "v")


def _local_max_matching_sql(rounds: int = LMM_ROUNDS) -> str:
    parts = [
        """lv0 AS MATERIALIZED (
  SELECT src AS u, dst AS v, 1.0 AS w,
         md5('lmm|' || CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR))
           AS tie
  FROM edges
)"""
    ]
    unions = []
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""cb{r} AS (
  SELECT u, v, w, tie FROM lv{p}
  UNION ALL SELECT v AS u, u AS v, w, tie FROM lv{p}
),
cd{r} AS (
  SELECT u, v AS pick FROM (
    SELECT u, v, ROW_NUMBER() OVER (
      PARTITION BY u ORDER BY w DESC, tie DESC, v DESC) AS rn
    FROM cb{r}
  ) t WHERE rn = 1
),
ag{r} AS (
  SELECT a.u AS u, b.u AS v
  FROM cd{r} a JOIN cd{r} b ON a.pick = b.u AND b.pick = a.u
  WHERE a.u < b.u
),
mn{r} AS (
  SELECT u AS id FROM ag{r} UNION ALL SELECT v FROM ag{r}
),
lv{r} AS MATERIALIZED (
  SELECT l.u, l.v, l.w, l.tie FROM lv{p} l
  WHERE l.u NOT IN (SELECT id FROM mn{r})
    AND l.v NOT IN (SELECT id FROM mn{r})
)"""
        )
        unions.append(f"SELECT u, v FROM ag{r}")
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\n"
        + " UNION ALL ".join(unions)
        + " ORDER BY u, v"
    )


SQL_LOCAL_MAX_MATCHING = _local_max_matching_sql()


# ---------------------------------------------------------------------------
# ModularityScoring (scoring/ModularityScoring.hpp:41-71) — per-edge
# Delta-modularity of merging singleton clusters.
# ---------------------------------------------------------------------------

def q_modularity_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scoring import modularity_edge_score

    g = load_graph(spark, sf_dir)
    return modularity_edge_score(g).select(
        "src", "dst", F.round("score", 6).alias("score")
    ).orderBy("src", "dst")


SQL_MODULARITY_SCORING = f"""
WITH {GRAPH_CTES},
tw AS (SELECT COUNT(*) * 1.0 AS w FROM edges)
SELECT e.src, e.dst,
       ROUND(1.0 / (SELECT w FROM tw)
             - (ds.degree / (2.0 * (SELECT w FROM tw)))
               * (dd.degree / (2.0 * (SELECT w FROM tw))), 6) AS score
FROM edges e
JOIN deg ds ON ds.id = e.src JOIN deg dd ON dd.id = e.dst
ORDER BY e.src, e.dst
"""


# ---------------------------------------------------------------------------
# NeighborhoodFunctionHeuristic (distance/NeighborhoodFunctionHeuristic
# .cpp:41-129, SPLIT strategy) — degree-sorted stride sample, exact
# integer half-up scaling, anchored endpoints; starred contract graph.
# ---------------------------------------------------------------------------

NFH_SAMPLES = 16


def q_nf_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import (
        neighborhood_function_heuristic,
    )

    g2 = _starred(spark, sf_dir)
    return neighborhood_function_heuristic(
        g2, n_samples=NFH_SAMPLES
    ).orderBy("h")


def _nf_heuristic_sql(samples: int = NFH_SAMPLES, hops: int = DIAM_HOPS) -> str:
    return (
        f"WITH {GRAPH_CTES},\n{_STAR_CTES},\n"
        + "deg2 AS (SELECT src AS id, COUNT(*) AS degree FROM adj2 "
        "GROUP BY src),\n"
        + "nn AS (SELECT COUNT(*) AS n FROM nodes),\n"
        + "mm AS (SELECT COUNT(*) AS m FROM edges2),\n"
        + f"stp AS (SELECT GREATEST(1, (SELECT n FROM nn) // {samples}) "
        "AS s),\n"
        + _bfs_unroll(
            "adj2",
            "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM nodes",
            hops,
        )
        + f""",
dia AS (SELECT MAX(dist) AS d FROM t{hops}),
ranked AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY degree, id) - 1 AS rk FROM deg2
),
starts AS (
  SELECT id FROM ranked
  WHERE rk % (SELECT s FROM stp) = 0
    AND rk / (SELECT s FROM stp) < {samples}
),\n"""
        + _bfs_unroll(
            "adj2",
            "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM starts",
            hops,
            prefix="u",
        )
        + f""",
cnts AS (
  SELECT dist AS h, COUNT(*) AS c FROM u{hops} WHERE dist > 0 GROUP BY dist
),
mids AS (
  SELECT h,
         (2 * c * (SELECT n FROM nn) + {samples}) // (2 * {samples}) AS inc
  FROM cnts WHERE h >= 2 AND h <= (SELECT d FROM dia) - 1
),
cum AS (
  SELECT h, SUM(inc) OVER (ORDER BY h) AS acc FROM mids
),
hh AS (
  SELECT CAST(x.h AS BIGINT) AS h FROM (
    SELECT UNNEST(RANGE(1, (SELECT d FROM dia) + 1)) AS h
  ) x
)
SELECT hh.h,
       CAST(CASE WHEN hh.h = 1 THEN 2 * (SELECT m FROM mm)
            WHEN hh.h = (SELECT d FROM dia)
              THEN (SELECT n FROM nn) * ((SELECT n FROM nn) - 1)
            ELSE 2 * (SELECT m FROM mm)
                 + COALESCE((SELECT MAX(acc) FROM cum c2 WHERE c2.h <= hh.h),
                            0)
       END AS BIGINT) AS nf
FROM hh ORDER BY hh.h"""
    )


SQL_NF_HEURISTIC = _nf_heuristic_sql()


# ---------------------------------------------------------------------------
# ComplexPaths (centrality/ComplexPaths.cpp; Guilbeault-Centola complex
# contagion).  The standard contract graph is triangle-poor (contagion
# dies at the seed set), so these gates synthesize a DENSER graph:
# 199 nodes, 8 affine generators over Z_199 (~1530 edges, avg degree
# 15, 501 triangles) — threshold-2 contagion floods it in 6 rounds.
# The oracle unrolls the monotone-idempotent activation rounds (extra
# rounds past the fixpoint are no-ops) and the restricted BFS; the
# Spark side raises past CPX_ROUNDS/CPX_DEPTH so an unroll shortfall
# fails loudly rather than silently diverging.
# ---------------------------------------------------------------------------

CPX_MOD = 199
CPX_GENS = [(31, 7), (57, 13), (17, 3), (43, 11),
            (29, 5), (71, 23), (13, 19), (89, 37)]
CPX_T = 2
CPX_ROUNDS = 10
CPX_DEPTH = 12
CPX_NSRC = 8

DENSE_CTES = (
    "dbase AS (\n"
    + "\n  UNION\n".join(
        f"  SELECT DISTINCT (o_orderkey % {CPX_MOD}) AS u,\n"
        f"         ((o_orderkey * {a} + {b}) % {CPX_MOD}) AS v FROM orders"
        for a, b in CPX_GENS
    )
    + "\n),\n"
    + f"""dedges AS (
  SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst
  FROM dbase WHERE u <> v
),
dadj AS (
  SELECT src, dst FROM dedges
  UNION ALL
  SELECT dst AS src, src AS dst FROM dedges
),
dnodes AS (SELECT DISTINCT src AS id FROM dadj),
ddeg AS (SELECT src AS id, COUNT(*) AS degree FROM dadj GROUP BY src)"""
)


def load_dense_graph(spark: SparkSession, sf_dir: str):
    """Spark twin of DENSE_CTES."""
    from networkit_spark.graph import Graph

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    base = None
    for a, b in CPX_GENS:
        part = orders.select(
            (k % CPX_MOD).alias("u"), ((k * a + b) % CPX_MOD).alias("v")
        )
        base = part if base is None else base.unionByName(part)
    base = base.distinct()
    edges = (
        base.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"),
                F.greatest("u", "v").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=edges, vertices=None, directed=False, weighted=False)


def q_complex_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-node mode: adopters' activation round + BFS distance from
    the max-degree seed inside the complex graph."""
    from networkit_spark.operators.complexpaths import complex_path_graph
    from networkit_spark.graph import Graph
    from networkit_spark.operators.distance import bfs_distances

    g = load_dense_graph(spark, sf_dir)
    seed = int(
        g.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1)
        .collect()[0]["id"]
    )
    act, ce, rounds = complex_path_graph(g, seed, CPX_T,
                                         max_rounds=CPX_ROUNDS)
    cg = Graph(edges=ce.withColumn("weight", F.lit(1.0)), vertices=None,
               directed=False, weighted=False)
    dist, info = bfs_distances(cg, [seed], max_hops=CPX_DEPTH)
    if info.iterations >= CPX_DEPTH:
        raise AssertionError("complex BFS hit the oracle unroll depth")
    return (
        dist.join(act, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("round"), F.lit(-1)).cast("long").alias("round"),
            F.col("dist").cast("long").alias("dist"),
        )
        .orderBy("id")
    )


def _complex_paths_sql(rounds: int = CPX_ROUNDS, depth: int = CPX_DEPTH) -> str:
    parts = [
        """sd AS (SELECT id FROM ddeg ORDER BY degree DESC, id ASC LIMIT 1)""",
        f"""sm AS (
  SELECT a.dst AS id FROM dadj a
  WHERE a.src = (SELECT id FROM sd)
  ORDER BY md5('cpx|' || CAST((SELECT id FROM sd) AS VARCHAR)
               || '|' || CAST(a.dst AS VARCHAR)), a.dst
  LIMIT {CPX_T - 1}
)""",
        """e0 AS MATERIALIZED (
  SELECT id, 0 AS round FROM sd UNION ALL SELECT id, 0 AS round FROM sm
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""e{r} AS MATERIALIZED (
  SELECT id, round FROM e{r - 1}
  UNION ALL
  SELECT g.u AS id, {r} AS round FROM (
    SELECT a.src AS u, COUNT(*) AS c
    FROM dadj a JOIN e{r - 1} e ON e.id = a.dst
    GROUP BY a.src
  ) g
  WHERE g.c >= {CPX_T} AND g.u NOT IN (SELECT id FROM e{r - 1})
)"""
        )
    parts.append(
        f"""cadj AS MATERIALIZED (
  SELECT DISTINCT a.src, a.dst FROM dadj a
  WHERE a.src IN (SELECT id FROM e{rounds})
     OR a.dst IN (SELECT id FROM e{rounds})
)""",
    )
    parts.append(
        "d0 AS MATERIALIZED (SELECT id, 0 AS dist FROM sd)"
    )
    for l in range(1, depth + 1):
        parts.append(
            f"""d{l} AS MATERIALIZED (
  SELECT id, dist FROM d{l - 1}
  UNION ALL
  SELECT x.id, {l} AS dist FROM (
    SELECT DISTINCT a.dst AS id
    FROM cadj a JOIN d{l - 1} d ON d.id = a.src AND d.dist = {l - 1}
  ) x
  WHERE x.id NOT IN (SELECT id FROM d{l - 1})
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n{DENSE_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT d.id,
       CAST(COALESCE(e.round, -1) AS BIGINT) AS round,
       CAST(d.dist AS BIGINT) AS dist
FROM d{depth} d LEFT JOIN e{rounds} e ON e.id = d.id
ORDER BY d.id"""
    )


SQL_COMPLEX_PATHS = _complex_paths_sql()


def q_complex_plci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-nodes mode restricted to 8 md5-chosen sources: PLci(u)."""
    from networkit_spark.operators.complexpaths import complex_path_lengths

    g = load_dense_graph(spark, sf_dir)
    srcs = [
        int(r["id"])
        for r in g.nodes()
        .withColumn("r", F.md5(F.concat_ws("|", F.lit("cpxsrc"), F.col("id"))))
        .orderBy("r", "id")
        .limit(CPX_NSRC)
        .collect()
    ]
    plci = complex_path_lengths(
        g, CPX_T, sources=srcs, max_rounds=CPX_ROUNDS, max_depth=CPX_DEPTH
    )
    return plci.select("id", F.round("plci", 6).alias("plci")).orderBy("id")


def _complex_plci_sql(rounds: int = CPX_ROUNDS, depth: int = CPX_DEPTH) -> str:
    parts = [
        f"""srcs AS MATERIALIZED (
  SELECT id AS tag FROM dnodes
  ORDER BY md5('cpxsrc|' || CAST(id AS VARCHAR)), id
  LIMIT {CPX_NSRC}
)""",
        f"""tsm AS (
  SELECT tag, id FROM (
    SELECT s.tag, a.dst AS id,
           ROW_NUMBER() OVER (
             PARTITION BY s.tag
             ORDER BY md5('cpx|' || CAST(s.tag AS VARCHAR)
                          || '|' || CAST(a.dst AS VARCHAR)), a.dst
           ) AS rn
    FROM srcs s JOIN dadj a ON a.src = s.tag
  ) WHERE rn <= {CPX_T - 1}
)""",
        """te0 AS MATERIALIZED (
  SELECT tag, tag AS id FROM srcs UNION ALL SELECT tag, id FROM tsm
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""te{r} AS MATERIALIZED (
  SELECT tag, id FROM te{r - 1}
  UNION ALL
  SELECT g.tag, g.u AS id FROM (
    SELECT e.tag, a.src AS u, COUNT(*) AS c
    FROM dadj a JOIN te{r - 1} e ON e.id = a.dst
    GROUP BY e.tag, a.src
  ) g
  WHERE g.c >= {CPX_T}
    AND NOT EXISTS (SELECT 1 FROM te{r - 1} p
                    WHERE p.tag = g.tag AND p.id = g.u)
)"""
        )
    parts.append(
        f"""tcadj AS MATERIALIZED (
  SELECT DISTINCT e.tag, a.src, a.dst
  FROM dadj a JOIN te{rounds} e ON e.id = a.src
  UNION
  SELECT DISTINCT e.tag, a.src, a.dst
  FROM dadj a JOIN te{rounds} e ON e.id = a.dst
)"""
    )
    parts.append(
        "td0 AS MATERIALIZED (SELECT tag, tag AS id, 0 AS dist FROM srcs)"
    )
    for l in range(1, depth + 1):
        parts.append(
            f"""td{l} AS MATERIALIZED (
  SELECT tag, id, dist FROM td{l - 1}
  UNION ALL
  SELECT x.tag, x.id, {l} AS dist FROM (
    SELECT DISTINCT a.tag, a.dst AS id
    FROM tcadj a JOIN td{l - 1} d
      ON d.tag = a.tag AND d.id = a.src AND d.dist = {l - 1}
  ) x
  WHERE NOT EXISTS (SELECT 1 FROM td{l - 1} p
                    WHERE p.tag = x.tag AND p.id = x.id)
)"""
        )
    nn = "(SELECT COUNT(*) FROM dnodes)"
    return (
        f"WITH {GRAPH_CTES},\n{DENSE_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT s.tag AS id,
       ROUND(COALESCE(CAST(d.s AS DOUBLE), 0.0)
             / CAST({nn} AS DOUBLE), 6) AS plci
FROM srcs s LEFT JOIN (
  SELECT tag, SUM(dist) AS s FROM td{depth} GROUP BY tag
) d ON d.tag = s.tag
ORDER BY s.tag"""
    )


SQL_COMPLEX_PLCI = _complex_plci_sql()


# ---------------------------------------------------------------------------
# KPathCentrality (centrality/KPathCentrality.cpp, Alahakoon et al.
# randomized k-path) — md5-derandomized start/length/step draws; the
# oracle replays every self-avoiding walk step with a ROW_NUMBER pick
# equal to the Spark struct-min (md5 keys are unique per candidate).
# ---------------------------------------------------------------------------

KP_K = 5
KP_T = 345
KP_SEED = 42


def q_kpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.kpath import k_path_centrality

    g = load_graph(spark, sf_dir)
    scores, info = k_path_centrality(g, k=KP_K, seed=KP_SEED, n_walks=KP_T)
    if info.iterations > KP_K:
        raise AssertionError("k-path walks exceeded the oracle unroll")
    return scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _kpath_sql(k: int = KP_K, t: int = KP_T, seed: int = KP_SEED) -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"CAST(({nib}) AS BIGINT)"

    hs = horner(f"md5('{seed}|s|' || CAST(i AS VARCHAR))")
    hl = horner(f"md5('{seed}|l|' || CAST(i AS VARCHAR))")
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "kidx AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS idx FROM nodes)",
        f"""kw0 AS MATERIALIZED (
  SELECT s.i, s.l, x.id AS cur, [x.id] AS visited
  FROM (
    SELECT i, {hs} % (SELECT n FROM nn) AS sidx,
           1 + ({hl} % {k}) AS l
    FROM range({t}) t(i)
  ) s JOIN kidx x ON x.idx = s.sidx
)""",
    ]
    for j in range(1, k + 1):
        parts.append(
            f"""kw{j} AS MATERIALIZED (
  SELECT i, l, dst AS cur, list_append(visited, dst) AS visited
  FROM (
    SELECT w.i, w.l, w.visited, a.dst,
           ROW_NUMBER() OVER (
             PARTITION BY w.i
             ORDER BY md5('{seed}|p|{j}|' || CAST(w.i AS VARCHAR)
                          || '|' || CAST(a.dst AS VARCHAR)), a.dst
           ) AS rn
    FROM kw{j - 1} w JOIN adj a ON a.src = w.cur
    WHERE {j} <= w.l AND NOT list_contains(w.visited, a.dst)
  ) WHERE rn = 1
)"""
        )
    visits = " UNION ALL ".join(
        f"SELECT cur AS id FROM kw{j}" for j in range(1, k + 1)
    )
    parts.append(
        f"kcnt AS (SELECT id, COUNT(*) AS c FROM ({visits}) GROUP BY id)"
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT n.id,
       ROUND((({k}.0 * CAST((SELECT n FROM nn) AS DOUBLE))
              * CAST(COALESCE(c.c, 0) AS DOUBLE)) / {t}.0, 6) AS score
FROM nodes n LEFT JOIN kcnt c ON c.id = n.id
ORDER BY n.id"""
    )


SQL_KPATH = _kpath_sql()


# ---------------------------------------------------------------------------
# UST estimators (centrality/ApproxSpanningEdge.cpp, ForestCentrality.cpp,
# ApproxElectricalCloseness.cpp) — rows-only registry entries: the
# md5-derandomized loop-erased walks have data-dependent unbounded
# length, which SQL cannot unroll.  Correctness is pytest-proven against
# dense-exact pseudo-inverse values (tests/test_ust.py); these queries
# exist so the driver exercises the full sampling fan-out end-to-end on
# the 199-node dense contract graph.
# ---------------------------------------------------------------------------

UST_Q_SAMPLES = 256
UST_Q_SOLVE_ITERS = 120


def q_approx_spanning_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.ust import approx_spanning_edge

    g = load_dense_graph(spark, sf_dir)
    return (
        approx_spanning_edge(g, seed=1, n_samples=UST_Q_SAMPLES)
        .select("src", "dst", F.round("score", 6).alias("score"))
        .orderBy("src", "dst")
    )


def q_forest_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.ust import forest_centrality

    g = load_dense_graph(spark, sf_dir)
    return (
        forest_centrality(
            g, seed=1, n_samples=UST_Q_SAMPLES,
            solve_iters=UST_Q_SOLVE_ITERS,
        )
        .select("id", F.round("score", 6).alias("score"))
        .orderBy("id")
    )


def q_electrical_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.ust import approx_electrical_closeness

    g = load_dense_graph(spark, sf_dir)
    return (
        approx_electrical_closeness(
            g, seed=1, n_samples=UST_Q_SAMPLES,
            solve_iters=UST_Q_SOLVE_ITERS,
        )
        .select("id", F.round("score", 6).alias("score"))
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# Edge-score family (edgescores/*, sparsification/* scores) — three gates
# over the standard contract graph: a per-edge score suite (quadrangles,
# SCAN, chance-corrected, multiscale, geometric mean, linearizer), the
# prefix-Jaccard + Simmelian-overlap pair, and a 3-iteration SimRank
# unroll.  Every plan is deterministic (RANK ties share by attribute
# alone; the linearizer tie-break is the replayed md5).
# ---------------------------------------------------------------------------

ESS_LIN_SEED = 1
ESS_OV_RANK = 2
SIMRANK_C = 0.8
SIMRANK_ITERS = 3


def q_edge_score_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.edgescores import (
        chance_corrected_triangle_score,
        edge_score_linearizer,
        geometric_mean_score,
        multiscale_score,
        quadrangle_edge_score,
        scan_structural_similarity_score,
    )

    g = load_graph(spark, sf_dir)
    canon = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct()
    attr1 = canon.withColumn("att", F.lit(1.0))
    attr2 = canon.withColumn(
        "att", (F.col("src") + F.col("dst")).cast("double")
    )
    quad = quadrangle_edge_score(g).withColumnRenamed("score", "quad")
    scan = scan_structural_similarity_score(g).withColumnRenamed(
        "score", "scan"
    )
    ccs = chance_corrected_triangle_score(g).withColumnRenamed("score", "ccs")
    msc = multiscale_score(g, attr1).withColumnRenamed("score", "mscale")
    gm = geometric_mean_score(g, attr2).withColumnRenamed("score", "gmean")
    lin = edge_score_linearizer(g, attr2, seed=ESS_LIN_SEED).withColumnRenamed(
        "score", "lin"
    )
    keys = ["src", "dst"]
    return (
        quad.join(scan, keys)
        .join(ccs, keys)
        .join(msc, keys)
        .join(gm, keys)
        .join(lin, keys)
        .select(
            "src", "dst", "quad",
            F.round("scan", 6).alias("scan"),
            F.round("ccs", 6).alias("ccs"),
            F.round("mscale", 6).alias("mscale"),
            F.round("gmean", 6).alias("gmean"),
            F.round("lin", 6).alias("lin"),
        )
        .orderBy("src", "dst")
    )


SQL_EDGE_SCORE_SUITE = f"""WITH {GRAPH_CTES},
tric AS MATERIALIZED (
  SELECT e.src, e.dst,
         (SELECT COUNT(*) FROM adj a1 JOIN adj a2 ON a2.dst = a1.dst
          WHERE a1.src = e.src AND a2.src = e.dst) AS t
  FROM edges e
),
quadc AS MATERIALIZED (
  SELECT e.src, e.dst,
         (SELECT COUNT(*)
          FROM adj a1 JOIN adj a2 ON a2.src = a1.dst
               JOIN adj a3 ON a3.src = a2.dst AND a3.dst = e.src
          WHERE a1.src = e.dst AND a1.dst <> e.src
            AND a2.dst <> e.src AND a2.dst <> e.dst) AS q
  FROM edges e
),
msn AS (
  SELECT id, 1.0 - POWER(1.0 - 1.0 / degree, degree - 1.0) AS p FROM deg
),
gatt AS (SELECT src, dst, CAST(src + dst AS DOUBLE) AS att FROM edges),
gsum AS (
  SELECT x.id, SUM(x.att) AS s FROM (
    SELECT src AS id, att FROM gatt
    UNION ALL
    SELECT dst AS id, att FROM gatt
  ) x GROUP BY x.id
),
linr AS (
  SELECT src, dst,
         (ROW_NUMBER() OVER (
            ORDER BY CAST(src + dst AS DOUBLE),
                     md5('lin|{ESS_LIN_SEED}|' || CAST(src AS VARCHAR)
                         || '|' || CAST(dst AS VARCHAR)),
                     src, dst) - 1) AS pos
  FROM edges
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
mm AS (SELECT COUNT(*) AS m FROM edges)
SELECT e.src, e.dst,
       q.q AS quad,
       ROUND((t.t + 1.0) / SQRT((du.degree + 1.0) * (dv.degree + 1.0)), 6)
         AS scan,
       ROUND(CASE WHEN t.t > 0
                  THEN t.t * (nn.n - 2.0)
                       / ((du.degree - 1.0) * (dv.degree - 1.0))
                  WHEN du.degree = 1 OR dv.degree = 1 THEN 1.0
                  ELSE 0.0 END, 6) AS ccs,
       ROUND(GREATEST(pu.p, pv.p), 6) AS mscale,
       ROUND(ga.att / SQRT(su.s * sv.s), 6) AS gmean,
       ROUND(CAST(l.pos AS DOUBLE) / (mm.m - 1.0), 6) AS lin
FROM edges e
JOIN tric t ON t.src = e.src AND t.dst = e.dst
JOIN quadc q ON q.src = e.src AND q.dst = e.dst
JOIN deg du ON du.id = e.src
JOIN deg dv ON dv.id = e.dst
JOIN msn pu ON pu.id = e.src
JOIN msn pv ON pv.id = e.dst
JOIN gatt ga ON ga.src = e.src AND ga.dst = e.dst
JOIN gsum su ON su.id = e.src
JOIN gsum sv ON sv.id = e.dst
JOIN linr l ON l.src = e.src AND l.dst = e.dst
CROSS JOIN nn CROSS JOIN mm
ORDER BY e.src, e.dst"""


def q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.edgescores import (
        prefix_jaccard_score,
        simmelian_overlap_score,
    )
    from networkit_spark.operators.triangles import triangle_edge_score

    g = load_graph(spark, sf_dir)
    tri = triangle_edge_score(g)
    pj = prefix_jaccard_score(
        g, tri.withColumnRenamed("score", "att")
    ).withColumnRenamed("score", "pj")
    ov = simmelian_overlap_score(
        g, ESS_OV_RANK, triangles=tri
    ).withColumnRenamed("score", "ov")
    return (
        pj.join(ov, ["src", "dst"])
        .select("src", "dst", F.round("pj", 6).alias("pj"), "ov")
        .orderBy("src", "dst")
    )


SQL_PREFIX_JACCARD = f"""WITH {GRAPH_CTES},
tric AS MATERIALIZED (
  SELECT e.src, e.dst,
         (SELECT COUNT(*) FROM adj a1 JOIN adj a2 ON a2.dst = a1.dst
          WHERE a1.src = e.src AND a2.src = e.dst) AS t
  FROM edges e
),
half AS (
  SELECT src AS ego, dst AS alter, t AS att FROM tric
  UNION ALL
  SELECT dst AS ego, src AS alter, t AS att FROM tric
),
rk AS MATERIALIZED (
  SELECT ego, alter,
         RANK() OVER (PARTITION BY ego ORDER BY att DESC) - 1 AS rnk
  FROM half
),
ru AS (
  SELECT e.src, e.dst, r.alter, r.rnk AS r_u
  FROM edges e JOIN rk r ON r.ego = e.src
  WHERE r.alter <> e.dst
),
rv AS (
  SELECT e.src, e.dst, r.alter, r.rnk AS r_v
  FROM edges e JOIN rk r ON r.ego = e.dst
  WHERE r.alter <> e.src
),
ev AS (
  SELECT COALESCE(ru.src, rv.src) AS src,
         COALESCE(ru.dst, rv.dst) AS dst,
         (ru.r_u IS NOT NULL AND rv.r_v IS NOT NULL) AS common,
         COALESCE(LEAST(ru.r_u, rv.r_v), ru.r_u, rv.r_v) AS enter_union,
         GREATEST(ru.r_u, rv.r_v) AS enter_inter
  FROM ru FULL JOIN rv
    ON rv.src = ru.src AND rv.dst = ru.dst AND rv.alter = ru.alter
),
events AS (
  SELECT src, dst, r, SUM(du) AS du, SUM(di) AS di FROM (
    SELECT src, dst, enter_union AS r, 1 AS du, 0 AS di FROM ev
    UNION ALL
    SELECT src, dst, enter_inter AS r, 0 AS du, 1 AS di FROM ev WHERE common
  ) GROUP BY src, dst, r
),
best AS (
  SELECT src, dst, MAX(ci * 1.0 / cu) AS pj FROM (
    SELECT src, dst,
           SUM(du) OVER w AS cu, SUM(di) OVER w AS ci
    FROM events
    WINDOW w AS (PARTITION BY src, dst ORDER BY r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) GROUP BY src, dst
),
ov AS (
  SELECT e.src, e.dst, CAST(COUNT(*) AS DOUBLE) AS ov
  FROM edges e
  JOIN rk a ON a.ego = e.src AND a.rnk <= {ESS_OV_RANK} AND a.alter <> e.dst
  JOIN rk b ON b.ego = e.dst AND b.rnk <= {ESS_OV_RANK}
           AND b.alter = a.alter AND b.alter <> e.src
  GROUP BY e.src, e.dst
)
SELECT e.src, e.dst,
       ROUND(COALESCE(b.pj, 0.0), 6) AS pj,
       COALESCE(o.ov, 0.0) AS ov
FROM edges e
LEFT JOIN best b ON b.src = e.src AND b.dst = e.dst
LEFT JOIN ov o ON o.src = e.src AND o.dst = e.dst
ORDER BY e.src, e.dst"""


def q_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.edgescores import simrank_score

    g = load_graph(spark, sf_dir)
    return (
        simrank_score(g, c=SIMRANK_C, iterations=SIMRANK_ITERS)
        .select("src", "dst", F.round("score", 6).alias("score"))
        .orderBy("src", "dst")
    )


def _simrank_sql(iters: int = SIMRANK_ITERS, c: float = SIMRANK_C) -> str:
    parts = ["s0 AS (SELECT id AS u, id AS v, 1.0 AS s FROM nodes)"]
    for k in range(1, iters + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT a1.dst AS u, a2.dst AS v,
         {c} * SUM(s.s) / (d1.degree * d2.degree) AS s
  FROM s{k - 1} s
  JOIN adj a1 ON a1.src = s.u
  JOIN adj a2 ON a2.src = s.v
  JOIN deg d1 ON d1.id = a1.dst
  JOIN deg d2 ON d2.id = a2.dst
  WHERE a1.dst <> a2.dst
  GROUP BY a1.dst, a2.dst, d1.degree, d2.degree
  UNION ALL
  SELECT id AS u, id AS v, 1.0 AS s FROM nodes
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"""
SELECT e.src, e.dst, ROUND(COALESCE(s.s, 0.0), 6) AS score
FROM edges e LEFT JOIN s{iters} s ON s.u = e.src AND s.v = e.dst
ORDER BY e.src, e.dst"""
    )


SQL_SIMRANK = _simrank_sql()


# ---------------------------------------------------------------------------
# GroupClosenessGrowShrink (centrality/GroupClosenessGrowShrinkImpl.cpp)
# — rows-only entry (the per-swap nested BFS unroll is impractical in
# SQL; correctness is replica-proven in tests/test_growshrink.py).
# Refines a deliberately bad seed group on the dense contract graph.
# ---------------------------------------------------------------------------


def q_grow_shrink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.growshrink import grow_shrink

    g = load_dense_graph(spark, sf_dir)
    seed_group = [0, 1, 2]  # adjacent low-ids: a refinable seed
    group, swaps, _ = grow_shrink(
        g, seed_group, insertions=1, max_iterations=3
    )
    return spark.createDataFrame(
        [(int(u), int(swaps)) for u in sorted(group)], "id long, swaps long"
    )


# ---------------------------------------------------------------------------
# ClusteringGenerator (community/ClusteringGenerator.cpp:15-87) — the
# five synthetic partitions as one per-node row: singleton, one,
# md5-derandomized random (k=5), continuous balanced (k=7, blocks of
# n/k with the first n%k one larger), round-robin (k=7).
# ---------------------------------------------------------------------------


def q_clustering_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.clusteringgen import (
        continuous_balanced_clustering,
        noncontinuous_balanced_clustering,
        one_clustering,
        random_clustering,
        singleton_clustering,
    )

    g = load_graph(spark, sf_dir)
    s = singleton_clustering(g).withColumnRenamed("label", "singleton")
    o = one_clustering(g).withColumnRenamed("label", "onec")
    r = random_clustering(g, 5).withColumnRenamed("label", "rnd")
    cb = continuous_balanced_clustering(g, 7).withColumnRenamed(
        "label", "contbal"
    )
    nc = noncontinuous_balanced_clustering(g, 7).withColumnRenamed(
        "label", "noncont"
    )
    return (
        s.join(o, "id").join(r, "id").join(cb, "id").join(nc, "id")
        .orderBy("id")
    )


SQL_CLUSTERING_GEN = f"""
WITH {GRAPH_CTES},
rk AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS rank
  FROM nodes
),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)
SELECT rk.id,
  rk.id AS singleton,
  CAST(0 AS BIGINT) AS onec,
  CAST(({_md5_bucket_sql('id', 'rc')}) % 5 AS BIGINT) AS rnd,
  CAST(CASE WHEN (c.n % 7) > 0 AND rk.rank < (c.n % 7) * (c.n // 7 + 1)
       THEN rk.rank // (c.n // 7 + 1)
       ELSE (c.n % 7)
            + (rk.rank - (c.n % 7) * (c.n // 7 + 1)) // GREATEST(c.n // 7, 1)
       END AS BIGINT) AS contbal,
  CAST(rk.rank % 7 AS BIGINT) AS noncont
FROM rk CROSS JOIN c ORDER BY rk.id
"""


# ---------------------------------------------------------------------------
# DynamicBSuitorMatcher (matching/DynamicBSuitorMatcher.cpp:17-200) —
# the reference gtest invariant is dynamic == fresh static BSuitor on
# the final graph, so the oracle replays the STATIC unrolled
# locally-dominant rounds (the q_bmatching shape) on the post-event
# edge set while Spark answers with the incremental repair.  Weights
# are injective by construction (x * 2654435761 % 2^31 is injective for
# x = src*1009+dst < 2^20), even for base edges and odd for inserts, so
# the fixpoint is unique.  Removals: 3% md5 bucket.  Inserts: a second
# orders-derived pair family, minus existing edges.
# ---------------------------------------------------------------------------

DBM_B = 2
DBM_ROUNDS = 16


def q_dyn_bmatching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.dynmatching import dynamic_bsuitor

    g = load_graph(spark, sf_dir)
    bw = (
        (((F.col("src") * 1009 + F.col("dst")) * 2654435761) % 2147483648)
        .cast("double") * 2
    )
    base = g.edges.select("src", "dst", bw.alias("weight"))
    gb = Graph(base, g.nodes(), directed=False, weighted=True)
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit("dbm"),
                    (F.col("src") * 997 + F.col("dst")).cast("string"),
                )
            ),
            1, 6,
        ),
        16, 10,
    ).cast("long")
    removals = base.filter(bucket % 100 < 3).select(
        F.lit("de").alias("kind"), "src", "dst", F.lit(0.0).alias("weight")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    ins_pairs = (
        orders.filter(k % 5 == 0)
        .select(((k * 23 + 5) % 997).alias("u"), ((k * 71 + 29) % 997).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
        )
        .distinct()
        .join(base.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    iw = (
        (((F.col("src") * 1009 + F.col("dst")) * 2654435761) % 2147483648)
        .cast("double") * 2 + 1
    )
    inserts = ins_pairs.select(
        F.lit("ae").alias("kind"), "src", "dst", iw.alias("weight")
    )
    events = removals.unionByName(inserts)
    m, info = dynamic_bsuitor(gb, DBM_B, events, max_rounds=64)
    if not info.converged:
        raise AssertionError("dynamic_bsuitor repair did not converge")
    return m.orderBy("src", "dst")


def _dyn_bmatching_sql(b: int = DBM_B, rounds: int = DBM_ROUNDS) -> str:
    parts = [
        """bw AS (
  SELECT src, dst,
         CAST(((src * 1009 + dst) * 2654435761) % 2147483648 AS DOUBLE) * 2
           AS w
  FROM edges
)""",
        f"""rm AS (
  SELECT src, dst FROM edges
  WHERE ({_md5_bucket_sql('src * 997 + dst', 'dbm')}) % 100 < 3
)""",
        """insb AS (
  SELECT DISTINCT ((o_orderkey * 23 + 5) % 997) AS u,
                  ((o_orderkey * 71 + 29) % 997) AS v
  FROM orders WHERE o_orderkey % 5 = 0
),
insc AS (
  SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst
  FROM insb WHERE u <> v
),
ins AS (
  SELECT i.src, i.dst,
         CAST(((i.src * 1009 + i.dst) * 2654435761) % 2147483648 AS DOUBLE)
           * 2 + 1 AS w
  FROM insc i
  WHERE NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = i.src AND e.dst = i.dst)
)""",
        """fed AS MATERIALIZED (
  SELECT b.src, b.dst, b.w FROM bw b
  WHERE NOT EXISTS (SELECT 1 FROM rm r
                    WHERE r.src = b.src AND r.dst = b.dst)
  UNION ALL SELECT src, dst, w FROM ins
),
fadj AS MATERIALIZED (
  SELECT src, dst, w FROM fed
  UNION ALL SELECT dst AS src, src AS dst, w FROM fed
),
fnodes AS MATERIALIZED (
  SELECT id FROM nodes
  UNION SELECT src AS id FROM fed UNION SELECT dst FROM fed
)""",
        "dbm0 AS (SELECT src, dst, w FROM fed WHERE FALSE)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""drem{r} AS MATERIALIZED (
  SELECT n.id, {b} - COALESCE(u.c, 0) AS rem
  FROM fnodes n LEFT JOIN (
    SELECT id, COUNT(*) AS c FROM (
      SELECT src AS id FROM dbm{r - 1} UNION ALL SELECT dst FROM dbm{r - 1}
    ) GROUP BY id
  ) u ON u.id = n.id
),
dliv{r} AS MATERIALIZED (
  SELECT a.src, a.dst, a.w FROM fadj a
  JOIN drem{r} r1 ON r1.id = a.src AND r1.rem > 0
  JOIN drem{r} r2 ON r2.id = a.dst AND r2.rem > 0
  WHERE NOT EXISTS (SELECT 1 FROM dbm{r - 1} m
                    WHERE (m.src = a.src AND m.dst = a.dst)
                       OR (m.src = a.dst AND m.dst = a.src))
),
dpk{r} AS MATERIALIZED (
  SELECT src, dst, w FROM (
    SELECT l.src, l.dst, l.w,
           ROW_NUMBER() OVER (PARTITION BY l.src
                              ORDER BY l.w DESC, l.dst ASC) AS rk,
           r1.rem
    FROM dliv{r} l JOIN drem{r} r1 ON r1.id = l.src
  ) WHERE rk <= rem
),
dbm{r} AS MATERIALIZED (
  SELECT src, dst, w FROM dbm{r - 1}
  UNION ALL
  SELECT p1.src, p1.dst, p1.w
  FROM dpk{r} p1 JOIN dpk{r} p2 ON p2.src = p1.dst AND p2.dst = p1.src
  WHERE p1.src < p1.dst
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f"\nSELECT src, dst, w AS weight FROM dbm{rounds} "
        "ORDER BY src, dst"
    )


SQL_DYN_BMATCHING = _dyn_bmatching_sql()


# ---------------------------------------------------------------------------
# ParallelAgglomerativeClusterer (community/ParallelAgglomerativeClusterer
# .cpp:20-84) — unrolled levels: per level the ModularityScoring
# formula, the LocalMax matching rounds (md5 tie order — the documented
# parallel stand-in for the reference's sequential PathGrowingMatcher,
# see operators/agglomerative.py), min-endpoint contraction, and the
# cumulative fine->coarse label composition.  All level weights stay
# integer-valued (unit base weights + contraction sums), so every score
# is bit-identical across engines.  The gate runs a fixed 3-level
# budget; the Spark side raises if any level fails the reference's
# repeat rule (so the oracle's unconditional 3 contractions are exact)
# or exceeds the per-level round unroll.
# ---------------------------------------------------------------------------

AGG_LEVELS = 3
AGG_LMM_ROUNDS = 12


def q_agglomerative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.agglomerative import (
        agglomerative_clustering,
    )

    g = load_graph(spark, sf_dir)
    labels, metrics = agglomerative_clustering(
        g, max_levels=AGG_LEVELS, matcher_rounds=AGG_LMM_ROUNDS
    )
    if len(metrics) != AGG_LEVELS or not all(
        m["adopted"] for m in metrics
    ):
        raise AssertionError(
            f"agglomerative gate expects {AGG_LEVELS} adopted levels, "
            f"got {metrics}"
        )
    return labels.orderBy("id")


def _agglomerative_sql(
    levels: int = AGG_LEVELS, rounds: int = AGG_LMM_ROUNDS
) -> str:
    parts = [
        "ael1 AS MATERIALIZED (SELECT src AS u, dst AS v, 1.0 AS w FROM edges)",
        "and1 AS MATERIALIZED (SELECT id FROM nodes)",
        "alab0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for L in range(1, levels + 1):
        parts.append(
            f"""atw{L} AS (SELECT SUM(w) AS total FROM ael{L}),
awd{L} AS (
  SELECT id, SUM(w) AS wd FROM (
    SELECT u AS id, w FROM ael{L} UNION ALL SELECT v AS id, w FROM ael{L}
  ) GROUP BY id
),
asc{L} AS MATERIALIZED (
  SELECT e.u, e.v,
         e.w / t.total
           - (du.wd / (2 * t.total)) * (dv.wd / (2 * t.total)) AS s
  FROM ael{L} e CROSS JOIN atw{L} t
  JOIN awd{L} du ON du.id = e.u
  JOIN awd{L} dv ON dv.id = e.v
),
alv{L}_0 AS MATERIALIZED (
  SELECT u, v, s AS w,
         md5('lmm|' || CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR))
           AS tie
  FROM asc{L} WHERE s > 0 AND u <> v
)"""
        )
        unions = []
        for r in range(1, rounds + 1):
            p = r - 1
            parts.append(
                f"""acb{L}_{r} AS (
  SELECT u, v, w, tie FROM alv{L}_{p}
  UNION ALL SELECT v AS u, u AS v, w, tie FROM alv{L}_{p}
),
acd{L}_{r} AS (
  SELECT u, v AS pick FROM (
    SELECT u, v, ROW_NUMBER() OVER (
      PARTITION BY u ORDER BY w DESC, tie DESC, v DESC) AS rn
    FROM acb{L}_{r}
  ) t WHERE rn = 1
),
aag{L}_{r} AS (
  SELECT a.u AS u, b.u AS v
  FROM acd{L}_{r} a JOIN acd{L}_{r} b ON a.pick = b.u AND b.pick = a.u
  WHERE a.u < b.u
),
amn{L}_{r} AS (
  SELECT u AS id FROM aag{L}_{r} UNION ALL SELECT v FROM aag{L}_{r}
),
alv{L}_{r} AS MATERIALIZED (
  SELECT l.u, l.v, l.w, l.tie FROM alv{L}_{p} l
  WHERE l.u NOT IN (SELECT id FROM amn{L}_{r})
    AND l.v NOT IN (SELECT id FROM amn{L}_{r})
)"""
            )
            unions.append(f"SELECT u, v FROM aag{L}_{r}")
        parts.append(
            f"""amt{L} AS ({' UNION ALL '.join(unions)}),
apm{L} AS (
  SELECT u AS id, LEAST(u, v) AS label FROM amt{L}
  UNION ALL SELECT v AS id, LEAST(u, v) AS label FROM amt{L}
),
apart{L} AS MATERIALIZED (
  SELECT n.id, COALESCE(p.label, n.id) AS label
  FROM and{L} n LEFT JOIN apm{L} p ON p.id = n.id
),
ael{L + 1} AS MATERIALIZED (
  SELECT LEAST(pu.label, pv.label) AS u,
         GREATEST(pu.label, pv.label) AS v,
         SUM(e.w) AS w
  FROM ael{L} e
  JOIN apart{L} pu ON pu.id = e.u
  JOIN apart{L} pv ON pv.id = e.v
  GROUP BY 1, 2
),
and{L + 1} AS (SELECT DISTINCT label AS id FROM apart{L}),
alab{L} AS MATERIALIZED (
  SELECT l.id, p.label
  FROM alab{L - 1} l JOIN apart{L} p ON p.id = l.label
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n" + ",\n".join(parts)
        + f"\nSELECT id, label FROM alab{levels} ORDER BY id"
    )


SQL_AGGLOMERATIVE = _agglomerative_sql()


# ---------------------------------------------------------------------------
# SampledNodeStructuralRandMeasure + SampledGraphStructuralRandMeasure
# (community/SampledNodeStructuralRandMeasure.cpp:17-48,
# SampledGraphStructuralRandMeasure.cpp:17-50) — md5-derandomized pair /
# incident-edge samples; partitions compared are two md5 random
# clusterings (k=4 / k=6).  The oracle replays the draws rank-for-rank.
# ---------------------------------------------------------------------------

SRAND_SAMPLES = 400


def q_sampled_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.clusteringgen import random_clustering
    from networkit_spark.operators.partitions import (
        sampled_graph_structural_rand,
        sampled_node_structural_rand,
    )

    g = load_graph(spark, sf_dir)
    zeta = random_clustering(g, 4, "rc1").localCheckpoint(eager=True)
    eta = random_clustering(g, 6, "rc2").localCheckpoint(eager=True)
    nd, ns = sampled_node_structural_rand(g, zeta, eta, SRAND_SAMPLES)
    gd, gs = sampled_graph_structural_rand(g, zeta, eta, SRAND_SAMPLES)
    return spark.createDataFrame(
        [(round(nd, 6), ns, round(gd, 6), gs)],
        "node_rand double, node_samples long, graph_rand double, "
        "graph_samples long",
    )


def _sampled_rand_sql(samples: int = SRAND_SAMPLES) -> str:
    h_u = "md5('snr-u|' || CAST(i AS VARCHAR))"
    h_v = "md5('snr-v|' || CAST(i AS VARCHAR))"
    h_gu = "md5('sgr-u|' || CAST(i AS VARCHAR))"
    h_gv = "md5('sgr-v|' || CAST(g.i AS VARCHAR) || '|' || CAST(a.dst AS VARCHAR))"
    return f"""
WITH {GRAPH_CTES},
rk AS MATERIALIZED (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS rank
  FROM nodes
),
ncnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
zp AS MATERIALIZED (
  SELECT id, CAST(({_md5_bucket_sql('id', 'rc1')}) % 4 AS BIGINT) AS lbl
  FROM nodes
),
yp AS MATERIALIZED (
  SELECT id, CAST(({_md5_bucket_sql('id', 'rc2')}) % 6 AS BIGINT) AS lbl
  FROM nodes
),
si AS (SELECT CAST(i AS BIGINT) AS i FROM range({samples}) t(i)),
nd_draws AS (
  SELECT i,
         ({_md5_long13_sql(h_u)}) % n AS ru,
         ({_md5_long13_sql(h_v)}) % n AS rv
  FROM si CROSS JOIN ncnt
),
ndp AS (
  SELECT d.i, a.id AS u, b.id AS v
  FROM nd_draws d
  JOIN rk a ON a.rank = d.ru
  JOIN rk b ON b.rank = d.rv
  WHERE d.ru <> d.rv
),
ndagg AS (
  SELECT COUNT(*) AS s,
         SUM(CASE WHEN (zu.lbl = zv.lbl AND eu.lbl = ev.lbl)
                    OR (zu.lbl <> zv.lbl AND eu.lbl <> ev.lbl)
             THEN 1 ELSE 0 END) AS agree
  FROM ndp p
  JOIN zp zu ON zu.id = p.u JOIN zp zv ON zv.id = p.v
  JOIN yp eu ON eu.id = p.u JOIN yp ev ON ev.id = p.v
),
gu AS (
  SELECT d.i, a.id AS u
  FROM (
    SELECT i, ({_md5_long13_sql(h_gu)}) % n AS ru
    FROM si CROSS JOIN ncnt
  ) d JOIN rk a ON a.rank = d.ru
),
gpick AS (
  SELECT i, u, v FROM (
    SELECT g.i, g.u, a.dst AS v,
           ROW_NUMBER() OVER (
             PARTITION BY g.i, g.u
             ORDER BY ({_md5_long13_sql(h_gv)}) ASC, a.dst ASC) AS rn
    FROM gu g JOIN adj a ON a.src = g.u
  ) WHERE rn = 1
),
gagg AS (
  SELECT COUNT(*) AS s,
         SUM(CASE WHEN (zu.lbl = zv.lbl AND eu.lbl = ev.lbl)
                    OR (zu.lbl <> zv.lbl AND eu.lbl <> ev.lbl)
             THEN 1 ELSE 0 END) AS agree
  FROM gpick p
  JOIN zp zu ON zu.id = p.u JOIN zp zv ON zv.id = p.v
  JOIN yp eu ON eu.id = p.u JOIN yp ev ON ev.id = p.v
)
SELECT ROUND(1.0 - CAST(n.agree AS DOUBLE) / n.s, 6) AS node_rand,
       CAST(n.s AS BIGINT) AS node_samples,
       ROUND(1.0 - CAST(g.agree AS DOUBLE) / g.s, 6) AS graph_rand,
       CAST(g.s AS BIGINT) AS graph_samples
FROM ndagg n CROSS JOIN gagg g
"""


SQL_SAMPLED_RAND = _sampled_rand_sql()


# ---------------------------------------------------------------------------
# OverlappingNMIDistance (community/OverlappingNMIDistance.cpp:13-268,
# McDaid et al. 2011) — two md5-derandomized overlapping covers over
# the contract nodes; one row with the dissimilarity under all five
# normalizations.  The oracle replicates the indicator-entropy math
# term for term (H* correction, H(X_i|Y) init, MAX/MIN/means/joint).
# ---------------------------------------------------------------------------


def _onmi_covers(spark: SparkSession, sf_dir: str):
    from networkit_spark.contract import load_graph

    g = load_graph(spark, sf_dir)
    nodes = g.nodes()
    bx = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("onx"), F.col("id").cast("string"))),
            1, 6,
        ), 16, 10,
    ).cast("long")
    by = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("ony"), F.col("id").cast("string"))),
            1, 6,
        ), 16, 10,
    ).cast("long")
    covx = (
        nodes.select("id", (F.col("id") % 5).alias("subset"))
        .unionByName(
            nodes.filter(bx % 100 < 40).select(
                "id", ((F.col("id") * 7 + 2) % 5).alias("subset")
            )
        )
        .distinct()
    )
    # Y = X's base blocks with a 20% md5-shifted membership plus 15%
    # extra memberships — correlated but not identical, so the NMI
    # lands strictly inside (0, 1) and the gate discriminates
    base_y = F.when(
        by % 100 < 20, (F.col("id") % 5 + 1) % 5
    ).otherwise(F.col("id") % 5)
    covy = (
        nodes.select("id", base_y.alias("subset"))
        .unionByName(
            nodes.filter(by % 100 >= 85).select(
                "id", ((F.col("id") * 5 + 3) % 5).alias("subset")
            )
        )
        .distinct()
    )
    return g, covx, covy


def q_overlap_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.overlapnmi import (
        NORMALIZATIONS,
        overlapping_nmi_distance,
    )

    g, covx, covy = _onmi_covers(spark, sf_dir)
    covx = covx.localCheckpoint(eager=True)
    covy = covy.localCheckpoint(eager=True)
    vals = [
        round(overlapping_nmi_distance(g, covx, covy, norm), 6)
        for norm in NORMALIZATIONS
    ]
    return spark.createDataFrame(
        [tuple(vals)],
        "d_min double, d_geometric double, d_arithmetic double, "
        "d_max double, d_joint double",
    )


def _overlap_nmi_sql() -> str:
    def H(e: str) -> str:
        return (
            f"(CASE WHEN ({e}) > 0 THEN -({e}) * LOG2(({e}) / n) "
            "ELSE 0.0 END)"
        )

    ent_xi = f"({H('xi')} + {H('n - xi')})"
    ent_yj = f"({H('yj')} + {H('n - yj')})"
    habcd = (
        f"({H('n + r - xi - yj')} + {H('yj - r')} + {H('xi - r')} + {H('r')})"
    )
    cond_ok = f"({H('n + r - xi - yj')} + {H('r')}) >= ({H('yj - r')} + {H('xi - r')})"
    star_xy = f"(CASE WHEN {cond_ok} THEN {habcd} - {ent_yj} ELSE {ent_xi} END)"
    star_yx = f"(CASE WHEN {cond_ok} THEN {habcd} - {ent_xi} ELSE {ent_yj} END)"
    return f"""
WITH {GRAPH_CTES},
covx AS MATERIALIZED (
  SELECT id, id % 5 AS s FROM nodes
  UNION
  SELECT id, (id * 7 + 2) % 5 AS s FROM nodes
  WHERE ({_md5_bucket_sql('id', 'onx')}) % 100 < 40
),
covy AS MATERIALIZED (
  SELECT id,
         CASE WHEN ({_md5_bucket_sql('id', 'ony')}) % 100 < 20
              THEN (id % 5 + 1) % 5 ELSE id % 5 END AS s
  FROM nodes
  UNION
  SELECT id, (id * 5 + 3) % 5 AS s FROM nodes
  WHERE ({_md5_bucket_sql('id', 'ony')}) % 100 >= 85
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
sx AS (SELECT s AS i, CAST(COUNT(*) AS DOUBLE) AS xi FROM covx GROUP BY s),
sy AS (SELECT s AS j, CAST(COUNT(*) AS DOUBLE) AS yj FROM covy GROUP BY s),
itr AS (
  SELECT x.s AS i, y.s AS j, CAST(COUNT(*) AS DOUBLE) AS r
  FROM covx x JOIN covy y ON y.id = x.id GROUP BY x.s, y.s
),
pairs AS (
  SELECT i, j, {star_xy} AS sxy, {star_yx} AS syx
  FROM itr JOIN sx USING (i) JOIN sy USING (j) CROSS JOIN nn
),
ex AS (
  SELECT SUM({ent_xi}) AS hx,
         SUM(LEAST({ent_xi}, COALESCE(m.m, CAST('inf' AS DOUBLE)))) AS condx
  FROM sx LEFT JOIN (SELECT i, MIN(sxy) AS m FROM pairs GROUP BY i) m
    USING (i) CROSS JOIN nn
),
ey AS (
  SELECT SUM({ent_yj}) AS hy,
         SUM(LEAST({ent_yj}, COALESCE(m.m, CAST('inf' AS DOUBLE)))) AS condy
  FROM sy LEFT JOIN (SELECT j, MIN(syx) AS m FROM pairs GROUP BY j) m
    USING (j) CROSS JOIN nn
),
s AS (
  SELECT hx, hy, 0.5 * (hx - condx + hy - condy) AS mi
  FROM ex CROSS JOIN ey
)
SELECT
  ROUND(1.0 - LEAST(GREATEST(mi / LEAST(hx, hy), 0.0), 1.0), 6) AS d_min,
  ROUND(1.0 - LEAST(GREATEST(mi / SQRT(hx * hy), 0.0), 1.0), 6)
    AS d_geometric,
  ROUND(1.0 - LEAST(GREATEST(2.0 * mi / (hx + hy), 0.0), 1.0), 6)
    AS d_arithmetic,
  ROUND(1.0 - LEAST(GREATEST(mi / GREATEST(hx, hy), 0.0), 1.0), 6) AS d_max,
  ROUND(1.0 - LEAST(GREATEST(mi / (hx + hy - mi), 0.0), 1.0), 6) AS d_joint
FROM s
"""


SQL_OVERLAP_NMI = _overlap_nmi_sql()


# ---------------------------------------------------------------------------
# HyperbolicGenerator T=0 (generators/HyperbolicGenerator.cpp:37-56,
# HyperbolicSpace.cpp:61-92) — md5-derandomized Krioukov disk points,
# band/sector-bucketed candidate join, exact threshold filter.  The
# oracle rebuilds the same points and brute-forces all pairs (fixture
# scale); both sides spell cosh/sinh/acosh via exp/ln/sqrt and apply a
# 1e-9 dead-band on the threshold so a 1-ulp JVM-vs-libm trig
# difference cannot flip a boundary pair (gate-only margin; the
# generator default is the exact rule).
# ---------------------------------------------------------------------------

HYP_N = 1000
HYP_AVG = 8.0
HYP_PLEXP = 3.0
HYP_SEED = 42
HYP_MARGIN = 1e-9


def q_hyperbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import hyperbolic_graph

    edges, _pts, _R = hyperbolic_graph(
        spark,
        HYP_N,
        avg_degree=HYP_AVG,
        plexp=HYP_PLEXP,
        seed=HYP_SEED,
        threshold_margin=HYP_MARGIN,
    )
    return edges.orderBy("src", "dst")


def _hyperbolic_sql() -> str:
    import math

    from networkit_spark.sources.generators import (
        hyperbolic_target_radius,
    )

    alpha = 0.5 * (HYP_PLEXP - 1)
    R = hyperbolic_target_radius(
        float(HYP_N), HYP_N * HYP_AVG / 2.0, alpha
    )
    cha_r = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2.0
    cosh_r = (math.exp(R) + math.exp(-R)) / 2.0
    frac_a = _md5_long13_sql(
        f"md5('hga|{HYP_SEED}|' || CAST(i AS VARCHAR))"
    )
    frac_r = _md5_long13_sql(
        f"md5('hgr|{HYP_SEED}|' || CAST(i AS VARCHAR))"
    )
    den = float(16 ** 13)
    return f"""
WITH pts AS MATERIALIZED (
  SELECT i AS id,
         2 * PI() * (({frac_a}) / {den!r}) AS theta,
         LN(u + SQRT(u * u - 1.0)) / {alpha!r} AS r
  FROM (
    SELECT i, 1.0 + ({cha_r!r} - 1.0) * (({frac_r}) / {den!r}) AS u
    FROM range({HYP_N}) t(i)
  )
),
trig AS MATERIALIZED (
  SELECT id, COS(theta) AS c, SIN(theta) AS s,
         (EXP(r) + EXP(-r)) / 2 AS ch,
         (EXP(r) - EXP(-r)) / 2 AS sh
  FROM pts
)
SELECT a.id AS src, b.id AS dst
FROM trig a JOIN trig b ON a.id < b.id
WHERE (a.ch * b.ch - a.sh * b.sh * (a.c * b.c + a.s * b.s)) <= {cosh_r!r}
  AND ABS((a.ch * b.ch - a.sh * b.sh * (a.c * b.c + a.s * b.s))
          - {cosh_r!r}) >= {HYP_MARGIN!r}
ORDER BY src, dst
"""


SQL_HYPERBOLIC = _hyperbolic_sql()


# ---------------------------------------------------------------------------
# MocnikGenerator (generators/MocnikGenerator.cpp) — spatial network:
# uniform points in the ball, directed edge i->j iff
# dist <= k * distMin(i).  Engine: grid-bucketed expanding-ring NN +
# range joins (the reference's cell machinery, relational).  Oracle:
# brute-force all-pairs on the same md5-replayed points (fixture-scale
# exact; the bucketed plan is the scale path).  Same 1e-9 threshold
# dead-band as the hyperbolic gate.
# ---------------------------------------------------------------------------

MCK_N = 400
MCK_K = 2.5
MCK_DIM = 2
MCK_SEED = 42
MCK_MARGIN = 1e-9
MCK_CAND = 4 * MCK_N + 64


def q_mocnik(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import mocnik_graph

    edges, _pts, _dm = mocnik_graph(
        spark,
        MCK_N,
        k=MCK_K,
        dim=MCK_DIM,
        seed=MCK_SEED,
        threshold_margin=MCK_MARGIN,
    )
    return edges.orderBy("src", "dst")


def _mocnik_sql() -> str:
    den = float(16 ** 13)
    parts = []
    for j in range(MCK_DIM):
        h = _md5_long13_sql(
            f"md5('mck|{MCK_SEED}|{j}|' || CAST(i AS VARCHAR))"
        )
        parts.append(f"({h}) / {den!r} AS x{j}")
    fracs = ",\n         ".join(parts)
    r2 = " + ".join(
        f"(x{j} - 0.5) * (x{j} - 0.5)" for j in range(MCK_DIM)
    )
    d2 = " + ".join(
        f"(a.x{j} - b.x{j}) * (a.x{j} - b.x{j})" for j in range(MCK_DIM)
    )
    return f"""
WITH cand AS MATERIALIZED (
  SELECT i,
         {fracs}
  FROM range({MCK_CAND}) t(i)
),
acc AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (ORDER BY i) - 1 AS id
  FROM cand WHERE {r2} <= 0.25
),
pts AS MATERIALIZED (
  SELECT id, {", ".join(f"x{j}" for j in range(MCK_DIM))}
  FROM acc WHERE id < {MCK_N}
),
dm AS MATERIALIZED (
  SELECT a.id, MIN(SQRT({d2})) AS dm
  FROM pts a JOIN pts b ON b.id <> a.id
  GROUP BY a.id
)
SELECT a.id AS src, b.id AS dst
FROM pts a JOIN dm ON dm.id = a.id JOIN pts b ON b.id <> a.id
WHERE SQRT({d2}) <= {MCK_K!r} * dm.dm
  AND ABS(SQRT({d2}) - {MCK_K!r} * dm.dm) >= {MCK_MARGIN!r}
ORDER BY src, dst
"""


SQL_MOCNIK = _mocnik_sql()


# ---------------------------------------------------------------------------
# PivotMDS (viz/PivotMDS.cpp:20-129) — md5-derandomized pivots +
# power-method init, fixed-iteration unroll (the repo's convergence-
# loop determinism rule), double-centered RAW distances exactly as the
# reference code does.  Oracle: recursive-CTE multi-source BFS, SQL
# centering/CᵀC, and a fully unrolled normalize-multiply chain with
# driver-identical md5 init literals; outputs rounded to 5 decimals
# (double-sum association wobble ~1e-10 on O(1e2) coordinates).
# ---------------------------------------------------------------------------

PMDS_K = 8
PMDS_ITERS = 60
PMDS_HOPS = 32


def q_pivot_mds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pivotmds import pivot_mds

    g = load_graph(spark, sf_dir)
    out, _ = pivot_mds(
        g, dim=2, num_pivots=PMDS_K, power_iters=PMDS_ITERS
    )
    return out.select(
        "id", F.round("x0", 5).alias("x0"), F.round("x1", 5).alias("x1")
    ).orderBy("id")


def _pivot_mds_sql(k: int = PMDS_K, iters: int = PMDS_ITERS) -> str:
    from networkit_spark.operators.pivotmds import _frac

    parts = [
        f"""piv AS MATERIALIZED (
  SELECT j, id FROM (
    SELECT id, ROW_NUMBER() OVER (
      ORDER BY md5('pmds-p|' || CAST(id AS VARCHAR)), id) - 1 AS j
    FROM nodes
  ) WHERE j < {k}
),
bfs(j, id, d) AS (
  SELECT j, id, CAST(0 AS BIGINT) AS d FROM piv
  UNION
  SELECT b.j, a.dst, b.d + 1 FROM bfs b JOIN adj a ON a.src = b.id
  WHERE b.d < {PMDS_HOPS}
),
dist AS MATERIALIZED (SELECT j, id, MIN(d) AS d FROM bfs GROUP BY j, id),
ncnt AS (SELECT CAST(COUNT(DISTINCT id) AS DOUBLE) AS n FROM dist),
rm AS MATERIALIZED (
  SELECT id, SUM(d) / CAST({k} AS DOUBLE) AS rm FROM dist GROUP BY id
),
cm AS MATERIALIZED (
  SELECT j, SUM(d) / (SELECT n FROM ncnt) AS cm FROM dist GROUP BY j
),
gm AS (
  SELECT (SELECT SUM(rm / (2.0 * (SELECT n FROM ncnt))) FROM rm)
       + (SELECT SUM(cm / (2.0 * {k})) FROM cm) AS g
),
cmat AS MATERIALIZED (
  SELECT dist.id, dist.j,
         CAST(d AS DOUBLE) - rm.rm - cm.cm + (SELECT g FROM gm) AS val
  FROM dist JOIN rm ON rm.id = dist.id JOIN cm ON cm.j = dist.j
),
cc0 AS MATERIALIZED (
  SELECT a.j AS i, b.j AS jj, SUM(a.val * b.val) AS v
  FROM cmat a JOIN cmat b ON b.id = a.id GROUP BY 1, 2
)"""
    ]
    for d in range(2):
        init = ", ".join(
            f"({i}, {2.0 * _frac('pmds-w', d, i) - 1.0!r})" for i in range(k)
        )
        cc = f"cc{d}"
        parts.append(
            f"p{d}_0(i, val) AS MATERIALIZED (SELECT * FROM (VALUES {init}) t(i, val))"
        )
        for t in range(1, iters + 1):
            parts.append(
                f"""q{d}_{t} AS MATERIALIZED (
  SELECT m.i, SUM(m.v * p.val) AS val
  FROM {cc} m JOIN p{d}_{t - 1} p ON p.i = m.jj GROUP BY m.i
),
p{d}_{t} AS MATERIALIZED (
  SELECT i, val / (SELECT SQRT(SUM(val * val)) FROM q{d}_{t}) AS val
  FROM q{d}_{t}
)"""
            )
        parts.append(
            f"""mv{d} AS MATERIALIZED (
  SELECT m.i, SUM(m.v * p.val) AS val
  FROM {cc} m JOIN p{d}_{iters} p ON p.i = m.jj GROUP BY m.i
),
lam{d} AS MATERIALIZED (
  SELECT (SELECT SUM(mv{d}.val * p.val)
          FROM mv{d} JOIN p{d}_{iters} p ON p.i = mv{d}.i)
       / (SELECT SUM(val * val) FROM p{d}_{iters}) AS l
),
x{d} AS MATERIALIZED (
  SELECT c.id, SUM(c.val * p.val) AS x
  FROM cmat c JOIN p{d}_{iters} p ON p.i = c.j GROUP BY c.id
)"""
        )
        if d == 0:
            parts.append(
                f"""cc1 AS MATERIALIZED (
  SELECT m.i, m.jj,
         m.v - (SELECT l FROM lam0)
               / (SELECT SUM(val * val) FROM p0_{iters})
               * a.val * b.val AS v
  FROM cc0 m
  JOIN p0_{iters} a ON a.i = m.i
  JOIN p0_{iters} b ON b.i = m.jj
)"""
            )
    return (
        f"WITH RECURSIVE {GRAPH_CTES},\n" + ",\n".join(parts)
        + """
SELECT x0.id, ROUND(x0.x, 5) AS x0, ROUND(x1.x, 5) AS x1
FROM x0 JOIN x1 ON x1.id = x0.id ORDER BY x0.id"""
    )


SQL_PIVOT_MDS = _pivot_mds_sql()


# ---------------------------------------------------------------------------
# PrunedLandmarkLabeling (distance/PrunedLandmarkLabeling.cpp:12-131) —
# canonical 2-hop hub labeling of the (degree desc, id asc) rank order,
# computed level-synchronously (PSL); the oracle unrolls the identical
# per-level candidate + rank-filter + 2-hop-refutation recurrence, and the
# brute-force canonical characterization (min-rank vertex on the union of
# all shortest paths) is asserted equal in tests/test_pll.py.
# ---------------------------------------------------------------------------

PLL_LEVELS = 9  # contract-graph diameter is 8 (sf0.001) / 6 (sf0.01)


def q_pll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pll import pruned_landmark_labeling

    g = load_graph(spark, sf_dir)
    res = pruned_landmark_labeling(g)
    return res.labels.select("hub", "id", "dist").orderBy("hub", "id")


def _pll_sql(levels: int = PLL_LEVELS) -> str:
    parts = [
        "rnk AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER"
        " (ORDER BY degree DESC, id ASC) AS r FROM deg)",
        "lab0 AS MATERIALIZED (SELECT id AS hub, id,"
        " CAST(0 AS BIGINT) AS dist FROM nodes)",
        "f0 AS (SELECT hub, id, dist FROM lab0)",
    ]
    for d in range(1, levels + 1):
        parts.append(
            f"""c{d} AS MATERIALIZED (
  SELECT DISTINCT f.hub, a.dst AS id FROM f{d - 1} f JOIN adj a ON a.src = f.id)"""
        )
        parts.append(
            f"""f{d} AS MATERIALIZED (
  SELECT c.hub, c.id, CAST({d} AS BIGINT) AS dist
  FROM c{d} c JOIN rnk rh ON rh.id = c.hub JOIN rnk ru ON ru.id = c.id
  WHERE rh.r < ru.r AND NOT EXISTS (
    SELECT 1 FROM lab{d - 1} p JOIN lab{d - 1} q ON p.hub = q.hub
    WHERE p.id = c.hub AND q.id = c.id AND p.dist + q.dist <= {d}))"""
        )
        parts.append(
            f"lab{d} AS MATERIALIZED"
            f" (SELECT * FROM lab{d - 1} UNION ALL SELECT * FROM f{d})"
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT hub, id, dist FROM lab{levels} ORDER BY hub, id"
    )


SQL_PLL = _pll_sql()


# ---------------------------------------------------------------------------
# DynPrunedLandmarkLabeling (distance/DynPrunedLandmarkLabeling.cpp:11-160)
# — remove a deterministic ~7-edge subset, label the reduced graph, replay
# the removed edges as EDGE_ADDITION events through the dynamic repair, and
# answer 36 sampled s-t queries.  The oracle is INDEPENDENT semantics: BFS
# distances on the final (full) graph — exactly the reference gtest's
# update-vs-recompute invariant.
# ---------------------------------------------------------------------------

DYN_PLL_MOD = 499
DYN_PLL_RES = 5
DYN_PLL_K = 6


def q_dyn_pll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pll import (
        dyn_pll_add_edges,
        pll_query,
        pruned_landmark_labeling,
    )

    g = load_graph(spark, sf_dir)
    removed = (F.col("src") * 7 + F.col("dst") * 13) % DYN_PLL_MOD == DYN_PLL_RES
    # bounded collect: the deterministic event list (7 edges at sf0.01)
    events = [
        (int(r["src"]), int(r["dst"]))
        for r in g.edges.filter(removed).orderBy("src", "dst").collect()
    ]
    g0 = Graph(
        g.edges.filter(~removed), vertices=g.nodes(),
        directed=False, weighted=False,
    )
    res0 = pruned_landmark_labeling(g0)
    res = dyn_pll_add_edges(g, res0, events)
    nodes = [int(r["id"]) for r in g.nodes().orderBy("id").collect()]
    pairs = spark.createDataFrame(
        [(s, t) for s in nodes[:DYN_PLL_K] for t in nodes[-DYN_PLL_K:]],
        "s long, t long",
    )
    return pll_query(res, pairs).orderBy("s", "t")


SQL_DYN_PLL = (
    f"WITH {GRAPH_CTES},\n"
    + f"""srcs AS (SELECT id FROM nodes ORDER BY id LIMIT {DYN_PLL_K}),
tgts AS (SELECT id FROM nodes ORDER BY id DESC LIMIT {DYN_PLL_K}),\n"""
    + _bfs_unroll(
        "adj",
        "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM srcs",
        DIAM_HOPS,
    )
    + f"""
SELECT t.s, t.v AS t, t.dist FROM t{DIAM_HOPS} t
WHERE t.v IN (SELECT id FROM tgts)
ORDER BY t.s, t.v"""
)


# ---------------------------------------------------------------------------
# Link-prediction completion (linkprediction/AdjustedRandIndex.cpp:14-42,
# NeighborhoodDistanceIndex.hpp:17-23, NeighborsMeasureIndex.hpp:18-31,
# SameCommunityIndex.cpp:28-31) — the distance-2 candidate pairs scored
# with the round-5 indices; SameCommunity uses the deterministic id%4
# partition (the PLM default is gated separately via graph_plm).
# ---------------------------------------------------------------------------

def q_linkpred_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import missing_links
    from networkit_spark.operators.linkpredmore import (
        adjusted_rand_index,
        neighborhood_distance_index,
        neighbors_measure_index,
        same_community_index,
    )

    g = load_graph(spark, sf_dir)
    pairs = missing_links(g, 2).localCheckpoint(eager=True)
    part = g.nodes().select("id", (F.col("id") % 4).alias("label"))
    ari = adjusted_rand_index(g, pairs).withColumnRenamed("score", "ari")
    nd = neighborhood_distance_index(g, pairs).withColumnRenamed(
        "score", "nbhd_distance"
    )
    nm = neighbors_measure_index(g, pairs).withColumnRenamed(
        "score", "nbrs_measure"
    )
    sc = same_community_index(g, pairs, part).withColumnRenamed(
        "score", "same_comm"
    )
    return (
        pairs.join(ari, ["u", "v"])
        .join(nd, ["u", "v"])
        .join(nm, ["u", "v"])
        .join(sc, ["u", "v"])
        .select(
            "u",
            "v",
            F.round("ari", 6).alias("ari"),
            F.round("nbhd_distance", 6).alias("nbhd_distance"),
            F.col("nbrs_measure").cast("long").alias("nbrs_measure"),
            F.col("same_comm").cast("long").alias("same_comm"),
        )
        .orderBy("u", "v")
    )


SQL_LINKPRED_MORE = f"""
WITH {GRAPH_CTES},
wedge AS (
  SELECT a1.dst AS u, a2.dst AS v, a1.src AS w
  FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
cand AS (
  SELECT u, v, COUNT(*) AS cn FROM wedge wx
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wx.u AND e.dst = wx.v)
  GROUP BY u, v
),
btw AS (
  SELECT c.u, c.v, COUNT(*) AS b
  FROM cand c
  JOIN adj au ON au.src = c.u
  JOIN adj av ON av.src = c.v
  JOIN edges e ON e.src = LEAST(au.dst, av.dst)
             AND e.dst = GREATEST(au.dst, av.dst)
  GROUP BY c.u, c.v
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
sc AS (
  SELECT c.u, c.v,
         CAST(c.cn AS DOUBLE) AS a,
         CAST(du.degree + dv.degree - c.cn AS DOUBLE) AS b2,
         CAST((SELECT n FROM nn) - (du.degree + dv.degree - c.cn)
              AS DOUBLE) AS d2,
         CAST(du.degree AS DOUBLE) AS du, CAST(dv.degree AS DOUBLE) AS dv,
         COALESCE(bt.b, 0) AS btwn
  FROM cand c
  JOIN deg du ON du.id = c.u
  JOIN deg dv ON dv.id = c.v
  LEFT JOIN btw bt ON bt.u = c.u AND bt.v = c.v
)
SELECT u, v,
       ROUND(CASE WHEN (a*b2 + a*b2 + 2*a*d2 + b2*b2 + b2*d2 + b2*b2 + b2*d2)
                       <> 0
                  THEN 2 * (a*d2 - b2*b2)
                       / (a*b2 + a*b2 + 2*a*d2 + b2*b2 + b2*d2 + b2*b2 + b2*d2)
                  ELSE 0.0 END, 6) AS ari,
       ROUND(a / SQRT(du * dv), 6) AS nbhd_distance,
       CAST(a + btwn AS BIGINT) AS nbrs_measure,
       CASE WHEN u % 4 = v % 4 THEN 1 ELSE 0 END AS same_comm
FROM sc
ORDER BY u, v
"""


# ---------------------------------------------------------------------------
# KatzIndex (linkprediction/KatzIndex.cpp:36-60) — walk-hit accumulation
# from the lower-degree endpoint over the distance-2 candidate pairs;
# damping 0.5 makes every addend an exact dyadic rational, so the
# 4-level unrolled oracle is hash-exact.
# ---------------------------------------------------------------------------

KATZ_LEVELS = 4
KATZ_DAMPING = 0.5


def q_linkpred_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import missing_links
    from networkit_spark.operators.linkpredmore import katz_index

    g = load_graph(spark, sf_dir)
    pairs = missing_links(g, 2)
    return (
        katz_index(
            g, pairs, max_path_length=KATZ_LEVELS, damping=KATZ_DAMPING
        )
        .select("u", "v", F.round("score", 6).alias("score"))
        .orderBy("u", "v")
    )


def _linkpred_katz_sql(
    levels: int = KATZ_LEVELS, damping: float = KATZ_DAMPING
) -> str:
    parts = [
        """tg AS MATERIALIZED (
  SELECT c.u, c.v,
         CASE WHEN du.degree > dv.degree THEN c.v ELSE c.u END AS s,
         CASE WHEN du.degree > dv.degree THEN c.u ELSE c.v END AS e
  FROM cand c JOIN deg du ON du.id = c.u JOIN deg dv ON dv.id = c.v)""",
        "f0 AS (SELECT DISTINCT s, s AS node FROM tg)",
    ]
    unions = []
    for lv in range(1, levels + 1):
        parts.append(
            f"""h{lv} AS MATERIALIZED (
  SELECT f.s, a.dst AS node, COUNT(*) AS h
  FROM f{lv - 1} f JOIN adj a ON a.src = f.node GROUP BY f.s, a.dst)"""
        )
        parts.append(f"f{lv} AS (SELECT s, node FROM h{lv})")
        unions.append(
            f"SELECT s, node, CAST({damping**lv!r} AS DOUBLE) * h AS c"
            f" FROM h{lv}"
        )
    contrib = " UNION ALL ".join(unions)
    return f"""
WITH {GRAPH_CTES},
wedge AS (
  SELECT a1.dst AS u, a2.dst AS v
  FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
cand AS (
  SELECT DISTINCT u, v FROM wedge wx
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wx.u AND e.dst = wx.v)
),
{','.join(parts)},
contrib AS ({contrib}),
score AS (SELECT s, node, SUM(c) AS score FROM contrib GROUP BY s, node)
SELECT tg.u, tg.v, ROUND(COALESCE(sc.score, 0.0), 6) AS score
FROM tg LEFT JOIN score sc ON sc.s = tg.s AND sc.node = tg.e
ORDER BY tg.u, tg.v"""


SQL_LINKPRED_KATZ = _linkpred_katz_sql()


# ---------------------------------------------------------------------------
# AlgebraicDistanceIndex (linkprediction/AlgebraicDistanceIndex.cpp:24-74)
# — RAW (un-normalized, unlike distance/AlgebraicDistance) md5 loads,
# 5 unrolled Jacobi iterations, 2-norm over the distance-2 candidates.
# ---------------------------------------------------------------------------

LPAD_SYSTEMS = 3
LPAD_ITERS = 5
LPAD_SEED = 11


def q_linkpred_algdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import missing_links
    from networkit_spark.operators.linkpredmore import algebraic_distance_index

    g = load_graph(spark, sf_dir)
    pairs = missing_links(g, 2)
    return (
        algebraic_distance_index(
            g, pairs, num_systems=LPAD_SYSTEMS, num_iters=LPAD_ITERS,
            omega=0.5, norm=2, seed=LPAD_SEED,
        )
        .select("u", "v", F.round("score", 6).alias("score"))
        .orderBy("u", "v")
    )


def _linkpred_algdist_sql(
    k: int = LPAD_SYSTEMS, iters: int = LPAD_ITERS, seed: int = LPAD_SEED
) -> str:
    cols = [f"l{i}" for i in range(k)]
    init = ", ".join(
        f"CAST({_md5_long13_sql(f_h)} AS DOUBLE) / 4503599627370496.0"
        f" AS {c}"
        for i, c in enumerate(cols)
        for f_h in [f"md5('ad|{seed}|{i}|' || CAST(id AS VARCHAR))"]
    )
    parts = [f"x0 AS MATERIALIZED (SELECT id, {init} FROM nodes)"]
    for t in range(1, iters + 1):
        p = t - 1
        sums = ", ".join(f"SUM(x.{c}) AS s_{c}" for c in cols)
        blend = ", ".join(
            f"CASE WHEN n.wd IS NOT NULL THEN 0.5 * p.{c}"
            f" + 0.5 * (n.s_{c} / n.wd) ELSE p.{c} END AS {c}"
            for c in cols
        )
        parts.append(
            f"""n{t} AS (
  SELECT a.src AS id, CAST(COUNT(*) AS DOUBLE) AS wd, {sums}
  FROM adj a JOIN x{p} x ON x.id = a.dst GROUP BY a.src
),
x{t} AS MATERIALIZED (
  SELECT p.id, {blend}
  FROM x{p} p LEFT JOIN n{t} n ON n.id = p.id
)"""
        )
    sq = " + ".join(
        f"POWER(ABS(xu.{c} - xv.{c}), 2.0)" for c in cols
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + """wedge AS (
  SELECT a1.dst AS u, a2.dst AS v
  FROM adj a1 JOIN adj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
cand AS (
  SELECT DISTINCT u, v FROM wedge wx
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = wx.u AND e.dst = wx.v)
),
"""
        + ",\n".join(parts)
        + f"""
SELECT c.u, c.v, ROUND(POWER({sq}, 0.5), 6) AS score
FROM cand c JOIN x{iters} xu ON xu.id = c.u JOIN x{iters} xv ON xv.id = c.v
ORDER BY c.u, c.v"""
    )


SQL_LINKPRED_ALGDIST = _linkpred_algdist_sql()


# ---------------------------------------------------------------------------
# RandomLinkSampler + ROCMetric + PrecisionRecallMetric
# (linkprediction/RandomLinkSampler.cpp:15-35, EvaluationMetric.cpp:26-178,
# ROCMetric.cpp:12-31, PrecisionRecallMetric.cpp:12-38) — md5-rank 70%
# training split, common-neighbor predictions on its distance-2 missing
# links, evaluated against the FULL graph: curve points (equal-x dedup
# keeps the last y) + trapezoid AUC for both metrics.
# ---------------------------------------------------------------------------

LPE_SEED = 3
LPE_TRAIN = 0.7
LPE_NT = 9


def q_linkpred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import (
        link_prediction,
        missing_links,
    )
    from networkit_spark.operators.linkpredmore import (
        evaluation_curve,
        random_link_sampler_by_percentage,
    )

    g = load_graph(spark, sf_dir)
    tr = random_link_sampler_by_percentage(g, LPE_TRAIN, seed=LPE_SEED)
    preds = link_prediction(
        tr, pairs=missing_links(tr, 2), indices=("common_neighbors",)
    ).select("u", "v", F.col("common_neighbors").alias("score"))
    rows = []
    for metric in ("roc", "pr"):
        pts, auc = evaluation_curve(
            preds, g, metric=metric, num_thresholds=LPE_NT
        )
        rows += [
            (metric, i, round(x, 6), round(y, 6), round(auc, 6))
            for i, (x, y) in enumerate(pts)
        ]
    return spark.createDataFrame(
        rows, "metric string, i long, x double, y double, auc double"
    ).orderBy("metric", "i")


SQL_LINKPRED_EVAL = f"""
WITH {GRAPH_CTES},
ek AS (
  SELECT src, dst,
         {_md5_long13_sql("md5('rls|" + str(LPE_SEED) + "|' || CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR))")} AS k
  FROM edges
),
mm AS (SELECT COUNT(*) AS m FROM edges),
rk AS (
  SELECT src, dst, ROW_NUMBER() OVER (ORDER BY k, src, dst) - 1 AS r FROM ek
),
tr AS (
  SELECT src, dst FROM rk
  WHERE r >= (SELECT m - CAST(FLOOR({LPE_TRAIN} * m) AS BIGINT) FROM mm)
),
tadj AS (SELECT src, dst FROM tr UNION ALL SELECT dst AS src, src AS dst FROM tr),
wedge2 AS (
  SELECT a1.dst AS u, a2.dst AS v
  FROM tadj a1 JOIN tadj a2 ON a1.src = a2.src AND a1.dst < a2.dst
),
pr AS (
  SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS score FROM wedge2 w
  WHERE NOT EXISTS (SELECT 1 FROM tr e WHERE e.src = w.u AND e.dst = w.v)
  GROUP BY u, v
),
rnk AS (
  SELECT u, v, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, u ASC, v ASC) AS rn,
         CASE WHEN EXISTS (SELECT 1 FROM edges e WHERE e.src = u AND e.dst = v)
              THEN 1 ELSE 0 END AS pos
  FROM pr
),
np AS (SELECT COUNT(*) AS np, SUM(pos) AS npos FROM rnk),
cum AS (SELECT rn, SUM(pos) OVER (ORDER BY rn) AS ctp FROM rnk),
th AS (
  SELECT DISTINCT CAST(CEIL(np * (CAST(i AS DOUBLE) / {LPE_NT - 1}.0))
                       AS BIGINT) AS t
  FROM np, range({LPE_NT}) r(i)
),
tpt AS (
  SELECT t.t, COALESCE(c.ctp, 0) AS tp,
         t.t - COALESCE(c.ctp, 0) AS fp
  FROM th t LEFT JOIN cum c ON c.rn = t.t
),
rocp AS (
  SELECT t, CAST(fp AS DOUBLE) / (SELECT np - npos FROM np) AS x,
         CAST(tp AS DOUBLE) / (SELECT npos FROM np) AS y
  FROM tpt
),
rocd AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY t DESC) AS rr
    FROM rocp) WHERE rr = 1
),
rocseg AS (
  SELECT x, y, LEAD(x) OVER (ORDER BY x) AS nx,
         LEAD(y) OVER (ORDER BY x) AS ny FROM rocd
),
rocauc AS (SELECT SUM(0.5 * (nx - x) * (y + ny)) AS auc FROM rocseg
           WHERE nx IS NOT NULL),
prp AS (
  SELECT t,
         CASE WHEN tp > 0 OR ((SELECT npos FROM np) - tp) > 0
              THEN CAST(tp AS DOUBLE) / (SELECT npos FROM np)
              ELSE 1.0 END AS x,
         CASE WHEN tp > 0 OR fp > 0
              THEN CAST(tp AS DOUBLE) / (tp + fp)
              ELSE 1.0 END AS y
  FROM tpt
),
prd AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY t DESC) AS rr
    FROM prp) WHERE rr = 1
),
prseg AS (
  SELECT x, y, LEAD(x) OVER (ORDER BY x) AS nx,
         LEAD(y) OVER (ORDER BY x) AS ny FROM prd
),
prauc AS (SELECT SUM(0.5 * (nx - x) * (y + ny)) AS auc FROM prseg
          WHERE nx IS NOT NULL)
SELECT 'roc' AS metric,
       ROW_NUMBER() OVER (ORDER BY x) - 1 AS i,
       ROUND(x, 6) AS x, ROUND(y, 6) AS y,
       ROUND((SELECT auc FROM rocauc), 6) AS auc
FROM rocd
UNION ALL
SELECT 'pr' AS metric,
       ROW_NUMBER() OVER (ORDER BY x) - 1 AS i,
       ROUND(x, 6) AS x, ROUND(y, 6) AS y,
       ROUND((SELECT auc FROM prauc), 6) AS auc
FROM prd
ORDER BY metric, i
"""


# ---------------------------------------------------------------------------
# GraphDifference (dynamics/GraphDifference.cpp:18-120) — edit script from
# the contract graph to a deterministically perturbed variant: drop edges
# with (src*7+dst)%9 = 0, add the canonicalized (src, (dst+1)%N) image of
# edges with (src+dst)%5 = 0.  Node sets are edge-endpoint-derived, so node
# removals/additions arise naturally; the id-bound rule picks
# RESTORATION vs ADDITION exactly as the operator does.
# ---------------------------------------------------------------------------

def q_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.streaming.dynamics import graph_difference

    g1 = load_graph(spark, sf_dir)
    e = g1.edges
    keep = e.filter((F.col("src") * 7 + F.col("dst")) % 9 != 0).select(
        "src", "dst"
    )
    shifted = (
        e.filter((F.col("src") + F.col("dst")) % 5 == 0)
        .select(
            F.least(F.col("src"), (F.col("dst") + 1) % N_MOD).alias("src"),
            F.greatest(F.col("src"), (F.col("dst") + 1) % N_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    e2 = keep.unionByName(shifted).distinct().withColumn(
        "weight", F.lit(1.0)
    )
    g2 = Graph(e2, vertices=None, directed=False, weighted=False)
    return graph_difference(g1, g2).select(
        "cls", "type", "u", "v", F.round("w", 6).alias("w")
    )


SQL_GRAPH_DIFF = f"""
WITH {GRAPH_CTES},
e2 AS (
  SELECT src, dst FROM edges WHERE (src * 7 + dst) % 9 <> 0
  UNION
  SELECT LEAST(src, (dst + 1) % {N_MOD}) AS src,
         GREATEST(src, (dst + 1) % {N_MOD}) AS dst
  FROM edges WHERE (src + dst) % 5 = 0 AND src <> (dst + 1) % {N_MOD}
),
n1 AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges
                                UNION SELECT dst FROM edges)),
n2 AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e2
                                UNION SELECT dst FROM e2)),
b1 AS (SELECT MAX(id) AS b FROM n1)
SELECT 0 AS cls, 'EDGE_REMOVAL' AS type, e.src AS u, e.dst AS v,
       CAST(NULL AS DOUBLE) AS w
FROM edges e WHERE NOT EXISTS
  (SELECT 1 FROM e2 WHERE e2.src = e.src AND e2.dst = e.dst)
UNION ALL
SELECT 1, 'NODE_REMOVAL', n1.id, NULL, NULL
FROM n1 WHERE NOT EXISTS (SELECT 1 FROM n2 WHERE n2.id = n1.id)
UNION ALL
SELECT 1,
       CASE WHEN n2.id <= (SELECT b FROM b1) THEN 'NODE_RESTORATION'
            ELSE 'NODE_ADDITION' END,
       n2.id, NULL, NULL
FROM n2 WHERE NOT EXISTS (SELECT 1 FROM n1 WHERE n1.id = n2.id)
UNION ALL
SELECT 2, 'EDGE_ADDITION', e2.src, e2.dst, ROUND(1.0, 6)
FROM e2 WHERE NOT EXISTS
  (SELECT 1 FROM edges e WHERE e.src = e2.src AND e.dst = e2.dst)
"""


# ---------------------------------------------------------------------------
# RandomSpanningForest (components/RandomSpanningForest.cpp:18-50) — the
# md5 walk itself has data-dependent unbounded length (not SQL-unrollable,
# same stance as the Wilson UST family), but the forest INVARIANT is fully
# checkable: per component, exactly size-1 tree edges, all inside the
# component.  The gate hashes (label, size, tree_edges) per component;
# tree validity (acyclic, spanning, edges subset of G) is pytest-proven.
# ---------------------------------------------------------------------------

def q_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.spanning import random_spanning_forest

    g = load_graph(spark, sf_dir)
    forest = random_spanning_forest(g, seed=5)
    labels, _ = connected_components(g)
    lab = labels.select(F.col("id").alias("src"), F.col("label").alias("label"))
    per_comp = (
        forest.join(lab, "src")
        .groupBy("label")
        .agg(F.count("*").alias("tree_edges"))
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return (
        sizes.join(per_comp, "label", "left")
        .select(
            "label", "size",
            F.coalesce("tree_edges", F.lit(0)).alias("tree_edges"),
        )
    )


SQL_RANDOM_FOREST = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
cc AS (SELECT id, MIN(lbl) AS label FROM reach GROUP BY id)
SELECT label, COUNT(*) AS size,
       CAST(COUNT(*) - 1 AS BIGINT) AS tree_edges
FROM cc GROUP BY label
"""


# ---------------------------------------------------------------------------
# ClusteringProjector (coarsening/ClusteringProjector.cpp:13-84) — two
# coarsening levels (degree classes, then coarse-id mod 3), then the fine
# partition read back through the composed maps.  With compact=False the
# coarse id IS the label value, so the projected label of node v is
# degree(v) % 3 — which is what the oracle states directly.
# ---------------------------------------------------------------------------

def q_project_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.coarsening import (
        coarsen,
        project_back_to_finest,
    )

    g = load_graph(spark, sf_dir)
    l1 = g.degrees().select("id", F.col("degree").alias("label"))
    g1, m1 = coarsen(g, l1)
    l2 = g1.nodes().select("id", (F.col("id") % 3).alias("label"))
    g2, m2 = coarsen(g1, l2)
    coarse_labels = g2.nodes().select("id", F.col("id").alias("label"))
    return project_back_to_finest(coarse_labels, [m1, m2])


SQL_PROJECT_BACK = f"""
WITH {GRAPH_CTES}
SELECT id, degree % 3 AS label FROM deg
"""


def q_group_closeness_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupClosenessLocalSearch rows-only entry (like grow_shrink, the
    swap loop's length is data-dependent — not SQL-unrollable); the
    exact-replica equality lives in tests/test_growshrink.py."""
    from networkit_spark.operators.growshrink import (
        group_closeness_local_search,
    )

    g = load_dense_graph(spark, sf_dir)
    group, iters, _ = group_closeness_local_search(
        g, [0, 1, 2], run_grow_shrink=False, max_iterations=4
    )
    return spark.createDataFrame(
        [(int(u), int(iters)) for u in sorted(group)],
        "id long, iterations long",
    )


# ---------------------------------------------------------------------------
# SuccessiveShortestPathMinCostFlow (flow/SuccessiveShortestPath.cpp:160-240)
# — directed arcs = the contract adjacency with cost 1+(src+dst)%3, caps 5.0
# (never binding: total supply 3), terminals = the four highest-degree nodes
# (giant component): +2/+1 supplies, -2/-1 demands.  The oracle does NOT
# replay SSP: with non-binding caps the optimum decomposes into a 2x2
# transportation LP over shortest-path costs, OPT = min(2*d11 + d22,
# d11 + d12 + d21) — an INDEPENDENT check of the optimal value (the SSP
# invariant guarantees the engine's final cost IS the optimum).
# ---------------------------------------------------------------------------

MCF_RELAX_ROUNDS = 36


def q_min_cost_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.mincostflow import successive_shortest_path

    g = load_graph(spark, sf_dir)
    terms = [
        int(r["id"])
        for r in g.degrees()
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(4)
        .collect()
    ]
    s1, s2, t1, t2 = terms
    arcs = g.adj().select(
        "src", "dst",
        (1.0 + (F.col("src") + F.col("dst")) % 3).alias("weight"),
    )
    gd = Graph(arcs, vertices=g.nodes(), directed=True, weighted=True)
    caps = arcs.select("src", "dst", F.lit(5.0).alias("cap"))
    sups = spark.createDataFrame(
        [(s1, 2.0), (s2, 1.0), (t1, -2.0), (t2, -1.0)],
        "id long, supply double",
    )
    total, flow, info = successive_shortest_path(
        gd, caps, sups, max_relax_rounds=MCF_RELAX_ROUNDS
    )
    shipped = float(
        flow.filter(F.col("src").isin([s1, s2]))
        .agg(F.sum("f").alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    return spark.createDataFrame(
        [(float(total), float(shipped))], "total_cost double, shipped double"
    ).select(
        F.round("total_cost", 6).alias("total_cost"),
        F.round("shipped", 6).alias("shipped"),
    )


def _mcf_sql(rounds: int = MCF_RELAX_ROUNDS) -> str:
    parts = [
        """terms AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY degree DESC, id ASC) AS rk
  FROM deg ORDER BY degree DESC, id ASC LIMIT 4
)""",
        "carc AS MATERIALIZED (SELECT src, dst,"
        " 1.0 + (src + dst) % 3 AS cost FROM adj)",
        "d1_0 AS (SELECT (SELECT id FROM terms WHERE rk = 1) AS id,"
        " 0.0 AS dist)",
        "d2_0 AS (SELECT (SELECT id FROM terms WHERE rk = 2) AS id,"
        " 0.0 AS dist)",
    ]
    for src in (1, 2):
        for r in range(1, rounds + 1):
            parts.append(
                f"""d{src}_{r} AS MATERIALIZED (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{src}_{r - 1}
    UNION ALL
    SELECT c.dst AS id, p.dist + c.cost AS dist
    FROM d{src}_{r - 1} p JOIN carc c ON c.src = p.id
  ) GROUP BY id
)"""
            )
    last = rounds
    parts.append(
        f"""dm AS (
  SELECT
    (SELECT dist FROM d1_{last} WHERE id =
       (SELECT id FROM terms WHERE rk = 3)) AS d11,
    (SELECT dist FROM d1_{last} WHERE id =
       (SELECT id FROM terms WHERE rk = 4)) AS d12,
    (SELECT dist FROM d2_{last} WHERE id =
       (SELECT id FROM terms WHERE rk = 3)) AS d21,
    (SELECT dist FROM d2_{last} WHERE id =
       (SELECT id FROM terms WHERE rk = 4)) AS d22
)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + """
SELECT CAST(ROUND(LEAST(2 * d11 + d22, d11 + d12 + d21), 6) AS DOUBLE)
         AS total_cost,
       CAST(3.0 AS DOUBLE) AS shipped
FROM dm"""
    )


SQL_MIN_COST_FLOW = _mcf_sql()


def q_planarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftRightPlanarityCheck rows-only entry (planarity is not
    SQL-decidable; the Kuratowski/triangulation goldens live in
    tests/test_planarity.py)."""
    from networkit_spark.operators.planarity import left_right_planarity

    g = load_graph(spark, sf_dir)
    planar = left_right_planarity(g)
    n = g.nodes().count()
    m = g.edges.count()
    return spark.createDataFrame(
        [(bool(planar), int(n), int(m))],
        "planar boolean, n long, m long",
    )


# ---------------------------------------------------------------------------
# APSP (APSP.cpp:19-39): one tagged BFS batch over a deterministic source
# sample, (s, v, dist) — the oracle unrolls the same synchronized frontier
# with the source tag carried through every step.
# ---------------------------------------------------------------------------

APSP_SEED_MOD = 53  # sources: ids divisible by 53 (~19 on 0..996)


def q_apsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import apsp

    g = load_graph(spark, sf_dir)
    srcs = g.nodes().filter(F.col("id") % APSP_SEED_MOD == 0)
    return apsp(g, srcs).orderBy("s", "v")


def _apsp_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        f"t0 AS MATERIALIZED (SELECT id AS s, id AS v, "
        f"CAST(0 AS BIGINT) AS dist FROM nodes WHERE id % {APSP_SEED_MOD} = 0)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""t{i} AS MATERIALIZED (
  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.v, m.v) AS v,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM t{i - 1} p FULL OUTER JOIN (
    SELECT q.s, a.dst AS v, MIN(q.dist + 1) AS nd
    FROM adj a JOIN t{i - 1} q ON q.v = a.src GROUP BY q.s, a.dst
  ) m ON m.s = p.s AND m.v = p.v
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT s, v, dist FROM t{hops} ORDER BY s, v"
    )


SQL_APSP = _apsp_sql()


# ---------------------------------------------------------------------------
# ReverseBFS (ReverseBFS.cpp:17-75): hop distances following IN-edges on
# the DIRECTED contract graph — the oracle is the BFS unroll over the
# transposed dedges relation.
# ---------------------------------------------------------------------------

def q_reverse_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distancemisc import reverse_bfs_distances

    g = load_directed_graph(spark, sf_dir)
    seeds = g.nodes().filter(F.col("id") % BFS_SEED_MOD == 0)
    dist, _ = reverse_bfs_distances(g, seeds, max_hops=BFS_HOPS)
    return dist.orderBy("id")


def _reverse_bfs_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        """dbase AS (
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 31 + 7) % 997) AS v
  FROM orders
  UNION
  SELECT DISTINCT (o_orderkey % 997) AS u,
                  ((o_orderkey * 57 + 13) % 997) AS v
  FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT DISTINCT ((o_orderkey * 17 + 3) % 997) AS u,
                  ((o_orderkey * 43 + 11) % 997) AS v
  FROM orders WHERE o_orderkey % 3 = 0
)""",
        "dedges AS MATERIALIZED (SELECT DISTINCT u AS src, v AS dst "
        "FROM dbase WHERE u <> v)",
        # transposed adjacency: follow in-edges
        "radj AS MATERIALIZED (SELECT dst AS src, src AS dst FROM dedges)",
        "dnodes AS MATERIALIZED (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM dedges UNION ALL SELECT dst FROM dedges) t)",
        f"r0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS dist "
        f"FROM dnodes WHERE id % {BFS_SEED_MOD} = 0)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""r{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM r{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + 1) AS nd
    FROM radj a JOIN r{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"\nSELECT id, dist FROM r{hops} ORDER BY id"
    )


SQL_REVERSE_BFS = _reverse_bfs_sql()


# ---------------------------------------------------------------------------
# GraphDistance (GraphDistance.cpp:15-30): scalar min-id -> max-id distance,
# unweighted (BFS) and weighted (w = (src+dst)%5+1, the SSSP gate's weights);
# unreachable = -1.
# ---------------------------------------------------------------------------

def q_graph_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.distancemisc import graph_distance

    g = load_graph(spark, sf_dir)
    lo, hi = g.nodes().agg(F.min("id"), F.max("id")).collect()[0]
    d_bfs = graph_distance(g, int(lo), int(hi))
    wedges = g.edges.select(
        "src", "dst",
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("double").alias("weight"),
    )
    gw = Graph(wedges, None, directed=False, weighted=True)
    d_dij = graph_distance(gw, int(lo), int(hi))
    fix = lambda d: -1.0 if d == float("inf") else float(d)  # noqa: E731
    return spark.createDataFrame(
        [("bfs", fix(d_bfs)), ("dijkstra", fix(d_dij))],
        "kind string, dist double",
    )


def _graph_distance_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        "wadj AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM adj)",
        "st AS (SELECT MIN(id) AS s, MAX(id) AS t FROM nodes)",
        "g0 AS (SELECT s AS id, CAST(0 AS DOUBLE) AS dist FROM st)",
        "h0 AS (SELECT s AS id, CAST(0 AS DOUBLE) AS dist FROM st)",
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""g{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         LEAST(COALESCE(p.dist, 1e18), COALESCE(m.nd, 1e18)) AS dist
  FROM g{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + 1) AS nd
    FROM adj a JOIN g{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
        steps.append(
            f"""h{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         LEAST(COALESCE(p.dist, 1e18), COALESCE(m.nd, 1e18)) AS dist
  FROM h{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + a.w) AS nd
    FROM wadj a JOIN h{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"""
SELECT 'bfs' AS kind,
       COALESCE((SELECT g.dist FROM g{hops} g JOIN st ON g.id = st.t), -1.0)
         AS dist
UNION ALL
SELECT 'dijkstra' AS kind,
       COALESCE((SELECT h.dist FROM h{hops} h JOIN st ON h.id = st.t), -1.0)
         AS dist
ORDER BY kind"""
    )


# 32 rounds: the Spark side runs to full convergence (no cap, like the
# reference), and a weighted shortest path can use more hops than the
# unweighted diameter — 2x the BFS unroll gives Bellman-Ford headroom
# (rehearsed at sf0.001 + sf0.01).
SQL_GRAPH_DISTANCE = _graph_distance_sql(hops=2 * BFS_HOPS)


# ---------------------------------------------------------------------------
# AffectedNodes (AffectedNodes.cpp:22-306): affected set + min-endpoint
# distances + level-histogram improvements for an EDGE_ADDITION of the
# lexicographically-first contract edge, and the affected set + distances
# for its EDGE_REMOVAL.  The oracle unrolls the improving-BFS waves (the
# first-expansion exclusion is equivalent to dropping the single directed
# arc u->v from the expansion relation — the source is only ever expanded
# once) and replays the histogram algebra in SQL.
# ---------------------------------------------------------------------------

def q_affected_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.affected import AffectedNodes

    g = load_graph(spark, sf_dir)
    r = g.edges.orderBy("src", "dst").limit(1).collect()[0]
    fu, fv = int(r["src"]), int(r["dst"])

    add = AffectedNodes(g, "EDGE_ADDITION", fu, fv).run()
    g2 = Graph(
        g.edges.filter(~((F.col("src") == fu) & (F.col("dst") == fv))),
        None, directed=False, weighted=False,
    )
    rem = AffectedNodes(g2, "EDGE_REMOVAL", fu, fv).run()

    def fix_dist(c):
        return F.when(F.col(c) == float("inf"), F.lit(-1.0)).otherwise(
            F.col(c)
        )

    add_rows = (
        add.distances.join(add.improvements, "id")
        .select(
            F.lit("add").alias("scenario"), "id",
            fix_dist("dist").alias("dist"),
            F.round("improvement", 6).alias("improvement"),
        )
    )
    # F.round (half-up, matching DuckDB ROUND), not python round
    # (banker's)
    clo = spark.createDataFrame(
        [("add_closeness", -1)], "scenario string, id long"
    ).select(
        "scenario", "id",
        F.round(F.lit(float(add.closeness_u)), 6).alias("dist"),
        F.round(F.lit(float(add.closeness_v)), 6).alias("improvement"),
    )
    rem_rows = rem.distances.select(
        F.lit("rem").alias("scenario"), "id",
        fix_dist("dist").alias("dist"), F.lit(0.0).alias("improvement"),
    )
    return (
        add_rows.unionByName(clo).unionByName(rem_rows)
        .orderBy("scenario", "id")
    )


def _affected_sql(hops: int = BFS_HOPS) -> str:
    steps = [
        "fe AS (SELECT src AS fu, dst AS fv FROM edges "
        "ORDER BY src, dst LIMIT 1)",
    ]

    def plain_bfs(name: str, adj_rel: str, seeds: str) -> None:
        """LEAST-chain BFS: seeds = SQL producing (id, dist)."""
        steps.append(f"{name}0 AS MATERIALIZED ({seeds})")
        for i in range(1, hops + 1):
            steps.append(
                f"""{name}{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM {name}{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + 1) AS nd
    FROM {adj_rel} a JOIN {name}{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
            )

    def improving_bfs(name: str, adj_rel: str, seeds: str, old: str) -> None:
        """Wave chain with improving-only expansion; t = touched,
        f = frontier; seeds always expand."""
        steps.append(f"{name}t0 AS MATERIALIZED ({seeds})")
        steps.append(f"{name}f0 AS MATERIALIZED (SELECT * FROM {name}t0)")
        for i in range(1, hops + 1):
            steps.append(
                f"""{name}n{i} AS MATERIALIZED (
  SELECT c.id, c.dist FROM (
    SELECT a.dst AS id, MIN(f.dist + 1) AS dist
    FROM {adj_rel} a JOIN {name}f{i - 1} f ON f.id = a.src GROUP BY a.dst
  ) c LEFT JOIN {name}t{i - 1} t ON t.id = c.id WHERE t.id IS NULL
)"""
            )
            steps.append(
                f"{name}t{i} AS MATERIALIZED (SELECT * FROM {name}t{i - 1} "
                f"UNION ALL SELECT * FROM {name}n{i})"
            )
            steps.append(
                f"""{name}f{i} AS MATERIALIZED (
  SELECT n.id, n.dist FROM {name}n{i} n LEFT JOIN {old} o ON o.id = n.id
  WHERE o.dist IS NULL OR n.dist < o.dist
)"""
            )

    # ---- addition scenario (graph already contains (fu, fv)) ----------
    steps.append(
        "adj_au AS MATERIALIZED (SELECT src, dst FROM adj WHERE NOT "
        "(src = (SELECT fu FROM fe) AND dst = (SELECT fv FROM fe)))"
    )
    steps.append(
        "adj_av AS MATERIALIZED (SELECT src, dst FROM adj WHERE NOT "
        "(src = (SELECT fv FROM fe) AND dst = (SELECT fu FROM fe)))"
    )
    plain_bfs(
        "aou", "adj_au",
        "SELECT fu AS id, CAST(0 AS BIGINT) AS dist FROM fe",
    )
    plain_bfs(
        "aov", "adj_av",
        "SELECT fv AS id, CAST(0 AS BIGINT) AS dist FROM fe",
    )
    improving_bfs(
        "anu", "adj",
        "SELECT fu AS id, CAST(0 AS BIGINT) AS dist FROM fe",
        f"aou{hops}",
    )
    improving_bfs(
        "anv", "adj",
        "SELECT fv AS id, CAST(0 AS BIGINT) AS dist FROM fe",
        f"aov{hops}",
    )
    steps.append(
        f"""aff_u AS MATERIALIZED (
  SELECT t.id, t.dist FROM anut{hops} t LEFT JOIN aou{hops} o ON o.id = t.id
  WHERE t.id <> (SELECT fu FROM fe)
    AND (o.dist IS NULL OR t.dist < o.dist)
)"""
    )
    steps.append(
        f"""aff_v AS MATERIALIZED (
  SELECT t.id, t.dist FROM anvt{hops} t LEFT JOIN aov{hops} o ON o.id = t.id
  WHERE t.id <> (SELECT fv FROM fe)
    AND (o.dist IS NULL OR t.dist < o.dist)
)"""
    )
    for side, tch, old in (("u", "anut", "aou"), ("v", "anvt", "aov")):
        steps.append(
            f"""comp_{side} AS MATERIALIZED (
  SELECT COALESCE(n.id, o.id) AS id,
         LEAST(COALESCE(n.dist, 9223372036854775807),
               COALESCE(o.dist, 9223372036854775807)) AS dist
  FROM {tch}{hops} n FULL OUTER JOIN {old}{hops} o ON o.id = n.id
)"""
        )
        steps.append(
            f"hist_new_{side} AS (SELECT dist AS j, COUNT(*) AS c "
            f"FROM comp_{side} WHERE dist >= 1 GROUP BY dist)"
        )
        steps.append(
            f"hist_old_{side} AS (SELECT dist AS j, COUNT(*) AS c "
            f"FROM {old}{hops} WHERE dist >= 1 GROUP BY dist)"
        )
        steps.append(
            f"nl_{side} AS (SELECT MAX(dist) AS m FROM comp_{side} "
            f"WHERE dist >= 1)"
        )
    # levelImprovementU[i] sums the V-side delta; i-domain = the ix
    # values actually looked up (identical scores to the full series)
    steps.append(
        """hd_v AS (
  SELECT COALESCE(n.j, o.j) AS j,
         CAST(COALESCE(n.c, 0) - COALESCE(o.c, 0) AS DOUBLE) AS d
  FROM hist_new_v n FULL OUTER JOIN hist_old_v o ON o.j = n.j
  WHERE COALESCE(n.j, o.j) BETWEEN 1 AND (SELECT m FROM nl_v)
)"""
    )
    steps.append(
        """hd_u AS (
  SELECT COALESCE(n.j, o.j) AS j,
         CAST(COALESCE(n.c, 0) - COALESCE(o.c, 0) AS DOUBLE) AS d
  FROM hist_new_u n FULL OUTER JOIN hist_old_u o ON o.j = n.j
  WHERE COALESCE(n.j, o.j) BETWEEN 1 AND (SELECT m FROM nl_u)
)"""
    )
    steps.append(
        """imp_tab_u AS (
  SELECT ix.i, SUM(hd_v.d / (ix.i + hd_v.j)) AS imp
  FROM (SELECT DISTINCT c.dist AS i FROM aff_u a JOIN comp_v c ON c.id = a.id
        WHERE c.dist BETWEEN 1 AND (SELECT m FROM nl_u)) ix
  CROSS JOIN hd_v GROUP BY ix.i
)"""
    )
    steps.append(
        """imp_tab_v AS (
  SELECT ix.i, SUM(hd_u.d / (ix.i + hd_u.j)) AS imp
  FROM (SELECT DISTINCT c.dist AS i FROM aff_v a JOIN comp_u c ON c.id = a.id
        WHERE c.dist BETWEEN 1 AND (SELECT m FROM nl_v)) ix
  CROSS JOIN hd_u GROUP BY ix.i
)"""
    )
    steps.append(
        """score_u AS (
  SELECT a.id, COALESCE(t.imp, 0.0) AS improvement
  FROM aff_u a LEFT JOIN comp_v c ON c.id = a.id
  LEFT JOIN imp_tab_u t ON t.i = c.dist
)"""
    )
    steps.append(
        """score_v AS (
  SELECT a.id, COALESCE(t.imp, 0.0) AS improvement
  FROM aff_v a LEFT JOIN comp_u c ON c.id = a.id
  LEFT JOIN imp_tab_v t ON t.i = c.dist
)"""
    )
    steps.append(
        """add_imp AS (
  SELECT id, improvement FROM score_u
  WHERE id NOT IN (SELECT id FROM score_v)
  UNION ALL SELECT id, improvement FROM score_v
)"""
    )
    steps.append(
        f"""add_rows AS (
  SELECT 'add' AS scenario, n.id,
         CASE WHEN ou.dist IS NULL AND ov.dist IS NULL THEN -1.0
              ELSE CAST(LEAST(COALESCE(ou.dist, 9223372036854775807),
                              COALESCE(ov.dist, 9223372036854775807))
                        AS DOUBLE) END AS dist,
         ROUND(i.improvement, 6) AS improvement
  FROM (SELECT DISTINCT id FROM (SELECT id FROM aff_u
        UNION ALL SELECT id FROM aff_v) t) n
  JOIN add_imp i ON i.id = n.id
  LEFT JOIN aou{hops} ou ON ou.id = n.id
  LEFT JOIN aov{hops} ov ON ov.id = n.id
)"""
    )
    steps.append(
        """clo_row AS (
  SELECT 'add_closeness' AS scenario, CAST(-1 AS BIGINT) AS id,
         ROUND((SELECT SUM(1.0 / dist) FROM comp_u WHERE dist >= 1), 6)
           AS dist,
         ROUND((SELECT SUM(1.0 / dist) FROM comp_v WHERE dist >= 1), 6)
           AS improvement
)"""
    )
    # ---- removal scenario (drop both orientations) ---------------------
    steps.append(
        "adj_r AS MATERIALIZED (SELECT src, dst FROM adj WHERE NOT "
        "((src = (SELECT fu FROM fe) AND dst = (SELECT fv FROM fe)) OR "
        "(src = (SELECT fv FROM fe) AND dst = (SELECT fu FROM fe))))"
    )
    plain_bfs(
        "rou", "adj_r",
        "SELECT fu AS id, CAST(0 AS BIGINT) AS dist FROM fe",
    )
    plain_bfs(
        "rov", "adj_r",
        "SELECT fv AS id, CAST(0 AS BIGINT) AS dist FROM fe",
    )
    improving_bfs(
        "rnu", "adj_r",
        "SELECT fu AS id, CAST(0 AS BIGINT) AS dist FROM fe "
        "UNION ALL SELECT fv, CAST(1 AS BIGINT) FROM fe",
        f"rou{hops}",
    )
    improving_bfs(
        "rnv", "adj_r",
        "SELECT fv AS id, CAST(0 AS BIGINT) AS dist FROM fe "
        "UNION ALL SELECT fu, CAST(1 AS BIGINT) FROM fe",
        f"rov{hops}",
    )
    steps.append(
        f"""raff AS (
  SELECT DISTINCT id FROM (
    SELECT t.id FROM rnut{hops} t LEFT JOIN rou{hops} o ON o.id = t.id
    WHERE t.id <> (SELECT fu FROM fe) AND t.id <> (SELECT fv FROM fe)
      AND (o.dist IS NULL OR t.dist < o.dist)
    UNION ALL
    SELECT t.id FROM rnvt{hops} t LEFT JOIN rov{hops} o ON o.id = t.id
    WHERE t.id <> (SELECT fv FROM fe) AND t.id <> (SELECT fu FROM fe)
      AND (o.dist IS NULL OR t.dist < o.dist)
    UNION ALL SELECT fv FROM fe
    UNION ALL SELECT fu FROM fe
  ) t
)"""
    )
    steps.append(
        f"""rem_rows AS (
  SELECT 'rem' AS scenario, n.id,
         CASE WHEN ou.dist IS NULL AND ov.dist IS NULL THEN -1.0
              ELSE CAST(LEAST(COALESCE(ou.dist, 9223372036854775807),
                              COALESCE(ov.dist, 9223372036854775807))
                        AS DOUBLE) END AS dist,
         0.0 AS improvement
  FROM raff n
  LEFT JOIN rou{hops} ou ON ou.id = n.id
  LEFT JOIN rov{hops} ov ON ov.id = n.id
)"""
    )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + """
SELECT scenario, id, dist, improvement FROM add_rows
UNION ALL SELECT * FROM clo_row
UNION ALL SELECT * FROM rem_rows
ORDER BY scenario, id"""
    )


SQL_AFFECTED_NODES = _affected_sql()


# ---------------------------------------------------------------------------
# Node2Vec LearnEmbedding (LearnEmbedding.cpp:216-267 semantics under the
# deterministic synchronous-SGNS contract documented in
# operators/embedding.learn_embeddings): walks -> vocab^0.75 cumulative ->
# md5 window offsets + inverse-CDF negatives -> 2 unrolled full-batch GD
# epochs.  The oracle replays every stage in SQL (the negative draw as a
# direct interval join — the Spark side's bucketing is physical only).
# ---------------------------------------------------------------------------

N2VE_SEED_MOD = 211  # starts: 0, 211, 422, 633, 844
N2VE_LEN = 5
N2VE_DIM = 4
N2VE_WIN = 2
N2VE_NEG = 2
N2VE_EPOCHS = 2
N2VE_ALPHA = 0.025


def q_node2vec_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.embedding import (
        biased_random_walks,
        learn_embeddings,
    )

    g = load_graph(spark, sf_dir)
    starts = g.nodes().filter(F.col("id") % N2VE_SEED_MOD == 0)
    walks, _ = biased_random_walks(
        g, walk_length=N2VE_LEN, walks_per_node=1, p=N2V_P, q=N2V_Q,
        seed=N2V_SEED, starts=starts,
    )
    emb = learn_embeddings(
        walks, dimensions=N2VE_DIM, win_size=N2VE_WIN,
        iterations=N2VE_EPOCHS, neg_samples=N2VE_NEG, alpha=N2VE_ALPHA,
        seed=N2V_SEED,
    )
    return (
        emb.select("id", F.posexplode("emb").alias("d", "val"))
        .select("id", "d", F.round("val", 6).alias("val"))
        .orderBy("id", "d")
    )


def _node2vec_emb_sql() -> str:
    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"(CAST(({nib}) AS BIGINT) / POWER(16.0, 13))"

    def h13(*parts: str) -> str:
        # parts carry their own separators; plain concat
        joined = " || ".join(parts)
        return horner(f"md5({joined})")

    parts = [
        f"starts AS (SELECT id AS s FROM nodes WHERE id % {N2VE_SEED_MOD} = 0)",
        "st0 AS MATERIALIZED (SELECT s, CAST(0 AS BIGINT) AS rep, "
        "CAST(NULL AS BIGINT) AS prev, s AS cur FROM starts)",
        "w0 AS (SELECT s, rep, CAST(0 AS BIGINT) AS step, cur AS node FROM st0)",
    ]
    for k in range(1, N2VE_LEN):
        u01 = h13(
            f"'{N2V_SEED}|w|'",
            "CAST(s AS VARCHAR)", "'|'", "CAST(rep AS VARCHAR)", f"'|{k}'",
        )
        if k == 1:
            wgt = "1.0"
        else:
            wgt = f"""CASE WHEN a.dst = w.prev THEN 1.0 / {N2V_P}
             WHEN EXISTS (SELECT 1 FROM adj b
                          WHERE b.src = w.prev AND b.dst = a.dst) THEN 1.0
             ELSE 1.0 / {N2V_Q} END"""
        parts.append(
            f"""cand{k} AS MATERIALIZED (
  SELECT w.s, w.rep, w.cur, w.prev, a.dst AS x, {wgt} AS wgt
  FROM st{k - 1} w JOIN adj a ON a.src = w.cur
),
pick{k} AS MATERIALIZED (
  SELECT s, rep, cur, x FROM (
    SELECT s, rep, cur, x,
           SUM(wgt) OVER (PARTITION BY s, rep ORDER BY x) AS cum,
           {u01} * SUM(wgt) OVER (PARTITION BY s, rep) AS thr
    FROM cand{k}
  ) z WHERE cum > thr
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s, rep ORDER BY x) = 1
),
st{k} AS MATERIALIZED (
  SELECT s, rep, cur AS prev, x AS cur FROM pick{k}
),
w{k} AS (SELECT s, rep, CAST({k} AS BIGINT) AS step, cur AS node FROM st{k})"""
        )
    union = "\n  UNION ALL ".join(f"SELECT * FROM w{k}" for k in range(N2VE_LEN))
    parts.append(f"walks AS MATERIALIZED (\n  {union}\n)")

    # vocabulary + cumulative intervals in id order
    parts.append(
        "vocab AS (SELECT node AS id, COUNT(*) AS cnt FROM walks GROUP BY node)"
    )
    parts.append(
        """cumv AS MATERIALIZED (
  SELECT id,
         SUM(POWER(CAST(cnt AS DOUBLE), 0.75)) OVER (ORDER BY id)
           - POWER(CAST(cnt AS DOUBLE), 0.75) AS lo,
         SUM(POWER(CAST(cnt AS DOUBLE), 0.75)) OVER (ORDER BY id) AS hi
  FROM vocab
)"""
    )
    parts.append("tot AS (SELECT MAX(hi) AS t FROM cumv)")

    off = h13(
        f"'{N2V_SEED}|off|'", "CAST(t.s AS VARCHAR)", "'|'",
        "CAST(t.rep AS VARCHAR)", "'|'", "CAST(t.step AS VARCHAR)",
    )
    parts.append(
        f"""pairs AS MATERIALIZED (
  SELECT t.s, t.rep, t.wi, c.ci - t.wi + {N2VE_WIN} AS a, t.tgt, c.ctx
  FROM (SELECT s, rep, step AS wi, node AS tgt,
               CAST(FLOOR({off} * {N2VE_WIN}) AS BIGINT) AS woff
        FROM walks t) t
  JOIN (SELECT s, rep, step AS ci, node AS ctx FROM walks) c
    ON c.s = t.s AND c.rep = t.rep
  WHERE c.ci - t.wi + {N2VE_WIN} >= t.woff
    AND c.ci - t.wi + {N2VE_WIN} < 2 * {N2VE_WIN} + 1 - t.woff
    AND c.ci - t.wi + {N2VE_WIN} <> {N2VE_WIN}
)"""
    )
    neg_sel = []
    for j in range(1, N2VE_NEG + 1):
        thr = h13(
            f"'{N2V_SEED}|neg|'", "CAST(p.s AS VARCHAR)", "'|'",
            "CAST(p.rep AS VARCHAR)", "'|'", "CAST(p.wi AS VARCHAR)",
            "'|'", "CAST(p.a AS VARCHAR)", f"'|{j}'",
        )
        neg_sel.append(
            f"""SELECT p.ctx, c.id AS tgt, 0.0 AS label,
       p.s, p.rep, p.wi, p.a, CAST({j} AS BIGINT) AS j
FROM pairs p JOIN cumv c
  ON c.lo <= {thr} * (SELECT t FROM tot)
 AND {thr} * (SELECT t FROM tot) < c.hi
WHERE c.id <> p.tgt"""
        )
    parts.append(
        "trip AS MATERIALIZED (\n"
        "SELECT ctx, tgt, 1.0 AS label, s, rep, wi, a, "
        "CAST(0 AS BIGINT) AS j FROM pairs\n  UNION ALL "
        + "\n  UNION ALL ".join(neg_sel)
        + "\n)"
    )
    init = h13(
        f"'{N2V_SEED}|init|'", "CAST(v.id AS VARCHAR)", "'|'",
        "CAST(dd.d AS VARCHAR)",
    )
    parts.append(
        f"""pos0 AS MATERIALIZED (
  SELECT v.id, dd.d, ({init} - 0.5) / {N2VE_DIM} AS val
  FROM vocab v, (SELECT CAST(range AS BIGINT) AS d
                 FROM range({N2VE_DIM})) dd
)"""
    )
    parts.append(
        f"""neg0 AS MATERIALIZED (
  SELECT v.id, dd.d, 0.0 AS val
  FROM vocab v, (SELECT CAST(range AS BIGINT) AS d
                 FROM range({N2VE_DIM})) dd
)"""
    )
    for e in range(N2VE_EPOCHS):
        parts.append(
            f"""grad{e} AS MATERIALIZED (
  SELECT t.s, t.rep, t.wi, t.a, t.j, t.ctx, t.tgt,
         {N2VE_ALPHA} * (CASE WHEN pr.prod > 6.0 THEN t.label - 1.0
                              WHEN pr.prod < -6.0 THEN t.label
                              ELSE t.label - 1.0 + 1.0 / (1.0 + EXP(pr.prod))
                         END) AS grad
  FROM trip t JOIN (
    SELECT t2.s, t2.rep, t2.wi, t2.a, t2.j, SUM(p.val * n.val) AS prod
    FROM trip t2
    JOIN pos{e} p ON p.id = t2.ctx
    JOIN neg{e} n ON n.id = t2.tgt AND n.d = p.d
    GROUP BY t2.s, t2.rep, t2.wi, t2.a, t2.j
  ) pr ON pr.s = t.s AND pr.rep = t.rep AND pr.wi = t.wi
      AND pr.a = t.a AND pr.j = t.j
)"""
        )
        parts.append(
            f"""dpos{e} AS (
  SELECT g.ctx AS id, n.d, SUM(g.grad * n.val) AS dv
  FROM grad{e} g JOIN neg{e} n ON n.id = g.tgt GROUP BY g.ctx, n.d
)"""
        )
        parts.append(
            f"""dneg{e} AS (
  SELECT g.tgt AS id, p.d, SUM(g.grad * p.val) AS dv
  FROM grad{e} g JOIN pos{e} p ON p.id = g.ctx GROUP BY g.tgt, p.d
)"""
        )
        parts.append(
            f"""pos{e + 1} AS MATERIALIZED (
  SELECT p.id, p.d, p.val + COALESCE(x.dv, 0.0) AS val
  FROM pos{e} p LEFT JOIN dpos{e} x ON x.id = p.id AND x.d = p.d
)"""
        )
        parts.append(
            f"""neg{e + 1} AS MATERIALIZED (
  SELECT n.id, n.d, n.val + COALESCE(x.dv, 0.0) AS val
  FROM neg{e} n LEFT JOIN dneg{e} x ON x.id = n.id AND x.d = n.d
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id, d, ROUND(val, 6) + 0.0 AS val FROM pos{N2VE_EPOCHS} "
        "ORDER BY id, d"
    )


SQL_NODE2VEC_EMB = _node2vec_emb_sql()


# ---------------------------------------------------------------------------
# PubWebGenerator (generators/PubWebGenerator.cpp:47-160) — fixed-n
# synthetic gate (sf-independent like graph_hyperbolic): md5 area radii /
# centers / polar points, mutual-kNN in-range edges, 0.01/d^2 weights.
# Oracle: the same md5 draws + brute-force all-pairs (the Spark side's
# grid-cell join is physical only), with the documented 1e-9 threshold
# dead-band + rank quantization against 1-ulp JVM/libm trig differences.
# ---------------------------------------------------------------------------

PW_N, PW_A, PW_RAD, PW_MAXN, PW_SEED = 500, 4, 0.1, 6, 42


def q_pubweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import pubweb_graph

    _, edges = pubweb_graph(
        spark, PW_N, num_dense_areas=PW_A, neigh_rad=PW_RAD,
        max_neigh=PW_MAXN, seed=PW_SEED,
        threshold_margin=1e-9, rank_round=9,
    )
    return (
        edges.select(
            "src", "dst", (F.round("weight", 6) + F.lit(0.0)).alias("weight")
        )
        .orderBy("src", "dst")
    )


def _pubweb_sql() -> str:
    import math

    from networkit_spark.sources.generators import _py_md5_frac

    MAX_R, FACTOR = 0.2, 5.0
    radii = [
        MAX_R * (_py_md5_frac(f"pwf|{PW_SEED}", a) * FACTOR + 1.0) ** 2
        / 25.0
        for a in range(PW_A)
    ]
    centers = [
        (_py_md5_frac(f"pwcx|{PW_SEED}", a), _py_md5_frac(f"pwcy|{PW_SEED}", a))
        for a in range(PW_A)
    ]
    fsum = sum(r ** 1.5 for r in radii)
    ffac = (PW_N * (PW_A / (PW_A + 2.0))) / fsum
    num = [int(math.floor(ffac * r ** 1.5 + 0.5)) for r in radii]
    offs = [0]
    for c in num:
        offs.append(offs[-1] + c)
    n_rest = max(0, PW_N - offs[-1])

    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"(CAST(({nib}) AS BIGINT) / POWER(16.0, 13))"

    two_pi = repr(2 * math.pi)
    blocks = []
    for a in range(PW_A):
        if num[a] == 0:
            continue
        ang = (
            f"({two_pi} * "
            + horner(f"md5('pwang|{PW_SEED}|{a}|' || CAST(j AS VARCHAR))")
            + ")"
        )
        dst = (
            f"({radii[a]!r} * "
            + horner(f"md5('pwdist|{PW_SEED}|{a}|' || CAST(j AS VARCHAR))")
            + ")"
        )
        blocks.append(
            f"""SELECT CAST(range + {offs[a]} AS BIGINT) AS id,
       CASE WHEN {centers[a][0]!r} + COS({ang}) * {dst} > 1.0
            THEN {centers[a][0]!r} + COS({ang}) * {dst} - 1.0
            WHEN {centers[a][0]!r} + COS({ang}) * {dst} < 0.0
            THEN {centers[a][0]!r} + COS({ang}) * {dst} + 1.0
            ELSE {centers[a][0]!r} + COS({ang}) * {dst} END AS x,
       CASE WHEN {centers[a][1]!r} + SIN({ang}) * {dst} > 1.0
            THEN {centers[a][1]!r} + SIN({ang}) * {dst} - 1.0
            WHEN {centers[a][1]!r} + SIN({ang}) * {dst} < 0.0
            THEN {centers[a][1]!r} + SIN({ang}) * {dst} + 1.0
            ELSE {centers[a][1]!r} + SIN({ang}) * {dst} END AS y
FROM (SELECT range, range AS j FROM range({num[a]}))"""
        )
    if n_rest > 0:
        rx = horner(f"md5('pwrx|{PW_SEED}|' || CAST(j AS VARCHAR))")
        ry = horner(f"md5('pwry|{PW_SEED}|' || CAST(j AS VARCHAR))")
        blocks.append(
            f"""SELECT CAST(range + {offs[-1]} AS BIGINT) AS id,
       {rx} AS x, {ry} AS y
FROM (SELECT range, range AS j FROM range({n_rest}))"""
        )
    rad2 = repr(PW_RAD * PW_RAD)
    return (
        "WITH pts AS MATERIALIZED (\n"
        + "\nUNION ALL\n".join(blocks)
        + f"""
),
cand AS MATERIALIZED (
  SELECT a.id AS u, b.id AS v,
         (CASE WHEN a.x - b.x > 0.5 THEN 1.0 - (a.x - b.x)
               WHEN a.x - b.x < -0.5 THEN (a.x - b.x) + 1.0
               ELSE a.x - b.x END) AS dx,
         (CASE WHEN a.y - b.y > 0.5 THEN 1.0 - (a.y - b.y)
               WHEN a.y - b.y < -0.5 THEN (a.y - b.y) + 1.0
               ELSE a.y - b.y END) AS dy
  FROM pts a JOIN pts b ON a.id <> b.id
),
inr AS MATERIALIZED (
  SELECT u, v, dx * dx + dy * dy AS d2 FROM cand
  WHERE dx * dx + dy * dy <= {rad2}
    AND ABS(dx * dx + dy * dy - {rad2}) >= 1e-9
),
kept AS MATERIALIZED (
  SELECT u, v, d2 FROM (
    SELECT u, v, d2,
           ROW_NUMBER() OVER (
             PARTITION BY u
             ORDER BY ROUND(d2, 9), LEAST(u, v), GREATEST(u, v)
           ) AS rk
    FROM inr
  ) t WHERE rk <= {PW_MAXN - 1}
)
SELECT LEAST(k.u, k.v) AS src, GREATEST(k.u, k.v) AS dst,
       ROUND(MIN(0.01 / k.d2), 6) + 0.0 AS weight
FROM kept k JOIN kept r ON r.u = k.v AND r.v = k.u
GROUP BY LEAST(k.u, k.v), GREATEST(k.u, k.v)
ORDER BY src, dst"""
    )


SQL_PUBWEB = _pubweb_sql()


# ---------------------------------------------------------------------------
# DynamicPubWebGenerator (generators/DynamicPubWebGenerator.cpp:25-182) —
# fixed-n synthetic gate: 2 unrolled steps of delete-5% / insert-5% /
# mutual-kNN recompute / event diff, every md5 draw and the full
# brute-force structure replayed in SQL.
# ---------------------------------------------------------------------------

PWD_N, PWD_A, PWD_RAD, PWD_MAXN, PWD_STEPS = 250, 3, 0.12, 5, 2


def q_dyn_pubweb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import dynamic_pubweb_events

    ev = dynamic_pubweb_events(
        spark, PWD_N, num_dense_areas=PWD_A, neigh_rad=PWD_RAD,
        max_neigh=PWD_MAXN, steps=PWD_STEPS, seed=PW_SEED,
        threshold_margin=1e-9, rank_round=9,
    )
    return (
        ev.select(
            "step", "cls", "type", "u", "v",
            (F.round("w", 6) + F.lit(0.0)).alias("w"),
        )
        .orderBy("step", "cls", "u", "v")
    )


def _dyn_pubweb_sql() -> str:
    import math

    from networkit_spark.sources.generators import _py_md5_frac

    n, A, rad, maxn, steps, seed = (
        PWD_N, PWD_A, PWD_RAD, PWD_MAXN, PWD_STEPS, PW_SEED,
    )
    MAX_R, FACTOR = 0.2, 5.0
    radii = [
        MAX_R * (_py_md5_frac(f"pwf|{seed}", a) * FACTOR + 1.0) ** 2 / 25.0
        for a in range(A)
    ]
    centers = [
        (_py_md5_frac(f"pwcx|{seed}", a), _py_md5_frac(f"pwcy|{seed}", a))
        for a in range(A)
    ]
    fsum = sum(r ** 1.5 for r in radii)
    ffac = (n * (A / (A + 2.0))) / fsum
    num = [int(math.floor(ffac * r ** 1.5 + 0.5)) for r in radii]
    offs = [0]
    for c in num:
        offs.append(offs[-1] + c)
    n_rest = max(0, n - offs[-1])
    total = offs[-1] + n_rest
    nmut = int(total * 0.05)

    def horner(expr: str) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substring({expr}, {p + 1}, 1)) - 1)"
            f" * POWER(16.0, {12 - p})"
            for p in range(13)
        )
        return f"(CAST(({nib}) AS BIGINT) / POWER(16.0, 13))"

    two_pi = repr(2 * math.pi)

    def wrap_case(e: str) -> str:
        return (
            f"CASE WHEN {e} > 1.0 THEN {e} - 1.0 "
            f"WHEN {e} < 0.0 THEN {e} + 1.0 ELSE {e} END"
        )

    blocks = []
    for a in range(A):
        if num[a] == 0:
            continue
        ang = (
            f"({two_pi} * "
            + horner(f"md5('pwang|{seed}|{a}|' || CAST(j AS VARCHAR))")
            + ")"
        )
        dst = (
            f"({radii[a]!r} * "
            + horner(f"md5('pwdist|{seed}|{a}|' || CAST(j AS VARCHAR))")
            + ")"
        )
        xb = f"{centers[a][0]!r} + COS({ang}) * {dst}"
        yb = f"{centers[a][1]!r} + SIN({ang}) * {dst}"
        blocks.append(
            f"SELECT CAST(range + {offs[a]} AS BIGINT) AS id, "
            f"{wrap_case(xb)} AS x, {wrap_case(yb)} AS y "
            f"FROM (SELECT range, range AS j FROM range({num[a]}))"
        )
    if n_rest > 0:
        rx = horner(f"md5('pwrx|{seed}|' || CAST(j AS VARCHAR))")
        ry = horner(f"md5('pwry|{seed}|' || CAST(j AS VARCHAR))")
        blocks.append(
            f"SELECT CAST(range + {offs[-1]} AS BIGINT) AS id, {rx} AS x, "
            f"{ry} AS y FROM (SELECT range, range AS j FROM range({n_rest}))"
        )
    rad2 = repr(rad * rad)
    steps_sql = [
        "pts0 AS MATERIALIZED (\n" + "\nUNION ALL\n".join(blocks) + "\n)"
    ]

    def edge_ctes(sfx: str) -> None:
        steps_sql.append(
            f"""cand{sfx} AS MATERIALIZED (
  SELECT a.id AS u, b.id AS v,
         (CASE WHEN a.x - b.x > 0.5 THEN 1.0 - (a.x - b.x)
               WHEN a.x - b.x < -0.5 THEN (a.x - b.x) + 1.0
               ELSE a.x - b.x END) AS dx,
         (CASE WHEN a.y - b.y > 0.5 THEN 1.0 - (a.y - b.y)
               WHEN a.y - b.y < -0.5 THEN (a.y - b.y) + 1.0
               ELSE a.y - b.y END) AS dy
  FROM pts{sfx} a JOIN pts{sfx} b ON a.id <> b.id
),
inr{sfx} AS MATERIALIZED (
  SELECT u, v, dx * dx + dy * dy AS d2 FROM cand{sfx}
  WHERE dx * dx + dy * dy <= {rad2}
    AND ABS(dx * dx + dy * dy - {rad2}) >= 1e-9
),
kept{sfx} AS MATERIALIZED (
  SELECT u, v, d2 FROM (
    SELECT u, v, d2,
           ROW_NUMBER() OVER (
             PARTITION BY u
             ORDER BY ROUND(d2, 9), LEAST(u, v), GREATEST(u, v)
           ) AS rk
    FROM inr{sfx}
  ) t WHERE rk <= {maxn - 1}
),
edges{sfx} AS MATERIALIZED (
  SELECT LEAST(k.u, k.v) AS src, GREATEST(k.u, k.v) AS dst,
         MIN(0.01 / k.d2) AS w
  FROM kept{sfx} k JOIN kept{sfx} r ON r.u = k.v AND r.v = k.u
  GROUP BY LEAST(k.u, k.v), GREATEST(k.u, k.v)
)"""
        )

    edge_ctes("0")
    ev_names = []
    nid = total
    for st in range(steps):
        h = horner(f"md5('pwdel|{seed}|{st}|' || CAST(id AS VARCHAR))")
        steps_sql.append(
            f"""dels{st} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (ORDER BY {h}, id) AS rk FROM pts{st}
  ) t WHERE rk <= {nmut}
)"""
        )
        steps_sql.append(
            f"""ev0_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(0 AS BIGINT) AS cls,
         'EDGE_REMOVAL' AS type,
         CASE WHEN e.src IN (SELECT id FROM dels{st}) THEN e.src
              ELSE e.dst END AS u,
         CASE WHEN e.src IN (SELECT id FROM dels{st}) THEN e.dst
              ELSE e.src END AS v,
         0.0 AS w
  FROM edges{st} e
  WHERE e.src IN (SELECT id FROM dels{st})
     OR e.dst IN (SELECT id FROM dels{st})
)"""
        )
        steps_sql.append(
            f"""ev1_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(1 AS BIGINT) AS cls,
         'NODE_REMOVAL' AS type, id AS u, CAST(-1 AS BIGINT) AS v, 0.0 AS w
  FROM dels{st}
)"""
        )
        gid = f"CAST(range + {nid} AS BIGINT)"
        cdraw = (
            f"CAST(FLOOR("
            + horner(f"md5('pwinsc|{seed}|' || CAST(range + {nid} AS VARCHAR))")
            + f" * {A + 2}) AS BIGINT)"
        )
        angx = (
            f"({two_pi} * "
            + horner(f"md5('pwinsa|{seed}|' || CAST(range + {nid} AS VARCHAR))")
            + ")"
        )
        dfr = horner(f"md5('pwinsd|{seed}|' || CAST(range + {nid} AS VARCHAR))")
        radc = "CASE " + " ".join(
            f"WHEN {cdraw} = {a} THEN {radii[a]!r}" for a in range(A)
        ) + " ELSE 0.0 END"
        cxc = "CASE " + " ".join(
            f"WHEN {cdraw} = {a} THEN {centers[a][0]!r}" for a in range(A)
        ) + " ELSE 0.0 END"
        cyc = "CASE " + " ".join(
            f"WHEN {cdraw} = {a} THEN {centers[a][1]!r}" for a in range(A)
        ) + " ELSE 0.0 END"
        nsx = horner(f"md5('pwinsx|{seed}|' || CAST(range + {nid} AS VARCHAR))")
        nsy = horner(f"md5('pwinsy|{seed}|' || CAST(range + {nid} AS VARCHAR))")
        clx = wrap_case(f"({cxc}) + COS({angx}) * ({dfr} * ({radc}))")
        cly = wrap_case(f"({cyc}) + SIN({angx}) * ({dfr} * ({radc}))")
        steps_sql.append(
            f"""ins{st} AS MATERIALIZED (
  SELECT {gid} AS id,
         CASE WHEN {cdraw} < {A} THEN {clx} ELSE {nsx} END AS x,
         CASE WHEN {cdraw} < {A} THEN {cly} ELSE {nsy} END AS y
  FROM range({nmut})
)"""
        )
        steps_sql.append(
            f"""ev2_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(2 AS BIGINT) AS cls,
         'NODE_ADDITION' AS type, id AS u, CAST(-1 AS BIGINT) AS v, 0.0 AS w
  FROM ins{st}
)"""
        )
        steps_sql.append(
            f"""pts{st + 1} AS MATERIALIZED (
  SELECT p.id, p.x, p.y FROM pts{st} p
  WHERE p.id NOT IN (SELECT id FROM dels{st})
  UNION ALL SELECT id, x, y FROM ins{st}
)"""
        )
        edge_ctes(str(st + 1))
        steps_sql.append(
            f"""surv{st} AS MATERIALIZED (
  SELECT src, dst, w FROM edges{st}
  WHERE src NOT IN (SELECT id FROM dels{st})
    AND dst NOT IN (SELECT id FROM dels{st})
)"""
        )
        steps_sql.append(
            f"""ev3_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(3 AS BIGINT) AS cls,
         'EDGE_WEIGHT_UPDATE' AS type, e.src AS u, e.dst AS v, e.w
  FROM edges{st + 1} e JOIN surv{st} s ON s.src = e.src AND s.dst = e.dst
)"""
        )
        steps_sql.append(
            f"""ev4_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(4 AS BIGINT) AS cls,
         'EDGE_REMOVAL' AS type, s.src AS u, s.dst AS v, 0.0 AS w
  FROM surv{st} s LEFT JOIN edges{st + 1} e
    ON e.src = s.src AND e.dst = s.dst
  WHERE e.src IS NULL
)"""
        )
        steps_sql.append(
            f"""ev5_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(5 AS BIGINT) AS cls,
         'EDGE_ADDITION' AS type, e.src AS u, e.dst AS v, e.w
  FROM edges{st + 1} e LEFT JOIN surv{st} s
    ON s.src = e.src AND s.dst = e.dst
  WHERE s.src IS NULL
)"""
        )
        steps_sql.append(
            f"""ev6_{st} AS (
  SELECT CAST({st} AS BIGINT) AS step, CAST(6 AS BIGINT) AS cls,
         'TIME_STEP' AS type, CAST(-1 AS BIGINT) AS u,
         CAST(-1 AS BIGINT) AS v, 0.0 AS w
)"""
        )
        ev_names.extend(f"ev{c}_{st}" for c in range(7))
        nid += nmut
    union = "\nUNION ALL ".join(f"SELECT * FROM {e}" for e in ev_names)
    return (
        "WITH "
        + ",\n".join(steps_sql)
        + f""",
allev AS (
  {union}
)
SELECT step, cls, type, u, v, ROUND(w, 6) + 0.0 AS w FROM allev
ORDER BY step, cls, u, v"""
    )


SQL_DYN_PUBWEB = _dyn_pubweb_sql()


# ---------------------------------------------------------------------------
# Dynamic generator family (generators/DynamicPathGenerator.cpp etc.).
# graph_dyn_path gets a full SQL oracle (the stream is a pure projection
# of the step index); the sequential trio (DorogovtsevMendes / Barabasi-
# Albert / ForestFire) is a rows-only entry — their growth recurrences
# are inherently sequential (each draw domain depends on every prior
# step), so a SQL replay would just re-embed the same driver-computed
# stream; their strongest checks are the reference-invariant pytest
# suite (tests/test_dyngen.py).
# ---------------------------------------------------------------------------

DYNGEN_STEPS = 40


def q_dyn_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.dyngen import dynamic_path_events

    return dynamic_path_events(spark, DYNGEN_STEPS).orderBy(
        "step", "cls", "u", "v"
    )


SQL_DYN_PATH = f"""
WITH s AS (SELECT CAST(range + 1 AS BIGINT) AS s FROM range({DYNGEN_STEPS}))
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS step, CAST(0 AS BIGINT) AS cls,
         'NODE_ADDITION' AS type, CAST(0 AS BIGINT) AS u,
         CAST(-1 AS BIGINT) AS v, CAST(0.0 AS DOUBLE) AS w
  UNION ALL
  SELECT s, CAST(0 AS BIGINT), 'NODE_ADDITION', s, CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE)
  FROM s
  UNION ALL
  SELECT s, CAST(1 AS BIGINT), 'EDGE_ADDITION', s - 1, s, CAST(1.0 AS DOUBLE) FROM s
  UNION ALL
  SELECT s, CAST(2 AS BIGINT), 'TIME_STEP', CAST(-1 AS BIGINT),
         CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE) FROM s
) t ORDER BY step, cls, u, v
"""


def q_dyn_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.dyngen import (
        dynamic_barabasi_albert_events,
        dynamic_dorogovtsev_mendes_events,
        dynamic_forest_fire_events,
    )

    dm = dynamic_dorogovtsev_mendes_events(spark, 25, seed=42).select(
        F.lit("dm").alias("gen"), "step", "cls", "type", "u", "v", "w"
    )
    ba = dynamic_barabasi_albert_events(spark, 25, 3, seed=42).select(
        F.lit("ba").alias("gen"), "step", "cls", "type", "u", "v", "w"
    )
    ff = dynamic_forest_fire_events(
        spark, 25, p=0.4, directed=True, r=0.5, seed=42
    ).select(F.lit("ff").alias("gen"), "step", "cls", "type", "u", "v", "w")
    return (
        dm.unionByName(ba).unionByName(ff)
        .orderBy("gen", "step", "cls", "u", "v")
    )


# ---------------------------------------------------------------------------
# DynamicHyperbolicGenerator T = 0 (generators/DynamicHyperbolicGenerator
# .cpp:216-366) — fixed-n synthetic gate: 2 unrolled movement steps
# (cosh-cdf radial advance with boundary bounce + center crossing,
# persistent radial-sign state) and per-step threshold-edge-set diffs,
# brute-force in the oracle (the band/sector join is physical only).
# ---------------------------------------------------------------------------

DHYP_N, DHYP_MES, DHYP_MD, DHYP_STEPS = 120, 0.4, 0.1, 2
DHYP_AVG, DHYP_PLEXP, DHYP_SEED, DHYP_MARGIN = 6.0, 3.0, 42, 1e-9


def q_dyn_hyperbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import dynamic_hyperbolic_events

    ev, _, _ = dynamic_hyperbolic_events(
        spark, DHYP_N, avg_degree=DHYP_AVG, plexp=DHYP_PLEXP,
        move_each_step=DHYP_MES, move_distance=DHYP_MD, steps=DHYP_STEPS,
        seed=DHYP_SEED, threshold_margin=DHYP_MARGIN,
    )
    return ev.orderBy("step", "cls", "u", "v")


def _dyn_hyperbolic_sql() -> str:
    import math

    from networkit_spark.sources.generators import hyperbolic_target_radius

    n, mes, md, steps, seed = (
        DHYP_N, DHYP_MES, DHYP_MD, DHYP_STEPS, DHYP_SEED,
    )
    alpha = 0.5 * (DHYP_PLEXP - 1)
    R = hyperbolic_target_radius(float(n), n * DHYP_AVG / 2.0, alpha)
    cha_r = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2.0
    cosh_r = (math.exp(R) + math.exp(-R)) / 2.0
    maxcdf = cha_r
    den = float(16 ** 13)
    pi = repr(math.pi)
    two_pi = repr(2 * math.pi)
    frac_a = _md5_long13_sql(f"md5('hga|{seed}|' || CAST(i AS VARCHAR))")
    frac_r = _md5_long13_sql(f"md5('hgr|{seed}|' || CAST(i AS VARCHAR))")
    frac_am = _md5_long13_sql(f"md5('dha|{seed}|' || CAST(i AS VARCHAR))")
    frac_rm = _md5_long13_sql(f"md5('dhr|{seed}|' || CAST(i AS VARCHAR))")

    parts = [
        f"""st0 AS MATERIALIZED (
  SELECT i AS id,
         2 * PI() * (({frac_a}) / {den!r}) AS theta,
         LN(u + SQRT(u * u - 1.0)) / {alpha!r} AS r,
         (2.0 * (({frac_am}) / {den!r}) - 1.0) * {md!r} AS amov,
         (2.0 * (({frac_rm}) / {den!r}) - 1.0) * {10.0 * md!r} AS rmov
  FROM (
    SELECT i, 1.0 + ({cha_r!r} - 1.0) * (({frac_r}) / {den!r}) AS u
    FROM range({n}) t(i)
  )
)"""
    ]

    def edge_ctes(s: int) -> None:
        parts.append(
            f"""trig{s} AS MATERIALIZED (
  SELECT id, COS(theta) AS c, SIN(theta) AS sn,
         (EXP(r) + EXP(-r)) / 2 AS ch, (EXP(r) - EXP(-r)) / 2 AS sh
  FROM st{s}
),
e{s} AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst
  FROM trig{s} a JOIN trig{s} b ON a.id < b.id
  WHERE (a.ch * b.ch - a.sh * b.sh * (a.c * b.c + a.sn * b.sn))
          <= {cosh_r!r}
    AND ABS((a.ch * b.ch - a.sh * b.sh * (a.c * b.c + a.sn * b.sn))
            - {cosh_r!r}) >= {DHYP_MARGIN!r}
)"""
        )

    edge_ctes(0)
    ev_names = []
    for s in range(steps):
        wig = (
            "("
            + _md5_long13_sql(
                f"md5('dhw|{seed}|{s}|' || CAST(id AS VARCHAR))"
            )
            + f") / {den!r} < {mes!r}"
        )
        parts.append(
            f"""mva{s} AS (
  SELECT *,
         (EXP({alpha!r} * r) + EXP(-{alpha!r} * r)) / 2
           + {alpha!r} * rmov AS nc0
  FROM (SELECT *, ({wig}) AS wig FROM st{s})
),
mvb{s} AS (
  SELECT *,
         CASE WHEN nc0 > {maxcdf!r} THEN 2 * {maxcdf!r} - nc0
              ELSE nc0 END AS nc1,
         CASE WHEN nc0 > {maxcdf!r} THEN -1.0 ELSE 1.0 END AS s1
  FROM mva{s}
),
mvc{s} AS (
  SELECT *,
         CASE WHEN nc1 < 1.0 THEN 2.0 - nc1 ELSE nc1 END AS nc2,
         CASE WHEN nc1 < 1.0 THEN -s1 ELSE s1 END AS s2,
         CASE WHEN nc1 < 1.0 THEN (
             CASE WHEN theta > {pi} THEN theta - {pi}
                  ELSE theta + {pi} END)
              ELSE theta END AS phi1
  FROM mvb{s}
),
mvd{s} AS (
  SELECT *,
         LEAST(LN(nc2 + SQRT(nc2 * nc2 - 1.0)) / {alpha!r},
               {R - 1e-12!r}) AS newr
  FROM mvc{s}
),
mve{s} AS (SELECT *, phi1 + amov / newr AS raw FROM mvd{s}),
st{s + 1} AS MATERIALIZED (
  SELECT id,
         CASE WHEN wig THEN (
             CASE WHEN raw < 0
                  THEN raw + (FLOOR(-raw / {two_pi}) + 1) * {two_pi}
                  WHEN raw > {two_pi}
                  THEN raw - FLOOR(raw / {two_pi}) * {two_pi}
                  ELSE raw END)
              ELSE theta END AS theta,
         CASE WHEN wig THEN newr ELSE r END AS r,
         amov,
         CASE WHEN wig THEN rmov * s2 ELSE rmov END AS rmov
  FROM mve{s}
)"""
        )
        edge_ctes(s + 1)
        parts.append(
            f"""ev0_{s} AS (
  SELECT CAST({s} AS BIGINT) AS step, CAST(0 AS BIGINT) AS cls,
         'EDGE_ADDITION' AS type, n.src AS u, n.dst AS v
  FROM e{s + 1} n LEFT JOIN e{s} o ON o.src = n.src AND o.dst = n.dst
  WHERE o.src IS NULL
),
ev1_{s} AS (
  SELECT CAST({s} AS BIGINT) AS step, CAST(1 AS BIGINT) AS cls,
         'EDGE_REMOVAL' AS type, o.src AS u, o.dst AS v
  FROM e{s} o LEFT JOIN e{s + 1} n ON n.src = o.src AND n.dst = o.dst
  WHERE n.src IS NULL
),
ev2_{s} AS (
  SELECT CAST({s} AS BIGINT) AS step, CAST(2 AS BIGINT) AS cls,
         'TIME_STEP' AS type, CAST(-1 AS BIGINT) AS u,
         CAST(-1 AS BIGINT) AS v
)"""
        )
        ev_names.extend(f"ev{c}_{s}" for c in range(3))
    union = "\nUNION ALL ".join(f"SELECT * FROM {e}" for e in ev_names)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT step, cls, type, u, v FROM ({union}) t "
        "ORDER BY step, cls, u, v"
    )


SQL_DYN_HYPERBOLIC = _dyn_hyperbolic_sql()


# ---------------------------------------------------------------------------
# MaxentStress (viz/MaxentStress.cpp:78-204) — one alpha level of 5
# majorization solves on the contract graph under the deterministic
# contract (md5 init, exact repulsion, 10 damped-Jacobi sweeps per
# solve), every stage unrolled in SQL.
# ---------------------------------------------------------------------------

MXS_DIM, MXS_MSA, MXS_JITERS, MXS_SEED = 2, 5, 10, 42
MXS_ALPHA, MXS_OMEGA = 1.0, 0.5


def q_maxent_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.maxentstress import maxent_stress

    g = load_graph(spark, sf_dir)
    coords, info = maxent_stress(
        g, dim=MXS_DIM, alpha=MXS_ALPHA, alpha_reduction=0.3,
        final_alpha=0.5, max_solves_per_alpha=MXS_MSA,
        jacobi_iters=MXS_JITERS, jacobi_omega=MXS_OMEGA, seed=MXS_SEED,
    )
    if info.iterations != MXS_MSA:
        raise AssertionError(
            f"expected exactly {MXS_MSA} solves, ran {info.iterations}"
        )
    return coords.select(
        "id", "d", (F.round("x", 6) + F.lit(0.0)).alias("x")
    ).orderBy("id", "d")


def _maxent_stress_sql() -> str:
    seed, dim, msa, jit = MXS_SEED, MXS_DIM, MXS_MSA, MXS_JITERS
    om = repr(MXS_OMEGA)
    h = _md5_long13_sql(
        f"md5('{seed}|mxs|' || CAST(n.id AS VARCHAR) || '|' || "
        "CAST(dd.d AS VARCHAR))"
    )
    den = float(16 ** 13)
    parts = [
        f"dims AS (SELECT CAST(range AS BIGINT) AS d FROM range({dim}))",
        "nn AS MATERIALIZED (SELECT a.id AS src, b.id AS dst "
        "FROM nodes a, nodes b WHERE a.id <> b.id AND NOT EXISTS "
        "(SELECT 1 FROM adj e WHERE e.src = a.id AND e.dst = b.id))",
        "degs AS MATERIALIZED (SELECT src AS id, "
        "CAST(COUNT(*) AS DOUBLE) AS deg FROM adj GROUP BY src)",
        "nctn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        f"""x0 AS MATERIALIZED (
  SELECT n.id, dd.d,
         2.0 * (({h}) / {den!r}) - 1.0 AS x
  FROM nodes n, dims dd
)""",
    ]
    for s in range(msa):
        parts.append(
            f"""pd{s} AS MATERIALIZED (
  SELECT p.src, p.dst, xs.d, xs.x AS xs, xd.x AS xd
  FROM nn p JOIN x{s} xs ON xs.id = p.src
  JOIN x{s} xd ON xd.id = p.dst AND xd.d = xs.d
),
d2_{s} AS MATERIALIZED (
  SELECT src, dst, GREATEST(SUM((xs - xd) * (xs - xd)), 1e-3) AS d2c
  FROM pd{s} GROUP BY src, dst
),
rep{s} AS MATERIALIZED (
  SELECT p.d, p.src AS id, SUM((p.xs - p.xd) / q.d2c) AS b
  FROM pd{s} p JOIN d2_{s} q ON q.src = p.src AND q.dst = p.dst
  GROUP BY p.d, p.src
),
repn{s} AS MATERIALIZED (
  SELECT r.d, r.id, r.b / t.nrm AS b
  FROM rep{s} r JOIN (
    SELECT d, SQRT(SUM(b * b)) AS nrm FROM rep{s} GROUP BY d
  ) t ON t.d = r.d
),
ed{s} AS MATERIALIZED (
  SELECT e.src, e.dst, xs.d, xs.x AS xs, xd.x AS xd
  FROM adj e JOIN x{s} xs ON xs.id = e.src
  JOIN x{s} xd ON xd.id = e.dst AND xd.d = xs.d
),
edist{s} AS MATERIALIZED (
  SELECT src, dst,
         GREATEST(SQRT(SUM((xs - xd) * (xs - xd))), 1e-5) AS dist
  FROM ed{s} GROUP BY src, dst
),
braw{s} AS MATERIALIZED (
  SELECT p.d, p.src AS id, SUM((p.xs - p.xd) / q.dist) AS b
  FROM ed{s} p JOIN edist{s} q ON q.src = p.src AND q.dst = p.dst
  GROUP BY p.d, p.src
)"""
        )
        if s < msa // 5:
            parts.append(
                f"""bn{s} AS (
  SELECT r.d, r.id, r.b / t.nrm AS b
  FROM braw{s} r JOIN (
    SELECT d, SQRT(SUM(b * b)) AS nrm FROM braw{s} GROUP BY d
  ) t ON t.d = r.d
)"""
            )
            bsrc = f"bn{s}"
        else:
            bsrc = f"braw{s}"
        parts.append(
            f"""bz{s} AS MATERIALIZED (
  SELECT d, id, b - AVG(b) OVER (PARTITION BY d) AS b FROM (
    SELECT COALESCE(a.d, r.d) AS d, COALESCE(a.id, r.id) AS id,
           COALESCE(a.b, 0.0) + {MXS_ALPHA!r} * COALESCE(r.b, 0.0) AS b
    FROM {bsrc} a FULL OUTER JOIN repn{s} r
      ON r.d = a.d AND r.id = a.id
  ) t
)"""
        )
        # note: the zero-sum step divides by n over ALL nodes — every
        # node has a rep term (rep covers all ids on a connected graph
        # with n > deg+1), so AVG == sum/n
        parts.append(
            f"""y{s}_0 AS MATERIALIZED (
  SELECT n.id, dd.d, 0.0 AS x, COALESCE(g.deg, 0.0) AS deg,
         COALESCE(b.b, 0.0) AS b
  FROM nodes n CROSS JOIN dims dd
  LEFT JOIN degs g ON g.id = n.id
  LEFT JOIN bz{s} b ON b.id = n.id AND b.d = dd.d
)"""
        )
        for t in range(1, jit + 1):
            parts.append(
                f"""y{s}_{t} AS MATERIALIZED (
  SELECT y.id, y.d,
         CASE WHEN y.deg > 0
              THEN (1.0 - {om}) * y.x
                   + {om} * (y.b + COALESCE(a.ax, 0.0)) / y.deg
              ELSE y.x END AS x,
         y.deg, y.b
  FROM y{s}_{t - 1} y LEFT JOIN (
    SELECT e.src AS id, p.d, SUM(p.x) AS ax
    FROM adj e JOIN y{s}_{t - 1} p ON p.id = e.dst GROUP BY e.src, p.d
  ) a ON a.id = y.id AND a.d = y.d
)"""
            )
        parts.append(
            f"x{s + 1} AS MATERIALIZED (SELECT id, d, x FROM y{s}_{jit})"
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + f"\nSELECT id, d, ROUND(x, 6) + 0.0 AS x FROM x{msa} "
        "ORDER BY id, d"
    )


SQL_MAXENT_STRESS = _maxent_stress_sql()

# ---------------------------------------------------------------------------
# MaxentStress quality metrics (viz/MaxentStress.cpp:207-362) — the
# five layout measures over an md5-derandomized synthetic layout on
# the contract graph (the metrics are pure functions of
# (graph, coordinates); a fixed layout keeps the oracle to one
# all-pairs BFS instead of replaying the whole majorization).  q = 2
# exercises the pow branch via its exact-arithmetic spelling; every
# per-pair term is snapped to a 1e-6 grid and summed as BIGINT in both
# engines (operators/maxentstress._qsum), so the global sums are
# FP-order independent.
# ---------------------------------------------------------------------------

MXM_SEED = 7
MXM_Q = 2.0
MXM_QUANTUM = 1e-6
MXM_FINAL_ALPHA = 0.008


def q_maxent_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.maxentstress import _h13, maxent_metrics

    g = load_graph(spark, sf_dir)
    coords = None
    for d in range(2):
        part = g.nodes().select(
            "id", F.lit(d).cast("long").alias("d"),
            (2.0 * _h13(MXM_SEED, "mxm", F.col("id"), d) - 1.0).alias("x"),
        )
        coords = part if coords is None else coords.unionByName(part)
    m = maxent_metrics(
        g, coords, q=MXM_Q, final_alpha=MXM_FINAL_ALPHA,
        quantum=MXM_QUANTUM,
    )
    return m.select(
        (F.round("scaling_factor", 6) + F.lit(0.0)).alias("scaling_factor"),
        (F.round("full_stress", 6) + F.lit(0.0)).alias("full_stress"),
        (F.round("maxent", 6) + F.lit(0.0)).alias("maxent"),
        (F.round("mean_distance_error", 6) + F.lit(0.0))
        .alias("mean_distance_error"),
        (F.round("ldme", 6) + F.lit(0.0)).alias("ldme"),
    )


def _maxent_metrics_sql() -> str:
    den = float(16 ** 13)
    h0 = _md5_long13_sql(
        f"md5('{MXM_SEED}|mxm|' || CAST(id AS VARCHAR) || '|0')"
    )
    h1 = _md5_long13_sql(
        f"md5('{MXM_SEED}|mxm|' || CAST(id AS VARCHAR) || '|1')"
    )
    qz = f"CAST(FLOOR({{t}} / {MXM_QUANTUM!r} + 0.5) AS BIGINT)"

    def qsum(t: str) -> str:
        return f"SUM({qz.format(t=t)}) * {MXM_QUANTUM!r}"

    return (
        f"WITH {GRAPH_CTES},\n"
        + f"""crd AS MATERIALIZED (
  SELECT id,
         2.0 * (({h0}) / {den!r}) - 1.0 AS x0,
         2.0 * (({h1}) / {den!r}) - 1.0 AS x1
  FROM nodes
),
geo AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst,
         SQRT((a.x0 - b.x0) * (a.x0 - b.x0)
              + (a.x1 - b.x1) * (a.x1 - b.x1)) AS geo
  FROM crd a JOIN crd b ON a.id <> b.id
),\n"""
        + _bfs_unroll(
            "adj",
            "SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM nodes",
            DIAM_HOPS,
        )
        + f""",
sg AS (
  SELECT g.geo, CAST(t.dist AS DOUBLE) AS gd
  FROM t{DIAM_HOPS} t JOIN geo g ON g.src = t.s AND g.dst = t.v
  WHERE CAST(t.dist AS DOUBLE) >= 1e-5
),
a1 AS (
  SELECT {qsum("geo / gd")} AS topf,
         {qsum("(geo * geo) / (gd * gd)")} AS botf,
         {qsum("((geo - gd) * (geo - gd)) / (gd * gd)")} AS fs
  FROM sg
),
ea AS (
  SELECT {qsum("1.0 / (GREATEST(geo, 1e-5) * GREATEST(geo, 1e-5))")}
           AS ent
  FROM geo
),
ke AS (
  SELECT g.geo, 1.0 AS dk, GREATEST(g.geo, 1e-5) AS distc
  FROM adj e JOIN geo g ON g.src = e.src AND g.dst = e.dst
),
a2 AS (
  SELECT {qsum("((distc - dk) * (distc - dk)) / (dk * dk)")} AS energy,
         {qsum("1.0 / (distc * distc)")} AS ent_edges,
         {qsum("ABS(geo - dk) / dk")} AS mde_sum,
         {qsum("(dk - geo) * (dk - geo)")} AS ldme_sum,
         COUNT(*) AS card
  FROM ke
)
SELECT ROUND(topf / botf, 6) + 0.0 AS scaling_factor,
       ROUND(fs / 2.0, 6) + 0.0 AS full_stress,
       ROUND((energy - {MXM_FINAL_ALPHA!r}
              * ((ent - ent_edges) * -1.0)) / 2.0, 6) + 0.0 AS maxent,
       ROUND(mde_sum / CAST(card AS DOUBLE), 6) + 0.0
         AS mean_distance_error,
       ROUND(SQRT(ldme_sum / CAST(card AS DOUBLE)), 6) + 0.0 AS ldme
FROM a1, ea, a2"""
    )


SQL_MAXENT_METRICS = _maxent_metrics_sql()

# ---------------------------------------------------------------------------
# ChungLuGeneratorAlamEtAl (generators/ChungLuGeneratorAlamEtAl.cpp) —
# counting-sort relabeled, capped-degree, UNclamped pair probabilities;
# the md5 Bernoulli field replaces the reference's sequential geometric
# edge-skipping (equal in distribution — documented in the operator).
# Fixed synthetic degree sequence; brute-force oracle replays every
# draw.  Tie order inside equal-degree ranks is irrelevant: the edge
# set depends only on the rank -> capped-degree map, which is unique.
# ---------------------------------------------------------------------------

CLA_N = 200
CLA_SEED = 5


def _cla_degrees() -> list:
    return [(i * 7) % 29 + 1 for i in range(CLA_N)]


def q_chung_lu_alam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.sources.generators import chung_lu_alam_etal

    g = chung_lu_alam_etal(spark, _cla_degrees(), seed=CLA_SEED)
    return g.edges.select("src", "dst").orderBy("src", "dst")


def _chung_lu_alam_sql() -> str:
    den = float(1 << 52)
    h = _md5_long13_sql(
        f"md5('cla|{CLA_SEED}|' || CAST(a.id AS VARCHAR) || '|' "
        "|| CAST(b.id AS VARCHAR))"
    )
    return f"""
WITH degs AS (
  SELECT i, LEAST((i * 7) % 29 + 1, {CLA_N} - 1) AS dc
  FROM range({CLA_N}) t(i)
),
rk AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY dc) - 1 AS BIGINT) AS id, dc
  FROM degs
),
tot AS (SELECT CAST(SUM(dc) AS DOUBLE) AS s FROM degs)
SELECT a.id AS src, b.id AS dst
FROM rk a JOIN rk b ON a.id < b.id, tot
WHERE (({h}) / {den!r}) < (a.dc * b.dc) / tot.s
ORDER BY src, dst
"""


SQL_CHUNG_LU_ALAM = _chung_lu_alam_sql()

# ---------------------------------------------------------------------------
# UnionMaximumSpanningForest (graph/UnionMaximumSpanningForest.cpp:20-92)
# — edge (u,v,w) is in the UMSF iff its endpoints are disconnected in
# the strictly-heavier subgraph (the deferred-merge Kruskal the
# reference runs).  Synthetic 4-level weights on the contract graph;
# the oracle computes one recursive min-label reach per strictly-
# heavier subgraph (levels 3..1; level 4 tests against singletons).
# ---------------------------------------------------------------------------


def q_umsf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.spanning import (
        union_maximum_spanning_forest,
    )

    g = load_graph(spark, sf_dir)
    we = g.edges.select(
        "src", "dst",
        ((F.col("src") * 3 + F.col("dst")) % 4 + 1)
        .cast("double").alias("weight"),
    )
    gw = Graph(we, vertices=g.nodes(), directed=False, weighted=True)
    f, _ = union_maximum_spanning_forest(gw)
    return f.edges.select("src", "dst", "weight").orderBy("src", "dst")


def _umsf_sql() -> str:
    parts = [
        "we AS (SELECT src, dst, CAST((src * 3 + dst) % 4 + 1 AS DOUBLE)"
        " AS w FROM edges)",
        "wa AS (SELECT src, dst, w FROM we "
        "UNION ALL SELECT dst, src, w FROM we)",
    ]
    sel = ["SELECT src, dst, w AS weight FROM we WHERE w = 4"]
    for lv in (3, 2, 1):
        parts.append(
            f"""r{lv}(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM r{lv} r JOIN wa a ON a.src = r.id AND a.w > {lv}
  WHERE r.lbl < a.dst
),
l{lv} AS (SELECT id, MIN(lbl) AS lbl FROM r{lv} GROUP BY id)"""
        )
        sel.append(
            f"SELECT e.src, e.dst, e.w AS weight FROM we e "
            f"JOIN l{lv} a ON a.id = e.src JOIN l{lv} b ON b.id = e.dst "
            f"WHERE e.w = {lv} AND a.lbl <> b.lbl"
        )
    return (
        f"WITH RECURSIVE {GRAPH_CTES},\n"
        + ",\n".join(parts)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(sel)
        + "\n) t ORDER BY src, dst"
    )


SQL_UMSF = _umsf_sql()

# ---------------------------------------------------------------------------
# MatchingCoarsening (coarsening/MatchingCoarsening.cpp:17-56) —
# contract the Suitor matching of the synthetic-weight contract graph:
# consecutive coarse ids in fine-node order (unmatched nodes and lower
# matched endpoints), one weight contribution per fine edge, parallel
# coarse edges summed, intra-pair self-loops kept.  Oracle: the
# unrolled Suitor rounds (shared with graph_matching) + the contraction
# in plain SQL.  Fine weights are integers < 2^31 so the double sums
# are exact in any order.
# ---------------------------------------------------------------------------


def q_matching_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.coarsening import matching_coarsening
    from networkit_spark.operators.matching import suitor_matching

    g = load_graph(spark, sf_dir)
    we = g.edges.select(
        "src", "dst",
        (((F.col("src") * 1009 + F.col("dst")) * 2654435761) % 2147483648)
        .cast("double").alias("weight"),
    )
    gw = Graph(we, vertices=g.nodes(), directed=False, weighted=True)
    m, info = suitor_matching(gw, max_rounds=MATCH_ROUNDS)
    if not info.converged:
        raise AssertionError(
            f"suitor_matching did not converge in {MATCH_ROUNDS} rounds"
        )
    coarse, _mapping = matching_coarsening(gw, m)
    return coarse.edges.select("src", "dst", "weight").orderBy(
        "src", "dst"
    )


SQL_MATCHING_COARSEN = (
    _matching_prefix_sql()
    + """, reps AS (
  SELECT id FROM nodes
  WHERE NOT EXISTS (
    SELECT 1 FROM matching m WHERE GREATEST(m.src, m.dst) = id
  )
),
rk AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS cid
  FROM reps
),
mapping AS (
  SELECT id, cid FROM rk
  UNION ALL
  SELECT GREATEST(m.src, m.dst) AS id, r.cid
  FROM matching m JOIN rk r ON r.id = LEAST(m.src, m.dst)
),
fe AS (
  SELECT src, dst,
         CAST(((src * 1009 + dst) * 2654435761) % 2147483648 AS DOUBLE)
           AS w
  FROM edges
)
SELECT LEAST(a.cid, b.cid) AS src, GREATEST(a.cid, b.cid) AS dst,
       SUM(e.w) AS weight
FROM fe e JOIN mapping a ON a.id = e.src JOIN mapping b ON b.id = e.dst
GROUP BY 1, 2 ORDER BY src, dst"""
)

# ---------------------------------------------------------------------------
# Curveball trade generators + trade-sequence Curveball
# (randomization/Curveball.cpp, CurveballUniformTradeGenerator.cpp,
# CurveballGlobalTradeGenerator.cpp).  Gate 1 replays BOTH generators'
# md5 draws exactly in SQL.  Gate 2 runs curveball(g, uniform trades)
# and checks the reference's own gtest invariant cross-engine: the
# degree sequence is exactly preserved (the edge-set algebra itself is
# proven by the exact python-replica pytest, test_randomization_trades).
# ---------------------------------------------------------------------------

CBT_N = 40
CBT_UNIFORM = 30
CBT_GLOBAL_ROUNDS = 2
CBT_SEED = 9


def q_curveball_trade_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.randomization import (
        curveball_global_trades,
        curveball_uniform_trades,
    )

    uni = curveball_uniform_trades(
        spark, CBT_N, CBT_UNIFORM, seed=CBT_SEED
    ).select(F.lit("u").alias("kind"), "t", "u", "v")
    glo = curveball_global_trades(
        spark, CBT_N, CBT_GLOBAL_ROUNDS, seed=CBT_SEED
    ).select(F.lit("g").alias("kind"), "t", "u", "v")
    return uni.unionByName(glo).orderBy("kind", "t")


def _curveball_trade_gen_sql() -> str:
    hf = _md5_long13_sql(
        f"md5('cutg|{CBT_SEED}|f|' || CAST(t AS VARCHAR))"
    )
    hs = _md5_long13_sql(
        f"md5('cutg|{CBT_SEED}|s|' || CAST(t AS VARCHAR))"
    )
    half = CBT_N // 2
    runs = []
    for run in range(CBT_GLOBAL_ROUNDS):
        runs.append(
            f"""SELECT 'g' AS kind, CAST((rn // 2) + {run * half} AS BIGINT) AS t,
       MAX(CASE WHEN rn % 2 = 0 THEN id END) AS u,
       MAX(CASE WHEN rn % 2 = 1 THEN id END) AS v
FROM (
  SELECT id, ROW_NUMBER() OVER (
    ORDER BY md5('cgtg|{CBT_SEED}|{run}|' || CAST(id AS VARCHAR)), id
  ) - 1 AS rn
  FROM range({CBT_N}) g(id)
) WHERE rn < {2 * half}
GROUP BY rn // 2"""
        )
    return (
        f"""WITH uni AS (
  SELECT 'u' AS kind, t,
         ({hf}) % {CBT_N} AS u0,
         ({hs}) % {CBT_N - 1} AS s0
  FROM range({CBT_UNIFORM}) r(t)
)
SELECT kind, t, u, v FROM (
  SELECT kind, t, u0 AS u,
         s0 + CASE WHEN s0 >= u0 THEN 1 ELSE 0 END AS v
  FROM uni
  UNION ALL
"""
        + "\nUNION ALL\n".join(runs)
        + "\n) z ORDER BY kind, t"
    )


SQL_CURVEBALL_TRADE_GEN = _curveball_trade_gen_sql()


def q_curveball_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.randomization import (
        curveball,
        curveball_uniform_trades,
    )

    g = load_graph(spark, sf_dir)
    n = g.number_of_nodes()
    trades = curveball_uniform_trades(spark, n, 50, seed=CBT_SEED)
    out = curveball(g, trades, seed=CBT_SEED)
    return out.degrees().select("id", "degree").orderBy("id")


SQL_CURVEBALL_RUN = f"""
WITH {GRAPH_CTES}
SELECT id, degree FROM deg ORDER BY id
"""

# ---------------------------------------------------------------------------
# SpectralColoring (networkit/coloring.py:6-140 + algebraic.py:139-330)
# — rows-only gate (an eigendecomposition is not SQL-expressible; the
# validity invariant — no monochromatic edge — and the dense/power
# parity are pinned by tests/test_spectral.py).  The driver row checks
# one (id, color) row per contract-graph node.
# ---------------------------------------------------------------------------


def q_spectral_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.spectral import spectral_coloring

    g = load_graph(spark, sf_dir)
    col, _nc = spectral_coloring(g)
    return col.orderBy("id")


# ---------------------------------------------------------------------------
# Algebraic module (networkit/algebraic.py:40-137 adjacencyMatrix /
# laplacianMatrix / PageRankMatrix; networkit/cpp/algebraic/ matrix
# arithmetic) — one gate exercising every COO op: construction,
# mat_add/mat_scale (inside pagerank_matrix), mat_transpose, spmv, spmm.
# Deterministic symmetric weight overlay w(e) = ((lo*13 + hi*7) % 19
# + 1)/4 and probe vector x_j = ((j*37 + 11) % 97)/97 make every
# column a full-value check:
#   lap_x = (L x)_i        a2x = ((A A) x)_i
#   px    = (P x)_i        ptx = (P^T x)_i
# ---------------------------------------------------------------------------

ALGEBRA_DAMP = 0.85


def q_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.graph import Graph
    from networkit_spark.operators.algebra import (
        adjacency_matrix,
        laplacian_matrix,
        mat_transpose,
        pagerank_matrix,
        spmm,
        spmv,
    )

    g = load_graph(spark, sf_dir)
    wedges = g.edges.select(
        "src", "dst",
        (((F.col("src") * 13 + F.col("dst") * 7) % 19 + 1).cast("double")
         / 4.0).alias("weight"),
    )
    gw = Graph(edges=wedges, vertices=None, directed=False, weighted=True)
    x = g.nodes().select(
        F.col("id").cast("long").alias("j"),
        (((F.col("id") * 37 + 11) % 97).cast("double") / 97.0).alias("v"),
    )
    a = adjacency_matrix(gw).localCheckpoint(eager=True)
    lap_x = spmv(laplacian_matrix(gw), x)
    a2x = spmv(spmm(a, a), x)
    p = pagerank_matrix(gw, damp=ALGEBRA_DAMP).localCheckpoint(eager=True)
    px = spmv(p, x)
    ptx = spmv(mat_transpose(p), x)

    def col(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.col("i").alias("id"), F.col("v").alias(name))

    out = g.nodes().select(F.col("id").cast("long").alias("id"))
    for df, name in ((lap_x, "lap_x"), (a2x, "a2x"), (px, "px"),
                     (ptx, "ptx")):
        out = out.join(col(df, name), "id", "left")
    return out.select(
        "id",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 6).alias(c)
          for c in ("lap_x", "a2x", "px", "ptx")],
    ).orderBy("id")


SQL_ALGEBRA = f"""
WITH {GRAPH_CTES},
wadj AS (
  SELECT src AS i, dst AS j,
         CAST((LEAST(src, dst) * 13 + GREATEST(src, dst) * 7) % 19 + 1
              AS DOUBLE) / 4 AS v
  FROM adj
),
xv AS (
  SELECT id AS j, CAST((id * 37 + 11) % 97 AS DOUBLE) / 97.0 AS v
  FROM nodes
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
wdeg AS (SELECT i, SUM(v) AS wd FROM wadj GROUP BY i),
lapx AS (
  SELECT w.i,
         MAX(d.wd) * MAX(x0.v) - SUM(w.v * x.v) AS v
  FROM wadj w
  JOIN wdeg d ON d.i = w.i
  JOIN xv x ON x.j = w.j
  JOIN xv x0 ON x0.j = w.i
  GROUP BY w.i
),
a2x AS (
  SELECT a.i, SUM(a.v * b.v * x.v) AS v
  FROM wadj a JOIN wadj b ON b.i = a.j JOIN xv x ON x.j = b.j
  GROUP BY a.i
),
px AS (
  SELECT w.i,
         {ALGEBRA_DAMP} * SUM(w.v * x.v / d.degree)
           + (1 - {ALGEBRA_DAMP}) / MAX(n.n) * MAX(x0.v) AS v
  FROM wadj w
  JOIN deg d ON d.id = w.j
  JOIN xv x ON x.j = w.j
  JOIN xv x0 ON x0.j = w.i
  CROSS JOIN nn n
  GROUP BY w.i
),
ptx AS (
  SELECT w.i,
         {ALGEBRA_DAMP} / MAX(d.degree) * SUM(w.v * x.v)
           + (1 - {ALGEBRA_DAMP}) / MAX(n.n) * MAX(x0.v) AS v
  FROM wadj w
  JOIN deg d ON d.id = w.i
  JOIN xv x ON x.j = w.j
  JOIN xv x0 ON x0.j = w.i
  CROSS JOIN nn n
  GROUP BY w.i
)
SELECT n0.id,
       ROUND(COALESCE(l.v, 0), 6) AS lap_x,
       ROUND(COALESCE(a.v, 0), 6) AS a2x,
       ROUND(COALESCE(p.v, 0), 6) AS px,
       ROUND(COALESCE(t.v, 0), 6) AS ptx
FROM nodes n0
LEFT JOIN lapx l ON l.i = n0.id
LEFT JOIN a2x a ON a.i = n0.id
LEFT JOIN px p ON p.i = n0.id
LEFT JOIN ptx t ON t.i = n0.id
ORDER BY n0.id
"""


# ---------------------------------------------------------------------------
# Profiling module (networkit/profiling/profiling.py Profile:
# __loadProperties :1039-1097 + per-measure stat rows) — the gate runs
# the degree measure + connected-components partition and checks every
# scalar the profile reports: size/density properties, the stat.py
# location/dispersion set, Freeman centralization, score assortativity,
# and the partition subset-size stats.
# ---------------------------------------------------------------------------


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.profiling import profile

    g = load_graph(spark, sf_dir)
    p = profile(g, measures=("degree",), with_components=True)
    props, deg, comp = p["properties"], p["measures"][0], p["partitions"][0]
    row = (
        int(props["nodes"]), int(props["edges"]),
        round(props["density"], 6),
        round(deg["min"], 6), round(deg["max"], 6),
        round(deg["mean"], 6), round(deg["median"], 6),
        round(deg["stddev"], 6), round(deg["centralization"], 6),
        round(deg["assortativity"], 6),
        int(comp["count"]), int(comp["max_size"]),
        round(comp["mean_size"], 6),
    )
    return spark.createDataFrame(
        [row],
        "nodes long, edges long, density double, deg_min double, "
        "deg_max double, deg_mean double, deg_median double, "
        "deg_std double, deg_centralization double, deg_assort double, "
        "ncomp long, largest_comp long, mean_comp double",
    )


SQL_PROFILE = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
comp AS (SELECT id, MIN(lbl) AS label FROM reach GROUP BY id),
csz AS (SELECT label, COUNT(*) AS sz FROM comp GROUP BY label),
dstats AS (
  SELECT COUNT(*) AS n, MIN(degree) AS mn, MAX(degree) AS mx,
         AVG(degree) AS mean, quantile_cont(degree, 0.5) AS med,
         stddev_pop(degree) AS sd,
         CAST(SUM(degree) AS DOUBLE) AS s
  FROM deg
),
ea AS (
  SELECT CAST(du.degree AS DOUBLE) AS x, CAST(dv.degree AS DOUBLE) AS y
  FROM edges e
  JOIN deg du ON du.id = e.src
  JOIN deg dv ON dv.id = e.dst
),
ast AS (
  SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM ea
)
SELECT
  d.n AS nodes,
  (SELECT COUNT(*) FROM edges) AS edges,
  ROUND((SELECT COUNT(*) FROM edges) / (d.n * (d.n - 1) / 2.0), 6)
    AS density,
  ROUND(CAST(d.mn AS DOUBLE), 6) AS deg_min,
  ROUND(CAST(d.mx AS DOUBLE), 6) AS deg_max,
  ROUND(d.mean, 6) AS deg_mean,
  ROUND(d.med, 6) AS deg_median,
  ROUND(d.sd, 6) AS deg_std,
  ROUND((d.n * d.mx - d.s) / ((d.n - 1) * CAST(d.mx AS DOUBLE)), 6)
    AS deg_centralization,
  ROUND((a.sxy - a.sx * a.sy / a.m)
        / SQRT((a.sxx - a.sx * a.sx / a.m) * (a.syy - a.sy * a.sy / a.m)),
        6) AS deg_assort,
  (SELECT COUNT(*) FROM csz) AS ncomp,
  (SELECT MAX(sz) FROM csz) AS largest_comp,
  ROUND((SELECT AVG(sz) FROM csz), 6) AS mean_comp
FROM dstats d CROSS JOIN ast a
"""


# ---------------------------------------------------------------------------
# Traversal module (traversal.pyx BFSfrom/BFSEdgesFrom wrapping
# graph/BFS.hpp:20-77) — single-source BFS visit relation: dist, the
# 0-indexed visit rank under the canonical (dist, id) order, and the
# min-discoverer tree parent (source gets parent -1).  DFSfrom /
# DFSEdgesFrom are the driver-side stack replay (operators/traversal);
# a data-dependent-length stack automaton is not SQL-expressible, so
# DFS is pinned by the python-replica pytest instead of a gate.
# ---------------------------------------------------------------------------

TRAVERSAL_SOURCE = 0
TRAVERSAL_HOPS = 24


def q_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.traversal import bfs_edges_from, bfs_from

    g = load_graph(spark, sf_dir)
    order = bfs_from(g, TRAVERSAL_SOURCE, max_hops=TRAVERSAL_HOPS)
    tree = bfs_edges_from(g, TRAVERSAL_SOURCE, max_hops=TRAVERSAL_HOPS)
    return (
        order.join(
            tree.select(F.col("dst").alias("id"),
                        F.col("src").alias("parent")),
            "id", "left",
        )
        .select(
            "id", "dist", "ord",
            F.coalesce("parent", F.lit(-1)).alias("parent"),
        )
        .orderBy("id")
    )


def _traversal_sql(hops: int = TRAVERSAL_HOPS,
                   source: int = TRAVERSAL_SOURCE) -> str:
    steps = [
        f"d0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS id, "
        f"CAST(0 AS BIGINT) AS dist)"
    ]
    for i in range(1, hops + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT COALESCE(p.id, m.id) AS id,
         CAST(LEAST(COALESCE(p.dist, 9223372036854775807),
                    COALESCE(m.nd, 9223372036854775807)) AS BIGINT) AS dist
  FROM d{i - 1} p FULL OUTER JOIN (
    SELECT a.dst AS id, MIN(q.dist + 1) AS nd
    FROM adj a JOIN d{i - 1} q ON q.id = a.src GROUP BY a.dst
  ) m ON m.id = p.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f""",
dd AS (SELECT id, dist FROM d{hops}),
ranked AS (
  SELECT id, dist,
         ROW_NUMBER() OVER (ORDER BY dist, id) - 1 AS ord
  FROM dd
),
par AS (
  SELECT c.id, MIN(a.src) AS parent
  FROM dd c
  JOIN adj a ON a.dst = c.id
  JOIN dd p ON p.id = a.src AND p.dist + 1 = c.dist
  GROUP BY c.id
)
SELECT r.id, r.dist, r.ord, COALESCE(p.parent, -1) AS parent
FROM ranked r LEFT JOIN par p ON p.id = r.id
ORDER BY r.id"""
    )


SQL_TRAVERSAL = _traversal_sql()


# ---------------------------------------------------------------------------
# Stats module (networkit/stats.pyx gini :16-38) — Gini coefficient of
# the degree distribution; rank-sum formula is tie-order invariant, so
# the distributed bucketed rank and the oracle's ROW_NUMBER agree
# exactly.
# ---------------------------------------------------------------------------


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.stats import gini

    g = load_graph(spark, sf_dir)
    val = gini(g.degrees().select(F.col("degree").alias("value")))
    return spark.createDataFrame(
        [(round(val, 6),)], "gini double"
    )


SQL_GINI = f"""
WITH {GRAPH_CTES},
r AS (
  SELECT CAST(degree AS DOUBLE) AS x,
         ROW_NUMBER() OVER (ORDER BY degree) AS i
  FROM deg
)
SELECT ROUND(
  (2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x)) / (COUNT(*) * SUM(x)), 6
) AS gini
FROM r
"""
