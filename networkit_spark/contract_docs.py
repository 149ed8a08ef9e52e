"""Driver-contract queries over documents / embeddings / events.

Cross-engine determinism rules (see contract.py): md5 for hashing,
``strpos('0123456789abcdef', ...)`` for hex nibbles, terminal ROUND(.., 6)
on every double, explicit tie-breaks on every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.functions import dedup, similarity, textfns

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_duplicates(docs).select("doc_id", "keep_id").orderBy("doc_id")


SQL_DEDUP_EXACT = """
WITH h AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
k AS (SELECT text_hash, MIN(doc_id) AS keep_id FROM h GROUP BY text_hash)
SELECT h.doc_id, k.keep_id FROM h JOIN k ON k.text_hash = h.text_hash
ORDER BY h.doc_id
"""


_SHINGLE_SQL = """
tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> array_to_string(toks[i:i+2], ' ')))
         ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM tok
)
""".strip()


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = dedup.minhash_signatures(docs, num_perm=4)
    return sig.select(
        "doc_id",
        *[F.col("sig").getItem(i).alias(f"h{i}") for i in range(4)],
    ).orderBy("doc_id")


SQL_MINHASH_SIG = f"""
WITH {_SHINGLE_SQL}
SELECT doc_id,
       list_min(list_transform(shingles, s -> md5('0|' || s))) AS h0,
       list_min(list_transform(shingles, s -> md5('1|' || s))) AS h1,
       list_min(list_transform(shingles, s -> md5('2|' || s))) AS h2,
       list_min(list_transform(shingles, s -> md5('3|' || s))) AS h3
FROM sh ORDER BY doc_id
"""


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        dedup.minhash_lsh_candidates(docs, num_perm=4, bands=2)
        .orderBy("a", "b")
    )


SQL_MINHASH_CANDIDATES = f"""
WITH {_SHINGLE_SQL},
sig AS (
  SELECT doc_id,
         list_min(list_transform(shingles, s -> md5('0|' || s))) AS h0,
         list_min(list_transform(shingles, s -> md5('1|' || s))) AS h1,
         list_min(list_transform(shingles, s -> md5('2|' || s))) AS h2,
         list_min(list_transform(shingles, s -> md5('3|' || s))) AS h3
  FROM sh
),
buckets AS (
  SELECT doc_id, 0 AS band, h0 || '|' || h1 AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, h2 || '|' || h3 AS bucket FROM sig
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM buckets x JOIN buckets y
  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
ORDER BY a, b
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5).orderBy("a", "b")


SQL_JACCARD_PAIRS = f"""
WITH {_SHINGLE_SQL},
inv AS (SELECT doc_id AS doc, unnest(shingles) AS s FROM sh),
sz AS (SELECT doc_id AS doc, len(shingles) AS sz FROM sh),
pairs AS (
  SELECT x.doc AS a, y.doc AS b, COUNT(*) AS inter
  FROM inv x JOIN inv y ON x.s = y.s AND x.doc < y.doc
  GROUP BY x.doc, y.doc
)
SELECT a, b,
       ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM pairs
JOIN sz sa ON sa.doc = a
JOIN sz sb ON sb.doc = b
WHERE ROUND(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textfns.token_count(docs).select("doc_id", "n_tokens").orderBy("doc_id")


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{textfns.TOKEN_REGEX}')) AS n_tokens
FROM documents ORDER BY doc_id
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textfns.quality_score(docs).select(
        "doc_id",
        F.col("n_chars_q").cast("long").alias("n_chars_q"),
        "alpha_ratio",
        "punct_ratio",
        "quality",
    ).orderBy("doc_id")


_EN = "','".join(textfns._EN_STOP)
SQL_QUALITY = f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_q,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         regexp_extract_all(lower(text), '[a-z]+') AS toks
  FROM documents
),
r AS (
  SELECT doc_id, n_chars_q,
         CASE WHEN n_chars_q > 0 THEN CAST(alpha AS DOUBLE) / n_chars_q ELSE 0.0 END AS ar,
         CASE WHEN n_chars_q > 0 THEN CAST(punct AS DOUBLE) / n_chars_q ELSE 0.0 END AS pr,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, t -> list_contains(['{_EN}'], t))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS sr
  FROM f
)
SELECT doc_id, n_chars_q,
       ROUND(ar, 6) AS alpha_ratio,
       ROUND(pr, 6) AS punct_ratio,
       ROUND(LEAST(n_chars_q / 1000.0, 1.0) * 0.25
             + ar * 0.35
             + GREATEST(0.0, 1.0 - pr * 10.0) * 0.2
             + LEAST(sr * 5.0, 1.0) * 0.2, 6) AS quality
FROM r ORDER BY doc_id
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        textfns.language_id(docs)
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


def _ratio_sql(words: list[str]) -> str:
    lst = "','".join(words)
    return (
        "CASE WHEN len(toks) > 0 THEN "
        f"CAST(len(list_filter(toks, t -> list_contains(['{lst}'], t))) AS DOUBLE)"
        " / len(toks) ELSE 0.0 END"
    )


SQL_LANGID = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents
),
s AS (
  SELECT doc_id,
         {_ratio_sql(textfns._EN_STOP)} AS s_en,
         {_ratio_sql(textfns._DE_STOP)} AS s_de,
         {_ratio_sql(textfns._FR_STOP)} AS s_fr,
         {_ratio_sql(textfns._ES_STOP)} AS s_es
  FROM t
),
p AS (
  SELECT doc_id,
         CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
              WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM s
)
SELECT lang_pred, COUNT(*) AS n_docs FROM p GROUP BY lang_pred ORDER BY lang_pred
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textfns.fingerprint(docs).select("doc_id", "fp").orderBy("doc_id")


SQL_FINGERPRINT = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{textfns.TOKEN_REGEX}') AS toks
  FROM documents
)
SELECT doc_id,
       COALESCE(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(toks, s ->
             CAST(length(s) * 1000003
                  + ascii(substr(s, 1, 1)) * 257
                  + ascii(substr(s, -1, 1)) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 2147483647
       ), 0) AS fp
FROM t ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# similarity (embeddings)
# ---------------------------------------------------------------------------

def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_pairs(emb, threshold=0.3).orderBy("a", "b")


SQL_COSINE_PAIRS = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
norms AS (
  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id
),
dots AS (
  SELECT p.vec_id AS a, q.vec_id AS b, SUM(p.x * q.x) AS dot
  FROM ex p JOIN ex q ON p.i = q.i AND p.vec_id < q.vec_id
  GROUP BY p.vec_id, q.vec_id
)
SELECT a, b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.vec_id = a
JOIN norms nb ON nb.vec_id = b
WHERE na.nrm > 0 AND nb.nrm > 0
  AND ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.3
ORDER BY a, b
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 50
    )
    return similarity.cosine_topk(emb, emb, k=3).orderBy("query_id", "rank")


SQL_COSINE_TOPK = """
WITH sub AS (SELECT * FROM embeddings WHERE vec_id < 50),
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM sub
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT p.vec_id AS qid, q.vec_id AS nid, SUM(p.x * q.x) AS dot
  FROM ex p JOIN ex q ON p.i = q.i AND p.vec_id <> q.vec_id
  GROUP BY p.vec_id, q.vec_id
),
scored AS (
  SELECT qid, nid, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = qid
  JOIN norms nb ON nb.vec_id = nid
  WHERE na.nrm > 0 AND nb.nrm > 0
),
ranked AS (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid AS query_id, nid AS neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# events (OLAP breadth)
# ---------------------------------------------------------------------------

def q_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_AGG = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_top_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.round("value", 4).alias("value"))
        .filter(F.col("user_id") < 100)
        .orderBy("user_id")
    )


SQL_EVENTS_TOP_PER_USER = """
SELECT user_id, event_id, ROUND(value, 4) AS value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) t WHERE rn = 1 AND user_id < 100 ORDER BY user_id
"""
