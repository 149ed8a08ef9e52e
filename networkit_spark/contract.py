"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Every query here derives its input deterministically from the driver's
parquet tables (TESTDATA.md) using only arithmetic/functions that are
bit-identical across Spark SQL and DuckDB (integer modulo, md5,
least/greatest, IEEE double ops with terminal rounding), so the
order-insensitive value-hash comparison is exact.

The link graph for kernel queries is synthesized from ``orders`` by
three affine generators over Z_997 (k -> 31k+7 for all orders, k ->
57k+13 for even keys, 17k+3 -> 43k+11 for keys divisible by 3),
undirected-canonicalized, deduped, self-loops dropped — a 997-node
graph with degree spread (2..6 at sf0.001, denser at larger sf), the
same construction at every sf. A single generator would make the graph
2-regular and every degree-sensitive kernel's oracle vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

N_MOD = 997
DAMP = 0.85
PR_ITERS = 10
PLP_ITERS = 2

# ---------------------------------------------------------------------------
# shared CTE prelude (DuckDB side)
# ---------------------------------------------------------------------------

GRAPH_CTES = f"""
base AS (
  SELECT DISTINCT (o_orderkey % {N_MOD}) AS u,
                  ((o_orderkey * 31 + 7) % {N_MOD}) AS v
  FROM orders
  UNION
  SELECT DISTINCT (o_orderkey % {N_MOD}) AS u,
                  ((o_orderkey * 57 + 13) % {N_MOD}) AS v
  FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT DISTINCT ((o_orderkey * 17 + 3) % {N_MOD}) AS u,
                  ((o_orderkey * 43 + 11) % {N_MOD}) AS v
  FROM orders WHERE o_orderkey % 3 = 0
),
edges AS (
  SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst
  FROM base WHERE u <> v
),
adj AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS id FROM adj),
deg AS (SELECT src AS id, COUNT(*) AS degree FROM adj GROUP BY src)
""".strip()


def load_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Spark-side construction, expression-for-expression the same as
    GRAPH_CTES."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    base = (
        orders.select((k % N_MOD).alias("u"), ((k * 31 + 7) % N_MOD).alias("v"))
        .unionByName(
            orders.filter(k % 2 == 0).select(
                (k % N_MOD).alias("u"), ((k * 57 + 13) % N_MOD).alias("v")
            )
        )
        .unionByName(
            orders.filter(k % 3 == 0).select(
                ((k * 17 + 3) % N_MOD).alias("u"),
                ((k * 43 + 11) % N_MOD).alias("v"),
            )
        )
        .distinct()
    )
    edges = (
        base.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=edges, vertices=None, directed=False, weighted=False)


# ---------------------------------------------------------------------------
# graph kernel queries
# ---------------------------------------------------------------------------

def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return g.degrees().select("id", "degree").orderBy("id")


SQL_DEGREE = f"WITH {GRAPH_CTES} SELECT id, degree FROM deg ORDER BY id"


def q_top_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    return (
        g.degrees()
        .select("id", "degree")
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(20)
    )


SQL_TOP_DEGREE = (
    f"WITH {GRAPH_CTES} SELECT id, degree FROM deg "
    "ORDER BY degree DESC, id ASC LIMIT 20"
)


def q_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = load_graph(spark, sf_dir)
    n = g.nodes().count()
    m = g.edges.count()
    mx = g.degrees().agg(F.max("degree")).collect()[0][0]
    return spark.createDataFrame(
        [(n, m, int(mx))], "n_nodes long, n_edges long, max_degree long"
    ).select(
        "n_nodes",
        "n_edges",
        "max_degree",
        # F.round (half-up) matches DuckDB ROUND; Python round() is
        # banker's rounding and must not be used for oracle-compared values
        F.round(F.lit(m / (n * (n - 1) / 2.0)), 6).alias("density"),
    )


SQL_SCALARS = f"""
WITH {GRAPH_CTES}
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT MAX(degree) FROM deg) AS max_degree,
       ROUND((SELECT COUNT(*) FROM edges) /
             ((SELECT COUNT(*) FROM nodes) *
              ((SELECT COUNT(*) FROM nodes) - 1) / 2.0), 6) AS density
"""


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.components import connected_components

    g = load_graph(spark, sf_dir)
    labels, _ = connected_components(g)
    return labels.orderBy("id")


SQL_CC = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
)
SELECT id, MIN(lbl) AS label FROM reach GROUP BY id ORDER BY id
"""


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.components import (
        component_sizes,
        connected_components,
    )

    g = load_graph(spark, sf_dir)
    labels, _ = connected_components(g)
    return component_sizes(labels).orderBy("label")


SQL_CC_SIZES = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
cc AS (SELECT id, MIN(lbl) AS label FROM reach GROUP BY id)
SELECT label, COUNT(*) AS size FROM cc GROUP BY label ORDER BY label
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.pagerank import pagerank

    g = load_graph(spark, sf_dir)
    res = pagerank(g, damp=DAMP, tol=0.0, max_iterations=PR_ITERS, unroll=5)
    return res.scores.select("id", F.round("score", 6).alias("score")).orderBy("id")


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    steps = []
    steps.append(
        "pr0 AS (SELECT id, 1.0 / (SELECT COUNT(*) FROM nodes) AS score FROM nodes)"
    )
    for i in range(1, iters + 1):
        steps.append(
            f"""pr{i} AS (
  SELECT n.id,
         (1.0 - {DAMP}) / (SELECT COUNT(*) FROM nodes)
         + {DAMP} * COALESCE(m.mass, 0.0) AS score
  FROM nodes n LEFT JOIN (
    SELECT a.dst AS id, SUM(p.score * (1.0 / d.degree)) AS mass
    FROM adj a
    JOIN pr{i - 1} p ON p.id = a.src
    JOIN deg d ON d.id = a.src
    GROUP BY a.dst
  ) m ON m.id = n.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(score, 6) AS score FROM pr{iters} ORDER BY id"
    )


SQL_PAGERANK = _pagerank_sql()


def q_plp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.plp import plp

    g = load_graph(spark, sf_dir)
    labels, _ = plp(g, max_iterations=PLP_ITERS, theta=0)
    return labels.orderBy("id")


def _plp_sql(iters: int = PLP_ITERS) -> str:
    steps = ["lab0 AS (SELECT id, id AS label FROM nodes)"]
    for i in range(1, iters + 1):
        steps.append(
            f"""w{i} AS (
  SELECT a.src AS id, l.label AS nlabel, COUNT(*) AS w
  FROM adj a JOIN lab{i - 1} l ON l.id = a.dst
  GROUP BY a.src, l.label
),
best{i} AS (
  SELECT id, nlabel FROM (
    SELECT id, nlabel,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY w DESC, nlabel ASC) AS rn
    FROM w{i}
  ) t WHERE rn = 1
),
lab{i} AS (
  SELECT l.id, COALESCE(b.nlabel, l.label) AS label
  FROM lab{i - 1} l LEFT JOIN best{i} b ON b.id = l.id
)"""
        )
    return (
        f"WITH {GRAPH_CTES},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, label FROM lab{iters} ORDER BY id"
    )


SQL_PLP = _plp_sql()


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import triangle_counts

    g = load_graph(spark, sf_dir)
    return triangle_counts(g).orderBy("id")


SQL_TRIANGLES = f"""
WITH {GRAPH_CTES},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
SELECT n.id, COALESCE(c.triangles, 0) AS triangles
FROM nodes n LEFT JOIN cnt c ON c.id = n.id ORDER BY n.id
"""


def q_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import local_clustering_coefficient

    g = load_graph(spark, sf_dir)
    return (
        local_clustering_coefficient(g)
        .select("id", F.round("lcc", 6).alias("lcc"))
        .orderBy("id")
    )


SQL_LCC = f"""
WITH {GRAPH_CTES},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
SELECT n.id,
       ROUND(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(c.triangles, 0) / (d.degree * (d.degree - 1))
             ELSE 0.0 END, 6) AS lcc
FROM nodes n
JOIN deg d ON d.id = n.id
LEFT JOIN cnt c ON c.id = n.id
ORDER BY n.id
"""


def q_coarsen_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotient-graph edge weights over the CC partition (all intra, so
    this doubles as a weighted-coarsening check: one self-edge per
    component carrying its edge count)."""
    from networkit_spark.operators.coarsening import coarsen
    from networkit_spark.operators.components import connected_components

    g = load_graph(spark, sf_dir)
    labels, _ = connected_components(g)
    # compact=True: exercises the partitioned dense renumbering
    # (plans/ids.py) against the oracle's ROW_NUMBER OVER (ORDER BY label)
    coarse, _ = coarsen(g, labels, compact=True)
    return coarse.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    ).orderBy("src", "dst")


SQL_COARSEN_CC = f"""
WITH RECURSIVE {GRAPH_CTES},
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT a.dst AS id, r.lbl
  FROM reach r JOIN adj a ON a.src = r.id
  WHERE r.lbl < a.dst
),
cc AS (SELECT id, MIN(lbl) AS label FROM reach GROUP BY id),
compacted AS (
  SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY label) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT label FROM cc) t
),
mapping AS (SELECT cc.id, c.cid FROM cc JOIN compacted c ON c.label = cc.label)
SELECT LEAST(ms.cid, md.cid) AS src, GREATEST(ms.cid, md.cid) AS dst,
       CAST(COUNT(*) AS DOUBLE) AS weight
FROM edges e
JOIN mapping ms ON ms.id = e.src
JOIN mapping md ON md.id = e.dst
GROUP BY 1, 2 ORDER BY 1, 2
"""
