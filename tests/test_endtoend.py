"""Minimum end-to-end slice (SURVEY.md §7.4): synthetic crawl ->
extraction -> graph -> PageRank -> ranking, validated against the
numpy oracle through the url<->id mapping."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.operators.pagerank import pagerank
from networkit_spark.sources.extraction import pages_to_graph
from networkit_spark.sources.pages import gen_pages_pdf, gen_webgraph_edges, url_of
from tests.fixtures import numpy_pagerank


def test_top10_pages_by_pagerank(spark):
    n = 200
    raw = gen_webgraph_edges(n, 800, seed=7)
    edges = sorted({(int(u), int(v)) for u, v in raw if u != v})
    pages = spark.createDataFrame(gen_pages_pdf(edges, n))

    g, url_ids = pages_to_graph(pages)
    assert g.number_of_nodes() == n
    assert g.number_of_edges() == len(edges)

    res = pagerank(g, max_iterations=25, distribute_sinks="distribute_sinks")
    top = res.ranking(10).collect()

    # oracle on the ORIGINAL node numbering, mapped through url ids
    id_of = {r["url"]: r["id"] for r in url_ids.collect()}
    remap = {u: id_of[url_of(u)] for u in range(n)}
    oracle_scores, _ = numpy_pagerank(
        n, edges, directed=True, distribute_sinks=True, max_iterations=25
    )
    spark_scores = {r["id"]: r["score"] for r in res.scores.collect()}
    for u in range(n):
        assert abs(spark_scores[remap[u]] - oracle_scores[u]) < 1e-9

    want_top = sorted(
        range(n), key=lambda u: (-oracle_scores[u], remap[u])
    )
    got_ids = [r["id"] for r in top]
    # compare as score-sets (remapped ids may tie-break differently than
    # original numbering when scores are exactly equal)
    got_scores = [round(r["score"], 9) for r in top]
    want_scores = sorted((round(float(s), 9) for s in oracle_scores), reverse=True)[:10]
    assert got_scores == want_scores
    assert set(got_ids) <= {remap[u] for u in want_top[:20]}


def test_lfr_generator_properties(spark):
    """LFR-style benchmark (generators/LFRGenerator.cpp analogue):
    ground-truth communities respect the size floor, the realized
    mixing fraction tracks mu, and degrees spread (power law)."""
    from pyspark.sql import functions as F

    from networkit_spark.sources.generators import lfr_graph

    g, comms = lfr_graph(spark, n=600, avg_degree=12.0, mu=0.2, seed=7)
    sizes = [r["size"] for r in comms.groupBy("label").count()
             .withColumnRenamed("count", "size").collect()]
    assert sum(sizes) == 600
    assert min(sizes) >= 2 and len(sizes) >= 3

    lab = comms.select(F.col("id").alias("src"), F.col("label").alias("cu"))
    lab2 = comms.select(F.col("id").alias("dst"), F.col("label").alias("cv"))
    e = g.edges.join(lab, "src").join(lab2, "dst")
    m = e.count()
    inter = e.filter(F.col("cu") != F.col("cv")).count()
    assert m > 600  # avg degree well above 2
    # realized mixing within a loose band around mu
    assert 0.05 < inter / m < 0.45

    degs = [r["degree"] for r in g.degrees().collect()]
    assert max(degs) >= 3 * (sum(degs) / len(degs)) / 2  # heavy tail exists

    # determinism: same seed -> identical edge set
    g2, _ = lfr_graph(spark, n=600, avg_degree=12.0, mu=0.2, seed=7)
    assert g.edges.exceptAll(g2.edges).count() == 0
    assert g2.edges.exceptAll(g.edges).count() == 0


def test_lfr_exponent_one_and_tiny_n(spark):
    """Round-3 ADVICE edge cases: exponent 1.0 (a == 0 in the inverse
    CDF) must use the log-form instead of dividing by zero, and
    n < min_community must still yield a valid single community."""
    from networkit_spark.sources.generators import lfr_graph

    g, comms = lfr_graph(
        spark, n=120, avg_degree=6.0, degree_exp=1.0, community_exp=1.0, seed=3
    )
    assert comms.count() == 120
    assert g.edges.count() > 0

    g2, comms2 = lfr_graph(spark, n=3, avg_degree=2.0, seed=3)
    sizes = [r["count"] for r in comms2.groupBy("label").count().collect()]
    assert sum(sizes) == 3 and all(s >= 1 for s in sizes)
