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
