from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import (
    number_of_components,
    weakly_connected_components,
)
from networkit_spark.sources.extraction import (
    assign_ids,
    extract_links,
    extract_page,
    pages_to_graph,
)
from networkit_spark.sources.pages import gen_pages_pdf, url_of
from tests.fixtures import CC_EDGES, CC_N


def test_extraction_byte_identity(spark):
    """north_star per-row invariant: pandas-UDF extraction output is
    byte-identical per url to the single-process oracle."""
    pdf = gen_pages_pdf(CC_EDGES, CC_N)
    pages = spark.createDataFrame(pdf)
    got = {r["url"]: r["text"] for r in extract_links(pages).collect()}
    # independent driver-side oracle loop over the same html bytes
    for _, row in pdf.iterrows():
        text, _ = extract_page(bytes(row["html"]))
        assert got[row["url"]] == text, row["url"]
        assert got[row["url"]].encode("utf-8") == text.encode("utf-8")


def test_extraction_recovers_graph(spark):
    """Known-edge fixture round-trips: html anchors -> edge table with
    the intended structure (as a partition — ids are url-sorted)."""
    pdf = gen_pages_pdf(CC_EDGES, CC_N)
    pages = spark.createDataFrame(pdf)
    g, url_ids = pages_to_graph(pages)
    assert g.number_of_nodes() == CC_N
    assert g.number_of_edges() == len(CC_EDGES)
    labels, _ = weakly_connected_components(g)
    assert number_of_components(labels) == 5
    # exact edge recovery through the url->id mapping
    id_of = {r["url"]: r["id"] for r in url_ids.collect()}
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    want = {(id_of[url_of(u)], id_of[url_of(v)]) for u, v in CC_EDGES}
    assert got == want


def test_assign_ids_dense_deterministic(spark):
    urls = spark.createDataFrame(
        [(u,) for u in ["b://x", "a://y", "c://z", "a://y"]], "url string"
    )
    m = {r["url"]: r["id"] for r in assign_ids(urls).collect()}
    assert m == {"a://y": 0, "b://x": 1, "c://z": 2}


def test_extraction_column_pruning(spark, tmp_path):
    """The extraction scan must read only (url, html) — ReadSchema check."""
    pdf = gen_pages_pdf([(0, 1)], 2)
    p = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    pages = spark.read.parquet(p)
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[1][:200]
    assert "warc_ts" not in plan.split("ReadSchema")[1][:200]
