from networkit_spark.sources.extraction import extract_links, extract_page
from networkit_spark.sources.pages import gen_pages_pdf, gen_webgraph_edges, write_pages

__all__ = [
    "extract_links",
    "extract_page",
    "gen_pages_pdf",
    "gen_webgraph_edges",
    "write_pages",
]
