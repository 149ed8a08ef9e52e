"""Link/text extraction from the ``pages`` table.

The reference consumes ready-made edge lists (networkit/cpp/io/
EdgeListReader.cpp); the engine's web-scale front door instead ingests a
Common-Crawl-style table ``pages(url string, warc_ts timestamp, html
binary, text string, lang string)`` and derives the edge DataFrame.

Contract (BASELINE.json input_hint): extraction runs as vectorized
Arrow/pandas UDFs — ``mapInPandas`` over the html column, batched via
Arrow, never a row-at-a-time Spark UDF — and the extracted text is
BYTE-IDENTICAL per url to the single-process oracle
(:func:`extract_page`, pure stdlib, deterministic).

At 10^12-document scale the html column dominates I/O; the extraction
plan reads ONLY (url, html) thanks to column pruning (verify via
``.explain`` ReadSchema), emits (url, text, links) and is immediately
followed by the id-assignment joins, after which html bytes never move
again.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


class _Extractor(HTMLParser):
    """Deterministic href + text extractor (stdlib only, no network).

    Text rule (byte-stable): concatenate text nodes outside
    script/style, strip each fragment, join non-empty fragments with a
    single "\\n".
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.fragments: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            frag = data.strip()
            if frag:
                self.fragments.append(frag)


def extract_page(html_bytes: bytes) -> tuple[str, list[str]]:
    """Single-process oracle: html bytes -> (text, links). Pure function;
    the pandas-UDF path below calls exactly this per document, so
    byte-identity is structural, and the test suite verifies it against
    an independently-run driver-side loop."""
    parser = _Extractor()
    parser.feed(html_bytes.decode("utf-8", errors="replace"))
    parser.close()
    return "\n".join(parser.fragments), parser.links


EXTRACT_SCHEMA = "url string, text string, links array<string>"


def extract_links(pages: DataFrame) -> DataFrame:
    """pages -> (url, text, links) via Arrow-batched mapInPandas.

    Column pruning: we select only (url, html) so the parquet scan never
    reads warc_ts/lang/text.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, links = [], []
            for blob in pdf["html"].values:
                t, l = extract_page(bytes(blob))
                texts.append(t)
                links.append(l)
            yield pd.DataFrame(
                {"url": pdf["url"].values, "text": texts, "links": links}
            )

    return pages.select("url", "html").mapInPandas(run, schema=EXTRACT_SCHEMA)


def assign_ids(urls: DataFrame) -> DataFrame:
    """Dense 0-based node ids, rank of the url in global sorted order.

    Deterministic (mirrors the reference's dense uint64 id space,
    Globals.hpp:29). Implemented as the two-phase partitioned
    renumbering in plans/ids.py — range-partition, rank per partition,
    add per-partition offsets — so 10^12 urls never funnel through a
    single-partition global window; the id contract (dense, sorted by
    url) is identical to ``row_number over (order by url) - 1``.
    """
    from networkit_spark.plans.ids import dense_ids

    return dense_ids(urls.select("url").distinct(), ["url"], "id")


def pages_to_graph(pages: DataFrame, drop_self_loops: bool = True,
                   dedup: bool = True) -> tuple[Graph, DataFrame]:
    """Full front door: pages -> (directed Graph over dense ids, url_ids).

    Links pointing outside the crawl (unknown urls) are dropped (inner
    join against the url dictionary), matching a closed-world crawl
    graph.
    """
    extracted = extract_links(pages)
    url_ids = assign_ids(pages.select("url")).cache()
    hrefs = extracted.select(
        "url", F.explode("links").alias("href")
    )
    edges = (
        hrefs.join(url_ids, "url")
        .select(F.col("id").alias("src"), "href")
        .join(url_ids.select(F.col("url").alias("href"), F.col("id").alias("dst")),
              "href")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    if drop_self_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    if dedup:
        edges = edges.dropDuplicates(["src", "dst"])
    vertices = url_ids.select("id")
    g = Graph(edges=edges, vertices=vertices, directed=True, weighted=False)
    return g, url_ids
