"""Deterministic synthetic ``pages`` table + web-graph generators.

No external data: fixtures synthesize Common-Crawl-shaped rows
``(url, warc_ts, html, text, lang)`` whose anchors encode a KNOWN graph
(FIXTURES.md §A), so every kernel test can run the full pipeline
html -> extraction -> edges -> kernel -> golden output.

``gen_webgraph_edges`` is an RMAT-style power-law generator (pure numpy,
seeded) used for skew/scaling benchmarks (FIXTURES.md §B8).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from networkit_spark.sources.extraction import extract_page

EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def url_of(node: int) -> str:
    return f"https://site{node % 97}.test/page{node:08d}"


def _html_for(node: int, out_neighbors: list[int]) -> bytes:
    anchors = "\n".join(
        f'<a href="{url_of(v)}">link to {v}</a>' for v in out_neighbors
    )
    filler = f"Deterministic filler text for page {node}. " * ((node % 3) + 1)
    html = (
        "<html><head>"
        f"<title>Page {node}</title>"
        "<script>var tracking = 'ignored';</script>"
        "<style>body { color: black; }</style>"
        "</head><body>"
        f"<h1>Page {node}</h1>"
        f"<p>{filler.strip()}</p>"
        f"{anchors}"
        "</body></html>"
    )
    return html.encode("utf-8")


def gen_pages_pdf(edges, n: int) -> pd.DataFrame:
    """pandas pages table realizing the directed graph ``edges`` over
    nodes 0..n-1. ``text`` holds the oracle-extracted text so the
    byte-identity invariant is testable end-to-end."""
    out: dict[int, list[int]] = {u: [] for u in range(n)}
    for t in edges:
        out[int(t[0])].append(int(t[1]))
    rows = []
    for u in range(n):
        html = _html_for(u, out[u])
        text, _ = extract_page(html)
        rows.append(
            {
                "url": url_of(u),
                "warc_ts": EPOCH + dt.timedelta(seconds=u),
                "html": html,
                "text": text,
                "lang": "en",
            }
        )
    return pd.DataFrame(rows)


def write_pages(spark, edges, n: int, path: str) -> None:
    pdf = gen_pages_pdf(edges, n)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)


def gen_webgraph_edges(
    n_nodes: int, n_edges: int, seed: int = 42, a=0.57, b=0.19, c=0.19
) -> np.ndarray:
    """RMAT-style recursive-matrix power-law digraph (deterministic).

    Returns int64 array (n_edges, 2); heavy-tailed in/out degrees to
    exercise skew handling. Self-loops retained (caller filters).
    """
    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(max(2, n_nodes))))
    src = np.zeros(n_edges, dtype=np.int64)
    dst = np.zeros(n_edges, dtype=np.int64)
    ab = a + b
    abc = a + b + c
    for _level in range(scale):
        r = rng.random(n_edges)
        # quadrants: a=(0,0) b=(0,1) c=(1,0) d=(1,1)
        src_bit = (r >= ab).astype(np.int64)
        dst_bit = (((r >= a) & (r < ab)) | (r >= abc)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    src %= n_nodes
    dst %= n_nodes
    return np.stack([src, dst], axis=1)
