"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of the reference
(angriman/networkit, a single-node C++/OpenMP graph library) as idiomatic
Spark: the graph is an edge DataFrame ``(src: long, dst: long, weight:
double)``; kernels (PageRank, connected components, PLP label propagation,
triangle counting / local clustering coefficient) are iterative DataFrame
plans driven by a superstep runtime with per-superstep checkpointing,
convergence metrics and resume; ingestion starts from a Common-Crawl-style
``pages(url, warc_ts, html, text, lang)`` table with vectorized Arrow/pandas
link extraction.

Design notes (vs reference):
  - reference ``Graph`` (adjacency lists, include/networkit/graph/AdjListGraph.hpp)
    -> :class:`networkit_spark.graph.Graph` holding lazy DataFrames.
  - reference OpenMP supersteps -> Catalyst-planned join/agg per superstep,
    with AQE + explicit partitioning; optional per-partition CSR
    gather-scatter via grouped pandas UDFs (Arrow batched, never per-row).
  - reference has no optimizer; we rely on Catalyst (pushdown, pruning,
    broadcast) and keep every hot-path expression JVM-side.
"""

from networkit_spark.graph import Graph
from networkit_spark.session import get_spark

__all__ = ["Graph", "get_spark"]
__version__ = "0.1.0"
