from networkit_spark.operators.pagerank import PageRankResult, pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.plp import plp
from networkit_spark.operators.triangles import (
    local_clustering_coefficient,
    triangle_counts,
)

__all__ = [
    "pagerank",
    "PageRankResult",
    "connected_components",
    "plp",
    "triangle_counts",
    "local_clustering_coefficient",
]
