"""NetworkX adapter — convert between networkx graphs and the engine's
edge-DataFrame Graph.

Reference: networkit/nxadapter.py nx2nk (:41-100) / nk2nx (:102-150).
Same contract: node ids map to dense 0..n-1 in networkx node-iteration
order on the way in (the reference builds a node->index dict the same
way), an optional edge attribute becomes the weight, and directedness
is preserved both ways.

Scale stance: a networkx graph lives in one python process by
definition, so conversion is inherently fixture-scale — from_networkx
ships the edge list through ONE createDataFrame (Arrow batch), and
to_networkx collects the edges once (documented; the 100 TB path is
parquet ingest, sources/graphio).  Import of networkx is deferred so
the engine works without it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph


def _nx():
    try:
        import networkx
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "networkx is required for the nxadapter module"
        ) from exc
    return networkx


def from_networkx(spark: SparkSession, nx_graph,
                  weight_attr: str | None = None) -> tuple[Graph, dict]:
    """nx2nk: returns (Graph, node->dense-id map).  Ids are assigned in
    networkx node-iteration order (nxadapter.py:60-66)."""
    _nx()
    idmap = {u: i for i, u in enumerate(nx_graph.nodes())}
    directed = nx_graph.is_directed()
    weighted = weight_attr is not None
    rows = []
    for u, v, data in nx_graph.edges(data=True):
        w = float(data[weight_attr]) if weighted else 1.0
        rows.append((idmap[u], idmap[v], w))
    edges = spark.createDataFrame(
        rows, "src long, dst long, weight double"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in range(len(idmap))], "id long"
    )
    return (
        Graph(edges=edges, vertices=vertices, directed=directed,
              weighted=weighted),
        idmap,
    )


def to_networkx(g: Graph):
    """nk2nx: materializes the edge relation into a networkx
    (Di)Graph; weights become the 'weight' edge attribute when the
    graph is weighted (nxadapter.py:102-150)."""
    networkx = _nx()
    out = networkx.DiGraph() if g.directed else networkx.Graph()
    out.add_nodes_from(r["id"] for r in g.nodes().collect())
    for r in g.edges.collect():
        if g.weighted:
            out.add_edge(r["src"], r["dst"], weight=r["weight"])
        else:
            out.add_edge(r["src"], r["dst"])
    return out
