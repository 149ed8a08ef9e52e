"""GraphTools — graph transforms as DataFrame ops.

Reference: /root/reference/include/networkit/graph/GraphTools.hpp (581
LoC header; impl networkit/cpp/graph/GraphTools.cpp). Each function is a
pure transformation of the edge relation; Catalyst handles pushdown and
pruning, so none of these materialize anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def subgraph_from_nodes(g: Graph, nodes: DataFrame, compact: bool = False) -> Graph:
    """GraphTools.hpp:208-224 — induced subgraph; semi-joins on both
    endpoints (broadcast when the node set is small)."""
    ns = nodes.select(F.col(nodes.columns[0]).alias("id"))
    edges = (
        g.edges.join(ns.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ns.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    out = Graph(edges=edges, vertices=ns, directed=g.directed, weighted=g.weighted)
    return compact_graph(out) if compact else out


def subgraph_and_neighbors_from_nodes(g: Graph, nodes: DataFrame) -> Graph:
    """GraphTools.hpp:292 — edges with src OR dst in the set."""
    ns = nodes.select(F.col(nodes.columns[0]).alias("id"))
    on_src = g.edges.join(ns.withColumnRenamed("id", "src"), "src", "left_semi")
    on_dst = g.edges.join(ns.withColumnRenamed("id", "dst"), "dst", "left_semi")
    edges = on_src.unionByName(on_dst).dropDuplicates(["src", "dst"])
    return Graph(edges=edges, vertices=None, directed=g.directed, weighted=g.weighted)


def to_undirected(g: Graph) -> Graph:
    """GraphTools.hpp:303."""
    return Graph(g.edges, g.vertices, directed=False, weighted=g.weighted)


def to_unweighted(g: Graph) -> Graph:
    """GraphTools.hpp:312."""
    return Graph(
        g.edges.withColumn("weight", F.lit(1.0)), g.vertices, g.directed, False
    )


def to_weighted(g: Graph) -> Graph:
    """GraphTools.hpp:321."""
    return Graph(g.edges, g.vertices, g.directed, True)


def transpose(g: Graph) -> Graph:
    """GraphTools.hpp:330 — directed only (undirected is its own
    transpose)."""
    if not g.directed:
        return g
    return Graph(
        g.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        ),
        g.vertices,
        True,
        g.weighted,
    )


def append_graph(g1: Graph, g2: Graph) -> Graph:
    """GraphTools.hpp:338 — disjoint union; g2's ids shifted past g1's."""
    offset = (g1.nodes().agg(F.max("id")).collect()[0][0] or -1) + 1
    shifted = g2.edges.select(
        (F.col("src") + offset).alias("src"),
        (F.col("dst") + offset).alias("dst"),
        "weight",
    )
    v = None
    if g1.vertices is not None or g2.vertices is not None:
        v = g1.nodes().unionByName(
            g2.nodes().select((F.col("id") + offset).alias("id"))
        )
    return Graph(g1.edges.unionByName(shifted), v, g1.directed, g1.weighted)


def merge_graph(g1: Graph, g2: Graph) -> Graph:
    """GraphTools.hpp:347 — union over the same id space; duplicate
    edges collapse (first weight wins is unspecified; we keep max)."""
    edges = (
        g1.edges.unionByName(g2.edges)
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    v = None
    if g1.vertices is not None or g2.vertices is not None:
        v = g1.nodes().unionByName(g2.nodes()).distinct()
    return Graph(edges, v, g1.directed, g1.weighted or g2.weighted)


def continuous_node_ids(g: Graph) -> DataFrame:
    """GraphTools.hpp:362 getContinuousNodeIds — (id, new_id) dense map
    ordered by old id. Partitioned two-phase renumbering (plans/ids.py),
    not a single-partition global window."""
    from networkit_spark.plans.ids import dense_ids

    return dense_ids(g.nodes(), ["id"], "new_id")


def compact_graph(g: Graph, mapping: DataFrame | None = None) -> Graph:
    """GraphTools.hpp:355 getCompactedGraph — rewrite src/dst through the
    dense-id mapping (two shuffle joins)."""
    m = mapping if mapping is not None else continuous_node_ids(g)
    edges = (
        g.edges.join(m.withColumnRenamed("id", "src"), "src")
        .select(F.col("new_id").alias("src"), "dst", "weight")
        .join(m.withColumnRenamed("id", "dst"), "dst")
        .select("src", F.col("new_id").alias("dst"), "weight")
    )
    vertices = m.select(F.col("new_id").alias("id"))
    return Graph(edges, vertices, g.directed, g.weighted)


def restore_graph(g: Graph, mapping: DataFrame) -> Graph:
    """GraphTools.hpp:388 — inverse of compact_graph given the same
    (id, new_id) mapping."""
    inv = mapping.select(F.col("new_id").alias("id"), F.col("id").alias("new_id"))
    return compact_graph(g, inv)


def sort_edges_by_weight(g: Graph, decreasing: bool = False) -> DataFrame:
    """GraphTools.hpp:411 — ordered edge view."""
    order = F.desc("weight") if decreasing else F.asc("weight")
    return g.edges.orderBy(order, F.asc("src"), F.asc("dst"))


def density(g: Graph) -> float:
    """GraphTools.hpp:141 — m / (n*(n-1)), self-loops excluded from m;
    undirected counts each edge once in m and uses n*(n-1)/2."""
    n = g.number_of_nodes()
    if n < 2:
        return 0.0
    m = g.edges.filter(F.col("src") != F.col("dst")).count()
    denom = n * (n - 1) / (1 if g.directed else 2)
    return m / denom


def volume(g: Graph) -> float:
    """GraphTools.hpp:149 — sum of weighted degrees: 2*sum(w) for
    undirected non-loop edges, self-loops counted twice as well
    (GraphTools.cpp volume: sum over all (u,v) incidences)."""
    s = g.total_edge_weight()
    return s if g.directed else 2.0 * s


def max_degree(g: Graph) -> int:
    """GraphTools.hpp:24."""
    row = g.degrees().agg(F.max("degree")).collect()[0]
    return int(row[0] or 0)


def max_weighted_degree(g: Graph) -> float:
    """GraphTools.hpp:40."""
    row = g.degrees().agg(F.max("w_degree")).collect()[0]
    return float(row[0] or 0.0)


def random_nodes(g: Graph, k: int, seed: int = 42) -> DataFrame:
    """GraphTools.hpp:56-98 — seeded deterministic sample."""
    return (
        g.nodes()
        .orderBy(F.xxhash64(F.col("id"), F.lit(seed)))
        .limit(k)
    )


def random_edges(g: Graph, k: int, seed: int = 42) -> DataFrame:
    return (
        g.edges.orderBy(F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)))
        .limit(k)
    )


def randomize_weights(g: Graph, seed: int = 42) -> Graph:
    """GraphTools.hpp:453 — uniform(0,1] weights, seeded."""
    return Graph(
        g.edges.withColumn("weight", F.rand(seed)), g.vertices, g.directed, True
    )


def topological_sort(g: Graph) -> DataFrame:
    """GraphTools.hpp:424 — iterative Kahn peeling: repeatedly remove
    in-degree-0 nodes. Returns (id, level); raises on cycles. Superstep
    count = DAG depth."""
    if not g.directed:
        raise ValueError("topological sort requires a directed graph")
    remaining = g.edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = g.nodes().localCheckpoint(eager=True)
    out: DataFrame | None = None
    level = 0
    while True:
        with_in = remaining.select(F.col("dst").alias("id")).distinct()
        zero_in = nodes.join(with_in, "id", "left_anti")
        cnt = zero_in.count()
        if cnt == 0:
            if nodes.count() > 0:
                raise ValueError("graph has a cycle")
            break
        layer = zero_in.withColumn("level", F.lit(level))
        out = layer if out is None else out.unionByName(layer)
        nodes = nodes.join(zero_in, "id", "left_anti").localCheckpoint(eager=True)
        remaining = remaining.join(
            zero_in.withColumnRenamed("id", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
        level += 1
        if nodes.count() == 0:
            break
    return out if out is not None else nodes.withColumn("level", F.lit(0))


def bipartite_components(g: Graph) -> DataFrame:
    """(label, is_bipartite) per connected component —
    GraphTools.hpp:575 isBipartite, distributed form.

    Parity-reachability fixpoint: seed every component root (its min-id
    vertex, from connected_components) with parity 0; each superstep
    extends the reached (vertex, parity) set across edges with flipped
    parity; new pairs only (anti-join) so work shrinks like a BFS
    frontier. A component is bipartite iff no vertex is reached with
    BOTH parities (odd cycle). O(diameter) supersteps.
    """
    from networkit_spark.operators.components import connected_components
    from networkit_spark.plans.superstep import Checkpointer, materialize_partitioned

    if g.directed:
        raise ValueError("bipartite check is defined on undirected graphs")
    spark = g.edges.sparkSession
    ckpt = Checkpointer(spark)
    labels, _ = connected_components(g)
    adj = materialize_partitioned(g.adj().select("src", "dst"), "src")

    seen = labels.filter(F.col("id") == F.col("label")).select(
        "id", F.lit(0).alias("parity")
    )
    seen = ckpt.cut(seen, 0)
    frontier = seen
    it = 0
    while True:
        pushed = (
            frontier.hint("shuffle_hash")
            .join(adj, frontier.id == adj.src)
            .select(
                F.col("dst").alias("id"),
                (F.lit(1) - F.col("parity")).alias("parity"),
            )
            .distinct()
        )
        new_pairs = pushed.join(seen, ["id", "parity"], "left_anti")
        it += 1
        merged = ckpt.cut(seen.unionByName(new_pairs), it)
        grew = merged.count() > seen.count()  # counts cached relations
        frontier = new_pairs
        seen = merged
        if not grew:
            break
    odd = (
        seen.groupBy("id")
        .agg(F.countDistinct("parity").alias("np"))
        .filter(F.col("np") > 1)
        .select("id")
    )
    bad_components = labels.join(odd, "id", "left_semi").select("label").distinct()
    out = (
        labels.select("label")
        .distinct()
        .join(bad_components.withColumn("bad", F.lit(True)), "label", "left")
        .select(
            "label",
            F.coalesce(~F.col("bad"), F.lit(True)).alias("is_bipartite"),
        )
    )
    adj.unpersist()
    return out


def is_bipartite(g: Graph) -> bool:
    """GraphTools.hpp:575 — True iff every component is bipartite."""
    return (
        bipartite_components(g)
        .filter(~F.col("is_bipartite"))
        .limit(1)
        .count()
        == 0
    )


def index_edges(g: Graph) -> DataFrame:
    """indexEdges (/root/reference/networkit/graph.pyx:71): assign
    consecutive 0-based edge ids. Deterministic: ids ordered by
    (src, dst) — a one-time global sort, exactly what the reference's
    sequential assignment produces for its canonical iteration order.
    Returns edges with an ``edge_id`` column. Two-phase partitioned
    renumbering (plans/ids.py) — at web scale the edge table is the
    biggest relation in the system and must never funnel through one
    window task."""
    from networkit_spark.plans.ids import dense_ids

    return dense_ids(g.edges, ["src", "dst"], "edge_id")


def random_neighbor(g: Graph, u: int, seed: int = 42) -> int | None:
    """GraphTools::randomNeighbor (GraphTools.hpp:74): a deterministic
    (seeded) pick among u's neighbors; None if isolated."""
    row = (
        g.adj()
        .filter(F.col("src") == u)
        .select("dst")
        .orderBy(F.md5(F.concat(F.lit(f"{seed}|"), F.col("dst").cast("string"))))
        .limit(1)
        .collect()
    )
    return int(row[0]["dst"]) if row else None
