"""Graph facade: the engine's data model.

Reference: ``Graph = AdjListGraph<node, edgeweight>`` — mutable in-memory
adjacency lists (/root/reference/include/networkit/graph/AdjListGraph.hpp:91-108),
node ids dense uint64, edge weight double default 1.0
(/root/reference/include/networkit/Globals.hpp:29-33).

Spark-native model: the canonical relation is an **edge DataFrame**
``edges(src: long, dst: long, weight: double)`` plus an optional
``vertices(id: long, ...attrs)`` dictionary. Undirected graphs store each
edge ONCE canonically; the adjacency view (:meth:`adj`) unions both
orientations lazily — this mirrors the reference's doubled undirected
storage (AdjListGraph.hpp:97, AdjListGraphImpl.hpp:1011-1030) without
materializing it.

Everything is lazy; ``degrees()`` / ``adj()`` results are plain DataFrames
that Catalyst is free to push down into. Heavyweight callers (iterative
kernels) cache/checkpoint what they reuse.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)


@dataclass
class Graph:
    """A (possibly weighted, possibly directed) graph over DataFrames.

    ``edges``: one row per edge. For undirected graphs each edge appears
    once (any orientation); self-loops are legal and counted separately,
    as in the reference (AdjListGraph.hpp:70 storedNumberOfSelfLoops).
    ``vertices``: one row per node id; derived from edges when absent
    (isolated nodes then don't exist, matching nothing — pass explicitly
    when isolated nodes matter, as the reference's dense id space does).
    """

    edges: DataFrame
    vertices: DataFrame | None = None
    directed: bool = False
    weighted: bool = False
    _cached: list[DataFrame] = field(default_factory=list, repr=False)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
        vertices: DataFrame | None = None,
        dedup: bool = False,
    ) -> "Graph":
        """Normalize an arbitrary (src, dst[, weight]) DataFrame into a Graph.

        Mirrors ``Graph.addEdges`` bulk ingest (networkit/graph.pyx:427-470):
        missing weight -> 1.0; ``dedup`` mirrors checkMultiEdge
        (AdjListGraphImpl.hpp:1018-1020).
        """
        cols = edges.columns
        e = edges
        if "weight" not in cols:
            e = e.withColumn("weight", F.lit(1.0))
        e = e.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        if not directed:
            # canonical orientation for storage: src <= dst
            e = e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
        if dedup:
            e = e.dropDuplicates(["src", "dst"])
        return cls(edges=e, vertices=vertices, directed=directed, weighted=weighted)

    @classmethod
    def from_pandas(
        cls,
        spark: SparkSession,
        edge_list,
        directed: bool = False,
        weighted: bool = False,
        n: int | None = None,
    ) -> "Graph":
        """Tiny-fixture constructor: list of (u, v[, w]) tuples.

        ``n`` materializes a dense 0..n-1 vertex set (reference
        ``Graph(n)``, networkit/graph.pyx:39-43) so isolated nodes exist.
        """
        rows = [
            (int(t[0]), int(t[1]), float(t[2]) if len(t) > 2 else 1.0)
            for t in edge_list
        ]
        e = spark.createDataFrame(rows, schema=EDGE_SCHEMA)
        v = None
        if n is not None:
            v = spark.range(n).select(F.col("id").cast("long").alias("id"))
        return cls.from_edges(e, directed=directed, weighted=weighted, vertices=v)

    # -- views -------------------------------------------------------------
    def adj(self) -> DataFrame:
        """Adjacency view: one row per (u, neighbor) half-edge.

        Directed: out-edges as stored. Undirected: both orientations
        (self-loops only once — a loop's mirror is itself). This is the
        DataFrame analogue of ``forNeighborsOf`` iteration
        (AdjListGraph.hpp:1726).
        """
        if self.directed:
            return self.edges
        mirrored = self.edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return self.edges.unionByName(mirrored)

    def in_adj(self) -> DataFrame:
        """Gather view: (u, in-neighbor) — reference ``forInEdgesOf``
        (AdjListGraphImpl.hpp:119-134): directed uses inEdges; undirected
        uses all neighbors."""
        if not self.directed:
            return self.adj()
        return self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )

    def nodes(self) -> DataFrame:
        """Vertex set ``(id: long)``; from ``vertices`` if given, else the
        union of edge endpoints."""
        if self.vertices is not None:
            return self.vertices.select(F.col("id").cast("long").alias("id"))
        return (
            self.edges.select(F.col("src").alias("id"))
            .unionByName(self.edges.select(F.col("dst").alias("id")))
            .distinct()
        )

    def degrees(self) -> DataFrame:
        """``(id, degree, w_degree)`` — out-degree for directed graphs,
        full degree for undirected (AdjListGraph.hpp:1075-1102; weighted
        variant AdjListGraphImpl.hpp:870-894). Self-loops count once,
        matching the reference default (countSelfLoopsTwice=false).
        Isolated nodes get degree 0 via left join against :meth:`nodes`."""
        deg = (
            self.adj()
            .groupBy(F.col("src").alias("id"))
            .agg(
                F.count("*").alias("degree"),
                F.sum("weight").alias("w_degree"),
            )
        )
        return (
            self.nodes()
            .join(deg, "id", "left")
            .select(
                "id",
                F.coalesce("degree", F.lit(0)).alias("degree"),
                F.coalesce("w_degree", F.lit(0.0)).alias("w_degree"),
            )
        )

    def in_degrees(self) -> DataFrame:
        """``(id, degree, w_degree)`` over the gather direction."""
        deg = (
            self.in_adj()
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("degree"), F.sum("weight").alias("w_degree"))
        )
        return (
            self.nodes()
            .join(deg, "id", "left")
            .select(
                "id",
                F.coalesce("degree", F.lit(0)).alias("degree"),
                F.coalesce("w_degree", F.lit(0.0)).alias("w_degree"),
            )
        )

    # -- scalar properties (GraphTools.hpp:24-149) -------------------------
    def number_of_nodes(self) -> int:
        return self.nodes().count()

    def number_of_edges(self) -> int:
        return self.edges.count()

    def total_edge_weight(self) -> float:
        """GraphTools::volume is 2x this for undirected (self-loops 2x);
        here: plain sum of stored edge weights."""
        row = self.edges.agg(F.sum("weight").alias("s")).collect()[0]
        return float(row["s"] or 0.0)

    # -- mutation-as-transformation ---------------------------------------
    def remove_self_loops(self) -> "Graph":
        """graph.pyx:579 removeSelfLoops -> filter."""
        return Graph(
            self.edges.filter(F.col("src") != F.col("dst")),
            self.vertices,
            self.directed,
            self.weighted,
        )

    def cache(self) -> "Graph":
        self.edges = self.edges.cache()
        self._cached.append(self.edges)
        return self

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached.clear()
