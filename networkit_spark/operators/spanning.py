"""Spanning forests — Boruvka over DataFrames.

Reference:
  - SpanningForest (/root/reference/networkit/cpp/graph/
    SpanningForest.cpp:15-31): any spanning forest (BFS tree per
    component).
  - RandomMaximumSpanningForest (/root/reference/networkit/cpp/graph/
    RandomMaximumSpanningForest.cpp): Kruskal over edges sorted by
    weight descending with RANDOM tie-break. Deterministic divergence
    here (same stance as PLP/PLM): ties break by the total order
    (weight desc, src asc, dst asc), which makes the forest the UNIQUE
    maximum spanning forest of the perturbed weights — exactly what
    Kruskal with that comparator returns.

Spark plan: Boruvka — per round every component picks its best incident
cross-component edge under the global total order (one hash aggregation
with a struct argmin), the chosen edges merge components via the
existing min-label pointer-doubling fixpoint on the (tiny) component
graph, and rounds halve the component count, so O(log n) rounds of
O(m)-join work. Boruvka under a total edge order is cycle-free, so no
explicit cycle check is needed. The sequential BFS/Kruskal forms the
reference uses do not distribute; Boruvka is the classic parallel
substitute with the same output guarantee under the total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer, SuperstepResult


def _boruvka(
    g: Graph, maximum: bool, ckpt: Checkpointer
) -> tuple[DataFrame, int]:
    from networkit_spark.operators.components import _min_label_propagation

    spark = g.edges.sparkSession
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg((F.max if maximum else F.min)("weight").alias("weight"))
    )
    edges = ckpt.cut(edges, 9100)
    labels = g.nodes().select("id", F.col("id").alias("comp"))
    labels = ckpt.cut(labels, 9101)
    forest: DataFrame | None = None
    rounds = 0
    while True:
        rounds += 1
        cross = (
            edges.join(
                labels.select(F.col("id").alias("src"), F.col("comp").alias("ca")),
                "src",
            )
            .join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("cb")),
                "dst",
            )
            .filter(F.col("ca") != F.col("cb"))
        )
        cross = ckpt.cut(cross, 9100 + 10 * rounds)
        if cross.limit(1).count() == 0:
            break
        half = cross.select(F.col("ca").alias("c"), "src", "dst", "weight").unionByName(
            cross.select(F.col("cb").alias("c"), "src", "dst", "weight")
        )
        wkey = (-F.col("weight")) if maximum else F.col("weight")
        chosen = (
            half.groupBy("c")
            .agg(
                F.min(
                    F.struct(
                        wkey.alias("k"),
                        F.col("src").alias("src"),
                        F.col("dst").alias("dst"),
                        F.col("weight").alias("weight"),
                    )
                ).alias("m")
            )
            .select(
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.weight").alias("weight"),
            )
            .distinct()
        )
        chosen = ckpt.cut(chosen, 9101 + 10 * rounds)
        forest = (
            chosen
            if forest is None
            else ckpt.cut(forest.unionByName(chosen), 9102 + 10 * rounds)
        )
        # merge components along the chosen edges: min-label fixpoint on
        # the component graph (pointer doubling handles comp chains)
        cedges = (
            chosen.join(
                labels.select(F.col("id").alias("src"), F.col("comp").alias("ca")),
                "src",
            )
            .join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("cb")),
                "dst",
            )
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        )
        cadj = cedges.unionByName(
            cedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        cnodes = labels.select(F.col("comp").alias("id")).distinct()
        merged, _ = _min_label_propagation(cadj, cnodes, ckpt, resume=False)
        labels = ckpt.cut(
            labels.join(
                merged.select(F.col("id").alias("comp"), F.col("label").alias("nc")),
                "comp",
            ).select("id", F.col("nc").alias("comp")),
            9103 + 10 * rounds,
        )
    if forest is None:
        forest = spark.createDataFrame([], "src long, dst long, weight double")
    return forest, rounds


def spanning_forest(
    g: Graph, checkpointer: Checkpointer | None = None
) -> tuple[Graph, SuperstepResult]:
    """A deterministic spanning forest (SpanningForest.cpp semantics:
    one tree per connected component; edge choice here is the
    (weight asc, src, dst) total order rather than BFS discovery)."""
    if g.directed:
        raise ValueError("spanning forests are defined on undirected graphs")
    ckpt = checkpointer or Checkpointer(g.edges.sparkSession)
    forest, rounds = _boruvka(g, maximum=False, ckpt=ckpt)
    return (
        Graph(forest, g.vertices, directed=False, weighted=g.weighted),
        SuperstepResult(iterations=rounds),
    )


def maximum_spanning_forest(
    g: Graph, checkpointer: Checkpointer | None = None
) -> tuple[Graph, SuperstepResult]:
    """Deterministic maximum-weight spanning forest
    (RandomMaximumSpanningForest semantics with the documented
    (weight desc, src asc, dst asc) tie-break instead of randomness)."""
    if g.directed:
        raise ValueError("spanning forests are defined on undirected graphs")
    ckpt = checkpointer or Checkpointer(g.edges.sparkSession)
    forest, rounds = _boruvka(g, maximum=True, ckpt=ckpt)
    return (
        Graph(forest, g.vertices, directed=False, weighted=g.weighted),
        SuperstepResult(iterations=rounds),
    )


def random_spanning_forest(g: Graph, seed: int = 1) -> DataFrame:
    """RandomSpanningForest (/root/reference/networkit/cpp/components/
    RandomSpanningForest.cpp:18-50): per connected component, start a
    random walk at a random root and add the tree edge (curr, neigh)
    whenever the walk first reaches an unvisited node (Aldous-Broder;
    the walk samples spanning trees uniformly at random).

    Documented deviations: draws are md5-derandomized — the root of the
    component labeled L is its members[h13('rsf', seed, L) % size] in
    ascending-id order, and the i-th step out of the walk picks neighbor
    h13('rsf', seed, L, i) % deg (the reference uses a global RNG for
    both; any draw sequence is a valid sample, ours replays bit-for-bit
    on any executor count).

    Spark-first shape: the walk is inherently sequential per component
    — exactly one reference loop iteration per step — so the distributed
    axis is the COMPONENT fan-out: the compacted CSR is broadcast once
    and ``mapInPandas`` over the (label, root, size) component relation
    walks each component in its own task, emitting only the n-1 tree
    edges.  Same stance as the Wilson-UST estimators (operators/ust.py).

    Returns (src, dst) rows in walk orientation (reference adds
    forest.addEdge(curr, neigh)).
    """
    import numpy as np
    import pandas as pd

    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.ust import _csr, _h13

    if g.directed:
        raise ValueError("random_spanning_forest is undirected-only")
    spark = g.edges.sparkSession
    ids, indptr, indices = _csr(g)
    bc = spark.sparkContext.broadcast((ids, indptr, indices))

    labels, _ = connected_components(g)
    comps = (
        labels.groupBy("label")
        .agg(F.count("*").alias("size"), F.min("id").alias("lo"))
        .select("label", "size")
    )

    def run(batches):
        b_ids, b_indptr, b_indices = bc.value
        pos = {int(v): i for i, v in enumerate(b_ids)}
        for pdf in batches:
            out_src: list[int] = []
            out_dst: list[int] = []
            for lab, size in zip(pdf["label"], pdf["size"]):
                lab, size = int(lab), int(size)
                if size <= 1:
                    continue
                # members of the component: BFS over CSR from the label
                # node (labels are min-member ids here)
                rootq = [pos[lab]]
                seen = {pos[lab]}
                while rootq:
                    cur = rootq.pop()
                    for j in range(b_indptr[cur], b_indptr[cur + 1]):
                        w = int(b_indices[j])
                        if w not in seen:
                            seen.add(w)
                            rootq.append(w)
                members = sorted(int(b_ids[p]) for p in seen)
                root = members[_h13("rsf", seed, lab) % len(members)]
                visited = {pos[root]}
                cur = pos[root]
                step = 0
                while len(visited) < size:
                    d = int(b_indptr[cur + 1] - b_indptr[cur])
                    k = _h13("rsf", seed, lab, step) % d
                    step += 1
                    nxt = int(b_indices[b_indptr[cur] + k])
                    if nxt not in visited:
                        visited.add(nxt)
                        out_src.append(int(b_ids[cur]))
                        out_dst.append(int(b_ids[nxt]))
                    cur = nxt
            yield pd.DataFrame(
                {"src": np.asarray(out_src, dtype=np.int64),
                 "dst": np.asarray(out_dst, dtype=np.int64)}
            )

    par = max(1, spark.sparkContext.defaultParallelism)
    return comps.repartition(par, "label").mapInPandas(
        run, "src long, dst long"
    )


def union_maximum_spanning_forest(
    g: Graph, checkpointer: Checkpointer | None = None
) -> tuple[Graph, SuperstepResult]:
    """Union of ALL maximum spanning forests.

    Reference: /root/reference/networkit/cpp/graph/
    UnionMaximumSpanningForest.cpp:20-92 — Kruskal over edges sorted by
    weight descending, but union-find merges are DEFERRED until the
    weight level changes, so every edge of a tie group is tested
    against the pre-group components.  Equivalent per-edge criterion
    (what the deferred merge implements): an edge (u, v, w) is in the
    UMSF iff u and v lie in different components of the subgraph of
    edges with weight STRICTLY greater than w.

    Spark plan: one pass over the distinct weight LEVELS descending
    (the reference is sequential per EDGE; levels are the coarsest
    batching that preserves the semantics).  Per level: map the level's
    edges through the running component labels (one join), keep the
    cross-component ones, then merge by running the min-label fixpoint
    on the QUOTIENT graph of kept edges (component-count-sized, tiny)
    and composing the relabeling.  Driver state is the distinct weight
    list only — at web scale weights are quantized/bucketed, so the
    level count is a domain constant, not O(m).
    """
    if g.directed:
        raise ValueError(
            "union maximum spanning forest is defined on undirected graphs"
        )
    from networkit_spark.operators.components import connected_components

    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    wcol = (F.col("weight") if g.weighted else F.lit(1.0)).cast("double")
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            wcol.alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
        .localCheckpoint(eager=True)
    )
    levels = [
        float(r["weight"])
        for r in edges.select("weight").distinct().orderBy(
            F.desc("weight")
        ).collect()
    ]
    labels = g.nodes().select("id", F.col("id").alias("label"))
    out = None
    for i, w in enumerate(levels):
        lvl = edges.filter(F.col("weight") == w)
        mapped = (
            lvl.join(
                labels.select(F.col("id").alias("src"),
                              F.col("label").alias("lu")),
                "src",
            )
            .join(
                labels.select(F.col("id").alias("dst"),
                              F.col("label").alias("lv")),
                "dst",
            )
        )
        keep = mapped.filter(F.col("lu") != F.col("lv")).select(
            "src", "dst", "weight"
        )
        out = keep if out is None else out.unionByName(keep)
        out = ckpt.cut(out, 2 * i)
        if i + 1 < len(levels):
            q_edges = (
                mapped.filter(F.col("lu") != F.col("lv"))
                .select(
                    F.least("lu", "lv").alias("src"),
                    F.greatest("lu", "lv").alias("dst"),
                )
                .distinct()
                .withColumn("weight", F.lit(1.0))
            )
            q_nodes = labels.select(
                F.col("label").alias("id")
            ).distinct()
            qg = Graph(
                q_edges, vertices=q_nodes, directed=False, weighted=False
            )
            comp, _ = connected_components(qg)
            labels = ckpt.cut(
                labels.join(
                    comp.select(F.col("id").alias("label"),
                                F.col("label").alias("newlabel"))
                    .withColumnRenamed("newlabel", "_nl"),
                    "label",
                ).select("id", F.col("_nl").alias("label")),
                2 * i + 1,
            )
    if out is None:
        out = spark.createDataFrame(
            [], "src long, dst long, weight double"
        )
    return (
        Graph(out, g.vertices, directed=False, weighted=g.weighted),
        SuperstepResult(iterations=len(levels)),
    )


def kruskal_msf(
    g: Graph, checkpointer: Checkpointer | None = None
) -> tuple[Graph, float, SuperstepResult]:
    """KruskalMSF (/root/reference/networkit/cpp/graph/KruskalMSF.cpp
    :20-60): MINIMUM spanning forest by non-decreasing weight scan +
    union-find, plus the total forest weight.

    Under this module's total order (weight asc, src asc, dst asc) the
    minimum forest is UNIQUE (it is the MSF of the perturbed weights),
    so Kruskal, Prim and Boruvka all return the same edge set — the
    distributed Boruvka plan (O(log n) rounds of one argmin aggregation
    each) is the execution strategy for all three reference entry
    points; a sequential sorted scan with a driver-side union-find does
    not distribute."""
    forest, info = spanning_forest(g, checkpointer)
    wcol = F.col("weight") if g.weighted else F.lit(1.0)
    row = forest.edges.agg(
        F.coalesce(F.sum(wcol), F.lit(0.0)).alias("tw")
    ).collect()[0]
    return forest, float(row["tw"]), info


def prim_msf(
    g: Graph, checkpointer: Checkpointer | None = None
) -> tuple[Graph, float, SuperstepResult]:
    """PrimMSF (/root/reference/networkit/cpp/graph/PrimMSF.cpp:20-70):
    grow-from-a-node minimum spanning forest with a binary heap.  Same
    unique-MSF argument as kruskal_msf — identical output, same
    Boruvka plan."""
    return kruskal_msf(g, checkpointer)
