"""MaximalCliques — ordered Bron-Kerbosch over per-node subproblems.

Reference: /root/reference/networkit/cpp/clique/MaximalCliques.cpp
(Eppstein-Löffler-Strash: walk nodes in degeneracy order; for each node
v run Bron-Kerbosch with pivoting on P = later neighbors, X = earlier
neighbors — every maximal clique is emitted exactly once, at its
lowest-ordered member).

Spark-first re-expression: the total order is (degree, id) — the same
orientation the triangle kernel uses (out-degree bounded by O(sqrt(2m))
like the oriented-adjacency plan), deterministic across engines without
the sequential peeling.  The per-node subproblem payload (neighbor
lists + edges among neighbors) is assembled with two relational joins
and handed to a grouped ``applyInPandas`` — Arrow-batched, one
BK recursion per group, no per-row Python.  Payload size is
O(deg(v)^2) worst case, the same locality the reference's recursion
needs in RAM; a web-scale hub would be handled by degeneracy-capping P
(|P| <= sqrt(2m) already) and shipping X as a bitset — documented, not
needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _bk_pivot(R, P, X, adj, out):
    if not P and not X:
        out.append(sorted(R))
        return
    pivot_candidates = P | X
    pivot = max(pivot_candidates, key=lambda u: (len(P & adj[u]), -u))
    for v in sorted(P - adj[pivot]):
        _bk_pivot(R | {v}, P & adj[v], X & adj[v], adj, out)
        P = P - {v}
        X = X | {v}


def maximal_cliques(g: Graph) -> DataFrame:
    """(clique: array<long>) — every maximal clique, members sorted,
    emitted once.  Undirected simple graphs (the reference requires
    the same)."""
    if g.directed:
        raise ValueError("maximal_cliques supports undirected graphs only")
    gg = g.remove_self_loops()
    deg = gg.degrees().select("id", "degree")
    adj = gg.adj().select("src", "dst")
    # total order (degree, id): u before w iff (deg_u, u) < (deg_w, w)
    keyed = (
        adj.join(deg.withColumnRenamed("id", "src")
                 .withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("degree", "dd"), "dst")
        .select(
            "src", "dst",
            ((F.col("dd") > F.col("ds"))
             | ((F.col("dd") == F.col("ds")) & (F.col("dst") > F.col("src"))))
            .alias("later"),
        )
    )
    nbr = keyed.select(F.col("src").alias("v"), F.col("dst").alias("x"), "later")
    # edges among N(v): wedge join against the canonical edge list
    canon = gg.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    sub = (
        nbr.select("v", F.col("x").alias("a"))
        .join(nbr.select(F.col("v").alias("v2"), F.col("x").alias("b")),
              F.col("v") == F.col("v2"))
        .drop("v2")
        .join(canon, ["a", "b"])
        .select("v", "a", "b")
    )
    payload = (
        nbr.select("v", "x", "later",
                   F.lit(None).cast("long").alias("a"),
                   F.lit(None).cast("long").alias("b"))
        .unionByName(
            sub.select("v", F.lit(None).cast("long").alias("x"),
                       F.lit(None).cast("boolean").alias("later"), "a", "b")
        )
    )

    import pandas as pd

    def bk(pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(pdf["v"].iloc[0])
        nrows = pdf[pdf["x"].notna()]
        P = {int(r.x) for r in nrows.itertuples() if bool(r.later)}
        X = {int(r.x) for r in nrows.itertuples() if not bool(r.later)}
        members = P | X | {v}
        adj_local: dict[int, set] = {u: set() for u in members}
        for r in pdf[pdf["a"].notna()].itertuples():
            a, b = int(r.a), int(r.b)
            if a in adj_local and b in adj_local:
                adj_local[a].add(b)
                adj_local[b].add(a)
        for u in P | X:
            adj_local[u].add(v)
            adj_local[v].add(u)
        out: list[list[int]] = []
        if not P and not X:
            out.append([v])  # isolated-in-order node: {v} maximal iff deg 0
        else:
            _bk_pivot({v}, P, X, adj_local, out)
        return pd.DataFrame({"clique": out}) if out else pd.DataFrame(
            {"clique": pd.Series([], dtype=object)}
        )

    grouped = payload.groupBy("v").applyInPandas(bk, "clique array<long>")
    # nodes with degree 0 never appear in `payload`; they are maximal
    # singletons
    isolated = (
        gg.degrees()
        .filter(F.col("degree") == 0)
        .select(F.array(F.col("id")).alias("clique"))
    )
    return grouped.unionByName(isolated)


def clique_size_histogram(g: Graph) -> DataFrame:
    """(size, count) over all maximal cliques — the stable cross-engine
    summary the gate hashes."""
    return (
        maximal_cliques(g)
        .select(F.size("clique").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("count"))
    )
