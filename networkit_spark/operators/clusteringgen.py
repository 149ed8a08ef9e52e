"""ClusteringGenerator — the reference's synthetic-partition factory
re-expressed as pure DataFrame expressions.

Reference: /root/reference/networkit/cpp/community/ClusteringGenerator.cpp
  - makeSingletonClustering (:15-20): every node its own subset.
  - makeOneClustering (:22-27): all nodes in subset 0.
  - makeRandomClustering (:29-45): uniform label in [0, k).  The
    reference draws Aux::Random::integer(k-1) per node; we derandomize
    with an md5 draw keyed by (seed, id) — same distribution, exact
    cross-engine replay (the repo-wide derandomization rule).
  - makeContinuousBalancedClustering (:47-74): node ranks split into k
    contiguous blocks of size n/k, the first n%k blocks one larger
    (the prefix-sum loop :56-63).
  - makeNoncontinuousBalancedClustering (:77-87): round-robin
    ``label = rank % k``.

The reference indexes by node id over a compact [0, n) id space; ids
here may be sparse, so "rank" is the dense ascending-id rank —
identical on compact graphs, well-defined on any graph.  The rank is
assigned by the two-phase partition-offset plan (plans/ids.py), never
a single global window, so every generator stays a projection plus one
range shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.ids import dense_ids


def _ranked_nodes(g: Graph) -> DataFrame:
    """(id, rank): dense 0-based rank in ascending id order, via the
    two-phase partition-offset assignment (no global window)."""
    return dense_ids(g.nodes(), ["id"], id_col="rank")


def singleton_clustering(g: Graph) -> DataFrame:
    """(id, label): allToSingletons — label = own id
    (ClusteringGenerator.cpp:15-20; Partition::allToSingletons)."""
    return g.nodes().select("id", F.col("id").alias("label"))


def one_clustering(g: Graph) -> DataFrame:
    """(id, label): allToOnePartition — label = 0
    (ClusteringGenerator.cpp:22-27)."""
    return g.nodes().select("id", F.lit(0).cast("long").alias("label"))


def random_clustering(g: Graph, k: int, seed: str = "rc") -> DataFrame:
    """(id, label): uniform md5-derandomized label in [0, k)
    (ClusteringGenerator.cpp:29-45 draws Aux::Random::integer(k-1)
    per node; same marginal, deterministic replay)."""
    if k <= 0:
        raise ValueError("k must be positive")
    draw = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col("id").cast("string"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    return g.nodes().select("id", (draw % k).cast("long").alias("label"))


def continuous_balanced_clustering(g: Graph, k: int) -> DataFrame:
    """(id, label): k contiguous rank blocks, sizes n/k with the first
    n%k blocks one node larger (ClusteringGenerator.cpp:47-74).

    Closed form of the reference's prefix-sum fill: with s = n // k,
    rem = n % k, a node of rank r lands in block
      r // (s+1)                    if r < rem*(s+1)
      rem + (r - rem*(s+1)) // s    otherwise.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    ranked = _ranked_nodes(g)
    n = ranked.count()  # one scalar to the driver, like convergence checks
    s, rem = n // k, n % k
    r = F.col("rank")
    cut = rem * (s + 1)
    label = F.when(F.lit(rem > 0) & (r < cut), (r / (s + 1)).cast("long")).otherwise(
        rem + ((r - cut) / max(s, 1)).cast("long")
    )
    return ranked.select("id", label.cast("long").alias("label"))


def noncontinuous_balanced_clustering(g: Graph, k: int) -> DataFrame:
    """(id, label): round-robin label = rank % k
    (ClusteringGenerator.cpp:77-87)."""
    if k <= 0:
        raise ValueError("k must be positive")
    return _ranked_nodes(g).select(
        "id", (F.col("rank") % k).cast("long").alias("label")
    )
