"""Spectral helpers + SpectralColoring.

Reference:
  - /root/reference/networkit/algebraic.py:139-330 —
    symmetricEigenvectors / adjacencyEigenvectors(cutoff, reverse):
    scipy eigsh with which='LA' ('SA' when reverse) for cutoff+1
    pairs, re-sorted ASCENDING by eigenvalue before returning; the
    whole computation is DRIVER-side scipy in the reference.
  - /root/reference/networkit/coloring.py:6-140 — SpectralColoring:
    start with one color class holding every node, recursively split a
    class by the sign of eigenvector[depth] until the class is a valid
    independent set (split(color, depth): >= 0 stays, < 0 moves to a
    fresh color; an invalid half re-splits at depth+1).

Spark stance:
  - ``adjacency_eigenvectors`` matches the reference's own centralized
    semantics: the adjacency is collected and decomposed with dense
    ``numpy.linalg.eigh`` on the driver (scipy is not available here;
    eigsh-vs-eigh is a solver detail of the same spectrum).  This is
    fixture-scale BY THE REFERENCE'S OWN DESIGN — it materializes the
    n x n spectrum either way.  Eigenvector SIGN is canonicalized
    (largest-|entry| coordinate positive, ties to the smaller node id)
    — eigsh returns arbitrary signs, so this is the deterministic
    contract (documented deviation).
  - ``adjacency_eigenvector_power`` is the WEB-SCALE path for the
    top-k |eigenvalue| pairs: block power iteration where each matvec
    is one edge join + hash aggregation (never a collected matrix) and
    only the k x k Gram matrix ever reaches the driver.
  - ``spectral_coloring`` keeps the reference recursion driver-side
    (color-class bookkeeping is O(n) ids) but checks class validity
    with a distributed join against the edge relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer


def _dense_adjacency(g: Graph):
    """Driver-side dense symmetric adjacency (fixture-scale, exactly
    the reference's adjacencyMatrix materialization)."""
    import numpy as np

    ids = sorted(int(r["id"]) for r in g.nodes().collect())
    pos = {u: i for i, u in enumerate(ids)}
    n = len(ids)
    a = np.zeros((n, n))
    wcol = F.col("weight") if g.weighted else F.lit(1.0)
    for r in g.edges.select(
        "src", "dst", wcol.cast("double").alias("w")
    ).collect():
        i, j, w = pos[int(r["src"])], pos[int(r["dst"])], float(r["w"])
        a[i, j] += w
        if i != j:
            a[j, i] += w
    return a, ids


def adjacency_eigenvectors(
    g: Graph, cutoff: int = -1, reverse: bool = False
) -> tuple[list, list]:
    """(eigenvalues ascending, eigenvectors as python lists indexed by
    node position in ascending-id order) — algebraic.py:245 semantics:
    cutoff+1 pairs from the top (bottom when ``reverse``) of the
    ALGEBRAIC spectrum, returned ascending."""
    import numpy as np

    if g.directed:
        raise ValueError(
            "directed spectra are not supported; symmetrize first"
        )
    a, _ids = _dense_adjacency(g)
    n = a.shape[0]
    if cutoff == -1:
        cutoff = n - 3
    k = max(1, min(n, cutoff + 1))
    w, v = np.linalg.eigh(a)  # ascending algebraic
    take = list(range(k)) if reverse else list(range(n - k, n))
    vals = [float(w[i]) for i in take]
    vecs = []
    for i in take:
        col = v[:, i].copy()
        j = int(np.argmax(np.abs(col)))  # first max-|entry| coordinate
        if col[j] < 0:
            col = -col
        vecs.append([float(x) for x in col])
    return vals, vecs


def adjacency_eigenvector_power(
    g: Graph,
    k: int = 1,
    iters: int = 200,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> tuple[list, DataFrame]:
    """Top-k |eigenvalue| pairs by block power iteration — the
    distributed scale path: per sweep ONE adjacency join + hash
    aggregation (the matvec) and a k x k Gram collect; the n x k block
    lives as a DataFrame (id, j, x) throughout.

    Returns (Rayleigh quotients per block column, block DataFrame);
    the columns converge onto the dominant-|lambda| invariant
    subspace, so the quotient multiset approaches the top-k
    eigenvalues (per-column order is subspace-iteration order, not
    sorted).  Fixed
    ``iters`` and md5-derandomized init keep runs reproducible;
    accuracy is (|lambda_{k+1}|/|lambda_k|)^iters like any power
    method (pytest pins 1e-4 on a gapped fixture vs the dense path).
    """
    import numpy as np

    if g.directed:
        raise ValueError(
            "directed spectra are not supported; symmetrize first"
        )
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    nodes = g.nodes()
    wcol = F.col("weight") if g.weighted else F.lit(1.0)
    adj = g.adj().select(
        "src", "dst", wcol.cast("double").alias("w")
    ).localCheckpoint(eager=True)
    block = None
    for j in range(k):
        part = nodes.select(
            "id", F.lit(j).alias("j"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(
                            "|", F.lit(f"eig|{seed}|{j}"), F.col("id")
                        )),
                        1, 13,
                    ),
                    16, 10,
                ).cast("double") / F.lit(float(16 ** 13)) - 0.5
            ).alias("x"),
        )
        block = part if block is None else block.unionByName(part)
    block = ckpt.cut(block, 0)

    def orthonormalize(b: DataFrame, step: int) -> DataFrame:
        gram = (
            b.alias("p")
            .join(
                b.select(
                    F.col("id"), F.col("j").alias("j2"),
                    F.col("x").alias("x2"),
                ),
                "id",
            )
            .groupBy("j", "j2")
            .agg(F.sum(F.col("x") * F.col("x2")).alias("g"))
            .collect()
        )
        gmat = np.zeros((k, k))
        for r in gram:
            gmat[int(r["j"]), int(r["j2"])] = float(r["g"])
        # Cholesky of the Gram matrix: B_new = B * L^-T orthonormalizes
        lmat = np.linalg.cholesky(gmat + 1e-12 * np.eye(k))
        linv = np.linalg.inv(lmat).T  # right-multiply factor
        coef = spark.createDataFrame(
            [
                (int(a), int(bj), float(linv[a, bj]))
                for a in range(k)
                for bj in range(k)
                if linv[a, bj] != 0.0
            ],
            "j long, jn long, c double",
        )
        return ckpt.cut(
            b.join(F.broadcast(coef), "j")
            .groupBy("id", F.col("jn").alias("j"))
            .agg(F.sum(F.col("x") * F.col("c")).alias("x"))
            .select("id", "j", "x"),
            step,
        )

    block = orthonormalize(block, 1)
    for it in range(int(iters)):
        y = (
            adj.join(
                block.select(F.col("id").alias("dst"), "j", "x"), "dst"
            )
            .groupBy(F.col("src").alias("id"), "j")
            .agg(F.sum(F.col("w") * F.col("x")).alias("x"))
        )
        # keep zero rows for isolated nodes
        y = (
            nodes.crossJoin(spark.range(k).select(F.col("id").alias("j")))
            .join(y, ["id", "j"], "left")
            .select("id", "j", F.coalesce("x", F.lit(0.0)).alias("x"))
        )
        block = orthonormalize(y, 10 + it)
    # Rayleigh quotients diag(B^T A B)
    ab = (
        adj.join(block.select(F.col("id").alias("dst"), "j", "x"), "dst")
        .groupBy(F.col("src").alias("id"), "j")
        .agg(F.sum(F.col("w") * F.col("x")).alias("ax"))
    )
    ray = (
        block.join(ab, ["id", "j"])
        .groupBy("j")
        .agg(F.sum(F.col("x") * F.col("ax")).alias("lam"))
        .collect()
    )
    lams = [0.0] * k
    for r in ray:
        lams[int(r["j"])] = float(r["lam"])
    return lams, block


def spectral_coloring(
    g: Graph, cutoff: int = -1
) -> tuple[DataFrame, int]:
    """(coloring (id, color), number of colors) — coloring.py run():
    recursive sign-splits until every color class is independent.

    The recursion tree is driver-side like the reference (its state is
    color-class membership); each validity probe is ONE semi-join of
    the class against the edge relation.  For the fixture-scale class
    sets the split itself uses the driver lists; the output relation is
    distributed."""
    if g.directed:
        raise ValueError("spectral coloring expects an undirected graph")
    spark = g.edges.sparkSession
    _vals, vecs = adjacency_eigenvectors(g, cutoff=cutoff)
    ids = sorted(int(r["id"]) for r in g.nodes().collect())
    pos = {u: i for i, u in enumerate(ids)}
    edges = [
        (int(r["src"]), int(r["dst"]))
        for r in g.edges.select("src", "dst").collect()
        if int(r["src"]) != int(r["dst"])
    ]
    nbrs: dict[int, set] = {u: set() for u in ids}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)

    colors: dict[int, list] = {0: list(ids)}
    next_color = [1]

    def valid(c: int) -> bool:
        s = set(colors[c])
        return not any(nbrs[v] & s for v in colors[c])

    def split(c: int, depth: int = 0) -> None:
        if depth >= len(vecs):
            raise ValueError(
                "exhausted computed eigenvectors — raise cutoff"
            )
        other = next_color[0]
        next_color[0] += 1
        vs = colors[c]
        vec = vecs[depth]
        colors[c] = [v for v in vs if vec[pos[v]] >= 0]
        colors[other] = [v for v in vs if vec[pos[v]] < 0]
        if colors[c] and not valid(c):
            split(c, depth + 1)
        if colors[other] and not valid(other):
            split(other, depth + 1)

    split(0)
    rows = [
        (int(v), int(c)) for c, vs in colors.items() for v in vs
    ]
    out = spark.createDataFrame(rows, "id long, color long")
    used = {c for c, vs in colors.items() if vs}
    return out, len(used)


def laplacian_eigenvectors(
    g: Graph, cutoff: int = -1, reverse: bool = False
) -> tuple[list, list]:
    """laplacianEigenvector(s) (algebraic.py:272-298) — the same
    spectrum contract over L = D - A (degrees counting edge weights,
    self-loops contributing like networkit's laplacianMatrix: diagonal
    degree minus the loop weight)."""
    import numpy as np

    if g.directed:
        raise ValueError(
            "directed spectra are not supported; symmetrize first"
        )
    a, _ids = _dense_adjacency(g)
    n = a.shape[0]
    lap = np.diag(a.sum(axis=1)) - a
    if cutoff == -1:
        cutoff = n - 3
    k = max(1, min(n, cutoff + 1))
    w, v = np.linalg.eigh(lap)
    take = list(range(k)) if reverse else list(range(n - k, n))
    vals = [float(w[i]) for i in take]
    vecs = []
    for i in take:
        col = v[:, i].copy()
        j = int(np.argmax(np.abs(col)))
        if col[j] < 0:
            col = -col
        vecs.append([float(x) for x in col])
    return vals, vecs
