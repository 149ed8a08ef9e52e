"""Synthetic graph generators — distributed, deterministic, JVM-side.

Reference: networkit/cpp/generators/ (ErdosRenyiGenerator.cpp,
RmatGenerator.cpp — used by the reference's own tests, e.g.
CommunityGTest.cpp:58,206). The reference generates on one node with a
sequential RNG; at 10^12-document scale the generator itself must be a
distributed DataFrame job, so instead of an RNG stream we derive every
random draw from ``xxhash64(edge_id, seed, level)`` — a pure column
expression: deterministic for a given seed regardless of partitioning,
parallelism, or retries, and it never leaves the JVM (whole-stage
codegen, no Python, no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def rmat_edges(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) RMAT power-law digraph over 2**scale vertex ids.

    Recursive-matrix quadrant descent (Chakrabarti et al., SDM'04): at
    each of ``scale`` levels one uniform draw picks the quadrant, i.e.
    one bit of src and one bit of dst. Self-loops and duplicates are
    retained (callers canonicalize) — same contract as the reference's
    RmatGenerator. Runs as a single whole-stage-codegen projection over
    ``spark.range(n_edges)``: no shuffle, no Python, no driver memory.

    Codegen-friendly draw scheme: each level consumes an 8-bit slice of
    ``xxhash64(id, seed, level // 8)`` (so at most ceil(scale/8) hash
    evaluations per row) and the quadrant probabilities are quantized to
    1/256 integer thresholds — the whole projection is small integer
    arithmetic that stays inside one compiled codegen method. A naive
    per-level double-uniform formulation generates a kilobytes-deep
    expression tree that falls out of codegen and runs ~50x slower.
    """
    if scale > 56:
        raise ValueError("scale > 56 would exhaust the 64-bit draw stream")
    ta = round(a * 256)
    tab = round((a + b) * 256)
    tabc = round((a + b + c) * 256)
    df = spark.range(
        0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(level // 8))
        u = F.shiftrightunsigned(h, 8 * (level % 8)).bitwiseAND(F.lit(255))
        src_bit = F.when(u >= tab, F.lit(1)).otherwise(F.lit(0)).cast("long")
        dst_bit = (
            F.when(((u >= ta) & (u < tab)) | (u >= tabc), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select(src.alias("src"), dst.alias("dst"))


def erdos_renyi_edges(
    spark: SparkSession,
    n_nodes: int,
    n_edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) — n_edges uniform draws over n_nodes**2 (G(n, m)-style;
    the reference's ErdosRenyiGenerator is G(n, p) — at scale the edge
    *count* is what must be controlled, so we fix m = p*n^2)."""
    df = spark.range(0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return df.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)), F.lit(n_nodes)).alias("dst"),
    )


def rmat_graph(
    spark: SparkSession,
    scale: int,
    n_edges: int,
    seed: int = 42,
    directed: bool = False,
    **kw,
):
    """Canonicalized simple Graph from :func:`rmat_edges` (self-loops
    dropped, duplicates merged, undirected-canonical src<dst)."""
    from networkit_spark.graph import Graph

    e = rmat_edges(spark, scale, n_edges, seed, **kw).filter(F.col("src") != F.col("dst"))
    if not directed:
        e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    e = e.distinct().withColumn("weight", F.lit(1.0))
    return Graph(edges=e, vertices=None, directed=directed, weighted=False)


def clustered_random_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
) -> "Graph":
    """ClusteredRandomGraphGenerator
    (/root/reference/networkit/cpp/generators/ClusteredRandomGraphGenerator.cpp):
    n nodes in k equal blocks; intra-block pairs kept with prob p_in,
    inter-block with p_out. Deterministic via per-pair xxhash64 draws
    (same JVM-side trick as the RMAT generator). Pair enumeration is a
    range self-join — O(n^2) draws, so this is a FIXTURE/property-test
    generator (the reference's is too), not a web-scale path."""
    from networkit_spark.graph import Graph

    ids = spark.range(n).select(F.col("id").cast("long").alias("id"))
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    res = 1 << 24
    draw = F.pmod(
        F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(res)
    )
    same = (F.col("src") % k) == (F.col("dst") % k)
    thr_in = int(p_in * res)
    thr_out = int(p_out * res)
    edges = pairs.filter(
        (same & (draw < thr_in)) | (~same & (draw < thr_out))
    ).withColumn("weight", F.lit(1.0))
    vertices = ids
    return Graph(edges, vertices, directed=False, weighted=False)


def lfr_graph(
    spark: SparkSession,
    n: int,
    avg_degree: float = 10.0,
    max_degree: int | None = None,
    degree_exp: float = 2.5,
    community_exp: float = 1.5,
    min_community: int | None = None,
    mu: float = 0.2,
    seed: int = 42,
) -> tuple["Graph", "DataFrame"]:
    """LFR-style benchmark graph (LFRGenerator,
    /root/reference/networkit/cpp/generators/LFRGenerator.cpp — the
    Lancichinetti-Fortunato-Radicchi benchmark: power-law degrees with
    exponent ``degree_exp``, power-law community sizes with
    ``community_exp``, and a mixing parameter ``mu`` = the expected
    fraction of each node's edges leaving its community).

    Deterministic simplified variant (this is a fixture/property-test
    generator, like the reference's): target degrees come from the
    inverse-CDF of the truncated power law over md5-uniforms; community
    sizes from a power-law partition of n; node u's edges split into a
    Bernoulli(1 - mu) intra / mu inter draw per stub, realized as a
    per-pair hash acceptance like clustered_random_graph (so realized
    degrees approximate the targets rather than matching exactly — the
    reference's edge-switching exactness loop is sequential and out of
    scope, documented). Pair enumeration is O(n^2) draws — fixture
    scale only.

    Returns (Graph, ground-truth communities (id, label)).
    """
    import math

    from networkit_spark.graph import Graph

    if max_degree is None:
        max_degree = max(2, int(math.sqrt(n)))
    if min_community is None:
        min_community = max(4, int(max_degree * 1.2))

    # community sizes: power-law draws until n is covered (driver-side,
    # #communities values only)
    import hashlib

    def u01(tag: str, i: int) -> float:
        h = hashlib.md5(f"{seed}|{tag}|{i}".encode()).hexdigest()[:13]
        return int(h, 16) / 16**13

    max_community = max(min_community + 1, n // 4)
    sizes: list[int] = []
    i = 0
    while sum(sizes) < n:
        u = u01("cs", i)
        i += 1
        # inverse CDF of p(s) ~ s^-community_exp on [min, max];
        # exponent 1.0 makes a == 0 — use the log-form inverse CDF
        # (s = lo * (hi/lo)^u) instead of dividing by zero
        a = 1.0 - community_exp
        lo, hi = float(min_community), float(max_community)
        if abs(a) < 1e-12:
            s = lo * (hi / lo) ** u
        else:
            s = (u * (hi**a - lo**a) + lo**a) ** (1.0 / a)
        sizes.append(int(s))
    sizes[-1] -= sum(sizes) - n  # trim overflow into the last community
    while len(sizes) > 1 and sizes[-1] < 2:
        # merge an over-trimmed (possibly negative, when n < the drawn
        # size) remainder into its neighbor instead of emitting a
        # degenerate community
        sizes[-2] += sizes.pop()
    sizes[-1] = max(1, sizes[-1])  # n < min_community: one tiny community
    # community of node id: contiguous blocks (deterministic ground truth)
    bounds = []
    start = 0
    for c, s in enumerate(sizes):
        bounds.append((start, start + s, start))  # label = first member id
        start += s
    comm_rows = [(b[0], b[1], b[2]) for b in bounds]
    cdf = spark.createDataFrame(comm_rows, "lo long, hi long, label long")
    ids = spark.range(n).select(F.col("id").cast("long").alias("id"))
    communities = ids.join(
        F.broadcast(cdf), (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi"))
    ).select("id", "label")

    # target degree per node from the truncated power law (JVM-side);
    # same a == 0 (exponent 1.0) guard as the community-size CDF
    res = 1 << 30
    a = 1.0 - degree_exp
    lo_d, hi_d = 2.0, float(max_degree)
    u = (
        F.pmod(F.xxhash64(F.lit(seed), F.lit("deg"), F.col("id")), F.lit(res))
        / F.lit(float(res))
    )
    if abs(a) < 1e-12:
        deg_t = F.lit(lo_d) * F.pow(F.lit(hi_d / lo_d), u)
    else:
        deg_t = F.pow(
            u * (F.lit(hi_d**a) - F.lit(lo_d**a)) + F.lit(lo_d**a), F.lit(1.0 / a)
        )
    # rescale so the mean lands near avg_degree
    targets = ids.select("id", deg_t.alias("raw"))
    mean_raw = float(targets.agg(F.avg("raw")).collect()[0][0])
    scale = avg_degree / mean_raw if mean_raw > 0 else 1.0
    targets = targets.select(
        "id",
        F.greatest(F.lit(2.0), F.col("raw") * F.lit(scale)).alias("d"),
    ).join(communities, "id")

    # per-pair acceptance: intra pairs with prob (1-mu)*d_u*d_v/(size-1)/avg,
    # inter pairs with prob mu*d_u*d_v/(n-size)/avg — expected degree ~ d_u
    # with an expected mu fraction leaving the community
    ta = targets.select(
        F.col("id").alias("src"), F.col("d").alias("du"), F.col("label").alias("cu")
    )
    tb = targets.select(
        F.col("id").alias("dst"), F.col("d").alias("dv"), F.col("label").alias("cv")
    )
    csize = communities.groupBy("label").agg(F.count("*").alias("size"))
    pairs = (
        ta.join(tb, F.col("src") < F.col("dst"))
        .join(csize.select(F.col("label").alias("cu"), F.col("size").alias("su")), "cu")
    )
    draw = (
        F.pmod(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(res))
        / F.lit(float(res))
    )
    same = F.col("cu") == F.col("cv")
    p_intra = (
        F.lit(1.0 - mu) * F.col("du") * F.col("dv")
        / F.greatest(F.col("su") - 1, F.lit(1)) / F.lit(avg_degree)
    )
    p_inter = (
        F.lit(mu) * F.col("du") * F.col("dv")
        / F.greatest(F.lit(n) - F.col("su"), F.lit(1)) / F.lit(avg_degree)
    )
    edges = (
        pairs.filter(
            (same & (draw < p_intra)) | (~same & (draw < p_inter))
        )
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    return Graph(edges, ids, directed=False, weighted=False), communities


# ---------------------------------------------------------------------------
# Round-5 generator breadth.  Distributed pure-column generators where
# the model is per-edge independent (ring lattice, Watts-Strogatz
# rewiring, Chung-Lu, stochastic blockmodel); driver-side sequential
# builders where the reference model itself is inherently sequential
# (Havel-Hakimi buckets, Barabasi-Albert preferential attachment,
# Dorogovtsev-Mendes growth) — those are O(n k) with md5-derandomized
# draws and are fixture/test-scale by design (at web scale use
# rmat_graph / chung_lu, which shard).
# ---------------------------------------------------------------------------

_MD5_DEN = float(1 << 52)


def _md5_frac(*cols):
    """First 13 hex nibbles of md5(concat_ws('|', cols)) / 2^52."""
    h = F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") / F.lit(_MD5_DEN)


def _py_md5_frac(*parts) -> float:
    import hashlib

    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:13], 16) / _MD5_DEN


def regular_ring_lattice(spark: SparkSession, n: int, k: int):
    """Ring lattice: node i connects to its k nearest successors
    (generators/RegularRingLatticeGenerator.cpp).  Fully distributed:
    one projection over spark.range(n) x explode(1..k)."""
    from networkit_spark.graph import Graph

    if n < 2 * k + 1:
        raise ValueError("need n >= 2k + 1 for a simple ring lattice")
    e = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
        )
        .select("src", ((F.col("src") + F.col("j")) % n).alias("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=e, vertices=spark.range(n), directed=False, weighted=False)


def watts_strogatz(spark: SparkSession, n: int, k: int, p: float, seed: int = 42):
    """Watts-Strogatz small world (generators/WattsStrogatzGenerator.cpp):
    ring lattice, then each lattice edge (u, u+j) rewires its far
    endpoint to a uniform node with probability p.

    Deviations (documented, keeps the generator one distributed
    projection): the reference redraws until the new endpoint is
    neither u nor an existing neighbour; we draw ONCE per edge and keep
    the original edge when the draw lands on a self-loop, then
    canonicalize + de-duplicate (duplicate rewires merge).  Same model
    regime (p fraction of long-range shortcuts), deterministic under
    md5(seed|u|j)."""
    from networkit_spark.graph import Graph

    if n < 2 * k + 1:
        raise ValueError("need n >= 2k + 1")
    lattice = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    )
    rewire = _md5_frac(F.lit(f"ws|{seed}|r"), F.col("src"), F.col("j")) < p
    target = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(f"ws|{seed}|t"),
                        F.col("src").cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % n
    )
    e = (
        lattice.select(
            "src",
            F.when(rewire, target)
            .otherwise((F.col("src") + F.col("j")) % n)
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=e, vertices=spark.range(n), directed=False, weighted=False)


def chung_lu(spark: SparkSession, degrees: list[int], seed: int = 42):
    """Chung-Lu random graph with expected degree sequence ``degrees``
    (generators/ChungLuGenerator.cpp): edge (i, j), i < j, exists with
    probability min(1, w_i w_j / S), S = sum of weights.  Distributed:
    the node-pair grid shards over the weight relation; the md5 draw is
    a pure column expression (n^2 pair work — the model's cost, not a
    collect)."""
    from networkit_spark.graph import Graph

    s = float(sum(degrees))
    w = spark.createDataFrame(
        list(enumerate(map(float, degrees))), "id long, w double"
    )
    a = w.select(F.col("id").alias("src"), F.col("w").alias("wi"))
    b = w.select(F.col("id").alias("dst"), F.col("w").alias("wj"))
    e = (
        a.crossJoin(b)
        .filter(F.col("src") < F.col("dst"))
        .filter(
            _md5_frac(F.lit(f"cl|{seed}"), F.col("src"), F.col("dst"))
            < F.least(F.lit(1.0), F.col("wi") * F.col("wj") / F.lit(s))
        )
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(
        edges=e,
        vertices=spark.range(len(degrees)),
        directed=False,
        weighted=False,
    )


def chung_lu_alam_etal(
    spark: SparkSession, degrees: list[int], seed: int = 42
):
    """Chung-Lu, Alam-et-al variant
    (generators/ChungLuGeneratorAlamEtAl.cpp).

    Semantics replicated: degrees are capped at n-1 and nodes are
    RELABELED in counting-sort (ascending capped-degree) order — the
    constructor's bucket/group startIndex assignment (:24-67) loses the
    original indices; each unordered pair (u < v) then carries
    probability dc_u * dc_v / sum(dc), UNclamped (generateSequential
    :115-131 — the group probability d_i * d_j / sum_deg applied
    per member pair; within-group pairs use d_i^2 / sum_deg).

    Documented deviation: the reference samples the Bernoulli field
    with sequential geometric edge-skipping (:75-105) — an RNG-stream
    trick for shared memory; the distributed contract draws each pair
    independently with the md5 fraction (equal in distribution,
    deterministic and shard-parallel here — the pair grid shards like
    chung_lu, no driver sequencing).
    """
    from networkit_spark.graph import Graph

    n = len(degrees)
    dc = sorted(min(int(d), n - 1) for d in degrees)
    # sum_deg = 0 is undefined in the reference (0/0 probabilities);
    # the only consistent reading is "no edges"
    s = float(sum(dc)) or 1.0
    w = spark.createDataFrame(list(enumerate(dc)), "id long, dc long")
    a = w.select(F.col("id").alias("src"), F.col("dc").alias("wi"))
    b = w.select(F.col("id").alias("dst"), F.col("dc").alias("wj"))
    e = (
        a.crossJoin(b)
        .filter(F.col("src") < F.col("dst"))
        .filter(
            _md5_frac(F.lit(f"cla|{seed}"), F.col("src"), F.col("dst"))
            < (F.col("wi") * F.col("wj")) / F.lit(s)
        )
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(
        edges=e,
        vertices=spark.range(n),
        directed=False,
        weighted=False,
    )


def stochastic_blockmodel(
    spark: SparkSession,
    membership: list[int],
    probs: list[list[float]],
    seed: int = 42,
):
    """Stochastic blockmodel (generators/StochasticBlockmodel.cpp):
    edge (i, j) exists with probability probs[block(i)][block(j)].
    Distributed per-pair md5 draws with a broadcast block matrix."""
    from networkit_spark.graph import Graph

    n = len(membership)
    nodes = spark.createDataFrame(
        list(enumerate(membership)), "id long, blk long"
    )
    pm = spark.createDataFrame(
        [
            (bi, bj, float(probs[bi][bj]))
            for bi in range(len(probs))
            for bj in range(len(probs))
        ],
        "bi long, bj long, p double",
    )
    a = nodes.select(F.col("id").alias("src"), F.col("blk").alias("bi"))
    b = nodes.select(F.col("id").alias("dst"), F.col("blk").alias("bj"))
    e = (
        a.crossJoin(b)
        .filter(F.col("src") < F.col("dst"))
        .join(F.broadcast(pm), ["bi", "bj"])
        .filter(
            _md5_frac(F.lit(f"sbm|{seed}"), F.col("src"), F.col("dst"))
            < F.col("p")
        )
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges=e, vertices=spark.range(n), directed=False, weighted=False)


def havel_hakimi(spark: SparkSession, degrees: list[int], ignore_if_not_realizable: bool = False):
    """Deterministic Havel-Hakimi realization of a degree sequence
    (generators/HavelHakimiGenerator.cpp:22-100): repeatedly connect
    the highest-deficit node to the next-highest ones.  Driver-side
    bucket algorithm (O(m) like the reference, inherently sequential);
    raises when the sequence is not realizable unless told to ignore,
    matching the reference's ERROR path (:93-98)."""
    from networkit_spark.graph import Graph

    n = len(degrees)
    remaining = sorted(
        ((int(d), v) for v, d in enumerate(degrees)), reverse=True
    )
    edges: list[tuple[int, int]] = []
    while remaining:
        remaining.sort(reverse=True)
        d, u = remaining[0]
        if d == 0:
            break
        if d > len(remaining) - 1:
            if ignore_if_not_realizable:
                break
            raise ValueError("degree sequence is not realizable")
        rest = remaining[1:]
        for i in range(d):
            dd, v = rest[i]
            edges.append((min(u, v), max(u, v)))
            rest[i] = (dd - 1, v)
        remaining = rest
    if not ignore_if_not_realizable and any(d for d, _ in remaining):
        raise ValueError("degree sequence is not realizable")
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    return Graph(edges=e, vertices=spark.range(n), directed=False, weighted=False)


def barabasi_albert(
    spark: SparkSession, k: int, n_max: int, n0: int = 0, seed: int = 42
):
    """Barabasi-Albert preferential attachment via the Batagelj-Brandes
    half-edge-array trick (generators/BarabasiAlbertGenerator.cpp):
    each draw picks a uniform position in the running half-edge list, so
    endpoints arrive degree-proportionally.  Inherently sequential
    (every step conditions on all previous ones — the reference is too);
    md5-derandomized driver loop, O(n k), fixture/test scale."""
    from networkit_spark.graph import Graph

    if n0 == 0:
        n0 = k
    half: list[int] = []
    edges: list[tuple[int, int]] = []
    for v in range(n0):
        if v > 0:
            u = v - 1
            edges.append((u, v))
            half.extend((u, v))
    for v in range(n0, n_max):
        picked: set[int] = set()
        t = 0
        while len(picked) < k and t < 20 * k:
            pos = int(_py_md5_frac("ba", seed, v, t) * len(half))
            t += 1
            u = half[min(pos, len(half) - 1)]
            if u != v and u not in picked:
                picked.add(u)
        for u in picked:
            edges.append((min(u, v), max(u, v)))
            half.extend((u, v))
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    return Graph(
        edges=e, vertices=spark.range(n_max), directed=False, weighted=False
    )


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42):
    """Dorogovtsev-Mendes growth (generators/DorogovtsevMendesGenerator
    .cpp:17-38): start from a triangle; every new node picks a uniform
    EXISTING EDGE and connects to both endpoints (edge-proportional =
    degree-proportional attachment).  md5-derandomized driver loop,
    O(n), fixture/test scale like the reference's sequential builder."""
    from networkit_spark.graph import Graph

    if n < 3:
        raise ValueError("need n >= 3")
    edges = [(0, 1), (1, 2), (0, 2)]
    for w in range(3, n):
        pos = int(_py_md5_frac("dm", seed, w) * len(edges))
        u, v = edges[min(pos, len(edges) - 1)]
        edges.append((min(u, w), max(u, w)))
        edges.append((min(v, w), max(v, w)))
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    return Graph(edges=e, vertices=spark.range(n), directed=False, weighted=False)


def powerlaw_degree_sequence(
    n: int, gamma: float = -2.0, min_deg: int = 1, max_deg: int | None = None,
    seed: int = 42,
) -> list[int]:
    """Power-law degree sequence via md5 inverse-CDF draws
    (generators/PowerlawDegreeSequence.cpp semantics: P(deg = k)
    proportional to k^gamma on [min_deg, max_deg]); the last entry is
    bumped by one when the sum comes out odd so the sequence can feed
    havel_hakimi / chung_lu."""
    if max_deg is None:
        max_deg = max(min_deg, int(round(n ** 0.5)))
    if gamma >= -1.0:
        raise ValueError("gamma must be < -1")
    a = gamma + 1.0
    lo, hi = float(min_deg), float(max_deg) + 1.0
    seq = []
    for i in range(n):
        u = _py_md5_frac("pl", seed, i)
        x = (lo**a + u * (hi**a - lo**a)) ** (1.0 / a)
        seq.append(max(min_deg, min(max_deg, int(x))))
    if sum(seq) % 2:
        seq[-1] += 1
    return seq


def configuration_model(
    spark: SparkSession,
    degrees: list[int],
    seed: int = 42,
    rounds: int = 3,
):
    """EdgeSwitchingMarkovChainGenerator (generators/EdgeSwitching
    MarkovChainGenerator.cpp): Havel-Hakimi realization, then the
    degree-preserving edge-switching Markov chain (reusing
    operators/randomization.edge_switching, itself gate-proven)."""
    from networkit_spark.operators.randomization import edge_switching

    g0 = havel_hakimi(spark, degrees)
    g, _ = edge_switching(g0, rounds=rounds, seed=seed)
    return g


# ---------------------------------------------------------------------------
# HyperbolicGenerator (T = 0 threshold mode)
# ---------------------------------------------------------------------------

_PI = 3.141592653589793


def hyperbolic_expected_degree(n: float, alpha: float, R: float) -> float:
    """HyperbolicSpace::getExpectedDegree (include/networkit/geometric/
    HyperbolicSpace.hpp:181-192), verbatim formula."""
    import math

    gamma = 2 * alpha + 1
    xi = (gamma - 1) / (gamma - 2)
    first = math.exp(-R / 2)
    second = math.exp(-alpha * R) * (
        alpha * (R / 2)
        * ((_PI / 4) * (1 / alpha) ** 2 - (_PI - 1) * (1 / alpha) + (_PI - 2))
        - 1
    )
    return (2 / _PI) * xi * xi * n * (first + second)


def hyperbolic_target_radius(
    n: float, m: float, alpha: float, epsilon: float = 0.01
) -> float:
    """HyperbolicSpace::getTargetRadius / searchTargetRadiusForColdGraphs
    (HyperbolicSpace.hpp:151-176, 204-211) for T = 0: bisect R until
    the expected degree matches 2m/n within epsilon."""
    import math

    k = (m / n) * 2
    gamma = 2 * alpha + 1
    xi_inv = (gamma - 2) / (gamma - 1)
    v = k * (_PI / 2) * xi_inv * xi_inv
    current = 2 * math.log(n / v)
    lo, hi = current / 2, current * 2
    while True:
        current = (lo + hi) / 2
        ck = hyperbolic_expected_degree(n, alpha, current)
        if ck < k:
            hi = current
        else:
            lo = current
        if abs(ck - k) <= epsilon:
            return current


def hyperbolic_points(
    spark: SparkSession,
    n: int,
    alpha: float,
    R: float,
    seed: int = 42,
    bands: int = 16,
    sectors: int = 256,
):
    """(id, theta, r, cosT, sinT, coshr, sinhr, band, sector) — n
    md5-derandomized points of the Krioukov hyperbolic disk model.

    Reference sampling (HyperbolicSpace.cpp:61-92 fillPoints): theta
    uniform on [0, 2*pi); the radial CDF is proportional to
    cosh(alpha*r), so r = acosh(u)/alpha with u uniform on
    [1, cosh(alpha*R)].  acosh/cosh/sinh are spelled via ln/exp/sqrt
    identically in the Spark plan and the DuckDB oracle so the floats
    agree bit-for-bit.
    """
    idx = spark.range(int(n)).select(F.col("id"))
    theta = F.lit(2 * _PI) * _md5_frac(F.lit(f"hga|{seed}"), F.col("id"))
    import math

    chaR = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2.0
    u = F.lit(1.0) + F.lit(chaR - 1.0) * _md5_frac(
        F.lit(f"hgr|{seed}"), F.col("id")
    )
    # acosh(u) = ln(u + sqrt(u*u - 1))
    r = F.log(u + F.sqrt(u * u - F.lit(1.0))) / F.lit(alpha)
    pts = idx.select("id", theta.alias("theta"), r.alias("r"))
    return _hyperbolic_derive(pts, R, bands, sectors)


def _hyperbolic_derive(pts, R: float, bands: int, sectors: int):
    """(id, theta, r) -> the full point relation (trig columns spelled
    via exp so Spark and the DuckDB oracle agree bit-for-bit, band /
    sector bucket columns).  Shared by the static generator and the
    dynamic generator's per-step re-derivation."""
    er = F.exp(F.col("r"))
    eri = F.exp(-F.col("r"))
    return pts.select(
        "id",
        "theta",
        "r",
        F.cos("theta").alias("cosT"),
        F.sin("theta").alias("sinT"),
        ((er + eri) / 2).alias("coshr"),
        ((er - eri) / 2).alias("sinhr"),
        F.least(
            F.lit(bands - 1), F.floor(F.col("r") / F.lit(R) * bands)
        ).cast("long").alias("band"),
        F.least(
            F.lit(sectors - 1),
            F.floor(F.col("theta") / F.lit(2 * _PI) * sectors),
        ).cast("long").alias("sector"),
    )


def hyperbolic_graph(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    plexp: float = 3.0,
    seed: int = 42,
    bands: int = 16,
    sectors: int = 256,
    threshold_margin: float = 0.0,
):
    """Threshold (T = 0) hyperbolic random graph — the Krioukov model
    the reference generates (HyperbolicGenerator.cpp:37-56: alpha =
    (plexp - 1)/2, R from the expected-degree bisection; edge iff
    hyperbolic distance <= R, i.e. cosh d = cosh r1 cosh r2 -
    sinh r1 sinh r2 cos(dtheta) <= cosh R).

    Spark-first candidate generation (the von Looz HPEC'16 band idea
    re-expressed relationally, replacing the reference's shared-memory
    quadtree): points land in (radial band, angular sector) buckets;
    for every ordered band pair the WIDEST possible angular gap is
    bounded at the bands' inner radii, giving a per-band-pair sector
    offset budget.  Candidates = points joined through a broadcast
    (band1, band2, offset) relation on (band, sector) — never all
    pairs; inner (low-radius) bands get wide budgets, outer bands tiny
    ones, which is exactly the hyperbolic geometry.  The exact distance
    filter then decides each candidate.

    ``threshold_margin``: optional dead-band epsilon — candidates with
    |lhs - rhs| < margin are DROPPED instead of decided.  0 for the
    true model; the cross-engine gate uses a tiny margin so a 1-ulp
    libm difference between JVM and DuckDB trig cannot flip a
    boundary pair (documented gate-only robustification).

    Returns (edges(src, dst) canonical, points, R).
    """
    import math

    if plexp <= 2:
        raise ValueError("power-law exponent must be > 2")
    if avg_degree >= n:
        raise ValueError("average degree must be below n")
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(float(n), n * avg_degree / 2.0, alpha)
    pts = hyperbolic_points(
        spark, n, alpha, R, seed=seed, bands=bands, sectors=sectors
    ).localCheckpoint(eager=True)
    coshR = (math.exp(R) + math.exp(-R)) / 2.0

    def _cosh(x):
        return (math.exp(x) + math.exp(-x)) / 2.0

    def _sinh(x):
        return (math.exp(x) - math.exp(-x)) / 2.0

    edges = _hyperbolic_edges(
        spark, pts, R, coshR, bands, sectors, threshold_margin
    )
    return edges, pts, R



def _hyperbolic_edges(
    spark,
    pts,
    R: float,
    coshR: float,
    bands: int,
    sectors: int,
    threshold_margin: float = 0.0,
):
    """Threshold (T = 0) hyperbolic edge set over a derived point
    relation — the band/sector candidate join + exact-distance filter
    factored out of :func:`hyperbolic_graph` so the dynamic generator
    can recompute it per step."""
    import math

    def _cosh(x):
        return (math.exp(x) + math.exp(-x)) / 2.0

    def _sinh(x):
        return (math.exp(x) - math.exp(-x)) / 2.0

    # per ordered band pair: widest angular window at the inner radii
    sector_w = 2 * _PI / sectors
    offs = []
    for b1 in range(bands):
        rb1 = R * b1 / bands
        for b2 in range(bands):
            rb2 = R * b2 / bands
            sh = _sinh(rb1) * _sinh(rb2)
            if sh == 0.0:
                tmax = _PI  # a center point reaches any angle
            else:
                c = (_cosh(rb1) * _cosh(rb2) - coshR) / sh
                if c >= 1.0:
                    continue  # even the easiest pair cannot connect
                tmax = _PI if c <= -1.0 else math.acos(c)
            dmax = min(int(math.ceil(tmax / sector_w)), sectors // 2)
            offs.extend((b1, b2, o) for o in range(dmax + 1))
    off_df = spark.createDataFrame(offs, "b1 long, b2 long, off long")
    p1 = pts.select(
        F.col("id").alias("u"), F.col("band").alias("b1"),
        F.col("sector").alias("s1"), F.col("cosT").alias("c1"),
        F.col("sinT").alias("n1"), F.col("coshr").alias("ch1"),
        F.col("sinhr").alias("sh1"),
    )
    p2 = pts.select(
        F.col("id").alias("v"), F.col("band").alias("b2"),
        F.col("sector").alias("s2"), F.col("cosT").alias("c2"),
        F.col("sinT").alias("n2"), F.col("coshr").alias("ch2"),
        F.col("sinhr").alias("sh2"),
    )
    cand = (
        p1.join(F.broadcast(off_df), "b1")
        .withColumn("s2", (F.col("s1") + F.col("off")) % sectors)
        .join(p2, ["b2", "s2"])
        .filter(F.col("u") != F.col("v"))
    )
    # cos(dtheta) via the per-point cos/sin — per-pair arithmetic only
    lhs = F.col("ch1") * F.col("ch2") - F.col("sh1") * F.col("sh2") * (
        F.col("c1") * F.col("c2") + F.col("n1") * F.col("n2")
    )
    cond = lhs <= F.lit(coshR)
    if threshold_margin > 0.0:
        cond = cond & (
            F.abs(lhs - F.lit(coshR)) >= F.lit(threshold_margin)
        )
    edges = (
        cand.filter(cond)
        .select(F.least("u", "v").alias("src"),
                F.greatest("u", "v").alias("dst"))
        .distinct()
    )
    return edges



# ---------------------------------------------------------------------------
# MocnikGenerator (spatial network model)
# ---------------------------------------------------------------------------


def _chebyshev_ring(dim: int, r: int) -> list[tuple[int, ...]]:
    """Integer offset vectors at Chebyshev norm exactly ``r``."""
    import itertools

    if r == 0:
        return [tuple([0] * dim)]
    return [
        v
        for v in itertools.product(range(-r, r + 1), repeat=dim)
        if max(abs(c) for c in v) == r
    ]


def mocnik_graph(
    spark: SparkSession,
    n: int,
    k: float = 2.5,
    dim: int = 2,
    seed: int = 42,
    weighted: bool = False,
    threshold_margin: float = 0.0,
    cand_factor: int = 4,
):
    """MocnikGenerator (generators/MocnikGenerator.cpp:305-347,
    MocnikGeneratorBasic.cpp:42-92): n points drawn uniformly in the
    ball B_{0.5}(0.5,...,0.5) of [0,1]^dim by rejection sampling; a
    DIRECTED edge i -> j for every pair with
    dist(i, j) <= k * distMin(i), distMin(i) = min_j dist(i, j).
    ``weighted`` stores dist(i, j) as the edge weight (:297).

    Spark-first re-expression of the reference's cell machinery
    (initCellArray/boxSurface/boxVolume, :230-301): points are bucketed
    into a grid of side 1/aMax, aMax = ceil((n/2)^(1/dim) / k) (:234);
    distMin is resolved by EXPANDING CHEBYSHEV RING candidate joins —
    ring r only joins the still-unresolved nodes, and a node is exact
    once dm <= r/aMax (cells with index gap >= r+1 in any dimension are
    > r/aMax away), the relational form of the reference's per-cell
    surface loop (:258-276); the edge range query joins ring r against
    the nodes whose radius k*distMin still reaches it (boxVolume,
    :279-290).  Never an all-pairs product.

    Point draws are md5-derandomized (coordinate j of candidate c =
    md5-frac('mck|seed|j', c)), candidates scanned in index order and
    densely re-ranked after rejection (plans/ids two-phase — no global
    window), so a plain-SQL oracle replays them bit-for-bit.

    ``threshold_margin`` > 0 asserts-by-filter that no candidate pair
    sits within the margin of the k*distMin threshold (the same
    float-boundary dead-band as hyperbolic_graph).

    Returns (edges DataFrame, pts DataFrame (id, x0..x{dim-1}),
    dist_min DataFrame (id, dm)).
    """
    from networkit_spark.plans.ids import dense_ids

    import math

    if dim < 1 or n < 2:
        raise ValueError("dim >= 1 and n >= 2 required")
    if k <= 1.0:
        raise ValueError("k must be > 1 (MocnikGenerator.cpp:314)")
    xcols = [f"x{j}" for j in range(dim)]
    cand = spark.range(cand_factor * n + 64).select(
        F.col("id").alias("i"),
        *[
            _md5_frac(F.lit(f"mck|{seed}|{j}"), F.col("id")).alias(xcols[j])
            for j in range(dim)
        ],
    )
    radius2 = sum(
        ((F.col(c) - 0.5) * (F.col(c) - 0.5) for c in xcols), F.lit(0.0)
    )
    acc = cand.filter(radius2 <= 0.25)
    pts = (
        dense_ids(acc, ["i"], "id")
        .filter(F.col("id") < n)
        .select("id", *xcols)
        .localCheckpoint(eager=True)
    )
    got = pts.count()
    if got < n:
        raise ValueError(
            f"rejection sampling produced {got} < {n} points; raise "
            "cand_factor"
        )

    a_max = max(1, math.ceil((n / 2.0) ** (1.0 / dim) / k))
    ccols = [f"c{j}" for j in range(dim)]
    by_cell = pts.select(
        F.col("id").alias("jid"),
        *[F.col(c).alias(f"y{j}") for j, c in enumerate(xcols)],
        *[
            F.least(
                F.floor(F.col(c) * a_max).cast("int"), F.lit(a_max - 1)
            ).alias(f"t{j}")
            for j, c in enumerate(xcols)
        ],
    ).localCheckpoint(eager=True)
    home = pts.select(
        "id",
        *xcols,
        *[
            F.least(
                F.floor(F.col(c) * a_max).cast("int"), F.lit(a_max - 1)
            ).alias(ccols[j])
            for j, c in enumerate(xcols)
        ],
    )

    dist2 = sum(
        (
            (F.col(c) - F.col(f"y{j}")) * (F.col(c) - F.col(f"y{j}"))
            for j, c in enumerate(xcols)
        ),
        F.lit(0.0),
    )
    dist = F.sqrt(dist2)

    def ring_pairs(nodes, r):
        """nodes (id, x*, c*) x points in cells at Chebyshev ring r."""
        offs = spark.createDataFrame(
            _chebyshev_ring(dim, r),
            ", ".join(f"o{j} int" for j in range(dim)),
        )
        tgt = nodes.join(F.broadcast(offs))
        for j in range(dim):
            tgt = tgt.withColumn(f"t{j}", F.col(ccols[j]) + F.col(f"o{j}"))
            tgt = tgt.filter(
                (F.col(f"t{j}") >= 0) & (F.col(f"t{j}") < a_max)
            )
        return tgt.join(
            by_cell, [f"t{j}" for j in range(dim)]
        ).filter(F.col("jid") != F.col("id"))

    # -- distMin: expanding-ring nearest neighbor.  After searching
    # rings 0..r, dm is exact once dm <= r/aMax (any unexplored cell
    # differs by >= r+1 in some dimension, hence is > r/aMax away) —
    # the relational form of the reference's surface loop (:258-276);
    # each ring joins only the still-unresolved nodes.
    state = home.withColumn("dm", F.lit(None).cast("double"))
    unresolved = state.localCheckpoint(eager=True)
    r = 0
    while True:
        found = (
            ring_pairs(unresolved, r)
            .groupBy(F.col("id").alias("fid"))
            .agg(F.min(dist).alias("fdm"))
        )
        merged = (
            unresolved.join(found, unresolved.id == found.fid, "left")
            .select(
                "id",
                *xcols,
                *ccols,
                F.least(
                    F.coalesce("dm", F.col("fdm")),
                    F.coalesce("fdm", F.col("dm")),
                ).alias("dm"),
            )
        )
        state = (
            merged.unionByName(
                state.join(unresolved.select("id"), "id", "left_anti")
            )
            .localCheckpoint(eager=True)
        )
        unresolved = state.filter(
            F.col("dm").isNull() | (F.col("dm") > r / a_max)
        ).localCheckpoint(eager=True)
        if unresolved.limit(1).count() == 0:
            break
        r += 1
    dist_min = state.select("id", "dm")

    # -- edges: per-ring range query up to ceil(k*dm*aMax) -------------------
    radii = state.select(
        "id",
        *xcols,
        *ccols,
        (F.lit(float(k)) * F.col("dm")).alias("kdm"),
        F.ceil(F.lit(float(k)) * F.col("dm") * a_max).cast("int").alias("ri"),
    ).localCheckpoint(eager=True)
    max_ri = int(radii.agg(F.max("ri").alias("m")).collect()[0]["m"] or 0)
    pieces = []
    for rr in range(0, max_ri + 1):
        active = radii.filter(F.col("ri") >= rr)
        pair = ring_pairs(active, rr).filter(dist <= F.col("kdm"))
        if threshold_margin > 0.0:
            pair = pair.filter(
                F.abs(dist - F.col("kdm")) >= F.lit(threshold_margin)
            )
        cols = [F.col("id").alias("src"), F.col("jid").alias("dst")]
        if weighted:
            cols.append(dist.alias("weight"))
        pieces.append(pair.select(*cols).localCheckpoint(eager=True))
    edges = pieces[0]
    for p in pieces[1:]:
        edges = edges.unionByName(p)
    return edges, pts, dist_min


# ---------------------------------------------------------------------------
# PubWebGenerator (peer-to-peer overlay / "pub web" spatial model)
# ---------------------------------------------------------------------------


def pubweb_graph(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neigh_rad: float = 0.1,
    max_neigh: int = 10,
    seed: int = 42,
    threshold_margin: float = 0.0,
    rank_round: int | None = None,
):
    """PubWeb spatial graph — (points(id, x, y), edges(src, dst, weight)).

    Reference: /root/reference/networkit/cpp/generators/
    PubWebGenerator.cpp:
    - chooseDenseAreaSizes (:105-114): rad_a = MAX_R * f^2 / FACTOR^2
      with f = u*FACTOR + 1 (anti-quadratic), MAX_R = 0.2, FACTOR = 5;
    - chooseClusterSizes (:117-128): num_a = round(F * rad_a^1.5), F =
      n * (A / (A + 2)) / sum(rad^1.5) — equal density per cluster;
    - fillDenseAreas/addNodesToArea (:88-134): center uniform; node =
      center + (cos, sin)(u*2pi) * (u*rad), folded into the unit square
      by ONE +-1 shift (:21-31) — the cluster density is deliberately
      center-heavy (dist uniform, not area-uniform);
    - spreadRemainingNodes (:137-143): uniform until n nodes (when the
      rounded cluster sizes exceed n the reference keeps the excess —
      replicated);
    - determineNeighbors (:47-86): per node, the maxNeigh nearest
      IN-RANGE nodes (torus distance <= neighRad; the self-pair always
      occupies the first slot) are marked; an edge enters the graph the
      SECOND time it is marked — i.e. exactly the MUTUAL-kNN pairs,
      independent of the reference's node processing order — with
      weight BASE_WEIGHT / dist^2 (BASE_WEIGHT = 0.01).

    Documented deviations: every draw is md5-derandomized in (seed,
    role, area/node index) — replayable on any executor count and in
    the DuckDB oracle; distance ties in the top-k rank break by
    (least, greatest) id pair (the reference pops the larger pair
    first, but its RNG never produces exact ties).  ``threshold_margin``
    and ``rank_round`` are the gate-only robustifications against 1-ulp
    JVM/libm trig differences (same stance as hyperbolic_graph): a
    margin drops candidates within it of the radius, rank_round ranks
    on ROUND(d2, rank_round).

    Spark-first shape: candidate pairs come from a 3x3 torus-wrapped
    grid-cell join (cell side >= neighRad, the same relational NN
    pattern as mocnik_graph), never all pairs; the top-k is a window
    over each node's IN-RANGE candidates (bounded by the model's
    density), the mutual filter one self-semi-join.
    """
    import math

    if n <= 0:
        raise ValueError("n must be positive")
    if not (0.0 < neigh_rad <= 0.5):
        raise ValueError("neighRad must be in (0, 0.5]")
    A = int(num_dense_areas)
    MAX_R, FACTOR, BASE_W = 0.2, 5.0, 0.01

    radii = [
        MAX_R * (_py_md5_frac(f"pwf|{seed}", a) * FACTOR + 1.0) ** 2
        / (FACTOR * FACTOR)
        for a in range(A)
    ]
    centers = [
        (_py_md5_frac(f"pwcx|{seed}", a), _py_md5_frac(f"pwcy|{seed}", a))
        for a in range(A)
    ]
    if A > 0:
        fsum = sum(r ** 1.5 for r in radii)
        ffac = (n * (A / (A + 2.0))) / fsum
        # std::round = half away from zero (positive args: floor(x+.5))
        num = [int(math.floor(ffac * r ** 1.5 + 0.5)) for r in radii]
    else:
        num = []
    offs = [0]
    for c in num:
        offs.append(offs[-1] + c)
    total_area = offs[-1]
    n_rest = max(0, n - total_area)

    parts = []
    for a in range(A):
        if num[a] == 0:
            continue
        j = F.col("id")
        ang = F.lit(2 * _PI) * _md5_frac(F.lit(f"pwang|{seed}|{a}"), j)
        dst = F.lit(radii[a]) * _md5_frac(F.lit(f"pwdist|{seed}|{a}"), j)
        x = F.lit(centers[a][0]) + F.cos(ang) * dst
        y = F.lit(centers[a][1]) + F.sin(ang) * dst
        wrap = lambda z: (
            F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)
        )
        parts.append(
            spark.range(num[a]).select(
                (j + offs[a]).alias("id"),
                wrap(x).alias("x"), wrap(y).alias("y"),
            )
        )
    if n_rest > 0:
        i = F.col("id")
        parts.append(
            spark.range(n_rest).select(
                (i + total_area).alias("id"),
                _md5_frac(F.lit(f"pwrx|{seed}"), i).alias("x"),
                _md5_frac(F.lit(f"pwry|{seed}"), i).alias("y"),
            )
        )
    pts = parts[0]
    for p in parts[1:]:
        pts = pts.unionByName(p)
    pts = pts.localCheckpoint(eager=True)

    edges = _pubweb_edges(
        pts, neigh_rad, max_neigh, threshold_margin, rank_round
    )
    return pts, edges


def _pubweb_edges(
    pts,
    neigh_rad: float,
    max_neigh: int,
    threshold_margin: float = 0.0,
    rank_round: int | None = None,
):
    """Mutual-kNN in-range edges (src, dst, weight) over a (id, x, y)
    torus point relation — PubWebGenerator.determineNeighbors (:47-86)
    re-expressed relationally; shared by the static and dynamic
    generators (the dynamic one recomputes it per step, :110-135 of
    DynamicPubWebGenerator.cpp)."""
    import math

    spark = pts.sparkSession
    BASE_W = 0.01  # PubWebGenerator.hpp:67
    C = max(1, int(math.floor(1.0 / neigh_rad)))
    cell = lambda z: F.floor(z * C).cast("long") % C
    p1 = pts.select(
        F.col("id").alias("u"), F.col("x").alias("x1"),
        F.col("y").alias("y1"), cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    p2 = pts.select(
        F.col("id").alias("v"), F.col("x").alias("x2"),
        F.col("y").alias("y2"), cell(F.col("x")).alias("cx2"),
        cell(F.col("y")).alias("cy2"),
    )
    od = sorted({(dx % C, dy % C) for dx in (-1, 0, 1) for dy in (-1, 0, 1)})
    off_df = spark.createDataFrame(od, "dx long, dy long")
    cand = (
        p1.crossJoin(F.broadcast(off_df))
        .withColumn("cx2", (F.col("cx") + F.col("dx")) % C)
        .withColumn("cy2", (F.col("cy") + F.col("dy")) % C)
        .join(p2, ["cx2", "cy2"])
        .filter(F.col("u") != F.col("v"))
    )
    wrapd = lambda z: (
        F.when(z > 0.5, 1.0 - z).when(z < -0.5, z + 1.0).otherwise(z)
    )
    ddx = wrapd(F.col("x1") - F.col("x2"))
    ddy = wrapd(F.col("y1") - F.col("y2"))
    cand = cand.withColumn("d2", ddx * ddx + ddy * ddy)
    rad2 = neigh_rad * neigh_rad
    cond = F.col("d2") <= F.lit(rad2)
    if threshold_margin > 0.0:
        cond = cond & (
            F.abs(F.col("d2") - F.lit(rad2)) >= F.lit(threshold_margin)
        )
    inr = cand.filter(cond).select("u", "v", "d2")
    d2q = (
        F.round(F.col("d2"), rank_round) if rank_round is not None
        else F.col("d2")
    )
    wn = Window.partitionBy("u").orderBy(
        d2q.asc(), F.least("u", "v").asc(), F.greatest("u", "v").asc()
    )
    kept = (
        inr.withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") <= max_neigh - 1)
        .select("u", "v", "d2")
    )
    mutual = kept.join(
        kept.select(F.col("v").alias("u"), F.col("u").alias("v")),
        ["u", "v"], "left_semi",
    )
    edges = (
        mutual.select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
            (F.lit(BASE_W) / F.col("d2")).alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    return edges


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neigh_rad: float = 0.1,
    max_neigh: int = 10,
    steps: int = 2,
    seed: int = 42,
    write_initial: bool = False,
    threshold_margin: float = 0.0,
    rank_round: int | None = None,
) -> DataFrame:
    """DynamicPubWebGenerator event stream — (step, cls, type, u, v, w).

    Reference: /root/reference/networkit/cpp/generators/
    DynamicPubWebGenerator.cpp:25-182 — generate(nSteps): numToDel =
    numToIns = floor(|V| * 0.05) fixed at call time (:26-27); per step,
    delete numToDel random live nodes (incident EDGE_REMOVALs then the
    NODE_REMOVAL, :49-73), insert numToIns nodes with fresh ids and
    cluster-or-noise coordinates — cluster c with probability 1/(A+2)
    each, noise 2/(A+2) (:77-105, Aux::Random::integer(A+1) inclusive);
    then recompute the mutual-kNN structure over the live points and
    diff it against the surviving edges: every surviving-and-still-
    eligible edge re-emits EDGE_WEIGHT_UPDATE (coordinates never move,
    so the weight is unchanged — replicated), no-longer-eligible edges
    emit EDGE_REMOVAL, newly eligible pairs EDGE_ADDITION, then one
    TIME_STEP (:108-180).  ``write_initial`` prepends the initial graph
    as NODE_ADDITION / EDGE_ADDITION events + TIME_STEP (:33-44).

    cls encodes the reference's within-step emission phases: 0 =
    deletion-incident edge removals, 1 = node removals, 2 = node
    additions, 3 = weight updates, 4 = structural edge removals, 5 =
    edge additions, 6 = TIME_STEP; within a class the deterministic
    order is (u, v).  Documented deviations: the numToDel victims are
    the smallest-h13(seed, 'del', step, id) live nodes processed in
    ascending id (the reference rejection-samples ids sequentially —
    any uniform pick is a valid draw); an edge between two victims is
    removed with its smaller endpoint.

    The per-step structure recompute is the shared :func:`_pubweb_edges`
    grid-cell plan (the reference recomputes quadratically, :113 FIXME).
    """
    import math

    A = int(num_dense_areas)
    MAX_R, FACTOR = 0.2, 5.0
    radii = [
        MAX_R * (_py_md5_frac(f"pwf|{seed}", a) * FACTOR + 1.0) ** 2 / 25.0
        for a in range(A)
    ]
    centers = [
        (_py_md5_frac(f"pwcx|{seed}", a), _py_md5_frac(f"pwcy|{seed}", a))
        for a in range(A)
    ]

    pts, edges = pubweb_graph(
        spark, n, num_dense_areas=A, neigh_rad=neigh_rad,
        max_neigh=max_neigh, seed=seed,
        threshold_margin=threshold_margin, rank_round=rank_round,
    )
    pts = pts.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    total = pts.count()
    nmut = int(total * 0.05)
    next_id = int(total)

    ev_schema = (
        "step long, cls long, type string, u long, v long, w double"
    )
    out_parts = []
    if write_initial:
        out_parts.append(
            pts.select(
                F.lit(0).cast("long").alias("step"),
                F.lit(0).cast("long").alias("cls"),
                F.lit("NODE_ADDITION").alias("type"),
                F.col("id").alias("u"), F.lit(-1).cast("long").alias("v"),
                F.lit(0.0).alias("w"),
            )
        )
        out_parts.append(
            edges.select(
                F.lit(0).cast("long").alias("step"),
                F.lit(1).cast("long").alias("cls"),
                F.lit("EDGE_ADDITION").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.col("weight").alias("w"),
            )
        )
        out_parts.append(
            spark.createDataFrame(
                [(0, 6, "TIME_STEP", -1, -1, 0.0)], ev_schema
            )
        )
    first_step = 1 if write_initial else 0

    wrap = lambda z: (
        F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)
    )
    for st in range(first_step, first_step + steps):
        # --- deletions: nmut smallest-h13 live nodes ------------------
        dels = (
            pts.select(
                "id",
                _md5_frac(F.lit(f"pwdel|{seed}|{st}"), F.col("id")).alias("h"),
            )
            .orderBy("h", "id")
            .limit(nmut)
            .select("id")
            .localCheckpoint(eager=True)
        )
        del_edges = (
            edges.join(dels.select(F.col("id").alias("src")), "src", "left_semi")
            .unionByName(
                edges.join(
                    dels.select(F.col("id").alias("dst")), "dst", "left_semi"
                )
            )
            .distinct()
        )
        # emitted with the deleted endpoint as u (smaller endpoint when
        # both are victims)
        dl = dels.select(F.col("id").alias("d"))
        tagged = (
            del_edges.join(
                dl.select(F.col("d").alias("src"), F.lit(1).alias("sdel")),
                "src", "left",
            )
            .join(
                dl.select(F.col("d").alias("dst"), F.lit(1).alias("ddel")),
                "dst", "left",
            )
        )
        out_parts.append(
            tagged.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(0).cast("long").alias("cls"),
                F.lit("EDGE_REMOVAL").alias("type"),
                F.when(F.col("sdel").isNotNull(), F.col("src"))
                .otherwise(F.col("dst")).alias("u"),
                F.when(F.col("sdel").isNotNull(), F.col("dst"))
                .otherwise(F.col("src")).alias("v"),
                F.lit(0.0).alias("w"),
            )
        )
        out_parts.append(
            dels.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(1).cast("long").alias("cls"),
                F.lit("NODE_REMOVAL").alias("type"),
                F.col("id").alias("u"), F.lit(-1).cast("long").alias("v"),
                F.lit(0.0).alias("w"),
            )
        )
        surviving = (
            edges.join(dl.select(F.col("d").alias("src")), "src", "left_anti")
            .join(dl.select(F.col("d").alias("dst")), "dst", "left_anti")
        )
        pts = pts.join(dels, "id", "left_anti")

        # --- insertions: fresh ids, cluster-or-noise coordinates ------
        gi = F.col("id") + next_id
        cdraw = F.floor(
            _md5_frac(F.lit(f"pwinsc|{seed}"), gi) * (A + 2)
        ).cast("long")
        ang = F.lit(2 * _PI) * _md5_frac(F.lit(f"pwinsa|{seed}"), gi)
        dfr = _md5_frac(F.lit(f"pwinsd|{seed}"), gi)
        radc = F.lit(0.0)
        cxc = F.lit(0.0)
        cyc = F.lit(0.0)
        for a in range(A - 1, -1, -1):
            radc = F.when(cdraw == a, F.lit(radii[a])).otherwise(radc)
            cxc = F.when(cdraw == a, F.lit(centers[a][0])).otherwise(cxc)
            cyc = F.when(cdraw == a, F.lit(centers[a][1])).otherwise(cyc)
        clx = wrap(cxc + F.cos(ang) * (dfr * radc))
        cly = wrap(cyc + F.sin(ang) * (dfr * radc))
        nsx = _md5_frac(F.lit(f"pwinsx|{seed}"), gi)
        nsy = _md5_frac(F.lit(f"pwinsy|{seed}"), gi)
        ins = spark.range(nmut).select(
            gi.alias("id"),
            F.when(cdraw < A, clx).otherwise(nsx).alias("x"),
            F.when(cdraw < A, cly).otherwise(nsy).alias("y"),
        )
        next_id += nmut
        out_parts.append(
            ins.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(2).cast("long").alias("cls"),
                F.lit("NODE_ADDITION").alias("type"),
                F.col("id").alias("u"), F.lit(-1).cast("long").alias("v"),
                F.lit(0.0).alias("w"),
            )
        )
        pts = pts.unionByName(ins).localCheckpoint(eager=True)

        # --- structure recompute + diff --------------------------------
        new_edges = _pubweb_edges(
            pts, neigh_rad, max_neigh, threshold_margin, rank_round
        ).localCheckpoint(eager=True)
        surv = surviving.select("src", "dst")
        upd = new_edges.join(surv, ["src", "dst"], "left_semi")
        rem = surviving.join(
            new_edges.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        add = new_edges.join(surv, ["src", "dst"], "left_anti")
        out_parts.append(
            upd.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(3).cast("long").alias("cls"),
                F.lit("EDGE_WEIGHT_UPDATE").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.col("weight").alias("w"),
            )
        )
        out_parts.append(
            rem.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(4).cast("long").alias("cls"),
                F.lit("EDGE_REMOVAL").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.lit(0.0).alias("w"),
            )
        )
        out_parts.append(
            add.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(5).cast("long").alias("cls"),
                F.lit("EDGE_ADDITION").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
                F.col("weight").alias("w"),
            )
        )
        out_parts.append(
            spark.createDataFrame(
                [(st, 6, "TIME_STEP", -1, -1, 0.0)], ev_schema
            )
        )
        edges = new_edges

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    plexp: float = 3.0,
    move_each_step: float = 0.3,
    move_distance: float = 0.1,
    steps: int = 2,
    seed: int = 42,
    bands: int = 16,
    sectors: int = 256,
    threshold_margin: float = 0.0,
):
    """DynamicHyperbolicGenerator (T = 0) event stream —
    (step, cls, type, u, v) with cls 0 = EDGE_ADDITION, 1 =
    EDGE_REMOVAL, 2 = TIME_STEP; returns (events, final_points, R).

    Reference: /root/reference/networkit/cpp/generators/
    DynamicHyperbolicGenerator.cpp — per-node movement vectors drawn
    once (angular uniform(-d, d), radial uniform(-10d, 10d), :77-85);
    per step every node wiggles with probability moveEachStep
    (:281-284); moveNode (:216-260) advances the radial coordinate in
    cosh-cdf space (newcosh = cosh(alpha*r) + alpha*radialMovement)
    bouncing off the boundary (sign of the radial movement flips,
    persistent state) and crossing the center (phi += -+pi), then
    wraps phi after adding angularMovement/newradius; events are the
    symmetric difference of the threshold edge sets before and after
    the move, canonicalized u < v and deduplicated (:319-366) — a pair
    can only change if an endpoint moved, so the full-recompute diff
    equals the reference's per-wiggled-node diff exactly.

    Documented deviations: draws are md5-derandomized ((seed, 'dhw',
    step, id) wiggle, (seed, 'dha'/'dhr', id) movement); the r >= R
    clamp uses R - 1e-12 instead of std::nextafter (:248-250);
    acosh/cosh are spelled via exp/ln exactly like hyperbolic_points so
    both engines agree; ``threshold_margin`` is the gate-only dead-band
    of :func:`hyperbolic_graph`.
    """
    import math

    if plexp <= 2:
        raise ValueError("power-law exponent must be > 2")
    alpha = 0.5 * (plexp - 1)
    R = hyperbolic_target_radius(float(n), n * avg_degree / 2.0, alpha)
    coshR = (math.exp(R) + math.exp(-R)) / 2.0
    maxcdf = (math.exp(alpha * R) + math.exp(-alpha * R)) / 2.0

    pts = hyperbolic_points(
        spark, n, alpha, R, seed=seed, bands=bands, sectors=sectors
    ).select("id", "theta", "r")
    mov = pts.select(
        "id",
        (
            (2.0 * _md5_frac(F.lit(f"dha|{seed}"), F.col("id")) - 1.0)
            * move_distance
        ).alias("amov"),
        (
            (2.0 * _md5_frac(F.lit(f"dhr|{seed}"), F.col("id")) - 1.0)
            * 10.0 * move_distance
        ).alias("rmov"),
    )
    state = pts.join(mov, "id").localCheckpoint(eager=True)
    edges = _hyperbolic_edges(
        spark, _hyperbolic_derive(state, R, bands, sectors), R, coshR,
        bands, sectors, threshold_margin,
    ).localCheckpoint(eager=True)

    two_pi = 2 * _PI
    ev_parts = []
    for st in range(int(steps)):
        wig = _md5_frac(
            F.lit(f"dhw|{seed}|{st}"), F.col("id")
        ) < move_each_step
        ear = F.exp(alpha * F.col("r"))
        calpha = (ear + 1.0 / ear) / 2.0
        nc0 = calpha + alpha * F.col("rmov")
        up = nc0 > maxcdf
        nc1 = F.when(up, 2.0 * maxcdf - nc0).otherwise(nc0)
        lo = nc1 < 1.0
        nc2 = F.when(lo, 2.0 - nc1).otherwise(nc1)
        phi1 = F.when(
            lo,
            F.when(F.col("theta") > _PI, F.col("theta") - _PI).otherwise(
                F.col("theta") + _PI
            ),
        ).otherwise(F.col("theta"))
        sgn = (
            F.when(up, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.when(lo, F.lit(-1.0)).otherwise(F.lit(1.0))
        )
        newr = F.least(
            F.log(nc2 + F.sqrt(nc2 * nc2 - 1.0)) / alpha,
            F.lit(R - 1e-12),
        )
        raw = phi1 + F.col("amov") / newr
        wrapped = (
            F.when(
                raw < 0.0,
                raw + (F.floor(-raw / two_pi) + 1) * two_pi,
            )
            .when(raw > two_pi, raw - F.floor(raw / two_pi) * two_pi)
            .otherwise(raw)
        )
        state = state.select(
            "id",
            F.when(wig, wrapped).otherwise(F.col("theta")).alias("theta"),
            F.when(wig, newr).otherwise(F.col("r")).alias("r"),
            "amov",
            F.when(wig, F.col("rmov") * sgn).otherwise(F.col("rmov"))
            .alias("rmov"),
        ).localCheckpoint(eager=True)
        new_edges = _hyperbolic_edges(
            spark, _hyperbolic_derive(state, R, bands, sectors), R, coshR,
            bands, sectors, threshold_margin,
        ).localCheckpoint(eager=True)
        adds = new_edges.join(edges, ["src", "dst"], "left_anti")
        rems = edges.join(new_edges, ["src", "dst"], "left_anti")
        ev_parts.append(
            adds.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(0).cast("long").alias("cls"),
                F.lit("EDGE_ADDITION").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
            )
        )
        ev_parts.append(
            rems.select(
                F.lit(st).cast("long").alias("step"),
                F.lit(1).cast("long").alias("cls"),
                F.lit("EDGE_REMOVAL").alias("type"),
                F.col("src").alias("u"), F.col("dst").alias("v"),
            )
        )
        ev_parts.append(
            spark.createDataFrame(
                [(st, 2, "TIME_STEP", -1, -1)],
                "step long, cls long, type string, u long, v long",
            )
        )
        edges = new_edges
    ev = ev_parts[0]
    for p in ev_parts[1:]:
        ev = ev.unionByName(p)
    return ev, state, R
