"""Dynamic graph sources — GraphEvent streams for the streaming/
dynamics consumers.

References (/root/reference/networkit/cpp/generators/):
- DynamicPathGenerator.cpp:12-29 — one new node per step, chained to
  its predecessor; the only fully-relational member of the family
  (the whole stream is a projection of the step index).
- DynamicDorogovtsevMendesGenerator.cpp:14-54 — initial triangle,
  then per step one node connecting to BOTH endpoints of a uniformly
  chosen existing edge (edge index order = insertion order).
- DynamicBarabasiAlbertGenerator.cpp:22-79 — initial k-path; per step
  one node with k distinct degree-proportional targets chosen by
  cumulative-degree scan in ascending node id (rand <=
  deg(v) boundary, :57-70), degSum updated AFTER selection.
- DynamicForestFireGenerator.cpp:21-139 — initial single node; per
  step a uniform ambassador is burned, then a BFS of geometric
  out-edge (and, directed, r-scaled in-edge) burns; the new node
  connects to every burned node in burn order.
- DynamicDGSParser.cpp is covered by sources/graphio.read_dgs (the
  DGS event relation IS this engine's native dynamic form).

Determinism contract (same stance as the static dorogovtsev_mendes /
havel_hakimi builders, which the reference also builds sequentially):
the growth recurrences are inherently sequential — each step's draw
domain depends on every prior step — so the stream is computed by an
md5-derandomized driver loop at fixture scale and returned as an
event DataFrame (step, cls, type, u, v, w) for the distributed
consumers (streaming/dynamics.apply_events, Dyn* kernels).  Documented
deviations: within a step, multi-edge emissions order ascending
(the reference iterates an unordered_set / adjacency storage); the
forest-fire ambassador is rank-⌊u·n⌋ over live ids (the reference
rejection-samples an inclusive id bound that can exceed the max id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.sources.generators import _py_md5_frac

EV_SCHEMA = "step long, cls long, type string, u long, v long, w double"


def dynamic_path_events(spark: SparkSession, steps: int) -> DataFrame:
    """DynamicPathGenerator.cpp:12-29: NODE_ADDITION(0); per step s
    (1-based node id) NODE_ADDITION(s), EDGE_ADDITION(s-1, s, 1.0),
    TIME_STEP.  Fully relational — three projections of range(steps)."""
    s = F.col("id") + 1
    nodes0 = spark.range(1).select(
        F.lit(0).cast("long").alias("step"), F.lit(0).cast("long").alias("cls"),
        F.lit("NODE_ADDITION").alias("type"),
        F.lit(0).cast("long").alias("u"), F.lit(-1).cast("long").alias("v"),
        F.lit(0.0).alias("w"),
    )
    nodes = spark.range(int(steps)).select(
        s.alias("step"), F.lit(0).cast("long").alias("cls"),
        F.lit("NODE_ADDITION").alias("type"),
        s.alias("u"), F.lit(-1).cast("long").alias("v"), F.lit(0.0).alias("w"),
    )
    edges = spark.range(int(steps)).select(
        s.alias("step"), F.lit(1).cast("long").alias("cls"),
        F.lit("EDGE_ADDITION").alias("type"),
        (s - 1).alias("u"), s.alias("v"), F.lit(1.0).alias("w"),
    )
    ticks = spark.range(int(steps)).select(
        s.alias("step"), F.lit(2).cast("long").alias("cls"),
        F.lit("TIME_STEP").alias("type"),
        F.lit(-1).cast("long").alias("u"), F.lit(-1).cast("long").alias("v"),
        F.lit(0.0).alias("w"),
    )
    return nodes0.unionByName(nodes).unionByName(edges).unionByName(ticks)


def dynamic_dorogovtsev_mendes_events(
    spark: SparkSession, steps: int, seed: int = 42
) -> DataFrame:
    """DynamicDorogovtsevMendesGenerator.cpp:14-54 — the initial
    triangle block (step 0), then per step the uniformly drawn edge's
    endpoints; edge index e = ⌊u·m⌋ over the insertion-ordered list
    (the reference's Aux::Random::integer(m-1))."""
    ev: list[tuple] = []
    for i in range(3):
        ev.append((0, 0, "NODE_ADDITION", i, -1, 0.0))
    tri = [(0, 1), (1, 2), (2, 0)]
    for a, b in tri:
        ev.append((0, 1, "EDGE_ADDITION", a, b, 1.0))
    ev.append((0, 2, "TIME_STEP", -1, -1, 0.0))
    edges = list(tri)
    u = 2
    for st in range(1, int(steps) + 1):
        u += 1
        ev.append((st, 0, "NODE_ADDITION", u, -1, 0.0))
        e = min(
            int(_py_md5_frac("ddm", seed, st) * len(edges)), len(edges) - 1
        )
        s0, t0 = edges[e]
        edges.append((s0, u))
        edges.append((t0, u))
        ev.append((st, 1, "EDGE_ADDITION", u, s0, 1.0))
        ev.append((st, 1, "EDGE_ADDITION", u, t0, 1.0))
        ev.append((st, 2, "TIME_STEP", -1, -1, 0.0))
    return spark.createDataFrame(ev, EV_SCHEMA)


def dynamic_barabasi_albert_events(
    spark: SparkSession, steps: int, k: int, seed: int = 42
) -> DataFrame:
    """DynamicBarabasiAlbertGenerator.cpp:22-79 — step 0 is
    initializeGraph's k-path; per step one node picks k DISTINCT
    degree-proportional targets: attempt t draws rand =
    ⌊u·(degSum+1)⌋ and scans nodes in ascending id, stopping at the
    first v != new with rand <= deg(v) (rand -= deg(v) otherwise);
    duplicates re-draw (the reference's set-retry loop).  Edges emit
    ascending (unordered_set order in the reference)."""
    if k < 1:
        raise ValueError("k must be at least 1")
    ev: list[tuple] = []
    deg: list[int] = []
    for i in range(int(k)):
        ev.append((0, 0, "NODE_ADDITION", i, -1, 0.0))
        deg.append(0)
    for i in range(1, int(k)):
        ev.append((0, 1, "EDGE_ADDITION", i - 1, i, 1.0))
        deg[i - 1] += 1
        deg[i] += 1
    deg_sum = sum(deg)
    for st in range(1, int(steps) + 1):
        u = len(deg)
        deg.append(0)
        ev.append((st, 0, "NODE_ADDITION", u, -1, 0.0))
        targets: set[int] = set()
        t = 0
        while len(targets) < k:
            rand = int(
                _py_md5_frac("dba", seed, st, t) * (deg_sum + 1)
            )
            t += 1
            for v in range(u):
                if rand <= deg[v]:
                    targets.add(v)
                    break
                rand -= deg[v]
        for v in sorted(targets):
            ev.append((st, 1, "EDGE_ADDITION", u, v, 1.0))
            deg[u] += 1
            deg[v] += 1
            deg_sum += 2
        ev.append((st, 2, "TIME_STEP", -1, -1, 0.0))
    return spark.createDataFrame(ev, EV_SCHEMA)


def dynamic_forest_fire_events(
    spark: SparkSession,
    steps: int,
    p: float,
    directed: bool = False,
    r: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """DynamicForestFireGenerator.cpp:21-139 — step 0 adds the lone
    seed node; per later step: ambassador a = rank-⌊u·n⌋ live node,
    BFS burn where each processed node w keeps drawing (q, index)
    pairs, burning an unvisited neighbor per draw until q > p (out)
    / q > p*r (in, directed), the drawn neighbor removed by
    swap-with-last; the new node connects to every burned node in
    burn order."""
    ev: list[tuple] = []
    out_adj: list[list[int]] = [[]]
    in_adj: list[list[int]] = [[]]
    ev.append((0, 0, "NODE_ADDITION", 0, -1, 0.0))
    ev.append((0, 2, "TIME_STEP", -1, -1, 0.0))
    from collections import deque

    for st in range(1, int(steps) + 1):
        n = len(out_adj)
        a = min(int(_py_md5_frac("dff|a", seed, st) * n), n - 1)
        v = n
        out_adj.append([])
        in_adj.append([])
        ev.append((st, 0, "NODE_ADDITION", v, -1, 0.0))
        visited = {a}
        active = deque([a])
        burned = [a]

        def select(w: int, prob: float, neigh: list[int], tag: str):
            valid = [x for x in neigh if x not in visited]
            chosen = set()
            t = 0
            while True:
                q = _py_md5_frac(f"dff|q{tag}", seed, st, w, t)
                if q > prob or not valid:
                    break
                ix = min(
                    int(
                        _py_md5_frac(f"dff|i{tag}", seed, st, w, t)
                        * len(valid)
                    ),
                    len(valid) - 1,
                )
                chosen.add(valid[ix])
                valid[ix] = valid[-1]
                valid.pop()
                t += 1
            return chosen

        while active:
            w = active.popleft()
            edges = select(w, p, out_adj[w], "f")
            if directed:
                edges |= select(w, p * r, in_adj[w], "b")
            for x in sorted(edges):
                active.append(x)
                burned.append(x)
                visited.add(x)
        for w in burned:
            ev.append((st, 1, "EDGE_ADDITION", v, w, 1.0))
            out_adj[v].append(w)
            in_adj[w].append(v)
            if not directed:
                out_adj[w].append(v)
                in_adj[v].append(w)
        ev.append((st, 2, "TIME_STEP", -1, -1, 0.0))
    return spark.createDataFrame(ev, EV_SCHEMA)
