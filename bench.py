"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}`` plus informational keys (pagerank edges/sec, graph sizes).

``--scaling`` mode (BASELINE.md protocol): run the SAME PageRank job on
the SAME deterministic RMAT web graph at local[N] and local[4N]
(default 8 vs 32), report throughput at both and the scaling
efficiency eff = (edges/s at 4N) / (4 x edges/s at N). This is the
sandbox stand-in for N vs 4N executors (no real cluster here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_webgraph(spark, n_nodes: int, n_edges: int, seed: int = 42):
    """Deterministic RMAT power-law digraph -> undirected Graph."""
    from pyspark.sql import functions as F

    from networkit_spark.graph import Graph
    from networkit_spark.sources.pages import gen_webgraph_edges

    import pandas as pd

    arr = gen_webgraph_edges(n_nodes, n_edges, seed=seed)
    pdf = pd.DataFrame({"src": arr[:, 0], "dst": arr[:, 1]})
    edges = (
        spark.createDataFrame(pdf)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    g = Graph(edges=edges, vertices=None, directed=False, weighted=False)
    g.edges = g.edges.localCheckpoint(eager=True)
    return g


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def pagerank_job(spark, g, iters: int = 10):
    from networkit_spark.operators.pagerank import pagerank

    res = pagerank(g, max_iterations=iters, tol=0.0)
    return res.scores.count()


def run_headline(sf_dir: str, cpus: int) -> dict:
    from networkit_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    import __spark_entry__ as entrymod
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.plp import plp
    from networkit_spark.operators.triangles import triangle_counts

    queries: dict[str, float] = {}
    qs = entrymod.queries()

    # contract queries over the sf tables (the driver's own workload)
    for name in [
        "graph_pagerank", "graph_cc", "graph_triangles", "graph_plp",
        "dedup_exact", "dedup_minhash_candidates", "text_quality",
        "text_token_count", "sim_cosine_topk", "events_agg",
    ]:
        sec, _ = timed(lambda: qs[name](spark, sf_dir).collect())
        queries[name] = round(sec, 3)

    # web-scale kernel bench on the deterministic RMAT graph
    n_nodes, n_edges = 1 << 17, 1 << 21
    g = build_webgraph(spark, n_nodes, n_edges)
    m = g.number_of_edges()
    pr_iters = 10
    sec, _ = timed(lambda: pagerank_job(spark, g, pr_iters))
    queries["webgraph_pagerank10"] = round(sec, 3)
    edges_per_sec = pr_iters * 2 * m / sec  # adjacency rows per superstep

    sec, _ = timed(lambda: connected_components(g)[0].count())
    queries["webgraph_cc"] = round(sec, 3)
    sec, _ = timed(lambda: triangle_counts(g).count())
    queries["webgraph_triangles"] = round(sec, 3)
    sec, _ = timed(lambda: plp(g, max_iterations=4)[0].count())
    queries["webgraph_plp4"] = round(sec, 3)

    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline wall time (graph kernels + doc pipeline)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "webgraph": {"nodes": n_nodes, "gen_edges": n_edges, "dedup_edges": m},
        "pagerank_edges_per_sec": round(edges_per_sec),
        "cpus": cpus,
    }
    spark.stop()
    return out


def run_scaling(levels=(8, 32), n_nodes=1 << 20, n_edges=1 << 24, iters=10) -> dict:
    """Scaling needs a compute-bound graph: at 2M edges the superstep is
    scheduling-latency-bound and extra cores measure nothing; 16M edges
    (~33M adjacency rows/superstep) keeps all cores busy."""
    from networkit_spark.session import get_spark

    results = {}
    for cpus in levels:
        spark = get_spark(
            app_name=f"bench_scaling_{cpus}",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
        g = build_webgraph(spark, n_nodes, n_edges)
        m = g.number_of_edges()
        # warmup superstep (JIT + shuffle file init)
        pagerank_job(spark, g, 1)
        sec, _ = timed(lambda: pagerank_job(spark, g, iters))
        results[cpus] = {
            "wall_sec": round(sec, 3),
            "edges_per_sec": round(iters * 2 * m / sec),
        }
        spark.stop()
    lo, hi = min(levels), max(levels)
    eff = results[hi]["edges_per_sec"] / (
        (hi / lo) * results[lo]["edges_per_sec"]
    )
    return {
        "metric": f"PageRank scaling local[{lo}] -> local[{hi}]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "graph": {"nodes": n_nodes, "edges": n_edges, "iters": iters},
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_headline(sf_dir, cpus)))
