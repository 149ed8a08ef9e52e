"""spark-submit entrypoint: pages table -> PageRank ranking.

Cluster launch (the production shape; BASELINE.json north_rule):

    zip -r engine.zip networkit_spark
    spark-submit --py-files engine.zip jobs/pagerank_job.py \
        --pages /data/pages_parquet --out /data/pr_out \
        --checkpoint /data/pr_state --damp 0.85 --tol 1e-6

Resumable: re-running with the same --checkpoint resumes from the last
completed superstep (see networkit_spark/plans/superstep.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="parquet dir: pages table")
    p.add_argument("--out", required=True, help="output parquet for ranking")
    p.add_argument("--checkpoint", default=None, help="durable superstep state dir")
    p.add_argument("--damp", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--engine", choices=["dataframe", "csr"], default="dataframe")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from networkit_spark.operators.pagerank import DISTRIBUTE_SINKS, pagerank
    from networkit_spark.plans.superstep import Checkpointer
    from networkit_spark.sources.extraction import pages_to_graph

    spark = SparkSession.builder.appName("pagerank_job").getOrCreate()
    pages = spark.read.parquet(args.pages)
    g, url_ids = pages_to_graph(pages)
    ckpt = (
        Checkpointer(spark, path=args.checkpoint, partition_lineage=True)
        if args.checkpoint
        else None
    )
    res = pagerank(
        g,
        damp=args.damp,
        tol=args.tol,
        max_iterations=args.max_iterations,
        distribute_sinks=DISTRIBUTE_SINKS,
        engine=args.engine,
        checkpointer=ckpt,
        resume=args.resume,
    )
    ranking = res.ranking(args.top_k).join(url_ids, "id").select(
        "id", "url", "score"
    )
    ranking.write.mode("overwrite").parquet(args.out)
    print(
        json.dumps(
            {
                "iterations": res.info.iterations,
                "converged": res.info.converged,
                "top_k_written": args.top_k,
                "out": args.out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
