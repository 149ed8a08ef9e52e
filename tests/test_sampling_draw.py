"""plans/sampling.py — hub-safe bucketed predecessor draw.

The draw must be value-identical to the old single-window cumulative
sort (round-4 verdict perf_weak #3) for every bucket width, including a
star-hub predecessor set where the old plan put all O(deg) rows in one
sorted window partition.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.plans.sampling import bucketed_pred_draw, pred_bucket_width


def _single_window_draw(preds, u01):
    """The pre-round-5 plan, kept here as the semantics oracle."""
    w = Window.partitionBy("i").orderBy("z")
    return (
        preds.withColumn("cum", F.sum("sz").over(w))
        .withColumn("thr", u01 * F.col("st_"))
        .filter(F.col("cum") > F.col("thr"))
        .groupBy("i", "s")
        .agg(F.min(F.struct("z", "zd")).alias("pick"))
        .select("i", "s", F.col("pick.z").alias("z"), F.col("pick.zd").alias("zd"))
    )


def _preds(spark, n_preds: int, n_samples: int = 5):
    """Star-hub predecessor set: every sample's current node has ALL
    n_preds predecessors, integer-valued sigmas (path counts)."""
    return (
        spark.range(n_samples)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(n_preds).select(F.col("id").alias("z")))
        .select(
            "i",
            F.lit(7).cast("long").alias("s"),
            "z",
            # integer-valued double sigma, varies by z so the cum walk
            # is non-trivial
            (F.col("z") % 5 + 1).cast("double").alias("sz"),
            F.lit(1).cast("long").alias("zd"),
        )
        .withColumn("st_", F.sum("sz").over(Window.partitionBy("i")))
    )


def _u01(seed: int = 42):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|p|"), F.col("i").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**13))
    )


@pytest.mark.parametrize("width", [1, 7, 64, 100_000])
def test_bucketed_draw_matches_single_window(spark, width):
    preds = _preds(spark, n_preds=400).cache()
    got = sorted(
        tuple(r) for r in bucketed_pred_draw(preds, _u01(), width).collect()
    )
    want = sorted(tuple(r) for r in _single_window_draw(preds, _u01()).collect())
    preds.unpersist()
    assert got == want
    assert len(got) == 5  # one pick per sample


def test_star_hub_bucket_bounds_partition_rows(spark):
    """With DRAW_BUCKETS range buckets over a 2000-predecessor hub, the
    phase-3 sort sees only the chosen bucket's rows — assert the picked
    row is identical AND that a bucket holds at most ceil(deg/buckets)
    rows (the quantity the old plan put in ONE partition)."""
    deg = 2000
    width = pred_bucket_width(deg - 1)  # ids 0..deg-1
    preds = _preds(spark, n_preds=deg, n_samples=3).cache()
    got = sorted(
        tuple(r) for r in bucketed_pred_draw(preds, _u01(), width).collect()
    )
    want = sorted(tuple(r) for r in _single_window_draw(preds, _u01()).collect())
    per_bucket = (
        preds.withColumn("bkt", F.floor(F.col("z") / F.lit(width)))
        .groupBy("i", "bkt")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    preds.unpersist()
    assert got == want
    assert per_bucket <= width  # deg/DRAW_BUCKETS rows, not deg
