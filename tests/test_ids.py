"""plans/ids.py — partitioned dense renumbering must equal the global
window it replaces, for any partition layout."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from networkit_spark.plans.ids import dense_ids


def _global_window_ids(df, col):
    return {
        r[col]: r["want"]
        for r in df.withColumn(
            "want", F.row_number().over(Window.orderBy(col)) - 1
        ).collect()
    }


@pytest.mark.parametrize("n,parts", [(1, 1), (7, 3), (500, 32), (1000, 7)])
def test_dense_ids_matches_global_window(spark, n, parts):
    # non-sorted, non-dense, shuffled input keys
    keys = [((i * 7919) % (3 * n), ) for i in range(n)]
    df = spark.createDataFrame(sorted(set(keys)), "k long").repartition(parts)
    got = {r["k"]: r["new_id"] for r in dense_ids(df, ["k"]).collect()}
    assert got == _global_window_ids(df, "k")


def test_dense_ids_strings(spark):
    df = spark.createDataFrame(
        [("b",), ("aa",), ("z",), ("a",)], "k string"
    )
    got = {r["k"]: r["new_id"] for r in dense_ids(df, ["k"]).collect()}
    assert got == {"a": 0, "aa": 1, "b": 2, "z": 3}


def test_dense_ids_composite_key(spark):
    rows = [(1, 2), (0, 5), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r["a"], r["b"]): r["new_id"] for r in dense_ids(df, ["a", "b"]).collect()}
    assert got == {(0, 1): 0, (0, 5): 1, (1, 0): 2, (1, 2): 3}


def test_dense_ids_empty(spark):
    df = spark.createDataFrame([], "k long")
    assert dense_ids(df, ["k"]).count() == 0


def test_dense_ids_no_unpartitioned_window(spark):
    """The physical plan must not contain a global (unpartitioned) sort
    feeding a window — the WindowExec warning shape."""
    df = spark.range(100).select(F.col("id").alias("k"))
    plan = dense_ids(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line:
            assert "_pid" in line  # partitioned by the stamped pid
