"""Scalable dense-id assignment (distributed zipWithIndex).

The reference's dense 0-based id space (Globals.hpp:29) and
Partition::compact (GenericPartition.hpp:200) both need "rank every key
in global sort order". The naive Spark spelling —
``row_number() over (Window.orderBy(key))`` — is a single-partition
global sort: every row flows through ONE task (Spark logs
``WindowExec: No Partition Defined for Window operation``), which is a
non-plan at web scale (billions of urls / labels).

This module replaces it with the classic two-phase renumbering:

  1. ``repartitionByRange(key)`` — global order becomes (partition
     index, within-partition order); stamp each row with its physical
     partition id and materialize ONCE (``localCheckpoint``) so both
     phases observe the same (sampled, hence otherwise re-randomized)
     range layout;
  2. rank within each partition with a window PARTITIONED BY the stamped
     partition id (parallel, no global sort), then add the exclusive
     prefix sum of per-partition counts — a #shuffle-partitions-sized
     array collected to the driver and broadcast back.

The assigned ids are the same dense 0..k-1 ranks the global window
would produce (range boundaries only decide WHERE a key is ranked, not
its rank), so every oracle that states "ids ordered by X" is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "new_id",
    descending: bool = False,
) -> DataFrame:
    """Append ``id_col`` = dense 0..k-1 rank of each row in the global
    ``order_cols`` order. Rows must be unique on ``order_cols`` (callers
    rank distinct key sets), so row_number == dense_rank.
    """
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    order = [F.col(c).desc() if descending else F.col(c).asc() for c in order_cols]
    staged = (
        df.repartitionByRange(n_part, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (int(r["_pid"]), int(r["count"]))
        for r in staged.groupBy("_pid").count().collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = spark.createDataFrame(offsets or [], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order)
    return (
        staged.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_pid", "_off")
    )
