"""Epidemic simulation (SEIR) as a superstep loop over a node-state
relation.

Reference: /root/reference/networkit/cpp/simulation/EpidemicSimulationSEIR.cpp
- states (enum :  Susceptible=0, Exposed=1, Infectious=2, Removed=3);
  the start node is set Infectious with timestamp 0 before the loop
  (:80-84), then for each timestep t < tMax a sweep (:47-70) promotes
  Exposed nodes with t - timestamp >= exposedTime to Infectious,
  lets Infectious nodes contact their neighbors (each contact exposes a
  Susceptible neighbor with probability transP, :39-45), retires
  Infectious nodes with t - timestamp >= infectiousTime to Removed, and
  a census (:72-76) appends one (start, t, state, count) row per state.

Documented deviations (deterministic synchronous semantics):
- the reference sweeps nodes with parallelForNodes and contacts mutate
  shared state mid-sweep, so its exact outcome is schedule-dependent;
  we define one synchronous step: promotions/retirements read the state
  at the START of the step, contacts come from nodes Infectious at the
  START of the step (a node promoted E->I this step does not contact
  until the next step — same as the reference's single-branch sweep).
- the per-contact coin is md5-derandomized: contact u->v at step t
  succeeds iff the first 13 hex nibbles of md5('seir|seed|t|u|v') <= p
  * 2^52, so the DuckDB oracle replays every step bit-exactly.

Spark-first: state is one (id, st, ts) relation, each step is two
joins (exposure = adjacency semi-join against the infectious set) and
a column-wise CASE; the census is a 4-row aggregate per step.  No
collect of node state — only the bounded 4-row census per timestep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.superstep import Checkpointer

TWO52 = 1 << 52

SUSCEPTIBLE, EXPOSED, INFECTIOUS, REMOVED = 0, 1, 2, 3


def _draw(seed: int, t: int, threshold: int):
    """md5 coin for contact (src -> dst) at step t: frac <= threshold."""
    h = F.md5(
        F.concat_ws(
            "|",
            F.lit(f"seir|{seed}|{t}"),
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
        )
    )
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long") <= F.lit(threshold)
    )


def epidemic_simulation_seir(
    g: Graph,
    t_max: int = 8,
    trans_p: float = 0.3,
    exposed_time: int = 2,
    infectious_time: int = 3,
    start: int | None = None,
    seed: int = 42,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(start, t, state, cnt) — 4 census rows (states 0..3) per step."""
    spark = g.edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    if start is None:
        start = int(g.nodes().agg(F.min("id")).first()[0])
    threshold = int(trans_p * TWO52)
    adj = g.adj().select("src", "dst").localCheckpoint(eager=True)

    state = g.nodes().select(
        "id",
        F.when(F.col("id") == start, F.lit(INFECTIOUS))
        .otherwise(F.lit(SUSCEPTIBLE))
        .alias("st"),
        F.lit(0).cast("long").alias("ts"),
    )
    state = ckpt.cut(state, 0)

    census_rows: list[tuple[int, int, int, int]] = []
    for t in range(t_max):
        # contacts from nodes Infectious at the start of the step
        exposed_ids = (
            adj.join(
                state.filter(F.col("st") == INFECTIOUS).select(
                    F.col("id").alias("src")
                ),
                "src",
            )
            .filter(_draw(seed, t, threshold))
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("hit", F.lit(True))
        )
        promote_i = (F.col("st") == EXPOSED) & (
            F.lit(t) - F.col("ts") >= exposed_time
        )
        retire_r = (F.col("st") == INFECTIOUS) & (
            F.lit(t) - F.col("ts") >= infectious_time
        )
        expose_e = (F.col("st") == SUSCEPTIBLE) & F.col("hit").isNotNull()
        state = ckpt.cut(
            state.join(exposed_ids, "id", "left").select(
                "id",
                F.when(promote_i, F.lit(INFECTIOUS))
                .when(retire_r, F.lit(REMOVED))
                .when(expose_e, F.lit(EXPOSED))
                .otherwise(F.col("st"))
                .alias("st"),
                F.when(promote_i | retire_r | expose_e, F.lit(t))
                .otherwise(F.col("ts"))
                .cast("long")
                .alias("ts"),
            ),
            t + 1,
        )
        # bounded census: 4 rows per step
        counts = {
            int(r["st"]): int(r["cnt"])
            for r in state.groupBy("st").agg(F.count("*").alias("cnt")).collect()
        }
        for s in (SUSCEPTIBLE, EXPOSED, INFECTIOUS, REMOVED):
            census_rows.append((start, t, s, counts.get(s, 0)))

    return spark.createDataFrame(
        census_rows, "start long, t long, state long, cnt long"
    )
