"""Superstep runtime: lineage cutting, state checkpointing, metrics, resume.

The reference's iterative kernels run a do-while over shared-memory double
buffers (e.g. PageRank.cpp:66-96 swap at :95). In Spark the equivalent loop
lives on the driver, and two problems the reference never has must be
solved explicitly:

  1. **Lineage blowup** — each superstep's DataFrame plan contains the
     previous one; after ~20 iterations analysis/optimization time and
     stack depth explode. Every superstep therefore cuts lineage, either
     via ``localCheckpoint(eager=True)`` (fast, non-resumable) or by
     writing state to a parquet state table and reading it back
     (durable, resumable — the Iceberg-checkpoint role from the north
     star, with parquet as the sandbox stand-in behind this interface).

  2. **Resumability** — a run killed at superstep k restarts from the
     last durable state: ``Checkpointer.latest()`` scans the state dir;
     kernels accept ``resume=True`` and skip completed supersteps.

Per superstep we append a metrics row (JSONL): superstep number,
convergence scalar, active/changed counts, wall time, partition count and
per-partition row counts (lineage of how state was distributed) — the
"per-superstep checkpoints with lineage + convergence metrics" contract.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cut_lineage(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` with a STATS RESET.

    Spark's Dataset.checkpoint deliberately carries the ORIGIN plan's
    estimated statistics onto the resulting LogicalRDD. For iterative
    kernels that is poison: each superstep's join tree multiplies the
    children's sizeInBytes estimates (SizeInBytesOnlyStatsPlanVisitor),
    so the carried estimate's DIGIT COUNT grows by the number of
    state-leaf instances per round — geometric in supersteps. After a
    few rounds Catalyst burns minutes in BigInteger multiplications
    (Karatsuba/ToomCook frames under LogicalPlan.stats) just PLANNING a
    tiny job; measured here: a 3-node coarse graph whose round-2 move
    job took 278 s with a 950,000-digit sizeInBytes.

    The reset rebuilds the Dataset from the checkpointed InternalRow
    RDD without origin stats (fresh leaf = defaultSizeInBytes, 19
    digits, bounded forever). Same blocks, same schema, same rows —
    only the poisoned estimate is dropped. Falls back to the plain
    checkpoint if the internal constructor is unavailable.

    Spark-private API caveat (supported range: tested against Spark
    4.1.x; 3.5-4.1 share the same ``internalCreateDataFrame`` +
    ``queryExecution().toRdd()`` signatures): unlike Dataset.checkpoint
    we hand the toRdd InternalRows to internalCreateDataFrame without a
    per-row ``.copy()``. That is safe precisely because the source here
    is a CHECKPOINTED LogicalRDD (already-materialized UnsafeRows, not
    reused iterator buffers). The except-fallback only catches a future
    Spark REMOVING the API; a silent row-reuse semantic change would
    not raise — so ``NETWORKIT_SPARK_DEBUG_LINEAGE=1`` turns on a
    round-trip audit (row count + first-row sample vs the plain
    localCheckpoint) that tests/test_checkpoint_resume.py exercises.
    """
    out = df.localCheckpoint(eager=True)
    try:
        spark = out.sparkSession
        jdf = out._jdf
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        result = DataFrame(fresh, spark)
    except Exception:  # pragma: no cover — internal API moved
        return out
    if os.environ.get("NETWORKIT_SPARK_DEBUG_LINEAGE"):
        n_plain, n_fresh = out.count(), result.count()
        if n_plain != n_fresh:
            raise RuntimeError(
                f"cut_lineage stats-reset changed row count: "
                f"{n_plain} -> {n_fresh} (Spark internal API semantics "
                "shifted; fall back to plain localCheckpoint)"
            )
        s_plain = sorted(map(str, out.limit(5).collect()))
        s_fresh = sorted(map(str, result.limit(5).collect()))
        if n_plain and s_plain != s_fresh and out.schema == result.schema:
            # limit(5) rows may legitimately differ across plans only if
            # partition order differs; compare full sorted samples then
            s_plain = sorted(map(str, out.collect()))
            s_fresh = sorted(map(str, result.collect()))
            if s_plain != s_fresh:
                raise RuntimeError(
                    "cut_lineage stats-reset changed row CONTENT — "
                    "Spark internal row-reuse semantics shifted"
                )
    return result


def materialize_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-partition on ``cols``, cache, and materialize.

    For loop-invariant tables (the O(m) flow/adjacency relations) this is
    strictly better than ``localCheckpoint``: an ``InMemoryRelation``
    PRESERVES its outputPartitioning, so every superstep's
    ``scores ⋈ edges on id=src`` sees the edge side as already
    distributed and shuffles only the O(n) score side. A localCheckpoint
    becomes a LogicalRDD whose partitioning Catalyst may not trust,
    re-shuffling O(m) rows every iteration — the difference between a
    viable and a non-viable plan at web scale.
    """
    out = df.repartition(*[F.col(c) for c in cols]).persist()
    out.count()
    return out


@dataclass
class SuperstepResult:
    """What an iterative kernel hands back alongside its result DataFrame."""

    iterations: int
    metrics: list[dict] = field(default_factory=list)
    converged: bool = True


class Checkpointer:
    """Cuts lineage and (optionally) persists per-superstep state.

    ``path=None``  -> in-memory mode: ``localCheckpoint(eager=True)``.
    ``path=dir``   -> durable mode: state parquet under
                      ``dir/state/step=<k>/``, metrics JSONL at
                      ``dir/metrics.jsonl``; supports :meth:`latest`.
    ``every``      -> durable write cadence (localCheckpoint still cuts
                      lineage on the off steps).
    ``keep``       -> retain at most this many durable steps (old ones
                      deleted after a newer write lands).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        every: int = 1,
        keep: int = 2,
        partition_lineage: bool = False,
        cache_states: bool = True,
    ) -> None:
        self.spark = spark
        self.path = path
        self.every = max(1, every)
        self.keep = max(1, keep)
        self.partition_lineage = partition_lineage
        self.cache_states = cache_states
        # cache_states=False skips the persist() layer on in-memory
        # states. Needed by kernels whose per-round plan references the
        # state relation MANY times (PLM: volumes/affinity/current/merge
        # all scan the labels state): each persist registers the state in
        # the session CacheManager, and its attribute-rewriting cache
        # substitution (InMemoryRelation.withOutput) breaks on such trees
        # in Spark 4.x ("java.util.NoSuchElementException: key not found:
        # id#N"). The states are EAGER localCheckpoints either way —
        # their blocks are materialized, so uncached rescans read stored
        # blocks rather than recomputing lineage.
        self._mem_handles: list[DataFrame] = []
        if path:
            os.makedirs(os.path.join(path, "state"), exist_ok=True)

    # -- state -------------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.path, "state", f"step={step}")

    def cut(self, df: DataFrame, step: int) -> DataFrame:
        """Return a lineage-free, re-scannable equivalent of ``df``.

        In-memory mode: ``localCheckpoint`` cuts the lineage, and the
        extra ``persist()`` wraps the checkpoint RDD in an
        InMemoryRelation. The persist is NOT redundant: a plan that scans
        the same localCheckpoint RDD twice (e.g. an iterative kernel
        joining the previous state to itself) re-executes it per scan in
        Spark 4.x, which compounds to exponential superstep times after
        ~20 iterations; the cache layer restores O(1) scans. Handles for
        states older than ``keep`` supersteps are unpersisted.
        """
        if self.path and step % self.every == 0:
            target = self._step_dir(step)
            df.write.mode("overwrite").parquet(target)
            out = self.spark.read.parquet(target)
            self._gc(step)
            return out
        # eager localCheckpoint already ran the superstep job and stored
        # the blocks; persist() is left LAZY — the cache (which guards
        # against per-scan re-execution of checkpoint scans) fills during
        # the next superstep's first scan instead of costing a dedicated
        # count() job here. cut_lineage additionally resets the carried
        # stats estimate (see its docstring) — without it the estimate's
        # size grows geometrically across supersteps
        out = cut_lineage(df)
        if self.cache_states:
            out = out.persist()
            self._mem_handles.append(out)
            while len(self._mem_handles) > self.keep:
                self._mem_handles.pop(0).unpersist()
        return out

    def release(self) -> None:
        """Unpersist every in-memory state handle this checkpointer still
        holds. Call once the final state has been eagerly consumed (or
        re-checkpointed by the caller) — used by kernels that run MANY
        short propagation fixpoints (e.g. the SCC peel) to keep the
        executor block store from accumulating dead O(n) states."""
        while self._mem_handles:
            self._mem_handles.pop().unpersist()

    def _gc(self, newest: int) -> None:
        steps = self.completed_steps()
        for s in steps[: -self.keep]:
            if s != newest:
                shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def completed_steps(self) -> list[int]:
        if not self.path:
            return []
        root = os.path.join(self.path, "state")
        out = []
        for name in os.listdir(root) if os.path.isdir(root) else []:
            if name.startswith("step="):
                # only count steps whose write committed (_SUCCESS marker)
                if os.path.exists(os.path.join(root, name, "_SUCCESS")):
                    out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def latest(self) -> tuple[int, DataFrame] | None:
        """Most recent durable (step, state) for resume, else None."""
        steps = self.completed_steps()
        if not steps:
            return None
        step = steps[-1]
        return step, self.spark.read.parquet(self._step_dir(step))

    # -- metrics -----------------------------------------------------------
    def log(self, step: int, state: DataFrame | None = None, **metrics) -> dict:
        row = {"superstep": step, "ts": time.time(), **metrics}
        if state is not None and self.partition_lineage:
            per_part = (
                state.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            row["partitions"] = {int(r["pid"]): int(r["count"]) for r in per_part}
            row["num_partitions"] = len(per_part)
        if self.path:
            with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")
        return row

    def read_metrics(self) -> list[dict]:
        if not self.path:
            return []
        p = os.path.join(self.path, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
