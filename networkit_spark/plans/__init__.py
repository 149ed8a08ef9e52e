from networkit_spark.plans.superstep import Checkpointer, SuperstepResult

__all__ = ["Checkpointer", "SuperstepResult"]
