"""GPU resource declaration — SURVEY.md §4.4 item 3.

The reference declares per-node heterogeneous slots in cluster config
(4 CPU + 1 GPU map slots, H/conf/mapred-site.xml:15-21) and the scheduler
fills them per device. Spark's public equivalent is stage-level
scheduling: a ResourceProfile attached to the GPU-path stage makes those
tasks land only on executors that advertise GPUs
(``spark.executor.resource.gpu.amount`` / ``spark.task.resource.gpu.amount``).

Local mode does not support custom resource profiles, so ``apply_profile``
degrades to a no-op there (the routing itself — hybrid.run_hybrid — still
works; only the placement constraint is cluster-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def gpu_task_profile(cpus_per_task: int = 1, gpus_per_task: float = 1.0):
    """Build a task ResourceProfile requesting ``gpus_per_task`` GPUs —
    attach to the GPU path's stage via ``apply_profile``."""
    from pyspark.resource import ResourceProfileBuilder, TaskResourceRequests

    reqs = TaskResourceRequests().cpus(cpus_per_task).resource("gpu", gpus_per_task)
    return ResourceProfileBuilder().require(reqs).build


def cluster_supports_gpu_scheduling(spark: SparkSession) -> bool:
    """True when the cluster manager supports stage-level scheduling with
    custom profiles AND executors advertise a gpu resource."""
    master = spark.sparkContext.master
    if master.startswith("local"):
        return False
    amount = spark.conf.get("spark.executor.resource.gpu.amount", None)
    return amount is not None and float(amount) > 0


def apply_profile(df: DataFrame, profile) -> DataFrame:
    """Pin a DataFrame's computation stage to a resource profile.

    DataFrame plans can't carry profiles directly (RDD-level API), so this
    drops to the RDD boundary for the pinned stage: rdd.withResources —
    use for the GPU slice inside run_hybrid on a real cluster. No-op when
    unsupported (local mode).
    """
    spark = df.sparkSession
    if not cluster_supports_gpu_scheduling(spark):
        return df
    schema = df.schema
    rdd = df.rdd.withResources(profile)
    return spark.createDataFrame(rdd, schema)
