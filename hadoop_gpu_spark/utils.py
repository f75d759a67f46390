"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    cluster has cores.

    Compute-heavy per-row operators (minhash over shingles, simhash bit
    packing, vector math) otherwise inherit the scan's partitioning — and a
    small single-row-group parquet file scans as ONE task, serializing the
    whole operator. At 100 TB inputs arrive in thousands of row groups and
    this is a no-op; on small/test inputs it restores full parallelism at
    the cost of one narrow exchange.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the storage blocks behind an EAGER ``localCheckpoint``-ed
    frame once it is fully consumed.

    ``DataFrame.unpersist()`` does NOT release them (verified against
    this Spark build: the blocks belong to the internal RDD the
    ``LogicalRDD`` plan node wraps, not to the cache manager), so a
    consumed checkpoint otherwise stays resident for the session
    lifetime — the r06 ADVICE leak class. This reaches the plan node's
    RDD and unpersists it directly. The frame is UNUSABLE afterwards
    (its lineage was cut); only call on checkpoints that do not outlive
    the computation, e.g. pq_train's training rows — NOT on query plans
    that return a view over their checkpoint (q11/q20).

    Returns True if blocks were released, False if the frame was not a
    localCheckpoint (or the internals were unreachable — best-effort).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName() != "org.apache.spark.sql.execution.LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False
