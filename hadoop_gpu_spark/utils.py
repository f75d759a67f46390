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
