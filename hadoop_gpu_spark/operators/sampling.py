"""Scan-level predicates and deterministic samplers.

Reference: SequenceFileInputFilter (SURVEY.md §2.1) — keep records whose key
matches a regex (``M/SequenceFileInputFilter.java:103``), hashes into a
1-in-f sample (PercentFilter, ``:146``), or MD5-buckets into 1-in-f
(MD5Filter, ``:195``); plus InputSampler's split/random/interval samplers
(``M/lib/InputSampler.java:49,162,251``).

All deterministic (md5-based, engine-portable) so results are reproducible
and oracle-checkable — unlike ``df.sample`` whose RNG is engine-private.
Filters here are plain predicates → Catalyst pushes them into the parquet
scan (PushedFilters for the regex prefix case; row-group pruning otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.functions.hashing import bucket


def regex_filter(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """RegexFilter — M/SequenceFileInputFilter.java:103."""
    return df.filter(F.col(col).rlike(pattern))


def md5_sample(df: DataFrame, key_col: str, frequency: int, seed: int = 0) -> DataFrame:
    """MD5Filter — keep keys whose md5 bucket is 0 mod frequency.

    Reference: M/SequenceFileInputFilter.java:195 (MD5(key) % f == 0).
    """
    return df.filter(bucket(key_col, frequency, seed) == 0)


def percent_sample(df: DataFrame, key_col: str, frequency: int, seed: int = 1) -> DataFrame:
    """PercentFilter — hashcode % f == 0 (M/SequenceFileInputFilter.java:146).

    Same contract as md5_sample with a different hash seed (the reference
    uses Java hashCode; any uniform deterministic hash satisfies the spec).
    """
    return df.filter(bucket(key_col, frequency, seed) == 0)


def interval_sample(df: DataFrame, order_col: str, interval: int) -> DataFrame:
    """IntervalSampler — every interval-th record in key order
    (M/lib/InputSampler.java:251). Deterministic via rank over the ordering.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % interval == 0)
        .drop("__rn")
    )
