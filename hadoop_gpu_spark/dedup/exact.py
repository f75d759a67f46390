"""Exact deduplication via content-hash groupBy.

Scale shape: md5 at scan → groupBy on the 128-bit hash (one shuffle of
(hash, id) pairs only — the text itself never shuffles) → keep min id.
Skew-free: content hashes are uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.functions.hashing import md5_hex


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per content-hash: the canonical (min-id) survivor and copy count."""
    return (
        df.select(md5_hex(text_col).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies"))
    )
