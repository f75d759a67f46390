"""Test-table loader for the driver-generated TPC-H-ish star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under a scale-factor
directory.

At 100 TB these would be partitioned/bucketed tables; the loader keeps the
access pattern identical (``spark.read.parquet`` → Catalyst handles filter
pushdown and column pruning) so the same query code runs on both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # Timestamp semantics must not depend on who built the session: pin
    # UTC (timestamp literals/formatting in queries assume it).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); without this runtime conf
        # any externally-created session (e.g. the driver's) fails with
        # PARQUET_TYPE_ILLEGAL. Set it here so the loader is self-sufficient.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet, read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong) — convert to a
        # micro-truncated timestamp. Queries must not expose raw ts at
        # sub-second precision (oracle engines keep the nanos).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table; also registers each as a temp view for spark.sql."""
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
