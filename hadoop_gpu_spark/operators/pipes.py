"""Subprocess operators — the reference's Streaming and Pipes UDF surfaces.

Reference:
- Streaming (S/PipeMapper.java:35, S/PipeMapRed.java:48): any executable
  over stdin/stdout, newline-framed, tab-separated KV.
- Pipes (M/pipes/BinaryProtocol.java:62-80): C++ binaries over a socket
  protocol; here subsumed by the same line protocol (the reference's own
  Pipes defaults all KV to Text — SubmitterToAccels.java:131-135).

Spark restatement: ``rdd.pipe(cmd)`` keeps the exact line-framing contract.
``pipe_map`` runs the command as the map phase; ``pipe_reduce`` feeds it
key-grouped sorted lines (post-shuffle), matching a streaming -reducer.

This is deliberately the ONLY RDD use in the engine — the line protocol is
inherently row-imperative. Native pipelines should use mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def _kv_line_df(rows, spark):
    schema = StructType([StructField("k", StringType()), StructField("v", StringType())])
    return spark.createDataFrame(rows, schema)


def pipe_map(df: DataFrame, command: str, sep: str = "\t") -> DataFrame:
    """Streaming mapper: each row → one ``k<TAB>v`` line on the child's
    stdin; each stdout line parsed back to (k, v) at the first separator
    (S/PipeMapRed.java:342-355 framing)."""
    spark = df.sparkSession
    cols = df.columns

    lines = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]).alias("line")
    ).rdd.map(lambda r: r["line"])
    out = lines.pipe(command).map(lambda l: tuple(l.split(sep, 1)) if sep in l else (l, None))
    return _kv_line_df(out, spark)


def pipe_reduce(
    kv: DataFrame, command: str, sep: str = "\t", num_partitions: int | None = None
) -> DataFrame:
    """Streaming reducer: shuffle on k, sort within partitions, stream
    ``k<TAB>v`` lines (key-contiguous) through the command."""
    spark = kv.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    arranged = kv.repartition(n, "k").sortWithinPartitions("k", "v")
    lines = arranged.select(
        F.concat_ws(sep, F.col("k").cast("string"), F.col("v").cast("string")).alias("line")
    ).rdd.map(lambda r: r["line"])
    out = lines.pipe(command).map(lambda l: tuple(l.split(sep, 1)) if sep in l else (l, None))
    return _kv_line_df(out, spark)
