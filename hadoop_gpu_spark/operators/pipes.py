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


# --- Binary protocol (M/pipes/BinaryProtocol.java) -------------------------
#
# The reference's Pipes wire format: Hadoop VInt-prefixed byte strings
# (WritableUtils.writeVInt + raw bytes) carrying message-coded items
# (MAP_ITEM(4) downward, OUTPUT(50) upward, CLOSE(8); BinaryProtocol.java:
# 62-80 and its C++ twin Pipes.hh). pipe_binary reproduces the
# serialization layer faithfully — VInt-framed (code, key, value) records
# over the child's stdin/stdout — while replacing the socket + control
# state machine (START/SET_JOB_CONF/DONE handshake) with process lifetime:
# stdin EOF is CLOSE, child exit 0 is DONE. That is the declared deviation;
# the byte-level KV framing a C++ task would parse is the real thing.

MSG_MAP_ITEM = 4
MSG_OUTPUT = 50
MSG_CLOSE = 8


def write_vint(out, i: int) -> None:
    """Hadoop WritableUtils.writeVInt: single byte for -112..127, else a
    length-prefix byte then big-endian magnitude bytes."""
    if -112 <= i <= 127:
        out.write(bytes([i & 0xFF]))
        return
    length = -112
    if i < 0:
        i ^= -1
        length = -120
    tmp = i
    while tmp:
        tmp >>= 8
        length -= 1
    out.write(bytes([length & 0xFF]))
    size = -(length + 112) if length >= -120 else -(length + 120)
    for idx in range(size - 1, -1, -1):
        out.write(bytes([(i >> (8 * idx)) & 0xFF]))


def _read_exact(stream, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def read_vint(stream) -> int | None:
    first = stream.read(1)
    if not first:
        return None
    b = first[0]
    if b >= 0x80:
        b -= 256
    if -112 <= b <= 127:
        return b
    negative = b < -120
    size = -(b + 120) if negative else -(b + 112)
    data = _read_exact(stream, size)
    if data is None:
        raise EOFError("truncated vint")
    i = 0
    for byte in data:
        i = (i << 8) | byte
    return (i ^ -1) if negative else i


def _write_frame(out, code: int, key: bytes, value: bytes) -> None:
    write_vint(out, code)
    write_vint(out, len(key))
    out.write(key)
    write_vint(out, len(value))
    out.write(value)


def _read_frame(stream):
    code = read_vint(stream)
    if code is None:
        return None
    klen = read_vint(stream)
    key = _read_exact(stream, klen)
    vlen = read_vint(stream)
    value = _read_exact(stream, vlen)
    if key is None or value is None:
        raise EOFError("truncated frame")
    return code, key, value


def pipe_binary(df: DataFrame, command: list[str]) -> DataFrame:
    """Run an external binary with the Pipes BinaryProtocol KV framing:
    every input row goes down as a MAP_ITEM(4) frame, every OUTPUT(50)
    frame read back becomes a (k, v) output row. Arbitrary bytes are safe
    (no newline/tab escaping issues — the reason the reference built a
    binary protocol at all).
    """
    spark = df.sparkSession
    cols = df.columns
    if len(cols) != 2:
        raise ValueError("pipe_binary expects a 2-column (key, value) frame")

    def run_partition(rows):
        import subprocess
        import threading

        proc = subprocess.Popen(command, stdin=subprocess.PIPE, stdout=subprocess.PIPE)

        def feed():
            try:
                for r in rows:
                    _write_frame(
                        proc.stdin,
                        MSG_MAP_ITEM,
                        str(r[0]).encode("utf-8"),
                        str(r[1]).encode("utf-8"),
                    )
                write_vint(proc.stdin, MSG_CLOSE)
                proc.stdin.close()
            except BrokenPipeError:  # child exited early; surfaced via rc below
                pass

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            frame = _read_frame(proc.stdout)
            if frame is None:
                break
            code, key, value = frame
            if code == MSG_OUTPUT:
                yield (key.decode("utf-8"), value.decode("utf-8"))
        t.join()
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"pipe_binary child exited {rc}")

    out = df.select(
        F.col(cols[0]).cast("string"), F.col(cols[1]).cast("string")
    ).rdd.mapPartitions(run_partition)
    return _kv_line_df(out, spark)
