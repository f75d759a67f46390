"""Deterministic fixed-lattice histogram quantile sketch.

A one-pass, mergeable quantile summary for 100 TB-scale numeric columns:
quantize each value onto an integer lattice (``round(x * scale)`` — e.g.
cents for money columns), bin the lattice units into ``n_buckets``
equal-width integer buckets over a declared ``[lo, hi)`` domain, and count
per bucket. The bucket-count frame IS the sketch:

- **one corpus pass** — a single scan feeding a partial (map-side) +
  final aggregate; only ``(group, bucket, count)`` rows cross the
  exchange, at most ``|groups| * n_buckets`` of them regardless of data
  size;
- **mergeable** — the merge of two sketches is count-sum per bucket
  (commutative + associative), so partial sketches from any partitioning,
  any day-over-day increment, or any shard layout combine exactly; this
  is the property ``groupBy().sum()`` gives for free and merge-order-
  sensitive sketches (GK, KLL) cannot promise;
- **engine-exact** — every step (round-to-lattice, integer floor-div,
  clamp, count, cumulative rank pick) produces bit-identical results on
  Spark and DuckDB, so a differential oracle compares VALUES, not
  tolerance bands;
- **bounded error** — a quantile estimate is the upper edge of the bucket
  containing rank ``ceil(q * n)``; true rank-q order statistics lie within
  one bucket width: error ≤ ``(hi - lo) / n_buckets`` absolute, by
  construction (overflow values clamp into the edge buckets; estimates
  for quantiles landing there degrade to the domain edge — declare
  ``[lo, hi)`` generously).

Why this and not KLL/GK as the differential gate: KLL's compaction is
randomized and GK's merge is order-dependent — their outputs vary with
partition layout, so a value-hash oracle can only ever check tolerance
booleans (which ``q_approx_stats`` already does for Spark's built-in GK,
``percentile_approx``). The fixed lattice trades adaptive resolution for
partition-invariance and cross-engine exactness — the same trade
``similarity.quantize.pq_train`` makes for k-means (integer-lattice Lloyd)
and for the same reason: the strongest available correctness signal is an
oracle that compares the sketch itself.

Reference analog: the per-key counting shape of
M/lib/aggregate/ValueHistogram.java:56 (bucketed counts as a reducer),
re-expressed as a declarative two-level aggregate; the quantile pick is
new surface (beyond-reference, LLM-pipeline: length/score percentile cuts
for filtering thresholds over corpora too large for exact sorts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _lattice_params(lo: float, hi: float, n_buckets: int, scale: int) -> tuple[int, int, int]:
    """(lo_units, hi_units, width_units) — all exact ints."""
    if not (hi > lo):
        raise ValueError("hi must be > lo")
    if n_buckets < 1 or scale < 1:
        raise ValueError("n_buckets and scale must be >= 1")
    lo_units = round(lo * scale)
    hi_units = round(hi * scale)
    width_units = -((lo_units - hi_units) // n_buckets)  # ceil-div, exact
    return lo_units, hi_units, max(1, width_units)


def hist_counts(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
    scale: int = 100,
) -> DataFrame:
    """Build the sketch: ``(group..., bucket, cnt)`` with one corpus pass.

    ``bucket = clamp((round(x*scale) - lo_units) div width_units, 0,
    n_buckets-1)`` — round/div/clamp on BIGINTs, so both engines land
    every value in the same bucket bit-for-bit (Spark HALF_UP round and
    DuckDB round agree for the non-negative lattice; values are clamped
    to the domain BEFORE the floor-division so negative floor semantics
    never enter). NULLs are dropped (they carry no rank), and for
    floating columns so are NaN/±Inf — they carry no usable rank and
    the engines disagree on NaN ordering inside GREATEST/LEAST; dropping
    mirrors DuckDB's ``isfinite`` guard in the SQL twin and is pinned by
    test. Finite-but-huge values (beyond ±2^63 lattice units) CLAMP into
    the edge buckets: the domain clamp runs in DOUBLE space before any
    BIGINT cast, so no finite input can raise CAST_OVERFLOW / a DuckDB
    ConversionException (pinned by the 1e300 edge test).

    Merge contract: ``sketch(A ∪ B) = (sketch(A) ∪ sketch(B))
    .groupBy(group, bucket).sum(cnt)`` — pinned by test.
    """
    group_cols = group_cols or []
    lo_units, hi_units, width_units = _lattice_params(lo, hi, n_buckets, scale)
    # integer DIV, not cast-of-true-division (which rounds toward zero and
    # diverges from floor for negatives); operands are clamped into the
    # domain BEFORE the division so the quotient is always non-negative.
    # The clamp runs in DOUBLE space BEFORE the BIGINT cast: a finite but
    # huge value (1e300) would otherwise raise CAST_OVERFLOW under ANSI
    # mode (and a ConversionException in the DuckDB twin) — one junk value
    # in one shard killing a 100 TB job, the exact hole the NaN/Inf guard
    # closes for non-finite floats. The clamped bounds are lattice units
    # (far below 2^53), so the double→BIGINT cast is exact.
    bucket = F.expr(
        f"CAST((CAST(GREATEST(LEAST(ROUND({col} * {scale}), "
        f"CAST({hi_units - 1} AS DOUBLE)), CAST({lo_units} AS DOUBLE)) AS BIGINT)"
        f" - {lo_units}) DIV {width_units} AS BIGINT)"
    )
    from pyspark.sql.types import DoubleType, FloatType

    keep = F.col(col).isNotNull()
    if isinstance(df.schema[col].dataType, (FloatType, DoubleType)):
        keep = keep & ~F.isnan(col) & (F.abs(F.col(col)) != F.lit(float("inf")))
    return (
        df.filter(keep)
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    counts: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
    scale: int = 100,
) -> DataFrame:
    """Resolve quantiles from a sketch: ``(group..., q, est)``.

    ``est`` is the UPPER edge of the bucket holding rank ``ceil(q * n)``
    (``q`` in (0, 1]); both engines compute the identical double via
    ``(lo_units + (bucket+1) * width_units) / scale``.

    Scale shape: the window runs over at most ``n_buckets`` rows per
    group (the sketch's fixed size, NOT the corpus) — with ``group_cols``
    it parallelizes per group; ungrouped it is a single task over
    ≤ n_buckets rows, which is the point of a sketch.
    """
    group_cols = group_cols or []
    lo_units, _, width_units = _lattice_params(lo, hi, n_buckets, scale)
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    wall = Window.partitionBy(*group_cols)
    cum = counts.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__total", F.sum("cnt").over(wall)
    )
    qlits = F.array(*[F.lit(float(q)) for q in qs])
    exploded = cum.withColumn("q", F.explode(qlits))
    eligible = exploded.filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__total"))
    )
    picked = eligible.groupBy(*group_cols, "q").agg(F.min("bucket").alias("__b"))
    est = (F.lit(lo_units) + (F.col("__b") + F.lit(1)) * F.lit(width_units)) / F.lit(
        float(scale)
    )
    return picked.select(*group_cols, "q", est.alias("est"))


def histogram_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
    scale: int = 100,
) -> DataFrame:
    """One-pass grouped quantile estimates: build + resolve."""
    counts = hist_counts(df, col, group_cols, lo, hi, n_buckets, scale)
    return hist_quantiles(counts, qs, group_cols, lo, hi, n_buckets, scale)


def histogram_quantiles_sql(
    table: str,
    col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    n_buckets: int = 1024,
    scale: int = 100,
) -> str:
    """DuckDB twin (oracle generator) — replays the identical lattice
    arithmetic; deliberately naive SQL (auditability over shuffle count,
    same stance as operators.funnel.funnel_sql)."""
    group_cols = group_cols or []
    lo_units, hi_units, width_units = _lattice_params(lo, hi, n_buckets, scale)
    g = ", ".join(group_cols)
    g_pre = f"{g}, " if g else ""
    part = f"PARTITION BY {g}" if g else ""
    # CAST each q: a bare 0.5 literal types as DECIMAL in DuckDB, and
    # decimal q*total arithmetic would diverge from Spark's double path
    q_values = ", ".join(f"(CAST({float(q)} AS DOUBLE))" for q in qs)
    return f"""
    WITH counts AS (
      SELECT {g_pre}
             CAST((CAST(GREATEST(LEAST(ROUND({col} * {scale}),
                  CAST({hi_units - 1} AS DOUBLE)), CAST({lo_units} AS DOUBLE)) AS BIGINT)
                  - {lo_units}) // {width_units} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} WHERE {col} IS NOT NULL AND isfinite({col})
      GROUP BY ALL
    ), cum AS (
      SELECT {g_pre} bucket, cnt,
             SUM(cnt) OVER ({part} ORDER BY bucket) AS c,
             SUM(cnt) OVER ({part}) AS total
      FROM counts
    )
    SELECT {g_pre} q, CAST(({lo_units} + (MIN(bucket) + 1) * {width_units}) AS DOUBLE) / {float(scale)} AS est
    FROM cum CROSS JOIN (VALUES {q_values}) AS qs(q)
    WHERE c >= CEIL(q * total)
    GROUP BY ALL
    """
