"""Interval overlap join — bucketed, shuffle-bounded, distinct-free.

Beyond-reference relational operator (SURVEY.md §2.3 lists only equi /
composite joins; the reference engine has no interval join at all): all
(left, right) pairs whose half-open intervals ``[l_lo, l_hi)`` and
``[r_lo, r_hi)`` overlap — ``l_lo < r_hi AND r_lo < l_hi`` — optionally
under extra equi-key conjuncts. The workhorse behind span-vs-span
joins a training-data pipeline runs: document spans vs redaction
ranges, session windows vs incident windows, validity ranges vs query
ranges.

Spark has no native interval join; a raw ``df.join(on=<range
predicate>)`` compiles to BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons, a plan that dies at any real scale. The classic
distributed formulation (DeWitt's partitioned band join; the same
bucketization Spark's own range-join hints use on Databricks) is:

1. explode each interval into the coarse buckets of width ``W`` it
   touches (``sequence(floor(lo/W), floor((hi-1)/W))`` — half-open, so
   an interval ending exactly on a boundary does NOT enter the next
   bucket),
2. shuffle both sides on ``(equi keys..., bucket)`` — a plain hash
   join; per-bucket fan-out is bounded by interval density per bucket,
   never |L|·|R|,
3. re-check the EXACT overlap predicate on the joined pair,
4. keep a pair only in its CANONICAL bucket — the bucket containing
   ``greatest(l_lo, r_lo)`` (the overlap start, which by construction
   lies in exactly one bucket both sides exploded into): a pair whose
   intervals co-occupy k buckets survives in exactly one, so NO
   ``distinct`` — the dedupe that would otherwise shuffle the full
   pair stream again is a free filter.

100 TB shape: two narrow exploded shuffles (ids + endpoints only — the
caller joins payload columns back by id afterwards if needed), one
equi-join, zero nested loops, zero distincts. Explosion factor is
``ceil(span/W)`` per row — pick ``W`` near the typical interval length
so most rows explode to 1-2 buckets. Skewed buckets (a hot day, a
giant interval) fall to AQE skew-join splitting like any other hash
join; a pathological interval spanning the whole domain should be
range-clamped by the caller first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_INTEGRAL = {"byte", "tinyint", "short", "smallint", "int", "integer", "bigint", "long"}


def _require_integral(df: DataFrame, cols: tuple[str, str], side: str) -> None:
    """Endpoints must be integral: ``floor((hi - 1) / W)`` is the
    half-open upper bucket ONLY on an integer lattice — for a float
    interval [1.0, 8.5) with W=8, ``hi - 1 = 7.5`` buckets to 0 and the
    row never reaches bucket 1, silently dropping overlaps (r11
    ADVICE). Cast dates to epoch days / timestamps to epoch seconds (or
    scale floats to a fixed-point grid) before calling."""
    for c in cols:
        t = dict(df.dtypes).get(c)
        if t not in _INTEGRAL:
            raise ValueError(
                f"{side} endpoint column {c!r} must be integral, got {t!r}: "
                "half-open bucketing uses (hi - 1), which is only correct on "
                "an integer lattice — cast dates/timestamps/floats to an "
                "integer grid first"
            )


def _bucketed(
    df: DataFrame, lo: str, hi: str, width: int, side: str
) -> DataFrame:
    """Explode one side into (row, bucket) — integer endpoints, half-open."""
    lo_b = F.floor(F.col(lo) / F.lit(width))
    hi_b = F.floor((F.col(hi) - F.lit(1)) / F.lit(width))
    return df.withColumn(
        f"__{side}_bucket",
        F.explode(F.sequence(lo_b.cast("long"), hi_b.cast("long"))),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """All pairs with ``[l_lo, l_hi) ∩ [r_lo, r_hi) ≠ ∅`` (and equal
    ``keys``), as a bucketed hash join — no nested loop, no distinct.

    Endpoints must be integers (cast dates to epoch days / timestamps
    to epoch seconds first); empty intervals (``lo >= hi``) match
    nothing and are dropped up front. ``keys`` is a list of
    ``(left_col, right_col)`` equi-conjuncts composited into the join
    key — the handle a caller uses to bound fan-out (shard id, tenant,
    same-day, ...).
    """
    pairs, _, _ = _overlap_pairs(
        left, right, l_lo, l_hi, r_lo, r_hi, bucket_width, keys
    )
    return pairs.drop("__l_bucket", "__r_bucket")


def _overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    keys: list[tuple[str, str]] | None,
):
    """Shared core: returns (joined-and-filtered pairs, lb, rb) so
    callers can keep DataFrame-qualified column handles."""
    keys = keys or []
    _require_integral(left, (l_lo, l_hi), "left")
    _require_integral(right, (r_lo, r_hi), "right")
    l = left.filter(F.col(l_lo) < F.col(l_hi))
    r = right.filter(F.col(r_lo) < F.col(r_hi))
    lb = _bucketed(l, l_lo, l_hi, bucket_width, "l")
    rb = _bucketed(r, r_lo, r_hi, bucket_width, "r")
    # every endpoint reference below is DataFrame-qualified (lb[...] /
    # rb[...]): with F.col() an overlap join between two frames sharing
    # endpoint column names (spans vs spans) either failed analysis as
    # ambiguous or silently bound both conjuncts to one side (r11
    # ADVICE) — the exact caller the operator exists for.
    cond = lb["__l_bucket"] == rb["__r_bucket"]
    for lk, rk in keys:
        cond = cond & (lb[lk] == rb[rk])
    overlap = (lb[l_lo] < rb[r_hi]) & (rb[r_lo] < lb[l_hi])
    canonical = (
        F.floor(F.greatest(lb[l_lo], rb[r_lo]) / F.lit(bucket_width))
        == lb["__l_bucket"]
    )
    return lb.join(rb, on=cond).filter(overlap & canonical), lb, rb


def interval_overlap_count(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    keys: list[tuple[str, str]] | None = None,
    count_alias: str = "n_overlaps",
) -> DataFrame:
    """Overlap join + per-left-group count — the common aggregate form
    (``how many X windows intersect each Y window``). Left rows with no
    overlapping right rows are kept with a zero count (left semantics a
    plain join+group would silently drop)."""
    pairs, lb, _ = _overlap_pairs(
        left, right, l_lo, l_hi, r_lo, r_hi, bucket_width, keys
    )
    # group cols are LEFT columns by contract — qualify them so a right
    # side sharing the name cannot make the groupBy ambiguous
    counts = pairs.groupBy(*[lb[g] for g in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias(count_alias)
    )
    base = left.select(*group_cols).distinct()
    return base.join(counts, on=group_cols, how="left").select(
        *group_cols,
        F.coalesce(F.col(count_alias), F.lit(0)).cast("long").alias(count_alias),
    )


def interval_overlap_count_sql(
    left_src: str,
    right_src: str,
    group_cols: list[str],
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    key_pairs: list[tuple[str, str]] | None = None,
    count_alias: str = "n_overlaps",
) -> str:
    """ANSI twin of :func:`interval_overlap_count` for the DuckDB
    oracle: a literal overlap-predicate join + left-join count. DuckDB
    plans this as an IEJoin — the single-node range-join answer; the
    bucketed form is the distributed one. ``left_src`` / ``right_src``
    are parenthesized sub-selects or table names exposing the endpoint
    and key columns."""
    keys = key_pairs or []
    # the empty-interval guards are load-bearing: for NONEMPTY intervals
    # the two overlap conjuncts are exactly interval intersection, but an
    # empty [5,5) would still satisfy them against [0,10) — the Spark
    # side filters empties before bucketing, so the twin must too
    on = [
        f"l.{l_lo} < l.{l_hi}",
        f"r.{r_lo} < r.{r_hi}",
        f"l.{l_lo} < r.{r_hi}",
        f"r.{r_lo} < l.{l_hi}",
    ]
    on += [f"l.{lk} = r.{rk}" for lk, rk in keys]
    gl = ", ".join(f"l.{g}" for g in group_cols)
    gsel = ", ".join(f"l.{g} AS {g}" for g in group_cols)
    return f"""
    SELECT {gsel}, CAST(COUNT(r.{r_lo}) AS BIGINT) AS {count_alias}
    FROM {left_src} l
    LEFT JOIN {right_src} r
      ON {" AND ".join(on)}
    GROUP BY {gl}
    """
