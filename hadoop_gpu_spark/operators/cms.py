"""Count-min sketch: mergeable frequency estimates in fixed space.

The frequency-sketch sibling of the fixed-lattice quantile sketch
(``operators/quantiles.py`` — distribution in ``|groups| * n_buckets``
state; this module: per-item counts in ``d * w`` state). Reference
analog: the long-count reducer family (M/lib/aggregate/
LongValueSum.java, ValueHistogram.java:56) re-expressed as a bounded
lattice of counters; the sketch itself (Cormode & Muthukrishnan 2005)
is beyond-reference, LLM-pipeline surface: token/n-gram frequency
tracking over corpora (or streams) whose exact vocabulary aggregate is
unaffordable or — in the streaming case — whose exact groupBy state
would grow with vocabulary size, while CMS state is a FIXED ``d * w``
counter grid no matter how many distinct tokens flow through.

Design (all of it engine-exact, so the oracle compares values):
- ``d`` independent hash rows; row ``i`` maps a value to column
  ``md5_u32(value, seed=i+1) % w`` (``functions.hashing.hash_u32`` —
  md5 is bit-identical in Spark, DuckDB, and hashlib, unlike either
  engine's native hash()).
- build = explode each input row into its ``d`` cells + count per cell:
  ONE corpus pass, one aggregate exchange carrying at most ``d * w``
  rows per upstream partition after map-side combine — the sketch never
  exceeds ``d * w`` cells regardless of data size.
- merge IS count-sum per cell (commutative + associative): shards,
  day-over-day increments, and stream micro-batches combine exactly —
  the property that makes the streaming form's complete-mode state
  fixed-size.
- point estimate = MIN over the ``d`` cells a value hashes to (absent
  cells count 0). Estimates NEVER undercount; overcount is bounded by
  (2/w) * total_count with probability 1 - (1/2)^d (the classic CMS
  guarantee, with exact integer arithmetic end to end).

The estimate surface takes a BOUNDED query set (literal values — the
BM25 query-set stance): estimating needs the candidates named, and the
candidate problem is separate (exact top-k is affordable in Spark's
batch engine; CMS earns its keep where state must not grow — streams,
or pre-aggregation membership filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.functions.hashing import hash_u32


def _check_params(d: int, w: int) -> None:
    if d < 1 or w < 1:
        raise ValueError("d and w must be >= 1")


def cms_build(
    df: DataFrame,
    col: str,
    d: int = 4,
    w: int = 512,
    group_cols: list[str] | None = None,
    distinct_first: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(group..., row_id, col_id, cnt)`` — at most
    ``|groups| * d * w`` rows. One pass, map-side-combined aggregate.

    ``distinct_first`` (r16 optimization, guide §1.2/§2.3): aggregate
    value counts BEFORE hashing, so the ``d`` md5 row hashes run once
    per DISTINCT value instead of once per occurrence — under Zipf/
    Heaps token statistics that is orders of magnitude less hash work.
    EXACT by sum-commutativity: cell cnt = Σ over values hashing to the
    cell of that value's occurrence count, whether the grid aggregate
    sums 1s per occurrence or pre-summed per-value counts. BATCH PATHS
    ONLY — a streaming caller must keep the single-aggregate form
    (False), because the pre-aggregate would add a second, value-keyed
    stateful operator: unbounded state, and multiple streaming
    aggregations are rejected by the planner anyway. A streaming caller
    that pre-counts STATELESSLY (per batch partition — see
    streaming.cms_stream_snapshot) passes its count column as
    ``weight_col`` instead; the same sum-commutativity argument makes
    any partition/batch-local pre-sum exact.

    ``weight_col``: ``df`` already carries one row per (group..., value)
    with a count — hash each row once and SUM THE WEIGHTS.
    """
    _check_params(d, w)
    if distinct_first and weight_col is not None:
        raise ValueError("distinct_first and weight_col are mutually exclusive")
    gcols = list(group_cols or [])
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("row_id"),
                (hash_u32(col, seed=i + 1) % F.lit(w)).alias("col_id"),
            )
            for i in range(d)
        ]
    )
    if distinct_first:
        df = df.groupBy(*gcols, col).agg(F.count(F.lit(1)).alias("__c"))
        weight_col = "__c"
    if weight_col is not None:
        return (
            df.select(*gcols, F.col(weight_col).alias("__w"), F.inline(cells))
            .groupBy(*gcols, "row_id", "col_id")
            .agg(F.sum("__w").cast("long").alias("cnt"))
        )
    return (
        df.select(*gcols, F.inline(cells))
        .groupBy(*gcols, "row_id", "col_id")
        .agg(F.sum(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    values: list[str],
    d: int = 4,
    w: int = 512,
    value_alias: str = "value",
) -> DataFrame:
    """Point estimates for a bounded literal query set:
    ``(value, est_cnt)`` with ``est_cnt = MIN`` over the value's ``d``
    cells (0 for cells the corpus never touched). The query frame is
    ``|values| * d`` literal rows — AQE broadcasts it; the sketch-side
    join partner is the ``d * w``-row sketch, so nothing here scales
    with the corpus.
    """
    _check_params(d, w)
    if not values:
        raise ValueError("values must be non-empty")
    spark = sketch.sparkSession
    q = spark.createDataFrame([(v,) for v in sorted(set(values))], f"{value_alias} string")
    qcells = q.select(
        value_alias,
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("row_id"),
                        (hash_u32(value_alias, seed=i + 1) % F.lit(w)).alias("col_id"),
                    )
                    for i in range(d)
                ]
            )
        ),
    )
    return (
        qcells.join(sketch, ["row_id", "col_id"], "left")
        .groupBy(value_alias)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_cnt"))
    )


def cms_token_estimates(
    docs: DataFrame,
    query_tokens: list[str],
    text_col: str = "text",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """The composed gate op: CMS over the corpus token stream, then
    point estimates for a literal token set — ``(token, est_cnt)``.
    One corpus scan; the token stream never shuffles (cells do —
    bounded at ``d * w`` per partition after map-side combine)."""
    from hadoop_gpu_spark.operators.fields import tokenize

    toks = docs.select(F.explode(tokenize(text_col)).alias("tok"))
    # batch path: hash distinct tokens, not occurrences (exact — see
    # cms_build); the token-count pre-aggregate map-side combines, so
    # only (token, cnt) vocab rows shuffle instead of the token stream
    sketch = cms_build(toks, "tok", d, w, distinct_first=True)
    return cms_estimate(sketch, query_tokens, d, w, value_alias="token")


def cms_token_estimates_sql(
    table: str,
    query_tokens: list[str],
    text_col: str = "text",
    d: int = 4,
    w: int = 512,
) -> str:
    """DuckDB twin of :func:`cms_token_estimates`: same tokenizer
    spelling, same md5 row hashes (``hash_u32_sql``), same min-over-
    coalesced-cells estimate. BIGINT casts keep driver-safe types."""
    _check_params(d, w)
    if not query_tokens:
        raise ValueError("query_tokens must be non-empty")
    toks = f"list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> '')"
    seeds = ", ".join(f"({i})" for i in range(d))
    qvals = ", ".join(f"('{t}')" for t in sorted(set(query_tokens)))

    def cell(value_expr: str) -> str:
        # hash_u32(value, seed=row_id+1) % w, spelled for DuckDB — the
        # seed suffix ':<seed>' matches functions.hashing.hash_u32.
        h = f"('0x' || substr(md5({value_expr} || ':' || CAST(row_id + 1 AS VARCHAR)), 1, 8))::BIGINT"
        return f"{h} % {w}"

    return f"""
    WITH toks AS (
      SELECT unnest({toks}) AS tok FROM {table}),
    seeds AS (SELECT * FROM (VALUES {seeds}) s(row_id)),
    sketch AS (
      SELECT CAST(row_id AS BIGINT) AS row_id, {cell("tok")} AS col_id,
             CAST(SUM(1) AS BIGINT) AS cnt
      FROM toks CROSS JOIN seeds
      GROUP BY 1, 2),
    qcells AS (
      SELECT token, CAST(row_id AS BIGINT) AS row_id, {cell("token")} AS col_id
      FROM (VALUES {qvals}) q(token) CROSS JOIN seeds)
    SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_cnt
    FROM qcells LEFT JOIN sketch USING (row_id, col_id)
    GROUP BY token
    """
