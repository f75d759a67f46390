"""Duplicate-substring span detection (ExactSubstr-style).

Substring-level dedup, completing the family's third granularity:
document-level (exact/MinHash/SimHash/semantic), feature-level (n-gram
Jaccard, winnow fingerprints, sparse all-pairs) — and now SPAN-level:
find every maximal character span of length ≥ k that also occurs in at
least ``min_docs`` distinct documents, per document, as cuttable
``(doc_id, span_start, span_end)`` ranges. This is the declarative
re-expression of the suffix-array substring dedup of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"): their
ExactSubstr cuts duplicated spans ≥ 50 tokens; a suffix array is not a
Spark shape, but the equivalent fixed-k decomposition is — a substring
of length L ≥ k occurs in two documents iff all of its L - k + 1
constituent k-grams occur in both, so position-level k-gram matching
followed by adjacent-position run-merging reconstructs exactly the
maximal duplicated spans (of length ≥ k) at every position.

Semantics (declared, engine-exact end to end — every value an integer
or an md5):
- positions 1..len-k+1 for documents with ``length(text) >= k``
  (character semantics in both engines; shorter documents emit no
  positions — no truncated-shingle edge in THIS operator, unlike
  minhash's one-truncated-shingle convention),
- per-position hash = the portable u32 md5 of ``substr(text, i, k)``
  (the minhash/winnow shingle hash at k=20 instead of 5),
- a position is *duplicated* when its k-gram occurs in ≥ ``min_docs``
  DISTINCT documents (within-doc repetition alone does not trigger —
  that signal is q_repetition_ratio's job),
- maximal spans = the INTERVAL UNION of ``[pos, pos + k - 1]`` over
  duplicated positions (Lee et al. cut the union of duplicated bytes):
  runs split where the gap between consecutive duplicated positions
  exceeds ``k`` (``pos - lag(pos) > k`` ⟺ the character intervals
  neither overlap nor touch), then lag + prefix-sum run-ids per
  document — emitted as ``span_start = min(pos)``, ``span_end =
  max(pos) + k - 1`` (inclusive character range), ``span_len``. Output
  spans per document are disjoint and non-adjacent by construction
  (pinned by test).

Positions are stride-1 DELIBERATELY: a sampling stride would break
cross-document alignment (two copies of the same substring land at
different offsets, so stride-s grids rarely coincide — the misalignment
problem winnowing exists to solve, at the price of approximate spans).
Exact spans need every position; the cost is one md5 per character —
linear, embarrassingly parallel, the same class as the reference
scanning every byte through RegexMapper (X/Grep.java).

100 TB shape: text never shuffles — position hashes are computed at the
scan and only ``(doc_id, pos, h)`` rows (24 bytes) move. The position
frame feeds two consumers (the df-count branch and the span branch), so
it is ``eager_persist``-ed: one materialization, no dual-branch
recompute (plan-pinned). The frequent-gram join is unhinted — its
cardinality is the corpus's duplication rate, AQE's call. Span merging
is a per-document keyed window (state = one document's duplicated
positions, bounded by document length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.types import ArrayType, LongType

from hadoop_gpu_spark.dedup.minhash import _shingle_hashes

DUPSPAN_K = 20


def position_hashes_pandas(text: Column | str, k: int = DUPSPAN_K) -> Column:
    """array<long> of per-position k-gram hashes — the Arrow-batched
    numpy twin of ``_shingle_hashes`` for length ≥ k inputs (the winnow
    fast-path precedent: interpreted HOF lambdas evaluate one md5 call
    per element outside codegen; this runs the same md5s through
    winnow's worker-global distinct-shingle cache — natural-language
    k-gram vocabularies repeat heavily, so most calls are dict hits).
    Bit-identical to the expression variant by test
    (tests/test_r12_candidates.py::test_dup_spans_pandas_matches_expression)."""
    from pyspark.sql.functions import pandas_udf

    from hadoop_gpu_spark.dedup.winnow import _hash_shingle

    @pandas_udf(ArrayType(LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        def one(t: str):
            t = t if t is not None else ""
            return [_hash_shingle(t[i : i + k]) for i in range(len(t) - k + 1)]

        return texts.map(one)

    c = F.col(text) if isinstance(text, str) else text
    return _udf(c)


# Bounded output-chunk height for the row-emitting kernel: each yielded
# frame is at most this many (id, pos, h) rows, so Arrow buffer growth
# stays ~50 MB per yield instead of one giant array column per batch.
POSITION_CHUNK_ROWS = 1 << 21


def _position_rows(base: DataFrame, k: int) -> DataFrame:
    """(__id, pos, h) rows straight from the Arrow kernel in bounded
    chunks — the r13 replacement for the array<long>-column +
    JVM-posexplode form, whose per-batch array buffers (10k docs x
    ~300 positions x 8 B, power-of-two vector growth) triggered 128 MB
    GCLocker allocation stalls in the sf10 soak. Same rows, same
    hashes (winnow's cached md5 u32), positions 1..len-k+1."""
    import numpy as np

    from hadoop_gpu_spark.dedup.winnow import _hash_shingle

    def gen(batches):
        acc_ids: list[int] = []
        acc_lens: list[int] = []
        acc_h: list[np.ndarray] = []
        n_buf = 0

        def flush():
            nonlocal acc_ids, acc_lens, acc_h, n_buf
            if not n_buf:
                return None
            out = pd.DataFrame(
                {
                    "__id": np.repeat(
                        np.asarray(acc_ids, dtype=np.int64), acc_lens
                    ),
                    "pos": np.concatenate(
                        [np.arange(1, ln + 1, dtype=np.int64) for ln in acc_lens]
                    ),
                    "h": np.concatenate(acc_h),
                }
            )
            acc_ids, acc_lens, acc_h, n_buf = [], [], [], 0
            return out

        for pdf in batches:
            for i, t in zip(pdf["__id"], pdf["text"]):
                t = t if t is not None else ""
                n = len(t) - k + 1
                if n <= 0:
                    continue
                acc_ids.append(int(i))
                acc_lens.append(n)
                acc_h.append(
                    np.fromiter(
                        (_hash_shingle(t[j : j + k]) for j in range(n)),
                        dtype=np.int64,
                        count=n,
                    )
                )
                n_buf += n
                if n_buf >= POSITION_CHUNK_ROWS:
                    yield flush()
        tail = flush()
        if tail is not None:
            yield tail

    return base.mapInPandas(gen, schema="__id long, pos long, h long")


def _check(k: int, min_docs: int) -> None:
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would mark every position)")


def dup_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUPSPAN_K,
    min_docs: int = 2,
    use_pandas: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated spans per document:
    ``(doc_id, span_start, span_end, span_len)`` — see the module
    docstring for the exactness and scale contracts. ``use_pandas``
    selects the Arrow-batched hash kernel (default; bit-identical to
    the expression spec, which remains the oracle-parity anchor)."""
    from hadoop_gpu_spark.utils import eager_persist, ensure_min_partitions

    _check(k, min_docs)
    base = docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("text")).filter(
        F.length("text") >= k
    )
    if use_pandas:
        pos = eager_persist(_position_rows(ensure_min_partitions(base), k))
    else:
        pos = eager_persist(
            base.select(
                "__id", F.posexplode(_shingle_hashes("text", k)).alias("pos0", "h")
            ).select("__id", (F.col("pos0") + 1).cast("long").alias("pos"), "h")
        )
    freq = (
        pos.select("__id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("h")
    )
    dup = pos.join(freq, "h", "left_semi").select("__id", "pos")
    w = Window.partitionBy("__id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(F.lit(1))
    runs = dup.withColumn("brk", brk).withColumn(
        "run",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.groupBy("__id", "run")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
        )
    )


def dup_substring_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUPSPAN_K,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`dup_substring_spans`: same position grid
    (SELECT-position ``unnest(range(...))`` — the lateral-free per-row
    range idiom), same md5 hash, same distinct-doc threshold, same
    lag/prefix-sum run merge. BIGINT casts keep driver-safe types."""
    _check(k, min_docs)
    return f"""
    WITH p0 AS (
      SELECT {id_col} AS id, {text_col} AS t,
             unnest(range(1, length({text_col}) - {k - 1} + 1)) AS pos
      FROM {table} WHERE length({text_col}) >= {k}),
    pos AS (
      SELECT id, CAST(pos AS BIGINT) AS pos,
             ('0x' || substr(md5(substr(t, CAST(pos AS INTEGER), {k})), 1, 8))::BIGINT AS h
      FROM p0),
    freq AS (
      SELECT h FROM (
        SELECT h, COUNT(DISTINCT id) AS ndocs FROM pos GROUP BY h)
      WHERE ndocs >= {min_docs}),
    dup AS (SELECT id, pos FROM pos WHERE h IN (SELECT h FROM freq)),
    runs AS (
      SELECT id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY id ORDER BY pos) <= {k}
                  THEN 0 ELSE 1 END AS brk
      FROM dup),
    rid AS (
      SELECT id, pos,
             SUM(brk) OVER (PARTITION BY id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM runs)
    SELECT id AS {id_col},
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {k} - 1 AS BIGINT) AS span_end,
           CAST(MAX(pos) + {k} - 1 - MIN(pos) + 1 AS BIGINT) AS span_len
    FROM rid GROUP BY id, run
    """
