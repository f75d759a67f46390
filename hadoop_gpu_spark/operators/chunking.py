"""Sliding-window document chunking — the context-window prep pass of an
LLM training/RAG pipeline (split every document into fixed-size,
optionally overlapping token chunks, keyed for downstream dedup/packing).

No reference analog (beyond-ref LLM-pipeline operator, same family as
dedup/sequence-pack); the token split follows TokenCountMapper's
StringTokenizer semantics (``operators/fields.py:tokenize`` — whitespace
runs, empties dropped) so chunk contents agree with every other
tokenized operator in the engine.

Scale design: pure column expressions — split / sequence / explode /
slice / concat_ws / md5 are all JVM whole-stage-codegen built-ins, so
the pass is map-only NARROW (zero shuffles at any corpus size; the only
data growth is the chunk fan-out itself, ~n_tokens/stride rows per doc,
which is the job's output, not overhead). Python never touches the hot
path. At 100 TB this runs as one scan shaped by
``spark.sql.files.maxPartitionBytes``; downstream groupBys shuffle the
compact (doc_id, chunk_id, hash) triples, never the text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.operators.fields import tokenize

# Explicit whitespace class, spelled identically on both engines (the
# normalize_text discipline): Java's \s is EXACTLY [ \t\n\x0B\f\r], but
# RE2's \s omits \x0B — so a bare '\s+' oracle diverges from the Spark
# side on documents containing a vertical tab (the r06 ADVICE finding).
# Using the explicit class keeps chunk_documents bit-identical to
# tokenize()'s Java-\s semantics on EVERY input while making the DuckDB
# twin agree on \x0B too (pinned by
# tests/test_pending_gates.py::test_chunk_engine_parity_on_edge_strings).
_WS_CLASS = r"[ \t\n\x0B\f\r]+"


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into token chunks of ``window`` tokens taken
    every ``stride`` tokens (overlap = window - stride; the final chunk
    may be shorter). Empty documents (zero tokens) produce no chunks.

    Returns (id_col, chunk_id, start_token, n_tokens, chunk_hash) with
    chunk_hash = md5 of the space-rejoined token slice — the compact key
    a downstream exact-dedup / packing stage groups on.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokenize(text_col, pattern=_WS_CLASS)
    n = F.size(toks)
    starts: Column = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, window)
    return (
        df.select(id_col, toks.alias("__toks"), F.explode(starts).alias("start"))
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start_token"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.encode(F.concat_ws(" ", chunk), "UTF-8")).alias("chunk_hash"),
        )
    )


def chunk_sql(table: str, id_col: str, text_col: str, window: int = 64, stride: int = 48) -> str:
    """DuckDB twin of :func:`chunk_documents` (oracle generator) — same
    tokenization (regexp split on the explicit Java-\\s whitespace class,
    empties filtered) and the same 1-based inclusive slice arithmetic."""
    return f"""
    WITH t AS (
      SELECT {id_col},
             list_filter(regexp_split_to_array({text_col}, '{_WS_CLASS}'), x -> x <> '') AS toks
      FROM {table}),
    s AS (
      -- SELECT-position unnest of the scalar list range(): per-row start
      -- positions without a lateral table function (DuckDB's
      -- generate_series table function cannot take lateral column args);
      -- range() end is exclusive, so starts are 0, stride, ... < |toks|,
      -- and empty docs unnest to zero rows.
      SELECT {id_col}, toks, unnest(range(0, len(toks), {stride})) AS start
      FROM t)
    SELECT {id_col},
           CAST(start // {stride} AS BIGINT) AS chunk_id,
           CAST(start AS BIGINT) AS start_token,
           CAST(len(list_slice(toks, start + 1, start + {window})) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + {window}), ' ')) AS chunk_hash
    FROM s
    """
