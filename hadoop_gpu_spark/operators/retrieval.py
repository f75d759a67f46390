"""Distributed BM25 ranked retrieval over a document corpus.

Beyond-ref IR operator — the ranked-retrieval primitive next to TF-IDF.
The reference's Grep family (X/Grep.java: regex match + count + sort) is
boolean retrieval with a popularity sort; Okapi BM25 is what any search
or RAG-retrieval product built on the same corpus runs instead: scored
term matching with document-length normalization.

100 TB shape:
- the QUERY SET is the bounded side: its distinct terms prune the
  exploded token stream AT THE SCAN (literal isin filter), so only
  (doc, query-term) rows — a vanishing fraction of the corpus token
  stream — survive into any aggregate, and the corpus text never
  shuffles.
- df rides the tf frame as COUNT(*) OVER (PARTITION BY term) — the
  q_tfidf_topterms pattern: no vocabulary broadcast, no second tokenize
  pass; N and the corpus token total either arrive precomputed via
  ``corpus_stats`` (ONE corpus scan total — the per-corpus-stats-table
  path a 100 TB deployment runs) or ride the plan as a broadcast
  1-row aggregate (two in-plan scans, zero driver barriers — the
  operator is a pure lazy plan constructor either way; no collect).
- scoring is pure column arithmetic; the per-query top-k window runs
  over candidate rows only, partitioned by qid (|queries| partitions of
  |candidate-doc| rows — never corpus rows).

Determinism (oracle rules, queries.py module docstring): ln() differs
in the last ulp between engines, so idf is round(ln(...), 9) BEFORE any
multiplication (the _unigram_nll discipline); per-(query, doc)
contributions accumulate as DECIMAL(28,9) (order-independent exact
sums); the top-k ranking compares those exact decimals with doc_id
tie-breaks, and only the final reported score converts to double.
All float literals in the SQL twin are CAST(... AS DOUBLE) — a bare
1.2 types as DECIMAL in DuckDB and decimal arithmetic would diverge
from Spark's double path (the histogram_quantiles_sql lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Shared tokenizer contract with functions/text + the _SQL_TOKS twin:
# whitespace-delimited, empties dropped.
_DL_RE = r"\S+"


def _query_terms(queries: list[tuple[str, str]]) -> list[tuple[str, str]]:
    out = {(qid, t) for qid, qtext in queries for t in qtext.split()}
    return sorted(out)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_stats: tuple[int, int] | None = None,
) -> DataFrame:
    """(qid, doc_id, rank, score): the top_k documents per query under
    Okapi BM25 with idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the
    non-negative "plus one" form) and tf normalization
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), dl/avgdl spelled as
    (dl * N) / total_tokens in exact-int-valued doubles.

    ``corpus_stats`` = (n_docs, total_tokens): pass the corpus' doc and
    token counts (maintained once per corpus — the stats-table path) for
    a single-scan plan; omit them and the plan computes both via a
    broadcast 1-row aggregate (second projection-pruned scan, still zero
    driver round-trips — construction never runs a job).

    Ties rank deterministically: exact decimal score desc, then id_col.
    Documents sharing no term with a query simply never rank; a query
    whose terms are all absent from the corpus yields no rows.
    """
    from hadoop_gpu_spark.operators.fields import tokenize

    qt = _query_terms(queries)
    if not qt:
        raise ValueError("queries must contain at least one term")
    terms = sorted({t for _, t in qt})
    spark = docs.sparkSession

    toks = docs.select(
        id_col,
        F.regexp_count(F.col(text_col), F.lit(_DL_RE)).alias("__dl"),
        F.explode(tokenize(text_col)).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "__dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    w_term = Window.partitionBy("term")
    with_df = tf.withColumn("df", F.count(F.lit(1)).over(w_term))

    # Corpus stats ride the candidate frame as the long columns
    # __n/__tt — literals when precomputed, else a broadcast 1-row
    # aggregate cross-joined onto the (tiny) post-filter frame. All
    # downstream arithmetic is column-vs-column either way, and the
    # int-valued doubles are exact in both spellings.
    if corpus_stats is None:
        stats = docs.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.regexp_count(F.col(text_col), F.lit(_DL_RE)))
            .cast("long")
            .alias("__tt"),
        )
        with_df = with_df.crossJoin(F.broadcast(stats))
    else:
        n_docs, total_tokens = corpus_stats
        with_df = with_df.withColumn(
            "__n", F.lit(int(n_docs)).cast("long")
        ).withColumn("__tt", F.lit(int(total_tokens)).cast("long"))

    idf9 = F.round(
        F.log(
            ((F.col("__n") - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    dl_over_avgdl = (F.col("__dl").cast("double") * F.col("__n").cast("double")) / F.col(
        "__tt"
    ).cast("double")
    ratio = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_over_avgdl)
    )
    contrib = with_df.withColumn(
        "__c", F.round(idf9 * ratio, 9).cast("decimal(28,9)")
    )

    qterms = spark.createDataFrame(qt, schema="qid string, term string")
    per_doc = (
        contrib.join(qterms, "term")  # unhinted: AQE broadcasts the tiny side
        .groupBy("qid", id_col)
        .agg(F.sum("__c").alias("__s"))
    )
    w_rank = Window.partitionBy("qid").orderBy(F.col("__s").desc(), F.col(id_col))
    return (
        per_doc.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "qid",
            id_col,
            "rank",
            F.round(F.col("__s").cast("double"), 6).alias("score"),
        )
    )


def bm25_topk_sql(
    table: str,
    queries: list[tuple[str, str]],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin (oracle generator): identical lattice of operations —
    same tokenizer spelling, same round-then-multiply idf discipline,
    same decimal accumulation, same double-cast points. Deliberately
    naive CTE SQL (auditability over shuffle count — the funnel_sql
    stance). Corpus stats are CTE scalars; they equal the Spark side's
    in-plan aggregate (or precomputed literals) by construction, and
    every arithmetic step is spelled with the same operand order and
    explicit DOUBLE casts."""
    qt = _query_terms(queries)
    terms_list = ", ".join(f"'{t}'" for t in sorted({t for _, t in qt}))
    qt_values = ", ".join(f"('{qid}', '{t}')" for qid, t in qt)
    toks = f"list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> '')"
    k1p1 = repr(k1 + 1.0)
    one_m_b = repr(1.0 - b)
    return f"""
    WITH stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len({toks})) AS BIGINT) AS tt
      FROM {table}),
    tf AS (
      SELECT {id_col}, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT {id_col}, len({toks}) AS dl, unnest({toks}) AS term
        FROM {table})
      WHERE term IN ({terms_list})
      GROUP BY {id_col}, dl, term),
    wdf AS (
      SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
    contrib AS (
      SELECT qid, {id_col},
             CAST(round(
               round(ln(((CAST(n AS DOUBLE) - CAST(df AS DOUBLE)) + CAST(0.5 AS DOUBLE))
                         / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                         + CAST(1.0 AS DOUBLE)), 9)
               * ((CAST(tf AS DOUBLE) * CAST({k1p1} AS DOUBLE))
                  / (CAST(tf AS DOUBLE) + CAST({repr(float(k1))} AS DOUBLE)
                     * (CAST({one_m_b} AS DOUBLE) + CAST({repr(float(b))} AS DOUBLE)
                        * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(tt AS DOUBLE))))),
               9) AS DECIMAL(28,9)) AS c
      FROM wdf
      JOIN (VALUES {qt_values}) AS q(qid, term) USING (term)
      CROSS JOIN stats),
    ranked AS (
      SELECT qid, {id_col}, SUM(c) AS s,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY SUM(c) DESC, {id_col})
                  AS BIGINT) AS rank
      FROM contrib GROUP BY qid, {id_col})
    SELECT qid, {id_col}, rank, round(CAST(s AS DOUBLE), 6) AS score
    FROM ranked WHERE rank <= {top_k}
    """
