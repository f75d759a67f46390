"""Multinomial Naive Bayes text classifier — trained in ONE aggregation
pass, applied map-ish — the classifier-based filtering member of the
LLM-pipeline family.

Production pretraining pipelines gate documents with a LEARNED linear
text classifier (CCNet / GPT-3 / LLaMA use fasttext models for language
ID and quality); this repo's lang-id (functions/text.py lang_id) and
quality scores are hand-written heuristics. Multinomial NB is the
aggregation-native equivalent of that classifier family: training IS a
token-count groupBy (exact integers, partition-invariant, one corpus
scan — no SGD ordering to make results engine- or partition-dependent),
and inference is a per-token log-likelihood sum — the same
round(ln, 9)-decimal lattice the unigram-LM scorer (q_unigram_logprob)
and BM25 already pin across engines. Reference analog: the WordCount /
aggregate framework (M/lib/aggregate/ValueAggregatorJob.java:81) run
per class, plus a scored re-scan.

Decision rule (argmax over classes c of):

    score(d, c) = round(ln(N_c / N), 9)                       # prior
                + Σ_{t ∈ d} round(ln((cnt(t,c) + 1) /
                                     (tok_c + V)), 9)         # Laplace

with V = |corpus vocabulary|, tok_c = total training tokens in class c.
Every ln is rounded to 9 dp and cast DECIMAL(28,9) BEFORE summing, so
per-document sums are exact and order-independent; ties break to the
lexicographically smaller class. The oracle twin replays the identical
lattice, so the gate compares confusion counts bit-for-bit.

100 TB shape:
- TRAIN: one corpus token scan into the (term, class) count aggregate
  (map-side combine; only (term, class, count) rows shuffle — text
  never does). The count frame is eager_persist'd: the vocab size V
  (one BIGINT) and per-class token totals (|classes| rows) are
  re-aggregated off the cache — the distributed-scalar-literal pattern
  (q_tfidf n_docs / unigram total), never a second corpus branch.
- MODEL: the |V| x |classes| smoothed log-likelihood grid, built from
  the cached counts (distinct terms x bounded class list). Heaps-law
  sized — model-scale, not corpus-scale.
- APPLY: the corpus token stream re-joins the grid UNHINTED on term
  (AQE broadcasts the model at bench scale; at open-vocab 100 TB the
  grid exceeds the 8 GB broadcast cap and the plan degrades to a
  term-keyed shuffle join instead of dying — the r08 broadcast-hint
  audit class). Per-(doc, class) decimal sums then argmax: only
  |docs| x |classes| rows pass the final shuffle.
- Priors come from a column-pruned (doc-id, label) scan — footer-cheap
  next to the two text scans (the q_tfidf nd-branch precedent). The
  train scan and the apply scan are both inherent to train-then-apply;
  no construction-time collect touches the corpus (the bm25-class
  anti-pattern this module was designed against).

Zero-token documents score on priors alone: the scoring base is the
(document x class) grid (classes broadcast — a bounded intentional
nested loop, the semantic-dedup centroid idiom), with token sums
LEFT-joined and COALESCEd to 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(28,9)"


def _rln9(x: Column) -> Column:
    """round(ln(x), 9) as DECIMAL(28,9) — the cross-engine transcendental
    discipline (unigram-LM / BM25 idf / HLL linear-count lattice)."""
    return F.round(F.log(x), 9).cast(_DEC)


def nb_train(
    toks: DataFrame,
    *,
    term_col: str = "term",
    label_col: str = "label",
    classes: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """(grid, V): the smoothed per-(term, class) log-likelihood model
    over a (…, term, label) token stream, and the vocabulary size.

    The token stream is aggregated ONCE (the corpus scan); the returned
    grid is |vocab| x |classes| with ``llk`` = round(ln((c+1) /
    (tok_c+V)), 9) — complete over the class list, so unseen
    (term, class) cells carry their Laplace floor explicitly.

    ``classes`` (a one-column ``label_col`` frame) is the authoritative
    class list; without it the list degrades to classes observed in the
    token stream. The distinction matters: a class whose every training
    document is EMPTY has a prior but no tokens — deriving the list
    from counts would drop its grid rows entirely, its documents'
    token costs would COALESCE to zero downstream, and the empty class
    would beat every token-bearing class on any document (the fuzz
    counterexample that forced this parameter). With the class listed,
    its cells carry the full Laplace floor ln(1/(0+V)) like any other
    unseen (term, class) pair.
    """
    from hadoop_gpu_spark.utils import eager_persist

    counts = eager_persist(
        toks.groupBy(term_col, label_col)
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # distributed scalars off the cached aggregate — one INT to the
    # driver; never a second corpus branch
    vocab_n = counts.select(term_col).distinct().count()
    tok_sums = counts.groupBy(label_col).agg(F.sum("c").alias("__tok"))
    if classes is None:
        class_tok = tok_sums.select(label_col, F.col("__tok").alias("tok_c"))
    else:
        class_tok = (
            classes.select(label_col)
            .join(tok_sums, label_col, "left")
            .select(
                label_col, F.coalesce("__tok", F.lit(0)).cast("long").alias("tok_c")
            )
        )
    terms = counts.select(term_col).distinct()
    grid = (
        terms.crossJoin(F.broadcast(class_tok))
        .join(counts, [term_col, label_col], "left")
        .select(
            term_col,
            label_col,
            _rln9(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
                / (F.col("tok_c") + F.lit(vocab_n))
            ).alias("llk"),
        )
    )
    return grid, vocab_n


def nb_classify(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """(id_col, label_col, pred, score) — each document's argmax NB
    class under the model trained on this same corpus's labels
    (self-evaluation). ``score`` is the winning class's exact decimal
    log-posterior (up to the shared evidence term), rounded to 6 dp
    for output like avg_nll. For the held-out / corpus-scoring shape
    (train on a labeled seed set, score a different corpus) use
    ``nb_score``.
    """
    return nb_score(
        docs,
        docs,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        keep_cols=[label_col],
    ).select(id_col, label_col, "pred", "score")


def nb_score(
    train: DataFrame,
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    label_col: str = "label",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id_col, *keep_cols, pred, score) — classify ``docs`` under the
    NB model trained on ``train``'s labels: the production
    quality-filter shape (the CCNet recipe trains its fasttext model on
    a labeled seed set — reference pages vs crawl — then scores the
    whole unlabeled corpus; ``docs`` needs only ``id_col`` +
    ``text_col``). Tokens outside the training vocabulary are skipped
    (the standard NB convention — no likelihood evidence either way);
    documents with no in-vocabulary tokens score on priors alone.
    ``keep_cols`` ride the scoring base through to the output, saving
    callers a join-back (and its extra pruned scan) — nb_classify
    passes the true label this way.
    """
    keep = list(keep_cols or [])
    from hadoop_gpu_spark.operators.fields import tokenize

    train_toks = train.select(
        F.explode(tokenize(text_col)).alias("term"),
        F.col(label_col).alias("cls"),
    )
    # priors from a column-pruned scan; N folded as a window over the
    # BOUNDED |classes|-row frame (never an unbounded single-partition
    # window — the r09 unigram lesson)
    pri = train.groupBy(F.col(label_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    # the class list comes from the LABELS, not the token stream (an
    # all-empty-document class must still pay Laplace token costs)
    grid, _ = nb_train(train_toks, label_col="cls", classes=pri.select("cls"))
    wall = Window.partitionBy(F.lit(1))
    pri = pri.select(
        "cls", _rln9(F.col("n_c") / F.sum("n_c").over(wall)).alias("prior")
    )
    # per-(doc, class) token log-likelihood sums: token stream x grid,
    # join UNHINTED on term (broadcast would die at open-vocab scale).
    # The join-input exchange is pinned at the session's configured
    # shuffle width (an explicit user repartition, which AQE never
    # coalesces): exploded tokens compress to a few MB per million
    # rows, so AQE's BYTE-sized coalescing collapses the reduce side
    # to a handful of tasks while the stage's cost is CPU (every
    # surviving row fans out x|classes| and pays a DECIMAL(28,9) sum)
    # — measured on the r14 sf30 rung: sf10 nb_confusion 152.7s
    # coalesced vs 32.7s at full width, with sf30 FASTER than sf10
    # because 3x the bytes happened to defeat the coalescer. At real
    # scale the exchange is byte-heavy and the pin is what AQE would
    # choose anyway.
    from hadoop_gpu_spark.utils import shuffle_width

    p = shuffle_width(docs.sparkSession)
    doc_toks = docs.select(
        id_col, F.explode(tokenize(text_col)).alias("term")
    ).repartition(p, "term")
    tok_scores = (
        doc_toks.join(grid, "term")
        .groupBy(id_col, "cls")
        .agg(F.sum("llk").alias("tok_llk"))
    )
    base = docs.select(id_col, *keep).crossJoin(F.broadcast(pri))
    scored = base.join(tok_scores, [id_col, "cls"], "left").select(
        id_col,
        *keep,
        "cls",
        (F.col("prior") + F.coalesce(F.col("tok_llk"), F.lit(0).cast(_DEC))).alias(
            "posterior"
        ),
    )
    # Argmax as an AGGREGATE, not a window (r16 optimization, guide
    # §2.3): min(struct(-posterior, cls, posterior)) over the
    # (doc x class) grid is the identical total order the old
    # row_number window used — struct ordering compares -posterior
    # first (DECIMAL negation is exact, so asc == posterior desc),
    # then cls asc; cls is unique per (doc, class) row so the winner
    # is the same single row. Unlike the window (which shuffles ALL
    # |docs| x |classes| rows by id and sorts), the aggregate
    # partial-combines map-side: one candidate row per (doc, task)
    # reaches the exchange.
    best = F.min(
        F.struct(
            (-F.col("posterior")).alias("__np"),
            F.col("cls"),
            F.col("posterior"),
        )
    ).alias("__best")
    return (
        scored.groupBy(id_col, *keep)
        .agg(best)
        .select(
            id_col,
            *keep,
            F.col("__best.cls").alias("pred"),
            F.round(F.col("__best.posterior").cast("double"), 6).alias("score"),
        )
    )


def nb_confusion(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """(label_col, pred, n_docs) — the self-evaluation confusion matrix
    of the NB classifier, ordered by (label, pred)."""
    return (
        nb_classify(docs, id_col=id_col, text_col=text_col, label_col=label_col)
        .groupBy(label_col, "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(label_col, "pred")
    )


def nb_confusion_sql(
    table: str,
    *,
    id_col: str,
    text_col: str = "text",
    label_col: str = "label",
    toks_sql: str | None = None,
) -> str:
    """DuckDB twin: identical count lattice, identical round(ln, 9)
    DECIMAL(28,9) scoring, identical argmax tie-break. ``toks_sql``
    overrides the tokenizer spelling (defaults to the whitespace split
    every other gate uses)."""
    toks = toks_sql or (
        f"list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> '')"
    )
    return f"""
    WITH toks AS (
      SELECT {id_col}, {label_col} AS cls, unnest({toks}) AS term
      FROM {table}),
    counts AS (
      SELECT term, cls, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY term, cls),
    vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM counts),
    -- class list from the LABELS, not the token stream: a class whose
    -- every document is empty still pays Laplace token costs (its
    -- tok_c is 0), instead of dropping out of the grid and winning on
    -- prior alone (the fuzz counterexample)
    class_tok AS (
      SELECT cl.cls, CAST(COALESCE(s.tok, 0) AS BIGINT) AS tok_c
      FROM (SELECT DISTINCT {label_col} AS cls FROM {table}) cl
      LEFT JOIN (SELECT cls, SUM(c) AS tok FROM counts GROUP BY cls) s
        ON s.cls = cl.cls),
    grid AS (
      SELECT t.term, ct.cls,
             CAST(round(ln((COALESCE(c.c, 0) + 1) / CAST(ct.tok_c + v.v AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS llk
      FROM (SELECT DISTINCT term FROM counts) t
      CROSS JOIN class_tok ct CROSS JOIN vocab v
      LEFT JOIN counts c ON c.term = t.term AND c.cls = ct.cls),
    pri AS (
      SELECT {label_col} AS cls,
             CAST(round(ln(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE)), 9)
                  AS DECIMAL(28,9)) AS prior
      FROM {table} GROUP BY {label_col}),
    tok_scores AS (
      SELECT toks.{id_col}, grid.cls, SUM(grid.llk) AS tok_llk
      FROM toks JOIN grid USING (term)
      GROUP BY toks.{id_col}, grid.cls),
    scored AS (
      SELECT d.{id_col}, d.{label_col}, p.cls,
             p.prior + COALESCE(ts.tok_llk, CAST(0 AS DECIMAL(28,9))) AS posterior
      FROM {table} d
      CROSS JOIN pri p
      LEFT JOIN tok_scores ts ON ts.{id_col} = d.{id_col} AND ts.cls = p.cls),
    pred AS (
      SELECT {id_col}, {label_col}, cls AS pred
      FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY {id_col}
          ORDER BY posterior DESC, cls) = 1)
    SELECT {label_col}, pred, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY {label_col}, pred
    ORDER BY {label_col}, pred
    """
