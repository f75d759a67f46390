"""Token n-gram Jaccard similarity for candidate document pairs.

Jaccard over distinct token 3-grams, computed with array set-expressions
(array_intersect/array_union) on pre-materialized n-gram arrays. Intended
for the *verification* stage after LSH candidate generation — never run
all-pairs at scale; feed it `lsh_candidate_pairs` output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.operators.fields import tokenize

NGRAM_N = 3


def token_ngrams(text: Column | str, n: int = NGRAM_N) -> Column:
    """Distinct token n-gram strings ('tok1 tok2 tok3').

    The token array is BOUND once per row (the queries._bind_once
    idiom, applied here r16): referencing ``tokenize(text)`` inside the
    position lambda re-splits the text once per n-gram position —
    higher-order-function lambdas run interpreted, no CSE."""

    def build(toks):
        cnt = F.greatest(F.size(toks) - n + 1, F.lit(1))
        grams = F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
        return F.array_distinct(grams)

    return F.transform(F.array(tokenize(text)), build)[0]


def ngram_jaccard_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, n: int = NGRAM_N
) -> DataFrame:
    """For candidate (a, b) pairs, Jaccard over distinct token n-grams.

    Deterministic double: intersection/union sizes are ints, division is
    exact-input IEEE — portable across engines.

    100 TB shape (r08, closing the triple-scan adjudication item): the
    gram kernel runs ONCE, over CANDIDATE documents only. The previous
    form joined two full-corpus gram frames onto the pair sides — the
    tokenize+gram+distinct kernel (the CPU-dominant cost) ran over the
    whole corpus twice, once per side. Now the candidate id set
    (a ∪ b, deduped) semi-filters the corpus before any gram is
    computed — at real dup rates that is orders of magnitude less gram
    work — and the candidate-sized gram frame is cached
    (utils.eager_persist, released at bench/sweep teardown) so both
    join sides read one materialization. ``pairs`` is also cached: it
    feeds the id-union twice plus the final join, and recomputing an
    LSH candidate pipeline three times is the dual-branch class. All
    joins stay unhinted — candidate cardinality is data-dependent, so
    broadcast-vs-shuffle is AQE's runtime call.
    """
    from hadoop_gpu_spark.utils import eager_persist

    p = eager_persist(pairs.select("a", "b"))
    ids = (
        p.select(F.col("a").alias(id_col))
        .union(p.select(F.col("b").alias(id_col)))
        .distinct()
    )
    cand = docs.join(ids, id_col, "left_semi")
    grams = eager_persist(
        cand.select(F.col(id_col), token_ngrams(text_col, n).alias("__g"))
    )
    ga = grams.select(F.col(id_col).alias("a"), F.col("__g").alias("__ga"))
    gb = grams.select(F.col(id_col).alias("b"), F.col("__g").alias("__gb"))
    j = p.join(ga, "a").join(gb, "b")
    inter = F.size(F.array_intersect("__ga", "__gb"))
    union = F.size(F.array_union("__ga", "__gb"))
    return j.select("a", "b", (inter / union).alias("jaccard"))
