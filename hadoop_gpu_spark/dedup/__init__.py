"""Deduplication operators for training-data pipelines (north-star surface).

Exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — each designed around one shuffle on a compact
key, never an all-pairs comparison, so they hold at 100 TB.
"""

from hadoop_gpu_spark.dedup.exact import exact_dedup
from hadoop_gpu_spark.dedup.minhash import minhash_signatures, lsh_candidate_pairs
from hadoop_gpu_spark.dedup.simhash import simhash64, simhash_near_dups
from hadoop_gpu_spark.dedup.ngram import ngram_jaccard_pairs

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash64",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "near_dedup",
]


def near_dedup(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
):
    """End-to-end near-duplicate removal: exact dedup + MinHash/LSH
    candidates + n-gram Jaccard verification + transitive grouping via
    connected components (a~b, b~c ⇒ one group); survivors keep the min
    id per component.

    Returns the deduplicated DataFrame. Scale shape: two text scans
    (hashing); every shuffle carries only ids/hashes; the CC loop runs
    over the (small) verified-pair graph.
    """
    from pyspark.sql import functions as F

    from hadoop_gpu_spark.dedup.components import dedup_survivors
    from hadoop_gpu_spark.dedup.ngram import ngram_jaccard_pairs

    exact = exact_dedup(df, text_col, id_col)
    exact_pairs = (
        exact.filter(F.col("copies") > 1)
        .join(
            df.select(md5_col(text_col).alias("text_hash"), F.col(id_col)),
            "text_hash",
        )
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col("keep_id").alias("a"), F.col(id_col).alias("b"))
    )
    cand = lsh_candidate_pairs(df, text_col, id_col)
    near_pairs = (
        ngram_jaccard_pairs(cand, df, id_col, text_col)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b")
    )
    all_pairs = exact_pairs.unionByName(near_pairs).distinct()
    return dedup_survivors(df, all_pairs, id_col)


def md5_col(text_col: str):
    from hadoop_gpu_spark.functions.hashing import md5_hex

    return md5_hex(text_col)
