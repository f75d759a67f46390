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
    candidates + n-gram Jaccard verification; survivors keep the min id
    per duplicate group (connected via a union over verified pairs is
    approximated by direct min — adequate for the common chain-free case).

    Returns the deduplicated DataFrame. Scale shape: two text scans
    (hashing), shuffles carry only ids/hashes.
    """
    from pyspark.sql import functions as F

    from hadoop_gpu_spark.dedup.ngram import ngram_jaccard_pairs

    exact = exact_dedup(df, text_col, id_col)
    exact_losers = (
        exact.filter(F.col("copies") > 1)
        .join(
            df.select(md5_col(text_col).alias("text_hash"), F.col(id_col)),
            "text_hash",
        )
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(id_col)
    )
    pairs = lsh_candidate_pairs(df, text_col, id_col)
    verified = ngram_jaccard_pairs(pairs, df, id_col, text_col).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    near_losers = verified.select(F.col("b").alias(id_col)).distinct()
    losers = exact_losers.unionByName(near_losers).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def md5_col(text_col: str):
    from hadoop_gpu_spark.functions.hashing import md5_hex

    return md5_hex(text_col)
