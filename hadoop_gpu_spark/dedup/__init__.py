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
]
