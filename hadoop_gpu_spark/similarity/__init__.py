"""Similarity search over embedding columns."""

from hadoop_gpu_spark.similarity.ann import brute_force_topk, ivf_topk

__all__ = ["brute_force_topk", "ivf_topk"]
