"""The reference's shipped compute workloads, Spark-first.

k-means (apps/pipes/kmeans) and matrix multiplication (apps/pipes/matmul)
— the two applications the reference accelerates with CUDA. Here each has
a distributed DataFrame formulation (the scale path) and, for k-means, a
per-group ``applyInPandas`` formulation mirroring the reference's
"whole dataset in one map call" contract.
"""
