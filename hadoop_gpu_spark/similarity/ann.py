"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
- ``brute_force_topk`` — exact: broadcast the (small) query set against the
  corpus, cosine per pair, per-query top-k via window. The baseline and the
  verifier for the approximate path. Cost O(|Q| * |corpus|) — fine for
  thousands of queries against any corpus size (scan-shaped, no shuffle of
  the corpus).
- ``ivf_topk`` — IVF-style scale path: corpus is pre-assigned to its
  nearest coarse centroid (one scan); each query probes only the
  ``nprobe`` nearest centroid partitions. At 100 TB: write the corpus
  bucketed/partitioned by centroid id so a probe is partition pruning, not
  a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_gpu_spark.functions.vectors import cosine, euclidean_sq


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query. Output: (qid, nid, score, rank).

    Self-matches (qid == nid) are excluded. Ties break on neighbor id so
    results are deterministic.
    """
    from hadoop_gpu_spark.utils import ensure_min_partitions

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("__qv")
    )
    c = ensure_min_partitions(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("__cv"))
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("nid"))
    if metric == "cosine":
        score = cosine("__qv", "__cv")
        order = [F.col("score").desc(), F.col("nid").asc()]
    elif metric == "euclidean":
        score = euclidean_sq("__qv", "__cv")
        order = [F.col("score").asc(), F.col("nid").asc()]
    else:
        raise ValueError(metric)
    scored = pairs.select("qid", "nid", score.alias("score"))
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_to_centroids(
    corpus: DataFrame, centroids: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid.

    The centroid table (small by construction — IVF coarse lists) is
    collapsed to ONE array-of-structs row and broadcast; assignment is an
    array_min over (distance, centroid_id) structs — a single narrow map
    over the corpus with NO shuffle at all (the previous min_by/groupBy
    formulation shuffled one row per corpus vector) and deterministic
    ties (lowest centroid_id, struct ordering).
    """
    cen_arr = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("centroid_id"), F.col(vec_col).alias("__mv")))
        ).alias("__cents")
    )
    with_c = corpus.crossJoin(F.broadcast(cen_arr))
    nearest = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                euclidean_sq(F.col(vec_col), c["__mv"]).alias("d"),
                c["centroid_id"].alias("cid"),
            ),
        )
    )["cid"]
    return with_c.withColumn("centroid_id", nearest).drop("__cents")


def ivf_topk(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF probe: per query, search only the nprobe nearest centroid cells.

    ``corpus_assigned`` must carry ``centroid_id`` (see assign_to_centroids;
    at scale, persist it partitioned by centroid_id).
    """
    cen = centroids.select("centroid_id", F.col(vec_col).alias("__mv"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__qv"))
    qc = q.crossJoin(F.broadcast(cen))
    w = Window.partitionBy("qid").orderBy(
        euclidean_sq("__qv", "__mv").asc(), F.col("centroid_id").asc()
    )
    probes = qc.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= nprobe)
    probe_q = probes.select("qid", "__qv", "centroid_id")
    cand = corpus_assigned.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("__cv"), "centroid_id"
    ).join(F.broadcast(probe_q), "centroid_id")
    scored = cand.filter(F.col("qid") != F.col("nid")).select(
        "qid", "nid", cosine("__qv", "__cv").alias("score")
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return scored.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
