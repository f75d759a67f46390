"""Lloyd's k-means, two formulations.

Reference semantics (apps/pipes/kmeans/cpu-kmeans2D/cpu-kmeans2D.cc):
- assign: nearest centroid by squared euclidean distance (:100-114);
- recalc: new centroid = mean of assigned points (:130-152);
- loop until max centroid movement <= eps or max_iter (:163-170, datacmp
  <= 1.0, 100 iterations).

Formulation A (``kmeans_dataframe``) — distributed, the scale path:
points stay a DataFrame; each iteration is
  broadcast(centroids) crossJoin points → min_by(dist) → groupBy(cluster).avg
i.e. one shuffle of (cluster_id, partial sums) per iteration with map-side
combine; centroids (k rows) come back to the driver for the convergence
test. At 100 TB: points never move; only k-row centroid tables circulate.

Formulation B (``kmeans_grouped``) — per-dataset iterative job mirroring
the reference's NLine-dispatch model (one whole dataset per map call):
``groupBy(dataset_id).applyInPandas(lloyd)`` with numpy inside — the
CPU half of the HybridOp pair (hybrid module swaps in a CuPy body).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.functions.vectors import euclidean_sq


def kmeans_dataframe(
    points: DataFrame,
    init_centroids: DataFrame,
    feature_cols: list[str],
    k: int,
    max_iter: int = 10,
    eps: float | None = None,
) -> DataFrame:
    """Distributed Lloyd's. Returns (cluster_id, <feature means>, n_points).

    ``eps=None`` runs exactly ``max_iter`` iterations (deterministic shape
    for benchmarking); with eps, stops when max squared movement <= eps^2.
    """
    spark = points.sparkSession
    cents = [tuple(r) for r in init_centroids.select("cluster_id", *feature_cols).collect()]

    for _ in range(max_iter):
        cdf = spark.createDataFrame(cents, ["cluster_id", *feature_cols])
        assigned = _assign(points, cdf, feature_cols)
        new = (
            assigned.groupBy("cluster_id")
            .agg(*[F.avg(c).alias(c) for c in feature_cols], F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_map = {r["cluster_id"]: tuple(r[c] for c in feature_cols) for r in new}
        # Empty clusters keep their previous centroid (reference keeps stale
        # centroids implicitly — recalc only sums assigned points).
        next_cents = [
            (cid, *(new_map.get(cid, tuple(vals)))) for cid, *vals in cents
        ]
        if eps is not None:
            move = max(
                sum((a - b) ** 2 for a, b in zip(old[1:], nw[1:]))
                for old, nw in zip(cents, next_cents)
            )
            cents = next_cents
            if move <= eps * eps:
                break
        else:
            cents = next_cents

    final = spark.createDataFrame(cents, ["cluster_id", *feature_cols])
    assigned = _assign(points, final, feature_cols)
    return assigned.groupBy("cluster_id").agg(
        *[F.avg(c).alias(f"c_{c}") for c in feature_cols],
        F.count(F.lit(1)).alias("n_points"),
    )


def _assign(points: DataFrame, centroids: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Nearest-centroid assignment via broadcast cross join + min_by."""
    cen = centroids.select(
        F.col("cluster_id"), *[F.col(c).alias(f"__m_{c}") for c in feature_cols]
    )
    joined = points.crossJoin(F.broadcast(cen))
    dist = None
    for c in feature_cols:
        d = (F.col(c) - F.col(f"__m_{c}")) * (F.col(c) - F.col(f"__m_{c}"))
        dist = d if dist is None else dist + d
    # min_by with a (dist, cluster_id) struct → deterministic on ties.
    return joined.groupBy(*points.columns).agg(
        F.min_by("cluster_id", F.struct(dist.alias("d"), F.col("cluster_id"))).alias("cluster_id")
    )


def lloyd_numpy(
    pts: np.ndarray, cents: np.ndarray, max_iter: int = 100, eps: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's in-map Lloyd loop (cpu-kmeans2D.cc:172-299) in numpy.

    float32 math like the C binary; returns (final centroids, assignments).
    """
    pts = pts.astype(np.float32)
    cents = cents.astype(np.float32).copy()
    assign = np.zeros(len(pts), dtype=np.int64)
    for _ in range(max_iter):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = cents.copy()
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                new[c] = pts[mask].mean(axis=0)
        move = float(((new - cents) ** 2).sum(axis=1).max())
        cents = new
        if move <= eps:  # datacmp threshold, cpu-kmeans2D.cc:163-170
            break
    return cents, assign


def kmeans_grouped(
    points: DataFrame,
    dataset_col: str,
    feature_cols: list[str],
    k: int,
    max_iter: int = 100,
    eps: float = 1.0,
) -> DataFrame:
    """Per-dataset k-means via applyInPandas (reference NLine model:
    one dataset = one task). Initial centroids = first k points by point
    order within the dataset (deterministic).

    Output: (dataset_id, cluster_id, <centroid coords>, n_points).
    """
    schema = (
        f"{dataset_col} long, cluster_id long, "
        + ", ".join(f"c_{c} double" for c in feature_cols)
        + ", n_points long"
    )
    id_col = dataset_col
    order_col = points.columns[1] if len(points.columns) > 1 else feature_cols[0]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pts = pdf[feature_cols].to_numpy()
        cents, assign = lloyd_numpy(pts, pts[:k], max_iter=max_iter, eps=eps)
        rows = []
        for c in range(k):
            mask = assign == c
            rows.append(
                [pdf[id_col].iloc[0], c, *[float(x) for x in cents[c]], int(mask.sum())]
            )
        return pd.DataFrame(rows, columns=[id_col, "cluster_id", *[f"c_{c}" for c in feature_cols], "n_points"])

    return points.groupBy(dataset_col).applyInPandas(run, schema=schema)
