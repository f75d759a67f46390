"""SemDeDup-style semantic deduplication over an embedding column.

The missing member of the dedup family beside exact / MinHash-LSH /
SimHash / n-gram-Jaccard / embedding-pair (label-blocked): UNSUPERVISED
near-dup pruning — cluster the corpus by nearest centroid, then inside
each cluster drop every vector that has an earlier (smaller-id)
neighbor above the cosine threshold. Keep-first greedy semantics
(deterministic, SQL-expressible); the published SemDeDup recipe
(Abbas et al. 2023, arXiv:2303.09540) differs only in which ε-ball
representative it keeps.

100 TB shape:
- centroids are the first n_centroids vectors by id (the repo's IVF
  convention — deterministic, no training pass); they broadcast
  (bounded: n_centroids rows) and assignment is one narrow map over
  the corpus. The DEFAULT (n_centroids=None) derives k ~ sqrt(N) and
  a sqrt(k)-cell coarse quantizer from a corpus count, which keeps the
  whole operator ~linear in N (auto_centroid_config); a FIXED small k
  is a caller opt-in whose pair stage grows N²/k (measured 25x wall at
  10x data in the r12 sf1 check — the reason auto is the default).
- the pairwise stage is CLUSTER-BUCKETED: vectors shuffle ONCE by
  cluster id, and both sides of the pair self-join read that same
  hash-partitioned assignment — pairs are bounded per cluster
  (~(N/k)² each), never corpus × corpus. Size n_centroids so N/k
  fits a task (the same knob IVF's nlist is).
- the assignment frame is eager_persist'd: the self-join's two
  branches would otherwise each recompute the full corpus × centroid
  cosine pass (the dual-branch-recompute class, rounds 6-8); both
  branches read one InMemoryRelation, lineage intact (executor loss
  degrades to recompute — utils.eager_persist contract).

Determinism: cosine is the functions.vectors left-fold double spelling
(bit-equal to DuckDB's list_dot_product over DOUBLE[] — the
q_dedup_embedding parity anchor); assignment ties break by centroid id,
and the keep-first rule depends only on ids and exact cosine
comparisons.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Auto-sizing (n_centroids=None): coarse probing only pays once the
# centroid table outgrows a broadcast row-scan's trivial range — below
# this k the exact flat assignment is both cheaper and oracle-exact.
AUTO_COARSE_MIN_K = 16


def auto_centroid_config(n_rows: int) -> tuple[int, int | None]:
    """(n_centroids, coarse_nlist) for a corpus of ``n_rows`` vectors.

    The sizing ARCHITECTURE.md derives from the r12 sf1 measurements:
    exact assignment costs k cosines/vector and the within-cluster pair
    stage ~N²/k pair cosines, so k ~ sqrt(N) balances them — but flat
    assignment at that k is N^1.5 total, so large k switches on the
    two-level coarse quantizer (coarse_nlist ~ sqrt(k)), dropping
    per-vector assignment to ~2*sqrt(k) and the whole operator to
    ~linear. Small corpora (k < AUTO_COARSE_MIN_K) keep the exact flat
    path: the quantizer's constant factor outweighs it there.
    """
    k = max(1, math.isqrt(max(0, n_rows)))
    if k < AUTO_COARSE_MIN_K:
        return k, None
    return k, max(1, math.isqrt(k))


def semantic_dedup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    tau: float = 0.30,
    coarse_nlist: int | None = None,
    coarse_nprobe: int = 1,
) -> DataFrame:
    """(id_col, cid) — the surviving vectors with their cluster id.

    A vector survives iff NO same-cluster vector with a smaller id has
    cosine >= tau against it. Centroids are the vectors with
    id_col < n_centroids; every vector assigns to its max-cosine
    centroid (ties to the smaller centroid id).

    ``n_centroids=None`` (the default since r13) sizes the operator
    from the corpus: k = floor(sqrt(N)) via one columnless count scan,
    and — unless the caller pinned ``coarse_nlist`` — switches on the
    coarse quantizer at sqrt(k) cells once k >= AUTO_COARSE_MIN_K
    (``auto_centroid_config``). That default is ~linear in N end to
    end; the r12 scale check measured the alternative (a FIXED small k)
    at 25x wall for 10x data — the within-cluster pair stage is N²/k —
    so a fixed k is now an explicit caller opt-in, kept for
    oracle-gated configs (which need exact, config-pinned assignment).
    Auto mode with nprobe < nlist is approximate in the documented
    two-level sense below.

    ``coarse_nlist``: the production assignment knob for LARGE
    n_centroids (the r12 sf1 scale check measured the honest
    asymptotics: exact assignment costs k cosines per vector, the pair
    stage N²/k, so the optimal fixed-depth k ~ sqrt(N) leaves N^1.5
    total — flat assignment is the term to beat). With it set, the
    first ``coarse_nlist`` centroids act as a coarse quantizer over the
    centroid set (the IVF convention applied one level up): each fine
    centroid lives in its max-cosine coarse cell, and each vector
    probes only its ``coarse_nprobe`` nearest cells — per-vector cost
    drops from k to ~ coarse_nlist + coarse_nprobe * k / coarse_nlist
    (≈ 2·sqrt(k) at the sqrt sizing), making the assignment term
    sublinear in k and the whole operator ~linear at k ~ sqrt(N).
    APPROXIMATE for coarse_nprobe < coarse_nlist (a vector's true
    max-cosine centroid may sit in an unprobed cell) — the oracle-gated
    configuration keeps the exact path; probing every cell
    (coarse_nprobe >= coarse_nlist) is proven bit-identical to it.
    Every probe set is non-empty by construction: coarse centroids ARE
    fine centroids, each resident in its own cell.
    """
    from hadoop_gpu_spark.functions.vectors import cosine
    from hadoop_gpu_spark.utils import eager_persist

    if n_centroids is None:
        # One scalar count to the driver (columnless parquet scan) buys
        # the scale-safe sizing; callers that already know N should
        # pass n_centroids explicitly and skip the job.
        auto_k, auto_nlist = auto_centroid_config(emb.count())
        n_centroids = auto_k
        if coarse_nlist is None:
            coarse_nlist = auto_nlist
    if n_centroids < 1:
        raise ValueError("n_centroids must be >= 1")
    cen = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    if coarse_nlist is not None:
        if not (1 <= coarse_nlist <= n_centroids):
            raise ValueError("coarse_nlist must be in [1, n_centroids]")
        if coarse_nprobe < 1:
            raise ValueError("coarse_nprobe must be >= 1")
        coarse = cen.filter(F.col("__cid") < coarse_nlist).select(
            F.col("__cid").alias("__gid"), F.col("__cvec").alias("__gvec")
        )
        # fine centroid -> its max-cosine coarse cell (k x m, centroid-
        # set-sized; ties to the smaller cell id, the assignment rule)
        cw = Window.partitionBy("__cid").orderBy(
            F.col("__gcos").desc(), F.col("__gid")
        )
        cen_cell = (
            cen.crossJoin(F.broadcast(coarse))
            .withColumn("__gcos", cosine("__cvec", "__gvec"))
            .withColumn("__crn", F.row_number().over(cw))
            .filter(F.col("__crn") == 1)
            .select("__gid", "__cid", "__cvec")
        )
        # vector -> nprobe nearest coarse cells, then fine candidates
        # from those cells only
        pw = Window.partitionBy(id_col).orderBy(
            F.col("__gcos").desc(), F.col("__gid")
        )
        probes = (
            emb.select(id_col, vec_col)
            .crossJoin(F.broadcast(coarse))
            .withColumn("__gcos", cosine(vec_col, "__gvec"))
            .withColumn("__prn", F.row_number().over(pw))
            .filter(F.col("__prn") <= coarse_nprobe)
            .select(id_col, vec_col, "__gid")
        )
        scored = probes.join(F.broadcast(cen_cell), "__gid").withColumn(
            "__cos", cosine(vec_col, "__cvec")
        )
    else:
        scored = emb.select(id_col, vec_col).crossJoin(F.broadcast(cen)).withColumn(
            "__cos", cosine(vec_col, "__cvec")
        )
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("__cid"))
    asg = eager_persist(
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "__cid", vec_col)
    )
    a = asg.select(
        "__cid", F.col(id_col).alias("__a"), F.col(vec_col).alias("__va")
    )
    bb = asg.select(
        "__cid", F.col(id_col).alias("__b"), F.col(vec_col).alias("__vb")
    )
    dup_ids = (
        a.join(bb, "__cid")
        .filter(F.col("__a") < F.col("__b"))
        .filter(cosine("__va", "__vb") >= F.lit(float(tau)))
        .select(F.col("__b").alias(id_col))
        .distinct()
    )
    return asg.join(dup_ids, id_col, "left_anti").select(
        id_col, F.col("__cid").cast("long").alias("cid")
    )


def semantic_dedup_sql(
    table: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    tau: float = 0.30,
) -> str:
    """DuckDB twin (oracle generator): same assignment (max-cosine over
    the id < n_centroids centroid table, ties to smaller cid), same
    keep-first rule, same left-fold dot-product spelling
    (list_dot_product over DOUBLE[] — the parity anchor)."""
    cos_ac = (
        f"list_dot_product(e.{vec_col}::DOUBLE[], c.{vec_col}::DOUBLE[]) / "
        f"sqrt(list_dot_product(e.{vec_col}::DOUBLE[], e.{vec_col}::DOUBLE[]) * "
        f"list_dot_product(c.{vec_col}::DOUBLE[], c.{vec_col}::DOUBLE[]))"
    )
    cos_ab = (
        "list_dot_product(a.v::DOUBLE[], b.v::DOUBLE[]) / "
        "sqrt(list_dot_product(a.v::DOUBLE[], a.v::DOUBLE[]) * "
        "list_dot_product(b.v::DOUBLE[], b.v::DOUBLE[]))"
    )
    return f"""
    WITH asg AS (
      SELECT e.{id_col}, c.{id_col} AS cid, e.{vec_col} AS v
      FROM {table} e CROSS JOIN (SELECT * FROM {table} WHERE {id_col} < {n_centroids}) c
      QUALIFY ROW_NUMBER() OVER (PARTITION BY e.{id_col}
          ORDER BY {cos_ac} DESC, c.{id_col}) = 1),
    dups AS (
      SELECT DISTINCT b.{id_col}
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.{id_col} < b.{id_col}
      WHERE {cos_ab} >= CAST({repr(float(tau))} AS DOUBLE))
    SELECT v.{id_col}, CAST(v.cid AS BIGINT) AS cid
    FROM asg v ANTI JOIN dups USING ({id_col})
    """
