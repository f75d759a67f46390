"""Partition-invariance harness: query output must be a pure function of
the DATA, never of the physical partitioning.

This is the q_sequence_pack incident class (r03: sampled range
partitioning + a load-bearing persist made the output depend on the
session's shuffle layout), generalized into a standing guard: every
partition-sensitive query runs under two fresh sessions with adversarial
shuffle.partitions settings (3 vs 17 — neither divides the other, both
far from the tuned 8/32) and must produce the identical canonical row
set.

Scope: the queries whose SHAPE makes them susceptible — global sorts,
sampling, window functions, salting, packing, hash-bucketed dedup,
driver-side two-pass offsets. Purely key-grouped aggregates cannot
depend on partitioning by construction and are covered by the oracle
gate instead. Float-mean queries (k-means, avg aggregates) are excluded:
double summation order IS partition-dependent in the last ulp, which is
why the gate queries use decimal/integer-exact aggregates — that rule is
enforced by the oracle hashes, not here.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hadoop_gpu_spark.queries import QUERIES

PARTITION_SENSITIVE = [
    "q_sequence_pack",       # two-pass distributed prefix sum (the incident)
    "q_total_order_sort",    # sampled range partitioner
    "q_terasort",            # same, teraformat keys
    "q_topk",                # global ordering + limit
    "q_grep_ranked",         # count + rank ordering
    "q_secondary_sort",      # windows over composite keys
    "q_moving_window",       # row-frame window
    "q_md5_sample",          # hash-threshold sampling
    "q_stratified_sample",   # per-stratum hash ranking
    "q_token_budget_sample", # ordered cumulative cut
    "q_ppl_buckets",         # ordered quantile buckets
    "q_epoch_shuffle",       # per-shard row_number
    "q_salted_agg",          # two-level salted aggregation
    "q_salted_join",         # salt + join + de-salt
    "q_winnow_fingerprint",  # vectorized kernel over arbitrary batches
    "q_dedup_minhash",       # Arrow-batch kernel signatures
    "q_dedup_simhash",       # Arrow-batch kernel fingerprints
    "q_dedup_minhash_pairs", # bucketed pair expansion
    "q_connected_components",# iterative label propagation
    "q11_important_stock",   # localCheckpoint two-consumer plan
]


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if pd.isna(v):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", PARTITION_SENSITIVE)
def test_output_invariant_under_partitioning(name, spark, sf_dir):
    results = []
    for parts in ("3", "17"):
        s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", parts)
        results.append(_canon(QUERIES[name](s, sf_dir).toPandas()))
    assert results[0] == results[1], (
        f"{name}: output depends on shuffle partitioning "
        f"({len(results[0])} vs {len(results[1])} canonical rows)"
    )
    assert len(results[0]) > 0, f"{name}: empty result at test scale"


# Unregistered r07 pending gates in the susceptible classes: domain_cap's
# narrow pre-cap sees partition-dependent row subsets (the union must
# still reduce to the same global top-n), and embedding_outliers is a
# driver-side two-pass model (the sequence_pack incident shape).
PARTITION_SENSITIVE_PENDING = ["q_domain_cap", "q_embedding_outliers"]


@pytest.mark.parametrize("name", PARTITION_SENSITIVE_PENDING)
def test_pending_output_invariant_under_partitioning(name, spark, sf_dir):
    import hadoop_gpu_spark.queries as q

    fn = getattr(q, name)
    results = []
    for parts in ("3", "17"):
        s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", parts)
        results.append(_canon(fn(s, sf_dir).toPandas()))
    assert results[0] == results[1], f"{name}: output depends on partitioning"
    assert len(results[0]) > 0


def test_domain_cap_invariant_under_input_repartitioning(spark, sf_dir):
    # Sharper than shuffle.partitions: physically re-slice the INPUT
    # (1, 7, 32 partitions) so the pre-cap runs over different local row
    # subsets each time; the global result must be byte-identical.
    from hadoop_gpu_spark.operators.sampling import domain_cap
    from hadoop_gpu_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    outs = []
    for n in (1, 7, 32):
        out = domain_cap(docs.repartition(n), "source", "doc_id", n=8).toPandas()
        outs.append(_canon(out))
    assert outs[0] == outs[1] == outs[2]


def test_arrow_kernels_survive_mostly_empty_partitions(spark, sf_dir):
    # The r07 funnel bug class, swept across every Arrow-kernel operator:
    # a tiny filtered input spread over 64 partitions (59+ EMPTY) with
    # 1-row Arrow batches must produce exactly the single-partition
    # result. Empty filtered subsets inside a partition are routine at
    # real partition counts, and pandas edge semantics there (e.g. an
    # empty merge renaming the index) differ from the nonempty path.
    from pyspark.sql import functions as F

    from hadoop_gpu_spark.dedup.minhash import minhash_signatures_pandas
    from hadoop_gpu_spark.dedup.simhash import simhash64_pandas
    from hadoop_gpu_spark.dedup.winnow import winnow_fingerprints_pandas
    from hadoop_gpu_spark.operators.pipes import pipe_map
    from hadoop_gpu_spark.similarity.ann import brute_force_topk
    from hadoop_gpu_spark.similarity.quantize import pq_encode
    from hadoop_gpu_spark.tables import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")

    builders = {
        "minhash": lambda d, e: minhash_signatures_pandas(d, "text", "doc_id"),
        "simhash": lambda d, e: simhash64_pandas(d, "text", "doc_id"),
        "winnow": lambda d, e: d.select(
            "doc_id", F.to_json(winnow_fingerprints_pandas("text")).alias("fp")
        ),
        "pq_encode": lambda d, e: pq_encode(e),
        "ann_brute": lambda d, e: brute_force_topk(
            e, e.filter(F.col("vec_id") < 2), "embedding", "vec_id", k=3
        ),
        "pipe_map": lambda d, e: pipe_map(
            d.select(F.col("text").alias("line")), "cat"
        ),
    }
    for name, build in builders.items():
        docs1 = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 5)
        emb1 = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 5)
        docsN = (
            load_table(s2, "documents", sf_dir).filter(F.col("doc_id") < 5).repartition(64)
        )
        embN = (
            load_table(s2, "embeddings", sf_dir).filter(F.col("vec_id") < 5).repartition(64)
        )
        a = _canon(build(docs1, emb1).toPandas())
        b = _canon(build(docsN, embN).toPandas())
        assert a == b, f"{name}: empty-partition layout changed the result"
        assert len(a) > 0, f"{name}: vacuous comparison"
