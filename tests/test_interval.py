"""Falsifier suite for operators/interval.py (r12; r11 VERDICT "what's
wrong" #1 — the operator shipped r10 with zero tests, zero consumers).

Evidence ladder:
- differential fuzz of the bucketed join vs its own DuckDB IEJoin twin
  (interval_overlap_count_sql), drawing boundary-touching, empty,
  point-adjacent and domain-spanning intervals across bucket widths;
- the canonical-bucket dedup falsifier: a pair co-occupying many
  buckets must survive EXACTLY once without any distinct;
- qualified-column falsifier: both sides sharing endpoint column names
  (the span-vs-span caller the operator exists for) must bind each
  conjunct to its own side;
- integral-endpoint validation: float endpoints broke (hi - 1)
  bucketing silently (r11 ADVICE), now a loud ValueError;
- plan shape: hash join on the bucket key, no BroadcastNestedLoopJoin /
  CartesianProduct — the reason the operator exists.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_gpu_spark.operators.interval import (
    interval_overlap_count,
    interval_overlap_count_sql,
    interval_overlap_join,
)


@st.composite
def interval_spec(draw):
    # endpoints on a small lattice so boundary-touching (l_hi == r_lo),
    # identical, nested, and empty (lo == hi) intervals all occur with
    # real probability; one giant domain-spanning interval per side is
    # drawn explicitly
    def side(n_max):
        n = draw(st.integers(1, n_max))
        out = []
        for i in range(n):
            lo = draw(st.integers(0, 24))
            span = draw(st.sampled_from([0, 0, 1, 1, 2, 3, 8, 24]))
            out.append((i, lo, lo + span))
        if draw(st.booleans()):
            out.append((len(out), 0, 64))  # giant: spans every bucket
        return out

    return {
        "left": side(8),
        "right": side(8),
        "width": draw(st.sampled_from([1, 4, 8, 16, 64])),
        "keyed": draw(st.booleans()),
    }


@given(spec=interval_spec())
@settings(
    max_examples=14,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_overlap_count_matches_duckdb_iejoin(spark, spec):
    # keys: tag rows into two shards so the equi-conjunct path is
    # exercised; unkeyed joins everything against everything
    lrows = [(i, lo, hi, i % 2) for i, lo, hi in spec["left"]]
    rrows = [(i, lo, hi, i % 2) for i, lo, hi in spec["right"]]
    keys = [("shard", "r_shard")] if spec["keyed"] else None

    ldf = spark.createDataFrame(lrows, "lid long, lo long, hi long, shard long")
    rdf = spark.createDataFrame(
        rrows, "rid long, r_lo long, r_hi long, r_shard long"
    )
    got = (
        interval_overlap_count(
            ldf, rdf, ["lid"], "lo", "hi", "r_lo", "r_hi",
            bucket_width=spec["width"], keys=keys,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("lt", pd.DataFrame(lrows, columns=["lid", "lo", "hi", "shard"]))
    con.register(
        "rt", pd.DataFrame(rrows, columns=["rid", "r_lo", "r_hi", "r_shard"])
    )
    sql = interval_overlap_count_sql(
        "lt", "rt", ["lid"], "lo", "hi", "r_lo", "r_hi",
        key_pairs=[("shard", "r_shard")] if spec["keyed"] else None,
    )
    want = con.sql(sql).df().sort_values("lid").reset_index(drop=True)
    con.close()
    assert got["lid"].tolist() == want["lid"].tolist(), spec
    assert got["n_overlaps"].tolist() == want["n_overlaps"].tolist(), spec


def test_canonical_bucket_emits_each_pair_exactly_once(spark):
    # The no-distinct claim, falsified directly: with width=2 a [0, 17)
    # x [1, 16) pair co-occupies 8 buckets; the canonical-bucket filter
    # must keep exactly one copy. A broken filter shows up as a
    # duplicated pair, a broken explosion as a missing one.
    ldf = spark.createDataFrame([(0, 0, 17), (1, 5, 6)], "lid long, lo long, hi long")
    rdf = spark.createDataFrame(
        [(0, 1, 16), (1, 15, 30)], "rid long, r_lo long, r_hi long"
    )
    pairs = interval_overlap_join(
        ldf, rdf, "lo", "hi", "r_lo", "r_hi", bucket_width=2
    ).select("lid", "rid")
    got = sorted(map(tuple, pairs.collect()))
    # exact overlaps: l0x r0 (8 shared buckets), l0 x r1 ([15,17) ∩
    # [15,30)), l1 x r0 ([5,6) ⊂ [1,16)); l1 x r1 disjoint
    assert got == [(0, 0), (0, 1), (1, 0)], got


def test_shared_endpoint_column_names_bind_per_side(spark):
    # The r11 ADVICE mis-binding: both sides carry columns (lo, hi) —
    # the span-vs-span shape. Each conjunct must bind to its own side.
    ldf = spark.createDataFrame([(0, 2, 5)], "lid long, lo long, hi long")
    rdf = spark.createDataFrame(
        [(0, 4, 9), (1, 5, 9)], "rid long, lo long, hi long"
    )
    pairs = interval_overlap_join(
        ldf, rdf, "lo", "hi", "lo", "hi", bucket_width=4
    ).select("lid", "rid")
    # [2,5) overlaps [4,9) but only TOUCHES [5,9) (half-open: no match)
    assert sorted(map(tuple, pairs.collect())) == [(0, 0)]

    counts = interval_overlap_count(
        ldf, rdf, ["lid"], "lo", "hi", "lo", "hi", bucket_width=4
    ).collect()
    assert [(r["lid"], r["n_overlaps"]) for r in counts] == [(0, 1)]


def test_float_endpoints_rejected_loudly(spark):
    # (hi - 1) half-open bucketing is only correct on an integer
    # lattice: [1.0, 8.5) with width 8 would bucket hi-1 = 7.5 to 0 and
    # silently miss its bucket-1 overlaps. Must raise, not mis-join.
    ldf = spark.createDataFrame([(0, 1.0, 8.5)], "lid long, lo double, hi double")
    rdf = spark.createDataFrame([(0, 8, 9)], "rid long, r_lo long, r_hi long")
    with pytest.raises(ValueError, match="integral"):
        interval_overlap_join(ldf, rdf, "lo", "hi", "r_lo", "r_hi", bucket_width=8)
    with pytest.raises(ValueError, match="integral"):
        interval_overlap_join(rdf, ldf, "r_lo", "r_hi", "lo", "hi", bucket_width=8)


def test_empty_and_touching_intervals_match_nothing(spark):
    ldf = spark.createDataFrame(
        [(0, 5, 5), (1, 0, 5)], "lid long, lo long, hi long"
    )
    rdf = spark.createDataFrame(
        [(0, 5, 10), (1, 3, 3)], "rid long, r_lo long, r_hi long"
    )
    pairs = interval_overlap_join(
        ldf, rdf, "lo", "hi", "r_lo", "r_hi", bucket_width=4
    ).select("lid", "rid")
    # empty [5,5) matches nothing (even inside [5,10)); [0,5) touches
    # [5,10) at the open boundary — no match; empty right [3,3) inside
    # [0,5) — no match
    assert pairs.collect() == []


def test_interval_join_plans_hash_join_no_nested_loop(spark):
    # The operator's reason to exist: the raw range-predicate join
    # compiles to BroadcastNestedLoopJoin; the bucketed form must plan a
    # plain equi hash/merge join on the bucket key.
    from hadoop_gpu_spark import plans

    ldf = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 3).alias("lo"),
        (F.col("id") * 3 + 5).alias("hi"),
    )
    rdf = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 4).alias("r_lo"),
        (F.col("id") * 4 + 7).alias("r_hi"),
    )
    df = interval_overlap_join(ldf, rdf, "lo", "hi", "r_lo", "r_hi", bucket_width=8)
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "Join" in plan
