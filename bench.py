"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed to full materialization (count + a cheap checksum-ish
action via collect of the aggregated frame) — not just plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from hadoop_gpu_spark import get_spark
from hadoop_gpu_spark.queries import QUERIES

# Invariant (kept in sync with queries._DRIVER_WINDOW): every HEADLINE
# query is inside the driver's 50-query correctness window the same round
# it is benched — a time for an unverified answer is not a result.
# q_join_broadcast was retired from HEADLINE for that budget (its timing
# was redundant with q_join_star; the query itself remains registered).
#
# Round 5 is the full-rotation round: 46 of the 50 window slots are
# consumed by changed-since-green queries (16) plus the entire r01/r02
# stale-evidence cohort (37, 7 overlapping) — see the _DRIVER_WINDOW slot
# accounting. That leaves 4 flex slots, so HEADLINE shrinks to 7 for this
# round only: the 4 perf sentinels below plus the 3 changed queries that
# were already headline (q_sequence_pack, q_dedup_minhash,
# q_dedup_simhash). The r04 headline queries dropped here are all
# unchanged + r04-green; they rotate back in round 6, and their r04
# minima remain the comparison base.
HEADLINE = [
    "q01_pricing_summary",   # decimal-exact agg, single scan
    "q21_waiting_orders",    # salted skew join
    "q_kmeans",              # iterative ML (centroid broadcast loop)
    "q_winnow_fingerprint",  # vectorized fingerprint kernel (r04 8.3x win)
    "q_sequence_pack",       # two-pass prefix sum + the red-row watch
    "q_dedup_minhash",       # LSH dedup signature path (converged kernel)
    "q_dedup_simhash",       # simhash kernel (r04 bench-discrepancy watch)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="hgs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Noise discrimination (round-2 lesson: a +11.6% uniform drift was
    # indistinguishable from machine load with n=1): after one warmup pass
    # (plan analysis + whole-stage codegen), take THREE timed passes and
    # report the MINIMUM — the right estimator under contention noise,
    # since load only ever adds time — plus the max/min spread so a
    # cross-round jump on one query can be classified as signal
    # (spread small, min moved) vs environment (spread large).
    # noop sink materializes every output column (count() would let
    # Catalyst prune the projection and under-report work).
    # Steady-state measurement: TWO untimed warm cycles over the whole
    # set before any clock starts. Per-query warmup alone is not enough —
    # the JVM's tiered JIT (C2 compiles shuffle/sort/codegen internals
    # after sustained execution) warms across QUERIES, so with a short
    # headline list the early slots measured cold-JIT time: the r04->r05
    # headline trim moved q21 from position 17 to position 2 and its
    # "time" jumped 44% with nothing changed. Warm cycles make the
    # measurement independent of list length and position.
    for _cycle in range(2):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is not None:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        passes = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes.append(time.perf_counter() - t0)
        times[name] = round(min(passes), 3)
        spread[name] = round(max(passes) / min(passes), 2)
        print(f"# {name}: min {times[name]}s  spread x{spread[name]}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spread": spread,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
