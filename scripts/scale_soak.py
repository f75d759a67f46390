"""Macro-scale soak: run the bench HEADLINE set plus the (former) staged
gates at one or more scaled fixture dirs and print a per-query table.

The reference ships gridmix (H/src/benchmarks/gridmix/README:20-45) as
its macro rung; this is ours. Fixtures come from
``make_scaled_fixtures.py`` (key-shifted replication of sf0.1, 64k-row
parquet groups). Protocol = the r13 soak's: one untimed warm pass per
scale, then min of 2 timed passes per query, full materialization via
count(); one Spark session for everything (tiered JIT stays warm), with
persisted frames and bloom broadcasts released between queries so one
query's cache never subsidizes — or poisons — the next.

Usage::

    python scripts/scale_soak.py /tmp/sf10 /tmp/sf30 [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATES = [
    "q_hll_distinct",
    "q_sparse_allpairs",
    "q_dup_spans",
    "q_bpe_token_counts",
    "q_nb_lang_confusion",
    "q_interval_overlap",
    "q_stream_cms_freq",
    "q_stream_hll_distinct",
]


def _run_once(fn, spark, sf_dir: str) -> float:
    from hadoop_gpu_spark.operators.bloom import release_bloom_broadcasts
    from hadoop_gpu_spark.utils import release_persisted_frames

    t0 = time.time()
    fn(spark, sf_dir).count()
    dt = time.time() - t0
    release_persisted_frames()
    release_bloom_broadcasts()
    return dt


def main(sf_dirs: list[str], json_out: str | None) -> int:
    from bench import HEADLINE

    from hadoop_gpu_spark import get_spark
    from hadoop_gpu_spark.queries import QUERIES

    spark = get_spark(app_name="scale-soak")
    names = [*HEADLINE, *GATES]
    load0 = os.getloadavg()
    print(f"loadavg at start: {load0}", flush=True)
    results: dict[str, dict[str, float]] = {d: {} for d in sf_dirs}
    for sf_dir in sf_dirs:
        for name in names:  # untimed warm pass (whole set, JIT + codegen)
            _run_once(QUERIES[name], spark, sf_dir)
        for name in names:
            t = min(_run_once(QUERIES[name], spark, sf_dir) for _ in range(2))
            results[sf_dir][name] = round(t, 3)
            print(f"{sf_dir} {name} {t:.3f}s", flush=True)

    print(f"\n| query | {' | '.join(sf_dirs)} | ratio |")
    print("|---|" + "---|" * (len(sf_dirs) + 1))
    for name in names:
        row = [results[d][name] for d in sf_dirs]
        ratio = row[-1] / row[0] if len(row) > 1 and row[0] > 0 else 1.0
        print(f"| {name} | {' | '.join(f'{v:.2f}' for v in row)} | {ratio:.1f}x |")
    totals = {d: round(sum(results[d].values()), 2) for d in sf_dirs}
    print(f"| TOTAL | {' | '.join(str(totals[d]) for d in sf_dirs)} | "
          f"{totals[sf_dirs[-1]] / totals[sf_dirs[0]]:.2f}x |")
    load1 = os.getloadavg()
    print(f"loadavg at end: {load1}", flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"results": results, "totals": totals,
                 "loadavg_start": load0, "loadavg_end": load1},
                f, indent=1,
            )
            f.write("\n")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out]
    raise SystemExit(main(args, out))
