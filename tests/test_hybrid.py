"""Hybrid CPU/GPU routing: the reference scheduler's split policy
(JobQueueTaskScheduler.java:177-193) + HybridOp path equivalence."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hadoop_gpu_spark.hybrid import AlphaEstimator, HybridOp, makespan_split, run_hybrid


def _ref_makespan(pending, n_cpu, n_gpu, alpha):
    best = None
    for x in range(pending + 1):
        y = pending - x
        f = max(math.ceil(x / n_cpu) * alpha, math.ceil(y / n_gpu))
        if best is None or f < best[0]:
            best = (f, x, y)
    return best


def test_makespan_matches_reference_scan():
    # reference shipped config: 4 CPU + 1 GPU slots (mapred-site.xml:15-21)
    for pending in (0, 1, 5, 17, 100):
        for alpha in (0.5, 1.0, 1.93, 4.0):  # 1.93 = the paper's speedup
            x, y = makespan_split(pending, 4, 1, alpha)
            assert x + y == pending
            f_got = max(math.ceil(x / 4) * alpha, math.ceil(y / 1)) if pending else 0
            f_best = _ref_makespan(pending, 4, 1, alpha)[0] if pending else 0
            assert f_got == f_best


def test_makespan_cold_start_routes_cpu():
    # alpha unknown (0) → all CPU, like the scheduler before both means exist
    assert makespan_split(10, 4, 1, 0.0) == (10, 0)


def test_alpha_estimator():
    est = AlphaEstimator()
    assert est.alpha == 0.0
    est.record("cpu", 2.0)
    assert est.alpha == 0.0  # still unmeasured on GPU
    est.record("gpu", 1.0)
    assert est.alpha == 2.0


def _double_cpu(batches):
    for pdf in batches:
        yield pd.DataFrame({"x": pdf["x"] * 2})


def _double_gpu(batches):
    # "GPU" stand-in with identical semantics (no CUDA in this container) —
    # the CPU≡GPU equivalence contract (FIXTURES.md §9).
    for pdf in batches:
        yield pd.DataFrame({"x": (pdf["x"].to_numpy() * 2)})


def test_hybrid_op_paths_equivalent(spark):
    df = spark.range(100).selectExpr("id as x")
    op = HybridOp("double", _double_cpu, "x long", gpu_fn=_double_gpu)
    cpu = sorted(r["x"] for r in op.apply(df, force_path="cpu").collect())
    gpu = sorted(r["x"] for r in op.apply(df, force_path="gpu").collect())
    assert cpu == gpu == [2 * i for i in range(100)]
    # accumulator-backed batch timers flowed back from the executors
    assert op._acc["cpu_n"].value > 0 and op._acc["gpu_n"].value > 0
    assert op.alpha > 0


def test_run_hybrid_no_gpu_falls_back(spark):
    df = spark.range(50).selectExpr("id as x")
    op = HybridOp("double", _double_cpu, "x long", gpu_fn=None)
    out = sorted(r["x"] for r in run_hybrid(op, df).collect())
    assert out == [2 * i for i in range(50)]


def test_hybrid_grouped_op(spark):
    from hadoop_gpu_spark.hybrid import HybridGroupedOp

    df = spark.createDataFrame([(g, v) for g in range(3) for v in range(5)], ["g", "v"])

    def agg_cpu(pdf):
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "s": [int(pdf["v"].sum())]})

    op = HybridGroupedOp("groupsum", agg_cpu, "g long, s long", gpu_fn=agg_cpu)
    out = {r["g"]: r["s"] for r in op.apply(df, ["g"]).collect()}
    assert out == {0: 10, 1: 10, 2: 10}


def test_resource_profile_helpers(spark):
    from hadoop_gpu_spark.hybrid.resources import (
        apply_profile,
        cluster_supports_gpu_scheduling,
        gpu_task_profile,
    )

    # local mode: construction works, scheduling unsupported, apply = no-op
    profile = gpu_task_profile(cpus_per_task=1, gpus_per_task=1.0)
    assert profile is not None
    assert cluster_supports_gpu_scheduling(spark) is False
    df = spark.range(10)
    assert apply_profile(df, profile).count() == 10


def test_cpu_gate_matches_reference_condition():
    # JobQueueTaskScheduler.java:265: CPU assignment happens iff
    # pendingMapLoad >= alpha * trackerGPUMapCapacity.
    from hadoop_gpu_spark.hybrid import cpu_gate

    assert cpu_gate(8, 4.0, 2)      # 8 >= 8
    assert not cpu_gate(7, 4.0, 2)  # 7 < 8 -> "DO NOT try to assign to CPU"
    assert cpu_gate(1, 0.5, 1)      # 1 >= 0.5
    assert not cpu_gate(3, 4.0, 1)  # 3 < 4


def test_makespan_scan_subsumes_cpu_gate():
    # Whenever the reference gate is closed (pending < alpha * n_gpu), the
    # min-makespan scan must independently conclude x=0 (pure GPU): a
    # single CPU task costs ceil(1/n_cpu)*alpha = alpha while the whole
    # backlog on GPU costs ceil(pending/n_gpu) < alpha. In every case the
    # chosen split must be makespan-optimal (brute-force check).
    # Sweeps alpha in {0.5, 1, 4} x capacities x backlog.
    import math

    from hadoop_gpu_spark.hybrid import cpu_gate, makespan_split

    def f(x, pending, n_cpu, n_gpu, alpha):
        return max(math.ceil(x / n_cpu) * alpha, math.ceil((pending - x) / n_gpu))

    for alpha in (0.5, 1.0, 4.0):
        for n_cpu in (1, 4, 8):
            for n_gpu in (1, 2):
                for pending in range(1, 33):
                    x, y = makespan_split(pending, n_cpu, n_gpu, alpha)
                    assert x + y == pending
                    if not cpu_gate(pending, alpha, n_gpu):
                        assert x == 0, (
                            f"gate closed (pending={pending} < {alpha}*{n_gpu}) "
                            f"but scan assigned {x} CPU tasks"
                        )
                    best = min(f(c, pending, n_cpu, n_gpu, alpha) for c in range(pending + 1))
                    assert f(x, pending, n_cpu, n_gpu, alpha) == best, (alpha, n_cpu, n_gpu, pending, x)


def test_skewed_batch_times_drive_split():
    # Feed skewed measured batch times through the estimator and check the
    # resulting split direction end-to-end (measured alpha -> scan), the
    # way run_hybrid consumes it.
    est = AlphaEstimator()
    for t in (4.0, 4.4, 3.6):   # slow CPU batches
        est.record("cpu", t)
    for t in (1.0, 1.1, 0.9):   # fast GPU batches
        est.record("gpu", t)
    assert abs(est.alpha - 4.0) < 0.01
    x_skew, y_skew = makespan_split(16, 4, 1, est.alpha)
    # and the mirror skew: GPU slower than CPU -> nearly everything CPU
    est2 = AlphaEstimator()
    est2.record("cpu", 1.0)
    est2.record("gpu", 4.0)
    x_rev, y_rev = makespan_split(16, 4, 1, est2.alpha)
    assert y_skew > y_rev, (y_skew, y_rev)
    assert x_rev > x_skew, (x_rev, x_skew)
    # alpha=4, 16 pending, 4 cpu + 1 gpu: reference scan optimum is the
    # balanced point f = max(ceil(x/4)*4, 16-x) -> x=3..4, f=4... verify
    # against brute force
    import math
    best = min(range(17), key=lambda x: max(math.ceil(x / 4) * 4.0, math.ceil((16 - x) / 1)))
    got_f = max(math.ceil(x_skew / 4) * 4.0, math.ceil(y_skew / 1))
    best_f = max(math.ceil(best / 4) * 4.0, math.ceil((16 - best) / 1))
    assert got_f == best_f


def test_run_hybrid_auto_gpu_routing_with_shim(spark, monkeypatch):
    # The GPU_AVAILABLE-gated auto path, exercised without CUDA: force the
    # availability flag and give the op a gpu_fn that marks its rows. Both
    # paths must receive partitions per the makespan split and the union
    # must cover every input row exactly once.
    import hadoop_gpu_spark.hybrid as hybrid
    from hadoop_gpu_spark.hybrid import HybridOp, run_hybrid

    def cpu_fn(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["path"] = "cpu"
            yield pdf[["x", "path"]]

    def gpu_fn(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["path"] = "gpu"
            yield pdf[["x", "path"]]

    monkeypatch.setattr(hybrid, "GPU_AVAILABLE", True)
    op = HybridOp("tagger", cpu_fn, "x long, path string", gpu_fn=gpu_fn)
    df = spark.range(100).selectExpr("id AS x").repartition(8)
    # measure both paths (the reference's warm-up attempts) so alpha > 0
    op.apply(df, force_path="cpu").collect()
    op.apply(df, force_path="gpu").collect()
    assert op.alpha > 0
    # Pin alpha for the routing step: the warm-ups above measure REAL wall
    # time, and under a loaded test machine the measured ratio can swing
    # extreme enough that makespan_split routes every partition to one
    # path (x=0 or y=0), flaking the both-paths assertion below. alpha=1
    # gives the deterministic 6:2 split at (8 parts, 4 cpu, 2 gpu).
    monkeypatch.setattr(type(op), "alpha", property(lambda self: 1.0))
    out = run_hybrid(op, df, n_cpu_slots=4, n_gpu_slots=2).collect()
    assert sorted(r["x"] for r in out) == list(range(100))
    paths = {r["path"] for r in out}
    assert paths == {"cpu", "gpu"}, paths


def test_measured_routing_follows_reference_scan(spark, monkeypatch):
    # End-to-end MEASURED adaptive routing under the cupy shim (r04
    # VERDICT #8): both paths carry controlled per-batch costs, the op's
    # accumulators measure them, and the realized partition split of
    # run_hybrid must equal makespan_split(total, n_cpu, n_gpu, measured
    # alpha) — the reference's min-makespan scan
    # (JobQueueTaskScheduler.java:177-193) driven by real measurements,
    # not a hand-fed alpha. Deterministic: sleeps dominate jitter by 10x,
    # and the expected split is computed from the SAME measured alpha
    # run_hybrid consumes, so the assertion is exact regardless of the
    # precise alpha value.
    import time as _time

    import hadoop_gpu_spark.hybrid as hybrid
    from hadoop_gpu_spark.hybrid import HybridOp, makespan_split, run_hybrid

    from pyspark.sql import functions as F2

    def make_fn(tag, cost_s):
        def fn(batches):
            for pdf in batches:
                if len(pdf):
                    _time.sleep(cost_s)
                pdf = pdf.copy()
                pdf["path"] = tag
                yield pdf[["x", "opid", "path"]]

        return fn

    monkeypatch.setattr(hybrid, "GPU_AVAILABLE", True)

    def routed(cpu_cost, gpu_cost):
        op = HybridOp(
            "timed",
            make_fn("cpu", cpu_cost),
            "x long, opid int, path string",
            gpu_fn=make_fn("gpu", gpu_cost),
        )
        # capture each row's physical partition id as DATA so the routing
        # decision is observable per-partition downstream (run_hybrid
        # splits on spark_partition_id, the unit of the reference's scan)
        df = (
            spark.range(104)
            .selectExpr("id AS x")
            .repartition(8)
            .withColumn("opid", F2.spark_partition_id())
        )
        # warm-up attempts on both paths -> measured alpha (the
        # scheduler's meanCpuMapTime/meanGpuMapTime)
        op.apply(df, force_path="cpu").collect()
        op.apply(df, force_path="gpu").collect()
        alpha = op.alpha
        assert alpha > 0
        x_exp, y_exp = makespan_split(8, 4, 1, alpha)
        rows = run_hybrid(op, df, n_cpu_slots=4, n_gpu_slots=1).collect()
        assert len(rows) == 104 and sorted(r["x"] for r in rows) == list(range(104))
        by_path = {"cpu": set(), "gpu": set()}
        for r in rows:
            by_path[r["path"]].add(r["opid"])
        # the realized split must be EXACTLY the scan's: partitions
        # pid % 8 < x_exp on CPU, the rest on GPU
        assert by_path["cpu"] == {p for p in range(8) if p < x_exp}, (
            alpha,
            (x_exp, y_exp),
            by_path,
        )
        assert by_path["gpu"] == {p for p in range(8) if p >= x_exp}
        return alpha, by_path

    # GPU 15x faster: measured alpha ~15 -> the scan must push most (or
    # all) partitions to the GPU side. 15x (not 5x) separation so the
    # ratio survives absolute scheduler-preemption jitter under machine
    # load: preemption adds the SAME absolute time to both paths' batch
    # timers, and at 5x a ~50 ms stall compressed the measured ratio
    # under the threshold (observed once when a second Spark session ran
    # concurrently); at 15x the jitter needed to break the >2 assert is
    # >100 ms per batch, beyond anything a loaded-but-working box shows.
    a_fast, fast = routed(cpu_cost=0.15, gpu_cost=0.01)
    assert a_fast > 2, a_fast
    # mirror skew, GPU 15x slower: alpha < 1 -> CPU keeps (almost) all
    a_slow, slow = routed(cpu_cost=0.01, gpu_cost=0.15)
    assert a_slow < 1, a_slow
    assert len(slow["cpu"]) > len(fast["cpu"])
    assert len(fast["gpu"]) > len(slow["gpu"])


def test_run_hybrid_dual_path_single_scan(spark, monkeypatch, tmp_path):
    # r12 (r11 VERDICT #7): the dual-path branch must read its input
    # ONCE — the old filter-twice-union form compiled two plan branches
    # that each re-scanned the source. Routing now happens inside one
    # mapInPandas keyed on the partition-uniform __pid tag.
    import re

    import hadoop_gpu_spark.hybrid as hybrid
    from hadoop_gpu_spark import plans
    from hadoop_gpu_spark.hybrid import HybridOp, run_hybrid

    def mk(tag):
        def fn(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["path"] = tag
                yield pdf[["x", "path"]]

        return fn

    monkeypatch.setattr(hybrid, "GPU_AVAILABLE", True)
    op = HybridOp("tagger", mk("cpu"), "x long, path string", gpu_fn=mk("gpu"))
    path = str(tmp_path / "src")
    spark.range(64).selectExpr("id AS x").repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    op.apply(df, force_path="cpu").collect()
    op.apply(df, force_path="gpu").collect()
    assert op.alpha > 0
    # Pin alpha for the routing step (same rationale as the auto-routing
    # test above): the warm-ups measure REAL wall time, so under a loaded
    # machine makespan_split can route every partition to one path and
    # flake the both-paths assertion. alpha=1 gives the deterministic 6:2
    # split at (8 parts, 4 cpu, 2 gpu).
    monkeypatch.setattr(type(op), "alpha", property(lambda self: 1.0))
    out = run_hybrid(op, df, n_cpu_slots=4, n_gpu_slots=2)
    plan = plans.formatted_plan(out)
    assert len(re.findall(r"^\s*\(\d+\) Scan parquet\b", plan, re.M)) == 1, plan
    rows = out.collect()
    assert sorted(r["x"] for r in rows) == list(range(64))
    assert {r["path"] for r in rows} == {"cpu", "gpu"}


def test_router_skips_empty_leading_batches():
    # r12 ADVICE: Arrow can deliver an EMPTY leading batch after upstream
    # filters; the router must advance to the first non-empty batch to
    # read the partition tag (not IndexError inside the task), keep the
    # skipped empties in-stream, and yield nothing for all-empty
    # partitions.
    from hadoop_gpu_spark.hybrid import _make_router

    def leg(tag):
        def run(batches):
            for b in batches:
                assert "__pid" not in b.columns
                out = b.copy()
                out["path"] = tag
                yield out

        return run

    route = _make_router(leg("cpu"), leg("gpu"), x=2, total=4)

    empty = pd.DataFrame({"x": pd.Series([], dtype="int64"),
                          "__pid": pd.Series([], dtype="int64")})
    full = pd.DataFrame({"x": [1, 2], "__pid": [3, 3]})
    out = list(route(iter([empty, full])))
    # the empty head batch is preserved in-stream (2 output batches) and
    # pid 3 >= x routes to the gpu leg
    assert len(out) == 2
    assert list(out[1]["x"]) == [1, 2]
    assert set(out[1]["path"]) == {"gpu"}

    cpu_out = list(route(iter([pd.DataFrame({"x": [7], "__pid": [0]})])))
    assert set(cpu_out[0]["path"]) == {"cpu"}

    assert list(route(iter([empty, empty]))) == []
    assert list(route(iter([]))) == []
