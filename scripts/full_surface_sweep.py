"""Full-surface oracle sweep: every registered query (and every staged
candidate with an oracle constant) vs its DuckDB twin at sf0.01 — the
driver-identical comparison applied to the ENTIRE surface, not just the
50-query driver window. Writes LOCAL_SWEEP_r{N}.json at the repo root.

Usage::

    python scripts/full_surface_sweep.py <round> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(round_no: int, sf_dir: str) -> int:
    from hadoop_gpu_spark import get_spark
    from hadoop_gpu_spark import queries as q
    from tests.oracle import compare_frames, duckdb_con

    spark = get_spark(app_name="full-surface-sweep", shuffle_partitions=8)
    surface: dict[str, tuple] = {}
    for name in q.QUERIES:
        surface[name] = (q.QUERIES[name], q.ORACLES.get(name))
    for name in q.STAGED_CANDIDATES:
        oracle = getattr(q, f"Q_{name[2:].upper()}_ORACLE", None)
        surface[name] = (getattr(q, name), oracle)

    t0 = time.time()
    results, bad = {}, []
    for name, (fn, oracle) in surface.items():
        try:
            got = fn(spark, sf_dir).toPandas()
            if oracle is None:
                ok = len(got) >= 0
                errs = [] if ok else ["no rows"]
            else:
                con = duckdb_con(sf_dir)
                want = con.sql(oracle).df()
                con.close()
                errs = compare_frames(got, want)
                ok = not errs
        except Exception as e:  # noqa: BLE001 - sweep must finish
            ok, errs = False, [f"{type(e).__name__}: {e}"[:300]]
        results[name] = {"ok": ok, "errs": errs}
        if not ok:
            bad.append(name)
        print(("OK " if ok else "BAD ") + name, flush=True)

    out = {
        "round": round_no,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "green": len(results) - len(bad),
        "total": len(results),
        "staged_included": len(q.STAGED_CANDIDATES),
        "seconds": round(time.time() - t0, 1),
        "bad": bad,
        "results": results,
    }
    path = os.path.join(REPO, f"LOCAL_SWEEP_r{round_no:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"{out['green']}/{out['total']} green in {out['seconds']}s -> {path}")
    return 0 if not bad else 1


if __name__ == "__main__":
    rn = int(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    raise SystemExit(main(rn, sf))
