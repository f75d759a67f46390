"""Every query with an oracle must hash-match it — the driver's t2 gate,
replicated locally at sf0.001 (fast) so failures surface before the round
verify at sf0.01.
"""

from __future__ import annotations

import pytest

from hadoop_gpu_spark.queries import ORACLES, QUERIES

from .oracle import check_query


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    errs = check_query(spark, name, sf_dir)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_all_oracle_queries_registered():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


# ---------------------------------------------------------------------------
# Round-end gate replica at the driver's own scale. All four r03 driver
# reds reproduced locally at sf0.01; the default suite only replicates the
# oracle at sf0.001, which can mask scale-dependent failures (the
# stream-join row explosion was 13,124-vs-83 at sf0.01). Deselected by
# default (pytest.ini); run before round end with:
#   python -m pytest tests/ -m sf01_window -q
# ---------------------------------------------------------------------------
def _driver_window():
    from hadoop_gpu_spark.queries import _DRIVER_WINDOW

    return list(_DRIVER_WINDOW)


@pytest.mark.sf01_window
@pytest.mark.parametrize("name", _driver_window())
def test_oracle_parity_sf01_window(spark, name):
    errs = check_query(spark, name, "/root/testdata/sf0.01")
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.sf01_full
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf01_full(spark, name):
    # Full-surface assurance at the driver's scale: the window marker
    # covers the 50 graded slots; this covers everything else too (the
    # round-4 sweep that proved 108/108).
    errs = check_query(spark, name, "/root/testdata/sf0.01")
    assert not errs, f"{name}: " + "; ".join(errs)


def test_no_oracle_emits_driver_unsafe_types():
    # Root cause of the two-round q_sequence_pack driver red (found r05):
    # DuckDB's SUM(BIGINT) returns HUGEINT, and a HUGEINT output column
    # reaches pandas as float64 — a dtype-strict comparator then hashes
    # oracle "98.0" against Spark's "98" and fails, while rows and schema
    # stay green and every dtype-normalizing local comparator says the
    # values match. Guard: every oracle's OUTPUT columns must bind to
    # driver-safe types (no HUGEINT/UHUGEINT/UBIGINT). Binding only — no
    # execution — so this covers all oracles in milliseconds.
    import duckdb

    from hadoop_gpu_spark.queries import ORACLES
    from hadoop_gpu_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    offenders = []
    for name, sql in ORACLES.items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if typ in ("HUGEINT", "UHUGEINT", "UBIGINT"):
                offenders.append((name, col, typ))
    assert not offenders, offenders
