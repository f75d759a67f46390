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
