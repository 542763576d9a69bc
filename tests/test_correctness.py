"""Differential correctness: every registered operator vs its DuckDB
oracle at sf0.001 (fast path; the driver's gate runs sf0.01 — run
`python -m tools.diffcheck` for that before declaring done)."""

from __future__ import annotations

import pytest

from logdb_spark.registry import all_operators
from tests.conftest import SF_SMALL
from tools.diffcheck import check_one

OPS = all_operators()


@pytest.mark.parametrize("name", sorted(OPS))
def test_operator_matches_oracle(name, spark, oracle_small):
    ok, msg = check_one(spark, oracle_small, OPS[name], SF_SMALL)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert e.queries().keys() >= {"agg_pricing_summary", "scan_parquet"}
    # every oracle key must have a matching query
    assert set(e.oracle_sql()) <= set(e.queries())
