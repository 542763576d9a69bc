"""Property-based test of THE critical cross-engine discipline: money
arithmetic through DECIMAL must hash-match between Spark and DuckDB
for arbitrary 2-dp inputs — including adversarial .xx5 half-boundary
products that break double rounding (SURVEY.md §8.1)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

import pyspark.sql.functions as F

from logdb_spark.functions.numeric import dec4, dround

# 2-dp money values and 2-dp fractions, the fixture domains
money_2dp = st.integers(min_value=0, max_value=50_000_000).map(lambda c: c / 100)
frac_2dp = st.integers(min_value=0, max_value=10).map(lambda c: c / 100)


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(money_2dp, frac_2dp), min_size=1, max_size=8))
def test_decimal_money_pipeline_matches_duckdb(spark, ddb, rows):
    """sum(price*(1-disc)) and per-row round through the decimal path
    agree bit-for-bit across engines for arbitrary 2-dp inputs."""
    sdf = spark.createDataFrame(rows, "price double, disc double")
    rev = dec4("price") * (F.lit(1) - dec4("disc"))
    got = sdf.agg(
        dround(F.sum(rev)).alias("total"),
        F.sort_array(F.collect_list(dround(rev))).alias("revs"),
    ).first()

    values = ", ".join(f"({p}, {d})" for p, d in rows)
    want_total, want_revs = ddb.execute(
        f"""
        WITH t(price, disc) AS (VALUES {values})
        SELECT CAST(ROUND(SUM(CAST(price AS DECIMAL(18,4))
                              * (1 - CAST(disc AS DECIMAL(18,4)))), 2) AS DOUBLE),
               list_sort(list(CAST(ROUND(CAST(price AS DECIMAL(18,4))
                              * (1 - CAST(disc AS DECIMAL(18,4))), 2) AS DOUBLE)))
        FROM t
        """
    ).fetchone()
    assert got["total"] == want_total
    assert list(got["revs"]) == list(want_revs)


def test_known_half_boundary_case(spark, ddb):
    """The exact case that broke double rounding in r1: 37081.645-ish
    products whose double is below the boundary but whose shortest
    repr sits on it."""
    rows = [(39033.31, 0.05)]  # product = 37081.6445 exactly
    sdf = spark.createDataFrame(rows, "price double, disc double")
    got = sdf.select(
        dround(dec4("price") * (F.lit(1) - dec4("disc"))).alias("rev")
    ).first()["rev"]
    want = ddb.execute(
        """
        SELECT CAST(ROUND(CAST(39033.31 AS DECIMAL(18,4))
                          * (1 - CAST(0.05 AS DECIMAL(18,4))), 2) AS DOUBLE)
        """
    ).fetchone()[0]
    assert got == want == 37081.64  # .xx45 rounds down in decimal space
