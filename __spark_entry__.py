"""Driver contract for the spark-graft builder (PySpark target).

Thin glue over ``logdb_spark`` — the registry in
``logdb_spark/registry.py`` is the single source of truth for the
operator inventory (SURVEY.md §2); each operator registers its Spark
callable and its DuckDB oracle SQL side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logdb_spark.registry import all_oracle_sql, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from logdb_spark.operators.aggs import agg_pricing_summary

    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query name; names without an oracle are
    deliberately rows-only (approx sketches, sinks, streaming state)."""
    return all_oracle_sql()
