"""logdb_spark — a PySpark-native log-analytics engine.

A from-scratch engine with the query/data-processing capability envelope
of szborows/logdb (see SURVEY.md; the reference checkout was empty at
survey time, so the contract is SURVEY.md §2), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for unbounded data, and Arrow-batched Pandas UDFs only where
built-in operators cannot express the semantics.

Layout:
    plans/      SparkSession configuration & plan inspection utilities
    sources/    parquet/text/JSON ingestion, fixture loading, sinks
    functions/  reusable column expressions (money, ratio, dot, tokens)
    operators/  the SURVEY.md §2 operator inventory (queries + oracles)
    streaming/  Structured Streaming variants + replay harness
"""

from logdb_spark.registry import all_oracle_sql, all_queries

__all__ = ["all_queries", "all_oracle_sql"]
__version__ = "0.1.0"
