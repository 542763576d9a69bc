"""Fixture table loading — the one place schema quirks are handled.

Fixture schemas are contractual (FIXTURES.md). The single quirk: the
``events.ts`` column is parquet timestamp[ns]; with the
``nanosAsLong`` legacy conf (set by plans.session.configure) Spark
reads it as epoch-nanos long, and we convert to a proper
microsecond-precision TimestampType here so every downstream operator
sees a timestamp. DuckDB reads the same file natively at ns precision,
so oracle-checked outputs truncate/format time columns (functions/
temporal.py) rather than emitting raw timestamps.

Scale note: this is a plain ``spark.read.parquet`` — columnar,
predicate/projection pushdown intact, splittable by row group. No
driver-side materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.plans.session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with quirks normalized."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long -> microsecond timestamp (floor division;
        # sub-microsecond digits are dropped, hence the string/trunc
        # discipline in checked outputs).
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
