"""Fixture table loading — the one place schema quirks are handled.

Fixture schemas are contractual (FIXTURES.md). The single quirk: the
``events.ts`` column's physical parquet type has varied across fixture
generations — timestamp[ns] (read as epoch-nanos long under the
``nanosAsLong`` legacy conf set by plans.session.configure) or
timestamp[us] naive (read as TIMESTAMP_NTZ). Either way we normalize
to a session-TZ TimestampType (ltz) here so every downstream operator
— including streaming watermarks, which reject NTZ — sees one stable
type. The session TZ is pinned UTC and the fixtures are naive-UTC, so
the NTZ->LTZ cast is value-identity. DuckDB reads the same file
natively, so oracle-checked outputs truncate/format time columns
(functions/temporal.py) rather than emitting raw timestamps.

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


# Per-session analyzed-plan cache: fixture parquets are immutable, so
# the file listing + footer schema inference behind spark.read.parquet
# need to happen once per (session, sf, table), not once per operator
# call — a full-registry run calls load_table ~1500× and the repeated
# driver-side listing is pure fixed overhead (r12; it dominates
# trivial ops on slow-host epochs). DataFrames are immutable and lazy,
# so handing out the same object is safe: every operator derives new
# frames from it. The cache dict lives ON the session object (ADVICE
# r12 #4 — a module-level map keyed by id(spark) can serve a NEW
# session DataFrames bound to a dead one whose id CPython recycled,
# and its entries outlive the session): attribute lifetime IS session
# lifetime, and a different session object can never see another's
# entries. configure() runs once per SESSION (its own marker, not the
# per-table cache — the r12 cut skipped it on every cache hit, so a
# session whose confs drifted mid-run was never re-normalized; a
# session-scoped marker re-runs it exactly when a new session
# appears). Per-call configure would be ~6 py4j conf round trips on
# every load — and buys nothing here: every conf-mutating operator in
# the repo restores its conf in a finally block and none touches a
# RUNTIME_CONFS key (swept by grep this round). Scratch/staging paths
# never come through here, so no staleness surface exists.


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with quirks normalized."""
    if not spark.__dict__.get("_logdb_configured", False):
        configure(spark)
        spark._logdb_configured = True
    cache = spark.__dict__.setdefault("_logdb_table_cache", {})
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_ts(df)
        cache[key] = df
    return df


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-TZ TimestampType.

    bigint = epoch-nanos (the nanosAsLong read of timestamp[ns]
    fixtures) -> floor-divide to micros; sub-microsecond digits are
    dropped, hence the string/trunc discipline in checked outputs.
    timestamp_ntz (naive timestamp[us] fixtures) -> cast, value-identity
    under the pinned UTC session TZ.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # Integer `div`, not float `/`: epoch-nanos (~1.7e18) exceed a
        # double's 53-bit mantissa, so float division can land 1µs off
        # near boundaries (ADVICE r2). `div` keeps the floor exact.
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
