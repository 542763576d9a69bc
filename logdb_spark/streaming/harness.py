"""Structured Streaming replay harness.

Replays the events fixture through a real file-source stream
(readStream over parquet with an explicit schema) with
trigger(availableNow=True) — deterministic run-to-completion — into an
in-memory sink. Tests use this to prove the §2.J operators execute as
STREAMING plans (stateful window aggs, watermarks, dedup state), and
that their results match the batch-equivalent forms the driver hash-
checks.

The events ts normalization applies here too, same as sources/load.py:
a staged dir may hold parquet timestamp columns (read natively) or raw
epoch-nanos int64 (the synthetic micro-batch fixtures; also ts[ns]
parquet under the nanosAsLong conf) — readStream needs an explicit
schema, so we infer it from a batch read of the staged dir and convert
ts to a proper timestamp only when it arrives as a long.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from logdb_spark.plans.session import configure
from logdb_spark.sources.load import normalize_ts
from logdb_spark.sources.scratch import scratch_dir

# Schema of the SYNTHETIC micro-batch fixtures (tests write raw int64
# epoch-nanos ts). Fixture-derived staging dirs may instead carry a
# parquet timestamp ts — read_events_stream infers per-dir.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch-nanos
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stage_events_dir(sf_dir: str) -> str:
    """Copy events.parquet into a fresh staging dir — the streaming
    source directory. Tests append late-data files here to exercise
    watermark drops."""
    import shutil

    staging = scratch_dir("logdb_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{staging}/batch0.parquet")
    return staging


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Events as an unbounded file source over a staging dir.
    ``max_files_per_trigger=1`` forces one staged file per micro-batch
    (file source processes oldest-first), so tests can replay a
    time-split fixture as genuinely sequential micro-batches."""
    configure(spark)
    # readStream needs an explicit schema; take it from a batch read of
    # the staged files so ts comes through as whatever the files hold
    # (timestamp[us] fixture copies, or int64 nanos synthetic batches).
    # Preconditions (ADVICE r2/r3): the batch-infer requires at least
    # one staged file, and every file in the dir must share one physical
    # ts type. Fall back to the synthetic-fixture schema ONLY when the
    # dir is verifiably empty (stream declared before its first file
    # arrives); a real read error — corrupt file, permission — must
    # propagate, not silently mis-declare the ts type.
    import glob
    import os

    if glob.glob(os.path.join(events_dir, "*.parquet")):
        inferred = spark.read.parquet(events_dir).schema
    else:
        inferred = EVENTS_STREAM_SCHEMA
    reader = spark.readStream.schema(inferred)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    # Same normalization as batch loads: nanos-long or naive-µs ts ->
    # session-TZ timestamp (watermarks reject TIMESTAMP_NTZ).
    return normalize_ts(raw)


def run_to_memory(
    stream_df: DataFrame,
    *,
    output_mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink; returns the sink contents as a batch DataFrame."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        # A silent timeout would hand back a PARTIAL memory sink and
        # produce confusing downstream assertion failures — stop the
        # query and fail here instead (ADVICE r1).
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within 120s"
        )
    spark = stream_df.sparkSession
    return spark.table(name)
