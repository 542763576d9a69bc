"""Structured Streaming replay harness.

Replays the events fixture through a real file-source stream
(readStream over parquet with an explicit schema) with
trigger(availableNow=True) — deterministic run-to-completion — into an
in-memory sink. Tests use this to prove the §2.J operators execute as
STREAMING plans (stateful window aggs, watermarks, dedup state), and
that their results match the batch-equivalent forms the driver hash-
checks.

The events ns-timestamp quirk applies here too: the stream reads ts as
epoch-nanos long (nanosAsLong) and converts — same normalization as
sources/load.py, applied to the streaming DataFrame.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from logdb_spark.plans.session import configure

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch-nanos (nanosAsLong)
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
    import tempfile

    staging = tempfile.mkdtemp(prefix="logdb_stream_")
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
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    return raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


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
