"""Scale-layout techniques as first-class operators: bucketed
co-located joins and salted skew joins.

These are the two levers the 100 TB join story turns on beyond
broadcasting (SURVEY.md §4): bucketing pre-shuffles data once at write
time so repeated joins/aggregations on the bucket key run with NO
exchange; salting splits a hot key across sub-partitions so one
reducer doesn't own the whole key (AQE skew-join does this adaptively;
the explicit form is portable to any key distribution you know ahead
of time). Salting never changes results, so the salted join is
oracle-checked against the plain join semantics.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table
from logdb_spark.sources.scratch import scratch_dir

SECTION = "2.M layout/scale techniques"

N_SALT = 8


@register(
    "sink_bucketed_join",
    # Upgraded from rows-only in r4: bucketing is a physical layout —
    # the join aggregate must equal the plain join's, and the plan
    # property (no exchange feeding the join) is asserted separately
    # in tests/test_plans.py.
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    section=SECTION,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + co-located join, hash-checked against the
    plain-join oracle; the plan property — no shuffle exchange feeding
    the join — is asserted in tests/test_plans.py.

    orders and lineitem are written bucketed by the join key into a
    scratch database; the subsequent join reads bucket-aligned files
    and sort-merge-joins them with ZERO exchange on either side. At
    100 TB this is the difference between re-shuffling 100 TB per join
    and shuffling once at ingest.
    """
    scratch = scratch_dir("logdb_buckets_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS logdb_scratch LOCATION '{scratch}'")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Repartition on the bucket key with numPartitions = numBuckets
    # BEFORE the bucketed write (r13, guide §6): HashPartitioning and
    # the bucket id are the same pmod(murmur3, n), so each write task
    # holds exactly one bucket — one file per bucket instead of
    # (input partitions × buckets) files, and the sort+write
    # parallelizes across buckets instead of running inside however
    # many partitions the scan produced (the fixture parquet is ONE
    # row group, so the old write sorted both tables in a single
    # task). Same discipline at 100 TB: bucket-aligned repartition is
    # the standard guard against bucketed-write file explosion.
    (
        o.repartition(8, F.col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("logdb_scratch.orders_b")
    )
    (
        li.repartition(8, F.col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("logdb_scratch.lineitem_b")
    )
    ob = spark.table("logdb_scratch.orders_b")
    lb = spark.table("logdb_scratch.lineitem_b")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum(dec4("l_extendedprice"))).alias("total_price"),
        )
    )


def bucketed_join_plan_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bare bucketed join (pre-aggregation) for plan assertions."""
    ob = spark.table("logdb_scratch.orders_b")
    lb = spark.table("logdb_scratch.lineitem_b")
    return lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "l_orderkey", "o_orderstatus", "l_extendedprice"
    )


@register(
    "join_skew_salted",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_lineitems,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    section=SECTION,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted equi-join: the fact side gets a deterministic
    salt (row-key % N_SALT) and the dimension side is replicated once
    per salt value, so a hot join key spreads over N_SALT reducers.
    Results are identical to the plain join — the oracle IS the plain
    join. (AQE's skew-join split does this adaptively post-shuffle;
    explicit salting is the static form for known-skewed keys.)
    """
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_SALT))
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALT)]))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dround(F.sum(dec4("l_extendedprice"))).alias("total_price"),
        )
    )


# --- hot-key skew demonstration (tools/skewbench.py + tests) ----------
#
# The registered operator above proves salting mechanics on the fixture
# key distribution, which is NOT skewed — so there salting is pure
# overhead. The three helpers below build a fact with a genuinely hot
# key in-query and expose salted/unsalted twins of the same join, so
# the benefit is measurable and parity is testable. Measured at sf0.1
# (local[32], shuffle join forced, AQE skew-split off — the 100 TB
# regime where the dimension is too big to broadcast): see SCALING.md
# "Skew salting, measured".

HOT_FRACTION_DENOM = 2  # every 2nd row remapped → ~50% of fact on one key


def hot_skewed_fact(
    spark: SparkSession, sf_dir: str, replicate: int = 10
) -> DataFrame:
    """A deliberately skewed fact table: lineitem replicated
    ``replicate``× in-query, with every second row's join key remapped
    to the single smallest orderkey. At replicate=10 / sf0.1 that is
    ~6M rows with ~3M sharing ONE key — the shape AQE calls a skewed
    partition. The hot key is taken from orders via a broadcast 1-row
    aggregate (no driver round-trip), so it always joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    hot = F.broadcast(
        load_table(spark, sf_dir, "orders").agg(
            F.min("o_orderkey").alias("hot_key")
        )
    )
    return (
        li.crossJoin(hot)
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(replicate)))
        )
        .withColumn(
            "join_key",
            F.when(
                (F.col("l_linenumber") + F.col("rep")) % HOT_FRACTION_DENOM
                == 0,
                F.col("hot_key"),
            ).otherwise(F.col("l_orderkey")),
        )
        .select("join_key", "l_linenumber", "rep", "l_extendedprice")
    )


def _priority_rollup(joined: DataFrame) -> DataFrame:
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        dround(F.sum(dec4("l_extendedprice"))).alias("total_price"),
    )


def skewed_join_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The straggler baseline: shuffle join where one reducer owns the
    whole hot key."""
    fact = hot_skewed_fact(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return _priority_rollup(fact.join(o, fact.join_key == o.o_orderkey))


def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join, hot key spread over N_SALT reducers: fact rows get a
    deterministic hash salt (varies WITHIN a key), dimension rows are
    replicated once per salt value. Result is provably identical to the
    unsalted join (tests/test_plans.py pins parity)."""
    fact = hot_skewed_fact(spark, sf_dir).withColumn(
        "salt",
        F.pmod(F.hash("join_key", "l_linenumber", "rep"), F.lit(N_SALT)),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
        )
    )
    return _priority_rollup(
        fact.join(
            o, (fact.join_key == o.o_orderkey) & (fact.salt == o.salt)
        )
    )


def sorted_parquet_write(
    spark: SparkSession, sf_dir: str, max_records_per_file: int = 4096
) -> str:
    """Write events time-clustered (repartition by day + ts-sorted
    within partitions) to a scratch dir; returns the dir so tests can
    assert the footer stats.

    Two write-time settings make the clustering VISIBLE to readers:
    TIMESTAMP_MICROS output (INT96, the legacy default, carries no
    min/max statistics at all — no stats, no pruning), and
    maxRecordsPerFile so even fixture-scale data splits into several
    files, each covering a narrow disjoint ts range (at 100 TB the
    default 128 MB parquet block yields the same granularity as row
    groups WITHIN each big file; fixture files are far below one
    block, so files stand in for row groups here)."""

    ev = load_table(spark, sf_dir, "events")
    out_dir = scratch_dir("logdb_sorted_")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            ev.repartition(F.to_date("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return out_dir


@register(
    "sink_sorted_parquet",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               strftime(MIN(date_trunc('second', ts)),
                        '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(MAX(date_trunc('second', ts)),
                        '%Y-%m-%d %H:%M:%S') AS last_ts
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          AND ts <  TIMESTAMP '2024-01-16 00:00:00'
        GROUP BY event_type
    """,
    section=SECTION,
)
def sink_sorted_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-clustered parquet write + stats-pruned read-back: events
    are repartitioned by day and sorted by ts WITHIN each partition
    before writing, so every parquet row group covers a narrow ts
    span and a time-range scan skips row groups via min/max footer
    stats (the poor man's Z-order for the 1-D time case — THE layout
    lever for log data at 100 TB, where almost every query is
    time-bounded). The read-back day-slice aggregate is oracle-checked
    against the raw table, proving the clustered roundtrip is
    value-exact; tests/test_plans.py asserts the physical clustering
    via parquet footer metadata.
    """
    out_dir = sorted_parquet_write(spark, sf_dir)
    back = spark.read.parquet(out_dir)
    day = back.filter(
        (F.col("ts") >= "2024-01-15 00:00:00") & (F.col("ts") < "2024-01-16 00:00:00")
    )
    from logdb_spark.functions.temporal import ts_str

    return day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        ts_str(F.min(F.date_trunc("second", "ts"))).alias("first_ts"),
        ts_str(F.max(F.date_trunc("second", "ts"))).alias("last_ts"),
    )


RANGE_BUCKET_S = 300  # coarse bucket == the band width → probe ≤ 2 buckets


@register(
    "join_range_bucketed",
    # Same oracle as join_interval_selfpair — bucketing is a physical
    # rewrite of the same band join, never a semantic one.
    oracle="""
        WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts
                   FROM events)
        SELECT a.user_id,
               a.event_id AS id_a, b.event_id AS id_b,
               CAST(epoch(b.ts) - epoch(a.ts) AS BIGINT) AS gap_s
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND b.ts >= a.ts
         AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
    section=SECTION,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-join optimization: the same 5-minute band self-join as
    join_interval_selfpair, but driven by a COMPOSITE equi key
    (user_id, coarse 300 s time bucket). The probe side explodes to
    its bucket and the next one (a band of width W spans ≤ 2 buckets
    of width W), the join is pure equi on (user, bucket), and the
    exact band predicate filters the ≤2× candidates after the match.

    Why it matters at 100 TB: the plain band join's equi conjunct is
    user_id alone — one hot user's whole multi-year history lands in
    ONE join partition and the band check runs over its full cross
    product. Adding the time bucket to the key makes partition
    fan-out proportional to events-per-(user, 5 min) — bounded by
    burst rate, not by history length. Same rows out, pinned by the
    unchanged interval-join oracle.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    bucket = (F.col("ts").cast("long") / RANGE_BUCKET_S).cast("long")
    probe = ev.withColumn(
        "bucket", F.explode(F.array(bucket, bucket + 1))
    ).alias("a")
    build = ev.withColumn("bucket", bucket).alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
    )
    return probe.join(build, cond).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        (F.col("b.ts").cast("long") - F.col("a.ts").cast("long")).alias("gap_s"),
    )


def zorder_write(
    spark: SparkSession, sf_dir: str, n_files: int = 8
) -> str:
    """Morton-code-clustered events write (see sink_zorder_layout):
    z = interleave(day_of_month 5 bits, value bucket 5 bits), range-
    partitioned into n_files and sorted on z within each. Returns the
    output dir; factored so tests can inspect footer stats."""
    ev = load_table(spark, sf_dir, "events")
    da = (F.dayofmonth("ts") - 1).cast("int")  # 0..30, 5 bits
    vb = F.greatest(
        F.lit(0),
        F.least(F.lit(31), F.floor(F.col("value") * 32.0 / 100.0)),
    ).cast("int")  # 0..31, 5 bits
    z = F.lit(0)
    for i in range(5):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(da, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(vb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out_dir = scratch_dir("logdb_zorder_")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        (
            ev.withColumn("zval", z)
            .repartitionByRange(n_files, "zval")
            .sortWithinPartitions("zval")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return out_dir


@register(
    "sink_zorder_layout",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_value
        FROM events
        WHERE day(ts) BETWEEN 10 AND 12
          AND value >= 20 AND value < 40
        GROUP BY event_type
    """,
    section=SECTION,
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered parquet write + rectangle-query read-back:
    events are laid out by a 10-bit Morton code interleaving day-of-
    month (5 bits) with a 32-level value bucket (5 bits), range-
    partitioned and sorted on that z-value before writing. Unlike the
    1-D time clustering of sink_sorted_parquet, the interleaved code
    keeps BOTH dimensions locally narrow in every file, so a
    rectangle predicate (day range x value range) prunes row groups
    on min/max footer stats in either dimension — the multi-column
    data-skipping layout lakehouses call OPTIMIZE ZORDER BY. The
    z-value is pure JVM bit arithmetic (shiftleft/and/or — never a
    UDF) and exists only in the physical layout; the read-back
    rectangle aggregate is oracle-checked against the raw table,
    proving the clustered roundtrip is value-exact.
    tests/test_plans.py asserts the physical claim: per-file min/max
    spans of both key columns are narrow against the global span."""
    out_dir = zorder_write(spark, sf_dir)
    back = spark.read.parquet(out_dir)
    rect = back.filter(
        F.dayofmonth("ts").between(10, 12)
        & (F.col("value") >= 20)
        & (F.col("value") < 40)
    )
    return rect.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum(dec4("value"))).alias("total_value"),
    )


@register(
    "join_disjunctive_rewrite",
    oracle="""
        WITH pairs AS (
            SELECT c.c_custkey, s.s_suppkey,
                   c.c_nationkey = s.s_nationkey AS by_nation,
                   substring(c.c_name, length(c.c_name) - 1, 2)
                     = substring(s.s_name, length(s.s_name) - 1, 2) AS by_suffix
            FROM customer c JOIN supplier s
              ON c.c_nationkey = s.s_nationkey
              OR substring(c.c_name, length(c.c_name) - 1, 2)
                   = substring(s.s_name, length(s.s_name) - 1, 2)
        )
        SELECT by_nation, by_suffix, COUNT(*) AS n_pairs,
               COUNT(DISTINCT c_custkey) AS n_customers,
               COUNT(DISTINCT s_suppkey) AS n_suppliers
        FROM pairs GROUP BY by_nation, by_suffix
    """,
    section=SECTION,
)
def join_disjunctive_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-condition join decomposed into a UNION of equi-joins — the
    rewrite that turns a nested-loop disaster into two hash joins.
    ``c JOIN s ON a=b OR x=y`` gives Catalyst no equi-key, so the
    physical plan is BroadcastNestedLoopJoin (every pair evaluated —
    quadratic at 100 TB). The rewrite runs each disjunct as its own
    shuffled equi-join and merges per-pair flag rows with a groupBy
    max — linear in each join's output, and each leg shuffles on a
    real key. The oracle runs the naive OR join (DuckDB's optimizer
    can afford it at fixture scale) — identical result proves the
    rewrite sound, the plan sweep proves OUR side never nested-loops.

    Match-category audit output (nation-only / suffix-only / both)
    keeps the result bounded while pinning every pair's flags."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.substring(F.col("c_name"), -2, 2).alias("c_suf"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey",
        F.substring(F.col("s_name"), -2, 2).alias("s_suf"),
    )
    leg_nation = c.join(
        s, c["c_nationkey"] == s["s_nationkey"]
    ).select(
        "c_custkey", "s_suppkey",
        F.lit(True).alias("by_nation"),
        (F.col("c_suf") == F.col("s_suf")).alias("by_suffix"),
    )
    leg_suffix = c.join(s, c["c_suf"] == s["s_suf"]).select(
        "c_custkey", "s_suppkey",
        (F.col("c_nationkey") == F.col("s_nationkey")).alias("by_nation"),
        F.lit(True).alias("by_suffix"),
    )
    pairs = (
        leg_nation.unionByName(leg_suffix)
        .groupBy("c_custkey", "s_suppkey")
        .agg(
            F.max("by_nation").alias("by_nation"),
            F.max("by_suffix").alias("by_suffix"),
        )
    )
    return pairs.groupBy("by_nation", "by_suffix").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("c_custkey").alias("n_customers"),
        F.count_distinct("s_suppkey").alias("n_suppliers"),
    )


def pushdown_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy v2-scan aggregate — factored out so the plan test can
    assert PushedAggregation under the same confs the operator uses."""
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@register(
    "scan_aggregate_pushdown",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
    """,
    section=SECTION,
)
def scan_aggregate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/MIN/MAX answered from PARQUET FOOTER STATISTICS instead
    of row data: with spark.sql.parquet.aggregatePushdown on the DSv2
    reader, the scan node lists PushedAggregation and each task reads
    only row-group metadata — at 100 TB the difference between a
    full-table scan and a few KB of footers per file, the same trick
    metadata-only count(*) services in warehouse engines. The session
    keeps parquet on the default V1 reader (other operators' plans —
    DPP, bucketing — are V1 behaviors), so this operator flips to V2
    + pushdown only for its own read and RESTORES both confs in a
    finally block after forcing execution with localCheckpoint() —
    the conf must still be set when the job actually runs, so lazy
    return without the checkpoint would silently lose the pushdown.
    MIN/MAX of doubles come straight from identical parquet stats in
    both engines; no rounding needed. Pushdown requires no
    filter/groupBy (Spark bails to row scans otherwise) — this op
    pins the supported shape."""
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    prev_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        return pushdown_agg_frame(spark, sf_dir).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_agg)
