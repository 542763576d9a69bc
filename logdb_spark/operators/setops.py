"""§2.G — set operations.

UNION ALL is a zero-shuffle concatenation of children; DISTINCT
variants shuffle on the full row hash. INTERSECT/EXCEPT compile to
semi/anti joins under distinct — same scale posture as §2.C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.G set ops"


def _typed_users(spark, sf_dir, event_type):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("user_id")
    )


def _typed_user_days(spark, sf_dir, event_type):
    """(user, day) pairs for one event type — finer grain than user so
    intersect/except results are non-degenerate on the fixtures."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
    )


@register(
    "set_union_all",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    section=SECTION,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates preserved) — no shuffle."""
    return _typed_users(spark, sf_dir, "click").unionAll(
        _typed_users(spark, sf_dir, "purchase")
    )


@register(
    "set_union_distinct",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    section=SECTION,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _typed_users(spark, sf_dir, "click")
        .union(_typed_users(spark, sf_dir, "purchase"))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'signup'
        INTERSECT
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    section=SECTION,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with both a signup and a purchase (distinct semantics)."""
    return _typed_user_days(spark, sf_dir, "signup").intersect(
        _typed_user_days(spark, sf_dir, "purchase")
    )


@register(
    "set_except",
    oracle="""
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'error'
    """,
    section=SECTION,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-days with views but no errors (distinct semantics)."""
    return _typed_user_days(spark, sf_dir, "view").subtract(
        _typed_user_days(spark, sf_dir, "error")
    )


@register(
    "set_intersect_all",
    oracle="""
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'view'
        INTERSECT ALL
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: a (user, day) pair that
    views 3× and clicks 2× appears min(3,2)=2 times, preserving
    event multiplicity that the distinct variant erases. Plans as a
    partial-count aggregate on each side + one equi-shuffle on the
    full row key (Spark's IntersectAll rewrite) — same scale shape
    as a distinct intersect, never a pairwise join."""
    return _typed_user_days(spark, sf_dir, "view").intersectAll(
        _typed_user_days(spark, sf_dir, "click")
    )


@register(
    "set_except_all",
    oracle="""
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'view'
        EXCEPT ALL
        SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each (user, day) survives
    max(n_left − n_right, 0) times, the bag-algebra complement of
    INTERSECT ALL (together they partition the left multiset). Same
    single-shuffle aggregate rewrite as above."""
    return _typed_user_days(spark, sf_dir, "view").exceptAll(
        _typed_user_days(spark, sf_dir, "click")
    )


@register(
    "set_symmetric_diff",
    oracle="""
        WITH d AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events),
        clickers AS (
            SELECT DISTINCT user_id FROM events, d
            WHERE event_type = 'click' AND CAST(ts AS DATE) = md
        ), buyers AS (
            SELECT DISTINCT user_id FROM events, d
            WHERE event_type = 'purchase' AND CAST(ts AS DATE) = md
        )
        SELECT user_id, 'click_only' AS side FROM clickers
        WHERE user_id NOT IN (SELECT user_id FROM buyers)
        UNION ALL
        SELECT user_id, 'purchase_only' FROM buyers
        WHERE user_id NOT IN (SELECT user_id FROM clickers)
    """,
    section=SECTION,
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance — "who clicked on the
    final day but didn't buy, and who bought without a recorded
    click": two anti joins over day-scoped distinct user sets, each
    side labeled. Completes the set-op family (union/intersect/except
    have operators; XOR is the audit shape — divergence between two
    systems' key sets). Day-scoping keeps the sets genuinely
    different at fixture scale (over the full month every user does
    both — empty-output vacuity); the day bound itself is one
    max-aggregate scalar. Both anti joins hash on user_id; at scale
    each is one shuffle of the DISTINCT sets, not the event stream."""
    ev = load_table(spark, sf_dir, "events")
    last_day = ev.agg(F.max(F.to_date("ts"))).first()[0]  # driver-scalar: one date
    day_ev = ev.filter(F.to_date("ts") == F.lit(last_day))
    clickers = (
        day_ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
    )
    buyers = (
        day_ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    return (
        clickers.join(buyers, "user_id", "left_anti")
        .select("user_id", F.lit("click_only").alias("side"))
        .unionAll(
            buyers.join(clickers, "user_id", "left_anti").select(
                "user_id", F.lit("purchase_only").alias("side")
            )
        )
    )


@register(
    "set_union_by_name_evolution",
    oracle="""
        WITH old_batch AS (
            SELECT event_id, event_type, user_id, value
            FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-16'
        ), new_batch AS (
            SELECT event_id, event_type, props
            FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
        ), unioned AS (
            SELECT * FROM old_batch
            UNION ALL BY NAME
            SELECT * FROM new_batch
        )
        SELECT event_type, COUNT(*) AS n,
               COUNT(*) FILTER (WHERE value IS NULL) AS n_missing_value,
               COUNT(*) FILTER (WHERE props IS NULL) AS n_missing_props,
               COUNT(*) FILTER (WHERE user_id IS NULL) AS n_missing_user
        FROM unioned GROUP BY event_type
    """,
    section=SECTION,
)
def set_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old batch (has user_id + value, no
    props) unioned with a new batch (dropped user_id/value, added
    props) BY NAME with missing columns null-filled — the everyday
    lakehouse append where positional UNION would silently mis-align
    or hard-fail. Spark: unionByName(allowMissingColumns=True); DuckDB
    mirror: UNION ALL BY NAME. The audit aggregate counts the
    null-backfilled cells per column, the number a migration
    dashboard watches. Map-side projection + one groupBy on a
    5-value key."""
    ev = load_table(spark, sf_dir, "events")
    old_b = ev.filter(F.to_date("ts") < F.lit("2024-01-16")).select(
        "event_id", "event_type", "user_id", "value"
    )
    new_b = ev.filter(F.to_date("ts") >= F.lit("2024-01-16")).select(
        "event_id", "event_type", "props"
    )
    unioned = old_b.unionByName(new_b, allowMissingColumns=True)
    return unioned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_missing_value"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_missing_props"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_missing_user"),
    )
