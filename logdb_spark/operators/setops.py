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
