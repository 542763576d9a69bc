"""§2.F — sorts, limits, top-k.

orderBy + limit compiles to TakeOrderedAndProject: each partition keeps
a bounded heap of k rows and only k×partitions rows reach the driver-
side merge — a top-k at 100 TB never global-sorts. Per-group top-k uses
a rank window (partition-local sort). Unique tiebreakers everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.F sorts/topk"


@register(
    "sort_multikey_nulls",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE o_orderpriority END AS pri_or_null
        FROM orders
        ORDER BY o_orderstatus ASC,
                 pri_or_null ASC NULLS LAST,
                 o_totalprice DESC,
                 o_orderkey
        LIMIT 100
    """,
    section=SECTION,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST (nulls manufactured —
    fixtures have none) and a unique tiebreaker before LIMIT."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "pri_or_null",
            F.when(F.col("o_orderstatus") == "P", None).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("pri_or_null").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "pri_or_null")
    )


@register(
    "topk_global",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    section=SECTION,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 — TakeOrderedAndProject, no full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT event_type, event_id, value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY value DESC, event_id) <= 3
    """,
    section=SECTION,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 by value within each event type via rank window. Spark
    pushes a per-partition limit under the window sort (WindowGroupLimit)
    so each shuffle partition only carries k rows per key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )
