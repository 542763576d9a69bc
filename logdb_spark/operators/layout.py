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

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.M layout/scale techniques"

N_SALT = 8


@register("sink_bucketed_join", oracle=None, section=SECTION)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + co-located join (rows-only; the plan property —
    no shuffle exchange feeding the join — is asserted in
    tests/test_plans.py).

    orders and lineitem are written bucketed by the join key into a
    scratch database; the subsequent join reads bucket-aligned files
    and sort-merge-joins them with ZERO exchange on either side. At
    100 TB this is the difference between re-shuffling 100 TB per join
    and shuffling once at ingest.
    """
    scratch = tempfile.mkdtemp(prefix="logdb_buckets_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS logdb_scratch LOCATION '{scratch}'")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("logdb_scratch.orders_b")
    )
    (
        li.write.mode("overwrite")
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
        "salt", (F.col("l_linenumber") % N_SALT).cast("int")
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
