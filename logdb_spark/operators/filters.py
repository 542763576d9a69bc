"""§2.B — projections, filters, predicates.

All expressed as Catalyst-native expressions: compound predicates fold
into a single Filter node pushed at/under the scan; computed
projections stay inside whole-stage codegen. No shuffles anywhere in
this section — these scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.B filters/projections"


@register(
    "filter_compound",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE ((l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05)
               OR l_returnflag IN ('A', 'R'))
          AND NOT (l_linestatus = 'O' AND l_quantity > 45)
    """,
    section=SECTION,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN in one Filter node."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity").between(10, 20) & (F.col("l_discount") > 0.05))
        | F.col("l_returnflag").isin("A", "R")
    ) & ~((F.col("l_linestatus") == "O") & (F.col("l_quantity") > 45))
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_like_regex",
    oracle="""
        SELECT p_partkey, p_type, p_name
        FROM part
        WHERE p_type LIKE 'PROMO%'
           OR p_type LIKE '%STEEL'
           OR regexp_matches(p_name, '(red|blue)')
    """,
    section=SECTION,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix/suffix (pushed as StringStartsWith/EndsWith) + rlike."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%")
        | F.col("p_type").like("%STEEL")
        | F.col("p_name").rlike("(red|blue)")
    ).select("p_partkey", "p_type", "p_name")


@register(
    "filter_null_semantics",
    oracle="""
        WITH e AS (
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
                   CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS u
            FROM events
        )
        SELECT event_id,
               (v IS NOT DISTINCT FROM NULL) AS v_is_null,
               COALESCE(u, -1) AS u_or_default,
               (u IS NOT DISTINCT FROM u)  AS null_safe_self_eq
        FROM e
        WHERE v IS NULL OR v > 100
    """,
    section=SECTION,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: nulls manufactured in-query (fixtures have
    none), then null-safe equality / coalesce / IS NULL filtering."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("user_id") % 7 == 0, None).otherwise(F.col("user_id")).alias("u"),
    )
    return e.filter(F.col("v").isNull() | (F.col("v") > 100)).select(
        "event_id",
        F.col("v").eqNullSafe(F.lit(None).cast("double")).alias("v_is_null"),
        F.coalesce("u", F.lit(-1)).alias("u_or_default"),
        F.col("u").eqNullSafe(F.col("u")).alias("null_safe_self_eq"),
    )


@register(
    "project_computed",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue,
               CAST(ROUND(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                                     * (1 - CAST(l_discount AS DECIMAL(18,4))), 2)
                               AS DECIMAL(18,2))
                          * CAST(1 + CAST(l_tax AS DECIMAL(18,4)) AS DECIMAL(8,4)),
                          2) AS DOUBLE)
                   AS revenue_taxed,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 35 THEN 'medium'
                    ELSE 'large' END AS qty_band
        FROM lineitem
    """,
    section=SECTION,
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns + CASE WHEN banding, all codegen'd.

    Money products are computed in DECIMAL (exact on both engines) and
    rounded in decimal space — per-row round(double) diverges between
    engines at .xx5 half-boundaries (found by diffcheck: 118/60 000
    rows off by a cent with the double path)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec4("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    rev2 = F.round(revenue, 2).cast("decimal(18,2)")
    tax1 = (F.lit(1) + dec4("l_tax")).cast("decimal(8,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(revenue).alias("revenue"),
        dround(rev2 * tax1).alias("revenue_taxed"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 35, "medium")
        .otherwise("large")
        .alias("qty_band"),
    )
