"""Analytics composites through the SQL entry point (SURVEY.md §3.3).

Every other operator uses the DataFrame API; these run as SQL text via
spark.sql over registered temp views — proving the second entry point
converges to the same Catalyst plans (same pushdown, same broadcasts).
The shapes are the classic warehouse queries a log store still needs
(TPC-H Q3/Q5/Q10 adapted to the fixture schema), with the decimal
money discipline templated into both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.N sql analytics"

_REG_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "orders",
    "lineitem",
)


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    for name in _REG_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(query)


_REVENUE = "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))))"


@register(
    "sql_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    section=SECTION,
)
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one segment."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT l_orderkey,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
    )


@register(
    "sql_q5_local_supplier",
    oracle=f"""
        SELECT n_name, CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    section=SECTION,
)
def sql_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation — the 6-way
    join with the customer-nation = supplier-nation co-location
    constraint."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT n_name, CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        """,
    )


@register(
    "sql_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    section=SECTION,
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT c_custkey, c_name,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    )
