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
    "part",
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


# --- r4 widening: the remaining TPC-H shapes expressible on the fixture
# schema (no partsupp table; no l_shipmode/l_commitdate columns — Q2,
# Q11, Q12, Q16, Q19 are not expressible and are documented out in
# SURVEY §2). Dialect discipline as above: decimal money, ROUND-to-
# double at the edge, date strings via each engine's formatter.


@register(
    "sql_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    section=SECTION,
)
def sql_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one
    slow-shipped lineitem — the correlated-EXISTS (left-semi plan)
    surface. Catalyst rewrites EXISTS to a semi join on l_orderkey;
    at scale that is one shuffle on the join key with the quarter
    filter pushed to the orders scan."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """,
    )


@register(
    "sql_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
    """,
    section=SECTION,
)
def sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by year — the dual-role dimension join (nation joined twice under
    different aliases). Both nation sides broadcast; the disjunctive
    nation-pair filter prunes before aggregation."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(ROUND({_REVENUE}, 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        """,
    )


@register(
    "sql_q8_market_share",
    oracle=f"""
        WITH all_rev AS (
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                   n1.n_name AS supp_nation,
                   {_REVENUE} AS rev
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN part     ON l_partkey = p_partkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_year, supp_nation
        )
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_6'
                                   THEN rev ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
        FROM all_rev GROUP BY o_year
    """,
    section=SECTION,
)
def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue by year —
    conditional aggregation over an 8-way star join. The share divides
    two EXACT decimal sums cast to double at the edge, so the ratio is
    bit-identical cross-engine before the ROUND."""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH all_rev AS (
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                   n1.n_name AS supp_nation,
                   {_REVENUE} AS rev
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN part     ON l_partkey = p_partkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_year, supp_nation
        )
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_6'
                                   THEN rev ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
        FROM all_rev GROUP BY o_year
        """,
    )


@register(
    "sql_q14_promo_revenue",
    oracle=f"""
        SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE 0 END) AS DOUBLE)
               / CAST({_REVENUE} AS DOUBLE), 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    section=SECTION,
)
def sql_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type share of one month's revenue — a
    single-row conditional-aggregate ratio over the part join."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE 0 END) AS DOUBLE)
               / CAST({_REVENUE} AS DOUBLE), 6) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        """,
    )


@register(
    "sql_q15_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey, {_REVENUE} AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total = (SELECT MAX(total) FROM rev)
    """,
    section=SECTION,
)
def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier(s) — a
    scalar-subquery max over a derived revenue view. The equality
    compares EXACT decimal totals (ties kept, as the spec requires);
    rounding to double happens only at the output edge."""
    return _sql(
        spark,
        sf_dir,
        f"""
        WITH rev AS (
            SELECT l_suppkey, {_REVENUE} AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total = (SELECT MAX(total) FROM rev)
        """,
    )


@register(
    "sql_q18_large_orders",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice,
               CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        HAVING SUM(l_quantity) > 250
    """,
    section=SECTION,
)
def sql_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders above a total-quantity threshold with
    their customers — the HAVING-over-join surface. Fixture
    l_quantity values are integral doubles, so the quantity sum is
    exact and the >250 cut (≈ p99 of order quantity sums) is
    engine-independent."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_totalprice,
               CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        HAVING SUM(l_quantity) > 250
        """,
    )


@register(
    "sql_q22_idle_customers",
    oracle="""
        WITH bal AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
                   COUNT(*) AS n
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT n_name, COUNT(*) AS n_custs,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT n FROM bal)
                  > (SELECT s FROM bal)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY n_name
    """,
    section=SECTION,
)
def sql_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers gone idle (no
    order since 1999), summarized per nation — the anti-join (NOT
    EXISTS) + scalar-aggregate-subquery surface. The above-average
    test multiplies through by the count (bal * n > sum) so it
    compares EXACT decimals — never a cross-engine double average."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH bal AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
                   COUNT(*) AS n
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT n_name, COUNT(*) AS n_custs,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT n FROM bal)
                  > (SELECT s FROM bal)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY n_name
        """,
    )
