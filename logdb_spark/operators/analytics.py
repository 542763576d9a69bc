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


@register(
    "sql_q6_forecast_revenue",
    oracle="""
        SELECT CAST(ROUND(COALESCE(SUM(
                   CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(l_discount      AS DECIMAL(18,4))), 0), 2)
               AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.04
          AND l_quantity < 24
    """,
    section=SECTION,
)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate revenue forecast.
    No join at all — this is the query whose whole cost is the parquet
    scan, so at 100 TB it lives or dies on predicate pushdown +
    column pruning (only 4 of 11 lineitem columns read; min/max row
    group stats skip everything outside the ship-date year). The
    discount band is closed [0.02, 0.04]: the fixture quantizes
    l_discount to hundredths, so the band edges are exact doubles and
    the predicate is engine-independent."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT CAST(ROUND(COALESCE(SUM(
                   CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(l_discount      AS DECIMAL(18,4))), 0), 2)
               AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.04
          AND l_quantity < 24
        """,
    )


@register(
    "sql_q12_priority_shipments",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    section=SECTION,
)
def sql_q12_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way counts per shipment class
    — the join + CASE-pivot aggregate surface. Adapted to the fixture
    schema: l_linestatus stands in for l_shipmode (no shipmode
    column) and the ship-date year for the receipt-date window (no
    receipt/commit dates). The counts are integers, so the hash
    comparison is exact by construction."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        """,
    )


@register(
    "sql_q13_order_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
    """,
    section=SECTION,
)
def sql_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer-order-count histogram — a LEFT
    OUTER join (customers with zero orders must appear at c_count=0,
    which COUNT(o_orderkey) gives for the all-NULL group) feeding a
    second-level aggregation. The fixture has no o_comment column, so
    the comment-pattern exclusion is dropped; the double-aggregation
    and outer-join-preserves-empties semantics are the surface under
    test. Both aggregations are pure counts — exact."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        """,
    )


@register(
    "sql_q17_small_qty_revenue",
    oracle="""
        WITH pq AS (
            SELECT l_partkey,
                   SUM(l_quantity) AS qty_sum, COUNT(*) AS qty_n
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(ROUND(COALESCE(SUM(
                   CAST(l_extendedprice AS DECIMAL(18,4))), 0) / 7.0, 2)
               AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pq   ON pq.l_partkey = lineitem.l_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 11
          AND l_quantity * 5.0 * qty_n < qty_sum
    """,
    section=SECTION,
)
def sql_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — lineitems below
    20% of their part's average order quantity. The per-part average
    is computed once (CTE) and joined back, which is exactly how the
    correlated scalar subquery should execute at scale: one shuffle
    to build the per-part aggregate, one equi-join, never a per-row
    subquery. The 20%-of-average test is multiplied through
    (qty*5*n < sum) so it compares exact integral doubles, never a
    cross-engine double division. p_size<11 stands in for the absent
    p_container filter."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH pq AS (
            SELECT l_partkey,
                   SUM(l_quantity) AS qty_sum, COUNT(*) AS qty_n
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(ROUND(COALESCE(SUM(
                   CAST(l_extendedprice AS DECIMAL(18,4))), 0) / 7.0, 2)
               AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pq   ON pq.l_partkey = lineitem.l_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 11
          AND l_quantity * 5.0 * qty_n < qty_sum
        """,
    )


@register(
    "sql_q19_bracket_revenue",
    oracle=f"""
        SELECT CAST(ROUND(COALESCE({_REVENUE}, 0), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1  AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    section=SECTION,
)
def sql_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates over a join —
    three OR'd (brand, size, quantity) brackets that the optimizer
    must NOT turn into a cross product. Catalyst extracts the common
    join key (p_partkey = l_partkey) out of the disjunction so this
    stays a broadcast hash join with the brackets as a post-join
    filter; the p_brand IN (...) superset is also inferred and pushed
    to the part scan. Container/shipmode legs of the classic
    predicate are dropped (absent columns); size brackets stand in."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT CAST(ROUND(COALESCE({_REVENUE}, 0), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1  AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)
        """,
    )


@register(
    "sql_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    section=SECTION,
)
def sql_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame supplier query — for finished
    orders, find suppliers whose lineitem came back flagged ('R'
    stands in for the absent receipt>commit lateness columns) in
    multi-supplier orders where NO other supplier was flagged. This
    is the classic EXISTS + NOT-EXISTS pair: Catalyst plans them as a
    left-semi and a left-anti join on l_orderkey, both shuffle-
    hash-joinable on the same key — no per-row subquery execution at
    scale. The classic nation filter is dropped: the fixture's
    sole-blame slice is sparse enough that any single-nation cut is
    empty at test sfs, and an always-empty result is no evidence.
    Deterministic top-10 via (numwait DESC, s_name)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders      ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """,
    )


_SPIKES_SQL = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hh, COUNT(*) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT hh, n FROM hourly
    WHERE n >= (SELECT 1.2 * AVG(n) FROM hourly)
"""

_SPIKE_CHAIN_CORE = """
WITH RECURSIVE chain AS (
    SELECT s.hh AS anchor_hh, s.hh AS hh, s.n AS n, 1 AS depth
    FROM spikes s LEFT JOIN spikes p ON p.hh = s.hh - INTERVAL 1 HOUR
    WHERE p.hh IS NULL
    UNION ALL
    SELECT c.anchor_hh, s.hh, s.n, c.depth + 1
    FROM chain c JOIN spikes s ON s.hh = c.hh + INTERVAL 1 HOUR
)
SELECT {fmt_anchor} AS run_start, {fmt_hh} AS hour,
       CAST(n AS BIGINT) AS n_errors, CAST(depth AS INT) AS depth
FROM chain
"""


@register(
    "sql_recursive_spike_chain",
    # Same recursion, with the spikes relation inlined as a CTE (the
    # Spark side materializes it first — see docstring).
    oracle=_SPIKE_CHAIN_CORE.replace(
        "WITH RECURSIVE chain AS (",
        f"WITH RECURSIVE spikes AS ({_SPIKES_SQL}), chain AS (",
    ).format(
        fmt_anchor="strftime(anchor_hh, '%Y-%m-%d %H:%M:%S')",
        fmt_hh="strftime(hh, '%Y-%m-%d %H:%M:%S')",
    ),
    section=SECTION,
)
def sql_recursive_spike_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL entry point (Spark 4 recursive
    CTE): maximal runs of consecutive error-spike hours, walked as a
    recursion — anchors are spike hours with no spiking predecessor
    (anti self-join), each step extends the run one hour and
    increments depth. The same islands that win_gap_islands derives
    with rank arithmetic fall out of genuine iteration here, which is
    the surface under test; Spark executes each recursive step as one
    bounded join over the ≤720-row spikes relation, and the spike
    threshold (1.2× the mean hourly error count) keeps runs short —
    measured max depth 7 across fixture SFs, far under the recursion
    limit. The oracle is the SAME recursive SQL modulo the timestamp
    format function — DuckDB executes its own WITH RECURSIVE over the
    identical relation.

    The ≤720-row spikes relation is materialized (localCheckpoint)
    BEFORE the recursion: Spark's UnionLoop re-evaluates referenced
    relations each iteration, so without this every recursive step
    would re-scan events and re-aggregate — materializing first cut
    the op ~4× locally and, at 100 TB, turns per-step cost from a
    full-table scan into a tiny-relation join."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(_SPIKES_SQL).localCheckpoint().createOrReplaceTempView(
        "spikes"
    )
    return spark.sql(
        _SPIKE_CHAIN_CORE.format(
            fmt_anchor="date_format(anchor_hh, 'yyyy-MM-dd HH:mm:ss')",
            fmt_hh="date_format(hh, 'yyyy-MM-dd HH:mm:ss')",
        )
    )


_LATERAL_CORE = """
    SELECT c_custkey, o_orderkey, {fmt_date} AS order_date,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM customer,
    LATERAL (
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_orderdate DESC, o_orderkey
        LIMIT 2
    ) recent
    WHERE c_nationkey = 7
"""


@register(
    "join_lateral_topn",
    oracle=_LATERAL_CORE.format(
        fmt_date="strftime(o_orderdate, '%Y-%m-%d')"
    ),
    section=SECTION,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL surface for per-row
    top-N lookups (each customer's 2 most recent orders): the inner
    query references the outer row, orders, and limits. Catalyst
    decorrelates this into a window-rank over one equi-shuffle on
    o_custkey — NOT per-row subquery execution — so the plan is
    identical in shape to topk_per_group at any scale; the LATERAL
    form is what users write when the per-key limit logic lives in
    SQL. Deterministic under date ties via the o_orderkey tiebreak;
    one-nation slice keeps fixture output bounded. DuckDB executes
    the same LATERAL text as the oracle."""
    return _sql(
        spark,
        sf_dir,
        _LATERAL_CORE.format(
            fmt_date="date_format(o_orderdate, 'yyyy-MM-dd')"
        ),
    )


# -- round-6 completion of the TPC-H query suite ---------------------
#
# The fixture has no partsupp table (TESTDATA.md), so the five
# remaining TPC-H shapes (Q2/Q9/Q11/Q16/Q20) are adapted: everywhere
# the official query reads ps_supplycost / ps_availqty, the adapted
# form derives the equivalent supply relation from lineitem (observed
# unit cost, shipped value, shipped quantity). The JOIN/subquery
# topology — the part under test — is preserved exactly: Q2's
# correlated scalar-MIN subquery, Q9's multi-join profit rollup, Q11's
# global-total scalar threshold, Q16's NOT-IN anti-join with COUNT
# DISTINCT, Q20's nested IN over a grouped HAVING.

_Q2_CORE = """
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
           p_partkey, p_name,
           CAST(ROUND(unit_cost, 2) AS DOUBLE) AS unit_cost
    FROM part
    JOIN supply   ON p_partkey = partkey
    JOIN supplier ON suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_type = 'PROMO' AND p_size <= 10 AND r_name = 'EUROPE'
      AND unit_cost = (
          SELECT MIN(s2.unit_cost)
          FROM supply s2
          JOIN supplier sp ON s2.suppkey = sp.s_suppkey
          JOIN nation  n2 ON sp.s_nationkey = n2.n_nationkey
          JOIN region  r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE s2.partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
"""


@register("sql_q2_min_cost_supply", oracle=_Q2_CORE, section=SECTION)
def sql_q2_min_cost_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest qualifying supplier per part via a
    CORRELATED SCALAR-MIN SUBQUERY. The supply relation (min observed
    unit cost per part-supplier pair) stands in for partsupp; the
    correlated subquery re-derives the regional minimum per outer
    part row. Catalyst decorrelates it into a left-semi-style join on
    partkey against the pre-aggregated regional minima — ONE extra
    shuffle of the supply relation, not per-row execution — so the
    plan scales as two hash aggregates plus broadcast dimension joins
    (region/nation/supplier are all tiny). Unit cost is an IEEE
    double division, bit-identical in both engines, so the MIN
    equality predicate selects the same rows; output cost is rounded
    only for display. DuckDB runs the identical text."""
    return _sql(spark, sf_dir, _Q2_CORE)


_Q9_CORE = """
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 - CAST(p_retailprice / 10 AS DECIMAL(18,4))
                   * CAST(l_quantity AS DECIMAL(18,4)) AS amount
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@register("sql_q9_product_profit", oracle=_Q9_CORE, section=SECTION)
def sql_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    order year. partsupp's ps_supplycost is proxied as 10% of
    p_retailprice per unit, so profit = revenue - unit_cost*qty with
    the same join topology as the official query (lineitem fanned out
    to supplier, part, orders, nation; part-name LIKE filter). Money
    discipline: both profit terms are DECIMAL(18,4) products (exact,
    order-independent SUM), rounded once at output — the double
    division p_retailprice/10 is bit-identical cross-engine BEFORE
    the decimal cast. The LIKE filter reaches the part scan and the
    three small dimensions broadcast; the only big shuffle is the
    final group-by, keyed on 25 nations x 7 years, which AQE
    coalesces. DuckDB runs the identical text."""
    return _sql(spark, sf_dir, _Q9_CORE)


_Q11_CORE = """
    WITH supplied AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT partkey, CAST(ROUND(part_value, 2) AS DOUBLE) AS stock_value
    FROM supplied
    WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM supplied)
    ORDER BY stock_value DESC, partkey
"""


@register("sql_q11_important_stock", oracle=_Q11_CORE, section=SECTION)
def sql_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value from one nation
    exceeds a FRACTION OF THE GLOBAL TOTAL — the uncorrelated scalar
    subquery over the same CTE the outer query reads. Supplied value
    is revenue from lineitem (partsupp proxy). Spark evaluates the
    scalar subquery as a one-row broadcast against the re-used
    supplied aggregate; with the CTE materialized once per branch the
    whole op is two scans of one nation's lineitem slice (~4% of the
    table after the broadcast nation/supplier prefilter) and a
    25-nation-bounded shuffle. Exact decimal SUM keeps the threshold
    comparison order-independent; rounding is output-only. DuckDB
    runs the identical text."""
    return _sql(spark, sf_dir, _Q11_CORE)


_Q16_CORE = """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("sql_q16_supplier_relationship", oracle=_Q16_CORE, section=SECTION)
def sql_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, EXCLUDING suppliers matched by a NOT-IN subquery (the
    official "customer complaints" comment filter, adapted to the
    fixture's negative-acctbal suppliers — 6 of 100 at sf0.01).
    s_suppkey is non-null by construction so NOT IN is a clean
    null-rejecting anti-join (the null-trap variant is probed
    separately by join_not_in_null_trap); Spark broadcasts the tiny
    excluded set. The brand/type/size filters prune the part
    dimension before its broadcast join, and COUNT(DISTINCT) runs as
    the standard two-phase expand+aggregate keyed on the bounded
    attribute triples. DuckDB runs the identical text."""
    return _sql(spark, sf_dir, _Q16_CORE)


_Q20_CORE = """
    SELECT s_name, n_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 200
    )
    ORDER BY s_name
"""


@register("sql_q20_potential_promo", oracle=_Q20_CORE, section=SECTION)
def sql_q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of a
    part family in one year — the NESTED IN over a grouped HAVING
    subquery (partsupp availqty-vs-half-shipped adapted to a shipped
    quantity threshold). Spark plans the IN as a left-semi hash join
    against the aggregated inner relation; the inner side prunes hard
    (name-prefix LIKE pushed to the part scan, one-year shipdate
    range pushed to lineitem) before its suppkey-bounded group-by, so
    the semi-join's build side is at most one row per supplier.
    SUM(l_quantity) over doubles is safe here: quantities are small
    integers (1..50) summed per supplier-year, exactly representable,
    so the HAVING threshold agrees cross-engine. DuckDB runs the
    identical text."""
    return _sql(spark, sf_dir, _Q20_CORE)


@register(
    "sql_pivot_clause",
    oracle="""
        SELECT day, click, view, purchase, signup, error
        FROM (
            PIVOT (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type
                   FROM events)
            ON event_type IN ('click', 'view', 'purchase', 'signup', 'error')
            USING count(*)
        )
        ORDER BY day
    """,
    section=SECTION,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT CLAUSE surface — the same day × event-type count
    matrix log_pivot_types builds with the DataFrame API, here written
    as SQL in BOTH engines' native pivot dialects (Spark's
    PIVOT (agg FOR col IN …) subquery clause, DuckDB's PIVOT … ON …
    USING statement). The semantic wrinkle under test: Spark emits
    NULL for a (day, type) cell with no rows while DuckDB emits 0, so
    the Spark side COALESCEs every pivoted column — the explicit IN
    list is what makes that (and stable output columns) possible, and
    is also what Catalyst needs to plan this as ONE groupBy(day)
    aggregate with 5 conditional counts: no per-type scans, one
    shuffle keyed on ~31 days, AQE-coalesced. An unlisted type is
    dropped by both dialects by construction."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT day,
               COALESCE(click, 0) AS click,
               COALESCE(view, 0) AS view,
               COALESCE(purchase, 0) AS purchase,
               COALESCE(signup, 0) AS signup,
               COALESCE(error, 0) AS error
        FROM (
            SELECT date_format(ts, 'yyyy-MM-dd') AS day, event_type
            FROM events
        )
        PIVOT (count(*) FOR event_type
               IN ('click' click, 'view' view, 'purchase' purchase,
                   'signup' signup, 'error' error))
        ORDER BY day
        """
    )


@register(
    "sql_unpivot_clause",
    oracle="""
        SELECT o_orderkey, metric, val
        FROM (
            UNPIVOT (SELECT o_orderkey,
                            CAST(o_totalprice AS DOUBLE) AS total_price,
                            CAST(o_orderkey % 7 AS DOUBLE) AS bucket7,
                            CAST(year(o_orderdate) AS DOUBLE) AS order_year
                     FROM orders)
            ON total_price, bucket7, order_year
            INTO NAME metric VALUE val
        )
    """,
    section=SECTION,
)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT CLAUSE surface — wide-to-long over three
    per-order metrics, written in both engines' native dialects
    (Spark's UNPIVOT (val FOR metric IN …), DuckDB's UNPIVOT … ON …
    INTO NAME/VALUE). Complements sql_pivot_clause the way
    log_unpivot_metrics (the DataFrame stack() form) complements
    log_pivot_types; the clause form is what users port from
    warehouse SQL. Catalyst plans this as a single Expand node — a
    3× map-side row multiplication with NO shuffle and NO join, which
    is the property that matters at 100 TB (the naive UNION ALL of 3
    per-metric scans reads the table three times; Expand reads it
    once). Metrics are pre-cast to one DOUBLE type because UNPIVOT
    value columns must share a type in both dialects — the mixed-type
    case is exactly what log_unpivot_metrics' string-cast variant
    covers."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, metric, val
        FROM (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DOUBLE) AS total_price,
                   CAST(o_orderkey % 7 AS DOUBLE) AS bucket7,
                   CAST(year(o_orderdate) AS DOUBLE) AS order_year
            FROM orders
        ) UNPIVOT (val FOR metric IN (total_price, bucket7, order_year))
        """
    )


@register(
    "sql_parameterized",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_value
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-03-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-06-01 00:00:00'
          AND o_totalprice > 1000.0
        GROUP BY o_orderpriority
    """,
    section=SECTION,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL — the prepared-statement surface
    (spark.sql(query, args={...})): the query text carries :start /
    :end / :min_price placeholders and the VALUES arrive separately,
    so user input never concatenates into SQL text (the injection-safe
    API every DB client expects) and one compiled shape serves many
    parameter sets. Catalyst binds parameters BEFORE optimization, so
    the bound literals still fold into partition pruning and parquet
    pushdown exactly like inline constants — parameterization costs
    nothing at plan time.

    The oracle inlines the same values (DuckDB's gate runs a static
    string); equality proves binding changed nothing semantically."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_value
        FROM orders
        WHERE o_orderdate >= :start
          AND o_orderdate <  :end
          AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={
            "start": "1998-03-01 00:00:00",
            "end": "1998-06-01 00:00:00",
            "min_price": 1000.0,
        },
    )


@register(
    "sql_merge_upsert",
    oracle="""
        WITH tgt AS (
            SELECT user_id, dayofmonth(ts) AS day, COUNT(*) AS n_events,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS sum_value
            FROM events WHERE dayofmonth(ts) <= 20
            GROUP BY 1, 2
        ), src AS (
            SELECT user_id, dayofmonth(ts) AS day,
                   COUNT(*) FILTER (WHERE event_type <> 'error') AS n_good,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4)))
                              FILTER (WHERE event_type <> 'error'), 2)
                        AS DOUBLE) AS sum_good
            FROM events WHERE dayofmonth(ts) BETWEEN 18 AND 31
            GROUP BY 1, 2
        )
        SELECT user_id, CAST(day AS INT) AS day, n_events, sum_value
        FROM tgt WHERE day < 18
        UNION ALL
        SELECT user_id, CAST(day AS INT) AS day,
               CAST(n_good AS BIGINT) AS n_events, sum_good AS sum_value
        FROM src WHERE n_good > 0
    """,
    section=SECTION,
)
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO against a keyed, day-partitioned parquet state
    table (VERDICT r7 item #6) — the matched-update / not-matched-
    insert / matched-delete surface every lakehouse user reaches for
    first, expressed engine-level: Spark SQL's MERGE INTO statement
    itself binds only to v2 catalog tables (Delta/Iceberg), so this is
    the exact plan those formats lower to.

    Scenario: a daily per-user rollup (days 1-20) receives a
    re-aggregation of the 18-31 window with error events quarantined —
    the classic late-arriving-data backfill. Keys = (user_id, day):
      - WHEN MATCHED AND the recomputed day still has good events
        -> UPDATE (error-free counts/sums replace the old aggregates),
      - WHEN NOT MATCHED (days 21-31) -> INSERT,
      - WHEN MATCHED AND zero good events remain -> DELETE.

    Merge mechanics, the 100 TB-relevant part:
      1. the target is PARTITIONED BY day, and the merge reads only
         the affected window (day >= 18 — a partition-pruned scan, 14
         of 31 partitions);
      2. source and target are aggregated/joined on the SAME key
         (user_id, day), so the source's aggregation exchange
         satisfies the join's distribution — one shuffle does both;
      3. the write-back uses DYNAMIC partition overwrite: only
         partitions present in the merged output are rewritten, days
         1-17 are untouched files (asserted by mtime in
         tests/test_plans.py). Caveat, documented rather than hidden:
         a partition whose rows are ALL deleted would survive as stale
         files under pure dynamic overwrite — production tables drop
         it via metadata (replaceWhere / DROP PARTITION); the fixtures
         always leave survivors per day.
    The oracle restates the END STATE of the table (untouched days
    UNION the merged window) straight from events."""
    import pyspark.sql.functions as F

    from logdb_spark.sources.scratch import scratch_dir

    target_dir = scratch_dir("logdb_merge_") + "/table"
    _merge_build_target(spark, sf_dir, target_dir)
    _merge_apply(spark, sf_dir, target_dir)
    out = spark.read.parquet(target_dir)
    return out.select(
        "user_id",
        F.col("day").cast("int").alias("day"),
        "n_events",
        "sum_value",
    )


def _merge_build_target(
    spark: SparkSession, sf_dir: str, target_dir: str
) -> None:
    """sql_merge_upsert step 1: the day-partitioned daily rollup as of
    day 20 (the pre-merge state table). Split out so tests can
    snapshot partition files between build and merge."""
    import pyspark.sql.functions as F

    from logdb_spark.functions.numeric import dec4, dround

    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    (
        ev.filter(day <= 20)
        .groupBy("user_id", day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum(dec4("value"))).alias("sum_value"),
        )
        .write.partitionBy("day")
        .parquet(target_dir)
    )


def _merge_apply(spark: SparkSession, sf_dir: str, target_dir: str) -> None:
    """sql_merge_upsert step 2: the MERGE itself — recomputed source
    window, partition-pruned target read, full-outer key join with the
    three WHEN branches, dynamic-partition-overwrite write-back."""
    import pyspark.sql.functions as F

    from logdb_spark.functions.numeric import dec4, dround

    ev = load_table(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    # MERGE source: recomputed window, errors quarantined. n_good = 0
    # is the delete signal (the whole key's data was bad).
    good = F.col("event_type") != "error"
    src = (
        ev.filter(day.between(18, 31))
        .groupBy("user_id", day.alias("day"))
        .agg(
            F.count(F.when(good, 1)).alias("n_good"),
            dround(F.sum(F.when(good, dec4("value")))).alias("sum_good"),
        )
    )

    # Full-outer join on the key over ONLY the affected partitions
    # (static predicate = the source window, so the scan prunes days
    # 1-17), then the three WHEN branches.
    affected = spark.read.parquet(target_dir).filter(F.col("day") >= 18)
    joined = affected.alias("t").join(
        src.alias("s"), ["user_id", "day"], "full_outer"
    )
    upd = F.col("s.n_good").isNotNull()
    merged = (
        joined.filter(F.col("s.n_good").isNull() | (F.col("s.n_good") > 0))
        .select(
            "user_id",
            "day",
            F.when(upd, F.col("s.n_good"))
            .otherwise(F.col("t.n_events"))
            .alias("n_events"),
            F.when(upd, F.col("s.sum_good"))
            .otherwise(F.col("t.sum_value"))
            .alias("sum_value"),
        )
    )

    # Reading target_dir and overwriting it in one job is safe ONLY
    # under dynamic partition overwrite (writes are staged and
    # partitions commit after the read tasks finish); with static
    # overwrite it is the classic read-overwrite-same-path data-loss
    # pattern (ADVICE r8). The mode is therefore pinned as a
    # per-write OPTION — DataFrameWriter options take precedence over
    # the session conf, so no caller override or conf-restore
    # reordering can silently flip this write back to static.
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(target_dir)
    )
