"""§2.C — joins.

Join-strategy posture for 100 TB (SURVEY.md §4): dimension tables
(region/nation/customer/part/supplier) are broadcast — no shuffle of
the fact side; fact-to-fact equi-joins shuffle on the join key and AQE
handles skew; the non-equi family (theta/range, interval self-pair,
as-of) is expressed so the equi part of the condition drives a hash
join and the range part stays a post-join filter — never a cartesian
product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround, ratio
from logdb_spark.functions.temporal import ts_str
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.C joins"


@register(
    "join_inner_equi",
    oracle="""
        SELECT o_orderkey, c_name, o_totalprice, o_orderstatus
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 300000
    """,
    section=SECTION,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer. At fixture scale AQE converts this to a
    broadcast join of customer; at 100 TB the same plan holds (customer
    is the small side)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice", "o_orderstatus")
    )


@register(
    "join_multiway_star",
    oracle="""
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    section=SECTION,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star: fact joins up the dimension chain. Catalyst + AQE
    broadcast every dimension side; the only shuffle is the final
    group-by on (r_name, n_name)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dround(
                F.sum(dec4("l_extendedprice") * (F.lit(1) - dec4("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "join_broadcast",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    section=SECTION,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint: part ships to every executor, lineitem
    never shuffles for the join (only the tiny group-by shuffles)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum(dec4("l_extendedprice"))).alias("total_price"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
    section=SECTION,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preserves order-less customers with NULL order columns; the
    status predicate lives in the join condition (not a post-filter) —
    classic outer-join semantics trap, exercised deliberately."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
        WITH hi_cust AS (SELECT * FROM customer WHERE c_acctbal > 7000),
             hi_ord  AS (SELECT * FROM orders WHERE o_totalprice > 400000)
        SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
        FROM hi_cust FULL OUTER JOIN hi_ord ON c_custkey = o_custkey
    """,
    section=SECTION,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer on filtered sides: unmatched rows survive from both."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@register(
    "join_left_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    section=SECTION,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: emits each matching customer once, never duplicates —
    and never materializes the orders columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    section=SECTION,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
        SELECT r_name, p.o_orderpriority
        FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
    section=SECTION,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny deliberate cross product (5 regions × 5 priorities)."""
    r = load_table(spark, sf_dir, "region")
    pri = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(pri).select("r_name", "o_orderpriority")


@register(
    "join_theta_range",
    oracle="""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
               COUNT(*) AS n_shipped_90d,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS price_shipped_90d
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """,
    section=SECTION,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (l_orderkey) drives the hash join; the
    90-day range rides along as a join-condition filter. At 100 TB this
    stays a shuffle-hash/sort-merge join on the key — never a
    broadcast-nested-loop, because the equi conjunct exists."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    )
    return (
        li.join(o, cond)
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_shipped_90d"),
            dround(F.sum(dec4("l_extendedprice"))).alias("price_shipped_90d"),
        )
    )


@register(
    "join_interval_selfpair",
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
def join_interval_selfpair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join: event pairs from the same user within 5 minutes.
    Equi conjunct (user_id) drives the join; at scale, salting or an
    additional coarse time-bucket equi key bounds the per-key fan-out."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    a, b = ev.alias("a"), ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
    )
    return a.join(b, cond).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        (F.col("b.ts").cast("long") - F.col("a.ts").cast("long")).alias("gap_s"),
    )


@register(
    "join_asof_latest_event",
    oracle="""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
               o_orderkey AS last_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
        FROM (
            SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) WHERE rn = 1
    """,
    section=SECTION,
)
def join_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order as of
    the event time (customer key doubles as user id in the fixtures).

    Emulated as equi-join on the key + row_number over the time order —
    the standard Spark formulation. At 100 TB: pre-bucket both sides on
    the key and time-bucket so the window sort is partition-local.
    Ties broken by o_orderkey DESC for cross-engine determinism.
    """
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        o, (o.o_custkey == ev.user_id) & (o.o_orderdate <= ev.ts)
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("event_time"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
               o_orderkey AS matched_orderkey,
               date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE))
                   AS days_since
        FROM (
            SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id
             AND o.o_orderdate <= e.ts
             AND o.o_orderdate >= e.ts - INTERVAL 90 DAY
        ) WHERE rn = 1
    """,
    section=SECTION,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance: each event pairs with the
    user's most recent order, but only if it happened within the last
    90 days — older state is stale and must NOT match (the semantics
    point-in-time feature lookups need; an unbounded as-of silently
    serves years-old features). LEFT preservation keeps tolerance
    misses as explicit nulls instead of dropping the event.

    Same scale shape as join_asof_latest_event (equi-join on the key
    + partition-local rank), but the tolerance bound ALSO prunes the
    join fan-in: with time-bucketed layout only ~90 days of the right
    side joins each event instead of all history — at 100 TB the
    tolerance is what makes the as-of tractable, not just correct."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        o,
        (o.o_custkey == ev.user_id)
        & (o.o_orderdate <= ev.ts)
        & (o.o_orderdate >= ev.ts - F.expr("INTERVAL 90 DAY")),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("event_time"),
            F.col("o_orderkey").alias("matched_orderkey"),
            F.datediff(F.to_date("ts"), F.to_date("o_orderdate")).alias(
                "days_since"
            ),
        )
    )


@register(
    "join_null_safe",
    oracle="""
        WITH keyed AS (
            SELECT event_id,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE user_id % 16 END AS k,
                   value
            FROM events
        )
        SELECT a.k AS k,
               COUNT(*) AS n_pairs,
               CAST(MIN(a.event_id) AS BIGINT) AS first_a
        FROM keyed a JOIN keyed b
          ON a.k IS NOT DISTINCT FROM b.k
         AND a.event_id < b.event_id
         AND b.event_id - a.event_id <= 3
        GROUP BY a.k
    """,
    section=SECTION,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the join a
    pipeline needs when NULL is a real category ('unattributed') and
    regular equi-join semantics would make those rows vanish.
    Spark plans ``<=>`` as a hash join on (coalesce(k), isnull(k)),
    not a nested loop.

    Hot-key discipline: the NULL category is BY DESIGN a huge group
    (every error event), and a bare key join would pair it
    quadratically BEFORE the id-distance residual filters — measured
    42 s at sf0.1 for exactly that mistake. The distance-≤3 bound is
    therefore folded INTO the join key as block banding: event-id
    blocks of 4, probe side explodes to (block, block+1), join on
    (k, block). Any ≤3-distance pair spans at most adjacent blocks,
    so matching is exact while per-key groups shrink from
    |category|² to ~block² — the standard banded interval join, same
    at any scale (42 s → 0.7 s)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("user_id") % 16)
        .alias("k"),
        F.floor(F.col("event_id") / 4).alias("blk"),
    )
    a = ev.alias("a").withColumn(
        "jblk", F.explode(F.array(F.col("blk"), F.col("blk") + 1))
    )
    b = ev.alias("b")
    joined = a.join(
        b,
        F.col("a.k").eqNullSafe(F.col("b.k"))
        & (F.col("jblk") == F.col("b.blk"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.event_id") - F.col("a.event_id") <= 3),
    )
    return joined.groupBy(F.col("a.k").alias("k")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("a.event_id").cast("bigint").alias("first_a"),
    )


_BLOOM_BITS = 65536  # 2^16-bit filter -> 1024 broadcastable words


@register(
    "join_bloom_prefilter",
    # The bloom is a PREFILTER: false positives are removed by the
    # exact semi join, so the result set equals the plain semi join
    # the oracle computes — equality IS the no-false-negative proof.
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority
    """,
    section=SECTION,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit bloom-filter semi join — the runtime-filter pattern
    spelled out as an operator (Spark's adaptive runtime bloom does
    this invisibly; a log engine exposes it because pre-shuffle
    pruning is THE lever when the fact side is 100 TB and the dim
    filter is selective). Three stages:

      1. Build: dimension keys hash into a 2^16-bit bloom stored as
         1024 bit_or-merged 64-bit words — a mergeable, fixed-width
         aggregate (same posture as agg_bitmap_distinct), KB-sized
         regardless of dim cardinality.
      2. Prefilter: the fact joins the BROADCAST word table on word
         index and keeps rows whose bit is set — map-side, before
         any fact shuffle; only survivors (true matches + ~n/2^16
         false positives) reach the join.
      3. Verify: an exact broadcast semi join removes false
         positives, so results are exact — the oracle's plain
         semi join must match bit-for-bit.

    At scale stage 2 is where the win lives: the fact shuffle carries
    the bloom's survivors, not the whole table."""
    from logdb_spark.functions.numeric import dec4, dround

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    idx_d = F.pmod(F.xxhash64("c_custkey"), F.lit(_BLOOM_BITS))
    words = (
        dim.select(
            (idx_d / 64).cast("bigint").alias("widx"),
            (idx_d % 64).cast("int").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("word"))
    )
    idx_f = F.pmod(F.xxhash64("o_custkey"), F.lit(_BLOOM_BITS))
    fact = orders.select(
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
        (idx_f / 64).cast("bigint").alias("widx"),
        (idx_f % 64).cast("int").alias("bit"),
    )
    survivors = (
        fact.join(F.broadcast(words), "widx")
        .filter(
            F.expr("(word & shiftleft(1L, bit)) != 0")
        )
        .drop("widx", "bit")
    )
    exact = survivors.join(
        F.broadcast(dim),
        survivors.o_custkey == dim.c_custkey,
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(F.sum(dec4("o_totalprice"))).alias("total_price"),
    )


@register(
    "join_asof_forward",
    oracle="""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS error_time,
               next_purchase_id, next_purchase_time,
               ROUND(next_value, 6) AS next_value
        FROM (
            SELECT e.event_id, e.user_id, e.ts,
                   p.event_id AS next_purchase_id,
                   strftime(p.ts, '%Y-%m-%d %H:%M:%S')
                       AS next_purchase_time,
                   p.value AS next_value,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY p.ts, p.event_id) AS rn
            FROM events e
            JOIN events p
              ON p.user_id = e.user_id AND p.ts > e.ts
             AND p.event_type = 'purchase'
            WHERE e.event_type = 'error'
        ) WHERE rn = 1
    """,
    section=SECTION,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of join_asof_latest_event: for
    each error event, the same user's NEXT purchase strictly after it
    (time-to-next-action: does the user still buy after hitting an
    error?). Same emulation as the backward form — equi-join on the
    user key with the time bound as a join-condition filter, then a
    per-error rank taking the earliest future match; (ts, event_id)
    tiebreak for determinism. Errors with no later purchase drop
    (inner semantics), exactly as the oracle joins. Scale posture
    identical to the backward form: pre-bucket both sides on
    (key, time-bucket) and the rank sort is partition-local."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = err.join(
        pur, (pur.p_user == err.user_id) & (pur.p_ts > err.ts)
    )
    w = Window.partitionBy("event_id").orderBy("p_ts", "p_id")
    from logdb_spark.functions.numeric import ratio

    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("error_time"),
            F.col("p_id").alias("next_purchase_id"),
            ts_str("p_ts").alias("next_purchase_time"),
            ratio("p_value").alias("next_value"),
        )
    )


@register(
    "join_reconciliation_audit",
    oracle="""
        WITH l AS (SELECT DISTINCT user_id FROM events),
             r AS (SELECT DISTINCT c_custkey FROM customer)
        SELECT
            CAST(COUNT(*) FILTER (WHERE user_id IS NOT NULL
                                    AND c_custkey IS NOT NULL) AS BIGINT)
                AS n_matched,
            CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
                AS n_left_only,
            CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
                AS n_right_only,
            ROUND(COUNT(*) FILTER (WHERE user_id IS NOT NULL
                                     AND c_custkey IS NOT NULL)
                  * 1.0 / COUNT(*), 6) AS match_rate
        FROM l FULL OUTER JOIN r ON user_id = c_custkey
    """,
    section=SECTION,
)
def join_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation audit — the data-engineering health check run
    after every sync: how many keys match between two systems, how
    many exist only on each side, and the match rate. One full-outer
    join over DEDUPLICATED key sets (distinct first, so the join is
    key-to-key and its output is bounded by total distinct keys, not
    row products), then a single conditional aggregate over the null
    pattern. At 100 TB both distincts are partial-agg shuffles and
    the audit output is exactly one row."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    l = ev.select("user_id").distinct()
    r = cust.select("c_custkey").distinct()
    j = l.join(r, l.user_id == r.c_custkey, "full_outer")
    matched = F.count(
        F.when(F.col("user_id").isNotNull() & F.col("c_custkey").isNotNull(), 1)
    )
    return j.agg(
        matched.alias("n_matched"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_left_only"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_right_only"),
        ratio(matched * 1.0 / F.count(F.lit(1))).alias("match_rate"),
    )


@register(
    "join_scd2_pointintime",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   date_trunc('second', ts) AS ts
            FROM events WHERE event_type <> 'purchase'
        ), marked AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN lag(event_type) OVER w IS NULL
                        OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS is_change
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), dim AS (
            SELECT user_id, event_type AS status, ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to
            FROM marked WHERE is_change = 1
        ), facts AS (
            SELECT user_id, date_trunc('second', ts) AS ts,
                   CAST(value AS DECIMAL(18,4)) AS v
            FROM events WHERE event_type = 'purchase'
        )
        SELECT d.status,
               COUNT(*) AS n_purchases,
               CAST(ROUND(SUM(f.v), 2) AS DOUBLE) AS purchase_value
        FROM facts f
        JOIN dim d
          ON d.user_id = f.user_id
         AND f.ts >= d.valid_from
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        GROUP BY d.status
    """,
    section=SECTION,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2 dimension built from the
    stream itself — the warehouse pattern for "what was the user
    DOING when the purchase happened": consecutive same-type
    NON-purchase events compress into validity intervals
    [valid_from, valid_to) (change detection via user-partitioned
    lag, interval close via lead — SCD2 history compression;
    purchases are the facts, so they are excluded from the dimension
    or every fact would trivially cover itself), and each purchase
    fact joins the one interval covering its timestamp. The join is EQUI on user_id with
    the range as a post-join filter, so Catalyst plans a hash/sort-
    merge join on the user key — never a nested loop; intervals
    partition each user's timeline, so exactly one row matches per
    fact. At 100 TB both sides shuffle once on user_id and the
    per-user interval list is session-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.date_trunc("second", "ts").alias("ts"),
        "value",
    )
    dim_src = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = dim_src.withColumn(
        "is_change",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        ).cast("int"),
    )
    dim = (
        marked.filter(F.col("is_change") == 1)
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", dec4("value").alias("v")
    )
    joined = facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return joined.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dround(F.sum("v")).alias("purchase_value"),
    )


@register(
    "join_asof_nearest",
    oracle="""
        WITH p AS (
            SELECT event_id AS p_id, user_id,
                   epoch(date_trunc('second', ts)) AS p_s
            FROM events WHERE event_type = 'purchase'
        ), c AS (
            SELECT event_id AS c_id, user_id,
                   epoch(date_trunc('second', ts)) AS c_s
            FROM events WHERE event_type = 'click'
        ), pairs AS (
            SELECT p.p_id, p.user_id, c.c_id,
                   abs(c.c_s - p.p_s) AS gap_s,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.p_id
                       ORDER BY abs(c.c_s - p.p_s), c.c_s, c.c_id
                   ) AS rn
            FROM p JOIN c ON c.user_id = p.user_id
        )
        SELECT p_id AS purchase_id, user_id, c_id AS nearest_click_id,
               CAST(gap_s AS BIGINT) AS gap_s
        FROM pairs WHERE rn = 1
    """,
    section=SECTION,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — either direction: each purchase pairs with
    the same user's closest click in absolute time (the sensor-
    alignment variant of as-of; backward/forward joins exist as
    siblings, this one answers "what click is this purchase most
    contemporaneous with"). Deterministic tie-break: smaller gap,
    then earlier click, then click id. The join is EQUI on user_id —
    hash join, candidate set bounded by per-user activity — and the
    pick is a purchase-partitioned row_number over those bounded
    candidates. At 100 TB: one shuffle on user_id, per-purchase
    candidate lists session-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_trunc("second", "ts").cast("long").alias("s"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("s").alias("p_s")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("s").alias("c_s"),
    )
    pairs = p.join(c, p.user_id == c.c_user).withColumn(
        "gap_s", F.abs(F.col("c_s") - F.col("p_s"))
    )
    w = Window.partitionBy("p_id").orderBy("gap_s", "c_s", "c_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_id").alias("purchase_id"),
            "user_id",
            F.col("c_id").alias("nearest_click_id"),
            F.col("gap_s").cast("bigint").alias("gap_s"),
        )
    )


@register(
    "join_asof_interpolate",
    oracle="""
        WITH base AS (
            SELECT event_id, user_id, event_type,
                   CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
                   value
            FROM events
        ), p AS (
            SELECT user_id, sec, arg_max(value, event_id) AS pval
            FROM base WHERE event_type = 'purchase' GROUP BY 1, 2
        ), un AS (
            SELECT user_id, sec, event_id, CAST(NULL AS DOUBLE) AS pval,
                   TRUE AS is_err
            FROM base WHERE event_type = 'error'
            UNION ALL
            SELECT user_id, sec, CAST(NULL AS BIGINT), pval, FALSE FROM p
        ), br AS (
            SELECT user_id, sec, event_id, is_err,
                   last_value(pval IGNORE NULLS) OVER wp AS prev_val,
                   last_value(CASE WHEN pval IS NOT NULL THEN sec END
                              IGNORE NULLS) OVER wp AS prev_sec,
                   first_value(pval IGNORE NULLS) OVER wn AS next_val,
                   first_value(CASE WHEN pval IS NOT NULL THEN sec END
                               IGNORE NULLS) OVER wn AS next_sec
            FROM un
            WINDOW wp AS (PARTITION BY user_id ORDER BY sec
                          RANGE BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY sec
                          RANGE BETWEEN 1 FOLLOWING
                                    AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id, sec AS event_sec,
               sec - prev_sec AS prev_gap_s,
               next_sec - sec AS next_gap_s,
               ROUND(prev_val + (next_val - prev_val)
                     * (sec - prev_sec) * 1.0 / (next_sec - prev_sec), 6)
                   AS interp_value
        FROM br
        WHERE is_err AND prev_sec IS NOT NULL AND next_sec IS NOT NULL
    """,
    section=SECTION,
)
def join_asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with LINEAR INTERPOLATION: each error event gets a
    value interpolated between the user's bracketing purchase events —
    the sensor-alignment primitive (backward asof gives a stale
    left value, forward gives a future one; interpolation weights both
    by time distance, the standard irregular-time-series resample).

    Shape: ONE union of the probe and reference series, one shuffle
    on user_id, and two RANGE-framed window passes (strictly-before /
    strictly-after the probe's second) — not two separate as-of joins
    re-shuffling the same data. Determinism: the reference series is
    pre-aggregated to one value per (user, second) via max_by event_id
    — RANGE frames tie ALL rows of an equal second, so without that
    the 'last non-null in frame' would be engine-order dependent; with
    it, ignore-nulls skips the probe rows and lands on the unique
    reference row. The strict 1-second frame bounds also make
    next_sec - prev_sec >= 2, so the interpolation denominator can
    never be zero."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("sec"),
        "value",
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "sec")
        .agg(F.max_by("value", "event_id").alias("pval"))
    )
    errs = base.filter(F.col("event_type") == "error").select(
        "user_id",
        "sec",
        "event_id",
        F.lit(None).cast("double").alias("pval"),
        F.lit(True).alias("is_err"),
    )
    un = errs.unionByName(
        p.select(
            "user_id",
            "sec",
            F.lit(None).cast("bigint").alias("event_id"),
            "pval",
            F.lit(False).alias("is_err"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    psec = F.when(F.col("pval").isNotNull(), F.col("sec"))
    br = un.select(
        "user_id",
        "sec",
        "event_id",
        "is_err",
        F.last("pval", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(psec, ignorenulls=True).over(wp).alias("prev_sec"),
        F.first("pval", ignorenulls=True).over(wn).alias("next_val"),
        F.first(psec, ignorenulls=True).over(wn).alias("next_sec"),
    )
    frac = (
        (F.col("sec") - F.col("prev_sec"))
        * F.lit(1.0)
        / (F.col("next_sec") - F.col("prev_sec"))
    )
    return (
        br.filter(
            F.col("is_err")
            & F.col("prev_sec").isNotNull()
            & F.col("next_sec").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            F.col("sec").alias("event_sec"),
            (F.col("sec") - F.col("prev_sec")).alias("prev_gap_s"),
            (F.col("next_sec") - F.col("sec")).alias("next_gap_s"),
            ratio(
                F.col("prev_val")
                + (F.col("next_val") - F.col("prev_val")) * frac
            ).alias("interp_value"),
        )
    )


@register(
    "join_not_in_null_trap",
    oracle="""
        WITH clickers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ), purchasers AS (
            SELECT NULLIF(user_id,
                          (SELECT MIN(user_id) FROM events
                           WHERE event_type = 'purchase')) AS user_id
            FROM events WHERE event_type = 'purchase'
        )
        SELECT
            (SELECT COUNT(*) FROM clickers
             WHERE user_id NOT IN (SELECT user_id FROM purchasers))
                AS n_not_in,
            (SELECT COUNT(*) FROM clickers c
             WHERE NOT EXISTS (SELECT 1 FROM purchasers p
                               WHERE p.user_id = c.user_id))
                AS n_not_exists,
            TRUE AS not_in_collapsed
    """,
    section=SECTION,
)
def join_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS with a NULL in the subquery — the
    three-valued-logic trap every SQL engine must honor, not fix:
    ``x NOT IN (set containing NULL)`` is never TRUE (x <> NULL is
    UNKNOWN), so the NOT IN count collapses to 0, while NOT EXISTS —
    the query the user almost always meant — returns the real
    "clicked but never purchased" count. One purchasing user's id is
    NULLIFed to plant the trap deterministically. Both engines must
    agree on both counts, proving our anti-join semantics are
    null-aware, not naively rewritten.

    Physical note: Spark plans the NOT IN as a null-aware anti join
    (the NAAJ-specialized broadcast join), NOT a nested loop — the
    reason this belongs in the join inventory. The NOT EXISTS leg is
    a plain left_anti hash join on the equi key."""
    ev = load_table(spark, sf_dir, "events")
    for name, df in [("ev_trap", ev)]:
        df.createOrReplaceTempView(name)
    return spark.sql(
        """
        WITH clickers AS (
            SELECT DISTINCT user_id FROM ev_trap WHERE event_type = 'click'
        ), purchasers AS (
            SELECT NULLIF(user_id,
                          (SELECT MIN(user_id) FROM ev_trap
                           WHERE event_type = 'purchase')) AS user_id
            FROM ev_trap WHERE event_type = 'purchase'
        )
        SELECT
            (SELECT COUNT(*) FROM clickers
             WHERE user_id NOT IN (SELECT user_id FROM purchasers))
                AS n_not_in,
            (SELECT COUNT(*) FROM clickers c
             WHERE NOT EXISTS (SELECT 1 FROM purchasers p
                               WHERE p.user_id = c.user_id))
                AS n_not_exists,
            (SELECT COUNT(*) FROM clickers
             WHERE user_id NOT IN (SELECT user_id FROM purchasers)) = 0
                AS not_in_collapsed
        """
    )


@register(
    "join_grid_spatial",
    oracle="""
        WITH pa AS (
            SELECT event_id,
                   (event_id % 1000) / 10.0 AS px,
                   ((event_id * 7919) % 1000) / 10.0 AS py
            FROM events WHERE event_type = 'error'
        ), pb AS (
            SELECT event_id,
                   (event_id % 1000) / 10.0 AS px,
                   ((event_id * 7919) % 1000) / 10.0 AS py
            FROM events WHERE event_type = 'purchase'
        ), ga AS (
            SELECT event_id, px, py,
                   CAST(floor(px) AS BIGINT) AS cx,
                   CAST(floor(py) AS BIGINT) AS cy
            FROM pa
        ), gb AS (
            SELECT pb.event_id, pb.px, pb.py,
                   CAST(floor(pb.px) AS BIGINT) + dx.r AS cx,
                   CAST(floor(pb.py) AS BIGINT) + dy.r AS cy
            FROM pb, range(-1, 2) dx(r), range(-1, 2) dy(r)
        ), gpairs AS (
            SELECT ga.cx,
                   (ga.px - gb.px) * (ga.px - gb.px)
                   + (ga.py - gb.py) * (ga.py - gb.py) AS d2
            FROM ga JOIN gb ON ga.cx = gb.cx AND ga.cy = gb.cy
            WHERE (ga.px - gb.px) * (ga.px - gb.px)
                  + (ga.py - gb.py) * (ga.py - gb.py) <= 1.0
        )
        SELECT CAST(floor(cx / 10.0) AS INT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(MIN(d2), 6) AS min_d2
        FROM gpairs GROUP BY 1
    """,
    section=SECTION,
)
def join_grid_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial radius join — the 2D sibling of
    join_range_bucketed: find all (error, purchase) point pairs within
    Euclidean distance 1.0 on a synthetic 100x100 plane (coordinates
    derived deterministically from event ids — integer-exact doubles,
    identical in both engines). The scale pattern is GRID BLOCKING:
    each probe point replicates into its 3x3 neighbor cells (radius <=
    cell size, so every qualifying pair shares a cell key), the join
    is a plain EQUI-join on (cell_x, cell_y), and the exact distance
    predicate filters inside the block — a theta-join that would be an
    n² nested loop becomes a hash join whose per-key fan-out is the
    local point density. 9x replication of the smaller side buys
    equi-join locality; at 100 TB the same shape holds with
    density-chosen cell size. Result: pairs per 10-cell x-band with
    the min squared distance (MIN over bit-identical doubles —
    order-independent, no rounding discipline needed before the
    boundary ROUND)."""
    ev = load_table(spark, sf_dir, "events")

    def points(kind: str):
        return ev.filter(F.col("event_type") == kind).select(
            ((F.col("event_id") % 1000) / 10.0).alias("px"),
            (((F.col("event_id") * 7919) % 1000) / 10.0).alias("py"),
        )

    a = points("error").select(
        "px", "py",
        F.floor("px").cast("bigint").alias("cx"),
        F.floor("py").cast("bigint").alias("cy"),
    )
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    b = (
        points("purchase")
        .select(
            F.col("px").alias("bx"), F.col("py").alias("by"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "bx", "by",
            (F.floor("bx").cast("bigint") + F.col("o.dx")).alias("cx"),
            (F.floor("by").cast("bigint") + F.col("o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("px") - F.col("bx")) * (F.col("px") - F.col("bx")) + (
        F.col("py") - F.col("by")
    ) * (F.col("py") - F.col("by"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= 1.0)
    )
    return pairs.groupBy(
        F.floor(F.col("cx") / 10.0).cast("int").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        ratio(F.min("d2")).alias("min_d2"),
    )
