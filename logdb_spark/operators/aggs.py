"""§2.D — aggregations.

All hash aggregations: Catalyst plans partial (map-side) + final
(post-shuffle) HashAggregate, so the shuffle carries pre-combined
groups — at 100 TB the shuffle volume is #groups × #partitions, not
#rows. Float aggregates go through money()/ratio() (functions/numeric)
with the identical ROUND in the oracle (SURVEY.md §0.2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import dec4, dround, money, ratio
from logdb_spark.functions.ranking import global_row_number
from logdb_spark.registry import register, track_persist
from logdb_spark.sources.load import load_table
from logdb_spark.sources.scratch import scratch_dir

SECTION = "2.D aggregations"


@register(
    "agg_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
                   AS sum_disc_price,
               ROUND(AVG(l_quantity), 6)                          AS avg_qty,
               ROUND(AVG(l_discount), 6)                          AS avg_disc,
               COUNT(*)                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    section=SECTION,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary — the flagship query.

    scan (predicate+projection pushed) -> partial hash agg -> shuffle on
    (returnflag, linestatus) [6 groups] -> final agg -> sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            dround(F.sum(dec4("l_extendedprice"))).alias("sum_base_price"),
            dround(
                F.sum(dec4("l_extendedprice") * (F.lit(1) - dec4("l_discount")))
            ).alias("sum_disc_price"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            ratio(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: planned as two-phase expand+agg by Catalyst."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "agg_approx_count_distinct",
    # Tolerance reformulation (VERDICT r4 #6, SURVEY §0.2.3): the raw
    # sketch estimate can't hash-match across engines, but the EXACT
    # count can, and the sketch's error bound is itself a checkable
    # claim — Spark emits |approx−exact| ≤ 5%·exact (> 4σ for
    # rsd=0.01, and deterministic on a fixed fixture), the oracle
    # emits the exact count and literal TRUE. A drifting sketch now
    # breaks the hash instead of hiding behind rows-only.
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_exact,
               TRUE AS within_5pct
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch distinct, hash-checked via tolerance reformulation
    (the sketch estimate is pinned within 5% of the exact count, which
    is itself hash-matched). At 100 TB the approx aggregate is THE
    distinct-users operator — single pass, fixed memory, no expand;
    the exact twin here exists to give the sketch a checkable bound at
    fixture scale."""
    # Two r13 changes (guide §2.5/§5), same result by construction:
    # - repartition the one-row-group fixture scan so the sketch
    #   build is not a single task (partial agg is per partition);
    # - split the exact and approx legs into separate aggregations.
    #   Mixed into ONE agg, Catalyst's multi-distinct planning keys
    #   the partial phase by (event_type, user_id) — allocating a
    #   16 KiB rsd=0.01 HLL buffer PER DISTINCT PAIR (~hundreds of MB
    #   of sketch buffers at sf0.1; profiled 2.5 s + GC). Split, the
    #   HLL leg buffers one sketch per event_type per partition and
    #   the exact leg is a plain two-phase distinct. The broadcast
    #   join on the handful of event_type rows is free.
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("a")
    )
    g = exact.join(F.broadcast(approx), "event_type")
    return g.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("a") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("within_5pct"),
    )


@register(
    "agg_filtered",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS n_errors,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4)))
                          FILTER (WHERE event_type = 'purchase'), 2) AS DOUBLE)
                   AS purchase_value
        FROM events GROUP BY user_id
    """,
    section=SECTION,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — one pass, no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    is_pur = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count(F.when(is_err, 1)).alias("n_errors"),
        F.count(F.when(is_pur, 1)).alias("n_purchases"),
        dround(F.sum(F.when(is_pur, dec4("value")))).alias("purchase_value"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    section=SECTION,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotals via GROUPING SETS (Catalyst Expand + single agg)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_acctbal,
               COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    section=SECTION,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region -> nation (dimension joins broadcast:
    nation/region are tiny)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        dround(F.sum(dec4("c_acctbal"))).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    section=SECTION,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(money(F.sum("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_stats",
    oracle="""
        SELECT event_type,
               ROUND(STDDEV_SAMP(value), 6)      AS sd_value,
               ROUND(VAR_SAMP(value), 6)         AS var_value,
               ROUND(CORR(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6)
                   AS corr_value_k,
               ROUND(COVAR_SAMP(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6)
                   AS covar_value_k
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass streaming moments)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    return ev.groupBy("event_type").agg(
        ratio(F.stddev_samp("value")).alias("sd_value"),
        ratio(F.var_samp("value")).alias("var_value"),
        ratio(F.corr("value", "k")).alias("corr_value_k"),
        ratio(F.covar_samp("value", "k")).alias("covar_value_k"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5),  6) AS p50,
               ROUND(quantile_cont(value, 0.9),  6) AS p90,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). Exact percentile sorts per group — fine for
    bounded groups; unbounded cardinality at 100 TB uses the approx
    variant below."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        ratio(F.expr("percentile(value, 0.5)")).alias("p50"),
        ratio(F.expr("percentile(value, 0.9)")).alias("p90"),
        ratio(F.expr("percentile(value, 0.99)")).alias("p99"),
    )


@register(
    "agg_percentile_approx",
    # Tolerance reformulation (VERDICT r4 #6): GK sketches guarantee
    # RANK error ≤ 1/accuracy, so the checkable claim is "the approx
    # p95 lies between the exact 0.945 and 0.955 quantiles". Spark
    # emits that boolean next to the exact (hash-matched) p95; the
    # oracle emits quantile_cont + literal TRUE.
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
               TRUE AS within_rank_tol
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch percentile, hash-checked via rank-tolerance
    reformulation (approx pinned inside the exact [p94.5, p95.5]
    bracket, exact p95 hash-matched). The 100 TB latency-quantile
    workhorse is the sketch: mergeable, no per-group sort — the exact
    quantiles here are group-bounded and exist to bound the sketch at
    fixture scale."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.95, 10000).alias("a"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.945)").alias("lo"),
        F.expr("percentile(value, 0.955)").alias("hi"),
    )
    return g.select(
        "event_type",
        ratio(F.col("p95")).alias("p95_exact"),
        ((F.col("a") >= F.col("lo")) & (F.col("a") <= F.col("hi"))).alias(
            "within_rank_tol"
        ),
    )


@register(
    "agg_collect_sorted",
    oracle="""
        SELECT user_id,
               array_to_string(list(DISTINCT event_type ORDER BY event_type), '|')
                   AS types_seen
        FROM events GROUP BY user_id
    """,
    section=SECTION,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregate, canonicalized per SURVEY §7.3.5: the sorted
    set is emitted as a '|'-joined STRING, not an array column — checker
    harnesses (including the driver's) hash scalar cells, and an
    array-typed cell is unhashable there (r1's one red row)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), "|").alias(
            "types_seen"
        )
    )


@register(
    "agg_min_max_by",
    oracle="""
        SELECT user_id, event_type AS top_type,
               ROUND(value, 2) AS top_value
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY value DESC, event_id DESC) = 1
    """,
    section=SECTION,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max via max_by with a (value, event_id) struct key — the
    struct tiebreak makes it deterministic under value ties; single
    hash-agg pass, no window shuffle-sort."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("top_type"),
        money(F.max("value")).alias("top_value"),
    )


@register(
    "agg_mode",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id, event_type AS mode_type, cnt AS mode_count
        FROM c
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY cnt DESC, event_type) = 1
    """,
    section=SECTION,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a deterministic tie-break (smallest value
    among the most frequent). Two hash-agg passes — groupBy(user,type)
    partial-combines map-side, then min_by over a (-cnt, type) struct
    key picks the argmax without a window shuffle-sort. At 100 TB both
    passes stay in HashAggregate; state per group is one struct, not a
    value list (vs Spark's builtin `mode`, whose ties are
    nondeterministic — why this spells it out)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    key = F.struct((-F.col("cnt")).alias("neg"), F.col("event_type"))
    return counts.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("mode_type"),
        F.max("cnt").alias("mode_count"),
    )


@register(
    "agg_percentile_disc",
    oracle="""
        WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                   COUNT(*)    OVER (PARTITION BY event_type)                 AS n
            FROM events
        )
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
                   AS p50_disc,
               MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END)
                   AS p90_disc
        FROM r GROUP BY event_type
    """,
    section=SECTION,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentile: the element at rank ceil(p*n) — an actual
    data value, so it hash-compares bit-identical across engines with
    no rounding (unlike the interpolated quantile_cont variant above).
    Rank-k selection via per-group row_number; the per-group sort is
    inherent to any exact percentile (DuckDB sorts internally too).
    Groups here are the 5 event types — at 100 TB unbounded-cardinality
    quantiles use agg_percentile_approx (mergeable sketch, no sort)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("value"))).alias("p50_disc"),
        F.max(F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("value"))).alias("p90_disc"),
    )


@register(
    "agg_hll_sketch_merge",
    # Cross-engine certificate (VERDICT r8 #4): the sketch BYTES are
    # engine-private, so the oracle pins everything else — the exact
    # distinct count the estimate must track, plus TRUE literals for
    # the two in-plan assertions. If the merged estimate ever drifts
    # outside the HLL++ error bound, or merged and direct sketches
    # stop agreeing within sketch error, Spark emits false and the
    # value-hash breaks — "trust me" became a checkable row.
    oracle="""
        SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_distinct_users,
               TRUE AS merged_within_bound,
               TRUE AS merge_consistent
        FROM events
    """,
    section=SECTION,
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 3.5+
    hll_sketch_agg / hll_union_agg): per-day distinct-user sketches
    merged into a global estimate — THE incremental distinct-counting
    pattern at 100 TB: build one sketch per partition/day at ingest,
    union them at query time, never rescan history.

    The estimate itself is engine-private, so the row carries a
    certificate instead: exact_distinct_users (hash-pinned vs DuckDB),
    merged_within_bound = |merged/exact − 1| ≤ 0.05 (3σ of HLL++ at
    the default lgConfigK=12: 3·1.04/√4096 ≈ 4.9%), and
    merge_consistent = |merged/direct − 1| ≤ 0.05. Strict equality of
    merged and direct holds only in the coupon-exact regime (it flips
    false at sf0.1's 1500 distinct users, where the union forces HLL
    array mode while the direct sketch is still coupon-exact) — the
    regime-independent invariant is agreement within sketch error.
    The exact count exists only for the certificate — the production
    pattern never computes it; tests/test_invariants.py additionally
    pins the raw estimate values."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("bigint")
        .alias("m_est"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .cast("bigint")
        .alias("d_est"),
        F.count_distinct("user_id").cast("bigint").alias(
            "exact_distinct_users"
        ),
    )
    # 1-row × 1-row certificate combine — a broadcast nested-loop of
    # two single-row aggregates (allowlisted in the no-cartesian
    # sweep, same as agg_heavy_hitters_twopass's certificate join).
    return (
        merged.crossJoin(direct)
        .select(
            "n_days",
            "n_events",
            "exact_distinct_users",
            (
                F.abs(
                    F.col("m_est").cast("double")
                    / F.col("exact_distinct_users")
                    - F.lit(1.0)
                )
                <= F.lit(0.05)
            ).alias("merged_within_bound"),
            (
                F.abs(
                    F.col("m_est").cast("double") / F.col("d_est")
                    - F.lit(1.0)
                )
                <= F.lit(0.05)
            ).alias("merge_consistent"),
        )
    )


@register(
    "agg_bitmap_distinct",
    # The oracle counts distinct the ordinary way; the Spark plan
    # computes the SAME exact answer via mergeable bitmap words —
    # algorithm-independent equality is the point of the check.
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    section=SECTION,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the third point
    on the distinct-count spectrum (exact shuffle-heavy
    count_distinct ↔ approximate HLL): each 62-id block becomes one
    64-bit word (bit_or of per-id bits), and popcounting the words
    gives the exact distinct count. Unlike count_distinct, partial
    states are tiny fixed-width integers that OR together
    associatively — mergeable across partitions, incremental across
    batches (store words per block, OR tomorrow's in); unlike HLL,
    the answer is exact. Two bounded-key shuffles:
    (type, id div 62) then (type). 62 bits per word keeps the shift
    off the sign bit."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", (F.col("user_id") / 62).cast("bigint").alias("blk")
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(user_id % 62 as int)))"
            ).alias("word")
        )
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("word")).alias("n_users"))
    )


@register(
    "agg_corr_regression",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
               ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6)
                   AS intercept,
               ROUND(covar_pop(l_extendedprice, l_quantity), 6) AS cov_pop
        FROM lineitem GROUP BY l_returnflag
    """,
    section=SECTION,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group — Pearson correlation, OLS
    slope/intercept, population covariance of (price, quantity).
    All four are single-pass co-moment aggregates (Welford-style
    partial states that merge associatively), so the plan is one
    bounded-key shuffle with map-side partials — the same shape as
    ``agg_stats``. 6-dp rounding is the cross-engine float
    discipline (SURVEY §0.2.1): both engines accumulate co-moments
    in double with ulp-level order sensitivity."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        ratio(F.corr("l_extendedprice", "l_quantity")).alias("price_qty_corr"),
        ratio(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
        ratio(F.regr_intercept("l_extendedprice", "l_quantity")).alias(
            "intercept"
        ),
        ratio(F.covar_pop("l_extendedprice", "l_quantity")).alias("cov_pop"),
    )


@register(
    "agg_weighted_stats",
    # Weighted sums run in exact DECIMAL. Precisions are sized so the
    # triple product w·x·x stays inside DECIMAL(38) on BOTH engines
    # with zero precision loss: w is DECIMAL(6,2) (qty ≤ 50), x is
    # DECIMAL(12,2) (price < 1e10), so w·x·x is ≤ DECIMAL(32,6) —
    # under Spark's p1+p2+1 widening AND DuckDB's p1+p2, no rounding
    # anywhere. Only the final divisions drop to double, dividing
    # identical exact numerators/denominators on both engines.
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(6,2))), 2)
                    AS DOUBLE) AS total_weight,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))
                              * CAST(l_extendedprice AS DECIMAL(12,2)))
                          AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)))
                            AS DOUBLE), 6) AS weighted_mean_price,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))
                              * CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(l_extendedprice AS DECIMAL(12,2)))
                          AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)))
                            AS DOUBLE)
                     - POW(CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))
                                    * CAST(l_extendedprice AS DECIMAL(12,2)))
                                AS DOUBLE)
                           / CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)))
                                  AS DOUBLE), 2), 2) AS weighted_var_price
        FROM lineitem GROUP BY l_returnflag
    """,
    section=SECTION,
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-aware mean/variance — training pipelines weight documents
    by quality or sampling probability, and the statistics must use
    Σwx/Σw, not plain avg. All three weighted sums (Σw, Σwx, Σwx²)
    accumulate in exact decimal — order-independent, mergeable across
    partitions — so the single shuffle carries three exact partials
    per group and the double division happens once per group at the
    end. Variance via E[x²]−E[x]² on exact sums (the two-pass form
    would need a second shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("decimal(6,2)")
    x = F.col("l_extendedprice").cast("decimal(12,2)")
    sw = F.sum(w)
    swx = F.sum(w * x)
    swxx = F.sum(w * x * x)
    wmean = swx.cast("double") / sw.cast("double")
    return li.groupBy("l_returnflag").agg(
        dround(sw).alias("total_weight"),
        ratio(wmean).alias("weighted_mean_price"),
        F.round(
            swxx.cast("double") / sw.cast("double") - F.pow(wmean, 2), 2
        ).alias("weighted_var_price"),
    )


@register(
    "agg_entropy",
    oracle="""
        WITH c AS (
            SELECT CAST(ts AS DATE) AS day, event_type,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(SUM(n) AS BIGINT) AS n_events,
               ROUND(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 6)
                   AS type_entropy
        FROM c GROUP BY day
    """,
    section=SECTION,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per day — a drift/skew
    monitor (a day whose traffic collapses onto one type stands out
    immediately). Two bounded-key aggregations: (day, type) counts
    — ≤ 31×5 groups — then entropy per day from the 5 per-type
    probabilities. No window needed on the Spark side: the second
    groupBy computes Σn and -Σ n·ln(n) in one pass and composes
    entropy as ln(N) - Σn·ln(n)/N (algebraically identical to
    -Σp·ln p, but needs only associative sums)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("day").agg(
        F.sum("n").alias("n_events"),
        ratio(
            F.log(F.sum("n"))
            - F.sum(F.col("n") * F.log("n")) / F.sum("n")
        ).alias("type_entropy"),
    )


@register(
    "agg_histogram_logscale",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(ln(value) / ln(2)) AS INT) AS log2_bucket,
                   value
            FROM events WHERE value > 0
        )
        SELECT log2_bucket,
               CAST(ROUND(pow(2, log2_bucket), 6) AS DOUBLE) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(ROUND(value, 6)) AS DOUBLE) AS min_v,
               CAST(MAX(ROUND(value, 6)) AS DOUBLE) AS max_v
        FROM b GROUP BY log2_bucket
    """,
    section=SECTION,
)
def agg_histogram_logscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (HDR-histogram-shaped) value distribution — the
    latency-histogram bucketing observability systems standardize on:
    linear bins (log_value_histogram) waste resolution on the tail,
    log2 bins give constant RELATIVE error across six orders of
    magnitude. Bucket id = floor(log2(value)) — pure arithmetic, so
    the groupBy key is derived map-side and the shuffle carries ≤~64
    buckets regardless of input volume; bucket bounds recompute from
    the id (no need to carry them through the aggregate). Both
    engines compute the bucket via ln(value)/ln(2): Spark's log2()
    and a literal ln-ratio can disagree by one ulp AT exact powers of
    two, so the op uses the SAME ln-ratio expression the oracle
    does."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bucket = F.floor(F.log("value") / F.log(F.lit(2.0))).cast("int")
    return ev.groupBy(bucket.alias("log2_bucket")).agg(
        ratio(F.pow(F.lit(2.0), F.col("log2_bucket"))).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n"),
        F.min(ratio("value")).alias("min_v"),
        F.max(ratio("value")).alias("max_v"),
    )


@register(
    "agg_skew_kurtosis",
    # Spark's skewness/kurtosis are POPULATION moments (g1, excess
    # g2); DuckDB's built-ins are bias-corrected sample statistics
    # and do NOT match. The oracle therefore rebuilds Spark's
    # definition from two-pass centered sums — mean first, then
    # E[(x−µ)^k] — which agrees with Spark's online central-moment
    # accumulation to well inside the 6-dp round.
    oracle="""
        WITH m AS (
            SELECT event_type, AVG(value) AS mu FROM events GROUP BY 1
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(POW(value - mu, 3))
                     / POW(AVG(POW(value - mu, 2)), 1.5), 6) AS skew,
               ROUND(AVG(POW(value - mu, 4))
                     / POW(AVG(POW(value - mu, 2)), 2) - 3, 6)
                   AS excess_kurtosis
        FROM events e JOIN m USING (event_type)
        GROUP BY e.event_type
    """,
    section=SECTION,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment distribution monitoring — skewness and excess
    kurtosis per event type, the tail-shape statistics that catch a
    drifting value distribution before the mean moves (a latency
    distribution growing a heavy tail shows in g2 first). Single-pass
    mergeable central-moment aggregates (Spark maintains M2/M3/M4
    online, merging across partitions) — one bounded-key shuffle,
    same plan shape as agg_stats. The oracle's two-pass centered-sum
    reconstruction pins the POPULATION definition Spark uses (DuckDB's
    own skewness/kurtosis are bias-corrected and differ)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        ratio(F.skewness("value")).alias("skew"),
        ratio(F.kurtosis("value")).alias("excess_kurtosis"),
    )


@register(
    "agg_gini_revenue",
    # Gini via the sorted-rank identity G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n
    # over per-user revenue totals. Revenue totals are exact decimal,
    # so the rank order (revenue, then user_id) is identical across
    # engines and the weighted sum is exact until the final division.
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   SUM(CAST(value AS DECIMAL(18,4))) AS rev
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ), ranked AS (
            SELECT rev,
                   row_number() OVER (ORDER BY rev, user_id) AS i,
                   COUNT(*) OVER () AS n
            FROM per_user
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_users,
               CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_revenue,
               ROUND(2.0 * CAST(SUM(i * rev) AS DOUBLE)
                     / (MAX(n) * CAST(SUM(rev) AS DOUBLE))
                     - (MAX(n) + 1.0) / MAX(n), 6) AS gini
        FROM ranked
    """,
    section=SECTION,
)
def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user purchase revenue — the
    concentration metric behind "top 1% of users drive X% of
    revenue": 0 = perfectly even, →1 = one whale. Computed by the
    sorted-rank identity over per-user totals: one user-keyed decimal
    aggregate, then the two-phase bucketed global rank from
    functions/ranking.py (VERDICT r4 #2 — the r4 form used a
    no-partition Window, i.e. a single-executor sort over the whole
    user domain; now 64 parallel bucket sorts + two O(1) driver
    actions, bit-identical ranks), and one exact weighted sum; the
    single output row needs only the final double division rounded.
    Ties rank deterministically by (revenue, user_id) on both
    engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(F.sum(dec4("value")).alias("rev"))
    ranked, n = global_row_number(
        spark, per_user, "rev", ["user_id"], out_col="i"
    )
    return ranked.agg(
        F.lit(n).cast("bigint").alias("n_users"),
        dround(F.sum("rev")).alias("total_revenue"),
        ratio(
            2.0 * F.sum(F.col("i") * F.col("rev")).cast("double")
            / (F.lit(n) * F.sum("rev").cast("double"))
            - (F.lit(n) + 1.0) / F.lit(n)
        ).alias("gini"),
    )


@register(
    "agg_mergeable_rollup",
    # The merge identity is exact in decimal: per-shard (n, Σv, Σv²)
    # partials sum to the same totals any direct pass computes, so
    # mean/variance derived from MERGED partials hash-match the
    # oracle's direct decimal computation bit-for-bit (doubles appear
    # only in the final division, rounded 6).
    oracle="""
        WITH shard AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(18,4))) AS s,
                   SUM(CAST(value AS DECIMAL(18,4))
                       * CAST(value AS DECIMAL(18,4))) AS s2
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_shards,
               ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 6) AS mean_v,
               ROUND((CAST(SUM(s2) AS DOUBLE)
                      - CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE)
                        / SUM(n)) / SUM(n), 6) AS var_pop,
               TRUE AS merge_matches_builtin
        FROM shard GROUP BY event_type
    """,
    section=SECTION,
)
def agg_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable-state aggregation — the algebraic property
    every 100 TB aggregation pipeline rests on: day-shard partials
    (n, Σv, Σv²) roll up to global mean/variance WITHOUT re-reading
    rows, exactly (decimal sums — no float re-association), and the
    result is pinned against Spark's own single-pass var_pop within
    1e-6 relative (merge_matches_builtin). This is the shape of
    incremental daily rollups, tiered storage summaries, and
    cross-cluster merges: shard partials are tiny, merge is a
    bounded-key second aggregate, and adding a day never recomputes
    history."""
    ev = load_table(spark, sf_dir, "events")
    shard = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec4("value")).alias("s"),
        F.sum(dec4("value") * dec4("value")).alias("s2"),
    )
    builtin = ev.groupBy("event_type").agg(
        F.var_pop("value").alias("var_builtin")
    )
    merged = shard.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.sum("s").alias("S"),
        F.sum("s2").alias("S2"),
    )
    mean = F.col("S").cast("double") / F.col("n")
    var = (
        F.col("S2").cast("double")
        - F.col("S").cast("double") * F.col("S").cast("double") / F.col("n")
    ) / F.col("n")
    return (
        merged.join(builtin, "event_type")
        .select(
            "event_type",
            "n",
            "n_shards",
            ratio(mean).alias("mean_v"),
            ratio(var).alias("var_pop"),
            (
                F.abs(var - F.col("var_builtin"))
                <= F.greatest(F.lit(1.0), F.col("var_builtin")) * 1e-6
            ).alias("merge_matches_builtin"),
        )
    )


@register(
    "agg_pareto_coverage",
    # Cumulative decimal comparison stays exact: "covers ≥80%" is
    # 10·cum ≥ 8·total in DECIMAL arithmetic — no float boundary.
    oracle="""
        WITH per_user AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
                   user_id,
                   SUM(CAST(value AS DECIMAL(18,4))) AS rev
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ), ranked AS (
            SELECT event_date, rev,
                   ROW_NUMBER() OVER w AS rn,
                   SUM(rev) OVER (
                       PARTITION BY event_date ORDER BY rev DESC, user_id
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(rev) OVER (PARTITION BY event_date) AS total
            FROM per_user
            WINDOW w AS (PARTITION BY event_date ORDER BY rev DESC, user_id)
        )
        SELECT event_date,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(CASE WHEN 10 * cum >= 8 * total THEN rn END)
                    AS BIGINT) AS k80,
               ROUND(MIN(CASE WHEN 10 * cum >= 8 * total THEN rn END)
                     * 1.0 / COUNT(*), 6) AS k80_user_share
        FROM ranked GROUP BY event_date
    """,
    section=SECTION,
)
def agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Pareto concentration — "how few buyers drive 80% of the
    day's revenue": per-(day, user) decimal totals, a day-partitioned
    descending rank with running share, and k80 = the first rank
    whose cumulative covers 80% (compared in exact decimal — 10·cum ≥
    8·total — so the threshold never straddles a float boundary).
    Window partitions are day-bounded buyer lists; the output is one
    row per day. The whale-watch companion to agg_gini_revenue's
    single global index."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy(
        F.to_date("ts").cast("string").alias("event_date"), "user_id"
    ).agg(F.sum(dec4("value")).alias("rev"))
    w = Window.partitionBy("event_date").orderBy(
        F.col("rev").desc(), "user_id"
    )
    ranked = per_user.select(
        "event_date",
        F.row_number().over(w).alias("rn"),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("rev")
        .over(Window.partitionBy("event_date"))
        .alias("total"),
    )
    covered = F.when(
        F.col("cum") * 10 >= F.col("total") * 8, F.col("rn")
    )
    return ranked.groupBy("event_date").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min(covered).cast("bigint").alias("k80"),
        ratio(F.min(covered) * F.lit(1.0) / F.count(F.lit(1))).alias(
            "k80_user_share"
        ),
    )


@register(
    "agg_histogram_percentile",
    # Deterministic mergeable percentile: the p95 BUCKET from exact
    # log2-bucket counts (20·cum ≥ 19·n compared in integers — no
    # float boundary, no sketch nondeterminism). Bucket-resolution
    # error is the documented trade; the answer is bit-stable.
    oracle="""
        WITH b AS (
            SELECT event_type,
                   CAST(floor(ln(value) / ln(2)) AS INT) AS bucket
            FROM events WHERE value > 0
        ), g AS (
            SELECT event_type, bucket, COUNT(*) AS c
            FROM b GROUP BY 1, 2
        ), cum AS (
            SELECT event_type, bucket, c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cc,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM g
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN 20 * cc >= 19 * n THEN bucket END)
                    AS INT) AS p95_bucket,
               CAST(ROUND(pow(2, MIN(CASE WHEN 20 * cc >= 19 * n
                                          THEN bucket END)), 6) AS DOUBLE)
                   AS p95_lo,
               CAST(ROUND(pow(2, MIN(CASE WHEN 20 * cc >= 19 * n
                                          THEN bucket END) + 1), 6) AS DOUBLE)
                   AS p95_hi
        FROM cum GROUP BY event_type
    """,
    section=SECTION,
)
def agg_histogram_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram percentile — the DETERMINISTIC mergeable
    alternative to GK sketches: exact log2-bucket counts (mergeable
    integers — shards sum, like agg_mergeable_rollup), cumulative
    over the ≤~64 bucket rows, p95 = first bucket where 20·cum ≥
    19·n in pure integer arithmetic. Same answer on every engine,
    every run, every merge order; resolution is one power-of-two
    bucket (constant relative error) — the trade observability
    systems standardize on. The window runs over bucket rows, never
    events."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    bucket = F.floor(F.log("value") / F.log(F.lit(2.0))).cast("int")
    g = ev.groupBy(
        "event_type", bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        "bucket",
        F.sum("c").over(wb).alias("cc"),
        F.sum("c").over(wt).alias("n"),
    )
    hit = F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("bucket"))
    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(hit).cast("int").alias("p95_bucket"),
        ratio(F.pow(F.lit(2.0), F.min(hit))).alias("p95_lo"),
        ratio(F.pow(F.lit(2.0), F.min(hit) + 1)).alias("p95_hi"),
    )


@register(
    "agg_histogram_equiheight",
    oracle="""
        WITH bounds AS (
            SELECT list_transform(
                       quantile_cont(value,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                       x -> ROUND(x, 6)) AS bs
            FROM events
        )
        SELECT len(list_filter(b.bs, x -> e.value > x)) AS bucket,
               COUNT(*) AS n,
               ROUND(MIN(e.value), 6) AS lo,
               ROUND(MAX(e.value), 6) AS hi
        FROM events e, bounds b
        GROUP BY 1
    """,
    section=SECTION,
)
def agg_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-HEIGHT histogram (≈equal row counts per bucket — the
    histogram query optimizers keep as column statistics, where
    equi-width buckets would collapse under skew): boundaries are the
    9 interior deciles (exact interpolated percentile — the
    agg_percentile_exact cross-engine equivalence) ROUNDED TO 6 DP ON
    BOTH ENGINES before any row touches them, so bucket assignment
    compares raw values against bit-identical boundary doubles — the
    interpolation float can never diverge a comparison. Assignment is rank-free: bucket = how many
    boundaries the value exceeds (a 9-element array scan per row, not
    a sort).

    Scale shape: one exact-percentile pass (sort-based per-partition
    merge) producing a 1-row boundary array, broadcast onto a
    map-side bucket assignment + 10-key partial agg. No global sort,
    no per-row shuffle keyed wider than the bucket id."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.transform(
            F.expr(
                "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ),
            lambda x: F.round(x, 6),
        ).alias("bs")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.size(
                F.filter(F.col("bs"), lambda x: F.col("value") > x)
            ).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ratio(F.min("value")).alias("lo"),
            ratio(F.max("value")).alias("hi"),
        )
    )


@register(
    "agg_bool_suite",
    oracle="""
        SELECT event_type,
               bool_and(value > 0) AS all_positive,
               bool_or(value > 95) AS any_large,
               COUNT(*) FILTER (WHERE value > 95) AS n_large,
               bool_and(value IS NOT NULL) AS none_null,
               ROUND(COUNT(*) FILTER (WHERE value > 95) * 1.0 / COUNT(*), 6)
                   AS frac_large
        FROM events
        GROUP BY event_type
    """,
    section=SECTION,
)
def agg_bool_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface — bool_and / bool_or / count_if, the
    assertion-style aggregates monitoring queries lean on ("did every
    request in the group succeed", "did any value breach the
    threshold"). SQL-standard EVERY/ANY semantics: nulls are ignored,
    not falsified, which the none_null probe pins explicitly.

    Scale shape: plain hash aggregation on a low-cardinality key;
    boolean partial states are single bytes, combined map-side — the
    cheapest aggregate family there is."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") > 0).alias("all_positive"),
            F.bool_or(F.col("value") > 95).alias("any_large"),
            F.count_if(F.col("value") > 95).alias("n_large"),
            F.bool_and(F.col("value").isNotNull()).alias("none_null"),
            ratio(
                F.count_if(F.col("value") > 95) * F.lit(1.0) / F.count(F.lit(1))
            ).alias("frac_large"),
        )
    )


@register(
    "agg_theta_sketch_setops",
    # Tolerance reformulation (the agg_approx_count_distinct pattern):
    # theta sketches support SET ALGEBRA that HLL cannot (intersection,
    # difference), at bounded relative error (lgK=14 → rse ≈ 0.8%; 5%
    # tolerance is > 6σ and deterministic on a fixed fixture). The
    # oracle emits the EXACT set cardinalities (hash-matched) and
    # literal TRUE for each estimate-within-tolerance claim.
    oracle="""
        WITH flags AS (
            SELECT user_id,
                   bool_or(event_type = 'click') AS c,
                   bool_or(event_type = 'purchase') AS p
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        )
        SELECT COUNT(*) FILTER (WHERE c) AS n_click,
               COUNT(*) FILTER (WHERE p) AS n_purchase,
               COUNT(*) AS n_union,
               COUNT(*) FILTER (WHERE c AND p) AS n_both,
               COUNT(*) FILTER (WHERE c AND NOT p) AS n_click_only,
               TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
        FROM flags
    """,
    section=SECTION,
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra — the mergeable-sketch feature HLL
    lacks: union AND intersection AND difference over distinct-user
    sets ("users who clicked ∩ users who purchased") from two
    one-pass sketches, no re-scan per question. At 100 TB the exact
    per-user flags require a user-keyed shuffle of every row; the
    sketches are tiny mergeable states combined map-side, and any set
    expression over them is then O(sketch) — this op runs BOTH paths
    and pins the sketch estimates inside 5% of the exact answers
    (exact values hash-matched, booleans carry the sketch claim).

    Scale: one pass builds both sketches; the exact twin exists to
    bound them at fixture scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sketches = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id")), 14
        ).alias("sk_c"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")), 14
        ).alias("sk_p"),
    )
    flags = ev.groupBy("user_id").agg(
        F.bool_or(F.col("event_type") == "click").alias("c"),
        F.bool_or(F.col("event_type") == "purchase").alias("p"),
    )
    exact = flags.agg(
        F.count_if("c").alias("n_click"),
        F.count_if("p").alias("n_purchase"),
        F.count(F.lit(1)).alias("n_union"),
        F.count_if(F.col("c") & F.col("p")).alias("n_both"),
        F.count_if(F.col("c") & ~F.col("p")).alias("n_click_only"),
    )
    est_u = F.theta_sketch_estimate(F.theta_union("sk_c", "sk_p"))
    est_i = F.theta_sketch_estimate(F.theta_intersection("sk_c", "sk_p"))
    est_d = F.theta_sketch_estimate(F.theta_difference("sk_c", "sk_p"))

    def ok(est, exact_col):
        return F.abs(est - F.col(exact_col)) <= 0.05 * F.col(exact_col)

    return exact.crossJoin(F.broadcast(sketches)).select(
        "n_click",
        "n_purchase",
        "n_union",
        "n_both",
        "n_click_only",
        ok(est_u, "n_union").alias("union_ok"),
        ok(est_i, "n_both").alias("intersect_ok"),
        ok(est_d, "n_click_only").alias("diff_ok"),
    )


@register(
    "agg_kll_quantile_merge",
    # Tolerance reformulation: KLL (k=200) guarantees ~1.65% one-pass
    # RANK error; the checkable claim is "each merged-sketch quantile
    # lies inside the exact ±3%-rank bracket". Exact quantiles are
    # hash-matched, booleans carry the sketch claim.
    oracle="""
        SELECT ROUND(quantile_cont(value, 0.50), 6) AS p50_exact,
               ROUND(quantile_cont(value, 0.90), 6) AS p90_exact,
               ROUND(quantile_cont(value, 0.99), 6) AS p99_exact,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        FROM events
    """,
    section=SECTION,
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles — KLL sketches built PER DAY and folded
    into one global sketch, the incremental-rollup shape a 100 TB
    store needs (yesterday's sketch is never recomputed; today's
    partial merges in): per-day ``kll_sketch_agg_double`` states,
    collected as a ≤31-element bounded list and folded pairwise with
    ``kll_sketch_merge_double`` (KLL merge is associative), then
    queried at p50/p90/p99. Each estimate is pinned inside the exact
    ±3%-rank bracket (> the sketch's guaranteed 1.65% one-pass rank
    error); exact quantiles hash-match the oracle.

    Scale: per-day sketches aggregate with map-side partials; the
    fold runs over a calendar-bounded array in ONE final 1-row agg —
    no re-scan, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = daily.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice("sks", 2, 10000),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk")
    )
    exact = ev.agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"e{tag}")
            for q, tag in [(0.50, "50"), (0.90, "90"), (0.99, "99")]
        ],
        *[
            F.expr(f"percentile(value, {q})").alias(f"{side}{tag}")
            for (q, tag, side) in [
                (0.47, "50", "lo"), (0.53, "50", "hi"),
                (0.87, "90", "lo"), (0.93, "90", "hi"),
                (0.96, "99", "lo"), (1.00, "99", "hi"),
            ]
        ],
    )
    out = exact.crossJoin(F.broadcast(merged))
    cols = []
    for tag, q in [("50", 0.50), ("90", 0.90), ("99", 0.99)]:
        est = F.kll_sketch_get_quantile_double("sk", F.lit(q))
        cols.append(ratio(F.col(f"e{tag}")).alias(f"p{tag}_exact"))
        cols.append(
            ((est >= F.col(f"lo{tag}")) & (est <= F.col(f"hi{tag}")))
            .alias(f"p{tag}_ok")
        )
    return out.select(*[cols[i] for i in (0, 2, 4, 1, 3, 5)])


@register(
    "agg_incremental_mv_merge",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_value
        FROM events
        GROUP BY event_type
    """,
    section=SECTION,
)
def agg_incremental_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view incremental maintenance — the refresh path a
    100 TB store runs nightly: yesterday's aggregate lives as STORED
    PARTIALS (per-type n and exact-decimal Σv for days ≤25, written to
    parquet — the MV), today's delta (days >25) aggregates alone, and
    the refresh MERGES partial states (Σn, ΣΣv) without ever
    re-reading base rows — count and sum are mergeable, and mean
    derives at the end. The oracle recomputes from the full table:
    equality proves merge(MV, delta) ≡ full recompute, the invariant
    incremental view maintenance must uphold.

    Scale shape: the base scan happens ONCE (when the MV materializes)
    — the refresh reads the tiny partials file + the delta slice; the
    merge is a bounded-key (event_type) aggregate of partial rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", dec4("value").alias("v"), F.dayofmonth("ts").alias("dom")
    )

    def partials(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("pn"), F.sum("v").alias("psum")
        )

    mv_dir = scratch_dir("logdb_mv_")
    partials(ev.filter(F.col("dom") <= 25)).write.mode("overwrite").parquet(
        mv_dir
    )
    base = spark.read.schema(
        "event_type string, pn bigint, psum decimal(28,4)"
    ).parquet(mv_dir)
    delta = partials(ev.filter(F.col("dom") > 25))
    merged = base.unionByName(delta).groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.sum("psum").alias("total_dec")
    )
    return merged.select(
        "event_type",
        "n",
        F.col("total_dec").cast("double").alias("total"),
        ratio(F.col("total_dec").cast("double") / F.col("n")).alias(
            "mean_value"
        ),
    )


_CMS_DEPTH = 4


@register(
    "agg_count_min_sketch",
    oracle=f"""
        WITH rows_ AS (SELECT UNNEST(range({_CMS_DEPTH})) AS r),
        hashed AS (
            SELECT r, substring(md5('r' || CAST(r AS VARCHAR) || ':'
                                    || CAST(user_id AS VARCHAR)), 1, 2) AS bkt
            FROM events CROSS JOIN rows_
        ),
        cms AS (
            SELECT r, bkt, COUNT(*) AS c FROM hashed GROUP BY r, bkt
        ),
        top_users AS (
            SELECT user_id, COUNT(*) AS exact_cnt
            FROM events GROUP BY user_id
            ORDER BY exact_cnt DESC, user_id LIMIT 10
        )
        SELECT t.user_id, t.exact_cnt, MIN(c.c) AS cms_est
        FROM top_users t
        JOIN cms c ON c.bkt = substring(md5('r' || CAST(c.r AS VARCHAR)
                                            || ':' || CAST(t.user_id AS VARCHAR)), 1, 2)
        GROUP BY t.user_id, t.exact_cnt
        ORDER BY t.exact_cnt DESC, t.user_id
    """,
    section=SECTION,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch with EXACT cross-engine parity: depth-4 ×
    width-256 counter matrix where row r's bucket for a key is the
    first hex byte of md5('r<r>:<key>') — the same engine-neutral
    md5 discipline the sampling family uses, so Spark and DuckDB
    build bit-identical sketches and the oracle hash-checks the
    estimates themselves, not just error bounds. Build is one
    map-side 4× row expansion (explode of a 4-element literal array —
    NOT a join) followed by a partial-agg shuffle keyed on (r, bkt)
    ≤ 1024 groups: at 100 TB the shuffle carries at most
    depth × width pre-combined counters per map partition, the
    textbook mergeability that makes CMS a streaming/distributed
    sketch. Probing the 10 heaviest users (TakeOrdered, no global
    sort) recomputes their row-wise buckets and takes MIN over the 4
    counters; estimate ≥ exact always, with overestimates only on
    byte-bucket collisions. ~1.8k distinct users over 256 buckets at
    sf0.1 makes collisions real — the driver gate pins that both
    engines agree on exactly which estimates overcount and by how
    much."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    rows = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    bkt = lambda r, uid: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit("r"), r.cast("string"), F.lit(":"), uid.cast("string"))),
        1,
        2,
    )
    cms = (
        ev.select("user_id", F.explode(rows).alias("r"))
        .select("r", bkt(F.col("r"), F.col("user_id")).alias("bkt"))
        .groupBy("r", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id", "exact_cnt", F.explode(rows).alias("r")
    ).select("user_id", "exact_cnt", "r", bkt(F.col("r"), F.col("user_id")).alias("bkt"))
    return (
        probes.join(F.broadcast(cms), ["r", "bkt"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


# Two-pass heavy-hitters parameters: summary capacity m bounds the
# per-partition candidate set AND yields the completeness certificate
# (any item the summaries missed has global count <= N/m).
_HH_CAPACITY = 64
_HH_K = 5


@register(
    "agg_heavy_hitters_twopass",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents
        ), c AS (
            SELECT token, COUNT(*) AS n FROM tok GROUP BY token
        ), t AS (SELECT SUM(n) AS tot FROM c),
        topk AS (
            SELECT token, n FROM c
            ORDER BY n DESC, token LIMIT {_HH_K}
        ), cert AS (
            SELECT MIN(n) * {_HH_CAPACITY} > (SELECT tot FROM t)
                AS provably_complete
            FROM topk
        )
        SELECT token, CAST(n AS BIGINT) AS n_occurrences,
               ROUND(n * 1.0 / (SELECT tot FROM t), 6) AS freq,
               (SELECT provably_complete FROM cert) AS provably_complete
        FROM topk
    """,
    section=SECTION,
)
def agg_heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 frequent tokens via the two-pass summary + exact-rescore
    pattern — the scale-correct answer to "most frequent items" when
    the key domain is too large to hash-aggregate cheaply (URLs, query
    strings, user agents at 100 TB): pass 1 keeps each partition's
    local top-m counts (a Misra-Gries-style bounded summary — any item
    with partition count > n_p/m survives, so by pigeonhole the union
    of summaries is a SUPERSET of every item with global count > N/m);
    pass 2 rescans once and counts ONLY the bounded candidate set
    exactly. The result carries its own CERTIFICATE: because every
    returned count is exact and any missed item is bounded by N/m, the
    top-k is provably the true top-k whenever the k-th exact count
    exceeds N/m — emitted as the provably_complete column (true on
    this corpus; the oracle recomputes the same certificate from fully
    exact counts, so the flag itself is hash-checked).

    Scale shape: pass 1 is Arrow-batched mapInPandas (vectorized
    value_counts per batch, m rows out per batch — map-only); the
    candidate union is a bounded driver list (<= m x batches,
    deduplicated); pass 2 is one filtered scan + groupBy over <= m
    distinct keys with map-side partials. No shuffle ever carries the
    unbounded key domain."""
    import pandas as pd  # noqa: F401 — batch iterator yields DataFrames

    from pyspark.sql.types import StringType, StructField, StructType

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))

    cand_schema = StructType([StructField("token", StringType())])

    def local_topm(batches):
        for pdf in batches:
            vc = pdf["token"].value_counts()
            yield vc.head(_HH_CAPACITY).rename_axis("token").reset_index()[
                ["token"]
            ]

    candidates = [
        r["token"] for r in toks.mapInPandas(local_topm, cand_schema)
        .distinct()
        .collect()  # driver-scalar: bounded <= m x batches candidate keys
    ]
    total = toks.count()  # scalar action, not a collected dataset
    exact = (
        toks.filter(F.col("token").isin(candidates))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(_HH_K)
    )
    exact = track_persist(exact)  # k rows; feeds both the result and
    # the certificate leg without re-running the rescore scan.
    # Certificate as a broadcast 1-row cross join (NOT an empty-
    # partition window — that is the single-partition WindowExec
    # anti-pattern even over k rows, and it spams scale warnings).
    cert = exact.agg(
        (F.min("n") * _HH_CAPACITY > F.lit(total)).alias(
            "provably_complete"
        )
    )
    return exact.crossJoin(F.broadcast(cert)).select(
        "token",
        F.col("n").cast("bigint").alias("n_occurrences"),
        ratio(F.col("n") / F.lit(float(total))).alias("freq"),
        "provably_complete",
    )


@register(
    "agg_listagg_ordered",
    oracle="""
        WITH top_users AS (
            SELECT event_type, user_id, COUNT(*) AS n,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY COUNT(*) DESC, user_id) AS rn
            FROM events GROUP BY event_type, user_id
        )
        SELECT event_type,
               string_agg(CAST(user_id AS VARCHAR), ','
                          ORDER BY n DESC, user_id) AS top_user_csv,
               CAST(COUNT(*) AS BIGINT) AS n_listed
        FROM top_users WHERE rn <= 5
        GROUP BY event_type
    """,
    section=SECTION,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg WITHIN GROUP — the SQL:2016 ordered string
    aggregation (Spark 4 `listagg`, DuckDB `string_agg ... ORDER BY`):
    each event type's top-5 chattiest users concatenated as a
    deterministic CSV, the report-friendly denormalized form
    dashboards and alert payloads want. Determinism requires the
    ORDER BY inside the aggregate — an unordered listagg is
    nondeterministic under partitioned execution by construction, so
    the ordered form is the ONLY hash-checkable one (and the only one
    worth shipping).

    Scale shape: the top-5 window prunes each group to 5 rows BEFORE
    concatenation (a listagg over unbounded group members is an
    unbounded-row string — the window cap is what makes the operator
    scale-safe); shuffles are the (type, user) count agg and the
    |types|-bounded window."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), "user_id"
    )
    top = counts.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )
    return top.groupBy("event_type").agg(
        F.expr(
            "listagg(CAST(user_id AS STRING), ',')"
            " WITHIN GROUP (ORDER BY n DESC, user_id)"
        ).alias("top_user_csv"),
        F.count(F.lit(1)).cast("bigint").alias("n_listed"),
    )
