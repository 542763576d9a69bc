"""§2.H — scalar function suites (string / regex / date / math / case /
array / map-from-json / higher-order).

All built-in pyspark.sql.functions — JVM-side, inside whole-stage
codegen; no Python in any of these paths. Higher-order functions
(transform/filter/aggregate) run as Catalyst lambda expressions, the
idiomatic way to compute over array columns without exploding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logdb_spark.functions.numeric import ratio
from logdb_spark.functions.temporal import ts_str
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.H scalar functions"


@register(
    "fn_string_suite",
    oracle="""
        SELECT p_partkey,
               lower(p_name)                          AS name_lower,
               upper(p_type)                          AS type_upper,
               length(p_name)                         AS name_len,
               replace(p_brand, 'Brand#', 'B')        AS brand_short,
               substr(p_type, 1, 5)                   AS type_prefix,
               concat_ws('-', p_brand, p_type)        AS brand_type,
               trim('  ' || p_brand || ' ')           AS brand_trim
        FROM part
    """,
    section=SECTION,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trim"
        ),
    )


@register(
    "fn_regexp_extract",
    oracle=r"""
        SELECT p_partkey, p_brand,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT)
                   AS brand_num
        FROM part
    """,
    section=SECTION,
)
def fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("bigint").alias(
            "brand_num"
        ),
    )


@register(
    "fn_date_suite",
    oracle="""
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               strftime(date_trunc('week',  o_orderdate), '%Y-%m-%d') AS order_week,
               CAST(year(o_orderdate)  AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_month_num,
               CAST(isodow(o_orderdate) AS BIGINT) AS order_isodow,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                    AS BIGINT) AS days_to_2002,
               strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
        FROM orders
    """,
    section=SECTION,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / extract / datediff / interval arithmetic.

    Cross-engine quirk handled: Spark weekday() is 0=Monday while
    DuckDB dayofweek() is 0=Sunday — ISO day-of-week (1=Monday) is the
    stable common form.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_week"
        ),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month_num"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("order_isodow"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@register(
    "fn_math_suite",
    oracle="""
        SELECT o_orderkey,
               ROUND(abs(o_totalprice - 250000), 2)   AS abs_from_mid,
               CAST(ceil(o_totalprice / 1000)  AS BIGINT) AS price_k_ceil,
               CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
               ROUND(ln(o_totalprice), 6)             AS ln_price,
               ROUND(sqrt(o_totalprice), 6)           AS sqrt_price,
               ROUND(pow(o_totalprice / 100000, 2), 6) AS pow_price,
               CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sign_mid
        FROM orders
    """,
    section=SECTION,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.abs(tp - 250000), 2).alias("abs_from_mid"),
        F.ceil(tp / 1000).alias("price_k_ceil"),
        F.floor(tp / 1000).alias("price_k_floor"),
        ratio(F.log(tp)).alias("ln_price"),
        ratio(F.sqrt(tp)).alias("sqrt_price"),
        ratio(F.pow(tp / 100000, 2)).alias("pow_price"),
        F.signum(tp - 250000).cast("double").alias("sign_mid"),
    )


@register(
    "fn_case_bucketing",
    oracle="""
        SELECT CASE WHEN value < 50 THEN 'low'
                    WHEN value < 200 THEN 'mid'
                    ELSE 'high' END AS value_band,
               event_type,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    section=SECTION,
)
def fn_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("value_band")
    )
    return ev.groupBy(band, F.col("event_type")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "fn_array_suite",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))                    AS n_tokens,
               array_to_string(list_sort(string_split(text, ' '))[1:3], '|')
                                                               AS first3_sorted,
               list_contains(string_split(text, ' '), 'join')  AS has_join,
               len(list_distinct(string_split(text, ' ')))     AS n_distinct
        FROM documents
    """,
    section=SECTION,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text (no explode needed).

    Result columns are scalar-only: array-valued cells crash the
    driver's pandas canonicalizer (SURVEY §7.3.5), so the sorted-slice
    is emitted as a '|'-joined string on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_join(F.slice(F.array_sort(toks), 1, 3), "|").alias("first3_sorted"),
        F.array_contains(toks, "join").alias("has_join"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )


@register(
    "fn_map_from_json",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), '|')  AS prop_keys,
               CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_value,
               CAST(len(json_keys(props)) AS INTEGER)             AS n_keys
        FROM events
    """,
    section=SECTION,
)
def fn_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload -> MapType, then map functions (schema-on-read).

    prop_keys is '|'-joined (scalar cell) — raw array cells crash the
    driver canonicalizer (SURVEY §7.3.5).
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("prop_keys"),
        m.getItem("k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_higher_order",
    oracle="""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                   FROM embeddings)
        SELECT vec_id,
               CAST(len(list_filter(emb, x -> x > 0)) AS INTEGER) AS n_positive,
               ROUND(list_aggregate(list_transform(emb, x -> abs(x)), 'sum'), 6)
                   AS l1_norm,
               ROUND(list_aggregate(emb, 'sum') / len(emb), 6) AS mean_component
        FROM e
    """,
    section=SECTION,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate lambdas over the embedding array.

    Elements are cast float->double BEFORE summation on both engines so
    the sequential accumulation is bit-identical (float32 accumulators
    would drift differently).
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        ratio(
            F.aggregate(
                F.transform(emb, lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("l1_norm"),
        ratio(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x) / F.size(emb)
        ).alias("mean_component"),
    )


@register(
    "fn_bitwise_suite",
    oracle="""
        SELECT event_id,
               event_id & 255                       AS low_byte,
               event_id | 4096                      AS with_flag,
               xor(event_id, user_id)               AS mixed,
               CAST(~event_id AS BIGINT)            AS inverted,
               event_id << 3                        AS shl3,
               event_id >> 2                        AS shr2,
               bit_count(event_id)                  AS popcount
        FROM events
    """,
    section=SECTION,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator suite over id columns — mask/flag/shift/xor/
    popcount, the primitives the hashing and sketch operators build
    on (SimHash's bit_count(xor) distance is exactly this surface).
    All JVM codegen expressions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("mixed"),
        F.bitwise_not(F.col("event_id")).cast("bigint").alias("inverted"),
        F.shiftleft(F.col("event_id"), 3).alias("shl3"),
        F.shiftright(F.col("event_id"), 2).alias("shr2"),
        F.bit_count(F.col("event_id")).cast("bigint").alias("popcount"),
    )


@register(
    "fn_try_suite",
    oracle="""
        SELECT event_id,
               TRY_CAST(CASE WHEN event_type = 'error'
                             THEN 'n/a' ELSE CAST(user_id AS VARCHAR) END
                        AS INTEGER) AS t_int,
               CASE WHEN user_id % 3 = 0 THEN NULL
                    ELSE CAST(event_id AS DOUBLE) / (user_id % 3) END
                   AS t_div,
               strftime(try_strptime('2024-' || lpad(CAST(user_id % 15 AS VARCHAR), 2, '0')
                                     || '-01', '%Y-%m-%d'),
                        '%Y-%m-%d %H:%M:%S') AS t_ts,
               list_value('lo', 'hi')[(user_id % 4) + 1] AS t_elem
        FROM events
    """,
    section=SECTION,
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-tolerant scalar surface: try_cast / try_divide /
    try_to_timestamp / try_element_at — every malformed input becomes
    NULL instead of killing the job, which is the posture a 100 TB
    ingest needs (one bad record must not fail a 10-hour stage; the
    NULLs are then countable as a data-quality metric). Malformed
    inputs are synthesized from event fields: a non-numeric string
    for every 'error' event, a zero divisor for every user_id ≡ 0
    (mod 3), month 00/13/14 date strings, and an out-of-bounds list
    index. The oracle mirrors each with DuckDB's TRY_CAST /
    guarded-division / try_strptime / native out-of-range list NULL —
    pinning that both engines agree on WHICH inputs are junk."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("try_cast(CASE WHEN event_type = 'error' THEN 'n/a' "
               "ELSE CAST(user_id AS STRING) END AS INT)").alias("t_int"),
        F.expr("try_divide(event_id, user_id % 3)").alias("t_div"),
        F.date_format(
            F.expr("try_to_timestamp(concat('2024-', "
                   "lpad(cast(user_id % 15 as string), 2, '0'), '-01'), "
                   "'yyyy-MM-dd')"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("t_ts"),
        F.expr(
            "try_element_at(array('lo', 'hi'), cast(user_id % 4 as int) + 1)"
        ).alias("t_elem"),
    )


@register(
    "fn_struct_suite",
    # The oracle reconstructs each derived column from the flat base
    # table: struct build→access must round-trip to the original
    # column, and DuckDB's to_json(struct_pack(...)) prints the same
    # compact {"k":v} form as Spark's to_json(struct(...)) — the JSON
    # string itself is hash-pinned, not just the extracted fields.
    oracle="""
        SELECT o_orderkey,
               to_json(struct_pack(
                   key := o_orderkey,
                   pri := o_orderpriority,
                   d := strftime(o_orderdate, '%Y-%m-%d'))) AS as_json,
               o_orderpriority AS pri_field,
               strftime(o_orderdate, '%Y-%m-%d') AS d_from_json,
               o_orderkey AS nested_key
        FROM orders
    """,
    section=SECTION,
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT surface: build a named struct, serialize it with
    ``to_json``, read a field back out of the JSON string with a
    JSONPath, and access a field through two levels of struct
    nesting. All pure Catalyst expressions — CreateNamedStruct /
    StructsToJson / GetJsonObject / GetStructField fuse into one
    whole-stage-codegen projection, map-only at any scale. Dates are
    stringified BEFORE entering the struct so both engines serialize
    the identical value (SURVEY §0.2.2 precision discipline)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
    )
    nested = F.struct(s.alias("inner"), F.lit(1).alias("v"))
    return o.select(
        "o_orderkey",
        F.to_json(s).alias("as_json"),
        s.getField("pri").alias("pri_field"),
        F.get_json_object(F.to_json(s), "$.d").alias("d_from_json"),
        nested.getField("inner").getField("key").alias("nested_key"),
    )


@register(
    "fn_variant_json",
    oracle="""
        SELECT event_id,
               CAST(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END
                    AS INT) AS parse_ok,
               CASE WHEN event_id % 7 <> 0
                    THEN CAST(json_extract_string(props, '$.k') AS INT)
               END AS k_int,
               CASE WHEN event_id % 7 <> 0
                    THEN json_extract_string(props, '$.k')
               END AS k_str,
               CAST(NULL AS INT) AS missing_path
        FROM events
    """,
    section=SECTION,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the JSON props
    column into a VARIANT, extract typed values by JSONPath, and
    prove junk-tolerance — every 7th row is deterministically
    corrupted before parsing, and ``try_parse_json`` must yield NULL
    for it rather than fail the stage (the schema-on-read posture a
    log engine needs: one bad record cannot kill a 100 TB scan).
    VariantGet is a Catalyst expression over the binary variant
    encoding — map-only, codegen-fused, no Python. The VARIANT itself
    stays intermediate; output cells are the extracted scalars
    (SURVEY §7.3.5). Oracle re-derives the same values with DuckDB's
    JSON extraction on the uncorrupted rows."""
    ev = load_table(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 7 == 0, F.lit("{not json")
    ).otherwise(F.col("props"))
    v = F.try_parse_json(corrupted)
    return ev.select(
        "event_id",
        v.isNotNull().cast("int").alias("parse_ok"),
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "int").alias("missing_path"),
    )


@register(
    "fn_url_suite",
    # The URL is constructed from flat columns, so the oracle derives
    # every extracted component directly from those columns — the
    # check pins that Spark's parse_url agrees with the construction.
    oracle="""
        SELECT doc_id,
               source || '.example.com' AS url_host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS url_path,
               'lang=' || lang || '&sz=' || CAST(n_chars AS VARCHAR)
                   AS url_query,
               lang AS q_lang,
               CAST(n_chars AS VARCHAR) AS q_sz,
               'https' AS url_proto
        FROM documents
    """,
    section=SECTION,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface — the log-analytics staple (every access
    log carries request URLs): build a URL from fixture columns, then
    take it apart with ``parse_url`` (HOST / PATH / QUERY / PROTOCOL
    and per-key QUERY extraction). All Catalyst expressions in one
    map-only codegen projection; the oracle reconstructs each
    component from the flat columns, so a parse_url regression cannot
    hide behind a matching inverse."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&sz="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("sz")).alias("q_sz"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("url_proto"),
    )


@register(
    "fn_null_suite",
    oracle="""
        SELECT event_id,
               COALESCE(NULLIF(event_type, 'view'), 'filtered')
                   AS type_or_filtered,
               NULLIF(user_id % 10, 0) AS decile_nonzero,
               COALESCE(NULLIF(user_id % 10, 0), -1) AS decile_defaulted,
               CASE WHEN isnan(CASE WHEN user_id % 10 = 0
                                    THEN CAST('NaN' AS DOUBLE)
                                    ELSE value END)
                    THEN 0.0 ELSE ROUND(value, 6) END AS value_nan_guarded,
               (value IS NOT DISTINCT FROM value) AS self_ndistinct
        FROM events
    """,
    section=SECTION,
)
def fn_null_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface: NULLIF (sentinel → NULL),
    COALESCE chains (NULL → default), nanvl over an injected NaN —
    Spark's nanvl vs the oracle's isnan CASE; NULL and NaN are
    DIFFERENT (nanvl passes NULL through untouched, which this op's
    first draft tripped over) — and null-safe equality
    through IS NOT DISTINCT FROM. Every expression is a codegen
    conditional in one map-only projection; these are the scalars a
    log pipeline leans on hardest, since real feeds are full of
    sentinel zeros and NaNs that must become NULLs BEFORE aggregation
    (a NaN entering a sum poisons it; a NULL is skipped)."""
    ev = load_table(spark, sf_dir, "events")
    decile = F.nullif(F.col("user_id") % 10, F.lit(0))
    return ev.select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("view")), F.lit("filtered")
        ).alias("type_or_filtered"),
        decile.alias("decile_nonzero"),
        F.coalesce(decile, F.lit(-1)).alias("decile_defaulted"),
        F.nanvl(
            F.when(
                F.col("user_id") % 10 == 0, F.lit(float("nan"))
            ).otherwise(F.round("value", 6)),
            F.lit(0.0),
        ).alias("value_nan_guarded"),
        F.col("value").eqNullSafe(F.col("value")).alias("self_ndistinct"),
    )


@register(
    "fn_ip_suite",
    oracle="""
        WITH ips AS (
            SELECT event_id,
                   '10.' || CAST(user_id % 250 AS VARCHAR) || '.'
                   || CAST(event_id % 250 AS VARCHAR) || '.'
                   || CAST(CAST(floor(value) AS BIGINT) % 250 AS VARCHAR)
                       AS ip
            FROM events
        ), parts AS (
            SELECT event_id, ip,
                   CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
                   CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
                   CAST(string_split(ip, '.')[3] AS BIGINT) AS o3,
                   CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
            FROM ips
        )
        SELECT event_id, ip,
               o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
               CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
               || CAST(o3 AS VARCHAR) || '.0/24' AS subnet24,
               (o2 < 128) AS in_lower_half
        FROM parts
    """,
    section=SECTION,
)
def fn_ip_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 manipulation suite — the network-log staple (no inet type
    in either engine, so this IS how production SQL does it): octet
    split, numeric form (the sortable/range-joinable key), /24 subnet
    rollup key, and a subnet-range predicate. IPs are synthesized
    deterministically from event fields (same discipline as
    text_pii_scrub). All string/integer arithmetic in whole-stage
    codegen — map-only at any scale."""
    ev = load_table(spark, sf_dir, "events")
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id") % 250).cast("string"),
        (F.col("event_id") % 250).cast("string"),
        (F.floor("value").cast("bigint") % 250).cast("string"),
    )
    d = ev.select("event_id", ip.alias("ip"))
    oct_ = lambda i: F.split("ip", r"\.")[i - 1].cast("bigint")  # noqa: E731
    return d.select(
        "event_id",
        "ip",
        (
            oct_(1) * 16777216 + oct_(2) * 65536 + oct_(3) * 256 + oct_(4)
        ).alias("ip_num"),
        F.concat_ws(
            ".",
            oct_(1).cast("string"),
            oct_(2).cast("string"),
            F.concat(oct_(3).cast("string"), F.lit(".0/24")),
        ).alias("subnet24"),
        (oct_(2) < 128).alias("in_lower_half"),
    )


@register(
    "fn_hash_suite",
    oracle="""
        SELECT doc_id,
               md5(text) AS md5_hex,
               sha256(text) AS sha256_hex,
               md5(lang || '|' || source || '|' || text) AS key_hash,
               substring(sha256(text), 1, 16) AS short_id
        FROM documents
    """,
    section=SECTION,
)
def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash function surface: md5 and sha256 digests
    (lowercase hex on both engines), a composite-key hash over a
    '|'-joined tuple (the content-addressing idiom every dedup op in
    §2.K keys on), and a truncated digest as a short stable id.
    Deliberately excludes engine-specific hashes (Spark's murmur3
    `hash`, xxhash64) — portability across engines IS the property a
    content-addressed pipeline needs, and the oracle proves it
    bit-for-bit. Map-only, whole-stage codegen, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.md5(F.concat_ws("|", "lang", "source", "text")).alias("key_hash"),
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("short_id"),
    )


@register(
    "fn_format_suite",
    oracle="""
        SELECT p_partkey,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
               rpad(p_brand, 12, '.') AS brand_padded,
               translate(p_brand, '#', '-') AS brand_dashed,
               repeat('*', CAST(p_size % 5 AS INT)) AS size_stars,
               reverse(substring(p_name, 1, 8)) AS name_rev8,
               printf('%.2f', p_retailprice) AS price_fmt,
               printf('%08.2f|%d', p_retailprice, p_size) AS audit_line
        FROM part
    """,
    section=SECTION,
)
def fn_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String FORMATTING surface — the render-side scalar family
    (fn_string_suite covers the parse side): zero-padded fixed-width
    keys (lpad — the join-key normalization trick for legacy
    fixed-width feeds), rpad column alignment, translate character
    mapping, repeat, reverse, and C-style printf/format_string
    rendering including width/zero-fill flags — the formatter every
    log emitter and report sink leans on. All JVM codegen, map-only;
    printf format strings behave identically across engines (the
    ingest_logfmt oracle already pins '%.2f')."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias(
            "size_stars"
        ),
        F.reverse(F.substring("p_name", 1, 8)).alias("name_rev8"),
        F.format_string("%.2f", "p_retailprice").alias("price_fmt"),
        F.format_string("%08.2f|%d", "p_retailprice", "p_size").alias(
            "audit_line"
        ),
    )


@register(
    "fn_timezone_suite",
    oracle="""
        SELECT event_id,
               strftime(ts + INTERVAL 330 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS ist_time,
               strftime(ts - INTERVAL 8 HOUR,
                        '%Y-%m-%d %H:%M:%S') AS pst_time,
               CAST(EXTRACT(hour FROM ts + INTERVAL 330 MINUTE)
                    AS BIGINT) AS ist_hour,
               CAST(ts + INTERVAL 330 MINUTE AS DATE)
                   <> CAST(ts AS DATE) AS date_rolls_over
        FROM events
    """,
    section=SECTION,
)
def fn_timezone_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone shifting — the "what time was that for the user"
    surface: UTC event timestamps rendered in fixed-offset zones
    (+05:30 India, -08:00 Pacific-standard) via from_utc_timestamp,
    plus the derived local hour and a date-rollover flag (the boundary
    where a UTC event lands on a different LOCAL calendar day — the
    classic daily-aggregation-by-wrong-zone bug, made explicit).
    Fixed offsets, not named zones: named-zone arithmetic depends on
    the engines' bundled tzdata editions agreeing on historical DST —
    a cross-engine hash must not bet on that; the oracle mirrors with
    plain interval arithmetic, which IS the fixed-offset semantics.
    Map-only JVM codegen."""
    ev = load_table(spark, sf_dir, "events")
    ist = F.from_utc_timestamp("ts", "+05:30")
    pst = F.from_utc_timestamp("ts", "-08:00")
    return ev.select(
        "event_id",
        ts_str(ist).alias("ist_time"),
        ts_str(pst).alias("pst_time"),
        F.hour(ist).cast("bigint").alias("ist_hour"),
        (ist.cast("date") != F.col("ts").cast("date")).alias(
            "date_rolls_over"
        ),
    )


@register(
    "fn_collation_suite",
    oracle="""
        WITH words AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0
                        THEN upper(regexp_extract(text, '^[A-Za-z]+'))
                        ELSE regexp_extract(text, '^[A-Za-z]+') END AS wm
            FROM documents
        )
        SELECT lower(wm) AS key,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE lower(wm) LIKE 'th%') AS BIGINT)
                   AS n_prefix_th,
               CAST(COUNT(*) FILTER (WHERE lower(wm) = 'the') AS BIGINT)
                   AS n_eq_the
        FROM words
        GROUP BY lower(wm)
        ORDER BY n_docs DESC, key
    """,
    section=SECTION,
)
def fn_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: UTF8_LCASE grouping, equality, and
    prefix matching evaluated ON THE COLLATED TYPE — no lower()
    normalization on the Spark side. Leading words of documents are
    case-mangled deterministically (even doc_ids uppercased), then
    grouped and probed under ``collate(w, 'UTF8_LCASE')``; the
    engine's collation-aware hash/compare does the case folding
    inside codegen, which at 100 TB means the groupBy shuffle
    partitions case variants of the same word to the SAME reducer —
    semantics lower() would replicate but collation gets natively,
    including for ordering and join keys. The group representative of
    a collated key is whichever variant is encountered first
    (nondeterministic under parallelism), so the emitted key is
    min(lower(w)) — identical across members of an ASCII lcase group
    — never the raw collated value. Oracle mirrors with explicit
    lower() on every comparison, pinning that collated semantics ≡
    casefold semantics for this corpus."""
    w = F.regexp_extract(F.col("text"), "^[A-Za-z]+", 0)
    docs = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 2 == 0, F.upper(w)).otherwise(w).alias("wm")
    )
    cw = F.collate(F.col("wm"), "UTF8_LCASE")
    return (
        docs.select(
            cw.alias("cw"),
            cw.startswith(F.lit("th")).alias("is_th"),
            (cw == F.lit("the")).alias("is_the"),
        )
        .groupBy("cw")
        .agg(
            F.min(F.lower(F.col("cw"))).alias("key"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_th").cast("bigint")).alias("n_prefix_th"),
            F.sum(F.col("is_the").cast("bigint")).alias("n_eq_the"),
        )
        .select("key", "n_docs", "n_prefix_th", "n_eq_the")
        .orderBy(F.col("n_docs").desc(), "key")
    )


@register(
    "fn_interval_suite",
    oracle="""
        WITH d_ AS (
            SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
                   DATE '1998-01-01' AS ref
            FROM orders
        )
        SELECT o_orderkey,
               strftime(d, '%Y-%m-%d') AS order_day,
               strftime(CAST(d + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d')
                   AS plus_2m,
               strftime(last_day(d), '%Y-%m-%d') AS eom,
               strftime(CAST(date_trunc('quarter', d) AS DATE), '%Y-%m-%d')
                   AS q_start,
               strftime(CAST(d + INTERVAL 45 DAY AS DATE), '%Y-%m-%d')
                   AS plus_45d,
               CAST(datediff('day', d, ref) AS INT) AS days_to_ref,
               ROUND((12 * (year(ref) - year(d)) + (month(ref) - month(d)))
                     + CASE WHEN day(ref) = day(d)
                                 OR (ref = last_day(ref) AND d = last_day(d))
                            THEN 0
                            ELSE (day(ref) - day(d)) / 31.0 END,
                     6) AS months_to_ref
        FROM d_
    """,
    section=SECTION,
)
def fn_interval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic suite: add_months month-end
    clamping (Jan 31 + 1 month = Feb 29), last_day, quarter
    date_trunc, fixed-day interval addition, day diffs, and
    months_between against a reference date. The interesting parity
    target is months_between: Spark's rule (integer months when the
    day-of-month matches or both dates are month-ends, else a /31
    day fraction) is mirrored in the oracle as EXPLICIT arithmetic —
    pinning the semantics rather than trusting a same-named function
    (DuckDB has none). All expressions are JVM codegen map-only over
    one pruned (o_orderkey, o_orderdate) scan; at 100 TB this is a
    pure narrow stage with zero shuffle. Dates are emitted as
    formatted strings so the driver gate compares calendar values,
    not engine-local date encodings; the fraction is 6-dp rounded
    inside Spark's own 8-dp months_between rounding so both engines
    agree."""
    ref = F.lit("1998-01-01").cast("date")
    d = F.col("o_orderdate").cast("date")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias(
            "q_start"
        ),
        F.date_format(F.date_add(d, 45), "yyyy-MM-dd").alias("plus_45d"),
        F.datediff(ref, d).alias("days_to_ref"),
        F.round(F.months_between(ref, d), 6).alias("months_to_ref"),
    )
