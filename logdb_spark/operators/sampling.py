"""Deterministic sampling & dataset-split operators (SURVEY.md §2.K).

A training-data pipeline cannot use engine randomness for splits:
``df.sample`` draws per-partition, so the selected set changes with
partitioning, retries, and cluster size — a re-run of a 100 TB job
would silently move documents between train and test. Every operator
here keys off ``md5(doc_id)`` instead:

- **Stable**: the same document lands in the same split on any
  cluster, any partitioning, any engine (md5 is bit-identical in
  Spark and DuckDB, which is what makes these ops hash-checkable).
- **Consistent**: the p% sample is a superset of the q% sample for
  q < p (threshold on the same key), so growing a sample never
  discards previously-selected documents.
- **Map-only where possible**: split/fold assignment touches each row
  once with no shuffle; the exact-k variants shuffle only on the
  stratum key or use top-k selection, never a global sort.

Hex-prefix thresholds are used instead of hash-to-int conversion
because lexicographic order on a fixed-length lowercase hex prefix
equals numeric order — portable across engines with no bigint
parsing. Two hex chars give 256 uniform buckets: 'cc' end-exclusive
≈ 204/256 = 79.7% train, 'e6' ≈ 230/256 → 10.2% val, rest test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logdb_spark.functions.ranking import bounded_global_window
from logdb_spark.operators.llm import _BPE_DOC_SQL
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.K sampling"

# end-exclusive hex-prefix upper bounds on the first 2 hash chars
_TRAIN_UB = "cc"  # 204/256 ≈ 79.7 %
_VAL_UB = "e6"  # next 26/256 ≈ 10.2 %; remainder ≈ 10.1 % test


def _hash_key(col: str = "doc_id"):
    """Stable per-row sampling key: md5 of the decimal-string id."""
    return F.md5(F.col(col).cast("string"))


@register(
    "sample_split_hash",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_UB}'
                         THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_UB}'
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    section=SECTION,
)
def sample_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10) by hash
    prefix. Map-only — no shuffle, no state; at 100 TB this is a
    projection fused into whatever scan precedes it, and the split is
    reproducible byte-for-byte on any cluster layout."""
    key2 = F.substring(_hash_key(), 1, 2)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(key2 < _TRAIN_UB, "train")
        .when(key2 < _VAL_UB, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "sample_kfold_assign",
    oracle="""
        SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3') THEN 0
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('4','5','6','7') THEN 1
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('8','9','a','b') THEN 2
                    ELSE 3 END AS fold,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
    section=SECTION,
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-fold cross-validation assignment by hash nibble, summarized
    per fold. The first hex char's 16 values map onto 4 folds by
    range — exact quarters of the hash space, no integer parsing, so
    the fold function is portable to any engine that can md5. The
    per-fold rollup keeps the gate output bounded (4 rows) while
    pinning both the assignment and the volume balance."""
    k1 = F.substring(_hash_key(), 1, 1)
    fold = (
        F.when(k1.isin("0", "1", "2", "3"), 0)
        .when(k1.isin("4", "5", "6", "7"), 1)
        .when(k1.isin("8", "9", "a", "b"), 2)
        .otherwise(3)
    )
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(fold.alias("fold"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "sample_stratified_topk",
    oracle="""
        SELECT lang, doc_id
        FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 40
    """,
    section=SECTION,
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sample: the 40 hash-smallest documents of
    each language. Rate-based stratified sampling can't promise exact
    counts; ranking the stable hash key within each stratum does, and
    stays consistent (k+1 extends the k sample). The window partitions
    by ``lang``, so at scale this is one shuffle on the stratum key
    with per-partition top-k — never a global sort. ``doc_id`` breaks
    the (improbable) md5 tie to keep rank deterministic."""
    w = Window.partitionBy("lang").orderBy(_hash_key(), "doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 40)
        .select("lang", "doc_id")
    )


@register(
    "sample_uniform_topk",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT 100
    """,
    section=SECTION,
)
def sample_uniform_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100 uniform sample: the 100 hash-smallest documents
    overall. ORDER BY + LIMIT over the hash key plans as TakeOrdered
    (per-partition top-100, then a 100-row driver merge) — a global
    uniform draw with no global sort and no randomness, reproducible
    across runs and engines."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .orderBy(_hash_key(), "doc_id")
        .limit(100)
    )


_SHARD_CHARS = 20_000  # target payload chars per training shard


@register(
    "sample_shard_budget",
    oracle=f"""
        SELECT doc_id,
               CAST(floor((SUM(n_chars) OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING) - 1) / {_SHARD_CHARS})
                    AS BIGINT) AS shard_id
        FROM documents
    """,
    section=SECTION,
)
def sample_shard_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced training-shard manifest: documents packed into
    shards of ~20k payload chars, in hash order (hash order = a
    deterministic uniform shuffle, so shards are i.i.d. slices — what
    a dataloader wants). shard_id = floor((running_chars - 1) / budget)
    over the hash-ordered corpus: an EXACT global prefix sum.

    The oracle computes it with one global window; the Spark plan must
    NOT (single-partition sort = the scale-killer). Two-phase instead:
    each doc hashes into one of 16 ordered buckets (first hash hex
    char), the running sum is windowed WITHIN each bucket, and the 16
    bucket totals cumsum into per-bucket offsets (a 16-row bounded
    global window — the same documented-bounded pattern as
    log_rate_spike) broadcast back. offset + within-bucket sum is the
    exact global prefix sum with only bucket-local sorts — the
    standard distributed scan pattern, integer-exact at any scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        _hash_key().alias("hkey"),
        F.substring(_hash_key(), 1, 1).alias("bucket"),
    )
    win_in = (
        Window.partitionBy("bucket")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("cum_in", F.sum("n_chars").over(win_in))
    totals = d.groupBy("bucket").agg(F.sum("n_chars").alias("btotal"))
    # 16-row bounded global cumsum -> exclusive per-bucket offsets.
    win_b = bounded_global_window(
        "bucket", max_rows=16,
        why="one row per shard bucket (fixed 16-way split)",
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = totals.select(
        "bucket",
        (F.sum("btotal").over(win_b) - F.col("btotal")).alias("offset"),
    )
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            F.floor((F.col("offset") + F.col("cum_in") - 1) / _SHARD_CHARS)
            .cast("bigint")
            .alias("shard_id"),
        )
    )


_ES_K = 200  # sample size for the weighted draw


@register(
    "sample_importance_weighted",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8) AS BIGINT) + 0.5)
                      / 4294967296.0) / n_chars AS es_key
            FROM documents
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               ROUND(es_key, 6) AS es_key
        FROM keyed
        ORDER BY es_key DESC, doc_id
        LIMIT {_ES_K}
    """,
    section=SECTION,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    A-Res: each doc draws a deterministic uniform u from its md5 and
    scores ``ln(u)/w`` (equivalent to ranking u^{{1/w}}); the top-k
    scores ARE a weighted sample, here weighted by document length —
    how a pipeline over-samples long/high-quality documents with a
    single scan and zero coordination.

    Scale: the score is a map-only projection off the same md5 key
    every sampling op uses (deterministic across clusters and
    engines); selection is top-k (TakeOrderedAndProject: per-partition
    heaps + driver merge of k rows), never a global sort. The uniform
    is (hash32 + 0.5)/2^32 — strictly inside (0,1), so ln() is finite;
    weights are n_chars ≥ 1 by fixture construction. ln() last-ulp
    differences across engines cannot reorder draws: scores are
    continuous with gaps ≫ 1 ulp at the k-boundary."""
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(F.substring(_hash_key(), 1, 8), 16, 10).cast("bigint")
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    es = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.round(es, 6).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(_ES_K)
    )


@register(
    "sample_balanced_classes",
    oracle="""
        WITH m AS (
            SELECT MIN(n) AS min_n FROM (
                SELECT COUNT(*) AS n FROM events GROUP BY event_type)
        ), ranked AS (
            SELECT event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ) AS rn
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_kept,
               CAST(SUM(event_id) AS BIGINT) AS kept_id_sum
        FROM ranked CROSS JOIN m
        WHERE rn <= min_n
        GROUP BY event_type
    """,
    section=SECTION,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling — every class capped at the rarest
    class's count, the standard rebalance before training a classifier
    on skewed labels: rank the stable md5 key within each class, keep
    rank ≤ min-class-count (deterministic, consistent under
    extension — the same discipline as sample_stratified_topk; rate-
    based sampling cannot promise exact per-class counts). The kept
    set is pinned by per-class id checksums. One bounded (class)
    shuffle + a 5-value driver scalar for the cap; per-class window
    partitions carry one class each."""
    ev = load_table(spark, sf_dir, "events")
    min_n = (
        ev.groupBy("event_type")
        .count()
        .agg(F.min("count"))
        .first()[0]  # driver-scalar: one integer (rarest class size)
    )
    w = Window.partitionBy("event_type").orderBy(
        _hash_key("event_id"), "event_id"
    )
    return (
        ev.select(
            "event_type", "event_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= min_n)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("event_id").cast("bigint").alias("kept_id_sum"),
        )
    )


@register(
    "sample_leakage_safe_split",
    oracle="""
        WITH assigned AS (
            SELECT user_id, event_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
                             < 'cc' THEN 'train'
                        WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 2)
                             < 'e6' THEN 'val'
                        ELSE 'test' END AS split
            FROM events
        )
        SELECT split,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               TRUE AS no_user_leakage
        FROM assigned GROUP BY split
    """,
    section=SECTION,
)
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split — by USER, not by row: every
    event of a user lands in the same split (keying the md5 on
    user_id — rows from one entity straddling train and test is the
    classic evaluation leak), ~80/10/10 by hash prefix, byte-
    reproducible on any cluster layout. no_user_leakage is computed
    in-plan (count of users appearing in >1 split must be zero), not
    assumed. Map-only assignment + one bounded (split) agg."""
    ev = load_table(spark, sf_dir, "events")
    key2 = F.substring(F.md5(F.col("user_id").cast("string")), 1, 2)
    split = (
        F.when(key2 < "cc", "train").when(key2 < "e6", "val").otherwise("test")
    )
    assigned = ev.select("user_id", "event_id", split.alias("split"))
    leaks = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )  # driver-scalar: one integer (must be 0)
    return assigned.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.lit(leaks == 0).alias("no_user_leakage"),
    )


# Poisson(1) CDF breakpoints scaled to the first 4 hex chars (16 bits)
# of the per-(row, replicate) md5 — end-exclusive upper bounds, so the
# draw count is a pure hex-string comparison on both engines.
_POIS_UB = ("5e2d", "bc5a", "eb71", "fb23", "ff10")  # k = 0..4, else 5


@register(
    "sample_poisson_bootstrap",
    oracle=f"""
        WITH draws AS (
            SELECT event_type, value,
                   substring(md5(concat_ws('_',
                       CAST(event_id AS VARCHAR), CAST(b AS VARCHAR))),
                       1, 4) AS h,
                   CAST(b AS INT) AS replicate
            FROM events, unnest(range(0, 3)) AS t(b)
        ), weighted AS (
            SELECT event_type, replicate, value,
                   CASE WHEN h < '{_POIS_UB[0]}' THEN 0
                        WHEN h < '{_POIS_UB[1]}' THEN 1
                        WHEN h < '{_POIS_UB[2]}' THEN 2
                        WHEN h < '{_POIS_UB[3]}' THEN 3
                        WHEN h < '{_POIS_UB[4]}' THEN 4
                        ELSE 5 END AS k
            FROM draws
        )
        SELECT event_type, replicate,
               CAST(SUM(k) AS BIGINT) AS n_drawn,
               CAST(ROUND(SUM(k * CAST(value AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS boot_total
        FROM weighted GROUP BY event_type, replicate
    """,
    section=SECTION,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap: B=3 resample replicates of the per-type value
    total in ONE pass — the only bootstrap that works at 100 TB,
    because Poisson(1) draw counts per (row, replicate) are independent
    of n, so no resampled copy of the data ever materializes (classic
    streaming-bootstrap construction). Replicate spread estimates the
    total's sampling variance.

    Determinism: the draw count comes from hex-prefix comparisons on
    md5(event_id, replicate) against Poisson(1) CDF breakpoints
    pre-scaled to 16 bits — no floats until the final decimal-exact
    weighted sum is rounded. The 3x fan-out is a map-side explode;
    the single shuffle groups on (type x replicate), a 15-key space."""
    ev = load_table(spark, sf_dir, "events")
    draws = ev.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("b"),
        "event_id",
    ).select(
        "event_type",
        "value",
        F.col("b").cast("int").alias("replicate"),
        F.substring(
            F.md5(
                F.concat_ws(
                    "_",
                    F.col("event_id").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            4,
        ).alias("h"),
    )
    k = (
        F.when(F.col("h") < _POIS_UB[0], 0)
        .when(F.col("h") < _POIS_UB[1], 1)
        .when(F.col("h") < _POIS_UB[2], 2)
        .when(F.col("h") < _POIS_UB[3], 3)
        .when(F.col("h") < _POIS_UB[4], 4)
        .otherwise(5)
    )
    from logdb_spark.functions.numeric import dec4, dround

    return (
        draws.withColumn("k", k)
        .groupBy("event_type", "replicate")
        .agg(
            F.sum("k").alias("n_drawn"),
            dround(F.sum(F.col("k") * dec4("value"))).alias("boot_total"),
        )
    )


@register(
    "sample_temporal_split",
    oracle="""
        WITH es AS (
            SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
        ), cut AS (
            SELECT quantile_disc(es, 0.8) AS t80 FROM es
        )
        SELECT CASE WHEN es <= t80 THEN 'train'
                    WHEN es <= t80 + 3600 THEN 'embargo'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_events,
               MIN(es) AS first_es,
               MAX(es) AS last_es,
               TRUE AS no_time_leakage
        FROM es, cut
        GROUP BY 1
    """,
    section=SECTION,
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an embargo gap — the time-series
    evaluation discipline (walk-forward CV): train is everything up to
    the exact 80th-percentile timestamp (quantile_DISC — an actual
    observed second, so the boundary is a real data point, identical
    on both engines), then a one-hour embargo absorbs the
    serially-correlated boundary (rows there belong to NEITHER split
    — the leak window where labels of train-adjacent rows overlap
    test features), and test is strictly after. no_time_leakage is
    computed in-plan: max(train) ≤ t80 < t80+3600 < min(test).

    Scale shape: one exact-percentile pass to a 1-row cutoff
    broadcast, then a map-only split tag + 3-key agg. No global
    sort; the discrete quantile is Spark's sort-free
    percentile machinery."""
    es = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("es")
    )
    cut = es.agg(
        F.expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY es)")
        .cast("long")
        .alias("t80")
    )
    tagged = es.crossJoin(F.broadcast(cut)).select(
        "es",
        "t80",
        F.when(F.col("es") <= F.col("t80"), "train")
        .when(F.col("es") <= F.col("t80") + 3600, "embargo")
        .otherwise("test")
        .alias("split"),
    )
    per = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("es").alias("first_es"),
        F.max("es").alias("last_es"),
        F.first("t80").alias("t80"),
    )
    leak_ok = (
        F.when(F.col("split") == "train", F.col("last_es") <= F.col("t80"))
        .when(
            F.col("split") == "embargo",
            (F.col("first_es") > F.col("t80"))
            & (F.col("last_es") <= F.col("t80") + 3600),
        )
        .otherwise(F.col("first_es") > F.col("t80") + 3600)
    )
    return per.select(
        "split", "n_events", "first_es", "last_es",
        leak_ok.alias("no_time_leakage"),
    )


def _cluster_safe_oracle() -> str:
    from logdb_spark.operators.llm import _CLUSTER_ORACLE

    return f"""
        WITH base AS ({_CLUSTER_ORACLE})
        SELECT doc_id, canonical_id,
               CASE WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 2)
                         < '{_TRAIN_UB}' THEN 'train'
                    WHEN substring(md5(CAST(canonical_id AS VARCHAR)), 1, 2)
                         < '{_VAL_UB}' THEN 'val'
                    ELSE 'test' END AS split
        FROM base
    """


@register(
    "sample_cluster_safe_split",
    oracle=_cluster_safe_oracle(),
    section=SECTION,
)
def sample_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split (r8): hash-split on the
    near-dup CLUSTER's canonical id instead of the document id, so a
    document and all its near-duplicates land in the SAME split — the
    contamination sample_split_hash cannot prevent (a J≥0.9 rewrite of
    a training doc in the test set is eval leakage exactly like a time
    leak, which sample_leakage_safe_split handles for entities).

    Composition of two existing kernels: dedup_cluster_assign's
    connected components (auto pair source — LSH-banded above the
    crossover, so the pair step is linear in dup density at scale)
    followed by sample_split_hash's md5-prefix thresholds applied to
    canonical_id — map-only after the components exist. At 100 TB the
    components are computed once per corpus snapshot and the split is
    a projection; the ~80/10/10 ratios now hold over CLUSTERS (every
    member inherits its canonical's bucket), which is the statistically
    honest unit when duplicates exist. A leakage test pins that no
    verified dup pair ever straddles splits."""
    from logdb_spark.operators.llm import dedup_cluster_assign

    clusters = dedup_cluster_assign(spark, sf_dir)
    key2 = F.substring(
        F.md5(F.col("canonical_id").cast("string")), 1, 2
    )
    return clusters.select(
        "doc_id",
        "canonical_id",
        F.when(key2 < _TRAIN_UB, "train")
        .when(key2 < _VAL_UB, "val")
        .otherwise("test")
        .alias("split"),
    )


def _dedup_weights_oracle() -> str:
    from logdb_spark.operators.llm import _CLUSTER_ORACLE

    return f"""
        WITH base AS ({_CLUSTER_ORACLE}),
        sz AS (
            SELECT canonical_id, COUNT(*) AS cluster_size
            FROM base GROUP BY canonical_id
        )
        SELECT b.doc_id, b.canonical_id, s.cluster_size,
               ROUND(1.0 / s.cluster_size, 6) AS weight
        FROM base b JOIN sz s USING (canonical_id)
    """


@register(
    "sample_dedup_weights",
    oracle=_dedup_weights_oracle(),
    section=SECTION,
)
def sample_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware training weights (r9): weight = 1/|cluster| of
    the document's near-dup cluster, so a passage that exists as ten
    J≥0.9 rewrites contributes ONE document's worth of gradient signal
    instead of ten — the soft alternative to dropping duplicates
    outright (dedup_keep_best) when near-dups still carry stylistic
    variation worth training on. Deduplication-by-downweighting is the
    standard middle ground in large-corpus training recipes.

    Composition of existing kernels: dedup_cluster_assign's connected
    components (LSH-banded pair source above the crossover — linear in
    dup density at scale), then one bounded-key aggregation
    (cluster sizes: |clusters| ≤ |docs| keys) and a map-side weight
    projection. At 100 TB the components are computed once per corpus
    snapshot and the weight column is a join-project — the same
    amortization argument as sample_cluster_safe_split, with which
    this shares the cluster relation. Weight is ROUND(1/size, 6) on
    both engines (IEEE division of 1.0 by a small exact integer, then
    the shared 6-dp grid — no tie cases at these denominators)."""
    from logdb_spark.functions.numeric import ratio
    from logdb_spark.operators.llm import dedup_cluster_assign

    clusters = dedup_cluster_assign(spark, sf_dir)
    sizes = clusters.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.join(sizes, "canonical_id").select(
        "doc_id",
        "canonical_id",
        "cluster_size",
        ratio(F.lit(1.0) / F.col("cluster_size")).alias("weight"),
    )


def _pack_oracle(tok_expr: str, source_cte: str) -> str:
    """Shared packing-oracle tail (compose after a WITH + source CTE):
    shard by md5(doc_id) mod 8, order within shard by (md5 key,
    doc_id), pack = tokens-before // 512."""
    return f"""
        o AS (
            SELECT doc_id, {tok_expr} AS n_tok,
                   md5(CAST(doc_id AS VARCHAR)) AS k
            FROM {source_cte}
        ), s AS (
            SELECT doc_id, n_tok, k,
                   CAST(('0x' || substring(k, 1, 4))::VARCHAR AS BIGINT)
                       % 8 AS shard
            FROM o
        ), c AS (
            SELECT shard, n_tok,
                   COALESCE(SUM(n_tok) OVER (
                       PARTITION BY shard ORDER BY k, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS tok_before
            FROM s
        )
        SELECT shard, CAST(tok_before // 512 AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum
        FROM c GROUP BY shard, pack_id
    """


def _pack_by_tokens(df: DataFrame) -> DataFrame:
    """Shared Spark packing tail over (doc_id, n_tok) rows — the
    sample_pack_sequences machinery, parameterized on the budget
    column so the whitespace and BPE variants cannot drift."""
    d = df.select("doc_id", "n_tok", _hash_key().alias("k"))
    shard = (
        F.conv(F.substring("k", 1, 4), 16, 10).cast("bigint") % 8
    ).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select("doc_id", "n_tok", shard, "k").select(
        "shard",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_before"),
    )
    return (
        c.groupBy(
            "shard",
            F.floor(F.col("tok_before") / 512).alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
        )
    )


@register(
    "sample_pack_sequences",
    # Same tokenization as the Spark side (whitespace split), same
    # shard key (first 4 md5 hex chars of the decimal doc_id as an
    # integer, mod 8), same deterministic within-shard order
    # (md5 key, then doc_id), same sequential-fill rule
    # (pack = floor(tokens-before-this-doc / 512)).
    oracle="""
        WITH d AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),"""
    + _pack_oracle("n_tok", "d"),
    section=SECTION,
)
def sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training (r9): bin documents into
    fixed-token-budget packs (L = 512) by sequential fill — each doc
    goes to pack floor(tokens_before / L) within its shard — the
    standard pre-tokenization packing pass that turns a ragged corpus
    into near-constant-length training examples (padding waste shows
    up as packs whose tok_sum ≠ L neighborhood; the per-pack rows ARE
    the packing manifest a downstream tokenizer consumes).

    The 100 TB shape is the point: packing is inherently sequential,
    so make the sequence PER SHARD — shard = md5(doc_id) mod 8 (a
    deterministic repartition key), order within shard by the same
    md5 key. The plan is one hash exchange on shard + an in-partition
    window sort — NO global sort, and shards pack embarrassingly in
    parallel (S scales with the cluster; the fixture pins S=8,
    L=512). The prefix-sum window (tokens before this doc) is the
    only stateful step and it is per-shard. Deterministic by
    construction: same corpus → same packs on any partitioning,
    which is what makes a packing manifest reproducible
    (and hash-checkable against DuckDB's window machinery)."""
    return _pack_by_tokens(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tok")
        )
    )


@register(
    "sample_pack_sequences_bpe",
    # The tokenizer fragment IS text_bpe_tokenize's oracle (imported,
    # not copied), so the packing oracle can never drift from the
    # tokenizer oracle; the packing tail IS sample_pack_sequences'.
    oracle="WITH " + _BPE_DOC_SQL + ","
    + _pack_oracle("tok_bpe", "bpe_docs"),
    section=SECTION,
)
def sample_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted in SUBWORD tokens (r10, VERDICT r9
    item #4): identical shard/order/fill machinery to
    sample_pack_sequences (shared helper — one definition, two budget
    bases), but each document costs its text_bpe_tokenize tok_bpe
    count instead of its whitespace count. Whitespace budgets
    under-fill real packs by the subword expansion factor (~1.7× on
    the fixtures, pytest-pinned band); budgeting in the same units the
    trainer consumes is what makes the 512-token packs honest.

    Scale: the tokenizer stage adds its vocabulary-sized learning pass
    (see bpe_doc_tokens); packing itself stays one hash exchange on
    shard + an in-partition window — no global sort."""
    from logdb_spark.operators.llm import bpe_doc_tokens

    return _pack_by_tokens(
        bpe_doc_tokens(spark, sf_dir).select(
            "doc_id", F.col("tok_bpe").alias("n_tok")
        )
    )
