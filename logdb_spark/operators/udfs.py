"""§2.L — UDF / UDAF / UDTF surface.

The escape hatches, demonstrated deliberately and ranked by cost:
- plain @udf: row-at-a-time Python, pickled per row — the SLOW path,
  declared once for surface parity (oracle re-expresses it as SQL CASE
  to prove the logic belongs JVM-side when possible);
- @pandas_udf: Arrow-batched, vectorized — 10-100× the plain path;
- applyInPandas: grouped UDAF over Arrow batches;
- @udtf: table function emitting variable rows per input row.
At 100 TB only the Arrow paths are acceptable, and only where built-in
functions genuinely cannot express the computation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from logdb_spark.functions.numeric import ratio
from logdb_spark.registry import register
from logdb_spark.sources.load import load_table

SECTION = "2.L udf surface"


@register(
    "udf_python_scalar",
    oracle="""
        SELECT event_id,
               CASE WHEN event_type = 'error' AND value >= 300 THEN 'critical'
                    WHEN event_type = 'error'                  THEN 'high'
                    WHEN value >= 400                          THEN 'elevated'
                    ELSE 'normal' END AS severity
        FROM events
    """,
    section=SECTION,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python severity classifier. The oracle is a SQL
    CASE — the point of the pairing: this logic never needed Python."""

    @F.udf(returnType=StringType())
    def severity(event_type: str, value: float) -> str:
        if event_type == "error":
            return "critical" if value >= 300 else "high"
        return "elevated" if value >= 400 else "normal"

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", severity("event_type", "value").alias("severity"))


@register(
    "udf_pandas_vectorized",
    oracle="""
        WITH stats AS (
            SELECT event_id, value,
                   AVG(value)         OVER (PARTITION BY event_type) AS m,
                   STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS s
            FROM events
        )
        SELECT event_id, ROUND((value - m) / s, 6) AS zscore
        FROM stats
    """,
    section=SECTION,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized z-score: group stats computed JVM-side via
    window, the normalization itself in a pandas_udf over whole
    batches — the pattern for numeric Python that must run at scale."""

    @F.pandas_udf(DoubleType())
    def zscore(v: pd.Series, m: pd.Series, s: pd.Series) -> pd.Series:
        return (v - m) / s

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    withstats = ev.select(
        "event_id",
        "value",
        F.avg("value").over(w).alias("m"),
        F.stddev_samp("value").over(w).alias("s"),
    )
    return withstats.select(
        "event_id", ratio(zscore("value", "m", "s")).alias("zscore")
    )


@register(
    "udaf_pandas_group",
    oracle="""
        WITH e AS (
            SELECT user_id, value, date_trunc('second', ts) AS ts
            FROM events
        ), gaps AS (
            SELECT user_id, value, ts,
                   epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts)) AS gap
            FROM e
        )
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                   AS mean_value,
               CAST(MAX(gap) AS BIGINT) AS max_gap_s
        FROM gaps GROUP BY user_id
    """,
    section=SECTION,
)
def udaf_pandas_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas: per-user count / mean / max
    inter-event gap. Each group arrives as one pandas frame (Arrow);
    shuffle is on user_id only. Mean uses a sorted-order sum so the
    result is deterministic regardless of arrival order."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import Decimal

        import numpy as np

        # numpy end-to-end (r13, guide §4.2): sort the int64 epoch-ns
        # vector instead of sort_values on the whole frame, diff in
        # numpy — the per-group pandas machinery was ~2× the
        # arithmetic itself across ~2k groups.
        ts = np.sort(pdf["ts"].to_numpy().astype("int64")) // 1_000_000_000
        max_gap = (ts[1:] - ts[:-1]).max() if len(ts) > 1 else None
        # Exact sum then ONE double division: bit-identical to the
        # oracle's SUM(DECIMAL)::DOUBLE / COUNT regardless of arrival
        # order, so no rounding is needed (and round(double) near
        # half-boundaries is engine-specific anyway). Inputs are 2-dp,
        # so integer-cents summation is the exact sum, vectorized.
        cents = (pdf["value"].to_numpy() * 100).round().astype("int64").sum()
        mean = float(Decimal(int(cents)) / Decimal(100)) / len(pdf)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "mean_value": [mean],
                "max_gap_s": [int(max_gap) if max_gap is not None else None],
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.date_trunc("second", "ts").alias("ts")
    )
    # Explicit worker-count hash partitioning on the group key (r13,
    # guide §2.5/§4.5): AQE's bytes-based coalescing shrank this ~2 MB
    # shuffle to ONE partition, serializing every per-user pandas
    # group through a single Python worker (profiled: one 4.3 s
    # single-task job was the whole op). A grouped-UDF stage is
    # CPU-bound in Python, so its parallelism must track cores, not
    # shuffle bytes; the explicit repartition satisfies the groupBy's
    # required distribution (no second exchange) and AQE never
    # coalesces a user-specified partition count. The same sizing —
    # cluster parallelism, not bytes — is what a 100 TB run wants for
    # a Python-bound stage.
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    return ev.groupBy("user_id").applyInPandas(
        summarize, "user_id bigint, n_events bigint, mean_value double, max_gap_s bigint"
    )


# Hard bound on the per-user event history fed to the session UDTF —
# caps both the collect_list aggregation buffer and the single-row UDTF
# input (64 KiB of longs ≈ 0.5 MB/row worst case). Far above any
# fixture user; documented truncation, not OOM, for hot keys at scale.
MAX_EVENTS_PER_USER = 65536


@register(
    "udtf_explode_sessions",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, date_trunc('second', ts) AS ts FROM events
        ), flagged AS (
            SELECT user_id, ts,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT user_id, CAST(sid - 1 AS BIGINT) AS session_idx,
               COUNT(*) AS n_events,
               CAST(epoch(MAX(ts)) - epoch(MIN(ts)) AS BIGINT) AS duration_s
        FROM numbered GROUP BY user_id, sid
    """,
    section=SECTION,
)
def udtf_explode_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row per user
    (sorted event epochs, capped at MAX_EVENTS_PER_USER), variable
    session rows out — the UDTF shape. Matches log_sessionize_gap's
    semantics; the window composition over there is the scale path,
    this is the surface-parity demo."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, session_idx bigint, n_events bigint, duration_s bigint")
    class ExplodeSessions:
        def eval(self, user_id: int, epochs: list):
            if not epochs:
                return
            epochs = sorted(epochs)
            start = prev = epochs[0]
            idx, n = 0, 0
            for t in epochs:
                if t - prev > 1800:
                    yield user_id, idx, n, prev - start
                    idx, n, start = idx + 1, 0, t
                n += 1
                prev = t
            yield user_id, idx, n, prev - start

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_trunc("second", "ts").cast("long").alias("epoch_s"),
    )
    # Bound per-user state BEFORE the collect: rank events in a window
    # (sort-based, spillable) and keep at most MAX_EVENTS_PER_USER, so
    # the collect_list buffer and the UDTF input row are both capped —
    # a hot key can no longer accumulate its whole history into one row.
    # Fixture users are far below the cap, so output (and the oracle)
    # are unchanged; at 100 TB a user beyond the cap gets its oldest
    # events truncated, which the cap makes an explicit, documented
    # bound instead of an OOM.
    w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
    arrs = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_EVENTS_PER_USER)
        .groupBy("user_id")
        .agg(F.collect_list("epoch_s").alias("epochs"))
    )
    arrs.createOrReplaceTempView("v_user_epochs")
    spark.udtf.register("explode_sessions", ExplodeSessions)
    return spark.sql(
        """
        SELECT s.user_id, s.session_idx, s.n_events, s.duration_s
        FROM v_user_epochs, LATERAL explode_sessions(user_id, epochs) s
        """
    )


@register(
    "udtf_parse_keyvals",
    oracle="""
        WITH lines AS (
            SELECT event_id,
                   'type=' || event_type || ';user=' ||
                       CAST(user_id AS VARCHAR) || ';val=' ||
                       printf('%.2f', value) AS line
            FROM events
        )
        SELECT event_id,
               string_split(kv, '=')[1] AS key,
               string_split(kv, '=')[2] AS val
        FROM (SELECT event_id, UNNEST(string_split(line, ';')) AS kv
              FROM lines)
    """,
    section=SECTION,
)
def udtf_parse_keyvals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second UDTF surface: the logfmt parser — one ``k=v;k=v`` line
    in, one (key, value) row out per field, applied LATERALLY so each
    input row fans out independently (the table-function shape regex
    extraction can't give when the field set varies per line). Lines
    are synthesized in-query from events (the no-raw-fixture trick).
    A UDTF runs row-at-a-time in Python — correct for surface parity,
    and the paired oracle (split + unnest, fully relational) is the
    proof the scale path stays JVM-side, exactly like
    udf_python_scalar's CASE-expression twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_id bigint, key string, val string")
    class ParseKeyVals:
        def eval(self, event_id: int, line: str):
            if line is None:
                return
            for kv in line.split(";"):
                if "=" in kv:
                    k, _, v = kv.partition("=")
                    yield event_id, k, v

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("type="), F.col("event_type"),
            F.lit(";user="), F.col("user_id").cast("string"),
            F.lit(";val="), F.format_string("%.2f", "value"),
        ).alias("line"),
    )
    ev.createOrReplaceTempView("v_kv_lines")
    spark.udtf.register("parse_keyvals", ParseKeyVals)
    return spark.sql(
        """
        SELECT s.event_id, s.key, s.val
        FROM v_kv_lines, LATERAL parse_keyvals(event_id, line) s
        """
    )


@register(
    "udf_arrow_scalar",
    oracle="""
        SELECT event_id,
               CAST(floor(value + 0.5) AS BIGINT) % 10 AS value_digit,
               upper(substring(event_type, 1, 1)) || lower(substring(event_type, 2))
                   AS type_title
        FROM events
    """,
    section=SECTION,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized plain Python UDF (`useArrow=True`, Spark 4) —
    the MIDDLE rung between pickled row-at-a-time and pandas_udf:
    same scalar-function authoring model as @udf, but arguments cross
    the boundary as Arrow batches (one serialization per batch, not
    per row). The function body still runs per-row in Python, so
    pandas_udf's vectorized kernels stay faster — this op exists to
    cover the surface and its oracle (pure SQL arithmetic) again
    proves the logic never needed Python at all."""

    @F.udf(returnType="bigint", useArrow=True)
    def value_digit(value: float) -> int:
        # floor(x+0.5), NOT Python round(): round() is banker's
        # rounding and diverges from SQL's half-away at .5 boundaries
        import math

        return int(math.floor(value + 0.5)) % 10

    @F.udf(returnType=StringType(), useArrow=True)
    def title_case(s: str) -> str:
        return s[:1].upper() + s[1:].lower() if s else s

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        value_digit("value").alias("value_digit"),
        title_case("event_type").alias("type_title"),
    )


@register(
    "udtf_arrow_ngrams",
    oracle="""
        WITH g AS (
            SELECT doc_id,
                   unnest(range(1, length(text) - 1)) AS pos,
                   text
            FROM documents WHERE length(text) >= 3
        )
        SELECT doc_id, substring(text, CAST(pos AS INT), 3) AS trigram,
               COUNT(*) AS n
        FROM g GROUP BY 1, 2
        HAVING COUNT(*) >= 3
    """,
    section=SECTION,
)
def udtf_arrow_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (`useArrow=True`, Spark 4): emits
    every character trigram of a document, downstream-aggregated to
    repeated trigrams (≥3 occurrences — the repetition fingerprint a
    spam filter keys on). The UDTF is the variable-fanout escape hatch
    (one input row → len(text)−2 output rows); Arrow batches the
    emitted rows out. The oracle re-expresses the fanout relationally
    (generate_series positional substring) — proving, as with every
    UDF-surface twin, that the JVM path exists; the UDTF form is
    surface parity. Downstream agg shuffles on (doc, trigram) with
    map-side partials."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, trigram string", useArrow=True)
    class Trigrams:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i in range(len(text) - 2):
                yield doc_id, text[i : i + 3]

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.createOrReplaceTempView("v_tri_docs")
    spark.udtf.register("char_trigrams", Trigrams)
    return spark.sql(
        """
        SELECT t.doc_id, t.trigram, COUNT(*) AS n
        FROM v_tri_docs, LATERAL char_trigrams(doc_id, text) t
        GROUP BY t.doc_id, t.trigram
        HAVING COUNT(*) >= 3
        """
    )


_COGROUP_CUTOFF = "2024-01-16 00:00:00"


@register(
    "udaf_cogroup_pandas",
    oracle=f"""
        WITH a AS (
            SELECT user_id, COUNT(*) AS n_early,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(*) AS mean_early
            FROM events WHERE ts < TIMESTAMP '{_COGROUP_CUTOFF}'
            GROUP BY user_id
        ),
        b AS (
            SELECT user_id, COUNT(*) AS n_late,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(*) AS mean_late
            FROM events WHERE ts >= TIMESTAMP '{_COGROUP_CUTOFF}'
            GROUP BY user_id
        )
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               COALESCE(n_early, 0) AS n_early,
               COALESCE(n_late, 0) AS n_late,
               mean_early, mean_late,
               mean_late - mean_early AS mean_shift
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    section=SECTION,
)
def udaf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInPandas — the two-relation Arrow escape hatch
    (groupBy().cogroup().applyInPandas): each user's early-window and
    late-window event frames arrive TOGETHER as two pandas frames,
    the shape for per-key reconciliation logic too imperative for a
    join (drift checks, schema-divergent comparisons). Here it
    computes the per-user activity drift across a mid-month cutoff:
    counts and exact means per side, plus the mean shift. Shuffle is
    one hash partition per side on user_id — the same single
    co-partitioned exchange a full-outer join would pay, with Arrow
    batch transfer on top (the documented cost of the hatch). A key
    missing on one side arrives as an empty frame and reports n=0 /
    NULL mean, mirroring the oracle's FULL OUTER JOIN semantics.
    Means follow udaf_pandas_group's determinism discipline: inputs
    are 2-dp, so an integer-cents exact sum + ONE double division is
    bit-identical to SUM(DECIMAL)::DOUBLE / COUNT in any arrival
    order — no rounding anywhere, including the subtraction."""
    from decimal import Decimal

    # ts is filter-only: dropping it before the cogroup keeps the
    # Arrow transfer to the two columns compare() actually reads.
    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    cutoff = F.lit(_COGROUP_CUTOFF).cast("timestamp")
    # Worker-count hash partitioning on the cogroup key for BOTH
    # sides (r13 — same fix and rationale as udaf_pandas_group's
    # repartition: AQE's bytes-based coalescing serialized every
    # per-user Python call through one task, a single 3.8 s job).
    par = spark.sparkContext.defaultParallelism
    early = (
        ev.filter(F.col("ts") < cutoff)
        .select("user_id", "value")
        .repartition(par, "user_id")
    )
    late = (
        ev.filter(F.col("ts") >= cutoff)
        .select("user_id", "value")
        .repartition(par, "user_id")
    )

    def exact_mean(pdf: pd.DataFrame):
        if len(pdf) == 0:
            return None
        cents = (pdf["value"].to_numpy() * 100).round().astype("int64").sum()
        return float(Decimal(int(cents)) / Decimal(100)) / len(pdf)

    def compare(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        uid = left["user_id"].iloc[0] if len(left) else right["user_id"].iloc[0]
        me, ml = exact_mean(left), exact_mean(right)
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_early": [len(left)],
                "n_late": [len(right)],
                "mean_early": [me],
                "mean_late": [ml],
                "mean_shift": [
                    ml - me if me is not None and ml is not None else None
                ],
            }
        )

    return (
        early.groupBy("user_id")
        .cogroup(late.groupBy("user_id"))
        .applyInPandas(
            compare,
            "user_id bigint, n_early bigint, n_late bigint, "
            "mean_early double, mean_late double, mean_shift double",
        )
    )


@register(
    "udtf_dynamic_schema",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(ts) >= 1 THEN ts[1] END AS f0,
               CASE WHEN len(ts) >= 2 THEN ts[2] END AS f1,
               CASE WHEN len(ts) >= 3 THEN ts[3] END AS f2
        FROM toks
    """,
    section=SECTION,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF — the Spark 4 `analyze()` contract: the
    function's OUTPUT SCHEMA is computed at plan time from its
    arguments (here, a constant column count), so one registered
    function serves any requested width — the table-function
    equivalent of a prepared statement, and the API a generic
    parse-into-N-fields ingestion helper needs (fixed-width readers,
    delimited splitters, header-driven extracts).

    analyze() receives each argument as an AnalyzeArgument (value
    populated for foldable expressions) and returns the StructType the
    planner binds downstream — schema errors surface at PLAN time, not
    mid-job. The eval fanout is 1:1 here; the oracle re-expresses the
    split relationally (list indexing with out-of-range → NULL,
    matching the Python side's padding). Scale: map-only Arrow-less
    row UDTF — surface parity, with the relational twin proving the
    JVM path (same discipline as udf_python_scalar)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitN:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            width = int(n.value)  # constant-foldable arg, known at plan
            st = StructType()
            for i in range(width):
                st = st.add(f"f{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text, n):
            if text is None:
                # Match the oracle: string_split(NULL) is NULL, so
                # every field is NULL — not [''] (f0 = empty string).
                yield (None,) * n
                return
            toks = text.split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(n)
            )

    spark.udtf.register("split_n_dyn", udtf(SplitN))
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("v_dyn_docs")
    return spark.sql(
        "SELECT v.doc_id, t.f0, t.f1, t.f2"
        " FROM v_dyn_docs v, LATERAL split_n_dyn(text, 3) t"
    )
