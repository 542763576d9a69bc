"""Operator registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here with a name, a
(spark, sf_dir) -> DataFrame callable, and (usually) a DuckDB oracle SQL
string. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin reads
of this registry, so an operator is "declared" exactly when its module
registers it — no drift between code and contract.

Design rule (SURVEY.md §0.2): every float aggregate is rounded the same
way on both sides (helpers in functions/numeric.py), every computed
column is aliased identically in Spark and SQL, and timestamps are
emitted as strings/dates — the driver's order-insensitive value-hash
then compares bit-identical values.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register operators on import. Order follows SURVEY.md §7
# build phases; importing the package wires the whole inventory.
_OPERATOR_MODULES = [
    "logdb_spark.operators.scans",
    "logdb_spark.operators.filters",
    "logdb_spark.operators.joins",
    "logdb_spark.operators.aggs",
    "logdb_spark.operators.windows",
    "logdb_spark.operators.sorts",
    "logdb_spark.operators.setops",
    "logdb_spark.operators.scalars",
    "logdb_spark.operators.logops",
    "logdb_spark.operators.llm",
    "logdb_spark.operators.multimodal",
    "logdb_spark.operators.sampling",
    "logdb_spark.operators.layout",
    "logdb_spark.operators.tableformat",
    "logdb_spark.operators.analytics",
    "logdb_spark.operators.udfs",
    "logdb_spark.streaming.batch_equiv",
]


@dataclass(frozen=True)
class Operator:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver's rows-only check
    section: str  # SURVEY.md §2 subsection, for reporting


_REGISTRY: dict[str, Operator] = {}
_LOADED = False

# Driver-gate coverage rotation, refreshed for round 13 (VERDICT r12
# task #3). The driver correctness report caps at 50 enumeration
# entries per round, so enumeration order IS evidence budget. The
# tuple below is `python -m tools.staleness --tuple` output verbatim
# (stale-first from the CORRECTNESS_r*.json ledger): the two ops born
# in r13 (never sampled, oracles from birth) head the list, then the
# 24 operators whose freshest hash-green driver row is still round 4,
# then the oldest of the r5 bucket. 2 + 24 = 26, so the 50-cap
# samples all of those plus the first 24 r5 ops — after this round no
# operator's driver evidence is older than r5, and one more rotation
# retires the staleness asterisk entirely (the r4 tail ends HERE).
# Regenerate after the r13 report lands.
_R13_NEEDS_ROW_FIRST = (
    "stream_table_cdf_mor",  # never
    "table_delete_cost_router",  # never
    "sink_python_datasource",  # r4
    "sink_sorted_parquet",  # r4
    "sql_q12_priority_shipments",  # r4
    "sql_q13_order_distribution",  # r4
    "sql_q14_promo_revenue",  # r4
    "sql_q15_top_supplier",  # r4
    "sql_q17_small_qty_revenue",  # r4
    "sql_q18_large_orders",  # r4
    "sql_q19_bracket_revenue",  # r4
    "sql_q21_waiting_suppliers",  # r4
    "sql_q22_idle_customers",  # r4
    "sql_q4_order_priority",  # r4
    "sql_q6_forecast_revenue",  # r4
    "sql_q7_volume_shipping",  # r4
    "sql_q8_market_share",  # r4
    "stream_python_datasource",  # r4
    "text_decontaminate",  # r4
    "text_repetition_score",  # r4
    "text_span_dedup",  # r4
    "text_stopword_scrub",  # r4
    "udtf_parse_keyvals",  # r4
    "win_gap_islands",  # r4
    "win_ntile_percent",  # r4
    "win_rolling_median",  # r4
    "agg_bitmap_distinct",  # r5
    "agg_corr_regression",  # r5
    "agg_entropy",  # r5
    "agg_gini_revenue",  # r5
    "agg_histogram_logscale",  # r5
    "agg_skew_kurtosis",  # r5
    "agg_weighted_stats",  # r5
    "dedup_fuzzy_edit",  # r5
    "fn_null_suite",  # r5
    "fn_struct_suite",  # r5
    "fn_try_suite",  # r5
    "fn_url_suite",  # r5
    "fn_variant_json",  # r5
    "ingest_csv_permissive",  # r5
    "ingest_fixed_width",  # r5
    "ingest_multiline_records",  # r5
    "ingest_syslog_priority",  # r5
    "ingest_text_file",  # r5
    "join_asof_forward",  # r5
    "join_bloom_prefilter",  # r5
    "join_lateral_topn",  # r5
    "join_reconciliation_audit",  # r5
    "log_alert_suppress",  # r5
    "log_apdex_score",  # r5
    "log_change_point",  # r5
    "log_cohort_ltv",  # r5
    "log_error_budget_burndown",  # r5
    "log_gap_fill",  # r5
    "log_retention_cohorts",  # r5
    "log_seasonal_baseline",  # r5
    "log_tail_sampling",  # r5
    "log_user_growth_curve",  # r5
    "mm_multipart_assembly",  # r5
    "sample_importance_weighted",  # r5
)


def _enumeration_order(ops: dict[str, Operator]) -> list[str]:
    priority = {n: i for i, n in enumerate(_R13_NEEDS_ROW_FIRST)}
    # Stable sort: the explicit stale-first priority head, then
    # registration (module build-phase) order for everything else.
    return sorted(ops, key=lambda n: (0, priority[n]) if n in priority
                  else (1, -1))


# Persisted intermediates tracked for deferred release. An operator
# that persist()s cannot unpersist before returning — its lazy result
# still reads the cached relation — so the earliest safe point is when
# the NEXT operator is invoked (the consumer's action has run by then
# in every harness: driver, diffcheck, bench, tests). register() wraps
# every operator to release here first, bounding live cache to one
# operator's worth across a full-registry session (ADVICE r1).
_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """persist() with deferred unpersist at the next operator call.

    ``eager=True`` additionally materializes the cache NOW with one
    count() job (r13, guide §2.4/§5): when the cached relation's first
    consumers are CONCURRENT query stages (both sides of a self-join,
    the branches of a union — AQE submits them in parallel), each stage
    finds the cache cold and recomputes the full upstream, duplicating
    the exact work the persist exists to save (profiled: two identical
    signature-aggregation jobs in dedup_simhash / the minhash family).
    A single up-front materialization costs one job and every
    concurrent consumer then reads cached blocks. Only worth it when
    the cached plan is expensive relative to ~100 ms of job overhead —
    call sites opt in per measurement."""
    df = df.persist()
    _TRACKED_CACHES.append(df)
    if eager:
        df.count()  # populates ALL columns of the cached plan's batches
    return df


def release_tracked_caches() -> None:
    while _TRACKED_CACHES:
        try:
            _TRACKED_CACHES.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def register(
    name: str, *, oracle: str | None, section: str
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as operator ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked_caches()
            return fn(spark, sf_dir)

        _REGISTRY[name] = Operator(
            name=name, fn=wrapped, oracle=oracle, section=section
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_operators() -> dict[str, Operator]:
    _load()
    return {n: _REGISTRY[n] for n in _enumeration_order(_REGISTRY)}


def all_queries() -> dict[str, QueryFn]:
    ops = all_operators()
    return {name: op.fn for name, op in ops.items()}


def all_oracle_sql() -> dict[str, str]:
    ops = all_operators()
    return {name: op.oracle for name, op in ops.items() if op.oracle is not None}
