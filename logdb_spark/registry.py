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

# Driver-gate coverage rotation. The driver correctness report caps at
# 50 enumeration entries per round, so enumeration order IS evidence
# budget. Union of driver rows r1-r4 covers 158/206 ops; r5 tiering
# (VERDICT r4 #3): tier 0 is exactly the 48 ops with NO driver row in
# any round (set-difference of registry names vs the union of
# CORRECTNESS_r0{1,2,3,4}.json keys), ordered implementation-changed
# first (agg_gini_revenue two-phased this round, dedup composites
# re-wired), then the late-r4 families. New r5 ops append after — under
# the 50-row cap, 48 + 2 new get rows this round; the rest lead r6.
# Tiers 1-3 unchanged: r2-green streaming/UDF (stalest hashes), then
# r1-green, then freshest.
_R5_NEEDS_ROW_FIRST = (
    # -- implementation changed this round: freshest evidence needed --
    "agg_gini_revenue",          # rewritten r5: two-phase bucket rank
    "dedup_fuzzy_edit",
    # -- never driver-checked (no row r1-r4) --
    "agg_bitmap_distinct",
    "agg_corr_regression",
    "agg_entropy",
    "agg_histogram_logscale",
    "agg_skew_kurtosis",
    "agg_weighted_stats",
    "fn_null_suite",
    "fn_struct_suite",
    "fn_try_suite",
    "fn_url_suite",
    "fn_variant_json",
    "ingest_csv_permissive",
    "ingest_fixed_width",
    "ingest_multiline_records",
    "ingest_syslog_priority",
    "join_asof_forward",
    "join_bloom_prefilter",
    "join_lateral_topn",
    "join_reconciliation_audit",
    "log_alert_suppress",
    "log_apdex_score",
    "log_change_point",
    "log_cohort_ltv",
    "log_error_budget_burndown",
    "log_gap_fill",
    "log_retention_cohorts",
    "log_seasonal_baseline",
    "log_tail_sampling",
    "log_user_growth_curve",
    "mm_multipart_assembly",
    "sample_importance_weighted",
    "sample_mixture_weights",
    "sample_shard_budget",
    "scan_dynamic_partition_pruning",
    "scan_partition_pruned",
    "set_except_all",
    "set_intersect_all",
    "sql_recursive_spike_chain",
    "stream_upsert_latest",
    "text_bigram_lm",
    "text_chunk_splitter",
    "text_oov_rate",
    "win_ewma",
    "win_percent_of_total",
    "win_running_distinct",
    "win_vwap_running",
    # -- new in r5 (no driver row yet; cap cuts here if it must) --
    "text_search_ranked",
    "ingest_text_file",
    "log_latency_heatmap",
    "log_peak_concurrency",
    "text_pii_scrub",
    "text_html_strip",
    "agg_mergeable_rollup",
    "log_state_machine",
    "win_time_weighted_avg",
    "text_normalize_dedup",
    "text_langid_confusion",
    "join_scd2_pointintime",
    "sample_balanced_classes",
    "log_template_mining",
    "agg_pareto_coverage",
    "win_drawdown",
    "agg_histogram_percentile",
    "sink_idempotent_retry",
    "join_asof_nearest",
    "log_top_movers",
    "log_canary_compare",
    "sample_leakage_safe_split",
    "mm_scene_segments",
    "log_availability_calendar",
    "sim_neighbor_stats_tiled",
    "log_adaptive_threshold",
    "log_hourly_top_users",
    "text_vocab_growth",
    "log_incident_mttr",
    "fn_ip_suite",
    "text_bigram_novelty",
    "stream_cdc_apply",
    "text_similar_docs_topk",
    "log_weekday_profile",
    "set_symmetric_diff",
)
_R2_DRIVER_GREEN = frozenset(
    {
        "stream_tumbling_counts", "stream_sliding_counts",
        "stream_session_window", "stream_dedup_watermark",
        "stream_static_join", "stream_stream_join", "stream_late_data",
        "stream_stateful_alerts", "udf_python_scalar",
        "udf_pandas_vectorized", "udaf_pandas_group",
        "udtf_explode_sessions",
    }
)
_R1_DRIVER_GREEN = frozenset(
    {
        "scan_parquet", "scan_projection_pushdown", "scan_predicate_pushdown",
        "ingest_raw_loglines", "ingest_json_props", "sink_csv_roundtrip",
        "sink_jsonl_roundtrip", "sink_partitioned_parquet", "filter_compound",
        "filter_like_regex", "filter_null_semantics", "project_computed",
        "join_inner_equi", "join_multiway_star", "join_broadcast",
        "join_left_outer", "join_full_outer", "join_left_semi",
        "join_left_anti", "join_cross", "join_theta_range",
        "join_interval_selfpair", "join_asof_latest_event",
        "agg_pricing_summary", "agg_count_distinct",
        "agg_approx_count_distinct", "agg_filtered", "agg_grouping_sets",
        "agg_rollup", "agg_cube", "agg_stats", "agg_percentile_exact",
        "agg_percentile_approx", "agg_min_max_by", "agg_mode",
        "agg_percentile_disc", "win_rank_dense_rownum", "win_ntile_percent",
        "win_lag_lead_delta", "win_running_sum", "win_moving_avg_range",
        "win_first_last", "sort_multikey_nulls", "topk_global",
        "topk_per_group", "set_union_all", "set_union_distinct",
        "set_intersect", "set_except",
    }
)


def _enumeration_order(ops: dict[str, Operator]) -> list[str]:
    priority = {n: i for i, n in enumerate(_R5_NEEDS_ROW_FIRST)}

    def tier(name: str) -> int:
        if name in priority:
            return 0
        if name in _R2_DRIVER_GREEN:
            return 1
        if name in _R1_DRIVER_GREEN:
            return 2
        return 3

    # Stable sort: within tier 0, the explicit priority order; within
    # other tiers, registration (module build-phase) order.
    return sorted(ops, key=lambda n: (tier(n), priority.get(n, -1)))


# Persisted intermediates tracked for deferred release. An operator
# that persist()s cannot unpersist before returning — its lazy result
# still reads the cached relation — so the earliest safe point is when
# the NEXT operator is invoked (the consumer's action has run by then
# in every harness: driver, diffcheck, bench, tests). register() wraps
# every operator to release here first, bounding live cache to one
# operator's worth across a full-registry session (ADVICE r1).
_TRACKED_CACHES: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() with deferred unpersist at the next operator call."""
    df = df.persist()
    _TRACKED_CACHES.append(df)
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
