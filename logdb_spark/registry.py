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

# Driver-gate coverage rotation, refreshed for round 9 (VERDICT r8
# item #1). The driver correctness report caps at 50 enumeration
# entries per round, so enumeration order IS evidence budget. The r8
# gate confirmed the first 50 of the r8 tuple (CORRECTNESS_r08 is
# 50/50 hash-green); the r9 head is exactly the 41-op tail it did not
# reach, in the order the r8 comment prescribed:
#   [0..30]  the 31 operators NEVER driver-sampled in any round
#            (26 never-sampled tail + the five r8 additions),
#   [31..40] the 10 operators whose freshest driver row predates
#            their oracle (pre-oracle `no_oracle`/rows-only rows from
#            r1-r4; all ten gained full DuckDB hash oracles in r8),
#   [41]     agg_hll_sketch_merge — upgraded in r9 from rows-only to a
#            hash-checked (estimate, exact) certificate; needs its
#            first post-oracle row.
#   [42..44] ops whose implementation changed in r9 (the verify-join
#            de-broadcast reshapes their plans; answers unchanged,
#            fresh rows confirm it) and that are not already above:
#            text_containment_prefix_join (sizes de-broadcast),
#            dedup_cluster_assign / dedup_keep_best (candidates-path
#            verify).
#   [45..47] NEW operators added in r9 (sample_dedup_weights,
#            sample_pack_sequences, log_dp_noisy_release) — oracles
#            from birth, never sampled.
# That is 48 names; the remaining 2 rows of the 50-cap fall through to
# tier 1 (r2-green streaming/UDF ops, the stalest surviving hashes).
# Tiers 1-3 unchanged: r2-green, then r1-green, then freshest.
_R9_NEEDS_ROW_FIRST = (
    # -- never driver-sampled in r1-r8 (31 ops) --
    "log_adaptive_threshold",
    "log_availability_calendar",
    "log_canary_compare",
    "log_hourly_top_users",
    "log_incident_mttr",
    "log_latency_heatmap",
    "log_peak_concurrency",
    "log_state_machine",
    "log_template_mining",
    "log_top_movers",
    "log_weekday_profile",
    "sample_balanced_classes",
    "sample_leakage_safe_split",
    "set_symmetric_diff",
    "sim_neighbor_stats_tiled",
    "sink_idempotent_retry",
    "stream_cdc_apply",
    "text_bigram_novelty",
    "text_html_strip",
    "text_langid_confusion",
    "text_normalize_dedup",
    "text_pii_scrub",
    "text_similar_docs_topk",
    "text_vocab_growth",
    "win_drawdown",
    "win_time_weighted_avg",
    "sql_merge_upsert",
    "text_fuzzy_decontaminate",
    "sample_cluster_safe_split",
    "stream_dedup_minhash",
    "dedup_incremental_minhash",
    # -- freshest driver row predates the r8 oracle upgrade (10 ops) --
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "dedup_embedding_cosine_lsh",
    "sink_partitioned_parquet",
    "agg_approx_count_distinct",
    "agg_percentile_approx",
    "sink_compaction",
    "sink_bucketed_join",
    # -- oracle added in r9 (rows-only -> hash-checked) --
    "agg_hll_sketch_merge",
    # -- implementation changed in r9 (verify-join de-broadcast) --
    "text_containment_prefix_join",
    "dedup_cluster_assign",
    "dedup_keep_best",
    # -- NEW in r9 (never sampled, oracles from birth) --
    "sample_dedup_weights",
    "sample_pack_sequences",
    "log_dp_noisy_release",
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
    priority = {n: i for i, n in enumerate(_R9_NEEDS_ROW_FIRST)}

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
