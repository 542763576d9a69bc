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

# Driver-gate coverage rotation, refreshed for round 10 (VERDICT r9
# items #1 and #8). The driver correctness report caps at 50
# enumeration entries per round, so enumeration order IS evidence
# budget. This tuple is no longer hand-maintained: tools/staleness.py
# derives the stale-first ordering mechanically from the
# CORRECTNESS_r*.json reports (per-op freshest driver round), and the
# r10 head below is its output with one prepend — the operators born
# in r10 (oracles from birth, never sampled) take the first slots so
# every new op gets a birth-round driver row. Layout:
#   [0..18]  NEW in r10 (never sampled, oracles from birth): the five
#            BPE/DP ops plus the fourteen §2.O table-format / txlog ops.
#   [19..63] the 45 operators whose freshest hash-green driver row is
#            round 1 (alphabetical within the round bucket, matching
#            tools/staleness.py's deterministic ordering).
#   [64..73] the 10 operators whose freshest row is round 2.
# 19 + 45 + 10 = 74 names; the 50-cap samples [0..49] (all 19 new ops
# + the first 31 of r1), leaving 14 r1 ops + the 10-op r2 bucket + the
# r3/r4 buckets for the r11 tuple — regenerate it with
# `python -m tools.staleness --tuple` after the r10 report lands.
_R10_NEEDS_ROW_FIRST = (
    # -- NEW in r10 (oracles from birth, never sampled) --
    "log_dp_noisy_release_userlevel",
    "text_bpe_tokenize",
    "sample_pack_sequences_bpe",
    "text_bpe_vocab",
    "log_dp_noisy_sum_userlevel",
    # -- NEW in r10, §2.O table format (oracles from birth) --
    "table_txlog_snapshot",
    "table_delete_cow",
    "table_merge_cow",
    "table_skipping_stats",
    "table_compact_binpack",
    "table_incremental_read",
    "table_vacuum_orphans",
    "table_commit_conflict_retry",
    "table_schema_evolution_log",
    "stream_txlog_append",
    "table_zorder_skipping",
    "table_partition_evolution",
    "table_retention_expire",
    "stream_table_changes",
    # -- freshest driver row is round 1 (45 ops) --
    "agg_count_distinct",
    "agg_cube",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_min_max_by",
    "agg_mode",
    "agg_percentile_disc",
    "agg_percentile_exact",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_stats",
    "filter_compound",
    "filter_like_regex",
    "filter_null_semantics",
    "ingest_json_props",
    "ingest_raw_loglines",
    "join_asof_latest_event",
    "join_broadcast",
    "join_cross",
    "join_full_outer",
    "join_inner_equi",
    "join_interval_selfpair",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_multiway_star",
    "join_theta_range",
    "project_computed",
    "scan_parquet",
    "scan_predicate_pushdown",
    "scan_projection_pushdown",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sink_csv_roundtrip",
    "sink_jsonl_roundtrip",
    "sort_multikey_nulls",
    "topk_global",
    "topk_per_group",
    "win_first_last",
    "win_lag_lead_delta",
    "win_moving_avg_range",
    "win_rank_dense_rownum",
    "win_running_sum",
    # -- freshest driver row is round 2 (10 ops) --
    "stream_dedup_watermark",
    "stream_late_data",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_stateful_alerts",
    "stream_static_join",
    "stream_stream_join",
    "stream_tumbling_counts",
    "udaf_pandas_group",
    "udtf_explode_sessions",
)


def _enumeration_order(ops: dict[str, Operator]) -> list[str]:
    priority = {n: i for i, n in enumerate(_R10_NEEDS_ROW_FIRST)}
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
