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

# Driver-gate coverage rotation, refreshed for round 11 (VERDICT r10
# task #1). The driver correctness report caps at 50 enumeration
# entries per round, so enumeration order IS evidence budget. The
# tuple below is `python -m tools.staleness --tuple` output verbatim
# (stale-first from the CORRECTNESS_r*.json ledger): the seven ops born
# in r11 (never sampled, oracles from birth) head the list, then the
# 14 operators whose freshest hash-green driver row is still round 1,
# the 10-op r2 bucket, and the alphabetical head of the r3 bucket.
# 7 + 14 + 10 = 31, so the 50-cap samples all of those plus the first
# 19 r3 ops — leaving ~61 pre-r5 rows for the r12 tuple, after which
# every operator's driver evidence is ≤5 rounds old (VERDICT r10
# task #10). Regenerate after the r11 report lands.
_R11_NEEDS_ROW_FIRST = (
    "stream_table_cdf",  # never
    "table_cdf_apply_downstream",  # never
    "table_remove_conflict_abort",  # never
    "table_shallow_clone",  # never
    "table_time_travel_ts",  # never
    "table_txlog_checkpoint",  # never
    "table_vacuum_delete",  # never
    "set_except",  # r1
    "set_intersect",  # r1
    "set_union_all",  # r1
    "set_union_distinct",  # r1
    "sink_csv_roundtrip",  # r1
    "sink_jsonl_roundtrip",  # r1
    "sort_multikey_nulls",  # r1
    "topk_global",  # r1
    "topk_per_group",  # r1
    "win_first_last",  # r1
    "win_lag_lead_delta",  # r1
    "win_moving_avg_range",  # r1
    "win_rank_dense_rownum",  # r1
    "win_running_sum",  # r1
    "stream_dedup_watermark",  # r2
    "stream_late_data",  # r2
    "stream_session_window",  # r2
    "stream_sliding_counts",  # r2
    "stream_stateful_alerts",  # r2
    "stream_static_join",  # r2
    "stream_stream_join",  # r2
    "stream_tumbling_counts",  # r2
    "udaf_pandas_group",  # r2
    "udtf_explode_sessions",  # r2
    "agg_collect_sorted",  # r3
    "dedup_embedding_cosine",  # r3
    "dedup_exact",  # r3
    "dedup_near_jaccard",  # r3
    "dedup_ngram_jaccard",  # r3
    "fn_array_suite",  # r3
    "fn_case_bucketing",  # r3
    "fn_date_suite",  # r3
    "fn_higher_order",  # r3
    "fn_map_from_json",  # r3
    "fn_math_suite",  # r3
    "fn_regexp_extract",  # r3
    "fn_string_suite",  # r3
    "join_skew_salted",  # r3
    "log_error_rate",  # r3
    "log_funnel",  # r3
    "log_pivot_types",  # r3
    "log_rate_spike",  # r3
    "log_retention_prune",  # r3
    "log_sessionize_gap",  # r3
    "log_time_histogram",  # r3
    "log_top_talkers",  # r3
    "log_value_histogram",  # r3
    "mm_binary_metadata",  # r3
    "mm_embedding_quantize",  # r3
    "mm_frame_sample",  # r3
    "mm_image_resize",  # r3
    "sim_batch_topk",  # r3
    "sim_knn_join_label",  # r3
)



def _enumeration_order(ops: dict[str, Operator]) -> list[str]:
    priority = {n: i for i, n in enumerate(_R11_NEEDS_ROW_FIRST)}
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
