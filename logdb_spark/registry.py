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

# Driver-gate coverage rotation, refreshed for round 12 (VERDICT r11
# task #2). The driver correctness report caps at 50 enumeration
# entries per round, so enumeration order IS evidence budget. The
# tuple below is `python -m tools.staleness --tuple` output verbatim
# (stale-first from the CORRECTNESS_r*.json ledger): the three ops
# born in r12 (never sampled, oracles from birth) head the list, then
# the 22 operators whose freshest hash-green driver row is still
# round 3, then the r4 bucket. 6 + 22 = 28, so the 50-cap samples all
# of those plus the first 22 r4 ops — leaving ~24 r4 rows for the r13
# tuple, after which every operator's driver evidence is <=6 rounds
# old and the staleness asterisk retires (VERDICT r11 task #8).
# Regenerate after the r12 report lands.
_R12_NEEDS_ROW_FIRST = (
    "stream_table_changes_orders",  # never
    "table_column_mapping_rename",  # never
    "table_vacuum_read_horizon",  # never
    "table_protocol_guard",  # never
    "table_merge_on_read_delete",  # never
    "table_merge_on_read_upsert",  # never
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
    "sim_topk_cosine",  # r3
    "sink_orc_roundtrip",  # r3
    "sql_q10_returned_items",  # r3
    "sql_q3_shipping_priority",  # r3
    "sql_q5_local_supplier",  # r3
    "text_fingerprint",  # r3
    "text_lang_id",  # r3
    "text_lang_source_profile",  # r3
    "text_quality_filter",  # r3
    "text_tfidf_top_terms",  # r3
    "text_token_stats",  # r3
    "text_unigram_surprisal",  # r3
    "dedup_within_source",  # r4
    "fn_bitwise_suite",  # r4
    "ingest_python_datasource",  # r4
    "join_asof_tolerance",  # r4
    "join_null_safe",  # r4
    "join_range_bucketed",  # r4
    "log_anomaly_mad",  # r4
    "log_attribution_last_touch",  # r4
    "log_cooccurrence",  # r4
    "log_dau_new_users",  # r4
    "log_slo_burn_rate",  # r4
    "log_unpivot_metrics",  # r4
    "mm_audio_window",  # r4
    "mm_feature_extract",  # r4
    "sample_kfold_assign",  # r4
    "sample_split_hash",  # r4
    "sample_stratified_topk",  # r4
    "sample_uniform_topk",  # r4
    "scan_constraint_audit",  # r4
    "scan_schema_evolution",  # r4
    "sim_centroid_affinity",  # r4
    "sim_norm_stats",  # r4
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
)



def _enumeration_order(ops: dict[str, Operator]) -> list[str]:
    priority = {n: i for i, n in enumerate(_R12_NEEDS_ROW_FIRST)}
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
