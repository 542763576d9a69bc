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


def register(
    name: str, *, oracle: str | None, section: str
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as operator ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator name: {name}")
        _REGISTRY[name] = Operator(name=name, fn=fn, oracle=oracle, section=section)
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
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: op.fn for name, op in _REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {
        name: op.oracle for name, op in _REGISTRY.items() if op.oracle is not None
    }
