"""Numeric canonicalization for cross-engine hash equality.

Floating-point aggregation order differs between Spark (partitioned,
partial+final) and any single-node engine, so raw double aggregates can
differ in the last ulps. The engine's discipline (SURVEY.md §0.2.1):
every checked float aggregate passes through ``money`` (2 dp) or
``ratio`` (6 dp) in the Spark plan, and the paired oracle SQL applies
the identical ROUND. Values then hash identically.

These stay JVM-side (built-in ``round``) — no UDF, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str) -> Column:
    """Canonical 2-dp rounding for currency-scale aggregates."""
    return F.round(col, 2)


def ratio(col: Column | str) -> Column:
    """Canonical 6-dp rounding for ratios/statistics/similarities."""
    return F.round(col, 6)
