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
    """Canonical 2-dp rounding for currency-scale aggregates.

    Safe only where the exact value cannot sit on a .xx5 half-boundary
    (integer-valued sums, values already at 2 dp). For sums/products of
    2-dp money columns use the decimal path (``dec4`` + ``dround``) —
    double rounding at a half-boundary diverges between engines.
    """
    return F.round(col, 2)


def ratio(col: Column | str) -> Column:
    """Canonical 6-dp rounding for ratios/statistics/similarities."""
    return F.round(col, 6)


def dec4(col: Column | str) -> Column:
    """Cast a money-scale double to DECIMAL(18,4) before arithmetic.

    Fixture money columns carry ≤2 decimal digits, so this cast is
    exact and identical across engines; subsequent decimal arithmetic
    (sums, products) is exact and order-independent — the correct
    semantics at 100 TB where partitioned double-sums are
    nondeterministic in the last ulps. Oracle mirror:
    ``CAST(x AS DECIMAL(18,4))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,4)")


def dround(col: Column, scale: int = 2) -> Column:
    """Round an exact DECIMAL expression and emit as double.

    Rounding happens in decimal space (HALF_UP in Spark, half-away-
    from-zero in DuckDB — identical for our positive values) on
    identical exact inputs, so results match bit-for-bit. Oracle
    mirror: ``CAST(ROUND(expr, scale) AS DOUBLE)``.
    """
    return F.round(col, scale).cast("double")
