"""Temporal canonicalization.

``events.ts`` is ns-precision on disk; Spark sees µs (sources/load),
DuckDB sees ns. Any checked output therefore emits time either as a
string (``ts_str``) or truncated to whole seconds (``ts_second``) —
both representations are precision-stable across the two engines
because truncation to seconds commutes with the ns→µs floor.
``l_shipdate``/``o_orderdate`` are ms-precision and round-trip exactly,
but get the same treatment for uniformity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_str(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Format a timestamp as a canonical string (DuckDB: strftime)."""
    return F.date_format(col, fmt)


def ts_second(col: Column | str) -> Column:
    """Truncate a timestamp to whole seconds (DuckDB: date_trunc('second'))."""
    return F.date_trunc("second", col)


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since epoch (floor). DuckDB: epoch(date_trunc('second', ts))."""
    return F.col(col).cast("long") if isinstance(col, str) else col.cast("long")
