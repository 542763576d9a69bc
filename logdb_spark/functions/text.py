"""Text primitives for the documents corpus.

Fixture text is space-separated lowercase words (FIXTURES.md), so
tokenization is a plain split; ``tokens`` still collapses repeated
whitespace to stay robust on real log text. All JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword-ish high-frequency fixture tokens (FIXTURES.md).
STOPWORDS = ("the", "a")


def tokens(col: Column | str) -> Column:
    """Split text into a word array (empty strings filtered)."""
    arr = F.split(F.trim(col if isinstance(col, Column) else F.col(col)), r"\s+")
    return F.filter(arr, lambda t: t != "")
