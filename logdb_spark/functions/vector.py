"""Vector math over ArrayType(FloatType) columns — JVM-side, no UDF.

Embeddings are unit-norm (FIXTURES.md), so cosine similarity equals the
dot product. Both are expressed with higher-order functions
(``zip_with`` + ``aggregate``), which run inside codegen on the JVM —
no Python serialization in the hot path. At 100 TB this is the
brute-force kernel; the scale path (LSH bucketing / IVF in
operators/llm.py) reduces the candidate set before this kernel runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns (double accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; general form (fixtures are unit-norm, where
    this reduces to ``dot``, but keep it robust to non-normalized input)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
