"""sources/load.py normalization invariants."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_normalize_ts_nanos_exact_at_mantissa_boundary(spark):
    """nanos→micros must use integer floor division (VERDICT r3 #3):
    epoch-nanos near/above 2^53 µs exceed a double's 53-bit mantissa,
    so the old `/1000`-through-double path lands 1µs off exactly at
    odd micro values like 2^53+1. Pin the exact path with values that
    a float division provably corrupts."""
    from logdb_spark.sources.load import normalize_ts

    micros = [
        2**53 + 1,            # float(2^53+1) == 2^53 → off-by-1µs under /
        2**53 + 3,
        1_700_000_000_000_001,  # realistic 2023-era epoch, odd µs
        0,
    ]
    df = spark.createDataFrame(
        [(m * 1000 + 999,) for m in micros], "ts bigint"
    )  # +999ns: sub-µs digits must floor away, not round up
    out = normalize_ts(df).select(F.unix_micros("ts").alias("us"))
    got = sorted(r["us"] for r in out.collect())
    assert got == sorted(micros)


def test_normalize_ts_passthrough_non_long(spark):
    """An already-timestamp column is left alone (idempotent load)."""
    from logdb_spark.sources.load import normalize_ts

    df = spark.sql("SELECT timestamp'2024-01-02 03:04:05.123456' AS ts")
    out = normalize_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.first()["ts"].microsecond == 123456
