"""SparkSession configuration.

Two paths:
- ``configure(spark)`` — applied to an EXISTING session (the driver owns
  the SparkSession it passes to ``entry``/``queries``). All confs used
  here are runtime-settable SQL confs (probe-verified on PySpark 4.1.2).
- ``get_spark()`` — builds a session for tests/bench with the same confs
  plus local-mode sizing.

Scale posture: these confs are the local-mode projection of a cluster
config. At 100 TB the same knobs hold (AQE coalesce/skew-join do the
runtime sizing); only ``shuffle.partitions``' floor changes — AQE's
coalescing makes a high initial value safe on a big cluster, while the
advisory partition size keeps post-shuffle partitions executor-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to ANY session that touches the
# fixture tables. Determinism + correctness critical:
#  - UTC session TZ: fixture timestamps are naive-UTC; DuckDB agrees.
#  - nanosAsLong: events.ts is parquet timestamp[ns], which PySpark
#    4.1.2 hard-fails on otherwise (PARQUET_TYPE_ILLEGAL). sources/load
#    converts the resulting epoch-nanos long back to a timestamp.
#  - AQE on (default in 4.x, pinned here): runtime partition coalescing,
#    skew-join splitting, dynamic broadcast conversion.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / applyInPandas / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Static (SparkConf-only) confs for sessions WE build — get_spark and
# the profiling tools. Not runtime-settable, so configure() cannot
# apply them to a driver-owned session; none of them affect results.
STATIC_CONFS: dict[str, str] = {
    # r14 (guide §2.2/§7.3): thread dumps of the 32-core bench showed
    # 24/31 executor threads RUNNABLE inside FileChannelImpl.map0 —
    # BypassMergeSortShuffleWriter writes one file PER REDUCE PARTITION
    # per map task and then concatenates them with transferTo, which
    # mmaps every source file; 32 concurrent tasks × 64 reduce
    # partitions serialize on the kernel's per-process mmap lock
    # (stage profile: 135 s task wall, 18 s CPU, zero GC/fetch).
    # Lowering the bypass threshold routes R>8 shuffles through the
    # serialized sort writer: ONE output file per map task, no
    # per-partition concat. Measured: log_triangle_count 5.8→3.2 s,
    # sample_dedup_weights 6.3→3.6 s at 32c. Scale-correct, not a
    # local[32] trick: at production reduce-partition counts (>200)
    # the bypass writer never fires at all, and M×R intermediate-file
    # explosion is the documented reason sort-based shuffle exists —
    # this conf only changes the small-R regime, in the direction of
    # fewer, larger files (§2.2, §6).
    "spark.shuffle.sort.bypassMergeThreshold": "8",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable on this build — leave the session's value.
            pass
    return spark


def default_shuffle_partitions() -> int:
    """Initial shuffle partitions: ~2x cores locally; AQE coalesces down.

    On a real cluster this would be 2-3x total executor cores (or simply
    a high value like 2000 with AQE coalescing); the env var override is
    the bench hook.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return max(8, 2 * cpus)


def get_spark(app_name: str = "logdb-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(default_shuffle_partitions()))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Keep stdout clean: bench.py's contract is ONE JSON line on
        # stdout, and the JVM's console progress bar writes there.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in {**STATIC_CONFS, **RUNTIME_CONFS}.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
