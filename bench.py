"""Benchmark harness — driver contract (BASELINE.md).

Times every registered operator at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...}

Method: one warm-up execution of the whole suite (JVM/JIT/code-cache
warm), then BENCH_RUNS (default 3) measured runs per query; the
reported number is the median. Queries materialize through the noop
sink — full execution, no driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _quiescence() -> dict:
    """Host-contention self-flagging (VERDICT r6 item — the r6/r7
    bench spread was diagnosed as host contention only by inference):
    1/5-minute load averages plus a count of ALREADY-RUNNING java
    processes, sampled BEFORE this bench starts its own JVM. A row
    with other_jvms > 0 or load5 >> cpus was measured on a contended
    host and should be discounted (BASELINE.md's ±25% variance
    history)."""
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    other_jvms = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as fh:
                    if fh.read().strip() == "java":
                        other_jvms += 1
            except OSError:
                continue  # raced process exit
    except OSError:
        other_jvms = -1
    return {
        "load1": round(load1, 2),
        "load5": round(load5, 2),
        "other_jvms": other_jvms,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    only = sys.argv[1:]  # optional operator-name filter
    quiesce = _quiescence()  # sample before our own JVM exists

    # Guarantee exactly one JSON line on stdout: save the real stdout fd,
    # then point fd 1 at stderr for the whole run — the JVM inherits fd 1,
    # so this silences its console chatter (progress bars, log4j fallback)
    # at the fd level, not just sys.stdout. r1's bench output was unparsable
    # because of exactly that pollution.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from logdb_spark.plans.session import get_spark
    from logdb_spark.registry import all_operators

    spark = get_spark("logdb-bench")
    ops = all_operators()
    names = [n for n in sorted(ops) if not only or n in only]

    def execute(name: str) -> None:
        ops[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in names:
        execute(name)  # warm-up (plan compile, code cache, file listing)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            execute(name)
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # Ops that persist() intermediates (LSH signatures, pair kernels)
        # would otherwise accumulate cached blocks across the full-registry run.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The driver captures only ~2.2 KB of stdout; a full-registry timing map
    # (~4.5 KB) overflowed it in r1 AND r2 ("parsed": null both rounds).
    # Keep the stdout line compact — top-10 slowest only — and write the
    # full per-query map to a sidecar the judge can read.
    detail = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
        "n_queries": len(timings),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "runs_per_query": runs,
        "quiesce_start": quiesce,
        "quiesce_end": _quiescence(),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    line = json.dumps(
        {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": top10,
            "sf": detail["sf"],
            "n_queries": len(timings),
            "quiesce": quiesce,
            "detail": "BENCH_DETAIL.json",
        },
        separators=(",", ":"),
    )
    os.write(real_stdout, (line + "\n").encode())
    return 0


if __name__ == "__main__":
    sys.exit(main())
