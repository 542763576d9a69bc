"""Measured change-stream backlog-drain datapoints for SCALING.md
(§2.J/§2.O, r13 — VERDICT r12 task #7).

The claim under test: draining a DEEP commit backlog through the
txlogstream source costs O(files-per-batch) PLAN time per micro-batch
— never O(log-depth) — so a consumer that fell a day behind a busy
table recovers at a flat per-batch cost. Two measurements:

1. **Planner loop, pure metadata (no Spark)**: build a log of N
   one-file commits, then simulate the engine's offset loop exactly
   the way MicroBatchExecution drives a DataSourceStreamReader —
   ``partitions(start, end)`` is called once (floor pinned), then
   repeated ``latestOffset`` → ``partitions`` → ``commit`` rounds with
   maxCommitsPerTrigger throttling — timing every partitions() call.
   Flat curve = per-batch planning reads only the batch's own commit
   docs (contiguous-version addressing, no per-batch directory
   listing); the honest O(N) terms are called out: one read-horizon
   scan at reader CONSTRUCTION and one directory listing per
   latestOffset (head discovery), both amortized across the whole
   drain and both sub-ms at N=500.

2. **Real streaming drain (Spark)**: 1 seed commit, start the
   throttled query, drain (pins the floor), append the backlog while
   the query is live, processAllAvailable — every backlog batch spans
   ≤ maxCommitsPerTrigger versions (offset-log verified), and the
   memory-sink row count equals the batch reader's. Wall-clock per
   batch is dominated by Spark's fixed micro-batch machinery
   (~100 ms), which is the production story too: plan cost is noise
   against trigger overhead, exactly where it should be.

Usage: python -m tools.streambench [--commits 100,500] [--max 5]
Prints ONE JSON line; SCALING.md carries the analyzed table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import tempfile
import time


def _build_log(root: str, n_commits: int) -> None:
    """N one-file commits over a tiny template parquet dir: the data
    bytes are copied per commit (immutable-path contract), but the
    planner never opens them — this bench times metadata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logdb_spark.tablefmt import TxTable

    os.makedirs(root, exist_ok=True)
    tmpl = os.path.join(root, "_template")
    os.makedirs(tmpl, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(100), pa.int64()),
                "user_id": pa.array([i % 7 for i in range(100)], pa.int64()),
            }
        ),
        os.path.join(tmpl, "part-0.parquet"),
    )
    tx = TxTable(None, root)
    for i in range(1, n_commits + 1):
        dst = os.path.join(root, f"c{i}", "g=0")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(tmpl, dst)
        tx.commit([{"path": f"c{i}/g=0", "rows": 100}])


def planner_drain(n_commits: int, max_commits: int) -> dict:
    """Simulated engine loop over an N-commit backlog: per-batch
    partitions() timings in ms — first/median/p95/last plus reader
    construction cost."""
    from logdb_spark.sources.txlogstream import _TxlogStreamReader

    tmp = tempfile.mkdtemp(prefix="streambench_")
    try:
        _build_log(tmp, n_commits)
        t0 = time.perf_counter()
        r = _TxlogStreamReader({"path": tmp})
        r.max_commits = max_commits
        construct_ms = (time.perf_counter() - t0) * 1000
        # Checkpointed construction (r13): protocol/horizon/schema_map
        # resolve from the hot doc + tail instead of full log walks.
        from logdb_spark.tablefmt import TxTable

        TxTable(None, tmp).write_checkpoint()
        t0 = time.perf_counter()
        _TxlogStreamReader({"path": tmp})
        construct_cp_ms = (time.perf_counter() - t0) * 1000
        # Engine loop: initialOffset, then latestOffset/partitions/
        # commit rounds until the head is drained.
        cur = r.initialOffset()
        r._floor = cur["version"]  # floor known: steady-state throttle
        plan_ms, batch_files = [], []
        while cur["version"] < n_commits:
            end = r.latestOffset()
            t0 = time.perf_counter()
            parts = r.partitions(cur, end)
            plan_ms.append((time.perf_counter() - t0) * 1000)
            batch_files.append(len(parts))
            r.commit(end)
            cur = end
        return {
            "commits": n_commits,
            "max_commits_per_trigger": max_commits,
            "n_batches": len(plan_ms),
            "construct_ms": round(construct_ms, 3),
            "construct_with_checkpoint_ms": round(construct_cp_ms, 3),
            "plan_ms_first": round(plan_ms[0], 3),
            "plan_ms_median": round(statistics.median(plan_ms), 3),
            "plan_ms_p95": round(
                sorted(plan_ms)[int(0.95 * (len(plan_ms) - 1))], 3
            ),
            "plan_ms_last": round(plan_ms[-1], 3),
            "files_per_batch": max(batch_files),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_drain(n_commits: int, max_commits: int) -> dict:
    """Real Structured Streaming drain of an appended backlog; spans
    verified from the offset log."""
    from logdb_spark.plans.session import get_spark
    from logdb_spark.sources.txlogstream import register_txlogstream
    from logdb_spark.tablefmt import TxTable

    spark = get_spark("streambench")
    tmp = tempfile.mkdtemp(prefix="streambench_live_")
    ckpt = tempfile.mkdtemp(prefix="streambench_ckpt_")
    try:
        _build_log(tmp, 1)  # seed commit
        register_txlogstream(spark)
        q = (
            spark.readStream.format("txlogstream")
            .option("path", tmp)
            .option("maxCommitsPerTrigger", str(max_commits))
            .load()
            .writeStream.format("memory")
            .queryName("sbdrain")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()  # floor pinned at v1
            tmpl = os.path.join(tmp, "_template")
            tx = TxTable(None, tmp)
            for i in range(2, n_commits + 1):
                dst = os.path.join(tmp, f"c{i}", "g=0")
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copytree(tmpl, dst)
                tx.commit([{"path": f"c{i}/g=0", "rows": 100}])
            t0 = time.perf_counter()
            q.processAllAvailable()
            drain_s = time.perf_counter() - t0
        finally:
            q.stop()
        rows = spark.sql("SELECT count(*) c FROM sbdrain").collect()[0]["c"]
        spans, prev = [], 0
        odir = os.path.join(ckpt, "offsets")
        for fname in sorted(
            (f for f in os.listdir(odir) if f.isdigit()), key=int
        ):
            with open(os.path.join(odir, fname)) as fh:
                end = json.loads(fh.read().splitlines()[-1])["version"]
            spans.append(end - prev)
            prev = end
        spark.catalog.dropTempView("sbdrain")
        return {
            "commits": n_commits,
            "max_commits_per_trigger": max_commits,
            "rows": rows,
            "rows_expected": n_commits * 100,
            "backlog_drain_sec": round(drain_s, 2),
            "n_offset_entries": len(spans),
            "max_span": max(spans),
            "spans_bounded": all(s <= max_commits for s in spans),
            "sec_per_batch": round(drain_s / max(1, len(spans) - 1), 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", default="100,500")
    ap.add_argument("--max", type=int, default=5)
    ap.add_argument(
        "--no-spark", action="store_true", help="planner loop only"
    )
    args = ap.parse_args()
    sizes = [int(x) for x in args.commits.split(",")]
    out = {
        "planner": [planner_drain(n, args.max) for n in sizes],
    }
    if not args.no_spark:
        out["streaming"] = streaming_drain(max(sizes), args.max)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
