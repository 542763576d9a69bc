"""Measured table-format datapoints for SCALING.md (§2.O).

Two claims the operator family makes get numbers here, at sf0.1
(lineitem, ~600k rows) on local[32]:

1. **Stats skipping**: a key-range query over a 64-file table read
   via the log, full snapshot scan vs metadata-pruned scan (2/64
   files). The saving is the scan fraction; at 100 TB the same
   arithmetic skips tens of TB.
2. **Copy-on-write delete**: delete a predicate local to 2 of 64
   files — COW rewrite of the touched files vs the naive full-table
   rewrite. The saving is the rewrite fraction.

Both arms assert result parity before timing. Median of 3.

A ``--scale K`` flag replicates lineitem K-fold in-query (distinct
keys per replica) before building the table, giving measured scaling
points: metadata costs (prune, replay) must stay flat, pruned-scan and
COW costs must track the hit-file BYTES, full-scan/full-rewrite costs
must track the table.

Usage: python -m tools.tablebench [--sf DIR] [--files N] [--scale K]
"""

from __future__ import annotations

import argparse
import statistics
import time

from pyspark.sql import functions as F

from logdb_spark.plans.session import get_spark
from logdb_spark.sources.load import load_table
from logdb_spark.sources.scratch import scratch_dir
from logdb_spark.tablefmt import TxTable, write_grouped


def _timed(fn, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()
    nf = args.files

    spark = get_spark("tablebench")
    li = load_table(spark, args.sf, "lineitem")
    if args.scale > 1:
        base_mx = li.agg(F.max("l_orderkey")).first()[0] + 1
        reps = spark.range(args.scale).select(F.col("id").alias("rep"))
        li = (
            li.crossJoin(F.broadcast(reps))
            .withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("rep") * F.lit(base_mx),
            )
            .drop("rep")
        )
    n = li.count()
    # Key-range files over l_orderkey; stats on the key. Width from
    # the actual key max so the bucketing is data-driven.
    mx = li.agg(F.max("l_orderkey")).first()[0] + 1
    keyed = li.withColumn(
        "g", F.expr(f"CAST((l_orderkey * {nf}) DIV {mx} AS BIGINT)")
    )
    tx = TxTable(spark, scratch_dir("tablebench_"))
    adds = write_grouped(keyed, tx.root, "data1", "l_orderkey")
    tx.commit(adds)
    # Exactly 2 file-widths: [first key of file 5, last key of file 6].
    # File i holds keys with (k*nf) div mx == i, so file i starts at
    # ceil(i*mx/nf).
    lo, hi = -(-(mx * 5) // nf), -(-(mx * 7) // nf) - 1
    hit, total = tx.prune("l_orderkey", lo, hi)

    def q(files=None):
        return (
            tx.read(files=files)
            .filter(F.col("l_orderkey").between(lo, hi))
            .agg(
                F.count(F.lit(1)),
                F.sum("l_orderkey"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)")),
            )
            .collect()[0]  # driver-scalar: one summary row per arm
        )

    assert tuple(q()) == tuple(q(hit)), "pruned scan lost rows"
    t_full = _timed(lambda: q(None))
    t_pruned = _timed(lambda: q(hit))

    # COW delete vs full rewrite: predicate local to the 2 hit files.
    pred = F.col("l_orderkey").between(lo, hi) & (
        F.col("l_returnflag") == "R"
    )
    live = {e["path"]: e for e in tx.live_files()}

    def cow_delete(subdir: str):
        touched = [live[e["path"]] for e in hit]
        rw = tx.read(files=touched).filter(~pred)
        rw2 = rw.withColumn(
            "g", F.expr(f"CAST((l_orderkey * {nf}) DIV {mx} AS BIGINT)")
        )
        write_grouped(rw2, tx.root, subdir, "l_orderkey")

    def full_rewrite(subdir: str):
        rw = tx.read().filter(~pred)
        rw2 = rw.withColumn(
            "g", F.expr(f"CAST((l_orderkey * {nf}) DIV {mx} AS BIGINT)")
        )
        write_grouped(rw2, tx.root, subdir, "l_orderkey")

    counter = {"i": 0}

    def next_sub(prefix):
        counter["i"] += 1
        return f"{prefix}{counter['i']}"

    t_cow = _timed(lambda: cow_delete(next_sub("cow")))
    t_full_rw = _timed(lambda: full_rewrite(next_sub("fullrw")))
    t_prune = _timed(lambda: tx.prune("l_orderkey", lo, hi), runs=5)
    t_replay = _timed(lambda: tx.live_files(), runs=5)

    print(
        {
            "sf": args.sf,
            "scale": args.scale,
            "rows": n,
            "files_total": total,
            "files_hit": len(hit),
            "scan_full_s": t_full,
            "scan_pruned_s": t_pruned,
            "scan_speedup": round(t_full / t_pruned, 2),
            "cow_delete_s": t_cow,
            "full_rewrite_s": t_full_rw,
            "rewrite_speedup": round(t_full_rw / t_cow, 2),
            "prune_metadata_s": t_prune,
            "log_replay_s": t_replay,
        }
    )


if __name__ == "__main__":
    main()
