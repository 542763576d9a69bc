"""Measured checkpoint-replay datapoints for SCALING.md (§2.O, r11).

The r11 checkpoint claim: snapshot construction on a long-lived table
is O(commits-since-checkpoint), not O(commits-forever). This measures
it directly on PURE METADATA (the protocol layer is filesystem JSON;
no Spark session is involved, which is exactly the point — replay
cost is driver-side metadata work):

- build a log of N commits over a BOUNDED live set (50 files: the
  first 50 commits append, every later commit rewrites one existing
  file — remove + add, the COW/compaction churn that actually
  dominates a long-lived table's history), checkpointing every 10
  commits;
- time ``live_files()`` via the newest checkpoint + tail vs the full
  replay (``use_checkpoint=False``), asserting list equality first;
- repeat across N: full replay must grow linearly with COMMIT COUNT
  while the checkpointed read stays flat at ~(1 checkpoint load of
  O(live) + ≤10 tail docs) — any snapshot is O(live files) by
  definition; the win is shedding the O(history) term.

Also times the exactly-once txn-id guard both ways: the
checkpoint-aux path ``committed_txn_ids()`` takes, and the full log
walk a checkpoint-less table would pay — the guard runs before EVERY
micro-batch commit, i.e. the path where O(commits-forever) hurts
first in production.

Usage: python -m tools.checkpointbench [--commits 100,1000,5000]
Prints ONE JSON line; SCALING.md carries the analyzed table.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import tempfile
import time

from logdb_spark.tablefmt import TxTable


def _timed(fn, runs: int = 5) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples) * 1000, 3)  # ms


def _build(
    root: str, n: int, live_slots: int = 50, interval: int = 10
) -> TxTable:
    tx = TxTable(None, root)
    current = {}  # slot -> live path
    for i in range(1, n + 1):
        slot = i % live_slots
        path = f"d/s{slot}_v{i}"
        removes = [current[slot]] if slot in current else []
        tx.commit(
            [{"path": path, "rows": i, "min_k": i, "max_k": i + 1}],
            removes=removes,
            meta={"ts": 100 * i, "txn_id": f"t{i}"},
        )
        current[slot] = path
        tx.maybe_checkpoint(interval=interval)
    return tx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", default="100,1000,5000")
    args = ap.parse_args()
    out = {"checkpoint_interval": 10, "results": {}}
    for n in (int(s) for s in args.commits.split(",")):
        root = tempfile.mkdtemp(prefix=f"logdb_cpbench_{n}_")
        try:
            tx = _build(root, n)
            fast = tx.live_files()
            full = tx.live_files(use_checkpoint=False)
            assert fast == full, "checkpointed replay must equal full"
            ids_fast = tx.committed_txn_ids()

            def txn_ids_full_walk():
                return {
                    c["meta"]["txn_id"]
                    for c in tx.log_actions()
                    if c.get("meta", {}).get("txn_id") is not None
                }

            assert ids_fast == txn_ids_full_walk()
            out["results"][n] = {
                "live_files_checkpointed_ms": _timed(tx.live_files),
                "live_files_full_replay_ms": _timed(
                    lambda: tx.live_files(use_checkpoint=False)
                ),
                "txn_ids_checkpointed_ms": _timed(tx.committed_txn_ids),
                "txn_ids_full_walk_ms": _timed(txn_ids_full_walk),
                "n_live": len(fast),
                "n_txn_ids": len(ids_fast),
                "n_checkpoints": len(tx.checkpoint_versions()),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
