"""Skew-salting micro-benchmark (VERDICT r1 #8).

The registered `join_skew_salted` operator proves salting mechanics on
the fixture key distribution, which is not skewed. This tool measures
the technique on a genuinely hot key: `layout.hot_skewed_fact` remaps
~50% of a 10x-replicated lineitem onto ONE orderkey (~3M rows on a
single key at sf0.1), then times the unsalted join (one reducer owns
the hot key) against the salted twin (hot key spread over N_SALT=8
reducers), asserting result parity first.

Run conditions model the 100 TB regime:
  - auto-broadcast OFF (a 100 TB dimension does not broadcast; the
    whole point of salting is the shuffle-join case),
  - AQE skew-split OFF for the two primary arms (we are measuring the
    *static* technique), plus a third arm with AQE skew-split ON to
    show the adaptive runtime gets the same win without rewriting the
    query.

Usage: python -m tools.skewbench [--sf DIR] [--runs N]
Prints one JSON line: {"unsalted_sec": ..., "salted_sec": ...,
"aqe_skew_sec": ..., "speedup": ..., "parity": true, "sf": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    # Same fd-level stdout hygiene as bench.py: exactly one JSON line.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from logdb_spark.operators.layout import (
        skewed_join_salted,
        skewed_join_unsalted,
    )
    from logdb_spark.plans.session import get_spark

    spark = get_spark("logdb-skewbench")

    # Parity gate before any timing: same rows, order-insensitive.
    a = sorted(map(tuple, skewed_join_unsalted(spark, args.sf).collect()))
    b = sorted(map(tuple, skewed_join_salted(spark, args.sf).collect()))
    parity = a == b
    if not parity:
        os.write(real_stdout, b'{"parity": false}\n')
        return 1

    def timed(fn, skew_split: bool) -> float:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        try:
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            samples = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, args.sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(time.perf_counter() - t0)
            return round(statistics.median(samples), 3)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")

    unsalted = timed(skewed_join_unsalted, skew_split=False)
    salted = timed(skewed_join_salted, skew_split=False)
    aqe = timed(skewed_join_unsalted, skew_split=True)

    line = json.dumps(
        {
            "unsalted_sec": unsalted,
            "salted_sec": salted,
            "aqe_skew_sec": aqe,
            "speedup": round(unsalted / salted, 2) if salted else None,
            "parity": True,
            "sf": args.sf,
            "runs": args.runs,
        }
    )
    os.write(real_stdout, (line + "\n").encode())
    return 0


if __name__ == "__main__":
    sys.exit(main())
