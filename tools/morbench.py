"""COW vs merge-on-read delete: measured write amplification (r12).

Same logical delete ('P'-status rows of two order-years) executed both
ways against identical year-partitioned §2.O tables at a given sf:

- COW: rewrite every touched year-file without the matched rows,
  commit the reference swap (operators/tableformat.py::
  _cow_delete_p_years — the table_delete_cow path).
- MOR: write one equality-delete key file, commit it
  (table_merge_on_read_delete path, no purge).

Bytes written is the headline (deterministic on any host — the
wall-clock on this box swings 2×, see SCALING.md's variance notes);
seconds are reported for context only.

Run: python -m tools.morbench [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def _tree_bytes(root: str, sub: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(root, sub, "**", "*"), recursive=True)
        if os.path.isfile(f)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from logdb_spark.operators.tableformat import (
        _cow_delete_p_years,
        _orders_with_year,
        _year_table,
    )
    from logdb_spark.plans.session import get_spark
    from logdb_spark.sources.scratch import scratch_dir
    from logdb_spark.tablefmt import TxTable, write_grouped

    spark = get_spark("morbench")
    years = (1995, 2000)

    # --- COW arm ---------------------------------------------------------
    tx_cow, _ = _year_table(spark, sf_dir)
    touched_bytes = sum(
        _tree_bytes(tx_cow.root, f"data1/g={y}") for y in years
    )
    t0 = time.perf_counter()
    _cow_delete_p_years(tx_cow, years, subdir="rw1", meta={"ts": 2000})
    cow_sec = round(time.perf_counter() - t0, 2)
    cow_bytes = _tree_bytes(tx_cow.root, "rw1")

    # --- MOR arm ---------------------------------------------------------
    orders = _orders_with_year(spark, sf_dir)
    tx_mor = TxTable(spark, scratch_dir("morbench_"))
    tx_mor.commit(
        write_grouped(orders, tx_mor.root, "data1", "o_orderkey"),
        meta={"ts": 1000},
    )
    pred = (F.col("o_orderstatus") == "P") & F.col("g").isin(*years)
    t0 = time.perf_counter()
    del_keys = (
        tx_mor.read()
        .withColumn("g", F.year("o_orderdate"))
        .filter(pred)
        .select("o_orderkey", F.lit(0).alias("g"))
    )
    dv = write_grouped(del_keys, tx_mor.root, "dv1", "o_orderkey")
    tx_mor.commit(
        [{**dv[0], "kind": "eq_delete", "key": "o_orderkey"}],
        meta={"ts": 2000},
    )
    mor_sec = round(time.perf_counter() - t0, 2)
    mor_bytes = _tree_bytes(tx_mor.root, "dv1")

    # parity: both strategies must produce the same surviving rows
    cow_n = tx_cow.read().count()
    mor_n = tx_mor.read().count()
    assert cow_n == mor_n, (cow_n, mor_n)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "deleted_keys": int(dv[0]["rows"]),
                "touched_file_bytes": touched_bytes,
                "cow_rewrite_bytes": cow_bytes,
                "mor_delete_file_bytes": mor_bytes,
                "write_amplification_cow_over_mor": round(
                    cow_bytes / mor_bytes, 1
                ),
                "cow_sec": cow_sec,
                "mor_sec": mor_sec,
                "surviving_rows_parity": cow_n,
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
