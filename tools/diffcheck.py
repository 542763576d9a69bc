"""Local differential checker — mirrors the driver's correctness gate.

Runs each registered operator's Spark query and its DuckDB oracle over
the same sf dir and compares row-count, column-name set, and an
order-insensitive canonicalized value multiset (a strict local proxy
for the driver's value-hash). Operators without an oracle get a
rows-only check (runs, returns a stable schema).

Usage:
    python -m tools.diffcheck [--sf DIR] [name ...]   # default: all
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb

from logdb_spark.plans.session import get_spark
from logdb_spark.registry import all_operators
from logdb_spark.sources.load import TABLES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


class NonScalarCell(TypeError):
    """A registered operator's result contains an array/map cell.

    The DRIVER's canonicalizer crashes on these (pandas sort_values →
    ``TypeError: unhashable type: 'numpy.ndarray'``) — see the r1
    ``agg_collect_sorted``, r2 ``fn_array_suite``/``fn_map_from_json``
    and r3 ``mm_feature_extract`` FAILs; the r3 one proved the driver
    canonicalizes ROWS-ONLY outputs too. The local mirror must be at
    least as strict as the real gate, so any non-scalar cell in ANY
    operator output is a hard FAIL here: join arrays to strings
    (``array_join``/``array_to_string``) before returning them
    (SURVEY §7.3.5).
    """


def canon_value(v):
    """Canonicalize a cell for cross-engine multiset comparison.

    Scalar cells only — list/dict/ndarray cells raise NonScalarCell
    because the driver's gate cannot hash them (see above).
    """
    import datetime

    import numpy as np

    if v is None:
        return "\0NULL"
    if isinstance(v, (np.generic,)):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        # Queries pre-round; repr equality then means bit equality.
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise NonScalarCell(
            f"non-scalar cell {type(v).__name__} in operator result; "
            "emit array_join(...)'d strings instead (SURVEY §7.3.5)"
        )
    return str(v)


def canon_frame(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def check_one(spark, con, op, sf_dir: str) -> tuple[bool, str]:
    sdf = op.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if op.oracle is None:
        # The DRIVER canonicalizes rows-only outputs too before counting
        # (r3 mm_feature_extract FAIL) — mirror that: any non-scalar cell
        # must be a hard FAIL here even without an oracle to compare to.
        canon_frame(spdf)
        return True, f"rows-only ({len(spdf)} rows, {len(spdf.columns)} cols)"
    odf = con.execute(op.oracle).df()
    scols, srows = canon_frame(spdf)
    ocols, orows = canon_frame(odf)
    if scols != ocols:
        return False, f"SCHEMA spark={scols} oracle={ocols}"
    if len(srows) != len(orows):
        return False, f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
    if srows != orows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
        ][:3]
        return False, f"VALUES {len([1 for s,o in zip(srows,orows) if s!=o])} rows differ; first: {diffs}"
    return True, f"match ({len(srows)} rows)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    ops = all_operators()
    names = args.names or sorted(ops)
    unknown = [n for n in names if n not in ops]
    if unknown:
        print(f"unknown operators: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("diffcheck")
    con = oracle_connection(args.sf)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            ok, msg = check_one(spark, con, ops[name], args.sf)
        except Exception as e:
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
            if "-v" in sys.argv or len(names) == 1:
                traceback.print_exc()
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name:32s} {dt:6.2f}s  {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
