"""Dump .explain('formatted') for named operators to plans/<tag>/.

Usage: python -m tools.dumpplans <tag> <op> [<op> ...]
Writes plans/<tag>/<op>_<suffix>.txt (suffix via $PLAN_SUFFIX, default
'before'). Ops that materialize side state before returning their
DataFrame (table/stream lifecycles) still work — the plan captured is
the one the bench's noop sink executes.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag, names = sys.argv[1], sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join("plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from logdb_spark.plans.session import get_spark
    from logdb_spark.registry import all_operators

    spark = get_spark("dumpplans")
    ops = all_operators()
    for name in names:
        df = ops[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        spark.catalog.clearCache()
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
