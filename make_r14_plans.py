"""Dump .explain("formatted") for every bench slot to plans/r14/.

Usage: python make_r14_plans.py before|after [slot,slot,...]

The optimization-round evidence trail: <slot>_before.txt is the plan
at the round's start (post green-check), <slot>_after.txt after the
round's changes.  Runs at the bench scale factor ($SPARK_GRAFT_SF_DIR,
default sf0.1) so the shapes match what bench.py times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    import bench
    from dask_array_spark.session import get_spark

    spark = get_spark("plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in bench._headline():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
