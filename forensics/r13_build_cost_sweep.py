"""Driver-side plan-CONSTRUCTION cost per bench slot (round 13).

The bench's methodology rebuilds each slot's DataFrame per timed rep
(a full plan + distributed run).  This sweep times ONLY the build --
fn(spark, sf) with no action -- after one warm call, min-of-3.  The
discovery (recorded in r13_construct_cost.json and the optimization
log): construction is ~5.5 s of the ~11.8 s 19-slot total, and for
the expression-tree-heavy slots it is py4j round-trips, not Catalyst
analysis (simhash_col alone: 0.41 s to construct, ~250 round-trips).
kmeans' 1.05 s "build" is real compute (fit executes Lloyd rounds).

Usage: python forensics/r13_build_cost_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from dask_array_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("build-sweep")
spark.sparkContext.setLogLevel("ERROR")
for name, fn in bench._headline():
    fn(spark, SF)  # warm (kmeans executes its Lloyd rounds here)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} build_min={min(ts):.3f}")
