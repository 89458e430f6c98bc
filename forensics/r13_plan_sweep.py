"""Red-flag sweep over every registered query's physical plan at sf0.01."""
import sys, re, traceback

sys.path.insert(0, "/root/repo")
from dask_array_spark.session import get_spark
from dask_array_spark import queries as Q

spark = get_spark("plan-sweep", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"

FLAGS = {
    "BatchEvalPython": "row-at-a-time Python UDF",
    "SortAggregate": "sort-based agg (no hash)",
    "CartesianProduct": "cartesian",
    "rdd": None,
}
rows = []
for name in sorted(Q.QUERIES):
    try:
        df = Q.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_smj = plan.count("SortMergeJoin")
        n_py = (plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"))
        n_sa = plan.count("SortAggregate")
        n_cp = plan.count("CartesianProduct")
        n_oha = plan.count("ObjectHashAggregate")
        n_win = plan.count("Window (") + plan.count("Window(")
        rows.append((name, n_ex, n_smj, n_py, n_sa, n_cp, n_oha))
    except Exception as e:
        rows.append((name, "ERR", str(e)[:80], "", "", "", ""))
print(f"{'query':35s} Ex SMJ Py SortAgg Cart OHA")
for r in rows:
    print(f"{r[0]:35s} " + " ".join(str(x) for x in r[1:]))
