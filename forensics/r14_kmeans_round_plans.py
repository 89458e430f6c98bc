"""Round 14 (verdict ask 5): REAL plan evidence for the round-13 fused
k-means Lloyd round.  The fit executes eagerly behind localCheckpoint,
so the r13 before/after snapshots of the ASSIGN plan were shape-
identical -- the removed join never appeared.  This script explains
the per-round codebook frame (`arr`, the input to localCheckpoint)
for the r12 UNFUSED form (assign + join back onto the posexploded
corpus) and the current FUSED form (argmin carries the embedding via
F.first), and writes both to plans/r14/.

Usage: git show 17ca8e0:dask_array_spark/functions/similarity.py \
         > /tmp/similarity_r12.py
       python forensics/r14_kmeans_round_plans.py
"""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dask_array_spark.session import get_spark  # noqa: E402
from dask_array_spark import queries as Q  # noqa: E402
from dask_array_spark.functions import similarity as NEW  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "dask_array_spark.functions.similarity_r12", "/tmp/similarity_r12.py"
)
OLD = importlib.util.module_from_spec(spec)
sys.modules["dask_array_spark.functions.similarity_r12"] = OLD
spec.loader.exec_module(OLD)

spark = get_spark("kmeans-plans")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
emb = Q._embs(spark, SF)
k = 4

cents = (
    emb.filter(F.col("vec_id") < k)
    .select(
        F.col("vec_id").cast("long").alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cemb"),
    )
    .localCheckpoint()
)


def one_round_old(cents):
    """The r12 unfused round body (17ca8e0), up to localCheckpoint."""
    asg = OLD.kmeans_assign(emb, cents, impl="sql").select("vec_id", "cell")
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "e"))
    newc = (
        ex.join(asg, on="vec_id")
        .groupBy("cell", "pos")
        .agg((F.round(F.avg(F.col("e").cast("double")), 6) + F.lit(0.0)).alias("c"))
    )
    return newc.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cemb")
    )


def one_round_new(cents):
    """The current fused round body, up to localCheckpoint."""
    sq = NEW._sqdist("embedding", "cemb")
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "embedding", "cell", (F.round(sq, 6) + F.lit(0.0)).alias("dist")
        )
    )
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.min_by(F.struct("cell", "dist"), F.struct("dist", "cell")).alias("__m"),
            F.first("embedding").alias("embedding"),
        )
        .select(F.col("__m.cell").cast("long").alias("cell"), "embedding")
    )
    newc = (
        best.select("cell", F.posexplode("embedding").alias("pos", "e"))
        .groupBy("cell", "pos")
        .agg((F.round(F.avg(F.col("e").cast("double")), 6) + F.lit(0.0)).alias("c"))
    )
    return newc.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cemb")
    )


for tag, fn in (("before", one_round_old), ("after", one_round_new)):
    df = fn(cents)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"/root/repo/plans/r14/kmeans_lloyd_round_{tag}.txt"
    with open(path, "w") as f:
        f.write(plan)
    njoin = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    print(f"wrote {path}: {len(plan)} bytes, corpus-side joins "
          f"(SMJ+SHJ)={njoin}, Exchange={plan.count('Exchange')}")

# sanity: the two round bodies produce the same codebook values
a = one_round_old(cents)
b = one_round_new(cents)
m = a.exceptAll(b).count() + b.exceptAll(a).count()
print("round-output parity mismatch rows:", m)
