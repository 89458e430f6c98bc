"""Round 14 (verdict ask 6): guarded hash-aggregatable packed argmin
vs the min_by(struct,struct) SortAggregate -- parity on hostile
distances (NULL / NaN / ties / zeros / huge) and an ABAB on the
kmeans_codebook slot shape.

Packing (bit-exact replication of min_by(struct(dist asc, cell asc))
for dist = round(x, 6) + 0.0, i.e. non-negative-or-NULL-or-NaN,
never -0.0):
  cell guard first:   cell outside [0, 2^20) -> raise_error
  dist IS NULL     -> -2^20 + cell          (NULL sorts FIRST)
  isnan(dist)      ->  2^62 + cell          (NaN sorts LAST)
  dl >= 2^42       -> raise_error           (would overflow the pack)
  else             ->  dl * 2^20 + cell,  dl = CAST(round(dist*1e6) AS BIGINT)
Decode: cell = pmod(p, 2^20); dist = NULL / NaN / (p DIV 2^20)/1e6.
"""
import sys, time

sys.path.insert(0, "/root/repo")

from dask_array_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("argmin-ab")
spark.sparkContext.setLogLevel("ERROR")

CAP_CELL = 1 << 20
CAP_DL = 1 << 42
NAN_BASE = 1 << 62


def packed_expr(cell="cell", dist="dist"):
    return (
        f"CASE WHEN {cell} < 0 OR {cell} >= {CAP_CELL} THEN "
        f"CAST(raise_error('argmin cell id out of [0, 2^20)') AS BIGINT) "
        f"WHEN {dist} IS NULL THEN CAST({-(1 << 20)} AS BIGINT) + {cell} "
        f"WHEN isnan({dist}) THEN CAST({NAN_BASE} AS BIGINT) + {cell} "
        f"WHEN CAST(round({dist} * 1000000.0) AS BIGINT) >= {CAP_DL} THEN "
        f"CAST(raise_error('argmin dist too large to pack (>= 2^42/1e6)') AS BIGINT) "
        f"ELSE CAST(round({dist} * 1000000.0) AS BIGINT) * {CAP_CELL} + {cell} END"
    )


def cell_expr(p="__p"):
    return f"CAST(pmod({p}, {CAP_CELL}) AS BIGINT)"


def dist_expr(p="__p"):
    return (
        f"CASE WHEN {p} < 0 THEN CAST(NULL AS DOUBLE) "
        f"WHEN {p} >= CAST({NAN_BASE} AS BIGINT) THEN CAST('NaN' AS DOUBLE) "
        f"ELSE CAST({p} DIV {CAP_CELL} AS DOUBLE) / 1000000.0 END"
    )


# ---- parity: hostile scored table, old vs packed -------------------------
rows = []
import random
random.seed(11)
vals = [None, float("nan"), 0.0, 1e-6, 2.5, 4.0, 4.398046e6 - 1, 123.456789,
        0.123456, 3.999999]
for vid in range(4000):
    kcells = random.randint(1, 6)
    for c in range(kcells):
        rows.append((vid, c, random.choice(vals)))
# deliberate tie groups
rows += [(100001, 0, 1.5), (100001, 1, 1.5), (100002, 5, None), (100002, 2, None),
         (100003, 3, float("nan")), (100003, 1, float("nan")),
         (100004, 0, 0.0), (100004, 1, 0.0)]
df = spark.createDataFrame(rows, "vec_id long, cell long, dist double").persist()
df.count()

old = (
    df.groupBy("vec_id")
    .agg(F.min_by(F.struct("cell", "dist"), F.struct("dist", "cell")).alias("m"))
    .selectExpr("vec_id", "m.cell AS cell", "m.dist AS dist")
)
new = (
    df.selectExpr("vec_id", f"{packed_expr()} AS __pp")
    .groupBy("vec_id")
    .agg(F.expr("min(__pp) AS __p"))
    .selectExpr("vec_id", f"{cell_expr()} AS cell", f"{dist_expr()} AS dist")
)
m = old.exceptAll(new).count() + new.exceptAll(old).count()
print("hostile parity mismatch rows:", m)

# guard trips loudly?
bad = spark.createDataFrame([(1, 0, 5.0e6)], "vec_id long, cell long, dist double")
try:
    bad.selectExpr(f"{packed_expr()} AS p").collect()
    print("guard: DID NOT RAISE (bad)")
except Exception:
    print("guard: raised on dist >= 2^42/1e6 (good)")
bad2 = spark.createDataFrame([(1, 1 << 21, 1.0)], "vec_id long, cell long, dist double")
try:
    bad2.selectExpr(f"{packed_expr()} AS p").collect()
    print("cell guard: DID NOT RAISE (bad)")
except Exception:
    print("cell guard: raised on cell >= 2^20 (good)")

# ---- plan: HashAggregate? -------------------------------------------------
plan = new._sc._jvm.PythonSQLUtils.explainString(new._jdf.queryExecution(), "simple")
print("packed argmin plan nodes:",
      "HashAggregate" if "HashAggregate" in plan else "?",
      "| SortAggregate present:", "SortAggregate" in plan)
oldplan = old._sc._jvm.PythonSQLUtils.explainString(old._jdf.queryExecution(), "simple")
print("min_by plan: SortAggregate present:", "SortAggregate" in oldplan)

# ---- ABAB on the kmeans slot shape ---------------------------------------
from dask_array_spark import queries as Q
from dask_array_spark.functions import similarity as SIM

SF = "/root/testdata/sf0.1"
emb = Q._embs(spark, SF)


def assign_old():
    return SIM.kmeans_assign(emb, SIM.kmeans_fit(emb, k=4, iters=2))


def noop(d):
    d.write.format("noop").mode("overwrite").save()


# the packed form of the full slot needs the patched module; this probe
# only times the CURRENT form twice as an ambient control when run
# pre-patch, and old-vs-new when the patch is in the working tree.
noop(assign_old())
ts = []
for _ in range(4):
    t0 = time.perf_counter(); noop(assign_old()); ts.append(time.perf_counter() - t0)
print("kmeans slot (current form) reps:", [round(x, 3) for x in ts], "min", round(min(ts), 3))
