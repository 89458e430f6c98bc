"""Does interpreted Project CSE share repeated filter(split(text)) subtrees?
Relative timing: quality_col (6 textual refs) vs materialized-toks variant.
Machine is loaded; only the RATIO matters here (same session, interleaved)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from dask_array_spark.session import get_spark
from dask_array_spark.functions.text import quality_col, tokens_col

spark = get_spark("cse-probe", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

# synthetic docs: 200k rows of ~40 tokens
words = "alpha beta gamma delta the a of and epsilon zeta"
docs = spark.range(200_000).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[F.lit(w) for w in (words.split() * 4)]).alias("text"),
)
docs = docs.withColumn("text", F.concat(F.col("text"), F.lit(" tok"), F.col("doc_id").cast("string")))
docs = docs.localCheckpoint()

q1 = docs.select("doc_id", quality_col("text").alias("quality"))

# variant: materialize the token array once in a lower projection
toks = tokens_col("text")
base = docs.select("doc_id", toks.alias("__toks"))
t = F.col("__toks")
n = F.size(t).cast("double")
length_term = F.least(F.size(t).cast("double") / F.lit(100.0), F.lit(1.0))
diversity = F.size(F.array_distinct(t)).cast("double") / n
from dask_array_spark.functions.text import STOPWORDS
stop_pen = F.size(F.filter(t, lambda x: x.isin(STOPWORDS))).cast("double") / n * 0.5
qexpr = F.when(
    n > 0,
    F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), length_term * 0.4 + diversity * 0.6 - stop_pen)), 6),
).otherwise(F.lit(0.0))
q2 = base.select("doc_id", qexpr.alias("quality"))

print("q2 plan projects:", q2._jdf.queryExecution().executedPlan().toString().count("Project"))

def t_run(df):
    df.write.format("noop").mode("overwrite").save()

for df in (q1, q2):
    t_run(df)  # warm
ts = {}
for name, df in (("sixref", q1), ("materialized", q2), ("sixref2", q1), ("materialized2", q2)):
    t0 = time.perf_counter()
    t_run(df)
    ts[name] = round(time.perf_counter() - t0, 3)
print(ts)
# sanity: identical values
a = sorted(map(tuple, q1.collect()))
b = sorted(map(tuple, q2.collect()))
print("values identical:", a == b)
