"""Same-session ABAB A/B for the round-13 bind-once rewrites, measured
on the DECLARED queries they feed (pipeline_clean_corpus and
text_suite at sf0.1, noop sink, min-of-N).  The old forms are injected
by monkeypatching the column constructors during plan BUILD only --
queries.py resolves them at call time -- so both legs run the same
driver code in one session and ambient drift cancels.

Run: python forensics/r13_bindonce_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_array_spark.session import get_spark
from dask_array_spark.functions import text as T
from dask_array_spark.functions import governance as G
from dask_array_spark import queries as Q

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "6"))


def quality_col_r12(text_col="text", toks=None):
    toks = T._toks_or(text_col, toks)
    n = F.size(toks).cast("double")
    length_term = F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    stop_pen = (
        F.size(F.filter(toks, lambda t: t.isin(T.STOPWORDS))).cast("double")
        / n
        * 0.5
    )
    return F.when(
        n > 0,
        F.round(
            F.greatest(
                F.lit(0.0),
                F.least(F.lit(1.0), length_term * 0.4 + diversity * 0.6 - stop_pen),
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))


def split_col_r12(id_col="doc_id", weights=(80, 10, 10), salt="s1"):
    bucket = (
        T.polyhash_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        % F.lit(100)
    )
    t_end = weights[0]
    v_end = weights[0] + weights[1]
    return (
        F.when(bucket < t_end, F.lit("train"))
        .when(bucket < v_end, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def build(qname, old: bool):
    if old:
        saved = (T.quality_col, G.split_col)
        T.quality_col, G.split_col = quality_col_r12, split_col_r12
        try:
            return Q.QUERIES[qname](spark, SF)
        finally:
            T.quality_col, G.split_col = saved
    return Q.QUERIES[qname](spark, SF)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("r13-bindonce-ab")
spark.sparkContext.setLogLevel("ERROR")

out = {}
for qname in ("pipeline_clean_corpus", "text_suite"):
    old_df, new_df = build(qname, True), build(qname, False)
    noop(old_df)
    noop(new_df)  # warm both plans
    olds, news = [], []
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"{qname} old rep{i}")
        t0 = time.perf_counter()
        noop(old_df)
        olds.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"{qname} new rep{i}")
        t0 = time.perf_counter()
        noop(new_df)
        news.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    out[qname] = {
        "old_all": [round(x, 4) for x in olds],
        "new_all": [round(x, 4) for x in news],
        "old_min": round(min(olds), 4),
        "new_min": round(min(news), 4),
        "speedup": round(min(olds) / min(news), 3),
    }

print(json.dumps(out, indent=2))
with open(
    os.path.join(os.path.dirname(__file__), "r13_bindonce_ab.json"), "w"
) as f:
    json.dump(out, f, indent=2)
