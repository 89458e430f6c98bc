"""Same-session ABAB A/B: lang_id r12 greatest+CaseWhen chain vs r13
single-pass aggregate fold, noop sink, min-of-N.  One Spark session so
ambient drift hits both forms equally (round-13 protocol).

Run: python forensics/r13_langid_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_array_spark.session import get_spark
from dask_array_spark.functions.text import (
    LANG_MARKERS,
    lang_id_col,
    with_tokens,
    TOKS,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "6"))


def lang_id_col_r12(toks):
    def marker_filter(m):
        return lambda t: t.isin(m)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(m)))
        for lang, m in sorted(LANG_MARKERS.items())
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when(scores[l] == best, F.lit(l)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("r13-langid-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    db = with_tokens(docs)
    tk = F.col(TOKS)

    old_df = db.select("doc_id", lang_id_col_r12(tk).alias("pred_lang"))
    new_df = db.select(
        "doc_id", lang_id_col("text", toks=tk).alias("pred_lang")
    )

    # warm both plans once (JIT, file listing)
    noop(old_df)
    noop(new_df)

    olds, news = [], []
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"langid old rep{i}")
        t0 = time.perf_counter()
        noop(old_df)
        olds.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"langid new rep{i}")
        t0 = time.perf_counter()
        noop(new_df)
        news.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {
        "slot": "text_lang_id (standalone column, sf0.1 noop)",
        "reps": REPS,
        "old_all": [round(x, 4) for x in olds],
        "new_all": [round(x, 4) for x in news],
        "old_min": round(min(olds), 4),
        "new_min": round(min(news), 4),
        "speedup": round(min(olds) / min(news), 3),
    }
    print(json.dumps(out, indent=2))
    with open(
        os.path.join(os.path.dirname(__file__), "r13_langid_ab.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
