"""Same-session interleaved A/B for the round-13 committed changes.

The box's ambient throughput drifted ~1.6-2x between the before/after
full-bench runs (untouched slots inflated identically), so cross-run
bench deltas are unreadable today.  This script removes the machine
from the comparison: ONE Spark session, the r12 form (extracted from
git at 2d4749d into /tmp/r13old/) and the r13 form timed in strict
ABAB alternation through the noop sink, min-of-N reported for each.

Covers the three slots the round-13 optimization commit (18bc2ca)
touched: media_byte_histogram (mapInPandas -> mapInArrow byte
kernels), text_quality (tokenize-once two-step projection),
kmeans_codebook (fused Lloyd assign+mean round).

Usage: extract the old modules first --
  mkdir -p /tmp/r13old
  git show 2d4749d:dask_array_spark/functions/multimodal.py > /tmp/r13old/multimodal_old.py
  git show 2d4749d:dask_array_spark/functions/similarity.py > /tmp/r13old/similarity_old.py
  git show 2d4749d:dask_array_spark/functions/text.py       > /tmp/r13old/text_old.py
then: python forensics/r13_bench_ab.py
"""
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def load_old(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # old modules do relative imports (..sources.ingest, .text);
    # resolve them against the installed package
    mod.__package__ = "dask_array_spark.functions"
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


OLD_MM = load_old("multimodal_old", "/tmp/r13old/multimodal_old.py")
OLD_SIM = load_old("similarity_old", "/tmp/r13old/similarity_old.py")
OLD_T = load_old("text_old", "/tmp/r13old/text_old.py")

import dask_array_spark.functions.multimodal as NEW_MM  # noqa: E402
import dask_array_spark.functions.similarity as NEW_SIM  # noqa: E402
import dask_array_spark.functions.text as NEW_T  # noqa: E402
from dask_array_spark import queries as Q  # noqa: E402
from dask_array_spark.session import get_spark  # noqa: E402
from dask_array_spark.sources import read_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))

spark = get_spark("r13-ab")
spark.sparkContext.setLogLevel("ERROR")
docs = read_table(spark, SF, "documents")
emb = Q._embs(spark, SF)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0


PAIRS = {
    "media_byte_histogram": (
        lambda: OLD_MM.byte_histogram(OLD_MM.attach_bytes(docs), bins=16),
        lambda: NEW_MM.byte_histogram(NEW_MM.attach_bytes(docs), bins=16),
    ),
    "text_quality": (
        lambda: OLD_T.quality_score(docs),
        lambda: NEW_T.quality_score(docs),
    ),
    "kmeans_codebook": (
        lambda: OLD_SIM.kmeans_assign(emb, OLD_SIM.kmeans_fit(emb, k=4, iters=2)),
        lambda: NEW_SIM.kmeans_assign(emb, NEW_SIM.kmeans_fit(emb, k=4, iters=2)),
    ),
}

out = {"sf": SF, "reps": REPS, "loadavg_start": list(os.getloadavg())}
for name, (fo, fn) in PAIRS.items():
    spark.sparkContext.setJobDescription(f"ab:{name}")
    timed(fo)  # warm both forms (JIT, arrow workers, page cache)
    timed(fn)
    olds, news = [], []
    for _ in range(REPS):  # strict ABAB: drift hits both forms equally
        olds.append(timed(fo))
        news.append(timed(fn))
    out[name] = {
        "old_reps": [round(x, 3) for x in olds],
        "new_reps": [round(x, 3) for x in news],
        "old_min": round(min(olds), 3),
        "new_min": round(min(news), 3),
        "speedup": round(min(olds) / max(min(news), 1e-9), 2),
    }
    print(name, json.dumps(out[name]))
out["loadavg_end"] = list(os.getloadavg())
with open("/root/repo/forensics/r13_bench_ab.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote forensics/r13_bench_ab.json")
