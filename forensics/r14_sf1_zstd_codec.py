"""Round 14 (verdict ask 8): lz4 vs zstd shuffle/IO codec at sf1,
fresh SparkContext per leg (spark.io.compression.codec is not
runtime-settable).  Workload: the two shuffle-heaviest operators at
sf1 (minhash candidate-pair chain and the ExactSubstr seed join),
min-of-4 warm reps through the noop sink per codec, interleaved
subprocess legs (L, Z, L, Z) so ambient drift hits both codecs.

Usage: python forensics/r14_sf1_zstd_codec.py
"""
import json
import subprocess
import sys

LEG = r'''
import sys, time
sys.path.insert(0, "/root/repo")
codec = sys.argv[1]
from pyspark.sql import SparkSession
import os
builder = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName(f"codec-{codec}")
    .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.io.compression.codec", codec)
)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from dask_array_spark.sources.ingest import read_table
from dask_array_spark.functions import dedup as D
SF1 = "/root/repo/.scaledata/sf1"
docs = read_table(spark, SF1, "documents")
def noop(df): df.write.format("noop").mode("overwrite").save()
def minhash():
    return D.lsh_candidate_pairs(
        D.minhash_signatures(D.shingle_hashes(docs), 16), rows_per_band=1,
        persist=False)
def spans():
    return D.duplicated_spans(docs, k=8, persist=False)
out = {}
for name, fn in (("minhash_sf1", minhash), ("spans_sf1", spans)):
    noop(fn())
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); noop(fn()); ts.append(time.perf_counter() - t0)
    out[name] = [round(t, 3) for t in ts]
print("RESULT " + codec + " " + repr(out))
'''

runs = {}
for codec in ("lz4", "zstd", "lz4", "zstd"):
    r = subprocess.run([sys.executable, "-c", LEG, codec],
                       capture_output=True, text=True)
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
    if not line:
        print(r.stderr[-500:])
        sys.exit(1)
    _, c, payload = line[0].split(" ", 2)
    d = eval(payload)  # trusted self-output
    for k, v in d.items():
        runs.setdefault((c, k), []).extend(v)
    print(line[0])

summary = {}
for (c, k), ts in runs.items():
    summary.setdefault(k, {})[c] = {"min": min(ts), "reps": ts}
for k, d in summary.items():
    print(k, "lz4 min", d["lz4"]["min"], "zstd min", d["zstd"]["min"],
          "zstd/lz4", round(d["zstd"]["min"] / d["lz4"]["min"], 3))
with open("/root/repo/forensics/r14_sf1_zstd_codec.json", "w") as f:
    json.dump(summary, f, indent=1)
