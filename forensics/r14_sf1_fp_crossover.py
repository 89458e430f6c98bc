"""Round 14 (verdict ask 7): sf1-scale check of the text-fingerprint
crossover.  The r13 floor probe showed the bit-exact mapInArrow
codepoint kernel LOSES at sf0.1 (boundary cost > the ~0.3 s fold) but
the geometry flips at scale; this runs the same slot-shaped A/B
(polynomial fingerprint over the clipped corpus) at sf1 = 50k docs,
ABAB min-of-6, and decides ship/park.

Usage: python forensics/r14_sf1_fp_crossover.py  (needs .scaledata/sf1)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from dask_array_spark.functions import dedup as D
from dask_array_spark.functions.text import P, SEED, polyhash_col
from dask_array_spark.session import get_spark
from dask_array_spark.sources.ingest import read_table

SF1 = "/root/repo/.scaledata/sf1"


def _polyhash_np(strs):
    n = len(strs)
    lens = np.fromiter(map(len, strs), count=n, dtype=np.int64)
    total = int(lens.sum())
    out = np.full(n, SEED, dtype=np.int64)
    if total == 0:
        return out
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    maxlen = int(lens.max())
    pw = np.empty(maxlen + 1, dtype=np.int64)
    pw[0] = 1
    for k in range(1, maxlen + 1):
        pw[k] = pw[k - 1] * 31 % P
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    exp = np.repeat(offs + lens - 1, lens) - np.arange(total, dtype=np.int64)
    term = flat * pw[exp] % P
    # pad one zero so an empty string at the batch tail (offset ==
    # total) stays a valid reduceat index WITHOUT stealing the last
    # char from the preceding row; empty rows are zeroed below
    term = np.append(term, np.int64(0))
    segsum = np.add.reduceat(term, np.maximum(offs, 0))[: n]
    segsum[lens == 0] = 0
    return (SEED * pw[lens] + segsum) % P


def fp_kernel(it):
    for batch in it:
        col = batch.column("text")
        valid = np.ones(len(col), dtype=bool) if col.null_count == 0 else \
            ~np.asarray(col.is_null())
        strs = [s if s is not None else "" for s in col.to_pylist()]
        fp = _polyhash_np(strs)
        arrs = [batch.column(i) for i in range(batch.num_columns)
                if batch.schema.names[i] != "text"]
        names = [nm for nm in batch.schema.names if nm != "text"]
        yield pa.RecordBatch.from_arrays(
            arrs + [pa.array(fp, type=pa.int64(), mask=~valid)],
            names=names + ["d"])


spark = get_spark("sf1-fp-crossover")
spark.sparkContext.setLogLevel("ERROR")
docs = read_table(spark, SF1, "documents")
spans = D.duplicated_spans(docs, k=8).persist()
clipped = D.clip_duplicated_spans(docs, spans).persist()
clipped.count()

cat = clipped.select(
    F.col("doc_id").alias("a"), F.col("n_tokens_kept").alias("b"),
    F.col("n_tokens_removed").alias("c"), polyhash_col(F.col("text")).alias("d"))
arr = clipped.select(
    F.col("doc_id").alias("a"), F.col("n_tokens_kept").alias("b"),
    F.col("n_tokens_removed").alias("c"), "text") \
    .mapInArrow(fp_kernel, schema="a long, b long, c long, d long")

j = cat.alias("o").join(arr.alias("n"), on="a")
bad = j.filter((F.col("o.d") != F.col("n.d")) |
               (F.col("o.d").isNull() != F.col("n.d").isNull())).count()
print("sf1 parity mismatches:", bad, "rows:", cat.count())


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(cat); noop(arr)
tc, ta = [], []
for _ in range(6):
    t0 = time.perf_counter(); noop(cat); tc.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); noop(arr); ta.append(time.perf_counter() - t0)
print("catalyst reps", [round(x, 3) for x in tc], "min", round(min(tc), 3),
      "median", round(sorted(tc)[3], 3))
print("arrow    reps", [round(x, 3) for x in ta], "min", round(min(ta), 3),
      "median", round(sorted(ta)[3], 3))
print("min speedup", round(min(tc) / min(ta), 2))
