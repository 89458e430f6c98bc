"""polyhash_col floor probes (round 13, resume session).

The substring-spans decomposition showed the char-level polynomial
fingerprint (~0.3 s at sf0.1) is the slot's dominant term, so both
candidate routes below the current per-char interpreted fold were
prototyped, parity-proven, and MEASURED before deciding.  Both lose
at bench scale; the measured record lives in
``r13_polyhash_floor.json`` and the optimization log ("Floor probes
on resume").

Probe A — pure-Catalyst 6-char deferred-mod Horner: P = 1e9+7 admits
deferring the mod across exactly 6 chars in int64 ((P-1)*31^6 +
sum(c_i*31^k) ~ 8.9e17 < 2^63), bit-identical by modular algebra.
With the chars array bound once via the round's lambda device the
form is parity-exact but SLOWER (per-char element_at+cast+ascii
dispatch > the saved lambda steps and mods).  A naive variant that
references the chars subtree directly re-evaluates split+filter per
element_at — O(n^2), measured 34 s vs 0.29 (the unshared-subtree
class, seen from the other side).

Probe B — bit-exact mapInArrow codepoint kernel: Spark's
split(s,"")+ascii sequence equals Python ord code points exactly
(astral plane, combining marks, control chars — probed live), so the
kernel linearizes the fold: one utf-32 encode of the joined batch,
per-term cp*31^exp % P via a powers table, np.add.reduceat row sums,
one mod per row.  Parity 0 mismatches on corpus + hostile edges;
min-of-6 ~even (0.615 vs 0.679) but median ~1.09 vs ~0.70 — the
JVM->Python->JVM boundary and its variance exceed the fold's ~0.3 s.

Usage: python forensics/r13_polyhash_floor.py [catalyst|arrow]
(runs both probes by default; each opens its own Spark session).
"""
import subprocess
import sys

# Each probe runs in its own subprocess so the two Spark sessions
# (different configs would not matter, but warm-JIT cross-talk would)
# cannot contaminate each other's timings.

CATALYST_PROBE = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from dask_array_spark import queries as Q
from dask_array_spark.functions.text import P, SEED, polyhash_col, tokens_col
from dask_array_spark.session import get_spark

K = 6
POW = [31**e for e in range(K + 1)]

def polyhash_chunked(s, finish=None):
    chars = F.filter(F.split(s, ""), lambda x: x != "")

    def body(ch):
        n = F.size(ch)
        nfull = (n / K).cast("long")
        init = F.lit(SEED).cast("long")
        idx = F.when(nfull >= 1, F.sequence(F.lit(0).cast("long"), nfull - 1)).otherwise(
            F.array().cast("array<long>"))

        def chunk_step(acc, j):
            t = acc * F.lit(POW[K]).cast("long")
            for k in range(1, K + 1):
                t = t + F.ascii(F.element_at(ch, (j * K + k).cast("int"))) * F.lit(
                    POW[K - k]).cast("long")
            return t % F.lit(P)

        main = F.aggregate(idx, init, chunk_step)
        tail_idx = F.when(
            n > nfull * K, F.sequence((nfull * K + 1), n.cast("long"))
        ).otherwise(F.array().cast("array<long>"))
        merge = lambda acc, i: (acc * 31 + F.ascii(F.element_at(ch, i.cast("int")))) % F.lit(P)
        fold = F.aggregate(tail_idx, main, merge, finish) if finish is not None \
            else F.aggregate(tail_idx, main, merge)
        return F.when(ch.isNull(), F.lit(None).cast("long")).otherwise(fold)

    return F.transform(F.array(chars), body)[0]

spark = get_spark("poly-floor-catalyst"); spark.sparkContext.setLogLevel("ERROR")
docs = Q._docs(spark, "/root/testdata/sf0.1")

bad = docs.select((polyhash_col(F.col("text")) == polyhash_chunked(F.col("text"))).alias("ok")) \
          .filter(~F.col("ok") | F.col("ok").isNull()).count()
print("corpus mismatches:", bad)
rows = [("",), (None,), ("a",), ("abcde",), ("abcdef",), ("abcdefg",),
        ("héllo wörld ünïcode",),
        ("x" * 5,), ("x" * 6,), ("x" * 7,), ("x" * 12,), ("x" * 13,), ("x" * 1000,),
        ("\U0001F600 astral \U0010FFFF plane",), ("tab\tnew\nline",), (" ",)]
hdf = spark.createDataFrame(rows, "text string")
mism = hdf.select(polyhash_col(F.col("text")).alias("o"),
                  polyhash_chunked(F.col("text")).alias("n")) \
          .filter((F.col("o") != F.col("n")) | (F.col("o").isNull() != F.col("n").isNull())).count()
print("hostile mismatches:", mism)

def noop(df): df.write.format("noop").mode("overwrite").save()
forms = [
    ("doc_old", docs.select("doc_id", polyhash_col(F.col("text")).alias("fp"))),
    ("doc_new", docs.select("doc_id", polyhash_chunked(F.col("text")).alias("fp"))),
    ("tok_old", docs.select("doc_id", F.transform(tokens_col("text"), lambda t: polyhash_col(t)).alias("h"))),
    ("tok_new", docs.select("doc_id", F.transform(tokens_col("text"), lambda t: polyhash_chunked(t)).alias("h"))),
]
for n_, df in forms: noop(df)
res = {n_: [] for n_, _ in forms}
for _ in range(6):
    for n_, df in forms:
        t0 = time.perf_counter(); noop(df); res[n_].append(time.perf_counter() - t0)
for n_, ts in res.items():
    print(n_, round(min(ts), 3), [round(t, 3) for t in ts])
'''

ARROW_PROBE = r'''
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from dask_array_spark import queries as Q
from dask_array_spark.functions import dedup as D
from dask_array_spark.functions.text import P, SEED, polyhash_col
from dask_array_spark.session import get_spark

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
    segsum = np.add.reduceat(term, np.maximum(offs, 0))
    segsum[lens == 0] = 0
    return (SEED * pw[lens] + segsum) % P

def fp_kernel(it):
    for batch in it:
        col = batch.column("text")
        valid = np.ones(len(col), dtype=bool) if col.null_count == 0 else \
            ~np.asarray(col.is_null())
        strs = [s if s is not None else "" for s in col.to_pylist()]
        fp = _polyhash_np(strs)
        arrs = [batch.column(i) for i in range(batch.num_columns) if batch.schema.names[i] != "text"]
        names = [nm for nm in batch.schema.names if nm != "text"]
        yield pa.RecordBatch.from_arrays(arrs + [pa.array(fp, type=pa.int64(), mask=~valid)],
                                         names=names + ["d"])

spark = get_spark("poly-floor-arrow"); spark.sparkContext.setLogLevel("ERROR")
docs = Q._docs(spark, "/root/testdata/sf0.1")
spans = D.duplicated_spans(docs, k=8).persist()
clipped = D.clip_duplicated_spans(docs, spans)

old = clipped.select(
    F.col("doc_id").alias("a"), F.col("n_tokens_kept").alias("b"),
    F.col("n_tokens_removed").alias("c"), polyhash_col(F.col("text")).alias("d"))
new = clipped.select(
    F.col("doc_id").alias("a"), F.col("n_tokens_kept").alias("b"),
    F.col("n_tokens_removed").alias("c"), "text") \
    .mapInArrow(fp_kernel, schema="a long, b long, c long, d long")

j = old.alias("o").join(new.alias("n"), on="a")
bad = j.filter((F.col("o.d") != F.col("n.d")) | (F.col("o.d").isNull() != F.col("n.d").isNull())).count()
print("parity mismatches:", bad, "counts:", old.count(), new.count())
rows = [(1, None), (2, ""), (3, "a"), (4, "\U0001F600 astral \U0010FFFF"),
        (5, "é é mixed 日本語"), (6, "x" * 30000), (7, " ")]
hdf = spark.createDataFrame(rows, "doc_id long, text string")
ho = hdf.select("doc_id", polyhash_col(F.col("text")).alias("d"))
hn = hdf.select("doc_id", F.lit(0).cast("long").alias("b"), F.lit(0).cast("long").alias("c"), "text") \
        .mapInArrow(fp_kernel, schema="doc_id long, b long, c long, d long").select("doc_id", "d")
hm = ho.alias("o").join(hn.alias("n"), on="doc_id") \
       .filter((F.col("o.d") != F.col("n.d")) | (F.col("o.d").isNull() != F.col("n.d").isNull())).count()
print("hostile mismatches:", hm)

def noop(df): df.write.format("noop").mode("overwrite").save()
forms = [("catalyst_fp", old), ("arrow_fp", new)]
for n_, df in forms: noop(df)
res = {n_: [] for n_, _ in forms}
for _ in range(6):
    for n_, df in forms:
        t0 = time.perf_counter(); noop(df); res[n_].append(time.perf_counter() - t0)
for n_, ts in res.items():
    print(n_, round(min(ts), 3), [round(t, 3) for t in ts])
'''


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("catalyst", "both"):
        subprocess.run([sys.executable, "-c", CATALYST_PROBE], check=True)
    if which in ("arrow", "both"):
        subprocess.run([sys.executable, "-c", ARROW_PROBE], check=True)


if __name__ == "__main__":
    main()
