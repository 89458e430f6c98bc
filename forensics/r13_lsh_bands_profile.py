"""LSH banding fan-out profile beyond the bench defaults (round 13,
"Not yet optimized" item 5: nobody had profiled the banding fan-out
past sf1 / k=16).

One session, sf1 corpus (50k documents).  For each signature count k
(= band count at rows_per_band=1), time the full candidate-pair
pipeline (shingles -> minhash -> banded self-join -> pair agg) through
the noop sink, min-of-N warm, and record the candidate-pair count and
the band-table size the self-join fans out over.  Also times the
rows_per_band=2 aggregate-banding form at k=32 (the ObjectHashAggregate
leg) so the two banding shapes are compared at the same k.

Usage: python forensics/r13_lsh_bands_profile.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dask_array_spark import queries as Q  # noqa: E402
from dask_array_spark.functions import dedup as D  # noqa: E402
from dask_array_spark.session import get_spark  # noqa: E402

SF1 = os.path.join("/root/repo", ".scaledata", "sf1")
if not os.path.exists(os.path.join(SF1, "documents.parquet")):
    import make_scale_data

    make_scale_data.main(copies=10, out="sf1")

REPS = int(os.environ.get("AB_REPS", "4"))

spark = get_spark("r13-lsh-bands")
spark.sparkContext.setLogLevel("ERROR")
docs = Q._docs(spark, SF1)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def pipeline(k: int, rows_per_band: int = 1):
    sh = D.shingle_hashes(docs)
    sigs = D.minhash_signatures(sh, k=k)
    return D.lsh_candidate_pairs(sigs, rows_per_band=rows_per_band)


out = []
for label, k, rpb in [
    ("k16_rpb1 (bench default)", 16, 1),
    ("k32_rpb1", 32, 1),
    ("k64_rpb1", 64, 1),
    ("k32_rpb2 (aggregate banding)", 32, 2),
]:
    pairs = pipeline(k, rpb)
    noop(pairs)  # warm (also populates the persisted band tables)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        noop(pairs)
        ts.append(time.perf_counter() - t0)
    n_pairs = pairs.count()
    n_bands_rows = 50_000 * (k // rpb)
    out.append(
        {
            "config": label,
            "k": k,
            "rows_per_band": rpb,
            "min_sec": round(min(ts), 3),
            "reps": [round(t, 3) for t in ts],
            "candidate_pairs": n_pairs,
            "band_table_rows": n_bands_rows,
        }
    )
    print(out[-1])
    D.release_caches(spark=spark)

path = os.path.join(os.path.dirname(__file__), "r13_lsh_bands_profile.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path)
