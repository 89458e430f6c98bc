"""Old-vs-new kmeans_fit parity: exact equality of codebooks and of the
final assignment on all SFs (k/iters as the bench demo + a second
config)."""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")

import dask_array_spark.functions.similarity as NEW  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "similarity_old", "/tmp/r13old/similarity_old.py"
)
OLD = importlib.util.module_from_spec(spec)
OLD.__package__ = "dask_array_spark.functions"
sys.modules["similarity_old"] = OLD
spec.loader.exec_module(OLD)

from dask_array_spark.session import get_spark  # noqa: E402
from dask_array_spark.sources import read_table  # noqa: E402

spark = get_spark("parity-km", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")


def rows(df):
    return sorted([tuple((tuple(v) if isinstance(v, list) else v) for v in r)
                   for r in df.collect()])


bad = 0
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    emb = read_table(spark, sf, "embeddings")
    for k, iters in ((4, 2), (3, 3)):
        co = OLD.kmeans_fit(emb, k=k, iters=iters)
        cn = NEW.kmeans_fit(emb, k=k, iters=iters)
        a, b = rows(co), rows(cn)
        if a != b:
            bad += 1
            print(f"MISMATCH fit {sf} k={k} iters={iters}")
            for x, y in list(zip(a, b))[:3]:
                if x != y:
                    print("  old", x, "\n  new", y)
        else:
            print(f"ok fit {sf} k={k} iters={iters}: {len(a)} cells identical")
        ao = rows(OLD.kmeans_assign(emb, co))
        an = rows(NEW.kmeans_assign(emb, cn))
        if ao != an:
            bad += 1
            print(f"MISMATCH assign {sf} k={k}")
        else:
            print(f"ok assign {sf} k={k}: {len(ao)} rows identical")
print("PARITY-FAIL" if bad else "PARITY-OK")
