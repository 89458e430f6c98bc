"""Old-vs-new multimodal kernel parity: exact equality on all SFs."""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location(
    "multimodal_old", "/tmp/r13old/multimodal_old.py"
)
OLD = importlib.util.module_from_spec(spec)
# the old module does relative imports of ..sources.ingest -- patch:
import dask_array_spark.functions.multimodal as NEW  # noqa: E402

OLD.__package__ = "dask_array_spark.functions"
sys.modules["multimodal_old"] = OLD
spec.loader.exec_module(OLD)

from dask_array_spark.session import get_spark  # noqa: E402
from dask_array_spark.sources import read_table  # noqa: E402

spark = get_spark("parity-mm", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")


def rows(df):
    return sorted([tuple(r) for r in df.collect()])


bad = 0
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    docs = read_table(spark, sf, "documents")
    d_old = OLD.attach_bytes(docs)
    d_new = NEW.attach_bytes(docs)
    for name, fo, fn in [
        ("byte_histogram", lambda d: OLD.byte_histogram(d, bins=16),
         lambda d: NEW.byte_histogram(d, bins=16)),
        ("fake_decode", OLD.fake_decode_features, NEW.fake_decode_features),
        ("frame_sample", OLD.frame_sample, NEW.frame_sample),
    ]:
        a = rows(fo(d_old))
        b = rows(fn(d_new))
        ok = a == b
        if not ok:
            bad += 1
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print(f"MISMATCH {sf} {name}: {len(a)} vs {len(b)} rows; first diffs {diffs}")
        else:
            print(f"ok {sf} {name}: {len(a)} rows identical")
print("PARITY-FAIL" if bad else "PARITY-OK")
