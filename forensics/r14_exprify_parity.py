"""Round 14: exact value parity of the single-parse (F.expr) builder
forms vs the round-13 Column-API forms, on all three SFs plus hostile
edges.  Old forms load from a git snapshot of functions/dedup.py
(HEAD before this round's edits) under a shim module name.

Usage: git show <old>:dask_array_spark/functions/dedup.py > /tmp/dedup_old.py
       python forensics/r14_exprify_parity.py
"""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from dask_array_spark.session import get_spark  # noqa: E402
from dask_array_spark.sources.ingest import read_table  # noqa: E402
from dask_array_spark.functions import dedup as NEW  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "dask_array_spark.functions.dedup_old", "/tmp/dedup_old.py"
)
OLD = importlib.util.module_from_spec(spec)
sys.modules["dask_array_spark.functions.dedup_old"] = OLD
spec.loader.exec_module(OLD)

spark = get_spark("exprify-parity")
spark.sparkContext.setLogLevel("ERROR")


def diff(a, b):
    """symmetric exact difference row count"""
    return a.exceptAll(b).count() + b.exceptAll(a).count()


total_mismatch = 0
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    docs = read_table(spark, f"/root/testdata/{sf}", "documents")
    checks = {
        "shingle_hashes": (OLD.shingle_hashes(docs), NEW.shingle_hashes(docs)),
        "minhash_sigs": (
            OLD.minhash_signatures(OLD.shingle_hashes(docs), 16),
            NEW.minhash_signatures(NEW.shingle_hashes(docs), 16),
        ),
        "kgram_positions": (
            OLD.kgram_positions(docs, "text", 8),
            NEW.kgram_positions(docs, "text", 8),
        ),
        "lsh_pairs": (
            OLD.lsh_candidate_pairs(
                OLD.minhash_signatures(OLD.shingle_hashes(docs), 16), 1,
                persist=False),
            NEW.lsh_candidate_pairs(
                NEW.minhash_signatures(NEW.shingle_hashes(docs), 16), 1,
                persist=False),
        ),
        "duplicated_spans": (
            OLD.duplicated_spans(docs, k=8, persist=False),
            NEW.duplicated_spans(docs, k=8, persist=False),
        ),
        "clip_spans": (
            OLD.clip_duplicated_spans(
                docs, OLD.duplicated_spans(docs, k=8, persist=False)),
            NEW.clip_duplicated_spans(
                docs, NEW.duplicated_spans(docs, k=8, persist=False)),
        ),
    }
    for name, (a, b) in checks.items():
        m = diff(a, b)
        total_mismatch += m
        print(f"{sf:8s} {name:18s} mismatch_rows={m}")

# hostile edges: NULL/empty/whitespace/unicode text, 1-token docs,
# duplicate tokens, backtick in content (identifier quoting is about
# names, not values)
rows = [
    (0, None), (1, ""), (2, "   "), (3, "a"), (4, "a a a a a a a a a a"),
    (5, "héllo wörld ünïcode tokens here repeated here repeated here x"),
    (6, "tab\tand space mix one two three four five six seven eight"),
    (7, "emoji 😀 astral 𝔘𝔫𝔦 plane chars a b c d e f g h"),
    (8, "`backtick` 'quote' \"dquote\" ; -- injection looking , tokens x y z"),
]
hdf = spark.createDataFrame(rows, "doc_id long, text string")
for name, (a, b) in {
    "shingles_hostile": (OLD.shingle_hashes(hdf), NEW.shingle_hashes(hdf)),
    "kgram_hostile": (OLD.kgram_positions(hdf, "text", 8),
                      NEW.kgram_positions(hdf, "text", 8)),
    "sigs_hostile": (OLD.minhash_signatures(OLD.shingle_hashes(hdf), 16),
                     NEW.minhash_signatures(NEW.shingle_hashes(hdf), 16)),
    "spans_hostile": (OLD.duplicated_spans(hdf, k=8, persist=False),
                      NEW.duplicated_spans(hdf, k=8, persist=False)),
    "clip_hostile": (
        OLD.clip_duplicated_spans(
            hdf, OLD.duplicated_spans(hdf, k=8, persist=False)),
        NEW.clip_duplicated_spans(
            hdf, NEW.duplicated_spans(hdf, k=8, persist=False)),
    ),
}.items():
    m = diff(a, b)
    total_mismatch += m
    print(f"hostile  {name:18s} mismatch_rows={m}")

print("TOTAL_MISMATCH", total_mismatch)

# build-cost A/B (construction only, warm, min-of-3)
docs = read_table(spark, "/root/testdata/sf0.1", "documents")
for label, mod in (("old", OLD), ("new", NEW)):
    def build_minhash(mod=mod):
        return mod.lsh_candidate_pairs(
            mod.minhash_signatures(mod.shingle_hashes(docs), 16), 1)
    def build_spans(mod=mod):
        return mod.duplicated_spans(docs, k=8)
    for bname, fn in (("minhash_chain", build_minhash), ("spans", build_spans)):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        print(f"build {label} {bname:14s} min={min(ts)*1000:7.1f} ms")
