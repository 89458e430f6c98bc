"""Round 14: decompose the construction ledger's four slots into
sub-component build times (driver-side py4j cost, no actions except
the ones the builders themselves run).

Usage: python forensics/r14_build_decompose.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dask_array_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("build-decompose")
spark.sparkContext.setLogLevel("ERROR")


def t(label, fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} min={min(ts)*1000:8.1f} ms")


from dask_array_spark.sources.ingest import read_table, with_dense_index, from_table_arrays  # noqa: E402
from dask_array_spark import queries as Q  # noqa: E402
from dask_array_spark.functions import dedup as D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

print("== read path ==")
t("read_table(lineitem)", lambda: read_table(spark, SF, "lineitem"))
t("read_table(documents)", lambda: read_table(spark, SF, "documents"))
t("spark.read.parquet raw", lambda: spark.read.parquet(f"{SF}/lineitem.parquet"))
sch = spark.read.parquet(f"{SF}/lineitem.parquet").schema
t("spark.read.schema(s).parquet", lambda: spark.read.schema(sch).parquet(f"{SF}/lineitem.parquet"))
t("conf.set ansi", lambda: spark.conf.set("spark.sql.ansi.enabled", "false"))

print("== matmul_gram ==")
t("  _nation_month_matrix", lambda: Q._nation_month_matrix(spark, SF))
m = Q._nation_month_matrix(spark, SF)
from dask_array_spark.operators import linalg, manipulation as M  # noqa: E402
t("  transpose(m)", lambda: M.transpose(m))
mt = M.transpose(m)
t("  matmul(m, mt)", lambda: linalg.matmul(m, mt))

print("== boolean_mask ==")
cols = [c.strip() for c in Q._LI_ORDER.split(",")]
li = Q._li(spark, SF)
t("  _li.select(cols)", lambda: li.select(*cols))
sel = li.select(*cols)
t("  with_dense_index", lambda: with_dense_index(sel, cols, "rid"))
l2 = with_dense_index(sel, cols, "rid")
t("  from_table_arrays+mask", lambda: (lambda a: a["q"][a["q"] > 45].df)(from_table_arrays(l2, "rid", {"q": "l_quantity"})))

print("== dedup_minhash_pairs ==")
docs = Q._docs(spark, SF)
t("  shingle_hashes", lambda: D.shingle_hashes(docs))
sh = D.shingle_hashes(docs)
t("  minhash_signatures(16)", lambda: D.minhash_signatures(sh, 16))
sigs = D.minhash_signatures(sh, 16)
t("  lsh_candidate_pairs", lambda: D.lsh_candidate_pairs(sigs, rows_per_band=1))

print("== dedup_substring_spans ==")
t("  kgram_positions(k=8)", lambda: D.kgram_positions(docs, "text", 8))
t("  duplicated_spans", lambda: D.duplicated_spans(docs, k=8))
spans = D.duplicated_spans(docs, k=8)
t("  clip_duplicated_spans", lambda: D.clip_duplicated_spans(docs, spans))

print("== component: polyhash/tokens Column construction ==")
from dask_array_spark.functions.text import polyhash_col, tokens_col  # noqa: E402
t("  tokens_col('text')", lambda: tokens_col("text"))
t("  polyhash_col(col)", lambda: polyhash_col(F.col("text")))
t("  transform(toks, polyhash)", lambda: F.transform(tokens_col("text"), lambda x: polyhash_col(x)))
