"""Cell-partitioned IVF index: measure the partition-pruning claim
(round 13, verdict ask 2).  SCALE.md finding 4 states the probed-cell
restriction `cell IN (...)` partition-prunes a cell-partitioned
assignment index, so serving reads ~n_probe/n_cells of the index
BYTES; this cell records the evidence: on-disk bytes per cell, the
executed scan's numFiles/filesSize metrics (what Spark actually
opened after pruning), the same metrics on a FLAT single-directory
layout of identical rows (reads everything, filters rows), and timed
serving legs on both layouts.

At local 600k scale the index is small so the TIME delta is noise --
the recorded claim is the BYTES delta, which is layout-determined and
scale-invariant: at 100 TB the assignment index is corpus-sized and
reading n_probe/n_cells of it is the difference between an IO-bound
scan of everything and a directory-pruned fraction.

Usage: python forensics/ivf_partition_pruning.py <copies> <name> <out.json>
  e.g. python forensics/ivf_partition_pruning.py 300 sf30e forensics/r13_ivf_prune.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ann_decade import build_corpus, time_leg  # noqa: E402


def scan_metrics(df, path_frag: str):
    """(numFiles, filesSize) for every executed parquet scan whose
    location contains ``path_frag`` (same walk as test_ivf_index)."""
    ep = df._jdf.queryExecution().executedPlan()
    found = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            walk(node.child())
            return
        if cls == "FileSourceScanExec" and path_frag in node.toString():
            m = node.metrics()
            found.append(
                (int(m.apply("numFiles").value()),
                 int(m.apply("filesSize").value()))
            )
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(ep)
    return found


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    copies, name, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    corpus = build_corpus(copies, name)

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("ivf_prune")
    spark.sparkContext.setLogLevel("ERROR")

    # small query batch: the recorded quantity is the bytes fraction
    # |union probed cells| / n_cells, and a big batch's probe union
    # covers every cell (64 queries x 2 probes >> 16 cells), leaving
    # nothing to prune -- that regime is a FULL index pass by intent
    k, n_cells, n_probe, batch = 10, 16, 2, 8
    emb = Q._embs(spark, corpus).persist()
    n = emb.count()
    print(f"corpus rows: {n}", flush=True)

    trained = SIM.kmeans_fit(emb, k=n_cells, iters=2).persist()
    trained.count()
    assign_df = SIM.ivf_assign(emb, n_cells, trained)

    base = os.path.join(REPO, ".scaledata", f"{name}_ivf_idx")
    part_path, flat_path = base + "_part", base + "_flat"
    SIM.ivf_write_index(assign_df, part_path)
    from pyspark.sql import functions as F

    assign_df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cell").cast("long").alias("cell"),
    ).write.mode("overwrite").parquet(flat_path)

    part = SIM.ivf_read_index(spark, part_path)
    flat = spark.read.schema("vec_id long, cell long").parquet(flat_path)

    qids = list(range(batch))
    serve = lambda assign: SIM.ivf_topk(
        emb, qids, k=k, n_cells=n_cells, n_probe=n_probe,
        cents=trained, assign=assign, impl="arrow",
    )

    # parity first: identical answers off both layouts
    a = sorted(tuple(r) for r in serve(part).collect())
    b = sorted(tuple(r) for r in serve(flat).collect())
    assert a == b, "partitioned/flat serving answers diverged"
    print(f"parity: {len(a)} rows identical", flush=True)

    # collect() so the metrics belong to THIS DataFrame's own
    # QueryExecution (a write wraps the plan in a fresh one and the
    # walked nodes stay unexecuted, metrics zero)
    dfp = serve(part)
    dfp.collect()
    mp = scan_metrics(dfp, "_part")
    dff = serve(flat)
    dff.collect()
    mf = scan_metrics(dff, "_flat")

    res = {
        "n_vectors": n, "k": k, "n_cells": n_cells, "n_probe": n_probe,
        "query_batch": batch,
        "index_bytes_on_disk": {
            "partitioned_total": dir_bytes(part_path),
            "flat_total": dir_bytes(flat_path),
        },
        "scan_metrics": {
            "partitioned": [
                {"numFiles": f, "filesSize": s} for f, s in mp
            ],
            "flat": [{"numFiles": f, "filesSize": s} for f, s in mf],
        },
        "times_sec": {
            "partitioned": time_leg(lambda: serve(part)),
            "flat": time_leg(lambda: serve(flat)),
        },
    }
    # probed-cell union, recomputed independently for the record
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.sqrt(F.aggregate(
            "qemb", F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )).alias("qnrm"),
    )
    probed = sorted(
        int(r["cell"])
        for r in SIM._probe_cells(q, SIM._codebook(emb, n_cells, trained),
                                  n_probe).select("cell").distinct().collect()
    )
    res["union_probed_cells"] = probed
    ptot = res["index_bytes_on_disk"]["partitioned_total"]
    pread = sum(s for _, s in mp) or None
    if pread:
        res["bytes_read_fraction"] = round(pread / ptot, 4)
        res["probed_cell_fraction"] = round(len(probed) / n_cells, 4)
    print(json.dumps(res, indent=1), flush=True)
    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_json, flush=True)


if __name__ == "__main__":
    main()
