"""IVF probe-fraction curve (round 11): the query-batch cell
(forensics/r11_batch_ann.json) showed the decade cells' ivf
recall=1.0 was an 8-query artifact -- averaged over 256 queries,
n_probe=2-of-16 reads 0.45.  Before touching any default, measure
the actual recall/throughput tradeoff: hold the 600k corpus and the
256-query batch fixed and sweep n_probe across the cell count.

The exact ground truth (brute cosine top-k for 256 queries) is
computed ONCE and persisted; each probe setting then times the ivf
leg (1 untimed warmup + 3 timed reps) and joins recall against the
persisted truth.

Usage: python forensics/ivf_probe.py <copies> <name> <out.json>
  e.g. python forensics/ivf_probe.py 300 sf30e forensics/r11_ivf_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ann_decade import build_corpus, time_leg  # noqa: E402


def main() -> None:
    copies, name, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    corpus = build_corpus(copies, name)

    from pyspark.sql import functions as F

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("ivf_probe")
    spark.sparkContext.setLogLevel("ERROR")

    k, batch = 10, 256
    n_cells = 16
    qids = list(range(batch))
    emb = Q._embs(spark, corpus).persist()
    n = emb.count()
    print(f"corpus rows: {n}", flush=True)

    trained = SIM.kmeans_fit(emb, k=n_cells, iters=2).persist()
    trained.count()
    index = SIM.ivf_assign(emb, n_cells, trained).persist()
    index.count()

    # ground truth once (this is the 12-minute brute pass; everything
    # after is probe-bounded)
    t0 = time.perf_counter()
    exact = SIM.cosine_topk(emb, qids, k=k).persist()
    exact.count()
    print(f"exact truth in {round(time.perf_counter() - t0, 1)}s", flush=True)

    res = {
        "copies": copies, "n_vectors": n, "k": k, "batch": batch,
        "n_cells": n_cells, "probes": {},
    }
    for n_probe in (1, 2, 4, 6, 8, 12, 16):
        fn = lambda np_=n_probe: SIM.ivf_topk(
            emb, qids, k=k, n_cells=n_cells, n_probe=np_,
            cents=trained, assign=index,
        )
        reps = time_leg(fn, runs=3)
        rec = (
            SIM.ann_recall(emb, qids, k=k, exact=exact, approx=fn())
            .agg(F.round(F.avg("recall"), 4).alias("r"))
            .collect()[0]["r"]
        )
        row = {
            "reps": reps, "min": min(reps),
            "per_query_ms": round(1000.0 * min(reps) / batch, 1),
            "recall": rec,
        }
        res["probes"][str(n_probe)] = row
        print(f"n_probe {n_probe}: {row}", flush=True)

    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_json, flush=True)


if __name__ == "__main__":
    main()
