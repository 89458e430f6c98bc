"""ANN query-batch scaling row (round 11, verdict ask 5): every scale
decade in forensics/r10_sf*_ann.json serves 8 queries, so brute's
per-JOB fixed costs (scan, shuffle setup) amortize over few queries
and COMPRESS the index ratios at large n (SCALE.md's own sf90
finding).  This cell holds the corpus fixed at the 600k decade and
sweeps the query batch 8 -> 64 -> 256 to expose the compute-bound
ratio a throughput-serving deployment actually sees, and to test
whether ``_auto_rerank``'s constants (calibrated at batch 8) hold at
batch 256.

Protocol matches ann_decade.py: indexes prebuilt + persisted outside
the timed window, 1 untimed warmup + timed reps (3 at batch 8/64, 2
at 256 where a brute rep is minutes), recalls with tier-wide
self-exclusion.  Query vectors are vec_id 0..255 of copy 0, verbatim
source vectors shared with the decade cells.

Usage: python forensics/ann_batch.py <copies> <name> <out.json>
  e.g. python forensics/ann_batch.py 300 sf30e forensics/r11_batch_ann.json
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
    from pyspark.sql.window import Window

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("ann_batch")
    spark.sparkContext.setLogLevel("ERROR")

    k = 10
    n_cells, n_probe, pq_m, pq_codes_n = 16, 2, 8, 256
    emb = Q._embs(spark, corpus).persist()
    n = emb.count()
    print(f"corpus rows: {n}", flush=True)

    # ---- index builds, outside every timed window
    t0 = time.perf_counter()
    trained = SIM.kmeans_fit(emb, k=n_cells, iters=2).persist()
    trained.count()
    index = SIM.ivf_assign(emb, n_cells, trained).persist()
    index.count()
    pq_cents = SIM.pq_train(emb, dim=64, m=pq_m, n_codes=pq_codes_n, iters=2).persist()
    pq_cents.count()
    codes = SIM.pq_pack(SIM.pq_encode(emb, pq_cents, dim=64, m=pq_m)).persist()
    codes.count()
    sq_codes = SIM.sq8_encode(emb).persist()
    sq_codes.count()
    print(f"builds done in {round(time.perf_counter() - t0, 1)}s", flush=True)

    res = {
        "copies": copies, "n_vectors": n, "k": k,
        "n_cells": n_cells, "n_probe": n_probe,
        "pq_m": pq_m, "pq_n_codes": pq_codes_n,
        "auto_rerank_r": SIM._auto_rerank(n),
        "batches": {},
    }

    for batch in (8, 64, 256):
        qids = list(range(batch))
        runs = 2 if batch >= 256 else 3
        legs = {
            "brute_cosine_topk": lambda: SIM.cosine_topk(emb, qids, k=k),
            "ivf_topk": lambda: SIM.ivf_topk(
                emb, qids, k=k, n_cells=n_cells, n_probe=n_probe,
                cents=trained, assign=index,
            ),
            "pq_adc_topk": lambda: SIM.pq_topk(
                emb, qids, pq_cents, dim=64, m=pq_m, k=k, codes=codes
            ),
            "pq_rerank_auto": lambda: SIM.pq_topk(
                emb, qids, pq_cents, dim=64, m=pq_m, k=k, codes=codes,
                rerank="auto",
            ),
            # the composed IVFADC+R production path (round 13: its
            # rerank-grade keep routes through the exact-threshold
            # pruning too -- forensics/r13_composed_rerank.json
            # carries the first arrow-vs-sql A/B)
            "ivf_pq_rerank_auto": lambda: SIM.ivf_pq_topk(
                emb, qids, pq_cents, dim=64, m=pq_m, k=k,
                n_cells=n_cells, n_probe=n_probe, ivf_cents=trained,
                assign=index, codes=codes, rerank="auto",
            ),
            "sq8_topk": lambda: SIM.sq8_topk(emb, qids, k=k, codes=sq_codes),
        }
        reps = {}
        for lname, fn in legs.items():
            reps[lname] = time_leg(fn, runs=runs)
            print(f"batch {batch} {lname}: {reps[lname]}", flush=True)
        row = {
            "reps": reps,
            "min": {lname: min(t) for lname, t in reps.items()},
            "speedup_vs_brute": {
                lname: round(min(reps["brute_cosine_topk"]) / min(t), 2)
                for lname, t in reps.items()
            },
            "per_query_ms": {
                lname: round(1000.0 * min(t) / batch, 1)
                for lname, t in reps.items()
            },
        }

        # recall at the batch (does the auto constant hold when 32x
        # more queries share the shortlist join?)
        cos_exact = legs["brute_cosine_topk"]().persist()
        cos_exact.count()
        q = emb.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("d").asc(), F.col("vec_id").asc()
        )
        l2_exact = (
            emb.select("vec_id", "embedding")
            .crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid", "vec_id",
                (F.round(SIM._sqdist("embedding", "qemb"), 6) + F.lit(0.0)).alias("d"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        ).persist()
        l2_exact.count()

        def recall(exact, approx):
            return (
                SIM.ann_recall(emb, qids, k=k, exact=exact, approx=approx)
                .agg(F.round(F.avg("recall"), 4).alias("r"))
                .collect()[0]["r"]
            )

        row["recall"] = {
            "ivf": recall(cos_exact, legs["ivf_topk"]()),
            "pq_adc": recall(l2_exact, legs["pq_adc_topk"]()),
            "pq_rerank_auto": recall(l2_exact, legs["pq_rerank_auto"]()),
            "ivf_pq_rerank_auto": recall(
                l2_exact, legs["ivf_pq_rerank_auto"]()
            ),
            "sq8": recall(cos_exact, legs["sq8_topk"]()),
        }
        print(f"batch {batch} recall: {row['recall']}", flush=True)
        cos_exact.unpersist()
        l2_exact.unpersist()
        res["batches"][str(batch)] = row

    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_json, flush=True)


if __name__ == "__main__":
    main()
