"""ANN scale-decade driver (round 10): generate an embeddings-only
N-copy corpus (the same density-preserving Rademacher sign-flip
derivation as make_scale_data.py) and run the 5-way ANN cell plus the
rerank clamp-vs-unclamped recall rows at that corpus size.

The committed artifact of each run is a forensics/*.json; the corpus
itself lands under .scaledata/ (gitignored).  Protocol matches the
sf1/sf3/sf10 cells: indexes prebuilt + persisted outside the timed
window, 1 untimed warmup + min of 3 timed reps per leg, recalls with
tier-wide self-exclusion (round-9 convention).

Usage: python forensics/ann_decade.py <copies> <name> <out.json>
  e.g. python forensics/ann_decade.py 300 sf30e forensics/r10_sf30_ann.json
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def build_corpus(copies: int, name: str) -> str:
    import duckdb

    dst = os.path.join(REPO, ".scaledata", name)
    out = os.path.join(dst, "embeddings.parquet")
    if os.path.exists(out):
        print(f"corpus {out} exists, reusing", flush=True)
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    stride = con.execute(f"SELECT max(vec_id) + 1 FROM '{SRC}'").fetchone()[0]
    # one cross join instead of N UNION ALLs; copy 0 stays verbatim so
    # the query vectors (vec_id 0..7) are identical across decades
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + c.i * {stride} AS vec_id,
                 CASE WHEN c.i = 0 THEN e.embedding ELSE
                   CAST(list_transform(range(1, len(e.embedding) + 1),
                     j -> e.embedding[j] *
                          (CASE WHEN hash(c.i * 1000 + j) % 2 = 0
                                THEN 1 ELSE -1 END)) AS FLOAT[])
                 END AS embedding,
                 e.label
          FROM '{SRC}' e
          CROSS JOIN (SELECT unnest(range({copies})) AS i) c
        ) TO '{out}' (FORMAT PARQUET)
        """
    )
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} vectors", flush=True)
    return dst


def time_leg(fn, runs: int = 3) -> list[float]:
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(fn())  # untimed warmup
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        noop(fn())
        times.append(round(time.perf_counter() - t0, 3))
    return times


def main() -> None:
    copies, name, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    corpus = build_corpus(copies, name)

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("ann_decade")
    spark.sparkContext.setLogLevel("ERROR")

    qids, k = list(range(8)), 10
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
    ivf_build = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    pq_cents = SIM.pq_train(emb, dim=64, m=pq_m, n_codes=pq_codes_n, iters=2).persist()
    pq_cents.count()
    codes = SIM.pq_pack(SIM.pq_encode(emb, pq_cents, dim=64, m=pq_m)).persist()
    codes.count()
    pq_build = round(time.perf_counter() - t0, 1)
    sq_codes = SIM.sq8_encode(emb).persist()
    sq_codes.count()
    print(f"builds: ivf {ivf_build}s, pq {pq_build}s", flush=True)

    legs = {
        "brute_cosine_topk": lambda: SIM.cosine_topk(emb, qids, k=k),
        "ivf_topk_trained": lambda: SIM.ivf_topk(
            emb, qids, k=k, n_cells=n_cells, n_probe=n_probe,
            cents=trained, assign=index,
        ),
        "pq_adc_topk": lambda: SIM.pq_topk(
            emb, qids, pq_cents, dim=64, m=pq_m, k=k, codes=codes
        ),
        "pq_rerank_topk": lambda: SIM.pq_topk(
            emb, qids, pq_cents, dim=64, m=pq_m, k=k, codes=codes, rerank=32
        ),
        "sq8_topk": lambda: SIM.sq8_topk(emb, qids, k=k, codes=sq_codes),
    }
    reps = {}
    for lname, fn in legs.items():
        reps[lname] = time_leg(fn)
        print(f"{lname}: {reps[lname]}", flush=True)

    # ---- recalls (tier-wide self-exclusion convention)
    cos_exact = legs["brute_cosine_topk"]().persist()
    cos_exact.count()
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").asc(), F.col("vec_id").asc())
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

    res = {
        "copies": copies,
        "n_vectors": n,
        "ivf_build_sec": ivf_build,
        "pq_build_sec": pq_build,
        "reps": reps,
        "min": {lname: min(t) for lname, t in reps.items()},
        "speedup_vs_brute": {
            lname: round(min(reps["brute_cosine_topk"]) / min(t), 2)
            for lname, t in reps.items()
        },
        "recall": {
            "ivf": recall(cos_exact, legs["ivf_topk_trained"]()),
            "pq_adc": recall(l2_exact, legs["pq_adc_topk"]()),
            "pq_rerank32": recall(l2_exact, legs["pq_rerank_topk"]()),
            "sq8": recall(cos_exact, legs["sq8_topk"]()),
        },
        "k": k, "n_queries": len(qids),
        "n_cells": n_cells, "n_probe": n_probe,
        "pq_m": pq_m, "pq_n_codes": pq_codes_n,
    }

    # ---- the clamp question: the rule r = ceil(n/600) vs the legacy
    # r=256 ceiling (round-10 raised the clamp to 1024 on this cell's
    # evidence; the 256 row stays for the before/after)
    r_unclamped = math.ceil(n / 600)
    rows = [("rerank_auto", "auto")]
    if r_unclamped != 256:
        rows.append(("rerank_r256_legacy_clamp", 256))
    if r_unclamped > 1024:
        rows.append((f"rerank_r{r_unclamped}_unclamped", r_unclamped))
    for label, rr in rows:
        fn = lambda rr=rr: SIM.pq_topk(
            emb, qids, pq_cents, dim=64, m=pq_m, k=k, codes=codes, rerank=rr
        )
        t = time_leg(fn, runs=2)
        res[label] = {"recall": recall(l2_exact, fn()), "sec": min(t), "reps": t}
        print(label, res[label], flush=True)

    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_json, flush=True)


if __name__ == "__main__":
    main()
