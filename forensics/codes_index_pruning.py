"""Cell-partitioned CODES indexes: measure the round-13 extension of
the partition-pruning claim onto the relation that dominates serving
IO.  ivf_partition_pruning.py showed the ASSIGNMENT index pruning;
this cell records the same evidence for the PQ and SQ8 codes indexes
(pq_write_index / sq8_write_index): on-disk bytes per layout, the
executed CODES scan's numFiles/filesSize after pruning vs a flat
single-directory layout of identical rows, timed serving legs on
both, plus the pre-round-13 join form (assignment index + unindexed
codes) for the shape the layout eliminates, and the
files_per_cell=4 COALESCED layout (the production-ingest knob the
first measurement motivated: unbounded partitionBy scatters each
cell across the whole shuffle width and per-file open overhead eats
the byte saving at local scale).

Same caveat as the assignment cell: at local 600k the codes relation
is small so TIME deltas are noise -- the recorded claim is the BYTES
fraction, which is layout-determined and scale-invariant.  At 100 TB
the packed codes are the largest serving relation (~corpus/32 bytes),
and reading n_probe/n_cells of them with NO join is the difference
between a shuffle of everything and a directory-pruned map scan.

Usage: python forensics/codes_index_pruning.py <copies> <name> <out.json>
  e.g. python forensics/codes_index_pruning.py 300 sf30e forensics/r13_codes_prune.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ann_decade import build_corpus, time_leg  # noqa: E402
from ivf_partition_pruning import dir_bytes, scan_metrics  # noqa: E402

DIM, M, N_CODES = 64, 4, 16


def main() -> None:
    copies, name, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    corpus = build_corpus(copies, name)

    from pyspark.sql import functions as F

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("codes_prune")
    spark.sparkContext.setLogLevel("ERROR")

    # same regime as the assignment cell: small batch so the probe
    # union leaves cells to prune
    k, n_cells, n_probe, batch = 10, 16, 2, 8
    emb = Q._embs(spark, corpus).persist()
    n = emb.count()
    print(f"corpus rows: {n}", flush=True)

    trained = SIM.kmeans_fit(emb, k=n_cells, iters=2).persist()
    trained.count()
    assign_df = SIM.ivf_assign(emb, n_cells, trained)
    pqc = SIM.pq_train(emb, dim=DIM, m=M, n_codes=N_CODES, iters=1)
    pqc = pqc.persist()
    pqc.count()

    base = os.path.join(REPO, ".scaledata", f"{name}_codes_idx")
    qids = list(range(batch))
    res = {
        "n_vectors": n, "k": k, "n_cells": n_cells, "n_probe": n_probe,
        "query_batch": batch, "pq": {"m": M, "n_codes": N_CODES},
    }

    def record(tier, part_path, coal_path, flat_path, serve_from, join_form):
        part_b, coal_b = dir_bytes(part_path), dir_bytes(coal_path)
        flat_b = dir_bytes(flat_path)
        dfp = serve_from(tier_read[tier](spark, part_path))
        a = sorted(tuple(r) for r in dfp.collect())
        dfc = serve_from(tier_read[tier](spark, coal_path))
        ac = sorted(tuple(r) for r in dfc.collect())
        assert a == ac, f"{tier}: partitioned/coalesced answers diverged"
        dff = serve_from(
            spark.read.schema(tier_schema[tier]).parquet(flat_path)
        )
        b = sorted(tuple(r) for r in dff.collect())
        assert a == b, f"{tier}: partitioned/flat answers diverged"
        c = sorted(tuple(r) for r in join_form().collect())
        assert a == c, f"{tier}: index/join-form answers diverged"
        print(f"{tier} parity: {len(a)} rows identical", flush=True)
        mp = scan_metrics(dfp, "_part")
        mc = scan_metrics(dfc, "_coal")
        mf = scan_metrics(dff, "_flat")
        return {
            "index_bytes_on_disk": {
                "partitioned_total": part_b,
                "coalesced_total": coal_b,
                "flat_total": flat_b,
            },
            "scan_metrics": {
                "partitioned": [
                    {"numFiles": f, "filesSize": s} for f, s in mp
                ],
                "coalesced": [
                    {"numFiles": f, "filesSize": s} for f, s in mc
                ],
                "flat": [{"numFiles": f, "filesSize": s} for f, s in mf],
            },
            "bytes_read_fraction": (
                round(sum(s for _, s in mp) / part_b, 4) if mp else None
            ),
            "coalesced_bytes_read_fraction": (
                round(sum(s for _, s in mc) / coal_b, 4) if mc else None
            ),
            "times_sec": {
                "partitioned": time_leg(
                    lambda: serve_from(tier_read[tier](spark, part_path))
                ),
                "coalesced": time_leg(
                    lambda: serve_from(tier_read[tier](spark, coal_path))
                ),
                "flat": time_leg(
                    lambda: serve_from(
                        spark.read.schema(tier_schema[tier]).parquet(flat_path)
                    )
                ),
                "join_form": time_leg(join_form),
            },
        }

    tier_read = {"pq": SIM.pq_read_index, "sq8": SIM.sq8_read_index}
    tier_schema = {
        "pq": "vec_id long, codes array<long>, cell long",
        "sq8": "vec_id long, scale double, q array<int>, nrm double, cell long",
    }

    # the pre-round-13 production posture for the join form: a
    # partitioned ASSIGNMENT index + plain unindexed codes parquet
    ivf_part = base + "_ivf_part"
    SIM.ivf_write_index(assign_df, ivf_part)
    assign_idx = SIM.ivf_read_index(spark, ivf_part)

    # ---- PQ codes index -------------------------------------------------
    packed = SIM.pq_pack(SIM.pq_encode(emb, pqc, dim=DIM, m=M))
    pq_part, pq_flat = base + "_pq_part", base + "_pq_flat"
    pq_coal = base + "_pq_coal"
    SIM.pq_write_index(packed, assign_df, pq_part)
    SIM.pq_write_index(packed, assign_df, pq_coal, files_per_cell=4)
    # flat layout: identical rows, single directory (cell is a data
    # column, the probed restriction only row-filters)
    SIM.pq_read_index(spark, pq_part).write.mode("overwrite").parquet(pq_flat)
    pq_plain = base + "_pq_plain"
    SIM.pq_read_index(spark, pq_part).select("vec_id", "codes").write.mode(
        "overwrite"
    ).parquet(pq_plain)
    plain_packed = spark.read.schema("vec_id long, codes array<long>").parquet(
        pq_plain
    )

    res["pq_codes_index"] = record(
        "pq", pq_part, pq_coal, pq_flat,
        lambda idx: SIM.ivf_pq_topk(
            emb, qids, pqc, dim=DIM, m=M, k=k, n_cells=n_cells,
            n_probe=n_probe, ivf_cents=trained, codes=idx, impl="arrow",
        ),
        lambda: SIM.ivf_pq_topk(
            emb, qids, pqc, dim=DIM, m=M, k=k, n_cells=n_cells,
            n_probe=n_probe, ivf_cents=trained, assign=assign_idx,
            codes=plain_packed, impl="arrow",
        ),
    )

    # ---- SQ8 codes index ------------------------------------------------
    sq = SIM.sq8_encode(emb)
    sq_part, sq_flat = base + "_sq8_part", base + "_sq8_flat"
    sq_coal = base + "_sq8_coal"
    SIM.sq8_write_index(sq, assign_df, sq_part)
    SIM.sq8_write_index(sq, assign_df, sq_coal, files_per_cell=4)
    SIM.sq8_read_index(spark, sq_part).write.mode("overwrite").parquet(sq_flat)
    sq_plain = base + "_sq8_plain"
    SIM.sq8_read_index(spark, sq_part).select(
        "vec_id", "scale", "q", "nrm"
    ).write.mode("overwrite").parquet(sq_plain)
    plain_sq = spark.read.schema(
        "vec_id long, scale double, q array<int>, nrm double"
    ).parquet(sq_plain)

    res["sq8_codes_index"] = record(
        "sq8", sq_part, sq_coal, sq_flat,
        lambda idx: SIM.ivf_sq8_topk(
            emb, qids, k=k, n_cells=n_cells, n_probe=n_probe,
            ivf_cents=trained, codes=idx, impl="arrow",
        ),
        lambda: SIM.ivf_sq8_topk(
            emb, qids, k=k, n_cells=n_cells, n_probe=n_probe,
            ivf_cents=trained, assign=assign_idx, codes=plain_sq,
            impl="arrow",
        ),
    )

    print(json.dumps(res, indent=1), flush=True)
    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_json, flush=True)


if __name__ == "__main__":
    main()
