"""Arrow-vs-SQL serving crossover (round 12, verdict asks 2+3): the
round-11 snapshot flipped cosine_topk/sq8_topk to an arrow mapInArrow
default citing an at-scale measurement that was never recorded, and
the judge's own A/B read arrow equal-or-slower at the 2k bench scale.
This cell measures BOTH forms across corpus decades at a fixed
64-query batch and records the crossover that calibrates
``_ARROW_AUTO_MIN_BYTES`` (the ``impl="auto"`` routing threshold) --
plus the Catalyst ``sizeInBytes`` estimate at each size, since that
estimate (not row count) is what the router actually reads.

Protocol: corpus read straight from parquet (unpersisted -- the
router's production posture; OS page cache warms on the untimed rep),
1 untimed warmup + timed reps per (size, form), noop-write sink.
sq8 measures the codes relation persisted (its documented posture:
encode once at ingest) at a subset of sizes.

Usage: python forensics/arrow_crossover.py forensics/r12_arrow_crossover.json
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
    out_json = sys.argv[1]

    from dask_array_spark import queries as Q
    from dask_array_spark.functions import similarity as SIM
    from dask_array_spark.session import get_spark

    spark = get_spark("arrow_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    qids, k = list(range(64)), 10
    cells = []
    # (copies, name, sql reps, arrow reps): sql reps shrink as the
    # relational form's cost grows superlinearly with rows x queries
    for copies, name, sreps, areps in (
        (1, "xov2k", 3, 3),
        (5, "xov10k", 3, 3),
        (15, "xov30k", 2, 3),
        (50, "xov100k", 1, 3),
        (100, "xov200k", 1, 3),
    ):
        corpus = build_corpus(copies, name)
        emb = Q._embs(spark, corpus)
        n = emb.count()
        stats = SIM._plan_stats_bytes(emb)
        sql_t = time_leg(
            lambda: SIM.cosine_topk(emb, qids, k=k, impl="sql"), runs=sreps
        )
        arrow_t = time_leg(
            lambda: SIM.cosine_topk(emb, qids, k=k, impl="arrow"), runs=areps
        )
        cell = {
            "rows": n,
            "stats_bytes": stats,
            "cosine_sql_sec": sql_t,
            "cosine_arrow_sec": arrow_t,
            "cosine_ratio_sql_over_arrow": round(
                min(sql_t) / min(arrow_t), 3
            ),
        }
        if copies in (1, 5, 15, 50):
            codes = SIM.sq8_encode(emb).persist()
            codes.count()
            cstats = SIM._plan_stats_bytes(codes)
            s2 = time_leg(
                lambda: SIM.sq8_topk(emb, qids, k=k, codes=codes, impl="sql"),
                runs=sreps,
            )
            a2 = time_leg(
                lambda: SIM.sq8_topk(
                    emb, qids, k=k, codes=codes, impl="arrow"
                ),
                runs=areps,
            )
            cell.update(
                {
                    "codes_stats_bytes": cstats,
                    "sq8_sql_sec": s2,
                    "sq8_arrow_sec": a2,
                    "sq8_ratio_sql_over_arrow": round(min(s2) / min(a2), 3),
                }
            )
            codes.unpersist()
        cells.append(cell)
        print(json.dumps(cell), flush=True)

    result = {"queries": len(qids), "k": k, "cells": cells}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
