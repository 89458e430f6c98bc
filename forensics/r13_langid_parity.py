"""Old-vs-new lang_id_col parity: r12 greatest+CaseWhen chain vs the
r13 single-pass aggregate fold, on all three SFs plus hostile edges
(NULL text, empty text, all-tie rows).  Run:  python forensics/r13_langid_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_array_spark.session import get_spark
from dask_array_spark.functions.text import (
    LANG_MARKERS,
    lang_id_col,
    with_tokens,
    TOKS,
)


def lang_id_col_r12(toks):
    """The round-12 form, verbatim (greatest + CaseWhen chain)."""

    def marker_filter(m):
        return lambda t: t.isin(m)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(m)))
        for lang, m in sorted(LANG_MARKERS.items())
    }
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when(scores[l] == best, F.lit(l)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def check(df, label):
    db = with_tokens(df)
    tk = F.col(TOKS)
    both = db.select(
        "doc_id",
        lang_id_col_r12(tk).alias("old"),
        lang_id_col("text", toks=tk).alias("new"),
    )
    bad = both.filter(
        (F.col("old") != F.col("new"))
        | F.col("old").isNull() != F.col("new").isNull()
    )
    n_bad = bad.count()
    n = both.count()
    print(f"{label}: {n} rows, {n_bad} mismatches")
    if n_bad:
        bad.show(20, truncate=False)
        raise SystemExit(f"PARITY FAILURE at {label}")


def main():
    spark = get_spark()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        check(spark.read.parquet(path), sf)

    # hostile edges: NULL text, empty, whitespace-only, exact ties,
    # single-marker rows for every language, und
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "der the el le de"),            # 5-way tie (de marker 'de' also zh)
        (5, "the of and a"),                # en
        (6, "der die und das"),             # de
        (7, "el la y los"),                 # es vs fr tie on 'la'
        (8, "le la et les"),
        (9, "de shi he zai"),
        (10, "xyzzy plugh"),                # und
        (11, "la"),                         # es/fr tie -> es
        (12, "de"),                         # de vs zh tie -> de
    ]
    edge = spark.createDataFrame(rows, "doc_id long, text string")
    check(edge, "edge-cases")
    print("PARITY OK")


if __name__ == "__main__":
    main()
