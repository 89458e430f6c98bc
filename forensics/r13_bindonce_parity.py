"""Old-vs-new parity for the round-13 bind-once rewrites:

- text.quality_col   (6-reference expr -> transform(array(toks), q)[0])
- governance.split_col (CaseWhen over polyhash -> polyhash finish lambda)
- similarity.sq8_encode scale (CaseWhen over max-|e| fold -> finish lambda)

Each checked on the real SFs plus hostile edges (NULL/empty text,
zero/NULL/NaN embeddings).  Run: python forensics/r13_bindonce_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_array_spark.session import get_spark
from dask_array_spark.functions.text import (
    STOPWORDS,
    quality_col,
    polyhash_col,
    with_tokens,
    TOKS,
    tokens_col,
)
from dask_array_spark.functions.governance import split_col
from dask_array_spark.functions.similarity import sq8_encode


def quality_col_r12(toks):
    n = F.size(toks).cast("double")
    length_term = F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    stop_pen = (
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double") / n * 0.5
    )
    return F.when(
        n > 0,
        F.round(
            F.greatest(
                F.lit(0.0),
                F.least(F.lit(1.0), length_term * 0.4 + diversity * 0.6 - stop_pen),
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))


def split_col_r12(id_col="doc_id", weights=(80, 10, 10), salt="s1"):
    bucket = (
        polyhash_col(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        % F.lit(100)
    )
    t_end = weights[0]
    v_end = weights[0] + weights[1]
    return (
        F.when(bucket < t_end, F.lit("train"))
        .when(bucket < v_end, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def sq8_scale_r12():
    mx = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    return F.when(mx == 0.0, F.lit(1.0)).otherwise(mx / F.lit(127.0))


def expect_zero(df, label):
    n_bad = df.count()
    print(f"{label}: {n_bad} mismatches")
    if n_bad:
        df.show(10, truncate=False)
        raise SystemExit(f"PARITY FAILURE at {label}")


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    null_safe_ne = lambda a, b: ~(a.eqNullSafe(b))  # noqa: E731

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        db = with_tokens(docs)
        tk = F.col(TOKS)
        both = db.select(
            quality_col_r12(tk).alias("qo"),
            quality_col("text", toks=tk).alias("qn"),
            split_col_r12().alias("so"),
            split_col().alias("sn"),
        )
        expect_zero(
            both.filter(
                null_safe_ne(F.col("qo"), F.col("qn"))
                | null_safe_ne(F.col("so"), F.col("sn"))
            ),
            f"{sf} quality+split",
        )

        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        old_scale = emb.select("vec_id", sq8_scale_r12().alias("so"))
        new_scale = sq8_encode(emb).select("vec_id", F.col("scale").alias("sn"))
        expect_zero(
            old_scale.join(new_scale, "vec_id").filter(
                ~(
                    F.col("so").eqNullSafe(F.col("sn"))
                    | (
                        F.isnan(F.coalesce(F.col("so"), F.lit(0.0)))
                        & F.isnan(F.coalesce(F.col("sn"), F.lit(0.0)))
                    )
                )
            ),
            f"{sf} sq8 scale",
        )

    # hostile edges
    edocs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the the the"), (5, "x")],
        "doc_id long, text string",
    )
    eb = with_tokens(edocs)
    tk = F.col(TOKS)
    expect_zero(
        eb.select(
            quality_col_r12(tk).alias("qo"),
            quality_col("text", toks=tk).alias("qn"),
            split_col_r12().alias("so"),
            split_col().alias("sn"),
        ).filter(
            null_safe_ne(F.col("qo"), F.col("qn"))
            | null_safe_ne(F.col("so"), F.col("sn"))
        ),
        "edge quality+split",
    )

    eemb = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [1.5, -3.0]),
            (3, None),
            (4, [None, 2.0]),
            (5, [float("nan"), 1.0]),
            (6, []),
        ],
        "vec_id long, embedding array<double>",
    )
    both = eemb.select(
        "vec_id", sq8_scale_r12().alias("so")
    ).join(sq8_encode(eemb).select("vec_id", F.col("scale").alias("sn")), "vec_id")
    bad = both.filter(
        ~(
            F.col("so").eqNullSafe(F.col("sn"))
            | (F.isnan(F.coalesce(F.col("so"), F.lit(0.0)))
               & F.isnan(F.coalesce(F.col("sn"), F.lit(0.0))))
        )
    )
    expect_zero(bad, "edge sq8 scale")
    print("PARITY OK")


if __name__ == "__main__":
    main()
