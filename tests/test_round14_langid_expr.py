"""Round-14 construction-cost pin: lang_id_col builds via ONE F.expr
parse when text_col/toks are NAMES (the Column-API loop is ~70 py4j
round-trips of driver time per build), and via the legacy Column
constructors when toks is a Column.  The two branches must stay
value-identical -- tie-breaks, NULL text, the ==0 'und' rule -- on
hostile inputs, and the str-toks form must equal the Column-toks
form."""

from pyspark.sql import functions as F

from dask_array_spark.functions.text import TOKS, lang_id_col, with_tokens


def test_lang_id_expr_and_column_paths_identical(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "the a of and"),                       # pure en
        (5, "le la et les der die und das"),        # fr/de tie by count
        (6, "de shi he zai"),                       # zh (de also fr/es!)
        (7, "la la la"),                            # es-vs-fr shared marker tie
        (8, "nothing matches here at all"),         # 0 best -> und
        (9, "the le el der de"),                    # 5-way single-marker tie
        (10, "x " * 500 + "the"),
    ]
    df = with_tokens(spark.createDataFrame(rows, "doc_id long, text string"))
    got = df.select(
        "doc_id",
        lang_id_col("text", toks=TOKS).alias("fast"),       # expr path
        lang_id_col("text", toks=F.col(TOKS)).alias("legacy"),  # Column path
        lang_id_col("text").alias("fast_notoks"),           # expr, re-tokenize
    ).collect()
    for r in got:
        assert r["fast"] == r["legacy"], (r["doc_id"], r["fast"], r["legacy"])
        assert r["fast_notoks"] == r["legacy"], r["doc_id"]


def test_lang_id_expr_path_on_corpus_matches_legacy(spark, sf_dir):
    from dask_array_spark.sources.ingest import read_table

    docs = with_tokens(read_table(spark, sf_dir, "documents"))
    j = docs.select(
        "doc_id",
        lang_id_col("text", toks=TOKS).alias("fast"),
        lang_id_col("text", toks=F.col(TOKS)).alias("legacy"),
    ).filter(
        (F.col("fast") != F.col("legacy"))
        | (F.col("fast").isNull() != F.col("legacy").isNull())
    )
    assert j.count() == 0
