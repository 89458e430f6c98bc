"""Streaming corpus-intake governance: the stateless quality /
decontamination / split gates on a drained file stream match the batch
tier exactly (streaming/governance.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


def _drain(sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        return sdf.sparkSession.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_stream_decontaminate_matches_batch(spark, sf_dir, docs_path):
    from dask_array_spark.functions import governance as G
    from dask_array_spark.streaming import governance as SG

    # the doc_id%97 subset plays the benchmark, as in the batch suite;
    # write it out so the stream reads the same corpus the batch sees
    docs = spark.read.parquet(docs_path)
    bench_path = "/tmp/sg_bench.parquet"
    docs.filter(F.col("doc_id") % 97 == 0).write.mode("overwrite").parquet(bench_path)

    got = {
        r["doc_id"]: (r["n_contam"], r["contaminated"])
        for r in _drain(
            SG.stream_decontaminate(spark, docs_path, bench_path, n=8), "sg_decontam"
        )
    }
    want = {
        r["doc_id"]: (r["n_contam"], r["contaminated"])
        for r in G.contamination_counts(
            docs, docs.filter(F.col("doc_id") % 97 == 0), n=8
        ).collect()
    }
    assert got == want
    assert any(v[1] for v in want.values())  # the bench docs themselves


def test_stream_clean_corpus_matches_batch_gates(spark, sf_dir, docs_path):
    from dask_array_spark.functions import governance as G
    from dask_array_spark.functions import text as T
    from dask_array_spark.streaming import governance as SG

    docs = spark.read.parquet(docs_path)
    bench_path = "/tmp/sg_bench.parquet"
    docs.filter(F.col("doc_id") % 97 == 0).write.mode("overwrite").parquet(bench_path)

    rows = _drain(
        SG.stream_clean_corpus(spark, docs_path, bench_path, min_quality=0.5, n=8),
        "sg_clean",
    )
    got = {r["doc_id"]: (r["quality"], r["split"]) for r in rows}

    q = T.quality_score(docs)
    c = G.contamination_counts(docs, docs.filter(F.col("doc_id") % 97 == 0), n=8)
    s = G.assign_split(docs)
    want = {
        r["doc_id"]: (r["quality"], r["split"])
        for r in q.join(c, "doc_id").join(s, "doc_id")
        .filter((F.col("quality") >= 0.5) & (F.col("n_contam") == 0))
        .collect()
    }
    assert got == want
    assert 0 < len(want) < docs.count()


def test_stream_plan_is_stateless(spark, docs_path):
    """No state store operators in the intake pipeline -- the property
    that makes it scale to unbounded streams."""
    from dask_array_spark.streaming import governance as SG
    from pyspark.sql import functions as F

    docs = spark.read.parquet(docs_path)
    bench_path = "/tmp/sg_bench.parquet"
    docs.filter(F.col("doc_id") % 97 == 0).write.mode("overwrite").parquet(bench_path)
    sdf = SG.stream_clean_corpus(spark, docs_path, bench_path)
    plan = sdf._jdf.queryExecution().analyzed().toString()
    for stateful in ("Aggregate", "Join", "Deduplicate", "FlatMapGroupsWithState"):
        assert stateful not in plan, f"unexpected stateful op {stateful}"
