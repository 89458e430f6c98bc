"""Structured Streaming forms produce the same answers as the batch
forms when the whole file source is drained (file source -> memory
sink, complete output mode).  This is the incremental-execution proof
for the events operators (SURVEY.md section 2.12 additive scope).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_stream_tumbling_matches_batch(spark, sf_dir, events_path):
    from dask_array_spark.sources import read_table
    from dask_array_spark.streaming import events as EV

    sdf = EV.stream_tumbling_counts(spark, events_path, width="10 minutes")
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["win"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM t_tumbling").collect()
        }
    finally:
        q.stop()

    batch = EV.tumbling_agg(read_table(spark, sf_dir, "events"), 600)
    want = {(r["win"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_stream_sessions_run(spark, events_path):
    """Session windows: streaming session_window aggregates run and
    cover every user (exact session boundaries differ from the
    gaps-and-islands batch form only in watermark-truncated cases,
    none in a single drained batch)."""
    from dask_array_spark.streaming import events as EV

    sdf = EV.stream_session_counts(spark, events_path, gap="30 minutes")
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, sum(n_events) AS n FROM t_sessions GROUP BY 1"
        ).collect()
    finally:
        q.stop()
    per_user = {r["user_id"]: r["n"] for r in rows}
    static = spark.read.parquet(events_path)
    want = {
        r["user_id"]: r["n"]
        for r in static.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user == want


def test_stream_stateful_running_totals(spark, sf_dir, events_path):
    """applyInPandasWithState keyed accumulator: after draining the
    file source, per-user state equals the batch aggregate."""
    from dask_array_spark.sources import read_table
    from dask_array_spark.streaming import events as EV

    sdf = EV.stream_user_running_totals(spark, events_path)
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            """SELECT user_id, n_events, value_cents FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) AS r
                 FROM t_state) WHERE r = 1"""
        ).collect()
    finally:
        q.stop()
    got = {r["user_id"]: (r["n_events"], r["value_cents"]) for r in rows}

    ev = read_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["n"], r["c"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_stream_sliding_matches_batch(spark, sf_dir, events_path):
    from dask_array_spark.sources import read_table
    from dask_array_spark.streaming import events as EV

    sdf = EV.stream_sliding_counts(spark, events_path, width="15 minutes", slide="5 minutes")
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_sliding")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["win"]: r["n"] for r in spark.sql("SELECT * FROM t_sliding").collect()
        }
    finally:
        q.stop()
    batch = EV.sliding_agg(read_table(spark, sf_dir, "events"), 900, 300)
    want = {r["win"]: r["n"] for r in batch.collect()}
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def docs_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


def test_stream_exact_dedup_matches_batch(spark, sf_dir, docs_path):
    """Streaming dropDuplicatesWithinWatermark on the text digest
    keeps exactly one doc per distinct text."""
    from dask_array_spark.streaming import dedup as SD

    sdf = SD.stream_exact_dedup(spark, docs_path)
    q = (sdf.writeStream.format("memory").queryName("t_exact_dedup")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_exact_dedup").collect()
    finally:
        q.stop()
    n_texts = (spark.read.parquet(docs_path)
               .select("text").distinct().count())
    assert len(rows) == n_texts
    assert len({r["digest"] for r in rows}) == n_texts


def test_stream_simhash_near_dedup_matches_batch_oracle(spark, docs_path):
    """The stateful band-keyed near-dedup emits the same (dup_of,
    hamming) pairs as a driver-side replay of the same logic over the
    batch-computed simhashes."""
    from dask_array_spark.streaming import dedup as SD

    sdf = SD.stream_simhash_near_dedup(spark, docs_path)
    q = (sdf.writeStream.format("memory").queryName("t_near_dedup")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["dup_of"], r["hamming"])
               for r in spark.sql("SELECT * FROM t_near_dedup").collect()}
    finally:
        q.stop()

    # batch oracle: same simhash expression, replayed in doc_id order
    from pyspark.sql import functions as F2
    batch = (spark.read.parquet(docs_path)
             .select("doc_id", SD.simhash_col("text").alias("simhash"))
             .orderBy("doc_id").collect())
    bands: dict = {}
    want = {}
    for r in batch:
        did, sh = int(r["doc_id"]), int(r["simhash"])
        band = sh >> (SD.SIMHASH_BITS - 8)
        best, bh = None, 4
        for pid, psh in bands.get(band, []):
            h = bin(psh ^ sh).count("1")
            if h < bh or (h == bh and best is not None and pid < best):
                best, bh = pid, h
        want[did] = (best, bh if best is not None else None)
        bands.setdefault(band, []).append((did, sh))
    assert len(got) == len(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} mismatches: {list(mismatches.items())[:5]}"
    n_near = sum(1 for v in want.values() if v[0] is not None)
    assert n_near > 0, "fixture has no near-duplicates; test is vacuous"
