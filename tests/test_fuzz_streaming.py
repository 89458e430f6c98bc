"""Multi-microbatch streaming fuzz: the existing streaming tests
(test_streaming.py) drain the whole file source in ONE pass, so they
never exercise incremental state across batches, out-of-order arrival
BETWEEN batches, or watermark-driven late-data drops -- the failure
modes that actually distinguish a streaming operator from its batch
form.  Here random event sets are split across several parquet files
and processed with ``maxFilesPerTrigger=1`` (one file per microbatch,
file order pinned via modification times), asserting:

- complete-mode tumbling counts equal the batch aggregate no matter
  how events are shuffled across batches (incremental state merge);
- the applyInPandasWithState running totals converge to the batch
  groupBy totals across batches (custom stateful operator);
- append-mode watermark semantics: a window already finalized by the
  watermark drops a late row, while an in-watermark late row lands
  (constructed scenario -- append-mode output is exactly the
  finalized windows).
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


def _write_batches(frames) -> str:
    """Write each pandas frame as one parquet file with strictly
    increasing mtimes so the file streaming source (which orders by
    modification time) processes them in list order."""
    d = tempfile.mkdtemp()
    t0 = time.time() - 3600
    for i, pdf in enumerate(frames):
        p = os.path.join(d, f"b{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (t0 + i * 10, t0 + i * 10))
    return d


def _events_pdf(event_ids, ts_seconds, user_ids, values):
    return pd.DataFrame(
        {
            "event_id": np.asarray(event_ids, dtype="int64"),
            "ts": pd.to_datetime(np.asarray(ts_seconds, dtype="int64"), unit="s"),
            "user_id": np.asarray(user_ids, dtype="int64"),
            "event_type": [f"t{int(e) % 3}" for e in event_ids],
            "value": np.asarray(values, dtype="float64"),
        }
    )


def _drain(spark, sdf, mode: str):
    name = "fz_" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("maxFilesPerTrigger", 1)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


@settings(max_examples=4, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n=st.integers(8, 60),
    nbatches=st.integers(2, 4),
)
def test_fuzz_stream_tumbling_incremental_equals_batch(spark, seed, n, nbatches):
    """Complete-mode tumbling counts must equal the batch aggregate
    for ANY shuffling of events across microbatches: state for a
    window merges correctly when its events arrive in different
    batches, out of order."""
    from dask_array_spark.streaming import events as EV

    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 3600, size=n)  # one hour, many window collisions
    pdf = _events_pdf(np.arange(n), ts, rng.integers(0, 5, n), rng.normal(size=n))
    order = rng.permutation(n)  # arrival order decoupled from event time
    parts = np.array_split(order, nbatches)
    d = _write_batches([pdf.iloc[p] for p in parts if len(p)])

    got = {
        (r["win"], r["event_type"]): r["n"]
        for r in _drain(
            spark,
            EV.stream_tumbling_counts(spark, d, width="10 minutes"),
            "complete",
        )
    }
    # independent plain-pandas oracle (not the engine's batch form)
    want = {
        (int(w), t): int(n)
        for (w, t), n in pdf.groupby(
            [(ts // 600) * 600, pdf["event_type"]]
        )["event_id"].count().items()
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(8, 50))
def test_fuzz_stream_stateful_totals_converge(spark, seed, n):
    """applyInPandasWithState running totals: after draining all
    batches, the LAST update-mode row per user must equal the batch
    groupBy count/sum (state survives and accumulates across
    microbatches)."""
    from dask_array_spark.streaming import events as EV

    rng = np.random.default_rng(seed)
    pdf = _events_pdf(
        np.arange(n),
        rng.integers(0, 3600, n),
        rng.integers(0, 4, n),
        np.round(rng.normal(size=n) * 10, 2),
    )
    parts = np.array_split(rng.permutation(n), 3)
    d = _write_batches([pdf.iloc[p] for p in parts if len(p)])

    rows = _drain(spark, EV.stream_user_running_totals(spark, d), "update")
    # update mode emits one row per (user, batch-with-activity); the
    # final state is the last emission per user in memory-sink order
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["value_cents"])
    want = {
        int(u): (int(g["event_id"].count()), int(g["value"].mul(100).round().sum()))
        for u, g in pdf.groupby("user_id")
    }
    assert final == want


def test_stream_watermark_drops_finalized_late_rows(spark):
    """Append-mode watermark contract, pinned with a constructed
    3-batch scenario (10-minute windows, 10-minute watermark):

    - batch 0: events at t=100s (window [0,600)) and t=1900s;
    - after batch 0 the watermark is 1900s - 600s = 1300s, so window
      [0,600) is FINALIZED (end 600 <= 1300) and emitted;
    - batch 1: a late row at t=150s targets that finalized window ->
      DROPPED (the emitted count for [0,600) must stay 1, and no
      duplicate append row may appear);
    - batch 1 also carries t=1250s (window [1200,1800), end 1800 >
      watermark -> accepted and still open);
    - batch 2: t=3100s advances the watermark to 2500s, finalizing
      [1200,1800) with its count and [1800,2400) holding t=1900.
    """
    from dask_array_spark.streaming import events as EV

    b0 = _events_pdf([0, 1], [100, 1900], [1, 1], [1.0, 1.0])
    b1 = _events_pdf([2, 3], [150, 1250], [1, 1], [1.0, 1.0])
    b2 = _events_pdf([4], [3100], [1], [1.0])
    d = _write_batches([b0, b1, b2])

    rows = _drain(
        spark,
        EV.stream_tumbling_counts(
            spark, d, width="10 minutes", watermark="10 minutes"
        ),
        "append",
    )
    got = {}
    for r in rows:
        key = (r["win"], r["event_type"])
        assert key not in got, f"duplicate append emission for {key}"
        got[key] = r["n"]
    # window [0,600): only the batch-0 event; the batch-1 late row was
    # dropped after finalization
    assert got.get((0, "t0")) == 1
    # window [1200,1800): the in-watermark batch-1 row landed
    assert got.get((1200, "t0")) == 1
    # window [1800,2400): batch-0's t=1900 event, finalized by batch 2
    assert got.get((1800, "t1")) == 1
    # the watermark-advancing t=3100 window is still OPEN (not in
    # append output until a later watermark passes 3600)
    assert (3000, "t1") not in got
