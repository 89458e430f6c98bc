"""Streaming ANN serving: answer top-k similarity queries as they
ARRIVE, against a static (typically persisted/checkpointed) index --
the serving-side complement of the intake encoders in
streaming/embeddings.py (additive scope, same rationale: an online
retrieval deployment feeds micro-batches of query ids and wants the
batch tiers' exact answers, continuously).

Shape: ``foreachBatch``.  Each micro-batch of arriving query rows is
a plain batch DataFrame, so the handler extracts the batch's query
ids (a micro-batch-BOUNDED collect -- the same bounded class as the
batch tiers' own query-side collects) and calls the UNMODIFIED batch
serving function (cosine_topk / ivf_topk / sq8_topk / pq_topk, or
the composed ivf_pq_topk / ivf_sq8_topk) against the static corpus
and its persisted index relations.
Bit-parity with batch is therefore structural -- the streamed answer
IS the batch answer for that id set, union'd across micro-batches
(per-query results are independent, so the micro-batch split cannot
change any row) -- and pinned by test_streaming_serving.  Stateless:
no watermark, no state store, nothing carried between micro-batches;
restart safety comes from the checkpointed source offsets plus an
idempotent sink.

This is the standard Structured Streaming pattern for stream-side
lookups that need full batch semantics (exact global rank windows are
unsupported on unbounded streams, and the per-query top-k window is
exactly that); the alternative -- a stream-static join feeding a
watermarked streaming aggregation -- would re-implement the serving
tier with weaker ordering guarantees for no scale gain, since the
expensive side (the corpus scan) is identical either way.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["stream_topk_serve"]

# tier name -> batch serving callable (emb, query_ids, k=..., **kw).
# pq_topk's extra positional surface (cents, dim) rides in **kw as
# keywords; every tier keeps its own impl routing untouched.  The
# composed tiers serve a production deployment's full index stack --
# pass the cell-partitioned relation from pq_read_index /
# sq8_read_index as codes= and the probed restriction partition-prunes
# the codes scan inside each micro-batch (no assign needed).
_TIERS = ("cosine", "ivf", "sq8", "pq", "ivf_pq", "ivf_sq8")


def stream_topk_serve(
    spark: SparkSession,
    query_path: str,
    emb: DataFrame,
    sink,
    k: int = 5,
    tier: str = "cosine",
    checkpoint: str | None = None,
    **tier_kwargs,
):
    """Start a streaming query serving top-k neighbors for every
    query id arriving at ``query_path`` (parquet rows carrying
    ``vec_id``; extra columns ignored) against the static corpus
    ``emb`` and whatever persisted index relations ride in
    ``tier_kwargs`` (``assign=ivf_read_index(...)``, ``codes=...``,
    ``cents=...`` -- built once at ingest, exactly like the batch
    docstrings prescribe).

    ``sink`` is either a path (results append as parquet) or a
    ``(DataFrame, batch_id) -> None`` callable; output schema is the
    batch tier's own (qid, rank, vec_id, cos|dist).  ``checkpoint``
    (production posture) makes restarts resume from the recorded
    source offsets; with an idempotent / transactional sink that is
    the standard exactly-once foreachBatch recipe.

    Returns the started ``StreamingQuery`` (caller stops it)."""
    from ..functions import similarity as SIM

    fns: dict[str, Callable[..., DataFrame]] = {
        "cosine": SIM.cosine_topk,
        "ivf": SIM.ivf_topk,
        "sq8": SIM.sq8_topk,
        "pq": SIM.pq_topk,
        "ivf_pq": SIM.ivf_pq_topk,
        "ivf_sq8": SIM.ivf_sq8_topk,
    }
    if tier not in fns:
        raise ValueError(f"tier must be one of {_TIERS}, got {tier!r}")
    fn = fns[tier]

    from .dedup import _read_parquet_stream

    stream = _read_parquet_stream(spark, query_path).select("vec_id")

    if callable(sink):
        emit = sink
    else:
        sink_path = str(sink)

        def emit(df: DataFrame, batch_id: int) -> None:
            df.write.mode("append").parquet(sink_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # micro-batch-bounded collect: |batch| distinct query ids
        qids = [
            int(r["vec_id"])
            for r in batch_df.select("vec_id").distinct().collect()
            if r["vec_id"] is not None
        ]
        if not qids:
            return
        emit(fn(emb, qids, k=k, **tier_kwargs), batch_id)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
