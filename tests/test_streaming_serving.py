"""Streaming ANN serving (streaming/serving.py): foreachBatch serves
arriving query ids through the UNMODIFIED batch tiers against a
static corpus + persisted index, so the streamed answer must equal
the batch answer for the same id set -- across micro-batch splits,
for every tier, with zero state operators."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = df.select("vec_id", "embedding").persist()
    df.count()
    yield df
    df.unpersist()


def _serve_collect(spark, qdir, emb, waves, tmp, **kw):
    """Write query-id waves as parquet one at a time, draining the
    stream between waves (forcing >= len(waves) micro-batches), and
    return every emitted row."""
    from dask_array_spark.streaming.serving import stream_topk_serve

    got = []

    def sink(df, batch_id):
        got.extend(tuple(r) for r in df.collect())

    os.makedirs(qdir, exist_ok=True)
    # wave 1 lands before the stream starts (it doubles as the
    # reader's schema seed)
    spark.createDataFrame(
        [(int(v),) for v in waves[0]], "vec_id long"
    ).write.mode("overwrite").parquet(qdir)
    q = stream_topk_serve(
        spark, qdir, emb, sink,
        checkpoint=os.path.join(tmp, "ckpt"), **kw
    )
    try:
        q.processAllAvailable()
        for i, wave in enumerate(waves[1:], 1):
            spark.createDataFrame(
                [(int(v),) for v in wave], "vec_id long"
            ).write.mode("append").parquet(qdir)
            q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    # stateless by construction: no state store ever materializes
    assert progress is None or progress.get("stateOperators") in ([], None)
    return got


def test_stream_cosine_serve_matches_batch(spark, emb, tmp_path):
    from dask_array_spark.functions.similarity import cosine_topk

    waves = [[0], [1, 2], [5]]
    got = _serve_collect(
        spark, str(tmp_path / "q"), emb, waves, str(tmp_path),
        k=4, tier="cosine",
    )
    all_ids = sorted({v for w in waves for v in w})
    want = [tuple(r) for r in cosine_topk(emb, all_ids, k=4).collect()]
    assert sorted(got) == sorted(want)


def test_stream_ivf_serve_checkpointed_index(spark, emb, tmp_path):
    """The production posture: the assignment index is built once,
    written CELL-PARTITIONED (ivf_write_index), and the stream serves
    every micro-batch from the read-back index -- bit-parity with the
    batch call on the same persisted relation."""
    from dask_array_spark.functions.similarity import (
        ivf_assign, ivf_read_index, ivf_topk, ivf_write_index,
    )

    idx_path = str(tmp_path / "ivf_index")
    ivf_write_index(ivf_assign(emb, n_cells=4), idx_path)
    assign = ivf_read_index(spark, idx_path)

    waves = [[0, 3], [7]]
    got = _serve_collect(
        spark, str(tmp_path / "q"), emb, waves, str(tmp_path),
        k=3, tier="ivf", n_cells=4, n_probe=2, assign=assign,
    )
    all_ids = sorted({v for w in waves for v in w})
    want = [
        tuple(r)
        for r in ivf_topk(
            emb, all_ids, k=3, n_cells=4, n_probe=2, assign=assign
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_stream_sq8_serve_matches_batch(spark, emb, tmp_path):
    from dask_array_spark.functions.similarity import sq8_encode, sq8_topk

    codes = sq8_encode(emb).persist()
    codes.count()
    try:
        waves = [[1], [4, 6]]
        got = _serve_collect(
            spark, str(tmp_path / "q"), emb, waves, str(tmp_path),
            k=3, tier="sq8", codes=codes,
        )
        all_ids = sorted({v for w in waves for v in w})
        want = [
            tuple(r) for r in sq8_topk(emb, all_ids, k=3, codes=codes).collect()
        ]
        assert sorted(got) == sorted(want)
    finally:
        codes.unpersist()


def test_stream_serve_parquet_sink(spark, emb, tmp_path):
    """A path sink appends the batch tier's own output schema."""
    from dask_array_spark.functions.similarity import cosine_topk
    from dask_array_spark.streaming.serving import stream_topk_serve

    qdir, out = str(tmp_path / "q"), str(tmp_path / "out")
    spark.createDataFrame([(0,), (2,)], "vec_id long").write.parquet(qdir)
    q = stream_topk_serve(
        spark, qdir, emb, out, k=3, tier="cosine",
        checkpoint=str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in cosine_topk(emb, [0, 2], k=3).collect())
    assert got == want


def test_stream_serve_unknown_tier(spark, emb, tmp_path):
    from dask_array_spark.streaming.serving import stream_topk_serve

    with pytest.raises(ValueError, match="tier"):
        stream_topk_serve(spark, str(tmp_path), emb, lambda d, b: None,
                          tier="hnsw")


def test_stream_pq_serve_matches_batch(spark, emb, tmp_path):
    """The pq tier streams with its positional model surface riding
    in kwargs (cents/dim/codes), rerank included."""
    from dask_array_spark.functions.similarity import (
        pq_encode, pq_pack, pq_topk, pq_train,
    )

    cents = pq_train(emb, dim=64, m=4, n_codes=4, iters=1).persist()
    cents.count()
    packed = pq_pack(pq_encode(emb, cents, dim=64, m=4)).persist()
    packed.count()
    try:
        waves = [[0], [3, 6]]
        got = _serve_collect(
            spark, str(tmp_path / "q"), emb, waves, str(tmp_path),
            k=3, tier="pq", cents=cents, dim=64, m=4, codes=packed,
            rerank=4,
        )
        all_ids = sorted({v for w in waves for v in w})
        want = [
            tuple(r)
            for r in pq_topk(emb, all_ids, cents, dim=64, m=4, k=3,
                             codes=packed, rerank=4).collect()
        ]
        assert sorted(got) == sorted(want)
    finally:
        cents.unpersist(); packed.unpersist()


def test_stream_composed_serve_from_codes_index(spark, emb, tmp_path):
    """The full production index stack on a stream: both composed
    tiers served every micro-batch from their cell-partitioned codes
    index (pq_write_index / sq8_write_index read-backs, no assign
    argument -- the index embeds it), bit-parity with the batch call
    on the same persisted relations."""
    from dask_array_spark.functions.similarity import (
        ivf_assign, ivf_pq_topk, ivf_sq8_topk, pq_encode, pq_pack,
        pq_read_index, pq_train, pq_write_index, sq8_encode,
        sq8_read_index, sq8_write_index,
    )

    assign = ivf_assign(emb, n_cells=4)
    cents = pq_train(emb, dim=64, m=4, n_codes=4, iters=1).persist()
    cents.count()
    pq_path = str(tmp_path / "pq_index")
    pq_write_index(pq_pack(pq_encode(emb, cents, dim=64, m=4)), assign, pq_path)
    sq8_path = str(tmp_path / "sq8_index")
    sq8_write_index(sq8_encode(emb), assign, sq8_path)
    try:
        waves = [[0, 3], [7]]
        all_ids = sorted({v for w in waves for v in w})

        pq_idx = pq_read_index(spark, pq_path)
        got = _serve_collect(
            spark, str(tmp_path / "q1"), emb, waves, str(tmp_path / "t1"),
            k=3, tier="ivf_pq", pq_cents=cents, dim=64, m=4, n_cells=4,
            n_probe=2, codes=pq_idx, rerank=2,
        )
        want = [
            tuple(r)
            for r in ivf_pq_topk(
                emb, all_ids, cents, dim=64, m=4, k=3, n_cells=4,
                n_probe=2, codes=pq_idx, rerank=2,
            ).collect()
        ]
        assert sorted(got) == sorted(want)

        sq8_idx = sq8_read_index(spark, sq8_path)
        got = _serve_collect(
            spark, str(tmp_path / "q2"), emb, waves, str(tmp_path / "t2"),
            k=3, tier="ivf_sq8", n_cells=4, n_probe=2, codes=sq8_idx,
        )
        want = [
            tuple(r)
            for r in ivf_sq8_topk(
                emb, all_ids, k=3, n_cells=4, n_probe=2, codes=sq8_idx
            ).collect()
        ]
        assert sorted(got) == sorted(want)
    finally:
        cents.unpersist()
