"""Multimodal binary-column plumbing: schemas, batch shapes, stub
gating.  (Value correctness vs DuckDB is covered by the media_*
entries in tests/test_oracle.py.)"""

import pytest


def test_decode_image_is_gated(spark, sf_dir):
    from dask_array_spark.functions import multimodal as MM
    from dask_array_spark.sources import read_table

    d = MM.attach_bytes(read_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        MM.decode_image(d)


def test_frame_sample_schema_and_bytes(spark, sf_dir):
    from dask_array_spark.functions import multimodal as MM
    from dask_array_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    d = MM.attach_bytes(docs)
    frames = MM.frame_sample(d, frame_bytes=32, stride=2)
    assert [f.name for f in frames.schema.fields] == ["doc_id", "frame_id", "frame"]
    assert frames.schema["frame"].dataType.simpleString() == "binary"
    row = frames.orderBy("doc_id", "frame_id").first()
    text = docs.filter(docs.doc_id == row["doc_id"]).first()["text"]
    assert bytes(row["frame"]) == text.encode()[:32]


def test_media_metadata_has_content_hash(spark, sf_dir):
    from dask_array_spark.functions import multimodal as MM
    from dask_array_spark.sources import read_table

    d = MM.attach_bytes(read_table(spark, sf_dir, "documents"))
    md = MM.media_metadata(d)
    assert "content_hash" in md.columns
    # identical payloads hash identically (exact-dedup key for media)
    n_docs = d.count()
    n_hashes = md.select("content_hash").distinct().count()
    dup_groups = d.select("media").distinct().count()
    assert n_hashes == dup_groups <= n_docs
