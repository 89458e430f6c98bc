"""Multimodal binary-column plumbing: schemas, batch shapes, stub
gating, and BOTH decode paths -- lib-absent (gate raises, fallback
routes to the byte-level stand-in) and lib-present (the real PIL batch
logic, driven with an injected minimal PIL).  (Value correctness vs
DuckDB is covered by the media_* entries in tests/test_oracle.py.)"""

import sys
import types

import numpy as np
import pandas as pd
import pytest

_HAVE_PIL = True
try:
    import PIL.Image  # noqa: F401
except ImportError:
    _HAVE_PIL = False


def test_decode_image_is_gated(spark, sf_dir):
    from dask_array_spark.functions import multimodal as MM
    from dask_array_spark.sources import read_table

    if _HAVE_PIL:
        pytest.skip("imaging library present; gate does not apply")
    d = MM.attach_bytes(read_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        MM.decode_image(d)
    # decode_features silently falls back to the byte-level stand-in
    out = MM.decode_features(d)
    assert "mean_px" in out.columns and "width" not in out.columns
    assert out.count() == d.count()


class _FakeImage:
    """Minimal PIL.Image.Image stand-in: 4-wide uint8 'pixels'
    straight from the payload bytes."""

    def __init__(self, buf):
        if len(buf) < 4:
            raise OSError("cannot identify image file")
        self._buf = np.frombuffer(buf, dtype=np.uint8)
        self.mode = "L"

    @property
    def size(self):
        return (4, len(self._buf) // 4)

    def resize(self, wh):
        out = _FakeImage.__new__(_FakeImage)
        out._buf = self._buf[: wh[0] * wh[1]]
        out.mode = self.mode
        return out

    def convert(self, mode):
        return self

    def __array__(self, dtype=None):
        n = (len(self._buf) // 4) * 4
        a = self._buf[:n].reshape(-1, 4)
        return a.astype(dtype) if dtype else a


def _inject_fake_pil(monkeypatch):
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda fp: _FakeImage(fp.read())
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_decode_batch_real_path(monkeypatch):
    """The real decode kernel logic (_decode_batch) under a present
    imaging lib: per-item features plus graceful ok=False on corrupt
    payloads."""
    from dask_array_spark.functions.multimodal import _decode_batch

    _inject_fake_pil(monkeypatch)
    good = bytes(range(16))
    corrupt = b"xx"  # too short -> decoder raises -> ok=False row
    pdf = pd.DataFrame({"doc_id": [1, 2], "media": [good, corrupt]})
    out = _decode_batch(pdf, "media", "doc_id", None)
    assert list(out.columns) == [
        "doc_id", "width", "height", "mode", "mean_px", "std_px",
        "n_px", "ok",
    ]
    r1 = out[out.doc_id == 1].iloc[0]
    assert bool(r1.ok) and r1.width == 4 and r1.height == 4
    assert r1.n_px == 16 and r1.mean_px == np.arange(16).mean()
    r2 = out[out.doc_id == 2].iloc[0]
    assert not bool(r2.ok) and r2.n_px == 0 and np.isnan(r2.mean_px)


def test_decode_batch_resize(monkeypatch):
    from dask_array_spark.functions.multimodal import _decode_batch

    _inject_fake_pil(monkeypatch)
    pdf = pd.DataFrame({"doc_id": [1], "media": [bytes(range(64))]})
    out = _decode_batch(pdf, "media", "doc_id", (4, 2))
    r = out.iloc[0]
    # reported dims are the ORIGINAL image; n_px reflects the resize
    assert (r.width, r.height) == (4, 16)
    assert r.n_px == 8


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


def test_byte_kernels_vectorized_and_rowloop_paths_identical(spark):
    """The adaptive byte kernels (optimization round 13) pick between a
    batch-vectorized path (small payloads) and a per-row loop over
    zero-copy buffer views (media-sized payloads) by mean payload
    length -- the two paths must emit identical rows, including the
    empty-payload edge (nan moments)."""
    from pyspark.sql import functions as F

    from dask_array_spark.functions import multimodal as MM

    big = (
        spark.range(64, numPartitions=4)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") == 7, F.encode(F.lit(""), "utf-8"))
            .otherwise(
                F.encode(
                    F.concat_ws(
                        "",
                        F.array(
                            *[
                                F.sha2(
                                    F.concat(F.col("id").cast("string"), F.lit(i)), 256
                                )
                                for i in range(40)
                            ]
                        ),
                    ),
                    "utf-8",
                )
            )
            .alias("media"),
        )
        .persist()
    )
    big.count()

    def canon(df):
        out = []
        for r in sorted(tuple(x) for x in df.collect()):
            out.append(
                tuple("nan" if isinstance(v, float) and v != v else v for v in r)
            )
        return out

    orig = MM._VEC_MAX_AVG_BYTES
    try:
        for fn in (
            lambda: MM.byte_histogram(big, bins=16),
            lambda: MM.fake_decode_features(big),
        ):
            MM._VEC_MAX_AVG_BYTES = 10**9
            vec = canon(fn())
            MM._VEC_MAX_AVG_BYTES = 0
            loop = canon(fn())
            assert vec == loop
            assert len(vec) > 0
    finally:
        MM._VEC_MAX_AVG_BYTES = orig
    big.unpersist()
