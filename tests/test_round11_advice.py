"""Round-10 ADVICE closures (round 11).

1. crc32c strict policy is resolved DRIVER-side and closed over by the
   decode kernels: the explicit ``strict`` argument wins over the local
   environment, so an executor whose env lacks the knob still honors
   the policy the driver resolved at reader-build time.
2. 0-d zarr v2 stores refuse loudly (matching v3) instead of dying on
   ``grid.join`` inside ``_missing_chunks_df``.
3. The HDF5 v3 compound member-offset byte width derives from the
   datatype SIZE itself (spec IV.A.2.d), not size-1 -- at size=256 the
   two diverge (2 bytes vs 1) and the old width corrupted the member
   walk before the loud non-complex refusal could fire.
4. bench.py records the HOLD actually achieved so a budget-clipped
   settle is distinguishable from a full one.
"""

import json
import os
import struct

import numpy as np
import pytest


def test_crc32c_strict_arg_overrides_env(monkeypatch):
    """The driver-resolved ``strict`` argument is authoritative: even
    with NO env var set (an executor's worker env in a real cluster),
    strict='raise' refuses the unverified read, and strict='verify'
    verifies.  Reading the env inside the kernel was the round-10
    ADVICE bug -- the knob silently reverted on real clusters."""
    from dask_array_spark.sources import ingest as I

    if I._crc32c_lib() is not None:  # pragma: no cover
        pytest.skip("C crc32c installed: every size verifies, no fallback path")

    body = b"\xcd" * 64
    good = I._crc32c(body)
    monkeypatch.setattr(I, "_CRC32C_VERIFY_CAP", 16)
    # executor-like environment: the knob is NOT in os.environ
    monkeypatch.delenv("SPARK_GRAFT_CRC32C_STRICT", raising=False)

    with pytest.raises(RuntimeError, match="forbids unverified"):
        I._crc32c_check(body, good, "chunk", "raise")
    with pytest.raises(ValueError, match="crc32c mismatch"):
        I._crc32c_check(body, good + 1, "chunk", "verify")
    # and through the codec-chain wrapper too
    with pytest.raises(RuntimeError, match="forbids unverified"):
        I._zarr3_decode_bb(
            body + good.to_bytes(4, "little"), [("crc32c", {})], "chunk", "raise"
        )
    # conversely: env says raise, but the driver resolved '' (default)
    # -- the argument still wins (warn-and-strip)
    monkeypatch.setenv("SPARK_GRAFT_CRC32C_STRICT", "raise")
    with pytest.warns(RuntimeWarning, match="UNVERIFIED"):
        I._crc32c_check(body, good, "chunk", "")


def test_zarr_v3_reader_resolves_strict_at_build_time(monkeypatch, tmp_path, spark):
    """End-to-end: build the reader under strict=raise, clear the env
    (executor never saw it), run the plan -- the oversized crc32c chunk
    still refuses, proving the policy travels in the closure."""
    from dask_array_spark.sources import ingest as I
    from dask_array_spark.sources.ingest import from_zarr

    if I._crc32c_lib() is not None:  # pragma: no cover
        pytest.skip("C crc32c installed: every size verifies, no fallback path")

    url = str(tmp_path / "a.zarr")
    os.makedirs(os.path.join(url, "c"), exist_ok=True)
    # the chunk must REALLY exceed _CRC32C_VERIFY_CAP (1 MiB) in the
    # EXECUTOR: monkeypatching the driver module does not reach the
    # worker processes, which is exactly the env-propagation gap this
    # test exists to cover.  400x400 f8 = 1.28 MB.
    data = np.arange(160_000, dtype="float64").reshape(400, 400)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [400, 400],
        "data_type": "float64",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [400, 400]}},
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": 0.0,
        "codecs": [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "crc32c"},
        ],
    }
    with open(os.path.join(url, "zarr.json"), "w") as f:
        json.dump(meta, f)
    raw = data.tobytes()
    os.makedirs(os.path.join(url, "c", "0"), exist_ok=True)
    with open(os.path.join(url, "c", "0", "0"), "wb") as f:
        f.write(raw + I._crc32c(raw).to_bytes(4, "little"))

    monkeypatch.setenv("SPARK_GRAFT_CRC32C_STRICT", "raise")
    arr = from_zarr(spark, url)  # policy resolved HERE
    monkeypatch.delenv("SPARK_GRAFT_CRC32C_STRICT", raising=False)
    with pytest.raises(Exception, match="forbids unverified"):
        arr.df.collect()
    # sanity: the default policy (resolved at build time, env unset)
    # decodes the same store fine, warning executor-side
    arr2 = from_zarr(spark, url)
    np.testing.assert_array_equal(arr2.compute(), data)


def test_zarr_v2_0d_refuses(tmp_path, spark):
    from dask_array_spark.sources.ingest import from_zarr

    url = str(tmp_path / "s.zarr")
    os.makedirs(url)
    meta = {
        "zarr_format": 2,
        "shape": [],
        "chunks": [],
        "dtype": "<f8",
        "compressor": None,
        "fill_value": 1.5,
        "filters": None,
        "order": "C",
    }
    with open(os.path.join(url, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(url, "0"), "wb") as f:
        f.write(np.float64(2.5).tobytes())
    with pytest.raises(NotImplementedError, match="0-dimensional"):
        from_zarr(spark, url)


def test_missing_chunks_df_guards_ndim0(spark):
    from dask_array_spark.sources.ingest import _missing_chunks_df

    with pytest.raises(ValueError, match="ndim >= 1"):
        _missing_chunks_df(spark, None, None, (), (), 0)


def _v3_compound_body(size: int, members: list[tuple[str, int, int]]) -> bytes:
    """A v3 compound datatype message: header (ver 3, class 6, member
    count in bits 0-15, 4-byte size), then per member a bare
    NUL-terminated name, the offset in the spec's byte width (minimum
    bytes to encode ``size``), and a class-1 float member datatype
    message (8B header + 12B props)."""
    nb = max(1, (size.bit_length() + 7) // 8)
    body = bytes([0x36]) + struct.pack("<BBB", len(members), 0, 0)
    body += struct.pack("<I", size)
    for name, off, msize in members:
        body += name.encode() + b"\x00"
        body += off.to_bytes(nb, "little")
        body += bytes([0x11, 0, 0, 0]) + struct.pack("<I", msize) + b"\x00" * 12
    return body


def test_hdf5_v3_compound_offset_width_power_of_256():
    """size=256: the offset field is 2 bytes (256 needs 9 bits), where
    the old size-1 derivation read 1 byte (255 fits in 8) and walked
    the second member's name one byte early.  With the fix the member
    walk parses cleanly and the refusal NAMES the members."""
    from dask_array_spark.sources.hdf5 import _Reader

    body = _v3_compound_body(256, [("x", 0, 128), ("y", 128, 128)])
    rdr = object.__new__(_Reader)
    with pytest.raises(NotImplementedError, match=r"\['x', 'y'\]"):
        rdr._parse_compound_complex(body, 3, body[1:4], 256)
    # the accepted complex shapes still parse (regression guard):
    # c16 (size 16 -> 1-byte offsets) through the same v3 path
    body16 = _v3_compound_body(16, [("r", 0, 8), ("i", 8, 8)])
    dt = rdr._parse_compound_complex(body16, 3, body16[1:4], 16)
    assert dt == np.dtype("<c16")


def test_bench_quiet_hold_fields():
    """_wait_for_quiet reports the hold actually achieved and whether
    the budget clipped it (round-10 ADVICE: a ~0 s clipped hold used
    to read as a full settle)."""
    import bench

    old = dict(os.environ)
    try:
        os.environ["SPARK_GRAFT_BENCH_QUIET_LOAD"] = "1e9"  # instantly quiet
        os.environ["SPARK_GRAFT_BENCH_QUIET_MAX"] = "1"
        q = bench._wait_for_quiet()
        assert q["quiet_hold_sec"] == 0.0
        assert q["quiet_hold_truncated"] is False
        assert {"quiet_wait_sec", "quiet_wait_timeout", "quiet_threshold"} <= set(q)
    finally:
        os.environ.clear()
        os.environ.update(old)
