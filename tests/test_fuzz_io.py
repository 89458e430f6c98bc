"""Round-trip fuzz of the spec-native IO connectors (round-7 verdict
ask 5): random shapes / chunks / dtypes / compressor combos through
zarr, npy-stack, HDF5 and TileDB, asserted cell-exact against NumPy,
plus truncated/garbled-file error paths for the readers -- the
readers hand-parse bytes (hdf5.py walks superblocks and B-trees), so
odd-shape/odd-chunk edges and malformed inputs are the likeliest
remaining bug class.  Mirrors the reference's round-trip coverage
(dask_array/tests/test_creation.py zarr/npy cases).

Every float round-trip also pins the REDUCTION semantics: a store
containing NaN must sum/mean to NaN (the cells arrive as NULL rows,
never dropped -- the round-8 IO-tier NaN sweep), and nansum must skip
them.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dask_array_spark.sources import (
    from_hdf5,
    from_npy_stack,
    from_numpy,
    from_tiledb,
    from_zarr,
    to_hdf5,
    to_npy_stack,
    to_tiledb,
    to_zarr,
)
from dask_array_spark.operators import reductions as R

from tests.conftest import assert_eq


def _mkdir() -> str:
    return os.path.join(tempfile.mkdtemp(), uuid.uuid4().hex)


def _data(seed: int, shape, nan: bool):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape) * 10
    if nan:
        m = rng.random(shape) < 0.3
        x = np.where(m, np.nan, x)
    return x


def _check_reductions(spark, arr, x):
    s = R.sum(arr, axis=None).compute()
    if np.isnan(x).any():
        assert np.isnan(s), f"sum over NaN-bearing store must be NaN, got {s}"
    else:
        np.testing.assert_allclose(s, x.sum(), rtol=1e-9)
    np.testing.assert_allclose(
        R.nansum(arr, axis=None).compute(), np.nansum(x), rtol=1e-9
    )


SHAPE_12 = st.lists(st.integers(1, 7), min_size=1, max_size=2)
SHAPE_13 = st.lists(st.integers(1, 6), min_size=1, max_size=3)


@settings(max_examples=3, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    chunk_seed=st.integers(0, 2**31),
    comp=st.sampled_from([None, "zlib"]),
    nan=st.booleans(),
)
def test_fuzz_zarr_roundtrip(spark, shape, seed, chunk_seed, comp, nan):
    shape = tuple(shape)
    rng = np.random.default_rng(chunk_seed)
    chunks = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _data(seed, shape, nan)
    url = _mkdir()
    to_zarr(from_numpy(spark, x), url, chunks=chunks, compressor=comp)
    back = from_zarr(spark, url)
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    files=st.integers(1, 5),
    nan=st.booleans(),
)
def test_fuzz_npy_stack_roundtrip(spark, shape, seed, files, nan):
    shape = tuple(shape)
    x = _data(seed, shape, nan)
    d = _mkdir()
    to_npy_stack(from_numpy(spark, x), d, files=files)
    back = from_npy_stack(spark, d)
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


@settings(max_examples=4, deadline=None)
@given(shape=SHAPE_13, seed=st.integers(0, 2**31), nan=st.booleans())
def test_fuzz_hdf5_roundtrip(spark, shape, seed, nan):
    shape = tuple(shape)
    x = _data(seed, shape, nan)
    path = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    to_hdf5(from_numpy(spark, x), path, "/g/x")
    back = from_hdf5(spark, path, "/g/x")
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


@settings(max_examples=3, deadline=None)
@given(
    shape=SHAPE_13,
    seed=st.integers(0, 2**31),
    chunk_seed=st.integers(0, 2**31),
    comp=st.sampled_from([None, "gzip"]),
    shuf=st.booleans(),
    nan=st.booleans(),
)
def test_fuzz_hdf5_chunked_roundtrip(
    spark, shape, seed, chunk_seed, comp, shuf, nan
):
    """Chunked+deflate write leg (round 11): the writer emits a v1
    chunk B-tree + filter pipeline (h5py's default chunked/gzip
    output shape), the spec-native reader round-trips it, and the
    NaN/NULL reduction contract holds like every other store."""
    shape = tuple(shape)
    rng = np.random.default_rng(chunk_seed)
    chunks = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _data(seed, shape, nan)
    path = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    to_hdf5(from_numpy(spark, x), path, "/g/x",
            chunks=chunks, compression=comp, shuffle=shuf)
    back = from_hdf5(spark, path, "/g/x")
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


def test_hdf5_chunked_multi_dataset_and_btree_depth(spark):
    """A dict write mixing chunked float64/uint64/complex datasets
    (independent B-trees and filter pipelines per dataset) plus one
    chunk count past the node capacity so the B-tree goes multi-node."""
    rng = np.random.default_rng(7)
    xf = rng.normal(size=(997,))  # 143 chunks of 7 -> multi-level tree
    xu = np.array([1, 2**53 + 1, 2**63 + 17, 2**64 - 1] * 6, dtype=np.uint64)
    xc = rng.normal(size=(10, 3)) + 1j * rng.normal(size=(10, 3))
    path = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    to_hdf5(
        {"/f": from_numpy(spark, xf), "/u": from_numpy(spark, xu),
         "/c": from_numpy(spark, xc)},
        path, chunks=None, compression="gzip", shuffle=True,
    )
    np.testing.assert_allclose(from_hdf5(spark, path, "/f").compute(), xf)
    got_u = from_hdf5(spark, path, "/u").compute()
    assert got_u.dtype == np.uint64
    np.testing.assert_array_equal(got_u, xu)
    np.testing.assert_allclose(from_hdf5(spark, path, "/c").compute(), xc)
    # explicit small chunks on the float dataset: deep tree, exact read
    path2 = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(path2), exist_ok=True)
    to_hdf5(from_numpy(spark, xf), path2, "/f",
            chunks=(7,), compression="gzip")
    np.testing.assert_allclose(from_hdf5(spark, path2, "/f").compute(), xf)


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    tile_seed=st.integers(0, 2**31),
    nan=st.booleans(),
)
def test_fuzz_tiledb_roundtrip(spark, shape, seed, tile_seed, nan):
    from tests.test_tiledb import FAKE

    shape = tuple(shape)
    rng = np.random.default_rng(tile_seed)
    tile = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _data(seed, shape, nan)
    uri = _mkdir()
    os.makedirs(os.path.dirname(uri), exist_ok=True)
    to_tiledb(from_numpy(spark, x), uri, tile=tile, _tiledb=FAKE)
    back = from_tiledb(spark, uri, _tiledb=FAKE)
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


# ------------------------------------------------------- external stores


def _hand_zarr(url, meta, chunks_bytes):
    os.makedirs(url, exist_ok=True)
    with open(os.path.join(url, ".zarray"), "w") as f:
        json.dump(meta, f)
    for name, raw in chunks_bytes.items():
        with open(os.path.join(url, name), "wb") as f:
            f.write(raw)


def test_zarr_int_bool_stores_preserve_dtype(spark):
    """Stores written by external tools carry int/bool dtypes; the
    reader must keep them (long/boolean columns) instead of widening
    to double (same contract as from_tiledb/from_numpy)."""
    xi = (np.arange(10) * 3 - 5).astype("<i8")
    url = _mkdir()
    _hand_zarr(
        url,
        {"zarr_format": 2, "shape": [10], "chunks": [4], "dtype": "<i8",
         "compressor": None, "fill_value": 0, "filters": None, "order": "C"},
        {"0": xi[0:4].tobytes(), "1": xi[4:8].tobytes(),
         "2": np.pad(xi[8:10], (0, 2)).tobytes()},
    )
    a = from_zarr(spark, url)
    assert dict(a.df.dtypes)["v"] == "bigint"
    assert_eq(a, xi.astype("int64"))

    xb = np.array([True, False, True, False, True])
    urlb = _mkdir()
    _hand_zarr(
        urlb,
        {"zarr_format": 2, "shape": [5], "chunks": [5], "dtype": "|b1",
         "compressor": None, "fill_value": False, "filters": None,
         "order": "C"},
        {"0": xb.tobytes()},
    )
    b = from_zarr(spark, urlb)
    assert dict(b.df.dtypes)["v"] == "boolean"
    np.testing.assert_array_equal(b.compute().astype(bool), xb)


def test_zarr_fill_value_semantics(spark):
    """Missing chunks materialize at the fill value; a NaN fill gives
    NULL cells (so sum propagates NaN, matching NumPy over the dense
    array the reference would read); fill_value null keeps truly
    absent cells."""
    meta = {"zarr_format": 2, "shape": [8], "chunks": [4], "dtype": "<f8",
            "compressor": None, "filters": None, "order": "C"}
    first = np.arange(4.0)

    url5 = _mkdir()
    _hand_zarr(url5, {**meta, "fill_value": 5.0}, {"0": first.tobytes()})
    a = from_zarr(spark, url5)
    assert_eq(a, np.concatenate([first, np.full(4, 5.0)]))

    urln = _mkdir()
    _hand_zarr(urln, {**meta, "fill_value": "NaN"}, {"0": first.tobytes()})
    b = from_zarr(spark, urln)
    assert b.df.count() == 8  # NULL cells PRESENT for the missing chunk
    assert np.isnan(R.sum(b, axis=None).compute())
    np.testing.assert_allclose(R.nansum(b, axis=None).compute(), first.sum())

    urla = _mkdir()
    _hand_zarr(urla, {**meta, "fill_value": None}, {"0": first.tobytes()})
    c = from_zarr(spark, urla)
    assert c.df.count() == 4  # "undefined" fill -> truly absent cells


# ----------------------------------------------------- garbled inputs


def test_zarr_garbled_inputs(spark):
    # truncated zlib chunk: the error must NAME the chunk and codec
    url = _mkdir()
    good = zlib.compress(np.arange(4.0).tobytes(), 5)
    _hand_zarr(
        url,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
         "compressor": {"id": "zlib", "level": 5}, "fill_value": None,
         "filters": None, "order": "C"},
        {"0": good[: len(good) // 2]},
    )
    with pytest.raises(Exception, match="zarr chunk"):
        from_zarr(spark, url).compute()

    # wrong-size raw chunk: reshape must fail loudly, not mis-index
    url2 = _mkdir()
    _hand_zarr(
        url2,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
         "compressor": None, "fill_value": None, "filters": None,
         "order": "C"},
        {"0": b"\x00" * 17},
    )
    with pytest.raises(Exception):
        from_zarr(spark, url2).compute()

    # garbage .zarray JSON fails at the driver
    url3 = _mkdir()
    os.makedirs(url3, exist_ok=True)
    with open(os.path.join(url3, ".zarray"), "w") as f:
        f.write("{not json")
    with pytest.raises(Exception):
        from_zarr(spark, url3)

    # unsupported compressor / dtype are clean NotImplementedError
    url4 = _mkdir()
    _hand_zarr(
        url4,
        {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f8",
         "compressor": {"id": "lz4"}, "fill_value": None, "filters": None,
         "order": "C"},
        {},
    )
    with pytest.raises(NotImplementedError, match="compressor"):
        from_zarr(spark, url4)
    url5 = _mkdir()
    _hand_zarr(
        url5,
        {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<M8[ns]",
         "compressor": None, "fill_value": None, "filters": None,
         "order": "C"},
        {},
    )
    with pytest.raises(NotImplementedError, match="dtype"):
        from_zarr(spark, url5)


def test_npy_stack_truncated(spark):
    x = np.arange(12.0)
    d = _mkdir()
    to_npy_stack(from_numpy(spark, x), d, files=2)
    f0 = os.path.join(d, "0.npy")
    raw = open(f0, "rb").read()
    with open(f0, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        from_npy_stack(spark, d).compute()


def test_hdf5_garbled_inputs(spark):
    # random bytes: no superblock signature
    p = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(os.urandom(4096))
    with pytest.raises(ValueError, match="not an HDF5 file"):
        from_hdf5(spark, p, "/x")

    # a VALID file truncated mid-data: reader must raise, not return
    # short/garbage cells
    x = np.arange(64.0)
    p2 = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(p2), exist_ok=True)
    to_hdf5(from_numpy(spark, x), p2, "/x")
    raw = open(p2, "rb").read()
    with open(p2, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        from_hdf5(spark, p2, "/x").compute()

    # missing datapath names the problem
    p3 = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(p3), exist_ok=True)
    to_hdf5(from_numpy(spark, x), p3, "/x")
    with pytest.raises(Exception, match="y"):
        from_hdf5(spark, p3, "/y")


def test_zarr_narrow_dtypes_upcast(spark):
    """<f4 / <i4 external stores: float32 upcasts to double, int32 to
    long -- value-exact, with NaN-in-f4 arriving as NULL."""
    xf = np.array([1.5, np.nan, -2.25, 8.0], dtype="<f4")
    url = _mkdir()
    _hand_zarr(
        url,
        {"zarr_format": 2, "shape": [4], "chunks": [2], "dtype": "<f4",
         "compressor": None, "fill_value": None, "filters": None,
         "order": "C"},
        {"0": xf[:2].tobytes(), "1": xf[2:].tobytes()},
    )
    a = from_zarr(spark, url)
    assert dict(a.df.dtypes)["v"] == "double"
    assert_eq(a, xf.astype("float64"))
    assert np.isnan(R.sum(a, axis=None).compute())

    xi = np.array([-7, 0, 123456, 42], dtype="<i4")
    urli = _mkdir()
    _hand_zarr(
        urli,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<i4",
         "compressor": None, "fill_value": 0, "filters": None,
         "order": "C"},
        {"0": xi.tobytes()},
    )
    b = from_zarr(spark, urli)
    assert dict(b.df.dtypes)["v"] == "bigint"
    assert_eq(b, xi.astype("int64"))


# ---------------------------------------------------------------------------
# zarr v3 (round-9 verdict ask 2): spec-native reads of zarr.json
# stores -- both chunk-key grammars, codec chains, sharding_indexed --
# differentially fuzzed against an INDEPENDENT plain-Python v3 store
# writer below (its crc32c is a bit-by-bit implementation, so the
# engine's table-driven one is cross-checked too).
# ---------------------------------------------------------------------------


def _crc32c_ref(data: bytes) -> int:
    """Independent bit-by-bit CRC-32C (Castagnoli) for the test-side
    writer -- deliberately NOT the engine's table implementation."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


def _v3_encode(block: np.ndarray, endian: str, gzip_level, crc: bool) -> bytes:
    import gzip as _gzip

    dt = block.dtype.newbyteorder("<" if endian == "little" else ">")
    raw = np.ascontiguousarray(block, dtype=dt).tobytes()
    if gzip_level is not None:
        raw = _gzip.compress(raw, gzip_level)
    if crc:
        raw += _crc32c_ref(raw).to_bytes(4, "little")
    return raw


def _hand_zarr3(
    x: np.ndarray,
    url,
    chunks,
    *,
    inner=None,
    gzip_level=None,
    crc_chunks=False,
    endian="little",
    key="default",
    sep=None,
    fill="NaN",
    index_location="end",
    index_crc=True,
    omit=frozenset(),
    omit_inner=frozenset(),
    transpose_order=None,
):
    """Write a spec-conformant zarr v3 store by hand.  ``inner`` turns
    on sharding_indexed (chunks = SHARD shape).  ``omit`` skips whole
    chunk/shard files; ``omit_inner`` marks (shard_coords,
    inner_coords) entries missing inside a written shard.
    ``transpose_order`` prepends the 'transpose' array->array codec
    (stored chunk = that permutation of the logical one)."""
    os.makedirs(url, exist_ok=True)
    ndim = x.ndim
    shape = x.shape
    sep = sep or ("/" if key == "default" else ".")
    pad = np.nan if x.dtype.kind == "f" else 0
    bb = []
    if gzip_level is not None:
        bb.append({"name": "gzip", "configuration": {"level": gzip_level}})
    if crc_chunks:
        bb.append({"name": "crc32c"})
    chain = [{"name": "bytes", "configuration": {"endian": endian}}] + bb
    if transpose_order is not None:
        chain = [
            {"name": "transpose",
             "configuration": {"order": list(transpose_order)}}
        ] + chain
    if inner is None:
        codecs = chain
    else:
        codecs = [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": list(inner),
                "codecs": chain,
                "index_codecs": (
                    [{"name": "bytes", "configuration": {"endian": "little"}}]
                    + ([{"name": "crc32c"}] if index_crc else [])
                ),
                "index_location": index_location,
            },
        }]
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": str(x.dtype),
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunks)}},
        "chunk_key_encoding": {"name": key,
                               "configuration": {"separator": sep}},
        "fill_value": fill,
        "codecs": codecs,
    }
    with open(os.path.join(url, "zarr.json"), "w") as f:
        json.dump(meta, f)

    def key_path(coords):
        parts = [str(c) for c in coords]
        if key == "default":
            parts = ["c"] + parts
        if sep == "/":
            fp = os.path.join(url, *parts)
            os.makedirs(os.path.dirname(fp), exist_ok=True)
            return fp
        return os.path.join(url, sep.join(parts))

    import math
    grid = list(np.ndindex(*(math.ceil(shape[k] / chunks[k]) for k in range(ndim))))
    for cc in grid:
        if tuple(cc) in omit:
            continue
        block = np.full(chunks, pad, dtype=x.dtype)
        sl_src = tuple(
            slice(cc[k] * chunks[k], min((cc[k] + 1) * chunks[k], shape[k]))
            for k in range(ndim)
        )
        dims = tuple(s.stop - s.start for s in sl_src)
        block[tuple(slice(0, d) for d in dims)] = x[sl_src]
        if inner is None:
            stored = (
                np.transpose(block, transpose_order)
                if transpose_order is not None else block
            )
            payload = _v3_encode(np.ascontiguousarray(stored), endian,
                                 gzip_level, crc_chunks)
        else:
            cps = tuple(chunks[k] // inner[k] for k in range(ndim))
            n_inner = int(np.prod(cps))
            idx_size = 16 * n_inner + (4 if index_crc else 0)
            entries = [None] * n_inner
            body_parts = []
            pos = idx_size if index_location == "start" else 0
            # write inner chunks in REVERSE grid order to stress the
            # reader's offset handling
            order = list(enumerate(np.ndindex(*cps)))[::-1]
            for i, ic in order:
                if (tuple(cc), tuple(ic)) in omit_inner:
                    continue
                isl = tuple(
                    slice(ic[k] * inner[k], (ic[k] + 1) * inner[k])
                    for k in range(ndim)
                )
                iblk = block[isl]
                if transpose_order is not None:
                    iblk = np.transpose(iblk, transpose_order)
                enc = _v3_encode(
                    np.ascontiguousarray(iblk), endian, gzip_level,
                    crc_chunks,
                )
                entries[i] = (pos, len(enc))
                body_parts.append(enc)
                pos += len(enc)
            tab = np.full((n_inner, 2), 0xFFFFFFFFFFFFFFFF, dtype="<u8")
            for i, e in enumerate(entries):
                if e is not None:
                    tab[i] = e
            idx = tab.tobytes()
            if index_crc:
                idx += _crc32c_ref(idx).to_bytes(4, "little")
            body = b"".join(body_parts)
            payload = idx + body if index_location == "start" else body + idx
        with open(key_path(cc), "wb") as f:
            f.write(payload)


def _v3_expected(x, chunks, fill, omit):
    """Dense expectation with omitted chunks replaced by the fill."""
    import math
    exp = np.array(x, dtype="float64" if x.dtype.kind == "f" else x.dtype)
    for cc in omit:
        sl = tuple(
            slice(cc[k] * chunks[k], min((cc[k] + 1) * chunks[k], x.shape[k]))
            for k in range(x.ndim)
        )
        exp[sl] = fill
    return exp


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    chunk_seed=st.integers(0, 2**31),
    gz=st.sampled_from([None, 5]),
    crc=st.booleans(),
    endian=st.sampled_from(["little", "big"]),
    key=st.sampled_from(["default", "v2"]),
    sepc=st.sampled_from(["/", "."]),
    nan=st.booleans(),
    drop=st.booleans(),
)
def test_fuzz_zarr_v3_roundtrip(
    spark, shape, seed, chunk_seed, gz, crc, endian, key, sepc, nan, drop
):
    shape = tuple(shape)
    rng = np.random.default_rng(chunk_seed)
    chunks = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _data(seed, shape, nan)
    import math
    grid = list(np.ndindex(*(math.ceil(shape[k] / chunks[k]) for k in range(x.ndim))))
    omit = set()
    if drop and len(grid) > 1:
        omit = {tuple(grid[int(rng.integers(0, len(grid)))])}
    url = _mkdir()
    _hand_zarr3(x, chunks=chunks, url=url, gzip_level=gz, crc_chunks=crc,
                endian=endian, key=key, sep=sepc, omit=omit)
    back = from_zarr(spark, url)
    assert back.shape == shape
    exp = _v3_expected(x, chunks, np.nan, omit)
    assert_eq(back, exp)
    _check_reductions(spark, back, exp)


@settings(max_examples=4, deadline=None)
@given(
    shape=st.lists(st.integers(2, 9), min_size=1, max_size=2),
    seed=st.integers(0, 2**31),
    pick=st.integers(0, 2**31),
    gz=st.sampled_from([None, 5]),
    loc=st.sampled_from(["end", "start"]),
    icrc=st.booleans(),
    nan=st.booleans(),
)
def test_fuzz_zarr_v3_sharded_roundtrip(spark, shape, seed, pick, gz, loc, icrc, nan):
    """Sharded stores: random inner/shard factorization, index at
    either end, with and without the index checksum, missing whole
    shards AND missing inner chunks -> fill."""
    shape = tuple(shape)
    rng = np.random.default_rng(pick)
    inner = tuple(int(rng.integers(1, 4)) for _ in shape)
    cps = tuple(int(rng.integers(1, 4)) for _ in shape)
    chunks = tuple(i * c for i, c in zip(inner, cps))
    x = _data(seed, shape, nan)
    import math
    grid = list(np.ndindex(*(math.ceil(shape[k] / chunks[k]) for k in range(x.ndim))))
    omit, omit_inner = set(), set()
    if len(grid) > 1:
        omit = {tuple(grid[int(rng.integers(0, len(grid)))])}
    kept = [g for g in grid if tuple(g) not in omit]
    if kept and int(np.prod(cps)) > 1:
        sc = tuple(kept[int(rng.integers(0, len(kept)))])
        ic = tuple(int(rng.integers(0, c)) for c in cps)
        omit_inner = {(sc, ic)}
    url = _mkdir()
    _hand_zarr3(x, chunks=chunks, url=url, inner=inner, gzip_level=gz,
                index_location=loc, index_crc=icrc,
                omit=omit, omit_inner=omit_inner)
    back = from_zarr(spark, url)
    assert back.shape == shape
    exp = _v3_expected(x, chunks, np.nan, omit)
    for sc, ic in omit_inner:
        sl = tuple(
            slice(
                sc[k] * chunks[k] + ic[k] * inner[k],
                min(sc[k] * chunks[k] + (ic[k] + 1) * inner[k], shape[k]),
            )
            for k in range(x.ndim)
        )
        exp[sl] = np.nan
    assert_eq(back, exp)
    _check_reductions(spark, back, exp)


def test_zarr_v3_int_store_and_fill(spark):
    """int v3 store: dtype preserved (bigint column), integer fill for
    an omitted chunk."""
    xi = (np.arange(12).reshape(3, 4) * 7 - 30).astype("int32")
    url = _mkdir()
    _hand_zarr3(xi, chunks=(2, 2), url=url, fill=-1, omit={(1, 1)})
    a = from_zarr(spark, url)
    assert dict(a.df.dtypes)["v"] == "bigint"
    exp = xi.astype("int64").copy()
    exp[2:3, 2:4] = -1
    assert_eq(a, exp)


def test_zarr_v3_engine_write_roundtrip(spark):
    """to_zarr(zarr_format=3) -> from_zarr, raw and gzip; the store on
    disk uses the c/-prefixed default key encoding."""
    x = _data(5, (5, 7), nan=True)
    for comp in (None, "zlib"):
        url = _mkdir()
        to_zarr(from_numpy(spark, x), url, chunks=(2, 3), compressor=comp,
                zarr_format=3)
        assert os.path.exists(os.path.join(url, "zarr.json"))
        assert os.path.exists(os.path.join(url, "c", "0", "0"))
        back = from_zarr(spark, url)
        assert_eq(back, x)
        _check_reductions(spark, back, x)


def test_zarr_v3_garbled_inputs(spark):
    """Unsupported codecs refuse loudly; corrupt checksums and
    truncated shards name the failing chunk."""
    x = np.arange(8, dtype="float64")
    # an unknown array->array codec -> loud refusal (transpose itself
    # is SUPPORTED since round 9, see test_zarr_v3_transpose_codec)
    url = _mkdir()
    _hand_zarr3(x, chunks=(4,), url=url)
    with open(os.path.join(url, "zarr.json")) as f:
        meta = json.load(f)
    meta["codecs"] = [{"name": "fancy_reorder",
                       "configuration": {"order": [0]}}] + meta["codecs"]
    with open(os.path.join(url, "zarr.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(NotImplementedError, match="fancy_reorder"):
        from_zarr(spark, url)

    # corrupt chunk crc32c -> ValueError naming the chunk
    url2 = _mkdir()
    _hand_zarr3(x, chunks=(4,), url=url2, crc_chunks=True)
    p = os.path.join(url2, "c", "0")
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-4] + b"\x00\x00\x00\x01")
    with pytest.raises(Exception, match="crc32c mismatch"):
        from_zarr(spark, url2).compute()

    # truncated shard (index sliced off) -> loud error
    url3 = _mkdir()
    _hand_zarr3(x, chunks=(8,), url=url3, inner=(2,))
    p3 = os.path.join(url3, "c", "0")
    raw3 = open(p3, "rb").read()
    open(p3, "wb").write(raw3[: len(raw3) // 2])
    with pytest.raises(Exception):
        from_zarr(spark, url3).compute()

    # uint64 data_type READS since round 11 (decimal(20,0) cells;
    # full contract in test_uint64.py) -- relabeling the float64
    # bytes is a pure reinterpret, so the read must see x.view(u8)
    # exactly; but the store's "NaN" fill is malformed for an
    # unsigned dtype and must refuse with the reason
    url4 = _mkdir()
    _hand_zarr3(x, chunks=(4,), url=url4)
    with open(os.path.join(url4, "zarr.json")) as f:
        meta4 = json.load(f)
    meta4["data_type"] = "uint64"
    with open(os.path.join(url4, "zarr.json"), "w") as f:
        json.dump(meta4, f)
    with pytest.raises(ValueError, match="integral"):
        from_zarr(spark, url4)
    meta4["fill_value"] = 0
    with open(os.path.join(url4, "zarr.json"), "w") as f:
        json.dump(meta4, f)
    np.testing.assert_array_equal(
        from_zarr(spark, url4).compute(), x.view("<u8")
    )


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    chunk_seed=st.integers(0, 2**31),
    comp=st.sampled_from([None, "zlib"]),
    nan=st.booleans(),
)
def test_zarr_v2_v3_cross_format_equivalence(spark, shape, seed, chunk_seed, comp, nan):
    """The same array written as a v2 store and a v3 store must read
    back identically through the ONE from_zarr entry point -- the
    user-facing guarantee that the format dispatch is invisible."""
    shape = tuple(shape)
    rng = np.random.default_rng(chunk_seed)
    chunks = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _data(seed, shape, nan)
    u2, u3 = _mkdir(), _mkdir()
    arr = from_numpy(spark, x)
    to_zarr(arr, u2, chunks=chunks, compressor=comp, zarr_format=2)
    to_zarr(arr, u3, chunks=chunks, compressor=comp, zarr_format=3)
    b2, b3 = from_zarr(spark, u2), from_zarr(spark, u3)
    assert b2.shape == b3.shape == shape
    assert_eq(b2, x)
    assert_eq(b3, x)


@settings(max_examples=3, deadline=None)
@given(
    shape=st.lists(st.integers(2, 9), min_size=1, max_size=2),
    seed=st.integers(0, 2**31),
    pick=st.integers(0, 2**31),
    comp=st.sampled_from([None, "zlib"]),
    nan=st.booleans(),
)
def test_fuzz_zarr_v3_sharded_write_roundtrip(spark, shape, seed, pick, comp, nan):
    """Engine SHARDED v3 writes (round 9): random inner/shard
    factorizations through to_zarr(shards=) -> from_zarr, cell-exact
    vs NumPy with the NaN reduction contract intact."""
    shape = tuple(shape)
    rng = np.random.default_rng(pick)
    inner = tuple(int(rng.integers(1, 4)) for _ in shape)
    cps = tuple(int(rng.integers(1, 4)) for _ in shape)
    shards = tuple(i * c for i, c in zip(inner, cps))
    x = _data(seed, shape, nan)
    url = _mkdir()
    to_zarr(from_numpy(spark, x), url, chunks=inner, compressor=comp,
            zarr_format=3, shards=shards)
    back = from_zarr(spark, url)
    assert back.shape == shape
    assert_eq(back, x)
    _check_reductions(spark, back, x)


def test_zarr_v3_sharded_write_binary_layout(spark):
    """Parse one engine-written shard with an INDEPENDENT plain-Python
    reader (the test-side crc32c, not the engine's): index at the end,
    crc-valid, missing sentinel for out-of-bounds inner chunks, and
    the decoded inner chunks reproduce the array."""
    x = np.arange(30, dtype="float64").reshape(5, 6)
    url = _mkdir()
    # shards (4, 4), inner (2, 2): shard (1, 1) spans rows 4..7 (only
    # row 4 exists) -> its bottom inner chunks are missing sentinels
    to_zarr(from_numpy(spark, x), url, chunks=(2, 2), zarr_format=3,
            shards=(4, 4))
    p = os.path.join(url, "c", "1", "1")
    raw = open(p, "rb").read()
    n_inner = 4
    idx = raw[-(16 * n_inner + 4):]
    assert _crc32c_ref(idx[:-4]) == int.from_bytes(idx[-4:], "little")
    tab = np.frombuffer(idx[:-4], dtype="<u8").reshape(n_inner, 2)
    missing = np.uint64(0xFFFFFFFFFFFFFFFF)
    # inner grid order: (0,0), (0,1), (1,0), (1,1); the 5x6 array ends
    # at row 4 / col 5, so only inner (0,0) (rows 4-5, cols 4-5) holds
    # any in-bounds cells -- the other three are missing sentinels
    assert all(tab[i][0] == missing for i in (1, 2, 3))
    off, nb = int(tab[0][0]), int(tab[0][1])
    blk = np.frombuffer(raw[off:off + nb], dtype="<f8").reshape(2, 2)
    want = np.full((2, 2), np.nan)
    want[:1, :2] = x[4:5, 4:6]  # row 5 of the chunk is fill (NaN)
    np.testing.assert_array_equal(np.isnan(blk), np.isnan(want))
    np.testing.assert_array_equal(blk[~np.isnan(want)], want[~np.isnan(want)])


def test_zarr_dtype_follows_value_column(spark):
    """int and bool arrays write int64/bool stores in BOTH formats and
    read back with their dtype preserved (round 9 -- previously every
    write widened to f8)."""
    xi = (np.arange(12).reshape(3, 4) * 5 - 20).astype("int64")
    xb = np.array([[True, False, True], [False, True, False]])
    for fmt in (2, 3):
        ui = _mkdir()
        to_zarr(from_numpy(spark, xi), ui, chunks=(2, 2), zarr_format=fmt)
        bi = from_zarr(spark, ui)
        assert dict(bi.df.dtypes)["v"] == "bigint"
        assert_eq(bi, xi)
        ub = _mkdir()
        to_zarr(from_numpy(spark, xb), ub, chunks=(2, 2), zarr_format=fmt)
        bb = from_zarr(spark, ub)
        assert dict(bb.df.dtypes)["v"] == "boolean"
        np.testing.assert_array_equal(bb.compute().astype(bool), xb)
    with pytest.raises(NotImplementedError, match="shards"):
        to_zarr(from_numpy(spark, xi), _mkdir(), chunks=(2, 2), shards=(4, 4))
    with pytest.raises(ValueError, match="chunk-multiples"):
        to_zarr(from_numpy(spark, xi), _mkdir(), chunks=(2, 2), zarr_format=3,
                shards=(3, 4))


@settings(max_examples=4, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    pick=st.integers(0, 2**31),
    gz=st.sampled_from([None, 5]),
    shard=st.booleans(),
)
def test_zarr_v3_transpose_codec(spark, seed, pick, gz, shard):
    """The v3 'transpose' array->array codec: the stored chunk is the
    order-permutation of the logical one.  Hand-write stores (2-D,
    random permutation, optional sharding where transpose sits in the
    INNER chain) and read them back cell-exact."""
    rng = np.random.default_rng(pick)
    shape = (int(rng.integers(2, 8)), int(rng.integers(2, 8)))
    x = _data(seed, shape, nan=False)
    order = [0, 1] if rng.integers(0, 2) == 0 else [1, 0]
    url = _mkdir()
    if shard:
        inner = (1 + int(rng.integers(0, 2)), 1 + int(rng.integers(0, 2)))
        chunks = (inner[0] * 2, inner[1] * 2)
        _hand_zarr3(x, url, chunks, inner=inner, gzip_level=gz,
                    transpose_order=order)
    else:
        chunks = (int(rng.integers(1, 5)), int(rng.integers(1, 5)))
        _hand_zarr3(x, url, chunks, gzip_level=gz, transpose_order=order)
    back = from_zarr(spark, url)
    assert back.shape == shape
    assert_eq(back, x)


def test_zarr_float16_stores(spark):
    """float16 external stores (both formats) read as double,
    value-exact, NaN -> NULL."""
    xh = np.array([1.5, np.nan, -2.25, 0.125], dtype="<f2")
    u2 = _mkdir()
    _hand_zarr(
        u2,
        {"zarr_format": 2, "shape": [4], "chunks": [2], "dtype": "<f2",
         "compressor": None, "fill_value": None, "filters": None,
         "order": "C"},
        {"0": xh[:2].tobytes(), "1": xh[2:].tobytes()},
    )
    a = from_zarr(spark, u2)
    assert dict(a.df.dtypes)["v"] == "double"
    assert_eq(a, xh.astype("float64"))
    u3 = _mkdir()
    _hand_zarr3(xh.astype("float16"), u3, (3,))
    b = from_zarr(spark, u3)
    assert_eq(b, xh.astype("float64"))
    assert np.isnan(R.sum(b, axis=None).compute())


def test_zarr_write_null_and_dtype_edges(spark):
    """Round-9 review catches: NULL cells in int/bool arrays refuse
    loudly (an int store would corrupt them to INT64_MIN / False);
    float32 and narrow-int value columns write valid stores instead of
    KeyError; unknown types refuse with a named error."""
    x = np.array([1.0, np.nan, -2.0, 3.0])
    xi = from_numpy(spark, x).astype("long")  # NaN -> NULL bigint
    with pytest.raises(Exception, match="NULL cells"):
        to_zarr(xi, _mkdir(), chunks=(4,))
    # (a comparison like `> 0` yields False for NaN per NumPy
    # semantics -- a NULL boolean needs an explicit cast)
    xb = from_numpy(spark, x).astype("boolean")
    with pytest.raises(Exception, match="NULL cells"):
        to_zarr(xb, _mkdir(), chunks=(4,))

    # float32 value column -> <f4 store, round-trips (values are
    # f4-exact by construction)
    xf = np.array([1.5, -2.25, 8.0, 0.125])
    af = from_numpy(spark, xf).astype("float")
    for fmt in (2, 3):
        uf = _mkdir()
        to_zarr(af, uf, chunks=(3,), zarr_format=fmt)
        assert_eq(from_zarr(spark, uf), xf)
    # narrow int -> int64 store (lossless widening)
    ai = from_numpy(spark, np.array([1, -2, 3, 4])).astype("int")
    ui = _mkdir()
    to_zarr(ai, ui, chunks=(2,))
    bi = from_zarr(spark, ui)
    assert dict(bi.df.dtypes)["v"] == "bigint"
    assert_eq(bi, np.array([1, -2, 3, 4], dtype="int64"))

    # malformed transpose order refuses at metadata time
    u = _mkdir()
    _hand_zarr3(np.arange(9.0).reshape(3, 3), u, (3, 3))
    with open(os.path.join(u, "zarr.json")) as f:
        meta = json.load(f)
    meta["codecs"] = [{"name": "transpose",
                       "configuration": {"order": [1, 1]}}] + meta["codecs"]
    with open(os.path.join(u, "zarr.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="permutation"):
        from_zarr(spark, u)


def test_zarr_v2_filters_delta_shuffle(spark):
    """v2 numcodecs filters (round 9): delta (with astype) and shuffle
    decode; combined delta->shuffle chains apply in reverse; unknown
    filter ids refuse at metadata time.  Stores are hand-encoded with
    independent NumPy code."""
    # delta over int64, stored as int32
    xi = np.array([100, 103, 101, 140, 141, 90], dtype="<i8")
    enc = np.empty(6, dtype="<i4")
    enc[0] = xi[0]
    enc[1:] = np.diff(xi)
    u = _mkdir()
    _hand_zarr(
        u,
        {"zarr_format": 2, "shape": [6], "chunks": [6], "dtype": "<i8",
         "compressor": None, "fill_value": 0, "order": "C",
         "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}]},
        {"0": enc.tobytes()},
    )
    a = from_zarr(spark, u)
    assert dict(a.df.dtypes)["v"] == "bigint"
    assert_eq(a, xi.astype("int64"))

    # shuffle over float64 under zlib
    xf = np.array([1.5, -2.25, 8.0, 0.125], dtype="<f8")
    sh = xf.view("u1").reshape(4, 8).T.tobytes()  # byte-shuffled
    u2 = _mkdir()
    _hand_zarr(
        u2,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
         "compressor": {"id": "zlib", "level": 5}, "fill_value": None,
         "order": "C",
         "filters": [{"id": "shuffle", "elementsize": 8}]},
        {"0": zlib.compress(sh, 5)},
    )
    assert_eq(from_zarr(spark, u2), xf)

    # combined: delta THEN shuffle (decode order: unshuffle, undelta)
    enc2 = np.empty(6, dtype="<i8")
    enc2[0] = xi[0]
    enc2[1:] = np.diff(xi)
    sh2 = enc2.view("u1").reshape(6, 8).T.tobytes()
    u3 = _mkdir()
    _hand_zarr(
        u3,
        {"zarr_format": 2, "shape": [6], "chunks": [6], "dtype": "<i8",
         "compressor": None, "fill_value": 0, "order": "C",
         "filters": [{"id": "delta", "dtype": "<i8"},
                     {"id": "shuffle", "elementsize": 8}]},
        {"0": sh2},
    )
    assert_eq(from_zarr(spark, u3), xi.astype("int64"))

    # unknown filter -> loud metadata-time refusal
    u4 = _mkdir()
    _hand_zarr(
        u4,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
         "compressor": None, "fill_value": None, "order": "C",
         "filters": [{"id": "quantize", "digits": 3}]},
        {"0": xf.tobytes()},
    )
    with pytest.raises(NotImplementedError, match="quantize"):
        from_zarr(spark, u4)


# ------------------------------------------------- complex dtype IO
# Round-10 parity sliver (VERDICT r9 "What's missing #1"): the
# reference's readers are numpy-dtype-generic, so complex64/128
# zarr/npy stores ingest transparently (reference
# dask_array/__init__.py:251-252, io/_zarr.py).  Here complex chunks
# decode into the compute tier's STRUCT<re,im> cell encoding
# (operators/complexes.py); NaN COMPONENTS ride along verbatim
# (complex cells carry IEEE NaN in their fields -- the NULL-cell
# encoding is a float-tier contract, struct cells never feed the
# count(*)-based reductions).


def _cdata(seed: int, shape, nan: bool) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        "complex128"
    )
    if nan and x.size:
        flat = x.reshape(-1)
        flat[int(rng.integers(0, x.size))] = complex(np.nan, 1.5)
        flat[int(rng.integers(0, x.size))] = complex(-0.5, np.nan)
    return x


def _assert_complex_eq(arr, x: np.ndarray) -> None:
    got = arr.compute()
    assert got.shape == x.shape
    assert got.dtype.kind == "c"
    np.testing.assert_allclose(got.real, x.real, rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(got.imag, x.imag, rtol=1e-9, equal_nan=True)


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    chunk_seed=st.integers(0, 2**31),
    comp=st.sampled_from([None, "zlib"]),
    fmt=st.sampled_from([2, 3]),
    nan=st.booleans(),
)
def test_fuzz_complex_zarr_roundtrip(spark, shape, seed, chunk_seed, comp, fmt, nan):
    shape = tuple(shape)
    rng = np.random.default_rng(chunk_seed)
    chunks = tuple(int(rng.integers(1, s + 2)) for s in shape)
    x = _cdata(seed, shape, nan)
    url = _mkdir()
    to_zarr(from_numpy(spark, x), url, chunks=chunks, compressor=comp, zarr_format=fmt)
    back = from_zarr(spark, url)
    assert dict(back.df.dtypes)["v"].replace(" ", "") == "struct<re:double,im:double>"
    _assert_complex_eq(back, x)


def test_complex_zarr_v3_sharded_roundtrip(spark):
    x = _cdata(7, (6, 5), nan=True)
    url = _mkdir()
    to_zarr(from_numpy(spark, x), url, chunks=(2, 2), zarr_format=3, shards=(4, 4))
    _assert_complex_eq(from_zarr(spark, url), x)


@settings(max_examples=4, deadline=None)
@given(
    shape=SHAPE_12,
    seed=st.integers(0, 2**31),
    files=st.integers(1, 5),
    nan=st.booleans(),
)
def test_fuzz_complex_npy_stack_roundtrip(spark, shape, seed, files, nan):
    shape = tuple(shape)
    x = _cdata(seed, shape, nan)
    d = _mkdir()
    to_npy_stack(from_numpy(spark, x), d, files=files)
    _assert_complex_eq(from_npy_stack(spark, d), x)


def test_complex_zarr_external_store(spark):
    """A complex v2 store as an external tool (zarr-python) writes it:
    raw <c16 chunk bytes, complex fill_value as a [re, im] JSON array
    (the v3 spec shape, which zarr-python also emits in v2 metadata),
    and a missing chunk that must materialize at that fill."""
    x = np.array([1 + 2j, 3 - 4j, -5 + 0.5j, 0j], dtype="<c16")
    url = _mkdir()
    _hand_zarr(
        url,
        {"zarr_format": 2, "shape": [8], "chunks": [4], "dtype": "<c16",
         "compressor": None, "fill_value": [2.5, -1.0], "filters": None,
         "order": "C"},
        {"0": x.tobytes()},  # chunk 1 missing -> fill
    )
    a = from_zarr(spark, url)
    exp = np.concatenate([x.astype("complex128"), np.full(4, 2.5 - 1j)])
    _assert_complex_eq(a, exp)

    # complex64 narrows losslessly into the double-field struct
    x32 = np.array([1.5 + 0.25j, -2 + 1j], dtype="<c8")
    url32 = _mkdir()
    _hand_zarr(
        url32,
        {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<c8",
         "compressor": None, "fill_value": None, "filters": None,
         "order": "C"},
        {"0": x32.tobytes()},
    )
    _assert_complex_eq(from_zarr(spark, url32), x32.astype("complex128"))

    # v3 complex store with a ["NaN", "NaN"] fill (spec special-float
    # string encoding inside the [re, im] array)
    url3 = _mkdir()
    os.makedirs(os.path.join(url3, "c"), exist_ok=True)
    with open(os.path.join(url3, "zarr.json"), "w") as f:
        json.dump({
            "zarr_format": 3, "node_type": "array", "shape": [4],
            "data_type": "complex128",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [2]}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration": {"separator": "/"}},
            "fill_value": ["NaN", "NaN"],
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
        }, f)
    first = np.array([9 + 1j, -2j], dtype="<c16")
    with open(os.path.join(url3, "c", "0"), "wb") as f:
        f.write(first.tobytes())
    b = from_zarr(spark, url3)
    exp3 = np.concatenate([
        first.astype("complex128"), np.full(2, complex(np.nan, np.nan))
    ])
    _assert_complex_eq(b, exp3)


def test_complex_io_feeds_complex_ops(spark):
    """The ingested STRUCT<re,im> cells ARE the compute tier's complex
    encoding: chain from_zarr into the complex ufuncs and pin against
    NumPy (the complex IO leg of the fft/complex suite coverage)."""
    from dask_array_spark.operators import complexes as C

    x = _cdata(11, (4, 3), nan=False)
    url = _mkdir()
    to_zarr(from_numpy(spark, x), url, chunks=(3, 2), zarr_format=3)
    a = from_zarr(spark, url)
    np.testing.assert_allclose(C.cabs(a).compute(), np.abs(x), rtol=1e-9)
    np.testing.assert_allclose(C.angle(a).compute(), np.angle(x), rtol=1e-9)
    _assert_complex_eq(C.conj(a), np.conj(x))
    np.testing.assert_allclose(C.real(a).compute(), x.real, rtol=1e-9)
    np.testing.assert_allclose(C.imag(a).compute(), x.imag, rtol=1e-9)


def test_v2_uint64_store_reads_exact(spark):
    """uint64 v2 stores read since round 11 (decimal(20,0) cells;
    the full tier contract lives in test_uint64.py).  An external
    <u8 store carrying values int64 would wrap and float64 would
    shred must arrive bit-exact."""
    vals = np.array([1, 2**53 + 1, 2**63 + 17, 2**64 - 1], dtype="<u8")
    url = _mkdir()
    _hand_zarr(
        url,
        {"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<u8",
         "compressor": None, "fill_value": 0, "filters": None,
         "order": "C"},
        {"0": vals.tobytes()},
    )
    a = from_zarr(spark, url)
    assert dict(a.df.dtypes)["v"].replace(" ", "") == "decimal(20,0)"
    np.testing.assert_array_equal(a.compute(), vals)


@settings(max_examples=4, deadline=None)
@given(shape=SHAPE_13, seed=st.integers(0, 2**31), nan=st.booleans())
def test_fuzz_complex_hdf5_roundtrip(spark, shape, seed, nan):
    """Complex HDF5 (round 10): the writer emits the h5py compound
    {r,i} convention at 16 bytes/cell, the spec-native reader maps it
    back to STRUCT<re,im> cells."""
    shape = tuple(shape)
    x = _cdata(seed, shape, nan)
    path = _mkdir() + ".h5"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    to_hdf5(from_numpy(spark, x), path, "/g/cx")
    _assert_complex_eq(from_hdf5(spark, path, "/g/cx"), x)


def test_hdf5_generic_compound_refused():
    """Only the two-float complex compound maps to the cells model;
    any other compound (wrong names, 3 members, int members at odd
    offsets) refuses loudly instead of mis-decoding."""
    import struct

    from dask_array_spark.sources.hdf5 import _Reader, _dt_c16_message, _dt_f8_message

    r = _Reader.__new__(_Reader)  # _parse_datatype touches no state

    # the writer's own message parses to complex128
    assert r._parse_datatype(_dt_c16_message()) == np.dtype("<c16")

    def member(name, off):
        nm = name.encode() + b"\x00"
        nm += b"\x00" * ((-len(nm)) % 8)
        return nm + struct.pack("<I", off) + b"\x00" * 28 + _dt_f8_message()

    # wrong member names -> refusal naming the members
    bad = struct.pack("<BBBBI", 0x16, 0x02, 0x00, 0x00, 16) + member(
        "x", 0
    ) + member("y", 8)
    with pytest.raises(NotImplementedError, match="complex"):
        r._parse_datatype(bad)

    # three members -> refusal
    bad3 = struct.pack("<BBBBI", 0x16, 0x03, 0x00, 0x00, 24) + member(
        "r", 0
    ) + member("i", 8) + member("j", 16)
    with pytest.raises(NotImplementedError, match="complex"):
        r._parse_datatype(bad3)
