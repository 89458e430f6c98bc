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


@settings(max_examples=5, deadline=None)
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


@settings(max_examples=5, deadline=None)
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


@settings(max_examples=5, deadline=None)
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


@settings(max_examples=5, deadline=None)
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
        {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<c16",
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
