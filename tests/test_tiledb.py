"""from_tiledb / to_tiledb (reference io/_tiledb.py:12,72).

The sandbox lacks the ``tiledb`` library, so these tests inject an
API-faithful FILE-BACKED fake through the functions' ``_tiledb``
parameter: the fake implements exactly the surface the reference's
integration touches (``open``/``empty_like``, ``schema.sparse`` /
``.nattr`` / ``.attr(i).name`` / ``.domain.dim(i).tile``, numpy-style
subarray get/set, ``iswritable``/``isopen``/``uri``) and persists each
``__setitem__`` as its own fragment file -- mirroring TileDB's
fragment-per-write model, which is what makes the engine's concurrent
per-tile executor writes safe.  Because the fake is file-backed, the
REAL distributed path runs end-to-end: grid fan-out, executor-side
open, tile reads/writes in separate worker processes.  Only the byte
format under the fake differs from the real library; every branch of
the engine code (validation, attribute selection, tile-grid mapping,
edge-tile trim, NaN absent-cell encoding) is the production path.
"""

import json
import os
import uuid

import numpy as np
import pytest

from dask_array_spark.sources import from_numpy, from_tiledb, to_tiledb

from tests.conftest import assert_eq


@pytest.fixture(autouse=True, scope="module")
def _ship_fake(spark):
    # cloudpickle serializes module-level classes by REFERENCE; ship
    # this file so executor workers can import the fake's classes
    spark.sparkContext.addPyFile(os.path.abspath(__file__))


# ---------------------------------------------------------------- fake
class FakeDim:
    def __init__(self, tile):
        self.tile = tile


class FakeAttr:
    def __init__(self, name):
        self.name = name


class FakeDomain:
    def __init__(self, tiles):
        self._tiles = list(tiles)

    def dim(self, i):
        return FakeDim(self._tiles[i])


class FakeSchema:
    def __init__(self, meta):
        self.sparse = bool(meta.get("sparse", False))
        self.ndim = len(meta["shape"])
        self.nattr = len(meta["attrs"])
        self.domain = FakeDomain(meta["tile"])
        self._attrs = list(meta["attrs"])

    def attr(self, i):
        return FakeAttr(self._attrs[i])


class FakeArray:
    """Dense float64 array persisted as __meta.json + one .npz fragment
    per write; reads overlay fragments (later files win, but engine
    writes are disjoint tiles so order is immaterial)."""

    def __init__(self, uri, mode="r", attr=None, key=None):
        self.uri = uri
        self.mode = mode
        with open(os.path.join(uri, "__meta.json")) as f:
            self._meta = json.load(f)
        self.schema = FakeSchema(self._meta)
        self.shape = tuple(self._meta["shape"])
        self.dtype = np.dtype(self._meta["dtype"])
        self.ndim = len(self.shape)
        self.isopen = True
        attrs = self._meta["attrs"]
        self._attr = attr if attr is not None else attrs[0]
        if self._attr not in attrs:
            raise KeyError(f"no attribute {self._attr!r} in {attrs}")

    @property
    def iswritable(self):
        return self.mode == "w"

    def _frags(self):
        return sorted(
            f
            for f in os.listdir(self.uri)
            if f.startswith("frag_") and f.endswith(f"_{self._attr}.npz")
        )

    def __getitem__(self, idx):
        # dtype-appropriate fill for unwritten cells: NaN for floats
        # (TileDB's default float fill), 0 for int/bool (real TileDB
        # uses dtype-specific defaults; the plumbing under test only
        # needs SOME fill for non-float kinds)
        dt = np.dtype(self._meta["dtype"])
        fill = np.nan if dt.kind == "f" else 0
        base = np.full(self.shape, fill, dtype=dt)
        for f in self._frags():
            z = np.load(os.path.join(self.uri, f))
            starts, block = z["starts"], z["block"]
            sl = tuple(
                slice(int(s), int(s) + n) for s, n in zip(starts, block.shape)
            )
            base[sl] = block
        return base[idx]

    def __setitem__(self, idx, val):
        if not self.iswritable:
            raise PermissionError("array opened read-only")
        if not isinstance(idx, tuple):
            idx = (idx,)
        starts = np.array([s.start or 0 for s in idx], dtype="int64")
        block = np.asarray(val, dtype=self._meta["dtype"])
        np.savez(
            os.path.join(
                self.uri, f"frag_{uuid.uuid4().hex}_{self._attr}.npz"
            ),
            starts=starts,
            block=block,
        )

    def close(self):
        self.isopen = False


def fake_open(uri, mode="r", attr=None, config=None, key=None):
    return FakeArray(uri, mode=mode, attr=attr, key=key)


def fake_empty_like(uri, arr, tile=None, config=None, key=None, attrs=None):
    os.makedirs(uri, exist_ok=True)
    meta = {
        "shape": [int(s) for s in arr.shape],
        "dtype": str(np.dtype(arr.dtype)),
        "tile": [int(t) for t in (tile or arr.shape)],
        "attrs": list(attrs) if attrs else ["v"],
        "sparse": False,
    }
    with open(os.path.join(uri, "__meta.json"), "w") as f:
        json.dump(meta, f)
    return FakeArray(uri, mode="w")


class _FakeModule:
    """Namespace standing in for the imported ``tiledb`` module; plain
    class (not SimpleNamespace) so cloudpickle ships it by value inside
    the executor closures."""

    open = staticmethod(fake_open)
    empty_like = staticmethod(fake_empty_like)
    Array = FakeArray


FAKE = _FakeModule()


def _mkarray(tmp, data, tile, attrs=("v",)):
    uri = os.path.join(tmp, f"tdb_{uuid.uuid4().hex}")
    a = fake_empty_like(uri, data, tile=tile, attrs=list(attrs))
    for name in attrs:
        a._attr = name
        a[tuple(slice(0, s) for s in data.shape)] = data
    return uri


# --------------------------------------------------------------- tests
def test_roundtrip_1d(spark, tmp_path):
    x = np.arange(23, dtype="float64") * 1.5 - 7
    uri = os.path.join(str(tmp_path), "rt1d")
    to_tiledb(from_numpy(spark, x), uri, tile=(5,), _tiledb=FAKE)
    out = from_tiledb(spark, uri, _tiledb=FAKE)
    assert out.shape == (23,)
    assert_eq(out, x)
    # one fragment per tile: ceil(23/5) = 5 concurrent executor writes
    frags = [f for f in os.listdir(uri) if f.startswith("frag_")]
    assert len(frags) == 5


def test_roundtrip_2d_edge_tiles(spark, tmp_path):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(13, 9))
    uri = os.path.join(str(tmp_path), "rt2d")
    to_tiledb(from_numpy(spark, x), uri, tile=(4, 4), _tiledb=FAKE)
    out = from_tiledb(spark, uri, _tiledb=FAKE)
    assert out.shape == (13, 9)
    assert_eq(out, x)
    # default chunks come from the schema's tile extents
    frags = [f for f in os.listdir(uri) if f.startswith("frag_")]
    assert len(frags) == 4 * 3  # ceil(13/4) * ceil(9/4)


def test_default_tile_is_cell_bounded(spark, tmp_path):
    """With tile=None the default bounds each tile at ~1e6 cells
    (per-axis 1e6^(1/ndim), same policy as to_zarr) instead of
    splitting axis 0 proportionally -- a shape-proportional default
    would densify O(array/32) per task at scale."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2100, 2))
    uri = os.path.join(str(tmp_path), "deftile")
    to_tiledb(from_numpy(spark, x), uri, _tiledb=FAKE)
    frags = [f for f in os.listdir(uri) if f.startswith("frag_")]
    assert len(frags) == 3  # ceil(2100/1000) x ceil(2/1000)
    assert_eq(from_tiledb(spark, uri, _tiledb=FAKE), x)


def test_chunks_override(spark, tmp_path):
    x = np.arange(40, dtype="float64")
    uri = _mkarray(str(tmp_path), x, tile=(10,))
    out = from_tiledb(spark, uri, chunks=(7,), _tiledb=FAKE)
    assert_eq(out, x)
    with pytest.raises(ValueError, match="dimensionality"):
        from_tiledb(spark, uri, chunks=(7, 7), _tiledb=FAKE)


def test_nan_cells_roundtrip(spark, tmp_path):
    x = np.arange(12, dtype="float64")
    x[3] = np.nan
    x[8] = np.nan
    uri = os.path.join(str(tmp_path), "nan")
    to_tiledb(from_numpy(spark, x), uri, tile=(4,), _tiledb=FAKE)
    got = from_tiledb(spark, uri, _tiledb=FAKE).compute()
    np.testing.assert_allclose(got, x, equal_nan=True)


def test_multi_attribute(spark, tmp_path):
    x = np.arange(8, dtype="float64")
    uri = _mkarray(str(tmp_path), x, tile=(4,), attrs=("a", "b"))
    # reference io/_tiledb.py:58 -- multi-attribute needs a selection
    with pytest.raises(TypeError, match="multi-attribute"):
        from_tiledb(spark, uri, _tiledb=FAKE)
    out = from_tiledb(spark, uri, attribute="b", _tiledb=FAKE)
    assert_eq(out, x)


def test_sparse_rejected(spark, tmp_path):
    uri = os.path.join(str(tmp_path), "sparse")
    os.makedirs(uri)
    with open(os.path.join(uri, "__meta.json"), "w") as f:
        json.dump(
            {"shape": [4], "dtype": "float64", "tile": [2], "attrs": ["v"],
             "sparse": True},
            f,
        )
    with pytest.raises(ValueError, match="[Ss]parse"):
        from_tiledb(spark, uri, _tiledb=FAKE)


def test_open_array_handles(spark, tmp_path):
    x = np.arange(10, dtype="float64")
    uri = _mkarray(str(tmp_path), x, tile=(5,))
    # reading through an already-open handle (reference accepts both)
    out = from_tiledb(spark, fake_open(uri), _tiledb=FAKE)
    assert_eq(out, x)
    # a writable handle must be rejected for reads (io/_tiledb.py:63)
    with pytest.raises(ValueError, match="open for reading"):
        from_tiledb(spark, fake_open(uri, mode="w"), _tiledb=FAKE)


def test_to_tiledb_existing_target(spark, tmp_path):
    x = np.arange(6, dtype="float64")
    uri = os.path.join(str(tmp_path), "tgt")
    tgt = fake_empty_like(uri, x, tile=[3])
    to_tiledb(from_numpy(spark, x), tgt, tile=(3,), _tiledb=FAKE)
    np.testing.assert_allclose(FakeArray(uri)[slice(0, 6)], x)
    # incompatible layout (reference io/_tiledb.py:152)
    bad = fake_empty_like(
        os.path.join(str(tmp_path), "bad"), np.zeros((2, 2)), tile=[2, 2]
    )
    with pytest.raises(ValueError, match="not compatible"):
        to_tiledb(from_numpy(spark, x), bad, _tiledb=FAKE)
    # closed / read-only target rejected (io/_tiledb.py:158)
    ro = fake_open(uri)  # mode 'r'
    with pytest.raises(ValueError, match="open and writable"):
        to_tiledb(from_numpy(spark, x), ro, _tiledb=FAKE)
    # neither a str nor an array
    with pytest.raises(ValueError, match="uri"):
        to_tiledb(from_numpy(spark, x), 42, _tiledb=FAKE)


def test_library_gate_without_injection(spark):
    """Without injection the functions require the real library and
    raise the documented NotImplementedError gate in this sandbox."""
    try:
        import tiledb  # noqa: F401

        pytest.skip("real tiledb present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="tiledb"):
        from_tiledb(spark, "/nonexistent")


def test_nan_propagates_through_reductions(spark, tmp_path):
    """NaN cells must arrive as NULL ROWS (from_numpy's encoding), not
    be dropped: an absent row is invisible to reductions' count(*) vs
    count(v) NaN propagation, so sum/mean over a NaN-bearing TileDB
    read would return a finite value where NumPy wants NaN (round-7
    ADVICE, ingest.py:920)."""
    from dask_array_spark.operators import reductions as R

    x = np.arange(12, dtype="float64")
    x[5] = np.nan
    uri = _mkarray(str(tmp_path), x, tile=(4,))
    a = from_tiledb(spark, uri, _tiledb=FAKE)
    assert a.df.count() == 12  # every cell present, NaN as NULL
    assert np.isnan(R.sum(a, axis=None).compute())
    assert np.isnan(R.mean(a, axis=None).compute())
    assert R.nansum(a, axis=None).compute() == np.nansum(x)


def test_int_and_bool_dtypes_preserved(spark, tmp_path):
    """int/bool TileDB attributes keep their dtype (long/boolean
    columns) instead of silently widening to double and routing
    through the NaN-based filtering (round-7 ADVICE, ingest.py:1053).
    Reference io/_tiledb.py preserves the array dtype."""
    xi = (np.arange(10) * 3 - 7).astype("int64")
    uri = _mkarray(str(tmp_path), xi, tile=(4,))
    ai = from_tiledb(spark, uri, _tiledb=FAKE)
    assert dict(ai.df.dtypes)["v"] == "bigint"
    assert_eq(ai, xi)

    xb = np.array([True, False, True, True, False])
    urib = _mkarray(str(tmp_path), xb, tile=(2,))
    ab = from_tiledb(spark, urib, _tiledb=FAKE)
    assert dict(ab.df.dtypes)["v"] == "boolean"
    got = ab.compute()
    np.testing.assert_array_equal(got.astype(bool), xb)


def test_zero_length_dim_returns_empty(spark, tmp_path):
    """A zero-length dimension yields an empty tile grid; the read
    must return an empty Array instead of raising on repartition(0)
    (round-7 ADVICE, ingest.py:1038)."""
    x = np.empty((0, 3), dtype="float64")
    uri = _mkarray(str(tmp_path), x, tile=(2, 2))
    a = from_tiledb(spark, uri, _tiledb=FAKE)
    assert a.shape == (0, 3)
    assert a.df.count() == 0


def test_uint64_u32_read_exact(spark, tmp_path):
    """u1/u2/u4 attributes read value-exact as long; uint64 reads as
    decimal(20,0) cells since round 11 (previously a loud refusal --
    Spark has no unsigned 64-bit type, so an int64 cast would WRAP
    values >= 2**63 negative; the full tier contract is pinned in
    test_uint64.py)."""
    x32 = np.array([0, 1, 2**31, 2**32 - 1], dtype="uint32")
    uri = _mkarray(str(tmp_path), x32, tile=(2,))
    a = from_tiledb(spark, uri, _tiledb=FAKE)
    assert dict(a.df.dtypes)["v"] == "bigint"
    got = a.compute()
    np.testing.assert_array_equal(got.astype("int64"), x32.astype("int64"))

    x64 = np.array([1, 2**53 + 1, 2**63 + 17, 2**64 - 1], dtype="uint64")
    uri64 = _mkarray(str(tmp_path), x64, tile=(2,))
    b = from_tiledb(spark, uri64, _tiledb=FAKE)
    assert dict(b.df.dtypes)["v"].replace(" ", "") == "decimal(20,0)"
    got64 = b.compute()
    assert got64.dtype == np.uint64
    np.testing.assert_array_equal(got64, x64)
