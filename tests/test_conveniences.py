"""NumPy-convenience aliases vs numpy (operators/conveniences.py) and
the standalone overlap/trim_overlap pair (operators/overlap.py)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def da():
    import dask_array_spark.api as da

    return da


def test_stacks(spark, rng, da):
    x, y = rng.normal(size=(3, 4)), rng.normal(size=(3, 4))
    ax, ay = da.from_numpy(spark, x), da.from_numpy(spark, y)
    assert_eq(da.vstack([ax, ay]), np.vstack([x, y]))
    assert_eq(da.hstack([ax, ay]), np.hstack([x, y]))
    assert_eq(da.dstack([ax, ay]), np.dstack([x, y]))
    u, v = rng.normal(size=5), rng.normal(size=3)
    au, av = da.from_numpy(spark, u), da.from_numpy(spark, v)
    assert_eq(da.hstack([au, av]), np.hstack([u, v]))
    assert_eq(da.vstack([au, au]), np.vstack([u, u]))


def test_flips_roll(spark, rng, da):
    x = rng.normal(size=(3, 4))
    ax = da.from_numpy(spark, x)
    assert_eq(da.flipud(ax), np.flipud(x))
    assert_eq(da.fliplr(ax), np.fliplr(x))
    with pytest.raises(ValueError):
        da.fliplr(da.from_numpy(spark, np.arange(3.0)))
    y = rng.normal(size=(2, 3, 4))
    ay = da.from_numpy(spark, y)
    for axis, start in [(2, 0), (0, 2), (1, 1), (2, 3)]:
        assert_eq(da.rollaxis(ay, axis, start), np.rollaxis(y, axis, start))


def test_like_creations(spark, rng, da):
    x = rng.normal(size=(3, 4))
    ax = da.from_numpy(spark, x)
    assert_eq(da.ones_like(ax), np.ones_like(x))
    assert_eq(da.zeros_like(ax), np.zeros_like(x))
    assert_eq(da.empty_like(ax), np.zeros_like(x))
    assert_eq(da.full_like(ax, 7.5), np.full_like(x, 7.5))
    # integer dtype is preserved
    ai = da.from_numpy(spark, np.arange(6).reshape(2, 3))
    out = da.ones_like(ai)
    assert out.dtype.simpleString() == ai.dtype.simpleString()


def test_asarray_predicates(spark, rng, da):
    x = rng.normal(size=4)
    ax = da.from_numpy(spark, x)
    assert da.asarray(ax) is ax
    assert da.asanyarray(ax) is ax
    assert_eq(da.asarray([1.0, 2.0], spark=spark), np.array([1.0, 2.0]))
    with pytest.raises(ValueError):
        da.asarray([1.0])
    assert not da.iscomplexobj(ax)
    z = da.make_complex(ax, ax)
    assert da.iscomplexobj(z)
    assert da.result_type(ax, ax) == np.float64
    ai = da.from_numpy(spark, np.arange(3))
    assert da.result_type(ai, 1.5) == np.float64
    assert da.result_type(z) == np.complex128


def test_allclose(spark, rng, da):
    x = rng.normal(size=10)
    ax = da.from_numpy(spark, x)
    ay = da.from_numpy(spark, x + 1e-12)
    az = da.from_numpy(spark, x + 1.0)
    assert bool(da.allclose(ax, ay).compute())
    assert not bool(da.allclose(ax, az).compute())


def test_flatnonzero_broadcast_arrays(spark, da):
    x = np.array([[0.0, 1.0, 0.0], [2.0, 0.0, 3.0]])
    ax = da.from_numpy(spark, x)
    got = sorted(r["v"] for r in da.flatnonzero(ax).df.collect())
    assert got == list(np.flatnonzero(x))
    r = np.arange(3.0)
    c = np.arange(2.0).reshape(2, 1)
    br, bc = da.broadcast_arrays(da.from_numpy(spark, r), da.from_numpy(spark, c))
    wr, wc = np.broadcast_arrays(r, c)
    assert_eq(br, wr)
    assert_eq(bc, wc)


def test_quantile_spellings(spark, rng, da):
    x = rng.normal(size=101)
    ax = da.from_numpy(spark, x)
    np.testing.assert_allclose(
        float(da.nanquantile(ax, 0.25).compute()),
        np.quantile(x, 0.25), atol=1e-9,
    )
    np.testing.assert_allclose(
        float(da.percentile(ax, 75).compute()),
        np.percentile(x, 75), atol=1e-9,
    )
    np.testing.assert_allclose(
        float(da.nanpercentile(ax, 75).compute()),
        np.percentile(x, 75), atol=1e-9,
    )


def test_overlap_trim_roundtrip(spark, rng, da):
    """overlap -> trim_overlap is the identity, for exact and ragged
    block divisions, 1-D and 2-D."""
    for shape, bs in [((12,), (4,)), ((10,), (4,)), ((6, 8), (3, 4))]:
        x = rng.normal(size=shape)
        ax = da.from_numpy(spark, x)
        h = da.overlap(ax, 1, bs)
        back = da.trim_overlap(h, 1, bs, shape=shape)
        assert_eq(back, x)


def test_overlap_halo_content(spark, da):
    """Block 1's left halo holds block 0's last cell; periodic wraps
    the array edge."""
    x = np.arange(8.0)
    ax = da.from_numpy(spark, x)
    h = da.overlap(ax, 1, (4,))  # spans of 6: [h 0 1 2 3 h][h 4 5 6 7 h]
    vals = {r["i0"]: r["v"] for r in h.df.collect()}
    assert vals[6] == 3.0   # left halo of block 1 = x[3]
    assert vals[5] == 4.0   # right halo of block 0 = x[4]
    assert 0 not in vals    # boundary "none": edge halos absent
    hp = da.overlap(ax, 1, (4,), boundary="periodic")
    pv = {r["i0"]: r["v"] for r in hp.df.collect()}
    assert pv[0] == 7.0     # wrapped left edge
    assert pv[11] == 0.0    # wrapped right edge


def test_overlap_map_blocks_trim_pipeline(spark, rng, da):
    """The classic decomposed pipeline -- overlap + map_blocks over
    haloed spans + trim -- matches the fused map_overlap."""
    x = rng.normal(size=16)
    ax = da.from_numpy(spark, x)

    def smooth3(v):
        # absent halo cells arrive as NaN in map_blocks; read them as
        # the constant-0 boundary
        v = np.nan_to_num(v)
        out = v.copy()
        out[1:-1] = (v[:-2] + v[1:-1] + v[2:]) / 3.0
        return out

    h = da.overlap(ax, 1, (4,))
    hs = da.map_blocks(smooth3, h, block_shape=(6,))
    got = da.trim_overlap(hs, 1, (4,))
    want = np.asarray(smooth3(np.pad(x, 1))[1:-1])
    # interior cells agree with the padded-numpy smooth; array-edge
    # cells see the "none"-boundary zeros, matching constant-0 pad
    np.testing.assert_allclose(got.compute(), want, atol=1e-9)
