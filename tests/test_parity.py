"""Namespace-parity tail vs NumPy (operators/parity.py, chunk.py,
random.py namespace, arg_reduction)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def da():
    import dask_array_spark.api as da

    return da


def test_tril_triu(spark, rng, da):
    x = rng.normal(size=(4, 5))
    ax = da.from_numpy(spark, x)
    for k in (-1, 0, 2):
        assert_eq(da.tril(ax, k), np.tril(x, k))
        assert_eq(da.triu(ax, k), np.triu(x, k))
    with pytest.raises(ValueError):
        da.tril(da.from_numpy(spark, np.arange(3.0)))


def test_diag_both_directions(spark, rng, da):
    x = rng.normal(size=(4, 4))
    ax = da.from_numpy(spark, x)
    for k in (-1, 0, 1):
        assert_eq(da.diag(ax, k), np.diag(x, k))
    v = rng.normal(size=3)
    for k in (0, 1, -2):
        got = da.diag(da.from_numpy(spark, v), k).compute()
        exp = np.diag(v, k)
        # sparse construction: implicit cells are NaN, values must match
        mask = ~np.isnan(got)
        assert got.shape == exp.shape
        assert np.allclose(got[mask], exp[mask])
        assert np.allclose(np.nan_to_num(got), exp)


def test_rot90_all_k(spark, rng, da):
    x = rng.normal(size=(3, 4))
    ax = da.from_numpy(spark, x)
    for k in range(5):
        assert_eq(da.rot90(ax, k), np.rot90(x, k))
    y = rng.normal(size=(2, 3, 4))
    ay = da.from_numpy(spark, y)
    assert_eq(da.rot90(ay, 1, axes=(1, 2)), np.rot90(y, 1, axes=(1, 2)))


def test_around_and_scalars(spark, rng, da):
    x = np.array([1.2345, 2.5, 3.5, -2.5])
    ax = da.from_numpy(spark, x)
    assert_eq(da.around(ax, 2), np.around(x, 2))
    # half-to-even at 0 decimals, like numpy
    assert_eq(da.round(ax), np.round(x))
    assert da.shape(ax) == (4,)
    assert da.ndim(ax) == 1
    y = rng.normal(size=(2, 3))
    assert_eq(da.ravel(da.from_numpy(spark, y)), y.ravel())


def test_block_nested(spark, rng, da):
    a = rng.normal(size=(2, 2))
    b = rng.normal(size=(2, 3))
    c = rng.normal(size=(1, 2))
    d = rng.normal(size=(1, 3))
    A, B, C, D = (da.from_numpy(spark, m) for m in (a, b, c, d))
    assert_eq(da.block([[A, B], [C, D]]), np.block([[a, b], [c, d]]))
    u, v = rng.normal(size=3), rng.normal(size=2)
    assert_eq(da.block([da.from_numpy(spark, u), da.from_numpy(spark, v)]),
              np.block([u, v]))


def test_shuffle_reference_example(spark, da):
    """The worked example from the reference's shuffle docstring
    (_shuffle.py:54): values follow the flattened group order."""
    arr = np.array([[1, 2, 3, 4, 5, 6, 7, 8],
                    [9, 10, 11, 12, 13, 14, 15, 16]], dtype="float64")
    x = da.from_numpy(spark, arr)
    y = da.shuffle(x, [[6, 5, 2], [4, 1], [3, 0, 7]], axis=1)
    exp = np.array([[7, 6, 3, 5, 2, 4, 1, 8],
                    [15, 14, 11, 13, 10, 12, 9, 16]], dtype="float64")
    assert np.allclose(y.compute(), exp)
    with pytest.raises(ValueError, match="duplicate"):
        da.shuffle(x, [[0, 1], [1, 2]], axis=1)


def test_blockwise_aligned_and_contraction_gate(spark, rng, da):
    x, y = rng.normal(size=6), rng.normal(size=6)
    ax, ay = da.from_numpy(spark, x), da.from_numpy(spark, y)
    got = da.blockwise(lambda u, v: u * v + 1.0, "i", ax, "i", ay, "i")
    assert np.allclose(got.compute(), x * y + 1.0)
    with pytest.raises(NotImplementedError, match="einsum"):
        da.blockwise(lambda u, v: u @ v, "ik", ax, "ij", ay, "jk")


def test_apply_over_axes(spark, rng, da):
    x = rng.normal(size=(2, 3, 4))
    ax = da.from_numpy(spark, x)
    got = da.apply_over_axes(da.sum, ax, [0, 2])
    assert_eq(got, np.apply_over_axes(np.sum, x, [0, 2]))


def test_empty_array_compute(spark, rng, da):
    e = da.empty(spark, (2, 3))
    assert np.allclose(e.compute(), np.zeros((2, 3)))
    x = rng.normal(size=4)
    assert np.allclose(da.array(x, spark=spark).compute(), x)
    a, b = da.from_numpy(spark, x), da.from_numpy(spark, x * 2)
    ca, cb = da.compute(a, b)
    assert np.allclose(ca, x) and np.allclose(cb, x * 2)


def test_nancumprod(spark, da):
    x = np.array([1.0, 2.0, np.nan, 3.0])
    ax = da.from_numpy(spark, x)
    assert_eq(da.nancumprod(ax), np.nancumprod(x))


def test_chunk_bookkeeping(da):
    assert da.normalize_chunks(3, shape=(7,)) == ((3, 3, 1),)
    assert da.normalize_chunks((-1,), shape=(5,)) == ((5,),)
    assert da.normalize_chunks(((2, 3),), shape=(5,)) == ((2, 3),)
    with pytest.raises(ValueError):
        da.normalize_chunks(((2, 2),), shape=(5,))
    ch = da.aligned_coarsen_chunks((5, 4, 3), 4)
    assert sum(ch) == 12 and all(c % 4 == 0 for c in ch[:-1])
    # no-op parity surface
    _, arrs = da.unify_chunks()
    assert arrs == []
    da.register_chunk_type(np.ndarray)
    assert issubclass(da.PerformanceWarning, Warning)


def test_rechunk_preserves_values(spark, rng, da):
    x = rng.normal(size=100)
    ax = da.from_numpy(spark, x)
    assert np.allclose(da.rechunk(ax, 25).compute(), x)
    assert da.rechunk(ax).shape == ax.shape


def test_random_namespace(spark, da):
    from dask_array_spark import random as dr

    u = dr.uniform(spark, 2000, low=2.0, high=4.0, seed=7).compute()
    assert u.shape == (2000,) and 2.0 <= u.min() and u.max() <= 4.0
    n1 = dr.normal(spark, 500, loc=1.0, seed=11).compute()
    n2 = dr.normal(spark, 500, loc=1.0, seed=11).compute()
    assert np.allclose(n1, n2)  # seeded determinism
    p = dr.permutation(spark, 50).compute()
    assert sorted(p.astype(int).tolist()) == list(range(50))
    i = dr.randint(spark, 300, 5, 9, seed=3).compute()
    assert set(np.unique(i.astype(int))) <= {5, 6, 7, 8}


def test_arg_reduction_generic(spark, rng, da):
    """Custom arg-reduction: position of the value closest to zero --
    not expressible with argmin/argmax over raw values."""
    x = rng.normal(size=(4, 30))
    ax = da.from_numpy(spark, x)

    def chunk(vals, idxs):
        j = int(np.argmin(np.abs(vals)))
        return (abs(float(vals[j])), int(idxs[j]))

    def combine(s, t):
        # ties break toward the smaller index, numpy-first-occurrence
        if (t[0], t[1]) < (s[0], s[1]):
            return t
        return s

    got = da.arg_reduction(ax, chunk, combine, lambda s: s[1], axis=1).compute()
    exp = np.argmin(np.abs(x), axis=1)
    assert np.allclose(got, exp)
    # global (flattened) form
    g = da.arg_reduction(ax, chunk, combine, lambda s: s[1], axis=None).compute()
    assert int(g) == int(np.argmin(np.abs(x.ravel())))
