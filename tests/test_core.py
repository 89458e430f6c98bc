"""Core Array: elemwise, broadcasting, reductions vs NumPy oracle
(test strategy mirrors the reference: small arrays, assert_eq against
the in-core oracle -- /root/reference/AGENTS.md:78-87)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def x2(spark, rng):
    from dask_array_spark import from_numpy

    a = np.arange(30, dtype="float64").reshape(5, 6)
    return from_numpy(spark, a), a


@pytest.fixture(scope="module")
def x1(spark):
    from dask_array_spark import from_numpy

    a = np.arange(10, dtype="float64") + 0.25
    return from_numpy(spark, a), a


def test_roundtrip(x2):
    arr, a = x2
    assert_eq(arr, a)


def test_elemwise_fused(x2):
    arr, a = x2
    assert_eq(arr * 2 + arr / 3 - 1, a * 2 + a / 3 - 1)


def test_elemwise_scalar_reflected(x1):
    arr, a = x1
    assert_eq(10 - arr, 10 - a)
    assert_eq(2 / (arr + 1), 2 / (a + 1))


def test_binary_join_same_shape(spark, x2):
    from dask_array_spark import from_numpy

    arr, a = x2
    b = np.arange(30, dtype="float64").reshape(5, 6) * 2 + 1
    brr = from_numpy(spark, b)
    assert_eq(arr + brr, a + b)
    assert_eq(arr * brr - arr, a * b - a)


def test_broadcast_vector(spark, x2):
    from dask_array_spark import from_numpy

    arr, a = x2
    v = np.arange(6, dtype="float64") + 0.5
    vr = from_numpy(spark, v)
    assert_eq(arr + vr, a + v)


def test_broadcast_outer(spark):
    from dask_array_spark import from_numpy

    a = np.arange(5, dtype="float64").reshape(5, 1)
    b = np.arange(6, dtype="float64").reshape(1, 6) * 3
    assert_eq(from_numpy(spark, a) + from_numpy(spark, b), a + b)


def test_transpose_add(x2):
    arr, a = x2
    t = arr.T
    assert_eq(t, a.T)
    # x + x.T requires a real self-join on swapped indices
    sq_a = a[:5, :5]
    from dask_array_spark.operators import slicing

    sq = arr[:, :5]
    assert_eq(sq + sq.T, sq_a + sq_a.T)


def test_reductions_full(x2):
    arr, a = x2
    assert_eq(arr.sum(), a.sum())
    assert_eq(arr.mean(), a.mean())
    assert_eq(arr.min(), a.min())
    assert_eq(arr.max(), a.max())
    assert_eq(arr.var(), a.var())
    assert_eq(arr.std(), a.std())


def test_reductions_axis(x2):
    arr, a = x2
    assert_eq(arr.sum(axis=0), a.sum(axis=0))
    assert_eq(arr.sum(axis=1), a.sum(axis=1))
    assert_eq(arr.mean(axis=1), a.mean(axis=1))
    assert_eq(arr.max(axis=0), a.max(axis=0))
    assert_eq(arr.var(axis=1), a.var(axis=1))


def test_nan_semantics(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = np.arange(12, dtype="float64").reshape(3, 4)
    a[1, 2] = np.nan
    arr = from_numpy(spark, a)
    assert_eq(R.sum(arr, axis=1), a.sum(axis=1))  # row 1 -> NaN
    assert_eq(R.nansum(arr, axis=1), np.nansum(a, axis=1))
    assert_eq(R.nanmean(arr, axis=1), np.nanmean(a, axis=1))
    assert_eq(R.amax(arr, axis=1), a.max(axis=1))
    assert_eq(R.nanmax(arr, axis=1), np.nanmax(a, axis=1))


def test_prod(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = np.array([[1.0, -2.0, 3.0], [0.0, 4.0, -5.0]])
    arr = from_numpy(spark, a)
    assert_eq(R.prod(arr, axis=1), a.prod(axis=1), rtol=1e-9)
    assert_eq(R.prod(arr), a.prod())


def test_argminmax(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = np.array([[3.0, 1.0, 2.0], [1.0, 5.0, 5.0]])
    arr = from_numpy(spark, a)
    assert_eq(R.argmin(arr, axis=1), a.argmin(axis=1))
    assert_eq(R.argmax(arr, axis=1), a.argmax(axis=1))


def test_median_quantile(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = rng.random((4, 7))
    arr = from_numpy(spark, a)
    assert_eq(R.median(arr, axis=1), np.median(a, axis=1))
    assert_eq(R.quantile(arr, 0.25, axis=1), np.quantile(a, 0.25, axis=1))


def test_comparisons_where(spark, x2):
    from dask_array_spark.operators import elemwise as E

    arr, a = x2
    m = arr > 10
    assert_eq(m, a > 10)
    assert_eq(E.where(m, arr, -1.0), np.where(a > 10, a, -1.0))


def test_ufuncs(spark, x1):
    from dask_array_spark.operators import elemwise as E

    arr, a = x1
    assert_eq(E.sqrt(arr), np.sqrt(a))
    assert_eq(E.exp(arr * 0.1), np.exp(a * 0.1), rtol=1e-12)
    assert_eq(E.log(arr + 1), np.log(a + 1), rtol=1e-12)
    assert_eq(E.sin(arr), np.sin(a), rtol=1e-12)
    assert_eq(E.floor(arr), np.floor(a))
    assert_eq(E.sign(arr - 5), np.sign(a - 5))


def test_compute_shape_resolves_unknown(spark, x1):
    from dask_array_spark.core.array import Array

    arr, a = x1
    masked = arr[arr > 3.0]  # unknown length
    assert masked.shape == (None,)
    resolved = masked.compute_shape()
    # flat index preserved -> size = max index + 1 (gaps allowed)
    assert resolved.shape[0] == 10
    assert resolved.count_rows() == (a > 3.0).sum()


def test_pprint_smoke(capsys, x1):
    arr, _ = x1
    arr.pprint()
    out = capsys.readouterr().out
    assert "Array<shape=(10,)" in out


def test_pad_modes_match_numpy(spark):
    """edge/reflect/symmetric/wrap/mean/minimum/maximum pad modes match
    np.pad (reference creation/_pad.py:227; its tests/test_creation.py
    pad cases are the spec)."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import manipulation as M

    vec = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0])
    a1 = from_numpy(spark, vec)
    for mode in ("edge", "reflect", "symmetric", "wrap", "mean", "minimum", "maximum"):
        got = M.pad(a1, [(3, 2)], mode=mode).compute()
        want = np.pad(vec, (3, 2), mode=mode)
        assert np.allclose(got, want), mode

    mat = np.arange(12.0).reshape(3, 4) + 1.0
    a2 = from_numpy(spark, mat)
    for mode in ("edge", "reflect", "wrap", "mean"):
        got = M.pad(a2, [(1, 2), (2, 1)], mode=mode).compute()
        want = np.pad(mat, ((1, 2), (2, 1)), mode=mode)
        assert np.allclose(got, want), mode

    got = M.pad(a1, [(2, 2)], mode="constant", constant_values=7.0).compute()
    assert np.allclose(got, np.pad(vec, (2, 2), constant_values=7.0))


def test_sliding_window_view_matches_numpy(spark):
    """materialized sliding windows (reference _overlap.py:457):
    out[j, w] = x[j + w], zero-shuffle index explode."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import manipulation as M

    v = np.arange(10.0) * 1.5
    a = from_numpy(spark, v)
    out = M.sliding_window_view(a, 4)
    want = np.lib.stride_tricks.sliding_window_view(v, 4)
    assert out.shape == want.shape
    assert np.allclose(out.compute(), want)
    # plan: no exchange (pure generate+project)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_indices_meshgrid_nd(spark):
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import creation

    got = creation.indices_nd(spark, (3, 4))
    want = np.indices((3, 4))
    for k in range(2):
        assert np.allclose(got[k].compute(), want[k])

    x = np.array([1.0, 2.0, 3.0])
    y = np.array([10.0, 20.0])
    ax, ay = from_numpy(spark, x), from_numpy(spark, y)
    for indexing in ("xy", "ij"):
        got = creation.meshgrid(ax, ay, indexing=indexing)
        want = np.meshgrid(x, y, indexing=indexing)
        for g, w in zip(got, want):
            assert g.shape == w.shape
            assert np.allclose(g.compute(), w), indexing


def test_reshape_blockwise_alias(spark):
    """reshape_blockwise (reference manipulation/_reshape.py:97) is the
    plain zero-movement reshape in cell form."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.manipulation import reshape_blockwise

    a = np.arange(24, dtype="float64").reshape(4, 6)
    got = reshape_blockwise(from_numpy(spark, a), (2, 3, 4)).compute()
    np.testing.assert_array_equal(got, a.reshape(2, 3, 4))
