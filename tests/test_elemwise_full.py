"""Extended ufunc table + complex ops vs the NumPy oracle (reference
_ufunc.py:18-141,396-485)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def xs(spark):
    from dask_array_spark import from_numpy

    a = np.array([-2.5, -1.0, -0.25, 0.0, 0.25, 1.0, 2.5, 3.75])
    return from_numpy(spark, a), a


@pytest.fixture(scope="module")
def pos(spark):
    from dask_array_spark import from_numpy

    a = np.array([0.25, 0.5, 1.0, 2.0, 4.0, 7.5])
    return from_numpy(spark, a), a


def test_unary_table(xs, pos):
    from dask_array_spark.operators import elemwise as E

    arr, a = xs
    parr, p = pos
    assert_eq(E.exp2(arr), np.exp2(a))
    assert_eq(E.fix(arr), np.fix(a))
    assert_eq(E.sinc(arr), np.sinc(a))
    assert_eq(E.square(arr), np.square(a))
    assert_eq(E.sign(arr), np.sign(a))
    assert_eq(E.deg2rad(arr), np.deg2rad(a))
    assert_eq(E.log2(parr), np.log2(p))
    assert_eq(E.arctan(arr), np.arctan(a))


def test_nan_predicates(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    a = np.array([1.0, np.nan, 3.0, np.nan])
    arr = from_numpy(spark, a)  # NaN -> NULL cells
    assert_eq(E.isnan(arr).astype("long"), np.isnan(a).astype("int64"))
    assert_eq(E.isfinite(arr).astype("long"), np.isfinite(a).astype("int64"))


def test_binary_table(spark, xs):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    arr, a = xs
    b = np.array([1.5, -0.5, 2.0, 1.0, -2.0, 0.5, 3.0, -1.0])
    brr = from_numpy(spark, b)
    assert_eq(E.maximum(arr, brr), np.maximum(a, b))
    assert_eq(E.fmin(arr, brr), np.fmin(a, b))
    assert_eq(E.copysign(arr, brr), np.copysign(a, b))
    assert_eq(E.hypot(arr, brr), np.hypot(a, b))
    assert_eq(E.logaddexp(arr, brr), np.logaddexp(a, b))
    assert_eq(E.logaddexp2(arr, brr), np.logaddexp2(a, b))
    assert_eq(E.ldexp(arr, 3), np.ldexp(a, 3))
    assert_eq(E.float_power(E.absolute(arr), 2.0), np.float_power(np.abs(a), 2.0))
    assert_eq(
        E.isclose(arr, brr).astype("long"), np.isclose(a, b).astype("int64")
    )


def test_maximum_propagates_nan(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    a = np.array([1.0, np.nan, 3.0])
    b = np.array([2.0, 5.0, np.nan])
    got = E.maximum(from_numpy(spark, a), from_numpy(spark, b))
    assert_eq(got, np.maximum(a, b))  # NaN propagates
    got2 = E.fmax(from_numpy(spark, a), from_numpy(spark, b))
    assert_eq(got2, np.fmax(a, b))  # NaN skipped


def test_shifts(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    a = np.array([1, 2, 3, 40], dtype="int64")
    arr = from_numpy(spark, a)
    assert_eq(E.left_shift(arr, 3), a << 3)
    assert_eq(E.right_shift(arr, 2), a >> 2)


def test_multi_output(xs):
    from dask_array_spark.operators import elemwise as E

    arr, a = xs
    q, r = E.divmod_(arr, 2.0)
    qq, rr = np.divmod(a, 2.0)
    assert_eq(q, qq)
    assert_eq(r, rr)
    f, i = E.modf(arr)
    ff, ii = np.modf(a)
    assert_eq(f, ff)
    assert_eq(i, ii)
    m, e = E.frexp(arr)
    mm, ee = np.frexp(a)
    assert_eq(m, mm)
    assert_eq(e.astype("long"), ee.astype("int64"))


def test_select_choose_piecewise(spark, xs):
    from dask_array_spark.operators import elemwise as E

    arr, a = xs
    got = E.select([arr < 0, arr > 2], [arr * -1.0, arr * 10.0], default=0.5)
    want = np.select([a < 0, a > 2], [a * -1.0, a * 10.0], default=0.5)
    assert_eq(got, want)

    from dask_array_spark import from_numpy

    idx = np.array([0, 2, 1, 0], dtype="int64")
    got2 = E.choose(from_numpy(spark, idx), [10.0, 20.0, 30.0])
    assert_eq(got2, np.choose(idx, [10.0, 20.0, 30.0]))

    got3 = E.piecewise(arr, [arr < 0, arr >= 0], [lambda x: x * 2.0, 5.0])
    want3 = np.piecewise(a, [a < 0, a >= 0], [lambda x: x * 2.0, 5.0])
    assert_eq(got3, want3)


def test_complex_ops(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C

    re = np.array([1.0, -2.0, 0.5, 3.0])
    im = np.array([0.5, 1.5, -1.0, 0.0])
    z = re + 1j * im
    w = (re * 2 - 1) + 1j * (im + 3)
    zr = C.make_complex(from_numpy(spark, re), from_numpy(spark, im))
    wr = C.make_complex(
        from_numpy(spark, re * 2 - 1), from_numpy(spark, im + 3)
    )
    assert_eq(C.real(zr), z.real)
    assert_eq(C.imag(C.conj(zr)), -z.imag)
    assert_eq(C.cabs(zr), np.abs(z))
    assert_eq(C.angle(zr), np.angle(z))
    prod = C.cmul(zr, wr)
    assert_eq(C.real(prod), (z * w).real)
    assert_eq(C.imag(prod), (z * w).imag)
    s = C.cadd(zr, wr)
    assert_eq(C.real(s), (z + w).real)
    assert_eq(C.iscomplex(zr).astype("long"), (z.imag != 0).astype("int64"))


def test_choose_with_array_choices(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    idx = np.array([0, 1, 1, 0], dtype="int64")
    a = np.array([10.0, 20.0, 30.0, 40.0])
    b = np.array([-1.0, -2.0, -3.0, -4.0])
    got = E.choose(from_numpy(spark, idx), [from_numpy(spark, a), from_numpy(spark, b)])
    assert_eq(got, np.choose(idx, [a, b]))


def test_elemwise_n_operands(spark):
    """elemwise with 3 and 4 operands (round-1 gap: >2 raised)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_array_spark import from_numpy
    from dask_array_spark.operators.elemwise import elemwise

    x = np.array([1.0, 2.0, 3.0])
    y = np.array([10.0, 20.0, 30.0])
    z = np.array([100.0, 200.0, 300.0])
    w = np.array([0.5, 0.25, 0.125])
    a, b, c, d = (from_numpy(spark, v) for v in (x, y, z, w))
    out3 = elemwise(lambda p, q, r: p + q * r, a, b, c)
    assert np.allclose(out3.compute(), x + y * z)
    out4 = elemwise(lambda p, q, r, s: (p + q) * r - s, a, b, c, d)
    assert np.allclose(out4.compute(), (x + y) * z - w)


def test_choose_with_array_choices(spark):
    """choose() with Array-valued choices across distinct bases
    (round-1 'known-partial' — pinned here)."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import elemwise as E

    idx_np = np.array([0, 2, 1, 0, 2], dtype="float64")
    a_np = np.array([10.0, 11.0, 12.0, 13.0, 14.0])
    arrs = [from_numpy(spark, a_np * f) for f in (1.0, 10.0, 100.0)]
    out = E.choose(from_numpy(spark, idx_np), arrs)
    want = np.choose(idx_np.astype(int), [a_np, a_np * 10, a_np * 100])
    assert np.allclose(out.compute(), want)
