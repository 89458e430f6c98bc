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


# -- round-6 namespace alias tail (reference __init__ parity) -------------


def test_binary_alias_dispatch(spark, xs):
    """add/subtract/... dispatch through the Array dunders, including
    the scalar-first reflected forms (reference exports these as
    np.ufunc wrappers, _ufunc.py:249-300)."""
    import dask_array_spark.api as da

    arr, a = xs
    b = np.array([1.5, -0.5, 2.0, 1.0, -2.0, 0.5, 3.0, -1.0])
    brr = da.from_numpy(spark, b)
    assert_eq(da.add(arr, brr), a + b)
    assert_eq(da.subtract(arr, brr), a - b)
    assert_eq(da.multiply(arr, brr), a * b)
    assert_eq(da.divide(arr, brr), a / b)
    assert_eq(da.true_divide(2.0, brr), 2.0 / b)  # reflected scalar-first
    assert_eq(da.power(da.abs(arr), 2.0), np.abs(a) ** 2.0)
    assert_eq(da.mod(arr, 2.0), np.mod(a, 2.0))  # sign-of-divisor, like np.mod
    assert_eq(da.negative(arr), -a)
    assert_eq(da.positive(arr), +a)
    assert_eq(da.fabs(arr), np.fabs(a))


def test_comparison_alias_dispatch(spark, xs):
    import dask_array_spark.api as da

    arr, a = xs
    assert_eq(da.equal(arr, 1.0).astype("long"), (a == 1.0).astype("int64"))
    assert_eq(da.not_equal(arr, 0.0).astype("long"), (a != 0.0).astype("int64"))
    assert_eq(da.greater(arr, 0.0).astype("long"), (a > 0.0).astype("int64"))
    assert_eq(da.less_equal(arr, 1.0).astype("long"), (a <= 1.0).astype("int64"))
    # scalar-first reflected comparison
    assert_eq(da.greater(1.0, arr).astype("long"), (1.0 > a).astype("int64"))


def test_bitwise_alias_dispatch(spark):
    import dask_array_spark.api as da

    a = np.array([0, 1, 2, 3, 12, 255], dtype="int64")
    b = np.array([1, 1, 3, 5, 10, 15], dtype="int64")
    arr, brr = da.from_numpy(spark, a), da.from_numpy(spark, b)
    assert_eq(da.bitwise_and(arr, brr), a & b)
    assert_eq(da.bitwise_or(arr, brr), a | b)
    assert_eq(da.bitwise_xor(arr, brr), a ^ b)
    assert_eq(da.bitwise_not(arr), ~a)
    assert_eq(da.invert(arr), ~a)


def test_conjugate_isreal(spark):
    import dask_array_spark.api as da

    re = np.array([1.0, -2.0, 0.5])
    im = np.array([0.5, 0.0, -3.0])
    c = da.make_complex(da.from_numpy(spark, re), da.from_numpy(spark, im))
    assert_eq(da.imag(da.conjugate(c)), -im)
    assert_eq(da.real(da.conjugate(c)), re)
    assert_eq(da.isreal(c).astype("long"), (im == 0).astype("int64"))
    r = da.from_numpy(spark, re)
    assert_eq(da.conjugate(r), re)  # identity on real arrays
    assert_eq(da.isreal(r).astype("long"), np.ones(3, dtype="int64"))


def test_nextafter_spacing_i0(spark):
    """The three genuinely-new ufuncs vs the numpy oracle (reference
    _ufunc.py:363-364,390)."""
    import dask_array_spark.api as da

    a = np.array([-2.5, -1.0, 0.0, 1.0, 1.5, 1e10, -1e-300])
    arr = da.from_numpy(spark, a)
    assert_eq(da.nextafter(arr, 10.0), np.nextafter(a, 10.0), rtol=0, atol=0)
    b = np.array([1.0, -1.0, 0.0, 5.0, -2.0, 1e10, 0.0])
    brr = da.from_numpy(spark, b)
    assert_eq(da.nextafter(arr, brr), np.nextafter(a, b), rtol=0, atol=0)
    assert_eq(da.spacing(arr), np.spacing(a), rtol=0, atol=0)
    x = np.array([0.0, 0.5, 1.0, 2.5, 3.7])
    assert_eq(da.i0(da.from_numpy(spark, x)), np.i0(x), rtol=1e-12)


def test_ufunc_wrapper_and_outer(spark):
    """da.ufunc wraps an elemwise callable with nin/nout metadata and
    an outer() built on expand_dims broadcasting (reference
    _ufunc.py:189-240)."""
    import dask_array_spark.api as da
    from dask_array_spark.operators.elemwise import maximum

    u = da.ufunc(maximum)
    assert u.nin == 2 and u.nout == 1
    a = np.array([1.0, 5.0, 3.0])
    b = np.array([2.0, 4.0])
    arr, brr = da.from_numpy(spark, a), da.from_numpy(spark, b)
    c = np.array([2.0, 4.0, 0.0])
    assert_eq(u(arr, da.from_numpy(spark, c)), np.maximum(a, c))
    assert_eq(u.outer(arr, brr), np.maximum.outer(a, b))
    import pytest

    with pytest.raises(ValueError):
        da.ufunc(lambda x: x, nin=1).outer(arr, brr)


def test_gufunc_and_as_gufunc(spark):
    """Bound gufunc + decorator form delegate to apply_gufunc
    (reference _gufunc.py:544,707)."""
    import dask_array_spark.api as da

    a = np.arange(12, dtype="float64").reshape(3, 4)
    arr = da.from_numpy(spark, a)

    g = da.gufunc(lambda x: x.sum(axis=-1), signature="(i)->()")
    assert_eq(g(arr), a.sum(axis=-1))

    @da.as_gufunc("(i)->()")
    def rowmax(x):
        return x.max(axis=-1)

    assert_eq(rowmax(arr), a.max(axis=-1))

    import pytest

    with pytest.raises(ValueError):
        da.gufunc(lambda x: x)  # signature is required


def test_optimize_and_constants(spark):
    import dask_array_spark.api as da

    a = np.array([1.0, 2.0])
    arr = da.from_numpy(spark, a)
    assert da.optimize(arr) is arr  # Catalyst optimizes at action time
    assert da.newaxis is None
    assert da.pi == np.pi and da.e == np.e
    assert np.isnan(da.nan) and da.inf == np.inf
    assert da.euler_gamma == np.euler_gamma
    assert da.float64 is np.float64 and da.int32 is np.int32
    assert da.complex128 is np.complex128
