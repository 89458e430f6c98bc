"""Property-based fuzz of elemwise arithmetic on HOSTILE values --
NaN, ±inf, ±0.0, extreme magnitudes -- vs the NumPy oracle.  This is
where SQL and IEEE-754 disagree: Spark (ANSI off) returns NULL for
x/0 and x%0 where NumPy wants ±inf/NaN, Java pow(±1, inf) is NaN
where C99/NumPy return 1, F.floor returns BIGINT and overflows on
|x| >= 2^63, and the folk modulo formula ((a%b)+b)%b breaks at
b=±inf.  The engine replicates npy_divmod exactly
(core/array.py _npy_floordiv/_npy_mod/_ieee_div/_npy_pow)."""

from __future__ import annotations

import numpy as np
import warnings
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import assert_eq

HOSTILE = [
    float("nan"), float("inf"), float("-inf"), -0.0, 0.0,
    1.0, -1.0, 2.5, -2.5, 0.5, -7.5, 3.0, 1e308, -1e308, 1e-308, -1e-308,
]
PAIRS = st.lists(
    st.tuples(st.sampled_from(HOSTILE), st.sampled_from(HOSTILE)),
    min_size=4,
    max_size=20,
)


def _arrs(spark, pairs):
    from dask_array_spark.sources import from_numpy

    x = np.array([p[0] for p in pairs])
    y = np.array([p[1] for p in pairs])
    return from_numpy(spark, x), from_numpy(spark, y), x, y


def _np(fn, *args):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return fn(*args)


@settings(max_examples=6, deadline=None)
@given(PAIRS)
def test_binary_arith_hostile(spark, pairs):
    a, b, x, y = _arrs(spark, pairs)
    assert_eq(a + b, _np(np.add, x, y))
    assert_eq(a - b, _np(np.subtract, x, y))
    assert_eq(a * b, _np(np.multiply, x, y))
    assert_eq(a / b, _np(np.true_divide, x, y))
    assert_eq(a // b, _np(np.floor_divide, x, y))
    assert_eq(a % b, _np(np.mod, x, y))


@settings(max_examples=6, deadline=None)
@given(PAIRS)
def test_power_hostile(spark, pairs):
    # domain-error NaN vs NULL both read back as NaN; the IEEE
    # special cases (x**0 == 1**y == (±1)**±inf == 1) must be exact
    a, b, x, y = _arrs(spark, pairs)
    assert_eq(a**b, _np(np.power, x, y))


@settings(max_examples=6, deadline=None)
@given(PAIRS)
def test_comparisons_jvm_nan_hostile(spark, pairs):
    # JVM-COMPUTED NaNs (inf-inf, inf*0) never went through the NULL
    # encoding, so without _nan_as_null in the comparison dunders
    # Spark semantics leak: NaN==NaN true, NaN sorts above every
    # double -- (a-a)==(a-a) or (a-a)>0 over an inf cell would return
    # True where NumPy returns False (round-7 ADVICE, array.py:325)
    a, b, x, y = _arrs(spark, pairs)
    d, xd = a - a, _np(np.subtract, x, x)      # NaN at |x| = inf
    m, ym = a * b, _np(np.multiply, x, y)      # NaN at inf * 0
    assert_eq((d == d).astype("long"), _np(np.equal, xd, xd).astype("int64"))
    assert_eq((d != d).astype("long"), _np(np.not_equal, xd, xd).astype("int64"))
    assert_eq((d > b).astype("long"), _np(np.greater, xd, y).astype("int64"))
    assert_eq((d >= m).astype("long"), _np(np.greater_equal, xd, ym).astype("int64"))
    assert_eq((m < b).astype("long"), _np(np.less, ym, y).astype("int64"))
    assert_eq((m <= d).astype("long"), _np(np.less_equal, ym, xd).astype("int64"))


@settings(max_examples=6, deadline=None)
@given(PAIRS)
def test_comparisons_minmax_hostile(spark, pairs):
    from dask_array_spark.operators import elemwise as E

    a, b, x, y = _arrs(spark, pairs)
    assert_eq((a > b).astype("long"), _np(np.greater, x, y).astype("int64"))
    assert_eq((a <= b).astype("long"), _np(np.less_equal, x, y).astype("int64"))
    assert_eq((a == b).astype("long"), _np(np.equal, x, y).astype("int64"))
    assert_eq(E.fmax(a, b), _np(np.fmax, x, y))
    assert_eq(E.fmin(a, b), _np(np.fmin, x, y))
    assert_eq(E.maximum(a, b), _np(np.maximum, x, y))
    assert_eq(E.minimum(a, b), _np(np.minimum, x, y))


@settings(max_examples=6, deadline=None)
@given(st.lists(st.sampled_from(HOSTILE), min_size=4, max_size=20))
def test_unary_hostile(spark, vals):
    from dask_array_spark.sources import from_numpy
    from dask_array_spark.operators import elemwise as E

    x = np.array(vals)
    a = from_numpy(spark, x)
    assert_eq(E.sqrt(a), _np(np.sqrt, x))
    assert_eq(E.log(a), _np(np.log, x))
    assert_eq(E.log2(a), _np(np.log2, x))
    assert_eq(E.log10(a), _np(np.log10, x))
    assert_eq(E.log1p(a), _np(np.log1p, x))
    assert_eq(E.floor(a), _np(np.floor, x))
    assert_eq(E.ceil(a), _np(np.ceil, x))
    assert_eq(E.trunc(a), _np(np.trunc, x))
    assert_eq(E.rint(a), _np(np.rint, x))
    assert_eq(E.reciprocal(a), _np(np.reciprocal, x))
    assert_eq(E.absolute(a), _np(np.absolute, x))
    assert_eq(
        E.signbit(a).astype("long"), _np(np.signbit, x).astype("int64")
    )
    assert_eq(
        E.isfinite(a).astype("long"), _np(np.isfinite, x).astype("int64")
    )
    assert_eq(E.exp(a), _np(np.exp, x))
    fpart, ipart = E.modf(a)
    nf, ni = _np(np.modf, x)
    assert_eq(fpart, nf)
    assert_eq(ipart, ni)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(-50, 50), min_size=3, max_size=16),
    st.lists(st.integers(1, 9), min_size=3, max_size=16),
)
def test_integer_floordiv_mod(spark, xs, ys):
    from dask_array_spark.sources import from_numpy

    n = min(len(xs), len(ys))
    x = np.array(xs[:n], dtype="int64")
    y = np.array(ys[:n], dtype="int64") * np.where(x % 2 == 0, 1, -1)
    a, b = from_numpy(spark, x), from_numpy(spark, y)
    assert_eq(a // b, np.floor_divide(x, y))
    assert_eq(a % b, np.mod(x, y))
    assert_eq(a / b, np.true_divide(x, y))
