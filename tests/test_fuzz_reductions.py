"""Property-based fuzz: the reduction family vs the NumPy oracle with
HOSTILE inputs -- NaN cells, all-NaN slices, ties, zeros and negative
values (for the prod sign/zero logic), ddof variants -- the inputs the
arange-based chain fuzz (test_fuzz.py) never generates.

This suite is what exposed the round-7 NaN-encoding bug: ``from_numpy``
silently shipped NaN as double NaN (pandas coerces None back to NaN in
a float64 column), so Spark's NaN aggregate semantics (NaN sorts
LARGEST; sum/avg propagate) leaked through the nan* family.  The fix
is two-layer: true NULL encoding at ingest (sources/ingest.py
``from_numpy``) and ``_nan_normalized`` at every reduction/scan entry
(operators/reductions.py, operators/windows.py) so JVM-computed NaNs
(inf-inf) are folded into the NULL contract too.

Mirrors the reference's NaN reduction tests
(/root/reference/dask_array/reductions -- nan* family semantics).
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import assert_eq

# small integer value grid so ties are common; NaN injected by mask
_vals = st.integers(-3, 4)


def _array(rows, cols, vals, nan_mask):
    a = np.array(vals[: rows * cols], dtype="float64").reshape(rows, cols)
    m = np.array(nan_mask[: rows * cols], dtype=bool).reshape(rows, cols)
    a[m] = np.nan
    return a


_gen = given(
    rows=st.integers(2, 4),
    cols=st.integers(2, 4),
    vals=st.lists(_vals, min_size=16, max_size=16),
    nan_mask=st.lists(st.booleans(), min_size=16, max_size=16),
    axis=st.sampled_from([None, 0, 1]),
)
_cfg = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_cfg
@_gen
def test_fuzz_nan_sum_mean_minmax(spark, rows, cols, vals, nan_mask, axis):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = _array(rows, cols, vals, nan_mask)
    arr = from_numpy(spark, a)
    assert_eq(R.sum(arr, axis=axis), a.sum(axis=axis))
    assert_eq(R.nansum(arr, axis=axis), np.nansum(a, axis=axis))
    assert_eq(R.mean(arr, axis=axis), a.mean(axis=axis))
    assert_eq(R.amin(arr, axis=axis), a.min(axis=axis))
    assert_eq(R.amax(arr, axis=axis), a.max(axis=axis))
    # nan-skipping min/max/mean only where a slice has >=1 finite cell
    # (NumPy warns + returns NaN on all-NaN slices; engine NULL->NaN
    # agrees, so compare with the warning suppressed)
    with np.errstate(invalid="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            assert_eq(R.nanmin(arr, axis=axis), np.nanmin(a, axis=axis))
            assert_eq(R.nanmax(arr, axis=axis), np.nanmax(a, axis=axis))
            assert_eq(R.nanmean(arr, axis=axis), np.nanmean(a, axis=axis))


@_cfg
@_gen
def test_fuzz_nan_prod_var_std(spark, rows, cols, vals, nan_mask, axis):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = _array(rows, cols, vals, nan_mask)
    arr = from_numpy(spark, a)
    assert_eq(R.prod(arr, axis=axis), a.prod(axis=axis), atol=1e-9)
    assert_eq(R.nanprod(arr, axis=axis), np.nanprod(a, axis=axis), atol=1e-9)
    assert_eq(R.var(arr, axis=axis, ddof=0), a.var(axis=axis, ddof=0))
    assert_eq(R.std(arr, axis=axis, ddof=0), a.std(axis=axis, ddof=0))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert_eq(R.nanvar(arr, axis=axis, ddof=0), np.nanvar(a, axis=axis, ddof=0))


@_cfg
@_gen
def test_fuzz_nan_median_quantile(spark, rows, cols, vals, nan_mask, axis):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = _array(rows, cols, vals, nan_mask)
    arr = from_numpy(spark, a)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert_eq(R.median(arr, axis=axis), np.median(a, axis=axis))
        assert_eq(R.nanmedian(arr, axis=axis), np.nanmedian(a, axis=axis))
        assert_eq(R.quantile(arr, 0.3, axis=axis), np.quantile(a, 0.3, axis=axis))


@_cfg
@_gen
def test_fuzz_nan_arg_reductions(spark, rows, cols, vals, nan_mask, axis):
    """argmin/argmax: NumPy first-tie + NaN-wins; nanarg* skip NaN.
    NumPy RAISES on all-NaN slices for nanarg*, so those slices are
    excluded by replacing one cell per slice with a finite value."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    a = _array(rows, cols, vals, nan_mask)
    # guarantee >=1 finite cell per row AND column (nanarg* defined)
    a[0, :] = np.where(np.isnan(a[0, :]), 1.0, a[0, :])
    a[:, 0] = np.where(np.isnan(a[:, 0]), 1.0, a[:, 0])
    arr = from_numpy(spark, a)
    ax = 0 if axis is None else axis
    assert_eq(R.nanargmin(arr, axis=ax), np.nanargmin(a, axis=ax))
    assert_eq(R.nanargmax(arr, axis=ax), np.nanargmax(a, axis=ax))
    if not np.isnan(a).any():
        assert_eq(R.argmin(arr, axis=ax), a.argmin(axis=ax))
        assert_eq(R.argmax(arr, axis=ax), a.argmax(axis=ax))


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(_vals, min_size=3, max_size=10),
    nan_mask=st.lists(st.booleans(), min_size=10, max_size=10),
)
def test_fuzz_nan_scans_1d(spark, vals, nan_mask):
    """cumsum/cumprod NaN poisoning + nan* skipping + push ffill,
    both the WindowExec route and the two-pass distributed scan."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import windows as W

    a = np.array(vals, dtype="float64")
    a[np.array(nan_mask[: len(vals)], dtype=bool)] = np.nan
    for scalable in (False, True):
        arr = from_numpy(spark, a)
        assert_eq(W.cumsum(arr, scalable=scalable), np.cumsum(a))
        assert_eq(W.nancumsum(arr, scalable=scalable), np.nancumsum(a))
        assert_eq(W.cumprod(arr, scalable=scalable), np.cumprod(a), atol=1e-9)
        assert_eq(W.nancumprod(arr, scalable=scalable), np.nancumprod(a), atol=1e-9)
        # push: pandas-style ffill oracle
        exp = a.copy()
        last = np.nan
        for i, x in enumerate(exp):
            if np.isnan(x):
                exp[i] = last
            else:
                last = x
        if scalable is False:  # _push_1d routes only via limit=None
            assert_eq(W.push(arr), exp)


def test_computed_nan_folds_into_null_contract(spark):
    """inf-inf computed JVM-side must behave like an absent cell in the
    nan* family (the _nan_normalized layer, not the ingest fix)."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R
    from dask_array_spark.operators import windows as W

    e = np.array([np.inf, 1.0, 2.0])
    sub = from_numpy(spark, e) - from_numpy(spark, e)  # [NaN, 0, 0]
    assert R.nansum(sub, axis=None).compute() == 0.0
    np.testing.assert_allclose(W.nancumsum(sub).compute(), [0.0, 0.0, 0.0])
    got = R.sum(sub, axis=None).compute()
    assert np.isnan(got)
