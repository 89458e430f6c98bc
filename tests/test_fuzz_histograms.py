"""Property-based fuzz of the counting tier (bincount, histogram,
histogram2d, histogramdd) vs NumPy.

Data is integer-valued (cast to float) and ranges are integer-edged so
every value lands EXACTLY on a bin edge with positive probability --
the classic inclusion bugs (last-edge-inclusive, below-range leak,
out-of-range clamp) all change counts, while the affine-floor bucket
arithmetic stays FP-exact on integers, keeping the NumPy comparison
bit-for-bit (the same convention histograms_suite's SQL oracle pins).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


VALS = st.lists(st.integers(0, 8), min_size=1, max_size=30)


@settings(max_examples=4, deadline=None)
@given(VALS, st.integers(0, 12))
def test_bincount_random(spark, vals, minlength):
    from dask_array_spark.operators import reductions as R

    x = np.asarray(vals, dtype="float64")
    got = R.bincount(_arr(spark, x), minlength=minlength)
    want = np.bincount(vals, minlength=minlength)
    # exact NumPy contract including the length: minlength extends the
    # result (the marker-row mechanism), data past it sets the length
    g = got.compute_shape().compute().astype("int64")
    np.testing.assert_array_equal(g, want)


@settings(max_examples=4, deadline=None)
@given(VALS, st.integers(0, 10_000))
def test_bincount_weighted(spark, vals, seed):
    from dask_array_spark.operators import reductions as R

    x = np.asarray(vals, dtype="float64")
    rng = np.random.default_rng(seed)
    w = rng.integers(-3, 4, size=len(vals)).astype("float64")
    got = R.bincount(_arr(spark, x), weights=_arr(spark, w), minlength=len(vals) // 2)
    want = np.bincount(vals, weights=w, minlength=len(vals) // 2)
    g = got.compute_shape().compute()
    assert len(g) == len(want)
    np.testing.assert_allclose(np.nan_to_num(g), want)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.integers(-6, 12), min_size=1, max_size=40),
    st.integers(1, 6),
    st.integers(-4, 2),
    st.integers(3, 10),
)
def test_histogram_edges(spark, vals, bins, lo, width):
    from dask_array_spark.operators import reductions as R

    hi = lo + width  # integer edges: exact-edge hits are common
    x = np.asarray(vals, dtype="float64")
    got = R.histogram(_arr(spark, x), bins, (float(lo), float(hi)))
    want, _ = np.histogram(x, bins=bins, range=(lo, hi))
    assert_eq(got, want)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(-3, 3)), min_size=1, max_size=30),
    st.integers(1, 4),
    st.integers(1, 4),
)
def test_histogram2d_edges(spark, pts, bx, by):
    from dask_array_spark.operators import reductions as R

    x = np.asarray([p[0] for p in pts], dtype="float64")
    y = np.asarray([p[1] for p in pts], dtype="float64")
    got = R.histogram2d(
        _arr(spark, x), _arr(spark, y), (bx, by), ((0.0, 6.0), (-3.0, 3.0))
    )
    want, _, _ = np.histogram2d(x, y, bins=(bx, by), range=((0, 6), (-3, 3)))
    assert_eq(got, want.astype("int64"))


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 3), st.integers(0, 2)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 3),
    st.integers(1, 3),
    st.integers(1, 2),
)
def test_histogramdd_edges(spark, pts, b0, b1, b2):
    from dask_array_spark.operators import reductions as R

    cols = [np.asarray([p[k] for p in pts], dtype="float64") for k in range(3)]
    ranges = ((0.0, 4.0), (0.0, 3.0), (0.0, 2.0))
    got = R.histogramdd([_arr(spark, c) for c in cols], (b0, b1, b2), ranges)
    want, _ = np.histogramdd(np.stack(cols, axis=1), bins=(b0, b1, b2), range=ranges)
    assert_eq(got, want.astype("int64"))
