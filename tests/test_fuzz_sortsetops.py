"""Property-based fuzz of the ordering tier (sort/argsort, setops,
topk/argtopk, searchsorted) vs NumPy oracles.

Values are drawn from SMALL integer pools cast to float so ties are
frequent -- the interesting contracts here are all tie contracts:
argsort stability (NumPy kind='stable'), topk first-index tie-breaks
(reference routines/_topk.py keeps the smallest index), searchsorted
left/right on exact boundary hits, and set ops with duplicated and
disjoint inputs (including empty results).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


def _tied(draw_list):
    return np.asarray(draw_list, dtype="float64")


VALS = st.lists(st.integers(-4, 4), min_size=1, max_size=24)


# ---------------------------------------------------------------- sort

@settings(max_examples=4, deadline=None)
@given(VALS)
def test_sort_argsort_ties(spark, vals):
    from dask_array_spark.operators import sorting as S

    x = _tied(vals)
    a = _arr(spark, x)
    assert_eq(S.sort(a), np.sort(x))
    assert_eq(S.argsort(a), np.argsort(x, kind="stable").astype("float64"))


# ---------------------------------------------------------------- setops

@settings(max_examples=4, deadline=None)
@given(VALS, VALS)
def test_setops_random(spark, va, vb):
    from dask_array_spark.operators import setops as SO

    xa, xb = _tied(va), _tied(vb)
    a, b = _arr(spark, xa), _arr(spark, xb)
    assert_eq(SO.union1d(a, b), np.union1d(xa, xb))
    assert_eq(SO.intersect1d(a, b), np.intersect1d(xa, xb))
    assert_eq(SO.setdiff1d(a, b), np.setdiff1d(xa, xb))
    assert_eq(SO.in1d(a, b), np.isin(xa, xb))


def test_setops_disjoint_empty(spark):
    from dask_array_spark.operators import setops as SO

    a = _arr(spark, np.array([1.0, 2.0, 2.0]))
    b = _arr(spark, np.array([5.0, 6.0]))
    assert_eq(SO.intersect1d(a, b), np.array([], dtype="float64"))
    assert_eq(SO.setdiff1d(a, b), np.array([1.0, 2.0]))
    assert_eq(SO.in1d(a, b), np.array([False, False, False]))


# ---------------------------------------------------------------- unique

@settings(max_examples=4, deadline=None)
@given(VALS)
def test_unique_counts_first_index(spark, vals):
    from dask_array_spark.operators import reductions as R

    x = _tied(vals)
    rows = R.unique_table(_arr(spark, x)).collect()
    got = sorted((r["value"], r["count"], r["first_index"]) for r in rows)
    u, first, counts = np.unique(x, return_index=True, return_counts=True)
    want = sorted(zip(u.tolist(), counts.tolist(), first.tolist()))
    assert got == want


# ---------------------------------------------------------------- topk

@settings(max_examples=4, deadline=None)
@given(
    st.integers(2, 5),
    st.integers(2, 6),
    st.integers(1, 6),
    st.integers(0, 10_000),
)
def test_topk_argtopk_ties_2d(spark, n, m, k, seed):
    from dask_array_spark.operators import reductions as R

    k = min(k, m)
    rng = np.random.default_rng(seed)
    x = rng.integers(-3, 4, size=(n, m)).astype("float64")
    a = _arr(spark, x)
    # NumPy oracle with the engine's documented tie-break: descending
    # value, then SMALLEST original index (stable argsort of -x)
    order = np.argsort(-x, axis=1, kind="stable")[:, :k]
    want_vals = np.take_along_axis(x, order, axis=1)
    assert_eq(R.topk(a, k, axis=1), want_vals)
    assert_eq(R.argtopk(a, k, axis=1), order.astype("float64"))


# ------------------------------------------------------------ searchsorted

@settings(max_examples=4, deadline=None)
@given(VALS, VALS, st.sampled_from(["left", "right"]))
def test_searchsorted_boundary_hits(spark, bounds, vals, side):
    from dask_array_spark.operators import slicing as SL

    xb = np.sort(_tied(bounds))
    xv = _tied(vals)  # small pool => frequent exact boundary hits
    got = SL.searchsorted(_arr(spark, xb), _arr(spark, xv), side=side)
    want = np.searchsorted(xb, xv, side=side)
    assert_eq(got, want.astype("float64"))
