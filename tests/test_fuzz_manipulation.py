"""Property-based fuzz of the index-algebra operators (slicing,
pad modes, fancy take, setitem, insert/delete, axis moves, reshape
chains, repeat/tile/stack/broadcast, sliding windows) vs the NumPy
oracle.  Arrays carry arange-distinct values so any index-mapping bug
changes VALUES, not just positions (the reference's fuzz strategy,
tests/test_fuzz_optimize.py).  Complements tests/test_fuzz.py (random
op CHAINS): here each operator family gets hostile random PARAMETERS
-- negative steps, repeated/negative take indices, zero-width pads,
pads wider than the axis, size-1 axes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


def _vec(n):
    # 10+ stride keeps values distinct through any later arithmetic
    return np.arange(n, dtype="float64") * 10.0 + 1.0


# ---------------------------------------------------------------- slices

SLICE = st.tuples(
    st.one_of(st.none(), st.integers(-9, 9)),
    st.one_of(st.none(), st.integers(-9, 9)),
    st.one_of(st.none(), st.integers(-4, 4).filter(lambda s: s != 0)),
).map(lambda t: slice(*t))


@settings(max_examples=8, deadline=None)
@given(st.integers(2, 12), SLICE, SLICE)
def test_getitem_random_slices(spark, n, s1, s2):
    x = _vec(n * 3).reshape(n, 3)
    a = _arr(spark, x)
    assert_eq(a[s1, s2], x[s1, s2])
    v = _vec(n)
    assert_eq(_arr(spark, v)[s1], v[s1])


# ---------------------------------------------------------------- pad

MODES = ["constant", "edge", "reflect", "symmetric", "wrap", "mean", "minimum", "maximum"]


@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 4),
    st.sampled_from(MODES),
    st.tuples(st.integers(0, 3), st.integers(0, 3)),
    st.tuples(st.integers(0, 3), st.integers(0, 3)),
)
def test_pad_random_widths_2d(spark, n, m, mode, pw0, pw1):
    from dask_array_spark.operators import manipulation as M

    # reflect needs at least 2 rows on the padded axis (numpy errors
    # on n==1); repeated reflections past the axis length are numpy-
    # defined, keep widths within one period like the reference does
    if mode == "reflect":
        pw0 = (min(pw0[0], max(n - 1, 0)), min(pw0[1], max(n - 1, 0)))
        pw1 = (min(pw1[0], max(m - 1, 0)), min(pw1[1], max(m - 1, 0)))
    if mode in ("symmetric", "wrap"):
        pw0 = (min(pw0[0], n), min(pw0[1], n))
        pw1 = (min(pw1[0], m), min(pw1[1], m))
    x = _vec(n * m).reshape(n, m)
    a = _arr(spark, x)
    kw = {"constant_values": 7.5} if mode == "constant" else {}
    nkw = {"constant_values": 7.5} if mode == "constant" else {}
    got = M.pad(a, [pw0, pw1], mode=mode, **kw)
    want = np.pad(x, (pw0, pw1), mode=mode, **nkw)
    assert_eq(got, want)


# ------------------------------------------------------- take / setitem

@settings(max_examples=8, deadline=None)
@given(st.integers(2, 10), st.data())
def test_take_repeats_negatives(spark, n, data):
    from dask_array_spark.operators import slicing as S

    x = _vec(n * 2).reshape(n, 2)
    idx = data.draw(st.lists(st.integers(-n, n - 1), min_size=1, max_size=2 * n))
    a = _arr(spark, x)
    assert_eq(S.take(a, idx, axis=0), np.take(x, idx, axis=0))
    v = _vec(n)
    assert_eq(S.take(_arr(spark, v), idx, axis=0), np.take(v, idx, axis=0))


@settings(max_examples=6, deadline=None)
@given(st.integers(3, 12), st.floats(-5, 120))
def test_setitem_masked_scalar(spark, n, thr):
    from dask_array_spark.operators import slicing as S

    x = _vec(n)
    a = _arr(spark, x)
    # shared-base mask: collapses to one CASE WHEN projection
    got = S.set_index_value(a, a > thr, -1.0)
    want = x.copy()
    want[x > thr] = -1.0
    assert_eq(got, want)
    # independent mask frame: the join path
    from dask_array_spark.sources import from_numpy

    m = from_numpy(spark, (x % 20.0 < 10.0))
    got2 = S.set_index_value(a, m, 99.0)
    want2 = x.copy()
    want2[x % 20.0 < 10.0] = 99.0
    assert_eq(got2, want2)


# ------------------------------------------- insert / delete / roll / flip

@settings(max_examples=8, deadline=None)
@given(st.integers(2, 10), st.data())
def test_insert_delete_roll(spark, n, data):
    from dask_array_spark.operators import manipulation as M

    x = _vec(n)
    a = _arr(spark, x)
    pos = data.draw(st.integers(0, n))
    assert_eq(M.insert_1d(a, pos, -3.5), np.insert(x, pos, -3.5))
    dpos = data.draw(st.integers(0, n - 1))
    assert_eq(M.delete_1d(a, dpos), np.delete(x, dpos))
    shift = data.draw(st.integers(-2 * n, 2 * n))
    assert_eq(M.roll(a, shift, 0), np.roll(x, shift))
    x2 = _vec(n * 3).reshape(n, 3)
    a2 = _arr(spark, x2)
    ax = data.draw(st.integers(0, 1))
    assert_eq(M.flip(a2, ax), np.flip(x2, ax))
    assert_eq(M.roll(a2, shift, ax), np.roll(x2, shift, ax))


# ------------------------------------------------------- axis moves (3-D)

@settings(max_examples=8, deadline=None)
@given(st.integers(1, 4), st.integers(1, 3), st.integers(1, 3), st.data())
def test_axis_moves_3d(spark, p, q, r, data):
    from dask_array_spark.operators import manipulation as M
    from dask_array_spark.operators.parity import rot90

    x = _vec(p * q * r).reshape(p, q, r)
    a = _arr(spark, x)
    perm = data.draw(st.permutations([0, 1, 2]))
    assert_eq(M.transpose(a, perm), np.transpose(x, perm))
    src = data.draw(st.integers(0, 2))
    dst = data.draw(st.integers(0, 2))
    assert_eq(M.moveaxis(a, src, dst), np.moveaxis(x, src, dst))
    ax1 = data.draw(st.integers(0, 2))
    ax2 = data.draw(st.integers(0, 2))
    assert_eq(M.swapaxes(a, ax1, ax2), np.swapaxes(x, ax1, ax2))
    k = data.draw(st.integers(0, 4))
    axes = data.draw(st.sampled_from([(0, 1), (1, 0), (1, 2), (0, 2)]))
    assert_eq(rot90(a, k=k, axes=axes), np.rot90(x, k=k, axes=axes))


# ------------------------------------------------------- reshape chains

@settings(max_examples=8, deadline=None)
@given(st.sampled_from([(2, 3, 4), (4, 6), (3, 8), (24,), (2, 2, 6), (1, 24)]), st.data())
def test_reshape_transpose_reshape(spark, shape, data):
    from dask_array_spark.operators import manipulation as M

    x = _vec(24).reshape(shape)
    a = M.reshape(_arr(spark, _vec(24)), shape)
    assert_eq(a, x)
    perm = data.draw(st.permutations(list(range(len(shape)))))
    at, xt = M.transpose(a, perm), np.transpose(x, perm)
    assert_eq(M.reshape(at, (24,)), xt.reshape(24))
    tgt = data.draw(st.sampled_from([(6, 4), (2, 12), (24,), (4, 3, 2)]))
    assert_eq(M.reshape(at, tgt), xt.reshape(tgt))


# --------------------------------------- repeat / tile / stack / broadcast

@settings(max_examples=6, deadline=None)
@given(st.integers(1, 5), st.integers(1, 4), st.integers(1, 3), st.data())
def test_repeat_tile_stack_broadcast(spark, n, reps, nstk, data):
    from dask_array_spark.operators import manipulation as M

    x = _vec(n * 2).reshape(n, 2)
    a = _arr(spark, x)
    ax = data.draw(st.integers(0, 1))
    assert_eq(M.repeat(a, reps, axis=ax), np.repeat(x, reps, axis=ax))
    assert_eq(
        M.tile(a, reps, axis=0), np.tile(x, (reps, 1))
    )
    sax = data.draw(st.integers(0, 2))
    assert_eq(
        M.stack([a] * nstk, axis=sax), np.stack([x] * nstk, axis=sax)
    )
    v = _vec(n)
    b = _arr(spark, v)
    k = data.draw(st.integers(1, 4))
    assert_eq(M.broadcast_to(b, (k, n)), np.broadcast_to(v, (k, n)))


@settings(max_examples=8, deadline=None)
@given(st.data())
def test_tile_numpy_form(spark, data):
    """np.tile parity (reference creation/_tile.py:10): int reps hits
    the LAST axis, short tuples left-pad with 1, long tuples add
    leading axes, zero reps produce the empty product shape."""
    from dask_array_spark.operators import manipulation as M

    ndim = data.draw(st.integers(1, 2))
    shape = tuple(data.draw(st.integers(2, 4)) for _ in range(ndim))
    x = _vec(int(np.prod(shape))).reshape(shape)
    a = _arr(spark, x)
    reps = data.draw(
        st.one_of(
            st.integers(1, 3),
            st.lists(st.integers(0, 3), min_size=1, max_size=ndim + 1).map(tuple),
        )
    )
    want = np.tile(x, reps)
    if want.size > 600:
        return
    got = M.tile(a, reps).compute()
    assert got.shape == want.shape
    if want.size:
        np.testing.assert_allclose(got, want)


def test_tile_negative_reps_raise(spark):
    from dask_array_spark.operators import manipulation as M

    a = _arr(spark, _vec(4))
    with pytest.raises(ValueError):
        M.tile(a, (-1, 2))


# ------------------------------------------------------- sliding windows

@settings(max_examples=6, deadline=None)
@given(st.integers(2, 14), st.data())
def test_sliding_window_view(spark, n, data):
    from dask_array_spark.operators import manipulation as M

    x = _vec(n)
    size = data.draw(st.integers(1, n))
    got = M.sliding_window_view(_arr(spark, x), size, axis=0)
    want = np.lib.stride_tricks.sliding_window_view(x, size)
    assert_eq(got, want)
