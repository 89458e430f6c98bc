"""Property-based fuzz of the creation tier vs NumPy: arange with
negative/uneven steps, linspace endpoints, eye/tri offsets past either
edge, diagonal extraction offsets, the closed-form tril/triu index
prefixes (the likeliest arithmetic to harbor an off-by-one at hostile
k), meshgrid xy/ij, fromfunction over index expressions, and
indices_nd.

eye/tri are SPARSE by contract (zeros implicit; creation.py:96,109),
so those compare the PRESENT-CELL set against NumPy's nonzero mask and
the values at those cells -- the same read every consumer (matmul,
masking) performs through the inner-join algebra.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


def _present_cells(a):
    """{(i, j): v} of materialized (non-NULL) cells."""
    return {
        tuple(int(r[f"i{k}"]) for k in range(len(a.shape))): r["v"]
        for r in a.df.collect()
        if r["v"] is not None
    }


# ---------------------------------------------------------------- arange


@settings(max_examples=12, deadline=None)
@given(st.integers(-10, 10), st.integers(-10, 10), st.integers(-4, 4))
def test_arange_random(spark, start, stop, step):
    from dask_array_spark.operators import creation as C

    assume(step != 0)
    assert_eq(C.arange(spark, start, stop, step), np.arange(start, stop, step, dtype="float64"))


@settings(max_examples=8, deadline=None)
@given(
    st.floats(-5, 5, allow_nan=False),
    st.floats(-5, 5, allow_nan=False),
    st.integers(1, 20),
)
def test_linspace_random(spark, start, stop, num):
    from dask_array_spark.operators import creation as C

    assert_eq(C.linspace(spark, start, stop, num), np.linspace(start, stop, num))


# ---------------------------------------------------------------- eye / tri


@settings(max_examples=12, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(-8, 8))
def test_eye_tri_sparse_cells(spark, n, m, k):
    from dask_array_spark.operators import creation as C

    for maker, ref in ((C.eye, np.eye), (C.tri, np.tri)):
        got = _present_cells(maker(spark, n, m, k))
        want = ref(n, m, k)
        want_cells = {
            (int(i), int(j)): 1.0 for i, j in zip(*np.nonzero(want))
        }
        assert got == want_cells


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(-7, 7), st.integers(0, 10_000))
def test_diagonal_random_offsets(spark, n, m, off, seed):
    from dask_array_spark.operators import creation as C

    rng = np.random.default_rng(seed)
    x = rng.integers(1, 50, size=(n, m)).astype("float64")
    assert_eq(C.diagonal(_arr(spark, x), off), np.diagonal(x, off))


# ------------------------------------------------------- tril/triu indices


@settings(max_examples=14, deadline=None)
@given(st.integers(1, 7), st.integers(1, 7), st.integers(-9, 9))
def test_tril_triu_indices_random(spark, n, m, k):
    from dask_array_spark.operators import creation as C

    rows, cols = C.tril_indices(spark, n, k=k, m=m)
    wr, wc = np.tril_indices(n, k=k, m=m)
    assert_eq(rows, wr.astype("float64"))
    assert_eq(cols, wc.astype("float64"))

    rows, cols = C.triu_indices(spark, n, k=k, m=m)
    wr, wc = np.triu_indices(n, k=k, m=m)
    assert_eq(rows, wr.astype("float64"))
    assert_eq(cols, wc.astype("float64"))


# ---------------------------------------------------------------- meshgrid


@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.integers(1, 3),
    st.sampled_from(["xy", "ij"]),
    st.integers(2, 3),
    st.integers(0, 10_000),
)
def test_meshgrid_random(spark, na, nb, nc, indexing, n_arrays, seed):
    from dask_array_spark.operators import creation as C

    rng = np.random.default_rng(seed)
    lens = [na, nb, nc][:n_arrays]
    xs = [rng.integers(1, 40, size=s).astype("float64") for s in lens]
    got = C.meshgrid(*(_arr(spark, x) for x in xs), indexing=indexing)
    want = np.meshgrid(*xs, indexing=indexing)
    for g, w in zip(got, want):
        assert_eq(g, w)


# ------------------------------------------------------------ fromfunction


@settings(max_examples=6, deadline=None)
@given(st.integers(1, 5), st.integers(1, 5))
def test_fromfunction_expr_random(spark, n, m):
    from dask_array_spark.operators import creation as C

    got = C.fromfunction_expr(spark, (n, m), "i0 * 7.0 + i1 * i1")
    want = np.fromfunction(lambda i, j: i * 7.0 + j * j, (n, m))
    assert_eq(got, want)


@settings(max_examples=6, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(1, 3))
def test_indices_nd_random(spark, n, m, p):
    from dask_array_spark.operators import creation as C

    got = C.indices_nd(spark, (n, m, p))
    want = np.indices((n, m, p))
    for g, w in zip(got, want):
        assert_eq(g, w.astype("float64"))


# ---------------------------------------------------- parity triangles/diag


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(-7, 7), st.integers(0, 10_000))
def test_tril_triu_diag_parity_ops(spark, n, m, k, seed):
    from dask_array_spark.operators import parity as P

    rng = np.random.default_rng(seed)
    x = rng.integers(1, 50, size=(n, m)).astype("float64")
    a = _arr(spark, x)
    assert_eq(P.tril(a, k), np.tril(x, k))
    assert_eq(P.triu(a, k), np.triu(x, k))
    assert_eq(P.diag(a, k), np.diag(x, k))  # 2-D: extract
    v = rng.integers(1, 50, size=n).astype("float64")
    # 1-D: build -- sparse off-diagonal zeros, so compare present cells
    got = _present_cells(P.diag(_arr(spark, v), k))
    want = np.diag(v, k)
    want_cells = {
        (int(i), int(j)): want[i, j] for i, j in zip(*np.nonzero(want))
    }
    assert got == want_cells


@settings(max_examples=6, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.integers(1, 3), st.integers(0, 10_000))
def test_block_nested_assembly(spark, n, m, p, seed):
    from dask_array_spark.operators import parity as P

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 40, size=(n, m)).astype("float64")
    b = rng.integers(1, 40, size=(n, p)).astype("float64")
    c = rng.integers(1, 40, size=(2, m)).astype("float64")
    d = rng.integers(1, 40, size=(2, p)).astype("float64")
    got = P.block([[_arr(spark, a), _arr(spark, b)], [_arr(spark, c), _arr(spark, d)]])
    want = np.block([[a, b], [c, d]])
    assert_eq(got, want)


@settings(max_examples=8, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 5), st.integers(0, 10_000))
def test_rot90_random(spark, n, m, k, seed):
    from dask_array_spark.operators import parity as P

    rng = np.random.default_rng(seed)
    x = rng.integers(1, 50, size=(n, m)).astype("float64")
    assert_eq(P.rot90(_arr(spark, x), k), np.rot90(x, k))
