"""Block-form kernel surface vs NumPy: map_blocks / apply_along_axis /
apply_gufunc / block round-trip / TSQR svd (reference UDF surface,
SURVEY.md section 2.11)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def m(spark, rng):
    from dask_array_spark import from_numpy

    a = rng.normal(size=(17, 6))
    return from_numpy(spark, a), a


def test_block_roundtrip(spark, m):
    from dask_array_spark.core import blocks as B

    arr, a = m
    blk = B.to_blocks(arr, (5, 4))
    assert blk.count() == 4 * 2  # ceil(17/5) x ceil(6/4)
    back = B.from_blocks(blk, a.shape, (5, 4))
    assert_eq(back, a)


def test_map_blocks_affine(m):
    from dask_array_spark.core import blocks as B

    arr, a = m
    out = B.map_blocks(lambda b: b * 2.0 + 1.0, arr, (5, 4))
    assert_eq(out, a * 2.0 + 1.0)


def test_map_blocks_block_info(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.core import blocks as B

    a = np.zeros((8, 8))
    arr = from_numpy(spark, a)

    def add_origin(b, block_info=None):
        (r0, _), (c0, _) = block_info["array-location"]
        return b + r0 * 100 + c0

    out = B.map_blocks(add_origin, arr, (4, 4), with_block_info=True)
    want = np.zeros((8, 8))
    for r0 in (0, 4):
        for c0 in (0, 4):
            want[r0 : r0 + 4, c0 : c0 + 4] += r0 * 100 + c0
    assert_eq(out, want)


def test_apply_along_axis_scalar_and_vector(m):
    from dask_array_spark.core import blocks as B

    arr, a = m
    assert_eq(B.apply_along_axis(np.ptp, 1, arr), np.apply_along_axis(np.ptp, 1, a))
    # vector output: normalized by L2 norm
    f = lambda v: v / np.sqrt((v * v).sum())
    assert_eq(B.apply_along_axis(f, 1, arr), np.apply_along_axis(f, 1, a))


def test_apply_gufunc_dot(spark, rng, m):
    from dask_array_spark import from_numpy
    from dask_array_spark.core import blocks as B

    arr, a = m
    b = rng.normal(size=(17, 6))
    brr = from_numpy(spark, b)
    got = B.apply_gufunc(np.dot, "(i),(i)->()", arr, brr)
    assert_eq(got, np.einsum("ij,ij->i", a, b))


def test_apply_gufunc_softmax_vector_out(m):
    from dask_array_spark.core import blocks as B

    arr, a = m

    def softmax(v):
        e = np.exp(v - v.max())
        return e / e.sum()

    got = B.apply_gufunc(softmax, "(i)->(i)", arr).compute()
    want = np.apply_along_axis(softmax, 1, a)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_tsqr_and_svd(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    a = rng.normal(size=(200, 5))
    arr = from_numpy(spark, a)
    q, r = linalg.tsqr(arr, block_rows=50)
    qm = q.compute()
    np.testing.assert_allclose(qm.T @ qm, np.eye(5), atol=1e-9)
    np.testing.assert_allclose(qm @ r, a, atol=1e-9)
    assert np.all(np.diag(r) >= 0)

    u, s, vt = linalg.svd_tall(arr, block_rows=50)
    np.testing.assert_allclose(s, np.linalg.svd(a, compute_uv=False), atol=1e-9)
    um = u.compute()
    np.testing.assert_allclose(um @ np.diag(s) @ vt, a, atol=1e-8)
    np.testing.assert_allclose(um.T @ um, np.eye(5), atol=1e-9)


def test_apply_gufunc_full_signature_matmul(spark):
    """'(i,j),(j,k)->(i,k)' -- multi-core-dim signature (reference
    _gufunc.py:154,491)."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.core import blocks as B

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 6))
    y = rng.normal(size=(6, 3))
    a = from_numpy(spark, x)
    b = from_numpy(spark, y)

    out = B.apply_gufunc(lambda u, v: u @ v, "(i,j),(j,k)->(i,k)", a, b)
    assert out.shape == (4, 3)
    assert np.allclose(out.compute(), x @ y, atol=1e-9)


def test_apply_gufunc_loop_dims_with_matrix_core(spark):
    """loop dim + 2-D core: per-batch quadratic form
    '(i,j),(j)->(i)' with a batched left operand."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.core import blocks as B

    rng = np.random.default_rng(2)
    ms = rng.normal(size=(5, 3, 4))  # 5 loop points of 3x4 cores
    v = rng.normal(size=4)
    a = from_numpy(spark, ms)
    b = from_numpy(spark, v)
    out = B.apply_gufunc(lambda m, w: m @ w, "(i,j),(j)->(i)", a, b)
    assert out.shape == (5, 3)
    assert np.allclose(out.compute(), ms @ v, atol=1e-9)
