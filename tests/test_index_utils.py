"""ravel_multi_index / unravel_index / tril_indices / triu_indices vs
numpy (VERDICT r3 item 5; reference routines/_misc.py,
creation/_tri.py)."""

import numpy as np
import pytest


def _vals(arr):
    return np.array(
        [r["v"] for r in arr.df.orderBy("i0").collect()], dtype="int64"
    )


def test_unravel_ravel_roundtrip(spark):
    from dask_array_spark.operators import creation as CR
    from dask_array_spark.operators import manipulation as M

    flat = CR.arange(spark, 24)
    coords = M.unravel_index(flat, (2, 3, 4))
    want = np.unravel_index(np.arange(24), (2, 3, 4))
    for got, w in zip(coords, want):
        np.testing.assert_array_equal(_vals(got), w)
    back = M.ravel_multi_index(coords, (2, 3, 4))
    np.testing.assert_array_equal(_vals(back), np.arange(24))
    # cross-shape: transpose the coordinate roles
    p = M.ravel_multi_index((coords[2], coords[0], coords[1]), (4, 2, 3))
    wp = np.ravel_multi_index((want[2], want[0], want[1]), (4, 2, 3))
    np.testing.assert_array_equal(_vals(p), wp)


def test_ravel_multi_index_validates(spark):
    from dask_array_spark.operators import creation as CR
    from dask_array_spark.operators import manipulation as M

    flat = CR.arange(spark, 6)
    with pytest.raises(ValueError):
        M.ravel_multi_index((flat,), (2, 3))


@pytest.mark.parametrize("k", [-5, -2, 0, 1, 3, 7])
@pytest.mark.parametrize("n,m", [(5, 5), (4, 6), (6, 3)])
def test_triangle_indices_match_numpy(spark, n, m, k):
    from dask_array_spark.operators import creation as CR

    rows, cols = CR.tril_indices(spark, n, k, m)
    wr, wc = np.tril_indices(n, k, m)
    assert rows.shape == (len(wr),)
    np.testing.assert_array_equal(_vals(rows), wr)
    np.testing.assert_array_equal(_vals(cols), wc)

    rows, cols = CR.triu_indices(spark, n, k, m)
    wr, wc = np.triu_indices(n, k, m)
    assert rows.shape == (len(wr),)
    np.testing.assert_array_equal(_vals(rows), wr)
    np.testing.assert_array_equal(_vals(cols), wc)


def test_triangle_indices_from(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import creation as CR

    a = from_numpy(spark, rng.normal(size=(4, 6)))
    rows, _ = CR.tril_indices_from(a, k=1)
    wr, _ = np.tril_indices(4, 1, 6)
    np.testing.assert_array_equal(_vals(rows), wr)
    _, cols = CR.triu_indices_from(a, k=-1)
    _, wc = np.triu_indices(4, -1, 6)
    np.testing.assert_array_equal(_vals(cols), wc)
    with pytest.raises(ValueError):
        CR.tril_indices_from(from_numpy(spark, np.arange(3.0)))


def test_tril_gather_values(spark, rng):
    """The indices drive a real gather: sum of the strict lower
    triangle of a matrix via vindex == np.tril sum."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import creation as CR
    from dask_array_spark.operators import manipulation as M

    x = rng.normal(size=(6, 6))
    a = from_numpy(spark, x)
    rows, cols = CR.tril_indices_from(a, k=-1)
    flat = M.ravel_multi_index((rows, cols), (6, 6))
    av = M.reshape(a, (36,))
    picked = av.df.join(flat.df.selectExpr("v as i0"), on="i0")
    got = picked.agg({"v": "sum"}).collect()[0][0]
    want = np.tril(x, -1).sum()
    np.testing.assert_allclose(got, want, atol=1e-9)
