"""lstsq/solve/inv/cholesky/lu vs the NumPy oracle (reference
linalg/_solve.py, _cholesky.py, _lu.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spd(rng):
    m = rng.normal(size=(6, 6))
    return m @ m.T + 6 * np.eye(6)


def test_lstsq_matches_numpy(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    a = rng.normal(size=(300, 4))
    coef = np.array([2.0, -1.0, 0.5, 3.0])
    b = a @ coef + rng.normal(scale=0.01, size=300)
    x, rss = linalg.lstsq(from_numpy(spark, a), from_numpy(spark, b), block_rows=64)
    want, res, _, _ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(x, want, atol=1e-8)
    np.testing.assert_allclose(rss, res[0] if len(res) else rss, atol=1e-6)


def test_solve_and_inv(spark, rng, spd):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    b = rng.normal(size=6)
    a_arr = from_numpy(spark, spd)
    x = linalg.solve(a_arr, from_numpy(spark, b)).compute()
    np.testing.assert_allclose(x, np.linalg.solve(spd, b), atol=1e-9)
    got_inv = linalg.inv(a_arr).compute()
    np.testing.assert_allclose(got_inv, np.linalg.inv(spd), atol=1e-9)


def test_cholesky(spark, spd):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    L = linalg.cholesky(from_numpy(spark, spd)).compute()
    L = np.nan_to_num(L)  # sparse upper triangle -> 0
    np.testing.assert_allclose(L @ L.T, spd, atol=1e-9)
    np.testing.assert_allclose(L, np.linalg.cholesky(spd), atol=1e-9)


def test_lu(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    a = rng.normal(size=(7, 7))
    P, L, U = linalg.lu(from_numpy(spark, a))
    P = np.nan_to_num(P.compute())
    L = np.nan_to_num(L.compute())
    U = np.nan_to_num(U.compute())
    np.testing.assert_allclose(P @ a, L @ U, atol=1e-10)
    assert np.allclose(np.tril(L), L) and np.allclose(np.triu(U), U)


def test_solve_triangular(rng, spd):
    from dask_array_spark.operators import linalg

    L = np.linalg.cholesky(spd)
    b = rng.normal(size=6)
    y = linalg.solve_triangular(L, b, lower=True)
    np.testing.assert_allclose(L @ y, b, atol=1e-10)
    x = linalg.solve_triangular(L.T, y, lower=False)
    np.testing.assert_allclose(spd @ x, b, atol=1e-8)
