"""Distributed blocked Cholesky / LU / solve wavefront vs the NumPy
oracle (reference linalg/_cholesky.py:27-214, _lu.py:27-265,
_solve.py:20-330).  Multi-block grids throughout -- the whole point is
that the wavefront crosses tile boundaries."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spd(rng):
    m = rng.normal(size=(23, 23))
    return m @ m.T + 23 * np.eye(23)


def test_cholesky_multiblock(spark, spd):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import cholesky_blocked

    L = cholesky_blocked(from_numpy(spark, spd), nb=9).compute()
    L = np.nan_to_num(L)
    np.testing.assert_allclose(L, np.linalg.cholesky(spd), atol=1e-9)


def test_lu_multiblock_invariants(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import lu_blocked

    a = rng.normal(size=(17, 17)) + 17 * np.eye(17)
    P, L, U = lu_blocked(from_numpy(spark, a), nb=6)
    P = np.nan_to_num(P.compute())
    L = np.nan_to_num(L.compute())
    U = np.nan_to_num(U.compute())
    np.testing.assert_allclose(P @ a, L @ U, atol=1e-9)
    assert np.allclose(np.tril(L), L)
    assert np.allclose(np.triu(U), U)
    # P is a permutation matrix (block-diagonal by construction)
    assert np.allclose(P @ P.T, np.eye(17), atol=1e-12)


def test_solve_gen_multiblock(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import solve_blocked

    a = rng.normal(size=(19, 19)) + 19 * np.eye(19)
    b = rng.normal(size=19)
    x = solve_blocked(from_numpy(spark, a), from_numpy(spark, b), nb=7).compute()
    np.testing.assert_allclose(x, np.linalg.solve(a, b), atol=1e-8)


def test_solve_pos_multiblock(spark, rng, spd):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import solve_blocked

    b = rng.normal(size=23)
    x = solve_blocked(
        from_numpy(spark, spd), from_numpy(spark, b), assume_a="pos", nb=8
    ).compute()
    np.testing.assert_allclose(x, np.linalg.solve(spd, b), atol=1e-8)


def test_solve_matrix_rhs(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import solve_blocked

    a = rng.normal(size=(12, 12)) + 12 * np.eye(12)
    b = rng.normal(size=(12, 3))
    x = solve_blocked(from_numpy(spark, a), from_numpy(spark, b), nb=5).compute()
    np.testing.assert_allclose(x, np.linalg.solve(a, b), atol=1e-8)


def test_inv_multiblock(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import inv_blocked

    a = rng.normal(size=(13, 13)) + 13 * np.eye(13)
    got = inv_blocked(from_numpy(spark, a), nb=5).compute()
    np.testing.assert_allclose(got, np.linalg.inv(a), atol=1e-8)


def test_solve_triangular_blocked(spark, rng, spd):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.linalg_blocked import solve_triangular_blocked

    L = np.linalg.cholesky(spd)
    b = rng.normal(size=23)
    y = solve_triangular_blocked(
        from_numpy(spark, L), from_numpy(spark, b), lower=True, nb=8
    ).compute()
    np.testing.assert_allclose(L @ y, b, atol=1e-9)


def test_no_driver_collect(spark, rng, monkeypatch):
    """The wavefront never pulls a matrix to the driver: poison
    _collect_dense and run every public entry point on multi-block
    inputs."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    def boom(_):
        raise AssertionError("_collect_dense called on the blocked path")

    monkeypatch.setattr(linalg, "_collect_dense", boom)

    m = rng.normal(size=(11, 11))
    spd = m @ m.T + 11 * np.eye(11)
    b = rng.normal(size=11)
    a_arr = from_numpy(spark, spd)
    b_arr = from_numpy(spark, b)
    linalg.cholesky(a_arr, nb=6).compute()
    linalg.lu(a_arr, nb=6)
    linalg.solve(a_arr, b_arr).compute()
    linalg.inv(a_arr).compute()


@pytest.mark.slow
def test_cholesky_above_incore_guard(spark):
    """n = 3400 (1.16e7 cells) -- ABOVE the old in-core tier's 1e7-cell
    guard.  A[i,j] = min(i,j) + 1 has the closed-form factor
    L = all-ones lower triangle, so correctness checks by aggregation
    without ever collecting the matrix."""
    from pyspark.sql import functions as F

    from dask_array_spark.core.array import Array
    from dask_array_spark.operators.linalg_blocked import cholesky_blocked

    n = 3400
    left = spark.range(n).select(F.col("id").alias("i0"))
    right = spark.range(n).select(F.col("id").alias("i1"))
    cells = left.crossJoin(right).select(
        "i0", "i1", (F.least("i0", "i1") + 1).cast("double").alias("v")
    )
    L = cholesky_blocked(Array(cells, (n, n)), nb=1024)
    err = (
        L.df.select(F.max(F.abs(F.col("v") - F.lit(1.0))).alias("e"))
        .collect()[0]["e"]
    )
    cnt = L.df.count()
    assert cnt == n * (n + 1) // 2
    assert err < 1e-8


def _count_jobs(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_wavefront_stage_count_is_linear(spark):
    """The cholesky/lu wavefront is structurally sequential over the
    K = ceil(n/nb) block columns (the reference's trade,
    linalg/_cholesky.py:27-214); the CONTRACT is that each step costs
    O(1) eager Spark jobs, so total jobs grow LINEARLY in K with a
    bounded per-step constant.  Pinned so a future edit cannot
    silently make a step quadratic (e.g. re-materializing history) --
    measured as job-count deltas between a K=2 and a K=4 grid of the
    same matrix (K=4 kept the signal of the original K=6 leg at ~60%
    of its wall clock; optimization round 14 suite-time trim)."""
    import numpy as np

    from dask_array_spark.operators import linalg_blocked as LB
    from dask_array_spark.sources import from_numpy

    rng = np.random.default_rng(3)
    m = rng.normal(size=(12, 12))
    spd = m @ m.T + 12 * np.eye(12)

    def chol(nb):
        a = from_numpy(spark, spd)
        LB.cholesky_blocked(a, nb=nb).df.count()

    j2 = _count_jobs(spark, "wf-chol-k2", lambda: chol(6))   # K = 2
    j4 = _count_jobs(spark, "wf-chol-k4", lambda: chol(3))   # K = 4
    per_step = (j4 - j2) / 2.0
    assert per_step >= 0.5, f"expected >=1 job per extra step, got {per_step}"
    assert per_step <= 10, f"per-step job constant blew up: {per_step} (j2={j2}, j4={j4})"

    def lu(nb):
        a = from_numpy(spark, spd)
        p, l, u = LB.lu_blocked(a, nb=nb)
        u.df.count()

    j2 = _count_jobs(spark, "wf-lu-k2", lambda: lu(6))
    j4 = _count_jobs(spark, "wf-lu-k4", lambda: lu(3))
    per_step = (j4 - j2) / 2.0
    assert per_step >= 0.5
    assert per_step <= 14, f"LU per-step job constant blew up: {per_step} (j2={j2}, j4={j4})"


def test_wavefront_step_guard(spark):
    """K > MAX_WAVEFRONT_STEPS must refuse up front (round-7 verdict
    ask 6): a tiny nb on a big matrix would otherwise silently submit
    a ~10^4-stage driver-sequenced plan."""
    import numpy as np
    import pytest as _pt

    from dask_array_spark.core.array import Array
    from dask_array_spark.operators import linalg_blocked as LB
    from pyspark.sql import functions as F

    n = LB.MAX_WAVEFRONT_STEPS + 1  # nb=1 -> K = n > limit
    cells = (
        spark.range(n)
        .select(F.col("id").alias("i0"), F.col("id").alias("i1"),
                F.lit(1.0).alias("v"))
    )
    a = Array(cells, (n, n))
    with _pt.raises(ValueError, match="block-column steps"):
        LB.cholesky_blocked(a, nb=1)
    with _pt.raises(ValueError, match="block-column steps"):
        LB.lu_blocked(a, nb=1)
