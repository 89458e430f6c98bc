"""Random generators: determinism (fixed seed + partitioning ->
identical draws, the reference's per-block bitgen contract,
random/_expr.py:63) and distribution sanity."""

import numpy as np


def test_uniform_normal_determinism_and_moments(spark):
    from dask_array_spark.operators import creation as C

    u1 = C.random_uniform(spark, 50_000, seed=7, numparts=8).compute()
    u2 = C.random_uniform(spark, 50_000, seed=7, numparts=8).compute()
    np.testing.assert_array_equal(u1, u2)
    assert abs(u1.mean() - 0.5) < 0.01 and (0 <= u1).all() and (u1 < 1).all()

    g = C.random_normal(spark, 50_000, seed=7, numparts=8).compute()
    assert abs(g.mean()) < 0.02 and abs(g.std() - 1.0) < 0.02


def test_exponential_lognormal_integers(spark):
    from dask_array_spark.operators import creation as C

    e = C.random_exponential(spark, 50_000, scale=2.0, seed=3, numparts=8).compute()
    assert abs(e.mean() - 2.0) < 0.05 and (e >= 0).all()

    ln = C.random_lognormal(spark, 50_000, seed=3, numparts=8).compute()
    assert abs(np.log(ln).mean()) < 0.02

    ints = C.random_integers(spark, 50_000, 10, 20, seed=3, numparts=8).compute()
    assert ints.min() == 10 and ints.max() == 19


def test_choice_weights(spark):
    from dask_array_spark.operators import creation as C

    x = C.random_choice(
        spark, 60_000, [1.0, 2.0, 3.0], p=[0.5, 0.3, 0.2], seed=11, numparts=8
    ).compute()
    frac = [(x == v).mean() for v in (1.0, 2.0, 3.0)]
    np.testing.assert_allclose(frac, [0.5, 0.3, 0.2], atol=0.02)


def test_permutation_is_valid(spark):
    from dask_array_spark.operators import creation as C

    p = C.random_permutation(spark, 5_000, seed=5).compute()
    np.testing.assert_array_equal(np.sort(p), np.arange(5_000))
    assert not np.array_equal(p, np.arange(5_000))  # actually shuffled


def test_poisson_per_partition_bitgen(spark):
    from dask_array_spark.operators import creation as C

    x1 = C.random_poisson(spark, 40_000, lam=4.0, seed=9, numparts=8).compute()
    x2 = C.random_poisson(spark, 40_000, lam=4.0, seed=9, numparts=8).compute()
    np.testing.assert_array_equal(x1, x2)
    assert abs(x1.mean() - 4.0) < 0.1 and abs(x1.var() - 4.0) < 0.2
