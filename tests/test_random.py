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


# --- full distribution family (reference random/_generator.py:16-349) ----


def _mv(arr):
    import numpy as np

    v = arr.compute()
    return float(np.mean(v)), float(np.var(v))


def test_jvm_tier_moments(spark):
    """Closed-form inverse-CDF tier: sample mean/var within 5 sigma of
    theory at n = 40k (seeded -> deterministic, not flaky)."""
    import math

    from dask_array_spark.operators.random_dists import default_rng

    n = 40_000
    rng = default_rng(spark, seed=7)
    cases = [
        (rng.uniform(n, 2.0, 6.0), 4.0, 16.0 / 12),
        (rng.exponential(n, 2.0), 2.0, 4.0),
        (rng.gumbel(n, 0.0, 1.0), 0.5772156649, math.pi**2 / 6),
        (rng.logistic(n, 0.0, 1.0), 0.0, math.pi**2 / 3),
        (rng.laplace(n, 1.0, 2.0), 1.0, 8.0),
        (rng.rayleigh(n, 1.0), math.sqrt(math.pi / 2), (4 - math.pi) / 2),
        (rng.weibull(n, 2.0), math.gamma(1.5), math.gamma(2.0) - math.gamma(1.5) ** 2),
        (rng.power(n, 3.0), 0.75, 3.0 / 80),
        (rng.triangular(n, 0.0, 1.0, 4.0), 5.0 / 3, (16 + 1 + 4 - 4 - 4 - 1) / 18),
        (rng.geometric(n, 0.25), 4.0, 12.0),
    ]
    for arr, mu, var in cases:
        m, v = _mv(arr)
        tol_m = 5 * math.sqrt(var / n)
        assert abs(m - mu) < tol_m, (m, mu, tol_m)
        assert abs(v - var) < 0.15 * var + tol_m, (v, var)


def test_numpy_tier_moments(spark):
    import math

    from dask_array_spark.operators.random_dists import default_rng

    n = 40_000
    rng = default_rng(spark, seed=11)
    cases = [
        (rng.beta(n, 2.0, 5.0), 2 / 7, 10 / (49 * 8)),
        (rng.gamma(n, 3.0, 2.0), 6.0, 12.0),
        (rng.chisquare(n, 4.0), 4.0, 8.0),
        (rng.standard_t(n, 10.0), 0.0, 10 / 8),
        (rng.binomial(n, 20, 0.3), 6.0, 4.2),
        (rng.negative_binomial(n, 5, 0.5), 5.0, 10.0),
        (rng.f(n, 10.0, 20.0), 20 / 18, None),
        (rng.wald(n, 2.0, 4.0), 2.0, 2.0),
    ]
    for arr, mu, var in cases:
        m, v = _mv(arr)
        sd = math.sqrt(var) if var else max(abs(mu), 1.0)
        assert abs(m - mu) < 5 * sd / math.sqrt(n) + 0.02 * max(abs(mu), 1), (m, mu)
        if var is not None:
            assert abs(v - var) < 0.15 * var + 5 * sd / math.sqrt(n), (v, var)


def test_dist_support_bounds(spark):
    import numpy as np

    from dask_array_spark.operators.random_dists import default_rng

    n = 5_000
    rng = default_rng(spark, seed=3)
    assert np.all(rng.beta(n, 2, 2).compute() <= 1.0)
    assert np.all(rng.power(n, 2).compute() <= 1.0)
    assert np.all(rng.pareto(n, 3).compute() >= 0.0)
    assert np.all(rng.geometric(n, 0.5).compute() >= 1)
    z = rng.zipf(n, 3.0).compute()
    assert np.all(z >= 1)
    tri = rng.triangular(n, 1.0, 2.0, 5.0).compute()
    assert tri.min() >= 1.0 and tri.max() <= 5.0


def test_dist_deterministic_per_seed(spark):
    import numpy as np

    from dask_array_spark.operators.random_dists import default_rng

    a = default_rng(spark, seed=5).gamma(2_000, 2.0, numparts=4).compute()
    b = default_rng(spark, seed=5).gamma(2_000, 2.0, numparts=4).compute()
    c = default_rng(spark, seed=6).gamma(2_000, 2.0, numparts=4).compute()
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_multinomial_invariants(spark):
    """Rows sum to nt exactly; category means track pvals; fixed seed
    + partitioning reproduces; shape is (n, len(pvals))."""
    from dask_array_spark.operators.random_dists import default_rng

    rng = default_rng(spark, seed=9)
    pvals = [0.5, 0.3, 0.2]
    a = rng.multinomial(4_000, 20, pvals, numparts=8)
    assert a.shape == (4_000, 3)
    x = a.compute()
    assert x.dtype == np.int64 and (x >= 0).all()
    np.testing.assert_array_equal(x.sum(axis=1), np.full(4_000, 20))
    np.testing.assert_allclose(x.mean(axis=0) / 20.0, pvals, atol=0.02)
    x2 = default_rng(spark, seed=9).multinomial(
        4_000, 20, pvals, numparts=8
    ).compute()
    np.testing.assert_array_equal(x, x2)
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        rng.multinomial(10, 5, [0.5, 0.2])


def test_multivariate_hypergeometric_invariants(spark):
    """Rows sum to nsample; per-color draws never exceed the urn; the
    marginal mean is nsample * colors_i / total."""
    from dask_array_spark.operators.random_dists import default_rng

    rng = default_rng(spark, seed=17)
    colors = [30, 20, 10]
    a = rng.multivariate_hypergeometric(4_000, colors, 12, numparts=8)
    assert a.shape == (4_000, 3)
    x = a.compute()
    np.testing.assert_array_equal(x.sum(axis=1), np.full(4_000, 12))
    assert (x >= 0).all() and (x <= np.array(colors)).all()
    np.testing.assert_allclose(
        x.mean(axis=0), 12 * np.array(colors) / 60.0, atol=0.15
    )
    import pytest

    with pytest.raises(ValueError, match="nsample"):
        rng.multivariate_hypergeometric(10, colors, 61)


def test_randomstate_legacy_shim(spark):
    """RandomState delegates to the Generator tier: legacy names map
    (random_sample, randint exclusive-high, random_integers
    inclusive-high), seed() rebases, shared names pass through."""
    from dask_array_spark.operators.random_dists import RandomState

    rs = RandomState(spark, seed=3)
    u = rs.random_sample(20_000, numparts=4).compute()
    assert abs(u.mean() - 0.5) < 0.02 and (0 <= u).all() and (u < 1).all()

    ri = rs.randint(20_000, 5, 9, numparts=4).compute()
    assert ri.min() == 5 and ri.max() == 8  # exclusive high
    rii = rs.random_integers(20_000, 5, 8, numparts=4).compute()
    assert rii.min() == 5 and rii.max() == 8  # inclusive high

    # shared distribution name delegates unchanged
    po = rs.poisson(20_000, lam=4.0, numparts=4).compute()
    assert abs(po.mean() - 4.0) < 0.1

    # seed() rebases the stream deterministically
    rs.seed(3)
    np.testing.assert_array_equal(
        rs.random_sample(20_000, numparts=4).compute(), u
    )
    rs.seed(4)
    assert not np.array_equal(
        rs.random_sample(20_000, numparts=4).compute(), u
    )


def test_random_surface_covers_reference_exports(spark):
    """Every distribution the reference exports at module level
    (reference random/__init__.py __all__) resolves on the engine's
    RandomState shim, and the Generator tier has the full
    _generator.py distribution surface including the round-12
    vector-valued tail (multinomial / multivariate_hypergeometric)."""
    from dask_array_spark.operators.random_dists import (
        Generator,
        RandomState,
    )

    legacy = [
        "seed", "beta", "binomial", "chisquare", "choice", "exponential",
        "f", "gamma", "geometric", "gumbel", "hypergeometric", "laplace",
        "logistic", "lognormal", "logseries", "multinomial",
        "negative_binomial", "noncentral_chisquare", "noncentral_f",
        "normal", "pareto", "permutation", "poisson", "power",
        "random_sample", "random", "randint", "random_integers",
        "rayleigh", "standard_cauchy", "standard_exponential",
        "standard_gamma", "standard_normal", "standard_t", "triangular",
        "uniform", "vonmises", "wald", "weibull", "zipf",
    ]
    rs = RandomState(spark, seed=1)
    missing = [n for n in legacy if not callable(getattr(rs, n, None))]
    assert not missing, f"RandomState lacks legacy names: {missing}"

    gen_names = [
        "random", "integers", "multinomial", "multivariate_hypergeometric",
    ]
    g = Generator(spark, seed=1)
    assert all(callable(getattr(g, n, None)) for n in gen_names)
