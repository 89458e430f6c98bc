"""``da.random`` namespace parity (reference ``dask_array.random``
re-exports the Generator surface as module-level functions,
random/_generator.py:349).  Every function takes a SparkSession first
-- draws are distributed jobs, not local samples -- and delegates to
the seeded :class:`~dask_array_spark.operators.random_dists.Generator`
(inverse-CDF tier compiles to Catalyst expressions; heavy-tail
distributions run as seeded per-partition NumPy bitgens)."""

from __future__ import annotations

from .operators.random_dists import Generator, default_rng  # noqa: F401

__all__ = [
    "Generator",
    "default_rng",
    "random",
    "uniform",
    "standard_normal",
    "normal",
    "exponential",
    "lognormal",
    "poisson",
    "integers",
    "randint",
    "choice",
    "permutation",
    "binomial",
    "gamma",
    "beta",
    "chisquare",
]


def _rng(spark, seed):
    return default_rng(spark, seed)


def random(spark, n, seed=42, numparts=None):
    return _rng(spark, seed).random(n, numparts)


def uniform(spark, n, low=0.0, high=1.0, seed=42, numparts=None):
    return _rng(spark, seed).uniform(n, low, high, numparts)


def standard_normal(spark, n, seed=42, numparts=None):
    return _rng(spark, seed).standard_normal(n, numparts)


def normal(spark, n, loc=0.0, scale=1.0, seed=42, numparts=None):
    return _rng(spark, seed).normal(n, loc, scale, numparts)


def exponential(spark, n, scale=1.0, seed=42, numparts=None):
    return _rng(spark, seed).exponential(n, scale, numparts)


def lognormal(spark, n, mean=0.0, sigma=1.0, seed=42, numparts=None):
    return _rng(spark, seed).lognormal(n, mean, sigma, numparts)


def poisson(spark, n, lam=1.0, seed=42, numparts=None):
    return _rng(spark, seed).poisson(n, lam, numparts)


def integers(spark, n, low, high, seed=42, numparts=None):
    return _rng(spark, seed).integers(n, low, high, numparts)


randint = integers  # legacy numpy spelling


def choice(spark, n, values, p=None, seed=42, numparts=None):
    return _rng(spark, seed).choice(n, values, p, numparts)


def permutation(spark, n, seed=42):
    return _rng(spark, seed).permutation(n)


def binomial(spark, n, nt, p, seed=42, numparts=None):
    return _rng(spark, seed).binomial(n, nt, p, numparts)


def gamma(spark, n, shape, scale=1.0, seed=42, numparts=None):
    return _rng(spark, seed).gamma(n, shape, scale, numparts)


def beta(spark, n, a, b, seed=42, numparts=None):
    return _rng(spark, seed).beta(n, a, b, numparts)


def chisquare(spark, n, df, seed=42, numparts=None):
    return _rng(spark, seed).chisquare(n, df, numparts)
