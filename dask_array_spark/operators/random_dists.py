"""Full random-distribution family (reference
/root/reference/dask_array/random/_generator.py:16-349).

Two tiers, mirroring the reference's per-block bit-generator spawning
(random/_expr.py:63 -- block i seeds ``seed + i``; here the block IS
the Spark partition):

- **JVM tier**: distributions with a closed-form inverse CDF or a
  simple transform of uniform/normal draws compile to pure Catalyst
  expressions over ``F.rand(seed)`` / ``F.randn(seed)`` -- whole-stage
  codegen, no Python in the path.
- **NumPy tier**: everything else (beta, gamma, binomial, ...) runs
  ``np.random.default_rng(seed + partition_id).<dist>`` inside an
  Arrow-batched mapInPandas -- one map-only stage, deterministic for a
  fixed partitioning, linear at any scale.

Every draw is lazy and partition-parallel; nothing touches the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array
from .creation import _range1d

__all__ = ["Generator", "default_rng"]


def _jvm_dist(spark, n, seed, numparts, expr_fn) -> Array:
    d = _range1d(spark, n, numparts).withColumn("__u", F.rand(seed))
    return Array(d.select("i0", expr_fn(F.col("__u")).alias(VALUE_COL)), (n,))


def _np_dist(spark, n, seed, numparts, method, kwargs, integer=False) -> Array:
    from pyspark import TaskContext

    d = _range1d(spark, n, numparts)
    out_type = "long" if integer else "double"

    def gen(it):
        import numpy as np

        pid = TaskContext.get().partitionId()
        rng = np.random.default_rng(seed + pid)
        for pdf in it:
            pdf = pdf.copy()
            vals = getattr(rng, method)(size=len(pdf), **kwargs)
            pdf[VALUE_COL] = vals.astype("int64" if integer else "float64")
            yield pdf

    return Array(d.mapInPandas(gen, schema=f"i0 long, {VALUE_COL} {out_type}"), (n,))


class Generator:
    """Distribution surface of the reference's ``default_rng``
    generator, parameterized by a SparkSession and a base seed."""

    def __init__(self, spark: SparkSession, seed: int = 42):
        self.spark = spark
        self.seed = int(seed)

    # -- base draws (JVM) --------------------------------------------------
    def random(self, n, numparts=None):
        return _jvm_dist(self.spark, n, self.seed, numparts, lambda u: u)

    def uniform(self, n, low=0.0, high=1.0, numparts=None):
        lo, hi = float(low), float(high)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.lit(lo) + u * F.lit(hi - lo),
        )

    def standard_normal(self, n, numparts=None):
        d = _range1d(self.spark, n, numparts)
        return Array(d.withColumn(VALUE_COL, F.randn(self.seed)), (n,))

    def normal(self, n, loc=0.0, scale=1.0, numparts=None):
        d = _range1d(self.spark, n, numparts)
        return Array(
            d.withColumn(
                VALUE_COL, F.lit(float(loc)) + F.lit(float(scale)) * F.randn(self.seed)
            ),
            (n,),
        )

    # -- inverse-CDF / transform tier (JVM) --------------------------------
    def exponential(self, n, scale=1.0, numparts=None):
        s = float(scale)
        return _jvm_dist(
            self.spark, n, self.seed, numparts, lambda u: -F.lit(s) * F.log1p(-u)
        )

    def standard_exponential(self, n, numparts=None):
        return self.exponential(n, 1.0, numparts)

    def gumbel(self, n, loc=0.0, scale=1.0, numparts=None):
        lo, s = float(loc), float(scale)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.lit(lo) - F.lit(s) * F.log(-F.log(u)),
        )

    def logistic(self, n, loc=0.0, scale=1.0, numparts=None):
        lo, s = float(loc), float(scale)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.lit(lo) + F.lit(s) * F.log(u / (F.lit(1.0) - u)),
        )

    def laplace(self, n, loc=0.0, scale=1.0, numparts=None):
        lo, s = float(loc), float(scale)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.lit(lo)
            - F.lit(s)
            * F.signum(u - F.lit(0.5))
            * F.log1p(-F.lit(2.0) * F.abs(u - F.lit(0.5))),
        )

    def pareto(self, n, a, numparts=None):
        inv_a = 1.0 / float(a)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.pow(F.lit(1.0) - u, F.lit(-inv_a)) - F.lit(1.0),
        )

    def power(self, n, a, numparts=None):
        inv_a = 1.0 / float(a)
        return _jvm_dist(
            self.spark, n, self.seed, numparts, lambda u: F.pow(u, F.lit(inv_a))
        )

    def rayleigh(self, n, scale=1.0, numparts=None):
        s = float(scale)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.lit(s) * F.sqrt(F.lit(-2.0) * F.log1p(-u)),
        )

    def weibull(self, n, a, numparts=None):
        inv_a = 1.0 / float(a)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.pow(-F.log1p(-u), F.lit(inv_a)),
        )

    def standard_cauchy(self, n, numparts=None):
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.tan(F.lit(math.pi) * (u - F.lit(0.5))),
        )

    def triangular(self, n, left, mode, right, numparts=None):
        l, m, r = float(left), float(mode), float(right)
        fc = (m - l) / (r - l)

        def expr(u):
            lo = F.lit(l) + F.sqrt(u * F.lit((r - l) * (m - l)))
            hi = F.lit(r) - F.sqrt((F.lit(1.0) - u) * F.lit((r - l) * (r - m)))
            return F.when(u < F.lit(fc), lo).otherwise(hi)

        return _jvm_dist(self.spark, n, self.seed, numparts, expr)

    def geometric(self, n, p, numparts=None):
        lp = math.log1p(-float(p))
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.log1p(-u) / F.lit(lp)).cast("long"),
            ),
        )

    def lognormal(self, n, mean=0.0, sigma=1.0, numparts=None):
        d = _range1d(self.spark, n, numparts)
        return Array(
            d.withColumn(
                VALUE_COL,
                F.exp(F.lit(float(mean)) + F.lit(float(sigma)) * F.randn(self.seed)),
            ),
            (n,),
        )

    def integers(self, n, low, high, numparts=None):
        lo, hi = int(low), int(high)
        return _jvm_dist(
            self.spark, n, self.seed, numparts,
            lambda u: (F.floor(u * F.lit(hi - lo)) + F.lit(lo)).cast("long"),
        )

    # -- NumPy bitgen tier -------------------------------------------------
    def beta(self, n, a, b, numparts=None):
        return _np_dist(self.spark, n, self.seed, numparts, "beta", {"a": a, "b": b})

    def gamma(self, n, shape, scale=1.0, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "gamma",
            {"shape": shape, "scale": scale},
        )

    def standard_gamma(self, n, shape, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "standard_gamma", {"shape": shape}
        )

    def chisquare(self, n, df, numparts=None):
        return _np_dist(self.spark, n, self.seed, numparts, "chisquare", {"df": df})

    def noncentral_chisquare(self, n, df, nonc, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "noncentral_chisquare",
            {"df": df, "nonc": nonc},
        )

    def f(self, n, dfnum, dfden, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "f", {"dfnum": dfnum, "dfden": dfden}
        )

    def noncentral_f(self, n, dfnum, dfden, nonc, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "noncentral_f",
            {"dfnum": dfnum, "dfden": dfden, "nonc": nonc},
        )

    def standard_t(self, n, df, numparts=None):
        return _np_dist(self.spark, n, self.seed, numparts, "standard_t", {"df": df})

    def binomial(self, n, nt, p, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "binomial", {"n": nt, "p": p},
            integer=True,
        )

    def negative_binomial(self, n, nt, p, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "negative_binomial",
            {"n": nt, "p": p}, integer=True,
        )

    def poisson(self, n, lam=1.0, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "poisson", {"lam": lam}, integer=True
        )

    def hypergeometric(self, n, ngood, nbad, nsample, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "hypergeometric",
            {"ngood": ngood, "nbad": nbad, "nsample": nsample}, integer=True,
        )

    def logseries(self, n, p, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "logseries", {"p": p}, integer=True
        )

    def zipf(self, n, a, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "zipf", {"a": a}, integer=True
        )

    def vonmises(self, n, mu, kappa, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "vonmises", {"mu": mu, "kappa": kappa}
        )

    def wald(self, n, mean, scale, numparts=None):
        return _np_dist(
            self.spark, n, self.seed, numparts, "wald", {"mean": mean, "scale": scale}
        )

    # -- structural draws (delegates) --------------------------------------
    def choice(self, n, values, p=None, numparts=None):
        from .creation import random_choice

        return random_choice(self.spark, n, values, p=p, seed=self.seed, numparts=numparts)

    def permutation(self, n):
        from .creation import random_permutation

        return random_permutation(self.spark, n, seed=self.seed)


def default_rng(spark: SparkSession, seed: int = 42) -> Generator:
    """Reference entry point (random/_generator.py:349)."""
    return Generator(spark, seed)
