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

__all__ = ["Generator", "RandomState", "default_rng"]


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


def _np_vec_dist(spark, n, seed, numparts, method, kwargs, width) -> Array:
    """Vector-valued NumPy draw -> 2-d cell form: draw i0 emits
    ``width`` cells (i0, i1, v), the reference's extra_chunks
    convention (random/_generator.py:222 multinomial adds a trailing
    (len(pvals),) axis).  Same per-partition seeding as _np_dist."""
    from pyspark import TaskContext

    d = _range1d(spark, n, numparts)

    def gen(it):
        import numpy as np
        import pandas as pd

        pid = TaskContext.get().partitionId()
        rng = np.random.default_rng(seed + pid)
        for pdf in it:
            m = len(pdf)
            vals = getattr(rng, method)(size=m, **kwargs)
            yield pd.DataFrame(
                {
                    "i0": np.repeat(
                        pdf["i0"].to_numpy(dtype="int64"), width
                    ),
                    "i1": np.tile(np.arange(width, dtype="int64"), m),
                    VALUE_COL: np.asarray(vals, dtype="int64").reshape(-1),
                }
            )

    return Array(
        d.mapInPandas(gen, schema=f"i0 long, i1 long, {VALUE_COL} long"),
        (n, width),
    )


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

    # -- vector-valued draws (trailing category axis) ----------------------
    def multinomial(self, n, nt, pvals, numparts=None):
        """``n`` draws of ``nt`` trials over ``len(pvals)`` categories
        -> shape (n, len(pvals)) int64, rows summing to ``nt``
        (reference random/_generator.py:222; the trailing axis is its
        ``extra_chunks=((len(pvals),),)``)."""
        pvals = [float(p) for p in pvals]
        if any(p < 0 for p in pvals) or abs(sum(pvals) - 1.0) > 1e-9:
            raise ValueError("pvals must be non-negative and sum to 1")
        return _np_vec_dist(
            self.spark, n, self.seed, numparts, "multinomial",
            {"n": int(nt), "pvals": pvals}, width=len(pvals),
        )

    def multivariate_hypergeometric(
        self, n, colors, nsample, method="marginals", numparts=None
    ):
        """``n`` draws of ``nsample`` balls from an urn with
        ``colors[i]`` balls of color i, without replacement -> shape
        (n, len(colors)) int64, rows summing to ``nsample``
        (reference random/_generator.py:235)."""
        colors = [int(c) for c in colors]
        if any(c < 0 for c in colors):
            raise ValueError("colors must be non-negative counts")
        if not 0 <= int(nsample) <= sum(colors):
            raise ValueError("nsample must be in [0, sum(colors)]")
        return _np_vec_dist(
            self.spark, n, self.seed, numparts,
            "multivariate_hypergeometric",
            {"colors": colors, "nsample": int(nsample), "method": method},
            width=len(colors),
        )


class RandomState:
    """Legacy ``RandomState`` surface (reference random/__init__.py:6,
    random/_random_state.py): a thin delegate over ``Generator`` with
    the legacy method names, kept -- as in the reference -- only so
    legacy call sites port verbatim; new code should use
    ``default_rng``.  Draws come from the modern bit-generator tier,
    so legacy MT19937 bit-streams are NOT reproduced -- the module's
    uniform policy is moment contracts, never bit-identical streams
    (every executor reseeds per partition)."""

    def __init__(self, spark: SparkSession, seed: int = 42):
        self._gen = Generator(spark, seed)

    def seed(self, seed) -> None:
        self._gen = Generator(self._gen.spark, int(seed))

    def random_sample(self, n, numparts=None):
        return self._gen.random(n, numparts)

    random = random_sample

    def randint(self, n, low, high=None, numparts=None):
        # legacy exclusive-high randint; randint(n, low) draws [0, low)
        # when high is None
        lo, hi = (0, low) if high is None else (low, high)
        return self._gen.integers(n, lo, hi, numparts)

    def random_integers(self, n, low, high, numparts=None):
        # legacy INCLUSIVE upper bound
        return self._gen.integers(n, low, int(high) + 1, numparts)

    def __getattr__(self, name):
        # every shared distribution name delegates unchanged
        return getattr(self._gen, name)


def default_rng(spark: SparkSession, seed: int = 42) -> Generator:
    """Reference entry point (random/_generator.py:349)."""
    return Generator(spark, seed)
