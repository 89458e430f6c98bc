"""Element-wise ufunc surface.

Parity: the reference's ufunc table
(/root/reference/dask_array/_ufunc.py:18-141) implemented by the
``Elemwise`` machinery (/root/reference/dask_array/_blockwise.py:837).
Every function here is a JVM-side Catalyst expression -- chains fuse
under whole-stage codegen exactly like the reference's
``FusedBlockwise`` (_blockwise.py:1574); no Python executes per row.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.array import Array, VALUE_COL

__all__ = [
    "sqrt", "cbrt", "exp", "expm1", "log", "log1p", "log2", "log10",
    "square", "sin", "cos", "tan", "arcsin", "arccos", "arctan",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "floor", "ceil", "trunc", "rint", "sign", "absolute", "reciprocal",
    "deg2rad", "rad2deg", "isnull", "notnull", "nan_to_num",
    "logical_not", "where", "maximum", "minimum", "clip",
    "arctan2", "hypot", "logaddexp", "copysign", "fmod", "signbit",
    "digitize_uniform", "elemwise",
]


def _u(fn: Callable[[Column], Column]):
    def apply(a: Array) -> Array:
        return a._unary(fn)

    return apply


sqrt = _u(F.sqrt)
cbrt = _u(F.cbrt)
exp = _u(F.exp)
expm1 = _u(F.expm1)
log = _u(F.log)
log1p = _u(F.log1p)
log2 = _u(F.log2)
log10 = _u(F.log10)
square = _u(lambda c: c * c)
sin = _u(F.sin)
cos = _u(F.cos)
tan = _u(F.tan)
arcsin = _u(F.asin)
arccos = _u(F.acos)
arctan = _u(F.atan)
sinh = _u(F.sinh)
cosh = _u(F.cosh)
tanh = _u(F.tanh)
arcsinh = _u(F.asinh)
arccosh = _u(F.acosh)
arctanh = _u(F.atanh)
floor = _u(lambda c: F.floor(c).cast("double"))
ceil = _u(lambda c: F.ceil(c).cast("double"))
trunc = _u(lambda c: F.when(c < 0, F.ceil(c)).otherwise(F.floor(c)).cast("double"))
rint = _u(lambda c: F.rint(c))
sign = _u(F.signum)
absolute = _u(F.abs)
reciprocal = _u(lambda c: F.lit(1.0) / c)
deg2rad = _u(F.radians)
rad2deg = _u(F.degrees)
isnull = _u(lambda c: c.isNull())
notnull = _u(lambda c: c.isNotNull())
logical_not = _u(lambda c: ~c.cast("boolean"))
signbit = _u(lambda c: c < 0)


def nan_to_num(a: Array, nan: float = 0.0) -> Array:
    """NaN(NULL) -> replacement (reference _ufunc.py:465-485)."""
    return a._unary(lambda c: F.coalesce(c, F.lit(nan)))


def elemwise(fn: Callable[..., Column], *arrays: Array) -> Array:
    """Generic elemwise over aligned arrays (reference
    core/_blockwise_funcs.py ``elemwise``)."""
    out = arrays[0]
    if len(arrays) == 1:
        return out._unary(fn)
    if len(arrays) == 2:
        return out._binary(arrays[1], fn)
    raise NotImplementedError("elemwise >2 inputs: compose binary ops")


def where(cond: Array, x, y) -> Array:
    """Ternary select (reference routines/_where.py:8) == CASE WHEN."""
    if isinstance(x, Array):
        xy = x._binary(y, lambda a, b: F.struct(a.alias("x"), b.alias("y"))) if isinstance(y, Array) else x._unary(lambda c: F.struct(c.alias("x"), F.lit(y).alias("y")))
    else:
        if isinstance(y, Array):
            xy = y._unary(lambda c: F.struct(F.lit(x).alias("x"), c.alias("y")))
        else:
            return cond._unary(lambda c: F.when(c, F.lit(x)).otherwise(F.lit(y)))
    combined = cond._binary(xy, lambda c, s: F.when(c, s["x"]).otherwise(s["y"]))
    return combined


def maximum(a: Array, b) -> Array:
    return a._binary(b, F.greatest)


def minimum(a: Array, b) -> Array:
    return a._binary(b, F.least)


def clip(a: Array, lo, hi) -> Array:
    return a.clip(lo, hi)


def arctan2(a: Array, b) -> Array:
    return a._binary(b, F.atan2)


def hypot(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: F.sqrt(x * x + y * y))


def logaddexp(a: Array, b) -> Array:
    # log(exp(x)+exp(y)) stabilized
    return a._binary(
        b,
        lambda x, y: F.greatest(x, y) + F.log1p(F.exp(-F.abs(x - y))),
    )


def copysign(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: F.when(y < 0, -F.abs(x)).otherwise(F.abs(x)))


def fmod(a: Array, b) -> Array:
    # C fmod: sign of dividend (Spark % already does this)
    return a._binary(b, lambda x, y: x % y)


def digitize_uniform(a: Array, lo: float, hi: float, nbins: int, right: bool = False) -> Array:
    """Uniform-bin digitize via explicit affine arithmetic (reference
    routines/_select.py digitize; SQL-oracle-reproducible, unlike
    engine-specific width_bucket)."""
    c = F.col(VALUE_COL).cast("double")
    raw = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(nbins)).cast("long") + 1
    b = F.when(c < lo, F.lit(0)).when(c >= hi, F.lit(nbins + 1)).otherwise(raw)
    return Array(a.df.select(*a.index_cols, b.cast("long").alias(VALUE_COL)), a.shape)
