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

from ..core.array import Array, VALUE_COL, _ieee_div, _is_neg_zero

__all__ = [
    "sqrt", "cbrt", "exp", "exp2", "expm1", "log", "log1p", "log2", "log10",
    "square", "sin", "cos", "tan", "arcsin", "arccos", "arctan",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "floor", "ceil", "trunc", "fix", "rint", "sign", "absolute", "reciprocal",
    "deg2rad", "rad2deg", "degrees", "radians",
    "isnull", "notnull", "nan_to_num",
    "isnan", "isinf", "isfinite", "isneginf", "isposinf",
    "logical_not", "logical_and", "logical_or", "logical_xor",
    "left_shift", "right_shift",
    "where", "maximum", "minimum", "fmax", "fmin", "clip", "isclose",
    "arctan2", "hypot", "logaddexp", "logaddexp2", "copysign", "fmod",
    "float_power", "ldexp", "sinc", "signbit",
    "divmod_", "modf", "frexp",
    "select", "choose", "piecewise",
    "digitize_uniform", "elemwise", "frompyfunc",
]

_INF = float("inf")


def _u(fn: Callable[[Column], Column]):
    def apply(a: Array) -> Array:
        return a._unary(fn)

    return apply


def _log_like(fn: Callable[[Column], Column], pole: float):
    """Spark's log family returns NULL at the pole (log(0), log1p(-1));
    NumPy returns -inf.  Out-of-domain (negative) stays NULL == NaN."""
    return _u(
        lambda c: F.when(c == F.lit(pole), F.lit(-_INF)).otherwise(fn(c))
    )


sqrt = _u(F.sqrt)
cbrt = _u(F.cbrt)
exp = _u(F.exp)
expm1 = _u(F.expm1)
log = _log_like(F.log, 0.0)
log1p = _log_like(F.log1p, -1.0)
log2 = _log_like(F.log2, 0.0)
log10 = _log_like(F.log10, 0.0)
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
def _already_integral(c: Column) -> Column:
    # |x| >= 2^52 doubles carry no fractional bits; also catches ±inf
    # (Spark's F.floor returns BIGINT, which overflows on both)
    return F.abs(c) >= F.lit(2.0**52)


floor = _u(lambda c: F.when(_already_integral(c), c).otherwise(F.floor(c).cast("double")))
ceil = _u(lambda c: F.when(_already_integral(c), c).otherwise(F.ceil(c).cast("double")))
trunc = _u(
    lambda c: F.when(_already_integral(c), c).otherwise(
        F.when(c < 0, F.ceil(c)).otherwise(F.floor(c)).cast("double")
    )
)
rint = _u(lambda c: F.rint(c))
sign = _u(F.signum)
absolute = _u(F.abs)
reciprocal = _u(lambda c: _ieee_div(F.lit(1.0), c))
deg2rad = _u(F.radians)
rad2deg = _u(F.degrees)
isnull = _u(lambda c: c.isNull())
notnull = _u(lambda c: c.isNotNull())
logical_not = _u(lambda c: ~c.cast("boolean"))
# -0.0 compares == 0 but its sign bit is set; NULL (NaN) -> False like
# np.signbit(nan)
signbit = _u(
    lambda c: F.coalesce((c < 0) | ((c == 0) & _is_neg_zero(c)), F.lit(False))
)
exp2 = _u(lambda c: F.pow(F.lit(2.0), c))
fix = trunc  # NumPy alias: round toward zero
degrees, radians = rad2deg, deg2rad
# NaN encodes as NULL (core contract) but a real double NaN/Inf can
# still arrive from kernels -- cover both
isnan = _u(lambda c: c.isNull() | F.isnan(c))
isinf = _u(lambda c: F.abs(c) == F.lit(_INF))
isposinf = _u(lambda c: c == F.lit(_INF))
isneginf = _u(lambda c: c == F.lit(-_INF))
isfinite = _u(lambda c: c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(_INF)))


def logical_and(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: x.cast("boolean") & y.cast("boolean"))


def logical_or(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: x.cast("boolean") | y.cast("boolean"))


def logical_xor(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: x.cast("boolean") != y.cast("boolean"))


def left_shift(a: Array, b) -> Array:
    """x << y via exact power-of-two multiply (column-valued shift
    amounts; exact while |result| < 2^53)."""
    return a._binary(b, lambda x, y: (x * F.pow(F.lit(2.0), y)).cast("long"))


def right_shift(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: F.floor(x / F.pow(F.lit(2.0), y)).cast("long"))


def nan_to_num(a: Array, nan: float = 0.0) -> Array:
    """NaN(NULL) -> replacement (reference _ufunc.py:465-485)."""
    return a._unary(lambda c: F.coalesce(c, F.lit(nan)))


def elemwise(fn: Callable[..., Column], *arrays: Array) -> Array:
    """Generic elemwise over any number of aligned arrays (reference
    core/_blockwise_funcs.py ``elemwise``).  N > 2 operands fold into
    an accumulating struct of aligned binary joins (shared bases still
    fuse to a single projection), then ``fn`` applies to the unpacked
    fields."""
    out = arrays[0]
    if len(arrays) == 1:
        return out._unary(fn)
    if len(arrays) == 2:
        return out._binary(arrays[1], fn)
    acc = out._unary(lambda c: F.struct(c.alias("f0")))
    for t, arr in enumerate(arrays[1:], start=1):
        acc = acc._binary(
            arr,
            lambda s, c, t=t: F.struct(
                *[s[f"f{j}"].alias(f"f{j}") for j in range(t)], c.alias(f"f{t}")
            ),
        )
    n = len(arrays)
    return acc._unary(lambda s: fn(*[s[f"f{j}"] for j in range(n)]))


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
    """NumPy maximum PROPAGATES NaN (NULL); greatest() would skip it."""
    return a._binary(
        b,
        lambda x, y: F.when(x.isNull() | y.isNull(), F.lit(None)).otherwise(
            F.greatest(x, y)
        ),
    )


def minimum(a: Array, b) -> Array:
    return a._binary(
        b,
        lambda x, y: F.when(x.isNull() | y.isNull(), F.lit(None)).otherwise(
            F.least(x, y)
        ),
    )


def fmax(a: Array, b) -> Array:
    """NaN-SKIPPING max (reference fmax): greatest() skips NULLs."""
    return a._binary(b, F.greatest)


def fmin(a: Array, b) -> Array:
    return a._binary(b, F.least)


def isclose(a: Array, b, rtol: float = 1e-05, atol: float = 1e-08) -> Array:
    return a._binary(
        b, lambda x, y: F.abs(x - y) <= F.lit(atol) + F.lit(rtol) * F.abs(y)
    )


def float_power(a: Array, b) -> Array:
    return a._binary(b, F.pow)


def ldexp(a: Array, b) -> Array:
    return a._binary(b, lambda x, y: x * F.pow(F.lit(2.0), y))


def logaddexp2(a: Array, b) -> Array:
    ln2 = math.log(2.0)
    return a._binary(
        b,
        lambda x, y: (
            F.greatest(x, y)
            + F.log1p(F.exp(-F.abs(x - y) * F.lit(ln2))) / F.lit(ln2)
        ),
    )


def sinc(a: Array) -> Array:
    """sin(pi x)/(pi x), 1 at x=0 (reference _ufunc.py sinc)."""
    pi = math.pi
    return a._unary(
        lambda c: F.when(c == 0, F.lit(1.0)).otherwise(
            F.sin(F.lit(pi) * c) / (F.lit(pi) * c)
        )
    )


# -- multi-output ufuncs (reference DoubleOutputs, _ufunc.py:403-460) ----

def divmod_(a: Array, b) -> tuple[Array, Array]:
    """(floor quotient, remainder) -- one fused projection each over
    the same base; Catalyst dedups the shared subexpressions.  Routed
    through // and % so the npy_divmod IEEE edge cases hold."""
    return a // b, a % b


def modf(a: Array) -> tuple[Array, Array]:
    """(fractional, integral) parts, both carrying the sign of x.
    C99 modf: an already-integral x (incl. ±inf) has fpart ±0."""
    from ..core.array import _copysign_zero

    ipart = trunc(a)
    fpart = a._binary(
        ipart,
        lambda x, i: F.when(_already_integral(x), _copysign_zero(x)).otherwise(x - i),
    )
    return fpart, ipart


def frexp(a: Array) -> tuple[Array, Array]:
    """x = m * 2**e with 0.5 <= |m| < 1 (m=0, e=0 for x=0)."""
    e = a._unary(
        lambda c: F.when(c == 0, F.lit(0)).otherwise(
            F.floor(F.log2(F.abs(c))) + 1
        ).cast("long")
    )
    m = a._binary(e, lambda x, ee: x / F.pow(F.lit(2.0), ee))
    return m, e


def select(condlist, choicelist, default=0.0) -> Array:
    """First matching condition wins (reference routines/_select.py:12)
    == nested CASE WHEN built back-to-front with ``where``."""
    out = default
    for cond, choice in reversed(list(zip(condlist, choicelist))):
        out = where(cond, choice, out)
    return out


def choose(idx: Array, choices) -> Array:
    """choices[idx] elementwise (reference ``choose``): CASE WHEN
    chain over the (small) choice list.  Array choices route through
    ``select`` (aligned-join CASE)."""
    if any(isinstance(ch, Array) for ch in choices):
        conds = [idx == k for k in range(len(choices))]
        return select(conds, list(choices), default=None)

    def build(c: Column) -> Column:
        expr = F.lit(None)
        for k in reversed(range(len(choices))):
            expr = F.when(c == k, F.lit(choices[k])).otherwise(expr)
        return expr

    return idx._unary(build)


def piecewise(x: Array, condlist, funclist) -> Array:
    """numpy.piecewise over Column-expression functions (reference
    routines/_select.py piecewise)."""
    vals = [f(x) if callable(f) else f for f in funclist]
    return select(condlist, vals, default=0.0)


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


def frompyfunc(fn: Callable, otype: str = "double"):
    """Wrap a scalar Python function as an elemwise Array op
    (reference ``frompyfunc``/ufunc wrapper, _ufunc.py:143-189).
    The function runs as an Arrow-batched pandas UDF (vectorized
    transfer, not row-at-a-time); prefer built-in Column expressions
    wherever possible -- this is the explicit slow-path escape
    hatch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _kernel(s):
        return s.map(lambda x: fn(x) if x is not None else None)

    # real (non-string) annotations: `from __future__ import
    # annotations` would otherwise leave pyspark unresolvable strings
    _kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _u = pandas_udf(_kernel, otype)

    def apply(a: Array) -> Array:
        return a._unary(lambda c: _u(c))

    return apply
