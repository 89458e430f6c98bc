"""Namespace alias tail: the reference's remaining public names
(reference __init__.py:263-562 pins 298 names in ``__all__``; the
round-5 audit found 53 of them without a same-name public callable
here).  Almost all are one-line spellings of operators that already
exist -- Array dunders (``add``/``equal``/``mod``/...), bitwise
dunders, numpy dtype names and constants, and the
``ufunc``/``gufunc``/``as_gufunc`` wrapper forms of
frompyfunc/apply_gufunc (reference _ufunc.py:189, _gufunc.py:544,707)
-- plus three genuinely-new small ufuncs: ``nextafter``/``spacing``
(float-ULP ops, reference _ufunc.py:363-364) and ``i0`` (modified
Bessel, reference _ufunc.py:390), implemented as Arrow-batched
vectorized pandas UDFs over the numpy kernels (no JVM equivalent
exists; these are deliberate slow-path escape hatches, documented as
such, never in a hot loop of this package).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..core.array import VALUE_COL, Array
from ..core.blocks import apply_gufunc
from . import complexes as _cx
from .elemwise import absolute, divmod_

__all__ = [
    "abs",
    "add",
    "as_gufunc",
    "bitwise_and",
    "bitwise_not",
    "bitwise_or",
    "bitwise_xor",
    "bool",
    "complex64",
    "complex128",
    "conjugate",
    "divide",
    "divmod",
    "e",
    "equal",
    "euler_gamma",
    "fabs",
    "float32",
    "float64",
    "floor_divide",
    "greater",
    "greater_equal",
    "gufunc",
    "i0",
    "inf",
    "int8",
    "int16",
    "int32",
    "int64",
    "invert",
    "isreal",
    "less",
    "less_equal",
    "mod",
    "multiply",
    "nan",
    "negative",
    "newaxis",
    "nextafter",
    "not_equal",
    "optimize",
    "pi",
    "positive",
    "power",
    "remainder",
    "spacing",
    "subtract",
    "true_divide",
    "ufunc",
    "uint8",
    "uint16",
    "uint32",
    "uint64",
]


# -- binary arithmetic / comparison / bitwise aliases ---------------------
# Each dispatches through the Array dunders (core/array.py:160-243),
# which already handle scalar literals, reflected forms, the fused
# same-base projection path, and index-aligned broadcasting -- so
# ``da.add(2, x)`` and ``da.add(x, y)`` both produce the exact plan
# ``2 + x`` / ``x + y`` would.

def add(a, b):
    return a + b


def subtract(a, b):
    return a - b


def multiply(a, b):
    return a * b


def divide(a, b):
    return a / b


true_divide = divide


def floor_divide(a, b):
    return a // b


def mod(a, b):
    return a % b


remainder = mod


def power(a, b):
    return a ** b


def equal(a, b):
    return a == b


def not_equal(a, b):
    return a != b


def greater(a, b):
    return a > b


def greater_equal(a, b):
    return a >= b


def less(a, b):
    return a < b


def less_equal(a, b):
    return a <= b


def _is_bool(a: Array) -> bool:
    from pyspark.sql.types import BooleanType

    return isinstance(a.df.schema[VALUE_COL].dataType, BooleanType)


def _bitop(a, b, col_op, dunder):
    """numpy bitwise semantics: logical on boolean arrays, true
    bitwise on integer arrays (Spark's Column ``&``/``|``/``^`` are
    boolean-only; integers need bitwiseAND/OR/XOR).  All three ops are
    commutative, so the scalar-first form just swaps."""
    x, y = (a, b) if isinstance(a, Array) else (b, a)
    if _is_bool(x):
        return dunder(a, b)
    return x._binary(y, lambda p, q: col_op(p, q))


def bitwise_and(a, b):
    return _bitop(a, b, lambda p, q: p.bitwiseAND(q), lambda p, q: p & q)


def bitwise_or(a, b):
    return _bitop(a, b, lambda p, q: p.bitwiseOR(q), lambda p, q: p | q)


def bitwise_xor(a, b):
    return _bitop(a, b, lambda p, q: p.bitwiseXOR(q), lambda p, q: p ^ q)


def invert(a):
    if _is_bool(a):
        return ~a
    return a._unary(lambda c: F.bitwise_not(c))


bitwise_not = invert


def negative(a):
    return -a


def positive(a):
    return +a


abs = absolute  # noqa: A001
fabs = absolute
divmod = divmod_  # noqa: A001


def _is_complex(a: Array) -> bool:
    return isinstance(a.df.schema[VALUE_COL].dataType, StructType)


def conjugate(a):
    """np.conjugate: negate the imaginary part of a complex array
    (STRUCT<re,im> encoding, complexes.py); identity on real arrays."""
    if isinstance(a, Array) and _is_complex(a):
        return _cx.conj(a)
    if isinstance(a, Array):
        return a
    return np.conjugate(a)


def isreal(a: Array) -> Array:
    """np.isreal: im == 0 for complex-encoded arrays, all-True for
    real ones (reference _ufunc.py:385)."""
    if _is_complex(a):
        return a._unary(lambda c: c["im"] == 0)
    return a._unary(lambda c: F.lit(True))


# -- float-ULP / Bessel ufuncs (vectorized pandas UDF slow path) ----------

def _np_udf(np_fn, nin: int):
    """Arrow-batched pandas UDF over a numpy kernel.  Vectorized --
    one numpy call per Arrow batch, never per-row Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if nin == 1:
        def _k(s):
            return pd.Series(np_fn(s.to_numpy(dtype="float64")))

        _k.__annotations__ = {"s": pd.Series, "return": pd.Series}
    else:
        def _k(s, t):
            return pd.Series(
                np_fn(s.to_numpy(dtype="float64"), t.to_numpy(dtype="float64"))
            )

        _k.__annotations__ = {"s": pd.Series, "t": pd.Series, "return": pd.Series}
    return pandas_udf(_k, "double")


def nextafter(a: Array, b) -> Array:
    """Next representable float64 after ``a`` toward ``b`` (reference
    _ufunc.py:363).  No JVM bit-reinterpret exists for doubles, so this
    is a vectorized np.nextafter over Arrow batches."""
    u = _np_udf(np.nextafter, 2)
    return a._binary(b, lambda x, y: u(x.cast("double"), y.cast("double")))


def spacing(a: Array) -> Array:
    """Distance to the next representable float64 (reference
    _ufunc.py:364); vectorized np.spacing over Arrow batches."""
    u = _np_udf(np.spacing, 1)
    return a._unary(lambda c: u(c.cast("double")))


def i0(a: Array) -> Array:
    """Modified Bessel function of order 0 (reference _ufunc.py:390);
    vectorized np.i0 over Arrow batches."""
    u = _np_udf(np.i0, 1)
    return a._unary(lambda c: u(c.cast("double")))


# -- ufunc / gufunc wrapper forms -----------------------------------------

class ufunc:
    """Callable wrapper giving this package's elemwise operators the
    reference's ``da.ufunc`` surface (reference _ufunc.py:189-240):
    ``nin``/``nout`` metadata, plain ``__call__`` forwarding, and
    ``outer`` for binary ops via expand_dims broadcasting (the outer
    product is one index-aligned broadcast join, no cross join)."""

    def __init__(self, fn, nin: int | None = None, name: str | None = None):
        self._fn = fn
        self.__name__ = name or getattr(fn, "__name__", "ufunc")
        if nin is None:
            import inspect

            try:
                params = [
                    p
                    for p in inspect.signature(fn).parameters.values()
                    if p.default is inspect.Parameter.empty
                    and p.kind
                    in (
                        inspect.Parameter.POSITIONAL_ONLY,
                        inspect.Parameter.POSITIONAL_OR_KEYWORD,
                    )
                ]
                nin = len(params) or 1
            except (TypeError, ValueError):
                nin = 1
        self.nin = nin
        self.nout = 1
        self.nargs = self.nin + 1

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)

    def outer(self, a: Array, b: Array):
        if self.nin != 2:
            raise ValueError("outer product only supported for binary functions")
        from .manipulation import expand_dims

        return self._fn(expand_dims(a, 1), expand_dims(b, 0))

    def __repr__(self):
        return f"<ufunc '{self.__name__}'>"


class gufunc:
    """Bound generalized-ufunc: wraps a Python kernel + signature so it
    can be applied repeatedly (reference _gufunc.py:544-705).  Each call
    delegates to apply_gufunc (core/blocks.py:240), which runs the
    kernel as one groupBy(loop dims).applyInPandas."""

    def __init__(self, pyfunc, *, signature: str | None = None, **kwargs):
        if signature is None:
            raise ValueError("gufunc requires a signature, e.g. '(i),(i)->()'")
        self.pyfunc = pyfunc
        self.signature = signature
        self.__name__ = getattr(pyfunc, "__name__", "gufunc")

    def __call__(self, *arrays):
        return apply_gufunc(self.pyfunc, self.signature, *arrays)

    def __repr__(self):
        return f"<gufunc '{self.__name__}' {self.signature}>"


def as_gufunc(signature: str | None = None, **kwargs):
    """Decorator form: ``@da.as_gufunc("(i)->()")`` (reference
    _gufunc.py:707)."""

    def _wrap(pyfunc):
        return gufunc(pyfunc, signature=signature, **kwargs)

    return _wrap


def optimize(dsk, keys=None, **kwargs):
    """Parity no-op (reference __init__.py:219-230).  The reference
    optimizes its Array expressions here; in this package every Array
    IS a lazy DataFrame plan that Catalyst optimizes at action time,
    so the collection passes through unchanged."""
    return dsk


# -- constants and dtype names (reference __init__.py:233-253) ------------

newaxis = None
nan = np.nan
inf = np.inf
e = np.e
pi = np.pi
euler_gamma = np.euler_gamma

bool = np.bool_  # noqa: A001  (numpy<2 has no np.bool alias)
int8 = np.int8
int16 = np.int16
int32 = np.int32
int64 = np.int64
uint8 = np.uint8
uint16 = np.uint16
uint32 = np.uint32
uint64 = np.uint64
float32 = np.float32
float64 = np.float64
complex64 = np.complex64
complex128 = np.complex128
