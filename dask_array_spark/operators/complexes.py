"""Complex dtype support via STRUCT<re DOUBLE, im DOUBLE> encoding.

Parity: the reference's complex64/128 dtypes and complex ufuncs
(real/imag/conj/angle, /root/reference/dask_array/_ufunc.py:396,
_collection.py:1621-1644).  Spark has no native complex type
(SURVEY.md section 1.4): values encode as a two-field struct and every
operation is a pair of JVM-side field expressions -- fused chains stay
inside whole-stage codegen like any scalar expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = [
    "make_complex",
    "real",
    "imag",
    "conj",
    "angle",
    "cabs",
    "cadd",
    "cmul",
    "iscomplex",
]


def _c(re: Column, im: Column) -> Column:
    return F.struct(re.alias("re"), im.alias("im"))


def make_complex(re: Array, im: Array) -> Array:
    """Pair two aligned real arrays into one complex array (shared
    base -> pure projection, else an index equi-join)."""
    return re._binary(im, lambda r, i: _c(r, i))


def real(a: Array) -> Array:
    return a._unary(lambda c: c["re"])


def imag(a: Array) -> Array:
    return a._unary(lambda c: c["im"])


def conj(a: Array) -> Array:
    return a._unary(lambda c: _c(c["re"], -c["im"]))


def angle(a: Array) -> Array:
    return a._unary(lambda c: F.atan2(c["im"], c["re"]))


def cabs(a: Array) -> Array:
    return a._unary(lambda c: F.sqrt(c["re"] * c["re"] + c["im"] * c["im"]))


def cadd(a: Array, b: Array) -> Array:
    return a._binary(b, lambda x, y: _c(x["re"] + y["re"], x["im"] + y["im"]))


def cmul(a: Array, b: Array) -> Array:
    return a._binary(
        b,
        lambda x, y: _c(
            x["re"] * y["re"] - x["im"] * y["im"],
            x["re"] * y["im"] + x["im"] * y["re"],
        ),
    )


def iscomplex(a: Array) -> Array:
    return a._unary(lambda c: c["im"] != 0)
