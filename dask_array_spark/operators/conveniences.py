"""NumPy-convenience aliases: the ~20 names a porting user types daily
(VERDICT r3 missing item 2; reference stacking/_simple.py:6-60,
manipulation/_flip.py:41-76, creation/_ones_zeros.py,
routines/_broadcast.py:80, routines/_nonzero.py:55).

Every function here is a thin dispatch onto an existing operator --
no new execution machinery, no new shuffle shapes.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array
from . import creation as CR
from . import manipulation as M
from .elemwise import isclose
from .reductions import all_, quantile, quantiles
from .slicing import nonzero

__all__ = [
    "allclose",
    "asanyarray",
    "asarray",
    "broadcast_arrays",
    "dstack",
    "empty_like",
    "flatnonzero",
    "fliplr",
    "flipud",
    "full_like",
    "hstack",
    "iscomplexobj",
    "nanpercentile",
    "nanquantile",
    "ones_like",
    "percentile",
    "result_type",
    "rollaxis",
    "vstack",
    "zeros_like",
]


# -- stacking (reference stacking/_simple.py:6-60) -------------------------


def vstack(arrays: Sequence[Array]) -> Array:
    """Row-stack: concatenate along axis 0 after atleast_2d."""
    return M.concatenate([M.atleast_2d(a) for a in arrays], axis=0)


def hstack(arrays: Sequence[Array]) -> Array:
    """Column-stack: axis 0 for 1-D inputs, axis 1 otherwise."""
    arrays = [M.atleast_1d(a) for a in arrays]
    axis = 0 if arrays[0].ndim == 1 else 1
    return M.concatenate(arrays, axis=axis)


def dstack(arrays: Sequence[Array]) -> Array:
    """Depth-stack: concatenate along axis 2 after atleast_3d."""
    return M.concatenate([M.atleast_3d(a) for a in arrays], axis=2)


# -- flips (reference manipulation/_flip.py:41-76) -------------------------


def flipud(a: Array) -> Array:
    return M.flip(a, axis=0)


def fliplr(a: Array) -> Array:
    if a.ndim < 2:
        raise ValueError("fliplr needs at least a 2-D array")
    return M.flip(a, axis=1)


def rollaxis(a: Array, axis: int, start: int = 0) -> Array:
    """np.rollaxis semantics (roll ``axis`` backwards to ``start``);
    a pure transpose == free column relabeling."""
    n = a.ndim
    axis = axis % n
    if not 0 <= start <= n:
        raise ValueError(f"start {start} out of bounds for ndim {n}")
    if axis < start:
        start -= 1
    if axis == start:
        return a
    perm = list(range(n))
    perm.remove(axis)
    perm.insert(start, axis)
    return M.transpose(a, perm)


# -- *_like creations (reference creation/_ones_zeros.py) ------------------


def _like(a: Array, value) -> Array:
    if any(s is None for s in a.shape):
        raise ValueError("*_like needs a fully known shape")
    out = CR.full(a.df.sparkSession, a.shape, value)
    if iscomplexobj(a):
        v = F.struct(
            F.lit(float(value)).alias("re"), F.lit(0.0).alias("im")
        )
        return Array(
            out.df.select(*out.index_cols, v.alias(VALUE_COL)), out.shape
        )
    return out.astype(a.dtype)


def ones_like(a: Array) -> Array:
    return _like(a, 1)


def zeros_like(a: Array) -> Array:
    return _like(a, 0)


def empty_like(a: Array) -> Array:
    """Deterministic "empty": zeros (the engine has no uninitialized
    storage -- absent cells already read as 0/NULL)."""
    return _like(a, 0)


def full_like(a: Array, value) -> Array:
    return _like(a, value)


# -- coercion / predicates -------------------------------------------------


def asarray(x, spark=None) -> Array:
    """Array passes through unchanged; in-memory data needs ``spark``
    to parallelize (the reference's asarray, creation/_from.py)."""
    if isinstance(x, Array):
        return x
    if spark is None:
        raise ValueError("asarray of in-memory data needs spark=")
    from ..sources.ingest import from_numpy

    return from_numpy(spark, np.asarray(x))


def asanyarray(x, spark=None) -> Array:
    return asarray(x, spark)


def iscomplexobj(a: Array) -> bool:
    """True when the value column is the STRUCT<re,im> complex
    encoding (operators/complexes.py) -- a schema check, no job."""
    t = a.dtype
    return hasattr(t, "fields") and [f.name for f in t.fields][:2] == ["re", "im"]


def result_type(*args) -> np.dtype:
    """np.result_type over Array dtypes / numpy dtypes / scalars --
    driver-side metadata only."""
    mapped = []
    for x in args:
        if isinstance(x, Array):
            s = x.dtype.simpleString()
            mapped.append(
                np.dtype("complex128") if iscomplexobj(x) else {
                    "double": np.dtype("float64"),
                    "float": np.dtype("float32"),
                    "bigint": np.dtype("int64"),
                    "int": np.dtype("int32"),
                    "smallint": np.dtype("int16"),
                    "tinyint": np.dtype("int8"),
                    "boolean": np.dtype("bool"),
                }.get(s, np.dtype("float64"))
            )
        else:
            mapped.append(x)
    return np.result_type(*mapped)


def allclose(a: Array, b, rtol: float = 1e-05, atol: float = 1e-08) -> Array:
    """Lazy scalar (0-d Array) like the reference: all(isclose)."""
    return all_(isclose(a, b, rtol=rtol, atol=atol), axis=None)


# -- indexing helpers ------------------------------------------------------


def flatnonzero(a: Array) -> Array:
    """Flat indices of nonzero cells (reference
    routines/_nonzero.py:55): ravel (zero movement) + nonzero.
    DENSE 0..k-1 output positions (compact nonzero) -- the NumPy
    contract this spelling exists for; the gapped shuffle-free form
    stays available via ``nonzero(..., compact=False)``."""
    total = 1
    for s in a.shape:
        if s is None:
            raise ValueError("flatnonzero needs a fully known shape")
        total *= s
    return nonzero(M.reshape(a, (total,)), compact=True)[0]


def broadcast_arrays(*arrays: Array) -> list[Array]:
    """Broadcast every input to the common shape (reference
    routines/_broadcast.py:80); each result is a broadcast_to view."""
    common = np.broadcast_shapes(*[tuple(a.shape) for a in arrays])
    return [M.broadcast_to(a, common) for a in arrays]


# -- quantile spellings ----------------------------------------------------


def nanquantile(a: Array, q, axis=None) -> Array:
    """NaN-skipping quantile: the engine's NULL encoding already skips
    absent/NaN cells, so this is ``quantile`` under its NaN name."""
    if isinstance(q, (list, tuple)):
        return quantiles(a, list(q), axis=axis)
    return quantile(a, q, axis=axis)


def percentile(a: Array, q, axis=None) -> Array:
    if isinstance(q, (list, tuple)):
        return quantiles(a, [x / 100.0 for x in q], axis=axis)
    return quantile(a, q / 100.0, axis=axis)


def nanpercentile(a: Array, q, axis=None) -> Array:
    return percentile(a, q, axis=axis)
