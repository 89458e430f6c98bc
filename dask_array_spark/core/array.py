"""Lazy N-d array over a Spark DataFrame in cell/COO form.

Parity target: the reference's ``Array`` collection
(/root/reference/dask_array/_collection.py:110) whose expression carries
``chunks`` / ``_meta`` / dtype metadata
(/root/reference/dask_array/_expr.py:202-246).  Here the "expression
tree" IS the Spark logical plan: every method builds DataFrame
operations declaratively and Catalyst performs the reference's
simplify/lower/fuse pipeline (predicate pushdown == slice pushdown,
whole-stage codegen == blockwise fusion, partial aggregation == tree
reduction; SURVEY.md section 4.2).

Encoding
--------
An ``ndim``-d array is a DataFrame with columns ``i0 .. i{ndim-1}``
(BIGINT, zero-based positions) and one value column ``v``.  Missing
values (NumPy NaN) are encoded as SQL NULL; plain reductions propagate
them like NumPy, ``nan*`` variants skip them (FIXTURES.md).

Fusion
------
To avoid self-joins for chains like ``x*2 + x/3``, an ``Array`` holds a
*base* DataFrame plus a value Column expression over it.  Elemwise ops
between arrays sharing the same base object combine expressions with no
join (the analogue of the reference's ``FusedBlockwise``,
/root/reference/dask_array/_blockwise.py:1574); arrays with different
bases align via an equi-join on index columns, with NumPy broadcasting
realised as a join on the shared non-degenerate axes
(/root/reference/dask_array/_blockwise.py:1243 ``_broadcast_block_id``).
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["Array", "VALUE_COL", "idx_cols"]

VALUE_COL = "v"


def idx_cols(ndim: int) -> list[str]:
    return [f"i{k}" for k in range(ndim)]


def _is_scalar(x: Any) -> bool:
    return isinstance(x, (int, float, bool, np.integer, np.floating, np.bool_))


# -- IEEE-754 arithmetic helpers ------------------------------------------
# Spark with ANSI off returns NULL for x/0, x%0 on DOUBLE (SQL, not
# IEEE); NumPy wants ±inf / NaN.  NULL is this engine's NaN encoding,
# so the NaN cases coincide for free, but the ±inf ones need explicit
# repair.  All of these are single codegen-stage CASE WHEN chains.

_INF = float("inf")


def _is_neg_zero(c: Column) -> Column:
    # -0.0 == 0.0 compares true in SQL; the sign survives a string cast
    return c.cast("string").startswith("-")


def _zero_div(a: Column, b: Column) -> Column:
    """IEEE x / ±0: ±inf by the operand signs, NaN (NULL) for 0/0."""
    inf = F.when(_is_neg_zero(b), F.lit(-_INF)).otherwise(F.lit(_INF))
    return (
        F.when(a.isNull() | (a == 0), F.lit(None).cast("double"))
        .otherwise(F.signum(a) * inf)
    )


def _ieee_div(a: Column, b: Column) -> Column:
    """a / b with IEEE zero-divisor semantics (NumPy true_divide)."""
    return F.when(b == 0, _zero_div(a, b)).otherwise(a / b)


def _copysign_zero(b: Column) -> Column:
    return F.when((b < 0) | ((b == 0) & _is_neg_zero(b)), F.lit(-0.0)).otherwise(
        F.lit(0.0)
    )


def _npy_mod(a: Column, b: Column) -> Column:
    """NumPy float remainder (sign of the DIVISOR), the npy_divmod
    algorithm: fmod, then +b when the signs disagree.  Handles the
    b=±inf cases the ((a%b)+b)%b folk formula gets wrong (fmod(3,inf)=3
    but (3+inf)%inf=NaN)."""
    m = a % b  # Spark % on DOUBLE is Java fmod (sign of dividend)
    return (
        F.when((m != 0) & ((m < 0) != (b < 0)), m + b)
        .when(m == 0, _copysign_zero(b))
        .otherwise(m)
    )


def _npy_floordiv(a: Column, b: Column) -> Column:
    """NumPy float floor-division, replicating npy_divmod
    (numpy/core/src/npymath): div = (a - fmod(a,b)) / b, minus one when
    the remainder sign disagrees with the divisor, floored with an
    fp-rounding repair; b==0 falls back to IEEE a/b."""
    m = a % b
    div = (a - m) / b
    adj = F.when((m != 0) & ((m < 0) != (b < 0)), div - 1).otherwise(div)
    fl = F.floor(adj).cast("double")
    fl = F.when(adj - fl > 0.5, fl + 1.0).otherwise(fl)
    # |adj| >= 2^52 doubles are already integral; also catches ±inf,
    # and Spark's NaN-largest comparison catches a NaN adj (inf - inf)
    fin = F.when(F.abs(adj) >= F.lit(2.0**52), adj).otherwise(fl)
    return F.when(b == 0, _zero_div(a, b)).otherwise(fin)


def _npy_pow(a: Column, b: Column) -> Column:
    """F.pow plus the IEEE/C99 special cases the NULL encoding (and the
    JVM) lose: pow(x, 0)=1 and pow(1, y)=1 even for NaN partners, and
    pow(±1, ±inf)=1 (Java returns NaN there, C99/NumPy return 1)."""
    one = F.lit(1.0)
    return (
        F.when(b == 0, one)
        .when(a == 1, one)
        .when((F.abs(a) == one) & (F.abs(b) == F.lit(_INF)), one)
        .otherwise(F.pow(a, b))
    )


def _nan_as_null(c: Column) -> Column:
    """Fold a stray JVM-computed NaN (inf-inf, inf*0, ... -- values
    the NULL encoding never saw) into NULL so comparisons take the
    same coalesce fallback as NULL-encoded NaNs.  Without this, Spark
    comparison semantics leak through: NaN == NaN is true and NaN
    sorts above every double, so (a-a)==(a-a) over an inf cell would
    return True where NumPy returns False."""
    return F.when(F.isnan(c.cast("double")), F.lit(None)).otherwise(c)


class Array:
    """Lazy, distributed N-d array (cell/COO form).

    Parameters
    ----------
    base : DataFrame with columns ``i0..i{ndim-1}`` plus whatever the
        value expression references.
    shape : tuple of int (or None for data-dependent / unknown sizes,
        the analogue of the reference's NaN chunk lengths,
        /root/reference/dask_array/slicing/_bool_index.py:118-141).
    vcol : Column expression over ``base`` producing the cell value.
    """

    def __init__(self, base: DataFrame, shape: Sequence[int | None], vcol: Column | None = None):
        self._base = base
        self.shape = tuple(shape)
        self._vcol = vcol if vcol is not None else F.col(VALUE_COL)

    # -- metadata ---------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def index_cols(self) -> list[str]:
        return idx_cols(self.ndim)

    @property
    def size(self) -> int | None:
        n = 1
        for s in self.shape:
            if s is None:
                return None
            n *= s
        return n

    @property
    def df(self) -> DataFrame:
        """Canonical cell-form DataFrame: ``i0..i{n-1}, v``."""
        cols = [F.col(c) for c in self.index_cols] + [self._vcol.alias(VALUE_COL)]
        return self._base.select(*cols)

    @property
    def spark(self) -> SparkSession:
        return self._base.sparkSession

    @property
    def dtype(self):
        return self.df.schema[VALUE_COL].dataType

    def _materialized(self) -> "Array":
        """Collapse vcol into a concrete ``v`` column (new base)."""
        return Array(self.df, self.shape)

    def explain(self, mode: str = "formatted") -> None:
        """EXPLAIN surface (reference ``pprint``/``explain``,
        /root/reference/dask_array/_diagnostics.py:285)."""
        self.df.explain(mode)

    def pprint(self) -> None:
        """Array-aware plan print: shape/dtype header + the optimized
        logical plan (reference ``pprint``, _expr.py:154-199)."""
        print(f"Array<shape={self.shape}, dtype={self.dtype.simpleString()}>")
        print(self.df._jdf.queryExecution().optimizedPlan().toString())

    def compute_shape(self) -> "Array":
        """Resolve unknown (None) dims with one aggregation job
        (reference ``compute_chunk_sizes``,
        /root/reference/dask_array/_collection.py:415)."""
        if all(s is not None for s in self.shape):
            return self
        unknown = [k for k, s in enumerate(self.shape) if s is None]
        aggs = [(F.max(f"i{k}") + 1).alias(f"s{k}") for k in unknown]
        row = self.df.agg(*aggs).collect()[0]
        shape = list(self.shape)
        for k in unknown:
            shape[k] = int(row[f"s{k}"]) if row[f"s{k}"] is not None else 0
        return Array(self._base, tuple(shape), self._vcol)

    def persist(self, storage_level=None):
        """Sharing-aware fan-out caching (reference declines pushdown at
        shared subtrees, /root/reference/dask_array/_expr.py:336-399; in
        Spark the equivalent is an explicit persist at the fan-out)."""
        d = self.df
        d = d.persist() if storage_level is None else d.persist(storage_level)
        return Array(d, self.shape)

    # -- elemwise machinery ----------------------------------------------
    def _unary(self, fn) -> "Array":
        return Array(self._base, self.shape, fn(self._vcol))

    def _binary(self, other: Any, fn, reflected: bool = False) -> "Array":
        f = (lambda a, b: fn(b, a)) if reflected else fn
        if _is_scalar(other):
            lit = F.lit(other.item() if isinstance(other, np.generic) else other)
            return Array(self._base, self.shape, f(self._vcol, lit))
        if not isinstance(other, Array):
            return NotImplemented
        if other._base is self._base:
            # fused path: same base -> pure expression combination
            shape = _broadcast_shapes(self.shape, other.shape)
            if shape == self.shape == other.shape:
                return Array(self._base, shape, f(self._vcol, other._vcol))
        return _broadcast_binary(self, other, f)

    # operator overloads (reference _collection.py:716-877)
    def __add__(self, o):
        return self._binary(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._binary(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binary(o, lambda a, b: a - b, reflected=True)

    def __mul__(self, o):
        return self._binary(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def _float_op(self, other: Any) -> bool:
        """True when NumPy type promotion makes the op a FLOAT op."""
        from pyspark.sql.types import DoubleType, FloatType

        if isinstance(self.dtype, (DoubleType, FloatType)):
            return True
        if isinstance(other, Array):
            return isinstance(other.dtype, (DoubleType, FloatType))
        return isinstance(other, (float, np.floating))

    def __truediv__(self, o):
        return self._binary(o, _ieee_div)

    def __rtruediv__(self, o):
        return self._binary(o, _ieee_div, reflected=True)

    def __floordiv__(self, o):
        if self._float_op(o):
            return self._binary(o, _npy_floordiv)
        return self._binary(o, lambda a, b: F.floor(a / b))

    def __rfloordiv__(self, o):
        if self._float_op(o):
            return self._binary(o, _npy_floordiv, reflected=True)
        return self._binary(o, lambda a, b: F.floor(a / b), reflected=True)

    def __mod__(self, o):
        # Python/NumPy modulo (sign of divisor), not SQL pmod-of-dividend
        if self._float_op(o):
            return self._binary(o, _npy_mod)
        return self._binary(o, lambda a, b: ((a % b) + b) % b)

    def __rmod__(self, o):
        if self._float_op(o):
            return self._binary(o, _npy_mod, reflected=True)
        return self._binary(o, lambda a, b: ((a % b) + b) % b, reflected=True)

    def __pow__(self, o):
        return self._binary(o, _npy_pow)

    def __rpow__(self, o):
        return self._binary(o, _npy_pow, reflected=True)

    def __neg__(self):
        return self._unary(lambda c: -c)

    def __pos__(self):
        return self

    def __abs__(self):
        return self._unary(F.abs)

    def __invert__(self):
        return self._unary(lambda c: ~c)

    def __and__(self, o):
        return self._binary(o, lambda a, b: a & b)

    __rand__ = __and__

    def __or__(self, o):
        return self._binary(o, lambda a, b: a | b)

    __ror__ = __or__

    def __xor__(self, o):
        return self._binary(o, lambda a, b: (a | b) & ~(a & b))

    __rxor__ = __xor__

    # NumPy: a comparison with NaN is False (and != is True); a NULL
    # (NaN-encoded) operand must not yield a NULL boolean that breaks
    # downstream casts/sums.  Float operands are _nan_as_null-wrapped
    # first so a stray JVM NaN (inf-inf, inf*0 -- never NULL-encoded)
    # hits the same coalesce fallback instead of Spark's NaN==NaN /
    # NaN-sorts-largest semantics.
    def _compare(self, o, op, null_result: bool):
        if self._float_op(o):
            fn = lambda a, b: F.coalesce(  # noqa: E731
                op(_nan_as_null(a), _nan_as_null(b)), F.lit(null_result)
            )
        else:
            fn = lambda a, b: F.coalesce(op(a, b), F.lit(null_result))  # noqa: E731
        return self._binary(o, fn)

    def __eq__(self, o):  # type: ignore[override]
        return self._compare(o, lambda a, b: a == b, False)

    def __ne__(self, o):  # type: ignore[override]
        return self._compare(o, lambda a, b: a != b, True)

    def __lt__(self, o):
        return self._compare(o, lambda a, b: a < b, False)

    def __le__(self, o):
        return self._compare(o, lambda a, b: a <= b, False)

    def __gt__(self, o):
        return self._compare(o, lambda a, b: a > b, False)

    def __ge__(self, o):
        return self._compare(o, lambda a, b: a >= b, False)

    def __matmul__(self, o):
        from ..operators import linalg

        return linalg.matmul(self, o)

    def __hash__(self):  # __eq__ is elemwise; keep hashable by identity
        return id(self)

    def astype(self, spark_type) -> "Array":
        """reference _collection.py:1569 (``astype``)."""
        return self._unary(lambda c: c.cast(spark_type))

    # -- indexing ---------------------------------------------------------
    def __getitem__(self, key):
        from ..operators import slicing

        return slicing.getitem(self, key)

    @property
    def T(self) -> "Array":
        from ..operators import manipulation

        return manipulation.transpose(self)

    def transpose(self, *axes):
        from ..operators import manipulation

        return manipulation.transpose(self, axes if axes else None)

    def reshape(self, *shape):
        from ..operators import manipulation

        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return manipulation.reshape(self, shape)

    def ravel(self):
        return self.reshape(-1)

    flatten = ravel

    def squeeze(self, axis=None):
        from ..operators import manipulation

        return manipulation.squeeze(self, axis)

    # -- reductions (delegate) -------------------------------------------
    def _reduce(self, name, axis=None, **kw):
        from ..operators import reductions

        return getattr(reductions, name)(self, axis=axis, **kw)

    def sum(self, axis=None):
        return self._reduce("sum", axis)

    def mean(self, axis=None):
        return self._reduce("mean", axis)

    def min(self, axis=None):
        return self._reduce("amin", axis)

    def max(self, axis=None):
        return self._reduce("amax", axis)

    def prod(self, axis=None):
        return self._reduce("prod", axis)

    def any(self, axis=None):
        return self._reduce("any_", axis)

    def all(self, axis=None):
        return self._reduce("all_", axis)

    def var(self, axis=None, ddof=0):
        return self._reduce("var", axis, ddof=ddof)

    def std(self, axis=None, ddof=0):
        return self._reduce("std", axis, ddof=ddof)

    def argmin(self, axis=None):
        return self._reduce("argmin", axis)

    def argmax(self, axis=None):
        return self._reduce("argmax", axis)

    def cumsum(self, axis=0):
        from ..operators import windows

        return windows.cumsum(self, axis)

    def cumprod(self, axis=0):
        from ..operators import windows

        return windows.cumprod(self, axis)

    def dot(self, other):
        from ..operators import linalg

        return linalg.matmul(self, other)

    def round(self, decimals=0):
        # `+ 0.0` normalizes IEEE -0.0 to +0.0: a tiny negative that rounds
        # to zero must hash identically to the oracle's rounded value.
        return self._unary(lambda c: F.round(c, decimals) + F.lit(0.0))

    def clip(self, lo=None, hi=None):
        def _clip(c):
            if lo is not None:
                c = F.greatest(c, F.lit(lo))
            if hi is not None:
                c = F.least(c, F.lit(hi))
            return c

        return self._unary(_clip)

    # -- materialization --------------------------------------------------
    def compute(self) -> np.ndarray:
        """Materialize to a NumPy ndarray on the driver (reference
        ``compute``, /root/reference/dask_array/_collection.py:282).
        Dense fill; NULL cells become NaN for float dtypes."""
        pdf = self.df.toPandas()
        shape = list(self.shape)
        icols = self.index_cols
        for ax, s in enumerate(shape):
            if s is None:
                shape[ax] = int(pdf[icols[ax]].max()) + 1 if len(pdf) else 0
        if self.ndim == 0:
            if len(pdf) == 0:
                return np.array(np.nan)
            val = pdf[VALUE_COL].iloc[0]
            if val is None:
                return np.array(np.nan)
            import decimal

            if isinstance(val, decimal.Decimal):
                # uint64-tier scalars (and their widened reduction
                # results, e.g. sum -> decimal(30,0)): uint64 when
                # representable, else a Python-int object scalar --
                # never a lossy float
                iv = int(val)
                if 0 <= iv < 2**64:
                    return np.array(np.uint64(iv))
                return np.array(iv, dtype=object)
            return np.array(val)
        kind = self.dtype.simpleString()
        if kind in ("double", "float"):
            out = np.full(shape, np.nan, dtype="float64" if kind == "double" else "float32")
        elif kind == "boolean":
            out = np.zeros(shape, dtype=bool)
        elif kind.startswith("struct"):
            # complex cells (STRUCT<re,im>): absent cells -> NaN+NaNj
            out = np.full(shape, complex(np.nan, np.nan), dtype="complex128")
        elif kind.startswith("decimal"):
            # uint64 cells (decimal(20,0), round 11): exact dense fill
            out = np.zeros(shape, dtype="uint64")
        else:
            out = np.zeros(shape, dtype="int64")
        if len(pdf):
            idx = tuple(pdf[c].to_numpy(dtype="int64") for c in icols)
            vals = pdf[VALUE_COL].to_numpy()
            if out.dtype.kind == "c":
                from ..sources.ingest import _struct_col_to_complex

                vals = _struct_col_to_complex(pdf[VALUE_COL])
            elif out.dtype.kind == "f":
                vals = np.asarray(vals, dtype=out.dtype)
            elif out.dtype.kind == "u":
                from ..sources.ingest import _decimal_col_to_uint64

                mask = np.array([x is not None for x in vals])
                idx = tuple(ix[mask] for ix in idx)
                vals = _decimal_col_to_uint64(pdf[VALUE_COL][mask])
            else:
                mask = np.array([x is not None for x in vals])
                idx = tuple(ix[mask] for ix in idx)
                vals = np.asarray(vals[mask], dtype=out.dtype)
            out[idx] = vals
        return out

    def count_rows(self) -> int:
        return self.df.count()

    def __repr__(self):
        return f"Array(shape={self.shape}, dtype={self.dtype.simpleString() if hasattr(self.dtype, 'simpleString') else self.dtype})"


# -- broadcasting helpers -------------------------------------------------

def _broadcast_shapes(s1, s2):
    n = max(len(s1), len(s2))
    s1 = (1,) * (n - len(s1)) + tuple(s1)
    s2 = (1,) * (n - len(s2)) + tuple(s2)
    out = []
    for a, b in zip(s1, s2):
        if a == 1:
            out.append(b)
        elif b == 1 or a == b or a is None or b is None:
            out.append(a if a is not None else b)
        else:
            raise ValueError(f"shapes not broadcastable: {s1} vs {s2}")
    return tuple(out)


def _broadcast_binary(a: Array, b: Array, fn) -> Array:
    """Align two arrays by equi-join on shared axes; NumPy broadcasting
    == joining only on non-degenerate shared axes (reference
    ``Elemwise._broadcast_block_id``,
    /root/reference/dask_array/_blockwise.py:1243).  Degenerate (size-1)
    and missing axes contribute no join key -- their partner's index
    column flows through.  The small side of such joins is typically a
    vector/scalar: AQE turns it into a broadcast hash join at runtime.
    """
    out_shape = _broadcast_shapes(a.shape, b.shape)
    n = len(out_shape)

    def prep(x: Array, tag: str):
        d = x.df
        # rename axes to output positions (right-aligned)
        off = n - x.ndim
        sel = []
        join_axes = []
        for k in range(x.ndim):
            out_ax = k + off
            if x.shape[k] == 1 and out_shape[out_ax] != 1:
                continue  # degenerate: constant 0 index, partner provides it
            sel.append(F.col(f"i{k}").alias(f"{tag}_i{out_ax}"))
            join_axes.append(out_ax)
        sel.append(F.col(VALUE_COL).alias(f"{tag}_v"))
        return d.select(*sel), set(join_axes)

    da, axes_a = prep(a, "l")
    db, axes_b = prep(b, "r")
    shared = sorted(axes_a & axes_b)
    if shared:
        cond = [F.col(f"l_i{ax}") == F.col(f"r_i{ax}") for ax in shared]
        joined = da.join(db, on=cond, how="inner")
    else:
        # outer-product broadcast (e.g. (m,1)+(1,k)) or 0-d operand
        small = db
        if b.ndim > a.ndim or (b.size or 0) > (a.size or 0):
            small, da = da, db  # broadcast the smaller side
        joined = da.crossJoin(F.broadcast(small))
    out_cols = []
    for ax in range(n):
        if ax in axes_a:
            out_cols.append(F.col(f"l_i{ax}").alias(f"i{ax}"))
        elif ax in axes_b:
            out_cols.append(F.col(f"r_i{ax}").alias(f"i{ax}"))
        else:
            out_cols.append(F.lit(0).cast("long").alias(f"i{ax}"))
    out_cols.append(fn(F.col("l_v"), F.col("r_v")).alias(VALUE_COL))
    return Array(joined.select(*out_cols), out_shape)
