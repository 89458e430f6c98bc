"""Creation routines over ``spark.range`` index domains.

Parity: arange/linspace (/root/reference/dask_array/creation/_arange.py:16,
_linspace.py:15), eye/tri/diag (creation/_eye.py:13, _tri.py:9,
_diag.py:15), ones/zeros/full (creation/_ones_zeros.py:17),
fromfunction/meshgrid/indices (creation/_mesh.py:12), random
(/root/reference/dask_array/random/_generator.py:16).

``spark.range`` is a splittable leaf (parallel, no driver data); every
constructor is a projection over it, so Catalyst constant-folds and the
"broadcast trick" the reference uses for constants
(creation/_ones_zeros.py:17-141) is unnecessary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = [
    "arange",
    "linspace",
    "ones",
    "zeros",
    "full",
    "eye",
    "tri",
    "diag_extract",
    "diagonal",
    "fromfunction_expr",
    "indices_1d",
    "random_uniform",
    "random_normal",
]


def _range1d(spark: SparkSession, n: int, numparts: int | None = None):
    r = spark.range(0, n, 1, numparts) if numparts else spark.range(n)
    return r.select(F.col("id").alias("i0"))


def arange(spark: SparkSession, start, stop=None, step=1) -> Array:
    if stop is None:
        start, stop = 0, start
    import math

    n = max(0, math.ceil((stop - start) / step))
    d = _range1d(spark, n).select(
        "i0", (F.lit(start) + F.col("i0") * F.lit(step)).alias(VALUE_COL)
    )
    return Array(d, (n,))


def linspace(spark: SparkSession, start: float, stop: float, num: int) -> Array:
    delta = (stop - start) / (num - 1) if num > 1 else 0.0
    d = _range1d(spark, num).select(
        "i0", (F.lit(float(start)) + F.col("i0") * F.lit(delta)).alias(VALUE_COL)
    )
    return Array(d, (num,))


def full(spark: SparkSession, shape: Sequence[int], value) -> Array:
    shape = tuple(shape)
    d = None
    for k, s in enumerate(shape):
        rng = spark.range(s).select(F.col("id").alias(f"i{k}"))
        d = rng if d is None else d.crossJoin(rng)
    d = d.withColumn(VALUE_COL, F.lit(value))
    return Array(d, shape)


def ones(spark: SparkSession, shape) -> Array:
    return full(spark, shape, 1.0)


def zeros(spark: SparkSession, shape) -> Array:
    return full(spark, shape, 0.0)


def eye(spark: SparkSession, n: int, m: int | None = None, k: int = 0) -> Array:
    """Identity-ish: value = 1 where i1 == i0 + k (sparse cells only --
    the zeros are implicit; densify with fromfunction if needed)."""
    m = n if m is None else m
    d = (
        _range1d(spark, n)
        .select("i0", (F.col("i0") + F.lit(k)).alias("i1"))
        .filter((F.col("i1") >= 0) & (F.col("i1") < m))
        .withColumn(VALUE_COL, F.lit(1.0))
    )
    return Array(d, (n, m))


def tri(spark: SparkSession, n: int, m: int | None = None, k: int = 0) -> Array:
    """Lower-triangular ones (sparse cells; reference creation/_tri.py:9)."""
    m = n if m is None else m
    a = _range1d(spark, n)
    b = spark.range(m).select(F.col("id").alias("i1"))
    d = a.crossJoin(b).filter(F.col("i1") <= F.col("i0") + F.lit(k)).withColumn(
        VALUE_COL, F.lit(1.0)
    )
    return Array(d, (n, m))


def diagonal(a: Array, offset: int = 0) -> Array:
    """Extract diagonal: WHERE i1 = i0 + offset (reference
    creation/_diagonal.py:16)."""
    n0, n1 = a.shape
    length = max(0, min(n0, n1 - offset) if offset >= 0 else min(n0 + offset, n1))
    start = 0 if offset >= 0 else -offset
    d = a.df.filter(F.col("i1") == F.col("i0") + F.lit(offset)).select(
        (F.col("i0") - F.lit(start)).alias("i0"), F.col(VALUE_COL)
    )
    return Array(d, (length,))


diag_extract = diagonal


def fromfunction_expr(spark: SparkSession, shape: Sequence[int], value_sql: str) -> Array:
    """Array from an SQL expression over index columns i0..i{n-1}
    (reference ``fromfunction``, creation/_mesh.py:12)."""
    shape = tuple(shape)
    d = None
    for k, s in enumerate(shape):
        rng = spark.range(s).select(F.col("id").alias(f"i{k}"))
        d = rng if d is None else d.crossJoin(rng)
    d = d.withColumn(VALUE_COL, F.expr(value_sql))
    return Array(d, shape)


def indices_1d(spark: SparkSession, n: int) -> Array:
    return arange(spark, n)


def random_uniform(spark: SparkSession, n: int, seed: int = 42, numparts: int | None = None) -> Array:
    """Seeded per-partition RNG (reference per-block bitgen spawning,
    random/_expr.py:63 == seed + partition id).  Deterministic for a
    fixed partitioning; not oracle-checkable across engines."""
    d = _range1d(spark, n, numparts).withColumn(VALUE_COL, F.rand(seed))
    return Array(d, (n,))


def random_normal(spark: SparkSession, n: int, seed: int = 42, numparts: int | None = None) -> Array:
    d = _range1d(spark, n, numparts).withColumn(VALUE_COL, F.randn(seed))
    return Array(d, (n,))
