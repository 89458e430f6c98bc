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
    "indices_nd",
    "tril_indices",
    "tril_indices_from",
    "triu_indices",
    "triu_indices_from",
    "meshgrid",
    "random_uniform",
    "random_normal",
    "random_exponential",
    "random_lognormal",
    "random_integers",
    "random_choice",
    "random_permutation",
    "random_poisson",
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


def random_exponential(spark: SparkSession, n: int, scale: float = 1.0,
                       seed: int = 42, numparts: int | None = None) -> Array:
    """Inverse-CDF exponential: -scale * ln(1 - U) (reference
    distribution leaves, random/_generator.py:16-349)."""
    d = _range1d(spark, n, numparts).withColumn(
        VALUE_COL, -F.lit(float(scale)) * F.log1p(-F.rand(seed))
    )
    return Array(d, (n,))


def random_lognormal(spark: SparkSession, n: int, mean: float = 0.0,
                     sigma: float = 1.0, seed: int = 42,
                     numparts: int | None = None) -> Array:
    d = _range1d(spark, n, numparts).withColumn(
        VALUE_COL, F.exp(F.lit(float(mean)) + F.lit(float(sigma)) * F.randn(seed))
    )
    return Array(d, (n,))


def random_integers(spark: SparkSession, n: int, low: int, high: int,
                    seed: int = 42, numparts: int | None = None) -> Array:
    """Uniform integers in [low, high) (reference ``integers``)."""
    d = _range1d(spark, n, numparts).withColumn(
        VALUE_COL,
        (F.floor(F.rand(seed) * F.lit(high - low)) + F.lit(low)).cast("long"),
    )
    return Array(d, (n,))


def random_choice(spark: SparkSession, n: int, values, p=None, seed: int = 42,
                  numparts: int | None = None) -> Array:
    """Weighted choice from a small value list (reference
    random/_choice.py): one uniform draw + a CASE chain over the
    cumulative weights."""
    if p is None:
        p = [1.0 / len(values)] * len(values)
    if abs(sum(p) - 1.0) > 1e-9:
        raise ValueError("probabilities must sum to 1")
    # materialize the draw ONCE: every reference to F.rand() inside a
    # CASE chain re-evaluates the generator independently
    d = _range1d(spark, n, numparts).withColumn("__u", F.rand(seed))
    u = F.col("__u")
    acc = 0.0
    expr = F.lit(values[-1])
    conds = []
    for v, w in zip(values[:-1], p[:-1]):
        acc += w
        conds.append((acc, v))
    for acc_v, v in reversed(conds):
        expr = F.when(u < acc_v, F.lit(v)).otherwise(expr)
    return Array(d.select("i0", expr.alias(VALUE_COL)), (n,))


def random_permutation(spark: SparkSession, n: int, seed: int = 42) -> Array:
    """Random permutation of 0..n-1 (reference ``permutation``):
    shuffle key = xxhash64(id, seed), position = the scalable two-pass
    zipWithIndex rank over that key -- no single-partition sort."""
    from ..sources.ingest import with_dense_index

    d = spark.range(n).select(
        F.col("id").alias(VALUE_COL),
        F.xxhash64(F.col("id"), F.lit(seed)).alias("__h"),
    )
    ranked = with_dense_index(d, ["__h", VALUE_COL], "i0")
    return Array(ranked.select("i0", VALUE_COL), (n,))


def random_poisson(spark: SparkSession, n: int, lam: float = 1.0,
                   seed: int = 42, numparts: int | None = None) -> Array:
    """Poisson via per-partition NumPy bit generators -- the
    reference's per-block bitgen spawning (random/_expr.py:63): each
    partition seeds ``default_rng(seed + partition_id)``.
    Deterministic for a fixed partitioning."""
    import pandas as pd
    from pyspark import TaskContext

    d = _range1d(spark, n, numparts)

    def gen(it):
        import numpy as np

        pid = TaskContext.get().partitionId()
        rng = np.random.default_rng(seed + pid)
        for pdf in it:
            pdf = pdf.copy()
            pdf[VALUE_COL] = rng.poisson(lam, size=len(pdf)).astype("int64")
            yield pdf

    out = d.mapInPandas(gen, schema=f"i0 long, {VALUE_COL} long")
    return Array(out, (n,))


def indices_nd(spark, shape) -> "list[Array]":
    """N-d ``np.indices``: one Array per dimension over the full index
    grid, value = the coordinate along that dimension (reference
    creation/_mesh.py:114) -- a cross join of ``spark.range`` leaves
    plus pure projections."""
    from pyspark.sql import functions as F

    shape = tuple(int(s) for s in shape)
    grid = None
    for k, s in enumerate(shape):
        rng = spark.range(s).select(F.col("id").alias(f"i{k}"))
        grid = rng if grid is None else grid.crossJoin(rng)
    out = []
    for k in range(len(shape)):
        d = grid.select(
            *[F.col(f"i{j}") for j in range(len(shape))],
            F.col(f"i{k}").cast("double").alias(VALUE_COL),
        )
        out.append(Array(d, shape))
    return out


def meshgrid(*arrays: Array, indexing: str = "xy") -> "list[Array]":
    """N-d ``np.meshgrid`` from 1-D coordinate arrays (reference
    creation/_mesh.py:12): output k broadcasts array k along every
    other dimension -- realized as the index grid joined with each
    coordinate array on its own axis (tiny broadcast joins)."""
    from pyspark.sql import functions as F

    if indexing not in ("xy", "ij"):
        raise ValueError("indexing must be 'xy' or 'ij'")
    arrs = list(arrays)
    if indexing == "xy" and len(arrs) >= 2:
        # np.meshgrid 'xy': first two dims swap
        dims = [a.shape[0] for a in arrs]
        dims[0], dims[1] = dims[1], dims[0]
        axis_of = {0: 1, 1: 0}
    else:
        dims = [a.shape[0] for a in arrs]
        axis_of = {}
    n = len(arrs)
    spark = arrs[0].spark
    grid = None
    for k, s in enumerate(dims):
        if s is None:
            raise ValueError("meshgrid needs known lengths")
        rng = spark.range(s).select(F.col("id").alias(f"i{k}"))
        grid = rng if grid is None else grid.crossJoin(rng)
    out = []
    for k, a in enumerate(arrs):
        ax = axis_of.get(k, k)
        src = a.df.select(F.col("i0").alias(f"i{ax}"), F.col(VALUE_COL))
        d = grid.join(F.broadcast(src), on=f"i{ax}", how="inner").select(
            *[F.col(f"i{j}") for j in range(n)], F.col(VALUE_COL)
        )
        out.append(Array(d, tuple(dims)))
    return out


# -- triangle index generators (reference creation/_tri.py,
# routines/_misc.py tril_indices/triu_indices) -----------------------------


def _clamp(x: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, x))


def _tril_prefix(i: int, k: int, m: int) -> int:
    """#cells in rows < i of the k-offset lower triangle of an (?, m)
    grid: row r holds clamp(r+k+1, 0, m) cells."""
    a = _clamp(-k, 0, i)          # leading all-empty rows
    c = _clamp(m - k - 1, 0, i)   # first saturated (full-m) row
    return (i - c) * m + (c - a) * (k + 1) + ((a + c - 1) * (c - a)) // 2


def _triu_prefix(i: int, k: int, m: int) -> int:
    """#cells in rows < i of the k-offset upper triangle: row r holds
    clamp(m - r - k, 0, m) cells."""
    s = _clamp(-k + 1, 0, i)      # leading saturated rows (full m)
    z = _clamp(m - k, 0, i)       # first all-empty row
    return s * m + (z - s) * (m - k) - ((s + z - 1) * (z - s)) // 2


def tril_indices(spark: SparkSession, n: int, k: int = 0, m: int | None = None):
    """(rows, cols) index arrays of the k-offset lower triangle of an
    n x m grid, row-major ordered like np.tril_indices.  Pure index
    arithmetic: the output position of cell (i, j) is a CLOSED-FORM
    prefix (no global rank, no window, no shuffle) -- one range scan +
    one sequence explode."""
    m = n if m is None else int(m)
    i = "id"
    # SQL mirrors of _tril_prefix, evaluated per row against column i
    a = f"least(greatest({-k}, 0), {i})"
    c = f"least(greatest({m - k - 1}, 0), {i})"
    prefix = (
        f"(({i} - ({c})) * {m} + (({c}) - ({a})) * {k + 1}"
        f" + ((({a}) + ({c}) - 1) * (({c}) - ({a})) div 2))"
    )
    d = (
        spark.range(n)
        .filter(f"{i} + {k} >= 0")
        .selectExpr(
            f"{i} as i",
            f"{prefix} as p",
            f"least({m - 1}, {i} + {k}) as jmax",
        )
        .selectExpr("i", "p", "explode(sequence(0, jmax)) as j")
    )
    length = _tril_prefix(n, k, m)
    pos = (F.col("p") + F.col("j")).cast("long").alias("i0")
    rows = Array(d.select(pos, F.col("i").cast("long").alias(VALUE_COL)), (length,))
    cols = Array(d.select(pos, F.col("j").cast("long").alias(VALUE_COL)), (length,))
    return rows, cols


def triu_indices(spark: SparkSession, n: int, k: int = 0, m: int | None = None):
    """(rows, cols) index arrays of the k-offset upper triangle, same
    closed-form-prefix construction as tril_indices."""
    m = n if m is None else int(m)
    i = "id"
    s = f"least(greatest({-k + 1}, 0), {i})"
    z = f"least(greatest({m - k}, 0), {i})"
    prefix = (
        f"(({s}) * {m} + (({z}) - ({s})) * {m - k}"
        f" - ((({s}) + ({z}) - 1) * (({z}) - ({s})) div 2))"
    )
    d = (
        spark.range(n)
        .filter(f"{i} + {k} <= {m - 1}")
        .selectExpr(
            f"{i} as i",
            f"{prefix} as p",
            f"greatest(0, {i} + {k}) as jmin",
        )
        .selectExpr("i", "p", "jmin", f"explode(sequence(jmin, {m - 1})) as j")
    )
    length = _triu_prefix(n, k, m)
    pos = (F.col("p") + F.col("j") - F.col("jmin")).cast("long").alias("i0")
    rows = Array(d.select(pos, F.col("i").cast("long").alias(VALUE_COL)), (length,))
    cols = Array(d.select(pos, F.col("j").cast("long").alias(VALUE_COL)), (length,))
    return rows, cols


def tril_indices_from(a: Array, k: int = 0):
    if a.ndim != 2:
        raise ValueError("tril_indices_from needs a 2-D array")
    return tril_indices(a.spark, a.shape[0], k, a.shape[1])


def triu_indices_from(a: Array, k: int = 0):
    if a.ndim != 2:
        raise ValueError("triu_indices_from needs a 2-D array")
    return triu_indices(a.spark, a.shape[0], k, a.shape[1])
