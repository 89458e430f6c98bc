"""Window / sliding / cumulative family.

Parity: cumsum/cumprod (reference ``CumReduction``/Blelloch scan,
/root/reference/dask_array/reductions/_cumulative.py:100,451), sliding
window reductions (reductions/_sliding_window.py:405 -- the reference's
banded fused plan is Spark ``WindowExec``'s native incremental sliding
frame), moving windows with min_count
(reductions/_sliding_window.py:249), forward-fill ``push``
(_overlap.py:1441), diff/gradient (routines/_diff.py:6,
routines/_gradient.py:36), coarsen (routines/_coarsen.py:42).

Scale note: windows ordered along axis ``ax`` partition by the OTHER
axes -- for >=2-d data that is a parallel window.  A window over a pure
1-D array has a single partition; for that case ``cumsum_1d_scalable``
implements the classic two-pass distributed prefix sum (per-partition
partials + broadcast offsets), the same decomposition as the
reference's Blelloch scan (reductions/_cumulative.py:451).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = [
    "cumsum",
    "cumprod",
    "nancumprod",
    "nancumsum",
    "push",
    "diff",
    "ediff1d",
    "gradient",
    "sliding_reduce",
    "moving_reduce",
    "coarsen",
    "cumsum_1d_scalable",
]



def _axis_window(a: Array, axis: int, frame=None):
    axis = axis % a.ndim
    others = [f"i{k}" for k in range(a.ndim) if k != axis]
    w = Window.partitionBy(*others).orderBy(F.col(f"i{axis}"))
    if frame is not None:
        w = w.rowsBetween(*frame)
    return w, axis


def cumsum(a: Array, axis: int = 0) -> Array:
    """Running sum with NumPy NaN propagation (once NaN, all later NaN)."""
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    seen_null = F.max(F.col(VALUE_COL).isNull().cast("int")).over(w)
    c = F.when(seen_null == 1, F.lit(None)).otherwise(F.sum(F.col(VALUE_COL)).over(w))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def nancumsum(a: Array, axis: int = 0) -> Array:
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    c = F.coalesce(F.sum(F.col(VALUE_COL)).over(w), F.lit(0.0))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def cumprod(a: Array, axis: int = 0) -> Array:
    """Running product via the exp-log-sum decomposition with running
    sign / zero tracking (SURVEY.md section 4.4 'cumprod log-trick')."""
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    seen_null = F.max(F.col(VALUE_COL).isNull().cast("int")).over(w)
    zeros = F.max((F.col(VALUE_COL) == 0).cast("int")).over(w)
    negs = F.sum((F.col(VALUE_COL) < 0).cast("int")).over(w)
    mag = F.exp(F.sum(F.log(F.when(F.col(VALUE_COL) != 0, F.abs(F.col(VALUE_COL))))).over(w))
    sign = F.when(negs % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    c = F.when(seen_null == 1, F.lit(None)).otherwise(
        F.when(zeros == 1, F.lit(0.0)).otherwise(sign * mag)
    )
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def nancumprod(a: Array, axis: int = 0) -> Array:
    """NaN-skipping running product (reference nancumprod,
    reductions/_cumulative.py): NULL cells contribute factor 1."""
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    v = F.col(VALUE_COL)
    zeros = F.max((v == 0).cast("int")).over(w)
    negs = F.sum((v < 0).cast("int")).over(w)
    mag = F.exp(F.sum(F.log(F.when(v != 0, F.abs(v)))).over(w))
    sign = F.when(negs % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    c = F.when(zeros == 1, F.lit(0.0)).otherwise(
        F.coalesce(sign * mag, F.lit(1.0))
    )
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def push(a: Array, axis: int = 0, limit: int | None = None) -> Array:
    """Forward-fill last valid value (reference _overlap.py:1441)."""
    if limit is None:
        w, _ = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    else:
        w, _ = _axis_window(a, axis, (-limit, Window.currentRow))
    c = F.last(F.col(VALUE_COL), ignorenulls=True).over(w)
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def diff(a: Array, axis: int = 0) -> Array:
    """x[i+1] - x[i] (reference routines/_diff.py:6): lead-lag over the
    axis window; output length n-1."""
    w, ax = _axis_window(a, axis)
    nxt = F.lead(F.col(VALUE_COL), 1).over(w)
    d = a.df.select(
        *a.index_cols, nxt.alias("__nxt"), F.col(VALUE_COL).alias("__cur")
    )
    if a.shape[ax] is not None:
        d = d.filter(F.col(f"i{ax}") < F.lit(a.shape[ax] - 1))
    else:
        # unknown length (sparse index): drop the last row per partition
        d = d.filter(F.col("__nxt").isNotNull() | F.col("__cur").isNull())
    d = d.select(*a.index_cols, (F.col("__nxt") - F.col("__cur")).alias(VALUE_COL))
    shape = list(a.shape)
    shape[ax] = None if shape[ax] is None else shape[ax] - 1
    return Array(d, tuple(shape))


def gradient(a: Array, axis: int = 0, h: float = 1.0) -> Array:
    """Central differences with one-sided edges (reference
    routines/_gradient.py:36, overlap depth 1)."""
    w, ax = _axis_window(a, axis)
    n = a.shape[ax]
    prev = F.lag(F.col(VALUE_COL), 1).over(w)
    nxt = F.lead(F.col(VALUE_COL), 1).over(w)
    i = F.col(f"i{ax}")
    c = (
        F.when(i == 0, (nxt - F.col(VALUE_COL)) / F.lit(h))
        .when(i == n - 1, (F.col(VALUE_COL) - prev) / F.lit(h))
        .otherwise((nxt - prev) / F.lit(2.0 * h))
    )
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c),
}


def sliding_reduce(a: Array, size: int, agg: str = "sum", axis: int = 0) -> Array:
    """Fused sliding-window reduction: agg over [i, i+size-1]
    (reference ``SlidingWindowReduction``,
    reductions/_sliding_window.py:405 -- windows never materialized;
    Spark's WindowExec evaluates the sliding frame incrementally).
    Output length n-size+1."""
    w, ax = _axis_window(a, axis, (0, size - 1))
    c = _AGGS[agg](F.col(VALUE_COL)).over(w)
    d = a.df.select(*a.index_cols, c.alias(VALUE_COL))
    d = d.filter(F.col(f"i{ax}") <= F.lit(a.shape[ax] - size))
    shape = list(a.shape)
    shape[ax] = shape[ax] - size + 1
    return Array(d, tuple(shape))


def moving_reduce(a: Array, size: int, agg: str = "mean", axis: int = 0, min_count: int = 1) -> Array:
    """Trailing window [i-size+1, i] with min_count NaN masking
    (reference ``MovingWindowReduction``,
    reductions/_sliding_window.py:249; xarray rolling semantics)."""
    w, ax = _axis_window(a, axis, (-(size - 1), 0))
    c = _AGGS[agg](F.col(VALUE_COL)).over(w)
    cnt = F.count(F.col(VALUE_COL)).over(w)
    c = F.when(cnt >= min_count, c)
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def coarsen(a: Array, factor: int, agg: str = "sum", axis: int = 0) -> Array:
    """Block-local downsample by `factor` (reference ``Coarsen``,
    routines/_coarsen.py:42) == groupBy(i DIV k) -- a tumbling index
    window, one partial-aggregated shuffle."""
    axis = axis % a.ndim
    keys = [
        (F.floor(F.col(f"i{k}") / F.lit(factor)).cast("long") if k == axis else F.col(f"i{k}")).alias(f"i{k}")
        for k in range(a.ndim)
    ]
    d = a.df.groupBy(*keys).agg(_AGGS[agg](F.col(VALUE_COL)).alias(VALUE_COL))
    shape = list(a.shape)
    if shape[axis] is not None:
        shape[axis] = (shape[axis] + factor - 1) // factor
    return Array(d.select(*[f"i{k}" for k in range(a.ndim)], VALUE_COL), tuple(shape))


def cumsum_1d_scalable(a: Array, num_partitions: int = 32) -> Array:
    """Distributed prefix sum for pure 1-D arrays: range-partition by
    index, per-partition partial sums (small job), broadcast cumulative
    offsets, then a per-partition window -- the two-level Blelloch
    decomposition (reference reductions/_cumulative.py:451) without the
    single-partition global window."""
    from pyspark import TaskContext
    import numpy as np

    d = a.df.repartitionByRange(num_partitions, "i0").sortWithinPartitions("i0").persist()
    parts = (
        d.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.sum(F.col(VALUE_COL)).alias("__s"))
        .collect()
    )
    offsets = {}
    acc = 0.0
    for row in sorted(parts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__s"] or 0.0
    schema = d.schema

    def add(it):
        pid = TaskContext.get().partitionId()
        run = offsets.get(pid, 0.0)
        for pdf in it:
            vals = pdf[VALUE_COL].to_numpy(dtype="float64")
            out = np.cumsum(vals) + run
            run = out[-1] if len(out) else run
            pdf = pdf.copy()
            pdf[VALUE_COL] = out
            yield pdf

    return Array(d.mapInPandas(add, schema=schema), a.shape)


def ediff1d(a: Array) -> Array:
    """Flat first differences (reference routines/_insert_delete.py:31):
    diff over the raveled array."""
    flat = a if a.ndim == 1 else a.ravel()
    return diff(flat, axis=0)
