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
1-D array would have a single partition, so every 1-D window op ROUTES
AUTOMATICALLY to a distributed decomposition above
``SCALABLE_1D_THRESHOLD`` elements (override with ``scalable=``):

- scans (cumsum/cumprod/push): the classic two-pass prefix -- index
  blocks aggregate tiny per-block partials, the driver prefixes the
  P-row summary, and a second blockwise pass applies offsets -- the
  reference's Blelloch decomposition (reductions/_cumulative.py:451)
  with correct NaN propagation across blocks;
- bounded-depth windows (diff/gradient/sliding/moving): index-math
  halo blocks -- edge rows union-ship to the neighboring block key and
  one groupBy(block).applyInPandas runs the banded kernel (reference
  reductions/_sliding_window.py:405 banded plan).  These assume a
  DENSE axis (every index present; NULL cells allowed); sparse axes
  stay on the window path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    "SCALABLE_1D_THRESHOLD",
]

# a pure-1-D window above this many elements routes to the distributed
# two-pass / halo-block decomposition instead of one WindowExec
SCALABLE_1D_THRESHOLD = 1 << 20
_BLOCK_1D = 1 << 20


def _axis_window(a: Array, axis: int, frame=None):
    axis = axis % a.ndim
    others = [f"i{k}" for k in range(a.ndim) if k != axis]
    w = Window.partitionBy(*others).orderBy(F.col(f"i{axis}"))
    if frame is not None:
        w = w.rowsBetween(*frame)
    return w, axis


def _route_1d(a: Array, axis: int, scalable: bool | None) -> bool:
    """True -> use the distributed 1-D decomposition."""
    if a.ndim != 1 or (axis % 1) != 0:
        return False
    if scalable is not None:
        return scalable
    n = a.shape[0]
    return n is not None and n >= SCALABLE_1D_THRESHOLD


def _scan_1d(a: Array, kind: str, block: int = _BLOCK_1D) -> Array:
    """Two-pass distributed prefix scan over a 1-D axis (works for
    sparse or dense cells; ROWS semantics over present rows ordered by
    index).  kind in {cumsum, nancumsum, cumprod, nancumprod}.

    Pass 1 reduces each index block ``i0 DIV block`` to a tiny partial
    (sum / log-magnitude+sign+zero / null flag); the driver prefixes
    the P-row summary; pass 2 re-scans each block with its incoming
    state.  NaN propagation matches the plain scans: a NaN cell
    poisons every later position, across block boundaries too."""
    d = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    ).persist()
    v = F.col(VALUE_COL)
    parts = (
        d.groupBy("__blk")
        .agg(
            F.sum(v).alias("__s"),
            F.sum(F.when(v != 0, F.log(F.abs(v)))).alias("__lg"),
            F.sum((v < 0).cast("long")).alias("__neg"),
            F.max((v == 0).cast("int")).alias("__zero"),
            F.max(v.isNull().cast("int")).alias("__null"),
        )
        .collect()
    )
    state: dict[int, tuple] = {}
    run_sum, run_lg, run_neg, run_zero, run_null = 0.0, 0.0, 0, False, False
    for row in sorted(parts, key=lambda r: r["__blk"]):
        state[row["__blk"]] = (run_sum, run_lg, run_neg, run_zero, run_null)
        run_sum += row["__s"] or 0.0
        run_lg += row["__lg"] or 0.0
        run_neg += row["__neg"] or 0
        run_zero = run_zero or bool(row["__zero"])
        run_null = run_null or bool(row["__null"])

    schema = "i0 long, " + VALUE_COL + " double"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i0")
        blk = int(pdf["__blk"].iloc[0])
        s0, lg0, neg0, zero0, null0 = state.get(blk, (0.0, 0.0, 0, False, False))
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        isnan = np.isnan(vals)
        if kind == "cumsum":
            out = np.cumsum(np.where(isnan, 0.0, vals)) + s0
            poisoned = np.maximum.accumulate(isnan) | null0
            out = np.where(poisoned, np.nan, out)
        elif kind == "nancumsum":
            out = np.cumsum(np.where(isnan, 0.0, vals)) + s0
        else:  # cumprod / nancumprod
            nz = (~isnan) & (vals != 0)
            lg = np.cumsum(np.where(nz, np.log(np.abs(np.where(nz, vals, 1.0))), 0.0)) + lg0
            neg = np.cumsum((~isnan) & (vals < 0)) + neg0
            zero = np.maximum.accumulate((~isnan) & (vals == 0)) | zero0
            sign = np.where(neg % 2 == 1, -1.0, 1.0)
            out = np.where(zero, 0.0, sign * np.exp(lg))
            if kind == "cumprod":
                poisoned = np.maximum.accumulate(isnan) | null0
                out = np.where(poisoned, np.nan, out)
        return pd.DataFrame({"i0": pdf["i0"].to_numpy(dtype="int64"), VALUE_COL: out})

    return Array(d.groupBy("__blk").applyInPandas(scan, schema=schema), a.shape)


def _push_1d(a: Array, block: int = _BLOCK_1D) -> Array:
    """Two-pass distributed forward-fill (unbounded limit)."""
    d = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    ).persist()
    parts = (
        d.filter(F.col(VALUE_COL).isNotNull())
        .groupBy("__blk")
        .agg(F.max_by(F.col(VALUE_COL), F.col("i0")).alias("__last"))
        .collect()
    )
    # walk every block id (blocks with no non-null rows are absent from
    # `parts` but still need their incoming carry)
    all_blks = sorted(r["__blk"] for r in d.select("__blk").distinct().collect())
    seen = {r["__blk"]: r["__last"] for r in parts}
    carry_in: dict[int, float | None] = {}
    carry = None
    for blk in all_blks:
        carry_in[blk] = carry
        if seen.get(blk) is not None:
            carry = seen[blk]

    schema = "i0 long, " + VALUE_COL + " double"

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i0")
        blk = int(pdf["__blk"].iloc[0])
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        prev = carry_in.get(blk)
        if prev is not None:
            vals = np.concatenate(([float(prev)], vals))
        valid = np.where(~np.isnan(vals), np.arange(len(vals)), 0)
        np.maximum.accumulate(valid, out=valid)
        out = vals[valid]
        if prev is not None:
            out = out[1:]
        return pd.DataFrame({"i0": pdf["i0"].to_numpy(dtype="int64"), VALUE_COL: out})

    return Array(d.groupBy("__blk").applyInPandas(fill, schema=schema), a.shape)


def _halo_1d(
    a: Array,
    left: int,
    right: int,
    kernel,
    out_len: int | None,
    block: int = _BLOCK_1D,
) -> Array:
    """Bounded-depth 1-D window over a DENSE axis via index-math halo
    blocks: rows within ``left`` of a block start also ship to the
    previous block key, rows within ``right`` of a block end to the
    next; one groupBy(block).applyInPandas runs ``kernel(x, lo)`` over
    the assembled dense slice (NaN = NULL cell) and returns the values
    for the block's core indices."""
    n = a.shape[0]
    if n is None:
        raise ValueError("scalable 1-D windows need a known axis length")
    d = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    )
    pos = F.col("i0") % F.lit(block)
    if right > 0:
        lo_rows = d.filter((pos < right) & (F.col("__blk") > 0)).withColumn(
            "__blk", F.col("__blk") - 1
        )
        d = d.unionByName(lo_rows)
    if left > 0:
        hi_rows = d.filter(
            (pos >= block - left) & (F.col("i0") < (n // block) * block)
        ).withColumn("__blk", F.col("__blk") + 1)
        d = d.unionByName(hi_rows)

    schema = "i0 long, " + VALUE_COL + " double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        blk = int(pdf["__blk"].iloc[0])
        core_lo = blk * block
        core_hi = min(core_lo + block, n)
        lo = max(core_lo - left, 0)
        hi = min(core_hi + right, n)
        x = np.full(hi - lo, np.nan)
        x[pdf["i0"].to_numpy(dtype="int64") - lo] = pd.to_numeric(
            pdf[VALUE_COL]
        ).to_numpy(dtype="float64")
        out = kernel(x, lo)  # aligned with x's indices [lo, hi)
        s = slice(core_lo - lo, core_hi - lo)
        idx = np.arange(core_lo, core_hi)
        vals = out[s]
        if out_len is not None:
            keep = idx < out_len
            idx, vals = idx[keep], vals[keep]
        good = ~np.isnan(vals)
        return pd.DataFrame({"i0": idx[good], VALUE_COL: vals[good]})

    out_shape = (out_len if out_len is not None else n,)
    return Array(d.groupBy("__blk").applyInPandas(run, schema=schema), out_shape)


def cumsum(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """Running sum with NumPy NaN propagation (once NaN, all later NaN).
    Pure-1-D axes above SCALABLE_1D_THRESHOLD route to the two-pass
    distributed scan."""
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "cumsum")
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    seen_null = F.max(F.col(VALUE_COL).isNull().cast("int")).over(w)
    c = F.when(seen_null == 1, F.lit(None)).otherwise(F.sum(F.col(VALUE_COL)).over(w))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def nancumsum(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "nancumsum")
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    c = F.coalesce(F.sum(F.col(VALUE_COL)).over(w), F.lit(0.0))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def cumprod(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """Running product via the exp-log-sum decomposition with running
    sign / zero tracking (SURVEY.md section 4.4 'cumprod log-trick')."""
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "cumprod")
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


def nancumprod(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """NaN-skipping running product (reference nancumprod,
    reductions/_cumulative.py): NULL cells contribute factor 1."""
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "nancumprod")
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


def push(a: Array, axis: int = 0, limit: int | None = None, scalable: bool | None = None) -> Array:
    """Forward-fill last valid value (reference _overlap.py:1441)."""
    if limit is None and _route_1d(a, axis, scalable):
        return _push_1d(a)
    if limit is None:
        w, _ = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    else:
        w, _ = _axis_window(a, axis, (-limit, Window.currentRow))
    c = F.last(F.col(VALUE_COL), ignorenulls=True).over(w)
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def diff(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """x[i+1] - x[i] (reference routines/_diff.py:6): lead-lag over the
    axis window; output length n-1."""
    if _route_1d(a, axis, scalable):
        n = a.shape[0]

        def _diff_kernel(x, lo):
            out = np.full_like(x, np.nan)
            out[:-1] = x[1:] - x[:-1]
            return out

        return _halo_1d(a, left=0, right=1, kernel=_diff_kernel, out_len=n - 1)
    w, ax = _axis_window(a, axis)
    nxt = F.lead(F.col(VALUE_COL), 1).over(w)
    d = a.df.select(
        *a.index_cols, nxt.alias("__nxt"), F.col(VALUE_COL).alias("__cur")
    )
    if a.shape[ax] is not None:
        d = d.filter(F.col(f"i{ax}") < F.lit(a.shape[ax] - 1))
    else:
        # unknown length (sparse index): drop the last row per
        # partition -- detected by leading the INDEX column, so an
        # interior NULL-valued successor still yields a NULL diff row
        # (leading the value column cannot tell 'next value is NULL'
        # from 'no next row')
        nxt_idx = F.lead(F.col(f"i{ax}"), 1).over(w)
        d = a.df.select(
            *a.index_cols,
            nxt.alias("__nxt"),
            F.col(VALUE_COL).alias("__cur"),
            nxt_idx.alias("__nxt_i"),
        ).filter(F.col("__nxt_i").isNotNull())
    d = d.select(*a.index_cols, (F.col("__nxt") - F.col("__cur")).alias(VALUE_COL))
    shape = list(a.shape)
    shape[ax] = None if shape[ax] is None else shape[ax] - 1
    return Array(d, tuple(shape))


def gradient(a: Array, axis: int = 0, h: float = 1.0, scalable: bool | None = None) -> Array:
    """Central differences with one-sided edges (reference
    routines/_gradient.py:36, overlap depth 1)."""
    if _route_1d(a, axis, scalable):
        n = a.shape[0]

        def _grad_kernel(x, lo):
            out = np.full_like(x, np.nan)
            if len(x) >= 2:
                out[1:-1] = (x[2:] - x[:-2]) / (2.0 * h)
                if lo == 0:
                    out[0] = (x[1] - x[0]) / h
                if lo + len(x) == n:
                    out[-1] = (x[-1] - x[-2]) / h
            return out

        return _halo_1d(a, left=1, right=1, kernel=_grad_kernel, out_len=n)
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


_NP_AGGS = {"sum": "nansum", "mean": "nanmean", "min": "nanmin", "max": "nanmax"}


def _window_view_reduce(x: "np.ndarray", size: int, agg: str):
    """NaN-skipping reduce over all length-``size`` windows of x."""
    import warnings

    win = np.lib.stride_tricks.sliding_window_view(x, size)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN windows
        out = getattr(np, _NP_AGGS[agg])(win, axis=1)
    cnt = np.sum(~np.isnan(win), axis=1)
    return out, cnt


def sliding_reduce(
    a: Array, size: int, agg: str = "sum", axis: int = 0, scalable: bool | None = None
) -> Array:
    """Fused sliding-window reduction: agg over [i, i+size-1]
    (reference ``SlidingWindowReduction``,
    reductions/_sliding_window.py:405 -- windows never materialized;
    Spark's WindowExec evaluates the sliding frame incrementally).
    Output length n-size+1.  Dense 1-D axes above the threshold route
    to halo blocks with a banded in-kernel window."""
    if _route_1d(a, axis, scalable):
        n = a.shape[0]

        def _slide_kernel(x, lo):
            out = np.full_like(x, np.nan)
            if len(x) >= size:
                vals, cnt = _window_view_reduce(x, size, agg)
                vals = np.where(cnt > 0, vals, np.nan)
                out[: len(x) - size + 1] = vals
            return out

        return _halo_1d(
            a, left=0, right=size - 1, kernel=_slide_kernel, out_len=n - size + 1
        )
    w, ax = _axis_window(a, axis, (0, size - 1))
    c = _AGGS[agg](F.col(VALUE_COL)).over(w)
    d = a.df.select(*a.index_cols, c.alias(VALUE_COL))
    d = d.filter(F.col(f"i{ax}") <= F.lit(a.shape[ax] - size))
    shape = list(a.shape)
    shape[ax] = shape[ax] - size + 1
    return Array(d, tuple(shape))


def moving_reduce(
    a: Array,
    size: int,
    agg: str = "mean",
    axis: int = 0,
    min_count: int = 1,
    scalable: bool | None = None,
) -> Array:
    """Trailing window [i-size+1, i] with min_count NaN masking
    (reference ``MovingWindowReduction``,
    reductions/_sliding_window.py:249; xarray rolling semantics)."""
    if _route_1d(a, axis, scalable):
        n = a.shape[0]

        def _move_kernel(x, lo):
            pad = np.concatenate((np.full(size - 1, np.nan), x))
            vals, cnt = _window_view_reduce(pad, size, agg)
            # window i of pad ends at x[i]; ramp-up windows at the true
            # array start are NaN-padded, matching the ROWS frame only
            # when lo == 0 (interior blocks carry a real left halo)
            return np.where(cnt >= min_count, vals, np.nan)

        return _halo_1d(a, left=size - 1, right=0, kernel=_move_kernel, out_len=n)
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
    """Explicit entry to the distributed two-pass prefix sum (the
    automatic route for large 1-D axes); NaN propagation matches
    ``cumsum`` exactly -- a NaN cell poisons every later position,
    across block boundaries too (reference Blelloch scan,
    reductions/_cumulative.py:451)."""
    return _scan_1d(a, "cumsum")


def ediff1d(a: Array) -> Array:
    """Flat first differences (reference routines/_insert_delete.py:31):
    diff over the raveled array."""
    flat = a if a.ndim == 1 else a.ravel()
    return diff(flat, axis=0)
