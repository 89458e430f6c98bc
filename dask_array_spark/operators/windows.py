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

- scans (cumsum/cumprod/push): the classic two-pass prefix, PURE JVM
  -- index blocks aggregate tiny per-block partials, a window over
  the metadata-sized partials frame yields exclusive block prefixes,
  and a block-PARTITIONED window folds them in -- the reference's
  Blelloch decomposition (reductions/_cumulative.py:451) with correct
  NaN propagation across blocks and zero Python in the data path;
- bounded-depth windows (diff/gradient/sliding/moving): index-math
  halo blocks, PURE JVM -- edge rows union-ship to the neighboring
  block key and an ordinary block-partitioned WindowExec evaluates
  the frame (halo rows inside the frame, trimmed from the output) --
  the reference's banded plan (reductions/_sliding_window.py:405).
  These assume a DENSE axis (every index present; NULL cells
  allowed); sparse axes stay on the window path.
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
_BLOCK_1D = 1 << 18
# above this many block partials, the partials prefix itself recurses
# into a second (super-block) level instead of one unpartitioned window
_PARTIALS_WINDOW_LIMIT = 1 << 17


def _nanfix(a: Array) -> Array:
    """Stray double NaNs (inf-inf, NaN literals) -> the NULL encoding,
    so the NULL-flag scan/window logic below sees them; no-op on
    integer/boolean arrays (see reductions._nan_normalized)."""
    from .reductions import _nan_normalized

    return Array(_nan_normalized(a), a.shape)


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

    PURE JVM, no Python anywhere: pass 1 reduces each index block
    ``i0 DIV block`` to a tiny partial (sum / log-magnitude / negative
    count / zero / null flags); a window over the P-row partials frame
    turns them into exclusive block prefixes (P ~ n/2^20, so this
    single-partition window is metadata-sized); pass 2 is a
    block-PARTITIONED window (fully parallel) folding the prefix in.
    When P itself exceeds _PARTIALS_WINDOW_LIMIT (axes beyond ~3e10
    elements at the default block) the partials prefix RECURSES one
    level: super-block partials, a tiny super-prefix window, and a
    super-PARTITIONED window over the block partials -- no
    single-partition window ever sees more than the limit.
    NaN propagation matches the plain scans: a NaN cell poisons every
    later position, across block boundaries too."""
    # the cached frame is RANGE-partitioned on the block key and
    # sorted by (block, position) BEFORE the persist (optimization
    # round 14, guide §2.4 -- two operations keyed the same way share
    # one exchange): RangePartitioning(__blk) satisfies the clustering
    # the pass-1 aggregate and the pass-2 window both require, and the
    # stored sort order satisfies the window's (__blk, i0) ordering,
    # so the per-execution hash Exchange AND the full-width Sort of
    # the old plan disappear -- the one shuffle happens at cache build
    # and every consumer reads pre-clustered, pre-sorted partitions.
    # Block keys are equal-sized by construction, so range partitions
    # are balanced at any scale.
    d = (
        a.df.withColumn("__blk", F.floor(F.col("i0") / F.lit(block)).cast("long"))
        .repartitionByRange("__blk")
        .sortWithinPartitions("__blk", "i0")
        .persist()
    )
    v = F.col(VALUE_COL)
    # per-block FIRST-NULL / FIRST-ZERO POSITIONS instead of boolean
    # flags (optimization round 14): the old pass 2 tracked "any null
    # so far" / "any zero so far" with a per-row running max window --
    # a second (and third) running aggregate over every row.  "Any
    # null at j <= i within the block" is exactly i >= min(null
    # position), so a per-block scalar comparison replaces the running
    # aggregate; the cross-block part stays in the tiny prefix frame.
    partials = d.groupBy("__blk").agg(
        F.sum(v).alias("__s"),
        F.sum(F.when(v != 0, F.log(F.abs(v)))).alias("__lg"),
        F.sum((v.isNotNull() & (v < 0)).cast("long")).alias("__neg"),
        F.min(F.when(v == 0, F.col("i0"))).alias("__zp"),
        F.min(F.when(v.isNull(), F.col("i0"))).alias("__np"),
    )
    n = a.shape[0]
    nblocks = None if n is None else (n + block - 1) // block
    if nblocks is not None and nblocks > _PARTIALS_WINDOW_LIMIT:
        sub = _PARTIALS_WINDOW_LIMIT
        partials = partials.withColumn(
            "__sb", F.floor(F.col("__blk") / F.lit(sub)).cast("long")
        )
        sp = partials.groupBy("__sb").agg(
            F.sum("__s").alias("__ss"),
            F.sum("__lg").alias("__slg"),
            F.sum("__neg").alias("__sneg"),
            F.max(F.col("__zp").isNotNull().cast("int")).alias("__szero"),
            F.max(F.col("__np").isNotNull().cast("int")).alias("__snull"),
        )
        wsp = Window.orderBy("__sb").rowsBetween(Window.unboundedPreceding, -1)
        sprefix = sp.select(
            "__sb",
            F.coalesce(F.sum("__ss").over(wsp), F.lit(0.0)).alias("__sps"),
            F.coalesce(F.sum("__slg").over(wsp), F.lit(0.0)).alias("__splg"),
            F.coalesce(F.sum("__sneg").over(wsp), F.lit(0).cast("long")).alias("__spneg"),
            F.coalesce(F.max("__szero").over(wsp), F.lit(0)).alias("__spzero"),
            F.coalesce(F.max("__snull").over(wsp), F.lit(0)).alias("__spnull"),
        )
        wp2 = Window.partitionBy("__sb").orderBy("__blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        prefix = partials.join(sprefix, on="__sb").select(
            "__blk",
            "__zp",
            "__np",
            (F.coalesce(F.sum("__s").over(wp2), F.lit(0.0)) + F.col("__sps")).alias("__ps"),
            (F.coalesce(F.sum("__lg").over(wp2), F.lit(0.0)) + F.col("__splg")).alias("__plg"),
            (
                F.coalesce(F.sum("__neg").over(wp2), F.lit(0).cast("long"))
                + F.col("__spneg")
            ).alias("__pneg"),
            F.greatest(
                F.coalesce(
                    F.max(F.col("__zp").isNotNull().cast("int")).over(wp2), F.lit(0)
                ),
                F.col("__spzero"),
            ).alias("__pzero"),
            F.greatest(
                F.coalesce(
                    F.max(F.col("__np").isNotNull().cast("int")).over(wp2), F.lit(0)
                ),
                F.col("__spnull"),
            ).alias("__pnull"),
        )
    else:
        wp = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
        prefix = partials.select(
            "__blk",
            "__zp",
            "__np",
            F.coalesce(F.sum("__s").over(wp), F.lit(0.0)).alias("__ps"),
            F.coalesce(F.sum("__lg").over(wp), F.lit(0.0)).alias("__plg"),
            F.coalesce(F.sum("__neg").over(wp), F.lit(0).cast("long")).alias("__pneg"),
            F.coalesce(
                F.max(F.col("__zp").isNotNull().cast("int")).over(wp), F.lit(0)
            ).alias("__pzero"),
            F.coalesce(
                F.max(F.col("__np").isNotNull().cast("int")).over(wp), F.lit(0)
            ).alias("__pnull"),
        )
    # EXPLICIT broadcast when the prefix frame is provably bounded
    # (nblocks <= the partials window limit, ~6 MB of rows): a plain
    # join plans as SortMergeJoin and EnsureRequirements re-exchanges
    # AND re-sorts the corpus side, throwing away the cached range
    # partitioning -- the static BroadcastHashJoin preserves the
    # streamed side's partitioning and ordering, so the pass-2 window
    # runs with NO Exchange and NO Sort.  Unknown or huge block counts
    # keep the planner's choice (AQE broadcasts when small).
    if nblocks is not None and nblocks <= _PARTIALS_WINDOW_LIMIT:
        j = d.join(F.broadcast(prefix), on="__blk")
    else:
        j = d.join(prefix, on="__blk")  # P rows: AQE broadcasts
    w = Window.partitionBy("__blk").orderBy("i0").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # block-local "seen a null/zero at j <= i": position compare
    # against the per-block first-occurrence scalar (exact -- see the
    # partials comment), not a running max window
    blk_null = F.col("__np").isNotNull() & (F.col("i0") >= F.col("__np"))
    blk_zero = F.col("__zp").isNotNull() & (F.col("i0") >= F.col("__zp"))
    if kind in ("cumsum", "nancumsum"):
        run = F.coalesce(F.sum(v).over(w), F.lit(0.0)) + F.col("__ps")
        if kind == "cumsum":
            seen_null = (F.col("__pnull") == 1) | blk_null
            c = F.when(seen_null, F.lit(None)).otherwise(run)
        else:
            c = run
    else:  # cumprod / nancumprod
        zeros = F.when((F.col("__pzero") == 1) | blk_zero, F.lit(1)).otherwise(
            F.lit(0)
        )
        negs = (
            F.coalesce(
                F.sum((v.isNotNull() & (v < 0)).cast("long")).over(w),
                F.lit(0).cast("long"),
            )
            + F.col("__pneg")
        )
        mag = F.exp(
            F.coalesce(F.sum(F.log(F.when(v != 0, F.abs(v)))).over(w), F.lit(0.0))
            + F.col("__plg")
        )
        sign = F.when(negs % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
        c = F.when(zeros == 1, F.lit(0.0)).otherwise(sign * mag)
        if kind == "cumprod":
            seen_null = (F.col("__pnull") == 1) | blk_null
            c = F.when(seen_null, F.lit(None)).otherwise(c)
    return Array(j.select("i0", c.cast("double").alias(VALUE_COL)), a.shape)


def _push_1d(a: Array, block: int = _BLOCK_1D) -> Array:
    """Two-pass distributed forward-fill (unbounded limit), pure JVM:
    per-block last-non-null partials over the full block spine, an
    ignore-nulls prefix window over the tiny partials frame, then a
    block-partitioned ffill window with the carry as fallback."""
    d = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    ).persist()
    v = F.col(VALUE_COL)
    spine = d.select("__blk").distinct()
    lasts = (
        d.filter(v.isNotNull())
        .groupBy("__blk")
        .agg(F.max_by(v, F.col("i0")).alias("__last"))
    )
    n = a.shape[0]
    nblocks = None if n is None else (n + block - 1) // block
    if nblocks is not None and nblocks > _PARTIALS_WINDOW_LIMIT:
        # recursive level, same shape as _scan_1d: carry = last
        # non-null within the super block, else the super carry
        sub = _PARTIALS_WINDOW_LIMIT
        sb = F.floor(F.col("__blk") / F.lit(sub)).cast("long")
        spine2 = spine.withColumn("__sb", sb)
        super_lasts = (
            lasts.withColumn("__sb", sb)
            .groupBy("__sb")
            .agg(F.max_by("__last", F.col("__blk")).alias("__slast"))
        )
        wsp = Window.orderBy("__sb").rowsBetween(Window.unboundedPreceding, -1)
        sprefix = (
            spine2.select("__sb")
            .distinct()
            .join(super_lasts, on="__sb", how="left")
            .select(
                "__sb",
                F.last("__slast", ignorenulls=True).over(wsp).alias("__scarry"),
            )
        )
        wp2 = Window.partitionBy("__sb").orderBy("__blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        prefix = (
            spine2.join(lasts, on="__blk", how="left")
            .join(sprefix, on="__sb")
            .select(
                "__blk",
                F.coalesce(
                    F.last("__last", ignorenulls=True).over(wp2), F.col("__scarry")
                ).alias("__carry"),
            )
        )
    else:
        wp = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
        prefix = spine.join(lasts, on="__blk", how="left").select(
            "__blk", F.last("__last", ignorenulls=True).over(wp).alias("__carry")
        )
    j = d.join(prefix, on="__blk")
    w = Window.partitionBy("__blk").orderBy("i0").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = F.coalesce(F.last(v, ignorenulls=True).over(w), F.col("__carry"))
    return Array(j.select("i0", c.cast("double").alias(VALUE_COL)), a.shape)


def _halo_blocks(a: Array, left: int, right: int, block: int = _BLOCK_1D):
    """Bounded-depth 1-D windows over a DENSE axis, pure JVM: rows
    within ``right`` of a block start also union-ship to the previous
    block key (and within ``left`` of a block end to the next), tagged
    ``__h = 1``; the caller runs an ordinary block-PARTITIONED window
    over the result (each partition sees its halo rows inside the
    frame) and keeps only ``__h = 0`` home rows -- the reference's
    halo exchange as one union + one hash exchange, zero Python.

    Depths >= ``block`` ship to ceil(depth/block) neighboring blocks
    (one union branch per hop), so window sizes are not silently capped
    at the block size; each row fans out at most depth/block times,
    which is exactly the data duplication any halo exchange pays."""
    n = a.shape[0]
    if n is None:
        raise ValueError("scalable 1-D windows need a known axis length")
    last_blk = (n - 1) // block
    base = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    ).withColumn("__h", F.lit(0))
    d = base
    pos = F.col("i0") % F.lit(block)
    s = 1
    while right - (s - 1) * block > 0:
        lo_rows = base.filter(
            (pos < F.lit(right - (s - 1) * block)) & (F.col("__blk") >= s)
        ).withColumn("__blk", F.col("__blk") - s).withColumn("__h", F.lit(1))
        d = d.unionByName(lo_rows)
        s += 1
    s = 1
    while left - (s - 1) * block > 0:
        hi_rows = base.filter(
            (pos >= F.lit(s * block - left)) & (F.col("__blk") + s <= last_blk)
        ).withColumn("__blk", F.col("__blk") + s).withColumn("__h", F.lit(1))
        d = d.unionByName(hi_rows)
        s += 1
    w = Window.partitionBy("__blk").orderBy("i0")
    return d, w


def cumsum(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """Running sum with NumPy NaN propagation (once NaN, all later NaN).
    Pure-1-D axes above SCALABLE_1D_THRESHOLD route to the two-pass
    distributed scan."""
    a = _nanfix(a)
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "cumsum")
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    seen_null = F.max(F.col(VALUE_COL).isNull().cast("int")).over(w)
    c = F.when(seen_null == 1, F.lit(None)).otherwise(F.sum(F.col(VALUE_COL)).over(w))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def nancumsum(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    a = _nanfix(a)
    if _route_1d(a, axis, scalable):
        return _scan_1d(a, "nancumsum")
    w, ax = _axis_window(a, axis, (Window.unboundedPreceding, Window.currentRow))
    c = F.coalesce(F.sum(F.col(VALUE_COL)).over(w), F.lit(0.0))
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def cumprod(a: Array, axis: int = 0, scalable: bool | None = None) -> Array:
    """Running product via the exp-log-sum decomposition with running
    sign / zero tracking (SURVEY.md section 4.4 'cumprod log-trick')."""
    a = _nanfix(a)
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
    a = _nanfix(a)
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
    a = _nanfix(a)
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
        d, w = _halo_blocks(a, left=0, right=1)
        c = F.lead(F.col(VALUE_COL), 1).over(w) - F.col(VALUE_COL)
        out = (
            d.withColumn("__d", c)
            .filter((F.col("__h") == 0) & (F.col("i0") < F.lit(n - 1)))
            .select("i0", F.col("__d").cast("double").alias(VALUE_COL))
        )
        return Array(out, (n - 1,))
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
        d, w = _halo_blocks(a, left=1, right=1)
        prev = F.lag(F.col(VALUE_COL), 1).over(w)
        nxt = F.lead(F.col(VALUE_COL), 1).over(w)
        i = F.col("i0")
        c = (
            F.when(i == 0, (nxt - F.col(VALUE_COL)) / F.lit(h))
            .when(i == n - 1, (F.col(VALUE_COL) - prev) / F.lit(h))
            .otherwise((nxt - prev) / F.lit(2.0 * h))
        )
        out = (
            d.withColumn("__g", c)
            .filter(F.col("__h") == 0)
            .select("i0", F.col("__g").cast("double").alias(VALUE_COL))
        )
        return Array(out, a.shape)
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
        d, w = _halo_blocks(a, left=0, right=size - 1)
        c = _AGGS[agg](F.col(VALUE_COL)).over(w.rowsBetween(0, size - 1))
        out = (
            d.withColumn("__s", c)
            .filter((F.col("__h") == 0) & (F.col("i0") <= F.lit(n - size)))
            .select("i0", F.col("__s").cast("double").alias(VALUE_COL))
        )
        return Array(out, (n - size + 1,))
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
    a = _nanfix(a)
    if _route_1d(a, axis, scalable):
        d, w = _halo_blocks(a, left=size - 1, right=0)
        frame = w.rowsBetween(-(size - 1), 0)
        c = _AGGS[agg](F.col(VALUE_COL)).over(frame)
        cnt = F.count(F.col(VALUE_COL)).over(frame)
        out = (
            d.withColumn("__m", F.when(cnt >= min_count, c))
            .filter(F.col("__h") == 0)
            .select("i0", F.col("__m").cast("double").alias(VALUE_COL))
        )
        return Array(out, a.shape)
    w, ax = _axis_window(a, axis, (-(size - 1), 0))
    c = _AGGS[agg](F.col(VALUE_COL)).over(w)
    cnt = F.count(F.col(VALUE_COL)).over(w)
    c = F.when(cnt >= min_count, c)
    return Array(a.df.select(*a.index_cols, c.alias(VALUE_COL)), a.shape)


def coarsen(a: Array, factor: int, agg: str = "sum", axis: int = 0) -> Array:
    """Block-local downsample by `factor` (reference ``Coarsen``,
    routines/_coarsen.py:42) == groupBy(i DIV k) -- a tumbling index
    window, one partial-aggregated shuffle."""
    a = _nanfix(a)
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
