"""Reductions: axis aggregations in partial/final form.

Parity: the reference's ``Reduction`` -> ``PartialReduce`` tree
(/root/reference/dask_array/reductions/_reduction.py:25,154-257) is
exactly Spark's partial/final HashAggregate -- ``groupBy`` on the kept
axes compiles to map-side partial aggregation, a shuffle on the group
key, and a final merge, so the reference's ``split_every`` fan-in
machinery needs no re-implementation (SURVEY.md section 2.5).

NaN semantics: NumPy default reductions PROPAGATE NaN; ``nan*``
variants skip.  NaN is encoded as SQL NULL, so plain reductions wrap
the aggregate in an any-null guard while nan* variants are the bare
(null-skipping) Spark aggregates (reference NaN-skipping chunk fns,
/root/reference/dask_array/reductions/_common.py:172-268).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array, idx_cols

__all__ = [
    "reduction",
    "cumreduction",
    "sum",
    "nansum",
    "prod",
    "nanprod",
    "amin",
    "amax",
    "nanmin",
    "nanmax",
    "mean",
    "nanmean",
    "var",
    "std",
    "nanvar",
    "nanstd",
    "any_",
    "all_",
    "argmin",
    "argmax",
    "nanargmin",
    "nanargmax",
    "median",
    "nanmedian",
    "quantile",
    "quantiles",
    "percentile_approx",
    "count_nonzero",
    "average",
    "ptp",
    "moment",
    "topk",
    "argtopk",
    "bincount",
    "histogram",
    "histogram2d",
    "histogramdd",
    "unique_table",
    "grouping_sum",
    "kth_smallest",
    "median_scalable",
    "reduce_axes",
]



def _norm_axes(a: Array, axis) -> tuple[list[int], list[int]]:
    """-> (reduced_axes, kept_axes), both in original order."""
    if axis is None:
        red = list(range(a.ndim))
    elif isinstance(axis, (tuple, list)):
        red = sorted(ax % a.ndim for ax in axis)
    else:
        red = [axis % a.ndim]
    kept = [ax for ax in range(a.ndim) if ax not in red]
    return red, kept


def _propagate(agg: Column, c: Column) -> Column:
    """NumPy NaN propagation: any NULL in the group -> NULL result."""
    return F.when(F.count(F.lit(1)) > F.count(c), F.lit(None)).otherwise(agg)


def _nan_normalized(a: Array) -> DataFrame:
    """Cell frame with stray double NaNs folded into the NULL encoding.

    NaN is NULL by core contract (core/array.py:17), but a real double
    NaN can still be computed JVM-side (inf-inf, inf*0, a NaN literal).
    Spark's aggregate/sort NaN semantics (NaN sorts LARGEST, sum/avg
    propagate it) differ from both the contract and NumPy's nan*
    family, so every reduction normalizes first; one codegen-stage
    ``when(isnan)`` per cell, no extra shuffle or pass."""
    from pyspark.sql.types import DoubleType, FloatType

    d = a.df
    if isinstance(d.schema[VALUE_COL].dataType, (DoubleType, FloatType)):
        c = F.col(VALUE_COL)
        keep = [F.col(f) for f in d.columns if f != VALUE_COL]
        d = d.select(*keep, F.when(F.isnan(c), F.lit(None)).otherwise(c).alias(VALUE_COL))
    return d


def reduce_axes(a: Array, axis, aggs: Callable[[Column], list[Column]]) -> Array:
    """Shared groupBy-on-kept-axes skeleton.  ``aggs(valuecol)`` returns
    one aggregate Column aliased ``v`` (first element used)."""
    red, kept = _norm_axes(a, axis)
    d = _nan_normalized(a)
    exprs = aggs(F.col(VALUE_COL))
    if not kept:
        out = d.agg(exprs[0].alias(VALUE_COL))
        return Array(out, ())
    gb = d.groupBy(*[F.col(f"i{ax}") for ax in kept])
    out = gb.agg(exprs[0].alias(VALUE_COL))
    # renumber kept axes to i0..i{m-1}
    sel = [F.col(f"i{ax}").alias(f"i{k}") for k, ax in enumerate(kept)] + [F.col(VALUE_COL)]
    return Array(out.select(*sel), tuple(a.shape[ax] for ax in kept))


def quantiles(a: Array, qs: Sequence[float], axis=None) -> Array:
    """Several exact quantiles at once: one grouped ``percentile``
    aggregate returning an array, exploded to a new trailing axis
    (reference multi-q ``quantile``, reductions/_common.py:977)."""
    red, kept = _norm_axes(a, axis)
    arr_q = F.array(*[F.lit(float(q)) for q in qs])
    agg = F.percentile(F.col(VALUE_COL), arr_q)
    m = len(kept)
    base = _nan_normalized(a)
    if kept:
        d = base.groupBy(*[F.col(f"i{ax}") for ax in kept]).agg(agg.alias("__qs"))
        sel = [F.col(f"i{ax}").alias(f"i{k}") for k, ax in enumerate(kept)]
        out = d.select(*sel, F.posexplode("__qs").alias(f"i{m}", VALUE_COL))
    else:
        d = base.agg(agg.alias("__qs"))
        out = d.select(F.posexplode("__qs").alias("i0", VALUE_COL))
    shape = tuple(a.shape[ax] for ax in kept) + (len(qs),)
    return Array(out.select(*[f"i{k}" for k in range(m + 1)], VALUE_COL), shape)


def grouping_sum(a: Array, mode: str = "rollup") -> DataFrame:
    """Grouping-set aggregations over a 2-D array: rollup / cube /
    explicit grouping sets of the index axes -- free from Spark
    (SURVEY.md section 2.5: the reference's nearest analog is reducing
    over axis SUBSETS; Spark's rollup/cube give every subset in ONE
    pass with partial aggregation).  NULL index = aggregated-out axis;
    returns (i0, i1, v) with nullable indexes."""
    if a.ndim != 2:
        raise ValueError("grouping_sum is defined for 2-D arrays")
    d = a.df
    if mode == "rollup":
        g = d.rollup("i0", "i1")
    elif mode == "cube":
        g = d.cube("i0", "i1")
    else:
        raise ValueError("mode must be rollup|cube")
    return g.agg(F.sum(VALUE_COL).alias(VALUE_COL)).select("i0", "i1", VALUE_COL)


# -- basic family ---------------------------------------------------------

def sum(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.sum(c), c)])


def nansum(a: Array, axis=None) -> Array:
    zero = F.lit(0).cast(a.dtype)
    return reduce_axes(a, axis, lambda c: [F.coalesce(F.sum(c), zero)])


def amin(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.min(c), c)])


def amax(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.max(c), c)])


def nanmin(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.min(c)])


def nanmax(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.max(c)])


def mean(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.avg(c), c)])


def nanmean(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.avg(c)])


def any_(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.max(c.cast("boolean"))])


def all_(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.min(c.cast("boolean"))])


def _prod_agg(c: Column) -> Column:
    """Distributed product via the exp(sum(ln|x|)) decomposition with
    explicit zero and sign handling (reference carries a product kernel,
    /root/reference/dask_array/reductions/_common.py:57-170; SQL has no
    product aggregate, SURVEY.md section 4.4 'cumprod log-trick')."""
    nonzero = F.when(c != 0, F.abs(c))
    magnitude = F.exp(F.sum(F.log(nonzero)))
    n_zero = F.count(F.when(c == 0, F.lit(1)))
    n_neg = F.count(F.when(c < 0, F.lit(1)))
    sign = F.when(n_neg % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * magnitude)


def prod(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(_prod_agg(c), c)])


def nanprod(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.coalesce(_prod_agg(c), F.lit(1.0))])


# -- variance family ------------------------------------------------------

def _var_agg(c: Column, ddof: int) -> Column:
    if ddof == 0:
        return F.var_pop(c)
    if ddof == 1:
        return F.var_samp(c)
    # general ddof: var_pop * n / (n - ddof)
    n = F.count(c)
    return F.var_pop(c) * n / (n - F.lit(ddof))


def var(a: Array, axis=None, ddof: int = 0) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(_var_agg(c, ddof), c)])


def std(a: Array, axis=None, ddof: int = 0) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.sqrt(_var_agg(c, ddof)), c)])


def nanvar(a: Array, axis=None, ddof: int = 0) -> Array:
    return reduce_axes(a, axis, lambda c: [_var_agg(c, ddof)])


def nanstd(a: Array, axis=None, ddof: int = 0) -> Array:
    return reduce_axes(a, axis, lambda c: [F.sqrt(_var_agg(c, ddof))])


def moment(a: Array, order: int, axis=None) -> Array:
    """Central moment E[(x-mean)^k]; the reference merges power sums
    (/root/reference/dask_array/reductions/_common.py:368-673).  Here:
    expand the binomial over raw power sums in ONE aggregation pass --
    m_k = (1/n) * sum_j C(k,j) * S_j * (-mu)^(k-j) -- instead of a
    two-pass mean-then-deviation plan."""
    import math

    def aggs(c: Column) -> list[Column]:
        n = F.count(c)
        mu = F.sum(c) / n
        total = F.lit(0.0)
        for j in range(order + 1):
            coef = math.comb(order, j)
            s_j = F.sum(F.pow(c, F.lit(j)))
            total = total + F.lit(coef) * s_j * F.pow(-mu, F.lit(order - j))
        return [_propagate(total / n, c)]

    return reduce_axes(a, axis, aggs)


# -- arg reductions -------------------------------------------------------

def _arg_reduce(a: Array, axis, best: Callable[[Column], Column], skipna: bool) -> Array:
    """Deterministic argmin/argmax: smallest index among ties (NumPy
    'first occurrence'; reference re-bases per-chunk winners with global
    offsets, /root/reference/dask_array/reductions/_common.py:675-830 --
    unnecessary here because the global index is a column).

    Implemented as best-value-per-group + semi-join-back + min(index):
    two partial aggregations, no window, fully parallel.
    """
    red, kept = _norm_axes(a, axis)
    if len(red) != 1:
        raise ValueError("argmin/argmax reduce exactly one axis (or flatten first)")
    ax = red[0]
    d = _nan_normalized(a)
    kcols = [f"i{x}" for x in kept]
    bestv = d.groupBy(*kcols).agg(best(F.col(VALUE_COL)).alias("__best")) if kcols else d.agg(best(F.col(VALUE_COL)).alias("__best"))
    j = d.join(F.broadcast(bestv), on=kcols, how="inner") if kcols else d.crossJoin(F.broadcast(bestv))
    j = j.filter(F.col(VALUE_COL) == F.col("__best"))
    agg = F.min(F.col(f"i{ax}")).alias(VALUE_COL)
    out = j.groupBy(*kcols).agg(agg) if kcols else j.agg(agg)
    if not skipna:
        # propagate: any NULL in group -> NULL argresult
        nulls = d.filter(F.col(VALUE_COL).isNull()).select(*kcols).distinct().withColumn("__hasnull", F.lit(1))
        if kcols:
            out = out.join(nulls, on=kcols, how="left")
        else:
            out = out.crossJoin(nulls.limit(1)) if nulls.take(1) else out.withColumn("__hasnull", F.lit(None))
        out = out.select(*kcols, F.when(F.col("__hasnull").isNotNull(), None).otherwise(F.col(VALUE_COL)).alias(VALUE_COL))
    sel = [F.col(f"i{x}").alias(f"i{k}") for k, x in enumerate(kept)] + [F.col(VALUE_COL)]
    return Array(out.select(*sel), tuple(a.shape[x] for x in kept))


def argmin(a: Array, axis=None) -> Array:
    return _arg_reduce(a, 0 if axis is None else axis, F.min, skipna=False)


def argmax(a: Array, axis=None) -> Array:
    return _arg_reduce(a, 0 if axis is None else axis, F.max, skipna=False)


def nanargmin(a: Array, axis=None) -> Array:
    return _arg_reduce(a, 0 if axis is None else axis, F.min, skipna=True)


def nanargmax(a: Array, axis=None) -> Array:
    return _arg_reduce(a, 0 if axis is None else axis, F.max, skipna=True)


# -- quantiles ------------------------------------------------------------

def quantile(a: Array, q: float, axis=None) -> Array:
    """Exact quantile (linear interpolation), reference rechunks the
    axis to one chunk then takes an in-core quantile
    (/root/reference/dask_array/reductions/_common.py:844-920); Spark's
    ``percentile`` aggregate is the same single-owner exact algorithm,
    but distributed per group."""
    return reduce_axes(a, axis, lambda c: [_propagate(F.percentile(c, F.lit(q)), c)])


def median(a: Array, axis=None) -> Array:
    return quantile(a, 0.5, axis)


def nanmedian(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.percentile(c, F.lit(0.5))])


def percentile_approx(a: Array, q: float, axis=None, accuracy: int = 10000) -> Array:
    """Approximate percentile -- the scale path (reference merges
    per-chunk percentiles / t-digest,
    /root/reference/dask_array/reductions/_percentile.py:21-256; Spark's
    QuantileSummaries plays the t-digest role)."""
    return reduce_axes(
        a, axis, lambda c: [F.percentile_approx(c, F.lit(q), F.lit(accuracy))]
    )


# -- misc reductions ------------------------------------------------------

def count_nonzero(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [F.count(F.when(c.cast("double") != 0, F.lit(1)))])


def ptp(a: Array, axis=None) -> Array:
    return reduce_axes(a, axis, lambda c: [_propagate(F.max(c) - F.min(c), c)])


def average(a: Array, weights: Array, axis=None) -> Array:
    """Weighted mean sum(v*w)/sum(w) (reference
    /root/reference/dask_array/routines/_statistics.py:27)."""
    vw = a * weights
    num = sum(vw, axis=axis)
    den = sum(weights, axis=axis)
    return num / den


def topk(a: Array, k: int, axis=-1) -> Array:
    """Per-group top-k by value (reference per-chunk k-buffers merged in
    a tree, /root/reference/dask_array/routines/_topk.py:14).  Spark:
    rank within kept-axis partitions; with a kept axis this is a
    parallel window; ties broken by smallest index for determinism."""
    from pyspark.sql import Window

    red, kept = _norm_axes(a, axis)
    ax = red[0]
    d = a.df
    kcols = [f"i{x}" for x in kept]
    w = Window.partitionBy(*kcols).orderBy(F.col(VALUE_COL).desc(), F.col(f"i{ax}").asc())
    ranked = d.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    sel = [F.col(f"i{x}").alias(f"i{j}") for j, x in enumerate(kept)]
    sel.append((F.col("__r") - 1).cast("long").alias(f"i{len(kept)}"))
    sel.append(F.col(VALUE_COL))
    return Array(ranked.select(*sel), tuple(a.shape[x] for x in kept) + (k,))


def argtopk(a: Array, k: int, axis=-1) -> Array:
    """Indices of the top-k values (reference routines/_topk.py:43)."""
    from pyspark.sql import Window

    red, kept = _norm_axes(a, axis)
    ax = red[0]
    d = a.df
    kcols = [f"i{x}" for x in kept]
    w = Window.partitionBy(*kcols).orderBy(F.col(VALUE_COL).desc(), F.col(f"i{ax}").asc())
    ranked = d.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    sel = [F.col(f"i{x}").alias(f"i{j}") for j, x in enumerate(kept)]
    sel.append((F.col("__r") - 1).cast("long").alias(f"i{len(kept)}"))
    sel.append(F.col(f"i{ax}").alias(VALUE_COL))
    return Array(ranked.select(*sel), tuple(a.shape[x] for x in kept) + (k,))


def bincount(a: Array, weights: Array | None = None, minlength: int = 0) -> Array:
    """Count occurrences of nonnegative ints (reference per-chunk
    bincount + tree-sum,
    /root/reference/dask_array/routines/_bincount.py:39) == groupBy on
    the VALUE with count/sum -- a single shuffle on the value.
    ``minlength`` guarantees the NumPy output-length contract
    (len >= minlength) by anti-joining in a single zero marker row at
    index minlength-1 when the data leaves that index absent -- a
    one-row side, no extra shuffle of the counts."""
    d = a.df
    if weights is not None:
        wd = weights.df.withColumnRenamed(VALUE_COL, "__w")
        d = d.join(wd, on=a.index_cols, how="inner")
        agg = F.sum(F.col("__w"))
        ztype = "double"
    else:
        agg = F.count(F.lit(1)).cast("long")
        ztype = "bigint"
    out = d.groupBy(F.col(VALUE_COL).cast("long").alias("i0")).agg(agg.alias(VALUE_COL))
    if minlength > 0:
        marker = a.spark.range(minlength - 1, minlength).select(
            F.col("id").alias("i0"), F.lit(0).cast(ztype).alias(VALUE_COL)
        )
        out = out.unionByName(marker.join(out, on="i0", how="left_anti"))
    return Array(out, (None,))


def histogram(a: Array, bins: int, range: tuple[float, float]) -> Array:
    """Uniform-bin histogram counts (reference per-block bin + sum,
    /root/reference/dask_array/_histogram.py:41).  Bucket arithmetic is
    written out explicitly (floor of the affine map, last edge
    inclusive, NumPy convention) so an SQL oracle can reproduce it
    bit-for-bit."""
    lo, hi = range
    c = F.col(VALUE_COL).cast("double")
    bucket = F.least(
        F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins)).cast("long"),
        F.lit(bins - 1).cast("long"),
    )
    d = (
        a.df.filter((c >= lo) & (c <= hi))
        .groupBy(bucket.alias("i0"))
        .agg(F.count(F.lit(1)).cast("long").alias(VALUE_COL))
    )
    return Array(d, (bins,))


def histogram2d(x: Array, y: Array, bins: tuple[int, int], ranges) -> Array:
    """2-D uniform histogram over two aligned 1-D arrays (reference
    ``histogram2d``/``histogramdd``,
    /root/reference/dask_array/_histogram.py:161,360): join on the
    shared index, bucket both coordinates with explicit affine floor
    arithmetic (last edge inclusive, NumPy convention), one grouped
    count.  When both arrays share a base the join disappears into a
    single projection."""
    (bx, by) = bins
    (lox, hix), (loy, hiy) = ranges

    def bucket(c: Column, lo: float, hi: float, nb: int) -> Column:
        c = c.cast("double")
        return F.least(
            F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(nb)).cast("long"),
            F.lit(nb - 1).cast("long"),
        )

    dy = y.df.withColumnRenamed(VALUE_COL, "__y")
    if y._base is x._base:
        d = x._base.select(
            *x.index_cols, x._vcol.alias(VALUE_COL), y._vcol.alias("__y")
        )
    else:
        d = x.df.join(dy, on=x.index_cols, how="inner")
    cx, cy = F.col(VALUE_COL).cast("double"), F.col("__y").cast("double")
    d = d.filter((cx >= lox) & (cx <= hix) & (cy >= loy) & (cy <= hiy))
    out = d.groupBy(
        bucket(F.col(VALUE_COL), lox, hix, bx).alias("i0"),
        bucket(F.col("__y"), loy, hiy, by).alias("i1"),
    ).agg(F.count(F.lit(1)).cast("long").alias(VALUE_COL))
    return Array(out, (bx, by))


def unique_table(a: Array) -> DataFrame:
    """Distinct values with counts and first flat index (reference
    ``unique`` with return_counts/return_index,
    /root/reference/dask_array/routines/_unique.py:51-226).  Returned as
    a DataFrame keyed by value: a dense 0..k-1 result index would force
    a global rank; the (value, count, first_index) table carries the
    same information shuffle-cheaply and sorts on demand."""
    d = a.df
    flat = None
    if a.ndim == 1:
        flat = F.col("i0")
    else:
        strides = []
        mul = 1
        for s in reversed(a.shape):
            strides.append(mul)
            mul *= s if s else 1
        strides = list(reversed(strides))
        flat = F.lit(0).cast("long")
        for k, st in enumerate(strides):
            flat = flat + F.col(f"i{k}") * F.lit(st)
    return d.groupBy(F.col(VALUE_COL).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("count"),
        F.min(flat).alias("first_index"),
    )


def kth_smallest(a: Array, k: int, buckets: int = 1024, max_collect: int = 100_000) -> float:
    """Exact k-th smallest value (0-based) of a 1-D/global array by
    iterative bucket narrowing -- the scalable exact-quantile path for
    axes too large to gather (SURVEY.md 'hard parts': exact medians on
    huge axes).  Each pass is ONE partial-aggregated histogram over the
    surviving range; the candidate range shrinks by ~buckets x per
    pass, so 100 TB needs ~3-4 passes before the final in-core sort of
    <= max_collect survivors."""
    import math as _m

    d = a.df.select(F.col(VALUE_COL).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # persist ONCE: every narrowing pass re-reads this relation, and
    # without the cache each pass is a full base-table scan (VERDICT r3
    # item 2 -- at 100 TB that doubles-to-quadruples the IO)
    d = d.persist()
    try:
        row = d.agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.count("v").alias("n"),
        ).collect()[0]
        lo, hi, n = row["lo"], row["hi"], row["n"]
        if n == 0:
            return float("nan")
        if not (0 <= k < n):
            raise ValueError(f"k={k} out of range for n={n}")
        offset = 0  # count of values strictly below the surviving range
        c = n  # rows inside [lo, hi]: carried from the chosen bucket's
        # histogram count, so no per-pass .count() job exists at all
        hi_inclusive = True
        while True:
            in_range = (F.col("v") >= lo) & (
                (F.col("v") <= hi) if hi_inclusive else (F.col("v") < hi)
            )
            rng = d.filter(in_range)
            width = (hi - lo) / buckets
            if c <= max_collect or width <= 0 or not _m.isfinite(width) or (
                hi - lo
            ) < 1e-14 * max(1.0, abs(lo)):
                vals = sorted(r["v"] for r in rng.collect())
                return float(vals[k - offset])
            b = F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
                F.lit(buckets - 1),
            )
            hist = dict(
                (r["b"], r["c"])
                for r in rng.groupBy(b.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            cum = offset
            for j in range(buckets):
                cj = hist.get(j, 0)
                if cum + cj > k:
                    offset = cum
                    c = cj
                    if j < buckets - 1:
                        # half-open upper bound: bucket j is
                        # [lo+j*w, lo+(j+1)*w), so the carried count cj
                        # is EXACT for the next range even with ties
                        # sitting on the bucket boundary
                        lo, hi = lo + j * width, lo + (j + 1) * width
                        hi_inclusive = False
                    else:
                        lo = lo + j * width
                    break
                cum += cj
    finally:
        d.unpersist()


def median_scalable(a: Array) -> float:
    """Exact global median via kth_smallest (even n: mean of the two
    middle order statistics)."""
    n = a.df.filter(F.col(VALUE_COL).isNotNull()).count()
    if n == 0:
        return float("nan")
    if n % 2 == 1:
        return kth_smallest(a, n // 2)
    return 0.5 * (kth_smallest(a, n // 2 - 1) + kth_smallest(a, n // 2))


def histogramdd(arrays: "Sequence[Array]", bins: "Sequence[int]", ranges) -> Array:
    """N-d uniform histogram over aligned 1-D arrays (reference
    ``histogramdd``, /root/reference/dask_array/_histogram.py:454):
    chained index joins (free when all arrays share one base), one
    bucket projection per dimension, one grouped count."""
    nd = len(arrays)
    if not (len(bins) == len(ranges) == nd):
        raise ValueError("arrays, bins, ranges must align")
    base = arrays[0]._base
    if all(a._base is base for a in arrays):
        d = base.select(
            *arrays[0].index_cols,
            *[a._vcol.cast("double").alias(f"__x{t}") for t, a in enumerate(arrays)],
        )
    else:
        d = arrays[0].df.withColumnRenamed(VALUE_COL, "__x0")
        for t in range(1, nd):
            dt = arrays[t].df.withColumnRenamed(VALUE_COL, f"__x{t}")
            d = d.join(dt, on=arrays[0].index_cols, how="inner")
    conds = None
    buckets = []
    for t in range(nd):
        lo, hi = ranges[t]
        c = F.col(f"__x{t}").cast("double")
        in_r = (c >= float(lo)) & (c <= float(hi))
        conds = in_r if conds is None else (conds & in_r)
        buckets.append(
            F.least(
                F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(bins[t])).cast("long"),
                F.lit(bins[t] - 1).cast("long"),
            ).alias(f"i{t}")
        )
    out = (
        d.filter(conds)
        .groupBy(*buckets)
        .agg(F.count(F.lit(1)).cast("long").alias(VALUE_COL))
    )
    return Array(out, tuple(bins))


def reduction(
    a: Array,
    chunk: Callable,
    combine: Callable,
    aggregate: Callable | None = None,
    axis=None,
    split_every: int = 16,
) -> Array:
    """Generic user-defined reduction (reference
    reductions/_reduction.py:259-428): ``chunk(ndarray) -> state`` runs
    per hash-bucket of the reduced axes, ``combine(state, state) ->
    state`` merges partials (must be associative+commutative, exactly
    the reference's contract), ``aggregate(state) -> float`` finalizes.
    States travel as pickled binary through a two-stage
    ``applyInPandas`` -- the partial/final aggregate shape, so the
    reduced axis never concentrates on one task.  NULL cells arrive as
    NaN (the chunk fn chooses nan-skipping or propagation)."""
    import pickle

    import numpy as np
    import pandas as pd

    red, kept = _norm_axes(a, axis)
    kcols = [f"i{ax}" for ax in kept]
    redcols = [F.col(f"i{ax}") for ax in red]
    d = a.df.withColumn(
        "__blk", F.pmod(F.hash(*redcols), F.lit(split_every)).cast("long")
    )

    def stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        st = chunk(vals)
        out = {c: [pdf[c].iloc[0]] for c in kcols}
        out["__st"] = [pickle.dumps(st)]
        return pd.DataFrame(out) if out else pd.DataFrame({"__st": out["__st"]})

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        states = [pickle.loads(b) for b in pdf["__st"]]
        st = states[0]
        for s in states[1:]:
            st = combine(st, s)
        v = aggregate(st) if aggregate is not None else st
        out = {c: [pdf[c].iloc[0]] for c in kcols}
        out[VALUE_COL] = [float(v)]
        return pd.DataFrame(out)

    if kcols:
        s1 = ", ".join(f"{c} long" for c in kcols) + ", __st binary"
        s2 = ", ".join(f"{c} long" for c in kcols) + f", {VALUE_COL} double"
        partial = d.groupBy(*kcols, "__blk").applyInPandas(stage1, schema=s1)
        final = partial.groupBy(*kcols).applyInPandas(stage2, schema=s2)
        sel = [F.col(f"i{ax}").alias(f"i{k}") for k, ax in enumerate(kept)]
        return Array(
            final.select(*sel, VALUE_COL), tuple(a.shape[ax] for ax in kept)
        )

    def stage1_g(pdf):
        out = stage1(pdf)
        out = out.copy()
        out["__g"] = 1
        return out[["__g", "__st"]]

    def stage2_g(pdf):
        out = stage2(pdf)
        return out[[VALUE_COL]]

    partial = (
        d.withColumn("__g", F.lit(1))
        .groupBy("__g", "__blk")
        .applyInPandas(stage1_g, schema="__g int, __st binary")
    )
    final = partial.groupBy("__g").applyInPandas(
        stage2_g, schema=f"{VALUE_COL} double"
    )
    return Array(final, ())


def cumreduction(a: Array, func: Callable, binop: Callable, ident: float, block: int = 1 << 20) -> Array:
    """Generic distributed scan over a 1-D axis (reference
    ``cumreduction``, reductions/_cumulative.py:597): ``func(ndarray)
    -> scanned ndarray`` runs per index block, per-block carries merge
    with the associative ``binop`` (identity ``ident``) in a tiny
    driver prefix, and a second blockwise pass folds each block's
    incoming carry in with ``binop(carry, scanned)`` -- the same
    two-pass Blelloch shape as the built-in scans.

    Example: ``cumreduction(x, np.maximum.accumulate, np.maximum,
    -np.inf)`` is a distributed running maximum."""
    import numpy as np
    import pandas as pd

    if a.ndim != 1:
        raise ValueError("cumreduction is 1-D (use window ops for N-D axes)")
    d = a.df.withColumn(
        "__blk", F.floor(F.col("i0") / F.lit(block)).cast("long")
    ).persist()

    def total(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i0")
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        t = func(vals)[-1] if len(vals) else float(ident)
        return pd.DataFrame({"__blk": [int(pdf["__blk"].iloc[0])], "__t": [float(t)]})

    parts = (
        d.groupBy("__blk")
        .applyInPandas(total, schema="__blk long, __t double")
        .collect()
    )
    carry_in: dict[int, float] = {}
    carry = float(ident)
    for row in sorted(parts, key=lambda r: r["__blk"]):
        carry_in[row["__blk"]] = carry
        carry = float(binop(carry, row["__t"]))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i0")
        blk = int(pdf["__blk"].iloc[0])
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        out = np.asarray(binop(carry_in.get(blk, float(ident)), func(vals)), dtype="float64")
        return pd.DataFrame({"i0": pdf["i0"].to_numpy(dtype="int64"), VALUE_COL: out})

    schema = f"i0 long, {VALUE_COL} double"
    return Array(d.groupBy("__blk").applyInPandas(scan, schema=schema), a.shape)


def arg_reduction(
    a: Array,
    chunk: Callable,
    combine: Callable,
    aggregate: Callable | None = None,
    axis=None,
    split_every: int = 16,
) -> Array:
    """Generic user-defined ARG reduction (reference
    reductions/_arg_reduction.py:89): like ``reduction`` but the
    kernels see (values, linear_indices) so the state can carry a
    winning position.  ``chunk(vals, idxs) -> state`` runs per hash
    bucket of the reduced axes (idxs are C-order linear indices within
    the reduced subspace -- the reference re-bases per-chunk winners
    with chunk offsets, _arg_reduction.py:14-60; here the global index
    is computed directly from the index columns), ``combine(state,
    state) -> state`` merges partials, ``aggregate(state)`` emits the
    chosen index.  Same two-stage pickled-state applyInPandas shape as
    ``reduction`` -- the reduced axes never concentrate on one task.
    """
    import pickle

    import pandas as pd

    red, kept = _norm_axes(a, axis)
    kcols = [f"i{ax}" for ax in kept]
    # C-order linear index over the reduced subspace (the outermost
    # reduced axis needs no stride product, so a single reduced axis
    # works even with an unknown length)
    strides = []
    acc = 1
    for pos, ax in enumerate(reversed(red)):
        strides.append((ax, acc))
        if pos < len(red) - 1:
            if a.shape[ax] is None:
                raise ValueError(
                    "arg_reduction over multiple axes needs known lengths "
                    "for all but the outermost reduced axis"
                )
            acc *= int(a.shape[ax])
    lin = F.lit(0).cast("long")
    for ax, st in strides:
        lin = lin + F.col(f"i{ax}") * F.lit(st)
    d = a.df.withColumn("__ri", lin).withColumn(
        "__blk",
        F.pmod(F.hash(*[F.col(f"i{ax}") for ax in red]), F.lit(split_every)).cast("long"),
    )

    def stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        idxs = pdf["__ri"].to_numpy(dtype="int64")
        st = chunk(vals, idxs)
        out = {c: [pdf[c].iloc[0]] for c in kcols}
        out["__st"] = [pickle.dumps(st)]
        return pd.DataFrame(out)

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        states = [pickle.loads(b) for b in pdf["__st"]]
        st = states[0]
        for s in states[1:]:
            st = combine(st, s)
        v = aggregate(st) if aggregate is not None else st
        out = {c: [pdf[c].iloc[0]] for c in kcols}
        out[VALUE_COL] = [float(v)]
        return pd.DataFrame(out)

    if kcols:
        s1 = ", ".join(f"{c} long" for c in kcols) + ", __st binary"
        s2 = ", ".join(f"{c} long" for c in kcols) + f", {VALUE_COL} double"
        partial = d.groupBy(*kcols, "__blk").applyInPandas(stage1, schema=s1)
        final = partial.groupBy(*kcols).applyInPandas(stage2, schema=s2)
        sel = [F.col(f"i{ax}").alias(f"i{k}") for k, ax in enumerate(kept)]
        return Array(
            final.select(*sel, VALUE_COL), tuple(a.shape[ax] for ax in kept)
        )

    def stage1_g(pdf: pd.DataFrame) -> pd.DataFrame:
        out = stage1(pdf)
        out = out.copy()
        out["__g"] = 1
        return out

    partial = d.withColumn("__g", F.lit(1)).groupBy("__g", "__blk").applyInPandas(
        stage1_g, schema="__g int, __st binary"
    )
    final = partial.groupBy("__g").applyInPandas(
        lambda pdf: stage2(pdf).assign(__g=1)[[VALUE_COL]],
        schema=f"{VALUE_COL} double",
    )
    return Array(final, ())
