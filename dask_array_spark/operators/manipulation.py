"""Shape / layout manipulation as pure index arithmetic.

Parity: reference section 2.10 (SURVEY.md) -- transpose
(/root/reference/dask_array/manipulation/_transpose.py:14), reshape
(manipulation/_reshape.py:265), concatenate
(stacking/_concatenate.py:20), stack (stacking/_stack.py:18),
flip (manipulation/_flip.py:10), roll (manipulation/_roll.py:8),
squeeze/expand_dims (manipulation/_squeeze.py:13, _expand.py:14),
broadcast_to (_broadcast_to.py:14), tile/repeat/pad
(creation/_tile.py:10, _repeat.py:13, _pad.py:227).

In cell form every one of these is a PROJECTION (or union of
projections): no data movement, no shuffle -- a structural win over the
reference, whose reshape/transpose must physically re-block
(manipulation/_reshape.py:414's boundary-preserving rechunk math has no
analogue here).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = [
    "transpose",
    "swapaxes",
    "moveaxis",
    "reshape",
    "reshape_blockwise",
    "squeeze",
    "expand_dims",
    "flip",
    "roll",
    "concatenate",
    "stack",
    "broadcast_to",
    "tile",
    "repeat",
    "pad_constant",
    "pad",
    "sliding_window_view",
    "insert_1d",
    "delete_1d",
    "append_1d",
    "atleast_1d",
    "atleast_2d",
    "atleast_3d",
    "ravel_multi_index",
    "unravel_index",
]


def transpose(a: Array, axes: Sequence[int] | None = None) -> Array:
    """Axis permutation == column rename -- a free projection."""
    if axes is None:
        axes = tuple(reversed(range(a.ndim)))
    axes = tuple(ax % a.ndim for ax in axes)
    sel = [F.col(f"i{ax}").alias(f"i{k}") for k, ax in enumerate(axes)]
    sel.append(F.col(VALUE_COL))
    return Array(a.df.select(*sel), tuple(a.shape[ax] for ax in axes))


def swapaxes(a: Array, ax1: int, ax2: int) -> Array:
    perm = list(range(a.ndim))
    perm[ax1 % a.ndim], perm[ax2 % a.ndim] = perm[ax2 % a.ndim], perm[ax1 % a.ndim]
    return transpose(a, perm)


def moveaxis(a: Array, source: int, destination: int) -> Array:
    perm = list(range(a.ndim))
    perm.remove(source % a.ndim)
    perm.insert(destination % a.ndim, source % a.ndim)
    return transpose(a, perm)


def _flat_index(a: Array):
    strides = []
    mul = 1
    for s in reversed(a.shape):
        strides.append(mul)
        mul *= s
    flat = F.lit(0).cast("long")
    for k, st in enumerate(reversed(strides)):
        flat = flat + F.col(f"i{k}") * F.lit(st)
    return flat


def reshape(a: Array, shape: Sequence[int]) -> Array:
    """C-order reshape via flat-index div/mod -- zero data movement
    (reference must rechunk, manipulation/_reshape.py:265,414)."""
    shape = list(shape)
    if any(s is None for s in a.shape):
        raise ValueError("reshape needs fully known input shape")
    size = int(np.prod(a.shape)) if a.ndim else 1
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = size // known
    if int(np.prod(shape)) != size:
        raise ValueError(f"cannot reshape {a.shape} -> {shape}")
    flat = _flat_index(a)
    out_strides = []
    mul = 1
    for s in reversed(shape):
        out_strides.append(mul)
        mul *= s
    out_strides = list(reversed(out_strides))
    sel = []
    for k, st in enumerate(out_strides):
        sel.append(((flat / F.lit(st)).cast("long") % F.lit(shape[k])).alias(f"i{k}"))
    sel.append(F.col(VALUE_COL))
    return Array(a.df.select(*sel), tuple(shape))


def reshape_blockwise(a: Array, shape: Sequence[int]) -> Array:
    """Reference parity alias (manipulation/_reshape.py:97
    ``reshape_blockwise``): the reference restricts this variant to
    reshapes that never move data between blocks because its blocks
    are physical buffers.  Cell form has no physical blocks -- EVERY
    C-order reshape here is already blockwise (a pure flat-index
    projection, zero movement) -- so this is exactly ``reshape`` with
    the reference's spelling."""
    return reshape(a, shape)


def squeeze(a: Array, axis=None) -> Array:
    if axis is None:
        drop = [k for k, s in enumerate(a.shape) if s == 1]
    else:
        drop = [axis % a.ndim]
    keep = [k for k in range(a.ndim) if k not in drop]
    sel = [F.col(f"i{k}").alias(f"i{j}") for j, k in enumerate(keep)] + [F.col(VALUE_COL)]
    return Array(a.df.select(*sel), tuple(a.shape[k] for k in keep))


def expand_dims(a: Array, axis: int) -> Array:
    axis = axis % (a.ndim + 1)
    sel = []
    j = 0
    for k in range(a.ndim + 1):
        if k == axis:
            sel.append(F.lit(0).cast("long").alias(f"i{k}"))
        else:
            sel.append(F.col(f"i{j}").alias(f"i{k}"))
            j += 1
    sel.append(F.col(VALUE_COL))
    shape = list(a.shape)
    shape.insert(axis, 1)
    return Array(a.df.select(*sel), tuple(shape))


def flip(a: Array, axis: int = 0) -> Array:
    axis = axis % a.ndim
    n = a.shape[axis]
    sel = [
        (F.lit(n - 1) - F.col(f"i{k}")).alias(f"i{k}") if k == axis else F.col(f"i{k}")
        for k in range(a.ndim)
    ] + [F.col(VALUE_COL)]
    return Array(a.df.select(*sel), a.shape)


def roll(a: Array, shift: int, axis: int = 0) -> Array:
    axis = axis % a.ndim
    n = a.shape[axis]
    sel = [
        ((F.col(f"i{k}") + F.lit(shift % n)) % F.lit(n)).alias(f"i{k}")
        if k == axis
        else F.col(f"i{k}")
        for k in range(a.ndim)
    ] + [F.col(VALUE_COL)]
    return Array(a.df.select(*sel), a.shape)


def concatenate(arrays: Sequence[Array], axis: int = 0) -> Array:
    """UNION ALL with per-input offset on the concat axis."""
    axis = axis % arrays[0].ndim
    out = None
    offset = 0
    for arr in arrays:
        sel = [
            (F.col(f"i{k}") + F.lit(offset)).alias(f"i{k}") if k == axis else F.col(f"i{k}")
            for k in range(arr.ndim)
        ] + [F.col(VALUE_COL)]
        d = arr.df.select(*sel)
        out = d if out is None else out.unionByName(d)
        offset += arr.shape[axis]
    shape = list(arrays[0].shape)
    shape[axis] = offset
    return Array(out, tuple(shape))


def stack(arrays: Sequence[Array], axis: int = 0) -> Array:
    """New-axis stacking: UNION ALL + literal index column."""
    expanded = [expand_dims(a, axis) for a in arrays]
    out = None
    for pos, arr in enumerate(expanded):
        sel = [
            F.lit(pos).cast("long").alias(f"i{axis}") if k == axis else F.col(f"i{k}")
            for k in range(arr.ndim)
        ] + [F.col(VALUE_COL)]
        d = arr.df.select(*sel)
        out = d if out is None else out.unionByName(d)
    shape = list(expanded[0].shape)
    shape[axis] = len(arrays)
    return Array(out, tuple(shape))


def broadcast_to(a: Array, shape: Sequence[int]) -> Array:
    """Virtual expansion realised as a cross join with ``spark.range``
    of each broadcast dim (reference ``BroadcastTo``,
    _broadcast_to.py:14).  The range side is tiny metadata; Spark
    broadcasts it."""
    shape = tuple(shape)
    n = len(shape)
    off = n - a.ndim
    d = a.df
    sel = []
    for k in range(a.ndim):
        sel.append(F.col(f"i{k}").alias(f"__s{k + off}"))
    sel.append(F.col(VALUE_COL))
    d = d.select(*sel)
    spark = a.spark
    for k in range(n):
        src_ax = k - off
        if src_ax < 0 or a.shape[src_ax] == 1:
            rng = spark.range(shape[k]).select(F.col("id").alias(f"i{k}"))
            d = d.crossJoin(F.broadcast(rng))
        else:
            if a.shape[src_ax] != shape[k]:
                raise ValueError(f"cannot broadcast {a.shape} -> {shape}")
            d = d.withColumnRenamed(f"__s{k}", f"i{k}")
    return Array(d.select(*[f"i{k}" for k in range(n)], VALUE_COL), shape)


def repeat(a: Array, repeats: int, axis: int = 0) -> Array:
    """Each element repeated `repeats` times along axis (reference
    creation/_repeat.py:13): cross join with range(repeats), index =
    i*repeats + r."""
    axis = axis % a.ndim
    rng = a.spark.range(repeats).select(F.col("id").alias("__r"))
    d = a.df.crossJoin(F.broadcast(rng))
    sel = [
        (F.col(f"i{k}") * F.lit(repeats) + F.col("__r")).alias(f"i{k}")
        if k == axis
        else F.col(f"i{k}")
        for k in range(a.ndim)
    ] + [F.col(VALUE_COL)]
    shape = list(a.shape)
    shape[axis] = shape[axis] * repeats
    return Array(d.select(*sel), tuple(shape))


def _tile_axis(a: Array, reps: int, axis: int) -> Array:
    """Whole-array tiling along one axis: index = r*n + i (one
    broadcast cross join with range(reps), no shuffle)."""
    axis = axis % a.ndim
    n = a.shape[axis]
    rng = a.spark.range(reps).select(F.col("id").alias("__r"))
    d = a.df.crossJoin(F.broadcast(rng))
    sel = [
        (F.col("__r") * F.lit(n) + F.col(f"i{k}")).alias(f"i{k}") if k == axis else F.col(f"i{k}")
        for k in range(a.ndim)
    ] + [F.col(VALUE_COL)]
    shape = list(a.shape)
    shape[axis] = n * reps
    return Array(d.select(*sel), tuple(shape))


def tile(a: Array, reps, axis: int | None = None) -> Array:
    """np.tile (reference creation/_tile.py:10): ``reps`` is an int or
    tuple.  NumPy's promotion rules apply -- an int means the LAST
    axis, a tuple shorter than ndim left-pads with 1s, a tuple longer
    than ndim first lifts the array with leading length-1 axes, and
    any zero rep yields an empty result of the product shape.  The
    per-axis form ``tile(a, n, axis=k)`` is kept for callers that want
    one explicit axis.  Multi-axis tiling chains the per-axis
    primitive: each step is a broadcast cross join, so the whole tile
    is shuffle-free regardless of how many axes repeat."""
    if axis is not None:
        return _tile_axis(a, int(reps), axis)
    try:
        tup = tuple(int(r) for r in reps)
    except TypeError:
        tup = (int(reps),)
    if any(r < 0 for r in tup):
        raise ValueError("Negative `reps` are not allowed.")
    while a.ndim < len(tup):
        a = expand_dims(a, 0)
    if len(tup) < a.ndim:
        tup = (1,) * (a.ndim - len(tup)) + tup
    if not all(tup):
        shape_out = tuple(s * t for s, t in zip(a.shape, tup))
        return Array(a.df.limit(0), shape_out)
    for k in range(a.ndim - 1, -1, -1):
        if tup[k] > 1:
            a = _tile_axis(a, tup[k], k)
    return a


def pad_constant(a: Array, pad_width: Sequence[tuple[int, int]], value=0.0) -> Array:
    """Constant-mode pad (reference creation/_pad.py:227): shift the
    interior by the left pads and UNION the generated border cells."""
    if len(pad_width) != a.ndim:
        raise ValueError("pad_width must give (before, after) per axis")
    spark = a.spark
    shape = [s + b + aft for s, (b, aft) in zip(a.shape, pad_width)]
    sel = [
        (F.col(f"i{k}") + F.lit(pad_width[k][0])).alias(f"i{k}") for k in range(a.ndim)
    ] + [F.col(VALUE_COL)]
    interior = a.df.select(*sel)
    # border = full index domain minus interior region
    full = None
    for k, s in enumerate(shape):
        rng = spark.range(s).select(F.col("id").alias(f"i{k}"))
        full = rng if full is None else full.crossJoin(rng)
    inside = None
    for k in range(a.ndim):
        b = pad_width[k][0]
        c = (F.col(f"i{k}") >= b) & (F.col(f"i{k}") < b + a.shape[k])
        inside = c if inside is None else (inside & c)
    # the padded array keeps the INPUT dtype (np.pad semantics): an
    # int/bool array casts the constant into its dtype (7.5 -> 7,
    # truncation toward zero -- Spark's double->long cast matches
    # numpy's astype) instead of silently widening the whole array to
    # double through the union (round-10 cross-family fuzz catch)
    vtype = dict(a.df.dtypes).get(VALUE_COL, "double")
    cast_to = vtype if vtype in ("bigint", "boolean", "double", "float") else "double"
    border = full.filter(~inside).withColumn(
        VALUE_COL, F.lit(value).cast(cast_to)
    )
    return Array(interior.unionByName(border), tuple(shape))


def pad(
    a: Array,
    pad_width: Sequence[tuple[int, int]],
    mode: str = "constant",
    constant_values: float = 0.0,
) -> Array:
    """np.pad with the reference's mode set (creation/_pad.py:227):

    - ``constant``: literal border cells (``pad_constant``);
    - ``edge`` / ``reflect`` / ``symmetric`` / ``wrap``: border cells
      are generated by pure INDEX MATH -- a tiny broadcast range of
      pad offsets joins the source rows the mode maps them to, then
      unions with the shifted interior (no data pass beyond the border
      rows themselves);
    - ``mean`` / ``minimum`` / ``maximum`` (stats modes): one grouped
      aggregate over the padded axis supplies the border value per
      cross-axis position.

    Axes pad sequentially (np.pad semantics: later axes see earlier
    axes' borders), so corners compose correctly.
    """
    if len(pad_width) != a.ndim:
        raise ValueError("pad_width must give (before, after) per axis")
    if mode == "constant":
        return pad_constant(a, pad_width, constant_values)
    if mode not in ("edge", "reflect", "symmetric", "wrap", "mean", "minimum", "maximum"):
        raise ValueError(f"unsupported pad mode {mode!r}")
    out = a
    for axis, (before, after) in enumerate(pad_width):
        if before == 0 and after == 0:
            continue
        out = _pad_axis(out, axis, before, after, mode)
    return out


def _pad_axis(a: Array, axis: int, before: int, after: int, mode: str) -> Array:
    spark = a.spark
    n = a.shape[axis]
    if n is None:
        raise ValueError("pad needs a known axis length")
    if mode in ("reflect",) and max(before, after) > n - 1:
        raise ValueError("reflect pad wider than axis")
    icol = f"i{axis}"
    shifted = a.df.select(
        *[
            (F.col(f"i{k}") + F.lit(before)).alias(f"i{k}") if k == axis else F.col(f"i{k}")
            for k in range(a.ndim)
        ],
        F.col(VALUE_COL),
    )
    parts = [shifted]

    if mode in ("mean", "minimum", "maximum"):
        aggf = {"mean": F.avg, "minimum": F.min, "maximum": F.max}[mode]
        others = [f"i{k}" for k in range(a.ndim) if k != axis]
        stat_col = aggf(F.col(VALUE_COL))
        if mode == "mean" and dict(a.df.dtypes).get(VALUE_COL) in (
            "bigint", "int", "smallint", "tinyint"
        ):
            # np.pad rounds the mean HALF-EVEN back into an integer
            # array's dtype (numpy pad _round_if_needed); without this
            # the double avg would also silently widen the whole array
            # through the union (round-10 cross-family fuzz catch)
            stat_col = F.bround(stat_col, 0).cast("long")
        stat = a.df.groupBy(*others).agg(stat_col.alias(VALUE_COL))
        for lo, cnt in ((0, before), (before + n, after)):
            if cnt == 0:
                continue
            rng = spark.range(cnt).select((F.col("id") + F.lit(lo)).alias(icol))
            border = stat.crossJoin(F.broadcast(rng)).select(
                *[F.col(f"i{k}") for k in range(a.ndim)], F.col(VALUE_COL)
            )
            parts.append(border)
    else:
        # value modes: offset j in the border maps to a source index
        def _src(j, side):
            if mode == "edge":
                return F.lit(0) if side == "L" else F.lit(n - 1)
            if mode == "reflect":
                return (F.lit(before) - j) if side == "L" else (F.lit(n - 2) - j)
            if mode == "symmetric":
                return (F.lit(before - 1) - j) if side == "L" else (F.lit(n - 1) - j)
            # wrap
            return (F.lit(n - before) + j) if side == "L" else j

        for side, lo, cnt in (("L", 0, before), ("R", before + n, after)):
            if cnt == 0:
                continue
            rng = spark.range(cnt).select(
                (F.col("id") + F.lit(lo)).alias("__j"),
                _src(F.col("id"), side).cast("long").alias("__s"),
            )
            border = a.df.join(
                F.broadcast(rng), on=F.col(icol) == F.col("__s"), how="inner"
            ).select(
                *[
                    F.col("__j").alias(f"i{k}") if k == axis else F.col(f"i{k}")
                    for k in range(a.ndim)
                ],
                F.col(VALUE_COL),
            )
            parts.append(border)

    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    shape = list(a.shape)
    shape[axis] = n + before + after
    return Array(d, tuple(shape))


def sliding_window_view(a: Array, size: int, axis: int = 0) -> Array:
    """Materialized sliding windows as a NEW TRAILING dimension
    (reference ``sliding_window_view``, _overlap.py:457): out[..., j,
    w] = x[..., j + w].  In cell form this is a pure
    projection+generate -- each cell explodes to the (at most
    ``size``) windows containing it with window coordinate w = i - j;
    ZERO shuffle, where the reference needs a halo exchange."""
    axis = axis % a.ndim
    n = a.shape[axis]
    if n is None:
        raise ValueError("sliding_window_view needs a known axis length")
    if size > n:
        raise ValueError("window longer than axis")
    i = F.col(f"i{axis}")
    lo = F.greatest(i - F.lit(size - 1), F.lit(0))
    hi = F.least(i, F.lit(n - size))
    d = a.df.withColumn("__w", F.explode(F.sequence(lo, hi)))
    sel = []
    for k in range(a.ndim):
        if k == axis:
            sel.append(F.col("__w").alias(f"i{k}"))
        else:
            sel.append(F.col(f"i{k}"))
    sel.append((i - F.col("__w")).cast("long").alias(f"i{a.ndim}"))
    sel.append(F.col(VALUE_COL))
    shape = list(a.shape)
    shape[axis] = n - size + 1
    shape.append(size)
    return Array(d.select(*sel), tuple(shape))


def insert_1d(a: Array, pos: int, value) -> Array:
    """np.insert for 1-D (reference routines/_insert_delete.py:19)."""
    n = a.shape[0]
    shifted = a.df.select(
        F.when(F.col("i0") >= pos, F.col("i0") + 1).otherwise(F.col("i0")).alias("i0"),
        F.col(VALUE_COL),
    )
    new = a.spark.range(1).select(
        F.lit(pos).cast("long").alias("i0"), F.lit(value).cast("double").alias(VALUE_COL)
    )
    return Array(shifted.unionByName(new), (n + 1,))


def delete_1d(a: Array, pos: int) -> Array:
    n = a.shape[0]
    d = a.df.filter(F.col("i0") != pos).select(
        F.when(F.col("i0") > pos, F.col("i0") - 1).otherwise(F.col("i0")).alias("i0"),
        F.col(VALUE_COL),
    )
    return Array(d, (n - 1,))


def append_1d(a: Array, b: Array) -> Array:
    return concatenate([a, b], axis=0)


def atleast_1d(a: Array) -> Array:
    """reference manipulation/_expand.py atleast_1d."""
    if a.ndim >= 1:
        return a
    d = a.df.select(F.lit(0).cast("long").alias("i0"), F.col(VALUE_COL))
    return Array(d, (1,))


def atleast_2d(a: Array) -> Array:
    a = atleast_1d(a)
    return expand_dims(a, 0) if a.ndim == 1 else a


def atleast_3d(a: Array) -> Array:
    a = atleast_2d(a)
    return expand_dims(a, 2) if a.ndim == 2 else a


def ravel_multi_index(multi_index: Sequence[Array], dims: Sequence[int]) -> Array:
    """Flat C-order index from aligned coordinate arrays (reference
    routines/_misc.py ravel_multi_index): a pure elemwise
    sum-of-strided-coords -- exact long arithmetic, zero shuffle when
    the coordinate arrays share a base."""
    from .elemwise import elemwise

    dims = tuple(int(s) for s in dims)
    if len(multi_index) != len(dims):
        raise ValueError(
            f"{len(multi_index)} coordinate arrays for {len(dims)} dims"
        )
    strides = []
    mul = 1
    for s in reversed(dims):
        strides.append(mul)
        mul *= s
    strides = list(reversed(strides))

    def flat(*cols):
        out = None
        for c, st in zip(cols, strides):
            term = c.cast("long") * F.lit(st)
            out = term if out is None else out + term
        return out

    return elemwise(flat, *multi_index)


def unravel_index(indices: Array, shape: Sequence[int]) -> tuple:
    """Coordinate arrays from a flat-index array (reference
    routines/_misc.py unravel_index): per-axis ``(v div stride) %
    dim`` projections -- integer-exact (``div``, not the
    double-routed ``/``), one output Array per axis, all sharing the
    input's base (no shuffle, no join)."""
    shape = tuple(int(s) for s in shape)
    strides = []
    mul = 1
    for s in reversed(shape):
        strides.append(mul)
        mul *= s
    strides = list(reversed(strides))
    outs = []
    for dim, st in zip(shape, strides):
        coord = F.expr(f"(cast({VALUE_COL} as bigint) div {st}) % {dim}")
        outs.append(
            Array(
                indices.df.select(
                    *indices.index_cols, coord.cast("long").alias(VALUE_COL)
                ),
                indices.shape,
            )
        )
    return tuple(outs)
