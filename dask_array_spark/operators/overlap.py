"""Overlap / halo exchange: map_overlap over N-d cell arrays.

Parity: the reference's overlap machinery
(/root/reference/dask_array/_overlap.py:53 ``OverlapInternal``, :143
``MapOverlap``, boundary modes :626-1041).  The reference builds an
explicit halo-exchange task graph; here the halo is ONE exploded
shuffle: every cell computes the (tiny) set of blocks whose extended
region [b*bs - depth, (b+1)*bs + depth) contains it, explodes to those
block keys, and a single ``groupBy(block).applyInPandas`` assembles
the haloed ndarray, runs the kernel, and trims the halo back off.

Boundary modes: ``constant`` / ``nearest`` / ``reflect`` /
``periodic`` / ``none`` (reference modes, _overlap.py:626).
Array-edge padding happens in-kernel via ``np.pad`` for value modes --
only blocks touching the array edge pad, and the data they need is
their own (shipped) region.  ``periodic`` ships wrap-around copies:
edge cells union in with indices shifted by ±n per axis (applied
sequentially, which covers corners), and the edge blocks' extended
regions then assemble exactly like interior halos.

Scale: shuffle volume is corpus * (1 + 2*depth/bs) -- the classic halo
overhead; pick bs >> depth.  One exchange, no driver involvement.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = ["map_overlap", "overlap", "trim_overlap"]

_PAD_MODE = {"nearest": "edge", "reflect": "reflect"}


def map_overlap(
    func: Callable,
    a: Array,
    depth: int | Sequence[int],
    block_shape: Sequence[int] | None = None,
    boundary: str = "nearest",
    constant_value: float = 0.0,
) -> Array:
    """Apply ``func(ndarray) -> same-shape ndarray`` on depth-haloed
    blocks, trimming the halo from the output (reference
    ``map_overlap``, _overlap.py:1041)."""
    shape = a.shape
    if any(s is None for s in shape):
        raise ValueError("map_overlap needs a fully known shape")
    n = a.ndim
    if isinstance(depth, int):
        depth = (depth,) * n
    depth = tuple(int(d) for d in depth)
    if block_shape is None:
        per = max(1, int(round(1_000_000 ** (1.0 / max(n, 1)))))
        block_shape = tuple(min(int(s), per) for s in shape)
    block_shape = tuple(int(b) for b in block_shape)
    if boundary not in ("constant", "nearest", "reflect", "periodic", "none"):
        raise ValueError(f"unknown boundary {boundary!r}")
    nblocks = [-(-shape[k] // block_shape[k]) for k in range(n)]

    d = a.df
    if boundary == "periodic":
        # wrap-around shipping: per axis, edge cells also travel with
        # indices shifted by +-n so the opposite edge block's extended
        # region finds them; sequential per-axis unions cover corners
        for k in range(n):
            nk, dp = shape[k], depth[k]
            if dp == 0:
                continue
            low = d.filter(F.col(f"i{k}") < dp).withColumn(
                f"i{k}", F.col(f"i{k}") + F.lit(nk)
            )
            high = d.filter(F.col(f"i{k}") >= nk - dp).withColumn(
                f"i{k}", F.col(f"i{k}") - F.lit(nk)
            )
            d = d.unionByName(low).unionByName(high)

    # explode each cell to every block whose extended region holds it
    for k in range(n):
        bs, dp = block_shape[k], depth[k]
        lo = F.floor((F.col(f"i{k}") - F.lit(dp)) / F.lit(bs)).cast("long")
        hi = F.floor((F.col(f"i{k}") + F.lit(dp)) / F.lit(bs)).cast("long")
        seq = F.sequence(
            F.greatest(lo, F.lit(0)), F.least(hi, F.lit(nblocks[k] - 1))
        )
        d = d.withColumn(f"b{k}", F.explode(seq))
    bcols = [f"b{k}" for k in range(n)]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        block = tuple(int(pdf[c].iloc[0]) for c in bcols)
        lo = [block[k] * block_shape[k] - depth[k] for k in range(n)]
        hi = [
            min((block[k] + 1) * block_shape[k], shape[k]) + depth[k]
            for k in range(n)
        ]
        if boundary == "periodic":
            # wrapped copies fill the whole extended region directly
            lo2, hi2 = list(lo), list(hi)
        else:
            lo2 = [max(x, 0) for x in lo]
            hi2 = [min(hi[k], shape[k]) for k in range(n)]
        dims_in = tuple(hi2[k] - lo2[k] for k in range(n))
        arr = np.full(dims_in, np.nan, dtype="float64")
        loc = tuple(
            pdf[f"i{k}"].to_numpy(dtype="int64") - lo2[k] for k in range(n)
        )
        arr[loc] = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        pad = [(lo2[k] - lo[k], hi[k] - hi2[k]) for k in range(n)]
        if any(p != (0, 0) for p in pad):
            if boundary == "constant":
                arr = np.pad(arr, pad, mode="constant", constant_values=constant_value)
            elif boundary in _PAD_MODE:
                arr = np.pad(arr, pad, mode=_PAD_MODE[boundary])
            else:  # "none": kernel sees the unpadded edge region
                pass
        out = np.asarray(func(arr), dtype="float64")
        if out.shape != arr.shape:
            raise ValueError(
                f"map_overlap kernel changed shape {arr.shape} -> {out.shape}"
            )
        # trim halo: keep the core region of this block
        sl = []
        for k in range(n):
            core_lo = block[k] * block_shape[k]
            core_hi = min(core_lo + block_shape[k], shape[k])
            off = core_lo - (lo[k] if boundary != "none" else lo2[k])
            sl.append(slice(off, off + (core_hi - core_lo)))
        core = out[tuple(sl)]
        dims = core.shape
        idx = np.indices(dims).reshape(n, -1)
        flat = core.reshape(-1)
        keep = ~np.isnan(flat)
        cols = {
            f"i{k}": idx[k][keep] + block[k] * block_shape[k] for k in range(n)
        }
        cols[VALUE_COL] = flat[keep]
        return pd.DataFrame(cols)

    schema = ", ".join(f"i{k} long" for k in range(n)) + f", {VALUE_COL} double"
    return Array(d.groupBy(*bcols).applyInPandas(kernel, schema=schema), shape)


def _halo_params(shape, depth, block_shape):
    n = len(shape)
    if any(s is None for s in shape):
        raise ValueError("overlap needs a fully known shape")
    if isinstance(depth, int):
        depth = (depth,) * n
    depth = tuple(int(d) for d in depth)
    block_shape = tuple(int(b) for b in block_shape)
    nblocks = [-(-shape[k] // block_shape[k]) for k in range(n)]
    return n, depth, block_shape, nblocks


def overlap(
    a: Array,
    depth: int | Sequence[int],
    block_shape: Sequence[int],
    boundary: str = "none",
) -> Array:
    """Standalone halo expansion (reference ``overlap``,
    _overlap.py:580): blocks of ``block_shape`` grow by ``depth`` on
    each side, laid out contiguously -- output axis k has length
    nblocks_k * (block_shape_k + 2*depth_k), block b's haloed region
    occupying [b*(bs+2dp), (b+1)*(bs+2dp)).

    Spark shape: ONE explode projection (each cell fans out to the
    <= (1 + 2*dp/bs) blocks whose extended region holds it) -- no
    shuffle, no kernel.  Pair with ``map_blocks`` over
    (bs + 2*dp)-sized blocks, then ``trim_overlap`` to drop the halos.

    Boundaries: "none"/"constant" leave out-of-range halo positions
    ABSENT (the COO encoding reads them as NULL -> 0, matching a
    zero-constant pad); "periodic" wraps.  The value-dependent pads
    (nearest/reflect) exist only on the fused ``map_overlap`` path,
    where the kernel sees the materialized edge."""
    if boundary not in ("none", "constant", "periodic"):
        raise ValueError(
            "standalone overlap supports boundary none/constant/periodic;"
            " use map_overlap for nearest/reflect"
        )
    shape = a.shape
    n, depth, block_shape, nblocks = _halo_params(shape, depth, block_shape)
    d = a.df
    if boundary == "periodic":
        for k in range(n):
            nk, dp = shape[k], depth[k]
            if dp == 0:
                continue
            low = d.filter(F.col(f"i{k}") < dp).withColumn(
                f"i{k}", F.col(f"i{k}") + F.lit(nk)
            )
            high = d.filter(F.col(f"i{k}") >= nk - dp).withColumn(
                f"i{k}", F.col(f"i{k}") - F.lit(nk)
            )
            d = d.unionByName(low).unionByName(high)
    sel_done = []
    for k in range(n):
        bs, dp = block_shape[k], depth[k]
        span = bs + 2 * dp
        lo = F.floor((F.col(f"i{k}") - F.lit(dp)) / F.lit(bs)).cast("long")
        hi = F.floor((F.col(f"i{k}") + F.lit(dp)) / F.lit(bs)).cast("long")
        seq = F.sequence(
            F.greatest(lo, F.lit(0)), F.least(hi, F.lit(nblocks[k] - 1))
        )
        d = d.withColumn(f"__b{k}", F.explode(seq))
        sel_done.append(
            (
                F.col(f"__b{k}") * F.lit(span)
                + (F.col(f"i{k}") - F.col(f"__b{k}") * F.lit(bs))
                + F.lit(dp)
            ).alias(f"i{k}")
        )
    out_shape = tuple(
        nblocks[k] * (block_shape[k] + 2 * depth[k]) for k in range(n)
    )
    return Array(d.select(*sel_done, F.col(VALUE_COL)), out_shape)


def trim_overlap(
    a: Array,
    depth: int | Sequence[int],
    block_shape: Sequence[int],
    shape: Sequence[int] | None = None,
) -> Array:
    """Inverse of ``overlap`` (reference ``trim_overlap``,
    _overlap.py:626): drop each block's halo cells and restore
    original indices.  Pure filter + projection -- no shuffle.

    ``shape`` is the pre-overlap shape; inferred from the haloed
    layout when omitted (last block assumed full)."""
    haloed = a.shape
    n = a.ndim
    if isinstance(depth, int):
        depth = (depth,) * n
    depth = tuple(int(d) for d in depth)
    block_shape = tuple(int(b) for b in block_shape)
    spans = [block_shape[k] + 2 * depth[k] for k in range(n)]
    nblocks = [haloed[k] // spans[k] for k in range(n)]
    if shape is None:
        shape = tuple(nblocks[k] * block_shape[k] for k in range(n))
    shape = tuple(int(s) for s in shape)
    d = a.df
    sel = []
    for k in range(n):
        b = (F.col(f"i{k}") / F.lit(spans[k])).cast("long")
        off = F.col(f"i{k}") % F.lit(spans[k])
        core = off - F.lit(depth[k]) + b * F.lit(block_shape[k])
        d = d.filter(
            (off >= F.lit(depth[k]))
            & (off < F.lit(depth[k] + block_shape[k]))
            & (core < F.lit(shape[k]))
        ).withColumn(f"__c{k}", core)
        sel.append(F.col(f"__c{k}").alias(f"i{k}"))
    return Array(d.select(*sel, F.col(VALUE_COL)), shape)
