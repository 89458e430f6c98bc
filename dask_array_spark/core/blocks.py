"""Block form + the UDF/kernel surface.

Parity: map_blocks (/root/reference/dask_array/_map_blocks.py:21),
apply_along_axis / apply_over_axes (routines/_apply.py:16,63),
apply_gufunc (_gufunc.py:154,491) and the block-form encoding from
SURVEY.md section 1.4: one row per chunk ``b0..b{n-1}, shape
ARRAY<INT>, data BINARY`` (packed C-order float64 ndarray).

Execution model: cells are grouped by block coordinates (one shuffle,
the analogue of the reference's rechunk-to-kernel-layout), each block
is densified to an ndarray inside an Arrow-batched ``applyInPandas``
kernel (NaN for absent cells), the NumPy kernel runs per block, and
the result is re-emitted as cells.  This is the (b) tier from the
build brief: compositions of DataFrame ops where possible, Pandas-UDF
blocks where the semantics genuinely need a kernel.

Scale: block size is the unit of executor memory; callers pick
``block_shape`` so one block (prod(block_shape) * 8 bytes) fits
comfortably in an executor task (default 1M cells = 8 MB).  The
shuffle is a single hash exchange on block coords -- at 100 TB this is
the same movement any rechunk-for-kernel pays, and AQE coalesces
small blocks.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .array import VALUE_COL, Array

__all__ = [
    "to_blocks",
    "from_blocks",
    "map_blocks",
    "apply_along_axis",
    "apply_gufunc",
]


def _block_cols(a: Array, block_shape: Sequence[int]):
    return [
        F.expr(f"i{k} DIV {int(bs)}").cast("long").alias(f"b{k}")
        for k, bs in enumerate(block_shape)
    ]


def _dims(block, block_shape, shape):
    """Actual dims of block ``block`` (edge blocks are short)."""
    return tuple(
        int(min(bs, s - b * bs))
        for b, bs, s in zip(block, block_shape, shape)
    )


def to_blocks(a: Array, block_shape: Sequence[int]) -> DataFrame:
    """Cell form -> block form: ``b0.., shape ARRAY<INT>, data BINARY``
    (packed C-order float64; absent cells NaN)."""
    shape = a.shape
    if any(s is None for s in shape):
        raise ValueError("to_blocks needs a fully known shape")
    n = a.ndim
    bcols = [f"b{k}" for k in range(n)]
    d = a.df.select(*_block_cols(a, block_shape), *a.index_cols, VALUE_COL)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        block = tuple(int(pdf[c].iloc[0]) for c in bcols)
        dims = _dims(block, block_shape, shape)
        arr = np.full(dims, np.nan, dtype="float64")
        loc = tuple(
            pdf[f"i{k}"].to_numpy(dtype="int64") - block[k] * block_shape[k]
            for k in range(n)
        )
        arr[loc] = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        row = {c: block[k] for k, c in enumerate(bcols)}
        row["shape"] = list(dims)
        row["data"] = arr.tobytes()
        return pd.DataFrame([row])

    schema = ", ".join(f"{c} long" for c in bcols) + ", shape array<int>, data binary"
    return d.groupBy(*bcols).applyInPandas(pack, schema=schema)


def from_blocks(blocks: DataFrame, shape: Sequence[int], block_shape: Sequence[int]) -> Array:
    """Block form -> cell form (NaN cells dropped back to absent)."""
    n = len(shape)
    bcols = [f"b{k}" for k in range(n)]

    def unpack(it):
        for pdf in it:
            outs = []
            for _, row in pdf.iterrows():
                dims = tuple(int(x) for x in row["shape"])
                arr = np.frombuffer(row["data"], dtype="float64").reshape(dims)
                idx = np.indices(dims).reshape(n, -1)
                flat = arr.reshape(-1)
                keep = ~np.isnan(flat)
                cols = {
                    f"i{k}": idx[k][keep] + int(row[f"b{k}"]) * block_shape[k]
                    for k in range(n)
                }
                cols[VALUE_COL] = flat[keep]
                outs.append(pd.DataFrame(cols))
            if outs:
                yield pd.concat(outs)

    schema = ", ".join(f"i{k} long" for k in range(n)) + f", {VALUE_COL} double"
    return Array(blocks.mapInPandas(unpack, schema=schema), tuple(shape))


def map_blocks(
    func: Callable,
    a: Array,
    block_shape: Sequence[int] | None = None,
    with_block_info: bool = False,
) -> Array:
    """Apply ``func(ndarray) -> ndarray`` (same shape) per block
    (reference map_blocks, _map_blocks.py:21; ``block_info`` gives the
    kernel its grid coordinates like the reference's layout contract,
    .ai-docs/block-info-layout-contract.md).  One shuffle on block
    coords, then a fused pack/kernel/unpack in a single
    ``applyInPandas`` stage."""
    shape = a.shape
    if any(s is None for s in shape):
        raise ValueError("map_blocks needs a fully known shape")
    n = a.ndim
    if block_shape is None:
        per = max(1, int(round(1_000_000 ** (1.0 / max(n, 1)))))
        block_shape = tuple(min(int(s), per) for s in shape)
    block_shape = tuple(int(b) for b in block_shape)
    bcols = [f"b{k}" for k in range(n)]
    d = a.df.select(*_block_cols(a, block_shape), *a.index_cols, VALUE_COL)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        block = tuple(int(pdf[c].iloc[0]) for c in bcols)
        dims = _dims(block, block_shape, shape)
        arr = np.full(dims, np.nan, dtype="float64")
        loc = tuple(
            pdf[f"i{k}"].to_numpy(dtype="int64") - block[k] * block_shape[k]
            for k in range(n)
        )
        arr[loc] = pd.to_numeric(pdf[VALUE_COL]).to_numpy(dtype="float64")
        if with_block_info:
            info = {
                "chunk-location": block,
                "array-location": [
                    (block[k] * block_shape[k], block[k] * block_shape[k] + dims[k])
                    for k in range(n)
                ],
                "shape": shape,
            }
            out = np.asarray(func(arr, block_info=info), dtype="float64")
        else:
            out = np.asarray(func(arr), dtype="float64")
        if out.shape != dims:
            raise ValueError(f"map_blocks kernel changed block shape {dims} -> {out.shape}")
        idx = np.indices(dims).reshape(n, -1)
        flat = out.reshape(-1)
        keep = ~np.isnan(flat)
        cols = {f"i{k}": idx[k][keep] + block[k] * block_shape[k] for k in range(n)}
        cols[VALUE_COL] = flat[keep]
        return pd.DataFrame(cols)

    schema = ", ".join(f"i{k} long" for k in range(n)) + f", {VALUE_COL} double"
    return Array(d.groupBy(*bcols).applyInPandas(kernel, schema=schema), shape)


def apply_along_axis(func1d: Callable, axis: int, a: Array) -> Array:
    """Apply a 1-D kernel along ``axis``, distributed over all other
    axes (reference routines/_apply.py:16): groupBy the kept axes, one
    dense vector per group, scalar or vector output inferred from the
    first result."""
    axis = axis % a.ndim
    n_ax = a.shape[axis]
    if n_ax is None:
        raise ValueError("apply_along_axis needs a known length on the target axis")
    others = [k for k in range(a.ndim) if k != axis]
    ocols = [f"i{k}" for k in others]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = np.full(int(n_ax), np.nan, dtype="float64")
        vec[pdf[f"i{axis}"].to_numpy(dtype="int64")] = pd.to_numeric(
            pdf[VALUE_COL]
        ).to_numpy(dtype="float64")
        out = np.atleast_1d(np.asarray(func1d(vec), dtype="float64"))
        base = {c: pdf[c].iloc[0] for c in ocols}
        rows = pd.DataFrame({"__j": np.arange(len(out), dtype="int64"), "__o": out})
        for c, v in base.items():
            rows[c] = v
        return rows[ocols + ["__j", "__o"]]

    if ocols:
        schema = ", ".join(f"{c} long" for c in ocols) + ", __j long, __o double"
        res = a.df.groupBy(*ocols).applyInPandas(kernel, schema=schema)
    else:
        # grouping on a literal: the kernel must emit the group column
        # too, so wrap it to append __g before returning
        def kernel_g(pdf):
            out = kernel(pdf)
            out = out.copy()
            out["__g"] = 1
            return out[["__g", "__j", "__o"]]

        res = (
            a.df.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(kernel_g, schema="__g int, __j long, __o double")
            .drop("__g")
        )

    # probe output length from metadata-free path: run func1d on a probe
    probe = np.ones(int(n_ax))
    out_len = np.atleast_1d(np.asarray(func1d(probe))).shape[0]
    scalar_out = out_len == 1 and np.asarray(func1d(probe)).ndim == 0
    if scalar_out:
        sel = [F.col(c).alias(f"i{j}") for j, c in enumerate(ocols)]
        d = res.filter(F.col("__j") == 0).select(*sel, F.col("__o").alias(VALUE_COL))
        return Array(d, tuple(a.shape[k] for k in others))
    # vector output replaces the axis (placed last)
    sel = [F.col(c).alias(f"i{j}") for j, c in enumerate(ocols)]
    sel.append(F.col("__j").alias(f"i{len(ocols)}"))
    d = res.select(*sel, F.col("__o").alias(VALUE_COL))
    return Array(d, tuple(a.shape[k] for k in others) + (out_len,))


def _parse_gufunc_sig(signature: str):
    ins, out = signature.replace(" ", "").split("->")
    def parse(side):
        parts = []
        for p in side.strip("()").split("),("):
            parts.append(tuple(x for x in p.split(",") if x))
        return parts
    return parse(ins), parse(out)[0]


def apply_gufunc(func: Callable, signature: str, *arrays: Array) -> Array:
    """Generalized ufunc with FULL NumPy signatures (reference
    _gufunc.py:154,491; tests/test_gufunc.py is the spec): any number
    of named core dims per operand -- ``"(i,j),(j,k)->(i,k)"`` works.
    Each operand's trailing ``len(spec)`` axes are its core dims
    (sizes resolved by name across operands and checked consistent);
    leading axes are loop dims, which must be identical across the
    operands that have them (operands with no loop dims broadcast to
    every loop point).  Output core dims must be named in some input.

    Physical plan: each operand's core cells flatten to ONE C-order
    flat index column in a tagged UNION, so a single
    ``groupBy(loop dims).applyInPandas`` reassembles the per-operand
    core ndarrays in-kernel -- one shuffle on the loop key, zero
    joins, any core rank."""
    in_specs, out_spec = _parse_gufunc_sig(signature)
    if len(in_specs) != len(arrays):
        raise ValueError("signature arity mismatch")

    # resolve core-dim sizes by name
    sizes: dict[str, int] = {}
    loop_shape: tuple | None = None
    for spec, arr in zip(in_specs, arrays):
        ncore = len(spec)
        if ncore > arr.ndim:
            raise ValueError(f"spec {spec} needs {ncore} axes, operand has {arr.ndim}")
        for name, ax in zip(spec, range(arr.ndim - ncore, arr.ndim)):
            s = arr.shape[ax]
            if s is None:
                raise ValueError("gufunc core dims need known sizes")
            if sizes.setdefault(name, s) != s:
                raise ValueError(f"core dim {name!r}: {sizes[name]} != {s}")
        lshape = arr.shape[: arr.ndim - ncore]
        if lshape:
            if loop_shape is None:
                loop_shape = lshape
            elif lshape != loop_shape:
                raise ValueError(f"loop dims differ: {lshape} vs {loop_shape}")
    loop_shape = loop_shape or ()
    for name in out_spec:
        if name not in sizes:
            raise ValueError(f"output core dim {name!r} not named in any input")
    nloop = len(loop_shape)
    lcols = [f"i{k}" for k in range(nloop)]
    core_shapes = [tuple(sizes[nm] for nm in spec) for spec in in_specs]
    out_shape_core = tuple(sizes[nm] for nm in out_spec)

    # tagged UNION: loop cols + operand tag + C-order flat core index
    unioned = None
    for t, (arr, spec, cshape) in enumerate(zip(arrays, in_specs, core_shapes)):
        has_loop = arr.ndim > len(spec)
        sel = []
        for k in range(nloop):
            sel.append(
                F.col(f"i{k}") if has_loop else F.lit(None).cast("long").alias(f"i{k}")
            )
        sel.append(F.lit(t).cast("int").alias("__t"))
        flat = F.lit(0).cast("long")
        stride = 1
        core0 = arr.ndim - len(spec)
        for j in range(len(spec) - 1, -1, -1):
            flat = flat + F.col(f"i{core0 + j}") * F.lit(stride)
            stride *= cshape[j]
        sel.append(flat.alias("__c"))
        sel.append(F.col(VALUE_COL).cast("double").alias("__v"))
        d = arr.df.select(*sel)
        if not has_loop and nloop:
            # broadcast a loop-dim-free operand to every loop point
            spark = arr.spark
            grid = None
            for k, s in enumerate(loop_shape):
                r = spark.range(s).select(F.col("id").alias(f"i{k}"))
                grid = r if grid is None else grid.crossJoin(r)
            d = d.drop(*lcols).crossJoin(F.broadcast(grid))
            d = d.select(*lcols, "__t", "__c", "__v")
        unioned = d if unioned is None else unioned.unionByName(d)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        args = []
        for t, cshape in enumerate(core_shapes):
            sub = pdf[pdf["__t"] == t]
            size = int(np.prod(cshape)) if cshape else 1
            vec = np.full(size, np.nan, dtype="float64")
            vec[sub["__c"].to_numpy(dtype="int64")] = sub["__v"].to_numpy(
                dtype="float64"
            )
            args.append(vec.reshape(cshape) if cshape else float(vec[0]))
        out = np.asarray(func(*args), dtype="float64")
        if out.shape != out_shape_core:
            out = np.broadcast_to(np.atleast_1d(out), out_shape_core or (1,))
        flat = out.reshape(-1)
        base = {c: pdf[c].iloc[0] for c in lcols}
        rows = pd.DataFrame({"__j": np.arange(len(flat), dtype="int64"), "__o": flat})
        for c, v in base.items():
            rows[c] = v
        return rows[lcols + ["__j", "__o"]]

    if lcols:
        schema = ", ".join(f"{c} long" for c in lcols) + ", __j long, __o double"
        res = unioned.groupBy(*lcols).applyInPandas(kernel, schema=schema)
    else:
        def kernel_g(pdf):
            out = kernel(pdf)
            out = out.copy()
            out["__g"] = 1
            return out[["__g", "__j", "__o"]]

        res = (
            unioned.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(kernel_g, schema="__g int, __j long, __o double")
            .drop("__g")
        )

    # unflatten the output core index back to named dims (projection)
    sel = [F.col(c).alias(f"i{j}") for j, c in enumerate(lcols)]
    if out_spec:
        strides = []
        mul = 1
        for s in reversed(out_shape_core):
            strides.append(mul)
            mul *= s
        strides = list(reversed(strides))
        for j, (s, st) in enumerate(zip(out_shape_core, strides)):
            sel.append(
                ((F.col("__j") / F.lit(st)).cast("long") % F.lit(s)).alias(
                    f"i{nloop + j}"
                )
            )
        d = res.select(*sel, F.col("__o").alias(VALUE_COL))
        return Array(d, loop_shape + out_shape_core)
    d = res.filter(F.col("__j") == 0).select(*sel, F.col("__o").alias(VALUE_COL))
    return Array(d, loop_shape)
