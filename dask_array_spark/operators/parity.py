"""Namespace-parity tail: the remaining public names from the
reference's ``dask_array/__init__.py`` export list not yet spelled in
``api.py`` (mechanical audit, round 4).  Array-valued ops dispatch to
existing operators; chunk-bookkeeping utilities are faithful
pure-Python ports of their public contracts; a few names that are
meaningless under Spark's execution model are documented no-ops kept
so reference code importing them still runs.

References: _shuffle.py:54 (shuffle), _blockwise.py (blockwise),
creation/_tri.py (tril/triu/diag), manipulation/_flip.py (rot90),
routines/_misc.py (around/apply_over_axes), _chunk_types.py:31
(register_chunk_type), core/_conversion.py (array/asarray).
"""

from __future__ import annotations

import builtins
from typing import Callable, Sequence

import numpy as np
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array
from . import creation as CR
from . import manipulation as M
from .conveniences import asarray
from .slicing import take


__all__ = [
    "PerformanceWarning",
    "aligned_coarsen_chunks",
    "apply_over_axes",
    "around",
    "array",
    "block",
    "blockwise",
    "compute",
    "diag",
    "empty",
    "ndim",
    "normalize_chunks",
    "ravel",
    "rechunk",
    "register_chunk_type",
    "rot90",
    "round",
    "shape",
    "shuffle",
    "tril",
    "triu",
    "unify_chunks",
]


class PerformanceWarning(Warning):
    """Warning for operations that work but defeat the optimizer
    (reference exports the same class for e.g. oversized graphs)."""


# -- trivial accessors / conversions ---------------------------------------


array = asarray


def shape(a) -> tuple:
    return a.shape if isinstance(a, Array) else np.shape(a)


def ndim(a) -> int:
    return a.ndim if isinstance(a, Array) else np.ndim(a)


def ravel(a: Array) -> Array:
    return a.ravel()


def compute(*arrays):
    """Materialize each collection (reference top-level compute).  The
    driver-side transfer is per-array; persist() first if several
    arrays share a lineage fan-out."""
    return tuple(
        a.compute() if isinstance(a, Array) else np.asarray(a) for a in arrays
    )


def empty(spark, shape: Sequence[int]) -> Array:
    """Reference ``empty`` returns uninitialized memory; a declarative
    engine has no such thing, so this is zeros() -- every cell a
    defined value, same shape/dtype contract."""
    return CR.zeros(spark, shape)


def around(a: Array, decimals: int = 0) -> Array:
    """Round half-to-even like np.round (Spark bround), per cell."""
    return a._unary(lambda c: F.bround(c, decimals))


round = around  # noqa: A001  (numpy exports the shadowing name too)


# -- triangles / diagonals -------------------------------------------------


def tril(a: Array, k: int = 0) -> Array:
    """Zero cells above the k-th diagonal (np.tril).  Every input cell
    already exists, so the dense-exact form is a free projection --
    no filter, no implicit-zero caveat."""
    if a.ndim != 2:
        raise ValueError("tril expects a 2-D array")
    v = F.when(F.col("i1") <= F.col("i0") + F.lit(k), F.col(VALUE_COL)).otherwise(
        F.lit(0.0)
    )
    return Array(a.df.select("i0", "i1", v.alias(VALUE_COL)), a.shape)


def triu(a: Array, k: int = 0) -> Array:
    """Zero cells below the k-th diagonal (np.triu)."""
    if a.ndim != 2:
        raise ValueError("triu expects a 2-D array")
    v = F.when(F.col("i1") >= F.col("i0") + F.lit(k), F.col(VALUE_COL)).otherwise(
        F.lit(0.0)
    )
    return Array(a.df.select("i0", "i1", v.alias(VALUE_COL)), a.shape)


def diag(a: Array, k: int = 0) -> Array:
    """NumPy diag: 2-D input extracts the k-th diagonal; 1-D input
    builds the matrix with the vector on the k-th diagonal -- sparse
    cells, zeros implicit off-diagonal exactly like eye/tri
    (creation.py); densify() fills the grid when a consumer needs
    every cell."""
    if a.ndim == 2:
        return CR.diagonal(a, k)
    if a.ndim != 1:
        raise ValueError("diag expects a 1-D or 2-D array")
    (n,) = a.shape
    size = n + abs(k)
    roff, coff = (0, k) if k >= 0 else (-k, 0)
    d = a.df.select(
        (F.col("i0") + F.lit(roff)).alias("i0"),
        (F.col("i0") + F.lit(coff)).alias("i1"),
        F.col(VALUE_COL),
    )
    return Array(d, (size, size))


def rot90(a: Array, k: int = 1, axes: tuple[int, int] = (0, 1)) -> Array:
    """Rotate 90 degrees in the plane of ``axes`` -- the NumPy
    flip/transpose composition, all zero-movement index remaps."""
    ax0, ax1 = axes
    if ax0 == ax1:
        raise ValueError("axes must be different")
    k = k % 4
    if k == 0:
        return a
    perm = list(range(a.ndim))
    perm[ax0], perm[ax1] = perm[ax1], perm[ax0]
    if k == 1:
        return M.transpose(M.flip(a, ax1), perm)
    if k == 2:
        return M.flip(M.flip(a, ax0), ax1)
    return M.flip(M.transpose(a, perm), ax1)


# -- assembly / movement ---------------------------------------------------


def _block_depth(x) -> int:
    d = 0
    while isinstance(x, list):
        if not x:
            raise ValueError("block does not accept empty lists")
        d += 1
        x = x[0]
    return d


def _atleast_nd(a: Array, n: int) -> Array:
    while a.ndim < n:
        a = M.expand_dims(a, 0)
    return a


def block(arrays) -> Array:
    """Assemble from nested lists of blocks (reference re-export of
    np.block semantics): the innermost lists concatenate along the
    last axis, each outer nesting level along the axis before it."""
    depth = _block_depth(arrays)
    if depth == 0:
        return arrays

    def rec(x, level: int) -> Array:
        if not isinstance(x, list):
            return _atleast_nd(x, depth)
        parts = [rec(e, level + 1) for e in x]
        axis = parts[0].ndim - (depth - level)
        return M.concatenate(parts, axis=axis)

    return rec(arrays, 0)


def shuffle(a: Array, indexer: list[list[int]], axis: int, chunks: str = "auto") -> Array:
    """Reorder one dimension so each positional group lands
    contiguously (reference _shuffle.py:54).  Values follow the
    flattened group order -- exactly the reference's result; the
    reference's chunk-packing heuristics govern *partitioning*, which
    Spark re-plans with AQE, so ``chunks`` is accepted and ignored."""
    flat = [i for grp in indexer for i in grp]
    seen = set()
    for i in flat:
        if i in seen:
            raise ValueError(f"duplicate index {i} in shuffle indexer")
        seen.add(i)
    return take(a, flat, axis=axis)


def rechunk(a: Array, chunks="auto", **kwargs) -> Array:
    """Parity alias: chunk geometry is physical partitioning here
    (SURVEY.md section 4.2), which AQE re-plans at every exchange.
    Accepts the reference signature; an int chunk spec hints the
    partition count, anything else leaves the plan to AQE."""
    if isinstance(chunks, int) and chunks > 0 and a.shape[0]:
        nparts = max(1, int(np.ceil(a.shape[0] / chunks)))
        return Array(a.df.repartition(nparts, "i0"), a.shape)
    return a


def blockwise(func: Callable, out_ind: str, *args, **kwargs) -> Array:
    """Reference's generic tensor blockwise (_blockwise.py).  The
    aligned, contraction-free case (every operand indexed exactly by
    ``out_ind``) applies ``func`` Arrow-batched across the aligned
    operands.  Contractions and axis permutations route to the
    operators Catalyst can actually optimize -- einsum / tensordot /
    apply_gufunc -- instead of a generic task graph, so those index
    patterns raise with that pointer rather than silently building a
    slow path."""
    from .elemwise import elemwise

    pairs = [(args[i], args[i + 1]) for i in range(0, len(args), 2)]
    if not pairs:
        raise ValueError("blockwise needs at least one (array, index) pair")
    if any(ind != out_ind for _, ind in pairs):
        raise NotImplementedError(
            "blockwise with contraction/permutation indices: use einsum, "
            "tensordot, or apply_gufunc (same semantics, optimizer-visible)"
        )
    arrays = [a for a, _ in pairs]
    return elemwise(_nary_numpy_udf(func, len(arrays)), *arrays)


def _nary_numpy_udf(func: Callable, n: int, otype: str = "double"):
    """Arrow-batched Column wrapper for an N-ary vectorized NumPy
    callable (pandas_udf needs a fixed-arity annotated signature, so
    one is generated for the requested arity)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = ", ".join(f"s{i}" for i in range(n))
    ns: dict = {"func": func, "pd": pd, "np": np}
    exec(
        f"def _kernel({params}):\n"
        f"    arrs = [s.to_numpy(dtype='float64') for s in ({params},)]\n"
        f"    return pd.Series(np.asarray(func(*arrs), dtype='float64'))\n",
        ns,
    )
    kernel = ns["_kernel"]
    kernel.__annotations__ = {f"s{i}": pd.Series for i in range(n)}
    kernel.__annotations__["return"] = pd.Series
    return pandas_udf(kernel, otype)


# -- chunk bookkeeping utilities ------------------------------------------


def normalize_chunks(chunks, shape: Sequence[int] | None = None, **kwargs):
    """Expand a chunk spec into explicit per-dimension tuples
    (reference public utility; the subset of the contract that does
    not depend on dtype/config: ints, -1/None for full, 'auto' as a
    2**20-element default, tuples passed through)."""
    if shape is None:
        raise ValueError("normalize_chunks needs the array shape")
    if not isinstance(chunks, (tuple, list)):
        chunks = (chunks,) * len(shape)
    out = []
    for spec, n in zip(chunks, shape):
        if isinstance(spec, (tuple, list)):
            if sum(spec) != n:
                raise ValueError(f"chunks {spec} do not sum to dimension {n}")
            out.append(tuple(int(c) for c in spec))
            continue
        if spec in (-1, None) or spec == "auto" and n <= 2**20:
            size = n
        elif spec == "auto":
            size = 2**20
        else:
            size = int(spec)
        if size <= 0:
            size = max(n, 1)
        full, rem = divmod(n, size)
        out.append(tuple([size] * full + ([rem] if rem else [])) or (0,))
    return tuple(out)


def aligned_coarsen_chunks(chunks: Sequence[int], multiple: int) -> tuple:
    """Rechunk sizes aligned to a coarsening factor: every boundary a
    multiple of ``multiple`` except possibly the last (reference
    coarsen helper's public contract)."""
    total = int(sum(chunks))
    if multiple <= 0:
        raise ValueError("multiple must be positive")
    aligned = []
    remaining = total
    for c in chunks:
        if remaining <= 0:
            break
        # builtins.round: the module-level `round` is the Array op
        size = max(multiple, int(builtins.round(c / multiple)) * multiple)
        size = min(size, remaining)
        aligned.append(size)
        remaining -= size
    if remaining:
        aligned.append(remaining)
    # merge a trailing fragment smaller than one coarsening window
    if len(aligned) > 1 and aligned[-1] < multiple:
        aligned[-2] += aligned.pop()
    return tuple(aligned)


def unify_chunks(*args):
    """Reference utility aligning operand chunk grids before
    blockwise.  Alignment is automatic in the cell encoding (joins
    align on index equality), so this returns the operands unchanged
    with an empty dimension map -- kept so reference call sites run."""
    arrays = [a for a in args if isinstance(a, Array)]
    return {}, arrays


_chunk_type_registry: list[type] = []


def register_chunk_type(t: type) -> None:
    """Parity no-op registry (reference _chunk_types.py:31): execution
    here is Arrow/pandas batches, so backend duck-arrays do not plug
    into kernels; registrations are recorded for introspection only."""
    _chunk_type_registry.append(t)


# -- axis application ------------------------------------------------------


def apply_over_axes(func: Callable, a: Array, axes) -> Array:
    """np.apply_over_axes: apply ``func(a, axis)`` over each axis in
    turn, re-expanding when the rank drops so the result broadcasts
    against the input."""
    if np.isscalar(axes):
        axes = (int(axes),)
    out = a
    for ax in axes:
        ax = int(ax)
        res = func(out, ax)
        if res.ndim == out.ndim - 1:
            res = M.expand_dims(res, ax)
        elif res.ndim != out.ndim:
            raise ValueError(
                "function is not returning an array of the correct shape"
            )
        out = res
    return out
