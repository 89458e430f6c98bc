"""``da.chunk`` namespace parity: local NumPy block-kernel helpers
(reference _chunk.py exports this module as ``chunk``).  These run
INSIDE executor kernels -- the callables users hand to
``map_blocks`` / ``reduction`` / ``coarsen`` -- so they are plain
NumPy functions, not DataFrame operators."""

from __future__ import annotations

from functools import wraps

import numpy as np

__all__ = ["coarsen", "concat", "keepdims_wrapper", "topk", "trim"]


def concat(seqs):
    """Flatten one nesting level (utility for block assembly)."""
    out = []
    for s in seqs:
        out.extend(s)
    return out


def keepdims_wrapper(fn):
    """Wrap an axis-reducing NumPy callable with a ``keepdims``
    parameter that re-expands the reduced dimensions so partials stack
    back into the block grid.  Contract matches the reference
    (_chunk.py:146): expansion happens ONLY when keepdims is truthy;
    any falsy keepdims (False or the default None) returns the
    reducer's un-expanded result, with or without an explicit axis."""

    @wraps(fn)
    def wrapped(x, axis=None, keepdims=None, **kwargs):
        out = fn(x, axis=axis, **kwargs)
        if not keepdims:
            return out
        axes = range(x.ndim) if axis is None else np.atleast_1d(axis)
        for ax in sorted(int(a) % x.ndim for a in np.atleast_1d(list(axes))):
            out = np.expand_dims(out, ax)
        return out

    return wrapped


def trim(x, axes=None):
    """Trim a border of ``axes`` elements from every side (the halo
    removal step of overlap kernels)."""
    if axes is None:
        return x
    if isinstance(axes, int):
        axes = (axes,) * x.ndim
    sl = tuple(slice(ax, -ax if ax else None) for ax in axes)
    return x[sl]


def coarsen(reduction, x, axes, trim_excess=False, **kwargs):
    """Block-local coarsening: reduce each ``axes[i]``-sized window
    along axis i with ``reduction`` (np.mean/np.max/...)."""
    if trim_excess:
        sl = tuple(
            slice(0, (x.shape[i] // axes.get(i, 1)) * axes.get(i, 1))
            for i in range(x.ndim)
        )
        x = x[sl]
    for i in range(x.ndim):
        if x.shape[i] % axes.get(i, 1):
            raise ValueError(
                f"axis {i} of length {x.shape[i]} not divisible by {axes.get(i, 1)}"
            )
    newshape = []
    for i in range(x.ndim):
        k = axes.get(i, 1)
        newshape.extend([x.shape[i] // k, k])
    reduced = x.reshape(tuple(newshape))
    return reduction(reduced, axis=tuple(range(1, 2 * x.ndim, 2)), **kwargs)


def topk(a, k, axis=-1):
    """Largest (k>0) or smallest (-k) values along axis, sorted
    descending/ascending -- the per-block stage of a distributed
    top-k."""
    if k == 0:
        raise ValueError("k must be nonzero")
    sl = np.argsort(a, axis=axis)
    if k > 0:
        idx = tuple(
            slice(None) if d != axis % a.ndim else slice(a.shape[d] - k, None)
            for d in range(a.ndim)
        )
        picked = np.take_along_axis(a, sl, axis=axis)[idx]
        return np.flip(picked, axis=axis)
    idx = tuple(
        slice(None) if d != axis % a.ndim else slice(None, -k)
        for d in range(a.ndim)
    )
    return np.take_along_axis(a, sl, axis=axis)[idx]
