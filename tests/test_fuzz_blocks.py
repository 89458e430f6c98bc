"""Property-based fuzz of the kernel-surface tier (einsum, map_blocks,
apply_along_axis, apply_gufunc) vs NumPy oracles.

The ten round-7 fuzz suites cover elemwise/reduction/window/index
algebra; this one attacks the two remaining structured surfaces:

* ``einsum`` gets RANDOM SPECS -- random operand counts, random label
  strings (including repeated labels within one operand = diagonals,
  disjoint label sets = cross products), random explicit outputs
  (every permutation-subset of the used labels) and the implicit-output
  mode -- checked against ``np.einsum`` on the same operands.  The
  reference fuzzes its einsum lowering the same way
  (tests/test_einsum.py's spec sweep).
* the block-kernel ops get random GRIDS: block shapes that don't
  divide the array, ragged edge blocks, 1x1 blocks, block-DEPENDENT
  kernels (per-block demean) where a grid-bookkeeping bug changes
  values, and block_info offsets.  Oracles replay the same grid in
  plain NumPy.

Values are arange-distinct so index-mapping bugs corrupt values, not
just positions.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import assert_eq


def _arr(spark, x):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, np.asarray(x, dtype="float64"))


def _vals(shape, seed):
    n = int(np.prod(shape))
    rng = np.random.default_rng(seed)
    # distinct, sign-mixed, O(1..n) magnitude
    v = (np.arange(n, dtype="float64") + 1.0) * rng.choice([-1.0, 1.0], n)
    return v.reshape(shape)


# ---------------------------------------------------------------- einsum

LABELS = "ijkl"


@st.composite
def einsum_case(draw):
    n_ops = draw(st.integers(1, 3))
    specs = []
    for _ in range(n_ops):
        nd = draw(st.integers(1, 2))
        specs.append(
            "".join(draw(st.lists(st.sampled_from(LABELS), min_size=nd, max_size=nd)))
        )
    used = sorted(set("".join(specs)))
    out_perm = draw(st.permutations(used))
    k = draw(st.integers(0, len(used)))
    out_labels = "".join(out_perm[:k])
    sizes = {c: draw(st.integers(2, 3)) for c in LABELS}
    return specs, out_labels, sizes


@settings(max_examples=4, deadline=None)
@given(einsum_case(), st.integers(0, 10_000))
def test_einsum_random_specs(spark, case, seed):
    from dask_array_spark.operators import linalg as LA

    specs, out_labels, sizes = case
    ops_np = [
        _vals(tuple(sizes[c] for c in lab), seed + t) for t, lab in enumerate(specs)
    ]
    spec = ",".join(specs) + "->" + out_labels
    want = np.einsum(spec, *ops_np)
    got = LA.einsum(spec, *(_arr(spark, x) for x in ops_np))
    assert_eq(got, want, rtol=1e-9)


@settings(max_examples=4, deadline=None)
@given(einsum_case(), st.integers(0, 10_000))
def test_einsum_implicit_output(spark, case, seed):
    from dask_array_spark.operators import linalg as LA

    specs, _, sizes = case
    ops_np = [
        _vals(tuple(sizes[c] for c in lab), seed + t) for t, lab in enumerate(specs)
    ]
    spec = ",".join(specs)  # implicit: sorted once-occurring labels
    want = np.einsum(spec, *ops_np)
    got = LA.einsum(spec, *(_arr(spark, x) for x in ops_np))
    assert_eq(got, want, rtol=1e-9)


def test_einsum_diagonal_and_trace(spark):
    from dask_array_spark.operators import linalg as LA

    x = _vals((3, 3), 7)
    assert_eq(LA.einsum("ii->i", _arr(spark, x)), np.einsum("ii->i", x))
    assert_eq(LA.einsum("ii->", _arr(spark, x)), np.einsum("ii->", x))
    y = _vals((3, 3, 4), 8)
    assert_eq(LA.einsum("iij->ij", _arr(spark, y)), np.einsum("iij->ij", y))
    assert_eq(LA.einsum("iij->j", _arr(spark, y)), np.einsum("iij->j", y))
    # shared-base fusion: x*x with identical labels must not self-join
    a = _arr(spark, x)
    assert_eq(LA.einsum("ij,ij->i", a, a), np.einsum("ij,ij->i", x, x))


# ---------------------------------------------------------------- map_blocks


@settings(max_examples=4, deadline=None)
@given(
    st.integers(1, 9),
    st.integers(1, 7),
    st.integers(1, 5),
    st.integers(1, 5),
    st.integers(0, 10_000),
)
def test_map_blocks_random_grid_demean(spark, n, m, bn, bm, seed):
    """Per-block demean: the oracle replays the SAME grid in NumPy, so
    any block-assignment or ragged-edge bug changes values."""
    from dask_array_spark.core import blocks as B

    x = _vals((n, m), seed)
    got = B.map_blocks(lambda b: b - b.mean() + 1.0, _arr(spark, x), (bn, bm))
    want = np.empty_like(x)
    for r0 in range(0, n, bn):
        for c0 in range(0, m, bm):
            blk = x[r0 : r0 + bn, c0 : c0 + bm]
            want[r0 : r0 + bn, c0 : c0 + bm] = blk - blk.mean() + 1.0
    assert_eq(got, want)


@settings(max_examples=4, deadline=None)
@given(st.integers(1, 9), st.integers(1, 5), st.integers(0, 10_000))
def test_map_blocks_block_info_offsets(spark, n, bn, seed):
    """block_info array-location offsets must match the grid math."""
    from dask_array_spark.core import blocks as B

    x = _vals((n,), seed)

    def kern(b, block_info=None):
        (lo, _hi), = block_info["array-location"]
        return b + 1000.0 * lo

    got = B.map_blocks(kern, _arr(spark, x), (bn,), with_block_info=True)
    want = np.empty_like(x)
    for r0 in range(0, n, bn):
        want[r0 : r0 + bn] = x[r0 : r0 + bn] + 1000.0 * r0
    assert_eq(got, want)


# ---------------------------------------------------------- apply_along_axis

AXIS_FUNCS = [
    ("sum", np.sum),
    ("ptp", np.ptp),
    ("cumsum", np.cumsum),
    ("sort", np.sort),
    ("reverse", lambda v: v[::-1]),
]


@settings(max_examples=4, deadline=None)
@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.integers(1, 4),
    st.integers(0, 2),
    st.sampled_from(AXIS_FUNCS),
    st.integers(0, 10_000),
)
def test_apply_along_axis_random(spark, n, m, p, axis, named, seed):
    """Documented contract: scalar kernels drop the axis (NumPy-equal);
    vector kernels place the result axis LAST (NumPy modulo moveaxis)."""
    from dask_array_spark.core import blocks as B

    _, f = named
    x = _vals((n, m, p), seed)
    got = B.apply_along_axis(f, axis, _arr(spark, x))
    want = np.apply_along_axis(f, axis, x)
    if want.ndim == x.ndim:  # vector output: engine puts it last
        want = np.moveaxis(want, axis, -1)
    assert_eq(got, want)


# ------------------------------------------------------------ apply_gufunc

GUFUNC_CASES = [
    ("(i)->()", lambda v: np.sum(v), 1),
    ("(i)->(i)", lambda v: v - v.mean(), 1),
    ("(i,j)->(j)", lambda M: M.sum(axis=0), 1),
    ("(i),(i)->()", lambda u, v: u @ v, 2),
    ("(i,j),(j)->(i)", lambda M, w: M @ w, 2),
    ("(i,j),(j,k)->(i,k)", lambda A, Bm: A @ Bm, 2),
]

LOOP_SHAPES = [(), (3,), (2, 2)]


@settings(max_examples=4, deadline=None)
@given(
    st.sampled_from(GUFUNC_CASES),
    st.sampled_from(LOOP_SHAPES),
    st.integers(2, 4),
    st.integers(2, 4),
    st.integers(2, 3),
    st.integers(0, 10_000),
)
def test_apply_gufunc_random(spark, case, loop, si, sj, sk, seed):
    from dask_array_spark.core import blocks as B

    sig, f, n_ops = case
    sizes = {"i": si, "j": sj, "k": sk}
    ins, out = sig.replace(" ", "").split("->")
    in_specs = [tuple(x for x in p.split(",") if x) for p in ins.strip("()").split("),(")]
    out_spec = tuple(x for x in out.strip("()").split(",") if x)

    ops_np = []
    for t, spec in enumerate(in_specs[:n_ops]):
        shape = loop + tuple(sizes[c] for c in spec)
        ops_np.append(_vals(shape, seed + t))

    got = B.apply_gufunc(f, sig, *(_arr(spark, x) for x in ops_np))

    out_core = tuple(sizes[c] for c in out_spec)
    want = np.empty(loop + out_core, dtype="float64")
    for idx in np.ndindex(loop or (1,)):
        key = idx if loop else ()
        args = [x[key] for x in ops_np]
        want[key] = f(*args)
    assert_eq(got, want)
