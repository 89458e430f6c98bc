"""Property-based fuzz: random op chains vs the NumPy oracle,
mirroring the reference's tests/test_fuzz_optimize.py:1-80 (hypothesis
chains over elemwise / transpose / slice / reshape / reductions with
arange-based distinct values so index-mapping bugs change values)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import assert_eq


def _apply_op(op, arr, a):
    """Apply one (engine, numpy) op pair; returns (Array, ndarray)."""
    from dask_array_spark.operators import manipulation as M
    from dask_array_spark.operators import reductions as R

    if op == "add2":
        return arr + 2.0, a + 2.0
    if op == "mul":
        return arr * 3.0 - 1.0, a * 3.0 - 1.0
    if op == "abs":
        return abs(arr - 10.0), np.abs(a - 10.0)
    if op == "transpose":
        if a.ndim == 2:
            return M.transpose(arr), a.T
        return arr, a
    if op == "flip":
        return M.flip(arr, 0), np.flip(a, 0)
    if op == "slice_head":
        if a.ndim == 1 and a.shape[0] >= 4:
            return arr[1 : a.shape[0] - 1], a[1 : a.shape[0] - 1]
        return arr, a
    if op == "slice_step":
        if a.ndim == 1 and a.shape[0] >= 6:
            return arr[::2], a[::2]
        return arr, a
    if op == "reshape_flat":
        if a.ndim == 2:
            return arr.reshape(a.size), a.reshape(a.size)
        return arr, a
    if op == "roll":
        return M.roll(arr, 2, 0), np.roll(a, 2, 0)
    if op == "square":
        return arr * arr, a * a
    if op == "concat_self":
        if a.ndim == 1:
            return M.concatenate([arr, arr], 0), np.concatenate([a, a], 0)
        return arr, a
    if op == "gram":
        if a.ndim == 2:
            from dask_array_spark.operators import linalg

            return linalg.matmul(arr, M.transpose(arr)), a @ a.T
        return arr, a
    raise AssertionError(op)


OPS = [
    "add2", "mul", "abs", "transpose", "flip",
    "slice_head", "slice_step", "reshape_flat", "roll", "square",
    "concat_self", "gram",
]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.integers(2, 6),
    cols=st.integers(2, 6),
    chain=st.lists(st.sampled_from(OPS), min_size=1, max_size=4),
    reduce_end=st.sampled_from(["none", "sum0", "sum_all", "max_all"]),
)
def test_fuzz_chain_matches_numpy(spark, rows, cols, chain, reduce_end):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    # arange values: every cell distinct so index-mapping bugs change
    # values (reference test_fuzz_optimize.py:9-13)
    a = np.arange(rows * cols, dtype="float64").reshape(rows, cols)
    arr = from_numpy(spark, a)
    for op in chain:
        arr, a = _apply_op(op, arr, a)
    if reduce_end == "sum0":
        arr, a = R.nansum(arr, axis=0), a.sum(axis=0)
    elif reduce_end == "sum_all":
        arr, a = R.nansum(arr, axis=None), a.sum()
    elif reduce_end == "max_all":
        arr, a = R.nanmax(arr, axis=None), a.max()
    assert_eq(arr, a)
