"""map_overlap halo exchange vs NumPy (reference _overlap.py:53-1041).
The NumPy oracle pads the whole array with the same mode, applies the
same kernel, and trims -- what a single giant block would compute.

Kernels are defined as closures (not module-level) so cloudpickle
ships them by value to the executors.
"""

import numpy as np
import pytest

from tests.conftest import assert_eq


def _smooth3():
    def smooth3(x):
        out = x.copy()
        out[1:-1] = (x[:-2] + x[1:-1] + x[2:]) / 3.0
        return out

    return smooth3


@pytest.mark.parametrize("mode,np_mode", [("nearest", "edge"), ("reflect", "reflect")])
def test_map_overlap_1d(spark, rng, mode, np_mode):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    smooth3 = _smooth3()
    a = rng.normal(size=37)
    arr = from_numpy(spark, a)
    got = map_overlap(smooth3, arr, depth=1, block_shape=(10,), boundary=mode)
    padded = np.pad(a, 1, mode=np_mode)
    assert_eq(got, smooth3(padded)[1:-1])


def test_map_overlap_1d_constant(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    smooth3 = _smooth3()
    a = rng.normal(size=23)
    arr = from_numpy(spark, a)
    got = map_overlap(
        smooth3, arr, depth=1, block_shape=(7,), boundary="constant",
        constant_value=0.0,
    )
    padded = np.pad(a, 1, mode="constant")
    assert_eq(got, smooth3(padded)[1:-1])


def test_map_overlap_2d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    def mean3x3(x):
        out = x.copy()
        acc = np.zeros_like(x)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                acc += np.roll(np.roll(x, di, 0), dj, 1)
        out[1:-1, 1:-1] = acc[1:-1, 1:-1] / 9.0
        return out

    a = rng.normal(size=(13, 11))
    arr = from_numpy(spark, a)
    got = map_overlap(mean3x3, arr, depth=1, block_shape=(5, 4), boundary="nearest")
    padded = np.pad(a, 1, mode="edge")
    want = mean3x3(padded)[1:-1, 1:-1]
    assert_eq(got, want)


def test_map_overlap_periodic_1d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    smooth3 = _smooth3()
    a = rng.normal(size=29)
    arr = from_numpy(spark, a)
    got = map_overlap(smooth3, arr, depth=1, block_shape=(8,), boundary="periodic")
    padded = np.pad(a, 1, mode="wrap")
    assert_eq(got, smooth3(padded)[1:-1])


def test_map_overlap_periodic_2d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    def mean3x3(x):
        out = x.copy()
        acc = np.zeros_like(x)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                acc += np.roll(np.roll(x, di, 0), dj, 1)
        out[1:-1, 1:-1] = acc[1:-1, 1:-1] / 9.0
        return out

    a = rng.normal(size=(9, 7))
    arr = from_numpy(spark, a)
    got = map_overlap(mean3x3, arr, depth=1, block_shape=(4, 3), boundary="periodic")
    padded = np.pad(a, 1, mode="wrap")
    assert_eq(got, mean3x3(padded)[1:-1, 1:-1])


# ---------------------------------------------------------------- fuzz
# (round 8) random shapes / block shapes / depths / boundary modes vs
# the same pad-apply-trim NumPy oracle; kernel radius == halo depth,
# the map_overlap contract.  Catches halo mis-shipping at edge blocks,
# trailing blocks smaller than the depth, and per-axis asymmetric
# depths that the fixed cases above never hit.
from hypothesis import given, settings, strategies as st


def _mean_filter(d0, d1=None):
    def kern(x):
        out = x.copy()
        if x.ndim == 1:
            n0 = x.shape[0]
            if d0 and n0 > 2 * d0:
                c0 = n0 - 2 * d0
                acc = np.zeros(c0)
                for o in range(2 * d0 + 1):
                    acc += x[o : o + c0]
                out[d0 : n0 - d0] = acc / (2 * d0 + 1)
        else:
            n0, n1 = x.shape
            e1 = d1 or 0
            if n0 > 2 * d0 and n1 > 2 * e1:
                c0, c1 = n0 - 2 * d0, n1 - 2 * e1
                acc = np.zeros((c0, c1))
                for o0 in range(2 * d0 + 1):
                    for o1 in range(2 * e1 + 1):
                        acc += x[o0 : o0 + c0, o1 : o1 + c1]
                out[d0 : n0 - d0, e1 : n1 - e1] = acc / (
                    (2 * d0 + 1) * (2 * e1 + 1)
                )
        return out

    return kern


_NP_MODE = {"nearest": "edge", "reflect": "reflect", "periodic": "wrap"}


def _oracle(a, kern, depth, mode, cval):
    if mode == "none":
        return kern(a)
    pads = [(d, d) for d in depth]
    if mode == "constant":
        padded = np.pad(a, pads, mode="constant", constant_values=cval)
    else:
        padded = np.pad(a, pads, mode=_NP_MODE[mode])
    out = kern(padded)
    sl = tuple(slice(d, s + d) for d, s in zip(depth, a.shape))
    return out[sl]


@settings(max_examples=4, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    size=st.integers(4, 24),
    block=st.integers(2, 12),
    depth=st.integers(0, 2),
    mode=st.sampled_from(["nearest", "reflect", "periodic", "constant", "none"]),
)
def test_fuzz_map_overlap_1d(spark, seed, size, block, depth, mode):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    depth = min(depth, block, size - 1)
    rng = np.random.default_rng(seed)
    a = np.round(rng.normal(size=size) * 4, 3)
    kern = _mean_filter(depth)
    got = map_overlap(
        kern, from_numpy(spark, a), depth=depth, block_shape=(block,),
        boundary=mode, constant_value=-1.5,
    )
    assert_eq(got, _oracle(a, kern, (depth,), mode, -1.5))


@settings(max_examples=4, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n0=st.integers(3, 12),
    n1=st.integers(3, 12),
    b0=st.integers(2, 6),
    b1=st.integers(2, 6),
    d0=st.integers(0, 2),
    d1=st.integers(0, 2),
    mode=st.sampled_from(["nearest", "reflect", "periodic", "constant", "none"]),
)
def test_fuzz_map_overlap_2d(spark, seed, n0, n1, b0, b1, d0, d1, mode):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators.overlap import map_overlap

    d0 = min(d0, b0, n0 - 1)
    d1 = min(d1, b1, n1 - 1)
    rng = np.random.default_rng(seed)
    a = np.round(rng.normal(size=(n0, n1)) * 4, 3)
    kern = _mean_filter(d0, d1)
    got = map_overlap(
        kern, from_numpy(spark, a), depth=(d0, d1), block_shape=(b0, b1),
        boundary=mode, constant_value=2.25,
    )
    assert_eq(got, _oracle(a, kern, (d0, d1), mode, 2.25))
