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
