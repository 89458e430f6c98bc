import os

import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from dask_array_spark.session import get_spark

    # small core count keeps per-test latency low; semantics identical
    s = get_spark("tests", cpus=int(os.environ.get("TEST_CPUS", "8")), shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def spark_round6(v: float) -> float:
    """The faithful model of Spark's round(col, 6) on a DOUBLE:
    BigDecimal.valueOf(double) quantized HALF_UP -- i.e. HALF_UP over
    the double's SHORTEST DECIMAL representation, which repr(float)
    reproduces exactly.  NOT np.round (banker's) and NOT
    floor(v*1e6+0.5)/1e6 (the *1e6 scaling can cross a half-boundary
    via FP error where the decimal representation does not).  The
    single shared model for every fuzz suite that replays the
    engine's 6-decimal rounding contract."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    ) + 0.0


def assert_eq(arr, expected, rtol=1e-9, atol=1e-12):
    """Engine-vs-NumPy oracle compare (shape + values + NaN pattern),
    mirroring the reference's assert_eq (_test_utils.py)."""
    got = arr.compute()
    expected = np.asarray(expected)
    assert got.shape == expected.shape, f"shape {got.shape} != {expected.shape}"
    if expected.dtype.kind == "f" or (hasattr(got, "dtype") and got.dtype.kind == "f"):
        np.testing.assert_allclose(got, expected, rtol=rtol, atol=atol, equal_nan=True)
    else:
        np.testing.assert_array_equal(got, expected)
