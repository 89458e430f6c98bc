"""fft/ifft vs np.fft (grouped-kernel Fourier, operators/fourier.py)."""

import numpy as np
import pytest


def test_fft_1d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C
    from dask_array_spark.operators import fourier

    a = rng.normal(size=16)
    z = fourier.fft(from_numpy(spark, a))
    want = np.fft.fft(a)
    np.testing.assert_allclose(C.real(z).compute(), want.real, atol=1e-9)
    np.testing.assert_allclose(C.imag(z).compute(), want.imag, atol=1e-9)


def test_fft_rows_of_matrix(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C
    from dask_array_spark.operators import fourier

    a = rng.normal(size=(5, 8))
    z = fourier.fft(from_numpy(spark, a), axis=1)  # per-row FFT
    want = np.fft.fft(a, axis=1)
    np.testing.assert_allclose(C.real(z).compute(), want.real, atol=1e-9)
    np.testing.assert_allclose(C.imag(z).compute(), want.imag, atol=1e-9)


def test_fft_ifft_roundtrip(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C
    from dask_array_spark.operators import fourier

    a = rng.normal(size=12)
    back = fourier.ifft(fourier.fft(from_numpy(spark, a)))
    np.testing.assert_allclose(C.real(back).compute(), a, atol=1e-9)
    np.testing.assert_allclose(C.imag(back).compute(), np.zeros(12), atol=1e-9)


def test_fft_long_four_step_matches_numpy(spark):
    """four-step distributed FFT (cross-block butterfly tier): exact
    vs np.fft.fft for composite N, real and complex inputs, including
    a non-square factorization."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C
    from dask_array_spark.operators import fourier

    rng = np.random.default_rng(4)

    def collect_c(arr, n):
        out = np.zeros(n, dtype="complex128")
        for r in arr.df.collect():
            out[r["i0"]] = complex(r["v"]["re"], r["v"]["im"])
        return out

    for n, n1 in [(360, None), (1024, 32), (360, 8)]:
        x = rng.normal(size=n)
        a = from_numpy(spark, x)
        got = collect_c(fourier.fft_long(a, n1), n)
        want = np.fft.fft(x)
        assert np.allclose(got, want, atol=1e-8 * n), (n, n1)

    # complex input
    xr, xi = rng.normal(size=240), rng.normal(size=240)
    ar, ai = from_numpy(spark, xr), from_numpy(spark, xi)
    z = C.make_complex(ar, ai)
    got = collect_c(fourier.fft_long(z), 240)
    assert np.allclose(got, np.fft.fft(xr + 1j * xi), atol=1e-6)


def test_fft_auto_routes_long_axis(spark):
    """fft() on a >=threshold 1-D axis uses the four-step path (no
    single whole-axis gather group)."""
    import numpy as np

    from dask_array_spark.core.array import Array
    from dask_array_spark.operators import fourier
    from pyspark.sql import functions as F

    n = fourier.FFT_LONG_THRESHOLD  # 2^17, composite
    base = spark.range(n).select(
        F.col("id").alias("i0"),
        (F.cos(F.col("id").cast("double") * (2.0 * np.pi * 3.0 / n))).alias("v"),
    )
    out = fourier.fft(Array(base, (n,)))
    # pure tone at bin 3: spectrum peaks at bins 3 and n-3 with n/2
    rows = out.df.filter(F.col("i0").isin([3, n - 3, 7])).collect()
    got = {r["i0"]: complex(r["v"]["re"], r["v"]["im"]) for r in rows}
    assert abs(got[3] - n / 2) < 1e-5 * n
    assert abs(got[n - 3] - n / 2) < 1e-5 * n
    assert abs(got[7]) < 1e-5 * n
