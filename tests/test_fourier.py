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
