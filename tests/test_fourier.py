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


def _collect_c(arr, shape):
    out = np.zeros(shape, dtype="complex128")
    for r in arr.df.collect():
        idx = tuple(r[f"i{k}"] for k in range(len(shape)))
        out[idx] = complex(r["v"]["re"], r["v"]["im"])
    return out


def _collect_r(arr, shape):
    out = np.zeros(shape)
    for r in arr.df.collect():
        idx = tuple(r[f"i{k}"] for k in range(len(shape)))
        out[idx] = r["v"]
    return out


def test_rfft_irfft(spark, rng):
    """rfft halves the axis to n//2+1; irfft restores the real signal
    (reference fft.py:119-251 fft_wrap real family)."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    for n in (12, 13):  # even and odd input lengths
        x = rng.normal(size=n)
        z = fourier.rfft(from_numpy(spark, x))
        want = np.fft.rfft(x)
        assert z.shape == (n // 2 + 1,)
        np.testing.assert_allclose(
            _collect_c(z, z.shape), want, atol=1e-9
        )
        back = fourier.irfft(z, n=n)
        assert back.shape == (n,)
        np.testing.assert_allclose(_collect_r(back, (n,)), x, atol=1e-9)
    # default output length 2*(m-1) (even reconstruction)
    x = rng.normal(size=16)
    back = fourier.irfft(fourier.rfft(from_numpy(spark, x)))
    np.testing.assert_allclose(_collect_r(back, (16,)), x, atol=1e-9)


def test_rfft_matrix_axis(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    a = rng.normal(size=(5, 8))
    z = fourier.rfft(from_numpy(spark, a), axis=1)
    want = np.fft.rfft(a, axis=1)
    assert z.shape == (5, 5)
    np.testing.assert_allclose(_collect_c(z, (5, 5)), want, atol=1e-9)


def test_hfft_ihfft(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C
    from dask_array_spark.operators import fourier

    x = rng.normal(size=10)
    # ihfft: real -> compressed complex; hfft inverts it
    z = fourier.ihfft(from_numpy(spark, x))
    want = np.fft.ihfft(x)
    assert z.shape == (6,)
    np.testing.assert_allclose(_collect_c(z, (6,)), want, atol=1e-9)
    back = fourier.hfft(z, n=10)
    np.testing.assert_allclose(_collect_r(back, (10,)), x, atol=1e-9)


def test_fft2_fftn(spark, rng):
    """fft2/fftn preserve axis order (np.fft layout)."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    a = rng.normal(size=(4, 6))
    z = fourier.fft2(from_numpy(spark, a))
    np.testing.assert_allclose(
        _collect_c(z, (4, 6)), np.fft.fft2(a), atol=1e-9
    )
    back = fourier.ifft2(z)
    np.testing.assert_allclose(
        _collect_c(back, (4, 6)), a.astype("complex128"), atol=1e-9
    )

    b = rng.normal(size=(3, 4, 5))
    z3 = fourier.fftn(from_numpy(spark, b))
    np.testing.assert_allclose(
        _collect_c(z3, (3, 4, 5)), np.fft.fftn(b), atol=1e-9
    )
    # axis subset
    z2 = fourier.fftn(from_numpy(spark, b), axes=(0, 2))
    np.testing.assert_allclose(
        _collect_c(z2, (3, 4, 5)), np.fft.fftn(b, axes=(0, 2)), atol=1e-9
    )


def test_rfftn_irfftn(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    a = rng.normal(size=(4, 6))
    z = fourier.rfftn(from_numpy(spark, a))
    want = np.fft.rfftn(a)
    assert z.shape == (4, 4)
    np.testing.assert_allclose(_collect_c(z, (4, 4)), want, atol=1e-9)
    back = fourier.irfftn(z, n=6)
    np.testing.assert_allclose(_collect_r(back, (4, 6)), a, atol=1e-9)


def test_fftfreq_shift(spark):
    from dask_array_spark.operators import fourier

    for n in (8, 9):
        np.testing.assert_allclose(
            _collect_r(fourier.fftfreq(spark, n, d=0.5), (n,)),
            np.fft.fftfreq(n, d=0.5),
        )
        np.testing.assert_allclose(
            _collect_r(fourier.rfftfreq(spark, n, d=0.5), (n // 2 + 1,)),
            np.fft.rfftfreq(n, d=0.5),
        )
        f = fourier.fftfreq(spark, n)
        np.testing.assert_allclose(
            _collect_r(fourier.fftshift(f), (n,)),
            np.fft.fftshift(np.fft.fftfreq(n)),
        )
        # ifftshift inverts fftshift even for odd n
        np.testing.assert_allclose(
            _collect_r(fourier.ifftshift(fourier.fftshift(f)), (n,)),
            np.fft.fftfreq(n),
        )


def test_fftshift_2d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    a = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        _collect_r(fourier.fftshift(from_numpy(spark, a)), (3, 4)),
        np.fft.fftshift(a),
    )
    np.testing.assert_allclose(
        _collect_r(fourier.fftshift(from_numpy(spark, a), axes=(1,)), (3, 4)),
        np.fft.fftshift(a, axes=(1,)),
    )


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


# ---------------------------------------------------------------- fuzz
# (round 8) random lengths -- primes, odd composites, powers of two --
# exercise every routing branch (direct DFT, four-step split via
# _mid_divisor) against np.fft; random complex values exercise the
# STRUCT<re,im> algebra.
from hypothesis import given, settings, strategies as st


def _collect_c1d(arr, n):
    import numpy as np

    out = np.zeros(n, dtype="complex128")
    for r in arr.df.collect():
        out[r["i0"]] = complex(r["v"]["re"], r["v"]["im"])
    return out


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(2, 60))
def test_fuzz_fft_any_length(spark, seed, n):
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    rng = np.random.default_rng(seed)
    x = np.round(rng.normal(size=n) * 3, 3)
    got = _collect_c1d(fourier.fft(from_numpy(spark, x)), n)
    np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-8)
    # rfft half-spectrum on the same vector
    m = n // 2 + 1
    gr = _collect_c1d(fourier.rfft(from_numpy(spark, x)), m)
    np.testing.assert_allclose(gr, np.fft.rfft(x), atol=1e-8)


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31), k=st.integers(2, 8), m=st.integers(2, 8))
def test_fuzz_fft_long_composite_split(spark, seed, k, m):
    """four-step split N = n1 x n2 for arbitrary factorizations,
    including deliberately unbalanced ones."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import fourier

    n = k * m
    rng = np.random.default_rng(seed)
    x = np.round(rng.normal(size=n) * 3, 3)
    got = _collect_c1d(fourier.fft_long(from_numpy(spark, x), n1=k), n)
    np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-8)


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31), n=st.integers(2, 40))
def test_fuzz_complex_algebra(spark, seed, n):
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import complexes as C

    rng = np.random.default_rng(seed)
    re = np.round(rng.normal(size=n) * 3, 3)
    im = np.round(rng.normal(size=n) * 3, 3)
    im[rng.random(n) < 0.2] = 0.0  # some purely real entries
    z = re + 1j * im
    a = C.make_complex(from_numpy(spark, re), from_numpy(spark, im))
    np.testing.assert_allclose(C.real(a).compute(), z.real, atol=1e-12)
    np.testing.assert_allclose(C.imag(a).compute(), z.imag, atol=1e-12)
    np.testing.assert_allclose(
        _collect_c1d(C.conj(a), n), np.conj(z), atol=1e-12
    )
    np.testing.assert_allclose(C.cabs(a).compute(), np.abs(z), atol=1e-12)
    np.testing.assert_allclose(C.angle(a).compute(), np.angle(z), atol=1e-12)
    w = rng.permutation(n)
    b = C.make_complex(from_numpy(spark, re[w]), from_numpy(spark, im[w]))
    zb = z[w]
    np.testing.assert_allclose(_collect_c1d(C.cadd(a, b), n), z + zb, atol=1e-12)
    np.testing.assert_allclose(_collect_c1d(C.cmul(a, b), n), z * zb, atol=1e-12)
    np.testing.assert_array_equal(
        C.iscomplex(a).compute().astype(bool), z.imag != 0
    )
