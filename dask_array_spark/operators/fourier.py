"""Fourier transforms along one axis.

Parity: the reference's FFT scope (SURVEY.md section 7 M5: block
kernels + cross-block transpose).  Strategy here mirrors the exact-
quantile pattern (reductions/_common.py:844 rechunk-to-one-chunk): the
transform axis is gathered per group -- ``groupBy`` on all OTHER axes
distributes the batch of 1-D FFTs across the cluster, and each FFT
runs in-core in an Arrow-batched kernel.  Right for the common case
(many medium series).  A single gigantic axis routes to ``fft_long``:
the four-step (Bailey) factorization N = N1*N2 -- column FFTs, a
twiddle projection, row FFTs, an index remap -- whose per-group
in-core work is only max(N1, N2) ~ sqrt(N); this IS the cross-block
butterfly tier, expressed as two grouped-kernel passes + two pure
projections.

Complex output/input uses the engine's STRUCT<re, im> encoding
(operators/complexes.py).  Absent cells (NULL) enter the transform as
0 -- the natural signal-processing reading of a sparse series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = [
    "fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
    "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
    "hfft", "ihfft", "fftfreq", "rfftfreq", "fftshift", "ifftshift",
    "fft_long", "FFT_LONG_THRESHOLD",
]

# a pure-1-D transform above this length routes to the four-step path
FFT_LONG_THRESHOLD = 1 << 17


def _axis_kernel_complex(
    a: Array, axis: int, transform, out_complex: bool,
    out_len: int | None = None,
) -> Array:
    axis = axis % a.ndim
    n_ax = a.shape[axis]
    if n_ax is None:
        raise ValueError("fft needs a known length on the transform axis")
    others = [k for k in range(a.ndim) if k != axis]
    ocols = [f"i{k}" for k in others]
    is_complex_in = "re" in [f.name for f in a.df.schema[VALUE_COL].dataType.fields] \
        if hasattr(a.df.schema[VALUE_COL].dataType, "fields") else False

    d = a.df
    if is_complex_in:
        d = d.select(
            *ocols, f"i{axis}",
            F.col(VALUE_COL)["re"].alias("__re"),
            F.col(VALUE_COL)["im"].alias("__im"),
        )
    else:
        d = d.select(
            *ocols, f"i{axis}",
            F.col(VALUE_COL).cast("double").alias("__re"),
            F.lit(0.0).alias("__im"),
        )

    gcols = ocols
    if not gcols:
        d = d.withColumn("__g", F.lit(1).cast("long"))
        gcols = ["__g"]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = np.zeros(int(n_ax), dtype="complex128")
        idx = pdf[f"i{axis}"].to_numpy(dtype="int64")
        re = pd.to_numeric(pdf["__re"]).fillna(0.0).to_numpy(dtype="float64")
        im = pd.to_numeric(pdf["__im"]).fillna(0.0).to_numpy(dtype="float64")
        vec[idx] = re + 1j * im
        out = transform(vec)
        rows = pd.DataFrame(
            {
                "__k": np.arange(len(out), dtype="int64"),
                "__or": out.real.astype("float64"),
                "__oi": out.imag.astype("float64"),
            }
        )
        for c in gcols:
            rows[c] = pdf[c].iloc[0]
        return rows[gcols + ["__k", "__or", "__oi"]]

    schema = ", ".join(f"{c} long" for c in gcols) + ", __k long, __or double, __oi double"
    res = d.groupBy(*gcols).applyInPandas(kernel, schema=schema)

    sel = [F.col(c).alias(f"i{j}") for j, c in enumerate(ocols)]
    sel.append(F.col("__k").alias(f"i{len(ocols)}"))
    if out_complex:
        v = F.struct(F.col("__or").alias("re"), F.col("__oi").alias("im"))
    else:
        v = F.col("__or")
    out_shape = tuple(a.shape[k] for k in others) + (
        n_ax if out_len is None else out_len,
    )
    return Array(res.select(*sel, v.alias(VALUE_COL)), out_shape)


def fft(a: Array, axis: int = 0) -> Array:
    """DFT along ``axis`` -> complex STRUCT<re,im> array; the
    transform axis moves to the LAST output position (grouped-kernel
    layout).  A pure-1-D axis above FFT_LONG_THRESHOLD with a
    nontrivial factorization routes to the distributed four-step."""
    if a.ndim == 1 and a.shape[0] is not None and a.shape[0] >= FFT_LONG_THRESHOLD:
        n1 = _mid_divisor(a.shape[0])
        if n1 > 1:
            return fft_long(a, n1)
    return _axis_kernel_complex(a, axis, np.fft.fft, out_complex=True)


def _mid_divisor(n: int) -> int:
    """Largest divisor of n that is <= sqrt(n) (1 if n is prime)."""
    import math

    for d in range(math.isqrt(n), 0, -1):
        if n % d == 0:
            return d
    return 1


def fft_long(a: Array, n1: int | None = None) -> Array:
    """Distributed DFT of ONE long 1-D axis via the four-step
    (Bailey) factorization N = N1*N2 (the reference's declared-gap
    cross-block-butterfly tier):

    1. view x as an (N1, N2) C-order grid: n = n1*N2 + n2 (index
       math, zero movement),
    2. column FFTs: length-N1 transforms grouped by n2 (N2 parallel
       groups, each in-core N1),
    3. twiddle projection: multiply cell (n2, k1) by
       W_N^(n2*k1) -- a pure complex-rotation projection,
    4. row FFTs: length-N2 transforms grouped by k1,
    5. output remap X[k1 + k2*N1] (projection).

    Per-group in-core work is max(N1, N2) ~ sqrt(N); everything else
    is shuffles Spark already does for grouped kernels.  Exact DFT
    (same butterflies, reassociated), verified against np.fft.fft."""
    if a.ndim != 1:
        raise ValueError("fft_long is for 1-D arrays")
    n = a.shape[0]
    if n is None:
        raise ValueError("fft_long needs a known length")
    if n1 is None:
        n1 = _mid_divisor(n)
    if n % n1:
        raise ValueError(f"n1={n1} does not divide N={n}")
    n2 = n // n1

    is_complex_in = hasattr(a.df.schema[VALUE_COL].dataType, "fields")
    if is_complex_in:
        vcol = F.col(VALUE_COL)
    else:
        vcol = F.struct(
            F.col(VALUE_COL).cast("double").alias("re"), F.lit(0.0).alias("im")
        )
    grid = a.df.select(
        (F.col("i0") / F.lit(n2)).cast("long").alias("i0"),
        (F.col("i0") % F.lit(n2)).cast("long").alias("i1"),
        vcol.alias(VALUE_COL),
    )
    y = _axis_kernel_complex(Array(grid, (n1, n2)), 0, np.fft.fft, True)
    # y layout: (i0 = n2, i1 = k1); twiddle by W_N^(n2*k1)
    ang = (F.col("i0") * F.col("i1")).cast("double") * F.lit(-2.0 * np.pi / n)
    c, s_ = F.cos(ang), F.sin(ang)
    re, im = F.col(VALUE_COL)["re"], F.col(VALUE_COL)["im"]
    z = y.df.select(
        "i0", "i1",
        F.struct(
            (re * c - im * s_).alias("re"), (re * s_ + im * c).alias("im")
        ).alias(VALUE_COL),
    )
    x2 = _axis_kernel_complex(Array(z, (n2, n1)), 0, np.fft.fft, True)
    # x2 layout: (i0 = k1, i1 = k2); flat index k1 + k2*N1
    out = x2.df.select(
        (F.col("i0") + F.col("i1") * F.lit(n1)).cast("long").alias("i0"),
        F.col(VALUE_COL),
    )
    return Array(out, (n,))


def ifft(a: Array, axis: int = 0) -> Array:
    """Inverse DFT; complex in, complex out."""
    return _axis_kernel_complex(a, axis, np.fft.ifft, out_complex=True)


# ---------------------------------------------------------------------------
# real-input family (parity: reference fft.py:119-251 `fft_wrap` exports
# rfft/irfft/hfft/ihfft with _rfft_out_chunks-style length bookkeeping,
# fft.py:50-100)
# ---------------------------------------------------------------------------


def _axis_keep(
    a: Array, axis: int, transform, out_complex: bool,
    out_len: int | None = None,
) -> Array:
    """Single-axis grouped-kernel transform that RESTORES the original
    axis order afterwards (the base kernel parks the transform axis
    last).  The restore is a transpose == free column relabeling, so
    the only cost over the base kernel is zero."""
    from . import manipulation as M

    axis = axis % a.ndim
    out = _axis_kernel_complex(a, axis, transform, out_complex, out_len)
    if a.ndim == 1 or axis == a.ndim - 1:
        return out
    cur = [k for k in range(a.ndim) if k != axis] + [axis]
    perm = [cur.index(t) for t in range(a.ndim)]
    return M.transpose(out, perm)


def rfft(a: Array, axis: int = 0) -> Array:
    """DFT of REAL input: only the n//2 + 1 non-negative-frequency
    coefficients (the rest are the conjugate mirror).  Transform axis
    moves last, like fft."""
    n = a.shape[axis % a.ndim]
    if n is None:
        raise ValueError("rfft needs a known length on the transform axis")
    # the kernel assembles complex128; real-input transforms take .real
    # explicitly (input im is 0 by construction for real arrays)
    return _axis_kernel_complex(
        a, axis, lambda v: np.fft.rfft(v.real), out_complex=True,
        out_len=n // 2 + 1,
    )


def irfft(a: Array, axis: int = 0, n: int | None = None) -> Array:
    """Inverse of rfft: Hermitian-compressed complex input -> real
    output of length ``n`` (default 2*(m-1))."""
    m = a.shape[axis % a.ndim]
    if m is None:
        raise ValueError("irfft needs a known length on the transform axis")
    n_out = int(n) if n is not None else 2 * (m - 1)
    return _axis_kernel_complex(
        a, axis, lambda v: np.fft.irfft(v, n_out), out_complex=False,
        out_len=n_out,
    )


def hfft(a: Array, axis: int = 0, n: int | None = None) -> Array:
    """Transform of a Hermitian-symmetric (real-spectrum) input ->
    real output of length ``n`` (default 2*(m-1))."""
    m = a.shape[axis % a.ndim]
    if m is None:
        raise ValueError("hfft needs a known length on the transform axis")
    n_out = int(n) if n is not None else 2 * (m - 1)
    return _axis_kernel_complex(
        a, axis, lambda v: np.fft.hfft(v, n_out), out_complex=False,
        out_len=n_out,
    )


def ihfft(a: Array, axis: int = 0) -> Array:
    """Inverse of hfft: real input -> Hermitian-compressed complex
    output of length n//2 + 1."""
    n = a.shape[axis % a.ndim]
    if n is None:
        raise ValueError("ihfft needs a known length on the transform axis")
    return _axis_kernel_complex(
        a, axis, lambda v: np.fft.ihfft(v.real), out_complex=True,
        out_len=n // 2 + 1,
    )


# ---------------------------------------------------------------------------
# multi-axis wrappers: sequential single-axis passes, each one a grouped
# kernel batched across the cluster on all OTHER axes -- so an fft2 over a
# (rows x cols) grid is two shuffles, each with rows (then cols) of
# parallelism.  Axis order is preserved (np.fft.fftn layout).
# ---------------------------------------------------------------------------


def _norm_axes(a: Array, axes) -> list[int]:
    if axes is None:
        return list(range(a.ndim))
    return [ax % a.ndim for ax in axes]


def fftn(a: Array, axes=None) -> Array:
    """N-dimensional DFT: one grouped-kernel pass per axis."""
    out = a
    for ax in _norm_axes(a, axes):
        out = _axis_keep(out, ax, np.fft.fft, out_complex=True)
    return out


def ifftn(a: Array, axes=None) -> Array:
    out = a
    for ax in _norm_axes(a, axes):
        out = _axis_keep(out, ax, np.fft.ifft, out_complex=True)
    return out


def fft2(a: Array, axes=(-2, -1)) -> Array:
    return fftn(a, axes)


def ifft2(a: Array, axes=(-2, -1)) -> Array:
    return ifftn(a, axes)


def rfftn(a: Array, axes=None) -> Array:
    """Real-input N-d DFT: rfft along the LAST axis (halving it to
    n//2+1), then full complex ffts along the remaining axes -- the
    np.fft.rfftn factorization."""
    axes = _norm_axes(a, axes)
    last = axes[-1]
    n = a.shape[last]
    out = _axis_keep(
        a, last, lambda v: np.fft.rfft(v.real), out_complex=True,
        out_len=n // 2 + 1,
    )
    for ax in axes[:-1]:
        out = _axis_keep(out, ax, np.fft.fft, out_complex=True)
    return out


def irfftn(a: Array, axes=None, n: int | None = None) -> Array:
    """Inverse of rfftn: complex iffts on the leading axes, then a
    length-restoring irfft on the last."""
    axes = _norm_axes(a, axes)
    out = a
    for ax in axes[:-1]:
        out = _axis_keep(out, ax, np.fft.ifft, out_complex=True)
    last = axes[-1]
    m = out.shape[last]
    n_out = int(n) if n is not None else 2 * (m - 1)
    return _axis_keep(
        out, last, lambda v: np.fft.irfft(v, n_out), out_complex=False,
        out_len=n_out,
    )


def rfft2(a: Array, axes=(-2, -1)) -> Array:
    return rfftn(a, axes)


def irfft2(a: Array, axes=(-2, -1), n: int | None = None) -> Array:
    return irfftn(a, axes, n)


# ---------------------------------------------------------------------------
# frequency-grid helpers (reference fft.py:254-279) -- pure index
# arithmetic: a spark.range + one projection, no data movement at all
# ---------------------------------------------------------------------------


def fftfreq(spark, n: int, d: float = 1.0) -> Array:
    """Sample frequencies of an n-point DFT: [0 .. (n-1)//2, -(n//2)
    .. -1] / (n*d)."""
    from .creation import _range1d

    half = (n - 1) // 2
    k = F.col("i0")
    v = (
        F.when(k <= half, k).otherwise(k - F.lit(n)).cast("double")
        / F.lit(float(n) * float(d))
    )
    return Array(_range1d(spark, n).select("i0", v.alias(VALUE_COL)), (n,))


def rfftfreq(spark, n: int, d: float = 1.0) -> Array:
    """Sample frequencies of an n-point rfft: [0 .. n//2] / (n*d)."""
    from .creation import _range1d

    m = n // 2 + 1
    v = F.col("i0").cast("double") / F.lit(float(n) * float(d))
    return Array(_range1d(spark, m).select("i0", v.alias(VALUE_COL)), (m,))


def fftshift(a: Array, axes=None) -> Array:
    """Move the zero-frequency bin to the center: roll by n//2 on each
    axis -- an index remap, zero data movement."""
    from .manipulation import roll

    out = a
    for ax in _norm_axes(a, axes):
        out = roll(out, out.shape[ax] // 2, axis=ax)
    return out


def ifftshift(a: Array, axes=None) -> Array:
    """Inverse of fftshift (differs for odd n): roll by -(n//2)."""
    from .manipulation import roll

    out = a
    for ax in _norm_axes(a, axes):
        out = roll(out, -(out.shape[ax] // 2), axis=ax)
    return out
