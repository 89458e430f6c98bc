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

__all__ = ["fft", "ifft", "fft_long", "FFT_LONG_THRESHOLD"]

# a pure-1-D transform above this length routes to the four-step path
FFT_LONG_THRESHOLD = 1 << 17


def _axis_kernel_complex(a: Array, axis: int, transform, out_complex: bool) -> Array:
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
    out_shape = tuple(a.shape[k] for k in others) + (n_ax,)
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
