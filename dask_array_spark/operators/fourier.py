"""Fourier transforms along one axis.

Parity: the reference's FFT scope (SURVEY.md section 7 M5: block
kernels + cross-block transpose).  Strategy here mirrors the exact-
quantile pattern (reductions/_common.py:844 rechunk-to-one-chunk): the
transform axis is gathered per group -- ``groupBy`` on all OTHER axes
distributes the batch of 1-D FFTs across the cluster, and each FFT
runs in-core in an Arrow-batched kernel.  Right for the common case
(many medium series); a single gigantic axis would need cross-block
butterflies, which we have not built.

Complex output/input uses the engine's STRUCT<re, im> encoding
(operators/complexes.py).  Absent cells (NULL) enter the transform as
0 -- the natural signal-processing reading of a sparse series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..core.array import VALUE_COL, Array

__all__ = ["fft", "ifft"]


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
    layout)."""
    return _axis_kernel_complex(a, axis, np.fft.fft, out_complex=True)


def ifft(a: Array, axis: int = 0) -> Array:
    """Inverse DFT; complex in, complex out."""
    return _axis_kernel_complex(a, axis, np.fft.ifft, out_complex=True)
