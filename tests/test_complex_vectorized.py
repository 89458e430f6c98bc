"""Vectorized STRUCT<re,im> -> complex128 conversion (round-11 ask 2).

``_struct_col_to_complex`` ran a per-row Python loop inside every
complex to_zarr/to_hdf5 block-write kernel -- the last per-row Python
in any executor path.  Now: Arrow-backed series flatten via
``pc.struct_field``; object dict columns (the shape applyInPandas
actually delivers, verified by probe) convert through one ``pa.array``
C pass; the loop survives only for Row objects.  Measured: 1e6-cell
chunk-write kernel 0.351 s -> 0.164 s (2.1x); the conversion alone
0.371 -> 0.202 s on dicts, 0.048 s Arrow-backed (8x).

The three paths must agree EXACTLY on the NaN/None contract:
- NULL cell -> NaN+NaNj
- NULL component -> NaN in that component only
- a NaN imag must NOT contaminate a finite real (the naive
  ``re + 1j*im`` assembly does exactly that: complex multiply puts
  0*NaN in the real lane).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dask_array_spark.sources.ingest import _struct_col_to_complex


CASES = [
    ({"re": 1.0, "im": 2.0}, 1 + 2j),
    (None, complex(np.nan, np.nan)),
    ({"re": None, "im": 4.0}, complex(np.nan, 4.0)),
    ({"re": 3.0, "im": None}, complex(3.0, np.nan)),  # the 0*NaN trap
    ({"re": np.nan, "im": -1.0}, complex(np.nan, -1.0)),
    ({"re": -0.0, "im": 0.0}, complex(-0.0, 0.0)),
]


def _check(out):
    exp = np.array([e for _, e in CASES])
    np.testing.assert_array_equal(np.isnan(out.real), np.isnan(exp.real))
    np.testing.assert_array_equal(np.isnan(out.imag), np.isnan(exp.imag))
    m = ~(np.isnan(exp.real) | np.isnan(exp.imag))
    np.testing.assert_array_equal(out[m], exp[m])
    # signed zero survives (regression: copysign through the assembly)
    assert np.signbit(out[5].real) and not np.signbit(out[5].imag)


def test_dict_column_vectorized():
    _check(_struct_col_to_complex(pd.Series([c for c, _ in CASES])))


def test_arrow_backed_column():
    re = pa.array([c["re"] if c else None for c, _ in CASES], type=pa.float64())
    im = pa.array([c["im"] if c else None for c, _ in CASES], type=pa.float64())
    mask = pa.array([c is None for c, _ in CASES])
    sa = pa.StructArray.from_arrays([re, im], names=["re", "im"], mask=mask)
    _check(_struct_col_to_complex(pd.Series(sa, dtype=pd.ArrowDtype(sa.type))))


def test_row_objects_fallback():
    from pyspark.sql import Row

    rows = [None if c is None else Row(re=c["re"], im=c["im"]) for c, _ in CASES]
    _check(_struct_col_to_complex(pd.Series(rows)))


def test_empty_column():
    out = _struct_col_to_complex(pd.Series([], dtype=object))
    assert out.dtype == np.complex128 and len(out) == 0


def test_large_block_roundtrip_exact():
    """1e5 dict cells through the vectorized path == the reference
    per-row construction, bit-for-bit (value hash, not spot checks)."""
    rng = np.random.default_rng(11)
    re = rng.standard_normal(100_000)
    im = rng.standard_normal(100_000)
    re[::97] = np.nan
    col = pd.Series([{"re": float(r), "im": float(i)} for r, i in zip(re, im)])
    out = _struct_col_to_complex(col)
    exp = np.empty(len(re), dtype="complex128")
    exp.real = re
    exp.imag = im
    np.testing.assert_array_equal(out, exp)
