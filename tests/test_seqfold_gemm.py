"""The GEMM + boundary-fixup fold (`_gemm_seqfold_cos`) vs the naive
sequential left-fold it replaces (round 13).

The served value is round6_signed(x) + 0.0 -- a step function whose
output changes only at half-decimal boundaries -- so the contract is
NOT that the pre-round GEMM matches the fold bitwise (it cannot), but
that the POST-round values are bit-identical: entries within the
summation-error radius of a boundary are recomputed through the exact
sequential fold.  These tests pin that contract against a literal
replica of the pre-round-13 kernels' loops, on random data across
magnitudes, on constructions that land dots EXACTLY on half-decimal
boundaries, and on hostile payloads (NaN, +-Inf, zero norms,
denormals) where the error bound says nothing and everything must flag
and fall back.  The end-to-end arrow==sql suites (test_fuzz_*) keep
covering the full kernels; this file isolates the numeric core so a
bound regression fails fast and readably.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dask_array_spark.functions.similarity import (
    _gemm_seqfold_cos,
    _spark_round6_signed,
)


def _naive_cos(C, Q, denom, scale=None):
    """Literal replica of the pre-round-13 kernel loops: sequential
    left-fold dot in ascending j, then the same multiply/divide."""
    n, d = C.shape
    nq = Q.shape[0]
    with np.errstate(all="ignore"):
        D = np.zeros((n, nq))
        for j in range(d):
            D += C[:, j][:, None] * Q[None, :, j]
        num = scale[:, None] * D if scale is not None else D
        return num / denom


def _served(x):
    """What the kernels emit: round6_signed + 0.0 (zero-sign
    normalized)."""
    with np.errstate(all="ignore"):
        return _spark_round6_signed(x) + 0.0


def _assert_round6_equal(C, Q, denom, scale=None):
    got = _served(_gemm_seqfold_cos(C, Q, denom, scale=scale))
    want = _served(_naive_cos(C, Q, denom, scale=scale))
    # bitwise: NaNs must agree in position, zeros in sign
    assert np.array_equal(
        got.view("uint64"), want.view("uint64")
    ), f"round6 outputs diverge: {got} vs {want}"


def _denom(C, Q, scale=None):
    """The kernels' denominator: sequential-fold row norm x query
    norm (the exact expression both forms share)."""
    with np.errstate(all="ignore"):
        nrm = np.zeros(C.shape[0])
        for j in range(C.shape[1]):
            nrm += C[:, j] * C[:, j]
        nrm = np.sqrt(nrm)
        qn = np.sqrt((Q * Q).sum(axis=1))
        return nrm[:, None] * qn[None, :]


@settings(max_examples=4, deadline=None)
@given(
    st.integers(1, 24).map(lambda d: d),
    st.integers(1, 12),
    st.integers(1, 9),
    st.floats(-9.0, 9.0).map(lambda e: 10.0**e),
    st.randoms(use_true_random=False),
)
def test_random_magnitudes(d, n, nq, mag, rnd):
    rng = np.random.default_rng(rnd.randrange(2**32))
    C = rng.standard_normal((n, d)) * mag
    Q = rng.standard_normal((nq, d)) * mag
    _assert_round6_equal(C, Q, _denom(C, Q))


@settings(max_examples=4, deadline=None)
@given(st.integers(2, 64), st.randoms(use_true_random=False))
def test_sq8_form_with_scale(d, rnd):
    rng = np.random.default_rng(rnd.randrange(2**32))
    n, nq = 17, 5
    C = np.floor(rng.uniform(-127, 127, (n, d)))  # integer codes
    Q = rng.standard_normal((nq, d))
    scale = rng.uniform(1e-6, 1e3, n)
    nrm = rng.uniform(1e-3, 1e3, n)
    qnrm = rng.uniform(1e-3, 1e3, nq)
    denom = nrm[:, None] * qnrm[None, :]
    _assert_round6_equal(C, Q, denom, scale=scale)


def test_exact_half_decimal_boundaries():
    """Dots landing EXACTLY on (k + 0.5) * 1e-6 boundaries: every such
    entry must flag and serve the sequential fold's HALF_UP answer."""
    # C = 1-hot rows, Q values sit exactly on boundaries, denom = 1
    bvals = np.array(
        [0.5e-6, 1.5e-6, 2.5e-6, -0.5e-6, -3.5e-6, 7.5e-6, 1234567.5e-6]
    )
    d = 4
    C = np.zeros((len(bvals), d))
    C[:, 0] = 1.0
    Q = np.zeros((len(bvals), d))
    Q[:, 0] = bvals
    denom = np.ones((len(bvals), len(bvals)))
    _assert_round6_equal(C, Q, denom)
    # and through a multi-term fold whose SEQUENTIAL sum hits the
    # boundary while a reassociated sum might not
    C2 = np.ones((1, 3))
    Q2 = np.array([[1.0, -1.0, 2.5e-6]])
    _assert_round6_equal(C2, Q2, np.ones((1, 1)))


def test_hostile_payloads_flag_and_fall_back():
    nan, inf = float("nan"), float("inf")
    C = np.array(
        [
            [nan, 1.0, 2.0],
            [inf, 1.0, -1.0],
            [-inf, inf, 0.0],
            [1e308, 1e308, -1e308],
            [5e-324, 2.5e-321, 0.0],
            [0.0, 0.0, 0.0],
        ]
    )
    Q = np.array(
        [
            [1.0, 1.0, 1.0],
            [0.0, inf, 1.0],
            [nan, nan, nan],
            [1e-300, 1.0, -2.0],
        ]
    )
    denom = _denom(np.nan_to_num(C, posinf=1.0, neginf=-1.0), Q)
    # zero-norm rows/columns produce denom == 0 (SQL x/0 -> excluded);
    # keep them: the fixup must reproduce the naive inf/NaN bitwise
    with np.errstate(all="ignore"):
        safe = np.where(np.isfinite(denom), denom, 1.0)
        zero = denom * 0.0
    _assert_round6_equal(C, Q, safe)
    _assert_round6_equal(C, Q, zero)  # all-zero denominators


def test_flagged_sliver_is_small_on_real_data():
    """The fast path must actually be fast: on generic embedding-like
    data the boundary-flagged fraction is ~zero (the whole point of
    the bound) -- guard against a bound so loose it degenerates to
    recomputing everything."""
    rng = np.random.default_rng(7)
    C = rng.standard_normal((4000, 64))
    Q = rng.standard_normal((64, 64))
    denom = _denom(C, Q)
    d = C.shape[1]
    eps = np.finfo(np.float64).eps
    Dg = C @ Q.T
    errd = (2.0 * (d + 2) * eps) * (np.abs(C) @ np.abs(Q).T)
    x = Dg / denom
    errx = errd / np.abs(denom) + 4.0 * np.spacing(np.abs(x))
    y = np.abs(x) * 1e6
    frac = y - np.floor(y)
    band = 1e6 * errx + 8.0 * np.spacing(np.maximum(y, 1.0))
    risky = (np.abs(frac - 0.5) <= band) | (np.abs(x) <= errx)
    assert risky.mean() < 1e-3, f"flagged fraction {risky.mean():.2e}"
