"""Property-based fuzz of the linear-algebra tier vs NumPy on random
shapes, conditioning, and block counts.  Decompositions are verified
by their INVARIANTS (reconstruction, orthogonality, triangularity --
the factors themselves are sign/permutation ambiguous) plus the
uniquely-determined parts (singular values, solutions, norms).
Small nb/block_rows force the MULTI-BLOCK code paths (TSQR tree
merge, blocked wavefront) even at fuzz-sized inputs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


def _mat(rng_seed, n, m, scale=1.0):
    rng = np.random.default_rng(rng_seed)
    return rng.standard_normal((n, m)) * scale


def _from(spark, x, npartitions=4):
    from dask_array_spark.sources import from_numpy

    return from_numpy(spark, x, npartitions=npartitions)


@settings(max_examples=4, deadline=None)
@given(st.integers(0, 10_000), st.integers(6, 24), st.integers(1, 5))
def test_tsqr_qr_invariants(spark, seed, n, m):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n, m)
    q, rn = L.qr(_from(spark, x), block_rows=4)  # force tree merge
    qn = q.compute()  # tall path: q is an Array, r an ndarray
    assert qn.shape == (n, m) and rn.shape == (m, m)
    np.testing.assert_allclose(qn @ rn, x, atol=1e-9)
    np.testing.assert_allclose(qn.T @ qn, np.eye(m), atol=1e-9)
    assert np.allclose(rn, np.triu(rn))


@settings(max_examples=4, deadline=None)
@given(st.integers(0, 10_000), st.integers(6, 20), st.integers(1, 4))
def test_svd_invariants_and_values(spark, seed, n, m):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n, m)
    u, sn, vtn = L.svd_tall(_from(spark, x), block_rows=4)
    un = u.compute()  # s and vt are in-core ndarrays by contract
    np.testing.assert_allclose(
        sn, np.linalg.svd(x, compute_uv=False), atol=1e-9
    )
    assert np.all(np.diff(sn) <= 1e-12)  # descending
    np.testing.assert_allclose((un * sn) @ vtn, x, atol=1e-8)
    np.testing.assert_allclose(un.T @ un, np.eye(m), atol=1e-9)
    np.testing.assert_allclose(vtn @ vtn.T, np.eye(m), atol=1e-9)


@settings(max_examples=3, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 9), st.integers(2, 4))
def test_spd_cholesky_solve_inv(spark, seed, n, nb):
    from dask_array_spark.operators import linalg as L

    g = _mat(seed, n, n)
    spd = g @ g.T + n * np.eye(n)  # well-conditioned SPD
    a = _from(spark, spd)
    # sparse-triangle contract: structural zeros are implicit cells
    ln = np.nan_to_num(L.cholesky(a, nb=nb).compute())
    np.testing.assert_allclose(ln @ ln.T, spd, atol=1e-8)
    assert np.allclose(ln, np.tril(ln))
    b = _mat(seed + 1, n, 1)[:, 0]
    xs = L.solve(a, _from(spark, b), assume_a="pos").compute()
    np.testing.assert_allclose(xs, np.linalg.solve(spd, b), atol=1e-7)
    inv = L.inv(a).compute()
    np.testing.assert_allclose(inv @ spd, np.eye(n), atol=1e-7)


@settings(max_examples=3, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 8), st.integers(2, 3))
def test_lu_solve_gen(spark, seed, n, nb):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n, n) + n * np.eye(n)  # diagonally dominant-ish
    a = _from(spark, x)
    p, l_f, u_f = L.lu(a, nb=nb)
    pn, lnn, un = (np.nan_to_num(f.compute()) for f in (p, l_f, u_f))
    np.testing.assert_allclose(pn @ lnn @ un, x, atol=1e-8)
    assert np.allclose(lnn, np.tril(lnn)) and np.allclose(np.diag(lnn), 1.0)
    assert np.allclose(un, np.triu(un))
    b = _mat(seed + 2, n, 1)[:, 0]
    xs = L.solve(a, _from(spark, b), assume_a="gen").compute()
    np.testing.assert_allclose(xs, np.linalg.solve(x, b), atol=1e-7)


@settings(max_examples=4, deadline=None)
@given(st.integers(0, 10_000), st.integers(5, 16), st.integers(1, 4))
def test_lstsq_matches_numpy(spark, seed, n, m):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n, m)
    b = _mat(seed + 3, n, 1)[:, 0]
    got, rss = L.lstsq(_from(spark, x), _from(spark, b), block_rows=4)
    want, res, *_ = np.linalg.lstsq(x, b, rcond=None)
    np.testing.assert_allclose(got, want, atol=1e-8)
    if res.size:
        np.testing.assert_allclose(rss, res[0], atol=1e-8)


@settings(max_examples=4, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(1, 6),
)
def test_matmul_tensordot_einsum(spark, seed, n, k, m):
    from dask_array_spark.operators import linalg as L

    x, y = _mat(seed, n, k), _mat(seed + 4, k, m)
    np.testing.assert_allclose(
        L.matmul(_from(spark, x), _from(spark, y)).compute(), x @ y, atol=1e-10
    )
    np.testing.assert_allclose(
        L.tensordot(_from(spark, x), _from(spark, y), axes=1).compute(),
        np.tensordot(x, y, axes=1),
        atol=1e-10,
    )
    got = L.einsum("ij,jk->ik", _from(spark, x), _from(spark, y)).compute()
    np.testing.assert_allclose(got, np.einsum("ij,jk->ik", x, y), atol=1e-10)
    got = L.einsum("ij,ij->", _from(spark, x), _from(spark, x)).compute()
    np.testing.assert_allclose(got, np.einsum("ij,ij->", x, x), atol=1e-10)


@settings(max_examples=4, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(2, 10),
    st.sampled_from([None, "fro", 1, -1, 2, -2, np.inf, -np.inf, "nuc"]),
)
def test_matrix_norm_matches_numpy(spark, seed, n, ordv):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n + 2, n)  # tall rectangular
    got = L.norm(_from(spark, x), ord=ordv).compute()
    np.testing.assert_allclose(got, np.linalg.norm(x, ord=ordv), atol=1e-9)


@settings(max_examples=4, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(2, 12),
    st.sampled_from([None, 0, 1, 2, 3, 0.5, -1, np.inf, -np.inf]),
)
def test_vector_norm_matches_numpy(spark, seed, n, ordv):
    from dask_array_spark.operators import linalg as L

    x = _mat(seed, n, 1)[:, 0]
    got = L.norm(_from(spark, x), ord=ordv).compute()
    np.testing.assert_allclose(got, np.linalg.norm(x, ord=ordv), atol=1e-9)
