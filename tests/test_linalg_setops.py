"""einsum / set ops / histogram2d vs the NumPy oracle (paths not
reachable through the SQL-oracle query registry: implicit output,
3-operand chains, per-operand diagonals)."""

import numpy as np
import pytest

from tests.conftest import assert_eq


@pytest.fixture(scope="module")
def mats(spark, rng):
    from dask_array_spark import from_numpy

    a = rng.integers(-4, 5, size=(4, 5)).astype("float64")
    b = rng.integers(-4, 5, size=(5, 3)).astype("float64")
    c = rng.integers(-4, 5, size=(3, 4)).astype("float64")
    return {
        "a": (from_numpy(spark, a), a),
        "b": (from_numpy(spark, b), b),
        "c": (from_numpy(spark, c), c),
    }


@pytest.mark.parametrize(
    "spec,ops",
    [
        ("ij,jk->ik", "ab"),
        ("ij,jk", "ab"),  # implicit output
        ("ij,jk,kl->il", "abc"),  # 3-operand chain
        ("ij->ji", "a"),  # pure transpose
        ("ij->i", "a"),  # row sums
        ("ij,ij->", "aa"),  # full inner product
        ("ij,kj->ik", "aa"),  # gram
    ],
)
def test_einsum_matches_numpy(mats, spec, ops):
    from dask_array_spark.operators import linalg

    arrs = [mats[o][0] for o in ops]
    nps = [mats[o][1] for o in ops]
    assert_eq(linalg.einsum(spec, *arrs), np.einsum(spec, *nps))


def test_einsum_diagonal(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    a = rng.integers(-4, 5, size=(5, 5)).astype("float64")
    assert_eq(linalg.einsum("ii->i", from_numpy(spark, a)), np.einsum("ii->i", a))
    got = linalg.einsum("ii->", from_numpy(spark, a)).compute()
    np.testing.assert_allclose(got, np.trace(a))


def test_setops(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import setops as SO

    a_np = np.array([5, 1, 3, 3, 9, 1], dtype="int64")
    b_np = np.array([3, 7, 9, 9], dtype="int64")
    a, b = from_numpy(spark, a_np), from_numpy(spark, b_np)
    assert_eq(SO.union1d(a, b), np.union1d(a_np, b_np))
    assert_eq(SO.intersect1d(a, b), np.intersect1d(a_np, b_np))
    assert_eq(SO.setdiff1d(a, b), np.setdiff1d(a_np, b_np))
    assert_eq(SO.in1d(a, b), np.isin(a_np, b_np))


def test_histogram2d(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    x_np = rng.uniform(0, 10, 500)
    y_np = rng.uniform(-5, 5, 500)
    x, y = from_numpy(spark, x_np), from_numpy(spark, y_np)
    want, _, _ = np.histogram2d(
        x_np, y_np, bins=(8, 6), range=((0.0, 10.0), (-5.0, 5.0))
    )
    got = R.histogram2d(x, y, (8, 6), ((0.0, 10.0), (-5.0, 5.0))).compute()
    np.testing.assert_array_equal(got, want.astype("int64"))


def test_nonzero_argwhere_extract(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import slicing as S

    a_np = np.array([[0.0, 3.0, 0.0], [2.0, 0.0, 5.0]])
    a = from_numpy(spark, a_np)
    rows, cols = S.nonzero(a)
    ii, jj = np.nonzero(a_np)
    got = sorted(zip(rows.df.collect(), cols.df.collect()), key=lambda t: t[0]["i0"])
    got_rows = [r[0]["v"] for r in got]
    got_cols = [r[1]["v"] for r in got]
    np.testing.assert_array_equal(sorted(zip(got_rows, got_cols)), sorted(zip(ii, jj)))

    aw = S.argwhere(a).collect()
    np.testing.assert_array_equal(
        sorted((r["i0"], r["i1"]) for r in aw), sorted(zip(ii, jj))
    )

    cond = a > 1.0
    ext = S.extract(cond, a)
    vals = sorted(r["v"] for r in ext.df.collect())
    np.testing.assert_array_equal(vals, sorted(a_np[a_np > 1.0]))


def test_atleast_and_ediff1d(spark):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import manipulation as M
    from dask_array_spark.operators import windows as W
    from tests.conftest import assert_eq

    v = np.array([3.0, 1.0, 4.0, 1.0, 5.0])
    arr = from_numpy(spark, v)
    a2 = M.atleast_2d(arr)
    assert a2.shape == (1, 5)
    a3 = M.atleast_3d(arr)
    assert a3.shape == (1, 5, 1)
    assert_eq(W.ediff1d(arr), np.ediff1d(v))


def test_kth_smallest_bucket_narrowing(spark, rng):
    """Force the iterative narrowing loop (max_collect tiny) and
    verify exact order statistics against NumPy."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    v = rng.normal(size=5_000) * 1000
    arr = from_numpy(spark, v)
    srt = np.sort(v)
    for k in (0, 17, 2_500, 4_999):
        got = R.kth_smallest(arr, k, buckets=16, max_collect=50)
        assert got == srt[k]
    med = R.median_scalable(arr)
    assert med == np.median(v)


def test_kth_smallest_no_count_jobs_and_tie_boundaries(spark):
    """VERDICT r3 item 2: the narrowing loop runs ZERO .count() jobs
    (the in-range count is carried from the chosen bucket's histogram
    entry) and the base relation is persisted exactly once.  Integer
    data puts heavy ties on exact bucket boundaries -- the worst case
    for a carried count."""
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    v = np.repeat(np.arange(64.0), 64)  # 4096 rows, 64-way ties
    arr = from_numpy(spark, v)
    srt = np.sort(v)

    cls = type(arr.df)  # the concrete DataFrame class methods route through
    calls = {"count": 0, "persist": 0}
    orig_count = cls.count
    orig_persist = cls.persist

    def counting_count(self, *a, **kw):
        calls["count"] += 1
        return orig_count(self, *a, **kw)

    def counting_persist(self, *a, **kw):
        calls["persist"] += 1
        return orig_persist(self, *a, **kw)

    cls.count = counting_count
    cls.persist = counting_persist
    try:
        for k in (0, 100, 2048, 4095):
            got = R.kth_smallest(arr, k, buckets=16, max_collect=30)
            assert got == srt[k], k
    finally:
        cls.count = orig_count
        cls.persist = orig_persist
    assert calls["count"] == 0
    assert calls["persist"] == 4  # one per kth_smallest call


def test_histogramdd(spark, rng):
    from dask_array_spark import from_numpy
    from dask_array_spark.operators import reductions as R

    x = rng.uniform(0, 4, 800)
    y = rng.uniform(-2, 2, 800)
    z = rng.uniform(0, 1, 800)
    arrs = [from_numpy(spark, v) for v in (x, y, z)]
    want, _ = np.histogramdd(
        np.stack([x, y, z], 1),
        bins=(4, 3, 2),
        range=((0, 4), (-2, 2), (0, 1)),
    )
    got = R.histogramdd(arrs, (4, 3, 2), ((0, 4), (-2, 2), (0, 1))).compute()
    np.testing.assert_array_equal(got, want.astype("int64"))


def test_tsqr_tree_merge_many_blocks(spark):
    """Tree-merge TSQR with 120 row-blocks and fanin 4 (3 merge
    levels): Q^T Q == I and Q R == A -- the driver never sees more
    than fanin*k R rows (reference recursive TSQR,
    linalg/_qr.py:38-560)."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    rng = np.random.default_rng(42)
    mat = rng.normal(size=(3000, 5))
    a = from_numpy(spark, mat)
    q, r = linalg.tsqr(a, block_rows=25, fanin=4)
    qmat = q.compute()
    assert np.allclose(qmat.T @ qmat, np.eye(5), atol=1e-8)
    assert np.allclose(qmat @ r, mat, atol=1e-8)
    # R matches the direct in-core factorization up to the fixed sign
    # convention (diag >= 0)
    r_ref = np.linalg.qr(mat, mode="r")
    r_ref = r_ref * np.sign(np.diag(r_ref))[:, None]
    assert np.allclose(r, r_ref, atol=1e-8)


def test_tsqr_unknown_rowcount(spark):
    """Unknown-shape input (None rows) takes the persist+count path."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.core.array import Array
    from dask_array_spark.operators import linalg

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(400, 3))
    a0 = from_numpy(spark, mat)
    a = Array(a0.df, (None, 3))
    q, r = linalg.tsqr(a, block_rows=10, fanin=4)
    qmat = Array(q.df, (400, 3)).compute()
    assert np.allclose(qmat @ r, mat, atol=1e-8)


def test_incore_tier_size_guard(spark):
    """The factor wavefront executes eagerly, so solve/inv/cholesky/lu
    refuse absurd dense factorizations up front (the old in-core tier
    refused to collect; the blocked tier refuses to launch)."""
    import pytest as _pytest

    from dask_array_spark.core.array import Array
    from dask_array_spark.operators import linalg

    big = Array(spark.range(1).selectExpr("id AS i0", "id AS i1", "1.0 AS v"),
                (100_000, 100_000))
    for fn in (linalg.inv, linalg.cholesky, linalg.lu):
        with _pytest.raises(ValueError, match="blocked wavefront"):
            fn(big)


def test_svd_compressed_low_rank_recovery(spark):
    """Randomized SVD (reference svd_compressed, linalg/_svd.py):
    recovers the spectrum of an exactly rank-5 matrix and
    reconstructs it to 1e-6."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(400, 5)) @ rng.normal(size=(5, 30))
    a = from_numpy(spark, mat)
    u, s, vt = linalg.svd_compressed(a, k=5, n_power_iter=2, block_rows=50)
    s_ref = np.linalg.svd(mat, compute_uv=False)[:5]
    assert np.allclose(s, s_ref, rtol=1e-8)
    umat = u.compute()
    assert np.allclose(umat @ np.diag(s) @ vt, mat, atol=1e-6)
    assert np.allclose(umat.T @ umat, np.eye(5), atol=1e-8)


def test_cov_matrix_matches_numpy(spark, rng):
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    m = rng.normal(size=(5, 40))
    np.testing.assert_allclose(
        linalg.cov(from_numpy(spark, m)).compute(), np.cov(m), atol=1e-12
    )
    np.testing.assert_allclose(
        linalg.cov(from_numpy(spark, m), rowvar=False).compute(),
        np.cov(m, rowvar=False),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        linalg.cov(from_numpy(spark, m), bias=True).compute(),
        np.cov(m, bias=True),
        atol=1e-12,
    )
    # 1-D input squeezes to the scalar variance
    np.testing.assert_allclose(
        float(linalg.cov(from_numpy(spark, m[0])).compute()), np.cov(m[0]), atol=1e-12
    )
    # two-operand form stacks x atop y (reference _statistics.py:111)
    np.testing.assert_allclose(
        linalg.cov(from_numpy(spark, m[:2]), from_numpy(spark, m[2:4])).compute(),
        np.cov(m[:2], m[2:4]),
        atol=1e-12,
    )


def test_corrcoef_matrix_matches_numpy(spark, rng):
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    m = rng.normal(size=(4, 30))
    np.testing.assert_allclose(
        linalg.corrcoef(from_numpy(spark, m)).compute(), np.corrcoef(m), atol=1e-12
    )


def test_sfqr_short_fat_parity(spark):
    """Direct short-fat QR (reference linalg/_qr.py:529): Q^T Q == I,
    Q R == A, and R matches numpy's reduced factorization up to the
    diag(R) >= 0 sign convention on a 6 x 80 fixture."""
    import numpy as np

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(6, 80))
    q, r = linalg.sfqr(from_numpy(spark, mat))
    assert q.shape == (6, 6)
    assert np.allclose(q.T @ q, np.eye(6), atol=1e-8)
    rmat = r.compute()
    assert rmat.shape == (6, 80)
    assert np.allclose(q @ rmat, mat, atol=1e-8)
    # leading m x m of R upper triangular
    assert np.allclose(np.tril(rmat[:, :6], -1), 0, atol=1e-8)
    r_ref = np.linalg.qr(mat, mode="r")
    r_ref = r_ref * np.sign(np.diag(r_ref[:, :6]))[:, None]
    assert np.allclose(rmat, r_ref, atol=1e-8)


def test_qr_dispatch_routes_by_aspect(spark):
    """qr() sends tall inputs to tsqr and short-fat inputs to sfqr
    (reference dispatch, linalg/_qr.py:560); both reconstruct A."""
    import numpy as np
    import pytest

    from dask_array_spark import from_numpy
    from dask_array_spark.operators import linalg

    rng = np.random.default_rng(3)
    tall = rng.normal(size=(200, 4))
    q, r = linalg.qr(from_numpy(spark, tall))
    assert isinstance(r, np.ndarray) and r.shape == (4, 4)
    assert np.allclose(q.compute() @ r, tall, atol=1e-8)

    fat = rng.normal(size=(4, 200))
    q, r = linalg.qr(from_numpy(spark, fat))
    assert isinstance(q, np.ndarray) and q.shape == (4, 4)
    assert np.allclose(q @ r.compute(), fat, atol=1e-8)

    with pytest.raises(ValueError, match="max_rows"):
        big = from_numpy(spark, np.zeros((2, 3)))
        from dask_array_spark.core.array import Array

        linalg.sfqr(Array(big.df, (5000, 6000)))
