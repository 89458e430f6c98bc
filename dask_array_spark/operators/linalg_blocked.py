"""Distributed blocked dense factorizations (Cholesky / LU / solve).

Parity target: the reference's blocked wavefronts
(/root/reference/dask_array/linalg/_cholesky.py:27-214,
/root/reference/dask_array/linalg/_lu.py:27-265,
/root/reference/dask_array/linalg/_solve.py:20-330).  The reference
builds one task per block and lets its scheduler run the wavefront;
here the driver loops over block *columns* (the sequential dimension of
the factorization) and each step is a Spark job distributed over the
remaining block rows -- classic BSP.  All level-3 work (block matmul,
block triangular solve, the diagonal-block factor itself) runs on
EXECUTORS inside Arrow-batched kernels; the driver only orchestrates.
Nothing matrix-sized is ever collected.

Block form
----------
A (bi, bj, data) DataFrame; ``data`` is the row-major float64 bytes of
the (nr x nc) tile, nr/nc derived from the array shape and the block
size ``nb`` (edge tiles are short).  One shuffle converts cell/COO form
to tiles; tiles then move only through broadcast-joins of single block
rows/columns (metadata-sized relative to the matrix) per wavefront
step.  Each step's output is persisted and counted so the logical plan
stays O(K) per step instead of compounding across the K-step loop.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.array import Array, VALUE_COL

__all__ = [
    "cholesky_blocked",
    "lu_blocked",
    "solve_blocked",
    "solve_triangular_blocked",
    "inv_blocked",
]

DEFAULT_NB = 1024

# The wavefront EXECUTES eagerly (each step materializes), so refuse
# absurd factorizations up front instead of launching a K^2-tile job
# storm: 2^31 cells = a 46k x 46k dense factor (~17 GB of tiles) --
# far beyond what a dense O(n^3) factorization is for.  Overridable
# per call for genuinely large clusters.
MAX_WAVEFRONT_CELLS = 1 << 31

# The wavefront is STRUCTURALLY SEQUENTIAL over block columns (the
# same trade the reference makes, linalg/_cholesky.py:27-214): each
# of the K = ceil(n/nb) steps runs O(1) Spark jobs, so the total plan
# is O(K) driver-sequenced stages.  That is fine at modest K and
# catastrophic at K ~ 10^4 (a ten-thousand-stage job storm a caller
# could silently submit with a tiny nb); refuse past this bound and
# say what to change.  The per-step job constant is regression-pinned
# by tests/test_linalg_blocked.py::test_wavefront_stage_count_is_linear.
MAX_WAVEFRONT_STEPS = 256

_BLOCK_SCHEMA = "bi long, bj long, data binary"


def _check_steps(K: int) -> None:
    if K > MAX_WAVEFRONT_STEPS:
        raise ValueError(
            f"blocked wavefront would sequence {K} block-column steps "
            f"(> {MAX_WAVEFRONT_STEPS}): each step is O(1) eager Spark "
            "jobs, so this plan is a driver-sequenced stage storm -- "
            "raise nb (bigger tiles) or use lstsq/tsqr/svd for tall "
            "problems"
        )


def _check_size(a: Array, max_cells: int | None) -> None:
    limit = MAX_WAVEFRONT_CELLS if max_cells is None else max_cells
    n, m = a.shape
    if n is None or m is None:
        raise ValueError("blocked factorizations need a known shape")
    if n * m > limit:
        raise ValueError(
            f"blocked wavefront got {n * m} cells (> {limit}); dense "
            "O(n^3) factorization at this size is not what you want -- "
            "use lstsq/tsqr/svd for tall problems, or raise max_cells "
            "explicitly"
        )


def _nrows(n: int, nb: int, b: int) -> int:
    return min(nb, n - b * nb)


def _to_blocks(a: Array, nb: int) -> DataFrame:
    """Cell/COO -> dense tiles: ONE hash shuffle on (bi, bj); absent
    cells materialize as 0 (the factor wavefront is dense by nature)."""
    n, m = a.shape

    def build(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        blk = np.zeros((_nrows(n, nb, bi), _nrows(m, nb, bj)))
        blk[pdf["r"].to_numpy(), pdf["c"].to_numpy()] = pdf["v"].to_numpy()
        return pd.DataFrame({"bi": [bi], "bj": [bj], "data": [blk.tobytes()]})

    cells = a.df.select(
        F.expr(f"i0 DIV {nb}").alias("bi"),
        F.expr(f"i1 DIV {nb}").alias("bj"),
        (F.col("i0") % nb).cast("int").alias("r"),
        (F.col("i1") % nb).cast("int").alias("c"),
        F.col(VALUE_COL).cast("double").alias("v"),
    )
    return cells.groupBy("bi", "bj").applyInPandas(build, _BLOCK_SCHEMA)


def _vec_to_blocks(b: Array, nb: int) -> DataFrame:
    """1-D (n,) or 2-D (n, m) RHS -> block rows (bi, data nr x m)."""
    n = b.shape[0]
    m = b.shape[1] if b.ndim == 2 else 1

    def build(key, pdf):
        bi = int(key[0])
        blk = np.zeros((_nrows(n, nb, bi), m))
        blk[pdf["r"].to_numpy(), pdf["c"].to_numpy()] = pdf["v"].to_numpy()
        return pd.DataFrame({"bi": [bi], "bj": [0], "data": [blk.tobytes()]})

    df = b.df
    ccol = (F.col("i1") % (10**12)).cast("int") if b.ndim == 2 else F.lit(0)
    cells = df.select(
        F.expr(f"i0 DIV {nb}").alias("bi"),
        (F.col("i0") % nb).cast("int").alias("r"),
        ccol.alias("c"),
        F.col(VALUE_COL).cast("double").alias("v"),
    )
    return cells.groupBy("bi").applyInPandas(build, _BLOCK_SCHEMA)


def _blocks_to_array(bdf: DataFrame, shape, nb: int, lower_only=False, upper_only=False) -> Array:
    """Tiles -> cell form.  ``lower_only``/``upper_only`` emit just the
    structurally non-zero triangle (sparse cell form, matching the
    existing cholesky() contract)."""
    n, m = shape

    def explode(it):
        for pdf in it:
            for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                nr, nc = _nrows(n, nb, int(bi)), _nrows(m, nb, int(bj))
                blk = np.frombuffer(data, dtype=np.float64).reshape(nr, nc)
                r = np.repeat(np.arange(nr), nc)
                c = np.tile(np.arange(nc), nr)
                i0 = int(bi) * nb + r
                i1 = int(bj) * nb + c
                v = blk.ravel()
                if lower_only:
                    keep = i1 <= i0
                    i0, i1, v = i0[keep], i1[keep], v[keep]
                elif upper_only:
                    keep = i1 >= i0
                    i0, i1, v = i0[keep], i1[keep], v[keep]
                yield pd.DataFrame({"i0": i0, "i1": i1, "v": v})

    return Array(bdf.mapInPandas(explode, "i0 long, i1 long, v double"), shape)


def _vec_blocks_to_array(bdf: DataFrame, n: int, m: int, nb: int, ndim: int) -> Array:
    def explode(it):
        for pdf in it:
            for bi, data in zip(pdf["bi"], pdf["data"]):
                nr = _nrows(n, nb, int(bi))
                blk = np.frombuffer(data, dtype=np.float64).reshape(nr, m)
                r = np.repeat(np.arange(nr), m)
                c = np.tile(np.arange(m), nr)
                out = {"i0": int(bi) * nb + r, "v": blk.ravel()}
                if ndim == 2:
                    out = {"i0": out["i0"], "i1": c, "v": out["v"]}
                yield pd.DataFrame(out)

    schema = "i0 long, i1 long, v double" if ndim == 2 else "i0 long, v double"
    shape = (n, m) if ndim == 2 else (n,)
    return Array(bdf.mapInPandas(explode, schema), shape)


def _sum_blocks(df: DataFrame, n: int, m: int, nb: int) -> DataFrame:
    """groupBy (bi, bj) summing tile payloads."""

    def kern(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        nr, nc = _nrows(n, nb, bi), _nrows(m, nb, bj)
        acc = np.zeros((nr, nc))
        for d in pdf["data"]:
            acc += np.frombuffer(d, dtype=np.float64).reshape(nr, nc)
        return pd.DataFrame({"bi": [bi], "bj": [bj], "data": [acc.tobytes()]})

    return df.groupBy("bi", "bj").applyInPandas(kern, _BLOCK_SCHEMA)


def _sum_vec_blocks(df: DataFrame, n: int, m: int, nb: int) -> DataFrame:
    """groupBy bi summing RHS blocks (nr x m; the RHS width m is NOT
    blocked, unlike matrix tiles)."""

    def kern(key, pdf):
        bi = int(key[0])
        acc = np.zeros((_nrows(n, nb, bi), m))
        for d in pdf["data"]:
            acc += np.frombuffer(d, dtype=np.float64).reshape(acc.shape)
        return pd.DataFrame({"bi": [bi], "bj": [0], "data": [acc.tobytes()]})

    return df.groupBy("bi").applyInPandas(kern, _BLOCK_SCHEMA)


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize one wavefront step and TRUNCATE its lineage.
    Each step's plan references every prior step's plan; without
    truncation the plan tree compounds across the K-step loop (heap +
    re-analysis blow-up).  localCheckpoint pins the computed partitions
    and replaces the plan with a leaf."""
    return df.localCheckpoint(eager=True)


def _np_lu(a: np.ndarray):
    """Partial-pivot LU of one diagonal tile (executor-side; the
    container has no scipy, so this is the classic outer-product
    elimination vectorized per column).  Returns (piv, L, U) with
    A[piv] = L @ U."""
    A = a.astype(np.float64).copy()
    n = A.shape[0]
    piv = np.arange(n)
    L = np.zeros((n, n))
    for j in range(n):
        k = j + int(np.argmax(np.abs(A[j:, j])))
        if k != j:
            A[[j, k]] = A[[k, j]]
            piv[[j, k]] = piv[[k, j]]
            L[[j, k], :j] = L[[k, j], :j]
        L[j, j] = 1.0
        if A[j, j] != 0.0:
            mult = A[j + 1 :, j] / A[j, j]
            L[j + 1 :, j] = mult
            A[j + 1 :, j:] -= np.outer(mult, A[j, j:])
            A[j + 1 :, j] = 0.0
    return piv, L, np.triu(A)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------


def cholesky_blocked(a: Array, nb: int | None = None, max_cells: int | None = None) -> Array:
    """Lower Cholesky factor via the right-looking block wavefront
    (reference linalg/_cholesky.py:27-214):

        L[k][k] = chol(A[k][k] - sum_p L[k][p] L[k][p]^T)
        L[i][k] = (A[i][k] - sum_p L[i][p] L[k][p]^T) L[k][k]^-T   (i > k)

    One driver step per block column; within a step the panel rows
    solve in parallel against the broadcast diagonal factor."""
    _check_size(a, max_cells)
    n = a.shape[0]
    nb = nb or min(DEFAULT_NB, n)
    K = math.ceil(n / nb)
    _check_steps(K)
    spark = a.spark

    ab = _materialize(
        _to_blocks(a, nb).filter(F.col("bi") >= F.col("bj"))
    )

    def _mul_lt(it):
        # L[i][p] @ L[k][p]^T, negated (subtractive contribution)
        for pdf in it:
            bis, datas = [], []
            for bi, p, d, kd in zip(pdf["bi"], pdf["bj"], pdf["data"], pdf["kdata"]):
                ncp = _nrows(n, nb, int(p))
                li = np.frombuffer(d, dtype=np.float64).reshape(-1, ncp)
                lk = np.frombuffer(kd, dtype=np.float64).reshape(-1, ncp)
                bis.append(bi)
                datas.append((-(li @ lk.T)).tobytes())
            yield pd.DataFrame({"bi": bis, "bj": [-1] * len(bis), "data": datas})

    parts: list[DataFrame] = []
    try:
        for k in range(K):
            col_a = ab.filter((F.col("bj") == k) & (F.col("bi") >= k))
            if k > 0:
                lcols = parts[0]
                for p in parts[1:]:
                    lcols = lcols.unionByName(p)
                lk_row = lcols.filter(F.col("bi") == k).select(
                    F.col("bj").alias("p"), F.col("data").alias("kdata")
                )
                contrib = (
                    lcols.filter(F.col("bi") >= k)
                    .join(F.broadcast(lk_row), on=F.col("bj") == F.col("p"))
                    .mapInPandas(_mul_lt, _BLOCK_SCHEMA)
                    .withColumn("bj", F.lit(k))
                )
                s_col = _sum_blocks(col_a.unionByName(contrib), n, n, nb)
            else:
                s_col = col_a
            s_col = s_col.persist()

            kk = k

            def _make_chol_diag(kk):
                def _chol_diag(key, pdf):
                    nr = _nrows(n, nb, kk)
                    blk = np.frombuffer(pdf["data"].iloc[0], dtype=np.float64).reshape(nr, nr)
                    # only the lower triangle is meaningful post-Schur
                    sym = np.tril(blk) + np.tril(blk, -1).T
                    return pd.DataFrame(
                        {"bi": [kk], "bj": [kk], "data": [np.linalg.cholesky(sym).tobytes()]}
                    )

                return _chol_diag

            diag = _materialize(
                s_col.filter(F.col("bi") == kk)
                .groupBy("bi", "bj")
                .applyInPandas(_make_chol_diag(kk), _BLOCK_SCHEMA)
            )

            def _make_panel(kk):
                def _panel(it):
                    for pdf in it:
                        bis, datas = [], []
                        for bi, d, ld in zip(pdf["bi"], pdf["data"], pdf["ld"]):
                            nck = _nrows(n, nb, kk)
                            lkk = np.frombuffer(ld, dtype=np.float64).reshape(nck, nck)
                            s = np.frombuffer(d, dtype=np.float64).reshape(-1, nck)
                            # L[i][k] = S L[k][k]^-T  ==  solve(Lkk, S^T)^T
                            bis.append(bi)
                            datas.append(np.linalg.solve(lkk, s.T).T.tobytes())
                        yield pd.DataFrame({"bi": bis, "bj": [kk] * len(bis), "data": datas})

                return _panel

            panel = (
                s_col.filter(F.col("bi") > kk)
                .crossJoin(F.broadcast(diag.select(F.col("data").alias("ld"))))
                .mapInPandas(_make_panel(kk), _BLOCK_SCHEMA)
            )
            part = _materialize(diag.unionByName(panel))
            parts.append(part)
            s_col.unpersist()

        allb = parts[0]
        for p in parts[1:]:
            allb = allb.unionByName(p)
        out = _blocks_to_array(allb, (n, n), nb, lower_only=True)
        # detach the result from the persisted step parts
        return Array(_materialize(out.df), (n, n))
    finally:
        ab.unpersist()
        for p in parts:
            p.unpersist()


# ---------------------------------------------------------------------------
# LU
# ---------------------------------------------------------------------------


def lu_blocked(a: Array, nb: int | None = None, max_cells: int | None = None):
    """Blocked LU with tile-local partial pivoting (reference
    linalg/_lu.py:27-265 -- pivoting never crosses block rows, exactly
    the reference's semantics).  Returns (P, L, U) Arrays with
    P @ A = L @ U and P block-diagonal.

    Recurrence per step i (LU* = the raw factor tiles, L = P^T LU*):
        tv[k][i] = A[k][i] - sum_p LU*[k][p] @ U[p][i]        (k >= i)
        piv_i, L[i][i], U[i][i] = lu(tv[i][i])
        LU*[k][i] = (U[i][i]^-T tv[k][i]^T)^T                  (k > i)
        U[i][j] = L[i][i]^-1 P_i^T (A[i][j] - sum_p LU*[i][p] @ U[p][j])
    """
    _check_size(a, max_cells)
    n = a.shape[0]
    nb = nb or min(DEFAULT_NB, n)
    K = math.ceil(n / nb)
    _check_steps(K)

    ab = _materialize(_to_blocks(a, nb))

    def _mul_neg(it):
        # -(left @ right) where right is the broadcast (p-keyed) tile
        for pdf in it:
            bis, bjs, datas = [], [], []
            for bi, bj, p, d, rd in zip(
                pdf["bi"], pdf["bj"], pdf["p"], pdf["data"], pdf["rdata"]
            ):
                ncp = _nrows(n, nb, int(p))
                left = np.frombuffer(d, dtype=np.float64).reshape(-1, ncp)
                right = np.frombuffer(rd, dtype=np.float64).reshape(ncp, -1)
                bis.append(bi)
                bjs.append(bj)
                datas.append((-(left @ right)).tobytes())
            yield pd.DataFrame({"bi": bis, "bj": bjs, "data": datas})

    col_parts: list[DataFrame] = []  # step i -> LU* tiles (k, i), k >= i
    row_parts: list[DataFrame] = []  # step i -> U tiles (i, j), j > i
    diag_parts: list[DataFrame] = []  # step i -> tagged P/L/U diagonal tiles
    hold = []
    try:
        for i in range(K):
            ii = i
            # --- column targets tv[k][i], k >= i --------------------------
            tcol = ab.filter((F.col("bj") == ii) & (F.col("bi") >= ii))
            if i > 0:
                lus = col_parts[0]
                for p in col_parts[1:]:
                    lus = lus.unionByName(p)
                u_col = None  # U[p][i] tiles for p < i
                for p in range(i):
                    upi = row_parts[p].filter(F.col("bj") == ii)
                    u_col = upi if u_col is None else u_col.unionByName(upi)
                u_col = u_col.select(
                    F.col("bi").alias("p"), F.col("data").alias("rdata")
                )
                contrib = (
                    lus.filter(F.col("bi") >= ii)
                    .join(F.broadcast(u_col), on=F.col("bj") == F.col("p"))
                    .mapInPandas(_mul_neg, _BLOCK_SCHEMA)
                    .withColumn("bj", F.lit(ii))
                )
                tcol = _sum_blocks(tcol.unionByName(contrib), n, n, nb)
            tcol = tcol.persist()
            hold.append(tcol)

            # --- diagonal factor ------------------------------------------
            def _make_lu_diag(ii):
                def _lu_diag(key, pdf):
                    nr = _nrows(n, nb, ii)
                    blk = np.frombuffer(pdf["data"].iloc[0], dtype=np.float64).reshape(nr, nr)
                    piv, L, U = _np_lu(blk)
                    pm = np.eye(nr)[piv]  # P @ blk = L @ U
                    return pd.DataFrame(
                        {
                            "which": ["P", "L", "U"],
                            "bi": [ii] * 3,
                            "bj": [ii] * 3,
                            "data": [pm.tobytes(), L.tobytes(), U.tobytes()],
                        }
                    )

                return _lu_diag

            diag = _materialize(
                tcol.filter(F.col("bi") == ii)
                .groupBy("bi", "bj")
                .applyInPandas(_make_lu_diag(ii), "which string, bi long, bj long, data binary")
            )
            diag_parts.append(diag)
            u_diag = diag.filter(F.col("which") == "U").select(
                F.col("data").alias("ud")
            )
            l_diag = diag.filter(F.col("which") == "L").select(
                F.col("data").alias("ld")
            )
            p_diag = diag.filter(F.col("which") == "P").select(
                F.col("data").alias("pd_")
            )

            # --- column panel LU*[k][i] = (U_ii^-T tv^T)^T, k > i ---------
            def _make_colsolve(ii):
                def _colsolve(it):
                    for pdf in it:
                        bis, datas = [], []
                        for bi, d, ud in zip(pdf["bi"], pdf["data"], pdf["ud"]):
                            nc = _nrows(n, nb, ii)
                            uii = np.frombuffer(ud, dtype=np.float64).reshape(nc, nc)
                            tv = np.frombuffer(d, dtype=np.float64).reshape(-1, nc)
                            bis.append(bi)
                            datas.append(np.linalg.solve(uii.T, tv.T).T.tobytes())
                        yield pd.DataFrame({"bi": bis, "bj": [ii] * len(bis), "data": datas})

                return _colsolve

            col_panel = (
                tcol.filter(F.col("bi") > ii)
                .crossJoin(F.broadcast(u_diag))
                .mapInPandas(_make_colsolve(ii), _BLOCK_SCHEMA)
            )
            col_part = _materialize(col_panel)
            col_parts.append(col_part)

            # --- row targets + U row U[i][j], j > i ------------------------
            trow = ab.filter((F.col("bi") == ii) & (F.col("bj") > ii))
            if i > 0:
                lu_row = None  # LU*[i][p] tiles for p < i (broadcast side)
                for p in range(i):
                    lip = col_parts[p].filter(F.col("bi") == ii)
                    lu_row = lip if lu_row is None else lu_row.unionByName(lip)
                lu_row = lu_row.select(
                    F.col("bj").alias("p"), F.col("data").alias("ldata")
                )
                urows = row_parts[0]
                for p in row_parts[1:]:
                    urows = urows.unionByName(p)

                def _mul_row(it):
                    for pdf in it:
                        bjs, datas = [], []
                        for bj, p, ud, ld in zip(
                            pdf["bj"], pdf["p"], pdf["data"], pdf["ldata"]
                        ):
                            ncp = _nrows(n, nb, int(p))
                            left = np.frombuffer(ld, dtype=np.float64).reshape(-1, ncp)
                            right = np.frombuffer(ud, dtype=np.float64).reshape(ncp, -1)
                            bjs.append(bj)
                            datas.append((-(left @ right)).tobytes())
                        yield pd.DataFrame(
                            {"bi": [0] * len(bjs), "bj": bjs, "data": datas}
                        )

                contrib = (
                    urows.filter(F.col("bj") > ii)
                    .join(F.broadcast(lu_row), on=F.col("bi") == F.col("p"))
                    .mapInPandas(_mul_row, _BLOCK_SCHEMA)
                    .withColumn("bi", F.lit(ii))
                )
                trow = _sum_blocks(trow.unionByName(contrib), n, n, nb)

            def _make_rowsolve(ii):
                def _rowsolve(it):
                    for pdf in it:
                        bjs, datas = [], []
                        for bj, d, ld, pdm in zip(
                            pdf["bj"], pdf["data"], pdf["ld"], pdf["pd_"]
                        ):
                            nr = _nrows(n, nb, ii)
                            lii = np.frombuffer(ld, dtype=np.float64).reshape(nr, nr)
                            pm = np.frombuffer(pdm, dtype=np.float64).reshape(nr, nr)
                            th = np.frombuffer(d, dtype=np.float64).reshape(nr, -1)
                            bjs.append(bj)
                            datas.append(np.linalg.solve(lii, pm @ th).tobytes())
                        yield pd.DataFrame({"bi": [ii] * len(bjs), "bj": bjs, "data": datas})

                return _rowsolve

            row_panel = (
                trow.crossJoin(F.broadcast(l_diag))
                .crossJoin(F.broadcast(p_diag))
                .mapInPandas(_make_rowsolve(ii), _BLOCK_SCHEMA)
            )
            row_parts.append(_materialize(row_panel))

        # --- assemble P, L, U ---------------------------------------------
        def _apply_pt(it):
            # L[k][i] = P_k^T @ LU*[k][i]  (k > i)
            for pdf in it:
                bis, bjs, datas = [], [], []
                for bi, bj, d, pdm in zip(pdf["bi"], pdf["bj"], pdf["data"], pdf["pd_"]):
                    nr = _nrows(n, nb, int(bi))
                    pm = np.frombuffer(pdm, dtype=np.float64).reshape(nr, nr)
                    lu_t = np.frombuffer(d, dtype=np.float64).reshape(nr, -1)
                    bis.append(bi)
                    bjs.append(bj)
                    datas.append((pm.T @ lu_t).tobytes())
                yield pd.DataFrame({"bi": bis, "bj": bjs, "data": datas})

        p_all = None
        for i in range(K):
            pi = diag_parts[i].filter(F.col("which") == "P").select("bi", "bj", "data")
            p_all = pi if p_all is None else p_all.unionByName(pi)

        p_tiles = p_all.select(
            F.col("bi").alias("pbi"), F.col("data").alias("pd_")
        )

        l_off = None
        for i in range(K):
            off = col_parts[i].filter(F.col("bi") > F.col("bj"))
            l_off = off if l_off is None else l_off.unionByName(off)
        l_all = None
        for i in range(K):
            ld = diag_parts[i].filter(F.col("which") == "L").select("bi", "bj", "data")
            l_all = ld if l_all is None else l_all.unionByName(ld)
        if l_off is not None:
            l_fixed = (
                l_off.join(F.broadcast(p_tiles), on=F.col("bi") == F.col("pbi"))
                .mapInPandas(_apply_pt, _BLOCK_SCHEMA)
            )
            l_all = l_all.unionByName(l_fixed)

        u_all = None
        for i in range(K):
            ud = diag_parts[i].filter(F.col("which") == "U").select("bi", "bj", "data")
            u_all = ud if u_all is None else u_all.unionByName(ud)
            u_all = u_all.unionByName(row_parts[i])

        p_arr = _blocks_to_array(p_all, (n, n), nb)
        l_arr = _blocks_to_array(l_all, (n, n), nb, lower_only=True)
        u_arr = _blocks_to_array(u_all, (n, n), nb, upper_only=True)
        return (
            Array(_materialize(p_arr.df), (n, n)),
            Array(_materialize(l_arr.df), (n, n)),
            Array(_materialize(u_arr.df), (n, n)),
        )
    finally:
        ab.unpersist()
        for p in col_parts + row_parts + diag_parts + hold:
            p.unpersist()


# ---------------------------------------------------------------------------
# Triangular solve / solve / inv
# ---------------------------------------------------------------------------


def _subst(abdf: DataFrame, bb: DataFrame, n: int, m: int, nb: int, lower: bool):
    """Blocked forward/backward substitution (reference
    linalg/_solve.py SolveTriangular): sequential over block rows, each
    step one metadata-sized Spark job over that row's tiles."""
    K = math.ceil(n / nb)
    _check_steps(K)
    order = range(K) if lower else range(K - 1, -1, -1)
    xparts: dict[int, DataFrame] = {}

    def _mul_neg(it):
        for pdf in it:
            bis, datas = [], []
            for bi, p, d, xd in zip(pdf["bi"], pdf["bj"], pdf["data"], pdf["xdata"]):
                ncp = _nrows(n, nb, int(p))
                left = np.frombuffer(d, dtype=np.float64).reshape(-1, ncp)
                xv = np.frombuffer(xd, dtype=np.float64).reshape(ncp, m)
                bis.append(bi)
                datas.append((-(left @ xv)).tobytes())
            yield pd.DataFrame({"bi": bis, "bj": [0] * len(bis), "data": datas})

    for i in order:
        ii = i
        t = bb.filter(F.col("bi") == ii)
        done = [p for p in xparts]
        if done:
            xs = None
            for p in done:
                xp = xparts[p].select(F.col("bi").alias("p"), F.col("data").alias("xdata"))
                xs = xp if xs is None else xs.unionByName(xp)
            arow = abdf.filter(
                (F.col("bi") == ii)
                & (F.col("bj") < ii if lower else F.col("bj") > ii)
            )
            contrib = arow.join(
                F.broadcast(xs), on=F.col("bj") == F.col("p")
            ).mapInPandas(_mul_neg, _BLOCK_SCHEMA)
            t = _sum_vec_blocks(t.unionByName(contrib), n, m, nb)

        def _make_solve_diag(ii):
            def _solve_diag(it):
                for pdf in it:
                    datas = []
                    for d, ad in zip(pdf["data"], pdf["ad"]):
                        nr = _nrows(n, nb, ii)
                        aii = np.frombuffer(ad, dtype=np.float64).reshape(nr, nr)
                        tv = np.frombuffer(d, dtype=np.float64).reshape(nr, m)
                        datas.append(np.linalg.solve(aii, tv).tobytes())
                    yield pd.DataFrame(
                        {"bi": [ii] * len(datas), "bj": [0] * len(datas), "data": datas}
                    )

            return _solve_diag

        adiag = abdf.filter((F.col("bi") == ii) & (F.col("bj") == ii)).select(
            F.col("data").alias("ad")
        )
        xi = _materialize(
            t.crossJoin(F.broadcast(adiag)).mapInPandas(_make_solve_diag(ii), _BLOCK_SCHEMA)
        )
        xparts[ii] = xi

    xs = None
    for i in range(K):
        xs = xparts[i] if xs is None else xs.unionByName(xparts[i])
    return xs, list(xparts.values())


def _transpose_blocks(bdf: DataFrame, n: int, nb: int) -> DataFrame:
    def kern(it):
        for pdf in it:
            bis, bjs, datas = [], [], []
            for bi, bj, d in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                nr, nc = _nrows(n, nb, int(bi)), _nrows(n, nb, int(bj))
                blk = np.frombuffer(d, dtype=np.float64).reshape(nr, nc)
                bis.append(bj)
                bjs.append(bi)
                datas.append(blk.T.copy().tobytes())
            yield pd.DataFrame({"bi": bis, "bj": bjs, "data": datas})

    return bdf.mapInPandas(kern, _BLOCK_SCHEMA)


def solve_triangular_blocked(a: Array, b: Array, lower: bool = False, nb: int | None = None) -> Array:
    """solve(a, b) where ``a`` is (block) triangular."""
    n = a.shape[0]
    nb = nb or min(DEFAULT_NB, n)
    m = b.shape[1] if b.ndim == 2 else 1
    abdf = _materialize(_to_blocks(a, nb))
    bb = _materialize(_vec_to_blocks(b, nb))
    try:
        xs, parts = _subst(abdf, bb, n, m, nb, lower)
        out = _vec_blocks_to_array(xs, n, m, nb, b.ndim)
        res = Array(_materialize(out.df), out.shape)
        for p in parts:
            p.unpersist()
        return res
    finally:
        abdf.unpersist()
        bb.unpersist()


def solve_blocked(a: Array, b: Array, assume_a: str = "gen", nb: int | None = None, max_cells: int | None = None) -> Array:
    """solve(A, b) via blocked LU (gen) or blocked Cholesky (pos) plus
    two blocked substitutions (reference linalg/_solve.py:163-224).
    Everything stays on executors; the driver only sequences the K
    wavefront steps."""
    _check_size(a, max_cells)
    n = a.shape[0]
    nb = nb or min(DEFAULT_NB, n)
    m = b.shape[1] if b.ndim == 2 else 1
    K = math.ceil(n / nb)
    _check_steps(K)

    if assume_a == "pos":
        l_arr = cholesky_blocked(a, nb)
        lb = _materialize(_to_blocks(l_arr, nb))
        bb = _materialize(_vec_to_blocks(b, nb))
        try:
            y, parts1 = _subst(lb, bb, n, m, nb, lower=True)
            lt = _materialize(_transpose_blocks(lb, n, nb))
            x, parts2 = _subst(lt, y, n, m, nb, lower=False)
            out = _vec_blocks_to_array(x, n, m, nb, b.ndim)
            res = Array(_materialize(out.df), out.shape)
            for p in parts1 + parts2:
                p.unpersist()
            lt.unpersist()
            return res
        finally:
            lb.unpersist()
            bb.unpersist()

    p_arr, l_arr, u_arr = lu_blocked(a, nb)
    pb = _materialize(_to_blocks(p_arr, nb))
    lb = _materialize(_to_blocks(l_arr, nb))
    ub = _materialize(_to_blocks(u_arr, nb))
    bb = _materialize(_vec_to_blocks(b, nb))

    def _permute(it):
        # P is block diagonal: (P b)[i] = P_i @ b[i]
        for pdf in it:
            bis, datas = [], []
            for bi, d, pdm in zip(pdf["bi"], pdf["data"], pdf["pd_"]):
                nr = _nrows(n, nb, int(bi))
                pm = np.frombuffer(pdm, dtype=np.float64).reshape(nr, nr)
                bv = np.frombuffer(d, dtype=np.float64).reshape(nr, m)
                bis.append(bi)
                datas.append((pm @ bv).tobytes())
            yield pd.DataFrame({"bi": bis, "bj": [0] * len(bis), "data": datas})

    try:
        ptiles = pb.filter(F.col("bi") == F.col("bj")).select(
            F.col("bi").alias("pbi"), F.col("data").alias("pd_")
        )
        pb_b = _materialize(
            bb.join(F.broadcast(ptiles), on=F.col("bi") == F.col("pbi")).mapInPandas(
                _permute, _BLOCK_SCHEMA
            )
        )
        y, parts1 = _subst(lb, pb_b, n, m, nb, lower=True)
        x, parts2 = _subst(ub, y, n, m, nb, lower=False)
        out = _vec_blocks_to_array(x, n, m, nb, b.ndim)
        res = Array(_materialize(out.df), out.shape)
        for p in parts1 + parts2:
            p.unpersist()
        pb_b.unpersist()
        return res
    finally:
        pb.unpersist()
        lb.unpersist()
        ub.unpersist()
        bb.unpersist()


def inv_blocked(a: Array, nb: int | None = None, max_cells: int | None = None) -> Array:
    """inv(A) = solve(A, I) with a distributed identity RHS (reference
    linalg/_solve.py inv).  The inverse is a dense n x n output, so this
    tier is for matrices whose SQUARE fits the cluster comfortably --
    exactly the reference's contract."""
    _check_size(a, max_cells)
    n = a.shape[0]
    spark = a.spark
    eye = Array(
        spark.range(n).select(
            F.col("id").alias("i0"),
            F.col("id").alias("i1"),
            F.lit(1.0).alias(VALUE_COL),
        ),
        (n, n),
    )
    return solve_blocked(a, eye, assume_a="gen", nb=nb)
