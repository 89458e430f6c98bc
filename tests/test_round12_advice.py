"""Round-11 ADVICE closures (round 12).

1. to_hdf5's int64/uint64 paths REFUSE NULL cells loudly (both the
   contiguous slab writer and the chunked two-pass writer), mirroring
   to_zarr / to_npy_stack's 'no NULL representation' contract -- the
   round-11 code silently dropped them so they read back as 0.
2. _parse_fill kind 'u' rejects integral fills outside [0, 2**64)
   (int -5, float -3.0) at metadata-parse time instead of surfacing
   later as an opaque Arrow cast failure.
3. cosine_topk/sq8_topk with explicit impl="arrow" always honor the
   request when any query resolves: NULL query embeddings are dropped
   in-kernel (the SQL form provably emits no rows for them) and
   ragged query sets are served per length group -- no silent
   relational fallback, and no 2**40 vec_id bound (threshold pruning
   replaced the packed key).
4. _chunk_pass pass 2 maps a chunk MISSING from the pass-1 layout to
   the explanatory 'source not deterministic' ValueError, not a bare
   executor KeyError.
"""

import numpy as np
import pytest


def _masked_int_array(spark, dtype="long"):
    """A 1-d int array with one NULL cell, in the engine's cell form."""
    import decimal

    from dask_array_spark.core.array import Array

    one, three = (
        (decimal.Decimal(1), decimal.Decimal(3))
        if dtype.startswith("decimal")
        else (1, 3)
    )
    df = spark.createDataFrame(
        [(0, one), (1, None), (2, three)], f"i0 long, v {dtype}"
    )
    return Array(df, (3,))


def test_to_hdf5_int64_null_cells_refused(spark, tmp_path):
    from dask_array_spark.sources.hdf5 import to_hdf5

    a = _masked_int_array(spark)
    with pytest.raises(Exception, match="NULL cells .* int64/uint64 HDF5"):
        to_hdf5(a, str(tmp_path / "x.h5"), "/x")


def test_to_hdf5_chunked_int64_null_cells_refused(spark, tmp_path):
    from dask_array_spark.sources.hdf5 import to_hdf5

    a = _masked_int_array(spark)
    with pytest.raises(Exception, match="NULL cells .* int64/uint64 HDF5"):
        to_hdf5(a, str(tmp_path / "x.h5"), "/x", chunks=(2,),
                compression="gzip")


def test_to_hdf5_uint64_null_cells_refused(spark, tmp_path):
    from dask_array_spark.sources.hdf5 import to_hdf5

    a = _masked_int_array(spark, dtype="decimal(20,0)")
    with pytest.raises(Exception, match="NULL cells .* int64/uint64 HDF5"):
        to_hdf5(a, str(tmp_path / "x.h5"), "/x")


def test_to_hdf5_int64_without_nulls_still_roundtrips(spark, tmp_path):
    """The flag-and-coalesce rewrite must not disturb clean int writes
    (values above 2**53 stay exact)."""
    from dask_array_spark.operators import reductions as R
    from dask_array_spark.sources.hdf5 import from_hdf5, to_hdf5
    from dask_array_spark.sources.ingest import from_numpy

    x = np.array([2**53 + 1, -7, 0, 2**62], dtype=np.int64)
    p = str(tmp_path / "ok.h5")
    to_hdf5(from_numpy(spark, x), p, "/x")
    back = from_hdf5(spark, p, "/x")
    assert R.sum(back, axis=None).compute() == int(x.sum())


def test_parse_fill_uint64_rejects_out_of_domain():
    from dask_array_spark.sources.ingest import _parse_fill

    assert _parse_fill(0, "u") == 0
    assert _parse_fill(float(2**53), "u") == 2**53
    assert _parse_fill(str(2**64 - 1), "u") == 2**64 - 1
    for bad in (-5, -3.0, "-1", 2**64, float(2**65)):
        with pytest.raises(ValueError, match=r"\[0, 2\*\*64\)"):
            _parse_fill(bad, "u")


def test_explicit_arrow_serves_null_and_ragged_queries(spark):
    """Explicit impl='arrow' with a query set containing a NULL
    embedding and a ragged (different-length) vector must still run
    the kernel and agree with the SQL form exactly."""
    from dask_array_spark.functions import similarity as SIM

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, [4.0, -1.0, 0.5]),
        (2, None),
        (3, [1.0, 2.0]),
        (4, [-1.0, -2.0, -3.0]),
        (5, [2.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 2, 3]
    a = SIM.cosine_topk(emb, qids, k=3, impl="arrow").orderBy("qid", "rank")
    s = SIM.cosine_topk(emb, qids, k=3, impl="sql").orderBy("qid", "rank")
    ta, ts = [tuple(r) for r in a.collect()], [tuple(r) for r in s.collect()]
    assert ta == ts
    # the ragged query (id 3, len 2) matches ONLY the other len-2 row
    assert [t for t in ta if t[0] == 3] == [
        t for t in ts if t[0] == 3
    ] and any(t[0] == 3 and t[2] == 5 for t in ta)
    # the NULL query (id 2) emits no rows in either form
    assert not any(t[0] == 2 for t in ta)
    # the arrow plan is honored: a mapInArrow scan is present
    assert "mapinarrow" in a._jdf.queryExecution().executedPlan().toString().lower()


def test_arrow_kernel_accepts_huge_vec_ids(spark):
    """vec_id >= 2**40 no longer refuses: threshold pruning carries
    ids verbatim (the round-11 packed key could not)."""
    from dask_array_spark.functions import similarity as SIM

    big = 1 << 50
    rows = [(big + i, [float(i + 1), 1.0, -float(i)]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [big, big + 3]
    a = SIM.cosine_topk(emb, qids, k=4, impl="arrow").orderBy("qid", "rank")
    s = SIM.cosine_topk(emb, qids, k=4, impl="sql").orderBy("qid", "rank")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in s.collect()]


def test_chunk_pass_missing_addr_entry_is_explanatory(spark, tmp_path):
    """A chunk appearing only in pass 2 (nondeterministic source with
    constant encoded size) raises the persist() guidance, not a bare
    KeyError."""
    from dask_array_spark.core.array import Array
    from dask_array_spark.sources import hdf5 as H

    df = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 3.0)], "i0 long, v double")
    a = Array(df, (3,))
    # pass-1 layout that is missing chunk (2,): pass 2 must refuse
    # with the determinism error when it encounters it
    addr_map = {(0,): (4096, 16)}
    p = str(tmp_path / "t.h5")
    with open(p, "wb") as f:
        f.write(b"\0" * 8192)
    with pytest.raises(Exception, match="not deterministic|appeared only"):
        H._chunk_pass(a, (2,), [], filename=p, addr_map=addr_map)
