"""Cell-partitioned CODES-index persistence (round 13):
pq_write_index / sq8_write_index land the packed PQ / int8 codes one
parquet directory per cell -- ivf_write_index's layout moved onto the
relation that actually dominates serving IO -- so the composed tiers'
probed restriction becomes a PARTITION filter on the CODES scan
itself and the per-query assign-to-codes join disappears (the index
embeds the assignment).  Pinned at the same three levels as the
assignment index: PartitionFilters in the plan, runtime
numFiles/filesSize scan metrics equal to the probed cells' on-disk
files, and value parity with the assign+packed serving form."""

from __future__ import annotations

import pytest

from test_ivf_index import _cell_files, _index_scan_metrics

DIM, M = 64, 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pqc(emb):
    from dask_array_spark.functions.similarity import pq_train

    return pq_train(emb, dim=DIM, m=M, n_codes=4, iters=1).localCheckpoint()


@pytest.fixture(scope="module")
def packed(emb, pqc):
    from dask_array_spark.functions.similarity import pq_encode, pq_pack

    df = pq_pack(pq_encode(emb, pqc, dim=DIM, m=M)).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def assign(emb):
    from dask_array_spark.functions.similarity import ivf_assign

    df = ivf_assign(emb, n_cells=4).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pq_index_path(emb, packed, assign, tmp_path_factory):
    from dask_array_spark.functions.similarity import pq_write_index

    path = str(tmp_path_factory.mktemp("pqidx") / "index")
    pq_write_index(packed, assign, path)
    return path


@pytest.fixture(scope="module")
def sq8_index_path(emb, assign, tmp_path_factory):
    from dask_array_spark.functions.similarity import sq8_encode, sq8_write_index

    path = str(tmp_path_factory.mktemp("sq8idx") / "index")
    sq8_write_index(sq8_encode(emb), assign, path)
    return path


def test_pq_index_roundtrip(spark, packed, assign, pq_index_path):
    from dask_array_spark.functions.similarity import pq_read_index

    back = pq_read_index(spark, pq_index_path)
    assert dict(back.dtypes) == {
        "vec_id": "bigint", "codes": "array<bigint>", "cell": "bigint",
    }
    want = {
        (r["vec_id"], tuple(r["codes"]), r["cell"])
        for r in packed.join(assign, on="vec_id").collect()
    }
    got = {
        (r["vec_id"], tuple(r["codes"]), r["cell"]) for r in back.collect()
    }
    assert got == want


def test_sq8_index_roundtrip(spark, emb, assign, sq8_index_path):
    from dask_array_spark.functions.similarity import sq8_encode, sq8_read_index

    back = sq8_read_index(spark, sq8_index_path)
    assert dict(back.dtypes) == {
        "vec_id": "bigint", "scale": "double", "q": "array<int>",
        "nrm": "double", "cell": "bigint",
    }
    want = {
        (r["vec_id"], r["scale"], tuple(r["q"]), r["nrm"], r["cell"])
        for r in sq8_encode(emb).join(assign, on="vec_id").collect()
    }
    got = {
        (r["vec_id"], r["scale"], tuple(r["q"]), r["nrm"], r["cell"])
        for r in back.collect()
    }
    assert got == want


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_ivf_pq_from_index_matches_assign_form(
    spark, emb, pqc, packed, assign, pq_index_path, impl
):
    """Serving from the cell-partitioned codes index (no assign
    argument at all) is bit-identical to the assign+packed form, on
    both serving forms, with and without the exact re-rank."""
    from dask_array_spark.functions.similarity import ivf_pq_topk, pq_read_index

    idx = pq_read_index(spark, pq_index_path)
    for rerank in (None, 2):
        want = [
            tuple(r)
            for r in ivf_pq_topk(
                emb, [0, 1, 5], pqc, dim=DIM, m=M, k=3, n_cells=4,
                n_probe=2, assign=assign, codes=packed, rerank=rerank,
                impl=impl,
            ).collect()
        ]
        got = [
            tuple(r)
            for r in ivf_pq_topk(
                emb, [0, 1, 5], pqc, dim=DIM, m=M, k=3, n_cells=4,
                n_probe=2, codes=idx, rerank=rerank, impl=impl,
            ).collect()
        ]
        assert sorted(got) == sorted(want)


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_ivf_sq8_from_index_matches_assign_form(
    spark, emb, assign, sq8_index_path, impl
):
    from dask_array_spark.functions.similarity import (
        ivf_sq8_topk, sq8_encode, sq8_read_index,
    )

    idx = sq8_read_index(spark, sq8_index_path)
    codes = sq8_encode(emb)
    want = [
        tuple(r)
        for r in ivf_sq8_topk(
            emb, [2, 4], k=3, n_cells=4, n_probe=2,
            assign=assign, codes=codes, impl=impl,
        ).collect()
    ]
    got = [
        tuple(r)
        for r in ivf_sq8_topk(
            emb, [2, 4], k=3, n_cells=4, n_probe=2, codes=idx, impl=impl,
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_codes_probe_filter_is_partition_filter(
    spark, emb, pqc, pq_index_path, sq8_index_path
):
    """Both composed tiers fed their cell-partitioned codes index must
    carry the probed `cell IN (...)` restriction as a PartitionFilters
    entry on the CODES scan -- directory pruning on the serving-IO
    relation, and no assign join anywhere in the plan."""
    from dask_array_spark.functions import similarity as SIM

    for df, frag in (
        (
            SIM.ivf_pq_topk(
                emb, [0, 1], pqc, dim=DIM, m=M, k=3, n_cells=4, n_probe=2,
                codes=SIM.pq_read_index(spark, pq_index_path), impl="arrow",
            ),
            "pqidx",
        ),
        (
            SIM.ivf_sq8_topk(
                emb, [0, 1], k=3, n_cells=4, n_probe=2,
                codes=SIM.sq8_read_index(spark, sq8_index_path),
                impl="arrow",
            ),
            "sq8idx",
        ),
    ):
        fmt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        scan = next(
            b for b in fmt.split("\n\n")
            if frag in b and "PartitionFilters" in b
        )
        pf = next(l for l in scan.splitlines() if "PartitionFilters" in l)
        assert "cell" in pf and " IN (" in pf, pf


def test_pq_index_scan_reads_only_probed_cells(
    spark, emb, pqc, pq_index_path
):
    """Runtime half on the codes relation: the executed codes scan's
    numFiles/filesSize equal the probed cells' on-disk files exactly."""
    from pyspark.sql import functions as F

    from dask_array_spark.functions.similarity import (
        _codebook, _probe_cells, ivf_pq_topk, pq_read_index,
    )

    qids = [0, 1]
    df = ivf_pq_topk(
        emb, qids, pqc, dim=DIM, m=M, k=3, n_cells=4, n_probe=2,
        codes=pq_read_index(spark, pq_index_path), impl="arrow",
    )
    df.collect()
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.sqrt(F.aggregate(
            "qemb", F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )).alias("qnrm"),
    )
    probed = {
        int(r["cell"])
        for r in _probe_cells(q, _codebook(emb, 4), 2).collect()
    }
    per_cell = _cell_files(pq_index_path)
    assert probed and set(per_cell) - probed, (
        "fixture degenerate: probes cover every cell, nothing to prune"
    )
    want_files = sum(per_cell[c][0] for c in probed)
    want_bytes = sum(per_cell[c][1] for c in probed)
    total_bytes = sum(b for _, b in per_cell.values())
    metrics = _index_scan_metrics(df, "pqidx")
    assert metrics, "no codes-index scan found in the executed plan"
    got_files, got_bytes = metrics[0]
    assert got_files == want_files
    assert got_bytes == want_bytes < total_bytes


def test_files_per_cell_bounds_fanout(spark, emb, packed, assign, tmp_path):
    """files_per_cell is the production-ingest knob r13_codes_prune
    motivates: partitionBy emits one file per (task, cell), so an
    unbounded write scatters each cell across the whole shuffle
    width; the bounded layout must cap per-cell files while keeping
    values identical."""
    from dask_array_spark.functions.similarity import (
        ivf_write_index, pq_read_index, pq_write_index,
    )

    wide, tight = str(tmp_path / "wide"), str(tmp_path / "tight")
    pq_write_index(packed, assign, wide)
    pq_write_index(packed, assign, tight, files_per_cell=2)
    for cell, (nf, _) in _cell_files(tight).items():
        assert nf <= 2, f"cell {cell}: {nf} files"
    assert sum(nf for nf, _ in _cell_files(wide).values()) >= sum(
        nf for nf, _ in _cell_files(tight).values()
    )
    a = {
        (r["vec_id"], tuple(r["codes"]), r["cell"])
        for r in pq_read_index(spark, wide).collect()
    }
    b = {
        (r["vec_id"], tuple(r["codes"]), r["cell"])
        for r in pq_read_index(spark, tight).collect()
    }
    assert a == b

    with pytest.raises(ValueError, match="files_per_cell"):
        ivf_write_index(assign, str(tmp_path / "bad"), files_per_cell=0)
