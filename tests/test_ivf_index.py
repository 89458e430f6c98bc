"""Cell-partitioned IVF index persistence (round 13, verdict ask 2):
ivf_write_index lays the assignment index out one directory per
cell, so the serving tiers' probed-cell restriction becomes a
PARTITION filter -- whole directories pruned at planning time, the
100-TB IO claim SCALE.md's finding 4 rests on.  Pinned here at three
levels: the PartitionFilters entry in the plan (not just
PushedFilters), the runtime numFiles/filesSize scan metrics reading
only the probed cells' files, and value round-trip parity."""

from __future__ import annotations

import os

import pytest


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
def index_path(spark, emb, tmp_path_factory):
    from dask_array_spark.functions.similarity import ivf_assign, ivf_write_index

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_write_index(ivf_assign(emb, n_cells=4), path)
    return path


def _index_scan_metrics(df, path_frag):
    """(numFiles, filesSize) of every executed-plan parquet scan whose
    location matches ``path_frag`` -- runtime evidence that partition
    pruning actually shrank the read, not just the plan text."""
    ep = df._jdf.queryExecution().executedPlan()
    found = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            walk(node.child())
            return
        if cls == "FileSourceScanExec" and path_frag in node.toString():
            m = node.metrics()
            found.append(
                (int(m.apply("numFiles").value()),
                 int(m.apply("filesSize").value()))
            )
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(ep)
    return found


def _cell_files(path):
    """{cell: (n_files, bytes)} from the partitioned layout on disk."""
    out = {}
    for entry in os.listdir(path):
        if not entry.startswith("cell="):
            continue
        cdir = os.path.join(path, entry)
        files = [
            f for f in os.listdir(cdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        out[int(entry.split("=", 1)[1])] = (
            len(files),
            sum(os.path.getsize(os.path.join(cdir, f)) for f in files),
        )
    return out


def test_index_roundtrip(spark, emb, index_path):
    from dask_array_spark.functions.similarity import ivf_assign, ivf_read_index

    back = ivf_read_index(spark, index_path)
    assert dict(back.dtypes) == {"vec_id": "bigint", "cell": "bigint"}
    want = {(r["vec_id"], r["cell"]) for r in ivf_assign(emb, 4).collect()}
    assert {(r["vec_id"], r["cell"]) for r in back.collect()} == want


def test_probe_filter_is_partition_filter(spark, emb, index_path):
    """EVERY cell-blocked serving tier's `cell IN (probed)`
    restriction must land in PartitionFilters on the partitioned
    layout -- directory pruning, the planning-time half of the IO
    claim -- because they all share the same assign-filter shape."""
    from dask_array_spark.functions import similarity as SIM

    assign = SIM.ivf_read_index(spark, index_path)
    sq = SIM.sq8_encode(emb).localCheckpoint()
    pqc = SIM.pq_train(emb, dim=64, m=4, n_codes=4, iters=1)
    packed = SIM.pq_pack(SIM.pq_encode(emb, pqc, dim=64, m=4))
    for df in (
        SIM.ivf_topk(emb, [0, 1], k=3, n_cells=4, n_probe=2,
                     assign=assign, impl="arrow"),
        SIM.ivf_sq8_topk(emb, [0, 1], k=3, n_cells=4, n_probe=2,
                         assign=assign, codes=sq, impl="arrow"),
        SIM.ivf_pq_topk(emb, [0, 1], pqc, dim=64, m=4, k=3, n_cells=4,
                        n_probe=2, assign=assign, codes=packed,
                        impl="arrow"),
    ):
        fmt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        scan = next(
            b for b in fmt.split("\n\n")
            if "ivf" in b and "PartitionFilters" in b
        )
        pf = next(l for l in scan.splitlines() if "PartitionFilters" in l)
        assert "cell" in pf and " IN (" in pf, pf
        # and NOT a row-level pushed filter doing the same work twice
        assert "Location: InMemoryFileIndex" in scan


def test_pruned_scan_reads_only_probed_cells(spark, emb, index_path):
    """Runtime half: the executed scan's numFiles/filesSize metrics
    equal the probed cells' on-disk files exactly -- bytes read shrink
    by ~n_probe/n_cells, never 'read everything, filter rows'."""
    from dask_array_spark.functions.similarity import (
        _probe_cells, _codebook, ivf_read_index, ivf_topk,
    )
    from pyspark.sql import functions as F

    assign = ivf_read_index(spark, index_path)
    qids = [0, 1]
    df = ivf_topk(emb, qids, k=3, n_cells=4, n_probe=2,
                  assign=assign, impl="arrow")
    df.collect()
    # probed cells, recomputed independently of the serving plan
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
    per_cell = _cell_files(index_path)
    assert probed and set(per_cell) - probed, (
        "fixture degenerate: probes cover every cell, nothing to prune"
    )
    want_files = sum(per_cell[c][0] for c in probed)
    want_bytes = sum(per_cell[c][1] for c in probed)
    total_bytes = sum(b for _, b in per_cell.values())
    metrics = _index_scan_metrics(df, "ivf")
    assert metrics, "no index scan found in the executed plan"
    got_files, got_bytes = metrics[0]
    assert got_files == want_files
    assert got_bytes == want_bytes < total_bytes


def test_streaming_intake_feeds_partitioned_index(spark, emb, tmp_path):
    """The intake composition: stream_codebook_assign's (vec_id, cell)
    output lands through ivf_write_index and serves with pruning --
    the write path accepts any (vec_id, cell)-bearing relation."""
    from dask_array_spark.functions.similarity import (
        ivf_assign, ivf_read_index, ivf_write_index,
    )

    path = str(tmp_path / "idx2")
    # extra column dropped by the projection inside the writer
    from pyspark.sql import functions as F

    ivf_write_index(
        ivf_assign(emb, n_cells=4).withColumn("junk", F.lit("x")), path
    )
    back = ivf_read_index(spark, path)
    assert back.columns == ["vec_id", "cell"]
    assert back.count() == emb.count()
