"""SparkSession helpers.

The engine itself never creates a session implicitly -- every public
entry point takes an existing ``SparkSession`` (mirroring how the
reference delegates execution to whatever dask scheduler is active,
/root/reference/dask_array/_collection.py:282).  ``get_spark`` is a
convenience for tests / bench only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dask-array-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local session tuned like a scaled-down cluster.

    Defaults follow the driver contract: ``local[$SPARK_GRAFT_CPUS]``
    (default 32) with ``spark.sql.shuffle.partitions`` matched to core
    count.  AQE stays on so plans re-shape at runtime the way they
    would on a real cluster (partition coalescing, skew joins, dynamic
    broadcast) -- the reference's rechunk/unify planners are subsumed
    by exactly these features (SURVEY.md section 4.2).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas boundary (block-form
        # kernels, compute()); row-at-a-time transfer is never used.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The engine encodes NaN as NULL and does its own propagation
        # (NumPy semantics, SURVEY.md section 7 "hard parts"); ANSI
        # error-on-overflow/div-zero would diverge from both NumPy and
        # the DuckDB oracle, so run in permissive mode.
        .config("spark.sql.ansi.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as BIGINT nanoseconds and convert in
        # sources.ingest.events_with_ts (driver-owned testdata, TESTDATA.md).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
