"""Storage-variant normalization for the events ``ts`` column.

read_table must produce an IDENTICAL output contract regardless of how
the parquet file stored timestamps — BIGINT nanoseconds (nanosAsLong),
TIMESTAMP_NTZ, or TIMESTAMP (LTZ):

  * ``ts_ns`` — exact integer epoch nanoseconds, session-zone
    independent (micro-precision storages yield micros * 1000)
  * ``ts``   — plain TIMESTAMP (LTZ) whose underlying epoch micros are
    exact (no double-rounding through ``/``)

The streaming ``_event_time`` helper must agree with the batch path so
windows/watermarks land identically (ADVICE r3: the old ``/1000`` path
routed epoch nanos through double, which has only a 53-bit mantissa).
"""

import os

import pytest
from pyspark.sql import functions as F

from dask_array_spark.sources.ingest import read_table

# epoch micros near "now" (~1.7e18 ns) where double rounding of nanos
# actually bites, plus a value exercising truncation direction
MICROS = [1_700_000_000_000_001, 1_700_000_000_123_456, 1_755_000_000_999_999]


def _write_variants(spark, tmp):
    paths = {}
    base = spark.createDataFrame(
        [(m, "click", float(i)) for i, m in enumerate(MICROS)],
        "us bigint, event_type string, amount double",
    )
    p = os.path.join(tmp, "bigint", "events.parquet")
    base.select(
        (F.col("us") * 1000).alias("ts"), "event_type", "amount"
    ).write.mode("overwrite").parquet(p)
    paths["bigint"] = os.path.dirname(p)

    p = os.path.join(tmp, "ntz", "events.parquet")
    base.select(
        F.expr(
            "timestamp_ntz'1970-01-01 00:00:00'"
            " + make_dt_interval(0, 0, 0, us / 1e6)"
        ).alias("ts"),
        "event_type",
        "amount",
    ).write.mode("overwrite").parquet(p)
    paths["ntz"] = os.path.dirname(p)

    p = os.path.join(tmp, "ltz", "events.parquet")
    base.select(
        F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "amount"
    ).write.mode("overwrite").parquet(p)
    paths["ltz"] = os.path.dirname(p)
    return paths


@pytest.fixture(scope="module")
def variant_dirs(spark, tmp_path_factory):
    return _write_variants(spark, str(tmp_path_factory.mktemp("ts_variants")))


@pytest.mark.parametrize("variant", ["bigint", "ntz", "ltz"])
def test_read_table_ts_contract(spark, variant_dirs, variant):
    df = read_table(spark, variant_dirs[variant], "events")
    types = dict(df.dtypes)
    assert types["ts"] == "timestamp", types
    assert types["ts_ns"] == "bigint", types
    got = sorted(
        r.ts_ns for r in df.select("ts_ns").collect()
    )
    assert got == [m * 1000 for m in MICROS]
    # ts round-trips to the exact same micros (no double rounding)
    micros = sorted(r.m for r in df.select(F.unix_micros("ts").alias("m")).collect())
    assert micros == MICROS


def test_read_table_zone_independent(spark, variant_dirs):
    """ts_ns must not move when the session timezone changes (the LTZ
    cast-to-NTZ pitfall from ADVICE r3)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        out = {}
        for tz in ("UTC", "Pacific/Kiritimati"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for variant in ("ntz", "ltz"):
                df = read_table(spark, variant_dirs[variant], "events")
                out[(tz, variant)] = sorted(
                    r.ts_ns for r in df.select("ts_ns").collect()
                )
        for variant in ("ntz", "ltz"):
            assert out[("UTC", variant)] == out[("Pacific/Kiritimati", variant)]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_stream_event_time_matches_batch(spark, variant_dirs):
    """_event_time (streaming) truncates nanos with integer division,
    agreeing with the batch ts for every storage variant."""
    from dask_array_spark.streaming.events import _event_time

    for variant in ("bigint", "ntz", "ltz"):
        raw = spark.read.parquet(
            os.path.join(variant_dirs[variant], "events.parquet")
        )
        got = sorted(
            r.m
            for r in raw.select(
                F.unix_micros(_event_time(raw)).alias("m")
            ).collect()
        )
        assert got == MICROS, variant
