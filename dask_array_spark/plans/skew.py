"""Skew handling: explicit salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- a grouped aggregation whose hot key overwhelms one reducer even
  after map-side partial aggregation (e.g. high-cardinality payloads
  per key), and
- a shuffle join where one key's rows exceed a single task's memory
  and the join is not an AQE-recognized sort-merge shape.

``salted_agg`` does the classic two-stage rewrite: stage 1 aggregates
on (key, salt) spreading the hot key over S reducers, stage 2 merges
the S partials per key -- both stages partial/final hash aggregates.
``salt_join`` replicates the (small) build side S ways and salts the
probe side, so one hot key becomes S co-located sub-joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salt_join"]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    agg_col: str,
    agg: str = "sum",
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: sum/count/min/max over
    ``agg_col`` grouped by ``keys``; the hot key fans over ``salt``
    reducers in stage 1."""
    mergers = {
        "sum": (F.sum, F.sum),
        "count": (lambda c: F.count(c), F.sum),
        "min": (F.min, F.min),
        "max": (F.max, F.max),
    }
    if agg not in mergers:
        raise ValueError(f"unsupported agg {agg!r}")
    stage1_fn, stage2_fn = mergers[agg]
    s1 = (
        df.withColumn("__salt", (F.rand(7) * salt).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(stage1_fn(F.col(agg_col)).alias("__partial"))
    )
    return s1.groupBy(*keys).agg(stage2_fn(F.col("__partial")).alias(agg_col))


def salt_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side ``salt`` ways and
    salt the big side, turning each hot key into ``salt`` co-located
    sub-joins.  The replicated side must be broadcast-sized * salt."""
    spark = big.sparkSession
    salts = spark.range(salt).select(F.col("id").cast("int").alias("__salt_s"))
    b = big.withColumn("__salt_b", (F.rand(11) * salt).cast("int"))
    s = small.crossJoin(F.broadcast(salts))
    joined = b.join(
        s,
        on=[b["__salt_b"] == s["__salt_s"], b[big_key] == s[small_key]],
        how=how,
    )
    return joined.drop("__salt_b", "__salt_s")
