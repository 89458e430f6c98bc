"""Skew utilities: salted rewrites must be result-identical to the
plain plans on a deliberately skewed dataset (90% of rows on one
key)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 100k rows, 90% land on key 0
    d = spark.range(100_000).select(
        F.when(F.rand(3) < 0.9, F.lit(0))
        .otherwise((F.rand(5) * 1000).cast("long"))
        .alias("k"),
        (F.rand(9) * 100).alias("x"),
    )
    return d.persist()


def test_salted_agg_matches_plain(spark, skewed):
    from dask_array_spark.plans.skew import salted_agg

    got = {
        r["k"]: r["x"]
        for r in salted_agg(skewed, ["k"], "x", "sum", salt=16).collect()
    }
    want = {
        r["k"]: r["s"]
        for r in skewed.groupBy("k").agg(F.sum("x").alias("s")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6 * max(1.0, abs(want[k]))


def test_salt_join_matches_plain(spark, skewed):
    from dask_array_spark.plans.skew import salt_join

    dim = spark.range(1000).select(
        F.col("id").alias("dk"), (F.col("id") * 2).alias("payload")
    )
    got = salt_join(skewed, dim, "k", "dk", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p")
    ).collect()[0]
    want = skewed.join(dim, skewed.k == dim.dk).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p")
    ).collect()[0]
    assert got["n"] == want["n"] and got["p"] == want["p"]
