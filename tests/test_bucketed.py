"""Bucketed tables -> shuffle-free co-located joins (build brief:
'repartition/bucketing for co-located joins').  Writing both fact
tables bucketed by the join key lets Spark plan a SortMergeJoin with
ZERO Exchange on either side -- at 100 TB this removes the dominant
cost of repeated fact-fact joins.  Table data lives under
/root/repo/.tmp (gitignored)."""

import shutil

import pytest
from pyspark.sql import functions as F

WAREHOUSE = "/root/repo/.tmp/bucketed_wh"


@pytest.fixture()
def bucketed(spark, sf_dir):
    from dask_array_spark.sources import read_table

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{WAREHOUSE}/li")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{WAREHOUSE}/ord")
        .saveAsTable("ord_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    shutil.rmtree(WAREHOUSE, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # force the sort-merge path: at test scale Spark would (rightly)
    # broadcast the small side, which hides the property under test --
    # that bucketed layout makes the SMJ itself exchange-free
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("ord_bucketed")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin", 1)[-1]
        assert "SortMergeJoin" in plan
        # neither join input may re-exchange: bucketed layout satisfies
        # the join's distribution requirement directly
        assert "Exchange" not in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    from dask_array_spark.sources import read_table

    li = spark.table("li_bucketed")
    o = spark.table("ord_bucketed")
    got = li.join(o, li.l_orderkey == o.o_orderkey).count()
    want = (
        read_table(spark, sf_dir, "lineitem")
        .join(
            read_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want
