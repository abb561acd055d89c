"""Bucketing: the 100 TB lever the join docstrings point at — co-locating
both sides of a fact-fact join on the join key removes the Exchange
entirely. Proven here on a real saveAsTable round-trip."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """At sf0.001 AQE would broadcast either side; pin the strategy to
    sort-merge so the test isolates what bucketing does to the Exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed, no_broadcast):
    orders, lineitem = bucketed
    joined = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_quantity", "o_orderpriority")
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
    assert "SortMergeJoin" in plan


def test_unbucketed_join_does_exchange(spark, no_broadcast):
    """Control: the same join over raw parquet shuffles both sides."""
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    joined = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_quantity", "o_orderpriority")
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_bucketed_results_match_unbucketed(spark, bucketed):
    b_orders, b_lineitem = bucketed
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")

    def agg(o, l):
        return {
            (r.o_orderpriority, r.cnt)
            for r in l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

    assert agg(b_orders, b_lineitem) == agg(orders, lineitem)
