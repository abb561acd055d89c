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


def test_aqe_splits_skewed_join(spark):
    """AQE skew handling: a hot key that dwarfs every other partition gets
    split at runtime (skew=true on the sort-merge join) instead of pinning
    one straggler task. Thresholds are lowered to make toy data 'skewed';
    at 100 TB the defaults fire the same mechanism."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))  # 90% of rows on key 1
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.createDataFrame(
            [(i, f"dim{i}") for i in range(1, 50)], ["k", "name"]
        )
        joined = left.join(right, "k").select("k", "payload", "name")
        # execute THIS DataFrame's QueryExecution (a .count() would plan a
        # separate one and leave this plan non-final)
        joined._jdf.queryExecution().toRdd().count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed side:\n{plan}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_registry_skew_query_splits_under_aqe(spark):
    """The REGISTRY skew query (skewed_join_rollup: 90% of lineitem on one
    nation key, merge-hinted SMJ) gets skew-split by AQE. Thresholds are
    lowered so sf0.01 bytes count as skewed; the defaults fire the same
    mechanism at production sizes. (The hot partition compresses to
    ~12 KB at sf0.01, hence the 8k threshold here.)"""
    from hadoop_coded_wordcount_spark.registry import QUERIES

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = QUERIES["skewed_join_rollup"](spark, "/root/testdata/sf0.01")
        df._jdf.queryExecution().toRdd().count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the hot key:\n{plan}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
