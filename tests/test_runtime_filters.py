"""Runtime-filtering proofs: dynamic partition pruning + bloom joins.

At 100 TB the fastest byte is the one never read. Two Spark mechanisms
turn a selective dim filter into data skipped on the fact side *at run
time* (Catalyst can't know the surviving keys statically):

* **dynamic partition pruning** — the dim side's filter result becomes an
  IN-subquery on the fact scan's *partition column*; whole partitions are
  skipped before any I/O.
* **runtime bloom filter** — for non-partition join keys: a bloom sketch
  of the dim's keys is built at run time and applied as a semi-filter on
  the fact scan, shrinking the shuffle.

Both are asserted on the physical plan, not timings — layout-dependent
speedups are noise at test scale, the plan shape is the contract.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF001 = "/root/testdata/sf0.01"


def test_dynamic_partition_pruning(spark, tmp_path):
    """A filtered dim joined on the fact's partition column must inject a
    dynamicpruning subquery into the fact scan."""
    fact_dir = str(tmp_path / "lineitem_by_flag")
    load_table(spark, SF001, "lineitem").write.partitionBy(
        "l_returnflag"
    ).parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        ["flag", "label"],
    ).where(F.col("label") == "returned")

    joined = fact.join(
        dim, fact["l_returnflag"] == dim["flag"]
    ).groupBy("flag").agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # and it actually pruned: only the R partition's rows were counted
    [(flag, n)] = [(r.flag, r.n) for r in joined.collect()]
    expected = (
        load_table(spark, SF001, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .count()
    )
    assert (flag, n) == ("R", expected)


def test_runtime_bloom_filter_join(spark):
    """With the runtime bloom filter enabled (thresholds floored so the
    tiny test tables qualify), a selective dim join must plant a
    bloom-filter probe on the fact side."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creation side must be *smaller* than its threshold, application
        # side *larger* than its — widen both so the test tables qualify
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force the non-broadcast path: bloom filters matter for shuffle joins
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        lineitem = load_table(spark, SF001, "lineitem")
        orders = load_table(spark, SF001, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        assert joined.collect()[0].n > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
