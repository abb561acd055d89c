"""KMV sketch: strategy equivalence, accuracy, mergeability, exact tier."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_coded_wordcount_spark.operators import sketches as sk
from hadoop_coded_wordcount_spark.sources.catalog import load_table

from conftest import SF001


def _orders(spark):
    return load_table(spark, SF001, "orders")


def test_window_and_partial_strategies_bit_identical(spark):
    """The retained set is a pure function of the value set, so the JVM
    window path and the mapInPandas partial-merge path must agree to the
    last bit — any partitioning dependence is a bug."""
    a = {
        r["o_orderpriority"]: (r["retained"], r["kmv_est"])
        for r in sk.kmv_distinct(_orders(spark), "o_orderpriority", "o_custkey").collect()
    }
    b = {
        r["o_orderpriority"]: (r["retained"], r["kmv_est"])
        for r in sk.kmv_distinct_partial(
            _orders(spark), "o_orderpriority", "o_custkey"
        ).collect()
    }
    assert a == b and len(a) == 5


def test_partial_strategy_partitioning_invariant(spark):
    base = _orders(spark)
    one = sk.kmv_distinct_partial(base.coalesce(1), "o_orderpriority", "o_custkey")
    many = sk.kmv_distinct_partial(
        base.repartition(13), "o_orderpriority", "o_custkey"
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_estimate_within_kmv_error_bounds(spark):
    """k=256 → standard error ~1/16; assert a generous 4-sigma 25%."""
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in _orders(spark)
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    est = sk.kmv_distinct(_orders(spark), "o_orderpriority", "o_custkey").collect()
    assert len(est) == len(exact)
    for r in est:
        true = exact[r["o_orderpriority"]]
        assert abs(r["kmv_est"] - true) / true < 0.25, (r, true)


def test_small_groups_are_exact(spark):
    """retained < k ⇒ the sketch degrades to an exact distinct count."""
    small = _orders(spark).limit(200)
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in small.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for r in sk.kmv_distinct(small, "o_orderpriority", "o_custkey").collect():
        assert r["retained"] < sk.DEFAULT_K
        assert r["kmv_est"] == float(exact[r["o_orderpriority"]])


def test_merge_estimates_global_distinct(spark):
    """Union of per-group sketches estimates the GLOBAL cardinality
    without a rescan, and matches a single-group sketch over the same
    data (theta-union semantics)."""
    merged = sk.kmv_merge(_orders(spark), "o_orderpriority", "o_custkey").collect()[0]
    whole = (
        sk.kmv_distinct(
            _orders(spark).withColumn("one", F.lit("all")), "one", "o_custkey"
        ).collect()[0]
    )
    assert merged["kmv_est"] == whole["kmv_est"]
    true = _orders(spark).select("o_custkey").distinct().count()
    assert abs(merged["kmv_est"] - true) / true < 0.25
