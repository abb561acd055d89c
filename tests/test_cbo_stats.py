"""Cost-based optimizer surface: ANALYZE TABLE statistics reach the plan.

Catalyst is rule-based by default; with CBO on, table/column statistics
from ``ANALYZE TABLE`` feed cardinality estimates that drive join-side
selection and join reordering. At 100 TB, stats are the difference
between broadcasting a filtered dim (right) and shuffling both sides
(wrong) when the filter's selectivity is only knowable from data.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"


def test_analyze_table_stats_reach_the_optimizer(spark, tmp_path):
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        (
            load_table(spark, SF0001, "orders")
            .write.option("path", str(tmp_path / "t_orders"))
            .mode("overwrite")
            .saveAsTable("t_orders_stats")
        )
        spark.sql(
            "ANALYZE TABLE t_orders_stats COMPUTE STATISTICS "
            "FOR COLUMNS o_orderkey, o_orderpriority"
        )

        expected = spark.table("t_orders_stats").count()
        stats = (
            spark.table("t_orders_stats")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        # row count came from ANALYZE (without it, only sizeInBytes exists)
        assert stats.rowCount().isDefined()
        assert int(str(stats.rowCount().get())) == expected

        # column-level stats (distinct counts) recorded for the join key
        desc = {
            r.info_name: r.info_value
            for r in spark.sql(
                "DESCRIBE EXTENDED t_orders_stats o_orderkey"
            ).collect()
        }
        assert int(desc["distinct_count"]) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_stats")
        spark.conf.set("spark.sql.cbo.enabled", old)
