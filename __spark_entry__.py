"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``hadoop_coded_wordcount_spark.registry``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_coded_wordcount_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (word count, the reference's whole surface) on sf0.001.

    Emits the communication-load profile (the reference's PACKETS_SENT
    counter surface, reference WordCountDriver.java:17-20) to stderr
    before returning the DataFrame for the driver to collect.
    """
    import json
    import sys

    from hadoop_coded_wordcount_spark.plans.metrics import run_with_metrics

    df = registry.QUERIES["wordcount"](spark, "/root/testdata/sf0.001")
    # persist BEFORE the metrics materialization: the driver collects the
    # returned frame afterwards, and without the cache that second action
    # would re-execute the whole plan (doubling entry latency).
    df = df.persist()
    print(
        "entry metrics: " + json.dumps(run_with_metrics(df)), file=sys.stderr
    )
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracled query."""
    return dict(registry.ORACLES)
