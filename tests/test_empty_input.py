"""Empty-input robustness: every registry query must *plan and execute*
on zero-row tables without raising.

A 100 TB pipeline routinely sees empty slices — an empty date partition,
a filter that matches nothing, a new tenant with no documents. Operators
that crash on emptiness (numpy reshape of a zero batch, division by a
zero norm, argmax of nothing) fail exactly when a scheduler retries a
fully-filtered split. Results may legitimately be empty; exceptions are
the bug.
"""

from __future__ import annotations

import os

import pytest
from conftest import registry_sample

from hadoop_coded_wordcount_spark.registry import QUERIES
from hadoop_coded_wordcount_spark.sources.catalog import TABLES, load_table

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor directory with every table present but zero rows.

    Tables are written from the RAW scan, not load_table's output —
    load_table('events') converts int64-nanos→NTZ, and an already-
    converted empty file would present the wrong physical schema back to
    load_table (the real empty-partition case keeps the raw layout).
    """
    from hadoop_coded_wordcount_spark.sources.catalog import _SCAN_CONFS

    for k, v in _SCAN_CONFS.items():  # raw events scan needs nanosAsLong
        spark.conf.set(k, v)
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        spark.read.parquet(os.path.join(SF0001, f"{t}.parquet")).limit(
            0
        ).write.parquet(os.path.join(str(d), f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize(
    # Tiering (r13): full registry with SPARK_GRAFT_FULL_SUITE=1; a
    # deterministic 40-query sample by default so the suite fits the
    # driver's verify window (see conftest.registry_sample).
    "name",
    registry_sample(sorted(QUERIES), k=40, salt="empty_input"),
)
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    rows = QUERIES[name](spark, empty_sf_dir).collect()
    assert isinstance(rows, list)  # executed end-to-end; emptiness is fine
    spark.catalog.clearCache()
