"""Source/sink round-trips (reference O1/O11) and the new join shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.operators import relational as rel
from hadoop_coded_wordcount_spark.operators import wordcount as wc
from hadoop_coded_wordcount_spark.sources import io as sio
from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"


def test_csv_sink_roundtrip_wordcount(spark, tmp_path):
    """The reference's sink: word TAB count lines. Write, read back with an
    explicit schema, compare exactly."""
    out = str(tmp_path / "wc_csv")
    counts = wc.wordcount(load_table(spark, SF0001, "documents"))
    sio.write_csv(counts, out)
    back = sio.read_csv(spark, out, schema="word string, cnt bigint", sep="\t")
    assert {(r.word, r.cnt) for r in back.collect()} == {
        (r.word, r.cnt) for r in counts.collect()
    }


def test_parquet_sink_partitioned_roundtrip(spark, tmp_path):
    out = str(tmp_path / "orders_pq")
    orders = load_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    sio.write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: a filter on the partition column must prune files
    pruned = back.where(F.col("o_orderstatus") == "F")
    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == expected
    plan = pruned.explain if False else pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_json_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "nation_json")
    nation = load_table(spark, SF0001, "nation")
    sio.write_json(nation, out)
    back = sio.read_json(
        spark, out, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    assert {tuple(r) for r in back.select(*nation.columns).collect()} == {
        tuple(r) for r in nation.collect()
    }


def test_text_source_wordcount_equivalence(spark, tmp_path):
    """Reading the corpus as raw text lines (the reference's actual input
    format) must produce the same word counts as the parquet path."""
    out = str(tmp_path / "lines")
    docs = load_table(spark, SF0001, "documents")
    docs.select("text").write.mode("overwrite").text(out)
    lines = sio.read_text(spark, out).withColumnRenamed("value", "text")
    from_text = {(r.word, r.cnt) for r in wc.wordcount(lines).collect()}
    from_parquet = {(r.word, r.cnt) for r in wc.wordcount(docs).collect()}
    assert from_text == from_parquet


def test_join_asof_semantics(spark):
    rows = [
        (1, "2024-01-01 09:00:00", 1, "view"),
        (2, "2024-01-01 09:05:00", 1, "click"),  # matches view 1
        (3, "2024-01-01 09:10:00", 1, "view"),
        (4, "2024-01-01 09:10:00", 1, "click"),  # tie -> matches view 3
        (5, "2024-01-01 08:00:00", 2, "click"),  # no prior view -> dropped
        (6, "2024-01-01 10:00:00", 2, "view"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts_str", "user_id", "event_type"]
    ).select(
        "event_id",
        F.col("ts_str").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    out = {r.click_id: (r.view_id, r.gap_sec) for r in rel.join_asof(events).collect()}
    assert out == {2: (1, 300), 4: (3, 0)}


def test_orc_sink_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip preserves values, and predicates push to the ORC
    reader just like parquet."""
    from hadoop_coded_wordcount_spark.sources import io as sio

    orders = load_table(spark, SF0001, "orders")
    path = str(tmp_path / "orders_orc")
    sio.write_orc(orders.select("o_orderkey", "o_totalprice", "o_orderstatus"), path)

    back = sio.read_orc(spark, path)
    assert back.count() == orders.count()
    want = orders.where(F.col("o_orderstatus") == "O").count()
    q = back.where(F.col("o_orderstatus") == "O")
    assert q.count() == want
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)" in plan


def test_register_views_sql_frontend(spark):
    """register_views exposes every table to spark.sql; a multi-table SQL
    join over the views must match the DataFrame-API twin."""
    from hadoop_coded_wordcount_spark.sources.catalog import register_views

    register_views(spark, SF0001)
    got = {
        (r.r_name, r.n)
        for r in spark.sql(
            """SELECT r_name, COUNT(*) AS n
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY r_name"""
        ).collect()
    }
    from hadoop_coded_wordcount_spark.operators.relational import join_broadcast

    want = {
        (r.r_name, r.num_customers)
        for r in join_broadcast(
            load_table(spark, SF0001, "nation"),
            load_table(spark, SF0001, "region"),
            load_table(spark, SF0001, "customer"),
        ).collect()
    }
    assert got == want


def test_max_partition_bytes_splits_scan(spark, tmp_path):
    """Scan parallelism must follow spark.sql.files.maxPartitionBytes —
    the spill-aware sizing knob: shrink it and one file becomes many
    input splits (row-group granularity)."""
    path = str(tmp_path / "li_smallgroups")
    (
        load_table(spark, "/root/testdata/sf0.01", "lineitem")
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)  # tiny row groups
        .parquet(path)
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
        many = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        one = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert one == 1
    assert many > 4  # split into many row-group-aligned partitions


def test_merge_schema_reads_evolved_layout(spark, tmp_path):
    """Schema evolution: files written before a column existed read back
    null-padded under mergeSchema — the append-only data-lake pattern."""
    base = tmp_path / "evolved"
    v1 = load_table(spark, SF0001, "orders").select("o_orderkey", "o_totalprice")
    v2 = load_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.parquet(str(base / "p=1"))
    v2.write.parquet(str(base / "p=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(base))
    assert set(merged.columns) >= {"o_orderkey", "o_totalprice", "o_orderpriority"}
    n_total = v1.count() + v2.count()
    assert merged.count() == n_total
    # rows from the old layout carry NULL in the new column
    assert merged.where(F.col("o_orderpriority").isNull()).count() == v1.count()
