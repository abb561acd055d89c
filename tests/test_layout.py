"""Z-order layout: multi-dimensional filters must skip most of a
clustered table's files via parquet min/max statistics, where the same
filter over an unclustered (hash-random) layout reads everything."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.sources.layout import write_zordered, zvalue


def _scan_rows(spark, path, predicate):
    """Rows the parquet scan actually produced (post row-group/file skip,
    pre nothing else) — the FileSourceScan's numOutputRows."""
    df = spark.read.parquet(path).where(predicate)
    df._jdf.queryExecution().toRdd().count()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
            return
        if "QueryStage" in cls:
            yield from walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    for n in walk(plan):
        if "FileSourceScan" in n.getClass().getSimpleName():
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    return kv._2().value()
    raise AssertionError("no FileSourceScan found")


def test_zvalue_interleaves_bits(spark):
    # bit k of column a lands at position 2k, of b at 2k+1:
    # a=3 (bits 0,1) -> positions 0,2 ; b=5 (bits 0,2) -> positions 1,5
    # z = 1 + 2 + 4 + 32 = 39
    df = spark.createDataFrame([(3, 5)], ["a", "b"])
    z = df.select(zvalue(["a", "b"], bits=4).alias("z")).collect()[0].z
    assert z == 39


def test_zorder_prunes_multidim_filters(spark, tmp_path):
    # two independent dimensions in [0, 1024) — exactly the 10-bit budget
    # (values beyond the budget would wrap on the curve and lose locality)
    n = 40_000
    base = (
        spark.range(n)
        .select(
            F.pmod(F.hash("id"), F.lit(1024)).alias("x"),
            F.pmod(F.hash(F.col("id") * 7 + 3), F.lit(1024)).alias("y"),
            F.col("id").alias("payload"),
        )
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    # unclustered control: hash-shuffled into the same file count
    base.repartition(16).write.mode("overwrite").parquet(plain)
    write_zordered(base, zed, ["x", "y"], n_files=16, bits=10)

    pred = (
        (F.col("x") >= 100) & (F.col("x") < 200)
        & (F.col("y") >= 300) & (F.col("y") < 400)
    )
    rows_plain = _scan_rows(spark, plain, pred)
    rows_zed = _scan_rows(spark, zed, pred)
    # same query answer on both layouts
    a = spark.read.parquet(plain).where(pred).count()
    b = spark.read.parquet(zed).where(pred).count()
    assert a == b
    # the clustered layout's scan must skip most of the data the
    # unclustered one reads (file/row-group stats pruning)
    assert rows_zed < rows_plain / 2, (rows_zed, rows_plain)


def test_compact_small_files(spark, tmp_path):
    """A 64-file fragmented table compacts to the byte-targeted count and
    round-trips every row."""
    from hadoop_coded_wordcount_spark.sources.layout import compact_small_files

    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    base = spark.range(200_000).withColumn("v", F.col("id") * 2)
    base.repartition(64).write.parquet(src)

    import glob
    n_src = len(glob.glob(src + "/*.parquet"))
    assert n_src == 64

    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(src + "/*.parquet")
    )
    n_out = compact_small_files(spark, src, dest, target_file_bytes=total // 4)
    assert n_out <= 5  # ceil(total / (total/4)) = 4 (+1 rounding slack)
    got = spark.read.parquet(dest)
    assert got.count() == 200_000
    assert got.agg(F.sum("v")).collect()[0][0] == base.agg(F.sum("v")).collect()[0][0]
