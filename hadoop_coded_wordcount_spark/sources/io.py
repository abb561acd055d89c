"""Non-parquet sources and the sink surface (reference O1 / O11).

The reference reads a text directory (reference WordCountDriver.java:58)
and writes `word TAB count` lines through TextOutputFormat (reference
WordCountDriver.java:59). Spark's readers/writers cover that and more;
these helpers pin the engine's conventions (header/schema discipline,
overwrite semantics) and give the tests one surface to exercise.

Scale notes: text/csv/json are row-oriented interchange formats — fine at
the edges (ingest/export), wrong as the working set (no column pruning, no
predicate pushdown, weak compression). Every pipeline here lands data in
parquet for the analytical middle; ``write_csv`` exists because the
*reference's* sink is a text file, and an engine user may need the same
export. Writers take an explicit partition count only via the DataFrame
the caller passes — repartition before writing to control file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_text",
    "read_csv",
    "read_json",
    "write_parquet",
    "write_csv",
    "write_json",
]


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented scan → one `value: string` row per line (the
    reference's input shape, minus the byte-offset key Spark doesn't
    expose; `F.input_file_name()` covers provenance)."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV scan. An explicit DDL schema keeps types stable; inference
    (schema=None) costs an extra pass and is test-only."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines scan; explicit schema skips inference and keeps nested
    field types deterministic."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """The engine's canonical sink. ``partition_by`` lands a
    hive-partitioned layout — the lever that turns predicate pushdown into
    partition *pruning* at 100 TB (a filter on the partition column skips
    whole directories, not just row groups)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = "\t",
    header: bool = True,
) -> None:
    """Tab-separated text sink — the reference's output format
    (word TAB count, reference WordCountDriver.java:59)."""
    df.write.mode(mode).option("sep", sep).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively; same
    pushdown/pruning machinery as parquet (PushedFilters/ReadSchema)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
