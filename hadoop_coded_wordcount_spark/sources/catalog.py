"""Table catalog: loaders for the driver's parquet tables.

The reference's only "catalog" is a hard-coded XML block-location file
(reference BlockLocationInfo.xml:1-37, parsed by FileLocationsLookup.java:20-60).
Here the catalog is the parquet directory itself: self-describing schemas,
columnar scans with predicate pushdown and column pruning for free.

At 100 TB each table would be a partitioned/ bucketed parquet (or Iceberg)
layout; the loader API is unchanged — only the path changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that are always broadcast-join candidates.
#: At TPC-H-like scale these stay tiny (region=5, nation=25) regardless of SF.
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Columnar parquet scan → Catalyst prunes columns and
    pushes predicates down to the reader (visible as PushedFilters/ReadSchema
    in ``.explain``)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark reads as raw
        # int64 nanos (spark.sql.legacy.parquet.nanosAsLong). Convert to a
        # naive (NTZ) microsecond timestamp so values line up with DuckDB's
        # TIMESTAMP semantics. Session tz is UTC, so the cast is lossless.
        df = df.withColumn(
            "ts",
            F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
