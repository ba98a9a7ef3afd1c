"""Table loading for the driver-generated parquet tables (TESTDATA.md).

The reference's "tables" are filesystem listings, XML trees and one SQLite
table (SURVEY.md §1); here every dataset is a parquet-backed DataFrame so
Catalyst gets pushdown/pruning for free. At 100 TB the same loader points at
partitioned parquet/iceberg paths — nothing in the engine assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Driver tables (TESTDATA.md) — TPC-H-ish star schema + events/documents/
#: embeddings extension tables.
TABLE_NAMES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Plain parquet scan → full pushdown support.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
    as a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``); it is
    converted here to a microsecond timestamp — integer-division truncation,
    the same semantics DuckDB applies when reading ns into its µs timestamps.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # Self-heal for caller-provided vanilla sessions: events.parquet stores
    # TIMESTAMP(NANOS), which Spark refuses to read unless nanosAsLong is on.
    # session.get_spark() presets it, but any external SparkSession (e.g. the
    # correctness driver's) would otherwise fail with PARQUET_TYPE_ILLEGAL.
    # The conf is consulted at schema-inference time and captured into the
    # plan (verified: the returned DataFrame executes correctly after the
    # conf reverts), so restore the caller's value instead of leaving a
    # session-wide behavior change behind.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = None
    try:
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
    except Exception:
        pass  # read-only conf entry on some sessions; the read will tell us
    try:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    finally:
        try:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        except Exception:
            pass
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver tables as a dict (lazy scans; nothing materializes)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql() use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
