"""Continuous aggregate (hypertable-style rollup) — an incrementally
maintained materialized view over event time.

The generalization of the reference's incremental loop (T1/T4: redo only
what changed, rely on idempotent writes): an hourly rollup materialized as
hive-partitioned parquet where a refresh recomputes ONLY the hour
partitions touched by new data — dynamic partition overwrite replaces
exactly those directories atomically-per-partition and never rewrites
history. Readers see the rollup as a plain partitioned table (partition
pruning applies; `sinks/layout.py` semantics).

Scale shape: the touched-hour set is bounded by wall-clock hours per
refresh interval (a few dozen keys), so the driver-side collect of hours
is O(hours), never O(rows); the recompute reads only those hours from the
base table (partition-prunable when the base is hour-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_FMT = "yyyy-MM-dd-HH"


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The rollup definition: (hour, event_type) → count + sum. Decimal
    sum keeps the aggregate order-insensitive (oracle-matchable)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .withColumn("hour_key", F.date_format("window_start", HOUR_FMT))
    )


def refresh_rollup(base: DataFrame, delta: DataFrame, out_path: str) -> int:
    """Refresh the materialized rollup at ``out_path`` for every hour
    present in ``delta``: recompute those hours from ``base`` (all events,
    so late rows re-aggregate with their cohort) and dynamically overwrite
    just those partitions. Returns the number of hours refreshed."""
    spark = base.sparkSession
    hours = [
        r.h
        for r in delta.select(F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .collect()  # bounded: one row per wall-clock hour in the delta
    ]
    if not hours:
        return 0
    touched = base.filter(F.date_trunc("hour", "ts").isin(hours))
    agg = hourly_rollup(touched)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        agg.write.mode("overwrite").partitionBy("hour_key").parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(hours)
