"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
settings are cluster-safe — AQE handles runtime re-planning / skew joins,
shuffle partitions default small for local data volumes but should be raised
(or left to AQE coalescing) at production scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Default local shuffle parallelism. At 100 TB scale this is overridden
#: (AQE coalesces anyway; initial partition count should be ~2-3x cores).
DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app_name: str = "pulfa-sausage-factory-spark") -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
      and dynamic join-strategy switching replace any hand-tuned knobs.
    - Arrow on: every pandas UDF / mapInPandas boundary is Arrow-batched.
    - Broadcast threshold left at default (10 MB) — dimension tables in the
      star schema (region/nation/supplier/part at test SFs) broadcast
      automatically; big-side joins shuffle on their keys.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # NOTE: no parquet-timestamp confs here on purpose. events.ts
        # (µs-without-tz → TIMESTAMP_NTZ on Spark 4) is normalized to
        # TIMESTAMP in io.load_table so the fix also covers external
        # sessions (the correctness driver builds its own vanilla session —
        # a conf set only in this builder would never reach it).
        # split file scans aggressively for local parallelism: test-scale
        # parquet is single-file, and CPU-bound UDF stages (minhash, knn)
        # otherwise run on one core. At cluster scale this is a deploy-time
        # knob (default 128m); 32m here costs nothing at local volumes.
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def release_local_checkpoint(df) -> None:
    """Eagerly free a ``localCheckpoint``'s storage blocks once the round
    that produced it is superseded — the companion of the per-round
    lineage-truncation idiom iterative operators use (label propagation,
    BPE merge training): without it every round's full snapshot stays
    pinned until driver GC. Reaches through ``LogicalRDD`` (stable across
    Spark 3/4); best-effort — on accessor drift, blocks fall back to
    ContextCleaner reclamation."""
    try:
        df._jdf.queryExecution().optimizedPlan().rdd().unpersist(False)
    except Exception:
        pass
