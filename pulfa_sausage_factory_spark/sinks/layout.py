"""Data-layout sinks — hive-partitioned writes, range-clustered files, and
small-file compaction (the storage leg of the 100 TB design).

The reference's layout IS its index: ``$ROOT/<collection>/<component>/…``
encodes the access path in directories (bin/main.py:178-180, SURVEY.md §1).
The engine generalizes that: a partitioned parquet write turns the hot
predicate into directory pruning (Catalyst's ``PartitionFilters`` — whole
directories never open), range-clustering turns the secondary predicate
into row-group skipping via parquet min/max stats, and compaction keeps the
file count bounded — at 100 TB the failure mode isn't data size, it's
millions of kilobyte files drowning the NameNode/listing path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    cluster_cols: list[str] | str | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write, one shuffle total.

    ``repartition(partition_cols)`` routes each output partition to one task
    (no thousand-files-per-directory fan-out: without it, every task writes
    a file into every partition directory). ``cluster_cols`` sorts rows
    *within* each task so parquet row-group min/max stats become selective
    for the secondary predicate — skipping without an index.
    """
    pcols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    out = df.repartition(*[F.col(c) for c in pcols])
    if cluster_cols:
        ccols = [cluster_cols] if isinstance(cluster_cols, str) else list(cluster_cols)
        out = out.sortWithinPartitions(*ccols)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*pcols)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | str,
    target_files_per_partition: int = 1,
) -> None:
    """Small-file compaction: rewrite a partitioned dataset with a bounded
    file count per partition. Read → one shuffle keyed on (partition, file
    slot) → overwrite. Run as maintenance, off the query path.

    The tmp/old swap and its kill-point recovery are the shared
    ``statedir.replace_dir`` / ``recover_replaced_dir`` discipline
    (round 9 — previously a hand-rolled ``os.path`` copy, which raised
    instead of swapping on exactly the stores a 100 TB dataset lives on:
    hdfs://, s3a://, any non-local URI). Recovery runs FIRST: a prior run
    killed between the two renames leaves the ONLY copy of the original
    at ``.__old__``."""
    from .. import statedir

    pcols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    statedir.recover_replaced_dir(spark, path)

    def _rewrite(tmp: str) -> None:
        df = spark.read.parquet(path)
        slot = (
            F.crc32(F.concat_ws("\x00", *df.columns))
            % target_files_per_partition
        )
        compacted = df.repartition(
            *[F.col(c) for c in pcols], slot.alias("_slot")
        )
        compacted.write.mode("overwrite").partitionBy(*pcols).parquet(tmp)

    statedir.replace_dir(spark, path, _rewrite)


def write_sharded(
    df: DataFrame,
    path: str,
    order_col: str,
    rows_per_shard: int = 1_000_000,
    mode: str = "overwrite",
) -> int:
    """Training-data shard export: write the dataset as globally ordered,
    size-bounded parquet shards — the final assembly stage a data loader
    consumes (shards read in partition order reproduce the packing order
    from ``sampling.pack_greedy``).

    ``repartitionByRange(order_col)`` gives disjoint, globally ordered key
    ranges across shards (one sampling pass + one shuffle);
    ``sortWithinPartitions`` + ``maxRecordsPerFile`` make every emitted
    file internally sorted and at most ``rows_per_shard`` rows. The one
    ``count()`` sizes the shard count — a metadata-cheap aggregate
    relative to the write itself. Returns the shard (range-partition)
    count.
    """
    import math

    n = df.count()
    shards = max(1, math.ceil(n / rows_per_shard))
    (
        df.repartitionByRange(shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    return shards


def parquet_file_count(path: str) -> int:
    """Data files under a parquet root (ignores _SUCCESS/metadata)."""
    n = 0
    for dirpath, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
