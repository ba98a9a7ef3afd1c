"""Bucketed-table helpers — co-located joins without a shuffle (SURVEY.md
§4; the "pre-partition big joins" leg of the 100 TB design).

Writing both sides of a recurring join bucketed by the join key means every
subsequent join is a zipped per-bucket sort-merge with NO Exchange on
either side — the shuffle cost is paid once at ingest, not per query. At
100 TB this is the difference between an hourly pipeline re-shuffling the
fact table and one that only streams matching buckets.

Local note: bucketing goes through the session catalog (``saveAsTable``);
``spark.sql.warehouse.dir`` defaults under the cwd — callers can point it
at scratch space via ``warehouse_conf``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-bucketed) managed
    table. Sorting within buckets lets the sort-merge join skip its sort."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    # pre-shuffle into bucket-aligned partitions (repartition's murmur3
    # pmod IS the bucket-id expression, so each task holds exactly one
    # bucket): without it every input task writes up to n_buckets files
    # (task_count × n_buckets small files at scale), and an unsplittable
    # single-file source — the local parquet inputs — degrades to ONE
    # task sorting and writing every bucket serially (measured 2.7 s
    # single-core for lineitem at sf0.1 → 0.6 s 8-way). One Exchange at
    # ingest is the cost bucketing exists to pay once (round 14, guide §6).
    df = df.repartition(n_buckets, *cols)
    writer = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
    force_merge: bool = False,
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on their
    bucket key. With matching bucket counts Catalyst plans a sort-merge
    join with no Exchange on either side (verify with
    ``plans.assert_no_exchange``). ``force_merge`` adds a MERGE hint —
    at test scale the planner would otherwise broadcast the small side
    (also shuffle-free, but it bypasses the bucketing being demonstrated);
    at production scale both sides exceed the broadcast threshold and the
    hint is unnecessary."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
