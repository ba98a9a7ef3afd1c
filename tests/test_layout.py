"""Data-layout sinks: partition pruning reaches the scan, clustering bounds
files, compaction collapses small files without changing the data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import plans
from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.sinks import layout


def test_partitioned_write_prunes_and_bounds_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    layout.write_partitioned(ev, out, "event_type", cluster_cols="user_id")

    # one task per partition value → one file per directory
    per_dir = {}
    for d in os.listdir(out):
        if d.startswith("event_type="):
            per_dir[d] = sum(
                f.endswith(".parquet") for f in os.listdir(os.path.join(out, d))
            )
    assert per_dir and all(n == 1 for n in per_dir.values()), per_dir

    # the partition predicate must prune directories, not filter rows
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plans.assert_partition_pruned(back, "event_type")
    want = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == want


def test_compaction_preserves_data(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    # deliberately fragmented: many tasks × partitionBy fan-out
    ev.repartition(8).write.partitionBy("event_type").parquet(out)
    before_files = layout.parquet_file_count(out)
    before = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    layout.compact(spark, out, "event_type", target_files_per_partition=1)
    after_files = layout.parquet_file_count(out)
    after = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    assert after == before
    assert after_files < before_files
    n_parts = len([d for d in os.listdir(out) if d.startswith("event_type=")])
    assert after_files == n_parts


def test_compaction_recovers_from_stale_debris(spark, sf_dir, tmp_path):
    # a prior crashed run may leave .__old__ / .__compact__ trees behind;
    # compact() must pre-clean them or every later run fails at the swap
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(4).write.partitionBy("event_type").parquet(out)
    before = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    os.makedirs(out + ".__old__/event_type=stale")
    os.makedirs(out + ".__compact__")
    layout.compact(spark, out, "event_type", target_files_per_partition=1)

    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == before
    assert not os.path.exists(out + ".__old__")
    assert not os.path.exists(out + ".__compact__")


def test_compaction_recovers_mid_swap_crash(spark, sf_dir, tmp_path):
    # killed between rename(path -> .__old__) and rename(.__compact__ ->
    # path): the ONLY copy of the original is .__old__. The next run must
    # restore it, not rmtree it (that was permanent data loss).
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(4).write.partitionBy("event_type").parquet(out)
    before = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    os.rename(out, out + ".__old__")          # the crash state
    os.makedirs(out + ".__compact__")         # half-written rewrite debris

    layout.compact(spark, out, "event_type", target_files_per_partition=1)

    assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == before
    assert not os.path.exists(out + ".__old__")
    assert not os.path.exists(out + ".__compact__")


def test_sharded_write_is_ordered_and_disjoint(spark, sf_dir, tmp_path):
    # training-shard export: every emitted file is internally sorted, file
    # key-ranges are pairwise disjoint (global order across shards), sizes
    # respect the per-shard cap, and nothing is lost or duplicated
    import glob

    import pyarrow.parquet as pq

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    total = docs.count()
    shards = layout.write_sharded(
        docs, str(tmp_path / "shards"), "doc_id", rows_per_shard=100
    )
    assert shards == (total + 99) // 100

    files = sorted(glob.glob(str(tmp_path / "shards" / "*.parquet")))
    assert len(files) >= shards
    ranges, seen = [], 0
    for f in files:
        ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
        assert 0 < len(ids) <= 100
        assert ids == sorted(ids)
        ranges.append((ids[0], ids[-1]))
        seen += len(ids)
    assert seen == total
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # disjoint key ranges -> deterministic global order
