"""The shared batch-dir crash-ordering discipline (round 8 — r7 VERDICT
item 5): one implementation of batch validity, snapshot horizons, and the
fold/swap primitives that the publish journal, the ingest ledgers, and
the ANN index append/tombstone log all re-base onto. The integration
semantics are pinned by those features' own tests; this file pins the
primitives' contracts directly."""

from __future__ import annotations

import os

import pytest

from pulfa_sausage_factory_spark import fsutil, statedir


def _mk_batch(spark, path, rows):
    spark.createDataFrame([(r,) for r in rows], "v long").write.mode(
        "overwrite"
    ).parquet(path)


def test_numbered_dirs_filters_and_markers(spark, tmp_path):
    base = str(tmp_path / "log")
    _mk_batch(spark, f"{base}/batch=1", [1])
    _mk_batch(spark, f"{base}/batch=3", [3])
    _mk_batch(spark, f"{base}/batch=7", [7])
    os.remove(f"{base}/batch=7/_SUCCESS")  # killed write
    os.makedirs(f"{base}/batch=junk")  # non-numeric → ignored
    os.makedirs(f"{base}/other=5")  # wrong prefix → ignored

    assert set(statedir.numbered_dirs(spark, base, "batch=")) == {1, 3, 7}
    assert set(
        statedir.numbered_dirs(spark, base, "batch=", committed_only=True)
    ) == {1, 3}
    assert set(
        statedir.numbered_dirs(spark, base, "batch=", above=1)
    ) == {3, 7}
    # missing dir → empty, not an error
    assert statedir.numbered_dirs(spark, str(tmp_path / "nope"), "x=") == {}


def test_snapshot_write_marker_last_and_horizon(spark, tmp_path):
    snap = str(tmp_path / "snaps")
    df = spark.range(5).selectExpr("id as v")
    assert statedir.snapshot_horizon(spark, snap) == -1
    n = statedir.write_snapshot(spark, df, snap, 4)
    assert n == 5
    # the marker is the POST-RENAME one (write_snapshot strips the
    # job-commit marker from the tmp dir and re-creates it at the final
    # path), so marker presence == the rename fully landed
    assert fsutil.exists(spark, f"{snap}/upto=4/_SUCCESS")
    assert statedir.snapshot_horizon(spark, snap) == 4
    assert sorted(
        r.v for r in spark.read.parquet(f"{snap}/upto=4").collect()
    ) == [0, 1, 2, 3, 4]

    # a partially-copied snapshot (no marker) is never adopted
    import shutil

    shutil.copytree(f"{snap}/upto=4", f"{snap}/upto=9")
    os.remove(f"{snap}/upto=9/_SUCCESS")
    assert statedir.snapshot_horizon(spark, snap) == 4
    # ...and a later write to that name replaces the debris
    statedir.write_snapshot(spark, df.limit(2), snap, 9)
    assert statedir.snapshot_horizon(spark, snap) == 9
    assert spark.read.parquet(f"{snap}/upto=9").count() == 2

    assert statedir.delete_superseded_snapshots(spark, snap, 9) == 1
    assert not fsutil.exists(spark, f"{snap}/upto=4")
    assert statedir.snapshot_horizon(spark, snap) == 9


def test_delete_folded_sweeps_only_at_or_below(spark, tmp_path):
    base = str(tmp_path / "log2")
    for i in (0, 2, 5):
        _mk_batch(spark, f"{base}/run_id={i}", [i])
    assert statedir.delete_folded(spark, base, "run_id=", 2) == 2
    assert set(statedir.numbered_dirs(spark, base, "run_id=")) == {5}


def test_replace_dir_swap_and_recovery(spark, tmp_path):
    path = str(tmp_path / "state")
    _mk_batch(spark, path, [1, 2, 3])

    def write_new(tmp):
        _mk_batch(spark, tmp, [9])

    statedir.replace_dir(spark, path, write_new)
    assert [r.v for r in spark.read.parquet(path).collect()] == [9]

    # a failing writer rolls the original back
    def boom(tmp):
        raise RuntimeError("writer died")

    with pytest.raises(RuntimeError, match="writer died"):
        statedir.replace_dir(spark, path, boom)
    assert [r.v for r in spark.read.parquet(path).collect()] == [9]

    # crash between the two renames: path gone, .__old__ holds the only
    # copy — recovery restores it (and is a no-op on a healthy dir)
    os.rename(path, path + ".__old__")
    statedir.recover_replaced_dir(spark, path)
    assert [r.v for r in spark.read.parquet(path).collect()] == [9]
    statedir.recover_replaced_dir(spark, path)
    assert fsutil.exists(spark, path)


def test_touch_creates_and_overwrites(spark, tmp_path):
    p = str(tmp_path / "m" / "_SUCCESS")
    fsutil.touch(spark, p)
    assert fsutil.exists(spark, p)
    fsutil.touch(spark, p)  # idempotent overwrite
    assert fsutil.exists(spark, p)


def test_swap_partitions_and_recovery(spark, tmp_path):
    # round-11: the per-partition swap behind retract_documents — a
    # committed sidecar's children swap in (normal path AND crash heal,
    # one routine); a marker-less sidecar is a killed write and is
    # discarded; children already swapped before a crash left the
    # sidecar, so completion is exactly the remainder.
    from pulfa_sausage_factory_spark import fsutil, statedir

    base = str(tmp_path / "part_state")
    for b, v in ((0, 10), (1, 20), (2, 30)):
        spark.createDataFrame([(v,)], "x long").write.parquet(
            f"{base}/batch_id={b}"
        )

    def rewrite(tmp):
        # replace partitions 0 and 2 (drop one value, keep structure)
        spark.createDataFrame(
            [(11, 0), (31, 2)], "x long, batch_id int"
        ).write.partitionBy("batch_id").parquet(tmp)

    swapped = statedir.swap_partitions(spark, base, rewrite)
    assert sorted(swapped) == ["batch_id=0", "batch_id=2"]
    got = {
        (r.batch_id, r.x)
        for r in spark.read.parquet(base).collect()
    }
    assert got == {(0, 11), (1, 20), (2, 31)}
    assert not fsutil.exists(spark, base + ".__partswap__")

    # crash heal, committed sidecar: children awaiting rename swap in
    tmp = base + ".__partswap__"
    spark.createDataFrame(
        [(99, 1)], "x long, batch_id int"
    ).write.partitionBy("batch_id").parquet(tmp)
    assert fsutil.exists(spark, f"{tmp}/_SUCCESS")
    assert statedir.recover_partition_swaps(spark, base) == ["batch_id=1"]
    assert {
        (r.batch_id, r.x) for r in spark.read.parquet(base).collect()
    } == {(0, 11), (1, 99), (2, 31)}

    # crash heal, marker-less sidecar (killed write): discarded whole
    spark.createDataFrame(
        [(777, 0)], "x long, batch_id int"
    ).write.partitionBy("batch_id").parquet(tmp)
    fsutil.delete(spark, f"{tmp}/_SUCCESS")
    assert statedir.recover_partition_swaps(spark, base) == []
    assert not fsutil.exists(spark, tmp)
    assert {
        (r.batch_id, r.x) for r in spark.read.parquet(base).collect()
    } == {(0, 11), (1, 99), (2, 31)}

    # no sidecar → no-op
    assert statedir.recover_partition_swaps(spark, base) == []
