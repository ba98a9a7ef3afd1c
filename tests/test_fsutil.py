"""Hadoop-FileSystem helpers (``fsutil``) — the FS-portable ops behind
ingest-state compaction. Exercised on the local FS through the SAME Hadoop
API code path hdfs:///s3a:// would take (the scheme only picks the
FileSystem impl; every call below goes through the JVM FS object, never
``os.path``)."""

from __future__ import annotations

import os

import pytest

from pulfa_sausage_factory_spark import fsutil


def test_fs_ops_roundtrip(spark, tmp_path):
    root = str(tmp_path / "state")
    os.makedirs(root)
    assert fsutil.exists(spark, root) and fsutil.is_dir(spark, root)
    assert not fsutil.exists(spark, root + "/nope")
    assert fsutil.parquet_file_count(spark, root + "/nope") == 0

    spark.range(10).repartition(3).write.parquet(root + "/a")
    assert fsutil.parquet_file_count(spark, root + "/a") == 3
    f = str(tmp_path / "plain.txt")
    open(f, "w").write("x")
    assert fsutil.exists(spark, f) and not fsutil.is_dir(spark, f)

    fsutil.rename(spark, root + "/a", root + "/b")
    assert not fsutil.exists(spark, root + "/a")
    assert fsutil.parquet_file_count(spark, root + "/b") == 3
    # Hadoop rename returns False instead of raising — fsutil raises
    with pytest.raises(OSError, match="rename failed"):
        fsutil.rename(spark, root + "/missing", root + "/c")

    fsutil.delete(spark, root + "/b")
    assert not fsutil.exists(spark, root + "/b")
    fsutil.delete(spark, root + "/b")  # missing → no-op, not an error


def test_fs_ops_accept_uri_paths(spark, tmp_path):
    # explicit file: URIs resolve through the same Path.getFileSystem
    # dispatch a cluster state dir would use
    uri = "file://" + str(tmp_path / "u")
    spark.range(4).coalesce(1).write.parquet(uri + "/a")
    assert fsutil.is_dir(spark, uri + "/a")
    assert fsutil.parquet_file_count(spark, uri) == 1
    fsutil.rename(spark, uri + "/a", uri + "/b")
    assert fsutil.exists(spark, uri + "/b")
