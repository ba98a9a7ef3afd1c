"""S6/T1 — directory listings as relations.

The reference enumerates directories everywhere (``os.listdir``+sort,
bin/main.py:269-270; ``Dir.glob``, bin/publish.rb:64; ``find -name '*.tif'
! -name '.*' | sort``, bin/dirtopdf.sh:78-96; mtime incrementality via
``find -newer .last_run``, bin/batch.sh:23-27). Spark's ``binaryFile``
source provides the same relation with pushdown-able options; content is a
lazy column — listing-only consumers never read file bytes (column pruning
drops ``content`` from the scan).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_name(col=None):
    # default built lazily — F.col needs an active SparkContext
    return F.element_at(F.split(col if col is not None else F.col("path"), "/"), -1)


def is_hidden(col=None):
    """``! -name '.*'`` (bin/dirtopdf.sh:78)."""
    return file_name(col).startswith(".")


def list_files(
    spark: SparkSession,
    root: str,
    glob: str | None = None,
    recursive: bool = False,
    modified_after: datetime | str | None = None,
    with_content: bool = False,
) -> DataFrame:
    """Enumerate files as a DataFrame (path, length, modificationTime
    [, content]), sorted by path — the reference's universal ordering
    contract (O1).

    ``modified_after`` is the T1 incremental scan (``find -newer``): the
    option is applied at the source, so unchanged files are pruned before
    any read.

    Hidden files: Spark's file index itself never lists ``.``/``_``-prefixed
    files, so the reference's ``! -name '.*'`` filter holds by construction;
    ``is_hidden`` remains for listings built from other sources.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if modified_after is not None:
        if isinstance(modified_after, datetime):
            modified_after = modified_after.strftime("%Y-%m-%dT%H:%M:%S")
        reader = reader.option("modifiedAfter", modified_after)
    df = reader.load(root)
    df = df.filter(~is_hidden())  # belt-and-braces; see docstring
    cols = ["path", "length", "modificationTime"] + (
        ["content"] if with_content else []
    )
    return df.select(*cols).orderBy("path")
