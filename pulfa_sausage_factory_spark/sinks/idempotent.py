"""S12/F3/T4 — idempotent file sinks.

The reference's safety net is "skip if the output already exists" at every
stage (bin/main.py:184,232,282,368) and copy-never-overwrite finalize moves
(bin/main.py:543-588, shutil copy + delete; bin/pulfarize.rb:56-77). Spark
tasks can re-execute, so external writes MUST be idempotent (SURVEY.md §7
hard part 3): deterministic output paths + existence guards, exactly the
reference's recipe.

``write_files`` is the generic per-row file sink: rows carry (out_path,
payload); a left-anti join against the destination listing drops rows whose
output exists (J5), then ``foreachPartition`` writes remaining files with
atomic rename. Re-running any stage is a no-op — the metamorphic test the
reference's design implies (T4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skip_existing(work: DataFrame, dest_root: str, path_col: str = "out_path") -> DataFrame:
    """F3/J5 — drop rows whose output file already exists under dest_root."""
    spark = work.sparkSession
    existing: list[str] = []
    for dirpath, _dirs, files in os.walk(dest_root):
        existing.extend(os.path.join(dirpath, f) for f in files)
    if not existing:
        return work
    listing = spark.createDataFrame([(p,) for p in existing], [path_col])
    return work.join(F.broadcast(listing), [path_col], "left_anti")


def write_files(
    df: DataFrame,
    path_col: str = "out_path",
    payload_col: str = "payload",
    overwrite: bool = False,
) -> int:
    """Per-row file writer: ``foreachPartition`` + write-to-temp + atomic
    rename; existing outputs are never clobbered unless ``overwrite``.
    Returns the number of rows submitted (driver-side count)."""
    n = df.count()

    def write_partition(rows) -> None:
        for row in rows:
            out = row[path_col]
            if not overwrite and os.path.exists(out):
                continue  # F3 guard — re-executed task, already produced
            os.makedirs(os.path.dirname(out), exist_ok=True)
            data = row[payload_col]
            if isinstance(data, str):
                data = data.encode("utf-8")
            tmp = f"{out}.__tmp__{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(bytes(data))
            try:
                os.rename(tmp, out)  # atomic: concurrent attempts settle on one file
            except OSError:
                os.unlink(tmp)

    df.select(path_col, payload_col).foreachPartition(write_partition)
    return n


def finalize_move(
    df: DataFrame,
    src_col: str = "src_path",
    dest_col: str = "dest_path",
) -> None:
    """S12 finalize — copy-then-delete to the final roots, never overwriting
    (bin/main.py:543-588): existence check, copy to temp, rename, then unlink
    the source only after the destination is in place."""
    import shutil

    def move_partition(rows) -> None:
        for row in rows:
            src, dest = row[src_col], row[dest_col]
            if os.path.exists(dest) or not os.path.exists(src):
                continue
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = f"{dest}.__tmp__{os.getpid()}"
            shutil.copyfile(src, tmp)
            try:
                os.rename(tmp, dest)
                os.unlink(src)
            except OSError:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    df.select(src_col, dest_col).foreachPartition(move_partition)
