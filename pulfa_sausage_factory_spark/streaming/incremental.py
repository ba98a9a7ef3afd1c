"""T1/T2 — the incremental outer loop (reference: bin/batch.sh).

The reference's cron driver is: ``find EADs -newer .last_run`` → one
``main.py`` per changed file → ``touch .last_run`` (batch.sh:23-39). Two
Spark formulations:

- **Batch**: ``modified_since`` — the file source's ``modifiedAfter``
  option prunes unchanged files at the scan. The caller persists its own
  watermark (the ``.last_run`` analog) between runs.
- **Streaming**: ``process_available`` — Structured Streaming file source
  with ``Trigger.AvailableNow`` + ``foreachBatch``; the checkpoint dir
  replaces ``.last_run`` and gives exactly-once file-discovery semantics
  across restarts (T2: each micro-batch invokes the pipeline the way
  batch.sh invoked main.py per EAD).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from pulfa_sausage_factory_spark.sources.listing import list_files


def modified_since(
    spark: SparkSession,
    root: str,
    last_run: datetime | str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """T1 batch form: files under ``root`` modified after ``last_run``,
    with content (ready for the EAD pipeline)."""
    return list_files(
        spark,
        root,
        glob=glob,
        recursive=recursive,
        modified_after=last_run,
        with_content=True,
    )


def process_available(
    spark: SparkSession,
    root: str,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    glob: str | None = None,
    schema=None,
) -> None:
    """T1/T2 streaming form: drain all currently-available new files through
    ``batch_fn`` exactly once, then stop (Trigger.AvailableNow). Re-running
    with the same checkpoint picks up only files not yet processed — the
    idempotent re-run contract (T4) enforced by the engine, not by
    skip-guards."""
    from pyspark.sql import types as T

    if schema is None:
        # binaryFile's fixed schema (streaming sources require it explicitly)
        schema = T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("modificationTime", T.TimestampType()),
                T.StructField("length", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.load(root)
    (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
