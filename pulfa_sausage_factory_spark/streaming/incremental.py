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


def journal_publish(
    spark: SparkSession,
    outputs: DataFrame,
    journal_dir: str,
    run_id: int | None = None,
) -> dict:
    """EP3 round-trip completion — the commit-manifest analog of the
    reference's post-processing ``svn ci`` (``bin/batch.sh:34-37``: commit
    rewritten EADs + add/commit new METS after the per-EAD loop, before
    ``touch .last_run``). The engine's incremental loop previously mapped
    only the *detection* half (``batch.sh:21,23-27`` → ``modified_since``/
    ``process_available``); this journals the *publication* half: which
    outputs a run committed, keyed by run id, so reruns know what is
    already out and auditors know which run published what.

    ``outputs`` must carry ``path`` (string) and ``digest`` (string —
    e.g. ``F.sha1(content)``; the working-copy-diff stand-in: svn commits
    a file only when its content changed).

    Semantics (same crash-safe shape as the ingest ledger,
    ``curation_pipeline._ingest_batch``):

    - prior state = the journal's runs STRICTLY BEFORE this run id, so a
      replayed run — even of an old id after later runs landed — decides
      against exactly the manifest it originally saw and rewrites its
      partition to identical contents (at-least-once ``foreachBatch``
      safe; run ids must be monotone, which the incremental loop's batch
      ids are);
    - the comparison point per path is its LATEST journaled digest (max
      ``run_id``), not the set of all historical digests — svn compares
      the working copy against HEAD, so a file REVERTED to previously-
      published content (run 1 digest d1, run 2 d2, run 3 back to d1) is
      a real commit: the manifest's newest entry must say d1 again or
      auditors reconstruct d2 as current. An output matching its path's
      latest digest is a no-op; anything else (new path, changed digest,
      reverted digest) re-commits;
    - the run's rows land in ``journal_dir/run_id=<id>`` via partition
      OVERWRITE — replaying a run rewrites its own partition to the same
      contents instead of appending duplicates.

    ``run_id=None`` (the safe default) auto-assigns ``max journaled run
    + 1`` — the monotonicity the replay semantics above depend on,
    enforced by the journal itself instead of trusted to the caller.
    Like svn revisions, auto ids advance only on runs that actually
    commit something (a no-op run journals zero rows, so the next run
    reuses its number — harmless: the decision prior is identical). An
    EXPLICIT id must be either greater than every journaled run (a new
    run under external numbering, e.g. streaming batch ids) or an
    already-journaled id (a replay); a reused-but-never-journaled id in
    between is refused — it would decide against a partial prior and
    corrupt audit history silently.

    Returns ``{"published": n, "unchanged": n, "run_id": id}``.
    """
    import os

    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # distinct: an upstream that emits the same output row twice must not
    # double-journal it (svn commits a path once per revision). Persisted:
    # the plan is consumed twice (count + write), and the typical caller
    # feeds it binaryFile content + sha1 — without the persist every
    # published file would be read and hashed twice per run.
    rows = outputs.select("path", "digest").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        # one journal read serves id assignment/validation AND the prior
        # manifest; the journal is bounded (one row per changed output
        # per run), so the distinct-run collect is small
        full = _read_journal(spark, journal_dir, before_run=None,
                             keep_run=True)
        seen_runs = (
            set()
            if full is None
            else {
                r.run_id
                for r in full.select("run_id").distinct().collect()
            }
        )
        max_run = max(seen_runs, default=0)
        if run_id is None:
            run_id = max_run + 1
        elif run_id <= max_run and run_id not in seen_runs:
            raise ValueError(
                f"journal_publish: run_id={run_id} is neither a new run "
                f"(> {max_run}) nor a replay of a journaled run "
                f"({sorted(seen_runs)}) — a reused, never-journaled id "
                "would decide against a partial prior manifest and "
                "silently corrupt audit history"
            )
        # prior = runs STRICTLY BEFORE this one (not merely "excluding
        # it"): a replay of run N after later runs exist must decide
        # against the journal as it stood when run N originally committed,
        # or the replay rewrites run N's partition with rows it never
        # contained
        prior = (
            None
            if full is None
            else full.filter(F.col("run_id") < run_id)
        )
        if prior is not None:
            # HEAD per path: the digest journaled by the newest run. The
            # journal is bounded (one row per actually-changed output per
            # run), so the per-path window is a journal-sized shuffle,
            # never a corpus-sized one.
            w = Window.partitionBy("path").orderBy(
                F.col("run_id").desc(), F.col("digest")
            )
            head = (
                prior.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select("path", "digest")
            )
            fresh = rows.join(head, ["path", "digest"], "left_anti")
        else:
            fresh = rows
        n_total = rows.count()
        part_dir = os.path.join(journal_dir, f"run_id={int(run_id)}")
        fresh.write.mode("overwrite").parquet(part_dir)
        n_new = spark.read.parquet(part_dir).count()
    finally:
        rows.unpersist()
    return {
        "published": n_new,
        "unchanged": n_total - n_new,
        "run_id": int(run_id),
    }


def published_manifest(
    spark: SparkSession, journal_dir: str
) -> DataFrame | None:
    """Everything every run has committed: ``(path, digest, run_id)``, or
    None when no journal exists yet."""
    return _read_journal(spark, journal_dir, before_run=None, keep_run=True)


def _read_journal(
    spark: SparkSession,
    journal_dir: str,
    before_run: int | None,
    keep_run: bool = False,
):
    """FS-portable journal read via the shared state classifier
    (``io.read_parquet_state`` — the ingest ledger uses the same one).
    ``before_run`` keeps only runs with a strictly smaller id — the
    pre-run manifest a (re)play of that run decides against."""
    from pyspark.sql import functions as F

    from ..io import read_parquet_state

    df = read_parquet_state(spark, journal_dir)
    if df is None:
        return None
    if before_run is not None:
        df = df.filter(F.col("run_id") < before_run)
    return df if keep_run else df.drop("run_id")
