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
    lease=None,
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

    ``run_id=None`` (the safe default) auto-assigns ``max attempted run
    + 1`` — the monotonicity the replay semantics above depend on,
    enforced by the journal itself instead of trusted to the caller.
    Auto ids advance past every ATTEMPTED run, not just committed ones:
    a KILLED run (marker-less partition dir) is still awaiting its
    at-least-once redelivery, and landing different rows under its id
    would let that redelivery — a legitimate replay — silently overwrite
    them (round-9 ADVICE fix; the index WAL's auto ids follow the same
    rule). An
    EXPLICIT id must be either greater than every ATTEMPTED run (a new
    run under external numbering — streaming batch ids, which start at
    0: a fresh journal accepts any first id) or an already-attempted id
    (a replay); a reused-but-never-attempted id in between is refused —
    it would decide against a partial prior and corrupt audit history
    silently. "Attempted" is judged by run partition directories, not
    journaled rows: a no-op run still writes its (empty) partition, so
    an at-least-once redelivery of a no-op batch idempotently no-ops
    instead of being refused as a reuse. After ``compact_journal``,
    replays at or below the compaction horizon are refused — their
    original prior manifest no longer exists (the Kafka-log-compaction
    trade: bounded reads for replayability of compacted history).

    Returns ``{"published": n, "unchanged": n, "run_id": id}``. The
    journal's single-writer contract is ENFORCED (round-11 VERDICT item
    2): the verb holds the journal dir's writer lease — two concurrent
    publishers (or a publish racing a compaction) refuse loudly at
    acquisition instead of double-assigning run ids.
    """
    from pulfa_sausage_factory_spark import statedir

    with statedir.lease_scope(spark, journal_dir, "journal_publish",
                              lease=lease):
        return _journal_publish_body(spark, outputs, journal_dir, run_id)


def _journal_publish_body(
    spark: SparkSession,
    outputs: DataFrame,
    journal_dir: str,
    run_id: int | None = None,
) -> dict:
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
        # one journal read serves id assignment AND the prior manifest;
        # the journal is bounded (one row per changed output per run), so
        # the distinct-run collect is small. Validation additionally
        # consults the run-partition DIRECTORY listing (attempted runs ⊇
        # committed runs — no-op runs journal zero rows but still write
        # their partition).
        horizon = _journal_horizon(spark, journal_dir)
        full = _read_journal(spark, journal_dir, before_run=None,
                             keep_run=True)
        committed = (
            set()
            if full is None
            else {
                r.run_id
                for r in full.select("run_id").distinct().collect()
            }
        )
        attempted = committed | _attempted_runs(spark, journal_dir, horizon)
        if run_id is None:
            # auto ids advance past every ATTEMPTED run — committed,
            # no-op (empty committed partition), or KILLED (marker-less
            # dir awaiting its at-least-once redelivery): reusing a
            # killed run's id for DIFFERENT rows would let that
            # redelivery, a legitimate replay of the id, silently
            # overwrite them (round-9 ADVICE fix — the same rule the
            # index WAL's _validate_log_batch_id applies). Never lands
            # at or below the compaction horizon, whose priors are gone.
            run_id = max(max(attempted, default=0), horizon) + 1
        elif run_id < 0:
            raise ValueError(
                f"journal_publish: run_id={run_id} is negative — run ids "
                "are non-negative (streaming batch ids start at 0), and "
                "-1 is the never-compacted horizon sentinel"
            )
        elif run_id <= horizon:
            raise ValueError(
                f"journal_publish: run_id={run_id} is at or below the "
                f"compaction horizon ({horizon}) — its original prior "
                "manifest was folded into the HEAD snapshot, so the "
                "replay cannot reproduce its decision; only runs > "
                f"{horizon} are replayable"
            )
        elif run_id not in attempted and attempted and run_id <= max(attempted):
            raise ValueError(
                f"journal_publish: run_id={run_id} is neither a new run "
                f"(> {max(attempted)}) nor a replay of an attempted run "
                f"({sorted(attempted)}) — a reused, never-attempted id "
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
    """Everything the journal still holds: ``(path, digest, run_id)``, or
    None when no journal exists yet. Before any ``compact_journal`` this
    is the complete per-run history; after compaction, runs at or below
    the horizon are represented by their HEAD-per-path snapshot rows
    (original committing ``run_id`` preserved) — per-path current state
    is identical, superseded historical digests below the horizon are
    gone."""
    return _read_journal(spark, journal_dir, before_run=None, keep_run=True)


def journal_report(spark: SparkSession, journal_dir: str) -> DataFrame:
    """Artifact-level report of a publish journal as a small queryable
    DataFrame — the observability convention (``curation_report_df``,
    ``pq_index_report``, ``ingest_state_report``) applied to the FOURTH
    state surface, which until round 12 answered "is my journal bounded,
    which runs are killed and blocking compaction, where is the horizon,
    who holds the lease" only from driver logs and hand listings:

      one row per attempted ``run_id=N`` partition (row count, file
      count, bytes, ``committed`` = job-commit marker) — a killed run
      above the horizon says "blocks compaction; replay or abandon_run"
      in ``detail`` and rolls up into one ``pending`` summary row
      (mirroring ``compact_journal``'s return dict), while an attempted
      dir AT/BELOW the horizon is crash debris awaiting the next
      compaction's sweep and is labeled as such;
      one row per ``_head/upto=N`` snapshot (``serving`` at the horizon,
      ``superseded``/uncommitted otherwise — a marker-less snapshot is a
      partial object-store copy that must never be adopted);
      a ``_lease`` row when a writer lease exists (epoch, holder, age —
      same as ``ingest_state_report``).

    Cost: FileSystem listings plus ONE zero-data-page scan for the
    per-run row counts (the root read excludes ``_head`` via the ``_``
    prefix; counting a killed run's partial rows is intentional — the
    number a replay will overwrite) and one for the serving snapshot —
    never O(runs) jobs, the same discipline as ``pq_index_report``'s
    staleness row. Read-only: takes no lease and mutates nothing."""
    import os

    from pyspark.sql import functions as F

    from .. import fsutil, statedir
    from ..io import read_parquet_state

    base = journal_dir.rstrip("/")
    horizon = _journal_horizon(spark, base)
    rows: list[tuple] = []

    per_run: dict[int, int] = {}
    root = read_parquet_state(spark, base)
    if root is not None and "run_id" in root.columns:
        per_run = {
            int(r.run_id): int(r.n)
            for r in root.groupBy("run_id").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }

    pending: list[int] = []
    dirs = statedir.numbered_dirs(spark, base, "run_id=")
    for rid in sorted(dirs):
        d = f"{base}/{dirs[rid]}"
        nf, nb = fsutil.parquet_usage(spark, d)
        committed = fsutil.exists(spark, f"{d}/{statedir.MARKER}")
        if rid <= horizon:
            detail = "folded — debris awaiting the next compaction's sweep"
        elif not committed:
            detail = "killed — blocks compaction; replay or abandon_run"
            pending.append(rid)
        else:
            detail = ""
        rows.append((f"run_id={rid}", per_run.get(rid, 0), nf, nb,
                     committed, detail))

    for up in sorted(
        statedir.numbered_dirs(spark, os.path.join(base, "_head"), "upto=")
    ):
        d = f"{base}/_head/upto={up}"
        nf, nb = fsutil.parquet_usage(spark, d)
        committed = fsutil.exists(spark, f"{d}/{statedir.MARKER}")
        if not committed:
            detail = ("uncommitted — partial snapshot copy, never adopted "
                      "as the horizon")
            n = 0
        elif up == horizon:
            detail = "serving — prior reads = this snapshot + runs above"
            n = spark.read.parquet(d).count()
        else:
            detail = "superseded"
            n = 0
        rows.append((f"_head/upto={up}", n, nf, nb, committed, detail))

    if pending:
        rows.append((
            "pending", 0, 0, 0, False,
            f"killed run(s) {sorted(pending)} cap compaction below "
            f"{min(pending)}",
        ))
    lease_detail = statedir.lease_report_detail(spark, base)
    if lease_detail is not None:
        rows.append(("_lease", 0, 0, 0, True, lease_detail))
    return spark.createDataFrame(
        rows,
        "artifact string, rows long, files int, bytes long, "
        "committed boolean, detail string",
    )


def compact_journal(
    spark: SparkSession, journal_dir: str, up_to_run: int | None = None,
    lease=None,
) -> dict:
    """Bound the journal's prior-state reads: fold every run with
    ``run_id <= up_to_run`` (default: all committed runs) into ONE
    HEAD-per-path snapshot partition, then drop the folded run
    partitions. ``published_manifest`` / ``journal_publish`` consult the
    snapshot plus runs above the horizon from then on, so prior reads
    touch a bounded number of partitions however long the deployment has
    been running — the same growth discipline the ingest ledger gets from
    ``compact_ingest_state``.

    The snapshot preserves each path's committing ``run_id``, so the
    HEAD-per-path window over (snapshot ∪ newer runs) is identical to the
    window over the full history — superseded below-horizon rows could
    never win it anyway. What IS given up is replaying a compacted-away
    run (its pre-run manifest no longer exists); ``journal_publish``
    refuses ids at or below the horizon loudly.

    The horizon never advances past a KILLED run (an attempted dir whose
    job-commit marker is missing — distinct from a committed no-op run,
    which has the marker and zero rows): folding past it would delete
    the dir and refuse the run's at-least-once redelivery as
    below-horizon, silently losing its journal rows forever. The default
    ``up_to_run`` caps below the lowest such run (reported in
    ``pending``); an explicit ``up_to_run`` spanning one is refused
    loudly — replay it (or abandon it deliberately) first.

    Crash-safe ordering (shared ``statedir`` discipline): the snapshot is
    written to a dot-temp dir, RENAMED into place (``_head/upto=<id>`` —
    the ``_head`` prefix hides it from the journal's own partition
    discovery), and its validity marker is created strictly AFTER the
    rename — so a crash anywhere up to marker creation leaves the
    original run dirs serving reads (a partially-copied snapshot on an
    object store can never become the horizon); after it, stale run dirs
    are ignored by the horizon filter until a later compaction removes
    them.

    Returns ``{"horizon": id, "snapshot_paths": n, "removed_dirs": k}``
    (``horizon=-1`` when there was nothing to compact). Holds the
    journal dir's writer lease (round-11 VERDICT item 2).
    """
    from .. import statedir

    with statedir.lease_scope(spark, journal_dir, "compact_journal",
                              lease=lease) as held:
        return _compact_journal_body(spark, journal_dir, up_to_run, held)


def _compact_journal_body(
    spark: SparkSession, journal_dir: str, up_to_run, lease,
) -> dict:
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .. import fsutil, statedir

    old_horizon = _journal_horizon(spark, journal_dir)
    # a KILLED run = attempted dir without Spark's job-commit marker (a
    # committed no-op run has the marker and zero rows) — its redelivery
    # must stay replayable, so the fold may never reach it
    pending = sorted(
        rid
        for rid, name in statedir.numbered_dirs(
            spark, journal_dir, "run_id=", above=old_horizon
        ).items()
        if not fsutil.exists(spark, f"{journal_dir.rstrip('/')}/{name}/"
                             f"{statedir.MARKER}")
    )
    full = _read_journal(spark, journal_dir, before_run=None, keep_run=True)
    if full is None:
        return {"horizon": old_horizon, "snapshot_paths": 0,
                "removed_dirs": 0, "pending": pending}
    committed = {r.run_id for r in full.select("run_id").distinct().collect()}
    if up_to_run is None:
        up_to_run = max(
            (c for c in committed if not pending or c < pending[0]),
            default=old_horizon,
        )
    elif pending and up_to_run >= pending[0]:
        raise ValueError(
            f"compact_journal: up_to_run={up_to_run} spans killed run(s) "
            f"{pending} still awaiting redelivery — folding past one "
            "would delete its partition and refuse its replay as "
            "below-horizon, losing its journal rows; replay (or "
            "deliberately abandon) them first"
        )
    if up_to_run <= old_horizon:
        return {"horizon": old_horizon, "snapshot_paths": 0,
                "removed_dirs": 0, "pending": pending}
    w = Window.partitionBy("path").orderBy(
        F.col("run_id").desc(), F.col("digest")
    )
    head = (
        full.filter(F.col("run_id") <= up_to_run)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("path", "digest", "run_id")
    )
    head_dir = os.path.join(journal_dir, "_head")
    n_snap = statedir.write_snapshot(spark, head, head_dir, int(up_to_run),
                                     lease=lease)
    # only now is it safe to drop what the snapshot supersedes
    removed = statedir.delete_folded(spark, journal_dir, "run_id=",
                                     int(up_to_run))
    removed += statedir.delete_superseded_snapshots(spark, head_dir,
                                                    int(up_to_run))
    return {"horizon": int(up_to_run), "snapshot_paths": n_snap,
            "removed_dirs": removed, "pending": pending}


def abandon_run(spark: SparkSession, journal_dir: str, run_id: int,
                lease=None) -> dict:
    """Deliberately abandon a KILLED run (attempted ``run_id=N`` dir
    whose job-commit marker is missing) so ``compact_journal`` can
    advance past it — the "deliberately abandon" half of its
    replay-or-abandon contract made an API, mirroring the index WAL's
    ``abandon_log_entry``. Refuses committed runs (deleting one would
    silently rewrite audit history — that is what compaction's fold is
    for) and unknown ids. A killed run's dir can hold PARTIAL rows from
    committed tasks of the killed job; deleting the dir removes them,
    which is the point — the run never happened. Only abandon when the
    producing writer is confirmed dead: the id returns to the assignable
    pool, so a redelivery arriving afterwards would collide with
    whatever new run took it.

    Returns ``{"run_id": id}``. Holds the journal dir's writer lease
    (round-11 VERDICT item 2)."""
    from .. import fsutil, statedir

    base = journal_dir.rstrip("/")
    with statedir.lease_scope(spark, base, "abandon_run", lease=lease):
        horizon = _journal_horizon(spark, journal_dir)
        rid = int(run_id)
        dirs = statedir.numbered_dirs(spark, base, "run_id=", above=horizon)
        if rid not in dirs:
            raise ValueError(
                f"abandon_run: run_id={rid} is not an attempted run above "
                f"the compaction horizon ({horizon}) — nothing to abandon"
            )
        d = f"{base}/{dirs[rid]}"
        if fsutil.exists(spark, f"{d}/{statedir.MARKER}"):
            raise ValueError(
                f"abandon_run: run_id={rid} is a COMMITTED run — deleting "
                "it would silently rewrite audit history; fold history "
                "with compact_journal instead, never abandon committed "
                "runs"
            )
        fsutil.delete(spark, d)
        return {"run_id": rid}


def _journal_horizon(spark: SparkSession, journal_dir: str) -> int:
    """The compaction horizon: max ``upto`` among COMMITTED HEAD
    snapshots under ``journal_dir/_head``, or ``-1`` when never
    compacted. Committed = carries the post-rename validity marker
    (``statedir.snapshot_horizon``): on object stores a crash inside the
    copy+delete rename leaves a partial snapshot dir, and adopting it by
    existence would silently drop every manifest row that missed the
    copy while excluding the still-present run dirs as debris (round-8
    ADVICE fix)."""
    import os

    from .. import statedir

    return statedir.snapshot_horizon(
        spark, os.path.join(journal_dir, "_head")
    )


def _attempted_runs(
    spark: SparkSession, journal_dir: str, horizon: int
) -> set[int]:
    """Run ids that have WRITTEN their partition (committed rows or not) —
    the replay-validation set: a no-op run journals zero rows but its
    empty ``run_id=N`` directory still proves the id was used, so an
    at-least-once redelivery of that batch must idempotently no-op, not
    be refused as a reuse. Compacted-away dirs (``<= horizon``) are crash
    debris awaiting deletion and excluded."""
    from .. import statedir

    return set(
        statedir.numbered_dirs(spark, journal_dir, "run_id=", above=horizon)
    )


def _read_journal(
    spark: SparkSession,
    journal_dir: str,
    before_run: int | None,
    keep_run: bool = False,
):
    """FS-portable journal read via the shared state classifier
    (``io.read_parquet_state`` — the ingest ledger uses the same one).
    After ``compact_journal``, the read is (HEAD snapshot at the horizon)
    ∪ (run partitions strictly above it) — run dirs at or below the
    horizon are crash debris from an interrupted compaction and are
    excluded rather than double-counted. ``before_run`` keeps only runs
    with a strictly smaller id — the pre-run manifest a (re)play of that
    run decides against (snapshot rows carry their original committing
    run id, so the filter composes)."""
    import os

    from pyspark.sql import functions as F

    from ..io import read_parquet_state

    horizon = _journal_horizon(spark, journal_dir)
    frames = []
    if horizon >= 0:
        snap = read_parquet_state(
            spark, os.path.join(journal_dir, "_head", f"upto={horizon}")
        )
        if snap is not None:
            frames.append(snap.select("path", "digest", "run_id"))
    runs = read_parquet_state(spark, journal_dir)
    if runs is not None:
        if horizon >= 0:
            runs = runs.filter(F.col("run_id") > horizon)
        frames.append(runs.select("path", "digest", "run_id"))
    if not frames:
        return None
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    if before_run is not None:
        df = df.filter(F.col("run_id") < before_run)
    return df if keep_run else df.drop("run_id")
