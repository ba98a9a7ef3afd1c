"""Bloom-sidecar lifecycle for the ingest digest ledger
(``CurationConfig.ledger_bloom``) — the "answer the common case without
reading the state" layer over the cross-run exact-dedup leg.

Cost model at 100 TB: every micro-batch asks "which of my digests has
ANY prior batch admitted". The scan-state join flip already reduced
that from shuffle-the-ledger to scan-the-ledger; this sidecar removes
the scan too for the overwhelmingly common all-new batch: a bitmap of
~10 bits per admitted doc (12.5 MB at 10^7 docs, capped at 1 GiB by
``bloom.MAX_BITS``) probes the batch Arrow-side, docs it rejects are
PROVABLY never-admitted (no false negatives — the dedup guarantee is
untouched), and only the fpp-sized remainder pays the ledger
confirm-join. False positives only ever cost a redundant confirm.

Break-even honesty: the sidecar's per-batch cost is ~fixed (Arrow probe
+ one gate count + ``m/8`` bytes of epoch IO) while the cost it avoids
(the ledger scan) grows with the corpus — measured at a 1.2M-digest
ledger the plain scan-state join still wins (stress_r12
``ledger_bloom_ingest``: fresh batch 19.1 s plain vs 23.3 s bloom
steady, maybe=0), so this is the ≥10^8-digest regime's tool. At 10^9
admitted docs the scan is ~16 GB/batch vs ~1.25 GB of bitmap IO.

Layout (sibling of ``ledger/`` — a fold of the ledger must not sweep
it, the ``fps_meta`` convention)::

    <state_dir>/ledger_bloom/
      meta.json            m, k, expected_items, fpp, archive_sig,
                           merged_upto, legacy_merged
      bits/epoch=N/        bits.bin + _SUCCESS  (marker-last validity)
      merged/batch_id=B    empty marker: batch B's digests are in bits
                           — only the TAIL above meta.merged_upto; at
                           each epoch commit the contiguous marker
                           prefix folds into the meta horizon and the
                           folded marker files are deleted (merged/
                           stays O(gap), never O(total batches))

Crash ordering — the SUPERSET invariant: bits may only ever contain
digests the ledger holds or once held or is about to hold, plus
arbitrary extra bits; extra bits are the false-positive direction and
cost a confirm-join, MISSING bits are false negatives and silently
re-admit duplicates. Therefore:

- the per-batch merge runs BEFORE the ledger append (a crash between
  them leaves a superset bitmap; the replayed batch re-merges the same
  positions — bit-OR is idempotent);
- epoch dirs commit marker-last (``_SUCCESS`` touched after
  ``bits.bin`` lands) and old epochs are deleted only after the new one
  is valid — a partial epoch copy can never be adopted;
- catch-up at load time covers every ATTEMPTED ledger batch dir with no
  ``merged/`` marker (bloom toggled on over an existing state dir;
  attempted, not job-committed — a retraction's partition-swap rewrite
  leaves no per-child marker, and skipping those rows would be a false
  negative), AND — the subtle hole — rows
  whose per-batch dir ``compact_ingest_state`` already folded away:
  those are found by re-scanning the archive's ``src_batch_id``
  provenance whenever the archive's file signature changed since the
  meta last recorded it (one provenance-column scan per fold,
  amortized; legacy rows with null provenance merge once under the
  ``batch_id=-2`` marker).

Retraction/prune REMOVE ledger rows and deliberately do not touch the
bitmap — a stale set bit is the safe direction (the confirm-join gives
the correct answer) and clearing bits is impossible in a plain Bloom
filter. ``rebuild_ledger_bloom`` resets the sidecar from the live
ledger (post-takedown hygiene, resizing after corpus growth); the
``ingest_state_report`` row carries the saturation-implied fpp so the
operator can see when a rebuild pays.

Single-writer: every entry point here runs under the state dir's writer
lease held by the calling verb (``_ingest_batch`` /
``rebuild_ledger_bloom``)."""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import numpy as np
from pyspark.sql import functions as F

from .. import fsutil, statedir
from ..functions import bloom

#: above this many collected POSITION rows (k × n_rows — the driver
#: pays k py4j rows per digest, not one) the per-batch merge computes
#: partition bitmaps executor-side and tree-reduces them instead of
#: collecting positions to the driver
_COLLECT_MAX_POSITIONS = 2_000_000

#: total bytes of in-flight per-partition bitmaps the executor-side
#: reduce may materialize at once: the bitmap path yields one m/8-byte
#: array PER PARTITION, and with a big sidecar (m/8 ≈ 287 MB at 240M
#: expected items) 32 concurrent tasks is ~9 GB through one JVM — a
#: measured heap OOM in the 120M-row trend run, not a hypothetical. The
#: digest frame is coalesced to ≤ budget/(m/8) partitions first; each
#: worker streams its digests in bounded chunks (below) so partition
#: size never enters the memory equation.
_BITMAP_REDUCE_BUDGET = 2 << 30

#: digests hashed per numpy batch inside a bitmap-path worker — bounds
#: the Python-side chunk list and the k×chunk probe matrix regardless
#: of how many rows the coalesced partition holds
_BITMAP_CHUNK_ROWS = 500_000

#: bitmaps bigger than this collect as SLICES merged executor-side
#: (reduceByKey on the slice index) and streamed to the driver one at a
#: time — a whole-bitmap treeReduce collects every final partial in one
#: job, and at m/8 ≈ 287 MB two partials already breach Spark's 1 GiB
#: driver.maxResultSize default (the 120M-row trend run's second
#: failure mode, after the heap OOM). One slice is the largest single
#: task result the path ever returns.
_BITMAP_SLICE_BYTES = 64 << 20

#: above this bitmap size (m/8 bytes), per-batch merges commit a DELTA
#: file (the batch's k×n positions, ~2.4 MB at 50k docs) instead of
#: rewriting the full bitmap as a new epoch — measured round 13: the
#: break-even trend showed bloom-steady cost GROWING with ledger size
#: (10.2 s at 1.2M rows → 14.7 s at 12M vs plain 9.7 → 5.8) because
#: every m-proportional per-batch cost (bitmap read, broadcast, and the
#: full m/8 epoch write) scales with the corpus while the scan-state
#: plain path's ledger read stays nearly flat. The write is the
#: removable third: a batch's information content is its positions, so
#: log those and fold into a full epoch periodically. Below the
#: threshold the bitmap write is trivially small and the single-file
#: epoch is simpler — small sidecars keep the round-12 behavior.
_DELTA_ABOVE_BYTES = 8 << 20

#: committed delta files before the next delta commit folds them into a
#: full epoch (the fold reuses _commit_epoch, whose sweep then deletes
#: every delta — the in-memory bits are a superset of all landed deltas
#: under the single-writer lease, so the sweep can never lose coverage)
_DELTA_FOLD_COUNT = 64

#: merged/ marker id for legacy archive rows with null src_batch_id
_LEGACY_ID = -2


def _paths(ledger_dir: str) -> SimpleNamespace:
    state_dir = os.path.dirname(ledger_dir.rstrip("/"))
    base = os.path.join(state_dir, "ledger_bloom")
    return SimpleNamespace(
        base=base,
        bits=f"{base}/bits",
        delta=f"{base}/delta",
        merged=f"{base}/merged",
        meta=f"{base}/meta.json",
    )


def _delta_files(spark, paths) -> dict[int, str]:
    """Committed per-batch position deltas (``delta/batch=<id>.bin``) —
    validity = existence at the FINAL name (each is written to a dot-tmp
    and renamed, so a torn write never carries the name)."""
    out: dict[int, str] = {}
    for name in fsutil.child_names(spark, paths.delta):
        if not (name.startswith("batch=") and name.endswith(".bin")):
            continue
        try:
            out[int(name[len("batch="):-len(".bin")])] = name
        except ValueError:
            continue
    return out


def _read_bits(spark, paths, m: int) -> tuple[np.ndarray, int]:
    """The LIVE bitmap = the committed epoch snapshot OR'd with every
    committed delta file, plus the epoch id (-1 when none). This is the
    one loader — load_state, the fsck probe, and report_detail all read
    through it, or a delta-era sidecar would hand a snapshot-only view
    to whoever forgot the deltas (false negatives in the fsck, stale
    saturation in the report). Raises ValueError on a size-mismatched
    bitmap or out-of-range delta positions (corrupt/mis-sized sidecar —
    rebuild_ledger_bloom is the remedy, and silently masking either
    direction would break the no-false-negative contract)."""
    epoch = _live_epoch(spark, paths.bits)
    if epoch >= 0:
        data = fsutil.read_bytes(spark, f"{paths.bits}/epoch={epoch}/bits.bin")
        bits = np.frombuffer(data, dtype=np.uint8).copy()
        if bits.size != m // 8:
            raise ValueError(
                f"ledger_bloom bitmap at epoch {epoch} is {bits.size} "
                f"bytes, meta says {m // 8} — corrupt sidecar; run "
                "rebuild_ledger_bloom"
            )
    else:
        bits = bloom.new_bits(m)
    for _bid, name in sorted(_delta_files(spark, paths).items()):
        raw = fsutil.read_bytes(spark, f"{paths.delta}/{name}")
        if not raw:
            continue
        pos = np.frombuffer(raw, dtype=np.int64)
        if pos.size and (int(pos.max()) >= m or int(pos.min()) < 0):
            raise ValueError(
                f"ledger_bloom delta {name} holds positions outside "
                f"m={m} — sidecar written at a different sizing; run "
                "rebuild_ledger_bloom"
            )
        bloom.set_positions(bits, pos)
    return bits, epoch


def _live_epoch(spark, bits_dir: str) -> int:
    best = -1
    for name in fsutil.child_names(spark, bits_dir):
        if not name.startswith("epoch="):
            continue
        try:
            e = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if e > best and fsutil.exists(
            spark, f"{bits_dir}/{name}/{statedir.MARKER}"
        ):
            best = e
    return best


def _merged_info(spark, paths, meta: dict) -> SimpleNamespace:
    """Merged-batch coverage = a folded horizon in the meta
    (``merged_upto`` — every id ≤ N is in the bits) plus the unfolded
    tail of per-batch marker files (marker-LAST validity preserved for
    exactly the ids a crash could still be mid-merging) plus the
    ``legacy_merged`` flag for the null-provenance archive rows."""
    tail: set[int] = set()
    legacy = bool(meta.get("legacy_merged", False))
    for name in fsutil.child_names(spark, paths.merged):
        if not name.startswith("batch_id="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b == _LEGACY_ID:
            legacy = True
        else:
            tail.add(b)
    return SimpleNamespace(
        upto=int(meta.get("merged_upto", -1)), tail=tail, legacy=legacy
    )


def _covered(info: SimpleNamespace, b: int) -> bool:
    if b == _LEGACY_ID:
        return info.legacy
    return b <= info.upto or b in info.tail


def _merged_count(info: SimpleNamespace) -> int:
    """Merged-batch figure for reports: horizon span + unfolded tail
    (an upper bound when folded ids were sparse — the fold keeps no
    per-id record below the horizon, by design)."""
    return (info.upto + 1 if info.upto >= 0 else 0) + len(
        [t for t in info.tail if t > info.upto]
    )


def _ledger_batches(spark, ledger_dir: str) -> list[int]:
    """ALL attempted per-batch ledger dirs (existence, not job-commit
    markers): a retraction's ``swap_partitions`` rewrite replaces a
    batch dir WITHOUT a per-child ``_SUCCESS`` (the job marker lands in
    the swap sidecar root), and ``_read_state`` reads such dirs — so a
    marker rule here would skip exactly those rows and hand out FALSE
    NEGATIVES. Merging a killed-partial dir is the safe direction
    (superset; its replay re-merges the full row set via the per-batch
    ``merge_batch`` before overwriting the ledger)."""
    out = []
    for name in fsutil.child_names(spark, ledger_dir):
        if not name.startswith("batch_id="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b >= 0:
            out.append(b)
    return sorted(out)


def _archive_sig(spark, ledger_dir: str) -> str | None:
    """Cheap change-detector for the fold archive: sorted child names +
    total file count/bytes. A fold rewrites the archive's files, so any
    fold flips this; content-identical rewrites merely re-trigger one
    idempotent provenance scan."""
    arch = f"{ledger_dir.rstrip('/')}/batch_id=-1"
    if not fsutil.is_dir(spark, arch):
        return None
    names = ",".join(sorted(fsutil.child_names(spark, arch)))
    files, size = fsutil.parquet_usage(spark, arch)
    return f"{files}:{size}:{names}"


def _write_meta(spark, paths, meta: dict) -> None:
    tmp = paths.meta + ".tmp"
    fsutil.write_text(spark, tmp, json.dumps(meta))
    fsutil.delete(spark, paths.meta)
    fsutil.rename(spark, tmp, paths.meta)


def _positions_for(df, digest_col: str, m: int, k: int,
                   n_rows: int) -> np.ndarray | list[int]:
    """Either a position list (small frames — one collect of k×n
    distinct longs) or a full bitmap (large frames — per-partition
    bitmaps OR-reduced executor-side, m/8 bytes per partition, never
    k×n rows to the driver). The gate counts POSITIONS (k × n_rows),
    not input rows — at k=6 a row-count gate would let ~12M exploded
    py4j Rows reach the driver (ADVICE r12).

    The bitmap path is memory-bounded in BOTH directions (round 13 —
    the 120M-row trend run OOMed the sandbox JVM without this): the
    frame is coalesced so at most ``_BITMAP_REDUCE_BUDGET`` bytes of
    per-partition bitmaps are in flight at once, and each worker hashes
    its digests in ``_BITMAP_CHUNK_ROWS`` slices so neither the Python
    chunk list nor the k×chunk probe matrix scales with partition
    size. Fewer, bigger partitions cost wall-clock parallelism only on
    the rare huge-catch-up/rebuild path — per-batch merges stay under
    the position-collect gate."""
    if n_rows * k <= _COLLECT_MAX_POSITIONS:
        rows = df.select(
            F.explode(
                bloom.digest_positions(F.col(digest_col), m, k)
            ).alias("p")
        ).distinct().collect()
        return [r.p for r in rows]

    def _part_bits_arr(it):
        bits = bloom.new_bits(m)
        chunk: list = []
        for row in it:
            chunk.append(row[0])
            if len(chunk) >= _BITMAP_CHUNK_ROWS:
                bloom.set_positions(
                    bits, bloom._probe_matrix(chunk, m, k).ravel()
                )
                chunk = []
        if chunk:
            bloom.set_positions(
                bits, bloom._probe_matrix(chunk, m, k).ravel()
            )
        return bits

    rdd = df.select(digest_col).rdd
    max_parts = max(1, int(_BITMAP_REDUCE_BUDGET // max(m // 8, 1)))
    if rdd.getNumPartitions() > max_parts:
        rdd = rdd.coalesce(max_parts)
    sl = _BITMAP_SLICE_BYTES
    n_slices = max(1, -(-(m // 8) // sl))
    if n_slices == 1:
        return (
            rdd.mapPartitions(lambda it: [_part_bits_arr(it)])
            .treeReduce(np.bitwise_or)
        )

    # sliced merge (big bitmaps): each partition emits (slice_idx,
    # bytes) pairs, slices OR-combine executor-side under reduceByKey,
    # and the driver assembles them one slice per fetch — no collect
    # ever carries more than one slice, regardless of m
    def _part_slices(it):
        bits = _part_bits_arr(it)
        for s in range(n_slices):
            part = bits[s * sl:(s + 1) * sl]
            if part.any():
                yield (s, part.tobytes())

    def _or_bytes(a, b):
        return (
            np.frombuffer(a, dtype=np.uint8)
            | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    merged = rdd.mapPartitions(_part_slices).reduceByKey(
        _or_bytes, numPartitions=min(n_slices, 32)
    )
    bits = bloom.new_bits(m)
    for s, blob in merged.toLocalIterator():
        arr = np.frombuffer(blob, dtype=np.uint8)
        bits[s * sl:s * sl + arr.size] |= arr
    return bits


def _merge_into(st, contribution) -> None:
    if isinstance(contribution, np.ndarray):
        np.bitwise_or(st.bits, contribution, out=st.bits)
    else:
        bloom.set_positions(st.bits, contribution)


def _commit_epoch(spark, st, new_marker_ids) -> None:
    """Land the updated bitmap: new epoch dir (bits.bin then marker),
    then the merged/ markers, then sweep superseded + killed epochs AND
    every committed delta file (``st.bits`` is a superset of all landed
    deltas under the single-writer lease — the epoch now carries their
    coverage), then fold the marker tail into the meta horizon."""
    new_epoch = st.epoch + 1
    edir = f"{st.paths.bits}/epoch={new_epoch}"
    fsutil.mkdirs(spark, edir)
    fsutil.write_bytes(spark, f"{edir}/bits.bin", st.bits.tobytes())
    fsutil.touch(spark, f"{edir}/{statedir.MARKER}")
    for b in new_marker_ids:
        fsutil.touch(spark, f"{st.paths.merged}/batch_id={int(b)}")
    for name in fsutil.child_names(spark, st.paths.bits):
        if not name.startswith("epoch="):
            continue
        try:
            e = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if e < new_epoch:
            fsutil.delete(spark, f"{st.paths.bits}/{name}")
    for name in _delta_files(spark, st.paths).values():
        fsutil.delete(spark, f"{st.paths.delta}/{name}")
    st.epoch = new_epoch
    _fold_markers(spark, st)


def _commit_delta(spark, st, batch_id: int, positions) -> None:
    """Land one batch's merge as a position DELTA instead of a full
    bitmap rewrite (the big-sidecar path — see ``_DELTA_ABOVE_BYTES``):
    write the k×n distinct positions to a dot-tmp, rename to
    ``delta/batch=<id>.bin`` (validity = the final name; a torn write
    never carries it), then the batch's merged/ marker — the same
    bits-before-marker, marker-before-ledger-append ordering the epoch
    path keeps, so the superset invariant is unchanged. Every
    ``_DELTA_FOLD_COUNT`` deltas, fold into a full epoch (whose sweep
    deletes them) so load-time reassembly stays O(fold window).

    A replay whose delta ALREADY landed falls back to a full epoch
    commit (round-14 ADVICE): the positions are NOT deterministic per
    batch id — between a crashed attempt (delta + marker landed,
    ledger append not) and its replay, a maintenance verb can change
    state (e.g. retract_documents removes the ledger doc that
    near-dup-dropped a batch doc, so the replay admits a digest the
    stale delta never saw; the marker already claims coverage, so no
    catch-up rescans — a persistent false negative). Skipping the
    rewrite keeps the stale positions; delete-then-rename opens a
    crash window where the marker covers a missing delta. The epoch
    path has neither hole: ``st.bits`` is old-delta ∪ replay-positions
    (load read the delta, ``_merge_batch`` OR'd the contribution), the
    epoch lands before its sweep deletes the stale file, and a crash
    anywhere leaves redundant coverage only. Replays are rare, so the
    m/8 rewrite is an acceptable cost."""
    fsutil.mkdirs(spark, st.paths.delta)
    final = f"{st.paths.delta}/batch={int(batch_id)}.bin"
    if fsutil.exists(spark, final):
        _commit_epoch(spark, st, [int(batch_id)])
        return
    arr = np.unique(np.asarray(list(positions), dtype=np.int64))
    tmp = f"{st.paths.delta}/.batch={int(batch_id)}.bin.tmp"
    fsutil.write_bytes(spark, tmp, arr.tobytes())
    fsutil.rename(spark, tmp, final)
    fsutil.touch(spark, f"{st.paths.merged}/batch_id={int(batch_id)}")
    if len(_delta_files(spark, st.paths)) >= _DELTA_FOLD_COUNT:
        _commit_epoch(spark, st, [])


def _fold_markers(spark, st) -> None:
    """ADVICE r12: ``merged/`` would otherwise grow one empty marker per
    micro-batch forever — an O(total-batches) listing on every load and
    an unbounded tiny-object count on object stores. At each epoch
    commit, fold the contiguous marker prefix into ``meta.merged_upto``
    (= every id ≤ N is in the bits) and delete the folded marker files
    — meta FIRST, then markers: that crash window leaves redundant
    coverage, while the reverse would uncover merged batches (their
    attempted dirs would re-scan idempotently — superset-safe, but the
    fold must never depend on it). The horizon only advances over ids
    that are marked or have NO attempted ledger dir (an id never
    assigned cannot land later — batch ids are monotone under the run
    discipline — and a replayed id re-merges through ``merge_batch``
    regardless of coverage), so a bloom-off window's unmarked dirs pin
    the horizon below themselves until catch-up merges them.
    Marker-LAST validity is preserved for the unfolded tail; the
    legacy archive marker folds into ``meta.legacy_merged``."""
    info = _merged_info(spark, st.paths, st.meta)
    attempted = sorted(set(_ledger_batches(spark, st.ledger_dir)))
    upto = info.upto
    for b in sorted(info.tail):
        if b <= upto:
            continue
        if any(upto < a < b and a not in info.tail for a in attempted):
            break
        upto = b
    fold_legacy = info.legacy and not st.meta.get("legacy_merged", False)
    if upto == info.upto and not fold_legacy:
        # nothing newly foldable; still sweep tail markers a prior
        # fold's crash window left behind (≤ the recorded horizon)
        for b in info.tail:
            if b <= info.upto:
                fsutil.delete(spark, f"{st.paths.merged}/batch_id={b}")
        return
    st.meta["merged_upto"] = upto
    if info.legacy:
        st.meta["legacy_merged"] = True
    _write_meta(spark, st.paths, st.meta)
    for b in info.tail:
        if b <= upto:
            fsutil.delete(spark, f"{st.paths.merged}/batch_id={b}")
    if info.legacy:
        fsutil.delete(spark, f"{st.paths.merged}/batch_id={_LEGACY_ID}")


def load_state(spark, ledger_dir: str, cfg, current_batch=None):
    """Load (or create) the sidecar and catch it up with every committed
    ledger batch except ``current_batch`` (a replayed batch must decide
    against the pre-batch state; its own crashed attempt's bits are
    harmless superset). Returns a mutable state handle
    ``(bits, m, k, epoch, paths)`` for the probe + merge steps."""
    paths = _paths(ledger_dir)
    want_items = int(cfg.ledger_bloom_expected_items)
    want_fpp = float(cfg.ledger_bloom_fpp)
    m, k = bloom.bloom_params(want_items, want_fpp)

    raw = fsutil.read_text(spark, paths.meta)
    if raw is None:
        meta = {"m": m, "k": k, "expected_items": want_items,
                "fpp": want_fpp, "archive_sig": None}
        fsutil.mkdirs(spark, paths.base)
        _write_meta(spark, paths, meta)
    else:
        meta = json.loads(raw)
        if int(meta["m"]) != m or int(meta["k"]) != k:
            raise ValueError(
                f"ledger_bloom at {paths.base} was sized for "
                f"expected_items={meta['expected_items']} "
                f"fpp={meta['fpp']} (m={meta['m']}, k={meta['k']}) but "
                f"the config asks for expected_items={want_items} "
                f"fpp={want_fpp} (m={m}, k={k}) — positions are not "
                "comparable across sizes, which would silently break "
                "the no-false-negative guarantee; run "
                "rebuild_ledger_bloom to resize, or match the config"
            )
        m, k = int(meta["m"]), int(meta["k"])

    bits, epoch = _read_bits(spark, paths, m)
    st = SimpleNamespace(bits=bits, m=m, k=k, epoch=epoch, paths=paths,
                         meta=meta, ledger_dir=ledger_dir)

    # catch-up 1: attempted per-batch ledger dirs with no merged
    # coverage. A killed batch dir holding ZERO data files (only
    # _temporary debris) is skipped, not read — it holds no digests so
    # skipping preserves the superset invariant, while reading it would
    # raise 'unable to infer schema' and wedge every bloom-enabled
    # ingest except that batch's own replay (ADVICE r12).
    merged = _merged_info(spark, paths, meta)
    missing = [
        b for b in _ledger_batches(spark, ledger_dir)
        if not _covered(merged, b) and b != current_batch
        and fsutil.parquet_file_count(
            spark, f"{ledger_dir.rstrip('/')}/batch_id={b}"
        ) > 0
    ]
    new_markers: list[int] = []
    if missing:
        df = spark.read.option("mergeSchema", "true").parquet(
            *[f"{ledger_dir.rstrip('/')}/batch_id={b}" for b in missing]
        ).select("digest")
        _merge_into(st, _positions_for(df, "digest", m, k, df.count()))
        new_markers.extend(missing)

    # catch-up 2: batches whose dirs a fold already swept — visible only
    # through the archive's src_batch_id provenance; scanned only when
    # the archive changed since the meta last looked
    sig = _archive_sig(spark, ledger_dir)
    if (
        sig is not None
        and sig != meta.get("archive_sig")
        and fsutil.parquet_file_count(
            spark, f"{ledger_dir.rstrip('/')}/batch_id=-1"
        ) > 0
    ):
        arch = spark.read.option("mergeSchema", "true").parquet(
            f"{ledger_dir.rstrip('/')}/batch_id=-1"
        )
        prov = (
            F.coalesce(F.col("src_batch_id").cast("long"),
                       F.lit(_LEGACY_ID))
            if "src_batch_id" in arch.columns else F.lit(_LEGACY_ID)
        )
        arch = arch.select(F.col("digest"), prov.alias("src"))
        src_ids = {int(r.src) for r in arch.select("src").distinct().collect()}
        hole = sorted(
            s for s in src_ids
            if not _covered(merged, s) and s != current_batch
            and s not in set(new_markers)
        )
        if hole:
            df = arch.filter(F.col("src").isin(hole)).select("digest")
            _merge_into(st, _positions_for(df, "digest", m, k, df.count()))
            new_markers.extend(hole)
        new_sig = sig
    else:
        new_sig = None

    if new_markers:
        _commit_epoch(spark, st, new_markers)
    if new_sig is not None:
        # STRICTLY AFTER the epoch/markers commit: recording the sig
        # first would let a crash in between leave "archive covered" in
        # the meta while the bits lack the hole digests — an
        # unreachable-by-rescan false negative. This order's crash
        # window (markers committed, sig stale) merely re-scans the
        # archive provenance once more, which no-ops idempotently.
        meta["archive_sig"] = new_sig
        _write_meta(spark, paths, meta)
    return st


def merge_batch(spark, st, batch_id: int, digests_df, n_rows: int) -> dict:
    """Fold this batch's admitted digests into the bitmap and commit —
    a new epoch (small sidecars, or a bitmap-sized contribution), or a
    position delta (big sidecars under ``_DELTA_ABOVE_BYTES``: a 50k-doc
    batch's positions are ~2.4 MB where the full bitmap rewrite is
    m/8 — the round-13 trend's growing per-batch cost). Either way the
    commit MUST run before the batch's ledger append (the superset
    crash ordering in the module docstring)."""
    contribution = _positions_for(digests_df, "digest", st.m, st.k, n_rows)
    _merge_into(st, contribution)
    if (st.m // 8 > _DELTA_ABOVE_BYTES
            and not isinstance(contribution, np.ndarray)):
        _commit_delta(spark, st, batch_id, contribution)
    else:
        _commit_epoch(spark, st, [batch_id])
    return {"epoch": st.epoch, "rows": int(n_rows)}


def rebuild_ledger_bloom(spark, state_dir: str, cfg, lease=None) -> dict:
    """Reset the sidecar and rebuild it from the LIVE ledger — resizing
    (config change), post-retraction hygiene (shed stale bits), or
    recovery from a corrupt sidecar. Runs under the state dir's writer
    lease like every maintenance verb."""
    base = state_dir.rstrip("/")
    ledger_dir = os.path.join(base, "ledger")
    with statedir.lease_scope(spark, base, "rebuild_ledger_bloom",
                              lease=lease):
        paths = _paths(ledger_dir)
        fsutil.delete(spark, paths.base)
        st = load_state(spark, ledger_dir, cfg)
        return {
            "m": st.m, "k": st.k, "epoch": st.epoch,
            "merged_batches": _merged_count(
                _merged_info(spark, paths, st.meta)
            ),
            "saturation": bloom.saturation(st.bits),
            "implied_fpp": bloom.saturation(st.bits) ** st.k,
        }


def report_detail(spark, state_dir: str) -> str | None:
    """One-line health summary for ``ingest_state_report``: epoch, size,
    merged batches, and the saturation-implied fpp (the resize/rebuild
    signal — mirrors the index's ``appended_staleness`` convention)."""
    paths = _paths(os.path.join(state_dir.rstrip("/"), "ledger"))
    raw = fsutil.read_text(spark, paths.meta)
    if raw is None:
        return None
    meta = json.loads(raw)
    n_delta = len(_delta_files(spark, paths))
    try:
        # the shared loader: saturation must include the delta files or
        # a delta-era report understates fill until the next fold
        bits, epoch = _read_bits(spark, paths, int(meta["m"]))
        sat = bloom.saturation(bits)
        health = ""
    except Exception as exc:  # noqa: BLE001 — report, never crash a report
        epoch = _live_epoch(spark, paths.bits)
        sat = 0.0
        health = f" UNREADABLE ({type(exc).__name__}) "
    k = int(meta["k"])
    info = _merged_info(spark, paths, meta)
    return (
        f"epoch={epoch} m={meta['m']} k={k} deltas={n_delta} "
        f"merged_batches={_merged_count(info)} "
        f"merged_upto={info.upto} marker_tail={len(info.tail)} "
        f"saturation={sat:.4f} implied_fpp={sat ** k:.6f}{health} "
        f"(nominal {meta['fpp']}; rebuild_ledger_bloom to resize)"
    )
