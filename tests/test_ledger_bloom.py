"""Ledger Bloom sidecar (pipelines/ledger_bloom.py +
CurationConfig.ledger_bloom): twin equality with the bloom-off path,
replay idempotence, catch-up over pre-existing state INCLUDING batches a
fold already archived, retract-then-resubmit admissibility, the rebuild
verb, config-mismatch refusal, and the report row."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
    CurationConfig,
    _ingest_batch,
)

# built directly — StructType.fromDDL needs an active session, which
# does not exist at collection time
SCH = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _lines(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r),) for r in rows], "value string"
    )


def _doc(i, tag=""):
    return {"doc_id": i,
            "text": f"archival document {tag} number {i} about county "
                    f"bridge engineering load tables and river surveys "
                    f"kept in the district office for inspection"}


def _cfg(**kw):
    return CurationConfig(min_quality=0.0, neardup_method="none", **kw)


def _ids(spark, state):
    return sorted(
        r.doc_id
        for r in spark.read.parquet(f"{state}/corpus").select(
            "doc_id"
        ).collect()
    )


def test_bloom_twin_matches_plain_path_and_skips_ledger(spark, tmp_path):
    # the dedup DECISIONS must be byte-identical with the sidecar on —
    # bloom only short-circuits reads, never changes answers (the
    # established expr/arrow twin-equality convention)
    on = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    off = _cfg()
    s_on, s_off = str(tmp_path / "on"), str(tmp_path / "off")

    b0 = [_doc(i) for i in range(6)]
    # batch 1: 3 new docs + 2 cross-batch dups (same text, NEW ids)
    b1 = [_doc(i) for i in range(10, 13)] + [
        {"doc_id": 90, "text": _doc(1)["text"]},
        {"doc_id": 91, "text": _doc(4)["text"]},
    ]
    b2 = [{"doc_id": 95, "text": _doc(11)["text"]}]  # all dup

    reps_on, reps_off = [], []
    for bid, batch in ((0, b0), (1, b1), (2, b2)):
        reps_on.append(_ingest_batch(spark, _lines(spark, batch), bid,
                                     on, s_on, SCH))
        reps_off.append(_ingest_batch(spark, _lines(spark, batch), bid,
                                      off, s_off, SCH))
    for a, b in zip(reps_on, reps_off):
        assert a["admitted"] == b["admitted"]
    assert _ids(spark, s_on) == _ids(spark, s_off)

    # report plumbing: batch 0 had no ledger to consult (maybe=0), the
    # dup batches needed confirms for exactly the colliding digests
    # (maybe >= dup count; fpp can add a few)
    assert reps_on[0]["ledger_bloom"]["maybe"] == 0
    assert reps_on[1]["ledger_bloom"]["maybe"] >= 2
    assert reps_on[2]["ledger_bloom"]["maybe"] >= 1
    assert "ledger_bloom" not in reps_off[0]
    # epochs advance per merge
    assert (reps_on[2]["ledger_bloom"]["epoch"]
            > reps_on[0]["ledger_bloom"]["epoch"])

    # replay of batch 1 (at-least-once) decides identically — its own
    # crashed-attempt bits are superset-only (confirm-join excludes the
    # own-batch ledger rows)
    rep = _ingest_batch(spark, _lines(spark, b1), 1, on, s_on, SCH)
    assert rep["admitted"] == reps_on[1]["admitted"]
    assert _ids(spark, s_on) == _ids(spark, s_off)


def test_bloom_catch_up_covers_preexisting_and_folded_batches(
    spark, tmp_path
):
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        compact_ingest_state,
    )

    # batches 0-1 land WITHOUT the sidecar; batch 1 then folds into the
    # batch_id=-1 archive — when bloom turns on later it must cover
    # both the surviving per-batch dir and the archived rows (the
    # src_batch_id provenance sweep), or the dup below would silently
    # re-admit (a false negative, the one failure bloom must never have)
    state = str(tmp_path / "state")
    off, on = _cfg(), _cfg(ledger_bloom=True,
                           ledger_bloom_expected_items=10_000)
    _ingest_batch(spark, _lines(spark, [_doc(1), _doc(2)]), 0, off,
                  state, SCH)
    _ingest_batch(spark, _lines(spark, [_doc(3, "folded")]), 1, off,
                  state, SCH)
    compact_ingest_state(spark, state, max_files=0)

    dup_live = {"doc_id": 80, "text": _doc(1)["text"]}
    dup_arch = {"doc_id": 81, "text": _doc(3, "folded")["text"]}
    fresh = _doc(50, "fresh")
    rep = _ingest_batch(
        spark, _lines(spark, [dup_live, dup_arch, fresh]), 2, on,
        state, SCH,
    )
    assert rep["admitted"] == 1
    assert rep["ledger_bloom"]["maybe"] >= 2
    assert 80 not in _ids(spark, state) and 81 not in _ids(spark, state)
    assert 50 in _ids(spark, state)


def test_bloom_retract_resubmit_rebuild_and_report(spark, tmp_path):
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        ingest_state_report,
        retract_documents,
    )
    from pulfa_sausage_factory_spark.pipelines.ledger_bloom import (
        rebuild_ledger_bloom,
    )

    state = str(tmp_path / "state")
    cfg = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    _ingest_batch(spark, _lines(spark, [_doc(1), _doc(2)]), 0, cfg,
                  state, SCH)

    # takedown leaves a stale set bit (the safe direction) — the
    # re-submission probes MAYBE, the confirm-join finds the digest
    # scrubbed, and the doc is admitted per the documented semantics
    assert retract_documents(spark, state, [1], cfg)["residual"] == 0
    rep = _ingest_batch(spark, _lines(spark, [_doc(1)]), 1, cfg,
                        state, SCH)
    assert rep["admitted"] == 1
    assert rep["ledger_bloom"]["maybe"] >= 1

    # the rebuild verb resets from the live ledger; the report row
    # carries the saturation-implied fpp
    out = rebuild_ledger_bloom(spark, state, cfg)
    assert out["merged_batches"] >= 1 and out["implied_fpp"] < 0.01
    rows = {r.artifact: r for r in ingest_state_report(
        spark, state
    ).collect()}
    assert "ledger_bloom" in rows
    assert "implied_fpp" in rows["ledger_bloom"].detail
    assert rows["ledger_bloom"].bytes > 0

    # ...and the rebuilt sidecar still refuses a byte-identical copy
    rep = _ingest_batch(
        spark, _lines(spark, [{"doc_id": 70, "text": _doc(2)["text"]}]),
        2, cfg, state, SCH,
    )
    assert rep["admitted"] == 0

    # resizing without a rebuild refuses loudly — positions are not
    # comparable across (m, k)
    bigger = _cfg(ledger_bloom=True, ledger_bloom_expected_items=500_000)
    with pytest.raises(ValueError, match="rebuild_ledger_bloom"):
        _ingest_batch(spark, _lines(spark, [_doc(99)]), 3, bigger,
                      state, SCH)
    # rebuild under the new size, then the bigger config ingests fine
    rebuild_ledger_bloom(spark, state, bigger)
    rep = _ingest_batch(spark, _lines(spark, [_doc(99)]), 3, bigger,
                        state, SCH)
    assert rep["admitted"] == 1


def test_bloom_archive_sweep_commits_before_recording_the_sig(
    spark, tmp_path
):
    # crash-ordering pin for the archive provenance sweep: the epoch +
    # merged markers must land BEFORE meta.archive_sig — the reverse
    # order's crash window leaves "archive covered" recorded over bits
    # that miss the hole digests, a false negative no rescan can ever
    # repair. The fixed order's crash window (markers committed, sig
    # stale) must instead re-scan idempotently and still refuse dups.
    import json as _json

    from pulfa_sausage_factory_spark import fsutil
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        compact_ingest_state,
    )
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    state = str(tmp_path / "state")
    off = _cfg()
    on = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    _ingest_batch(spark, _lines(spark, [_doc(1)]), 0, off, state, SCH)
    compact_ingest_state(spark, state, max_files=0)

    # first bloom batch runs the sweep; then simulate the fixed order's
    # crash window by clearing the recorded sig (markers stay)
    _ingest_batch(spark, _lines(spark, [_doc(2)]), 1, on, state, SCH)
    meta_path = f"{state}/ledger_bloom/meta.json"
    meta = _json.loads(fsutil.read_text(spark, meta_path))
    assert meta["archive_sig"] is not None
    meta["archive_sig"] = None
    fsutil.write_text(spark, meta_path, _json.dumps(meta))

    # the stale-sig reload re-scans the archive, no-ops (markers cover
    # it), re-records the sig, and the archived digest still refuses a
    # byte-identical copy
    rep = _ingest_batch(
        spark, _lines(spark, [{"doc_id": 60, "text": _doc(1)["text"]}]),
        2, on, state, SCH,
    )
    assert rep["admitted"] == 0
    meta = _json.loads(fsutil.read_text(spark, meta_path))
    assert meta["archive_sig"] is not None


def test_bloom_null_digest_probes_maybe(spark):
    # ADVICE r12: bloom.py is a public primitive — a null digest must
    # probe MAYBE (the safe confirm-join direction), never raise an
    # opaque whole-stage TypeError inside the pandas UDF
    import numpy as np

    from pulfa_sausage_factory_spark.functions import bloom

    m, k = 1024, 4
    bits = bloom.new_bits(m)
    bloom.set_positions(bits, bloom.positions_of("ab" * 16, m, k))
    got = bloom.bits_contain(bits, ["ab" * 16, None, "cd" * 16], m, k)
    assert got.tolist() == [True, True, False]
    assert bloom.bits_contain(bits, [None], m, k).tolist() == [True]
    assert bloom.bits_contain(bits, [], m, k).size == 0

    probe = bloom.might_contain_udf(spark, bits, m, k)
    df = spark.createDataFrame(
        [("ab" * 16,), (None,), ("cd" * 16,)], "digest string"
    ).select(probe(F.col("digest")).alias("maybe"))
    assert [r.maybe for r in df.collect()] == [True, True, False]
    # numpy result is genuinely boolean (pandas object-dtype trap)
    assert got.dtype == np.bool_


def test_bloom_positions_gate_counts_positions_not_rows(spark):
    # ADVICE r12: the driver-collect path must gate on k×n POSITIONS —
    # at k=6, 400k rows is 2.4M exploded Rows, above the 2M cap, so the
    # executor-side bitmap path must take over
    import numpy as np

    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    m, k = 4096, 6
    df = spark.range(400_000).select(
        F.md5(F.col("id").cast("string")).alias("digest")
    )
    out = lbm._positions_for(df, "digest", m, k, 400_000)
    assert isinstance(out, np.ndarray), (
        "k×n above the cap must use the tree-reduced bitmap path"
    )
    small = lbm._positions_for(df.limit(10), "digest", m, k, 10)
    assert isinstance(small, list) and len(small) <= 60


def test_bloom_merged_markers_fold_into_meta_horizon(spark, tmp_path):
    # ADVICE r12: merged/ must not grow one marker per micro-batch
    # forever — the contiguous prefix folds into meta.merged_upto at
    # epoch commit and the folded marker files are deleted, while
    # coverage (no re-merge, no false negatives) is unchanged
    import json as _json

    from pulfa_sausage_factory_spark import fsutil
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    state = str(tmp_path / "state")
    cfg = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    for bid in range(4):
        _ingest_batch(spark, _lines(spark, [_doc(100 + bid)]), bid, cfg,
                      state, SCH)
    meta = _json.loads(
        fsutil.read_text(spark, f"{state}/ledger_bloom/meta.json")
    )
    assert meta["merged_upto"] == 3
    markers = [
        n for n in fsutil.child_names(spark, f"{state}/ledger_bloom/merged")
        if n.startswith("batch_id=")
    ]
    assert markers == [], f"folded markers must be deleted: {markers}"

    # coverage is intact: a cross-batch dup of every folded batch is
    # still refused, and nothing re-merges on load (epoch stable across
    # a pure-dup batch that admits nothing... epoch does advance per
    # merge_batch, so just assert the dedup decisions)
    dups = [{"doc_id": 900 + i, "text": _doc(100 + i)["text"]}
            for i in range(4)]
    rep = _ingest_batch(spark, _lines(spark, dups), 4, cfg, state, SCH)
    assert rep["admitted"] == 0
    assert rep["ledger_bloom"]["maybe"] >= 4

    # a crash window that left a stale tail marker below the horizon is
    # swept on the next commit, not re-adopted
    fsutil.touch(spark, f"{state}/ledger_bloom/merged/batch_id=1")
    _ingest_batch(spark, _lines(spark, [_doc(300)]), 5, cfg, state, SCH)
    markers = [
        n for n in fsutil.child_names(spark, f"{state}/ledger_bloom/merged")
        if n.startswith("batch_id=")
    ]
    assert markers == []

    # the report row exposes the horizon
    detail = lbm.report_detail(spark, state)
    assert "merged_upto=5" in detail and "marker_tail=0" in detail


def test_bloom_skips_killed_empty_ledger_dir(spark, tmp_path):
    # ADVICE r12: a killed batch's ledger dir holding zero data files
    # must not wedge catch-up with 'unable to infer schema' — it holds
    # no digests, so skipping preserves the superset invariant; the
    # horizon must also NOT fold past it (its replay may still land)
    import json as _json
    import os

    from pulfa_sausage_factory_spark import fsutil
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    state = str(tmp_path / "state")
    cfg = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    _ingest_batch(spark, _lines(spark, [_doc(1)]), 0, cfg, state, SCH)
    # simulate a killed batch 1: attempted dir, no data files
    os.makedirs(f"{state}/ledger/batch_id=1/_temporary", exist_ok=True)
    rep = _ingest_batch(spark, _lines(spark, [_doc(2)]), 2, cfg, state,
                        SCH)
    assert rep["admitted"] == 1
    meta = _json.loads(
        fsutil.read_text(spark, f"{state}/ledger_bloom/meta.json")
    )
    # batch 1's dir is attempted-but-unmarked: the fold stops below it
    assert meta["merged_upto"] == 0
    # ...and batch 1's eventual replay lands normally and unblocks it
    _ingest_batch(spark, _lines(spark, [_doc(3, "late")]), 1, cfg,
                  state, SCH)
    _ingest_batch(spark, _lines(spark, [_doc(4)]), 3, cfg, state, SCH)
    meta = _json.loads(
        fsutil.read_text(spark, f"{state}/ledger_bloom/meta.json")
    )
    assert meta["merged_upto"] == 3


def test_bloom_bitmap_path_is_memory_bounded(spark, monkeypatch):
    # round 13: the bitmap path yields one m/8-byte array per partition
    # — at a 240M-item sidecar (m/8 ≈ 287 MB) 32 concurrent tasks was a
    # MEASURED 9 GB JVM heap OOM in the 120M-row trend run. Pin both
    # bounds: the frame coalesces to ≤ budget/(m/8) partitions, and a
    # worker hashes in _BITMAP_CHUNK_ROWS slices — with bit-identical
    # results to the unbounded shape.
    import numpy as np

    from pulfa_sausage_factory_spark.functions import bloom as bfn
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    m, k = 8192, 4
    df = spark.range(5_000).select(
        F.md5(F.col("id").cast("string")).alias("digest")
    ).repartition(16)

    # force the bitmap path at this test size
    monkeypatch.setattr(lbm, "_COLLECT_MAX_POSITIONS", 0)
    ref = lbm._positions_for(df, "digest", m, k, 5_000)
    assert isinstance(ref, np.ndarray)

    # budget of exactly one bitmap → coalesce(1); tiny chunk rows →
    # many numpy slices per worker; the OR of slices must lose nothing
    monkeypatch.setattr(lbm, "_BITMAP_REDUCE_BUDGET", m // 8)
    monkeypatch.setattr(lbm, "_BITMAP_CHUNK_ROWS", 137)
    bounded = lbm._positions_for(df, "digest", m, k, 5_000)
    assert isinstance(bounded, np.ndarray)
    assert np.array_equal(ref, bounded)

    # the SLICED collect path (big bitmaps: reduceByKey per slice +
    # one-slice-at-a-time driver assembly — the maxResultSize fix) must
    # be bit-identical too, including with multiple partitions in play
    monkeypatch.setattr(lbm, "_BITMAP_REDUCE_BUDGET", 4 * (m // 8))
    monkeypatch.setattr(lbm, "_BITMAP_SLICE_BYTES", 128)
    sliced = lbm._positions_for(df, "digest", m, k, 5_000)
    assert isinstance(sliced, np.ndarray)
    assert np.array_equal(ref, sliced)

    # and the bits really contain every digest (no-false-negative)
    samp = [r.digest for r in df.limit(50).collect()]
    assert all(bfn.bits_contain(sliced, samp, m, k))


def test_bloom_delta_commits_replace_epoch_rewrites(
    spark, tmp_path, monkeypatch
):
    # round 13: above _DELTA_ABOVE_BYTES a per-batch merge lands a
    # position DELTA (~k×n ints) instead of rewriting the full m/8-byte
    # bitmap — the trend measurement showed the epoch rewrite making
    # bloom-steady cost GROW with ledger size. Pin the semantics at a
    # forced-tiny threshold: dedup decisions unchanged, no epoch dir
    # until the fold, coverage markers as usual, fsck green through the
    # shared loader, and the fold sweeping the deltas into one epoch.
    import glob as _glob
    import os as _os

    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        check_ingest_state,
    )

    monkeypatch.setattr(lbm, "_DELTA_ABOVE_BYTES", 0)
    state = str(tmp_path / "state")
    cfg = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    r0 = _ingest_batch(
        spark, _lines(spark, [_doc(i) for i in range(4)]), 0, cfg,
        state, SCH,
    )
    r1 = _ingest_batch(
        spark, _lines(spark, [_doc(0), _doc(10), _doc(11)]), 1, cfg,
        state, SCH,
    )
    # cross-batch exact dup still caught through the delta-backed bits
    assert r0["admitted"] == 4
    assert r1["admitted"] == 2 and r1["ledger_bloom"]["maybe"] >= 1
    assert _ids(spark, state) == [0, 1, 2, 3, 10, 11]

    # both merges landed as deltas; no epoch dir was ever written
    deltas = sorted(_glob.glob(f"{state}/ledger_bloom/delta/batch=*.bin"))
    assert [_os.path.basename(p) for p in deltas] == [
        "batch=0.bin", "batch=1.bin"
    ]
    assert _glob.glob(f"{state}/ledger_bloom/bits/epoch=*") == []

    # fsck probes through the shared loader: every covered digest hits
    rep = {
        (r.check, r.surface): r
        for r in check_ingest_state(spark, state, cfg).collect()
    }
    probe = rep[("bloom_digest_not_in_bits", "ledger_bloom")]
    assert probe.status == "ok", probe.detail
    assert "sampled 6 covered" in probe.detail
    assert lbm.report_detail(spark, state).startswith("epoch=-1")
    assert "deltas=2" in lbm.report_detail(spark, state)

    # a torn delta write (dot-tmp, killed before the rename) is ignored
    # by loads and surfaced by the hygiene leg
    with open(f"{state}/ledger_bloom/delta/.batch=9.bin.tmp", "wb") as fh:
        fh.write(b"\x01\x02")
    r2 = _ingest_batch(
        spark, _lines(spark, [_doc(12)]), 2, cfg, state, SCH,
    )
    assert r2["admitted"] == 1
    rep = {
        (r.check, r.surface): r
        for r in check_ingest_state(spark, state, cfg).collect()
    }
    hyg = rep[("bloom_sidecar_hygiene", "ledger_bloom")]
    assert hyg.status == "warn" and "torn delta tmp" in hyg.detail

    # the fold: at the count threshold the next delta commit folds
    # everything into ONE epoch and sweeps the delta files; dedup still
    # catches a dup of a folded batch's doc afterwards
    monkeypatch.setattr(lbm, "_DELTA_FOLD_COUNT", 2)
    r3 = _ingest_batch(
        spark, _lines(spark, [_doc(13)]), 3, cfg, state, SCH,
    )
    assert r3["admitted"] == 1
    assert _glob.glob(f"{state}/ledger_bloom/delta/batch=*.bin") == []
    epochs = _glob.glob(f"{state}/ledger_bloom/bits/epoch=*")
    assert len(epochs) == 1
    meta = json.loads(
        open(f"{state}/ledger_bloom/meta.json").read()
    )
    assert meta["merged_upto"] == 3
    r4 = _ingest_batch(
        spark, _lines(spark, [_doc(0), _doc(14)]), 4, cfg, state, SCH,
    )
    assert r4["admitted"] == 1
    assert _ids(spark, state) == [0, 1, 2, 3, 10, 11, 12, 13, 14]

    # replay over an EXISTING delta falls back to a full epoch commit
    # (round-14 ADVICE): the replay's positions are not deterministic —
    # a maintenance verb between attempt and replay can change the
    # admitted set — so neither skip (stale positions kept) nor
    # delete-then-rename (marker covers a vanished delta) is safe. The
    # epoch carries old-delta ∪ replay-positions and its sweep removes
    # every delta file with redundant-coverage-only crash windows.
    monkeypatch.setattr(lbm, "_DELTA_FOLD_COUNT", 64)  # no fold below
    r5 = _ingest_batch(
        spark, _lines(spark, [_doc(15)]), 5, cfg, state, SCH,
    )
    assert r5["admitted"] == 1
    dpath = f"{state}/ledger_bloom/delta/batch=5.bin"
    assert _os.path.exists(dpath)
    epochs_before = _glob.glob(f"{state}/ledger_bloom/bits/epoch=*")
    r5b = _ingest_batch(
        spark, _lines(spark, [_doc(15)]), 5, cfg, state, SCH,
    )
    assert r5b["admitted"] == 1  # replay decides identically
    # the replay folded: new epoch landed, ALL delta files swept
    assert _glob.glob(f"{state}/ledger_bloom/delta/batch=*.bin") == []
    epochs_after = _glob.glob(f"{state}/ledger_bloom/bits/epoch=*")
    assert len(epochs_after) == 1 and epochs_after != epochs_before
    # coverage intact: a dup of every admitted doc is still caught
    r6 = _ingest_batch(
        spark,
        _lines(spark, [{"doc_id": 96, "text": _doc(15)["text"]},
                       {"doc_id": 97, "text": _doc(14)["text"]}]),
        6, cfg, state, SCH,
    )
    assert r6["admitted"] == 0
    assert r6["ledger_bloom"]["maybe"] >= 2


def test_divergent_delta_replay_keeps_no_false_negatives(
    spark, tmp_path, monkeypatch
):
    # round-14 ADVICE regression: a replayed batch's positions are NOT
    # deterministic per batch id — between a crashed attempt (delta +
    # marker landed, ledger append not) and the replay, a maintenance
    # verb (e.g. retract_documents) can change state so the replay
    # admits a digest the stale delta never saw. The old skip-if-exists
    # kept the stale delta while the marker claimed coverage, so no
    # catch-up ever rescanned the batch: a persistent false negative
    # that silently re-admits future duplicates. Pin the fix at the
    # merge_batch level: a second merge under the same batch id with a
    # DIFFERENT digest set must leave every new digest probing positive
    # through a FRESH load (the epoch-fallback superset commit).
    from pulfa_sausage_factory_spark.functions import bloom as bloomfn
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as lbm

    monkeypatch.setattr(lbm, "_DELTA_ABOVE_BYTES", 0)
    state = str(tmp_path / "state")
    cfg = _cfg(ledger_bloom=True, ledger_bloom_expected_items=10_000)
    # batch 0 seeds the ledger so load_state has a real dir layout
    _ingest_batch(spark, _lines(spark, [_doc(0)]), 0, cfg, state, SCH)
    ledger_dir = f"{state}/ledger"

    def _digests(texts):
        return spark.createDataFrame(
            [(t,) for t in texts], "text string"
        ).select(F.md5("text").alias("digest"))

    attempt = [_doc(1)["text"]]
    replay = [_doc(1)["text"], _doc(2)["text"]]  # retraction re-admitted 2

    st = lbm.load_state(spark, ledger_dir, cfg)
    lbm.merge_batch(spark, st, 1, _digests(attempt), len(attempt))
    # crash here: delta + marker landed, ledger append did not. The
    # replay (fresh load) admits a superset.
    st2 = lbm.load_state(spark, ledger_dir, cfg)
    lbm.merge_batch(spark, st2, 1, _digests(replay), len(replay))

    # a THIRD fresh load (what the next micro-batch's probe sees) must
    # cover every replay digest — the no-false-negative invariant
    st3 = lbm.load_state(spark, ledger_dir, cfg)
    import hashlib

    for t in replay:
        d = hashlib.md5(t.encode()).hexdigest()
        pos = bloomfn.positions_of(d, st3.m, st3.k)
        assert all(st3.bits[p // 8] & (1 << (p % 8)) for p in pos), (
            f"digest {d} not covered after divergent replay"
        )
