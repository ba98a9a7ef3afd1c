"""Residual (IVFADC) PQ + persisted ANN index artifacts (round 6).

Covers the two legs the r5 verdict asked for: proper residual encoding so
the composed cells+codes path stops scoring below plain ADC, and
save/load of the index artifacts so 100 TB serving reuses a built index
instead of retraining per session — with config-mismatch refusal at every
seam (the NBModel carry-your-config pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.operators import ann_index
from pulfa_sausage_factory_spark.operators.similarity import (
    knn_ivf_pq,
    knn_pq_adc,
    knn_pq_rerank,
    pq_encode,
    train_ivf_centroids,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").limit(400).localCheckpoint()


@pytest.fixture(scope="module")
def cents(vecs):
    return train_ivf_centroids(
        vecs, n_cells=8, iters=1, sample_fraction=1.0
    ).localCheckpoint()


@pytest.fixture(scope="module")
def cb_res(vecs, cents):
    return train_pq_codebooks(
        vecs, m=8, n_codes=8, iters=1, sample_fraction=1.0, centroids=cents
    ).localCheckpoint()


def test_residual_codebook_carries_config(vecs, cents, cb_res):
    # raw codebooks declare residual=false / no fingerprint; residual ones
    # carry both — the config rides the artifact, not the caller's memory
    raw = train_pq_codebooks(vecs, m=8, n_codes=8, iters=0, sample_fraction=1.0)
    r0 = raw.limit(1).collect()[0]
    assert r0.residual is False and r0.cent_sig is None
    c0 = cb_res.limit(1).collect()[0]
    assert c0.residual is True and len(c0.cent_sig) == 16


def test_residual_pairing_is_enforced_everywhere(spark, vecs, cents, cb_res):
    raw = train_pq_codebooks(vecs, m=8, n_codes=8, iters=0, sample_fraction=1.0)
    other_cents = train_ivf_centroids(
        vecs, n_cells=4, iters=0, sample_fraction=1.0
    )
    # encode: residual codebook without / with WRONG centroids refuses;
    # raw codebook WITH centroids refuses (it would silently code raw
    # vectors that serving then treats as residuals)
    with pytest.raises(ValueError, match="residual"):
        pq_encode(vecs, cb_res)
    with pytest.raises(ValueError, match="not the one"):
        pq_encode(vecs, cb_res, centroids=other_cents)
    with pytest.raises(ValueError, match="raw vectors"):
        pq_encode(vecs, raw, centroids=cents)
    # full-scan ADC cannot score residual codes (no cell context)
    with pytest.raises(ValueError, match="RESIDUAL"):
        knn_pq_adc(spark.range(0), vecs.limit(2), cb_res)
    # composed serving with mismatched centroids refuses
    with pytest.raises(ValueError, match="fingerprint"):
        knn_ivf_pq(vecs, vecs.limit(2), cb_res, centroids=other_cents)
    # rerank over a residual codebook needs the centroids
    with pytest.raises(ValueError, match="centroids"):
        knn_pq_rerank(vecs, vecs.limit(2), cb_res, shortlist=20)


def test_residual_encode_shape_and_serve(vecs, cents, cb_res):
    codes = pq_encode(vecs, cb_res, centroids=cents)
    assert codes.columns == ["id", "cell_id", "codes"]
    assert codes.count() == vecs.count()
    # serving accepts the prebuilt codes and returns k per query
    out = knn_ivf_pq(
        vecs, vecs.limit(3), cb_res, k=5, n_probe=4, centroids=cents,
        codes_df=codes,
    )
    got = out.groupBy("query_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 5 for r in got)
    # prebuilt codes == freshly encoded codes (pure reuse, no drift)
    fresh = knn_ivf_pq(
        vecs, vecs.limit(3), cb_res, k=5, n_probe=4, centroids=cents
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_residual_scores_track_true_inner_product(vecs, cents, cb_res):
    # IVFADC's score is <q, c> + ADC(residual): for each scored pair the
    # approximation must sit close to the exact inner product — closer on
    # average than raw-codebook ADC on the same corpus (the reason
    # residual encoding exists: residuals are small, so the same code
    # budget quantizes them finer)
    from pulfa_sausage_factory_spark.functions.vectors import (
        as_double_array,
        dot,
    )

    queries = vecs.limit(3)
    raw = train_pq_codebooks(vecs, m=8, n_codes=8, iters=1, sample_fraction=1.0)

    def mean_abs_err(scored):
        qv = queries.select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("qv"),
        )
        cv = vecs.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double_array("embedding").alias("cv"),
        )
        joined = (
            scored.join(qv, "query_id")
            .join(cv, "neighbor_id")
            .withColumn("exact", dot(F.col("qv"), F.col("cv")))
        )
        return joined.agg(
            F.avg(F.abs(F.col("score") - F.col("exact")))
        ).collect()[0][0]

    res_err = mean_abs_err(
        knn_ivf_pq(vecs, queries, cb_res, k=50, n_probe=8, centroids=cents)
    )
    raw_err = mean_abs_err(
        knn_ivf_pq(vecs, queries, raw, k=50, n_probe=8, centroids=cents)
    )
    assert res_err < raw_err, (res_err, raw_err)


def test_serve_plan_shape(spark, vecs, cents, cb_res):
    # the IVFADC serve plan's scale contract (round-7 pin): the corpus-
    # side pass joins the coded table against TWO SEPARATE small
    # broadcasts — the probe map (query, cell, scalar) and one LUT row
    # per query — never a pre-joined probe×LUT table (which replicated
    # each LUT n_probe×) and never a shuffled/cartesian join (the coded
    # corpus must not reshuffle to meet KB-sized query state).
    from pulfa_sausage_factory_spark import plans

    codes = pq_encode(vecs, cb_res, centroids=cents)
    served = knn_ivf_pq(
        vecs, vecs.limit(3), cb_res, k=5, n_probe=4, centroids=cents,
        codes_df=codes,
    )
    plans.assert_no_cartesian(served)
    plans.assert_broadcast_join(served, at_least=2)


def test_index_roundtrip_and_serve_from_disk(spark, vecs, tmp_path):
    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    assert idx.residual and idx.meta["n_cells"] == 8
    path = str(tmp_path / "pq_index")
    ann_index.save_pq_index(idx, path)
    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.meta == idx.meta

    queries = vecs.limit(3)
    served_build = ann_index.knn_from_index(
        idx, vecs, queries, k=5, shortlist=30
    )
    served_disk = ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=30
    )
    # load → identical top-k (everything deterministic end-to-end)
    assert sorted(map(tuple, served_build.collect())) == sorted(
        map(tuple, served_disk.collect())
    )

    # overwrite-save into the same path (the rebuild flow): the manifest
    # is invalidated first and rewritten last, and the reloaded index
    # still serves identically
    ann_index.save_pq_index(idx, path)
    again = ann_index.knn_from_index(
        ann_index.load_pq_index(spark, path), vecs, queries, k=5,
        shortlist=30,
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, served_disk.collect())
    )

    # saving a LOADED index back onto its own path is refused UP FRONT:
    # its frames lazily read the target, so Spark would fail the data
    # write AFTER the manifest delete — a healthy index destroyed by a
    # no-op save. The refusal must leave the index loadable.
    reloaded = ann_index.load_pq_index(spark, path)
    with pytest.raises(ValueError, match="reads from the target"):
        ann_index.save_pq_index(reloaded, path)
    assert ann_index.load_pq_index(spark, path).meta == idx.meta


def test_flat_index_roundtrip(spark, vecs, tmp_path):
    # n_cells=None → flat PQ: raw codebooks, no centroids subdir, serve
    # via full-scan ADC shortlist + exact rerank
    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells=None, iters=1, sample_fraction=1.0
    )
    assert not idx.residual and idx.centroids is None
    assert idx.codes.columns == ["id", "codes"]
    path = str(tmp_path / "flat_idx")
    ann_index.save_pq_index(idx, path)
    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.meta == idx.meta and loaded.centroids is None
    queries = vecs.limit(3)
    a = ann_index.knn_from_index(idx, vecs, queries, k=5, shortlist=30)
    b = ann_index.knn_from_index(loaded, vecs, queries, k=5, shortlist=30)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    got = b.groupBy("query_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 5 for r in got)


def test_pq_encode_assign_impl_twins(spark, vecs, cents, cb_res):
    # hot-path twin contract (CLAUDE.md round-4 convention): the arrow
    # fused assignment+encode must equal the oracle-mode expression path
    # bit-for-bit on real data — same cells (argmax first-max == cos desc,
    # cell_id asc tie-break), same residuals, same codes, same stamp.
    from pulfa_sausage_factory_spark.operators.similarity import codes_stamp

    expr = pq_encode(vecs, cb_res, centroids=cents)
    arrow = pq_encode(vecs, cb_res, centroids=cents, assign_impl="arrow")
    assert arrow.columns == expr.columns == ["id", "cell_id", "codes"]
    assert codes_stamp(arrow) == codes_stamp(expr) is not None
    a = sorted((r.id, r.cell_id, tuple(r.codes)) for r in arrow.collect())
    e = sorted((r.id, r.cell_id, tuple(r.codes)) for r in expr.collect())
    assert a == e
    with pytest.raises(ValueError, match="assign_impl"):
        pq_encode(vecs, cb_res, centroids=cents, assign_impl="numpy")


def test_suggest_ann_config_and_auto_build(spark, vecs, tmp_path):
    # round-7: cells ~ √n with probe fraction ¼ is the measured at-scale
    # default (RECALL.md — on weak-cluster geometry the probe FRACTION
    # sets the recall cap, and more smaller cells is the 100 TB shape);
    # build_pq_index(n_cells="auto") sizes from the corpus and records
    # the matched probe budget in the manifest for serve sessions.
    import math

    from pulfa_sausage_factory_spark.operators.similarity import (
        suggest_ann_config,
    )

    assert suggest_ann_config(1_000_000) == {"n_cells": 1000, "n_probe": 250}
    assert suggest_ann_config(0) == {"n_cells": 4, "n_probe": 1}
    assert suggest_ann_config(10**8) == {"n_cells": 10_000, "n_probe": 2500}

    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells="auto", iters=1, sample_fraction=1.0
    )
    n = vecs.count()
    want_cells = max(4, math.isqrt(n))
    assert idx.meta["n_cells"] == want_cells
    assert idx.meta["n_probe_suggested"] == max(1, want_cells // 4)

    path = str(tmp_path / "auto_idx")
    ann_index.save_pq_index(idx, path)
    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.meta["n_probe_suggested"] == idx.meta["n_probe_suggested"]
    # serving defaults to the manifest's matched probe budget
    out = ann_index.knn_from_index(loaded, vecs, vecs.limit(2), k=3,
                                   shortlist=20)
    got = out.groupBy("query_id").count().collect()
    assert len(got) == 2 and all(r["count"] == 3 for r in got)


def test_codes_stamp_refuses_foreign_codes(spark, vecs, tmp_path):
    # round-7 ADVICE: codes were the only config-carrying artifact with no
    # carried fingerprint on the DIRECT API — pq_encode now stamps the
    # producing codebook's fingerprint into the codes column metadata
    # (parquet-persistent, schema-only check: no job runs to read it), and
    # knn_pq_adc / knn_ivf_pq refuse a mispaired codes_df.
    from pulfa_sausage_factory_spark.operators.similarity import codes_stamp

    cb1 = train_pq_codebooks(vecs, m=8, n_codes=8, iters=1, sample_fraction=1.0)
    cb2 = train_pq_codebooks(vecs, m=8, n_codes=8, iters=0, sample_fraction=1.0)
    codes = pq_encode(vecs, cb1)
    p = str(tmp_path / "codes_rt")
    codes.write.mode("overwrite").parquet(p)
    rt = spark.read.parquet(p)
    # the stamp survives the parquet round-trip
    assert codes_stamp(rt) == codes_stamp(codes) is not None
    # correct pairing serves
    assert (
        knn_pq_adc(rt, vecs.limit(2), cb1, k=3)
        .groupBy("query_id").count().count() == 2
    )
    # foreign pairing refuses — on both direct consumers
    with pytest.raises(ValueError, match="carries codebook stamp"):
        knn_pq_adc(rt, vecs.limit(2), cb2, k=3)
    with pytest.raises(ValueError, match="carries codebook stamp"):
        knn_ivf_pq(vecs, vecs.limit(2), cb2, codes_df=rt)


def test_append_to_pq_index(spark, vecs, tmp_path):
    # incremental growth (round-7): encode ONLY the new batch against the
    # persisted artifacts; serving over the appended index must equal the
    # same-artifact full encode of the grown corpus.
    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    odd = vecs.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "grow_idx")
    ann_index.save_pq_index(idx, path)

    rep = ann_index.append_to_pq_index(spark, path, odd)
    assert rep["batch_id"] == 1 and rep["rows"] == odd.count()
    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.codes.count() == vecs.count()

    queries = vecs.limit(3)
    served = ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=30, n_probe=4
    )
    # parity target: identical artifacts, whole corpus encoded in one go
    full = knn_pq_rerank(
        vecs, queries, idx.codebooks, k=5, shortlist=30,
        centroids=idx.centroids, n_probe=4,
        codes_df=pq_encode(vecs, idx.codebooks, centroids=idx.centroids),
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, full.collect())
    )

    # replayed append is idempotent (at-least-once safe)
    rep2 = ann_index.append_to_pq_index(spark, path, odd, batch_id=1)
    assert rep2 == rep
    assert ann_index.load_pq_index(spark, path).codes.count() == vecs.count()

    # auto-assign continues; a reused-but-never-committed id is refused
    rep3 = ann_index.append_to_pq_index(spark, path, odd.limit(5))
    assert rep3["batch_id"] == 2
    with pytest.raises(ValueError, match="neither a new batch"):
        ann_index.append_to_pq_index(spark, path, odd.limit(5), batch_id=0)
    with pytest.raises(ValueError, match="negative"):
        ann_index.append_to_pq_index(spark, path, odd.limit(5), batch_id=-1)

    # a wrong-dimension batch refuses before any executor work
    bad = spark.createDataFrame(
        [(9999, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ann_index.append_to_pq_index(spark, path, bad)

    # a batch of FOREIGN codes smuggled into codes_append refuses at load
    # (same schema-only stamp check as the base codes)
    other_cents = train_ivf_centroids(
        vecs, n_cells=4, iters=0, sample_fraction=1.0
    )
    other_cb = train_pq_codebooks(
        vecs, m=8, n_codes=8, iters=0, sample_fraction=1.0,
        centroids=other_cents,
    )
    foreign = pq_encode(odd.limit(5), other_cb, centroids=other_cents)
    foreign.write.mode("overwrite").parquet(f"{path}/codes_append/batch=3")
    with pytest.raises(ValueError, match="foreign or stale"):
        ann_index.load_pq_index(spark, path)

    # a fresh save clears append history: the index IS the save again
    ann_index.save_pq_index(idx, path)
    assert ann_index.load_pq_index(spark, path).codes.count() == even.count()


def test_pq_index_report(spark, vecs, tmp_path):
    # the curation_report_df convention on the ANN surface: artifact
    # sizes from the FS listing only (no codes scan), append batches with
    # their commit state, manifest JSON on the meta row.
    import json

    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "rep_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, vecs.limit(7))
    # fabricate a KILLED append: batch dir without the job-commit marker
    import os
    import shutil

    src = f"{path}/codes_append/batch=1"
    dst = f"{path}/codes_append/batch=2"
    shutil.copytree(src, dst)
    os.remove(f"{dst}/_SUCCESS")

    rep = {r.artifact: r for r in ann_index.pq_index_report(spark, path).collect()}
    assert {"meta", "codebooks", "centroids", "codes",
            "codes_append/batch=1", "codes_append/batch=2"} <= set(rep)
    assert json.loads(rep["meta"].detail)["n_cells"] == 8
    assert rep["codes"].files >= 1 and rep["codes"].bytes > 0
    assert rep["codes_append/batch=1"].committed is True
    assert rep["codes_append/batch=2"].committed is False
    # round-11 staleness: the manifest records the build corpus size and
    # the report compares appended footer-counts against it (the killed
    # batch=2 copy is uncommitted — loads skip it, so it must not count)
    n = vecs.count()
    assert json.loads(rep["meta"].detail)["train_rows"] == n
    st = rep["appended_staleness"].detail
    assert f"train_rows={n}" in st and "~7 rows appended" in st
    assert f"fraction {7 / n:.2f}" in st
    # the uncommitted batch is exactly what load skips
    assert ann_index.load_pq_index(spark, path).codes.count() == (
        vecs.count() + 7
    )
    # no live tombstones yet: the fraction rides without the upper-bound
    # qualifier
    assert "upper bound" not in st
    # round-11 ADVICE: live tombstones may cover appended rows, so the
    # gross appended count overstates the live fraction — the row says so
    # (with the tombstone row count) instead of silently subtracting
    ids = [r.vec_id for r in vecs.limit(2).collect()]
    ann_index.remove_from_pq_index(spark, path, ids)
    rep2 = {
        r.artifact: r
        for r in ann_index.pq_index_report(spark, path).collect()
    }
    st2 = rep2["appended_staleness"].detail
    assert "~7 rows appended" in st2  # gross count unchanged
    assert "upper bound while 2 tombstoned ids are live" in st2
    with pytest.raises(ValueError, match="manifest"):
        ann_index.pq_index_report(spark, str(tmp_path / "nope"))


def test_compact_pq_index(spark, vecs, tmp_path):
    # round-8 (r7 VERDICT item 2): fold the codes_append log into one
    # codes_head snapshot — serve identical before/after, folded batch
    # ids refused for replay, load no longer unions per-batch dirs.
    from pulfa_sausage_factory_spark import fsutil
    from pulfa_sausage_factory_spark.operators.similarity import codes_stamp

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    odd = vecs.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "cmp_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, odd.filter(F.col("vec_id") % 4 == 1))
    ann_index.append_to_pq_index(spark, path, odd.filter(F.col("vec_id") % 4 == 3))

    queries = vecs.limit(3)
    before = sorted(map(tuple, ann_index.knn_from_index(
        ann_index.load_pq_index(spark, path), vecs, queries, k=5,
        shortlist=30, n_probe=4,
    ).collect()))

    rep = ann_index.compact_pq_index(spark, path)
    assert rep["horizon"] == 2 and rep["folded_batches"] == 2
    assert rep["snapshot_rows"] == vecs.count()
    # folded batch dirs and the superseded plain codes dir are gone
    assert fsutil.child_names(spark, f"{path}/codes_append") == []
    assert not fsutil.exists(spark, f"{path}/codes")
    assert fsutil.exists(spark, f"{path}/codes_head/upto=2/_SUCCESS")

    loaded = ann_index.load_pq_index(spark, path)
    # the codes stamp survives the fold (schema-only pairing tripwire)
    assert codes_stamp(loaded.codes) is not None
    after = sorted(map(tuple, ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=30, n_probe=4,
    ).collect()))
    assert before == after

    # replaying a folded batch id is refused loudly (journal horizon
    # semantics); appends continue above the horizon
    with pytest.raises(ValueError, match="horizon"):
        ann_index.append_to_pq_index(spark, path, odd.limit(3), batch_id=1)
    rep3 = ann_index.append_to_pq_index(spark, path, even.limit(0))
    assert rep3["batch_id"] == 3

    # report: the serving snapshot row is present, committed, and flagged
    rows = {r.artifact: r for r in
            ann_index.pq_index_report(spark, path).collect()}
    assert rows["codes_head/upto=2"].committed is True
    assert rows["codes_head/upto=2"].detail == "serving"
    assert "codes" not in rows

    # re-compaction folds the post-horizon batch and advances the horizon
    rep4 = ann_index.compact_pq_index(spark, path)
    assert rep4["horizon"] == 3 and rep4["folded_batches"] == 1
    assert not fsutil.exists(spark, f"{path}/codes_head/upto=2")
    # nothing left to fold → no-op sweep, horizon stays
    rep5 = ann_index.compact_pq_index(spark, path)
    assert rep5 == {"horizon": 3, "snapshot_rows": None,
                    "folded_batches": 0, "removed_dirs": 0,
                    "pending": []}


def test_remove_from_pq_index_tombstones(spark, vecs, tmp_path):
    # round-8 (r7 VERDICT item 3): tombstoned ids never serve — before
    # AND after compaction physically purges them.
    from pulfa_sausage_factory_spark import fsutil

    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "tomb_idx")
    ann_index.save_pq_index(idx, path)
    queries = vecs.limit(3)
    served = ann_index.knn_from_index(
        ann_index.load_pq_index(spark, path), vecs, queries, k=5,
        shortlist=30, n_probe=8,
    )
    victims = sorted({r.neighbor_id for r in served.collect()})[:2]

    rep = ann_index.remove_from_pq_index(spark, path, victims)
    assert rep == {"batch_id": 1, "rows": 2}
    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.codes.count() == vecs.count() - 2
    got = {r.neighbor_id for r in ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=30, n_probe=8,
    ).collect()}
    assert not (got & set(victims))

    # compaction purges physically; the removed ids stay gone
    crep = ann_index.compact_pq_index(spark, path)
    assert crep["horizon"] == 1 and crep["snapshot_rows"] == vecs.count() - 2
    assert fsutil.child_names(spark, f"{path}/tombstones") == []
    loaded2 = ann_index.load_pq_index(spark, path)
    assert loaded2.codes.count() == vecs.count() - 2
    got2 = {r.neighbor_id for r in ann_index.knn_from_index(
        loaded2, vecs, queries, k=5, shortlist=30, n_probe=8,
    ).collect()}
    assert not (got2 & set(victims))
    # replaying the folded tombstone batch is refused like any folded id
    with pytest.raises(ValueError, match="horizon"):
        ann_index.remove_from_pq_index(spark, path, victims, batch_id=1)

    # appends and tombstones share one id sequence: an id attempted as a
    # tombstone cannot be replayed as an append (and vice versa)
    odd = vecs.filter(F.col("vec_id") % 2 == 1)
    rep2 = ann_index.remove_from_pq_index(
        spark, path,
        vecs.select("vec_id").limit(1),  # DataFrame form
    )
    assert rep2["batch_id"] == 2 and rep2["rows"] == 1
    with pytest.raises(ValueError, match="tombstone batch"):
        ann_index.append_to_pq_index(spark, path, odd.limit(2), batch_id=2)
    rep3 = ann_index.append_to_pq_index(spark, path, odd.limit(0))
    assert rep3["batch_id"] == 3
    with pytest.raises(ValueError, match="append batch"):
        ann_index.remove_from_pq_index(spark, path, [123], batch_id=3)


def test_tombstones_apply_in_wal_order(spark, vecs, tmp_path):
    # round-8: tombstone batch N suppresses only log entries BEFORE N —
    # re-appending a taken-down id serves it again immediately, the same
    # outcome compaction produces, so temporal semantics don't depend on
    # when maintenance last ran (without the ordering, the re-append
    # would be silently dead until compaction, then silently alive).
    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    odd = vecs.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "wal_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, odd)  # batch 1

    e_id = even.limit(1).collect()[0].vec_id  # lives in the BASE codes
    o_id = odd.limit(1).collect()[0].vec_id  # lives in append batch 1
    ann_index.remove_from_pq_index(spark, path, [e_id, o_id])  # batch 2
    alive = ann_index.load_pq_index(spark, path).codes
    assert alive.filter(F.col("id").isin(e_id, o_id)).count() == 0
    assert alive.count() == vecs.count() - 2

    # re-append both ids (batch 3 > tombstone batch 2) → they serve again
    ann_index.append_to_pq_index(
        spark, path, vecs.filter(F.col("vec_id").isin(e_id, o_id))
    )
    alive = ann_index.load_pq_index(spark, path).codes
    assert alive.filter(F.col("id").isin(e_id, o_id)).count() == 2
    assert alive.count() == vecs.count()

    # compaction preserves exactly these semantics physically
    rep = ann_index.compact_pq_index(spark, path)
    assert rep["horizon"] == 3 and rep["snapshot_rows"] == vecs.count()
    alive = ann_index.load_pq_index(spark, path).codes
    assert alive.filter(F.col("id").isin(e_id, o_id)).count() == 2


def test_append_replay_of_killed_batch_allowed(spark, vecs, tmp_path):
    # round-8 ADVICE: replay validity keys on ATTEMPTED batch dirs, not
    # committed ones — a killed batch N stays repairable even after a
    # later batch M > N commits (committed-only validation refused N as
    # 'neither new nor a replay', stranding its rows forever).
    import os

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    part1 = vecs.filter(F.col("vec_id") % 4 == 1).localCheckpoint()
    part3 = vecs.filter(F.col("vec_id") % 4 == 3).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "killed_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    # simulate the kill: the job-commit marker never landed
    os.remove(f"{path}/codes_append/batch=1/_SUCCESS")
    assert ann_index.load_pq_index(spark, path).codes.count() == even.count()

    # a later batch commits — auto assignment must NOT reuse the killed
    # id (different rows under an attempted id would be overwritten by
    # the killed batch's redelivery)
    rep2 = ann_index.append_to_pq_index(spark, path, part3)
    assert rep2["batch_id"] == 2
    # the at-least-once redelivery of batch 1 repairs it
    rep1 = ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    assert rep1 == {"batch_id": 1, "rows": part1.count()}
    assert ann_index.load_pq_index(spark, path).codes.count() == vecs.count()


def test_compact_never_folds_past_a_killed_batch(spark, vecs, tmp_path):
    # round-8: the horizon must not advance past a repairable hole — a
    # killed batch awaiting redelivery would otherwise be swept and its
    # replay refused as below-horizon (the stranding the attempted-dir
    # replay rule prevents, reintroduced by a careless compaction).
    import os

    from pulfa_sausage_factory_spark import fsutil

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    part1 = vecs.filter(F.col("vec_id") % 4 == 1).localCheckpoint()
    part3 = vecs.filter(F.col("vec_id") % 4 == 3).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "hole_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    os.remove(f"{path}/codes_append/batch=1/_SUCCESS")  # the kill
    ann_index.append_to_pq_index(spark, path, part3, batch_id=2)

    rep = ann_index.compact_pq_index(spark, path)
    assert rep["pending"] == [1] and rep["folded_batches"] == 0
    assert rep["horizon"] == -1  # nothing foldable below the hole
    # both dirs survive: the hole stays repairable, batch 2 stays live
    assert fsutil.exists(spark, f"{path}/codes_append/batch=1")
    assert fsutil.exists(spark, f"{path}/codes_append/batch=2")
    assert ann_index.load_pq_index(spark, path).codes.count() == (
        even.count() + part3.count()
    )

    # redelivery repairs the hole; the next compaction folds everything
    ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    rep2 = ann_index.compact_pq_index(spark, path)
    assert rep2["pending"] == [] and rep2["horizon"] == 2
    assert rep2["snapshot_rows"] == vecs.count()
    assert ann_index.load_pq_index(spark, path).codes.count() == vecs.count()


def test_serve_corpus_coverage_guard(spark, vecs, tmp_path):
    # round-8 (r7 VERDICT item 4): the documented silent-drop contract —
    # appended index served with the stale build corpus — becomes
    # checkable with check_corpus=True.
    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    odd = vecs.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "cov_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, odd)
    loaded = ann_index.load_pq_index(spark, path)
    queries = vecs.limit(3)

    # grown corpus passes (and the guard changes nothing about the result)
    ok = ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=60, n_probe=8,
        check_corpus=True,
    )
    plain = ann_index.knn_from_index(
        loaded, vecs, queries, k=5, shortlist=60, n_probe=8,
    )
    assert sorted(map(tuple, ok.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # stale (build-time) corpus raises instead of silently dropping the
    # appended candidates from the top-k
    with pytest.raises(ValueError, match="no raw vector"):
        ann_index.knn_from_index(
            loaded, even, queries, k=5, shortlist=60, n_probe=8,
            check_corpus=True,
        ).collect()


def test_index_load_refuses_mismatched_artifacts(spark, vecs, tmp_path):
    idx = ann_index.build_pq_index(
        vecs, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "idx_a")
    ann_index.save_pq_index(idx, path)

    # no manifest → not an index
    with pytest.raises(ValueError, match="manifest"):
        ann_index.load_pq_index(spark, str(tmp_path / "nowhere"))

    # swap in centroids from a DIFFERENT training run → fingerprint refusal
    other = train_ivf_centroids(vecs, n_cells=4, iters=0, sample_fraction=1.0)
    other.write.mode("overwrite").parquet(f"{path}/centroids")
    with pytest.raises(ValueError, match="sig"):
        ann_index.load_pq_index(spark, path)

    # restore, then corrupt the manifest's grid config → grid refusal
    idx.centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assert ann_index.load_pq_index(spark, path).residual
    import json as _json

    bad_meta = dict(idx.meta, m=4)
    spark.createDataFrame(
        [(_json.dumps(bad_meta),)], "meta_json string"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="grid"):
        ann_index.load_pq_index(spark, path)


def test_next_log_id_and_reservation_dir(spark, vecs, tmp_path):
    # round-9 (r8 ADVICE + VERDICT item 3): next_log_id is the public
    # reservation query — the same formula the WAL's own auto path runs —
    # and an empty marker-less attempted dir at the reserved id pushes
    # concurrent auto-assignment PAST it instead of colliding inside the
    # reserve→append crash window.
    from pulfa_sausage_factory_spark import fsutil

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    part1 = vecs.filter(F.col("vec_id") % 4 == 1).localCheckpoint()
    part3 = vecs.filter(F.col("vec_id") % 4 == 3).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "resv_idx")
    ann_index.save_pq_index(idx, path)

    # fresh log: the next id is 1, and querying does not consume it
    assert ann_index.next_log_id(spark, path) == 1
    assert ann_index.next_log_id(spark, path) == 1

    # reserve it mechanically (what _append_serve_index does)
    fsutil.mkdirs(spark, f"{path}/codes_append/batch=1")
    assert ann_index.next_log_id(spark, path) == 2
    # the reservation is visible in the report as a compaction blocker
    rep_rows = {
        r.artifact: r for r in ann_index.pq_index_report(spark, path).collect()
    }
    assert rep_rows["codes_append/batch=1"].committed is False
    assert "blocks compaction" in rep_rows["codes_append/batch=1"].detail
    assert rep_rows["pending"].detail.startswith("uncommitted log ids [1]")
    # ...and it caps compaction below itself, loudly reported
    comp = ann_index.compact_pq_index(spark, path)
    assert comp["pending"] == [1] and comp["horizon"] == -1

    # a concurrent auto append assigns PAST the reservation
    rep3 = ann_index.append_to_pq_index(spark, path, part3)
    assert rep3["batch_id"] == 2

    # the reserving writer lands its rows under the reserved id (an
    # attempted-dir replay — overwrite-repairs the empty dir)
    rep1 = ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    assert rep1 == {"batch_id": 1, "rows": part1.count()}
    assert ann_index.load_pq_index(spark, path).codes.count() == vecs.count()
    # no blockers remain; the report's pending summary row is gone
    arts = {
        r.artifact for r in ann_index.pq_index_report(spark, path).collect()
    }
    assert "pending" not in arts

    # after compaction the horizon drives next_log_id even with no dirs
    comp = ann_index.compact_pq_index(spark, path)
    assert comp["horizon"] == 2 and comp["pending"] == []
    assert ann_index.next_log_id(spark, path) == 3


def test_abandon_log_entry(spark, vecs, tmp_path):
    # round-9: the "abandon" half of compact_pq_index's replay-or-abandon
    # contract as an API — deletes ONLY attempted-uncommitted entries
    # (killed batches, orphaned reservations), never committed history,
    # and unblocks the capped fold.
    import os

    from pulfa_sausage_factory_spark import fsutil

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    part1 = vecs.filter(F.col("vec_id") % 4 == 1).localCheckpoint()
    part3 = vecs.filter(F.col("vec_id") % 4 == 3).localCheckpoint()
    idx = ann_index.build_pq_index(
        even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
    )
    path = str(tmp_path / "abandon_idx")
    ann_index.save_pq_index(idx, path)
    ann_index.append_to_pq_index(spark, path, part1, batch_id=1)
    os.remove(f"{path}/codes_append/batch=1/_SUCCESS")  # the kill
    ann_index.append_to_pq_index(spark, path, part3, batch_id=2)

    # unknown / committed ids refuse
    with pytest.raises(ValueError, match="nothing to abandon"):
        ann_index.abandon_log_entry(spark, path, 9)
    with pytest.raises(ValueError, match="COMMITTED"):
        ann_index.abandon_log_entry(spark, path, 2)

    # the killed batch blocks the fold; abandoning it unblocks
    assert ann_index.compact_pq_index(spark, path)["pending"] == [1]
    rep = ann_index.abandon_log_entry(spark, path, 1)
    assert rep == {"batch_id": 1, "kind": "append"}
    assert not fsutil.exists(spark, f"{path}/codes_append/batch=1")
    comp = ann_index.compact_pq_index(spark, path)
    assert comp["pending"] == [] and comp["horizon"] == 2
    assert ann_index.load_pq_index(spark, path).codes.count() == (
        even.count() + part3.count()
    )

    # an orphaned reservation (empty attempted dir) abandons the same way
    rid = ann_index.next_log_id(spark, path)
    fsutil.mkdirs(spark, f"{path}/codes_append/batch={rid}")
    assert ann_index.compact_pq_index(spark, path)["pending"] == [rid]
    assert ann_index.abandon_log_entry(spark, path, rid)["kind"] == "append"
    assert ann_index.compact_pq_index(spark, path)["pending"] == []


@pytest.mark.characterization  # RECALL.md floor re-measurement
# (round 15: opt-in tier — see pytest.ini; regenerate the figures
# with recall.py; the default driver-window run excludes this)
def test_append_staleness_recall_floor(spark):
    # RECALL.md §append, floor-pinned (round 11): appends encode against
    # quantizers FROZEN at build. In-distribution growth holds the ≥0.9
    # serving floor through the measured range (0.974 at appended
    # fraction 0.5 — pinned here); distribution-SHIFTED appends break it
    # at any fraction (0.726 at f=0.1 — direction pinned here), which is
    # why the retrain guidance keys on drift as well as the
    # appended_staleness report fraction. Same corpus + config as
    # `python recall.py append`; everything is hash-deterministic.
    import os
    import shutil
    import tempfile

    import recall as recall_harness
    from pulfa_sausage_factory_spark.functions.vectors import (
        hashed_text_embedding,
    )
    from pulfa_sausage_factory_spark.operators.similarity import (
        knn_bruteforce,
    )

    sf01 = os.environ.get("SPARK_GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip(f"recall corpus dir missing: {sf01} "
                    "(set SPARK_GRAFT_RECALL_SF_DIR)")
    docs = load_table(spark, sf01, "documents").select(
        F.col("doc_id").alias("vec_id"),
        hashed_text_embedding("text", dim=64).alias("embedding"),
    )
    corpus = recall_harness._normalize(docs).localCheckpoint()
    base = corpus.filter(F.col("vec_id") % 5 == 0).localCheckpoint()
    pool = corpus.filter(F.col("vec_id") % 5 != 0)
    n_train = base.count()

    def recall_of(served, truth):
        got, want = {}, {}
        for r in served:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        for r in truth:
            want.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(q, set()) & t) / 10.0 for q, t in want.items()
        ) / len(want)

    def measure(append_slice, queries):
        tmp = tempfile.mkdtemp(prefix="stale_idx_")
        try:
            ann_index.save_pq_index(
                ann_index.build_pq_index(
                    base, m=8, n_codes=256, n_cells=16, iters=2,
                    ivf_iters=3, sample_fraction=1.0,
                ),
                tmp,
            )
            ann_index.append_to_pq_index(
                spark, tmp, append_slice, assign_impl="arrow"
            )
            grown = base.unionByName(append_slice).localCheckpoint()
            loaded = ann_index.load_pq_index(spark, tmp)
            served = ann_index.knn_from_index(
                loaded, grown, queries, k=10, shortlist=200, n_probe=8,
                check_corpus=True,
            ).collect()
            truth = knn_bruteforce(grown, queries, k=10).collect()
            rep = {
                r.artifact: r
                for r in ann_index.pq_index_report(spark, tmp).collect()
            }
            return recall_of(served, truth), rep["appended_staleness"].detail
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # in-distribution, appended fraction 0.5: floor holds (measured 0.974)
    pool_ids = sorted(r.vec_id for r in pool.select("vec_id").collect())
    cut = pool_ids[n_train // 2 - 1]
    in_slice = pool.filter(F.col("vec_id") <= cut).localCheckpoint()
    rec_in, detail = measure(
        in_slice, base.orderBy("vec_id").limit(50).localCheckpoint()
    )
    assert rec_in >= 0.9, rec_in
    # ...and the report's staleness row states exactly this fraction
    assert f"fraction {(n_train // 2) / n_train:.2f}" in detail

    # shifted-family, appended fraction 0.1: the floor is GONE already —
    # drift, not volume, is the decay lever (measured 0.726)
    shifted = recall_harness._normalize(
        load_table(spark, sf01, "embeddings")
    ).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    s_ids = sorted(r.vec_id for r in shifted.select("vec_id").collect())
    s_cut = s_ids[max(50, n_train // 10) - 1]
    s_slice = shifted.filter(F.col("vec_id") <= s_cut).localCheckpoint()
    rec_sh, _ = measure(
        s_slice, s_slice.orderBy("vec_id").limit(50).localCheckpoint()
    )
    assert rec_sh < 0.9 < rec_in and rec_sh < rec_in, (rec_sh, rec_in)

    # round 14, the RECOVERY pinned (RECALL.md §3): retrain_pq_index on
    # the grown corpus restores the floor — at kept geometry served
    # with the probe fraction matched to the hardest family (n_probe =
    # n_cells, §1's uniform-corpus rule), measured 0.952 at appended
    # fraction 1.0; at the stale serving config (n_probe=8) it recovers
    # most of the gap (0.668 → 0.812) but not the floor — geometry
    # matters as much as freshness, so both rows are documented.
    full_cut = s_ids[n_train - 1]
    full_slice = shifted.filter(
        F.col("vec_id") <= full_cut
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="stale_retrain_")
    try:
        ann_index.save_pq_index(
            ann_index.build_pq_index(
                base, m=8, n_codes=256, n_cells=16, iters=2,
                ivf_iters=3, sample_fraction=1.0,
            ),
            tmp,
        )
        ann_index.append_to_pq_index(
            spark, tmp, full_slice, assign_impl="arrow"
        )
        grown = base.unionByName(full_slice).localCheckpoint()
        queries = full_slice.orderBy("vec_id").limit(50).localCheckpoint()
        truth = knn_bruteforce(grown, queries, k=10).collect()
        stale = recall_of(
            ann_index.knn_from_index(
                ann_index.load_pq_index(spark, tmp), grown, queries,
                k=10, shortlist=200, n_probe=8, check_corpus=True,
            ).collect(),
            truth,
        )
        ann_index.retrain_pq_index(spark, tmp, grown)
        loaded = ann_index.load_pq_index(spark, tmp)

        def serve(np):
            return recall_of(
                ann_index.knn_from_index(
                    loaded, grown, queries, k=10, shortlist=200,
                    n_probe=np, check_corpus=True,
                ).collect(),
                truth,
            )

        r_np8, r_full = serve(8), serve(16)
        assert r_full >= 0.9, (stale, r_np8, r_full)
        assert stale < r_np8 < r_full, (stale, r_np8, r_full)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_retrain_pq_index(spark, vecs, tmp_path):
    # round 14: the executable drift remedy (RECALL.md §3 / the
    # staleness row) — retrain quantizers from the CURRENT serving
    # corpus and swap the index in place. The corpus argument is the
    # source of truth: appends fold in, takedowns bake in.
    from pulfa_sausage_factory_spark import fsutil, statedir

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    odd = vecs.filter(F.col("vec_id") % 2 == 1).localCheckpoint()
    path = str(tmp_path / "retrain_idx")
    ann_index.save_pq_index(
        ann_index.build_pq_index(
            even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
        ),
        path,
    )
    old_meta = ann_index.load_pq_index(spark, path).meta
    ann_index.append_to_pq_index(spark, path, odd)  # WAL id 1
    gone = even.limit(1).collect()[0].vec_id
    ann_index.remove_from_pq_index(spark, path, [gone])  # WAL id 2

    # an uncommitted WAL id (killed append awaiting redelivery) refuses
    # the retrain — its replay would carry old-codebook codes the new
    # manifest rejects at load
    fsutil.mkdirs(spark, f"{path}/codes_append/batch=9")
    with pytest.raises(ValueError, match="uncommitted WAL ids"):
        ann_index.retrain_pq_index(spark, path, vecs)
    fsutil.delete(spark, f"{path}/codes_append/batch=9")

    # the serving corpus after the takedown; iters matches the fresh
    # reference build below (determinism makes them bit-comparable)
    corpus = vecs.filter(F.col("vec_id") != gone).localCheckpoint()
    rep = ann_index.retrain_pq_index(spark, path, corpus, iters=1)
    assert rep["train_rows"] == corpus.count()
    assert rep["horizon"] == 2 and rep["folded_entries"] == 2

    loaded = ann_index.load_pq_index(spark, path)
    assert loaded.codes.count() == corpus.count()
    assert loaded.meta["train_rows"] == corpus.count()
    assert loaded.meta["retrain_of"] == old_meta["cb_sig"]
    assert loaded.meta["cb_sig"] != old_meta["cb_sig"]  # new quantizers
    # WAL is folded away; the horizon survives in the codes snapshot
    assert fsutil.child_names(spark, f"{path}/codes_append") == []
    assert fsutil.child_names(spark, f"{path}/tombstones") == []
    assert statedir.snapshot_horizon(spark, f"{path}/codes_head") == 2

    # serving equals a deterministic fresh build on the same corpus
    queries = corpus.limit(3)
    served = ann_index.knn_from_index(
        loaded, corpus, queries, k=5, shortlist=30, n_probe=4
    )
    ref_path = str(tmp_path / "ref_idx")
    ann_index.save_pq_index(
        ann_index.build_pq_index(
            corpus, m=8, n_codes=8, n_cells=8, iters=1,
            sample_fraction=1.0,
        ),
        ref_path,
    )
    ref = ann_index.knn_from_index(
        ann_index.load_pq_index(spark, ref_path), corpus, queries,
        k=5, shortlist=30, n_probe=4,
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # the retracted id serves to nobody
    assert served.filter(F.col("neighbor_id") == gone).count() == 0

    # folded WAL ids refuse replay (the compaction trade); the next
    # auto id continues past the horizon
    with pytest.raises(ValueError, match="at or below the compaction"):
        ann_index.append_to_pq_index(spark, path, odd.limit(3), batch_id=1)
    rep3 = ann_index.append_to_pq_index(spark, path, odd.limit(3))
    assert rep3["batch_id"] == 3

    # staleness resets: the appended fraction counts from the NEW
    # train_rows (3 appended rows over the full corpus, tiny)
    rows = {r.artifact: r for r in
            ann_index.pq_index_report(spark, path).collect()}
    st = rows.get("appended_staleness")
    assert st is not None and "3 rows" in st.detail


def test_retrain_pq_index_preserves_passed_lease(spark, vecs, tmp_path):
    # the index-dir lease record lives INSIDE the swapped dir — the
    # retrain must carry it through, or a run-scoped holder gets fenced
    # by its own maintenance verb
    from pulfa_sausage_factory_spark import statedir

    even = vecs.filter(F.col("vec_id") % 2 == 0).localCheckpoint()
    path = str(tmp_path / "lease_idx")
    ann_index.save_pq_index(
        ann_index.build_pq_index(
            even, m=8, n_codes=8, n_cells=8, iters=1, sample_fraction=1.0
        ),
        path,
    )
    held = statedir.acquire_lease(spark, path, owner="run-scope")
    try:
        ann_index.retrain_pq_index(spark, path, even, lease=held)
        held.check()  # still the live holder after the swap
        held.renew()
        # a second writer still refuses while the lease is held
        with pytest.raises(statedir.LeaseHeld):
            statedir.acquire_lease(spark, path, owner="intruder")
    finally:
        held.release()
    # clean release: a fresh acquire works
    statedir.acquire_lease(spark, path, owner="next").release()
