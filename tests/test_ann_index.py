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
