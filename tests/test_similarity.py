"""X3 — ANN recall properties: multi-probe LSH dominates single-probe and
converges toward brute force as the probe radius grows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import plans
from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.operators import similarity
from pulfa_sausage_factory_spark.operators.similarity import (
    knn_bruteforce,
    knn_lsh,
)


def _recall(approx, exact) -> float:
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    return len(a & e) / len(e)


def test_multiprobe_lifts_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.limit(300)
    queries = emb.limit(8)
    exact = knn_bruteforce(corpus, queries, k=5)
    r = {
        p: _recall(knn_lsh(corpus, queries, k=5, bits=4, probe_hamming=p), exact)
        for p in (0, 1, 2)
    }
    # monotone in the probe radius, and radius-2 must be a real improvement
    # over single-bucket probing on this fixture
    assert r[0] <= r[1] <= r[2]
    assert r[2] > r[0]
    assert r[2] >= 0.6


def test_probe_radius_validated(spark, sf_dir):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    with pytest.raises(ValueError):
        knn_lsh(emb, emb, probe_hamming=3)


def test_embedding_neardup_crossjoin_requires_opt_in(spark, sf_dir):
    # block_col=None is the O(n²) all-pairs baseline — reaching it must be
    # an explicit decision, never a default-argument accident
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="allow_crossjoin"):
        similarity.embedding_neardup(emb, threshold=0.9, block_col=None)
    df = similarity.embedding_neardup(
        emb.limit(50), threshold=0.9, block_col=None, allow_crossjoin=True
    )
    assert df.count() >= 0  # opted-in baseline still runs


def test_ivf_trained_centroids_lift_recall(spark, sf_dir):
    # k-means-trained cells must not lose to the first-N stand-in at equal
    # (n_cells, n_probe) budget — measured vs the brute-force ground truth.
    # (sf0.001 fixture: first-N 0.320/0.505, trained 0.350/0.555.)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, queries, k=10).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact)

    cent = similarity.train_ivf_centroids(
        emb, n_cells=16, iters=2, sample_fraction=1.0
    )
    for n_probe in (2, 4):
        first = recall(
            similarity.knn_ivf(emb, queries, k=10, n_cells=16, n_probe=n_probe)
        )
        trained = recall(
            similarity.knn_ivf(
                emb, queries, k=10, n_cells=16, n_probe=n_probe, centroids=cent
            )
        )
        assert trained >= first, (n_probe, trained, first)


def test_ivf_training_is_deterministic(spark, sf_dir):
    # hash-bucket sample + first-N init + fixed iteration count → the
    # trained centroids are bit-identical across runs (no RNG anywhere)
    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.train_ivf_centroids(emb, n_cells=8, iters=2, sample_fraction=0.5)
    b = similarity.train_ivf_centroids(emb, n_cells=8, iters=2, sample_fraction=0.5)
    ra = sorted((r.cell_id, tuple(r.cent)) for r in a.collect())
    rb = sorted((r.cell_id, tuple(r.cent)) for r in b.collect())
    assert ra == rb
    assert len(ra) == 8


def test_knn_ivf_centroid_pick_is_take_ordered(spark, sf_dir):
    # the deterministic centroid pick is orderBy(id).limit(n) — it must
    # compile to TakeOrderedAndProject (per-partition k-heap + driver merge
    # of k*numPartitions rows), not a global sort
    emb = load_table(spark, sf_dir, "embeddings")
    df = similarity.knn_ivf(emb, emb.filter(F.col("vec_id") < 5), k=5)
    plans.assert_take_ordered(df)
