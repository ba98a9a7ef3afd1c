"""X3 — ANN recall properties: multi-probe LSH dominates single-probe and
converges toward brute force as the probe radius grows."""

from __future__ import annotations

from pulfa_sausage_factory_spark.io import load_table
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
