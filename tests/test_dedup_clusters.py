"""Connected-component dedup clustering: min-label propagation converges to
the component minimum for chains, cycles, and disjoint parts."""

from __future__ import annotations

from pulfa_sausage_factory_spark.operators.dedup import dedup_clusters


def test_clusters_chain_cycle_disjoint(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # triangle 10-11-12, isolated pair 20-21
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: r.canonical_id for r in dedup_clusters(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
