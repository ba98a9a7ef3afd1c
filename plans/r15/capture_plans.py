#!/usr/bin/env python
"""Capture .explain("formatted") for every declared query (queries.py
registry) plus the bench extras' plan-shaped workloads, into
plans/r15/<name>_<tag>.txt — the round-15 optimization evidence files.

Usage: python plans/r15/capture_plans.py <tag>      (tag = before|after)

Plans are captured on the engine session (get_spark) at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the same session/bench scale the
round's measurements use.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pulfa_sausage_factory_spark.io import load_table  # noqa: E402
from pulfa_sausage_factory_spark.queries import QUERIES  # noqa: E402
from pulfa_sausage_factory_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])  # optional subset of query names
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(QUERIES)
    # bench-extra workloads with a DataFrame surface (run_curation executes
    # eagerly and bucketed twins need the bucketed tables; those plans are
    # captured by their own tests/harnesses)
    from pulfa_sausage_factory_spark.functions import sampling
    from pulfa_sausage_factory_spark.operators import dedup, multimodal, similarity
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cb = similarity.train_pq_codebooks(emb, m=8, n_codes=16, iters=1,
                                       sample_fraction=1.0).cache()
    cb.count()


    import tempfile
    from pulfa_sausage_factory_spark.operators import ann_index

    _x3s_dir = tempfile.mkdtemp(prefix="plans_pq_idx_")
    ann_index.save_pq_index(
        ann_index.build_pq_index(emb, m=8, n_codes=16, n_cells=16, iters=1,
                                 sample_fraction=1.0),
        _x3s_dir,
    )

    def _x3s(s):
        loaded = ann_index.load_pq_index(s, _x3s_dir)
        return ann_index.knn_from_index(
            loaded, emb, emb.limit(20), k=10, shortlist=100, n_probe=4)

    extras = {
        "x2g_semdedup": lambda s, d: similarity.semdedup(
            emb, n_cells=16, threshold=0.9, impl="arrow"),
        "x8d_dsir_select": lambda s, d: sampling.dsir_resample(
            docs, docs.limit(200), k=500, dim=8192),
        "x3p_pq_adc": lambda s, d: similarity.knn_pq_adc(
            similarity.pq_encode(emb, cb), emb.limit(20), cb, k=10),
        "x3r_pq_rerank": lambda s, d: similarity.knn_pq_rerank(
            emb, emb.limit(20), cb, k=10, shortlist=100),
        "x2b_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(
            docs, threshold=0.2),
        "x3s_pq_serve_from_disk": lambda s, d: _x3s(s),
        "dedup_substrings": lambda s, d: dedup.dedup_substrings(docs, k=20),
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(
            dedup.minhash_lsh_pairs(docs, threshold=0.2).select("id_a", "id_b")),
        "image_neardup_pairs": lambda s, d: multimodal.image_neardup_pairs(
            docs.select(F.col("doc_id").alias("id"),
                        F.encode("text", "utf-8").alias("content")),
            max_hamming=3),
    }

    for name in names:
        if only and name not in only:
            continue
        fn = QUERIES[name][0]
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)

    for name, fn in extras.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
