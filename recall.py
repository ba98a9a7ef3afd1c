#!/usr/bin/env python
"""ANN quality harness — recall@k of every approximate search path vs the
exact brute-force baseline, on BOTH measured corpora.

The monotonicity TESTS (tests/test_similarity.py) pin that recall moves the
right way with each knob; this harness produces the ABSOLUTE numbers the
tuning tables in RECALL.md document. Usage:

    python recall.py [AMPLIFY]        # default 100 (× sf0.1 = 200k vectors)
    python recall.py text             # RECALL.md table 2: sf0.1 documents
                                      # via hashed_text_embedding, row recall
    SPARK_GRAFT_SF_DIR=... python recall.py 10

Prints one markdown table row per configuration plus a final JSON line.

Method notes:
- corpus vectors are L2-NORMALIZED first, so cosine order == inner-product
  order and the PQ/ADC paths (which score by inner product) share the same
  ground truth as the cosine paths. This mirrors real deployments (ANN
  over normalized sentence embeddings).
- queries are the 50 lowest original vec_ids, searched against the full
  amplified corpus; recall@k = |ANN top-k ∩ exact top-k| / k averaged
  over queries.
- FAMILY-LEVEL RECALL under amplification: ``stress.amplify_embeddings``
  replicates every vector ~identically (first-dim nudge), which makes
  row-level recall degenerate in BOTH directions — a query's nearest
  rows are its own replicas (every method scores ~1.0), and once those
  are excluded, picking WHICH 10 of the next family's ~identical
  replicas matched the exact top-10 is a sub-quantization resolution
  test every ANN method fails (~0.1, measured). The well-posed question
  at stress scale is: did the ANN retrieve the right DISTINCT ORIGINALS?
  So ground truth and results are both reduced to the first k distinct
  replica FAMILIES by rank (own family excluded), and recall@k compares
  family sets. At amp=1 a family is a single vector and this reduces to
  plain row recall@k.
- the driver tables are synthetic near-uniform vectors — close to ANN's
  adversarial case (real embedding corpora cluster, which makes cell
  pruning strictly easier). Numbers here are therefore lower bounds on
  realistic-geometry recall for the IVF family.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import io
from pulfa_sausage_factory_spark.functions.vectors import as_double_array, norm
from pulfa_sausage_factory_spark.operators import similarity
from pulfa_sausage_factory_spark.session import get_spark
from stress import amplify_embeddings

K = 10
N_QUERIES = 50
#: replica-id stride used by stress.amplify_embeddings
_FAMILY = 10_000_000


def _topk_families(rows, k):
    """per-query set of the first ``k`` DISTINCT replica families by rank,
    excluding the query's own family."""
    ranked: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        ranked.setdefault(r.query_id, []).append((r.rk, r.neighbor_id))
    out = {}
    for q, lst in ranked.items():
        own = q % _FAMILY
        fams: list[int] = []
        for _, nid in sorted(lst):
            f = nid % _FAMILY
            if f != own and f not in fams:
                fams.append(f)
                if len(fams) == k:
                    break
        out[q] = set(fams)
    return out


def _normalize(df):
    # the norm is materialized through a checkpoint BEFORE the per-element
    # divide: referencing norm(v) inside the transform lambda would
    # re-evaluate the O(d) fold per element (Catalyst inlines projection
    # aliases into HOF lambdas — no CSE there), i.e. O(d^2) per row
    v = as_double_array("embedding")
    staged = df.select(
        "vec_id", v.alias("_v"), norm(v).alias("_n")
    ).localCheckpoint()
    return staged.select(
        "vec_id",
        F.transform("_v", lambda x: x / F.col("_n")).alias("embedding"),
    )


def append_mode(spark, sf_dir) -> None:
    """RECALL.md §append (round 11): recall decay under APPEND GROWTH.
    ``append_to_pq_index`` encodes new vectors against codebooks and
    coarse centroids FROZEN at build time, so recall over the grown
    corpus decays as the appended fraction rises — faster when the
    appends DRIFT from the training distribution. Measured exactly the
    way a deployment would hit it: build the documented ≥0.9 serving
    config (residual cells=16 / nprobe=8 / rerank shortlist=200) on a
    BASE slice of the text corpus, save it, append growth slices through
    the real WAL path, and serve each step through
    ``knn_from_index(check_corpus=True)`` against exact brute-force
    ground truth over the SAME grown corpus.

    Two append flavors:
    - in-distribution: held-out rows of the same text-embedding corpus
      (queries: base rows — the standard serving question);
    - shifted-family: the synthetic near-uniform ``embeddings`` table —
      a genuinely different vector family (queries: appended-family
      rows, i.e. "can the stale index find the NEW data", which is where
      frozen quantizers hurt first; base-row queries barely move because
      their true neighbors stay base-dominated).

    Everything is hash-deterministic → the numbers reproduce bit-for-bit
    and the retrain threshold is floor-pinnable
    (tests/test_ann_index.py::test_append_staleness_recall_floor)."""
    import shutil
    import tempfile

    from pulfa_sausage_factory_spark.functions.vectors import (
        hashed_text_embedding,
    )
    from pulfa_sausage_factory_spark.operators import ann_index

    docs = io.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"),
        hashed_text_embedding("text", dim=64).alias("embedding"),
    )
    text_corpus = _normalize(docs).localCheckpoint()
    base = text_corpus.filter(F.col("vec_id") % 5 == 0).localCheckpoint()
    pool_in = text_corpus.filter(F.col("vec_id") % 5 != 0)
    shifted_pool = _normalize(
        io.load_table(spark, sf_dir, "embeddings")
    ).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    ).localCheckpoint()
    n_train = base.count()
    print(f"# base(train)={n_train} text vectors; in-dist pool="
          f"{pool_in.count()}, shifted pool={shifted_pool.count()}",
          file=sys.stderr)

    def build_index(tmp):
        idx = ann_index.build_pq_index(
            base, m=8, n_codes=256, n_cells=16, iters=2, ivf_iters=3,
            sample_fraction=1.0,
        )
        ann_index.save_pq_index(idx, tmp)

    def row_recall(served_rows, truth_rows):
        got: dict[int, set] = {}
        for r in served_rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        truth: dict[int, set] = {}
        for r in truth_rows:
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(got.get(q, set()) & t) / float(K) for q, t in truth.items()
        ) / max(1, len(truth))

    results = {}
    print(f"| mode | appended fraction | appended rows | recall@{K} | sec |")
    print("|---|---|---|---|---|")
    for label, pool, query_src in (
        ("in-distribution", pool_in, "base"),
        ("shifted-family", shifted_pool, "appended"),
    ):
        pool_ids = sorted(r.vec_id for r in pool.select("vec_id").collect())
        fracs = (0.1, 0.25, 0.5, 1.0)
        tmp = tempfile.mkdtemp(prefix="recall_append_idx_")
        try:
            build_index(tmp)
            prev_cut = None
            for f in fracs:
                want = int(f * n_train)
                if want > len(pool_ids):
                    break
                cut = pool_ids[want - 1] if want else None
                if cut is None:
                    continue
                slice_new = pool.filter(
                    (F.col("vec_id") <= cut)
                    & (F.lit(prev_cut is None) | (F.col("vec_id") > (prev_cut or 0)))
                )
                ann_index.append_to_pq_index(
                    spark, tmp, slice_new, assign_impl="arrow"
                )
                prev_cut = cut
                grown = base.unionByName(
                    pool.filter(F.col("vec_id") <= cut)
                ).localCheckpoint()
                # FIXED query set across all fraction steps (recall rows
                # must be comparable): the 50 lowest base ids, or — for
                # the shifted flavor — the 50 lowest pool ids, which are
                # inside every nested slice from f=0.1 on
                if query_src == "base":
                    queries = base.orderBy("vec_id").limit(N_QUERIES)
                else:
                    queries = pool.orderBy("vec_id").limit(N_QUERIES)
                queries = queries.localCheckpoint()
                t0 = time.perf_counter()
                loaded = ann_index.load_pq_index(spark, tmp)
                served = ann_index.knn_from_index(
                    loaded, grown, queries, k=K, shortlist=200, n_probe=8,
                    check_corpus=True,
                ).collect()
                dt = time.perf_counter() - t0
                truth = similarity.knn_bruteforce(grown, queries, k=K).collect()
                rec = row_recall(served, truth)
                results[f"{label} f={f}"] = round(rec, 4)
                print(f"| {label} | {f} | {want} | {rec:.3f} | {dt:.1f} |")
            # round 14: the RECOVERY — retrain_pq_index is the remedy the
            # decay table prescribes, so measure it at the worst stale
            # point (every fraction appended): retrain quantizers from
            # the grown corpus in place (same geometry — n_cells='keep',
            # the build's iters), serve the SAME queries against the
            # SAME ground truth. Two serving rows: the stale config's
            # n_probe=8, and probe fraction matched to the hardest
            # family's geometry (n_probe = n_cells, §1's uniform-corpus
            # rule) — retraining fixes WHAT the quantizers know, the
            # probe fraction fixes how much of it a query reads.
            t0 = time.perf_counter()
            ann_index.retrain_pq_index(spark, tmp, grown)
            loaded = ann_index.load_pq_index(spark, tmp)
            dt_retrain = time.perf_counter() - t0
            for np_label, np_val in (("n_probe=8", 8),
                                     ("matched probe fraction", 16)):
                t0 = time.perf_counter()
                served = ann_index.knn_from_index(
                    loaded, grown, queries,
                    k=K, shortlist=200, n_probe=np_val, check_corpus=True,
                ).collect()
                dt = time.perf_counter() - t0
                rec = row_recall(served, truth)
                results[f"{label} retrained {np_label}"] = round(rec, 4)
                print(f"| {label} (retrain_pq_index, {np_label}) "
                      f"| {fracs[-1]} | - | {rec:.3f} | {dt:.1f} |")
            print(f"# {label} retrain_pq_index wall: {dt_retrain:.1f}s",
                  file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "ann_recall_under_append_growth", "k": K,
                      "train_rows": n_train, "recall": results}))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "100"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("recall")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "append":
        append_mode(spark, sf_dir)
        return

    if mode == "text":
        # RECALL.md table 2: realistic clustered geometry — sf0.1 documents
        # embedded by vocabulary hash (row recall@10, amp=1: a "family" is
        # a single vector, so _topk_families reduces to plain row sets)
        from pulfa_sausage_factory_spark.functions.vectors import (
            hashed_text_embedding,
        )

        amp = 1
        emb = io.load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("vec_id"),
            hashed_text_embedding("text", dim=64).alias("embedding"),
        )
    else:
        amp = int(mode)
        emb = io.load_table(spark, sf_dir, "embeddings")
        if amp > 1:
            emb = amplify_embeddings(emb, amp)
    corpus = _normalize(emb).localCheckpoint()
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).localCheckpoint()
    print(f"# corpus={n} vectors, {queries.count()} queries, k={K}", file=sys.stderr)

    # fetching (K+1)*amp ranked rows guarantees >= K distinct non-self
    # families even if every top family's replicas rank contiguously
    k_fetch = (K + 1) * amp if amp > 1 else K
    t0 = time.perf_counter()
    truth = _topk_families(
        similarity.knn_bruteforce(corpus, queries, k=k_fetch).collect(), K
    )
    print(f"# brute-force ground truth: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # iters=3: coarse-centroid convergence is the cheapest quality lever
    # for every trained-cells row, and the residual family NEEDS converged
    # cells (residual magnitude ∝ assignment quality — measured round 6:
    # iters 2→3 moved composed IVFADC from below plain ADC to above it)
    trained_cents = similarity.train_ivf_centroids(
        corpus, n_cells=16, iters=3, sample_fraction=min(1.0, 20_000 / n)
    ).localCheckpoint()
    cb = similarity.train_pq_codebooks(
        corpus, m=8, n_codes=256, iters=2,
        sample_fraction=min(1.0, max(0.05, 20_000 / n)),
    ).localCheckpoint()
    codes = similarity.pq_encode(corpus, cb).localCheckpoint()
    # the residual (IVFADC) index over the same cells — Jégou et al. §III
    cb_res = similarity.train_pq_codebooks(
        corpus, m=8, n_codes=256, iters=2,
        sample_fraction=min(1.0, max(0.05, 20_000 / n)),
        centroids=trained_cents,
    ).localCheckpoint()
    codes_res = similarity.pq_encode(
        corpus, cb_res, centroids=trained_cents
    ).localCheckpoint()

    def lsh(p):
        return lambda: similarity.knn_lsh(
            corpus, queries, k=k_fetch, probe_hamming=p
        )

    def ivf(p, cents=None):
        return lambda: similarity.knn_ivf(
            corpus, queries, k=k_fetch, n_cells=16, n_probe=p, centroids=cents
        )

    def ivf_pq(p):
        return lambda: similarity.knn_ivf_pq(
            corpus, queries, cb, k=k_fetch, n_cells=16, n_probe=p,
            centroids=trained_cents, codes_df=codes,
        )

    def ivfadc(p):
        return lambda: similarity.knn_ivf_pq(
            corpus, queries, cb_res, k=k_fetch, n_cells=16, n_probe=p,
            centroids=trained_cents, codes_df=codes_res,
        )

    configs = [
        ("knn_lsh bits=8 probe=0", lsh(0)),
        ("knn_lsh bits=8 probe=1", lsh(1)),
        ("knn_lsh bits=8 probe=2", lsh(2)),
        ("knn_ivf first-N cells=16 nprobe=1", ivf(1)),
        ("knn_ivf first-N cells=16 nprobe=2", ivf(2)),
        ("knn_ivf first-N cells=16 nprobe=4", ivf(4)),
        ("knn_ivf trained cells=16 nprobe=1", ivf(1, trained_cents)),
        ("knn_ivf trained cells=16 nprobe=2", ivf(2, trained_cents)),
        ("knn_ivf trained cells=16 nprobe=4", ivf(4, trained_cents)),
        ("knn_ivf trained cells=16 nprobe=8", ivf(8, trained_cents)),
        ("knn_pq_adc m=8 codes=256 (full scan)",
         lambda: similarity.knn_pq_adc(codes, queries, cb, k=k_fetch)),
        ("knn_ivf_pq raw-coded cells=16 nprobe=2 m=8", ivf_pq(2)),
        ("knn_ivf_pq raw-coded cells=16 nprobe=4 m=8", ivf_pq(4)),
        ("knn_ivf_pq RESIDUAL cells=16 nprobe=2 m=8", ivfadc(2)),
        ("knn_ivf_pq RESIDUAL cells=16 nprobe=4 m=8", ivfadc(4)),
        ("knn_ivf_pq RESIDUAL cells=16 nprobe=8 m=8", ivfadc(8)),
        (f"knn_pq_rerank shortlist={max(200, 2 * k_fetch)}",
         lambda: similarity.knn_pq_rerank(
             corpus, queries, cb, k=k_fetch,
             shortlist=max(200, 2 * k_fetch), codes_df=codes,
         )),
        (f"knn_pq_rerank RESIDUAL nprobe=8 shortlist={max(200, 2 * k_fetch)}",
         lambda: similarity.knn_pq_rerank(
             corpus, queries, cb_res, k=k_fetch,
             shortlist=max(200, 2 * k_fetch), codes_df=codes_res,
             centroids=trained_cents, n_probe=8,
         )),
    ]
    # round-7: suggest_ann_config's default sizing (cells ~ √n, probe
    # fraction ¼) measured on BOTH corpora — the config an at-scale
    # deployment gets without tuning (build_pq_index(n_cells="auto"))
    sug = similarity.suggest_ann_config(n)
    cents_sug = similarity.train_ivf_centroids(
        corpus, n_cells=sug["n_cells"], iters=3,
        sample_fraction=min(1.0, 20_000 / n),
    ).localCheckpoint()
    cb_sug = similarity.train_pq_codebooks(
        corpus, m=8, n_codes=256, iters=2,
        sample_fraction=min(1.0, max(0.05, 20_000 / n)),
        centroids=cents_sug,
    ).localCheckpoint()
    # arrow twin for the corpus encode: at √n cells the expr assignment is
    # |corpus| × n_cells interpreted cosines (≈90M at amp=100); the fused
    # numpy path is the documented scale mode and is pinned ≡ expr
    codes_sug = similarity.pq_encode(
        corpus, cb_sug, centroids=cents_sug, assign_impl="arrow"
    ).localCheckpoint()
    configs.append((
        f"knn_ivf_pq RESIDUAL AUTO cells={sug['n_cells']} "
        f"nprobe={sug['n_probe']} m=8",
        lambda: similarity.knn_ivf_pq(
            corpus, queries, cb_sug, k=k_fetch, n_probe=sug["n_probe"],
            centroids=cents_sug, codes_df=codes_sug,
        ),
    ))
    # round-8: the untuned default END-TO-END — the recommended serving
    # path (ADC shortlist → exact rerank) over the SAME auto-sized
    # artifacts, and the same query again after a save/load round-trip
    # through operators.ann_index (what a 100 TB query session actually
    # runs; check_corpus exercises the round-8 coverage guard). Both rows
    # must agree — the disk round-trip is bit-preserving.
    import shutil
    import tempfile

    from pulfa_sausage_factory_spark.operators import ann_index

    sl = max(200, 2 * k_fetch)
    idx_auto = ann_index.index_from_artifacts(
        cb_sug, codes_sug, cents_sug, n_probe_suggested=sug["n_probe"]
    )
    auto_dir = tempfile.mkdtemp(prefix="recall_auto_idx_")
    ann_index.save_pq_index(idx_auto, auto_dir)
    loaded_auto = ann_index.load_pq_index(spark, auto_dir)
    configs.append((
        f"knn_pq_rerank AUTO cells={sug['n_cells']} nprobe={sug['n_probe']} "
        f"shortlist={sl}",
        lambda: ann_index.knn_from_index(
            idx_auto, corpus, queries, k=k_fetch, shortlist=sl,
        ),
    ))
    configs.append((
        f"knn_from_index AUTO served-from-disk shortlist={sl}",
        lambda: ann_index.knn_from_index(
            loaded_auto, corpus, queries, k=k_fetch, shortlist=sl,
            check_corpus=True,
        ),
    ))
    if amp > 1:
        # the ¼-corpus-fraction match-up at MORE, smaller cells — on the
        # weak-cluster amplified corpus this is where composed IVFADC
        # clears full-scan ADC (RECALL.md table 1); cells ~ √n is also
        # the 100 TB configuration direction, so the row earns its extra
        # training cost at stress scale only
        cents64 = similarity.train_ivf_centroids(
            corpus, n_cells=64, iters=3, sample_fraction=min(1.0, 20_000 / n)
        ).localCheckpoint()
        cb64 = similarity.train_pq_codebooks(
            corpus, m=8, n_codes=256, iters=2,
            sample_fraction=min(1.0, max(0.05, 20_000 / n)),
            centroids=cents64,
        ).localCheckpoint()
        codes64 = similarity.pq_encode(
            corpus, cb64, centroids=cents64
        ).localCheckpoint()
        configs.append((
            "knn_ivf_pq RESIDUAL cells=64 nprobe=16 m=8",
            lambda: similarity.knn_ivf_pq(
                corpus, queries, cb64, k=k_fetch, n_cells=64, n_probe=16,
                centroids=cents64, codes_df=codes64,
            ),
        ))

    results = {}
    print(f"| configuration | recall@{K} | sec |")
    print("|---|---|---|")
    for name, fn in configs:
        t0 = time.perf_counter()
        got = _topk_families(fn().collect(), K)
        dt = time.perf_counter() - t0
        rec = sum(
            len(got.get(q, set()) & hits) / float(K) for q, hits in truth.items()
        ) / max(1, len(truth))
        results[name] = round(rec, 4)
        print(f"| {name} | {rec:.3f} | {dt:.1f} |")

    shutil.rmtree(auto_dir, ignore_errors=True)
    print(json.dumps({"metric": "ann_recall_at_k", "k": K, "corpus": n,
                      "amplify": amp, "mode": mode, "recall": results}))


if __name__ == "__main__":
    main()
