"""Amplified-scale stress harness: salt-replicate the driver tables N× and
run the engine's heaviest operators end-to-end.

The sf0.01/sf0.1 correctness gates prove the SEMANTICS; this script
exercises the SCALE CLAIMS empirically — candidate generation stays
output-sensitive, iterative loops stay constant-plan, skewed keys stay
split — by actually running the operators at 10–100× the bench volume on
the same machine. Replication salts the document/user ids (and perturbs
text with the replica tag) so dedup/session keys do not collapse into one
giant duplicate class.

Usage:
    python stress.py [AMPLIFY]          # default 10 (× sf0.1)
    SPARK_GRAFT_SF_DIR=... python stress.py 50
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import envprobe, io
from pulfa_sausage_factory_spark.functions import sampling
from pulfa_sausage_factory_spark.operators import dedup, events, similarity
from pulfa_sausage_factory_spark.session import get_spark


def _assert_ids_below(df, col: str, stride: int) -> None:
    """Replica offsets are ``id + rep × stride``: an id at/above the
    stride would collide with another replica's range and dedup/session/
    ANN keys would silently merge rows across replicas. One cheap
    single-column agg; loud failure beats corrupted measurements.
    (``amplify_facts`` instead DERIVES its stride — nothing downstream
    depends on its constant; the doc/event/embedding strides are load-
    bearing: ``recall._FAMILY`` reduces amplified ids mod 10M.)"""
    mx = df.agg(F.max(col)).collect()[0][0] or 0
    if int(mx) >= stride:
        raise ValueError(
            f"amplify: max {col}={mx} >= replica stride {stride} — this "
            "SF is too large for the fixed stride; replica key ranges "
            "would overlap and corrupt the workload silently"
        )


def amplify_docs(docs, n: int):
    """N salted replicas: ids offset per replica and EVERY token salted
    with the replica tag — near-dup structure is preserved exactly WITHIN
    a replica (all docs in a replica get the same transformation) while
    replicas share no shingles/bits with each other, so dedup output
    scales LINEARLY with the amplification factor (same dup density, N×
    the volume) instead of quadratically (replicas near-dupping each
    other)."""
    _assert_ids_below(docs, "doc_id", 10_000_000)
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<long>")).alias("rep")
    base = docs.select("doc_id", "text", reps)
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
        " ",
    )
    # a real 100 TB source arrives as thousands of splits; the sf0.1 file
    # is one row group, so the amplified frame would inherit ONE partition
    # and serialize every Arrow UDF onto a single core without this
    return base.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        salted.alias("text"),
    ).repartition(64)


def amplify_events(ev, n: int):
    _assert_ids_below(ev, "event_id", 100_000_000)
    _assert_ids_below(ev, "user_id", 10_000_000)
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<long>")).alias("rep")
    return ev.select(
        "event_id", "user_id", "ts", "event_type", "value", "props", reps
    ).select(
        (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
        "ts", "event_type", "value", "props",
    ).repartition(64)


def amplify_embeddings(emb, n: int):
    """N replicas with distinct ids and a replica-dependent nudge on the
    first dimension — keeps realistic cosine geometry (cells stay
    meaningful) without making replicas bit-identical."""
    _assert_ids_below(emb, "vec_id", 10_000_000)
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<long>")).alias("rep")
    nudged = F.concat(
        F.array(
            F.element_at("embedding", 1).cast("double")
            + F.col("rep").cast("double") / (2.0 * n)
        ),
        F.slice(F.col("embedding").cast("array<double>"), 2, 100_000),
    )
    return emb.select("vec_id", "embedding", reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        nudged.alias("embedding"),
    ).repartition(64)


def amplify_facts(orders, li, n: int):
    """N replicas of the orders/lineitem pair with ALIGNED orderkey offsets
    (both sides shift by the same per-replica stride), so every replica's
    fact⨝fact join matches exactly its own rows — join output scales
    linearly with amplification. Dimension keys (custkey/suppkey) are left
    unsalted: dims stay broadcast-sized, which is also the 100 TB reality
    (facts grow, dims don't).

    The stride is derived from the ACTUAL max orderkey (one cheap
    single-column agg), not hardcoded: TPC-H orderkeys are sparse up to
    6M×SF, so a fixed stride would overlap replica key ranges at larger
    SFs and cross-replica join matches would silently corrupt the
    workload being measured."""
    mx = orders.agg(F.max("o_orderkey")).collect()[0][0] or 0
    stride = max(10_000_000, int(mx) + 1)
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(n - 1)).cast("array<long>")
    ).alias("rep")
    o = orders.select("*", reps).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("rep") * stride
    ).drop("rep")
    l = li.select("*", reps).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("rep") * stride
    ).drop("rep")
    return o, l


def _bucketed_fact_stress(spark, sf_dir: str, amp: int, out: dict, run) -> None:
    """Plain vs bucketed q3/q5/q10 at amplified scale — the round-5 twins
    measured where the fact-fact Exchange actually dominates. Both sides
    read the SAME amplified facts from disk (plain parquet vs bucketed
    managed tables) and run the IDENTICAL workload bodies
    (``bucketed_queries.q*_over``); the one-time bucketize cost is
    reported alongside so the amortization claim stays honest."""
    import shutil
    import tempfile

    from pulfa_sausage_factory_spark import bucketed_queries as bq
    from pulfa_sausage_factory_spark.sinks import bucketed

    orders_amp, li_amp = amplify_facts(
        io.load_table(spark, sf_dir, "orders"),
        io.load_table(spark, sf_dir, "lineitem"),
        amp,
    )
    c = io.load_table(spark, sf_dir, "customer")
    s = io.load_table(spark, sf_dir, "supplier")
    nn = io.load_table(spark, sf_dir, "nation")
    r = io.load_table(spark, sf_dir, "region")
    work = tempfile.mkdtemp(prefix="stress_facts_")
    tables = ("bqs_orders", "bqs_lineitem")
    # clear orphaned table DATA from a previously killed run: the
    # in-memory catalog died with that session, so DROP TABLE can't reach
    # the files and saveAsTable refuses the non-empty location forever
    # (same failure mode and same cure as the bench twins — shared helper)
    bq._clear_orphan_dirs(spark, tables)
    try:
        # land the amplified facts ONCE as splittable parquet — the plain
        # side's source (re-amplifying per query would bill the explode to
        # the query, and single-file sources would serialize the scan)
        orders_amp.write.mode("overwrite").parquet(f"{work}/orders")
        li_amp.write.mode("overwrite").parquet(f"{work}/lineitem")
        orders_p = spark.read.parquet(f"{work}/orders")
        li_p = spark.read.parquet(f"{work}/lineitem")

        probe = envprobe.op_probe()
        t0 = time.perf_counter()
        bucketed.write_bucketed(
            orders_p, f"default.{tables[0]}", "o_orderkey", 32, "o_orderkey"
        )
        bucketed.write_bucketed(
            li_p, f"default.{tables[1]}", "l_orderkey", 32, "l_orderkey"
        )
        bucketize_sec = round(time.perf_counter() - t0, 2)  # before counts
        out["ops"]["bucketize_facts_ingest"] = {
            "rows": orders_p.count() + li_p.count(),
            "sec": bucketize_sec,
            "env": probe,
        }
        orders_b = spark.table(f"default.{tables[0]}")
        li_b = spark.table(f"default.{tables[1]}")

        run("q3_plain", lambda: bq.q3_over(orders_p, li_p, c))
        run("q3_bucketed", lambda: bq.q3_over(orders_b, li_b, c))
        run("q5_plain", lambda: bq.q5_over(orders_p, li_p, c, s, nn, r))
        run("q5_bucketed", lambda: bq.q5_over(orders_b, li_b, c, s, nn, r))
        run("q10_plain", lambda: bq.q10_over(orders_p, li_p, c))
        run("q10_bucketed", lambda: bq.q10_over(orders_b, li_b, c))
    finally:
        for t in tables:
            try:
                spark.sql(f"DROP TABLE IF EXISTS default.{t}")
            except Exception:  # noqa: BLE001
                pass
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # environment context (round-14 VERDICT item 1: stress figures must
    # self-adjudicate like bench figures — r13's missing env block
    # manufactured three phantom cross-round "regressions"): run-header
    # block + a per-row load1/calib probe on every recorded op
    env0 = envprobe.env_start()
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    docs = amplify_docs(io.load_table(spark, sf_dir, "documents"), amp)
    ev = amplify_events(io.load_table(spark, sf_dir, "events"), amp)
    n_docs, n_ev = docs.count(), ev.count()
    out = {"amplify": amp, "n_docs": n_docs, "n_events": n_ev, "ops": {}}

    def run(name, fn):
        probe = envprobe.op_probe()
        t0 = time.perf_counter()
        n = fn().count()
        dt = round(time.perf_counter() - t0, 2)
        out["ops"][name] = {"rows": n, "sec": dt, "env": probe}
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    run("exact_dedup", lambda: dedup.exact_dedup(docs))
    run("minhash_lsh_pairs", lambda: dedup.minhash_lsh_pairs(docs))
    run("simhash_neardup", lambda: dedup.simhash_neardup_pairs(docs))
    run("line_dedup", lambda: dedup.dedup_corpus_lines(docs))
    # exact substring dedup: window-hash pass + hash-key window + doc-side
    # coverage/rebuild — the token frame is the largest intermediate
    # (n_docs × doc_len rows), so this op stresses the per-token path
    run("substring_dedup", lambda: dedup.dedup_substrings(docs, k=20))
    # perceptual image near-dup: dHash Arrow pass + pigeonhole banding —
    # binary content fabricated from the salted text (same convention as
    # the x6 driver queries), so replicas share no fingerprints
    from pulfa_sausage_factory_spark.operators import multimodal

    run(
        "image_neardup",
        lambda: multimodal.image_neardup_pairs(
            docs.select(
                F.col("doc_id").alias("id"),
                F.encode("text", "utf-8").alias("content"),
            ),
            max_hamming=3,
        ),
    )
    # event-time surface at amplified scale: shuffle on user_id
    # (sessionize — per-user sorted pass), pre-combined window aggs
    # (tumbling/sliding fan-out happens JVM-side before the shuffle), and
    # the one-shuffle exact + sketch profiles
    run("sessionize", lambda: events.sessionize(ev, gap_minutes=30))
    run("tumbling_counts", lambda: events.tumbling_counts(ev, "1 hour"))
    run(
        "sliding_counts",
        lambda: events.sliding_counts(ev, size="1 hour", slide="30 minutes"),
    )
    run("event_profile", lambda: events.event_profile(ev))
    run("approx_profile", lambda: events.approx_profile(ev))
    run(
        "knn_lsh",
        lambda: similarity.knn_lsh(
            io.load_table(spark, sf_dir, "embeddings"),
            io.load_table(spark, sf_dir, "embeddings").limit(50),
            k=10,
        ),
    )
    emb_amp = amplify_embeddings(io.load_table(spark, sf_dir, "embeddings"), amp)
    run(
        "knn_ivf_trained",
        lambda: similarity.knn_ivf(
            emb_amp,
            io.load_table(spark, sf_dir, "embeddings").limit(50),
            k=10,
            n_cells=32,
            n_probe=2,
            centroids=similarity.train_ivf_centroids(
                emb_amp, n_cells=32, iters=2, sample_fraction=0.05
            ),
        ),
    )

    # persisted-index lifecycle at amplified scale (round-7): the 100×
    # analog of bench's x3s extra — build+save once (the offline job),
    # then serve strictly from the on-disk artifacts. n_cells="auto"
    # exercises the suggest_ann_config √n sizing (the at-scale default);
    # serve reads the manifest's matched probe budget. Guarded like the
    # bucketed stress: an index/disk failure must not void earlier ops.
    try:
        import shutil
        import tempfile

        from pulfa_sausage_factory_spark.operators import ann_index

        idx_dir = tempfile.mkdtemp(prefix="stress_pq_idx_")
        n_emb = emb_amp.count()

        def _build_save():
            idx = ann_index.build_pq_index(
                emb_amp, m=8, n_codes=256, n_cells="auto", iters=2,
                sample_fraction=min(1.0, 10_000 / max(1, n_emb)),
                assign_impl="arrow",
            )
            ann_index.save_pq_index(idx, idx_dir)
            out["ops"].setdefault("pq_index_meta", {}).update(
                n_cells=idx.meta["n_cells"],
                n_probe=idx.meta.get("n_probe_suggested"),
            )
            # rows metric = coded corpus rows actually on disk (read back,
            # not recomputed)
            return spark.read.parquet(f"{idx_dir}/codes")

        run("pq_index_build_save", _build_save)
        queries50 = io.load_table(spark, sf_dir, "embeddings").limit(50)
        run(
            "pq_index_serve_from_disk",
            lambda: ann_index.knn_from_index(
                ann_index.load_pq_index(spark, idx_dir),
                emb_amp,
                queries50,
                k=10,
                shortlist=200,
            ),
        )

        # round-8: the index LIVES after the build — append a fresh batch
        # (ids above every amplified replica), tombstone a handful of
        # actually-served ids (the takedown path), serve the mutated
        # index with the coverage guard ON (corpus = amplified ∪
        # appended), then compact the append/tombstone log into one
        # snapshot and serve again: growth stays load-bounded and
        # takedowns purge physically, measured at stress scale under the
        # same heap cap.
        new_batch = io.load_table(spark, sf_dir, "embeddings").select(
            (F.col("vec_id") + amp * 10_000_000).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        grown = emb_amp.unionByName(new_batch)

        def _append():
            rep = ann_index.append_to_pq_index(
                spark, idx_dir, new_batch, assign_impl="arrow"
            )
            return spark.range(rep["rows"])

        run("pq_index_append_batch", _append)

        def _tombstone_and_serve():
            hits = ann_index.knn_from_index(
                ann_index.load_pq_index(spark, idx_dir), grown, queries50,
                k=10, shortlist=200, check_corpus=True,
            )
            victims = [r.neighbor_id for r in hits.limit(5).collect()]
            ann_index.remove_from_pq_index(spark, idx_dir, victims)
            return ann_index.knn_from_index(
                ann_index.load_pq_index(spark, idx_dir), grown, queries50,
                k=10, shortlist=200, check_corpus=True,
            )

        run("pq_index_tombstone_serve", _tombstone_and_serve)

        def _compact_serve():
            crep = ann_index.compact_pq_index(spark, idx_dir)
            out["ops"]["pq_index_compact_meta"] = {
                "horizon": crep["horizon"],
                "folded": crep["folded_batches"],
                "snapshot_rows": crep["snapshot_rows"],
            }
            return ann_index.knn_from_index(
                ann_index.load_pq_index(spark, idx_dir), grown, queries50,
                k=10, shortlist=200, check_corpus=True,
            )

        run("pq_index_compact_serve", _compact_serve)

        # round-14: the drift remedy at stress scale — retrain quantizers
        # from the CURRENT serving corpus (grown, minus the tombstoned
        # ids the compaction purged) and swap in place; serve after. The
        # dominant cost is the corpus re-encode (the same fused-BLAS
        # arrow pass the build pays) — this row is what a drifted
        # deployment budgets for.
        def _retrain_serve():
            live_ids = ann_index.load_pq_index(spark, idx_dir).codes.select(
                F.col("id").alias("vec_id")
            )
            # checkpoint: the live-id semi-join lazily READS the index
            # dir being swapped — the verb refuses that (correctly)
            corpus_now = grown.join(
                live_ids, "vec_id", "left_semi"
            ).localCheckpoint()
            rrep = ann_index.retrain_pq_index(
                spark, idx_dir, corpus_now,
                sample_fraction=min(1.0, 10_000 / max(1, n_emb)),
            )
            out["ops"]["pq_index_retrain_meta"] = {
                "train_rows": rrep["train_rows"],
                "horizon": rrep["horizon"],
                "n_cells": rrep["n_cells"],
            }
            return ann_index.knn_from_index(
                ann_index.load_pq_index(spark, idx_dir), corpus_now,
                queries50, k=10, shortlist=200, check_corpus=True,
            )

        run("pq_index_retrain_serve", _retrain_serve)
        shutil.rmtree(idx_dir, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        out["ops"]["pq_index_stress"] = {
            "error": f"{type(exc).__name__}: {exc}"[:300]
        }
        print(f"# pq_index_stress FAILED — {exc}", file=sys.stderr)

    # SemDeDup at amplified scale: cell count grows with the corpus (the
    # paper's √n rule, sized by suggest_ann_config via n_cells="auto")
    # so within-cell quadratics stay bounded
    run(
        "semdedup",
        lambda: similarity.semdedup(
            emb_amp, n_cells="auto", threshold=0.95, impl="arrow"
        ).filter(F.col("removed")),
    )
    # DSIR selection over the amplified corpus against a small target —
    # two corpus-sized distribution fits + broadcast-join scoring + top-k
    run(
        "dsir_resample",
        lambda: sampling.dsir_resample(
            docs,
            io.load_table(spark, sf_dir, "documents").limit(500),
            k=10_000,
            dim=8192,
        ),
    )

    # plain vs bucketed q3/q5/q10 over amplified facts (+ the one-time
    # bucketize cost) — guarded: a metastore/disk failure here must not
    # discard the earlier ops' evidence
    try:
        _bucketed_fact_stress(spark, sf_dir, amp, out, run)
    except Exception as exc:  # noqa: BLE001
        out["ops"]["bucketed_fact_stress"] = {
            "error": f"{type(exc).__name__}: {exc}"[:300]
        }
        print(f"# bucketed_fact_stress FAILED — {exc}", file=sys.stderr)

    # the COMPOSED curation DAG at amplified scale: gates + both dedups +
    # decontamination + packing chained end-to-end (no shard write — the
    # ops, not local disk, are what is under test)
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        CurationConfig,
        run_curation,
    )

    probe = envprobe.op_probe()
    t0 = time.perf_counter()
    rep = run_curation(
        spark,
        docs,
        CurationConfig(min_quality=0.0),
        bench=io.load_table(spark, sf_dir, "documents").limit(200),
    )
    dt = round(time.perf_counter() - t0, 2)
    out["ops"]["curation_pipeline"] = {
        "rows": rep["output_rows"],
        "sec": dt,
        "env": probe,
        "stages": {s["stage"]: s["rows"] for s in rep["stages"]},
    }
    print(f"# curation_pipeline: {rep['output_rows']} rows in {dt}s", file=sys.stderr)

    # the INCREMENTAL ingest loop at amplified scale: land the amplified
    # corpus as JSONL shards, drain them through the streaming path with
    # the exact-digest ledger on — second run must admit zero (the ledger
    # anti-join at full volume, not just the 3-doc unit test)
    import shutil
    import tempfile

    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        ingest_state_report,
        retract_documents,
        run_incremental_curation,
    )

    work = tempfile.mkdtemp(prefix="stress_ingest_")
    try:  # guarded: a failure here must not discard the earlier ops' JSON
        landing = f"{work}/landing"
        docs.select(F.col("doc_id"), F.col("text")).write.mode(
            "overwrite"
        ).option("maxRecordsPerFile", 100_000).json(landing)
        probe = envprobe.op_probe()
        t0 = time.perf_counter()
        irep = run_incremental_curation(
            spark, landing, f"{work}/state",
            CurationConfig(min_quality=0.0, neardup_method="none"),
        )
        dt = round(time.perf_counter() - t0, 2)
        # land the SAME texts again as NEW files (shifted ids, append-mode
        # part files): the second drain scans the full volume and the
        # digest-ledger anti-join must reject every row — this exercises
        # the cross-run dedup at scale, not just the checkpoint's
        # no-new-files fast path
        docs.select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), F.col("text")
        ).write.mode("append").option("maxRecordsPerFile", 100_000).json(landing)
        t0 = time.perf_counter()
        irep2 = run_incremental_curation(
            spark, landing, f"{work}/state",
            CurationConfig(min_quality=0.0, neardup_method="none"),
        )
        dt2 = round(time.perf_counter() - t0, 2)
        out["ops"]["incremental_ingest"] = {
            "rows": irep["total_admitted"],
            "sec": dt,
            "env": probe,
            "dup_rerun_admitted": irep2["total_admitted"],
            "dup_rerun_sec": dt2,
        }
        print(
            f"# incremental_ingest: {irep['total_admitted']} rows in {dt}s "
            f"(dup re-land admitted {irep2['total_admitted']} in {dt2}s)",
            file=sys.stderr,
        )

        # round-12: the Bloom-guarded exact-dedup decision against the
        # now-populated full-volume ledger. Fresh (all-new) batches are
        # the common case at 100 TB — with the sidecar the ledger is
        # not even scanned for them. Same state dir, three sequential
        # fresh batches (unique texts): bloom OFF baseline, bloom ON
        # paying the one-time catch-up merge of the whole ledger, then
        # bloom ON steady-state. The steady-state batch's `maybe` count
        # is the measured fp rate at this saturation.
        def _fresh(tag, shift):
            sub = docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + shift).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" fresh-{tag}-"),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
            sub.write.mode("append").option(
                "maxRecordsPerFile", 100_000
            ).json(landing)

        plain_cfg = CurationConfig(min_quality=0.0, neardup_method="none")
        bloom_cfg = CurationConfig(
            min_quality=0.0, neardup_method="none", ledger_bloom=True,
            ledger_bloom_expected_items=4_000_000,
        )
        probe = envprobe.op_probe()
        _fresh("a", 2_000_000_000)
        t0 = time.perf_counter()
        ra = run_incremental_curation(
            spark, landing, f"{work}/state", plain_cfg
        )
        dt_off = round(time.perf_counter() - t0, 2)
        _fresh("b", 3_000_000_000)
        t0 = time.perf_counter()
        rb = run_incremental_curation(
            spark, landing, f"{work}/state", bloom_cfg
        )
        dt_catchup = round(time.perf_counter() - t0, 2)
        _fresh("c", 4_000_000_000)
        t0 = time.perf_counter()
        rc = run_incremental_curation(
            spark, landing, f"{work}/state", bloom_cfg
        )
        dt_on = round(time.perf_counter() - t0, 2)
        maybe = sum(
            b.get("ledger_bloom", {}).get("maybe", 0)
            for b in rc["batches"]
        )
        out["ops"]["ledger_bloom_ingest"] = {
            "env": probe,
            "fresh_rows": ra["total_admitted"],
            "fresh_plain_sec": dt_off,
            "bloom_catchup_sec": dt_catchup,
            "fresh_bloom_sec": dt_on,
            "steady_admitted": rc["total_admitted"],
            "steady_maybe": maybe,
        }
        print(
            f"# ledger_bloom_ingest: fresh {ra['total_admitted']} rows "
            f"plain {dt_off}s | bloom catchup {dt_catchup}s | bloom "
            f"steady {dt_on}s (maybe={maybe} of "
            f"{rc['total_admitted']} admitted)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001 — record, keep the evidence
        out["ops"]["incremental_ingest"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"# incremental_ingest FAILED — {exc}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # round-9 substring-OVERLAP ledger at amplified scale. Winnowing is
    # the heaviest per-char state derivation in the engine (posexplode
    # chars + two windows per doc), so measure it on a 10% slice of the
    # amplified corpus, then land PARTIAL COPIES (a 600-char prefix of
    # each admitted text inside fresh framing — low whole-doc Jaccard,
    # different digest) and record how many the fps ledger rejects.
    # Expect well under 100%: the prefix is truncated to the doc's own
    # length (median 295 chars — the zero-margin coin-flip regime), so
    # this is a THROUGHPUT figure; OVERLAP.md is the quality
    # characterization with lift length controlled exactly.
    work = tempfile.mkdtemp(prefix="stress_overlap_")
    try:
        subset = docs.filter(F.col("doc_id") % 10 == 0).select(
            "doc_id", "text"
        )
        landing = f"{work}/landing"
        subset.write.mode("overwrite").option(
            "maxRecordsPerFile", 100_000
        ).json(landing)
        # the in-pipeline fold cadence runs live at stress scale too: the
        # fps dir lands ~32 shuffle-partition files per batch, so the
        # bound forces a fold after each run and the second run's ledger
        # reads go through the batch_id=-1 archive
        ocfg = CurationConfig(
            min_quality=0.0, neardup_method="none", overlap_ledger=True,
            ingest_compact_max_files=8,
        )
        probe = envprobe.op_probe()
        t0 = time.perf_counter()
        orep = run_incremental_curation(
            spark, landing, f"{work}/state", ocfg
        )
        dt = round(time.perf_counter() - t0, 2)
        subset.select(
            (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
            F.concat(
                F.lit("entirely new framing sentence before the lift "),
                F.substring("text", 1, 600),
                F.lit(" and an entirely new conclusion after it"),
            ).alias("text"),
        ).write.mode("append").option(
            "maxRecordsPerFile", 100_000
        ).json(landing)
        probe2 = envprobe.op_probe()
        t0 = time.perf_counter()
        orep2 = run_incremental_curation(
            spark, landing, f"{work}/state", ocfg
        )
        dt2 = round(time.perf_counter() - t0, 2)
        out["ops"]["overlap_ingest"] = {
            "rows": orep["total_admitted"],
            "sec": dt,
            "env": probe,
            "partial_copy_env": probe2,
            "partial_copies_landed": orep2["batches"][-1]["input_rows"]
            if orep2["batches"] else 0,
            "partial_copy_admitted": orep2["total_admitted"],
            "partial_copy_sec": dt2,
            # measured state cost per artifact (files/bytes from the
            # listing — ingest_state_report): the fps dir's honest
            # double-digit-%-of-corpus cost as a number, not a prediction
            "state": {
                r.artifact: {"files": r.files, "bytes": r.bytes}
                for r in ingest_state_report(
                    spark, f"{work}/state"
                ).collect()
            },
        }
        print(
            f"# overlap_ingest: {orep['total_admitted']} rows in {dt}s "
            f"(partial-copy re-land admitted {orep2['total_admitted']} "
            f"in {dt2}s)",
            file=sys.stderr,
        )
        # round-11 auto-coarsen cadence at scale: land a small fresh drop
        # and drain with the row budget set to half the current fps rows
        # — exactly one power-of-two coarsen fires in-pipeline (the
        # meta-first migration + fps fold at full state volume, which is
        # what costs). "auto" adopts the persisted mod; the budget check
        # itself is a footer-metadata count.
        from dataclasses import replace as dc_replace

        fps_rows = spark.read.parquet(f"{work}/state/fps").count()
        subset.limit(100).select(
            (F.col("doc_id") + 3_000_000_000).alias("doc_id"), "text"
        ).write.mode("append").option(
            "maxRecordsPerFile", 100_000
        ).json(landing)
        ocfg_c = dc_replace(
            ocfg, overlap_sample_mod="auto",
            overlap_coarsen_above_rows=max(1, fps_rows // 2),
        )
        probe = envprobe.op_probe()
        t0 = time.perf_counter()
        orep3 = run_incremental_curation(spark, landing, f"{work}/state", ocfg_c)
        dt_c = round(time.perf_counter() - t0, 2)
        co = (orep3["batches"][-1].get("overlap_coarsened")
              if orep3["batches"] else None)
        out["ops"]["overlap_auto_coarsen"] = {
            "fps_rows_before_run": fps_rows,
            "row_budget": max(1, fps_rows // 2),
            "cadence": co,
            "sec": dt_c,
            "env": probe,
        }
        print(
            f"# overlap_auto_coarsen: {co} in {dt_c}s "
            f"(fps rows before: {fps_rows})",
            file=sys.stderr,
        )
        # round-11 retraction verb at scale: take down a 1,000-doc batch
        # from the populated state (digest ledger + fps + corpus here —
        # the per-surface swap rewrite at full state volume, the part
        # that actually costs), then verify the ids are physically gone.
        # Own try/except: a failure here must land under ITS key, never
        # overwrite the already-recorded overlap_ingest evidence.
        try:
            rids = [
                r.doc_id
                for r in spark.read.parquet(f"{work}/state/corpus")
                .select("doc_id").limit(1000).collect()
            ]
            probe = envprobe.op_probe()
            t0 = time.perf_counter()
            rrep = retract_documents(spark, f"{work}/state", rids, ocfg)
            dt3 = round(time.perf_counter() - t0, 2)
            left = (
                spark.read.parquet(f"{work}/state/corpus")
                .filter(F.col("doc_id").isin(rids)).count()
            )
            out["ops"]["retract_documents"] = {
                "requested": len(rids),
                "found": rrep["found"],
                "scrubbed": rrep["scrubbed"],
                "sec": dt3,
                "env": probe,
                # the verb's own postcondition check (round 12) next to
                # the external probe it mirrors
                "residual": rrep.get("residual"),
                "still_present_after": left,
            }
            print(
                f"# retract_documents: {rrep['found']} of {len(rids)} "
                f"ids scrubbed from {sorted(rrep['scrubbed'])} in {dt3}s "
                f"(still present after: {left})",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["ops"]["retract_documents"] = {
                "error": f"{type(exc).__name__}: {exc}"[:300]
            }
            print(f"# retract_documents FAILED — {exc}", file=sys.stderr)
        # round-12 audit retention at scale: the state above holds the
        # retraction records + any overlap-drop audit rows; prune at the
        # stream checkpoint's committed horizon. The retracted/ leg pays
        # the completed-scrub membership probe at full state volume —
        # the part that actually costs.
        try:
            from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (  # noqa: E501
                prune_ingest_audit,
            )

            probe = envprobe.op_probe()
            t0 = time.perf_counter()
            prep = prune_ingest_audit(spark, f"{work}/state", ocfg)
            dt4 = round(time.perf_counter() - t0, 2)
            out["ops"]["prune_ingest_audit"] = {
                "horizon": prep["horizon"],
                "retracted": prep["retracted"],
                "overlap_drops": prep["overlap_drops"],
                "retained_incomplete": prep["retained_incomplete"],
                "sec": dt4,
                "env": probe,
            }
            print(
                f"# prune_ingest_audit: retracted {prep['retracted']} "
                f"overlap_drops {prep['overlap_drops']} (retained "
                f"incomplete: {prep['retained_incomplete']}) in {dt4}s",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["ops"]["prune_ingest_audit"] = {
                "error": f"{type(exc).__name__}: {exc}"[:300]
            }
            print(f"# prune_ingest_audit FAILED — {exc}", file=sys.stderr)
        # round-12 fsck at scale: the cross-surface consistency check
        # over the same populated state — pays the corpus (id, md5)
        # scan plus every ledger-sized anti-join at full volume; on a
        # healthy state every check must come back ok/skipped (the
        # retraction above already completed and was pruned).
        try:
            from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (  # noqa: E501
                check_ingest_state,
            )

            probe = envprobe.op_probe()
            t0 = time.perf_counter()
            frep = check_ingest_state(spark, f"{work}/state", ocfg)
            checks = frep.collect()
            dt5 = round(time.perf_counter() - t0, 2)
            bad = {
                f"{r.check}/{r.surface}": [r.status, int(r.n)]
                for r in checks if r.status in ("fail", "warn")
            }
            out["ops"]["check_ingest_state"] = {
                "checks": len(checks),
                "not_ok": bad,
                "sec": dt5,
                "env": probe,
            }
            print(
                f"# check_ingest_state: {len(checks)} checks, "
                f"not_ok={bad or '{}'} in {dt5}s",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["ops"]["check_ingest_state"] = {
                "error": f"{type(exc).__name__}: {exc}"[:300]
            }
            print(f"# check_ingest_state FAILED — {exc}", file=sys.stderr)
        # round-14 (VERDICT item 5): the maintenance planner END-TO-END
        # at 100x-sized state — dirty state → plan names verbs → run the
        # named verbs → plan empties of recommendations. The planner
        # promises listings-only cheapness; its own wall time at this
        # state volume is the evidence. Planning uses a cadence-free cfg
        # (the run above had ingest_compact_max_files set, which
        # downgrades file-growth items to cadence-owned info rows) and a
        # LOW max_files so the amplified state is genuinely over budget.
        try:
            from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (  # noqa: E501
                compact_ingest_state,
            )
            from pulfa_sausage_factory_spark.pipelines.maintenance import (
                suggest_maintenance,
            )

            # "auto" adopts whatever mod the auto-coarsen block above
            # re-pinned in fps_meta — ocfg's explicit mod would hit the
            # documented contradiction refusal
            mcfg = dc_replace(ocfg, ingest_compact_max_files=None,
                              overlap_sample_mod="auto")
            # the run above folds in-pipeline (its cadence), so dirty the
            # state deterministically: five cadence-FREE mini-batches land
            # five per-batch dirs on every state surface — genuinely over
            # a max_files=4 budget regardless of amplification
            for i in range(5):
                subset.limit(20).select(
                    (F.col("doc_id") + 4_000_000_000 + i * 100_000)
                    .alias("doc_id"),
                    F.concat(F.col("text"),
                             F.lit(f" maintenance drop {i} "),
                             F.col("doc_id").cast("string")).alias("text"),
                ).write.mode("append").option(
                    "maxRecordsPerFile", 100_000
                ).json(landing)
                run_incremental_curation(
                    spark, landing, f"{work}/state", mcfg
                )
            probe = envprobe.op_probe()
            t0 = time.perf_counter()
            plan1 = suggest_maintenance(
                spark, f"{work}/state", mcfg, max_files=4
            ).collect()
            plan1_sec = round(time.perf_counter() - t0, 2)
            verbs = sorted({
                r.verb for r in plan1
                if r.urgency in ("recommend", "urgent")
            })
            t0 = time.perf_counter()
            executed = []
            for verb in verbs:
                # run exactly the verbs the plan named (the planner only
                # recommends state-dir verbs on this state shape)
                if verb == "compact_ingest_state":
                    compact_ingest_state(
                        spark, f"{work}/state", max_files=4
                    )
                    executed.append(verb)
            verbs_sec = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            plan2 = suggest_maintenance(
                spark, f"{work}/state", mcfg, max_files=4
            ).collect()
            plan2_sec = round(time.perf_counter() - t0, 2)
            left = [
                f"{r.surface}.{r.verb}" for r in plan2
                if r.urgency in ("recommend", "urgent")
                and r.verb in executed
            ]
            out["ops"]["suggest_maintenance"] = {
                "plan_rows_before": len(plan1),
                "recommended_verbs": verbs,
                "executed": executed,
                "plan_rows_after": len(plan2),
                "executed_verbs_still_due": left,
                "plan_sec": plan1_sec,
                "replan_sec": plan2_sec,
                "verbs_sec": verbs_sec,
                "env": probe,
            }
            print(
                f"# suggest_maintenance: {len(plan1)} rows "
                f"({plan1_sec}s) -> ran {executed} ({verbs_sec}s) -> "
                f"{len(plan2)} rows ({plan2_sec}s), still due: {left}",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001
            out["ops"]["suggest_maintenance"] = {
                "error": f"{type(exc).__name__}: {exc}"[:300]
            }
            print(f"# suggest_maintenance FAILED — {exc}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — record, keep the evidence
        out["ops"]["overlap_ingest"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"# overlap_ingest FAILED — {exc}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    # run-header environment context (round-14 VERDICT item 1) — the same
    # block bench.py carries, closing over the whole run
    out["env"] = envprobe.env_context(env0)
    out["calib_ref_ms"] = envprobe.CALIB_REF_MS
    print(json.dumps(out))


def _drop_page_cache() -> bool:
    """Best-effort page-cache drop (sync + ``drop_caches=3``) — the
    round-14 storage-latency seam for :func:`bloom_trend`'s cold mode.
    Returns False when the container denies the knob (cold mode then
    refuses loudly instead of silently measuring warm reads)."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3")
        return True
    except OSError:
        return False


def bloom_trend(spark, sizes, batch_rows: int = 50_000,
                cold_reads: bool = False) -> dict:
    """Round 13 (VERDICT r12 item 2): measure the ledger-Bloom
    break-even TREND, not just the arithmetic — grow the digest ledger
    across decades and record the plain-scan vs bloom-steady per-batch
    ingest cost at each point. What the first (pre-delta) run actually
    showed: the gap WIDENED with ledger size (plain 9.7 s → 5.8 s,
    bloom-steady 10.2 s → 14.7 s across 1.2M → 12M), because every
    m-proportional per-batch cost — bitmap read, probe broadcast, and
    above all the full m/8-byte epoch REWRITE per merge — scales with
    the corpus while the scan-state plain path's ledger read is cheap
    on page-cached local parquet. Round 13's fix: above
    ledger_bloom._DELTA_ABOVE_BYTES, merges land ~k×n-position DELTA
    files with periodic epoch folds (each row's ``delta_mode`` records
    which regime it measured). The read+broadcast terms remain per
    state-handle LOAD — amortized across a run's batches in production,
    paid per batch by this harness's fresh-handle-per-ingest shape, so
    these figures are the trickle-ingest worst case.

    The ledger is SYNTHESIZED at the real schema (digest +
    src_batch_id data column, hive ``batch_id=0`` dir — what
    ``_write_admitted`` lands): building 10^8 rows through a real
    ingest is hours of gate/JSON work that adds nothing to the compared
    quantity, the per-batch exact-dedup decision against N admitted
    digests. Batches are fresh (all-new digests) — the 100 TB common
    case the sidecar exists for. Two timed reps per mode (min + spread
    recorded); the one-time catch-up merge of the whole ledger is
    reported separately (it amortizes over every later batch).

    ``cold_reads=True`` (round-14 VERDICT item 2 — the storage-latency
    seam, CLEARLY A SIMULATION): drop the OS page cache before every
    timed ingest, so each batch's state reads hit storage instead of
    RAM — the claimed payoff regime (object stores / billed IO) minus
    its per-request latency, i.e. a LOWER BOUND on the remote-storage
    benefit. On page-cached local parquet (the default mode) the plain
    ledger scan is nearly free and r13's trend showed bloom losing
    everywhere; cold mode measures whether removing that page-cache
    subsidy flips the sign: the plain path must re-read the full
    ledger (~33 B/row parquet) per batch, while the bloom-steady path
    reads the m/8-byte bitmap + deltas and — at maybe=0 — never
    touches the ledger at all."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        CurationConfig,
        _ingest_batch,
    )

    sch = T.StructType.fromDDL("doc_id long, text string")
    plain_cfg = CurationConfig(min_quality=0.0, neardup_method="none")

    def fresh_lines(bid):
        # unique texts per batch id — a repeat batch must stay ALL-NEW
        # (dup batches change the cost shape: fewer writes, confirm-join)
        return spark.range(batch_rows).select(
            F.to_json(F.struct(
                (F.col("id") + bid * 10_000_000).alias("doc_id"),
                F.concat(
                    F.lit(f"fresh b{bid} district survey record "),
                    F.col("id").cast("string"),
                    F.lit(" with bridge load tables and river depth "),
                    F.col("id").cast("string"),
                ).alias("text"),
            )).alias("value")
        )

    from pulfa_sausage_factory_spark.functions.bloom import bloom_params
    from pulfa_sausage_factory_spark.pipelines import ledger_bloom as _lbm

    if cold_reads and not _drop_page_cache():
        raise RuntimeError(
            "cold_reads requested but /proc/sys/vm/drop_caches is not "
            "writable in this container — refusing to mislabel warm "
            "measurements as cold"
        )

    def _pre_timed():
        # the seam: every timed ingest starts with NOTHING page-cached
        if cold_reads:
            _drop_page_cache()

    table = []
    for n_ledger in sizes:
        bloom_cfg = CurationConfig(
            min_quality=0.0, neardup_method="none", ledger_bloom=True,
            ledger_bloom_expected_items=max(2 * int(n_ledger), 1_000_000),
        )
        m, _k = bloom_params(
            bloom_cfg.ledger_bloom_expected_items, bloom_cfg.ledger_bloom_fpp
        )
        # whether per-batch merges land position deltas (round 13)
        # instead of full m/8 epoch rewrites — the before/after lever
        # this harness measures
        delta_mode = m // 8 > _lbm._DELTA_ABOVE_BYTES
        work = tempfile.mkdtemp(prefix=f"bloom_trend_{n_ledger}_")
        try:
            state = f"{work}/state"
            t0 = time.perf_counter()
            spark.range(int(n_ledger)).select(
                F.md5(F.concat(F.lit("led-"), F.col("id").cast("string")))
                .alias("digest"),
                F.lit(0).cast("long").alias("src_batch_id"),
            ).write.mode("overwrite").parquet(f"{state}/ledger/batch_id=0")
            t_synth = round(time.perf_counter() - t0, 2)

            bid = 1
            _ingest_batch(spark, fresh_lines(bid), bid, plain_cfg,
                          state, sch)  # untimed warmup (JIT + footers)
            bid += 1
            probe = envprobe.op_probe()
            plain_secs = []
            for _ in range(2):
                _pre_timed()
                t0 = time.perf_counter()
                _ingest_batch(spark, fresh_lines(bid), bid, plain_cfg,
                              state, sch)
                plain_secs.append(round(time.perf_counter() - t0, 2))
                bid += 1
            _pre_timed()
            t0 = time.perf_counter()
            _ingest_batch(spark, fresh_lines(bid), bid, bloom_cfg,
                          state, sch)  # one-time whole-ledger catch-up
            catchup_sec = round(time.perf_counter() - t0, 2)
            bid += 1
            steady_secs, maybe = [], 0
            for _ in range(2):
                _pre_timed()
                t0 = time.perf_counter()
                rep = _ingest_batch(spark, fresh_lines(bid), bid,
                                    bloom_cfg, state, sch)
                steady_secs.append(round(time.perf_counter() - t0, 2))
                maybe += rep.get("ledger_bloom", {}).get("maybe", 0)
                bid += 1
            row = {
                "n_ledger": int(n_ledger),
                "delta_mode": bool(delta_mode),
                "cold_reads": bool(cold_reads),
                "env": probe,
                "synth_sec": t_synth,
                "plain_sec": min(plain_secs),
                "plain_reps": plain_secs,
                "bloom_catchup_sec": catchup_sec,
                "bloom_steady_sec": min(steady_secs),
                "steady_reps": steady_secs,
                "steady_maybe_total": int(maybe),
                "bloom_minus_plain_sec": round(
                    min(steady_secs) - min(plain_secs), 2
                ),
            }
            table.append(row)
            print(
                f"# bloom_trend n={n_ledger}: plain {row['plain_sec']}s "
                f"{plain_secs} | catchup {catchup_sec}s | steady "
                f"{row['bloom_steady_sec']}s {steady_secs} "
                f"(maybe={maybe}) | gap {row['bloom_minus_plain_sec']}s",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            table.append({"n_ledger": int(n_ledger),
                          "error": f"{type(exc).__name__}: {exc}"[:300]})
            print(f"# bloom_trend n={n_ledger} FAILED — {exc}",
                  file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return {"metric": "bloom_break_even_trend",
            "batch_rows": batch_rows, "cold_reads": bool(cold_reads),
            "table": table}


def bloom_main() -> None:
    """`python stress.py bloom [cold] [N ...]` — the break-even trend
    across ledger decades (default 1.2M / 12M / 120M rows; 120M ×
    ~32 B of digest is ~4 GB of parquet, sandbox-feasible). ``cold``
    drops the page cache before every timed ingest — the round-14
    storage-latency seam (a labeled simulation of non-page-cached
    storage; see bloom_trend's docstring)."""
    args = sys.argv[2:]
    cold = bool(args) and args[0] == "cold"
    if cold:
        args = args[1:]
    sizes = [int(a) for a in args] or [
        1_200_000, 12_000_000, 120_000_000
    ]
    env0 = envprobe.env_start()
    spark = get_spark("stress-bloom-trend")
    spark.sparkContext.setLogLevel("ERROR")
    out = bloom_trend(spark, sizes, cold_reads=cold)
    out["env"] = envprobe.env_context(env0)
    out["calib_ref_ms"] = envprobe.CALIB_REF_MS
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bloom":
        bloom_main()
    else:
        main()
