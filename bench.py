#!/usr/bin/env python
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline query set (each query
executed to completion via a count/collect action, result sizes sanity-
checked). Per-query seconds are in ``queries``.

The stdout line must FIT the round driver's 2,000-char stdout tail
capture (round-8 post-mortem: the ``query_stats`` block grew the line to
3,440 chars and BENCH_r08.json recorded ``parsed: null`` — the round's
canonical headline evidence was lost even though bench ran rc=0). The
line therefore carries ONLY the bounded headline fields
(:data:`STDOUT_FIELDS`); all diagnostics (per-rep spreads, cold runs,
cache-build splits, notes, error detail) go to ``BENCH_STATS.json``
beside this script plus stderr. ``tests/test_bench_contract.py`` pins
the serialized length under :data:`STDOUT_LINE_BUDGET` with worst-case
field widths so future fields can't regress the capture contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulfa_sausage_factory_spark.io import load_table  # noqa: E402
from pulfa_sausage_factory_spark.operators import dedup, events  # noqa: E402
from pulfa_sausage_factory_spark.queries import QUERIES  # noqa: E402
from pulfa_sausage_factory_spark.session import get_spark  # noqa: E402


# The round-3 registry consolidation merged three benched registrations into
# tagged unions (x2b_minhash_lsh → x2b_hash_neardup, t_tumbling_window /
# t_sliding_window → t_windows). The bench keeps measuring the ORIGINAL
# stand-alone workloads under their original keys so BENCH_r{N}.json stays
# comparable across rounds — these call the same library operators the
# merged registrations use.
def _x2b_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.2)


def _t_tumbling_window(spark, sf_dir):
    return events.tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


def _t_sliding_window(spark, sf_dir):
    return events.sliding_counts(
        load_table(spark, sf_dir, "events"), size="1 hour", slide="30 minutes"
    )


_EXTRA = {
    "x2b_minhash_lsh": _x2b_minhash_lsh,
    "t_tumbling_window": _t_tumbling_window,
    "t_sliding_window": _t_sliding_window,
}

#: The only fields allowed on the stdout JSON line, in print order. Every
#: one is bounded: fixed-vocabulary keys (BENCH_QUERIES + stable extras)
#: with scalar values. Unbounded diagnostics (query_stats, cold_queries,
#: error strings, prose notes) are CONTRACTUALLY stats-file-only — adding
#: a field here requires re-checking tests/test_bench_contract.py's
#: worst-case budget.
STDOUT_FIELDS = (
    "metric",
    "value",
    "value_calib_adj",
    "unit",
    "estimator",
    "queries",
    "extra_queries",
    "failed",
    "env",
    "stats_file",
    "sf",
)


# environment probes — ONE implementation shared with stress.py (round-14
# VERDICT item 1: stress figures must self-adjudicate like bench figures);
# the aliases keep bench.py's established names and stdout contract
from pulfa_sausage_factory_spark import envprobe

_load1 = envprobe.load1
_proc_stat_cpu = envprobe.proc_stat_cpu
_calibrate_ms = envprobe.calibrate_ms
_env_context = envprobe.env_context

#: Hard budget for the serialized stdout line — the driver keeps the last
#: 2,000 chars of stdout; 1,900 leaves margin for a trailing newline and
#: any incidental stdout Spark emits after the line.
STDOUT_LINE_BUDGET = 1900


def build_stdout_payload(full: dict) -> dict:
    """Project the full result dict onto the driver-facing stdout line.

    ``failed`` compresses the error map to query names only (bounded by
    the fixed query vocabulary); everything else passes through iff it is
    in :data:`STDOUT_FIELDS`. The full dict — spreads, cold runs, error
    strings — belongs in the stats side file, not on this line.
    """
    out = {k: full[k] for k in STDOUT_FIELDS if k in full}
    if full.get("errors"):
        out["failed"] = sorted(full["errors"])
    return {k: out[k] for k in STDOUT_FIELDS if k in out}


# One-time cache builds that a query's FIRST run otherwise pays inline
# (round-7, VERDICT item 2). Round 15: minhash_lsh_pairs no longer
# persists internally (it picks its join strategy from a count-gate
# instead of cache stats), but the build stays: the persisted signature
# subtree is PLAN-IDENTICAL to the one inside the query, so the
# CacheManager still substitutes it into both sides of the banded
# self-join — keeping x2b's cold/warm measurement semantics exactly what
# every prior round measured (extras-key stability rule).
def _x2b_build(spark, sf_dir):
    dedup.minhash_signatures(load_table(spark, sf_dir, "documents"))


_CACHE_BUILD = {
    "x2b_minhash_lsh": _x2b_build,
}

#: Headline set: the shapes that dominate at scale — wide agg (q1), join+agg
#: +topk (q3), star multi-join (q5), window ordinal (w1), group-collect (a1),
#: shingle-join near-dup (x2), minhash LSH (x2b), brute-force knn (x3),
#: sessionization (t), tumbling windows (t2).
#: Stable extras vocabulary (round-5 contract: keys stay comparable
#: round-over-round). test_bench_contract sizes the worst-case stdout
#: line off this list — extend it here, not just inline in main().
EXTRA_KEYS = [
    "bucketize_facts_ingest",
    "x2g_semdedup",
    "x8d_dsir_select",
    "x3p_pq_adc",
    "x3r_pq_rerank",
    "x3s_pq_serve_from_disk",
    "dedup_substrings",
    "dedup_clusters",
    "image_neardup_pairs",
    "run_curation",
    "q3_bucketed",
    "q5_bucketed",
    "q10_bucketed",
    "overlap_fps_ingest",
]

#: Per-query rep-count floors (round-10 watch-list adjudication): the
#: r8→r9 dedup_clusters "drift" (+20% on byte-identical plans — dedup.py
#: untouched since round 7) reproduced under min-of-3 but vanished at
#: min-of-10 (1.341 s, BELOW the r8 figure): the iterative
#: label-propagation query runs ~10 small jobs per rep and keeps cooling
#: for ~5 reps (measured trace 2.19, 1.95, 1.75, 1.66, 1.44, 1.43, 1.60,
#: 1.40, 1.34, 1.41), so three reps sample only the still-warming regime
#: and the min is an overestimate with rounds-scale variance. Floors
#: apply to extras only — the headline estimator stays min-of-REPS for
#: cross-round comparability.
#: x3r/x3s joined round 13 (VERDICT r12 item 4): both are iterative
#: multi-job PQ serving queries that swung 3–4× under post-suite session
#: load in the judge's r12 rerun (x3r 8.16 s vs committed 2.32) — the
#: same still-warming regime, so min-of-3 samples too few draws.
EXTRA_REPS = {
    "dedup_clusters": 8,
    "x3r_pq_rerank": 8,
    "x3s_pq_serve_from_disk": 8,
}

#: Fixed calibration reference for ``value_calib_adj`` (VERDICT r12 item
#: 5): the committed healthy-session figure for this host class —
#: r12's builder runs measured calib_ms 33.4 at load1≈1-3 and the
#: judge's healthy rerun 33.7/31.3; 33.0 is the round-13 committed
#: anchor. The adjusted headline divides out session contention
#: mechanically: value × (CALIB_REF_MS / mean(calib start, end)). A
#: future host change re-anchors this constant IN THE SAME COMMIT that
#: documents it — never silently. Canonical value lives in envprobe so
#: stress.py adjusts against the same anchor.
CALIB_REF_MS = envprobe.CALIB_REF_MS

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "j7_asof_enrich",
    "w1_page_numbering",
    "a1_group_collect",
    "x1_exact_dedup",
    "x2b_minhash_lsh",
    "x3_knn_bruteforce",
    "t_sessionize",
    "t_tumbling_window",
    "t_sliding_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    # environment context start sample (round-11 VERDICT item 4): taken
    # before the JVM spins up so the calibration baseline is clean
    env_start = {"t0": time.perf_counter(), "load1": _load1(),
                 "calib_ms": _calibrate_ms(), "cpu": _proc_stat_cpu()}
    spark = get_spark("pulfa-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python UDF worker pool once so
    # per-query numbers measure the query, not session startup (the first
    # Arrow-batched UDF otherwise pays ~5 s spawning the 32-worker pool)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _noop(s):
        return s

    def _noop_arr(s):
        import numpy  # noqa: F401 — preload into the reused worker pool

        return s.map(lambda v: [v])

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _noop_arr.__annotations__ = {"s": pd.Series, "return": pd.Series}
    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    # CONSUME the UDF output (sum/size aggregates), don't .count() the
    # projection: pandas UDFs are deterministic, so Catalyst PRUNES an
    # unreferenced UDF column and count() never executes it — the r1-r4
    # warmups were silently no-ops and every bench's first real UDF query
    # (x2b) paid the full 32-worker spawn + per-worker library imports
    # (~2-3 s, visible as ArrowEvalPython `init` time). Verified round 5
    # via `ps | grep pyspark.daemon`: 0 workers after a pruned warmup,
    # 33 after a consumed one.
    warm.select(F.pandas_udf(_noop, "long")("id").alias("x")).agg(
        F.sum("x")
    ).collect()
    # second pass with an array<long> output: Arrow serializer setup is
    # per-output-shape, and the minhash signature UDF emits arrays
    warm.select(F.pandas_udf(_noop_arr, "array<long>")("id").alias("x")).agg(
        F.sum(F.size("x"))
    ).collect()
    # the session's FIRST .persist() pays ~1.3 s of one-time cache
    # infrastructure (measured round 5: an 8-row persist costs 1.3 s cold,
    # 0.5 s after) — absorb it here so cold_queries measures the QUERY's
    # first run, not the session's first cache materialization
    _pwarm = warm.persist()
    _pwarm.count()
    _pwarm.unpersist()

    # JMH-style: one untimed warmup execution per query (JVM codegen JIT +
    # Arrow serializer setup — one-time costs that amortize to zero at real
    # scale), then REPS timed steady-state runs reported as the MIN —
    # this host has heavy CPU-steal variance (quantified round 7: ~12%
    # spread across identical-code same-session invocations, every query
    # moving together), and steal only ever ADDS time, so min-of-reps is
    # the steal-robust location estimator for wall-clock (the round-8
    # estimator fix: r6→r7 the headline drifted upward two rounds running
    # on byte-identical plans under median-of-reps). The full per-rep
    # spread stays visible in query_stats.
    # Fault isolation (round-3 lesson): one broken query must not zero out
    # the evidence for the other 13 — each query runs under try/except,
    # failures record null, and the JSON line ALWAYS prints.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    per_query: dict[str, float | None] = {}
    stats: dict[str, dict] = {}
    cold: dict[str, float | None] = {}
    cache_build: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0

    def _stats(times: list[float]) -> dict:
        return {
            "min": round(min(times), 3),
            "median": round(sorted(times)[len(times) // 2], 3),
            "max": round(max(times), 3),
        }

    for name in BENCH_QUERIES:
        fn = _EXTRA.get(name) or QUERIES[name][0]
        try:
            build = _CACHE_BUILD.get(name)
            if build is not None:
                t0 = time.perf_counter()
                build(spark, sf_dir)
                cache_build[name] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - t0, 3)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                times.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            per_query[name] = None
            cold.setdefault(name, None)
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: FAILED — {errors[name]}", file=sys.stderr)
            continue
        dt = min(times)
        per_query[name] = round(dt, 3)
        stats[name] = _stats(times)
        total += dt
        print(
            f"# {name}: {dt:.3f}s min-of-{reps} "
            f"(spread {min(times):.3f}-{max(times):.3f}) / "
            f"{cold[name]:.3f}s cold ({n} rows)",
            file=sys.stderr,
        )

    # Extension operators, measured OUTSIDE the headline total so `value`
    # stays comparable across rounds: SemDeDup pruning, DSIR selection,
    # the PQ/ADC serving path (codebooks pre-trained — an offline job in
    # any real deployment; the serving plan is what repeats), and — round
    # 5 — the LLM heavy operators (exact substring dedup, connected-
    # component clustering, image near-dup, the composed curation DAG) so
    # a perf regression in the repo's differentiating surface is visible
    # round-over-round, not only in one-off stress.py figures.
    # the WHOLE extras preamble is fault-isolated too: a missing/corrupt
    # table here must not abort the process before the guaranteed JSON
    # line (the exact round-3 failure mode the per-query isolation above
    # exists to prevent)
    emb = docs = _cb = _idx_dir = None
    try:
        from pulfa_sausage_factory_spark.functions import sampling  # noqa: E402
        from pulfa_sausage_factory_spark.operators import (  # noqa: E402
            ann_index,
            multimodal,
            similarity,
        )
        from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (  # noqa: E402
            CurationConfig,
            run_curation,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        docs = load_table(spark, sf_dir, "documents")
        _cb = similarity.train_pq_codebooks(
            emb, m=8, n_codes=16, iters=1, sample_fraction=1.0
        ).cache()
        _cb.count()
        # build + persist the IVFADC index ONCE (the offline job any real
        # deployment runs out-of-band); x3s then measures the SERVE path:
        # load artifacts from disk → residual-ADC shortlist → exact rerank
        import tempfile

        _idx_dir = tempfile.mkdtemp(prefix="bench_pq_idx_")
        ann_index.save_pq_index(
            ann_index.build_pq_index(
                emb, m=8, n_codes=16, n_cells=16, iters=1, sample_fraction=1.0
            ),
            _idx_dir,
        )
    except Exception as exc:  # noqa: BLE001 — record, don't die silently
        errors["extras_setup"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"# extras setup FAILED — {errors['extras_setup']}", file=sys.stderr)

    # bucketed fact twins of the headline joins: pay the orders/lineitem
    # shuffle ONCE at ingest (recorded separately below), then q3/q5/q10
    # run with the fact-fact join as a zero-Exchange bucket-co-located
    # sort-merge. Separately fault-isolated: a metastore problem here must
    # not void the docs/emb extras above.
    _bq = None
    bucketize_sec = None
    try:
        from pulfa_sausage_factory_spark import bucketed_queries as _bqm  # noqa: E402

        # round-11 (r10 VERDICT item 4): the ingest cost gets the SAME
        # spread evidence as every other extra — one untimed warmup build
        # (JMH shape), then REPS timed force-rebuilds, min + min/median/
        # max in query_stats. Previously this was the only extra timed
        # with a single run, so its +19% r9→r10 drift was unadjudicable.
        _bqm.ensure_bucketed_facts(spark, sf_dir, force=True)  # warmup
        _btimes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _bqm.ensure_bucketed_facts(spark, sf_dir, force=True)
            _btimes.append(time.perf_counter() - t0)
        bucketize_sec = round(min(_btimes), 3)
        stats["bucketize_facts_ingest"] = _stats(_btimes)
        print(
            f"# extra bucketize_facts_ingest: {bucketize_sec:.3f}s "
            f"min-of-{reps} (spread {min(_btimes):.3f}-{max(_btimes):.3f})",
            file=sys.stderr,
        )
        _bq = _bqm
    except Exception as exc:  # noqa: BLE001
        errors["bucketize_facts"] = f"{type(exc).__name__}: {exc}"[:500]
        print(f"# bucketize setup FAILED — {errors['bucketize_facts']}", file=sys.stderr)

    def _x2g_semdedup(spark, sf_dir):
        return similarity.semdedup(emb, n_cells=16, threshold=0.9, impl="arrow")

    def _x8d_dsir(spark, sf_dir):
        return sampling.dsir_resample(
            docs, docs.limit(200), k=500, dim=8192
        )

    def _x3p_pq_adc(spark, sf_dir):
        return similarity.knn_pq_adc(
            similarity.pq_encode(emb, _cb), emb.limit(20), _cb, k=10
        )

    def _x3r_pq_rerank(spark, sf_dir):
        # the recommended PQ serving path (ADC shortlist → exact rerank,
        # RECALL.md) — tracked so its latency premium over bare ADC stays
        # visible round-over-round
        return similarity.knn_pq_rerank(
            emb, emb.limit(20), _cb, k=10, shortlist=100
        )

    def _x3s_pq_serve_from_disk(spark, sf_dir):
        # serve-only cost of the persisted IVFADC index (round 6): load
        # the saved centroids/codebooks/codes and run the two-stage query
        # — no training, no encoding; what a 100 TB query session pays
        loaded = ann_index.load_pq_index(spark, _idx_dir)
        return ann_index.knn_from_index(
            loaded, emb, emb.limit(20), k=10, shortlist=100, n_probe=4
        )

    def _dedup_substrings(spark, sf_dir):
        # k=20 matches stress.py so the sf0.1 and 100x figures bracket the
        # same workload
        return dedup.dedup_substrings(docs, k=20)

    def _dedup_clusters(spark, sf_dir):
        # the full near-dup chain: MinHash LSH candidate pairs → connected
        # components (iterative min-label propagation w/ localCheckpoint)
        return dedup.dedup_clusters(
            dedup.minhash_lsh_pairs(docs, threshold=0.2).select("id_a", "id_b")
        )

    def _image_neardup_pairs(spark, sf_dir):
        from pyspark.sql import functions as F

        return multimodal.image_neardup_pairs(
            docs.select(
                F.col("doc_id").alias("id"),
                F.encode("text", "utf-8").alias("content"),
            ),
            max_hamming=3,
        )

    def _run_curation(spark, sf_dir):
        # the composed DAG executes eagerly (per-stage localCheckpoint +
        # count), so the wrapper returns the already-materialized row
        # count instead of a DataFrame
        rep = run_curation(
            spark,
            docs,
            CurationConfig(min_quality=0.0),
            bench=docs.limit(200),
        )
        return rep["output_rows"]

    def _q3_bucketed(spark, sf_dir):
        return _bq.q3_bucketed(spark, sf_dir)

    def _q5_bucketed(spark, sf_dir):
        return _bq.q5_bucketed(spark, sf_dir)

    def _q10_bucketed(spark, sf_dir):
        return _bq.q10_bucketed(spark, sf_dir)

    def _overlap_fps_ingest(spark, sf_dir):
        # the overlap ledger's per-batch state derivation at the default
        # operating point (k=16/w=8/mod-16, OVERLAP.md): winnow sf0.1
        # documents, mod-sample, land the fps parquet — the cost every
        # ingest batch pays on top of its other ledgers (round-9 VERDICT
        # item 2: the winnowing cost had no stable bench key)
        import shutil
        import tempfile

        from pulfa_sausage_factory_spark.functions import text as _text

        work = tempfile.mkdtemp(prefix="bench_overlap_fps_")
        try:
            # impl="arrow" (round 14): the ingest path's default winnowing
            # twin is now the vectorized numpy pass (CurationConfig.
            # overlap_impl="arrow", expr≡arrow pinned by test), so this
            # extra measures what a batch actually pays; the r14 baseline
            # on the expr plan was 2.392 s (recorded in OPTIMIZATION_r14.md)
            _text.winnow_fingerprints_df(
                docs, text_col="text", id_col="doc_id", k=16, w=8,
                impl="arrow",
            ).filter(F.col("fp") % 16 == 0).write.mode("overwrite").parquet(
                f"{work}/fps"
            )
            # footer-only count of what landed (metadata read, ~free)
            return spark.read.parquet(f"{work}/fps").count()
        finally:
            shutil.rmtree(work, ignore_errors=True)

    extras: dict[str, float | None] = {}
    # Extras-key contract (round 15, VERDICT item 8): a key's MEASURED
    # IMPLEMENTATION is part of its meaning. Keys may be added, never
    # removed or renamed in place — and if what a key measures flips
    # (the r14 overlap_fps expr→arrow switch), either RENAME the key or
    # emit both paths for one transition round with the old baseline
    # recorded in OPTIMIZATION_r*.md; never silently change the measured
    # path under a stable key.
    # the one-time ingest cost the bucketed twins amortize — reported so
    # the trade is honest: twin_time × query_count + bucketize ≷ plain
    extras["bucketize_facts_ingest"] = bucketize_sec
    _extra_specs = (
        ("x2g_semdedup", _x2g_semdedup, (emb,)),
        ("x8d_dsir_select", _x8d_dsir, (docs,)),
        ("x3p_pq_adc", _x3p_pq_adc, (emb, _cb)),
        ("x3r_pq_rerank", _x3r_pq_rerank, (emb, _cb)),
        ("x3s_pq_serve_from_disk", _x3s_pq_serve_from_disk, (emb, _idx_dir)),
        ("dedup_substrings", _dedup_substrings, (docs,)),
        ("dedup_clusters", _dedup_clusters, (docs,)),
        ("image_neardup_pairs", _image_neardup_pairs, (docs,)),
        ("run_curation", _run_curation, (docs,)),
        ("q3_bucketed", _q3_bucketed, (_bq,)),
        ("q5_bucketed", _q5_bucketed, (_bq,)),
        ("q10_bucketed", _q10_bucketed, (_bq,)),
        ("overlap_fps_ingest", _overlap_fps_ingest, (docs,)),
    )
    # keep the worst-case budget test honest: the measured extras must be
    # exactly the published vocabulary
    assert ["bucketize_facts_ingest"] + [n for n, _, _ in _extra_specs] == EXTRA_KEYS
    for name, fn, needs in _extra_specs:
        if any(dep is None for dep in needs):
            # root cause already recorded: errors["extras_setup"] for the
            # emb/docs/codebook extras, errors["bucketize_facts"] for the
            # q*_bucketed twins
            extras[name] = None
            continue

        def _rows(res):
            return res if isinstance(res, int) else res.count()

        try:
            _rows(fn(spark, sf_dir))  # untimed warmup, same JMH shape
            times = []
            for _ in range(max(reps, EXTRA_REPS.get(name, 0))):
                t0 = time.perf_counter()
                n = _rows(fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            extras[name] = round(min(times), 3)
            stats[name] = _stats(times)
            print(f"# extra {name}: {extras[name]:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            extras[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# extra {name}: FAILED — {errors[name]}", file=sys.stderr)

    if _bq is not None:
        try:
            _bq.drop_bucketed_facts(spark)
        except Exception:  # noqa: BLE001 — cleanup must not kill the JSON line
            pass
    if _idx_dir is not None:
        import shutil

        shutil.rmtree(_idx_dir, ignore_errors=True)

    out = {
        "metric": "headline_query_set_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        # round-8 estimator change (VERDICT r7 item 1): per-query values
        # and the headline total are MIN-of-reps — CPU-steal is strictly
        # additive noise, so the min is the steal-robust wall-clock
        # estimator; medians drifted +9% r6→r7 on byte-identical plans.
        # query_stats carries each query's full min/median/max so the
        # discarded spread stays auditable (extras included).
        "estimator": f"min_of_{reps}_reps",
        "queries": per_query,
        "query_stats": stats,
        "cold_queries": cold,
        # deliberate one-time cache builds, split OUT of cold_queries
        # (round-7): the minhash signature materialization is scale-load-
        # bearing (unfilled cache stats baited a corpus-sized broadcast at
        # 100× — see minhash_signatures), so its cost is tracked here
        # explicitly and cold_queries holds the query's true first run
        # against a filled cache — measurable against the ≤2×-warm target.
        "cache_build_queries": cache_build,
        "extra_queries": extras,
        # per-run environment context (round-11 VERDICT item 4): loadavg
        # at start/end, host busy/steal fractions over the run from
        # /proc/stat deltas, and a fixed CPU-bound calibration loop timed
        # at both ends — a future cross-round headline delta divides out
        # the session instead of costing a manual judge rerun. Bounded
        # scalar keys; stable vocabulary.
        "env": dict(
            _env_context(env_start),
            # self-describing scaling caveat (round 15, VERDICT item 7):
            # every sf0.1 headline query is sub-second over single-row-
            # group (unsplittable) parquet, so the headline measures a
            # task-scheduling floor — core-count ratios ≈1 here are
            # expected, not a parallelism bug; scaling evidence lives in
            # the 100× stress figures (stress_r*.json)
            sched_floor_note=(
                "sf0.1 is scheduler-bound; "
                "core scaling in stress 100x"
            ),
        ),
        "sf": sf,
        "calib_ref_ms": CALIB_REF_MS,
        "stats_file": "BENCH_STATS.json",
        "cold_note": (
            "cold measures each query's first run with deliberate cache "
            "builds (cache_build_queries) already paid; remaining "
            "cold-warm gap is the unsplittable-source scan + cache-hit "
            "asymmetry (see bench.py comment)"
        ),
        "variance_note": (
            "queries/value are min-of-reps (steal-robust: host CPU-steal "
            "is additive, measured ~12% same-session spread in r7); "
            "per-query min/median/max is in query_stats"
        ),
    }
    if errors:
        out["errors"] = errors
    # calibration-normalized headline (VERDICT r12 item 5): `value`
    # stays the committed estimator; `value_calib_adj` divides out the
    # session mechanically so round-over-round tables compare like for
    # like without judge prose. Guarded: calib can be None off-Linux.
    calibs = [
        c for c in (out["env"].get("calib_ms_start"),
                    out["env"].get("calib_ms_end"))
        if isinstance(c, (int, float)) and c > 0
    ]
    if calibs:
        out["value_calib_adj"] = round(
            out["value"] * CALIB_REF_MS / (sum(calibs) / len(calibs)), 3
        )
    # Full diagnostics → side file (best-effort: a read-only cwd must not
    # kill the stdout line) + stderr, so the spread/cold evidence survives
    # even though it no longer rides the captured line.
    stats_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_STATS.json")
    try:
        with open(stats_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"# stats file unwritable — {exc}", file=sys.stderr)
    print("# full diagnostics: " + json.dumps(out), file=sys.stderr)
    line = json.dumps(build_stdout_payload(out))
    if len(line) > STDOUT_LINE_BUDGET:
        # last-resort degradation so the HEADLINE always parses: extras
        # are the only field that can realistically grow (new operators) —
        # shed them before the core metric (never reachable while
        # test_bench_contract's worst-case budget holds).
        print(f"# stdout line {len(line)} > {STDOUT_LINE_BUDGET}; shedding extras", file=sys.stderr)
        slim = build_stdout_payload(out)
        slim.pop("extra_queries", None)
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()
