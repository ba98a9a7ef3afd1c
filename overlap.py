#!/usr/bin/env python
"""Overlap-ledger quality harness — catch rate of the winnowed-fingerprint
substring-overlap rule vs lift length × sample_mod × min_shared, on
planted partial copies built from driver data (RECALL.md's regenerable-
table pattern applied to the round-9 dedup family; regenerates
OVERLAP.md's tables).

    python overlap.py                       # full sweep (prints markdown
                                            # rows + one final JSON line)
    python overlap.py short                 # §short-docs table: adaptive
                                            # per-doc floor (catch + FP
                                            # rates on mostly-copied vs
                                            # held-out fresh short docs)
    SPARK_GRAFT_SF_DIR=... python overlap.py

Method:
- sf0.1 ``documents`` are short (<= 577 chars, median 295) — the round-9
  stress figure ("63% of 600-char lifts caught") was dominated by lifts
  TRUNCATED to the source doc's length, i.e. it measured the corpus's
  length distribution, not the rule. Sources here are built by
  concatenating ``GROUP`` consecutive driver docs (deterministic), long
  enough to cut exact-length lifts up to ~2.4k chars.
- a probe lifts exactly L chars from one source (start offset varied
  deterministically per probe) into fresh framing (per-probe sha2 hex
  gibberish — shares no k-gram with the corpus or other probes), so the
  lift is the probe's ONLY overlap with admitted state.
- catch = the probe shares >= min_shared mod-sampled fingerprints with
  ANY SINGLE admitted doc after the boilerplate df-cap — exactly the
  ledger's cross-run rule (curation_pipeline, overlap_ledger), evaluated
  directly on the fps relation so one corpus winnowing serves the whole
  (mod × min_shared) sweep.
- everything is hash-deterministic: the catch rates reproduce exactly,
  which is what lets tests pin the documented floors
  (tests/test_curation_pipeline.py::
  test_documented_overlap_configs_reach_catch_floor).

Expected shared-fp count over an L-char lift is ~2L/((w+1)·mod)
(winnowing density — Schleimer et al. SIGMOD'03; the arithmetic
``text.suggest_overlap_config`` encodes). Each table row prints that
prediction next to the measurement: at expectation ≈ min_shared the
catch is a coin flip; the documented operating points sit at >= 2×
margin.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark import io
from pulfa_sausage_factory_spark.functions.text import winnow_fingerprints_df
from pulfa_sausage_factory_spark.session import get_spark

K, W = 16, 8  # the ledger's fingerprint shape (CurationConfig defaults)
GROUP = 8  # consecutive driver docs concatenated per long source
LIFTS = (150, 300, 600, 1200, 2400)
MODS = (4, 16, 64)
MIN_SHAREDS = (2, 4, 8)
N_PROBES = 200
DF_CAP = 64


def build_long_docs(docs, group: int = GROUP):
    """Deterministic long sources from driver data: concatenate ``group``
    consecutive docs (by ``doc_id``) into one ``(src_id, text)`` row —
    sf0.1 docs cap at 577 chars, far below the lift lengths the sweep
    needs. Order inside a group is pinned by array_sort on (doc_id, text)
    structs so the text is bit-stable across partitionings."""
    return (
        docs.select((F.col("doc_id") / group).cast("long").alias("src_id"),
                    F.struct("doc_id", "text").alias("s"))
        .groupBy("src_id")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s.text),
            " ",
        ).alias("text"))
    )


def plant_probes(long_docs, lift_len: int, n_probes: int = N_PROBES):
    """One probe per eligible source: exactly ``lift_len`` chars cut at a
    per-source deterministic offset, framed by per-source sha2 hex
    gibberish (128 chars each side — no k-gram shared with English text,
    the corpus, or any other probe)."""
    eligible = (
        long_docs.filter(F.length("text") >= lift_len)
        .orderBy("src_id").limit(n_probes)
    )
    start = F.lit(1) + (F.col("src_id") * 37) % (
        F.length("text") - F.lit(lift_len) + 1
    )
    sid = F.col("src_id").cast("string")
    frame = lambda tag: F.repeat(  # noqa: E731
        F.sha2(F.concat(F.lit(tag), sid), 256), 2
    )
    return eligible.select(
        F.col("src_id").alias("probe_id"),
        F.concat(
            frame("fa"), F.lit(" "),
            F.col("text").substr(start, F.lit(lift_len)),
            F.lit(" "), frame("fb"),
        ).alias("text"),
    )


def measure_catch_rates(
    spark,
    long_docs,
    lifts=LIFTS,
    mods=MODS,
    min_shareds=MIN_SHAREDS,
    n_probes: int = N_PROBES,
    df_cap: int = DF_CAP,
) -> list[dict]:
    """The sweep: one unsampled corpus winnowing + one per lift length
    for the probes; each (mod) is a filter + equi-join over those, each
    (min_shared) a driver-side threshold on the per-probe max shared
    count. Returns one dict per (lift, mod) with ``catch[min_shared]``."""
    state_fps = winnow_fingerprints_df(
        long_docs.select(F.col("src_id").alias("old_id"), "text"),
        text_col="text", id_col="old_id", k=K, w=W,
    ).localCheckpoint()
    out = []
    for lift in lifts:
        probes = plant_probes(long_docs, lift, n_probes).localCheckpoint()
        n = probes.count()
        if n == 0:
            continue
        pfps = winnow_fingerprints_df(
            probes, text_col="text", id_col="probe_id", k=K, w=W
        ).localCheckpoint()
        for mod in mods:
            s = state_fps.filter(F.col("fp") % mod == 0)
            ok = s.join(
                s.groupBy("fp").agg(F.countDistinct("old_id").alias("_df"))
                .filter(F.col("_df") <= df_cap).select("fp"),
                "fp", "left_semi",
            )
            mx = {
                r.probe_id: r.max_sh
                for r in (
                    pfps.filter(F.col("fp") % mod == 0)
                    .join(ok, "fp")
                    .groupBy("probe_id", "old_id")
                    .agg(F.countDistinct("fp").alias("sh"))
                    .groupBy("probe_id")
                    .agg(F.max("sh").alias("max_sh"))
                ).collect()
            }
            expected = 2.0 * lift / ((W + 1) * mod)
            row = {
                "lift_chars": lift,
                "sample_mod": mod,
                "n_probes": n,
                "expected_shared": round(expected, 2),
                "mean_shared": round(sum(mx.values()) / n, 2) if mx else 0.0,
                "catch": {
                    ms: round(
                        sum(1 for v in mx.values() if v >= ms) / n, 3
                    )
                    for ms in min_shareds
                },
            }
            out.append(row)
    return out


SHORT_DOC_LENS = (100, 150, 300, 600)
SHORT_FRAC = 0.5
SHORT_FRAME = 8  # chars of framing per side — the doc IS mostly the copy


def measure_short_doc_rates(
    spark,
    long_docs,
    doc_lens=SHORT_DOC_LENS,
    mod: int = 16,
    frac: float = SHORT_FRAC,
    abs_ms: int = 4,
    n_probes: int = N_PROBES,
    df_cap: int = DF_CAP,
) -> list[dict]:
    """OVERLAP.md §short-docs: catch AND false-positive rates of the
    adaptive per-doc floor (``CurationConfig.overlap_short_doc_frac``) on
    MOSTLY-copied short docs vs genuinely fresh short docs. State = the
    even-``src_id`` half of the long sources; "copied" probes are exact
    L-char cuts of STATE docs in 8-char framing (the doc is the copy),
    "fresh" probes the same construction over the HELD-OUT half — real
    driver text the state has never admitted, so the fresh side measures
    the true coincidental-match rate (shared common phrases), not a
    gibberish strawman. Decision replayed driver-side per probe:
    absolute = ``max_sh >= abs_ms``; adaptive =
    ``max_sh >= min(abs_ms, max(2, ceil(frac·own)))``."""
    state = long_docs.filter(F.col("src_id") % 2 == 0)
    heldout = long_docs.filter(F.col("src_id") % 2 == 1)
    s = winnow_fingerprints_df(
        state.select(F.col("src_id").alias("old_id"), "text"),
        text_col="text", id_col="old_id", k=K, w=W,
    ).filter(F.col("fp") % mod == 0).localCheckpoint()
    ok = s.join(
        s.groupBy("fp").agg(F.countDistinct("old_id").alias("_df"))
        .filter(F.col("_df") <= df_cap).select("fp"),
        "fp", "left_semi",
    )

    def probes_from(src, length):
        eligible = (
            src.filter(F.length("text") >= length)
            .orderBy("src_id").limit(n_probes)
        )
        start = F.lit(1) + (F.col("src_id") * 37) % (
            F.length("text") - F.lit(length) + 1
        )
        sid = F.col("src_id").cast("string")
        frame = lambda tag: F.substring(  # noqa: E731
            F.sha2(F.concat(F.lit(tag), sid), 256), 1, SHORT_FRAME
        )
        return eligible.select(
            F.col("src_id").alias("probe_id"),
            F.concat(
                frame("fa"), F.lit(" "),
                F.col("text").substr(start, F.lit(length)),
                F.lit(" "), frame("fb"),
            ).alias("text"),
        )

    def rates(probe_df):
        pfps = winnow_fingerprints_df(
            probe_df, text_col="text", id_col="probe_id", k=K, w=W
        ).filter(F.col("fp") % mod == 0).localCheckpoint()
        n = probe_df.count()
        own = {
            r.probe_id: r.own
            for r in pfps.groupBy("probe_id")
            .agg(F.countDistinct("fp").alias("own")).collect()
        }
        mx = {
            r.probe_id: r.max_sh
            for r in pfps.join(ok, "fp")
            .groupBy("probe_id", "old_id")
            .agg(F.countDistinct("fp").alias("sh"))
            .groupBy("probe_id")
            .agg(F.max("sh").alias("max_sh")).collect()
        }
        import math

        def hit(pid, adaptive):
            sh = mx.get(pid, 0)
            if not adaptive:
                return sh >= abs_ms
            o = own.get(pid, 0)
            return sh >= min(abs_ms, max(2, math.ceil(frac * o)))

        ids = [r.probe_id for r in probe_df.select("probe_id").collect()]
        return (
            n,
            round(sum(own.get(i, 0) for i in ids) / max(1, n), 2),
            round(sum(1 for i in ids if hit(i, False)) / max(1, n), 3),
            round(sum(1 for i in ids if hit(i, True)) / max(1, n), 3),
        )

    out = []
    for length in doc_lens:
        n_c, own_c, abs_c, ada_c = rates(probes_from(state, length))
        n_f, own_f, abs_f, ada_f = rates(probes_from(heldout, length))
        out.append({
            "doc_chars": length, "sample_mod": mod, "frac": frac,
            "n_probes": n_c, "own_mean": own_c,
            "catch_abs": abs_c, "catch_adaptive": ada_c,
            "fp_abs": abs_f, "fp_adaptive": ada_f,
        })
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("overlap-floor")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = io.load_table(spark, sf_dir, "documents")
    long_docs = build_long_docs(docs).localCheckpoint()
    n_src = long_docs.count()
    print(f"# {n_src} long sources (GROUP={GROUP}) from {sf_dir}",
          file=sys.stderr)
    if len(sys.argv) > 1 and sys.argv[1] == "short":
        rows = measure_short_doc_rates(spark, long_docs)
        print("| doc chars | mod | own mean | catch abs | catch adaptive "
              "| FP abs | FP adaptive |")
        print("|" + "---|" * 7)
        for r in rows:
            print(
                f"| {r['doc_chars']} | {r['sample_mod']} | {r['own_mean']} "
                f"| {r['catch_abs']} | {r['catch_adaptive']} "
                f"| {r['fp_abs']} | {r['fp_adaptive']} |"
            )
        print(json.dumps({
            "mode": "short", "k": K, "w": W, "frac": SHORT_FRAC,
            "rows": rows, "sec": round(time.time() - t0, 1),
            "sf_dir": sf_dir,
        }))
        return
    rows = measure_catch_rates(spark, long_docs)
    hdr = "| lift chars | mod | E[shared] | mean shared |" + "".join(
        f" catch@ms={ms} |" for ms in MIN_SHAREDS
    )
    print(hdr)
    print("|" + "---|" * (4 + len(MIN_SHAREDS)))
    for r in rows:
        print(
            f"| {r['lift_chars']} | {r['sample_mod']} | "
            f"{r['expected_shared']} | {r['mean_shared']} |"
            + "".join(f" {r['catch'][ms]} |" for ms in MIN_SHAREDS)
        )
    print(json.dumps({
        "k": K, "w": W, "group": GROUP, "n_sources": n_src,
        "df_cap": DF_CAP, "rows": rows,
        "sec": round(time.time() - t0, 1), "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
