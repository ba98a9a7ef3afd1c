"""DSIR importance resampling (Xie et al. 2023) — Spark plan pinned against
a straight-line Python reference over the SAME hashed features, plus the
selection property itself: target-like raw docs survive the resample."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions import sampling


def _extract_fids(spark, docs, dim):
    """Pull each doc's hashed unigram+bigram bucket ids via the engine's own
    expression, so the reference replays only the DSIR arithmetic."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        sampling._hashed_ngram_ids("text", dim).alias("fids"),
    ).collect()
    return {r.doc_id: list(r.fids) for r in rows}


def _reference(raw, target, fids_raw, fids_tgt, dim, lam, k):
    ct = dict.fromkeys(range(dim), 0)
    cr = dict.fromkeys(range(dim), 0)
    for d, _ in target:
        for f in fids_tgt[d]:
            ct[f] += 1
    for d, _ in raw:
        for f in fids_raw[d]:
            cr[f] += 1
    nt = max(1.0, float(sum(ct.values())))
    nr = max(1.0, float(sum(cr.values())))
    u = lam / dim
    lr = {
        f: math.log((1.0 - lam) * ct[f] / nt + u)
        - math.log((1.0 - lam) * cr[f] / nr + u)
        for f in range(dim)
    }
    log_w = {d: sum(lr[f] for f in fids_raw[d]) for d, _ in raw}

    def gumbel(doc_id):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % 100_000_000
        u = (b + 0.5) / 100_000_000.0
        return -math.log(-math.log(u))

    key = {d: log_w[d] + gumbel(d) for d, _ in raw}
    chosen = sorted(raw, key=lambda p: (-key[p[0]], p[0]))[:k]
    return log_w, key, [d for d, _ in chosen]


def test_dsir_matches_reference(spark):
    dim, lam, k = 64, 0.01, 4
    target = [
        (1, "the archive holds letters and finding aids"),
        (2, "letters from the archive series"),
        (3, "finding aids describe the archive"),
    ]
    raw = [
        (10, "the archive holds many letters"),
        (11, "finding aids and the archive series"),
        (12, "zzz qqq spam buy now"),
        (13, "completely unrelated text about turnips"),
        (14, "letters letters letters archive"),
        (15, "buy spam zzz qqq"),
        (16, ""),
        (17, "the"),
    ]
    fids_raw = _extract_fids(spark, raw, dim)
    fids_tgt = _extract_fids(spark, target, dim)
    ref_lw, ref_key, ref_chosen = _reference(
        raw, target, fids_raw, fids_tgt, dim, lam, k
    )

    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")

    ratio = sampling.dsir_log_ratio(
        sampling.dsir_feature_counts(tgt_df, dim),
        sampling.dsir_feature_counts(raw_df, dim),
        dim,
        lam,
    )
    imp = {
        r.doc_id: (r.n_features, r.log_w)
        for r in sampling.dsir_importance(raw_df, ratio, dim).collect()
    }
    assert set(imp) == {d for d, _ in raw}
    for d, _ in raw:
        assert imp[d][0] == len(fids_raw[d])
        assert imp[d][1] == pytest.approx(ref_lw[d], abs=1e-9), d
    # the empty/1-token docs weigh exactly 0 (no features)
    assert imp[16] == (0, 0.0)

    got = sampling.dsir_resample(raw_df, tgt_df, k=k, dim=dim, lam=lam)
    chosen = [r.doc_id for r in got.collect()]
    assert chosen == ref_chosen
    # determinism: identical selection on a rerun
    again = [
        r.doc_id
        for r in sampling.dsir_resample(raw_df, tgt_df, k=k, dim=dim, lam=lam).collect()
    ]
    assert again == chosen


def test_dsir_prefers_target_like_docs(spark, sf_dir):
    # selection property at fixture scale: raw docs sharing the target's
    # vocabulary must out-survive shuffled-junk docs
    from pulfa_sausage_factory_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(120)
    target = docs.limit(20)
    junk = [
        (100_000 + i, " ".join(f"zz{j}q{i}" for j in range(30))) for i in range(60)
    ]
    raw = docs.union(spark.createDataFrame(junk, "doc_id long, text string"))
    picked = sampling.dsir_resample(raw, target, k=40, dim=4096)
    ids = [r.doc_id for r in picked.select("doc_id").collect()]
    assert len(ids) == 40
    junk_survivors = sum(1 for i in ids if i >= 100_000)
    assert junk_survivors <= 5, junk_survivors


def test_dsir_importance_plan_broadcasts_ratio(spark):
    from pulfa_sausage_factory_spark import plans

    raw = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee")], "doc_id long, text string"
    )
    ratio = sampling.dsir_log_ratio(
        sampling.dsir_feature_counts(raw, 32),
        sampling.dsir_feature_counts(raw, 32),
        32,
    )
    imp = sampling.dsir_importance(raw, ratio, 32)
    plans.assert_no_cartesian(imp)
    plans.assert_broadcast_join(imp)


def test_dsir_feature_impls_agree(spark, sf_dir):
    # the Arrow fast path and the oracle-replayable expression form must
    # emit IDENTICAL feature-id bags for real corpus text
    from pulfa_sausage_factory_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60).select("doc_id", "text")
    a = {
        r.doc_id: list(r.f)
        for r in docs.select(
            "doc_id", sampling._hashed_ngram_ids("text", 512, "arrow").alias("f")
        ).collect()
    }
    b = {
        r.doc_id: list(r.f)
        for r in docs.select(
            "doc_id", sampling._hashed_ngram_ids("text", 512, "expr").alias("f")
        ).collect()
    }
    assert a == b and len(a) == 60
    import pytest as pt
    with pt.raises(ValueError, match="impl"):
        sampling._hashed_ngram_ids("text", 512, "numpy")


def test_dsir_resample_impls_agree(spark, sf_dir):
    """Round-14 pin: the restructured one-hash arrow resample (count rows
    + Σ cnt·lr decimal arithmetic) selects EXACTLY the docs the
    oracle-replayable expr form does, in the same order — the decimal
    scale-12 products/sums are exact, so the gumbel keys are bit-equal."""
    from pulfa_sausage_factory_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    target = docs.limit(40)
    a = [
        (r.doc_id, r.log_w, r.gumbel_key)
        for r in sampling.dsir_resample(docs, target, k=50, dim=2048, impl="arrow").collect()
    ]
    b = [
        (r.doc_id, r.log_w, r.gumbel_key)
        for r in sampling.dsir_resample(docs, target, k=50, dim=2048, impl="expr").collect()
    ]
    assert a == b and len(a) == 50
