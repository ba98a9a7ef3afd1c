"""Bigram-LM perplexity scoring (the CCNet/KenLM-style quality gate):
Spark implementation pinned against a straight-line Python reference."""

from __future__ import annotations

import math
import re

import pytest


def _reference_scores(train_texts, score_docs, add_k=0.5):
    ws = r"[ \t\n\x0b\f\r]+"

    def toks(t):
        return [w for w in re.split(ws, t.lower()) if w]

    def bigrams(t):
        tt = ["<s>"] + toks(t)
        return list(zip(tt, tt[1:]))

    c_ab, c_a = {}, {}
    for t in train_texts:
        for a, b in bigrams(t):
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
            c_a[a] = c_a.get(a, 0) + 1
    vocab = len({b for (_, b) in c_ab})
    out = {}
    for doc_id, t in score_docs:
        bs = bigrams(t)
        if not bs:
            out[doc_id] = (0, None)
            continue
        lps = [
            math.log2(
                (c_ab.get((a, b), 0) + add_k) / (c_a.get(a, 0) + add_k * vocab)
            )
            for a, b in bs
        ]
        out[doc_id] = (len(bs), -sum(lps) / len(lps))
    return out


def test_perplexity_matches_reference_and_ranks_gibberish(spark, sf_dir):
    from pulfa_sausage_factory_spark.functions import lm
    from pulfa_sausage_factory_spark.io import load_table

    train = load_table(spark, sf_dir, "documents").limit(60)
    train_texts = [r.text for r in train.select("text").collect()]

    score_docs = [
        (1, train_texts[0]),                      # in-domain: cheap
        (2, "zzqx glorp wibble frobnicate zort"), # gibberish: expensive
        (3, ""),                                  # empty: no bigrams
        (4, "   "),                               # whitespace-only
    ]
    sdf = spark.createDataFrame(score_docs, "doc_id long, text string")

    bigrams, unigrams, vocab = lm.train_bigram_lm(train)
    got = {
        r.doc_id: (r.n_bigrams, r.log2_ppl)
        for r in lm.perplexity_score(
            sdf, bigrams, unigrams, vocab, id_col="doc_id"
        ).collect()
    }
    want = _reference_scores(train_texts, score_docs)

    assert set(got) == {1, 2, 3, 4}
    for doc_id in got:
        assert got[doc_id][0] == want[doc_id][0], doc_id
        if want[doc_id][1] is None:
            assert got[doc_id][1] is None
        else:
            assert got[doc_id][1] == pytest.approx(want[doc_id][1], rel=1e-9)
    # the quality-gate property itself: in-domain text prices far below
    # out-of-domain gibberish
    assert got[1][1] < got[2][1]


def test_hashed_linear_score_matches_reference(spark, sf_dir):
    # fastText-style inference: the Spark broadcast-join plan must agree
    # with a straight-line reference computed over the SAME feature ids
    # (feature hashing is Spark's deterministic xxhash64 — extracted once
    # via a tiny query, then the arithmetic is replayed in Python)
    from pulfa_sausage_factory_spark.functions import lm
    from pulfa_sausage_factory_spark.io import load_table
    from pyspark.sql import functions as F

    dim, bias = 64, -0.25
    weights = {i: ((i * 37) % 21 - 10) / 10.0 for i in range(0, dim, 3)}

    docs = load_table(spark, sf_dir, "documents").limit(30).select("doc_id", "text")
    got = {
        r.doc_id: (r.n_features, r.clf_score)
        for r in lm.hashed_linear_score(docs, weights, dim, bias=bias).collect()
    }

    feats = (
        docs.select("doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("fid", F.pmod(F.xxhash64("tok"), F.lit(dim)))
        .collect()
    )
    z = {r.doc_id: bias for r in docs.select("doc_id").collect()}
    n = dict.fromkeys(z, 0)
    for r in feats:
        z[r.doc_id] += weights.get(r.fid, 0.0)
        n[r.doc_id] += 1
    assert set(got) == set(z) and len(got) == 30
    for d in got:
        assert got[d][0] == n[d]
        assert got[d][1] == pytest.approx(1.0 / (1.0 + math.exp(-z[d])), rel=1e-12)


def test_hashed_linear_score_plan_and_empty_docs(spark):
    # weight join broadcasts; empty docs still get a row at sigmoid(bias)
    from pulfa_sausage_factory_spark.functions import lm

    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = lm.hashed_linear_score(df, {0: 1.0}, dim=4, bias=0.5)
    got = {r.doc_id: (r.n_features, r.clf_score) for r in out.collect()}
    assert set(got) == {1, 2, 3}
    for d in (2, 3):
        assert got[d][0] == 0
        assert got[d][1] == pytest.approx(1.0 / (1.0 + math.exp(-0.5)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the weight-table side is explicitly hinted broadcast
    assert "broadcast" in out._jdf.queryExecution().logical().toString().lower()


def _nb_reference(labeled, dim, add_k, fids):
    """Straight-line multinomial NB over pre-extracted hashed feature ids
    (``fids``: doc_id → list of bucket ids, extracted via the same Spark
    hash so only the arithmetic is under test)."""
    c1 = dict.fromkeys(range(dim), 0)
    c0 = dict.fromkeys(range(dim), 0)
    d1 = d0 = 0
    for doc_id, _text, y in labeled:
        if y == 1:
            d1 += 1
        else:
            d0 += 1
        for f in fids.get(doc_id, []):
            (c1 if y == 1 else c0)[f] += 1
    n1, n0 = sum(c1.values()), sum(c0.values())
    den1, den0 = n1 + add_k * dim, n0 + add_k * dim
    w = {
        f: math.log((c1[f] + add_k) / den1) - math.log((c0[f] + add_k) / den0)
        for f in range(dim)
    }
    return w, math.log(d1 / d0)


def test_nb_trainer_matches_reference_and_feeds_inference(spark):
    # train → weights table identical to the straight-line NB fit, and the
    # trained model actually separates in-domain from junk when plugged
    # into hashed_linear_score (the full train→gate loop, in-engine)
    from pulfa_sausage_factory_spark.functions import lm
    from pyspark.sql import functions as F

    dim, add_k = 32, 0.5
    good = ["the quiet archive holds many letters", "letters from the old archive",
            "a finding aid describes the archive series", "the series holds letters"]
    junk = ["zzz qqq xxx spam spam", "buy buy zzz qqq spam", "xxx zzz buy spam qqq"]
    labeled = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(junk)
    ]
    df = spark.createDataFrame(labeled, "doc_id long, text string, label int")

    feats = (
        df.select("doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("fid", F.pmod(F.xxhash64("tok"), F.lit(dim)))
        .collect()
    )
    fids = {}
    for r in feats:
        fids.setdefault(r.doc_id, []).append(r.fid)
    ref_w, ref_bias = _nb_reference(labeled, dim, add_k, fids)

    weights, bias = lm.train_hashed_nb_weights(df, dim, add_k=add_k)
    got_w = {r.feature_id: r.w for r in weights.collect()}
    assert bias == pytest.approx(ref_bias, rel=1e-12)
    assert set(got_w) == set(range(dim))  # ALL buckets emitted, not just hit ones
    for f in range(dim):
        assert got_w[f] == pytest.approx(ref_w[f], rel=1e-9), f

    scored = lm.hashed_linear_score(
        spark.createDataFrame(
            [(1, "letters from the archive"), (2, "zzz spam buy qqq")],
            "doc_id long, text string",
        ),
        weights,
        dim,
        bias=bias,
    )
    s = {r.doc_id: r.clf_score for r in scored.collect()}
    assert s[1] > 0.5 > s[2]


def test_nb_trainer_validates_inputs(spark):
    from pulfa_sausage_factory_spark.functions import lm

    one_class = spark.createDataFrame(
        [(1, "aa bb", 1), (2, "cc dd", 1)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="both classes"):
        lm.train_hashed_nb_weights(one_class, dim=8)
    with pytest.raises(ValueError, match="hasher"):
        lm.train_hashed_nb_weights(one_class, dim=8, hasher="sha9")


def test_expression_mode_matches_join_mode_and_never_shuffles(spark, sf_dir):
    # the inlined-weights expression must produce bit-identical logits to
    # the broadcast-join mode (same md5 hashing, same decimal sums) while
    # compiling to a map-only plan
    from pulfa_sausage_factory_spark.functions import lm
    from pulfa_sausage_factory_spark.io import load_table
    from pulfa_sausage_factory_spark.plans import audit

    dim = 32
    weights = {i: ((i * 11) % 9 - 4) / 10.0 for i in range(dim)}
    docs = load_table(spark, sf_dir, "documents").limit(50).select("doc_id", "text")

    from pyspark.sql import functions as F

    expr_df = docs.select(
        "doc_id", lm.hashed_linear_logit_expr(weights, dim, "text").alias("z")
    )
    assert audit.count_exchanges(expr_df) == 0
    a = {r.doc_id: r.z for r in expr_df.collect()}
    b = {
        r.doc_id: r.clf_logit
        for r in lm.hashed_linear_score(
            docs, weights, dim, hasher="md5", output="logit", out_col="clf_logit"
        ).collect()
    }
    assert a == b and len(a) == 50


def test_perplexity_tiers_exact_and_grouped(spark):
    from pulfa_sausage_factory_spark.functions import lm

    rows = [(i, float(i), "en" if i % 2 == 0 else "fr") for i in range(1, 10)]
    rows.append((99, None, "en"))
    df = spark.createDataFrame(rows, "doc_id long, log2_ppl double, lang string")

    got = {
        r.doc_id: r.tier
        for r in lm.perplexity_tiers(df, n_tiers=3, exact=True).collect()
    }
    # exact thirds over 1..9: {1,2,3}=head, {4,5,6}=middle, {7,8,9}=tail
    assert [got[i] for i in range(1, 10)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert got[99] is None

    # per-language boundaries: en scores {2,4,6,8}, fr {1,3,5,7,9} — each
    # language tiers independently on its own distribution
    g = {
        r.doc_id: r.tier
        for r in lm.perplexity_tiers(df, n_tiers=2, by="lang", exact=True).collect()
    }
    assert g[2] == 0 and g[4] == 0 and g[8] == 1
    assert g[1] == 0 and g[5] == 0 and g[9] == 1
    assert g[99] is None

    # the sketch path agrees with exact on this tiny frame
    a = {
        r.doc_id: r.tier
        for r in lm.perplexity_tiers(df, n_tiers=3, exact=False).collect()
    }
    assert a == got


def test_logit_expr_hasher_param_matches_join_mode(spark, sf_dir):
    # the expression gate accepts BOTH hashers and must agree bit-for-bit
    # with the broadcast-join mode under the SAME hasher — so weights
    # trained with either hasher have a matching gate (the mismatch
    # footgun is now a parameter, not a fixed md5)
    from pulfa_sausage_factory_spark.functions import lm
    from pulfa_sausage_factory_spark.io import load_table

    dim = 32
    weights = {i: ((i * 13) % 7 - 3) / 10.0 for i in range(dim)}
    docs = load_table(spark, sf_dir, "documents").limit(40).select("doc_id", "text")
    for hasher in ("md5", "xxhash64"):
        a = {
            r.doc_id: r.z
            for r in docs.select(
                "doc_id",
                lm.hashed_linear_logit_expr(weights, dim, "text", hasher).alias("z"),
            ).collect()
        }
        b = {
            r.doc_id: r.clf_logit
            for r in lm.hashed_linear_score(
                docs, weights, dim, hasher=hasher, output="logit",
                out_col="clf_logit",
            ).collect()
        }
        assert a == b and len(a) == 40, hasher
    # the two hashers genuinely permute buckets (scores differ)
    md5_scores = docs.select(
        lm.hashed_linear_logit_expr(weights, dim, "text", "md5").alias("z")
    ).collect()
    xx_scores = docs.select(
        lm.hashed_linear_logit_expr(weights, dim, "text", "xxhash64").alias("z")
    ).collect()
    assert [r.z for r in md5_scores] != [r.z for r in xx_scores]
    with pytest.raises(ValueError, match="hasher"):
        lm.hashed_linear_logit_expr(weights, dim, "text", "sha1")


def test_nb_model_carries_hasher_and_pairing_is_enforced(spark):
    # round-5 hardening: weights now CARRY their training hasher/dim, and
    # every scorer refuses a mismatched pairing (previously guarded by
    # docstrings only — mismatched hashers score garbage with no error)
    from pulfa_sausage_factory_spark.functions import lm
    from pyspark.sql import functions as F

    labeled = spark.createDataFrame(
        [(1, "good archive letters", 1), (2, "zzz spam qqq", 0),
         (3, "letters archive series", 1), (4, "buy spam zzz", 0)],
        "doc_id long, text string, label int",
    )
    model = lm.train_hashed_nb_weights(labeled, dim=16, hasher="md5")
    # legacy 2-tuple unpack still works and the DataFrame is tagged
    weights, bias = model
    assert (weights, bias) == (model.weights, model.bias)
    assert model.hasher == weights.hasher == "md5"
    assert model.dim == weights.dim == 16

    wdict = model.weights_dict()
    assert wdict.hasher == "md5" and wdict.dim == 16
    assert set(wdict) == set(range(16))

    # matched pairing scores fine (both modes)
    docs = labeled.select("doc_id", "text")
    assert lm.hashed_linear_score(docs, weights, 16, hasher="md5").count() == 4
    assert (
        docs.select(lm.hashed_linear_logit_expr(wdict, 16, "text", "md5"))
        .count() == 4
    )

    # mismatched hasher → loud error in every consumer
    with pytest.raises(ValueError, match="hasher"):
        lm.hashed_linear_score(docs, weights, 16)  # default xxhash64
    with pytest.raises(ValueError, match="hasher"):
        lm.hashed_linear_logit_expr(wdict, 16, "text", hasher="xxhash64")
    # mismatched dim → loud error too
    with pytest.raises(ValueError, match="dim"):
        lm.hashed_linear_logit_expr(wdict, 32, "text", hasher="md5")
    # untagged plain dicts keep working (no metadata, no check)
    plain = dict(wdict)
    assert docs.select(
        lm.hashed_linear_logit_expr(plain, 16, "text", "xxhash64")
    ).count() == 4
