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
