"""Exact substring dedup (Lee et al. 2022 ExactSubstr, window-anchored
Spark re-expression) — reference-model equality + contract + plan shape."""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.operators import dedup
from pulfa_sausage_factory_spark.plans.audit import (
    assert_no_cartesian,
    count_exchanges,
)


def ref_dedup_substrings(docs, k):
    """Straight-line python model: every duplicated k-token window's
    non-first occurrence (global (doc_id, pos) order) drops its k tokens."""
    occ = defaultdict(list)
    for i, t in sorted(docs):
        if t is None:
            continue
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            occ[tuple(toks[p : p + k])].append((i, p))
    dup_starts = defaultdict(set)
    for lst in occ.values():
        if len(lst) > 1:
            for i, p in sorted(lst)[1:]:
                dup_starts[i].add(p)
    out = {}
    for i, t in docs:
        if t is None:
            out[i] = ("", 0, 0)
            continue
        toks = t.split(" ")
        drop = [False] * len(toks)
        for p in dup_starts.get(i, ()):
            for q in range(p, p + k):
                drop[q] = True
        kept = [w for w, d in zip(toks, drop) if not d]
        out[i] = (" ".join(kept), len(kept), sum(drop))
    return out


def _run(spark, docs, k):
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in dedup.dedup_substrings(sdf, k=k).collect()
    }
    assert got == ref_dedup_substrings(docs, k)
    return got


def test_planted_passage_removed_keeps_first(spark):
    boiler = " ".join(f"b{i}" for i in range(8))
    docs = [
        (1, f"alpha beta {boiler} gamma"),
        (2, f"{boiler} delta epsilon zeta"),
        (3, f"unique words only here none repeated at all {boiler}"),
        (4, "completely disjoint text with no duplication present"),
    ]
    got = _run(spark, docs, k=8)
    # doc 1 (first corpus occurrence) keeps the passage, later docs lose it
    assert "b0" in got[1][0] and got[1][2] == 0
    assert "b0" not in got[2][0] and got[2][2] >= 8
    assert "b0" not in got[3][0]
    assert got[4] == (docs[3][1], 7, 0)


def test_reference_equality_randomized(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 12)))
        for _ in range(4)
    ]
    docs = []
    for i in range(30):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        text = " ".join(parts)
        if rng.random() < 0.6:
            p = rng.choice(passages)
            text = f"{text} {p}" if text else p
        docs.append((i, text))
    _run(spark, docs, k=5)


def test_short_null_empty_docs_pass_through(spark):
    docs = [(1, "a b c"), (2, None), (3, ""), (4, "a b c d e f")]
    got = _run(spark, docs, k=6)
    assert got[1] == ("a b c", 3, 0)
    assert got[2] == ("", 0, 0)
    # empty string is one empty token, shorter than k — kept whole
    assert got[3] == ("", 1, 0)


def test_self_repetition_within_one_doc(spark):
    chant = " ".join(f"c{i}" for i in range(5))
    docs = [(1, f"{chant} filler {chant}")]
    got = _run(spark, docs, k=5)
    # second in-document occurrence drops, first stays
    assert got[1][0].startswith(chant)
    assert got[1][2] == 5


def test_plan_shape(spark):
    sdf = spark.createDataFrame(
        [(i, "x y z w v u t s r q") for i in range(10)], "doc_id long, text string"
    )
    out = dedup.dedup_substrings(sdf, k=4)
    assert_no_cartesian(out)
    # hash-key window + doc-side join/window/rebuild: the rebuild reuses the
    # doc partitioning, so the whole operator stays within a small fixed
    # exchange budget regardless of corpus size
    assert count_exchanges(out) <= 5
