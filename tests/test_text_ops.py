"""X4h/X9 — PII scrub and URL canonicalization edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions import text


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], ["v"]).select(expr.alias("r")).collect()[0].r


def test_redact_pii_and_counts(spark):
    s = "mail a.b+c@x-y.co.uk or B@C.IO, call +1 (555) 123-4567; not 12345"
    assert _one(spark, s, text.redact_pii(F.col("v"))) == (
        "mail <EMAIL> or <EMAIL>, call <PHONE>; not 12345"
    )
    assert _one(spark, s, text.count_matches(F.col("v"), text.EMAIL_RE)) == 2
    assert _one(spark, s, text.count_matches(F.col("v"), text.PHONE_RE)) == 1


def test_normalize_url_cases(spark):
    cases = {
        # scheme/host lowercase, default port, fragment, utm, param sort
        "HTTPS://WWW.Ex.COM:443/A/b?z=1&utm_campaign=x&a=2#frag":
            "https://www.ex.com/A/b?a=2&z=1",
        "http://ex.com:80/": "http://ex.com",
        "http://ex.com:8080/p": "http://ex.com:8080/p",  # non-default port kept
        "https://ex.com/p/?utm_source=a": "https://ex.com/p/",  # path slash kept
        "https://ex.com/?utm_source=a": "https://ex.com",
        "https://ex.com/p?b=2&a=1&a=0": "https://ex.com/p?a=0&a=1&b=2",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, text.normalize_url(F.col("v"))) == want, raw


def test_normalize_url_idempotent(spark):
    """Canonicalization is a projection: applying it twice = once (the
    crawl-dedup invariant — already-canonical URLs must not drift)."""
    from hypothesis import given, settings, strategies as st

    host = st.from_regex(r"[A-Za-z]{1,8}(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
    path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,3}", fullmatch=True)
    qs = st.from_regex(r"(\?([a-z]{1,4}=[0-9]{0,3}&?|utm_[a-z]{1,6}=x&?){0,3})?", fullmatch=True)
    frag = st.from_regex(r"(#[A-Za-z0-9]{0,5})?", fullmatch=True)
    scheme = st.sampled_from(["http://", "HTTPS://", "https://", "HTTP://"])
    port = st.sampled_from(["", ":80", ":443", ":8080"])

    @settings(max_examples=30, deadline=None)
    @given(scheme, host, port, path, qs, frag)
    def check(sc, h, po, pa, q, f):
        url = sc + h + po + pa + q + f
        once = _one(spark, url, text.normalize_url(F.col("v")))
        twice = _one(spark, once, text.normalize_url(F.col("v")))
        assert twice == once, (url, once, twice)

    check()


def test_pack_greedy_budget_invariant(spark):
    """Every document's start offset within its pack is < budget, packs are
    contiguous from 0 per shard, and assignment is order-deterministic."""
    import random

    from pulfa_sausage_factory_spark.functions.sampling import pack_greedy

    rng = random.Random(7)
    rows = [
        (i, f"s{i % 3}", rng.randint(1, 400))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    got = pack_greedy(df, "n_tokens", budget=512, part_col="source", order_col="doc_id")
    by_shard = {}
    for r in got.collect():
        by_shard.setdefault(r.source, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        seen_packs = []
        for r in rs:
            assert r.pack_id == cum // 512  # start-offset rule
            cum += r.n_tokens
            if not seen_packs or seen_packs[-1] != r.pack_id:
                seen_packs.append(r.pack_id)
        assert seen_packs == list(range(seen_packs[-1] + 1))  # contiguous


def test_repetition_signals_flag_boilerplate(spark):
    from pulfa_sausage_factory_spark.functions.text import (
        dup_segment_fraction,
        top_ngram_stats_df,
    )

    docs = spark.createDataFrame(
        [
            (1, "buy now. buy now. buy now. unique tail"),
            (2, "a perfectly ordinary sentence with no repeats"),
            (3, "x"),          # 1 token -> no bigrams
            (4, ""),           # degenerate
        ],
        "doc_id long, text string",
    )
    frac = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id", dup_segment_fraction("text").alias("f")
        ).collect()
    }
    assert frac[1] > 0.4          # "buy now" segments collapse
    assert frac[2] == 0.0
    rep = {r.doc_id: r for r in top_ngram_stats_df(docs).collect()}
    assert rep[1].top_ngram_count >= 3          # "buy now." dominates
    assert rep[1].top_ngram_frac > rep[2].top_ngram_frac
    assert 3 not in rep and 4 not in rep        # too short: no grams


def test_temperature_resample_flattens_domains(spark):
    from pulfa_sausage_factory_spark.functions.sampling import (
        temperature_resample,
    )

    # heavily skewed synthetic corpus: 2000 web, 200 books, 20 code
    rows = (
        [(i, "web") for i in range(2000)]
        + [(10_000 + i, "books") for i in range(200)]
        + [(20_000 + i, "code") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string")

    # alpha=1 is the identity: every row survives
    assert temperature_resample(df, "doc_id", "domain", alpha=1.0).count() == len(rows)

    # alpha=0 equalizes expected per-domain counts: the rarest domain keeps
    # everything, every domain lands near its size (hash-uniformity noise)
    flat = temperature_resample(df, "doc_id", "domain", alpha=0.0)
    got = {r[0]: r[1] for r in flat.groupBy("domain").count().collect()}
    assert got["code"] == 20
    assert 10 <= got["books"] <= 30
    assert 10 <= got["web"] <= 30

    # intermediate alpha is monotone: web keeps more than at alpha=0,
    # less than everything
    mid = temperature_resample(df, "doc_id", "domain", alpha=0.5)
    mid_web = mid.filter("domain = 'web'").count()
    assert got["web"] < mid_web < 2000

    # deterministic: the kept subset is identical across runs (no RNG)
    a = sorted(r.doc_id for r in mid.collect())
    b = sorted(
        r.doc_id
        for r in temperature_resample(df, "doc_id", "domain", alpha=0.5).collect()
    )
    assert a == b

    # the corpus-side plan is a narrow filter: no Exchange on the big side
    from pulfa_sausage_factory_spark.plans import audit

    assert audit.count_exchanges(mid) == 0


def _bpe_reference(texts, num_merges, min_pair_count=2):
    # independent straight-line Sennrich BPE: word freq dict, overlapping
    # adjacent-pair counts, argmax with (count desc, pair asc) tie-break
    import re
    from collections import Counter

    # Java \s is ASCII-only: mirror tokens()'s split exactly, not Python
    # str.split()'s Unicode whitespace
    words = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()):
            if w:
                words[w] += 1
    return _bpe_merge_loop(words, num_merges, min_pair_count)


def _bpe_merge_loop(words, num_merges, min_pair_count=2):
    from collections import Counter

    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark, sf_dir):
    from pulfa_sausage_factory_spark.functions.text import bpe_train_merges
    from pulfa_sausage_factory_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(80)
    texts = [r.text for r in docs.select("text").collect()]
    want = _bpe_reference(texts, num_merges=12)
    got, vocab = bpe_train_merges(docs, num_merges=12)
    assert got == want
    assert len(got) == 12
    # the dictionary stays exact: total frequency == corpus word count
    total = vocab.agg({"freq": "sum"}).first()[0]
    assert total == sum(len(t.lower().split()) for t in texts)


def test_bpe_sampled_training_matches_reference_on_sampled_dict(spark, sf_dir):
    # word_sample_fraction trains on a deterministic hash-bucket sample of
    # the word DICTIONARY (the 100 TB mode — vocabulary induction never
    # needs the full corpus). The merge sequence must equal the reference
    # model run over exactly the surviving words, pinning both the sampling
    # rule and the merge arithmetic.
    from pulfa_sausage_factory_spark.functions.sampling import (
        deterministic_sample,
    )
    from pulfa_sausage_factory_spark.functions.text import (
        bpe_train_merges,
        tokens,
    )
    from pulfa_sausage_factory_spark.io import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(80)
    words = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    sampled = {
        r.word: r.freq
        for r in deterministic_sample(words, "word", 0.5).collect()
    }
    full = {r.word: r.freq for r in words.collect()}
    assert 0 < len(sampled) < len(full)  # the sample really is a subset

    want = _bpe_merge_loop(sampled, num_merges=10)
    got, vocab = bpe_train_merges(docs, num_merges=10, word_sample_fraction=0.5)
    assert got == want
    # and the returned dictionary is the sampled one, not the full corpus
    assert vocab.count() == len(sampled)


def test_bpe_encode_reproduces_training_segmentation(spark, sf_dir):
    # ranked-merge encoding must leave every dictionary word segmented
    # exactly as the training loop left it, and ids must round-trip
    # through the vocab back to the original text
    from pulfa_sausage_factory_spark.functions.text import (
        bpe_encode,
        bpe_train_merges,
        bpe_vocab,
    )
    from pulfa_sausage_factory_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    merges, syms_df = bpe_train_merges(docs, num_merges=15)
    vocab = bpe_vocab(docs, merges)
    inv = {i: s for s, i in vocab.items()}

    # training's final per-word segmentation
    want = {"".join(r.syms): list(r.syms) for r in syms_df.collect()}

    encoded = bpe_encode(docs, merges, vocab).select("text", "token_ids").collect()
    assert len(encoded) == 60
    import re

    for r in encoded:
        toks = [inv[i] for i in r.token_ids]  # KeyError if any -1 leaked
        # ids concatenate back to the whitespace-normalized lowered text
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", r.text.lower()) if w]
        assert "".join(toks) == "".join(words)
        # and each word's segmentation matches the training dictionary
        i = 0
        for w in words:
            seg = want[w]
            assert toks[i : i + len(seg)] == seg, (w, seg, toks[i : i + len(seg)])
            i += len(seg)
        assert i == len(toks)


def test_bpe_encode_oov_chars_map_to_minus_one(spark):
    from pulfa_sausage_factory_spark.functions.text import bpe_encode

    df = spark.createDataFrame([(1, "ab zz")], "doc_id long, text string")
    got = bpe_encode(df, merges=[("a", "b")], vocab={"a": 0, "b": 1, "ab": 2}).first()
    assert got.token_ids == [2, -1, -1]


def test_tokenizer_loop_feeds_packing_with_exact_counts(spark, sf_dir):
    # the full pre-training assembly line: train merges -> encode to ids ->
    # pack on EXACT token counts (not the regex approximation)
    from pulfa_sausage_factory_spark.functions.sampling import (
        hash_bucket,
        pack_greedy,
    )
    from pulfa_sausage_factory_spark.functions.text import (
        bpe_encode,
        bpe_train_merges,
        bpe_vocab,
    )
    from pulfa_sausage_factory_spark.io import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges, _ = bpe_train_merges(docs, num_merges=8)
    ids = bpe_encode(docs, merges, bpe_vocab(docs, merges)).withColumn(
        "n_tokens", F.size("token_ids")
    ).withColumn("shard", hash_bucket("doc_id") % 4)
    packed = pack_greedy(ids, "n_tokens", budget=2000, part_col="shard", order_col="doc_id")
    rows = packed.select("shard", "pack_id", "n_tokens").collect()
    assert all(r.n_tokens > 0 for r in rows)
    # offset rule: every pack except a shard's last is filled past nothing —
    # pack start offsets are monotone and each pack holds >= 1 doc
    per_pack = {}
    for r in rows:
        per_pack.setdefault((r.shard, r.pack_id), 0)
        per_pack[(r.shard, r.pack_id)] += r.n_tokens
    # a pack overshoots the budget by at most one document's tokens
    max_doc = max(r.n_tokens for r in rows)
    assert all(tot <= 2000 + max_doc for tot in per_pack.values())


def test_bpe_train_releases_superseded_rounds(spark):
    from pulfa_sausage_factory_spark.functions.text import bpe_train_merges

    df = spark.createDataFrame(
        [(1, "aa ab aa ab ac aa"), (2, "ab aa ba aa")],
        "doc_id long, text string",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    merges, vocab = bpe_train_merges(df, num_merges=5, min_pair_count=1)
    assert vocab.count() > 0
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1  # only the final dictionary survives


def test_temperature_resample_extreme_skew_keeps_majority_domain(spark):
    # domain skew beyond 1/BUCKETS: coarse 10^4 bucket granularity would
    # truncate the majority domain's keep rate to zero and drop it entirely
    from pulfa_sausage_factory_spark.functions.sampling import (
        temperature_resample,
    )

    rows = [(i, "web") for i in range(60_000)] + [(10_000_000, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    flat = temperature_resample(df, "doc_id", "domain", alpha=0.0)
    got = {r[0]: r[1] for r in flat.groupBy("domain").count().collect()}
    assert got.get("rare") == 1
    # ideal expected count is 1 per domain; hash noise allowed, zero is not
    assert 1 <= got.get("web", 0) <= 40


def test_collapse_repeated_lines_matches_reference(spark):
    from pulfa_sausage_factory_spark.functions.text import (
        collapse_repeated_lines,
    )
    from pulfa_sausage_factory_spark.plans import audit
    from pyspark.sql import functions as F

    rows = [
        (1, "a\nb\na\nc\nb"),
        (2, "x\nx\nx"),
        (3, "only one line"),
        (4, ""),
        (5, "a\n\na\n\nb"),  # blank lines dedupe like any other line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select("doc_id", collapse_repeated_lines("text").alias("t"))
    assert audit.count_exchanges(out) == 0  # pure map stage

    def ref(t):
        seen, keep = set(), []
        for line in t.split("\n"):
            if line not in seen:
                seen.add(line)
                keep.append(line)
        return "\n".join(keep)

    got = {r.doc_id: r.t for r in out.collect()}
    assert got == {i: ref(t) for i, t in rows}


# ---- chunk_documents (context-window splitting) ----------------------------


def _ref_chunks(text, max_tokens, overlap):
    toks = (text or "").split(" ")
    stride = max_tokens - overlap
    out = []
    i = 0
    while True:
        out.append(toks[i * stride : i * stride + max_tokens])
        if i * stride + max_tokens >= len(toks):
            break
        i += 1
    return out


def test_chunk_documents_reference_equality(spark):
    from pulfa_sausage_factory_spark.functions.sampling import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(25))),
        (2, "short doc"),
        (3, None),
        (4, " ".join(f"u{i}" for i in range(10))),  # exactly max_tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, max_tokens=10, overlap=3).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_no, r.chunk_text, r.n_tokens))
    for doc_id, text in docs:
        expect = _ref_chunks(text, 10, 3)
        chunks = sorted(got[doc_id])
        assert [c[1] for c in chunks] == [" ".join(t) for t in expect]
        assert [c[2] for c in chunks] == [len(t) for t in expect]
        assert [c[0] for c in chunks] == list(range(len(expect)))


def test_chunk_documents_coverage_and_overlap(spark):
    from pulfa_sausage_factory_spark.functions.sampling import chunk_documents

    n_tok, mx, ov = 57, 12, 4
    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n_tok)))], "doc_id long, text string"
    )
    chunks = sorted(
        (r.chunk_no, r.chunk_text.split(" "))
        for r in chunk_documents(df, max_tokens=mx, overlap=ov).collect()
    )
    seen = [t for _, toks in chunks for t in toks]
    assert sorted(set(int(t) for t in seen)) == list(range(n_tok))  # lossless
    for (_, a), (_, b) in zip(chunks, chunks[1:]):
        assert a[-ov:] == b[:ov]  # consecutive chunks share exactly overlap
        assert len(b) >= 1


def test_chunk_documents_is_narrow(spark):
    from pulfa_sausage_factory_spark.functions.sampling import chunk_documents
    from pulfa_sausage_factory_spark.plans.audit import assert_no_exchange

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    assert_no_exchange(chunk_documents(df, max_tokens=3, overlap=1))


def test_chunk_documents_validates_overlap(spark):
    import pytest as _pytest

    from pulfa_sausage_factory_spark.functions.sampling import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)


# ---- gopher_rules (Rae et al. 2021 quality gates) --------------------------


def test_gopher_rules_each_gate(spark):
    from pulfa_sausage_factory_spark.functions.text import gopher_rules

    good = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        * 5
    ).strip()
    docs = [
        (1, good),  # passes everything
        (2, "too short"),  # word_count
        (3, " ".join(["supercalifragilisticexpialidocious"] * 60)),  # mean_word_len + stopwords
        (4, good + " " + "# " * 40),  # symbol ratio
        (5, "\n".join(f"- bullet {i} the and" for i in range(10))),  # bullets (+wc)
        (6, "\n".join(f"line {i} the and of to in is...," for i in range(4))),
        (7, " ".join(["1234"] * 80)),  # alpha words + stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.g.asDict()
        for r in df.select("doc_id", gopher_rules("text").alias("g")).collect()
    }
    assert out[1]["pass"] is True and all(out[1].values())
    assert out[2]["word_count_ok"] is False and out[2]["pass"] is False
    assert out[3]["mean_word_len_ok"] is False and out[3]["stopwords_ok"] is False
    assert out[4]["symbol_ratio_ok"] is False
    assert out[5]["bullet_lines_ok"] is False
    assert out[7]["alpha_words_ok"] is False and out[7]["pass"] is False


def test_gopher_rules_ellipsis_gate(spark):
    from pulfa_sausage_factory_spark.functions.text import gopher_rules

    text = "\n".join(
        [f"the and of line {i} keeps going fine here today" for i in range(5)]
        + [f"and then it trails off number {i}..." for i in range(5)]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    g = df.select(gopher_rules("text", min_words=10).alias("g")).collect()[0].g
    assert g.ellipsis_lines_ok is False  # 50% of lines end with ...


def test_gopher_rules_no_exchange(spark):
    from pulfa_sausage_factory_spark.functions.text import gopher_rules
    from pulfa_sausage_factory_spark.plans.audit import assert_no_exchange

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert_no_exchange(df.select(gopher_rules("text").alias("g")))


# ---- repetition_signals / repetition_rules (Gopher Table A1) ---------------


def _rep_reference(t):
    """Independent straight-line implementation of the 13 repetition
    signals (set arithmetic where the engine uses Counters)."""
    row = {}
    for key, sep in (("line", "\n"), ("para", "\n\n")):
        segs = [x for x in (p.strip() for p in t.split(sep)) if x]
        uniq = set(segs)
        total, chars = len(segs), sum(map(len, segs))
        row[f"dup_{key}_frac"] = (total - len(uniq)) / total if total else 0.0
        row[f"dup_{key}_char_frac"] = (
            (chars - sum(map(len, uniq))) / chars if chars else 0.0
        )
    toks = t.lower().split()
    total_chars = sum(map(len, toks))
    for n in (2, 3, 4):
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or not total_chars:
            row[f"top{n}_char_frac"] = 0.0
            continue
        from collections import Counter
        cnt = Counter(grams)
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        row[f"top{n}_char_frac"] = best[1] * sum(map(len, best[0])) / total_chars
    for n in range(5, 11):
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or not total_chars:
            row[f"dup{n}_char_frac"] = 0.0
            continue
        from collections import Counter
        cnt = Counter(grams)
        cov = set()
        for i, g in enumerate(grams):
            if cnt[g] > 1:
                cov.update(range(i, i + n))
        row[f"dup{n}_char_frac"] = sum(len(toks[p]) for p in cov) / total_chars
    return row


def test_repetition_signals_match_reference(spark, sf_dir):
    from pulfa_sausage_factory_spark.functions.text import repetition_signals
    from pulfa_sausage_factory_spark.io import load_table

    crafted = [
        (1, ""),
        (2, "one two three four five six seven eight nine ten"),
        (3, "spam spam spam spam spam spam spam spam"),
        (4, "line a\nline b\nline a\nline b\nline c"),
        (5, "para one here\n\npara one here\n\npara two here"),
        (6, "a b c d e f g h a b c d e f g h x y z w"),
    ]
    docs = load_table(spark, sf_dir, "documents").limit(40).collect()
    rows = crafted + [(100 + i, r.text) for i, r in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select("doc_id", repetition_signals("text").alias("s")).collect()
    }
    import pytest as pt

    for doc_id, t in rows:
        want = _rep_reference(t)
        for k, v in want.items():
            assert got[doc_id][k] == pt.approx(v, abs=1e-12), (doc_id, k)
    # crafted sanity: the all-same-token doc is maximally repetitive
    # (top-n-gram char frac legitimately EXCEEDS 1 for overlapping repeats
    # of the same token — count x gram_chars / total, the Gopher formula)
    assert got[3]["dup5_char_frac"] == 1.0 and got[3]["top2_char_frac"] > 1.0
    # the duplicated-line doc triggers the line family (tokens split on
    # ALL whitespace, so repeated lines also light up the n-gram family)
    assert got[4]["dup_line_frac"] > 0.3
    assert got[5]["dup_para_frac"] > 0.3


def test_repetition_rules_gate_and_overrides(spark):
    import pytest as pt

    from pulfa_sausage_factory_spark.functions.text import repetition_rules

    clean = " ".join(f"w{i}" for i in range(60))
    spammy = "buy now " * 30
    df = spark.createDataFrame(
        [(1, clean), (2, spammy)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.g.asDict()
        for r in df.select("doc_id", repetition_rules("text").alias("g")).collect()
    }
    assert got[1]["pass"] is True
    assert got[2]["pass"] is False and got[2]["top2_char_frac_ok"] is False
    # loosening every threshold to 1.0 admits the spam
    loose = {k[:-3]: 10.0 for k in got[2] if k != "pass"}  # strip _ok suffix
    got2 = {
        r.doc_id: r.g["pass"]
        for r in df.select(
            "doc_id", repetition_rules("text", loose).alias("g")
        ).collect()
    }
    assert got2[2] is True
    with pt.raises(ValueError, match="unknown repetition"):
        repetition_rules("text", {"nope": 0.5})


def test_repetition_gate_in_curation(spark):
    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        CurationConfig,
        run_curation,
    )

    clean = " ".join(f"word{i}" for i in range(60))
    spammy = "buy now " * 40
    docs = spark.createDataFrame(
        [(1, clean), (2, spammy)], "doc_id long, text string"
    )
    rep = run_curation(
        spark, docs,
        CurationConfig(min_quality=0.0, neardup_method="none",
                       use_repetition_gates=True),
    )
    by = {s["stage"]: s for s in rep["stages"]}
    assert by["quality_gate"]["rows"] == 1


def test_materialize_packs_end_to_end(spark):
    # docs → BPE ids → budgeted pack assignment → packed tensors: the
    # concatenation must be lossless and ordered, spans must add up
    from pulfa_sausage_factory_spark.functions import sampling, text
    from pyspark.sql import functions as F

    rows = [(i, "ab ab bc " * (i + 1)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = text.bpe_train_merges(docs, num_merges=3)
    enc = text.bpe_encode(docs, merges, text.bpe_vocab(docs, merges))
    packed = sampling.pack_greedy(
        enc.withColumn("n_tokens", F.size("token_ids"))
        .withColumn("shard", sampling.hash_bucket("doc_id") % 2),
        "n_tokens", budget=40, part_col="shard", order_col="doc_id",
    )
    out = sampling.materialize_packs(packed).collect()
    by_doc = {r.doc_id: list(r.token_ids) for r in enc.collect()}

    seen_docs = []
    for r in out:
        assert r.n_docs == len(r.doc_ids) == len(r.doc_lens)
        # spans partition input_ids exactly, in doc_id order
        assert sorted(r.doc_ids) == list(r.doc_ids)
        assert sum(r.doc_lens) == len(r.input_ids)
        off = 0
        for d, ln in zip(r.doc_ids, r.doc_lens):
            assert list(r.input_ids[off:off + ln]) == by_doc[d], d
            off += ln
        seen_docs += list(r.doc_ids)
    assert sorted(seen_docs) == sorted(by_doc)  # lossless, no dup/loss


# ---- normalize_unicode (clean-stage Unicode hygiene) -----------------------


def test_normalize_unicode_forms_and_stripping(spark):
    import unicodedata

    import pytest as pt

    from pulfa_sausage_factory_spark.functions.text import normalize_unicode

    decomposed = "café näive"          # e + combining acute, etc.
    composed = unicodedata.normalize("NFC", decomposed)
    rows = [
        (1, decomposed),
        (2, "zero​width‌joined‍﻿end"),
        (3, "ctrl\x00chars\x1fremoved\x7fbut\ttabs\nand\rnewlines stay"),
        (4, "ﬁne ﬂow ①"),                          # ligatures+circled: NFKC-only
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = {
        r.doc_id: r.t
        for r in df.select("doc_id", normalize_unicode("text").alias("t")).collect()
    }
    assert nfc[1] == composed and "́" not in nfc[1]
    assert nfc[2] == "zerowidthjoinedend"
    assert nfc[3] == "ctrlcharsremovedbut\ttabs\nand\rnewlines stay"
    assert nfc[4] == "ﬁne ﬂow ①"  # NFC keeps compatibility chars
    assert nfc[5] is None
    # zero-width char BETWEEN base and combining mark blocks composition:
    # stripping must happen before normalization or the decomposed
    # sequence survives and digests differently from its composed twin
    ocr = spark.createDataFrame(
        [(10, "cafe\u200b\u0301 society")], "doc_id long, text string"
    )
    got = ocr.select(normalize_unicode("text").alias("t")).collect()[0].t
    assert got == "caf\u00e9 society"
    nfkc = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", normalize_unicode("text", "NFKC").alias("t")
        ).collect()
    }
    assert nfkc[4] == "fine flow 1"
    with pt.raises(ValueError, match="form"):
        normalize_unicode("text", "NFX")


def test_unicode_normalization_rescues_exact_dedup(spark):
    # the reason the clean stage normalizes: visually identical texts in
    # different compositions must collapse to ONE digest
    import unicodedata

    from pulfa_sausage_factory_spark.pipelines.curation_pipeline import (
        CurationConfig,
        run_curation,
    )

    decomposed = "café society archive notes"
    composed = unicodedata.normalize("NFC", decomposed)
    docs = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    plain = run_curation(
        spark, docs, CurationConfig(min_quality=0.0, neardup_method="none")
    )
    normed = run_curation(
        spark, docs,
        CurationConfig(min_quality=0.0, neardup_method="none",
                       unicode_form="NFC"),
    )
    assert plain["output_rows"] == 2   # different bytes → both survive
    assert normed["output_rows"] == 1  # normalized → exact dedup collapses


def test_suggest_overlap_config_arithmetic():
    # round-10 VERDICT item 4: the sizing arithmetic the overlap ledger's
    # docstring used to leave to the operator, encoded like
    # suggest_ann_config. Density: ~2/((w+1)·mod) sampled fps per char.
    from pulfa_sausage_factory_spark.functions.text import (
        suggest_overlap_config,
    )

    # the documented default operating point: catch 600-char lifts with a
    # 2x margin over min_shared=4 at k=16/w=8 → mod 16 (today's default)
    s = suggest_overlap_config()
    assert s["sample_mod"] == 16
    assert s["span_reliable_chars"] == 16 * 4 * 9 == 576
    assert s["span_expectation_chars"] == 288
    assert abs(s["fp_state_rows_per_char"] - 2 / (9 * 16)) < 1e-12

    # mods are powers of two (nested sampling when a deployment coarsens)
    for span in (60, 300, 600, 2400, 10_000):
        m = suggest_overlap_config(span)["sample_mod"]
        assert m & (m - 1) == 0 and m >= 1
    # finer floor → finer mod; 4x the span → 4x the mod (both pow2 exact)
    assert suggest_overlap_config(2400)["sample_mod"] == 64

    # a state budget RAISES the mod and the weaker floor is reported
    b = suggest_overlap_config(
        600, total_chars=1_000_000_000, target_state_rows=1_000_000
    )
    assert b["sample_mod"] == 256
    assert b["state_rows"] <= 1_000_000
    assert b["span_reliable_chars"] == 256 * 4 * 9
    # ...but never LOWERS it below the detection-floor choice
    loose = suggest_overlap_config(
        600, total_chars=1000, target_state_rows=1_000_000
    )
    assert loose["sample_mod"] == 16

    # spans below the winnowing matching bound are impossible at this k/w
    import pytest

    with pytest.raises(ValueError, match="matching bound"):
        suggest_overlap_config(10)
    with pytest.raises(ValueError, match="needs total_chars"):
        suggest_overlap_config(600, target_state_rows=10)


def test_winnow_fingerprints_twins_identical(spark, sf_dir):
    """Hot-path-twin pin (round 14): ``winnow_fingerprints_df`` expr ≡
    arrow — same (id, fp) sets at both documented operating points
    (x4d's k=5/w=4 and the overlap ledger's k=16/w=8) over real corpus
    text PLUS the edge shapes: doc exactly at the k+w-1 visibility
    bound, one below it (emits nothing), NULL text, empty text, a
    repeated-window doc (distinct-fp collapse), and BMP unicode."""
    import pytest

    from pulfa_sausage_factory_spark.functions.text import (
        winnow_fingerprints_df,
    )
    from pulfa_sausage_factory_spark.io import load_table

    crafted = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "x" * 22),  # repeated window → heavy distinct collapse
            (4, "abcdefghij klmnopqrst uvwxyz 0123456789"),
            (5, "café naïve — 中文 text body"),
            (6, "abcdefghijklmnopqrstuvw"),  # exactly k+w-1 at k=16,w=8
            (7, "abcdefghijklmnopqrstuv"),  # one char short → no rows
        ],
        ["doc_id", "text"],
    )
    docs = load_table(spark, sf_dir, "documents").unionByName(
        crafted.withColumn("doc_id", F.col("doc_id") + 1_000_000),
        allowMissingColumns=True,
    ).select("doc_id", "text")
    for k, w in ((5, 4), (16, 8)):
        a = winnow_fingerprints_df(docs, "text", "doc_id", k=k, w=w)
        b = winnow_fingerprints_df(
            docs, "text", "doc_id", k=k, w=w, impl="arrow"
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            f"expr/arrow winnow twins diverge at k={k} w={w}"
        )
    # the below-bound doc emits nothing in BOTH impls (visibility contract)
    for impl in ("expr", "arrow"):
        assert (
            winnow_fingerprints_df(
                crafted, "text", "doc_id", k=16, w=8, impl=impl
            ).filter(F.col("doc_id").isin(1, 2, 7)).count() == 0
        ), impl
    with pytest.raises(ValueError, match="impl"):
        winnow_fingerprints_df(docs, "text", "doc_id", impl="nope")
