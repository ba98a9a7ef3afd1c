"""N-gram language-model scoring (extension surface — the CCNet/KenLM-style
quality gate: train a token LM on a trusted reference corpus, score
candidate documents by perplexity, filter or tier by the score).

Scale design (100 TB):
- Training is two corpus-sized aggregations (unigram and bigram counts) —
  the LM tables that come out are vocabulary-sized, orders of magnitude
  smaller than the corpus.
- Scoring explodes candidate docs into bigrams and equi-joins the LM
  tables on token keys. Frequent-token keys ("the", punctuation runs) are
  skewed by nature; AQE skew-join splitting handles the join, and the
  unigram table is broadcast when it fits (token vocabularies usually do —
  the bigram table is the big one).
- Everything is JVM-side column arithmetic; no Python in the hot path.
- Probabilities are add-k smoothed, so unseen bigrams score finitely and
  the model never emits -inf for out-of-domain text — it just prices it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentence-start marker (gives the first token a conditioning context)
BOS = "<s>"


def _tokens(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def _bigrams(df: DataFrame, text_col: str, extra_cols: list[str]) -> DataFrame:
    """(extra_cols..., a, b) — one row per bigram occurrence, BOS-prefixed,
    empty/whitespace-only docs contribute nothing."""
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    padded = F.concat(F.array(F.lit(BOS)), toks)
    pairs = F.when(
        F.size(padded) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(padded) - 1),
            lambda i: F.struct(
                F.element_at(padded, i).alias("a"),
                F.element_at(padded, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return df.select(*extra_cols, F.explode(pairs).alias("p")).select(
        *extra_cols, "p.a", "p.b"
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Count-based bigram LM over whitespace tokens (lowercased), with a
    BOS context marker. Returns ``(bigrams, unigrams, vocab_size)`` where
    ``bigrams`` is ``(a, b, cnt)``, ``unigrams`` is ``(a, cnt)`` (contexts,
    i.e. including BOS), and ``vocab_size`` counts distinct NEXT-tokens
    (the smoothing denominator's event space).

    ONE corpus-sized aggregation: the context (unigram) counts are exactly
    ``sum_b c(a, b)`` — every context occurrence has one next token — so
    they derive from the vocab-sized bigram table instead of re-aggregating
    the corpus. The bigram table is persisted before the vocab count so
    training runs the corpus once and scoring reuses the materialized
    tables instead of recomputing them."""
    from pyspark import StorageLevel

    bg = _bigrams(df, text_col, [])
    bigrams = (
        bg.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab_size = bigrams.select("b").distinct().count()  # materializes too
    unigrams = bigrams.groupBy("a").agg(F.sum("cnt").alias("cnt"))
    return bigrams, unigrams, vocab_size


def perplexity_score(
    df: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document bigram perplexity under the trained LM:

        P(b | a) = (c(a,b) + k) / (c(a) + k*V)

    (add-k smoothing, ``add_k`` must be > 0: at k=0 an unseen bigram's
    probability is 0 and ``log2(0)`` is NULL in Spark — ``avg`` would then
    silently skip exactly the bigrams that make gibberish expensive,
    inverting the gate; asserted). Returns ``(id_col, n_bigrams, log2_ppl)`` with one row per
    input document; docs with no tokens get ``n_bigrams = 0`` and NULL
    score. ``log2_ppl`` (mean negative log2 probability) rather than the
    exponentiated perplexity: it is the number pipelines threshold on, and
    it stays in float range for any document length."""
    assert add_k > 0, f"add_k={add_k}: smoothing must be positive (see doc)"
    bg = _bigrams(df, text_col, [id_col])
    joined = (
        bg.join(bigrams.withColumnRenamed("cnt", "c_ab"), ["a", "b"], "left")
        .join(unigrams.withColumnRenamed("cnt", "c_a"), ["a"], "left")
        .select(
            id_col,
            (
                F.log2(
                    (F.coalesce("c_ab", F.lit(0)) + F.lit(add_k))
                    / (F.coalesce("c_a", F.lit(0)) + F.lit(add_k * vocab_size))
                )
            ).alias("lp"),
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("lp")).alias("log2_ppl"),
    )
    return (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "log2_ppl",
        )
    )


class HashedWeights(dict):
    """A ``{feature_id: w}`` dict that also CARRIES the hasher/dim it was
    trained under, so expression-mode consumers can mechanically refuse a
    mismatched pairing (mismatched hashers read permuted buckets and score
    garbage with no error anywhere — previously guarded by docstrings
    only)."""

    def __init__(self, data, hasher: str, dim: int):
        super().__init__(data)
        self.hasher = hasher
        self.dim = dim


class NBModel(tuple):
    """``train_hashed_nb_weights`` result: unpacks as the historical
    ``(weights_df, bias)`` 2-tuple AND exposes ``.weights`` / ``.bias`` /
    ``.hasher`` / ``.dim`` so the trained pairing travels with the model.
    ``weights_dict()`` collects the table into a :class:`HashedWeights`
    (the form ``CurationConfig.clf_weights`` / ``hashed_linear_logit_expr``
    consume) with the pairing attached."""

    def __new__(cls, weights: DataFrame, bias: float, hasher: str, dim: int):
        self = super().__new__(cls, (weights, bias))
        self.weights, self.bias = weights, bias
        self.hasher, self.dim = hasher, dim
        # tag the DataFrame too, so the legacy `w, b = train_...()` unpack
        # keeps the pairing check (best-effort: transformations of it
        # produce fresh untagged DataFrames)
        weights.hasher, weights.dim = hasher, dim
        return self

    def weights_dict(self) -> HashedWeights:
        return HashedWeights(
            {r.feature_id: r.w for r in self.weights.collect()},
            hasher=self.hasher,
            dim=self.dim,
        )


def _check_weight_pairing(weights, hasher: str, dim: int, where: str) -> None:
    """Refuse weights whose carried hasher/dim disagree with how they are
    about to be consumed. Plain dicts/DataFrames (no metadata) pass — the
    check is only as strong as the producer, which is why
    ``train_hashed_nb_weights`` now always attaches it."""
    trained_hasher = getattr(weights, "hasher", None)
    if trained_hasher is not None and trained_hasher != hasher:
        raise ValueError(
            f"{where}: weights were trained with hasher={trained_hasher!r} "
            f"but are being scored with hasher={hasher!r} — mismatched "
            "hashers read permuted buckets and score garbage. Pass "
            f"hasher={trained_hasher!r} (or retrain)."
        )
    trained_dim = getattr(weights, "dim", None)
    if trained_dim is not None and trained_dim != dim:
        raise ValueError(
            f"{where}: weights were trained with dim={trained_dim} but are "
            f"being scored with dim={dim}."
        )


def train_hashed_nb_weights(
    df: DataFrame,
    dim: int,
    text_col: str = "text",
    label_col: str = "label",
    add_k: float = 0.5,
    hasher: str = "xxhash64",
) -> "NBModel":
    """Train the hashed quality classifier IN-ENGINE: multinomial Naive
    Bayes over hashed bag-of-words features, emitted as the exact
    ``(feature_id, w)`` weight table + bias that ``hashed_linear_score``
    consumes. This closes the loop — the fastText-style gate's model no
    longer has to arrive from outside the engine.

    NB is the right trainer for this shape because it is *count-based*:
    the whole fit is ONE corpus-sized aggregation (token → hashed bucket →
    per-class counts) + arithmetic on the vocabulary-sized count table.
    No gradient loop, no iterative driver round-trips — at 100 TB the
    corpus is read once and the model that comes back is ``dim`` rows.

        w[f]  = log((c1[f] + k) / (N1 + k·dim)) − log((c0[f] + k) / (N0 + k·dim))
        bias  = log(P(y=1) / P(y=0))

    so ``sigmoid(bias + Σ w[f])`` from ``hashed_linear_score`` IS the NB
    posterior P(y=1 | doc). ``label_col`` must be 0/1. ``hasher`` must
    match what inference will use — ``hashed_linear_score`` defaults to
    xxhash64, but ``hashed_linear_logit_expr`` (the inlined expression
    mode the curation gate runs) hashes with md5 ONLY: weights trained
    under a different hasher land in permuted buckets and the gate
    scores garbage with no error anywhere. Train with ``hasher="md5"``
    whenever the model feeds ``cfg.clf_weights`` or any expr-mode/
    cross-engine consumer. Returns an :class:`NBModel` — unpacks as the
    ``(weights_df(feature_id bigint, w double), bias)`` 2-tuple, and
    carries ``hasher``/``dim`` so consumers can assert the pairing
    (``model.weights_dict()`` keeps it attached through collection).
    """
    import math

    assert add_k > 0, "add_k must be positive (unsmoothed NB emits -inf weights)"
    if hasher == "md5":
        fid = F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"),
            F.lit(dim),
        )
    elif hasher == "xxhash64":
        fid = F.pmod(F.xxhash64("tok"), F.lit(dim))
    else:
        raise ValueError(f"hasher must be 'xxhash64' or 'md5', got {hasher!r}")
    counts = (
        df.select(
            F.col(label_col).cast("int").alias("y"),
            F.explode(_tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .withColumn("feature_id", fid)
        .groupBy("feature_id")
        .agg(
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("c0"),
        )
    )
    # class token totals + doc priors: two tiny aggregates off the same scan
    totals = counts.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0")
    ).collect()[0]
    n1, n0 = float(totals.n1 or 0), float(totals.n0 or 0)
    docs = df.groupBy(F.col(label_col).cast("int").alias("y")).count()
    d = {r.y: r["count"] for r in docs.collect()}
    if not d.get(1) or not d.get(0):
        raise ValueError("training needs both classes present (labels 0 and 1)")
    bias = math.log(d[1] / d[0])
    denom1, denom0 = n1 + add_k * dim, n0 + add_k * dim
    # emit ALL dim buckets, not just training-hit ones: an unseen bucket's
    # smoothed NB weight is log(denom0/denom1), not 0 — padding the table
    # makes sigmoid(bias + Σw) the exact NB posterior on ANY input doc
    weights = (
        df.sparkSession.range(dim)
        .select(F.col("id").alias("feature_id"))
        .join(counts, "feature_id", "left")
        .select(
            "feature_id",
            (
                F.log((F.coalesce("c1", F.lit(0)) + F.lit(add_k)) / F.lit(denom1))
                - F.log((F.coalesce("c0", F.lit(0)) + F.lit(add_k)) / F.lit(denom0))
            ).alias("w"),
        )
    )
    return NBModel(weights, bias, hasher=hasher, dim=dim)


def hashed_linear_logit_expr(
    weights: dict, dim: int, col, hasher: str = "md5"
) -> "F.Column":
    """Expression-mode twin of ``hashed_linear_score`` for SMALL models:
    the weight table is inlined as a 64-to-few-thousand-element array
    literal and each token's hashed bucket indexes it directly —
    a pure per-row column expression, ZERO shuffles, no join, no Python.
    This is the right 100 TB shape when the model fits in an expression
    (the corpus scan stays a map-only stage); ``hashed_linear_score``'s
    broadcast-join mode covers large dims. Accumulation is exact decimal,
    so logits are bit-identical to the join mode and to the DuckDB oracle.

    ``hasher`` must match how the weights were TRAINED
    (``train_hashed_nb_weights``'s hasher arg): "md5" (default —
    oracle-replayable) or "xxhash64". Mismatched hashers read permuted
    buckets and score garbage with no error — which is why this is a
    parameter, not a fixed choice; weights carrying their training
    metadata (:class:`HashedWeights` / ``NBModel.weights_dict()``) are
    checked mechanically.
    """
    _check_weight_pairing(weights, hasher, dim, "hashed_linear_logit_expr")
    arr = F.array(
        *[
            F.lit(float(weights.get(i, 0.0))).cast("decimal(18,9)")
            for i in range(dim)
        ]
    )
    if hasher == "md5":
        def fid(t):
            return F.pmod(
                F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
                F.lit(dim),
            )
    elif hasher == "xxhash64":
        def fid(t):
            return F.pmod(F.xxhash64(t), F.lit(dim))
    else:
        raise ValueError(f"hasher must be 'xxhash64' or 'md5', got {hasher!r}")
    toks = F.filter(_tokens(F.col(col) if isinstance(col, str) else col),
                    lambda t: t != "")
    s = F.aggregate(
        toks,
        F.lit(0).cast("decimal(28,9)"),
        lambda acc, t: (
            acc + F.element_at(arr, (fid(t) + 1).cast("int"))
        ).cast("decimal(28,9)"),
    )
    return s.cast("double")


def hashed_linear_score(
    df: DataFrame,
    weights,
    dim: int,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clf_score",
    hasher: str = "xxhash64",
    output: str = "score",
) -> DataFrame:
    """fastText-style linear text-classifier inference (the model-based
    quality/toxicity/domain gate): hashed bag-of-words features scored by a
    weight table, squashed through a sigmoid.

        z(doc)   = bias + Σ_tok w[xxhash64(tok) mod dim]
        score    = 1 / (1 + exp(-z))

    Expressed as a pure JVM plan — model inference IS a broadcast join:
    explode tokens, hash to ``feature_id`` (``xxhash64`` — Spark-
    deterministic), broadcast-join the weight table (``dim`` rows — a
    2^18-bucket model is ~2 MB), partial-sum per document. The shuffle
    carries map-side-combined per-doc partials, never raw tokens; no
    Python anywhere. Returns ``(id_col, n_features, out_col)``, one row
    per input document — a decision table callers semi-join against, so
    the corpus itself never reshuffles (the contamination-gate shape).

    ``weights``: dict ``{feature_id: w}`` or a DataFrame
    ``(feature_id bigint, w double)``. Unhit buckets weigh 0; docs with no
    tokens score ``sigmoid(bias)``.

    ``hasher``: ``"xxhash64"`` (default — fastest, JVM-native) or
    ``"md5"`` (first 15 hex chars → bigint; bit-for-bit reproducible in
    any engine with md5 — the cross-engine-auditable mode the DuckDB
    oracle checks). ``output="logit"`` skips the sigmoid and returns the
    raw margin — weight sums are accumulated in exact decimal either way,
    so logits are bit-identical regardless of partitioning/merge order.
    """
    _check_weight_pairing(weights, hasher, dim, "hashed_linear_score")
    spark = df.sparkSession
    if isinstance(weights, dict):
        weights = spark.createDataFrame(
            list(weights.items()), "feature_id bigint, w double"
        )
    if hasher == "md5":
        fid = F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"),
            F.lit(dim),
        )
    elif hasher == "xxhash64":
        fid = F.pmod(F.xxhash64("tok"), F.lit(dim))
    else:
        raise ValueError(f"hasher must be 'xxhash64' or 'md5', got {hasher!r}")
    feats = (
        df.select(id_col, F.explode(_tokens(F.col(text_col))).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("feature_id", fid)
    )
    scored = (
        feats.join(F.broadcast(weights), "feature_id", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            # exact decimal accumulation: the sum is independent of row
            # order and partitioning, so scores are deterministic at any
            # parallelism (and engine-portable for the oracle)
            F.sum(F.coalesce("w", F.lit(0.0)).cast("decimal(18,9)")).alias("zd"),
        )
    )
    z = F.coalesce(F.col("zd").cast("double"), F.lit(0.0)) + F.lit(bias)
    result = z if output == "logit" else F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            result.alias(out_col),
        )
    )


def perplexity_tiers(
    scored: DataFrame,
    n_tiers: int = 3,
    score_col: str = "log2_ppl",
    by: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style quality tiering (Wenzek et al. 2020): split documents
    into ``n_tiers`` equal-population buckets by LM score — tier 0 = the
    lowest-perplexity "head", the last tier = the "tail" (CCNet keeps
    head+middle for training, drops or down-weights tail).

    ``by`` computes tier boundaries per group (CCNet does per-language
    percentiles) via one tiny aggregation broadcast-joined back, so the
    corpus-sized frame never reshuffles. ``exact=False`` (default) uses
    ``approx_percentile`` — the mergeable-sketch scale path; ``exact=True``
    is the test-scale oracle twin. NULL scores (unscorable docs) get a
    NULL tier. Appends a ``tier`` int column.
    """
    fracs = [i / n_tiers for i in range(1, n_tiers)]
    fn = "percentile" if exact else "approx_percentile"
    args = f"{score_col}, array({', '.join(str(f) for f in fracs)})"
    if not exact:
        args += f", {accuracy}"
    cuts_expr = F.expr(f"{fn}({args})").alias("cuts")
    if by is None:
        cuts = scored.agg(cuts_expr).collect()[0].cuts
        tier = F.lit(0)
        for c in cuts or []:
            tier = tier + F.when(F.col(score_col) > F.lit(float(c)), 1).otherwise(0)
        return scored.withColumn(
            "tier", F.when(F.col(score_col).isNull(), None).otherwise(tier)
        )
    cut_tbl = scored.filter(F.col(score_col).isNotNull()).groupBy(by).agg(cuts_expr)
    joined = scored.join(F.broadcast(cut_tbl), by, "left")
    tier = F.aggregate(
        F.coalesce("cuts", F.array().cast("array<double>")),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col(score_col) > c, 1).otherwise(0),
    )
    return joined.withColumn(
        "tier", F.when(F.col(score_col).isNull(), None).otherwise(tier)
    ).drop("cuts")
