"""Deterministic hash-based sampling and dataset splitting (extension
surface — the selection operators a training-data pipeline needs).

``rand()``-based sampling is non-reproducible across retries and engines;
hashing a stable key is the scalable idiom: no shuffle, no state, the
same row always lands in the same bucket on any cluster size, and the
sample composition survives task re-execution (the property Spark's
at-least-once task model requires). md5 (not xxhash) so ANSI-SQL oracles
reproduce bucket assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: buckets per unit of probability mass (1e4 → 0.01% granularity)
BUCKETS = 10_000


def _bucket(key: Column | str, hex_digits: int, buckets: int) -> Column:
    """Shared md5 bucket chain: first ``hex_digits`` md5 hex digits → int →
    mod ``buckets``. One implementation for both granularities so a fix to
    the hashing applies everywhere; callers pin their own (digits, buckets)
    pairs because the coarse assignment is reproduced by oracle SQL."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, hex_digits), 16, 10).cast(
            "long"
        ),
        F.lit(buckets),
    )


def hash_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, BUCKETS): first 8 md5 hex digits of the key →
    int → mod. Uniform for any reasonably-entropic key."""
    return _bucket(key, 8, BUCKETS)


#: fine-grained bucket space for per-domain keep rates that can be far
#: below 1/BUCKETS (temperature resampling of heavily skewed corpora)
FINE_BUCKETS = 100_000_000


def _hash_bucket_fine(key: Column | str) -> Column:
    """Stable bucket in [0, FINE_BUCKETS): 12 md5 hex digits (48 bits) so
    the modulus stays uniform. Separate from :func:`hash_bucket` because
    the coarse assignment is pinned by oracle SQL; the chain is shared."""
    return _bucket(key, 12, FINE_BUCKETS)


def _threshold_expr(
    col: str,
    fractions: dict,
    default_fraction: float,
    buckets: int,
    floor_one: bool = False,
) -> Column:
    """Shared per-value threshold chain for bucketed keep/drop filters.
    ``eqNullSafe`` so a NULL stratum/domain named in ``fractions`` gets its
    rate instead of silently falling through to the default; ``floor_one``
    guarantees a named value is downsampled, never truncated to zero."""
    threshold = F.lit(int(default_fraction * buckets))
    for value, frac in fractions.items():
        t = int(frac * buckets)
        if floor_one:
            t = max(1, t)
        threshold = F.when(
            F.col(col).eqNullSafe(F.lit(value)), F.lit(t)
        ).otherwise(threshold)
    return threshold


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible on any
    engine/cluster/retry (unlike ``df.sample``)."""
    return df.filter(hash_bucket(key) < int(fraction * BUCKETS))


def hash_split(df: DataFrame, key: str, fractions: dict[str, float]) -> DataFrame:
    """Assign every row to a named split (train/val/test) by key hash.
    ``fractions`` must sum to 1.0; assignment is a single narrow
    projection — no shuffle, no sort, stable forever."""
    total = sum(fractions.values())
    assert abs(total - 1.0) < 1e-9, f"fractions sum to {total}, need 1.0"
    b = hash_bucket(key)
    expr = None
    acc = 0
    for name, frac in fractions.items():
        acc += int(frac * BUCKETS)
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(list(fractions)[-1]))


def pack_greedy(
    df,
    token_col: str,
    budget: int,
    part_col: str,
    order_col: str,
):
    """Sequence packing: assign each document a ``pack_id`` so consecutive
    documents (by ``order_col``, within ``part_col`` shards) fill a token
    budget — the pre-training batch-assembly shape.

    The assignment is the offset rule ``pack = floor(start_offset /
    budget)`` over a running token sum — one window pass, deterministic,
    and embarrassingly parallel across shards. (Exact first-fit would be
    sequential per shard; the offset rule over-fills a pack by at most one
    document, the standard streaming approximation.) Packing is per-shard
    by design: a global ordered cumsum would serialize the corpus through
    one task."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("pack_id", (start / budget).cast("long"))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source rebalancing
    step of corpus assembly (upsample rare strata, downsample dominant
    ones) with the same retry-stable hash-bucket rule as
    ``deterministic_sample``; strata not named get ``default_fraction``.
    One narrow projection, no shuffle, no RNG state."""
    return df.filter(
        hash_bucket(key)
        < _threshold_expr(strata_col, fractions, default_fraction, BUCKETS)
    )


def temperature_resample(
    df: DataFrame,
    key: str,
    domain_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual/multi-source
    sampling rule: draw domain ``d`` with probability ∝ ``p_d**alpha``):
    flatten a skewed domain distribution toward uniform by keeping domain
    ``d`` at rate ``(p_d**alpha / p_d)``, normalized so the most-upweighted
    domain keeps everything — pure downsampling, so the result is a subset
    (deterministic, retry-stable) rather than a resample with duplicates.

    ``alpha=1`` keeps every row (no-op); ``alpha=0`` equalizes expected
    per-domain counts; between is the usual T=1/alpha temperature ladder.

    Scale: one count aggregation on the domain column (domains are few by
    definition), the per-domain keep rates come back as a broadcast map,
    and the corpus itself passes through a single narrow filter — the
    corpus never shuffles. The driver-side ``collect`` touches
    O(#domains) rows, the same bounded-small materialization as IVF's
    centroid table."""
    assert 0.0 <= alpha <= 1.0, f"alpha={alpha} outside [0, 1]"
    counts = {r[0]: r[1] for r in df.groupBy(domain_col).count().collect()}
    total = sum(counts.values())
    if not counts or total == 0:
        return df
    rel = {d: (c / total) ** (alpha - 1.0) for d, c in counts.items()}
    top = max(rel.values())
    fractions = {d: w / top for d, w in rel.items()}
    # FINE granularity: domain skew routinely exceeds 1/BUCKETS (10^4) at
    # low alpha — int(frac * 10^4) would truncate the dominant domain's
    # keep rate to zero and silently DROP the majority of the corpus.
    # Resolution bound: keep rates below 1/FINE_BUCKETS (1e-8) floor at one
    # bucket, over-keeping such a domain relative to the ideal mix — only
    # reachable when one domain outweighs another by >1e8:1; beyond that,
    # pre-partition the corpus by domain instead of resampling in one pass
    return df.filter(
        _hash_bucket_fine(key)
        < _threshold_expr(domain_col, fractions, 0.0, FINE_BUCKETS, floor_one=True)
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-document splitting into fixed-budget token chunks with overlap
    — the context-window preparation step between cleaning and packing
    (``pack_greedy`` then packs the CHUNKS): chunk ``i`` covers tokens
    ``[i*stride, i*stride + max_tokens)`` with ``stride = max_tokens -
    overlap``, so consecutive chunks share exactly ``overlap`` tokens and
    every token is covered.

    Pure column expressions (split → sequence explode → slice): a NARROW
    op — no shuffle, parallelism follows source partitioning, output rows
    = Σ ceil. NULL text behaves as an empty document (one empty chunk),
    matching the dedup operators' NULL contract.

    Returns ``(id_col, chunk_no, chunk_text, n_tokens)``.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        (F.lit(1) + F.ceil((n - max_tokens) / F.lit(stride))).cast("int")
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(
                F.sequence(F.lit(0), n_chunks - 1)
            ).alias("chunk_no"),
        )
        .select(
            id_col,
            "chunk_no",
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_no") * stride + 1, max_tokens),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("_toks"), F.col("chunk_no") * stride + 1, max_tokens)
            ).alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Select raw-corpus documents that look like a small
# trusted target corpus: fit hashed-n-gram bag distributions over both,
# score every raw doc with the log importance ratio, then draw a k-document
# sample without replacement via deterministic Gumbel-top-k.
#
# Scale shape (100 TB): the two distribution fits are single corpus-sized
# aggregations whose outputs are ``dim`` rows each; scoring is the
# hashed-classifier plan (explode → broadcast-join the dim-row ratio table →
# map-side-combined per-doc sums); selection is a TakeOrdered top-k over the
# one-row-per-doc importance table. No iteration, no driver loops.
# ---------------------------------------------------------------------------


def _hashed_ngram_ids(col: Column | str, dim: int, impl: str = "arrow") -> Column:
    """Array of hashed feature ids for DSIR's unigram+bigram bag: whitespace
    tokens (lowercased) hashed into ``dim`` buckets (first 8 md5 hex digits
    → int → mod — the module's standard engine-portable chain), plus each
    adjacent pair hashed as ``"a b"``.

    ``impl="arrow"`` (default) computes the whole bag in one Arrow-batched
    pandas pass with a per-batch token hash cache — the signature-workload
    idiom; the equivalent pure-expression form (``impl="expr"``, kept for
    oracle replay) runs its per-token lambdas INTERPRETED and measured
    ~20× slower on the bench corpus. Both produce identical ids (pinned by
    test)."""
    c = F.col(col) if isinstance(col, str) else col
    if impl == "expr":
        def h(s):
            return F.pmod(
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
                F.lit(dim),
            )

        toks = F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != "")
        uni = F.transform(toks, lambda t: h(t))
        bi = F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: h(F.concat(a, F.lit(" "), b)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(uni, bi)
    if impl != "arrow":
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    import hashlib

    import pandas as pd

    md5 = hashlib.md5

    def ids(s):
        out = []
        cache: dict[str, int] = {}
        for t in s:
            toks = [w for w in (t or "").lower().split() if w]
            row = []
            for g in toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]:
                v = cache.get(g)
                if v is None:
                    # == int(md5 hexdigest[:8], 16) % dim: oracle-replayable
                    v = int.from_bytes(md5(g.encode("utf-8")).digest()[:4], "big") % dim
                    cache[g] = v
                row.append(v)
            out.append(row)
        return pd.Series(out)

    ids.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(ids, "array<bigint>")(c)


def _hashed_ngram_count_rows(
    df: DataFrame, text_col: str, id_col: str, dim: int
) -> DataFrame:
    """``mapInPandas``: (id, text) → ``(id, feature_id, cnt)`` — one row
    per distinct hashed unigram/bigram feature per document, with its
    in-document instance count. Identical feature ids to
    ``_hashed_ngram_ids`` (md5 hex-prefix → int → mod chain, pinned by
    test); the per-(doc, feature) counts make ``explode`` + both
    downstream aggregations (corpus bucket counts, per-doc importance
    sums) derivable from ONE hashing pass (round 14, guide §4 —
    ``dsir_resample`` previously ran the full arrow UDF over the raw
    corpus twice, once per consumer).

    Vectorization shape: ``pd.factorize`` maps tokens to codes at C
    speed; md5 runs once per distinct TOKEN (unigrams) and once per
    distinct adjacent CODE PAIR (bigrams — the ``"a b"`` string is built
    only per distinct pair, not per instance); instance counting is one
    ``np.unique(return_counts=True)`` over (doc, feature) keys."""
    import hashlib

    import numpy as np
    import pandas as pd

    md5 = hashlib.md5

    def gen(batches):
        for pdf in batches:
            texts = pdf[text_col]
            ids_np = pdf[id_col].to_numpy()
            kept: list[int] = []
            toks_per_doc: list = []
            for i in range(len(pdf)):
                toks = (texts.iat[i] or "").lower().split()
                if not toks:
                    continue
                kept.append(i)
                toks_per_doc.append(np.asarray(toks, dtype=object))
            if not kept:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].iloc[0:0],
                        "feature_id": np.empty(0, np.int64),
                        "cnt": np.empty(0, np.int64),
                    }
                )
                continue
            lens = np.fromiter(
                (len(x) for x in toks_per_doc), dtype=np.int64,
                count=len(toks_per_doc),
            )
            flat = np.concatenate(toks_per_doc)
            codes, uniques = pd.factorize(flat)
            uh = np.fromiter(
                (
                    int.from_bytes(md5(t.encode("utf-8")).digest()[:4], "big")
                    % dim
                    for t in uniques
                ),
                dtype=np.int64,
                count=len(uniques),
            )
            uni_ids = uh[codes]
            doc_uni = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            # bigram windows: adjacent code pairs that do not cross a doc
            # boundary (same index arithmetic as the shingle twins)
            wpd = np.maximum(lens - 1, 0)
            n_bi = int(wpd.sum())
            if n_bi:
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                doc_bi = np.repeat(np.arange(len(lens), dtype=np.int64), wpd)
                csum = np.cumsum(wpd)
                offs = np.arange(n_bi, dtype=np.int64) - np.repeat(
                    csum - wpd, wpd
                )
                widx = np.repeat(starts, wpd) + offs
                pa = codes[widx].astype(np.int64)
                pb = codes[widx + 1].astype(np.int64)
                pair_key = pa * np.int64(len(uniques)) + pb
                upairs, pinv = np.unique(pair_key, return_inverse=True)
                nu = np.int64(len(uniques))
                bh = np.fromiter(
                    (
                        int.from_bytes(
                            md5(
                                (uniques[int(pk // nu)] + " " + uniques[int(pk % nu)])
                                .encode("utf-8")
                            ).digest()[:4],
                            "big",
                        )
                        % dim
                        for pk in upairs
                    ),
                    dtype=np.int64,
                    count=len(upairs),
                )
                bi_ids = bh[pinv]
                d_all = np.concatenate([doc_uni, doc_bi])
                f_all = np.concatenate([uni_ids, bi_ids])
            else:
                d_all, f_all = doc_uni, uni_ids
            key = d_all * np.int64(dim) + f_all
            uk, cnts = np.unique(key, return_counts=True)
            out_ids = ids_np[np.asarray(kept, dtype=np.int64)][uk // dim]
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "feature_id": uk % dim,
                    "cnt": cnts.astype(np.int64),
                }
            )

    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        gen, f"`{id_col}` {id_ddl}, feature_id long, cnt long"
    )


def dsir_feature_counts(
    df: DataFrame, dim: int, text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """One corpus-sized aggregation → the ``dim``-bucket hashed-n-gram count
    table ``(feature_id, cnt)`` (only hit buckets present)."""
    return (
        df.select(F.explode(_hashed_ngram_ids(text_col, dim, impl)).alias("feature_id"))
        .groupBy("feature_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio(
    target_counts: DataFrame, raw_counts: DataFrame, dim: int, lam: float = 0.01
) -> DataFrame:
    """The ``dim``-row importance table: per bucket,
    ``lr = log p_target[f] − log q_raw[f]`` where each distribution is the
    normalized bucket histogram mixed with the uniform distribution,
    ``p̃ = (1−λ)·c/N + λ/dim``.

    Mixture (not add-k) smoothing is load-bearing here: with add-k and a
    raw corpus much larger than the target (the ONLY regime DSIR runs in),
    a feature unseen in both corpora scores ``log(N_raw/N_target) > 0`` —
    unique-gibberish documents would then OUTRANK target-like text. Under
    the uniform mixture an unseen-in-both bucket scores ≈ 0 and a
    rare-in-raw-only bucket scores slightly negative, which is the behavior
    the importance estimate needs. Both count tables are bucket-sized — the
    range join below is driver-cheap and the result broadcasts into scoring."""
    assert 0 < lam < 1, "lam must be in (0,1) (uniform-mixture weight)"
    spark = target_counts.sparkSession
    # Materialize both count tables ONCE (each is bucket-bounded, <= dim
    # rows) before anything consumes them: the corpus-sized hash+aggregate
    # feeding each would otherwise execute for the normalizer collect below
    # AND re-execute when the ratio join's broadcast builds inside the
    # consumer's plan — measured at sf0.1 the raw corpus was hashed 3x per
    # dsir_resample action (normalizer, ratio broadcast, importance
    # features); with the checkpoint it is hashed twice, the remaining
    # passes being the two genuinely distinct computations (bucket counts,
    # per-doc features).
    target_counts = target_counts.localCheckpoint()
    raw_counts = raw_counts.localCheckpoint()
    nt = max(1.0, float(target_counts.agg(F.sum("cnt")).collect()[0][0] or 0))
    nr = max(1.0, float(raw_counts.agg(F.sum("cnt")).collect()[0][0] or 0))
    u = lam / dim

    def p(cnt_col, n):
        return F.lit(1.0 - lam) * F.coalesce(cnt_col, F.lit(0)) / F.lit(n) + F.lit(u)

    return (
        spark.range(dim)
        .select(F.col("id").alias("feature_id"))
        .join(target_counts.withColumnRenamed("cnt", "ct"), "feature_id", "left")
        .join(raw_counts.withColumnRenamed("cnt", "cr"), "feature_id", "left")
        .select(
            "feature_id",
            (F.log(p(F.col("ct"), nt)) - F.log(p(F.col("cr"), nr))).alias("lr"),
        )
    )


def dsir_importance(
    raw: DataFrame,
    ratio: DataFrame,
    dim: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Per-document log importance weight ``log w(x) = Σ_f c_f(x)·lr[f]`` —
    explode features, broadcast-join the ``dim``-row ratio table, sum per
    doc. Accumulation is exact decimal so weights are independent of
    partitioning (and of Spark's aggregation order). Returns
    ``(id_col, n_features, log_w)``, one row per raw doc (featureless docs
    weigh 0)."""
    feats = raw.select(
        id_col, F.explode(_hashed_ngram_ids(text_col, dim, impl)).alias("feature_id")
    )
    scored = (
        feats.join(F.broadcast(ratio), "feature_id", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce("lr", F.lit(0.0)).cast("decimal(28,12)")).alias("lw"),
        )
    )
    return (
        raw.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce(F.col("lw").cast("double"), F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    dim: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.01,
    impl: str = "arrow",
) -> DataFrame:
    """DSIR end-to-end: fit target/raw hashed-n-gram distributions, score
    raw docs, and draw ``k`` of them without replacement with probability
    ∝ w(x) via Gumbel-top-k — the Gumbel noise is derived from the doc id's
    md5 hash (``−log(−log(u))``, u from the fine bucket chain), so the
    sample is bit-reproducible across runs, engines, and task retries,
    exactly like every other sampler in this module.

    Returns the selected raw rows (all original columns) plus ``log_w``
    and the selection key ``gumbel_key``; ordered by key descending.
    """
    u = (_hash_bucket_fine(F.col(id_col)) + F.lit(0.5)) / F.lit(float(FINE_BUCKETS))
    if impl == "arrow":
        # one hashing pass over the raw corpus (round 14, guide §4): the
        # per-(doc, feature) count rows serve BOTH consumers — the corpus
        # bucket histogram (groupBy feature) and the per-doc importance
        # sums (join ratio, groupBy doc). Arithmetic is exactly the
        # per-instance form's: Σ_instances lr ≡ Σ_f cnt_f·lr with lr at
        # decimal scale 12 (integer multiply and sum are exact), so the
        # selected sample is bit-identical. The k-row result is
        # checkpointed so the corpus-sized feature table can be released
        # before return instead of leaking a checkpoint per call.
        from ..session import release_local_checkpoint

        feats = _hashed_ngram_count_rows(raw, text_col, id_col, dim).localCheckpoint()
        try:
            raw_counts = feats.groupBy("feature_id").agg(
                F.sum("cnt").alias("cnt")
            )
            ratio = dsir_log_ratio(
                dsir_feature_counts(target, dim, text_col, impl),
                raw_counts,
                dim,
                lam,
            )
            scored = (
                feats.join(F.broadcast(ratio), "feature_id", "left")
                .groupBy(id_col)
                .agg(
                    F.sum("cnt").alias("n_features"),
                    F.sum(
                        F.coalesce("lr", F.lit(0.0)).cast("decimal(18,12)")
                        * F.col("cnt").cast("decimal(10,0)")
                    ).alias("lw"),
                )
            )
            imp = (
                raw.select(id_col)
                .distinct()
                .join(scored, id_col, "left")
                .select(
                    id_col,
                    F.coalesce("n_features", F.lit(0)).alias("n_features"),
                    F.coalesce(F.col("lw").cast("double"), F.lit(0.0)).alias(
                        "log_w"
                    ),
                )
            )
            keyed = imp.select(
                id_col,
                "log_w",
                (F.col("log_w") - F.log(-F.log(u))).alias("gumbel_key"),
            )
            top = (
                keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
                .limit(k)
                .localCheckpoint()
            )
        finally:
            release_local_checkpoint(feats)
        return raw.join(top, id_col).orderBy(
            F.col("gumbel_key").desc(), F.col(id_col)
        )
    ratio = dsir_log_ratio(
        dsir_feature_counts(target, dim, text_col, impl),
        dsir_feature_counts(raw, dim, text_col, impl),
        dim,
        lam,
    )
    imp = dsir_importance(raw, ratio, dim, text_col, id_col, impl)
    keyed = imp.select(
        id_col,
        "log_w",
        (F.col("log_w") - F.log(-F.log(u))).alias("gumbel_key"),
    )
    top = keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)
    return raw.join(top, id_col).orderBy(F.col("gumbel_key").desc(), F.col(id_col))


def materialize_packs(
    df: DataFrame,
    ids_col: str = "token_ids",
    pack_col: str = "pack_id",
    part_col: str = "shard",
    order_col: str = "doc_id",
) -> DataFrame:
    """The terminal step of the tokenize → pack → train-tensor story:
    assemble each pack's documents into one concatenated ``input_ids``
    sequence plus the per-document span metadata a trainer needs for
    attention masking / example tracking.

    One aggregation keyed ``(part_col, pack_col)`` — the shuffle moves each
    token id exactly once, grouped by destination pack; in-pack document
    order is pinned by ``order_col`` (``array_sort`` on the collected
    structs, so the result is partition-order-independent). Returns
    ``(part_col, pack_col, n_docs, doc_ids, doc_lens, input_ids)`` where
    ``doc_lens[i]`` is document i's token count — span offsets are its
    prefix sums, left to the (driver-side, per-pack) consumer.
    """
    s = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(ids_col).alias("ids"))
        )
    )
    return (
        df.groupBy(part_col, pack_col)
        .agg(s.alias("s"))
        .select(
            part_col,
            pack_col,
            F.size("s").alias("n_docs"),
            F.transform("s", lambda x: x.o).alias("doc_ids"),
            F.transform("s", lambda x: F.size(x.ids)).alias("doc_lens"),
            F.flatten(F.transform("s", lambda x: x.ids)).alias("input_ids"),
        )
    )


def deterministic_shuffle_key(key: Column | str, seed: int = 0) -> Column:
    """Training-order randomization that survives retries: a pseudo-random
    but fully deterministic sort key (``xxhash64(seed, key)``). Order by it
    (or pass as ``write_sharded``'s order column) to get a reproducible
    global shuffle of the corpus — ``ORDER BY rand()`` changes across task
    retries and reruns, which silently breaks resumable training-data
    builds. Different ``seed`` → an independent permutation per epoch."""
    c = F.col(key) if isinstance(key, str) else key
    return F.xxhash64(F.lit(seed), c)
