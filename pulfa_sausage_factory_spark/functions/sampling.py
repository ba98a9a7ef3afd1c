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
