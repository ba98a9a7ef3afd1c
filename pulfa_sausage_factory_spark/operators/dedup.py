"""Deduplication operators (SURVEY.md §2.l X1/X2) — exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (100 TB):
- Exact dedup is one hash-shuffle on the digest (never on the full text —
  group keys stay short).
- N-gram Jaccard never cross-joins: candidate pairs come from an inverted
  shingle index (explode → self-join on shingle), which is the classic
  "prefix filtering" shape; the shingle join key distributes uniformly.
- MinHash LSH buckets by band signature: only same-bucket pairs are
  compared, so the pair count is output-sensitive, not O(n²).
- SimHash reduces each doc to one 64-bit int; near-dup candidates share a
  rotated prefix (here: exact-match grouping as the first cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.functions.text import tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X1 — keep the lowest-id row per distinct text. Grouping key is
    ``md5(text)`` so the shuffle moves digests, not documents; md5 (not
    xxhash64) so the DuckDB oracle reproduces it. Generalizes the
    reference's checksum surface (bin/dao.py:12-17) + J5 skip-guards."""
    w = Window.partitionBy("_digest").orderBy(id_col)
    return (
        df.withColumn("_digest", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_digest", "_rn")
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    r"""Distinct word n-gram shingles per document: (id, shingle).

    Plain single-space split (the corpus delimiter contract, and what the
    DuckDB oracle's ``str_split(lower(text), ' ')`` does) — the regex
    ``\s+`` tokenizer measured ~14x slower on the shingle path."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    # shingle i = tokens[i..i+n-1] joined; guard: docs shorter than n tokens
    # produce no shingles (sequence(1,0) would count *down* in Spark).
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """X2 (exact variant) — all pairs with n-gram-shingle Jaccard >=
    threshold, via an inverted shingle index instead of a cross join:

        explode shingles → self-join on shingle (id_a < id_b)
        → count shared → |A∩B| / (|A|+|B|-|A∩B|)

    Scale: the shingle join is the only shuffle; candidate generation is
    output-sensitive. Skew guard: truly viral shingles can be frequency-capped
    upstream (df-filtering) without changing the >=threshold result set for
    reasonable thresholds; at sf test scale no cap is needed.
    """
    sh = word_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


#: odd multipliers/offsets for permutation hashing, derived from a fixed LCG
#: so signatures are deterministic across runs/partitions.
def _perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    # 31-bit params: a*h+b stays under 2^63 for 31-bit h, so the affine map
    # never overflows a long (Spark 4 runs ANSI mode — overflow would throw)
    state = seed or 1
    out = []
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state >> 33) | 1  # odd 31-bit multiplier
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state >> 33
        out.append((a, b))
    return out


def _minhash_signature(num_hashes: int = 32):
    """Column fn: array<string> shingles → array<bigint> minhash signature.

    One xxhash64 per shingle, then ``num_hashes`` affine permutations
    (a*h + b in 64-bit wraparound) — 32× cheaper than hashing the string
    once per signature row, same independence guarantees in practice."""
    params = _perm_params(num_hashes)

    def _affine(a: int, b: int):
        # closure factory — a default-arg lambda would change pyspark's view
        # of the lambda arity (see simhash64)
        return lambda h: F.lit(a) * h + F.lit(b)

    def sig(base_hashes_col):
        return F.array(
            *[F.array_min(F.transform(base_hashes_col, _affine(a, b))) for (a, b) in params]
        )

    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """X2 — MinHash + banded LSH near-dup candidates, verified by estimated
    Jaccard (signature agreement rate).

    shingle → 32 minhashes → 8 bands of 4 → explode bands → group by
    (band, band-signature) → same-bucket pairs → signature-Jaccard filter.

    Scale: no cross join anywhere; bucket sizes are the only skew surface
    (identical boilerplate docs), handled by AQE skew-join splitting. This is
    the 100-TB path; ``ngram_jaccard_pairs`` is the exact oracle-checkable
    baseline.
    """
    rows_per_band = num_hashes // bands
    toks = F.split(F.lower(F.col(text_col)), " ")
    shingles = F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # signature computation is CPU-bound and narrow; small inputs often
    # arrive as one parquet file → one partition → one core. Spread it.
    par = df.sparkSession.sparkContext.defaultParallelism
    sigs = (
        df.select(F.col(id_col).alias("id"), shingles.alias("sh"))
        .filter(F.size("sh") > 0)
        .repartition(par)
        # separate projection steps: one string-hash pass per shingle, then
        # 32 cheap affine folds over the long array; top-31-bits keeps the
        # affine maps overflow-free under ANSI mode
        .withColumn(
            "base", F.transform("sh", lambda s: F.shiftright(F.xxhash64(s), 33))
        )
        .withColumn("sig", _minhash_signature(num_hashes)("base"))
        .select("id", "sig")
        .cache()
    )
    sigs.count()  # materialize once: the plan is reused by bucketing AND verification
    # bucket key = hash of (band, band-slice of the signature): the self-join
    # shuffles only (id, bucket) pairs, never the 32-long signatures
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # re-attach signatures only for the (few) candidate pairs
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ).cast("double") / F.lit(float(num_hashes))
    return (
        cand.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X2 — 64-bit SimHash per document: per-token xxhash64, sum each bit's
    ±1 votes, sign → bit. One narrow projection, no shuffle. Shift amounts
    must be Python ints (Spark's shiftright takes no Column), so the 64 bit
    votes are unrolled columns."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def _vote(bit: int):
        # closure factory (a default-arg lambda would change the lambda's
        # arity and pyspark would bind the extra param as a lambda variable)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    sim = F.lit(0).cast("long")
    for b in range(64):
        vote = F.aggregate(hashes, F.lit(0), _vote(b))
        # bit 63 is the sign bit: OR with Long.MIN_VALUE sets it
        bit_val = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        sim = sim.bitwiseOR(F.when(vote > 0, bit_val).otherwise(F.lit(0).cast("long")))
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))
