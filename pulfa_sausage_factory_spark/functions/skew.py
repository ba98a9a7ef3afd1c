"""Skew-mitigation helpers (SURVEY.md §4: "salting for skew").

AQE's skew-join splitting handles most runtime skew; these helpers cover
the cases it cannot: a *broadcast-ineligible* join where a handful of hot
keys would pin whole partitions to single tasks, and high-cardinality
aggregation under a hot key.

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets — each hot key's rows spread over R
tasks instead of one. Correctness: every big-side row meets exactly one
replica of its key's small-side rows, so the join result multiset is
unchanged (asserted against the plain join in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` buckets.

    big:   gets a per-row pseudo-random salt in [0, salt) — hot keys fan
           out over ``salt`` reducers instead of one.
    small: exploded ×salt (one replica per bucket). Only viable when the
           small side is modest (cost = |small|·salt rows shuffled); for a
           truly tiny side use ``broadcast()`` instead — salting is the
           middle ground where the side is too big to broadcast but small
           enough to replicate.
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("_salt", salt_col.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = big_s.join(small_s, [on, "_salt"], how)
    return joined.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
) -> DataFrame:
    """Hot-key-safe count+sum: phase 1 aggregates (key, salt) partials,
    phase 2 merges per key. Spark's hash aggregate already does map-side
    partials — this adds an extra *reduce-side* split so one hot key's
    merge work is shared by ``salt`` tasks. Use when a single key owns a
    double-digit percentage of all rows."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(value).alias("_s"),
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias(f"sum_{value}"),
    )
