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


def hash_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, BUCKETS): first 8 md5 hex digits of the key →
    int → mod. Uniform for any reasonably-entropic key."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(BUCKETS),
    )


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
