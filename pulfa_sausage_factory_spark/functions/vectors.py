"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.l X3).

Pure Spark higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
no UDF, no shuffle. Accumulation is sequential left-to-right in doubles so a
DuckDB oracle using ``list_sum(list_transform(...))`` produces bit-identical
results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
