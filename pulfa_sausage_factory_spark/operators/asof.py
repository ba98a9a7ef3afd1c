"""As-of (backward temporal) join — an operator Spark's DataFrame API lacks
natively, composed from union + ordered window (SURVEY.md §2.c notes the
reference needs no theta/as-of joins; this is part of the §2.l extension
surface for event enrichment).

Algorithm (the scale-correct formulation): tag left rows 1 and right rows
0, union on (key, ts), then one window per key ordered by (ts, tag,
right-tiebreak) takes ``last(right_col, ignorenulls=True)`` over the
unbounded-preceding frame — each left row sees the most recent right row
with ``right_ts <= left_ts``. Cost: ONE shuffle on the key + a sorted
window pass. The naive alternative (range theta-join then per-left argmax)
explodes to |L|·|R| candidate pairs per key; this stays |L|+|R|.

Determinism: if the right side can carry duplicate timestamps per key, the
caller must dedupe first (``dedupe_right=True`` keeps the row with the
highest tiebreak column) — otherwise "the" most recent row is ambiguous
and engines may disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    dedupe_right: bool = True,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``right_cols`` of
    the latest ``right`` row with the same key and ``right_ts <= left_ts``
    (nulls when no such row — left-join semantics)."""
    if dedupe_right:
        tb = tiebreak or right_cols[0]
        w_dedup = Window.partitionBy(right_on, right_ts).orderBy(F.col(tb).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    l_cols = left.columns
    l_tagged = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (tag 0) sort before left rows at equal ts → ts equality
    # counts as "already happened" (inclusive backward join)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("_tag") == 1)
        .select(
            *[F.col(c) for c in l_cols],
            *[F.col(f"_filled_{c}").alias(c) for c in right_cols],
        )
    )
