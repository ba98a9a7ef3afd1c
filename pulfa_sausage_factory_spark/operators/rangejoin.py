"""Binned range join — point-in-interval matching without a cross join
(extension surface; SURVEY.md §2.c cites the reference needs no range
joins, so this is the engine's own analytic addition).

Spark's optimizer turns a bare range predicate join into
BroadcastNestedLoop (fine when one side broadcasts) or a cartesian (fatal
at scale). The binned formulation keeps it an equi-join:

  1. choose ``bin`` = the maximum interval width;
  2. each interval [s, e) covers ceil((e-s)/bin)+1 consecutive bins →
     explode intervals to one row per covered bin (bounded fan-out,
     because bin ≥ width means ≤ 2 bins per interval);
  3. each point belongs to exactly one bin → equi-join on the bin id;
  4. re-check the exact predicate s <= p < e.

Cost: one hash shuffle on the bin id, candidate count = points × the
intervals sharing their bin (output-sensitive), never |P|·|I|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= point < end``. ``bin_seconds`` must be >= the largest
    interval width (asserted at plan-build time via a runtime check column
    is NOT possible — callers own the invariant; intervals wider than the
    bin would silently miss matches, so the exact-predicate recheck is
    paired with a width guard)."""
    p_bin = (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("long")
    s_bin = (F.unix_timestamp(F.col(start_ts)) / bin_seconds).cast("long")
    e_bin = (F.unix_timestamp(F.col(end_ts)) / bin_seconds).cast("long")

    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(s_bin, e_bin)),  # ≤ 2 bins when width ≤ bin_seconds
    )
    joined = p.join(i, "_bin", how).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("_bin")


def interval_width_ok(intervals: DataFrame, start_ts: str, end_ts: str, bin_seconds: int) -> bool:
    """Caller-side guard for the binning invariant: max interval width must
    not exceed the bin, or matches would be missed."""
    row = intervals.select(
        F.max(
            F.unix_timestamp(F.col(end_ts)) - F.unix_timestamp(F.col(start_ts))
        ).alias("w")
    ).first()
    return row.w is not None and row.w <= bin_seconds
