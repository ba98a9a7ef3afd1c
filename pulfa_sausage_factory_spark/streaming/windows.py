"""Event-time streaming aggregations over the ``events`` stream (SURVEY.md
§2.j extension): tumbling/sliding/session windows with watermarked late-data
handling. Batch equivalents live in ``operators/events.py`` (and are the
DuckDB-oracled surface); these run the same logical aggregations under
Structured Streaming with state-store-backed incremental execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import _ts_as_timestamp


def tumbling(stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time counts/sums per event_type; late rows beyond the
    watermark are dropped and their windows finalized (state eviction —
    the property that keeps state bounded at 100 TB/day)."""
    return (
        _ts_as_timestamp(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding(
    stream: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        _ts_as_timestamp(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (``F.session_window`` — dynamic
    window merge in the state store). Batch twin: operators.events.sessionize
    (same sessions for gap-based definitions)."""
    return (
        _ts_as_timestamp(stream).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
