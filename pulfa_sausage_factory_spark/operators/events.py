"""Event-time operators over the ``events`` table (SURVEY.md §2.j extension,
X5, X7): tumbling windows, sessionization, JSON access, approx aggregates.

Batch formulations here; ``streaming/`` holds the Structured Streaming
equivalents (watermark + ``F.window``/``F.session_window``). The batch
sessionization below (lag-gap + running sum) produces the same sessions as
``F.session_window`` for gap-based sessions, and is exactly expressible in
ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_as_timestamp(events: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP. Parquet µs-without-tz
    arrives as TIMESTAMP_NTZ on vanilla Spark 4 sessions, and instant-based
    functions (``unix_micros``) and ``withWatermark`` reject NTZ.
    ``io.load_table`` already normalizes driver tables; this guards frames
    built elsewhere. No-op (no plan node added) when already TIMESTAMP."""
    if isinstance(events.schema[col].dataType, T.TimestampNTZType):
        return events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregate (F.window is epoch-aligned, so
    ``date_trunc('hour')`` reproduces the 1-hour case in the oracle)."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-exact sum cast back to double: bit-identical across
            # engines regardless of accumulation order (oracle parity)
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) event-time window aggregate via ``F.window(ts,
    size, slide)``. Each event lands in ``size/slide`` overlapping windows —
    Spark expands that fan-out JVM-side before the partial aggregation, so
    the shuffle carries pre-combined per-(window, type) rows, not raw events.
    Epoch-aligned like the tumbling case, so an oracle can reproduce the
    window starts arithmetically."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Returns one row per
    session with bounds and counts.

    Scale: one shuffle on ``user_id``; per-user state is a sorted pass
    (window functions), so skewed users are the only hotspot — at 100 TB
    those get salted pre-aggregation or the Structured Streaming
    ``session_window`` path which spills state to the state store.
    """
    events = _ts_as_timestamp(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-precision gap (unix_timestamp truncates to seconds)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    with_start = events.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_no", F.sum("is_new").over(w))
    return (
        with_start.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


def json_props(events: DataFrame) -> DataFrame:
    """X5 — semi-structured access: extract ``$.k`` from the JSON ``props``
    column and aggregate. ``get_json_object`` is JVM-side (Jackson), no UDF."""
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def event_profile(events: DataFrame) -> DataFrame:
    """X5+X7+A9 — one-pass exact profile per event_type: JSON ``$.k``
    aggregates (JVM-side ``get_json_object``), exact distinct users, and
    exact percentiles. One shuffle on event_type for all three surfaces.

    Exact percentile buffers each group's values in the agg state — correct
    here because event_type cardinality is tiny; the unbounded-cardinality
    scale path is ``approx_profile`` (mergeable sketches, fixed memory)."""
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def approx_profile(events: DataFrame) -> DataFrame:
    """X7 — approximate distinct/quantiles per event_type. HLL++ and
    KLL-style sketches are mergeable → partial aggregation, one shuffle of
    sketch bytes, never of raw values. (Approx values are engine-specific
    — the portable twin below is the oracle-checked surface; this one is
    pinned by a tolerance-vs-exact test.)"""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99]).alias("value_quantiles"),
    )


def approx_profile_portable(
    events: DataFrame, k: int = 64, sample_mod: int = 10
) -> DataFrame:
    """X7 (portable variant) — the same approximate profile built from
    engine-portable, deterministic approximation algorithms, so a DuckDB
    oracle reproduces every output bit-for-bit:

    - **KMV distinct sketch** (k-minimum-values): md5-hash each user id to
      a 60-bit integer, keep each type's k-th smallest distinct hash;
      ``est ≈ (k-1) · 2^60 / h_k``. KMV is mergeable (min-k of a union =
      min-k of merged min-k sets), so at 100 TB it partial-aggregates
      exactly like HLL — the shuffle carries k hashes per group, never
      raw ids. Exact below k distinct (the estimator returns the count).
    - **Deterministic-sample quantiles**: exact interpolated percentiles
      over the ~1/``sample_mod`` hash-bucket sample of events (same
      retry-stable rule as ``sampling.deterministic_sample``) — the
      classic sample-quantile estimator with a reproducible sample.

    All arithmetic is integer-derived (md5 → BIGINT, one double division
    with exactly-representable operands), hence identical across engines
    and partitionings."""
    h_user = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        events.select("event_type", h_user.alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
        )
        .select(
            "event_type",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(F.lit(float((k - 1) * (1 << 60))) / F.col("kth"))
            .alias("est_users"),
        )
    )
    h_event = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    quants = (
        events.filter(F.pmod(h_event, F.lit(sample_mod)) == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
    )
    return kmv.join(quants, "event_type")
