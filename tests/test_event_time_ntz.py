"""Regression pin for the round-3 TIMESTAMP_NTZ incident.

``events.parquet`` stores TIMESTAMP(µs) without a timezone; a vanilla Spark 4
session (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to true —
the correctness driver's session) infers it as TIMESTAMP_NTZ, which
``unix_micros`` and ``withWatermark`` reject. Round 3 shipped three straight
red rounds of ``t_sessionize`` plus a bench DNF because nothing exercised the
whole event-time surface against an NTZ-inferring session. This file does:
every event-time operator must run, end-to-end, on tables loaded exactly the
way the driver loads them.
"""

from __future__ import annotations

import pytest

from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.operators import events
from pulfa_sausage_factory_spark.streaming import windows as swin


@pytest.fixture(scope="module")
def ntz_spark(spark):
    # Same JVM, fresh SQLConf with NTZ inference explicitly forced on — the
    # driver-session condition, independent of whatever get_spark() sets.
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    return s


def test_fixture_is_ntz_on_vanilla_session(ntz_spark, sf_dir):
    # Precondition for the whole file: the raw read really is NTZ. If the
    # driver ever regenerates the fixture with an instant timestamp this
    # skips (the hazard is gone) rather than fails.
    raw = ntz_spark.read.parquet(f"{sf_dir}/events.parquet")
    if raw.schema["ts"].dataType.simpleString() != "timestamp_ntz":
        pytest.skip("events.ts no longer NTZ on a vanilla session")
    # and load_table normalizes it
    assert (
        load_table(ntz_spark, sf_dir, "events").schema["ts"].dataType.simpleString()
        == "timestamp"
    )


@pytest.mark.parametrize(
    "op",
    [
        lambda ev: events.tumbling_counts(ev, "1 hour"),
        lambda ev: events.sliding_counts(ev, size="1 hour", slide="30 minutes"),
        lambda ev: events.sessionize(ev, gap_minutes=30),
        lambda ev: events.json_props(ev),
        lambda ev: events.event_profile(ev),
        lambda ev: events.approx_profile(ev),
    ],
    ids=["tumbling", "sliding", "sessionize", "json_props", "profile", "approx"],
)
def test_event_time_operator_runs_on_driver_style_session(ntz_spark, sf_dir, op):
    ev = load_table(ntz_spark, sf_dir, "events")
    assert op(ev).count() > 0


@pytest.mark.parametrize(
    "op",
    [
        lambda ev: events.sessionize(ev, gap_minutes=30),
        lambda ev: swin.tumbling(ev),
        lambda ev: swin.sliding(ev),
        lambda ev: swin.sessions(ev),
    ],
    ids=["sessionize", "stream_tumbling", "stream_sliding", "stream_sessions"],
)
def test_event_time_operator_tolerates_raw_ntz_frame(ntz_spark, sf_dir, op):
    # Frames that DIDN'T come through load_table (external callers) must
    # also work: the operators normalize ts themselves. withWatermark on a
    # batch frame is a legal no-op, so the streaming twins are coverable here.
    raw = ntz_spark.read.parquet(f"{sf_dir}/events.parquet")
    if raw.schema["ts"].dataType.simpleString() != "timestamp_ntz":
        pytest.skip("events.ts no longer NTZ on a vanilla session")
    assert op(raw).count() > 0


def test_ts_filter_pushdown_survives_normalization(ntz_spark, sf_dir):
    # the NTZ->TIMESTAMP cast must not cost event-time scans their parquet
    # predicate pushdown — Catalyst unwraps the cast comparison back onto
    # the stored NTZ column (verified: PushedFilters carries the ts range).
    # At 100 TB an un-pushed time-range filter reads the whole table.
    from pyspark.sql import functions as F

    ev = load_table(ntz_spark, sf_dir, "events").filter(
        F.col("ts") >= "2024-01-02 00:00:00"
    )
    plan = ev._jdf.queryExecution().executedPlan().toString()
    if "timestamp_ntz" not in plan:
        pytest.skip("fixture no longer NTZ — unwrap not exercised")
    assert "GreaterThanOrEqual(ts," in plan.split("PushedFilters:")[1].split("]")[0]


def test_sessionize_matches_between_ntz_and_timestamp_inputs(ntz_spark, sf_dir):
    # Value-level pin: sessionizing the raw NTZ frame and the normalized
    # frame must produce identical sessions (the cast is wall-clock
    # preserving under UTC).
    raw = ntz_spark.read.parquet(f"{sf_dir}/events.parquet")
    norm = load_table(ntz_spark, sf_dir, "events")
    a = events.sessionize(raw).orderBy("user_id", "session_no").collect()
    b = events.sessionize(norm).orderBy("user_id", "session_no").collect()
    assert len(a) == len(b) > 0
    assert a == b
