"""M4 — incremental processing (T1/T2/T4) and event-time streaming windows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pulfa_sausage_factory_spark.io import load_table
from pulfa_sausage_factory_spark.operators import events as ev_ops
from pulfa_sausage_factory_spark.streaming import incremental, windows


def test_available_now_exactly_once(spark, tmp_path):
    """T2/T4: Trigger.AvailableNow + checkpoint → each file processed exactly
    once across successive runs (the .last_run analog)."""
    root = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    root.mkdir()
    (root / "e1.xml").write_text("<a/>")
    (root / "e2.xml").write_text("<b/>")

    seen: list[str] = []

    def batch_fn(df, epoch_id):
        seen.extend(r.path for r in df.select("path").collect())

    incremental.process_available(spark, str(root), ckpt, batch_fn, glob="*.xml")
    assert len(seen) == 2

    # second run, no new files → nothing reprocessed
    incremental.process_available(spark, str(root), ckpt, batch_fn, glob="*.xml")
    assert len(seen) == 2

    # add one file → exactly one more
    time.sleep(1.1)
    (root / "e3.xml").write_text("<c/>")
    incremental.process_available(spark, str(root), ckpt, batch_fn, glob="*.xml")
    assert len(seen) == 3 and any(p.endswith("e3.xml") for p in seen)


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """The streaming tumbling agg over a bounded file stream produces the
    same (window_start, event_type, n_events) as the batch operator."""
    ev = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_parquet")
    ev.write.parquet(staged)

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    agg = windows.tumbling(stream, "1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql("select * from tumbling_test").collect()
    }
    want = {
        (str(r.window_start), r.event_type): r.n_events
        for r in ev_ops.tumbling_counts(ev, "1 hour").collect()
    }
    assert got == want


def test_streaming_sessions_match_batch_sessionize(spark, sf_dir, tmp_path):
    """session_window (streaming) and the lag-gap batch formulation produce
    identical session partitions for gap-based sessions: same number of
    sessions and same per-session event counts per user."""
    ev = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "events_parquet2")
    ev.write.parquet(staged)

    stream = spark.readStream.schema(ev.schema).parquet(staged)
    agg = windows.sessions(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.n_events)
        for r in spark.sql("select * from sessions_test").collect()
    )
    want = sorted(
        (r.user_id, r.n_events)
        for r in ev_ops.sessionize(ev, gap_minutes=30).collect()
    )
    assert got == want
