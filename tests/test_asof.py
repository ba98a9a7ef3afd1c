"""As-of join semantics: backward inclusive, latest-wins, left-join nulls,
tie determinism."""

from __future__ import annotations

import datetime as dt

from pulfa_sausage_factory_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_backward_inclusive_latest_wins(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "e1"), (1, _ts(20), "e2"), (2, _ts(5), "e3")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100, "at-event-ts"),   # equal ts → included (backward inclusive)
            (1, _ts(15), 101, "later"),
            (1, _ts(25), 102, "future"),        # after e2 → never picked
            (3, _ts(1), 103, "other-key"),
        ],
        "k long, ts timestamp, rid int, tag string",
    )
    out = {
        r.ev: (r.rid, r.tag)
        for r in asof_join(
            left, right, "k", "k", "ts", "ts", right_cols=["rid", "tag"],
            tiebreak="rid",
        ).collect()
    }
    assert out["e1"] == (100, "at-event-ts")  # ts equality counts
    assert out["e2"] == (101, "later")        # latest <= e2.ts, not the future row
    assert out["e3"] == (None, None)          # key 2 has no right rows → nulls


def test_asof_duplicate_right_ts_tiebreaks_deterministically(spark):
    left = spark.createDataFrame([(1, _ts(10), "e")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, _ts(5), 7, "lo"), (1, _ts(5), 9, "hi")],
        "k long, ts timestamp, rid int, tag string",
    )
    got = asof_join(
        left, right, "k", "k", "ts", "ts", right_cols=["rid", "tag"], tiebreak="rid"
    ).first()
    assert (got.rid, got.tag) == (9, "hi")  # highest tiebreak wins, always
