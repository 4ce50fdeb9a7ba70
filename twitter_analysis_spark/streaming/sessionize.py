"""Streaming sessionization: the stateful-operator tier of the engine.

Batch sessionization (catalog.s9_sessionization) answers "what were the
sessions" after the fact; these operators answer it *while the stream
runs*. Two implementations, deliberately:

- ``streaming_sessions``: the idiomatic path — Spark's built-in
  ``session_window`` gap aggregation. State management, merging of
  adjacent windows, and watermark-driven eviction are all handled by
  the engine; this is what you deploy unless semantics demand more.
- ``streaming_sessions_custom``: ``applyInPandasWithState`` — the
  escape hatch for session semantics the built-in can't express
  (per-session event caps, custom close conditions, emitting both the
  first and last event ids). Arrow-batched, one state object per
  user_id group, event-time timeout keyed to the watermark so state is
  dropped exactly when a session can no longer grow.

Both bound state with a watermark: at 100 TB/day of events the state
store holds only sessions that are still open within the lateness
horizon, not the full history.

Reference parity note: the reference has no streaming at all
(SURVEY.md §2.9 — its "stream" is a static file looped in batch,
DataProcessing.ipynb:cell16:11-12); this module is the Spark-native
capability the reference's architecture could never reach.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

#: Event schema for the streaming drop-dir (mirrors the events table).
EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
])


def read_event_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA).json(drop_dir)
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )


def streaming_sessions(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Built-in session-window aggregation: one session row per burst
    of activity separated by >= gap of silence.

    ``session_window`` merges overlapping per-event windows inside the
    state store; the watermark finalizes (and evicts) a session once no
    on-time event can still extend it.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("event_id").alias("first_event_id"),
             F.max("event_id").alias("last_event_id"))
        .select("user_id",
                F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"),
                "n_events", "first_event_id", "last_event_id")
    )


#: Output schema of the custom stateful sessionizer.
SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("first_event_id", LongType()),
    StructField("last_event_id", LongType()),
])

#: State carried per user: open-session accumulator.
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("first_id", LongType()),
    StructField("last_id", LongType()),
])

_GAP_US = 30 * 60 * 1_000_000


def _sessionize_group(key: tuple[Any, ...],
                      pdf_iter: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user stateful kernel: fold arriving events into the open
    session, emit a session row whenever a gap closes one.

    Runs once per (user, trigger); state persists across triggers in
    the state store. Event-time timeout closes the open session when
    the watermark passes last_event + gap.
    """
    (user_id,) = key
    closed: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, first_id, last_id = state.get
            closed.append((user_id, start_us, last_us, n, first_id, last_id))
            state.remove()
    else:
        events: list[tuple[int, int]] = []  # (ts_us, event_id)
        for pdf in pdf_iter:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            events.extend(zip(ts_us.tolist(), pdf["event_id"].tolist()))
        events.sort()

        if state.exists:
            start_us, last_us, n, first_id, last_id = state.get
        else:
            start_us = last_us = n = first_id = last_id = None

        for ts_us, eid in events:
            if start_us is None:
                start_us, last_us, n, first_id, last_id = ts_us, ts_us, 1, eid, eid
            elif ts_us - last_us > _GAP_US:
                closed.append((user_id, start_us, last_us, n, first_id, last_id))
                start_us, last_us, n, first_id, last_id = ts_us, ts_us, 1, eid, eid
            else:
                last_us, n, last_id = ts_us, n + 1, eid
        if start_us is not None:
            state.update((start_us, last_us, n, first_id, last_id))
            # close the open session once the watermark passes last+gap
            state.setTimeoutTimestamp((last_us + _GAP_US) // 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                "n_events": [c[3] for c in closed],
                "first_event_id": [c[4] for c in closed],
                "last_event_id": [c[5] for c in closed],
            }
        )


def streaming_sessions_custom(events: DataFrame,
                              watermark: str = "1 hour") -> DataFrame:
    """Custom stateful sessionizer over ``applyInPandasWithState``.

    Shuffles events to their user's partition, then folds them into
    per-user open-session state; emits one row per *closed* session
    (closed by a gap within the batch, or by event-time timeout when
    the watermark passes). session_end here is the last event time
    (the built-in variant reports last event + gap as the window end).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour",
                    key: str = "event_id") -> DataFrame:
    """Streaming exact deduplication: first arrival of each key wins.

    ``dropDuplicatesWithinWatermark`` dedups on the KEY alone — a replay
    whose timestamp was perturbed in transit still dedups, which the
    older dropDuplicates([key, ts]) formulation missed — while the
    watermark bounds state: a key's entry is evictable once the
    watermark passes its event time + delay (a key recurring later than
    the horizon can be emitted twice — the standard at-least-once dedup
    tradeoff). The streaming face of operators/dedup.exact_dedup for
    ingest pipelines that must not double-count replayed events.
    """
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark([key]))
