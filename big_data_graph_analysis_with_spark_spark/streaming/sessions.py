"""Streaming sessionization over an event stream.

The streaming twin of `operators/sessions.sessionize_events`, built on
Spark's native session window (`F.session_window`): a session extends
while events keep arriving within `gap`; the watermark closes and
emits sessions whose gap has expired, bounding state to open sessions
per user. No custom state function needed — session merging is exactly
what the built-in operator does, and it runs identically on batch
DataFrames (the stream ≡ batch test in tests/test_streaming.py).

Semantics notes vs the batch operator: `sessionize_events` numbers a
user's sessions 1..n in time order (a window over the whole history —
inherently batch); the streaming shape keys sessions by their window
instead, because a global per-user ordinal cannot be assigned until
all earlier sessions are closed. Both agree on the session PARTITION
(which events group together) — that is what the tests assert — except
at the exact-gap boundary: the batch operator splits only on
silence STRICTLY GREATER than the gap, while session windows are
half-open `[t, t+gap)`, so a successor exactly `gap` later starts a
new session. Real (µs-resolution) data never lands on the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walk_rates import read_events_stream, with_event_time

__all__ = ["read_events_stream", "session_window_counts"]


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value):
    gap-based sessions via the native session window.

    `events.ts` may be a nanos-long (the testdata convention under
    nanosAsLong) or a timestamp — `with_event_time` normalizes either
    to a µs-truncated event_time, the same granularity contract as the
    batch operator. Pass `watermark=None` for batch DataFrames.
    """
    events = with_event_time(events)
    if watermark is not None:
        events = events.withWatermark("event_time", watermark)
    return (
        events.groupBy(
            "user_id", F.session_window("event_time", gap).alias("w")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
