"""Streaming value-distribution monitoring over an event stream.

The streaming counterpart of `operators/drift.value_drift`: per
tumbling window, an equi-width histogram of the `value` column in
integer cents. The batch operator derives its bucket range from the
data (a global min/max aggregation) — impossible incrementally, so the
streaming variant takes STATIC bounds, the production shape anyway: a
drift monitor compares against a reference distribution whose range
was fixed when the reference was computed. `windowed_value_hist` with
`watermark=None` runs the identical plan on a batch DataFrame — the
stream ≡ batch equivalence test in tests/test_streaming.py.

State is bounded by (open windows × n_buckets) rows; the watermark
closes windows and caps open-window count regardless of stream
length. Out-of-range values clamp into the edge buckets (never
dropped — a range excursion IS drift worth seeing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walk_rates import read_events_stream, with_event_time

__all__ = ["read_events_stream", "windowed_value_hist", "windowed_user_activity", "wau_rollup"]


def windowed_value_hist(
    events: DataFrame,
    lo_cents: int = 0,
    hi_cents: int = 10_000,
    n_buckets: int = 20,
    window: str = "1 day",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """(window_start, bucket, n_events): equi-width histogram of
    `value` (in cents, clamped to [lo_cents, hi_cents]) per tumbling
    event-time window."""
    assert hi_cents > lo_cents and n_buckets >= 1
    ev = with_event_time(events)
    if watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    span = hi_cents - lo_cents
    cents = F.round(F.col("value") * 100).cast("long")
    clamped = F.greatest(
        F.lit(lo_cents).cast("long"),
        F.least(F.lit(hi_cents).cast("long"), cents),
    )
    bucket = F.least(
        F.expr(f"((clamped_cents - {lo_cents}) * {n_buckets}) div {span}"),
        F.lit(n_buckets - 1).cast("long"),
    )
    return (
        ev.filter(cents.isNotNull())
        .withColumn("clamped_cents", clamped)
        .withColumn("bucket", bucket)
        .groupBy(F.window("event_time", window).alias("w"), "bucket")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("bucket").cast("long").alias("bucket"),
            "n_events",
        )
    )


def windowed_user_activity(
    events: DataFrame,
    window: str = "7 days",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """(window_start, user_id, n_events): per-user event counts per
    tumbling event-time window — the streaming working set behind a WAU
    metric, as ONE stateful aggregation (state = active users per open
    window, exactly the WAU working set; the watermark closes windows
    and releases it).

    A COUNT(DISTINCT user) per window cannot stream as a single
    incremental metric, and chaining a second stateful aggregation on
    top trips Spark's global-watermark correctness check (the rolled-up
    row could emit before late per-user rows arrive). The production
    shape is therefore: this operator in the stream, and the
    dimension-sized :func:`wau_rollup` in the sink/foreachBatch — which
    is also what the stream ≡ batch test does. With `watermark=None`
    the identical plan runs on a batch DataFrame.
    """
    ev = with_event_time(events)
    if watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", window).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "user_id", "n_events"
        )
    )


def wau_rollup(activity: DataFrame) -> DataFrame:
    """(window_start, n_events, n_users): finish the WAU metric from
    :func:`windowed_user_activity` output — a stateless dimension-sized
    rollup meant for the sink side (foreachBatch, a downstream batch
    job, or the memory-sink table in tests)."""
    return activity.groupBy("window_start").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
    )
