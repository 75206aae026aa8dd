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

__all__ = ["read_events_stream", "windowed_value_hist"]


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
