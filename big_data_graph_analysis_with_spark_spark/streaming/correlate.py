"""Stream-stream correlation join over the event stream.

The remaining Structured Streaming join shape the other modules don't
cover: TWO unbounded sides (enrich.py joins stream-to-static). Here
purchases join to every click by the same user in the preceding hour —
the attribution primitive. Both sides carry watermarks plus the time-
range predicate, which is exactly what lets Spark bound the join
state: a buffered click can be evicted once the watermark passes its
attribution window, so state is (clicks within horizon), not (all
clicks ever).

`attributed_purchases(events, watermark=None)` runs the identical plan
on a batch DataFrame — the stream ≡ batch equivalence test in
tests/test_streaming.py. Append output mode: a purchase row emits once
its attribution window can no longer change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walk_rates import read_events_stream, with_event_time

__all__ = ["read_events_stream", "attributed_purchases"]


def attributed_purchases(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """(user_id, purchase_id, purchase_time, click_id, click_time,
    value): every (purchase, prior-click-within-horizon) pair per
    user. One stream is filtered to clicks, the other to purchases —
    deriving both sides from the same source stream is fine; Spark
    plans two independent scans with their own watermarks."""
    ev = with_event_time(events)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("click_time"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("purchase_time"),
        "value",
    )
    if watermark is not None:
        clicks = clicks.withWatermark("click_time", watermark)
        purchases = purchases.withWatermark("purchase_time", watermark)
    return purchases.join(
        clicks,
        F.expr(
            f"""
            c_user = user_id AND
            click_time <= purchase_time AND
            click_time >= purchase_time - INTERVAL {horizon}
            """
        ),
    ).select(
        "user_id", "purchase_id", "purchase_time",
        "click_id", "click_time", "value",
    )
