"""Stream-static enrichment join.

The canonical streaming ETL shape Structured Streaming gets for free:
a live event stream LEFT-joined to a batch-computed dimension (here a
per-user profile derived from historical events). The static side is
re-read per micro-batch, so a nightly-refreshed profile table is
picked up without restarting the stream; with a small dimension the
explicit `broadcast()` keeps every micro-batch join shuffle-free —
the stream side never repartitions, which is exactly the property
that matters when the stream is the 100 TB/day side.

Stateless: unlike windowed aggregation there is no streaming state at
all — each micro-batch joins independently, so this composes freely
with watermarked aggregations downstream.

`enrich_events` works identically on a batch DataFrame (same plan
minus the micro-batching), which is what the stream ≡ batch test
asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal-exact historical value thresholds for the profile tiers
TIER_HIGH = 100.0
TIER_MID = 10.0


def user_profiles(events_batch: DataFrame) -> DataFrame:
    """Static dimension: (user_id, hist_events, hist_value, tier) from
    a historical events batch. Decimal sums → deterministic tiers."""
    totals = events_batch.groupBy("user_id").agg(
        F.count("*").cast("long").alias("hist_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("hist_value"),
    )
    return totals.withColumn(
        "tier",
        F.when(F.col("hist_value") >= TIER_HIGH, "high")
        .when(F.col("hist_value") >= TIER_MID, "mid")
        .otherwise("low"),
    )


def enrich_events(events: DataFrame, profiles: DataFrame) -> DataFrame:
    """(event_id, user_id, event_type, value, hist_events, hist_value,
    tier): each event annotated with its user's profile; users absent
    from the dimension get tier='new'. Broadcast left join — the
    (possibly streaming) fact side never shuffles."""
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .join(F.broadcast(profiles), on="user_id", how="left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.coalesce("hist_events", F.lit(0)).cast("long").alias("hist_events"),
            F.coalesce("hist_value", F.lit(0.0)).alias("hist_value"),
            F.coalesce("tier", F.lit("new")).alias("tier"),
        )
    )
