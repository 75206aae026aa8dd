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

__all__ = [
    "read_events_stream",
    "windowed_value_hist",
    "windowed_user_activity",
    "wau_rollup",
    "streaming_value_locf",
    "windowed_ks_vs_reference",
    "streaming_bootstrap_sums",
]


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


def streaming_value_locf(events: DataFrame) -> DataFrame:
    """(event_id, user_id, filled_value): the streaming twin of
    `operators/drift.value_locf` — per-user last-observation-carried-
    forward repair of 'error' readings as a CUSTOM STATEFUL operator
    (`applyInPandasWithState`; state = one (has_value, last_good)
    scalar pair per user, the minimal LOCF carry).

    Each micro-batch sorts ITS rows by (ts, event_id) before folding,
    so within a batch the repair order is exact; across batches the
    fold consumes arrival order — the standard streaming LOCF contract
    (event-time-ordered arrival ⇒ exact batch parity, which the
    availableNow single-batch test pins; late data would need timer
    state, deliberately out of scope like the reference's unseeded
    walk accumulator). State is O(1) per user and never grows with
    stream length.
    """
    import pandas as pd  # local: keep module import light

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def fold(key, pdfs, state: GroupState):
        has, last = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            # reset_index: sort_values permutes the pandas index, and
            # pd.DataFrame({...}) ALIGNS series by index — without the
            # reset, an unsorted arrival batch would misalign event_id
            # against the fresh-indexed user_id/filled series (NaN rows)
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            filled = []
            for etype, val in zip(pdf["event_type"], pdf["value"]):
                if etype != "error" and pd.notna(val):
                    has, last = 1, float(val)
                    filled.append(last)
                else:
                    filled.append(last if has else None)
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].astype("int64"),
                    "user_id": pd.Series(
                        [key[0]] * len(pdf), dtype="int64"
                    ),
                    "filled_value": pd.Series(filled, dtype="float64"),
                }
            )
        state.update((has, last))

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="event_id LONG, user_id LONG, filled_value DOUBLE",
        stateStructType="has_value LONG, last_good DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_value_locf_timed(
    events: DataFrame,
    lateness_minutes: int = 10,
    idle_gap_minutes: int = 30,
) -> DataFrame:
    """(event_id, user_id, filled_value): :func:`streaming_value_locf`
    extended with the two timer-state behaviors round 8 documented as
    out of scope — LATE-DATA handling and bounded-lifetime state:

    * A row whose event time is older than its user's observed
      high-water minus `lateness_minutes` is DROPPED instead of
      silently corrupting the carry order (the fold is exact only
      under event-time-ordered arrival; a straggler from before the
      carry point cannot be spliced into an already-emitted timeline).
      The watermark (`lateness_minutes` on event_time) gives Spark the
      same bound globally; the per-user high-water check applies it
      deterministically per key within whatever rows reach the fold.
    * Each user's state carries an EVENT-TIME TIMER `idle_gap_minutes`
      past its high-water. When the watermark passes it, the state is
      flushed as a tombstone row ``event_id = -1`` carrying the final
      LOCF value, then removed — so state is bounded by ACTIVE users,
      not every user ever seen, and downstream consumers get an
      explicit end-of-timeline marker.

    State: (has_value, last_good, hw_us) — still O(1) per user.
    """
    import pandas as pd  # local: keep module import light

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    late_us = lateness_minutes * 60_000_000
    gap_ms = idle_gap_minutes * 60_000

    timed = with_event_time(events).withWatermark(
        "event_time", f"{lateness_minutes} minutes"
    )

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            has, last, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "event_id": pd.Series([-1], dtype="int64"),
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "filled_value": pd.Series(
                        [last if has else None], dtype="float64"
                    ),
                }
            )
            return
        has, last, hw = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            tus = pdf["event_time"].astype("int64") // 1_000
            # reset_index after sort/filter: pd.DataFrame({...}) aligns
            # series by index, so a permuted/gapped index would misalign
            # event_id against the fresh-indexed user/filled series
            pdf = (
                pdf.assign(__tus=tus)
                .sort_values(["__tus", "event_id"])
                .reset_index(drop=True)
            )
            if hw is not None:
                pdf = pdf[pdf["__tus"] >= hw - late_us].reset_index(
                    drop=True
                )
            if pdf.empty:
                continue
            batch_max = int(pdf["__tus"].max())
            hw = batch_max if hw is None else max(hw, batch_max)
            filled = []
            for etype, val in zip(pdf["event_type"], pdf["value"]):
                if etype != "error" and pd.notna(val):
                    has, last = 1, float(val)
                    filled.append(last)
                else:
                    filled.append(last if has else None)
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].astype("int64"),
                    "user_id": pd.Series(
                        [key[0]] * len(pdf), dtype="int64"
                    ),
                    "filled_value": pd.Series(filled, dtype="float64"),
                }
            )
        if hw is not None:
            state.update((has, last, hw))
            # event-time timer: gap past the high-water, clamped above
            # the current watermark (Spark rejects timers in the past)
            state.setTimeoutTimestamp(
                max(hw // 1_000 + gap_ms, state.getCurrentWatermarkMs() + 1)
            )

    return timed.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="event_id LONG, user_id LONG, filled_value DOUBLE",
        stateStructType="has_value LONG, last_good DOUBLE, hw_us LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_ks_vs_reference(
    hist: DataFrame, reference: DataFrame, n_buckets: int = 20
) -> DataFrame:
    """(window_start, n_window, n_ref, d_num, at_bucket): exact
    two-sample KS numerator between each window's value histogram and a
    STATIC reference histogram — the streaming drift gate. `hist` is
    `windowed_value_hist` output (live: read back from the sink; or the
    batch twin directly); `reference` is (bucket, n_ref) built once
    from the reference corpus with the same bucketing. D for window w =
    d_num / (n_window·n_ref), cross-multiplied so the sup is integral —
    the same exact-KS contract as `operators/hypotests.ks_two_sample`.

    Deliberately a BATCH reduction over the (bounded) histogram frame,
    not a streaming stage: a CDF needs an ordered scan of the bucket
    axis, which Structured Streaming's incremental model cannot express
    — and does not need to, because the stream half already reduced the
    unbounded event flow to (open windows × n_buckets) rows. This split
    (stream maintains bounded sufficient state, a cheap batch pass
    reads the gate) is the production drift-monitor shape.

    Missing buckets on either side count zero via the dense
    0..n_buckets−1 spine (clamping in the histogram guarantees no
    bucket outside it).
    """
    # renamed spine key: the spine derives FROM hist, so joining it
    # back on the same attribute would be a conflicting self-reference
    wins = hist.select(F.col("window_start").alias("ws")).distinct()
    spine = wins.crossJoin(
        F.broadcast(
            hist.sparkSession.range(n_buckets).select(
                F.col("id").cast("long").alias("bkt")
            )
        )
    )
    ref = reference.select(
        F.col("bucket").cast("long").alias("bkt"),
        F.col("n_ref").cast("long").alias("n_ref"),
    )
    dense = (
        spine.join(
            hist,
            (spine.ws == hist.window_start) & (spine.bkt == hist.bucket),
            "left",
        )
        .join(F.broadcast(ref), "bkt", "left")
        .select(
            F.col("ws").alias("window_start"),
            F.col("bkt").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_w"),
            F.coalesce("n_ref", F.lit(0)).alias("n_r"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy("bucket")
    full = W.partitionBy("window_start").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = dense.select(
        "window_start",
        "bucket",
        F.sum("n_w").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum_w"),
        F.sum("n_r").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum_r"),
        F.sum("n_w").over(full).alias("n_window"),
        F.sum("n_r").over(full).alias("n_ref"),
    )
    dev = cum.select(
        "window_start",
        "bucket",
        "n_window",
        "n_ref",
        F.abs(
            F.col("cum_w").cast("decimal(38,0)") * F.col("n_ref").cast("decimal(38,0)")
            - F.col("cum_r").cast("decimal(38,0)")
            * F.col("n_window").cast("decimal(38,0)")
        ).alias("d"),
    )
    top = dev.groupBy("window_start").agg(F.max("d").alias("d_num"))
    return (
        dev.join(top, "window_start")
        .filter(F.col("d") == F.col("d_num"))
        .groupBy("window_start")
        .agg(
            F.max("n_window").cast("long").alias("n_window"),
            F.max("n_ref").cast("long").alias("n_ref"),
            F.max("d_num").cast("decimal(38,0)").alias("d_num"),
            F.min("bucket").cast("long").alias("at_bucket"),
        )
    )


def streaming_bootstrap_sums(
    events: DataFrame,
    n_resamples: int = 8,
    window: str = "1 day",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """(window_start, b, n_rows, n_eff, boot_cents): the deterministic
    Poisson(1) bootstrap (`operators/sampling.poisson_bootstrap_sums`)
    as a STREAMING aggregation — per tumbling event-time window, B
    resample totals whose spread is the live error bar on the window's
    revenue. The weight expression (md5-56 inverse-CDF over fixed
    integer thresholds) is a narrow per-row map, so the whole operator
    is explode + windowed groupBy — incrementally computable, state
    bounded by (open windows × B), and byte-replayable against the
    batch twin (`watermark=None` runs the identical plan on a batch
    frame; the stream ≡ batch test pins it).
    """
    from ..functions.hashing import hash56
    from ..operators.sampling import poisson1_thresholds_56

    ev = with_event_time(events)
    if watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    ts = poisson1_thresholds_56()
    cents = F.round(F.col("value") * 100).cast("long")
    exploded = ev.filter(cents.isNotNull()).select(
        "event_time",
        cents.alias("cents"),
        F.col("event_id"),
        F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b"),
    )
    u = hash56(
        F.concat(
            F.col("b").cast("string"),
            F.lit(":"),
            F.col("event_id").cast("string"),
        )
    )
    w = F.lit(len(ts))
    for k in range(len(ts) - 1, -1, -1):
        w = F.when(u < F.lit(ts[k]), F.lit(k)).otherwise(w)
    return (
        exploded.withColumn("w", w)
        .groupBy(F.window("event_time", window).alias("win"), "b")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("boot_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("b").cast("long").alias("b"),
            "n_rows",
            "n_eff",
            "boot_cents",
        )
    )
