"""Distribution-drift and skew diagnostics for training pipelines.

Two monitoring primitives a 100 TB ingest loop runs continuously:

* **value_drift** — compare the value distribution of the first and
  second halves of a time range with an equi-width histogram and
  per-bucket share deltas (the discrete L1 / total-variation view a
  KS-style drift alarm thresholds on). All arithmetic is integer:
  values are lifted to cents (``round(value·100)``), the time split
  is the integer midpoint of [min, max] event time, and shares are
  exact ppm — so the DuckDB twin hash-matches and no float boundary
  can flip a bucket between engines.
* **key_skew_profile** — per-key row counts for the heaviest k keys
  with exact ppm shares of the table. The pre-flight check before any
  join/groupBy on the key: a top key holding >5% of rows is the
  signal to reach for functions/skew salting or AQE skew-join.

Both are one map-side-combinable aggregation keyed on a bounded
domain (buckets / distinct keys) plus a broadcast of 1-row extrema —
no global sorts, no row-rank windows (key_skew_profile's rank window
runs over the top-k rows only, like corpusstats.vocab_coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros


def value_drift(events: DataFrame, n_buckets: int = 20) -> DataFrame:
    """(bucket, n_first, n_second, share_first_ppm, share_second_ppm,
    abs_diff_ppm): equi-width value histogram of the first vs second
    half of the event-time range. Σ abs_diff_ppm / 2e6 is the total
    variation distance the drift alarm thresholds."""
    ev = events.select(
        event_micros(events).alias("tus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents").isNotNull())
    stats = ev.agg(
        F.min("tus").alias("t_lo"),
        F.max("tus").alias("t_hi"),
        F.min("cents").alias("c_lo"),
        F.max("cents").alias("c_hi"),
    )
    bucketed = ev.crossJoin(F.broadcast(stats)).select(
        F.expr("CASE WHEN tus <= (t_lo + t_hi) DIV 2 THEN 0 ELSE 1 END").alias(
            "half"
        ),
        F.expr(
            f"least((cents - c_lo) * {int(n_buckets)}"
            f" DIV (c_hi - c_lo + 1), {int(n_buckets) - 1})"
        ).alias("bucket"),
    )
    # localCheckpoint: totals re-aggregates counts — without it the
    # second branch would re-run the full source scan + bucketing
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.expr("CASE WHEN half = 0 THEN 1 ELSE 0 END")).alias("n_first"),
        F.sum(F.expr("CASE WHEN half = 1 THEN 1 ELSE 0 END")).alias("n_second"),
    ).localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("n_first").alias("t_first"), F.sum("n_second").alias("t_second")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.col("n_first").cast("long").alias("n_first"),
        F.col("n_second").cast("long").alias("n_second"),
        F.expr("n_first * 1000000 DIV t_first").alias("share_first_ppm"),
        F.expr("n_second * 1000000 DIV t_second").alias("share_second_ppm"),
        F.expr(
            "abs(n_first * 1000000 DIV t_first"
            " - n_second * 1000000 DIV t_second)"
        ).alias("abs_diff_ppm"),
    )


def key_skew_profile(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """(heavy_rank, {key_col}, n_rows, share_ppm): the k heaviest keys
    by row count with exact table shares; ties break on the key so
    both engines name the same top set."""
    # localCheckpoint: both the total and the top-k read counts once
    # instead of re-running the source aggregation twice
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_rows")).localCheckpoint(
        eager=False
    )
    total = counts.agg(F.sum("n_rows").alias("total"))
    top = (
        counts.orderBy(F.desc("n_rows"), F.col(key_col).asc())
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.desc("n_rows"), F.col(key_col).asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("heavy_rank"),
        key_col,
        F.col("n_rows").cast("long").alias("n_rows"),
        F.expr("n_rows * 1000000 DIV total").alias("share_ppm"),
    )


def time_profile(events: DataFrame) -> DataFrame:
    """(dow, hod, n_events, share_ppm): event volume by day-of-week ×
    hour-of-day in exact ppm shares — the seasonality fingerprint that
    `value_drift`-style alarms should be compared AGAINST (a Monday
    spike that happens every Monday is not drift).

    Day-of-week comes from pure epoch arithmetic — ``(epoch_day + 4)
    mod 7`` (1970-01-01 was a Thursday; 0 = Sunday) — never from a
    calendar function, so no engine/timezone/locale convention can
    shift a bucket. One aggregation on a 7×24-bounded key."""
    tus = event_micros(events)
    b = events.select(tus.alias("tus")).select(
        F.expr("(tus DIV 86400000000 + 4) % 7").alias("dow"),
        F.expr("(tus DIV 3600000000) % 24").alias("hod"),
    )
    counts = b.groupBy("dow", "hod").agg(F.count("*").alias("n_events")).localCheckpoint(
        eager=False
    )
    total = counts.agg(F.sum("n_events").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hod").cast("long").alias("hod"),
        F.col("n_events").cast("long").alias("n_events"),
        F.expr("n_events * 1000000 DIV total").alias("share_ppm"),
    )


def daily_autocovariance(events: DataFrame) -> DataFrame:
    """(event_type, n_days, sum_c, sum_sq, lag1_dot, lag7_dot): per
    event type, the exact integer inputs to lag-1 and lag-7
    autocorrelation of the daily event-count series — r(L) needs only
    Σc_t, Σc_t², Σc_t·c_{t+L} and n, all BIGINT here, so the engine
    stays hash-exact and the monitor divides (the time_profile
    companion: time_profile says WHEN volume arrives, this says how
    strongly today predicts tomorrow / next week).

    One map-side-combined aggregation collapses the fact table to the
    |types|·|days| daily frame; the lag products are equi-joins of that
    tiny frame against itself on (type, day+L) — absent days are zero
    counts, and 0·c terms vanish, so calendar gaps need no
    densification. Day buckets are integer epoch-day quotients (the
    weekly_active_users convention).
    """
    daily = (
        events.select(event_micros(events).alias("tus"), "event_type")
        .select("event_type", F.expr("tus div 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    base = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )

    def lag_dot(lag: int, name: str) -> DataFrame:
        nxt = daily.select(
            "event_type",
            (F.col("day") - lag).alias("day"),
            F.col("c").alias("c_next"),
        )
        return (
            daily.join(nxt, on=["event_type", "day"])
            .groupBy("event_type")
            .agg(F.sum(F.col("c") * F.col("c_next")).cast("long").alias(name))
        )

    return (
        base.join(lag_dot(1, "lag1_dot"), on="event_type", how="left")
        .join(lag_dot(7, "lag7_dot"), on="event_type", how="left")
        .select(
            "event_type",
            "n_days",
            "sum_c",
            "sum_sq",
            F.coalesce("lag1_dot", F.lit(0)).cast("long").alias("lag1_dot"),
            F.coalesce("lag7_dot", F.lit(0)).cast("long").alias("lag7_dot"),
        )
    )


def value_moments(events: DataFrame) -> DataFrame:
    """(event_type, n_events, sum_cents, sum_sq_cents, min_cents,
    max_cents): per event type, the exact integer moment inputs for
    mean/variance/range of the value column — values lifted to cents
    with the shared ``round(value·100)`` convention, squares summed in
    DECIMAL(38,0) so no corpus size can overflow, both sums cast to
    double once from the same exact integer on either engine. The
    value_drift companion: drift compares WINDOWS, this tracks the
    per-type scale a monitor normalizes by.

    One map-side-combined aggregation on the |types|-bounded key; the
    only shuffled payload is one partial row per (partition, type).
    """
    cents = F.round(F.col("value") * 100).cast("long")
    per = events.select("event_type", cents.alias("c"))
    return per.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("c").cast("decimal(38,0)")).cast("double").alias("sum_cents"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sum_sq_cents"),
        F.min("c").cast("long").alias("min_cents"),
        F.max("c").cast("long").alias("max_cents"),
    )


def daily_gap_fill(events: DataFrame) -> DataFrame:
    """(day, n_events, is_gap): the daily event-count series DENSIFIED
    over the full observed calendar span — days with zero events appear
    as explicit (day, 0, true) rows, which every downstream
    time-series consumer (autocovariance, drift monitors, forecasting
    features) needs but a plain groupBy can never produce.

    The fact table collapses to the bounded daily frame first; the
    calendar axis comes from ONE scalar min/max aggregate exploded via
    sequence() — its size is the calendar span, never the data size —
    and broadcasts into a left join against the daily counts. Epoch-day
    integer quotients keep the bucketing timezone-free and
    oracle-exact.
    """
    daily = (
        events.select(event_micros(events).alias("tus"))
        .select(F.expr("tus div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    span = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    return calendar.join(daily, on="day", how="left").select(
        F.col("day").cast("long").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )


def value_locf(events: DataFrame, bad_type: str = "error") -> DataFrame:
    """(event_id, user_id, filled_value): each event's value with
    `bad_type` readings treated as missing and repaired by
    last-observation-carried-forward within the user's timeline — the
    sensor-repair/gap-fill primitive (last(ignorenulls=True) over an
    ordered per-user frame; a user whose history STARTS with bad
    readings keeps NULL, there is nothing to carry).

    One window over the user partition, ordered by (event-micros,
    event_id) so ties break deterministically cross-engine. The value
    passes through untouched (no arithmetic), so the doubles
    hash-match bit-for-bit. State per task is one scalar per user —
    the streaming twin of this operator is the classic stateful LOCF.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(event_micros(events).alias("tus"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") != bad_type, F.col("value"))
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.last(good, ignorenulls=True).over(w).alias("filled_value"),
    )
