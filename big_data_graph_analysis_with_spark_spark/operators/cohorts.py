"""Cohort / behavioral analytics over the events table: retention
matrices, per-window heavy hitters, and per-user anomaly days.

These extend the engine's event-analysis surface (sessionization,
funnels, transitions in `sessions.py` / `olap.py`) with the remaining
standard product-analytics shapes. All three are pure
`pyspark.sql.functions` plans with **integer-only arithmetic** — days
are epoch-microseconds `div` 86400e6, anomaly thresholds are
cross-multiplied variance comparisons — so the DuckDB oracles
hash-match bit-for-bit (a float mean/stddev would be partition-order
dependent and engine-divergent).

Scale notes (100 TB events):
* `retention_cohorts` — two vertex-key shuffles (per-user first-day,
  per-(user,day) distinct) then an aggregation on the tiny
  (cohort, offset) key space; the user-key join co-partitions with the
  first aggregation, so AQE plans it without a second exchange on the
  big side.
* `topk_per_window` — counts shuffle once on (window, type) with
  map-side combine; the rank window partitions on `window` whose
  cardinality is time-bounded, and k·#windows rows survive.
* `user_anomaly_days` — everything aggregates on the user key; the
  one join (daily counts ⋈ per-user moments) is co-partitioned by
  construction. Skewed power users are absorbed by partial aggregation
  (each map task emits one row per (user, day)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def _days(events: DataFrame) -> DataFrame:
    """(user_id, day): one row per user-active day (epoch day index)."""
    tus = event_micros(events)
    return (
        events.select("user_id", tus.alias("tus"))
        .select("user_id", F.expr(f"tus div {US_PER_DAY}").cast("long").alias("day"))
        .distinct()
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users): classic retention matrix —
    users grouped by their first active day (the cohort), counted on
    each subsequent day-offset they return. Offset 0 is the cohort
    size itself, so `n_users(offset)/n_users(0)` is the retention
    curve."""
    days = _days(events).localCheckpoint(eager=False)
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, on="user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_users",
        )
    )


def topk_per_window(events: DataFrame, k: int = 3) -> DataFrame:
    """(hour, event_type, n_events, rank): the top-`k` event types of
    every tumbling hour, ranked by count with the type string breaking
    ties (total order → the k-boundary is deterministic). `hour` is the
    epoch-hour index (tus div 3600e6)."""
    tus = event_micros(events)
    counts = (
        events.select(tus.alias("tus"), "event_type")
        .select(F.expr(f"tus div {US_PER_HOUR}").cast("long").alias("hour"), "event_type")
        .groupBy("hour", "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy("hour").orderBy(F.col("n_events").desc(), "event_type")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("hour", "event_type", "n_events", F.col("rank").cast("long").alias("rank"))
    )


def active_users(events: DataFrame) -> DataFrame:
    """(day, dau, wau, mau): daily / trailing-7-day / trailing-28-day
    distinct active users per observed day — the canonical engagement
    rollup.

    A windowed countDistinct doesn't exist (distinctness isn't
    decomposable over sliding frames), so the trailing windows use the
    EXPLODE-FORWARD pattern: each (user, active-day) row is fanned out
    to the w report-days whose trailing window contains it
    (day+0 … day+w−1), and a plain per-day distinct count follows —
    turning an impossible window into two ordinary aggregations. Fan-out
    is ×7/×28 of the (user, day) DISTINCT table (already tiny next to
    the event table), with map-side combine absorbing it. Report days
    are restricted to days with ≥1 event, so every row is a real
    calendar day of the dataset (leading partial windows included, the
    standard convention)."""
    days = _days(events).localCheckpoint(eager=False)
    observed = days.select("day").distinct()

    def trailing(w: int, alias: str) -> DataFrame:
        fanned = days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (w - 1))
            ).alias("day"),
        )
        return (
            fanned.join(observed, on="day", how="left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("long").alias(alias))
        )

    dau = days.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    return (
        dau.join(trailing(7, "wau"), on="day")
        .join(trailing(28, "mau"), on="day")
        .select(F.col("day").cast("long").alias("day"), "dau", "wau", "mau")
    )


def interarrival_quantiles(events: DataFrame) -> DataFrame:
    """(p_label, n_gaps, q_gap_us): exact p50/p90/p99 of the gaps
    between a user's consecutive events — the base distribution for
    session-gap tuning and bot screening. One lag window per user
    (hash shuffle on user_id, local sorts), then value-histogram rank
    selection (functions/quantiles) — the only global window runs over
    DISTINCT gap values, never a row-rank of the full gap table."""
    from ..functions.quantiles import histogram_quantiles

    tus = event_micros(events)
    ev = events.select("user_id", "event_id", tus.alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gaps = (
        ev.withColumn("gap", F.col("tus") - F.lag("tus").over(w))
        .filter(F.col("gap").isNotNull())
        .select("gap")
    )
    return histogram_quantiles(
        gaps, "gap", count_alias="n_gaps", value_alias="q_gap_us"
    )


def user_anomaly_days(events: DataFrame, sigmas: int = 2, min_days: int = 3) -> DataFrame:
    """(user_id, day, n_events): the user-days whose event count lies
    more than `sigmas` standard deviations above that user's own daily
    mean — burst detection per entity, the usual first anomaly screen
    on behavioral data.

    The test is evaluated entirely in integer cross-multiplied form:
    with n active days, s = Σc, q = Σc², the condition
    ``c > mean + sigmas·stddev`` (one-sided — bursts, not quiet days)
    is equivalent to::

        n·c − s > 0  AND  (n·c − s)² > sigmas²·(n·q − s²)·n / n
                       ⇔  (n·c − s)² · 1 > sigmas² · (n·q − s²)

    since var·n² = n·q − s². No division, no sqrt → bit-identical in
    Spark and DuckDB. Users with fewer than `min_days` active days are
    skipped (a 1-day history has zero variance)."""
    tus = event_micros(events)
    daily = (
        events.select("user_id", tus.alias("tus"))
        .select("user_id", F.expr(f"tus div {US_PER_DAY}").cast("long").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    moments = daily.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("q"),
    )
    dev = F.col("n") * F.col("n_events") - F.col("s")
    return (
        daily.join(moments, on="user_id")
        .filter(
            (F.col("n") >= min_days)
            & (dev > 0)
            & (dev * dev > sigmas * sigmas * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
        )
        .select("user_id", "day", "n_events")
    )


def type_affinity(events: DataFrame) -> DataFrame:
    """Bipartite projection of the user↔event_type graph onto the type
    side: for each unordered pair of event types, how many distinct
    users engaged with BOTH. The co-engagement signal behind
    "users who did X also did Y" features and mixture design.

    Shape: distinct (user, type) → per-user self-join with type_a <
    type_b → count. The fan-out per user is C(t, 2) where t is the
    number of DISTINCT TYPES that user touched — bounded by the type
    vocabulary (small and fixed), NOT by the user's event count, so a
    billion-event power user costs the same as a ten-event one. One
    distinct shuffle + one join keyed on user_id + one bounded-key agg.
    """
    ut = events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, on="user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_users"))
    )


def type_purity(events: DataFrame) -> DataFrame:
    """(user_id, n_events, hhi_ppm): per-user Herfindahl concentration
    of event types — Σ share² in exact ppm (1e6 = all one type,
    1e6/k = uniform over k types). The integer-exact stand-in for
    behavioral entropy: bot farms pin near 1e6, organic users spread.

    Two nested aggregations on (user, type) then user; Σ share² is
    computed cross-multiplied (`Σ n_t² · 1e6 div n²`) so no division
    happens before the final projection and both engines truncate
    identically. Map-side combinable throughout; no windows."""
    per = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_t")
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.sum("n_t").alias("n_events"),
            F.sum(F.col("n_t") * F.col("n_t")).alias("sum_sq"),
        )
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("sum_sq * 1000000 DIV (n_events * n_events)").alias(
                "hhi_ppm"
            ),
        )
    )


def type_projection(events: DataFrame, max_types_per_user: int = 64) -> DataFrame:
    """(type_a, type_b, n_shared_users): the one-mode projection of the
    user↔event_type bipartite graph — event types linked by how many
    users touch both (type_a < type_b, each pair once). The co-usage
    graph that feeds "users who X also Y" analyses and behavioral
    clustering.

    The per-user fan-out is C(t,2) over that user's DISTINCT types —
    bounded by the type vocabulary, and hard-capped by dropping users
    with more than `max_types_per_user` types (bots/monitors; a user
    touching every type links everything to everything and carries no
    signal). One distinct + one self-join keyed on user_id + one
    aggregation; the projection never touches event payloads.
    """
    # the distinct (user, type) relation feeds the cap aggregate and
    # both self-join sides; a lazy localCheckpoint materializes the
    # scan+distinct shuffle once instead of four times per plan (lazy —
    # no extra job: it fills on the first action, the
    # retention_cohorts pattern)
    ut = (
        events.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    caps = ut.groupBy("user_id").agg(F.count("*").alias("nt"))
    # the capped relation is BOTH self-join sides — checkpoint it too
    # (lazy) so the cap aggregate + semi join run once, not twice
    ut = ut.join(
        caps.filter(F.col("nt") <= max_types_per_user).select("user_id"),
        on="user_id",
        how="semi",
    ).localCheckpoint(eager=False)
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, on="user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("user_id").cast("long").alias("n_shared_users"))
    )


def churned_users(events: DataFrame, split: tuple[int, int] = (1, 2)) -> DataFrame:
    """(user_id, n_days_before, last_day_before): users active in the
    first `split` fraction of the observed day range with NO activity
    after it — the churn cohort a re-engagement pipeline targets, and
    the label generator for churn-prediction training data.

    The cutoff day is exact integer arithmetic on the observed range
    (min + (max−min)·num div den); both halves aggregate to per-user
    day sets once, and churn is one anti join on user_id. Shuffles key
    on user_id only.
    """
    num, den = split
    # (user, day) feeds the range aggregate and both halves of the
    # split — lazy checkpoint so the scan+distinct runs once per action
    # instead of three times (the retention_cohorts pattern)
    d = _days(events).localCheckpoint(eager=False)
    rng = d.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    labeled = d.crossJoin(F.broadcast(rng)).withColumn(
        "cut", F.expr(f"lo + (hi - lo) * {num} div {den}")
    )
    before = labeled.filter(F.col("day") <= F.col("cut"))
    after = labeled.filter(F.col("day") > F.col("cut")).select("user_id").distinct()
    return (
        before.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_days_before"),
            F.max("day").cast("long").alias("last_day_before"),
        )
        .join(after, on="user_id", how="left_anti")
    )
