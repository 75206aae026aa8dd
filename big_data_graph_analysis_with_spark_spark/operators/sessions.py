"""Gap-based event sessionization.

The classic clickstream/telemetry shaping step: a user's events belong
to one session until a silence longer than `gap` splits it. One
window pass (lag → flag → running sum) plus one aggregation — both
partitioned by user_id, so the only shuffle is the hash exchange on
user_id and every window sort is per-user-local. At 100 TB this is the
canonical skew case (one bot user = one huge partition): cap it by
pre-splitting pathological users on date before sessionizing, or route
them through functions/skew.salted_keys.

Deterministic: events are ordered by (ts, event_id) — the id breaks
timestamp ties — and the value sum uses the DECIMAL pattern, so the
DuckDB oracle hash-matches. The operator works in MICROSECONDS via
functions/eventtime.event_micros (≡ DuckDB's epoch_us(ts)), whatever
physical type the reader surfaced `ts` in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros

#: default session gap: 30 minutes, in microseconds
DEFAULT_GAP_US = 30 * 60 * 1_000_000


def sessionize_events(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """(user_id, session_id, n_events, start_us, end_us, sum_value):
    per-user sessions split at silences > gap_us. session_id counts a
    user's sessions from 1 in time order."""
    order = Window.partitionBy("user_id").orderBy("tns", "event_id")
    prev = F.lag("tns").over(order)
    flagged = events.select(
        "user_id", "event_id", event_micros(events).alias("tns"), "value"
    ).withColumn(
        "new_s",
        F.when(prev.isNull() | (F.col("tns") - prev > gap_us), 1).otherwise(0),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("tns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", F.sum("new_s").over(run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("tns").cast("long").alias("start_us"),
        F.max("tns").cast("long").alias("end_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events",
        "start_us",
        "end_us",
        "sum_value",
    )


def session_quantiles(
    events: DataFrame, gap_us: int = DEFAULT_GAP_US
) -> DataFrame:
    """(p_label, n_sessions, q_duration_us, q_n_events): exact p50/p90/
    p99 of session duration AND session depth over all sessions — the
    summary a sessionization job is usually run for.

    Composes :func:`sessionize_events` with value-histogram rank
    selection (functions/quantiles): the p = num/den quantile is the
    value at 0-indexed rank ``(cnt−1)·num div den`` — no
    interpolation, bit-identical across engines. Per metric, one
    value-keyed aggregation plus a window over DISTINCT metric values
    (durations/depths repeat heavily) — never a global row-rank of
    the session table."""
    from ..functions.quantiles import histogram_quantiles

    sess = sessionize_events(events, gap_us).select(
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        "n_events",
    )
    out = [
        histogram_quantiles(
            sess.select(metric), metric, count_alias="n_sessions", value_alias=alias
        )
        for metric, alias in (
            ("duration_us", "q_duration_us"),
            ("n_events", "q_n_events"),
        )
    ]
    return out[0].join(out[1].drop("n_sessions"), on="p_label")


def funnel_steps(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """(user_id, steps_completed, t_first_us): ordered-funnel
    progression — how far each user advanced through `steps`, where
    step i+1 only counts if it happens AT OR AFTER the user's earliest
    qualifying step-i event (min-time progression, the standard funnel
    semantics).

    Shape: one filtered aggregation per step chained by equi-joins on
    user_id — k−1 joins total, each frame monotonically shrinking
    (users who reached that depth), no window over the whole event
    history, no UDF. At scale every join keys on user_id and the
    left side is the (small) survivors frame, so AQE broadcasts it
    against the filtered event scan; the event filter on event_type
    pushes down to the parquet scan.
    """
    assert len(steps) >= 1
    ev = events.select(
        "user_id", "event_type", event_micros(events).alias("tus")
    )
    users = ev.select("user_id").distinct()
    prog = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("tus").alias("t0"))
    )
    for i in range(1, len(steps)):
        nxt = (
            ev.filter(F.col("event_type") == steps[i])
            .join(prog.select("user_id", f"t{i - 1}"), on="user_id")
            .filter(F.col("tus") >= F.col(f"t{i - 1}"))
            .groupBy("user_id")
            .agg(F.min("tus").alias(f"t{i}"))
        )
        prog = prog.join(nxt, on="user_id", how="left")
    reached = sum(
        F.col(f"t{i}").isNotNull().cast("int") for i in range(len(steps))
    )
    return users.join(prog, on="user_id", how="left").select(
        "user_id",
        reached.cast("long").alias("steps_completed"),
        F.col("t0").cast("long").alias("t_first_us"),
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """(streak_len, n_users): histogram of each user's LONGEST run of
    consecutive active days — the engagement-depth summary behind
    "day-N streak" retention features (and the long-horizon complement
    of olap.top_inactivity_gaps, which profiles the silences between
    runs).

    Classic gaps-and-islands, shuffled once: distinct (user, epoch-day)
    pairs — partial-distinct combines map-side, so the exchange carries
    at most |users|·|days| rows — then ``day − row_number()`` over the
    per-user day sequence labels each island with a constant, and two
    bounded aggregations (island length → per-user max → histogram)
    reuse the same user-keyed partitioning without re-exchanging. Days
    are pure integer epoch-day quotients (the weekly_active_users
    convention — never calendar functions), so island membership is
    hash-exact cross-engine. The bot-user skew cap documented for
    sessionize_events applies to the same user_id exchange here.
    """
    days = (
        events.select(event_micros(events).alias("tus"), "user_id")
        .select("user_id", F.expr("tus div 86400000000").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("run_len")
    )
    best = runs.groupBy("user_id").agg(F.max("run_len").alias("streak_len"))
    return best.groupBy(F.col("streak_len").cast("long").alias("streak_len")).agg(
        F.count("*").cast("long").alias("n_users")
    )


def user_event_type_diversity(events: DataFrame) -> DataFrame:
    """(n_types, n_users): histogram of behavioral breadth — how many
    users touch exactly `n_types` distinct event types. The working
    set behind engagement tiers (single-feature users vs power users)
    and the activity_streaks companion: streaks measure WHEN users
    show up, this measures HOW WIDELY they act.

    Distinct (user, type) pairs — map-side partial dedup bounds the
    exchange at |users|·|types| rows — then two bounded aggregations
    reusing the user-keyed partitioning. Output is ≤|types| rows.
    """
    pairs = events.select("user_id", "event_type").distinct()
    per_user = pairs.groupBy("user_id").agg(F.count("*").alias("n_types"))
    return per_user.groupBy(
        F.col("n_types").cast("long").alias("n_types")
    ).agg(F.count("*").cast("long").alias("n_users"))


def entry_exit_matrix(events: DataFrame) -> DataFrame:
    """(first_type, last_type, n_users): how users ARRIVE vs how they
    LEAVE — per user, the event type of their first and last event
    (ordered by time with the event id breaking ties), rolled into the
    |types|² entry→exit matrix. The funnel-free churn fingerprint: an
    exit column dominated by 'error' tells you why the streak ended.

    One user-keyed aggregation: the (time, id, type) triple's MIN and
    MAX are lexicographic struct extremes — no window, no sort, pure
    map-side-combinable min/max — then a bounded matrix rollup.
    """
    tus = event_micros(events)
    per_user = events.select(
        "user_id", F.struct(tus.alias("t"), "event_id", "event_type").alias("s")
    ).groupBy("user_id").agg(
        F.min("s").alias("first_s"), F.max("s").alias("last_s")
    )
    return per_user.groupBy(
        F.col("first_s.event_type").alias("first_type"),
        F.col("last_s.event_type").alias("last_type"),
    ).agg(F.count("*").cast("long").alias("n_users"))


def type_cooccurrence(events: DataFrame) -> DataFrame:
    """(type_a, type_b, n_user_days): for every unordered event-type
    pair, on how many (user, day) combinations both types occurred —
    the behavioral market-basket matrix (which features are used
    TOGETHER in a session-day) behind cross-feature cohorting.

    Distinct (user, day, type) triples bound the exchange at
    |users|·|days|·|types|; the pair expansion is a self-join within
    the (user, day) group — at most C(|types|, 2) pairs per group, a
    bounded fan-out — and the final rollup key is ≤|types|². Days are
    integer epoch-day quotients (the shared convention).
    """
    triples = (
        events.select(event_micros(events).alias("tus"), "user_id", "event_type")
        .select(
            "user_id",
            F.expr("tus div 86400000000").alias("day"),
            "event_type",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    left = triples.select("user_id", "day", F.col("event_type").alias("type_a"))
    right = triples.select("user_id", "day", F.col("event_type").alias("type_b"))
    return (
        left.join(right, on=["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_user_days"))
    )


def activity_span_hist(events: DataFrame) -> DataFrame:
    """(span_days, n_users): histogram of each user's activity span —
    last active day minus first active day, inclusive endpoints
    implied by +0 (same-day users land in span 0). The lifetime
    companion to activity_streaks: streaks measure density INSIDE the
    span, this measures the span itself (tenure for retention
    denominators).

    One user-keyed MIN/MAX aggregation on integer epoch days (pure
    map-side-combinable extremes — no distinct, no window) and one
    bounded histogram.
    """
    days = events.select(
        event_micros(events).alias("tus"), "user_id"
    ).select("user_id", F.expr("tus div 86400000000").alias("day"))
    per_user = days.groupBy("user_id").agg(
        (F.max("day") - F.min("day")).alias("span_days")
    )
    return per_user.groupBy(
        F.col("span_days").cast("long").alias("span_days")
    ).agg(F.count("*").cast("long").alias("n_users"))


def km_risk_table(events: DataFrame) -> DataFrame:
    """(t_days, n_risk, n_events, n_censored): the Kaplan-Meier risk
    table for time-to-first-purchase — one row per distinct whole-day
    duration at which a conversion or a censoring happens, carrying the
    at-risk count (users whose duration ≥ t). The KM survival estimate
    is Π_{t' ≤ t, event} (1 − n_events/n_risk) — a product of rationals
    the CALLER folds over these exact integer rows; emitting the
    sufficient table instead of the float product keeps the engine
    hash-exact (the established sufficient-statistics discipline).

    Durations: from a user's FIRST event to their FIRST purchase
    (event = 1); users who never purchase are right-censored at the
    corpus observation horizon (global max timestamp, event = 0) — the
    standard single-cohort setup.

    Scale shape: one user-keyed aggregation builds the duration frame,
    the horizon is a 1-row broadcast scalar, and the risk counts ride a
    cumulative window over the bounded distinct-duration histogram
    (suffix count = total − prefix-before).
    """
    tus = event_micros(events)
    per_user = events.select(
        "user_id",
        tus.alias("tus"),
        (F.col("event_type") == "purchase").alias("is_p"),
    ).groupBy("user_id").agg(
        F.min("tus").alias("t0"),
        F.min(F.when(F.col("is_p"), F.col("tus"))).alias("tp"),
    )
    horizon = events.select(tus.alias("tus")).agg(
        F.max("tus").alias("hz")
    )
    durations = per_user.crossJoin(F.broadcast(horizon)).select(
        F.expr(
            "(coalesce(tp, hz) - t0) div 86400000000"
        ).alias("t_days"),
        F.col("tp").isNotNull().alias("event"),
    )
    hist = durations.groupBy("t_days").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(~F.col("event"), 1).otherwise(0)).alias("n_censored"),
    )
    w = Window.orderBy("t_days")
    return hist.select(
        F.col("t_days").cast("long").alias("t_days"),
        (
            F.sum(F.col("n_events") + F.col("n_censored"))
            .over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_censored").cast("long").alias("n_censored"),
    )
