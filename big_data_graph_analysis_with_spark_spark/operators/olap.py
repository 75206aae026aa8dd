"""OLAP window/pivot operators over the events table.

Rolling aggregates: the classic per-entity trailing-window feature
(last-N moving sum/average) as ONE hash shuffle on the entity key with
partition-local window sorts — the same cost shape as sessionization.
Averages are assembled from a DECIMAL sum cast to double, then one
IEEE double division, so the DuckDB oracle hash-matches (decimal→
double casts and +,·,/ round identically in both engines; a native
float AVG would fold in partition order and drift).

Pivot: written as conditional aggregation (`count/sum(CASE WHEN ...)`
per vocabulary value) rather than `groupBy().pivot()`. With an
explicit vocabulary the two are semantically identical, but Spark
lowers `.pivot()` to TWO exchanges (a (key, pivot-col) pre-aggregate,
then a pivotfirst re-aggregate on the key) while the conditional form
is ONE partial-aggregated shuffle on the key — each map task emits one
pre-combined row per group with every pivot column. Verified with
`.explain`; the plan-shape test pins it. The oracle is the same
conditional form in DuckDB (`FILTER (WHERE ...)`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros

#: the testdata's closed event-type vocabulary
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


def rolling_user_stats(events: DataFrame, n_last: int = 3) -> DataFrame:
    """(event_id, user_id, tus, n_window, sum_value, avg_value): each
    event with the trailing-`n_last`-event sum/average of `value` for
    the same user, ordered by (event time, event_id)."""
    ev = events.select(
        "event_id", "user_id", event_micros(events).alias("tus"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(-(n_last - 1), Window.currentRow)
    )
    dec_sum = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    n_win = F.count("*").over(w).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "tus",
        n_win.alias("n_window"),
        dec_sum.cast("double").alias("sum_value"),
        (dec_sum.cast("double") / n_win).alias("avg_value"),
    )


def event_type_pivot(
    events: DataFrame, types: Sequence[str] = EVENT_TYPES
) -> DataFrame:
    """(user_id, n_<type>..., v_<type>...): per-user event counts and
    decimal value sums pivoted into one row per user."""
    aggs = []
    for t in types:
        is_t = F.col("event_type") == F.lit(t)
        aggs.append(F.count(F.when(is_t, 1)).cast("long").alias(f"n_{t}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(is_t, F.col("value").cast("decimal(18,6)"))),
                F.lit(0).cast("decimal(18,6)"),
            )
            .cast("double")
            .alias(f"v_{t}")
        )
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(*aggs)
    )


def user_running_value(
    events: DataFrame, event_type: str = "purchase"
) -> DataFrame:
    """(event_id, user_id, tus, n_so_far, cum_value): each qualifying
    event with the user's RUNNING total of `value` up to and including
    it — the lifetime-value (LTV) curve per user, the
    unbounded-preceding sibling of :func:`rolling_user_stats`'s
    trailing-N window. The decimal running sum keeps the prefix sums
    exact (floats would make each prefix depend on partition order).

    The type filter is pushed to the scan before the one hash shuffle
    on user_id; window sorts are per-user-local."""
    ev = events.filter(F.col("event_type") == event_type).select(
        "event_id", "user_id", event_micros(events).alias("tus"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "tus",
        F.count("*").over(w).cast("long").alias("n_so_far"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("cum_value"),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n): first-order Markov transition counts
    over each user's time-ordered event stream — the user-journey
    matrix. One lag window per user (hash shuffle on user_id, local
    sorts) then a vocabulary-sized aggregation."""
    ev = events.select(
        "user_id", "event_id", event_micros(events).alias("tus"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        ev.withColumn("from_type", prev)
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def recent_events_per_user(events: DataFrame, n: int = 3) -> DataFrame:
    """(user_id, recency_rank, event_id, tus, event_type): each user's
    n most recent events — the latest-N-per-key primitive behind
    feature-store snapshots and "last actions before X" features.

    One window shuffle keyed on user_id; Spark pushes the rank
    predicate into the window sort (running TopNPerGroup /
    rank-limit), so per-user state is an n-row heap, not the user's
    history. Ties break on event_id descending — total order, both
    engines pick identical rows."""
    from ..functions.eventtime import event_micros

    ev = events.select(
        "user_id", "event_id", "event_type", event_micros(events).alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("tus").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") <= n)
        .select(
            "user_id",
            F.col("recency_rank").cast("long").alias("recency_rank"),
            "event_id",
            F.col("tus").cast("long").alias("tus"),
            "event_type",
        )
    )


def user_sequences(events: DataFrame, max_len: int = 100) -> DataFrame:
    """(user_id, seq, n_events): each user's event-type sequence in
    exact time order (ties broken by event_id — a total order, so the
    sequence is deterministic across engines and partitionings), capped
    at the FIRST `max_len` events and space-joined to a string — the
    standard sequence-corpus export (next-event prediction,
    session2vec): one row per user, ready to tokenize like any text
    document or shard with `sampling.shard_assignments`.

    One groupBy on user_id; ordering happens inside the row via
    sort_array over (time, id, type) structs — no window shuffle, and
    map-side partial aggregation keeps hub users' lists growing on one
    reducer only. The cap bounds row width against bot-like users.
    """
    from ..functions.eventtime import event_micros

    tus = event_micros(events)
    packed = events.select(
        "user_id",
        F.struct(
            tus.alias("tus"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        ).alias("p"),
    )
    return (
        packed.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .select(
            "user_id",
            F.array_join(
                F.slice(F.transform(F.col("ps"), lambda s: s["et"]), 1, max_len),
                " ",
            ).alias("seq"),
            F.least(F.size("ps"), F.lit(max_len)).cast("long").alias("n_events"),
        )
    )


def copurchase_pairs(
    lineitem: DataFrame, k: int = 100, min_orders: int = 2
) -> DataFrame:
    """(part_a, part_b, n_orders): top-`k` part pairs by the number of
    orders containing BOTH (a < b; ties → part_a, part_b ASC) — the
    market-basket co-occurrence table driving "bought together"
    recommendations and cross-sell analysis, restricted to pairs seen
    in ≥ `min_orders` baskets.

    Pairs are generated only WITHIN an order via a self-join on
    l_orderkey after a per-order distinct — candidate volume is
    Σ_orders C(parts-in-order, 2), bounded by basket size (single-digit
    in TPC-H-shaped data), never |parts|². The distinct first:
    duplicate lineitems of the same part must not inflate pair counts.
    At 100 TB the orderkey self-join co-locates if lineitem is stored
    orderkey-bucketed; map-side combine collapses hot pairs before the
    (16-byte) pair-keyed shuffle. The min_orders cut prunes the long
    tail before the top-k.
    """
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, on="o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= min_orders)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(k)
    )


def pareto_coverage(
    weighted: DataFrame,
    key_col: str,
    weight_col: str,
    share_num: int = 4,
    share_den: int = 5,
) -> DataFrame:
    """(key, weight, cum_weight): the minimal prefix of keys, taken in
    descending weight order (key ASC on ties), whose cumulative weight
    reaches `share_num/share_den` of the total — the Pareto/ABC cut
    ("which suppliers cover 80% of revenue", "which sources cover 90%
    of tokens") that drives curation and procurement triage.

    `weighted` must already be one row per key (pre-aggregated), so the
    window below sorts |keys| rows, not the fact table. A key is kept
    iff the cumulative weight STRICTLY BEFORE it is < the target, i.e.
    the crossing row is included and everything after it cut — the
    unique minimal covering prefix under the deterministic order. The
    share test is integer cross-multiplication (den·cum_before <
    num·total on decimals), no float division anywhere.

    The total comes from a broadcast single-row aggregate (no
    window-over-() single-partition global frame for the grand total);
    the ordered cumulative window is the one necessarily-global sort,
    and it runs over pre-aggregated keys — at 100 TB that is |suppliers|,
    not |lineitems|. If even |keys| is too large to window, the same
    prefix is computable with a two-pass range-partitioned rank, but a
    dimension-sized frame never needs it.
    """
    w = Window.orderBy(F.col(weight_col).desc(), F.col(key_col).asc())
    total = weighted.agg(F.sum(weight_col).alias("__total__"))
    return (
        weighted.withColumn("cum_weight", F.sum(weight_col).over(w))
        .join(F.broadcast(total))
        .filter(
            (F.col("cum_weight") - F.col(weight_col)) * share_den
            < F.col("__total__") * share_num
        )
        .drop("__total__")
    )
