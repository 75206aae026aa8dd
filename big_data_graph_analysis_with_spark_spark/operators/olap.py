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
from ..functions.joins import maybe_broadcast

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


def part_supplier_variety(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """(p_brand, p_size, supplier_cnt): distinct-supplier variety per
    (brand, size) from OBSERVED lineitems, excluding negative-balance
    suppliers — the TPC-H Q16 shape (anti-join exclusion, then
    COUNT(DISTINCT) over the fact table).

    The exclusion list and the part dim are broadcast (suppliers and
    parts are dimension-sized at every SF); the one shuffle is the
    (p_brand, p_size) aggregate, and countDistinct runs as Spark's
    two-phase partial-distinct — per-partition (brand, size, suppkey)
    dedup BEFORE the exchange, so the shuffle carries at most
    |brands|·|sizes|·|suppliers| rows regardless of fact-table size.
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    p = part.select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(maybe_broadcast(bad), on="l_suppkey", how="left_anti")
        .join(maybe_broadcast(p), on=F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def idle_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str
) -> DataFrame:
    """(nationkey, n_custs, total_acctbal): per-nation count and total
    balance of above-average-balance customers with NO order on/after
    `cutoff` — the TPC-H Q22 shape (broadcast scalar threshold + anti
    join), recency-idle instead of never-ordered.

    The average-balance threshold is a one-row aggregate broadcast to
    every task (no correlated subquery, no second scan per row); the
    anti join's right side is orders date-pruned BEFORE the join, so at
    100 TB the anti-join build input is only the trailing window, and
    with orders custkey-bucketed it degenerates to a co-located probe.
    The threshold is an exact DECIMAL sum with ONE double division so
    the boundary predicate is bit-identical cross-engine.
    """
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count("*").cast("double")).alias(
            "__avg_bal__"
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        customer.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast("double") > F.col("__avg_bal__"))
        .join(recent, on="c_custkey", how="left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").cast("long").alias("n_custs"),
            F.sum(bal).cast("double").alias("total_acctbal"),
        )
    )


def nation_trade_flow(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(supp_nation, cust_nation, year, revenue, n_lineitems): yearly
    discounted revenue between every (supplier nation → customer
    nation) pair, cross-nation flows only — the TPC-H Q7 shape.

    Supplier, customer, and nation dims broadcast; the ONE big shuffle
    is lineitem ⋈ orders on orderkey (co-located when both sides are
    orderkey-bucketed at scale). The cross-nation filter runs as soon
    as both nationkeys are bound, before the nation-name joins, so
    same-nation rows never reach the final aggregate. Revenue is the
    exact DECIMAL(28,4) per-item product summed to DECIMAL(38,4) and
    cast to double once — the cross-engine hash convention.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("year"),
            rev.alias("rev"),
        )
        .join(
            maybe_broadcast(supplier.select("s_suppkey", "s_nationkey")),
            on=F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            maybe_broadcast(customer.select("c_custkey", "c_nationkey")),
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            on="s_nationkey",
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            on="c_nationkey",
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.col("year").cast("long").alias("year"),
        )
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


def order_priority_funnel(
    lineitem: DataFrame, orders: DataFrame, late_days: int = 60
) -> DataFrame:
    """(o_orderpriority, quarter, n_orders, n_late): per order-priority
    per calendar quarter, the total order count and how many of those
    orders contain at least one lineitem shipped more than `late_days`
    after the order date — the full TPC-H Q4 shape (existence
    semi-join per order) extended with the total as denominator, so
    the funnel ("how does lateness trend by quarter and priority")
    reads off one frame with no float division.

    The late flag comes from one per-orderkey aggregation over the
    date-predicate join — lineitem ⋈ orders on orderkey (co-located
    when both are orderkey-bucketed), then MAX(flag) per order; at
    100 TB this is the same single big shuffle as every orderkey
    rollup, and the final (priority, quarter) aggregate is
    dimension-sized with map-side combine.
    """
    quarter = (
        F.year("o_orderdate") * 10 + F.quarter("o_orderdate")
    ).cast("long")
    flagged = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .select(F.col("o_orderkey").alias("late_key"))
        .distinct()
    )
    return (
        orders.join(
            flagged, on=F.col("o_orderkey") == F.col("late_key"), how="left"
        )
        .groupBy("o_orderpriority", quarter.alias("quarter"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count("late_key").cast("long").alias("n_late"),
        )
    )


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    min_qty: int = 300,
    k: int = 100,
) -> DataFrame:
    """(o_orderkey, o_custkey, o_orderdate, sum_qty): the top-`k`
    orders whose total lineitem quantity exceeds `min_qty` — the
    TPC-H Q18 large-volume-order shape (HAVING over a per-order
    rollup, then a deterministic top-k by (sum_qty DESC, orderkey)).

    The quantity rollup is the one orderkey-keyed shuffle (map-side
    combined; co-located against orders when both are orderkey-
    bucketed); the HAVING cut runs BEFORE the join back to orders, so
    only qualifying orders (a tiny fraction under any realistic
    threshold) are joined and sorted — the top-k sort input is the
    filtered survivors, never the order table. Quantities sum as
    DECIMAL(18,2) so the threshold and the ordering are exact.
    """
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_qty_d")
        )
        .filter(F.col("sum_qty_d") > min_qty)
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(qty, on=F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty_d").desc(), "o_orderkey")
        .limit(k)
    )


def small_lot_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """(p_brand, n_small_lots, revenue): per brand, the count and
    discounted revenue of lineitems whose quantity is below 1/5 of
    that part's average lineitem quantity — the TPC-H Q17
    small-lot shape (per-part average threshold joined back to the
    fact table), summarized per brand instead of the single global
    scalar so the hash check has real rows.

    The per-part average is never materialized as a float: the
    predicate `qty < avg(qty)/5` is cross-multiplied to
    `5·n·qty < sum` on exact decimals. Two passes over lineitem
    (per-part sums, then the re-join) keyed on partkey — both
    co-located if lineitem is partkey-bucketed for this pipeline; the
    per-part frame is dimension-sized, so AQE broadcasts it. Brand
    rollup is dimension-sized with map-side combine.
    """
    qd = F.col("l_quantity").cast("decimal(18,2)")
    per_part = (
        lineitem.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(qd).cast("decimal(38,2)").alias("qty_sum"),
            F.count("*").cast("long").alias("qty_n"),
        )
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    small = (
        lineitem.select("l_partkey", qd.alias("qty"), rev.alias("rev"))
        .join(maybe_broadcast(per_part), on=F.col("l_partkey") == F.col("pk"))
        .filter(
            F.col("qty") * 5 * F.col("qty_n") < F.col("qty_sum")
        )
    )
    return (
        small.join(
            maybe_broadcast(part.select("p_partkey", "p_brand")),
            on=F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_small_lots"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def top_inactivity_gaps(events: DataFrame, k: int = 100) -> DataFrame:
    """(user_id, gap_us, gap_end_event): the `k` longest per-user
    inter-event gaps corpus-wide (ties → user_id, event_id ASC) — the
    churn-risk / session-boundary audit that shows whether a proposed
    session gap threshold sits in the distribution's knee.

    One user-keyed shuffle for the LAG window (identical cost shape to
    sessionization), then a global top-k on the (tiny) per-event gap
    frame via orderBy+limit — Spark runs that as TakeOrdered (per-
    partition heaps + driver merge of k·partitions rows), never a full
    sort of the event table.
    """
    from ..functions.eventtime import event_micros

    ev = events.select(
        "user_id", "event_id", event_micros(events).alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        (F.col("tus") - F.lag("tus").over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.select(
            "user_id",
            F.col("gap_us").cast("long").alias("gap_us"),
            F.col("event_id").alias("gap_end_event"),
        )
        .orderBy(F.col("gap_us").desc(), "user_id", "gap_end_event")
        .limit(k)
    )


def supplier_leadtime_quantiles(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """(suppkey, p_label, n_items, q_lead_days): exact p50/p90/p99 of
    per-supplier order-to-ship lead time (days between o_orderdate and
    l_shipdate) — the supplier-SLA audit, computed with the shared
    value-histogram rank selection (functions/quantiles) instead of a
    per-supplier sort: the quantile window runs over DISTINCT
    (supplier, lead-day) values, bounded by suppliers × the few
    thousand possible day counts, not by lineitem rows.

    The lineitem ⋈ orders shuffle on orderkey is the one fact-sized
    exchange (co-located when both are orderkey-bucketed); everything
    after is histogram-sized. Lead time is an integer day difference —
    no timestamp arithmetic hazards cross-engine.
    """
    from ..functions.quantiles import histogram_quantiles

    lead = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("long")
            .alias("lead_days"),
        )
    )
    return histogram_quantiles(
        lead,
        "lead_days",
        count_alias="n_items",
        value_alias="q_lead_days",
        group_cols=["suppkey"],
    )


def weekly_active_users(events: DataFrame) -> DataFrame:
    """(week_bucket, n_events, n_users): event volume and DISTINCT
    active users per 7-day epoch bucket — the WAU trendline. The bucket
    is `epoch_day div 7` (pure integer arithmetic on the microsecond
    timestamp), NOT a calendar week number: ISO-week conventions differ
    subtly across engines, an integer day quotient cannot.

    countDistinct runs as the two-phase partial distinct — per-partition
    (bucket, user) dedup before the exchange — so the shuffle carries at
    most |buckets|·|users| rows at any corpus size.
    """
    from ..functions.eventtime import event_micros

    return (
        events.select(event_micros(events).alias("tus"), "user_id")
        .select(
            F.expr("(tus div 86400000000) div 7").cast("long").alias(
                "week_bucket"
            ),
            "user_id",
        )
        .groupBy("week_bucket")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


#: TPC-H Q19-style disjunctive predicate branches over the synthetic
#: brand vocabulary: (branch label, brand, qty_lo, qty_hi)
DISJUNCTIVE_BRANCHES: tuple[tuple[str, str, int, int], ...] = (
    ("b12_small", "Brand#12", 1, 11),
    ("b23_mid", "Brand#23", 10, 20),
    ("b34_large", "Brand#34", 20, 30),
)


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    branches: tuple[tuple[str, str, int, int], ...] = DISJUNCTIVE_BRANCHES,
) -> DataFrame:
    """(branch, n_items, revenue): discounted revenue per disjunct of a
    TPC-H Q19-style OR-of-ANDs predicate ((brand, quantity-range)
    pairs) — reported per branch rather than Q19's single scalar so
    the hash check has one row per disjunct.

    The brand dim is broadcast; the OR predicate collapses to one scan
    of lineitem with the combined filter pushed below the join (each
    branch's quantity range prunes row-groups via parquet min/max
    stats — a disjunction of range predicates is exactly what
    predicate pushdown is for). A lineitem matching several branches
    counts in each, which keeps branch rows independent (and the
    semantics trivially parallel).
    """
    qd = F.col("l_quantity").cast("decimal(9,2)")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    joined = lineitem.join(
        maybe_broadcast(part.select("p_partkey", "p_brand")),
        on=F.col("l_partkey") == F.col("p_partkey"),
    ).select("p_brand", qd.alias("qty"), rev.alias("rev"))
    out = None
    for label, brand, lo, hi in branches:
        b = (
            joined.filter(
                (F.col("p_brand") == brand)
                & (F.col("qty") >= lo)
                & (F.col("qty") <= hi)
            )
            .agg(
                F.count("*").cast("long").alias("n_items"),
                F.coalesce(
                    F.sum("rev").cast("double"), F.lit(0.0)
                ).alias("revenue"),
            )
            .select(F.lit(label).alias("branch"), "n_items", "revenue")
        )
        out = b if out is None else out.unionAll(b)
    return out


def cheapest_supplier_per_part(lineitem: DataFrame) -> DataFrame:
    """(partkey, suppkey, min_price): for every part observed in the
    fact table, the supplier offering its single cheapest lineitem
    (ties → smallest suppkey) — the TPC-H Q2 minimum-cost-supplier
    shape re-expressed over observed prices (this corpus has no
    partsupp table).

    One (part, supplier) pre-aggregate takes each pair's MIN price
    map-side (the shuffle carries |part×supp observed| rows, not
    lineitems), then a per-part argmin window over that pair frame —
    dimension-sized, never a window over the fact table. Price
    comparisons are on DECIMAL(18,2) so ordering is exact.
    """
    pd_ = F.col("l_extendedprice").cast("decimal(18,2)")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey", pd_.alias("price"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price").alias("pair_min"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("pair_min").asc(), F.col("l_suppkey").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("pair_min").cast("double").alias("min_price"),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """(cust_region, year, supp_nation, revenue, region_total): yearly
    discounted revenue each supplier nation earns inside each customer
    region, alongside that (region, year) market total — the TPC-H Q8
    national-market-share shape with numerator and denominator exposed
    as columns instead of a float division (the order_priority_funnel
    convention: consumers divide, the engine stays hash-exact).

    The ONE fact-sized shuffle is lineitem ⋈ orders on orderkey
    (co-located when both sides are orderkey-bucketed at 100 TB);
    supplier, customer, nation, and region dims broadcast. The market
    total is a window SUM over the already-aggregated (region, year,
    nation) frame — |regions|×|years|×|nations| rows, never the fact
    table. Revenue is the exact DECIMAL(28,4) per-item product summed
    to DECIMAL(38,4) and cast to double once.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    cust_region = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_regionkey").alias("r_regionkey"),
            )),
            on="c_nationkey",
        )
        .join(
            F.broadcast(region.select("r_regionkey", F.col("r_name").alias("cust_region"))),
            on="r_regionkey",
        )
        .select("c_custkey", "cust_region")
    )
    supp_nation = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )),
        on="s_nationkey",
    ).select("s_suppkey", "supp_nation")
    grouped = (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("year"),
            rev.alias("rev"),
        )
        .join(maybe_broadcast(supp_nation), on=F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              on=F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_region), on=F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("cust_region", F.col("year").cast("long").alias("year"), "supp_nation")
        .agg(F.sum("rev").alias("rev_dec"))
    )
    w = Window.partitionBy("cust_region", "year")
    return grouped.select(
        "cust_region",
        "year",
        "supp_nation",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("region_total"),
    )


def supplier_nation_margin(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(nation, year, revenue, retail_cost, n_items): per supplier
    nation per ship year, discounted revenue and the retail-priced cost
    of goods shipped (Σ p_retailprice · l_quantity) — the TPC-H Q9
    product-profit shape with the profit's two terms exposed as exact
    columns (this corpus has no ps_supplycost; retail cost is the
    deterministic stand-in, and consumers subtract).

    Supplier, part, and nation dims broadcast; lineitem is aggregated
    in one pass with no fact-fact join at all (year and suppkey are on
    the fact row; partkey binds the broadcast retail price), so the
    only shuffle is the final |nations|×|years| group — at 100 TB this
    is a map-side-combined scan. Both money columns are DECIMAL sums
    cast to double once.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        lineitem.select(
            "l_suppkey", "l_partkey",
            F.year("l_shipdate").alias("year"),
            rev.alias("rev"),
            F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        )
        .join(maybe_broadcast(part.select("p_partkey", "p_retailprice")),
              on=F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supplier.select("s_suppkey", "s_nationkey")),
              on=F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("nation"),
        )), on="s_nationkey")
        .withColumn("cost", (
            F.col("p_retailprice").cast("decimal(18,2)") * F.col("qty")
        ).cast("decimal(28,4)"))
        .groupBy("nation", F.col("year").cast("long").alias("year"))
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("cost").cast("double").alias("retail_cost"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def top_supplier_by_quarter(
    lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """(quarter, suppkey, s_name, total_revenue): for every calendar
    quarter (year·10 + q), the supplier(s) with the maximum discounted
    revenue in that quarter, ties kept — the TPC-H Q15 top-supplier
    shape generalized to all quarters at once.

    One map-side-combined aggregate takes the fact table down to the
    (supplier, quarter) frame; the max-selection is a rank window over
    that dimension-sized frame (|suppliers|×|quarters| rows), never the
    fact table, and the supplier name binds by broadcast after the
    cut. Revenue comparisons happen on the exact DECIMAL sum — the
    double cast is last, so ties are decided exactly.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    per_quarter = (
        lineitem.select(
            "l_suppkey",
            (F.year("l_shipdate").cast("long") * 10
             + F.quarter("l_shipdate").cast("long")).alias("quarter"),
            rev.alias("rev"),
        )
        .groupBy("quarter", "l_suppkey")
        .agg(F.sum("rev").alias("rev_dec"))
    )
    w = Window.partitionBy("quarter").orderBy(F.col("rev_dec").desc())
    return (
        per_quarter.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .join(maybe_broadcast(supplier.select("s_suppkey", "s_name")),
              on=F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "quarter",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def monthly_revenue_growth(orders: DataFrame) -> DataFrame:
    """(month, revenue, prev_revenue, n_orders): total order revenue per
    calendar month (year·100 + month) with the previous month's total
    alongside (NULL on the first month) — the month-over-month growth
    frame with numerator and denominator exposed, no float division.

    The fact table collapses to |months| rows in one map-side-combined
    aggregate; the LAG window runs over that tiny frame on a single
    partition — acceptable because the frame is bounded by the
    calendar, not the data (a century is 1,200 rows). Revenue is the
    exact DECIMAL(18,2) sum cast to double once, and the lag is taken
    on the DECIMAL so both columns come from the same exact total.
    """
    monthly = (
        orders.select(
            (F.year("o_orderdate").cast("long") * 100
             + F.month("o_orderdate").cast("long")).alias("month"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("month")
        .agg(
            F.sum("price").alias("rev_dec"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.lag("rev_dec").over(w).cast("double").alias("prev_revenue"),
        "n_orders",
    )


def customer_acquisition(orders: DataFrame) -> DataFrame:
    """(month, n_new, cum_customers): how many customers place their
    FIRST-ever order in each calendar month, and the running total of
    acquired customers — the cohort-acquisition curve.

    Two cheap aggregates: MIN(order month) per customer (one shuffle on
    custkey, map-side combined; co-located when orders is
    custkey-bucketed), then a count per first-month; the cumulative sum
    is a window over the |months|-sized frame. Everything is integer
    arithmetic — hash-exact by construction.
    """
    first_month = (
        orders.select(
            "o_custkey",
            (F.year("o_orderdate").cast("long") * 100
             + F.month("o_orderdate").cast("long")).alias("month"),
        )
        .groupBy("o_custkey")
        .agg(F.min("month").alias("month"))
    )
    monthly = first_month.groupBy("month").agg(
        F.count("*").cast("long").alias("n_new")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_customers"),
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """(r_bucket, f_bucket, n_customers, monetary): the RFM
    (recency / frequency / monetary) segmentation grid — customers
    binned by bit-length buckets of days-since-last-order (recency,
    against the corpus-wide latest order date) and of lifetime order
    count (frequency), with the exact DECIMAL lifetime spend summed
    per cell — the marketing-segmentation working set (which cells to
    re-engage, which to protect) as a |buckets|²-sized frame.

    One custkey-keyed aggregation collapses the fact table to a row
    per customer (map-side combined; co-located when orders are
    custkey-bucketed); the corpus max date is a one-row aggregate
    broadcast to every task; the final grid rollup aggregates the
    per-customer frame by two small integer keys. Bit-length buckets
    use the shared `length(conv(x, 10, 2))` ≡ DuckDB `length(bin(x))`
    convention (degree_clustering/joint_degree_profile), making cell
    membership hash-exact cross-engine; monetary is DECIMAL(18,2)
    summed and cast to double once.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
    )
    maxd = orders.agg(F.max(F.to_date("o_orderdate")).alias("__max_day__"))
    return (
        per_cust.join(F.broadcast(maxd))
        .withColumn("rec_days", F.datediff(F.col("__max_day__"), F.col("last_day")))
        .groupBy(
            F.length(F.conv(F.col("rec_days"), 10, 2)).cast("long").alias("r_bucket"),
            F.length(F.conv(F.col("freq"), 10, 2)).cast("long").alias("f_bucket"),
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("spend").cast("double").alias("monetary"),
        )
    )


def part_catalog_rollup(part: DataFrame) -> DataFrame:
    """(brand, type, n_parts, retail_total, size_total): the part
    catalog aggregated at every ROLLUP level — (brand, type) leaves,
    per-brand subtotals, and the grand total — with rolled-up levels
    labeled 'ALL' instead of NULL so the frame is join- and
    hash-friendly (NULL grouping keys hash/compare differently across
    engines; a sentinel string doesn't). The catalog-browse /
    assortment-audit frame: every drill path precomputed in one pass.

    Spark's native `rollup` runs the three grouping sets in ONE
    Expand + aggregate over the (dimension-sized) part table — no
    per-level rescans; all outputs are exact (integer counts and
    sums, the DECIMAL retail total cast to double once). GROUPING()
    masks distinguish a real NULL brand from a rolled-up level, so
    the 'ALL' relabel is exact even on dirty dimensions.
    """
    return (
        part.rollup("p_brand", "p_type")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("retail_total"),
            F.sum("p_size").cast("long").alias("size_total"),
            F.grouping("p_brand").alias("__gb__"),
            F.grouping("p_type").alias("__gt__"),
        )
        .select(
            F.when(F.col("__gb__") == 1, F.lit("ALL"))
            .otherwise(F.col("p_brand"))
            .alias("brand"),
            F.when(F.col("__gt__") == 1, F.lit("ALL"))
            .otherwise(F.col("p_type"))
            .alias("type"),
            "n_parts",
            "retail_total",
            "size_total",
        )
    )


def nation_revenue_trend(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """(nation, quarter, revenue, prev_revenue, n_orders): per customer
    nation per calendar quarter, the exact order-revenue total with
    the nation's previous quarter alongside — the per-market
    monthly_revenue_growth refinement (quarter-over-quarter trend by
    geography, numerator pairs exposed, consumers divide).

    customer and nation broadcast onto the orders scan (no fact-sized
    shuffle for the dimension binding); the fact collapses map-side to
    the |nations|·|quarters| frame before the single LAG window, whose
    partitions are nation-sized — never data-sized. The quarter key is
    the integer yyyy·10+q; LAG runs over the exact DECIMAL sum and
    both columns cast to double once.
    """
    cust_nation = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="c_nationkey",
    ).select(F.col("c_custkey").alias("o_custkey"), "nation")
    grouped = (
        orders.select("o_custkey", "o_totalprice", "o_orderdate")
        .join(maybe_broadcast(cust_nation), on="o_custkey")
        .groupBy(
            "nation",
            (F.year("o_orderdate") * 10 + F.quarter("o_orderdate"))
            .cast("long")
            .alias("quarter"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    w = Window.partitionBy("nation").orderBy("quarter")
    return grouped.select(
        "nation",
        "quarter",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.lag("rev_dec").over(w).cast("double").alias("prev_revenue"),
        "n_orders",
    )


def sole_returned_supplier(
    lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """(supplier, n_orders): suppliers who were the ONLY supplier with
    a returned line ('R') in a multi-supplier order, counted per
    supplier — the TPC-H Q21 accountability shape (EXISTS another
    supplier in the order + NOT EXISTS another supplier who also
    failed) re-expressed without correlated subqueries. The testdata
    carries no commit/receipt dates, so "failed" is the return flag;
    the join topology is the point, not the predicate.

    Both EXISTS collapse into ONE orderkey-keyed aggregation: lineitem
    groups to (orderkey, suppkey, had_return), then per order counts
    suppliers and returners; a supplier qualifies where had_return AND
    n_suppliers ≥ 2 AND n_returners = 1. Two shuffles on orderkey
    (co-located when lineitem is orderkey-bucketed at 100 TB), one
    suppkey-keyed count, supplier dim broadcast. No correlated
    re-scan of the fact table — the classic Q21 plan trap.
    """
    per_supp = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("had_ret")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("had_ret").alias("n_ret")
    )
    qualifying = (
        per_supp.filter(F.col("had_ret") == 1)
        .join(per_order, on="l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    return qualifying.join(
        maybe_broadcast(supplier.select(
            F.col("s_suppkey").alias("l_suppkey"),
            F.col("s_name").alias("supplier"),
        )),
        on="l_suppkey",
    ).select("supplier", "n_orders")


def supplier_hhi(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """(nation, n_suppliers, total_rev, sum_sq_rev): per supplier
    nation, the Herfindahl–Hirschman concentration inputs over
    supplier revenue — HHI = sum_sq_rev / total_rev² (consumers
    divide; the engine emits the exact numerator pair, the
    market_share convention). The antitrust-style audit: a nation
    whose revenue sits in one supplier is a supply-chain risk.

    One suppkey-keyed aggregation collapses the fact table to a row
    per supplier (map-side combined); squares are taken on the
    per-supplier DECIMAL(28,4) revenue lifted to exact 0.0001-units
    as DECIMAL(19,0) — the square then fits DECIMAL(38,0) — and both
    totals cast to double once at the end. The nation rollup
    aggregates |suppliers| rows by a broadcast dim key.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    per_supp = lineitem.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_dec"))
    units = (F.col("rev_dec") * 10000).cast("decimal(19,0)")
    return (
        per_supp.select(
            "l_suppkey",
            F.col("rev_dec"),
            (units * units).cast("decimal(38,0)").alias("sq_units"),
        )
        .join(
            maybe_broadcast(
                supplier.select("s_suppkey", "s_nationkey").join(
                    F.broadcast(nation.select(
                        F.col("n_nationkey").alias("s_nationkey"),
                        F.col("n_name").alias("nation"),
                    )),
                    on="s_nationkey",
                ).select(F.col("s_suppkey").alias("l_suppkey"), "nation")
            ),
            on="l_suppkey",
        )
        .groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.sum("rev_dec").cast("double").alias("total_rev"),
            F.sum("sq_units").cast("double").alias("sum_sq_rev"),
        )
    )


def order_size_profile(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """(n_lines, status, n_orders, revenue): the basket-size
    distribution — orders bucketed by their exact line count, split by
    order status, with the exact discounted revenue total per cell.
    The physical-design input for co-purchase / packing operators
    (how wide is an order, really?) and the Q13-adjacent census on
    the lineitem side.

    One orderkey-keyed aggregation collapses lineitem to a row per
    order, then the orderkey join binds the status (co-located when
    both sides are orderkey-bucketed at 100 TB) and a bounded-key
    rollup produces the |line-counts|×|statuses| frame. Revenue is
    the exact DECIMAL(28,4) sum cast to double once.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"), F.sum(rev).alias("rev_dec")
    )
    return (
        per_order.join(
            orders.select("o_orderkey", "o_orderstatus"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("rev_dec").cast("double").alias("revenue"),
        )
    )


def order_cohort_retention(orders: DataFrame) -> DataFrame:
    """(cohort_month, month_offset, n_customers): the classic cohort
    retention triangle on the ORDER fact — of the customers whose
    first order fell in `cohort_month`, how many ordered again
    `month_offset` months later (offset 0 = the cohort size itself).
    The purchase-side twin of events_retention; months are the integer
    ``year·12 + month`` so offsets subtract exactly cross-engine.

    Two custkey-keyed aggregations, both map-side combined: distinct
    (customer, month) activity — the exchange carries at most
    |customers|·|months| rows — and the per-customer MIN first month,
    joined back on custkey (co-located: same partitioning, reused),
    then one bounded rollup to the |months|² triangle. No per-month
    rescan of the fact, no window over fact-sized partitions.
    """
    mon = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).cast("long")
    active = orders.select("o_custkey", mon.alias("m")).distinct()
    first = active.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        active.join(first, on="o_custkey")
        .groupBy(
            F.col("m0").alias("cohort_month"),
            (F.col("m") - F.col("m0")).alias("month_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


def supply_bipartite_profile(lineitem: DataFrame) -> DataFrame:
    """(side, n_partners, n_keys): degree histograms of BOTH sides of
    the part–supplier bipartite network implied by shipped lines —
    for side 'part', how many parts have exactly `n_partners` distinct
    suppliers; for side 'supplier', how many suppliers ship exactly
    `n_partners` distinct parts. The sourcing-redundancy audit
    (single-sourced parts are supply risk; the supplier side is
    catalog breadth) without materializing any per-key partner lists.

    One distinct over (partkey, suppkey) pairs — map-side partial
    dedup, the exchange carries at most |parts|·|suppliers| rows —
    then two bounded aggregations per side (partner count → histogram)
    that reuse the pair frame via an eager-free localCheckpoint. The
    output is |distinct degrees|·2 rows at any corpus size.
    """
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def side(key: str, label: str) -> DataFrame:
        deg = pairs.groupBy(key).agg(F.count("*").alias("n_partners"))
        return deg.groupBy("n_partners").agg(
            F.count("*").alias("n_keys")
        ).select(
            F.lit(label).alias("side"),
            F.col("n_partners").cast("long").alias("n_partners"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )

    return side("l_partkey", "part").unionAll(side("l_suppkey", "supplier"))


def pricing_knob_grid(lineitem: DataFrame) -> DataFrame:
    """(disc_cents, tax_cents, n_lines, revenue): the joint grid of the
    two pricing knobs — discount and tax lifted to exact integer cents
    (``round(x·100)``, the value_drift convention) — with line counts
    and the exact discounted revenue per cell. The pricing-policy audit:
    which (discount, tax) combinations actually occur, and what revenue
    rides each.

    A single map-side-combined aggregation on a bounded integer key
    pair (both knobs live in [0, 100] cents); revenue is the
    DECIMAL(28,4) product summed and cast to double once. Nothing
    shuffles but the ≤101² grid partials.
    """
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        lineitem.select(
            F.round(F.col("l_discount") * 100).cast("long").alias("disc_cents"),
            F.round(F.col("l_tax") * 100).cast("long").alias("tax_cents"),
            rev.alias("rev"),
        )
        .groupBy("disc_cents", "tax_cents")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def segment_revenue_mix(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, year, n_orders, revenue): yearly order volume and
    exact revenue per customer market segment — the demand-mix
    trendline (is MACHINERY growing at AUTOMOBILE's expense?). The
    first consumer of c_mktsegment outside filters: segment is a
    first-class grouping dimension here.

    The customer dim broadcasts onto the orders scan (no fact-sized
    shuffle), then one map-side-combined rollup on the bounded
    (segment, year) key. Revenue is the DECIMAL(18,2) order total
    summed exactly and cast to double once.
    """
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        orders.select("o_custkey", "o_totalprice", "o_orderdate")
        .join(maybe_broadcast(seg), on="o_custkey")
        .groupBy("segment", F.year("o_orderdate").cast("long").alias("year"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def supplier_balance_deciles(
    supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """(nation, p_label, n_suppliers, q_cents): exact p50/p90/p99 of
    supplier account balance (integer cents) per nation, via the
    shared value-histogram rank selection — the credit-risk spread
    audit on the supplier dimension.

    Balances lift to cents with the value_drift ``round(x·100)``
    convention; the only window runs over distinct (nation, cents)
    values. The nation dim broadcasts onto the supplier scan.
    """
    from ..functions.quantiles import histogram_quantiles

    tagged = supplier.select(
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
    ).join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("s_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="s_nationkey",
    )
    return histogram_quantiles(
        tagged.select("nation", "cents"),
        "cents",
        count_alias="n_suppliers",
        value_alias="q_cents",
        group_cols=["nation"],
    )


def priority_mix_shift(orders: DataFrame) -> DataFrame:
    """(year, priority, n_orders, share_ppm): order-priority
    composition per year with exact ppm shares within the year — the
    mix-shift drift view (a rising URGENT share changes downstream
    SLA load even at flat volume).

    One map-side-combined rollup on the bounded (year, priority) key,
    then the ppm share joins the |years|-sized totals frame back by
    broadcast. Integer arithmetic only.
    """
    counts = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("year"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("n_orders"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("year").agg(F.sum("n_orders").alias("y_total"))
    return counts.join(F.broadcast(totals), on="year").select(
        "year",
        "priority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.expr("n_orders * 1000000 DIV y_total").alias("share_ppm"),
    )


def fk_integrity_census(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """1-row (n_order_keys, n_lineitem_keys, n_matched,
    n_childless_orders, n_orphan_lineitem_keys): the referential-
    integrity audit between the order header and its lines — distinct
    keys on each side, keys present on both, headers with no lines,
    and line keys with no header. The ingest gate every 100 TB
    pipeline runs before joining fact tables: orphans here mean a
    partial load or a retention mismatch, and every downstream inner
    join silently drops them.

    Both sides collapse to DISTINCT key sets map-side (the exchange
    carries keys only), one co-located full outer join classifies
    every key, and a single 1-row aggregation counts the three
    classes. Nothing ever shuffles a payload column.
    """
    ok = orders.select(F.col("o_orderkey").alias("k")).distinct().withColumn(
        "has_o", F.lit(1)
    )
    lk = lineitem.select(F.col("l_orderkey").alias("k")).distinct().withColumn(
        "has_l", F.lit(1)
    )
    both = ok.join(lk, on="k", how="full_outer")
    return both.agg(
        F.sum(F.coalesce("has_o", F.lit(0))).cast("long").alias("n_order_keys"),
        F.sum(F.coalesce("has_l", F.lit(0))).cast("long").alias("n_lineitem_keys"),
        F.sum(
            (F.col("has_o").isNotNull() & F.col("has_l").isNotNull()).cast("long")
        ).cast("long").alias("n_matched"),
        F.sum(
            (F.col("has_o").isNotNull() & F.col("has_l").isNull()).cast("long")
        ).cast("long").alias("n_childless_orders"),
        F.sum(
            (F.col("has_o").isNull() & F.col("has_l").isNotNull()).cast("long")
        ).cast("long").alias("n_orphan_lineitem_keys"),
    )


def custbal_order_corr(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """1-row (n_customers, sum_bal, sum_orders, sum_bal_sq,
    sum_orders_sq, sum_bal_orders): exact sufficient statistics for
    the account-balance ↔ order-count correlation over ALL customers
    (zero-order customers included — dropping them is the classic
    selection-bias mistake). Balance is integer cents; squares and
    cross products sum in DECIMAL(38,0) and cast to double once, so
    no corpus size overflows and both engines round the same integer.

    The fact collapses to per-customer counts map-side; the customer
    dim left-joins those counts (custkey-co-located at 100 TB), and
    one 1-row aggregation finishes. The monitor divides.
    """
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n_ord")
    )
    joined = customer.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    ).join(per_cust, on="c_custkey", how="left").select(
        "bal", F.coalesce("n_ord", F.lit(0)).alias("n_ord")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return joined.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("bal").cast("long").alias("sum_bal"),
        F.sum("n_ord").cast("long").alias("sum_orders"),
        F.sum(dec(F.col("bal") * F.col("bal"))).cast("double").alias("sum_bal_sq"),
        F.sum(dec(F.col("n_ord") * F.col("n_ord")))
        .cast("double")
        .alias("sum_orders_sq"),
        F.sum(dec(F.col("bal") * F.col("n_ord")))
        .cast("double")
        .alias("sum_bal_orders"),
    )


def brand_price_moments(part: DataFrame) -> DataFrame:
    """(brand, n_parts, sum_cents, sum_sq_cents, min_cents, max_cents):
    per-brand retail-price dispersion inputs in exact integer cents —
    the pricing-consistency audit on the part dimension (a brand whose
    variance explodes has a mistagged catalog). Same exact-moments
    convention as drift.value_moments: squares in DECIMAL(38,0), one
    double cast at the end, one bounded-key aggregation.
    """
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    per = part.select("p_brand", cents.alias("c"))
    return per.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("c").cast("long").alias("sum_cents"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sum_sq_cents"),
        F.min("c").cast("long").alias("min_cents"),
        F.max("c").cast("long").alias("max_cents"),
    )


def revenue_reconciliation(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(sign, diff_bits, n_orders): the header-vs-lines revenue
    reconciliation census — per order, the exact difference between
    o_totalprice and the summed discounted line revenue, in integer
    0.0001-units, bucketed by sign and the bit length of |diff|. The
    accounting tripwire every warehouse runs: a bucket that grows
    round-over-round is a loader or currency bug, localized by
    magnitude before anyone reads a single order.

    Every per-line revenue is an exact DECIMAL(28,4) lifted to integer
    units BEFORE summation, so both sides reconcile in plain BIGINT
    arithmetic (no decimal-width growth at any scale — a DECIMAL(38,4)
    sum cannot be multiplied by 10⁴ without overflowing either
    engine's 38-digit cap). lineitem collapses map-side to a row per
    order; the orderkey header join is co-located under orderkey
    bucketing; the census key is ≤2·64 cells.
    """
    rev_units = (
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).cast("decimal(28,4)")
        * 10000
    ).cast("long")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(rev_units).alias("line_u")
    )
    hdr_units = (
        F.col("o_totalprice").cast("decimal(18,2)") * 10000
    ).cast("long")
    joined = orders.select("o_orderkey", hdr_units.alias("hdr_u")).join(
        per_order, on=F.col("o_orderkey") == F.col("l_orderkey")
    )
    u = F.col("hdr_u") - F.col("line_u")
    return (
        joined.select(
            F.when(u > 0, F.lit(1))
            .when(u < 0, F.lit(-1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sign"),
            F.abs(u).alias("au"),
        )
        .groupBy(
            "sign",
            F.length(F.conv(F.col("au"), 10, 2)).cast("long").alias("diff_bits"),
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


def linenumber_holes(lineitem: DataFrame) -> DataFrame:
    """(slack, n_orders): per order, ``max(linenumber) − count(lines)``
    — 0 means the line sequence is dense, positive means holes
    (deleted lines, partial loads) — rolled into a census histogram.
    The fk_integrity_census companion one level down: keys can match
    while the sequence inside an order is still torn.

    One orderkey-keyed aggregation (map-side combined) and one bounded
    histogram. Only (orderkey, linenumber) ever shuffles.
    """
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.max("l_linenumber").alias("max_ln"),
    )
    return per_order.groupBy(
        (F.col("max_ln").cast("long") - F.col("n_lines")).alias("slack")
    ).agg(F.count("*").cast("long").alias("n_orders"))


def trailing_revenue_range(orders: DataFrame, customer: DataFrame,
                           nation: DataFrame) -> DataFrame:
    """(nation, day, revenue, trail7_revenue, next_revenue): per
    customer nation per active day, the exact daily revenue with the
    trailing-7-day total (a RANGE frame over the integer epoch day —
    calendar gaps shrink the window by VALUE, which a ROWS frame
    cannot express) and the next active day's revenue (LEAD). The
    trendline feeding burn-rate alerts.

    The fact collapses map-side to the |nations|·|days| daily frame
    (nation dims broadcast); both window passes run over that bounded
    frame partitioned by nation — never data-sized partitions. Sums
    stay DECIMAL until one double cast per output column.
    """
    cust_nation = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="c_nationkey",
    ).select(F.col("c_custkey").alias("o_custkey"), "nation")
    daily = (
        orders.select(
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
            F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day"),
        )
        .join(maybe_broadcast(cust_nation), on="o_custkey")
        .groupBy("nation", "day")
        .agg(F.sum("p").alias("rev_dec"))
    )
    w_range = (
        Window.partitionBy("nation").orderBy("day").rangeBetween(-6, 0)
    )
    w_lead = Window.partitionBy("nation").orderBy("day")
    return daily.select(
        "nation",
        "day",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w_range).cast("double").alias("trail7_revenue"),
        F.lead("rev_dec").over(w_lead).cast("double").alias("next_revenue"),
    )


def balance_quartile_mix(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """(nation, quartile, n_customers, sum_cents): customers NTILE'd
    into account-balance quartiles WITHIN their nation, with exact
    cent totals per tile — the fairness/credit-mix view (is the top
    quartile carrying the whole book?). NTILE is deterministic under
    a total order; ties break on custkey so both engines tile
    identically.

    The window partitions on nation over the customer DIMENSION (never
    a fact table); the rollup key is ≤|nations|·4.
    """
    tagged = customer.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        "c_nationkey",
    ).join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="c_nationkey",
    )
    w = Window.partitionBy("nation").orderBy("cents", "c_custkey")
    return (
        tagged.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("nation", F.col("quartile").cast("long").alias("quartile"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


def sales_grouping_sets(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, year, n_orders, revenue): order volume and exact
    revenue at FOUR grouping levels in one pass — (segment, year),
    per-segment, per-year, and the grand total — via native GROUPING
    SETS (one Expand + aggregate, the general form ROLLUP/CUBE are
    sugar for; the drill paths a dashboard's filter combinations
    actually hit). Rolled-up levels are labeled 'ALL' / year 0 with
    GROUPING() masks, the part_catalog_rollup NULL-proof convention.
    """
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    base = orders.select("o_custkey", "o_totalprice", "o_orderdate").join(
        maybe_broadcast(seg), on="o_custkey"
    ).select(
        "segment",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    grouped = base.groupingSets(
        [["segment", "yr"], ["segment"], ["yr"], []], "segment", "yr"
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("p").cast("double").alias("revenue"),
        F.grouping("segment").alias("__gs__"),
        F.grouping("yr").alias("__gy__"),
    )
    return grouped.select(
        F.when(F.col("__gs__") == 1, F.lit("ALL"))
        .otherwise(F.col("segment"))
        .alias("segment"),
        F.when(F.col("__gy__") == 1, F.lit(0))
        .otherwise(F.col("yr"))
        .cast("long")
        .alias("year"),
        "n_orders",
        "revenue",
    )


def nation_quarter_extremes(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """(nation, n_quarters, first_rev, second_rev, last_rev): per
    customer nation, the revenue of its FIRST, SECOND, and LAST
    active quarter — the trajectory fingerprint (slow start? strong
    finish?) via first_value / nth_value / last_value over the full
    partition frame.

    One map-side fact collapse to the |nations|·|quarters| frame, one
    full-frame window pass over it, one distinct — every step bounded
    by dimensions. Exact DECIMAL sums, one double cast each.
    """
    cust_nation = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="c_nationkey",
    ).select(F.col("c_custkey").alias("o_custkey"), "nation")
    q = (
        orders.select(
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
            (F.year("o_orderdate") * 10 + F.quarter("o_orderdate"))
            .cast("long")
            .alias("quarter"),
        )
        .join(maybe_broadcast(cust_nation), on="o_custkey")
        .groupBy("nation", "quarter")
        .agg(F.sum("p").alias("rev_dec"))
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("quarter")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return q.select(
        "nation",
        F.count("*").over(w).cast("long").alias("n_quarters"),
        F.first("rev_dec").over(w).cast("double").alias("first_rev"),
        F.nth_value("rev_dec", 2).over(w).cast("double").alias("second_rev"),
        F.last("rev_dec").over(w).cast("double").alias("last_rev"),
    ).distinct()


def part_metrics_long(part: DataFrame) -> DataFrame:
    """(metric, n_parts, total, min_v, max_v): the part table's numeric
    columns UNPIVOTED to long form — one row per metric with exact
    integer stats (retail price in cents) — the melt every
    feature-store export and generic profiler needs, done engine-side
    with `stack` (one Expand, no per-metric rescans).

    A narrow stack projection then one ≤|metrics|-keyed aggregation;
    the wide table is scanned once however many metrics are added.
    """
    long_form = part.select(
        F.expr(
            "stack(2, 'size', CAST(p_size AS BIGINT), "
            "'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT)) "
            "AS (metric, v)"
        )
    )
    return long_form.groupBy("metric").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("v").cast("long").alias("total"),
        F.min("v").cast("long").alias("min_v"),
        F.max("v").cast("long").alias("max_v"),
    )


def nation_segment_signature(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """(nation, n_segments, signature): per nation, the count of
    distinct market segments present and their sorted comma-joined
    signature — the categorical-completeness audit (a nation missing
    a segment is a sales-coverage gap), and the engine-side pattern
    for ANY set-valued rollup that must hash-compare cross-engine:
    collect_set → sort_array → array_join beats shipping raw arrays
    whose element order no engine guarantees.

    One nation-keyed aggregation over the customer dimension (partial
    sets merge map-side); the signature string is bounded by
    |segments|, never customer count.
    """
    tagged = customer.select("c_nationkey", "c_mktsegment").join(
        F.broadcast(nation.select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("n_name").alias("nation"),
        )),
        on="c_nationkey",
    )
    return tagged.groupBy("nation").agg(
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
        F.array_join(
            F.sort_array(F.collect_set("c_mktsegment")), ","
        ).alias("signature"),
    )


def part_value_concentration(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    fraction_denom: int = 1000,
) -> DataFrame:
    """(partkey, supply_value): parts whose traded value through one
    region's suppliers exceeds ``1/fraction_denom`` of that region's
    total traded value — the TPC-H Q11 shape (value concentration
    against a correlated scalar threshold), re-keyed onto lineitem
    because the testdata has no partsupp table (value ≔ Σ extendedprice
    × quantity instead of ps_supplycost × ps_availqty; identical plan
    shape).

    The region's supplier set is a broadcast dim filter pushed into the
    lineitem scan's join, so the ONE shuffle is the partkey aggregation
    of the filtered fact. The Q11 HAVING threshold is a one-row
    aggregate of the SAME grouped frame, broadcast back in — no second
    fact scan, no correlated subquery. The share test runs in exact
    integer cents (round(price·100)·qty, the cross-engine lift
    convention): value_cents·denom > total_cents — bit-identical in
    both engines; BIGINT carries it to ~sf1000, beyond which lift both
    sides to DECIMAL(38,0).
    """
    suppliers_in_region = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == region_name).select(
                            "r_regionkey"
                        )
                    ),
                    on=F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            on=F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    cents = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    per_part = (
        lineitem.select("l_suppkey", "l_partkey", cents.alias("value_cents"))
        .join(maybe_broadcast(suppliers_in_region), on="l_suppkey")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("value_cents").alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("__total_cents__"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.lit(fraction_denom)
            > F.col("__total_cents__")
        )
        .select(
            F.col("partkey").cast("long").alias("partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("supply_value"),
        )
    )


def late_line_priority_census(
    lineitem: DataFrame,
    orders: DataFrame,
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
    late_days: int = 60,
) -> DataFrame:
    """(l_returnflag, high_line_count, low_line_count): among lines
    SHIPPED in the window and later than `late_days` after their
    order date, how many belong to critical-priority orders vs not,
    per return flag — the TPC-H Q12 shape (shipmode late-line census;
    returnflag stands in for the shipmode column the testdata lacks,
    ship-vs-order lag for the commit/receipt lag).

    The date window prunes the lineitem scan (pushed filter), the ONE
    shuffle is lineitem ⋈ orders on orderkey (co-located when both are
    orderkey-bucketed), and the lateness predicate runs as soon as both
    dates are bound so on-time lines never reach the 3-row aggregate.
    The priority test is Q12's: '1-URGENT' or '2-HIGH' counts high.
    """
    shipped = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        shipped.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def bulk_part_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    name_prefix: str = "small ",
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
    min_qty: float = 50.0,
) -> DataFrame:
    """(s_name, nation): suppliers who moved more than `min_qty` units
    of SOME part whose name starts with `name_prefix` within the year —
    the TPC-H Q20 shape (nested semi-join: parts → qualifying
    (supplier, part) volumes → suppliers), availability re-derived from
    shipped volume because the testdata has no partsupp.availqty.

    Innermost: the part-name prefix filter broadcasts into the
    date-pruned lineitem scan (both predicates reach the scans).
    Middle: ONE shuffle groups the surviving lines by (suppkey,
    partkey); the HAVING keeps bulk volumes. Outermost: the distinct
    qualifying suppkeys semi-join supplier (broadcast — supplier count
    ≪ fact count), nation broadcasts for the name. No fact-fact join
    anywhere, mirroring Q20's correlated-subquery-free plan.
    """
    wanted_parts = part.filter(F.col("p_name").startswith(name_prefix)).select(
        F.col("p_partkey").alias("l_partkey")
    )
    bulk_suppliers = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(maybe_broadcast(wanted_parts), on="l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > min_qty)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        supplier.join(maybe_broadcast(bulk_suppliers), on="s_suppkey", how="semi")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            on="s_nationkey",
        )
        .select("s_name", "nation")
    )


def regional_local_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year_start: str = "1997-01-01",
    year_end: str = "1998-01-01",
) -> DataFrame:
    """(nation, revenue, n_lineitems): discounted revenue per nation of
    one region, counting only LOCAL trades — lines whose supplier and
    ordering customer share the nation — for orders placed in the year:
    the full TPC-H Q5 shape (the Q5-style `local_supplier_volume`
    predates this; Q5 proper needs the region dim, the order-date
    window, and the customer-nation = supplier-nation equality, all
    present here).

    region→nation→customer/supplier chain broadcasts end to end; the
    order-date filter prunes the orders side BEFORE the one fact-fact
    shuffle (lineitem ⋈ orders on orderkey, co-located when bucketed).
    The locality equality binds as soon as both nationkeys are bound —
    non-local rows never reach the aggregate. Revenue is the exact
    DECIMAL(28,4) convention cast to double once.
    """
    region_nations = nation.join(
        F.broadcast(
            region.filter(F.col("r_name") == region_name).select("r_regionkey")
        ),
        on=F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
    ).cast("decimal(28,4)")
    year_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit(year_start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(year_end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", rev.alias("rev"))
        .join(year_orders, on=F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            maybe_broadcast(customer.select("c_custkey", "c_nationkey")),
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            maybe_broadcast(supplier.select("s_suppkey", "s_nationkey")),
            on=(F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(
                region_nations.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            on="c_nationkey",
        )
        .groupBy("nation")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


def trailing_dyadic_revenue(orders: DataFrame, window_days: int = 8) -> DataFrame:
    """(day, day_cents, trail_weighted_cents): daily order revenue in
    exact integer cents plus a trailing exponentially-weighted sum —
    weight 2^(window_days-1-k) for the revenue k days back — the
    anomaly-baseline smoother with DYADIC weights so the whole series
    stays integer-exact cross-engine (float pow() is libm-dependent;
    powers of two are not).

    Semantics note (round-8 ADVICE): `trail_weighted_cents` is the raw
    WEIGHTED SUM, not a mean — it is never divided by the weight total,
    and days with zero orders are absent from both the input and the
    output. A caller wanting the normalized smoother divides by
    2^window_days - 1 externally (exact, since the weights are dyadic);
    the column name says "weighted", not "avg", for this reason, and
    the function is named for what it computes (r9 ADVICE carry-over:
    it is NOT an EWMA — no normalization). The registry key
    `revenue_ewma` is kept for driver-history continuity.

    Scale shape: the fact table collapses to the bounded daily frame
    first (ONE map-side-combined aggregation); the trailing window is
    then a scatter — each day broadcasts its weighted contribution to
    the next `window_days` calendar slots via a literal offsets array
    (narrow map + explode, no range join, no per-row window scan) — and
    a re-aggregation over |days|·window_days tiny rows. Days with no
    orders contribute nothing and receive nothing, matching the SQL
    twin exactly.
    """
    daily = (
        orders.select(
            event_micros(orders, "o_orderdate").alias("tus"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .select(F.expr("tus div 86400000000").alias("day"), "cents")
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    offsets = F.sequence(F.lit(0), F.lit(window_days - 1))
    contrib = daily.select(
        F.explode(offsets).alias("off"), "day", "cents"
    ).select(
        (F.col("day") + F.col("off")).alias("day"),
        (
            F.col("cents")
            * F.expr(
                "shiftleft(cast(1 as bigint), "
                f"cast({window_days - 1} - off as int))"
            )
        ).alias("w"),
    )
    weighted = contrib.groupBy("day").agg(
        F.sum("w").alias("trail_weighted_cents")
    )
    return daily.join(weighted, on="day").select(
        F.col("day").cast("long").alias("day"),
        F.col("cents").cast("long").alias("day_cents"),
        F.col("trail_weighted_cents").cast("long").alias(
            "trail_weighted_cents"
        ),
    )


def segment_bitmask(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """(nation, segment_mask, n_customers): per nation, the bit-OR of
    one bit per market segment present — the fixed-vocabulary set
    membership encoded as an integer bitmask (the compact alternative
    to the collect_set signature of `nation_segment_signature` when the
    vocabulary is small and known: 1 bigint vs a string, and bit_or
    merges map-side).

    One broadcast dim join + one nation-keyed aggregation; bit_or is
    associative so partial aggregation halves the shuffle like any sum.
    """
    seg = F.col("c_mktsegment")
    bit = (
        F.when(seg == "AUTOMOBILE", 1)
        .when(seg == "BUILDING", 2)
        .when(seg == "FURNITURE", 4)
        .when(seg == "HOUSEHOLD", 8)
        .when(seg == "MACHINERY", 16)
        .otherwise(0)
        .cast("long")
    )
    return (
        customer.select("c_nationkey", bit.alias("bit"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            on="c_nationkey",
        )
        .groupBy("nation")
        .agg(
            F.bit_or("bit").cast("long").alias("segment_mask"),
            F.count("*").cast("long").alias("n_customers"),
        )
    )


def user_set_ops(
    events: DataFrame, type_a: str = "click", type_b: str = "error"
) -> DataFrame:
    """(set_op, n_users): the distinct-user sets of two event types run
    through INTERSECT / EXCEPT / UNION — the audience-overlap algebra
    (T1/T2/T3 on the events table) as one oracle-checkable frame.

    Each set is a distinct projection of the pruned fact scan; the set
    operators are Spark-native (hash aggregates), and the three counts
    are one-row frames unioned together — nothing data-sized ever sits
    on the driver.
    """
    users_a = events.filter(F.col("event_type") == type_a).select(
        "user_id"
    ).distinct()
    users_b = events.filter(F.col("event_type") == type_b).select(
        "user_id"
    ).distinct()

    def one(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(tag).alias("set_op"), "n_users"
        )

    return (
        one("intersect", users_a.intersect(users_b))
        .unionAll(one("except", users_a.subtract(users_b)))
        .unionAll(one("union", users_a.union(users_b).distinct()))
    )


def balance_outlier_census(
    customer: DataFrame, nation: DataFrame, k_num: int = 3, k_den: int = 2
) -> DataFrame:
    """(nation, n_custs, n_outliers, outlier_cents): per nation, how
    many customer balances sit more than k = k_num/k_den population
    standard deviations from the nation mean, and their total — the
    z-score outlier census with the float entirely eliminated:
    |x−μ| > kσ cross-multiplies to k_den²·(n·x − Σ)² > k_num²·(n·Σx² −
    Σ²), all integer cents, so the boundary is bit-identical in any
    engine (a float σ comparison would make the census row
    hash-unstable exactly at the boundary customers it exists to
    count). k defaults to 3/2 rather than 2 because a bounded-support
    (uniform-ish) distribution never exceeds √3 ≈ 1.73σ — a 2σ census
    is structurally vacuous there.

    Two passes over the dimension: one aggregation to the |nations|
    stats frame, broadcast back, filter, re-aggregate. The squares run
    in DECIMAL(38,0) (Spark) / HUGEINT (oracle) — bounded by
    (n·maxcents)² < 10³⁸ up to ~10⁹ customers per nation at 10⁵
    currency units, i.e. comfortably past the 100 TB point.
    """
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = customer.select("c_nationkey", cents.alias("cents"))
    stats = base.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    dec = "decimal(19,0)"
    dev = (
        F.col("n") * F.col("cents") - F.col("s1")
    ).cast(dec)
    var_n2 = (
        F.col("n").cast(dec) * F.col("s2").cast(dec)
        - F.col("s1").cast(dec) * F.col("s1").cast(dec)
    )
    outliers = (
        base.join(F.broadcast(stats), on="c_nationkey")
        .filter(
            F.lit(k_den * k_den).cast("decimal(4,0)") * dev * dev
            > F.lit(k_num * k_num).cast("decimal(4,0)") * var_n2
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_outliers"),
            F.sum("cents").cast("long").alias("outlier_cents"),
        )
    )
    return (
        stats.join(outliers, on="c_nationkey", how="left")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            on="c_nationkey",
        )
        .select(
            "nation",
            F.col("n").cast("long").alias("n_custs"),
            F.coalesce(F.col("n_outliers"), F.lit(0)).cast("long").alias(
                "n_outliers"
            ),
            F.coalesce(F.col("outlier_cents"), F.lit(0)).cast("long").alias(
                "outlier_cents"
            ),
        )
    )


def skew_salted_enrich(events: DataFrame, salt: int = 16) -> DataFrame:
    """(event_type, n_events, n_above_mean): per-type event count and
    how many events exceed their type's mean value — routed through an
    EXPLICITLY SALTED equi-join (``functions/skew.salted_join``), the
    one scale technique the engine documents but no registry query
    exercised before round 9.

    Why salting here: event_type is the canonical deliberately-skewed
    key (a handful of types carry almost all rows), and the enrich join
    keys the FACT side on it. An unsalted shuffle join lands every row
    of a hot type on one reducer; the salted form spreads each key over
    `salt` buckets by replicating the per-type stats frame ×salt —
    bounded work per task for ANY key distribution, and the technique
    that still applies when the build side is too big to broadcast or
    the skew sits under an aggregation AQE cannot split. The salt
    column never escapes: the output is salt-invariant (verified by the
    DuckDB oracle, which joins unsalted).

    Exactness: the above-mean test is the integer cross-multiplication
    ``cents·n > sum_cents`` on DECIMAL(38,0) — value lifted to cents
    with the shared round(x·100) convention, no float division, no
    overflow up to ~1e27 row-cents products.
    """
    from ..functions.skew import salted_join

    ev = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
    )
    above = (
        F.col("cents").cast("decimal(38,0)") * F.col("n")
        > F.col("sum_cents")
    )
    return (
        salted_join(ev, stats, on="event_type", salt=salt)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(above.cast("long")).cast("long").alias("n_above_mean"),
        )
    )


def weighted_price_median(lineitem: DataFrame) -> DataFrame:
    """(returnflag, total_units, wmedian_price_cents): per return flag,
    the QUANTITY-WEIGHTED median extended price in exact integer cents —
    the weighted-quantile operator (every row counts `l_quantity` units
    toward the rank) the plain quantile family cannot express.

    Scale shape: same lever as functions/quantiles — the fact table
    collapses to a (flag, cents) weighted histogram first (map-side
    combinable, ONE shuffle keyed on the value), and the only window
    runs over DISTINCT (flag, price) pairs, bounded by price cardinality
    per flag, never row count. Rank convention extends the shared one to
    weights: the weighted median is the value whose cumulative-unit
    range covers 0-indexed unit rank ``(total_units - 1) div 2`` —
    pure integer arithmetic, bit-identical in the DuckDB twin.
    """
    hist = (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias(
                "cents"
            ),
            F.col("l_quantity").cast("long").alias("units"),
        )
        .groupBy("returnflag", "cents")
        .agg(F.sum("units").alias("w"))
    )
    win = Window.partitionBy("returnflag").orderBy("cents")
    cum = hist.select(
        "returnflag",
        "cents",
        "w",
        F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("w")
        .over(
            win.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("tot"),
    )
    target = F.expr("(tot - 1) div 2")
    return cum.filter(
        (F.col("cum") - F.col("w") <= target) & (target < F.col("cum"))
    ).select(
        "returnflag",
        F.col("tot").cast("long").alias("total_units"),
        F.col("cents").alias("wmedian_price_cents"),
    )


def segment_priority_chisq(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """(segment, priority, n_obs, seg_total, pri_total, grand_total,
    chi_num): the EXACT contingency-table sufficient statistics for the
    market-segment × order-priority independence test. ``chi_num =
    grand_total·n_obs − seg_total·pri_total`` on DECIMAL(38,0) — the
    cross-multiplied numerator of (observed − expected), so the caller
    computes χ² = Σ chi_num² / (grand·seg·pri) with scalar floats only;
    every engine-side column stays integer and hash-stable.

    Scale shape: ONE fact shuffle — orders joins the 2-column customer
    projection on custkey (size-gated broadcast: customer is
    sf-proportional, so the hint is AQE's call, not ours), then a
    map-side-combinable count to the |segments|·|priorities| ≈ 25-row
    contingency frame. The marginal totals are windows over that tiny
    frame, never over facts. Reference census scope: HelperFunction
    statistics assembly (counts by class); the independence layout is
    the standard Pearson decomposition.
    """
    cust = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    cont = (
        orders.select("o_custkey", F.col("o_orderpriority").alias("priority"))
        .join(maybe_broadcast(cust), on="o_custkey")
        .groupBy("segment", "priority")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    seg_w = Window.partitionBy("segment")
    pri_w = Window.partitionBy("priority")
    all_w = Window.partitionBy()
    d = F.col("n_obs").cast("decimal(38,0)")
    return (
        cont.select(
            "segment",
            "priority",
            "n_obs",
            F.sum("n_obs").over(seg_w).cast("long").alias("seg_total"),
            F.sum("n_obs").over(pri_w).cast("long").alias("pri_total"),
            F.sum("n_obs").over(all_w).cast("long").alias("grand_total"),
        )
        .select(
            "segment",
            "priority",
            "n_obs",
            "seg_total",
            "pri_total",
            "grand_total",
            (
                F.col("grand_total").cast("decimal(38,0)") * d
                - F.col("seg_total").cast("decimal(38,0)")
                * F.col("pri_total").cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("chi_num"),
        )
    )


def discount_trend_stats(lineitem: DataFrame) -> DataFrame:
    """(returnflag, n, sum_x, sum_y, sum_xy, sum_x2): per return flag,
    the EXACT group-wise ordinary-least-squares sufficient statistics
    for the regression of discount (basis points, y) on ship date
    (epoch days, x). Slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and the
    intercept follow from the five integers in one scalar float step by
    the caller — the engine never divides, so the frame hash-matches
    the DuckDB twin bit for bit (the `custbal_order_corr` convention
    extended from correlation to regression).

    Scale shape: a pure map over the two pruned fact columns into a
    map-side-combinable 5-sum aggregate — one shuffle of |flags| rows.
    DECIMAL(38,0) holds Σx² up to ~1e31 row·day² products.
    """
    x = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).cast(
        "decimal(38,0)"
    )
    y = F.round(F.col("l_discount") * 10000).cast("decimal(38,0)")
    return (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("decimal(38,0)").alias("sum_x"),
            F.sum("y").cast("decimal(38,0)").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sum_xy"),
            F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sum_x2"),
        )
    )


def event_value_benford(events: DataFrame) -> DataFrame:
    """(event_type, digit, n): leading-decimal-digit census of positive
    event values in cents — the Benford's-law audit surface for a value
    column (fabricated or unit-mixed feeds bend the first-digit curve
    long before moments move). Digit extraction is string-exact on the
    integer cents (first character of the base-10 rendering), never a
    float log10, so both engines agree on every row.

    Scale shape: narrow map (round → cast → substr) into one
    map-side-combinable count keyed on (type, digit) — a ≤ 9·|types|
    result frame, one shuffle.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.select(F.col("event_type"), cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
        .groupBy("event_type", "digit")
        .agg(F.count("*").cast("long").alias("n"))
    )


def order_gap_profile(orders: DataFrame) -> DataFrame:
    """(gap_bits, n_gaps, min_gap_days, max_gap_days): histogram of
    per-customer consecutive-order gaps, bucketed by the BIT LENGTH of
    the gap in days (`length(bin(gap))`, the shared conv/bin bucket
    convention from component_density_profile) — the repeat-purchase
    cadence fingerprint (mass in low buckets = bursty reorders, a long
    tail = churn-and-return).

    Scale shape: one hash shuffle on o_custkey with partition-local
    window sorts (the sessionization cost shape); the lag is exact
    integer epoch-day arithmetic; the bucket roll-up is ≤ ~15 rows.
    Ties on the same date break by o_orderkey so both engines see the
    identical sequence.
    """
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .select(
            "o_custkey",
            (F.col("day") - F.lag("day").over(w)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy(
            F.length(F.conv(F.col("gap"), 10, 2)).cast("long").alias("gap_bits")
        )
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
    )


def quantity_mode(lineitem: DataFrame) -> DataFrame:
    """(returnflag, linestatus, mode_qty, mode_count): the EXACT modal
    quantity per (return flag, line status) — the one central-tendency
    aggregate the quantile/median/moment family doesn't cover. Ties
    break to the SMALLEST quantity so the answer is deterministic and
    bit-identical in the DuckDB twin (its native mode() leaves ties
    unspecified, so the oracle uses the same explicit argmax).

    Scale shape: facts collapse to the (flag, status, qty) value
    histogram first (map-side combinable, one shuffle); the argmax
    window runs over DISTINCT quantities per group — bounded by value
    cardinality, never row count.
    """
    hist = (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("returnflag", "linestatus", "qty")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("returnflag", "linestatus").orderBy(
        F.col("cnt").desc(), F.col("qty").asc()
    )
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "returnflag",
            "linestatus",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


def value_band_census(events: DataFrame) -> DataFrame:
    """(event_type, n_below, n_in, n_above): per event type, how many
    event values fall below / inside / above the GLOBAL exact
    inter-quartile band [p25, p75] of value cents — the band census
    that says which types drive the tails (a per-type quantile says
    how a type is shaped; this says how it sits against the corpus).

    Exactness: quartiles come from histogram rank selection
    (``functions/quantiles``, the shared 0-indexed ``(n−1)·num div
    den`` convention) on integer cents. The two thresholds join back
    as a 1-row broadcast scalar frame (the audited benign nested-loop
    shape), then one map-side-combinable conditional count per type —
    two shuffles total, both over value-bounded frames.
    """
    from ..functions.quantiles import histogram_quantiles

    ev = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    qs = histogram_quantiles(
        ev, "cents", quantiles=(("p25", 1, 4), ("p75", 3, 4))
    )
    band = qs.groupBy().agg(
        F.max(F.when(F.col("p_label") == "p25", F.col("q_value"))).alias("lo"),
        F.max(F.when(F.col("p_label") == "p75", F.col("q_value"))).alias("hi"),
    )
    return (
        ev.crossJoin(F.broadcast(band))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("cents") < F.col("lo")).cast("long"))
            .cast("long")
            .alias("n_below"),
            F.sum(
                (
                    (F.col("cents") >= F.col("lo"))
                    & (F.col("cents") <= F.col("hi"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_in"),
            F.sum((F.col("cents") > F.col("hi")).cast("long"))
            .cast("long")
            .alias("n_above"),
        )
    )


def priority_transition_census(orders: DataFrame) -> DataFrame:
    """(from_priority, to_priority, n): first-order transition counts
    between a customer's CONSECUTIVE order priorities (date order, ties
    by o_orderkey) — `event_transitions` lifted from the event stream
    to the order book, where the diagonal mass answers "do customers
    keep their urgency class between purchases?".

    One lag window per customer (hash shuffle on o_custkey, local
    sorts over integer epoch days), then a |priorities|²-bounded
    aggregation.
    """
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderpriority").alias("to_priority"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
    )
    return (
        seq.withColumn("from_priority", F.lag("to_priority").over(w))
        .filter(F.col("from_priority").isNotNull())
        .groupBy("from_priority", "to_priority")
        .agg(F.count("*").cast("long").alias("n"))
    )


def type_trigram_census(events: DataFrame) -> DataFrame:
    """(t1, t2, t3, n): second-order sequence census — counts of every
    CONSECUTIVE event-type trigram inside a user's time-ordered stream
    (two stacked lags over the same window; Catalyst collapses them
    into ONE window exec). The step past `event_transitions`' Markov
    matrix: trigram mass that first-order chains cannot predict is the
    sequence-mining signal (e.g. view→click→purchase vs
    view→click→error). Output is bounded by |types|³ ≤ 125 at the
    testdata vocabulary; one user-keyed shuffle.
    """
    ev = events.select(
        "user_id", "event_id", event_micros(events).alias("tus"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    return (
        ev.withColumn("t2", F.lag("event_type", 1).over(w))
        .withColumn("t1", F.lag("event_type", 2).over(w))
        .filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", F.col("event_type").alias("t3"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def value_roundness_census(events: DataFrame) -> DataFrame:
    """(event_type, n_pos, n_whole, n_tens, n_half): round-number bias
    census of positive event values — counts of values that are whole
    currency units (cents ≡ 0 mod 100), whole tens, and half units
    (≡ 50 mod 100). The complement of `event_value_benford`: Benford
    reads the LEADING digit for fabrication, roundness reads the
    TRAILING digits for human-entered/price-pointed values (organic
    measurements are rarely round; a spike in n_whole marks a manual
    or defaulted feed). Pure integer modular arithmetic on cents.

    Scale shape: narrow map into one map-side-combinable conditional
    count per type — the `event_value_benford` cost, one shuffle of a
    |types|-row frame.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    ev = events.select("event_type", cents.alias("cents")).filter(
        F.col("cents") > 0
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pos"),
        F.sum((F.col("cents") % 100 == 0).cast("long"))
        .cast("long")
        .alias("n_whole"),
        F.sum((F.col("cents") % 1000 == 0).cast("long"))
        .cast("long")
        .alias("n_tens"),
        F.sum((F.col("cents") % 100 == 50).cast("long"))
        .cast("long")
        .alias("n_half"),
    )


def ship_delay_histogram(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(priority, delay_days, n_lines): distribution of order-to-ship
    latency — exact integer days between o_orderdate and each line's
    l_shipdate, per order priority. The fulfilment-SLA histogram: the
    TPC-H shape family reads delays as filters (Q12's late-line
    census); this materializes the whole distribution so the SLA
    threshold is chosen FROM data instead of assumed.

    Scale shape: the one fact-fact join in the round — lineitem joins
    the 3-column orders projection on l_orderkey (both sides shuffle
    on the key; at cluster SF this is the classic co-partition/bucket
    candidate, and AQE handles orderkey skew), then a map-side-
    combinable count into a (|priorities| × |distinct delays|)-bounded
    frame.
    """
    o = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "oday"
        ),
    )
    li = lineitem.select(
        "l_orderkey",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias(
            "sday"
        ),
    )
    return (
        li.join(o, on="l_orderkey")
        .select("priority", (F.col("sday") - F.col("oday")).alias("delay_days"))
        .groupBy("priority", "delay_days")
        .agg(F.count("*").cast("long").alias("n_lines"))
    )


def repeat_rate_by_segment(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """(segment, n_customers, n_buyers, n_repeat, n_orders): per market
    segment, how many customers exist, how many ever ordered, how many
    ordered MORE than once, and the order total — the four integers
    behind repeat rate / penetration / orders-per-buyer (all
    caller-side scalar divisions, so the frame hash-matches exactly).

    Scale shape: orders collapse to per-customer counts first (one
    fact shuffle on o_custkey, map-side combinable), then join the
    2-column customer projection (size-gated broadcast) and roll up to
    the |segments|-row frame.
    """
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n_ord")
    )
    return (
        customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
        .join(maybe_broadcast(per_cust), on="c_custkey", how="left")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.count("n_ord").cast("long").alias("n_buyers"),
            F.sum((F.coalesce(F.col("n_ord"), F.lit(0)) > 1).cast("long"))
            .cast("long")
            .alias("n_repeat"),
            F.sum(F.coalesce(F.col("n_ord"), F.lit(0))).cast("long").alias(
                "n_orders"
            ),
        )
    )


def interpolated_median_stats(lineitem: DataFrame) -> DataFrame:
    """(returnflag, n, lo_cents, hi_cents, median_x2_cents): the
    PERCENTILE_CONT(0.5) median decomposed into exact integers — the
    quantile family's floor-rank convention returns a PRESENT value
    (percentile_disc); the interpolated median averages the two
    straddling values on even counts. Emitting ``lo + hi`` (twice the
    interpolated median) keeps the engine integer-exact and
    hash-stable; the caller halves a scalar. lo/hi are the values at
    0-indexed ranks ``(n-1) div 2`` and ``n div 2`` — equal when n is
    odd, adjacent when even.

    Scale shape: the same ONE value-keyed histogram shuffle as
    `weighted_price_median`; both rank picks ride a single cumulative
    window over DISTINCT (flag, cents) pairs.
    """
    hist = (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("returnflag", "cents")
        .agg(F.count("*").alias("w"))
    )
    win = Window.partitionBy("returnflag").orderBy("cents")
    cum = hist.select(
        "returnflag",
        "cents",
        "w",
        F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("w")
        .over(
            win.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    lo_rank = F.expr("(n - 1) div 2")
    hi_rank = F.expr("n div 2")
    covers_lo = (F.col("cum") - F.col("w") <= lo_rank) & (
        lo_rank < F.col("cum")
    )
    covers_hi = (F.col("cum") - F.col("w") <= hi_rank) & (
        hi_rank < F.col("cum")
    )
    return (
        cum.filter(covers_lo | covers_hi)
        .groupBy("returnflag")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max(F.when(covers_lo, F.col("cents"))).cast("long").alias(
                "lo_cents"
            ),
            F.max(F.when(covers_hi, F.col("cents"))).cast("long").alias(
                "hi_cents"
            ),
        )
        .select(
            "returnflag",
            "n",
            "lo_cents",
            "hi_cents",
            (F.col("lo_cents") + F.col("hi_cents")).alias("median_x2_cents"),
        )
    )


def repeat_purchase_latency(events: DataFrame) -> DataFrame:
    """(gap_bits, n_gaps, min_gap_s, max_gap_s): histogram of the time
    between a user's CONSECUTIVE purchase events, bucketed by bit
    length of the gap in whole seconds — the repeat-conversion cadence
    (the `order_gap_profile` question asked of the event stream, where
    timestamps are sub-day). Type-filtered BEFORE the window, so the
    lead sees only purchases; `interarrival_quantiles` profiles the
    all-event stream and cannot isolate conversions.

    Scale shape: the type filter pushes into the scan, then one
    user-keyed window shuffle over the purchase subset only.
    """
    ev = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", event_micros(events).alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gaps = (
        ev.withColumn("next_tus", F.lead("tus").over(w))
        .filter(F.col("next_tus").isNotNull())
        .select(
            F.expr("(next_tus - tus) div 1000000").cast("long").alias("gap_s")
        )
    )
    return gaps.groupBy(
        F.length(F.conv(F.col("gap_s"), 10, 2)).cast("long").alias("gap_bits")
    ).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
    )


def _daily_revenue_cents(orders: DataFrame) -> DataFrame:
    """(day, cents): epoch-day daily order revenue in exact integer
    cents — the shared bounded frame under the time-series operators
    (same derivation as `trailing_dyadic_revenue`; days with no orders absent)."""
    return (
        orders.select(
            event_micros(orders, "o_orderdate").alias("tus"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .select(F.expr("tus div 86400000000").alias("day"), "cents")
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )


def revenue_cusum(orders: DataFrame) -> DataFrame:
    """(n_days, total_cents, max_abs_cusum, at_day): CUSUM changepoint
    scan of daily order revenue — the running deviation from the global
    mean, cross-multiplied by n_days so it stays integer:
    s_k = n·Σ_{i≤k} x_i − k·Σx (= n·(cum_k − k·mean)). The day where
    |s_k| peaks is the classic single-changepoint estimate; the caller
    divides by n_days to recover the float CUSUM. `at_day` is the
    smallest peak day (deterministic tie-break).

    Scale shape: the fact table collapses to the bounded daily frame
    first (one map-side-combined aggregation); the cumulative window,
    the scalar max, and the argmax filter all run over |days| rows.
    DECIMAL(38,0) throughout — n·cum products overflow BIGINT beyond
    ~sf10k.
    """
    daily = _daily_revenue_cents(orders)
    w = Window.orderBy("day")
    cum = daily.select(
        "day",
        F.row_number().over(w).alias("k"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.count("*")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
        F.sum("cents")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("total"),
    )
    DEC = "decimal(38,0)"
    dev = cum.select(
        "day",
        "n",
        "total",
        F.abs(
            F.col("n").cast(DEC) * F.col("cum").cast(DEC)
            - F.col("k").cast(DEC) * F.col("total").cast(DEC)
        )
        .cast(DEC)
        .alias("s_abs"),
    )
    # global-window argmax over the day-bounded dev frame — the
    # scalar-max self-join re-executed the daily-revenue subtree twice
    # per call (r12, same fix as hypotests.pettitt_changepoint)
    mxw = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        dev.withColumn("max_abs_cusum", F.max("s_abs").over(mxw))
        .filter(F.col("s_abs") == F.col("max_abs_cusum"))
        .groupBy()
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("total").cast("long").alias("total_cents"),
            F.max("max_abs_cusum").cast(DEC).alias("max_abs_cusum"),
            F.min("day").cast("long").alias("at_day"),
        )
    )


def revenue_acceleration_census(orders: DataFrame) -> DataFrame:
    """(month, n_up, n_down, n_flat): sign census of the SECOND
    difference of daily revenue — is the day-over-day change itself
    rising or falling — grouped by the month (yyyymm) of the day the
    acceleration lands on. Differences are taken over consecutive
    PRESENT days (the gap-fill operator owns calendar densification;
    this census is deliberately gap-agnostic and says so).

    Scale shape: bounded daily frame, two stacked lag windows over it,
    one small rollup.
    """
    daily = _daily_revenue_cents(orders)
    w = Window.orderBy("day")
    accel = (
        daily.withColumn("d1", F.col("cents") - F.lag("cents").over(w))
        .withColumn("d2", F.col("d1") - F.lag("d1").over(w))
        .filter(F.col("d2").isNotNull())
    )
    # epoch-day → calendar month via pure DATE arithmetic (no
    # timestamp, no session-timezone exposure in either engine)
    month = F.expr(
        "year(date_add(DATE'1970-01-01', cast(day as int))) * 100 "
        "+ month(date_add(DATE'1970-01-01', cast(day as int)))"
    )
    return accel.groupBy(month.cast("long").alias("month")).agg(
        F.sum(F.when(F.col("d2") > 0, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("d2") < 0, 1).otherwise(0)).cast("long").alias("n_down"),
        F.sum(F.when(F.col("d2") == 0, 1).otherwise(0)).cast("long").alias("n_flat"),
    )


def revenue_monotone_runs(orders: DataFrame) -> DataFrame:
    """(month, n_runs, max_run, up_days): gaps-and-islands census of
    strictly-increasing runs in daily revenue. A run is a maximal block
    of consecutive PRESENT days each strictly above the previous
    present day; its month (yyyymm) is that of its first up-day. The
    island id is the classic row_number − cumulative-up-count
    difference — constant exactly within a consecutive up block.

    Scale shape: bounded daily frame, one lag + one cumulative window
    over it, then two small rollups.
    """
    daily = _daily_revenue_cents(orders)
    w = Window.orderBy("day")
    flagged = daily.select(
        "day",
        F.row_number().over(w).alias("rn"),
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .otherwise(0)
        .alias("up"),
    )
    grouped = flagged.withColumn(
        "rid",
        F.col("rn")
        - F.sum("up").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = (
        grouped.filter(F.col("up") == 1)
        .groupBy("rid")
        .agg(F.count("*").alias("run_len"), F.min("day").alias("start_day"))
    )
    month = F.expr(
        "year(date_add(DATE'1970-01-01', cast(start_day as int))) * 100 "
        "+ month(date_add(DATE'1970-01-01', cast(start_day as int)))"
    )
    return runs.groupBy(month.cast("long").alias("month")).agg(
        F.count("*").cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("max_run"),
        F.sum("run_len").cast("long").alias("up_days"),
    )


def supplier_cosupply_degree(
    lineitem: DataFrame, max_part_suppliers: int = 64
) -> DataFrame:
    """(degree, n_suppliers): degree histogram of the supplier
    CO-SUPPLY graph — suppliers are adjacent when they ship the same
    part. The bipartite-projection census behind supplier-substitution
    analysis.

    Scale shape: the projection is quadratic in the per-part supplier
    fanout, so parts whose distinct-supplier count exceeds
    `max_part_suppliers` are EXCLUDED before pair enumeration — the
    same explicit hub cap as dedup's `max_shingle_df` (a hub part links
    everyone to everyone and carries no substitution signal). Within
    the cap the pair join is a bounded self-equi-join on partkey; the
    degree count then groups on supplier. Nothing here touches raw
    lineitem twice: the distinct (part, supplier) projection collapses
    the fact table first.
    """
    # materialize the distinct projection and the capped frame ONCE:
    # ps feeds both the fanout cap and the pair join, and kept feeds
    # both join sides — lazily that re-executed the fact-table scan 4×
    # per call (8 parquet scans in the physical plan, r12); now the
    # fact is scanned once and the ≤|distinct (part,supplier)| frames
    # are checkpointed (same discipline as winnow_overlap_pairs)
    ps = (
        lineitem.select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
        .localCheckpoint()
    )
    fanout = ps.groupBy("pk").agg(F.count("*").alias("n_supp"))
    kept = ps.join(
        fanout.filter(F.col("n_supp") <= max_part_suppliers).select("pk"),
        "pk",
    ).localCheckpoint()
    other = kept.select(F.col("pk"), F.col("sk").alias("sk2"))
    # degree = COUNT(DISTINCT partner): the two-phase distinct
    # aggregate dedups (sk, sk2) MAP-SIDE before the exchange, where
    # the former distinct-then-count shape shuffled the full Σ fanout²
    # pair enumeration twice (r12, guide §2.3 "aggregate before you
    # shuffle"; 18M pairs → ≤|S|² after the partial pass at sf0.1)
    deg = (
        kept.join(other, "pk")
        .filter(F.col("sk") != F.col("sk2"))
        .groupBy("sk")
        .agg(F.countDistinct("sk2").alias("degree"))
    )
    return deg.groupBy(F.col("degree").cast("long").alias("degree")).agg(
        F.count("*").cast("long").alias("n_suppliers")
    )


def lorenz_curve_points(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(decile, k_customers, cum_cents, total_cents): exact Lorenz
    curve of customer revenue concentration — for each population
    decile q, the revenue held by the poorest k_q = (n·q) div 10
    customers, computed on the revenue-value histogram with the partial
    tie group split exactly: cum_cents(k_q) = Σ full groups below +
    (k_q − cum_before)·value. Customers with no orders participate at
    revenue 0 (they are the concentration story's denominator). The
    Gini coefficient and any Lorenz plot derive from these 10 integer
    rows caller-side.

    Scale shape: one per-customer revenue aggregation (+ left join to
    keep zero-revenue customers), one value-histogram shuffle, one
    bounded cumulative window, a 10-literal probe explode.
    """
    rev = (
        customer.select("c_custkey")
        .join(
            orders.groupBy("o_custkey").agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    "cents"
                )
            ),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    hist = rev.groupBy("cents").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("cents")
    cum = hist.select(
        "cents",
        "cnt",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.coalesce(
            F.sum(F.col("cnt") * F.col("cents")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cents_before"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
        F.sum(F.col("cnt") * F.col("cents"))
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("total"),
    )
    probes = cum.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile")
    ).withColumn("k", F.expr("(n * decile) div 10"))
    picks = probes.filter(
        (F.col("cum") - F.col("cnt") < F.col("k")) & (F.col("k") <= F.col("cum"))
    )
    return picks.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("k").cast("long").alias("k_customers"),
        (
            F.col("cents_before")
            + (F.col("k") - (F.col("cum") - F.col("cnt"))) * F.col("cents")
        )
        .cast("long")
        .alias("cum_cents"),
        F.col("total").cast("long").alias("total_cents"),
    )


def tukey_fence_census(lineitem: DataFrame) -> DataFrame:
    """(returnflag, n, q1_cents, q3_cents, n_low, n_high): Tukey
    1.5·IQR outlier census per return flag on extended price — the
    robust complement to `balance_outlier_census`'s z-score. Quartiles
    are present-value (type-1) picks at 0-indexed ranks (n−1) div 4 and
    (3(n−1)) div 4; the fences are scaled ×4 so the comparison is pure
    integers: 4·x < 10·q1 − 6·q3 flags low, 4·x > 10·q3 − 6·q1 flags
    high (both reductions of q1 − 1.5(q3−q1) and q3 + 1.5(q3−q1)).

    Scale shape: one value-histogram shuffle, quartile picks on the
    bounded per-flag frame, then one conditional re-aggregation of the
    histogram itself (never a second fact scan — counts ride the cnt
    column).
    """
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    hist = (
        lineitem.select(F.col("l_returnflag").alias("returnflag"), cents.alias("cents"))
        .groupBy("returnflag", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("returnflag").orderBy("cents")
    cum = hist.select(
        "returnflag",
        "cents",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
    )
    q1r = F.expr("(n - 1) div 4")
    q3r = F.expr("(3 * (n - 1)) div 4")
    quartiles = (
        cum.filter(
            ((F.col("cum") - F.col("cnt") <= q1r) & (q1r < F.col("cum")))
            | ((F.col("cum") - F.col("cnt") <= q3r) & (q3r < F.col("cum")))
        )
        .groupBy("returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("cnt") <= q1r) & (q1r < F.col("cum")),
                    F.col("cents"),
                )
            ).alias("q1_cents"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("cnt") <= q3r) & (q3r < F.col("cum")),
                    F.col("cents"),
                )
            ).alias("q3_cents"),
        )
    )
    flagged = hist.join(quartiles, "returnflag")
    return flagged.groupBy("returnflag").agg(
        F.max("n").cast("long").alias("n"),
        F.max("q1_cents").cast("long").alias("q1_cents"),
        F.max("q3_cents").cast("long").alias("q3_cents"),
        F.sum(
            F.when(
                4 * F.col("cents") < 10 * F.col("q1_cents") - 6 * F.col("q3_cents"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_low"),
        F.sum(
            F.when(
                4 * F.col("cents") > 10 * F.col("q3_cents") - 6 * F.col("q1_cents"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_high"),
    )


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col_name, n, n_null, n_distinct, min_str, max_str): the
    data-quality profile every ingestion gate runs — per column: row
    count, null count, EXACT distinct count (nulls excluded), and
    lexicographic min/max of the STRINGIFIED values (stringification is
    the documented contract: one melt handles every dtype uniformly and
    the profile stays engine-portable; numeric min/max belongs to the
    typed operators).

    Scale shape: one melt (explode of a per-row struct array — a narrow
    map producing |cols|·n rows, no shuffle) feeding a single
    map-side-combined aggregation keyed by col_name; the exact distinct
    adds the usual two-phase expansion inside the same aggregate. For
    very wide tables profile in column batches; each batch stays one
    pass over the scan.
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.col_name", "kv.v")
    return melted.groupBy("col_name").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.min("v").alias("min_str"),
        F.max("v").alias("max_str"),
    )


def trimmed_sum_census(lineitem: DataFrame, trim_tenths: int = 1) -> DataFrame:
    """(returnflag, n, lo_cents, hi_cents, kept_n, kept_sum_cents): the
    exact grouped TRIMMED-SUM — rows at or below the trim_tenths/10
    quantile value and at or above the (10−trim_tenths)/10 quantile
    value are dropped, the interior summed exactly. kept_sum/kept_n is
    the trimmed mean; pairing with `tukey_fence_census` covers the two
    standard robust families (quantile-trim vs IQR-fence). Trimming is
    VALUE-based (the type-1 quantile values bound the kept range), the
    convention a histogram can honor exactly without per-row ranks.

    Scale shape: one value-histogram shuffle; quantile picks and the
    conditional re-aggregation both ride the bounded per-flag frame —
    the fact table is scanned once.
    """
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    hist = (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"), cents.alias("cents")
        )
        .groupBy("returnflag", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("returnflag").orderBy("cents")
    cum = hist.select(
        "returnflag",
        "cents",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
    )
    lo_r = F.expr(f"((n - 1) * {trim_tenths}) div 10")
    hi_r = F.expr(f"((n - 1) * {10 - trim_tenths}) div 10")
    bounds = (
        cum.filter(
            ((F.col("cum") - F.col("cnt") <= lo_r) & (lo_r < F.col("cum")))
            | ((F.col("cum") - F.col("cnt") <= hi_r) & (hi_r < F.col("cum")))
        )
        .groupBy("returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("cnt") <= lo_r) & (lo_r < F.col("cum")),
                    F.col("cents"),
                )
            ).alias("lo_cents"),
            F.max(
                F.when(
                    (F.col("cum") - F.col("cnt") <= hi_r) & (hi_r < F.col("cum")),
                    F.col("cents"),
                )
            ).alias("hi_cents"),
        )
    )
    kept = hist.join(bounds, "returnflag").filter(
        (F.col("cents") > F.col("lo_cents")) & (F.col("cents") < F.col("hi_cents"))
    )
    return (
        bounds.join(
            kept.groupBy("returnflag").agg(
                F.sum("cnt").alias("kept_n"),
                F.sum(F.col("cnt") * F.col("cents")).alias("kept_sum_cents"),
            ),
            "returnflag",
            "left",
        )
        .select(
            "returnflag",
            F.col("n").cast("long").alias("n"),
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
            F.coalesce("kept_n", F.lit(0)).cast("long").alias("kept_n"),
            F.coalesce("kept_sum_cents", F.lit(0))
            .cast("long")
            .alias("kept_sum_cents"),
        )
    )


def measure_crossproducts(lineitem: DataFrame) -> DataFrame:
    """(returnflag, n, sum_q, sum_p, sum_d, spp, sqq, sdd, sqp, sqd,
    spd): the full 3-variable second-moment sufficient-statistic block
    for (quantity-units, price-cents, discount-bps) per return flag —
    every pairwise covariance/correlation and the OLS normal equations
    derive caller-side from these integers. Cross products go
    DECIMAL(38,0) ENGINE-side: price-cents × price-cents × row counts
    overflows BIGINT beyond ~sf100. The DuckDB twin's final BIGINT
    cast (required: wide-decimal outputs surface as float64 and break
    the driver hash) holds through sf0.1 with 1.24× headroom
    (measured: max spp 7.4e18 vs 2^63 ≈ 9.2e18); an oracle run beyond
    that SF must emit dollars (p/100) instead of cents.

    Scale shape: ONE map-side-combined aggregation over the scan;
    nothing else.
    """
    DEC = "decimal(38,0)"
    q = F.round(F.col("l_quantity")).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    d = F.round(F.col("l_discount") * 10000).cast("long")
    sel = lineitem.select(
        F.col("l_returnflag").alias("returnflag"),
        q.alias("q"),
        p.alias("p"),
        d.alias("d"),
    )
    def cp(a: str, b: str, name: str):
        return F.sum(F.col(a).cast(DEC) * F.col(b).cast(DEC)).cast(DEC).alias(name)
    return sel.groupBy("returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum("p").cast("long").alias("sum_p"),
        F.sum("d").cast("long").alias("sum_d"),
        cp("p", "p", "spp"),
        cp("q", "q", "sqq"),
        cp("d", "d", "sdd"),
        cp("q", "p", "sqp"),
        cp("q", "d", "sqd"),
        cp("p", "d", "spd"),
    )


def revenue_cube(orders: DataFrame) -> DataFrame:
    """(gid, year, priority, n, revenue_cents): the full CUBE over
    (order year × priority level) of order counts and revenue — all
    four grouping-set layers (cells, per-year totals, per-priority
    totals, grand total) in ONE aggregation pass. The missing OLAP
    shape next to the TPC-H suite's fixed-grain rollups: a reporting
    layer asks for every marginal at once, and expressing it as a cube
    lets Spark compute the expanded grouping sets with a single
    shuffle (the Expand operator replicates each input row once per
    set, all layers map-side-combined) instead of 4 separate scans.

    `gid` is Spark's `grouping_id()` (bit per dimension, first listed
    = MSB: 0 = cell, 1 = priority rolled up, 2 = year rolled up,
    3 = grand total) — the DuckDB twin's GROUPING(year, priority)
    follows the identical convention. Rolled-up dimension values are
    COALESCEd to −1 (a sentinel outside both domains) so the output
    carries no NULLs into the driver's value hash.

    Scale shape: the Expand doubles-per-dimension the aggregation
    input (4× here), but every layer partial-aggregates map-side, so
    the shuffle carries ≤ (years+1)·(priorities+1) cells per map task
    — the classic cube trade and the reason to keep cube dimensions
    LOW-cardinality (this one is ~8×5)."""
    year = F.year("o_orderdate").cast("long")
    prio = F.substring("o_orderpriority", 1, 1).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(year.alias("year"), prio.alias("priority"),
                      cents.alias("cents"))
        .cube("year", "priority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            "gid",
            F.coalesce("year", F.lit(-1)).cast("long").alias("year"),
            F.coalesce("priority", F.lit(-1)).cast("long").alias("priority"),
            "n",
            "revenue_cents",
        )
    )
