"""Distribution-shift and rank-statistic sufficient statistics.

A 100 TB training-data pipeline constantly asks "did this slice drift?"
— new crawl vs old crawl, source A vs source B, this week's events vs
last week's. The canonical answers are classical nonparametric tests
(Mann-Whitney U, two-sample Kolmogorov-Smirnov, Spearman rank
correlation, Mood's median test), and every one of them reduces to
rank/CDF arithmetic that a distributed engine can compute EXACTLY in
integers — no float p-value machinery required engine-side. Each
operator here emits the test's *sufficient statistics* as
integer/decimal columns (the caller applies the final closed-form
normal approximation driver-side on a handful of scalars), so the
DuckDB oracles verify the heavy distributed part bit-for-bit.

Shared scale shape: every operator first collapses the fact table to a
DISTINCT-VALUE HISTOGRAM (one map-side-combined aggregation — the only
fact-sized shuffle), then runs rank windows over that bounded histogram
rather than over raw rows. Ranks per row are recovered by joining the
per-value rank back (hash join on the value), never by a global
per-row window — the same exact-quantile discipline as
`functions/quantiles.py` and `olap.interpolated_median_stats`.

Tie handling is the textbook convention throughout: average ranks,
kept integer by DOUBLING (avg rank of a tie group = cum_before +
(t+1)/2, so 2·rank = 2·cum_before + t + 1 is always integral).
Columns carrying doubled ranks or their products are named ``*2*`` and
documented per operator.

Reference scope: the reference repo (punit170/
Big-Data-Graph-Analysis-with-Spark) has no statistics surface beyond
its YAML counters (Main.scala:52-214); this module is part of the
beyond-reference LLM-data-pipeline layer (drift gates between corpus
snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def _cents(col: str) -> F.Column:
    """HALF_UP integer cents — the engine-wide exact-money convention."""
    return F.round(F.col(col) * 100).cast("long")


def _cum_before(order_col: str, *partition: str) -> F.Column:
    """Count of rows strictly before this histogram row (0 for the
    first), i.e. the number of values smaller than this one."""
    w = Window.partitionBy(*partition).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return F.coalesce(F.sum("cnt").over(w), F.lit(0))


def mann_whitney_u(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """(n_a, n_b, r2_a, u2_a, u2_b): Mann-Whitney U sufficient stats
    comparing order totals (cents) between two customer segments.

    r2_a = Σ over segment-A orders of the DOUBLED pooled average rank
    (ties averaged), u2_a = r2_a − n_a(n_a+1) = 2·U_A, and
    u2_b = 2·n_a·n_b − u2_a = 2·U_B (the identity U_A + U_B = n_a·n_b
    doubles along). The caller halves and normalizes; everything
    engine-side is exact DECIMAL(38,0) — rank-sum × count products
    overflow BIGINT beyond ~sf1000, so the output commits to decimal.

    Scale shape: one fact-sized groupBy(cents) histogram shuffle, one
    single-partition window over the bounded distinct-cents frame, one
    scalar aggregate. The segment dimension joins pre-histogram via the
    orders→customer hash join (customer scales with SF — no broadcast
    hint; AQE decides).
    """
    seg = customer.select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    )
    tagged = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(seg, orders.o_custkey == seg.c_custkey)
        .select("cents", (F.col("c_mktsegment") == seg_a).alias("is_a"))
    )
    hist = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cnt_b"),
        F.count("*").alias("cnt"),
    )
    ranked = hist.withColumn("cum_before", _cum_before("cents"))
    # doubled average rank of every row at this value:
    # 2*cum_before + cnt + 1
    agg = ranked.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
        F.sum(
            F.col("cnt_a").cast(DEC)
            * (2 * F.col("cum_before") + F.col("cnt") + 1).cast(DEC)
        )
        .cast(DEC)
        .alias("r2_a"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "r2_a",
        (
            F.col("r2_a")
            - F.col("n_a").cast(DEC) * (F.col("n_a") + 1).cast(DEC)
        )
        .cast(DEC)
        .alias("u2_a"),
        (
            2 * F.col("n_a").cast(DEC) * F.col("n_b").cast(DEC)
            - F.col("r2_a")
            + F.col("n_a").cast(DEC) * (F.col("n_a") + 1).cast(DEC)
        )
        .cast(DEC)
        .alias("u2_b"),
    )


def ks_two_sample(documents: DataFrame) -> DataFrame:
    """(n_a, n_b, d_num, at_chars): two-sample Kolmogorov-Smirnov
    distance between the document-length (n_chars) distributions of
    the even-numbered and odd-numbered sources, as the EXACT fraction
    D = d_num / (n_a·n_b) — cross-multiplied so the sup is taken over
    integers, never floats. `at_chars` is the smallest length at which
    the sup is attained (deterministic tie-break). A source string with
    no digits casts to NULL → NULL group, and the CASE sums count the
    row in NEITHER sample (its length still lands in the histogram with
    zero counts); the DuckDB twin uses TRY_CAST for the same semantics.

    Scale shape: one histogram shuffle on (n_chars), one
    single-partition window over the bounded distinct-lengths frame
    (document lengths are capped by the corpus contract), then a
    2-round scalar argmax (max, then min-value-attaining filter) — the
    same pattern as the exact-mode query, no per-row global window.
    """
    grp = F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("long") % 2
    hist = (
        documents.select(F.col("n_chars"), (grp == 0).alias("is_a"))
        .groupBy("n_chars")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cnt_b"),
        )
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_chars",
        F.sum("cnt_a").over(w).alias("cum_a"),
        F.sum("cnt_b").over(w).alias("cum_b"),
        F.sum("cnt_a")
        .over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_a"),
        F.sum("cnt_b")
        .over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_b"),
    )
    diffs = cum.select(
        "n_chars",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a").cast(DEC) * F.col("n_b").cast(DEC)
            - F.col("cum_b").cast(DEC) * F.col("n_a").cast(DEC)
        )
        .cast(DEC)
        .alias("d"),
    )
    # global-window argmax over the bounded distinct-lengths frame —
    # the scalar-max self-join re-executed the documents→histogram→
    # cumulative subtree twice per call (r12, same fix as pettitt)
    mx = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        diffs.withColumn("d_num", F.max("d").over(mx))
        .filter(F.col("d") == F.col("d_num"))
        .groupBy()
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max("d_num").cast(DEC).alias("d_num"),
            F.min("n_chars").cast("long").alias("at_chars"),
        )
    )


def spearman_rank_corr(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """(n, sum_d2, tie_x, tie_y): Spearman rank-correlation sufficient
    statistics between customer account balance (cents) and the
    customer's order count. `sum_d2` is Σ(2·rx − 2·ry)² = 4·Σd² over
    DOUBLED average ranks (the caller divides by 4); tie_x/tie_y are
    Σ(t³−t) over the tie groups of each variable, the standard tie
    correction. Customers with no orders participate with y = 0 (a
    large, intentional tie group exercising the correction).

    Scale shape: per-variable DISTINCT-VALUE histograms carry the rank
    windows (bounded frames); per-customer doubled ranks come back via
    two hash joins on the value — never a global per-row window. The
    orders→customer count is one map-side-combined aggregation; the
    left join keeps zero-order customers.
    """
    per_cust = (
        customer.select(
            "c_custkey", _cents("c_acctbal").alias("x")
        )
        .join(
            orders.groupBy("o_custkey").agg(F.count("*").alias("y")),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select("c_custkey", "x", F.coalesce("y", F.lit(0)).alias("y"))
    )

    def rank2_map(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy(col).agg(F.count("*").alias("cnt"))
        return hist.select(
            col,
            (2 * _cum_before(col) + F.col("cnt") + 1).alias(f"r2_{col}"),
        )
    rx = rank2_map(per_cust, "x")
    ry = rank2_map(per_cust, "y")
    joined = per_cust.join(rx, "x").join(ry, "y")
    return joined.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            (
                (F.col("r2_x") - F.col("r2_y")).cast(DEC)
                * (F.col("r2_x") - F.col("r2_y")).cast(DEC)
            )
        )
        .cast(DEC)
        .alias("sum_d2"),
    )


def spearman_tie_terms(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """(var, tie_sum): Σ(t³−t) per variable for the Spearman tie
    correction — computed on the distinct-value histograms directly
    (one row per variable), companion to :func:`spearman_rank_corr`.
    """
    per_cust = (
        customer.select("c_custkey", _cents("c_acctbal").alias("x"))
        .join(
            orders.groupBy("o_custkey").agg(F.count("*").alias("y")),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
    )

    def ties(col: str) -> DataFrame:
        return (
            per_cust.groupBy(col)
            .agg(F.count("*").alias("t"))
            .agg(
                F.lit(col).alias("var"),
                F.sum(
                    F.col("t").cast(DEC) * F.col("t").cast(DEC) * F.col("t").cast(DEC)
                    - F.col("t").cast(DEC)
                )
                .cast(DEC)
                .alias("tie_sum"),
            )
        )
    return ties("x").unionByName(ties("y"))


def mood_median_inputs(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, n_below, n_equal, n_above, median_cents): Mood's
    median-test contingency inputs — each customer segment's order
    totals split against the POOLED median (present-value lo
    convention: the value at 0-indexed rank (n−1) div 2, exactly
    `percentile_disc(0.5)`). The caller chi-squares the 2×k table;
    engine-side everything is integer-exact.

    Scale shape: the pooled median rides the usual histogram+window
    covering-row pick (bounded frame); the scalar joins back via a
    1-row broadcast cross join; the per-segment split is one
    map-side-combined aggregation over the orders→customer join.
    """
    cents = orders.select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    hist = cents.groupBy("cents").agg(F.count("*").alias("cnt"))
    w_all = Window.orderBy("cents")
    cum = hist.select(
        "cents",
        "cnt",
        F.sum("cnt")
        .over(w_all.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    lo_rank = F.expr("(n - 1) div 2")
    median = (
        cum.filter(
            (F.col("cum") - F.col("cnt") <= lo_rank) & (lo_rank < F.col("cum"))
        )
        .select(F.col("cents").alias("median_cents"))
        .limit(1)
    )
    seg = customer.select("c_custkey", "c_mktsegment")
    tagged = cents.join(seg, cents.o_custkey == seg.c_custkey).crossJoin(
        F.broadcast(median)
    )
    return (
        tagged.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(F.col("cents") < F.col("median_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("cents") == F.col("median_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_equal"),
            F.sum(F.when(F.col("cents") > F.col("median_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.max("median_cents").cast("long").alias("median_cents"),
        )
    )


def qq_decile_table(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """(decile, a_cents, b_cents, diff_cents): the Q-Q table — exact
    present-value deciles (0-indexed rank (n−1)·q div 10, the
    percentile_disc/type-1 convention) of order totals for two customer
    segments, side by side. The drift analyst's first plot, as 9 exact
    integer rows.

    Scale shape: one histogram shuffle per the pooled fact scan, rank
    windows per segment over bounded distinct-cents frames, a 9-literal
    explode for the decile probes (no range join), and a 9-row pivot.
    """
    seg = customer.select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    )
    hist = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(seg, orders.o_custkey == seg.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "cents")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("seg").orderBy("cents")
    cum = hist.select(
        "seg",
        "cents",
        "cnt",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
    )
    probes = cum.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("decile")
    ).withColumn("want", F.expr("((n - 1) * decile) div 10"))
    picks = probes.filter(
        (F.col("cum") - F.col("cnt") <= F.col("want"))
        & (F.col("want") < F.col("cum"))
    )
    return (
        picks.groupBy("decile")
        .agg(
            F.max(F.when(F.col("seg") == seg_a, F.col("cents")))
            .cast("long")
            .alias("a_cents"),
            F.max(F.when(F.col("seg") == seg_b, F.col("cents")))
            .cast("long")
            .alias("b_cents"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "a_cents",
            "b_cents",
            (F.col("a_cents") - F.col("b_cents")).alias("diff_cents"),
        )
    )


def size_tie_census(part: DataFrame) -> DataFrame:
    """(brand, n, n_sizes, max_tie, tie_pairs): tie-structure census of
    part sizes per brand — n rows, distinct sizes, largest tie group,
    and Σ t(t−1)/2 tied pairs (the quantity rank-variance corrections
    need exactly these). All from one two-level aggregation; no window.

    Scale shape: groupBy(brand, size) is map-side-combined down to a
    bounded frame (brands × 50 sizes) before the per-brand rollup.
    """
    by_size = part.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size")
    ).agg(F.count("*").alias("t"))
    return by_size.groupBy("brand").agg(
        F.sum("t").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_sizes"),
        F.max("t").cast("long").alias("max_tie"),
        F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("tie_pairs"),
    )


def percent_rank_band_census(supplier: DataFrame) -> DataFrame:
    """(band, n_suppliers, min_cents, max_cents): suppliers bucketed by
    the integer-exact percent_rank decile of their account balance —
    band = ((rank−1)·10) div (n−1) clamped to 9, with rank = the MIN
    rank of the value (SQL rank() semantics), so every member of a tie
    lands in the same band. Spelled as explicit integer arithmetic so
    both engines agree bit-for-bit (float percent_rank() would be
    libm-identical here, but the integer form removes the question).

    Scale shape: computed entirely on the distinct-balance histogram
    (rank = cumulative count before + 1); the band census needs no
    join-back because tie groups share a band by construction.
    """
    hist = supplier.select(_cents("s_acctbal").alias("cents")).groupBy(
        "cents"
    ).agg(F.count("*").alias("cnt"))
    w_all = Window.orderBy("cents")
    ranked = hist.select(
        "cents",
        "cnt",
        (
            F.coalesce(
                F.sum("cnt").over(
                    w_all.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + 1
        ).alias("rnk"),
        F.sum("cnt")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    banded = ranked.select(
        "cents",
        "cnt",
        F.least(
            F.lit(9),
            F.expr("((rnk - 1) * 10) div greatest(n - 1, 1)"),
        ).alias("band"),
    )
    return banded.groupBy("band").agg(
        F.sum("cnt").cast("long").alias("n_suppliers"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    ).select(F.col("band").cast("long").alias("band"), "n_suppliers",
             "min_cents", "max_cents")


def kendall_tau_band_inputs(part: DataFrame) -> DataFrame:
    """(n, c_pairs, d_pairs, tie_row, tie_col): Kendall tau-b
    sufficient statistics between part size and the percent-rank decile
    band of retail price, computed on the BANDED CONTINGENCY TABLE —
    concordant/discordant pair mass is a self-join over the bounded
    cell grid (≤ 50 sizes × 10 bands), never over rows. tie_row/tie_col
    are Σ over marginal tie groups of t(t−1)/2 (the tau-b denominators
    need exactly these; the cell products go DECIMAL(38,0) since
    n_ij·n_kl exceeds BIGINT beyond ~sf1000).

    Banding the continuous variable first is the standard scale move:
    exact tau on raw values needs an O(n log n) inversion count that
    neither engine exposes declaratively, while tau on the banded table
    is exact FOR THE BANDED VARIABLES and all arithmetic is integral.
    """
    hist = part.select(_cents("p_retailprice").alias("cents")).groupBy(
        "cents"
    ).agg(F.count("*").alias("cnt"))
    w_all = Window.orderBy("cents")
    ranked = hist.select(
        "cents",
        "cnt",
        (
            F.coalesce(
                F.sum("cnt").over(
                    w_all.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + 1
        ).alias("rnk"),
        F.sum("cnt")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    bands = ranked.select(
        "cents",
        F.least(
            F.lit(9), F.expr("((rnk - 1) * 10) div greatest(n - 1, 1)")
        ).alias("band"),
    )
    cells = (
        part.select(
            F.col("p_size").alias("size"), _cents("p_retailprice").alias("cents")
        )
        .join(bands, "cents")
        .groupBy("size", "band")
        .agg(F.count("*").alias("m"))
    )
    a = cells.select(
        F.col("size").alias("i"), F.col("band").alias("j"), F.col("m").alias("m1")
    )
    b = cells.select(
        F.col("size").alias("k"), F.col("band").alias("l"), F.col("m").alias("m2")
    )
    pairs = a.join(b, (F.col("k") > F.col("i")))
    conc = pairs.filter(F.col("l") > F.col("j"))
    disc = pairs.filter(F.col("l") < F.col("j"))
    DECm = (F.col("m1").cast(DEC) * F.col("m2").cast(DEC))
    c_pairs = conc.agg(F.sum(DECm).cast(DEC).alias("c_pairs"))
    d_pairs = disc.agg(F.sum(DECm).cast(DEC).alias("d_pairs"))
    tie_row = (
        cells.groupBy("size")
        .agg(F.sum("m").alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2").cast(DEC)).cast(DEC).alias("tie_row")
        )
    )
    tie_col = (
        cells.groupBy("band")
        .agg(F.sum("m").alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) div 2").cast(DEC)).cast(DEC).alias("tie_col")
        )
    )
    n = cells.agg(F.sum("m").cast("long").alias("n"))
    return (
        n.crossJoin(F.broadcast(c_pairs))
        .crossJoin(F.broadcast(d_pairs))
        .crossJoin(F.broadcast(tie_row))
        .crossJoin(F.broadcast(tie_col))
        .select(
            "n",
            F.coalesce(F.col("c_pairs"), F.lit(0).cast(DEC)).alias("c_pairs"),
            F.coalesce(F.col("d_pairs"), F.lit(0).cast(DEC)).alias("d_pairs"),
            "tie_row",
            "tie_col",
        )
    )


def wilcoxon_signed_rank(
    orders: DataFrame, year_a: int = 1995, year_b: int = 1996
) -> DataFrame:
    """(n_pairs, n_pos, n_neg, n_zero, w2_pos, w2_neg): Wilcoxon
    signed-rank sufficient statistics on the PAIRED per-customer annual
    revenue change year_a → year_b (customers active in both years).
    Zero differences are dropped per the standard convention (counted
    in n_zero); |d| ranks are doubled tie-averaged, so
    w2_pos + w2_neg = 2·Σranks = n(n+1) — an identity the tests pin.

    Scale shape: two year-filtered aggregations of the fact table
    (filters push into the scan), an inner join on customer, then the
    rank machinery on the DISTINCT |d| histogram with a join-back —
    the hypotests discipline: windows only over bounded frames.
    """
    def year_rev(y: int, alias: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == y)
            .groupBy("o_custkey")
            .agg(F.sum(_cents("o_totalprice")).alias(alias))
        )
    paired = year_rev(year_a, "rev_a").join(year_rev(year_b, "rev_b"), "o_custkey")
    diffs = paired.select(
        (F.col("rev_b") - F.col("rev_a")).alias("d")
    )
    nz = diffs.filter(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("ad"), (F.col("d") > 0).alias("pos")
    )
    hist = nz.groupBy("ad").agg(F.count("*").alias("cnt"))
    r2 = hist.select(
        "ad", (2 * _cum_before("ad") + F.col("cnt") + 1).alias("r2")
    )
    ranked = nz.join(r2, "ad")
    zero = diffs.filter(F.col("d") == 0).agg(
        F.count("*").cast("long").alias("n_zero")
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos"), F.col("r2")).otherwise(0))
        .cast(DEC)
        .alias("w2_pos"),
        F.sum(F.when(~F.col("pos"), F.col("r2")).otherwise(0))
        .cast(DEC)
        .alias("w2_neg"),
    )
    return agg.crossJoin(F.broadcast(zero)).select(
        "n_pairs", "n_pos", "n_neg", "n_zero", "w2_pos", "w2_neg"
    )


def cvm_two_sample(
    events: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """(n_a, n_b, sum_sq_dev): Cramér–von Mises two-sample sufficient
    statistic — Σ over POOLED observations of (cumA·n_b − cumB·n_a)²,
    exactly (each distinct value contributes with multiplicity cnt).
    The companion functional to `ks_two_sample`: KS takes the sup of
    the same integer deviation process, CvM integrates its square —
    sensitive to distributed (not just peak) drift. The caller applies
    the T = U/(n_a·n_b·N) − (4·n_a·n_b − 1)/(6N) normalization on
    scalars; sum_sq_dev is DECIMAL(38,0) (squared counts).

    Exactness bound: sum_sq_dev ~ N·(n_a·n_b)², which exceeds 38
    digits (Spark: silent NULL; DuckDB HUGEINT: error) around ~1e8
    rows per sample — ~10 TB of events at this row width. Beyond that,
    pre-bucket values (the `windowed_ks_vs_reference` discipline) so
    cum· terms are bounded by bucket counts; at every test SF the
    statistic is ≤ ~7e16 (fits BIGINT, 2 digits of 38 used).

    Scale shape: identical to ks_two_sample — one value-histogram
    shuffle, one bounded cumulative window, one scalar aggregate.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    hist = (
        events.filter(F.col("event_type").isin(type_a, type_b))
        .select(cents.alias("cents"), (F.col("event_type") == type_a).alias("is_a"))
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cnt_b"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w).alias("cum_a"),
        F.sum("cnt_b").over(w).alias("cum_b"),
        F.sum("cnt_a").over(wall).alias("n_a"),
        F.sum("cnt_b").over(wall).alias("n_b"),
    )
    dev = (
        F.col("cum_a").cast(DEC) * F.col("n_b").cast(DEC)
        - F.col("cum_b").cast(DEC) * F.col("n_a").cast(DEC)
    )
    return cum.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(dev * dev * (F.col("cnt_a") + F.col("cnt_b")).cast(DEC))
        .cast(DEC)
        .alias("sum_sq_dev"),
    )


def ab_proportion_inputs(events: DataFrame, buckets: int = 2) -> DataFrame:
    """(arm, n_users, n_events, n_purchases): the two-proportion z-test
    inputs for a DETERMINISTIC hash-split experiment — users land in
    arm A/B by md5-56 parity of user_id, so the split (unlike an rng
    assignment) is replayable across engines and reruns; the caller
    z-tests the purchase-rate difference on four scalars. Event-level
    purchase share is the metric (every user converts at least once in
    this corpus, so a user-level conversion flag would be degenerate —
    documented, not hidden).

    Scale shape: one map-side-combined aggregation; the hash stays in
    whole-stage codegen. The user count per arm is an exact distinct
    (one extra shuffle on user_id within the same groupBy).
    """
    from ..functions.hashing import hash56

    arm = (hash56(F.col("user_id").cast("string")) % buckets).alias("arm")
    return (
        events.groupBy(arm)
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_purchases"),
        )
        .select(F.col("arm").cast("long").alias("arm"), "n_users",
                "n_events", "n_purchases")
    )


def mann_kendall_trend(orders: DataFrame) -> DataFrame:
    """(n_days, s_stat, tie_term): Mann-Kendall trend test on daily
    revenue — S = Σ_{i<j} sign(x_j − x_i) over ALL day pairs, plus the
    tie correction Σ t(t−1)(2t+5) over tied daily values (the variance
    denominator). THE standard monotone-trend test for series; exact
    integers throughout (S is bounded by days², and the day count is
    CALENDAR-bounded — it does not grow with SF, so the pairwise
    self-join is scale-constant ~3M pairs, not a data-sized quadratic;
    the docstring states this invariant because it is load-bearing).
    """
    from .olap import _daily_revenue_cents

    daily = _daily_revenue_cents(orders)
    a = daily.select(F.col("day").alias("di"), F.col("cents").alias("xi"))
    b = daily.select(F.col("day").alias("dj"), F.col("cents").alias("xj"))
    s = (
        a.join(b, F.col("dj") > F.col("di"))
        .agg(
            F.sum(
                F.when(F.col("xj") > F.col("xi"), 1)
                .when(F.col("xj") < F.col("xi"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie_term")
        )
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select("n_days", "s_stat", "tie_term")
    )


def runs_test_inputs(orders: DataFrame) -> DataFrame:
    """(n_above, n_below, n_runs): Wald–Wolfowitz runs-test inputs on
    daily revenue around the pooled daily median (present-value lo
    convention; days EQUAL to the median are dropped, the standard
    continuous-data treatment). A run flips when the above/below sign
    changes between consecutive retained days; too few runs = trend,
    too many = oscillation. Caller normalizes on three scalars.

    Scale shape: bounded daily frame; the median pick, the sign lag,
    and the flip count all ride |days|-row windows.
    """
    from .olap import _daily_revenue_cents

    daily = _daily_revenue_cents(orders)
    hist = daily.groupBy("cents").agg(F.count("*").alias("cnt"))
    w_all = Window.orderBy("cents")
    cum = hist.select(
        "cents",
        "cnt",
        F.sum("cnt").over(w_all.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt")
        .over(
            w_all.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    lo_rank = F.expr("(n - 1) div 2")
    median = (
        cum.filter(
            (F.col("cum") - F.col("cnt") <= lo_rank) & (lo_rank < F.col("cum"))
        )
        .select(F.col("cents").alias("med"))
        .limit(1)
    )
    signed = (
        daily.crossJoin(F.broadcast(median))
        .filter(F.col("cents") != F.col("med"))
        .select("day", (F.col("cents") > F.col("med")).alias("above"))
    )
    w = Window.orderBy("day")
    flips = signed.select(
        "above",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.col("above") != F.lag("above").over(w)),
            1,
        )
        .otherwise(0)
        .alias("flip"),
    )
    # coalesce: when EVERY day equals the median the retained frame is
    # empty and bare sums would return a single all-NULL row — the
    # contract is zeros (hypothesis found this; the oracle mirrors it)
    return flips.agg(
        F.coalesce(F.sum(F.when(F.col("above"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_above"),
        F.coalesce(F.sum(F.when(~F.col("above"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_below"),
        F.coalesce(F.sum("flip"), F.lit(0)).cast("long").alias("n_runs"),
    )


def pettitt_changepoint(orders: DataFrame) -> DataFrame:
    """(n_days, max_abs_u, at_day): Pettitt's rank-based changepoint
    test on daily revenue — the nonparametric sibling of
    `olap.revenue_cusum` (which tracks the mean; this tracks the rank
    process, immune to outliers). Uses the rank identity
    U_t = 2·W_t − t(n+1) with W_t the sum of tie-averaged ranks of the
    first t days; summing DOUBLED ranks gives W2_t = 2·W_t, so
    ``u_t = w2_t − t·(n+1)`` is exactly U_t and always integral (the
    sign-sum definition is integer-valued; ties contribute 0). The
    property suite verifies this identity implementation against the
    O(n²) pairwise-sign definition directly.

    `at_day` is the smallest day attaining the max (deterministic);
    the last day is excluded (U_n ≡ 0 by construction carries no
    signal).

    Scale shape: ranks from the distinct-value histogram join-back,
    then one cumulative window over the bounded daily frame — no
    pairwise join at all, unlike the definition.
    """
    from .olap import _daily_revenue_cents

    daily = _daily_revenue_cents(orders)
    hist = daily.groupBy("cents").agg(F.count("*").alias("cnt"))
    r2 = hist.select(
        "cents", (2 * _cum_before("cents") + F.col("cnt") + 1).alias("r2")
    )
    w = Window.orderBy("day")
    ranked = (
        daily.join(r2, "cents")
        .select(
            "day",
            F.row_number().over(w).alias("t"),
            F.sum("r2").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
                "w2"
            ),
            F.count("*")
            .over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("n"),
        )
    )
    dev = ranked.filter(F.col("t") < F.col("n")).select(
        "day",
        "n",
        F.abs(
            F.col("w2").cast(DEC)
            - F.col("t").cast(DEC) * (F.col("n") + 1).cast(DEC)
        )
        .cast(DEC)
        .alias("u_abs"),
    )
    # argmax via ONE global window over the day-bounded dev frame
    # (≤ date-range days at any SF) instead of a scalar-max self-join:
    # the join form re-executed the whole daily→hist→rank subtree
    # twice — orders was scanned 4× per call (r12, plan-verified)
    mx = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        dev.withColumn("max_abs_u", F.max("u_abs").over(mx))
        .filter(F.col("u_abs") == F.col("max_abs_u"))
        .groupBy()
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("max_abs_u").cast(DEC).alias("max_abs_u"),
            F.min("day").cast("long").alias("at_day"),
        )
    )


def seasonal_mann_kendall(orders: DataFrame) -> DataFrame:
    """(month_of_year, n_days, s_stat, tie_term): the seasonal
    Mann-Kendall decomposition — the trend test run WITHIN each
    calendar month across years (January days compared only to January
    days, …), so annual seasonality cannot masquerade as trend. The
    caller sums s_stat and the variance terms over the 12 rows for the
    overall seasonal test; per-row values localize which season trends.

    Scale shape: same calendar-bounded pairwise join as
    `mann_kendall_trend`, further partitioned by month-of-year (the
    join keys on month, shrinking pair counts ~12×).
    """
    from .olap import _daily_revenue_cents

    daily = _daily_revenue_cents(orders).withColumn(
        "moy",
        F.expr("month(date_add(DATE'1970-01-01', cast(day as int)))"),
    )
    a = daily.select(
        F.col("moy"), F.col("day").alias("di"), F.col("cents").alias("xi")
    )
    b = daily.select(
        F.col("moy").alias("moy_b"),
        F.col("day").alias("dj"),
        F.col("cents").alias("xj"),
    )
    s = (
        a.join(b, (a.moy == b.moy_b) & (F.col("dj") > F.col("di")))
        .groupBy("moy")
        .agg(
            F.sum(
                F.when(F.col("xj") > F.col("xi"), 1)
                .when(F.col("xj") < F.col("xi"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("moy").agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("moy", "cents")
        .agg(F.count("*").alias("t"))
        .groupBy("moy")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie_term")
        )
    )
    return (
        n.join(s, "moy", "left")
        .join(ties, "moy")
        .select(
            F.col("moy").cast("long").alias("month_of_year"),
            "n_days",
            F.coalesce("s_stat", F.lit(0)).cast("long").alias("s_stat"),
            "tie_term",
        )
    )


def mcnemar_inputs(
    orders: DataFrame, year_a: int = 1995, year_b: int = 1996
) -> DataFrame:
    """(n_00, n_01, n_10, n_11): the McNemar paired-proportion 2×2
    census — per-customer activity flags (placed ≥1 order) in year_a
    vs year_b over every customer appearing in the fact table. The
    off-diagonal discordant counts n_01 (inactive→active) and n_10
    (active→inactive) carry the whole test; the caller applies the
    χ² = (n_01−n_10)²/(n_01+n_10) form on two scalars. The binary
    companion to `wilcoxon_signed_rank` (same pairing, magnitude
    dropped): activation drift that revenue-magnitude tests dilute.

    Scale shape: one groupBy(custkey) with two boolean MAX aggregates
    (map-side combined), then one scalar conditional-count aggregate
    over the customer-sized frame. No window, no join.
    """
    yr = F.year("o_orderdate")
    flags = (
        orders.select(
            "o_custkey",
            (yr == year_a).alias("in_a"),
            (yr == year_b).alias("in_b"),
        )
        .groupBy("o_custkey")
        .agg(F.max("in_a").alias("a"), F.max("in_b").alias("b"))
    )

    def cell(a: bool, b: bool, name: str):
        return F.coalesce(
            F.sum(
                F.when((F.col("a") == a) & (F.col("b") == b), 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias(name)

    return flags.agg(
        cell(False, False, "n_00"),
        cell(False, True, "n_01"),
        cell(True, False, "n_10"),
        cell(True, True, "n_11"),
    )


def daily_count_autocorr(orders: DataFrame, max_lag: int = 7) -> DataFrame:
    """(lag, n_terms, sum_x, sum_y, sum_xx, sum_yy, sum_xy): exact
    lag-k cross-moment sufficient statistics of the DAILY ORDER COUNT
    series for k = 1..max_lag — the autocorrelogram (and the
    Durbin-Watson numerator, Σ(x_t − x_{t+1})² = sum_xx + sum_yy −
    2·sum_xy at lag 1) derives caller-side per lag. Counts, not cents:
    the volume series is the drift signal, and count products keep the
    BIGINT bound generous (~1e7 orders/day × 10k days before overflow;
    a cents version would overflow BIGINT already at ~sf1 — use
    `trailing_dyadic_revenue`'s frame with decimal sums for that).

    Pairs run over PRESENT days only (both t and t+k have ≥1 order) —
    the same gap-agnostic contract as `revenue_acceleration_census`,
    stated not hidden; at TPC-H-ish densities the daily frame has no
    gaps anyway.

    Scale shape: the fact collapses to the calendar-bounded daily
    frame first (ONE map-side-combined aggregation); the lag join then
    replicates that bounded frame max_lag times and equi-joins on
    day+k — |days|·max_lag tiny rows, never fact-sized. One final
    groupBy(lag) over those pairs.
    """
    from ..functions.eventtime import event_micros

    daily = (
        orders.select(event_micros(orders, "o_orderdate").alias("tus"))
        .select(F.expr("tus div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("x"))
    )
    heads = daily.select(
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
        F.col("day").alias("di"),
        F.col("x").alias("xi"),
    )
    tails = daily.select(F.col("day").alias("dj"), F.col("x").alias("xj"))
    pairs = heads.join(
        tails, F.col("dj") == F.col("di") + F.col("lag")
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("xi").cast("long").alias("sum_x"),
            F.sum("xj").cast("long").alias("sum_y"),
            F.sum(F.col("xi") * F.col("xi")).cast("long").alias("sum_xx"),
            F.sum(F.col("xj") * F.col("xj")).cast("long").alias("sum_yy"),
            F.sum(F.col("xi") * F.col("xj")).cast("long").alias("sum_xy"),
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_terms", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy",
        )
    )


def friedman_rank_inputs(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, n_blocks, r2_sum): Friedman-test rank sums — monthly
    revenue cells (block = calendar year·100+month, treatment =
    customer market segment, zero-filled on the full block×segment
    spine) ranked WITHIN each month across the segments, doubled
    tie-averaged ranks summed per segment. The repeated-measures "did
    any segment consistently out/under-earn, month over month?"
    question, immune to between-month level shifts that a pooled rank
    test would read as segment drift. Caller applies the Friedman χ²
    on k ≤ |segments| scalars; Σ r2_sum = n_blocks·k(k+1) (identity
    the tests pin).

    Scale shape: one fact-sized join+aggregation down to the bounded
    (months × segments) cell frame; the spine cross join and the
    within-block rank window run on that tiny frame (block size =
    |segments| ≤ a handful — the bounded-frame window discipline).
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    cells = (
        orders.select("o_custkey", cents.alias("cents"), ym.alias("ym"))
        .join(
            customer.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("ym", F.col("c_mktsegment").alias("segment"))
        .agg(F.sum("cents").alias("v"))
    )
    # zero-filled spine: a segment silent in a month still occupies a
    # rank slot (renamed keys — a spine derived from the frame it
    # joins back to hits "Conflicting attributes" otherwise). The
    # segment side is broadcast explicitly: it is value-bounded (≤ the
    # handful of market segments), but its lineage runs through the
    # customer join so Catalyst's size estimate can't see that — and an
    # un-broadcast cross join of two non-tiny-estimated sides lowers to
    # a CartesianProduct (caught by plan_audit at r12 registration).
    spine = (
        cells.select(F.col("ym").alias("s_ym")).distinct()
        .crossJoin(
            F.broadcast(
                cells.select(F.col("segment").alias("s_seg")).distinct()
            )
        )
    )
    full = spine.join(
        cells,
        (F.col("s_ym") == F.col("ym")) & (F.col("s_seg") == F.col("segment")),
        "left",
    ).select(
        F.col("s_ym").alias("ym"),
        F.col("s_seg").alias("segment"),
        F.coalesce("v", F.lit(0)).alias("v"),
    )
    hist = full.groupBy("ym", "v").agg(F.count("*").alias("cnt"))
    r2 = hist.select(
        "ym", "v", (2 * _cum_before("v", "ym") + F.col("cnt") + 1).alias("r2")
    )
    return (
        full.join(r2, ["ym", "v"])
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum("r2").cast("long").alias("r2_sum"),
        )
    )


def jonckheere_trend_inputs(orders: DataFrame) -> DataFrame:
    """(g, h, n_g, n_h, u2): Jonckheere–Terpstra ordered-alternative
    sufficient statistics — for every ordered pair of order-priority
    levels g < h (the leading digit of o_orderpriority, 1-URGENT …
    5-LOW), the DOUBLED Mann-Whitney count
    u2 = 2·#{x∈g, y∈h : x < y} + #{ties}, on order totals in cents.
    The caller sums u2/2 over the 10 rows for the J statistic ("do
    totals rise monotonically with priority?") — the between-group
    ordered counterpart to `friedman_rank_inputs`' within-block ranks.
    Identity pinned by tests: u2(g,h) + reversed u2(h,g) = 2·n_g·n_h.

    Scale shape: the fact collapses to a per-(group, value) histogram
    (one map-side-combined shuffle). Cross-VALUE comparisons then run
    on the pooled distinct-value GRID replicated per group (values ×
    G rows, zero-filled), with one per-group cumulative window over
    that value-domain-bounded frame — NEVER a value×value pairwise
    join (distinct cents ≈ rows here, so a banded self-join would be
    quadratic; the grid keeps it linear). The final pair term joins
    the G-wide grid with itself per value: values × G² tiny rows.
    """
    grp = F.substring("o_orderpriority", 1, 1).cast("long")
    hist = (
        orders.select(grp.alias("g"), _cents("o_totalprice").alias("cents"))
        .groupBy("g", "cents")
        .agg(F.count("*").alias("cnt"))
    )
    # zero-filled pooled grid: every group gets a row at every pooled
    # distinct value (renamed spine keys per the conflicting-attributes
    # rule), so per-group CDFs are comparable across groups at h's
    # value points without a cross-value join
    spine = (
        hist.select(F.col("cents").alias("s_cents")).distinct()
        .crossJoin(hist.select(F.col("g").alias("s_g")).distinct())
    )
    grid = spine.join(
        hist,
        (F.col("s_cents") == F.col("cents")) & (F.col("s_g") == F.col("g")),
        "left",
    ).select(
        F.col("s_g").alias("g"),
        F.col("s_cents").alias("cents"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "g", "cents", "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_lt"),
    )
    lo = cum.select(
        F.col("g").alias("g"), "cents",
        F.col("cnt").alias("cnt_g"), F.col("cum_lt").alias("cumlt_g"),
    )
    hi = cum.select(
        F.col("g").alias("h"),
        F.col("cents").alias("h_cents"),
        F.col("cnt").alias("cnt_h"),
    )
    sizes = hist.groupBy("g").agg(F.sum("cnt").cast("long").alias("n"))
    pair_u = (
        lo.join(hi, (F.col("cents") == F.col("h_cents"))
                & (F.col("g") < F.col("h")))
        .groupBy("g", "h")
        .agg(
            F.sum(
                F.col("cnt_h") * (2 * F.col("cumlt_g") + F.col("cnt_g"))
            ).cast("long").alias("u2")
        )
    )
    return (
        pair_u.join(sizes.select(F.col("g"), F.col("n").alias("n_g")), "g")
        .join(sizes.select(F.col("g").alias("h"), F.col("n").alias("n_h")),
              "h")
        .select("g", "h", "n_g", "n_h", "u2")
    )


def kruskal_wallis_inputs(orders: DataFrame) -> DataFrame:
    """(g, n_g, r2_g, t3_minus_t_pooled): Kruskal–Wallis k-sample
    rank-sum sufficient statistics — order totals (cents) ranked over
    the POOLED distribution, one row per order-priority level g (the
    leading digit of o_orderpriority, 1-URGENT … 5-LOW). r2_g is the
    DOUBLED tie-averaged rank sum of group g (the k-sample
    generalization of `mann_whitney_u`'s r2_a; halving recovers R_g,
    and Σ_g R_g = N(N+1)/2 is pinned by tests). t3_minus_t_pooled =
    Σ over pooled tie groups of (t³ − t), the tie-correction term of
    the H statistic, repeated on every row (it is a property of the
    pooled histogram, not of any group). The caller computes
    H = [12/(N(N+1)) · Σ R_g²/n_g − 3(N+1)] / [1 − Σ(t³−t)/(N³−N)]
    on k scalars driver-side.

    Scale shape: identical to `mann_whitney_u` with a group key — one
    fact-sized groupBy(g, cents) histogram shuffle, a pooled rollup of
    that bounded frame, one cumulative window over distinct cents, and
    a per-value hash join back (never a per-row rank window). r2_g and
    the cube term commit to DECIMAL(38,0): rank sums reach n_g·2N
    (~10²⁵ at sf1000) and tie cubes reach Σt³, both past BIGINT at
    extreme SF; at every test SF the values fit BIGINT, which is what
    the oracle casts to.
    """
    grp = F.substring("o_orderpriority", 1, 1).cast("long")
    hist = (
        orders.select(grp.alias("g"), _cents("o_totalprice").alias("cents"))
        .groupBy("g", "cents")
        .agg(F.count("*").alias("cnt_g"))
    )
    pooled = hist.groupBy("cents").agg(F.sum("cnt_g").alias("cnt"))
    ranked = pooled.select(
        "cents", "cnt", _cum_before("cents").alias("cum_before")
    )
    ties = ranked.agg(
        F.sum(
            F.col("cnt").cast(DEC) * F.col("cnt").cast(DEC) * F.col("cnt").cast(DEC)
            - F.col("cnt").cast(DEC)
        )
        .cast(DEC)
        .alias("t3_minus_t_pooled")
    )
    per_g = (
        hist.join(ranked, "cents")
        .groupBy("g")
        .agg(
            F.sum("cnt_g").cast("long").alias("n_g"),
            F.sum(
                F.col("cnt_g").cast(DEC)
                * (2 * F.col("cum_before") + F.col("cnt") + 1).cast(DEC)
            )
            .cast(DEC)
            .alias("r2_g"),
        )
    )
    return per_g.crossJoin(F.broadcast(ties)).select(
        "g", "n_g", "r2_g", "t3_minus_t_pooled"
    )


def mood_scale_inputs(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """(segment, n_g, m4_g): Mood SCALE-test sufficient statistics —
    the dispersion companion to `mood_median_inputs` (which tests
    location). Each order total is scored by its squared deviation
    from the pooled mid-rank: score_i = (rank_i − (N+1)/2)², with
    tie-averaged ranks. m4_g = 4·Σ_{i∈g} score_i stays exactly
    integral because with DOUBLED average ranks a2 (always an integer:
    2·cum_before + t + 1), 4·score = (a2 − (N+1))². The caller
    normalizes by the exact moments E[M] = n_g(N²−1)/12 driver-side.
    A group whose values sit in the tails scores high — drift in
    spread with equal medians, which the median test cannot see.

    Scale shape: `mann_whitney_u`'s exactly — histogram shuffle,
    bounded cumulative window, scalar aggregate; the squared doubled
    rank reaches (2N)² (~10²⁵ at sf1000), so m4_g commits to
    DECIMAL(38,0); test-SF values fit the oracle's BIGINT cast.
    """
    seg = customer.select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    )
    tagged = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(seg, orders.o_custkey == seg.c_custkey)
        .select("cents", F.col("c_mktsegment").alias("segment"))
    )
    hist = tagged.groupBy("segment", "cents").agg(F.count("*").alias("cnt_g"))
    pooled = hist.groupBy("cents").agg(F.sum("cnt_g").alias("cnt"))
    ranked = pooled.select(
        "cents",
        "cnt",
        _cum_before("cents").alias("cum_before"),
        F.sum("cnt")
        .over(
            Window.orderBy("cents").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_pooled"),
    )
    # doubled tie-averaged rank at this value, centered: a2 − (N+1)
    dev2 = (
        2 * F.col("cum_before") + F.col("cnt") + 1 - F.col("n_pooled") - 1
    ).cast(DEC)
    return (
        hist.join(ranked, "cents")
        .groupBy("segment")
        .agg(
            F.sum("cnt_g").cast("long").alias("n_g"),
            F.sum(F.col("cnt_g").cast(DEC) * dev2 * dev2).cast(DEC).alias("m4_g"),
        )
    )


def cochran_q_inputs(
    events: DataFrame,
    types: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """(n_users, k_treatments, sum_r, sum_r2, sum_c2): Cochran's Q
    sufficient statistics over paired binary outcomes — for each user,
    a flag per event type in `types` ("did this user ever do t?"), the
    k-treatment generalization of `mcnemar_inputs`. With row sums R_i
    (flags per user) and column sums C_j (users per type),
    Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²); ΣC_j = ΣR_i =
    sum_r, so the five integers here are sufficient. Users with none
    of the k types contribute nothing to Q (all-zero rows cancel) and
    are excluded from n_users — documented, and mirrored exactly by
    the oracle's post-pivot filter.

    Scale shape: one map-side-combined groupBy(user_id) pivot to k
    conditional MAX flags (k is a constant), one scalar aggregate —
    no window, no join. sum_c2 ~ (Σ users)² passes BIGINT around sf10⁴;
    it commits to DECIMAL(38,0), BIGINT-cast in the oracle at test SF.
    """
    flags = [
        F.max(
            F.when(F.col("event_type") == t, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"f{i}")
        for i, t in enumerate(types)
    ]
    per_user = (
        events.filter(F.col("event_type").isin(*types))
        .groupBy("user_id")
        .agg(*flags)
    )
    r = sum(F.col(f"f{i}") for i in range(len(types)))
    rows = per_user.select(
        r.alias("r_i"),
        *[F.col(f"f{i}") for i in range(len(types))],
    )
    k = len(types)
    return rows.agg(
        F.count("*").cast("long").alias("n_users"),
        F.lit(k).cast("long").alias("k_treatments"),
        F.coalesce(F.sum("r_i"), F.lit(0)).cast("long").alias("sum_r"),
        F.coalesce(F.sum(F.col("r_i") * F.col("r_i")), F.lit(0))
        .cast("long")
        .alias("sum_r2"),
        sum(
            F.coalesce(F.sum(F.col(f"f{i}")), F.lit(0)).cast(DEC)
            * F.coalesce(F.sum(F.col(f"f{i}")), F.lit(0)).cast(DEC)
            for i in range(k)
        )
        .cast(DEC)
        .alias("sum_c2"),
    )


def brunner_munzel_inputs(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """(segment, n_g, sum_p2, sum_p2_sq): Brunner–Munzel placement
    sufficient statistics — for each observation, its DOUBLED placement
    in the OTHER group: p2 = 2·(# other-group values below) + (# ties),
    always an exact integer (the per-observation refinement of
    `mann_whitney_u`, whose r2 is Σ placements + within-group rank
    mass). Σp2 and Σp2² per group are the first two placement moments;
    the caller assembles the BM studentized statistic — the
    heteroscedasticity-robust alternative to Mann-Whitney that stays
    valid when the two segments have different spreads (where plain
    MWU's variance assumption breaks).

    Scale shape: `mann_whitney_u`'s exactly — one fact-sized
    groupBy(cents) histogram carrying both per-group counts, one
    cumulative window over distinct cents, one scalar aggregate per
    group. p2 ≤ 2N so Σp2² reaches n_g·4N² (~10²⁹ at sf1000):
    DECIMAL(38,0), BIGINT-cast in the oracle at test SF.
    """
    seg = customer.select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    )
    tagged = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(seg, orders.o_custkey == seg.c_custkey)
        .select("cents", F.col("c_mktsegment").alias("segment"))
    )
    hist = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("segment") == seg_a, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("segment") == seg_b, 1).otherwise(0)).alias("cnt_b"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "cents",
        "cnt_a",
        "cnt_b",
        F.coalesce(F.sum("cnt_a").over(w), F.lit(0)).alias("cuma_lt"),
        F.coalesce(F.sum("cnt_b").over(w), F.lit(0)).alias("cumb_lt"),
    )
    # doubled placement of an A-observation at this value among B:
    # 2·(B strictly below) + (B tied here); symmetric for B among A
    p2_a = (2 * F.col("cumb_lt") + F.col("cnt_b")).cast(DEC)
    p2_b = (2 * F.col("cuma_lt") + F.col("cnt_a")).cast(DEC)
    side_a = cum.agg(
        F.lit(seg_a).alias("segment"),
        F.sum("cnt_a").cast("long").alias("n_g"),
        F.coalesce(F.sum(F.col("cnt_a").cast(DEC) * p2_a), F.lit(0))
        .cast(DEC)
        .alias("sum_p2"),
        F.coalesce(F.sum(F.col("cnt_a").cast(DEC) * p2_a * p2_a), F.lit(0))
        .cast(DEC)
        .alias("sum_p2_sq"),
    )
    side_b = cum.agg(
        F.lit(seg_b).alias("segment"),
        F.sum("cnt_b").cast("long").alias("n_g"),
        F.coalesce(F.sum(F.col("cnt_b").cast(DEC) * p2_b), F.lit(0))
        .cast(DEC)
        .alias("sum_p2"),
        F.coalesce(F.sum(F.col("cnt_b").cast(DEC) * p2_b * p2_b), F.lit(0))
        .cast(DEC)
        .alias("sum_p2_sq"),
    )
    return side_a.unionAll(side_b)


def ks_one_sample_uniform(
    events: DataFrame, event_type: str = "purchase"
) -> DataFrame:
    """(n, lo_cents, span, d_num, d_arg_cents): one-sample
    Kolmogorov–Smirnov sufficient statistics against the DISCRETE
    uniform on the observed cent span — the theoretical-reference
    complement to `ks_two_sample` (two empirical samples). For each
    distinct value v BOTH one-sided deviations are scored exactly
    (cross-multiplied, integer): the post-jump D⁺ candidate
    |cum(v)·span − (v − lo + 1)·n| and the pre-jump D⁻ candidate
    |(cum(v) − cnt(v))·span − (v − lo)·n| (F_n just below v against
    F₀ just below v). The pre-jump term also covers support GAPS:
    within a gap F_n is constant while F₀ rises monotonically, so the
    sup over the gap lands just below the next observed value — the
    next row's D⁻ candidate. Omitting it understates D on exactly the
    gridded/clustered inputs this detector exists for (1 obs at lo +
    9 at hi: D⁺ alone reports ~0.1, true D ~0.9). d_num is the max
    over both candidates and d_arg_cents the smallest value attaining
    it (deterministic argmax). D = d_num/(n·span) caller-side. High D
    against uniform is
    the value-gridding detector: synthetic or templated event values
    cluster on round numbers and step the empirical CDF far from the
    flat reference (`value_roundness_census` counts the modular
    classes; this scores the whole-distribution distance).

    Scale shape: `ks_two_sample`'s exactly — one fact-sized
    groupBy(cents) histogram, one bounded cumulative window, one
    scalar aggregate. cum·span reaches n·span (~10¹⁷ at sf1000 —
    inside BIGINT but documented; the deviation products commit to
    DECIMAL(38,0) engine-side, BIGINT in the oracle at test SF).
    """
    cents = F.round(F.col("value") * 100).cast("long")
    hist = (
        events.filter(F.col("event_type") == event_type)
        .select(cents.alias("cents"))
        .groupBy("cents")
        .agg(F.count("*").alias("cnt"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "cents",
        "cnt",
        (F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("cents").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
            F.lit(0),
        )).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
        F.min("cents").over(wall).alias("lo"),
        F.max("cents").over(wall).alias("hi"),
    )
    span = (F.col("hi") - F.col("lo") + 1).cast(DEC)
    n = F.col("n").cast(DEC)
    dev_post = F.abs(
        F.col("cum").cast(DEC) * span
        - (F.col("cents") - F.col("lo") + 1).cast(DEC) * n
    )
    dev_pre = F.abs(
        (F.col("cum") - F.col("cnt")).cast(DEC) * span
        - (F.col("cents") - F.col("lo")).cast(DEC) * n
    )
    scored = cum.select(
        "cents", "n", "lo", (F.col("hi") - F.col("lo") + 1).alias("span"),
        F.greatest(dev_post, dev_pre).alias("dev"),
    )
    w_pick = Window.orderBy(F.col("dev").desc(), F.col("cents").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("lo").cast("long").alias("lo_cents"),
            F.col("span").cast("long").alias("span"),
            F.col("dev").cast(DEC).alias("d_num"),
            F.col("cents").cast("long").alias("d_arg_cents"),
        )
    )


def page_trend_inputs(orders: DataFrame) -> DataFrame:
    """(priority, n_blocks, r2_sum, l2_term): Page's L trend test
    sufficient statistics — monthly revenue cells (block = calendar
    year·100+month, treatment = order-priority level 1..5, the leading
    digit of o_orderpriority) ranked WITHIN each month across the five
    levels (doubled tie-averaged ranks on the zero-filled spine, the
    `friedman_rank_inputs` discipline), summed per level, and weighted
    by the level's a-priori position: l2_term = priority·r2_sum. The
    caller sums l2_term/2 for Page's L — the ORDERED-alternative
    refinement of Friedman ("does monthly revenue rise monotonically
    with priority?"), the blocked counterpart of
    `jonckheere_trend_inputs`' unblocked between-group statistic.
    Identity pinned by tests: Σ r2_sum = n_blocks·k·(k+1).

    Scale shape: one fact-sized aggregation down to the bounded
    (months × 5) cell frame; spine cross join and the within-block rank
    window run on that tiny frame (block size = 5)."""
    cents = _cents("o_totalprice")
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    prio = F.substring("o_orderpriority", 1, 1).cast("long")
    cells = (
        orders.select(cents.alias("cents"), ym.alias("ym"), prio.alias("prio"))
        .groupBy("ym", "prio")
        .agg(F.sum("cents").alias("v"))
    )
    spine = (
        cells.select(F.col("ym").alias("s_ym")).distinct()
        .crossJoin(cells.select(F.col("prio").alias("s_prio")).distinct())
    )
    full = spine.join(
        cells,
        (F.col("s_ym") == F.col("ym")) & (F.col("s_prio") == F.col("prio")),
        "left",
    ).select(
        F.col("s_ym").alias("ym"),
        F.col("s_prio").alias("prio"),
        F.coalesce("v", F.lit(0)).alias("v"),
    )
    hist = full.groupBy("ym", "v").agg(F.count("*").alias("cnt"))
    r2 = hist.select(
        "ym", "v", (2 * _cum_before("v", "ym") + F.col("cnt") + 1).alias("r2")
    )
    return (
        full.join(r2, ["ym", "v"])
        .groupBy(F.col("prio").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum("r2").cast("long").alias("r2_sum"),
        )
        .select(
            "priority",
            "n_blocks",
            "r2_sum",
            (F.col("priority") * F.col("r2_sum")).cast("long").alias("l2_term"),
        )
    )


def dominance_census(
    orders: DataFrame,
    customer: DataFrame,
    seg_a: str = "BUILDING",
    seg_b: str = "MACHINERY",
) -> DataFrame:
    """(n_values, n_a, n_b, a_dominated, b_dominated, cdf_ties): the
    SIGN structure of the two-sample CDF difference — at every distinct
    pooled order-total value, compare the segments' empirical CDFs by
    exact cross-multiplication (cum_a·n_b vs cum_b·n_a) and count
    values where A's CDF is strictly above (A stochastically SMALLER —
    a_dominated), strictly below, or tied. First-order stochastic
    dominance holds iff one strict count is zero; `ks_two_sample`
    reports only the sup |difference| and is blind to whether the CDFs
    cross — this census is the crossing detector (a one-sided shift
    shows (m, 0); a scale change shows both counts positive).

    Scale shape: `ks_two_sample`'s exactly — one fact-sized
    groupBy(cents) histogram with per-segment conditional counts, one
    bounded cumulative window, one scalar aggregate. Cross products
    reach n_a·n_b (~10¹⁴ at sf1000, inside BIGINT; DECIMAL(38,0)
    engine-side regardless)."""
    seg = customer.select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment").isin(seg_a, seg_b)
    )
    tagged = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .join(seg, orders.o_custkey == seg.c_custkey)
        .select("cents", F.col("c_mktsegment").alias("segment"))
    )
    hist = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("segment") == seg_a, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("segment") == seg_b, 1).otherwise(0)).alias("cnt_b"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "cents",
        F.sum("cnt_a").over(w).alias("cum_a"),
        F.sum("cnt_b").over(w).alias("cum_b"),
        F.sum("cnt_a").over(wall).alias("n_a"),
        F.sum("cnt_b").over(wall).alias("n_b"),
    )
    lhs = F.col("cum_a").cast(DEC) * F.col("n_b").cast(DEC)
    rhs = F.col("cum_b").cast(DEC) * F.col("n_a").cast(DEC)
    return cum.agg(
        F.count("*").cast("long").alias("n_values"),
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(F.when(lhs > rhs, 1).otherwise(0)).cast("long").alias(
            "a_dominated"
        ),
        F.sum(F.when(lhs < rhs, 1).otherwise(0)).cast("long").alias(
            "b_dominated"
        ),
        F.sum(F.when(lhs == rhs, 1).otherwise(0)).cast("long").alias(
            "cdf_ties"
        ),
    )
