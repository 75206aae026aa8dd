"""Sketch governance: approximate aggregates audited against exact.

At 100 TB the production path runs sketches — HyperLogLog distinct
counts, t-digest quantiles — because the exact forms need a full
shuffle per key or a global sort. The audit path here runs BOTH on the
same (sampled or per-partition-feasible) slice and emits the exact
value plus a boolean "sketch within tolerance" verdict. The oracle
story is deliberate: each engine computes ITS OWN sketch (Spark HLL++ /
DuckDB HLL differ by design) and checks it against ITS OWN exact value
— the exact columns and the verdicts hash-match cross-engine, so the
sketch-error CONTRACT is oracle-verified even though the sketch
estimates themselves are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tolerance for the HLL audit, in parts-per-million of the exact count.
#: Spark's approx_count_distinct default rsd is 5% — a ONE-sigma bound —
#: so a 50_000 ppm tolerance sits exactly on the boundary and the
#: verdict would flip on a nontrivial fraction of datasets (round-8
#: ADVICE). 150_000 ppm ≈ 3 sigma keeps the verdict stable in both
#: engines while still catching a broken sketch outright.
DISTINCT_TOL_PPM = 150_000


def distinct_sketch_audit(
    events: DataFrame, tol_ppm: int = DISTINCT_TOL_PPM
) -> DataFrame:
    """(event_type, n_events, exact_users, sketch_ok): per-type event
    count, EXACT distinct-user count, and whether this engine's HLL
    estimate lands within `tol_ppm` of it — the check a pipeline runs
    before trusting sketches at full scale. The tolerance comparison is
    integer cross-multiplied (|approx−exact|·1e6 ≤ tol·exact), no
    float division."""
    agg = events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id").cast("long").alias("approx_users"),
    )
    dev = F.abs(F.col("approx_users") - F.col("exact_users"))
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (dev * 1_000_000 <= F.lit(tol_ppm) * F.col("exact_users")).alias(
            "sketch_ok"
        ),
    )


def quantile_sketch_audit(
    docs: DataFrame, tol_ppm: int = 100_000, accuracy: int = 100
) -> DataFrame:
    """(p_label, n_docs, exact_value, sketch_ok): exact p50/p90 token
    counts (integer rank selection — the audit baseline) beside a
    verdict that this engine's approximate-percentile sketch lands
    within `tol_ppm` of each. Same cross-engine contract as
    :func:`distinct_sketch_audit`: exact values and verdicts
    hash-match, the sketch estimate stays engine-local. `accuracy` is
    deliberately low — the audit must exercise the sketch's error, not
    a configuration where it degenerates to exact."""
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select("doc_id", n_tokens.alias("n_tokens"))
    ranked = t.withColumn(
        "rn", F.row_number().over(Window.orderBy("n_tokens", "doc_id"))
    ).withColumn(
        "cnt",
        F.count("*").over(
            Window.orderBy("n_tokens").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    quantiles = (("p50", 1, 2), ("p90", 9, 10))
    targets = F.array(
        *[
            F.struct(
                F.lit(label).alias("p_label"),
                F.expr(f"(cnt - 1) * {num} div {den}").alias("target"),
                F.lit(num / den).alias("p"),
            )
            for label, num, den in quantiles
        ]
    )
    exact = (
        ranked.withColumn("q", F.explode(targets))
        .filter(F.col("rn") - 1 == F.col("q.target"))
        .select(
            F.col("q.p_label").alias("p_label"),
            F.col("cnt").cast("long").alias("n_docs"),
            F.col("n_tokens").alias("exact_value"),
            F.col("q.p").alias("p"),
        )
    )
    approx = t.agg(
        F.percentile_approx(
            "n_tokens", [num / den for _, num, den in quantiles], accuracy
        ).alias("qs")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(label) for label, _, _ in quantiles]).alias(
                    "p_label"
                ),
                F.col("qs").alias("approx_value"),
            )
        ).alias("z")
    ).select(
        F.col("z.p_label").alias("p_label"),
        F.col("z.approx_value").cast("long").alias("approx_value"),
    )
    dev = F.abs(F.col("approx_value") - F.col("exact_value"))
    return (
        exact.join(approx, on="p_label")
        .select(
            "p_label",
            "n_docs",
            "exact_value",
            (dev * 1_000_000 <= F.lit(tol_ppm) * F.col("exact_value")).alias(
                "sketch_ok"
            ),
        )
    )


def graph_distinct_sketch_audit(
    og_edges: DataFrame, pg_edges: DataFrame, tol_ppm: int = DISTINCT_TOL_PPM
) -> DataFrame:
    """(graph, n_edges, exact_src, exact_dst, sketch_ok): edge count and
    EXACT distinct endpoint counts per derived graph (og/pg), plus
    whether this engine's HLL distinct-source estimate lands within
    `tol_ppm` — the sketch-trust audit extended to the graph tables
    (round-7 verdict growth item). Each engine checks ITS OWN sketch
    against the exact value; only exact values and the verdict cross
    the engine boundary, so the row hash-verifies while the sketch
    stays engine-local. One aggregation per edge table, integer
    cross-multiplied tolerance, no float division.
    """
    def side(edges: DataFrame, tag: str) -> DataFrame:
        agg = edges.agg(
            F.count("*").cast("long").alias("n_edges"),
            F.countDistinct("src").cast("long").alias("exact_src"),
            F.countDistinct("dst").cast("long").alias("exact_dst"),
            F.approx_count_distinct("src").cast("long").alias("approx_src"),
        )
        dev = F.abs(F.col("approx_src") - F.col("exact_src"))
        return agg.select(
            F.lit(tag).alias("graph"),
            "n_edges",
            "exact_src",
            "exact_dst",
            (dev * 1_000_000 <= F.lit(tol_ppm) * F.col("exact_src")).alias(
                "sketch_ok"
            ),
        )

    return side(og_edges, "og").unionAll(side(pg_edges, "pg"))


def graph_degree_quantile_audit(
    og_edges: DataFrame, pg_edges: DataFrame
) -> DataFrame:
    """(graph, n_sources, exact_p50, sketch_ok): per derived graph, the
    EXACT median out-degree plus a verdict that this engine's quantile
    sketch lands inside the exact [p40, p60] rank window — the
    quantile-sketch counterpart of :func:`graph_distinct_sketch_audit`
    (round-8 verdict growth item: extend the exact-vs-HLL audit pattern
    to approximate quantiles).

    Exactness & stability: the exact quantiles come from
    histogram rank selection (``functions/quantiles`` — the window runs
    over DISTINCT degree values, never a global row sort), with the
    shared rank convention ``value at 0-indexed rank (n-1)·num div
    den``. The sketch verdict compares each engine's OWN estimator
    (Spark Greenwald-Khanna ``percentile_approx`` at accuracy 10000 =
    guaranteed rank error ≤ 0.01% ≪ the ±10%-rank window; DuckDB
    t-digest) against its own exact bounds, so the boolean is stable by
    construction and only exact values + verdicts cross the engine
    boundary.
    """
    from ..functions.quantiles import histogram_quantiles

    window_qs = (("p40", 2, 5), ("p50", 1, 2), ("p60", 3, 5))

    def side(edges: DataFrame, tag: str) -> DataFrame:
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        qs = histogram_quantiles(deg, "deg", quantiles=window_qs)
        pick = qs.agg(
            F.max("n_rows").cast("long").alias("n_sources"),
            F.max(F.when(F.col("p_label") == "p50", F.col("q_value")))
            .cast("long")
            .alias("exact_p50"),
            F.max(F.when(F.col("p_label") == "p40", F.col("q_value")))
            .alias("__lo"),
            F.max(F.when(F.col("p_label") == "p60", F.col("q_value")))
            .alias("__hi"),
        )
        approx = deg.agg(
            F.percentile_approx("deg", 0.5, 10000).alias("__ap")
        )
        return pick.join(F.broadcast(approx)).select(
            F.lit(tag).alias("graph"),
            "n_sources",
            "exact_p50",
            (
                (F.col("__ap") >= F.col("__lo"))
                & (F.col("__ap") <= F.col("__hi"))
            ).alias("sketch_ok"),
        )

    return side(og_edges, "og").unionAll(side(pg_edges, "pg"))


def hash_sample_estimate_audit(
    events: DataFrame, buckets: int = 16
) -> DataFrame:
    """(event_type, n, n_sample, exact_cents, est_cents, err_cents):
    Horvitz-Thompson-style total estimate from a DETERMINISTIC hash
    sample (bucket 0 of `buckets` md5-56 buckets on event_id, the
    engine-wide reproducible-sampling convention) audited against the
    exact per-type value total. est = buckets · sample_sum, the
    inverse-inclusion-probability estimator; err is signed so the
    caller sees bias direction. Because the sample membership is
    hash-deterministic, BOTH the estimate and the audit hash-match
    cross-engine — unlike rng sampling, this estimator is replayable.

    Scale shape: one map-side-combined aggregation computing the exact
    and sampled sums together (the sample sum is a conditional sum, not
    a second scan); the hash stays inside whole-stage codegen.
    """
    from ..functions.hashing import hash56

    cents = F.round(F.col("value") * 100).cast("long")
    in_sample = hash56(F.col("event_id").cast("string")) % buckets == 0
    return events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long").alias("n_sample"),
        F.sum(cents).cast("long").alias("exact_cents"),
        (F.sum(F.when(in_sample, cents).otherwise(0)) * buckets)
        .cast("long")
        .alias("est_cents"),
        (
            F.sum(F.when(in_sample, cents).otherwise(0)) * buckets
            - F.sum(cents)
        )
        .cast("long")
        .alias("err_cents"),
    )


def count_min_audit(
    events: DataFrame, depth: int = 4, width: int = 256, k: int = 8
) -> DataFrame:
    """(user_id, exact_n, cms_n): Count-Min sketch audit — the
    heavy-hitter companion to `distinct_sketch_audit`. A d×w CMS is
    built over per-user event counts (cell(r, b) = Σ counts of users
    whose seeded md5-56 hash lands in bucket b of row r), then the
    top-`k` exact heavy users (ties → smallest id) are estimated back
    from the sketch: cms_n = min over rows of their cell. The CMS
    deterministic guarantee — cms_n ≥ exact_n always, overcount
    bounded by colliding mass — is what a pipeline checks before
    trusting sketched frequencies at full scale.

    Unlike the HLL/percentile audits (engine-specific sketches, only
    the CONTRACT verdict hash-matches), Count-Min is order-independent
    integer arithmetic over the SHARED seeded hash
    (functions/hashing.hash56), so both engines build the identical
    sketch and every output column hash-matches exactly.

    Scale shape: one fact-sized groupBy(user) histogram shuffle; the
    sketch is `depth` re-keyings of that bounded histogram collapsed
    to d·w cells (1024 rows at the defaults — broadcastable anywhere);
    the top-k pick is a global TakeOrdered over the histogram; the
    estimate joins k·depth rows against the tiny cell frame.
    """
    from ..functions.hashing import hash56

    hist = events.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    parts = []
    for r in range(depth):
        parts.append(
            hist.select(
                F.lit(r).alias("r"),
                (hash56(F.col("user_id").cast("string"), seed=r) % width)
                .alias("b"),
                "n",
            )
        )
    cells = parts[0]
    for p in parts[1:]:
        cells = cells.unionAll(p)
    cells = cells.groupBy("r", "b").agg(F.sum("n").alias("cell"))
    tracked = hist.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(k)
    probes = []
    for r in range(depth):
        probes.append(
            tracked.select(
                "user_id",
                F.col("n").alias("exact_n"),
                F.lit(r).alias("r"),
                (hash56(F.col("user_id").cast("string"), seed=r) % width)
                .alias("b"),
            )
        )
    probe = probes[0]
    for p in probes[1:]:
        probe = probe.unionAll(p)
    return (
        probe.join(F.broadcast(cells), on=["r", "b"])
        .groupBy("user_id")
        .agg(
            F.first("exact_n").alias("exact_n"),
            F.min("cell").cast("long").alias("cms_n"),
        )
    )


def bloom_filter_audit(
    events: DataFrame, depth: int = 3, width: int = 512, k: int = 8
) -> DataFrame:
    """(probe_id, is_member, bloom_hit): Bloom-filter audit — the
    MEMBERSHIP companion to `count_min_audit`. A depth×width bloom
    filter is built over the distinct event user_ids (bit (r, b) set
    iff some member's seeded md5-56 hash lands there), then probed with
    the `k` heaviest users (members — the no-false-negative guarantee
    says bloom_hit must be 1 for every one) and `k` synthetic
    NON-members (max_user_id + 1 … + k — ids provably outside the
    table), whose hits are the measured false-positive census against
    the (1 − e^{−dn/w})^d expectation a pipeline sizes its filters by.

    Like Count-Min (and unlike the HLL audit), a bloom filter is
    order-independent integer arithmetic over the SHARED seeded hash
    (functions/hashing.hash56): bits are an OR — a distinct over
    (row, bucket) — so both engines build the identical filter and
    every output column hash-matches exactly.

    Scale shape: one distinct over user ids (fact-sized shuffle), then
    `depth` re-keyings collapsed to ≤ depth·width bit rows
    (broadcastable anywhere); probes are 2k·depth rows joined against
    the tiny bit frame.
    """
    from ..functions.hashing import hash56

    ids = events.select("user_id").distinct()
    bit_parts = [
        ids.select(
            F.lit(r).alias("r"),
            (hash56(F.col("user_id").cast("string"), seed=r) % width).alias("b"),
        )
        for r in range(depth)
    ]
    bits = bit_parts[0]
    for p in bit_parts[1:]:
        bits = bits.unionAll(p)
    bits = bits.distinct().withColumn("hit", F.lit(1))

    heavy = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(k)
        .select(F.col("user_id").alias("probe_id"), F.lit(1).alias("is_member"))
    )
    # COALESCE: on an empty events frame MAX(user_id) is NULL and all k
    # outsider probe_ids would collapse into one NULL group, silently
    # shrinking the output from 2k rows (r11 advice). With 0 as the
    # anchor the k outsiders stay distinct (and are trivially
    # non-members of an empty filter). Mirrored in the DuckDB twin.
    mx = ids.agg(F.coalesce(F.max("user_id"), F.lit(0)).alias("mx"))
    spark = events.sparkSession
    outsiders = (
        spark.range(1, k + 1)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("mx") + F.col("id")).alias("probe_id"),
            F.lit(0).alias("is_member"),
        )
    )
    probes = heavy.unionAll(outsiders)
    probe_parts = [
        probes.select(
            "probe_id",
            "is_member",
            F.lit(r).alias("r"),
            (hash56(F.col("probe_id").cast("string"), seed=r) % width).alias("b"),
        )
        for r in range(depth)
    ]
    probe = probe_parts[0]
    for p in probe_parts[1:]:
        probe = probe.unionAll(p)
    return (
        probe.join(F.broadcast(bits), on=["r", "b"], how="left")
        .groupBy("probe_id")
        .agg(
            F.first("is_member").cast("long").alias("is_member"),
            F.when(F.sum(F.coalesce("hit", F.lit(0))) == depth, 1)
            .otherwise(0)
            .cast("long")
            .alias("bloom_hit"),
        )
    )
