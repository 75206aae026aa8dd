"""Deterministic corpus sampling for training-data pipelines.

Random sampling (`df.sample`) is partitioning-dependent and
irreproducible across engines; every operator here derives its
decisions from the shared 56-bit MD5 hash (functions/hashing.py), so a
sample is a pure function of (doc_id, seed) — stable under
repartitioning, re-runs, and engine swaps, and therefore
DuckDB-oracle-checkable like any exact query.

Scale notes: `hash_sample` and `train_eval_split` are narrow maps — a
filter/projection pushed to the scan, no shuffle at any corpus size.
`stratified_cap` is one window shuffle keyed on the stratum; per-key
state is a counter, and skewed strata are exactly the windows AQE
splits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash56

#: hash buckets for rate arithmetic: rates are exact multiples of 1e-6
RATE_DENOM = 1_000_000


def _bucket(id_col: str, seed: int):
    """Uniform bucket in [0, RATE_DENOM) from the seeded doc hash."""
    return hash56(F.col(id_col).cast("string"), seed=seed) % RATE_DENOM


def hash_sample(
    docs: DataFrame, rate: float, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Keep each row iff hash(seed:id) falls in the first `rate`
    fraction of buckets — deterministic Bernoulli-style sampling with
    EXACT membership (re-running, repartitioning, or re-deriving the
    same ids always selects the same rows). Narrow: no shuffle."""
    threshold = int(rate * RATE_DENOM)
    return docs.filter(_bucket(id_col, seed) < threshold)


def train_eval_split(
    docs: DataFrame, eval_frac: float = 0.1, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Label each row 'eval' or 'train' by seeded hash bucket — the
    standard leakage-safe split (membership depends only on the id, so
    adding/removing other documents never moves a document across the
    split). Narrow: a projection, no shuffle."""
    threshold = int(eval_frac * RATE_DENOM)
    return docs.withColumn(
        "split",
        F.when(_bucket(id_col, seed) < threshold, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def temporal_split(
    events: DataFrame,
    train_frac: tuple[int, int] = (4, 5),
) -> DataFrame:
    """(event_id, day, split): time-ordered train/eval split of the
    events table — everything before the cutoff day is 'train', the
    cutoff day and later are 'eval'. The leakage rule for temporal
    data: evaluation must be strictly in the future of training, which
    a hash split cannot guarantee.

    The cutoff is the exact `train_frac` quantile of DISTINCT active
    days, found by the same value-histogram cumulative scan as
    `corpusstats.winsorize_lengths`: days aggregate to a tiny
    (day, 1)-table, the 0-indexed rank ``(total−1)·num div den`` picks
    the cutoff in integer arithmetic, and the 1-row cutoff broadcasts
    into a narrow final projection — one scan plus one trivial
    aggregation, no shuffle proportional to the event count."""
    from ..functions.eventtime import event_micros

    us_per_day = 86_400_000_000
    ev = events.select(
        "event_id", event_micros(events).alias("tus")
    ).select("event_id", F.expr(f"tus div {us_per_day}").cast("long").alias("day"))
    days = ev.select("day").distinct()
    w = Window.orderBy("day")
    cum = days.select(
        "day",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    num, den = train_frac
    cut = cum.filter(
        F.col("rn") - 1 == F.expr(f"(total - 1) * {num} div {den}")
    ).select(F.col("day").alias("cut_day"))
    return ev.crossJoin(F.broadcast(cut)).select(
        "event_id",
        "day",
        F.when(F.col("day") < F.col("cut_day"), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


def stratified_cap(
    docs: DataFrame,
    strata_col: str,
    cap: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most `cap` rows per stratum, chosen by seeded hash order
    (ties broken by id → fully deterministic). The balancing step for
    over-represented sources/languages before training. One window
    shuffle on the stratum key."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain mixture sampling: keep each row of stratum s with
    probability weights[s] (default_rate for unlisted strata), decided
    by the seeded id hash — the domain-reweighting step of a training
    mixture (e.g. downsample web crawl, keep all code). Exact,
    reproducible membership; narrow map, no shuffle at any scale (the
    weight table is inlined into the plan as a CASE expression, not
    even a broadcast)."""
    thr = None
    for k, v in sorted(weights.items()):
        cond = F.col(strata_col) == F.lit(k)
        lit = F.lit(int(v * RATE_DENOM))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    default = F.lit(int(default_rate * RATE_DENOM))
    thr = default if thr is None else thr.otherwise(default)
    return docs.filter(_bucket(id_col, seed) < thr)


def shard_assignments(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, shard, pos): deterministic global training shuffle. Each
    row's shard is its seeded hash mod n_shards; its position within
    the shard is its rank in hash order (id breaks ties). Equivalent to
    a seeded random permutation materialized as (shard, pos) — but with
    ONE hash shuffle on the shard key and per-shard local sorts instead
    of a global orderBy, so it scales to any corpus size. Re-running or
    repartitioning never moves a document."""
    h = hash56(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        docs.select(
            id_col,
            *keep,
            (h % n_shards).cast("long").alias("shard"),
            h.alias("_h"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def neighbor_sample(
    edges: DataFrame, k: int = 5, seed: int = 0
) -> DataFrame:
    """(src, dst): at most k out-neighbors per vertex, chosen by seeded
    hash order over (src, dst) with dst as the tiebreak — the
    fan-out-capping step of GNN mini-batch samplers and of any
    supernode-safe traversal. Deterministic: membership is a pure
    function of (edge, seed), stable under repartitioning, so sampled
    subgraphs are reproducible across runs and engines. One window
    shuffle on src; hub vertices are exactly the windows AQE splits."""
    h = hash56(
        F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string")),
        seed=seed,
    )
    w = Window.partitionBy("src").orderBy(h.asc(), F.col("dst").asc())
    return (
        edges.select("src", "dst")
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def priority_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement via *priority sampling*
    (Duffield, Lund & Thorup, JACM 2007): each row draws a uniform
    u = hash48(seed:id) / 2^48 and gets priority key u / (w + 1); the
    k smallest keys win — inclusion probability is approximately
    proportional to the weight, with the unbiased subset-sum estimator
    the paper proves optimal.

    Cross-engine determinism without floats-you-can't-trust: the hash
    is truncated to 48 bits so it is EXACTLY representable as a double,
    the /2^48 scaling is a power-of-two (exact), and the single
    division u/(w+1) of two exact doubles is IEEE-754
    correctly-rounded — bit-identical on the JVM and in DuckDB, so the
    selected set (not just its distribution) is oracle-checkable.

    Scale: one narrow projection + a global top-k (TakeOrderedAndProject
    — per-partition heaps of size k, no full sort, no shuffle of
    non-winners). The float key never reaches the output schema.
    """
    h48 = hash56(F.col(id_col).cast("string"), seed=seed) % F.lit(2**48)
    key = (h48.cast("double") / F.lit(float(2**48))) / (
        F.col(weight_col).cast("double") + F.lit(1.0)
    )
    return (
        docs.withColumn("_pk", key)
        .orderBy(F.col("_pk").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, weight_col)
    )


def stratified_priority_sample(
    docs: DataFrame,
    k_per_stratum: int = 20,
    strata_col: str = "lang",
    weight_col: str = "n_chars",
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: the k rows
    with smallest Duffield–Lund–Thorup priority key (see
    `priority_sample`) WITHIN each stratum — the per-domain quota
    sampler for mixture building when strata need fixed sizes but
    within-stratum inclusion should still favor weight.

    One window shuffle on the stratum key; the same 48-bit-exact
    double key keeps the selected set bit-identical across engines and
    partitionings. Skewed strata are exactly the windows AQE splits.
    """
    h48 = hash56(F.col(id_col).cast("string"), seed=seed) % F.lit(2**48)
    key = (h48.cast("double") / F.lit(float(2**48))) / (
        F.col(weight_col).cast("double") + F.lit(1.0)
    )
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k_per_stratum)
        .select(strata_col, id_col, weight_col)
    )


def length_matched_resample(
    docs: DataFrame,
    bucket_width: int = 128,
    n_buckets: int = 8,
    seed: int = 13,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """(doc_id, bucket, n_chars): downsample so every length bucket is
    represented by (up to) the SMALLEST nonempty bucket's count — the
    distribution-flattening resample used to stop a length-skewed crawl
    from dominating a training mixture with one document shape.

    Bucket = min(length div bucket_width, n_buckets−1); per-bucket
    acceptance is the exact integer rate `min_count·DENOM div count_b`
    applied through the shared seeded hash gate (`_bucket`), so the
    kept SET is a pure function of (id, seed, bucket histogram) —
    engine- and partitioning-independent, and any bucket's expected
    survivor count is the min bucket's count. A two-pass plan: one
    narrow count aggregation (broadcast back — it is ≤ n_buckets
    rows), then a zero-shuffle filter over the source scan. At 100 TB
    both passes stream; nothing driver-side but the n_buckets-row
    histogram.
    """
    b = F.least(
        F.expr(f"cast({length_col} as long) div {bucket_width}"),
        F.lit(n_buckets - 1).cast("long"),
    ).alias("bucket")
    bucketed = docs.select(F.col(id_col), F.col(length_col), b)
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    min_cnt = hist.agg(F.min("cnt").alias("m"))
    rates = hist.crossJoin(F.broadcast(min_cnt)).select(
        "bucket", F.expr(f"(m * {RATE_DENOM}) div cnt").alias("rate")
    )
    return (
        bucketed.join(F.broadcast(rates), on="bucket")
        .filter(_bucket(id_col, seed) < F.col("rate"))
        .select(id_col, "bucket", length_col)
    )


def ego_batch(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: Sequence[int] = (3, 2),
    seed: int = 0,
) -> DataFrame:
    """(seed_id, hop, src, dst): layered GraphSAGE-style ego-net
    sampling — starting from `seeds` (an `id` column), expand hop h
    through at most fanouts[h-1] seeded out-neighbors per frontier
    vertex (the `neighbor_sample` cap applied per layer), recording
    every sampled edge with the seed that pulled it in. This is the
    mini-batch subgraph loader for GNN training: bounded fan-out per
    layer ⇒ each ego-net has ≤ Π fanouts edges regardless of hub
    degrees.

    Determinism: layer membership reuses neighbor_sample's pure
    (edge, seed)-hash order, so a batch is reproducible across runs,
    partitionings, and engines. Frontier joins key on vertex ids; a
    vertex reached via several seeds is expanded once per seed (ego
    nets are per-seed by definition) — the multiplicity is bounded by
    the seed count, not the graph.
    """
    out = None
    frontier = seeds.select(F.col("id").alias("seed_id"), F.col("id").alias("node"))
    for h, k in enumerate(fanouts, start=1):
        capped = neighbor_sample(edges, k=k, seed=seed + h)
        layer = (
            frontier.join(capped, on=frontier.node == capped.src)
            .select(
                "seed_id",
                F.lit(h).cast("long").alias("hop"),
                "src",
                "dst",
            )
            .distinct()
        )
        out = layer if out is None else out.unionAll(layer)
        frontier = layer.select("seed_id", F.col("dst").alias("node")).distinct()
    return out


def poisson1_thresholds_56(max_w: int = 10) -> list[int]:
    """Cumulative Poisson(1) CDF thresholds scaled to the 56-bit hash
    domain: `w = #{t in thresholds : t <= u}` gives a Poisson(1) weight
    for u uniform on [0, 2^56). Fixed integer literals — the SAME
    constants go into the Spark expression and any SQL mirror, so the
    bootstrap is bit-replayable cross-engine (the float exp() runs once
    HERE, never per row or per engine)."""
    import math

    cum, out, p = 0.0, [], math.exp(-1.0)
    for k in range(max_w):
        cum += p
        out.append(min(int(cum * (1 << 56)), (1 << 56) - 1))
        p /= k + 1
    return out


def poisson_bootstrap_sums(
    df: DataFrame,
    n_resamples: int = 32,
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(b, n_rows, n_eff, boot_cents): B deterministic Poisson(1)
    bootstrap resamples of the cents total in ONE pass — the
    distributed bootstrap without replication or a driver loop. Row r's
    weight in resample b is the Poisson(1) inverse CDF at the uniform
    md5-56 hash of "b:id" (threshold CASE over fixed integer literals),
    so resamples are independent-ish across b, identical across reruns
    and engines — rng bootstraps can never be verified cross-engine;
    this one can. The caller reads the spread of `boot_cents` as the
    standard error / CI of the total; `n_eff` (Σw) tracks each
    resample's effective size.

    Scale shape: a B-literal explode over the fact scan (rows × B
    narrow map — the standard Poisson-bootstrap trick that avoids
    materializing B copies), then one map-side-combined aggregation to
    B rows. The hash and the threshold CASE stay in whole-stage
    codegen.
    """
    ts = poisson1_thresholds_56()
    cents = F.round(F.col(value_col) * 100).cast("long")
    # NULL values are excluded up front — the same convention as
    # streaming_bootstrap_sums's cents.isNotNull() filter, so the
    # stream ≡ batch-slice equivalence holds even when events carry
    # NULL values (r9 ADVICE: counting them in n_rows while their
    # weight*cents silently dropped from the sum broke the twin)
    df = df.filter(cents.isNotNull() & F.col(id_col).isNotNull())
    b = F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b")
    u = hash56(
        F.concat(
            F.col("b").cast("string"), F.lit(":"), F.col(id_col).cast("string")
        )
    )
    w = F.lit(len(ts))
    for k in range(len(ts) - 1, -1, -1):
        w = F.when(u < F.lit(ts[k]), F.lit(k)).otherwise(w)
    return (
        df.select(cents.alias("cents"), F.col(id_col), b)
        .withColumn("w", w)
        .groupBy("b")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).cast("long").alias("boot_cents"),
        )
        .select(F.col("b").cast("long").alias("b"), "n_rows", "n_eff",
                "boot_cents")
    )


def block_bootstrap_daily_sums(
    orders: DataFrame, n_resamples: int = 32, block_len: int = 30
) -> DataFrame:
    """(b, n_blocks, n_days_eff, boot_cents): circular moving-block
    bootstrap of the daily revenue total — the time-series counterpart
    of `poisson_bootstrap_sums`. An iid bootstrap destroys serial
    correlation, so each resample here concatenates ceil(n/L) blocks of
    L CONSECUTIVE days whose start offsets are md5-56-deterministic
    (hash of "b:j" mod n, circular wraparound) — dependence inside a
    block survives, block starts replay exactly across engines/reruns.

    Scale shape: the fact table collapses to the bounded daily frame
    once; block sums come from circular PREFIX SUMS (block j's sum =
    prefix[s+L] − prefix[s], + total on wraparound), so each of the
    B·ceil(n/L) block picks is two look-ups into a |days|-row map — a
    bounded join, no per-day explode per resample.

    Contract: ``block_len <= n_days`` (a block wraps the circle at most
    once; the prefix-sum identity assumes it). The default 30-day block
    against a multi-year daily frame is far inside it.
    """
    from .olap import _daily_revenue_cents

    daily = _daily_revenue_cents(orders)
    w = Window.orderBy("day")
    idx = daily.select(
        (F.row_number().over(w) - 1).alias("i"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),  # prefix[i] = sum of cents at indices 0..i
    )
    scalars = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.max("prefix").cast("long").alias("total"),
    )
    picks = (
        scalars.select(
            "n",
            "total",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_resamples - 1))
            ).alias("b"),
        )
        .select(
            "n",
            "total",
            "b",
            F.explode(
                F.expr("sequence(0, cast((n + " f"{block_len}" " - 1) div "
                       f"{block_len}" " as int) - 1)")
            ).alias("j"),
        )
        .withColumn(
            "s",
            hash56(
                F.concat(
                    F.col("b").cast("string"), F.lit(":"), F.col("j").cast("string")
                )
            )
            % F.col("n"),
        )
        .withColumn("e", F.col("s") + F.lit(block_len))
    )
    # block sum = prefix[e-1] - prefix[s-1], circular: indices taken
    # mod n, plus one full `total` when the block wraps past the end
    lo = idx.select(F.col("i").alias("lo_i"), F.col("prefix").alias("lo_p"))
    hi = idx.select(F.col("i").alias("hi_i"), F.col("prefix").alias("hi_p"))
    joined = (
        picks.withColumn("lo_i", (F.col("s") - 1 + F.col("n")) % F.col("n"))
        .withColumn("hi_i", (F.col("e") - 1) % F.col("n"))
        .join(F.broadcast(lo), "lo_i")
        .join(F.broadcast(hi), "hi_i")
        .select(
            "b",
            "n",
            (
                F.col("hi_p")
                - F.when(F.col("s") == 0, 0).otherwise(F.col("lo_p"))
                + F.when(
                    (F.col("e") - 1) >= F.col("n"), F.col("total")
                ).otherwise(0)
            ).alias("block_cents"),
        )
    )
    return joined.groupBy("b").agg(
        F.count("*").cast("long").alias("n_blocks"),
        (F.count("*") * block_len).cast("long").alias("n_days_eff"),
        F.sum("block_cents").cast("long").alias("boot_cents"),
    ).select(F.col("b").cast("long").alias("b"), "n_blocks",
             "n_days_eff", "boot_cents")


def token_mix_allocation(
    docs: DataFrame,
    budget: int = 1_000_000,
    weight_col: str = "n_chars",
    domain_col: str = "lang",
) -> DataFrame:
    """(domain, weight, alloc): largest-remainder (Hamilton)
    apportionment of an integer token `budget` across corpus domains,
    proportionally to each domain's total `weight_col` — the
    data-mixing step of a training pipeline ("this run reads 1M tokens;
    how many from each language, exactly?"). Every alloc is an exact
    integer, Σ alloc == budget precisely (floor quotas, then +1 to the
    largest fractional remainders, ties broken by domain ascending —
    the deterministic textbook method), so downstream per-domain
    samplers (`hash_sample` at rate alloc/weight) get consistent
    targets with no float rounding drift between engines.

    Scale shape: the fact table collapses to one row per domain (one
    map-side-combined aggregation — the only fact-sized shuffle);
    apportionment then runs windows over the domain-bounded frame
    (single partition of ~|domains| rows). budget·weight commits to
    DECIMAL(38,0) before the division — at BIGINT it would overflow
    around weight ~ 9e18/budget (sf ~10³ at the default budget);
    alloc itself is ≤ budget and stays long.
    """
    b = F.lit(int(budget)).cast(DEC := "decimal(38,0)")
    per = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(weight_col).cast("long").alias("weight")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = per.select(
        "domain",
        "weight",
        (b * F.col("weight").cast(DEC)).alias("bw"),
        F.sum(F.col("weight").cast(DEC)).over(w_all).alias("total_w"),
    ).select(
        "domain",
        "weight",
        # integral `div`, NOT floor(a / b): Spark's decimal `/` rounds
        # the quotient to its result scale, so floor() of it can step
        # over a tie boundary; `div` is exact truncating division
        F.expr("CAST(bw div total_w AS LONG)").alias("quota"),
        # fractional remainder, kept exact as an integer numerator:
        # bw mod total_w (both decimal-exact)
        F.expr("CAST(bw % total_w AS DECIMAL(38,0))").alias("rem_num"),
    )
    w_rank = Window.orderBy(F.col("rem_num").desc(), F.col("domain").asc())
    ranked = scaled.select(
        "domain",
        "weight",
        "quota",
        F.row_number().over(w_rank).alias("rem_rank"),
        (F.lit(int(budget)) - F.sum("quota").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "domain",
        "weight",
        (
            F.col("quota")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )
