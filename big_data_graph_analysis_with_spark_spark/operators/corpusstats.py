"""Corpus-level statistics for training-data pipelines: frequent
n-gram heavy hitters and exact per-group token-count quantiles.

Both are pure `pyspark.sql.functions` plans (JVM-side, codegen'd).

Heavy hitters: explode word n-grams → two-level aggregate → global
top-k. Spark compiles the final `orderBy().limit(k)` into
TakeOrderedAndProject — each partition keeps only its local top-k, the
driver merges k·P rows — so the full gram table never sorts globally.
Counts shuffle partially (map-side combine) on the gram key; at 100 TB
the one skew risk is ultra-hot grams, which partial aggregation already
absorbs (each map task emits one row per hot gram).

Quantiles: exact rank-selection, integer arithmetic only. For a group
of cnt rows the p = num/den quantile is the value at sorted position
1 + (cnt-1)*num DIV den — no interpolation, so Spark and DuckDB agree
bit-for-bit (doubles would drift). The per-group window sort makes this
the CORRECTNESS baseline: at 100 TB you run `approx_percentile`
(t-digest, mergeable sketches, no global sort) and use this operator on
samples to bound its error; with only a handful of language groups the
exact path needs per-group salted pre-partitioning (functions/skew) to
not serialize one executor per language.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: (label, numerator, denominator) — p = num/den, kept rational so the
#: rank computation stays in integer arithmetic end-to-end.
DEFAULT_QUANTILES: tuple[tuple[str, int, int], ...] = (
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


def top_ngrams(
    docs: DataFrame, n: int = 2, min_docs: int = 2, k: int = 50
) -> DataFrame:
    """Global top-k word n-grams: (gram, n_docs, n_occ), ordered by
    occurrence count with the gram string breaking ties (total order →
    the k-boundary is deterministic)."""
    words = F.split(F.col("text"), " ")
    grams = F.when(F.size(words) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    exploded = docs.select("doc_id", F.explode(grams).alias("gram"))
    counted = (
        exploded.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return counted.orderBy(F.desc("n_occ"), "gram").limit(k)


def vocab_coverage(docs: DataFrame, k: int = 200) -> DataFrame:
    """(rank, token, n_occ, cum_occ): the top-`k` unigram vocabulary by
    occurrence count with ranks and the running cumulative count —
    `cum_occ / Σ n_occ(all)` is the corpus coverage curve a tokenizer
    build starts from.

    The heavy-hitter cut happens FIRST (`orderBy().limit(k)` →
    TakeOrderedAndProject: per-partition local top-k, driver merges
    k·P rows), and the rank/cumulative window runs over only the k
    surviving rows — never a global sort of the full vocabulary. Ties
    break on the token string so the cut and ranks are total orders."""
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    top = (
        words.groupBy("token")
        .agg(F.count("*").cast("long").alias("n_occ"))
        .orderBy(F.desc("n_occ"), "token")
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occ"), "token")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occ",
        F.sum("n_occ").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_occ"),
    )


def winsorize_lengths(
    docs: DataFrame,
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
) -> DataFrame:
    """(doc_id, n_chars, n_chars_winsorized): per-doc length clipped to
    the exact [p5, p95] band (quantiles as rational num/den pairs).

    The cutoffs come from a VALUE-HISTOGRAM cumulative scan, not a
    global row sort: lengths aggregate to (n_chars, cnt) — a key space
    bounded by the distinct lengths, thousands not billions — and the
    rank-selection walks the cumulative counts of that tiny table. The
    quantile rank is ``(total-1)·num div den`` (0-indexed, same
    convention as `token_quantiles`), all integer, so both engines
    name the same cutoff values. The cutoff pair is a 1-row broadcast
    into the final projection — the doc table itself is touched by one
    scan and zero shuffles."""
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_chars",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt")
        .over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    )
    lo_rank = F.expr(f"(total - 1) * {lo[0]} div {lo[1]}")
    hi_rank = F.expr(f"(total - 1) * {hi[0]} div {hi[1]}")
    cuts = cum.agg(
        F.min(F.when(F.col("cum") > lo_rank, F.col("n_chars"))).alias("lo_cut"),
        F.min(F.when(F.col("cum") > hi_rank, F.col("n_chars"))).alias("hi_cut"),
    )
    return (
        docs.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.greatest(F.least(F.col("n_chars"), F.col("hi_cut")), F.col("lo_cut"))
            .cast("long")
            .alias("n_chars_winsorized"),
        )
    )


def term_cooccurrence(
    docs: DataFrame, vocab_k: int = 20, k: int = 100
) -> DataFrame:
    """(token_a, token_b, n_docs): document co-occurrence counts for
    the top-`vocab_k` document-frequency unigrams — the integer
    contingency table PMI / word-association measures divide over.
    Top-`k` pairs by count, ties broken on (token_a, token_b).

    Pair volume is bounded by construction: each doc contributes at
    most C(vocab_k, 2) pairs (≤190 at the default), because tokens are
    restricted to the broadcast top-vocabulary BEFORE the per-doc
    self-join — never a free n² over full documents. The vocabulary cut
    itself is a TakeOrderedAndProject heavy-hitter pass."""
    # the distinct (doc, token) relation feeds the heavy-hitter cut AND
    # both self-join sides — three lazy re-executions of the
    # scan+explode+distinct shuffle per plan in a bare session (the
    # three consumers' exchanges are not identical, so AQE stage reuse
    # does not cover them). Lazy checkpoint: materialized once at the
    # first action, no extra eager job, downstream plan stays visible.
    toks = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    top = (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.desc("df"), "token")
        .limit(vocab_k)
        .select("token")
    )
    narrowed = toks.join(F.broadcast(top), on="token")
    a = narrowed.select("doc_id", F.col("token").alias("token_a"))
    b = narrowed.select("doc_id", F.col("token").alias("token_b"))
    return (
        a.join(b, on="doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "token_a", "token_b")
        .limit(k)
    )


def token_mad(docs: DataFrame, group: str = "lang") -> DataFrame:
    """(group, n_docs, median_tokens, mad_tokens): per-group median and
    median-absolute-deviation of token counts — the robust
    center/spread pair outlier screens prefer over mean/stddev (one
    100M-token document barely moves the MAD, but wrecks a stddev).

    Two chained rank selections, both integer-exact: the group median
    at 0-indexed rank ``(cnt−1) div 2`` of value order, then the
    median of ``|n_tokens − median|`` the same way — deterministic and
    engine-identical where float interpolation would drift. Both run
    as value-histogram selections (functions/quantiles): per-group
    windows over DISTINCT values, so heavy groups cost their length
    cardinality, not their row count; the one-row-per-group median
    table broadcasts into the deviation pass."""
    from ..functions.quantiles import histogram_quantiles

    p50 = (("p50", 1, 2),)
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select(F.col(group).alias("grp"), n_tokens.alias("n_tokens"))
    med = histogram_quantiles(
        t,
        "n_tokens",
        quantiles=p50,
        count_alias="n_docs",
        value_alias="med",
        group_cols=("grp",),
    ).select("grp", "n_docs", "med")
    dev = t.join(F.broadcast(med), on="grp").select(
        "grp", "n_docs", "med", F.abs(F.col("n_tokens") - F.col("med")).alias("adev")
    )
    mad = histogram_quantiles(
        dev,
        "adev",
        quantiles=p50,
        count_alias="_n2",
        value_alias="mad_tokens",
        group_cols=("grp", "n_docs", "med"),
    )
    return mad.select(
        F.col("grp").alias(group),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("med").cast("long").alias("median_tokens"),
        F.col("mad_tokens").cast("long").alias("mad_tokens"),
    )


def language_mix(docs: DataFrame) -> DataFrame:
    """(source, lang, n_docs, share_ppm): per-source language
    composition with exact fixed-point shares —
    ``share_ppm = n_docs·1e6 div total_docs(source)``. The first audit
    table of any multilingual corpus (is source X really 90% English?).

    Two aggregations on nested keys — (source, lang) then source — the
    second reusing the first's partials; both key spaces are tiny, so
    the whole plan is one map-side-combined shuffle."""
    per = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs")
    ).localCheckpoint(eager=False)
    totals = per.groupBy("source").agg(F.sum("n_docs").alias("total"))
    return (
        per.join(totals, on="source")
        .select(
            "source",
            "lang",
            "n_docs",
            F.expr("(n_docs * 1000000) div total").cast("long").alias("share_ppm"),
        )
    )


def token_quantiles(
    docs: DataFrame,
    group: str = "lang",
    quantiles: Sequence[tuple[str, int, int]] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Exact token-count quantiles per group: (group, p_label, n_docs,
    q_value). Value-histogram rank selection (functions/quantiles),
    partitioned by the group: the per-group window ranges over
    DISTINCT token counts, so a billion-document language costs its
    length cardinality, not its row count."""
    from ..functions.quantiles import histogram_quantiles

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select(F.col(group), n_tokens.alias("n_tokens"))
    return histogram_quantiles(
        t,
        "n_tokens",
        quantiles=quantiles,
        count_alias="n_docs",
        value_alias="q_value",
        group_cols=(group,),
    )


def lexical_diversity(docs: DataFrame, group: str = "source") -> DataFrame:
    """Per-group lexical diversity: total token occurrences, distinct
    token types, and the type-token ratio in exact ppm integers
    (`types * 1_000_000 div tokens`). The float-free stand-in for
    token-entropy monitoring — a collapsing TTR flags template spam /
    boilerplate floods in a crawl slice before training on it.

    Shape: explode to (group, token) → two aggs. countDistinct is the
    one true shuffle; token occurrences combine map-side. At 100 TB
    swap countDistinct for approx_count_distinct and keep the exact
    path for audit slices (see operators/sketches for the governance
    pattern).
    """
    toks = docs.select(
        F.col(group), F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    return (
        toks.groupBy(group)
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_types"),
        )
        .withColumn("ttr_ppm", F.expr("n_types * 1000000 DIV n_tokens"))
    )


def length_outliers(docs: DataFrame, group: str = "lang", k: int = 3) -> DataFrame:
    """(doc_id, group, n_tokens, median_tokens, mad_tokens): documents
    whose token count deviates from their group's median by more than
    `k`·MAD — the robust outlier screen (`token_mad`'s docstring case:
    one 100M-token document wrecks a stddev rule but not this one).
    The test ``|n − med| > k·mad`` is pure integers, no float scale
    constant, so both engines flag identical rows.

    Shape: the one-row-per-group `token_mad` table broadcasts into a
    single filtered projection over the corpus — the scan is the only
    full-data pass."""
    stats = token_mad(docs, group).select(group, "median_tokens", "mad_tokens")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select("doc_id", F.col(group), n_tokens.alias("n_tokens"))
    return (
        t.join(F.broadcast(stats), on=group)
        .filter(
            F.abs(F.col("n_tokens") - F.col("median_tokens"))
            > k * F.col("mad_tokens")
        )
        .select("doc_id", group, "n_tokens", "median_tokens", "mad_tokens")
    )


def length_cdf(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, cdf_ppm): each document's empirical
    length-CDF position in exact ppm — the rank-normalization feature
    quality models use instead of raw lengths (scale-free, robust to
    the corpus length distribution).

    Value-histogram construction: lengths aggregate to (n_chars, cnt);
    the cumulative window runs over DISTINCT lengths; the resulting
    tiny CDF table broadcasts back onto the corpus — one scan + one
    bounded-key aggregation, no row-rank window (cume_dist over raw
    rows would single-partition the table)."""
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("c"))
    w = Window.orderBy("n_chars")
    cdf = hist.select(
        "n_chars",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c")
        .over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total"),
    ).select("n_chars", F.expr("cum * 1000000 DIV total").alias("cdf_ppm"))
    return docs.join(F.broadcast(cdf), on="n_chars").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "cdf_ppm"
    )


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_shingles, n_unique_corpus, novelty_ppm): per-document
    novelty — the exact-ppm fraction of the doc's distinct word
    n-grams that appear in NO other document. The diversity-scoring
    complement of dedup: boilerplate-heavy docs score near 0, fresh
    content near 1e6; mixture builders upweight the tail.

    Two aggregations over the shared shingle explode
    (dedup.word_shingles): document frequency per shingle, then a
    per-doc rollup counting df==1 shingles. Both shuffles key on the
    shingle/doc id — text itself never moves. The df table is the same
    intermediate an inverted-index dedup builds, so at scale the two
    passes share a cached/bucketed shingle table.
    """
    from .dedup import word_shingles

    sh = word_shingles(docs, n)
    df_counts = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        sh.join(df_counts, on="shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.expr("CASE WHEN df = 1 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_unique_corpus"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("n_unique_corpus * 1000000 div n_shingles"),
        )
    )


def vocab_growth(
    docs: DataFrame, checkpoints: Sequence[int] = (100, 1000, 10_000, 100_000)
) -> DataFrame:
    """(n_docs, vocab_size, n_hapax): the vocabulary-growth (Heaps'
    law) curve — distinct-token and hapax counts over the corpus
    prefix of the first `c` documents (by doc_id order) for each
    checkpoint c. The tokenizer-budget diagnostic: where the curve
    flattens tells you how much corpus a vocab build actually needs.

    ONE token aggregation serves every checkpoint: a token's
    contribution to prefix c is decided by its MINIMUM doc_id (vocab
    membership) and its occurrence count within the prefix (hapax =
    exactly one). Tokens aggregate to (min_doc_id per checkpoint-
    bounded count) via conditional sums, so the plan is explode →
    one groupBy(token) → one tiny rollup — no per-checkpoint rescans.
    Checkpoints beyond the corpus clamp to the full corpus (reported
    n_docs is the checkpoint, monotone in vocab_size regardless).
    """
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    aggs = []
    for c in checkpoints:
        inpfx = F.col("doc_id") < c
        aggs.append(
            F.sum(F.when(inpfx, 1).otherwise(0)).alias(f"occ_{c}")
        )
    per_tok = toks.groupBy("tok").agg(*aggs)
    # one global aggregate computes every checkpoint's pair of counts,
    # then stack unpivots in-plan — per_tok is scanned exactly once
    final_aggs = []
    for c in checkpoints:
        final_aggs.append(
            F.sum((F.col(f"occ_{c}") > 0).cast("long")).alias(f"v_{c}")
        )
        final_aggs.append(
            F.sum((F.col(f"occ_{c}") == 1).cast("long")).alias(f"h_{c}")
        )
    wide = per_tok.agg(*final_aggs)
    stack = ", ".join(
        f"CAST({int(c)} AS BIGINT), v_{c}, h_{c}" for c in checkpoints
    )
    return wide.select(
        F.expr(
            f"stack({len(checkpoints)}, {stack})"
            " AS (n_docs, vocab_size, n_hapax)"
        )
    )


def char_trigram_profile(docs: DataFrame, k: int = 10) -> DataFrame:
    """(lang, trigram, n_occurrences, rank): the top-`k` character
    3-grams per language by occurrence count (ties → trigram ASC, so
    the cut is deterministic) — the classic feature table an n-gram
    language identifier is trained from (Cavnar & Trenkle 1994); the
    runtime `textops.language_id` consumes exactly this kind of
    profile.

    The position explode stays JVM-side: ``transform(sequence(...))``
    materializes each doc's trigram list in one codegen'd expression
    (no UDF), counts aggregate with map-side combine on the (lang,
    trigram) key — 3-byte grams, text never shuffles — and the final
    per-lang top-k is a window row_number over the (small) distinct
    gram table, partition-pruned per language. Docs shorter than 3
    chars contribute nothing (explicit filter: Spark's sequence(1, n)
    DESCENDS for n < 1 where DuckDB's generate_series is empty — the
    filter pins both engines to the same domain).
    """
    tri = docs.filter(F.length("text") >= 3).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("trigram"),
    )
    counts = tri.groupBy("lang", "trigram").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("trigram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def token_length_histogram(docs: DataFrame) -> DataFrame:
    """(token_len, n_tokens, n_distinct_tokens): corpus-wide token
    length distribution — the one-scan profile that sizes tokenizer
    vocab buckets, flags digit/punctuation blowups (a spike at len 1),
    and estimates bytes-per-token before a BPE run.

    One explode over whitespace tokens, one aggregation keyed by the
    integer length — text itself never shuffles (tokens are projected
    to their lengths map-side; the distinct count shuffles the token
    string, bounded by vocabulary not corpus size).

    The whitespace class is the explicit [ \\t\\n\\r\\f]+ rather than
    \\s+: Java regex \\s includes \\x0B (vertical tab) while RE2's does
    not, so \\s+ is a latent cross-engine parity hazard — the explicit
    class means the same thing to Spark and the DuckDB oracle (the
    'portable regex subset' convention normalize_text documents).
    """
    toks = docs.select(
        F.explode(F.split("text", "[ \\t\\n\\r\\f]+")).alias("tok")
    ).filter(F.col("tok") != "")
    return toks.groupBy(
        F.length("tok").cast("long").alias("token_len")
    ).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("n_distinct_tokens"),
    )


def length_gini_stats(docs: DataFrame, length_col: str = "n_chars") -> DataFrame:
    """One row of EXACT Gini-coefficient sufficient statistics over the
    document length distribution: (n_docs, total_len, sum_rank_len,
    gini_num, gini_den) with

        gini = gini_num / gini_den
             = (2·Σᵢ rankᵢ·lenᵢ − (n+1)·Σlen) / (n·Σlen)

    — the standard sorted-rank Gini identity. Length inequality is the
    single best early-warning signal for corpus skew (a few giant docs
    dominating token mass); the exact integer form hash-matches the
    DuckDB oracle where any float assembly would drift.

    Σ rank·len is computed WITHOUT a global per-document sort: lengths
    are first aggregated to (len, cnt) — bounded by |distinct lengths|,
    not |docs| — and for a tie-group of cnt docs at length L whose
    predecessors total `before` docs, the ranks are before+1 … before+cnt
    regardless of tie order, contributing L·(cnt·before + cnt·(cnt+1)/2).
    The cumulative `before` window therefore sorts only the tiny grouped
    frame; the 100 TB scan reduces map-side to one row per distinct
    length. All products run in DECIMAL(38,0) so the statistics stay
    exact far past BIGINT range.
    """
    grouped = docs.groupBy(F.col(length_col).cast("long").alias("len")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    per_group = grouped.withColumn(
        "before", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    ).select(
        F.col("cnt"),
        (F.col("len").cast(dec) * F.col("cnt").cast(dec)).alias("group_len"),
        (
            F.col("len").cast(dec)
            * (
                F.col("cnt").cast(dec) * F.col("before").cast(dec)
                + (
                    F.col("cnt").cast(dec) * (F.col("cnt").cast(dec) + F.lit(1))
                    / F.lit(2)
                ).cast(dec)
            )
        ).alias("group_rank_len"),
    )
    agg = per_group.agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum("group_len").cast(dec).alias("total_len"),
        F.sum("group_rank_len").cast(dec).alias("sum_rank_len"),
    )
    return agg.select(
        "n_docs",
        "total_len",
        "sum_rank_len",
        (
            F.lit(2).cast(dec) * F.col("sum_rank_len")
            - (F.col("n_docs").cast(dec) + F.lit(1)) * F.col("total_len")
        ).cast(dec).alias("gini_num"),
        (F.col("n_docs").cast(dec) * F.col("total_len")).cast(dec).alias("gini_den"),
    )


def source_length_quantiles(docs: DataFrame) -> DataFrame:
    """(source, p_label, n_docs, q_chars): exact p50/p90/p99 of
    document character length PER SOURCE — the curation dashboard's
    "which feed is sending us tweets vs books" split, via the shared
    value-histogram rank selection (functions/quantiles): the only
    window runs over distinct (source, length) values, so a
    billion-doc source costs its length cardinality, never a
    per-source sort of the corpus.
    """
    from ..functions.quantiles import histogram_quantiles

    return histogram_quantiles(
        docs.select("source", F.col("n_chars").cast("long").alias("n_chars")),
        "n_chars",
        count_alias="n_docs",
        value_alias="q_chars",
        group_cols=["source"],
    )


def charclass_profile(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, n_chars, n_alpha, n_digit, n_space, n_other):
    per-language character-class census — the encoding/quality
    tripwire (a digit or 'other' spike flags scraped tables, markup,
    or mojibake before tokenization sees it).

    Per-class counts are length differences after removing the class
    (`length(text) − length(regexp_replace(text, class, ''))`) over
    the PORTABLE regex subset ([A-Za-z], [0-9], [ \\t\\n\\r\\f] — the
    explicit whitespace class, not \\s, per the normalize_text
    convention): identical semantics in Spark's Java regex and the
    oracle's RE2. All expressions are codegen'd string ops projected
    map-side; the shuffle carries one partial row per language.
    """
    ln = F.length("text")

    def _cnt(cls: str):
        return ln - F.length(F.regexp_replace("text", cls, ""))

    return (
        docs.select(
            "lang",
            ln.alias("n"),
            _cnt("[A-Za-z]").alias("a"),
            _cnt("[0-9]").alias("d"),
            _cnt("[ \\t\\n\\r\\f]").alias("s"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_chars"),
            F.sum("a").cast("long").alias("n_alpha"),
            F.sum("d").cast("long").alias("n_digit"),
            F.sum("s").cast("long").alias("n_space"),
            F.sum(F.col("n") - F.col("a") - F.col("d") - F.col("s"))
            .cast("long")
            .alias("n_other"),
        )
    )


#: compact English stopword list (public-domain, the usual top
#: function words) — deliberately small and FIXED so the coverage
#: statistic is reproducible across runs and engines
STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "be", "at", "by", "this", "are", "or",
)


def stopword_coverage(
    docs: DataFrame, stopwords: tuple[str, ...] = STOPWORDS
) -> DataFrame:
    """(lang, n_tokens, n_stopword_tokens, coverage_ppm): per-language
    share of tokens drawn from a fixed stopword list — the classic
    fluency / language-mix audit (natural English runs ~30-40%; near
    zero flags code, tables, or a mislabeled language).

    Tokens split on the single-space convention shared by the corpus
    operators; the membership test is a literal IN over a ~20-word
    broadcast list evaluated map-side, so the only shuffle is the
    per-language partial-aggregated rollup. coverage_ppm is integer
    `1e6·stop div total` — exact cross-engine.
    """
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    is_stop = F.col("tok").isin(*stopwords).cast("long")
    return (
        toks.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(is_stop).cast("long").alias("n_stopword_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_stopword_tokens",
            F.expr("(n_stopword_tokens * 1000000) div n_tokens")
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


def hapax_by_source(docs: DataFrame) -> DataFrame:
    """(source, n_tokens, n_distinct, n_hapax): per source feed, total
    token occurrences, distinct vocabulary size, and how many of those
    vocabulary items occur exactly once (hapax legomena) — the classic
    lexical-richness audit (a high hapax share flags noisy OCR or
    boilerplate-free natural text; near zero flags templated spam).

    Tokens split on the single-space convention shared by the corpus
    operators. Two shuffles, both pre-combined map-side: the
    (source, token) count, then the per-source rollup over the
    vocabulary-sized frame — never a second pass over the raw token
    stream. All-integer output, hash-exact by construction.
    """
    tok_counts = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    return tok_counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
    )


def sentence_stats(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_sentences, total_sentence_chars): per source
    feed, how many sentence-like segments the corpus splits into on
    terminal punctuation ([.!?] runs) and their total trimmed length —
    the sentence-granularity profile a chunker needs before picking
    split points.

    Segments are counted only when non-empty after trimming the
    single-space convention's padding, which makes the count identical
    across engines regardless of how each regex engine treats trailing
    empty splits. One explode + one map-side-combined rollup on
    source; all-integer output.
    """
    segs = docs.select(
        "source",
        F.col("doc_id"),
        F.explode(F.split(F.col("text"), "[.!?]+")).alias("seg"),
    ).select("source", "doc_id", F.trim(F.col("seg")).alias("seg"))
    per_doc = (
        segs.filter(F.col("seg") != "")
        .groupBy("source", "doc_id")
        .agg(
            F.count("*").alias("n_seg"),
            F.sum(F.length("seg")).alias("seg_chars"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_seg").cast("long").alias("n_sentences"),
        F.sum("seg_chars").cast("long").alias("total_sentence_chars"),
    )


def vocab_overlap(docs: DataFrame) -> DataFrame:
    """(source_a, source_b, n_common, vocab_a, vocab_b): for every
    unordered source pair (a < b) sharing at least one vocabulary
    item, the token-level overlap — common distinct tokens plus both
    vocabulary sizes, from which consumers read Jaccard / containment.
    The token-granularity companion to curation.source_overlap_matrix
    (which matches whole-document digests): two crawls can share zero
    documents yet near-identical vocabularies (same register, dedup
    them jointly) or share documents but disjoint tails (different
    OCR noise) — this frame separates those cases.

    Tokens split on the single-space corpus convention. The stream
    collapses to distinct (source, token) BEFORE the self-join, so a
    token in k sources contributes C(k,2) pair rows — bounded by the
    (tiny) source vocabulary times C(|sources|, 2), never by document
    count; the join key is the token, the final rollup is
    |source-pairs|-sized. All-integer output.
    """
    vocab = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").cast("long").alias("v"))
    a = vocab.select(F.col("source").alias("source_a"), "tok")
    b = vocab.select(F.col("source").alias("source_b"), "tok")
    common = (
        a.join(b, on="tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("v").alias("vocab_a"))),
            on="source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("v").alias("vocab_b"))),
            on="source_b",
        )
        .select("source_a", "source_b", "n_common", "vocab_a", "vocab_b")
    )


def source_corr_profile(docs: DataFrame) -> DataFrame:
    """(source, n_docs, sum_len, sum_tok, sum_len_sq, sum_tok_sq,
    sum_len_tok): per source, the exact integer sufficient statistics
    for the character-length ↔ token-count correlation — Pearson r
    needs only these six sums, all BIGINT here, so the engine stays
    hash-exact and the monitor divides. A source whose r collapses is
    a tokenizer-health alarm (binary junk, whitespace stripping, CJK
    arriving in a space-token pipeline).

    One narrow map computes both lengths per row (token count is
    `size(split(text, ' '))` — the corpus single-space convention, no
    explode: the token STREAM never materializes), then one map-side
    combined aggregation keyed by source. Squares of per-doc lengths
    fit BIGINT beyond any real document; the sums are exact.
    """
    n_len = F.length("text").cast("long")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    per = docs.select(
        "source", n_len.alias("len"), n_tok.alias("tok")
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("len").cast("long").alias("sum_len"),
        F.sum("tok").cast("long").alias("sum_tok"),
        F.sum(F.col("len") * F.col("len")).cast("long").alias("sum_len_sq"),
        F.sum(F.col("tok") * F.col("tok")).cast("long").alias("sum_tok_sq"),
        F.sum(F.col("len") * F.col("tok")).cast("long").alias("sum_len_tok"),
    )


def leading_tokens(docs: DataFrame, k: int = 5) -> DataFrame:
    """(source, rank, token, n_docs): the k most common LEADING tokens
    per source — document openers are a cheap template detector
    (boilerplate headers, scraped navigation, form letters all
    announce themselves in token one) and a dedup-prefilter hint.

    The first token is `split(text, ' ')[1]` — a narrow map, the
    single-space corpus convention, no explode — then one aggregation
    on (source, first token) and a rank window over that
    vocabulary-bounded frame (never the docs). Ties break on the token
    string so top-k is deterministic cross-engine.
    """
    first = F.element_at(F.split(F.col("text"), " "), 1).alias("token")
    counts = docs.select("source", first).groupBy("source", "token").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), F.col("token")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "source",
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def lang_token_moments(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, n_tokens, sum_tok_len, sum_tok_len_sq): per
    language, exact moment inputs of the token-length distribution —
    mean/variance of token length is the cheapest language-model cost
    predictor (bytes-per-token) and a mojibake tripwire (a language
    whose token-length variance jumps grew untokenized junk). The
    per-language slice token_length_histogram's global view can't
    give.

    One explode over single-space tokens — the only fact-sized step,
    a narrow map — then token STRINGS are projected to their integer
    lengths before the |langs|-bounded aggregation: text never
    shuffles, partials combine map-side. All sums are exact BIGINTs.
    """
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).select("lang", F.length("tok").alias("n"))
    docs_per = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tok_stats = toks.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("n").cast("long").alias("sum_tok_len"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_tok_len_sq"),
    )
    return docs_per.join(tok_stats, on="lang").select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        "sum_tok_len",
        "sum_tok_len_sq",
    )


def token_class_mix(docs: DataFrame) -> DataFrame:
    """(source, n_digit, n_alpha, n_mixed, n_other): per source, how
    many whitespace tokens are pure digits, pure ASCII letters, mixed
    alphanumeric, or anything else — the tokenizer-input census one
    level above charclass_profile (characters say WHAT bytes arrived;
    token classes say how they clump — a digit-token spike is tables,
    a mixed spike is identifiers/URLs).

    One explode, then each token reduces to a 4-way CASE on two
    portable anchored regexes ([0-9]+ / [A-Za-z]+ / [A-Za-z0-9]+ —
    identical semantics in Java regex and RE2) before the
    |sources|-bounded aggregation; token strings never shuffle.
    """
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    cls = (
        F.when(F.col("tok").rlike("^[0-9]+$"), F.lit("digit"))
        .when(F.col("tok").rlike("^[A-Za-z]+$"), F.lit("alpha"))
        .when(F.col("tok").rlike("^[A-Za-z0-9]+$"), F.lit("mixed"))
        .otherwise(F.lit("other"))
    )
    return (
        toks.select("source", cls.alias("c"))
        .groupBy("source")
        .agg(
            F.sum((F.col("c") == "digit").cast("long")).cast("long").alias("n_digit"),
            F.sum((F.col("c") == "alpha").cast("long")).cast("long").alias("n_alpha"),
            F.sum((F.col("c") == "mixed").cast("long")).cast("long").alias("n_mixed"),
            F.sum((F.col("c") == "other").cast("long")).cast("long").alias("n_other"),
        )
    )


def lang_collision_stats(docs: DataFrame) -> DataFrame:
    """(lang, n_tokens, n_types, sum_sq, max_count): per language, the
    EXACT sufficient statistics of the token-frequency distribution's
    collision structure — ``sum_sq = Σ count(tok)²`` gives the Simpson
    index / collision probability ``(sum_sq − N) / (N·(N−1))`` and the
    Rényi-2 entropy ``−log(sum_sq/N²)`` in one scalar float step by
    the caller; `lexical_diversity`'s TTR sees only the type count,
    not how mass concentrates over types. Everything engine-side stays
    integer (DECIMAL(38,0) for the square sum), so the frame is
    hash-stable cross-engine.

    Scale shape: tokens collapse to the per-(lang, token) count first
    (map-side combinable, one shuffle keyed on the token), then a
    vocabulary-bounded second aggregation — the token stream itself is
    never the window input.
    """
    toks = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    c = F.col("cnt").cast("decimal(38,0)")
    return counts.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(c * c).cast("decimal(38,0)").alias("sum_sq"),
        F.max("cnt").cast("long").alias("max_count"),
    )


def zipf_rank_freq_points(docs: DataFrame) -> DataFrame:
    """(decile, rank, freq): the Zipf rank-frequency curve read at the
    decile ranks of the frequency-sorted vocabulary — 10 exact points
    (plus rank 1 at decile 0) instead of a full vocab dump, enough for
    the caller to fit the power-law slope in log space. Rank is
    1-indexed position in (freq DESC, token ASC) order; the probe picks
    rank = max(1, (V·q) div 10) for q = 0..10 over vocabulary size V.

    Scale shape: token histogram (the only corpus-sized shuffle), then
    a FREQUENCY histogram (freq, n_tokens_with_freq) whose cumulative
    window recovers the value at any rank without sorting the vocab —
    the same covering-row pick as the exact quantiles, applied to
    frequencies.
    """
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = words.groupBy("tok").agg(F.count("*").alias("freq"))
    fhist = vocab.groupBy("freq").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("freq"))
    cum = fhist.select(
        "freq",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("v"),
    )
    probes = cum.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(10))).alias("decile")
    ).withColumn(
        "want", F.greatest(F.lit(1), F.expr("(v * decile) div 10"))
    )
    picks = probes.filter(
        (F.col("cum") - F.col("cnt") < F.col("want"))
        & (F.col("want") <= F.col("cum"))
    )
    return picks.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("want").cast("long").alias("rank"),
        F.col("freq").cast("long").alias("freq"),
    )
