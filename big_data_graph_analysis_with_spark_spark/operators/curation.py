"""Corpus-curation operators beyond dedup: benchmark decontamination,
within-document repetition statistics, and PII redaction.

These are the remaining standard passes of a pretraining data pipeline
(C4/Gopher-style) that the dedup/textops modules don't cover:

* **decontaminate** — flag training documents that share word n-grams
  with an evaluation/benchmark set, so benchmark text can be held out
  of training. The eval side of the join is a fixed benchmark suite —
  megabytes, not a corpus slice — so its distinct n-gram set is
  broadcast and the whole operator is one narrow map over the training
  corpus plus a broadcast-hash lookup: no shuffle of the 100 TB side.
* **repetition_stats** — duplicated word / 2-gram / 3-gram fractions
  per document (the Gopher repetition filters). Pure higher-order
  array expressions, whole-stage codegen, zero shuffles.
* **redact_pii** — email/phone masking with global regexp_replace.
  Narrow projection; the regexes are RE2-compatible so the DuckDB
  oracle reproduces them byte-for-byte.

Everything stays JVM-side; ratios are single integer/integer divisions
so cross-engine hashes are exact.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles

#: RE2- and Java-regex-compatible PII patterns (no lookaround, no
#: backrefs — the intersection dialect both engines honor).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d -]{7,}\d"


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, n_grams, n_shared, contaminated) per training document.

    `n_shared` counts the training document's distinct word n-grams
    that occur anywhere in `eval_docs`; `contaminated` is the standard
    threshold rule (≥ `min_overlap` shared n-grams).

    Scale: the benchmark suite's distinct n-gram set is small by
    contract (benchmarks are MBs); `broadcast_eval=True` pins the
    broadcast-hash plan so the training corpus is never shuffled —
    one scan, map-side lookup, one partial+final aggregation on
    doc_id (pre-aggregated map-side because shingles of a document
    are co-located after explode).
    """
    eval_grams = (
        word_shingles(eval_docs, n).select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        word_shingles(train_docs, n)
        .join(eval_grams, on="shingle", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            (F.col("n_shared") >= min_overlap).alias("contaminated"),
        )
    )


def _gram_counts(words, n: int):
    """(total, distinct) n-gram counts as columns — no array is built
    for documents shorter than n words (CASE branches evaluate lazily
    in codegen, same guard as dedup.word_shingles)."""
    total = F.greatest(F.lit(0), F.size(words) - (n - 1))
    distinct = F.when(F.size(words) < n, F.lit(0)).otherwise(
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - (n - 1)),
                    lambda i: F.array_join(F.slice(words, i, n), " "),
                )
            )
        )
    )
    return total, distinct


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition fractions per document:
    (doc_id, n_words, dup_word_frac, n_2grams, dup_2gram_frac,
    n_3grams, dup_3gram_frac).

    dup fraction = (total − distinct) / total, 0.0 when there are no
    n-grams. One narrow projection — no shuffle, no Python.
    """
    words = F.split(F.col("text"), " ")

    def frac(total, distinct):
        return F.when(total == 0, F.lit(0.0)).otherwise(
            (total - distinct) / total
        )

    w_total = F.size(words)
    w_distinct = F.size(F.array_distinct(words))
    g2_total, g2_distinct = _gram_counts(words, 2)
    g3_total, g3_distinct = _gram_counts(words, 3)
    return docs.select(
        "doc_id",
        w_total.cast("long").alias("n_words"),
        frac(w_total, w_distinct).alias("dup_word_frac"),
        g2_total.cast("long").alias("n_2grams"),
        frac(g2_total, g2_distinct).alias("dup_2gram_frac"),
        g3_total.cast("long").alias("n_3grams"),
        frac(g3_total, g3_distinct).alias("dup_3gram_frac"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, clean_text): mask emails then
    phone-like digit runs, counting each pattern before its masking
    pass (phones are counted on the email-redacted text so an address
    can never double-count as a phone). Narrow projection — global
    regexp_replace runs inside codegen."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(t1, F.lit(PHONE_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        t2.alias("clean_text"),
    )


def expectations(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate): declarative
    data-quality report — each rule is a boolean Column an input row
    is expected to satisfy; NULL evaluations count as violations
    (coalesce-to-false), the conservative contract for quality gates.

    ONE aggregation pass whatever the rule count: every rule folds to a
    conditional sum in the same partial-aggregated global aggregate
    (map-side combine → a single row crosses the wire per task), then
    `stack` unpivots in-plan to the long report shape. The rate is one
    bigint/bigint IEEE division → oracle-exact.

    Rule names become SQL aliases inside the generated `stack`
    expression, so they are validated up front: identifier-shaped only,
    and `_n` (the internal row-count alias) is reserved. Rejecting
    loudly beats quoting — a rule named `end` or `a b` in a quality
    report is a config typo, not a use case.
    """
    ident = re.compile(r"[A-Za-z][A-Za-z0-9_]*\Z")
    for name in rules:
        if not ident.fullmatch(name) or name == "_n":
            raise ValueError(
                f"expectation rule name {name!r} must be identifier-shaped"
                " ([A-Za-z][A-Za-z0-9_]*) and not the reserved '_n'"
            )
    aggs = [F.count("*").cast("long").alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long"))
            .cast("long")
            .alias(name)
        )
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{k}', {k}" for k in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {stack_expr}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") / F.col("n_rows")).alias("violation_rate"),
    )


def dup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplicate impact report: row count, distinct
    text count (on the md5 digest — an 8-byte-ish shuffle key, never
    the text itself), surplus duplicate rows, and the dup rate in
    exact ppm integers. The triage view that decides WHERE dedup
    effort goes before any pairwise method runs — a source with 30%
    exact dups gets hash-dedup first; near-dup passes come after.

    One aggregation keyed on source; texts are pruned to digests
    before the shuffle, so the 100 TB corpus moves 16-byte keys.
    """
    return (
        docs.select("source", F.md5(F.col("text")).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_distinct_texts"),
        )
        .withColumn("n_dup_rows", F.expr("n_docs - n_distinct_texts"))
        .withColumn("dup_ppm", F.expr("(n_docs - n_distinct_texts) * 1000000 DIV n_docs"))
    )


def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """(source_a, source_b, n_shared_texts): for every UNORDERED source
    pair (a < b lexicographically), how many distinct text digests
    appear in both — the cross-source contamination matrix that decides
    whether two crawls are really one (dedup them jointly) and which
    pairs a train/eval split must never straddle.

    Shuffles only (digest, source) pairs — 16-byte keys, text pruned at
    the scan. The self-join runs on the digest AFTER a per-(digest,
    source) distinct, so a text's row count within a source never
    inflates the pair count; a digest shared by k sources contributes
    C(k,2) pairs, bounded by the (tiny) source vocabulary, not by doc
    count.
    """
    ds = docs.select(F.md5("text").alias("h"), "source").distinct()
    a = ds.select("h", F.col("source").alias("source_a"))
    b = ds.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, on="h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared_texts"))
    )


def quality_percentile_filter(
    docs: DataFrame, num: int = 1, den: int = 2
) -> DataFrame:
    """(doc_id, quality_ppm): documents whose heuristic quality score
    is at or above the corpus's num/den quantile — "keep the best
    half" (or decile, etc.) as a single deterministic plan, the
    percentile-gated variant of threshold filtering when the cut
    should adapt to the corpus instead of an absolute number.

    The quantile is the same integer rank-selection rule as
    corpusstats.token_quantiles (value at 0-indexed sorted position
    ``(total−1)·num div den``), computed over the VALUE HISTOGRAM:
    quality is a round(·,6) score, i.e. an integer number of ppm, so a
    distinct-value cumulative count (≤1e6+1 rows, in practice a few
    hundred) replaces any global row sort — the histogram is
    aggregated, the threshold value selected from it, broadcast back,
    and applied as a zero-shuffle filter.
    """
    from .textops import quality_scores

    qs = quality_scores(docs).select(
        "doc_id",
        (F.round(F.col("quality") * 1_000_000)).cast("long").alias("quality_ppm"),
    ).localCheckpoint(eager=False)
    # lazy checkpoint: the scored frame feeds the histogram AND the
    # final gate — one scoring pass per action instead of two, with no
    # extra eager job
    hist = qs.groupBy("quality_ppm").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("quality_ppm").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "quality_ppm",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    thr = cum.filter(
        F.col("cum") > F.expr(f"(total - 1) * {num} div {den}")
    ).agg(F.min("quality_ppm").alias("thr"))
    return (
        qs.crossJoin(F.broadcast(thr))
        .filter(F.col("quality_ppm") >= F.col("thr"))
        .select("doc_id", "quality_ppm")
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """(quasi columns..., group_size): equivalence classes of the
    quasi-identifier combination with FEWER than `k` members — the
    groups a k-anonymity release policy requires suppressing or
    generalizing before data leaves the curation boundary.

    One partial-aggregated groupBy on the quasi columns; the violating
    classes are by definition the small groups, so the result is tiny
    even when the input is not. Pair with `redact_pii` (direct
    identifiers) — this operator covers the re-identification risk
    that survives redaction.
    """
    assert quasi_cols, "need at least one quasi-identifier column"
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def quality_deciles(docs: DataFrame) -> DataFrame:
    """(decile, n_docs, sum_tokens): the corpus quality PROFILE —
    document and token mass per quality decile — that decides where a
    percentile gate (quality_percentile_filter) should cut before
    anyone commits to a threshold: "decile 9 holds 4% of docs but 1%
    of tokens" is the shape that justifies (or kills) aggressive
    filtering.

    Value-based bucketing, not rank-based: quality is a round(·,6)
    score, so ``decile = least(9, quality_ppm div 100000)`` is a pure
    per-row integer function — one narrow map + one 10-row aggregation,
    no global sort, no window. Deterministic and engine-identical by
    construction.
    """
    from .textops import quality_scores

    qs = quality_scores(docs).select(
        F.round(F.col("quality") * 1_000_000).cast("long").alias("quality_ppm"),
        "n_tokens",
    )
    return (
        qs.groupBy(
            F.least(F.lit(9), F.expr("quality_ppm div 100000"))
            .cast("long")
            .alias("decile")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
    )


def l_diversity_census(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """(l, n_groups, n_rows): histogram of quasi-identifier equivalence
    classes by their count of DISTINCT sensitive values — the
    l-diversity complement to :func:`k_anonymity_violations`: a class
    can be large (k-anonymous) yet expose everyone in it if all its
    members share one sensitive value (l = 1, the homogeneity attack).
    A release policy reads this as "how many classes/rows sit below
    l = 2, 3, …".

    Scale shape: one (quasi, sensitive) distinct-pair aggregation, one
    quasi-keyed rollup, one bounded histogram — all map-side-
    combinable; output rows bounded by max distinct sensitive values.
    """
    assert quasi_cols, "need at least one quasi-identifier column"
    per_class = (
        df.select(*quasi_cols, sensitive_col)
        .distinct()
        .groupBy(*quasi_cols)
        .agg(F.count("*").alias("l"))
    )
    sizes = df.groupBy(*quasi_cols).agg(F.count("*").alias("rows"))
    return (
        per_class.join(sizes, quasi_cols)
        .groupBy("l")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("rows").cast("long").alias("n_rows"),
        )
        .select(F.col("l").cast("long").alias("l"), "n_groups", "n_rows")
    )


def filter_agreement_census(
    docs: DataFrame, min_chars: int = 500, max_avg_word_len: int = 8
) -> DataFrame:
    """(n, n_11, n_10, n_01, n_00): Cohen's-kappa sufficient statistics
    for the agreement between two deterministic corpus quality filters
    — A: length ≥ min_chars; B: average word length ≤ max_avg_word_len
    (kept integral as the cross-multiplied `chars ≤ max·words`, never a
    float division). Before swapping a quality filter in a curation
    pipeline, the kappa on these five integers says whether the new
    filter actually disagrees with the old one beyond chance — two
    filters with high kappa are redundant, low-kappa ones gate
    different documents and need a diff review.

    Word count = spaces + 1 on the raw text (the cheapest tokenizer
    both engines state identically: length(text) − length(replace(
    text, ' ', '')) + 1); empty text counts one word of length 0.

    Scale shape: ONE map-side-combined conditional-count aggregation
    over the scan — two length() calls per row, everything in
    whole-stage codegen. No shuffle beyond the final single-row
    reduce.
    """
    chars = F.length("text")
    words = chars - F.length(F.expr("replace(text, ' ', '')")) + 1
    a = chars >= min_chars
    b = chars <= F.lit(max_avg_word_len) * words

    def cell(fa: bool, fb: bool, name: str):
        return F.coalesce(
            F.sum(F.when((a == fa) & (b == fb), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias(name)

    return docs.agg(
        F.count("*").cast("long").alias("n"),
        cell(True, True, "n_11"),
        cell(True, False, "n_10"),
        cell(False, True, "n_01"),
        cell(False, False, "n_00"),
    )


def ngram_novelty_profile(
    docs: DataFrame, n: int = 3, ref_mod: int = 4
) -> DataFrame:
    """(novelty_decile, n_docs, sum_grams, sum_novel): corpus-level
    novelty profile — per candidate document, the fraction of its
    distinct word n-grams ABSENT from a deterministic reference split
    (doc_id % ref_mod == 0), histogrammed by integer novelty decile
    (n_novel·10 // n_grams, 0..10). The complement of
    :func:`decontaminate`: that one asks "does training data leak a
    small BENCHMARK?" (broadcast-able eval set by contract), this one
    asks "how much of a new crawl is genuinely new against the
    EXISTING corpus?" — the reference side scales with the corpus, so
    the shingle join is a plain shuffle hash join, NO broadcast hint
    (the scale-honest variant; AQE may still pick broadcast at tiny
    SF).

    Scale shape: two shingle explodes (whole-stage codegen via
    `dedup.word_shingles`), one distinct on the reference shingles,
    one shingle-keyed shuffle join, one doc-keyed aggregation, and a
    final ≤11-row decile rollup. Everything is bounded by total
    shingle volume — linear in corpus size; no pairwise term anywhere.

    The docs are round-robin repartitioned to the session shuffle
    width BEFORE the explode: compressed document bytes
    under-represent post-explode work by the shingle fan-out (~150×
    for ~1k-char docs), so a corpus that fits in few input splits
    would otherwise explode on few tasks — measured at the 100× probe,
    where a 60 MB single-file corpus (< one 128 MB split) put a 75M-
    shingle explode+aggregate on ONE task for ~25 min while 31 cores
    idled. One raw-doc shuffle (tiny next to the shingle volume)
    decouples map parallelism from file layout; on a many-file
    production corpus it is near-free insurance.
    """
    from .dedup import word_shingles
    from ..functions.joins import spread_before_explode

    docs = spread_before_explode(docs)
    is_ref = F.col("doc_id") % ref_mod == 0
    ref_grams = (
        word_shingles(docs.filter(is_ref), n)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        word_shingles(docs.filter(~is_ref), n)
        .join(ref_grams, on="shingle", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            (F.count("*") - F.count("hit")).alias("n_novel"),
        )
    )
    # integer division — a float ratio+floor would hang the bucket id
    # on libm behavior; `div` stays integer-exact cross-engine
    decile = F.expr("(n_novel * 10) div n_grams")
    return (
        per_doc.select(decile.cast("long").alias("novelty_decile"),
                       "n_grams", "n_novel")
        .groupBy("novelty_decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("sum_grams"),
            F.sum("n_novel").cast("long").alias("sum_novel"),
        )
    )
