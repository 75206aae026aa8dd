"""Text analysis operators for training-data curation: token counting,
quality scoring, language ID, document fingerprinting.

All pure `pyspark.sql.functions` expressions (JVM-side, codegen'd) —
there is no reason for any of these to touch Python per row. Ratios are
computed as a single integer/integer division so the DuckDB oracle
reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash56

#: tiny function-word profiles per language for the overlap heuristic.
#: Deliberately minimal — the operator is the mechanism (per-language
#: token-set overlap, distributed), not a linguistic model.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "de", "et", "un", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "un", "es"),
    "zh": ("的", "是", "和", "在", "了"),
}

#: english stopwords for the quality-score stopword ratio
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: (doc_id, n_tokens, n_distinct,
    n_chars_measured, avg_token_len, type_token_ratio)."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        # BPE-ish pre-tokenization: word runs + isolated punctuation
        # (the usual GPT-2-style pre-split, minus byte fallback)
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0))
        .cast("long")
        .alias("n_tokens_regex"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (
            (F.length("text") - F.size(words) + 1) / F.size(words)
        ).alias("avg_token_len"),
        (F.size(F.array_distinct(words)) / F.size(words)).alias("type_token_ratio"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    repetition penalty. (doc_id, n_tokens, stopword_ratio, quality).

    Mirrors the usual Gopher/C4-style filters in spirit: too-short docs
    score 0; heavy repetition (low type/token) is penalized; a moderate
    stopword ratio is rewarded. Single-division ratios → deterministic.
    """
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    n_stop = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in STOPWORDS])))
    # distinct stopwords present / tokens would under-reward; count
    # occurrences via filter instead (array_intersect dedups):
    n_stop_occ = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in STOPWORDS]))
    )
    ttr = F.size(F.array_distinct(words)) / n
    stop_ratio = n_stop_occ / n
    length_ok = (n >= 20) & (n <= 1000)
    score = (
        F.when(~length_ok, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(F.lit(1.0), stop_ratio * 4) * 0.4 + ttr * 0.6, 6
            )
        )
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
        n_stop.cast("long").alias("n_distinct_stopwords"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Token-overlap language guess: (doc_id, guessed_lang, best_overlap).

    Per language, count occurrences of its function words; argmax with
    deterministic alphabetical tie-break. At scale this is one pass per
    document over a constant-size profile array — no joins, no UDFs.
    """
    words = F.split(F.col("text"), " ")
    overlaps = [
        F.size(
            F.filter(words, lambda w: w.isin(*[F.lit(t) for t in toks]))
        ).alias(f"ov_{lang}")
        for lang, toks in sorted(LANG_PROFILES.items())
    ]
    with_ov = docs.select("doc_id", *overlaps)
    langs = sorted(LANG_PROFILES)
    pairs = F.array(
        *[F.struct(F.col(f"ov_{L}").alias("ov"), F.lit(L).alias("lang")) for L in langs]
    )
    # explicit fold so overlap ties keep the alphabetically-first lang
    # (strict > means earlier array entries win ties)
    folded = F.aggregate(
        pairs,
        F.struct(F.lit(-1).cast("int").alias("ov"), F.lit("").alias("lang")),
        lambda acc, s: F.when(s["ov"] > acc["ov"], s).otherwise(acc),
    )
    return with_ov.select(
        "doc_id",
        folded["lang"].alias("guessed_lang"),
        folded["ov"].cast("long").alias("best_overlap"),
    )


def doc_fingerprints(docs: DataFrame, n: int = 5, keep: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the `keep` smallest 56-bit hashes of
    word n-grams, as a sorted array. (doc_id, fingerprint array<long>).

    Two docs sharing any fingerprint element are near-dup candidates —
    the join-key form of MOSS-style winnowing, shuffle key = 8 bytes.
    """
    words = F.split(F.col("text"), " ")
    grams = F.when(F.size(words) < n, F.array(F.col("text"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
    exploded = docs.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", hash56("g").alias("h")
    )
    ranked = exploded.groupBy("doc_id").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, keep).alias("fingerprint")
    )
    return ranked


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k distinctive terms by rational tf-idf:
    (doc_id, term, tf, df, score, rnk).

    score = tf·(N+1)/(df+1) as ONE double division of exact integers.
    The usual ln() is deliberately not applied engine-side: IEEE-754
    makes +,·,/ exactly reproducible across engines but transcendentals
    are libm-dependent, and ln is monotone in the ratio — rankings are
    identical, the display layer can take the log. Three shuffles total
    (tf partial-aggregate on (doc, term), term-keyed df window,
    doc-keyed ranking window); at 100 TB the df side is the skew risk
    (stopword terms), absorbed by the partial aggregation of the tf
    groupBy that precedes it.
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    wd = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("long")
    )
    scored = wd.withColumn(
        "score", (F.col("tf") * F.lit(n_docs + 1)) / (F.col("df") + F.lit(1))
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    )
    return scored.withColumn("rnk", rnk.cast("long")).filter(F.col("rnk") <= k)


def bpe_merges(docs: DataFrame, rounds: int = 4, sep: str = "_") -> DataFrame:
    """(round, pair, merged, n_occ): greedy BPE-style merge-table
    induction over the word stream — per round, the most frequent
    adjacent token pair (ties → lexicographically smallest) becomes a
    merged token and the corpus is rewritten before the next count.
    The merge TABLE is the tokenizer-training artifact (apply order =
    round order); `rounds` bounds it like a vocab-size budget.

    Execution is the textbook distributed formulation: each round is
    one bigram count aggregation (explode adjacent pairs → groupBy →
    global top-1, a TakeOrderedAndProject) plus one narrow rewrite
    pass; only the single winning pair ever reaches the driver.
    Rewrite semantics are STRING-level leftmost non-overlapping
    (boundary-padded literal replace): "a a a" merges once, not twice
    — the convention both engines implement identically, which is what
    makes the whole merge table hash-comparable against the chained-CTE
    DuckDB oracle. Assumes `sep` does not occur in the corpus (true
    for the fixtures; pick any unused byte otherwise).
    """
    spark = docs.sparkSession
    t = docs.select(
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("t")
    ).localCheckpoint(eager=False)
    out: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        words = F.split(F.trim(F.col("t")), " ")
        pairs = t.select(
            F.explode(
                F.when(F.size(words) < 2, F.array().cast("array<string>"))
                .otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size(words) - 1),
                        lambda i: F.concat(
                            F.element_at(words, i),
                            F.lit(" "),
                            F.element_at(words, i + 1),
                        ),
                    )
                )
            ).alias("pair")
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        merged = pair.replace(" ", sep)
        out.append((r, pair, merged, c))
        # column-based literals, NOT SQL-string splicing: a pair
        # containing a quote/backslash round-trips exactly (the DuckDB
        # oracle never splices literals either, so both engines see the
        # identical byte sequence); the per-round localCheckpoint keeps
        # plan depth at one replace regardless of `rounds`. Lazy: the
        # next round's pair count is the action that fills it, so the
        # rewrite costs no standalone job — and the final round's
        # rewrite (which nothing consumes) never runs at all.
        t = t.select(
            F.replace(
                F.col("t"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ).alias("t")
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        out, "round long, pair string, merged string, n_occ long"
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_digest, n_norm_chars): canonical text
    normalization — lowercase, non-alphanumerics to spaces, runs of
    whitespace collapsed, trimmed — reported as digest + length so the
    normalized text itself never leaves the executors. This is the
    canonicalization pass exact dedup should key on when "same doc"
    must survive casing/punctuation jitter (the C4/CCNet convention),
    and the digest column is drop-in for exact_dedup/incremental_dedup.

    Pure codegen'd expressions (lower/regexp_replace/trim/md5), zero
    shuffle — a narrow map over the scan at any scale. The two regexes
    ([^a-z0-9 ] and ' +') sit in the portable intersection of Java
    regex and RE2, so Spark and the DuckDB oracle rewrite identically.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_digest"),
        F.length(norm).cast("long").alias("n_norm_chars"),
    )


def word_run_lengths(docs: DataFrame) -> DataFrame:
    """(lang, run_len, n_runs): run-length-encoding census of the token
    stream — for every maximal run of the SAME consecutive word inside
    a document, one count toward its (language, length) cell. Long runs
    are the classic low-quality/boilerplate signature (stuck generators,
    repeated padding), and run_len=1 mass calibrates the baseline; this
    is the RLE islands operator (gaps-and-islands over an array column)
    the window family didn't cover yet.

    Scale shape: posexplode (JVM generator, no Python) → ONE shuffle
    keyed on doc_id with partition-local window sorts; windows are
    bounded by document length, never corpus size. The island id is the
    running sum of change flags — the standard one-pass RLE — and the
    final (lang, run_len) roll-up is map-side combinable into a
    vocabulary-bounded frame. Empty tokens (from double spaces) are
    dropped on both engines before positions are assigned.
    """
    words = (
        docs.select(
            "doc_id",
            "lang",
            F.posexplode(
                F.filter(F.split(F.col("text"), " "), lambda w: w != "")
            ).alias("pos", "word"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        words.withColumn(
            "chg",
            F.when(
                F.lag("word").over(w).isNull()
                | (F.lag("word").over(w) != F.col("word")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "lang", "run_id")
        .agg(F.count("*").cast("long").alias("run_len"))
    )
    return runs.groupBy("lang", "run_len").agg(
        F.count("*").cast("long").alias("n_runs")
    )
