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


def token_quantiles(
    docs: DataFrame,
    group: str = "lang",
    quantiles: Sequence[tuple[str, int, int]] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Exact token-count quantiles per group: (group, p_label, n_docs,
    q_value). Rank-selection on the (n_tokens, doc_id)-sorted group —
    doc_id breaks token-count ties so row ranks are total."""
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    t = docs.select(F.col(group).alias("grp"), "doc_id", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("grp")
    ranked = t.withColumn(
        "rn", F.row_number().over(w.orderBy("n_tokens", "doc_id"))
    ).withColumn("cnt", F.count("*").over(w))
    targets = F.array(
        *[
            F.struct(
                F.lit(label).alias("p_label"),
                (F.expr(f"(cnt - 1) * {num} div {den}")).alias("target"),
            )
            for label, num, den in quantiles
        ]
    )
    hits = ranked.withColumn("q", F.explode(targets)).filter(
        F.col("rn") - 1 == F.col("q.target")
    )
    return hits.select(
        F.col("grp").alias(group),
        F.col("q.p_label").alias("p_label"),
        F.col("cnt").cast("long").alias("n_docs"),
        F.col("n_tokens").alias("q_value"),
    )
