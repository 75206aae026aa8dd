"""Exact distributed quantiles via value-histogram rank selection.

A global `row_number()` over the raw rows is the textbook exact
quantile — and a single-partition sort of the whole table, the one
plan shape that cannot survive scale. The histogram form computes the
same value: group by the VALUE (map-side combinable, one shuffle keyed
on the value), take cumulative counts over the distinct-value table,
and pick the value whose cumulative range covers the target rank. The
only window runs over DISTINCT values — bounded by value cardinality,
not row count (duration/gap/length distributions repeat heavily; the
window input is thousands of rows where the raw table has billions).

The rank convention matches `corpusstats.token_quantiles` and the
DuckDB oracles: the p = num/den quantile is the value at 0-indexed
rank ``(n - 1) * num div den`` of the value-sorted rows — pure integer
arithmetic, no interpolation, bit-identical across engines. Selecting
by cumulative range is exactly equivalent to row-ranking: value v
occupies ranks [cum - count(v), cum - 1].
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: (label, numerator, denominator) — p50/p90/p99
DEFAULT_QUANTILES: Sequence[tuple[str, int, int]] = (
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[tuple[str, int, int]] = DEFAULT_QUANTILES,
    count_alias: str = "n_rows",
    value_alias: str = "q_value",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """([group_cols...,] p_label, {count_alias}, {value_alias}): exact
    quantiles of `df[value_col]`, optionally per group — one
    value-keyed aggregation plus a window over the distinct-value
    histogram. With `group_cols`, the window partitions on the group
    AND still ranges over distinct values only — a billion-row group
    costs its value cardinality, not its row count. See module
    docstring for why this replaces row ranking."""
    gc = list(group_cols)
    hist = df.groupBy(*gc, value_col).agg(F.count("*").alias("_hc"))
    w = Window.partitionBy(*gc).orderBy(value_col)
    cum = hist.select(
        *gc,
        value_col,
        "_hc",
        F.sum("_hc").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        F.sum("_hc")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("_cnt"),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(label).alias("p_label"),
                F.expr(f"(_cnt - 1) * {num} div {den}").alias("target"),
            )
            for label, num, den in quantiles
        ]
    )
    hits = cum.withColumn("q", F.explode(targets)).filter(
        (F.col("_cum") - F.col("_hc") <= F.col("q.target"))
        & (F.col("q.target") < F.col("_cum"))
    )
    return hits.select(
        *gc,
        F.col("q.p_label").alias("p_label"),
        F.col("_cnt").cast("long").alias(count_alias),
        F.col(value_col).cast("long").alias(value_alias),
    )
