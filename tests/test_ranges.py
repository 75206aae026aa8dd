"""Tests for the bucketized interval join and quantile scale story."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import corpusstats, ranges


def _frames(spark):
    points = spark.createDataFrame(
        [
            # (pid, key, ts)
            (1, "u", 100),
            (2, "u", 250),
            (3, "u", 400),
            (4, "v", 100),   # right key, no interval on v covers 100
        ],
        "pid LONG, key STRING, ts LONG",
    )
    intervals = spark.createDataFrame(
        [
            # (iid, key, lo, hi)
            (10, "u", 100, 250),   # closed: catches ts=100 AND ts=250
            (11, "u", 240, 260),   # overlaps interval 10
            (12, "u", 401, 500),   # just misses ts=400
            (13, "w", 0, 1000),    # key with no points
        ],
        "iid LONG, key STRING, lo LONG, hi LONG",
    )
    return points, intervals


def _pairs(points, intervals, width):
    got = ranges.interval_join(
        points, intervals, key=["key"], point_ts="ts",
        start="lo", end="hi", bucket_width=width,
    )
    return sorted((r["pid"], r["iid"]) for r in got.collect())


def test_interval_join_closed_boundaries(spark):
    points, intervals = _frames(spark)
    assert _pairs(points, intervals, 100) == [(1, 10), (2, 10), (2, 11)]


def test_interval_join_bucket_width_invariance(spark):
    # candidate generation changes with width; the result must not
    points, intervals = _frames(spark)
    expect = _pairs(points, intervals, 100)
    for width in (1, 7, 50, 1000, 10_000):
        assert _pairs(points, intervals, width) == expect


def test_interval_join_no_nested_loop(spark):
    points, intervals = _frames(spark)
    got = ranges.interval_join(
        points, intervals, key=["key"], point_ts="ts",
        start="lo", end="hi", bucket_width=100,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_approx_percentile_brackets_exact_quantiles(spark):
    """The 100 TB path (`approx_percentile`, mergeable t-digest) must
    agree with the exact rank-selection operator within its accuracy
    bound on real data — the claim made in corpusstats' docstring."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["lang"], r["p_label"]): r["q_value"]
        for r in corpusstats.token_quantiles(docs, group="lang").collect()
    }
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    approx = docs.select(F.col("lang"), n_tokens.alias("n")).groupBy("lang").agg(
        F.percentile_approx("n", [0.5, 0.9, 0.99], 10_000).alias("qs")
    )
    for r in approx.collect():
        for label, got in zip(("p50", "p90", "p99"), r["qs"]):
            want = exact[(r["lang"], label)]
            assert abs(got - want) <= max(2, 0.05 * want), (
                r["lang"], label, got, want
            )
