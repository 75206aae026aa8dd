"""OLAP rolling-window and pivot operators: known-value checks and
plan shape."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.operators import olap


def _events(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: values 1,2,3,4 one minute apart
        (1, base, 1, "click", 1.0, ""),
        (2, base + datetime.timedelta(minutes=1), 1, "view", 2.0, ""),
        (3, base + datetime.timedelta(minutes=2), 1, "click", 3.0, ""),
        (4, base + datetime.timedelta(minutes=3), 1, "error", 4.0, ""),
        # user 2: single event
        (5, base, 2, "signup", 10.0, ""),
    ]
    return spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )


def test_rolling_user_stats_trailing_window(spark):
    out = {
        r["event_id"]: (r["n_window"], r["sum_value"], r["avg_value"])
        for r in olap.rolling_user_stats(_events(spark), n_last=3).collect()
    }
    assert out[1] == (1, 1.0, 1.0)
    assert out[2] == (2, 3.0, 1.5)
    assert out[3] == (3, 6.0, 2.0)
    assert out[4] == (3, 9.0, 3.0)  # window slides: 2+3+4
    assert out[5] == (1, 10.0, 10.0)


def test_event_type_pivot_counts_and_sums(spark):
    out = {r["user_id"]: r.asDict() for r in
           olap.event_type_pivot(_events(spark)).collect()}
    u1 = out[1]
    assert (u1["n_click"], u1["v_click"]) == (2, 4.0)
    assert (u1["n_error"], u1["v_error"]) == (1, 4.0)
    assert (u1["n_signup"], u1["v_signup"]) == (0, 0.0)
    u2 = out[2]
    assert (u2["n_signup"], u2["v_signup"]) == (1, 10.0)
    assert (u2["n_click"], u2["v_click"]) == (0, 0.0)


def test_pivot_plan_single_shuffle(spark):
    plan = olap.event_type_pivot(_events(spark))._jdf.queryExecution().executedPlan().toString()
    # explicit pivot values → no distinct pre-scan, exactly one exchange
    assert plan.count("Exchange") == 1
