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


def test_event_transitions_known_journey(spark):
    # user 1: click→view→click→error; user 2 contributes no transition
    out = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in olap.event_transitions(_events(spark)).collect()
    }
    assert out == {
        ("click", "view"): 1,
        ("view", "click"): 1,
        ("click", "error"): 1,
    }


def test_upsert_last_writer_wins_and_deletes(spark):
    from big_data_graph_analysis_with_spark_spark.operators import merge

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k LONG, val STRING, v LONG"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, False),   # update wins by version
            (3, "c2", 2, True),    # delete marker removes the key
            (4, "d", 1, False),    # brand-new key inserts
            (1, "a-tie", 0, False),  # version tie → change side wins
        ],
        "k LONG, val STRING, v LONG, _del BOOLEAN",
    )
    got = {
        r["k"]: (r["val"], r["v"])
        for r in merge.upsert(base, changes, ["k"], "v", "_del").collect()
    }
    assert got == {1: ("a-tie", 0), 2: ("b2", 1), 4: ("d", 1)}


def test_upsert_plan_is_join_free(spark):
    from big_data_graph_analysis_with_spark_spark.operators import merge

    base = spark.createDataFrame([(1, "a", 0)], "k LONG, val STRING, v LONG")
    changes = spark.createDataFrame(
        [(1, "b", 1, False)], "k LONG, val STRING, v LONG, _del BOOLEAN"
    )
    plan = merge.upsert(base, changes, ["k"], "v", "_del")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1


def test_user_sequences_order_and_cap(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import olap

    t = datetime.datetime
    rows = [
        (2, t(2024, 1, 1, 0, 0, 5), 7, "b", 0.0, "{}"),
        (1, t(2024, 1, 1, 0, 0, 5), 7, "a", 0.0, "{}"),  # same ts: id order
        (3, t(2024, 1, 1, 0, 0, 9), 7, "c", 0.0, "{}"),
        (4, t(2024, 1, 1, 0, 0, 1), 9, "z", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {
        r["user_id"]: (r["seq"], r["n_events"])
        for r in olap.user_sequences(ev, max_len=2).collect()
    }
    assert got[7] == ("a b", 2)  # time order, id tiebreak, capped at 2
    assert got[9] == ("z", 1)
