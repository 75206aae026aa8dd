"""Round-7 fourth batch: global transitivity, Q21-shaped sole-returned
supplier, supplier HHI concentration, order-size profile,
gaps-and-islands activity streaks, and daily autocovariance. Known-value
fixtures — SQL-oracle parity for the same operators lives in
test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    drift,
    graphalg,
    olap,
    sessions,
)


def _ts(y, m, d, h=0):
    return datetime.datetime(y, m, d, h)


def _graph(spark, edges, ids):
    v = spark.createDataFrame([(i,) for i in ids], "id LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    return NetGraph(v, e)


# ------------------------------------------------------ global transitivity


def test_global_transitivity_triangle_plus_tail(spark):
    # triangle 1-2-3 with a tail 3-4: 3 triangles-closed wedges, and
    # wedges = C(2,2)+C(2,2)+C(3,2)+C(1,2) = 1+1+3+0 = 5.
    g = _graph(spark, [(1, 2), (2, 3), (3, 1), (3, 4)], [1, 2, 3, 4])
    row = graphalg.global_transitivity(g).collect()[0]
    assert (row["n_vertices"], row["n_edges"]) == (4, 4)
    assert (row["wedges"], row["closed_wedges"]) == (5, 3)


def test_global_transitivity_triangle_free(spark):
    # path 1-2-3: one wedge, nothing closed; isolated vertex counted.
    g = _graph(spark, [(1, 2), (2, 3)], [1, 2, 3, 4])
    row = graphalg.global_transitivity(g).collect()[0]
    assert (row["n_vertices"], row["n_edges"]) == (4, 2)
    assert (row["wedges"], row["closed_wedges"]) == (1, 0)


# -------------------------------------------------- sole returned supplier

_LI_SCHEMA = (
    "l_orderkey LONG, l_suppkey LONG, l_returnflag STRING"
)


def test_sole_returned_supplier_q21_shape(spark):
    lineitem = spark.createDataFrame(
        [
            # order 1: suppliers 10 (returned) and 20 (clean) → 10 counts
            (1, 10, "R"),
            (1, 20, "N"),
            # order 2: both returned → neither counts (n_ret = 2)
            (2, 10, "R"),
            (2, 20, "R"),
            # order 3: single-supplier order → excluded (n_supp = 1)
            (3, 10, "R"),
            # order 4: supplier 20 sole returner among three
            (4, 20, "R"),
            (4, 10, "N"),
            (4, 30, "N"),
        ],
        _LI_SCHEMA,
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")],
        "s_suppkey LONG, s_name STRING",
    )
    got = {
        r["supplier"]: r["n_orders"]
        for r in olap.sole_returned_supplier(lineitem, supplier).collect()
    }
    assert got == {"S10": 1, "S20": 1}


def test_sole_returned_supplier_multiline_dedup(spark):
    # two returned lines from the same supplier in one order are ONE
    # returner — the (orderkey, suppkey) collapse, not a line count.
    lineitem = spark.createDataFrame(
        [(1, 10, "R"), (1, 10, "R"), (1, 20, "N")], _LI_SCHEMA
    )
    supplier = spark.createDataFrame(
        [(10, "S10"), (20, "S20")], "s_suppkey LONG, s_name STRING"
    )
    got = {
        r["supplier"]: r["n_orders"]
        for r in olap.sole_returned_supplier(lineitem, supplier).collect()
    }
    assert got == {"S10": 1}


# ------------------------------------------------------------- supplier HHI


def test_supplier_hhi_numerators(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 10, 10.0, 0.0),
            (2, 10, 20.0, 0.0),
            (3, 20, 30.0, 0.0),
        ],
        "l_orderkey LONG, l_suppkey LONG, l_extendedprice DOUBLE,"
        " l_discount DOUBLE",
    )
    supplier = spark.createDataFrame(
        [(10, 1), (20, 1)], "s_suppkey LONG, s_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(1, "FR")], "n_nationkey INT, n_name STRING"
    )
    row = olap.supplier_hhi(lineitem, supplier, nation).collect()[0]
    # revenues 30 and 30 → units 300000 each → sum of squares 1.8e11.
    assert row["nation"] == "FR"
    assert row["n_suppliers"] == 2
    assert row["total_rev"] == 60.0
    assert row["sum_sq_rev"] == 2 * (300000.0**2)


def test_supplier_hhi_discount_applied(spark):
    lineitem = spark.createDataFrame(
        [(1, 10, 100.0, 0.25)],
        "l_orderkey LONG, l_suppkey LONG, l_extendedprice DOUBLE,"
        " l_discount DOUBLE",
    )
    supplier = spark.createDataFrame(
        [(10, 2)], "s_suppkey LONG, s_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(2, "DE")], "n_nationkey INT, n_name STRING"
    )
    row = olap.supplier_hhi(lineitem, supplier, nation).collect()[0]
    assert row["total_rev"] == 75.0
    assert row["sum_sq_rev"] == 750000.0**2


# ------------------------------------------------------- order size profile


def test_order_size_profile_cells(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 10.0, 0.0),
            (1, 20.0, 0.5),
            (2, 5.0, 0.0),
        ],
        "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    orders = spark.createDataFrame(
        [(1, "O"), (2, "F")], "o_orderkey LONG, o_orderstatus STRING"
    )
    got = {
        (r["n_lines"], r["status"]): (r["n_orders"], r["revenue"])
        for r in olap.order_size_profile(lineitem, orders).collect()
    }
    assert got == {(2, "O"): (1, 20.0), (1, "F"): (1, 5.0)}


# -------------------------------------------------------- activity streaks


def test_activity_streaks_islands(spark):
    events = spark.createDataFrame(
        [
            # user 1: days 1,2,3 then 5 → max streak 3
            (1, 1, _ts(1970, 1, 2)),
            (2, 1, _ts(1970, 1, 3)),
            (3, 1, _ts(1970, 1, 4)),
            (4, 1, _ts(1970, 1, 6)),
            # user 2: two isolated days → max streak 1
            (5, 2, _ts(1970, 1, 2)),
            (6, 2, _ts(1970, 1, 9)),
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    got = {
        r["streak_len"]: r["n_users"]
        for r in sessions.activity_streaks(events).collect()
    }
    assert got == {3: 1, 1: 1}


def test_activity_streaks_same_day_dedup(spark):
    # many events on one day are one active day.
    events = spark.createDataFrame(
        [(i, 1, _ts(1970, 1, 2, h)) for i, h in enumerate([0, 5, 23])],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    got = {
        r["streak_len"]: r["n_users"]
        for r in sessions.activity_streaks(events).collect()
    }
    assert got == {1: 1}


# --------------------------------------------------- daily autocovariance


def test_daily_autocovariance_lags(spark):
    # type A: counts 2,3 on consecutive days, then 1 seven days after
    # day 0 → lag1 = 2·3 = 6, lag7 = 2·1 = 2.
    rows = (
        [(i, "A", _ts(1970, 1, 1)) for i in range(2)]
        + [(10 + i, "A", _ts(1970, 1, 2)) for i in range(3)]
        + [(20, "A", _ts(1970, 1, 8))]
        + [(30, "B", _ts(1970, 1, 1))]
    )
    events = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, ts TIMESTAMP"
    )
    got = {
        r["event_type"]: (
            r["n_days"],
            r["sum_c"],
            r["sum_sq"],
            r["lag1_dot"],
            r["lag7_dot"],
        )
        for r in drift.daily_autocovariance(events).collect()
    }
    assert got == {
        "A": (3, 6, 14, 6, 2),
        "B": (1, 1, 1, 0, 0),
    }
