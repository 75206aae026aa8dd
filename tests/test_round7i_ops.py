"""Round-7 ninth batch: RANGE-frame trailing revenue, NTILE balance
quartiles, GROUPING SETS sales levels, and full-frame window value
functions. Known-value fixtures — SQL-oracle parity lives in
test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.operators import olap


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


_NATION = "n_nationkey INT, n_name STRING"
_CUST = "c_custkey LONG, c_nationkey INT"


# -------------------------------------------------- trailing revenue range


def test_trailing_revenue_range_value_window(spark):
    orders = spark.createDataFrame(
        [
            # nation FR: days 0, 3, 10 since 1970-01-01
            (1, 10, 10.0, _ts(1970, 1, 1)),
            (2, 10, 20.0, _ts(1970, 1, 4)),
            (3, 10, 40.0, _ts(1970, 1, 11)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    customer = spark.createDataFrame([(10, 1)], _CUST)
    nation = spark.createDataFrame([(1, "FR")], _NATION)
    rows = {
        r["day"]: (r["revenue"], r["trail7_revenue"], r["next_revenue"])
        for r in olap.trailing_revenue_range(orders, customer, nation).collect()
    }
    # day 3 trails day 0 (within 6); day 10 trails nothing but itself —
    # a ROWS frame would wrongly include day 3.
    assert rows == {
        0: (10.0, 10.0, 20.0),
        3: (20.0, 30.0, 40.0),
        10: (40.0, 40.0, None),
    }


# ---------------------------------------------------- balance quartile mix


def test_balance_quartile_mix_tiles(spark):
    customer = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 9)],
        "c_custkey LONG, c_nationkey INT, c_acctbal DOUBLE",
    )
    nation = spark.createDataFrame([(1, "FR")], _NATION)
    got = {
        r["quartile"]: (r["n_customers"], r["sum_cents"])
        for r in olap.balance_quartile_mix(customer, nation).collect()
    }
    # 8 customers → 2 per tile; cents 100..800.
    assert got == {
        1: (2, 300),
        2: (2, 700),
        3: (2, 1100),
        4: (2, 1500),
    }


# ----------------------------------------------------- sales grouping sets


def test_sales_grouping_sets_levels(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 10.0, _ts(1995, 1, 1)),
            (2, 10, 20.0, _ts(1996, 1, 1)),
            (3, 20, 5.0, _ts(1995, 1, 1)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    customer = spark.createDataFrame(
        [(10, "AUTO"), (20, "HOUSE")], "c_custkey LONG, c_mktsegment STRING"
    )
    got = {
        (r["segment"], r["year"]): (r["n_orders"], r["revenue"])
        for r in olap.sales_grouping_sets(orders, customer).collect()
    }
    assert got == {
        ("AUTO", 1995): (1, 10.0),
        ("AUTO", 1996): (1, 20.0),
        ("HOUSE", 1995): (1, 5.0),
        ("AUTO", 0): (2, 30.0),
        ("HOUSE", 0): (1, 5.0),
        ("ALL", 1995): (2, 15.0),
        ("ALL", 1996): (1, 20.0),
        ("ALL", 0): (3, 35.0),
    }


# ------------------------------------------------- nation quarter extremes


def test_nation_quarter_extremes_values(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 10.0, _ts(1995, 1, 1)),  # Q1
            (2, 10, 20.0, _ts(1995, 5, 1)),  # Q2
            (3, 10, 40.0, _ts(1996, 2, 1)),  # Q1'96 (last)
            (4, 20, 7.0, _ts(1995, 8, 1)),  # single quarter
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    customer = spark.createDataFrame([(10, 1), (20, 2)], _CUST)
    nation = spark.createDataFrame([(1, "FR"), (2, "DE")], _NATION)
    got = {
        r["nation"]: (
            r["n_quarters"],
            r["first_rev"],
            r["second_rev"],
            r["last_rev"],
        )
        for r in olap.nation_quarter_extremes(orders, customer, nation).collect()
    }
    assert got == {
        "FR": (3, 10.0, 20.0, 40.0),
        "DE": (1, 7.0, None, 7.0),
    }
