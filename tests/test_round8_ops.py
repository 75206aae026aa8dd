"""Round-8 first batch: the four TPC-H shapes that completed the suite
(Q11 value concentration, Q12 late-line census, Q20 nested semi-join,
full Q5 regional local revenue). Known-value fixtures — SQL-oracle
parity lives in test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.operators import olap


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


def _dims(spark):
    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey INT, r_name STRING"
    )
    nation = spark.createDataFrame(
        [(10, "FR", 0), (11, "DE", 0), (20, "JP", 1)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 10), (2, "S2", 11), (3, "S3", 20)],
        "s_suppkey LONG, s_name STRING, s_nationkey INT",
    )
    return region, nation, supplier


# ------------------------------------------------- part value concentration


def test_part_value_concentration_threshold(spark):
    region, nation, supplier = _dims(spark)
    # EUROPE suppliers are 1 and 2; supplier 3 (ASIA) must not count.
    # Values in cents: part 100 -> 10.00*2 + 10.00*3 = 5000c,
    # part 200 -> 1.00*1 = 100c via EU, plus an ASIA row that is excluded.
    lineitem = spark.createDataFrame(
        [
            (1, 100, 1, 10.0, 2.0),
            (2, 100, 2, 10.0, 3.0),
            (3, 200, 1, 1.0, 1.0),
            (4, 200, 3, 99.0, 9.0),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, "
        "l_extendedprice DOUBLE, l_quantity DOUBLE",
    )
    # total = 5100c; with denom=50 the cut is >102c: only part 100 passes.
    got = {
        r["partkey"]: r["supply_value"]
        for r in olap.part_value_concentration(
            lineitem, supplier, nation, region,
            region_name="EUROPE", fraction_denom=50,
        ).collect()
    }
    assert got == {100: 50.0}
    # denom high enough that every EU part passes (100c*10000 > 5100c).
    got_all = {
        r["partkey"]: r["supply_value"]
        for r in olap.part_value_concentration(
            lineitem, supplier, nation, region,
            region_name="EUROPE", fraction_denom=10000,
        ).collect()
    }
    assert got_all == {100: 50.0, 200: 1.0}


# ------------------------------------------------------- late line census


def test_late_line_priority_census_split(spark):
    lineitem = spark.createDataFrame(
        [
            (1, "R", _ts(1997, 6, 1)),   # 121 days late, urgent order
            (2, "R", _ts(1997, 6, 1)),   # 31 days -> on time at 60
            (3, "N", _ts(1997, 6, 1)),   # 151 days late, low priority
            (4, "N", _ts(1996, 6, 1)),   # outside the ship window
        ],
        "l_orderkey LONG, l_returnflag STRING, l_shipdate TIMESTAMP",
    )
    orders = spark.createDataFrame(
        [
            (1, _ts(1997, 2, 1), "1-URGENT"),
            (2, _ts(1997, 5, 1), "2-HIGH"),
            (3, _ts(1997, 1, 1), "5-LOW"),
            (4, _ts(1996, 1, 1), "1-URGENT"),
        ],
        "o_orderkey LONG, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in olap.late_line_priority_census(
            lineitem, orders, "1997-01-01", "1998-01-01", late_days=60
        ).collect()
    }
    assert got == {"R": (1, 0), "N": (0, 1)}


# ---------------------------------------------------- bulk part suppliers


def test_bulk_part_suppliers_semi_join(spark):
    region, nation, supplier = _dims(spark)
    part = spark.createDataFrame(
        [(100, "small ring"), (200, "red widget")],
        "p_partkey LONG, p_name STRING",
    )
    lineitem = spark.createDataFrame(
        [
            # supplier 1 ships 60 units of the small part across 2 lines
            (1, 100, 1, 40.0, _ts(1997, 3, 1)),
            (2, 100, 1, 20.0, _ts(1997, 4, 1)),
            # supplier 2: only 30 units -> below the 50 cut
            (3, 100, 2, 30.0, _ts(1997, 5, 1)),
            # supplier 3: big volume but of a non-matching part
            (4, 200, 3, 99.0, _ts(1997, 6, 1)),
            # supplier 2 again, matching part, but outside the year
            (5, 100, 2, 99.0, _ts(1996, 6, 1)),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, "
        "l_quantity DOUBLE, l_shipdate TIMESTAMP",
    )
    rows = olap.bulk_part_suppliers(
        lineitem, supplier, part, nation,
        name_prefix="small ", year_start="1997-01-01",
        year_end="1998-01-01", min_qty=50.0,
    ).collect()
    assert [(r["s_name"], r["nation"]) for r in rows] == [("S1", "FR")]


# ------------------------------------------------- regional local revenue


def test_regional_local_revenue_locality(spark):
    region, nation, supplier = _dims(spark)
    customer = spark.createDataFrame(
        [(7, 10), (8, 20)], "c_custkey LONG, c_nationkey INT"
    )
    orders = spark.createDataFrame(
        [
            (1, 7, _ts(1997, 3, 1)),   # FR customer (EUROPE)
            (2, 8, _ts(1997, 3, 1)),   # JP customer (ASIA)
            (3, 8, _ts(1996, 3, 1)),   # outside the year
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 1, 100.0, 0.0),   # local FR trade but wrong region
            (2, 3, 100.0, 0.1),   # local JP trade in ASIA -> counts, 90.0
            (2, 1, 100.0, 0.0),   # JP customer, FR supplier -> not local
            (3, 3, 100.0, 0.0),   # local JP but outside the year
        ],
        "l_orderkey LONG, l_suppkey LONG, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    )
    rows = olap.regional_local_revenue(
        lineitem, orders, customer, supplier, nation, region,
        region_name="ASIA", year_start="1997-01-01", year_end="1998-01-01",
    ).collect()
    assert [(r["nation"], r["revenue"], r["n_lineitems"]) for r in rows] == [
        ("JP", 90.0, 1)
    ]


# ----------------------------------------------------------- greedy walks


def test_greedy_walks_min_neighbor(spark):
    from big_data_graph_analysis_with_spark_spark.model import (
        EDGE_SCHEMA,
        VERTEX_SCHEMA,
        NetGraph,
    )
    from big_data_graph_analysis_with_spark_spark.operators import walks

    def v(i):
        return (i, 1, 2, 1, 10, 3, 4, 5, 0.5, False)

    def e(s, d):
        return (s, d, 0, s, d, None, 0.1)

    # 0 -> {2, 1}; 1 -> 3; 3 -> 1 (cycle); 4 isolated start; 2 sink
    g = NetGraph(
        spark.createDataFrame([v(i) for i in range(5)], VERTEX_SCHEMA),
        spark.createDataFrame(
            [e(0, 2), e(0, 1), e(1, 3), e(3, 1)], EDGE_SCHEMA
        ),
    )
    got = {
        r["walk_id"]: (r["partition_key"], list(r["visited"]))
        for r in walks.greedy_walks(g, depth=3, n_partitions=2).collect()
    }
    # starts = {0, 4} (no in-edges). From 0: min(1,2)=1, then 3, then 1.
    assert got == {0: (0, [0, 1, 3, 1]), 4: (0, [4])}


def test_greedy_walk_classification_end_to_end(spark):
    from big_data_graph_analysis_with_spark_spark.model import (
        EDGE_SCHEMA,
        VERTEX_SCHEMA,
        NetGraph,
    )
    from big_data_graph_analysis_with_spark_spark.operators import stats, walks

    def v(i):
        return (i, 1, 2, 1, 10, 3, 4, 5, 0.5, False)

    def e(s, d):
        return (s, d, 0, s, d, None, 0.1)

    g = NetGraph(
        spark.createDataFrame([v(i) for i in range(4)], VERTEX_SCHEMA),
        spark.createDataFrame([e(0, 1), e(2, 3)], EDGE_SCHEMA),
    )
    classified = spark.createDataFrame(
        [(1, 1, 0.9, True), (3, 30, 0.5, False)],
        "pg_id LONG, og_id LONG, score DOUBLE, is_true_positive BOOLEAN",
    )
    w = walks.greedy_walks(g, depth=2, n_partitions=2)
    counts = {
        r["partition_key"]: (r["n_successful"], r["n_unsuccessful"])
        for r in stats.walk_counts(stats.classify_walks(w, classified)).collect()
    }
    # walk 0 visits {0,1}: hits the TP only -> successful
    # walk 2 visits {2,3}: hits the FP -> unsuccessful
    # both walk ids are even -> same partition (id % 2 == 0)
    assert counts == {0: (1, 1)}


# ------------------------------------------------------------ revenue ewma


def test_revenue_ewma_dyadic_weights(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import olap

    d0 = datetime.datetime(1997, 1, 1)  # epoch day 9862
    orders = spark.createDataFrame(
        [
            (1, d0, 10.0),
            (2, d0 + datetime.timedelta(days=1), 20.0),
            (3, d0 + datetime.timedelta(days=9), 5.0),  # outside window of d1
        ],
        "o_orderkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    )
    got = {
        r["day"]: (r["day_cents"], r["trail_weighted_cents"])
        for r in olap.trailing_dyadic_revenue(orders, window_days=8).collect()
    }
    day0 = 9862
    # day0: only itself, weight 128 -> 1000*128
    # day0+1: 2000*128 + 1000*64
    # day0+9: 500*128 (day0/day0+1 fell out of the 8-day window)
    assert got == {
        day0: (1000, 128000),
        day0 + 1: (2000, 256000 + 64000),
        day0 + 9: (500, 64000),
    }


# ---------------------------------------------------------- daily gap fill


def test_daily_gap_fill_zero_rows(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import drift

    d0 = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (1, d0, 7, "click", 1.0),
            (2, d0, 8, "view", 1.0),
            (3, d0 + datetime.timedelta(days=3), 7, "click", 1.0),
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    )
    rows = {
        r["day"]: (r["n_events"], r["is_gap"])
        for r in drift.daily_gap_fill(events).collect()
    }
    base = (d0 - datetime.datetime(1970, 1, 1)).days
    assert rows == {
        base: (2, False),
        base + 1: (0, True),
        base + 2: (0, True),
        base + 3: (1, False),
    }


# --------------------------------------------------------------- value locf


def test_value_locf_carries_forward(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import drift

    t = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t + datetime.timedelta(minutes=m)

    events = spark.createDataFrame(
        [
            (1, ts(0), 7, "error", 99.0),   # leading bad -> stays NULL
            (2, ts(1), 7, "click", 1.5),
            (3, ts(2), 7, "error", 88.0),   # repaired to 1.5
            (4, ts(3), 7, "view", 2.5),
            (5, ts(0), 8, "view", 3.0),
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    )
    got = {
        r["event_id"]: r["filled_value"]
        for r in drift.value_locf(events).collect()
    }
    assert got == {1: None, 2: 1.5, 3: 1.5, 4: 2.5, 5: 3.0}


# -------------------------------------------------------------- user set ops


def test_user_set_ops_algebra(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import olap

    t = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "click", 0.0),
        (2, t, 2, "click", 0.0),
        (3, t, 2, "error", 0.0),
        (4, t, 3, "error", 0.0),
        (5, t, 1, "click", 0.0),  # duplicate user must not double count
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    )
    got = {
        r["set_op"]: r["n_users"]
        for r in olap.user_set_ops(events).collect()
    }
    assert got == {"intersect": 1, "except": 1, "union": 3}


# ------------------------------------------------------------ segment bitmask


def test_segment_bitmask_bits(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    customer = spark.createDataFrame(
        [(1, 1, "AUTOMOBILE"), (2, 1, "MACHINERY"), (3, 2, "BUILDING")],
        "c_custkey LONG, c_nationkey INT, c_mktsegment STRING",
    )
    nation = spark.createDataFrame(
        [(1, "FR"), (2, "DE")], "n_nationkey INT, n_name STRING"
    )
    got = {
        r["nation"]: (r["segment_mask"], r["n_customers"])
        for r in olap.segment_bitmask(customer, nation).collect()
    }
    assert got == {"FR": (17, 2), "DE": (2, 1)}


# ------------------------------------------------------ embedding clip census


def test_embedding_clip_census_exact(spark):
    from big_data_graph_analysis_with_spark_spark.operators import similarity

    embs = spark.createDataFrame(
        [(1, [0.25, 0.75, -0.9]), (2, [0.1, -0.1])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["vec_id"]: (r["n_high"], r["clip_milli_sum"])
        for r in similarity.embedding_clip_census(embs).collect()
    }
    # vec 1: milli = [250, 750, -900] -> 2 high, clipped [250, 500, -500]
    # vec 2: floats 0.1f/-0.1f widen slightly off 0.1; floor gives 100/-101
    assert got[1] == (2, 250)
    assert got[2] == (0, -1)


# ------------------------------------------------- balance outlier census


def test_balance_outlier_census_exact_boundary(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    nation = spark.createDataFrame(
        [(1, "FR"), (2, "DE")], "n_nationkey INT, n_name STRING"
    )
    # FR: cents {0, 0, 0, 0, 400}: mean 80, sigma^2 = 5120,
    #   1.5 sigma ~ 107.3; |400-80|=320 is outside, |0-80|=80 is not.
    # DE: two equal balances -> sigma 0, deviations 0 -> NO outliers
    #   (strict > keeps the boundary stable).
    customer = spark.createDataFrame(
        [
            (1, 1, 0.0), (2, 1, 0.0), (3, 1, 0.0), (4, 1, 0.0), (5, 1, 4.0),
            (6, 2, 7.0), (7, 2, 7.0),
        ],
        "c_custkey LONG, c_nationkey INT, c_acctbal DOUBLE",
    )
    got = {
        r["nation"]: (r["n_custs"], r["n_outliers"], r["outlier_cents"])
        for r in olap.balance_outlier_census(customer, nation).collect()
    }
    assert got == {"FR": (5, 1, 400), "DE": (2, 0, 0)}


# ------------------------------------------------------------- edge cases


def test_greedy_walks_empty_and_sinkless(spark):
    from big_data_graph_analysis_with_spark_spark.model import (
        EDGE_SCHEMA,
        VERTEX_SCHEMA,
        NetGraph,
    )
    from big_data_graph_analysis_with_spark_spark.operators import walks

    # all-isolated graph: every vertex is a start, every walk length 1
    g = NetGraph(
        spark.createDataFrame(
            [(i, 1, 2, 1, 10, 3, 4, 5, 0.5, False) for i in range(3)],
            VERTEX_SCHEMA,
        ),
        spark.createDataFrame([], EDGE_SCHEMA),
    )
    rows = walks.greedy_walks(g, depth=4).collect()
    assert sorted(list(r["visited"]) for r in rows) == [[0], [1], [2]]


def test_revenue_ewma_single_day(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import olap

    orders = spark.createDataFrame(
        [(1, datetime.datetime(1997, 1, 1), 2.5)],
        "o_orderkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    )
    rows = olap.trailing_dyadic_revenue(orders, window_days=4).collect()
    # one day: its own weight is 2^(4-1) = 8
    assert [(r["day_cents"], r["trail_weighted_cents"]) for r in rows] == [
        (250, 2000)
    ]


def test_daily_gap_fill_empty(spark):
    from big_data_graph_analysis_with_spark_spark.operators import drift

    events = spark.createDataFrame(
        [],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    )
    # no rows -> empty span aggregate yields NULL bounds -> empty calendar
    assert drift.daily_gap_fill(events).count() == 0
