"""Round-7 second batch: TPC-H Q8/Q9/Q15 shapes, month-over-month
revenue, cohort acquisition, hapax/sentence corpus profiles, and the
per-edge triangle-support histogram. Known-value fixtures — SQL-oracle
parity for the same operators lives in test_oracle_parity via the
entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    graphalg,
    olap,
)


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


# ------------------------------------------------------------ Q8 / Q9 / Q15


def _li(spark, rows):
    # (orderkey, suppkey, partkey, qty, extprice, discount, shipdate)
    return spark.createDataFrame(
        rows,
        "l_orderkey LONG, l_suppkey LONG, l_partkey LONG, l_quantity DOUBLE,"
        " l_extendedprice DOUBLE, l_discount DOUBLE, l_shipdate TIMESTAMP",
    )


def test_market_share_revenue_and_region_total(spark):
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 100.0, 0.0, _ts(1995, 3, 1)),
            (1, 2, 1, 1.0, 200.0, 0.5, _ts(1995, 6, 1)),
            (2, 1, 1, 1.0, 40.0, 0.0, _ts(1996, 1, 1)),
        ],
    )
    orders = spark.createDataFrame(
        [(1, 10), (2, 20)], "o_orderkey LONG, o_custkey LONG"
    )
    customer = spark.createDataFrame(
        [(10, 1), (20, 2)], "c_custkey LONG, c_nationkey INT"
    )
    supplier = spark.createDataFrame(
        [(1, 1), (2, 2)], "s_suppkey LONG, s_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(1, "ALPHA", 1), (2, "BETA", 2)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    region = spark.createDataFrame(
        [(1, "EAST"), (2, "WEST")], "r_regionkey INT, r_name STRING"
    )
    got = {
        (r["cust_region"], r["year"], r["supp_nation"]): (
            r["revenue"],
            r["region_total"],
        )
        for r in olap.market_share(
            li, orders, customer, supplier, nation, region
        ).collect()
    }
    # order 1 → customer 10 (EAST); its two items ship in 1995:
    # ALPHA 100·1.0 = 100, BETA 200·0.5 = 100 → EAST/1995 total 200.
    assert got[("EAST", 1995, "ALPHA")] == (100.0, 200.0)
    assert got[("EAST", 1995, "BETA")] == (100.0, 200.0)
    assert got[("WEST", 1996, "ALPHA")] == (40.0, 40.0)
    assert len(got) == 3


def test_supplier_nation_margin_terms(spark):
    li = _li(
        spark,
        [
            (1, 1, 1, 2.0, 100.0, 0.1, _ts(1995, 3, 1)),
            (2, 1, 2, 3.0, 50.0, 0.0, _ts(1995, 9, 1)),
            (3, 1, 1, 1.0, 80.0, 0.0, _ts(1996, 1, 1)),
        ],
    )
    part = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "p_partkey LONG, p_retailprice DOUBLE"
    )
    supplier = spark.createDataFrame(
        [(1, 7)], "s_suppkey LONG, s_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(7, "GAMMA")], "n_nationkey INT, n_name STRING"
    )
    got = {
        (r["nation"], r["year"]): (r["revenue"], r["retail_cost"], r["n_items"])
        for r in olap.supplier_nation_margin(li, supplier, part, nation).collect()
    }
    # 1995: revenue 100·0.9 + 50 = 140; cost 10·2 + 20·3 = 80.
    assert got[("GAMMA", 1995)] == (140.0, 80.0, 2)
    assert got[("GAMMA", 1996)] == (80.0, 10.0, 1)


def test_top_supplier_by_quarter_ties_kept(spark):
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 60.0, 0.0, _ts(1995, 1, 5)),
            (2, 2, 1, 1.0, 30.0, 0.0, _ts(1995, 2, 5)),
            (3, 2, 1, 1.0, 30.0, 0.0, _ts(1995, 3, 5)),
            (4, 3, 1, 1.0, 10.0, 0.0, _ts(1995, 3, 5)),
            (5, 3, 1, 1.0, 99.0, 0.0, _ts(1995, 4, 5)),
        ],
    )
    supplier = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey LONG, s_name STRING"
    )
    rows = olap.top_supplier_by_quarter(li, supplier).collect()
    got = sorted((r["quarter"], r["suppkey"], r["total_revenue"]) for r in rows)
    # Q1/1995: suppliers 1 and 2 tie at 60 — both kept; Q2: supplier 3.
    assert got == [(19951, 1, 60.0), (19951, 2, 60.0), (19952, 3, 99.0)]


# ------------------------------------------------- monthly revenue / cohorts


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP"
    )


def test_monthly_revenue_growth_lag(spark):
    orders = _orders(
        spark,
        [
            (1, 1, 10.0, _ts(1995, 1, 3)),
            (2, 1, 20.0, _ts(1995, 1, 9)),
            (3, 2, 5.0, _ts(1995, 2, 1)),
            (4, 2, 7.0, _ts(1995, 4, 1)),
        ],
    )
    rows = sorted(
        olap.monthly_revenue_growth(orders).collect(), key=lambda r: r["month"]
    )
    got = [(r["month"], r["revenue"], r["prev_revenue"], r["n_orders"]) for r in rows]
    # lag is by month ORDER, not calendar adjacency: 199504's prev is
    # the 199502 row (no March orders exist).
    assert got == [
        (199501, 30.0, None, 2),
        (199502, 5.0, 30.0, 1),
        (199504, 7.0, 5.0, 1),
    ]


def test_customer_acquisition_first_month_and_cumsum(spark):
    orders = _orders(
        spark,
        [
            (1, 1, 1.0, _ts(1995, 1, 3)),
            (2, 1, 1.0, _ts(1995, 3, 3)),  # repeat customer — not new
            (3, 2, 1.0, _ts(1995, 1, 9)),
            (4, 3, 1.0, _ts(1995, 3, 1)),
        ],
    )
    rows = sorted(
        olap.customer_acquisition(orders).collect(), key=lambda r: r["month"]
    )
    got = [(r["month"], r["n_new"], r["cum_customers"]) for r in rows]
    assert got == [(199501, 2, 2), (199503, 1, 3)]


# ------------------------------------------------------------ corpus profiles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


def test_hapax_by_source_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "web", "a b a c"),
            (2, "web", "b  d"),  # double space → empty token dropped
            (3, "book", "x"),
        ],
    )
    got = {
        r["source"]: (r["n_tokens"], r["n_distinct"], r["n_hapax"])
        for r in corpusstats.hapax_by_source(docs).collect()
    }
    # web tokens: a·2 b·2 c·1 d·1 → 6 occurrences, 4 distinct, 2 hapax.
    assert got["web"] == (6, 4, 2)
    assert got["book"] == (1, 1, 1)


def test_sentence_stats_trims_and_drops_empty(spark):
    docs = _docs(
        spark,
        [
            (1, "web", "Hi there. Bye!?  "),  # trailing blank seg dropped
            (2, "web", "..."),  # no sentences at all → no n_docs credit
            (3, "book", "One. Two. Three."),
        ],
    )
    got = {
        r["source"]: (r["n_docs"], r["n_sentences"], r["total_sentence_chars"])
        for r in corpusstats.sentence_stats(docs).collect()
    }
    # web doc 1: "Hi there" (8) and "Bye" (3); doc 2 contributes nothing.
    # book: "One" + "Two" + "Three" = 3 + 3 + 5 = 11 chars.
    assert got["web"] == (1, 2, 11)
    assert got["book"] == (1, 3, 11)


# ------------------------------------------------------- edge support census


def test_edge_support_histogram_triangle_plus_pendant(spark):
    v = spark.createDataFrame([(i,) for i in [1, 2, 3, 4]], "id LONG")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src LONG, dst LONG"
    )
    g = NetGraph(v, e)
    got = {
        r["support"]: r["n_edges"]
        for r in graphalg.edge_support_histogram(g).collect()
    }
    # the 3 triangle edges each carry support 1; the pendant edge 0.
    assert got == {0: 1, 1: 3}


def test_edge_support_histogram_diamond(spark):
    # K4 minus edge (1,4): edge (2,3) sits in both triangles → support 2.
    v = spark.createDataFrame([(i,) for i in [1, 2, 3, 4]], "id LONG")
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src LONG, dst LONG"
    )
    g = NetGraph(v, e)
    got = {
        r["support"]: r["n_edges"]
        for r in graphalg.edge_support_histogram(g).collect()
    }
    assert got == {1: 4, 2: 1}
