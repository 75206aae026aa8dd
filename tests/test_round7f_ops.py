"""Round-7 sixth batch: edge block census, segment revenue mix,
supplier balance deciles, priority mix shift, leading tokens, and value
moments. Known-value fixtures — SQL-oracle parity for the same
operators lives in test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    drift,
    graphalg,
    olap,
)


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


# -------------------------------------------------------- edge block census


def test_edge_block_census_classes(spark):
    v = spark.createDataFrame([(i,) for i in [1, 5, 15, 25]], "id LONG")
    e = spark.createDataFrame(
        [(1, 15), (1, 25), (5, 15), (15, 25), (25, 15)],
        "src LONG, dst LONG",
    )
    got = {
        (r["src_class"], r["dst_class"]): r["n_edges"]
        for r in graphalg.edge_block_census(
            NetGraph(v, e), [("a", 10), ("b", 20)], default="c"
        ).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1, ("c", "b"): 1}


# ------------------------------------------------------ segment revenue mix


def test_segment_revenue_mix_cells(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 100.0, _ts(1995, 1, 1)),
            (2, 10, 50.0, _ts(1996, 2, 1)),
            (3, 20, 30.0, _ts(1995, 3, 1)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    customer = spark.createDataFrame(
        [(10, "AUTO"), (20, "HOUSE")], "c_custkey LONG, c_mktsegment STRING"
    )
    got = {
        (r["segment"], r["year"]): (r["n_orders"], r["revenue"])
        for r in olap.segment_revenue_mix(orders, customer).collect()
    }
    assert got == {
        ("AUTO", 1995): (1, 100.0),
        ("AUTO", 1996): (1, 50.0),
        ("HOUSE", 1995): (1, 30.0),
    }


# ------------------------------------------------- supplier balance deciles


def test_supplier_balance_deciles_ranks(spark):
    supplier = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 11)],
        "s_suppkey LONG, s_nationkey INT, s_acctbal DOUBLE",
    )
    nation = spark.createDataFrame(
        [(1, "FR")], "n_nationkey INT, n_name STRING"
    )
    got = {
        r["p_label"]: (r["n_suppliers"], r["q_cents"])
        for r in olap.supplier_balance_deciles(supplier, nation).collect()
    }
    # cents 100..1000; ranks (n-1)*num div den: p50→4 (500), p90→8
    # (900), p99→8 (900).
    assert got == {"p50": (10, 500), "p90": (10, 900), "p99": (10, 900)}


# --------------------------------------------------------- priority mix


def test_priority_mix_shift_shares(spark):
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", _ts(1995, 1, 1)),
            (2, "1-URGENT", _ts(1995, 2, 1)),
            (3, "5-LOW", _ts(1995, 3, 1)),
            (4, "5-LOW", _ts(1996, 1, 1)),
        ],
        "o_orderkey LONG, o_orderpriority STRING, o_orderdate TIMESTAMP",
    )
    got = {
        (r["year"], r["priority"]): (r["n_orders"], r["share_ppm"])
        for r in olap.priority_mix_shift(orders).collect()
    }
    assert got == {
        (1995, "1-URGENT"): (2, 666666),
        (1995, "5-LOW"): (1, 333333),
        (1996, "5-LOW"): (1, 1000000),
    }


# ---------------------------------------------------------- leading tokens


def test_leading_tokens_rank_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "the cat"),
            (2, "web", "the dog"),
            (3, "web", "a mouse"),
            (4, "web", "zebra here"),
        ],
        "doc_id LONG, source STRING, text STRING",
    )
    got = [
        (r["rank"], r["token"], r["n_docs"])
        for r in sorted(
            corpusstats.leading_tokens(docs, k=2).collect(),
            key=lambda r: r["rank"],
        )
    ]
    # 'the'×2 wins; 'a' beats 'zebra' on the token tiebreak.
    assert got == [(1, "the", 2), (2, "a", 1)]


# ----------------------------------------------------------- value moments


def test_value_moments_exact(spark):
    events = spark.createDataFrame(
        [
            (1, "buy", 1.5),
            (2, "buy", 2.25),
            (3, "view", -0.5),
        ],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    got = {
        r["event_type"]: (
            r["n_events"],
            r["sum_cents"],
            r["sum_sq_cents"],
            r["min_cents"],
            r["max_cents"],
        )
        for r in drift.value_moments(events).collect()
    }
    # buy: cents 150, 225 → sum 375, squares 22500 + 50625 = 73125.
    assert got == {
        "buy": (2, 375.0, 73125.0, 150, 225),
        "view": (1, -50.0, 2500.0, -50, -50),
    }
