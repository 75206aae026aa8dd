"""Round-7 eighth batch: perturbation census, revenue reconciliation,
linenumber holes, entry→exit matrix, type co-occurrence, and the
label norm profile. Known-value fixtures — SQL-oracle parity lives in
test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    graphalg,
    olap,
    sessions,
    similarity,
)


def _ts(y, m, d, h=0):
    return datetime.datetime(y, m, d, h)


# ------------------------------------------------------ perturbation census


def _vgraph(spark, rows, edges):
    v = spark.createDataFrame(rows, "id LONG, props LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    return NetGraph(v, e)


def test_perturbation_census_taxonomy(spark):
    og = _vgraph(
        spark,
        [(1, 5), (2, 6), (3, 7)],
        [(1, 2), (2, 3)],
    )
    pg = _vgraph(
        spark,
        [(1, 5), (2, 9), (4, 1)],  # 2 modified, 3 removed, 4 added
        [(1, 2), (1, 4)],  # (2,3) removed, (1,4) added
    )
    row = graphalg.perturbation_census(og, pg).collect()[0]
    assert (row["n_vertices_og"], row["n_vertices_pg"]) == (3, 3)
    assert (row["n_removed"], row["n_added"], row["n_modified"]) == (1, 1, 1)
    assert (row["n_edges_og"], row["n_edges_pg"]) == (2, 2)
    assert (row["n_edges_removed"], row["n_edges_added"]) == (1, 1)


# -------------------------------------------------- revenue reconciliation


def test_revenue_reconciliation_buckets(spark):
    orders = spark.createDataFrame(
        [(1, 30.0), (2, 5.0), (3, 9.99)],
        "o_orderkey LONG, o_totalprice DOUBLE",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 10.0, 0.0),
            (1, 20.0, 0.0),  # order 1 reconciles exactly → sign 0
            (2, 10.0, 0.5),  # order 2: lines 5.0 → sign 0
            (3, 10.0, 0.0),  # order 3: header 9.99 vs 10.0 → −100 units
        ],
        "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    got = {
        (r["sign"], r["diff_bits"]): r["n_orders"]
        for r in olap.revenue_reconciliation(orders, lineitem).collect()
    }
    # |0| → bin '0' length 1; |−100| → bin '1100100' length 7.
    assert got == {(0, 1): 2, (-1, 7): 1}


# --------------------------------------------------------- linenumber holes


def test_linenumber_holes_census(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 1), (1, 2), (1, 3),  # dense → slack 0
            (2, 1), (2, 4),  # holes → slack 2
        ],
        "l_orderkey LONG, l_linenumber INT",
    )
    got = {
        r["slack"]: r["n_orders"]
        for r in olap.linenumber_holes(lineitem).collect()
    }
    assert got == {0: 1, 2: 1}


# --------------------------------------------------------- entry exit matrix


def test_entry_exit_matrix_ordering(spark):
    events = spark.createDataFrame(
        [
            (1, 1, "signup", _ts(2020, 1, 1)),
            (2, 1, "click", _ts(2020, 1, 2)),
            (3, 1, "churn", _ts(2020, 1, 3)),
            (4, 2, "signup", _ts(2020, 1, 1)),
        ],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    )
    got = {
        (r["first_type"], r["last_type"]): r["n_users"]
        for r in sessions.entry_exit_matrix(events).collect()
    }
    assert got == {("signup", "churn"): 1, ("signup", "signup"): 1}


def test_entry_exit_matrix_id_tiebreak(spark):
    # same timestamp: event_id breaks the tie on both ends.
    events = spark.createDataFrame(
        [
            (1, 1, "a", _ts(2020, 1, 1)),
            (2, 1, "b", _ts(2020, 1, 1)),
        ],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    )
    got = {
        (r["first_type"], r["last_type"]): r["n_users"]
        for r in sessions.entry_exit_matrix(events).collect()
    }
    assert got == {("a", "b"): 1}


# -------------------------------------------------------- type cooccurrence


def test_type_cooccurrence_pairs(spark):
    events = spark.createDataFrame(
        [
            (1, 1, "view", _ts(2020, 1, 1)),
            (2, 1, "buy", _ts(2020, 1, 1, 5)),  # same day → pair
            (3, 1, "view", _ts(2020, 1, 2)),  # alone next day
            (4, 2, "view", _ts(2020, 1, 1)),
            (5, 2, "buy", _ts(2020, 1, 1)),
        ],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    )
    got = {
        (r["type_a"], r["type_b"]): r["n_user_days"]
        for r in sessions.type_cooccurrence(events).collect()
    }
    assert got == {("buy", "view"): 2}


# -------------------------------------------------------- label norm profile


def test_label_norm_profile_exact(spark):
    emb = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [0.0, 2.0]),
            (3, "b", [1.0, 1.0]),
        ],
        "vec_id LONG, label STRING, embedding ARRAY<FLOAT>",
    )
    got = {
        r["label"]: (
            r["n_vecs"],
            r["sum_norm_sq"],
            r["min_norm_sq"],
            r["max_norm_sq"],
        )
        for r in similarity.label_norm_profile(emb).collect()
    }
    unit = 1_000_000**2
    assert got == {
        "a": (2, 5.0 * unit, 1 * unit, 4 * unit),
        "b": (1, 2.0 * unit, 2 * unit, 2 * unit),
    }
