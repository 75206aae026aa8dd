"""Round-7 fifth batch: edge-quality ingest census, per-source
length↔token correlation inputs, order cohort retention triangle,
part–supplier bipartite degree profile, pricing knob grid, and the
event-type diversity histogram. Known-value fixtures — SQL-oracle
parity for the same operators lives in test_oracle_parity via the
entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    graphalg,
    olap,
    sessions,
)


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


# ------------------------------------------------------ edge quality census


def test_edge_quality_census_dirty_ingest(spark):
    v = spark.createDataFrame([(i,) for i in range(1, 5)], "id LONG")
    e = spark.createDataFrame(
        [
            (1, 2),
            (1, 2),  # exact directed duplicate
            (2, 1),  # reciprocal of 1→2
            (3, 3),  # self-loop
            (3, 4),
        ],
        "src LONG, dst LONG",
    )
    row = graphalg.edge_quality_census(NetGraph(v, e)).collect()[0]
    assert row["n_raw"] == 5
    assert row["n_self_loops"] == 1
    assert row["n_dup_directed"] == 1
    assert row["n_reciprocal_pairs"] == 1
    assert row["n_undirected"] == 2  # {1,2} and {3,4}


def test_edge_quality_census_clean(spark):
    v = spark.createDataFrame([(1,), (2,)], "id LONG")
    e = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    row = graphalg.edge_quality_census(NetGraph(v, e)).collect()[0]
    assert (
        row["n_raw"],
        row["n_self_loops"],
        row["n_dup_directed"],
        row["n_reciprocal_pairs"],
        row["n_undirected"],
    ) == (1, 0, 0, 0, 1)


# ----------------------------------------------------- source corr profile


def test_source_corr_profile_sums(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "ab cd"),  # len 5, tok 2
            (2, "web", "xyz"),  # len 3, tok 1
            (3, "book", ""),  # len 0, tok 1 (split('') = [''])
        ],
        "doc_id LONG, source STRING, text STRING",
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["sum_len"],
            r["sum_tok"],
            r["sum_len_sq"],
            r["sum_tok_sq"],
            r["sum_len_tok"],
        )
        for r in corpusstats.source_corr_profile(docs).collect()
    }
    assert got["web"] == (2, 8, 3, 34, 5, 13)
    assert got["book"] == (1, 0, 1, 0, 1, 0)


# -------------------------------------------------- order cohort retention


def test_order_cohort_retention_triangle(spark):
    orders = spark.createDataFrame(
        [
            # customer 1: first in Jan-2020, back in Mar-2020
            (1, 1, _ts(2020, 1, 5)),
            (2, 1, _ts(2020, 3, 9)),
            # customer 2: Jan-2020 only (two orders, one month)
            (3, 2, _ts(2020, 1, 2)),
            (4, 2, _ts(2020, 1, 20)),
            # customer 3: cohort Feb-2020
            (5, 3, _ts(2020, 2, 1)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    got = {
        (r["cohort_month"], r["month_offset"]): r["n_customers"]
        for r in olap.order_cohort_retention(orders).collect()
    }
    jan, feb = 2020 * 12 + 1, 2020 * 12 + 2
    assert got == {(jan, 0): 2, (jan, 2): 1, (feb, 0): 1}


# ----------------------------------------------- supply bipartite profile


def test_supply_bipartite_profile_sides(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 100, 10),
            (2, 100, 10),  # duplicate pair — distinct collapses it
            (3, 100, 20),
            (4, 200, 10),
        ],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG",
    )
    got = {
        (r["side"], r["n_partners"]): r["n_keys"]
        for r in olap.supply_bipartite_profile(lineitem).collect()
    }
    # part 100 has 2 suppliers, part 200 has 1;
    # supplier 10 has 2 parts, supplier 20 has 1.
    assert got == {
        ("part", 2): 1,
        ("part", 1): 1,
        ("supplier", 2): 1,
        ("supplier", 1): 1,
    }


# ----------------------------------------------------- pricing knob grid


def test_pricing_knob_grid_cells(spark):
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.05, 0.02),
            (2, 200.0, 0.05, 0.02),
            (3, 50.0, 0.0, 0.08),
        ],
        "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE,"
        " l_tax DOUBLE",
    )
    got = {
        (r["disc_cents"], r["tax_cents"]): (r["n_lines"], r["revenue"])
        for r in olap.pricing_knob_grid(lineitem).collect()
    }
    assert got == {(5, 2): (2, 285.0), (0, 8): (1, 50.0)}


# --------------------------------------------- user event type diversity


def test_user_event_type_diversity_histogram(spark):
    events = spark.createDataFrame(
        [
            (1, 1, "click"),
            (2, 1, "click"),  # repeat type — distinct collapses
            (3, 1, "view"),
            (4, 2, "click"),
        ],
        "event_id LONG, user_id LONG, event_type STRING",
    )
    got = {
        r["n_types"]: r["n_users"]
        for r in sessions.user_event_type_diversity(events).collect()
    }
    assert got == {2: 1, 1: 1}
